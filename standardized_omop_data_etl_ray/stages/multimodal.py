"""Multimodal (image/audio/video) column plumbing.

Payloads are opaque ``binary`` columns + typed metadata; decode /
feature-extract / resize / frame-sample are actor-pool ``map_batches``
stages (codec state loaded once per actor).  The decode libraries are
NOT in this container, so the codec step is stubbed: ``decoder="fake"``
is a deterministic pure-python decoder used by tests; ``decoder="real"``
raises NotImplementedError at actor construction.  The Ray-side plumbing
— schema, small batch sizing for wide binary rows, actor signature,
output layout — is real and tested.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

import ray.data as rd

MEDIA_SCHEMA = pa.schema(
    [
        ("media_id", pa.int64()),
        ("kind", pa.string()),          # image | audio | video
        ("mime", pa.string()),
        ("payload", pa.binary()),       # opaque encoded bytes
        ("width", pa.int32()),
        ("height", pa.int32()),
        ("duration_ms", pa.int32()),
    ]
)


def synth_media_table(n: int, seed: int = 42, payload_bytes: int = 4096) -> pa.Table:
    """Deterministic fake media rows for plumbing tests."""
    rng = np.random.default_rng(seed)
    kinds = np.array(["image", "audio", "video"])[rng.integers(0, 3, n)]
    payloads = [
        hashlib.sha256(f"media{i}".encode()).digest() * (payload_bytes // 32)
        for i in range(n)
    ]
    return pa.table(
        {
            "media_id": pa.array(range(n), pa.int64()),
            "kind": pa.array(kinds),
            "mime": pa.array(
                ["image/png" if k == "image" else f"{k}/raw" for k in kinds]
            ),
            "payload": pa.array(payloads, pa.binary()),
            "width": pa.array(rng.integers(64, 1920, n), pa.int32()),
            "height": pa.array(rng.integers(64, 1080, n), pa.int32()),
            "duration_ms": pa.array(rng.integers(0, 60_000, n), pa.int32()),
        }
    )


class MediaFeaturizer:
    """Actor-pool stage: decode payload → fixed-size feature vector.

    ``__init__`` loads the codec once per actor; ``__call__`` processes a
    batch.  Batch size must be small for wide binary rows (caller passes
    ``batch_size`` ≤ a few hundred; see map_batches site).
    """

    def __init__(self, decoder: str = "fake", feat_dim: int = 16):
        self.feat_dim = feat_dim
        if decoder == "fake":
            self._decode = self._fake_decode
        else:  # pragma: no cover - real codecs absent in this container
            raise NotImplementedError(
                "real decoders (PIL/ffmpeg) are not available in this "
                "environment; use decoder='fake'"
            )

    def _fake_decode(self, payload: bytes) -> np.ndarray:
        # deterministic pseudo-decode: bytes → normalized float vector
        h = hashlib.sha256(payload).digest()
        raw = np.frombuffer((h * ((self.feat_dim * 4) // 32 + 1))[: self.feat_dim * 4],
                            dtype=np.uint32).astype(np.float32)
        return raw / np.float32(2**32)

    def __call__(self, batch: pa.Table) -> pa.Table:
        feats = [self._decode(p.as_py()) for p in batch.column("payload")]
        return pa.table(
            {
                "media_id": batch.column("media_id"),
                "kind": batch.column("kind"),
                "feature": pa.array(
                    [f.tolist() for f in feats], pa.list_(pa.float32())
                ),
            }
        )


def featurize_media(
    ds: rd.Dataset, concurrency: int = 2, batch_size: int = 256
) -> rd.Dataset:
    """Actor-pool featurize stage; small batches because binary payloads
    dominate block bytes."""
    return ds.map_batches(
        MediaFeaturizer,
        fn_constructor_kwargs=dict(decoder="fake"),
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


def frame_sample_plan(
    ds: rd.Dataset, every_ms: int = 1000
) -> rd.Dataset:
    """Video → per-frame rows (1→K fan-out on metadata only; the decode
    of each sampled frame would live in the actor stage above)."""

    def fn(batch: pa.Table) -> pa.Table:
        ids, kinds, ts = [], [], []
        mid = batch.column("media_id").to_pylist()
        kind = batch.column("kind").to_pylist()
        dur = batch.column("duration_ms").to_pylist()
        for i, k, d in zip(mid, kind, dur):
            if k != "video" or not d:
                continue
            for t in range(0, d, every_ms):
                ids.append(i)
                ts.append(t)
        return pa.table(
            {
                "media_id": pa.array(ids, pa.int64()),
                "frame_ms": pa.array(ts, pa.int32()),
            }
        )

    return ds.map_batches(fn, batch_format="pyarrow")
