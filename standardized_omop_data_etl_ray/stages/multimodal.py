"""Multimodal (image/audio/video) column plumbing.

Payloads are opaque ``binary`` columns + typed metadata; decode /
feature-extract / resize / frame-sample are actor-pool ``map_batches``
stages (codec state loaded once per actor).

Codecs: the container has no PIL/ffmpeg, but two REAL formats decode
with numpy/struct alone and are implemented end-to-end:

  * image — PPM (P6): header parse + raw RGB ndarray; features are
    per-channel stats + a downsampled luminance grid; ``resize_images``
    is a real nearest-neighbour resample.
  * audio — WAV (PCM16 mono): RIFF parse via struct; features are
    RMS / zero-crossing rate / coarse FFT band energies.

``decoder="real"`` uses those by mime type; video payloads (no pure-
numpy container format exists) fall back to the deterministic hash
features, and ``frame_sample_plan`` shows the 1→K fan-out shape the
frame decode would feed.  ``decoder="fake"`` keeps the fully
deterministic hash path for plumbing tests.
"""

from __future__ import annotations

import hashlib
import struct

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


# ------------------------------------------------------------- codecs --

def encode_ppm(img: np.ndarray) -> bytes:
    """(h, w, 3) uint8 → PPM P6 bytes."""
    h, w, _ = img.shape
    return f"P6\n{w} {h}\n255\n".encode() + img.astype(np.uint8).tobytes()


def decode_ppm(payload: bytes) -> np.ndarray:
    """PPM P6 bytes → (h, w, 3) uint8 (numpy-only decode)."""
    if not payload.startswith(b"P6"):
        raise ValueError("not a P6 PPM payload")
    # header: magic, width, height, maxval — whitespace separated
    parts, idx = [], 2
    while len(parts) < 3:
        while idx < len(payload) and payload[idx : idx + 1].isspace():
            idx += 1
        if payload[idx : idx + 1] == b"#":  # comment line
            idx = payload.index(b"\n", idx) + 1
            continue
        start = idx
        while idx < len(payload) and not payload[idx : idx + 1].isspace():
            idx += 1
        parts.append(int(payload[start:idx]))
    idx += 1  # single whitespace after maxval
    w, h, maxval = parts
    if maxval != 255:
        raise ValueError(f"unsupported PPM maxval {maxval}")
    data = np.frombuffer(payload, dtype=np.uint8, count=w * h * 3, offset=idx)
    return data.reshape(h, w, 3)


def encode_ppm_stream(frames: list[np.ndarray]) -> bytes:
    """Concatenated P6 frames — ffmpeg's ``image2pipe``/``-vcodec ppm``
    interchange format (a real uncompressed video stream numpy can
    decode alone)."""
    return b"".join(encode_ppm(f) for f in frames)


def decode_ppm_stream(payload: bytes) -> list[np.ndarray]:
    """PPM-stream bytes → list of (h, w, 3) uint8 frames."""
    frames, idx = [], 0
    n = len(payload)
    while idx < n:
        if payload[idx : idx + 2] != b"P6":
            raise ValueError(f"bad frame magic at offset {idx}")
        parts, j = [], idx + 2
        while len(parts) < 3:
            while j < n and payload[j : j + 1].isspace():
                j += 1
            if payload[j : j + 1] == b"#":
                j = payload.index(b"\n", j) + 1
                continue
            start = j
            while j < n and not payload[j : j + 1].isspace():
                j += 1
            parts.append(int(payload[start:j]))
        j += 1  # single whitespace after maxval
        w, h, maxval = parts
        if maxval != 255:
            raise ValueError(f"unsupported PPM maxval {maxval}")
        frames.append(
            np.frombuffer(payload, np.uint8, count=w * h * 3, offset=j)
            .reshape(h, w, 3)
        )
        idx = j + w * h * 3
    return frames


def encode_wav_pcm16(samples: np.ndarray, rate: int = 8000) -> bytes:
    """float32 [-1,1] mono → minimal RIFF/WAVE PCM16 bytes."""
    pcm = np.clip(samples, -1.0, 1.0)
    pcm = (pcm * 32767.0).astype("<i2").tobytes()
    hdr = struct.pack(
        "<4sI4s4sIHHIIHH4sI",
        b"RIFF", 36 + len(pcm), b"WAVE", b"fmt ", 16, 1, 1,
        rate, rate * 2, 2, 16, b"data", len(pcm),
    )
    return hdr + pcm


def decode_wav_pcm16(payload: bytes) -> tuple[np.ndarray, int]:
    """RIFF/WAVE PCM16 mono bytes → (float32 samples in [-1,1], rate)."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    idx = 12
    rate, data = None, None
    while idx + 8 <= len(payload):
        cid, size = struct.unpack("<4sI", payload[idx : idx + 8])
        body = payload[idx + 8 : idx + 8 + size]
        if cid == b"fmt ":
            fmt, ch, rate, _, _, bits = struct.unpack("<HHIIHH", body[:16])
            if fmt != 1 or ch != 1 or bits != 16:
                raise ValueError("only PCM16 mono supported")
        elif cid == b"data":
            data = np.frombuffer(body, dtype="<i2").astype(np.float32) / 32767.0
        idx += 8 + size + (size & 1)
    if rate is None or data is None:
        raise ValueError("missing fmt/data chunk")
    return data, rate


# -------------------------------------------------------------- synth --

def synth_media_table(n: int, seed: int = 42, payload_bytes: int = 4096) -> pa.Table:
    """Deterministic media rows.  Image payloads are VALID PPM (P6) and
    audio payloads VALID WAV PCM16 — the real decoders round-trip them;
    video payloads are opaque bytes (no numpy-only container format)."""
    rng = np.random.default_rng(seed)
    kinds = np.array(["image", "audio", "video"])[rng.integers(0, 3, n)]
    payloads, mimes, widths, heights, durs = [], [], [], [], []
    for i, k in enumerate(kinds):
        if k == "image":
            w, h = int(rng.integers(16, 48)), int(rng.integers(16, 48))
            x = np.linspace(0, 255, w, dtype=np.float32)
            img = np.stack(
                [
                    np.tile(x, (h, 1)) * s + rng.integers(0, 40, (h, w))
                    for s in (1.0, 0.5, 0.25)
                ],
                axis=-1,
            ).clip(0, 255).astype(np.uint8)
            payloads.append(encode_ppm(img))
            mimes.append("image/x-portable-pixmap")
            widths.append(w); heights.append(h); durs.append(0)
        elif k == "audio":
            dur_ms = int(rng.integers(50, 400))
            t = np.arange(int(8000 * dur_ms / 1000), dtype=np.float32) / 8000
            freq = float(rng.uniform(100, 1000))
            sig = 0.6 * np.sin(2 * np.pi * freq * t) + 0.1 * rng.standard_normal(len(t)).astype(np.float32)
            payloads.append(encode_wav_pcm16(sig))
            mimes.append("audio/wav")
            widths.append(0); heights.append(0); durs.append(dur_ms)
        else:
            # REAL video payload: a PPM frame stream (ffmpeg image2pipe
            # format) — a moving gradient so temporal features are
            # non-trivial
            w, h = int(rng.integers(12, 24)), int(rng.integers(12, 24))
            dur_ms = int(rng.integers(1000, 8000))
            n_frames = max(2, dur_ms // 250)  # 4 fps
            x = np.linspace(0, 255, w, dtype=np.float32)
            frames = [
                np.stack(
                    [
                        (np.tile(np.roll(x, f * 2), (h, 1)) * s)
                        for s in (1.0, 0.5, 0.25)
                    ],
                    axis=-1,
                ).clip(0, 255).astype(np.uint8)
                for f in range(n_frames)
            ]
            payloads.append(encode_ppm_stream(frames))
            mimes.append("video/x-ppm-stream")
            widths.append(w)
            heights.append(h)
            durs.append(dur_ms)
    return pa.table(
        {
            "media_id": pa.array(range(n), pa.int64()),
            "kind": pa.array(kinds),
            "mime": pa.array(mimes),
            "payload": pa.array(payloads, pa.binary()),
            "width": pa.array(widths, pa.int32()),
            "height": pa.array(heights, pa.int32()),
            "duration_ms": pa.array(durs, pa.int32()),
        }
    )


# --------------------------------------------------------- featurizer --

class MediaFeaturizer:
    """Actor-pool stage: decode payload → fixed-size feature vector.

    ``__init__`` sets up the codec dispatch once per actor; ``__call__``
    processes a batch.  Batch size must be small for wide binary rows
    (caller passes ``batch_size`` ≤ a few hundred; see map_batches site).
    """

    def __init__(self, decoder: str = "real", feat_dim: int = 16):
        self.feat_dim = feat_dim
        if decoder == "fake":
            self._decode = lambda payload, mime: self._hash_feats(payload)
        elif decoder == "real":
            self._decode = self._real_decode
        else:
            raise ValueError(f"unknown decoder {decoder!r}")

    def _hash_feats(self, payload: bytes) -> np.ndarray:
        # deterministic pseudo-decode: bytes → normalized float vector
        h = hashlib.sha256(payload).digest()
        raw = np.frombuffer((h * ((self.feat_dim * 4) // 32 + 1))[: self.feat_dim * 4],
                            dtype=np.uint32).astype(np.float32)
        return raw / np.float32(2**32)

    def _image_feats(self, payload: bytes) -> np.ndarray:
        img = decode_ppm(payload).astype(np.float32) / 255.0
        lum = img.mean(axis=-1)
        # per-channel mean/std + 3x3 luminance grid + aspect ≈ 10 dims
        gh = np.array_split(np.arange(lum.shape[0]), 3)
        gw = np.array_split(np.arange(lum.shape[1]), 3)
        grid = np.array([lum[np.ix_(r, c)].mean() for r in gh for c in gw])
        f = np.concatenate(
            [img.mean(axis=(0, 1)), img.std(axis=(0, 1)), grid[:9]]
        )
        out = np.zeros(self.feat_dim, np.float32)
        out[: min(len(f), self.feat_dim)] = f[: self.feat_dim]
        return out

    def _audio_feats(self, payload: bytes) -> np.ndarray:
        x, rate = decode_wav_pcm16(payload)
        if not len(x):
            return np.zeros(self.feat_dim, np.float32)
        rms = float(np.sqrt(np.mean(x**2)))
        zcr = float(np.mean(np.abs(np.diff(np.signbit(x).astype(np.int8)))))
        spec = np.abs(np.fft.rfft(x))
        bands = np.array(
            [b.mean() for b in np.array_split(spec, max(1, self.feat_dim - 3))]
        )
        bands = bands / (bands.max() + 1e-9)
        f = np.concatenate([[rms, zcr, len(x) / rate], bands])
        out = np.zeros(self.feat_dim, np.float32)
        out[: min(len(f), self.feat_dim)] = f[: self.feat_dim]
        return out

    def _video_feats(self, payload: bytes) -> np.ndarray:
        frames = decode_ppm_stream(payload)
        if not frames:
            return np.zeros(self.feat_dim, np.float32)
        lum = np.array(
            [f.astype(np.float32).mean() / 255.0 for f in frames]
        )
        # temporal signature: frame count, luminance mean/std, motion
        # energy (mean per-pixel |Δ| between consecutive frames — mean
        # luminance alone is invariant to translation), plus the middle
        # frame's per-channel means
        if len(frames) > 1:
            stack = np.stack(
                [f.astype(np.float32) / 255.0 for f in frames]
            )
            motion = float(np.abs(np.diff(stack, axis=0)).mean())
        else:
            motion = 0.0
        mid = frames[len(frames) // 2].astype(np.float32) / 255.0
        f = np.concatenate(
            [
                [len(frames), lum.mean(), lum.std(), motion],
                mid.mean(axis=(0, 1)),
            ]
        )
        out = np.zeros(self.feat_dim, np.float32)
        out[: min(len(f), self.feat_dim)] = f[: self.feat_dim]
        return out

    def _real_decode(self, payload: bytes, mime: str) -> np.ndarray:
        if mime == "image/x-portable-pixmap":
            return self._image_feats(payload)
        if mime == "audio/wav":
            return self._audio_feats(payload)
        if mime == "video/x-ppm-stream":
            return self._video_feats(payload)
        # unknown container (e.g. formats needing ffmpeg/PIL, absent in
        # this environment) — deterministic fallback
        return self._hash_feats(payload)

    def __call__(self, batch: pa.Table) -> pa.Table:
        feats = [
            self._decode(p.as_py(), m)
            for p, m in zip(batch.column("payload"), batch.column("mime").to_pylist())
        ]
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
    ds: rd.Dataset, concurrency=2, batch_size: int = 256,
    decoder: str = "real",
) -> rd.Dataset:
    """Actor-pool featurize stage; small batches because binary payloads
    dominate block bytes."""
    return ds.map_batches(
        MediaFeaturizer,
        fn_constructor_kwargs=dict(decoder=decoder),
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


class ImageResizer:
    """Actor-pool stage: real nearest-neighbour resize of PPM payloads
    (non-image rows pass through untouched)."""

    def __init__(self, out_w: int = 16, out_h: int = 16):
        self.out_w, self.out_h = out_w, out_h

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = []
        for p, m in zip(
            batch.column("payload"), batch.column("mime").to_pylist()
        ):
            raw = p.as_py()
            if m == "image/x-portable-pixmap":
                img = decode_ppm(raw)
                h, w, _ = img.shape
                ri = (np.arange(self.out_h) * h // self.out_h)
                ci = (np.arange(self.out_w) * w // self.out_w)
                raw = encode_ppm(img[np.ix_(ri, ci)])
            payloads.append(raw)
        i = batch.column_names.index("payload")
        return batch.set_column(i, "payload", pa.array(payloads, pa.binary()))


def resize_images(
    ds: rd.Dataset, out_w: int = 16, out_h: int = 16,
    concurrency=2, batch_size: int = 256,
) -> rd.Dataset:
    return ds.map_batches(
        ImageResizer,
        fn_constructor_kwargs=dict(out_w=out_w, out_h=out_h),
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


class AudioResampler:
    """Actor-pool stage: REAL sample-rate conversion of WAV/PCM16
    payloads by linear interpolation (numpy only — no audio libs in
    this container, and linear resampling is the honest baseline;
    swap a polyphase kernel in ``__init__`` when scipy is present).
    Non-audio rows pass through untouched."""

    def __init__(self, out_rate: int = 16_000):
        self.out_rate = int(out_rate)

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = []
        for p, m in zip(
            batch.column("payload"), batch.column("mime").to_pylist()
        ):
            raw = p.as_py()
            if m == "audio/wav":
                samples, rate = decode_wav_pcm16(raw)
                if rate != self.out_rate and len(samples) > 1:
                    n_out = max(1, int(round(
                        len(samples) * self.out_rate / rate)))
                    x_out = np.arange(n_out) * (rate / self.out_rate)
                    y = np.interp(
                        x_out, np.arange(len(samples)),
                        samples.astype(np.float64))
                    samples = np.clip(
                        np.rint(y), -32768, 32767).astype(np.int16)
                raw = encode_wav_pcm16(samples, self.out_rate)
            payloads.append(raw)
        i = batch.column_names.index("payload")
        return batch.set_column(
            i, "payload", pa.array(payloads, pa.binary()))


def resample_audio(
    ds: rd.Dataset, out_rate: int = 16_000,
    concurrency=2, batch_size: int = 256,
) -> rd.Dataset:
    """Audio rows re-encoded at ``out_rate`` (actor pool — setup once
    per actor, per-batch decode/interp/encode; small batches because
    binary payloads dominate block bytes)."""
    return ds.map_batches(
        AudioResampler,
        fn_constructor_kwargs=dict(out_rate=out_rate),
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


class FrameSampler:
    """Actor-pool stage: REAL video frame sampling — PPM-stream rows
    fan out 1→K to per-frame IMAGE rows (every ``every_k``-th frame,
    re-encoded as standalone P6 payloads the image stages accept).
    Non-video rows are dropped; small batches, the fan-out multiplies
    payload bytes."""

    def __init__(self, every_k: int = 4):
        self.every_k = every_k

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, idxs, payloads, ws, hs = [], [], [], [], []
        mids = batch.column("media_id").to_pylist()
        mimes = batch.column("mime").to_pylist()
        for mid, mime, p in zip(
            mids, mimes, batch.column("payload")
        ):
            if mime != "video/x-ppm-stream":
                continue
            frames = decode_ppm_stream(p.as_py())
            for fi in range(0, len(frames), self.every_k):
                ids.append(mid)
                idxs.append(fi)
                payloads.append(encode_ppm(frames[fi]))
                hs.append(frames[fi].shape[0])
                ws.append(frames[fi].shape[1])
        return pa.table(
            {
                "media_id": pa.array(ids, pa.int64()),
                "frame_idx": pa.array(idxs, pa.int32()),
                "mime": pa.array(
                    ["image/x-portable-pixmap"] * len(ids), pa.string()
                ),
                "payload": pa.array(payloads, pa.binary()),
                "width": pa.array(ws, pa.int32()),
                "height": pa.array(hs, pa.int32()),
            }
        )


def sample_frames(
    ds: rd.Dataset, every_k: int = 4,
    concurrency=2, batch_size: int = 64,
) -> rd.Dataset:
    """Video → decoded per-frame image rows (actor pool; real 1→K
    fan-out with standalone PPM payloads)."""
    return ds.map_batches(
        FrameSampler,
        fn_constructor_kwargs=dict(every_k=every_k),
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


def frame_sample_plan(
    ds: rd.Dataset, every_ms: int = 1000
) -> rd.Dataset:
    """Video → per-frame rows (metadata-only 1→K fan-out plan; see
    ``sample_frames`` for the real decoded fan-out)."""

    def fn(batch: pa.Table) -> pa.Table:
        ids, ts = [], []
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
