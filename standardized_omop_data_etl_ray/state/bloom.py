"""Per-file key-hash bloom sidecars — file skipping for point lookups.

Hash-partitioned delta files each span roughly the WHOLE key range of
their partition (hash routing scatters keys across the lexicographic
space), so the manifest zone maps (per-file key min/max) rarely prune
them — only clustered compaction slices carry tight ranges.  A bloom
filter over each file's ``key_hash`` values closes that gap: a point
lookup tests its sought hashes against a ~1.25-byte-per-key sidecar
and skips the file on a definite miss (no false negatives; ~1% false
positives at the default sizing, which only cost a wasted read).

This is the Iceberg-puffin / parquet-bloom pattern kept OUTSIDE the
manifest on purpose: sidecars are immutable blobs written tmp+rename
next to their data file at phase 1 (crash-safe — a missing or
truncated sidecar just means "no pruning", never a wrong answer),
reclaimed with their file at gc, and hardlinked by clone.  Keeping
them out of the manifest keeps the per-commit driver payload at ≤P
stats rows regardless of key cardinality — the property the commit
path is built around.

Reference parity note: the reference engine has no point-read path at
all (full-file pandas scans, e.g. combine_subtables.py); this is part
of the lake machinery the Ray-native design adds for 10^10-key scale.
"""

from __future__ import annotations

import struct

import numpy as np

MAGIC = b"BLM1"
_HEADER = struct.Struct("<4sIQ")  # magic, k probes, m bits
# golden-ratio mix for the second hash of double hashing; OR 1 keeps
# the stride odd so probes cover the bit space
_MIX = np.uint64(0x9E3779B97F4A7C15)

DEFAULT_BITS_PER_KEY = 10
DEFAULT_K = 7  # ≈0.82% theoretical fpr at 10 bits/key


def _probes(kh: np.ndarray, k: int, m_bits: np.uint64):
    """Yield the k probe positions for each hash (double hashing)."""
    with np.errstate(over="ignore"):
        h2 = (kh * _MIX) | np.uint64(1)
        for i in range(k):
            yield (kh + np.uint64(i) * h2) % m_bits


def build(key_hashes, bits_per_key: int = DEFAULT_BITS_PER_KEY,
          k: int = DEFAULT_K) -> bytes:
    """Serialize a bloom filter over uint64 key hashes.

    Vectorized: dedup → k probe-position arrays → one
    ``np.bitwise_or.at`` scatter per probe.  Size is
    ``bits_per_key × distinct keys`` rounded up to whole bytes
    (minimum 64 bits), independent of key width — the sidecar for a
    16k-key delta is ~20 KB next to a multi-MB parquet file.
    """
    kh = np.unique(np.asarray(key_hashes, dtype=np.uint64))
    n = len(kh)
    m_bits = np.uint64(max(64, int(bits_per_key) * max(n, 1)))
    arr = np.zeros((int(m_bits) + 7) // 8, dtype=np.uint8)
    if n:
        for pos in _probes(kh, k, m_bits):
            np.bitwise_or.at(
                arr, (pos >> np.uint64(3)).astype(np.int64),
                np.left_shift(
                    np.uint8(1), (pos & np.uint64(7)).astype(np.uint8)
                ),
            )
    return _HEADER.pack(MAGIC, k, int(m_bits)) + arr.tobytes()


def might_contain(blob: bytes, key_hashes) -> np.ndarray:
    """Per-hash membership mask (no false negatives).

    A malformed/truncated blob returns all-True — pruning degrades to
    "read the file", never to a missed row.
    """
    kh = np.asarray(key_hashes, dtype=np.uint64)
    try:
        magic, k, m_bits = _HEADER.unpack_from(blob)
        if magic != MAGIC or m_bits <= 0:
            raise ValueError("bad bloom header")
        arr = np.frombuffer(blob, dtype=np.uint8, offset=_HEADER.size)
        if len(arr) * 8 < m_bits:
            raise ValueError("truncated bloom body")
    except (struct.error, ValueError):
        return np.ones(len(kh), dtype=bool)
    mask = np.ones(len(kh), dtype=bool)
    m = np.uint64(m_bits)
    for pos in _probes(kh, k, m):
        bit = (
            arr[(pos >> np.uint64(3)).astype(np.int64)]
            >> (pos & np.uint64(7)).astype(np.uint8)
        ) & np.uint8(1)
        mask &= bit.astype(bool)
        if not mask.any():
            break
    return mask


def sidecar_path(data_file_path):
    """The sidecar name convention: ``<file>.bloom`` next to the data
    file.  Kept out of every reader's ``*.parquet`` glob by suffix."""
    from pathlib import Path

    p = Path(data_file_path)
    return p.with_name(p.name + ".bloom")
