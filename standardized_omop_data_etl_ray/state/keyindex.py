"""Per-partition key index: key_hash → (lsn, content_sha, is_tombstone).

The stateful analog of the reference's accumulated merge key-set
(combine_subtables.py:89-124 grows a DataFrame and recomputes key sets
per iteration — SURVEY.md §2.3 T5).  Ours is an O(1)-lookup dict with
LSN-idempotent upsert, rebuildable from the lake's committed delta files
(so an applier actor that dies is reconstructed from the last manifest,
not from lost memory).

At 10^10-key scale a partition's index outgrows RAM: the design slot for
that is `spill_threshold` — beyond it the index would page cold ranges
to sorted runs on disk (RocksDB-style).  In-sandbox we keep the dict hot
and document the boundary; the interface (`apply`, `bulk_load`,
`watermark`) is what the spilled variant must preserve.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


class KeyIndex:
    __slots__ = ("lsn", "sha", "dead", "watermark")

    def __init__(self) -> None:
        self.lsn: dict[int, int] = {}
        self.sha: dict[int, str | None] = {}
        self.dead: set[int] = set()
        self.watermark: int = -1

    def __len__(self) -> int:
        return len(self.lsn) - len(self.dead)

    def bulk_load(self, table: pa.Table) -> None:
        """Load committed delta rows (op/lsn/key_hash/content_sha);
        LWW applies, so load order between files does not matter."""
        kh = table.column("key_hash").to_numpy(zero_copy_only=False)
        lsn = table.column("lsn").to_numpy(zero_copy_only=False)
        op = table.column("op").to_pylist()
        sha = table.column("content_sha").to_pylist()
        for k, l, o, s in zip(kh.tolist(), lsn.tolist(), op, sha):
            self._apply_one(k, l, o, s)
        if len(lsn):
            self.watermark = max(self.watermark, int(lsn.max()))

    def _apply_one(self, k: int, l: int, op: str, sha: str | None) -> bool:
        cur = self.lsn.get(k)
        if cur is not None and l <= cur:
            return False  # stale or duplicate: idempotent no-op
        self.lsn[k] = l
        self.sha[k] = sha
        if op == "D":
            self.dead.add(k)
        else:
            self.dead.discard(k)
        return True

    def accept_mask(self, table: pa.Table) -> np.ndarray:
        """Which incoming (already per-key LWW-combined) rows win against
        the index?  Applies the winners as a side effect."""
        kh = table.column("key_hash").to_numpy(zero_copy_only=False)
        lsn = table.column("lsn").to_numpy(zero_copy_only=False)
        op = table.column("op").to_pylist()
        sha = table.column("content_sha").to_pylist()
        out = np.zeros(len(kh), dtype=bool)
        for i, (k, l, o, s) in enumerate(zip(kh.tolist(), lsn.tolist(), op, sha)):
            out[i] = self._apply_one(k, l, o, s)
        if len(lsn):
            self.watermark = max(self.watermark, int(lsn.max()))
        return out
