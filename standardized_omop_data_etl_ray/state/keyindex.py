"""Per-partition key index: key_hash → (lsn, content_sha, is_tombstone).

The stateful analog of the reference's accumulated merge key-set
(combine_subtables.py:89-124 grows a DataFrame and recomputes key sets
per iteration — SURVEY.md §2.3 T5).  Ours is an O(1)-lookup dict with
LSN-idempotent upsert, rebuildable from the lake's committed delta files
(so an applier actor that dies is reconstructed from the last manifest,
not from lost memory).

At 10^10-key scale a partition's index outgrows RAM:
``SpillableKeyIndex`` pages the hot dict to SORTED parquet runs on disk
when it crosses ``spill_threshold`` (LSM/RocksDB-style): lookups go
hot-dict → runs newest-first, locating the candidate row group via the
run's in-RAM fence keys (min key per 4k-row group) and reading just that
row group; runs compact (LWW by lsn) when their count exceeds
``max_runs``.  Memory per partition is O(threshold + runs × fences),
not O(keys).
"""

from __future__ import annotations

import bisect
from pathlib import Path

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


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


_RUN_ROW_GROUP = 4096


class SpillableKeyIndex(KeyIndex):
    """LSM-style spilling variant — bounded memory per partition."""

    __slots__ = ("spill_dir", "spill_threshold", "max_runs",
                 "_runs", "_fences", "_files", "_run_seq")

    def __init__(self, spill_dir: str, spill_threshold: int = 500_000,
                 max_runs: int = 4):
        super().__init__()
        self.spill_dir = Path(spill_dir)
        # runs are a cache derived from committed manifests: a rebuilt
        # owner starts clean (stale runs from a dead incarnation would
        # otherwise linger unregistered)
        import shutil

        shutil.rmtree(self.spill_dir, ignore_errors=True)
        self.spill_dir.mkdir(parents=True, exist_ok=True)
        self.spill_threshold = spill_threshold
        self.max_runs = max_runs
        self._runs: list[pq.ParquetFile] = []   # newest LAST
        self._fences: list[list[int]] = []      # min key per row group
        self._files: list[Path] = []
        self._run_seq = 0

    # -- spill machinery --------------------------------------------------

    def _flush(self) -> None:
        if not self.lsn:
            return
        keys = np.fromiter(self.lsn.keys(), dtype=np.uint64, count=len(self.lsn))
        order = np.argsort(keys)
        keys = keys[order]
        lsns = np.fromiter(self.lsn.values(), dtype=np.int64)[order]
        shas = np.array(list(self.sha.values()), dtype=object)[order]
        dead = np.isin(keys, np.fromiter(self.dead, dtype=np.uint64,
                                         count=len(self.dead)))
        t = pa.table(
            {
                "key_hash": pa.array(keys, pa.uint64()),
                "lsn": pa.array(lsns, pa.int64()),
                "content_sha": pa.array(shas, pa.string()),
                "dead": pa.array(dead, pa.bool_()),
            }
        )
        path = self.spill_dir / f"run-{self._run_seq:06d}.parquet"
        self._run_seq += 1
        pq.write_table(t, path, row_group_size=_RUN_ROW_GROUP)
        self._register_run(path)
        self.lsn.clear()
        self.sha.clear()
        self.dead.clear()
        if len(self._runs) > self.max_runs:
            self._compact_runs()

    def _register_run(self, path: Path) -> None:
        f = pq.ParquetFile(path)
        fences = [
            f.metadata.row_group(i).column(0).statistics.min
            for i in range(f.metadata.num_row_groups)
        ]
        self._runs.append(f)
        self._fences.append(fences)
        self._files.append(path)

    def _compact_runs(self) -> None:
        """LWW-merge all runs into one (duckdb window over the files)."""
        import duckdb

        con = duckdb.connect()
        con.execute("SET threads TO 1")
        files = [str(p) for p in self._files]
        merged = con.execute(
            """
            SELECT key_hash, lsn, content_sha, dead FROM (
                SELECT *, ROW_NUMBER() OVER (
                    PARTITION BY key_hash ORDER BY lsn DESC
                ) AS rn FROM read_parquet(?)
            ) WHERE rn = 1 ORDER BY key_hash
            """,
            [files],
        ).fetch_arrow_table()
        con.close()
        for p in self._files:
            p.unlink()
        self._runs, self._fences, self._files = [], [], []
        path = self.spill_dir / f"run-{self._run_seq:06d}.parquet"
        self._run_seq += 1
        pq.write_table(merged, path, row_group_size=_RUN_ROW_GROUP)
        self._register_run(path)

    def _lookup_spilled(self, k: int) -> tuple[int, bool] | None:
        """(lsn, dead) from the newest run containing k, else None."""
        for ri in range(len(self._runs) - 1, -1, -1):
            fences = self._fences[ri]
            rg = bisect.bisect_right(fences, k) - 1
            if rg < 0:
                continue
            t = self._runs[ri].read_row_group(rg, columns=["key_hash", "lsn", "dead"])
            kh = t.column("key_hash").to_numpy()
            pos = np.searchsorted(kh, np.uint64(k))
            if pos < len(kh) and kh[pos] == np.uint64(k):
                return int(t.column("lsn")[pos].as_py()), bool(
                    t.column("dead")[pos].as_py()
                )
        return None

    # -- overridden core ---------------------------------------------------

    def _apply_one(self, k: int, l: int, op: str, sha: str | None) -> bool:
        cur = self.lsn.get(k)
        if cur is None:
            hit = self._lookup_spilled(k)
            if hit is not None:
                cur = hit[0]
        if cur is not None and l <= cur:
            return False
        self.lsn[k] = l
        self.sha[k] = sha
        if op == "D":
            self.dead.add(k)
        else:
            self.dead.discard(k)
        if len(self.lsn) > self.spill_threshold:
            self._flush()
        return True

    def __len__(self) -> int:  # live keys across hot + runs (hot wins)
        hot = set(self.lsn)
        live = len(hot) - len(self.dead)
        seen = set(hot)
        for ri in range(len(self._runs) - 1, -1, -1):
            t = self._runs[ri].read(columns=["key_hash", "dead"])
            kh = t.column("key_hash").to_numpy()
            dd = t.column("dead").to_numpy(zero_copy_only=False)
            for k, d in zip(kh.tolist(), dd.tolist()):
                if k not in seen:
                    seen.add(k)
                    if not d:
                        live += 1
        return live
