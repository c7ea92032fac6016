"""Per-partition key index: key_hash → (lsn, is_tombstone).

The stateful analog of the reference's accumulated merge key-set
(combine_subtables.py:89-124 grows a DataFrame and recomputes key sets
per iteration — SURVEY.md §2.3 T5).  Ours stores the index as parallel
numpy arrays SORTED by key_hash; every batch operation is vectorized
(lexsort + searchsorted merge), never a Python loop over rows.

Epoch transactions (exactly-once with the two-phase manifest):
accepting an epoch's events mutates the index BEFORE the driver's
phase-2 commit, so a retry of a failed epoch must not see the
uncommitted mutations (it would reject everything as duplicate and
silently commit an empty epoch).  ``begin_epoch(e)`` makes apply
idempotent: arrays are copy-on-write, so a snapshot is O(1) refs;
calling ``begin_epoch`` with the SAME epoch as the pending one (only
possible when that epoch's commit failed) rolls back to the snapshot,
while a LARGER epoch promotes it (the previous commit succeeded).

At 10^10-key scale a partition's index outgrows RAM:
``SpillableKeyIndex`` pages the hot arrays to SORTED parquet runs on
disk when they cross ``spill_threshold`` (LSM/RocksDB-style): lookups
go hot → runs newest-first, locating candidate row groups via the
run's in-RAM fence keys (min key per 4k-row group) and reading just
those groups — one batched probe per accept call, not one read per
key.  Runs compact (LWW by lsn) when their count exceeds ``max_runs``.
Memory per partition is O(threshold + runs × fences), not O(keys).
Spills are deferred while an epoch is pending (rollback could not
un-write a run), so hot memory is bounded by threshold + one epoch's
partition slice.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

_ABSENT = np.int64(-(2**62))


def _table_cols(
    table: pa.Table, lsn_col: str = "lsn", op_col: str = "op"
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(key_hash u64, lsn i64, dead bool) from an event/delta table."""
    kh = table.column("key_hash").to_numpy(zero_copy_only=False)
    kh = np.ascontiguousarray(kh, dtype=np.uint64)
    lsn = table.column(lsn_col).to_numpy(zero_copy_only=False)
    lsn = np.ascontiguousarray(lsn, dtype=np.int64)
    dead = pc.equal(table.column(op_col), pa.scalar("D")).to_numpy(
        zero_copy_only=False
    )
    return kh, lsn, np.ascontiguousarray(dead, dtype=bool)


def _per_key_winners(
    kh: np.ndarray, lsn: np.ndarray, dead: np.ndarray
) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Reduce to one row per key (max lsn), sorted by key.  The fourth
    return is each winner's index into the INPUT arrays (so callers can
    gather per-row side data, e.g. already-fetched prior lookups)."""
    order = np.lexsort((-lsn, kh))
    k = kh[order]
    first = np.empty(len(k), dtype=bool)
    first[:1] = True
    first[1:] = k[1:] != k[:-1]
    sel = order[first]
    return kh[sel], lsn[sel], dead[sel], sel


class KeyIndex:
    __slots__ = ("_keys", "_lsn", "_dead", "_live", "watermark",
                 "_pending_epoch", "_snap", "lsn_col", "op_col")

    def __init__(self, lsn_col: str = "lsn", op_col: str = "op") -> None:
        self._keys = np.empty(0, np.uint64)   # sorted, unique
        self._lsn = np.empty(0, np.int64)
        self._dead = np.empty(0, bool)
        self._live = 0
        self.watermark: int = -1
        self._pending_epoch: int | None = None
        self._snap = None
        self.lsn_col, self.op_col = lsn_col, op_col

    def __len__(self) -> int:
        return self._live

    # -- epoch transactions ------------------------------------------------

    def begin_epoch(self, epoch: int) -> None:
        """Start (or idempotently RESTART) an epoch's apply.

        Same epoch as the pending one → the previous apply's commit never
        happened; roll back to the pre-epoch snapshot so the retry's
        events are accepted again.  Larger epoch → the pending epoch
        committed; promote (drop the snapshot).
        """
        if self._pending_epoch is not None:
            if epoch == self._pending_epoch:
                self._restore(self._snap)
            # epoch > pending: committed — fall through and re-snapshot
        self._pending_epoch = epoch
        self._snap = self._snapshot()

    def _snapshot(self):
        # arrays are copy-on-write (every merge builds new ones) → O(1)
        return (self._keys, self._lsn, self._dead, self._live, self.watermark)

    def _restore(self, snap) -> None:
        (self._keys, self._lsn, self._dead, self._live, self.watermark) = snap

    # -- lookups -----------------------------------------------------------

    def _hot_lookup(self, kh: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        """(lsn, dead) per probe key from the in-RAM arrays only;
        lsn == _ABSENT where the key is not in the hot arrays."""
        out_l = np.full(len(kh), _ABSENT, np.int64)
        out_d = np.zeros(len(kh), bool)
        if len(self._keys):
            pos = np.searchsorted(self._keys, kh)
            pos[pos == len(self._keys)] = len(self._keys) - 1
            found = self._keys[pos] == kh
            out_l[found] = self._lsn[pos[found]]
            out_d[found] = self._dead[pos[found]]
        return out_l, out_d

    def _lookup(self, kh: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        """(lsn, dead) per probe key; lsn == _ABSENT where unknown.
        SpillableKeyIndex extends this with run probes."""
        return self._hot_lookup(kh)

    # -- mutation ----------------------------------------------------------

    def _apply_winners(self, wk, wl, wd, prior_l=None, prior_d=None) -> None:
        """Merge per-key winners (sorted unique keys, each already known
        to beat the current index entry) into new arrays.  Callers that
        already looked the winners up (accept_mask/bulk_load seeds) pass
        ``prior_l``/``prior_d`` so the spilled runs aren't probed twice
        per apply."""
        if not len(wk):
            return
        # live accounting consults the FULL prior state (hot + runs)…
        if prior_l is None:
            prior_l, prior_d = self._lookup(wk)
        exists_any = prior_l != _ABSENT
        was_live = exists_any & ~prior_d
        now_live = ~wd
        self._live += int((now_live & ~was_live).sum())
        self._live -= int((was_live & ~now_live).sum())

        # …but the array merge positions only the HOT presence
        hot_l, _ = self._hot_lookup(wk)
        exists = hot_l != _ABSENT
        keys2 = self._keys.copy()
        lsn2 = self._lsn.copy()
        dead2 = self._dead.copy()
        if exists.any():
            pos = np.searchsorted(keys2, wk[exists])
            lsn2[pos] = wl[exists]
            dead2[pos] = wd[exists]
        new = ~exists
        if new.any():
            ipos = np.searchsorted(keys2, wk[new])
            keys2 = np.insert(keys2, ipos, wk[new])
            lsn2 = np.insert(lsn2, ipos, wl[new])
            dead2 = np.insert(dead2, ipos, wd[new])
        self._keys, self._lsn, self._dead = keys2, lsn2, dead2

    def bulk_load(self, table: pa.Table) -> None:
        """Load committed delta rows (op/lsn/key_hash columns); LWW
        applies, so load order between files does not matter."""
        if table.num_rows == 0:
            return
        kh, lsn, dead = _table_cols(table, self.lsn_col, self.op_col)
        wk, wl, wd, _ = _per_key_winners(kh, lsn, dead)
        seed, seed_d = self._lookup(wk)
        m = wl > seed
        self._apply_winners(wk[m], wl[m], wd[m], seed[m], seed_d[m])
        self.watermark = max(self.watermark, int(lsn.max()))
        self._maybe_spill()

    def accept_mask(self, table: pa.Table) -> np.ndarray:
        """Which incoming rows win against the index (sequential-scan
        semantics: a row is accepted iff its lsn strictly exceeds both
        the index entry and every earlier same-key row in the batch)?
        Applies the winners as a side effect."""
        if table.num_rows == 0:
            return np.zeros(0, dtype=bool)
        kh, lsn, dead = _table_cols(table, self.lsn_col, self.op_col)
        n = len(kh)
        seed, seed_dead = self._lookup(kh)

        order = np.argsort(kh, kind="stable")  # key groups, original order
        sk, sl, ss = kh[order], lsn[order], seed[order]
        gstart = np.empty(n, dtype=bool)
        gstart[:1] = True
        gstart[1:] = sk[1:] != sk[:-1]
        gid = np.cumsum(gstart) - 1
        cummax = pd.Series(sl).groupby(gid).cummax().to_numpy()
        excl = np.empty(n, np.int64)
        excl[0] = _ABSENT
        excl[1:] = cummax[:-1]
        excl[gstart] = _ABSENT
        acc_sorted = sl > np.maximum(excl, ss)
        mask = np.empty(n, dtype=bool)
        mask[order] = acc_sorted

        if mask.any():
            midx = np.flatnonzero(mask)
            wk, wl, wd, sel = _per_key_winners(
                kh[mask], lsn[mask], dead[mask]
            )
            # winners' priors were already fetched in the seed pass —
            # reuse them instead of re-probing the spilled runs
            self._apply_winners(
                wk, wl, wd, seed[midx[sel]], seed_dead[midx[sel]]
            )
        self.watermark = max(self.watermark, int(lsn.max()))
        self._maybe_spill()
        return mask

    def _maybe_spill(self) -> None:  # hook for SpillableKeyIndex
        pass


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
        self._fences: list[np.ndarray] = []     # min key per row group
        self._files: list[Path] = []
        self._run_seq = 0

    # -- spill machinery ---------------------------------------------------

    def _maybe_spill(self) -> None:
        # deferred while an epoch is pending: a rollback could not
        # un-write the run file; begin_epoch flushes after promotion
        if self._pending_epoch is None and len(self._keys) > self.spill_threshold:
            self._flush()

    def begin_epoch(self, epoch: int) -> None:
        promoted = (
            self._pending_epoch is not None and epoch > self._pending_epoch
        )
        super().begin_epoch(epoch)
        if promoted and len(self._keys) > self.spill_threshold:
            # flush the now-committed hot set, then re-snapshot the
            # (empty-hot) state so a rollback of THIS epoch is consistent
            self._flush()
            self._snap = self._snapshot()

    def _flush(self) -> None:
        if not len(self._keys):
            return
        t = pa.table(
            {
                "key_hash": pa.array(self._keys, pa.uint64()),
                "lsn": pa.array(self._lsn, pa.int64()),
                "dead": pa.array(self._dead, pa.bool_()),
            }
        )
        path = self.spill_dir / f"run-{self._run_seq:06d}.parquet"
        self._run_seq += 1
        pq.write_table(t, path, row_group_size=_RUN_ROW_GROUP)
        self._register_run(path)
        self._keys = np.empty(0, np.uint64)
        self._lsn = np.empty(0, np.int64)
        self._dead = np.empty(0, bool)
        if len(self._runs) > self.max_runs:
            self._compact_runs()

    def _register_run(self, path: Path) -> None:
        f = pq.ParquetFile(path)
        fences = np.array(
            [
                f.metadata.row_group(i).column(0).statistics.min
                for i in range(f.metadata.num_row_groups)
            ],
            dtype=np.uint64,
        )
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
            SELECT key_hash, lsn, dead FROM (
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

    # -- overridden lookups ------------------------------------------------

    def _snapshot(self):
        # run state only changes via _flush/_compact, which never happen
        # while an epoch is pending — hot arrays + counters suffice
        return super()._snapshot()

    def _lookup(self, kh: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        out_l, out_d = super()._lookup(kh)
        unresolved = out_l == _ABSENT
        if not unresolved.any() or not self._runs:
            return out_l, out_d
        probe_idx = np.where(unresolved)[0]
        probe = kh[probe_idx]
        for ri in range(len(self._runs) - 1, -1, -1):  # newest first
            if not len(probe_idx):
                break
            fences = self._fences[ri]
            rg = np.searchsorted(fences, probe, side="right") - 1
            in_range = rg >= 0
            if not in_range.any():
                continue
            needed = np.unique(rg[in_range])
            t = self._runs[ri].read_row_groups(
                needed.tolist(), columns=["key_hash", "lsn", "dead"]
            )
            rk = t.column("key_hash").to_numpy()
            rl = t.column("lsn").to_numpy()
            rd = t.column("dead").to_numpy(zero_copy_only=False)
            pos = np.searchsorted(rk, probe)
            pos_c = np.minimum(pos, len(rk) - 1)
            found = in_range & (rk[pos_c] == probe)
            if found.any():
                tgt = probe_idx[found]
                out_l[tgt] = rl[pos_c[found]]
                out_d[tgt] = rd[pos_c[found]]
            probe_idx = probe_idx[~found]
            probe = probe[~found]
        return out_l, out_d
