"""Stateful actor-pool CDC apply: per-partition appliers with a live
key index + watermark (the north star's "actor pools holding
per-partition state").

This is the INCREMENTAL apply path, complementary to the batch path in
pipelines/cdc.py (which re-resolves LWW per epoch inside a shuffle):
each ``PartitionApplier`` actor owns a set of hash partitions and keeps
their key→(lsn, dead) index hot across micro-batches, so per-epoch work
is proportional to the epoch's events, not to epoch count × state size
— and a KEY-level stale event is rejected even when the partition
watermark would admit it.

Raw actors are justified here (SURVEY.md §7.4): the index is shared
mutable state across micro-batches, which `Dataset.map_batches` cannot
route by key.  Everything around it stays Ray Data: standardize +
per-block combine run as a streaming `map_batches` pipeline; only the
final per-partition routing uses `ray.remote` calls.

Data movement: routed partition slices NEVER enter the driver process —
``_route_block`` runs next to each block and returns ``{part:
ObjectRef}``; the driver forwards the (tiny) ref maps and appliers
``ray.get`` the slices worker-to-actor through the object store.

Exactly-once: the index supports epoch transactions
(state/keyindex.begin_epoch) — an in-process retry of a failed phase-2
commit re-runs the SAME epoch, which rolls the uncommitted index
mutations back so the events are re-accepted and the (deterministic)
delta files are rewritten.  Without that, the retry would reject the
whole epoch as duplicate and commit it empty (silent data loss).

Fault story: actors are stateless-recoverable — `__init__` rebuilds the
index from the last committed manifest's delta files; an actor lost
mid-epoch is rebuilt and the epoch re-sent (idempotent at key level).
The same two-phase manifest commit (state/manifest.py) applies.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

import ray
import ray.data as rd

from ..spec import TableSpec
from ..stages.merge import _partial
from ..stages.standardize import make_standardizer
from ..state import manifest as mf
from ..state.keyindex import KeyIndex


@ray.remote
class PartitionApplier:
    """Owns hash partitions {p : p % pool_size == pool_idx}."""

    def __init__(self, root: str, spec: TableSpec,
                 pool_idx: int, pool_size: int,
                 spill_threshold: int | None = None):
        from ..functions.hashing import tune_worker_threads
        from ..state.keyindex import SpillableKeyIndex

        tune_worker_threads()
        self.root, self.spec = root, spec
        self.table = spec.name
        self.my_parts = [
            p for p in range(spec.num_partitions) if p % pool_size == pool_idx
        ]
        if spill_threshold:
            self.index: dict[int, KeyIndex] = {
                p: SpillableKeyIndex(
                    Path(root) / self.table / "_spill" / f"part={p:05d}",
                    spill_threshold=spill_threshold,
                )
                for p in self.my_parts
            }
        else:
            self.index = {p: KeyIndex() for p in self.my_parts}
        # recover: rebuild each owned partition's index from the last
        # COMMITTED manifest (orphans from crashed epochs are invisible)
        m = mf.read_manifest(root, self.table)
        if m:
            troot = Path(root) / self.table
            for p in self.my_parts:
                pinfo = m["partitions"].get(str(p))
                if not pinfo:
                    continue
                for f in pinfo["files"]:
                    t = pq.read_table(
                        troot / f, columns=["op", "lsn", "key_hash"]
                    )
                    self.index[p].bulk_load(t)
                self.index[p].watermark = max(
                    self.index[p].watermark, pinfo["watermark"]
                )

    def apply(self, part: int, batches: list, epoch: int) -> dict:
        """Apply one epoch's (combined) events for one partition: accept
        key-level winners, write the delta file + phase-1 marker.

        ``batches`` may hold ObjectRefs (the routed path) or pa.Tables.
        """
        tables = [
            ray.get(b) if isinstance(b, ray.ObjectRef) else b for b in batches
        ]
        idx = self.index[part]
        idx.begin_epoch(epoch)  # rolls back an uncommitted retry
        table = (
            pa.concat_tables(tables, promote_options="permissive")
            if len(tables) > 1 else tables[0]
        )
        # Partition-watermark filter (the batch path's _watermark_filter
        # analog).  The per-key accept_mask alone cannot reject a
        # re-delivered PRE-delete event once compaction has dropped the
        # key's tombstone from the recovered file set — the rebuilt index
        # forgets the delete LSN and would resurrect the key.  After
        # begin_epoch, idx.watermark is exactly the committed watermark
        # relative to this epoch (an uncommitted retry was just rolled
        # back), so anything at or below it is a redelivery.
        if idx.watermark >= 0:
            lsns = table.column(self.spec.lsn_col)
            table = table.filter(pc.greater(lsns, idx.watermark))
        from ..stages.merge import lww_reduce_table

        table = lww_reduce_table(table, self.spec.key_cols, self.spec.lsn_col)
        mask = idx.accept_mask(table)
        delta = table.filter(pa.array(mask))
        delta = delta.sort_by([(c, "ascending") for c in self.spec.key_cols])
        n_dead = pc.sum(
            pc.cast(pc.equal(delta.column(self.spec.op_col), "D"), pa.int64())
        ).as_py() or 0
        info = {
            "part": part, "epoch": epoch, "rows": delta.num_rows,
            "tombstones": int(n_dead),
            "watermark": idx.watermark,
            "events_seen": table.num_rows,
            "live_keys": len(idx),
        }
        if delta.num_rows:
            pdir = Path(self.root) / self.table / f"part={part:05d}" / f"epoch={epoch:06d}"
            pdir.mkdir(parents=True, exist_ok=True)
            fpath = pdir / "delta.parquet"
            tmp = pdir / "delta.parquet.tmp"
            pq.write_table(delta, tmp)
            tmp.replace(fpath)
            info["file"] = str(fpath.relative_to(Path(self.root) / self.table))
            info["bytes"] = fpath.stat().st_size
            from ..functions.hashing import sha_rollup

            info["sha_rollup"] = sha_rollup(
                delta.column("content_sha").to_pylist()
            )
            mf.write_marker(self.root, self.table, epoch, part, info)
        return info

    def live_key_count(self) -> int:
        return sum(len(ix) for ix in self.index.values())


@ray.remote
def _route_block(block: pa.Table, num_partitions: int) -> list:
    """Split one combined block by partition near the data.  Invoked
    with ``num_returns=num_partitions + 1``: return[0] is the (tiny)
    list of populated partitions, return[1 + p] the slice for partition
    p — each slice becomes a TASK RETURN (owned by the driver and
    reconstructible via lineage if a worker dies), not a worker-owned
    ``ray.put`` that would be lost with its routing worker.  Only the
    ref handles pass through the driver; the slice bytes flow
    worker→actor via the object store."""
    parts = block.column("part").to_numpy(zero_copy_only=False)
    out: list = [None] * num_partitions
    present: list[int] = []
    for p in np.unique(parts):
        out[int(p)] = block.filter(pa.array(parts == p))
        present.append(int(p))
    return [present] + out


class ActorLake:
    """Incremental CDC lake driven by a stateful applier pool."""

    def __init__(self, root: str, spec: TableSpec | None = None,
                 pool_size: int = 4, spill_threshold: int | None = None):
        self.root = str(root)
        self.spec = spec or TableSpec(name="cdc")
        self.spill_threshold = spill_threshold
        m = mf.read_manifest(self.root, self.spec.name)
        if m is not None:
            # restore persisted schema (minus engine columns) + partitioning
            state_schema = mf.schema_from_b64(m["schema"])
            engine_cols = {"content_sha", "key_hash", "part"}
            self.spec.schema = pa.schema(
                [f for f in state_schema if f.name not in engine_cols]
            )
            self.spec.num_partitions = m["num_partitions"]
        self.pool_size = pool_size
        self.pool = [
            PartitionApplier.remote(
                self.root, self.spec, i, pool_size, self.spill_threshold,
            )
            for i in range(pool_size)
        ]

    def kill_pool(self) -> None:
        """Failure injection: lose all actor state."""
        for a in self.pool:
            ray.kill(a)
        self.pool = []

    def rebuild_pool(self) -> None:
        """Recovery: fresh actors rebuild indexes from the manifest."""
        self.pool = [
            PartitionApplier.remote(
                self.root, self.spec, i, self.pool_size, self.spill_threshold,
            )
            for i in range(self.pool_size)
        ]

    def apply_events(self, events: rd.Dataset,
                     _fail_before_commit: bool = False) -> dict:
        if getattr(self.spec, "patch_ops", False):
            raise NotImplementedError(
                "op='P' partial updates are supported on the CDCLake "
                "apply path only — the actor key-index path reduces to "
                "one winner per key and would drop patch rows"
            )
        m = mf.read_manifest(self.root, self.spec.name)
        # Epoch numbering must satisfy BOTH contracts (review finding):
        # the appliers' exactly-once-under-retry rollback keys on
        # epoch-number REUSE, while cross-process safety (a concurrent
        # maintenance writer on the same root) demands CLAIMED numbers.
        # So: an in-process retry of a still-uncommitted epoch reuses
        # its number (the claim is already ours); a fresh epoch claims
        # a new one.
        pending = getattr(self, "_pending_epoch", None)
        if pending is not None:
            epoch = pending
        else:
            epoch = mf.claim_epoch(self.root, self.spec.name,
                                   (m["epoch"] + 1) if m else 1)
        self._pending_epoch = epoch

        # schema evolution: unify the incoming event schema (add/widen
        # allowed, narrowing rejected) before standardize pads to target
        incoming = events.schema()
        self.spec.schema = self.spec.evolve(self.spec.apply_rename(
            pa.schema(list(zip(incoming.names, incoming.types)))
        ))

        std = events.map_batches(
            make_standardizer(self.spec), batch_format="pyarrow"
        ).map_batches(_partial(self.spec), batch_format="pyarrow")

        # route blocks to partition owners; only ref handles reach the
        # driver — the partition slices stay in the object store.  Ref
        # bundles are consumed AS THE PIPELINE STREAMS, so routing tasks
        # overlap the standardize/combine stages instead of waiting for
        # full materialization.
        P = self.spec.num_partitions
        routed = []
        for bundle in std.iter_internal_ref_bundles():
            for ref in bundle.block_refs:
                routed.append(
                    _route_block.options(num_returns=P + 1).remote(ref, P)
                )
        by_part: dict[int, list] = {}
        for refs in routed:
            for p in ray.get(refs[0]):  # tiny presence list only
                by_part.setdefault(p, []).append(refs[1 + p])

        futs = []
        for p, refs in by_part.items():
            owner = self.pool[p % self.pool_size]
            futs.append(owner.apply.remote(p, refs, epoch))
        stats = [s for s in ray.get(futs) if "file" in s or s["events_seen"]]

        record = {
            "epoch": epoch,
            "partitions_touched": len([s for s in stats if "file" in s]),
            "rows_upserted": sum(
                s["rows"] - s["tombstones"] for s in stats if "file" in s
            ),
            "tombstones": sum(s["tombstones"] for s in stats if "file" in s),
            "events_seen": sum(s["events_seen"] for s in stats),
            "live_keys": int(sum(
                ray.get([a.live_key_count.remote() for a in self.pool])
            )),
        }
        if _fail_before_commit:
            record["committed"] = False
            return record
        self._commit(m, epoch, [s for s in stats if "file" in s], record)
        self._pending_epoch = None  # committed: the next epoch is fresh
        record["committed"] = True
        return record

    def _commit(self, prev, epoch, stats, record):
        # fold under the cross-process lock against the manifest
        # re-read inside it (same rebase rule as CDCLake._commit): a
        # concurrent maintenance commit's files survive
        with mf.commit_lock(self.root, self.spec.name):
            prev = mf.read_manifest(self.root, self.spec.name) or prev
            self._commit_fold(prev, epoch, stats, record)

    def _commit_fold(self, prev, epoch, stats, record):
        partitions = dict(prev["partitions"]) if prev else {}
        lineage = list(prev.get("lineage", [])) if prev else []
        for s in stats:
            p = str(s["part"])
            old = partitions.get(p, {"files": [], "watermark": -1, "rows": 0})
            partitions[p] = {
                "files": old["files"] + [s["file"]],
                "watermark": max(old["watermark"], s["watermark"]),
                "rows": old["rows"] + s["rows"],
                "sha_rollup": s.get("sha_rollup"),
            }
        lineage.append(record)
        from .cdc import CDCLake  # reuse the state schema derivation

        schema_holder = CDCLake.__new__(CDCLake)
        schema_holder.spec = self.spec
        manifest = {
            "table": self.spec.name,
            "epoch": epoch,
            "num_partitions": self.spec.num_partitions,
            "schema": mf.schema_to_b64(schema_holder._state_schema()),
            "partitions": partitions,
            "lineage": lineage,
            "compacted": False,
        }
        mf.commit_manifest(self.root, self.spec.name, manifest)

    def _as_cdclake(self):
        from .cdc import CDCLake

        lake = CDCLake.__new__(CDCLake)
        lake.root, lake.spec = self.root, self.spec
        return lake

    def read_state(self, drop_engine_cols: bool = False) -> rd.Dataset:
        return self._as_cdclake().read_state(drop_engine_cols)

    def compact(self, max_files: int | None = None) -> dict:
        """Same COW compaction as the batch lake (shared manifests),
        then rebuild the pool so actor recovery reads the compacted file
        set.  Compaction drops tombstones from rewritten files; rebuilt
        indexes therefore forget delete LSNs, which is safe only because
        apply() also rejects rows at or below the recovered partition
        watermark (see the filter in PartitionApplier.apply)."""
        record = self._as_cdclake().compact(max_files)
        self.rebuild_pool()
        return record

    def gc(self) -> list[str]:
        return self._as_cdclake().gc()

    def lineage(self) -> list[dict]:
        return self._as_cdclake().lineage()

    def partition_metrics(self) -> pa.Table:
        return self._as_cdclake().partition_metrics()
