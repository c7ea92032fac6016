"""add_column DDL: declarative column add on a live lake.

Nullable add (default=None) is logical-only — one manifest commit,
reads fill NULL on scan.  Backfill add (default=value) rewrites live
files with the constant appended, then swaps the manifest once.
Re-adding a dropped name forces the physical-rewrite path (drop is
logical, so stale bytes may survive in live files): the old column is
replaced with the default/NULL instead of resurrected.
"""

import pyarrow as pa
import pyarrow.compute as pc
import pytest
import ray
import ray.data as rd

from standardized_omop_data_etl_ray.datagen import make_change_events, micro_batches
from standardized_omop_data_etl_ray.pipelines.cdc import CDCLake
from standardized_omop_data_etl_ray.spec import TableSpec
from standardized_omop_data_etl_ray.state import manifest as mf

WINDOW = 400
EVENTS = make_change_events(n_keys=150, n_events=1800, seed=33,
                            window=WINDOW, evolve_after_frac=0.0)
BATCHES = list(micro_batches(EVENTS, batch_windows=2, window=WINDOW))


def _state(lake, at_epoch=None) -> pa.Table:
    refs = lake.read_state(at_epoch=at_epoch).to_arrow_refs()
    tabs = [t for t in ray.get(refs) if t.num_rows]
    return pa.concat_tables(tabs) if tabs else pa.table({})


def test_add_column_nullable_is_logical(tmp_path):
    spec = TableSpec(name="cdc", num_partitions=8)
    lake = CDCLake(tmp_path, spec)
    lake.apply_events(rd.from_arrow(BATCHES[0]))
    pre_epoch = mf.read_manifest(str(tmp_path), "cdc")["epoch"]
    n_files_before = sum(
        len(i["files"]) for i in
        mf.read_manifest(str(tmp_path), "cdc")["partitions"].values())

    rec = lake.add_column("stars", pa.int64())
    assert rec["ddl"] == "add_column" and rec["compaction"]
    assert "files_rewritten" not in rec  # logical: nothing rewritten
    m = mf.read_manifest(str(tmp_path), "cdc")
    assert sum(len(i["files"]) for i in m["partitions"].values()) \
        == n_files_before

    st = _state(lake)
    assert st.schema.field("stars").type == pa.int64()
    assert st.column("stars").null_count == st.num_rows

    # time travel: pre-DDL snapshot has no such column
    tt = _state(lake, at_epoch=pre_epoch)
    assert "stars" not in tt.column_names

    # refusals
    with pytest.raises(ValueError):
        lake.add_column("stars", pa.int64())       # already exists
    with pytest.raises(ValueError):
        lake.add_column("content_sha", pa.string())  # engine column
    with pytest.raises(ValueError):
        lake.add_column("bad", pa.int64(), default="xx")  # bad default

    # later events still land; new column stays null-filled for them
    lake.apply_events(rd.from_arrow(BATCHES[1]))
    st2 = _state(lake)
    assert st2.column("stars").null_count == st2.num_rows


def test_add_column_with_default_backfills(tmp_path):
    spec = TableSpec(name="cdc", num_partitions=8)
    lake = CDCLake(tmp_path, spec)
    lake.apply_events(rd.from_arrow(BATCHES[0]))
    before = _state(lake)

    rec = lake.add_column("grade", pa.string(), default="B")
    assert rec["files_rewritten"] > 0
    st = _state(lake)
    assert st.num_rows == before.num_rows
    assert pc.all(pc.equal(st.column("grade"), "B")).as_py()
    # content invariant untouched by the rewrite
    assert (sorted(st.column("content_sha").to_pylist())
            == sorted(before.column("content_sha").to_pylist()))

    # arriving events WITHOUT the column land as NULL (backfill is
    # history-only, not a write-time trigger)
    lake.apply_events(rd.from_arrow(BATCHES[1]))
    st2 = _state(lake)
    g = st2.column("grade")
    assert g.null_count > 0 and pc.any(pc.equal(g, "B")).as_py()

    # zone maps gained the constant bounds on rewritten base files
    m = mf.read_manifest(str(tmp_path), "cdc")
    stats = [s for i in m["partitions"].values()
             for s in i.get("file_stats", {}).values() if s]
    assert any(s.get("grade") == ["B", "B"] for s in stats)


def test_add_after_drop_never_resurrects(tmp_path):
    """Drop is logical, so stale bytes survive in live files; a re-add
    of the same name must take the rewrite path and replace them."""
    spec = TableSpec(name="cdc", num_partitions=4)
    lake = CDCLake(tmp_path, spec)
    lake.apply_events(rd.from_arrow(BATCHES[0]))
    lake.drop_column("size_bytes")

    # nullable re-add: forced rewrite, all NULL (no resurrection)
    rec = lake.add_column("size_bytes", pa.int64())
    assert rec["files_rewritten"] > 0
    st = _state(lake)
    assert st.column("size_bytes").null_count == st.num_rows

    lake.drop_column("size_bytes")
    rec2 = lake.add_column("size_bytes", pa.int64(), default=7)
    assert rec2["files_rewritten"] > 0
    st2 = _state(lake)
    assert pc.all(pc.equal(st2.column("size_bytes"), 7)).as_py()


def test_add_after_rename_clears_ddl_rename_source(tmp_path):
    """ADVICE r4: after rename_column('lang','language'), re-adding
    'lang' must clear the DDL rename entry — otherwise arriving events
    named 'lang' keep landing on 'language' and the new column never
    receives data (mirror of how dropped_cols is cleared)."""
    spec = TableSpec(name="cdc", num_partitions=4)
    lake = CDCLake(tmp_path, spec)
    lake.apply_events(rd.from_arrow(BATCHES[0]))
    lake.rename_column("lang", "language")
    m = mf.read_manifest(str(tmp_path), "cdc")
    assert m["renamed_cols"] == {"lang": "language"}

    lake.add_column("lang", pa.string())
    m2 = mf.read_manifest(str(tmp_path), "cdc")
    assert "lang" not in m2.get("renamed_cols", {})
    assert "lang" not in lake.spec.rename

    # arriving events named 'lang' now land on 'lang', not 'language'
    lake.apply_events(rd.from_arrow(BATCHES[1]))
    st = _state(lake)
    assert st.column("lang").null_count < st.num_rows

    # a fresh handle re-derives spec.rename from the manifest — cleared
    lake2 = CDCLake(tmp_path, TableSpec(name="cdc", num_partitions=4))
    assert "lang" not in lake2.spec.rename


def test_add_refuses_user_spec_rename_source(tmp_path):
    """A name that is a source in the USER's ingest-time rename map is
    refused (the map is spec intent — it would silently shadow the new
    column)."""
    spec = TableSpec(name="cdc", num_partitions=4,
                     rename={"lng": "lang"})
    lake = CDCLake(tmp_path, spec)
    lake.apply_events(rd.from_arrow(BATCHES[0]))
    with pytest.raises(ValueError, match="TableSpec.rename"):
        lake.add_column("lng", pa.string())


def test_readd_strips_stale_cluster_stats(tmp_path):
    """ADVICE r4: the dropped-then-readded rewrite must strip the
    pre-drop [min,max] zone-map entry — the rewritten data is all
    NULL/default, so a stale range could wrongly prune files on
    predicate reads.  A scalar default gets tight [d, d] bounds."""
    spec = TableSpec(name="cdc", num_partitions=4)
    lake = CDCLake(tmp_path, spec)
    lake.apply_events(rd.from_arrow(BATCHES[0]))
    lake.cluster(["size_bytes"], files_per_partition=2)
    m = mf.read_manifest(str(tmp_path), "cdc")
    assert any("size_bytes" in (st or {})
               for i in m["partitions"].values()
               for st in i.get("file_stats", {}).values())

    lake.drop_column("size_bytes")
    lake.add_column("size_bytes", pa.int64())  # nullable re-add
    m2 = mf.read_manifest(str(tmp_path), "cdc")
    for info in m2["partitions"].values():
        for st in info.get("file_stats", {}).values():
            assert st is None or "size_bytes" not in st

    lake.drop_column("size_bytes")
    lake.add_column("size_bytes", pa.int64(), default=7)
    m3 = mf.read_manifest(str(tmp_path), "cdc")
    stats = [st for info in m3["partitions"].values()
             for st in info.get("file_stats", {}).values()
             if st is not None]
    assert stats and all(st.get("size_bytes") == [7, 7] for st in stats)
