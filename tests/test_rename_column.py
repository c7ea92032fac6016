"""rename_column DDL: live-lake OMOP-style field remapping.

Reference analog: the per-table source→CDM column maps the standardize
scripts hard-code (e.g. demographics--person.py) — here as a post-hoc
DDL on a committed lake, composing with ingest-time ``TableSpec.rename``.
"""

import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pytest
import ray
import ray.data as rd

from standardized_omop_data_etl_ray.datagen import make_change_events, micro_batches
from standardized_omop_data_etl_ray.oracle import oracle_apply
from standardized_omop_data_etl_ray.pipelines.cdc import CDCLake
from standardized_omop_data_etl_ray.spec import TableSpec
from standardized_omop_data_etl_ray.state import manifest as mf

WINDOW = 400
EVENTS = make_change_events(n_keys=250, n_events=3000, seed=29, window=WINDOW)
ORACLE = oracle_apply(EVENTS)
BATCHES = list(micro_batches(EVENTS, batch_windows=3, window=WINDOW))


def _spec(p=8):
    return TableSpec(name="cdc", num_partitions=p)


def _state(lake, at_epoch=None, **kw) -> pa.Table:
    refs = lake.read_state(at_epoch=at_epoch, **kw).to_arrow_refs()
    tabs = [t for t in ray.get(refs) if t.num_rows]
    return pa.concat_tables(tabs) if tabs else pa.table({})


def _renamed_oracle() -> pa.Table:
    return ORACLE.rename_columns(
        ["language" if c == "lang" else c for c in ORACLE.column_names]
    )


def _assert_matches_oracle(state: pa.Table):
    want = _renamed_oracle()
    got = state.select(
        ["repo", "path", "commit", "language", "content", "content_sha"]
    ).sort_by([("repo", "ascending"), ("path", "ascending")])
    assert got.num_rows == want.num_rows
    for col in ("repo", "path", "commit", "language", "content_sha"):
        assert got.column(col).equals(want.column(col)), col


def test_rename_column_ddl(tmp_path):
    lake = CDCLake(tmp_path, _spec())
    for b in BATCHES[:2]:
        lake.apply_events(rd.from_arrow(b))
    pre_epoch = mf.read_manifest(str(tmp_path), "cdc")["epoch"]
    before = _state(lake)
    n_files_before = sum(
        len(i["files"]) for i in
        mf.read_manifest(str(tmp_path), "cdc")["partitions"].values())

    rec = lake.rename_column("lang", "language")
    assert rec["ddl"] == "rename_column" and rec["compaction"]
    assert rec["files_rewritten"] == n_files_before

    # every read path answers the new name, rows and values untouched
    after = _state(lake)
    assert "language" in after.column_names
    assert "lang" not in after.column_names
    assert after.num_rows == before.num_rows
    assert sorted(after.column("language").to_pylist()) == sorted(
        before.column("lang").to_pylist())
    assert "language" in lake.read_deltas().schema().names

    # pruned point reads survive the rewrite (zone maps + blooms carried)
    k = {"repo": before.column("repo")[0].as_py(),
         "path": before.column("path")[0].as_py()}
    stats = {}
    hit = lake.lookup([k], stats_out=stats)
    assert hit.num_rows == 1 and "language" in hit.column_names
    assert stats["files_read"] <= stats["files_total"]
    assert lake.key_history([k]).num_rows >= 1

    # refusals: structural columns, unknown source, occupied target
    for bad in ("repo", "lsn", "op", "content", "key_hash"):
        with pytest.raises(ValueError):
            lake.rename_column(bad, "x")
    with pytest.raises(ValueError):
        lake.rename_column("lang", "x")       # no longer exists
    with pytest.raises(ValueError):
        lake.rename_column("commit", "language")  # target occupied

    # time travel: pre-DDL snapshots keep the old name (COW)
    tt = _state(lake, at_epoch=pre_epoch)
    assert "lang" in tt.column_names and "language" not in tt.column_names

    # arriving events still using the OLD name land on the new column
    # (the DDL joined the spec's schema-evolution rename map)
    for b in BATCHES[2:]:
        lake.apply_events(rd.from_arrow(b))
    _assert_matches_oracle(_state(lake))

    # compaction keeps the new name and the state stays oracle-exact
    lake.compact()
    _assert_matches_oracle(_state(lake))

    # a REOPENED lake restores the renamed schema and the rename map
    lake2 = CDCLake(tmp_path, _spec())
    assert "language" in lake2.spec.schema.names
    assert lake2.spec.rename.get("lang") == "language"
    # ... and the stream path canonicalizes old-named events too
    extra = make_change_events(
        n_keys=50, n_events=300, seed=77, window=WINDOW)
    lake2.apply_stream(
        [rd.from_arrow(b) for b in micro_batches(
            extra, batch_windows=1, window=WINDOW)][:1],
        max_inflight=2)
    st = _state(lake2)
    assert "language" in st.column_names and "lang" not in st.column_names


def test_rename_column_changefeed_and_restore(tmp_path):
    lake = CDCLake(tmp_path, _spec())
    lake.apply_events(rd.from_arrow(BATCHES[0]))
    e1 = mf.read_manifest(str(tmp_path), "cdc")["epoch"]
    lake.apply_events(rd.from_arrow(BATCHES[1]))
    lake.rename_column("lang", "language")
    lake.apply_events(rd.from_arrow(BATCHES[2]))

    # key/lsn-only cursors cross the rename freely
    net = lake.changes_between(e1).to_pandas()
    assert len(net) > 0 and "change" in net.columns

    # a carry column naming either side of the rename refuses loudly
    with pytest.raises(ValueError, match="rename_column"):
        lake.changes_between(e1, carry_cols=["language"])
    with pytest.raises(ValueError, match="rename_column"):
        lake.changes_between(e1, carry_cols=["lang"])
    # ... but a post-rename span carries the new name fine
    m = mf.read_manifest(str(tmp_path), "cdc")
    ren_epoch = next(r["epoch"] for r in m["lineage"]
                     if r.get("ddl") == "rename_column")
    post = lake.changes_between(ren_epoch, carry_cols=["language"])
    assert "new_language" in post.to_pandas().columns

    # restore to a pre-rename snapshot reverts the name AND the spec,
    # so re-applied old-named events land on the old column again
    lake.restore(e1)
    assert "lang" in lake.spec.schema.names
    assert lake.spec.rename.get("lang") is None
    st = _state(lake)
    assert "lang" in st.column_names and "language" not in st.column_names


def test_rename_column_chains_and_empty_lake(tmp_path):
    # chained renames compose: events named a or b both land on c
    lake = CDCLake(tmp_path / "l1", _spec())
    lake.apply_events(rd.from_arrow(BATCHES[0]))
    lake.rename_column("lang", "lingua")
    lake.rename_column("lingua", "language")
    assert lake.spec.rename == {"lang": "language",
                                "lingua": "language"}
    lake.apply_events(rd.from_arrow(BATCHES[1]))  # still says "lang"
    st = _state(lake)
    assert "language" in st.column_names
    assert pc.count(st.column("language"),
                    mode="only_valid").as_py() > 0

    # pre-first-commit rename is a pure spec change
    lake2 = CDCLake(tmp_path / "l2", _spec())
    rec = lake2.rename_column("lang", "language")
    assert rec["epoch"] == 0
    lake2.apply_events(rd.from_arrow(BATCHES[0]))
    assert "language" in _state(lake2).column_names


def test_ddl_interleaved_with_applies_randomized(tmp_path):
    """Randomized op sequences — apply / rename / widen / compact in
    arbitrary interleavings — must land on the serial LWW oracle with
    the name/type maps applied, for several seeds and partition
    counts (the north-star exactness contract under live DDL)."""
    import numpy as np

    for seed, parts in ((3, 4), (11, 7), (27, 5)):
        rng = np.random.default_rng(seed)
        events = make_change_events(
            n_keys=120, n_events=1600, seed=seed, window=200,
            evolve_after_frac=0.0)
        batches = list(micro_batches(events, batch_windows=1,
                                     window=200))
        lake = CDCLake(tmp_path / f"l{seed}",
                       TableSpec(name="cdc", num_partitions=parts))
        renames = [("lang", "language"), ("language", "lingua")]
        widens = [("size_bytes", pa.int64()),
                  ("size_bytes", pa.float64())]
        adds = [("stars", pa.int64(), 5)]
        for b in batches:
            if renames and rng.random() < 0.45:
                lake.rename_column(*renames.pop(0))
            if adds and rng.random() < 0.35:
                lake.add_column(*adds.pop(0))
            if (widens and rng.random() < 0.45
                    and "size_bytes" in lake.spec.schema.names):
                # the column exists only after the first apply evolved
                # it in; widen from the CURRENT type, skip no-ops
                cur = lake.spec.schema.field("size_bytes").type
                col, ty = widens[0]
                if ty != cur:
                    lake.widen_column(col, ty)
                widens.pop(0)
            lake.apply_events(rd.from_arrow(b))
            if rng.random() < 0.3:
                lake.compact()
        st = _state(lake)
        # resolve the final logical name of the original lang column
        applied = 2 - len(renames)
        name = ["lang", "language", "lingua"][applied]
        oracle = oracle_apply(events)
        got = st.select(
            ["repo", "path", "commit", name, "content_sha"]
        ).sort_by([("repo", "ascending"), ("path", "ascending")])
        assert got.num_rows == oracle.num_rows, (seed,)
        for col, ocol in (("repo", "repo"), ("path", "path"),
                          ("commit", "commit"), (name, "lang"),
                          ("content_sha", "content_sha")):
            assert got.column(col).equals(oracle.column(ocol)), (
                seed, col)
        # size_bytes type reflects every widen that ran
        want_t = (pa.float64() if not widens
                  else (pa.int64() if len(widens) == 1 else None))
        if want_t is not None:
            assert st.schema.field("size_bytes").type == want_t, (seed,)
        # an add_column mid-stream must not perturb LWW exactness
        # (asserted above) and leaves only default/NULL stars values
        if not adds:
            assert st.schema.field("stars").type == pa.int64(), (seed,)
            vals = set(st.column("stars").to_pylist())
            assert vals <= {5, None}, (seed, vals)
