"""Value clustering (OPTIMIZE ZORDER/ORDER BY) + manifest-stats file
skipping in read_state(filters=...).

Soundness contract under merge-on-read: a file may be skipped only
when its partition is a CLEAN BASE (every row an independent winner);
delta files always reach the LWW resolve regardless of the filter,
because a superseded version must not be pruned before resolution.
"""

import pyarrow.compute as pc
import ray.data as rd

from standardized_omop_data_etl_ray.datagen import make_change_events
from standardized_omop_data_etl_ray.oracle import assert_states_equal, oracle_apply
from standardized_omop_data_etl_ray.pipelines.cdc import (
    CDCLake,
    _normalize_dnf,
    _stats_disprove,
)
from standardized_omop_data_etl_ray.spec import TableSpec

EVENTS = make_change_events(n_keys=400, n_events=3000, seed=29)
ORACLE = oracle_apply(EVENTS)


def _lake(tmp_path, parts=8):
    lake = CDCLake(tmp_path, TableSpec(name="cdc", num_partitions=parts))
    lake.apply_events(rd.from_arrow(EVENTS))
    return lake


def _df(ds):
    return (ds.to_pandas()
            .sort_values(["repo", "path"], ignore_index=True))


def test_cluster_preserves_state_and_prunes_both_zorder_columns(tmp_path):
    lake = _lake(tmp_path)
    before = lake.read_state()
    rec = lake.cluster(["lang", "lsn"], files_per_partition=4,
                       order="zorder")
    assert rec["compaction"] and rec["partitions_touched"] == 8
    # clustering is a pure layout change
    import pyarrow as pa
    import ray
    tabs = [t for t in ray.get(lake.read_state().to_arrow_refs())
            if t.num_rows]
    assert_states_equal(pa.concat_tables(tabs), ORACLE)

    full = _df(lake.read_state(drop_engine_cols=True))
    # zorder tightens EVERY listed column's per-file bounds: both a
    # lang filter and an lsn filter must skip files AND stay exact
    lang = full["lang"].mode()[0]
    q90 = int(full["lsn"].quantile(0.9))
    for flt, mask in [
        ([("lang", "=", lang)], full["lang"] == lang),
        ([("lsn", ">=", q90)], full["lsn"] >= q90),
    ]:
        st: dict = {}
        got = _df(lake.read_state(drop_engine_cols=True, filters=flt,
                                  stats_out=st))
        want = full[mask].reset_index(drop=True)
        assert got.equals(want)
        assert st["files_stats_skipped"] > 0, (flt, st)
        assert st["files_total"] == 8 * 4
    del before


def test_filters_on_lex_clustered_and_or_branches(tmp_path):
    lake = _lake(tmp_path)
    lake.cluster(["lang"], files_per_partition=3, order="lex")
    full = _df(lake.read_state(drop_engine_cols=True))
    two = sorted(full["lang"].unique())[:2]
    st: dict = {}
    got = _df(lake.read_state(
        drop_engine_cols=True,
        filters=[[("lang", "=", two[0])], [("lang", "=", two[1])]],
        stats_out=st,
    ))
    want = full[full["lang"].isin(two)].reset_index(drop=True)
    assert got.equals(want)
    assert st["files_stats_skipped"] > 0
    # a file surviving either OR branch is read: union is never under-read
    assert set(got["lang"]) <= set(two)


def test_filters_compose_with_predicate_and_projection(tmp_path):
    lake = _lake(tmp_path)
    lake.cluster(["lang"], files_per_partition=3, order="lex")
    full = _df(lake.read_state(drop_engine_cols=True))
    lang = full["lang"].mode()[0]
    st: dict = {}
    out = lake.read_state(
        columns=["lang"],
        filters=[("lang", "=", lang)],
        predicate=pc.field("lsn") >= 100,   # unprojected column
        stats_out=st,
    )
    got = _df(out)
    assert list(got.columns) == ["repo", "path", "lang"]
    want = (full[(full["lang"] == lang) & (full["lsn"] >= 100)]
            [["repo", "path", "lang"]].reset_index(drop=True))
    assert got.equals(want)
    assert st["files_stats_skipped"] > 0


def test_filters_never_prune_non_base_partitions(tmp_path):
    """Appending deltas AFTER clustering clears the base flag — the
    filtered read must fall back to resolve-then-filter (zero skips on
    touched partitions) and stay exact even when the new winners would
    have been pruned by the stale clustered bounds."""
    import numpy as np
    import pyarrow as pa

    lake = _lake(tmp_path)
    lake.cluster(["lang"], files_per_partition=4, order="lex")
    base_full = _df(lake.read_state(drop_engine_cols=True))
    # flip 40 existing keys to lang=fr with fresh LSNs
    vic = base_full[base_full["lang"] != "fr"].head(40)
    n = len(vic)
    lo = int(base_full["lsn"].max()) + 1
    ev2 = pa.table({
        "op": pa.array(["U"] * n),
        "lsn": pa.array(np.arange(lo, lo + n, dtype=np.int64)),
        "repo": pa.array(vic["repo"].tolist()),
        "path": pa.array(vic["path"].tolist()),
        "commit": pa.array([f"flip{i}" for i in range(n)]),
        "lang": pa.array(["fr"] * n),
        "content": pa.array(["flipped"] * n),
    })
    lake.apply_events(rd.from_arrow(ev2))
    full = _df(lake.read_state(drop_engine_cols=True))
    st: dict = {}
    got = _df(lake.read_state(drop_engine_cols=True,
                              filters=[("lang", "=", "fr")],
                              stats_out=st))
    want = full[full["lang"] == "fr"].reset_index(drop=True)
    assert got.equals(want)
    # every flipped key is present in the filtered read
    flipped = set(zip(vic["repo"], vic["path"]))
    assert flipped <= set(zip(got["repo"], got["path"]))
    # and skips only ever come from still-base partitions
    assert st["files_stats_skipped"] < st["files_total"]


def test_fully_pruned_read_keeps_schema(tmp_path):
    """A filter no file can satisfy skips EVERYTHING — the read must
    still answer with the (evolved) state schema and zero rows."""
    lake = _lake(tmp_path)
    lake.cluster(["lang"], files_per_partition=3, order="lex")
    st: dict = {}
    # a value ABOVE every file's max — min/max can only disprove
    # values outside [lo, hi], a gap INSIDE the range is kept (read)
    out = lake.read_state(drop_engine_cols=True,
                          filters=[("lang", "=", "zzz-no-such-lang")],
                          stats_out=st)
    assert st["files_stats_skipped"] == st["files_total"] > 0
    assert out.count() == 0
    assert out.schema().names == ["op", "lsn", "repo", "path",
                                  "commit", "lang", "content"]


def test_compacted_read_has_no_hive_columns(tmp_path):
    """Regression: read_parquet on the part=/epoch= layout hive-injects
    path columns unless partitioning is disabled — the all-base state
    read must expose exactly the state schema."""
    lake = _lake(tmp_path)
    lake.compact()
    names = lake.read_state(drop_engine_cols=True).schema().names
    assert "epoch" not in names
    assert names == ["op", "lsn", "repo", "path", "commit", "lang",
                     "content"]


def test_cluster_spec_survives_maintenance_compaction(tmp_path):
    """cluster() persists a table property: a later maintenance
    compaction (no cluster args — the commit-path auto-compaction
    shape) must RE-APPLY the clustered layout instead of silently
    reverting the bases to key order."""
    import numpy as np
    import pyarrow as pa

    from standardized_omop_data_etl_ray.state import manifest as mf

    lake = _lake(tmp_path)
    lake.cluster(["lang"], files_per_partition=3, order="lex")
    full = _df(lake.read_state(drop_engine_cols=True))
    lang = full["lang"].mode()[0]
    # dirty every partition with a delta, then maintenance-compact
    vic = full.head(60)
    lo = int(full["lsn"].max()) + 1
    lake.apply_events(rd.from_arrow(pa.table({
        "op": pa.array(["U"] * len(vic)),
        "lsn": pa.array(np.arange(lo, lo + len(vic), dtype=np.int64)),
        "repo": pa.array(vic["repo"].tolist()),
        "path": pa.array(vic["path"].tolist()),
        "commit": pa.array([f"m{i}" for i in range(len(vic))]),
        "lang": pa.array(vic["lang"].tolist()),
        "content": pa.array(["bumped"] * len(vic)),
    })))
    rec = lake.compact(max_files=0)      # plain maintenance call
    assert rec["partitions_touched"] > 0
    m = mf.read_manifest(lake.root, "cdc")
    assert m["cluster_spec"] == {"cols": ["lang"], "order": "lex",
                                 "files": 3}
    full2 = _df(lake.read_state(drop_engine_cols=True))
    st: dict = {}
    got = _df(lake.read_state(drop_engine_cols=True,
                              filters=[("lang", "=", lang)],
                              stats_out=st))
    assert got.equals(full2[full2["lang"] == lang]
                      .reset_index(drop=True))
    assert st["files_stats_skipped"] > 0, st  # layout survived


def test_drop_column_narrows_cluster_spec(tmp_path):
    from standardized_omop_data_etl_ray.state import manifest as mf

    lake = _lake(tmp_path)
    lake.cluster(["lang", "commit"], files_per_partition=2,
                 order="zorder")
    lake.drop_column("commit")
    m = mf.read_manifest(lake.root, "cdc")
    assert m["cluster_spec"]["cols"] == ["lang"]
    # a maintenance compaction after the DDL must not try the dropped
    # column — and the remaining column keeps pruning
    lake.compact()
    full = _df(lake.read_state(drop_engine_cols=True))
    lang = full["lang"].mode()[0]
    st: dict = {}
    got = _df(lake.read_state(drop_engine_cols=True,
                              filters=[("lang", "=", lang)],
                              stats_out=st))
    assert got.equals(full[full["lang"] == lang].reset_index(drop=True))
    assert st["files_stats_skipped"] > 0
    # dropping the LAST cluster column clears the property
    lake.drop_column("lang")
    m = mf.read_manifest(lake.root, "cdc")
    assert m["cluster_spec"] is None


def test_zorder_many_columns_stays_in_64_bits(tmp_path):
    """>4 zorder columns must narrow the per-lane bit budget (a shift
    ≥64 is undefined in numpy) — 5 columns still cluster, prune on a
    listed column, and preserve the state exactly."""
    lake = _lake(tmp_path)
    lake.cluster(["lang", "lsn", "commit", "repo", "path"],
                 files_per_partition=3, order="zorder")
    full = _df(lake.read_state(drop_engine_cols=True))
    assert len(full) > 0
    lang = full["lang"].mode()[0]
    st: dict = {}
    got = _df(lake.read_state(drop_engine_cols=True,
                              filters=[("lang", "=", lang)],
                              stats_out=st))
    assert got.equals(full[full["lang"] == lang].reset_index(drop=True))
    assert st["files_total"] == 8 * 3


def test_compact_empty_cluster_by_clears_property(tmp_path):
    """compact(cluster_by=[]) is the explicit un-cluster: the layout
    reverts to key order AND the persisted property clears, so later
    maintenance stays key-ordered."""
    from standardized_omop_data_etl_ray.state import manifest as mf

    lake = _lake(tmp_path)
    lake.cluster(["lang"], files_per_partition=3, order="lex")
    assert mf.read_manifest(lake.root, "cdc")["cluster_spec"]
    full = _df(lake.read_state(drop_engine_cols=True))
    lake.compact(cluster_by=[])
    m = mf.read_manifest(lake.root, "cdc")
    assert m["cluster_spec"] is None
    assert _df(lake.read_state(drop_engine_cols=True)).equals(full)
    # filters still row-correct, just without file skips
    lang = full["lang"].mode()[0]
    st: dict = {}
    got = _df(lake.read_state(drop_engine_cols=True,
                              filters=[("lang", "=", lang)],
                              stats_out=st))
    assert got.equals(full[full["lang"] == lang].reset_index(drop=True))


def test_cluster_unknown_column_fails_loudly(tmp_path):
    import pytest

    lake = _lake(tmp_path)
    with pytest.raises(ValueError, match="no_such"):
        lake.cluster(["no_such"])


def test_stats_disprove_kernel():
    dnf = _normalize_dnf([("lang", "=", "fr")])
    assert _stats_disprove({"lang": ["aa", "en"]}, dnf)
    assert not _stats_disprove({"lang": ["en", "zz"]}, dnf)
    assert not _stats_disprove({}, dnf)              # no stats → read
    assert not _stats_disprove(None, dnf)
    # unknown op is conservative
    assert not _stats_disprove({"lang": ["aa", "en"]},
                               _normalize_dnf([("lang", "!=", "fr")]))
    # type mismatch is conservative
    assert not _stats_disprove({"lang": ["aa", "en"]},
                               _normalize_dnf([("lang", ">", 5)]))
    # in-list fully outside the bounds
    assert _stats_disprove({"x": [10, 20]},
                           _normalize_dnf([("x", "in", [1, 2, 30])]))
    assert not _stats_disprove({"x": [10, 20]},
                               _normalize_dnf([("x", "in", [1, 15])]))
    # OR: every branch must be disproven
    dnf2 = _normalize_dnf([[("x", ">", 100)], [("x", "<", 5)]])
    assert _stats_disprove({"x": [10, 20]}, dnf2)
    assert not _stats_disprove({"x": [10, 200]}, dnf2)
    # range ops
    assert _stats_disprove({"x": [10, 20]},
                           _normalize_dnf([("x", ">=", 21)]))
    assert _stats_disprove({"x": [10, 20]},
                           _normalize_dnf([("x", "<=", 9)]))
    assert not _stats_disprove({"x": [10, 20]},
                               _normalize_dnf([("x", ">=", 20)]))
