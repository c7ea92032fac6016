"""Durable materialized views (pipelines/views.py): refresh folds the
NET change set of the whole epoch gap, survives process restarts (a
fresh object re-opens from the manifest), is idempotent when up to
date, and gc drops orphan generations — verified against fresh
recomputes over the live lake states."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from standardized_omop_data_etl_ray.pipelines.cdc import CDCLake
from standardized_omop_data_etl_ray.pipelines.views import (
    MaterializedAggView,
    MaterializedJoinView,
)
from standardized_omop_data_etl_ray.spec import TableSpec
from standardized_omop_data_etl_ray.stages.incremental import (
    IncAggSpec,
    IncJoinSpec,
    view_result,
)

LANGS = ["en", "de", "fr"]


def _events(rows) -> rd.Dataset:
    """rows: (op, lsn, path, lang, content)"""
    return rd.from_arrow(pa.table({
        "op": pa.array([r[0] for r in rows], pa.string()),
        "lsn": pa.array([r[1] for r in rows], pa.int64()),
        "repo": pa.array(["r"] * len(rows), pa.string()),
        "path": pa.array([r[2] for r in rows], pa.string()),
        "commit": pa.array([f"c{r[1]}" for r in rows], pa.string()),
        "lang": pa.array([r[3] for r in rows], pa.string()),
        "content": pa.array([r[4] for r in rows], pa.string()),
    }))


def _wave(v: int, n: int = 60):
    rows = []
    for d in range(n):
        lang = LANGS[d % 3]
        if v == 1 and d % 13 == 0:
            rows.append(("D", 3 * d + v, f"k{d}", None, None))
        else:
            op = "I" if v == 0 or d % 13 == 0 else "U"
            rows.append((op, 3 * d + v, f"k{d}", lang, f"t{d} v{v}"))
    return rows


AGG = IncAggSpec(group_cols=["lang"], count="n", sums={"s": "chars"})


def _make_preps():
    # closures (pickled by VALUE): module-level functions in a test file
    # are pickled by reference and Ray workers cannot import the module
    def with_chars_cs(df: pd.DataFrame) -> pd.DataFrame:
        for side in ("old", "new"):
            df[f"{side}_chars"] = (
                df[f"{side}_content"].str.len().astype("Int64")
            )
        return df

    def add_chars(df: pd.DataFrame) -> pd.DataFrame:
        return df.assign(chars=df["content"].str.len().astype("int64"))

    def with_chars_state(ds: rd.Dataset) -> rd.Dataset:
        return ds.map_batches(add_chars, batch_format="pandas")

    return with_chars_cs, with_chars_state


def _agg_expected(lake) -> dict:
    df = lake.read_state(drop_engine_cols=True).to_pandas()
    df["chars"] = df["content"].str.len()
    g = df.groupby("lang")
    return {k: (int(v), int(s)) for k, v, s in zip(
        g.size().index, g.size(), g["chars"].sum())}


def test_agg_view_lifecycle_over_patch_lake(tmp_path):
    lake = CDCLake(str(tmp_path / "lk"),
                   TableSpec(name="t", num_partitions=4, patch_ops=True))
    lake.apply_events(_events(_wave(0)))
    prep_cs, prep_state = _make_preps()
    view = MaterializedAggView(
        str(tmp_path / "v"), AGG, lake,
        prep_cs=prep_cs, prep_state=prep_state,
    )
    rec = view.refresh(carry_cols=["lang", "content"])
    assert rec["changed"]

    def got(v):
        df = view_result(v.read(), AGG).to_pandas()
        return {r["lang"]: (int(r["n"]), int(r["s"]))
                for _, r in df.iterrows()}

    assert got(view) == _agg_expected(lake)

    # two more epochs (deletes + re-asserts + a PATCH wave), then ONE
    # net refresh across the gap
    lake.apply_events(_events(_wave(1)))
    patches = [("P", 1000 + d, f"k{d}", None, f"t{d} patched")
               for d in range(0, 60, 5)]
    lake.apply_events(_events(_wave(2) + patches))
    rec = view.refresh(carry_cols=["lang", "content"])
    assert rec["changed"] and rec["from_epoch"] == 1
    assert got(view) == _agg_expected(lake)

    # idempotent when current; restartable from a fresh object
    assert view.refresh()["changed"] is False
    reopened = MaterializedAggView(
        str(tmp_path / "v"), AGG, lake,
        prep_cs=prep_cs, prep_state=prep_state,
    )
    assert got(reopened) == _agg_expected(lake)
    assert reopened.refresh()["changed"] is False

    # gc: superseded generations die, the live one survives
    gone = reopened.gc()
    assert gone  # gen-1 files
    assert got(reopened) == _agg_expected(lake)


def _dim_events(version: int, langs) -> rd.Dataset:
    rows = []
    for i, l in enumerate(langs):
        rows.append(("I" if version == 0 else "U",
                     version * 10 + i, l, l, f"{l.upper()}_v{version}"))
    return rd.from_arrow(pa.table({
        "op": pa.array([r[0] for r in rows], pa.string()),
        "lsn": pa.array([r[1] for r in rows], pa.int64()),
        "lang": pa.array([r[2] for r in rows], pa.string()),
        "code": pa.array([r[4] for r in rows], pa.string()),
    }))


DIM_SPEC = TableSpec(
    name="dim", key_cols=("lang",), content_col="code",
    schema=pa.schema([("op", pa.string()), ("lsn", pa.int64()),
                      ("lang", pa.string()), ("code", pa.string())]),
    num_partitions=2,
)

JSPEC = IncJoinSpec(left_key=["path"], right_key=["lang"], on="lang",
                    left_cols=["lang", "content"], right_cols=["code"])


def _join_expected(doc_lake, dim_lake, how) -> pd.DataFrame:
    d = doc_lake.read_state(drop_engine_cols=True).to_pandas()
    m = dim_lake.read_state(drop_engine_cols=True).to_pandas()
    out = d[["path", "lang", "content"]].merge(
        m[["lang", "code"]], on="lang", how=how)
    return out.sort_values(["path"], ignore_index=True)


def _join_got(view) -> pd.DataFrame:
    return view.read().to_pandas()[
        ["path", "lang", "content", "code"]
    ].sort_values(["path"], ignore_index=True)


@pytest.mark.parametrize("how", ["inner", "left"])
def test_join_view_lifecycle(tmp_path, how):
    docs = CDCLake(str(tmp_path / "docs"),
                   TableSpec(name="docs", num_partitions=4))
    dim = CDCLake(str(tmp_path / "dim"), DIM_SPEC)
    docs.apply_events(_events(_wave(0)))
    dim.apply_events(_dim_events(0, ["en", "de"]))  # fr unmatched
    view = MaterializedJoinView(str(tmp_path / "v"), JSPEC, docs, dim,
                                how=how, num_buckets=4)
    assert view.refresh()["changed"]
    pd.testing.assert_frame_equal(_join_got(view),
                                  _join_expected(docs, dim, how))

    # gap of two doc epochs + one dim epoch, single net refresh
    docs.apply_events(_events(_wave(1)))
    docs.apply_events(_events(_wave(2)))
    dim.apply_events(_dim_events(1, ["en", "de", "fr"]))  # fr gains dim
    assert view.refresh()["changed"]
    pd.testing.assert_frame_equal(_join_got(view),
                                  _join_expected(docs, dim, how))

    # left-delta-only refresh: for how=left the count files must be
    # carried, not rewritten
    docs.apply_events(_events(
        [("U", 2000 + d, f"k{d}", LANGS[d % 3], f"t{d} late")
         for d in range(0, 60, 7)]
    ))
    before = view._manifest()["files"].get("cnt")
    assert view.refresh()["changed"]
    pd.testing.assert_frame_equal(_join_got(view),
                                  _join_expected(docs, dim, how))
    if how == "left":
        assert view._manifest()["files"]["cnt"] == before

    # restart + idempotence
    reopened = MaterializedJoinView(str(tmp_path / "v"), JSPEC, docs, dim,
                                    how=how, num_buckets=4)
    assert reopened.refresh()["changed"] is False
    pd.testing.assert_frame_equal(_join_got(reopened),
                                  _join_expected(docs, dim, how))


def test_orphan_generation_gc(tmp_path):
    lake = CDCLake(str(tmp_path / "lk"),
                   TableSpec(name="t", num_partitions=2))
    lake.apply_events(_events(_wave(0, n=20)))
    prep_cs, prep_state = _make_preps()
    view = MaterializedAggView(
        str(tmp_path / "v"), AGG, lake,
        prep_cs=prep_cs, prep_state=prep_state,
    )
    view.refresh(carry_cols=["lang", "content"])
    # simulate a crash: a written-but-uncommitted generation
    orphan_dir = view.root / "view-g000099"
    orphan_dir.mkdir()
    import pyarrow.parquet as pq

    pq.write_table(pa.table({"x": [1]}), orphan_dir / "rows-00000.parquet")
    gone = view.gc()
    assert any("g000099" in g for g in gone)
    assert view.read().count() > 0
