"""GROUPING SETS / ROLLUP / CUBE (stages/aggregates.py) against
DuckDB, incl. null key values vs rolled-up nulls, all-null agg
groups, key-column agg sources, and partition invariance."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from standardized_omop_data_etl_ray.stages.aggregates import (
    cube_agg,
    grouping_sets_agg,
    rollup_agg,
)


def _frame(seed=3, n=5000):
    rng = np.random.default_rng(seed)
    return pd.DataFrame({
        "a": rng.choice(["x", "y", "z", None], n),  # genuine NULL keys
        "b": rng.integers(0, 4, n),
        "v": rng.normal(size=n),
        "w": rng.integers(0, 100, n),
    })


def _canon(d, cols, round_cols=()):
    d = d[cols].copy()
    for c in round_cols:
        d[c] = d[c].astype("float64").round(9)
    return d.sort_values(cols, ignore_index=True).astype(
        {c: "float64" for c in round_cols}
    )


def test_rollup_matches_duckdb_with_null_keys():
    df = _frame()
    got = rollup_agg(
        rd.from_pandas(df).repartition(7), ["a", "b"],
        {"sum_v": ("v", "sum"), "n": ("w", "count"),
         "max_b": ("b", "max")},  # agg source that is ALSO a key col
    ).to_pandas()
    want = duckdb.sql("""
        SELECT a, b, GROUPING(a, b)::BIGINT AS grouping_id,
               SUM(v) AS sum_v, COUNT(w) AS n, MAX(b) AS max_b
        FROM df GROUP BY ROLLUP(a, b)
    """).df()
    cols = ["grouping_id", "a", "b", "n", "max_b", "sum_v"]
    pd.testing.assert_frame_equal(
        _canon(got, cols, ["sum_v"]), _canon(want, cols, ["sum_v"]),
        check_dtype=False,
    )
    # grouping_id disambiguates genuine-NULL a (gid 0, genuine null
    # data) from rolled-up a (gid 3, the grand total): both kinds of
    # a-is-null rows must coexist
    gids = set(got[got["a"].isna()]["grouping_id"])
    assert {0, 1, 3} == gids


def test_cube_and_explicit_sets_match_duckdb():
    df = _frame(seed=9)
    ds = rd.from_pandas(df).repartition(5)
    got = cube_agg(ds, ["a", "b"], {"sum_w": ("w", "sum")}).to_pandas()
    want = duckdb.sql("""
        SELECT a, b, GROUPING(a, b)::BIGINT AS grouping_id,
               SUM(w) AS sum_w
        FROM df GROUP BY CUBE(a, b)
    """).df()
    cols = ["grouping_id", "a", "b", "sum_w"]
    pd.testing.assert_frame_equal(
        _canon(got, cols, ["sum_w"]), _canon(want, cols, ["sum_w"]),
        check_dtype=False,
    )

    got2 = grouping_sets_agg(
        ds, ["a", "b"], [["a"], ["b"], []], {"n": ("w", "count")}
    ).to_pandas()
    want2 = duckdb.sql("""
        SELECT a, b, GROUPING(a, b)::BIGINT AS grouping_id,
               COUNT(w) AS n
        FROM df GROUP BY GROUPING SETS ((a), (b), ())
    """).df()
    cols2 = ["grouping_id", "a", "b", "n"]
    pd.testing.assert_frame_equal(
        _canon(got2, cols2), _canon(want2, cols2), check_dtype=False
    )


def test_all_null_agg_group_sums_to_null_and_partition_invariance():
    # group y has ONLY null v: SUM must be NULL (not 0.0) at every
    # rollup level that isolates it; partitioning must not matter
    df = pd.DataFrame({
        "a": ["x"] * 4 + ["y"] * 3,
        "v": [1.0, 2.0, None, 3.0, None, None, None],
    })
    def run(parts):
        return (
            rollup_agg(rd.from_pandas(df).repartition(parts), ["a"],
                       {"sum_v": ("v", "sum"), "n_v": ("v", "count")})
            .to_pandas()
            .sort_values(["grouping_id", "a"], ignore_index=True)
        )
    one, many = run(1), run(4)
    pd.testing.assert_frame_equal(one, many)
    y = one[(one["a"] == "y")].iloc[0]
    assert pd.isna(y["sum_v"]) and y["n_v"] == 0
    total = one[one["grouping_id"] == 1].iloc[0]
    assert total["sum_v"] == 6.0 and total["n_v"] == 3


def test_validation_errors():
    ds = rd.from_pandas(pd.DataFrame({"a": [1], "v": [1.0]}))
    with pytest.raises(ValueError, match="not in group_cols"):
        grouping_sets_agg(ds, ["a"], [["z"]], {"s": ("v", "sum")})
    with pytest.raises(ValueError, match="duplicate grouping sets"):
        grouping_sets_agg(ds, ["a"], [["a"], ["a"]],
                          {"s": ("v", "sum")})
    with pytest.raises(ValueError, match="cube over >6"):
        cube_agg(ds, [f"c{i}" for i in range(7)], {"s": ("v", "sum")})
