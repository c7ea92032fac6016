"""lag/lead and ranking window functions (stages/windows.py) against
DuckDB window semantics, with crafted ties and single-row groups."""

import duckdb
import numpy as np
import pandas as pd
import ray.data as rd

from standardized_omop_data_etl_ray.stages.windows import group_rank, lag_lead


def _frame(seed=7, n=200):
    rng = np.random.default_rng(seed)
    return pd.DataFrame({
        "k": rng.integers(0, 12, n),          # incl. multi-row keys
        "o": np.arange(n),                     # unique tiebreaker
        "p": rng.integers(0, 6, n).astype("float64"),  # heavy ties
        "v": rng.normal(size=n),
    })


def test_group_rank_matches_duckdb():
    df = _frame()
    df.loc[5, "k"] = 999  # single-row group
    got = (
        group_rank(
            rd.from_pandas(df), "k", ["p", "o"],
            ascending=[False, True], rank_prefix=1, num_buckets=5,
        )
        .to_pandas()
        .sort_values(["k", "o"], ignore_index=True)
    )
    want = duckdb.sql("""
        SELECT k, o, p, v,
               row_number() OVER (PARTITION BY k ORDER BY p DESC, o)
                   AS row_number,
               rank() OVER (PARTITION BY k ORDER BY p DESC) AS rank,
               dense_rank() OVER (PARTITION BY k ORDER BY p DESC)
                   AS dense_rank
        FROM df ORDER BY k, o
    """).df()
    for c in ("row_number", "rank", "dense_rank"):
        assert got[c].tolist() == want[c].tolist(), c


def test_group_rank_full_order_rank_equals_row_number():
    df = _frame(8)
    got = group_rank(
        rd.from_pandas(df), "k", ["p", "o"], num_buckets=4
    ).to_pandas()
    assert got["rank"].tolist() == got["row_number"].tolist()


def test_lag_lead_matches_duckdb():
    df = _frame(9)
    got = (
        lag_lead(rd.from_pandas(df), "k", ["o"], ["v"], lags=2, leads=1,
                 num_buckets=5)
        .to_pandas()
        .sort_values(["k", "o"], ignore_index=True)
    )
    want = duckdb.sql("""
        SELECT k, o,
               lag(v) OVER w AS v_lag1, lag(v, 2) OVER w AS v_lag2,
               lead(v) OVER w AS v_lead1
        FROM df WINDOW w AS (PARTITION BY k ORDER BY o)
        ORDER BY k, o
    """).df()
    for c in ("v_lag1", "v_lag2", "v_lead1"):
        pd.testing.assert_series_equal(
            got[c], want[c], check_names=False, check_dtype=False
        )


def test_group_rank_null_order_values_tie():
    """SQL ORDER BY ranks NULLs as equal to each other — two NULL rows
    in one key must share rank/dense_rank (review finding)."""
    df = pd.DataFrame({
        "k": [1, 1, 1, 1, 2],
        "o": [0, 1, 2, 3, 4],
        "p": [5.0, None, None, 1.0, None],
    })
    got = (
        group_rank(rd.from_pandas(df), "k", ["p", "o"],
                   ascending=[False, True], rank_prefix=1, num_buckets=2)
        .to_pandas().sort_values(["k", "o"], ignore_index=True)
    )
    want = duckdb.sql("""
        SELECT k, o,
               rank() OVER (PARTITION BY k ORDER BY p DESC) AS rank,
               dense_rank() OVER (PARTITION BY k ORDER BY p DESC)
                   AS dense_rank
        FROM df ORDER BY k, o
    """).df()
    assert got["rank"].tolist() == want["rank"].tolist()
    assert got["dense_rank"].tolist() == want["dense_rank"].tolist()


def test_watermark_split_seeds_prefix_across_blocks():
    """Regression (round 4): the in-block running max must be SEEDED
    with the prior-blocks prefix max.  Craft a stream with tall spikes
    followed by long low runs, so ANY sort-block boundary landing in a
    run exposes an unseeded accumulate (rows in a new block would see
    a too-low watermark and be marked on-time instead of late).
    Compare against a serial numpy oracle regardless of how Ray splits
    the sorted blocks."""
    from standardized_omop_data_etl_ray.stages.windows import (
        watermark_split,
    )

    rng = np.random.default_rng(11)
    n = 20_000
    ts = rng.integers(0, 1_000_000, n).astype(np.int64)
    spikes = np.arange(50, n, 977)          # tall spike every ~1k rows
    ts[spikes] = 2_000_000_000 + np.arange(len(spikes)) * 1_000_000
    df = pd.DataFrame({"arrival": np.arange(n), "ts": ts})

    lateness = 60_000_000
    run = np.maximum.accumulate(
        np.concatenate(([-(2**62)], ts))
    )
    want_late = ts < (run[:-1] - lateness)
    assert want_late.sum() > 1000  # the crafted stream IS late-heavy

    got = (
        watermark_split(
            rd.from_pandas(df).repartition(16), "ts", "arrival",
            lateness_us=lateness,
        )
        .to_pandas()
        .sort_values("arrival", ignore_index=True)
    )
    assert got["__late"].to_numpy().tolist() == want_late.tolist()


def test_percent_rank_cume_dist_ntile_match_duckdb():
    """percent/cume_dist rank on the prefix tie tuple, ntile on the
    full deterministic sort — all three from the one group_rank pass."""
    df = _frame(seed=11, n=331)           # non-divisible group sizes
    df.loc[7, "k"] = 777                  # single-row group: pr = 0
    got = (
        group_rank(
            rd.from_pandas(df).repartition(6), "k", ["p", "o"],
            rank_prefix=1, percent=True, ntile=4, num_buckets=5,
        )
        .to_pandas()
        .sort_values(["k", "o"], ignore_index=True)
    )
    want = duckdb.sql("""
        SELECT k, o, p, v,
               row_number() OVER w2 AS row_number,
               rank() OVER w1 AS rank,
               dense_rank() OVER w1 AS dense_rank,
               percent_rank() OVER w1 AS percent_rank,
               cume_dist() OVER w1 AS cume_dist,
               ntile(4) OVER w2 AS ntile
        FROM df
        WINDOW w1 AS (PARTITION BY k ORDER BY p),
               w2 AS (PARTITION BY k ORDER BY p, o)
        ORDER BY k, o
    """).df()
    pd.testing.assert_frame_equal(
        got[want.columns.tolist()], want, check_dtype=False
    )


def test_first_last_value_matches_pandas():
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from standardized_omop_data_etl_ray.stages.windows import first_last_value

    rng = np.random.default_rng(8)
    df = pd.DataFrame({
        "k": rng.integers(0, 5, 200),
        "t": rng.permutation(200),
        "v": rng.normal(size=200),
    })
    out = (
        first_last_value(
            rd.from_arrow(pa.Table.from_pandas(df)).repartition(4),
            "k", ["t"], ["v"])
        .to_pandas().sort_values(["k", "t"], ignore_index=True)
    )
    ref = df.sort_values(["k", "t"], ignore_index=True)
    gb = ref.groupby("k", sort=False)
    assert np.allclose(out["v_first"], gb["v"].transform("first"))
    assert np.allclose(out["v_last"], gb["v"].transform("last"))


def test_funnel_steps_planted_and_brute_force():
    """Planted funnel shapes (complete, wrong-order, missing-middle,
    equal-timestamp boundary) plus a randomized frame checked against a
    brute-force per-user greedy subsequence matcher."""
    import pyarrow as pa

    from standardized_omop_data_etl_ray.stages.windows import funnel_steps

    steps = ["a", "b", "c"]
    ts0 = pd.Timestamp("2024-01-01")

    def ev(u, t, e):
        return {"u": u, "ts": ts0 + pd.Timedelta(seconds=t), "e": e}

    planted = pd.DataFrame([
        # u1: full funnel in order
        ev(1, 0, "a"), ev(1, 10, "b"), ev(1, 20, "c"),
        # u2: wrong order (c before a) -> reaches step 1 + 2 only
        ev(2, 0, "c"), ev(2, 10, "a"), ev(2, 20, "b"),
        # u3: missing middle -> step 1 only
        ev(3, 0, "a"), ev(3, 10, "c"),
        # u4: equal timestamps -> strict '>' rejects step 2
        ev(4, 0, "a"), ev(4, 0, "b"),
        # u5: noise only
        ev(5, 0, "x"),
    ])
    got = (
        funnel_steps(rd.from_pandas(planted).repartition(3),
                     "u", "ts", "e", steps, num_buckets=4)
        .to_pandas().sort_values("step", ignore_index=True)
    )
    assert got["users"].tolist() == [4, 2, 1]
    assert got["event_type"].tolist() == steps

    rng = np.random.default_rng(11)
    n = 600
    rand = pd.DataFrame({
        "u": rng.integers(0, 40, n),
        "ts": ts0 + pd.to_timedelta(rng.integers(0, 500, n), unit="s"),
        "e": rng.choice(["a", "b", "c", "x"], n),
    })

    def brute(df):
        counts = [0] * len(steps)
        for _, g in df.groupby("u"):
            prev = None
            for k, st in enumerate(steps):
                rows = g[g["e"] == st]
                if prev is not None:
                    rows = rows[rows["ts"] > prev]
                if rows.empty:
                    break
                prev = rows["ts"].min()
                counts[k] += 1
        return counts

    got2 = (
        funnel_steps(
            rd.from_arrow(pa.Table.from_pandas(rand)).repartition(5),
            "u", "ts", "e", steps, num_buckets=3)
        .to_pandas().sort_values("step", ignore_index=True)
    )
    assert got2["users"].tolist() == brute(rand)


def test_time_range_rolling_matches_duckdb_with_ties():
    """Tied timestamps (peer rows), exact window-boundary hits, and a
    key whose events all exceed the window gap — against DuckDB's
    RANGE frame."""
    import pyarrow as pa

    from standardized_omop_data_etl_ray.stages.windows import (
        time_range_rolling,
    )

    rng = np.random.default_rng(13)
    n = 400
    ts0 = pd.Timestamp("2024-03-01")
    secs = rng.integers(0, 7200, n)
    secs[:40] = (secs[:40] // 600) * 600       # force many exact ties
    df = pd.DataFrame({
        "u": rng.integers(0, 12, n),
        "ts": ts0 + pd.to_timedelta(secs, unit="s"),
        "eid": np.arange(n),
        "v": rng.uniform(-5, 5, n).round(3),
    })
    # one sparse key: gaps always larger than the window
    sparse = pd.DataFrame({
        "u": 99, "ts": ts0 + pd.to_timedelta([0, 4000, 9000], unit="s"),
        "eid": [1000, 1001, 1002], "v": [1.0, 2.0, 3.0],
    })
    df = pd.concat([df, sparse], ignore_index=True)

    got = (
        time_range_rolling(
            rd.from_arrow(pa.Table.from_pandas(df)).repartition(5),
            "u", "ts", "eid", "v", 1800, num_buckets=4)
        .to_pandas().sort_values("eid", ignore_index=True)
    )
    want = duckdb.sql("""
        SELECT u, ts, eid,
               count(*) OVER w AS range_cnt,
               sum(CAST(floor(v * 100) AS BIGINT)) OVER w
                   AS range_sum_cents
        FROM df
        WINDOW w AS (PARTITION BY u ORDER BY ts
                     RANGE BETWEEN INTERVAL 30 MINUTES PRECEDING
                     AND CURRENT ROW)
        ORDER BY eid
    """).df()
    pd.testing.assert_frame_equal(
        got[want.columns.tolist()], want, check_dtype=False)
    # sparse key: every frame is just the row itself
    sp = got[got["u"] == 99]
    assert sp["range_cnt"].tolist() == [1, 1, 1]


def test_grouped_ewma_matches_reference():
    """Recursive reference per key (y0=x0; yt=(1-a)y(t-1)+a·xt),
    single-row keys, repartition invariance."""
    import pyarrow as pa

    from standardized_omop_data_etl_ray.stages.windows import grouped_ewma

    rng = np.random.default_rng(21)
    n = 300
    df = pd.DataFrame({
        "k": rng.integers(0, 9, n),
        "o": np.arange(n),
        "v": rng.normal(size=n),
    })
    df.loc[7, "k"] = 555  # single-row key
    a = 0.25

    def ref(df):
        out = {}
        for k, g in df.sort_values(["k", "o"]).groupby("k"):
            y = None
            for o, x in zip(g["o"], g["v"]):
                y = x if y is None else (1 - a) * y + a * x
                out[o] = y
        return out

    want = ref(df)
    for parts in (2, 6):
        got = (
            grouped_ewma(
                rd.from_arrow(pa.Table.from_pandas(df)).repartition(parts),
                "k", ["o"], "v", a, num_buckets=4)
            .to_pandas().sort_values("o", ignore_index=True)
        )
        assert np.allclose(got["ewma"].to_numpy(),
                           [want[o] for o in got["o"]], atol=1e-12)


def test_nth_value_matches_duckdb():
    """n within/at/beyond group size, ties on the order column,
    repartition invariance — against DuckDB's nth_value."""
    import pyarrow as pa

    from standardized_omop_data_etl_ray.stages.windows import nth_value

    rng = np.random.default_rng(31)
    df = pd.DataFrame({
        "k": rng.integers(0, 10, 150),
        "o": np.arange(150),
        "v": rng.integers(0, 5, 150).astype("float64"),  # heavy ties
    })
    df.loc[3, "k"] = 777  # single-row group (n=2 -> NULL)
    for parts in (1, 6):
        got = (
            nth_value(
                rd.from_arrow(pa.Table.from_pandas(df)).repartition(parts),
                "k", ["v", "o"], "v", 2, num_buckets=4)
            .to_pandas().sort_values(["k", "o"], ignore_index=True)
        )
        want = duckdb.sql("""
            SELECT k, o, v,
                   nth_value(v, 2) OVER (
                       PARTITION BY k ORDER BY v, o
                       ROWS BETWEEN UNBOUNDED PRECEDING
                       AND UNBOUNDED FOLLOWING) AS v_nth2
            FROM df ORDER BY k, o
        """).df()
        pd.testing.assert_frame_equal(
            got[want.columns.tolist()], want, check_dtype=False)
