"""HyperLogLog grouped approx-distinct: accuracy, determinism,
merge associativity (stages/sketches.py)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from standardized_omop_data_etl_ray.stages.sketches import (
    _rho64,
    grouped_approx_distinct,
    hll_estimate,
)


def test_hll_accuracy_and_partition_invariance():
    """p=12 → ~1.6% RSE: gate at 3× that; identical estimates on any
    partitioning (registers are a max-fold of a pure hash)."""
    rng = np.random.default_rng(1)
    df = pd.DataFrame({
        "k": rng.integers(0, 3, 120_000),
        "v": rng.integers(0, 30_000, 120_000),
    })
    exact = df.groupby("k")["v"].nunique()

    def run(parts):
        return (
            grouped_approx_distinct(
                rd.from_pandas(df).repartition(parts), "k", "v", p=12
            ).to_pandas().set_index("k")["approx_distinct"].sort_index()
        )

    a, b = run(1), run(6)
    pd.testing.assert_series_equal(a, b)
    assert ((a - exact) / exact).abs().max() < 0.05


def test_hll_small_range_linear_counting():
    """Tiny cardinalities route through linear counting — near-exact."""
    df = pd.DataFrame({"k": ["x"] * 1000, "v": [i % 7 for i in range(1000)]})
    got = (
        grouped_approx_distinct(rd.from_pandas(df), "k", "v", p=12)
        .to_pandas()["approx_distinct"].iloc[0]
    )
    assert abs(got - 7) < 0.5


def test_rho64_exact_bit_semantics():
    """Register index = top p bits; rank = leading zeros of the
    left-aligned suffix + 1, capped for an all-zero suffix."""
    p = 4
    h = np.array([
        0xF000000000000000,   # idx 15, suffix 0 → max rank 61
        0x0800000000000000,   # idx 0,  suffix 1000... → rank 1
        0x0000000000000001,   # idx 0,  suffix ...0001 → rank 60
    ], dtype=np.uint64)
    idx, rank = _rho64(h, p)
    assert idx.tolist() == [15, 0, 0]
    assert rank.tolist() == [61, 1, 60]
    # estimator sanity: empty registers → estimate 0-ish via linear count
    assert hll_estimate(np.zeros(16, np.uint8), 4) == 0.0


def test_heavy_hitters_exact_above_threshold():
    """Two-pass Misra-Gries → exact recount: result is EXACTLY the items
    with count > floor(n·share), under any partitioning, including a
    no-heavy-hitter (uniform) input."""
    import numpy as np

    from standardized_omop_data_etl_ray.stages.sketches import heavy_hitters

    rng = np.random.default_rng(11)
    # skewed: 'hot' 30%, 'warm' 12%, tail ~uniform over 200 values
    n = 20_000
    vals = np.where(
        rng.random(n) < 0.30, "hot",
        np.where(rng.random(n) < 0.17, "warm",
                 rng.integers(0, 200, n).astype(str)),
    )
    ds = rd.from_arrow(pa.table({"v": pa.array(vals.tolist(), pa.string())}))
    out = (
        heavy_hitters(ds.repartition(7), "v", k=16)
        .to_pandas().sort_values("value").reset_index(drop=True)
    )
    import collections

    true = collections.Counter(vals.tolist())
    floor = n // 16
    want = sorted((v, c) for v, c in true.items() if c > floor)
    assert list(zip(out["value"], out["n"])) == want

    # uniform input: empty result, stable schema
    uni = rd.from_arrow(pa.table(
        {"v": pa.array([str(i % 500) for i in range(5000)], pa.string())}
    )).repartition(4)
    empty = heavy_hitters(uni, "v", k=16).to_pandas()
    assert len(empty) == 0


def test_bloom_kernel_no_false_negatives():
    """state/bloom.py: every inserted key must test positive (no false
    negatives — the soundness half); non-members are mostly negative
    (the usefulness half, ~1% fpr at default sizing); malformed blobs
    degrade to all-True (read the file, never miss a row)."""
    from standardized_omop_data_etl_ray.state import bloom

    rng = np.random.default_rng(7)
    members = rng.integers(0, 2**63, 5000, dtype=np.uint64)
    blob = bloom.build(members)
    assert bloom.might_contain(blob, members).all()
    others = rng.integers(2**63, 2**64 - 1, 20000, dtype=np.uint64)
    others = np.setdiff1d(others, members)
    fpr = bloom.might_contain(blob, others).mean()
    assert fpr < 0.03, f"fpr {fpr:.4f} too high"
    # duplicates and a single key
    blob1 = bloom.build(np.array([42, 42, 42], dtype=np.uint64))
    assert bloom.might_contain(blob1, np.array([42], np.uint64)).all()
    # malformed / truncated / foreign blobs → conservative all-True
    for bad in [b"", b"XXXX", blob[:10], b"BLM1" + b"\x00" * 4]:
        assert bloom.might_contain(
            bad, np.array([1, 2], np.uint64)
        ).all()
    # empty build is valid and rejects nothing it must hold
    eb = bloom.build(np.array([], dtype=np.uint64))
    assert not bloom.might_contain(eb, members).any()


def _claim_worker(args):
    root, table, n = args
    from standardized_omop_data_etl_ray.state import manifest as mf
    return [mf.claim_epoch(root, table, 1) for _ in range(n)]


def test_epoch_claims_unique_across_processes(tmp_path):
    """manifest.claim_epoch: O_EXCL markers make epoch numbers unique
    across real OS PROCESSES racing on one table — the property the
    optimistic-concurrency contract (and every deterministic delta
    path) rests on."""
    import multiprocessing as mp

    root, table = str(tmp_path), "t"
    with mp.get_context("spawn").Pool(4) as pool:
        claims = pool.map(_claim_worker,
                          [(root, table, 25)] * 4)
    flat = [e for c in claims for e in c]
    assert len(flat) == 100
    assert len(set(flat)) == 100, "duplicate epoch claimed across processes"


def test_commit_lock_mutual_exclusion():
    """manifest.commit_lock: a read-modify-write critical section under
    8 racing threads loses no update (lock violations would drop
    increments); locks release promptly (no residual file)."""
    import tempfile
    import threading
    import time as _time
    from pathlib import Path

    from standardized_omop_data_etl_ray.state import manifest as mf

    root = tempfile.mkdtemp()
    counter = {"v": 0}
    errs = []

    def worker():
        try:
            for _ in range(15):
                with mf.commit_lock(root, "t", timeout_s=60, stale_s=30):
                    v = counter["v"]
                    _time.sleep(0.001)
                    counter["v"] = v + 1
        except Exception as e:  # pragma: no cover - diagnostic
            errs.append(e)

    ts = [threading.Thread(target=worker) for _ in range(8)]
    for t in ts:
        t.start()
    for t in ts:
        t.join()
    assert not errs
    assert counter["v"] == 8 * 15
    assert not (Path(root) / "t" / "_COMMIT_LOCK").exists()


def test_moment_stats_matches_numpy_and_null_semantics():
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from standardized_omop_data_etl_ray.stages.aggregates import moment_stats

    rng = np.random.default_rng(11)
    n = 5000
    g = rng.integers(0, 3, n)
    x = rng.normal(10, 4, n)
    y = 0.5 * x + rng.normal(0, 2, n)
    # nulls: x null on 5%, y null on another 5% — pairwise stats must
    # use only both-non-null rows
    xm = rng.random(n) < 0.05
    ym = rng.random(n) < 0.05
    df = pd.DataFrame({"g": g, "x": x, "y": y})
    df.loc[xm, "x"] = None
    df.loc[ym, "y"] = None

    out = (
        moment_stats(
            rd.from_arrow(pa.Table.from_pandas(df)).repartition(9),
            ["g"], "x", "y",
        )
        .to_pandas().sort_values("g", ignore_index=True)
    )
    for gi in range(3):
        sub = df[(df.g == gi) & df.x.notna() & df.y.notna()]
        row = out[out.g == gi].iloc[0]
        assert row["n"] == len(sub)
        assert np.isclose(row["mean_x"], sub.x.mean())
        assert np.isclose(row["var_x"], sub.x.var(ddof=0))
        assert np.isclose(row["std_x"], sub.x.std(ddof=0))
        assert np.isclose(row["covar_xy"], np.cov(sub.x, sub.y, ddof=0)[0, 1])
        assert np.isclose(row["corr_xy"], np.corrcoef(sub.x, sub.y)[0, 1])

    # single-row group: var 0, corr NULL (zero denominator)
    one = pd.DataFrame({"g": [9], "x": [5.0], "y": [7.0]})
    o = moment_stats(rd.from_arrow(pa.Table.from_pandas(one)),
                     ["g"], "x", "y").to_pandas()
    assert o.loc[0, "var_x"] == 0.0 and pd.isna(o.loc[0, "corr_xy"])


def test_key_skew_stats_closed_form():
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from standardized_omop_data_etl_ray.stages.aggregates import key_skew_stats

    # 100 rows of key 0 (hot), 10 each of keys 1..9
    keys = [0] * 100 + [k for k in range(1, 10) for _ in range(10)]
    ds = rd.from_arrow(pa.table({"k": pa.array(keys, pa.int64())}))
    out = key_skew_stats(ds.repartition(7), ["k"]).to_pandas()
    assert len(out) == 1
    r = out.iloc[0]
    assert r["n_total"] == 190 and r["n_keys"] == 10
    assert r["max_count"] == 100
    assert np.isclose(r["top1_share"], 100 / 190)
    c = np.array([100] + [10] * 9, dtype=float)
    p = c / c.sum()
    assert np.isclose(r["entropy"], -(p * np.log(p)).sum())


def test_grouped_sequence_orders_and_ties():
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from standardized_omop_data_etl_ray.stages.corpus import grouped_sequence

    df = pd.DataFrame({
        "u": [1, 1, 1, 2, 2],
        "t": [3, 1, 2, 5, 5],     # user 2 ties on t -> eid breaks it
        "eid": [30, 10, 20, 51, 50],
        "ev": ["c", "a", "b", "y", "x"],
    })
    out = (
        grouped_sequence(
            rd.from_arrow(pa.Table.from_pandas(df)).repartition(3),
            ["u"], ["t", "eid"], "ev")
        .to_pandas().sort_values("u", ignore_index=True)
    )
    assert out.loc[0, "seq"] == "a,b,c" and out.loc[0, "n"] == 3
    assert out.loc[1, "seq"] == "x,y" and out.loc[1, "n"] == 2


def test_grouped_mode_tiebreak_and_partition_invariance():
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from standardized_omop_data_etl_ray.stages.aggregates import grouped_mode

    df = pd.DataFrame({
        "g": [1, 1, 1, 1, 2, 2, 2, 3],
        "v": ["b", "b", "a", "a", "z", "z", "y", "q"],
    })
    # g=1: a and b tie at 2 -> value-ASC picks "a"; g=2: z wins; g=3: q
    out = grouped_mode(
        rd.from_arrow(pa.Table.from_pandas(df)).repartition(3),
        ["g"], "v",
    ).to_pandas().sort_values("g", ignore_index=True)
    assert out["mode"].tolist() == ["a", "z", "q"]
    assert out["mode_count"].tolist() == [2, 2, 1]
    out2 = grouped_mode(
        rd.from_arrow(pa.Table.from_pandas(df)).repartition(7),
        ["g"], "v",
    ).to_pandas().sort_values("g", ignore_index=True)
    pd.testing.assert_frame_equal(out, out2)


def test_profile_columns_with_nulls():
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from standardized_omop_data_etl_ray.stages.aggregates import (
        profile_columns,
    )

    df = pd.DataFrame({
        "a": [1.0, 2.0, None, 4.0],
        "b": [10, 20, 30, 40],
    })
    out = (
        profile_columns(
            rd.from_arrow(pa.Table.from_pandas(df)).repartition(3),
            ["a", "b"])
        .to_pandas().set_index("col")
    )
    assert out.loc["a", "n"] == 3 and out.loc["a", "nulls"] == 1
    assert out.loc["a", "min_v"] == 1.0 and out.loc["a", "max_v"] == 4.0
    assert np.isclose(out.loc["a", "mean_v"], 7.0 / 3)
    assert out.loc["b", "n"] == 4 and out.loc["b", "nulls"] == 0
    assert np.isclose(out.loc["b", "mean_v"], 25.0)
