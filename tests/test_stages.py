"""Stage-level tests: unpivot, schema ops, joins, aggregates, windows,
priority merge (reference semantics on FIXTURES.md §B-shaped minis)."""

from datetime import date, datetime

import pandas as pd
import pyarrow as pa
import pytest
import ray
import ray.data as rd

from standardized_omop_data_etl_ray.stages.aggregates import (
    deterministic_ids,
    observation_periods,
    partial_then_global_agg,
    redundancy_report,
    sequential_ids,
)
from standardized_omop_data_etl_ray.stages.joins import (
    broadcast_join,
    broadcast_rekey,
    usagi_join,
)
from standardized_omop_data_etl_ray.stages.merge import priority_merge
from standardized_omop_data_etl_ray.stages.schema_ops import (
    CDM54_SCHEMAS,
    pad_to_columns,
    union_by_name,
)
from standardized_omop_data_etl_ray.stages.unpivot import UnpivotItem, make_unpivoter
from standardized_omop_data_etl_ray.stages.windows import (
    sessionize,
    tumbling_aggregate,
)


def test_unpivot_fanout_gating_and_nulls():
    # FIXTURES B5-like: wide survey row → K long records, nulls skipped,
    # gene-test gate on value ∈ {1,2} (als_gene_mutations--measurement.py:38-171)
    wide = pa.table(
        {
            "pid": ["P1", "P2"],
            "item1": pa.array([4, None], pa.int64()),
            "item2": pa.array([3, 2], pa.int64()),
            "gene1": pa.array([9, 1], pa.int64()),
        }
    )
    items = [
        UnpivotItem("item1", 1001, "Item 1"),
        UnpivotItem("item2", 1002, "Item 2", constants={"unit_concept_id": 8582}),
        UnpivotItem("gene1", 2001, "Gene 1", gate_values=(1, 2)),
    ]
    fn = make_unpivoter(items, ["pid"])
    out = fn(wide).to_pandas().sort_values(["pid", "concept_id"])
    # P1: item1+item2 (gene gated out, 9∉{1,2}); P2: item2+gene1 (item1 null)
    assert list(zip(out["pid"], out["concept_id"])) == [
        ("P1", 1001), ("P1", 1002), ("P2", 1002), ("P2", 2001),
    ]
    assert out[out["concept_id"] == 1002]["unit_concept_id"].tolist() == [8582, 8582]


def test_unpivot_repeat():
    wide = pa.table({"pid": ["P1"], "x": pa.array([1], pa.int64())})
    fn = make_unpivoter([UnpivotItem("x", 5, repeat=2)], ["pid"])
    assert fn(wide).num_rows == 2  # aalsdxfx alsdx1 tripling analog


def test_pad_to_columns_canonical_order():
    t = pa.table({"person_id": [1], "extra": ["x"], "death_date": ["2020-01-01"]})
    out = pad_to_columns(t, CDM54_SCHEMAS["death"])
    assert out.column_names == CDM54_SCHEMAS["death"] + ["extra"]
    assert out.column("cause_concept_id").null_count == 1


def test_union_by_name():
    a = rd.from_arrow(pa.table({"x": [1, 2], "y": ["a", "b"]}))
    b = rd.from_arrow(pa.table({"y": ["c"], "z": pa.array([1.5])}))
    out = union_by_name([a, b]).to_pandas()
    assert sorted(out.columns) == ["x", "y", "z"]
    assert len(out) == 3


def test_broadcast_join_modes():
    big = rd.from_arrow(pa.table({"k": ["a", "b", "c"], "v": [1, 2, 3]}))
    small = pa.table({"k": ["a", "b"], "grp": ["G1", "G2"]})
    left = broadcast_join(big, small, "k").to_pandas().sort_values("k")
    assert left["grp"].fillna("-").tolist() == ["G1", "G2", "-"]
    semi = broadcast_join(big, small, "k", how="semi").to_pandas()
    assert sorted(semi["k"]) == ["a", "b"]
    anti = broadcast_join(big, small, "k", how="anti").to_pandas()
    assert anti["k"].tolist() == ["c"]


def test_usagi_join_modes():
    # FIXTURES B3: case-variant sourceName + one-to-many mapping rows
    mapping = pa.table(
        {
            "sourceName": ["Aspirin", "aspirin", "HTN"],
            "domainId": ["Drug", "Drug", "Condition"],
            "conceptId": pa.array([100, 101, 200], pa.int64()),
            "conceptName": ["asp-a", "asp-b", "hyper"],
        }
    )
    rows = rd.from_arrow(pa.table({"term": ["  ASPIRIN ", "unknown"], "pid": [1, 2]}))
    o2m = usagi_join(rows, mapping, "term", domain="Drug").to_pandas()
    # one-to-many fan-out: ASPIRIN matches both case-variant rows
    assert sorted(o2m[o2m["pid"] == 1]["concept_id"].dropna()) == [100, 101]
    first = usagi_join(rows, mapping, "term", domain="Drug", mode="first").to_pandas()
    assert first[first["pid"] == 1]["concept_id"].tolist() == [100]
    anti = usagi_join(rows, mapping, "term", domain="Drug", mode="anti_drop").to_pandas()
    assert anti["pid"].unique().tolist() == [1]
    dz = usagi_join(rows, mapping, "term", domain="Drug", mode="default_zero").to_pandas()
    assert dz[dz["pid"] == 2]["concept_id"].tolist() == [0]
    assert dz[dz["pid"] == 2]["concept_name"].tolist() == ["No Matching Concept"]


def test_broadcast_rekey():
    ds = rd.from_arrow(pa.table({"person_id": ["A", "B", "C"]}))
    out = broadcast_rekey(ds, {"A": 1, "B": 2}, ["person_id"], default=-1)
    assert sorted(out.to_pandas()["person_id"]) == [-1, 1, 2]


def test_priority_merge_reference_semantics():
    """combine_subtables.py:89-157: first source in priority order wins a
    key; later sources' clashing rows diverted to the redundant log."""
    s1 = rd.from_arrow(
        pa.table({"person_id": [1, 2], "concept_id": [10, 20], "v": ["a1", "a2"]})
    )
    s2 = rd.from_arrow(
        pa.table({"person_id": [1, 3], "concept_id": [10, 30], "v": ["b1", "b3"]})
    )
    merged = priority_merge(
        [("srcA", s1), ("srcB", s2)], ["person_id", "concept_id"]
    ).to_pandas()
    winners = merged[~merged["__redundant"]].sort_values("person_id")
    losers = merged[merged["__redundant"]]
    assert list(zip(winners["person_id"], winners["v"])) == [
        (1, "a1"), (2, "a2"), (3, "b3"),
    ]
    assert losers["v"].tolist() == ["b1"]
    assert losers["__source"].tolist() == ["srcB"]


def test_observation_periods_sentinel_and_default():
    t1 = rd.from_arrow(
        pa.table(
            {
                "person_id": ["P1", "P1", "P2"],
                "d1": pa.array(
                    [date(2016, 3, 1), date(2017, 5, 1), date(1900, 1, 1)],
                    pa.date32(),
                ),
            }
        )
    )
    out = observation_periods([(t1, ["d1"])]).to_pandas()
    p1 = out[out["person_id"] == "P1"].iloc[0]
    assert p1["observation_period_start_date"] == date(2016, 3, 1)
    assert p1["observation_period_end_date"] == date(2017, 5, 1)
    # P2's only date is the sentinel → default single-day index span
    # (A4: the reference emits a default span, not a missing person)
    from standardized_omop_data_etl_ray.functions.dates import INDEX_DATE

    p2 = out[out["person_id"] == "P2"].iloc[0]
    assert p2["observation_period_start_date"] == INDEX_DATE
    assert p2["observation_period_end_date"] == INDEX_DATE


def test_sequential_and_deterministic_ids():
    t = pa.table({"k": ["c", "a", "b"]})
    out = sequential_ids(rd.from_arrow(t).repartition(2), "rid", sort_col="k")
    df = out.to_pandas().sort_values("k")
    assert df["rid"].tolist() == [1, 2, 3]
    d1 = deterministic_ids(rd.from_arrow(t), "id", ["k"]).to_pandas()
    d2 = deterministic_ids(rd.from_arrow(t).repartition(3), "id", ["k"]).to_pandas()
    m1 = dict(zip(d1["k"], d1["id"]))
    m2 = dict(zip(d2["k"], d2["id"]))
    assert m1 == m2 and len(set(m1.values())) == 3


def test_redundancy_report():
    ds = rd.from_arrow(
        pa.table(
            {
                "person_id": [1, 1, 1, 2],
                "concept_id": [10, 10, 11, 10],
                "src": ["a", "b", "a", "a"],
            }
        )
    )
    out = redundancy_report(ds, "person_id", "concept_id", "src").to_pandas()
    assert len(out) == 1
    assert out.iloc[0]["n_sources"] == 2


def test_partial_then_global_agg():
    ds = rd.from_arrow(
        pa.table({"k": ["a", "a", "b"], "v": [1.0, 2.0, 5.0]})
    ).repartition(3)
    out = partial_then_global_agg(ds, "k", "v").to_pandas().set_index("k")
    assert out.loc["a", "v_sum"] == 3.0 and out.loc["a", "v_count"] == 2
    assert out.loc["b", "v_min"] == 5.0 and out.loc["b", "v_max"] == 5.0


def test_tumbling_and_session_windows():
    ts = [
        datetime(2024, 1, 1, 0, 5), datetime(2024, 1, 1, 0, 55),
        datetime(2024, 1, 1, 2, 0), datetime(2024, 1, 1, 2, 10),
    ]
    ds = rd.from_arrow(
        pa.table({"u": [1, 1, 1, 1], "ts": pa.array(ts), "v": [1.0, 2.0, 3.0, 4.0]})
    )
    agg = tumbling_aggregate(ds, "ts", "v", unit="hour").to_pandas()
    assert len(agg) == 2
    hour2 = agg[agg["window_start"] == datetime(2024, 1, 1, 2)].iloc[0]
    assert hour2["n_events"] == 2 and hour2["sum_value"] == 7.0
    sess = sessionize(ds, "u", "ts", gap_seconds=3600).to_pandas()
    assert sess["session_id"].nunique() == 2


def test_bucketed_groupby_many_buckets():
    """Bucket count is a parameter (not a hardcoded 64) — >64 buckets
    must partition the keyspace without losing or duplicating rows."""
    import numpy as np
    import pandas as pd

    from standardized_omop_data_etl_ray.stages.joins import (
        bucketed_groupby,
        default_buckets,
    )

    n = 5000
    t = pa.table({
        "k": pa.array(np.arange(n) % 997, pa.int64()),
        "v": pa.array(np.arange(n, dtype=np.float64)),
    })

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby("k", as_index=False)["v"].sum()

    out = bucketed_groupby(
        rd.from_arrow(t).repartition(4), ["k"], per_bucket, num_buckets=256
    ).to_pandas()
    expect = t.to_pandas().groupby("k", as_index=False)["v"].sum()
    merged = out.sort_values("k").reset_index(drop=True)
    assert merged.equals(expect.sort_values("k").reset_index(drop=True))
    # derived sizing: row-count path scales, floor/ceiling respected
    assert default_buckets(2_000_000_000) == 4096  # ceiling
    assert default_buckets(100_000) == 64          # floor (≥500 rows/bucket)
    assert default_buckets(10_000) == 21           # tiny input: overhead cap
    assert default_buckets(100_000_000) == 401     # ~1 bucket / 250k rows


def test_auto_hash_join_path_parity():
    """auto_hash_join must produce identical rows, columns AND Arrow
    dtypes on both plans: broadcast (build side under the threshold)
    and partitioned (threshold forced to 0).  Covers colliding and
    non-colliding key names, and the right-key-kept-with-_r-suffix
    contract inherited from partitioned_hash_join."""
    import numpy as np

    from standardized_omop_data_etl_ray.stages.joins import auto_hash_join

    left = pa.table({
        "k": pa.array(np.arange(100) % 7, pa.int64()),
        "lv": pa.array(np.arange(100, dtype=np.float64)),
    })
    right = pa.table({
        "k": pa.array(np.arange(7), pa.int64()),
        "rv": pa.array([f"r{i}" for i in range(7)], pa.string()),
        "small": pa.array(np.arange(7, dtype=np.int32)),
    })

    def run(limit):
        out = auto_hash_join(
            rd.from_arrow(left).repartition(3),
            rd.from_arrow(right).repartition(2),
            ["k"], ["k"],
            right_rows=7, broadcast_limit=limit, num_buckets=4,
            left_schema=left.schema, right_schema=right.schema,
        )
        df = out.to_pandas()
        return df.sort_values(["k", "lv"]).reset_index(drop=True)

    bcast, part = run(1000), run(0)
    assert list(bcast.columns) == ["k", "lv", "k_r", "rv", "small"]
    assert list(part.columns) == list(bcast.columns)
    assert list(bcast.dtypes) == list(part.dtypes)  # incl. int32 'small'
    pd.testing.assert_frame_equal(bcast, part)
    assert (bcast["k"] == bcast["k_r"]).all() and len(bcast) == 100

    # non-colliding key names: right key kept unsuffixed
    right2 = right.rename_columns(["k2", "rv", "small"])
    out = auto_hash_join(
        rd.from_arrow(left), rd.from_arrow(right2), ["k"], ["k2"],
        right_rows=7, broadcast_limit=1000,
        left_schema=left.schema, right_schema=right2.schema,
    ).to_pandas()
    assert list(out.columns) == ["k", "lv", "k2", "rv", "small"]

    # non-inner joins must always route to the partitioned plan
    lout = auto_hash_join(
        rd.from_arrow(left), rd.from_arrow(right2.slice(0, 3)),
        ["k"], ["k2"], how="left",
        right_rows=3, broadcast_limit=1000, num_buckets=4,
        left_schema=left.schema, right_schema=right2.schema,
    ).to_pandas()
    assert len(lout) == 100 and lout["rv"].isna().sum() > 0


def test_partitioned_join_exchange_parity():
    """The IPC bucket router (exchange="ipc") must be row/column/dtype
    identical to the padded-union exchange on inner AND left joins,
    with int and string keys, including buckets where one side is
    empty (num_buckets > distinct keys) and with compression on."""
    import numpy as np

    from standardized_omop_data_etl_ray.stages.joins import (
        partitioned_hash_join,
    )

    rng = np.random.default_rng(7)
    left = pa.table({
        "k": pa.array(rng.integers(0, 40, 500), pa.int64()),
        "sk": pa.array([f"s{i % 13}" for i in range(500)], pa.string()),
        "lv": pa.array(rng.standard_normal(500)),
    })
    # only half the key range present → some left rows miss
    right = pa.table({
        "k": pa.array(np.arange(0, 40, 2), pa.int64()),
        "sk": pa.array([f"s{i % 13}" for i in range(20)], pa.string()),
        "rv": pa.array(np.arange(20, dtype=np.int32)),
    })

    def run(exchange, on, how, compression=None):
        out = partitioned_hash_join(
            rd.from_arrow(left).repartition(4),
            rd.from_arrow(right).repartition(2),
            on, on, how=how, num_buckets=16, exchange=exchange,
            left_schema=left.schema, right_schema=right.schema,
            ipc_compression=compression,
        )
        df = out.to_pandas()
        return df.sort_values(list(df.columns)).reset_index(drop=True)

    for on in (["k"], ["sk"], ["k", "sk"]):
        for how in ("inner", "left"):
            pad = run("pad", on, how)
            ipc = run("ipc", on, how)
            assert list(pad.columns) == list(ipc.columns)
            assert list(pad.dtypes) == list(ipc.dtypes)
            pd.testing.assert_frame_equal(pad, ipc)

    # compression changes bytes on the wire, never values
    z = run("ipc", ["k"], "inner", compression="zstd")
    pd.testing.assert_frame_equal(run("pad", ["k"], "inner"), z)


def test_exchange_auto_cost_model():
    """exchange="auto" routes by the bytes-per-row cost model: ipc for
    wide fixed-width schemas (pad nulls are material), pad for narrow
    joins and for wide-CONTENT rows where pad nulls are noise; measured
    row-bytes hints override the static estimate."""
    import importlib

    joins = importlib.import_module(
        "standardized_omop_data_etl_ray.stages.joins"
    )

    lineitem_like = pa.schema(
        [("a", pa.int64()), ("b", pa.int64()), ("c", pa.int64()),
         ("d", pa.int32()), ("e", pa.float64()), ("f", pa.float64()),
         ("g", pa.float64()), ("h", pa.float64()), ("i", pa.string()),
         ("j", pa.string()), ("k", pa.timestamp("us"))]
    )
    orders_like = pa.schema(
        [("a", pa.int64()), ("b", pa.int64()), ("c", pa.string()),
         ("d", pa.float64()), ("e", pa.timestamp("us")),
         ("f", pa.string())]
    )
    narrow = pa.schema([("n", pa.int64()), ("g", pa.int64())])
    docs_like = pa.schema([("id", pa.int64()), ("text", pa.string())])

    assert joins.auto_exchange(lineitem_like, orders_like) == "ipc"
    assert joins.auto_exchange(narrow, narrow) == "pad"
    # long-text corpus joined to a wide side: pad nulls are noise next
    # to the text payload — the static estimate can't see that, the
    # measured row-bytes hint can
    assert joins.auto_exchange(docs_like, lineitem_like) == "ipc"
    assert joins.auto_exchange(
        docs_like, lineitem_like, left_row_bytes=450.0) == "pad"


def test_interval_join_containment():
    """interval_join pairs each left row with same-key windows whose
    [start, end) contains its ts — boundary-inclusive at start,
    exclusive at end, no cross-key leakage, fan-out when windows
    overlap."""
    import numpy as np

    from standardized_omop_data_etl_ray.stages.joins import interval_join

    t0 = pd.Timestamp("2024-01-01")
    left = pa.table({
        "eid": pa.array([1, 2, 3, 4], pa.int64()),
        "k": pa.array([1, 1, 1, 2], pa.int64()),
        "ts": pa.array(
            [t0, t0 + pd.Timedelta("30min"), t0 + pd.Timedelta("2h"), t0],
            pa.timestamp("us"),
        ),
    })
    right = pa.table({
        "wid": pa.array([10, 11, 12], pa.int64()),
        "k": pa.array([1, 1, 2], pa.int64()),
        "win_start": pa.array(
            [t0, t0 + pd.Timedelta("15min"), t0 + pd.Timedelta("1h")],
            pa.timestamp("us"),
        ),
        "win_end": pa.array(
            [t0 + pd.Timedelta("1h"), t0 + pd.Timedelta("45min"),
             t0 + pd.Timedelta("2h")],
            pa.timestamp("us"),
        ),
    })
    out = interval_join(
        rd.from_arrow(left).repartition(2), rd.from_arrow(right),
        ["k"], "ts", "win_start", "win_end", right_rows=3,
        left_schema=left.schema, right_schema=right.schema,
    ).to_pandas()
    got = sorted(zip(out["eid"], out["wid"]))
    # eid1@t0: in w10 [t0,1h) only (start-inclusive). eid2@30min: in
    # w10 AND w11 (overlap fan-out). eid3@2h: w12 is key 2 → nothing,
    # and [1h,2h) excludes its end. eid4 key2@t0: before w12 → nothing.
    assert got == [(1, 10), (2, 10), (2, 11)]

    # partitioned path must agree (force it with right_rows above limit)
    big = interval_join(
        rd.from_arrow(left).repartition(2), rd.from_arrow(right),
        ["k"], "ts", "win_start", "win_end",
        right_rows=10_000_000,
        left_schema=left.schema, right_schema=right.schema,
    ).to_pandas()
    assert sorted(zip(big["eid"], big["wid"])) == got


def test_banded_interval_join_equals_plain():
    """banded_interval_join must equal interval_join row-for-row on a
    randomized workload with one pathological hot key, intervals that
    straddle band boundaries, and boundary-exact timestamps — on both
    the broadcast and the forced-partitioned path."""
    import numpy as np

    from standardized_omop_data_etl_ray.stages.joins import (
        banded_interval_join,
        interval_join,
    )

    rng = np.random.default_rng(11)
    n_l, n_r = 400, 120
    hot = rng.random(n_l) < 0.6  # 60% of events on key 7
    lk = np.where(hot, 7, rng.integers(0, 5, n_l)).astype(np.int64)
    lts = rng.integers(0, 10_000, n_l).astype(np.int64)
    rk = np.where(rng.random(n_r) < 0.6, 7,
                  rng.integers(0, 5, n_r)).astype(np.int64)
    rs = rng.integers(0, 10_000, n_r).astype(np.int64)
    rlen = rng.integers(0, 900, n_r).astype(np.int64)  # incl. empty
    left = pa.table({
        "eid": pa.array(np.arange(n_l), pa.int64()),
        "k": pa.array(lk), "ts": pa.array(lts),
    })
    right = pa.table({
        "wid": pa.array(np.arange(n_r), pa.int64()),
        "k": pa.array(rk), "s": pa.array(rs),
        "e": pa.array(rs + rlen),
    })

    def pairs(ds):
        out = ds.to_pandas()
        return sorted(zip(out["eid"], out["wid"]))

    want = pairs(interval_join(
        rd.from_arrow(left).repartition(3), rd.from_arrow(right),
        ["k"], "ts", "s", "e", right_rows=n_r,
        left_schema=left.schema, right_schema=right.schema,
    ))
    assert len(want) > 50  # non-trivial workload
    for rr in (n_r, 10_000_000):  # broadcast then forced-partitioned
        got_ds = banded_interval_join(
            rd.from_arrow(left).repartition(3), rd.from_arrow(right),
            ["k"], "ts", "s", "e", band_width=1000, right_rows=rr,
            left_schema=left.schema, right_schema=right.schema,
        )
        assert pairs(got_ds) == want
    # column parity with the plain join (no __band leakage)
    cols = banded_interval_join(
        rd.from_arrow(left), rd.from_arrow(right),
        ["k"], "ts", "s", "e", band_width=1000, right_rows=n_r,
        left_schema=left.schema, right_schema=right.schema,
    ).to_pandas().columns
    assert sorted(cols) == ["e", "eid", "k", "k_r", "s", "ts", "wid"]


def test_bucketed_sum_matches_ray_aggregate():
    """bucketed_sum == groupby().aggregate(Sum) including null keys and
    multiple sum columns, on any partitioning."""
    import numpy as np
    from ray.data.aggregate import Sum

    from standardized_omop_data_etl_ray.stages.joins import bucketed_sum

    rng = np.random.default_rng(5)
    n = 5000
    df = pd.DataFrame({
        "k": rng.integers(0, 900, n).astype("float64"),
        "a": rng.integers(-10, 10, n).astype("int64"),
        "b": rng.integers(0, 100, n).astype("int64"),
    })
    df.loc[df.index % 97 == 0, "k"] = np.nan  # null-key group
    ds = rd.from_pandas(df).repartition(7)
    got = (
        bucketed_sum(ds, ["k"], ["a", "b"], num_buckets=6)
        .to_pandas().sort_values("k").reset_index(drop=True)
    )
    want = (
        ds.groupby("k").aggregate(Sum("a", alias_name="a"),
                                  Sum("b", alias_name="b"))
        .to_pandas().sort_values("k").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want, check_dtype=False)

    # all-null VALUE groups must sum to NULL like Ray's Sum, not
    # pandas' 0 (and partially-null groups skip nulls) — on both the
    # combine=True and combine=False paths
    df2 = pd.DataFrame({
        "k": [1, 1, 2, 2, 3],
        "v": [np.nan, np.nan, 5.0, np.nan, 7.0],
    })
    ds2 = rd.from_pandas(df2).repartition(3)
    for combine in (True, False):
        g2 = (
            bucketed_sum(ds2, ["k"], ["v"], num_buckets=2,
                         combine=combine)
            .to_pandas().sort_values("k").reset_index(drop=True)
        )
        assert pd.isna(g2.loc[0, "v"])          # all-null group → NULL
        assert g2.loc[1, "v"] == 5.0 and g2.loc[2, "v"] == 7.0


def test_exact_quantiles_matches_duckdb_semantics():
    """exact_quantiles == quantile_disc (rank = max(0, ceil(q·n)−1)) on
    odd/even n, with duplicates, on any partitioning."""
    import duckdb
    import numpy as np

    from standardized_omop_data_etl_ray.stages.aggregates import (
        exact_quantiles,
    )

    rng = np.random.default_rng(3)
    for n in (7, 20, 101):
        vals = rng.integers(0, 40, n).astype("int64")  # duplicates
        qs = [0.0, 0.1, 0.25, 0.5, 0.75, 0.9, 1.0]
        got = exact_quantiles(
            rd.from_pandas(pd.DataFrame({"x": vals})).repartition(4),
            "x", qs,
        ).to_pandas()
        con = duckdb.connect()
        con.register("v", pd.DataFrame({"x": vals}))
        for q, v in zip(got["q"], got["value"]):
            want = con.execute(
                f"SELECT quantile_disc(x, {q}) FROM v"
            ).fetchone()[0]
            assert v == want, (n, q, v, want)


def test_bloom_prefilter_no_false_negatives_and_join_equal():
    """bloom_prefilter never drops a true join key (inner-join results
    identical with and without it) and rejects most non-members."""
    import numpy as np

    from standardized_omop_data_etl_ray.stages.joins import (
        bloom_prefilter,
        build_bloom,
        partitioned_hash_join,
    )

    rng = np.random.default_rng(2)
    build_keys = rng.choice(100_000, 500, replace=False).astype("int64")
    build = pa.table({
        "k": pa.array(build_keys),
        "name": [f"n{k}" for k in build_keys],
    })
    probe_keys = rng.integers(0, 100_000, 20_000).astype("int64")
    probe = pa.table({
        "k": pa.array(probe_keys),
        "v": pa.array(rng.integers(0, 9, 20_000).astype("int64")),
    })
    bds, pds = rd.from_arrow(build), rd.from_arrow(probe).repartition(4)
    bloom = build_bloom(bds, "k", n_bits=1 << 16, k=4)
    pre = bloom_prefilter(pds, "k", bloom).materialize()
    kept = set(pre.to_pandas()["k"])
    assert set(build_keys) & set(probe_keys) <= kept  # no false negatives
    assert pre.count() < 20_000 * 0.25  # rejects most non-members

    def join(p):
        return (
            partitioned_hash_join(
                p, bds, ["k"], how="inner",
                left_schema=probe.schema, right_schema=build.schema,
                num_buckets=4,
            ).to_pandas().sort_values(["k", "v"]).reset_index(drop=True)
        )

    pd.testing.assert_frame_equal(join(pre), join(pds))


def test_skew_join_equals_plain_join_with_forced_hot_key():
    """skew_join (hot keys → broadcast plan, cold → partitioned)
    equals the plain join row-for-row under a 60%-hot-key workload;
    detect_hot_keys finds the planted key."""
    import numpy as np

    from standardized_omop_data_etl_ray.stages.joins import (
        auto_hash_join,
        detect_hot_keys,
        skew_join,
    )

    rng = np.random.default_rng(4)
    n = 20_000
    hot = rng.random(n) < 0.6
    lk = np.where(hot, 777, rng.integers(0, 500, n)).astype("int64")
    left = pa.table({
        "k": pa.array(lk),
        "v": pa.array(np.arange(n, dtype=np.int64)),
    })
    rk = np.arange(0, 1000, dtype=np.int64)
    right = pa.table({"k": pa.array(rk), "name": [f"n{k}" for k in rk]})
    lds = rd.from_arrow(left).repartition(4)
    rds = rd.from_arrow(right)

    hot_keys = detect_hot_keys(lds, "k", min_rows=1000)
    assert 777 in hot_keys

    def norm(ds):
        return (
            ds.to_pandas().sort_values(["k", "v"]).reset_index(drop=True)
        )

    got = norm(skew_join(
        lds, rds, "k", hot_keys=hot_keys, right_rows=10_000_000,
        left_schema=left.schema, right_schema=right.schema,
        num_buckets=4,
    ))
    want = norm(auto_hash_join(
        lds, rds, ["k"], right_rows=len(rk),
        left_schema=left.schema, right_schema=right.schema,
    ))
    pd.testing.assert_frame_equal(got, want)


def test_exact_quantiles_ignores_nulls():
    """NULLs must not occupy sorted ranks (quantile_disc ignores them) —
    advisor finding, round 3."""
    import duckdb

    from standardized_omop_data_etl_ray.stages.aggregates import (
        exact_quantiles,
    )

    vals = [None, 10, None, 30, 20, None, 40, None, 50]
    df = pd.DataFrame({"x": pd.array(vals, dtype="Int64")})
    got = exact_quantiles(
        rd.from_pandas(df).repartition(3), "x", [0.0, 0.5, 1.0]
    ).to_pandas()
    con = duckdb.connect()
    con.register("v", df)
    for q, v in zip(got["q"], got["value"]):
        want = con.execute(
            f"SELECT quantile_disc(x, {q}) FROM v"
        ).fetchone()[0]
        assert v == want, (q, v, want)


def test_ordered_sorted_refs_reconstructs_global_order():
    """Block order is re-derived from each block's first/last key, so a
    permuted block list (what preserve_order=False can hand back after
    a sort) still enumerates correctly."""
    from standardized_omop_data_etl_ray.stages.aggregates import (
        ordered_sorted_refs,
        sequential_ids,
    )

    # blocks deliberately OUT of global order (and internally sorted)
    blocks = [
        pa.table({"k": pa.array([20, 21, 22], pa.int64())}),
        pa.table({"k": pa.array([], pa.int64())}),
        pa.table({"k": pa.array([0, 1, 2], pa.int64())}),
        pa.table({"k": pa.array([10, 11], pa.int64())}),
    ]
    ds = rd.from_arrow_refs([ray.put(b) for b in blocks])
    refs = ordered_sorted_refs(ds, ["k"])
    got = pa.concat_tables([
        t if isinstance(t, pa.Table)
        else pa.Table.from_pandas(t, preserve_index=False)
        for t in ray.get(refs)
    ])
    assert got.column("k").to_pylist() == [0, 1, 2, 10, 11, 20, 21, 22]

    # order_cols path on sequential_ids: data already sorted by k,
    # block positions scrambled → ids must still follow k order
    out = sequential_ids(ds, "rid", order_cols=["k"]).to_pandas()
    out = out.sort_values("k").reset_index(drop=True)
    assert out["rid"].tolist() == list(range(1, 9))


def test_bucketed_agg_stable_dtype_with_all_null_bucket():
    """A bucket whose groups are all-null must not flip a sum/min/max
    column to float64 while other buckets emit int64 — output dtype is
    pinned from the source schema (advisor finding, round 3)."""
    import numpy as np

    from standardized_omop_data_etl_ray.stages.joins import bucketed_agg

    df = pd.DataFrame({
        "k": list(range(40)),
        "v": pd.array(
            [None] * 20 + list(range(20)), dtype="Int64"
        ),
    })
    out = bucketed_agg(
        rd.from_pandas(df).repartition(4),
        ["k"],
        {"s": ("v", "sum"), "mn": ("v", "min"), "n": ("v", "count")},
        num_buckets=8,
    ).materialize()
    # every output block must agree on Arrow dtype for each column
    schemas = {
        tuple(
            (f.name, str(f.type))
            for f in (
                t.schema if isinstance(t, pa.Table)
                else pa.Schema.from_pandas(t)
            )
        )
        for t in ray.get(out.to_arrow_refs())
        if (t.num_rows if isinstance(t, pa.Table) else len(t)) > 0
    }
    assert len(schemas) == 1, schemas
    (schema,) = schemas
    types = dict(schema)
    assert types["s"] == "int64"
    assert types["mn"] == "int64"
    assert types["n"] == "int64"
    p = out.to_pandas().sort_values("k").reset_index(drop=True)
    assert p["s"].isna()[:20].all()
    assert (p["s"][20:].to_numpy() == np.arange(20)).all()


def test_pivot_agg_matches_conditional_aggregation():
    """pivot_agg == SUM(CASE WHEN name=... THEN value END) per key,
    including the all-null cell (NULL, not 0) and dtype stability."""
    import numpy as np

    from standardized_omop_data_etl_ray.stages.unpivot import pivot_agg

    t = pa.table({
        "k": pa.array([1, 1, 1, 2, 2, 3], pa.int64()),
        "name": ["a", "a", "b", "b", "b", "a"],
        "v": pa.array([10, 20, 5, 7, None, 4], pa.int64()),
    })
    out = (
        pivot_agg(rd.from_arrow(t).repartition(3), ["k"], "name", "v",
                  names=["a", "b", "c"], num_buckets=4)
        .to_pandas().sort_values("k").reset_index(drop=True)
    )
    assert out["a"].tolist() == [30, None, 4] or (
        out["a"][0] == 30 and pd.isna(out["a"][1]) and out["a"][2] == 4
    )
    assert out["b"][0] == 5 and out["b"][1] == 7 and pd.isna(out["b"][2])
    assert pd.isna(out["c"]).all()          # name never present → NULL


def test_grouped_quantiles_matches_quantile_disc():
    """grouped_quantiles == DuckDB quantile_disc per group, nulls
    ignored, any partitioning."""
    import duckdb
    import numpy as np

    from standardized_omop_data_etl_ray.stages.aggregates import (
        grouped_quantiles,
    )

    rng = np.random.default_rng(7)
    n = 500
    df = pd.DataFrame({
        "g": rng.integers(0, 23, n),
        "x": rng.integers(0, 100, n).astype("float64"),
    })
    df.loc[df.index % 11 == 0, "x"] = None  # nulls ignored
    qs = [0.0, 0.25, 0.5, 0.9, 1.0]
    got = (
        grouped_quantiles(rd.from_pandas(df).repartition(5), ["g"], "x",
                          qs, num_buckets=4)
        .to_pandas().sort_values(["g", "q"]).reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("t", df)
    want = con.execute(" UNION ALL ".join(
        f"SELECT g, CAST({q} AS DOUBLE) AS q, "
        f"quantile_disc(x, {q}) AS value FROM t "
        f"WHERE x IS NOT NULL GROUP BY g"
        for q in qs
    ) + " ORDER BY g, q").df().reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got.astype({"g": "int64"}), want.astype({"g": "int64"}),
        check_dtype=False,
    )


def test_grouped_quantiles_null_keys():
    """Null-KEY groups are real groups and must not shift other groups'
    value offsets (review finding, round 4)."""
    from standardized_omop_data_etl_ray.stages.aggregates import (
        grouped_quantiles,
    )

    df = pd.DataFrame({
        "g1": [1, 1, 1, 1, 1, 1, 2, 2, 2],
        "g2": ["a", "a", "a", None, None, None, "a", "a", "a"],
        "x": [1.0, 2.0, 3.0, 100.0, 200.0, 300.0, 10.0, 20.0, 30.0],
    })
    out = (
        grouped_quantiles(rd.from_pandas(df).repartition(2),
                          ["g1", "g2"], "x", [0.5], num_buckets=2)
        .to_pandas()
    )
    vals = {}
    for _, r in out.iterrows():
        key = (r["g1"], None if pd.isna(r["g2"]) else r["g2"])
        vals[key] = r["value"]
    assert vals[(1, "a")] == 2.0
    assert vals[(1, None)] == 200.0   # null-key group present
    assert vals[(2, "a")] == 20.0     # offsets not shifted


def test_except_intersect_all_multiset_semantics():
    """except_all / intersect_all == SQL EXCEPT ALL / INTERSECT ALL
    including duplicate multiplicities and null values."""
    import duckdb

    from standardized_omop_data_etl_ray.stages.schema_ops import (
        except_all,
        intersect_all,
    )

    l = pd.DataFrame({"k": ["a", "a", "a", "b", "c", None, None]})
    r = pd.DataFrame({"k": ["a", "b", "b", "d", None]})
    lds = rd.from_pandas(l).repartition(3)
    rds = rd.from_pandas(r).repartition(2)
    con = duckdb.connect()
    con.register("l", l)
    con.register("r", r)
    for fn, sql in (
        (except_all, "SELECT k FROM l EXCEPT ALL SELECT k FROM r"),
        (intersect_all, "SELECT k FROM l INTERSECT ALL SELECT k FROM r"),
    ):
        got = sorted(
            fn(lds, rds, ["k"], num_buckets=2).to_pandas()["k"]
            .fillna("~null~").tolist()
        )
        want = sorted(
            con.execute(sql).df()["k"].fillna("~null~").tolist()
        )
        assert got == want, (fn.__name__, got, want)


def test_quantile_cont_matches_duckdb():
    """interpolation='linear' == quantile_cont, including n=1, q=0/1
    and fractional-rank interior points, global and per-group."""
    import duckdb

    import numpy as np

    from standardized_omop_data_etl_ray.stages.aggregates import (
        exact_quantiles,
        grouped_quantiles,
    )

    rng = np.random.default_rng(5)
    for n in (1, 2, 7, 100):
        x = np.sort(rng.normal(size=n) * 100)
        qs = [0.0, 0.1, 0.25, 0.5, 0.9, 1.0]
        got = exact_quantiles(
            rd.from_pandas(pd.DataFrame({"x": x})), "x", qs,
            interpolation="linear",
        )
        con = duckdb.connect()
        con.execute("CREATE TABLE v AS SELECT * FROM UNNEST(?) t(x)", [list(x)])
        for q, v in zip(got["q"].to_pylist(), got["value"].to_pylist()):
            want = con.execute(
                f"SELECT quantile_cont(x, {q}) FROM v"
            ).fetchone()[0]
            assert abs(v - want) < 1e-9, (n, q, v, want)

    df = pd.DataFrame({
        "k": rng.integers(0, 5, 200),
        "x": rng.normal(size=200) * 10,
    })
    df.loc[0, "k"] = 99  # single-row group
    got = (
        grouped_quantiles(rd.from_pandas(df), ["k"], "x",
                          [0.25, 0.5, 0.75], interpolation="linear")
        .to_pandas().sort_values(["k", "q"], ignore_index=True)
    )
    want = duckdb.sql("""
        SELECT k, q, quantile_cont(x, 0.25) AS v25,
               quantile_cont(x, 0.5) AS v50,
               quantile_cont(x, 0.75) AS v75
        FROM df, (SELECT 1 AS q) GROUP BY k, q ORDER BY k
    """).df()
    for _, r in want.iterrows():
        sub = got[got["k"] == r["k"]]
        np.testing.assert_allclose(
            sub["value"].to_numpy(), [r["v25"], r["v50"], r["v75"]],
            rtol=1e-12,
        )


def test_tdigest_rank_error_bound():
    """t-digest quantile estimates stay inside a ±1% rank bracket of
    the exact empirical quantiles on a skewed distribution, across
    block splits (mergeability is the construction)."""
    import numpy as np

    from standardized_omop_data_etl_ray.stages.sketches import (
        tdigest_quantiles,
    )

    rng = np.random.default_rng(11)
    x = np.exp(rng.normal(size=120_000) * 2.0)  # heavy right tail
    qs = [0.01, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99, 0.999]
    ds = rd.from_pandas(pd.DataFrame({"x": x})).repartition(13)
    got = tdigest_quantiles(ds, "x", qs, delta=200.0)
    eps = 0.01
    for q, v in zip(got["q"].to_pylist(), got["value"].to_pylist()):
        lo = np.quantile(x, max(0.0, q - eps))
        hi = np.quantile(x, min(1.0, q + eps))
        assert lo <= v <= hi, (q, v, lo, hi)

    # empty + all-null inputs degrade cleanly
    empty = rd.from_pandas(pd.DataFrame({"x": pd.array([], dtype="float64")}))
    t = tdigest_quantiles(empty, "x", [0.5])
    assert t["value"].to_pylist() == [None]


def test_unnest_list_nulls_empties_and_ordinality():
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from standardized_omop_data_etl_ray.stages.unpivot import unnest_list

    t = pa.table({
        "id": pa.array([1, 2, 3, 4], pa.int64()),
        "xs": pa.array([[10, 20, 30], None, [], [40]],
                       pa.list_(pa.int32())),
    })
    out = (
        unnest_list(rd.from_arrow(t).repartition(2), "xs", ["id"])
        .to_pandas().sort_values(["id", "idx"], ignore_index=True)
    )
    # null and empty lists emit no rows (SQL UNNEST)
    assert out["id"].tolist() == [1, 1, 1, 4]
    assert out["idx"].tolist() == [1, 2, 3, 1]
    assert out["val"].tolist() == [10, 20, 30, 40]
    assert str(out.dtypes["val"]) == "int32"


def test_json_extract_column_nulls_and_missing_keys():
    import pyarrow as pa
    import ray.data as rd

    from standardized_omop_data_etl_ray.stages.schema_ops import (
        json_extract_column,
    )

    t = pa.table({
        "id": pa.array([1, 2, 3, 4], pa.int64()),
        "j": pa.array(['{"k": 7, "s": "x"}', '{"s": "y"}', None,
                       '{"k": -3}'], pa.string()),
    })
    out = (
        json_extract_column(rd.from_arrow(t), "j", "$.k", "k",
                            pa.int64())
        .to_pandas().sort_values("id", ignore_index=True)
    )
    assert out["k"].tolist()[0] == 7 and out["k"].tolist()[3] == -3
    assert out["k"].isna().tolist() == [False, True, True, False]
    s = json_extract_column(rd.from_arrow(t), "j", "$.s", "s"
                            ).to_pandas().sort_values(
                                "id", ignore_index=True)
    assert s["s"].tolist()[:2] == ["x", "y"]


def test_grouped_outliers_planted():
    """Planted spike per group, a constant group (0/0 → excluded), a
    single-row group, NULL values, repartition invariance."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from standardized_omop_data_etl_ray.stages.aggregates import grouped_outliers

    rng = np.random.default_rng(17)
    base = pd.DataFrame({
        "id": np.arange(300),
        "k": np.repeat(["a", "b", "c"], 100),
        "v": rng.normal(0, 1, 300),
    })
    base.loc[0, "v"] = 50.0      # spike in a
    base.loc[100, "v"] = -40.0   # spike in b
    base.loc[5, "v"] = np.nan    # null never an outlier
    extra = pd.DataFrame({
        "id": [900, 901, 902],
        "k": ["const", "const", "single"],
        "v": [3.0, 3.0, 99.0],
    })
    df = pd.concat([base, extra], ignore_index=True)

    for parts in (2, 7):
        got = (
            grouped_outliers(
                rd.from_arrow(pa.Table.from_pandas(df)).repartition(parts),
                "k", "v", 3.0, ["id", "k", "v"], num_buckets=3)
            .to_pandas().sort_values("id", ignore_index=True)
        )
        assert 0 in got["id"].tolist() and 100 in got["id"].tolist()
        assert not set(got["id"]) & {5, 900, 901, 902}
        # cross-check against a pandas oracle
        gb = df.groupby("k")["v"]
        z = (df["v"] - gb.transform("mean")) / gb.transform("std", ddof=0)
        want = df.loc[np.abs(z) > 3.0, "id"].tolist()
        assert got["id"].tolist() == sorted(want)


def test_extract_all_matches_ordinality_and_nulls():
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from standardized_omop_data_etl_ray.stages.schema_ops import extract_all_matches

    df = pd.DataFrame({
        "id": [1, 2, 3, 4],
        "s": ["a1 b22 c333", "no digits here", None, "9 88"],
    })
    got = (
        extract_all_matches(
            rd.from_arrow(pa.Table.from_pandas(df)).repartition(2),
            "s", "[0-9]+", ["id"])
        .to_pandas().sort_values(["id", "idx"], ignore_index=True)
    )
    assert got[got["id"] == 1]["match"].tolist() == ["1", "22", "333"]
    assert got[got["id"] == 1]["idx"].tolist() == [1, 2, 3]
    assert not set(got["id"]) & {2, 3}      # no-match and NULL: no rows
    assert got[got["id"] == 4]["match"].tolist() == ["9", "88"]


def test_equi_width_histogram_edges_and_overflow():
    """Exact edge values (lo, hi, bin boundaries), NULLs and
    out-of-range → the disclosed -1 row; numpy oracle; repartition
    invariance."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from standardized_omop_data_etl_ray.stages.aggregates import (
        equi_width_histogram,
    )

    rng = np.random.default_rng(29)
    v = rng.uniform(-5, 115, 400)
    v = np.concatenate([v, [0.0, 100.0, 50.0, 49.999999, -0.0001]])
    df = pd.DataFrame({"x": v})
    df.loc[3, "x"] = np.nan

    want = np.zeros(10, np.int64)
    out_of_range = 0
    for x in df["x"]:
        if np.isnan(x) or x < 0 or x > 100:
            out_of_range += 1
        else:
            want[min(int(x // 10), 9)] += 1

    for parts in (1, 5):
        got = (
            equi_width_histogram(
                rd.from_arrow(pa.Table.from_pandas(df)).repartition(parts),
                "x", 0.0, 100.0, 10)
            .to_pandas().sort_values("bin", ignore_index=True)
        )
        g = got.set_index("bin")["n"]
        assert g.loc[-1] == out_of_range
        for b in range(10):
            assert g.get(b, 0) == want[b]
        assert got[got["bin"] >= 0]["lo_edge"].tolist() == [
            b * 10.0 for b in got[got["bin"] >= 0]["bin"]]


def test_quantile_bucket_transform_boundaries_and_nulls():
    """Edge values land BELOW their own quantile edge (strict >),
    NULLs get NULL buckets, numpy oracle, repartition invariance."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from standardized_omop_data_etl_ray.stages.aggregates import (
        quantile_bucket_transform,
    )

    rng = np.random.default_rng(37)
    v = rng.permutation(np.arange(100, dtype="float64"))
    df = pd.DataFrame({"id": np.arange(100), "v": v})
    df.loc[7, "v"] = np.nan

    for parts in (1, 4):
        got = (
            quantile_bucket_transform(
                rd.from_arrow(pa.Table.from_pandas(df)).repartition(parts),
                "v", [0.25, 0.5, 0.75], ["id"])
            .to_pandas().sort_values("id", ignore_index=True)
        )
        vals = df.sort_values("id")["v"].to_numpy()
        nn = vals[~np.isnan(vals)]
        edges = np.sort([np.sort(nn)[max(0, int(np.ceil(q * len(nn))) - 1)]
                         for q in (0.25, 0.5, 0.75)])
        want = np.searchsorted(edges, vals, side="left").astype("float64")
        want[np.isnan(vals)] = np.nan
        got_b = got["q_bucket"].to_numpy(dtype="float64", na_value=np.nan)
        assert np.allclose(got_b, want, equal_nan=True)
        # a value exactly equal to an edge stays in the lower bucket
        eq_edge = df[df["v"] == edges[1]]
        assert got.loc[got["id"].isin(eq_edge["id"]), "q_bucket"].iloc[0] == 1


def test_grouped_robust_outliers_spike_detected_zscore_blind():
    """The MAD gate's reason to exist: one huge spike inflates the
    stddev enough that the z-score gate (threshold 2.5) misses a
    second, smaller anomaly — the median/MAD gate flags both.  Also:
    NULLs never flag; partitioning-invariant."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from standardized_omop_data_etl_ray.stages.aggregates import (
        grouped_outliers,
        grouped_robust_outliers,
    )

    base = list(np.linspace(9.0, 11.0, 40))     # tight cluster ~10
    vals = base + [1000.0, 25.0, None]          # huge spike + small one
    t = pa.table({
        "rid": pa.array(range(len(vals)), pa.int64()),
        "k": pa.array(["a"] * len(vals)),
        "v": pa.array(vals, pa.float64()),
    })

    robust_sets = []
    for parts in (1, 3):
        rob = grouped_robust_outliers(
            rd.from_arrow(t).repartition(parts), "k", "v", 3.5,
            ["rid", "k", "v"], num_buckets=2,
        ).to_pandas()
        robust_sets.append(frozenset(rob["rid"]))
    assert robust_sets[0] == robust_sets[1]
    assert {40, 41} <= robust_sets[0]           # both anomalies caught
    assert 42 not in robust_sets[0]             # NULL never flags
    assert len(robust_sets[0]) == 2

    z = grouped_outliers(
        rd.from_arrow(t), "k", "v", 2.5, ["rid", "k", "v"],
        num_buckets=2,
    ).to_pandas()
    zset = set(z["rid"])
    assert 40 in zset and 41 not in zset        # z-score blind to #41


def test_asof_join_directions_tolerance_and_unmatched():
    """merge_asof semantics distributed: backward/forward/nearest,
    tolerance cutoffs, unmatched-left NULLs, partitioning invariance,
    int right-payloads pinned to float64 (nullable)."""
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from standardized_omop_data_etl_ray.stages.joins import asof_join

    left = pa.table({
        "k": ["a", "a", "a", "b"],
        "t": pa.array([10, 20, 35, 5], pa.int64()),
        "lid": pa.array([0, 1, 2, 3], pa.int64()),
    })
    right = pa.table({
        "k": ["a", "a", "b"],
        "t": pa.array([8, 21, 50], pa.int64()),
        "rv": pa.array([100, 200, 300], pa.int64()),
    })
    ls = pa.schema([("k", pa.string()), ("t", pa.int64()),
                    ("lid", pa.int64())])
    rs = pa.schema([("k", pa.string()), ("t", pa.int64()),
                    ("rv", pa.int64())])

    def run(**kw):
        outs = []
        for parts in (1, 3):
            out = asof_join(
                rd.from_arrow(left).repartition(parts),
                rd.from_arrow(right).repartition(parts),
                ["k"], "t", left_schema=ls, right_schema=rs,
                num_buckets=2, **kw,
            ).to_pandas().sort_values("lid", ignore_index=True)
            outs.append(out)
        pd.testing.assert_frame_equal(outs[0], outs[1])
        return outs[0]

    def vals(df):
        return [None if pd.isna(v) else v for v in df["rv"]]

    back = run(direction="backward")
    assert vals(back) == [100.0, 100.0, 200.0, None]
    assert str(back["rv"].dtype) == "float64"   # nullable int → float64

    fwd = run(direction="forward")
    assert vals(fwd) == [200.0, 200.0, None, 300.0]

    near = run(direction="nearest")
    assert vals(near) == [100.0, 200.0, 200.0, 300.0]

    tol = run(direction="backward", tolerance=5)
    assert vals(tol) == [100.0, None, None, None]


def test_range_join_matches_brute_force_incl_boundaries():
    """Keyless grid range join vs O(n*m) brute force: end-exclusive
    boundaries, intervals spanning multiple cells, empty cells,
    one-sided buckets, partitioning invariance."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from standardized_omop_data_etl_ray.stages.joins import range_join

    rng = np.random.default_rng(11)
    pv = np.round(rng.uniform(0, 100, 200), 3)
    pts = pa.table({"pid": pa.array(np.arange(200), pa.int64()),
                    "v": pa.array(pv, pa.float64())})
    lo = np.round(rng.uniform(0, 95, 30), 3)
    ln = np.round(rng.uniform(0.5, 25, 30), 3)  # spans several cells
    iv = pa.table({"iid": pa.array(np.arange(30) + 1000, pa.int64()),
                   "lo": pa.array(lo, pa.float64()),
                   "hi": pa.array(lo + ln, pa.float64())})
    want = sorted(
        (int(p), 1000 + int(i))
        for p in range(200) for i in range(30)
        if lo[i] <= pv[p] < lo[i] + ln[i]
    )
    ps = pa.schema([("pid", pa.int64()), ("v", pa.float64())])
    isch = pa.schema([("iid", pa.int64()), ("lo", pa.float64()),
                      ("hi", pa.float64())])
    for parts in (1, 5):
        out = range_join(
            rd.from_arrow(pts).repartition(parts),
            rd.from_arrow(iv).repartition(parts),
            "v", "lo", "hi", cell_width=7.0, num_buckets=4,
            point_schema=ps, interval_schema=isch,
        ).to_pandas()
        got = sorted(zip(out["pid"], out["iid"]))
        assert got == want

    # exact boundary: v == lo matches, v == hi does not
    p2 = pa.table({"pid": pa.array([0, 1], pa.int64()),
                   "v": pa.array([10.0, 20.0], pa.float64())})
    i2 = pa.table({"iid": pa.array([7], pa.int64()),
                   "lo": pa.array([10.0], pa.float64()),
                   "hi": pa.array([20.0], pa.float64())})
    out = range_join(rd.from_arrow(p2), rd.from_arrow(i2), "v", "lo",
                     "hi", cell_width=5.0, num_buckets=2,
                     point_schema=pa.schema([("pid", pa.int64()),
                                             ("v", pa.float64())]),
                     interval_schema=pa.schema([
                         ("iid", pa.int64()), ("lo", pa.float64()),
                         ("hi", pa.float64())])).to_pandas()
    assert out["pid"].tolist() == [0]


def test_population_stability_detects_shift_and_smooths_empty_bins():
    """PSI ≈ 0 for identical distributions; large for a shifted one;
    a bin empty on one side stays finite (Laplace); NULL/out-of-range
    counted in the overflow bin; partitioning invariant."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from standardized_omop_data_etl_ray.stages.aggregates import (
        population_stability,
    )

    rng = np.random.default_rng(13)
    base = rng.uniform(10, 40, 4000)
    same = rng.uniform(10, 40, 4000)
    shifted = rng.uniform(60, 90, 4000)         # disjoint support

    def ds(vals, extra=()):
        v = list(map(float, vals)) + list(extra)
        return rd.from_arrow(pa.table({"v": pa.array(v, pa.float64())})
                             ).repartition(3)

    flat = population_stability(ds(base), ds(same), "v", 0.0, 100.0,
                                10).to_pandas()
    assert abs(flat["psi_bin"].sum()) < 0.01
    assert np.isfinite(flat["psi_bin"]).all()

    drift = population_stability(ds(base), ds(shifted), "v", 0.0,
                                 100.0, 10).to_pandas()
    assert drift["psi_bin"].sum() > 0.25        # "shifted" verdict
    assert np.isfinite(drift["psi_bin"]).all()  # empty bins smoothed

    # overflow bin: NULL + out-of-range rows land in bin -1
    ov = population_stability(
        ds(base, extra=[None, 500.0, -3.0]), ds(same), "v",
        0.0, 100.0, 10).to_pandas().set_index("bin")
    assert ov.loc[-1, "n_a"] == 3 and ov.loc[-1, "n_b"] == 0


def test_winsorize_exact_edges_and_nulls():
    """Clip at exact quantile_disc edges: interior values untouched,
    tails clipped to actual data values, NULL passes through."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from standardized_omop_data_etl_ray.stages.aggregates import (
        exact_quantiles,
        winsorize,
    )

    vals = list(np.arange(1.0, 101.0)) + [None]
    t = pa.table({"rid": pa.array(range(101), pa.int64()),
                  "v": pa.array(vals, pa.float64())})
    out = (
        winsorize(rd.from_arrow(t).repartition(4), "v", 0.05, 0.95,
                  ["rid"], out_col="w")
        .to_pandas().sort_values("rid", ignore_index=True)
    )
    edges = exact_quantiles(
        rd.from_arrow(t), "v", [0.05, 0.95]
    ).column("value").to_pylist()
    lo, hi = edges
    assert out.loc[0, "w"] == lo and out.loc[1, "w"] == lo
    assert out.loc[99, "w"] == hi
    assert out.loc[50, "w"] == 51.0      # interior untouched
    assert np.isnan(out.loc[100, "w"])   # NULL stays NULL
    assert set(out["w"].dropna()) <= set(np.clip(
        np.arange(1.0, 101.0), lo, hi))
