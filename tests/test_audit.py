"""Constraint audit (stages/audit.py): planted violations of every
check type, hand-counted expectations, NULL semantics (NULLs pass
range/values/FK, fail not_null), repartition invariance."""

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from standardized_omop_data_etl_ray.stages.audit import (
    audit_constraints,
    check_accepted_range,
    check_accepted_values,
    check_foreign_key,
    check_not_null,
    check_table,
    check_unique,
)


def _report(checks):
    return (
        audit_constraints(checks).to_pandas()
        .sort_values("constraint", ignore_index=True)
        .set_index("constraint")
    )


def test_planted_violations():
    child = pa.table({
        "id": pa.array([1, 1, 2, 3, 4, 5, 5, 5], pa.int64()),   # dups: 1×2, 5×3
        "fk": pa.array([10, 10, 11, 99, None, 12, 98, 10], pa.int64()),
        "v": pa.array([0.0, 0.5, 1.0, 1.5, None, -0.1, 0.2, 0.3]),
        "cat": pa.array(["a", "b", "zz", None, "a", "b", "a", "yy"]),
    })
    parent = pa.table({"pk": pa.array([10, 11, 12], pa.int64())})
    ds = rd.from_arrow(child).repartition(3)
    pds = rd.from_arrow(parent).repartition(2)

    rep = _report([
        check_unique(ds, "t", ["id"], num_buckets=2),
        check_not_null(ds, "t", ["fk", "v"]),
        check_foreign_key(ds, "t", "fk", pds, "p", "pk"),
        check_accepted_range(ds, "t", "v", 0.0, 1.0),
        check_accepted_values(ds, "t", "cat", ["a", "b"]),
    ])
    assert rep.loc["unique:t.id"].tolist() == [8, 3]          # 8 rows, 5 keys
    assert rep.loc["not_null:t.fk"].tolist() == [8, 1]
    assert rep.loc["not_null:t.v"].tolist() == [8, 1]
    # non-null fks: 7 checked; misses: 99, 98
    assert rep.loc["foreign_key:t.fk->p.pk"].tolist() == [7, 2]
    # out of [0,1]: 1.5, -0.1 (NULL passes)
    assert rep.loc["range:t.v"].tolist() == [8, 2]
    # not in {a,b}: zz, yy (NULL passes)
    assert rep.loc["accepted_values:t.cat"].tolist() == [8, 2]


def test_clean_table_and_invariance():
    rng = np.random.default_rng(3)
    n = 500
    df = pd.DataFrame({
        "id": np.arange(n),
        "fk": rng.integers(0, 50, n),
        "v": rng.uniform(0, 1, n),
    })
    parent = pd.DataFrame({"pk": np.arange(50)})
    for parts in (1, 7):
        ds = rd.from_pandas(df).repartition(parts)
        rep = _report([
            check_unique(ds, "t", ["id"], num_buckets=3),
            check_not_null(ds, "t", ["fk"]),
            check_foreign_key(ds, "t", "fk",
                              rd.from_pandas(parent), "p", "pk"),
            check_accepted_range(ds, "t", "v", 0.0, 1.0),
        ])
        assert (rep["violations"] == 0).all()
        assert (rep["checked"] == n).all()


def test_check_table_fused_matches_separate_checks():
    """check_table emits the same report rows as the separate per-check
    datasets, from ONE scan of the table (VERDICT r4 composition fix)."""
    child = pa.table({
        "id": pa.array([1, 1, 2, 3, 4, 5, 5, 5], pa.int64()),
        "fk": pa.array([10, 10, 11, 99, None, 12, 12, 98], pa.int64()),
        "v": pa.array([0.1, 1.5, 0.5, None, 0.9, -0.1, 0.0, 1.0]),
        "cat": ["a", "b", "zz", "a", None, "b", "yy", "a"],
    })
    parent = pa.table({"pk": pa.array([10, 11, 12], pa.int64())})
    ds = rd.from_arrow(child).repartition(3)
    pds = rd.from_arrow(parent).repartition(2)

    sep = _report([
        check_not_null(ds, "t", ["fk", "v"]),
        check_foreign_key(ds, "t", "fk", pds, "p", "pk"),
        check_accepted_range(ds, "t", "v", 0.0, 1.0),
        check_accepted_values(ds, "t", "cat", ["a", "b"]),
    ])
    fused = _report([
        check_table(
            ds, "t",
            not_null=["fk", "v"],
            ranges=[("v", 0.0, 1.0)],
            accepted=[("cat", ["a", "b"])],
            foreign_keys=[("fk", pds, "p", "pk")],
        ),
    ])
    pd.testing.assert_frame_equal(sep, fused)


def test_check_unique_nullable_int_key_across_blocks():
    """ADVICE r4: an int key column that has a NULL in one block and not
    another must still count distinct keys globally — the partial step
    normalizes to nullable dtypes so the bucket hash is block-invariant."""
    # block 1 has the NULL (plain to_pandas would make it float64);
    # block 2 has none (int64) — key 7 appears in both blocks
    b1 = pa.table({"k": pa.array([7, None, 3], pa.int64())})
    b2 = pa.table({"k": pa.array([7, 4, 7], pa.int64())})
    ds = rd.from_arrow([b1, b2])
    rep = _report([check_unique(ds, "t", ["k"], num_buckets=4)])
    # 6 rows, distinct keys {7, NULL, 3, 4} = 4 → 2 extra rows
    assert rep.loc["unique:t.k"].tolist() == [6, 2]
