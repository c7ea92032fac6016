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
