"""Data-quality constraint audit over Datasets (dbt-test / Deequ
shape): each check reduces a full table scan to ONE summary row
(constraint, checked, violations) — the ingest-gate report a lake
pipeline runs before publishing an epoch.

The reference enforces its constraints implicitly (drop-if-missing in
each standardize script, e.g. src/standardize_condition.py's concept
filter); this makes them explicit, composable and reportable.

Scale shapes (nothing materializes a table on the driver):
- not-null / accepted-range / accepted-values: per-block vectorized
  partial counts → a tiny groupby-sum over one row per block.
- unique: per-key counts through the bucketed combiner (≤1 row per
  distinct key per block crosses the exchange), then per-bucket
  (rows, keys) partials; violations = rows − distinct keys.
- foreign-key: parent key set ships once as a broadcast (dimension
  contract, same as joins.broadcast_join) and each child block counts
  its misses locally; NULL child keys pass (SQL FK semantics).  For a
  fact-sized parent use the partitioned anti-join instead
  (joins.partitioned_hash_join how='anti' composition) — documented
  trade, not silently assumed.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd
from ray.data.aggregate import Sum


def _finalize(partials: rd.Dataset) -> rd.Dataset:
    out = partials.groupby("constraint").aggregate(
        Sum("checked", alias_name="checked"),
        Sum("violations", alias_name="violations"),
    )

    def pin(t: pa.Table) -> pa.Table:
        return pa.table({
            "constraint": t.column("constraint").cast(pa.string()),
            "checked": t.column("checked").cast(pa.int64()),
            "violations": t.column("violations").cast(pa.int64()),
        })

    return out.map_batches(pin, batch_format="pyarrow")


def _row(name: str, checked: int, violations: int) -> pa.Table:
    return pa.table({
        "constraint": pa.array([name], pa.string()),
        "checked": pa.array([int(checked)], pa.int64()),
        "violations": pa.array([int(violations)], pa.int64()),
    })


def check_not_null(ds: rd.Dataset, table: str, cols: list[str]) -> rd.Dataset:
    def fn(t: pa.Table) -> pa.Table:
        rows = []
        for c in cols:
            col = t.column(c)
            rows.append((f"not_null:{table}.{c}", t.num_rows,
                         col.null_count))
        return pa.table({
            "constraint": pa.array([r[0] for r in rows], pa.string()),
            "checked": pa.array([r[1] for r in rows], pa.int64()),
            "violations": pa.array([r[2] for r in rows], pa.int64()),
        })

    return ds.map_batches(fn, batch_format="pyarrow")


def check_unique(
    ds: rd.Dataset, table: str, key_cols: list[str],
    num_buckets: int | None = None,
) -> rd.Dataset:
    """violations = rows − distinct keys (the count of EXTRA rows).
    NULL keys group like SQL ``count(*) − count(DISTINCT ...)`` over a
    dropna=False grouping.

    Key dtypes are normalized to pandas NULLABLE extension dtypes from
    the Arrow block (ADVICE r4): a plain ``to_pandas`` turns an int key
    column into float64 only in the blocks that contain a NULL, and the
    bucket hash is dtype-sensitive — the same key value would land in
    different buckets and violations undercount."""
    from .joins import bucketed_sum

    nullable = {
        pa.int8(): pd.Int8Dtype(), pa.int16(): pd.Int16Dtype(),
        pa.int32(): pd.Int32Dtype(), pa.int64(): pd.Int64Dtype(),
        pa.uint8(): pd.UInt8Dtype(), pa.uint16(): pd.UInt16Dtype(),
        pa.uint32(): pd.UInt32Dtype(), pa.uint64(): pd.UInt64Dtype(),
        pa.bool_(): pd.BooleanDtype(),
    }

    def partial(t: pa.Table) -> pa.Table:
        df = t.select(key_cols).to_pandas(types_mapper=nullable.get)
        c = df.groupby(key_cols, sort=False, dropna=False).size()
        out = c.reset_index(name="n")
        return pa.Table.from_pandas(out, preserve_index=False)

    counts = bucketed_sum(
        ds.map_batches(partial, batch_format="pyarrow"),
        key_cols, ["n"], num_buckets, combine=False,
    )
    name = f"unique:{table}.{'+'.join(key_cols)}"

    def fold(t: pa.Table) -> pa.Table:
        n = t.column("n")
        rows = int(pc.sum(n).as_py() or 0)
        return _row(name, rows, rows - t.num_rows)

    return counts.map_batches(fold, batch_format="pyarrow")


def check_accepted_range(
    ds: rd.Dataset, table: str, col: str, lo, hi,
) -> rd.Dataset:
    """NULLs pass (range constraints check values, not presence —
    compose with check_not_null when both are required)."""

    def fn(t: pa.Table) -> pa.Table:
        c = t.column(col)
        ok = pc.and_(pc.greater_equal(c, lo), pc.less_equal(c, hi))
        bad = pc.sum(pc.fill_null(pc.invert(ok), False)).as_py() or 0
        return _row(f"range:{table}.{col}", t.num_rows, bad)

    return ds.map_batches(fn, batch_format="pyarrow")


def check_accepted_values(
    ds: rd.Dataset, table: str, col: str, values: list,
) -> rd.Dataset:
    val_arr = pa.array(values)

    def fn(t: pa.Table) -> pa.Table:
        c = t.column(col)
        ok = pc.is_in(c, value_set=val_arr)
        # NULLs pass, like range
        bad = pc.sum(pc.fill_null(
            pc.and_(pc.invert(ok), pc.is_valid(c)), False)).as_py() or 0
        return _row(f"accepted_values:{table}.{col}", t.num_rows, bad)

    return ds.map_batches(fn, batch_format="pyarrow")


def _broadcast_parent_keys(parent: rd.Dataset, parent_col: str):
    """Collect the DISTINCT parent key set and ship it once
    (``ray.put``) — the dimension contract, same as
    joins.broadcast_join."""
    import ray

    def keys_only(t: pa.Table) -> pa.Table:
        u = pc.unique(pc.drop_null(t.column(parent_col)))
        return pa.table({"k": u})

    tables = []
    for r in parent.map_batches(
            keys_only, batch_format="pyarrow").to_arrow_refs():
        t = ray.get(r)
        if isinstance(t, pd.DataFrame):  # empty-block passthrough gotcha
            t = pa.Table.from_pandas(t, preserve_index=False)
        tables.append(t)
    pk = pa.concat_tables(tables, promote_options="permissive")
    return ray.put(pc.unique(pk.column("k")))


def check_foreign_key(
    child: rd.Dataset, child_table: str, child_col: str,
    parent: rd.Dataset, parent_table: str, parent_col: str,
) -> rd.Dataset:
    """Broadcast the DISTINCT parent key set once (``ray.put``), count
    child misses per block.  checked = non-null child rows."""
    from .joins import _cached_get

    ref = _broadcast_parent_keys(parent, parent_col)
    name = f"foreign_key:{child_table}.{child_col}->{parent_table}.{parent_col}"

    def fn(t: pa.Table) -> pa.Table:
        ks = _cached_get(ref)
        c = pc.drop_null(t.column(child_col))
        miss = pc.sum(pc.invert(pc.is_in(c, value_set=ks))).as_py() or 0
        return _row(name, len(c), miss)

    return child.map_batches(fn, batch_format="pyarrow")


def check_table(
    ds: rd.Dataset,
    table: str,
    not_null: list[str] = (),
    ranges: list[tuple] = (),
    accepted: list[tuple] = (),
    foreign_keys: list[tuple] = (),
) -> rd.Dataset:
    """All of a table's MAP-ONLY checks from ONE scan (VERDICT r4 #5
    composition fix: six separate ``check_*`` datasets each re-execute
    their own read — at 100 TB that is 6× read amplification on the
    gate).  Emits every check's partial rows from a single
    ``map_batches``; compose with :func:`check_unique` (which needs its
    own keyed exchange) and :func:`audit_constraints`.

    ``ranges``: ``(col, lo, hi)``; ``accepted``: ``(col, values)``;
    ``foreign_keys``: ``(child_col, parent_ds, parent_table,
    parent_col)`` — each parent key set broadcast once."""
    from .joins import _cached_get

    fk_specs = [
        (child_col,
         f"foreign_key:{table}.{child_col}->{ptable}.{pcol}",
         _broadcast_parent_keys(parent, pcol))
        for child_col, parent, ptable, pcol in foreign_keys
    ]
    accepted = [(col, pa.array(vals)) for col, vals in accepted]

    def fn(t: pa.Table) -> pa.Table:
        names: list[str] = []
        checked: list[int] = []
        viol: list[int] = []
        for c in not_null:
            names.append(f"not_null:{table}.{c}")
            checked.append(t.num_rows)
            viol.append(t.column(c).null_count)
        for c, lo, hi in ranges:
            col = t.column(c)
            ok = pc.and_(pc.greater_equal(col, lo), pc.less_equal(col, hi))
            names.append(f"range:{table}.{c}")
            checked.append(t.num_rows)
            viol.append(pc.sum(pc.fill_null(pc.invert(ok), False)).as_py()
                        or 0)
        for c, val_arr in accepted:
            col = t.column(c)
            ok = pc.is_in(col, value_set=val_arr)
            names.append(f"accepted_values:{table}.{c}")
            checked.append(t.num_rows)
            viol.append(pc.sum(pc.fill_null(
                pc.and_(pc.invert(ok), pc.is_valid(col)), False)).as_py()
                or 0)
        for c, name, ref in fk_specs:
            ks = _cached_get(ref)
            child = pc.drop_null(t.column(c))
            names.append(name)
            checked.append(len(child))
            viol.append(pc.sum(pc.invert(
                pc.is_in(child, value_set=ks))).as_py() or 0)
        return pa.table({
            "constraint": pa.array(names, pa.string()),
            "checked": pa.array(checked, pa.int64()),
            "violations": pa.array(viol, pa.int64()),
        })

    return ds.map_batches(fn, batch_format="pyarrow")


def audit_constraints(checks: list[rd.Dataset]) -> rd.Dataset:
    """Union the per-check PARTIAL streams (each check emits partial
    rows per block/bucket, not finals) and fold to one row per
    constraint."""
    out = checks[0]
    for c in checks[1:]:
        out = out.union(c)
    return _finalize(out)
