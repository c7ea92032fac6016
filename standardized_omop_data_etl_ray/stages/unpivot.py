"""Wide→long unpivot with conditional fan-out (M7 — the reference's core
standardize transform).

The reference turns one wide survey row into K records with per-item
concept ids, skipping nulls and gating on magic values, via iterrows()
(alsfrs_r--observation.py:52-269 — 13 items;
aalsdxfx--observation.py:263-543 — 24 indicators;
als_gene_mutations--measurement.py:38-171 — 11 gene tests gated on
value ∈ {1,2}; vital_signs--measurement.py:105-453 — 8 vitals; …).

Ours is a declarative item spec + one vectorized ``map_batches`` pass
that emits a longer Arrow table than its input: per item, a filtered
projection with constant concept columns; the per-item outputs concat.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd


@dataclass
class UnpivotItem:
    source_col: str
    concept_id: int
    concept_name: str | None = None
    # only emit when the value is one of these (e.g. gene tests: {1, 2})
    gate_values: tuple | None = None
    # constant extra columns for this item, e.g. {"unit_concept_id": 8582}
    constants: dict = field(default_factory=dict)
    # how many rows one match fans out to (aalsdxfx alsdx1 is tripled,
    # aalshxfx bilateral site-of-onset doubles)
    repeat: int = 1


def make_unpivoter(
    items: list[UnpivotItem],
    id_cols: list[str],
    value_col: str = "value_as_number",
    concept_col: str = "concept_id",
    name_col: str | None = "concept_name",
    source_col_name: str | None = "source_variable",
    drop_nulls: bool = True,
    value_type: pa.DataType | None = None,
):
    """Return a batch fn: wide pa.Table → long pa.Table (1 row → ≤K rows).

    ``value_type`` pins the value column's type across EVERY emitted
    block (items are cast to it, and the empty-batch fallback uses it)
    — pass it when item source columns have mixed types, else blocks
    from batches where different items matched could carry different
    schemas."""
    if not items:
        raise ValueError("make_unpivoter requires at least one item")

    def unpivot(batch: pa.Table) -> pa.Table:
        outs = []
        for it in items:
            if it.source_col not in batch.column_names:
                continue
            val = batch.column(it.source_col)
            mask = pc.is_valid(val) if drop_nulls else pa.array(
                [True] * batch.num_rows
            )
            if it.gate_values is not None:
                mask = pc.and_(mask, pc.is_in(val, value_set=pa.array(it.gate_values)))
            sub = batch.filter(mask)
            if sub.num_rows == 0:
                continue
            cols = {c: sub.column(c) for c in id_cols}
            v = sub.column(it.source_col)
            cols[value_col] = pc.cast(v, value_type) if value_type else v
            n = sub.num_rows
            cols[concept_col] = pa.array([it.concept_id] * n, pa.int64())
            if name_col:
                cols[name_col] = pa.array([it.concept_name] * n, pa.string())
            if source_col_name:
                cols[source_col_name] = pa.array([it.source_col] * n, pa.string())
            for k, v in it.constants.items():
                cols[k] = pa.array([v] * n)
            t = pa.table(cols)
            for _ in range(it.repeat):
                outs.append(t)
        if not outs:
            # empty long table with a STABLE schema: explicit value_type
            # wins, else the first item column present in this batch,
            # else float64 (never a type no matched batch would emit)
            probe = items[0]
            cols = {c: batch.column(c).slice(0, 0) for c in id_cols}
            vt = value_type
            if vt is None:
                for it in items:
                    if it.source_col in batch.column_names:
                        vt = batch.schema.field(it.source_col).type
                        break
                else:
                    vt = pa.float64()
            cols[value_col] = pa.array([], vt)
            cols[concept_col] = pa.array([], pa.int64())
            if name_col:
                cols[name_col] = pa.array([], pa.string())
            if source_col_name:
                cols[source_col_name] = pa.array([], pa.string())
            for k, v in probe.constants.items():
                cols[k] = pa.array([], pa.array([v]).type)
            return pa.table(cols)
        return pa.concat_tables(outs, promote_options="permissive")

    return unpivot


def pivot_agg(
    ds,
    key_cols: list[str],
    name_col: str,
    value_col: str,
    names: list,
    num_buckets: int | None = None,
    agg: str = "sum",
):
    """Long→wide PIVOT with aggregation — the inverse of
    ``make_unpivoter`` (M7): one output row per key, one column per
    pivot name, cells = ``agg`` of ``value_col`` over rows whose
    ``name_col`` equals the name.  ``names`` must be the explicit
    output vocabulary (discovering it would need a pre-pass; SQL's
    PIVOT has the same constraint).  A key with no rows for a name
    gets NULL — matching SQL conditional aggregation
    (``SUM(CASE WHEN name=... THEN value END)``).

    Scale shape: one vectorized map pass turns each block into per-name
    conditional columns, then a single cardinality-safe bucketed reduce
    over the keys (``bucketed_agg`` — per-batch combiner, one pandas
    pass per bucket, never a Python call per key)."""
    from .joins import bucketed_agg

    def widen(t: pa.Table) -> pa.Table:
        cols = {k: t.column(k) for k in key_cols}
        nc, v = t.column(name_col), t.column(value_col)
        null = pa.scalar(None, v.type)
        for nm in names:
            cols[str(nm)] = pc.if_else(pc.equal(nc, nm), v, null)
        return pa.table(cols)

    return bucketed_agg(
        ds.map_batches(widen, batch_format="pyarrow"),
        key_cols,
        {str(nm): (str(nm), agg) for nm in names},
        num_buckets,
    )


def unnest_list(
    ds: rd.Dataset,
    list_col: str,
    carry_cols: list[str],
    idx_col: str = "idx",
    value_col: str = "val",
) -> rd.Dataset:
    """SQL UNNEST ... WITH ORDINALITY over a ``list<T>`` column: one
    output row per list element, carrying ``carry_cols`` and the
    element's 1-based position.  Fully zero-copy Arrow: the flattened
    values come straight from the list child array, carries replicate
    via ``pa.ListArray`` offset arithmetic (take on parent indices) —
    no Python per row, no pandas object boxing of the lists.  Null and
    empty lists emit no rows (SQL UNNEST semantics)."""
    import pyarrow.compute as pc

    def explode(t: pa.Table) -> pa.Table:
        col = t.column(list_col)
        vt = (col.type.value_type if hasattr(col.type, "value_type")
              else col.type)
        if t.num_rows == 0:
            return pa.table(
                {**{c: t.column(c) for c in carry_cols},
                 idx_col: pa.array([], pa.int64()),
                 value_col: pa.array([], vt)})
        if col.num_chunks != 1:
            col = col.combine_chunks()
        arr = col.chunk(0) if isinstance(col, pa.ChunkedArray) else col
        # normalize large_list and null slots (null list → empty list,
        # so the offset math emits no rows for it)
        arr = arr.cast(pa.list_(arr.type.value_type))
        if arr.null_count:
            lens = pc.fill_null(pc.list_value_length(arr), 0)
            arr = pa.ListArray.from_arrays(
                pa.array(np.concatenate(
                    [[0], np.cumsum(lens.to_numpy(
                        zero_copy_only=False))]).astype(np.int32)),
                arr.flatten(),
            )
        offsets = arr.offsets.to_numpy(zero_copy_only=False)
        lens = np.diff(offsets)
        parent = np.repeat(np.arange(len(arr)), lens)
        ordinal = np.arange(len(parent)) - np.repeat(
            offsets[:-1], lens) + 1
        out = {c: t.column(c).take(pa.array(parent))
               for c in carry_cols}
        out[idx_col] = pa.array(ordinal, pa.int64())
        out[value_col] = arr.flatten()
        return pa.table(out)

    return ds.select_columns(carry_cols + [list_col]).map_batches(
        explode, batch_format="pyarrow")
