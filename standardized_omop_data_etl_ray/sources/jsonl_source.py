"""JSONL source with post-read type coercion (S-family widening).

Change-event feeds commonly arrive as newline-delimited JSON (one
event object per line) rather than CSV.  ``ray.data.read_json`` infers
types per block, which can disagree across files (an all-null column
in one shard, ints-that-look-like-floats in another); this wraps it
with the same explicit dtype-override semantics as
``sources/csv_source.read_csv_typed`` so the declared columns carry
ONE Arrow type from the first batch on, regardless of shard-local
inference.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd


def read_jsonl_typed(
    paths: str | list[str],
    int_cols: list[str] | None = None,
    str_cols: list[str] | None = None,
    float_cols: list[str] | None = None,
    **kwargs,
) -> rd.Dataset:
    """``ray.data.read_json`` + per-column cast to the declared types.

    The coercion runs block-local in ``map_batches`` (no shuffle, no
    schema probe); columns missing from a shard are added as typed
    nulls so union-by-name downstream sees one schema."""
    types: dict[str, pa.DataType] = {}
    for c in int_cols or []:
        types[c] = pa.int64()
    for c in str_cols or []:
        types[c] = pa.string()
    for c in float_cols or []:
        types[c] = pa.float64()

    ds = rd.read_json(paths, **kwargs)
    if not types:
        return ds

    def coerce(t: pa.Table) -> pa.Table:
        for c, want in types.items():
            if c not in t.column_names:
                t = t.append_column(c, pa.nulls(t.num_rows, want))
                continue
            col = t.column(c)
            if col.type != want:
                # string targets accept anything via cast-to-string;
                # numeric targets go through float first so "3.0"-style
                # JSON numbers land as int64 without raising
                if pa.types.is_integer(want) and pa.types.is_floating(
                    col.type
                ):
                    col = pc.round(col)
                t = t.set_column(
                    t.schema.get_field_index(c), c, pc.cast(col, want)
                )
        return t

    return ds.map_batches(coerce, batch_format="pyarrow")
