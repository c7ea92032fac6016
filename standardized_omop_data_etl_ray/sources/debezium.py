"""Debezium-envelope change-event source (the de-facto CDC wire format).

Connectors emit one JSON object per change with a before/after envelope:

    {"op": "c|r|u|d", "source": {"lsn": 123, ...},
     "before": {...row...} | null, "after": {...row...} | null}

This flattens the envelope into the engine's canonical event shape —
``op`` ∈ {I, U, D} (Debezium's snapshot-read ``r`` is an insert), ``lsn``
from the source block, key columns from ``after`` (or ``before`` for
deletes — a delete's after is null), payload columns from ``after``
(null on delete, which is exactly the tombstone shape
``stages/standardize`` expects).  All vectorized ``pc.struct_field``
extraction inside ``map_batches`` — the envelope never reaches Python
row space.

Unknown ``op`` codes raise by default; with ``lake.dead_letter`` the
canonical splitter diverts them after flattening (they flatten to an
op the splitter rejects), so the two layers compose.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd

def flatten_debezium(
    key_cols: list[str],
    payload_cols: list[str],
    lsn_field: str = "lsn",
    column_types: dict[str, pa.DataType] | None = None,
):
    """Batch fn: envelope rows → canonical flat events.

    JSON readers infer types PER BLOCK: a block holding only deletes
    types ``after`` as null, and a block whose rows never carried a
    field omits it from the struct — both degrade to typed nulls here
    (``column_types`` overrides the default string) instead of
    failing, so block boundaries can't change semantics."""
    types = dict(column_types or {})

    def field(col, name: str) -> pa.Array:
        typ = types.get(name, pa.string())
        if pa.types.is_null(col.type) or (
            pa.types.is_struct(col.type)
            and col.type.get_field_index(name) < 0
        ):
            return pa.nulls(len(col), typ)
        return pc.cast(pc.struct_field(col, name), typ)

    # one mapping, one place: snapshot reads are inserts
    op_map = {"c": "I", "r": "I", "u": "U", "d": "D"}

    def envelope(t: pa.Table, name: str) -> pa.Array:
        # a block whose rows all omit the field has no column at all —
        # degrade to nulls (before is legitimately absent on inserts)
        if name in t.column_names:
            return t.column(name)
        return pa.nulls(t.num_rows)

    def fn(t: pa.Table) -> pa.Table:
        op_raw = t.column("op")  # structural: every envelope has op
        op = pc.case_when(
            pc.make_struct(*[pc.equal(op_raw, k) for k in op_map]),
            *op_map.values(),
        )
        is_del = pc.equal(op, "D")
        before, after = envelope(t, "before"), envelope(t, "after")
        source = envelope(t, "source")
        if pa.types.is_null(source.type) or (
            pa.types.is_struct(source.type)
            and source.type.get_field_index(lsn_field) < 0
        ):
            lsn = pa.nulls(t.num_rows, pa.int64())  # → DLQ-divertible
        else:
            lsn = pc.cast(pc.struct_field(source, lsn_field), pa.int64())
        cols: dict[str, pa.Array] = {"op": op, "lsn": lsn}
        for k in key_cols:
            cols[k] = pc.if_else(is_del, field(before, k), field(after, k))
        for p in payload_cols:
            # delete payload stays null — the engine's tombstone shape
            cols[p] = field(after, p)
        return pa.table(cols)

    return fn


def read_debezium(
    paths: str | list[str],
    key_cols: list[str],
    payload_cols: list[str],
    lsn_field: str = "lsn",
    column_types: dict[str, pa.DataType] | None = None,
    **kwargs,
) -> rd.Dataset:
    """``read_json`` over Debezium envelope JSONL → canonical events."""
    return rd.read_json(paths, **kwargs).map_batches(
        flatten_debezium(key_cols, payload_cols, lsn_field, column_types),
        batch_format="pyarrow",
    )
