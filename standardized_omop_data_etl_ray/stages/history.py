"""SCD Type 2 history tables from a CDC event log.

The reference materializes only the LATEST state of each entity (its
table scripts overwrite rows in place — e.g.
``src/pipeline_process_subtables_to_final.py`` keeps one row per merged
key); a CDC engine can additionally keep every VERSION of a key as a
validity interval — the warehouse "slowly changing dimension type 2"
shape.  Each non-delete event opens a version valid from its own LSN;
the NEXT event on the same key (update, delete or re-insert) closes it.
Deletes close the prior version and emit no row of their own, so a
delete-then-reinsert key shows a hole between two versions.

Scale shape: ONE bucketed exchange co-locating each key (the same coarse
hash exchange every per-key operator here uses — ``bucketed_groupby``),
then one vectorized ``groupby().shift(-1)`` per bucket computes every
close LSN; no per-key Python, no global sort.  SQL-mirrorable as
``lead(lsn) OVER (PARTITION BY key ORDER BY lsn)``.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa

import ray.data as rd


def scd2_history(
    events: rd.Dataset,
    key_cols: list[str],
    lsn_col: str = "lsn",
    op_col: str = "op",
    num_buckets: int | None = None,
) -> rd.Dataset:
    """Expand a CDC event log into an SCD2 version-history table.

    Input: one row per change event; ``(key_cols, lsn_col)`` must be
    unique (the same total-order contract every LWW path here relies
    on).  Output: every I/U event's full payload plus

      - ``valid_from``  — the event's own LSN (int64)
      - ``valid_to``    — the next event's LSN on this key, NULL for
        the open (current) version (nullable int64)
      - ``is_current``  — ``valid_to IS NULL`` (deletes, which would
        otherwise be "current", are dropped AFTER closing their
        predecessor, so a deleted key has no current row)

    Equivalent SQL::

        SELECT *, lsn AS valid_from,
               lead(lsn) OVER (PARTITION BY key ORDER BY lsn) AS valid_to
        FROM events QUALIFY op <> 'D'
    """
    from .joins import bucketed_groupby

    keys = list(key_cols)

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(keys + [lsn_col])
        # nullable Int64: shift(-1) on a plain int64 column would coerce
        # the whole column to float64 at the first open version, and the
        # Arrow block dtype must be stable across buckets
        g["valid_to"] = (
            g.groupby(keys, sort=False)[lsn_col].shift(-1).astype("Int64")
        )
        g = g[g[op_col] != "D"]
        g = g.rename(columns={lsn_col: "valid_from"})
        g["is_current"] = g["valid_to"].isna()
        return g

    return bucketed_groupby(events, keys, per_bucket, num_buckets)


def _canon_history(df: pd.DataFrame, keys: list[str],
                   payload_cols: list[str],
                   schema: pa.Schema) -> pa.Table:
    """Pin the history frame to its Arrow schema: parquet round-trips
    surface nullable int64 as float64 in pandas, a refreshed block must
    not disagree with a built one, and pandas Int64 extension blocks
    break Ray's pandas→Arrow schema derivation (Dataset.schema logs
    'Cannot interpret Int64Dtype' and the persisted view manifest comes
    out wrong) — so every fold fn emits an explicit Arrow table."""
    out = df[keys + payload_cols + ["valid_from", "valid_to", "is_current"]]
    out = out.copy()
    out["valid_from"] = out["valid_from"].astype("int64")
    out["valid_to"] = out["valid_to"].astype("Int64")
    out["is_current"] = out["is_current"].astype(bool)
    return pa.Table.from_pandas(out, schema=schema, preserve_index=False)


def fold_history_frame(
    old: pd.DataFrame,
    cs: pd.DataFrame,
    key_cols: list[str],
    payload_cols: list[str],
    schema: pa.Schema,
    lsn_col: str = "lsn",
) -> pa.Table:
    """The per-bucket SCD2 fold kernel (keys already co-located): close
    each touched key's open version at its FIRST change LSN, then append
    the chained new version rows.  Pure pandas/Arrow — both the durable
    view's bucket tasks and ad-hoc callers use it."""
    keys = list(key_cols)
    nl = "new_" + lsn_col
    cs = cs.sort_values(keys + [nl])
    if len(old):
        first = cs.groupby(keys, sort=False)[nl].min().rename("__close")
        m = old.merge(first.reset_index(), on=keys, how="left")
        hit = (m["__close"].notna() & m["is_current"]).to_numpy()
        if hit.any():
            m.loc[hit, "valid_to"] = m.loc[hit, "__close"]
            m.loc[hit, "is_current"] = False
        old = m.drop(columns="__close")
    cs = cs.copy()
    cs["valid_to"] = cs.groupby(keys, sort=False)[nl].shift(-1)
    cs = cs[cs["change"] != "deleted"]
    new = cs[keys].copy()
    for c in payload_cols:
        new[c] = cs["new_" + c]
    new["valid_from"] = cs[nl]
    new["valid_to"] = cs["valid_to"]
    new["is_current"] = new["valid_to"].isna()
    out = pd.concat(
        [old[[*keys, *payload_cols, "valid_from", "valid_to",
              "is_current"]], new],
        ignore_index=True,
    ) if len(old) else new
    return _canon_history(out, keys, payload_cols, schema)


def scd2_asof(history: rd.Dataset, at_lsn: int) -> rd.Dataset:
    """Reconstruct the state AS OF ``at_lsn`` from an SCD2 table: the
    version whose interval covers the LSN — ``valid_from <= at_lsn <
    valid_to`` (open versions: null valid_to = +∞).  ONE map-only
    filter over the history; no shuffle, no lake read — the query
    shape that justifies keeping history at all.  NB: null-safe via
    fill_null (pc.and_ is non-Kleene; a null mask would DROP the open
    versions this exists to keep)."""
    import pyarrow.compute as pc

    def fn(t: pa.Table) -> pa.Table:
        opened = pc.less_equal(t.column("valid_from"), at_lsn)
        not_closed = pc.fill_null(
            pc.greater(t.column("valid_to"), at_lsn), True
        )
        return t.filter(pc.and_(opened, not_closed))

    return history.map_batches(fn, batch_format="pyarrow")


def history_view_schema(
    lake_schema: pa.Schema, key_cols: list[str], payload_cols: list[str],
    lsn_col: str = "lsn",
) -> pa.Schema:
    lsn_t = lake_schema.field(lsn_col).type
    return pa.schema(
        [lake_schema.field(k) for k in key_cols]
        + [lake_schema.field(c) for c in payload_cols]
        + [pa.field("valid_from", lsn_t), pa.field("valid_to", lsn_t),
           pa.field("is_current", pa.bool_())]
    )
