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
