"""Generic incremental materialized aggregate views (differential
dataflow's arrange/reduce shape, scoped to distributive aggregates).

A view is ``GROUP BY g1..gk`` with COUNT(*)/SUM/AVG/MIN/MAX columns,
materialized as a group-cardinality Dataset and MAINTAINED per CDC epoch
from the epoch's change set (``pipelines/cdc.epoch_change_set`` /
``stages/merge.snapshot_diff`` rows: ``change`` ∈ {added, deleted,
updated} with ``old_``/``new_`` payload columns) — the corpus is never
re-aggregated.

Maintenance cost model (the point of the operator):
- COUNT/SUM/AVG are *differential*: a retraction is a signed −1 row, so
  the per-epoch fold moves O(|change set|) partial rows plus the
  group-cardinality view itself through one bucketed reduce.  Integer
  sums are exact under retraction; float sums can drift by float
  associativity (same caveat as any differential engine).
- MIN/MAX are not invertible, so touched groups are *rescanned* from
  the live state (projection pushed down to group + source columns, a
  broadcast semi-join keeps only touched groups' rows).  Per-epoch cost
  is O(rows in touched groups), not O(state).  Groups the epoch never
  touched keep their stored extrema.

The same partial/fold path builds the view from scratch (an all-'added'
change set over an empty view), so build and maintain cannot diverge.

Reference parity: generalizes the reference's recompute-the-report-
per-run aggregates (standardized-omop-data-etl a6/a7 scripts) to
incrementally-maintained views; the per-view hidden columns follow the
classic (sum, count) decomposition for AVG.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd

from .joins import auto_hash_join, broadcast_join, bucketed_agg


@dataclass(frozen=True)
class IncAggSpec:
    """View definition: ``count`` names a COUNT(*) output column;
    ``sums``/``means``/``mins``/``maxs`` map output column → source
    column.  Source columns must appear in change sets as
    ``old_<src>``/``new_<src>`` carry columns."""

    group_cols: list[str]
    count: str | None = None
    sums: dict[str, str] = field(default_factory=dict)
    means: dict[str, str] = field(default_factory=dict)
    mins: dict[str, str] = field(default_factory=dict)
    maxs: dict[str, str] = field(default_factory=dict)

    # -- internal (materialized) column layout -------------------------
    def diff_cols(self) -> list[str]:
        cols = ["__n"]
        for o in self.sums:
            cols += [f"__s_{o}", f"__nn_{o}"]
        for o in self.means:
            cols += [f"__s_{o}", f"__nn_{o}"]
        return cols

    def mm_cols(self) -> list[str]:
        return [f"__mn_{o}" for o in self.mins] + [
            f"__mx_{o}" for o in self.maxs
        ]

    def src_cols(self) -> list[str]:
        seen: dict[str, None] = {}
        for m in (self.sums, self.means, self.mins, self.maxs):
            for src in m.values():
                seen[src] = None
        return list(seen)


def _sum_type(src_type: pa.DataType) -> pa.DataType:
    """Signed accumulator type: int64 for integer sources (exact under
    retraction), float64 otherwise."""
    return pa.int64() if pa.types.is_integer(src_type) else pa.float64()


def _partial_schema(
    spec: IncAggSpec, types: dict[str, pa.DataType]
) -> pa.Schema:
    fields = [pa.field(g, types[g]) for g in spec.group_cols]
    fields.append(pa.field("__n", pa.int64()))
    for o, src in {**spec.sums, **spec.means}.items():
        fields += [pa.field(f"__s_{o}", _sum_type(types[src])),
                   pa.field(f"__nn_{o}", pa.int64())]
    return pa.schema(fields)


def _mm_schema(spec: IncAggSpec, types: dict[str, pa.DataType]) -> pa.Schema:
    return pa.schema(
        [pa.field(g, types[g]) for g in spec.group_cols]
        + [pa.field(f"__mn_{o}", types[src]) for o, src in spec.mins.items()]
        + [pa.field(f"__mx_{o}", types[src]) for o, src in spec.maxs.items()]
    )


def _cast_to(schema: pa.Schema):
    """Pin a pandas-block stage's output to one Arrow schema — blocks
    from different tasks must never disagree in dtype (all-null pandas
    groups degrade to float64/object otherwise)."""

    def fn(df: pd.DataFrame) -> pa.Table:
        return pa.Table.from_pandas(
            df[schema.names], preserve_index=False
        ).cast(schema)

    return fn


def _signed_partial(spec: IncAggSpec, schema: pa.Schema):
    """Per-batch combiner: rows carrying group cols + source cols +
    ``__sign`` → one partial row per group in the batch (differential
    columns only, Arrow-schema-pinned).  Vectorized pandas; what
    crosses the exchange is group-cardinality-per-batch."""
    gcols = list(spec.group_cols)
    sm = {**spec.sums, **spec.means}

    def fn(df: pd.DataFrame) -> pa.Table:
        sign = df["__sign"].to_numpy(dtype="int64")
        out = pd.DataFrame({c: df[c] for c in gcols})
        out["__n"] = sign
        for o, src in sm.items():
            v = pd.to_numeric(df[src], errors="coerce")
            nn = v.notna().to_numpy()
            if pa.types.is_integer(schema.field(f"__s_{o}").type):
                vals = v.fillna(0).astype("int64").to_numpy(dtype="int64")
            else:
                vals = v.astype("float64").fillna(0.0).to_numpy()
            out[f"__s_{o}"] = vals * sign
            out[f"__nn_{o}"] = np.where(nn, sign, 0)
        g = out.groupby(gcols, dropna=False, sort=False, as_index=False)
        return _cast_to(schema)(g.sum(numeric_only=False))

    return fn


def _change_set_to_signed(spec: IncAggSpec):
    """Explode change-set rows into signed view-input rows: the old
    payload retracts (deleted/updated, sign −1), the new payload
    asserts (added/updated, sign +1).  Group-column changes are
    handled for free: the row leaves its old group and enters its new
    one."""
    cols = list(spec.group_cols) + spec.src_cols()

    def pick(df: pd.DataFrame, side: str, c: str) -> pd.Series:
        # change-set KEY columns arrive unprefixed (epoch_change_set /
        # snapshot_diff emit keys once — old and new key are the same
        # row identity); carry columns arrive as old_/new_ pairs
        name = f"{side}_{c}"
        return df[name] if name in df.columns else df[c]

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        ch = df["change"]
        olds = df[ch.isin(("deleted", "updated")).to_numpy()]
        news = df[ch.isin(("added", "updated")).to_numpy()]
        frames = []
        if len(olds):
            f = pd.DataFrame({c: pick(olds, "old", c) for c in cols})
            f["__sign"] = -1
            frames.append(f)
        if len(news):
            f = pd.DataFrame({c: pick(news, "new", c) for c in cols})
            f["__sign"] = 1
            frames.append(f)
        if not frames:
            return pd.DataFrame(
                {c: pd.Series(dtype=object) for c in cols + ["__sign"]}
            )
        return pd.concat(frames, ignore_index=True)

    return fn


def _minmax_scan(
    rows: rd.Dataset, spec: IncAggSpec, schema: pa.Schema,
    num_buckets: int | None = None,
) -> rd.Dataset:
    """Exact per-group extrema over ``rows`` (full build, or the
    touched-group rescan), Arrow-schema-pinned."""
    aggs = {f"__mn_{o}": (src, "min") for o, src in spec.mins.items()}
    aggs.update({f"__mx_{o}": (src, "max") for o, src in spec.maxs.items()})
    return bucketed_agg(rows, list(spec.group_cols), aggs,
                        num_buckets=num_buckets).map_batches(
        _cast_to(schema), batch_format="pandas"
    )


def _fold(
    parts: rd.Dataset, spec: IncAggSpec, schema: pa.Schema,
    num_buckets: int | None = None,
) -> rd.Dataset:
    """Sum partial differential rows per group; groups whose row count
    reaches zero retire from the view (no dead-group leak under
    add/remove cycles — same contract as corpus.merge_doc_frequencies)."""
    folded = bucketed_agg(
        parts,
        list(spec.group_cols),
        {c: (c, "sum") for c in spec.diff_cols()},
        num_buckets=num_buckets,
        combine=False,
    )

    def live(df: pd.DataFrame) -> pa.Table:
        t = _cast_to(schema)(df)
        return t.filter(pc.greater(pc.fill_null(t.column("__n"), 0), 0))

    return folded.map_batches(live, batch_format="pandas")


def _arrow_types(ds: rd.Dataset, strip: str = "") -> dict[str, pa.DataType]:
    """Column → Arrow type for a Dataset, tolerating pandas-block
    schemas (object → string); ``strip`` removes a name prefix
    (``new_`` for change-set payload columns)."""
    sch = ds.schema(fetch_if_missing=True)
    out: dict[str, pa.DataType] = {}
    for name, t in zip(sch.names, sch.types):
        if strip:
            if not name.startswith(strip):
                continue
            name = name[len(strip):]
        if isinstance(t, pa.DataType):
            out[name] = t
            continue
        try:
            out[name] = pa.from_numpy_dtype(t)
        except (pa.ArrowNotImplementedError, TypeError, ValueError):
            out[name] = pa.string()
    return out


def build_agg_view(
    rows: rd.Dataset, spec: IncAggSpec,
    num_buckets: int | None = None,
    expected_groups: int | None = None,
) -> rd.Dataset:
    """Materialize the view from scratch over a row Dataset (the same
    fold path maintenance uses, with every row asserted once).

    ``num_buckets`` sizes the reduces to the GROUP cardinality, not the
    input (a 6-group view over 10^9 rows wants a handful of buckets);
    ``expected_groups`` (an upper bound) lets the diff↔extrema join
    broadcast instead of shuffling."""
    types = _arrow_types(rows)
    pschema = _partial_schema(spec, types)

    def assert_all(t: pa.Table) -> pa.Table:
        return t.append_column("__sign", pa.array(np.ones(t.num_rows, np.int64)))

    keep = list(spec.group_cols) + spec.src_cols()
    base = rows.select_columns(keep).map_batches(
        assert_all, batch_format="pyarrow"
    )
    diff = _fold(
        base.map_batches(_signed_partial(spec, pschema),
                         batch_format="pandas"),
        spec, pschema, num_buckets,
    )
    if not (spec.mins or spec.maxs):
        return diff
    mm = _minmax_scan(rows.select_columns(keep), spec,
                      _mm_schema(spec, types), num_buckets)
    # inner ≡ left here: every live diff group has ≥1 input row, so the
    # extrema scan covers it — and inner unlocks the broadcast plan
    joined = auto_hash_join(diff, mm, list(spec.group_cols), how="inner",
                            right_rows=expected_groups)
    return joined.select_columns(
        list(spec.group_cols) + spec.diff_cols() + spec.mm_cols()
    )


def empty_agg_view(
    spec: IncAggSpec, types: dict[str, pa.DataType]
) -> rd.Dataset:
    """Zero-group view with the internal layout — the seed for pure
    change-set-driven maintenance (epoch 0's change set is all-'added',
    so folding it into this equals a fresh build)."""
    fields = list(_partial_schema(spec, types))
    fields += list(_mm_schema(spec, types))[len(spec.group_cols):]
    return rd.from_arrow(pa.schema(fields).empty_table())


def apply_change_set(
    view: rd.Dataset,
    change_set: rd.Dataset,
    spec: IncAggSpec,
    state: rd.Dataset | None = None,
    num_buckets: int | None = None,
) -> rd.Dataset:
    """One maintenance step: fold an epoch's change set into the view.

    ``state`` (the lake's live state AFTER the epoch) is required only
    when the spec has MIN/MAX columns — touched groups re-derive their
    extrema from it.  The touched-group list is collected to the driver
    (it is bounded by the change set's group cardinality, not its row
    count) and broadcast for the semi-join.
    """
    # payload columns arrive as new_<c>; key columns arrive unprefixed
    types = {**_arrow_types(change_set),
             **_arrow_types(change_set, strip="new_")}
    pschema = _partial_schema(spec, types)
    gcols = list(spec.group_cols)
    dparts = change_set.map_batches(
        _change_set_to_signed(spec), batch_format="pandas"
    ).map_batches(
        _signed_partial(spec, pschema), batch_format="pandas"
    ).materialize()  # read twice: the fold and the touched-group list
    folded = _fold(
        view.select_columns(gcols + spec.diff_cols()).union(dparts),
        spec, pschema, num_buckets,
    )
    if not (spec.mins or spec.maxs):
        return folded

    if state is None:
        raise ValueError(
            "MIN/MAX view columns need `state` for the touched-group rescan"
        )
    mmschema = _mm_schema(spec, types)
    # touched groups = groups holding any signed row this epoch (a
    # superset of groups whose extrema can have moved); bounded by the
    # change set's GROUP cardinality, so driver-collectable
    touched = (
        dparts.select_columns(gcols).to_pandas().drop_duplicates()
    )
    keep = gcols + spec.src_cols()
    mm_prev = view.select_columns(gcols + spec.mm_cols())
    if len(touched):
        rescan_rows = broadcast_join(
            state.select_columns(keep), touched, on=gcols, how="semi"
        )
        mm_touched = _minmax_scan(rescan_rows, spec, mmschema,
                                  num_buckets)
        mm_prev = broadcast_join(mm_prev, touched, on=gcols, how="anti")
        mm = mm_prev.map_batches(
            _cast_to(mmschema), batch_format="pandas"
        ).union(mm_touched)
    else:
        mm = mm_prev
    # inner ≡ left under the maintenance contract: a live folded group
    # is either untouched (extrema kept from the view) or touched (its
    # live rows rescanned), so mm always covers it; inner unlocks the
    # broadcast plan for small views.  Bound = view groups + touched.
    try:
        mm_rows = view.count() + len(touched)  # metadata-cheap when the
        # caller keeps the view materialized (the intended usage)
    except Exception:
        mm_rows = None
    joined = auto_hash_join(folded, mm, gcols, how="inner",
                            right_rows=mm_rows)
    return joined.select_columns(gcols + spec.diff_cols() + spec.mm_cols())


def view_result(view: rd.Dataset, spec: IncAggSpec) -> rd.Dataset:
    """Project the internal layout to the user-facing frame: COUNT(*)
    from ``__n``; SUM/AVG masked to NULL for all-null groups (SQL
    semantics); AVG = sum / non-null count."""

    def project(t: pa.Table) -> pa.Table:
        cols: dict[str, pa.Array] = {c: t.column(c) for c in spec.group_cols}
        if spec.count:
            cols[spec.count] = pc.cast(t.column("__n"), pa.int64())
        for o in spec.sums:
            nn = pc.greater(pc.fill_null(t.column(f"__nn_{o}"), 0), 0)
            cols[o] = pc.if_else(nn, t.column(f"__s_{o}"), None)
        for o in spec.means:
            nn_raw = pc.cast(
                pc.fill_null(t.column(f"__nn_{o}"), 0), pa.float64()
            )
            nn = pc.greater(nn_raw, 0)
            mean = pc.divide(
                pc.cast(t.column(f"__s_{o}"), pa.float64()),
                pc.if_else(nn, nn_raw, 1.0),
            )
            cols[o] = pc.if_else(nn, mean, None)
        for o in spec.mins:
            cols[o] = t.column(f"__mn_{o}")
        for o in spec.maxs:
            cols[o] = t.column(f"__mx_{o}")
        return pa.table(cols)

    return view.map_batches(project, batch_format="pyarrow")
