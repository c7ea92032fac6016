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

from .joins import (auto_hash_join, broadcast_join, bucketed_agg,
                    bucketed_groupby, partitioned_hash_join)


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
            nd = getattr(t, "numpy_dtype", None)  # pandas Int64 & friends
            try:
                out[name] = pa.from_numpy_dtype(nd) if nd is not None \
                    else pa.string()
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

# ==========================================================================
# Incremental materialized JOIN views (differential join maintenance)
# ==========================================================================
#
# V = A ⋈ B (inner equi-join) maintained from the two tables' per-epoch
# change sets without re-joining the corpora.  Signed-multiset algebra
# (each change set becomes retractions −old / assertions +new):
#
#     A_new = A_old + dA,  B_new = B_old + dB
#     ΔV = dA⋈B_old + A_old⋈dB + dA⋈dB
#        = dA⋈B_new + A_new⋈dB − dA⋈dB          (old states never read)
#
# Per-epoch cost shape (the point of the operator):
#   * three joins whose BUILD sides are the change sets; the live states
#     are semi-filtered to the change sets' join-key values first, so
#     each probe side is touched-key-sized, not state-sized;
#   * applying ΔV to V is a map-only semi/anti split of the view by the
#     touched (left_key, right_key) pair set (broadcast, change-set-
#     bounded) plus one change-set-sized fold — the view itself is never
#     reshuffled.  When ΔV outgrows the broadcast bound (a hot dimension
#     row fanning out to millions of view rows), the application falls
#     back to ONE full-row fold of view ∪ ΔV — a single view-sized
#     shuffle, still never a re-join of the base tables.
#
# Build and maintenance share the fold, so they cannot diverge; fk
# (join-key) changes need no special casing — the old pair retracts and
# the new pair asserts through the same algebra.


@dataclass(frozen=True)
class IncJoinSpec:
    """Inner equi-join view definition.

    ``on`` must carry the SAME column name on both sides (rename
    upstream otherwise).  All other column names must be disjoint
    between the two sides.  ``left_key``/``right_key`` are the row
    identities of the two source tables (the change sets' unprefixed
    key columns); the view's row identity is their concatenation.
    ``left_cols``/``right_cols`` are the payload columns each side
    contributes to the view (list ``on`` on the side it belongs to).
    Payload columns must appear in the change sets as ``old_``/``new_``
    carry columns."""

    left_key: list[str]
    right_key: list[str]
    on: str
    left_cols: list[str] = field(default_factory=list)
    right_cols: list[str] = field(default_factory=list)

    def _side_cols(self, key: list[str], payload: list[str]) -> list[str]:
        out: dict[str, None] = dict.fromkeys([*key, *payload])
        out.setdefault(self.on, None)
        return list(out)

    def left_side_cols(self) -> list[str]:
        return self._side_cols(self.left_key, self.left_cols)

    def right_side_cols(self) -> list[str]:
        return self._side_cols(self.right_key, self.right_cols)

    def pair_cols(self) -> list[str]:
        return [*self.left_key, *self.right_key]

    def view_cols(self) -> list[str]:
        out: dict[str, None] = dict.fromkeys(
            [*self.left_key, *self.left_cols,
             *self.right_key, *self.right_cols]
        )
        return list(out)

    def validate(self) -> None:
        l = set(self.left_side_cols()) - {self.on}
        r = set(self.right_side_cols()) - {self.on}
        both = l & r
        if both:
            raise ValueError(
                f"left/right column names must be disjoint (shared: "
                f"{sorted(both)}; only the join column `{self.on}` may "
                "appear on both sides — rename upstream)"
            )


def _signed_delta(cols: list[str]):
    """Change-set rows → signed side rows (same old−/new+ explosion as
    the aggregate views' `_change_set_to_signed`, over an explicit
    column list)."""

    def pick(df: pd.DataFrame, side: str, c: str) -> pd.Series:
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


def _join_view_schema(
    spec: IncJoinSpec, state_left: rd.Dataset, state_right: rd.Dataset
) -> pa.Schema:
    tl = _arrow_types(state_left)
    tr = _arrow_types(state_right)
    fields = []
    for c in spec.view_cols():
        t = tl.get(c) if c in spec.left_side_cols() else tr.get(c)
        if t is None:
            t = tl.get(c) or tr.get(c)
        if t is None:
            raise ValueError(f"view column {c!r} missing from both states")
        fields.append(pa.field(c, t))
    return pa.schema(fields)


def _side_schema(cols: list[str], types: dict[str, pa.DataType]) -> pa.Schema:
    missing = [c for c in cols if c not in types]
    if missing:
        raise ValueError(f"state is missing side columns {missing}")
    return pa.schema([pa.field(c, types[c]) for c in cols])


def _pin(ds: rd.Dataset, schema: pa.Schema) -> rd.Dataset:
    """Arrow-pin a (possibly pandas-block) dataset so downstream joins
    never see object/extension dtypes."""
    return ds.map_batches(_cast_to(schema), batch_format="pandas")


def build_join_view(
    state_left: rd.Dataset,
    state_right: rd.Dataset,
    spec: IncJoinSpec,
    right_rows: int | None = None,
    num_buckets: int | None = None,
) -> rd.Dataset:
    """Initial materialization: one direct inner join, projected to the
    view layout (``auto_hash_join`` picks broadcast vs partitioned from
    ``right_rows``)."""
    spec.validate()
    schema = _join_view_schema(spec, state_left, state_right)
    lsch = _side_schema(spec.left_side_cols(), _arrow_types(state_left))
    rsch = _side_schema(spec.right_side_cols(), _arrow_types(state_right))
    joined = auto_hash_join(
        _pin(state_left.select_columns(spec.left_side_cols()), lsch),
        _pin(state_right.select_columns(spec.right_side_cols()), rsch),
        [spec.on],
        how="inner",
        right_rows=right_rows,
        num_buckets=num_buckets or 32,
        left_schema=lsch,
        right_schema=rsch,
    )
    return joined.map_batches(_cast_to(schema), batch_format="pandas")


def empty_join_view(
    spec: IncJoinSpec, state_left: rd.Dataset, state_right: rd.Dataset
) -> rd.Dataset:
    spec.validate()
    return rd.from_arrow(
        _join_view_schema(spec, state_left, state_right).empty_table()
    )


def apply_join_change_sets(
    view: rd.Dataset,
    spec: IncJoinSpec,
    d_left: rd.Dataset | None,
    d_right: rd.Dataset | None,
    state_left: rd.Dataset,
    state_right: rd.Dataset,
    num_buckets: int | None = None,
    broadcast_limit: int = 2_000_000,
    state_left_rows: int | None = None,
    state_right_rows: int | None = None,
) -> rd.Dataset:
    """One maintenance step: fold both tables' epoch change sets into
    the view.  ``state_left``/``state_right`` are the live states
    AFTER the epoch (the algebra needs only the new states).  Either
    delta may be None/empty.  ``state_*_rows`` are optional row-count
    upper bounds (parquet footer / epoch record): a state known to be
    small skips its touched-key semi-filter — filtering a 5-row
    dimension before a join is pure stage overhead.

    Driver footprint: the change sets' distinct join-key values and the
    touched pair set (both change-set-bounded, broadcast for the
    semi-filters); payload rows never collect.  Above
    ``broadcast_limit`` the touched-state filter degrades to a
    partitioned join and the view application to one full fold — see
    the module notes."""
    ctx = _inner_delta(
        spec, d_left, d_right, state_left, state_right, num_buckets,
        broadcast_limit, state_left_rows, state_right_rows,
    )
    if ctx["delta"] is None:
        return view
    return _apply_signed_delta(view, ctx["delta"], ctx["schema"],
                               spec.pair_cols(), num_buckets,
                               broadcast_limit)


def _inner_delta(
    spec: IncJoinSpec,
    d_left: rd.Dataset | None,
    d_right: rd.Dataset | None,
    state_left: rd.Dataset,
    state_right: rd.Dataset,
    num_buckets: int | None,
    broadcast_limit: int,
    state_left_rows: int | None,
    state_right_rows: int | None,
) -> dict:
    """Signed inner-join view delta ΔV = sA⋈B_new + A_new⋈sB − sA⋈sB
    (unmaterialized) plus the signed side datasets/schemas — shared by
    the inner and left-outer appliers."""
    spec.validate()
    schema = _join_view_schema(spec, state_left, state_right)
    delta_schema = pa.schema([*schema, pa.field("__sign", pa.int64())])
    vcols = spec.view_cols()
    lcols = spec.left_side_cols()
    rcols = spec.right_side_cols()
    on = spec.on
    lsch = _side_schema(lcols, _arrow_types(state_left))
    rsch = _side_schema(rcols, _arrow_types(state_right))
    signed_lsch = pa.schema([*lsch, pa.field("__sign", pa.int64())])
    signed_rsch = pa.schema([*rsch, pa.field("__sign", pa.int64())])

    def signed(cs: rd.Dataset | None, cols: list[str], ssch: pa.Schema):
        if cs is None:
            return None, 0
        ds = cs.map_batches(
            _signed_delta(cols), batch_format="pandas"
        ).map_batches(
            _cast_to(ssch), batch_format="pandas"
        ).materialize()
        n = ds.count()
        return (ds if n else None), n

    sA, nA = signed(d_left, lcols, signed_lsch)
    sB, nB = signed(d_right, rcols, signed_rsch)
    ctx = {
        "schema": schema, "delta_schema": delta_schema,
        "sA": sA, "nA": nA, "sB": sB, "nB": nB,
        "lsch": lsch, "rsch": rsch,
        "signed_lsch": signed_lsch, "signed_rsch": signed_rsch,
    }
    if sA is None and sB is None:
        return {**ctx, "delta": None}

    def touched_state(state: rd.Dataset, cols: list[str], ssch: pa.Schema,
                      sd: rd.Dataset, n: int,
                      state_rows: int | None) -> rd.Dataset:
        """state ⋉ sd on the join key (post-epoch live rows that can
        pair with the delta)."""
        proj = _pin(state.select_columns(cols),
                    pa.schema([ssch.field(c) for c in cols]))
        if state_rows is not None and state_rows <= broadcast_limit:
            return proj  # small state: the term join bounds cost itself
        if n <= broadcast_limit:
            keys = sd.select_columns([on]).to_pandas().drop_duplicates()
            return broadcast_join(proj, keys, on=on, how="semi")
        # huge epoch: inner-join against the deduped key set instead
        # (one partitioned exchange; correct, never all-pairs)
        keys_ds = bucketed_groupby(
            sd.select_columns([on]), [on],
            lambda g: g.drop_duplicates(), num_buckets=num_buckets,
        )
        return partitioned_hash_join(
            proj, keys_ds, [on], how="inner",
            num_buckets=num_buckets or 32,
            left_schema=pa.schema([ssch.field(c) for c in cols]),
            right_schema=pa.schema([ssch.field(on)]),
        ).select_columns(cols)

    def project_term(ds: rd.Dataset, sign_expr) -> rd.Dataset:
        def fn(df: pd.DataFrame) -> pa.Table:
            out = df[[c for c in vcols]].copy()
            out["__sign"] = sign_expr(df)
            return _cast_to(delta_schema)(out)

        return ds.map_batches(fn, batch_format="pandas")

    terms: list[rd.Dataset] = []
    if sA is not None:
        b_touched = touched_state(state_right, rcols, signed_rsch, sA, nA,
                                  state_right_rows)
        t1 = auto_hash_join(
            b_touched, sA, [on], how="inner", right_rows=nA,
            num_buckets=num_buckets or 32,
            left_schema=rsch, right_schema=signed_lsch,
        )
        terms.append(project_term(t1, lambda df: df["__sign"]))
    if sB is not None:
        a_touched = touched_state(state_left, lcols, signed_lsch, sB, nB,
                                  state_left_rows)
        t2 = auto_hash_join(
            a_touched, sB, [on], how="inner", right_rows=nB,
            num_buckets=num_buckets or 32,
            left_schema=lsch, right_schema=signed_rsch,
        )
        terms.append(project_term(t2, lambda df: df["__sign"]))
    if sA is not None and sB is not None:
        t3 = auto_hash_join(
            sA, sB, [on], how="inner", right_rows=nB,
            num_buckets=num_buckets or 32,
            left_schema=signed_lsch, right_schema=signed_rsch,
        )
        terms.append(
            project_term(
                t3, lambda df: -(df["__sign"] * df["__sign_r"])
            )
        )

    delta = terms[0]
    for t in terms[1:]:
        delta = delta.union(t)
    return {**ctx, "delta": delta}


def _apply_signed_delta(
    view: rd.Dataset,
    delta: rd.Dataset | None,
    schema: pa.Schema,
    pair_cols: list[str],
    num_buckets: int | None,
    broadcast_limit: int,
) -> rd.Dataset:
    """Apply a signed view delta: semi/anti split by the touched pair
    set (broadcast, change-set-bounded) + one change-set-sized fold;
    one full-row fold of view ∪ Δ above the broadcast bound."""
    if delta is None:
        return view
    delta = delta.materialize()
    n_delta = delta.count()
    if n_delta == 0:
        return view
    vcols = schema.names

    def with_sign(t: pa.Table) -> pa.Table:
        return t.append_column(
            "__sign", pa.array(np.ones(t.num_rows, dtype=np.int64))
        )

    view_cast = view.map_batches(_cast_to(schema), batch_format="pandas")
    if n_delta <= broadcast_limit:
        pairs = (
            delta.select_columns(pair_cols)
            .to_pandas().drop_duplicates()
        )
        untouched = broadcast_join(
            view_cast, pairs, on=pair_cols, how="anti"
        )
        affected = broadcast_join(
            view_cast, pairs, on=pair_cols, how="semi"
        ).map_batches(with_sign, batch_format="pyarrow")
        to_fold = affected.union(delta)
    else:
        untouched = None
        to_fold = view_cast.map_batches(
            with_sign, batch_format="pyarrow"
        ).union(delta)

    folded = bucketed_agg(
        to_fold, vcols, {"__net": ("__sign", "sum")},
        num_buckets=num_buckets, combine=False,
    )

    def live(df: pd.DataFrame) -> pa.Table:
        keep = df[df["__net"].fillna(0) > 0]
        return _cast_to(schema)(keep)

    out = folded.map_batches(live, batch_format="pandas")
    return out if untouched is None else untouched.union(out)


# --------------------------------------------------------------------------
# Left-outer join views: inner rows + null-extensions, maintained with a
# differential per-join-key match count for the right side
# --------------------------------------------------------------------------
#
# V_left = A ⟕ B = (A ⋈ B)  ∪  null_extend({a live : cnt(a.on) = 0 or
# a.on is null}), where cnt(v) = |{b ∈ B : b.on = v}|.  The inner part
# maintains by the signed algebra above; the extension part maintains
# from (1) cnt crossings 0↔+ (rescan state_left on JUST the crossed join
# keys, change-set-bounded) and (2) the left delta's own rows (membership
# evaluated against the epoch's old/new counts, driver-held for exactly
# the touched join keys).  Everything driver-held is bounded by the
# change sets' distinct join-key count.


def build_on_counts(
    state_right: rd.Dataset, spec: IncJoinSpec,
    num_buckets: int | None = None,
) -> rd.Dataset:
    """(on, __cnt) over the live right state — the match-count side
    state for left-view maintenance.  Group-cardinality-sized."""
    rtypes = _arrow_types(state_right)
    csch = pa.schema([pa.field(spec.on, rtypes[spec.on]),
                      pa.field("__cnt", pa.int64())])
    rows = _pin(
        state_right.select_columns([spec.on]),
        pa.schema([csch.field(spec.on)]),
    ).map_batches(
        lambda t: t.filter(pc.is_valid(t.column(spec.on))),
        batch_format="pyarrow",
    )
    out = bucketed_agg(rows, [spec.on], {"__cnt": (spec.on, "count")},
                       num_buckets=num_buckets)
    return out.map_batches(_cast_to(csch), batch_format="pandas")


def _null_extend(df: pd.DataFrame, schema: pa.Schema,
                 lcols: list[str], sign) -> pa.Table:
    out = pd.DataFrame({c: df[c] for c in lcols if c in schema.names})
    for f in schema:
        if f.name not in out.columns and f.name != "__sign":
            out[f.name] = None
    out["__sign"] = sign
    return _cast_to(schema)(out)


def build_left_join_view(
    state_left: rd.Dataset,
    state_right: rd.Dataset,
    spec: IncJoinSpec,
    right_rows: int | None = None,
    num_buckets: int | None = None,
) -> rd.Dataset:
    """Initial materialization of A ⟕ B, view layout (right columns
    null for unmatched left rows)."""
    spec.validate()
    schema = _join_view_schema(spec, state_left, state_right)
    lsch = _side_schema(spec.left_side_cols(), _arrow_types(state_left))
    rsch = _side_schema(spec.right_side_cols(), _arrow_types(state_right))
    joined = auto_hash_join(
        _pin(state_left.select_columns(spec.left_side_cols()), lsch),
        _pin(state_right.select_columns(spec.right_side_cols()), rsch),
        [spec.on],
        how="left",
        right_rows=right_rows,
        num_buckets=num_buckets or 32,
    )

    def project(df: pd.DataFrame) -> pa.Table:
        # the partitioned left join suffixes the right join key; the
        # view keeps the LEFT copy for unmatched rows
        return _cast_to(schema)(df)

    return joined.map_batches(project, batch_format="pandas")


def apply_left_join_change_sets(
    view: rd.Dataset,
    spec: IncJoinSpec,
    d_left: rd.Dataset | None,
    d_right: rd.Dataset | None,
    state_left: rd.Dataset,
    state_right: rd.Dataset,
    cnt_view: rd.Dataset,
    num_buckets: int | None = None,
    broadcast_limit: int = 2_000_000,
    state_left_rows: int | None = None,
    state_right_rows: int | None = None,
) -> tuple[rd.Dataset, rd.Dataset]:
    """One left-view maintenance step.  ``cnt_view`` is the match-count
    state from ``build_on_counts`` (or the previous step's return);
    returns ``(new_view, new_cnt_view)`` — keep BOTH materialized
    between epochs."""
    ctx = _inner_delta(
        spec, d_left, d_right, state_left, state_right, num_buckets,
        broadcast_limit, state_left_rows, state_right_rows,
    )
    if ctx["sA"] is None and ctx["sB"] is None:
        return view, cnt_view
    schema, delta_schema = ctx["schema"], ctx["delta_schema"]
    on, lcols = spec.on, spec.left_side_cols()
    sA, sB = ctx["sA"], ctx["sB"]

    # -- touched join keys + old/new counts (driver-held, bounded by the
    # change sets' distinct join-key count) --------------------------------
    def _ons(sd) -> pd.Series:
        if sd is None:
            return pd.Series(dtype=object)
        return sd.select_columns([on]).to_pandas()[on].dropna()

    touched = pd.DataFrame({on: pd.concat(
        [_ons(sA), _ons(sB)], ignore_index=True
    ).drop_duplicates()})
    delta_cnt: dict = {}
    if sB is not None:
        sdf = sB.select_columns([on, "__sign"]).to_pandas()
        sdf = sdf[sdf[on].notna()]
        delta_cnt = sdf.groupby(on)["__sign"].sum().to_dict()
    old_cnt: dict = {}
    if len(touched):
        old_rows = broadcast_join(
            cnt_view, touched, on=on, how="semi"
        ).to_pandas()
        old_cnt = dict(zip(old_rows[on], old_rows["__cnt"]))
    new_cnt = {
        v: old_cnt.get(v, 0) + delta_cnt.get(v, 0)
        for v in set(old_cnt) | set(delta_cnt)
    }

    # -- extension delta ----------------------------------------------------
    ext_terms: list[rd.Dataset] = []
    # (1) crossings 0 ↔ +: rescan state_left on JUST those join keys;
    # rows in the left delta are excluded (handled exactly in (2))
    gained = {v for v in new_cnt
              if old_cnt.get(v, 0) <= 0 and new_cnt[v] > 0}
    lost = {v for v in new_cnt
            if old_cnt.get(v, 0) > 0 and new_cnt[v] <= 0}
    crossed = gained | lost
    if crossed:
        scan = broadcast_join(
            _pin(state_left.select_columns(lcols),
                 pa.schema([ctx["lsch"].field(c) for c in lcols])),
            pd.DataFrame({on: list(crossed)}), on=on, how="semi",
        )
        if sA is not None:
            dkeys = sA.select_columns(spec.left_key).to_pandas(
            ).drop_duplicates()
            scan = broadcast_join(scan, dkeys, on=spec.left_key,
                                  how="anti")
        lost_set = lost

        def ext_scan(df: pd.DataFrame) -> pa.Table:
            sign = df[on].map(
                lambda v: 1 if v in lost_set else -1
            ).astype("int64")
            return _null_extend(df, delta_schema, lcols, sign)

        ext_terms.append(scan.map_batches(ext_scan, batch_format="pandas"))
    # (2) the left delta's own rows: a retraction evaluates membership
    # against the OLD counts, an assertion against the NEW counts
    if sA is not None:
        oc, nc = dict(old_cnt), dict(new_cnt)

        def ext_delta(df: pd.DataFrame) -> pa.Table:
            neg = df["__sign"].to_numpy() < 0
            cnts = np.where(
                neg,
                df[on].map(lambda v: oc.get(v, 0)).to_numpy(dtype="int64"),
                df[on].map(lambda v: nc.get(v, 0)).to_numpy(dtype="int64"),
            )
            member = df[on].isna().to_numpy() | (cnts <= 0)
            keep = df[member]
            return _null_extend(keep, delta_schema, lcols,
                                keep["__sign"])

        ext_terms.append(sA.map_batches(ext_delta, batch_format="pandas"))

    delta = ctx["delta"]
    for t in ext_terms:
        delta = t if delta is None else delta.union(t)
    new_view = _apply_signed_delta(view, delta, schema, spec.pair_cols(),
                                   num_buckets, broadcast_limit)

    # -- fold the count delta into the count view --------------------------
    new_cnt_view = cnt_view
    if delta_cnt:
        csch = pa.schema([ctx["rsch"].field(on),
                          pa.field("__cnt", pa.int64())])
        dc = rd.from_arrow(pa.table({
            on: pa.array(list(delta_cnt.keys()), csch.field(on).type),
            "__cnt": pa.array([int(v) for v in delta_cnt.values()],
                              pa.int64()),
        }))
        folded = bucketed_agg(
            cnt_view.union(dc), [on], {"__cnt": ("__cnt", "sum")},
            num_buckets=num_buckets, combine=False,
        )

        def live(df: pd.DataFrame) -> pa.Table:
            return _cast_to(csch)(df[df["__cnt"].fillna(0) > 0])

        new_cnt_view = folded.map_batches(live, batch_format="pandas")
    return new_view, new_cnt_view
