"""Windowed aggregates over event streams.

The reference has no windows (SURVEY.md §2.7 — full-batch only); this is
the streaming-shaped operator a CDC/training-data engine needs.  Ray Data
has no event-time watermarks, so windows are expressed as: assign a
window column vectorized in ``map_batches``, then ``groupby`` — one
shuffle, oracle-expressible as ``GROUP BY date_trunc(...)``.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd
from ray.data.aggregate import Count, Mean, Sum


def add_tumbling_window(
    ds: rd.Dataset, ts_col: str, unit: str = "hour", out_col: str = "window_start"
) -> rd.Dataset:
    """Assign each row its tumbling-window start (calendar-aligned)."""

    def fn(batch: pa.Table) -> pa.Table:
        w = pc.floor_temporal(batch.column(ts_col), unit=unit)
        # Normalize to us so downstream hashing/oracles see one unit
        # regardless of the source column's resolution (floor_temporal
        # preserves the input unit; a timestamp[s] source would otherwise
        # surface a timestamp[s] window while SQL date_trunc emits us).
        return batch.append_column(out_col, pc.cast(w, pa.timestamp("us")))

    return ds.map_batches(fn, batch_format="pyarrow")


def tumbling_aggregate(
    ds: rd.Dataset,
    ts_col: str,
    value_col: str,
    unit: str = "hour",
    extra_keys: list[str] | None = None,
) -> rd.Dataset:
    """count + sum + mean of ``value_col`` per tumbling window
    (optionally per extra key)."""
    keys = ["window_start"] + (extra_keys or [])
    w = add_tumbling_window(ds, ts_col, unit)
    agg = w.groupby(keys if len(keys) > 1 else keys[0]).aggregate(
        Count(alias_name="n_events"),
        Sum(value_col, alias_name="sum_value"),
        Mean(value_col, alias_name="avg_value"),
    )

    # Ray's hash Aggregate re-materializes the grouping key and can
    # coarsen its unit to timestamp[s]; pin us so the output unit is
    # stable and matches SQL date_trunc (driver value hashes are
    # unit-sensitive even when the instants are identical).
    def _pin_us(batch: pa.Table) -> pa.Table:
        i = batch.schema.get_field_index("window_start")
        return batch.set_column(
            i,
            "window_start",
            pc.cast(batch.column("window_start"), pa.timestamp("us")),
        )

    return agg.map_batches(_pin_us, batch_format="pyarrow")


def hopping_aggregate(
    ds: rd.Dataset,
    ts_col: str,
    value_col: str,
    size_seconds: int = 3600,
    hop_seconds: int = 1800,
) -> rd.Dataset:
    """Hopping (sliding) windows: each event fans out to the
    ``size/hop`` overlapping windows containing it (1→K fan-out in
    map_batches), then one groupby — no event-time runtime needed."""
    import numpy as np

    k = size_seconds // hop_seconds

    def fanout(batch: pa.Table) -> pa.Table:
        ts = batch.column(ts_col)
        # FLOOR division to seconds: pc.divide on int64 truncates toward
        # zero (pc.floor is then a no-op), which shifts pre-1970
        # timestamps with sub-second parts into the wrong second/window
        epoch = np.floor_divide(
            pc.cast(ts, pa.int64()).to_numpy(zero_copy_only=False),
            1_000_000,
        )
        vals = batch.column(value_col).to_numpy(zero_copy_only=False)
        outs_start, outs_val = [], []
        for j in range(k):
            start = ((epoch - j * hop_seconds) // size_seconds) * size_seconds \
                + j * hop_seconds
            keep = start <= epoch  # guard the stream's left edge
            outs_start.append(start[keep])
            outs_val.append(vals[keep])
        return pa.table(
            {
                "window_start": pa.array(
                    np.concatenate(outs_start) * 1_000_000
                ).cast(pa.timestamp("us")),
                value_col: pa.array(np.concatenate(outs_val)),
            }
        )

    agg = (
        ds.map_batches(fanout, batch_format="pyarrow")
        .groupby("window_start")
        .aggregate(
            Count(alias_name="n_events"),
            Sum(value_col, alias_name="sum_value"),
        )
    )

    # same unit pin as tumbling_aggregate: the Aggregate can coarsen
    # the key to timestamp[s]
    def _pin_us(batch: pa.Table) -> pa.Table:
        i = batch.schema.get_field_index("window_start")
        return batch.set_column(
            i,
            "window_start",
            pc.cast(batch.column("window_start"), pa.timestamp("us")),
        )

    return agg.map_batches(_pin_us, batch_format="pyarrow")


def sessionize(
    ds: rd.Dataset,
    key_col: str,
    ts_col: str,
    gap_seconds: float = 1800.0,
    num_buckets: int | None = None,
) -> rd.Dataset:
    """Session windows per key: events closer than ``gap_seconds`` chain
    into one session.  Needs per-key time order → one groupby shuffle,
    then a vectorized cumulative split inside each group."""

    from .joins import bucketed_groupby

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        # vectorized across all keys in the bucket: sort by (key, ts),
        # break sessions where the per-key gap exceeds the threshold
        g = g.sort_values([key_col, ts_col])
        gaps = g.groupby(key_col)[ts_col].diff().dt.total_seconds().fillna(0.0)
        brk = gaps > gap_seconds
        g["session_id"] = brk.groupby(g[key_col]).cumsum().astype("int64")
        return g

    return bucketed_groupby(ds, [key_col], per_bucket, num_buckets)


def rolling_aggregate(
    ds: rd.Dataset,
    key_col: str,
    ts_col: str,
    order_col: str,
    value_col: str,
    window: int = 5,
    num_buckets: int | None = None,
) -> rd.Dataset:
    """Per-key ROW-frame rolling aggregates over the last ``window``
    rows in (ts, order) order — the feature-engineering window shape
    (``ROWS BETWEEN window-1 PRECEDING AND CURRENT ROW``) Ray Data has
    no native operator for.  One bucketed shuffle co-locates each key,
    then pandas computes the frames vectorized across ALL keys in a
    bucket.

    Emits ``roll_max`` (frame max of the raw double — comparisons
    only, bit-exact vs any SQL engine) and ``roll_sum_cents`` (frame
    sum of ``floor(value × 100)`` as int64 — the float→int step uses
    the same IEEE double multiply+floor on both sides, then the sum is
    integer math, so results are EXACTLY reproducible rather than
    summation-order-dependent)."""
    import numpy as np

    from .joins import bucketed_groupby

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([key_col, ts_col, order_col])
        cents = np.floor(g[value_col].to_numpy() * 100.0).astype(np.int64)
        gb = g.groupby(key_col, sort=False)
        out = pd.DataFrame(
            {
                key_col: g[key_col].to_numpy(),
                order_col: g[order_col].to_numpy(),
                "roll_max": gb[value_col]
                .rolling(window, min_periods=1)
                .max()
                .to_numpy(),
                "roll_sum_cents": pd.Series(cents)
                .groupby(g[key_col].to_numpy(), sort=False)
                .rolling(window, min_periods=1)
                .sum()
                .to_numpy()
                .astype(np.int64),
            }
        )
        return out

    return bucketed_groupby(ds, [key_col], per_bucket, num_buckets)


def watermark_split(
    ds: rd.Dataset,
    ts_col: str,
    order_col: str,
    lateness_us: int,
) -> rd.Dataset:
    """Streaming WATERMARK semantics over a batch replay: rows process
    in ``order_col`` (arrival) order; the watermark at a row is the max
    event time of all STRICTLY PRIOR arrivals; a row is LATE when its
    event time trails the watermark by more than ``lateness_us``
    (allowed lateness).  Appends a ``__late`` bool column — callers
    route late rows to side output / counters exactly as a streaming
    engine would.

    Exact and deterministic in parallel via the two-pass prefix trick
    (same shape as ``sequential_ids``/``pack_sequences``): one sort by
    arrival, per-block event-time maxima → driver prefix maxima (one
    scalar per block, never the data) → vectorized in-block running
    max.  SQL mirror: ``max(ts) OVER (ORDER BY arrival ROWS BETWEEN
    UNBOUNDED PRECEDING AND 1 PRECEDING)``."""
    import numpy as np

    import ray

    from .aggregates import ordered_sorted_refs

    sorted_ds = ds.sort(order_col)
    refs = ordered_sorted_refs(sorted_ds, [order_col])

    NEG_INF = -(2**62)

    @ray.remote
    def _block_max(t) -> int:
        if isinstance(t, pd.DataFrame):
            t = pa.Table.from_pandas(t, preserve_index=False)
        if t.num_rows == 0:
            return NEG_INF
        m = pc.max(pc.cast(t.column(ts_col), pa.int64())).as_py()
        return NEG_INF if m is None else int(m)

    @ray.remote
    def _mark(t, prefix_max: int) -> pa.Table:
        if isinstance(t, pd.DataFrame):
            t = pa.Table.from_pandas(t, preserve_index=False)
        tsv = pc.cast(t.column(ts_col), pa.int64()).to_numpy(
            zero_copy_only=False
        )
        # the running max must be SEEDED with the prior-blocks prefix:
        # accumulate(tsv) alone understates the watermark for every row
        # until the block internally re-exceeds prefix_max, and since
        # sort-block boundaries are sampled they vary run to run — the
        # bug surfaced as a FLAKY late-count (found by a hash-unstable
        # driver rehearsal, then reproduced 6x)
        run = np.maximum.accumulate(
            np.concatenate(([prefix_max], tsv))
        )
        before = run[:-1]
        late = tsv < (before - lateness_us)
        return t.append_column("__late", pa.array(late))

    maxes = ray.get([_block_max.remote(r) for r in refs])
    prefix = NEG_INF
    out = []
    for r, m in zip(refs, maxes):
        out.append(_mark.remote(r, int(prefix)))
        prefix = max(prefix, m)
    return rd.from_arrow_refs(out)


def lag_lead(
    ds: rd.Dataset,
    key_col: str,
    order_cols: list[str],
    value_cols: list[str],
    lags: int = 1,
    leads: int = 0,
    num_buckets: int | None = None,
) -> rd.Dataset:
    """Per-key LAG/LEAD (SQL ``lag(c, k) OVER (PARTITION BY key ORDER
    BY order_cols)``): one bucketed shuffle co-locates each key, then a
    single vectorized ``groupby().shift`` across ALL keys in the
    bucket produces every offset.  ``order_cols`` must be a per-key
    total order or the shifts are nondeterministic (same contract as
    SQL).  Appends ``{col}_lag{k}`` / ``{col}_lead{k}`` columns; all
    input columns pass through."""
    from .joins import bucketed_groupby

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([key_col] + list(order_cols))
        gb = g.groupby(key_col, sort=False)
        for c in value_cols:
            for k in range(1, lags + 1):
                g[f"{c}_lag{k}"] = gb[c].shift(k)
            for k in range(1, leads + 1):
                g[f"{c}_lead{k}"] = gb[c].shift(-k)
        return g

    return bucketed_groupby(ds, [key_col], per_bucket, num_buckets)


def group_rank(
    ds: rd.Dataset,
    key_col: str,
    order_cols: list[str],
    ascending: list[bool] | None = None,
    rank_prefix: int | None = None,
    num_buckets: int | None = None,
    percent: bool = False,
    ntile: int | None = None,
) -> rd.Dataset:
    """SQL ranking functions per key: appends ``row_number`` (unique
    within key — ``order_cols`` should end in a tiebreaker), ``rank``
    (ties share, gaps after) and ``dense_rank`` (ties share, no gaps),
    all ``OVER (PARTITION BY key ORDER BY order_cols)``.

    ``rank_prefix`` ranks ties on only the first N order columns while
    row_number still follows the full (deterministic) sort — SQL's
    ``row_number() OVER (ORDER BY a, tiebreak)`` next to ``rank() OVER
    (ORDER BY a)`` in one pass.

    One bucketed shuffle, then a vectorized pass: after the in-bucket
    sort, a row starts a new rank iff its (key, order) tuple differs
    from the previous row's — rank is the row_number at each start
    (forward-filled; key changes always start a new tuple so the fill
    never crosses keys), dense_rank the per-key running count of
    starts.

    ``percent=True`` adds ``percent_rank`` ((rank−1)/(n−1), 0 for a
    single-row key — SQL PERCENT_RANK) and ``cume_dist`` (rows ≤
    current incl. ties, over n), both on the ``rank_prefix`` tie
    tuple.  ``ntile=k`` adds SQL NTILE(k) over the FULL deterministic
    sort (the first n mod k tiles get the extra row)."""
    import numpy as np

    from .joins import bucketed_groupby

    cols = [key_col] + list(order_cols)
    asc = [True] + list(ascending) if ascending is not None else True
    npfx = len(order_cols) if rank_prefix is None else rank_prefix
    tie_cols = [key_col] + list(order_cols)[:npfx]

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(cols, ascending=asc, kind="mergesort")
        rn = g.groupby(key_col, sort=False).cumcount().to_numpy() + 1
        tup = g[tie_cols]
        # null-safe tuple inequality: SQL ORDER BY ranks NULLs as EQUAL
        # to each other (two NULL rows share a rank), while pandas
        # NaN.ne(NaN) is True — mask the both-null case out
        prev = tup.shift()
        differs = tup.ne(prev) & ~(tup.isna() & prev.isna())
        new_start = differs.any(axis=1).to_numpy()
        new_start[0:1] = True
        rank = pd.Series(np.where(new_start, rn, np.nan)).ffill().to_numpy()
        dense = (
            pd.Series(new_start.astype(np.int64))
            .groupby(g[key_col].to_numpy(), sort=False)
            .cumsum()
            .to_numpy()
        )
        g["row_number"] = rn.astype(np.int64)
        g["rank"] = rank.astype(np.int64)
        g["dense_rank"] = dense.astype(np.int64)
        if percent or ntile:
            n = (
                g.groupby(key_col, sort=False)[key_col]
                .transform("size").to_numpy(dtype=np.int64)
            )
        if percent:
            g["percent_rank"] = np.where(
                n > 1, (rank - 1) / np.maximum(n - 1, 1), 0.0
            )
            # cume_dist: rows ≤ current incl. ties = the max row_number
            # within each tie run (runs never cross keys: the key is in
            # the tie tuple)
            run_id = np.cumsum(new_start)
            run_max = (
                pd.Series(rn).groupby(run_id).transform("max").to_numpy()
            )
            g["cume_dist"] = run_max / n
        if ntile:
            k = int(ntile)
            q, r = n // k, n % k
            cut = r * (q + 1)  # rows covered by the (q+1)-sized tiles
            g["ntile"] = np.where(
                rn <= cut,
                (rn - 1) // np.maximum(q + 1, 1) + 1,
                r + (rn - cut - 1) // np.maximum(q, 1) + 1,
            ).astype(np.int64)
        return g

    return bucketed_groupby(ds, [key_col], per_bucket, num_buckets)


def nth_value(
    ds: rd.Dataset,
    key_col: str,
    order_cols: list[str],
    value_col: str,
    n: int,
    num_buckets: int | None = None,
) -> rd.Dataset:
    """Per-key NTH_VALUE over the full partition frame (SQL
    ``nth_value(v, n) OVER (PARTITION BY key ORDER BY order_cols ROWS
    BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)``): appends
    ``{value_col}_nth{n}`` — NULL for keys with fewer than n rows.
    Completes the window value family (first/last/lag/lead/rank...).

    One bucketed shuffle; the nth pick is pure index arithmetic
    (group-start offsets from a vectorized cumcount — no per-key
    Python)."""
    import numpy as np

    from .joins import bucketed_groupby

    nn = int(n)
    out_col = f"{value_col}_nth{nn}"

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([key_col] + list(order_cols))
        gb = g.groupby(key_col, sort=False)
        sizes = gb[value_col].transform("size").to_numpy()
        cc = gb.cumcount().to_numpy()
        starts = np.arange(len(g)) - cc
        pos = np.clip(starts + (nn - 1), 0, max(len(g) - 1, 0))
        vals = g[value_col].to_numpy()
        nth = pd.Series(vals[pos] if len(g) else vals,
                        index=g.index)
        g[out_col] = nth.where(sizes >= nn)
        return g

    return bucketed_groupby(ds, [key_col], per_bucket, num_buckets)


def grouped_ewma(
    ds: rd.Dataset,
    key_col: str,
    order_cols: list[str],
    value_col: str,
    alpha: float,
    num_buckets: int | None = None,
) -> rd.Dataset:
    """Per-key exponentially-weighted moving average over a declared
    total order: ``y₀ = x₀; yₜ = (1−α)·yₜ₋₁ + α·xₜ`` (pandas
    ``ewm(adjust=False)`` semantics — the recursive smoother used for
    metric baselining / trend features).  Emits input key/order
    columns + ``ewma``.

    Scale shape: one bucketed shuffle co-locates each key; the
    recursion runs in pandas' C ewm kernel vectorized across all keys
    of a bucket via groupby.  SQL mirror: the closed form
    ``yₙ = (1−α)ⁿ⁻¹·x₁ + Σᵢ₌₂ⁿ α(1−α)ⁿ⁻ⁱ·xᵢ`` as a self-join over
    row_number (O(n²) per key — oracle-only; the engine is O(n))."""
    import numpy as np

    from .joins import bucketed_groupby

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([key_col] + list(order_cols))
        out = g[[key_col] + list(order_cols)].copy()
        # grouped-ewm cython kernel; g is key-sorted, and groupby
        # preserves within-group order, so the concatenated result
        # aligns with g's rows positionally
        out["ewma"] = (
            g.groupby(key_col, sort=False)[value_col]
            .ewm(alpha=alpha, adjust=False).mean()
            .to_numpy(dtype=np.float64)
        )
        return out

    return bucketed_groupby(ds, [key_col], per_bucket, num_buckets)


def time_range_rolling(
    ds: rd.Dataset,
    key_col: str,
    ts_col: str,
    order_col: str,
    value_col: str,
    window_seconds: int,
    num_buckets: int | None = None,
) -> rd.Dataset:
    """Per-key TIME-frame rolling aggregates — SQL ``RANGE BETWEEN
    INTERVAL w PRECEDING AND CURRENT ROW`` (inclusive both ends,
    PEER-inclusive: all rows sharing the current timestamp are in the
    frame regardless of row order, which a positional pandas
    ``rolling`` would get wrong on ties).  Emits ``range_cnt`` and
    ``range_sum_cents`` (``floor(value·100)`` int64 — the
    summation-order-proof exact-compare contract shared with
    ``rolling_aggregate``).

    Scale shape: one bucketed shuffle co-locates keys; within a bucket
    rows collapse to per-(key, ts) partials, the time-window fold runs
    in pandas' C rolling kernel over the collapsed frame, and results
    map back with one vectorized merge — no per-key Python."""
    import numpy as np

    from .joins import bucketed_groupby

    win = f"{int(window_seconds)}s"

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([key_col, ts_col, order_col])
        cents = np.floor(g[value_col].to_numpy() * 100.0).astype(np.int64)
        u = (
            pd.DataFrame({
                key_col: g[key_col].to_numpy(),
                ts_col: g[ts_col].to_numpy(),
                "__c": 1,
                "__s": cents,
            })
            .groupby([key_col, ts_col], sort=False, as_index=False)
            .sum()
        )
        r = (
            u.groupby(key_col, sort=False)
            .rolling(win, on=ts_col, closed="both")[["__c", "__s"]]
            .sum()
            .reset_index(drop=True)
        )
        u["range_cnt"] = r["__c"].to_numpy(np.int64)
        u["range_sum_cents"] = r["__s"].to_numpy(np.int64)
        out = g[[key_col, ts_col, order_col]].merge(
            u[[key_col, ts_col, "range_cnt", "range_sum_cents"]],
            on=[key_col, ts_col], how="left",
        )
        return out

    return bucketed_groupby(ds, [key_col], per_bucket, num_buckets)


def funnel_steps(
    ds: rd.Dataset,
    key_col: str,
    ts_col: str,
    type_col: str,
    steps: list[str],
    num_buckets: int | None = None,
) -> rd.Dataset:
    """Funnel analysis: how many keys (users) performed ``steps`` as an
    ordered subsequence — step k counts keys with an event of type
    ``steps[k]`` STRICTLY after their earliest completion of step k-1
    (the standard product-analytics funnel; each step binds to its
    earliest admissible timestamp, so the count is maximal and
    deterministic).  Returns one row per step: (step, event_type,
    users).

    Scale shape: ONE bucketed shuffle co-locates each key, every key in
    a bucket resolves through len(steps) vectorized passes (filter →
    map previous step's per-key time → strict compare → groupby min),
    then only len(steps) partial-count rows per bucket cross the final
    tiny exchange.  No per-key Python, no driver-side row loops.
    SQL mirror: a chain of ``JOIN prev ON ts > prev.t`` CTEs."""
    import numpy as np

    from .joins import bucketed_groupby

    steps = list(steps)

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        prev = None  # per-key earliest completion time of the prior step
        users = []
        for st in steps:
            rows = g[g[type_col] == st]
            if prev is not None:
                p = rows[key_col].map(prev)
                m = p.notna().to_numpy()
                rows, p = rows[m], p[m]
                if len(rows):
                    rows = rows[rows[ts_col].to_numpy() > p.to_numpy()]
            prev = rows.groupby(key_col)[ts_col].min()
            users.append(len(prev))
        return pd.DataFrame({
            "step": np.arange(1, len(steps) + 1, dtype=np.int64),
            "event_type": steps,
            "users": np.asarray(users, dtype=np.int64),
        })

    partials = bucketed_groupby(ds, [key_col], per_bucket, num_buckets)
    out = partials.groupby(["step", "event_type"]).aggregate(
        Sum("users", alias_name="users"))

    def pin(t: pa.Table) -> pa.Table:
        return pa.table({
            "step": t.column("step").cast(pa.int64()),
            "event_type": t.column("event_type").cast(pa.string()),
            "users": t.column("users").cast(pa.int64()),
        })

    return out.map_batches(pin, batch_format="pyarrow")


def first_last_value(
    ds: rd.Dataset,
    key_col: str,
    order_cols: list[str],
    value_cols: list[str],
    num_buckets: int | None = None,
) -> rd.Dataset:
    """Per-key FIRST_VALUE / LAST_VALUE over the full partition frame
    (SQL ``first_value(c) OVER (PARTITION BY key ORDER BY order_cols
    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)``):
    one bucketed shuffle co-locates each key, then one vectorized
    ``groupby().transform`` per column — no per-key Python.
    ``order_cols`` must be a per-key total order (same contract as
    ``lag_lead``).  Appends ``{col}_first`` / ``{col}_last``; input
    columns pass through."""
    from .joins import bucketed_groupby

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([key_col] + list(order_cols))
        gb = g.groupby(key_col, sort=False)
        for c in value_cols:
            g[f"{c}_first"] = gb[c].transform("first")
            g[f"{c}_last"] = gb[c].transform("last")
        return g

    return bucketed_groupby(ds, [key_col], per_bucket, num_buckets)
