"""Mergeable sketches for corpus-scale statistics.

HyperLogLog (Flajolet et al. 2007, with the HLL++ small-range linear
counting correction) — the approximate-distinct operator a 100 TB
pipeline uses where an exact ``count(DISTINCT x)`` would shuffle every
distinct value: the exchange moves ONE fixed-size register vector per
(group, block) partial, and merges are an element-wise ``max`` — fully
associative/commutative, so the result is a pure function of the value
SET (deterministic under any partitioning, ordering, or cluster size —
the property the tests pin).

Register width: 2^p uint8 registers per group (p=12 → 4 KiB,
~1.6% relative standard error; p=14 → 16 KiB, ~0.8%).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd

from ..functions.text import hash_u64


def _rho64(h: np.ndarray, p: int) -> tuple[np.ndarray, np.ndarray]:
    """(register index, leading-zero rank) per 64-bit hash: the top p
    bits pick the register; the rank is 1 + the count of leading zeros
    of the remaining 64-p bits (capped at 64-p+1 for an all-zero
    suffix)."""
    idx = (h >> np.uint64(64 - p)).astype(np.int64)
    rest = h << np.uint64(p)  # remaining bits, left-aligned
    # leading zeros of a 64-bit value, vectorized: 63 - floor(log2(v));
    # v == 0 → all 64-p suffix bits zero → maximum rank
    nz = rest != 0
    lz = np.full(len(h), 64, dtype=np.int64)
    # float64 mantissa (52 bits) cannot hold a 64-bit value exactly, so
    # log2 could round across a power-of-two boundary; use the exact
    # bit-length route instead: lz = 64 - bit_length(v)
    v = rest[nz]
    bl = np.zeros(v.shape, dtype=np.int64)
    x = v.copy()
    for shift in (32, 16, 8, 4, 2, 1):
        ge = x >= (np.uint64(1) << np.uint64(shift))
        bl[ge] += shift
        x = np.where(ge, x >> np.uint64(shift), x)
    bl += 1  # bit_length
    lz[nz] = 64 - bl
    rank = np.minimum(lz, 64 - p) + 1
    return idx, rank.astype(np.uint8)


def _alpha(m: int) -> float:
    if m == 16:
        return 0.673
    if m == 32:
        return 0.697
    if m == 64:
        return 0.709
    return 0.7213 / (1 + 1.079 / m)


def hll_estimate(regs: np.ndarray, p: int) -> float:
    """Registers → cardinality estimate (classic estimator + linear
    counting below the 2.5·m small-range threshold)."""
    m = 1 << p
    est = _alpha(m) * m * m / np.sum(np.power(2.0, -regs.astype(np.float64)))
    if est <= 2.5 * m:
        zeros = int(np.count_nonzero(regs == 0))
        if zeros:
            return m * np.log(m / zeros)
    return float(est)


def grouped_approx_distinct(
    ds: rd.Dataset,
    key_col: str,
    val_col: str,
    p: int = 12,
    num_buckets: int | None = None,
) -> rd.Dataset:
    """Approximate ``count(DISTINCT val) GROUP BY key``:

      1. per batch, per group: hash values once (``hash_u64``) and fold
         them into one 2^p-register vector (``np.maximum.at``) — the
         exchange moves one (key, registers) row per group per block,
         independent of the number of values;
      2. co-locate by key hash bucket and element-wise-``max`` the
         register vectors per key (one vectorized pass per bucket);
      3. estimate.

    Output: (key_col, approx_distinct float64).  Deterministic: the
    registers are a max-fold of a pure hash, so any partitioning gives
    byte-identical registers."""
    from .joins import bucketed_groupby

    m = 1 << p

    def partial(df: pd.DataFrame) -> pa.Table:
        keys_out, regs_out = [], []
        for k, g in df.groupby(key_col, sort=False, dropna=False):
            # count(DISTINCT val) semantics: NULL values are not
            # members (astype(str) would otherwise hash 'nan'/'None'
            # into the registers and inflate every affected group)
            vals = g[val_col].dropna()
            regs = np.zeros(m, np.uint8)
            if len(vals):
                h = hash_u64(vals.astype(str).to_numpy(dtype=object))
                idx, rank = _rho64(h, p)
                np.maximum.at(regs, idx, rank)
            keys_out.append(k)
            regs_out.append(regs.tobytes())
        return pa.table({
            key_col: pa.array(keys_out),
            "regs": pa.array(regs_out, pa.binary(m)),
        })

    def merge(g: pd.DataFrame) -> pa.Table:
        keys_out, est_out = [], []
        for k, grp in g.groupby(key_col, sort=False, dropna=False):
            stack = np.stack([
                np.frombuffer(b, np.uint8) for b in grp["regs"]
            ])
            regs = stack.max(axis=0)
            keys_out.append(k)
            est_out.append(hll_estimate(regs, p))
        return pa.table({
            key_col: pa.array(keys_out),
            "approx_distinct": pa.array(est_out, pa.float64()),
        })

    partials = ds.map_batches(partial, batch_format="pandas")
    return bucketed_groupby(partials, [key_col], merge, num_buckets)


def _mg_reduce(keys: np.ndarray, counts: np.ndarray, k: int):
    """Misra-Gries summary compression: keep at most k−1 (key, count)
    entries; decrementing by the evicted weight preserves the guarantee
    count_true(x) − n/k ≤ count_mg(x) ≤ count_true(x)."""
    if len(keys) < k:
        return keys, counts
    # vectorized equivalent of the per-item decrement: drop the
    # smallest-count entries and subtract the weight they absorb
    order = np.argsort(counts, kind="stable")
    cut = len(keys) - (k - 1)
    evict_weight = int(counts[order[cut - 1]])
    keep = order[cut:]
    new_counts = counts[keep] - evict_weight
    pos = new_counts > 0
    return keys[keep][pos], new_counts[pos]


def heavy_hitters(
    ds: rd.Dataset,
    col: str,
    k: int = 16,
    min_share: float | None = None,
) -> rd.Dataset:
    """EXACT frequent-items at scale via the classic two-pass shape:
    pass 1 builds per-block Misra-Gries summaries (map-only, ≤k−1
    entries each) whose merge keeps every item with true count
    > n/k (sketch guarantee — summaries are mergeable: concatenate and
    re-compress); pass 2 re-counts ONLY the surviving candidate set
    exactly (candidates broadcast into a map-side partial count, one
    tiny reduce).  Output: (value, n) for every item whose exact count
    exceeds ``max(n·min_share, n/k)`` — deterministic and
    SQL-mirrorable as ``GROUP BY HAVING count(*) > n/k``, WITHOUT ever
    shuffling the full value domain the way a plain groupby would.

    ``min_share`` defaults to 1/k and is CLAMPED to ≥ 1/k: the sketch
    only guarantees candidacy for items with count > n/k, so a smaller
    threshold would return a silently partitioning-dependent result
    (raise k to lower the detectable share)."""
    import pyarrow.compute as pc

    import ray

    share = max(1.0 / k, float(min_share) if min_share is not None
                else 0.0)

    def block_summary(t: pa.Table) -> pa.Table:
        v = t.column(col).cast(pa.string()).to_pandas()
        vc = v.value_counts()
        keys = vc.index.to_numpy(dtype=object)
        counts = vc.to_numpy(dtype=np.int64)
        keys, counts = _mg_reduce(keys, counts, k)
        # sentinel row (null value, mg=0) so the block's row count
        # reaches the driver even when compression empties the summary
        # (e.g. all values distinct): n_total must be the TRUE total
        return pa.table({
            "value": pa.array(
                np.concatenate([keys, [None]]), pa.string()
            ),
            "mg": pa.array(
                np.concatenate([counts, [0]]).astype(np.int64), pa.int64()
            ),
            "block_rows": pa.array([len(v)] * (len(keys) + 1), pa.int64()),
        })

    # merge summaries on the driver: ≤(k−1) rows PER BLOCK arrive —
    # sketch-sized, independent of the value domain
    parts = [
        t for t in ray.get(
            ds.map_batches(block_summary, batch_format="pyarrow")
            .to_arrow_refs()
        ) if t.num_rows
    ]
    if not parts:
        return rd.from_arrow(pa.table({
            "value": pa.array([], pa.string()),
            "n": pa.array([], pa.int64()),
        }))
    merged = pa.concat_tables(parts)
    # total rows: each block summary carries its row count as a
    # constant column — take it once per block
    n_total = sum(int(t.column("block_rows")[0].as_py()) for t in parts)
    df = merged.to_pandas()
    df = df[df["value"].notna()]  # drop the row-count sentinels
    agg = df.groupby("value", sort=False)["mg"].sum()
    keys = agg.index.to_numpy(dtype=object)
    counts = agg.to_numpy(dtype=np.int64)
    keys, counts = _mg_reduce(keys, counts, k)
    candidates = set(keys.tolist())
    cand_arr = pa.array(sorted(candidates), pa.string())
    cand_ref = ray.put(cand_arr)

    def exact_partial(t: pa.Table) -> pa.Table:
        from .joins import _cached_get

        cand = _cached_get(cand_ref)
        v = t.column(col).cast(pa.string())
        m = pc.is_in(v, value_set=cand)
        hit = v.filter(m).to_pandas().value_counts()
        return pa.table({
            "value": pa.array(hit.index.to_numpy(dtype=object), pa.string()),
            "n": pa.array(hit.to_numpy(dtype=np.int64), pa.int64()),
        })

    from ray.data.aggregate import Sum

    exact = (
        ds.map_batches(exact_partial, batch_format="pyarrow")
        .groupby("value")
        .aggregate(Sum("n", alias_name="n"))
    )
    floor = int(np.floor(n_total * share))

    def threshold(t: pa.Table) -> pa.Table:
        return t.filter(pc.greater(t.column("n"), floor))

    return exact.map_batches(threshold, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# t-digest (Dunning & Ertl) — mergeable approximate quantiles.  The
# 100 TB path where exact_quantiles' global sort is too expensive: the
# exchange moves ≤ ~delta centroid rows per BLOCK, merges are
# associative, and accuracy concentrates at the tails (the k1 scale
# function bounds centroid width by the local quantile density).
# Centroid layout depends on block boundaries, so the ESTIMATE is not
# bit-deterministic across cluster sizes — callers that need an oracle
# assert a rank-error bound against the exact path instead (the
# self-verifying-query pattern).

def _k1(q: np.ndarray, delta: float) -> np.ndarray:
    return (delta / (2 * np.pi)) * np.arcsin(np.clip(2 * q - 1, -1, 1))


def _compress(means: np.ndarray, weights: np.ndarray,
              delta: float) -> tuple[np.ndarray, np.ndarray]:
    """One vectorized compression pass: sort by mean, assign each
    centroid to the k1 bin of its cumulative-weight center, and merge
    each bin into its weighted mean (np.add.reduceat — no Python loop
    over centroids)."""
    order = np.argsort(means, kind="mergesort")
    means, weights = means[order], weights[order]
    total = weights.sum()
    if total <= 0 or len(means) == 0:
        return means[:0], weights[:0]
    centers = (np.cumsum(weights) - weights / 2) / total
    bins = np.floor(_k1(centers, delta) - _k1(np.zeros(1), delta)).astype(
        np.int64
    )
    starts = np.flatnonzero(np.diff(bins, prepend=bins[0] - 1))
    w_out = np.add.reduceat(weights, starts)
    m_out = np.add.reduceat(means * weights, starts) / w_out
    return m_out, w_out


def tdigest_partials(
    ds: rd.Dataset, col: str, delta: float = 200.0
) -> rd.Dataset:
    """Per-block digest partials: centroid rows (mean, weight) plus the
    block's exact min/max (tails must never be approximated away)."""

    def partial(t: pa.Table) -> pa.Table:
        x = t.column(col).drop_null().to_numpy(zero_copy_only=False)
        x = np.asarray(x, dtype=np.float64)
        if len(x) == 0:
            return pa.table({
                "mean": pa.array([], pa.float64()),
                "weight": pa.array([], pa.float64()),
                "lo": pa.array([], pa.float64()),
                "hi": pa.array([], pa.float64()),
            })
        m, w = _compress(np.sort(x), np.ones(len(x)), delta)
        return pa.table({
            "mean": pa.array(m), "weight": pa.array(w),
            "lo": pa.array(np.full(len(m), x.min())),
            "hi": pa.array(np.full(len(m), x.max())),
        })

    return ds.select_columns([col]).map_batches(
        partial, batch_format="pyarrow"
    )


def tdigest_quantiles(
    ds: rd.Dataset, col: str, qs: list[float], delta: float = 200.0,
    merge_tasks: int = 32,
) -> pa.Table:
    """Approximate quantiles from one streaming pass: per-block
    partials → a TREE merge (``merge_tasks`` intermediate
    merge-compress tasks, so the driver sees ≤ merge_tasks·delta
    centroids no matter how many blocks the scan produced) → one final
    driver-side compress + interpolation.  Merging is associative, so
    the tree changes only which order centroids fold — the same
    accuracy class as a flat merge."""

    def merge_block(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t
        m, w = _compress(t.column("mean").to_numpy(zero_copy_only=False),
                         t.column("weight").to_numpy(zero_copy_only=False),
                         delta)
        lo = pc.min(t.column("lo")).as_py()
        hi = pc.max(t.column("hi")).as_py()
        return pa.table({
            "mean": pa.array(m), "weight": pa.array(w),
            "lo": pa.array(np.full(len(m), lo)),
            "hi": pa.array(np.full(len(m), hi)),
        })

    parts = (
        tdigest_partials(ds, col, delta)
        .repartition(merge_tasks)
        .map_batches(merge_block, batch_format="pyarrow",
                     batch_size=None)
        .to_pandas()
    )
    if parts.empty:
        return pa.table({"q": pa.array(qs, pa.float64()),
                         "value": pa.array([None] * len(qs), pa.float64())})
    m, w = _compress(parts["mean"].to_numpy(), parts["weight"].to_numpy(),
                     delta)
    lo, hi = float(parts["lo"].min()), float(parts["hi"].max())
    total = w.sum()
    centers = (np.cumsum(w) - w / 2) / total
    xs = np.concatenate([[0.0], centers, [1.0]])
    ys = np.concatenate([[lo], m, [hi]])
    vals = np.interp(np.asarray(qs, dtype=np.float64), xs, ys)
    return pa.table({"q": pa.array(np.asarray(qs, np.float64)),
                     "value": pa.array(vals)})
