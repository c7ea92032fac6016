"""Distributed multinomial Naive Bayes over text columns.

The trained-classifier filter shape every large-scale curation pipeline
needs (CCNet / fastText-style language-ID and quality gates): fit from
label+token sufficient statistics — which are MERGEABLE counts, so
training is one combiner pass + one bucketed reduce, never an iterative
solver — then score with a broadcast model and a vectorized
matrix-gather per batch.

Scale shape:
- TRAIN: per-block (label, token, n) partials (one pandas groupby per
  block) → ``bucketed_sum`` keyed (label, token) — the exchange moves
  ≤ 1 row per distinct (label, token) per block, never per occurrence.
  The reduced table IS the model (vocab × labels); at web scale cap it
  with a document-frequency / heavy-hitter vocabulary pass
  (``sketches.heavy_hitters``) before collecting — the driver only
  ever holds the capped model.
- SCORE: model ships once via ``ray.put`` (log-probability matrix +
  token index), read per actor through the bounded broadcast cache;
  each batch maps token occurrences to matrix rows and folds per-doc
  scores with ``np.add.reduceat`` — no Python per row or per token.

Laplace (+1) smoothing; unseen-at-score-time tokens get the smoothed
floor log(1 / (tot_label + V)).  Ties break deterministically toward
the lexicographically smallest label (np.argmax first-max == SQL
``ORDER BY score DESC, label``).

The reference has no trained models (its classifiers are regex/dict
lookups, e.g. src/standardize_measurement.py's unit classifier); this
is the §2-beyond operator the training-data tier requires.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data as rd

from .corpus import _ws_tokens


@dataclass
class NBModel:
    labels: list[str]             # sorted ascending (tiebreak order)
    token_index: dict             # token -> row in logprob
    logprob: np.ndarray           # (V, L) log P(token | label), smoothed
    floor_logprob: np.ndarray     # (L,) log P(unseen token | label)
    prior_log: np.ndarray         # (L,) log P(label)


def _count_partial(text_col: str, label_col: str):
    def partial(df: pd.DataFrame) -> pa.Table:
        toks = _ws_tokens(df[text_col])
        lens = toks.map(len).to_numpy(dtype=np.int64)
        labels = df[label_col].to_numpy()
        if lens.sum():
            words = np.concatenate(
                [np.asarray(t, dtype=object) for t in toks if len(t)])
            lab = np.repeat(labels, lens)
            c = (pd.DataFrame({"label": lab, "token": words})
                 .groupby(["label", "token"], sort=False, dropna=False)
                 .size())
            out = c.reset_index(name="n")
        else:
            out = pd.DataFrame({"label": [], "token": [], "n": []})
        return pa.table({
            "label": pa.array(out["label"], pa.string()),
            "token": pa.array(out["token"], pa.string()),
            "n": pa.array(out["n"], pa.int64()),
        })

    return partial


def train_naive_bayes(
    docs: rd.Dataset,
    text_col: str,
    label_col: str,
    num_buckets: int | None = None,
) -> NBModel:
    """Fit from two mergeable passes: (label, token) occurrence counts
    and per-label document counts.  The reduced count table is
    collected as the model — see the module docstring for the capped
    scale contract."""
    from .joins import bucketed_sum

    counts = bucketed_sum(
        docs.map_batches(_count_partial(text_col, label_col),
                         batch_format="pandas"),
        ["label", "token"], ["n"], num_buckets, combine=False,
    ).to_pandas()

    def doc_partial(df: pd.DataFrame) -> pa.Table:
        c = df.groupby(label_col, sort=False, dropna=False).size()
        return pa.table({
            "label": pa.array(c.index.astype(str), pa.string()),
            "nd": pa.array(c.to_numpy(np.int64), pa.int64()),
        })

    nd = (docs.map_batches(doc_partial, batch_format="pandas")
          .to_pandas().groupby("label")["nd"].sum())

    labels = sorted(nd.index.tolist())
    lab_pos = {l: j for j, l in enumerate(labels)}
    vocab = counts["token"].unique()
    vocab.sort()
    token_index = {t: i for i, t in enumerate(vocab)}
    V, L = len(vocab), len(labels)

    tot = counts.groupby("label")["n"].sum().reindex(labels).fillna(0)
    denom = tot.to_numpy(np.float64) + float(V)          # (L,)
    n_mat = np.zeros((V, L), dtype=np.float64)
    ri = counts["token"].map(token_index).to_numpy(np.int64)
    cj = counts["label"].map(lab_pos).to_numpy(np.int64)
    n_mat[ri, cj] = counts["n"].to_numpy(np.float64)
    logprob = np.log((n_mat + 1.0) / denom)
    floor = np.log(1.0 / denom)
    prior_log = np.log(nd.reindex(labels).to_numpy(np.float64)
                       / float(nd.sum()))
    return NBModel(labels, token_index, logprob, floor, prior_log)


def classify_naive_bayes(
    ds: rd.Dataset,
    text_col: str,
    model: NBModel,
    keep_cols: list[str],
    out_col: str = "pred_label",
    score_col: str = "score",
) -> rd.Dataset:
    """Score + argmax per document against a broadcast model.  Output:
    ``keep_cols`` + predicted label + its log-posterior score."""
    import ray

    from .joins import _cached_get

    ref = ray.put(model)

    def fn(df: pd.DataFrame) -> pa.Table:
        m: NBModel = _cached_get(ref)
        L = len(m.labels)
        toks = _ws_tokens(df[text_col])
        lens = toks.map(len).to_numpy(dtype=np.int64)
        n_docs = len(df)
        sums = np.zeros((n_docs, L), dtype=np.float64)
        nz = lens > 0
        if nz.any():
            words = np.concatenate(
                [np.asarray(t, dtype=object) for t in toks if len(t)])
            idx = pd.Series(words, dtype=object).map(m.token_index)
            known = idx.notna().to_numpy()
            occ = np.broadcast_to(
                m.floor_logprob, (len(words), L)).copy()
            if known.any():
                occ[known] = m.logprob[idx[known].to_numpy(np.int64)]
            lens_nz = lens[nz]
            starts = np.concatenate(
                [[0], np.cumsum(lens_nz)[:-1]]).astype(np.int64)
            sums[nz] = np.add.reduceat(occ, starts, axis=0)
        scores = sums + m.prior_log
        pred = np.argmax(scores, axis=1)      # first max → label ASC tie
        cols = {c: pa.Array.from_pandas(df[c]) for c in keep_cols}
        cols[out_col] = pa.array(
            np.asarray(m.labels, dtype=object)[pred], pa.string())
        cols[score_col] = pa.array(
            scores[np.arange(n_docs), pred], pa.float64())
        return pa.table(cols)

    return ds.map_batches(fn, batch_format="pandas")


# ------------------------------------------------------------- bigram LM --

@dataclass
class BigramLM:
    """Add-one-smoothed bigram language model, defined entirely from
    the bigram count table (so the SQL oracle can restate it exactly):

    - ``c12``: corpus count of bigram (t1, t2)
    - ``ctx1 = Σ_t2 c12``: context count of t1
    - ``V``: number of distinct successor tokens (COUNT(DISTINCT t2))
    - ``P(t2 | t1) = (c12 + 1) / (ctx1 + V)``

    ``lnp`` is precomputed per distinct bigram on the driver
    (vectorized, once); unseen bigrams at score time fall back to
    ``ln(1 / (ctx1 + V))`` for a known context, ``ln(1 / V)`` for an
    unknown one."""

    big: pd.DataFrame     # columns t1, t2, lnp
    ctx: pd.DataFrame     # columns t1, ln_floor  (= -ln(ctx1 + V))
    v: int


def train_bigram_lm(ds: rd.Dataset, text_col: str) -> BigramLM:
    """Fit bigram counts distributed (per-block pandas groupby partial
    → ``bucketed_sum`` keyed (t1, t2): ≤1 row per distinct bigram per
    block crosses the exchange), then reduce the DISTINCT-BIGRAM table
    to the model on the driver.  The driver holds the bigram
    vocabulary only — at web scale cap it first with a heavy-hitter
    pass (``sketches.heavy_hitters``), same disclosed trade as
    ``train_naive_bayes``."""
    from .joins import bucketed_sum

    def partial(df: pd.DataFrame) -> pa.Table:
        toks = _ws_tokens(df[text_col])
        arrs = [np.asarray(t, dtype=object) for t in toks if len(t) >= 2]
        if not arrs:
            return pa.table({"t1": pa.array([], pa.string()),
                             "t2": pa.array([], pa.string()),
                             "c": pa.array([], pa.int64())})
        t1 = np.concatenate([a[:-1] for a in arrs])
        t2 = np.concatenate([a[1:] for a in arrs])
        g = (pd.DataFrame({"t1": t1, "t2": t2})
             .groupby(["t1", "t2"], sort=False).size()
             .reset_index(name="c"))
        return pa.table({"t1": pa.array(g["t1"], pa.string()),
                         "t2": pa.array(g["t2"], pa.string()),
                         "c": pa.array(g["c"].to_numpy(np.int64))})

    counts = bucketed_sum(
        ds.map_batches(partial, batch_format="pandas"),
        ["t1", "t2"], ["c"], combine=False,
        source_types={"t1": pa.string(), "t2": pa.string(),
                      "c": pa.int64()},
    ).to_pandas()
    v = int(counts["t2"].nunique())
    ctx = counts.groupby("t1", sort=False)["c"].sum().reset_index(
        name="ctx1")
    counts = counts.merge(ctx, on="t1")
    counts["lnp"] = np.log(
        (counts["c"].to_numpy(np.float64) + 1.0)
        / (counts["ctx1"].to_numpy(np.float64) + v)
    )
    ctx["ln_floor"] = -np.log(ctx["ctx1"].to_numpy(np.float64) + v)
    return BigramLM(big=counts[["t1", "t2", "lnp"]],
                    ctx=ctx[["t1", "ln_floor"]], v=v)


def score_bigram_lm(
    ds: rd.Dataset,
    text_col: str,
    id_col: str,
    model: BigramLM,
    nll_col: str = "avg_nll",
) -> rd.Dataset:
    """Per-document mean negative log-likelihood under a broadcast
    bigram LM — the perplexity-style quality score CCNet-era curation
    pipelines gate on (low = fluent under the corpus LM, high =
    boilerplate/noise).  Output: (id, n_bigrams, avg_nll), docs with
    ≥1 bigram only; ``perplexity = exp(avg_nll)``.

    The model ships once via ``ray.put`` (bounded broadcast cache);
    each batch explodes its bigram occurrences, joins the broadcast
    lnp table with ONE vectorized merge, and folds per-doc means —
    no Python per token."""
    import ray

    from .joins import _cached_get

    ref = ray.put(model)

    def fn(df: pd.DataFrame) -> pa.Table:
        m: BigramLM = _cached_get(ref)
        toks = _ws_tokens(df[text_col])
        keep = toks.map(len).to_numpy(dtype=np.int64) >= 2
        ids = df[id_col].to_numpy()[keep]
        arrs = [np.asarray(t, dtype=object)
                for t in toks[keep] if len(t) >= 2]
        if not arrs:
            return pa.table({
                id_col: pa.array([], pa.int64()),
                "n_bigrams": pa.array([], pa.int64()),
                nll_col: pa.array([], pa.float64()),
            })
        lens = np.array([len(a) - 1 for a in arrs], np.int64)
        occ = pd.DataFrame({
            "__doc": np.repeat(np.arange(len(arrs)), lens),
            "t1": np.concatenate([a[:-1] for a in arrs]),
            "t2": np.concatenate([a[1:] for a in arrs]),
        })
        occ = occ.merge(m.big, on=["t1", "t2"], how="left")
        miss = occ["lnp"].isna()
        if miss.any():  # unseen bigram: smoothed floor by context
            fl = occ.loc[miss, ["t1"]].merge(m.ctx, on="t1", how="left")
            occ.loc[miss, "lnp"] = fl["ln_floor"].fillna(
                -np.log(max(m.v, 1))).to_numpy()
        agg = occ.groupby("__doc", sort=True)["lnp"].agg(["size", "mean"])
        didx = agg.index.to_numpy(np.int64)
        return pa.table({
            id_col: pa.array(ids[didx]),
            "n_bigrams": pa.array(agg["size"].to_numpy(np.int64)),
            nll_col: pa.array(-agg["mean"].to_numpy(np.float64),
                              pa.float64()),
        })

    return ds.map_batches(fn, batch_format="pandas")
