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
