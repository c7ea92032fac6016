"""Distributed Naive Bayes (stages/classify.py) against a pure-numpy
reference implementation, with planted edge cases: zero-token docs,
unseen-at-score-time tokens, single-label corpora, and repartition
invariance."""

import math

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from standardized_omop_data_etl_ray.stages.classify import (
    classify_naive_bayes,
    train_naive_bayes,
)


def _ref_fit_score(train: pd.DataFrame, score: pd.DataFrame):
    """Plain-Python NB reference (multinomial, Laplace +1)."""
    toks = {i: r.split() for i, r in train["text"].fillna("").items()}
    labels = sorted(train["lang"].unique())
    vocab = sorted({w for t in toks.values() for w in t})
    V = len(vocab)
    cnt = {(l, w): 0 for l in labels for w in vocab}
    tot = dict.fromkeys(labels, 0)
    for i, t in toks.items():
        l = train.loc[i, "lang"]
        for w in t:
            cnt[(l, w)] += 1
            tot[l] += 1
    nd = train["lang"].value_counts()
    preds, scores = [], []
    for _, row in score.iterrows():
        best = None
        for l in labels:
            s = math.log(nd[l] / len(train))
            for w in str(row["text"] or "").split():
                n = cnt.get((l, w), 0)
                s += math.log((n + 1) / (tot[l] + V))
            if best is None or s > best[1] + 1e-12:
                best = (l, s)
        preds.append(best[0])
        scores.append(best[1])
    return preds, scores


def test_nb_matches_reference_with_edges():
    rng = np.random.default_rng(5)
    words = {
        "en": ["the", "cat", "sat", "mat", "dog"],
        "fr": ["le", "chat", "sur", "tapis", "chien"],
        "de": ["die", "katze", "auf", "matte", "hund"],
    }
    rows = []
    for i in range(240):
        l = ["en", "fr", "de"][i % 3]
        n = int(rng.integers(3, 12))
        # 15% cross-language noise words
        pool = words[l] * 6 + words["en"] + words["fr"]
        rows.append({
            "doc_id": i,
            "text": " ".join(rng.choice(pool, n)),
            "lang": l,
        })
    rows.append({"doc_id": 900, "text": "", "lang": "en"})       # zero-token
    rows.append({"doc_id": 901, "text": "   ", "lang": "fr"})    # ws-only
    df = pd.DataFrame(rows)

    ds = rd.from_arrow(pa.Table.from_pandas(df)).repartition(5)
    model = train_naive_bayes(ds, "text", "lang", num_buckets=3)
    got = (
        classify_naive_bayes(ds, "text", model, ["doc_id"],
                             out_col="pred", score_col="s")
        .to_pandas().sort_values("doc_id", ignore_index=True)
    )
    want_pred, want_s = _ref_fit_score(df, df.sort_values("doc_id"))
    assert got["pred"].tolist() == want_pred
    assert np.allclose(got["s"].to_numpy(), want_s, rtol=0, atol=1e-9)

    # repartition invariance
    got2 = (
        classify_naive_bayes(ds.repartition(11), "text",
                             train_naive_bayes(ds.repartition(2), "text",
                                               "lang", num_buckets=7),
                             ["doc_id"], out_col="pred", score_col="s")
        .to_pandas().sort_values("doc_id", ignore_index=True)
    )
    assert got2["pred"].tolist() == want_pred
    assert np.allclose(got2["s"].to_numpy(), want_s, atol=1e-9)


def test_nb_unseen_tokens_and_transfer():
    train = pd.DataFrame({
        "doc_id": range(4),
        "text": ["aa aa bb", "aa bb bb", "cc cc dd", "cc dd dd"],
        "lang": ["x", "x", "y", "y"],
    })
    test = pd.DataFrame({
        "doc_id": [10, 11, 12],
        "text": ["aa aa", "dd cc", "zz zz zz"],  # zz never trained
        "lang": ["?", "?", "?"],
    })
    model = train_naive_bayes(rd.from_pandas(train), "text", "lang")
    got = (
        classify_naive_bayes(rd.from_pandas(test), "text", model,
                             ["doc_id"], out_col="pred", score_col="s")
        .to_pandas().sort_values("doc_id", ignore_index=True)
    )
    assert got["pred"].tolist()[:2] == ["x", "y"]
    # all-unseen doc: equal priors and equal floors → exact tie →
    # deterministic tiebreak to the lexicographically smallest label
    assert got["pred"].tolist()[2] == "x"
    want_pred, want_s = _ref_fit_score(train, test)
    assert np.allclose(got["s"].to_numpy(), want_s, atol=1e-9)


def test_bigram_lm_hand_computed_and_unseen_floor():
    """Tiny corpus with a hand-derived bigram table; held-out docs hit
    the known-context and unknown-context smoothing floors."""
    from standardized_omop_data_etl_ray.stages.classify import (
        score_bigram_lm,
        train_bigram_lm,
    )

    train = pd.DataFrame({
        "doc_id": [1, 2],
        "text": ["a b a b", "b c"],
    })
    # bigrams: (a,b)x2, (b,a)x1, (b,c)x1 → ctx a=2, b=2; V = |{a,b,c}| = 3
    m = train_bigram_lm(rd.from_pandas(train).repartition(2), "text")
    assert m.v == 3
    big = {(r.t1, r.t2): r.lnp for r in m.big.itertuples()}
    assert math.isclose(big[("a", "b")], math.log((2 + 1) / (2 + 3)))
    assert math.isclose(big[("b", "a")], math.log((1 + 1) / (2 + 3)))
    assert math.isclose(big[("b", "c")], math.log((1 + 1) / (2 + 3)))

    test = pd.DataFrame({
        "doc_id": [10, 11, 12, 13],
        "text": [
            "a b",       # seen bigram
            "a c",       # unseen bigram, KNOWN context a → 1/(2+3)
            "z z",       # unseen bigram, UNKNOWN context → 1/V
            "solo",      # <2 tokens → no output row
        ],
    })
    got = (
        score_bigram_lm(rd.from_pandas(test), "text", "doc_id", m)
        .to_pandas().sort_values("doc_id", ignore_index=True)
    )
    assert got["doc_id"].tolist() == [10, 11, 12]
    assert got["n_bigrams"].tolist() == [1, 1, 1]
    want = [-math.log(3 / 5), -math.log(1 / 5), -math.log(1 / 3)]
    assert np.allclose(got["avg_nll"].to_numpy(), want, atol=1e-12)

    # self-scoring the training corpus: every bigram seen, finite nll
    self_s = (
        score_bigram_lm(rd.from_pandas(train), "text", "doc_id", m)
        .to_pandas()
    )
    assert len(self_s) == 2 and np.isfinite(self_s["avg_nll"]).all()
