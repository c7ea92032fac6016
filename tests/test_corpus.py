"""Corpus operators: vocabulary building, chunking, stratified sampling
(stages/corpus.py — the training-data fan-out/curation family)."""

import pandas as pd
import pyarrow as pa
import ray.data as rd

from standardized_omop_data_etl_ray.stages.corpus import (
    chunk_documents,
    sample_threshold_hex,
    stratified_sample,
    token_vocab,
)


def test_token_vocab_partial_agg_and_topk_ties():
    docs = pa.table({
        "text": [
            "a b a", "  b\t c  ", "", "   ", None, "c a",
        ]
    })
    out = token_vocab(rd.from_arrow(docs).repartition(3), "text").to_pandas()
    counts = dict(zip(out["token"], out["n"]))
    assert counts == {"a": 3, "b": 2, "c": 2}
    # deterministic top-k: ties broken by token asc (b before c)
    top = token_vocab(
        rd.from_arrow(docs).repartition(2), "text", top_k=2
    ).to_pandas()
    assert list(zip(top["token"], top["n"])) == [("a", 3), ("b", 2)]


def test_chunk_documents_boundaries():
    docs = pa.table({
        "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
        "text": ["w1 w2 w3 w4 w5", "x1 x2", "", "y1 y2 y3 y4"],
    })
    out = chunk_documents(
        rd.from_arrow(docs).repartition(2), "text", "doc_id", chunk_tokens=2
    ).to_pandas().sort_values(["doc_id", "chunk_idx"]).reset_index(drop=True)
    # doc 1: 5 tokens → chunks of 2,2,1; doc 3 (empty) → no chunks
    assert out["doc_id"].tolist() == [1, 1, 1, 2, 4, 4]
    assert out["chunk_idx"].tolist() == [0, 1, 2, 0, 0, 1]
    assert out["n_tokens"].tolist() == [2, 2, 1, 2, 2, 2]
    assert out.loc[2, "chunk_text"] == "w5"
    assert out["doc_id"].dtype == "int64" and out["chunk_idx"].dtype == "int64"


def test_stratified_sample_deterministic_across_partitioning():
    n = 400
    docs = pa.table({
        "doc_id": pa.array(range(n), pa.int64()),
        "lang": pa.array(["en", "de"] * (n // 2)),
    })
    rates = {"en": 0.5, "de": 1.0}
    a = stratified_sample(
        rd.from_arrow(docs).repartition(2), "doc_id", "lang", rates
    ).to_pandas().sort_values("doc_id").reset_index(drop=True)
    b = stratified_sample(
        rd.from_arrow(docs).repartition(7), "doc_id", "lang", rates
    ).to_pandas().sort_values("doc_id").reset_index(drop=True)
    # identical surviving rows under any partitioning
    pd.testing.assert_frame_equal(a, b)
    # rate 1.0 keeps every row; rate 0 (default for unknown strata) none
    assert (a[a["lang"] == "de"]["doc_id"].to_numpy()
            == docs.to_pandas().query("lang == 'de'")["doc_id"].to_numpy()).all()
    en = (a["lang"] == "en").sum()
    assert 0 < en < n // 2  # ~half of the en stratum
    c = stratified_sample(
        rd.from_arrow(docs), "doc_id", "lang", {}
    ).to_pandas()
    assert len(c) == 0


def test_sample_threshold_hex():
    assert sample_threshold_hex(0.0) == "0000"
    # rate 1.0 sorts above any 4-hex digest AS A STRING ('g' > 'f...')
    assert sample_threshold_hex(1.0) == "g"
    assert "ffff" < sample_threshold_hex(1.0)
    assert sample_threshold_hex(0.5) == "8000"


def test_split_assign_deterministic_and_complete():
    """Every row gets exactly one split regardless of partitioning; the
    assignment is md5-deterministic (re-run and re-partition identical)
    and fractions are roughly honored."""
    import hashlib

    from standardized_omop_data_etl_ray.stages.corpus import split_assign

    t = pa.table({"doc_id": pa.array(range(2000), pa.int64())})
    a = (
        split_assign(rd.from_arrow(t), "doc_id")
        .to_pandas().set_index("doc_id")["split"]
    )
    b = (
        split_assign(rd.from_arrow(t).repartition(7), "doc_id")
        .to_pandas().set_index("doc_id")["split"]
    )
    assert a.sort_index().equals(b.sort_index())
    frac = a.value_counts(normalize=True)
    assert 0.75 < frac["train"] < 0.85
    assert 0.07 < frac["val"] < 0.13
    assert 0.07 < frac["test"] < 0.13
    # spot-check the contract against a hand md5: the 0.8 threshold at
    # 4 hex digits is round(0.8*65536)=52429=0xcccd
    h = hashlib.md5(b"0").hexdigest()[:4]
    assert (a.loc[0] == "train") == (h < "cccd")


def test_redact_pii_scrubs_and_counts():
    from standardized_omop_data_etl_ray.stages.corpus import redact_pii

    t = pa.table({
        "id": pa.array([1, 2, 3, 4], pa.int64()),
        "text": pa.array([
            "mail me at jane.doe+x@sub.example.org today",
            "server 192.168.0.12 then call +1 555 0100 7788",
            "no pii here, just 42 and 3.14",
            "",
        ]),
    })
    out = redact_pii(rd.from_arrow(t), "text").to_pandas().set_index("id")
    assert out.loc[1, "clean_text"] == "mail me at <EMAIL> today"
    assert out.loc[1, "n_email"] == 1 and out.loc[1, "n_phone"] == 0
    assert out.loc[2, "clean_text"] == "server <IP> then call <PHONE>"
    assert out.loc[2, "n_ipv4"] == 1 and out.loc[2, "n_phone"] == 1
    assert out.loc[3, "clean_text"] == "no pii here, just 42 and 3.14"
    assert int(out.loc[3, ["n_email", "n_ipv4", "n_phone"]].sum()) == 0
    assert out.loc[4, "clean_text"] == ""


def test_rolling_aggregate_matches_pandas_oracle():
    """rolling_aggregate must equal a single-process pandas rolling
    computation on any partitioning."""
    import numpy as np

    from standardized_omop_data_etl_ray.stages.windows import (
        rolling_aggregate,
    )

    rng = np.random.default_rng(11)
    n = 800
    df = pd.DataFrame({
        "user_id": rng.integers(0, 12, n),
        "event_id": np.arange(n, dtype=np.int64),
        "ts": pd.to_datetime("2024-01-01")
        + pd.to_timedelta(rng.integers(0, 10_000, n), unit="s"),
        "value": np.round(rng.uniform(0, 300, n), 2),
    })
    got = (
        rolling_aggregate(
            rd.from_pandas(df).repartition(5),
            "user_id", "ts", "event_id", "value", window=5,
        )
        .to_pandas().sort_values("event_id").reset_index(drop=True)
    )
    o = df.sort_values(["user_id", "ts", "event_id"]).copy()
    gb = o.groupby("user_id", sort=False)
    o["roll_max"] = gb["value"].rolling(5, min_periods=1).max().to_numpy()
    o["roll_sum_cents"] = (
        pd.Series(np.floor(o["value"].to_numpy() * 100).astype(np.int64))
        .groupby(o["user_id"].to_numpy(), sort=False)
        .rolling(5, min_periods=1).sum().to_numpy().astype(np.int64)
    )
    o = o.sort_values("event_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got[["event_id", "roll_max", "roll_sum_cents"]],
        o[["event_id", "roll_max", "roll_sum_cents"]],
    )


def test_tfidf_top_terms_matches_pandas_oracle():
    """Distributed TF-IDF top-k equals a single-process computation on
    any partitioning; ties break on token; empty docs emit nothing."""
    import numpy as np

    from standardized_omop_data_etl_ray.functions.rounding import (
        round_half_away,
    )
    from standardized_omop_data_etl_ray.stages.corpus import (
        tfidf_top_terms,
    )

    docs = pd.DataFrame({
        "doc_id": np.arange(6, dtype=np.int64),
        "text": [
            "apple banana apple cherry",
            "banana banana date",
            "apple cherry cherry cherry date",
            "",
            "egg egg egg apple",
            "fig",
        ],
    })
    got = (
        tfidf_top_terms(
            rd.from_pandas(docs).repartition(4), "text", "doc_id",
            k=2, n_docs=len(docs),
        )
        .to_pandas()
        .sort_values(["doc_id", "rank"])
        .reset_index(drop=True)
    )
    tok = docs.assign(t=docs["text"].str.strip().str.split()).explode("t")
    tok = tok.dropna(subset=["t"])[tok.get("t", pd.Series()).astype(bool)]
    tf = tok.groupby(["doc_id", "t"]).size().rename("tf").reset_index()
    df_ = tok.groupby("t")["doc_id"].nunique().rename("df").reset_index()
    s = tf.merge(df_, on="t")
    s["tfidf"] = round_half_away(
        s["tf"].to_numpy() * np.log(len(docs) / s["df"].to_numpy()), 6
    )
    s = s.sort_values(["doc_id", "tfidf", "t"],
                      ascending=[True, False, True])
    s["rank"] = (s.groupby("doc_id").cumcount() + 1).astype(np.int64)
    want = (
        s[s["rank"] <= 2]
        .rename(columns={"t": "token"})
        [["doc_id", "token", "tfidf", "rank"]]
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        got[["doc_id", "token", "tfidf", "rank"]], want
    )
    assert 3 not in set(got["doc_id"])  # empty doc contributes nothing


def test_incremental_doc_frequencies_equals_recompute():
    """Folding a signed delta (adds + removes, including a full doc
    UPDATE as remove-old/add-new) into a committed vocabulary must
    equal a fresh doc_frequencies over the live doc set; tokens whose
    df reaches zero retire from the table entirely."""
    from standardized_omop_data_etl_ray.stages.corpus import (
        doc_frequencies,
        doc_frequency_delta,
        merge_doc_frequencies,
    )

    base = pd.DataFrame({
        "doc_id": pd.array([1, 2, 3], dtype="int64"),
        "text": ["apple banana", "banana cherry", "date date egg"],
    })
    # delta: remove doc 3 (retires 'date' and 'egg'), update doc 2
    # (remove old text, add new), add doc 4.
    removed = pd.DataFrame({
        "doc_id": pd.array([3, 2], dtype="int64"),
        "text": ["date date egg", "banana cherry"],
    })
    added = pd.DataFrame({
        "doc_id": pd.array([2, 4], dtype="int64"),
        "text": ["cherry fig", "apple fig  "],
    })
    live = pd.DataFrame({
        "doc_id": pd.array([1, 2, 4], dtype="int64"),
        "text": ["apple banana", "cherry fig", "apple fig  "],
    })

    vocab = doc_frequencies(
        rd.from_pandas(base).repartition(3), "text", "doc_id"
    )
    delta = doc_frequency_delta(
        rd.from_pandas(added).repartition(2),
        rd.from_pandas(removed).repartition(2),
        "text",
    )
    got = (
        merge_doc_frequencies(vocab, delta)
        .to_pandas().sort_values("token").reset_index(drop=True)
    )
    want = (
        doc_frequencies(rd.from_pandas(live), "text", "doc_id")
        .to_pandas().sort_values("token").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want)
    assert "date" not in set(got["token"])  # retired, not df=0
    assert got.set_index("token")["df"].to_dict() == {
        "apple": 2, "banana": 1, "cherry": 1, "fig": 2,
    }


def test_pack_sequences_prefix_sum_and_invariance():
    """pack_sequences: global concat-and-cut semantics — offsets are the
    exact token prefix sum in id order, docs straddle cuts (seq_id =
    the sequence holding the FIRST token), tokenless docs occupy no
    space, and the result is invariant to input partitioning."""
    docs = pd.DataFrame({
        "doc_id": pd.array([3, 1, 2, 4, 5], dtype="int64"),
        "text": ["c1 c2 c3", "a1 a2", "", "d1 d2 d3 d4", "e1"],
    })

    def run(parts):
        from standardized_omop_data_etl_ray.stages.corpus import (
            pack_sequences,
        )
        out = pack_sequences(
            rd.from_pandas(docs).repartition(parts),
            "text", "doc_id", seq_tokens=4,
        ).to_pandas().set_index("doc_id").sort_index()
        return out

    got = run(3)
    # id order: 1(2 tok) 2(0) 3(3) 4(4) 5(1); starts: 0,2,2,5,9
    assert got["n_tokens"].tolist() == [2, 0, 3, 4, 1]
    assert got["seq_id"].tolist() == [0, 0, 0, 1, 2]
    assert got["seq_offset"].tolist() == [0, 2, 2, 1, 1]
    pd.testing.assert_frame_equal(got, run(1))


def test_cap_per_key_quota_and_ties():
    """cap_per_key keeps exactly n per key ranked by rank_col desc with
    id ascending tiebreak, vectorized per bucket, any partitioning."""
    from standardized_omop_data_etl_ray.stages.corpus import cap_per_key

    df = pd.DataFrame({
        "doc_id": pd.array(range(10), dtype="int64"),
        "src": ["a"] * 6 + ["b"] * 3 + ["c"],
        "score": pd.array([5, 9, 9, 1, 9, 2, 7, 7, 3, 4], dtype="int64"),
    })
    out = (
        cap_per_key(rd.from_pandas(df).repartition(4),
                    "src", "score", 2, "doc_id", num_buckets=3)
        .to_pandas().sort_values("doc_id")
    )
    # a: scores [5,9,9,1,9,2] → top2 by (score desc, id asc) = ids 1,2
    # b: [7,7,3] → ids 6,7 ; c: id 9
    assert out["doc_id"].tolist() == [1, 2, 6, 7, 9]


def test_deterministic_shuffle_partitioning_invariant():
    """deterministic_shuffle yields the SAME permutation on any input
    partitioning (md5-keyed order, not RNG)."""
    from standardized_omop_data_etl_ray.stages.corpus import (
        deterministic_shuffle,
    )

    df = pd.DataFrame({"doc_id": pd.array(range(40), dtype="int64")})

    def order(parts):
        return (
            deterministic_shuffle(
                rd.from_pandas(df).repartition(parts), "doc_id"
            ).to_pandas()["doc_id"].tolist()
        )

    o1, o2 = order(1), order(5)
    assert o1 == o2
    assert sorted(o1) == list(range(40)) and o1 != list(range(40))


def test_weighted_sample_deterministic_and_monotone():
    """weighted_sample: identical survivors on any partitioning; weight
    1.0 keeps everything, 0.0 keeps nothing; a row kept at weight w is
    kept at any w' > w (hash-fraction threshold is monotone)."""
    import numpy as np

    from standardized_omop_data_etl_ray.stages.corpus import (
        weighted_sample,
    )

    rng = np.random.default_rng(8)
    df = pd.DataFrame({
        "doc_id": pd.array(range(500), dtype="int64"),
        "w": rng.random(500),
    })

    def ids(frame, parts):
        out = weighted_sample(
            rd.from_pandas(frame).repartition(parts), "doc_id", "w"
        ).to_pandas()
        # an all-empty result carries no columns (Ray skips map UDFs
        # on empty blocks)
        return set(out["doc_id"]) if "doc_id" in out.columns else set()

    a = ids(df, 1)
    assert a == ids(df, 5)
    assert 50 < len(a) < 450  # ~uniform weights keep roughly half
    assert ids(df.assign(w=1.0), 2) == set(range(500))
    assert ids(df.assign(w=0.0), 2) == set()
    bumped = ids(df.assign(w=np.minimum(1.0, df["w"] + 0.3)), 2)
    assert a <= bumped  # monotone in weight


def test_weighted_topk_sample_exact_k_deterministic_and_weighted():
    """Efraimidis–Spirakis fixed-budget sample: exactly k rows, pure
    function of (id, weight) so any partitioning gives the SAME set,
    heavier rows over-represented, w<=0/NULL excluded."""
    import numpy as np

    from standardized_omop_data_etl_ray.stages.corpus import (
        weighted_topk_sample,
    )

    n = 2000
    # half the rows weigh 10x the other half
    w = np.where(np.arange(n) % 2 == 0, 100.0, 10.0)
    w[7] = 0.0      # excluded outright
    t = pa.table({"rid": pa.array(np.arange(n), pa.int64()),
                  "w": pa.array(w, pa.float64())})

    sets = []
    for parts in (1, 7):
        out = (
            weighted_topk_sample(
                rd.from_arrow(t).repartition(parts), "rid", "w", 300)
            .to_pandas()
        )
        assert len(out) == 300
        assert 7 not in set(out["rid"])
        sets.append(frozenset(out["rid"]))
    assert sets[0] == sets[1]  # partitioning-invariant

    heavy = sum(1 for r in sets[0] if r % 2 == 0)
    # E[heavy] >> 150 with 10x weights; this bound fails with
    # probability ~0 under correct weighting
    assert heavy > 180

    # k >= population returns everything with positive weight
    allr = weighted_topk_sample(rd.from_arrow(t), "rid", "w", 5000)
    assert allr.count() == n - 1


def test_grouped_weighted_topk_budget_and_invariance():
    """Exactly k per group, partitioning-invariant, heavier rows
    over-represented within each group, w<=0 excluded; a group smaller
    than k keeps all its (positive-weight) rows."""
    import numpy as np

    from standardized_omop_data_etl_ray.stages.corpus import (
        grouped_weighted_topk,
    )

    n = 1200
    grp = np.where(np.arange(n) < 1000, "big", "small")
    w = np.where(np.arange(n) % 2 == 0, 50.0, 5.0)
    w[2] = 0.0
    t = pa.table({
        "rid": pa.array(np.arange(n), pa.int64()),
        "g": pa.array(grp),
        "w": pa.array(w, pa.float64()),
    })

    sets = []
    for parts in (1, 5):
        out = (
            grouped_weighted_topk(
                rd.from_arrow(t).repartition(parts), "g", "rid", "w",
                150, num_buckets=3)
            .to_pandas()
        )
        assert (out.groupby("g").size()["big"]) == 150
        # 'small' has 200 rows (one zero-weight) → capped at 150
        assert (out.groupby("g").size()["small"]) == 150
        assert 2 not in set(out["rid"])
        sets.append(frozenset(out["rid"]))
    assert sets[0] == sets[1]

    big = sets[0] & set(range(1000))
    heavy = sum(1 for r in big if r % 2 == 0)
    assert heavy > 90  # 10x weights dominate the 150-budget

    # k larger than any group: everything with positive weight kept
    allr = grouped_weighted_topk(rd.from_arrow(t), "g", "rid", "w",
                                 5000, num_buckets=2)
    assert allr.count() == n - 1
