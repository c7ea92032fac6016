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
