"""Corpus-level training-data operators: vocabulary building, document
chunking, deterministic stratified sampling.

These are the wide text-pipeline steps a 100 TB pretraining corpus
needs beyond per-document featurization (functions/text.py) and
near-dup removal (stages/dedup.py):

  * ``token_vocab`` — corpus-wide token frequencies, the classic
    word-count shape: tokenize + count LOCALLY per batch (the partial /
    combiner step), so the single groupby exchange moves one
    (token, n) row per distinct token per block instead of one row per
    token OCCURRENCE — at web scale that is the difference between
    shuffling ~the corpus and shuffling ~the vocabulary.
  * ``chunk_documents`` — fixed token-window chunking with
    deterministic (doc_id, chunk_idx) identity, the fan-out step that
    turns documents into training samples; pure per-batch map, no
    exchange, order-independent ids.
  * ``stratified_sample`` — per-stratum deterministic sampling by a
    content-independent hash of the id (md5 prefix), so a resumed or
    re-partitioned run keeps EXACTLY the same rows; no shuffle, no
    RNG state, reproducible across cluster sizes by construction.

Tokenization contract (shared with the SQL oracles in
``__ray_entry__``): whitespace tokens = ``trim(text)`` split on runs
of whitespace; the empty/whitespace-only document has NO tokens.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data as rd
from ray.data.aggregate import Sum


def _ws_tokens(texts: pd.Series) -> pd.Series:
    """Whitespace tokens per doc (empty doc → empty list) — the same
    definition as DuckDB ``string_split_regex(trim(text), '\\s+')``
    minus its ['']-for-empty artifact."""
    return texts.fillna("").str.strip().str.split()


def token_vocab(
    ds: rd.Dataset,
    text_col: str,
    top_k: int | None = None,
) -> rd.Dataset:
    """Corpus-wide token frequency (vocabulary building).

    Shape: per-batch tokenize + ``np.unique`` local count (partial
    aggregation — ≤1 row per distinct token per block enters the
    exchange), then one groupby-sum over tokens, then an optional
    global top-k (count desc, token asc — total order, so the cut is
    deterministic).  The top-k sort runs over the already-aggregated
    vocabulary, which is ≪ corpus-sized."""

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        toks = _ws_tokens(df[text_col])
        arrays = [np.asarray(t, dtype=object) for t in toks if len(t)]
        if not arrays:
            return pd.DataFrame({
                "token": pd.Series([], dtype=object),
                "n": pd.Series([], dtype="int64"),
            })
        u, c = np.unique(np.concatenate(arrays), return_counts=True)
        return pd.DataFrame({"token": u, "n": c.astype(np.int64)})

    agg = (
        ds.map_batches(partial, batch_format="pandas")
        .groupby("token")
        .aggregate(Sum("n", alias_name="n"))
    )
    if top_k is not None:
        agg = agg.sort(["n", "token"], descending=[True, False]).limit(top_k)
    return agg


def chunk_documents(
    ds: rd.Dataset,
    text_col: str,
    id_col: str,
    chunk_tokens: int = 64,
) -> rd.Dataset:
    """Split each document into fixed token windows — the
    document→training-sample fan-out.  Pure per-batch map (no exchange);
    chunk identity is (doc id, 0-based chunk index), deterministic under
    any partitioning.  Tokenless documents produce no chunks.

    Output: (id_col, chunk_idx, chunk_text, n_tokens)."""

    def fan_out(df: pd.DataFrame) -> pd.DataFrame:
        toks = _ws_tokens(df[text_col])
        ids_out: list = []
        idx_out: list[int] = []
        text_out: list[str] = []
        ntok_out: list[int] = []
        for doc_id, words in zip(df[id_col].to_numpy(), toks):
            for i in range(0, len(words), chunk_tokens):
                w = words[i : i + chunk_tokens]
                ids_out.append(doc_id)
                idx_out.append(i // chunk_tokens)
                text_out.append(" ".join(w))
                ntok_out.append(len(w))
        return pd.DataFrame({
            id_col: pd.Series(ids_out, dtype=df[id_col].dtype),
            "chunk_idx": pd.Series(idx_out, dtype="int64"),
            "chunk_text": pd.Series(text_out, dtype=object),
            "n_tokens": pd.Series(ntok_out, dtype="int64"),
        })

    return ds.map_batches(fan_out, batch_format="pandas")


def sample_threshold_hex(rate: float, digits: int = 4) -> str:
    """The md5-prefix threshold for a sampling rate: a row is kept when
    the first ``digits`` hex chars of md5(id) compare below it (string
    comparison — equal-length hex strings sort identically as text and
    as value).  Granularity is 16^digits (1/65536 at the default).
    Rate 1.0 returns ``"g"`` — a single char above 'f', so every hex
    digest sorts below it (a numeric ``16^digits`` rendered in hex
    would be LONGER than the digest and lexicographic comparison
    against it inverts: '8f3a' < '10000' is false as text)."""
    space = 16 ** digits
    q = min(space, max(0, round(rate * space)))
    if q >= space:
        return "g"
    return format(q, f"0{digits}x")


def stratified_sample(
    ds: rd.Dataset,
    id_col: str,
    strata_col: str,
    rates: dict[str, float],
    default_rate: float = 0.0,
    digits: int = 4,
) -> rd.Dataset:
    """Deterministic per-stratum sampling: keep a row iff the first
    ``digits`` hex chars of ``md5(str(id))`` are below the stratum's
    threshold.  Content-independent and partitioning-independent — the
    SAME rows survive on any cluster size, any resume, any block order
    (the property RNG-based ``random_sample`` cannot give) — and
    SQL-mirrorable exactly (DuckDB ``md5``).  The rates dict is
    closure-captured (dimension-sized; ship-once semantics)."""
    thresholds = {
        k: sample_threshold_hex(v, digits) for k, v in rates.items()
    }
    default_thr = sample_threshold_hex(default_rate, digits)

    def keep(t: pa.Table) -> pa.Table:
        from ..functions.hashing import _HAVE_DUCKDB, _con

        ids = t.column(id_col)
        sv = pa.table({"v": ids.cast(pa.string())})
        if _HAVE_DUCKDB:
            h = (
                _con()
                .execute(f"SELECT substr(md5(v), 1, {digits}) AS h FROM sv")
                .fetch_arrow_table()
                .column("h")
                .to_pylist()
            )
        else:  # pragma: no cover - duckdb is a baked-in dependency
            import hashlib

            h = [
                hashlib.md5(s.encode()).hexdigest()[:digits]
                for s in sv.column("v").to_pylist()
            ]
        strata = t.column(strata_col).to_pylist()
        thr = np.asarray(
            [thresholds.get(s, default_thr) for s in strata], dtype=object
        )
        mask = np.asarray(h, dtype=object) < thr
        return t.filter(pa.array(mask))

    return ds.map_batches(keep, batch_format="pyarrow")


def split_thresholds_hex(
    splits: list[tuple[str, float]], digits: int = 4
) -> list[tuple[str, str]]:
    """Cumulative md5-prefix thresholds for a multi-way split: a row
    belongs to the first split whose threshold its hex prefix compares
    below.  Same hex-vs-hex comparison contract as
    ``sample_threshold_hex`` (equal-length lowercase hex sorts as
    text exactly as it sorts as value); the LAST split's threshold is
    forced to ``"g"`` so the whole space is covered regardless of
    float rounding in the cumulative fractions."""
    out, cum = [], 0.0
    for i, (name, frac) in enumerate(splits):
        cum += frac
        thr = "g" if i == len(splits) - 1 else sample_threshold_hex(
            cum, digits
        )
        out.append((name, thr))
    return out


def split_assign(
    ds: rd.Dataset,
    id_col: str,
    splits: list[tuple[str, float]] = (
        ("train", 0.8), ("val", 0.1), ("test", 0.1)
    ),
    digits: int = 4,
    out_col: str = "split",
) -> rd.Dataset:
    """Deterministic train/val/test assignment by a content-independent
    hash of the id (md5 prefix, the ``stratified_sample`` contract):
    the SAME rows land in the same split on any cluster size, resume,
    or block order, and the rule is SQL-mirrorable exactly (DuckDB
    ``md5`` + a CASE over the same hex thresholds).  Pure per-batch
    map — no shuffle, no RNG state."""
    thrs = split_thresholds_hex(list(splits), digits)
    names = np.asarray([n for n, _ in thrs] + [thrs[-1][0]], dtype=object)
    bounds = np.asarray([t for _, t in thrs], dtype=object)

    def assign(t: pa.Table) -> pa.Table:
        from ..functions.hashing import _HAVE_DUCKDB, _con

        sv = pa.table({"v": t.column(id_col).cast(pa.string())})
        if _HAVE_DUCKDB:
            h = (
                _con()
                .execute(f"SELECT substr(md5(v), 1, {digits}) AS h FROM sv")
                .fetch_arrow_table()
                .column("h")
                .to_pylist()
            )
        else:  # pragma: no cover - duckdb is a baked-in dependency
            import hashlib

            h = [
                hashlib.md5(s.encode()).hexdigest()[:digits]
                for s in sv.column("v").to_pylist()
            ]
        idx = np.searchsorted(bounds, np.asarray(h, dtype=object),
                              side="right")
        return t.append_column(
            out_col, pa.array(names[idx], pa.string())
        )

    return ds.map_batches(assign, batch_format="pyarrow")


# PII patterns: RE2 syntax, shared verbatim by the Arrow kernels here
# and the DuckDB oracles (both engines are RE2-backed, so the same
# pattern string has the same semantics on both sides).
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("email",
     r"[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4",
     r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    ("phone",
     r"\+?\d[\d\- ]{7,}\d", "<PHONE>"),
]


def redact_pii(
    ds: rd.Dataset,
    text_col: str,
    out_col: str = "clean_text",
    count_cols: bool = True,
) -> rd.Dataset:
    """Scrub emails, IPv4 addresses and phone numbers from a text
    column (the pretraining privacy-hygiene pass) with vectorized RE2
    kernels — ``pc.count_substring_regex`` on the ORIGINAL text for
    per-doc counts, then ``pc.replace_substring_regex`` applied in
    ``PII_PATTERNS`` order (emails first so the phone pattern never
    eats an address's digit runs).  Pure per-batch map, no Python row
    loop, no shuffle."""
    import pyarrow.compute as pc

    def fn(t: pa.Table) -> pa.Table:
        text = t.column(text_col)
        cols = {}
        for name, pat, _ in PII_PATTERNS:
            if count_cols:
                cols[f"n_{name}"] = pc.cast(
                    pc.count_substring_regex(text, pat), pa.int64()
                )
        clean = text
        for _, pat, repl in PII_PATTERNS:
            clean = pc.replace_substring_regex(
                clean, pattern=pat, replacement=repl
            )
        out = t.append_column(out_col, clean)
        for k, v in cols.items():
            out = out.append_column(k, v)
        return out

    return ds.map_batches(fn, batch_format="pyarrow")


def _df_partial(text_col: str, sign: int = 1):
    """Per-batch document-frequency combiner: distinct tokens per doc,
    summed locally, emitted as (token, df·sign) rows — ≤1 row per
    distinct token per block through the groupby exchange.  Returns
    ARROW: Ray's sort-based groupby is ~10× slower over pandas blocks
    than Arrow blocks."""

    def partial(df: pd.DataFrame) -> pa.Table:
        toks = _ws_tokens(df[text_col])
        arrays = [np.unique(np.asarray(t, dtype=object))
                  for t in toks if len(t)]
        if not arrays:
            u = np.array([], dtype=object)
            c = np.array([], dtype=np.int64)
        else:
            u, c = np.unique(np.concatenate(arrays), return_counts=True)
        return pa.table({
            "token": pa.array(u, pa.string()),
            "df": pa.array(c.astype(np.int64) * sign, pa.int64()),
        })

    return partial


def doc_frequencies(ds: rd.Dataset, text_col: str, id_col: str) -> rd.Dataset:
    """Document frequency per token (each doc counted once): per-batch
    distinct-tokens-per-doc with a local combiner, so the exchange
    moves ≤1 (token, df) row per distinct token per block.  The final
    sum is a vectorized bucketed reduce — token cardinality ≈ the
    vocabulary, far too high for Ray's per-group aggregate step."""
    from .joins import bucketed_sum

    return bucketed_sum(
        ds.map_batches(_df_partial(text_col), batch_format="pandas"),
        ["token"], ["df"], combine=False,
        source_types={"token": pa.string(), "df": pa.int64()},
    )


def doc_frequency_delta(
    added: rd.Dataset,
    removed: rd.Dataset | None,
    text_col: str,
) -> rd.Dataset:
    """Signed document-frequency delta for a CDC batch of documents:
    +1 per distinct token per added doc, −1 per removed doc (a doc
    UPDATE is remove-old + add-new). Everything that moves is
    delta-vocabulary-sized — the corpus is never re-read."""
    parts = added.map_batches(_df_partial(text_col, 1),
                              batch_format="pandas")
    if removed is not None:
        parts = parts.union(
            removed.map_batches(_df_partial(text_col, -1),
                                batch_format="pandas")
        )
    from .joins import bucketed_sum

    return bucketed_sum(parts, ["token"], ["df"], combine=False,
                        source_types={"token": pa.string(),
                                      "df": pa.int64()})


def merge_doc_frequencies(
    committed: rd.Dataset, delta: rd.Dataset
) -> rd.Dataset:
    """Fold a signed df delta into a committed vocabulary table:
    one co-partitioning groupby over (committed ∪ delta) — both sides
    are vocabulary-sized (token, df) rows, never corpus-sized — and
    tokens whose count hits zero retire from the table, so repeated
    add/remove cycles cannot leak dead vocabulary rows.

    This is the incremental-TF-IDF maintenance step (ROADMAP #15): a
    vocabulary kept as a lake table is updated per CDC batch with
    ``merge_doc_frequencies(vocab, doc_frequency_delta(adds, drops))``
    instead of recomputing ``doc_frequencies`` over the full corpus."""
    import pyarrow.compute as pc

    from .joins import bucketed_sum

    merged = bucketed_sum(committed.union(delta), ["token"], ["df"],
                          combine=False,
                          source_types={"token": pa.string(),
                                        "df": pa.int64()})

    def live(t: pa.Table) -> pa.Table:
        return t.filter(pc.greater(t.column("df"), 0))

    return merged.map_batches(live, batch_format="pyarrow")


def tfidf_top_terms(
    ds: rd.Dataset,
    text_col: str,
    id_col: str,
    k: int = 3,
    n_docs: int | None = None,
    num_buckets: int | None = None,
) -> rd.Dataset:
    """Per-document top-k TF-IDF terms — the corpus-analytics shape
    that needs BOTH a corpus-wide pass (document frequencies) and a
    per-doc pass (term frequencies), joined back together.

    Scale shape: the df table is vocabulary-sized (pre-reduced per
    block before its one groupby); (doc_id, token, tf) rows join to it
    size-aware (broadcast while the vocabulary fits, partitioned hash
    join beyond — ``auto_hash_join``); the per-doc top-k runs inside
    one bucketed groupby.  Scores are ``round(tf · ln(n_docs/df), 6)``
    half-away-from-zero, ranked (score desc, token asc) — a total
    order, so the cut is deterministic and SQL-mirrorable."""
    from ..functions.rounding import round_half_away
    from .joins import auto_hash_join, bucketed_groupby

    if n_docs is None:
        n_docs = ds.count()
    dfreq = doc_frequencies(ds, text_col, id_col).materialize()
    vocab_rows = dfreq.count()

    def tf_rows(df: pd.DataFrame) -> pd.DataFrame:
        toks = _ws_tokens(df[text_col])
        ids_out, tok_out, tf_out = [], [], []
        for i, t in zip(df[id_col], toks):
            if not len(t):
                continue
            u, c = np.unique(np.asarray(t, dtype=object),
                             return_counts=True)
            ids_out.append(np.full(len(u), i, dtype=np.int64))
            tok_out.append(u)
            tf_out.append(c.astype(np.int64))
        if not ids_out:
            return pd.DataFrame({
                id_col: pd.Series([], dtype="int64"),
                "token": pd.Series([], dtype=object),
                "tf": pd.Series([], dtype="int64"),
            })
        return pd.DataFrame({
            id_col: np.concatenate(ids_out),
            "token": np.concatenate(tok_out),
            "tf": np.concatenate(tf_out),
        })

    tf = ds.map_batches(tf_rows, batch_format="pandas")
    joined = auto_hash_join(
        tf, dfreq, ["token"],
        right_rows=vocab_rows,
        left_schema=pa.schema([(id_col, pa.int64()),
                               ("token", pa.string()),
                               ("tf", pa.int64())]),
        right_schema=pa.schema([("token", pa.string()),
                                ("df", pa.int64())]),
        num_buckets=num_buckets or 32,
    )

    def score(t: pa.Table) -> pa.Table:
        tfv = t.column("tf").to_numpy(zero_copy_only=False).astype(np.float64)
        dfv = t.column("df").to_numpy(zero_copy_only=False).astype(np.float64)
        s = round_half_away(tfv * np.log(float(n_docs) / dfv), 6)
        return pa.table({
            id_col: t.column(id_col),
            "token": t.column("token"),
            "tfidf": pa.array(s, pa.float64()),
        })

    scored = joined.map_batches(score, batch_format="pyarrow")

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([id_col, "tfidf", "token"],
                          ascending=[True, False, True])
        g["rank"] = (g.groupby(id_col, sort=False).cumcount() + 1).astype(
            np.int64
        )
        return g[g["rank"] <= k]

    return bucketed_groupby(scored, [id_col], per_bucket, num_buckets)


def pack_sequences(
    ds: rd.Dataset,
    text_col: str,
    id_col: str,
    seq_tokens: int = 1024,
) -> rd.Dataset:
    """Training-sequence PACKING (the concat-and-cut step before
    pretraining): documents are concatenated in ``id_col`` order into
    one virtual token stream cut every ``seq_tokens`` tokens; each doc
    is assigned the sequence its FIRST token lands in and its offset
    within that sequence.  Docs may straddle a cut — that is the
    standard packing semantics (the loader re-reads the tail).

    Output: (id_col, n_tokens, seq_id, seq_offset) — exact,
    deterministic under any partitioning, and SQL-mirrorable as a
    window prefix-sum over ``id_col`` order.

    Scale shape: ONE global sort by id (the order contract), then the
    ``sequential_ids`` two-pass trick generalized from row counts to
    token counts — per-block token sums → driver prefix offsets
    (scalars, one per block) → vectorized in-block cumsum.  No second
    shuffle, no per-row driver work.  Block order is re-derived from
    each block's first/last id (``ordered_sorted_refs``), not from
    executor bundle order, which Ray does not guarantee with
    ``preserve_order`` off."""
    import ray

    from .aggregates import ordered_sorted_refs

    sorted_ds = ds.sort(id_col)
    refs = ordered_sorted_refs(sorted_ds, [id_col])

    @ray.remote
    def _tok_rows(t) -> pa.Table:
        if isinstance(t, pd.DataFrame):
            t = pa.Table.from_pandas(t, preserve_index=False)
        toks = _ws_tokens(t.column(text_col).to_pandas())
        n = toks.str.len().fillna(0).to_numpy().astype(np.int64)
        return pa.table({
            id_col: t.column(id_col),
            "n_tokens": pa.array(n, pa.int64()),
        })

    @ray.remote
    def _block_sum(t: pa.Table) -> int:
        import pyarrow.compute as pc

        return int(pc.sum(t.column("n_tokens")).as_py() or 0)

    @ray.remote
    def _assign(t: pa.Table, offset: int, cap: int) -> pa.Table:
        n = t.column("n_tokens").to_numpy(zero_copy_only=False)
        start = offset + np.concatenate([[0], np.cumsum(n)[:-1]])
        return pa.table({
            id_col: t.column(id_col),
            "n_tokens": t.column("n_tokens"),
            "seq_id": pa.array(start // cap, pa.int64()),
            "seq_offset": pa.array(start % cap, pa.int64()),
        })

    tok_refs = [_tok_rows.remote(r) for r in refs]
    sums = ray.get([_block_sum.remote(r) for r in tok_refs])
    offsets = np.concatenate([[0], np.cumsum(sums)[:-1]])
    out = [
        _assign.remote(r, int(off), int(seq_tokens))
        for r, off in zip(tok_refs, offsets)
    ]
    return rd.from_arrow_refs(out)


def deterministic_shuffle(
    ds: rd.Dataset, id_col: str, digits: int = 8, keep_key: bool = False
) -> rd.Dataset:
    """Deterministic global shuffle for training output: order by
    ``md5(str(id))`` — content-independent, partitioning-independent,
    reproducible across cluster sizes and resumes (the property an
    RNG-seeded ``random_shuffle`` cannot give), and SQL-mirrorable.
    One sort; the hash column is computed per batch and dropped unless
    ``keep_key`` — pass ``keep_key=True`` when a downstream step needs
    to recover the shuffle order from the data (e.g. enumeration via
    ``sequential_ids(order_cols=["__shuffle_key", id_col])``), since
    block order alone is not an order contract under Ray's default
    ``preserve_order = False``."""

    def add_h(t: pa.Table) -> pa.Table:
        from ..functions.hashing import _HAVE_DUCKDB, _con

        sv = pa.table({"v": t.column(id_col).cast(pa.string())})
        if _HAVE_DUCKDB:
            h = (
                _con()
                .execute(f"SELECT substr(md5(v), 1, {digits}) AS h FROM sv")
                .fetch_arrow_table().column("h")
            )
        else:  # pragma: no cover - duckdb is a baked-in dependency
            import hashlib

            h = pa.array([
                hashlib.md5(s.encode()).hexdigest()[:digits]
                for s in sv.column("v").to_pylist()
            ])
        return t.append_column("__shuffle_key", h)

    out = ds.map_batches(add_h, batch_format="pyarrow").sort(
        ["__shuffle_key", id_col]
    )
    return out if keep_key else out.drop_columns(["__shuffle_key"])


def cap_per_key(
    ds: rd.Dataset,
    key_col: str,
    rank_col: str,
    n: int,
    id_col: str,
    descending: bool = True,
    num_buckets: int | None = None,
) -> rd.Dataset:
    """Per-key quota (domain caps à la RefinedWeb): keep at most ``n``
    rows per ``key_col``, ranked by ``rank_col`` (ties broken by
    ``id_col`` asc — a total order, so the cut is deterministic and
    SQL-mirrorable as ``row_number() OVER (PARTITION BY key ORDER BY
    rank [DESC], id)``).

    Scale shape: keys co-locate by coarse hash bucket and every key in
    a bucket resolves in ONE vectorized pandas pass
    (``bucketed_groupby``) — hot keys cost sort-within-bucket, never a
    Python call per key."""
    from .joins import bucketed_groupby

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([key_col, rank_col, id_col],
                          ascending=[True, not descending, True])
        keep = g.groupby(key_col, sort=False).cumcount() < n
        return g[keep.to_numpy()]

    return bucketed_groupby(ds, [key_col], per_bucket, num_buckets)


def weighted_sample(
    ds: rd.Dataset, id_col: str, weight_col: str
) -> rd.Dataset:
    """Deterministic weighted (temperature) sampling — the domain-
    reweighting step of corpus mixing: keep a row with probability
    ``weight_col`` (clamped to [0, 1]), decided by comparing a
    content-independent 32-bit hash fraction of the id against the
    row's weight.  Like ``stratified_sample`` the decision is a pure
    function of (id, weight): the SAME rows survive on any cluster
    size, resume or partitioning, and the rule is SQL-mirrorable
    exactly (``CAST('0x' || substr(md5(id), 1, 8) AS BIGINT) <
    floor(weight * 2^32)``)."""

    def keep(t: pa.Table) -> pa.Table:
        from ..functions.hashing import _HAVE_DUCKDB, _con

        sv = pa.table({"v": t.column(id_col).cast(pa.string())})
        if _HAVE_DUCKDB:
            u = (
                _con()
                .execute(
                    "SELECT CAST(('0x' || substr(md5(v), 1, 8)) AS BIGINT)"
                    " AS u FROM sv"
                )
                .fetch_arrow_table().column("u")
                .to_numpy(zero_copy_only=False)
            )
        else:  # pragma: no cover - duckdb is a baked-in dependency
            import hashlib

            u = np.array([
                int(hashlib.md5(s.encode()).hexdigest()[:8], 16)
                for s in sv.column("v").to_pylist()
            ], dtype=np.int64)
        w = np.clip(
            t.column(weight_col).to_numpy(zero_copy_only=False)
            .astype(np.float64), 0.0, 1.0,
        )
        thr = np.floor(w * 4294967296.0)
        return t.filter(pa.array(u < thr))

    return ds.map_batches(keep, batch_format="pyarrow")


def _md5_u32(id_arr: pa.Array | pa.ChunkedArray) -> np.ndarray:
    """Deterministic 32-bit hash of the stringified id — the uniform
    source every hash-decided sampler shares (SQL mirror:
    ``CAST('0x' || substr(md5(CAST(id AS VARCHAR)), 1, 8) AS BIGINT)``)."""
    from ..functions.hashing import _HAVE_DUCKDB, _con

    sv = pa.table({"v": pa.chunked_array([id_arr]).cast(pa.string())
                   if not isinstance(id_arr, pa.ChunkedArray)
                   else id_arr.cast(pa.string())})
    if _HAVE_DUCKDB:
        return (
            _con()
            .execute(
                "SELECT CAST(('0x' || substr(md5(v), 1, 8)) AS BIGINT)"
                " AS u FROM sv"
            )
            .fetch_arrow_table().column("u")
            .to_numpy(zero_copy_only=False)
        )
    import hashlib  # pragma: no cover - duckdb is a baked-in dependency

    return np.array([
        int(hashlib.md5(s.encode()).hexdigest()[:8], 16)
        for s in sv.column("v").to_pylist()
    ], dtype=np.int64)


def weighted_topk_sample(
    ds: rd.Dataset, id_col: str, weight_col: str, k: int
) -> rd.Dataset:
    """Deterministic weighted sample of EXACTLY ``k`` rows WITHOUT
    replacement (Efraimidis–Spirakis A-Res, 2006): each row draws a
    deterministic uniform u from a 32-bit md5 fraction of its id and
    scores ``key = ln(u) / w``; the k LARGEST keys are the sample.
    Inclusion probabilities follow the weights; the result is a pure
    function of (id, weight) — identical on any cluster size, resume
    or partitioning, and SQL-mirrorable exactly (``ORDER BY
    ln((md5_u32 + 0.5)/2^32) / w DESC LIMIT k``).

    Complements :func:`weighted_sample` (Bernoulli keep-probability,
    variable output size): this is the fixed-budget form — "give me
    exactly k docs, length-weighted" — used for corpus subsampling to
    a token budget.

    Scale shape: per-block vectorized top-k partial (argpartition, ≤k
    rows per block survive) → ONE merge task over ≤ k·num_blocks
    candidate rows.  For k·blocks beyond one task's memory, chain a
    second partial level (tree merge) — same partial, documented
    rather than silently assumed.  Rows with w ≤ 0 or NULL are
    excluded (zero weight = zero inclusion probability)."""

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t.append_column("__es_key",
                                   pa.array([], pa.float64()))
        h = _md5_u32(t.column(id_col))
        w = (t.column(weight_col).to_numpy(zero_copy_only=False)
             .astype(np.float64))
        ok = np.isfinite(w) & (w > 0)
        key = np.full(len(w), -np.inf)
        key[ok] = np.log((h[ok] + 0.5) / 4294967296.0) / w[ok]
        t = t.append_column("__es_key", pa.array(key, pa.float64()))
        t = t.filter(pa.array(ok))
        if t.num_rows <= k:
            return t
        kk = t.column("__es_key").to_numpy()
        top = np.argpartition(-kk, k - 1)[:k]
        return t.take(pa.array(np.sort(top)))

    def final(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["__es_key", id_col],
                            ascending=[False, True], kind="mergesort")
        return df.head(k)

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .repartition(1)
        .map_batches(final, batch_format="pandas")
        .drop_columns(["__es_key"])
    )


def grouped_weighted_topk(
    ds: rd.Dataset,
    group_col: str,
    id_col: str,
    weight_col: str,
    k: int,
    num_buckets: int | None = None,
) -> rd.Dataset:
    """Per-GROUP fixed-budget weighted sample without replacement — the
    corpus-mixing primitive "exactly k docs from every domain,
    weight-proportional within the domain" (per-domain token budgets).
    Same deterministic Efraimidis–Spirakis key as
    :func:`weighted_topk_sample` (``ln(md5-uniform)/w``, k largest per
    group); rows with w ≤ 0 or NULL excluded.

    Scale shape: keys are computed in a map pass; groups co-locate by
    the ONE coarse-bucket exchange (``bucketed_groupby``) and every
    group in a bucket resolves in a single vectorized pandas pass
    (sort + grouped cumcount < k) — no Python per group, no global
    sort."""
    from .joins import bucketed_groupby

    def add_key(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t.append_column("__es_key",
                                   pa.array([], pa.float64()))
        h = _md5_u32(t.column(id_col))
        w = (t.column(weight_col).to_numpy(zero_copy_only=False)
             .astype(np.float64))
        ok = np.isfinite(w) & (w > 0)
        key = np.full(len(w), -np.inf)
        key[ok] = np.log((h[ok] + 0.5) / 4294967296.0) / w[ok]
        t = t.append_column("__es_key", pa.array(key, pa.float64()))
        return t.filter(pa.array(ok))

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([group_col, "__es_key", id_col],
                          ascending=[True, False, True],
                          kind="mergesort")
        keep = g.groupby(group_col, sort=False).cumcount() < k
        return g[keep.to_numpy()]

    out = bucketed_groupby(
        ds.map_batches(add_key, batch_format="pyarrow"),
        [group_col], per_bucket, num_buckets,
    )
    return out.drop_columns(["__es_key"])


def grouped_sequence(
    ds: rd.Dataset,
    key_cols: list[str],
    order_cols: list[str],
    value_col: str,
    sep: str = ",",
) -> rd.Dataset:
    """Per-key ORDERED event sequence folded to one delimited string —
    the behavioral-sequence builder a training-data pipeline uses for
    user journeys / session token streams (SQL ``string_agg(...
    ORDER BY ...)``).  ``order_cols`` must be a total order (include a
    unique tiebreaker) or tied rows may interleave nondeterministically.

    Shape: one groupby shuffle; the per-group fold is a pandas sort +
    join over that key's rows only.  Groups are user-sized — a single
    pathological key holding a corpus-scale history should be
    pre-capped (``cap_per_key``) upstream."""

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(order_cols)
        out = {k: [g[k].iloc[0]] for k in key_cols}
        out["seq"] = [sep.join(g[value_col].astype(str))]
        out["n"] = np.array([len(g)], dtype=np.int64)
        return pd.DataFrame(out)

    keys = key_cols[0] if len(key_cols) == 1 else key_cols
    return ds.select_columns(
        list(dict.fromkeys(key_cols + order_cols + [value_col]))
    ).groupby(keys).map_groups(fold, batch_format="pandas")
