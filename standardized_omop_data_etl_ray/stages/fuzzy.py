"""Edit-distance (Levenshtein) similarity self-join.

Distributed generalization of the reference's fuzzy matcher (SURVEY §2
M12 — `src/table_scripts/vital_signs--measurement.py`'s lenient value
matching): find all string pairs within edit distance ``k`` without the
all-pairs product, using ED-Join-style q-gram prefix blocking
(Xiao, Wang, Lin 2008) and a banded-DP verify with early abandon.

Blocking soundness: over the (q-1)-padded q-gram SET of a string, one
edit operation changes at most ``q`` distinct grams, so two strings
within distance ``k`` share all but at most ``k·q`` of either side's
grams.  By the prefix-filter theorem, the ``k·q + 1`` smallest grams of
each string under ANY fixed global order must then intersect — we order
by pandas' deterministic 64-bit siphash (stable across processes; a
frequency-ascending order is the classic efficiency upgrade and plugs
in here unchanged), so only strings sharing a prefix gram ever meet.

Scale shape: gram explode is vectorized per position (no per-row
Python); the short strings RIDE with their prefix-gram rows through
the one shuffle, so candidate pairs form AND verify inside coarse gram
buckets — no candidate-pair dataset, no join-back shuffle, corpus
never broadcast; the banded DP is vectorized across the pair axis and
runs once per distinct in-bucket candidate.  A stop-gram (one shared
by m strings) costs m²/2 candidates — the frequency order above pushes
stop-grams out of every prefix.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data as rd

_PAD_L = "\x01"
_PAD_R = "\x02"


def _lev_banded(a: str, b: str, k: int) -> int | None:
    """Levenshtein distance if ≤ k else None — banded DP, O(k·len),
    early abandon when a full band row exceeds k."""
    la, lb = len(a), len(b)
    if la > lb:
        a, b, la, lb = b, a, lb, la
    if lb - la > k:
        return None
    inf = k + 1
    prev = [j if j <= k else inf for j in range(lb + 1)]
    for i in range(1, la + 1):
        lo, hi = max(1, i - k), min(lb, i + k)
        cur = [inf] * (lb + 1)
        if i <= k:
            cur[0] = i
        best = inf
        ai = a[i - 1]
        for j in range(lo, hi + 1):
            d = prev[j - 1] + (ai != b[j - 1])
            pj = prev[j] + 1
            if pj < d:
                d = pj
            cj = cur[j - 1] + 1
            if cj < d:
                d = cj
            cur[j] = d
            if d < best:
                best = d
        if best > k:
            return None
        prev = cur
    return prev[lb] if prev[lb] <= k else None


def _lev_banded_batch(sa: list, sb: list, k: int) -> np.ndarray:
    """Banded Levenshtein for a BATCH of string pairs, vectorized over
    the pair axis: the i-loop runs max-length times and the j-loop a
    band width (2k+1), each step a numpy op over every pair at once —
    ~two orders of magnitude over the per-pair Python DP when
    candidates number in the hundreds of thousands.  Returns int32
    distances with k+1 meaning "> k"."""
    P = len(sa)
    inf = np.int32(k + 1)
    if P == 0:
        return np.empty(0, np.int32)
    la = np.fromiter((len(s) for s in sa), np.int64, P)
    lb = np.fromiter((len(s) for s in sb), np.int64, P)
    out = np.full(P, inf, np.int32)
    band_ok = np.abs(la - lb) <= k
    lmax = int(max(la.max(), lb.max(), 1))

    def to_mat(strs, lens, pad):
        """Vectorized char-code matrix: numpy's fixed-width unicode
        dtype IS a UCS-4 matrix — one C-side conversion for the whole
        batch (a per-string encode loop here was the measured
        bottleneck at millions of candidate pairs), then positions
        past each string's length get a side-distinct pad so pad
        never equals pad."""
        M = np.asarray(strs, dtype=f"U{lmax}").view(np.uint32)
        M = M.reshape(len(lens), lmax).astype(np.int32)
        M[np.arange(lmax)[None, :] >= lens[:, None]] = pad
        return M

    A = to_mat(sa, la, -1)
    B = to_mat(sb, lb, -2)
    prev = np.minimum(
        np.tile(np.arange(lmax + 1, dtype=np.int32), (P, 1)), inf)
    imax = int(la.max())
    for i in range(1, imax + 1):
        active = (i <= la)
        cur = np.full((P, lmax + 1), inf, np.int32)
        if i <= k:
            cur[:, 0] = i
        for j in range(max(1, i - k), min(lmax, i + k) + 1):
            sub = prev[:, j - 1] + (A[:, i - 1] != B[:, j - 1])
            d = np.minimum(np.minimum(sub, prev[:, j] + 1),
                           cur[:, j - 1] + 1)
            cur[:, j] = np.minimum(d, inf)
        prev = np.where(active[:, None], cur, prev)
    res = prev[np.arange(P), lb]
    np.copyto(out, res, where=band_ok)
    return out


def edit_distance_self_join(
    ds: rd.Dataset,
    text_col: str,
    id_col: str,
    k: int = 2,
    q: int = 2,
    num_buckets: int = 64,
) -> rd.Dataset:
    """All distinct pairs (id_a < id_b) whose ``text_col`` values are
    within Levenshtein distance ``k``.  Output: (id_a, id_b, dist)."""
    import ray

    from .joins import _cached_get

    P = k * q + 1
    # two consumers read the (id, string) projection — the frequency
    # pass and the prefix pass; materialize the narrow projection once
    # instead of re-executing the upstream lineage twice.  Contract: a
    # fuzzy-join key column is short strings, object-store-resident at
    # this operator's scale.
    ds = ds.select_columns([id_col, text_col]).materialize()

    def explode(t: pa.Table) -> pd.DataFrame:
        """Distinct (id, gram-hash, len) rows, vectorized per slice
        position — shared by the frequency pre-pass and the prefix
        selection."""
        s = t.column(text_col).to_pandas().fillna("")
        ids = t.column(id_col).to_numpy(zero_copy_only=False)
        padded = _PAD_L * (q - 1) + s + _PAD_R * (q - 1)
        ln = s.str.len().to_numpy()
        parts = []
        for off in range(int(padded.str.len().max() or 0) - q + 1):
            g = padded.str.slice(off, off + q)
            m = g.str.len() == q
            if not m.any():
                break
            parts.append(pd.DataFrame({
                "id": ids[m.to_numpy()], "gram": g[m].to_numpy(),
                "slen": ln[m.to_numpy()], "s": s[m].to_numpy(),
            }))
        if not parts:
            return pd.DataFrame(
                {"id": [], "gram": [], "slen": [], "s": []})
        df = pd.concat(parts, ignore_index=True).drop_duplicates(
            ["id", "gram"])
        # deterministic gram identity: pandas 64-bit siphash with its
        # fixed default key — identical in every worker process
        df["gh"] = pd.util.hash_array(df["gram"].to_numpy(object))
        return df

    # ---- pass 1: global gram document-frequencies ------------------
    # the prefix-filter theorem holds under ANY fixed global order;
    # frequency-ASCENDING is the ED-Join order that keeps stop-grams
    # (shared by thousands of strings → m²/2 candidates each) out of
    # every prefix.  The doc-frequency table is vocab-sized (|Σ|^q
    # bounded) — broadcast once; at corpus scale estimate it from a
    # sample instead (any consistent order stays CORRECT, frequencies
    # only tune candidate count).
    def gram_counts(t: pa.Table) -> pa.Table:
        df = explode(t)
        c = df.groupby("gh", sort=False).size()
        return pa.table({
            "gh": pa.array(c.index.to_numpy(np.uint64), pa.uint64()),
            "c": pa.array(c.to_numpy(np.int64), pa.int64()),
        })

    from .joins import bucketed_agg

    # vocab-cardinality reduce: Ray's aggregate pays per-group Python
    # (~50k distinct 3-grams at 10k strings) — use the vectorized
    # bucketed reduce instead (measured 2× on the whole join)
    freq_pd = bucketed_agg(
        ds.map_batches(gram_counts, batch_format="pyarrow"),
        ["gh"], {"c": ("c", "sum")}, combine=False,
    ).to_pandas()
    gh_np = freq_pd["gh"].to_numpy(np.uint64)
    order = np.argsort(gh_np)
    fkeys = gh_np[order]
    fvals = freq_pd["c"].to_numpy(np.int64)[order]
    fref = ray.put((fkeys, fvals))

    # ---- pass 2: per-string prefix = the P RAREST grams ------------
    # fuzzy-join strings are SHORT, so the string itself rides with
    # its P prefix-gram rows (≤ P × len(s) bytes through the one
    # shuffle) and verification happens INSIDE the gram bucket — no
    # candidate-pair dataset, no join-back shuffle.  Measured at
    # sf0.1's low-diversity corpus (608 distinct 3-grams → 6.9M
    # distinct blocking candidates for 10.7k true pairs): 48 s (first
    # version: per-gram Ray groups + join-back + per-pair Python DP)
    # → 9.6 s warm (in-bucket verify + batched vectorized DP + C-side
    # string-matrix fill + pre-DP pair dedup).
    def prefix_grams(t: pa.Table) -> pa.Table:
        df = explode(t)
        if not len(df):
            return pa.table({
                "gram": pa.array([], pa.uint64()),
                "bucket": pa.array([], pa.int32()),
                "id": pa.array([], pa.int64()),
                "slen": pa.array([], pa.int64()),
                "s": pa.array([], pa.string()),
            })
        keys, vals = _cached_get(fref)
        pos = np.searchsorted(keys, df["gh"].to_numpy(np.uint64))
        df["freq"] = vals[pos]
        # rarest first; gram hash breaks frequency ties
        df = df.sort_values(["id", "freq", "gh"], ignore_index=True)
        df = df.groupby("id", sort=False).head(P)
        gh = df["gh"].to_numpy(np.uint64)
        return pa.table({
            "gram": pa.array(gh, pa.uint64()),
            # coarse buckets: verification groups by THESE (one Ray
            # group per bucket) and segments by gram inside — Ray's
            # per-group Python cost is paid ~num_buckets times, not
            # once per distinct gram (the simhash coarse-self-merge
            # pattern)
            "bucket": pa.array((gh % np.uint64(num_buckets))
                               .astype(np.int32)),
            "id": pa.array(df["id"].to_numpy(), pa.int64()),
            "slen": pa.array(df["slen"].to_numpy(), pa.int64()),
            "s": pa.array(df["s"].to_numpy(object), pa.string()),
        })

    grams = ds.map_batches(prefix_grams, batch_format="pyarrow")

    CHUNK = 262_144  # pairs per batch-DP call: bounds the temporaries

    def verify_bucket(g: pd.DataFrame) -> pd.DataFrame:
        gh = g["gram"].to_numpy(np.uint64)
        order = np.lexsort((g["id"].to_numpy(), gh))
        gh = gh[order]
        ids = g["id"].to_numpy()[order]
        ln = g["slen"].to_numpy()[order]
        ss = g["s"].to_numpy(object)[order]
        starts = np.flatnonzero(np.r_[True, gh[1:] != gh[:-1]])
        sizes = np.diff(np.r_[starts, len(gh)])
        cia, cib = [], []
        for s0, m in zip(starts[sizes > 1], sizes[sizes > 1]):
            ia, ib = np.triu_indices(int(m), k=1)
            keep = np.abs(ln[s0 + ia] - ln[s0 + ib]) <= k
            cia.append(s0 + ia[keep])
            cib.append(s0 + ib[keep])
        if not cia:
            return pd.DataFrame({"id_a": np.empty(0, np.int64),
                                 "id_b": np.empty(0, np.int64),
                                 "dist": np.empty(0, np.int64)})
        ia = np.concatenate(cia)
        ib = np.concatenate(cib)
        # same (id_a, id_b) arises once per shared prefix gram in this
        # bucket — dedup BEFORE the DP pays for itself immediately
        a64 = ids[ia].astype(np.uint64)
        b64 = ids[ib].astype(np.uint64)
        if len(ia) and max(a64.max(), b64.max()) < (1 << 32):
            _, uidx = np.unique((a64 << np.uint64(32)) | b64,
                                return_index=True)
        else:
            _, uidx = np.unique(np.stack([a64, b64], 1), axis=0,
                                return_index=True)
        ia, ib = ia[uidx], ib[uidx]
        oa, ob, od = [], [], []
        for c0 in range(0, len(ia), CHUNK):
            ca, cb = ia[c0:c0 + CHUNK], ib[c0:c0 + CHUNK]
            d = _lev_banded_batch(list(ss[ca]), list(ss[cb]), k)
            keep = d <= k
            oa.append(ids[ca[keep]])
            ob.append(ids[cb[keep]])
            od.append(d[keep].astype(np.int64))
        return pd.DataFrame({"id_a": np.concatenate(oa),
                             "id_b": np.concatenate(ob),
                             "dist": np.concatenate(od)})

    verified = grams.groupby("bucket").map_groups(
        verify_bucket, batch_format="pandas")

    # the same true pair can verify under several shared prefix grams
    # (and in several buckets) — a coarse-bucketed distinct collapses
    # it (per-PAIR groups would pay Ray's group overhead once per
    # result row; per-bucket drop_duplicates pays it num_buckets times)
    def add_pb(t: pa.Table) -> pa.Table:
        a = t.column("id_a").to_numpy(zero_copy_only=False)
        b = t.column("id_b").to_numpy(zero_copy_only=False)
        pb = ((a.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)
               ^ b.astype(np.uint64)) % np.uint64(num_buckets))
        return t.append_column("pb", pa.array(pb.astype(np.int32)))

    def distinct_pairs(g: pd.DataFrame) -> pd.DataFrame:
        return g.drop_duplicates(["id_a", "id_b"]).drop(columns=["pb"])

    return verified.map_batches(add_pb, batch_format="pyarrow").groupby(
        "pb").map_groups(distinct_pairs, batch_format="pandas")


def set_similarity_self_join(
    ds: rd.Dataset,
    text_col: str,
    id_col: str,
    tau: float,
    shingle_k: int = 3,
    num_buckets: int | None = None,
) -> rd.Dataset:
    """EXACT-COMPLETE set-similarity self-join (PPJoin-lite, Xiao et
    al. 2008): all document pairs whose k-token-shingle SETS have
    Jaccard ≥ τ — with NO false negatives, the guarantee the
    MinHash-LSH path (`dedup.minhash_candidate_pairs`) trades away.
    Output: (id_a, id_b, inter, n_a, n_b, jaccard), id_a < id_b.

    Blocking: prefix filter — under any fixed total order over
    shingles, two sets with J ≥ τ must share a shingle inside each
    side's first ``p = n − ⌈τ·n⌉ + 1`` elements (here hash order —
    process-stable; frequency-ascending order is the documented
    production upgrade, same trade as edit_distance_self_join).
    Candidates also pass the length filter min(n)/max(n) ≥ τ before
    verification.

    Scale shape: ONE shuffle — prefix-shingle rows ride with each
    doc's full sorted hash-set payload (in-bucket verify, the ED-join
    round-4i lesson: candidate pairs never materialize as a dataset
    and no join-back shuffle exists); per bucket, pair generation and
    the length filter are vectorized, duplicate candidates collapse
    before verification, and verification itself is FULLY vectorized
    (round-5 upgrade from per-pair ``np.intersect1d`` dispatch): all
    candidate pairs' hash sets explode into one (pair, hash) frame
    whose duplicates after a single C-speed lexsort ARE the
    intersection counts, chunked at ~2M exploded elements so per-task
    memory stays bounded at any candidate count.  A final pair-hash
    distinct collapses pairs that met in several buckets.
    Jaccard = i/(na+nb−i) is exact integer division — bit-identical
    to any SQL engine, so τ-boundary pairs cannot flip."""
    import math

    from .corpus import _ws_tokens
    from .dedup import _doc_window_hashes, _window_pows, pair_distinct
    from .joins import bucketed_groupby

    kk = int(shingle_k)
    pows = _window_pows(kk)

    def prefix_rows(df: pd.DataFrame) -> pd.DataFrame:
        toks = _ws_tokens(df[text_col])
        out_h, out_id, out_n, out_pay = [], [], [], []
        for did, t in zip(df[id_col], toks):
            if len(t) < kk:
                continue
            # vectorized shingle hashing (equal shingle strings ⟺
            # equal hashes), shared with dedup.dup_span_stats
            hs = np.unique(_doc_window_hashes(t, kk, pows))
            n = len(hs)
            # robust ⌈τ·n⌉: when τ·n is mathematically integral the FP
            # product can round UP (τ=0.55, n=100 → 55.000…01 → ceil
            # 56), shortening the prefix by one and producing a false
            # negative the verify step never sees (ADVICE r4).  The
            # epsilon only ever LENGTHENS the prefix — candidates it
            # adds are removed by the exact j ≥ τ verification.
            p = n - math.ceil(tau * n - 1e-9) + 1
            pay = hs.tobytes()
            out_h.append(hs[:p])
            out_id.append(np.full(p, did, np.int64))
            out_n.append(np.full(p, n, np.int64))
            out_pay.extend([pay] * p)
        if not out_h:
            return pd.DataFrame({
                "ph": pd.Series([], dtype="uint64"),
                id_col: pd.Series([], dtype="int64"),
                "n": pd.Series([], dtype="int64"),
                "payload": pd.Series([], dtype=object),
            })
        return pd.DataFrame({
            "ph": np.concatenate(out_h),
            id_col: np.concatenate(out_id),
            "n": np.concatenate(out_n),
            "payload": pd.Series(out_pay, dtype=object),
        })

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({
            "id_a": pd.Series([], dtype="int64"),
            "id_b": pd.Series([], dtype="int64"),
            "inter": pd.Series([], dtype="int64"),
            "n_a": pd.Series([], dtype="int64"),
            "n_b": pd.Series([], dtype="int64"),
            "jaccard": pd.Series([], dtype="float64"),
        })
        g = g.drop_duplicates([
            "ph", id_col])  # same prefix shingle twice per doc: never
        sizes = g.groupby("ph")["ph"].transform("size")
        g = g[sizes >= 2]
        if g.empty:
            return empty
        # vectorized pair gen per shared shingle: sort by (ph, id),
        # pair every row with every LATER row of its group via
        # segment offsets
        g = g.sort_values(["ph", id_col], ignore_index=True)
        grp = g.groupby("ph", sort=False)
        cnt = grp[id_col].transform("size").to_numpy()
        cc = grp.cumcount().to_numpy()
        starts = np.arange(len(g)) - cc
        # row i pairs with rows (i+1 .. start+cnt-1)
        reps = (starts + cnt) - np.arange(len(g)) - 1
        ia = np.repeat(np.arange(len(g)), reps)
        offs = np.concatenate([np.arange(1, r + 1) for r in reps if r > 0]) \
            if reps.sum() else np.array([], np.int64)
        ib = ia + offs
        if not len(ia):
            return empty
        ids = g[id_col].to_numpy()
        ns = g["n"].to_numpy()
        na, nb = ns[ia], ns[ib]
        lo, hi = np.minimum(na, nb), np.maximum(na, nb)
        # epsilon-relaxed length filter: a pair with lo/hi EXACTLY τ
        # must survive to verification (same FP rounding hazard as the
        # prefix length above; the exact j ≥ τ check is the gate)
        keep = (ids[ia] != ids[ib]) & (lo >= tau * hi - 1e-9)
        ia, ib = ia[keep], ib[keep]
        if not len(ia):
            return empty
        # orient id_a < id_b, dedup candidates arising from several
        # shared prefix shingles in this bucket
        a_ids, b_ids = ids[ia], ids[ib]
        swap = a_ids > b_ids
        ia2 = np.where(swap, ib, ia)
        ib2 = np.where(swap, ia, ib)
        cand = pd.DataFrame({"ia": ia2, "ib": ib2}).drop_duplicates()
        pays = g["payload"].to_numpy()
        # decode each row's payload ONCE (np.frombuffer is a zero-copy
        # view), concatenate to one flat hash array with offsets —
        # per-pair slices become fancy-indexed ranges
        row_arrays = [np.frombuffer(p, dtype=np.uint64) for p in pays]
        lens = np.fromiter((len(a) for a in row_arrays), np.int64,
                           count=len(row_arrays))
        flat = np.concatenate(row_arrays) if len(row_arrays) \
            else np.array([], np.uint64)
        offsets = np.concatenate([[0], np.cumsum(lens)])

        def _ranges(starts: np.ndarray, lengths: np.ndarray) -> np.ndarray:
            # [s0..s0+l0) ⧺ [s1..s1+l1) ⧺ …, fully vectorized
            total = int(lengths.sum())
            if not total:
                return np.array([], np.int64)
            ends = np.cumsum(lengths)
            idx = np.arange(total)
            rel = idx - np.repeat(ends - lengths, lengths)
            return np.repeat(starts, lengths) + rel

        # FULLY VECTORIZED pair verification (the round-4 disclosed
        # upgrade): instead of a Python np.intersect1d call per pair,
        # explode every candidate pair's two (sorted, unique) hash
        # sets into one (pair, hash) frame and count duplicates after
        # a single C-speed lexsort — a (pair, hash) key appearing
        # twice is exactly one intersection hit.  Chunked so the
        # exploded frame stays ~2M elements regardless of candidate
        # count (per-task memory bound).
        ra_all = cand["ia"].to_numpy()
        rb_all = cand["ib"].to_numpy()
        parts_out = []
        CHUNK_ELEMS = 2_000_000
        pos = 0
        while pos < len(ra_all):
            # grow the chunk until the exploded size cap
            sizes = lens[ra_all[pos:]] + lens[rb_all[pos:]]
            csum = np.cumsum(sizes)
            take = max(1, int(np.searchsorted(csum, CHUNK_ELEMS)))
            ra = ra_all[pos:pos + take]
            rb = rb_all[pos:pos + take]
            pos += take
            la, lb = lens[ra], lens[rb]
            # interleave (a-range, b-range) per pair
            starts = np.empty(2 * len(ra), np.int64)
            starts[0::2] = offsets[ra]
            starts[1::2] = offsets[rb]
            lengths = np.empty(2 * len(ra), np.int64)
            lengths[0::2] = la
            lengths[1::2] = lb
            gidx = _ranges(starts, lengths)
            vals = flat[gidx]
            pair_rep = np.repeat(
                np.repeat(np.arange(len(ra)), 2), lengths)
            order = np.lexsort((vals, pair_rep))
            pr, vv = pair_rep[order], vals[order]
            dup = (pr[1:] == pr[:-1]) & (vv[1:] == vv[:-1])
            inter = np.bincount(pr[1:][dup], minlength=len(ra))
            un = la + lb - inter
            j = inter / un
            ok = j >= tau
            if ok.any():
                parts_out.append(pd.DataFrame({
                    "id_a": ids[ra[ok]].astype(np.int64),
                    "id_b": ids[rb[ok]].astype(np.int64),
                    "inter": inter[ok].astype(np.int64),
                    "n_a": la[ok].astype(np.int64),
                    "n_b": lb[ok].astype(np.int64),
                    "jaccard": j[ok].astype(np.float64),
                }))
        if not parts_out:
            return empty
        return pd.concat(parts_out, ignore_index=True)

    pref = ds.map_batches(prefix_rows, batch_format="pandas")
    verified = bucketed_groupby(pref, ["ph"], per_bucket, num_buckets)
    return pair_distinct(verified)
