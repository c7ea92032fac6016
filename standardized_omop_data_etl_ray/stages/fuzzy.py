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
Python); candidate pairs form inside per-gram groups with a length
filter (|len_a − len_b| ≤ k); duplicates collapse in
``join_pair_sides``'s distinct pass, which also attaches both endpoint
strings through hash-bucket joins — the corpus is never broadcast; the
banded O(k·n) DP runs once per distinct candidate.  A stop-gram (one
shared by m strings) costs m²/2 candidates — the documented mitigation
at scale is the frequency order above, which pushes stop-grams out of
every prefix.
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
    from .dedup import join_pair_sides

    P = k * q + 1

    def prefix_grams(t: pa.Table) -> pa.Table:
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
                "slen": ln[m.to_numpy()],
            }))
        if not parts:
            return pa.table({"gram": pa.array([], pa.uint64()),
                             "id": pa.array([], pa.int64()),
                             "slen": pa.array([], pa.int64())})
        df = pd.concat(parts, ignore_index=True).drop_duplicates(
            ["id", "gram"])
        # deterministic global gram order: pandas 64-bit siphash with
        # its fixed default key — identical in every worker process
        df["gh"] = pd.util.hash_array(df["gram"].to_numpy(object))
        df = df.sort_values(["id", "gh"], ignore_index=True)
        df = df.groupby("id", sort=False).head(P)
        return pa.table({
            "gram": pa.array(df["gh"].to_numpy(), pa.uint64()),
            "id": pa.array(df["id"].to_numpy(), pa.int64()),
            "slen": pa.array(df["slen"].to_numpy(), pa.int64()),
        })

    grams = ds.select_columns([id_col, text_col]).map_batches(
        prefix_grams, batch_format="pyarrow")

    def pairs_in_gram(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("id", ignore_index=True)
        ids = g["id"].to_numpy()
        ln = g["slen"].to_numpy()
        ia, ib = np.triu_indices(len(ids), k=1)
        keep = np.abs(ln[ia] - ln[ib]) <= k
        return pd.DataFrame({"id_a": ids[ia[keep]],
                             "id_b": ids[ib[keep]]})

    cand = grams.groupby("gram").map_groups(
        pairs_in_gram, batch_format="pandas")

    sided = join_pair_sides(cand, ds.select_columns([id_col, text_col]),
                            id_col, text_col, num_buckets=num_buckets)

    def verify(t: pa.Table) -> pa.Table:
        a_ids = t.column("id_a").to_pylist()
        b_ids = t.column("id_b").to_pylist()
        va = t.column("value_a").to_pylist()
        vb = t.column("value_b").to_pylist()
        oa, ob, od = [], [], []
        for i in range(len(a_ids)):
            d = _lev_banded(va[i] or "", vb[i] or "", k)
            if d is not None:
                oa.append(a_ids[i])
                ob.append(b_ids[i])
                od.append(d)
        return pa.table({"id_a": pa.array(oa, pa.int64()),
                         "id_b": pa.array(ob, pa.int64()),
                         "dist": pa.array(od, pa.int64())})

    return sided.map_batches(verify, batch_format="pyarrow")
