"""Edit-distance similarity join: blocking soundness vs brute force."""

import itertools

import numpy as np
import pyarrow as pa
import ray.data as rd

from standardized_omop_data_etl_ray.stages.fuzzy import (
    _lev_banded,
    edit_distance_self_join,
)


def _full_lev(a: str, b: str) -> int:
    la, lb = len(a), len(b)
    prev = list(range(lb + 1))
    for i in range(1, la + 1):
        cur = [i] + [0] * lb
        for j in range(1, lb + 1):
            cur[j] = min(prev[j] + 1, cur[j - 1] + 1,
                         prev[j - 1] + (a[i - 1] != b[j - 1]))
        prev = cur
    return prev[lb]


def test_lev_banded_agrees_with_full_dp():
    rng = np.random.default_rng(7)
    alpha = "abcd"
    for _ in range(300):
        la, lb = rng.integers(0, 10, 2)
        a = "".join(rng.choice(list(alpha), la))
        b = "".join(rng.choice(list(alpha), lb))
        for k in (0, 1, 2, 3):
            d = _full_lev(a, b)
            got = _lev_banded(a, b, k)
            assert got == (d if d <= k else None), (a, b, k)


def test_edit_distance_self_join_matches_brute_force():
    rng = np.random.default_rng(19)
    base = ["".join(rng.choice(list("abcdef"), 10)) for _ in range(60)]
    # planted families: deletions, substitutions, transposed-ish
    strings = list(base)
    strings += [s[1:] for s in base[:10]]           # dist 1
    strings += [s[:4] + "z" + s[5:] for s in base[10:20]]  # dist 1
    strings += [s + "xy" for s in base[20:25]]      # dist 2
    tbl = pa.table({
        "sid": pa.array(range(len(strings)), pa.int64()),
        "s": pa.array(strings, pa.string()),
    })
    k = 2
    got = (
        edit_distance_self_join(
            rd.from_arrow(tbl).repartition(5), "s", "sid", k=k)
        .to_pandas().sort_values(["id_a", "id_b"], ignore_index=True)
    )
    want = sorted(
        (i, j, _full_lev(strings[i], strings[j]))
        for i, j in itertools.combinations(range(len(strings)), 2)
        if _full_lev(strings[i], strings[j]) <= k
    )
    assert list(map(tuple, got.to_numpy())) == want
    assert (got["dist"] <= k).all()


def test_lev_banded_batch_agrees_with_scalar():
    from standardized_omop_data_etl_ray.stages.fuzzy import _lev_banded_batch

    rng = np.random.default_rng(3)
    alpha = "abcde"
    for k in (1, 2, 3):
        sa, sb, want = [], [], []
        for _ in range(400):
            la, lb = rng.integers(0, 14, 2)
            a = "".join(rng.choice(list(alpha), la))
            b = "".join(rng.choice(list(alpha), lb))
            sa.append(a)
            sb.append(b)
            d = _full_lev(a, b)
            want.append(d if d <= k else k + 1)
        got = _lev_banded_batch(sa, sb, k)
        assert got.tolist() == want, k


def test_set_similarity_self_join_complete_vs_brute_force():
    """Planted families (identical twin, half-overlap, disjoint) plus
    a randomized corpus checked pair-for-pair against the O(n²)
    brute force — completeness (no false negatives) is the claim."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from standardized_omop_data_etl_ray.stages.fuzzy import (
        set_similarity_self_join,
    )

    rng = np.random.default_rng(41)
    vocab = [f"w{i}" for i in range(60)]
    rows = []
    for i in range(80):
        n = int(rng.integers(8, 25))
        rows.append({"doc_id": i,
                     "text": " ".join(rng.choice(vocab, n))})
    # planted twin + near-twin (one token appended)
    rows.append({"doc_id": 900, "text": rows[0]["text"]})
    rows.append({"doc_id": 901, "text": rows[0]["text"] + " zz"})
    df = pd.DataFrame(rows)
    TAU, K = 0.4, 3

    def shingles(t):
        w = t.split()
        return {" ".join(w[i:i + K]) for i in range(len(w) - K + 1)} \
            if len(w) >= K else set()

    want = set()
    sh = {r["doc_id"]: shingles(r["text"]) for r in rows}
    for a in sh:
        for b in sh:
            if a < b and sh[a] and sh[b]:
                i = len(sh[a] & sh[b])
                if i / (len(sh[a]) + len(sh[b]) - i) >= TAU:
                    want.add((a, b))
    assert (0, 900) in want and (0, 901) in want  # planted pairs exist

    for parts in (1, 5):
        got = (
            set_similarity_self_join(
                rd.from_arrow(pa.Table.from_pandas(df)).repartition(parts),
                "text", "doc_id", tau=TAU, shingle_k=K, num_buckets=4)
            .to_pandas()
        )
        assert set(zip(got["id_a"], got["id_b"])) == want
        tw = got[(got["id_a"] == 0) & (got["id_b"] == 900)]
        assert tw["jaccard"].iloc[0] == 1.0


def test_set_similarity_tau_boundary_pair_survives():
    """ADVICE r4: τ=0.55 with J EXACTLY 0.55 (inter=55, union=100) used
    to be a false negative — the FP product 0.55*100 = 55.000…01 failed
    the length filter, and ceil(τ·n) over-shot the prefix length by
    one.  The epsilon-robust thresholds must keep the pair (verified by
    the exact j ≥ τ check)."""
    import math

    import pandas as pd

    from standardized_omop_data_etl_ray.stages.fuzzy import (
        set_similarity_self_join,
    )

    # 0.55*100 rounds UP in IEEE floats — this n actually triggers both
    # hazards (smaller integral products like 0.55*20 happen to round
    # to exactly 11.0 and never did)
    assert 0.55 * 100 > 55 and math.ceil(0.55 * 100) == 56

    # distinct tokens: doc B = t0..t101 → 100 3-shingles; doc A =
    # t0..t56 → 55 shingles, all ⊂ B's.  J = 55 / 100 = 0.55 exactly.
    toks = [f"t{i}" for i in range(102)]
    df = pd.DataFrame({
        "doc_id": [1, 2],
        "text": [" ".join(toks[:57]), " ".join(toks)],
    })
    got = (
        set_similarity_self_join(
            rd.from_arrow(pa.Table.from_pandas(df)), "text", "doc_id",
            tau=0.55, shingle_k=3, num_buckets=2)
        .to_pandas()
    )
    assert len(got) == 1
    assert (got["id_a"].iloc[0], got["id_b"].iloc[0]) == (1, 2)
    assert got["inter"].iloc[0] == 55
    assert got["jaccard"].iloc[0] == 55 / 100
