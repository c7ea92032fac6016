"""Incremental materialized JOIN views (stages/incremental.py):
maintenance from the two sides' change sets must equal a from-scratch
re-join of the post-change states — including fk migrations, dimension
deletes/re-inserts, both sides changing in the same epoch (the dA⋈dB
correction term), null join keys (inner semantics), and the
full-fold fallback path."""

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from standardized_omop_data_etl_ray.stages.incremental import (
    IncJoinSpec,
    apply_join_change_sets,
    build_join_view,
    empty_join_view,
)

SPEC = IncJoinSpec(
    left_key=["doc_id"],
    right_key=["lang"],
    on="lang",
    left_cols=["lang", "chars"],
    right_cols=["code", "weight"],
)

LANGS = ["en", "de", "fr", "ja", "ko"]


def _docs(seed: int, n: int = 300) -> pd.DataFrame:
    rng = np.random.default_rng(seed)
    df = pd.DataFrame({
        "doc_id": np.arange(n, dtype=np.int64),
        "lang": rng.choice(LANGS[:4], n),
        "chars": rng.integers(1, 10_000, n).astype("int64"),
    })
    df.loc[df.index % 23 == 0, "lang"] = None  # null fk: never joins
    df["chars"] = df["chars"].astype("Int64")
    df.loc[df.index % 17 == 0, "chars"] = None
    return df


def _dims(version: int, langs=tuple(LANGS[:4])) -> pd.DataFrame:
    return pd.DataFrame({
        "lang": list(langs),
        "code": [f"{l.upper()}_v{version}" for l in langs],
        "weight": np.arange(len(langs), dtype=np.float64) + version,
    })


def _cs(old: pd.DataFrame, new: pd.DataFrame, key: str,
        cols: list[str]) -> pd.DataFrame:
    """Key-level diff in the epoch_change_set row contract."""
    j = old.merge(new, on=key, how="outer", suffixes=("_o", "_n"),
                  indicator=True)
    rows = []
    for _, r in j.iterrows():
        if r["_merge"] == "left_only":
            rows.append(("deleted", r[key],
                         *[r[f"{c}_o"] for c in cols],
                         *[None for _ in cols]))
        elif r["_merge"] == "right_only":
            rows.append(("added", r[key],
                         *[None for _ in cols],
                         *[r[f"{c}_n"] for c in cols]))
        else:
            rows.append(("updated", r[key],
                         *[r[f"{c}_o"] for c in cols],
                         *[r[f"{c}_n"] for c in cols]))
    return pd.DataFrame(
        rows,
        columns=["change", key, *[f"old_{c}" for c in cols],
                 *[f"new_{c}" for c in cols]],
    )


def _expected(docs: pd.DataFrame, dims: pd.DataFrame) -> pd.DataFrame:
    out = docs.dropna(subset=["lang"]).merge(dims, on="lang", how="inner")
    return out[["doc_id", "lang", "chars", "code", "weight"]].sort_values(
        "doc_id", ignore_index=True
    )


def _got(view) -> pd.DataFrame:
    df = view.to_pandas().sort_values("doc_id", ignore_index=True)
    df["chars"] = df["chars"].astype("Int64")
    return df[["doc_id", "lang", "chars", "code", "weight"]]


def _check(view, docs, dims):
    got, want = _got(view), _expected(docs, dims)
    want["chars"] = want["chars"].astype("Int64")
    pd.testing.assert_frame_equal(got, want)


def test_build_matches_pandas():
    docs, dims = _docs(0), _dims(0)
    view = build_join_view(
        rd.from_pandas(docs), rd.from_pandas(dims), SPEC, right_rows=len(dims)
    ).materialize()
    _check(view, docs, dims)


def _mutate_docs(old: pd.DataFrame, seed: int,
                 ins_base: int = 1000) -> pd.DataFrame:
    rng = np.random.default_rng(seed)
    new = old.copy()
    drop = new["doc_id"].to_numpy()[:30]                   # deletes
    new = new[~new["doc_id"].isin(drop)]
    upd = new["doc_id"] % 7 == 3                           # value updates
    new.loc[upd, "chars"] = rng.integers(1, 500, int(upd.sum()))
    mig = new["doc_id"] % 11 == 5                          # fk migrations
    new.loc[mig, "lang"] = "ko"
    nulled = new["doc_id"] % 13 == 6                       # fk → null
    new.loc[nulled, "lang"] = None
    ins = pd.DataFrame({                                   # inserts
        "doc_id": np.arange(ins_base, ins_base + 40, dtype=np.int64),
        "lang": ["ko"] * 20 + ["en"] * 20,
        "chars": pd.array(rng.integers(1, 100, 40), dtype="Int64"),
    })
    return pd.concat([new, ins], ignore_index=True)


def test_maintenance_equals_rebuild_both_sides():
    docs0, dims0 = _docs(1), _dims(0)
    view = build_join_view(
        rd.from_pandas(docs0), rd.from_pandas(dims0), SPEC,
        right_rows=len(dims0),
    ).materialize()

    # epoch 1: BOTH sides change — docs churn; dim payloads update,
    # 'de' is deleted (all its pairs must leave), 'ko' appears (the fk
    # migrations above land on it the same epoch: dA⋈dB is load-bearing)
    docs1 = _mutate_docs(docs0, 2)
    dims1 = _dims(1, langs=("en", "fr", "ja", "ko"))
    view = apply_join_change_sets(
        view, SPEC,
        rd.from_pandas(_cs(docs0, docs1, "doc_id", ["lang", "chars"])),
        rd.from_pandas(_cs(dims0, dims1, "lang", ["code", "weight"])),
        rd.from_pandas(docs1), rd.from_pandas(dims1),
    ).materialize()
    _check(view, docs1, dims1)

    # epoch 2: 'de' re-inserted, docs churn again
    docs2 = _mutate_docs(docs1, 3, ins_base=2000)
    dims2 = _dims(2)
    view = apply_join_change_sets(
        view, SPEC,
        rd.from_pandas(_cs(docs1, docs2, "doc_id", ["lang", "chars"])),
        rd.from_pandas(_cs(dims1, dims2, "lang", ["code", "weight"])),
        rd.from_pandas(docs2), rd.from_pandas(dims2),
    ).materialize()
    _check(view, docs2, dims2)


def test_one_sided_delta_and_noop_updates():
    docs, dims0 = _docs(4), _dims(0)
    view = build_join_view(
        rd.from_pandas(docs), rd.from_pandas(dims0), SPEC,
        right_rows=len(dims0),
    ).materialize()
    # dim-only epoch: payload updates fan out to every matching doc;
    # docs delta is None
    dims1 = _dims(5)
    view = apply_join_change_sets(
        view, SPEC, None,
        rd.from_pandas(_cs(dims0, dims1, "lang", ["code", "weight"])),
        rd.from_pandas(docs), rd.from_pandas(dims1),
    ).materialize()
    _check(view, docs, dims1)
    # no-op update epoch: every doc re-asserted unchanged → view fixed
    cs = _cs(docs, docs, "doc_id", ["lang", "chars"])
    assert set(cs["change"]) == {"updated"}
    view2 = apply_join_change_sets(
        view, SPEC, rd.from_pandas(cs), None,
        rd.from_pandas(docs), rd.from_pandas(dims1),
    ).materialize()
    _check(view2, docs, dims1)


def test_full_fold_fallback_path():
    docs0, dims0 = _docs(6, n=120), _dims(0)
    view = build_join_view(
        rd.from_pandas(docs0), rd.from_pandas(dims0), SPEC,
        right_rows=len(dims0),
    ).materialize()
    docs1 = _mutate_docs(docs0, 7)
    dims1 = _dims(1, langs=("en", "de", "ja", "ko"))
    view = apply_join_change_sets(
        view, SPEC,
        rd.from_pandas(_cs(docs0, docs1, "doc_id", ["lang", "chars"])),
        rd.from_pandas(_cs(dims0, dims1, "lang", ["code", "weight"])),
        rd.from_pandas(docs1), rd.from_pandas(dims1),
        broadcast_limit=0,  # force partitioned semi + full-fold paths
    ).materialize()
    _check(view, docs1, dims1)


def test_empty_deltas_and_empty_view():
    docs, dims = _docs(8, n=50), _dims(0)
    sl, sr = rd.from_pandas(docs), rd.from_pandas(dims)
    view = empty_join_view(SPEC, sl, sr)
    # build from empty via the maintenance path: all-added change sets
    grown = apply_join_change_sets(
        view, SPEC,
        rd.from_pandas(_cs(docs.iloc[0:0], docs, "doc_id",
                           ["lang", "chars"])),
        rd.from_pandas(_cs(dims.iloc[0:0], dims, "lang",
                           ["code", "weight"])),
        sl, sr,
    ).materialize()
    _check(grown, docs, dims)
    # both deltas empty → unchanged object
    same = apply_join_change_sets(grown, SPEC, None, None, sl, sr)
    assert same is grown


def test_disjoint_name_validation():
    with pytest.raises(ValueError, match="disjoint"):
        IncJoinSpec(
            left_key=["doc_id"], right_key=["lang"], on="lang",
            left_cols=["lang", "code"], right_cols=["code"],
        ).validate()


# ==========================================================================
# Left-outer join views
# ==========================================================================

from standardized_omop_data_etl_ray.stages.incremental import (
    apply_left_join_change_sets,
    build_left_join_view,
    build_on_counts,
)


def _expected_left(docs: pd.DataFrame, dims: pd.DataFrame) -> pd.DataFrame:
    out = docs.merge(dims, on="lang", how="left")
    out = out[["doc_id", "lang", "chars", "code", "weight"]]
    return out.sort_values("doc_id", ignore_index=True)


def _check_left(view, docs, dims):
    got = view.to_pandas().sort_values("doc_id", ignore_index=True)
    got["chars"] = got["chars"].astype("Int64")
    got = got[["doc_id", "lang", "chars", "code", "weight"]]
    want = _expected_left(docs, dims)
    want["chars"] = want["chars"].astype("Int64")
    pd.testing.assert_frame_equal(got, want)


def test_left_build_matches_pandas():
    docs = _docs(20)
    dims = _dims(0, langs=("en", "de"))  # fr/ja/null docs unmatched
    view = build_left_join_view(
        rd.from_pandas(docs), rd.from_pandas(dims), SPEC,
        right_rows=len(dims),
    ).materialize()
    _check_left(view, docs, dims)


def test_left_maintenance_with_count_crossings():
    docs0 = _docs(21)
    dims0 = _dims(0, langs=("en", "de"))
    sl0, sr0 = rd.from_pandas(docs0), rd.from_pandas(dims0)
    view = build_left_join_view(sl0, sr0, SPEC,
                                right_rows=len(dims0)).materialize()
    cnt = build_on_counts(sr0, SPEC).materialize()

    # epoch 1: 'fr' gains its FIRST dim row (0→+ crossing: every fr doc
    # flips from null-extended to matched), 'de' loses its only row
    # (+→0: de docs flip to null-extended), docs churn incl. fk moves
    # onto/off the crossing langs, plus fk→null moves
    docs1 = _mutate_docs(docs0, 22)
    dims1 = _dims(1, langs=("en", "fr", "ko"))
    view, cnt = apply_left_join_change_sets(
        view, SPEC,
        rd.from_pandas(_cs(docs0, docs1, "doc_id", ["lang", "chars"])),
        rd.from_pandas(_cs(dims0, dims1, "lang", ["code", "weight"])),
        rd.from_pandas(docs1), rd.from_pandas(dims1), cnt,
    )
    view, cnt = view.materialize(), cnt.materialize()
    _check_left(view, docs1, dims1)
    # count view mirrors the live dim exactly
    cd = cnt.to_pandas().sort_values("lang", ignore_index=True)
    assert dict(zip(cd["lang"], cd["__cnt"])) == {
        "en": 1, "fr": 1, "ko": 1
    }

    # epoch 2: left-only churn (dim delta None)
    docs2 = _mutate_docs(docs1, 23, ins_base=3000)
    view2, cnt2 = apply_left_join_change_sets(
        view, SPEC,
        rd.from_pandas(_cs(docs1, docs2, "doc_id", ["lang", "chars"])),
        None,
        rd.from_pandas(docs2), rd.from_pandas(dims1), cnt,
    )
    view2 = view2.materialize()
    _check_left(view2, docs2, dims1)
    assert cnt2 is cnt  # no right delta → count view unchanged

    # epoch 3: dim-only churn — 'de' returns (its docs re-match),
    # 'en' disappears (its docs null-extend)
    dims3 = _dims(3, langs=("de", "fr", "ko"))
    view3, cnt3 = apply_left_join_change_sets(
        view2, SPEC, None,
        rd.from_pandas(_cs(dims1, dims3, "lang", ["code", "weight"])),
        rd.from_pandas(docs2), rd.from_pandas(dims3), cnt2,
    )
    _check_left(view3.materialize(), docs2, dims3)


def test_left_duplicate_dim_rows_per_key():
    """N:M: two right rows per 'en' — counts must track multiplicity,
    not presence (dropping ONE of two rows is no crossing)."""
    docs = _docs(24, n=80)
    dims0 = pd.DataFrame({
        "lang": ["en", "en", "de"],
        "code": ["EN_a", "EN_b", "DE_a"],
        "weight": [1.0, 2.0, 3.0],
    })
    # build (right_key is 'lang' in SPEC but duplicated here — use a
    # spec keyed by code, the true row identity)
    spec = IncJoinSpec(
        left_key=["doc_id"], right_key=["code"], on="lang",
        left_cols=["lang", "chars"], right_cols=["weight"],
    )

    def exp(docs, dims):
        out = docs.merge(dims, on="lang", how="left")
        out = out[["doc_id", "lang", "chars", "code", "weight"]]
        return out.sort_values(["doc_id", "code"], ignore_index=True)

    sl, sr0 = rd.from_pandas(docs), rd.from_pandas(dims0)
    view = build_left_join_view(sl, sr0, spec,
                                right_rows=len(dims0)).materialize()
    cnt = build_on_counts(sr0, spec).materialize()
    got = view.to_pandas().sort_values(["doc_id", "code"],
                                       ignore_index=True)
    got["chars"] = got["chars"].astype("Int64")
    want = exp(docs, dims0)
    want["chars"] = want["chars"].astype("Int64")
    pd.testing.assert_frame_equal(
        got[["doc_id", "lang", "chars", "code", "weight"]],
        want[["doc_id", "lang", "chars", "code", "weight"]],
    )
    # drop ONE of the two 'en' rows: no crossing, inner retraction only
    dims1 = dims0.iloc[[0, 2]]
    view, cnt = apply_left_join_change_sets(
        view, spec, None,
        rd.from_pandas(_cs(dims0, dims1, "code", ["lang", "weight"])),
        sl, rd.from_pandas(dims1), cnt,
    )
    view, cnt = view.materialize(), cnt.materialize()
    got = view.to_pandas().sort_values(["doc_id", "code"],
                                       ignore_index=True)
    got["chars"] = got["chars"].astype("Int64")
    want = exp(docs, dims1)
    want["chars"] = want["chars"].astype("Int64")
    pd.testing.assert_frame_equal(
        got[["doc_id", "lang", "chars", "code", "weight"]],
        want[["doc_id", "lang", "chars", "code", "weight"]],
    )
    # now drop the LAST 'en' row: +→0 crossing, en docs null-extend
    dims2 = dims1.iloc[[1]]
    view, cnt = apply_left_join_change_sets(
        view, spec, None,
        rd.from_pandas(_cs(dims1, dims2, "code", ["lang", "weight"])),
        sl, rd.from_pandas(dims2), cnt,
    )
    got = view.materialize().to_pandas().sort_values(
        ["doc_id", "code"], ignore_index=True)
    got["chars"] = got["chars"].astype("Int64")
    want = exp(docs, dims2)
    want["chars"] = want["chars"].astype("Int64")
    pd.testing.assert_frame_equal(
        got[["doc_id", "lang", "chars", "code", "weight"]],
        want[["doc_id", "lang", "chars", "code", "weight"]],
    )
