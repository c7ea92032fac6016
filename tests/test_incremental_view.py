"""Incremental materialized aggregate views (stages/incremental.py):
maintenance from change sets must equal a from-scratch rebuild over the
post-change rows — including MIN/MAX retraction (the non-invertible
path) and rows that migrate between groups."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from standardized_omop_data_etl_ray.stages.incremental import (
    IncAggSpec,
    apply_change_set,
    build_agg_view,
    view_result,
)

SPEC = IncAggSpec(
    group_cols=["lang"],
    count="n_docs",
    sums={"sum_chars": "chars"},
    means={"avg_chars": "chars"},
    mins={"min_chars": "chars"},
    maxs={"max_chars": "chars"},
)


def _rows(seed: int, n: int = 400) -> pd.DataFrame:
    rng = np.random.default_rng(seed)
    df = pd.DataFrame({
        "doc_id": np.arange(n),
        "lang": rng.choice(["en", "de", "fr", "ja"], n),
        "chars": rng.integers(1, 10_000, n).astype("int64"),
    })
    # nullable source column: SUM ignores nulls, COUNT(*) does not
    df.loc[df.index % 17 == 0, "chars"] = None
    df["chars"] = df["chars"].astype("Int64")
    return df


def _expected(df: pd.DataFrame) -> pd.DataFrame:
    g = df.groupby("lang")
    out = pd.DataFrame({
        "lang": sorted(df["lang"].unique()),
    }).set_index("lang")
    out["n_docs"] = g.size()
    out["sum_chars"] = g["chars"].sum(min_count=1)
    out["avg_chars"] = g["chars"].mean()
    out["min_chars"] = g["chars"].min()
    out["max_chars"] = g["chars"].max()
    return out.reset_index()


def _result(view) -> pd.DataFrame:
    df = view_result(view, SPEC).to_pandas()
    df = df.sort_values("lang", ignore_index=True)
    for c in ("n_docs", "sum_chars", "min_chars", "max_chars"):
        df[c] = df[c].astype("Int64")
    return df


def _check(got: pd.DataFrame, want: pd.DataFrame):
    want = want.sort_values("lang", ignore_index=True)
    for c in ("n_docs", "sum_chars", "min_chars", "max_chars"):
        want[c] = want[c].astype("Int64")
    assert list(got["lang"]) == list(want["lang"])
    for c in got.columns:
        if c == "avg_chars":
            np.testing.assert_allclose(
                got[c].to_numpy(dtype=float), want[c].to_numpy(dtype=float),
                rtol=1e-12,
            )
        else:
            pd.testing.assert_series_equal(
                got[c], want[c], check_names=False
            )


def _change_set(old: pd.DataFrame, new: pd.DataFrame) -> pd.DataFrame:
    """Key-level diff of two row frames in the epoch_change_set row
    contract (old_/new_ payloads, change in added/deleted/updated)."""
    j = old.merge(new, on="doc_id", how="outer", suffixes=("_o", "_n"),
                  indicator=True)
    rows = []
    for _, r in j.iterrows():
        if r["_merge"] == "left_only":
            rows.append(("deleted", r["lang_o"], r["chars_o"], None, None))
        elif r["_merge"] == "right_only":
            rows.append(("added", None, None, r["lang_n"], r["chars_n"]))
        else:
            # emit every surviving key as an update — no-op updates
            # must net to zero in the fold (robustness, not a bug)
            rows.append(("updated", r["lang_o"], r["chars_o"],
                         r["lang_n"], r["chars_n"]))
    cs = pd.DataFrame(
        rows, columns=["change", "old_lang", "old_chars", "new_lang",
                       "new_chars"],
    )
    cs["old_chars"] = cs["old_chars"].astype("Int64")
    cs["new_chars"] = cs["new_chars"].astype("Int64")
    return cs


def test_build_matches_pandas():
    df = _rows(0)
    view = build_agg_view(rd.from_pandas(df), SPEC).materialize()
    _check(_result(view), _expected(df))


def test_maintenance_equals_rebuild():
    old = _rows(1)
    rng = np.random.default_rng(2)
    new = old.copy()
    # deletes — include every row holding a group max (forces the
    # non-invertible rescan path to actually move extrema)
    maxes = old.groupby("lang")["chars"].max()
    is_max = (old["chars"] == old["lang"].map(maxes)).fillna(False)
    drop = set(old.loc[is_max, "doc_id"]) | set(range(0, 40))
    new = new[~new["doc_id"].isin(drop)]
    # updates: value changes and group migrations
    upd = new["doc_id"] % 7 == 3
    new.loc[upd, "chars"] = rng.integers(1, 500, int(upd.sum()))
    mig = new["doc_id"] % 11 == 5
    new.loc[mig, "lang"] = "zh"
    # inserts, including a brand-new group
    ins = pd.DataFrame({
        "doc_id": np.arange(1000, 1030),
        "lang": ["ko"] * 15 + ["en"] * 15,
        "chars": pd.array(rng.integers(1, 100, 30), dtype="Int64"),
    })
    new = pd.concat([new, ins], ignore_index=True)

    cs = _change_set(old, new)
    assert set(cs["change"]) == {"added", "deleted", "updated"}

    view = build_agg_view(rd.from_pandas(old), SPEC).materialize()
    state = rd.from_pandas(new[["lang", "chars"]])
    view2 = apply_change_set(view, rd.from_pandas(cs), SPEC,
                             state=state).materialize()
    _check(_result(view2), _expected(new))
    # and a second epoch on top (fold of a fold): retire a whole group
    final = new[new["lang"] != "ko"]
    cs2 = _change_set(new, final)
    view3 = apply_change_set(
        view2, rd.from_pandas(cs2), SPEC,
        state=rd.from_pandas(final[["lang", "chars"]]),
    ).materialize()
    _check(_result(view3), _expected(final))
    assert "ko" not in set(_result(view3)["lang"])


def test_minmax_requires_state():
    view = build_agg_view(rd.from_pandas(_rows(3)), SPEC).materialize()
    cs = rd.from_pandas(_change_set(_rows(3), _rows(3).iloc[:-5]))
    with pytest.raises(ValueError, match="rescan"):
        apply_change_set(view, cs, SPEC, state=None)


def test_view_grouped_by_change_set_key_column(tmp_path):
    """A view grouped by a change-set KEY column (unprefixed in
    epoch_change_set rows) must maintain — key identity is old==new
    (review finding: this path raised KeyError)."""
    import ray.data as rd2

    from standardized_omop_data_etl_ray.pipelines.cdc import (
        CDCLake,
        epoch_change_set,
    )
    from standardized_omop_data_etl_ray.spec import TableSpec

    lake = CDCLake(tmp_path, TableSpec(name="t", num_partitions=2))
    spec = IncAggSpec(group_cols=["repo"], count="n",
                      sums={"sum_chars": "chars"})

    def ev(op, lsn, repo, path, content):
        return {"op": op, "lsn": lsn, "repo": repo, "path": path,
                "commit": f"c{lsn}", "content": content}

    from standardized_omop_data_etl_ray.stages.incremental import (
        empty_agg_view,
    )
    import pyarrow as pa2

    view = empty_agg_view(spec, {"repo": pa2.string(),
                                 "chars": pa2.int64()})
    batches = [
        [ev("I", 1, "r1", "a", "xxxx"), ev("I", 2, "r2", "b", "yy")],
        [ev("U", 3, "r1", "a", "x"), ev("D", 4, "r2", "b", None),
         ev("I", 5, "r2", "c", "zzz")],
    ]
    for batch in batches:
        rec = lake.apply_events(rd2.from_items(batch))
        cs = epoch_change_set(
            lake, rec["epoch"], carry_cols=["content"]
        ).map_batches(
            lambda df: df.assign(
                old_chars=df["old_content"].str.len().astype("Int64"),
                new_chars=df["new_content"].str.len().astype("Int64"),
            ),
            batch_format="pandas",
        )
        view = apply_change_set(view, cs, spec, num_buckets=4).materialize()

    got = (
        view_result(view, spec).to_pandas()
        .sort_values("repo", ignore_index=True)
    )
    assert got["repo"].tolist() == ["r1", "r2"]
    assert got["n"].tolist() == [1, 1]
    assert got["sum_chars"].tolist() == [1, 3]
