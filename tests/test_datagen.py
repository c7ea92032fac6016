"""Generator contract tests (FIXTURES.md §A)."""

import numpy as np
import pandas as pd

from standardized_omop_data_etl_ray.datagen import (
    make_change_events,
    make_source_repos,
    micro_batches,
)


def test_source_repos_deterministic_and_shaped():
    a = make_source_repos(300, seed=42)
    b = make_source_repos(300, seed=42)
    assert a.equals(b)
    assert a.column_names == ["repo", "path", "commit", "lang", "content"]
    df = a.to_pandas()
    assert df[["repo", "path"]].duplicated().sum() == 0  # PK holds
    assert df["commit"].str.len().eq(40).all()
    assert df["content"].str.len().between(50, 21_000).all()


def test_events_lifecycle_valid():
    ev = make_change_events(200, 3000, seed=1, window=300).to_pandas()
    true = ev.drop_duplicates("lsn").sort_values("lsn")
    for _, g in true.groupby(["repo", "path"]):
        ops = g["op"].tolist()
        assert ops[0] == "I"
        alive = False
        for op in ops:
            if op == "I":
                assert not alive
                alive = True
            elif op == "U":
                assert alive
            else:
                assert alive
                alive = False
    # deletes carry null payload
    d = ev[ev["op"] == "D"]
    assert d["content"].isna().all() and d["lang"].isna().all()


def test_events_out_of_order_but_window_bounded():
    window = 250
    ev = make_change_events(100, 2000, seed=3, window=window, dup_rate=0).to_pandas()
    lsn = ev["lsn"].to_numpy()
    assert not np.all(np.diff(lsn) >= 0)  # genuinely shuffled
    assert np.array_equal(lsn // window, np.sort(lsn // window))  # bounded


def test_events_have_duplicates_and_hot_keys():
    ev = make_change_events(500, 5000, seed=5, dup_rate=0.05).to_pandas()
    assert ev["lsn"].duplicated().sum() > 100
    dups = ev[ev.duplicated("lsn", keep=False)]
    # duplicate deliveries carry identical payloads
    assert (dups.groupby("lsn").nunique() <= 1).all().all()
    share = (ev["repo"] == "org0/hot-repo").mean()
    assert 0.2 < share < 0.45


def test_micro_batches_respect_tailing_contract():
    window = 200
    ev = make_change_events(100, 2000, seed=9, window=window)
    batches = list(micro_batches(ev, batch_windows=2, window=window))
    assert sum(b.num_rows for b in batches) == ev.num_rows
    prev_max = -1
    for b in batches:
        lsn = pd.Series(b.column("lsn").to_numpy())
        assert lsn.min() > prev_max or lsn.min() <= prev_max  # dups allowed
        new = lsn[lsn > prev_max]
        prev_max = int(lsn.max())
        assert len(new) > 0


def test_schema_evolution_column():
    ev = make_change_events(50, 1000, seed=11, evolve_after_frac=0.5)
    assert "size_bytes" in ev.column_names
    df = ev.to_pandas()
    early = df[df["lsn"] < 500]
    late = df[(df["lsn"] >= 500) & (df["op"] != "D")]
    assert early["size_bytes"].isna().all()
    assert late["size_bytes"].notna().all()
