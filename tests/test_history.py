"""SCD Type 2 history expansion (stages/history.py) against DuckDB
lead() window semantics, including delete-then-reinsert holes."""

import duckdb
import numpy as np
import pandas as pd
import ray.data as rd

from standardized_omop_data_etl_ray.stages.history import scd2_history


def _events(seed=11, keys=40, max_versions=6):
    rng = np.random.default_rng(seed)
    rows = []
    lsn = 0
    for k in range(keys):
        nv = int(rng.integers(1, max_versions))
        for v in range(nv):
            # sprinkle deletes mid-history: closes the prior version,
            # and the next event re-opens (the reinsert hole)
            op = "D" if (v > 0 and rng.random() < 0.25) else ("I" if v == 0 else "U")
            rows.append({
                "repo": f"r{k % 7}",
                "path": f"p{k}",
                "op": op,
                "lsn": lsn,
                "content": None if op == "D" else f"c{k}:{v}",
            })
            lsn += int(rng.integers(1, 5))
    return pd.DataFrame(rows).sample(frac=1.0, random_state=3).reset_index(
        drop=True
    )  # arrival order ≠ lsn order: the operator must not rely on it


def test_scd2_matches_duckdb_lead():
    df = _events()
    got = (
        scd2_history(rd.from_pandas(df), ["repo", "path"], num_buckets=5)
        .to_pandas()
        .sort_values(["repo", "path", "valid_from"], ignore_index=True)
    )
    want = duckdb.sql("""
        WITH w AS (
          SELECT *, lead(lsn) OVER (PARTITION BY repo, path ORDER BY lsn)
                 AS valid_to
          FROM df
        )
        SELECT repo, path, op, lsn AS valid_from, content, valid_to,
               (valid_to IS NULL) AS is_current
        FROM w WHERE op <> 'D'
        ORDER BY repo, path, valid_from
    """).df()
    assert list(got["valid_from"]) == list(want["valid_from"])
    assert got["valid_to"].astype("float64").equals(
        want["valid_to"].astype("float64")
    )
    assert list(got["is_current"]) == list(want["is_current"])
    assert list(got["content"]) == list(want["content"])


def test_scd2_delete_then_reinsert_hole_and_current():
    df = pd.DataFrame({
        "repo": ["a"] * 4 + ["b"],
        "path": ["x"] * 4 + ["y"],
        "op": ["I", "U", "D", "I", "I"],
        "lsn": [1, 3, 5, 9, 2],
        "content": ["v0", "v1", None, "v2", "solo"],
    })
    got = (
        scd2_history(rd.from_pandas(df), ["repo", "path"], num_buckets=2)
        .to_pandas()
        .sort_values(["repo", "path", "valid_from"], ignore_index=True)
    )
    ax = got[got["path"] == "x"]
    # v1 closes at the DELETE lsn (5); the reinsert opens at 9 → the
    # [5, 9) hole is real history, not a gap bug
    assert list(ax["valid_from"]) == [1, 3, 9]
    assert list(ax["valid_to"].astype("float64").fillna(-1)) == [3.0, 5.0, -1]
    assert list(ax["is_current"]) == [False, False, True]
    by = got[got["path"] == "y"]
    assert list(by["is_current"]) == [True]


def test_scd2_deleted_key_has_no_current_row():
    df = pd.DataFrame({
        "repo": ["a", "a"],
        "path": ["x", "x"],
        "op": ["I", "D"],
        "lsn": [1, 2],
        "content": ["v0", None],
    })
    got = scd2_history(rd.from_pandas(df), ["repo", "path"]).to_pandas()
    assert len(got) == 1
    assert not bool(got["is_current"].iloc[0])
    assert int(got["valid_to"].iloc[0]) == 2


def test_scd2_asof_reconstruction():
    """scd2_asof at every interior cut equals an LWW replay of the
    prefix — including cuts landing exactly on deletes (key absent)
    and inside delete→reinsert holes."""
    df = pd.DataFrame({
        "repo": ["a"] * 5,
        "path": ["x"] * 4 + ["y"],
        "op": ["I", "U", "D", "I", "I"],
        "lsn": [1, 3, 5, 9, 2],
        "content": ["v0", "v1", None, "v2", "solo"],
    })
    from standardized_omop_data_etl_ray.stages.history import scd2_asof

    hist = scd2_history(rd.from_pandas(df), ["repo", "path"]).materialize()
    for cut in range(0, 11):
        got = scd2_asof(hist, cut).to_pandas()
        if len(got):
            got = got.sort_values(["path", "valid_from"],
                                  ignore_index=True)
        want = duckdb.sql(f"""
            SELECT path, content FROM (
              SELECT *, row_number() OVER (
                PARTITION BY repo, path ORDER BY lsn DESC) rn
              FROM df WHERE lsn <= {cut}
            ) WHERE rn = 1 AND op <> 'D' ORDER BY path
        """).df()
        if len(got) == 0:
            assert len(want) == 0, cut
            continue
        assert list(got["path"]) == list(want["path"]), cut
        assert list(got["content"]) == list(want["content"]), cut
