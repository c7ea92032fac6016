"""Driver-contract checks: entry() smoke + a representative subset of
queries() compared against their oracle_sql() via DuckDB (the same
comparison shape the driver uses: row count + sorted-column values)."""

import sys

import duckdb
import pandas as pd
import pyarrow as pa
import pytest

sys.path.insert(0, "/root/repo")
import __ray_entry__ as E

SF = "/root/testdata/sf0.001"
TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    yield c
    c.close()


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif "datetime" in str(df[c].dtype):
            df[c] = df[c].astype("datetime64[us]").astype(str)
        elif str(df[c].dtype).startswith("float"):
            df[c] = df[c].round(6)
        elif str(df[c].dtype).startswith(("uint", "int", "Int")):
            df[c] = df[c].astype("int64")
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def _to_df(res) -> pd.DataFrame:
    import ray.data as rd

    if isinstance(res, rd.Dataset):
        return res.to_pandas()
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res


SUBSET = [
    "q1_pricing_summary",
    "q3_top_orders",
    "priority_merge_orders",
    "cdc_lww_upsert",
    "cdc_lww_with_deletes",
    "dedup_exact_docs",
    "ann_topk_cosine",
    "sessionize_events",
    # round-5 operators
    "weighted_topk_sample_docs",
    "grouped_weighted_topk_docs",
    "incremental_exact_dedup_docs",
    "kmeans_embeddings",
    "asof_tolerance_purchases",
    "range_join_price_bands",
    "robust_outliers_by_event_type",
    "psi_drift_events",
    "winsorize_lineitem_price",
    "minhash_cross_near_dups",
    "incremental_kmeans_embeddings",
    "corpus_full_pipeline",
]


@pytest.mark.parametrize("name", SUBSET)
def test_query_matches_oracle(name, con):
    mine = _canon(_to_df(E.queries()[name](SF)))
    orc = _canon(con.execute(E.oracle_sql()[name]).df())
    assert len(mine) == len(orc), f"{name}: rows {len(mine)} != {len(orc)}"
    assert list(mine.columns) == list(orc.columns)
    pd.testing.assert_frame_equal(mine, orc, check_dtype=False)


def test_every_query_has_callable_and_oracle_coverage():
    qs, os_ = E.queries(), E.oracle_sql()
    assert len(qs) >= 30
    assert set(os_) <= set(qs)
    # the vast majority must carry a SQL oracle (rows-only is the exception)
    assert len(os_) >= 25


def test_driver_window_integrity():
    """The first-50 window (the driver's correctness gate) must be the
    declared _WINDOW_R5 order, every entry oracle-backed."""
    qs, os_ = E.queries(), E.oracle_sql()
    window = list(qs)[:50]
    assert window == E._WINDOW_R5
    assert all(n in os_ for n in window), [
        n for n in window if n not in os_]


def test_entry_smoke():
    res = E.entry()
    import ray.data as rd

    assert isinstance(res, rd.Dataset)
    df = res.to_pandas()
    assert len(df) >= 1
    assert {"repo", "path", "commit", "lang", "content"} <= set(df.columns)


def test_q3_broadcast_guard_fallback():
    """VERDICT r2 #9: q3's size assumption is now measured — forcing the
    guard to 0 routes through the partitioned hash join and returns the
    same top-10."""
    import __ray_entry__ as e

    sf = "/root/testdata/sf0.001"
    a = e.q3_top_orders(sf).to_pandas()
    b = e.q3_top_orders(sf, _broadcast_limit=0).to_pandas()
    cols = sorted(a.columns)
    assert a[cols].reset_index(drop=True).equals(
        b[cols].reset_index(drop=True)
    )
