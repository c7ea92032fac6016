"""Edge cases for kernels not already pinned elsewhere."""

from datetime import date

import numpy as np
import pyarrow as pa

from standardized_omop_data_etl_ray.functions.dates import (
    exclude_sentinel,
    normalize_date_format,
)
from standardized_omop_data_etl_ray.functions.hashing import partition_of
from standardized_omop_data_etl_ray.functions.text import (
    band_hashes,
    band_hashes_batch,
    minhash_params,
    minhash_signature,
    minhash_signatures_batch,
    hash_u64,
)
from standardized_omop_data_etl_ray.stages.schema_ops import pad_to_schema


def test_normalize_date_format_invalid_to_null():
    out = normalize_date_format(
        pa.array(["31/12/1999", "not a date", None, "2020-02-29"])
    ).to_pylist()
    assert out == ["1999-12-31", None, None, "2020-02-29"]


def test_exclude_sentinel():
    col = pa.array([date(1900, 1, 1), date(2020, 5, 1), None], pa.date32())
    out = exclude_sentinel(col).to_pylist()
    assert out == [None, date(2020, 5, 1), None]


def test_partition_of_range():
    kh = pa.array([0, 1, 2**64 - 1, 12345], pa.uint64())
    parts = partition_of(kh, 7).to_pylist()
    assert all(0 <= p < 7 for p in parts)
    # stable across calls
    assert parts == partition_of(kh, 7).to_pylist()


def test_pad_to_schema_casts_and_nulls():
    schema = pa.schema([("a", pa.int64()), ("b", pa.float64()),
                        ("c", pa.string())])
    t = pa.table({"a": pa.array([1, 2], pa.int32()),
                  "c": pa.array(["x", None])})
    out = pad_to_schema(t, schema)
    assert out.schema == schema
    assert out.column("a").type == pa.int64()
    assert out.column("b").null_count == 2


def test_band_hashes_batch_matches_single():
    a, b = minhash_params(64)
    docs = [["alpha beta gamma", "beta gamma delta"], ["x y z"]]
    sigs = minhash_signatures_batch(docs, a, b)
    for i, d in enumerate(docs):
        single = minhash_signature(hash_u64(np.array(d, object)), a, b)
        assert np.array_equal(sigs[i], single)
    bh_batch = band_hashes_batch(sigs, 16)
    for i in range(len(docs)):
        assert np.array_equal(bh_batch[i], band_hashes(sigs[i], 16))


def test_empty_doc_signatures():
    a, b = minhash_params(32)
    sigs = minhash_signatures_batch([[], ["one two three"]], a, b)
    from standardized_omop_data_etl_ray.functions.text import MERSENNE61

    assert (sigs[0] == MERSENNE61).all()
    assert not (sigs[1] == MERSENNE61).all()


def test_round_half_away_matches_duckdb():
    """The engine's rounding kernel must be bit-identical to SQL ROUND
    (the driver oracle hashes rounded doubles — VERDICT.md round 1:
    pc.round diverged on 70/720 hourly sums)."""
    import duckdb

    from standardized_omop_data_etl_ray.functions.rounding import (
        round_half_away,
        round_table_cols,
    )

    rng = np.random.default_rng(7)
    x = np.concatenate([
        rng.uniform(-1e6, 1e6, 100_000),
        rng.uniform(-1, 1, 100_000),
        # classic float traps: decimal value just below/above scaled .5
        np.array([2.675, -2.675, 0.125, -0.125, 1.005, 2.5, -2.5,
                  0.0, -0.0, 1e15 + 0.5, 33784.795, -33784.795]),
    ])
    t = pa.table({"v": x})
    con = duckdb.connect()
    for nd in (2, 4, 6):
        d = con.execute(f"SELECT ROUND(v, {nd}) AS r FROM t").fetchnumpy()["r"]
        ours = round_half_away(x, nd)
        assert np.array_equal(d, ours), f"ndigits={nd} diverged from DuckDB"
    con.close()
    # table helper: rounds named float cols, preserves nulls + other cols
    tbl = pa.table({"a": pa.array([1.005, None, 2.675]), "b": ["x", "y", "z"]})
    out = round_table_cols(tbl, {"a": 2})
    assert out.column("a").null_count == 1
    assert out.column("b").to_pylist() == ["x", "y", "z"]
    assert out.column("a").to_pylist()[0] == 1.0  # 1.005 stores < 1.005
