"""SQL-compatible double rounding.

``pyarrow.compute.round`` rounds the DECIMAL value of a double
(half_towards_infinity on the exact decimal), while DuckDB/most SQL
engines round the SCALED double: ``std::round(x * 10^n) / 10^n``.
The two disagree whenever ``x * 10^n`` lands on a .5 boundary that the
decimal expansion of ``x`` itself does not (observed on 70 of 720
hourly sums in the round-1 driver check — VERDICT.md "What's wrong" #1).
pandas ``Series.round`` (half-to-even) is a third, different rule.

``round_half_away`` reproduces the SQL result bit-for-bit:
``copysign(floor(|x·10^n| + 0.5), x) / 10^n`` — verified against
DuckDB ``ROUND(v, n)`` on 400k random + adversarial doubles
(tests/test_kernel_edges.py).  Every oracle-checked query routes its
final rounding through here so engine and oracle hashes agree by
construction.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def round_half_away(values, ndigits: int) -> np.ndarray:
    """Round doubles exactly like SQL ROUND(v, n) (half away from zero
    on the scaled double).  Accepts numpy arrays / pandas Series /
    pyarrow arrays; returns float64 numpy (NaN preserved)."""
    if isinstance(values, pa.ChunkedArray):
        values = values.combine_chunks()
    if isinstance(values, pa.Array):
        x = values.to_numpy(zero_copy_only=False)
    else:
        x = np.asarray(values)
    x = x.astype(np.float64, copy=False)
    scale = 10.0 ** ndigits
    y = x * scale
    with np.errstate(invalid="ignore"):
        out = np.copysign(np.floor(np.abs(y) + 0.5), y) / scale
    return np.where(np.isnan(x), x, out)


def round_table_cols(batch: pa.Table, digits: dict[str, int]) -> pa.Table:
    """Round the given float columns of an Arrow table SQL-compatibly."""
    for col, nd in digits.items():
        if col in batch.column_names:
            i = batch.column_names.index(col)
            arr = batch.column(col)
            if isinstance(arr, pa.ChunkedArray):
                arr = arr.combine_chunks()
            arr = arr.cast(pa.float64())
            rounded = round_half_away(arr, nd)
            mask = (
                arr.is_null().to_numpy(zero_copy_only=False)
                if arr.null_count else None
            )
            batch = batch.set_column(
                i, col, pa.array(rounded, pa.float64(), mask=mask)
            )
    return batch
