"""CSV source with per-column dtype overrides (reference S1).

The reference reads every source table with ``pd.read_csv`` + explicit
dtype maps — nullable ``Int64`` for survey codes
(alsfrs_r--observation.py:45, vital_signs--measurement.py:495-497) and
``str`` for ids deliberately kept textual
(aalshxfx--condition_occurrence.py:14,19).  This wraps
``ray.data.read_csv`` with the same semantics, expressed as an Arrow
``ConvertOptions.column_types`` map (int64/string nullable by
construction in Arrow), so typing happens AT THE READ, not in a later
repair pass.
"""

from __future__ import annotations

import pyarrow as pa
from pyarrow import csv as pacsv

import ray.data as rd


def read_csv_typed(
    paths: str | list[str],
    int_cols: list[str] | None = None,
    str_cols: list[str] | None = None,
    float_cols: list[str] | None = None,
    **kwargs,
) -> rd.Dataset:
    """``ray.data.read_csv`` with reference-style dtype overrides."""
    types: dict[str, pa.DataType] = {}
    for c in int_cols or []:
        types[c] = pa.int64()
    for c in str_cols or []:
        types[c] = pa.string()
    for c in float_cols or []:
        types[c] = pa.float64()
    convert = pacsv.ConvertOptions(
        column_types=types,
        strings_can_be_null=True,
        null_values=["", "NA", "NaN", "nan", "None", "null"],
    )
    return rd.read_csv(paths, convert_options=convert, **kwargs)
