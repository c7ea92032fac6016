"""Vectorized date kernels (reference semantics, Arrow/numpy execution).

Reference analogs (SURVEY.md §2.2): M1 relative-day conversion
(helpers.py:6-39), M2 year→date with 1900-01-01 sentinel
(helpers.py:66-98), M15 conditional date-fill matrix
(answer_als_medications_log--drug_exposure.py:228-261), M17 dd/mm/yyyy
normalizer (convert_omop_dates.py:7-41).  The reference applies these
per row with try/except; ours are whole-column kernels with null masks.
"""

from __future__ import annotations

from datetime import date


import pyarrow as pa
import pyarrow.compute as pc

INDEX_DATE = date(2016, 1, 1)        # readme.md:85 — study index date
SENTINEL_DATE = date(1900, 1, 1)     # helpers.py:88 — missing-value sentinel


def relative_day_to_date(days: pa.Array, index_date: date = INDEX_DATE) -> pa.Array:
    """index_date + N days, null-preserving → date32."""
    if isinstance(days, pa.ChunkedArray):
        days = days.combine_chunks()
    d = days.cast(pa.int32())
    base = pa.scalar(index_date, pa.date32()).cast(pa.int32())
    return pc.add(d, base).cast(pa.date32())


def relative_day_to_year(days: pa.Array, index_date: date = INDEX_DATE) -> pa.Array:
    return pc.year(relative_day_to_date(days, index_date))


def year_to_date(year_str: pa.Array, max_year: int = 2026) -> pa.Array:
    """Year string → Jan-1 date; blank/junk/out-of-range → 1900-01-01.

    Unlike the reference (helpers.py:90 uses the wall-clock year, making
    output time-dependent) the upper bound is an explicit parameter —
    determinism is a core engine guarantee.
    """
    s = pc.utf8_trim_whitespace(pc.cast(year_str, pa.string()))
    # lenient parse: non-numeric → null
    digits = pc.extract_regex(s, r"^(?P<y>\d{1,4})$")
    year = pc.struct_field(digits, "y").cast(pa.int32())
    valid = pc.and_(
        pc.greater_equal(year, 1900), pc.less_equal(year, max_year)
    )
    year_ok = pc.if_else(pc.fill_null(valid, False), year, 1900)
    year_filled = pc.fill_null(year_ok, 1900)
    # date(y, 1, 1) via days-since-epoch arithmetic is messy; strptime it
    iso = pc.binary_join_element_wise(
        pc.cast(year_filled, pa.string()), "01", "01", "-"
    )
    return pc.strptime(iso, format="%Y-%m-%d", unit="s").cast(pa.date32())


def fill_date_matrix(
    start: pa.Array, end: pa.Array, default: date = SENTINEL_DATE
) -> tuple[pa.Array, pa.Array]:
    """4-case fill (M15): both null → default; one null → copy the other."""
    d = pa.scalar(default, pa.date32())
    start = pc.cast(start, pa.date32())
    end = pc.cast(end, pa.date32())
    s2 = pc.coalesce(start, end, d)
    e2 = pc.coalesce(end, start, d)
    return s2, e2


def normalize_date_format(col: pa.Array) -> pa.Array:
    """dd/mm/yyyy strings → yyyy-mm-dd (M17); already-ISO passes through."""
    s = pc.cast(col, pa.string())
    dmy = pc.strptime(s, format="%d/%m/%Y", unit="s", error_is_null=True)
    iso = pc.strptime(s, format="%Y-%m-%d", unit="s", error_is_null=True)
    best = pc.coalesce(dmy, iso)
    return pc.strftime(best, format="%Y-%m-%d")


def exclude_sentinel(col: pa.Array) -> pa.Array:
    """Null out sentinel dates (used by observation-period aggregation,
    create_observation_periods.py:38-166 excludes 1900-01-01)."""
    col = pc.cast(col, pa.date32())
    return pc.if_else(
        pc.equal(col, pa.scalar(SENTINEL_DATE, pa.date32())),
        pa.scalar(None, pa.date32()),
        col,
    )
