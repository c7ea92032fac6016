"""Lenient parsing / unit kernels.

Reference analogs: M8 unit conversions
(vital_signs--measurement.py:20-32,205-209,381-383,413-415), M9 unit
inference from value range (vital_signs--measurement.py:214-234),
M10 regex unit classifier (auxiliary_chemistry_labs--measurement.py:19-46),
M11 lenient numeric parser (vital_signs--measurement.py:35-59),
M12 fuzzy matcher (vital_signs--measurement.py:62-81).
"""

from __future__ import annotations

from difflib import SequenceMatcher


import pyarrow as pa
import pyarrow.compute as pc


def lenient_float(col: pa.Array) -> pa.Array:
    """Strip non-``[0-9.\\-]`` chars then parse float; bare ``.``/``-``/
    empty → null (vital_signs--measurement.py:35-59)."""
    s = pc.cast(col, pa.string())
    cleaned = pc.replace_substring_regex(s, r"[^0-9.\-]", "")
    ok = pc.match_substring_regex(cleaned, r"^-?(\d+\.?\d*|\.\d+)$")
    return pc.cast(
        pc.if_else(pc.fill_null(ok, False), cleaned, None), pa.float64(), safe=False
    )


def fahrenheit_to_celsius(v: pa.Array, ndigits: int = 1) -> pa.Array:
    return pc.round(pc.divide(pc.multiply(pc.subtract(v, 32.0), 5.0), 9.0),
                    ndigits=ndigits)


def pounds_to_kg(v: pa.Array, ndigits: int = 1) -> pa.Array:
    return pc.round(pc.multiply(v, 0.45359237), ndigits=ndigits)


def inches_to_cm(v: pa.Array, ndigits: int = 1) -> pa.Array:
    return pc.round(pc.multiply(v, 2.54), ndigits=ndigits)


def infer_temp_unit(v: pa.Array) -> pa.Array:
    """Missing temperature unit: 35–40 → 'C', 95–104 → 'F', else null
    (row dropped downstream) — vital_signs--measurement.py:214-234."""
    c = pc.and_(pc.greater_equal(v, 35.0), pc.less_equal(v, 40.0))
    f = pc.and_(pc.greater_equal(v, 95.0), pc.less_equal(v, 104.0))
    return pc.if_else(
        pc.fill_null(c, False), "C",
        pc.if_else(pc.fill_null(f, False), "F", pa.scalar(None, pa.string())),
    )


def classify_unit_family(unit: pa.Array) -> pa.Array:
    """'U/L'-family vs 'mg/dL'-family detection
    (auxiliary_chemistry_labs--measurement.py:19-46): returns
    'enzymatic' | 'mass' | null."""
    s = pc.cast(unit, pa.string())
    ul = pc.match_substring_regex(s, r"(?i)\bu\s*/\s*l\b")
    mg = pc.match_substring_regex(s, r"(?i)mg\s*/\s*dl")
    return pc.if_else(
        pc.fill_null(ul, False), "enzymatic",
        pc.if_else(pc.fill_null(mg, False), "mass", pa.scalar(None, pa.string())),
    )


def fuzzy_match_mask(
    col: pa.Array, target: str, threshold: float = 0.8
) -> pa.Array:
    """substring OR SequenceMatcher ratio > threshold
    (vital_signs--measurement.py:62-81).  Python loop by design — the
    reference applies this only to a rare sparse column; callers must
    pre-filter to the non-null rows (documented scalar fallback path)."""
    tgt = target.lower()
    vals = col.to_pylist()
    out = []
    for v in vals:
        if v is None:
            out.append(False)  # reference: non-string → False (:69-70)
            continue
        s = str(v).lower()
        out.append(tgt in s or SequenceMatcher(None, s, tgt).ratio() > threshold)
    return pa.array(out, pa.bool_())


def pack_years(years: pa.Array, packs_per_day: pa.Array) -> pa.Array:
    """Derived metric M14 (environmental_questionnaire--observation.py:480-516):
    years × packs/day × 365."""
    return pc.multiply(pc.multiply(years, packs_per_day), 365.0)
