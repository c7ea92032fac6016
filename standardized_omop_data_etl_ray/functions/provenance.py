"""Provenance pipe-string builder (M13).

The reference builds ``table+var (interp): value (interp) | …`` strings in
five near-identical implementations (medical_history--drug_exposure.py:24-49,
aalsdxfx--observation.py:220-243, aalshxfx--observation.py:165-183,
environmental_questionnaire--observation.py:57-99,
answer_als_medications_log--drug_exposure.py:23-36).  One shared
vectorized kernel here; deterministic output feeds the row sha256.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc


def provenance_part(
    source: str, var: str, value: pa.Array, interp: pa.Array | None = None
) -> pa.Array:
    """``source+var: value`` or ``source+var: value (interp)`` when an
    interpretation differs from the raw value; null value → null part."""
    v = pc.cast(value, pa.string())
    head = pa.scalar(f"{source}+{var}: ")
    base = pc.binary_join_element_wise(head, v, "")
    if interp is None:
        return base
    i = pc.cast(interp, pa.string())
    differs = pc.and_kleene(pc.is_valid(i), pc.not_equal(v, i))
    with_interp = pc.binary_join_element_wise(base, " (", i, ")", "")
    return pc.if_else(pc.fill_null(differs, False), with_interp, base)


def join_provenance(*parts: pa.Array) -> pa.Array:
    """Pipe-join non-null parts per row (readme.md:93-95 format)."""
    out = None
    for p in parts:
        if out is None:
            out = p
            continue
        joined = pc.binary_join_element_wise(out, p, " | ")
        # null part → keep accumulated; null accumulated → take part
        out = pc.coalesce(joined, out, p)
    return out
