"""Key-synthesis / id-transform kernels.

Reference analogs: M3 get_visit_occurrence_id (helpers.py:101-115),
M18 9-digit id transform (transform_ids.py:5-25), A5 sequential id
assignment is in stages/aggregates.py (needs global coordination).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc


def visit_occurrence_id(person: pa.Array, visit_date: pa.Array) -> pa.Array:
    """``{person}_{date}``; missing/blank date → ``{person}_0``
    (helpers.py:101-115)."""
    p = pc.cast(person, pa.string())
    d = pc.utf8_trim_whitespace(pc.cast(visit_date, pa.string()))
    d = pc.if_else(pc.fill_null(pc.equal(d, ""), True), "0", d)
    return pc.binary_join_element_wise(p, d, "_")


def nine_digit_id(col: pa.Array) -> pa.Array:
    """Any id → 9-char string ``"11" + zeros + digits(id)``; ids longer
    than 7 digits keep their LAST 7 (transform_ids.py:5-25)."""
    s = pc.cast(col, pa.string())
    digits = pc.replace_substring_regex(s, r"\D", "")
    tail7 = pc.utf8_slice_codeunits(digits, start=-7, stop=2**31 - 1)
    # utf8_slice with negative start on short strings returns whole string
    padded = pc.utf8_lpad(tail7, width=7, padding="0")
    return pc.binary_join_element_wise(
        pa.scalar("11"), padded, ""
    )


def regex_extract_key(col: pa.Array, pattern: str, group: str = "k") -> pa.Array:
    """Reverse-parse a natural key out of a formatted string (J5:
    add_condition_occurrences.py:39-47 splits person_source_value to
    recover Participant_ID).  Vectorized ``pc.extract_regex``; callers
    then broadcast-join on the extracted key."""
    return pc.struct_field(
        pc.extract_regex(pc.cast(col, pa.string()), pattern), group
    )


def stable_key_id(*cols: pa.Array, digits: int | None = None) -> pa.Array:
    """Deterministic int64 surrogate id from the natural key (replaces the
    reference's order-dependent ``range(1, n+1)`` at create_table_ids.py:44
    — id must not depend on arrival/concat order at scale).

    ``digits`` optionally bounds the id to < 10**digits (collision space
    shrinks accordingly — only use for presentation-constrained ids);
    default keeps the full 62-bit space."""
    from .hashing import key_hash_u64

    kh = key_hash_u64(*cols)
    # mask to 62 bits → positive int64
    import numpy as np

    v = kh.to_numpy(zero_copy_only=False).astype(np.uint64) >> np.uint64(2)
    if digits is not None:
        v = v % np.uint64(10 ** digits)
    return pa.array(v.astype(np.int64), pa.int64())
