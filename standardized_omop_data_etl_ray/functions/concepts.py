"""Concept-mapping kernels: dict code maps, null-coalescing, multi-hot.

Reference analogs: M4 check_missing_concept_ids (helpers.py:42-63),
M5 code→concept dicts (demographics--person.py:14-30,
answer_als_medications_log--drug_exposure.py:39-145,
aalsdxfx--observation.py:18-217), M6 multi-hot race resolution
(demographics--person.py:136-223).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

NO_MATCHING_CONCEPT = "No Matching Concept"

# reference dicts kept as public-OMOP standard mappings (demographics--person.py:14-30)
SEX_CONCEPTS = {1: 8507, 2: 8532}
ETHNICITY_CONCEPTS = {1: 38003563, 2: 38003564}
# yes/no/not-assessed (aalsdxfx--observation.py:18-217)
YES_NO_CONCEPTS = {1: 45877994, 2: 45878245, 90: 45881531}


def map_codes(
    col: pa.Array | pa.ChunkedArray,
    mapping: dict,
    default=None,
    out_type: pa.DataType = pa.int64(),
) -> pa.Array:
    """Vectorized dict lookup (pandas map — C hash table per batch)."""
    s = pd.Series(col.to_pandas())
    out = s.map(mapping)
    if default is not None:
        out = out.where(out.notna() & s.notna(), other=np.nan)
        out = out.where(s.isna() | out.notna(), other=default)
    return pa.array(out.astype("Int64") if pa.types.is_integer(out_type) else out,
                    type=out_type)


def coalesce_missing_concepts(
    batch: pa.Table, concept_cols: list[str] | None = None
) -> pa.Table:
    """Null/empty ``*_concept_id`` → 0 and paired ``*_name`` →
    'No Matching Concept' (helpers.py:42-63)."""
    if concept_cols is None:
        concept_cols = [c for c in batch.column_names if c.endswith("_concept_id")]
    for col in concept_cols:
        cid = batch.column(col)
        if pa.types.is_string(cid.type):
            # lenient: anything that isn't a clean integer string (junk,
            # blanks, nulls) coalesces to concept 0 — this function's
            # whole purpose is absorbing bad concept ids, so it must not
            # crash the batch on one malformed value (M4)
            parseable = pc.fill_null(
                pc.match_substring_regex(cid, r"^\s*-?\d+\s*$"), False
            )
            missing = pc.invert(parseable)
            cid_num = pc.cast(
                pc.if_else(missing, None, pc.utf8_trim_whitespace(cid)),
                pa.int64(), safe=False,
            )
        else:
            missing = pc.is_null(cid)
            cid_num = pc.cast(cid, pa.int64())
        fixed = pc.if_else(missing, pa.scalar(0, pa.int64()), cid_num)
        batch = batch.set_column(
            batch.column_names.index(col), col, fixed
        )
        name_col = col.replace("_id", "_name")
        if name_col in batch.column_names:
            name = pc.if_else(
                missing, NO_MATCHING_CONCEPT, pc.cast(batch.column(name_col), pa.string())
            )
            batch = batch.set_column(
                batch.column_names.index(name_col), name_col, name
            )
    return batch


def resolve_multi_hot(
    batch: pa.Table,
    flag_cols: list[str],
    concepts: dict[str, int],
    ambiguous_concept: int = 0,
) -> pa.Array:
    """Multi-hot flags → single concept id: exactly one flag set → its
    mapped concept; zero or many → ``ambiguous_concept``
    (demographics--person.py:136-223 race resolution)."""
    flags = np.column_stack(
        [
            pc.fill_null(pc.cast(batch.column(c), pa.int64()), 0)
            .to_numpy(zero_copy_only=False)
            .astype(bool)
            for c in flag_cols
        ]
    )
    n_set = flags.sum(axis=1)
    concept_vec = np.array([concepts[c] for c in flag_cols], dtype=np.int64)
    # argmax picks the single set flag when n_set == 1
    picked = concept_vec[flags.argmax(axis=1)]
    out = np.where(n_set == 1, picked, ambiguous_concept)
    return pa.array(out, pa.int64())
