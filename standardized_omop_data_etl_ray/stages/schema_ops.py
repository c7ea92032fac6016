"""Schema operations: pad-to-canonical, union-by-name (C1/C2/C3/C4).

Reference analogs: add_missing_columns.py:12-57 pads every OMOP table to
the published CDM 5.4 column list (full lists hardcoded at
add_missing_columns.py:64-261); pd.concat union-by-name with NaN fill at
combine_subtables.py:124; type re-coercion at combine_subtables.py:35-38.
The CDM 5.4 column lists below come from the public OHDSI CDM 5.4 spec
(the same source the reference hardcodes).
"""

from __future__ import annotations

import pyarrow as pa

import ray.data as rd

# Public OMOP CDM v5.4 canonical column order (subset of tables the
# reference emits; add_missing_columns.py:64-261 carries the same lists).
CDM54_SCHEMAS: dict[str, list[str]] = {
    "person": [
        "person_id", "gender_concept_id", "year_of_birth", "month_of_birth",
        "day_of_birth", "birth_datetime", "race_concept_id",
        "ethnicity_concept_id", "location_id", "provider_id", "care_site_id",
        "person_source_value", "gender_source_value",
        "gender_source_concept_id", "race_source_value",
        "race_source_concept_id", "ethnicity_source_value",
        "ethnicity_source_concept_id",
    ],
    "condition_occurrence": [
        "condition_occurrence_id", "person_id", "condition_concept_id",
        "condition_start_date", "condition_start_datetime",
        "condition_end_date", "condition_end_datetime",
        "condition_type_concept_id", "condition_status_concept_id",
        "stop_reason", "provider_id", "visit_occurrence_id",
        "visit_detail_id", "condition_source_value",
        "condition_source_concept_id", "condition_status_source_value",
    ],
    "death": [
        "person_id", "death_date", "death_datetime", "death_type_concept_id",
        "cause_concept_id", "cause_source_value", "cause_source_concept_id",
    ],
    "observation_period": [
        "observation_period_id", "person_id", "observation_period_start_date",
        "observation_period_end_date", "period_type_concept_id",
    ],
    "measurement": [
        "measurement_id", "person_id", "measurement_concept_id",
        "measurement_date", "measurement_datetime", "measurement_time",
        "measurement_type_concept_id", "operator_concept_id",
        "value_as_number", "value_as_concept_id", "unit_concept_id",
        "range_low", "range_high", "provider_id", "visit_occurrence_id",
        "visit_detail_id", "measurement_source_value",
        "measurement_source_concept_id", "unit_source_value",
        "unit_source_concept_id", "value_source_value",
        "measurement_event_id", "meas_event_field_concept_id",
    ],
    "observation": [
        "observation_id", "person_id", "observation_concept_id",
        "observation_date", "observation_datetime",
        "observation_type_concept_id", "value_as_number", "value_as_string",
        "value_as_concept_id", "qualifier_concept_id", "unit_concept_id",
        "provider_id", "visit_occurrence_id", "visit_detail_id",
        "observation_source_value", "observation_source_concept_id",
        "unit_source_value", "qualifier_source_value", "value_source_value",
        "observation_event_id", "obs_event_field_concept_id",
    ],
    "drug_exposure": [
        "drug_exposure_id", "person_id", "drug_concept_id",
        "drug_exposure_start_date", "drug_exposure_start_datetime",
        "drug_exposure_end_date", "drug_exposure_end_datetime",
        "verbatim_end_date", "drug_type_concept_id", "stop_reason",
        "refills", "quantity", "days_supply", "sig", "route_concept_id",
        "lot_number", "provider_id", "visit_occurrence_id",
        "visit_detail_id", "drug_source_value", "drug_source_concept_id",
        "route_source_value", "dose_unit_source_value",
    ],
    "procedure_occurrence": [
        "procedure_occurrence_id", "person_id", "procedure_concept_id",
        "procedure_date", "procedure_datetime", "procedure_end_date",
        "procedure_end_datetime", "procedure_type_concept_id",
        "modifier_concept_id", "quantity", "provider_id",
        "visit_occurrence_id", "visit_detail_id", "procedure_source_value",
        "procedure_source_concept_id", "modifier_source_value",
    ],
    "device_exposure": [
        "device_exposure_id", "person_id", "device_concept_id",
        "device_exposure_start_date", "device_exposure_start_datetime",
        "device_exposure_end_date", "device_exposure_end_datetime",
        "device_type_concept_id", "unique_device_id",
        "production_id", "quantity", "provider_id", "visit_occurrence_id",
        "visit_detail_id", "device_source_value", "device_source_concept_id",
        "unit_concept_id", "unit_source_value", "unit_source_concept_id",
    ],
}


def pad_to_columns(
    batch: pa.Table, columns: list[str], keep_extras: bool = True
) -> pa.Table:
    """Add missing columns as nulls, reorder to canonical order, keep
    extras at the end (add_missing_columns.py:26-53)."""
    n = batch.num_rows
    present = set(batch.column_names)
    out_cols, out_names = [], []
    for c in columns:
        if c in present:
            out_cols.append(batch.column(c))
        else:
            out_cols.append(pa.nulls(n, pa.string()))
        out_names.append(c)
    if keep_extras:
        for c in batch.column_names:
            if c not in columns:
                out_cols.append(batch.column(c))
                out_names.append(c)
    return pa.table(dict(zip(out_names, out_cols)))


def pad_to_schema(batch: pa.Table, schema: pa.Schema) -> pa.Table:
    """Typed variant: pad + cast to an explicit pa.Schema (C2/C4)."""
    n = batch.num_rows
    cols = []
    for f in schema:
        if f.name in batch.column_names:
            cols.append(batch.column(f.name).cast(f.type))
        else:
            cols.append(pa.nulls(n, f.type))
    return pa.Table.from_arrays(cols, schema=schema)


def union_by_name(datasets: list[rd.Dataset]) -> rd.Dataset:
    """Union heterogeneous-schema Datasets by column name with null fill
    (combine_subtables.py:124 / auxiliary_chemistry_labs S3) — computes
    the unified schema from the inputs, pads each side, then unions."""
    schemas = []
    for ds in datasets:
        s = ds.schema()
        schemas.append(pa.schema(list(zip(s.names, s.types))))
    unified = pa.unify_schemas(schemas, promote_options="permissive")
    padded = [
        ds.map_batches(
            lambda b, sch=unified: pad_to_schema(b, sch), batch_format="pyarrow"
        )
        for ds in datasets
    ]
    out = padded[0]
    for ds in padded[1:]:
        out = out.union(ds)
    return out


def multiset_counts(
    left: rd.Dataset,
    right: rd.Dataset,
    cols: list[str],
    num_buckets: int | None = None,
) -> rd.Dataset:
    """Shared engine for bag (multiset) set operations: one
    cardinality-safe reduce producing per-row-value counts on each side
    — (cols..., n_left, n_right).  Each input pre-counts inside its own
    map pass (one row per distinct value per block through the
    exchange), then a single bucketed sum co-locates the two sides."""
    import pyarrow as pa

    from .joins import bucketed_sum

    def counted(tag: str):
        def fn(df):
            import pandas as pd

            g = df.groupby(cols, sort=False, dropna=False).size()
            out = g.reset_index(name="__n")
            out["n_left"] = out["__n"] if tag == "l" else 0
            out["n_right"] = out["__n"] if tag == "r" else 0
            return out.drop(columns="__n")

        return fn

    both = left.select_columns(cols).map_batches(
        counted("l"), batch_format="pandas"
    ).union(
        right.select_columns(cols).map_batches(
            counted("r"), batch_format="pandas"
        )
    )
    return bucketed_sum(both, cols, ["n_left", "n_right"],
                        num_buckets=num_buckets, combine=False)


def _replicate(t, cols: list[str], reps):
    """Rows of ``t[cols]`` repeated per-row ``reps`` times (vectorized
    take on a repeat index)."""
    import numpy as np
    import pyarrow as pa

    idx = np.repeat(np.arange(len(reps), dtype=np.int64), reps)
    return t.select(cols).take(pa.array(idx))


def except_all(
    left: rd.Dataset,
    right: rd.Dataset,
    cols: list[str],
    num_buckets: int | None = None,
) -> rd.Dataset:
    """SQL ``EXCEPT ALL`` (bag difference): each row value appears
    ``max(0, count_left − count_right)`` times.  Never materializes
    either input on the driver — both sides stream through per-block
    pre-counts into one bucketed reduce, and the output replicates
    values vectorized from the count table."""
    import pyarrow as pa
    import pyarrow.compute as pc

    counts = multiset_counts(left, right, cols, num_buckets)

    def emit(t: pa.Table) -> pa.Table:
        import numpy as np

        nl = t.column("n_left").to_numpy(zero_copy_only=False)
        nr = pc.fill_null(t.column("n_right"), 0).to_numpy(
            zero_copy_only=False
        )
        reps = np.maximum(0, nl - nr)
        return _replicate(t, cols, reps)

    return counts.map_batches(emit, batch_format="pyarrow")


def intersect_all(
    left: rd.Dataset,
    right: rd.Dataset,
    cols: list[str],
    num_buckets: int | None = None,
) -> rd.Dataset:
    """SQL ``INTERSECT ALL`` (bag intersection): each row value appears
    ``min(count_left, count_right)`` times.  Same one-reduce shape as
    ``except_all``."""
    import pyarrow as pa

    counts = multiset_counts(left, right, cols, num_buckets)

    def emit(t: pa.Table) -> pa.Table:
        import numpy as np

        nl = t.column("n_left").to_numpy(zero_copy_only=False)
        nr = t.column("n_right").to_numpy(zero_copy_only=False)
        reps = np.minimum(nl, nr)
        return _replicate(t, cols, reps)

    return counts.map_batches(emit, batch_format="pyarrow")


def json_extract_column(
    ds: rd.Dataset,
    json_col: str,
    path: str,
    out_col: str,
    out_type: pa.DataType | None = None,
) -> rd.Dataset:
    """Extract one field from a JSON string column — the
    semi-structured projection every event/log pipeline needs (the
    reference's provenance pipe-strings are the same idea with a
    homegrown format).  ``path`` is a JSONPath like ``$.k``.

    Vectorized per batch through the worker's process-local DuckDB
    connection (the ``functions.hashing`` pattern — one SQL kernel
    over the Arrow batch, no Python per row); nulls and missing keys
    yield null.  ``out_type`` casts the extracted string (JSON scalars
    arrive as text)."""
    from ..functions.hashing import _HAVE_DUCKDB, _con

    if not _HAVE_DUCKDB:  # pragma: no cover — duckdb is baked in
        raise RuntimeError("json_extract_column requires duckdb")

    def extract(t: pa.Table) -> pa.Table:
        sv = pa.table({"j": t.column(json_col)})
        got = _con().execute(
            f"SELECT json_extract_string(j, '{path}') AS v FROM sv"
        ).fetch_arrow_table().column("v")
        if out_type is not None:
            got = got.cast(out_type)
        return t.append_column(out_col, got)

    return ds.map_batches(extract, batch_format="pyarrow")


def extract_all_matches(
    ds: rd.Dataset,
    text_col: str,
    pattern: str,
    id_cols: list[str],
) -> rd.Dataset:
    """Exploded regex scan — every match of ``pattern`` in ``text_col``
    as its own row with a 1-based ordinal: the entity/PII-scanner
    shape (the scanning counterpart of ``corpus.redact_pii``, which
    rewrites in place).  Output: ``id_cols`` + (idx, match).

    Vectorized per batch: the worker's process-local DuckDB connection
    runs ``regexp_extract_all`` as one SQL kernel over the Arrow batch
    (the ``functions.hashing`` pattern, zero Python per row), and the
    resulting ``list<string>`` column explodes through the zero-copy
    ``unpivot.unnest_list`` carry — no shuffle anywhere; docs with no
    match emit no rows."""
    from ..functions.hashing import _HAVE_DUCKDB, _con
    from .unpivot import unnest_list

    if not _HAVE_DUCKDB:  # pragma: no cover — duckdb is baked in
        raise RuntimeError("extract_all_matches requires duckdb")
    pat_sql = pattern.replace("'", "''")

    def scan(t: pa.Table) -> pa.Table:
        sv = pa.table({"s": t.column(text_col)})
        got = _con().execute(
            f"SELECT regexp_extract_all(s, '{pat_sql}') AS m FROM sv"
        ).fetch_arrow_table().column("m")
        out = t.select(id_cols)
        return out.append_column("__matches", got)

    exploded = ds.map_batches(scan, batch_format="pyarrow")
    return unnest_list(exploded, "__matches", id_cols,
                       value_col="match")
