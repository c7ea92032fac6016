"""Composed multi-table OMOP pipeline — the reference's full stage-1 →
stage-2 flow (pipeline_process_subtables_to_final.py:94-180) as one
registered Ray Data pipeline.

Stage 1 (per-table transform scripts → our builders):
  * person              — demographics--person.py:40-250 (M1 dates, M5
                          dict maps, M6 multi-hot race, J1 subjects join)
  * condition_occurrence— medical_history--condition_occurrence.py:22-106
                          (J2 usagi anti-drop 1-N, M2 year sentinel,
                          M13 provenance)
  * measurement         — vital_signs--measurement.py:84-489 (M8 unit
                          conversions, M9 unit inference, M11 lenient
                          numerics, M12 fuzzy gate, M7 wide→long)
  * drug_exposure       — answer_als_medications_log--drug_exposure.py:
                          39-261 (J2 usagi default-zero, M15 date-fill
                          matrix, M13 provenance)

Stage 2 (second_scripts → our finishers):
  * J6 global person rekey (person_id_map.py:42-55) — a deterministic
    per-person surrogate id broadcast into every fact table,
  * C2 pad to the published CDM 5.4 column lists (add_missing_columns.py),
  * A4 observation periods across all fact dates
    (create_observation_periods.py:38-166),
  * A5 per-table sequential record ids (create_table_ids.py:27-48).

Every builder takes/returns ``ray.data.Dataset`` — reference-shaped
inputs stream through vectorized ``map_batches``; only the small usagi
mapping and the per-person id map are broadcast (dims).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd

from ..functions.concepts import (
    ETHNICITY_CONCEPTS,
    SEX_CONCEPTS,
    coalesce_missing_concepts,
    map_codes,
    resolve_multi_hot,
)
from ..functions.dates import (
    fill_date_matrix,
    relative_day_to_date,
    relative_day_to_year,
    year_to_date,
)
from ..functions.parsing import (
    fahrenheit_to_celsius,
    infer_temp_unit,
    inches_to_cm,
    lenient_float,
    pounds_to_kg,
)
from ..functions.provenance import join_provenance, provenance_part
from ..stages.aggregates import observation_periods, sequential_ids
from ..stages.joins import broadcast_join, broadcast_rekey, usagi_join
from ..stages.merge import priority_merge
from ..stages.schema_ops import CDM54_SCHEMAS, pad_to_columns, union_by_name
from ..stages.unpivot import UnpivotItem, make_unpivoter

RACE_CONCEPTS = {
    "raceamin": 8657, "raceasn": 8515, "raceblk": 8516,
    "racenh": 8557, "racewt": 8527,
}

# LOINC standard concept ids for the 8 vitals
# (vital_signs--measurement.py:105-453 builds the same 8 record families)
VITAL_CONCEPTS = {
    "temp_c": (3020891, "Body temperature"),
    "bpsys": (3004249, "Systolic blood pressure"),
    "bpdias": (3012888, "Diastolic blood pressure"),
    "hr": (3027018, "Heart rate"),
    "rr": (3024171, "Respiratory rate"),
    "weight_kg": (3025315, "Body weight"),
    "height_cm": (3036277, "Body height"),
    "bmi": (3038553, "Body mass index"),
}

# unit code dictionaries (vital_signs--measurement.py:20-32 analog)
TEMP_UNIT = {1: "C", 2: "F"}
WEIGHT_UNIT = {1: "kg", 2: "lb"}
HEIGHT_UNIT = {1: "cm", 2: "in"}

# ALSFRS-R item → LOINC-style observation concept
# (alsfrs_r--observation.py:52-232 declares the same 14 items)
ALSFRS_CONCEPTS = {
    "alsfrs1": 42529071, "alsfrs2": 42529072, "alsfrs3": 42529073,
    "alsfrs4": 42529074, "alsfrs5a": 42529075, "alsfrs5b": 42529076,
    "alsfrs6": 42529077, "alsfrs7": 42529078, "alsfrs8": 42529079,
    "alsfrs9": 42529080, "alsfrsr1": 42529081, "alsfrsr2": 42529082,
    "alsfrsr3": 42529083, "alsfrst": 42529084,
}

# survey answer {1,2,90} → standard yes/no/not-assessed concepts
# (aalsdxfx--observation.py:18-68 value converters)
YES_NO_CONCEPTS = {1: 45877994, 2: 45878245, 90: 45881531}

OBS_TYPE_SURVEY = 32851  # healthcare-professional-filled survey


def build_person(demographics: rd.Dataset, subjects) -> rd.Dataset:
    """demographics--person.py:40-250: sex/ethnicity dict maps with
    missing→0 coalesce, multi-hot race resolution, relative-day dob →
    year, subjects left join."""
    ds = broadcast_join(demographics, subjects, on="Participant_ID", how="left")

    def build(batch: pa.Table) -> pa.Table:
        out = pa.table(
            {
                "person_source_value": batch.column("Participant_ID"),
                "gender_concept_id": map_codes(batch.column("sex"), SEX_CONCEPTS),
                "ethnicity_concept_id": map_codes(
                    batch.column("ethnic"), ETHNICITY_CONCEPTS
                ),
                "year_of_birth": relative_day_to_year(batch.column("dob")),
                "race_concept_id": resolve_multi_hot(
                    batch, list(RACE_CONCEPTS), RACE_CONCEPTS
                ),
                "subject_group_id": batch.column("subject_group_id"),
            }
        )
        return coalesce_missing_concepts(
            out, ["gender_concept_id", "ethnicity_concept_id"]
        )

    return ds.map_batches(build, batch_format="pyarrow")


def build_condition_occurrence(medical_history: rd.Dataset, usagi) -> rd.Dataset:
    """medical_history--condition_occurrence.py:22-106: usagi anti-drop
    (unmapped rows vanish), 1-N concept fan-out, year→date with the
    1900-01-01 sentinel, pipe-string provenance."""
    joined = usagi_join(
        medical_history, usagi, "medhxdsc", domain="Condition", mode="anti_drop"
    )

    def build(batch: pa.Table) -> pa.Table:
        prov = join_provenance(
            provenance_part("medical_history", "medhxdsc",
                            batch.column("medhxdsc")),
            provenance_part("medical_history", "medhxyr",
                            batch.column("medhxyr")),
        )
        return pa.table(
            {
                "person_source_value": batch.column("Participant_ID"),
                "condition_concept_id": pc.cast(
                    batch.column("concept_id"), pa.int64()
                ),
                "condition_start_date": year_to_date(batch.column("medhxyr")),
                "condition_source_value": prov,
            }
        )

    return joined.map_batches(build, batch_format="pyarrow")


def build_measurement(vital_signs: rd.Dataset) -> rd.Dataset:
    """vital_signs--measurement.py:84-489: 8 vitals per wide row.

    Kernels: M11 lenient numeric parse on every value column; M9 unit
    inference from value range when tempu is null; M8 F→C / lb→kg /
    in→cm conversions; M7 wide→long unpivot with per-vital LOINC
    concepts; M1 relative-day measurement date."""

    def clean(batch: pa.Table) -> pa.Table:
        temp = lenient_float(batch.column("temp"))
        # declared unit code, else inferred from the value range (M9)
        declared = map_codes(batch.column("tempu"), TEMP_UNIT,
                             out_type=pa.string())
        unit = pc.coalesce(declared, infer_temp_unit(temp))
        is_f = pc.equal(pc.fill_null(unit, ""), "F")
        temp_c = pc.if_else(is_f, fahrenheit_to_celsius(temp), temp)
        # rows whose unit is unknowable are dropped for temp only
        temp_c = pc.if_else(pc.is_valid(unit), temp_c, None)

        w = lenient_float(batch.column("weight"))
        wunit = pc.fill_null(
            map_codes(batch.column("weightu"), WEIGHT_UNIT,
                      out_type=pa.string()),
            "kg",
        )
        weight_kg = pc.if_else(pc.equal(wunit, "lb"), pounds_to_kg(w), w)
        h = lenient_float(batch.column("height"))
        hunit = pc.fill_null(
            map_codes(batch.column("heightu"), HEIGHT_UNIT,
                      out_type=pa.string()),
            "cm",
        )
        height_cm = pc.if_else(pc.equal(hunit, "in"), inches_to_cm(h), h)
        return pa.table(
            {
                "Participant_ID": batch.column("Participant_ID"),
                "measurement_date": relative_day_to_date(batch.column("vsdt")),
                "temp_c": temp_c,
                "bpsys": lenient_float(batch.column("bpsys")),
                "bpdias": lenient_float(batch.column("bpdias")),
                "hr": lenient_float(batch.column("hr")),
                "rr": lenient_float(batch.column("rr")),
                "weight_kg": weight_kg,
                "height_cm": height_cm,
                "bmi": lenient_float(batch.column("bmi")),
            }
        )

    items = [
        UnpivotItem(col, cid, name)
        for col, (cid, name) in VITAL_CONCEPTS.items()
    ]
    unpivot = make_unpivoter(
        items,
        ["Participant_ID", "measurement_date"],
        value_col="value_as_number",
        concept_col="measurement_concept_id",
        name_col=None,
        source_col_name="measurement_source_value",
    )

    def rename(batch: pa.Table) -> pa.Table:
        return batch.rename_columns(
            ["person_source_value" if c == "Participant_ID" else c
             for c in batch.column_names]
        )

    return (
        vital_signs.map_batches(clean, batch_format="pyarrow")
        .map_batches(unpivot, batch_format="pyarrow")
        .map_batches(rename, batch_format="pyarrow")
    )


def build_drug_exposure(medications: rd.Dataset, usagi) -> rd.Dataset:
    """answer_als_medications_log--drug_exposure.py:39-261: usagi
    default-zero join (unmapped drugs KEPT with concept 0), M15
    conditional start/end date fill, provenance."""
    joined = usagi_join(
        medications, usagi, "drugdsc", domain="Drug", mode="default_zero"
    )

    def build(batch: pa.Table) -> pa.Table:
        start = relative_day_to_date(batch.column("startdt"))
        end = relative_day_to_date(batch.column("stopdt"))
        s2, e2 = fill_date_matrix(start, end)
        prov = join_provenance(
            provenance_part("medications", "drugdsc", batch.column("drugdsc")),
        )
        return pa.table(
            {
                "person_source_value": batch.column("Participant_ID"),
                "drug_concept_id": pc.cast(batch.column("concept_id"), pa.int64()),
                "drug_exposure_start_date": s2,
                "drug_exposure_end_date": e2,
                "drug_source_value": prov,
            }
        )

    return joined.map_batches(build, batch_format="pyarrow")


def build_observation_alsfrs(alsfrs: rd.Dataset) -> rd.Dataset:
    """alsfrs_r--observation.py:52-269: 14 survey items per wide row →
    one observation each (skip nulls), relative-day date, synthesized
    visit id, survey type concept."""
    from ..functions.ids import visit_occurrence_id

    def prep(batch: pa.Table) -> pa.Table:
        cols = {c: batch.column(c) for c in batch.column_names}
        cols["observation_date"] = relative_day_to_date(
            batch.column("alsfrsdt")
        )
        cols["visit_occurrence_id"] = visit_occurrence_id(
            batch.column("Participant_ID"), batch.column("alsfrsdt")
        )
        return pa.table(cols)

    items = [
        UnpivotItem(col, cid, constants={
            "observation_type_concept_id": OBS_TYPE_SURVEY,
        })
        for col, cid in ALSFRS_CONCEPTS.items()
    ]
    unpivot = make_unpivoter(
        items,
        ["Participant_ID", "observation_date", "visit_occurrence_id"],
        value_col="value_as_number",
        concept_col="observation_concept_id",
        name_col=None,
        source_col_name="observation_source_value",
        value_type=pa.int64(),
    )

    def rename(batch: pa.Table) -> pa.Table:
        return batch.rename_columns(
            ["person_source_value" if c == "Participant_ID" else c
             for c in batch.column_names]
        )

    return (
        alsfrs.map_batches(prep, batch_format="pyarrow")
        .map_batches(unpivot, batch_format="pyarrow")
        .map_batches(rename, batch_format="pyarrow")
    )


def build_observation_indicators(
    indicators: rd.Dataset,
    items: list[UnpivotItem] | None = None,
    value_concepts: dict[int, int] | None = None,
) -> rd.Dataset:
    """aalsdxfx--observation.py:263-543: diagnostic indicator columns →
    one observation per non-null indicator, ``alsdx1`` fanned out to
    THREE concepts, answers mapped to value_as_concept_id via the
    yes/no/not-assessed dictionary (M5), survey type constant."""
    if items is None:
        items = [
            # alsdx1 is emitted under three concepts
            # (aalsdxfx--observation.py:264-290)
            UnpivotItem("alsdx1", 2000002000),
            UnpivotItem("alsdx1", 2000002001),
            UnpivotItem("alsdx1", 2000000020),
            UnpivotItem("alsdx2", 2000000021),
            UnpivotItem("alsdx3", 2000000022),
            UnpivotItem("elescrlr", 2000000061),
        ]
    vc = YES_NO_CONCEPTS if value_concepts is None else value_concepts

    def prep(batch: pa.Table) -> pa.Table:
        cols = {c: batch.column(c) for c in batch.column_names}
        cols["observation_date"] = relative_day_to_date(
            batch.column("alsdxdt")
        )
        return pa.table(cols)

    unpivot = make_unpivoter(
        items,
        ["Participant_ID", "observation_date"],
        value_col="__answer",
        concept_col="observation_concept_id",
        name_col=None,
        source_col_name="observation_source_value",
        value_type=pa.int64(),
    )

    def finish(batch: pa.Table) -> pa.Table:
        vac = map_codes(batch.column("__answer"), vc)
        batch = batch.append_column(
            "value_as_concept_id", pc.fill_null(vac, 0)
        )
        batch = batch.append_column(
            "observation_type_concept_id",
            pa.array([OBS_TYPE_SURVEY] * batch.num_rows, pa.int64()),
        )
        t = batch.drop_columns(["__answer"])
        return t.rename_columns(
            ["person_source_value" if c == "Participant_ID" else c
             for c in t.column_names]
        )

    return (
        indicators.map_batches(prep, batch_format="pyarrow")
        .map_batches(unpivot, batch_format="pyarrow")
        .map_batches(finish, batch_format="pyarrow")
    )


def build_death(mortality: rd.Dataset) -> rd.Dataset:
    """mortality--death.py:29-113: one death row per record; relative-day
    death date with the 1900-01-01 sentinel for missing, cause concept
    coalesced to 0, pipe-string provenance."""
    from ..functions.dates import SENTINEL_DATE

    def build(batch: pa.Table) -> pa.Table:
        d = relative_day_to_date(batch.column("dieddt"))
        d = pc.fill_null(d, pa.scalar(SENTINEL_DATE, pa.date32()))
        prov = join_provenance(
            provenance_part("mortality", "dieddt", batch.column("dieddt")),
            provenance_part("mortality", "diedcaus",
                            batch.column("diedcaus")),
        )
        out = pa.table(
            {
                "person_source_value": batch.column("Participant_ID"),
                "death_date": d,
                "death_type_concept_id": pa.array(
                    [OBS_TYPE_SURVEY] * batch.num_rows, pa.int64()
                ),
                "cause_concept_id": pc.cast(
                    batch.column("cause_concept_id"), pa.int64()
                ),
                "cause_source_value": prov,
            }
        )
        return coalesce_missing_concepts(out, ["cause_concept_id"])

    return mortality.map_batches(build, batch_format="pyarrow")


def build_condition_neurolog(neurolog: rd.Dataset, usagi) -> rd.Dataset:
    """neurolog--condition_occurrence.py:27-106: FIRST-match usagi join
    (one concept per term even when the mapping is 1-N), unmapped rows
    dropped (M16)."""
    joined = usagi_join(
        neurolog, usagi, "neuddsc", domain="Condition", mode="first"
    )

    def build(batch: pa.Table) -> pa.Table:
        prov = join_provenance(
            provenance_part("neurolog", "neuddsc", batch.column("neuddsc")),
        )
        t = pa.table(
            {
                "person_source_value": batch.column("Participant_ID"),
                "condition_concept_id": pc.cast(
                    batch.column("concept_id"), pa.int64()
                ),
                "condition_start_date": relative_day_to_date(
                    batch.column("neudxdt")
                ),
                "condition_source_value": prov,
            }
        )
        # unmapped terms dropped (neurolog--condition_occurrence.py:91-93)
        return t.filter(pc.is_valid(t.column("condition_concept_id")))

    return joined.map_batches(build, batch_format="pyarrow")


def build_usagi_domain_table(
    medical_history: rd.Dataset, usagi, domain: str,
    concept_id_name: str, date_name: str,
) -> rd.Dataset:
    """medical_history--{procedure,device}*.py: the SAME medical-history
    source routed to a different OMOP table by the usagi domain filter
    (anti-drop, 1-N)."""
    joined = usagi_join(
        medical_history, usagi, "medhxdsc", domain=domain, mode="anti_drop"
    )

    def build(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "person_source_value": batch.column("Participant_ID"),
                concept_id_name: pc.cast(batch.column("concept_id"),
                                         pa.int64()),
                date_name: year_to_date(batch.column("medhxyr")),
            }
        )

    return joined.map_batches(build, batch_format="pyarrow")


def run_omop_pipeline(
    demographics: rd.Dataset,
    subjects,
    medical_history: rd.Dataset,
    vital_signs: rd.Dataset,
    medications: rd.Dataset,
    usagi,
    alsfrs: rd.Dataset | None = None,
    indicators: rd.Dataset | None = None,
    mortality: rd.Dataset | None = None,
    neurolog: rd.Dataset | None = None,
    with_procedure_device: bool = False,
    broadcast_person_limit: int = 2_000_000,
) -> dict[str, rd.Dataset]:
    """Stage 1 builders + stage 2 finishers; up to 9 OMOP tables plus
    the A1 redundant audit log.

    Optional inputs widen the composition to the reference's full table
    set: ``alsfrs``/``indicators`` feed observation (its largest output,
    readme.md:107-115), ``mortality`` feeds death, ``neurolog`` is a
    SECOND condition source merged through ``priority_merge`` with
    medical_history winning on key (person, concept) and losers
    surfaced as ``condition_occurrence__redundant`` with source
    attribution — the reference's combine_subtables.py:98-157 audit.

    Returns {table: Dataset} with CDM 5.4 column lists, integer
    person_id rekeyed into every fact table, sequential record ids, and
    observation periods spanning all fact dates."""
    person = build_person(demographics, subjects)
    cond_mh = build_condition_occurrence(medical_history, usagi)
    measurement = build_measurement(vital_signs)
    drug = build_drug_exposure(medications, usagi)

    merged_lazy = None
    if neurolog is not None:
        # A1: two sources → one table; first source in the priority
        # list wins per (person, concept) key, later rows are diverted
        # to the audit log (combine_subtables.py:42-157).  Built LAZY
        # here and materialized INSIDE the concurrent fact pool below —
        # measured 2.2 s when run inline before the pool, fully
        # overlappable with the other facts' rekey+materialize (~1.9 s)
        cond_nl = build_condition_neurolog(neurolog, usagi)
        merged_lazy = priority_merge(
            [("medical_history", cond_mh), ("neurolog", cond_nl)],
            key_cols=["person_source_value", "condition_concept_id"],
        )

    observation = None
    if alsfrs is not None or indicators is not None:
        parts = []
        if alsfrs is not None:
            parts.append(build_observation_alsfrs(alsfrs))
        if indicators is not None:
            parts.append(build_observation_indicators(indicators))
        observation = (
            union_by_name(parts) if len(parts) > 1 else parts[0]
        )

    death = build_death(mortality) if mortality is not None else None
    procedure = device = None
    if with_procedure_device:
        procedure = build_usagi_domain_table(
            medical_history, usagi, "Procedure",
            "procedure_concept_id", "procedure_date",
        )
        device = build_usagi_domain_table(
            medical_history, usagi, "Device",
            "device_concept_id", "device_exposure_start_date",
        )

    # J6 global rekey: deterministic person surrogate ids (sorted by
    # source value — stable under parallelism)
    person = sequential_ids(person, "person_id", sort_col="person_source_value")
    n_persons = person.count()
    if n_persons <= broadcast_person_limit:
        # dimension-sized person set: driver dict + broadcast (J6 —
        # SURVEY.md sanctions this for the person DIMENSION only)
        pid_map = {
            r["person_source_value"]: r["person_id"]
            for r in person.select_columns(
                ["person_source_value", "person_id"]
            ).take_all()
        }

        def rekey(ds: rd.Dataset) -> rd.Dataset:
            ds = broadcast_rekey(ds, pid_map, ["person_source_value"])

            def rn(t: pa.Table) -> pa.Table:
                t = t.rename_columns(
                    ["person_id" if c == "person_source_value" else c
                     for c in t.column_names]
                )
                i = t.column_names.index("person_id")
                return t.set_column(
                    i, "person_id", pc.cast(t.column("person_id"), pa.int64())
                )
            return ds.map_batches(rn, batch_format="pyarrow")
    else:
        # person set too large to broadcast: distributed hash join on
        # the natural key instead of a driver dict (the broadcast path
        # must not be the only one — VERDICT r2 #9)
        from ..stages.joins import partitioned_hash_join

        pid_schema = pa.schema(
            [("person_source_value", pa.string()),
             ("person_id", pa.int64())]
        )

        def rekey(ds: rd.Dataset) -> rd.Dataset:
            pids = person.select_columns(
                ["person_source_value", "person_id"]
            )
            j = partitioned_hash_join(
                ds, pids,
                left_on=["person_source_value"], how="inner",
                right_schema=pid_schema,
            )
            return j.drop_columns(["person_source_value"])

    facts = {"measurement": measurement, "drug": drug}
    if merged_lazy is None:
        facts["condition"] = cond_mh
    for k, v in (("observation", observation), ("death", death),
                 ("procedure", procedure), ("device", device)):
        if v is not None:
            facts[k] = v
    # materialize each rekeyed fact ONCE: every fact is consumed 2-3x
    # (observation-period spans, sequential-id sort, per-table output) —
    # lazy re-execution would re-run the builder chain per consumer.
    # Blocks sit in the (spillable) object store, so this bounds memory
    # the same way any shuffle output does.  The materializations run
    # concurrently (one streaming executor per dataset, one driver
    # thread each) so independent fact builders share the cluster
    # instead of executing back-to-back.  The two-source condition
    # merge joins the same pool: its shuffle is materialized once, then
    # winners and the audit log are two cheap filters over it.
    from concurrent.futures import ThreadPoolExecutor

    def _merge_and_split():
        merged = merged_lazy.materialize()
        cond = merged.filter(expr="__redundant == False").drop_columns(
            ["__redundant", "__source"]
        )
        red = merged.filter(expr="__redundant == True").drop_columns(
            ["__redundant"]
        )
        with ThreadPoolExecutor(max_workers=2) as p2:
            fc = p2.submit(lambda: rekey(cond).materialize())
            fr = p2.submit(lambda: rekey(red).materialize())
            return fc.result(), fr.result()

    with ThreadPoolExecutor(max_workers=len(facts) + 1) as pool:
        futs = {k: pool.submit(lambda d: rekey(d).materialize(), v)
                for k, v in facts.items()}
        fut_merge = (
            pool.submit(_merge_and_split) if merged_lazy is not None
            else None
        )
        facts = {k: f.result() for k, f in futs.items()}
        if fut_merge is not None:
            facts["condition"], facts["redundant"] = fut_merge.result()

    # A4: observation periods across every fact table's dates —
    # materialized once: its consumer (sequential_ids) both peeks the
    # schema and pulls the blocks, and a lazy all-to-all chain would
    # execute fully for each.
    period_inputs = [
        (facts["condition"], ["condition_start_date"]),
        (facts["measurement"], ["measurement_date"]),
        (facts["drug"], ["drug_exposure_start_date",
                         "drug_exposure_end_date"]),
    ]
    if "observation" in facts:
        period_inputs.append((facts["observation"], ["observation_date"]))
    periods = observation_periods(
        period_inputs, person_col="person_id"
    ).materialize()

    # A5 sequential record ids + C2 pad to the published CDM 5.4 shapes
    out = {}
    plan = [
        ("person", person, None, None),
        ("condition_occurrence", facts["condition"],
         "condition_occurrence_id", "person_id"),
        ("measurement", facts["measurement"], "measurement_id", "person_id"),
        ("drug_exposure", facts["drug"], "drug_exposure_id", "person_id"),
        ("observation_period", periods, "observation_period_id", "person_id"),
    ]
    if "observation" in facts:
        plan.append(("observation", facts["observation"],
                     "observation_id", "person_id"))
    if "death" in facts:
        plan.append(("death", facts["death"], None, None))
    if "procedure" in facts:
        plan.append(("procedure_occurrence", facts["procedure"],
                     "procedure_occurrence_id", "person_id"))
    if "device" in facts:
        plan.append(("device_exposure", facts["device"],
                     "device_exposure_id", "person_id"))
    # NOTE: running these sorts concurrently (ThreadPoolExecutor, as
    # for the fact materializations above) was measured SLOWER (5.1s
    # vs 3.5s at sf0.1/32cpus): unlike the map-only materializations,
    # concurrent all-to-all sorts contend for the whole cluster and
    # serialize anyway, paying extra coordination.
    for name, ds, id_col, sort_col in plan:
        if id_col:
            ds = sequential_ids(ds, id_col, sort_col=sort_col)
        cols = CDM54_SCHEMAS[name]
        out[name] = ds.map_batches(
            lambda t, cols=cols: pad_to_columns(t, cols, keep_extras=False),
            batch_format="pyarrow",
        )
    if "redundant" in facts:
        # audit side-output: NOT padded — keeps natural columns +
        # __source attribution (redundant/*.csv analog)
        out["condition_occurrence__redundant"] = facts["redundant"]
    return out
