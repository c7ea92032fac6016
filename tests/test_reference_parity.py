"""End-to-end reference-semantics mini-pipeline on FIXTURES.md §B shapes:

demographics → person (M1 dates, M5 dict maps, M6 multi-hot race,
J1 broadcast join), medical_history → condition_occurrence (J2 usagi
join anti-drop, M2 year sentinel, M13 provenance, M4 concept
coalescing), A1 priority merge with redundant log, C2 CDM 5.4 pad,
A4 observation periods, M18 9-digit ids.  Mirrors the reference's
stage-1 → stage-2 flow (pipeline_process_subtables_to_final.py:94-180)
as one composed Ray Data pipeline.
"""

from datetime import date

import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from standardized_omop_data_etl_ray.functions.concepts import (
    ETHNICITY_CONCEPTS,
    SEX_CONCEPTS,
    coalesce_missing_concepts,
    map_codes,
    resolve_multi_hot,
)
from standardized_omop_data_etl_ray.functions.dates import (
    relative_day_to_year,
    year_to_date,
)
from standardized_omop_data_etl_ray.functions.ids import nine_digit_id
from standardized_omop_data_etl_ray.functions.provenance import (
    join_provenance,
    provenance_part,
)
from standardized_omop_data_etl_ray.stages.aggregates import observation_periods
from standardized_omop_data_etl_ray.stages.joins import broadcast_join, usagi_join
from standardized_omop_data_etl_ray.stages.merge import priority_merge
from standardized_omop_data_etl_ray.stages.schema_ops import (
    CDM54_SCHEMAS,
    pad_to_columns,
)

RACE_CONCEPTS = {
    "raceamin": 8657, "raceasn": 8515, "raceblk": 8516,
    "racenh": 8557, "racewt": 8527,
}

DEMOGRAPHICS = pa.table(
    {
        "Participant_ID": ["P1", "P2", "P3", "P4"],
        "sex": pa.array([1, 2, None, 1], pa.int64()),
        "ethnic": pa.array([1, 2, 1, None], pa.int64()),
        "dob": pa.array([-12784, -9132, -14610, None], pa.int64()),
        "raceamin": pa.array([0, 0, 1, 0], pa.int64()),
        "raceasn": pa.array([0, 1, 1, 0], pa.int64()),
        "raceblk": pa.array([0, 0, 0, 0], pa.int64()),
        "racenh": pa.array([0, 0, 0, 0], pa.int64()),
        "racewt": pa.array([1, 0, 0, 0], pa.int64()),
    }
)

SUBJECTS = pa.table(
    {
        "Participant_ID": ["P1", "P2", "P3"],
        "subject_group_id": ["1", "5", "17"],
    }
)

USAGI = pa.table(
    {
        "sourceName": ["Hypertension", "hypertension", "Asthma", "Migraine"],
        "domainId": ["Condition", "Condition", "Condition", "Drug"],
        "conceptId": pa.array([316866, 316867, 317009, 999], pa.int64()),
        "conceptName": ["HTN-a", "HTN-b", "Asthma", "nope"],
    }
)

MEDICAL_HISTORY = pa.table(
    {
        "Participant_ID": ["P1", "P1", "P2", "P3"],
        "medhxdsc": ["  HYPERTENSION ", "Unknown thing", "asthma", "Migraine"],
        "medhxyr": ["2010", "junk", "1850", "2015"],
    }
)


def _person_pipeline() -> pd.DataFrame:
    ds = rd.from_arrow(DEMOGRAPHICS)
    ds = broadcast_join(ds, SUBJECTS, on="Participant_ID", how="left")

    def build(batch: pa.Table) -> pa.Table:
        out = pa.table(
            {
                "person_source_value": batch.column("Participant_ID"),
                "gender_concept_id": map_codes(
                    batch.column("sex"), SEX_CONCEPTS
                ),
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

    return ds.map_batches(build, batch_format="pyarrow").to_pandas()


def test_person_transform():
    df = _person_pipeline().set_index("person_source_value").sort_index()
    assert df.loc["P1", "gender_concept_id"] == 8507
    assert df.loc["P2", "gender_concept_id"] == 8532
    assert df.loc["P3", "gender_concept_id"] == 0  # null → No Matching Concept
    # 2016-01-01 - 12784 days = 1980-12-31
    assert df.loc["P1", "year_of_birth"] == 1980
    # exactly-one race flag → mapped; two flags → ambiguous 0 (M6)
    assert df.loc["P1", "race_concept_id"] == RACE_CONCEPTS["racewt"]
    assert df.loc["P3", "race_concept_id"] == 0
    # left join: P4 has no subject group
    assert pd.isna(df.loc["P4", "subject_group_id"])


def _condition_pipeline() -> pd.DataFrame:
    ds = rd.from_arrow(MEDICAL_HISTORY)
    joined = usagi_join(
        ds, USAGI, "medhxdsc", domain="Condition", mode="anti_drop"
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
                "person_id": batch.column("Participant_ID"),
                "condition_concept_id": batch.column("concept_id"),
                "condition_start_date": year_to_date(batch.column("medhxyr")),
                "condition_source_value": prov,
            }
        )

    return joined.map_batches(build, batch_format="pyarrow").to_pandas()


def test_condition_transform():
    df = _condition_pipeline()
    # anti-drop: 'Unknown thing' and Drug-domain 'Migraine' are gone;
    # case-insensitive one-to-many: HYPERTENSION fans out to 2 concepts
    assert len(df) == 3
    p1 = df[df["person_id"] == "P1"]
    assert sorted(p1["condition_concept_id"]) == [316866, 316867]
    # year sentinel: 1850 out of range → 1900-01-01 (M2)
    p2 = df[df["person_id"] == "P2"].iloc[0]
    assert p2["condition_start_date"] == date(1900, 1, 1)
    assert p2["condition_source_value"].startswith(
        "medical_history+medhxdsc: asthma"
    )
    assert " | medical_history+medhxyr: 1850" in p2["condition_source_value"]


def test_full_stage2_flow():
    """A1 merge → C2 pad → A4 periods → M18 ids, like the reference's
    second_scripts sequence."""
    cond = _condition_pipeline()
    src_a = rd.from_arrow(pa.Table.from_pandas(cond, preserve_index=False))
    # a second, lower-priority source with one clashing and one new key
    extra = pd.DataFrame(
        {
            "person_id": ["P1", "P9"],
            "condition_concept_id": [316866, 12345],
            "condition_start_date": [date(2012, 1, 1), date(2013, 1, 1)],
            "condition_source_value": ["dup", "new"],
        }
    )
    src_b = rd.from_arrow(pa.Table.from_pandas(extra, preserve_index=False))
    merged = priority_merge(
        [("medical_history", src_a), ("neurolog", src_b)],
        ["person_id", "condition_concept_id"],
    ).to_pandas()
    winners = merged[~merged["__redundant"]]
    losers = merged[merged["__redundant"]]
    assert len(winners) == 4 and len(losers) == 1
    assert losers.iloc[0]["condition_source_value"] == "dup"
    assert losers.iloc[0]["__source"] == "neurolog"

    # C2: pad to the published CDM 5.4 condition_occurrence shape
    wt = pa.Table.from_pandas(
        winners.drop(columns=["__redundant", "__source"]), preserve_index=False
    )
    padded = pad_to_columns(wt, CDM54_SCHEMAS["condition_occurrence"],
                            keep_extras=False)
    assert padded.column_names == CDM54_SCHEMAS["condition_occurrence"]

    # A4: per-person spans over the condition dates (sentinel excluded)
    periods = observation_periods(
        [(rd.from_arrow(wt), ["condition_start_date"])], person_col="person_id"
    ).to_pandas()
    # P2's only date is the sentinel → default single-day index span (A4)
    from standardized_omop_data_etl_ray.functions.dates import INDEX_DATE

    p2p = periods[periods["person_id"] == "P2"].iloc[0]
    assert p2p["observation_period_start_date"] == INDEX_DATE
    p1 = periods[periods["person_id"] == "P1"].iloc[0]
    assert p1["observation_period_start_date"] == date(2010, 1, 1)

    # M18: 9-digit ids over the numeric tail of person ids
    ids = nine_digit_id(wt.column("person_id")).to_pylist()
    assert all(len(i) == 9 and i.startswith("11") for i in ids)
