"""Composed full reference pipeline (VERDICT r1 missing #1): stage-1 →
stage-2 across 5 OMOP tables on FIXTURES.md §B-shaped data, asserting
reference-shaped invariants — no null concept ids, CDM 5.4 column
lists, integer person rekey in every fact table, observation periods
spanning all fact dates, sentinel exclusion."""

from datetime import date

import pandas as pd
import pyarrow as pa
import ray.data as rd

from standardized_omop_data_etl_ray.pipelines.omop import (
    RACE_CONCEPTS,
    VITAL_CONCEPTS,
    run_omop_pipeline,
)
from standardized_omop_data_etl_ray.stages.schema_ops import CDM54_SCHEMAS

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
    {"Participant_ID": ["P1", "P2", "P3"], "subject_group_id": ["1", "5", "17"]}
)

USAGI = pa.table(
    {
        "sourceName": ["Hypertension", "hypertension", "Asthma", "Riluzole"],
        "domainId": ["Condition", "Condition", "Condition", "Drug"],
        "conceptId": pa.array([316866, 316867, 317009, 19006899], pa.int64()),
        "conceptName": ["HTN-a", "HTN-b", "Asthma", "riluzole"],
    }
)

MEDICAL_HISTORY = pa.table(
    {
        "Participant_ID": ["P1", "P1", "P2", "P3"],
        "medhxdsc": ["  HYPERTENSION ", "Unknown thing", "asthma", "Asthma"],
        "medhxyr": ["2010", "junk", "1850", "2015"],
    }
)

# FIXTURES §B6 shape with dirty numerics, inferable/non-inferable units
VITAL_SIGNS = pa.table(
    {
        "Participant_ID": ["P1", "P2", "P3"],
        "vsdt": pa.array([-100, -50, None], pa.int64()),
        "temp": ["98.6*", "37.2", "60"],       # F-dirty, C, unknowable
        "tempu": pa.array([None, 1, None], pa.int64()),  # infer F / declared C
        "bpsys": ["120 ", None, "135"],
        "bpdias": ["80", None, "85"],
        "hr": ["72", "65bpm", None],
        "rr": [None, "16", None],
        "weight": ["154.3", "70", None],
        "weightu": pa.array([2, 1, None], pa.int64()),   # lb, kg
        "height": ["70", "175", None],
        "heightu": pa.array([2, 1, None], pa.int64()),   # in, cm
        "bmi": ["22.1", None, None],
    }
)

MEDICATIONS = pa.table(
    {
        "Participant_ID": ["P1", "P2", "P4"],
        "drugdsc": ["Riluzole", "mystery tonic", "RILUZOLE"],
        "startdt": pa.array([-300, None, -10], pa.int64()),
        "stopdt": pa.array([None, -20, -5], pa.int64()),
    }
)


def _run():
    return run_omop_pipeline(
        rd.from_arrow(DEMOGRAPHICS),
        SUBJECTS,
        rd.from_arrow(MEDICAL_HISTORY),
        rd.from_arrow(VITAL_SIGNS),
        rd.from_arrow(MEDICATIONS),
        USAGI,
    )


def test_full_pipeline_invariants():
    out = {k: v.to_pandas() for k, v in _run().items()}

    # CDM 5.4 column lists, exactly (C2)
    for name, df in out.items():
        assert list(df.columns) == CDM54_SCHEMAS[name], name

    person = out["person"].set_index("person_source_value")
    assert len(person) == 4
    # deterministic rekey: sorted by source value → 1..4
    assert person["person_id"].tolist() == [1, 2, 3, 4]
    assert person.loc["P3", "gender_concept_id"] == 0      # null → 0 (M4)
    assert person.loc["P1", "race_concept_id"] == RACE_CONCEPTS["racewt"]
    assert person.loc["P3", "race_concept_id"] == 0        # 2 flags → 0 (M6)

    cond = out["condition_occurrence"]
    # anti-drop killed 'Unknown thing'; HYPERTENSION fanned out to 2
    assert len(cond) == 4
    assert cond["condition_concept_id"].notna().all()
    assert set(cond["person_id"]) <= set(person["person_id"])
    assert cond["condition_occurrence_id"].tolist() == [1, 2, 3, 4]
    # year sentinel (M2): 1850 → 1900-01-01
    p2 = cond[cond["person_id"] == 2].iloc[0]
    assert p2["condition_start_date"] == date(1900, 1, 1)
    assert "medical_history+medhxdsc" in p2["condition_source_value"]

    meas = out["measurement"]
    m1 = meas[meas["person_id"] == 1].set_index("measurement_source_value")
    # M11 dirty parse + M9 inferred F + M8 F→C: 98.6* → 37.0
    assert m1.loc["temp_c", "value_as_number"] == 37.0
    # declared C passes through
    m2 = meas[meas["person_id"] == 2].set_index("measurement_source_value")
    assert m2.loc["temp_c", "value_as_number"] == 37.2
    # unknowable temp unit dropped; P3's temp=60 not in any range
    m3 = meas[meas["person_id"] == 3]
    assert "temp_c" not in set(m3["measurement_source_value"])
    # M8 conversions: 154.3 lb → 70.0 kg; 70 in → 177.8 cm
    assert m1.loc["weight_kg", "value_as_number"] == 70.0
    assert m1.loc["height_cm", "value_as_number"] == 177.8
    # concept ids attached per vital
    assert m1.loc["bpsys", "measurement_concept_id"] == VITAL_CONCEPTS["bpsys"][0]
    # dirty hr '65bpm' leniently parsed
    assert m2.loc["hr", "value_as_number"] == 65.0
    assert meas["measurement_id"].is_monotonic_increasing

    drug = out["drug_exposure"]
    assert len(drug) == 3
    d = drug.set_index("person_id")
    # default-zero: unmapped drug KEPT with concept 0 (J2 default_zero)
    assert d.loc[2, "drug_concept_id"] == 0
    assert d.loc[1, "drug_concept_id"] == 19006899
    assert d.loc[4, "drug_concept_id"] == 19006899  # case-insensitive
    # M15 date fill: missing end copies start, missing start copies end
    assert d.loc[1, "drug_exposure_end_date"] == d.loc[1, "drug_exposure_start_date"]
    assert d.loc[2, "drug_exposure_start_date"] == d.loc[2, "drug_exposure_end_date"]

    periods = out["observation_period"].set_index("person_id")
    # spans all fact dates (P1's earliest is the 2010 condition); the
    # 1900 sentinel is excluded (A4)
    assert periods.loc[1, "observation_period_start_date"] == date(2010, 1, 1)
    assert periods.loc[2, "observation_period_start_date"] != date(1900, 1, 1)
    # P4 appears via drug dates only
    assert 4 in periods.index
