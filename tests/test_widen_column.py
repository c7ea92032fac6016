"""widen_column DDL: logical type widening on a live lake.

The proactive complement of arrival-driven widening (spec.evolve):
declare int32→int64/float64 before wide data arrives — one manifest
commit, no rewrite; reads cast narrower files up on scan.
"""

import pyarrow as pa
import pyarrow.compute as pc
import pytest
import ray
import ray.data as rd

from standardized_omop_data_etl_ray.datagen import make_change_events, micro_batches
from standardized_omop_data_etl_ray.pipelines.cdc import CDCLake
from standardized_omop_data_etl_ray.spec import TableSpec
from standardized_omop_data_etl_ray.state import manifest as mf

WINDOW = 400
EVENTS = make_change_events(n_keys=200, n_events=2400, seed=31,
                            window=WINDOW, evolve_after_frac=0.0)
BATCHES = list(micro_batches(EVENTS, batch_windows=2, window=WINDOW))


def _narrow(t: pa.Table) -> pa.Table:
    i = t.schema.get_field_index("size_bytes")
    return t.set_column(i, "size_bytes",
                        t.column("size_bytes").cast(pa.int32()))


def _state(lake, at_epoch=None) -> pa.Table:
    refs = lake.read_state(at_epoch=at_epoch).to_arrow_refs()
    tabs = [t for t in ray.get(refs) if t.num_rows]
    return pa.concat_tables(tabs) if tabs else pa.table({})


def test_widen_column_ddl(tmp_path):
    spec = TableSpec(name="cdc", num_partitions=8)
    lake = CDCLake(tmp_path, spec)
    lake.apply_events(rd.from_arrow(_narrow(BATCHES[0])))
    pre_epoch = mf.read_manifest(str(tmp_path), "cdc")["epoch"]
    st = _state(lake)
    assert st.schema.field("size_bytes").type == pa.int32()

    rec = lake.widen_column("size_bytes", pa.int64())
    assert rec["ddl"] == "widen_column" and rec["compaction"]
    assert rec["from"] == "int32" and rec["to"] == "int64"

    # instant on every read path, values intact, no rewrite
    after = _state(lake)
    assert after.schema.field("size_bytes").type == pa.int64()
    assert pc.sum(after.column("size_bytes")).as_py() == \
        pc.sum(st.column("size_bytes")).as_py()
    assert lake.read_deltas().schema().base_schema.field(
        "size_bytes").type == pa.int64()

    # refusals: narrowing, no-op, structural columns, unknown
    with pytest.raises(ValueError):
        lake.widen_column("size_bytes", pa.int16())
    with pytest.raises(ValueError):
        lake.widen_column("size_bytes", pa.int64())
    with pytest.raises(ValueError):
        lake.widen_column("lsn", pa.float64())
    with pytest.raises(ValueError):
        lake.widen_column("nope", pa.int64())
    # string→int is not a widening
    with pytest.raises(ValueError):
        lake.widen_column("lang", pa.int64())

    # time travel keeps the narrow type
    tt = _state(lake, at_epoch=pre_epoch)
    assert tt.schema.field("size_bytes").type == pa.int32()

    # wide int64 events land without a second evolution commit; narrow
    # int32 redeliveries would also unify up (evolve widens on arrival)
    lake.apply_events(rd.from_arrow(BATCHES[1]))
    st2 = _state(lake)
    assert st2.schema.field("size_bytes").type == pa.int64()

    # compaction materializes the wide type physically
    lake.compact()
    st3 = _state(lake)
    assert st3.schema.field("size_bytes").type == pa.int64()
    assert st3.num_rows == st2.num_rows

    # reopen restores the widened spec; int→float widen also works
    lake2 = CDCLake(tmp_path, TableSpec(name="cdc", num_partitions=8))
    assert lake2.spec.schema.field("size_bytes").type == pa.int64()
    lake2.widen_column("size_bytes", pa.float64())
    assert _state(lake2).schema.field(
        "size_bytes").type == pa.float64()

    # point reads cast too (zone maps remain numerically valid)
    k = {"repo": st2.column("repo")[0].as_py(),
         "path": st2.column("path")[0].as_py()}
    hit = lake2.lookup([k])
    assert hit.schema.field("size_bytes").type == pa.float64()
    assert hit.num_rows == 1


def test_widen_column_before_first_commit(tmp_path):
    # the column must be declared to widen it pre-commit (the default
    # spec learns size_bytes only when events arrive)
    spec = TableSpec(name="cdc", num_partitions=4)
    spec.schema = spec.schema.append(pa.field("size_bytes", pa.int32()))
    lake = CDCLake(tmp_path, spec)
    rec = lake.widen_column("size_bytes", pa.float64())
    assert rec["epoch"] == 0
    lake.apply_events(rd.from_arrow(_narrow(BATCHES[0])))
    st = _state(lake)
    assert st.schema.field("size_bytes").type == pa.float64()
