"""merge_branch: three-way merge of a diverged clone back into its
parent lake (fast-forward, conflict policies, loud failure modes).

Reference analog: combine_subtables.py:89-124 folds a later source into
the accumulated table with priority conflict resolution + a redundant
audit; here the policy is per-call and the audit is the conflict count.
"""

import pyarrow as pa
import pyarrow.compute as pc
import pytest
import ray
import ray.data as rd

from standardized_omop_data_etl_ray.datagen import make_change_events, micro_batches
from standardized_omop_data_etl_ray.oracle import assert_states_equal, oracle_apply
from standardized_omop_data_etl_ray.pipelines.cdc import CDCLake
from standardized_omop_data_etl_ray.spec import TableSpec

WINDOW = 300
EVENTS = make_change_events(n_keys=120, n_events=1500, seed=29, window=WINDOW)
BATCHES = list(micro_batches(EVENTS, batch_windows=2, window=WINDOW))


def _state(lake: CDCLake) -> pa.Table:
    refs = lake.read_state(drop_engine_cols=False).to_arrow_refs()
    tabs = [t for t in ray.get(refs) if t.num_rows]
    return pa.concat_tables(tabs) if tabs else pa.table({})


def _spec(p=6):
    return TableSpec(name="cdc", num_partitions=p)


def _mk_events(rows: list[dict]) -> rd.Dataset:
    cols = {
        "op": pa.array([r["op"] for r in rows], pa.string()),
        "lsn": pa.array([r["lsn"] for r in rows], pa.int64()),
        "repo": pa.array([r["repo"] for r in rows], pa.string()),
        "path": pa.array([r["path"] for r in rows], pa.string()),
        "commit": pa.array([r.get("commit") for r in rows], pa.string()),
        "lang": pa.array([r.get("lang") for r in rows], pa.string()),
        "content": pa.array([r.get("content") for r in rows], pa.string()),
    }
    return rd.from_arrow(pa.table(cols))


def _parent(tmp_path) -> CDCLake:
    lake = CDCLake(tmp_path / "parent", _spec())
    for b in BATCHES[:1]:
        lake.apply_events(rd.from_arrow(b))
    return lake


def test_fast_forward_merge_equals_branch_state(tmp_path):
    """Parent untouched since fork → merge is a fast-forward: the
    parent's state after merge equals the branch's state."""
    parent = _parent(tmp_path)
    branch = parent.clone(str(tmp_path / "branch"))
    branch.apply_events(rd.from_arrow(BATCHES[1]))
    before = _state(branch)

    rec = parent.merge_branch(branch, on_conflict="fail")
    assert rec["committed"] and rec["conflicts"] == 0
    after = _state(parent)
    # payload equality (merge synthesizes fresh LSNs, so compare
    # key→content, not lsn)
    def keyed(t):
        d = t.select(["repo", "path", "content", "lang"]).to_pandas()
        return d.sort_values(["repo", "path"]).reset_index(drop=True)
    pd_b, pd_a = keyed(before), keyed(after)
    assert pd_b.equals(pd_a)


def test_conflict_fail_raises_and_lists(tmp_path):
    parent = _parent(tmp_path)
    branch = parent.clone(str(tmp_path / "branch"))
    # both sides touch key k0 after the fork
    key = {"repo": "r_merge", "path": "k0"}
    branch.apply_events(_mk_events(
        [{"op": "I", "lsn": 10_000, **key, "content": "branch"}]))
    parent.apply_events(_mk_events(
        [{"op": "I", "lsn": 10_001, **key, "content": "parent"}]))
    with pytest.raises(ValueError, match="changed on both sides"):
        parent.merge_branch(branch, on_conflict="fail")


def test_conflict_ours_and_theirs(tmp_path):
    parent = _parent(tmp_path)
    branch = parent.clone(str(tmp_path / "branch"))
    both = {"repo": "r_merge", "path": "both"}
    only_b = {"repo": "r_merge", "path": "only_branch"}
    only_p = {"repo": "r_merge", "path": "only_parent"}
    branch.apply_events(_mk_events([
        {"op": "I", "lsn": 10_000, **both, "content": "branch"},
        {"op": "I", "lsn": 10_000, **only_b, "content": "branch"},
    ]))
    parent.apply_events(_mk_events([
        {"op": "I", "lsn": 10_001, **both, "content": "parent"},
        {"op": "I", "lsn": 10_001, **only_p, "content": "parent"},
    ]))

    # ours: conflicting key keeps the parent value; branch-only lands
    p_ours = CDCLake(tmp_path / "p2", _spec())
    for b in BATCHES[:1]:
        p_ours.apply_events(rd.from_arrow(b))
    br2 = p_ours.clone(str(tmp_path / "b2"))
    br2.apply_events(_mk_events([
        {"op": "I", "lsn": 10_000, **both, "content": "branch"},
        {"op": "I", "lsn": 10_000, **only_b, "content": "branch"},
    ]))
    p_ours.apply_events(_mk_events([
        {"op": "I", "lsn": 10_001, **both, "content": "parent"},
        {"op": "I", "lsn": 10_001, **only_p, "content": "parent"},
    ]))
    rec = p_ours.merge_branch(br2, on_conflict="ours")
    assert rec["conflicts"] == 1
    st = _state(p_ours).to_pandas().set_index("path")["content"].to_dict()
    assert st["both"] == "parent"
    assert st["only_branch"] == "branch"
    assert st["only_parent"] == "parent"

    # theirs: conflicting key takes the branch value
    rec2 = parent.merge_branch(branch, on_conflict="theirs")
    assert rec2["committed"]
    st2 = _state(parent).to_pandas().set_index("path")["content"].to_dict()
    assert st2["both"] == "branch"
    assert st2["only_branch"] == "branch"
    assert st2["only_parent"] == "parent"


def test_branch_delete_propagates(tmp_path):
    """A key deleted on the branch is deleted in the parent by the
    merge (the change set's 'deleted' → tombstone event)."""
    parent = _parent(tmp_path)
    # pick a key live at the fork
    live = _state(parent).to_pandas().iloc[0]
    key = {"repo": live["repo"], "path": live["path"]}
    branch = parent.clone(str(tmp_path / "branch"))
    branch.apply_events(_mk_events(
        [{"op": "D", "lsn": 10_000, **key}]))
    rec = parent.merge_branch(branch)
    assert rec["tombstones"] >= 1
    st = _state(parent).to_pandas()
    gone = st[(st["repo"] == key["repo"]) & (st["path"] == key["path"])]
    assert gone.empty


def test_not_a_clone_refused(tmp_path):
    parent = _parent(tmp_path)
    stranger = CDCLake(tmp_path / "stranger", _spec())
    stranger.apply_events(rd.from_arrow(BATCHES[0]))
    with pytest.raises(ValueError, match="not a clone"):
        parent.merge_branch(stranger)


def test_restore_past_fork_refused(tmp_path):
    parent = CDCLake(tmp_path / "parent", _spec())
    parent.apply_events(rd.from_arrow(BATCHES[0]))
    parent.apply_events(rd.from_arrow(BATCHES[1]))  # fork will be here
    branch = parent.clone(str(tmp_path / "branch"))
    branch.apply_events(_mk_events(
        [{"op": "I", "lsn": 10_000, "repo": "r", "path": "p",
          "content": "x"}]))
    parent.restore(1)  # roll the parent back past the fork epoch
    with pytest.raises(ValueError, match="fork"):
        parent.merge_branch(branch)


def test_empty_branch_merge_is_noop(tmp_path):
    parent = _parent(tmp_path)
    branch = parent.clone(str(tmp_path / "branch"))
    rec = parent.merge_branch(branch)
    assert rec["rows_merged"] == 0 and rec["conflicts"] == 0
    # parent state unchanged vs the oracle of its own log
    assert_states_equal(
        _state(parent), oracle_apply(BATCHES[0]))
