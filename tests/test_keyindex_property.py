"""Property-based check of the vectorized, transactional KeyIndex
against a straightforward dict model — random op sequences with random
epoch rollbacks, plain and spilling variants."""

import numpy as np
import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from standardized_omop_data_etl_ray.state.keyindex import KeyIndex, SpillableKeyIndex


class Model:
    """Sequential-scan reference semantics with epoch snapshots."""

    def __init__(self):
        self.state: dict[int, tuple[int, bool]] = {}  # key → (lsn, dead)
        self.watermark = -1
        self._pending = None
        self._snap = None

    def begin_epoch(self, epoch):
        if self._pending is not None and epoch == self._pending:
            self.state, self.watermark = self._snap
        self._pending = epoch
        self._snap = (dict(self.state), self.watermark)

    def accept(self, rows):
        out = []
        for k, l, dead in rows:
            cur = self.state.get(k)
            if cur is not None and l <= cur[0]:
                out.append(False)
            else:
                self.state[k] = (l, dead)
                out.append(True)
        if rows:
            self.watermark = max(self.watermark, max(r[1] for r in rows))
        return out

    def live(self):
        return sum(1 for (_, d) in self.state.values() if not d)


def _table(rows):
    return pa.table(
        {
            "op": pa.array(["D" if d else "U" for _, _, d in rows]),
            "lsn": pa.array([l for _, l, _ in rows], pa.int64()),
            "key_hash": pa.array([k for k, _, _ in rows], pa.uint64()),
            "content_sha": pa.array(["s"] * len(rows)),
        }
    )


batch_strategy = st.lists(
    st.tuples(
        st.integers(0, 30),        # key
        st.integers(0, 200),       # lsn
        st.booleans(),             # delete?
    ),
    min_size=0, max_size=25,
)

script_strategy = st.lists(
    st.tuples(batch_strategy, st.booleans()),  # (batch, commit_succeeds)
    min_size=1, max_size=8,
)


def _run(idx, script):
    model = Model()
    epoch = 1
    for batch, commit_ok in script:
        # a failed commit → the SAME epoch is retried with the SAME batch
        for attempt in range(2 if not commit_ok else 1):
            idx.begin_epoch(epoch)
            model.begin_epoch(epoch)
            got = idx.accept_mask(_table(batch)) if batch else np.zeros(0, bool)
            want = model.accept(batch)
            assert list(got) == want, (batch, list(got), want)
        assert len(idx) == model.live()
        assert idx.watermark == model.watermark
        epoch += 1
    return model


@settings(max_examples=60, deadline=None)
@given(script_strategy)
def test_keyindex_matches_model(script):
    _run(KeyIndex(), script)


@settings(max_examples=30, deadline=None)
@given(script_strategy)
def test_spillable_keyindex_matches_model(tmp_path_factory, script):
    d = tmp_path_factory.mktemp("spill")
    _run(SpillableKeyIndex(d, spill_threshold=5, max_runs=2), script)
