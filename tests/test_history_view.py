"""Durable SCD2 history view (pipelines/views.MaterializedHistoryView):
per-epoch folds equal the batch scd2 expansion of the committed winner
log, multi-epoch gaps keep interior versions (no net-collapsing),
compactions in the gap are skipped, restarts re-open from the manifest.

Event waves are version-major (one event per key per epoch), so the
epoch-winner log IS the raw event log and the expected history is
``scd2_history`` over all events — one code path checked against the
other plus a DuckDB lead() oracle."""

import duckdb
import pandas as pd
import pyarrow as pa
import ray.data as rd

from standardized_omop_data_etl_ray.pipelines.cdc import CDCLake
from standardized_omop_data_etl_ray.pipelines.views import (
    MaterializedHistoryView,
)
from standardized_omop_data_etl_ray.spec import TableSpec

N = 40


def _wave(v: int):
    # version-major LSNs: each epoch's window sits ABOVE the previous
    # epoch's (the commit watermark treats lower LSNs as redelivery)
    rows = []
    for d in range(N):
        if v == 1 and d % 7 == 0:
            rows.append(("D", 100 * v + d, f"k{d}", None, None))
        else:
            op = "I" if v == 0 or (v == 2 and d % 7 == 0) else "U"
            rows.append((op, 100 * v + d, f"k{d}", ["en", "de"][d % 2],
                         f"t{d} v{v}"))
    return rows


def _events(rows) -> rd.Dataset:
    return rd.from_arrow(pa.table({
        "op": pa.array([r[0] for r in rows], pa.string()),
        "lsn": pa.array([r[1] for r in rows], pa.int64()),
        "repo": pa.array(["r"] * len(rows), pa.string()),
        "path": pa.array([r[2] for r in rows], pa.string()),
        "commit": pa.array([f"c{r[1]}" for r in rows], pa.string()),
        "lang": pa.array([r[3] for r in rows], pa.string()),
        "content": pa.array([r[4] for r in rows], pa.string()),
    }))


def _expected(waves) -> pd.DataFrame:
    df = pd.concat(
        [pd.DataFrame(w, columns=["op", "lsn", "path", "lang", "content"])
         for w in waves], ignore_index=True
    )
    return duckdb.sql("""
        WITH w AS (
          SELECT *, lead(lsn) OVER (PARTITION BY path ORDER BY lsn)
                 AS valid_to
          FROM df
        )
        SELECT path, lang, content, lsn AS valid_from, valid_to,
               (valid_to IS NULL) AS is_current
        FROM w WHERE op <> 'D' ORDER BY path, valid_from
    """).df()


def _got(view) -> pd.DataFrame:
    df = view.read().to_pandas()
    df["valid_to"] = df["valid_to"].astype("float64")
    return df.sort_values(["path", "valid_from"], ignore_index=True)[
        ["path", "lang", "content", "valid_from", "valid_to", "is_current"]
    ]


def _check(view, waves):
    got, want = _got(view), _expected(waves)
    assert len(got) == len(want)
    for c in want.columns:
        pd.testing.assert_series_equal(
            got[c], want[c], check_names=False, check_dtype=False
        )


def test_history_view_per_epoch_and_gap_folds(tmp_path):
    lake = CDCLake(str(tmp_path / "lk"),
                   TableSpec(name="t", num_partitions=4))
    view = MaterializedHistoryView(
        str(tmp_path / "v"), lake,
        payload_cols=["lang", "content"], num_buckets=3,
    )
    # epoch-by-epoch fold
    lake.apply_events(_events(_wave(0)))
    assert view.refresh()["changed"]
    _check(view, [_wave(0)])
    lake.apply_events(_events(_wave(1)))
    assert view.refresh()["changed"]
    _check(view, [_wave(0), _wave(1)])

    # a 2-epoch GAP in one refresh must keep wave-2's interior versions
    lake.apply_events(_events(_wave(2)))
    lake.apply_events(_events(
        [("U", 1000 + d, f"k{d}", "fr", f"t{d} v3") for d in range(0, N, 5)]
    ))
    rec = view.refresh()
    assert rec["changed"] and rec["from_epoch"] == 2
    waves = [_wave(0), _wave(1), _wave(2),
             [("U", 1000 + d, f"k{d}", "fr", f"t{d} v3")
              for d in range(0, N, 5)]]
    _check(view, waves)

    # idempotent when current; restart re-opens from the manifest
    assert view.refresh()["changed"] is False
    reopened = MaterializedHistoryView(
        str(tmp_path / "v"), lake, payload_cols=["lang", "content"],
    )
    _check(reopened, waves)

    # exactly one open version per live key, none for deleted keys
    got = _got(view)
    open_per_key = got[got["is_current"]].groupby("path").size()
    assert (open_per_key == 1).all()

    # invariant vs the lake: current versions == live state
    state = (
        lake.read_state(drop_engine_cols=True).to_pandas()
        .sort_values("path", ignore_index=True)
    )
    cur = got[got["is_current"]].sort_values("path", ignore_index=True)
    assert list(cur["path"]) == list(state["path"])
    assert list(cur["content"]) == list(state["content"])


def test_history_view_skips_compaction_epochs(tmp_path):
    lake = CDCLake(str(tmp_path / "lk"),
                   TableSpec(name="t", num_partitions=2),
                   auto_compact_files=None)
    view = MaterializedHistoryView(
        str(tmp_path / "v"), lake, payload_cols=["lang", "content"],
    )
    lake.apply_events(_events(_wave(0)))
    view.refresh()
    lake.apply_events(_events(_wave(1)))
    lake.compact()  # rewrites files, never state — must not add versions
    lake.apply_events(_events(_wave(2)))
    view.refresh()
    _check(view, [_wave(0), _wave(1), _wave(2)])


def test_history_view_over_patch_lake(tmp_path):
    """op='P' partial updates compose with the history view:
    epoch_change_set folds patches to full resolved rows, so each
    version row carries the complete post-epoch payload."""
    lake = CDCLake(
        str(tmp_path / "lk"),
        TableSpec(name="t", num_partitions=2, patch_ops=True),
    )
    view = MaterializedHistoryView(
        str(tmp_path / "v"), lake, payload_cols=["lang", "content"],
    )
    base = [("I", d, f"k{d}", "en", f"c{d} v0") for d in range(8)]
    lake.apply_events(_events(base))
    view.refresh()
    # epoch 2: lang-only patches on even keys (content must carry),
    # delete k1
    rows = [("P", 100 + d, f"k{d}", "de", None) for d in range(0, 8, 2)]
    rows.append(("D", 199, "k1", None, None))
    lake.apply_events(_events(rows))
    view.refresh()
    got = _got(view)
    k0 = got[got["path"] == "k0"].reset_index(drop=True)
    # two versions: v0 (closed at the patch lsn) and the patched one
    # with content CARRIED through the column fold
    assert list(k0["valid_from"]) == [0, 100]
    assert list(k0["lang"]) == ["en", "de"]
    assert list(k0["content"]) == ["c0 v0", "c0 v0"]
    assert list(k0["is_current"]) == [False, True]
    k1 = got[got["path"] == "k1"]
    assert len(k1) == 1 and not k1["is_current"].iloc[0]
    assert float(k1["valid_to"].iloc[0]) == 199.0
    k3 = got[got["path"] == "k3"]
    assert len(k3) == 1 and k3["is_current"].iloc[0]


def test_history_view_bucket_cow(tmp_path):
    """A refresh rewrites only buckets holding touched keys; every
    other bucket file carries forward by path (the property that keeps
    refresh cost change-set-sized as history grows)."""
    import json

    lake = CDCLake(str(tmp_path / "lk"),
                   TableSpec(name="t", num_partitions=2))
    view = MaterializedHistoryView(
        str(tmp_path / "v"), lake,
        payload_cols=["lang", "content"], num_buckets=16,
    )
    lake.apply_events(_events(_wave(0)))
    view.refresh()
    m0 = json.loads((view.root / "_VIEW_MANIFEST.json").read_text())

    lake.apply_events(_events([("U", 1000, "k0", "fr", "t0 vX")]))
    rec = view.refresh()
    assert rec["buckets_rewritten"] == 1
    m1 = json.loads((view.root / "_VIEW_MANIFEST.json").read_text())
    changed = {b for b in m1["files"]
               if m0["files"].get(b) != m1["files"][b]}
    assert len(changed) == 1
    _check(view, [_wave(0), [("U", 1000, "k0", "fr", "t0 vX")]])

    # gc drops superseded generations, the live view is unaffected
    gone = view.gc()
    assert gone
    _check(view, [_wave(0), [("U", 1000, "k0", "fr", "t0 vX")]])


def test_history_prune_erasure_and_retention(tmp_path):
    """GDPR composition: delete_where erases the LAKE row; prune(keys=)
    erases the key's whole history; prune(before_valid_to=) is the
    retention sweep (open versions always survive)."""
    import pyarrow.compute as pc

    lake = CDCLake(str(tmp_path / "lk"),
                   TableSpec(name="t", num_partitions=2))
    view = MaterializedHistoryView(
        str(tmp_path / "v"), lake,
        payload_cols=["lang", "content"], num_buckets=8,
    )
    lake.apply_events(_events(_wave(0)))
    lake.apply_events(_events(_wave(1)))
    view.refresh()

    # erase k3's row in the lake, then its history in the view
    lake.delete_where(lambda t: pc.equal(
        t.column("path"), "k3").to_numpy(zero_copy_only=False))
    view.refresh()
    assert (view.read().to_pandas()["path"] == "k3").sum() == 2  # closed
    rec = view.prune(keys=pa.table({"repo": ["r"], "path": ["k3"]}))
    assert rec["buckets_rewritten"] == 1
    got = view.read().to_pandas()
    assert (got["path"] == "k3").sum() == 0
    # other keys' history untouched
    assert (got["path"] == "k2").sum() == 2

    # retention: closed v0 versions (valid_to <= 140) go, opens stay
    n_open = got["is_current"].sum()
    view.prune(before_valid_to=140)
    got2 = view.read().to_pandas()
    assert got2["is_current"].sum() == n_open
    assert not (
        got2["valid_to"].notna() & (got2["valid_to"] <= 140)
    ).any()

    # the view still folds correctly after prunes
    lake.apply_events(_events(_wave(2)))
    view.refresh()
    got3 = view.read().to_pandas()
    open_per_key = got3[got3["is_current"]].groupby("path").size()
    assert (open_per_key == 1).all()
    assert (got3["path"] == "k3").sum() == 1  # reinserted at wave 2
