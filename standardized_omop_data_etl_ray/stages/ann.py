"""Approximate-nearest-neighbor search over an embedding column.

Brute-force cosine top-k is the exactness baseline (one numpy matmul per
batch against a broadcast query matrix — no shuffle, embarrassingly
parallel); the IVF variant is the scale path (coarse k-means-ish
centroids → probe the nearest ``nprobe`` cells only).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


import ray
import ray.data as rd


def _normalize(M: np.ndarray) -> np.ndarray:
    return M / np.maximum(np.linalg.norm(M, axis=1, keepdims=True), 1e-12)


def brute_force_topk(
    ds: rd.Dataset,
    queries: np.ndarray,
    query_ids: np.ndarray,
    emb_col: str,
    id_col: str,
    k: int = 5,
) -> rd.Dataset:
    """Exact cosine top-k: each batch scores all queries against its rows
    (matmul), emits per-(query, row) partial top-k; a final per-query
    group keeps the global top-k.  The broadcast is the QUERY matrix
    (small); the corpus streams — correct orientation at 100 TB."""
    Q = _normalize(np.asarray(queries, dtype=np.float32))
    qref = ray.put((np.asarray(query_ids), Q))

    def score(batch: pd.DataFrame) -> pd.DataFrame:
        from .joins import _cached_get

        qids, Qm = _cached_get(qref)
        ids = batch[id_col].to_numpy()
        M = _normalize(np.stack(batch[emb_col].to_numpy()).astype(np.float32))
        S = Qm @ M.T  # (q, n)
        kk = min(k, S.shape[1])
        rows = []
        for qi in range(S.shape[0]):
            # deterministic top-k: cosine DESC then vec_id ASC — the
            # same tiebreak as the SQL oracle; an argpartition without
            # it would keep an arbitrary member of a boundary tie
            order = np.lexsort((ids, -S[qi]))[:kk]
            for j in order:
                rows.append((qids[qi], ids[j], float(S[qi, j])))
        return pd.DataFrame(rows, columns=["query_id", "vec_id", "cosine"])

    partials = ds.map_batches(score, batch_format="pandas")

    def final(g: pd.DataFrame) -> pd.DataFrame:
        # cosine DESC, vec_id ASC (nlargest would break ties DESC)
        return g.sort_values(
            ["cosine", "vec_id"], ascending=[False, True]
        ).head(k)

    return partials.groupby("query_id").map_groups(final, batch_format="pandas")


class IVFIndex:
    """IVF-flat index built with a deterministic k-means (few iterations).

    Build: sample → centroids (driver, small) → assign cells in
    map_batches (one shuffle to group by cell).  Query: probe the
    ``nprobe`` nearest cells only."""

    def __init__(self, n_cells: int = 16, n_iter: int = 5, seed: int = 42):
        self.n_cells, self.n_iter, self.seed = n_cells, n_iter, seed
        self.centroids: np.ndarray | None = None

    def fit(self, sample: np.ndarray) -> "IVFIndex":
        X = _normalize(np.asarray(sample, dtype=np.float32))
        rng = np.random.default_rng(self.seed)
        c = X[rng.choice(len(X), min(self.n_cells, len(X)), replace=False)]
        for _ in range(self.n_iter):
            assign = (X @ c.T).argmax(axis=1)
            for j in range(len(c)):
                members = X[assign == j]
                if len(members):
                    c[j] = _normalize(members.mean(axis=0, keepdims=True))[0]
        self.centroids = c
        return self

    def assign_cells(self, ds: rd.Dataset, emb_col: str) -> rd.Dataset:
        cref = ray.put(self.centroids)

        def fn(batch: pd.DataFrame) -> pd.DataFrame:
            from .joins import _cached_get

            c = _cached_get(cref)
            M = _normalize(np.stack(batch[emb_col].to_numpy()).astype(np.float32))
            batch = batch.copy()
            batch["cell"] = (M @ c.T).argmax(axis=1).astype(np.int32)
            return batch

        return ds.map_batches(fn, batch_format="pandas")

    def probe_cells(self, query: np.ndarray, nprobe: int = 4) -> np.ndarray:
        q = _normalize(query.reshape(1, -1).astype(np.float32))[0]
        return np.argsort(-(self.centroids @ q))[:nprobe].astype(np.int32)


def ivf_topk(
    ds_with_cells: rd.Dataset,
    index: IVFIndex,
    queries: np.ndarray,
    query_ids: np.ndarray,
    emb_col: str,
    id_col: str,
    k: int = 5,
    nprobe: int = 4,
) -> rd.Dataset:
    """ANN top-k probing only the nearest cells per query."""
    cells = set()
    for q in np.asarray(queries):
        cells.update(index.probe_cells(q, nprobe).tolist())
    pruned = ds_with_cells.filter(
        expr=f"cell in {sorted(cells)}"
    )
    return brute_force_topk(pruned, queries, query_ids, emb_col, id_col, k)


def ivf_probe_stats(
    ds_with_cells: rd.Dataset,
    index: IVFIndex,
    probe_queries: np.ndarray,
    probe_ids: np.ndarray,
    emb_col: str,
    id_col: str,
    k: int = 5,
    nprobe: int = 4,
) -> dict:
    """Health probe for a once-fit IVF index on a held-out query slice:

    * ``recall`` — IVF top-k vs exact brute force over the same corpus.
    * ``scan_fraction`` — mean fraction of corpus rows the probed cells
      hold.  This is the metric that catches DEGENERATE drift: an index
      whose centroids no longer span the corpus routes most rows into
      few cells, which keeps recall perfect while silently degrading
      every query to a near-full scan (the IVF cost model is
      scan_fraction ≈ nprobe / n_cells when healthy).

    Both passes stream the corpus; only top-k results and the per-cell
    row histogram (≤ n_cells rows) reach the driver.  At 100 TB this is
    a scheduled maintenance job, not a per-query cost."""
    exact = brute_force_topk(
        ds_with_cells, probe_queries, probe_ids, emb_col, id_col, k
    ).to_pandas()
    approx = ivf_topk(
        ds_with_cells, index, probe_queries, probe_ids,
        emb_col, id_col, k, nprobe,
    ).to_pandas()
    e = exact.groupby("query_id")["vec_id"].apply(set)
    a = approx.groupby("query_id")["vec_id"].apply(set)
    recalls = [
        len(e[q] & a.get(q, set())) / max(len(e[q]), 1) for q in e.index
    ]
    hist = (
        ds_with_cells.groupby("cell").count().to_pandas()
        .set_index("cell")["count()"]
    )
    total = max(int(hist.sum()), 1)
    fracs = [
        hist.reindex(index.probe_cells(q, nprobe)).fillna(0).sum() / total
        for q in np.asarray(probe_queries)
    ]
    return {
        "recall": float(np.mean(recalls)) if recalls else 1.0,
        "scan_fraction": float(np.mean(fracs)) if fracs else 0.0,
    }


def maybe_refit(
    ds: rd.Dataset,
    index: IVFIndex,
    emb_col: str,
    id_col: str,
    probe_queries: np.ndarray,
    probe_ids: np.ndarray,
    fresh_sample: np.ndarray,
    recall_floor: float = 0.9,
    scan_ceiling: float | None = None,
    k: int = 5,
    nprobe: int = 4,
) -> tuple[IVFIndex, rd.Dataset, dict, bool]:
    """Re-fit trigger (drift detector): probe the index's health on
    held-out queries; on recall below ``recall_floor`` OR scan fraction
    above ``scan_ceiling`` (default 3× the healthy nprobe/n_cells
    ratio), re-fit the centroids on ``fresh_sample`` (a corpus-wide
    sample drawn by the caller — e.g. the modular vec_id shard the
    entry queries use) and re-assign cells.  Returns
    ``(index, ds_with_cells, stats, refitted)`` where ``stats`` is the
    PRE-refit measurement that triggered (or cleared) the decision."""
    if scan_ceiling is None:
        scan_ceiling = min(1.0, 3.0 * nprobe / max(index.n_cells, 1))
    with_cells = index.assign_cells(ds, emb_col)
    stats = ivf_probe_stats(
        with_cells, index, probe_queries, probe_ids,
        emb_col, id_col, k, nprobe,
    )
    if stats["recall"] >= recall_floor and stats["scan_fraction"] <= scan_ceiling:
        return index, with_cells, stats, False
    refit = IVFIndex(
        n_cells=index.n_cells, n_iter=index.n_iter, seed=index.seed
    ).fit(fresh_sample)
    return refit, refit.assign_cells(ds, emb_col), stats, True


def distributed_kmeans(
    ds: rd.Dataset,
    emb_col: str,
    id_col: str,
    k: int = 8,
    n_iter: int = 3,
    round_digits: int = 6,
):
    """Fully DISTRIBUTED Lloyd k-means (the iterate-with-broadcast
    shape ``IVFIndex.fit`` approximates on a driver-held sample): each
    iteration broadcasts the k×d centroid matrix once (``ray.put``),
    every block emits per-cluster MERGEABLE partials (count +
    vector sum — ≤ k rows per block cross the driver, never a point),
    and the driver folds them into new means.  The corpus streams; the
    driver only ever holds k×d floats.

    Deterministic and ORACLE-MIRRORABLE: init = the k smallest-id
    vectors; assignment = argmin of the ROUNDED (``round_digits``)
    euclidean distance with ties to the lowest cluster id; centroids
    are re-ROUNDED after every update (DuckDB half-away semantics via
    ``functions.rounding.round_half_away``).  The rounding quantizes
    away FP summation-order differences between the distributed fold
    and a sequential SQL replay, so a fixed-iteration SQL unroll
    reproduces the assignment EXACTLY; empty clusters keep their
    previous centroid (COALESCE in the mirror).

    Returns ``(centroids ndarray, assignments Dataset[id, cluster])``.
    """
    from ..functions.rounding import round_half_away
    from .joins import _cached_get

    # init = the k smallest-id vectors WITHOUT a global sort: per-block
    # bottom-k combiner (≤k rows per block cross the exchange) → one
    # tiny driver merge — a full Dataset.sort here would be an
    # all-to-all shuffle to pick k rows
    def _bottomk(df: pd.DataFrame) -> pd.DataFrame:
        return df.nsmallest(k, id_col)[[id_col, emb_col]]

    init = (
        ds.map_batches(_bottomk, batch_format="pandas")
        .to_pandas().nsmallest(k, id_col)
        .sort_values(id_col, ignore_index=True)
    )
    C = round_half_away(
        np.stack(init[emb_col].to_numpy()).astype(np.float64).ravel(),
        round_digits,
    ).reshape(len(init), -1)
    d = C.shape[1]

    def _assign(X: np.ndarray, c: np.ndarray) -> np.ndarray:
        # n×k×d diff matches the oracle's list_distance term order;
        # argmin over the ROUNDED distance, first-min = lowest cluster
        dist = np.sqrt(((X[:, None, :] - c[None, :, :]) ** 2).sum(-1))
        dr = round_half_away(dist.ravel(), round_digits).reshape(dist.shape)
        return dr.argmin(axis=1)

    for _ in range(int(n_iter)):
        cref = ray.put(C)

        def partial(df: pd.DataFrame) -> pa.Table:
            c = _cached_get(cref)
            if not len(df):
                return pa.table({
                    "cluster": pa.array([], pa.int32()),
                    "n": pa.array([], pa.int64()),
                    "vecsum": pa.array([], pa.list_(pa.float64())),
                })
            X = np.stack(df[emb_col].to_numpy()).astype(np.float64)
            a = _assign(X, c)
            sums = np.zeros((len(c), X.shape[1]), np.float64)
            np.add.at(sums, a, X)
            counts = np.bincount(a, minlength=len(c))
            return pa.table({
                "cluster": pa.array(np.arange(len(c), dtype=np.int32)),
                "n": pa.array(counts.astype(np.int64)),
                "vecsum": pa.array(list(sums)),
            })

        parts = ds.map_batches(partial, batch_format="pandas").take_all()
        sums = np.zeros((k, d), np.float64)
        counts = np.zeros(k, np.int64)
        for r in parts:
            sums[r["cluster"]] += np.asarray(r["vecsum"], np.float64)
            counts[r["cluster"]] += r["n"]
        nz = counts > 0
        newC = C.copy()
        newC[nz] = sums[nz] / counts[nz, None]
        C = round_half_away(newC.ravel(), round_digits).reshape(k, d)

    cref = ray.put(C)

    def label(df: pd.DataFrame) -> pa.Table:
        c = _cached_get(cref)
        if not len(df):
            return pa.table({id_col: pa.array([], pa.int64()),
                             "cluster": pa.array([], pa.int32())})
        X = np.stack(df[emb_col].to_numpy()).astype(np.float64)
        return pa.table({
            id_col: pa.Array.from_pandas(df[id_col]),
            "cluster": pa.array(_assign(X, c).astype(np.int32)),
        })

    return C, ds.map_batches(label, batch_format="pandas")


class IncrementalKMeans:
    """CDC-MAINTAINED k-means state: per-cluster (count, vector-sum)
    folded from SIGNED change sets — adds assign under the CURRENT
    centroids and contribute (+1, +x); removals retract (−1, −x) from
    the cluster they were ASSIGNED to at insertion (kept in a
    distributed assignment table, never recomputed), so centroids track
    the live corpus without ever re-reading it.  The online analog of
    :func:`distributed_kmeans`'s batch Lloyd — and the clustering
    counterpart of the incremental doc-frequency / window views.

    Determinism contract (oracle-mirrorable): per epoch the folded
    vector sums are re-ROUNDED (``round_digits``) and centroids are
    ``ROUND(S/N, round_digits)``; assignment is the same
    rounded-distance argmin as ``distributed_kmeans``.  A fixed
    sequence of add/remove waves is therefore reproducible by a SQL
    CTE unroll.

    Scale shape: the driver holds ONLY (k × d sums, k counts,
    centroids); per epoch the change set streams through one
    ``map_batches`` emitting ≤ k partial rows per block; removals
    resolve their stored cluster with a map-only semi-join against the
    assignment table (removal ids broadcast — change-set-sized);
    the assignment table itself is a Dataset maintained by union +
    anti-filter, never driver-held."""

    def __init__(self, init_centroids: np.ndarray,
                 round_digits: int = 6):
        from ..functions.rounding import round_half_away

        self._round = lambda a: round_half_away(
            np.asarray(a, np.float64).ravel(), round_digits
        ).reshape(np.asarray(a).shape)
        self.C = self._round(np.asarray(init_centroids, np.float64))
        self.k, self.d = self.C.shape
        self.S = np.zeros((self.k, self.d), np.float64)
        self.N = np.zeros(self.k, np.int64)
        self.round_digits = round_digits
        self.assignments: rd.Dataset | None = None  # (id, cluster)

    def _assign(self, X: np.ndarray, c: np.ndarray) -> np.ndarray:
        from ..functions.rounding import round_half_away

        dist = np.sqrt(((X[:, None, :] - c[None, :, :]) ** 2).sum(-1))
        dr = round_half_away(dist.ravel(), self.round_digits
                             ).reshape(dist.shape)
        return dr.argmin(axis=1)

    def add(self, ds: rd.Dataset, emb_col: str, id_col: str) -> None:
        """Fold an ADD wave: assign under the current centroids,
        accumulate (+count, +sum), append (id, cluster) rows."""
        cref = ray.put(self.C)
        k = self.k
        rdg = self.round_digits

        def partial(df: pd.DataFrame) -> pa.Table:
            from ..stages.joins import _cached_get

            c = _cached_get(cref)
            if not len(df):
                return pa.table({
                    id_col: pa.array([], pa.int64()),
                    "cluster": pa.array([], pa.int32()),
                    "n": pa.array([], pa.int64()),
                    "vecsum": pa.array([], pa.list_(pa.float64())),
                })
            X = np.stack(df[emb_col].to_numpy()).astype(np.float64)
            dist = np.sqrt(
                ((X[:, None, :] - c[None, :, :]) ** 2).sum(-1))
            from ..functions.rounding import round_half_away

            dr = round_half_away(dist.ravel(), rdg).reshape(dist.shape)
            a = dr.argmin(axis=1)
            sums = np.zeros((k, X.shape[1]), np.float64)
            np.add.at(sums, a, X)
            counts = np.bincount(a, minlength=k)
            # first k rows: per-cluster partials; then per-doc rows
            return pa.table({
                id_col: pa.array(
                    np.concatenate([np.full(k, -1),
                                    df[id_col].to_numpy()]).astype(
                        np.int64)),
                "cluster": pa.array(
                    np.concatenate([np.arange(k), a]).astype(np.int32)),
                "n": pa.array(
                    np.concatenate([counts,
                                    np.zeros(len(df))]).astype(
                        np.int64)),
                "vecsum": pa.array(
                    list(sums) + [None] * len(df),
                    pa.list_(pa.float64())),
            })

        out = ds.map_batches(partial, batch_format="pandas"
                             ).materialize()
        # fold the ≤k-per-block partial rows on the driver
        for r in out.filter(expr=f"{id_col} == -1").take_all():
            self.S[r["cluster"]] += np.asarray(r["vecsum"], np.float64)
            self.N[r["cluster"]] += r["n"]
        assigned = out.filter(expr=f"{id_col} >= 0").select_columns(
            [id_col, "cluster"])
        self.assignments = (
            assigned if self.assignments is None
            else self.assignments.union(assigned).materialize()
        )
        self._refresh()

    def remove(self, ds: rd.Dataset, emb_col: str, id_col: str) -> None:
        """Fold a REMOVE wave: retract each doc's vector from the
        cluster it was assigned to at insertion."""
        ids_pd = ds.select_columns([id_col]).to_pandas()
        rm = set(ids_pd[id_col].tolist())
        rmref = ray.put(rm)
        # stored cluster of each removed id (map-only semi-join:
        # removal ids broadcast, assignment table streams)
        def keep_removed(df: pd.DataFrame) -> pd.DataFrame:
            from ..stages.joins import _cached_get

            return df[df[id_col].isin(_cached_get(rmref))]

        hit = self.assignments.map_batches(
            keep_removed, batch_format="pandas"
        ).to_pandas()
        cluster_of = dict(zip(hit[id_col], hit["cluster"]))
        cref = ray.put(cluster_of)
        k = self.k

        def partial(df: pd.DataFrame) -> pa.Table:
            from ..stages.joins import _cached_get

            cm: dict = _cached_get(cref)
            X = np.stack(df[emb_col].to_numpy()).astype(np.float64)
            a = df[id_col].map(cm).to_numpy(np.int64)
            sums = np.zeros((k, X.shape[1]), np.float64)
            np.add.at(sums, a, X)
            counts = np.bincount(a, minlength=k)
            return pa.table({
                "cluster": pa.array(np.arange(k, dtype=np.int32)),
                "n": pa.array(counts.astype(np.int64)),
                "vecsum": pa.array(list(sums), pa.list_(pa.float64())),
            })

        for r in ds.map_batches(partial,
                                batch_format="pandas").take_all():
            self.S[r["cluster"]] -= np.asarray(r["vecsum"], np.float64)
            self.N[r["cluster"]] -= r["n"]
        def drop_removed(df: pd.DataFrame) -> pd.DataFrame:
            from ..stages.joins import _cached_get

            return df[~df[id_col].isin(_cached_get(rmref))]

        self.assignments = self.assignments.map_batches(
            drop_removed, batch_format="pandas"
        ).materialize()
        self._refresh()

    def _refresh(self) -> None:
        self.S = self._round(self.S)
        nz = self.N > 0
        newC = self.C.copy()
        newC[nz] = self.S[nz] / self.N[nz, None]
        self.C = self._round(newC)
