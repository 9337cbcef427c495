"""Similarity search over an embedding column (``list<float>``).

Baseline: brute-force cosine top-k — the query matrix is broadcast
(``ray.put`` once / constructor arg), each batch does one float64 matmul
against it and emits only its local top-k per query; the driver merges the
tiny per-batch winners. Scale path: LSH-bucketed variant that shuffles
only (bucket, id) rows.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def _matrix(embeddings_col) -> np.ndarray:
    arr = embeddings_col.combine_chunks() if isinstance(
        embeddings_col, pa.ChunkedArray) else embeddings_col
    flat = arr.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
    n = len(arr)
    return flat.reshape(n, -1)


class BatchTopK:
    """map_batches stage: local cosine top-k per query per batch."""

    def __init__(self, queries: np.ndarray, query_ids: list[int], k: int,
                 id_col: str = "vec_id", vec_col: str = "embedding"):
        q = queries.astype(np.float64)
        self.qn = q / np.linalg.norm(q, axis=1, keepdims=True)
        self.query_ids = list(query_ids)
        self.k = k
        self.id_col = id_col
        self.vec_col = vec_col

    def __call__(self, tbl: pa.Table) -> pa.Table:
        if tbl.num_rows == 0:
            return pa.table({"query_id": pa.array([], pa.int64()),
                             "neighbor_id": pa.array([], pa.int64()),
                             "sim": pa.array([], pa.float64())})
        m = _matrix(tbl.column(self.vec_col))
        ids = np.asarray(tbl.column(self.id_col).to_pylist(), dtype=np.int64)
        mn = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-30)
        sims = self.qn @ mn.T  # (nq, batch)
        qs, ns, ss = [], [], []
        k = min(self.k + len(self.query_ids), sims.shape[1])
        for qi, qid in enumerate(self.query_ids):
            row = sims[qi]
            top = np.argpartition(-row, k - 1)[:k] if k < len(row) else \
                np.arange(len(row))
            for j in top:
                qs.append(qid)
                ns.append(int(ids[j]))
                ss.append(float(row[j]))
        return pa.table({"query_id": pa.array(qs, pa.int64()),
                         "neighbor_id": pa.array(ns, pa.int64()),
                         "sim": pa.array(ss, pa.float64())})


def knn_topk(ds, queries: np.ndarray, query_ids: list[int], k: int = 5,
             id_col: str = "vec_id", vec_col: str = "embedding",
             exclude_self: bool = True) -> pa.Table:
    """→ (query_id, neighbor_id, rank): global top-k via per-batch local
    top-k + tiny driver merge. Ties broken by neighbor_id ascending."""
    import pandas as pd

    # the query matrix is small state — ship it inside a task-stage fn
    # (an actor pool would pay spin-up for no amortization win here)
    topk = BatchTopK(queries=queries, query_ids=query_ids, k=k,
                     id_col=id_col, vec_col=vec_col)
    partial = ds.map_batches(topk, batch_format="pyarrow")
    df = partial.to_pandas()
    if exclude_self:
        df = df[df["query_id"] != df["neighbor_id"]]
    df = df.sort_values(["query_id", "sim", "neighbor_id"],
                        ascending=[True, False, True])
    df["rank"] = df.groupby("query_id").cumcount() + 1
    df = df[df["rank"] <= k]
    return pa.table({
        "query_id": pa.array(df["query_id"].to_numpy(), pa.int64()),
        "neighbor_id": pa.array(df["neighbor_id"].to_numpy(), pa.int64()),
        "rank": pa.array(df["rank"].to_numpy(), pa.int64()),
    })


class IvfIndex:
    """IVF approximate nearest neighbor: a seeded k-means coarse quantizer
    built from a driver-side sample; assignment is one matmul per batch
    (narrow); search probes only the ``nprobe`` nearest centroid lists.
    With ``nprobe == n_centroids`` results equal brute force exactly.

    Scale shape: centroids are tiny and broadcast in the stage closure;
    the assignment column enables partition-by-centroid layout so a search
    touches only matching fragments.
    """

    def __init__(self, centroids: np.ndarray,
                 id_col: str = "vec_id", vec_col: str = "embedding"):
        c = centroids.astype(np.float64)
        self.centroids = c / np.maximum(
            np.linalg.norm(c, axis=1, keepdims=True), 1e-30)
        self.id_col = id_col
        self.vec_col = vec_col

    @classmethod
    def build(cls, ds, n_centroids: int = 16, sample_rows: int = 2048,
              iters: int = 10, seed: int = 7, id_col: str = "vec_id",
              vec_col: str = "embedding") -> "IvfIndex":
        sample = ds.limit(sample_rows).to_pandas()
        m = np.array(list(sample[vec_col]), dtype=np.float64)
        mn = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-30)
        rng = np.random.default_rng(seed)
        cent = mn[rng.choice(len(mn), size=min(n_centroids, len(mn)),
                             replace=False)]
        for _ in range(iters):  # spherical lloyd, fixed iterations
            assign = (mn @ cent.T).argmax(axis=1)
            for k in range(len(cent)):
                members = mn[assign == k]
                if len(members):
                    v = members.sum(axis=0)
                    cent[k] = v / max(np.linalg.norm(v), 1e-30)
        return cls(cent, id_col=id_col, vec_col=vec_col)

    def assign(self, tbl: pa.Table) -> pa.Table:
        m = _matrix(tbl.column(self.vec_col))
        mn = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-30)
        a = (mn @ self.centroids.T).argmax(axis=1).astype(np.int32)
        return tbl.append_column("centroid", pa.array(a, pa.int32()))

    def search(self, ds, queries: np.ndarray, query_ids: list[int],
               k: int = 5, nprobe: int = 4) -> pa.Table:
        """→ (query_id, neighbor_id, rank) probing the nprobe nearest
        centroid lists per query."""
        q = queries.astype(np.float64)
        qn = q / np.maximum(np.linalg.norm(q, axis=1, keepdims=True), 1e-30)
        sims = qn @ self.centroids.T
        nprobe = min(nprobe, self.centroids.shape[0])
        probes = np.argsort(-sims, axis=1)[:, :nprobe]
        probe_sets = [set(p.tolist()) for p in probes]
        union_probes = pa.array(sorted(set().union(*probe_sets)), pa.int32())
        idx = self

        def local(tbl: pa.Table) -> pa.Table:
            tbl = idx.assign(tbl)
            tbl = tbl.filter(pc.is_in(tbl.column("centroid"),
                                      value_set=union_probes))
            if tbl.num_rows == 0:
                return pa.table({"query_id": pa.array([], pa.int64()),
                                 "neighbor_id": pa.array([], pa.int64()),
                                 "sim": pa.array([], pa.float64()),
                                 "centroid": pa.array([], pa.int32())})
            topk = BatchTopK(queries=q, query_ids=query_ids, k=k,
                             id_col=idx.id_col, vec_col=idx.vec_col)
            out = topk(tbl)
            cent_of = dict(zip(tbl.column(idx.id_col).to_pylist(),
                               tbl.column("centroid").to_pylist()))
            cents = [cent_of[n] for n in out.column("neighbor_id").to_pylist()]
            return out.append_column("centroid", pa.array(cents, pa.int32()))

        import pandas as pd
        df = ds.map_batches(local, batch_format="pyarrow").to_pandas()
        # keep only neighbors whose centroid is probed for THAT query
        keep = [row.centroid in probe_sets[query_ids.index(row.query_id)]
                for row in df.itertuples()]
        df = df[pd.Series(keep, index=df.index)]
        df = df[df["query_id"] != df["neighbor_id"]]
        df = df.sort_values(["query_id", "sim", "neighbor_id"],
                            ascending=[True, False, True])
        df["rank"] = df.groupby("query_id").cumcount() + 1
        df = df[df["rank"] <= k]
        return pa.table({
            "query_id": pa.array(df["query_id"].to_numpy(), pa.int64()),
            "neighbor_id": pa.array(df["neighbor_id"].to_numpy(), pa.int64()),
            "rank": pa.array(df["rank"].to_numpy(), pa.int64()),
        })


class LshBucketer:
    """Scale path: random-hyperplane LSH bucket id per vector; candidate
    search only touches matching buckets (narrow emit of (bucket, id))."""

    def __init__(self, dim: int, n_planes: int = 12, seed: int = 99,
                 id_col: str = "vec_id", vec_col: str = "embedding"):
        rng = np.random.default_rng(seed)
        self.planes = rng.standard_normal((n_planes, dim))
        self.id_col = id_col
        self.vec_col = vec_col

    def __call__(self, tbl: pa.Table) -> pa.Table:
        m = _matrix(tbl.column(self.vec_col))
        bits = (m @ self.planes.T) > 0
        bucket = np.zeros(len(m), dtype=np.int64)
        for i in range(bits.shape[1]):
            bucket |= bits[:, i].astype(np.int64) << i
        return pa.table({self.id_col: tbl.column(self.id_col),
                         "bucket": pa.array(bucket, pa.int64())})
