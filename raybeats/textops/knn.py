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
