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
        self.qn = q / np.maximum(np.linalg.norm(q, axis=1, keepdims=True),
                                 1e-30)
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
        # per-query probe membership mask over centroid ids
        probe_mask = np.zeros((len(query_ids), self.centroids.shape[0]),
                              dtype=bool)
        for qi, p in enumerate(probes):
            probe_mask[qi, p] = True
        union_probes = pa.array(sorted({int(c) for p in probes for c in p}),
                                pa.int32())
        idx = self

        def local(tbl: pa.Table) -> pa.Table:
            # top-k PER QUERY over that query's own probed lists (masking
            # before ranking — a union-wide top-k would let other
            # queries' centroids crowd out a query's true neighbors)
            tbl = idx.assign(tbl)
            tbl = tbl.filter(pc.is_in(tbl.column("centroid"),
                                      value_set=union_probes))
            if tbl.num_rows == 0:
                return pa.table({"query_id": pa.array([], pa.int64()),
                                 "neighbor_id": pa.array([], pa.int64()),
                                 "sim": pa.array([], pa.float64())})
            m = _matrix(tbl.column(idx.vec_col))
            ids = np.asarray(tbl.column(idx.id_col).to_pylist(),
                             dtype=np.int64)
            cents = np.asarray(tbl.column("centroid").to_pylist(),
                               dtype=np.int32)
            mn = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True),
                                1e-30)
            s = qn @ mn.T  # (nq, rows)
            s = np.where(probe_mask[:, cents], s, -np.inf)
            qs, ns, ss = [], [], []
            kk = min(k + len(query_ids), s.shape[1])
            for qi, qid in enumerate(query_ids):
                row = s[qi]
                top = (np.argpartition(-row, kk - 1)[:kk]
                       if kk < len(row) else np.arange(len(row)))
                for j in top:
                    if np.isfinite(row[j]):
                        qs.append(qid)
                        ns.append(int(ids[j]))
                        ss.append(float(row[j]))
            return pa.table({"query_id": pa.array(qs, pa.int64()),
                             "neighbor_id": pa.array(ns, pa.int64()),
                             "sim": pa.array(ss, pa.float64())})

        df = ds.map_batches(local, batch_format="pyarrow").to_pandas()
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


def write_ivf_partitioned(ds, index: "IvfIndex", out_dir: str) -> dict:
    """Persist the corpus partitioned BY CENTROID
    (``centroid=<k>/*.parquet``): the search-side half of IVF at scale —
    a query then reads only its probed centroid directories, so the scan
    itself prunes (not just the in-memory mask). Returns
    {centroid: rows} from the written footers."""
    import glob as glob_mod
    import os

    import pyarrow.parquet as pq

    from ..state.manifest import stage_and_swap

    # stage + atomic swap: a re-run (rebuilt index / refreshed corpus)
    # replaces the layout instead of accumulating stale generations
    stage_and_swap(out_dir,
                   lambda staging: ds.map_batches(
                       index.assign, batch_format="pyarrow").write_parquet(
                           staging, partition_cols=["centroid"]))
    lanes = {}
    for d in sorted(glob_mod.glob(os.path.join(out_dir, "centroid=*"))):
        k = int(os.path.basename(d).split("=", 1)[1])
        lanes[k] = sum(pq.read_metadata(f).num_rows for f in
                       glob_mod.glob(os.path.join(d, "*.parquet")))
    return lanes


def search_ivf_partitioned(out_dir: str, index: "IvfIndex",
                           queries: np.ndarray, query_ids: list[int],
                           k: int = 5, nprobe: int = 4) -> pa.Table:
    """Search a centroid-partitioned corpus reading ONLY the union of
    the queries' probed lists from storage (prune at the read — at
    100 TB the unprobed lanes never leave the object store). Results
    equal :meth:`IvfIndex.search` on the full dataset exactly
    (tested)."""
    import glob as glob_mod
    import os

    import ray.data as rd

    q = queries.astype(np.float64)
    qn = q / np.maximum(np.linalg.norm(q, axis=1, keepdims=True), 1e-30)
    sims = qn @ index.centroids.T
    nprobe = min(nprobe, index.centroids.shape[0])
    probes = np.argsort(-sims, axis=1)[:, :nprobe]
    union = sorted({int(c) for p in probes for c in p})
    dirs = [f for c in union
            for f in glob_mod.glob(os.path.join(out_dir, f"centroid={c}",
                                                "*.parquet"))]
    if not dirs:
        return pa.table({"query_id": pa.array([], pa.int64()),
                         "neighbor_id": pa.array([], pa.int64()),
                         "rank": pa.array([], pa.int64())})
    ds = rd.read_parquet(dirs, columns=[index.id_col, index.vec_col])
    return index.search(ds, queries, query_ids, k=k, nprobe=nprobe)


class LshBucketer:
    """Scale path: banded random-hyperplane LSH — ``n_bands``
    independent tables of ``n_planes`` hyperplanes each; a vector emits
    one (id, band, bucket) row per band and candidate verification only
    touches same-(band, bucket) groups.

    Sizing (the ``adaptive_buckets`` idea in sign space): expected
    bucket population is ``nrows / 2**n_planes``, so ``n_planes`` must
    GROW with the corpus (``adaptive_planes``) to keep the in-bucket
    O(b²) verify bounded — a fixed plane count was round-2's one
    remaining fixed-cardinality shuffle. Recall for near (not
    identical) pairs is then recovered by the band count: a cos-s pair
    agrees on one plane with p = 1 - arccos(s)/π, on a whole band with
    p**n_planes, and on at least one of L bands with 1-(1-p^k)^L."""

    def __init__(self, dim: int, n_planes: int = 12, seed: int = 99,
                 id_col: str = "vec_id", vec_col: str = "embedding",
                 n_bands: int = 1):
        rng = np.random.default_rng(seed)
        self.planes = rng.standard_normal((n_bands, n_planes, dim))
        self.n_bands = n_bands
        self.n_planes = n_planes
        self.id_col = id_col
        self.vec_col = vec_col

    @staticmethod
    def adaptive_planes(nrows: int, target_bucket: int = 128,
                        lo: int = 8, hi: int = 30) -> int:
        """Plane count keeping E[bucket size] ≈ ``target_bucket``."""
        import math
        return int(max(lo, min(hi, math.ceil(
            math.log2(max(2.0, nrows / max(1, target_bucket)))))))

    def __call__(self, tbl: pa.Table) -> pa.Table:
        m = _matrix(tbl.column(self.vec_col))
        n = len(m)
        ids = pc.cast(tbl.column(self.id_col), pa.int64()) \
            .to_numpy(zero_copy_only=False)
        # (n, n_bands, n_planes) sign bits → per-band bucket ids in one
        # tensordot + packbits-style fold
        proj = np.tensordot(m, self.planes, axes=([1], [2]))  # n×L×k
        bits = proj > 0
        weights = (np.int64(1) << np.arange(self.n_planes,
                                            dtype=np.int64))
        bucket = bits.astype(np.int64) @ weights  # (n, n_bands)
        return pa.table({
            self.id_col: pa.array(np.repeat(ids, self.n_bands),
                                  pa.int64()),
            "band": pa.array(np.tile(np.arange(self.n_bands,
                                               dtype=np.int32), n),
                             pa.int32()),
            "bucket": pa.array(bucket.reshape(-1), pa.int64())})


def kmeans_assign(t: pa.Table, *, centroids: np.ndarray,
                  centroid_ids: np.ndarray | None = None,
                  vec_col: str = "embedding",
                  out_col: str = "cid") -> pa.Table:
    """Assign each vector to its nearest centroid (squared-L2 argmin;
    ties break to the FIRST centroid row — np.argmin's first
    occurrence, so pass centroids in ascending-id order to mirror the
    SQL ``ORDER BY distance, cid`` window). The assignment half of a
    Lloyd/k-means iteration (the reduce half is
    `centroid_sum_partial`). One (n, d) temporary per centroid — NOT
    an (n, k, d) broadcast cube, which would transiently be 2k× the
    float32 batch payload; the per-row double ops and their reduction
    order are identical either way. ``centroid_ids`` maps the
    positional argmin to real ids (the oracle labels clusters by
    vec_id, not seed position — positions only coincide when seed ids
    happen to be 0..k-1). Float64 math after casting, matching SQL's
    DOUBLE promotion; squared vs sqrt distance orders identically in
    exact arithmetic — as with the cosine oracle, cross-engine argmin
    stability assumes distances are not within ~1 ulp of each other."""
    if centroids.ndim != 2 or centroids.shape[0] == 0:
        raise ValueError("centroids must be a non-empty (k, d) matrix")
    k, d = centroids.shape
    if centroid_ids is None:
        centroid_ids = np.arange(k, dtype=np.int64)
    elif len(centroid_ids) != k:
        raise ValueError(f"{len(centroid_ids)} centroid_ids != {k} "
                         "centroids")
    emb = t.column(vec_col)
    emb = emb.combine_chunks() if isinstance(emb, pa.ChunkedArray) else emb
    n = t.num_rows
    if n == 0:
        return t.append_column(out_col, pa.array([], pa.int64()))
    # per-row length check BEFORE the reshape: a ragged batch whose
    # total element count happens to divide by n would otherwise
    # reshape into interleaved garbage rows and silently misassign
    lens = np.diff(emb.offsets.to_numpy(zero_copy_only=False))
    if not (lens == d).all():
        raise ValueError(f"vector dim {int(lens.min())}..{int(lens.max())}"
                         f" != centroid dim {d}")
    e = _matrix(emb)
    d2 = np.empty((n, k), np.float64)
    for j in range(k):
        d2[:, j] = ((e - centroids[j]) ** 2).sum(axis=1)
    lab = np.asarray(centroid_ids, np.int64)[np.argmin(d2, axis=1)]
    return t.append_column(out_col, pa.array(lab, pa.int64()))


# ------------------------------------------------------ vector aggregates

def centroid_sum_partial(t: pa.Table, *, vec_col: str = "embedding",
                         by: str = "label",
                         scale: int = 1_000_000) -> pa.Table:
    """Per-batch partial for a grouped EXACT vector reduce: each
    embedding component quantizes to int64 (``round(v * scale)``,
    half-away — the cents recipe lifted to vectors; float sums are
    order-dependent across engines, integer sums are not) and the
    batch emits one row per (group, component): ``by``, ``idx``
    (1-based, mirroring SQL list indexing), ``s`` (component sum),
    ``n`` (vector count). Partial volume is ``groups × dim`` fixed
    rows per batch — independent of batch size — so the combine is a
    tiny keyed sum and the centroid itself is ``s / (n·scale)`` at
    whatever precision the consumer wants. Ragged vectors raise."""
    emb = t.column(vec_col)
    emb = emb.combine_chunks() if isinstance(emb, pa.ChunkedArray) else emb
    lab = t.column(by)
    n = len(emb)
    if n == 0:
        return pa.table({by: pa.array([], pa.int64()),
                         "idx": pa.array([], pa.int64()),
                         "s": pa.array([], pa.int64()),
                         "n": pa.array([], pa.int64())})
    offs = emb.offsets.to_numpy(zero_copy_only=False)
    lens = np.diff(offs)
    d = int(lens[0])
    if not (lens == d).all():
        raise ValueError(f"ragged {vec_col}: dims {lens.min()}..{lens.max()}")
    # .flatten(), not .values: a zero-copy SLICED ListArray's .values
    # spans the whole backing buffer while its offsets window into it —
    # the reshape below would see size n_backing×d and raise; flatten
    # honors the slice window. float64 BEFORE the scale multiply — SQL
    # promotes the float32 element to DOUBLE first, and matching the op
    # order keeps the rounding bit-identical
    q = pc.cast(pc.round(pc.multiply(pc.cast(emb.flatten(), pa.float64()),
                                     float(scale)),
                         round_mode="half_towards_infinity"),
                pa.int64()).to_numpy(zero_copy_only=False)
    labs = pc.cast(lab, pa.int64()).to_numpy(zero_copy_only=False)
    order = np.argsort(labs, kind="stable")
    sl = labs[order]
    uniq, start = np.unique(sl, return_index=True)
    sums = np.add.reduceat(q.reshape(n, d)[order], start, axis=0)
    counts = np.diff(np.append(start, n))
    return pa.table({
        by: pa.array(np.repeat(uniq, d), pa.int64()),
        "idx": pa.array(np.tile(np.arange(1, d + 1, dtype=np.int64),
                                len(uniq)), pa.int64()),
        "s": pa.array(sums.ravel(), pa.int64()),
        "n": pa.array(np.repeat(counts, d), pa.int64())})


class BatchHardNegatives:
    """map_batches stage for hard-negative mining: local cosine top-k
    per query per batch, considering ONLY rows whose ``label`` differs
    from the query's label — the retrieval-training counterpart of
    ``BatchTopK`` (a hard negative is the most-similar *wrong-class*
    item; ref. DPR / contrastive-retrieval practice). Same normalized
    double arithmetic as ``BatchTopK`` so orderings cannot diverge
    between the two retrieval ops."""

    def __init__(self, queries: np.ndarray, query_ids: list[int],
                 query_labels: list[int], k: int,
                 id_col: str = "vec_id", vec_col: str = "embedding",
                 label_col: str = "label"):
        q = queries.astype(np.float64)
        self.qn = q / np.maximum(
            np.linalg.norm(q, axis=1, keepdims=True), 1e-30)
        self.query_ids = list(query_ids)
        self.query_labels = np.asarray(query_labels, dtype=np.int64)
        self.k = k
        self.id_col = id_col
        self.vec_col = vec_col
        self.label_col = label_col

    def __call__(self, tbl: pa.Table) -> pa.Table:
        if tbl.num_rows == 0:
            return pa.table({"query_id": pa.array([], pa.int64()),
                             "neg_id": pa.array([], pa.int64()),
                             "sim": pa.array([], pa.float64())})
        m = _matrix(tbl.column(self.vec_col))
        ids = np.asarray(tbl.column(self.id_col).to_pylist(),
                         dtype=np.int64)
        labs = np.asarray(tbl.column(self.label_col).to_pylist(),
                          dtype=np.int64)
        mn = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True),
                            1e-30)
        sims = self.qn @ mn.T  # (nq, batch)
        qs, ns, ss = [], [], []
        for qi, qid in enumerate(self.query_ids):
            ok = np.flatnonzero(labs != self.query_labels[qi])
            if len(ok) == 0:
                continue
            row = sims[qi][ok]
            k = min(self.k, len(row))
            top = np.argpartition(-row, k - 1)[:k] if k < len(row) \
                else np.arange(len(row))
            for j in top:
                qs.append(qid)
                ns.append(int(ids[ok[j]]))
                ss.append(float(row[j]))
        return pa.table({"query_id": pa.array(qs, pa.int64()),
                         "neg_id": pa.array(ns, pa.int64()),
                         "sim": pa.array(ss, pa.float64())})


def hard_negatives_topk(ds, queries: np.ndarray, query_ids: list[int],
                        query_labels: list[int], k: int = 3,
                        id_col: str = "vec_id",
                        vec_col: str = "embedding",
                        label_col: str = "label") -> pa.Table:
    """→ (query_id, neg_id, rank): per query, the k most-similar
    vectors with a DIFFERENT label. Per-batch local top-k (the query
    matrix ships in the stage closure), tiny driver merge — the
    ``knn_topk`` shape with a label mask."""
    import pandas as pd

    stage = BatchHardNegatives(queries=queries, query_ids=query_ids,
                               query_labels=query_labels, k=k,
                               id_col=id_col, vec_col=vec_col,
                               label_col=label_col)
    partial = ds.map_batches(stage, batch_format="pyarrow")
    df = partial.to_pandas()
    df = df.sort_values(["query_id", "sim", "neg_id"],
                        ascending=[True, False, True])
    df["rank"] = df.groupby("query_id").cumcount() + 1
    df = df[df["rank"] <= k]
    return pa.table({
        "query_id": pa.array(df["query_id"].to_numpy(), pa.int64()),
        "neg_id": pa.array(df["neg_id"].to_numpy(), pa.int64()),
        "rank": pa.array(df["rank"].to_numpy(), pa.int64()),
    })
