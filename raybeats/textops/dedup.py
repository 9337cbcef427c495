"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard.

Scale shapes (100 TB thinking):

* exact: vectorized content-hash per batch (narrow) → ONE groupby on the
  hash (the only shuffle), keep min id per group.
* MinHash-LSH: shingle→minhash per batch (narrow) → explode to
  (band, band_hash, doc_id) rows → groupby band bucket (shuffle of small
  fixed-width rows, not documents) → candidate pairs within buckets →
  verify Jaccard on the pair set only.
* SimHash: 64-bit simhash per batch (narrow); near-dup = identical
  simhash or small hamming distance within LSH-style chunks.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ..util import crc32_bucket, int_bucket


def _md5_column(texts: list[str | None]) -> pa.Array:
    return pa.array([None if t is None else
                     hashlib.md5(t.encode("utf-8")).hexdigest()
                     for t in texts], pa.string())


def content_hash(tbl: pa.Table, text_col: str = "text") -> pa.Table:
    return tbl.append_column("h", _md5_column(tbl.column(text_col).to_pylist()))


def exact_dedup_groups(ds, text_col: str = "text", id_col: str = "doc_id"):
    """→ (h, keep_id, dups): min id + count per distinct content hash.
    Narrow hash stage, then one small groupby over fixed-width rows."""
    from ray.data.aggregate import Count, Min

    def hashed(tbl: pa.Table) -> pa.Table:
        return pa.table({
            "h": _md5_column(tbl.column(text_col).to_pylist()),
            id_col: tbl.column(id_col)})

    small = ds.map_batches(hashed, batch_format="pyarrow")
    return small.groupby("h").aggregate(
        Min(id_col, alias_name="keep_id"),
        Count(alias_name="dups"))


def dedup_first_by_key(ds, key: str = "meta_id",
                       order_cols: tuple[str, ...] = ("ts",),
                       n_buckets: int = 64):
    """ES create-op duplicate semantics (``elasticsearch/client.go:318-334,
    383-388``): one event per document id survives; rows with a null id
    pass through untouched. "First" is made deterministic by keeping the
    minimum of ``order_cols`` per id (a distributed engine has no global
    arrival order). The keyed shuffle is coarsened to ``n_buckets`` hash
    buckets (co-locating each id) with one vectorized pandas
    sort+drop_duplicates per bucket — not one python call per id."""
    import pandas as pd

    def null_ids(tbl: pa.Table) -> pa.Table:
        return tbl.filter(pc.is_null(tbl.column(key)))

    def with_ids(tbl: pa.Table) -> pa.Table:
        t = tbl.filter(pc.is_valid(tbl.column(key)))
        return t.append_column("_bucket", crc32_bucket(t.column(key),
                                                       n_buckets))

    def first(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(list(order_cols)).drop_duplicates(
            subset=[key], keep="first")
        return g.drop(columns=["_bucket"])

    passthrough = ds.map_batches(null_ids, batch_format="pyarrow")
    deduped = ds.map_batches(with_ids, batch_format="pyarrow") \
        .groupby("_bucket").map_groups(first, batch_format="pandas")
    return deduped.union(passthrough)


# ----------------------------------------------------------------- minhash

def _shingles(text: str, k: int) -> set[bytes]:
    b = text.encode("utf-8")
    if len(b) <= k:
        return {b}
    return {b[i:i + k] for i in range(len(b) - k + 1)}


def _shingle_hashes(text: str, k: int) -> np.ndarray:
    """Distinct 64-bit polynomial hashes of all k-byte shingles, computed
    in ONE vectorized pass (no per-shingle python objects / md5 calls —
    this is what makes MinHash viable at corpus scale)."""
    b = text.encode("utf-8")
    if len(b) <= k:
        return np.frombuffer(hashlib.md5(b).digest()[:8],
                             dtype=np.uint64).copy()
    arr = np.frombuffer(b, dtype=np.uint8).astype(np.uint64)
    n = len(arr) - k + 1
    h = np.zeros(n, dtype=np.uint64)
    base = np.uint64(1099511628211)  # FNV-ish odd multiplier
    for j in range(k):  # k is a small constant; inner op is vectorized
        h = h * base + arr[j:j + n]
    return np.unique(h)


class MinHasher:
    """Actor-pool stage: hash-permutation parameters built once per actor.
    Emits one (doc_id, band_id, band_hash) row per band — the LSH explode."""

    def __init__(self, num_hashes: int = 96, bands: int = 16,
                 shingle_k: int = 8, seed: int = 12345,
                 id_col: str = "doc_id", text_col: str = "text"):
        # 16 bands x 6 rows: candidate threshold (1/16)^(1/6) ~ 0.63;
        # 4-row bands admit far too many candidates on corpora with
        # non-trivial baseline similarity
        assert num_hashes % bands == 0
        rng = np.random.default_rng(seed)
        # Mersenne prime 2^31-1: (a*x+b) with a,b,x < p stays under 2^62,
        # so the uint64 arithmetic never wraps and this is a true
        # universal hash family (a 61-bit prime would overflow mod 2^64
        # and break the MinHash collision-probability guarantee)
        self.p = np.uint64((1 << 31) - 1)
        self.a = rng.integers(1, self.p, size=num_hashes, dtype=np.uint64)
        self.b = rng.integers(0, self.p, size=num_hashes, dtype=np.uint64)
        self.num_hashes = num_hashes
        self.bands = bands
        self.rows_per_band = num_hashes // bands
        self.k = shingle_k
        self.id_col = id_col
        self.text_col = text_col

    def signature(self, text: str) -> np.ndarray:
        base = _shingle_hashes(text, self.k) % self.p
        # (a*x+b) mod p per permutation, min over shingles (no overflow:
        # operands < 2^31, product < 2^62)
        vals = (base[None, :] * self.a[:, None] + self.b[:, None]) % self.p
        return vals.min(axis=1)

    def __call__(self, tbl: pa.Table) -> pa.Table:
        ids, bands, hashes = [], [], []
        id_list = tbl.column(self.id_col).to_pylist()
        for doc_id, text in zip(id_list, tbl.column(self.text_col).to_pylist()):
            if not text:
                continue
            sig = self.signature(text)
            for band in range(self.bands):
                seg = sig[band * self.rows_per_band:
                          (band + 1) * self.rows_per_band]
                h = hashlib.md5(seg.tobytes()).hexdigest()[:16]
                ids.append(doc_id)
                bands.append(band)
                hashes.append(h)
        return pa.table({
            self.id_col: pa.array(ids, pa.int64()),
            "band": pa.array(bands, pa.int32()),
            "band_hash": pa.array(hashes, pa.string()),
        })


def minhash_candidates(ds, id_col: str = "doc_id", text_col: str = "text",
                       num_hashes: int = 96, bands: int = 16,
                       shingle_k: int = 8, concurrency: int = 4):
    """→ (a, b) candidate near-duplicate id pairs (a < b), deduped."""
    import pandas as pd

    hasher = MinHasher(num_hashes=num_hashes, bands=bands,
                       shingle_k=shingle_k, id_col=id_col,
                       text_col=text_col)
    exploded = ds.map_batches(hasher, batch_format="pyarrow")

    # bucket the (band, band_hash) space into a FIXED number of groups so
    # the shuffle produces ~n_buckets coarse groups (vectorized pandas
    # inside each) instead of one python call per LSH bucket
    n_buckets = 64

    def add_bucket(tbl: pa.Table) -> pa.Table:
        import numpy as np
        # deterministic across worker processes (python hash() is salted):
        # band_hash is hex, reuse its leading bits
        h = np.array([int(x[:8], 16) % n_buckets
                      for x in tbl.column("band_hash").to_pylist()],
                     dtype=np.int32)
        return tbl.append_column("bucket", pa.array(h, pa.int32()))

    def pairs(group: pd.DataFrame) -> pd.DataFrame:
        g = group.drop_duplicates([id_col, "band", "band_hash"])
        sizes = g.groupby(["band", "band_hash"])[id_col].transform("size")
        g = g[sizes > 1]
        if len(g) == 0:
            return pd.DataFrame({"a": pd.array([], dtype="int64"),
                                 "b": pd.array([], dtype="int64")})
        m = g.merge(g, on=["band", "band_hash"])
        m = m[m[f"{id_col}_x"] < m[f"{id_col}_y"]]
        return pd.DataFrame({"a": m[f"{id_col}_x"].to_numpy(),
                             "b": m[f"{id_col}_y"].to_numpy()})

    cand = exploded.map_batches(add_bucket, batch_format="pyarrow") \
        .groupby("bucket").map_groups(pairs, batch_format="pandas")
    # dedup pairs discovered in multiple bands (tiny relative to corpus)
    from ray.data.aggregate import Count
    return cand.groupby(["a", "b"]).aggregate(Count(alias_name="nbands"))


def jaccard_verify(pairs_ds, docs_ds, threshold: float = 0.8,
                   id_col: str = "doc_id", text_col: str = "text",
                   shingle_k: int = 8):
    """Verify candidate pairs with exact shingle Jaccard, DISTRIBUTED:
    candidate texts are semi-joined (broadcast id set), ``ray.put`` once,
    and the pair list is verified in parallel map_batches tasks reading
    the broadcast dict zero-copy."""
    import ray

    cand = pairs_ds if isinstance(pairs_ds, pd.DataFrame) \
        else pairs_ds.to_pandas()
    if len(cand) == 0:
        return pa.table({"a": pa.array([], pa.int64()),
                         "b": pa.array([], pa.int64()),
                         "jaccard": pa.array([], pa.float64())})
    wanted = set(cand["a"]).union(cand["b"])

    def pick(tbl: pa.Table) -> pa.Table:
        mask = pc.is_in(tbl.column(id_col),
                        value_set=pa.array(list(wanted), pa.int64()))
        t = tbl.filter(mask)
        return pa.table({id_col: t.column(id_col),
                         text_col: t.column(text_col)})

    texts = {r[id_col]: r[text_col]
             for r in docs_ds.map_batches(pick, batch_format="pyarrow")
                             .take_all()}
    texts_ref = ray.put(texts)

    class Verify:
        def __init__(self, ref):
            self.texts = ray.get(ref)  # zero-copy once per actor/task
            self.cache: dict = {}

        def _sh(self, i):
            h = self.cache.get(i)
            if h is None:
                h = _shingle_hashes(self.texts[i], shingle_k)
                self.cache[i] = h
            return h

        def __call__(self, tbl: pa.Table) -> pa.Table:
            out_a, out_b, out_j = [], [], []
            for a, b in zip(tbl.column("a").to_pylist(),
                            tbl.column("b").to_pylist()):
                sa, sb = self._sh(a), self._sh(b)
                inter = len(np.intersect1d(sa, sb, assume_unique=True))
                j = inter / max(1, len(sa) + len(sb) - inter)
                if j >= threshold:
                    out_a.append(int(a))
                    out_b.append(int(b))
                    out_j.append(j)
            return pa.table({"a": pa.array(out_a, pa.int64()),
                             "b": pa.array(out_b, pa.int64()),
                             "jaccard": pa.array(out_j, pa.float64())})

    import ray.data as rd
    pairs = rd.from_arrow(pa.table({
        "a": pa.array(cand["a"].to_numpy(), pa.int64()),
        "b": pa.array(cand["b"].to_numpy(), pa.int64())}))
    n_tasks = max(1, min(32, len(cand) // 500))
    pairs = pairs.repartition(n_tasks)
    verified = pairs.map_batches(Verify, batch_format="pyarrow",
                                 concurrency=(1, min(8, n_tasks)),
                                 fn_constructor_kwargs={"ref": texts_ref})
    tables = list(verified.iter_batches(batch_format="pyarrow"))
    if not tables:
        return pa.table({"a": pa.array([], pa.int64()),
                         "b": pa.array([], pa.int64()),
                         "jaccard": pa.array([], pa.float64())})
    return pa.concat_tables(tables)


# ----------------------------------------------------------------- simhash

class SimHasher:
    """64-bit SimHash over token md5 hashes; narrow map_batches stage."""

    def __init__(self, id_col: str = "doc_id", text_col: str = "text"):
        import re
        self.token_re = re.compile(r"[a-z0-9]+")
        self.id_col = id_col
        self.text_col = text_col

    def simhash(self, text: str) -> int:
        toks = self.token_re.findall(text.lower())
        if not toks:
            return 0
        hs = np.array([int.from_bytes(hashlib.md5(t.encode()).digest()[:8],
                                      "little") for t in toks],
                      dtype=np.uint64)
        bits = ((hs[:, None] >> np.arange(64, dtype=np.uint64)[None, :])
                & np.uint64(1)).astype(np.int32)
        votes = bits.sum(axis=0) * 2 - len(hs)
        out = 0
        for i, v in enumerate(votes):
            if v > 0:
                out |= (1 << i)
        return out & 0x7FFFFFFFFFFFFFFF

    def __call__(self, tbl: pa.Table) -> pa.Table:
        vals = [self.simhash(t or "")
                for t in tbl.column(self.text_col).to_pylist()]
        return pa.table({self.id_col: tbl.column(self.id_col),
                         "simhash": pa.array(vals, pa.int64())})


def simhash_near_dup_pairs(ds, max_hamming: int = 3,
                           id_col: str = "doc_id", text_col: str = "text"):
    """SimHash near-dup pairs with GUARANTEED recall for small hamming
    distance: split the 64-bit simhash into 4 chunks of 16 bits; any two
    hashes within hamming distance 3 must share at least one chunk
    (pigeonhole), so chunk-equality buckets contain every such pair.
    Candidates are then verified with an exact vectorized XOR popcount.
    Only (id, chunk) rows shuffle; 16-bit chunks keep buckets sparse."""
    import pandas as pd

    assert max_hamming <= 3, "4x16-bit chunking guarantees recall to d=3"

    def explode(tbl: pa.Table) -> pa.Table:
        hashed = SimHasher(id_col=id_col, text_col=text_col)(tbl)
        ids = hashed.column(id_col).to_pylist()
        hs = hashed.column("simhash").to_pylist()
        out_id, out_chunk, out_key, out_h = [], [], [], []
        for i, h in zip(ids, hs):
            for c in range(4):
                out_id.append(i)
                out_chunk.append(c)
                out_key.append((h >> (16 * c)) & 0xFFFF)
                out_h.append(h)
        return pa.table({id_col: pa.array(out_id, pa.int64()),
                         "chunk": pa.array(out_chunk, pa.int32()),
                         "chunk_key": pa.array(out_key, pa.int32()),
                         "simhash": pa.array(out_h, pa.int64())})

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates([id_col, "chunk", "chunk_key"])
        sizes = g.groupby(["chunk", "chunk_key"])[id_col].transform("size")
        g = g[sizes > 1]
        if len(g) == 0:
            return pd.DataFrame({"a": pd.array([], dtype="int64"),
                                 "b": pd.array([], dtype="int64")})
        m = g.merge(g, on=["chunk", "chunk_key"])
        m = m[m[f"{id_col}_x"] < m[f"{id_col}_y"]]
        if len(m) == 0:
            return pd.DataFrame({"a": pd.array([], dtype="int64"),
                                 "b": pd.array([], dtype="int64")})
        # exact hamming verify, vectorized popcount
        x = m["simhash_x"].to_numpy().astype(np.uint64)
        y = m["simhash_y"].to_numpy().astype(np.uint64)
        d = np.zeros(len(m), dtype=np.int32)
        v = x ^ y
        for _ in range(64):
            d += (v & np.uint64(1)).astype(np.int32)
            v >>= np.uint64(1)
        keep = d <= max_hamming
        return pd.DataFrame({"a": m[f"{id_col}_x"].to_numpy()[keep],
                             "b": m[f"{id_col}_y"].to_numpy()[keep]})

    n_buckets = 64

    def add_bucket(tbl: pa.Table) -> pa.Table:
        key = pc.add(pc.multiply(pc.cast(tbl.column("chunk"), pa.int64()),
                                 65536),
                     pc.cast(tbl.column("chunk_key"), pa.int64()))
        return tbl.append_column("bucket", int_bucket(key, n_buckets))

    from ray.data.aggregate import Count
    cand = ds.map_batches(explode, batch_format="pyarrow") \
        .map_batches(add_bucket, batch_format="pyarrow") \
        .groupby("bucket").map_groups(pairs, batch_format="pandas")
    return cand.groupby(["a", "b"]).aggregate(Count(alias_name="nchunks"))


def duplicate_clusters(pairs, n_buckets: int = 32, max_iters: int = 25):
    """Connected components over a duplicate-pair graph → (node, cluster)
    with cluster = min node id of the component (the canonical dedup
    cluster id).

    Distributed min-label propagation: each round, every edge proposes
    its endpoint's current label to the other endpoint and nodes keep the
    minimum. The edge⋈label join is a bucketed cogroup (union the two
    row kinds, groupby hash bucket, vectorized pandas merge per bucket) —
    no driver-side graph. Labels only decrease, so the global label sum
    is a monotone convergence metric; rounds = component diameter
    (near-dup components are shallow).
    """
    import ray.data as rd

    if isinstance(pairs, pa.Table):
        tbl = pairs
    elif isinstance(pairs, pd.DataFrame):
        tbl = pa.Table.from_pandas(pairs, preserve_index=False)
    else:
        tbl = pa.concat_tables(list(pairs.iter_batches(
            batch_format="pyarrow")))
    if tbl.num_rows == 0:
        return pa.table({"node": pa.array([], pa.int64()),
                         "cluster": pa.array([], pa.int64())})
    a = pc.cast(tbl.column("a"), pa.int64())
    b = pc.cast(tbl.column("b"), pa.int64())
    edges_tbl = pa.table({
        "key": pa.concat_arrays([a.combine_chunks() if isinstance(a, pa.ChunkedArray) else a,
                                 b.combine_chunks() if isinstance(b, pa.ChunkedArray) else b]),
        "other": pa.concat_arrays([b.combine_chunks() if isinstance(b, pa.ChunkedArray) else b,
                                   a.combine_chunks() if isinstance(a, pa.ChunkedArray) else a]),
    })
    edges = rd.from_arrow(edges_tbl)

    from ray.data.aggregate import Min

    # init: label[n] = n
    labels = edges.groupby("key").aggregate(Min("key", alias_name="label"))

    def tag_edges(t: pa.Table) -> pa.Table:
        return pa.table({"key": t.column("key"), "other": t.column("other"),
                         "label": pa.nulls(t.num_rows, pa.int64()),
                         "bucket": int_bucket(t.column("key"), n_buckets)})

    def tag_labels(t: pa.Table) -> pa.Table:
        return pa.table({"key": t.column("key"),
                         "other": pa.nulls(t.num_rows, pa.int64()),
                         "label": t.column("label"),
                         "bucket": int_bucket(t.column("key"), n_buckets)})

    def propose(g: pd.DataFrame) -> pd.DataFrame:
        lab = g[g["label"].notna()][["key", "label"]]
        ed = g[g["label"].isna()][["key", "other"]]
        msgs = ed.merge(lab, on="key")  # (other <- label of key)
        return pd.DataFrame({
            "key": pd.concat([msgs["other"], lab["key"]],
                             ignore_index=True).astype("int64"),
            "cand": pd.concat([msgs["label"], lab["label"]],
                              ignore_index=True).astype("int64")})

    tagged_edges = edges.map_batches(tag_edges, batch_format="pyarrow")
    prev_sum = None
    for _ in range(max_iters):
        tagged_labels = labels.map_batches(tag_labels,
                                           batch_format="pyarrow")
        proposals = tagged_edges.union(tagged_labels) \
            .groupby("bucket").map_groups(propose, batch_format="pandas")
        labels = proposals.groupby("key").aggregate(
            Min("cand", alias_name="label"))
        from ray.data.aggregate import Sum
        s = labels.aggregate(Sum("label", alias_name="s"))["s"]
        if s == prev_sum:
            break
        prev_sum = s
    out = pa.concat_tables(list(labels.iter_batches(batch_format="pyarrow")))
    return pa.table({"node": out.column("key"),
                     "cluster": out.column("label")}).sort_by("node")


def simhash_duplicate_groups(ds, id_col: str = "doc_id",
                             text_col: str = "text"):
    """SimHash near-dup grouping: identical 64-bit simhash ⇒ candidate
    duplicate group (hamming-0; small-hamming variants bucket by hash
    chunks the same way LSH bands do). One groupby on the hash."""
    from ray.data.aggregate import Count, Min

    hashed = ds.map_batches(SimHasher(id_col=id_col, text_col=text_col),
                            batch_format="pyarrow")
    groups = hashed.groupby("simhash").aggregate(
        Min(id_col, alias_name="keep_id"),
        Count(alias_name="members"))
    return groups.filter(expr="members > 1")
