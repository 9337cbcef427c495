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

from ..util import fnv1a_bucket, int_bucket


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
        col = t.column(key)
        bucket = (int_bucket(col, n_buckets)
                  if pa.types.is_integer(col.type)
                  else fnv1a_bucket(col, n_buckets))
        return t.append_column("_bucket", bucket)

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
        # multiply-only minwise family: h_i(x) = a_i * x mod 2^64 with
        # a_i ODD (invertible, so distinct shingles never collide within
        # a permutation). One wraparound multiply + min per permutation —
        # ~3x cheaper than (a*x+b) mod p, whose uint64 modulo is a
        # division; recall on planted pairs is tested to the same >=0.8
        # bar (tests/test_dedup_recall.py)
        self.a = rng.integers(0, 1 << 63, size=num_hashes,
                              dtype=np.uint64) * np.uint64(2) + np.uint64(1)
        self.num_hashes = num_hashes
        self.bands = bands
        self.rows_per_band = num_hashes // bands
        self.k = shingle_k
        self.id_col = id_col
        self.text_col = text_col

    def signature(self, text: str) -> np.ndarray:
        base = _shingle_hashes(text, self.k)
        # wraparound multiply per permutation, min over shingles
        vals = base[None, :] * self.a[:, None]
        return vals.min(axis=1)

    def __call__(self, tbl: pa.Table) -> pa.Table:
        id_valid = pc.is_valid(tbl.column(self.id_col))
        if not pc.all(id_valid).as_py():
            # null ids cannot participate in id-keyed pairing; skipping
            # them mirrors the empty-text skip (a null id would turn the
            # numpy id vector float and crash the int64 emit)
            tbl = tbl.filter(id_valid)
        texts = tbl.column(self.text_col).to_pylist()
        id_np = pc.cast(tbl.column(self.id_col), pa.int64()) \
            .to_numpy(zero_copy_only=False)
        sigs = np.empty((len(texts), self.num_hashes), dtype=np.uint64)
        keep = np.ones(len(texts), dtype=bool)
        for i, text in enumerate(texts):  # variable-length docs; the
            if not text:                  # per-doc kernel is vectorized
                keep[i] = False
                continue
            sigs[i] = self.signature(text)
        sigs, ids = sigs[keep], id_np[keep]
        n = len(ids)
        if n == 0:
            return pa.table({self.id_col: pa.array([], pa.int64()),
                             "band": pa.array([], pa.int32()),
                             "band_hash": pa.array([], pa.int64())})
        # band hashes in ONE vectorized pass over the signature matrix:
        # FNV-1a fold of each band's rows (no per-(doc,band) md5 calls)
        m = sigs.reshape(n, self.bands, self.rows_per_band)
        h = np.full((n, self.bands), 0xCBF29CE484222325, dtype=np.uint64)
        fnv = np.uint64(0x100000001B3)
        half = np.uint64(32)
        for r in range(self.rows_per_band):
            v = m[:, :, r]
            h = (h ^ (v & np.uint64(0xFFFFFFFF))) * fnv
            h = (h ^ (v >> half)) * fnv
        h &= np.uint64(0x7FFFFFFFFFFFFFFF)  # int64-safe for arrow/bucketing
        return pa.table({
            self.id_col: pa.array(np.repeat(ids, self.bands), pa.int64()),
            "band": pa.array(np.tile(np.arange(self.bands, dtype=np.int32),
                                     n), pa.int32()),
            "band_hash": pa.array(h.reshape(-1).view(np.int64), pa.int64()),
        })


def minhash_candidates(ds, id_col: str = "doc_id", text_col: str = "text",
                       num_hashes: int = 96, bands: int = 16,
                       shingle_k: int = 8, concurrency: int = 4,
                       n_buckets: int = 64, max_bucket: int = 256,
                       dedup: bool = True):
    """→ (a, b) candidate near-duplicate id pairs (a < b), deduped.

    ``n_buckets`` coarsens the (band, band_hash) shuffle — scale it with
    corpus size (``util.adaptive_buckets``). ``max_bucket`` caps a
    degenerate LSH bucket (e.g. a boilerplate band shared by a huge dup
    class): the quadratic pairing runs only among the bucket's
    ``max_bucket`` smallest ids, and every member beyond the cap emits
    ONE star candidate to the bucket's minimum id — linear extra cost
    that keeps over-cap members reachable (they verify individually and
    transitive clustering links them through the hub)."""
    import pandas as pd

    hasher = MinHasher(num_hashes=num_hashes, bands=bands,
                       shingle_k=shingle_k, id_col=id_col,
                       text_col=text_col)
    exploded = ds.map_batches(hasher, batch_format="pyarrow")

    def add_bucket(tbl: pa.Table) -> pa.Table:
        # band_hash is already a well-mixed int64 (FNV) — fold the band id
        # in so different bands with equal hashes land apart
        key = pc.bit_wise_xor(
            pc.multiply(pc.cast(tbl.column("band"), pa.int64()), 1_000_003),
            tbl.column("band_hash"))
        return tbl.append_column(
            "bucket",
            int_bucket(pc.bit_wise_and(key, 0x7FFFFFFFFFFFFFFF), n_buckets))

    def pairs(group: pd.DataFrame) -> pd.DataFrame:
        g = group.drop_duplicates([id_col, "band", "band_hash"])
        sizes = g.groupby(["band", "band_hash"])[id_col].transform("size")
        g = g[sizes > 1]
        if len(g) == 0:
            return pd.DataFrame({"a": pd.array([], dtype="int64"),
                                 "b": pd.array([], dtype="int64")})
        # degenerate-bucket cap: quadratic pairing among the smallest
        # max_bucket ids; members beyond the cap star-link to the
        # bucket's min id (linear) so nothing becomes unreachable
        g = g.sort_values(id_col)
        capped = g.groupby(["band", "band_hash"],
                           sort=False).head(max_bucket)
        m = capped.merge(capped, on=["band", "band_hash"])
        m = m[m[f"{id_col}_x"] < m[f"{id_col}_y"]]
        a = m[f"{id_col}_x"].to_numpy()
        b = m[f"{id_col}_y"].to_numpy()
        extras = g.loc[g.index.difference(capped.index)]
        if len(extras):
            mins = g.groupby(["band", "band_hash"], sort=False)[id_col] \
                .min().rename("hub").reset_index()
            star = extras.merge(mins, on=["band", "band_hash"])
            a = np.concatenate([a, star["hub"].to_numpy()])
            b = np.concatenate([b, star[id_col].to_numpy()])
        return pd.DataFrame({"a": a, "b": b})

    cand = exploded.map_batches(add_bucket, batch_format="pyarrow") \
        .groupby("bucket").map_groups(pairs, batch_format="pandas")
    if not dedup:
        # callers feeding jaccard_verify can skip this whole shuffle:
        # the verify cogroup dedups (a, b) per pivot bucket for free
        return cand
    # dedup pairs discovered in multiple bands (tiny relative to corpus)
    from ray.data.aggregate import Count
    return cand.groupby(["a", "b"]).aggregate(Count(alias_name="nbands"))


_FAST_VERIFY_MAX_PAIRS = 2_000_000  # 32 MB of ids — the driver budget
# tiny-candidate driver path (same convention as duplicate_clusters'
# bounded union-find): referenced texts must also fit under a byte cap,
# checked while streaming them in — else fall back to the broadcast path
_DRIVER_VERIFY_MAX_PAIRS = 20_000
_DRIVER_VERIFY_MAX_BYTES = 256 << 20


def _pair_intersections(segs: list) -> "np.ndarray":
    """Intersection counts for pairs of already-UNIQUE hash arrays —
    ``segs`` holds 2 consecutive arrays per pair. One global
    (pair, hash) lexsort; an adjacent duplicate within a pair means the
    hash is in both sides."""
    n_pairs = len(segs) // 2
    seg_lens = np.fromiter((len(s) for s in segs), dtype=np.int64,
                           count=2 * n_pairs)
    big = np.concatenate(segs) if segs else np.array([], np.uint64)
    tags = np.repeat(np.arange(2 * n_pairs, dtype=np.int64) >> 1,
                     seg_lens)
    order = np.lexsort((big, tags))
    sb_, st_ = big[order], tags[order]
    dup = (sb_[1:] == sb_[:-1]) & (st_[1:] == st_[:-1])
    return np.bincount(st_[1:][dup], minlength=n_pairs)


def jaccard_verify(pairs_ds, docs_ds, threshold: float = 0.8,
                   id_col: str = "doc_id", text_col: str = "text",
                   shingle_k: int = 8, n_buckets: int = 64,
                   set_fn=None):
    """Verify candidate pairs with exact set Jaccard. The set extracted
    per text defaults to distinct ``shingle_k``-byte shingle hashes
    (``set_fn=None``); pass ``set_fn`` (str → np.uint64 array) for a
    different set universe — e.g. :func:`token_gram_hash_set` for the
    token-n-gram Jaccard of the exact prefix-filter join. Three shapes,
    picked by candidate count:

    * ``≤ _DRIVER_VERIFY_MAX_PAIRS``: a scan-level semi-join fetches
      ONLY the referenced texts to the driver (streamed, byte-capped —
      over-cap falls through to the next tier) and one local vectorized
      kernel verifies everything — zero shuffles, which matters because
      Ray's groupby floor (~2 s) dwarfs the compute at tiny candidate
      counts. Same bounded-driver convention as ``duplicate_clusters``.
    * ``≤ _FAST_VERIFY_MAX_PAIRS`` (the common case after LSH): the
      PAIR IDS (two int64 columns — bounded, unlike round 1's text
      dict) materialize on the driver, which broadcasts a CSR routing
      table (``ray.put`` once); one ``map_batches`` over the docs then
      routes each REFERENCED doc's text straight to its pair buckets
      (a scan-level semi-join — unreferenced docs never shuffle) and
      ONE groupby co-locates every pair with both texts. Halves the
      Ray shuffle floor vs the cogroup path and was measured ~2× on
      the 200k-doc bench.
    * above the budget: the two-stage bucketed cogroup (endpoint fetch
      → pair pivot) — nothing driver-resident at all.

    Returns a lazy Dataset of (a, b, jaccard)."""
    import ray.data as rd

    def _empty():
        return rd.from_arrow(pa.table({
            "a": pa.array([], pa.int64()),
            "b": pa.array([], pa.int64()),
            "jaccard": pa.array([], pa.float64())}))

    if isinstance(pairs_ds, pd.DataFrame):
        if len(pairs_ds) == 0:
            return _empty()
        pairs_ds = rd.from_arrow(pa.table({
            "a": pa.array(pairs_ds["a"].to_numpy(), pa.int64()),
            "b": pa.array(pairs_ds["b"].to_numpy(), pa.int64())}))
    elif isinstance(pairs_ds, pa.Table):
        if pairs_ds.num_rows == 0:
            return _empty()
        pairs_ds = rd.from_arrow(pairs_ds.select(["a", "b"]))

    pairs_ds = pairs_ds.materialize()
    n_cand = pairs_ds.count()
    if n_cand == 0:
        return _empty()
    if set_fn is None:
        def set_fn(txt: str) -> np.ndarray:
            return _shingle_hashes(txt, shingle_k)
    if n_cand <= _DRIVER_VERIFY_MAX_PAIRS:
        out = _jaccard_verify_driver(
            pairs_ds, docs_ds, threshold=threshold, id_col=id_col,
            text_col=text_col, set_fn=set_fn)
        if out is not None:
            return out
    if n_cand <= _FAST_VERIFY_MAX_PAIRS:
        return _jaccard_verify_broadcast(
            pairs_ds, docs_ds, threshold=threshold, id_col=id_col,
            text_col=text_col, set_fn=set_fn, n_buckets=n_buckets)
    return _jaccard_verify_cogroup(
        pairs_ds, docs_ds, threshold=threshold, id_col=id_col,
        text_col=text_col, set_fn=set_fn, n_buckets=n_buckets)


def _canonical_pairs(pairs_ds):
    """Driver-side (a, b) → deduplicated (lo, hi) int64 arrays."""
    t = pa.concat_tables(list(pairs_ds.select_columns(["a", "b"])
                              .iter_batches(batch_size=None, batch_format="pyarrow")))
    a = pc.cast(t.column("a"), pa.int64()).to_numpy(zero_copy_only=False)
    b = pc.cast(t.column("b"), pa.int64()).to_numpy(zero_copy_only=False)
    lo, hi = np.minimum(a, b), np.maximum(a, b)
    order = np.lexsort((hi, lo))
    lo, hi = lo[order], hi[order]
    keep = np.concatenate([[True], (lo[1:] != lo[:-1]) |
                           (hi[1:] != hi[:-1])])
    return lo[keep], hi[keep]


def _jaccard_verify_driver(pairs_ds, docs_ds, threshold: float,
                           id_col: str, text_col: str, set_fn):
    """Tiny-candidate driver path (see :func:`jaccard_verify`).
    Returns ``None`` when the referenced texts exceed the byte cap —
    the caller then takes the broadcast path instead."""
    import ray.data as rd

    ga, gb = _canonical_pairs(pairs_ds)
    uids_arr = pa.array(np.unique(np.concatenate([ga, gb])), pa.int64())

    def semi_join(t: pa.Table) -> pa.Table:
        t = t.select([id_col, text_col])
        return t.filter(pc.is_in(pc.cast(t.column(id_col), pa.int64()),
                                 value_set=uids_arr))

    parts, total = [], 0
    for tbl in docs_ds.map_batches(
            semi_join, batch_format="pyarrow").iter_batches(
            batch_size=None, batch_format="pyarrow"):
        parts.append(tbl)
        total += tbl.nbytes
        if total > _DRIVER_VERIFY_MAX_BYTES:
            return None
    got = pa.concat_tables(parts) if parts else None
    sh: dict = {}
    if got is not None and got.num_rows:
        ids = pc.cast(got.column(id_col), pa.int64()) \
            .to_numpy(zero_copy_only=False)
        texts = pc.fill_null(pc.cast(got.column(text_col), pa.string()),
                             "").to_pylist()
        uniq, first = np.unique(ids, return_index=True)
        sh = {int(u): set_fn(texts[i]) for u, i in zip(uniq, first)}
    present = np.array([int(x) in sh and int(y) in sh
                        for x, y in zip(ga, gb)], dtype=bool)
    ga, gb = ga[present], gb[present]
    empty = pa.table({"a": pa.array([], pa.int64()),
                      "b": pa.array([], pa.int64()),
                      "jaccard": pa.array([], pa.float64())})
    if len(ga) == 0:
        return rd.from_arrow(empty)
    segs = [sh[int(v)] for pr in zip(ga, gb) for v in pr]
    inter = _pair_intersections(segs)
    sizes = np.fromiter((len(s_) for s_ in segs), dtype=np.int64,
                        count=2 * len(ga)).reshape(-1, 2)
    union = np.maximum(sizes[:, 0] + sizes[:, 1] - inter, 1)
    j = inter / union
    keep = j >= threshold
    return rd.from_arrow(pa.table({
        "a": pa.array(ga[keep], pa.int64()),
        "b": pa.array(gb[keep], pa.int64()),
        "jaccard": pa.array(j[keep], pa.float64())}))


def _jaccard_verify_broadcast(pairs_ds, docs_ds, threshold: float,
                              id_col: str, text_col: str,
                              set_fn, n_buckets: int):
    """Bounded-candidate fast path (see :func:`jaccard_verify`)."""
    import ray
    import ray.data as rd

    pa_ids, pb_ids = _canonical_pairs(pairs_ds)
    n_pairs = len(pa_ids)
    nb = int(max(1, min(n_buckets, -(-n_pairs // 512))))
    # round-robin pair→bucket: perfectly balanced by construction
    pbkt = np.arange(n_pairs, dtype=np.int64) % nb
    po = np.argsort(pbkt, kind="stable")
    pa_ids, pb_ids, pbkt = pa_ids[po], pb_ids[po], pbkt[po]
    p_indptr = np.searchsorted(pbkt, np.arange(nb + 1))
    # endpoint → buckets CSR (a doc's text ships once per bucket that
    # needs it)
    eps = np.concatenate([pa_ids, pb_ids])
    ebkt = np.concatenate([pbkt, pbkt])
    eo = np.lexsort((ebkt, eps))
    eps, ebkt = eps[eo], ebkt[eo]
    ekeep = np.concatenate([[True], (eps[1:] != eps[:-1]) |
                            (ebkt[1:] != ebkt[:-1])])
    eps, ebkt = eps[ekeep], ebkt[ekeep]
    uids = np.unique(eps)
    e_starts = np.searchsorted(eps, uids)
    e_ends = np.searchsorted(eps, uids, side="right")
    route = ray.put({"pa": pa_ids, "pb": pb_ids, "p_indptr": p_indptr,
                     "uids": uids, "ebkt": ebkt,
                     "e_starts": e_starts, "e_counts": e_ends - e_starts})

    def route_docs(tbl: pa.Table) -> pa.Table:
        d = ray.get(route)  # plasma-shared, zero-copy numpy views
        ids = pc.cast(tbl.column(id_col), pa.int64()) \
            .to_numpy(zero_copy_only=False)
        pos = np.searchsorted(d["uids"], ids)
        pos_c = np.minimum(pos, max(0, len(d["uids"]) - 1))
        hit = (len(d["uids"]) > 0) & (d["uids"][pos_c] == ids)
        hit_rows = np.nonzero(hit)[0]
        if len(hit_rows) == 0:
            return pa.table({"bucket": pa.array([], pa.int32()),
                             id_col: pa.array([], pa.int64()),
                             "doc": pa.array([], pa.string())})
        idxs = pos_c[hit_rows]
        counts = d["e_counts"][idxs]
        starts = d["e_starts"][idxs]
        total = int(counts.sum())
        rep = np.repeat(np.arange(len(hit_rows), dtype=np.int64), counts)
        offs = np.arange(total, dtype=np.int64) - \
            np.repeat(np.cumsum(counts) - counts, counts)
        buckets = d["ebkt"][np.repeat(starts, counts) + offs]
        texts = pc.fill_null(
            pc.cast(tbl.column(text_col), pa.string()), "") \
            .take(pa.array(hit_rows[rep], pa.int64()))
        return pa.table({
            "bucket": pa.array(buckets.astype(np.int32), pa.int32()),
            id_col: pa.array(ids[hit_rows][rep], pa.int64()),
            "doc": texts})

    def verify_group(g: pa.Table) -> pa.Table:
        empty = pa.table({"a": pa.array([], pa.int64()),
                          "b": pa.array([], pa.int64()),
                          "jaccard": pa.array([], pa.float64())})
        if g.num_rows == 0:
            return empty
        d = ray.get(route)
        bkt = int(g.column("bucket")[0].as_py())
        s, e = int(d["p_indptr"][bkt]), int(d["p_indptr"][bkt + 1])
        ga, gb = d["pa"][s:e], d["pb"][s:e]
        ids = pc.cast(g.column(id_col), pa.int64()) \
            .to_numpy(zero_copy_only=False)
        texts = g.column("doc").to_pylist()
        sh: dict = {}
        for i, txt in zip(ids, texts):
            if int(i) not in sh:
                sh[int(i)] = set_fn(txt or "")
        # a pair whose endpoint text is absent from the corpus drops
        # (inner-join semantics, same as the cogroup path)
        present = np.array([int(x) in sh and int(y) in sh
                            for x, y in zip(ga, gb)], dtype=bool)
        ga, gb = ga[present], gb[present]
        if len(ga) == 0:
            return empty
        segs = [sh[int(v)] for pr in zip(ga, gb) for v in pr]
        inter = _pair_intersections(segs)
        sizes = np.fromiter((len(s_) for s_ in segs), dtype=np.int64,
                            count=2 * len(ga)).reshape(-1, 2)
        union = np.maximum(sizes[:, 0] + sizes[:, 1] - inter, 1)
        j = inter / union
        keep2 = j >= threshold
        return pa.table({"a": pa.array(ga[keep2], pa.int64()),
                         "b": pa.array(gb[keep2], pa.int64()),
                         "jaccard": pa.array(j[keep2], pa.float64())})

    routed = docs_ds.map_batches(route_docs, batch_format="pyarrow")
    return routed.groupby("bucket").map_groups(verify_group,
                                               batch_format="pyarrow")


def _jaccard_verify_cogroup(pairs_ds, docs_ds, threshold: float,
                            id_col: str, text_col: str,
                            set_fn, n_buckets: int):
    """Unbounded-candidate path (see :func:`jaccard_verify`)."""

    def tag_endpoints(t: pa.Table) -> pa.Table:
        # two rows per pair — each endpoint fetches its own text in the
        # single cogroup pass (docs stream through the shuffle ONCE)
        a = pc.cast(t.column("a"), pa.int64())
        b = pc.cast(t.column("b"), pa.int64())
        a = a.combine_chunks() if isinstance(a, pa.ChunkedArray) else a
        b = b.combine_chunks() if isinstance(b, pa.ChunkedArray) else b
        n = t.num_rows
        return pa.table({
            "key": pa.concat_arrays([a, b]),
            "a": pa.concat_arrays([a, a]),
            "b": pa.concat_arrays([b, b]),
            "doc": pa.nulls(2 * n, pa.string())})

    def tag_docs(t: pa.Table) -> pa.Table:
        return pa.table({
            "key": pc.cast(t.column(id_col), pa.int64()),
            "a": pa.nulls(t.num_rows, pa.int64()),
            "b": pa.nulls(t.num_rows, pa.int64()),
            # fill_null so a null-text doc stays distinguishable from an
            # endpoint row (doc-null marks the pair side of the cogroup)
            "doc": pc.fill_null(pc.cast(t.column(text_col), pa.string()),
                                "")})

    def add_bucket(t: pa.Table) -> pa.Table:
        return t.append_column("bucket", int_bucket(t.column("key"),
                                                    n_buckets))

    def attach_text(g: pd.DataFrame) -> pa.Table:
        docs = g[g["doc"].notna()][["key", "doc"]]
        # dedup duplicate candidates here (pairs found by several LSH
        # bands) — lets upstream skip its own dedup shuffle
        eps = g[g["doc"].isna()][["key", "a", "b"]] \
            .drop_duplicates(["key", "a", "b"])
        m = eps.merge(docs, on="key")
        # re-key by the pair's first endpoint so both halves co-locate
        # for the pivot (explicit arrow schema: an all-null pandas column
        # would infer the null type downstream)
        return pa.table({
            "a": pa.array(m["a"].to_numpy(dtype="int64"), pa.int64()),
            "b": pa.array(m["b"].to_numpy(dtype="int64"), pa.int64()),
            "is_a": pa.array((m["key"] == m["a"]).to_numpy(dtype="bool"),
                             pa.bool_()),
            "doc": pa.array(m["doc"].tolist(), pa.string())})

    halves = (pairs_ds.map_batches(tag_endpoints, batch_format="pyarrow")
              .union(docs_ds.map_batches(tag_docs, batch_format="pyarrow"))
              .map_batches(add_bucket, batch_format="pyarrow")
              .groupby("bucket").map_groups(attach_text,
                                            batch_format="pandas"))

    def add_pair_bucket(t: pa.Table) -> pa.Table:
        return t.append_column("bucket", int_bucket(t.column("a"),
                                                    n_buckets))

    def pivot(g: pd.DataFrame) -> pa.Table:
        left = g[g["is_a"]][["a", "b", "doc"]].drop_duplicates(["a", "b"])
        right = g[~g["is_a"]][["a", "b", "doc"]] \
            .drop_duplicates(["a", "b"])
        m = left.merge(right, on=["a", "b"], suffixes=("_a", "_b"))
        return pa.table({
            "a": pa.array(m["a"].to_numpy(dtype="int64"), pa.int64()),
            "b": pa.array(m["b"].to_numpy(dtype="int64"), pa.int64()),
            "ta": pa.array(m["doc_a"].tolist(), pa.string()),
            "tb": pa.array(m["doc_b"].tolist(), pa.string())})

    joined = (halves.map_batches(add_pair_bucket, batch_format="pyarrow")
              .groupby("bucket").map_groups(pivot, batch_format="pandas"))

    def verify(t: pa.Table) -> pa.Table:
        empty = pa.table({"a": pa.array([], pa.int64()),
                          "b": pa.array([], pa.int64()),
                          "jaccard": pa.array([], pa.float64())})
        n_pairs = t.num_rows
        if n_pairs == 0:
            return empty
        a = pc.cast(t.column("a"), pa.int64()).to_numpy(zero_copy_only=False)
        b = pc.cast(t.column("b"), pa.int64()).to_numpy(zero_copy_only=False)
        # shingle-hash each DISTINCT endpoint doc ONCE per batch (a hub
        # doc appearing in many pairs used to recompute per occurrence)
        texts = t.column("ta").to_pylist() + t.column("tb").to_pylist()
        ids = np.concatenate([a, b])
        uniq, first = np.unique(ids, return_index=True)
        sh = {int(u): set_fn(texts[i] or "")
              for u, i in zip(uniq, first)}
        segs = [sh[int(x)] for pr in zip(a, b) for x in pr]
        inter = _pair_intersections(segs)
        sizes = np.fromiter((len(s) for s in segs), dtype=np.int64,
                            count=2 * n_pairs).reshape(-1, 2)
        union = np.maximum(sizes[:, 0] + sizes[:, 1] - inter, 1)
        j = inter / union
        keep = j >= threshold
        return pa.table({"a": pa.array(a[keep], pa.int64()),
                         "b": pa.array(b[keep], pa.int64()),
                         "jaccard": pa.array(j[keep], pa.float64())})

    return joined.map_batches(verify, batch_format="pyarrow")


# ----------------------------------------------------------------- simhash

class SimHasher:
    """64-bit SimHash over vectorized FNV-1a token hashes; narrow
    map_batches stage. Unique tokens are hashed ONCE per batch (one
    padded-matrix FNV pass, :func:`raybeats.util.fnv1a_u64`) and the
    per-document bit votes reduce with ``np.add.reduceat`` — no
    per-token md5 calls, no per-document python loop."""

    def __init__(self, id_col: str = "doc_id", text_col: str = "text"):
        import re
        self.token_re = re.compile(r"[a-z0-9]+")
        self.id_col = id_col
        self.text_col = text_col

    def simhash(self, text: str) -> int:
        """Single-doc convenience (tests); same kernel as __call__."""
        tbl = pa.table({self.id_col: pa.array([0], pa.int64()),
                        self.text_col: pa.array([text], pa.string())})
        return self(tbl).column("simhash")[0].as_py()

    def __call__(self, tbl: pa.Table) -> pa.Table:
        import itertools

        from ..util import fnv1a_u64

        texts = tbl.column(self.text_col).to_pylist()
        tok_lists = [self.token_re.findall((t or "").lower())
                     for t in texts]
        lens = np.array([len(t) for t in tok_lists], dtype=np.int64)
        out = np.zeros(len(texts), dtype=np.uint64)
        if lens.sum():
            flat = list(itertools.chain.from_iterable(tok_lists))
            hs = fnv1a_u64(pa.array(flat, pa.string()))
            bits = np.unpackbits(hs.view(np.uint8).reshape(-1, 8), axis=1,
                                 bitorder="little").astype(np.int32)
            starts = np.concatenate(([0], np.cumsum(lens)[:-1]))
            nonzero = lens > 0
            sums = np.zeros((len(texts), 64), dtype=np.int32)
            # reduceat over nonzero-segment starts: zero-length segments
            # occupy no rows, so consecutive nonzero starts bound exactly
            sums[nonzero] = np.add.reduceat(bits, starts[nonzero], axis=0)
            votes = 2 * sums - lens[:, None].astype(np.int32)
            hv = np.packbits(votes > 0, axis=1, bitorder="little") \
                .copy().view(np.uint64).ravel()
            out = np.where(nonzero, hv, np.uint64(0))
        out &= np.uint64(0x7FFFFFFFFFFFFFFF)
        return pa.table({self.id_col: tbl.column(self.id_col),
                         "simhash": pa.array(out.view(np.int64),
                                             pa.int64())})


def simhash_near_dup_pairs(ds, max_hamming: int = 3,
                           id_col: str = "doc_id", text_col: str = "text",
                           n_buckets: int = 64, max_unique: int = 4096):
    """SimHash near-dup pairs with GUARANTEED recall for small hamming
    distance: split the 64-bit simhash into 4 chunks of 16 bits; any two
    hashes within hamming distance 3 must share at least one chunk
    (pigeonhole), so chunk-equality buckets contain every such pair.
    Candidates are then verified with an exact vectorized XOR popcount.
    Only (id, chunk) rows shuffle; 16-bit chunks keep buckets sparse.

    Degenerate-bucket safety: the quadratic compare runs on the UNIQUE
    simhashes of a chunk bucket (class representatives), so a huge
    identical-hash class (e.g. empty docs → simhash 0) costs one row,
    not k². A bucket with more than ``max_unique`` DISTINCT hashes
    recurses into multi-index sub-buckets (4 × 12-bit sub-chunks of the
    remaining 48 bits — the pigeonhole applies again, so the d≤3
    guarantee survives; only a sub-bucket still over the cap truncates,
    with a warning). ``max_class`` caps the per-class pair expansion
    (deterministic smallest-first truncation; over-cap members
    star-link to the class min — hamming 0 — so transitive clustering
    keeps them reachable)."""
    assert max_hamming <= 3, "4x16-bit chunking guarantees recall to d=3"
    max_class = 1024

    def explode(tbl: pa.Table) -> pa.Table:
        hashed = SimHasher(id_col=id_col, text_col=text_col)(tbl)
        ids = pc.cast(hashed.column(id_col), pa.int64()) \
            .to_numpy(zero_copy_only=False)
        hs = hashed.column("simhash").to_numpy(zero_copy_only=False) \
            .astype(np.int64).view(np.uint64)
        n = len(ids)
        # one np.repeat/shift/mask pass — no per-row python
        shifts = np.uint64(16) * np.arange(4, dtype=np.uint64)
        keys = ((hs[:, None] >> shifts[None, :]) & np.uint64(0xFFFF)) \
            .astype(np.int32).ravel()
        return pa.table({
            id_col: pa.array(np.repeat(ids, 4), pa.int64()),
            "chunk": pa.array(np.tile(np.arange(4, dtype=np.int32), n),
                              pa.int32()),
            "chunk_key": pa.array(keys, pa.int32()),
            "simhash": pa.array(np.repeat(hs.view(np.int64), 4),
                                pa.int64())})

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        return _simhash_bucket_pairs(g, id_col=id_col,
                                     max_hamming=max_hamming,
                                     max_unique=max_unique,
                                     max_class=max_class)

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


def _simhash_bucket_pairs(g: "pd.DataFrame", id_col: str = "doc_id",
                          max_hamming: int = 3, max_unique: int = 4096,
                          max_class: int = 1024) -> "pd.DataFrame":
    """Per-shuffle-bucket simhash candidate pairing (the map_groups
    kernel of :func:`simhash_near_dup_pairs`, module-level so the
    degenerate-bucket paths are directly testable)."""
    empty = pd.DataFrame({"a": pd.array([], dtype="int64"),
                          "b": pd.array([], dtype="int64")})
    g = g.drop_duplicates([id_col, "chunk", "chunk_key"])
    sizes = g.groupby(["chunk", "chunk_key"])[id_col].transform("size")
    g = g[sizes > 1]
    if len(g) == 0:
        return empty
    # class-member cap (identical full simhash within a chunk
    # bucket): over-cap members star-link to the class min id —
    # hamming 0 by construction, so they stay in the result and
    # transitive clustering folds them into the class
    g_all = g.sort_values(id_col)
    g = g_all.groupby(["chunk", "chunk_key", "simhash"],
                      sort=False).head(max_class)
    star_extras = g_all.loc[g_all.index.difference(g.index)]
    star_a = star_b = None
    if len(star_extras):
        class_min = g_all.groupby(
            ["chunk", "chunk_key", "simhash"], sort=False)[id_col] \
            .min().rename("hub").reset_index()
        star = star_extras.merge(class_min,
                                 on=["chunk", "chunk_key", "simhash"])
        star_a = star["hub"].to_numpy(dtype="int64")
        star_b = star[id_col].to_numpy(dtype="int64")
    # representative compare on UNIQUE simhashes per bucket; buckets
    # beyond max_unique uniques recurse into multi-index sub-buckets
    # instead of truncating (the r2 silent recall hole)
    u = g.drop_duplicates(["chunk", "chunk_key", "simhash"])[
        ["chunk", "chunk_key", "simhash"]]
    gsz = u.groupby(["chunk", "chunk_key"])["simhash"] \
        .transform("size")
    m_parts = []
    small_u = u[gsz <= max_unique]
    if len(small_u):
        mm = small_u.merge(small_u, on=["chunk", "chunk_key"])
        m_parts.append(mm[mm["simhash_x"] <= mm["simhash_y"]])
    big_u = u[gsz > max_unique]
    if len(big_u):
        # multi-index recursion (the pigeonhole again, one level
        # down — "Fast Search in Hamming Space with Multi-Index
        # Hashing" shape): bucket members already agree on their
        # 16-bit chunk, so ≤3 differing bits spread over 4
        # sub-chunks of the REMAINING 48 bits leave at least one
        # sub-chunk equal. Sub-bucket-equality keeps the d≤3
        # guarantee while cutting a degenerate bucket by up to
        # 2^12. A sub-bucket still over max_unique (>4096 distinct
        # hashes agreeing on 28 bits) truncates with a warning.
        h = big_u["simhash"].to_numpy().astype(np.uint64)
        c = big_u["chunk"].to_numpy().astype(np.uint64)
        shift_c = np.uint64(16) * c
        low = h & ((np.uint64(1) << shift_c) - np.uint64(1))
        rem = low | ((h >> (shift_c + np.uint64(16))) << shift_c)
        rows = []
        for j in range(4):
            sub = ((rem >> np.uint64(12 * j)) & np.uint64(0xFFF)) \
                .astype(np.int64)
            rows.append(big_u.assign(sub=np.int32(j), subkey=sub))
        eb = pd.concat(rows, ignore_index=True)
        ssz = eb.groupby(["chunk", "chunk_key", "sub", "subkey"])[
            "simhash"].transform("size")
        if (ssz > max_unique).any():
            import warnings
            warnings.warn(
                "simhash_near_dup_pairs: sub-bucket over max_unique "
                "truncated — recall guarantee does not cover the "
                "truncated hashes", stacklevel=2)
            eb = eb.sort_values("simhash").groupby(
                ["chunk", "chunk_key", "sub", "subkey"],
                sort=False).head(max_unique)
        mm = eb.merge(eb, on=["chunk", "chunk_key", "sub", "subkey"])
        mm = mm[mm["simhash_x"] <= mm["simhash_y"]]
        m_parts.append(
            mm[["chunk", "chunk_key", "simhash_x", "simhash_y"]]
            .drop_duplicates())
    m = (pd.concat(m_parts, ignore_index=True) if m_parts
         else pd.DataFrame(columns=["chunk", "chunk_key",
                                    "simhash_x", "simhash_y"]))
    if len(m) == 0:
        return empty
    # exact hamming verify on class reps, vectorized popcount
    x = m["simhash_x"].to_numpy().astype(np.uint64)
    y = m["simhash_y"].to_numpy().astype(np.uint64)
    d = np.zeros(len(m), dtype=np.int32)
    v = x ^ y
    for _ in range(64):
        d += (v & np.uint64(1)).astype(np.int32)
        v >>= np.uint64(1)
    m = m[d <= max_hamming]
    if len(m) == 0:
        return empty
    # expand class pairs back to member id pairs
    ga = g.rename(columns={id_col: "ida", "simhash": "simhash_x"})[
        ["chunk", "chunk_key", "simhash_x", "ida"]]
    gb = g.rename(columns={id_col: "idb", "simhash": "simhash_y"})[
        ["chunk", "chunk_key", "simhash_y", "idb"]]
    e = m.merge(ga, on=["chunk", "chunk_key", "simhash_x"]) \
         .merge(gb, on=["chunk", "chunk_key", "simhash_y"])
    ida = e["ida"].to_numpy(dtype="int64")
    idb = e["idb"].to_numpy(dtype="int64")
    if star_a is not None:
        ida = np.concatenate([ida, star_a])
        idb = np.concatenate([idb, star_b])
    lo, hi = np.minimum(ida, idb), np.maximum(ida, idb)
    keep = lo < hi
    return pd.DataFrame({"a": lo[keep], "b": hi[keep]})


def duplicate_clusters(pairs, n_buckets: int = 32, max_iters: int = 25,
                       small_graph_threshold: int = 200_000):
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

    empty = pa.table({"node": pa.array([], pa.int64()),
                      "cluster": pa.array([], pa.int64())})
    if isinstance(pairs, pd.DataFrame):
        pairs = pa.Table.from_pandas(pairs, preserve_index=False)
    if isinstance(pairs, pa.Table):
        if pairs.num_rows == 0:
            return rd.from_arrow(empty)
        pairs = rd.from_arrow(pairs.select(["a", "b"]))
    pairs = pairs.materialize()  # consumed once per round below
    n_edges = pairs.count()
    if n_edges == 0:
        return rd.from_arrow(empty)
    if n_edges <= small_graph_threshold:
        # small graphs: per-round distributed overhead (several shuffles
        # × rounds) dwarfs the work — exact driver union-find under a
        # BOUNDED edge budget, distributed propagation above it
        t = pa.concat_tables(list(pairs.iter_batches(
            batch_size=None, batch_format="pyarrow")))
        parent: dict[int, int] = {}

        def find(x: int) -> int:
            while parent.setdefault(x, x) != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for x, y in zip(t.column("a").to_pylist(),
                        t.column("b").to_pylist()):
            rx, ry = find(int(x)), find(int(y))
            if rx != ry:
                parent[max(rx, ry)] = min(rx, ry)
        nodes = sorted(parent)
        return rd.from_arrow(pa.table({
            "node": pa.array(nodes, pa.int64()),
            "cluster": pa.array([find(n) for n in nodes], pa.int64())}))

    def bidir(t: pa.Table) -> pa.Table:
        # the edge set stays a Dataset end-to-end (no driver fan-in);
        # each batch emits both directions
        a = pc.cast(t.column("a"), pa.int64())
        b = pc.cast(t.column("b"), pa.int64())
        a = a.combine_chunks() if isinstance(a, pa.ChunkedArray) else a
        b = b.combine_chunks() if isinstance(b, pa.ChunkedArray) else b
        return pa.table({"key": pa.concat_arrays([a, b]),
                         "other": pa.concat_arrays([b, a])})

    edges = pairs.map_batches(bidir, batch_format="pyarrow")

    from ray.data.aggregate import Min

    # init: label[n] = n
    # materialize the per-round small states (edges once, labels each
    # round): object-store resident + spillable, and it caps lineage —
    # a lazy chain here would re-execute every prior round (and the
    # upstream candidate pipeline) on each consumption
    labels = edges.groupby("key").aggregate(
        Min("key", alias_name="label")).materialize()

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

    tagged_edges = edges.map_batches(tag_edges,
                                     batch_format="pyarrow").materialize()
    prev_sum = None
    for _ in range(max_iters):
        tagged_labels = labels.map_batches(tag_labels,
                                           batch_format="pyarrow")
        proposals = tagged_edges.union(tagged_labels) \
            .groupby("bucket").map_groups(propose, batch_format="pandas")
        labels = proposals.groupby("key").aggregate(
            Min("cand", alias_name="label")).materialize()
        from ray.data.aggregate import Sum
        s = labels.aggregate(Sum("label", alias_name="s"))["s"]
        if s == prev_sum:
            break
        prev_sum = s

    def rename(t: pa.Table) -> pa.Table:
        return pa.table({"node": t.column("key"),
                         "cluster": t.column("label")})
    # lazy result: (node, cluster) stays distributed — no driver concat
    # (round-1 nit); callers sort/materialize as needed
    return labels.map_batches(rename, batch_format="pyarrow").sort("node")


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


# ------------------------------------------- exact n-gram Jaccard join

def token_gram_hash_set(text: str, w: int = 4) -> np.ndarray:
    """Distinct rolling-hash values of one text's ``w``-token shingles.
    Tokenizer single-sourced (`analysis.flat_tokens`) and the rolling
    combine single-sourced (`curation._shingle_hash`), so the verify
    stage cannot drift from the batch candidate stage, which uses the
    same two kernels over whole batches."""
    from .curation import _shingle_hash
    from ..util import fnv1a_u64

    from .analysis import flat_tokens
    _, toks, _ = flat_tokens(pa.array([text or ""], pa.string()))
    h = fnv1a_u64(toks)
    if len(h) < w:
        return np.empty(0, np.uint64)
    return np.unique(_shingle_hash(h, w))


def _gram_sets_batch(text, w: int):
    """Per-batch distinct ``w``-token-shingle hashes: returns
    ``(row_id, gram_hash)`` sorted by (row, hash) with per-row
    duplicates removed, plus the per-row distinct counts (len n_rows).
    Shingles never cross a row boundary."""
    from .analysis import flat_tokens
    from .curation import _shingle_hash
    from ..util import fnv1a_u64

    row_id, toks, n_rows = flat_tokens(text)
    h = fnv1a_u64(toks)
    m = len(h) - w + 1
    if m <= 0:
        return (np.empty(0, np.int64), np.empty(0, np.uint64),
                np.zeros(n_rows, np.int64))
    sh = _shingle_hash(h, w)
    ok = row_id[:m] == row_id[w - 1:]
    r, g = row_id[:m][ok], sh[ok]
    order = np.lexsort((g, r))
    r, g = r[order], g[order]
    if len(r):
        first = np.empty(len(r), bool)
        first[0] = True
        first[1:] = (r[1:] != r[:-1]) | (g[1:] != g[:-1])
        r, g = r[first], g[first]
    counts = np.bincount(r, minlength=n_rows).astype(np.int64)
    return r, g, counts


def prefix_filter_candidates(docs_ds, *, tnum: int, tden: int, w: int = 4,
                             n_buckets: int = 64, id_col: str = "doc_id",
                             text_col: str = "text",
                             max_group_pairs: int = 5_000_000):
    """COMPLETE candidate pairs for token-``w``-gram Jaccard ≥
    ``tnum/tden`` via symmetric prefix filtering (the All-Pairs/PPJoin
    family, Bayardo et al. WWW'07 / Xiao et al. WWW'08) — unlike
    MinHash-LSH there is no recall parameter: every qualifying pair is
    guaranteed to be generated.

    Theorem used: under any global total order on set elements, if
    ``J(a,b) ≥ τ`` then ``a`` and ``b`` share an element inside BOTH
    prefixes of length ``|x| − ceil(τ·|x|) + 1`` (the first common
    element sits at position ``≤ |x| − |a∩b| + 1``, and ``J ≥ τ``
    forces ``|a∩b| ≥ ceil(τ·|x|)`` for both endpoints given the length
    ratio ``|a| ≥ τ·|b|`` that ``J ≥ τ`` itself implies). The global
    order here is the gram HASH — adequate because ``w``-token grams
    are near-unique (a document-frequency order, the stopword-token
    optimization, would only shrink the already-small groups).

    Shape: one narrow tokenize pass emits (gram, doc, n) for PREFIX
    grams only (~``(1−τ)·|set|`` rows per doc); ONE gram-hash-bucketed
    groupby co-locates each gram's prefix postings; within a group the
    postings sort by (gram, n, id) and each posting pairs with the
    ``searchsorted`` window of longer sets still inside the τ length
    ratio (integer arithmetic: ``tden·n_a ≥ tnum·n_b`` — no float
    boundary loss), exploded via np.repeat/aranges. A group exceeding
    ``max_group_pairs`` raises rather than silently dropping (the
    interval-replication convention)."""
    tau_ok = 0 < tnum <= tden
    if not tau_ok:
        raise ValueError(f"need 0 < tnum <= tden: {tnum}/{tden}")

    def prefix_rows(t: pa.Table) -> pa.Table:
        r, g, counts = _gram_sets_batch(t.column(text_col), w)
        # prefix length p = n − ceil(τ·n) + 1, integer-exact
        p = counts - (tnum * counts + tden - 1) // tden + 1
        # rank of each gram within its row ((r, g) sorted by row, hash)
        if len(r):
            starts = np.flatnonzero(np.concatenate(
                [[True], r[1:] != r[:-1]]))
            seg_lens = np.diff(np.append(starts, len(r)))
            rank = np.arange(len(r)) - np.repeat(starts, seg_lens)
            keep = rank < p[r]
        else:
            keep = np.zeros(0, bool)
        ids = t.column(id_col).combine_chunks() if isinstance(
            t.column(id_col), pa.ChunkedArray) else t.column(id_col)
        doc = pc.cast(ids, pa.int64()).take(
            pa.array(r[keep], pa.int64()))
        gh = g[keep]
        return pa.table({
            "gram": pa.array(gh.view(np.int64), pa.int64()),
            id_col: doc,
            "n": pa.array(counts[r[keep]], pa.int64()),
            "bucket": pa.array((gh % np.uint64(n_buckets))
                               .astype(np.int32), pa.int32())})

    def group_pairs(g: pa.Table) -> pa.Table:
        gram = g.column("gram").to_numpy(zero_copy_only=False)
        doc = g.column(id_col).to_numpy(zero_copy_only=False)
        n = g.column("n").to_numpy(zero_copy_only=False)
        order = np.lexsort((doc, n, gram))
        gram, doc, n = gram[order], doc[order], n[order]
        m = len(gram)
        empty = pa.table({"a": pa.array([], pa.int64()),
                          "b": pa.array([], pa.int64())})
        if m < 2:
            return empty
        seg = np.concatenate([[True], gram[1:] != gram[:-1]])
        seg_id = np.cumsum(seg) - 1
        # for posting i (the SHORTER set), partners are the window
        # (i, hi_i) of same-gram postings with tden·n_i ≥ tnum·n_j
        # — n ascending within a segment, so the window is contiguous.
        # One searchsorted over a segment-major composite key answers
        # every window at once; BIG dominates the n-term so segments
        # cannot interleave (≤ ~1e6 postings × ~1e6·tden per group —
        # far inside int64)
        big = int(n.max()) * max(tnum, tden) + 1
        bound = np.searchsorted(seg_id * big + n * tnum,
                                seg_id * big + n * tden,
                                side="right")
        lo = np.arange(m) + 1
        cnt = np.maximum(bound - lo, 0)
        total = int(cnt.sum())
        if total > max_group_pairs:
            raise ValueError(
                f"prefix-filter group exploded to {total} pairs "
                f"(> {max_group_pairs}); raise max_group_pairs or "
                f"pre-filter stop-grams")
        if total == 0:
            return empty
        ii = np.repeat(np.arange(m), cnt)
        jj = np.arange(total) - np.repeat(np.cumsum(cnt) - cnt, cnt) \
            + lo[ii]
        a, b = doc[ii], doc[jj]
        swap = a > b
        a2 = np.where(swap, b, a)
        b2 = np.where(swap, a, b)
        porder = np.lexsort((b2, a2))
        a2, b2 = a2[porder], b2[porder]
        keep = np.concatenate([[True], (a2[1:] != a2[:-1]) |
                               (b2[1:] != b2[:-1])])
        return pa.table({"a": pa.array(a2[keep], pa.int64()),
                         "b": pa.array(b2[keep], pa.int64())})

    return docs_ds.map_batches(prefix_rows, batch_format="pyarrow") \
        .groupby("bucket").map_groups(group_pairs, batch_format="pyarrow")


def exact_ngram_jaccard_pairs(docs_ds, verify_ds, *, tnum: int = 3,
                              tden: int = 5, w: int = 4,
                              n_buckets: int = 64,
                              id_col: str = "doc_id",
                              text_col: str = "text"):
    """EXACT all-pairs token-``w``-gram Jaccard ≥ ``tnum/tden``:
    prefix-filter candidates (complete — see
    :func:`prefix_filter_candidates`) → exact per-pair verify over the
    same gram-hash sets (:func:`jaccard_verify` with
    :func:`token_gram_hash_set`). Returns (a, b, jaccard) with a < b.
    ``docs_ds``/``verify_ds`` are two read lineages of the same table
    (each stage consumes the scan once)."""
    cand = prefix_filter_candidates(
        docs_ds, tnum=tnum, tden=tden, w=w, n_buckets=n_buckets,
        id_col=id_col, text_col=text_col)

    def set_fn(txt: str) -> np.ndarray:
        return token_gram_hash_set(txt, w)

    return jaccard_verify(cand, verify_ds, threshold=tnum / tden,
                          id_col=id_col, text_col=text_col,
                          n_buckets=n_buckets, set_fn=set_fn)
