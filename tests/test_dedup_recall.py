"""Dedup recall on the planted-duplicate document corpus."""

import pyarrow.compute as pc


def test_planted_dedup_recall(ray_session, tmp_path):
    import ray.data as rd

    from raybeats.fixtures import write_documents
    from raybeats.textops.dedup import (exact_dedup_groups,
                                        jaccard_verify, minhash_candidates)

    info = write_documents(str(tmp_path / "docs"), n_docs=3000, seed=11,
                           num_files=4)
    ds = rd.read_parquet(info["files"])
    full = ds.to_pandas()
    planted_exact = full[full.dup_kind == 1]
    planted_near = full[full.dup_kind == 2]
    assert len(planted_exact) > 50 and len(planted_near) > 50

    # exact dedup: every planted exact dup must fold into a group
    groups = exact_dedup_groups(ds.select_columns(["doc_id", "text"])) \
        .to_pandas()
    n_folded = (groups["dups"] - 1).sum()
    assert n_folded >= len(planted_exact)  # transitive copies can add more

    # minhash near-dup: recall of planted near-dup PAIRS
    docs = ds.select_columns(["doc_id", "text"])
    cand = minhash_candidates(docs, num_hashes=96, bands=16, shingle_k=8)
    verified = jaccard_verify(cand, docs, threshold=0.5).to_pandas()
    found = {tuple(sorted(p)) for p in zip(verified["a"], verified["b"])}
    want = {tuple(sorted((int(r.doc_id), int(r.dup_of))))
            for r in planted_near.itertuples()}
    recall = len(found & want) / len(want)
    assert recall >= 0.8, f"near-dup recall {recall:.2f}"


def test_jaccard_verify_distributed_parity(ray_session, tmp_path):
    """The distributed cogroup verify must produce EXACTLY the pair set
    (and jaccard values) of a driver-side reference over the same
    candidates — and it must do so without materializing any text dict
    on the driver (structural: the implementation only builds Datasets)."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from raybeats.fixtures import write_documents
    from raybeats.textops.dedup import (_shingle_hashes, jaccard_verify,
                                        minhash_candidates)

    info = write_documents(str(tmp_path / "docs"), n_docs=2000, seed=31,
                           num_files=4)
    docs = rd.read_parquet(info["files"], columns=["doc_id", "text"])
    cand = pa.concat_tables(list(
        minhash_candidates(docs).iter_batches(batch_format="pyarrow")))
    assert cand.num_rows > 20

    ver = jaccard_verify(rd.from_arrow(cand), docs, threshold=0.5)
    assert isinstance(ver, rd.Dataset)  # lazy, no driver fan-in
    vt = ver.to_pandas()
    got = sorted(zip(vt["a"], vt["b"], vt["jaccard"]))

    texts = dict(zip(*[docs.to_pandas()[c] for c in ("doc_id", "text")]))
    ref = []
    for a, b in zip(cand.column("a").to_pylist(),
                    cand.column("b").to_pylist()):
        sa = _shingle_hashes(texts[a] or "", 8)
        sb = _shingle_hashes(texts[b] or "", 8)
        inter = len(np.intersect1d(sa, sb, assume_unique=True))
        j = inter / max(1, len(sa) + len(sb) - inter)
        if j >= 0.5:
            ref.append((a, b, j))
    assert got == sorted(ref)


def test_duplicate_clusters_match_union_find(ray_session, tmp_path):
    """Distributed min-label propagation must equal driver union-find on
    the planted-duplicate pair graph (chains of dups form components)."""
    import pyarrow as pa

    from raybeats.fixtures import write_documents
    from raybeats.textops.dedup import duplicate_clusters

    import ray.data as rd
    info = write_documents(str(tmp_path / "docs"), n_docs=1500, seed=23,
                           num_files=2)
    full = rd.read_parquet(info["files"]).to_pandas()
    planted = full[full.dup_kind > 0]
    pairs = pa.table({
        "a": pa.array(planted["doc_id"].to_numpy(), pa.int64()),
        "b": pa.array(planted["dup_of"].to_numpy(), pa.int64())})
    assert pairs.num_rows > 100

    import pyarrow as pa_mod

    def run(**kw):
        t = pa_mod.concat_tables(list(
            duplicate_clusters(pairs, n_buckets=8, **kw)
            .iter_batches(batch_format="pyarrow")))
        return dict(zip(t.column("node").to_pylist(),
                        t.column("cluster").to_pylist()))

    gm = run()  # small-graph fast path
    # distributed min-label propagation path must agree exactly
    assert run(small_graph_threshold=0) == gm

    # reference: union-find with min-root canonicalization
    parent: dict = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for x, y in zip(pairs.column("a").to_pylist(),
                    pairs.column("b").to_pylist()):
        rx, ry = find(x), find(y)
        if rx != ry:
            parent[max(rx, ry)] = min(rx, ry)
    want = {n: find(n) for n in parent}
    assert gm == want
    # at least one multi-hop chain exists (dup of a dup)
    sizes = {}
    for c in want.values():
        sizes[c] = sizes.get(c, 0) + 1
    assert max(sizes.values()) >= 3


def test_simhash_band_recall_is_complete_for_small_hamming(ray_session,
                                                           tmp_path):
    """Pigeonhole guarantee: EVERY pair within hamming distance 3 must be
    found by the 4x16-bit chunk bands (recall 1.0 on that subset)."""
    import numpy as np
    import ray.data as rd

    from raybeats.fixtures import write_documents
    from raybeats.textops.dedup import SimHasher, simhash_near_dup_pairs

    info = write_documents(str(tmp_path / "docs"), n_docs=2000, seed=9,
                           num_files=2)
    ds = rd.read_parquet(info["files"], columns=["doc_id", "text"])

    found = {(r["a"], r["b"])
             for r in simhash_near_dup_pairs(ds, max_hamming=3).take_all()}

    # ground truth: brute-force hamming over all pairs
    hashed = ds.map_batches(SimHasher(), batch_format="pyarrow").to_pandas()
    ids = hashed["doc_id"].to_numpy()
    hs = hashed["simhash"].to_numpy().astype(np.uint64)
    want = set()
    for i in range(len(ids)):
        v = hs[i] ^ hs[i + 1:]
        d = np.zeros(len(v), dtype=np.int32)
        for _ in range(64):
            d += (v & np.uint64(1)).astype(np.int32)
            v >>= np.uint64(1)
        for j in np.nonzero(d <= 3)[0]:
            a, b = int(ids[i]), int(ids[i + 1 + j])
            want.add((min(a, b), max(a, b)))
    assert want, "corpus has no small-hamming pairs?"
    assert found == want


def test_minhash_overcap_members_stay_reachable(ray_session):
    """A duplicate class larger than max_bucket must still link ALL its
    members (star candidates to the bucket hub), not silently orphan
    the beyond-cap ids."""
    import pyarrow as pa
    import ray.data as rd

    from raybeats.textops.dedup import (duplicate_clusters,
                                        jaccard_verify,
                                        minhash_candidates)

    n = 120
    text = "the same exact document body repeated verbatim many times " * 5
    docs = pa.table({"doc_id": pa.array(list(range(n)), pa.int64()),
                     "text": pa.array([text] * n, pa.string())})
    ds = rd.from_arrow(docs).repartition(4)
    cand = minhash_candidates(ds, max_bucket=16)
    pairs = jaccard_verify(cand, ds, threshold=0.5)
    labels = pa.concat_tables(list(
        duplicate_clusters(pairs).iter_batches(batch_format="pyarrow")))
    assert labels.num_rows == n  # every doc is in the graph
    assert set(labels.column("cluster").to_pylist()) == {0}  # one class


def test_simhash_bucket_overcap_uniques_multi_index_recall():
    """A chunk bucket with more distinct simhashes than max_unique must
    NOT silently drop pairs (the r2 recall hole): the multi-index
    sub-bucket recursion finds every hamming<=3 pair among them."""
    import numpy as np
    import pandas as pd

    from raybeats.textops.dedup import _simhash_bucket_pairs

    rng = np.random.default_rng(11)
    key = 0x1234
    n = 60
    # distinct hashes agreeing on chunk 0 (low 16 bits == key)
    uppers = rng.choice(1 << 40, size=n, replace=False).astype(np.uint64)
    hashes = (uppers << np.uint64(16)) | np.uint64(key)
    # plant near pairs: flip 1-3 bits in the upper 48 of some hashes
    for i, (src, bits) in enumerate([(0, [20]), (1, [25, 33]),
                                     (2, [17, 40, 60])]):
        h = hashes[src]
        for b in bits:
            h ^= np.uint64(1) << np.uint64(b)
        hashes[10 + i] = h
    hashes &= np.uint64(0x7FFFFFFFFFFFFFFF)
    hashes = np.unique(hashes)
    n = len(hashes)
    g = pd.DataFrame({"doc_id": np.arange(n, dtype="int64"),
                      "chunk": np.int32(0),
                      "chunk_key": np.int32(key),
                      "simhash": hashes.view(np.int64)})

    def brute(max_h):
        out = set()
        for i in range(n):
            for j in range(i + 1, n):
                d = bin(int(hashes[i]) ^ int(hashes[j])).count("1")
                if d <= max_h:
                    out.add((i, j))
        return out

    expect = brute(3)
    assert len(expect) >= 3  # the planted pairs survived uniquing
    # max_unique far below n forces the multi-index path
    got = _simhash_bucket_pairs(g, max_hamming=3, max_unique=8)
    got_pairs = set(zip(got["a"].tolist(), got["b"].tolist()))
    assert got_pairs == expect
    # and the small-bucket quadratic path agrees
    got_q = _simhash_bucket_pairs(g, max_hamming=3, max_unique=4096)
    assert set(zip(got_q["a"].tolist(), got_q["b"].tolist())) == expect


def test_jaccard_verify_paths_agree(ray_session, tmp_path, monkeypatch):
    """The driver, broadcast and cogroup tiers must return identical
    (a, b, jaccard) sets for the same input; the driver byte-cap
    fallback must land on the broadcast path, not fail."""
    import ray.data as rd

    from raybeats.fixtures import write_documents
    from raybeats.textops import dedup as dd

    info = write_documents(str(tmp_path / "docs"), n_docs=1500, seed=77,
                           num_files=4)
    docs = rd.read_parquet(info["files"], columns=["doc_id", "text"])
    cand = dd.minhash_candidates(docs, dedup=False)
    driver = dd.jaccard_verify(cand, docs, threshold=0.5).to_pandas()
    monkeypatch.setattr(dd, "_DRIVER_VERIFY_MAX_PAIRS", 0)
    cand2 = dd.minhash_candidates(docs, dedup=False)
    bcast = dd.jaccard_verify(cand2, docs, threshold=0.5).to_pandas()
    monkeypatch.setattr(dd, "_FAST_VERIFY_MAX_PAIRS", 0)
    cand3 = dd.minhash_candidates(docs, dedup=False)
    cogrp = dd.jaccard_verify(cand3, docs, threshold=0.5).to_pandas()
    # byte-cap fallback: driver tier admits the pairs but aborts the
    # text fetch and must fall through to broadcast
    monkeypatch.setattr(dd, "_DRIVER_VERIFY_MAX_PAIRS", 10**9)
    monkeypatch.setattr(dd, "_FAST_VERIFY_MAX_PAIRS", 10**9)
    monkeypatch.setattr(dd, "_DRIVER_VERIFY_MAX_BYTES", 0)
    cand4 = dd.minhash_candidates(docs, dedup=False)
    fell = dd.jaccard_verify(cand4, docs, threshold=0.5).to_pandas()
    assert len(driver) > 5
    expect = sorted(zip(driver["a"], driver["b"], driver["jaccard"]))
    for other in (bcast, cogrp, fell):
        assert sorted(zip(other["a"], other["b"],
                          other["jaccard"])) == expect
