"""Round-4 regression tests: the verdict's three weak-for-scale kernels
(contamination shingle probe, searchsorted broadcast range join,
adaptive pack_sequences buckets), the fused/sparse bloom build, and the
five round-3 ADVICE findings (streaming retry dedupe, asof null keys,
centroid slice offsets, bloom reserved name, registered_domain defaults
— the last covered in test_round3)."""
import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pytest


# ------------------------------------------------- contamination kernel

def _naive_hits(tbl: pa.Table, snippets: list[str]) -> np.ndarray:
    hits = np.zeros(tbl.num_rows, np.int64)
    for s in snippets:
        hits += pc.match_substring(tbl.column("text"), s).to_numpy(
            zero_copy_only=False).astype(np.int64)
    return hits


class TestContaminationShingleProbe:
    def _docs(self, n=1500, seed=11):
        rng = np.random.RandomState(seed)
        words = ["alpha", "beta", "Gamma", "delta9", "epsilon", "zeta",
                 "theta", "lambda", "sigma", "omega", "Kappa", "mu",
                 "nu", "xi", "rho", "tau", "phi", "chi", "psi", "iota"]
        docs = [" ".join(rng.choice(words, rng.randint(15, 60)))
                for _ in range(n)]
        return docs, rng

    def test_parity_with_naive_at_10k_snippets_one_probe_pass(self):
        """The verdict's done-criterion: still exact at ≥10k snippets,
        with one vectorized probe pass per shingle width (≤3), never
        one scan per snippet — and a sane wall-time bound."""
        import time

        from raybeats.textops.curation import ContaminationFlagger
        docs, rng = self._docs()
        # snippets cut at RAW CHARACTER offsets: first/last tokens are
        # partial words, exercising the interior-token probe contract
        snips = []
        for _ in range(11000):
            d = docs[rng.randint(len(docs))]
            a = rng.randint(0, max(1, len(d) - 45))
            snips.append(d[a:a + 40])
        snips = sorted(set(snips))
        assert len(snips) >= 10_000
        tbl = pa.table({"doc_id": pa.array(range(len(docs)), pa.int64()),
                        "text": pa.array(docs)})
        t0 = time.time()
        f = ContaminationFlagger(snips)
        out = f(tbl)
        dt = time.time() - t0
        assert f.n_probe_passes <= 3  # one isin pass per width, ≤ 3
        assert dt < 60  # the K-scan kernel would be minutes here
        naive = _naive_hits(tbl, snips)
        assert (out.column("n_hits").to_numpy() == naive).all()
        assert (out.column("contaminated").to_numpy(zero_copy_only=False)
                == (naive > 0)).all()

    def test_boundary_and_fallback_cases(self):
        from raybeats.textops.curation import ContaminationFlagger
        docs = ["hello world foo bar baz",
                "HELLO WORLD FOO BAR BAZ",      # case differs: no hit
                "xhello world foo barx",        # interior tokens match
                "punct-only doc ...",
                "short"]
        tbl = pa.table({"doc_id": pa.array(range(len(docs)), pa.int64()),
                        "text": pa.array(docs)})
        snips = ["llo world foo ba",  # partial first+last tokens
                 "world",             # 1 token: exact-scan fallback
                 "o w",               # interior empty: fallback
                 "@@@",               # no tokens at all: fallback
                 "ello world foo bar baz"]
        f = ContaminationFlagger(snips)
        assert len(f.fallback) == 3
        out = f(tbl)
        assert (out.column("n_hits").to_numpy()
                == _naive_hits(tbl, snips)).all()

    def test_empty_snippets_and_empty_batch(self):
        from raybeats.textops.curation import ContaminationFlagger
        f = ContaminationFlagger([])
        out = f(pa.table({"doc_id": pa.array([1], pa.int64()),
                          "text": pa.array(["x"])}))
        assert out.column("n_hits").to_pylist() == [0]
        f2 = ContaminationFlagger(["some long snippet with many words"])
        empty = f2(pa.table({"doc_id": pa.array([], pa.int64()),
                             "text": pa.array([], pa.string())}))
        assert empty.num_rows == 0


# --------------------------------------- broadcast range join rewrite

def test_range_join_broadcast_parity_at_10k_intervals(ray_session):
    """The verdict's done-criterion for weak item #2: the searchsorted
    kernel matches the per-interval-mask semantics at ~10k intervals,
    both closed modes, with no duplicate or dropped pairs."""
    import ray.data as rd

    from raybeats.joins import range_join_broadcast
    rng = np.random.RandomState(5)
    vals = rng.randint(0, 20_000, 4000).astype(np.float64)
    t = pa.table({"id": pa.array(range(len(vals)), pa.int64()),
                  "value": pa.array(vals)})
    lo = rng.randint(0, 20_000, 10_000).astype(np.float64)
    hi = lo + rng.randint(0, 40, 10_000)  # includes empty intervals
    iv = pa.table({"lo": pa.array(lo), "hi": pa.array(hi),
                   "band": pa.array(range(10_000), pa.int64())})
    for closed in ("left", "both"):
        got = range_join_broadcast(rd.from_arrow(t), iv,
                                   value_col="value",
                                   closed=closed).take_all()
        pairs = sorted((r["id"], r["band"]) for r in got)
        assert len(set(pairs)) == len(pairs)  # exactly-once
        exp = 0
        for i in range(0, 10_000):
            m = (vals >= lo[i]) & ((vals <= hi[i]) if closed == "both"
                                   else (vals < hi[i]))
            exp += int(m.sum())
        assert len(pairs) == exp


def test_range_join_broadcast_nan_and_null_never_match(ray_session):
    import ray.data as rd

    from raybeats.joins import range_join_broadcast
    t = pa.table({"id": pa.array([1, 2, 3], pa.int64()),
                  "value": pa.array([5.0, None, float("nan")],
                                    pa.float64())})
    # one-sided NaN bounds are the trap: searchsorted would place a
    # NaN hi past every finite value (matching everything >= lo)
    # where the comparison-mask semantics match nothing
    iv = pa.table({"lo": pa.array([0.0, None, 0.0, float("nan")],
                                  pa.float64()),
                   "hi": pa.array([10.0, None, None, 10.0],
                                  pa.float64()),
                   "band": pa.array([0, 1, 2, 3], pa.int64())})
    for closed in ("left", "both"):
        got = range_join_broadcast(rd.from_arrow(t), iv,
                                   value_col="value",
                                   closed=closed).take_all()
        assert [(r["id"], r["band"]) for r in got] == [(1, 0)], closed


# ----------------------------------------------- asof join null keys

def test_asof_join_null_by_keys(ray_session):
    """ADVICE r3: null keys must never match (SQL ASOF semantics) —
    previously int nulls collapsed as equal NaNs and string nulls
    raised TypeError in np.unique."""
    import ray.data as rd

    from raybeats.joins import asof_join
    for key_vals, rkey_vals in [
        (pa.array([1, None, 2, None], pa.int64()),
         pa.array([1, None, 2], pa.int64())),
        (pa.array(["a", None, "b", None], pa.string()),
         pa.array(["a", None, "b"], pa.string())),
    ]:
        lt = pa.table({"user_id": key_vals,
                       "ts": pa.array([100, 100, 100, 200],
                                      pa.timestamp("us")),
                       "lx": pa.array(["p", "q", "r", "s"])})
        rt = pa.table({"user_id": rkey_vals,
                       "ts": pa.array([50, 50, 150], pa.timestamp("us")),
                       "rv": pa.array([10, 20, 30], pa.int64())})
        out = asof_join(rd.from_arrow(lt), rd.from_arrow(rt), on="ts",
                        by="user_id", right_cols={"rv": "rv"},
                        how="left").take_all()
        # null-key left rows are KEPT (left join) with null payload;
        # only the valid key=row-1 backward match lands
        assert sorted((r["lx"], r["rv"]) for r in out) == \
            [("p", 10), ("q", None), ("r", None), ("s", None)]
        inner = asof_join(rd.from_arrow(lt), rd.from_arrow(rt), on="ts",
                          by="user_id", right_cols={"rv": "rv"},
                          how="inner").take_all()
        assert [(r["lx"], r["rv"]) for r in inner] == [("p", 10)]


# ------------------------------------------ centroid partial slicing

def test_centroid_sum_partial_on_sliced_batch():
    """ADVICE r3: a zero-copy sliced ListArray's .values ignores the
    slice window; the kernel must use flatten()."""
    from raybeats.textops.knn import centroid_sum_partial
    full = pa.table({
        "label": pa.array([0, 0, 1, 1], pa.int64()),
        "embedding": pa.array([[1.0, 2.0], [3.0, 4.0],
                               [5.0, 6.0], [7.0, 8.0]],
                              pa.list_(pa.float32()))})
    sliced = full.slice(1, 2)  # rows 1..2, list offsets keep window
    out = centroid_sum_partial(sliced, by="label")
    got = {(r["label"], r["idx"]): (r["s"], r["n"])
           for r in out.to_pylist()}
    assert got == {(0, 1): (3_000_000, 1), (0, 2): (4_000_000, 1),
                   (1, 1): (5_000_000, 1), (1, 2): (6_000_000, 1)}


# --------------------------------------------------- bloom build paths

class TestBloomRound4:
    def test_sparse_partial_bit_identical(self):
        """Sparse position-list partials merge to the SAME bitmap as
        dense ones, and kick in exactly when positions undercut the
        bitmap bytes."""
        from raybeats.joins import (_bloom_key_positions,
                                    _bloom_partial_table,
                                    _bloom_set_bits, bloom_params)
        n_bits, n_h = bloom_params(100_000, 0.01)
        t = pa.table({"k": pa.array(range(500), pa.int64())})
        part = _bloom_partial_table(t, on="k", n_bits=n_bits,
                                    n_hashes=n_h)
        assert part.column("__kind")[0].as_py() == 1  # sparse
        pos = np.frombuffer(part.column("__bloom")[0].as_py(),
                            np.uint32)
        ref = np.unique(_bloom_key_positions(t, "k", n_bits, n_h, None))
        assert (pos == ref.astype(np.uint32)).all()
        # dense branch: many keys vs a tiny bitmap
        n_bits2, n_h2 = bloom_params(64, 0.01)
        part2 = _bloom_partial_table(
            pa.table({"k": pa.array(range(64), pa.int64())}),
            on="k", n_bits=n_bits2, n_hashes=n_h2)
        assert part2.column("__kind")[0].as_py() == 0
        words = np.frombuffer(part2.column("__bloom")[0].as_py(),
                              np.uint64).copy()
        ref2 = np.zeros((n_bits2 + 63) // 64, np.uint64)
        _bloom_set_bits(ref2, np.unique(_bloom_key_positions(
            pa.table({"k": pa.array(range(64), pa.int64())}),
            "k", n_bits2, n_h2, None)))
        assert (words == ref2).all()

    def test_build_bloom_merged_matches_direct(self, ray_session):
        import ray.data as rd

        from raybeats.joins import (_bloom_key_positions, _bloom_set_bits,
                                    bloom_params, build_bloom)
        n_bits, n_h = bloom_params(50_000, 0.01)
        t = pa.table({"k": pa.array(range(3000), pa.int64())})
        # several blocks → several (sparse) partials through the fan-in
        ds = rd.from_arrow(t).repartition(6)
        got = build_bloom(ds, on="k", n_bits=n_bits, n_hashes=n_h)
        ref = np.zeros((n_bits + 63) // 64, np.uint64)
        _bloom_set_bits(ref, np.unique(
            _bloom_key_positions(t, "k", n_bits, n_h, None)))
        assert (got == ref).all()

    def test_fused_matches_unfused_and_exact(self, ray_session):
        import ray.data as rd

        from raybeats.joins import bloom_filter_join, key_filter_join
        left = rd.from_arrow(pa.table({
            "k": pa.array(range(3000), pa.int64()),
            "p": pa.array(["v"] * 3000)}))
        right = rd.from_arrow(pa.table({
            "k": pa.array(range(0, 3000, 7), pa.int64())}))
        exact = sorted(r["k"] for r in key_filter_join(
            left, right, on="k", keep="anti").take_all())
        for fused in (True, False):
            got = sorted(r["k"] for r in bloom_filter_join(
                left, right, on="k", keep="anti", right_count=429,
                left_count=3000, fused=fused).take_all())
            assert got == exact, f"fused={fused}"

    def test_reserved_bloom_hit_column_rejected(self, ray_session):
        import ray.data as rd

        from raybeats.joins import bloom_filter_join
        left = rd.from_arrow(pa.table({
            "k": pa.array([1], pa.int64()),
            "__bloom_hit": pa.array([True])}))
        right = rd.from_arrow(pa.table({"k": pa.array([1], pa.int64())}))
        with pytest.raises(ValueError, match="__bloom_hit"):
            bloom_filter_join(left, right, on="k", keep="semi",
                              right_count=1, left_count=1)


# ------------------------------------- pack_sequences adaptive buckets

def test_pack_sequences_group_bound_constant_as_input_grows(ray_session):
    """The verdict's done-criterion for weak item #3: the default
    bucket count scales with the id span, so the per-finalize-group
    row bound stays ~target_rows instead of corpus/64."""
    import ray.data as rd

    from raybeats.textops.curation import pack_sequences
    from raybeats.util import adaptive_buckets

    # sizing law: span/buckets bounded at any scale
    for span in (10_000, 10_000_000, 10_000_000_000):
        nb = adaptive_buckets(span)
        assert span / nb <= 100_000 or nb == 1 << 20

    # result invariance + correctness at two sizes with the default
    for n in (1000, 5000):
        rng = np.random.RandomState(n)
        tok = rng.randint(1, 50, n).astype(np.int64)
        t = pa.table({"doc_id": pa.array(range(n), pa.int64()),
                      "n_tok": pa.array(tok)})
        out = pack_sequences(rd.from_arrow(t), budget=512,
                             id_max=n - 1).take_all()
        got = {r["doc_id"]: r["pack_id"] for r in out}
        start = np.cumsum(tok) - tok
        exp = start // 512
        assert all(got[i] == exp[i] for i in range(n))


# -------------------------------------- streaming retry-replay dedupe

def test_streaming_push_replay_is_dropped(ray_session):
    """ADVICE r3 (medium): an at-least-once retried route task replays
    its push; the actor must drop the duplicate (same (micro-batch,
    bucket) id) or streaming state silently double-folds."""
    import ray
    import ray.data as rd

    from raybeats.streaming import SessionState, _drive_keyed_actors

    ts = pa.array([1_000_000 * i for i in range(8)], pa.timestamp("us"))
    t = pa.table({"user_id": pa.array([0, 4, 0, 4, 0, 4, 0, 4],
                                      pa.int64()),
                  "ts": ts,
                  "event_id": pa.array(range(8), pa.int64())})
    batches = [rd.from_arrow(t.slice(0, 4)), rd.from_arrow(t.slice(4, 4))]
    actors, _ = _drive_keyed_actors(batches, SessionState,
                                    (30 * 60 * 1_000_000,), n_buckets=4,
                                    n_actors=2)
    flush = [p for p in ray.get([a.flush.remote() for a in actors])
             if p.num_rows]
    before = sorted(pa.concat_tables(flush).to_pylist(),
                    key=lambda r: r["user_id"])
    assert [r["n_events"] for r in before] == [4, 4]

    # replay batch 0 / bucket 0's push (a retry would resend the same
    # group with the same id): must be a no-op
    dup = t.slice(0, 4).filter(pc.equal(t.slice(0, 4).column("user_id"),
                                        0))
    dup = dup.append_column("bucket", pa.array([0] * dup.num_rows,
                                               pa.int32()))
    ray.get(actors[0].process.remote(dup, (0, 0)))
    # ...while a NEW id does fold (dedupe must not drop everything)
    ray.get(actors[0].process.remote(dup, (99, 0)))
    flush2 = [p for p in ray.get([a.flush.remote() for a in actors])
              if p.num_rows]
    after = {r["user_id"]: r["n_events"]
             for r in pa.concat_tables(flush2).to_pylist()}
    assert after[0] == 4 + dup.num_rows  # one fold, not two


# --------------------------------- simhash golden-fixture value parity

@pytest.mark.parametrize("name", ["simhash", "simhash_neardup",
                                  "simhash_groups"])
def test_simhash_golden_fixture_parity(ray_session, name):
    """The three simhash queries are rows-only in the driver gate (no
    SQL mirror of the 64-bit simhash exists); their outputs are fully
    deterministic, so committed golden parquet fixtures give them the
    value assertion the oracle would (verdict r3 item #5)."""
    import os

    import pyarrow.parquet as pq

    from raybeats import queries as q

    sf = "/root/testdata/sf0.001"
    if not os.path.isdir(sf):
        pytest.skip("driver testdata not present")
    res = getattr(q, f"q_{name}")(sf)
    import ray.data
    if isinstance(res, ray.data.Dataset):
        got = pa.concat_tables(list(res.iter_batches(
            batch_format="pyarrow")), promote_options="default")
    else:
        got = res
    keys = [(c, "ascending") for c in sorted(got.column_names)]
    got = got.sort_by(keys).select(sorted(got.column_names))
    exp = pq.read_table(os.path.join(
        os.path.dirname(__file__), "fixtures",
        f"golden_{name}_sf0001.parquet"))
    exp = exp.sort_by(keys).select(sorted(exp.column_names))
    exp = exp.replace_schema_metadata(None)
    got = got.replace_schema_metadata(None)
    assert got.schema == exp.schema
    assert got.equals(exp)


# --------------------------------------------- new round-4 operators

class TestBigramCounts:
    def test_matches_naive(self):
        import re

        from raybeats.textops.analysis import bigram_counts_partial
        docs = ["Hello world, hello World!", "one", "", "a b a b a",
                "punct...only!!!", "Mixed CASE tokens 123 here",
                None]
        tbl = pa.table({"text": pa.array(docs, pa.string())})
        got = {r["bigram"]: r["n"]
               for r in bigram_counts_partial(tbl).to_pylist()}
        exp: dict[str, int] = {}
        for d in docs:
            toks = re.findall(r"[a-z0-9]+", (d or "").lower())
            for x, y in zip(toks, toks[1:]):
                exp[f"{x} {y}"] = exp.get(f"{x} {y}", 0) + 1
        assert got == exp

    def test_no_cross_document_bigrams(self):
        from raybeats.textops.analysis import bigram_counts_partial
        tbl = pa.table({"text": pa.array(["alpha beta", "beta gamma"])})
        got = {r["bigram"] for r in bigram_counts_partial(tbl).to_pylist()}
        assert got == {"alpha beta", "beta gamma"}  # no "beta beta"

    def test_empty_batch(self):
        from raybeats.textops.analysis import bigram_counts_partial
        out = bigram_counts_partial(
            pa.table({"text": pa.array([], pa.string())}))
        assert out.num_rows == 0


class TestGlobalDiscreteQuantile:
    def test_matches_rank_definition(self, ray_session):
        import ray.data as rd

        from raybeats.aggregates import global_discrete_quantile
        rng = np.random.RandomState(9)
        v = rng.randint(0, 200, 5000).astype(np.float64)
        v[::97] = np.nan  # ignored like SQL aggregates
        ds = rd.from_arrow(pa.table({"x": pa.array(v)})).repartition(7)
        clean = np.sort(v[~np.isnan(v)]).astype(np.int64)
        for q in (0.25, 0.5, 0.9, 1.0):
            thr, n = global_discrete_quantile(ds, value_col="x", q=q)
            assert n == len(clean)
            # smallest quantum whose cumulative count >= ceil(q*n)
            assert thr == int(clean[int(np.ceil(q * n)) - 1])

    def test_rejects_bad_q_and_all_null(self, ray_session):
        import ray.data as rd

        from raybeats.aggregates import global_discrete_quantile
        ds = rd.from_arrow(pa.table({"x": pa.array([1.0])}))
        with pytest.raises(ValueError, match="q must"):
            global_discrete_quantile(ds, value_col="x", q=0.0)
        nulls = rd.from_arrow(pa.table({"x": pa.array([None, None],
                                                      pa.float64())}))
        with pytest.raises(ValueError, match="no non-null"):
            global_discrete_quantile(nulls, value_col="x", q=0.5)


# ----------------------------------------- forward as-of with tolerance

def test_asof_forward_tolerance(ray_session):
    """Forward direction picks the nearest FOLLOWING right row (ties on
    ts admit it); a nearest match farther than the tolerance nulls out
    rather than falling back to a later one."""
    import ray.data as rd

    from raybeats.joins import asof_join
    lt = pa.table({"event_id": pa.array([1, 2, 3, 4], pa.int64()),
                   "ts": pa.array([100, 200, 300, 400],
                                  pa.timestamp("us")),
                   "user_id": pa.array([7, 7, 7, 9], pa.int64())})
    rt = pa.table({"ts": pa.array([150, 200, 1000], pa.timestamp("us")),
                   "user_id": pa.array([7, 7, 7], pa.int64()),
                   "v": pa.array([10, 20, 30], pa.int64())})
    out = asof_join(rd.from_arrow(lt), rd.from_arrow(rt), on="ts",
                    by="user_id", right_cols={"v": "v"},
                    direction="forward", tolerance_us=500,
                    how="left", n_buckets=2).take_all()
    got = {r["event_id"]: r["v"] for r in out}
    # 1 -> 150(v=10); 2 -> 200 ties admit (v=20); 3 -> nearest is 1000,
    # 700us away > 500 tolerance -> null (no fallback); 4 -> no user 9
    assert got == {1: 10, 2: 20, 3: None, 4: None}


# ------------------------------------------------- k-means assignment

def test_kmeans_assign_matches_brute_force_and_tiebreak():
    from raybeats.textops.knn import kmeans_assign
    rng = np.random.RandomState(4)
    e = rng.randn(50, 8)
    c = rng.randn(5, 8)
    t = pa.table({"vec_id": pa.array(range(50), pa.int64()),
                  "embedding": pa.array(e.astype(np.float32).tolist(),
                                        pa.list_(pa.float32()))})
    e64 = np.array(t.column("embedding").to_pylist(), np.float64)
    got = kmeans_assign(t, centroids=c).column("cid").to_pylist()
    exp = [int(np.argmin(((v - c) ** 2).sum(1))) for v in e64]
    assert got == exp
    # centroid_ids map the positional argmin to real cluster ids
    ids = np.array([10, 20, 30, 40, 50], np.int64)
    got_ids = kmeans_assign(t, centroids=c, centroid_ids=ids) \
        .column("cid").to_pylist()
    assert got_ids == [int(ids[g]) for g in exp]
    # exact tie (duplicate centroids) breaks to the FIRST row
    cdup = np.vstack([c[0], c[0], c])
    got2 = kmeans_assign(t, centroids=cdup).column("cid").to_pylist()
    assert all(g != 1 for g in got2)  # index 0 shadows its duplicate 1
    # dim mismatch and empty centroid matrix raise
    with pytest.raises(ValueError, match="dim"):
        kmeans_assign(t, centroids=np.zeros((3, 5)))
    with pytest.raises(ValueError, match="non-empty"):
        kmeans_assign(t, centroids=np.zeros((0, 8)))


# -------------------------------------------------- global CDF folding

def test_fold_quantum_cdf_and_percentile_rank(ray_session):
    import ray.data as rd

    from raybeats.aggregates import fold_quantum_cdf
    rng = np.random.RandomState(21)
    v = rng.uniform(-5, 5, 3000)
    v[::111] = np.nan
    ds = rd.from_arrow(pa.table({"value": pa.array(v)})).repartition(5)
    uniq, cum = fold_quantum_cdf(ds, value_col="value", scale=100)
    clean = np.floor(v[~np.isnan(v)] * 100).astype(np.int64)
    exp_uniq, exp_counts = np.unique(clean, return_counts=True)
    assert (uniq == exp_uniq).all()
    assert (cum == np.cumsum(exp_counts)).all()
    # per-value rank: count of values <= each quantum
    for q in (exp_uniq[0], exp_uniq[len(exp_uniq) // 2], exp_uniq[-1]):
        idx = int(np.searchsorted(uniq, q))
        assert cum[idx] == int((clean <= q).sum())
    # empty input
    u2, c2 = fold_quantum_cdf(
        rd.from_arrow(pa.table({"value": pa.array([], pa.float64())})),
        value_col="value")
    assert len(u2) == 0 and len(c2) == 0


def test_kmeans_assign_ragged_and_bad_ids_raise():
    from raybeats.textops.knn import kmeans_assign
    c = np.zeros((2, 8))
    # ragged rows whose total divides evenly would reshape silently
    ragged = pa.table({"embedding": pa.array([[0.0] * 7, [0.0] * 9],
                                             pa.list_(pa.float32()))})
    with pytest.raises(ValueError, match="centroid dim"):
        kmeans_assign(ragged, centroids=c)
    ok = pa.table({"embedding": pa.array([[0.0] * 8], pa.list_(
        pa.float32()))})
    with pytest.raises(ValueError, match="centroid_ids"):
        kmeans_assign(ok, centroids=c, centroid_ids=np.array([5]))
