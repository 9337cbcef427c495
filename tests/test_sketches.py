"""HyperLogLog distinct-count sketch: accuracy + mergeability."""

import numpy as np
import pyarrow as pa

from raybeats.textops.sketches import HyperLogLog, approx_distinct


def test_hll_accuracy_across_scales():
    rng = np.random.default_rng(7)
    for true_n in (100, 5_000, 200_000, 2_000_000):
        hll = HyperLogLog(p=14)
        # hash-distinct inputs: random 64-bit values stand in for hashes
        vals = rng.integers(0, 1 << 63, size=true_n,
                            dtype=np.uint64) * np.uint64(2) + np.uint64(1)
        vals = np.unique(vals)
        hll.add_hashed(vals)
        est = hll.estimate()
        err = abs(est - len(vals)) / len(vals)
        # p=14 -> ~0.8% rse; allow 4 sigma
        assert err < 0.035, (true_n, est, err)


def test_hll_merge_equals_single_pass():
    rng = np.random.default_rng(3)
    vals = rng.integers(0, 1 << 63, size=50_000, dtype=np.uint64)
    one = HyperLogLog(p=12)
    one.add_hashed(vals)
    parts = [HyperLogLog(p=12) for _ in range(4)]
    for i, part in enumerate(parts):
        part.add_hashed(vals[i::4])
    merged = parts[0]
    for part in parts[1:]:
        merged.merge(part)
    assert np.array_equal(merged.registers, one.registers)


def test_hll_column_nulls_and_types():
    hll = HyperLogLog(p=12)
    hll.add_column(pa.array(["a", "b", None, "a"], pa.string()))
    hll2 = HyperLogLog(p=12)
    hll2.add_column(pa.array(["a", "b"], pa.string()))
    assert np.array_equal(hll.registers, hll2.registers)
    # int columns hash via their string form
    hll3 = HyperLogLog(p=12)
    hll3.add_column(pa.array([1, 2, 3], pa.int64()))
    assert 2 < hll3.estimate() < 4.5


def test_approx_distinct_distributed(ray_session):
    import pyarrow.parquet as pq
    import ray.data as rd

    sf = "/root/testdata/sf0.01"
    exact = len(set(pq.read_table(f"{sf}/events.parquet",
                                  columns=["user_id"])
                    .column("user_id").to_pylist()))
    ds = rd.read_parquet(f"{sf}/events.parquet", columns=["user_id"],
                         override_num_blocks=8)
    est = approx_distinct(ds, "user_id", p=14)
    assert abs(est - exact) / exact < 0.05, (est, exact)


class TestHeavyHitters:
    def test_exact_when_capacity_exceeds_cardinality(self, ray_session):
        import ray.data as rd

        from raybeats.textops.sketches import heavy_hitters
        vals = ["a"] * 50 + ["b"] * 30 + ["c"] * 20 + ["d"] * 5
        ds = rd.from_arrow(pa.table({"k": pa.array(vals)})).repartition(4)
        out = heavy_hitters(ds, "k", k=3, m=100)
        assert out.column("key").to_pylist() == ["a", "b", "c"]
        assert out.column("est").to_pylist() == [50, 30, 20]
        assert out.column("bound").to_pylist() == [0, 0, 0]

    def test_mg_bound_holds_under_overflow(self, ray_session):
        import ray.data as rd

        from raybeats.textops.sketches import heavy_hitters
        rng = np.random.RandomState(13)
        # zipf-ish: a few heavy keys over a long tail that overflows m
        tail = [f"t{i}" for i in rng.randint(0, 5000, 20_000)]
        heavy = ["h0"] * 3000 + ["h1"] * 2000 + ["h2"] * 1200
        vals = np.array(heavy + tail, object)
        rng.shuffle(vals)
        ds = rd.from_arrow(pa.table({"k": pa.array(vals.tolist())})) \
            .repartition(8)
        out = heavy_hitters(ds, "k", k=10, m=256)
        import collections
        true = collections.Counter(vals.tolist())
        bound = out.column("bound")[0].as_py()
        assert bound > 0  # the tail overflowed the summary
        for key, est in zip(out.column("key").to_pylist(),
                            out.column("est").to_pylist()):
            assert est <= true[key] <= est + bound, (key, est, bound)
        # every key whose true count exceeds the bound must be present
        got = set(out.column("key").to_pylist())
        for key in ("h0", "h1", "h2"):
            assert true[key] > bound and key in got

    def test_mg_summarize_reduction_rule(self):
        from raybeats.textops.sketches import mg_summarize
        keys = np.array(list("abcde"), object)
        counts = np.array([10, 8, 5, 3, 1], np.int64)
        k2, c2, off = mg_summarize(keys, counts, 3)
        assert off == 3  # the (m+1)-th largest
        assert list(k2) == ["a", "b", "c"] and list(c2) == [7, 5, 2]
        # no-op below capacity
        k3, c3, off3 = mg_summarize(keys, counts, 5)
        assert off3 == 0 and list(k3) == list(keys)


def test_grouped_approx_distinct_error_bound(ray_session):
    """Per-group HLL estimates within 5% of exact COUNT(DISTINCT) at
    p=12 (~1.6% rse) on the sf0.01 events table."""
    import duckdb
    import ray.data as rd

    from raybeats.textops.sketches import grouped_approx_distinct

    sf = "/root/testdata/sf0.01"
    out = grouped_approx_distinct(
        rd.read_parquet(f"{sf}/events.parquet",
                        columns=["event_type", "user_id"]),
        group_col="event_type", value_col="user_id", p=12)
    got = dict(zip(out.column("event_type").to_pylist(),
                   out.column("estimate").to_pylist()))
    con = duckdb.connect()
    exact = dict(con.execute(
        f"SELECT event_type, COUNT(DISTINCT user_id) FROM "
        f"'{sf}/events.parquet' GROUP BY 1").fetchall())
    assert set(got) == set(exact)
    for g, n in exact.items():
        assert abs(got[g] - n) / n < 0.05, (g, got[g], n)


def test_grouped_approx_distinct_partition_invariance(ray_session):
    """Register maxes commute: the fold is identical for any block
    split; null groups/values are skipped."""
    import pyarrow as pa
    import ray.data as rd

    from raybeats.textops.sketches import grouped_approx_distinct

    t = pa.table({"g": pa.array((["a"] * 50 + ["b"] * 30 + [None] * 5)),
                  "v": pa.array([str(i % 17) for i in range(80)]
                                + [None] * 5)})
    a = grouped_approx_distinct(rd.from_arrow(t).repartition(1),
                                group_col="g", value_col="v", p=12)
    b = grouped_approx_distinct(rd.from_arrow(t).repartition(7),
                                group_col="g", value_col="v", p=12)
    assert a.equals(b)
    assert a.column("g").to_pylist() == ["a", "b"]


class TestKllSketch:
    def test_weight_conservation_and_exact_small(self):
        import numpy as np
        from raybeats.textops.sketches import KllSketch

        s = KllSketch(k=16)
        s.add(np.arange(10, dtype=np.float64))
        # below capacity nothing compacted: quantiles are EXACT
        assert s.quantile(0.5) == 4.0   # ceil(0.5*10)=5th = value 4
        assert s.quantile(1.0) == 9.0
        vals, cum = s._weighted()
        assert int(cum[-1]) == s.n == 10

    def test_rank_error_bound_random_and_sorted(self):
        import numpy as np
        from raybeats.textops.sketches import KllSketch

        n, k = 100_000, 256
        for name, data in (
                ("random", np.random.default_rng(7).normal(0, 1, n)),
                ("sorted", np.arange(n, dtype=np.float64)),
                ("reversed", np.arange(n, dtype=np.float64)[::-1])):
            s = KllSketch(k)
            for chunk in np.array_split(data, 37):
                s.add(chunk)
            vals, cum = s._weighted()
            assert int(cum[-1]) == n, name
            srt = np.sort(data)
            for q in (0.01, 0.25, 0.5, 0.75, 0.99):
                est = s.quantile(q)
                true_rank = np.searchsorted(srt, est, side="right")
                err = abs(true_rank - q * n)
                # H = log2(n/k) ~ 8.6 levels -> bound ~ H*n/k ~ 3400;
                # assert inside it with no slack stolen
                assert err <= np.log2(n / k) * n / k, (name, q, err)

    def test_merge_error_bound(self):
        import numpy as np
        from raybeats.textops.sketches import KllSketch

        n, k = 60_000, 256
        data = np.random.default_rng(11).exponential(3.0, n)
        parts = np.array_split(data, 8)
        merged = KllSketch(k)
        for p in parts:
            s = KllSketch(k)
            s.add(p)
            merged.merge(KllSketch.from_table(s.to_table(), k))
        vals, cum = merged._weighted()
        assert int(cum[-1]) == n
        srt = np.sort(data)
        for q in (0.1, 0.5, 0.9):
            est = merged.quantile(q)
            true_rank = np.searchsorted(srt, est, side="right")
            assert abs(true_rank - q * n) <= np.log2(n / k) * n / k

    def test_deterministic(self):
        import numpy as np
        from raybeats.textops.sketches import KllSketch

        data = np.random.default_rng(13).normal(0, 5, 50_000)
        a, b = KllSketch(64), KllSketch(64)
        for chunk in np.array_split(data, 11):
            a.add(chunk)
            b.add(chunk)
        assert [a.quantile(q) for q in (0.25, 0.5, 0.75)] == \
               [b.quantile(q) for q in (0.25, 0.5, 0.75)]

    def test_query_matches_exact_within_bound(self, ray_session):
        import numpy as np
        import pyarrow.parquet as pq
        from raybeats.queries import QUERIES

        sf = "/root/testdata/sf0.01"
        got = QUERIES["value_quantile_sketch"][0](sf)
        v = pq.read_table(f"{sf}/events.parquet", columns=["value"]) \
            .column("value").to_numpy(zero_copy_only=False)
        v = np.sort(v[~np.isnan(v)])
        n = len(v)
        assert got.column("n")[0].as_py() == n
        bound = np.log2(max(n / 256, 2)) * n / 256
        for q, col in ((0.5, "p50_est"), (0.95, "p95_est"),
                       (0.99, "p99_est")):
            est = got.column(col)[0].as_py()
            true_rank = np.searchsorted(v, est, side="right")
            assert abs(true_rank - q * n) <= bound, (q, est)

    def test_grouped_query_within_bound(self, ray_session):
        import numpy as np
        import pyarrow.parquet as pq
        from raybeats.queries import QUERIES

        sf = "/root/testdata/sf0.01"
        got = QUERIES["type_quantile_sketch"][0](sf)
        t = pq.read_table(f"{sf}/events.parquet",
                          columns=["event_type", "value"])
        types = np.asarray(t.column("event_type").to_pylist(),
                           dtype=object)
        v = t.column("value").to_numpy(zero_copy_only=False)
        for row in got.to_pylist():
            g = np.sort(v[(types == row["event_type"]) & ~np.isnan(v)])
            n = len(g)
            assert row["n"] == n
            bound = np.log2(max(n / 256, 2)) * n / 256
            for q, col in ((0.5, "p50_est"), (0.95, "p95_est"),
                           (0.99, "p99_est")):
                true_rank = np.searchsorted(g, row[col], side="right")
                assert abs(true_rank - q * n) <= bound, \
                    (row["event_type"], q)


class TestCountMinSketch:
    def test_never_undercounts_and_bound(self):
        import numpy as np
        from raybeats.textops.sketches import CountMinSketch
        from raybeats.util import fnv1a_u64
        import pyarrow as pa
        rng = np.random.default_rng(81)
        # zipf-ish key stream with 5000 distinct keys over w=512 —
        # collisions guaranteed, so the >= side is actually exercised
        keys = np.array([f"k{int(v)}" for v in
                         rng.zipf(1.3, size=20000) % 5000])
        s = CountMinSketch(w=512, d=4)
        s.add_hashes(fnv1a_u64(pa.array(keys.tolist(), pa.string())))
        uniq, true = np.unique(keys, return_counts=True)
        est = s.query_hashes(fnv1a_u64(pa.array(uniq.tolist(),
                                                pa.string())))
        assert (est >= true).all()          # hard CMS guarantee
        eps_n = np.e / 512 * s.n            # w.h.p. bound, zero slack
        assert (est <= true + eps_n).all()

    def test_merge_equals_single_pass(self):
        import numpy as np
        from raybeats.textops.sketches import CountMinSketch
        from raybeats.util import fnv1a_u64
        import pyarrow as pa
        rng = np.random.default_rng(82)
        keys = [f"t{int(v)}" for v in rng.integers(0, 300, size=3000)]
        h = fnv1a_u64(pa.array(keys, pa.string()))
        one = CountMinSketch(w=256, d=3).add_hashes(h)
        a = CountMinSketch(w=256, d=3).add_hashes(h[:1000])
        b = CountMinSketch(w=256, d=3).add_hashes(h[1000:2500])
        c = CountMinSketch(w=256, d=3).add_hashes(h[2500:])
        merged = a.merge(b).merge(c)
        assert (merged.counts == one.counts).all()
        assert merged.n == one.n

    def test_table_roundtrip_under_rebatching(self):
        import numpy as np
        import pyarrow as pa
        from raybeats.textops.sketches import CountMinSketch
        from raybeats.util import fnv1a_u64
        h1 = fnv1a_u64(pa.array(["a", "b", "a"], pa.string()))
        h2 = fnv1a_u64(pa.array(["b", "c"], pa.string()))
        s1 = CountMinSketch(w=64, d=2).add_hashes(h1)
        s2 = CountMinSketch(w=64, d=2).add_hashes(h2)
        # Ray may concatenate the two sketch tables into ONE batch;
        # the rebuild must still equal the true merge
        mixed = pa.concat_tables([s1.to_table(), s2.to_table()])
        back = CountMinSketch.from_table(mixed, 64, 2)
        want = CountMinSketch(w=64, d=2).add_hashes(h1).add_hashes(h2)
        assert (back.counts == want.counts).all()
        assert back.n == want.n == 5

    def test_query_absent_key_small(self):
        import numpy as np
        import pyarrow as pa
        from raybeats.textops.sketches import CountMinSketch
        from raybeats.util import fnv1a_u64
        s = CountMinSketch(w=2048, d=4)
        s.add_hashes(fnv1a_u64(pa.array(["x"] * 50, pa.string())))
        est = s.query_hashes(fnv1a_u64(pa.array(["absent"],
                                                pa.string())))
        # with 1 distinct key in 2048*4 counters, no collision
        assert est[0] == 0

    def test_distributed_estimates_match_exact(self, ray_session):
        import collections
        import re
        import numpy as np
        import pyarrow.parquet as pq
        from raybeats.queries import QUERIES
        got = QUERIES["token_freq_sketch"][0]("/root/testdata/sf0.001")
        text = pq.read_table("/root/testdata/sf0.001/documents.parquet",
                             columns=["text"]).column("text").to_pylist()
        c = collections.Counter()
        for s in text:
            c.update(re.findall(r"[a-z0-9]+", s.lower()))
        n = got.column("n")[0].as_py()
        assert n == sum(c.values())
        eps_n = np.e / 2048 * n
        for r in got.to_pylist():
            true = c.get(r["key"], 0)
            assert true <= r["est"] <= true + eps_n
