"""Round-20 operators: global_running_sum (distributed prefix sum —
SQL window with NO partition key) and the KMV distinct sketch with
intersection algebra. Value assertions beyond the gate: prefix-sum
correctness across slice boundaries with ties, KMV exactness below k,
merge-order invariance, and bounded error past saturation.
"""
import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from raybeats.queries import QUERIES
from raybeats.textops.sketches import KmvSketch, _fmix64


def _events(tmp_path, rows):
    t = pa.table({
        "event_id": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array([r[1] for r in rows], pa.int64())
        .cast(pa.timestamp("us")),
        "user_id": pa.array([r[2] for r in rows], pa.int64()),
        "event_type": pa.array([r[3] for r in rows], pa.string()),
        "value": pa.array([r[4] for r in rows], pa.float64()),
        "props": pa.array(["{}"] * len(rows), pa.string())})
    pq.write_table(t, tmp_path / "events.parquet")


def _table(res):
    if isinstance(res, pa.Table):
        return res
    return pa.concat_tables(res.iter_batches(batch_format="pyarrow"),
                            promote_options="default")


def _oracle(tmp_path, sql, tables=("events",)):
    con = duckdb.connect()
    for tb in tables:
        con.execute(f"CREATE VIEW {tb} AS SELECT * FROM "
                    f"'{tmp_path}/{tb}.parquet'")
    return con.execute(sql).arrow()


def _sorted_rows(tb):
    cols = sorted(tb.column_names)
    return sorted(
        map(tuple, zip(*[tb.column(c).to_pylist() for c in cols])),
        key=lambda r: tuple((v is None, v) for v in r))


class TestGlobalRunningSum:
    def test_hand_curve_with_ties(self, ray_session, tmp_path):
        # ties on ts broken by event_id; NaN cents contribute 0
        rows = [(2, 100, 1, "a", 1.0), (1, 100, 1, "a", 2.0),
                (3, 200, 1, "a", float("nan")), (4, 300, 1, "a", 0.5)]
        _events(tmp_path, rows)
        got = _table(QUERIES["global_running_sum"][0](str(tmp_path)))
        by_id = {r["event_id"]: (r["running_n"], r["running_cents"])
                 for r in got.to_pylist()}
        assert by_id == {1: (1, 200), 2: (2, 300), 3: (3, 300),
                         4: (4, 350)}

    def test_oracle_parity_random(self, ray_session, tmp_path):
        rng = np.random.default_rng(71)
        rows = [(i, int(rng.integers(0, 500_000)),
                 int(rng.integers(0, 20)), "a",
                 float(rng.uniform(-5, 50))) for i in range(5000)]
        _events(tmp_path, rows)
        got = _table(QUERIES["global_running_sum"][0](str(tmp_path)))
        want = _oracle(tmp_path, QUERIES["global_running_sum"][1])
        assert _sorted_rows(got) == _sorted_rows(want)
        # monotone invariant: sorted by running_n, cents never decrease
        # when all values are positive... values can be negative here,
        # so assert instead the final row equals the total
        tot = _oracle(tmp_path, """SELECT CAST(SUM(CASE WHEN
            isnan(value) THEN 0 ELSE CAST(FLOOR(value*100) AS BIGINT)
            END) AS BIGINT) AS s FROM events WHERE ts IS NOT NULL""")
        last = max(got.to_pylist(), key=lambda r: r["running_n"])
        assert last["running_cents"] == tot.column("s")[0].as_py()


class TestKmvSketch:
    def test_exact_below_k(self):
        sk = KmvSketch(64)
        vals = np.arange(50, dtype=np.int64)
        sk.add_hashed(_fmix64(vals.astype(np.uint64)))
        assert not sk.saturated and sk.estimate() == 50.0

    def test_merge_order_invariance(self):
        rng = np.random.default_rng(3)
        h = _fmix64(rng.integers(0, 1 << 62, 5000).astype(np.uint64))
        a = KmvSketch(128)
        a.add_hashed(h)
        b = KmvSketch(128)
        for chunk in np.array_split(h, 7)[::-1]:
            b.add_hashed(chunk)
        assert (a.values == b.values).all()

    def test_error_bound_saturated(self):
        k = 1024
        n = 200_000
        h = _fmix64(np.arange(n, dtype=np.uint64))
        sk = KmvSketch(k)
        for chunk in np.array_split(h, 13):
            sk.add_hashed(chunk)
        est = sk.estimate()
        assert abs(est - n) / n < 5 / np.sqrt(k - 2)

    def test_intersection_exact_and_estimated(self):
        # exact regime: both unsaturated
        a, b = KmvSketch(256), KmvSketch(256)
        a.add_hashed(_fmix64(np.arange(0, 100, dtype=np.uint64)))
        b.add_hashed(_fmix64(np.arange(60, 160, dtype=np.uint64)))
        assert a.intersect_estimate(b) == 40.0
        # saturated regime: 30k ∩ 30k of 50k universe -> 10k overlap
        k = 2048
        a, b = KmvSketch(k), KmvSketch(k)
        a.add_hashed(_fmix64(np.arange(0, 30_000, dtype=np.uint64)))
        b.add_hashed(_fmix64(np.arange(20_000, 50_000,
                                       dtype=np.uint64)))
        est = a.intersect_estimate(b)
        assert abs(est - 10_000) / 10_000 < 0.15

    def test_query_exact_flag(self, ray_session, tmp_path):
        rng = np.random.default_rng(81)
        types = ["view", "purchase", "cart"]
        rows = [(i, i, int(rng.integers(0, 300)),
                 types[int(rng.integers(0, 3))], 1.0)
                for i in range(4000)]
        _events(tmp_path, rows)
        got = _table(QUERIES["type_overlap_kmv"][0](str(tmp_path)))
        r = got.to_pylist()[0]
        assert r["exact"] is True
        want = _oracle(tmp_path, """
          SELECT CAST(COUNT(DISTINCT CASE WHEN event_type='view'
                   THEN user_id END) AS DOUBLE) AS a,
                 CAST(COUNT(DISTINCT CASE WHEN event_type='purchase'
                   THEN user_id END) AS DOUBLE) AS b
          FROM events""").to_pylist()[0]
        assert r["est_a"] == want["a"] and r["est_b"] == want["b"]
        inter = _oracle(tmp_path, """
          SELECT CAST(COUNT(*) AS DOUBLE) AS i FROM (
            SELECT user_id FROM events WHERE event_type='view'
            INTERSECT
            SELECT user_id FROM events WHERE event_type='purchase')""") \
            .column("i")[0].as_py()
        assert r["est_intersection"] == inter
