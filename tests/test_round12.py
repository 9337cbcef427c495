"""Round-12 operators: centroid_dists, moving_avg3,
dup_rate_per_source, max_concurrency, daily_type_share. Value
assertions beyond the DuckDB gate: hand-computed centroid pairs,
ROWS-frame edges, duplicate-class marking across sources, sweep-line
tie order (close before open) and cross-bucket offsets, permille
floor division."""
import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from raybeats.queries import QUERIES

_MIN5 = 300_000_000
_DAY = 86_400_000_000


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


def _documents(tmp_path, rows):
    t = pa.table({
        "doc_id": pa.array([r[0] for r in rows], pa.int64()),
        "text": pa.array([r[1] for r in rows], pa.string()),
        "lang": pa.array(["en"] * len(rows), pa.string()),
        "source": pa.array([r[2] for r in rows], pa.string()),
        "n_chars": pa.array([len(r[1]) for r in rows], pa.int64())})
    pq.write_table(t, tmp_path / "documents.parquet")


def _embeddings(tmp_path, vecs, labels):
    t = pa.table({
        "vec_id": pa.array(range(len(vecs)), pa.int64()),
        "embedding": pa.array(vecs, pa.list_(pa.float32())),
        "label": pa.array(labels, pa.int32())})
    pq.write_table(t, tmp_path / "embeddings.parquet")


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


class TestCentroidDists:
    def test_hand_computed(self, ray_session, tmp_path):
        # centroids: label 0 -> (1e6, 0), label 1 -> (0, 1e6),
        # label 2 -> (0, 0): d(0,1) = 2e12, d(0,2) = d(1,2) = 1e12
        _embeddings(tmp_path,
                    [[1.0, 0.0], [0.0, 1.0], [0.0, 0.0]], [0, 1, 2])
        got = _table(QUERIES["centroid_dists"][0](str(tmp_path)))
        rows = sorted((r["label_a"], r["label_b"], r["dist_sq"])
                      for r in got.to_pylist())
        assert rows == [(0, 1, 2 * 10**12), (0, 2, 10**12),
                        (1, 2, 10**12)]


class TestMovingAvg3:
    def test_frame_edges(self, ray_session, tmp_path):
        # u1 cents in order: 100, 200, 400 -> frames [100+200],
        # [100+200+400], [200+400]; u2 single row -> frame of 1
        rows = [(0, 10, 1, "a", 1.0), (1, 20, 1, "a", 2.0),
                (2, 30, 1, "a", 4.0), (3, 40, 2, "a", 9.0)]
        _events(tmp_path, rows)
        got = _table(QUERIES["moving_avg3"][0](str(tmp_path)))
        by_eid = {r["event_id"]: (r["w_sum_cents"], r["w_n"])
                  for r in got.to_pylist()}
        assert by_eid == {0: (300, 2), 1: (700, 3), 2: (600, 2),
                          3: (900, 1)}

    def test_oracle_parity_random(self, ray_session, tmp_path):
        rng = np.random.default_rng(59)
        rows = [(i, int(rng.integers(0, 10_000)),
                 int(rng.integers(0, 15)), "a",
                 float(rng.normal(0, 8))) for i in range(600)]
        _events(tmp_path, rows)
        got = _table(QUERIES["moving_avg3"][0](str(tmp_path)))
        want = _oracle(tmp_path, QUERIES["moving_avg3"][1])
        assert _sorted_rows(got) == _sorted_rows(want)


class TestDupRatePerSource:
    def test_cross_source_class(self, ray_session, tmp_path):
        # "same" appears in A twice and B once -> all three are dup
        # members; "only" rows are unique
        rows = [(0, "same", "A"), (1, "same", "A"), (2, "same", "B"),
                (3, "only a", "A"), (4, "only b", "B")]
        _documents(tmp_path, rows)
        got = _table(QUERIES["dup_rate_per_source"][0](str(tmp_path)))
        rows_out = sorted((r["source"], r["n_docs"], r["n_dup"])
                          for r in got.to_pylist())
        assert rows_out == [("A", 3, 2), ("B", 2, 1)]


class TestMaxConcurrency:
    def test_close_before_open_tie(self, ray_session, tmp_path):
        # e0 opens at 0 and closes at exactly 5min, where e2 opens:
        # the close fires FIRST, so the peak stays 2 (e1+e2 never
        # overlap e0's close instant)
        rows = [(0, 0, 1, "a", 0.0),
                (1, _MIN5, 1, "a", 0.0),
                (2, _MIN5, 2, "a", 0.0)]
        _events(tmp_path, rows)
        got = _table(QUERIES["max_concurrency"][0](str(tmp_path)))
        r = got.to_pylist()[0]
        assert r["peak"] == 2
        assert int(r["at_ts"].timestamp() * 1e6) == _MIN5

    def test_cross_bucket_offsets(self, ray_session, tmp_path):
        # 3 events open late on day 0 and stay open into day 1 where a
        # 4th joins: the peak (4) is only correct if day 1's local
        # prefix rides on day 0's carried delta
        base = _DAY - 100
        rows = [(i, base + i, 1, "a", 0.0) for i in range(3)]
        rows.append((9, _DAY + 50, 1, "a", 0.0))
        _events(tmp_path, rows)
        got = _table(QUERIES["max_concurrency"][0](str(tmp_path)))
        r = got.to_pylist()[0]
        assert r["peak"] == 4
        assert int(r["at_ts"].timestamp() * 1e6) == _DAY + 50

    def test_oracle_parity_random(self, ray_session, tmp_path):
        rng = np.random.default_rng(61)
        rows = [(i, int(rng.integers(0, 3 * _DAY)), 1, "a", 0.0)
                for i in range(500)]
        _events(tmp_path, rows)
        got = _table(QUERIES["max_concurrency"][0](str(tmp_path)))
        want = _oracle(tmp_path, QUERIES["max_concurrency"][1])
        assert _sorted_rows(got) == _sorted_rows(want)


class TestDailyTypeShare:
    def test_permille_floor(self, ray_session, tmp_path):
        # day 0: a x2, b x1 -> shares 666 and 333 (floor division)
        rows = [(0, 10, 1, "a", 0.0), (1, 20, 1, "a", 0.0),
                (2, 30, 1, "b", 0.0)]
        _events(tmp_path, rows)
        got = _table(QUERIES["daily_type_share"][0](str(tmp_path)))
        rows_out = sorted((r["event_type"], r["n"], r["share_permille"])
                          for r in got.to_pylist())
        assert rows_out == [("a", 2, 666), ("b", 1, 333)]


class TestGroupingSetsMix:
    def test_only_requested_sets(self, ray_session, tmp_path):
        # two lines: (A, X, 10.0 disc 0), (B, X, 20.0 disc 0.5) ->
        # by-flag rows (lvl 1, status NULL) and by-status rows (lvl 2,
        # flag NULL); NO full-tuple or grand-total level exists
        pq.write_table(pa.table({
            "l_returnflag": pa.array(["A", "B"], pa.string()),
            "l_linestatus": pa.array(["X", "X"], pa.string()),
            "l_extendedprice": pa.array([10.0, 20.0], pa.float64()),
            "l_discount": pa.array([0.0, 0.5], pa.float64())}),
            tmp_path / "lineitem.parquet")
        got = _table(QUERIES["grouping_sets_mix"][0](str(tmp_path)))
        rows = sorted((r["lvl"], r["l_returnflag"], r["l_linestatus"],
                       r["revenue_cents"], r["n"])
                      for r in got.to_pylist())
        assert rows == [(1, "A", None, 1000, 1),
                        (1, "B", None, 1000, 1),
                        (2, None, "X", 2000, 2)]


class TestOrdersNoLines:
    def test_anti_fact_fact(self, ray_session, tmp_path):
        pq.write_table(pa.table({
            "o_orderkey": pa.array([1, 2, 3], pa.int64()),
            "o_orderstatus": pa.array(["F", "O", "F"], pa.string()),
            "o_totalprice": pa.array([10.0, 20.0, 30.0], pa.float64())}),
            tmp_path / "orders.parquet")
        pq.write_table(pa.table({
            "l_orderkey": pa.array([1, 1, 3], pa.int64())}),
            tmp_path / "lineitem.parquet")
        got = _table(QUERIES["orders_no_lines"][0](str(tmp_path)))
        assert got.to_pylist() == [
            {"o_orderkey": 2, "o_orderstatus": "O", "o_totalprice": 20.0}]


class TestErrorReport:
    def test_mixed_aggregates(self, ray_session, tmp_path):
        # day 0 errors: u1 x2, u2 x1 (3 errors, 2 users, cents
        # {100, 300, 200} -> max 300, p95 = ceil(.95*3)=3rd = 300);
        # non-error rows never count; day 1: single error
        rows = [(0, 10, 1, "error", 1.0), (1, 20, 1, "error", 3.0),
                (2, 30, 2, "error", 2.0), (3, 40, 3, "click", 9.0),
                (4, _DAY + 5, 7, "error", 5.0)]
        _events(tmp_path, rows)
        got = _table(QUERIES["error_report"][0](str(tmp_path)))
        rows_out = sorted(
            (int(r["day"].timestamp() * 1e6) // _DAY, r["n_errors"],
             r["n_users"], r["max_cents"], r["p95_cents"])
            for r in got.to_pylist())
        assert rows_out == [(0, 3, 2, 300, 300), (1, 1, 1, 500, 500)]

    def test_oracle_parity_random(self, ray_session, tmp_path):
        rng = np.random.default_rng(67)
        rows = [(i, int(rng.integers(0, 4 * _DAY)),
                 int(rng.integers(0, 30)),
                 rng.choice(["error", "click"]),
                 float(rng.normal(20, 9))) for i in range(1200)]
        _events(tmp_path, rows)
        got = _table(QUERIES["error_report"][0](str(tmp_path)))
        want = _oracle(tmp_path, QUERIES["error_report"][1])
        assert _sorted_rows(got) == _sorted_rows(want)
