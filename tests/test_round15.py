"""Round-15 operators: pagerank_iter, dense_rank_rows,
time_weighted_median, funnel_steps. Value assertions beyond the DuckDB
gate: multi-edge dedup and out-degree mass split, tie-inclusive dense
ranks, weighted-median vs weighted-mean divergence, and strictly-after
step chaining.
"""
import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from raybeats.queries import QUERIES


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


def _graph(tmp_path, edges):
    """orders/lineitem pair encoding (cust, supp) edges, one order per
    edge occurrence (duplicates included deliberately)."""
    pq.write_table(pa.table({
        "o_orderkey": pa.array(range(len(edges)), pa.int64()),
        "o_custkey": pa.array([c for c, _ in edges], pa.int64())}),
        tmp_path / "orders.parquet")
    pq.write_table(pa.table({
        "l_orderkey": pa.array(range(len(edges)), pa.int64()),
        "l_suppkey": pa.array([s for _, s in edges], pa.int64())}),
        tmp_path / "lineitem.parquet")


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


class TestPagerankIter:
    def test_mass_split_and_multi_edge_dedup(self, ray_session,
                                             tmp_path):
        # cust 1 -> A, B (deg 2, 500000 each); cust 2 -> A (deg 1);
        # the repeated (1, A) edge must not double A's mass
        _graph(tmp_path, [(1, 100), (1, 100), (1, 200), (2, 100)])
        got = _table(QUERIES["pagerank_iter"][0](str(tmp_path)))
        d = {r["l_suppkey"]: r["rank_ppm"] for r in got.to_pylist()}
        assert d == {100: 1_500_000, 200: 500_000}

    def test_floor_division_mass(self, ray_session, tmp_path):
        # deg 3 -> 333333 ppm each (floor, not rounding)
        _graph(tmp_path, [(1, 10), (1, 20), (1, 30)])
        got = _table(QUERIES["pagerank_iter"][0](str(tmp_path)))
        d = {r["l_suppkey"]: r["rank_ppm"] for r in got.to_pylist()}
        assert d == {10: 333_333, 20: 333_333, 30: 333_333}

    def test_oracle_parity_random(self, ray_session, tmp_path):
        rng = np.random.default_rng(101)
        edges = [(int(rng.integers(0, 40)), int(rng.integers(0, 15)))
                 for _ in range(800)]
        _graph(tmp_path, edges)
        got = _table(QUERIES["pagerank_iter"][0](str(tmp_path)))
        want = _oracle(tmp_path, QUERIES["pagerank_iter"][1],
                       tables=("orders", "lineitem"))
        assert _sorted_rows(got) == _sorted_rows(want)


class TestDenseRankRows:
    def test_ties_all_returned(self, ray_session, tmp_path):
        # cents 500 x2 (rank 1), 400 (rank 2), 300 x2 (rank 3), 200 cut
        vals = [5.0, 5.0, 4.0, 3.0, 3.0, 2.0]
        _events(tmp_path, [(i, i, 1, "a", v)
                           for i, v in enumerate(vals)])
        got = _table(QUERIES["dense_rank_rows"][0](str(tmp_path)))
        rows = sorted((r["event_id"], r["drnk"])
                      for r in got.to_pylist())
        assert rows == [(0, 1), (1, 1), (2, 2), (3, 3), (4, 3)]

    def test_fewer_than_three_classes(self, ray_session, tmp_path):
        _events(tmp_path, [(0, 0, 1, "a", 1.0), (1, 1, 1, "a", 1.0)])
        got = _table(QUERIES["dense_rank_rows"][0](str(tmp_path)))
        assert sorted(r["drnk"] for r in got.to_pylist()) == [1, 1]

    def test_oracle_parity_random(self, ray_session, tmp_path):
        rng = np.random.default_rng(102)
        rows = [(i, i, 1, str(rng.choice(["a", "b", "c"])),
                 float(rng.integers(0, 30) / 2)) for i in range(2000)]
        _events(tmp_path, rows)
        got = _table(QUERIES["dense_rank_rows"][0](str(tmp_path)))
        want = _oracle(tmp_path, QUERIES["dense_rank_rows"][1])
        assert _sorted_rows(got) == _sorted_rows(want)


class TestTimeWeightedMedian:
    def test_median_tracks_held_time_not_count(self, ray_session,
                                               tmp_path):
        s = 1_000_000
        # type a: v=1.00 held 10s, v=9.00 held 1s, then terminal row.
        # count-median of {100, 900} would be 100 either way — use
        # weights where the LONG-held low value wins though the spike
        # is later and larger: total 11s, threshold 6 -> median 100
        rows = [(0, 0, 1, "a", 1.0), (1, 10 * s, 1, "a", 9.0),
                (2, 11 * s, 1, "b", 0.0)]
        _events(tmp_path, rows)
        got = _table(QUERIES["time_weighted_median"][0](str(tmp_path)))
        d = {r["event_type"]: (r["median_cents"], r["total_s"])
             for r in got.to_pylist()}
        assert d == {"a": (100, 11)}

    def test_spike_dominates_when_held_longer(self, ray_session,
                                              tmp_path):
        s = 1_000_000
        rows = [(0, 0, 1, "a", 1.0), (1, 2 * s, 1, "a", 9.0),
                (2, 22 * s, 1, "b", 0.0)]
        _events(tmp_path, rows)
        got = _table(QUERIES["time_weighted_median"][0](str(tmp_path)))
        d = {r["event_type"]: r["median_cents"]
             for r in got.to_pylist()}
        assert d["a"] == 900  # 2s at 100 vs 20s at 900 -> median 900

    def test_oracle_parity_random(self, ray_session, tmp_path):
        rng = np.random.default_rng(103)
        rows = [(i, int(rng.integers(0, 86_400_000_000)),
                 int(rng.integers(0, 12)),
                 str(rng.choice(["a", "b"])),
                 float(rng.normal(30, 10))) for i in range(1500)]
        _events(tmp_path, rows)
        got = _table(QUERIES["time_weighted_median"][0](str(tmp_path)))
        want = _oracle(tmp_path, QUERIES["time_weighted_median"][1])
        assert _sorted_rows(got) == _sorted_rows(want)


class TestFunnelSteps:
    def test_strictly_after_chaining(self, ray_session, tmp_path):
        # click@5 precedes the first view -> ignored; purchase@20 ties
        # t2 exactly -> strictly-after excludes it; purchase@30 lands
        rows = [(0, 10, 1, "view", 1.0), (1, 5, 1, "click", 1.0),
                (2, 20, 1, "click", 1.0), (3, 20, 1, "purchase", 1.0),
                (4, 30, 1, "purchase", 1.0),
                (5, 7, 2, "view", 1.0),
                (6, 9, 3, "click", 1.0), (7, 11, 3, "purchase", 1.0)]
        _events(tmp_path, rows)
        got = _table(QUERIES["funnel_steps"][0](str(tmp_path)))
        us = lambda r: None if r is None else int(r.timestamp() * 1e6)
        d = {r["user_id"]: (us(r["t1"]), us(r["t2"]), us(r["t3"]))
             for r in got.to_pylist()}
        # user 3 never viewed -> absent entirely
        assert d == {1: (10, 20, 30), 2: (7, None, None)}

    def test_oracle_parity_random(self, ray_session, tmp_path):
        rng = np.random.default_rng(104)
        kinds = ["view", "click", "purchase", "error"]
        rows = [(i, int(rng.integers(0, 10**8)),
                 int(rng.integers(0, 40)),
                 str(rng.choice(kinds)), 1.0) for i in range(3000)]
        _events(tmp_path, rows)
        got = _table(QUERIES["funnel_steps"][0](str(tmp_path)))
        want = _oracle(tmp_path, QUERIES["funnel_steps"][1])
        assert _sorted_rows(got) == _sorted_rows(want)
