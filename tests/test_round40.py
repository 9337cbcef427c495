"""Round-40 operators: session_duration_band (session-duration
quantiles through the shared CDF rule) and revenue_deciles (NTILE
revenue concentration). Value assertions beyond the gate: single-event
sessions have zero duration, band ordering, decile monotonicity, and
revenue conservation.
"""
import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from raybeats.queries import QUERIES

MIN30 = 30 * 60 * 1_000_000


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


def _orders(tmp_path, prices):
    t = pa.table({
        "o_orderkey": pa.array(range(len(prices)), pa.int64()),
        "o_custkey": pa.array([1] * len(prices), pa.int64()),
        "o_orderstatus": pa.array(["O"] * len(prices), pa.string()),
        "o_totalprice": pa.array(prices, pa.float64()),
        "o_orderdate": pa.array([0] * len(prices), pa.int64())
        .cast(pa.timestamp("us")),
        "o_orderpriority": pa.array(["1"] * len(prices), pa.string())})
    pq.write_table(t, tmp_path / "orders.parquet")


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


class TestSessionDurationBand:
    def test_hand_durations(self, ray_session, tmp_path):
        # u1 session of 120s; u2 single-event session (0s); u3 600s
        rows = [(0, 0, 1, "a", 1.0), (1, 120_000_000, 1, "a", 1.0),
                (2, 0, 2, "a", 1.0),
                (3, 0, 3, "a", 1.0), (4, 600_000_000, 3, "a", 1.0)]
        _events(tmp_path, rows)
        got = _table(QUERIES["session_duration_band"][0](
            str(tmp_path))).to_pylist()[0]
        # durations {0, 120, 600}: p10=0, p50=120, p90=600
        assert got == {"p10_secs": 0, "p50_secs": 120,
                       "p90_secs": 600}

    def test_oracle_parity_random(self, ray_session, tmp_path):
        rng = np.random.default_rng(271)
        rows = [(i, int(rng.integers(0, 80)) * 10 * 60 * 1_000_000
                 + int(rng.integers(0, 1000)),
                 int(rng.integers(0, 20)), "a", 1.0)
                for i in range(3000)]
        _events(tmp_path, rows)
        got = _table(QUERIES["session_duration_band"][0](
            str(tmp_path)))
        want = _oracle(tmp_path, QUERIES["session_duration_band"][1])
        assert _sorted_rows(got) == _sorted_rows(want)
        r = got.to_pylist()[0]
        assert r["p10_secs"] <= r["p50_secs"] <= r["p90_secs"]


class TestRevenueDeciles:
    def test_ntile_parity_and_monotone(self, ray_session, tmp_path):
        rng = np.random.default_rng(277)
        # duplicate-heavy prices force tie groups across boundaries
        prices = [float(x) for x in
                  rng.choice([1.0, 1.0, 2.5, 2.5, 9.99, 50.0], 237)]
        _orders(tmp_path, prices)
        got = _table(QUERIES["revenue_deciles"][0](str(tmp_path)))
        want = _oracle(tmp_path, QUERIES["revenue_deciles"][1],
                       tables=("orders",))
        assert _sorted_rows(got) == _sorted_rows(want)
        rows = sorted(got.to_pylist(), key=lambda r: r["decile"])
        rev = [r["revenue_cents"] for r in rows]
        assert rev == sorted(rev, reverse=True)
        assert sum(r["n_orders"] for r in rows) == 237
        total = int(np.floor(np.array(prices) * 100).sum())
        assert sum(rev) == total
