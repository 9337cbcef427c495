"""Round-28 operators: monthly_orders_yoy (gap-robust YoY series),
order_to_ship_days (two-fact-table join histogram), rfm_customers
(recency/frequency/monetary from footer max-date). Value assertions
beyond the gate: YoY across a MISSING month (the LAG(12) trap), join
fan-out counts, and recency-zero for the newest customer.
"""
import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from raybeats.queries import QUERIES

DAY = 86_400_000_000


def _orders(tmp_path, rows):
    t = pa.table({
        "o_orderkey": pa.array([r[0] for r in rows], pa.int64()),
        "o_custkey": pa.array([r[1] for r in rows], pa.int64()),
        "o_orderstatus": pa.array(["O"] * len(rows), pa.string()),
        "o_totalprice": pa.array([r[3] for r in rows], pa.float64()),
        "o_orderdate": pa.array([r[2] for r in rows], pa.int64())
        .cast(pa.timestamp("us")),
        "o_orderpriority": pa.array(["1-URGENT"] * len(rows),
                                    pa.string())})
    pq.write_table(t, tmp_path / "orders.parquet")


def _lineitem(tmp_path, rows):
    t = pa.table({
        "l_orderkey": pa.array([r[0] for r in rows], pa.int64()),
        "l_partkey": pa.array([0] * len(rows), pa.int64()),
        "l_suppkey": pa.array([0] * len(rows), pa.int64()),
        "l_linenumber": pa.array(range(len(rows)), pa.int64()),
        "l_quantity": pa.array([1.0] * len(rows), pa.float64()),
        "l_extendedprice": pa.array([1.0] * len(rows), pa.float64()),
        "l_discount": pa.array([0.0] * len(rows), pa.float64()),
        "l_tax": pa.array([0.0] * len(rows), pa.float64()),
        "l_returnflag": pa.array(["N"] * len(rows), pa.string()),
        "l_linestatus": pa.array(["O"] * len(rows), pa.string()),
        "l_shipdate": pa.array([r[1] for r in rows], pa.int64())
        .cast(pa.timestamp("us"))})
    pq.write_table(t, tmp_path / "lineitem.parquet")


def _table(res):
    if isinstance(res, pa.Table):
        return res
    return pa.concat_tables(res.iter_batches(batch_format="pyarrow"),
                            promote_options="default")


def _oracle(tmp_path, sql, tables=("orders",)):
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


def _month_us(y, m):
    import datetime
    return int(datetime.datetime(y, m, 1).timestamp() * 1_000_000)


class TestMonthlyOrdersYoy:
    def test_gap_robust(self, ray_session, tmp_path):
        # 1995-03 has orders, 1996-03 MISSING, 1997-03 has orders:
        # 1997-03's prior-year month is absent -> NULL delta, not a
        # misaligned LAG(12) value
        rows = [(0, 1, _month_us(1995, 3), 10.0),
                (1, 1, _month_us(1995, 3) + DAY, 10.0),
                (2, 1, _month_us(1996, 4), 10.0),
                (3, 1, _month_us(1997, 3), 10.0)]
        _orders(tmp_path, rows)
        got = _table(QUERIES["monthly_orders_yoy"][0](str(tmp_path)))
        want = _oracle(tmp_path, QUERIES["monthly_orders_yoy"][1])
        assert _sorted_rows(got) == _sorted_rows(want)
        d = {str(r["mon"])[:7]: r["yoy_delta"] for r in got.to_pylist()}
        assert d["1995-03"] is None and d["1997-03"] is None
        assert d["1996-04"] is None

    def test_oracle_parity_random(self, ray_session, tmp_path):
        rng = np.random.default_rng(179)
        rows = [(i, 1, _month_us(1995 + int(rng.integers(0, 5)),
                                 int(rng.integers(1, 13)))
                 + int(rng.integers(0, 27)) * DAY, 10.0)
                for i in range(2000)]
        _orders(tmp_path, rows)
        got = _table(QUERIES["monthly_orders_yoy"][0](str(tmp_path)))
        want = _oracle(tmp_path, QUERIES["monthly_orders_yoy"][1])
        assert _sorted_rows(got) == _sorted_rows(want)


class TestOrderToShipDays:
    def test_fanout_histogram(self, ray_session, tmp_path):
        base = _month_us(1995, 1)
        _orders(tmp_path, [(1, 1, base, 10.0), (2, 1, base, 10.0)])
        # order 1: two lineitems at +3d and +3d; order 2: one at +10d
        _lineitem(tmp_path, [(1, base + 3 * DAY), (1, base + 3 * DAY),
                             (2, base + 10 * DAY)])
        got = _table(QUERIES["order_to_ship_days"][0](str(tmp_path)))
        hist = {r["days"]: r["n"] for r in got.to_pylist()}
        assert hist == {3: 2, 10: 1}

    def test_oracle_parity_random(self, ray_session, tmp_path):
        rng = np.random.default_rng(181)
        base = _month_us(1995, 1)
        orders = [(i, 1, base + int(rng.integers(0, 300)) * DAY, 10.0)
                  for i in range(300)]
        _orders(tmp_path, orders)
        od = {o[0]: o[2] for o in orders}
        lis = [(int(rng.integers(0, 300)), 0) for _ in range(1500)]
        lis = [(k, od[k] + int(rng.integers(1, 90)) * DAY)
               for k, _ in lis]
        _lineitem(tmp_path, lis)
        got = _table(QUERIES["order_to_ship_days"][0](str(tmp_path)))
        want = _oracle(tmp_path, QUERIES["order_to_ship_days"][1],
                       tables=("orders", "lineitem"))
        assert _sorted_rows(got) == _sorted_rows(want)


class TestRfmCustomers:
    def test_recency_zero_newest(self, ray_session, tmp_path):
        base = _month_us(1995, 1)
        rows = [(0, 1, base, 1.23), (1, 1, base + 5 * DAY, 2.00),
                (2, 2, base + 9 * DAY, 10.555)]
        _orders(tmp_path, rows)
        got = _table(QUERIES["rfm_customers"][0](str(tmp_path)))
        r = {x["o_custkey"]: x for x in got.to_pylist()}
        assert r[2]["recency_days"] == 0
        assert r[1] == {"o_custkey": 1, "recency_days": 4,
                        "frequency": 2, "monetary_cents": 323}
        # floor(10.555*100) = 1055
        assert r[2]["monetary_cents"] == 1055

    def test_oracle_parity_random(self, ray_session, tmp_path):
        rng = np.random.default_rng(191)
        base = _month_us(1996, 1)
        rows = [(i, int(rng.integers(0, 80)),
                 base + int(rng.integers(0, 900)) * DAY,
                 float(rng.uniform(1, 900))) for i in range(3000)]
        _orders(tmp_path, rows)
        got = _table(QUERIES["rfm_customers"][0](str(tmp_path)))
        want = _oracle(tmp_path, QUERIES["rfm_customers"][1])
        assert _sorted_rows(got) == _sorted_rows(want)
