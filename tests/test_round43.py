"""Round-43 operators: type_gini (exact integer Simpson diversity)
and overlapping_orders (per-customer interval self-overlap pairs).
Value assertions beyond the gate: hand-computed diversity integers,
null-key drops, window boundary in/out, same-day multi-pairs.
"""
import datetime

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from raybeats.queries import QUERIES


def _day_us(d):
    return int((datetime.datetime(2024, 1, 1,
                                  tzinfo=datetime.timezone.utc)
                + datetime.timedelta(days=d)).timestamp() * 1_000_000)


def _events(tmp_path, rows):
    t = pa.table({
        "event_id": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array([_day_us(0)] * len(rows), pa.int64())
        .cast(pa.timestamp("us")),
        "user_id": pa.array([r[1] for r in rows], pa.int64()),
        "event_type": pa.array([r[2] for r in rows], pa.string()),
        "value": pa.array([1.0] * len(rows), pa.float64()),
        "props": pa.array(["{}"] * len(rows), pa.string())})
    pq.write_table(t, tmp_path / "events.parquet")


def _orders(tmp_path, rows):
    """rows: (orderkey, custkey, day) with day in days-from-2024-01-01
    (None day → null orderdate)."""
    t = pa.table({
        "o_orderkey": pa.array([r[0] for r in rows], pa.int64()),
        "o_custkey": pa.array([r[1] for r in rows], pa.int64()),
        "o_orderstatus": pa.array(["O"] * len(rows), pa.string()),
        "o_totalprice": pa.array([1.0] * len(rows), pa.float64()),
        "o_orderdate": pa.array(
            [None if r[2] is None else _day_us(r[2]) for r in rows],
            pa.int64()).cast(pa.timestamp("us")),
        "o_orderpriority": pa.array(["1-URGENT"] * len(rows),
                                    pa.string())})
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


class TestTypeGini:
    def test_hand_counts(self, ray_session, tmp_path):
        rows = [(0, 1, "a"), (1, 1, "a"), (2, 1, "a"), (3, 1, "b"),
                (4, 2, "a"), (5, 2, "a"),
                (6, None, "a"), (7, 3, None)]  # null key rows dropped
        _events(tmp_path, rows)
        got = _table(QUERIES["type_gini"][0](str(tmp_path)))
        r = {x["user_id"]: (x["n_events"], x["sum_sq"])
             for x in got.to_pylist()}
        # u1: counts {a:3, b:1} → n=4, Σc²=10; u2: {a:2} → n=2, Σc²=4
        assert r == {1: (4, 10), 2: (2, 4)}

    def test_oracle_parity_random(self, ray_session, tmp_path):
        rng = np.random.default_rng(431)
        types = ["a", "b", "c", "d"]
        rows = [(i, int(rng.integers(0, 50)),
                 types[int(rng.integers(0, 4))])
                for i in range(4000)]
        _events(tmp_path, rows)
        got = _table(QUERIES["type_gini"][0](str(tmp_path)))
        want = _oracle(tmp_path, QUERIES["type_gini"][1])
        assert _sorted_rows(got) == _sorted_rows(want)
        # sanity: gini numerator n² − Σc² is non-negative, and zero
        # only for single-type users
        for x in got.to_pylist():
            assert x["n_events"] ** 2 >= x["sum_sq"] >= x["n_events"]


class TestOverlappingOrders:
    def test_window_boundaries(self, ray_session, tmp_path):
        rows = [
            (1, 10, 0), (2, 10, 29),    # diff 29 < 30 → pair
            (3, 10, 60),                # 31 from key 2 → no pair
            (4, 20, 5), (5, 20, 35),    # diff exactly 30 → NO pair
            (6, 30, 7), (7, 30, 7), (8, 30, 7),  # same day → 3 pairs
            (9, 40, 0),                 # single order → absent
            (10, 50, None), (11, 50, 3)]  # null date dropped → absent
        _orders(tmp_path, rows)
        got = _table(QUERIES["overlapping_orders"][0](str(tmp_path)))
        r = {x["custkey"]: x["n_pairs"] for x in got.to_pylist()}
        assert r == {10: 1, 30: 3}

    def test_oracle_parity_random(self, ray_session, tmp_path):
        rng = np.random.default_rng(433)
        rows = [(i, int(rng.integers(0, 60)),
                 int(rng.integers(0, 400)))
                for i in range(3000)]
        _orders(tmp_path, rows)
        got = _table(QUERIES["overlapping_orders"][0](str(tmp_path)))
        want = _oracle(tmp_path, QUERIES["overlapping_orders"][1],
                       tables=("orders",))
        assert _sorted_rows(got) == _sorted_rows(want)
        assert got.num_rows > 0
