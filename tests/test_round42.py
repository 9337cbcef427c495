"""Round-42 operators: monthly_new_vs_returning (growth split) and
q6_revenue (predicate-band exact revenue). Value assertions beyond the
gate: the sf corpus spans ONE month so the split is vacuous there —
these tests synthesize multi-month histories to prove returning users
are classified, plus band boundary inclusivity for Q6.
"""
import datetime

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from raybeats.queries import QUERIES


def _month_us(y, m):
    return int(datetime.datetime(y, m, 1,
                                 tzinfo=datetime.timezone.utc)
               .timestamp() * 1_000_000)


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


def _lineitem(tmp_path, rows):
    t = pa.table({
        "l_orderkey": pa.array(range(len(rows)), pa.int64()),
        "l_partkey": pa.array([0] * len(rows), pa.int64()),
        "l_suppkey": pa.array([0] * len(rows), pa.int64()),
        "l_linenumber": pa.array(range(len(rows)), pa.int64()),
        "l_quantity": pa.array([r[2] for r in rows], pa.float64()),
        "l_extendedprice": pa.array([r[0] for r in rows],
                                    pa.float64()),
        "l_discount": pa.array([r[1] for r in rows], pa.float64()),
        "l_tax": pa.array([0.0] * len(rows), pa.float64()),
        "l_returnflag": pa.array(["N"] * len(rows), pa.string()),
        "l_linestatus": pa.array(["O"] * len(rows), pa.string()),
        "l_shipdate": pa.array([r[3] for r in rows], pa.int64())
        .cast(pa.timestamp("us"))})
    pq.write_table(t, tmp_path / "lineitem.parquet")


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


class TestMonthlyNewVsReturning:
    def test_returning_classified(self, ray_session, tmp_path):
        jan, feb = _month_us(2024, 1), _month_us(2024, 2)
        # u1 active Jan+Feb (returning in Feb); u2 first appears Feb
        rows = [(0, jan, 1, "a", 1.0), (1, feb, 1, "a", 1.0),
                (2, feb + 5, 2, "a", 1.0)]
        _events(tmp_path, rows)
        got = _table(QUERIES["monthly_new_vs_returning"][0](
            str(tmp_path)))
        r = {str(x["mon"])[:7]: (x["n_active"], x["n_new"],
                                 x["n_returning"])
             for x in got.to_pylist()}
        assert r == {"2024-01": (1, 1, 0), "2024-02": (2, 1, 1)}

    def test_oracle_parity_random(self, ray_session, tmp_path):
        rng = np.random.default_rng(283)
        rows = [(i, _month_us(2024, 1 + int(rng.integers(0, 11)))
                 + int(rng.integers(0, 10_000)),
                 int(rng.integers(0, 40)), "a", 1.0)
                for i in range(3000)]
        _events(tmp_path, rows)
        got = _table(QUERIES["monthly_new_vs_returning"][0](
            str(tmp_path)))
        want = _oracle(tmp_path,
                       QUERIES["monthly_new_vs_returning"][1])
        assert _sorted_rows(got) == _sorted_rows(want)
        rows_out = got.to_pylist()
        assert sum(r["n_new"] for r in rows_out) == \
            len({x[2] for x in rows})  # every user new exactly once
        assert any(r["n_returning"] > 0 for r in rows_out)


class TestQ6Revenue:
    def test_band_boundaries(self, ray_session, tmp_path):
        d96 = _month_us(1996, 6)
        d97 = _month_us(1997, 6)
        rows = [  # (extprice, discount, qty, shipdate)
            (100.0, 0.05, 10.0, d96),   # in (lower bound inclusive)
            (100.0, 0.07, 10.0, d96),   # in (upper bound inclusive)
            (100.0, 0.04, 10.0, d96),   # out: discount
            (100.0, 0.06, 24.0, d96),   # out: quantity (strict <)
            (100.0, 0.06, 23.0, d97),   # out: year
            (200.0, 0.06, 1.0, d96)]    # in
        _lineitem(tmp_path, rows)
        got = _table(QUERIES["q6_revenue"][0](str(tmp_path)))
        r = got.to_pylist()[0]
        want = int(np.floor(100.0 * 0.05 * 100)) \
            + int(np.floor(100.0 * 0.07 * 100)) \
            + int(np.floor(200.0 * 0.06 * 100))
        assert r == {"revenue_cents": want, "n_items": 3}

    def test_oracle_parity_sf(self, ray_session):
        sf = "/root/testdata/sf0.01"
        got = _table(QUERIES["q6_revenue"][0](sf))
        con = duckdb.connect()
        con.execute(f"CREATE VIEW lineitem AS SELECT * FROM "
                    f"'{sf}/lineitem.parquet'")
        want = con.execute(QUERIES["q6_revenue"][1]).arrow()
        assert _sorted_rows(got) == _sorted_rows(want)
        assert got.to_pylist()[0]["n_items"] > 0
