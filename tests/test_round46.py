"""Round-46 operator: decile_transition (customer revenue-decile
migration matrix between two years). Value assertions beyond the
gate: a hand-built reversal (rank r in 1995 → rank n+1−r in 1996),
single-year customers dropped, out-of-window years ignored, and
random oracle parity exercising the front-loaded NTILE sizes.
"""
import datetime

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from raybeats.queries import QUERIES


def _ts(y, d):
    return int((datetime.datetime(y, 1, 1,
                                  tzinfo=datetime.timezone.utc)
                + datetime.timedelta(days=d)).timestamp() * 1_000_000)


def _orders(tmp_path, rows):
    """rows: (orderkey, custkey, year, totalprice)."""
    t = pa.table({
        "o_orderkey": pa.array([r[0] for r in rows], pa.int64()),
        "o_custkey": pa.array([r[1] for r in rows], pa.int64()),
        "o_orderstatus": pa.array(["O"] * len(rows), pa.string()),
        "o_totalprice": pa.array([r[3] for r in rows], pa.float64()),
        "o_orderdate": pa.array([_ts(r[2], r[0] % 300) for r in rows],
                                pa.int64()).cast(pa.timestamp("us")),
        "o_orderpriority": pa.array(["1-URGENT"] * len(rows),
                                    pa.string())})
    pq.write_table(t, tmp_path / "orders.parquet")


def _table(res):
    if isinstance(res, pa.Table):
        return res
    return pa.concat_tables(res.iter_batches(batch_format="pyarrow"),
                            promote_options="default")


def _sorted_rows(tb):
    cols = sorted(tb.column_names)
    return sorted(
        map(tuple, zip(*[tb.column(c).to_pylist() for c in cols])),
        key=lambda r: tuple((v is None, v) for v in r))


class TestDecileTransition:
    def test_rank_reversal(self, ray_session, tmp_path):
        rows = [
            # 1995 totals: c1=400 c2=300 c3=200 c4=100 → deciles 1..4
            (1, 1, 1995, 400.0), (2, 2, 1995, 300.0),
            (3, 3, 1995, 200.0), (4, 4, 1995, 100.0),
            # 1996 reversed → deciles 4..1
            (5, 1, 1996, 100.0), (6, 2, 1996, 200.0),
            (7, 3, 1996, 300.0), (8, 4, 1996, 400.0),
            # only-1995 customer dropped; 1997 order ignored
            (9, 5, 1995, 999.0), (10, 1, 1997, 9999.0)]
        _orders(tmp_path, rows)
        got = _table(QUERIES["decile_transition"][0](str(tmp_path)))
        r = {(x["d_prev"], x["d_next"]): x["n_customers"]
             for x in got.to_pylist()}
        # c5 pushes 1995 ranks: c5=999→1, c1→2, c2→3, c3→4, c4→5
        assert r == {(2, 4): 1, (3, 3): 1, (4, 2): 1, (5, 1): 1}

    def test_oracle_parity_random(self, ray_session, tmp_path):
        rng = np.random.default_rng(461)
        rows = [(i, int(rng.integers(0, 80)),
                 int(rng.choice([1995, 1996, 1997])),
                 float(np.round(rng.uniform(10, 5000), 2)))
                for i in range(4000)]
        _orders(tmp_path, rows)
        got = _table(QUERIES["decile_transition"][0](str(tmp_path)))
        con = duckdb.connect()
        con.execute(f"CREATE VIEW orders AS SELECT * FROM "
                    f"'{tmp_path}/orders.parquet'")
        want = con.execute(QUERIES["decile_transition"][1]).arrow()
        assert _sorted_rows(got) == _sorted_rows(want)
        out = got.to_pylist()
        # both-year customer mass is conserved across the matrix
        assert sum(x["n_customers"] for x in out) > 0
        assert all(1 <= x["d_prev"] <= 10 and 1 <= x["d_next"] <= 10
                   for x in out)
