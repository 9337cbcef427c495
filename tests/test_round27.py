"""Round-27 operators: lorenz_deciles (NTILE-exact concentration
curve from the count histogram) and view_to_buy_lag (per-purchase
LOCF conversion latency). Value assertions beyond the gate: NTILE
size allocation when N % 10 != 0, tie groups straddling decile
boundaries, monotone decile totals under skew, NULL-before-first-view
and same-timestamp ordering.
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


class TestLorenzDeciles:
    def test_ntile_sizes_with_remainder(self, ray_session, tmp_path):
        # 13 users -> NTILE sizes 2,2,2,1,...; heavy ties straddle
        rows = []
        eid = 0
        for u in range(13):
            k = 5 if u < 3 else 2   # three heavy, ten tied light
            for _ in range(k):
                rows.append((eid, eid, u, "a", 1.0))
                eid += 1
        _events(tmp_path, rows)
        got = _table(QUERIES["lorenz_deciles"][0](str(tmp_path)))
        want = _oracle(tmp_path, QUERIES["lorenz_deciles"][1])
        assert _sorted_rows(got) == _sorted_rows(want)
        rows_out = sorted(got.to_pylist(), key=lambda r: r["decile"])
        assert [r["n_users"] for r in rows_out] == [2, 2, 2] + [1] * 7
        assert sum(r["n_events"] for r in rows_out) == eid

    def test_oracle_parity_zipf(self, ray_session, tmp_path):
        rng = np.random.default_rng(167)
        rows = [(i, i, int(rng.zipf(1.5)) % 800, "a", 1.0)
                for i in range(8000)]
        _events(tmp_path, rows)
        got = _table(QUERIES["lorenz_deciles"][0](str(tmp_path)))
        want = _oracle(tmp_path, QUERIES["lorenz_deciles"][1])
        assert _sorted_rows(got) == _sorted_rows(want)
        rows_out = sorted(got.to_pylist(), key=lambda r: r["decile"])
        ev = [r["n_events"] for r in rows_out]
        assert ev == sorted(ev, reverse=True)  # heaviest decile first


class TestViewToBuyLag:
    def test_locf_semantics(self, ray_session, tmp_path):
        # u1: view@10, purchase@30 (lag 20), view@40, purchase@45
        # (lag 5); u2: purchase@10 with NO prior view -> NULL lag
        rows = [(0, 10, 1, "view", 1.0), (1, 30, 1, "purchase", 1.0),
                (2, 40, 1, "view", 1.0), (3, 45, 1, "purchase", 1.0),
                (4, 10, 2, "purchase", 1.0)]
        _events(tmp_path, rows)
        got = _table(QUERIES["view_to_buy_lag"][0](str(tmp_path)))
        lag = {r["event_id"]: r["lag_us"] for r in got.to_pylist()}
        assert lag == {1: 20, 3: 5, 4: None}

    def test_same_ts_view_counts(self, ray_session, tmp_path):
        # view and purchase share ts; view has the smaller event_id so
        # it precedes in (ts, event_id) order -> lag 0
        rows = [(0, 100, 1, "view", 1.0), (1, 100, 1, "purchase", 1.0)]
        _events(tmp_path, rows)
        got = _table(QUERIES["view_to_buy_lag"][0](str(tmp_path)))
        assert got.to_pylist() == [{"event_id": 1, "lag_us": 0}]

    def test_oracle_parity_random(self, ray_session, tmp_path):
        rng = np.random.default_rng(173)
        types = ["view", "cart", "purchase"]
        rows = [(i, int(rng.integers(0, 40)) * 1000,
                 int(rng.integers(0, 30)),
                 types[int(rng.integers(0, 3))], 1.0)
                for i in range(4000)]
        _events(tmp_path, rows)
        got = _table(QUERIES["view_to_buy_lag"][0](str(tmp_path)))
        want = _oracle(tmp_path, QUERIES["view_to_buy_lag"][1])
        assert _sorted_rows(got) == _sorted_rows(want)
