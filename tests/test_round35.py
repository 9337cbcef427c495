"""Round-35 operators: weekend_ks (calendar drift via the shared KS
fold) and first_response_lag (flagship time-to-first-response). Value
assertions beyond the gate: weekend side classification, identical
weekday/weekend distributions give ks 0, assistant-before-user
conversations excluded, and first-after semantics.
"""
import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from raybeats.queries import QUERIES

DAY = 86_400_000_000
# 1970-01-01 was a THURSDAY; Sunday-0 dow of day d = (d + 4) % 7
SAT = 2 * DAY   # 1970-01-03
SUN = 3 * DAY   # 1970-01-04
MON = 4 * DAY   # 1970-01-05


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


class TestWeekendKs:
    def test_sides_and_zero_drift(self, ray_session, tmp_path):
        # same value multiset on Sat/Sun as on Mon -> ks_num == 0
        rows = [(0, SAT, 1, "a", 1.0), (1, SUN, 1, "a", 2.0),
                (2, MON, 1, "a", 1.0), (3, MON + 1, 1, "a", 2.0)]
        _events(tmp_path, rows)
        got = _table(QUERIES["weekend_ks"][0](str(tmp_path)))
        r = got.to_pylist()[0]
        assert (r["n_weekday"], r["n_weekend"], r["ks_num"]) == (2, 2, 0)

    def test_oracle_parity_random(self, ray_session, tmp_path):
        rng = np.random.default_rng(241)
        rows = [(i, int(rng.integers(0, 28)) * DAY
                 + int(rng.integers(0, 1000)), 1, "a",
                 float(rng.uniform(0, 30))) for i in range(3000)]
        _events(tmp_path, rows)
        got = _table(QUERIES["weekend_ks"][0](str(tmp_path)))
        want = _oracle(tmp_path, QUERIES["weekend_ks"][1])
        assert _sorted_rows(got) == _sorted_rows(want)


class TestFirstResponseLag:
    def test_oracle_parity_sf(self, ray_session):
        sf = "/root/testdata/sf0.001"
        got = _table(QUERIES["first_response_lag"][0](sf))
        con = duckdb.connect()
        con.execute(f"CREATE VIEW events AS SELECT * FROM "
                    f"'{sf}/events.parquet'")
        want = con.execute(QUERIES["first_response_lag"][1]).arrow()
        assert _sorted_rows(got) == _sorted_rows(want)
        assert got.num_rows > 0

    def test_first_after_semantics(self, ray_session, tmp_path):
        # conv per user: u1 events 'purchase'(assistant) BEFORE any
        # 'view'(user) then a later purchase -> lag measures to the
        # assistant AFTER the first user turn, not the earlier one;
        # u2 has assistant only before user -> excluded
        rows = [(0, 100, 1, "purchase", 1.0),   # assistant, ti=0
                (1, 200, 1, "view", 1.0),       # user,      ti=1
                (2, 500, 1, "purchase", 1.0),   # assistant, ti=2
                (3, 100, 2, "purchase", 1.0),   # assistant only
                (4, 200, 2, "signup", 1.0)]     # system (not user)
        _events(tmp_path, rows)
        got = _table(QUERIES["first_response_lag"][0](str(tmp_path)))
        rows_out = got.to_pylist()
        assert len(rows_out) == 1
        assert rows_out[0]["lag_us"] == 300
