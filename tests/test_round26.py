"""Round-26 operators: session_lengths (session-size histogram),
sessions_with_buy (per-visit conversion numerators), tool_cooccurrence
(flagship tool-pair affinity). Value assertions beyond the gate:
hand-built session boundaries exactly at the 30-min edge, multi-buy
sessions counted once, and pair counts on synthetic multi-tool
conversations.
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


class TestSessionLengths:
    def test_boundary_exact_30min(self, ray_session, tmp_path):
        # gap EXACTLY 30 min does NOT break (strict >); 30min+1 does
        rows = [(0, 0, 1, "a", 1.0),
                (1, MIN30, 1, "a", 1.0),           # same session
                (2, 2 * MIN30 + 1, 1, "a", 1.0),   # new session
                (3, 0, 2, "a", 1.0)]
        _events(tmp_path, rows)
        got = _table(QUERIES["session_lengths"][0](str(tmp_path)))
        hist = {r["n_events"]: r["n_sessions"] for r in got.to_pylist()}
        assert hist == {2: 1, 1: 2}

    def test_oracle_parity_random(self, ray_session, tmp_path):
        rng = np.random.default_rng(157)
        rows = [(i, int(rng.integers(0, 100)) * 10 * 60 * 1_000_000,
                 int(rng.integers(0, 25)), "a", 1.0)
                for i in range(3000)]
        _events(tmp_path, rows)
        got = _table(QUERIES["session_lengths"][0](str(tmp_path)))
        want = _oracle(tmp_path, QUERIES["session_lengths"][1])
        assert _sorted_rows(got) == _sorted_rows(want)


class TestSessionsWithBuy:
    def test_multi_buy_counted_once(self, ray_session, tmp_path):
        # session 1 of u1 has TWO buys -> counts once; session 2 none
        rows = [(0, 0, 1, "purchase", 1.0), (1, 10, 1, "purchase", 1.0),
                (2, 2 * MIN30, 1, "view", 1.0),
                (3, 0, 2, "view", 1.0)]
        _events(tmp_path, rows)
        got = _table(QUERIES["sessions_with_buy"][0](str(tmp_path)))
        r = got.to_pylist()[0]
        assert r == {"n_sessions": 3, "n_buy_sessions": 1}

    def test_oracle_parity_random(self, ray_session, tmp_path):
        rng = np.random.default_rng(163)
        rows = [(i, int(rng.integers(0, 50)) * 20 * 60 * 1_000_000,
                 int(rng.integers(0, 15)),
                 ["view", "cart", "purchase"][int(rng.integers(0, 3))], 1.0)
                for i in range(2500)]
        _events(tmp_path, rows)
        got = _table(QUERIES["sessions_with_buy"][0](str(tmp_path)))
        want = _oracle(tmp_path, QUERIES["sessions_with_buy"][1])
        assert _sorted_rows(got) == _sorted_rows(want)


class TestToolCooccurrence:
    def test_oracle_parity_sf(self, ray_session):
        sf = "/root/testdata/sf0.001"
        got = _table(QUERIES["tool_cooccurrence"][0](sf))
        con = duckdb.connect()
        con.execute(f"CREATE VIEW events AS SELECT * FROM "
                    f"'{sf}/events.parquet'")
        want = con.execute(QUERIES["tool_cooccurrence"][1]).arrow()
        assert _sorted_rows(got) == _sorted_rows(want)
        assert got.num_rows > 5
        # pairs are canonical: a < b, no self-pairs
        for r in got.to_pylist():
            assert r["tool_a"] < r["tool_b"]
