"""Round-59 operators: sft_examples (transcripts → SFT prompt /
completion pairs) and ols_fit (grouped exact-integer 2-feature OLS).
Hand-built value assertions plus DuckDB oracle parity on randomized
inputs.
"""
import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from raybeats.queries import QUERIES


def _table(res):
    if isinstance(res, pa.Table):
        return res
    batches = list(res.iter_batches(batch_format="pyarrow"))
    if not batches:
        return pa.table({})
    return pa.concat_tables(batches, promote_options="default")


def _sorted_rows(tb):
    return sorted(map(tuple, zip(
        *[tb.column(c).to_pylist() for c in sorted(tb.column_names)])))


def _oracle(tmp_path, sql, tables):
    con = duckdb.connect()
    for t in tables:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"'{tmp_path}/{t}.parquet'")
    return con.execute(sql).arrow()


def _events(tmp_path, rows):
    """rows: (event_id, user_id, ts_us, event_type, value, props)."""
    t = pa.table({
        "event_id": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array([r[2] for r in rows], pa.int64())
        .cast(pa.timestamp("us")),
        "user_id": pa.array([r[1] for r in rows], pa.int64()),
        "event_type": pa.array([r[3] for r in rows], pa.string()),
        "value": pa.array([r[4] for r in rows], pa.float64()),
        "props": pa.array([r[5] for r in rows], pa.string())})
    pq.write_table(t, tmp_path / "events.parquet")


class TestSftExamples:
    def test_hand_pairs(self, ray_session, tmp_path):
        # user 1: click(1), view(2), purchase(3) — the assistant turn
        # has two prior turns, both 'user' role. user 2: purchase(10)
        # only — FIRST turn of its conversation → empty prompt (and
        # user 1's turns must not leak across the boundary).
        rows = [(1, 1, 1000, "click", 1.0, "{}"),
                (2, 1, 2000, "view", 1.0, "{}"),
                (3, 1, 3000, "purchase", 1.0, "{}"),
                (10, 2, 4000, "purchase", 1.0, "{}")]
        _events(tmp_path, rows)
        got = _table(QUERIES["sft_examples"][0](str(tmp_path)))
        r = {x["turn_idx"]: x for x in got.to_pylist()}
        assert set(r) == {3, 10}
        assert r[10]["prompt"] == ""
        p = r[3]["prompt"]
        assert p.count("\n") == 2 and p.startswith("user: ")
        assert r[3]["completion"] is not None
        # turn 3's prompt carries turns 1 and 2 IN ORDER
        lines = p.splitlines()
        assert "evt 1" in lines[0] and "evt 2" in lines[1]

    def test_oracle_parity_random(self, ray_session, tmp_path):
        rng = np.random.default_rng(62)
        kinds = ["signup", "click", "view", "purchase", "error"]
        rows = [(i, int(rng.integers(0, 40)),
                 int(rng.integers(0, 10**9)),
                 kinds[int(rng.integers(0, 5))],
                 float(rng.normal(0, 5)),
                 '{"k": %d}' % int(rng.integers(0, 9)))
                for i in range(2500)]
        _events(tmp_path, rows)
        got = _table(QUERIES["sft_examples"][0](str(tmp_path)))
        want = _oracle(tmp_path, QUERIES["sft_examples"][1],
                       ["events"])
        assert got.num_rows > 0
        assert _sorted_rows(got) == _sorted_rows(want)


class TestOlsFit:
    def test_hand_exact_plane(self, ray_session, tmp_path):
        # plant value = 2 + 3*x1 + 5*x2 exactly (integer values so
        # floor(value*100) is exact cents) → the fit recovers
        # b0=200, b_hour=300, b_dayslot=500 with zero residual; the
        # integer Cramer division is exact
        pts = [(0, 0), (1, 0), (0, 1), (2, 3), (5, 2), (23, 6)]
        rows = []
        for i, (x1, x2) in enumerate(pts):
            us = (x2 * 86400 + x1 * 3600) * 1_000_000
            rows.append((i, 0, us, "click",
                         float(2 + 3 * x1 + 5 * x2), "{}"))
        _events(tmp_path, rows)
        got = QUERIES["ols_fit"][0](str(tmp_path))
        r = got.to_pylist()
        assert len(r) == 1 and r[0]["n"] == len(pts)
        assert r[0]["b0"] == 200.0
        assert r[0]["b_hour"] == 300.0
        assert r[0]["b_dayslot"] == 500.0

    def test_singular_group_excluded(self, ray_session, tmp_path):
        # one type with constant features (det = 0, excluded), one
        # with full-rank features (kept)
        rows = [(0, 0, 3600 * 10**6, "flat", 1.0, "{}"),
                (1, 0, 3600 * 10**6, "flat", 2.0, "{}")]
        pts = [(0, 0), (1, 0), (0, 1), (2, 2)]
        rows += [(10 + i, 0, (x2 * 86400 + x1 * 3600) * 10**6,
                  "ok", float(1 + x1 + x2), "{}")
                 for i, (x1, x2) in enumerate(pts)]
        _events(tmp_path, rows)
        got = QUERIES["ols_fit"][0](str(tmp_path))
        assert [r["event_type"] for r in got.to_pylist()] == ["ok"]

    def test_oracle_parity_random(self, ray_session, tmp_path):
        rng = np.random.default_rng(63)
        kinds = ["a", "b", "c"]
        rows = [(i, 0, int(rng.integers(0, 10**15)),
                 kinds[int(rng.integers(0, 3))],
                 float(np.round(rng.normal(10, 200), 2)), "{}")
                for i in range(4000)]
        _events(tmp_path, rows)
        got = QUERIES["ols_fit"][0](str(tmp_path))
        want = _oracle(tmp_path, QUERIES["ols_fit"][1], ["events"])
        assert got.num_rows == 3
        assert _sorted_rows(got) == _sorted_rows(want)
