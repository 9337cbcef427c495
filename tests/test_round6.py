"""Round-6 operators: ntile_deciles, new_users_daily, longest_streak,
grouped_corr, top_user_per_type. Value assertions beyond the DuckDB
gate: NTILE front-loading, min-across-batches first-seen, streak gaps
and dedup, exact moment identities, argmax tie-breaking."""
import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from raybeats.queries import QUERIES

_DAY = 86_400_000_000


def _events(tmp_path, rows):
    """rows: list of (event_id, ts_us|None, user_id|None, type, value)."""
    t = pa.table({
        "event_id": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array([r[1] for r in rows], pa.int64())
        .cast(pa.timestamp("us")),
        "user_id": pa.array([r[2] for r in rows], pa.int64()),
        "event_type": pa.array([r[3] for r in rows], pa.string()),
        "value": pa.array([r[4] for r in rows], pa.float64()),
        "props": pa.array(["{}"] * len(rows), pa.string())})
    pq.write_table(t, tmp_path / "events.parquet")
    return t


def _table(res):
    if isinstance(res, pa.Table):
        return res
    return pa.concat_tables(res.iter_batches(batch_format="pyarrow"),
                            promote_options="default")


def _oracle(tmp_path, sql):
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM "
                f"'{tmp_path}/events.parquet'")
    return con.execute(sql).arrow()


def _sorted_rows(tb):
    cols = sorted(tb.column_names)
    return sorted(map(tuple, zip(*[tb.column(c).to_pylist()
                                   for c in cols])))


class TestNtileDeciles:
    def test_front_loaded_sizes(self, ray_session, tmp_path):
        # 12 rows + 1 NaN (excluded): NTILE(10) over N=12 gives the
        # FIRST two tiles 2 rows each, the rest 1 — front-loaded, not
        # evenly spread
        rows = [(i, i * 1000, 0, "view", float(i)) for i in range(12)]
        rows.append((12, 99_000, 0, "view", float("nan")))
        _events(tmp_path, rows)
        got = _table(QUERIES["ntile_deciles"][0](str(tmp_path)))
        by_dec = {r["decile"]: r for r in got.to_pylist()}
        sizes = [by_dec[d]["n"] for d in range(1, 11)]
        assert sizes == [2, 2, 1, 1, 1, 1, 1, 1, 1, 1]
        # decile 1 holds cents ranks 1-2 = values 0,1 -> cents 0,100
        assert by_dec[1]["min_cents"] == 0
        assert by_dec[1]["max_cents"] == 100
        assert by_dec[10]["max_cents"] == 1100
        want = _oracle(tmp_path, QUERIES["ntile_deciles"][1])
        assert _sorted_rows(got) == _sorted_rows(want)

    def test_fewer_rows_than_tiles(self, ray_session, tmp_path):
        # N=7 < 10 tiles: each row its own decile (q_sz == 0 path)
        rows = [(i, i * 1000, 0, "view", float(i)) for i in range(7)]
        _events(tmp_path, rows)
        got = _table(QUERIES["ntile_deciles"][0](str(tmp_path)))
        assert got.num_rows == 7
        assert sorted(got.column("decile").to_pylist()) == list(
            range(1, 8))
        assert set(got.column("n").to_pylist()) == {1}
        want = _oracle(tmp_path, QUERIES["ntile_deciles"][1])
        assert _sorted_rows(got) == _sorted_rows(want)


class TestNewUsersDaily:
    def test_min_across_batches_and_cum(self, ray_session, tmp_path):
        # u0 first on day 0 (also later), u1 first on day 2,
        # u2 first on day 2; null user and null ts dropped
        rows = [(0, 0 * _DAY, 0, "view", 1.0),
                (1, 3 * _DAY, 0, "view", 1.0),
                (2, 2 * _DAY, 1, "view", 1.0),
                (3, 2 * _DAY + 5, 2, "view", 1.0),
                (4, None, 7, "view", 1.0),
                (5, 1 * _DAY, None, "view", 1.0)]
        _events(tmp_path, rows)
        got = _table(QUERIES["new_users_daily"][0](str(tmp_path)))
        days = [d // _DAY for d in
                pa.compute.cast(got.column("day"),
                                pa.int64()).to_pylist()]
        assert days == [0, 2]                       # sorted by day
        assert got.column("n_new").to_pylist() == [1, 2]
        assert got.column("cum_users").to_pylist() == [1, 3]
        want = _oracle(tmp_path, QUERIES["new_users_daily"][1])
        assert _sorted_rows(got) == _sorted_rows(want)


class TestLongestStreak:
    def test_gaps_and_dedup(self, ray_session, tmp_path):
        # u0: days 1,2,3 then 10,11 -> streak 3 (duplicates on day 2
        # must dedup, not extend); u1: one day -> 1; u2: days 5,7,9 -> 1
        rows = []
        eid = 0
        for d in (1, 2, 2, 3, 10, 11):
            rows.append((eid, d * _DAY + eid, 0, "view", 1.0)); eid += 1
        rows.append((eid, 4 * _DAY, 1, "view", 1.0)); eid += 1
        for d in (5, 7, 9):
            rows.append((eid, d * _DAY, 2, "view", 1.0)); eid += 1
        _events(tmp_path, rows)
        got = _table(QUERIES["longest_streak"][0](str(tmp_path)))
        streaks = dict(zip(got.column("user_id").to_pylist(),
                           got.column("streak").to_pylist()))
        assert streaks == {0: 3, 1: 1, 2: 1}
        want = _oracle(tmp_path, QUERIES["longest_streak"][1])
        assert _sorted_rows(got) == _sorted_rows(want)

    def test_streak_across_batch_boundary(self, ray_session, tmp_path):
        # consecutive days split across many input batches must still
        # join into one run (the shuffle co-locates per user)
        rows = [(i, i * _DAY, 42, "view", 1.0) for i in range(25)]
        _events(tmp_path, rows)
        got = _table(QUERIES["longest_streak"][0](str(tmp_path)))
        assert got.to_pylist() == [{"user_id": 42, "streak": 25}]


class TestGroupedCorr:
    def test_hand_computed_moments(self, ray_session, tmp_path):
        # type A: (x, y) = (100, 1), (200, 2)  [value 1.0 at 01h, 2.0
        # at 02h] -> n=2, cov_num = 2*(100+400) - 300*3 = 100,
        # varx_num = 2*(10000+40000) - 300^2 = 10000, vary_num =
        # 2*5 - 9 = 1; perfectly linear -> cov^2 == varx*vary
        hour = 3_600_000_000
        rows = [(0, 1 * hour, 0, "A", 1.0),
                (1, 2 * hour, 0, "A", 2.0),
                (2, None, 0, "A", 5.0),            # null ts dropped
                (3, 5 * hour, 0, "B", float("nan"))]  # NaN dropped
        _events(tmp_path, rows)
        got = _table(QUERIES["grouped_corr"][0](str(tmp_path)))
        rows_out = {r["event_type"]: r for r in got.to_pylist()}
        a = rows_out["A"]
        assert a["n"] == 2 and a["cov_num"] == 100
        assert a["varx_num"] == 10_000 and a["vary_num"] == 1
        assert a["cov_num"] ** 2 == a["varx_num"] * a["vary_num"]
        assert "B" not in rows_out          # all B rows NaN-filtered
        want = _oracle(tmp_path, QUERIES["grouped_corr"][1])
        assert _sorted_rows(got) == _sorted_rows(want)


class TestTopUserPerType:
    def test_tie_breaks_to_smallest_user(self, ray_session, tmp_path):
        # type A: u5 x2, u3 x2 (tie -> u3), u9 x1; type B: u9 x1;
        # null users ignored
        rows = [(0, 0, 5, "A", 1.0), (1, 1, 5, "A", 1.0),
                (2, 2, 3, "A", 1.0), (3, 3, 3, "A", 1.0),
                (4, 4, 9, "A", 1.0), (5, 5, 9, "B", 1.0),
                (6, 6, None, "B", 1.0), (7, 7, None, "B", 1.0)]
        _events(tmp_path, rows)
        got = _table(QUERIES["top_user_per_type"][0](str(tmp_path)))
        out = {r["event_type"]: (r["top_user"], r["n_events"])
               for r in got.to_pylist()}
        assert out == {"A": (3, 2), "B": (9, 1)}
        want = _oracle(tmp_path, QUERIES["top_user_per_type"][1])
        assert _sorted_rows(got) == _sorted_rows(want)

    def test_counts_sum_across_batches(self, ray_session, tmp_path):
        # one user's events spread over many row groups: per-batch
        # partial counts must SUM before the argmax (u1 has 30 rows
        # split thin; u2 has 20 contiguous)
        rows = [(i, i, 1, "A", 1.0) for i in range(0, 60, 2)]
        rows += [(i, i, 2, "A", 1.0) for i in range(1, 40, 2)]
        _events(tmp_path, rows)
        got = _table(QUERIES["top_user_per_type"][0](str(tmp_path)))
        assert got.to_pylist() == [
            {"event_type": "A", "top_user": 1, "n_events": 30}]
