"""Round-8 operators: mad_per_type, conversion_lag, user_paths,
second_event, view_no_buy_days. Value assertions beyond the DuckDB
gate: hand-computed MAD medians, strict-after lag semantics,
prefix-cap and tie-break order in paths, nth-row selection, and the
same-table EXCEPT day boundary."""
import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from raybeats.queries import QUERIES

_HOUR = 3_600_000_000
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
    return sorted(
        map(tuple, zip(*[tb.column(c).to_pylist() for c in cols])),
        key=lambda r: tuple((v is None, v) for v in r))


class TestMadPerType:
    def test_hand_computed(self, ray_session, tmp_path):
        # type a: cents {100, 200, 400} -> median 200 (ceil(1.5)=2nd),
        # |dev| {100, 0, 200} -> MAD 100. type b: all-NaN -> dropped.
        rows = [(0, 0, 1, "a", 1.0), (1, 1, 1, "a", 2.0),
                (2, 2, 1, "a", 4.0),
                (3, 3, 1, "b", float("nan"))]
        _events(tmp_path, rows)
        got = _table(QUERIES["mad_per_type"][0](str(tmp_path)))
        assert got.to_pylist() == [
            {"event_type": "a", "n": 3, "mad_cents": 100}]

    def test_even_n_lower_median(self, ray_session, tmp_path):
        # cents {100, 200, 300, 400}: even n takes the LOWER median
        # (ceil(0.5*4)=2nd = 200); |dev| {100, 0, 100, 200} sorted
        # {0,100,100,200} -> 2nd = 100
        rows = [(i, i, 1, "a", v) for i, v in
                enumerate([1.0, 2.0, 3.0, 4.0])]
        _events(tmp_path, rows)
        got = _table(QUERIES["mad_per_type"][0](str(tmp_path)))
        assert got.to_pylist() == [
            {"event_type": "a", "n": 4, "mad_cents": 100}]

    def test_oracle_parity_random(self, ray_session, tmp_path):
        rng = np.random.default_rng(11)
        rows = [(i, i, 1, rng.choice(["a", "b", "c"]),
                 float(rng.normal(50, 20))) for i in range(500)]
        _events(tmp_path, rows)
        got = _table(QUERIES["mad_per_type"][0](str(tmp_path)))
        want = _oracle(tmp_path, QUERIES["mad_per_type"][1])
        assert _sorted_rows(got) == _sorted_rows(want)


class TestConversionLag:
    def test_strict_after_and_sides(self, ray_session, tmp_path):
        # u1: view@10 purchase@25 -> lag 15. u2: purchase BEFORE first
        # view -> excluded. u3: equal ts -> excluded (strict >).
        # u4: view only -> excluded. u5: purchase only -> excluded.
        rows = [(0, 10, 1, "view", 0.0), (1, 25, 1, "purchase", 0.0),
                (2, 50, 2, "purchase", 0.0), (3, 60, 2, "view", 0.0),
                (4, 70, 3, "view", 0.0), (5, 70, 3, "purchase", 0.0),
                (6, 80, 4, "view", 0.0),
                (7, 90, 5, "purchase", 0.0)]
        _events(tmp_path, rows)
        got = _table(QUERIES["conversion_lag"][0](str(tmp_path)))
        assert got.to_pylist() == [{"user_id": 1, "lag_us": 15}]

    def test_first_touch_across_batches(self, ray_session, tmp_path):
        # many rows force multiple read batches; the FIRST view and
        # FIRST purchase must be global minima, not batch-local
        rows = [(i, 1000 - i, 9, "view", 0.0) for i in range(300)]
        rows += [(1000 + i, 5000 + i, 9, "purchase", 0.0)
                 for i in range(300)]
        _events(tmp_path, rows)
        got = _table(QUERIES["conversion_lag"][0](str(tmp_path)))
        # first view ts = 1000-299 = 701, first purchase = 5000
        assert got.to_pylist() == [{"user_id": 9, "lag_us": 4299}]


class TestUserPaths:
    def test_prefix_cap_and_tiebreak(self, ray_session, tmp_path):
        # u1 has 5 events: only the first 3 form the path; the equal-ts
        # pair orders by event_id. u2 has ONE event: short path. null
        # user and null type rows drop.
        rows = [(2, 10, 1, "view", 0.0), (1, 10, 1, "click", 0.0),
                (3, 30, 1, "signup", 0.0), (4, 40, 1, "error", 0.0),
                (5, 50, 1, "purchase", 0.0),
                (6, 60, 2, "error", 0.0),
                (7, 70, None, "click", 0.0)]
        _events(tmp_path, rows)
        got = _table(QUERIES["user_paths"][0](str(tmp_path)))
        paths = {r["path"]: r["n_users"] for r in got.to_pylist()}
        assert paths == {"click>view>signup": 1, "error": 1}

    def test_counts_collide(self, ray_session, tmp_path):
        # two users with the SAME first-3 prefix fold into one row
        rows = [(0, 0, 1, "view", 0.0), (1, 1, 1, "click", 0.0),
                (2, 2, 1, "view", 0.0), (3, 3, 1, "purchase", 0.0),
                (4, 0, 2, "view", 0.0), (5, 1, 2, "click", 0.0),
                (6, 2, 2, "view", 0.0)]
        _events(tmp_path, rows)
        got = _table(QUERIES["user_paths"][0](str(tmp_path)))
        assert got.to_pylist() == [{"path": "view>click>view",
                                    "n_users": 2}]

    def test_global_order_across_batches(self, ray_session, tmp_path):
        # one user's events span read batches in REVERSE ts order: the
        # path must reflect global (ts, event_id) order
        types = ["click", "view", "signup"]
        rows = [(i, 10_000 - i, 7, types[(10_000 - i) % 3], 0.0)
                for i in range(400)]
        _events(tmp_path, rows)
        got = _table(QUERIES["user_paths"][0](str(tmp_path)))
        # i in [0, 400) -> ts in [9601, 10000]; first three are
        # 9601, 9602, 9603
        want = ">".join(types[(9_601 + k) % 3] for k in range(3))
        assert got.to_pylist() == [{"path": want, "n_users": 1}]


class TestSecondEvent:
    def test_nth_selection(self, ray_session, tmp_path):
        # u1: second by (ts, eid) is the HIGHER eid of the equal-ts
        # pair. u2: single event -> no row. u3: two events.
        rows = [(1, 10, 1, "click", 0.0), (2, 10, 1, "view", 0.0),
                (3, 30, 1, "purchase", 0.0),
                (4, 40, 2, "view", 0.0),
                (5, 50, 3, "signup", 0.0), (6, 45, 3, "error", 0.0)]
        _events(tmp_path, rows)
        got = _table(QUERIES["second_event"][0](str(tmp_path)))
        # _sorted_rows orders columns alphabetically: (second_type, user_id)
        assert _sorted_rows(got) == [("signup", 3), ("view", 1)]

    def test_oracle_parity_random(self, ray_session, tmp_path):
        rng = np.random.default_rng(13)
        rows = [(i, int(rng.integers(0, 1_000_000)),
                 int(rng.integers(0, 40)),
                 rng.choice(["click", "view", "purchase"]), 0.0)
                for i in range(600)]
        _events(tmp_path, rows)
        got = _table(QUERIES["second_event"][0](str(tmp_path)))
        want = _oracle(tmp_path, QUERIES["second_event"][1])
        assert _sorted_rows(got) == _sorted_rows(want)


class TestViewNoBuyDays:
    def test_day_boundary_and_except(self, ray_session, tmp_path):
        # u1 day0: view+purchase -> excluded. u1 day1: view only ->
        # kept (purchase at day1+1us boundary lands in day1? no —
        # _DAY+1 IS day1, so give the purchase at day2). u2 day0:
        # purchase only -> not emitted. other types never count.
        rows = [(0, 10, 1, "view", 0.0),
                (1, 20, 1, "purchase", 0.0),
                (2, _DAY + 1, 1, "view", 0.0),
                (3, 2 * _DAY + 5, 1, "purchase", 0.0),
                (4, 30, 2, "purchase", 0.0),
                (5, 40, 2, "error", 0.0),
                (6, _DAY + 50, 2, "view", 0.0),
                (7, _DAY + 60, 2, "view", 0.0)]  # dup pair dedups
        _events(tmp_path, rows)
        got = _table(QUERIES["view_no_buy_days"][0](str(tmp_path)))
        rows_out = {(r["user_id"], int(r["day"].timestamp()))
                    for r in got.to_pylist()}
        assert rows_out == {(1, _DAY // 1_000_000),
                            (2, _DAY // 1_000_000)}

    def test_oracle_parity_random(self, ray_session, tmp_path):
        rng = np.random.default_rng(17)
        rows = [(i, int(rng.integers(0, 10) * _DAY + rng.integers(_DAY)),
                 int(rng.integers(0, 25)),
                 rng.choice(["view", "purchase", "click"]), 0.0)
                for i in range(800)]
        _events(tmp_path, rows)
        got = _table(QUERIES["view_no_buy_days"][0](str(tmp_path)))
        want = _oracle(tmp_path, QUERIES["view_no_buy_days"][1])
        assert _sorted_rows(got) == _sorted_rows(want)
