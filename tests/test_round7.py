"""Round-7 operators: full_outer_series, transition_counts,
quantile_cont, cohort_matrix, gap_fill_hours. Value assertions beyond
the DuckDB gate: FULL OUTER null sides, sequence tie-breaking on
(ts, event_id), dyadic interpolation exactness, cohort offsets across
gap weeks, dense-grid zero fill."""
import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from raybeats.queries import QUERIES

_HOUR = 3_600_000_000
_DAY = 86_400_000_000
_WEEK = 7 * _DAY
# first Monday at/after epoch — floor_temporal(week) anchors on Mondays
_MONDAY = 4 * _DAY


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


class TestFullOuterSeries:
    def test_null_sides(self, ray_session, tmp_path):
        # hour 0: clicks only; hour 1: both; hour 2: purchases only;
        # other types never count
        rows = [(0, 10, 1, "click", 1.0),
                (1, 20, 1, "click", 1.0),
                (2, _HOUR + 5, 1, "click", 1.0),
                (3, _HOUR + 6, 1, "purchase", 1.0),
                (4, 2 * _HOUR + 7, 1, "purchase", 1.0),
                (5, 2 * _HOUR + 8, 1, "view", 1.0)]
        _events(tmp_path, rows)
        got = _table(QUERIES["full_outer_series"][0](str(tmp_path)))
        by_hour = {r["hour"].timestamp() * 1e6 // _HOUR: r
                   for r in got.to_pylist()}
        assert by_hour[0]["n_click"] == 2
        assert by_hour[0]["n_purchase"] is None      # not 0: OUTER null
        assert by_hour[1] == {"hour": by_hour[1]["hour"],
                              "n_click": 1, "n_purchase": 1}
        assert by_hour[2]["n_click"] is None
        assert by_hour[2]["n_purchase"] == 1

    def test_oracle_parity(self, ray_session, tmp_path):
        rng = np.random.default_rng(7)
        rows = [(i, int(rng.integers(0, 40) * _HOUR + rng.integers(_HOUR)),
                 1, rng.choice(["click", "purchase", "view"]),
                 1.0) for i in range(300)]
        _events(tmp_path, rows)
        got = _table(QUERIES["full_outer_series"][0](str(tmp_path)))
        want = _oracle(tmp_path, QUERIES["full_outer_series"][1])
        assert _sorted_rows(got) == _sorted_rows(want)


class TestTransitionCounts:
    def test_tie_break_and_nulls(self, ray_session, tmp_path):
        # user 1: click(t=10) -> view(t=10, higher eid) -> purchase;
        # the equal-ts pair must order by event_id. user 2: single
        # event, no pair. null user dropped entirely.
        rows = [(1, 10, 1, "click", 1.0),
                (2, 10, 1, "view", 1.0),
                (3, 30, 1, "purchase", 1.0),
                (4, 40, 2, "view", 1.0),
                (5, 50, None, "click", 1.0)]
        _events(tmp_path, rows)
        got = _table(QUERIES["transition_counts"][0](str(tmp_path)))
        pairs = {(r["src"], r["dst"]): r["n"] for r in got.to_pylist()}
        assert pairs == {("click", "view"): 1, ("view", "purchase"): 1}

    def test_counts_split_invariant(self, ray_session, tmp_path):
        # adjacency must come from the GLOBAL per-user order, not
        # batch-local order: 200 alternating events for one user span
        # multiple read batches
        rows = [(i, i * 1000, 7, ("click" if i % 2 == 0 else "view"),
                 1.0) for i in range(200)]
        _events(tmp_path, rows)
        got = _table(QUERIES["transition_counts"][0](str(tmp_path)))
        pairs = {(r["src"], r["dst"]): r["n"] for r in got.to_pylist()}
        assert pairs == {("click", "view"): 100, ("view", "click"): 99}


class TestQuantileCont:
    def test_interpolation_exact(self, ray_session, tmp_path):
        # cents 0,100,200,300: h(.25)=0.75 -> 75.0; h(.5)=1.5 -> 150.0;
        # h(.75)=2.25 -> 225.0 — all exact dyadic interpolations
        rows = [(i, i * 1000, 1, "view", float(i)) for i in range(4)]
        rows.append((9, 99_000, 1, "view", float("nan")))  # ignored
        _events(tmp_path, rows)
        got = _table(QUERIES["quantile_cont"][0](str(tmp_path)))
        r = got.to_pylist()[0]
        assert r["n"] == 4
        assert r["p25_cont"] == 75.0
        assert r["p50_cont"] == 150.0
        assert r["p75_cont"] == 225.0

    def test_duplicate_heavy_cdf(self, ray_session, tmp_path):
        # values 0,0,0,1: median interpolates between two equal ranks
        rows = [(i, i * 1000, 1, "view", v)
                for i, v in enumerate([0.0, 0.0, 0.0, 1.0])]
        _events(tmp_path, rows)
        got = _table(QUERIES["quantile_cont"][0](str(tmp_path)))
        r = got.to_pylist()[0]
        assert r["p50_cont"] == 0.0
        assert r["p75_cont"] == 25.0   # h=2.25 between 0 and 100

    def test_non_dyadic_refused(self, ray_session, tmp_path):
        from raybeats.aggregates import grouped_quantile_cont
        rows = [(0, 0, 1, "view", 1.0)]
        _events(tmp_path, rows)
        import ray.data as rd
        ds = rd.read_parquet(str(tmp_path / "events.parquet"))
        with pytest.raises(ValueError, match="dyadic"):
            grouped_quantile_cont(ds, qs=(0.9,))


class TestCohortMatrix:
    def test_offsets_across_gap(self, ray_session, tmp_path):
        # user 1: weeks 0, 2 (gap at 1) -> offsets 0 and 2 from
        # cohort 0. user 2: first seen week 1, active weeks 1 and 2 ->
        # offsets 0 and 1 from cohort 1. Duplicate events in a week
        # count once.
        w0, w1, w2 = _MONDAY, _MONDAY + _WEEK, _MONDAY + 2 * _WEEK
        rows = [(0, w0 + 10, 1, "view", 1.0),
                (1, w0 + 20, 1, "click", 1.0),       # dup week
                (2, w2 + 10, 1, "view", 1.0),
                (3, w1 + 10, 2, "view", 1.0),
                (4, w2 + 20, 2, "view", 1.0)]
        _events(tmp_path, rows)
        got = _table(QUERIES["cohort_matrix"][0](str(tmp_path)))
        cells = {(int(r["cohort_week"].timestamp() * 1e6),
                  r["offset_weeks"]): r["n_active"]
                 for r in got.to_pylist()}
        assert cells == {(w0, 0): 1, (w0, 2): 1, (w1, 0): 1, (w1, 1): 1}

    def test_oracle_parity(self, ray_session, tmp_path):
        rng = np.random.default_rng(11)
        rows = [(i, int(rng.integers(0, 10 * _WEEK)),
                 int(rng.integers(0, 8)), "view", 1.0)
                for i in range(400)]
        _events(tmp_path, rows)
        got = _table(QUERIES["cohort_matrix"][0](str(tmp_path)))
        want = _oracle(tmp_path, QUERIES["cohort_matrix"][1])
        assert _sorted_rows(got) == _sorted_rows(want)


class TestGapFillHours:
    def test_zero_fill_dense_grid(self, ray_session, tmp_path):
        # events at hours 0 and 3 only -> grid 0..3 with zeros at 1,2
        rows = [(0, 10, 1, "view", 1.0),
                (1, 20, 1, "view", 1.0),
                (2, 3 * _HOUR + 5, 1, "view", 1.0),
                (3, None, 1, "view", 1.0)]            # null ts ignored
        _events(tmp_path, rows)
        got = _table(QUERIES["gap_fill_hours"][0](str(tmp_path)))
        assert got.num_rows == 4
        assert got.column("n").to_pylist() == [2, 0, 0, 1]
        hours = [int(h.timestamp() * 1e6) for h
                 in got.column("hour").to_pylist()]
        assert hours == [0, _HOUR, 2 * _HOUR, 3 * _HOUR]


class TestRollingActiveUsers:
    def test_window_dedup(self, ray_session, tmp_path):
        # user 1 active days 0 and 3: windows overlap on wd 3..6 where
        # they must count ONCE; user 2 active day 0 only
        rows = [(0, 10, 1, "view", 1.0),
                (1, 20, 1, "click", 1.0),              # same day dup
                (2, 3 * _DAY + 5, 1, "view", 1.0),
                (3, 30, 2, "view", 1.0)]
        _events(tmp_path, rows)
        got = _table(QUERIES["rolling_active_users"][0](str(tmp_path)))
        by_day = {int(r["day"].timestamp() * 1e6) // _DAY:
                  r["n_active_7d"] for r in got.to_pylist()}
        # wd 0..6 have user1+user2 (=2) for 0..6? user2 only windows
        # 0..6; user1 covers 0..6 and 3..9
        want = {d: 2 for d in range(7)}
        want.update({d: 1 for d in range(7, 10)})
        assert by_day == want

    def test_oracle_parity(self, ray_session, tmp_path):
        rng = np.random.default_rng(13)
        rows = [(i, int(rng.integers(0, 20 * _DAY)),
                 int(rng.integers(0, 6)), "view", 1.0)
                for i in range(300)]
        _events(tmp_path, rows)
        got = _table(QUERIES["rolling_active_users"][0](str(tmp_path)))
        want = _oracle(tmp_path, QUERIES["rolling_active_users"][1])
        assert _sorted_rows(got) == _sorted_rows(want)


class TestSampleUniform:
    def test_deterministic_and_exact_k(self, ray_session, tmp_path):
        rows = [(i, i * 1000, i % 7, "view", 1.0) for i in range(500)]
        _events(tmp_path, rows)
        a = _table(QUERIES["sample_uniform"][0](str(tmp_path)))
        b = _table(QUERIES["sample_uniform"][0](str(tmp_path)))
        assert a.num_rows == 100
        assert a.column("event_id").to_pylist() \
            == b.column("event_id").to_pylist()
        # matches the brute-force hash order over ALL rows (the
        # per-batch partial top-k must not lose a global candidate)
        M, A = 1_000_000_007, 2_654_435_761
        eids = np.arange(500, dtype=np.int64)
        h = (eids % M) * A % M
        want = eids[np.lexsort((eids, h))][:100]
        assert a.column("event_id").to_pylist() == want.tolist()

    def test_fewer_rows_than_k(self, ray_session, tmp_path):
        rows = [(i, i * 1000, 0, "view", 1.0) for i in range(7)]
        _events(tmp_path, rows)
        got = _table(QUERIES["sample_uniform"][0](str(tmp_path)))
        assert got.num_rows == 7


class TestMinValueRows:
    def test_ties_all_returned(self, ray_session, tmp_path):
        # type view: min 100 held by TWO rows; type click: min 50 by
        # one; NaN never wins even though it floors to garbage
        rows = [(0, 10, 1, "view", 1.0),
                (1, 20, 1, "view", 1.0),
                (2, 30, 1, "view", 2.0),
                (3, 40, 1, "click", 0.5),
                (4, 50, 1, "click", float("nan"))]
        _events(tmp_path, rows)
        got = _table(QUERIES["min_value_rows"][0](str(tmp_path)))
        rows_out = sorted((r["event_type"], r["event_id"], r["min_cents"])
                          for r in got.to_pylist())
        assert rows_out == [("click", 3, 50), ("view", 0, 100),
                            ("view", 1, 100)]
