"""Round-11 operators: user_top_types, cumulative_users, degree_dist,
user_summary, mode_per_type. Value assertions beyond the DuckDB gate:
aggregated-count ranking with lexical tie-break, first-seen prefix
sums across gap days, degree histogram fold, NULL sums for all-NaN
users, mode tie-to-smallest."""
import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from raybeats.queries import QUERIES

_DAY = 86_400_000_000


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


class TestUserTopTypes:
    def test_count_rank_and_lexical_tie(self, ray_session, tmp_path):
        # u1: click x3, view x3, purchase x1 -> tie between click and
        # view breaks LEXICALLY (click first); purchase never ranks.
        rows = [(i, i, 1, t, 0.0) for i, t in enumerate(
            ["click", "view", "click", "view", "click", "view",
             "purchase"])]
        rows.append((99, 99, 2, "error", 0.0))
        _events(tmp_path, rows)
        got = _table(QUERIES["user_top_types"][0](str(tmp_path)))
        rows_out = sorted((r["user_id"], r["rnk"], r["event_type"],
                           r["n"]) for r in got.to_pylist())
        assert rows_out == [(1, 1, "click", 3), (1, 2, "view", 3),
                            (2, 1, "error", 1)]

    def test_counts_fold_across_batches(self, ray_session, tmp_path):
        # one user's counts accumulate across many read batches; the
        # global count decides the ranking, not any batch-local one
        rows = [(i, i, 5, ("a" if i % 3 else "b"), 0.0)
                for i in range(900)]  # b: 300, a: 600
        _events(tmp_path, rows)
        got = _table(QUERIES["user_top_types"][0](str(tmp_path)))
        rows_out = [(r["rnk"], r["event_type"], r["n"])
                    for r in sorted(got.to_pylist(),
                                    key=lambda r: r["rnk"])]
        assert rows_out == [(1, "a", 600), (2, "b", 300)]


class TestCumulativeUsers:
    def test_prefix_sum_across_gap_days(self, ray_session, tmp_path):
        # day0: users 1,2. day2: user 3 (new) + user 1 (old). day5:
        # user 4. gap days emit no row; counts accumulate.
        rows = [(0, 10, 1, "a", 0.0), (1, 20, 2, "a", 0.0),
                (2, 2 * _DAY, 3, "a", 0.0),
                (3, 2 * _DAY + 5, 1, "a", 0.0),
                (4, 5 * _DAY, 4, "a", 0.0)]
        _events(tmp_path, rows)
        got = _table(QUERIES["cumulative_users"][0](str(tmp_path)))
        rows_out = [(int(r["day"].timestamp() * 1e6) // _DAY,
                     r["cum_users"]) for r in got.to_pylist()]
        assert rows_out == [(0, 2), (2, 3), (5, 4)]


class TestDegreeDist:
    def test_histogram_fold(self, ray_session, tmp_path):
        # orders with 1, 1, 3, 2 lines -> {1: 2 orders, 2: 1, 3: 1};
        # order 30's lines are spread so batch-local counts would be
        # wrong without the keyed fold
        keys = [10, 20, 30, 30, 30, 40, 40]
        pq.write_table(pa.table({
            "l_orderkey": pa.array(keys, pa.int64()),
            "l_extendedprice": pa.array([1.0] * len(keys), pa.float64()),
            "l_discount": pa.array([0.0] * len(keys), pa.float64())}),
            tmp_path / "lineitem.parquet")
        got = _table(QUERIES["degree_dist"][0](str(tmp_path)))
        rows_out = sorted((r["n_lines"], r["n_orders"])
                          for r in got.to_pylist())
        assert rows_out == [(1, 2), (2, 1), (3, 1)]

    def test_oracle_parity_random(self, ray_session, tmp_path):
        rng = np.random.default_rng(47)
        keys = rng.integers(0, 200, size=3000)
        pq.write_table(pa.table({
            "l_orderkey": pa.array(keys, pa.int64()),
            "l_extendedprice": pa.array(np.ones(3000), pa.float64()),
            "l_discount": pa.array(np.zeros(3000), pa.float64())}),
            tmp_path / "lineitem.parquet")
        got = _table(QUERIES["degree_dist"][0](str(tmp_path)))
        want = _oracle(tmp_path, QUERIES["degree_dist"][1],
                       ["lineitem"])
        assert _sorted_rows(got) == _sorted_rows(want)


class TestUserSummary:
    def test_measures_and_nan_sum(self, ray_session, tmp_path):
        # u1: three events, one NaN value (skipped in the sum, counted
        # in n_events). u2: ALL values NaN -> value_cents is NULL.
        rows = [(0, 10, 1, "a", 1.005), (1, 50, 1, "a", float("nan")),
                (2, 30, 1, "a", 2.0),
                (3, 99, 2, "a", float("nan"))]
        _events(tmp_path, rows)
        got = _table(QUERIES["user_summary"][0](str(tmp_path)))
        by_u = {r["user_id"]: r for r in got.to_pylist()}
        assert by_u[1]["n_events"] == 3
        assert int(by_u[1]["first_ts"].timestamp() * 1e6) == 10
        assert int(by_u[1]["last_ts"].timestamp() * 1e6) == 50
        assert by_u[1]["span_us"] == 40
        assert by_u[1]["value_cents"] == 100 + 200
        assert by_u[2]["value_cents"] is None
        assert by_u[2]["span_us"] == 0

    def test_oracle_parity_random(self, ray_session, tmp_path):
        rng = np.random.default_rng(53)
        rows = [(i, int(rng.integers(0, 1_000_000)),
                 int(rng.integers(0, 25)), "a",
                 float(rng.normal(5, 3))) for i in range(800)]
        _events(tmp_path, rows)
        got = _table(QUERIES["user_summary"][0](str(tmp_path)))
        want = _oracle(tmp_path, QUERIES["user_summary"][1])
        assert _sorted_rows(got) == _sorted_rows(want)


class TestModePerType:
    def test_tie_to_smallest(self, ray_session, tmp_path):
        # type a: cents 100 x2, 300 x2, 200 x1 -> tie between 100 and
        # 300 goes to the SMALLEST (100). NaN rows never count.
        rows = [(0, 0, 1, "a", 1.0), (1, 1, 1, "a", 1.0),
                (2, 2, 1, "a", 3.0), (3, 3, 1, "a", 3.0),
                (4, 4, 1, "a", 2.0), (5, 5, 1, "a", float("nan"))]
        _events(tmp_path, rows)
        got = _table(QUERIES["mode_per_type"][0](str(tmp_path)))
        assert got.to_pylist() == [
            {"event_type": "a", "mode_cents": 100, "n_mode": 2}]

    def test_counts_fold_across_batches(self, ray_session, tmp_path):
        # the global mode (7) never wins inside any single batch slice
        # unless counts fold globally
        rows = [(i, i, 1, "a", float(i % 5)) for i in range(995)]
        rows += [(2000 + i, 2000 + i, 1, "a", 7.0) for i in range(200)]
        _events(tmp_path, rows)
        got = _table(QUERIES["mode_per_type"][0](str(tmp_path)))
        assert got.to_pylist() == [
            {"event_type": "a", "mode_cents": 700, "n_mode": 200}]
