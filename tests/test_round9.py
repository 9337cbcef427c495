"""Round-9 operators: scd2_intervals, dense_topk, first_occurrence,
dwell_time, median_gap_per_user. Value assertions beyond the DuckDB
gate: run compression and the open last interval, distinct-selection
containment, keep-first ties and key injectivity, LEAD attribution to
the earlier row, entity-local lower medians."""
import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from raybeats.queries import QUERIES


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


class TestScd2Intervals:
    def test_run_compression_and_open_tail(self, ray_session, tmp_path):
        # u1: a a b a -> three intervals; the final one stays open
        rows = [(0, 10, 1, "a", 0.0), (1, 20, 1, "a", 0.0),
                (2, 30, 1, "b", 0.0), (3, 40, 1, "a", 0.0),
                (4, 50, 2, "b", 0.0)]
        _events(tmp_path, rows)
        got = _table(QUERIES["scd2_intervals"][0](str(tmp_path)))
        rows_out = sorted(
            (r["user_id"], r["state"],
             int(r["valid_from"].timestamp() * 1e6),
             None if r["valid_to"] is None
             else int(r["valid_to"].timestamp() * 1e6))
            for r in got.to_pylist())
        assert rows_out == [(1, "a", 10, 30), (1, "a", 40, None),
                            (1, "b", 30, 40), (2, "b", 50, None)]

    def test_oracle_parity_random(self, ray_session, tmp_path):
        rng = np.random.default_rng(23)
        rows = [(i, int(rng.integers(0, 500)), int(rng.integers(0, 12)),
                 rng.choice(["a", "b"]), 0.0) for i in range(700)]
        _events(tmp_path, rows)
        got = _table(QUERIES["scd2_intervals"][0](str(tmp_path)))
        want = _oracle(tmp_path, QUERIES["scd2_intervals"][1])
        assert _sorted_rows(got) == _sorted_rows(want)


class TestDenseTopk:
    def test_distinct_and_rank(self, ray_session, tmp_path):
        # type a cents: {400 x3, 300, 100, 50} -> distinct top-3 is
        # 400, 300, 100 with ranks 1..3 (duplicates collapse);
        # type b has only ONE distinct value -> one row
        rows = [(0, 0, 1, "a", 4.0), (1, 1, 1, "a", 4.0),
                (2, 2, 1, "a", 4.0), (3, 3, 1, "a", 3.0),
                (4, 4, 1, "a", 1.0), (5, 5, 1, "a", 0.5),
                (6, 6, 1, "b", 2.0), (7, 7, 1, "b", 2.0)]
        _events(tmp_path, rows)
        got = _table(QUERIES["dense_topk"][0](str(tmp_path)))
        rows_out = sorted((r["event_type"], r["rnk"], r["cents"])
                          for r in got.to_pylist())
        assert rows_out == [("a", 1, 400), ("a", 2, 300),
                            ("a", 3, 100), ("b", 1, 200)]

    def test_containment_across_batches(self, ray_session, tmp_path):
        # global top-3 distinct values are scattered so no single read
        # batch holds them all; per-batch top-k compaction must still
        # contain the global answer
        rows = [(i, i, 1, "a", float(i % 97)) for i in range(2000)]
        _events(tmp_path, rows)
        got = _table(QUERIES["dense_topk"][0](str(tmp_path)))
        rows_out = sorted((r["rnk"], r["cents"])
                          for r in got.to_pylist())
        assert rows_out == [(1, 9600), (2, 9500), (3, 9400)]


class TestFirstOccurrence:
    def test_tie_and_selection(self, ray_session, tmp_path):
        # u1 type a: equal-ts pair -> LOWER eid wins. u1 type b and
        # u2 type a each have one event.
        rows = [(5, 10, 1, "a", 0.0), (4, 10, 1, "a", 0.0),
                (6, 5, 1, "b", 0.0), (7, 99, 2, "a", 0.0),
                (8, 1, 1, "a", 9.0)]
        _events(tmp_path, rows)
        got = _table(QUERIES["first_occurrence"][0](str(tmp_path)))
        rows_out = sorted((r["user_id"], r["event_type"],
                           int(r["first_ts"].timestamp() * 1e6),
                           r["first_eid"]) for r in got.to_pylist())
        assert rows_out == [(1, "a", 1, 8), (1, "b", 5, 6),
                            (2, "a", 99, 7)]

    def test_key_injectivity(self, ray_session, tmp_path):
        # adversarial composite-key coding: user 12 + type "a" must
        # not collide with user 1 + type "2|a"
        rows = [(0, 10, 12, "a", 0.0), (1, 20, 1, "2|a", 0.0)]
        _events(tmp_path, rows)
        got = _table(QUERIES["first_occurrence"][0](str(tmp_path)))
        assert got.num_rows == 2


class TestDwellTime:
    def test_attribution_to_earlier_row(self, ray_session, tmp_path):
        # u1: a@10 -> b@25 -> a@30: dwell a += 15 (10->25),
        # dwell b += 5 (25->30); the final event contributes nothing.
        # u2: single event -> nothing.
        rows = [(0, 10, 1, "a", 0.0), (1, 25, 1, "b", 0.0),
                (2, 30, 1, "a", 0.0), (3, 99, 2, "b", 0.0)]
        _events(tmp_path, rows)
        got = _table(QUERIES["dwell_time"][0](str(tmp_path)))
        rows_out = {r["event_type"]: (r["n_gaps"], r["dwell_us"])
                    for r in got.to_pylist()}
        assert rows_out == {"a": (1, 15), "b": (1, 5)}

    def test_oracle_parity_random(self, ray_session, tmp_path):
        rng = np.random.default_rng(29)
        rows = [(i, int(rng.integers(0, 100_000)),
                 int(rng.integers(0, 20)),
                 rng.choice(["a", "b", "c"]), 0.0) for i in range(900)]
        _events(tmp_path, rows)
        got = _table(QUERIES["dwell_time"][0](str(tmp_path)))
        want = _oracle(tmp_path, QUERIES["dwell_time"][1])
        assert _sorted_rows(got) == _sorted_rows(want)


class TestMedianGapPerUser:
    def test_lower_median(self, ray_session, tmp_path):
        # u1 gaps {10, 20, 40, 1000}: even n -> LOWER median 20.
        # u2 gaps {7}: median 7. u3 single event -> no row.
        rows = [(0, 0, 1, "a", 0.0), (1, 10, 1, "a", 0.0),
                (2, 30, 1, "a", 0.0), (3, 70, 1, "a", 0.0),
                (4, 1070, 1, "a", 0.0),
                (5, 0, 2, "a", 0.0), (6, 7, 2, "a", 0.0),
                (7, 5, 3, "a", 0.0)]
        _events(tmp_path, rows)
        got = _table(QUERIES["median_gap_per_user"][0](str(tmp_path)))
        rows_out = sorted((r["user_id"], r["n_gaps"],
                           r["median_gap_us"])
                          for r in got.to_pylist())
        assert rows_out == [(1, 4, 20), (2, 1, 7)]

    def test_oracle_parity_random(self, ray_session, tmp_path):
        rng = np.random.default_rng(31)
        rows = [(i, int(rng.integers(0, 1_000_000)),
                 int(rng.integers(0, 30)), "a", 0.0)
                for i in range(800)]
        _events(tmp_path, rows)
        got = _table(QUERIES["median_gap_per_user"][0](str(tmp_path)))
        want = _oracle(tmp_path, QUERIES["median_gap_per_user"][1])
        assert _sorted_rows(got) == _sorted_rows(want)
