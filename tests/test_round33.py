"""Round-33 operators: type_run_lengths (same-type run histogram),
daily_peak_share (per-day busiest-hour concentration),
container_profile (part-dimension rollup). Value assertions beyond the
gate: runs broken by user change AND type change (not time gaps),
peak tie-to-smallest-hour, and share totals conservation.
"""
import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from raybeats.queries import QUERIES

HOUR = 3_600_000_000


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


class TestTypeRunLengths:
    def test_hand_runs(self, ray_session, tmp_path):
        # u1: a,a,b,a -> runs 2,1,1; u2: a -> run 1 (user change
        # breaks even though type continues)
        rows = [(0, 0, 1, "a", 1.0), (1, 1, 1, "a", 1.0),
                (2, 2, 1, "b", 1.0), (3, 3, 1, "a", 1.0),
                (4, 0, 2, "a", 1.0)]
        _events(tmp_path, rows)
        got = _table(QUERIES["type_run_lengths"][0](str(tmp_path)))
        hist = {r["run_len"]: r["n_runs"] for r in got.to_pylist()}
        assert hist == {2: 1, 1: 3}

    def test_oracle_parity_random(self, ray_session, tmp_path):
        rng = np.random.default_rng(229)
        rows = [(i, int(rng.integers(0, 10_000)),
                 int(rng.integers(0, 20)),
                 ["a", "b"][int(rng.integers(0, 2))], 1.0)
                for i in range(3000)]
        _events(tmp_path, rows)
        got = _table(QUERIES["type_run_lengths"][0](str(tmp_path)))
        want = _oracle(tmp_path, QUERIES["type_run_lengths"][1])
        assert _sorted_rows(got) == _sorted_rows(want)


class TestDailyPeakShare:
    def test_tie_and_conservation(self, ray_session, tmp_path):
        # day 0: hours 3 and 7 tie at 2 -> pick 3; total 5
        rows = [(0, 3 * HOUR, 1, "a", 1.0), (1, 3 * HOUR, 1, "a", 1.0),
                (2, 7 * HOUR, 1, "a", 1.0), (3, 7 * HOUR, 1, "a", 1.0),
                (4, 9 * HOUR, 1, "a", 1.0)]
        _events(tmp_path, rows)
        got = _table(QUERIES["daily_peak_share"][0](str(tmp_path)))
        r = got.to_pylist()[0]
        assert (r["peak_hour"], r["peak_n"], r["day_total"]) == (3, 2, 5)

    def test_oracle_parity_random(self, ray_session, tmp_path):
        rng = np.random.default_rng(233)
        rows = [(i, int(rng.integers(0, 10 * 24)) * HOUR
                 + int(rng.integers(0, 100)), 1, "a", 1.0)
                for i in range(4000)]
        _events(tmp_path, rows)
        got = _table(QUERIES["daily_peak_share"][0](str(tmp_path)))
        want = _oracle(tmp_path, QUERIES["daily_peak_share"][1])
        assert _sorted_rows(got) == _sorted_rows(want)
        assert all(r["peak_n"] <= r["day_total"]
                   for r in got.to_pylist())


class TestContainerProfile:
    def test_oracle_parity_sf(self, ray_session):
        sf = "/root/testdata/sf0.001"
        got = _table(QUERIES["container_profile"][0](sf))
        con = duckdb.connect()
        con.execute(f"CREATE VIEW part AS SELECT * FROM "
                    f"'{sf}/part.parquet'")
        want = con.execute(QUERIES["container_profile"][1]).arrow()
        assert _sorted_rows(got) == _sorted_rows(want)
        assert got.num_rows > 1
