"""Round-41 operators: time_to_third_purchase (nth-milestone latency)
and tools_per_role (flagship grouped distinct). Value assertions
beyond the gate: users with <3 purchases excluded, the anchor is the
first event of ANY type, and per-role distinct sums.
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


class TestTimeToThirdPurchase:
    def test_anchor_and_exclusion(self, ray_session, tmp_path):
        # u1: view@10 anchors; purchases at 20,30,40 -> lag 30
        # u2: only 2 purchases -> excluded
        rows = [(0, 10, 1, "view", 1.0), (1, 20, 1, "purchase", 1.0),
                (2, 30, 1, "purchase", 1.0),
                (3, 40, 1, "purchase", 1.0),
                (4, 0, 2, "purchase", 1.0), (5, 9, 2, "purchase", 1.0)]
        _events(tmp_path, rows)
        got = _table(QUERIES["time_to_third_purchase"][0](
            str(tmp_path)))
        assert got.to_pylist() == [{"user_id": 1, "lag_us": 30}]

    def test_oracle_parity_random(self, ray_session, tmp_path):
        rng = np.random.default_rng(281)
        types = ["view", "purchase"]
        rows = [(i, int(rng.integers(0, 100_000)),
                 int(rng.integers(0, 25)),
                 types[int(rng.integers(0, 2))], 1.0)
                for i in range(3000)]
        _events(tmp_path, rows)
        got = _table(QUERIES["time_to_third_purchase"][0](
            str(tmp_path)))
        want = _oracle(tmp_path, QUERIES["time_to_third_purchase"][1])
        assert _sorted_rows(got) == _sorted_rows(want)
        assert all(r["lag_us"] >= 0 for r in got.to_pylist())


class TestToolsPerRole:
    def test_oracle_parity_sf(self, ray_session):
        sf = "/root/testdata/sf0.001"
        got = _table(QUERIES["tools_per_role"][0](sf))
        con = duckdb.connect()
        con.execute(f"CREATE VIEW events AS SELECT * FROM "
                    f"'{sf}/events.parquet'")
        want = con.execute(QUERIES["tools_per_role"][1]).arrow()
        assert _sorted_rows(got) == _sorted_rows(want)
        assert got.num_rows >= 3
