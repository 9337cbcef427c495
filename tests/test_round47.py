"""Round-47 operator: tool_affinity (exact lift numerators per tool
pair). Value assertions: hand-computed margins/total, cross-bucket
margin summation via random parity, and numerator consistency
(n_both ≤ min(n_a, n_b) ≤ n_total).
"""
import datetime

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from raybeats.queries import QUERIES


def _us(i):
    return int(datetime.datetime(2024, 1, 1,
                                 tzinfo=datetime.timezone.utc)
               .timestamp() * 1_000_000) + i * 1_000_000


def _events(tmp_path, rows):
    t = pa.table({
        "event_id": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array([_us(r[0]) for r in rows], pa.int64())
        .cast(pa.timestamp("us")),
        "user_id": pa.array([r[1] for r in rows], pa.int64()),
        "event_type": pa.array([r[2] for r in rows], pa.string()),
        "value": pa.array([1.0] * len(rows), pa.float64()),
        "props": pa.array(["{}"] * len(rows), pa.string())})
    pq.write_table(t, tmp_path / "events.parquet")


def _table(res):
    if isinstance(res, pa.Table):
        return res
    return pa.concat_tables(res.iter_batches(batch_format="pyarrow"),
                            promote_options="default")


def _sorted_rows(tb):
    cols = sorted(tb.column_names)
    return sorted(
        map(tuple, zip(*[tb.column(c).to_pylist() for c in cols])),
        key=lambda r: tuple((v is None, v) for v in r))


class TestToolAffinity:
    def test_hand_numerators(self, ray_session, tmp_path):
        # user 1 (conv A): click+purchase → {search, db};
        # user 2 (conv B): click only → {search}
        rows = [(1, 1, "click"), (2, 1, "purchase"), (3, 2, "click")]
        _events(tmp_path, rows)
        got = _table(QUERIES["tool_affinity"][0](str(tmp_path)))
        assert got.to_pylist() == [{
            "tool_a": "db", "tool_b": "search", "n_both": 1,
            "n_a": 1, "n_b": 2, "n_total": 2}]

    def test_oracle_parity_random(self, ray_session, tmp_path):
        rng = np.random.default_rng(471)
        types = ["click", "view", "purchase", "signup", "error"]
        rows = [(i, int(rng.integers(0, 30)),
                 types[int(rng.integers(0, 5))])
                for i in range(4000)]
        _events(tmp_path, rows)
        got = _table(QUERIES["tool_affinity"][0](str(tmp_path)))
        con = duckdb.connect()
        con.execute(f"CREATE VIEW events AS SELECT * FROM "
                    f"'{tmp_path}/events.parquet'")
        want = con.execute(QUERIES["tool_affinity"][1]).arrow()
        assert _sorted_rows(got) == _sorted_rows(want)
        for x in got.to_pylist():
            assert 1 <= x["n_both"] <= min(x["n_a"], x["n_b"]) \
                <= x["n_total"]
