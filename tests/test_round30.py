"""Round-30 operators: repurchase_gaps (consecutive-purchase interval
histogram) and behavior_twins (day-set equality classes). Value
assertions beyond the gate: cross-type events never break a purchase
chain, and twin classes discriminate (identical vs off-by-one day
sets).
"""
import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from raybeats.queries import QUERIES

DAY = 86_400_000_000


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


class TestRepurchaseGaps:
    def test_views_dont_break_chain(self, ray_session, tmp_path):
        # u1 purchases at day 0 and day 5 with views between: ONE gap
        # of 5 days, views invisible to the purchase LAG
        rows = [(0, 0, 1, "purchase", 1.0),
                (1, 1 * DAY, 1, "view", 1.0),
                (2, 3 * DAY, 1, "view", 1.0),
                (3, 5 * DAY, 1, "purchase", 1.0)]
        _events(tmp_path, rows)
        got = _table(QUERIES["repurchase_gaps"][0](str(tmp_path)))
        assert {r["days"]: r["n"] for r in got.to_pylist()} == {5: 1}

    def test_oracle_parity_random(self, ray_session, tmp_path):
        rng = np.random.default_rng(199)
        types = ["view", "purchase"]
        rows = [(i, int(rng.integers(0, 60)) * DAY
                 + int(rng.integers(0, 1000)),
                 int(rng.integers(0, 25)),
                 types[int(rng.integers(0, 2))], 1.0)
                for i in range(3000)]
        _events(tmp_path, rows)
        got = _table(QUERIES["repurchase_gaps"][0](str(tmp_path)))
        want = _oracle(tmp_path, QUERIES["repurchase_gaps"][1])
        assert _sorted_rows(got) == _sorted_rows(want)


class TestBehaviorTwins:
    def test_discriminates_day_sets(self, ray_session, tmp_path):
        # u1 and u2 share days {0, 2}; u3 has {0, 2, 3}; u4 has {1}
        rows = [(0, 0, 1, "a", 1.0), (1, 2 * DAY, 1, "a", 1.0),
                (2, 0, 2, "a", 1.0), (3, 2 * DAY + 5, 2, "a", 1.0),
                (4, 0, 3, "a", 1.0), (5, 2 * DAY, 3, "a", 1.0),
                (6, 3 * DAY, 3, "a", 1.0),
                (7, 1 * DAY, 4, "a", 1.0)]
        _events(tmp_path, rows)
        got = _table(QUERIES["behavior_twins"][0](str(tmp_path)))
        hist = {r["class_size"]: r["n_classes"]
                for r in got.to_pylist()}
        # one class of 2 (u1,u2), two singleton classes (u3, u4)
        assert hist == {2: 1, 1: 2}

    def test_oracle_parity_random(self, ray_session, tmp_path):
        rng = np.random.default_rng(211)
        rows = [(i, int(rng.integers(0, 6)) * DAY
                 + int(rng.integers(0, 100)),
                 int(rng.integers(0, 60)), "a", 1.0)
                for i in range(2500)]
        _events(tmp_path, rows)
        got = _table(QUERIES["behavior_twins"][0](str(tmp_path)))
        want = _oracle(tmp_path, QUERIES["behavior_twins"][1])
        assert _sorted_rows(got) == _sorted_rows(want)
        # with only 6 possible days over 60 users, twins must exist
        assert any(r["class_size"] >= 2 for r in got.to_pylist())
