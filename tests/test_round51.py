"""Round-51 operator: rule_violations (cross-event constraint
validation). Value assertions: both rule counts hand-verified
(strictly-before boundary, no-signup attribution), the clean corpus
reports explicit zeros, and random oracle parity.
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
    """rows: (event_id, user_id, event_type, ts_offset)."""
    t = pa.table({
        "event_id": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array([_us(r[3]) for r in rows], pa.int64())
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


class TestRuleViolations:
    def test_hand_rules(self, ray_session, tmp_path):
        rows = [
            # u1: signup at 10 — purchases at 5 (violation), 10 (ok,
            # strictly-before only), 20 (ok)
            (1, 1, "signup", 10), (2, 1, "purchase", 5),
            (3, 1, "purchase", 10), (4, 1, "purchase", 20),
            # u2: purchase with NO signup
            (5, 2, "purchase", 3),
            # u3: signup only — contributes nothing
            (6, 3, "signup", 1)]
        _events(tmp_path, rows)
        got = _table(QUERIES["rule_violations"][0](str(tmp_path)))
        r = {x["rule"]: x["n"] for x in got.to_pylist()}
        assert r == {"purchase_before_signup": 1,
                     "purchase_no_signup": 1}

    def test_clean_corpus_reports_zeros(self, ray_session, tmp_path):
        rows = [(1, 1, "signup", 1), (2, 1, "purchase", 2)]
        _events(tmp_path, rows)
        got = _table(QUERIES["rule_violations"][0](str(tmp_path)))
        r = {x["rule"]: x["n"] for x in got.to_pylist()}
        assert r == {"purchase_before_signup": 0,
                     "purchase_no_signup": 0}

    def test_oracle_parity_random(self, ray_session, tmp_path):
        rng = np.random.default_rng(511)
        types = ["signup", "purchase", "click"]
        rows = [(i, int(rng.integers(0, 40)),
                 types[int(rng.integers(0, 3))],
                 int(rng.integers(0, 1000)))
                for i in range(5000)]
        _events(tmp_path, rows)
        got = _table(QUERIES["rule_violations"][0](str(tmp_path)))
        con = duckdb.connect()
        con.execute(f"CREATE VIEW events AS SELECT * FROM "
                    f"'{tmp_path}/events.parquet'")
        want = con.execute(QUERIES["rule_violations"][1]).arrow()
        g = {x["rule"]: x["n"] for x in got.to_pylist()}
        w = {x["rule"]: x["n"] for x in want.to_pylist()}
        assert g == w
        assert g["purchase_before_signup"] > 0  # non-vacuous
