"""Round-44 operators: rank_topk_ties (RANK ≤ k retrieval keeping
boundary ties) and tool_triples (set-based frequent triple mining).
Value assertions beyond the gate: boundary-tie inclusion where
ROW_NUMBER would cut, the under-k and all-ties edge groups, a
hand-known conversation triple, and random oracle parity for both.
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
    """rows: (event_id, user_id, event_type)."""
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


class TestRankTopkTies:
    def test_boundary_ties_kept(self, ray_session, tmp_path):
        rows, eid = [], 0
        # type 'a': u1×5 u2×4 u3×3 u4×3 u5×2 → RANK ≤3 keeps u1-u4
        for u, n in [(1, 5), (2, 4), (3, 3), (4, 3), (5, 2)]:
            for _ in range(n):
                rows.append((eid, u, "a")); eid += 1
        # type 'b': only two users → both rank ≤ 2, all kept
        rows += [(eid, 1, "b"), (eid + 1, 2, "b")]
        eid += 2
        # type 'c': all-ties → everyone rank 1, all kept
        rows += [(eid, 7, "c"), (eid + 1, 8, "c"), (eid + 2, 9, "c"),
                 (eid + 3, 10, "c")]
        _events(tmp_path, rows)
        got = _table(QUERIES["rank_topk_ties"][0](str(tmp_path)))
        keep = {(x["event_type"], x["user_id"]): x["n_events"]
                for x in got.to_pylist()}
        assert keep == {("a", 1): 5, ("a", 2): 4, ("a", 3): 3,
                        ("a", 4): 3, ("b", 1): 1, ("b", 2): 1,
                        ("c", 7): 1, ("c", 8): 1, ("c", 9): 1,
                        ("c", 10): 1}

    def test_oracle_parity_random(self, ray_session, tmp_path):
        rng = np.random.default_rng(441)
        types = ["a", "b", "c"]
        rows = [(i, int(rng.integers(0, 30)),
                 types[int(rng.integers(0, 3))])
                for i in range(5000)]
        _events(tmp_path, rows)
        got = _table(QUERIES["rank_topk_ties"][0](str(tmp_path)))
        want = _oracle(tmp_path, QUERIES["rank_topk_ties"][1])
        assert _sorted_rows(got) == _sorted_rows(want)
        # every type keeps at least 3 rows (≥3 users per type here)
        ets = [x["event_type"] for x in got.to_pylist()]
        for t in types:
            assert ets.count(t) >= 3


class TestToolTriples:
    def test_hand_triple(self, ray_session, tmp_path):
        # user 1: click/view/purchase → tools search/browser/db →
        # exactly one triple; user 2 has only two tools → none.
        # event_ids avoid the %37==0 tool-x override.
        rows = [(1, 1, "click"), (2, 1, "view"), (3, 1, "purchase"),
                (4, 2, "click"), (5, 2, "view")]
        _events(tmp_path, rows)
        got = _table(QUERIES["tool_triples"][0](str(tmp_path)))
        assert got.to_pylist() == [{"tool_a": "browser",
                                    "tool_b": "db",
                                    "tool_c": "search",
                                    "n_convs": 1}]

    def test_oracle_parity_random(self, ray_session, tmp_path):
        rng = np.random.default_rng(443)
        types = ["click", "view", "purchase", "signup", "error"]
        rows = [(i, int(rng.integers(0, 25)),
                 types[int(rng.integers(0, 5))])
                for i in range(4000)]
        _events(tmp_path, rows)
        got = _table(QUERIES["tool_triples"][0](str(tmp_path)))
        want = _oracle(tmp_path, QUERIES["tool_triples"][1])
        assert _sorted_rows(got) == _sorted_rows(want)
        assert got.num_rows > 0
        # unordered-triple canonical form: strictly increasing names
        for x in got.to_pylist():
            assert x["tool_a"] < x["tool_b"] < x["tool_c"]
