"""Round-45 operators: role_tool_list (ordered DISTINCT string agg)
and turn_len_by_role (grouped codepoint-length profile). Value
assertions beyond the gate: sorted-distinct list content, codepoint
(not byte) counting on multi-byte text, and random oracle parity.
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
    """rows: (event_id, user_id, event_type, props)."""
    t = pa.table({
        "event_id": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array([_us(r[0]) for r in rows], pa.int64())
        .cast(pa.timestamp("us")),
        "user_id": pa.array([r[1] for r in rows], pa.int64()),
        "event_type": pa.array([r[2] for r in rows], pa.string()),
        "value": pa.array([1.0] * len(rows), pa.float64()),
        "props": pa.array([r[3] for r in rows], pa.string())})
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


class TestRoleToolList:
    def test_sorted_distinct(self, ray_session, tmp_path):
        # ids avoid %37==0; duplicates of (role, tool) collapse
        rows = [(1, 1, "click", "{}"), (2, 1, "view", "{}"),
                (3, 2, "click", "{}"), (4, 2, "purchase", "{}"),
                (5, 3, "signup", "{}")]
        _events(tmp_path, rows)
        got = _table(QUERIES["role_tool_list"][0](str(tmp_path)))
        r = {x["role"]: x["tools"] for x in got.to_pylist()}
        assert r == {"user": "browser,search", "assistant": "db",
                     "system": ""}

    def test_oracle_parity_random(self, ray_session, tmp_path):
        rng = np.random.default_rng(451)
        types = ["click", "view", "purchase", "signup", "error"]
        rows = [(i, int(rng.integers(0, 25)),
                 types[int(rng.integers(0, 5))], "{}")
                for i in range(3000)]
        _events(tmp_path, rows)
        got = _table(QUERIES["role_tool_list"][0](str(tmp_path)))
        want = _oracle(tmp_path, QUERIES["role_tool_list"][1])
        assert _sorted_rows(got) == _sorted_rows(want)
        for x in got.to_pylist():  # lists stay sorted & distinct
            parts = x["tools"].split(",")
            assert parts == sorted(set(parts))


class TestTurnLenByRole:
    def test_codepoint_lengths(self, ray_session, tmp_path):
        # event_id % 10 == 8 → text = props verbatim; é/字 are one
        # codepoint each (2/3 bytes) — lengths must count codepoints
        rows = [(8, 1, "click", "ééé"),        # user, 3 chars
                (18, 1, "click", "字字"),       # user, 2 chars
                (28, 2, "purchase", "abcd")]    # assistant, 4 chars
        _events(tmp_path, rows)
        got = _table(QUERIES["turn_len_by_role"][0](str(tmp_path)))
        r = {x["role"]: (x["n_turns"], x["total_chars"],
                         x["max_chars"]) for x in got.to_pylist()}
        assert r == {"user": (2, 5, 3), "assistant": (1, 4, 4)}

    def test_oracle_parity_random(self, ray_session, tmp_path):
        rng = np.random.default_rng(453)
        types = ["click", "view", "purchase", "signup", "error"]
        rows = [(i, int(rng.integers(0, 25)),
                 types[int(rng.integers(0, 5))],
                 '{"k": %d}' % int(rng.integers(0, 100)))
                for i in range(3000)]
        _events(tmp_path, rows)
        got = _table(QUERIES["turn_len_by_role"][0](str(tmp_path)))
        want = _oracle(tmp_path, QUERIES["turn_len_by_role"][1])
        assert _sorted_rows(got) == _sorted_rows(want)
        assert got.num_rows >= 4
