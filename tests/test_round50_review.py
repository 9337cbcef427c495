"""Regression tests for this session's code-review findings: null
conv_id (from null user_id events) must not crash the conv-tool set
queries or repeat_collapse, and compaction must survive a kill INSIDE
the swap window (published dir renamed aside, replacement not yet in
place) without losing rows.
"""
import datetime
import glob
import os

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq

from raybeats.pipeline import Pipeline
from raybeats.queries import QUERIES
from raybeats.state.manifest import CheckpointManifest


def _us(i):
    return int(datetime.datetime(2024, 1, 1,
                                 tzinfo=datetime.timezone.utc)
               .timestamp() * 1_000_000) + i * 1_000_000


def _events(tmp_path, rows):
    """rows: (event_id, user_id_or_None, event_type)."""
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


class TestNullConvRegression:
    def _mixed(self, tmp_path):
        # null user_id rows derive a NULL conv_id in transcripts
        rows = [(1, 1, "click"), (2, 1, "view"), (3, 1, "purchase"),
                (4, None, "click"), (5, None, "view"),
                (6, None, "purchase"), (8, 2, "click"), (9, 2, "click")]
        _events(tmp_path, rows)

    def _parity(self, tmp_path, name):
        got = _table(QUERIES[name][0](str(tmp_path)))
        con = duckdb.connect()
        con.execute(f"CREATE VIEW events AS SELECT * FROM "
                    f"'{tmp_path}/events.parquet'")
        want = con.execute(QUERIES[name][1]).arrow()
        assert _sorted_rows(got) == _sorted_rows(want)
        return got

    def test_tool_triples_null_conv(self, ray_session, tmp_path):
        self._mixed(tmp_path)
        got = self._parity(tmp_path, "tool_triples")
        # only the REAL conversation's triple counts
        assert got.to_pylist() == [{"tool_a": "browser",
                                    "tool_b": "db",
                                    "tool_c": "search", "n_convs": 1}]

    def test_tool_affinity_null_conv(self, ray_session, tmp_path):
        self._mixed(tmp_path)
        got = self._parity(tmp_path, "tool_affinity")
        r = {(x["tool_a"], x["tool_b"]): (x["n_both"], x["n_a"],
                                          x["n_b"], x["n_total"])
             for x in got.to_pylist()}
        # margins exclude the null conversation entirely
        assert r[("browser", "search")] == (1, 1, 2, 2)

    def test_repeat_collapse_null_conv(self, ray_session, tmp_path):
        self._mixed(tmp_path)
        got = self._parity(tmp_path, "repeat_collapse")
        assert all(x["conv_id"] is not None for x in got.to_pylist())


class TestCompactSwapWindowKill:
    def test_recovers_renamed_aside_dir(self, ray_session, tmp_path):
        out = str(tmp_path / "out")
        m = CheckpointManifest(out)
        d = os.path.join(out, "part=00000", "sink=a")
        os.makedirs(d)
        for i, (lo, hi) in enumerate([(0, 5), (5, 9)]):
            pq.write_table(pa.table({"x": pa.array(range(lo, hi),
                                                   pa.int64())}),
                           os.path.join(d, f"f{i}.parquet"))
        m.publish("00000", {"per_sink": {"a": 9}})
        # simulate a kill INSIDE the swap: fragments renamed aside,
        # compacted staging written but not yet moved into place
        os.rename(d, d + ".old")
        os.makedirs(d + ".staging")
        pq.write_table(pa.table({"x": pa.array(range(9), pa.int64())}),
                       os.path.join(d + ".staging",
                                    "compacted-0.parquet"))
        rep = Pipeline.compact(out)
        assert rep["compacted"] == 1 and not rep["failed"]
        assert not os.path.exists(d + ".old")
        assert not os.path.exists(d + ".staging")
        files = glob.glob(os.path.join(d, "*.parquet"))
        assert len(files) == 1
        assert sorted(pq.read_table(files[0]).column("x").to_pylist()) \
            == list(range(9))
        assert Pipeline.audit(out)["ok"]

    def test_refuses_unknown_sink_dir(self, ray_session, tmp_path):
        out = str(tmp_path / "out")
        m = CheckpointManifest(out)
        d = os.path.join(out, "part=00000", "sink=a")
        ghost = os.path.join(out, "part=00000", "sink=ghost")
        os.makedirs(d), os.makedirs(ghost)
        pq.write_table(pa.table({"x": pa.array(range(3), pa.int64())}),
                       os.path.join(d, "f0.parquet"))
        for i in range(2):
            pq.write_table(pa.table({"x": pa.array([i], pa.int64())}),
                           os.path.join(ghost, f"f{i}.parquet"))
        m.publish("00000", {"per_sink": {"a": 3}})
        rep = Pipeline.compact(out)
        assert [r["sink"] for r in rep["refused"]] == ["ghost"]
        # the unknown dir keeps its fragments untouched
        assert len(glob.glob(os.path.join(ghost, "*.parquet"))) == 2
