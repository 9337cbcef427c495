"""Round-38 operators: tool_switches (within-conversation tool churn)
and props_value_histogram (decode_json_fields → aggregate
composition). Value assertions beyond the gate: first-turn never
counts as a switch, per-conv isolation, and malformed-JSON rows
excluded on both engines.
"""
import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from raybeats.queries import QUERIES


def _events(tmp_path, rows, props=None):
    t = pa.table({
        "event_id": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array([r[1] for r in rows], pa.int64())
        .cast(pa.timestamp("us")),
        "user_id": pa.array([r[2] for r in rows], pa.int64()),
        "event_type": pa.array([r[3] for r in rows], pa.string()),
        "value": pa.array([r[4] for r in rows], pa.float64()),
        "props": pa.array(props or ["{}"] * len(rows), pa.string())})
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


class TestToolSwitches:
    def test_oracle_parity_sf(self, ray_session):
        sf = "/root/testdata/sf0.001"
        got = _table(QUERIES["tool_switches"][0](sf))
        con = duckdb.connect()
        con.execute(f"CREATE VIEW events AS SELECT * FROM "
                    f"'{sf}/events.parquet'")
        want = con.execute(QUERIES["tool_switches"][1]).arrow()
        assert _sorted_rows(got) == _sorted_rows(want)
        # conservation: conv count equals corpus conversations
        from raybeats.transcripts import read_transcripts
        convs = set()
        for b in read_transcripts(sf).iter_batches(
                batch_format="pyarrow"):
            convs.update(b.column("conv_id").to_pylist())
        assert sum(r["n_convs"] for r in got.to_pylist()) == len(convs)

    def test_single_turn_conv_zero(self, ray_session, tmp_path):
        # one turn -> 0 switches; two turns same tool -> 0;
        # two turns different tool -> 1 (event types map to tools:
        # click->search, view->browser)
        rows = [(0, 0, 1, "click", 1.0), (1, 1, 1, "view", 1.0),
                (2, 0, 2, "click", 1.0), (3, 1, 2, "click", 1.0),
                (4, 0, 3, "click", 1.0)]
        _events(tmp_path, rows)
        got = _table(QUERIES["tool_switches"][0](str(tmp_path)))
        hist = {r["n_switches"]: r["n_convs"] for r in got.to_pylist()}
        assert hist == {1: 1, 0: 2}


class TestPropsValueHistogram:
    def test_malformed_excluded(self, ray_session, tmp_path):
        rows = [(i, i, 1, "a", 1.0) for i in range(6)]
        props = ['{"k": 3}', '{"k": 3}', '{"k": 7}', "not json",
                 '{"other": 1}', "{}"]
        _events(tmp_path, rows, props)
        got = _table(QUERIES["props_value_histogram"][0](str(tmp_path)))
        assert {r["k"]: r["n"] for r in got.to_pylist()} == {3: 2, 7: 1}

    def test_oracle_parity_sf(self, ray_session):
        sf = "/root/testdata/sf0.001"
        got = _table(QUERIES["props_value_histogram"][0](sf))
        con = duckdb.connect()
        con.execute(f"CREATE VIEW events AS SELECT * FROM "
                    f"'{sf}/events.parquet'")
        want = con.execute(QUERIES["props_value_histogram"][1]).arrow()
        assert _sorted_rows(got) == _sorted_rows(want)
