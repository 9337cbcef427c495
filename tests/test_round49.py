"""Round-49 operator: repeat_collapse (journald-style consecutive
duplicate compression). Value assertions: planted adjacent repeats
collapse with the FIRST turn kept, null texts join a run (IS NOT
DISTINCT FROM semantics), runs never span conversations, and the
compressed stream conserves total turns.
"""
import datetime

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq

from raybeats.queries import QUERIES


def _us(i):
    return int(datetime.datetime(2024, 1, 1,
                                 tzinfo=datetime.timezone.utc)
               .timestamp() * 1_000_000) + i * 1_000_000


def _events(tmp_path, rows):
    """rows: (event_id, user_id, props_or_None); event_type fixed so
    event_id % 10 in (8, 9) renders text = props verbatim."""
    t = pa.table({
        "event_id": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array([_us(r[0]) for r in rows], pa.int64())
        .cast(pa.timestamp("us")),
        "user_id": pa.array([r[1] for r in rows], pa.int64()),
        "event_type": pa.array(["click"] * len(rows), pa.string()),
        "value": pa.array([1.0] * len(rows), pa.float64()),
        "props": pa.array([r[2] for r in rows], pa.string())})
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


class TestRepeatCollapse:
    def test_planted_runs(self, ray_session, tmp_path):
        rows = [
            (8, 1, "A"), (9, 1, "A"),       # run of 2, first turn 8
            (18, 1, None), (19, 1, None),   # null run of 2 (joins)
            (28, 1, "B"),                   # singleton
            (38, 2, "B"), (39, 2, "B")]     # other conv: its own run
        _events(tmp_path, rows)
        got = _table(QUERIES["repeat_collapse"][0](str(tmp_path)))
        r = {(x["conv_id"], x["turn_idx"]): (x["text"], x["n_times"])
             for x in got.to_pylist()}
        c1, c2 = "conv-00000001", "conv-00000002"
        assert r == {(c1, 8): ("A", 2), (c1, 18): (None, 2),
                     (c1, 28): ("B", 1), (c2, 38): ("B", 2)}
        # compression conserves the turn total
        assert sum(x["n_times"] for x in got.to_pylist()) == len(rows)

    def test_oracle_parity_planted(self, ray_session, tmp_path):
        import numpy as np
        rng = np.random.default_rng(491)
        rows = []
        for i in range(2000):
            # %10 ∈ {8,9} keeps text=props; small value pool plants
            # plenty of genuine adjacent repeats
            eid = i * 10 + int(rng.integers(8, 10))
            rows.append((eid, int(rng.integers(0, 12)),
                         None if rng.random() < 0.1 else
                         f"v{int(rng.integers(0, 3))}"))
        _events(tmp_path, rows)
        got = _table(QUERIES["repeat_collapse"][0](str(tmp_path)))
        con = duckdb.connect()
        con.execute(f"CREATE VIEW events AS SELECT * FROM "
                    f"'{tmp_path}/events.parquet'")
        want = con.execute(QUERIES["repeat_collapse"][1]).arrow()
        assert _sorted_rows(got) == _sorted_rows(want)
        assert any(x["n_times"] > 1 for x in got.to_pylist())
