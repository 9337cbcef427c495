"""Round-24 operators: type_trigrams (three-step journey counts) and
trimmed_mean (exact interquartile mean from histogram partials). Value
assertions beyond the gate: hand-built trigram sequences with user
boundaries and ties, k=0 small groups, duplicate-heavy trim cuts, and
brute-force trim parity.
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


class TestTypeTrigrams:
    def test_hand_sequences(self, ray_session, tmp_path):
        # u1: a,b,c,a -> (a,b,c), (b,c,a); u2: x,y -> none
        rows = [(0, 10, 1, "a", 1.0), (1, 20, 1, "b", 1.0),
                (2, 30, 1, "c", 1.0), (3, 40, 1, "a", 1.0),
                (4, 10, 2, "x", 1.0), (5, 20, 2, "y", 1.0)]
        _events(tmp_path, rows)
        got = _table(QUERIES["type_trigrams"][0](str(tmp_path)))
        tri = {(r["t1"], r["t2"], r["t3"]): r["n"]
               for r in got.to_pylist()}
        assert tri == {("a", "b", "c"): 1, ("b", "c", "a"): 1}

    def test_oracle_parity_random_ties(self, ray_session, tmp_path):
        rng = np.random.default_rng(131)
        rows = [(i, int(rng.integers(0, 40)) * 1000,
                 int(rng.integers(0, 25)),
                 list("abcd")[int(rng.integers(0, 4))], 1.0)
                for i in range(3000)]
        _events(tmp_path, rows)
        got = _table(QUERIES["type_trigrams"][0](str(tmp_path)))
        want = _oracle(tmp_path, QUERIES["type_trigrams"][1])
        assert _sorted_rows(got) == _sorted_rows(want)


class TestTrimmedMean:
    def test_small_group_k0(self, ray_session, tmp_path):
        # n=3 -> k=0 -> everything kept
        rows = [(0, 0, 1, "a", 1.0), (1, 1, 1, "a", 2.0),
                (2, 2, 1, "a", 3.0)]
        _events(tmp_path, rows)
        got = _table(QUERIES["trimmed_mean"][0](str(tmp_path)))
        r = got.to_pylist()[0]
        assert r == {"event_type": "a", "n": 3, "kept_n": 3,
                     "kept_sum": 600}

    def test_brute_force_duplicates(self, ray_session, tmp_path):
        rng = np.random.default_rng(137)
        vals = rng.choice([0.10, 0.10, 0.10, 0.50, 2.00, 2.00, 9.00],
                          size=999)
        rows = [(i, i, 1, "a", float(v)) for i, v in enumerate(vals)]
        _events(tmp_path, rows)
        got = _table(QUERIES["trimmed_mean"][0](str(tmp_path)))
        r = got.to_pylist()[0]
        c = np.sort(np.floor(vals * 100).astype(np.int64))
        k = len(c) // 4
        kept = c[k:len(c) - k]
        assert r["kept_n"] == len(kept)
        assert r["kept_sum"] == int(kept.sum())

    def test_oracle_parity_random(self, ray_session, tmp_path):
        rng = np.random.default_rng(139)
        rows = [(i, i, 1, ["a", "b", "c"][int(rng.integers(0, 3))],
                 float(rng.uniform(-2, 70))) for i in range(4000)]
        _events(tmp_path, rows)
        got = _table(QUERIES["trimmed_mean"][0](str(tmp_path)))
        want = _oracle(tmp_path, QUERIES["trimmed_mean"][1])
        assert _sorted_rows(got) == _sorted_rows(want)
