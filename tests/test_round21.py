"""Round-21 operators: last_buy_carry (LOCF imputation over a sparse
observation subset) and systematic_sample (every-Nth in global order).
Value assertions beyond the gate: NULL-before-first-observation,
cross-user isolation of the carried value, NaN observations skipped,
and exact stride coverage including slice-boundary crossings.
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


class TestLastBuyCarry:
    def test_carry_semantics(self, ray_session, tmp_path):
        # u1: view(no obs), buy 2.00, view, buy NaN(skipped), cart
        # u2: buy 5.00 only at the end -> earlier rows NULL
        rows = [(0, 10, 1, "view", 9.0), (1, 20, 1, "purchase", 2.0),
                (2, 30, 1, "view", 9.0), (3, 40, 1, "purchase", float("nan")),
                (4, 50, 1, "cart", 9.0),
                (5, 10, 2, "view", 9.0), (6, 20, 2, "purchase", 5.0)]
        _events(tmp_path, rows)
        got = _table(QUERIES["last_buy_carry"][0](str(tmp_path)))
        carry = {r["event_id"]: r["last_buy_cents"]
                 for r in got.to_pylist()}
        assert carry == {0: None, 1: 200, 2: 200, 3: 200, 4: 200,
                         5: None, 6: 500}

    def test_oracle_parity_random(self, ray_session, tmp_path):
        rng = np.random.default_rng(91)
        types = ["view", "cart", "purchase"]
        rows = [(i, int(rng.integers(0, 100_000)),
                 int(rng.integers(0, 30)),
                 types[int(rng.integers(0, 3))],
                 float(rng.uniform(0, 80))) for i in range(4000)]
        _events(tmp_path, rows)
        got = _table(QUERIES["last_buy_carry"][0](str(tmp_path)))
        want = _oracle(tmp_path, QUERIES["last_buy_carry"][1])
        assert _sorted_rows(got) == _sorted_rows(want)


class TestSystematicSample:
    def test_exact_stride(self, ray_session, tmp_path):
        # 350 rows, ts == index -> positions 1,101,201,301
        rows = [(i, i, 1, "a", 1.0) for i in range(350)]
        _events(tmp_path, rows)
        got = _table(QUERIES["systematic_sample"][0](str(tmp_path)))
        out = sorted((r["pos"], r["event_id"]) for r in got.to_pylist())
        assert out == [(1, 0), (101, 100), (201, 200), (301, 300)]

    def test_oracle_parity_random_ties(self, ray_session, tmp_path):
        rng = np.random.default_rng(97)
        # heavy ts ties force the event_id tiebreak across slices
        rows = [(i, int(rng.integers(0, 37)) * 1_000_000,
                 1, "a", 1.0) for i in range(5000)]
        _events(tmp_path, rows)
        got = _table(QUERIES["systematic_sample"][0](str(tmp_path)))
        want = _oracle(tmp_path, QUERIES["systematic_sample"][1])
        assert _sorted_rows(got) == _sorted_rows(want)
        assert got.num_rows == 50
