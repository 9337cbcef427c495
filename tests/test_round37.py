"""Round-37 operators: order_cadence (customer order-interval
histogram) and extreme_vectors (top-10 by exact quantized L2 norm).
Value assertions beyond the gate: per-customer isolation of gaps,
empty-vector handling, norm tie-break, and brute-force norm parity.
"""
import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from raybeats.queries import QUERIES

DAY = 86_400_000_000


def _orders(tmp_path, rows):
    t = pa.table({
        "o_orderkey": pa.array([r[0] for r in rows], pa.int64()),
        "o_custkey": pa.array([r[1] for r in rows], pa.int64()),
        "o_orderstatus": pa.array(["O"] * len(rows), pa.string()),
        "o_totalprice": pa.array([1.0] * len(rows), pa.float64()),
        "o_orderdate": pa.array([r[2] for r in rows], pa.int64())
        .cast(pa.timestamp("us")),
        "o_orderpriority": pa.array(["1"] * len(rows), pa.string())})
    pq.write_table(t, tmp_path / "orders.parquet")


def _embeddings(tmp_path, vecs):
    t = pa.table({
        "vec_id": pa.array(range(len(vecs)), pa.int64()),
        "embedding": pa.array(vecs, pa.list_(pa.float32())),
        "label": pa.array([0] * len(vecs), pa.int32())})
    pq.write_table(t, tmp_path / "embeddings.parquet")


def _table(res):
    if isinstance(res, pa.Table):
        return res
    return pa.concat_tables(res.iter_batches(batch_format="pyarrow"),
                            promote_options="default")


def _oracle(tmp_path, sql, tables=("orders",)):
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


class TestOrderCadence:
    def test_per_customer_isolation(self, ray_session, tmp_path):
        # c1 orders at day 0, 10; c2 at day 5 — no cross-customer gap
        rows = [(0, 1, 0), (1, 1, 10 * DAY), (2, 2, 5 * DAY)]
        _orders(tmp_path, rows)
        got = _table(QUERIES["order_cadence"][0](str(tmp_path)))
        assert {r["days"]: r["n"] for r in got.to_pylist()} == {10: 1}

    def test_oracle_parity_random(self, ray_session, tmp_path):
        rng = np.random.default_rng(263)
        rows = [(i, int(rng.integers(0, 50)),
                 int(rng.integers(0, 400)) * DAY) for i in range(2000)]
        _orders(tmp_path, rows)
        got = _table(QUERIES["order_cadence"][0](str(tmp_path)))
        want = _oracle(tmp_path, QUERIES["order_cadence"][1])
        assert _sorted_rows(got) == _sorted_rows(want)


class TestExtremeVectors:
    def test_tiebreak_and_empty(self, ray_session, tmp_path):
        vecs = [[3.0, 4.0], [4.0, 3.0], [0.1], [], [5.0]]
        _embeddings(tmp_path, vecs)
        got = _table(QUERIES["extreme_vectors"][0](str(tmp_path)))
        rows = [(r["vec_id"], r["norm_sq_q"]) for r in got.to_pylist()]
        # |v0|² == |v1|² == |v4|² at quantized scale -> ids 0,1,4 first
        assert [r[0] for r in rows[:3]] == [0, 1, 4]
        assert rows[0][1] == rows[1][1] == rows[2][1]
        assert all(r[0] != 3 for r in rows)  # empty vector excluded

    def test_brute_force_parity(self, ray_session, tmp_path):
        rng = np.random.default_rng(269)
        vecs = [[float(x) for x in rng.normal(0, 1, 16)]
                for _ in range(500)]
        _embeddings(tmp_path, vecs)
        got = _table(QUERIES["extreme_vectors"][0](str(tmp_path)))
        want = _oracle(tmp_path, QUERIES["extreme_vectors"][1],
                       tables=("embeddings",))
        assert _sorted_rows(got) == _sorted_rows(want)
        q = [np.floor(np.asarray(v, np.float64) * 1_000_000)
             .astype(np.int64) for v in vecs]
        norms = np.array([int((x * x).sum()) for x in q])
        brute_top = sorted(zip(-norms, range(len(vecs))))[:10]
        assert [i for _, i in brute_top] == \
            got.column("vec_id").to_pylist()
