"""Round-16 operators: nested_quantiles, power_iter,
source_vocab_overlap, customers_full_coverage. Value assertions beyond
the DuckDB gate: two-level order-statistic selection, exact quantized
matrix-vector arithmetic, group-set Jaccard counts (absent pairs stay
absent), and universal-quantifier division semantics.
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


def _documents(tmp_path, rows):
    t = pa.table({
        "doc_id": pa.array([r[0] for r in rows], pa.int64()),
        "text": pa.array([r[1] for r in rows], pa.string()),
        "lang": pa.array(["en"] * len(rows), pa.string()),
        "source": pa.array([r[2] for r in rows], pa.string()),
        "n_chars": pa.array([len(r[1]) for r in rows], pa.int64())})
    pq.write_table(t, tmp_path / "documents.parquet")


def _embeddings(tmp_path, vecs):
    t = pa.table({
        "vec_id": pa.array(range(len(vecs)), pa.int64()),
        "embedding": pa.array(vecs, pa.list_(pa.float32())),
        "label": pa.array([0] * len(vecs), pa.int32())})
    pq.write_table(t, tmp_path / "embeddings.parquet")


def _orders(tmp_path, rows):
    t = pa.table({
        "o_orderkey": pa.array([r[0] for r in rows], pa.int64()),
        "o_custkey": pa.array([r[1] for r in rows], pa.int64()),
        "o_orderstatus": pa.array(["O"] * len(rows), pa.string()),
        "o_totalprice": pa.array([1.0] * len(rows), pa.float64()),
        "o_orderdate": pa.array([0] * len(rows), pa.int64())
        .cast(pa.timestamp("us")),
        "o_orderpriority": pa.array([r[2] for r in rows], pa.string())})
    pq.write_table(t, tmp_path / "orders.parquet")


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


class TestNestedQuantiles:
    def test_two_level_selection(self, ray_session, tmp_path):
        # 10 values per user -> ceil(0.95*10) = 10 -> per-user p95 is
        # the user's MAX; maxes 5, 7, 9 -> median of users = 7,
        # p95 of users = ceil(0.95*3) = 3rd = 9
        rows = []
        eid = 0
        for u, mx in [(1, 5), (2, 7), (3, 9)]:
            for i in range(10):
                v = mx if i == 9 else 0
                rows.append((eid, eid, u, "a", v / 100.0))
                eid += 1
        _events(tmp_path, rows)
        got = _table(QUERIES["nested_quantiles"][0](str(tmp_path)))
        r = got.to_pylist()[0]
        assert r == {"n_users": 3, "med_user_p95": 7,
                     "p95_user_p95": 9}

    def test_oracle_parity_random(self, ray_session, tmp_path):
        rng = np.random.default_rng(111)
        rows = [(i, i, int(rng.integers(0, 30)), "a",
                 float(rng.normal(40, 15))) for i in range(3000)]
        _events(tmp_path, rows)
        got = _table(QUERIES["nested_quantiles"][0](str(tmp_path)))
        want = _oracle(tmp_path, QUERIES["nested_quantiles"][1])
        assert _sorted_rows(got) == _sorted_rows(want)


class TestPowerIter:
    def test_hand_matrix_vector(self, ray_session, tmp_path):
        # X = [[1,0],[1,1]] quantized 1e6: s = X@1 = [1e6, 2e6];
        # y = X^T s = [3e12, 2e12]
        _embeddings(tmp_path, [[1.0, 0.0], [1.0, 1.0]])
        got = _table(QUERIES["power_iter"][0](str(tmp_path)))
        d = {r["idx"]: r["y"] for r in got.to_pylist()}
        assert d == {1: 3_000_000_000_000, 2: 2_000_000_000_000}

    def test_oracle_parity_random(self, ray_session, tmp_path):
        rng = np.random.default_rng(112)
        vecs = [[float(x) for x in rng.normal(0, 1, size=8)]
                for _ in range(200)]
        _embeddings(tmp_path, vecs)
        got = _table(QUERIES["power_iter"][0](str(tmp_path)))
        want = _oracle(tmp_path, QUERIES["power_iter"][1],
                       tables=("embeddings",))
        assert _sorted_rows(got) == _sorted_rows(want)


class TestSourceVocabOverlap:
    def test_counts_and_absent_pairs(self, ray_session, tmp_path):
        _documents(tmp_path, [(1, "aa bb cc", "A"),
                              (2, "bb cc dd", "B"),
                              (3, "xx", "C")])
        got = _table(QUERIES["source_vocab_overlap"][0](str(tmp_path)))
        rows = got.to_pylist()
        # only (A, B) share tokens; C pairs are absent (inter = 0)
        assert rows == [{"src_a": "A", "src_b": "B",
                         "inter": 2, "uni": 4}]

    def test_within_source_dups_count_once(self, ray_session,
                                           tmp_path):
        # token repeated across docs of one source counts once in the
        # vocab set
        _documents(tmp_path, [(1, "aa aa bb", "A"), (2, "aa", "A"),
                              (3, "aa", "B")])
        got = _table(QUERIES["source_vocab_overlap"][0](str(tmp_path)))
        assert got.to_pylist() == [{"src_a": "A", "src_b": "B",
                                    "inter": 1, "uni": 2}]

    def test_oracle_parity_random(self, ray_session, tmp_path):
        rng = np.random.default_rng(113)
        vocab = [f"w{i}" for i in range(40)]
        rows = [(i, " ".join(rng.choice(vocab,
                                        size=rng.integers(2, 15))),
                 f"s{int(rng.integers(0, 6))}") for i in range(400)]
        _documents(tmp_path, rows)
        got = _table(QUERIES["source_vocab_overlap"][0](str(tmp_path)))
        want = _oracle(tmp_path, QUERIES["source_vocab_overlap"][1],
                       tables=("documents",))
        assert _sorted_rows(got) == _sorted_rows(want)


class TestCustomersFullCoverage:
    def test_forall_semantics(self, ray_session, tmp_path):
        # global priorities {P1, P2}: cust 1 covers both, cust 2 only
        # P1 (twice — repeats don't help), cust 3 only P2
        _orders(tmp_path, [(0, 1, "P1"), (1, 1, "P2"), (2, 2, "P1"),
                           (3, 2, "P1"), (4, 3, "P2")])
        got = _table(QUERIES["customers_full_coverage"][0](
            str(tmp_path)))
        assert got.column("o_custkey").to_pylist() == [1]

    def test_oracle_parity_random(self, ray_session, tmp_path):
        rng = np.random.default_rng(114)
        rows = [(i, int(rng.integers(0, 50)),
                 f"P{int(rng.integers(0, 4))}") for i in range(1000)]
        _orders(tmp_path, rows)
        got = _table(QUERIES["customers_full_coverage"][0](
            str(tmp_path)))
        want = _oracle(tmp_path, QUERIES["customers_full_coverage"][1],
                       tables=("orders",))
        assert _sorted_rows(got) == _sorted_rows(want)
