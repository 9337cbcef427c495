"""Round-10 operators: cluster_radius, vocab_per_source,
quartile_bucket, supplier_by_region, brand_revenue. Value assertions
beyond the DuckDB gate: hand-computed radii and centroid rounding,
cross-doc distinct tokens, threshold-tie bins, dangling-dimension
drops, negative-balance floor."""
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


def _embeddings(tmp_path, vecs, labels):
    t = pa.table({
        "vec_id": pa.array(range(len(vecs)), pa.int64()),
        "embedding": pa.array(vecs, pa.list_(pa.float32())),
        "label": pa.array(labels, pa.int32())})
    pq.write_table(t, tmp_path / "embeddings.parquet")


def _documents(tmp_path, rows):
    """rows: (doc_id, text, source)."""
    t = pa.table({
        "doc_id": pa.array([r[0] for r in rows], pa.int64()),
        "text": pa.array([r[1] for r in rows], pa.string()),
        "lang": pa.array(["en"] * len(rows), pa.string()),
        "source": pa.array([r[2] for r in rows], pa.string()),
        "n_chars": pa.array([len(r[1]) for r in rows], pa.int64())})
    pq.write_table(t, tmp_path / "documents.parquet")


def _table(res):
    if isinstance(res, pa.Table):
        return res
    return pa.concat_tables(res.iter_batches(batch_format="pyarrow"),
                            promote_options="default")


def _oracle(tmp_path, sql, tables):
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


class TestClusterRadius:
    def test_hand_computed(self, ray_session, tmp_path):
        # label 0: two 2-padded vectors at ±0.000001 on axis 0 →
        # quanta ±1, centroid rounds to floor(0/2+0.5)=0, radius =
        # 1² = 1. label 1: single vector → radius 0.
        d = 4
        v0 = [0.000001] + [0.0] * (d - 1)
        v1 = [-0.000001] + [0.0] * (d - 1)
        v2 = [0.5] * d
        _embeddings(tmp_path, [v0, v1, v2], [0, 0, 1])
        got = _table(QUERIES["cluster_radius"][0](str(tmp_path)))
        rows = sorted((r["label"], r["n"], r["max_sq"])
                      for r in got.to_pylist())
        assert rows == [(0, 2, 1), (1, 1, 0)]

    def test_oracle_parity_random(self, ray_session, tmp_path):
        rng = np.random.default_rng(37)
        vecs = rng.normal(0, 1, size=(60, 8)).astype(np.float32)
        labels = rng.integers(0, 4, size=60)
        _embeddings(tmp_path, vecs.tolist(), labels.tolist())
        got = _table(QUERIES["cluster_radius"][0](str(tmp_path)))
        want = _oracle(tmp_path, QUERIES["cluster_radius"][1],
                       ["embeddings"])
        assert _sorted_rows(got) == _sorted_rows(want)


class TestVocabPerSource:
    def test_distinct_across_docs(self, ray_session, tmp_path):
        # srcA: "the cat" + "THE dog!" → {the, cat, dog} = 3 (case
        # folds, punctuation splits, repeats collapse across docs).
        # srcB: "cat cat cat" → 1.
        rows = [(0, "the cat", "A"), (1, "THE dog!", "A"),
                (2, "cat cat cat", "B")]
        _documents(tmp_path, rows)
        got = _table(QUERIES["vocab_per_source"][0](str(tmp_path)))
        assert sorted((r["source"], r["vocab"])
                      for r in got.to_pylist()) == [("A", 3), ("B", 1)]

    def test_oracle_parity_random(self, ray_session, tmp_path):
        rng = np.random.default_rng(41)
        words = ["alpha", "beta", "Gamma", "delta-9", "x"]
        rows = [(i, " ".join(rng.choice(words,
                                        size=rng.integers(1, 12))),
                 f"s{int(rng.integers(0, 3))}") for i in range(300)]
        _documents(tmp_path, rows)
        got = _table(QUERIES["vocab_per_source"][0](str(tmp_path)))
        want = _oracle(tmp_path, QUERIES["vocab_per_source"][1],
                       ["documents"])
        assert _sorted_rows(got) == _sorted_rows(want)


class TestQuartileBucket:
    def test_threshold_ties(self, ray_session, tmp_path):
        # type a cents 100..800 (n=8): thresholds p25=200 (ceil(2)),
        # p50=400, p75=600. cents EQUAL to a threshold stay in the
        # lower bin (strict > comparisons).
        rows = [(i, i, 1, "a", float(i + 1)) for i in range(8)]
        _events(tmp_path, rows)
        got = _table(QUERIES["quartile_bucket"][0](str(tmp_path)))
        bins = {r["cents"]: r["bin"] for r in got.to_pylist()}
        assert bins == {100: 1, 200: 1, 300: 2, 400: 2,
                        500: 3, 600: 3, 700: 4, 800: 4}

    def test_oracle_parity_random(self, ray_session, tmp_path):
        rng = np.random.default_rng(43)
        rows = [(i, i, 1, rng.choice(["a", "b"]),
                 float(rng.normal(10, 5))) for i in range(700)]
        _events(tmp_path, rows)
        got = _table(QUERIES["quartile_bucket"][0](str(tmp_path)))
        want = _oracle(tmp_path, QUERIES["quartile_bucket"][1],
                       ["events"])
        assert _sorted_rows(got) == _sorted_rows(want)


class TestSupplierByRegion:
    def test_chain_and_dangling(self, ray_session, tmp_path):
        pq.write_table(pa.table({
            "r_regionkey": pa.array([0, 1], pa.int32()),
            "r_name": pa.array(["EAST", "WEST"], pa.string())}),
            tmp_path / "region.parquet")
        pq.write_table(pa.table({
            "n_nationkey": pa.array([10, 11], pa.int32()),
            "n_name": pa.array(["na", "nb"], pa.string()),
            "n_regionkey": pa.array([0, 1], pa.int32())}),
            tmp_path / "nation.parquet")
        # supplier 3 has a dangling nationkey -> dropped; negative
        # balance floors DOWN (-1.501 -> -151 cents)
        pq.write_table(pa.table({
            "s_suppkey": pa.array([1, 2, 3], pa.int64()),
            "s_name": pa.array(["s1", "s2", "s3"], pa.string()),
            "s_nationkey": pa.array([10, 10, 99], pa.int32()),
            "s_acctbal": pa.array([2.505, -1.501, 7.0], pa.float64())}),
            tmp_path / "supplier.parquet")
        got = _table(QUERIES["supplier_by_region"][0](str(tmp_path)))
        assert got.to_pylist() == [
            {"r_name": "EAST", "n_suppliers": 2,
             "acctbal_cents": 250 - 151}]


class TestBrandRevenue:
    def test_broadcast_join_and_dangling(self, ray_session, tmp_path):
        pq.write_table(pa.table({
            "p_partkey": pa.array([1, 2], pa.int64()),
            "p_name": pa.array(["pa", "pb"], pa.string()),
            "p_brand": pa.array(["B1", "B2"], pa.string()),
            "p_type": pa.array(["t", "t"], pa.string()),
            "p_size": pa.array([1, 1], pa.int32()),
            "p_retailprice": pa.array([1.0, 1.0], pa.float64())}),
            tmp_path / "part.parquet")
        # line 3 references a missing part -> dropped (inner join)
        pq.write_table(pa.table({
            "l_orderkey": pa.array([1, 1, 2], pa.int64()),
            "l_partkey": pa.array([1, 2, 99], pa.int64()),
            "l_extendedprice": pa.array([10.0, 20.0, 5.0],
                                        pa.float64()),
            "l_discount": pa.array([0.1, 0.0, 0.0], pa.float64())}),
            tmp_path / "lineitem.parquet")
        got = _table(QUERIES["brand_revenue"][0](str(tmp_path)))
        rows = sorted((r["p_brand"], r["revenue_cents"], r["n_items"])
                      for r in got.to_pylist())
        # 10.0 * 0.9 * 100 = 900 (floor), 20.0 * 100 = 2000
        assert rows == [("B1", 900, 1), ("B2", 2000, 1)]
