"""Round-68 operators: cluster_split (leakage-free cluster-aware
split), k_anonymity (QI equivalence-class audit), benford_digits
(leading-digit profile)."""
import pyarrow as pa
import pyarrow.parquet as pq

from raybeats.queries import QUERIES


def _table(res):
    if isinstance(res, pa.Table):
        return res
    batches = list(res.iter_batches(batch_size=None,
                                    batch_format="pyarrow"))
    if not batches:
        return pa.table({})
    return pa.concat_tables(batches, promote_options="default")


def _docs(tmp_path, rows):
    """rows: (doc_id, text)."""
    pq.write_table(pa.table({
        "doc_id": pa.array([r[0] for r in rows], pa.int64()),
        "text": pa.array([r[1] for r in rows], pa.string()),
        "lang": pa.array(["en"] * len(rows), pa.string()),
        "source": pa.array(["s"] * len(rows), pa.string()),
        "n_chars": pa.array([len(r[1]) for r in rows], pa.int64())}),
        tmp_path / "documents.parquet")


class TestClusterSplit:
    def test_cluster_members_share_split(self, ray_session, tmp_path):
        # ids 1,7,42 share text A; 2,9 share text B; 3 unique
        rows = [(1, "A"), (7, "A"), (42, "A"), (2, "B"), (9, "B"),
                (3, "C")]
        _docs(tmp_path, rows)
        out = _table(QUERIES["cluster_split"][0](str(tmp_path)))
        got = {d: (r, s) for d, r, s in zip(
            out.column("doc_id").to_pylist(),
            out.column("root_id").to_pylist(),
            out.column("split").to_pylist())}
        assert len(got) == 6
        assert got[1][0] == got[7][0] == got[42][0] == 1
        assert got[1][1] == got[7][1] == got[42][1]
        assert got[2][0] == got[9][0] == 2
        assert got[2][1] == got[9][1]
        assert got[3][0] == 3

    def test_split_matches_root_hash(self, ray_session, tmp_path):
        # the split of every member equals hash_split of the ROOT id,
        # not of the member's own id
        import numpy as np

        from raybeats.textops.curation import _mix32
        rows = [(i, f"t{i % 5}") for i in range(60)]
        _docs(tmp_path, rows)
        out = _table(QUERIES["cluster_split"][0](str(tmp_path)))
        for d, r, s in zip(out.column("doc_id").to_pylist(),
                           out.column("root_id").to_pylist(),
                           out.column("split").to_pylist()):
            assert r == d % 5  # min id of each text class
            b = int(_mix32(np.array([r], np.uint64))[0] % 100)
            want = "train" if b < 80 else ("val" if b < 90 else "test")
            assert s == want


def _customers(tmp_path, rows):
    """rows: (custkey, nationkey, acctbal, mktsegment)."""
    pq.write_table(pa.table({
        "c_custkey": pa.array([r[0] for r in rows], pa.int64()),
        "c_name": pa.array([f"c{r[0]}" for r in rows], pa.string()),
        "c_nationkey": pa.array([r[1] for r in rows], pa.int32()),
        "c_acctbal": pa.array([r[2] for r in rows], pa.float64()),
        "c_mktsegment": pa.array([r[3] for r in rows], pa.string())}),
        tmp_path / "customer.parquet")


class TestKAnonymity:
    def test_hand_values(self, ray_session, tmp_path):
        rows = ([(i, 1, 100.0, "AUTO") for i in range(12)] +   # 12 low
                [(100, 1, -5.0, "AUTO"),                        # 1 neg
                 (101, 2, 9000.0, "AUTO"),                      # small
                 (102, 2, 9500.0, "AUTO")])                     # class
        _customers(tmp_path, rows)
        out = _table(QUERIES["k_anonymity"][0](str(tmp_path)))
        got = {(n, s): (c, l, k, ld) for n, s, c, l, k, ld in zip(
            out.column("nat").to_pylist(), out.column("seg").to_pylist(),
            out.column("n").to_pylist(), out.column("l").to_pylist(),
            out.column("k_anon").to_pylist(),
            out.column("l_div").to_pylist())}
        assert got[(1, "AUTO")] == (13, 2, True, True)
        assert got[(2, "AUTO")] == (2, 1, False, False)

    def test_nulls_excluded(self, ray_session, tmp_path):
        _customers(tmp_path, [(1, 1, 10.0, "AUTO")])
        # add a null-balance row via overwrite
        t = pq.read_table(tmp_path / "customer.parquet")
        extra = pa.table({
            "c_custkey": pa.array([2], pa.int64()),
            "c_name": pa.array(["c2"], pa.string()),
            "c_nationkey": pa.array([1], pa.int32()),
            "c_acctbal": pa.array([None], pa.float64()),
            "c_mktsegment": pa.array(["AUTO"], pa.string())})
        pq.write_table(pa.concat_tables([t, extra]),
                       tmp_path / "customer.parquet")
        out = _table(QUERIES["k_anonymity"][0](str(tmp_path)))
        assert out.column("n").to_pylist() == [1]


def _orders(tmp_path, prices):
    pq.write_table(pa.table({
        "o_orderkey": pa.array(range(len(prices)), pa.int64()),
        "o_custkey": pa.array([1] * len(prices), pa.int64()),
        "o_orderstatus": pa.array(["O"] * len(prices), pa.string()),
        "o_totalprice": pa.array(prices, pa.float64()),
        "o_orderdate": pa.array([0] * len(prices), pa.int64()).cast(
            pa.timestamp("us")),
        "o_orderpriority": pa.array(["1-URGENT"] * len(prices),
                                    pa.string())}),
        tmp_path / "orders.parquet")


class TestBenfordDigits:
    def test_hand_values(self, ray_session, tmp_path):
        # digits: 1 (×3: 1.5, 123.4, 1999.99), 9 (×1), sub-1 excluded
        _orders(tmp_path, [1.5, 123.4, 1999.99, 950.0, 0.42])
        out = _table(QUERIES["benford_digits"][0](str(tmp_path)))
        got = {d: (n, p) for d, n, p in zip(
            out.column("digit").to_pylist(), out.column("n").to_pylist(),
            out.column("permille").to_pylist())}
        assert got == {1: (3, 750), 9: (1, 250)}

    def test_permille_floor_division(self, ray_session, tmp_path):
        # 3 orders → 333 permille each (floor, never 334)
        _orders(tmp_path, [1.0, 2.0, 3.0])
        out = _table(QUERIES["benford_digits"][0](str(tmp_path)))
        assert sorted(out.column("permille").to_pylist()) == [333] * 3
