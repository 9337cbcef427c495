"""Round-29 operators: type_percent_rank (grouped RANK()−1 via
broadcast histogram CDF) and dim_profile (per-dimension embedding
stats from zero-copy list offsets). Value assertions beyond the gate:
tie handling (equal cents share smaller_n), sliced-ListArray offset
rebasing, and ragged list lengths.
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


class TestTypePercentRank:
    def test_ties_share_rank(self, ray_session, tmp_path):
        # type a: cents 100,100,200 -> smaller_n 0,0,2; type b: 1 row
        rows = [(0, 0, 1, "a", 1.0), (1, 1, 1, "a", 1.0),
                (2, 2, 1, "a", 2.0), (3, 3, 1, "b", 5.0)]
        _events(tmp_path, rows)
        got = _table(QUERIES["type_percent_rank"][0](str(tmp_path)))
        r = {x["event_id"]: (x["smaller_n"], x["type_n"])
             for x in got.to_pylist()}
        assert r == {0: (0, 3), 1: (0, 3), 2: (2, 3), 3: (0, 1)}

    def test_oracle_parity_random(self, ray_session, tmp_path):
        rng = np.random.default_rng(193)
        rows = [(i, i, 1, ["a", "b", "c"][int(rng.integers(0, 3))],
                 float(rng.uniform(-1, 30))) for i in range(4000)]
        _events(tmp_path, rows)
        got = _table(QUERIES["type_percent_rank"][0](str(tmp_path)))
        want = _oracle(tmp_path, QUERIES["type_percent_rank"][1])
        assert _sorted_rows(got) == _sorted_rows(want)


class TestDimProfile:
    def _embeddings(self, tmp_path, vecs):
        t = pa.table({
            "vec_id": pa.array(range(len(vecs)), pa.int64()),
            "embedding": pa.array(vecs, pa.list_(pa.float32())),
            "label": pa.array([0] * len(vecs), pa.int32())})
        pq.write_table(t, tmp_path / "embeddings.parquet")

    def test_ragged_and_parity(self, ray_session, tmp_path):
        rng = np.random.default_rng(197)
        vecs = [[float(x) for x in
                 rng.normal(0, 1, int(rng.integers(1, 6)))]
                for _ in range(200)]
        self._embeddings(tmp_path, vecs)
        got = _table(QUERIES["dim_profile"][0](str(tmp_path)))
        want = _oracle(tmp_path, QUERIES["dim_profile"][1],
                       tables=("embeddings",))
        assert _sorted_rows(got) == _sorted_rows(want)
        # dim 1 count equals the number of non-empty vectors
        d1 = [r for r in got.to_pylist() if r["idx"] == 1][0]
        assert d1["n"] == len([v for v in vecs if len(v)])

    def test_sliced_offsets_rebase(self):
        # a zero-copy SLICED ListArray: offsets do not start at 0 —
        # the kernel must rebase positions or dims shift
        import pyarrow.compute as pc
        arr = pa.array([[1.0, 2.0], [3.0], [4.0, 5.0, 6.0]],
                       pa.list_(pa.float32()))
        sliced = arr.slice(1)  # offsets start at 2
        offs = sliced.offsets.to_numpy(zero_copy_only=False)
        q = pc.cast(sliced.flatten(), pa.float64()) \
            .to_numpy(zero_copy_only=False)
        lens = np.diff(offs)
        flat_pos = np.arange(len(q)) + offs[0]
        dim = (flat_pos - np.repeat(offs[:-1], lens)) + 1
        assert dim.tolist() == [1, 1, 2, 3]
        assert q.tolist() == [3.0, 4.0, 5.0, 6.0]
