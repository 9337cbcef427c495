"""Round-36 operators: vocab_growth (Heaps-law first-occurrence curve)
and top_bigram_per_source (grouped n-gram argmax). Value assertions
beyond the gate: first occurrence credited to the MIN doc_id across
batches, cumulative conservation (last cum == global vocab), and
bigram tie-break.
"""
import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from raybeats.queries import QUERIES


def _documents(tmp_path, rows):
    t = pa.table({
        "doc_id": pa.array([r[0] for r in rows], pa.int64()),
        "text": pa.array([r[1] for r in rows], pa.string()),
        "lang": pa.array(["en"] * len(rows), pa.string()),
        "source": pa.array([r[2] if len(r) > 2 else "s"
                            for r in rows], pa.string()),
        "n_chars": pa.array([len(r[1] or "") for r in rows],
                            pa.int64())})
    pq.write_table(t, tmp_path / "documents.parquet")


def _table(res):
    if isinstance(res, pa.Table):
        return res
    return pa.concat_tables(res.iter_batches(batch_format="pyarrow"),
                            promote_options="default")


def _oracle(tmp_path, sql, tables=("documents",)):
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


class TestVocabGrowth:
    def test_first_occurrence_and_cum(self, ray_session, tmp_path):
        # doc0 brings {aa,bb}; doc1 {bb,cc} -> +cc; doc2 repeats ->
        # absent; doc3 {dd} -> +dd
        _documents(tmp_path, [(0, "aa bb"), (1, "bb cc"),
                              (2, "aa cc"), (3, "dd")])
        got = _table(QUERIES["vocab_growth"][0](str(tmp_path)))
        rows = [(r["doc_id"], r["n_new"], r["cum_new"])
                for r in got.to_pylist()]
        assert rows == [(0, 2, 2), (1, 1, 3), (3, 1, 4)]

    def test_oracle_parity_random(self, ray_session, tmp_path):
        rng = np.random.default_rng(251)
        words = [f"w{i}" for i in range(200)]
        docs = [(i, " ".join(rng.choice(words,
                                        size=rng.integers(1, 15))))
                for i in range(400)]
        _documents(tmp_path, docs)
        got = _table(QUERIES["vocab_growth"][0](str(tmp_path)))
        want = _oracle(tmp_path, QUERIES["vocab_growth"][1])
        assert _sorted_rows(got) == _sorted_rows(want)
        # conservation: final cumulative == distinct global vocab
        vocab = set()
        for _, txt in docs:
            vocab.update(txt.split())
        assert got.to_pylist()[-1]["cum_new"] == len(vocab)
        # monotone curve
        cum = [r["cum_new"] for r in got.to_pylist()]
        assert cum == sorted(cum)


class TestTopBigramPerSource:
    def test_argmax_and_tiebreak(self, ray_session, tmp_path):
        # source A: "x y" twice beats "y z" once; source B tie between
        # "a b" and "b a" -> smallest bigram wins
        _documents(tmp_path, [
            (0, "x y z x y", "A"),
            (1, "a b a", "B"), (2, "b a b", "B")])
        got = _table(QUERIES["top_bigram_per_source"][0](str(tmp_path)))
        r = {x["source"]: (x["bigram"], x["n"]) for x in got.to_pylist()}
        assert r["A"] == ("x y", 2)
        # B: doc1 bigrams: a b, b a; doc2: b a, a b -> tie 2-2 -> "a b"
        assert r["B"] == ("a b", 2)

    def test_oracle_parity_random(self, ray_session, tmp_path):
        rng = np.random.default_rng(257)
        words = list("abcdefg")
        docs = [(i, " ".join(rng.choice(words,
                                        size=rng.integers(2, 20))),
                 ["s1", "s2", "s3"][int(rng.integers(0, 3))])
                for i in range(300)]
        _documents(tmp_path, docs)
        got = _table(QUERIES["top_bigram_per_source"][0](str(tmp_path)))
        want = _oracle(tmp_path, QUERIES["top_bigram_per_source"][1])
        assert _sorted_rows(got) == _sorted_rows(want)
