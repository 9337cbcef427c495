"""Round-54 operator: split_novelty (distinct val bigrams unseen in
train). Value assertions: hand corpus with known bigram overlap (ids
chosen through the real split rule), test-split text ignored, and
oracle parity on a random corpus.
"""
import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from raybeats.queries import QUERIES
from raybeats.textops.curation import hash_split


def _ids_by_split(n=2000):
    t = pa.table({"doc_id": pa.array(range(n), pa.int64())})
    sp = hash_split(t)
    out = {"train": [], "val": [], "test": []}
    for i, s in zip(sp.column("doc_id").to_pylist(),
                    sp.column("split").to_pylist()):
        out[s].append(i)
    return out


def _docs(tmp_path, rows):
    """rows: (doc_id, text)."""
    t = pa.table({
        "doc_id": pa.array([r[0] for r in rows], pa.int64()),
        "text": pa.array([r[1] for r in rows], pa.string()),
        "lang": pa.array(["en"] * len(rows), pa.string()),
        "source": pa.array(["s"] * len(rows), pa.string()),
        "n_chars": pa.array([len(r[1]) for r in rows], pa.int64())})
    pq.write_table(t, tmp_path / "documents.parquet")


def _table(res):
    if isinstance(res, pa.Table):
        return res
    return pa.concat_tables(res.iter_batches(batch_format="pyarrow"),
                            promote_options="default")


class TestSplitNovelty:
    def test_hand_overlap(self, ray_session, tmp_path):
        ids = _ids_by_split()
        rows = [
            (ids["train"][0], "alpha beta gamma"),
            (ids["val"][0], "alpha beta delta epsilon"),
            # test-split text must not count anywhere
            (ids["test"][0], "zeta eta theta")]
        _docs(tmp_path, rows)
        got = _table(QUERIES["split_novelty"][0](str(tmp_path)))
        r = got.to_pylist()[0]
        # val bigrams: {alpha beta, beta delta, delta epsilon};
        # train has {alpha beta, beta gamma} → 2 novel of 3
        assert r == {"n_val_bigrams": 3, "n_novel_bigrams": 2}

    def test_oracle_parity_random(self, ray_session, tmp_path):
        rng = np.random.default_rng(541)
        vocab = ["red", "blue", "green", "dog", "cat", "runs",
                 "jumps", "fast"]
        rows = [(i, " ".join(rng.choice(vocab,
                                        size=int(rng.integers(2, 12)))))
                for i in range(600)]
        _docs(tmp_path, rows)
        got = _table(QUERIES["split_novelty"][0](str(tmp_path)))
        con = duckdb.connect()
        con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                    f"'{tmp_path}/documents.parquet'")
        want = con.execute(QUERIES["split_novelty"][1]).arrow()
        assert got.to_pylist() == want.to_pylist()
        r = got.to_pylist()[0]
        assert 0 <= r["n_novel_bigrams"] <= r["n_val_bigrams"]
