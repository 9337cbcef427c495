"""Round-55 operator: encode_docs (corpus-vocabulary token-id
encoding). Value assertions: rank order (count desc, token asc)
fixes the ids, OOV encodes as -1, zero-token docs encode empty, and
ids round-trip back to the original token sequence through the
vocabulary.
"""
import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from raybeats.queries import QUERIES


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


class TestEncodeDocs:
    def test_rank_and_oov(self, ray_session, tmp_path):
        # counts: bb×3, aa×2, cc×1 → ids bb=0, aa=1, cc=2 (count
        # desc, token asc); ties aa/cc would break lexically
        rows = [(1, "bb aa bb"), (2, "aa bb cc"), (3, "!!!")]
        _docs(tmp_path, rows)
        got = {x["doc_id"]: x["token_ids"]
               for x in _table(QUERIES["encode_docs"][0](
                   str(tmp_path))).to_pylist()}
        assert got == {1: "0,1,0", 2: "1,0,2", 3: ""}

    def test_roundtrip_and_parity(self, ray_session, tmp_path):
        rng = np.random.default_rng(551)
        vocab = [f"w{i}" for i in range(90)]  # > 64 forces real OOV
        rows = [(i, " ".join(rng.choice(vocab,
                                        size=int(rng.integers(0, 15)))))
                for i in range(400)]
        _docs(tmp_path, rows)
        got = _table(QUERIES["encode_docs"][0](str(tmp_path)))
        con = duckdb.connect()
        con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                    f"'{tmp_path}/documents.parquet'")
        want = con.execute(QUERIES["encode_docs"][1]).arrow()
        g = {x["doc_id"]: x["token_ids"] for x in got.to_pylist()}
        w = {x["doc_id"]: x["token_ids"] for x in want.to_pylist()}
        assert g == w
        assert any("-1" in v for v in g.values())  # real OOV present
        # ids round-trip: every non-OOV id decodes back to the token
        vq = con.execute("""
            WITH f AS (SELECT unnest(regexp_extract_all(lower(text),
                '[a-z0-9]+')) AS token FROM documents)
            SELECT token FROM f GROUP BY token
            ORDER BY COUNT(*) DESC, token LIMIT 64""").fetchall()
        id2tok = {i: t[0] for i, t in enumerate(vq)}
        for did, text in rows[:50]:
            toks = text.split() if text else []
            ids = [int(s) for s in g[did].split(",")] if g[did] else []
            assert len(ids) == len(toks)
            for tok, i in zip(toks, ids):
                if i != -1:
                    assert id2tok[i] == tok
