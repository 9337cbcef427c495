"""Round-72 operators: compressibility (zlib quality signal) and
bpe_merges (distributed BPE tokenizer-training merge table). Both are
rows-only queries — these tests ARE their value assertions."""
import zlib

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


def _docs(tmp_path, texts):
    pq.write_table(pa.table({
        "doc_id": pa.array(range(1, len(texts) + 1), pa.int64()),
        "text": pa.array(texts, pa.string())}),
        tmp_path / "documents.parquet")


class TestCompressibility:
    def test_brute_force_equivalence_real_corpus(self, ray_session):
        sf = "/root/testdata/sf0.001"
        out = _table(QUERIES["compressibility"][0](sf)).sort_by("doc_id")
        docs = pq.read_table(f"{sf}/documents.parquet",
                             columns=["doc_id", "text"]).sort_by("doc_id")
        assert out.num_rows == docs.num_rows
        for did, text, raw, comp, ratio, flag in zip(
                docs.column("doc_id").to_pylist(),
                docs.column("text").to_pylist(),
                out.column("raw_bytes").to_pylist(),
                out.column("comp_bytes").to_pylist(),
                out.column("ratio").to_pylist(),
                out.column("flag_repetitive").to_pylist()):
            b = text.encode("utf-8")
            c = len(zlib.compress(b, 6))
            assert raw == len(b)
            assert comp == c
            assert ratio == c / max(len(b), 1)
            assert flag == (ratio < 0.3)

    def test_repetitive_flagged_prose_not(self, ray_session, tmp_path):
        rep = "spam ham " * 500
        prose = ("the quick brown fox jumps over lazy dogs while "
                 "zebras quietly improvise jazz 0123456789 " * 3)
        _docs(tmp_path, [rep, prose])
        out = _table(QUERIES["compressibility"][0](
            str(tmp_path))).sort_by("doc_id")
        flags = out.column("flag_repetitive").to_pylist()
        assert flags[0] is True
        ratios = out.column("ratio").to_pylist()
        assert ratios[0] < 0.05 < ratios[1]

    def test_empty_doc_safe(self, ray_session, tmp_path):
        _docs(tmp_path, [""])
        out = _table(QUERIES["compressibility"][0](str(tmp_path)))
        assert out.column("raw_bytes").to_pylist() == [0]
        # ratio uses max(raw,1) so an empty doc cannot divide by zero
        assert out.column("ratio").to_pylist()[0] > 0


class TestBpeMerges:
    def test_hand_values(self, ray_session, tmp_path):
        # word counts: low×5, lower×2, lowest×1
        _docs(tmp_path, ["low low low lower",
                         "low low lower lowest"])
        out = _table(QUERIES["bpe_merges"][0](str(tmp_path)))
        rows = list(zip(out.column("left").to_pylist(),
                        out.column("right").to_pylist(),
                        out.column("merged").to_pylist(),
                        out.column("pair_count").to_pylist()))
        # (l,o)=8 ties (o,w)=8 → lexicographic tie-break picks (l,o)
        assert rows[0] == ("l", "o", "lo", 8)
        assert rows[1] == ("lo", "w", "low", 8)
        # after merging 'low': (low,e)=3 beats (e,r)=2
        assert rows[2] == ("low", "e", "lowe", 3)
        assert rows[3] == ("lowe", "r", "lower", 2)
        assert out.column("iteration").to_pylist()[:4] == [1, 2, 3, 4]

    def test_replay_from_independent_counts_real_corpus(self,
                                                        ray_session):
        import duckdb
        from raybeats.textops.analysis import bpe_merges
        sf = "/root/testdata/sf0.001"
        out = _table(QUERIES["bpe_merges"][0](sf))
        con = duckdb.connect()
        wc = con.execute(
            f"SELECT w, CAST(COUNT(*) AS BIGINT) AS n FROM ("
            f"SELECT unnest(regexp_extract_all(lower(text), "
            f"'[a-z0-9]+')) AS w FROM '{sf}/documents.parquet') "
            f"GROUP BY w ORDER BY w").fetch_arrow_table()
        want = bpe_merges(wc.column("w").to_pylist(),
                          wc.column("n").to_pylist(), n_merges=8)
        got = list(zip(out.column("left").to_pylist(),
                       out.column("right").to_pylist(),
                       out.column("merged").to_pylist(),
                       out.column("pair_count").to_pylist()))
        assert got == want

    def test_merge_exhaustion_stops_early(self, ray_session, tmp_path):
        # single 2-char word type: exactly one merge possible
        _docs(tmp_path, ["ab ab ab"])
        out = _table(QUERIES["bpe_merges"][0](str(tmp_path)))
        assert out.num_rows == 1
        assert out.column("merged").to_pylist() == ["ab"]
        assert out.column("pair_count").to_pylist() == [3]
