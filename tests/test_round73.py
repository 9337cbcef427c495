"""Round-73 operators: feature_hashing (signed hashing-trick
vectorizer) and vocab_coverage (top-p nucleus vocabulary truncation)."""
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


def _fnv(s: str) -> int:
    h = 0xCBF29CE484222325
    for b in s.encode():
        h = ((h ^ b) * 0x100000001B3) & ((1 << 64) - 1)
    return h


class TestFeatureHashing:
    def test_independent_fnv_replay(self, ray_session, tmp_path):
        _docs(tmp_path, ["ab ab cd", "cd"])
        out = _table(QUERIES["feature_hashing"][0](str(tmp_path)))
        got = {(d, i): w for d, i, w in zip(
            out.column("doc_id").to_pylist(),
            out.column("idx").to_pylist(),
            out.column("weight").to_pylist())}
        want = {}
        for doc, toks in [(1, ["ab", "ab", "cd"]), (2, ["cd"])]:
            for t in toks:
                h = _fnv(t)
                k = (doc, h % 64)
                want[k] = want.get(k, 0) + (1 if (h >> 6) & 1 == 0
                                            else -1)
        assert got == want

    def test_case_folded_and_punct_split(self, ray_session, tmp_path):
        # "AB, ab!" tokenizes to [ab, ab] — same feature twice
        _docs(tmp_path, ["AB, ab!"])
        out = _table(QUERIES["feature_hashing"][0](str(tmp_path)))
        h = _fnv("ab")
        sign = 1 if (h >> 6) & 1 == 0 else -1
        assert out.column("idx").to_pylist() == [h % 64]
        assert out.column("weight").to_pylist() == [2 * sign]


class TestVocabCoverage:
    def test_boundary_token_at_exact_90_excluded(self, ray_session,
                                                 tmp_path):
        # counts: a×9, b×1 → b's preceding mass is exactly 90% → out
        _docs(tmp_path, ["a a a a a a a a a b"])
        out = _table(QUERIES["vocab_coverage"][0](str(tmp_path)))
        assert out.column("token").to_pylist() == ["a"]
        assert out.column("cum_n").to_pylist() == [9]

    def test_rank_and_tie_break(self, ray_session, tmp_path):
        # z and m tie at 4 each; lexicographic: m ranks before z
        _docs(tmp_path, ["z z z z m m m m q"])
        out = _table(QUERIES["vocab_coverage"][0](
            str(tmp_path))).sort_by("rank")
        assert out.column("token").to_pylist() == ["m", "z", "q"]
        assert out.column("rank").to_pylist() == [1, 2, 3]
        # q kept: preceding mass 8/9 ≈ 88.9% < 90%
        assert out.column("cum_n").to_pylist() == [4, 8, 9]
