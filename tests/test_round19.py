"""Round-19 operators: ndjson_roundtrip (sink→source format bridge),
kwic_snippets (codepoint-exact keyword-in-context), gap_histogram
(integer log2 inter-arrival bins), role_flow_histogram (conversation
role-flow shapes). Value assertions beyond the DuckDB gate: multi-byte
text before the keyword (the byte-vs-codepoint trap), exact power-of-2
bucket boundaries and zero gaps, JSON-special characters through the
round trip, and first-appearance flow ordering.
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
        "source": pa.array(["s"] * len(rows), pa.string()),
        "n_chars": pa.array([len(r[1] or "") for r in rows],
                            pa.int64())})
    pq.write_table(t, tmp_path / "documents.parquet")


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


class TestNdjsonRoundtrip:
    def test_special_chars_and_parity(self, ray_session, tmp_path):
        rows = [(0, 0, 1, 'quote " backslash \\', 1.0),
                (1, 1, 1, "newline\\n and <html> & ünïcode 日本", 1.0),
                (2, 2, 1, "", 1.0),
                (-5, 3, 1, "negative id", 1.0)]
        _events(tmp_path, rows)
        got = _table(QUERIES["ndjson_roundtrip"][0](str(tmp_path)))
        want = _oracle(tmp_path, QUERIES["ndjson_roundtrip"][1])
        assert _sorted_rows(got) == _sorted_rows(want)


class TestKwicSnippets:
    def test_multibyte_prefix(self, ray_session, tmp_path):
        # 12 codepoints of CJK before the keyword: a byte-offset
        # implementation would slice garbage
        docs = [(0, "日本語日本語日本語日本語merge tail here"),
                (1, "short merge"),
                (2, "merge at start"),
                (3, "MERGE uppercase matches via lower"),
                (4, "no keyword"), (5, None)]
        _documents(tmp_path, docs)
        got = _table(QUERIES["kwic_snippets"][0](str(tmp_path)))
        snip = {r["doc_id"]: r["snippet"] for r in got.to_pylist()}
        assert set(snip) == {0, 1, 2, 3}
        assert snip[0] == "語日本語日本語日本語merge tail here"[:25]
        assert snip[1] == "short merge"
        assert snip[2] == "merge at start"[:15]
        assert snip[3] == "merge uppercase"
        want = _oracle(tmp_path, QUERIES["kwic_snippets"][1],
                       tables=("documents",))
        assert _sorted_rows(got) == _sorted_rows(want)

    def test_slice_varstart_kernel(self, ray_session):
        # direct kernel check: multibyte boundaries, empty rows,
        # stop past end, start == len, zero-width window — against
        # python slicing as the spec
        from raybeats.queries import _slice_varstart
        vals = ["日本語abc日本語", "", "xyz", "é", "abc", "日日日"]
        st = [1, 0, 2, 0, 3, 5]
        en = [5, 3, 99, 1, 3, 9]
        got = _slice_varstart(
            pa.chunked_array([pa.array(vals[:3]), pa.array(vals[3:])]),
            pa.array(st, pa.int64()), pa.array(en, pa.int64()))
        assert got.to_pylist() == [v[a:b]
                                   for v, a, b in zip(vals, st, en)]
        # null rows take the fallback path
        got2 = _slice_varstart(pa.array(["abcd", None]),
                               pa.array([1, 0], pa.int64()),
                               pa.array([3, 2], pa.int64()))
        assert got2.to_pylist() == ["bc", None]


class TestGapHistogram:
    def test_power_boundaries_and_zero(self, ray_session, tmp_path):
        # gaps: 0 -> bucket 0; 1 -> 1; 2 -> 2; 3 -> 2; 4 -> 3; 2^40 -> 41
        ts = [0, 0, 1, 3, 6, 10, 10 + (1 << 40)]
        rows = [(i, t, 1, "a", 1.0) for i, t in enumerate(ts)]
        _events(tmp_path, rows)
        got = _table(QUERIES["gap_histogram"][0](str(tmp_path)))
        hist = {r["magnitude"]: r["n_gaps"] for r in got.to_pylist()}
        assert hist == {0: 1, 1: 1, 2: 2, 3: 1, 41: 1}

    def test_oracle_parity_random(self, ray_session, tmp_path):
        rng = np.random.default_rng(61)
        rows = [(i, int(rng.integers(0, 1 << 34)),
                 int(rng.integers(0, 30)), "a", 1.0)
                for i in range(4000)]
        _events(tmp_path, rows)
        got = _table(QUERIES["gap_histogram"][0](str(tmp_path)))
        want = _oracle(tmp_path, QUERIES["gap_histogram"][1])
        assert _sorted_rows(got) == _sorted_rows(want)


class TestRoleFlowHistogram:
    def test_first_appearance_order(self, ray_session):
        sf = "/root/testdata/sf0.001"
        got = _table(QUERIES["role_flow_histogram"][0](sf))
        rows = got.to_pylist()
        assert rows and all(r["n_convs"] > 0 for r in rows)
        # flows are first-appearance sequences: no repeated role inside
        for r in rows:
            parts = r["flow"].split(">")
            assert len(parts) == len(set(parts))
        # conservation: one flow per conversation
        from raybeats.transcripts import read_transcripts
        n_convs = len(set(
            x for b in read_transcripts(sf)
            .map_batches(lambda t: pa.table(
                {"conv_id": t.column("conv_id")}),
                batch_format="pyarrow")
            .iter_batches(batch_format="pyarrow")
            for x in b.column("conv_id").to_pylist()))
        assert sum(r["n_convs"] for r in rows) == n_convs
