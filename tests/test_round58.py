"""Round-58 operators: prefix_dups (proper-prefix duplicate
detection), triangle_parts (triangle counting via oriented wedges),
ema_cents (exact integer EMA recurrence), bm25_topk (odds-idf BM25
retrieval). Hand-built value assertions plus DuckDB oracle parity on
randomized inputs.
"""
import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from raybeats.queries import QUERIES


def _table(res):
    if isinstance(res, pa.Table):
        return res
    batches = list(res.iter_batches(batch_format="pyarrow"))
    if not batches:
        return pa.table({})
    return pa.concat_tables(batches, promote_options="default")


def _sorted_rows(tb):
    return sorted(map(tuple, zip(
        *[tb.column(c).to_pylist() for c in sorted(tb.column_names)])))


def _oracle(tmp_path, sql, tables):
    con = duckdb.connect()
    for t in tables:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"'{tmp_path}/{t}.parquet'")
    return con.execute(sql).arrow()


def _docs(tmp_path, texts, ids=None):
    ids = ids if ids is not None else list(range(len(texts)))
    t = pa.table({
        "doc_id": pa.array(ids, pa.int64()),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(["en"] * len(texts), pa.string()),
        "source": pa.array(["s"] * len(texts), pa.string()),
        "n_chars": pa.array(
            [len(x) if x is not None else 0 for x in texts],
            pa.int64())})
    pq.write_table(t, tmp_path / "documents.parquet")


class TestPrefixDups:
    def test_hand_flags(self, ray_session, tmp_path):
        # 0 "hello" < 1 "hello world" < 2 "hello world!!"  (chain:
        # both 0 and 1 flagged); 3/4 exact dups (NOT proper prefixes
        # of each other); 5 "hi" is a SHORT (<4 cu) prefix of 6
        # "hill" — exercises the broadcast probe path; 7 unrelated.
        texts = ["hello", "hello world", "hello world!!",
                 "samesame", "samesame", "hi", "hill", "zzz9"]
        _docs(tmp_path, texts)
        got = _table(QUERIES["prefix_dups"][0](str(tmp_path)))
        rows = sorted((r["doc_id"], r["n_chars"])
                      for r in got.to_pylist())
        assert rows == [(0, 5), (1, 11), (5, 2)]

    def test_short_dup_both_flagged(self, ray_session, tmp_path):
        # two docs share the short text "ab"; "abc" extends it → BOTH
        # short doc rows are emitted (SQL joins on text)
        _docs(tmp_path, ["ab", "ab", "abc"])
        got = _table(QUERIES["prefix_dups"][0](str(tmp_path)))
        rows = sorted((r["doc_id"], r["n_chars"])
                      for r in got.to_pylist())
        assert rows == [(0, 2), (1, 2)]

    def test_oracle_parity_random(self, ray_session, tmp_path):
        rng = np.random.default_rng(58)
        # small alphabet + short lengths force many prefix pairs,
        # including sub-4-codeunit shorts and exact duplicates
        alpha = list("abc")
        texts = ["".join(rng.choice(alpha, size=rng.integers(1, 9)))
                 for _ in range(800)]
        texts += [None, ""]
        _docs(tmp_path, texts)
        got = _table(QUERIES["prefix_dups"][0](str(tmp_path)))
        want = _oracle(tmp_path, QUERIES["prefix_dups"][1],
                       ["documents"])
        assert got.num_rows > 0
        assert _sorted_rows(got) == _sorted_rows(want)


def _lineitem(tmp_path, pairs):
    """pairs: (l_orderkey, l_partkey) rows."""
    pq.write_table(pa.table({
        "l_orderkey": pa.array([p[0] for p in pairs], pa.int64()),
        "l_partkey": pa.array([p[1] for p in pairs], pa.int64())}),
        tmp_path / "lineitem.parquet")


class TestTriangleParts:
    def test_hand_triangle(self, ray_session, tmp_path):
        # order 1 = {1,2,3} → triangle (1,2,3); order 2 = {3,4} adds
        # an edge but no triangle; order 3 = {1,2} duplicates an edge
        # (must not double-count); order 4 = {2,3,4} closes a second
        # triangle (2,3,4) via edges 2-3 (dup), 2-4 (new), 3-4 (dup).
        rows = [(1, 1), (1, 2), (1, 3), (2, 3), (2, 4),
                (3, 1), (3, 2), (4, 2), (4, 3), (4, 4)]
        _lineitem(tmp_path, rows)
        got = QUERIES["triangle_parts"][0](str(tmp_path))
        r = {x["l_partkey"]: x["n_triangles"] for x in got.to_pylist()}
        assert r == {1: 1, 2: 2, 3: 2, 4: 1}

    def test_oracle_parity_random(self, ray_session, tmp_path):
        rng = np.random.default_rng(59)
        rows = list(zip(rng.integers(0, 120, size=2000).tolist(),
                        rng.integers(0, 40, size=2000).tolist()))
        _lineitem(tmp_path, rows)
        got = QUERIES["triangle_parts"][0](str(tmp_path))
        want = _oracle(tmp_path, QUERIES["triangle_parts"][1],
                       ["lineitem"])
        assert got.num_rows > 0
        assert _sorted_rows(got) == _sorted_rows(want)

    def test_distributed_fallback_hand(self, ray_session, tmp_path):
        # edge_budget=0 forces the all-cogroup plan on the same
        # hand-checkable graph as test_hand_triangle
        from raybeats.queries import q_triangle_parts
        rows = [(1, 1), (1, 2), (1, 3), (2, 3), (2, 4),
                (3, 1), (3, 2), (4, 2), (4, 3), (4, 4)]
        _lineitem(tmp_path, rows)
        got = q_triangle_parts(str(tmp_path), edge_budget=0)
        r = {x["l_partkey"]: x["n_triangles"] for x in got.to_pylist()}
        assert r == {1: 1, 2: 2, 3: 2, 4: 1}

    def test_distributed_fallback_parity(self, ray_session, tmp_path):
        # the two plans must agree with each other AND the oracle on
        # a randomized graph dense enough for many triangles
        from raybeats.queries import q_triangle_parts
        rng = np.random.default_rng(60)
        rows = list(zip(rng.integers(0, 150, size=2500).tolist(),
                        rng.integers(0, 45, size=2500).tolist()))
        _lineitem(tmp_path, rows)
        dist = q_triangle_parts(str(tmp_path), edge_budget=0)
        bcast = q_triangle_parts(str(tmp_path), edge_budget=1 << 40)
        want = _oracle(tmp_path, QUERIES["triangle_parts"][1],
                       ["lineitem"])
        assert dist.num_rows > 0
        assert _sorted_rows(dist) == _sorted_rows(bcast)
        assert _sorted_rows(dist) == _sorted_rows(want)

    def test_distributed_fallback_empty(self, ray_session, tmp_path):
        from raybeats.queries import q_triangle_parts
        _lineitem(tmp_path, [])
        got = q_triangle_parts(str(tmp_path), edge_budget=0)
        assert got.num_rows == 0
        assert got.column_names == ["l_partkey", "n_triangles"]


def _events(tmp_path, rows):
    """rows: (event_id, user_id, ts_us, value)."""
    t = pa.table({
        "event_id": pa.array([r[0] for r in rows], pa.int64()),
        "user_id": pa.array([r[1] for r in rows], pa.int64()),
        "ts": pa.array([r[2] for r in rows], pa.int64())
        .cast(pa.timestamp("us")),
        "event_type": pa.array(["x"] * len(rows), pa.string()),
        "value": pa.array([r[3] for r in rows], pa.float64()),
        "props": pa.array(["{}"] * len(rows), pa.string())})
    pq.write_table(t, tmp_path / "events.parquet")


class TestEmaCents:
    def test_hand_recurrence(self, ray_session, tmp_path):
        # user 7 in ts order: cents 10000, -5000, 2500
        # s1=10000; s2=floor((−5000+10000)/2)=2500;
        # s3=floor((2500+2500)/2)=2500
        # user 8: cents 1, -2 → s2 = floor((−2+1)/2) = −1 (negative
        # floor, NOT truncation toward zero)
        rows = [(1, 7, 10, 100.0), (2, 7, 20, -50.0),
                (3, 7, 30, 25.0), (4, 8, 10, 0.01), (5, 8, 20, -0.02)]
        _events(tmp_path, rows)
        got = _table(QUERIES["ema_cents"][0](str(tmp_path)))
        r = {x["event_id"]: x["ema_cents"] for x in got.to_pylist()}
        assert r == {1: 10000, 2: 2500, 3: 2500, 4: 1, 5: -1}

    def test_ts_tie_breaks_by_event_id(self, ray_session, tmp_path):
        # equal ts → event_id order decides the recurrence order
        rows = [(11, 1, 5, 1.0), (10, 1, 5, 3.0)]
        _events(tmp_path, rows)
        got = _table(QUERIES["ema_cents"][0](str(tmp_path)))
        r = {x["event_id"]: x["ema_cents"] for x in got.to_pylist()}
        assert r == {10: 300, 11: 200}  # floor((100+300)/2)

    def test_oracle_parity_random(self, ray_session, tmp_path):
        rng = np.random.default_rng(60)
        n = 3000
        rows = [(i, int(rng.integers(0, 50)),
                 int(rng.integers(0, 10**7)),
                 float(np.round(rng.normal(0, 40), 2)))
                for i in range(n)]
        _events(tmp_path, rows)
        got = _table(QUERIES["ema_cents"][0](str(tmp_path)))
        want = _oracle(tmp_path, QUERIES["ema_cents"][1], ["events"])
        assert got.num_rows == n
        assert _sorted_rows(got) == _sorted_rows(want)


class TestBm25TopK:
    def test_hand_ranking(self, ray_session, tmp_path):
        # 20 filler docs fix N/avgdl; doc 0 contains ALL five query
        # terms, doc 1 one term, doc 2 none → 0 outranks 1 outranks 2
        texts = ["dup spark window merge batch",
                 "spark filler filler filler filler",
                 "filler filler filler filler filler"]
        texts += [f"noise{i} pad pad" for i in range(20)]
        _docs(tmp_path, texts)
        got = _table(QUERIES["bm25_topk"][0](str(tmp_path)))
        ids = got.column("doc_id").to_pylist()
        scores = dict(zip(ids, got.column("score").to_pylist()))
        assert ids[0] == 0
        assert scores[0] > scores[1] > 0
        # zero-tf docs score exactly 0.0 and tie-break by doc_id
        zeros = [i for i in ids if scores[i] == 0.0]
        assert zeros == sorted(zeros)

    def test_oracle_parity_random(self, ray_session, tmp_path):
        rng = np.random.default_rng(61)
        vocab = ["dup", "spark", "window", "merge", "batch",
                 "alpha", "beta", "gamma", "delta"]
        texts = [" ".join(rng.choice(
            vocab, size=rng.integers(1, 30)).tolist())
            for _ in range(500)]
        _docs(tmp_path, texts)
        got = _table(QUERIES["bm25_topk"][0](str(tmp_path)))
        want = _oracle(tmp_path, QUERIES["bm25_topk"][1],
                       ["documents"])
        assert got.num_rows == 25
        assert _sorted_rows(got) == _sorted_rows(want)
