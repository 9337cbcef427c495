"""Round-60 operators: dup_spans (exact repeated-substring spans at
token-window granularity), preference_pairs (DPO chosen/rejected pair
construction), hard_negatives (nearest wrong-label retrieval mining).
Hand-built value assertions plus DuckDB oracle / brute-force parity on
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
    batches = list(res.iter_batches(batch_size=None,
                                    batch_format="pyarrow"))
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


def _docs(tmp_path, rows):
    """rows: (doc_id, text, source)."""
    t = pa.table({
        "doc_id": pa.array([r[0] for r in rows], pa.int64()),
        "text": pa.array([r[1] for r in rows], pa.string()),
        "lang": pa.array(["en"] * len(rows), pa.string()),
        "source": pa.array([r[2] for r in rows], pa.string()),
        "n_chars": pa.array([len(r[1]) for r in rows], pa.int64())})
    pq.write_table(t, tmp_path / "documents.parquet")


def _events(tmp_path, rows):
    """rows: (event_id, user_id, ts_us, event_type, value, props)."""
    t = pa.table({
        "event_id": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array([r[2] for r in rows], pa.int64())
        .cast(pa.timestamp("us")),
        "user_id": pa.array([r[1] for r in rows], pa.int64()),
        "event_type": pa.array([r[3] for r in rows], pa.string()),
        "value": pa.array([r[4] for r in rows], pa.float64()),
        "props": pa.array([r[5] for r in rows], pa.string())})
    pq.write_table(t, tmp_path / "events.parquet")


def _embeddings(tmp_path, vecs, labels):
    t = pa.table({
        "vec_id": pa.array(range(len(vecs)), pa.int64()),
        "embedding": pa.array(vecs, pa.list_(pa.float32())),
        "label": pa.array(labels, pa.int32())})
    pq.write_table(t, tmp_path / "embeddings.parquet")


WORDS = ["alpha", "bravo", "charlie", "delta", "echo", "foxtrot",
         "golf", "hotel", "india", "juliet", "kilo", "lima"]


class TestDupSpans:
    def test_hand_shared_span(self, ray_session, tmp_path):
        # docs 0 and 1 share one 9-token run -> two overlapping 8-token
        # spans each; doc 2 shares nothing; doc 3 is too short (< 8
        # tokens -> zero spans, absent from per-doc tallies)
        shared = "alpha bravo charlie delta echo foxtrot golf hotel india"
        rows = [(0, shared + " kilo lima kilo lima golf", "s0"),
                (1, "lima kilo " + shared, "s1"),
                (2, "zulu yankee xray whiskey victor uniform tango "
                    "sierra romeo quebec", "s2"),
                (3, "one two three", "s3")]
        _docs(tmp_path, rows)
        got = _table(QUERIES["dup_spans"][0](str(tmp_path)))
        r = {x["doc_id"]: x for x in got.to_pylist()}
        assert set(r) == {0, 1, 2}
        assert r[0]["n_dup_spans"] == 2 and r[1]["n_dup_spans"] == 2
        assert r[2]["n_dup_spans"] == 0
        # doc 0: 14 tokens -> 7 spans; doc 1: 11 tokens -> 4 spans
        assert r[0]["n_spans"] == 7 and r[1]["n_spans"] == 4
        assert r[2]["n_spans"] == 3

    def test_within_doc_repeat_not_dup(self, ray_session, tmp_path):
        # the same span repeated INSIDE one doc is not a duplicate —
        # nd counts distinct documents
        t = "alpha bravo charlie delta echo foxtrot golf hotel"
        rows = [(0, t + " " + t, "s0"),
                (1, "zulu yankee xray whiskey victor uniform tango "
                    "sierra", "s1")]
        _docs(tmp_path, rows)
        got = _table(QUERIES["dup_spans"][0](str(tmp_path)))
        r = {x["doc_id"]: x for x in got.to_pylist()}
        assert r[0]["n_dup_spans"] == 0

    def test_oracle_parity_random(self, ray_session, tmp_path):
        rng = np.random.default_rng(60)
        rows = []
        for i in range(300):
            n = int(rng.integers(2, 40))
            toks = [WORDS[int(rng.integers(0, len(WORDS)))]
                    for _ in range(n)]
            rows.append((i, " ".join(toks), f"s{i % 5}"))
        # plant exact 12-token duplicates across doc pairs
        for i in range(0, 40, 2):
            span = " ".join(WORDS[int(rng.integers(0, len(WORDS)))]
                            for _ in range(12))
            rows[i] = (i, rows[i][1] + " " + span, rows[i][2])
            rows[i + 1] = (i + 1, span + " " + rows[i + 1][1],
                           rows[i + 1][2])
        _docs(tmp_path, rows)
        got = _table(QUERIES["dup_spans"][0](str(tmp_path)))
        want = _oracle(tmp_path, QUERIES["dup_spans"][1], ["documents"])
        assert got.num_rows == 25
        assert int(pa.compute.sum(got.column("n_dup_spans")).as_py()) > 0
        assert _sorted_rows(got) == _sorted_rows(want)


class TestPreferencePairs:
    def test_hand_extremes_and_ties(self, ray_session, tmp_path):
        # conv 1 (user 1): purchases with DIFFERENT text lengths —
        # eids 13/53 are same-shape log lines (equal length), eid 104
        # is longer (3-digit id). conv 2: single purchase -> dropped.
        rows = [(13, 1, 1000, "purchase", 1.0, "{}"),
                (53, 1, 2000, "purchase", 1.0, "{}"),
                (104, 1, 3000, "purchase", 1.0, "{}"),
                (55, 1, 4000, "click", 1.0, "{}"),
                (21, 2, 5000, "purchase", 1.0, "{}")]
        _events(tmp_path, rows)
        from raybeats.transcripts import derive_transcripts
        tr = derive_transcripts(pq.read_table(tmp_path / "events.parquet"))
        by_idx = {r["turn_idx"]: r for r in tr.to_pylist()}
        lens = {i: len(by_idx[i]["text"]) for i in (13, 53, 104)}
        assert lens[13] == lens[53]  # the planted tie
        got = _table(QUERIES["preference_pairs"][0](str(tmp_path)))
        r = {x["conv_id"]: x for x in got.to_pylist()}
        assert len(r) == 1
        row = r["conv-00000001"]
        if lens[104] > lens[13]:
            assert row["chosen_idx"] == 104
        # rejected: min len, tie -> LATEST turn_idx
        assert row["rejected_idx"] == 53
        assert row["chosen_len"] == max(lens.values())
        assert row["rejected_len"] == min(lens.values())

    def test_oracle_parity_random(self, ray_session, tmp_path):
        rng = np.random.default_rng(61)
        kinds = ["signup", "click", "view", "purchase", "error"]
        rows = [(i, int(rng.integers(0, 30)),
                 int(rng.integers(0, 10**9)),
                 kinds[int(rng.integers(0, 5))],
                 float(rng.normal(0, 5)),
                 '{"k": %d}' % int(rng.integers(0, 9)))
                for i in range(2000)]
        _events(tmp_path, rows)
        got = _table(QUERIES["preference_pairs"][0](str(tmp_path)))
        want = _oracle(tmp_path, QUERIES["preference_pairs"][1],
                       ["events"])
        assert got.num_rows > 0
        assert _sorted_rows(got) == _sorted_rows(want)


class TestHardNegatives:
    def test_brute_force_parity(self, ray_session, tmp_path):
        rng = np.random.RandomState(7)
        vecs = rng.randn(120, 16).astype(np.float32).tolist()
        labels = [int(i % 5) for i in range(120)]
        _embeddings(tmp_path, vecs, labels)
        got = _table(QUERIES["hard_negatives"][0](str(tmp_path)))
        e = np.array(vecs, np.float64)
        en = e / np.linalg.norm(e, axis=1, keepdims=True)
        lab = np.array(labels)
        for qid in range(8):
            sims = en[qid] @ en.T
            ok = np.flatnonzero(lab != lab[qid])
            # sort by (-sim, id) — the engine's tie rule
            order = ok[np.lexsort((ok, -sims[ok]))][:3]
            mine = got.filter(
                pa.compute.equal(got.column("query_id"), qid))
            assert mine.column("neg_id").to_pylist() == order.tolist()
            assert mine.column("rank").to_pylist() == [1, 2, 3]

    def test_no_same_label_and_oracle_parity(self, ray_session,
                                             tmp_path):
        rng = np.random.RandomState(9)
        vecs = rng.randn(80, 8).astype(np.float32).tolist()
        labels = [int(rng.randint(0, 3)) for _ in range(80)]
        _embeddings(tmp_path, vecs, labels)
        got = _table(QUERIES["hard_negatives"][0](str(tmp_path)))
        lab = {i: labels[i] for i in range(80)}
        for r in got.to_pylist():
            assert lab[r["neg_id"]] != lab[r["query_id"]]
        want = _oracle(tmp_path, QUERIES["hard_negatives"][1],
                       ["embeddings"])
        assert _sorted_rows(got) == _sorted_rows(want)
