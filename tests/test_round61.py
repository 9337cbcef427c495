"""Round-61 operator: ngram_jaccard — EXACT all-pairs token-4-gram
Jaccard ≥ 0.6 via symmetric prefix filtering (All-Pairs/PPJoin family).
Hand boundary cases, randomized brute-force completeness parity, the
three verify-path shapes under the token set_fn, and the group-pair
cap.
"""
import re

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

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
    t = pa.table({
        "doc_id": pa.array([r[0] for r in rows], pa.int64()),
        "text": pa.array([r[1] for r in rows], pa.string()),
        "lang": pa.array(["en"] * len(rows), pa.string()),
        "source": pa.array(["s"] * len(rows), pa.string()),
        "n_chars": pa.array([len(r[1] or "") for r in rows],
                            pa.int64())})
    pq.write_table(t, tmp_path / "documents.parquet")


def _grams(text, w=4):
    toks = re.findall(r"[a-z0-9]+", (text or "").lower())
    return {tuple(toks[i:i + w]) for i in range(len(toks) - w + 1)}


def _brute_pairs(rows, tau=0.6, w=4):
    """All (a, b, jaccard) with token-w-gram jaccard >= tau."""
    out = set()
    sets = {i: _grams(t, w) for i, t in rows}
    ids = sorted(sets)
    for x in range(len(ids)):
        for y in range(x + 1, len(ids)):
            a, b = ids[x], ids[y]
            sa, sb = sets[a], sets[b]
            if not sa or not sb:
                continue
            inter = len(sa & sb)
            union = len(sa | sb)
            j = inter / union
            if j >= tau:
                out.add((a, b, j))
    return out


def _run(tmp_path):
    fn, _sql = QUERIES["ngram_jaccard"]
    t = _table(fn(str(tmp_path)))
    return set(zip(t.column("a").to_pylist(), t.column("b").to_pylist(),
                   t.column("jaccard").to_pylist()))


WORDS = ["alpha", "bravo", "charlie", "delta", "echo", "foxtrot",
         "golf", "hotel", "india", "juliet", "kilo", "lima", "mike",
         "nov", "oscar", "papa"]


class TestNgramJaccardHand:
    def test_boundary_pairs(self, ray_session, tmp_path):
        # A: 7 tokens -> 4 grams g1..g4. B shares A's last 6 tokens +
        # one new -> |inter|=3, |union|=5 -> jaccard EXACTLY 0.6
        # (kept, >= boundary). C shares only g3,g4 -> 2/6 (dropped).
        # D == A verbatim -> jaccard 1.0. E has 3 tokens (no grams);
        # F is null text.
        a = "alpha bravo charlie delta echo foxtrot golf"
        b = "bravo charlie delta echo foxtrot golf hotel"
        c = "charlie delta echo foxtrot golf india juliet"
        rows = [(0, a), (1, b), (2, c), (3, a),
                (4, "kilo lima mike"), (5, None)]
        _docs(tmp_path, rows)
        got = _run(tmp_path)
        assert got == _brute_pairs(rows)
        pairs = {(x, y) for x, y, _ in got}
        assert (0, 1) in pairs and (0, 3) in pairs and (1, 3) in pairs
        assert (0, 2) not in pairs
        j = {(x, y): v for x, y, v in got}
        assert j[(0, 1)] == 0.6
        assert j[(0, 3)] == 1.0

    def test_oracle_parity(self, ray_session, tmp_path):
        rng = np.random.default_rng(61)
        rows = []
        for i in range(40):
            n = int(rng.integers(4, 30))
            rows.append((i, " ".join(rng.choice(WORDS, n))))
        # plant near-dups: copy with one token appended / one swapped
        for i in range(8):
            base = rows[i][1]
            rows.append((100 + i, base + " papa"))
        _docs(tmp_path, rows)
        fn, sql = QUERIES["ngram_jaccard"]
        ours = _table(fn(str(tmp_path))).sort_by(
            [("a", "ascending"), ("b", "ascending")])
        con = duckdb.connect()
        con.execute("CREATE VIEW documents AS SELECT * FROM "
                    f"'{tmp_path}/documents.parquet'")
        theirs = con.execute(sql).arrow().sort_by(
            [("a", "ascending"), ("b", "ascending")])
        assert ours.num_rows == theirs.num_rows > 0
        assert ours.equals(theirs.cast(ours.schema))


class TestNgramJaccardCompleteness:
    def test_randomized_brute_force(self, ray_session, tmp_path):
        # adversarial length mix: many docs right at the tau length
        # ratio, plus exact copies and overlapping windows — prefix
        # filtering must lose NOTHING vs brute force
        rng = np.random.default_rng(7)
        rows = []
        doc_id = 0
        for _ in range(25):
            n = int(rng.integers(4, 20))
            toks = list(rng.choice(WORDS, n))
            rows.append((doc_id, " ".join(toks)))
            doc_id += 1
            # sliding-window variant (high overlap, shifted)
            if n >= 8:
                rows.append((doc_id, " ".join(toks[1:] + ["oscar"])))
                doc_id += 1
            # exact copy
            if rng.random() < 0.4:
                rows.append((doc_id, " ".join(toks)))
                doc_id += 1
        _docs(tmp_path, rows)
        assert _run(tmp_path) == _brute_pairs(rows)

    def test_verify_paths_agree(self, ray_session, tmp_path,
                                monkeypatch):
        import ray.data as rd
        from raybeats.textops import dedup

        rows = [(i, " ".join(["alpha", "bravo", "charlie", "delta",
                              "echo"][: 4 + i % 2] + [WORDS[i % 12]]))
                for i in range(12)]
        rows += [(100 + i, t) for i, (_, t) in enumerate(rows[:6])]
        _docs(tmp_path, rows)
        expect = _brute_pairs(rows)
        assert expect  # non-vacuous
        got_driver = _run(tmp_path)
        monkeypatch.setattr(dedup, "_DRIVER_VERIFY_MAX_PAIRS", 0)
        got_broadcast = _run(tmp_path)
        monkeypatch.setattr(dedup, "_FAST_VERIFY_MAX_PAIRS", 0)
        got_cogroup = _run(tmp_path)
        assert got_driver == got_broadcast == got_cogroup == expect


class TestPrefixFilterInternals:
    def test_set_fn_matches_batch_kernel(self):
        from raybeats.textops.dedup import (_gram_sets_batch,
                                            token_gram_hash_set)
        texts = ["alpha bravo charlie delta echo", "kilo lima", "",
                 "alpha alpha alpha alpha alpha"]
        arr = pa.array(texts, pa.string())
        r, g, counts = _gram_sets_batch(arr, 4)
        for i, t in enumerate(texts):
            single = token_gram_hash_set(t, 4)
            batch = np.sort(g[r == i])
            assert np.array_equal(np.sort(single), batch)
            assert counts[i] == len(single)

    def test_group_pair_cap_raises(self, ray_session, tmp_path):
        import ray.data as rd
        from raybeats.textops.dedup import prefix_filter_candidates

        # 30 identical docs -> one gram group of 30 postings -> 435
        # pairs > cap of 10
        rows = [(i, "alpha bravo charlie delta") for i in range(30)]
        _docs(tmp_path, rows)
        ds = rd.read_parquet(str(tmp_path / "documents.parquet"),
                             columns=["doc_id", "text"])
        cand = prefix_filter_candidates(ds, tnum=3, tden=5, w=4,
                                        n_buckets=4,
                                        max_group_pairs=10)
        with pytest.raises(Exception, match="exploded"):
            cand.materialize()

    def test_length_ratio_prunes_but_keeps_boundary(self, ray_session,
                                                    tmp_path):
        # |small| = 3 grams, |big| = 5 grams: ratio 3/5 == tau allowed
        # (kept iff jaccard passes); |big| = 6 grams: 3/6 < tau — the
        # pair cannot qualify and must also be absent from brute force
        small = "alpha bravo charlie delta echo foxtrot"       # 3 grams
        big5 = small + " golf hotel"                           # 5 grams
        big6 = small + " golf hotel india"                     # 6 grams
        rows = [(0, small), (1, big5), (2, big6)]
        _docs(tmp_path, rows)
        got = _run(tmp_path)
        assert got == _brute_pairs(rows)
        # (0,1): 3/5 == tau kept; (1,2): 5/6 kept; (0,2): 3/6 < tau
        # (the length-ratio prune boundary) correctly absent
        assert {(x, y) for x, y, _ in got} == {(0, 1), (1, 2)}
