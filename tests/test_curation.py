"""Corpus-curation operators: PII scrub, repetition stats, hash split,
contamination flag (pure-kernel tests — no Ray session needed except
where a Dataset query is driven)."""

import numpy as np
import pyarrow as pa
import pytest

from raybeats.textops.curation import (ContaminationFlagger, hash_split,
                                       pii_scrub, repetition_stats)


def _docs(rows):
    return pa.table({"doc_id": pa.array(range(len(rows)), pa.int64()),
                     "text": pa.array(rows, pa.string())})


class TestPiiScrub:
    def test_redacts_all_three_kinds(self):
        t = pii_scrub(_docs([
            "mail bob.smith+x@corp.example.org now",
            "ssn is 123-45-6789 ok",
            "from 192.168.0.17 port 80",
            "clean text with no pii at all",
        ]))
        assert t.column("clean_text").to_pylist() == [
            "mail <EMAIL> now", "ssn is <SSN> ok",
            "from <IP> port 80", "clean text with no pii at all"]
        assert t.column("n_email").to_pylist() == [1, 0, 0, 0]
        assert t.column("n_ssn").to_pylist() == [0, 1, 0, 0]
        assert t.column("n_ip").to_pylist() == [0, 0, 1, 0]

    def test_ip_inside_email_not_double_counted(self):
        # host part contains an IP-shaped run; staging replaces the email
        # FIRST so the ip pass never sees it
        t = pii_scrub(_docs(["x u@10.1.2.34.example.com y"]))
        row = t.to_pylist()[0]
        assert row["clean_text"] == "x <EMAIL> y"
        assert (row["n_email"], row["n_ip"]) == (1, 0)

    def test_numeric_tld_is_ip_not_email(self):
        # u@10.1.2.34 is NOT a valid email (numeric TLD) — the ip pass
        # correctly picks up the address instead
        row = pii_scrub(_docs(["x u@10.1.2.34 y"])).to_pylist()[0]
        assert row["clean_text"] == "x u@<IP> y"
        assert (row["n_email"], row["n_ip"]) == (0, 1)

    def test_multiple_matches_counted(self):
        t = pii_scrub(_docs(["a@b.co c@d.io and 1.2.3.4 5.6.7.8"]))
        row = t.to_pylist()[0]
        assert row["n_email"] == 2 and row["n_ip"] == 2
        assert row["clean_text"] == "<EMAIL> <EMAIL> and <IP> <IP>"


class TestRepetitionStats:
    def test_repetitive_doc_dropped(self):
        varied = "the quick brown fox jumps over a lazy dog today"
        spammy = "buy now " * 20
        t = repetition_stats(_docs([varied, spammy]))
        keep = t.column("keep").to_pylist()
        assert keep == [True, False]
        ratios = t.column("distinct_ratio").to_pylist()
        assert ratios[0] > 0.9 and ratios[1] < 0.3

    def test_counts_match_naive(self):
        texts = ["One two TWO three;three,three", "", "x"]
        t = repetition_stats(_docs(texts))
        import re
        for i, text in enumerate(texts):
            toks = re.findall(r"[a-z0-9]+", text.lower())
            assert t.column("n_tokens")[i].as_py() == len(toks)
            want_distinct = len(set(toks)) / max(len(toks), 1)
            assert abs(t.column("distinct_ratio")[i].as_py()
                       - want_distinct) < 1e-12
            want_top = (max((toks.count(w) for w in set(toks)), default=0)
                        / max(len(toks), 1))
            assert abs(t.column("top_ratio")[i].as_py() - want_top) < 1e-12

    def test_short_doc_dropped(self):
        t = repetition_stats(_docs(["one two three"]))
        assert t.column("keep").to_pylist() == [False]  # < 5 tokens


class TestHashSplit:
    def test_deterministic_and_partition_invariant(self):
        t = pa.table({"doc_id": pa.array(range(1000), pa.int64())})
        a = hash_split(t)
        # same ids in a different batch slicing → same assignment
        b = pa.concat_tables([hash_split(t.slice(0, 337)),
                              hash_split(t.slice(337))])
        assert a.equals(b)

    def test_proportions(self):
        t = pa.table({"doc_id": pa.array(range(20000), pa.int64())})
        s = hash_split(t).column("split").to_pylist()
        frac_train = s.count("train") / len(s)
        frac_val = s.count("val") / len(s)
        assert 0.77 < frac_train < 0.83
        assert 0.08 < frac_val < 0.12

    def test_buckets_cover_range(self):
        t = pa.table({"doc_id": pa.array(range(5000), pa.int64())})
        b = hash_split(t).column("bucket").to_pylist()
        assert min(b) >= 0 and max(b) <= 99
        assert len(set(b)) > 90  # multiplicative mix actually spreads


class TestQuotaSample:
    def test_quota_respected_and_deterministic(self, ray_session):
        import ray.data as rd

        from raybeats.textops.curation import quota_sample
        t = pa.table({
            "doc_id": pa.array(range(500), pa.int64()),
            "lang": pa.array([["en", "de", "fr"][i % 3]
                              for i in range(500)], pa.string())})
        out = quota_sample(rd.from_arrow(t).repartition(4),
                           n_per_group=7).to_pandas()
        assert (out.groupby("lang").size() == 7).all()
        # partition-invariant: a different block split picks the SAME rows
        out2 = quota_sample(rd.from_arrow(t).repartition(9),
                            n_per_group=7).to_pandas()
        a = out.sort_values(["lang", "doc_id"]).reset_index(drop=True)
        b = out2.sort_values(["lang", "doc_id"]).reset_index(drop=True)
        assert a.equals(b)

    def test_small_group_kept_whole(self, ray_session):
        import ray.data as rd

        from raybeats.textops.curation import quota_sample
        t = pa.table({"doc_id": pa.array(range(10), pa.int64()),
                      "lang": pa.array(["en"] * 8 + ["zh"] * 2,
                                       pa.string())})
        out = quota_sample(rd.from_arrow(t), n_per_group=5).to_pandas()
        sizes = out.groupby("lang").size()
        assert sizes["en"] == 5 and sizes["zh"] == 2


class TestContamination:
    def test_flags_containing_docs_only(self):
        snip = "forbidden benchmark passage"
        f = ContaminationFlagger([snip, "another eval answer"])
        t = f(_docs([
            f"prefix {snip} suffix",
            "innocent document",
            "has another eval answer and " + snip,
        ]))
        assert t.column("contaminated").to_pylist() == [True, False, True]
        assert t.column("n_hits").to_pylist() == [1, 0, 2]


def test_curation_queries_smoke(ray_session):
    """Drive the four Dataset queries end-to-end at sf0.001."""
    from raybeats.queries import (q_contamination, q_hash_split, q_pii_scrub,
                                  q_repetition_stats)
    sf = "/root/testdata/sf0.001"
    pii = q_pii_scrub(sf).to_pandas()
    planted = pii[pii.doc_id % 7 == 0]
    assert (planted.n_email >= 1).all() and (planted.n_ip >= 1).all()
    assert not pii.clean_text.str.contains("@example.com").any()

    rep = q_repetition_stats(sf).to_pandas()
    assert not rep[rep.doc_id % 13 == 0].keep.any()  # planted spam dropped
    assert rep[rep.doc_id % 13 != 0].keep.mean() > 0.9

    spl = q_hash_split(sf).to_pandas()
    assert set(spl.split.unique()) <= {"train", "val", "test"}

    con = q_contamination(sf).to_pandas()
    src = con[(con.doc_id % 97 == 0)]
    assert (src.n_hits >= 1).any()  # snippet sources flag themselves
    assert (con.n_hits == 0).any()


class TestPackSequences:
    def test_matches_naive_prefix_sum_and_partition_invariant(
            self, ray_session):
        import ray.data as rd
        from raybeats.textops.curation import pack_sequences
        rng = np.random.default_rng(17)
        # sparse, shuffled ids — bucket monotonicity must not assume
        # dense or ordered input
        ids = rng.permutation(np.arange(0, 5000, 3))
        tok = rng.integers(0, 900, len(ids))
        t = pa.table({"doc_id": pa.array(ids, pa.int64()),
                      "n_tok": pa.array(tok, pa.int64())})
        order = np.argsort(ids)
        cum = np.cumsum(tok[order])
        want = dict(zip(ids[order].tolist(),
                        ((cum - tok[order]) // 512).tolist()))
        for parts in (1, 11):
            out = pack_sequences(
                rd.from_arrow(t).repartition(parts), budget=512,
                id_max=int(ids.max()), n_buckets=16).to_pandas()
            got = dict(zip(out["doc_id"], out["pack_id"]))
            assert got == want

    def test_straddler_belongs_to_starting_pack(self, ray_session):
        import ray.data as rd
        from raybeats.textops.curation import pack_sequences
        # doc 1 starts at token 90 (< 100) but spans past the boundary:
        # it belongs to pack 0
        t = pa.table({"doc_id": pa.array([0, 1, 2], pa.int64()),
                      "n_tok": pa.array([90, 50, 10], pa.int64())})
        out = pack_sequences(rd.from_arrow(t), budget=100, id_max=2,
                             n_buckets=2).to_pandas() \
            .sort_values("doc_id")
        assert out["pack_id"].tolist() == [0, 0, 1]

    def test_pack_sequences_randomized_sweep(self, ray_session):
        import ray.data as rd
        from raybeats.textops.curation import pack_sequences
        for seed in range(5):
            rng = np.random.default_rng(500 + seed)
            n = int(rng.integers(1, 400))
            ids = rng.choice(np.arange(0, 4 * n), size=n, replace=False)
            tok = rng.integers(0, 300, n)
            budget = int(rng.choice([1, 64, 999]))
            nb = int(rng.choice([1, 8, 32]))
            t = pa.table({"doc_id": pa.array(ids, pa.int64()),
                          "n_tok": pa.array(tok, pa.int64())})
            order = np.argsort(ids)
            cum = np.cumsum(tok[order])
            want = dict(zip(ids[order].tolist(),
                            ((cum - tok[order]) // budget).tolist()))
            out = pack_sequences(
                rd.from_arrow(t).repartition(int(rng.integers(1, 9))),
                budget=budget, id_max=int(ids.max()),
                n_buckets=nb).to_pandas()
            got = dict(zip(out["doc_id"], out["pack_id"]))
            assert got == want, (seed, budget, nb)


class TestOversampleMixture:
    def test_expectation_floor_and_determinism(self, ray_session):
        import ray.data as rd
        from raybeats.textops.curation import oversample_mixture
        n = 4000
        t = pa.table({
            "doc_id": pa.array(np.arange(n), pa.int64()),
            "source": pa.array(["a" if i % 2 == 0 else "b"
                                for i in range(n)], pa.string())})
        w = {"a": 2250, "b": 500}  # 2.25 and 0.5 epochs
        outs = []
        for parts in (1, 7):
            out = oversample_mixture(rd.from_arrow(t).repartition(parts),
                                     w).to_pandas()
            outs.append(sorted(zip(out["doc_id"], out["epoch"])))
        assert outs[0] == outs[1]  # partition-invariant, no RNG
        df = outs[0]
        per_doc = {}
        for d, e in df:
            per_doc[d] = max(per_doc.get(d, 0), e)
        a_counts = [per_doc.get(i, 0) for i in range(0, n, 2)]
        b_counts = [per_doc.get(i, 0) for i in range(1, n, 2)]
        assert set(a_counts) <= {2, 3}      # floor 2 + bernoulli
        assert set(b_counts) <= {0, 1}      # floor 0 + bernoulli
        # empirical epoch rate within 10% of the weight
        assert abs(sum(a_counts) / len(a_counts) - 2.25) < 0.1
        assert abs(sum(b_counts) / len(b_counts) - 0.5) < 0.1
        # epochs are 1..count, dense
        for d, e in df:
            assert 1 <= e <= per_doc[d]

    def test_zero_weight_and_default(self, ray_session):
        import ray.data as rd
        from raybeats.textops.curation import oversample_mixture
        t = pa.table({
            "doc_id": pa.array([1, 2, 3], pa.int64()),
            "source": pa.array(["drop", "keep", "unknown"], pa.string())})
        out = oversample_mixture(
            rd.from_arrow(t), {"drop": 0, "keep": 1000},
            default_millis=1000).to_pandas()
        assert sorted(zip(out["doc_id"], out["epoch"])) == [(2, 1), (3, 1)]
        with pytest.raises(ValueError, match="non-negative"):
            oversample_mixture(rd.from_arrow(t), {"a": -1})


class TestNormalizeText:
    def test_nfc_lower_collapse_trim(self):
        import unicodedata

        from raybeats.textops.curation import normalize_text
        docs = ["  Hello\t\tWORLD  ",
                "Café NAÏVE",   # decomposed -> composed
                "Café",                # precomposed stays
                "a\nb\r\nc",
                None, "", "   "]
        t = pa.table({"doc_id": pa.array(range(len(docs)), pa.int64()),
                      "text": pa.array(docs, pa.string())})
        out = normalize_text(t).column("norm_text").to_pylist()
        assert out[0] == "hello world"
        assert out[1] == "café naïve"  # composed bytes
        assert unicodedata.is_normalized("NFC", out[1])
        assert out[2] == "café"
        assert out[3] == "a b c"
        assert out[4] is None
        assert out[5] == "" and out[6] == ""

    def test_ascii_batches_skip_python_path(self, monkeypatch):
        """The NFC fallback must not run on pure-ASCII input. Patch the
        module-local _nfc hook — patching global unicodedata.normalize
        breaks pytest's own internals mid-run."""
        from raybeats.textops import curation

        def boom(*a, **k):
            raise AssertionError("python NFC path hit on ASCII batch")

        monkeypatch.setattr(curation, "_nfc", boom)
        t = pa.table({"doc_id": pa.array([1], pa.int64()),
                      "text": pa.array(["plain  ascii\ttext"])})
        out = curation.normalize_text(t)
        assert out.column("norm_text").to_pylist() == ["plain ascii text"]
