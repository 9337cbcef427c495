"""Round-75: the grok engine (named-pattern expansion → one RE2 regex,
vectorized extract) and its first-match-wins multi-pattern form."""
import pyarrow as pa
import pytest

from raybeats.errors import ConfigError
from raybeats.grok import BASE_PATTERNS, GrokParser, MultiGrok


class TestExpansion:
    def test_nested_named_and_types(self):
        p = GrokParser("%{WORD:w} %{INT:n:int} %{NUMBER:x:float}")
        assert [(f, t) for f, _, t in p.sql_groups] == [
            ("w", "string"), ("n", "int"), ("x", "float")]
        # group indexes are exactly 1..k in field order
        assert [i for _, i, _ in p.sql_groups] == [1, 2, 3]

    def test_unnamed_refs_do_not_capture(self):
        p = GrokParser("%{WORD} %{INT:n:int}")
        assert p.sql_groups == [("n", 1, "int")]

    def test_unknown_pattern_raises(self):
        with pytest.raises(ConfigError, match="unknown pattern"):
            GrokParser("%{NOPE:x}")

    def test_bad_type_raises(self):
        with pytest.raises(ConfigError, match="unsupported type"):
            GrokParser("%{INT:x:bool}")

    def test_duplicate_field_raises(self):
        with pytest.raises(ConfigError, match="duplicate field"):
            GrokParser("%{WORD:x} %{WORD:x}")

    def test_cycle_raises(self):
        with pytest.raises(ConfigError, match="recursion"):
            GrokParser("%{A:a}", pattern_definitions={
                "A": "%{B}", "B": "%{A}"})

    def test_custom_definition(self):
        p = GrokParser("%{KV:kv}", pattern_definitions={
            "KV": r"%{WORD}=%{WORD}"})
        vals, ok = p.parse_column(pa.array(["a=b", "a b"]))
        assert ok.to_pylist() == [True, False]
        assert vals["kv"].to_pylist() == ["a=b", None]

    def test_library_has_no_anonymous_groups(self):
        """An anonymous capturing paren inside a library pattern would
        silently shift SQL group indexes. Composite patterns may carry
        their OWN named fields (COMMONAPACHELOG) — every group must be
        a named field, nothing more."""
        import re
        for name, pat in BASE_PATTERNS.items():
            p = GrokParser(f"%{{{name}:x}}")
            assert re.compile(p.regex_str).groups == len(p.fields), name
            assert any(f == "x" for f, _, _ in p.fields), name


class TestParse:
    def test_typed_extraction_and_nulls(self):
        p = GrokParser(r"^evt %{INT:evt_id:int} took %{NUMBER:sec:float}s$")
        vals, ok = p.parse_column(pa.array(
            ["evt 42 took 1.5s", "evt x took 1s", None]))
        assert ok.to_pylist() == [True, False, False]
        assert vals["evt_id"].type == pa.int64()
        assert vals["evt_id"].to_pylist() == [42, None, None]
        assert vals["sec"].to_pylist() == [1.5, None, None]

    def test_no_fields_pattern(self):
        p = GrokParser("^%{INT}$")
        vals, ok = p.parse_column(pa.array(["17", "x", None]))
        assert vals == {} and ok.to_pylist() == [True, False, False]

    def test_iso8601_variants(self):
        p = GrokParser("^%{TIMESTAMP_ISO8601:t}$")
        good = ["2024-01-01T00:09:58Z", "2024-12-31 23:59:60.123+05:30",
                "99-06-01T4:05", "2024-02-10T10:11:12"]
        bad = ["2024-13-01T00:00:00Z", "2024-00-01T00:00:00Z",
               "2024-01-32T00:00:00Z", "not a ts"]
        _, ok = p.parse_column(pa.array(good + bad))
        assert ok.to_pylist() == [True] * 4 + [False] * 4

    def test_chunked_input(self):
        p = GrokParser("^%{WORD:w}$")
        arr = pa.chunked_array([pa.array(["a"]), pa.array(["b c"])])
        vals, ok = p.parse_column(arr)
        assert vals["w"].to_pylist() == ["a", None]


class TestMultiGrok:
    G1 = r"^a=%{WORD:a} n=%{INT:n:int}$"
    G2 = r"^n=%{INT:n:int} only$"

    def test_first_match_wins(self):
        g = MultiGrok([self.G1, self.G2])
        vals, matched = g.parse_column(pa.array(
            ["a=x n=1", "n=2 only", "nope"]))
        assert matched.to_pylist() == [True, True, False]
        assert vals["a"].to_pylist() == ["x", None, None]
        assert vals["n"].to_pylist() == [1, 2, None]

    def test_earlier_pattern_shadows_later(self):
        # both patterns match; the first one's value must win
        g = MultiGrok([r"^%{WORD:w} .*$", r"^.* %{WORD:w}$"])
        vals, _ = g.parse_column(pa.array(["left right"]))
        assert vals["w"].to_pylist() == ["left"]

    def test_conflicting_types_raise(self):
        with pytest.raises(ConfigError, match="typed differently"):
            MultiGrok([r"%{INT:n:int}", r"%{INT:n:float}"])

    def test_empty_list_raises(self):
        with pytest.raises(ConfigError, match="empty pattern list"):
            MultiGrok([])


class TestGrokProcessor:
    def test_chain_integration(self):
        from raybeats.processors import build_chain
        chain = build_chain([{"grok": {
            "patterns": "evt %{INT:evt_id:int} %{WORD:action}",
            "field": "message", "target_prefix": "grok"}}])
        tbl = pa.table({"message": ["evt 7 click", "garbage"]})
        out = chain(tbl)
        assert out.column("grok.evt_id").to_pylist() == [7, None]
        assert out.column("grok.action").to_pylist() == ["click", None]

    def test_overwrite_guard(self):
        from raybeats.processors import build_chain
        chain = build_chain([{"grok": {
            "patterns": "%{WORD:message}", "field": "message"}}])
        with pytest.raises(ConfigError, match="cannot override"):
            chain(pa.table({"message": ["x"]}))


class TestGrokOracleParity:
    """The engine and DuckDB run the IDENTICAL regex string — assert
    on a hand-built corpus (the sf gates cover the driver tables)."""

    def test_duckdb_same_regex_same_groups(self):
        import duckdb
        p = GrokParser(r"^%{WORD:w} %{INT:n:int}$")
        rows = ["abc 42", "x -7", "nope", "a 1.5"]
        vals, ok = p.parse_column(pa.array(rows))
        re_sql = p.regex_str.replace("'", "''")
        got = duckdb.sql(
            f"SELECT regexp_matches(t, '{re_sql}'),"
            f" CASE WHEN regexp_matches(t, '{re_sql}') THEN"
            f" CAST(regexp_extract(t, '{re_sql}', 2) AS BIGINT) END"
            f" FROM (SELECT unnest({rows!r}) AS t)").fetchall()
        assert [r[0] for r in got] == ok.to_pylist()
        assert [r[1] for r in got] == vals["n"].to_pylist()


class TestCidrEnrich:
    """Longest-prefix-match priority on hand-built IPs (the sf gates
    cover the driver tables end-to-end)."""

    def test_priority_and_coverage(self, ray_session):
        import numpy as np
        import pyarrow.parquet as pq
        from raybeats.queries import _cidr_rules, q_cidr_enrich
        r8, r16, r24 = _cidr_rules()
        tbl = q_cidr_enrich("/root/testdata/sf0.001") \
            .take_batch(2000, batch_format="pyarrow")
        plen = np.asarray(tbl["plen"])
        ip = np.asarray(tbl["ip"])
        net = tbl["network"].to_pylist()
        # non-vacuous: all three depths fire even on this 15-user corpus
        assert set(np.unique(plen)) == {8, 16, 24}
        assert len(plen) == 1000
        s16 = set(r16["prefix"].tolist())
        s24 = set(r24["prefix"].tolist())
        for i in range(len(ip)):
            a, k16, k24 = ip[i] >> 24, ip[i] >> 16, ip[i] >> 8
            want, key = ((24, k24) if k24 in s24 else
                         (16, k16) if k16 in s16 else (8, a))
            assert plen[i] == want, (i, ip[i], plen[i], want)
            assert net[i] == f"net{want}-{key}"


class TestIsotonicPAV:
    """PAV stack vs the exact-rational minimax definition
    fit(k) = max_{i<=k} min_{j>=k} mean(i..j) on random inputs."""

    @staticmethod
    def _pav(npos, cnt):
        # the PRODUCTION kernel — not a copy (review finding)
        from raybeats.aggregates import pav_blocks
        return pav_blocks(npos, cnt)

    def test_matches_minimax_brute_force(self):
        import random
        from fractions import Fraction
        rng = random.Random(7)
        for trial in range(200):
            n = rng.randint(1, 12)
            cnt = [rng.randint(1, 5) for _ in range(n)]
            npos = [rng.randint(0, c) for c in cnt]
            blocks = self._pav(npos, cnt)
            # expand block means to per-position fits
            got = {}
            for sp, sn, lo, hi in blocks:
                for k in range(lo, hi + 1):
                    got[k] = Fraction(sp, sn)
            pre_p = [0]
            pre_n = [0]
            for p, c in zip(npos, cnt):
                pre_p.append(pre_p[-1] + p)
                pre_n.append(pre_n[-1] + c)
            for k in range(n):
                want = max(
                    min(Fraction(pre_p[j + 1] - pre_p[i],
                                 pre_n[j + 1] - pre_n[i])
                        for j in range(k, n))
                    for i in range(k + 1))
                assert got[k] == want, (trial, k, npos, cnt)
            # invariants: strictly increasing block means partitioning
            # the index range (>= merge pools equal means)
            for a, b in zip(blocks, blocks[1:]):
                assert a[0] * b[1] < b[0] * a[1]
                assert b[2] == a[3] + 1
            assert blocks[0][2] == 0 and blocks[-1][3] == n - 1
            assert sum(b[1] for b in blocks) == sum(cnt)


class TestMarkJoin:
    """Three-valued IN semantics on hand-built tables — every branch
    of the SQL truth table, including the global facts (right-has-null
    / right-non-empty) that ride the shuffle as marker rows."""

    @staticmethod
    def _run(left_keys, right_keys, n_buckets=4):
        import ray.data as rd
        left = rd.from_arrow(pa.table({"k": pa.array(left_keys,
                                                     pa.int64())}))
        right = rd.from_arrow(pa.table({"k": pa.array(right_keys,
                                                      pa.int64())}))
        from raybeats.joins import mark_join
        out = mark_join(left, right, on="k", mark_col="m",
                        n_buckets=n_buckets).take_all()
        return {r["k"]: r["m"] for r in out}

    def test_truth_table(self, ray_session):
        import duckdb
        cases = [
            ([1, 2, None], [1, 3]),        # match/no-match/null-left
            ([1, 2, None], [1, None]),     # right has null
            ([1, None], []),               # right empty
            ([5], [None]),                 # right all-null
        ]
        for lk, rk in cases:
            got = self._run(lk, rk)
            want = {}
            rlit = ", ".join("NULL" if v is None else str(v)
                             for v in rk)
            sub = (f"SELECT CAST(unnest([{rlit}]) AS BIGINT)"
                   if rk else "SELECT CAST(NULL AS BIGINT) WHERE false")
            for k in lk:
                klit = "CAST(NULL AS BIGINT)" if k is None else str(k)
                want[k] = duckdb.sql(
                    f"SELECT {klit} IN ({sub})").fetchone()[0]
            assert got == want, (lk, rk, got, want)

    def test_reserved_mark_col(self, ray_session):
        import ray.data as rd
        from raybeats.joins import mark_join
        left = rd.from_arrow(pa.table({"k": [1], "m": [True]}))
        with pytest.raises(ValueError, match="duplicate or reserved"):
            mark_join(left, left, on="k", mark_col="m", n_buckets=2)


class TestZorder:
    def test_morton_interleave_exact(self):
        # spread(x) | spread(y) << 1 must equal bit-by-bit interleave;
        # exercises the PRODUCTION kernel, not a copy (review finding)
        import random

        from raybeats.queries import morton_spread16 as spread
        rng = random.Random(3)

        for _ in range(200):
            x, y = rng.randrange(65536), rng.randrange(65536)
            z = spread(x) | (spread(y) << 1)
            want = 0
            for b in range(16):
                want |= ((x >> b) & 1) << (2 * b)
                want |= ((y >> b) & 1) << (2 * b + 1)
            assert z == want, (x, y)

    def test_locality_bound(self, ray_session):
        """Each z-bucket spans at most 2^8 in either dimension (the
        pruning property a zone-map reader relies on)."""
        from raybeats.queries import q_zorder_stats
        t = q_zorder_stats("/root/testdata/sf0.001")
        assert t.num_rows > 0
        import numpy as np
        dspan = (np.asarray(t["day_hi"]) - np.asarray(t["day_lo"]))
        uspan = (np.asarray(t["usd_hi"]) - np.asarray(t["usd_lo"]))
        assert (dspan < 256).all() and (uspan < 256).all()
        assert int(np.asarray(t["n"]).sum()) == 1000


class TestBootstrapMean:
    def test_weights_are_poisson1_ish_and_partition_invariant(
            self, ray_session):
        import numpy as np
        from raybeats.queries import q_bootstrap_mean
        t = q_bootstrap_mean("/root/testdata/sf0.001")
        assert t.num_rows == 32
        den = np.asarray(t["den"])
        # E[Σw] = n = 1000 per replica; Var = n → ±5σ ≈ ±158
        assert (np.abs(den - 1000) < 160).all(), den
        means = np.asarray(t["mean_cents"])
        # replicas resample the same corpus: spread, but same ballpark
        assert means.std() > 0 and np.abs(
            means - means.mean()).max() < means.mean() * 0.2

    def test_replica_weights_deterministic(self):
        # the inverse-CDF branch: u below the first threshold → 0,
        # just above → 1, near 1.0 → tail capped at 8
        import numpy as np
        from raybeats.queries import _poisson1_thresholds
        thr = _poisson1_thresholds()
        assert abs(thr[0] - np.exp(-1.0)) < 1e-15
        u = np.array([0.0, thr[0] - 1e-12, thr[0], thr[1] - 1e-12,
                      0.99999, 1.0 - 1e-16])
        w = np.searchsorted(thr, u, side="right")
        assert w.tolist() == [0, 0, 1, 1, 8, 8]


class TestEmbedQuantize:
    def test_error_bound_and_clip(self, ray_session):
        """Quantization error must be ≤ scale/2 per dim (the mid-rise
        reconstruction bound), zero on constant dims."""
        import numpy as np
        from raybeats.queries import q_embed_quantize
        t = q_embed_quantize("/root/testdata/sf0.001")
        assert t.num_rows == 64
        lo = np.asarray(t["lo"]); hi = np.asarray(t["hi"])
        err = np.asarray(t["max_err"]); clip = np.asarray(t["n_clip"])
        scale = (hi - lo) / 255.0
        assert (err <= scale / 2 + 1e-12).all()
        assert (clip >= 0).all() and (err >= 0).all()
        assert err.max() > 0  # non-vacuous


class TestKmSurvival:
    def test_ingredient_identities(self, ray_session):
        """at_risk is the suffix sum of churn; totals = user count."""
        import numpy as np
        import pyarrow.parquet as pq
        from raybeats.queries import q_km_survival
        t = q_km_survival("/root/testdata/sf0.001")
        churn = np.asarray(t["n_churn"]); ar = np.asarray(t["at_risk"])
        assert (ar == churn[::-1].cumsum()[::-1]).all()
        users = pq.read_table("/root/testdata/sf0.001/events.parquet",
                              columns=["user_id"])
        n_users = len(pa.compute.unique(users.column("user_id")))
        assert churn.sum() == n_users == ar[0]
        # survival product: monotone non-increasing in [0, 1], and 0
        # at the horizon (every user's last event is observed)
        s = np.cumprod(1 - churn / ar)
        assert (s >= 0).all() and (s <= 1).all()
        assert (np.diff(s) <= 0).all() and s[-1] == 0


class TestDidEstimate:
    def test_cells_and_did_identity(self, ray_session):
        import numpy as np
        from raybeats.queries import q_did_estimate
        t = q_did_estimate("/root/testdata/sf0.001")
        assert t.num_rows == 4
        m = {(tr, po): mc for tr, po, mc in zip(
            t["treat"].to_pylist(), t["post"].to_pylist(),
            t["mean_cents"].to_pylist())}
        did = t["did"].to_pylist()[0]
        assert did == (m[(1, 1)] - m[(1, 0)]) - (m[(0, 1)] - m[(0, 0)])
        assert all(d == did for d in t["did"].to_pylist())
        assert sum(t["n"].to_pylist()) > 0


class TestEvolveRoundtrip:
    def test_late_column_null_on_old_generation(self, ray_session):
        from raybeats.queries import q_evolve_roundtrip
        b = q_evolve_roundtrip("/root/testdata/sf0.001") \
            .take_batch(2000, batch_format="pyarrow")
        eid = b["event_id"].to_pylist()
        vc = b["value_cents"].to_pylist()
        assert len(eid) == 1000
        for e, v in zip(eid, vc):
            if e % 2 == 0:
                assert v is None, (e, v)   # v1 generation: late col null
            else:
                assert isinstance(v, int)  # v2 generation: real cents


class TestLttb:
    def test_fixed_endpoints_and_size(self, ray_session):
        from raybeats.queries import q_lttb_downsample
        t = q_lttb_downsample("/root/testdata/sf0.001")
        assert t.num_rows == 24
        x = t["x"].to_pylist()
        assert x == sorted(x)
        assert t["pos"].to_pylist() == list(range(24))

    def test_matches_reference_float_impl(self):
        """The integer-area selection must match a straightforward
        float LTTB on random series (areas scaled by the bucket count
        are order-equivalent to the float triangle areas)."""
        import random
        from raybeats.queries import lttb_select
        rng = random.Random(11)
        for _ in range(50):
            n = rng.randint(5, 300)
            n_out = rng.randint(3, min(n, 40))
            x = sorted(rng.sample(range(n * 10), n))
            y = [rng.randint(0, 10_000) for _ in range(n)]
            got = lttb_select(x, y, n_out)
            want = self._lttb_float(x, y, n_out)
            assert got == want, (n, n_out)

    @staticmethod
    def _lttb_float(x, y, n_out):
        from fractions import Fraction
        n = len(x)
        if n <= n_out:
            return list(range(n))
        b = n_out - 2
        bucket = [None] + [(j * b) // (n - 2)
                           for j in range(n - 2)] + [None]
        sel, prev = [0], 0
        for k in range(b):
            cand = [i for i in range(1, n - 1) if bucket[i] == k]
            nxt = [i for i in range(1, n - 1) if bucket[i] == k + 1] \
                or [n - 1]
            ax = Fraction(sum(x[i] for i in nxt), len(nxt))
            ay = Fraction(sum(y[i] for i in nxt), len(nxt))
            best, best_a = None, Fraction(-1)
            for i in cand:
                a = abs((x[prev] - ax) * (y[i] - y[prev])
                        - (x[prev] - x[i]) * (ay - y[prev]))
                if a > best_a:
                    best, best_a = i, a
            sel.append(best)
            prev = best
        sel.append(n - 1)
        return sel

    def test_short_series_passthrough(self):
        from raybeats.queries import lttb_select
        assert lttb_select([1, 2, 3], [4, 5, 6], 10) == [0, 1, 2]


class TestReviewFixes:
    def test_grok_plus_signed_int(self):
        """'+7' matches the INT pattern and must cast like DuckDB's
        CAST('+7' AS BIGINT) instead of killing the batch."""
        p = GrokParser(r"^evt %{INT:n:int}$")
        vals, ok = p.parse_column(pa.array(["evt +7", "evt -3",
                                            "evt 9"]))
        assert ok.to_pylist() == [True, True, True]
        assert vals["n"].to_pylist() == [7, -3, 9]

    def test_rolling_checkpoint_invalidates_old_manifest(
            self, ray_session, monkeypatch):
        """Re-checkpointing into the same directory must remove the
        prior manifest BEFORE writing files, so a crash mid-overwrite
        can never leave the old manifest validating mixed state."""
        import shutil

        import ray.data as rd

        from raybeats import streaming as st

        t = pa.table({"event_id": pa.array([1, 2], pa.int64()),
                      "ts": pa.array([10, 20], pa.int64())
                      .cast(pa.timestamp("us")),
                      "user_id": pa.array([1, 2], pa.int64())})
        ck = "/tmp/raybeats_test_ckpt_rolling"
        shutil.rmtree(ck, ignore_errors=True)
        st.streaming_latest([rd.from_arrow(t)], n_buckets=2,
                            checkpoint_to=ck)
        # crash INSIDE the second checkpoint, after the old manifest
        # must already be gone
        import pyarrow.parquet as _pq
        real_write = _pq.write_table

        def boom(*a, **k):
            raise RuntimeError("simulated crash mid-checkpoint")

        monkeypatch.setattr(_pq, "write_table", boom)
        try:
            st.streaming_latest([rd.from_arrow(t)], n_buckets=2,
                                restore_from=ck, checkpoint_to=ck)
        except RuntimeError:
            pass
        monkeypatch.setattr(_pq, "write_table", real_write)
        # the interrupted checkpoint left NO manifest → resume refuses
        with pytest.raises(FileNotFoundError, match="manifest"):
            st.streaming_latest([rd.from_arrow(t)], n_buckets=2,
                                restore_from=ck)


class TestMultiMarkJoin:
    def test_two_marks_one_shuffle_truth(self, ray_session):
        import duckdb
        import ray.data as rd

        from raybeats.joins import multi_mark_join
        left = rd.from_arrow(pa.table({"k": pa.array([1, 2, 3, None],
                                                     pa.int64())}))
        r1 = rd.from_arrow(pa.table({"k": pa.array([1, None],
                                                   pa.int64())}))
        r2 = rd.from_arrow(pa.table({"k": pa.array([2, 3],
                                                   pa.int64())}))
        out = multi_mark_join(left, [(r1, "k", "m1"), (r2, "k", "m2")],
                              on="k", n_buckets=4).take_all()
        got = {r["k"]: (r["m1"], r["m2"]) for r in out}
        for k in [1, 2, 3, None]:
            klit = "CAST(NULL AS BIGINT)" if k is None else str(k)
            w1 = duckdb.sql(f"SELECT {klit} IN (SELECT unnest("
                            f"[1, NULL]::BIGINT[]))").fetchone()[0]
            w2 = duckdb.sql(f"SELECT {klit} IN (SELECT unnest("
                            f"[2, 3]::BIGINT[]))").fetchone()[0]
            assert got[k] == (w1, w2), k

    def test_duplicate_mark_cols_raise(self, ray_session):
        import ray.data as rd

        from raybeats.joins import multi_mark_join
        left = rd.from_arrow(pa.table({"k": [1]}))
        with pytest.raises(ValueError, match="duplicate or reserved"):
            multi_mark_join(left, [(left, "k", "m"), (left, "k", "m")],
                            on="k", n_buckets=2)


class TestApacheLog:
    LINES = [
        '127.0.0.1 - frank [10/Oct/2000:13:55:36 -0700] '
        '"GET /apache_pb.gif HTTP/1.0" 200 2326',
        '10.1.2.3 - - [21/Aug/2026:08:00:01 +0000] '
        '"POST /api/v1/items HTTP/1.1" 503 -',
        'not an access log line',
    ]

    def test_commonapachelog_fields(self):
        p = GrokParser("^%{COMMONAPACHELOG}$")
        vals, ok = p.parse_column(pa.array(self.LINES))
        assert ok.to_pylist() == [True, True, False]
        assert vals["clientip"].to_pylist() == ["127.0.0.1", "10.1.2.3",
                                                None]
        assert vals["auth"].to_pylist() == ["frank", "-", None]
        assert vals["verb"].to_pylist() == ["GET", "POST", None]
        assert vals["request"].to_pylist() == ["/apache_pb.gif",
                                               "/api/v1/items", None]
        assert vals["response"].to_pylist() == [200, 503, None]
        assert vals["bytes"].to_pylist() == [2326, None, None]
        assert vals["timestamp"].to_pylist() == [
            "10/Oct/2000:13:55:36 -0700", "21/Aug/2026:08:00:01 +0000",
            None]

    def test_access_log_pipeline_end_to_end(self, ray_session,
                                            tmp_path):
        """Raw access-log files → grok → route → partitioned sinks
        through the config surface (the classic Beats+grok use)."""
        from raybeats.pipeline import Pipeline

        log = tmp_path / "access.log"
        log.write_text("\n".join(self.LINES + [
            '192.168.0.9 - - [21/Aug/2026:09:10:11 +0000] '
            '"GET /health HTTP/1.1" 500 12']) + "\n")
        pipe = Pipeline({
            "source": {"type": "log_lines"},
            "processors": [
                {"grok": {"patterns": "%{COMMONAPACHELOG}",
                          "field": "message"}},
            ],
            "router": {
                "rules": [
                    {"sink": "dead_letter",
                     "when": {"contains": {"log_flags": "grok_error"}}},
                    {"sink": "errors",
                     "when": {"range": {"response": {"gte": 500}}}},
                    {"sink": "access"},
                ],
                "default": "access",
            },
        })
        out = str(tmp_path / "out")
        report = pipe.run([str(log)], out, partitions=1)
        assert report["per_sink"] == {"access": 1, "errors": 2,
                                      "dead_letter": 1}
        import glob

        import pyarrow.parquet as pq
        files = glob.glob(f"{out}/**/*.parquet", recursive=True)
        got = pa.concat_tables([pq.read_table(f) for f in files],
                               promote_options="default")
        sink = [f.split("sink=")[1].split("/")[0]
                for f in files for _ in range(
                    pq.read_metadata(f).num_rows)]
        resp = got.column("response").to_pylist()
        by = sorted(zip(sink, resp))
        assert ("errors", 503) in by and ("errors", 500) in by


class TestSyslogAndMultiFormat:
    def test_syslogline_fields(self):
        p = GrokParser("^%{SYSLOGLINE}$")
        vals, ok = p.parse_column(pa.array([
            "Aug 21 08:00:01 web01 sshd[4242]: Accepted publickey "
            "for root",
            "Aug  3 23:59:60 db-2.local cron: job done",
            "nope"]))
        assert ok.to_pylist() == [True, True, False]
        assert vals["logsource"].to_pylist() == ["web01", "db-2.local",
                                                 None]
        assert vals["program"].to_pylist() == ["sshd", "cron", None]
        assert vals["pid"].to_pylist() == [4242, None, None]
        assert vals["message"].to_pylist() == [
            "Accepted publickey for root", "job done", None]

    def test_multi_format_first_match_wins(self):
        """One MultiGrok over [apache, syslog]: each line takes its
        own format's fields, the other format's stay null."""
        g = MultiGrok(["^(?:%{COMMONAPACHELOG})$",
                       "^(?:%{SYSLOGLINE})$"])
        vals, matched = g.parse_column(pa.array([
            '1.2.3.4 - - [10/Oct/2000:13:55:36 -0700] '
            '"GET /x HTTP/1.0" 200 99',
            "Aug 21 08:00:01 web01 sshd[1]: hi",
            "garbage"]))
        assert matched.to_pylist() == [True, True, False]
        assert vals["clientip"].to_pylist() == ["1.2.3.4", None, None]
        assert vals["program"].to_pylist() == [None, "sshd", None]
        assert vals["response"].to_pylist() == [200, None, None]


class TestReviewFixes2:
    def test_did_short_rows_no_length_mismatch(self, monkeypatch):
        """Empty cells shrink the row set; the did column must shrink
        with it instead of raising a length mismatch."""
        import raybeats.queries as q

        real = q._combine_partials

        def drop_cell(ds, keys, sums, seed=None):
            t = real(ds, keys, sums, seed)
            # zero out one cell's count → it must vanish from output
            import pyarrow.compute as pc
            keep = pc.invert(pc.and_(pc.equal(t.column("treat"), 0),
                                     pc.equal(t.column("post"), 0)))
            return t.filter(keep)

        monkeypatch.setattr(q, "_combine_partials", drop_cell)
        out = q.q_did_estimate("/root/testdata/sf0.001")
        assert out.num_rows == 3
        assert out.column("did").to_pylist() == [None] * 3

    def test_struct_names_ordered_by_group_index(self):
        """%{COMMONAPACHELOG:line}: the outer field registers last but
        owns group 1 — the oracle's struct name list must follow group
        index, or every field silently mislabels."""
        import duckdb

        from raybeats.queries import _grok_sql_fields
        p = GrokParser("^%{COMMONAPACHELOG:line}$")
        line = ('1.2.3.4 - - [10/Oct/2000:13:55:36 -0700] '
                '"GET /x HTTP/1.0" 200 99')
        sql = ("SELECT " + _grok_sql_fields(
            p, p.regex_str.replace("'", "''")) +
            f" FROM (SELECT '{line}' AS text)")
        row = duckdb.sql(sql).fetchone()
        cols = [d[0] for d in duckdb.sql(sql).description]
        got = dict(zip(cols, row))
        vals, _ = p.parse_column(pa.array([line]))
        for f in ("clientip", "verb", "response", "bytes", "line"):
            assert got[f] == vals[f][0].as_py(), f

    def test_decimal_int_rounds_like_duckdb(self):
        p = GrokParser(r"^n=%{NUMBER:n:int}$")
        vals, ok = p.parse_column(pa.array(
            ["n=12.5", "n=-2.5", "n=7", "n=+3"]))
        # DuckDB CAST rounds half away from zero
        assert vals["n"].to_pylist() == [13, -3, 7, 3]

    def test_fieldless_raw_groups_allowed(self):
        p = GrokParser("^(GET|POST) .*$")
        vals, ok = p.parse_column(pa.array(["GET /x", "PUT /y"]))
        assert vals == {} and ok.to_pylist() == [True, False]

    def test_scratch_dir_purges_dead_pids_only(self, tmp_path):
        import os

        from raybeats.queries import _scratch_dir
        d1 = _scratch_dir("rb_test_scratch", "corpusA")
        os.makedirs(d1, exist_ok=True)
        # a stale sibling from a dead pid
        base = d1.rsplit("_", 1)[0]
        stale = f"{base}_999999999"
        os.makedirs(stale, exist_ok=True)
        d2 = _scratch_dir("rb_test_scratch", "corpusA")
        assert d2 == d1
        assert not os.path.exists(stale)   # dead pid purged
