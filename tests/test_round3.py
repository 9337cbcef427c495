"""Round-3 regression tests (ADVICE findings + verdict items)."""

import numpy as np
import pyarrow as pa
import pytest


def _fnv64(b: bytes) -> int:
    v = 0xCBF29CE484222325
    for byte in b:
        v = ((v ^ byte) * 0x100000001B3) & ((1 << 64) - 1)
    return v


def test_fnv1a_u64_long_row_fallback_is_exact_and_bounded():
    """A degenerate long token must not inflate the padded matrix
    (ADVICE: OOM risk) and must hash to the exact FNV-1a value."""
    from raybeats.util import _FNV64_VEC_MAX_LEN, fnv1a_u64
    vals = ["short", "x" * (_FNV64_VEC_MAX_LEN + 1), "", "y" * 10_000,
            None, "mid" * 100]
    h = fnv1a_u64(pa.array(vals, pa.string()))
    for got, v in zip(h, vals):
        assert int(got) == _fnv64((v or "").encode())


def test_last_terminator_end_multibyte(tmp_path):
    """Multi-byte line terminators ack to the END of the terminator, not
    one byte past its first byte (ADVICE identity.py finding)."""
    from raybeats.sources import identity as ident
    p = tmp_path / "log.txt"
    p.write_bytes(b"line1\r\nline2\r\npartial")
    end = ident._last_terminator_end(str(p), 0, p.stat().st_size, b"\r\n")
    assert end == len(b"line1\r\nline2\r\n")


def test_last_terminator_end_straddles_window(tmp_path, monkeypatch):
    """A terminator straddling the tail-scan window boundary is found."""
    from raybeats.sources import identity as ident
    monkeypatch.setattr(ident, "_TAIL_SCAN", 8)
    # place \r\n so the window boundary falls between \r and \n
    data = b"aaaaaa\r\n" + b"b" * 7  # size 15; windows [7,15) then [0,7+1)
    p = tmp_path / "log.txt"
    p.write_bytes(data)
    end = ident._last_terminator_end(str(p), 0, len(data), b"\r\n")
    assert end == 8


def test_wineventlog_ignore_failure_raises():
    from raybeats.processors import build_processor
    t = pa.table({"message": ["<not-an-event/>"]})
    with pytest.raises(ValueError, match="decode_xml_wineventlog"):
        build_processor({"decode_xml_wineventlog": {}}).apply(t)
    out = build_processor(
        {"decode_xml_wineventlog": {"ignore_failure": True}}).apply(t)
    assert out.column("log_flags").to_pylist()[0] is not None


def test_wineventlog_overwrite_keys_false_preserves_existing():
    from raybeats.processors import build_processor
    xml = ("<Event><System><Channel>Security</Channel>"
           "<Computer>box</Computer></System></Event>")
    t = pa.table({"message": [xml],
                  "winlog.channel": ["pre-existing"]})
    out = build_processor({"decode_xml_wineventlog": {
        "overwrite_keys": False, "ignore_failure": True}}).apply(t)
    assert out.column("winlog.channel").to_pylist() == ["pre-existing"]
    assert out.column("winlog.computer_name").to_pylist() == ["box"]


def test_registered_domain_reference_cases():
    """The reference's own test table, verbatim
    (registered_domain/registered_domain_test.go:30-47)."""
    from raybeats.processors import build_processor
    cases = [
        # (domain, registered_domain, subdomain, etld) — None = absent
        ("www.google.com", "google.com", "www", "com"),
        ("www.google.co.uk", "google.co.uk", "www", "co.uk"),
        ("www.mail.google.co.uk", "google.co.uk", "www.mail", "co.uk"),
        ("google.com", "google.com", None, "com"),
        ("www.ak.local", "ak.local", "www", "local"),
        ("www.navy.mil", "navy.mil", "www", "mil"),
        # error rows (bare suffix / empty / single label) → null
        ("com", None, None, None),
        (".", None, None, None),
        ("", None, None, None),
        ("localhost", None, None, None),
    ]
    p = build_processor({"registered_domain": {
        "field": "domain", "target_field": "registered_domain",
        "target_subdomain_field": "subdomain",
        "target_etld_field": "etld",
        # the error rows below must emit null, not raise (the
        # reference's config DEFAULT is ignore_failure=false)
        "ignore_failure": True}})
    t = p.apply(pa.table({"domain": pa.array([c[0] for c in cases],
                                             pa.string())}))
    assert t.column("registered_domain").to_pylist() == \
        [c[1] for c in cases]
    assert t.column("subdomain").to_pylist() == [c[2] for c in cases]
    assert t.column("etld").to_pylist() == [c[3] for c in cases]


def test_registered_domain_psl_wildcard_and_exception():
    from raybeats.processors import build_processor
    p = build_processor({"registered_domain": {
        "field": "d", "target_field": "rd", "target_etld_field": "etld",
        "ignore_failure": True}})  # the bare-suffix row emits null
    t = p.apply(pa.table({"d": pa.array([
        "foo.bar.kawasaki.jp",   # *.kawasaki.jp wildcard: etld=bar.kawasaki.jp
        "city.kawasaki.jp",      # !city.kawasaki.jp exception: etld=kawasaki.jp
        "sub.city.kawasaki.jp",
        "www.example.ck",        # *.ck wildcard
        "www.ck",                # !www.ck exception → registered domain www.ck
        "bucket.s3.amazonaws.com",       # private-section 3-label suffix
        "s3.amazonaws.com",              # bare suffix → null
        "a.b.github.io",
    ], pa.string())}))
    assert t.column("rd").to_pylist() == [
        "foo.bar.kawasaki.jp", "city.kawasaki.jp", "city.kawasaki.jp",
        "www.example.ck", "www.ck", "bucket.s3.amazonaws.com", None,
        "b.github.io"]
    assert t.column("etld").to_pylist() == [
        "bar.kawasaki.jp", "kawasaki.jp", "kawasaki.jp",
        "example.ck", "ck", "s3.amazonaws.com", None, "github.io"]


def test_registered_domain_custom_suffixes_and_failure_mode():
    import pytest as _pytest

    from raybeats.processors import build_processor
    p = build_processor({"registered_domain": {
        "field": "d", "target_field": "rd",
        "custom_suffixes": ["internal.corp", "*.dyn.corp"]}})
    t = p.apply(pa.table({"d": pa.array(
        ["svc.a.internal.corp", "x.y.dyn.corp"], pa.string())}))
    assert t.column("rd").to_pylist() == ["a.internal.corp", "x.y.dyn.corp"]
    # ignore_failure DEFAULTS false (reference config default): a bare
    # suffix raises unless the caller opts out
    strict = build_processor({"registered_domain": {
        "field": "d", "target_field": "rd"}})
    with _pytest.raises(ValueError, match="registered_domain"):
        strict.apply(pa.table({"d": pa.array(["com"], pa.string())}))
    # missing field passes through when EITHER ignore flag is set
    # (registered_domain.go:79), raises when neither is
    lax = build_processor({"registered_domain": {
        "field": "absent", "target_field": "rd", "ignore_failure": True}})
    t2 = pa.table({"d": pa.array(["a.com"], pa.string())})
    assert lax.apply(t2) == t2
    with _pytest.raises(Exception, match="missing"):
        strict_missing = build_processor({"registered_domain": {
            "field": "absent", "target_field": "rd"}})
        strict_missing.apply(t2)


def test_rolling_fingerprint_golden_parity():
    """Value-asserting check for the rolling-hash fingerprint (it has no
    SQL oracle): exact parity with an independent naive reimplementation
    plus the shift-stability property it exists for."""
    import hashlib

    from raybeats.textops.analysis import rolling_fingerprint

    def naive(text, window=16, base=257):
        b = text.encode("utf-8")
        if not text:
            return 0
        if len(b) <= window:
            return int(hashlib.md5(b).hexdigest()[:15], 16)
        best = None
        for i in range(len(b) - window + 1):
            h = 0
            for byte in b[i:i + window]:
                h = (h * base + byte) & ((1 << 64) - 1)
            best = h if best is None else min(best, h)
        return best & 0x7FFFFFFFFFFFFFFF

    texts = ["", "short", "a" * 16,
             "the quick brown fox jumps over the lazy dog",
             "naïve café — unicode bytes too",
             "x" * 100]
    t = rolling_fingerprint(pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts, pa.string())}))
    assert t.column("fp").to_pylist() == [naive(s) for s in texts]
    # shift stability: a prefix insertion far from the min window keeps
    # the fingerprint when the minimizing window survives
    base_text = "the quick brown fox jumps over the lazy dog" * 3
    shifted = "PREFIX " + base_text
    f1 = rolling_fingerprint(pa.table({"doc_id": [0], "text": [base_text]}))
    f2 = rolling_fingerprint(pa.table({"doc_id": [0], "text": [shifted]}))
    assert f1.column("fp").to_pylist() == f2.column("fp").to_pylist()


def test_simhash_matches_independent_naive_impl():
    """SimHasher's vectorized kernel vs a from-scratch per-token naive
    simhash (independent reimplementation — FNV-1a token hashes, bit
    votes). Strengthens the rows-only `simhash` query with a value
    assertion."""
    import re

    from raybeats.textops.dedup import SimHasher

    def fnv64(b: bytes) -> int:
        v = 0xCBF29CE484222325
        for byte in b:
            v = ((v ^ byte) * 0x100000001B3) & ((1 << 64) - 1)
        return v

    def naive(text: str) -> int:
        toks = re.findall(r"[a-z0-9]+", (text or "").lower())
        if not toks:
            return 0
        votes = [0] * 64
        for t in toks:
            h = fnv64(t.encode())
            for i in range(64):
                votes[i] += 1 if (h >> i) & 1 else -1
        out = 0
        for i in range(64):
            if votes[i] > 0:
                out |= 1 << i
        return out & 0x7FFFFFFFFFFFFFFF
    texts = ["hello world", "", "the quick brown fox 42 jumps",
             "AAA aaa BBB", "x" * 600 + " tail token",  # long-token path
             "ünïcode tokens stay ascii-split"]
    t = SimHasher()(pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts, pa.string())}))
    assert t.column("simhash").to_pylist() == [naive(s) for s in texts]


def test_running_sum_negative_values_and_duckdb_parity(ray_session, tmp_path):
    # negative cents break any monotone-base shortcut; parity vs the
    # window-function oracle on a synthetic table with sign flips
    import duckdb
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq
    from raybeats.queries import QUERIES, SQL_RUNNING_SUM

    rng = np.random.default_rng(13)
    n = 500
    t = pa.table({
        "event_id": pa.array(np.arange(n), pa.int64()),
        "ts": pa.array(rng.integers(0, 10**9, n), pa.timestamp("us")),
        "user_id": pa.array(rng.integers(0, 9, n), pa.int64()),
        "event_type": pa.array(["x"] * n, pa.string()),
        "value": pa.array(rng.normal(0, 50, n), pa.float64()),
        "props": pa.array(["{}"] * n, pa.string())})
    pq.write_table(t, tmp_path / "events.parquet")
    got = QUERIES["running_sum"][0](str(tmp_path)).to_pandas()
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * "
                f"FROM '{tmp_path}/events.parquet'")
    want = con.execute(SQL_RUNNING_SUM).df()
    g = got.sort_values("event_id").reset_index(drop=True)
    w = want.sort_values("event_id").reset_index(drop=True)
    assert (g["running_cents"].to_numpy()
            == w["running_cents"].to_numpy()).all()
    assert (g["running_cents"] < 0).any()  # sign flips actually hit


def test_event_gaps_nulls_first_event_per_user(ray_session, tmp_path):
    import duckdb
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq
    from raybeats.queries import QUERIES, SQL_EVENT_GAPS

    rng = np.random.default_rng(29)
    n = 300
    t = pa.table({
        "event_id": pa.array(np.arange(n), pa.int64()),
        "ts": pa.array(rng.integers(0, 10**8, n), pa.timestamp("us")),
        "user_id": pa.array(rng.integers(0, 6, n), pa.int64()),
        "event_type": pa.array(["x"] * n, pa.string()),
        "value": pa.array(np.zeros(n), pa.float64()),
        "props": pa.array(["{}"] * n, pa.string())})
    pq.write_table(t, tmp_path / "events.parquet")
    got = QUERIES["event_gaps"][0](str(tmp_path)).to_pandas() \
        .sort_values("event_id").reset_index(drop=True)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * "
                f"FROM '{tmp_path}/events.parquet'")
    want = con.execute(SQL_EVENT_GAPS).df() \
        .sort_values("event_id").reset_index(drop=True)
    assert got["gap_us"].isna().sum() == 6  # one NULL per user
    ga, wa = got["gap_us"].to_numpy(), want["gap_us"].to_numpy()
    both = ~(np.isnan(ga) | np.isnan(wa))
    assert (np.isnan(ga) == np.isnan(wa)).all()
    assert (ga[both] == wa[both]).all()
