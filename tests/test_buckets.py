"""Adaptive shuffle-bucket sizing + vectorized string bucketing."""

import pyarrow as pa

from raybeats.util import adaptive_buckets, fnv1a_bucket


def _fnv1a_ref(s: str) -> int:
    h = 0xCBF29CE484222325
    for byte in s.encode("utf-8"):
        h = ((h ^ byte) * 0x100000001B3) & 0xFFFFFFFFFFFFFFFF
    return h


def test_fnv1a_bucket_matches_reference():
    vals = ["conv-00001234", "", "a", "héllo wörld", "x" * 200,
            None, "conv-00001234", "é中文"]
    got = fnv1a_bucket(pa.array(vals, pa.string()), 1000).to_pylist()
    want = [None if v is None else _fnv1a_ref(v) % 1000 for v in vals]
    assert got == want


def test_fnv1a_bucket_sliced_and_chunked():
    base = pa.array([f"key-{i}" for i in range(100)], pa.string())
    sl = base.slice(37, 25)
    got = fnv1a_bucket(sl, 64).to_pylist()
    want = [_fnv1a_ref(f"key-{i}") % 64 for i in range(37, 62)]
    assert got == want
    ch = pa.chunked_array([base.slice(0, 50), base.slice(50, 50)])
    assert fnv1a_bucket(ch, 64).to_pylist() == \
        [_fnv1a_ref(f"key-{i}") % 64 for i in range(100)]


def test_fnv1a_bucket_empty():
    assert fnv1a_bucket(pa.array([], pa.string()), 8).to_pylist() == []


def test_adaptive_buckets_scaling():
    # floor: small inputs keep the parallelism floor
    assert adaptive_buckets(10_000) == 64
    # linear scaling: per-group size stays bounded near target_rows
    assert adaptive_buckets(20_000_000) == 200
    assert adaptive_buckets(10**9) == 10_000
    # cap
    assert adaptive_buckets(10**15) == 1 << 20
    # bench scale (18.5M-turn corpus): buckets exceed the 32-cpu box
    assert adaptive_buckets(18_470_431) >= 32
    # per-group bound: rows/buckets <= target for large inputs
    for n in (10**7, 10**8, 10**9):
        assert n / adaptive_buckets(n) <= 100_000 + 1
