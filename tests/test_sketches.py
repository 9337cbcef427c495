"""HyperLogLog distinct-count sketch: accuracy + mergeability."""

import numpy as np
import pyarrow as pa

from raybeats.textops.sketches import HyperLogLog, approx_distinct


def test_hll_accuracy_across_scales():
    rng = np.random.default_rng(7)
    for true_n in (100, 5_000, 200_000, 2_000_000):
        hll = HyperLogLog(p=14)
        # hash-distinct inputs: random 64-bit values stand in for hashes
        vals = rng.integers(0, 1 << 63, size=true_n,
                            dtype=np.uint64) * np.uint64(2) + np.uint64(1)
        vals = np.unique(vals)
        hll.add_hashed(vals)
        est = hll.estimate()
        err = abs(est - len(vals)) / len(vals)
        # p=14 -> ~0.8% rse; allow 4 sigma
        assert err < 0.035, (true_n, est, err)


def test_hll_merge_equals_single_pass():
    rng = np.random.default_rng(3)
    vals = rng.integers(0, 1 << 63, size=50_000, dtype=np.uint64)
    one = HyperLogLog(p=12)
    one.add_hashed(vals)
    parts = [HyperLogLog(p=12) for _ in range(4)]
    for i, part in enumerate(parts):
        part.add_hashed(vals[i::4])
    merged = parts[0]
    for part in parts[1:]:
        merged.merge(part)
    assert np.array_equal(merged.registers, one.registers)


def test_hll_column_nulls_and_types():
    hll = HyperLogLog(p=12)
    hll.add_column(pa.array(["a", "b", None, "a"], pa.string()))
    hll2 = HyperLogLog(p=12)
    hll2.add_column(pa.array(["a", "b"], pa.string()))
    assert np.array_equal(hll.registers, hll2.registers)
    # int columns hash via their string form
    hll3 = HyperLogLog(p=12)
    hll3.add_column(pa.array([1, 2, 3], pa.int64()))
    assert 2 < hll3.estimate() < 4.5


def test_approx_distinct_distributed(ray_session):
    import pyarrow.parquet as pq
    import ray.data as rd

    sf = "/root/testdata/sf0.01"
    exact = len(set(pq.read_table(f"{sf}/events.parquet",
                                  columns=["user_id"])
                    .column("user_id").to_pylist()))
    ds = rd.read_parquet(f"{sf}/events.parquet", columns=["user_id"],
                         override_num_blocks=8)
    est = approx_distinct(ds, "user_id", p=14)
    assert abs(est - exact) / exact < 0.05, (est, exact)
