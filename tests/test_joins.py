"""As-of and range join operator tests (raybeats/joins.py)."""
import numpy as np
import pyarrow as pa
import pytest

from raybeats.joins import asof_join, range_join_broadcast


def _left():
    import ray.data as rd
    return rd.from_arrow(pa.table({
        "event_id": pa.array([1, 2, 3, 4, 5], pa.int64()),
        "ts": pa.array([100, 200, 300, 150, 50], pa.int64()).cast(
            pa.timestamp("us")),
        "user_id": pa.array([7, 7, 7, 9, 9], pa.int64()),
    }))


def _right():
    import ray.data as rd
    return rd.from_arrow(pa.table({
        "ts": pa.array([90, 200, 250, 160, 400], pa.int64()).cast(
            pa.timestamp("us")),
        "user_id": pa.array([7, 7, 7, 9, 9], pa.int64()),
        "state": pa.array(["a", "b", "c", "d", "e"], pa.string()),
    }))


def _run(**kw):
    out = asof_join(_left(), _right(), on="ts", by="user_id",
                    right_cols={"state": "state", "ts": "rts"},
                    n_buckets=4, **kw).to_pandas()
    return out.sort_values("event_id").reset_index(drop=True)


def test_asof_backward_left():
    out = _run()
    # user 7: ts100→90(a); ts200→200(b, equality admits); ts300→250(c)
    # user 9: ts150→none (160 is later); ts50→none
    assert out["state"].tolist() == ["a", "b", "c", None, None]
    assert out["rts"].iloc[0].value == 90_000  # ns in pandas


def test_asof_forward():
    out = _run(direction="forward")
    # nearest at-or-after: 100→200? no — 7 has 200,250 after 100 → 200(b)
    # 200→200(b); 300→400? 400 is user 9 → no match for user 7
    # 150→160(d); 50→160(d)
    assert out["state"].tolist() == ["b", "b", None, "d", "d"]


def test_asof_tolerance_and_inner():
    out = _run(tolerance_us=20)
    assert out["state"].tolist() == ["a", "b", None, None, None]
    inner = _run(how="inner")
    assert inner["state"].tolist() == ["a", "b", "c"]


def test_asof_right_dup_key_ts_picks_last_sorted():
    import ray.data as rd
    left = rd.from_arrow(pa.table({
        "ts": pa.array([10], pa.int64()), "k": pa.array([1], pa.int64())}))
    right = rd.from_arrow(pa.table({
        "ts": pa.array([5, 5], pa.int64()),
        "k": pa.array([1, 1], pa.int64()),
        "v": pa.array(["first", "second"], pa.string())}))
    out = asof_join(left, right, on="ts", by="k",
                    right_cols={"v": "v"}, n_buckets=2).to_pandas()
    assert out["v"].tolist() == ["second"]  # last in stable sort order


def test_asof_empty_right_side():
    import ray.data as rd
    right = rd.from_arrow(pa.table({
        "ts": pa.array([], pa.int64()).cast(pa.timestamp("us")),
        "user_id": pa.array([], pa.int64()),
        "state": pa.array([], pa.string())}))
    out = asof_join(_left(), right, on="ts", by="user_id",
                    right_cols={"state": "state"}, n_buckets=2).to_pandas()
    assert len(out) == 5 and out["state"].isna().all()


def _bands():
    return pa.table({
        "band": pa.array(["x", "y"], pa.string()),
        "lo": pa.array([0.0, 5.0], pa.float64()),
        "hi": pa.array([10.0, 20.0], pa.float64())})


def test_range_join_overlapping_emits_per_band():
    import ray.data as rd
    ds = rd.from_arrow(pa.table({
        "id": pa.array([1, 2, 3], pa.int64()),
        "v": pa.array([7.0, 3.0, 25.0], pa.float64())}))
    out = range_join_broadcast(ds, _bands(), value_col="v").to_pandas()
    got = sorted(zip(out["id"], out["band"]))
    assert got == [(1, "x"), (1, "y"), (2, "x")]  # 7 in both, 3 in x,
    # 25 in none


def test_range_join_closed_both_and_cap():
    import ray.data as rd
    ds = rd.from_arrow(pa.table({
        "id": pa.array([1], pa.int64()),
        "v": pa.array([10.0], pa.float64())}))
    left_closed = range_join_broadcast(ds, _bands(), value_col="v")
    assert left_closed.to_pandas()["band"].tolist() == ["y"]
    both = range_join_broadcast(ds, _bands(), value_col="v",
                                closed="both")
    assert sorted(both.to_pandas()["band"]) == ["x", "y"]
    big = pa.table({"band": pa.array(["b"] * 10, pa.string()),
                    "lo": pa.array(np.zeros(10), pa.float64()),
                    "hi": pa.array(np.ones(10), pa.float64())})
    with pytest.raises(ValueError, match="intervals"):
        range_join_broadcast(ds, big, value_col="v", max_intervals=5)


# ------------------------------------------------------------ hash_join

def _hj_sides():
    import ray.data as rd
    left = rd.from_arrow(pa.table({
        "k": pa.array([1, 2, 3, 3, 4], pa.int64()),
        "lv": pa.array(["a", "b", "c", "d", "e"], pa.string())}))
    right = rd.from_arrow(pa.table({
        "rk": pa.array([2, 3, 3, 5], pa.int64()),
        "rv": pa.array([20, 30, 31, 50], pa.int64())}))
    return left, right


def test_hash_join_inner_duplicates_multiply(ray_session):
    from raybeats.joins import hash_join
    left, right = _hj_sides()
    out = hash_join(left, right, on="k", right_on="rk",
                    how="inner", num_partitions=3).to_pandas()
    got = sorted(zip(out["k"], out["lv"], out["rv"]))
    # k=3 has 2 left rows x 2 right rows = 4 output rows
    assert got == [(2, "b", 20), (3, "c", 30), (3, "c", 31),
                   (3, "d", 30), (3, "d", 31)]


def test_hash_join_left_outer_nulls(ray_session):
    from raybeats.joins import hash_join
    left, right = _hj_sides()
    out = hash_join(left, right, on="k", right_on="rk",
                    how="left", num_partitions=3).to_pandas()
    unmatched = out[out["rv"].isna()]["k"].tolist()
    assert sorted(unmatched) == [1, 4]
    assert len(out) == 7  # 5 matches + 2 null-extended


def test_hash_join_collision_suffix_and_validation(ray_session):
    import ray.data as rd
    from raybeats.joins import hash_join
    left = rd.from_arrow(pa.table({"k": pa.array([1], pa.int64()),
                                   "v": pa.array([10], pa.int64())}))
    right = rd.from_arrow(pa.table({"k": pa.array([1], pa.int64()),
                                    "v": pa.array([99], pa.int64())}))
    out = hash_join(left, right, on="k", num_partitions=2).to_pandas()
    assert out["v"].tolist() == [10] and out["v_r"].tolist() == [99]
    with pytest.raises(ValueError, match="how"):
        hash_join(left, right, on="k", how="cross")


def test_hash_join_adaptive_partitions_scale():
    # partition count grows linearly with input, floor 4 — no
    # fixed-cardinality shuffle (counts only; no execution needed)
    from raybeats.util import adaptive_buckets
    assert adaptive_buckets(1000, target_rows=500_000, lo=4,
                            hi=1 << 16) == 4
    assert adaptive_buckets(500_000_000, target_rows=500_000, lo=4,
                            hi=1 << 16) == 1000


# ------------------------------------------------------- key_filter_join

def test_key_filter_join_semi_and_anti(ray_session):
    import ray.data as rd
    from raybeats.joins import key_filter_join
    left = rd.from_arrow(pa.table({
        "k": pa.array([1, 2, 3, 4, 2], pa.int64()),
        "v": pa.array(["a", "b", "c", "d", "e"], pa.string())}))
    # right has duplicates — membership, not multiplicity, must decide
    right = rd.from_arrow(pa.table({
        "rk": pa.array([2, 2, 4, 9], pa.int64())}))
    semi = key_filter_join(left, right, on="k", right_on="rk",
                           keep="semi").to_pandas()
    assert sorted(zip(semi["k"], semi["v"])) == \
        [(2, "b"), (2, "e"), (4, "d")]
    anti = key_filter_join(left, right, on="k", right_on="rk",
                           keep="anti").to_pandas()
    assert sorted(zip(anti["k"], anti["v"])) == [(1, "a"), (3, "c")]
    with pytest.raises(ValueError, match="keep"):
        key_filter_join(left, right, on="k", keep="inner")


def test_key_filter_join_empty_right_side(ray_session):
    import ray.data as rd
    from raybeats.joins import key_filter_join
    left = rd.from_arrow(pa.table({
        "k": pa.array([1, 2], pa.int64()),
        "v": pa.array(["a", "b"], pa.string())}))
    empty = rd.from_arrow(pa.table({"rk": pa.array([], pa.int64())}))
    anti = key_filter_join(left, empty, on="k", right_on="rk",
                           keep="anti").to_pandas()
    assert sorted(anti["k"]) == [1, 2]
    semi = key_filter_join(left, empty, on="k", right_on="rk",
                           keep="semi").to_pandas()
    assert len(semi) == 0


def test_key_filter_join_null_right_keys_never_match(ray_session):
    # SQL EXISTS equality never matches NULL; arrow is_in WOULD match
    # null-to-null, so tag_right must drop null keys (review finding)
    import ray.data as rd
    from raybeats.joins import key_filter_join
    left = rd.from_arrow(pa.table({
        "k": pa.array([1, None, 3], pa.int64()),
        "v": pa.array(["a", "b", "c"], pa.string())}))
    right = rd.from_arrow(pa.table({
        "rk": pa.array([None, 3], pa.int64())}))
    semi = key_filter_join(left, right, on="k", right_on="rk",
                           keep="semi").to_pandas()
    assert semi["v"].tolist() == ["c"]  # null-key left row NOT matched
    anti = key_filter_join(left, right, on="k", right_on="rk",
                           keep="anti").to_pandas()
    assert sorted(anti["v"]) == ["a", "b"]  # null-key left row kept


def test_key_filter_join_key_not_first_column(ray_session):
    # union schema must line up when `on` is not the left table's first
    # column (the shipped anti_join query shape — review finding)
    import ray.data as rd
    from raybeats.joins import key_filter_join
    left = rd.from_arrow(pa.table({
        "payload": pa.array([10, 20, 30], pa.int64()),
        "k": pa.array([1, 2, 3], pa.int64())}))
    right = rd.from_arrow(pa.table({
        "rk": pa.array([2], pa.int64())}))
    anti = key_filter_join(left, right, on="k", right_on="rk",
                           keep="anti").to_pandas()
    got = sorted(zip(anti["k"], anti["payload"]))
    assert got == [(1, 10), (3, 30)]  # payload stays with its own key


# --------------------------------------------------------- bloom join

def _bloom_fixture():
    import ray.data as rd
    rng = np.random.default_rng(7)
    lk = rng.integers(0, 1000, 400)
    left = rd.from_arrow(pa.table({
        "k": pa.array(lk, pa.int64()),
        "v": pa.array([f"v{i}" for i in range(400)], pa.string())}))
    rk = rng.integers(0, 1000, 150)
    right = rd.from_arrow(pa.table({"rk": pa.array(rk, pa.int64())}))
    return left, right, set(rk.tolist())


def test_bloom_join_parity_with_key_filter_join(ray_session):
    from raybeats.joins import bloom_filter_join, key_filter_join
    left, right, _ = _bloom_fixture()
    for keep in ("semi", "anti"):
        b = bloom_filter_join(left, right, on="k", right_on="rk",
                              keep=keep, right_count=150,
                              n_buckets=4).to_pandas()
        e = key_filter_join(left, right, on="k", right_on="rk",
                            keep=keep, n_buckets=4).to_pandas()
        assert sorted(zip(b["k"], b["v"])) == sorted(zip(e["k"], e["v"]))


def test_bloom_join_exact_vs_membership(ray_session):
    from raybeats.joins import bloom_filter_join
    left, right, members = _bloom_fixture()
    semi = bloom_filter_join(left, right, on="k", right_on="rk",
                             keep="semi", right_count=150,
                             n_buckets=4).to_pandas()
    assert all(k in members for k in semi["k"])
    anti = bloom_filter_join(left, right, on="k", right_on="rk",
                             keep="anti", right_count=150,
                             n_buckets=4).to_pandas()
    assert all(k not in members for k in anti["k"])
    assert len(semi) + len(anti) == 400


def test_bloom_join_string_keys_nulls_and_empty_right(ray_session):
    import ray.data as rd
    from raybeats.joins import bloom_filter_join
    left = rd.from_arrow(pa.table({
        "k": pa.array(["a", None, "c", "d"], pa.string()),
        "v": pa.array([1, 2, 3, 4], pa.int64())}))
    right = rd.from_arrow(pa.table({
        "k": pa.array([None, "c", "zz"], pa.string())}))
    semi = bloom_filter_join(left, right, on="k", keep="semi",
                             right_count=3, n_buckets=2).to_pandas()
    assert semi["v"].tolist() == [3]  # NULL never matches
    anti = bloom_filter_join(left, right, on="k", keep="anti",
                             right_count=3, n_buckets=2).to_pandas()
    assert sorted(anti["v"]) == [1, 2, 4]  # null-key row kept
    empty = rd.from_arrow(pa.table({"k": pa.array([], pa.string())}))
    anti2 = bloom_filter_join(left, empty, on="k", keep="anti",
                              right_count=0, n_buckets=2).to_pandas()
    assert sorted(anti2["v"]) == [1, 2, 3, 4]


def test_bloom_prefilter_false_positive_rate_bounded():
    # the probe alone (before the exact confirm) must pass true members
    # (no false negatives — structural) and reject ~all non-members at
    # the sized fpp; checked on disjoint key ranges so ground truth is
    # exact
    import ray

    from raybeats.joins import (_BloomProbe, bloom_params, build_bloom)
    import ray.data as rd
    right = rd.from_arrow(pa.table(
        {"rk": pa.array(range(0, 5000), pa.int64())}))
    n_bits, k = bloom_params(5000, fpp=0.01)
    words = build_bloom(right, on="rk", n_bits=n_bits, n_hashes=k)
    probe = _BloomProbe(ray.put(words), "k", n_bits, k)
    members = pa.table({"k": pa.array(range(0, 5000), pa.int64())})
    assert probe(members).column("__bloom_hit").to_pandas().all()
    outsiders = pa.table(
        {"k": pa.array(range(100000, 110000), pa.int64())})
    fp = probe(outsiders).column("__bloom_hit").to_pandas().mean()
    assert fp < 0.03  # sized for 1%; 3x headroom, zero flake margin


def test_bloom_join_heterogeneous_key_types(ray_session):
    # right side is a STRING column of digits, left is int64: without
    # casting the build keys to the probe type the two sides hash
    # through different kernels (splitmix64 vs fnv) and the bloom gets
    # false negatives — semi silently drops true matches
    import ray.data as rd
    from raybeats.joins import bloom_filter_join, key_filter_join
    left = rd.from_arrow(pa.table({
        "k": pa.array([1, 2, 3, 4, 5], pa.int64()),
        "v": pa.array(list("abcde"), pa.string())}))
    right = rd.from_arrow(pa.table(
        {"k": pa.array(["2", "4", "9"], pa.string())}))
    semi = bloom_filter_join(left, right, on="k", keep="semi",
                             right_count=3, n_buckets=2).to_pandas()
    assert sorted(semi["k"]) == [2, 4]
    e = key_filter_join(left, right, on="k", keep="semi",
                        n_buckets=2).to_pandas()
    assert sorted(semi["k"]) == sorted(e["k"])
    anti = bloom_filter_join(left, right, on="k", keep="anti",
                             right_count=3, n_buckets=2).to_pandas()
    assert sorted(anti["k"]) == [1, 3, 5]


# ------------------------------------------- large×large interval join

class TestIntervalPointJoin:
    def _naive(self, pv, lo, hi):
        out = []
        for pi, v in enumerate(pv):
            for ii in range(len(lo)):
                if lo[ii] <= v < hi[ii]:
                    out.append((pi, ii))
        return sorted(out)

    def test_parity_with_nested_loop_and_no_double_match(self, ray_session):
        import ray.data as rd
        from raybeats.joins import interval_point_join
        rng = np.random.default_rng(23)
        pv = rng.integers(0, 10_000, 600)
        lo = rng.integers(0, 10_000, 150)
        hi = lo + rng.integers(0, 900, 150)  # spans up to 9 cells of 100
        pts = rd.from_arrow(pa.table({
            "pid": pa.array(np.arange(600), pa.int64()),
            "v": pa.array(pv, pa.int64())})).repartition(5)
        ivs = rd.from_arrow(pa.table({
            "iid": pa.array(np.arange(150), pa.int64()),
            "lo": pa.array(lo, pa.int64()),
            "hi": pa.array(hi, pa.int64())})).repartition(3)
        # n_buckets=1 collapses every cell into ONE group: a straddling
        # interval has many copies in that group and per-cell clipping
        # is the only thing preventing duplicate pairs
        for nb in (1, 7):
            out = interval_point_join(
                pts, ivs, value_col="v", lo_col="lo", hi_col="hi",
                cell=100, n_buckets=nb).to_pandas()
            got = sorted(zip(out["pid"], out["iid"]))
            assert got == self._naive(pv, lo, hi), nb

    def test_empty_interval_and_boundaries(self, ray_session):
        import ray.data as rd
        from raybeats.joins import interval_point_join
        pts = rd.from_arrow(pa.table({
            "pid": pa.array([0, 1, 2], pa.int64()),
            "v": pa.array([100, 199, 200], pa.int64())}))
        ivs = rd.from_arrow(pa.table({
            "iid": pa.array([0, 1], pa.int64()),
            "lo": pa.array([100, 300], pa.int64()),
            "hi": pa.array([200, 300], pa.int64())}))  # second is empty
        out = interval_point_join(pts, ivs, value_col="v", lo_col="lo",
                                  hi_col="hi", cell=50,
                                  n_buckets=2).to_pandas()
        # lo inclusive, hi exclusive; empty interval matches nothing
        assert sorted(zip(out["pid"], out["iid"])) == [(0, 0), (1, 0)]

    def test_span_cap_raises(self, ray_session):
        import ray.data as rd
        from raybeats.joins import interval_point_join
        pts = rd.from_arrow(pa.table({"v": pa.array([1], pa.int64())}))
        ivs = rd.from_arrow(pa.table({
            "lo": pa.array([0], pa.int64()),
            "hi": pa.array([10_000_000], pa.int64())}))
        with pytest.raises(Exception, match="cells"):
            interval_point_join(pts, ivs, value_col="v", lo_col="lo",
                                hi_col="hi", cell=10, n_buckets=2,
                                max_span_cells=8).to_pandas()

    def test_column_collision_rejected(self, ray_session):
        import ray.data as rd
        from raybeats.joins import interval_point_join
        pts = rd.from_arrow(pa.table({"v": pa.array([1], pa.int64())}))
        ivs = rd.from_arrow(pa.table({
            "v": pa.array([0], pa.int64()),
            "hi": pa.array([2], pa.int64())}))
        with pytest.raises(ValueError, match="collision"):
            interval_point_join(pts, ivs, value_col="v", lo_col="v",
                                hi_col="hi", cell=10, n_buckets=2)

    def test_nulls_never_match_and_are_dropped(self, ray_session):
        import ray.data as rd
        from raybeats.joins import interval_point_join
        pts = rd.from_arrow(pa.table({
            "pid": pa.array([0, 1, 2], pa.int64()),
            "v": pa.array([100, None, 150], pa.int64())}))
        ivs = rd.from_arrow(pa.table({
            "iid": pa.array([0, 1], pa.int64()),
            "lo": pa.array([100, None], pa.int64()),
            "hi": pa.array([200, 300], pa.int64())}))
        out = interval_point_join(pts, ivs, value_col="v", lo_col="lo",
                                  hi_col="hi", cell=50,
                                  n_buckets=2).to_pandas()
        # null point value and null-lo interval drop (SQL predicate
        # semantics) instead of crashing the int64 cast
        assert sorted(zip(out["pid"], out["iid"])) == [(0, 0), (2, 0)]

    def test_reserved_column_names_rejected(self, ray_session):
        import ray.data as rd
        from raybeats.joins import interval_point_join
        pts = rd.from_arrow(pa.table({
            "__side": pa.array([1], pa.int64()),
            "v": pa.array([1], pa.int64())}))
        ivs = rd.from_arrow(pa.table({
            "lo": pa.array([0], pa.int64()),
            "hi": pa.array([2], pa.int64())}))
        with pytest.raises(ValueError, match="reserved"):
            interval_point_join(pts, ivs, value_col="v", lo_col="lo",
                                hi_col="hi", cell=10, n_buckets=2)


def test_interval_point_join_property(ray_session):
    # hypothesis-style randomized sweep (fixed seeds, deterministic):
    # random cells/buckets/intervals vs the nested loop, including
    # adversarial cases — empty sides, all-in-one-cell, giant cells
    import ray.data as rd
    from raybeats.joins import interval_point_join
    for seed in range(6):
        rng = np.random.default_rng(1000 + seed)
        n_p = int(rng.integers(0, 120))
        n_i = int(rng.integers(0, 40))
        cell = int(rng.choice([1, 7, 100, 10_000]))
        nb = int(rng.choice([1, 3, 16]))
        pv = rng.integers(-500, 500, n_p)
        lo = rng.integers(-500, 500, n_i)
        hi = lo + rng.integers(0, 3 * cell + 2, n_i)
        pts = rd.from_arrow(pa.table({
            "pid": pa.array(np.arange(n_p), pa.int64()),
            "v": pa.array(pv, pa.int64())}))
        ivs = rd.from_arrow(pa.table({
            "iid": pa.array(np.arange(n_i), pa.int64()),
            "lo": pa.array(lo, pa.int64()),
            "hi": pa.array(hi, pa.int64())}))
        out = interval_point_join(pts, ivs, value_col="v", lo_col="lo",
                                  hi_col="hi", cell=cell, n_buckets=nb,
                                  max_span_cells=4 * cell + 4).to_pandas()
        # an all-empty Ray result loses its schema (known gotcha)
        got = sorted(zip(out["pid"], out["iid"])) if len(out) else []
        want = sorted((p, i) for p in range(n_p) for i in range(n_i)
                      if lo[i] <= pv[p] < hi[i])
        assert got == want, (seed, cell, nb)
