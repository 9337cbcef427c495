"""Incremental (micro-batch, stateful-actor) sessionization must equal
the batch sessionization query exactly."""

import pyarrow as pa
import pyarrow.parquet as pq

SF = "/root/testdata/sf0.001"


def test_streaming_sessionize_equals_batch(ray_session):
    import ray.data as rd

    from raybeats.queries import q_sessionization
    from raybeats.streaming import streaming_sessionize

    # slice events into 4 contiguous time windows (event-time order)
    t = pq.read_table(f"{SF}/events.parquet",
                      columns=["user_id", "ts", "event_id"]).sort_by("ts")
    n = t.num_rows
    slices = [rd.from_arrow(t.slice(i * n // 4,
                                    (i + 1) * n // 4 - i * n // 4))
              for i in range(4)]
    streamed = streaming_sessionize(slices, n_buckets=3).to_pylist()

    batch = sorted(q_sessionization(SF).take_all(),
                   key=lambda r: r["user_id"])
    assert streamed == batch


def test_streaming_sliding_window_equals_batch(ray_session):
    import ray.data as rd

    from raybeats.queries import q_sliding_window
    from raybeats.streaming import streaming_sliding_window

    t = pq.read_table(f"{SF}/events.parquet",
                      columns=["user_id", "ts", "event_id"]).sort_by("ts")
    n = t.num_rows
    slices = [rd.from_arrow(t.slice(i * n // 4,
                                    (i + 1) * n // 4 - i * n // 4))
              for i in range(4)]
    streamed = streaming_sliding_window(slices, n_buckets=3).to_pylist()

    batch = sorted(q_sliding_window(SF).take_all(),
                   key=lambda r: (r["user_id"], r["event_id"]))
    assert streamed == batch
    assert any(r["n_trailing_hour"] > 1 for r in streamed)


def test_streaming_sliding_window_tie_straddles_boundary(ray_session):
    """Equal-timestamp peers of one user split across micro-batches must
    still count each other (the batch RANGE frame counts ts-peers) —
    the deferred-watermark path."""
    import pyarrow as pa
    import ray.data as rd

    from raybeats.streaming import streaming_sliding_window

    ts0 = 1_700_000_000_000_000
    s1 = pa.table({"user_id": pa.array([7], pa.int64()),
                   "ts": pa.array([ts0], pa.timestamp("us")),
                   "event_id": pa.array([1], pa.int64())})
    s2 = pa.table({"user_id": pa.array([7, 7], pa.int64()),
                   "ts": pa.array([ts0, ts0 + 10_000_000],
                                  pa.timestamp("us")),
                   "event_id": pa.array([2, 3], pa.int64())})
    out = streaming_sliding_window([rd.from_arrow(s1), rd.from_arrow(s2)],
                                   n_buckets=2).to_pylist()
    got = {r["event_id"]: r["n_trailing_hour"] for r in out}
    # e1 and e2 are ts-peers (count each other); e3 sees all three
    assert got == {1: 2, 2: 2, 3: 3}


def test_streaming_window_agg_equals_batch(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from raybeats.queries import q_window_agg
    from raybeats.streaming import streaming_window_agg

    t = pq.read_table(f"{SF}/events.parquet",
                      columns=["user_id", "ts", "value"]).sort_by("ts")
    n = t.num_rows
    slices = [rd.from_arrow(t.slice(i * n // 3,
                                    (i + 1) * n // 3 - i * n // 3))
              for i in range(3)]
    streamed = streaming_window_agg(slices, n_buckets=3).to_pylist()

    batch = q_window_agg(SF)
    if isinstance(batch, rd.Dataset):
        batch = pa.concat_tables(list(
            batch.iter_batches(batch_format="pyarrow")))
    want = sorted(batch.to_pylist(),
                  key=lambda r: (r["user_id"], r["hour"]))
    assert streamed == want
    assert len(streamed) > 50


def test_streaming_running_total_equals_batch(ray_session):
    import ray.data as rd

    from raybeats.queries import q_running_sum
    from raybeats.streaming import streaming_running_total

    t = pq.read_table(f"{SF}/events.parquet",
                      columns=["event_id", "user_id", "ts", "value"]) \
        .sort_by("ts")
    n = t.num_rows
    slices = [rd.from_arrow(t.slice(i * n // 4,
                                    (i + 1) * n // 4 - i * n // 4))
              for i in range(4)]
    streamed = streaming_running_total(slices, n_buckets=3).to_pylist()

    batch = sorted(q_running_sum(SF).take_all(),
                   key=lambda r: (r["user_id"], r["event_id"]))
    assert streamed == batch


def test_streaming_running_total_tie_straddles_boundary(ray_session):
    """A same-ts, smaller-event_id row arriving in the NEXT micro-batch
    must still fold in (ts, event_id) order — the deferred-watermark
    path; and negative values must carry correctly."""
    import pyarrow as pa
    import ray.data as rd

    from raybeats.streaming import streaming_running_total

    ts0 = 1_700_000_000_000_000
    s1 = pa.table({"event_id": pa.array([5], pa.int64()),
                   "user_id": pa.array([7], pa.int64()),
                   "ts": pa.array([ts0], pa.timestamp("us")),
                   "value": pa.array([1.0], pa.float64())})
    s2 = pa.table({"event_id": pa.array([2, 9], pa.int64()),
                   "user_id": pa.array([7, 7], pa.int64()),
                   "ts": pa.array([ts0, ts0 + 1_000_000],
                                  pa.timestamp("us")),
                   "value": pa.array([-3.0, 10.0], pa.float64())})
    out = streaming_running_total([rd.from_arrow(s1), rd.from_arrow(s2)],
                                  n_buckets=2).to_pylist()
    got = {r["event_id"]: r["running_cents"] for r in out}
    # order by (ts, event_id): e2(-300) -> e5(+100) -> e9(+1000)
    assert got == {2: -300, 5: -200, 9: 800}


def test_streaming_running_total_bucket_sharing_watermark(ray_session):
    """With n_buckets > n_actors, several buckets share one actor; a
    deferral max computed over the actor-wide pending would fold a
    boundary tie prematurely when ANOTHER bucket's later-ts rows
    arrive. Pending must be keyed per bucket: user 0 (bucket 0) and
    user 8 (bucket 8) both land on actor 0 at n_buckets=9."""
    import pyarrow as pa
    import ray.data as rd

    from raybeats.streaming import streaming_running_total

    ts0 = 1_700_000_000_000_000

    def slice_(eids, uids, tss, vals):
        return rd.from_arrow(pa.table({
            "event_id": pa.array(eids, pa.int64()),
            "user_id": pa.array(uids, pa.int64()),
            "ts": pa.array(tss, pa.timestamp("us")),
            "value": pa.array(vals, pa.float64())}))

    out = streaming_running_total([
        slice_([5], [0], [ts0], [1.0]),            # bucket 0, tie seed
        slice_([7], [8], [ts0 + 1_000_000], [5.0]),  # bucket 8, same actor
        slice_([2], [0], [ts0], [-3.0]),           # the late tie, bucket 0
    ], n_buckets=9).to_pylist()
    got = {r["event_id"]: r["running_cents"] for r in out}
    # (ts, event_id) order for user 0: e2(-300) then e5(-200)
    assert got == {2: -300, 5: -200, 7: 500}


def test_streaming_null_ts_fails_loudly_not_hangs(ray_session):
    """A null ts row must surface as a driver-side error via the count
    barrier — raising inside the fire-and-forget push would only be
    logged while the barrier spins forever."""
    import pyarrow as pa
    import pytest
    import ray.data as rd

    from raybeats.streaming import (streaming_running_total,
                                    streaming_sliding_window)

    bad = pa.table({"event_id": pa.array([1], pa.int64()),
                    "user_id": pa.array([3], pa.int64()),
                    "ts": pa.array([None], pa.timestamp("us")),
                    "value": pa.array([1.0], pa.float64())})
    with pytest.raises(Exception, match="null ts"):
        streaming_running_total([rd.from_arrow(bad)], n_buckets=2)
    with pytest.raises(Exception, match="null ts"):
        streaming_sliding_window(
            [rd.from_arrow(bad.select(["event_id", "user_id", "ts"]))],
            n_buckets=2)


def test_streaming_sliding_window_bucket_sharing_watermark(ray_session):
    """TrailingWindowState's pending must also be per-bucket: user 0
    (bucket 0) and user 8 (bucket 8) share actor 0 at n_buckets=9, and
    bucket 8's later-ts push must not fold user 0's deferred ts-peer
    before its tie arrives."""
    import pyarrow as pa
    import ray.data as rd

    from raybeats.streaming import streaming_sliding_window

    ts0 = 1_700_000_000_000_000

    def slice_(eids, uids, tss):
        return rd.from_arrow(pa.table({
            "event_id": pa.array(eids, pa.int64()),
            "user_id": pa.array(uids, pa.int64()),
            "ts": pa.array(tss, pa.timestamp("us"))}))

    out = streaming_sliding_window([
        slice_([1], [0], [ts0]),               # bucket 0, deferred
        slice_([9], [8], [ts0 + 1_000_000]),   # bucket 8, same actor
        slice_([2], [0], [ts0]),               # user 0's ts-peer
    ], n_buckets=9).to_pylist()
    got = {r["event_id"]: r["n_trailing_hour"] for r in out}
    # e1 and e2 are ts-peers and must count each other (RANGE frame);
    # premature folding of e1 would give e1=1
    assert got == {1: 2, 2: 2, 9: 1}


def test_streaming_approx_distinct_equals_batch(ray_session):
    """HLL register maxes commute, so the streamed sketch must equal
    the batch sketch BIT-EXACTLY for any micro-batch split."""
    import ray.data as rd

    from raybeats.streaming import streaming_approx_distinct
    from raybeats.textops.sketches import approx_distinct

    t = pq.read_table(f"{SF}/events.parquet",
                      columns=["user_id", "ts"]).sort_by("ts")
    n = t.num_rows
    slices = [rd.from_arrow(t.slice(i * n // 3,
                                    (i + 1) * n // 3 - i * n // 3))
              for i in range(3)]
    streamed = streaming_approx_distinct(slices, column="user_id",
                                         n_buckets=3, p=12)
    batch = approx_distinct(
        rd.from_arrow(t.select(["user_id"])), "user_id", p=12)
    assert streamed == batch
    # sanity: the estimate is near the exact distinct count
    exact = len(set(t.column("user_id").to_pylist()))
    assert abs(streamed - exact) / exact < 0.1


def test_streaming_approx_distinct_skips_null_keys(ray_session):
    """COUNT(DISTINCT) semantics: null keys are skipped like the batch
    sketch, not crashed on in the bucket router."""
    import pyarrow as pa
    import ray.data as rd

    from raybeats.streaming import streaming_approx_distinct
    from raybeats.textops.sketches import approx_distinct
    t = pa.table({"user_id": pa.array([1, None, 2, None, 3, 1],
                                      pa.int64())})
    streamed = streaming_approx_distinct(
        [rd.from_arrow(t.slice(0, 3)), rd.from_arrow(t.slice(3, 3))],
        column="user_id", n_buckets=2, p=12)
    batch = approx_distinct(rd.from_arrow(t), "user_id", p=12)
    assert streamed == batch


def test_streaming_latest_equals_batch(ray_session):
    """Upsert cache flush ≡ batch keep_latest for any micro-batch
    split (keep-latest is an associative commutative selection)."""
    import ray.data as rd

    from raybeats.aggregates import keep_latest_table
    from raybeats.streaming import streaming_latest

    t = pq.read_table(f"{SF}/events.parquet",
                      columns=["event_id", "ts", "user_id",
                               "event_type", "value"]).sort_by("ts")
    n = t.num_rows
    for cuts in ([n], [n // 3, 2 * n // 3, n], [1, n // 2, n]):
        lo, slices = 0, []
        for hi in cuts:
            slices.append(rd.from_arrow(t.slice(lo, hi - lo)))
            lo = hi
        got = streaming_latest(slices, n_buckets=5)
        want = keep_latest_table(t, key="user_id",
                                 order_by=("ts", "event_id")) \
            .sort_by([("user_id", "ascending")])
        assert got.select(want.column_names).to_pylist() \
            == want.to_pylist()


def test_streaming_latest_late_row_loses(ray_session):
    """A late row older than the cached winner must not replace it —
    no watermark machinery, the selection itself handles lateness."""
    import ray.data as rd
    from raybeats.streaming import streaming_latest

    import pyarrow as pa

    def mk(rows):
        return rd.from_arrow(pa.table({
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array([r[1] for r in rows], pa.int64())
            .cast(pa.timestamp("us")),
            "user_id": pa.array([r[2] for r in rows], pa.int64())}))

    got = streaming_latest(
        [mk([(1, 100, 7)]), mk([(2, 50, 7)])], n_buckets=2)
    assert got.column("event_id").to_pylist() == [1]


def test_streaming_latest_custom_key_and_null_key(ray_session):
    """key= must drive the BUCKETING too (not just the state): rows
    sharing a session_id but differing in user_id must meet in one
    actor. Null keys route to a shared bucket and keep parity with the
    batch kernel (SQL PARTITION BY: one NULL partition)."""
    import pyarrow as pa
    import ray.data as rd

    from raybeats.aggregates import keep_latest_table
    from raybeats.streaming import streaming_latest

    def mk(rows):
        return rd.from_arrow(pa.table({
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array([r[1] for r in rows], pa.int64())
            .cast(pa.timestamp("us")),
            "session_id": pa.array([r[2] for r in rows], pa.int64()),
            "user_id": pa.array([r[3] for r in rows], pa.int64())}))

    rows1 = [(1, 10, 7, 100), (2, 20, None, 1)]
    rows2 = [(3, 30, 7, 200), (4, 5, None, 2)]
    got = streaming_latest([mk(rows1), mk(rows2)], key="session_id",
                           n_buckets=4)
    both = pa.concat_tables([
        b for ds in (mk(rows1), mk(rows2))
        for b in ds.iter_batches(batch_format="pyarrow")],
        promote_options="default")
    want = keep_latest_table(both, key="session_id",
                             order_by=("ts", "event_id")) \
        .sort_by([("session_id", "ascending")])
    assert got.select(want.column_names).to_pylist() == want.to_pylist()
    # session 7's winner must be event 3 (user 200) — cross-user fold
    by_sess = {r["session_id"]: r["event_id"] for r in got.to_pylist()}
    assert by_sess[7] == 3 and by_sess[None] == 2


def test_streaming_latest_random_splits(ray_session):
    """Randomized sweep: arbitrary cut points, bucket counts and
    duplicate-heavy keys — flush must equal the batch kernel."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from raybeats.aggregates import keep_latest_table
    from raybeats.streaming import streaming_latest

    rng = np.random.RandomState(41)
    n = 300
    t = pa.table({
        "event_id": pa.array(rng.permutation(n), pa.int64()),
        "ts": pa.array(rng.randint(0, 50, n), pa.int64())
        .cast(pa.timestamp("us")),
        "user_id": pa.array(rng.randint(0, 12, n), pa.int64())}) \
        .sort_by("ts")
    want = keep_latest_table(t, key="user_id",
                             order_by=("ts", "event_id")) \
        .sort_by([("user_id", "ascending")]).to_pylist()
    for trial in range(3):
        cuts = sorted(rng.choice(range(1, n), 3, replace=False)) + [n]
        lo, slices = 0, []
        for hi in cuts:
            slices.append(rd.from_arrow(t.slice(lo, hi - lo)))
            lo = hi
        got = streaming_latest(slices, n_buckets=int(rng.randint(1, 9)))
        assert got.select(
            ["event_id", "ts", "user_id"]).to_pylist() == [
            {k: r[k] for k in ("event_id", "ts", "user_id")}
            for r in want]


def test_streaming_quantile_equals_batch(ray_session):
    """Quantum-CDF counts commute: the streamed quantile equals the
    batch global_discrete_quantile bit-exactly for any split."""
    import ray.data as rd

    from raybeats.aggregates import global_discrete_quantile
    from raybeats.streaming import streaming_quantile

    t = pq.read_table(f"{SF}/events.parquet",
                      columns=["user_id", "ts", "value"]).sort_by("ts")
    n = t.num_rows
    for q in (0.05, 0.5, 0.95):
        want = global_discrete_quantile(
            rd.from_arrow(t), value_col="value", q=q, scale=100)
        slices = [rd.from_arrow(t.slice(i * n // 3,
                                        (i + 1) * n // 3 - i * n // 3))
                  for i in range(3)]
        got = streaming_quantile(slices, q=q, value_col="value",
                                 scale=100, n_buckets=5)
        assert got == want


def test_streaming_transitions_equal_batch(ray_session):
    """Flushed transition counts ≡ the batch transition_counts query
    for several micro-batch splits (pairing must survive user
    sequences straddling slice boundaries)."""
    import ray.data as rd

    from raybeats.queries import q_transition_counts
    from raybeats.streaming import streaming_transition_counts

    t = pq.read_table(f"{SF}/events.parquet",
                      columns=["event_id", "ts", "user_id",
                               "event_type"]).sort_by("ts")
    n = t.num_rows
    want = sorted(
        map(tuple, zip(*[q_transition_counts(SF).column(c).to_pylist()
                         for c in ("src", "dst", "n")])))
    for cuts in ([n], [n // 3, 2 * n // 3, n], [1, n // 2, n]):
        lo, slices = 0, []
        for hi in cuts:
            slices.append(rd.from_arrow(t.slice(lo, hi - lo)))
            lo = hi
        got = streaming_transition_counts(slices, n_buckets=5)
        rows = sorted(map(tuple, zip(got.column("src").to_pylist(),
                                     got.column("dst").to_pylist(),
                                     got.column("n").to_pylist())))
        assert rows == want


def test_streaming_transitions_tie_straddles_boundary(ray_session):
    """A same-ts SMALLER-event_id row arriving in the next micro-batch
    must order before the deferred boundary row — the (ts, event_id)
    pair order, not arrival order, defines adjacency."""
    import pyarrow as pa
    import ray.data as rd

    from raybeats.streaming import streaming_transition_counts

    def mk(rows):
        return rd.from_arrow(pa.table({
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array([r[1] for r in rows], pa.int64())
            .cast(pa.timestamp("us")),
            "user_id": pa.array([r[2] for r in rows], pa.int64()),
            "event_type": pa.array([r[3] for r in rows], pa.string())}))

    # batch 1: user 1 click@10(eid 1), view@20(eid 5) [boundary ts=20]
    # batch 2: purchase@20(eid 3) — same ts, SMALLER eid than the view
    # correct order: click -> purchase -> view
    got = streaming_transition_counts(
        [mk([(1, 10, 1, "click"), (5, 20, 1, "view")]),
         mk([(3, 20, 1, "purchase")])], n_buckets=2)
    rows = set(zip(got.column("src").to_pylist(),
                   got.column("dst").to_pylist(),
                   got.column("n").to_pylist()))
    assert rows == {("click", "purchase", 1), ("purchase", "view", 1)}


def test_streaming_transitions_null_rows_dropped(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from raybeats.streaming import streaming_transition_counts

    t = pa.table({
        "event_id": pa.array([1, 2, 3, 4], pa.int64()),
        "ts": pa.array([10, 20, None, 30], pa.int64())
        .cast(pa.timestamp("us")),
        "user_id": pa.array([1, None, 1, 1], pa.int64()),
        "event_type": pa.array(["click", "view", "view", "purchase"],
                               pa.string())})
    got = streaming_transition_counts([rd.from_arrow(t)], n_buckets=2)
    rows = set(zip(got.column("src").to_pylist(),
                   got.column("dst").to_pylist(),
                   got.column("n").to_pylist()))
    assert rows == {("click", "purchase", 1)}


def test_streaming_user_summary_equal_batch(ray_session):
    """Flushed per-user profiles ≡ the batch user_summary query for
    several micro-batch splits (MIN/MAX/SUM/COUNT all commute, so any
    event-time split must flush identically)."""
    import pyarrow as pa
    import ray.data as rd

    from raybeats.queries import q_user_summary
    from raybeats.streaming import streaming_user_summary

    t = pq.read_table(f"{SF}/events.parquet",
                      columns=["event_id", "ts", "user_id",
                               "value"]).sort_by("ts")
    n = t.num_rows
    want_tb = pa.concat_tables(
        q_user_summary(SF).iter_batches(batch_format="pyarrow"),
        promote_options="default").sort_by([("user_id", "ascending")])
    cols = ("user_id", "n_events", "first_ts", "last_ts", "span_us",
            "value_cents")
    want = list(zip(*[want_tb.column(c).to_pylist() for c in cols]))
    for cuts in ([n], [n // 3, 2 * n // 3, n], [1, n // 2, n]):
        lo, slices = 0, []
        for hi in cuts:
            slices.append(rd.from_arrow(t.slice(lo, hi - lo)))
            lo = hi
        got = streaming_user_summary(slices, n_buckets=5)
        rows = list(zip(*[got.column(c).to_pylist() for c in cols]))
        assert rows == want


def test_streaming_user_summary_all_nan_null(ray_session):
    """An all-NaN user's value_cents flushes NULL (the SQL sum
    convention), even when the NaNs arrive across different
    micro-batches."""
    import pyarrow as pa
    import ray.data as rd

    from raybeats.streaming import streaming_user_summary

    def mk(rows):
        return rd.from_arrow(pa.table({
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array([r[1] for r in rows], pa.int64())
            .cast(pa.timestamp("us")),
            "user_id": pa.array([r[2] for r in rows], pa.int64()),
            "value": pa.array([r[3] for r in rows], pa.float64())}))

    got = streaming_user_summary(
        [mk([(0, 10, 1, float("nan")), (1, 20, 2, 1.0)]),
         mk([(2, 30, 1, float("nan")), (3, 40, 2, float("nan"))])],
        n_buckets=3)
    by_u = {r["user_id"]: r for r in got.to_pylist()}
    assert by_u[1]["value_cents"] is None
    assert by_u[1]["n_events"] == 2 and by_u[1]["span_us"] == 20
    assert by_u[2]["value_cents"] == 100


def test_streaming_mode_equal_batch(ray_session):
    """Flushed grouped mode ≡ the batch mode_per_type query for
    several micro-batch splits (counts are additive; the argmax runs
    once on the merged table)."""
    import ray.data as rd

    from raybeats.queries import q_mode_per_type
    from raybeats.streaming import streaming_mode_per_type

    t = pq.read_table(f"{SF}/events.parquet",
                      columns=["event_id", "ts", "user_id",
                               "event_type", "value"]).sort_by("ts")
    n = t.num_rows
    want_tb = q_mode_per_type(SF).sort_by([("event_type", "ascending")])
    cols = ("event_type", "mode_cents", "n_mode")
    want = list(zip(*[want_tb.column(c).to_pylist() for c in cols]))
    for cuts in ([n], [n // 4, n // 2, n], [1, n - 1, n]):
        lo, slices = 0, []
        for hi in cuts:
            slices.append(rd.from_arrow(t.slice(lo, hi - lo)))
            lo = hi
        got = streaming_mode_per_type(slices, n_buckets=5)
        rows = list(zip(*[got.column(c).to_pylist() for c in cols]))
        assert rows == want


def test_streaming_cdc_apply_equals_batch(ray_session):
    """CDC apply flush ≡ the batch query semantics for any micro-batch
    split; a late upsert OLDER than its key's tombstone stays
    deleted (the tombstone must be retained in state, not filtered
    on ingest)."""
    import pyarrow as pa
    import ray.data as rd

    from raybeats.streaming import streaming_cdc_apply

    def mk(rows):
        return rd.from_arrow(pa.table({
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array([r[1] for r in rows], pa.int64()).cast(
                pa.timestamp("us")),
            "user_id": pa.array([r[2] for r in rows], pa.int64()),
            "event_type": pa.array([r[3] for r in rows], pa.string()),
            "value": pa.array([r[4] for r in rows], pa.float64())}))

    rows = [
        (1, 10, 1, "signup", 1.0), (2, 20, 1, "purchase", 2.0),
        (3, 10, 2, "signup", 3.0), (4, 30, 2, "error", 0.0),
        (6, 50, 3, "view", 7.0)]
    late = [(5, 25, 2, "purchase", 9.0)]  # older than user 2's delete
    for split in ([rows + late],
                  [rows[:2], rows[2:], late],
                  [rows, late]):
        got = streaming_cdc_apply([mk(s) for s in split], n_buckets=3)
        assert got.column("user_id").to_pylist() == [1, 3]
        assert got.column("event_type").to_pylist() == [
            "purchase", "view"]
        assert got.column("value").to_pylist() == [2.0, 7.0]
    # a late upsert NEWER than the tombstone re-inserts the key
    got = streaming_cdc_apply(
        [mk(rows), mk([(7, 99, 2, "signup", 4.0)])], n_buckets=3)
    assert got.column("user_id").to_pylist() == [1, 2, 3]
    assert got.column("value").to_pylist() == [2.0, 4.0, 7.0]


def test_streaming_funnel_equals_batch(ray_session):
    """Stream-stream funnel flush ≡ batch funnel_conversion for any
    micro-batch split (both fold the literal batch kernels)."""
    import ray.data as rd

    from raybeats.aggregates import funnel_first_conversion
    from raybeats.streaming import streaming_funnel

    t = pq.read_table(f"{SF}/events.parquet",
                      columns=["user_id", "ts", "event_type"]) \
        .sort_by("ts")
    n = t.num_rows
    want = pa.concat_tables(list(
        funnel_first_conversion(
            rd.from_arrow(t), first_type="click", then_type="purchase",
            within_us=24 * 3600 * 1_000_000, n_buckets=3)
        .iter_batches(batch_size=None, batch_format="pyarrow"))) \
        .sort_by([("user_id", "ascending"), ("first_ts", "ascending")])
    for cuts in ([n], [n // 3, 2 * n // 3, n], [1, n // 2, n]):
        lo, slices = 0, []
        for hi in cuts:
            slices.append(rd.from_arrow(t.slice(lo, hi - lo)))
            lo = hi
        got = streaming_funnel(slices, n_buckets=3)
        assert got.to_pylist() == want.to_pylist(), cuts


def test_streaming_funnel_late_first_claims_candidate(ray_session):
    """A late-arriving EARLIER first-step row must retroactively join
    to a candidate buffered in a previous micro-batch."""
    import ray.data as rd
    from raybeats.streaming import streaming_funnel

    def mk(rows):
        return rd.from_arrow(pa.table({
            "user_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array([r[1] for r in rows], pa.int64())
            .cast(pa.timestamp("us")),
            "event_type": pa.array([r[2] for r in rows], pa.string())}))

    got = streaming_funnel(
        [mk([(7, 1000, "purchase"), (7, 2000, "click")]),
         mk([(7, 500, "click")])],   # late, EARLIER click
        within_us=10_000, n_buckets=2)
    assert got.to_pylist() == [{
        "user_id": 7,
        "first_ts": __import__("datetime").datetime(1970, 1, 1, 0, 0,
                                                    0, 500),
        "conv_ts": __import__("datetime").datetime(1970, 1, 1, 0, 0,
                                                   0, 1000)}]


def test_streaming_checkpoint_resume_equals_batch(ray_session):
    """Checkpoint after run 1, restore in a SEPARATE driver call with
    fresh actors, feed the rest: flush ≡ batch over both runs' rows —
    for the upsert cache and the stream-stream funnel."""
    import shutil

    import ray.data as rd

    from raybeats.aggregates import (funnel_first_conversion,
                                     keep_latest_table)
    from raybeats.streaming import streaming_funnel, streaming_latest

    t = pq.read_table(f"{SF}/events.parquet",
                      columns=["event_id", "ts", "user_id",
                               "event_type", "value"]).sort_by("ts")
    n = t.num_rows
    part1 = [rd.from_arrow(t.slice(0, n // 3)),
             rd.from_arrow(t.slice(n // 3, n // 3))]
    part2 = [rd.from_arrow(t.slice(2 * n // 3))]

    ck = "/tmp/raybeats_test_ckpt_latest"
    shutil.rmtree(ck, ignore_errors=True)
    streaming_latest(part1, n_buckets=5, checkpoint_to=ck)
    got = streaming_latest(part2, n_buckets=5, restore_from=ck)
    want = keep_latest_table(t, key="user_id",
                             order_by=("ts", "event_id")) \
        .sort_by([("user_id", "ascending")])
    assert got.select(want.column_names).to_pylist() == want.to_pylist()

    ck2 = "/tmp/raybeats_test_ckpt_funnel"
    shutil.rmtree(ck2, ignore_errors=True)
    streaming_funnel(part1, n_buckets=3, checkpoint_to=ck2)
    got2 = streaming_funnel(part2, n_buckets=3, restore_from=ck2)
    want2 = pa.concat_tables(list(
        funnel_first_conversion(
            rd.from_arrow(t), first_type="click", then_type="purchase",
            within_us=24 * 3600 * 1_000_000, n_buckets=3)
        .iter_batches(batch_size=None, batch_format="pyarrow"))) \
        .sort_by([("user_id", "ascending"), ("first_ts", "ascending")])
    assert got2.to_pylist() == want2.to_pylist()


def test_streaming_checkpoint_layout_guards(ray_session):
    """A mismatched bucket layout or a missing manifest must refuse to
    resume, never silently misfold."""
    import shutil

    import pytest as _pytest
    import ray.data as rd

    from raybeats.streaming import streaming_latest

    t = pq.read_table(f"{SF}/events.parquet",
                      columns=["event_id", "ts", "user_id"]) \
        .slice(0, 20)
    ck = "/tmp/raybeats_test_ckpt_guard"
    shutil.rmtree(ck, ignore_errors=True)
    with _pytest.raises(FileNotFoundError, match="manifest"):
        streaming_latest([rd.from_arrow(t)], n_buckets=4,
                         restore_from=ck)
    streaming_latest([rd.from_arrow(t)], n_buckets=4,
                     checkpoint_to=ck)
    with _pytest.raises(ValueError, match="layout"):
        streaming_latest([rd.from_arrow(t)], n_buckets=8,
                         restore_from=ck)


def test_streaming_quantile_checkpoint_resume(ray_session):
    """CDF-state checkpoint/resume across driver calls: the resumed
    quantile equals the batch fold over both runs' rows bit-exactly."""
    import shutil

    import ray.data as rd

    from raybeats.aggregates import global_discrete_quantile
    from raybeats.streaming import streaming_quantile

    t = pq.read_table(f"{SF}/events.parquet",
                      columns=["user_id", "value"])
    n = t.num_rows
    ck = "/tmp/raybeats_test_ckpt_quantile"
    shutil.rmtree(ck, ignore_errors=True)
    streaming_quantile([rd.from_arrow(t.slice(0, n // 2))], q=0.95,
                       n_buckets=4, checkpoint_to=ck)
    got = streaming_quantile([rd.from_arrow(t.slice(n // 2))], q=0.95,
                             n_buckets=4, restore_from=ck)
    want = global_discrete_quantile(rd.from_arrow(t), q=0.95,
                                    value_col="value", scale=100)
    assert got == want


def test_streaming_ratelimit_equals_batch(ray_session):
    """Union of per-run kept rows ≡ one batch RateLimit apply over the
    full time-ordered stream — for any split and across a
    checkpoint/resume boundary (bucket state crosses runs; kept rows
    emit exactly once per run)."""
    import shutil

    import ray.data as rd

    from raybeats.processors.ratelimit import RateLimit
    from raybeats.streaming import streaming_ratelimit

    t = pq.read_table(f"{SF}/events.parquet",
                      columns=["event_id", "ts", "user_id"]) \
        .sort_by([("ts", "ascending")])
    n = t.num_rows
    want = RateLimit(limit="1/h", fields=["user_id"]).apply(t) \
        .sort_by([("user_id", "ascending"), ("ts", "ascending")])
    assert 0 < want.num_rows < n  # non-vacuous: some rows dropped

    # any split, single run
    for cuts in ([n], [n // 3, 2 * n // 3, n]):
        lo, slices = 0, []
        for hi in cuts:
            slices.append(rd.from_arrow(t.slice(lo, hi - lo)))
            lo = hi
        got = streaming_ratelimit(slices, limit="1/h",
                                  fields=("user_id",), n_buckets=4)
        assert got.select(want.column_names).to_pylist() \
            == want.to_pylist(), cuts

    # checkpoint/resume across driver calls: run 1 + run 2 kept rows
    ck = "/tmp/raybeats_test_ckpt_ratelimit"
    shutil.rmtree(ck, ignore_errors=True)
    k1 = streaming_ratelimit([rd.from_arrow(t.slice(0, n // 2))],
                             limit="1/h", fields=("user_id",),
                             n_buckets=4, checkpoint_to=ck)
    k2 = streaming_ratelimit([rd.from_arrow(t.slice(n // 2))],
                             limit="1/h", fields=("user_id",),
                             n_buckets=4, restore_from=ck)
    both = pa.concat_tables([k1, k2]) \
        .sort_by([("user_id", "ascending"), ("ts", "ascending")])
    assert both.select(want.column_names).to_pylist() \
        == want.to_pylist()


def test_streaming_log_templates_equals_batch(ray_session):
    """Template partials are commutative (set-union + sum), so the
    streamed flush ≡ the batch log_templates query for any split —
    including across a checkpoint/resume boundary."""
    import shutil

    import ray.data as rd

    from raybeats.queries import q_log_templates
    from raybeats.streaming import streaming_log_templates
    from raybeats.transcripts import derive_transcripts

    ev = pq.read_table(f"{SF}/events.parquet")
    t = derive_transcripts(ev).sort_by([("ts", "ascending")])
    want = q_log_templates(SF).sort_by(
        [("n_tokens", "ascending"), ("first_token", "ascending")])
    n = t.num_rows
    for cuts in ([n], [n // 3, 2 * n // 3, n]):
        lo, slices = 0, []
        for hi in cuts:
            slices.append(rd.from_arrow(t.slice(lo, hi - lo)))
            lo = hi
        got = streaming_log_templates(slices, n_buckets=3)
        assert got.to_pylist() == want.to_pylist(), cuts

    ck = "/tmp/raybeats_test_ckpt_templates"
    shutil.rmtree(ck, ignore_errors=True)
    streaming_log_templates([rd.from_arrow(t.slice(0, n // 2))],
                            n_buckets=3, checkpoint_to=ck)
    got = streaming_log_templates([rd.from_arrow(t.slice(n // 2))],
                                  n_buckets=3, restore_from=ck)
    assert got.to_pylist() == want.to_pylist()


_CKPT_MODES = ["sessionize", "sliding_window", "window_agg",
               "approx_distinct", "running_total", "transition",
               "user_summary", "mode_per_type", "rule_violations"]


import pytest as _pt


@_pt.mark.parametrize("mode", _CKPT_MODES)
def test_streaming_checkpoint_all_modes(ray_session, mode, tmp_path):
    """Every stateful streaming mode checkpoints and resumes: run 1
    over the first part of the stream + checkpoint, then a SEPARATE
    driver call restores into fresh actors and feeds the rest. The
    resumed result (union with run-1 rows for the per-event deferring
    modes, where checkpoint_to suspends rather than ends the stream)
    equals one uninterrupted run over the whole stream — which the
    per-mode tests above already prove equal to batch."""
    import pyarrow.compute as pc
    import ray.data as rd

    from raybeats import streaming as st

    fns = {
        "sessionize": st.streaming_sessionize,
        "sliding_window": st.streaming_sliding_window,
        "window_agg": st.streaming_window_agg,
        "approx_distinct": st.streaming_approx_distinct,
        "running_total": st.streaming_running_total,
        "transition": st.streaming_transition_counts,
        "user_summary": st.streaming_user_summary,
        "mode_per_type": st.streaming_mode_per_type,
        "rule_violations": st.streaming_rule_violations,
    }
    fn = fns[mode]
    t = pq.read_table(f"{SF}/events.parquet").sort_by(
        [("ts", "ascending"), ("event_id", "ascending")])
    n = t.num_rows
    ts_np = pc.cast(t.column("ts"), pa.int64()) \
        .to_numpy(zero_copy_only=False)

    def _align(i):
        # never split equal timestamps across micro-batches: the
        # drivers' contract is event-time-ordered slices
        while 0 < i < n and ts_np[i] == ts_np[i - 1]:
            i += 1
        return i

    def mbs(lo, hi, step=2500):
        out, s = [], lo
        while s < hi:
            e = _align(min(s + step, hi))
            out.append(rd.from_arrow(t.slice(s, e - s)))
            s = e
        return out

    mid = _align(n // 2)
    full = fn(mbs(0, n), n_buckets=5)
    ck = str(tmp_path / f"ck_{mode}")
    r1 = fn(mbs(0, mid), n_buckets=5, checkpoint_to=ck)
    r2 = fn(mbs(mid, n), n_buckets=5, restore_from=ck)
    if mode == "approx_distinct":
        assert r2 == full
    elif mode in ("sliding_window", "running_total"):
        sort_keys = [("user_id", "ascending"), ("event_id", "ascending")]
        got = pa.concat_tables([r1, r2],
                               promote_options="default").sort_by(sort_keys)
        assert got.to_pylist() == full.to_pylist()
    else:
        assert r2.to_pylist() == full.to_pylist()


def test_streaming_dedup_equals_batch_and_resumes(ray_session, tmp_path):
    """StreamDedupState: union of per-push emitted first-occurrence
    rows ≡ batch dedup_first_by_key over the concatenated stream, for
    an arbitrary event-time split and across a checkpoint/resume
    boundary (equal-ts straddles covered by the watermark deferral)."""
    import pyarrow.compute as pc
    import ray.data as rd

    from raybeats.streaming import streaming_dedup_by_id
    from raybeats.textops.dedup import dedup_first_by_key

    t = pq.read_table(f"{SF}/events.parquet",
                      columns=["user_id", "ts", "event_id"])
    t = t.filter(pc.is_valid(t.column("user_id")))
    t = pa.table({"k": t.column("user_id"), "ts": t.column("ts"),
                  "event_id": t.column("event_id")})
    t = t.sort_by([("ts", "ascending"), ("event_id", "ascending")])
    n = t.num_rows

    want_ds = dedup_first_by_key(rd.from_arrow(t), key="k",
                                 order_cols=("ts", "event_id"),
                                 n_buckets=5)
    want = pa.concat_tables(list(want_ds.iter_batches(
        batch_size=None, batch_format="pyarrow")),
        promote_options="default") \
        .select(["k", "event_id"]).sort_by([("k", "ascending")])

    slices = [rd.from_arrow(t.slice(i * n // 4,
                                    (i + 1) * n // 4 - i * n // 4))
              for i in range(4)]
    got = streaming_dedup_by_id(slices, n_buckets=5)
    assert got.to_pylist() == want.to_pylist()

    ck = str(tmp_path / "ck_dedup")
    r1 = streaming_dedup_by_id([rd.from_arrow(t.slice(0, n // 2))],
                               n_buckets=5, checkpoint_to=ck)
    r2 = streaming_dedup_by_id([rd.from_arrow(t.slice(n // 2))],
                               n_buckets=5, restore_from=ck)
    got2 = pa.concat_tables([r1, r2], promote_options="default") \
        .sort_by([("k", "ascending")])
    assert got2.to_pylist() == want.to_pylist()
    # run-1 and run-2 emissions are disjoint (suspend semantics)
    assert r1.num_rows + r2.num_rows == want.num_rows
