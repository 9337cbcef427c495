"""Round-5 review regressions: null-key handling in the numpy
streaming folds, HLL checkpoint precision guard, negative-position
slice parity, and the None-safe tumbling flush."""
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


def _events_tbl(rows):
    """rows: (event_id, user_id_or_None, ts_us, event_type, value)."""
    return pa.table({
        "event_id": pa.array([r[0] for r in rows], pa.int64()),
        "user_id": pa.array([r[1] for r in rows], pa.int64()),
        "ts": pa.array([r[2] for r in rows], pa.int64())
        .cast(pa.timestamp("us")),
        "event_type": pa.array([r[3] for r in rows], pa.string()),
        "value": pa.array([r[4] for r in rows], pa.float64())})


MIN = 60 * 1_000_000


class TestNullKeyStreams:
    def test_sessionize_drops_null_users(self, ray_session):
        import ray.data as rd

        from raybeats.streaming import streaming_sessionize
        rows = [(0, 7, 0, "a", 1.0), (1, None, 1 * MIN, "a", 1.0),
                (2, 7, 90 * MIN, "a", 1.0), (3, None, 95 * MIN, "a", 1.0)]
        got = streaming_sessionize([rd.from_arrow(_events_tbl(rows))],
                                   n_buckets=2)
        assert got.to_pylist() == [
            {"user_id": 7, "n_sessions": 2, "n_events": 2}]

    def test_sliding_window_drops_null_users(self, ray_session):
        import ray.data as rd

        from raybeats.streaming import streaming_sliding_window
        rows = [(0, 7, 0, "a", 1.0), (1, None, 1 * MIN, "a", 1.0),
                (2, 7, 30 * MIN, "a", 1.0), (3, 7, 999 * MIN, "a", 1.0)]
        got = streaming_sliding_window(
            [rd.from_arrow(_events_tbl(rows))], n_buckets=2)
        assert got.to_pylist() == [
            {"event_id": 0, "user_id": 7, "n_trailing_hour": 1},
            {"event_id": 2, "user_id": 7, "n_trailing_hour": 2},
            {"event_id": 3, "user_id": 7, "n_trailing_hour": 1}]

    def test_window_agg_null_user_group(self, ray_session):
        import ray.data as rd

        from raybeats.streaming import streaming_window_agg
        rows = [(0, 7, 0, "a", 1.0), (1, None, 1 * MIN, "a", 2.0),
                (2, None, 2 * MIN, "a", 3.0)]
        got = streaming_window_agg([rd.from_arrow(_events_tbl(rows))],
                                   n_buckets=2)
        by_user = {r["user_id"]: r for r in got.to_pylist()}
        assert by_user[7]["total_cents"] == 100
        assert by_user[None]["total_cents"] == 500
        assert by_user[None]["n"] == 2


class TestHllCheckpointGuard:
    def test_precision_mismatch_refuses(self, ray_session, tmp_path):
        import ray.data as rd

        from raybeats.streaming import streaming_approx_distinct
        rows = [(i, i % 5, i * MIN, "a", 1.0) for i in range(50)]
        ck = str(tmp_path / "ck_hll")
        streaming_approx_distinct([rd.from_arrow(_events_tbl(rows))],
                                  n_buckets=2, p=12, checkpoint_to=ck)
        with pytest.raises(Exception, match="registers"):
            streaming_approx_distinct(
                [rd.from_arrow(_events_tbl(rows))], n_buckets=2, p=10,
                restore_from=ck)

    def test_same_precision_resumes(self, ray_session, tmp_path):
        import ray.data as rd

        from raybeats.streaming import streaming_approx_distinct
        rows = [(i, i, i * MIN, "a", 1.0) for i in range(60)]
        full = streaming_approx_distinct(
            [rd.from_arrow(_events_tbl(rows))], n_buckets=2, p=12)
        ck = str(tmp_path / "ck_hll2")
        streaming_approx_distinct(
            [rd.from_arrow(_events_tbl(rows[:30]))], n_buckets=2, p=12,
            checkpoint_to=ck)
        got = streaming_approx_distinct(
            [rd.from_arrow(_events_tbl(rows[30:]))], n_buckets=2, p=12,
            restore_from=ck)
        assert got == full


class TestSliceVarstartNegative:
    def test_paths_agree_on_negative_positions(self, ray_session):
        from raybeats.queries import _slice_varstart
        vals = ["abcdef", "ghijkl", "日本語abc"]
        st = [-2, 1, -4]
        en = [6, -1, -1]
        got = _slice_varstart(pa.array(vals),
                              pa.array(st, pa.int64()),
                              pa.array(en, pa.int64()))
        want = [v[a:b] for v, a, b in zip(vals, st, en)]
        assert got.to_pylist() == want
        # null-fallback path must return the same values
        got2 = _slice_varstart(pa.array(vals + [None]),
                               pa.array(st + [0], pa.int64()),
                               pa.array(en + [1], pa.int64()))
        assert got2.to_pylist() == want + [None]


def test_cdc_apply_checkpoint_passthrough(ray_session, tmp_path):
    """streaming_cdc_apply now forwards checkpoint_to/restore_from to
    its upsert cache: the resumed result equals one uninterrupted
    run, tombstones included."""
    import ray.data as rd

    from raybeats.streaming import streaming_cdc_apply

    rows = [(0, 1, 0, "set", 1.0), (1, 2, 1 * MIN, "set", 2.0),
            (2, 1, 2 * MIN, "error", 0.0), (3, 3, 3 * MIN, "set", 3.0),
            (4, 2, 4 * MIN, "set", 9.0)]
    t = _events_tbl(rows)
    full = streaming_cdc_apply([rd.from_arrow(t)], n_buckets=2)
    ck = str(tmp_path / "ck_cdc")
    streaming_cdc_apply([rd.from_arrow(t.slice(0, 3))], n_buckets=2,
                        checkpoint_to=ck)
    got = streaming_cdc_apply([rd.from_arrow(t.slice(3))], n_buckets=2,
                              restore_from=ck)
    assert got.to_pylist() == full.to_pylist()
    assert sorted(got.column("user_id").to_pylist()) == [2, 3]


def test_stream_dedup_null_passthrough_and_key_name(ray_session):
    """Null-key rows pass through untouched (batch ES create-op
    parity) and the output keeps the caller's key column name."""
    import ray.data as rd

    from raybeats.streaming import streaming_dedup_by_id

    t = pa.table({
        "doc_id": pa.array([5, None, 5, None, 8], pa.int64()),
        "ts": pa.array([0, 1, 2, 3, 4], pa.int64())
        .cast(pa.timestamp("us")),
        "event_id": pa.array([10, 11, 12, 13, 14], pa.int64())})
    got = streaming_dedup_by_id([rd.from_arrow(t)], key="doc_id",
                                n_buckets=2)
    assert got.column_names == ["doc_id", "event_id"]
    rows = sorted(got.to_pylist(),
                  key=lambda r: (r["doc_id"] is None, r["doc_id"],
                                 r["event_id"]))
    # first occurrence of 5 and 8 survive; BOTH null rows pass through
    assert rows == [
        {"doc_id": 5, "event_id": 10}, {"doc_id": 8, "event_id": 14},
        {"doc_id": None, "event_id": 11},
        {"doc_id": None, "event_id": 13}]


def test_triangle_runtime_guard_aborts_to_distributed(
        ray_session, tmp_path):
    """A bulk order (20 items — (L-1)/2 ≈ 9.5 pairs/row, far past the
    ≤7-item heuristic) with a budget between the pre-switch estimate
    and the true pair count: the broadcast fold's runtime guard must
    abort to the distributed plan and still match the oracle."""
    import pyarrow.parquet as pq_mod

    from raybeats.queries import QUERIES, q_triangle_parts
    parts = list(range(20))
    rows = [(1, p) for p in parts] + [(2, 1), (2, 2)]
    pq_mod.write_table(pa.table({
        "l_orderkey": pa.array([r[0] for r in rows], pa.int64()),
        "l_partkey": pa.array([r[1] for r in rows], pa.int64())}),
        tmp_path / "lineitem.parquet")
    # n_li = 22 -> pre-switch estimate 66 < budget 100 (broadcast
    # starts); raw pair keys C(20,2)=190 > 125 = 1.25x budget (guard
    # fires -> distributed plan finishes the query)
    got = q_triangle_parts(str(tmp_path), edge_budget=100)
    bcast = q_triangle_parts(str(tmp_path), edge_budget=1 << 40)
    assert got.to_pylist() == bcast.to_pylist()
    import duckdb
    con = duckdb.connect()
    con.execute(f"CREATE VIEW lineitem AS SELECT * FROM "
                f"'{tmp_path}/lineitem.parquet'")
    want = con.execute(QUERIES["triangle_parts"][1]).arrow()
    assert got.to_pylist() == want.to_pylist()


def test_triangle_free_graph_both_plans(ray_session, tmp_path):
    """A graph WITH edges but NO triangles: both plans must return an
    empty 25-row-capped result, not crash (the broadcast plan's wedge
    partials are all empty and Ray drops 0-row outputs — the seeded
    combine is what keeps the driver concat well-defined)."""
    import pyarrow.parquet as pq_mod

    from raybeats.queries import q_triangle_parts
    rows = [(1, 0), (1, 1), (2, 1), (2, 2)]  # path 0-1-2: no triangle
    pq_mod.write_table(pa.table({
        "l_orderkey": pa.array([r[0] for r in rows], pa.int64()),
        "l_partkey": pa.array([r[1] for r in rows], pa.int64())}),
        tmp_path / "lineitem.parquet")
    bcast = q_triangle_parts(str(tmp_path), edge_budget=1 << 40)
    dist = q_triangle_parts(str(tmp_path), edge_budget=0)
    assert bcast.num_rows == 0 and dist.num_rows == 0
    assert bcast.column_names == ["l_partkey", "n_triangles"]
