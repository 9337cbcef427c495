"""streaming_rule_violations: flush ≡ the batch rule_violations query
for any event-time split, including the late-signup promotion (a
purchase pending across slices becomes a violation only under the
strict comparison) and the equal-ts signup+purchase pair (clean).
"""
import pyarrow as pa
import pyarrow.parquet as pq

SF = "/root/testdata/sf0.001"


def _mk(rows):
    import ray.data as rd
    return rd.from_arrow(pa.table({
        "event_id": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array([r[1] for r in rows], pa.int64())
        .cast(pa.timestamp("us")),
        "user_id": pa.array([r[2] for r in rows], pa.int64()),
        "event_type": pa.array([r[3] for r in rows], pa.string())}))


def _as_dict(t):
    return {x["rule"]: x["n"] for x in t.to_pylist()}


def test_late_signup_promotion(ray_session):
    from raybeats.streaming import streaming_rule_violations

    # u1: purchases at 5, 8 pending in slice 1; signup at 10 arrives
    # in slice 2 → both promote to "before". u2 never signs up.
    got = streaming_rule_violations(
        [_mk([(1, 5, 1, "purchase"), (2, 8, 1, "purchase"),
              (3, 6, 2, "purchase")]),
         _mk([(4, 10, 1, "signup"), (5, 12, 1, "purchase")])],
        n_buckets=3)
    assert _as_dict(got) == {"purchase_before_signup": 2,
                             "purchase_no_signup": 1}


def test_equal_ts_pair_clean(ray_session):
    from raybeats.streaming import streaming_rule_violations

    # purchase at exactly the first-signup ts is NOT a violation
    # (strict <), even arriving in the same slice in either order
    got = streaming_rule_violations(
        [_mk([(1, 10, 1, "purchase"), (2, 10, 1, "signup")])],
        n_buckets=2)
    assert _as_dict(got) == {"purchase_before_signup": 0,
                             "purchase_no_signup": 0}


def test_flush_equals_batch_any_split(ray_session):
    import ray.data as rd

    from raybeats.queries import QUERIES
    from raybeats.streaming import streaming_rule_violations

    t = pq.read_table(f"{SF}/events.parquet",
                      columns=["event_id", "ts", "user_id",
                               "event_type"]).sort_by("ts")
    res = QUERIES["rule_violations"][0](SF)
    want = _as_dict(res if isinstance(res, pa.Table) else
                    pa.concat_tables(res.iter_batches(
                        batch_format="pyarrow")))
    n = t.num_rows
    for cuts in ([n], [n // 3, 2 * n // 3, n], [1, n // 2, n]):
        lo, slices = 0, []
        for hi in cuts:
            slices.append(rd.from_arrow(t.slice(lo, hi - lo)))
            lo = hi
        got = streaming_rule_violations(slices, n_buckets=5)
        assert _as_dict(got) == want
