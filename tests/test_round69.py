"""Round-69 operators: attribution_last_touch (7-day last-touch
conversion attribution) and target_encode (leave-one-out mean target
encoding)."""
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from raybeats.queries import QUERIES

DAY_US = 86_400 * 1_000_000


def _table(res):
    if isinstance(res, pa.Table):
        return res
    batches = list(res.iter_batches(batch_size=None,
                                    batch_format="pyarrow"))
    if not batches:
        return pa.table({})
    return pa.concat_tables(batches, promote_options="default")


def _events(tmp_path, rows):
    """rows: (event_id, user_id, ts_us, event_type, value)."""
    pq.write_table(pa.table({
        "event_id": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array([r[2] for r in rows], pa.int64()).cast(
            pa.timestamp("us")),
        "user_id": pa.array([r[1] for r in rows], pa.int64()),
        "event_type": pa.array([r[3] for r in rows], pa.string()),
        "value": pa.array([r[4] for r in rows], pa.float64()),
        "props": pa.array(["{}"] * len(rows), pa.string())}),
        tmp_path / "events.parquet")


class TestAttributionLastTouch:
    def test_hand_values(self, ray_session, tmp_path):
        rows = [
            # user 1: view → purchase 1 day later → attributed to view
            (1, 1, 0, "view", 1.0),
            (2, 1, DAY_US, "purchase", 1.0),
            # user 1: second purchase right after the first — still
            # attributed to the view (purchases are never sources)
            (3, 1, DAY_US + 1, "purchase", 1.0),
            # user 2: click 8 days before purchase → outside window
            (4, 2, 0, "click", 1.0),
            (5, 2, 8 * DAY_US, "purchase", 1.0),
            # user 3: purchase with no prior events at all
            (6, 3, 0, "purchase", 1.0),
        ]
        _events(tmp_path, rows)
        out = _table(QUERIES["attribution_last_touch"][0](str(tmp_path)))
        got = dict(zip(out.column("attributed").to_pylist(),
                       out.column("n").to_pylist()))
        assert got == {"view": 2, "(none)": 2}

    def test_latest_prior_wins(self, ray_session, tmp_path):
        # view then click then purchase: credit goes to the CLICK
        rows = [(1, 1, 0, "view", 1.0), (2, 1, 10, "click", 1.0),
                (3, 1, 20, "purchase", 1.0)]
        _events(tmp_path, rows)
        out = _table(QUERIES["attribution_last_touch"][0](str(tmp_path)))
        got = dict(zip(out.column("attributed").to_pylist(),
                       out.column("n").to_pylist()))
        assert got == {"click": 1}

    def test_no_cross_user_leak(self, ray_session, tmp_path):
        # user 2's purchase must not see user 1's click even when both
        # land in the same hash bucket and user 1 sorts first
        rows = [(1, 1, 0, "click", 1.0),
                (2, 2, DAY_US, "purchase", 1.0)]
        _events(tmp_path, rows)
        out = _table(QUERIES["attribution_last_touch"][0](str(tmp_path)))
        got = dict(zip(out.column("attributed").to_pylist(),
                       out.column("n").to_pylist()))
        assert got == {"(none)": 1}


class TestTargetEncode:
    def test_hand_values(self, ray_session, tmp_path):
        # type A cents: 100, 200, 700 → LOO means: 450.0, 400.0, 150.0
        # type B singleton → NULL
        rows = [(1, 1, 0, "A", 1.00), (2, 1, 1, "A", 2.00),
                (3, 1, 2, "A", 7.00), (4, 1, 3, "B", 9.00)]
        _events(tmp_path, rows)
        out = _table(QUERIES["target_encode"][0](str(tmp_path)))
        got = {e: v for e, v in zip(out.column("event_id").to_pylist(),
                                    out.column("loo_cents").to_pylist())}
        assert got == {1: 450.0, 2: 400.0, 3: 150.0, 4: None}

    def test_nan_and_null_excluded(self, ray_session, tmp_path):
        rows = [(1, 1, 0, "A", 1.00), (2, 1, 1, "A", float("nan")),
                (3, 1, 2, "A", 3.00)]
        _events(tmp_path, rows)
        out = _table(QUERIES["target_encode"][0](str(tmp_path)))
        got = {e: v for e, v in zip(out.column("event_id").to_pylist(),
                                    out.column("loo_cents").to_pylist())}
        # NaN row dropped from output AND from the group stats
        assert got == {1: 300.0, 3: 100.0}

    def test_division_bit_exact_vs_numpy(self, ray_session, tmp_path):
        # irregular cents so the division is non-terminating in binary;
        # the kernel must equal the literal (S-c)/(n-1) double op
        rng = np.random.RandomState(7)
        vals = [float(v) / 100.0 for v in rng.randint(1, 10 ** 6, 50)]
        rows = [(i, 1, i, "A", vals[i]) for i in range(50)]
        _events(tmp_path, rows)
        out = _table(QUERIES["target_encode"][0](str(tmp_path)))
        cents = np.floor(np.array(vals) * 100.0).astype(np.int64)
        S, n = cents.sum(), len(cents)
        want = {i: (S - cents[i]).astype(np.float64) / (n - 1)
                for i in range(50)}
        got = {e: v for e, v in zip(out.column("event_id").to_pylist(),
                                    out.column("loo_cents").to_pylist())}
        assert all(got[i] == want[i] for i in range(50))
