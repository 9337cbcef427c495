"""Round-67 operator: clamped_balance — floor-clamped running balance
via the reflection closed form s_i = P_i - min(0, min prefix P).
The segmented running-min regression (descending offsets for a MIN
accumulate) is covered by the multi-user-per-bucket parity test."""
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from raybeats.queries import QUERIES


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


def _brute(rows):
    """Literal recurrence s = max(0, s + d) per user in (ts, eid)
    order; returns {user: (final_balance, n_floor)}."""
    per = {}
    for eid, uid, ts, et, v in sorted(rows, key=lambda r: (r[1], r[2],
                                                           r[0])):
        if et not in ("click", "purchase"):
            continue
        d = int(np.floor(v * 100)) * (1 if et == "click" else -1)
        s, nf = per.get(uid, (0, 0))
        s = max(0, s + d)
        per[uid] = (s, nf + (s == 0))
    return per


class TestClampedBalance:
    def test_hand_clamp(self, ray_session, tmp_path):
        # user 1: +100, -300 (clamp to 0), +50 -> balance 50, floor 1
        rows = [(1, 1, 10, "click", 1.00),
                (2, 1, 20, "purchase", 3.00),
                (3, 1, 30, "click", 0.50),
                (4, 1, 40, "view", 99.0)]  # non-ledger type ignored
        _events(tmp_path, rows)
        out = _table(QUERIES["clamped_balance"][0](str(tmp_path)))
        assert out.column("user_id").to_pylist() == [1]
        assert out.column("balance").to_pylist() == [50]
        assert out.column("n_floor").to_pylist() == [1]

    def test_clamp_changes_result_vs_plain_sum(self, ray_session,
                                               tmp_path):
        # plain running sum would be -200 + 100 = -100; clamp yields
        # 0 then 100
        rows = [(1, 1, 10, "purchase", 2.00),
                (2, 1, 20, "click", 1.00)]
        _events(tmp_path, rows)
        out = _table(QUERIES["clamped_balance"][0](str(tmp_path)))
        assert out.column("balance").to_pylist() == [100]
        assert out.column("n_floor").to_pylist() == [1]

    def test_multi_user_bucket_parity(self, ray_session, tmp_path):
        # many users sharing hash buckets — the segmented running-min
        # must not leak a deep early-user minimum into later users
        # (the descending-offset regression)
        rng = np.random.RandomState(31)
        rows = []
        for i in range(600):
            rows.append((i, int(rng.randint(0, 40)),
                         int(rng.randint(0, 10 ** 6)),
                         ["click", "purchase"][int(rng.randint(2))],
                         float(rng.randint(1, 900)) / 7.0))
        _events(tmp_path, rows)
        out = _table(QUERIES["clamped_balance"][0](str(tmp_path)))
        got = {u: (b, f) for u, b, f in zip(
            out.column("user_id").to_pylist(),
            out.column("balance").to_pylist(),
            out.column("n_floor").to_pylist())}
        assert got == _brute(rows)

    def test_ts_tie_ordered_by_event_id(self, ray_session, tmp_path):
        # equal ts: eid order decides whether the clamp fires
        rows = [(2, 1, 10, "click", 1.00),
                (1, 1, 10, "purchase", 5.00)]  # purchase first by eid
        _events(tmp_path, rows)
        out = _table(QUERIES["clamped_balance"][0](str(tmp_path)))
        # -500 -> clamp 0, then +100
        assert out.column("balance").to_pylist() == [100]
        assert out.column("n_floor").to_pylist() == [1]
