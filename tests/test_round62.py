"""Round-62 operators: interval_union (gaps-and-islands merge),
pareto_front (2-D skyline with mergeable local-frontier partials),
table_digest (order-invariant modular md5 checksum). Hand boundary
cases, brute-force parity, and the md5_number_lower mirror.
"""
import hashlib

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from raybeats.queries import QUERIES

US = 1_000_000
L = 300 * US  # the 5-minute window


def _table(res):
    if isinstance(res, pa.Table):
        return res
    batches = list(res.iter_batches(batch_size=None,
                                    batch_format="pyarrow"))
    if not batches:
        return pa.table({})
    return pa.concat_tables(batches, promote_options="default")


def _events(tmp_path, rows):
    """rows: (event_id, user_id, ts_us[, event_type, value])."""
    t = pa.table({
        "event_id": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array([r[2] for r in rows], pa.int64()).cast(
            pa.timestamp("us")),
        "user_id": pa.array([r[1] for r in rows], pa.int64()),
        "event_type": pa.array(
            [(r[3] if len(r) > 3 else "click") for r in rows],
            pa.string()),
        "value": pa.array([(r[4] if len(r) > 4 else 1.0) for r in rows],
                          pa.float64()),
        "props": pa.array(["{}"] * len(rows), pa.string())})
    pq.write_table(t, tmp_path / "events.parquet")


class TestIntervalUnion:
    def test_hand_islands(self, ray_session, tmp_path):
        # user 1: overlapping pair + touching third -> ONE island
        #   [0,300) [200,500) [500,800)  => covered 800 s
        # then a strict gap -> second island [1000,1300)
        # user 2: one event -> one island, 300 s
        _events(tmp_path, [
            (1, 1, 0), (2, 1, 200 * US), (3, 1, 500 * US),
            (4, 1, 1000 * US), (5, 2, 7 * US)])
        out = _table(QUERIES["interval_union"][0](str(tmp_path))) \
            .sort_by("user_id")
        assert out.column("user_id").to_pylist() == [1, 2]
        assert out.column("n_islands").to_pylist() == [2, 1]
        assert out.column("covered_us").to_pylist() == [
            800 * US + 300 * US, 300 * US]

    def test_duplicate_ts_and_null_user(self, ray_session, tmp_path):
        # duplicate timestamps merge into one island; null user dropped
        t = pa.table({
            "event_id": pa.array([1, 2, 3], pa.int64()),
            "ts": pa.array([0, 0, None], pa.int64()).cast(
                pa.timestamp("us")),
            "user_id": pa.array([5, 5, None], pa.int64()),
            "event_type": pa.array(["a"] * 3, pa.string()),
            "value": pa.array([1.0] * 3, pa.float64()),
            "props": pa.array(["{}"] * 3, pa.string())})
        pq.write_table(t, tmp_path / "events.parquet")
        out = _table(QUERIES["interval_union"][0](str(tmp_path)))
        assert out.column("user_id").to_pylist() == [5]
        assert out.column("n_islands").to_pylist() == [1]
        assert out.column("covered_us").to_pylist() == [L]

    def test_random_parity_vs_brute(self, ray_session, tmp_path):
        rng = np.random.RandomState(7)
        rows = [(i, int(rng.randint(0, 12)),
                 int(rng.randint(0, 3000)) * US)
                for i in range(300)]
        _events(tmp_path, rows)
        out = _table(QUERIES["interval_union"][0](str(tmp_path))) \
            .sort_by("user_id")
        # brute force: merge sorted intervals per user
        per_user: dict[int, list[int]] = {}
        for _, u, ts in rows:
            per_user.setdefault(u, []).append(ts)
        exp = {}
        for u, los in per_user.items():
            los.sort()
            islands = []
            for lo in los:
                if islands and lo <= islands[-1][1]:
                    islands[-1][1] = max(islands[-1][1], lo + L)
                else:
                    islands.append([lo, lo + L])
            exp[u] = (len(islands),
                      sum(hi - lo for lo, hi in islands))
        got = {u: (n, c) for u, n, c in zip(
            out.column("user_id").to_pylist(),
            out.column("n_islands").to_pylist(),
            out.column("covered_us").to_pylist())}
        assert got == exp


def _orders(tmp_path, rows):
    """rows: (key, price, date_us)."""
    t = pa.table({
        "o_orderkey": pa.array([r[0] for r in rows], pa.int64()),
        "o_custkey": pa.array([1] * len(rows), pa.int64()),
        "o_orderstatus": pa.array(["O"] * len(rows), pa.string()),
        "o_totalprice": pa.array([r[1] for r in rows], pa.float64()),
        "o_orderdate": pa.array([r[2] for r in rows], pa.int64()).cast(
            pa.timestamp("us")),
        "o_orderpriority": pa.array(["1-URGENT"] * len(rows),
                                    pa.string())})
    pq.write_table(t, tmp_path / "orders.parquet")


def _brute_skyline(pts):
    """Non-dominated distinct points with counts."""
    from collections import Counter
    cnt = Counter(pts)
    out = []
    for p in cnt:
        dominated = any(
            q[0] >= p[0] and q[1] >= p[1] and q != p for q in cnt)
        if not dominated:
            out.append((p[0], p[1], cnt[p]))
    return sorted(out)


class TestParetoFront:
    def test_hand_dominance(self, ray_session, tmp_path):
        # (10, 5) dominated by (20, 5); duplicate point counted twice;
        # equal-price chain keeps only the later date
        _orders(tmp_path, [
            (1, 10.0, 5 * US), (2, 20.0, 5 * US), (3, 20.0, 5 * US),
            (4, 20.0, 3 * US), (5, 5.0, 9 * US)])
        out = _table(QUERIES["pareto_front"][0](str(tmp_path)))
        got = sorted(zip(
            out.column("o_totalprice").to_pylist(),
            pa.compute.cast(out.column("o_orderdate"),
                            pa.int64()).to_pylist(),
            out.column("n").to_pylist()))
        assert got == [(5.0, 9 * US, 1), (20.0, 5 * US, 2)]

    def test_random_parity_vs_brute(self, ray_session, tmp_path):
        rng = np.random.RandomState(3)
        rows = [(i, float(rng.randint(0, 40)),
                 int(rng.randint(0, 40)) * US) for i in range(500)]
        _orders(tmp_path, rows)
        out = _table(QUERIES["pareto_front"][0](str(tmp_path)))
        got = sorted(zip(
            out.column("o_totalprice").to_pylist(),
            pa.compute.cast(out.column("o_orderdate"),
                            pa.int64()).to_pylist(),
            out.column("n").to_pylist()))
        assert got == _brute_skyline([(p, d) for _, p, d in rows])

    def test_partial_is_mergeable(self, ray_session, tmp_path):
        # a locally-dominated point is globally dominated, so folding
        # per-block local frontiers is exact: split the same rows over
        # 4 parquet part files (4+ read blocks → 4 independent
        # partials) and the result must equal the brute skyline,
        # including summed counts for points repeated across blocks
        rng = np.random.RandomState(11)
        rows = [(i, float(rng.randint(0, 15)),
                 int(rng.randint(0, 15)) * US) for i in range(400)]
        d = tmp_path / "orders.parquet"
        d.mkdir()
        for k in range(4):
            rs = rows[k::4]
            pq.write_table(pa.table({
                "o_orderkey": pa.array([r[0] for r in rs], pa.int64()),
                "o_custkey": pa.array([1] * len(rs), pa.int64()),
                "o_orderstatus": pa.array(["O"] * len(rs), pa.string()),
                "o_totalprice": pa.array([r[1] for r in rs],
                                         pa.float64()),
                "o_orderdate": pa.array([r[2] for r in rs],
                                        pa.int64()).cast(
                    pa.timestamp("us")),
                "o_orderpriority": pa.array(["1-URGENT"] * len(rs),
                                            pa.string())}),
                d / f"part-{k}.parquet")
        out = _table(QUERIES["pareto_front"][0](str(tmp_path)))
        got = sorted(zip(
            out.column("o_totalprice").to_pylist(),
            pa.compute.cast(out.column("o_orderdate"),
                            pa.int64()).to_pylist(),
            out.column("n").to_pylist()))
        assert got == _brute_skyline([(p, d) for _, p, d in rows])


class TestTableDigest:
    def test_md5_number_lower_mirror(self):
        for s in ["abc", "", "héllo|x", "1|the quick brown fox"]:
            ours = int.from_bytes(
                hashlib.md5(s.encode()).digest()[8:16], "little")
            theirs = duckdb.sql(
                "SELECT CAST(md5_number_lower(?) AS HUGEINT)",
                params=[s]).fetchone()[0]
            assert ours == theirs

    def test_order_invariance_and_null(self, ray_session, tmp_path):
        rows = [(1, "aa", "s1"), (2, "bb", "s1"), (3, None, "s1"),
                (4, "cc", "s2")]
        for perm, sub in [((0, 1, 2, 3), "fwd"), ((2, 0, 3, 1), "rev")]:
            d = tmp_path / sub
            d.mkdir()
            rs = [rows[i] for i in perm]
            pq.write_table(pa.table({
                "doc_id": pa.array([r[0] for r in rs], pa.int64()),
                "text": pa.array([r[1] for r in rs], pa.string()),
                "lang": pa.array(["en"] * 4, pa.string()),
                "source": pa.array([r[2] for r in rs], pa.string()),
                "n_chars": pa.array([0] * 4, pa.int64())}),
                d / "documents.parquet")
        a = _table(QUERIES["table_digest"][0](
            str(tmp_path / "fwd"))).sort_by("source")
        b = _table(QUERIES["table_digest"][0](
            str(tmp_path / "rev"))).sort_by("source")
        assert a.equals(b)
        assert a.column("n_rows").to_pylist() == [3, 1]  # null counts
        exp = sum(int.from_bytes(hashlib.md5(
            f"{i}|{t}".encode()).digest()[8:16], "little")
            for i, t, s in rows if s == "s1" and t is not None) % (1 << 63)
        assert a.column("digest").to_pylist()[0] == exp

    def test_detects_single_row_change(self, ray_session, tmp_path):
        for sub, txt in [("a", "hello"), ("b", "hellp")]:
            d = tmp_path / sub
            d.mkdir()
            pq.write_table(pa.table({
                "doc_id": pa.array([1], pa.int64()),
                "text": pa.array([txt], pa.string()),
                "lang": pa.array(["en"], pa.string()),
                "source": pa.array(["s"], pa.string()),
                "n_chars": pa.array([5], pa.int64())}),
                d / "documents.parquet")
        a = _table(QUERIES["table_digest"][0](str(tmp_path / "a")))
        b = _table(QUERIES["table_digest"][0](str(tmp_path / "b")))
        assert a.column("digest").to_pylist() != \
            b.column("digest").to_pylist()
