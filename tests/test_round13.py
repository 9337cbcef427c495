"""Round-13 operators: zscore_outliers, pareto_front, missing_ranges,
interval_coverage, tfidf_top_terms. Value assertions beyond the DuckDB
gate: the exact-3-sigma boundary (integer algebra means EXACTLY 3 sigma
is NOT an outlier), frontier domination/tie semantics, cross-bucket gap
stitching, fixed-width interval-union arithmetic, and (tf, df, token)
rank order.
"""
import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from raybeats.queries import QUERIES

_MIN5 = 300_000_000


def _events(tmp_path, rows):
    t = pa.table({
        "event_id": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array([r[1] for r in rows], pa.int64())
        .cast(pa.timestamp("us")),
        "user_id": pa.array([r[2] for r in rows], pa.int64()),
        "event_type": pa.array([r[3] for r in rows], pa.string()),
        "value": pa.array([r[4] for r in rows], pa.float64()),
        "props": pa.array(["{}"] * len(rows), pa.string())})
    pq.write_table(t, tmp_path / "events.parquet")


def _documents(tmp_path, rows):
    t = pa.table({
        "doc_id": pa.array([r[0] for r in rows], pa.int64()),
        "text": pa.array([r[1] for r in rows], pa.string()),
        "lang": pa.array(["en"] * len(rows), pa.string()),
        "source": pa.array(["web"] * len(rows), pa.string()),
        "n_chars": pa.array([len(r[1]) for r in rows], pa.int64())})
    pq.write_table(t, tmp_path / "documents.parquet")


def _table(res):
    if isinstance(res, pa.Table):
        return res
    return pa.concat_tables(res.iter_batches(batch_format="pyarrow"),
                            promote_options="default")


def _oracle(tmp_path, sql, tables=("events",)):
    con = duckdb.connect()
    for tb in tables:
        con.execute(f"CREATE VIEW {tb} AS SELECT * FROM "
                    f"'{tmp_path}/{tb}.parquet'")
    return con.execute(sql).arrow()


def _sorted_rows(tb):
    cols = sorted(tb.column_names)
    return sorted(
        map(tuple, zip(*[tb.column(c).to_pylist() for c in cols])),
        key=lambda r: tuple((v is None, v) for v in r))


class TestZscoreOutliers:
    def test_exact_boundary_not_outlier(self, ray_session, tmp_path):
        # 9 identical + 1 different -> the different row sits at
        # EXACTLY sqrt(n-1) = 3 sigma; strict > means NOT an outlier.
        # Only exact integer algebra gets this boundary right — any
        # float sqrt path would flip on rounding.
        rows = [(i, i, 1, "a", 10.0) for i in range(9)]
        rows.append((9, 9, 1, "a", 200.0))
        _events(tmp_path, rows)
        got = _table(QUERIES["zscore_outliers"][0](str(tmp_path)))
        flags = {r["event_id"]: r["is_outlier"] for r in got.to_pylist()}
        assert flags == {i: False for i in range(10)}

    def test_past_boundary_is_outlier(self, ray_session, tmp_path):
        # 10 identical + 1 different -> z^2 = n-1 = 10 > 9: outlier
        rows = [(i, i, 1, "a", 10.0) for i in range(10)]
        rows.append((10, 10, 1, "a", 200.0))
        _events(tmp_path, rows)
        got = _table(QUERIES["zscore_outliers"][0](str(tmp_path)))
        flags = {r["event_id"]: r["is_outlier"] for r in got.to_pylist()}
        assert flags[10] is True
        assert all(not flags[i] for i in range(10))

    def test_per_type_isolation_and_nulls(self, ray_session, tmp_path):
        # type b's spread must not leak into type a's moments; null
        # value rows drop entirely
        rows = [(i, i, 1, "a", 10.0) for i in range(10)]
        rows.append((10, 10, 1, "a", 200.0))
        rows += [(20 + i, i, 2, "b", float(v))
                 for i, v in enumerate([0, 500, 1000])]
        rows.append((30, 30, 1, "a", None))
        _events(tmp_path, rows)
        got = _table(QUERIES["zscore_outliers"][0](str(tmp_path)))
        flags = {r["event_id"]: r["is_outlier"] for r in got.to_pylist()}
        assert 30 not in flags
        assert flags[10] is True
        assert not any(flags[20 + i] for i in range(3))

    def test_oracle_parity_random(self, ray_session, tmp_path):
        rng = np.random.default_rng(71)
        rows = [(i, int(rng.integers(0, 10**9)),
                 int(rng.integers(0, 20)),
                 str(rng.choice(["a", "b", "c"])),
                 float(rng.normal(50, 20))) for i in range(2000)]
        _events(tmp_path, rows)
        got = _table(QUERIES["zscore_outliers"][0](str(tmp_path)))
        want = _oracle(tmp_path, QUERIES["zscore_outliers"][1])
        assert _sorted_rows(got) == _sorted_rows(want)


class TestParetoFront:
    def test_domination_and_value_ties(self, ray_session, tmp_path):
        # (cents, ts): (600, 0) and (500, 9) are the frontier;
        # (500, 1) loses to (500, 9) on equal value, (400, 5) and
        # (300, 9) lose to (500, 9), (200, 2) dominated by everything
        pts = [(0, 0, 6.0), (1, 9, 5.0), (2, 1, 5.0), (3, 5, 4.0),
               (4, 9, 3.0), (5, 2, 2.0)]
        _events(tmp_path, [(i, ts, 1, "a", v) for i, ts, v in pts])
        got = _table(QUERIES["pareto_front"][0](str(tmp_path)))
        assert sorted(got.column("event_id").to_pylist()) == [0, 1]

    def test_duplicate_points_all_kept(self, ray_session, tmp_path):
        # identical (value, ts) points never strictly dominate each
        # other -> both survive (NOT EXISTS semantics)
        _events(tmp_path, [(0, 5, 1, "a", 3.0), (1, 5, 1, "a", 3.0),
                           (2, 1, 1, "a", 1.0)])
        got = _table(QUERIES["pareto_front"][0](str(tmp_path)))
        assert sorted(got.column("event_id").to_pylist()) == [0, 1]

    def test_oracle_parity_random(self, ray_session, tmp_path):
        rng = np.random.default_rng(72)
        rows = [(i, int(rng.integers(0, 10**7)), 1, "a",
                 float(rng.normal(20, 9))) for i in range(3000)]
        _events(tmp_path, rows)
        got = _table(QUERIES["pareto_front"][0](str(tmp_path)))
        want = _oracle(tmp_path, QUERIES["pareto_front"][1])
        assert _sorted_rows(got) == _sorted_rows(want)


class TestMissingRanges:
    def test_hand_gaps(self, ray_session, tmp_path):
        clicks = [0, 1, 5, 6, 10]
        rows = [(i, i, 1, "click", 1.0) for i in clicks]
        # non-click ids fill some of the holes — they must NOT count
        rows += [(2, 2, 1, "view", 1.0), (8, 8, 1, "view", 1.0)]
        _events(tmp_path, rows)
        got = _table(QUERIES["missing_ranges"][0](str(tmp_path)))
        assert _sorted_rows(got) == [(4, 2), (9, 7)]  # (end, start)

    def test_cross_bucket_stitch(self, ray_session, tmp_path):
        # ids far apart land in different range buckets; the gap
        # between them exists only in the driver stitch
        clicks = [0, 1, 9000, 9001]
        rows = [(i, i, 1, "click", 1.0) for i in clicks]
        rows += [(i, i, 1, "view", 1.0) for i in range(2, 8999, 500)]
        _events(tmp_path, rows)
        got = _table(QUERIES["missing_ranges"][0](str(tmp_path)))
        assert _sorted_rows(got) == [(8999, 2)]

    def test_no_gaps_empty(self, ray_session, tmp_path):
        rows = [(i, i, 1, "click", 1.0) for i in range(5)]
        _events(tmp_path, rows)
        got = _table(QUERIES["missing_ranges"][0](str(tmp_path)))
        assert got.num_rows == 0
        assert got.column_names == ["gap_start", "gap_end"]

    def test_oracle_parity_random(self, ray_session, tmp_path):
        rng = np.random.default_rng(73)
        ids = rng.choice(5000, size=1500, replace=False)
        rows = [(int(i), int(i), 1,
                 str(rng.choice(["click", "view"])), 1.0) for i in ids]
        _events(tmp_path, rows)
        got = _table(QUERIES["missing_ranges"][0](str(tmp_path)))
        want = _oracle(tmp_path, QUERIES["missing_ranges"][1])
        assert _sorted_rows(got) == _sorted_rows(want)


class TestIntervalCoverage:
    def test_fixed_width_union(self, ray_session, tmp_path):
        # user 1: ts 0, 100s, 1000s -> min(100s, 300s) + min(900s,
        # 300s) + 300s = 700s; user 2: one event -> 300s
        s = 1_000_000
        rows = [(0, 0, 1, "a", 1.0), (1, 100 * s, 1, "a", 1.0),
                (2, 1000 * s, 1, "a", 1.0), (3, 0, 2, "a", 1.0)]
        _events(tmp_path, rows)
        got = _table(QUERIES["interval_coverage"][0](str(tmp_path)))
        cov = {r["user_id"]: r["covered_us"] for r in got.to_pylist()}
        assert cov == {1: 700 * s, 2: 300 * s}

    def test_duplicate_ts_no_double_count(self, ray_session, tmp_path):
        rows = [(0, 0, 1, "a", 1.0), (1, 0, 1, "a", 1.0)]
        _events(tmp_path, rows)
        got = _table(QUERIES["interval_coverage"][0](str(tmp_path)))
        assert got.to_pylist() == [{"user_id": 1,
                                    "covered_us": _MIN5}]

    def test_oracle_parity_random(self, ray_session, tmp_path):
        rng = np.random.default_rng(74)
        rows = [(i, int(rng.integers(0, 4 * 86_400_000_000)),
                 int(rng.integers(0, 25)), "a", 1.0)
                for i in range(2500)]
        _events(tmp_path, rows)
        got = _table(QUERIES["interval_coverage"][0](str(tmp_path)))
        want = _oracle(tmp_path, QUERIES["interval_coverage"][1])
        assert _sorted_rows(got) == _sorted_rows(want)


class TestTfidfTopTerms:
    def test_rank_order(self, ray_session, tmp_path):
        _documents(tmp_path, [(1, "apple apple banana"),
                              (2, "banana cherry")])
        got = _table(QUERIES["tfidf_top_terms"][0](str(tmp_path)))
        rows = sorted((r["doc_id"], r["rnk"], r["token"], r["tf"],
                       r["df"]) for r in got.to_pylist())
        assert rows == [
            (1, 1, "apple", 2, 1),   # tf 2 wins
            (1, 2, "banana", 1, 2),
            (2, 1, "cherry", 1, 1),  # rarer (df 1) beats banana (df 2)
            (2, 2, "banana", 1, 2)]

    def test_top3_cut_and_token_tiebreak(self, ray_session, tmp_path):
        _documents(tmp_path, [(1, "d c b a"), (2, "x")])
        got = _table(QUERIES["tfidf_top_terms"][0](str(tmp_path)))
        d1 = sorted((r["rnk"], r["token"]) for r in got.to_pylist()
                    if r["doc_id"] == 1)
        # all tf=1, df=1 -> token asc breaks ties; rank 4 ('d') cut
        assert d1 == [(1, "a"), (2, "b"), (3, "c")]

    def test_oracle_parity_random(self, ray_session, tmp_path):
        rng = np.random.default_rng(75)
        vocab = ["ab", "cd", "ef", "gh", "ij", "kl", "mn", "op"]
        rows = [(i, " ".join(rng.choice(vocab,
                                        size=rng.integers(1, 12))))
                for i in range(300)]
        _documents(tmp_path, rows)
        got = _table(QUERIES["tfidf_top_terms"][0](str(tmp_path)))
        want = _oracle(tmp_path, QUERIES["tfidf_top_terms"][1],
                       tables=("documents",))
        assert _sorted_rows(got) == _sorted_rows(want)
