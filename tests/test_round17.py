"""Round-17 operators: fuzzy_name_pairs (deletion-neighborhood
edit-distance-1 self-join), trend_slope (exact-integer grouped OLS),
entry_exit (first/last event-type pairs), conv_turn_histogram.
Value assertions beyond the DuckDB gate: randomized brute-force
Levenshtein parity (unicode included), exactly-once pair emission,
footer-stats fallback, and tie-break ordering.
"""
import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from raybeats.queries import QUERIES


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


def _lev(a, b):
    m, n = len(a), len(b)
    d = list(range(n + 1))
    for i in range(1, m + 1):
        prev, d[0] = d[0], i
        for j in range(1, n + 1):
            prev, d[j] = d[j], min(d[j] + 1, d[j - 1] + 1,
                                   prev + (a[i - 1] != b[j - 1]))
    return d[n]


class TestVerifyEdit1:
    def test_randomized_brute_force(self):
        from raybeats.joins import _verify_edit1
        rng = np.random.default_rng(17)
        vocab = ["", "a", "b", "ab", "ba", "aa", "aab", "aac", "abc",
                 "日本語", "日本誤", "日本語x", "本語", "ñcafé", "ncafé"]
        vocab += ["".join(rng.choice(list("abc"),
                                     size=rng.integers(1, 6)))
                  for _ in range(60)]
        vocab = sorted(set(vocab))
        pairs = [(x, y) for i, x in enumerate(vocab)
                 for y in vocab[i + 1:]]
        a = np.array([p[0] for p in pairs], object)
        b = np.array([p[1] for p in pairs], object)
        got = _verify_edit1(a, b)
        want = np.array([_lev(x, y) == 1 for x, y in pairs])
        assert (got == want).all()

    def test_empty(self):
        from raybeats.joins import _verify_edit1
        assert len(_verify_edit1(np.array([], object),
                                 np.array([], object))) == 0


class TestFuzzyNamePairs:
    def _customer(self, tmp_path, names):
        t = pa.table({
            "c_custkey": pa.array(range(len(names)), pa.int64()),
            "c_name": pa.array(names, pa.string()),
            "c_nationkey": pa.array([0] * len(names), pa.int64()),
            "c_mktsegment": pa.array(["A"] * len(names), pa.string())})
        pq.write_table(t, tmp_path / "customer.parquet")

    def test_exactly_once_and_parity(self, ray_session, tmp_path):
        # duplicates across rows, a null, unicode, repeated-char runs
        names = ["cat", "cut", "cart", "ca", "cat", "aaab", "aab",
                 "日本語", "日本誤", None, "xyz"]
        self._customer(tmp_path, names)
        got = _table(QUERIES["fuzzy_name_pairs"][0](str(tmp_path)))
        rows = list(zip(got.column("name_a").to_pylist(),
                        got.column("name_b").to_pylist()))
        # exactly-once: no duplicate pairs even with duplicate values
        assert len(rows) == len(set(rows))
        distinct = sorted(set(n for n in names if n is not None))
        want = sorted((x, y) for i, x in enumerate(distinct)
                      for y in distinct[i + 1:] if _lev(x, y) == 1)
        assert sorted(rows) == want
        assert ("cat", "cut") in rows and ("aaab", "aab") in rows
        assert ("日本語", "日本誤") in rows

    def test_oracle_parity_random(self, ray_session, tmp_path):
        rng = np.random.default_rng(99)
        names = ["User#%04d" % rng.integers(0, 400)
                 for _ in range(600)]
        self._customer(tmp_path, names)
        got = _table(QUERIES["fuzzy_name_pairs"][0](str(tmp_path)))
        want = _oracle(tmp_path, QUERIES["fuzzy_name_pairs"][1],
                       tables=("customer",))
        assert _sorted_rows(got) == _sorted_rows(want)


class TestTrendSlope:
    def test_hand_slope(self, ray_session, tmp_path):
        # type a: days 0,1,2 with cents 100,200,300 -> perfect slope:
        # n=3 sx=3 sy=600 sxx=5 sxy=(0+200+600)=800
        # num = 3*800-3*600 = 600; den = 3*5-9 = 6  (slope 100 c/day)
        day = 86_400_000_000
        rows = [(0, 0 * day, 1, "a", 1.0), (1, 1 * day, 1, "a", 2.0),
                (2, 2 * day, 1, "a", 3.0)]
        _events(tmp_path, rows)
        got = _table(QUERIES["trend_slope"][0](str(tmp_path)))
        r = got.to_pylist()[0]
        assert r == {"event_type": "a", "n": 3, "slope_num": 600,
                     "slope_den": 6}

    def test_rebase_and_oracle(self, ray_session, tmp_path):
        # far-from-epoch timestamps: rebasing must keep integers small
        rng = np.random.default_rng(5)
        base = 1_700_000_000_000_000  # ~2023 epoch us
        rows = [(i, base + int(rng.integers(0, 40)) * 86_400_000_000
                 + int(rng.integers(0, 1000)), int(rng.integers(0, 9)),
                 ["a", "b"][int(rng.integers(0, 2))],
                 float(rng.uniform(0.5, 99.5))) for i in range(2000)]
        _events(tmp_path, rows)
        got = _table(QUERIES["trend_slope"][0](str(tmp_path)))
        want = _oracle(tmp_path, QUERIES["trend_slope"][1])
        assert _sorted_rows(got) == _sorted_rows(want)

    def test_footer_stats_fallback(self, ray_session, tmp_path):
        day = 86_400_000_000
        rows = [(i, (i % 4) * day, 1, "a", float(i)) for i in range(12)]
        t = pa.table({
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array([r[1] for r in rows], pa.int64())
            .cast(pa.timestamp("us")),
            "user_id": pa.array([r[2] for r in rows], pa.int64()),
            "event_type": pa.array([r[3] for r in rows], pa.string()),
            "value": pa.array([r[4] for r in rows], pa.float64()),
            "props": pa.array(["{}"] * len(rows), pa.string())})
        pq.write_table(t, tmp_path / "events.parquet",
                       write_statistics=False)
        got = _table(QUERIES["trend_slope"][0](str(tmp_path)))
        want = _oracle(tmp_path, QUERIES["trend_slope"][1])
        assert _sorted_rows(got) == _sorted_rows(want)


class TestEntryExit:
    def test_tie_break_and_nulls(self, ray_session, tmp_path):
        # user 1: same ts everywhere -> event_id breaks ties
        rows = [(3, 100, 1, "c", 1.0), (1, 100, 1, "a", 1.0),
                (2, 100, 1, "b", 1.0),
                (4, 50, 2, "x", 1.0), (5, 60, 2, "y", 1.0)]
        _events(tmp_path, rows)
        got = _table(QUERIES["entry_exit"][0](str(tmp_path)))
        rows_out = {(r["entry_type"], r["exit_type"]): r["n_users"]
                    for r in got.to_pylist()}
        assert rows_out == {("a", "c"): 1, ("x", "y"): 1}

    def test_oracle_parity_random(self, ray_session, tmp_path):
        rng = np.random.default_rng(23)
        rows = [(i, int(rng.integers(0, 10_000)),
                 int(rng.integers(0, 40)),
                 ["a", "b", "c", "d"][int(rng.integers(0, 4))],
                 1.0) for i in range(3000)]
        _events(tmp_path, rows)
        got = _table(QUERIES["entry_exit"][0](str(tmp_path)))
        want = _oracle(tmp_path, QUERIES["entry_exit"][1])
        assert _sorted_rows(got) == _sorted_rows(want)


class TestConvTurnHistogram:
    def test_mass_conservation(self, ray_session):
        sf = "/root/testdata/sf0.001"
        got = _table(QUERIES["conv_turn_histogram"][0](sf))
        n = got.column("n_turns").to_numpy(zero_copy_only=False)
        c = got.column("n_convs").to_numpy(zero_copy_only=False)
        from raybeats.transcripts import read_transcripts
        total = read_transcripts(sf).count()
        assert int((n * c).sum()) == total
        assert (c > 0).all() and (n > 0).all()
