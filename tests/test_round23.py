"""Round-23 operators: tool_latency (flagship per-conversation LAG
report) and ks_statistic (exact two-sample Kolmogorov–Smirnov drift
numerator). Value assertions beyond the gate: first-turn exclusion,
per-conversation isolation of the lag, and brute-force KS parity on
shifted distributions (the statistic must DETECT a drift).
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


class TestToolLatency:
    def test_oracle_parity_sf(self, ray_session, tmp_path):
        # random events at sf-like shape: the transcripts derivation
        # provides role/tool; parity is the full check here
        rng = np.random.default_rng(113)
        types = ["signup", "click", "view", "purchase", "refund"]
        rows = [(i, int(rng.integers(0, 10_000_000)),
                 int(rng.integers(0, 40)),
                 types[int(rng.integers(0, 5))],
                 float(rng.uniform(0, 10))) for i in range(3000)]
        _events(tmp_path, rows)
        got = _table(QUERIES["tool_latency"][0](str(tmp_path)))
        want = _oracle(tmp_path, QUERIES["tool_latency"][1])
        assert _sorted_rows(got) == _sorted_rows(want)
        assert got.num_rows >= 3  # several tools observed

    def test_first_turn_excluded(self, ray_session, tmp_path):
        # one user whose FIRST event is tool-role ('refund' -> 'tool');
        # with no previous turn it must not contribute
        rows = [(0, 100, 1, "refund", 1.0)]
        _events(tmp_path, rows)
        got = _table(QUERIES["tool_latency"][0](str(tmp_path)))
        assert got.num_rows == 0


class TestKsStatistic:
    def test_detects_shift(self, ray_session, tmp_path):
        # view ~ U[0,10), buy ~ U[5,15): KS must be large and exact
        rng = np.random.default_rng(127)
        rows = []
        for i in range(2000):
            rows.append((2 * i, i, 1, "view",
                         float(rng.uniform(0, 10))))
            rows.append((2 * i + 1, i, 1, "purchase",
                         float(rng.uniform(5, 15))))
        _events(tmp_path, rows)
        got = _table(QUERIES["ks_statistic"][0](str(tmp_path)))
        r = got.to_pylist()[0]
        want = _oracle(tmp_path, QUERIES["ks_statistic"][1])
        assert _sorted_rows(got) == _sorted_rows(want)
        # D = ks_num / (n_a * n_b) should be near the true 0.5
        d = r["ks_num"] / (r["n_view"] * r["n_buy"])
        assert 0.4 < d < 0.6
        # brute-force parity on the numerator
        a = np.floor(np.array([x[4] for x in rows
                               if x[3] == "view"]) * 100).astype(int)
        b = np.floor(np.array([x[4] for x in rows
                               if x[3] == "purchase"]) * 100).astype(int)
        grid = np.unique(np.concatenate([a, b]))
        ca = np.searchsorted(np.sort(a), grid, side="right")
        cb = np.searchsorted(np.sort(b), grid, side="right")
        brute = int(np.abs(ca * len(b) - cb * len(a)).max())
        assert r["ks_num"] == brute

    def test_identical_distributions(self, ray_session, tmp_path):
        # same values on both sides -> ks_num == 0
        rows = []
        for i in range(100):
            v = float(i % 7)
            rows.append((2 * i, i, 1, "view", v))
            rows.append((2 * i + 1, i, 1, "purchase", v))
        _events(tmp_path, rows)
        got = _table(QUERIES["ks_statistic"][0](str(tmp_path)))
        assert got.to_pylist()[0]["ks_num"] == 0
