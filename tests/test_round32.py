"""Round-32 operators: value_autocorr_lag1 (exact serial-correlation
numerators over user-adjacent pairs) and daily_median_band (per-day
p10/p50/p90 through the repo's one quantile rule). Value assertions
beyond the gate: NaN pairs dropped on either side, pairs never cross
users, perfect-correlation sign, and band ordering p10 ≤ p50 ≤ p90.
"""
import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from raybeats.queries import QUERIES

DAY = 86_400_000_000


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


class TestValueAutocorrLag1:
    def test_perfect_positive(self, ray_session, tmp_path):
        # strictly increasing values -> cov_num > 0; one user
        rows = [(i, i * 1000, 1, "a", float(i + 1)) for i in range(20)]
        _events(tmp_path, rows)
        got = _table(QUERIES["value_autocorr_lag1"][0](str(tmp_path)))
        r = got.to_pylist()[0]
        assert r["n"] == 19 and r["cov_num"] > 0
        # perfect linear: cov² == varx·vary
        assert r["cov_num"] ** 2 == r["varx_num"] * r["vary_num"]

    def test_nan_and_user_boundaries(self, ray_session, tmp_path):
        # NaN in the middle kills BOTH adjacent pairs; user switch
        # kills the boundary pair
        rows = [(0, 0, 1, "a", 1.0), (1, 1, 1, "a", float("nan")),
                (2, 2, 1, "a", 3.0), (3, 3, 1, "a", 4.0),
                (4, 0, 2, "a", 9.0)]
        _events(tmp_path, rows)
        got = _table(QUERIES["value_autocorr_lag1"][0](str(tmp_path)))
        assert got.to_pylist()[0]["n"] == 1  # only (3.0, 4.0)

    def test_oracle_parity_random(self, ray_session, tmp_path):
        rng = np.random.default_rng(223)
        rows = [(i, int(rng.integers(0, 50_000)),
                 int(rng.integers(0, 20)),
                 ["a", "b"][int(rng.integers(0, 2))],
                 float(rng.uniform(0, 40))) for i in range(3000)]
        _events(tmp_path, rows)
        got = _table(QUERIES["value_autocorr_lag1"][0](str(tmp_path)))
        want = _oracle(tmp_path, QUERIES["value_autocorr_lag1"][1])
        assert _sorted_rows(got) == _sorted_rows(want)


class TestDailyMedianBand:
    def test_band_ordering_and_parity(self, ray_session, tmp_path):
        rng = np.random.default_rng(227)
        rows = [(i, int(rng.integers(0, 14)) * DAY
                 + int(rng.integers(0, 1000)), 1, "a",
                 float(rng.uniform(0, 50))) for i in range(4000)]
        _events(tmp_path, rows)
        got = _table(QUERIES["daily_median_band"][0](str(tmp_path)))
        want = _oracle(tmp_path, QUERIES["daily_median_band"][1])
        assert _sorted_rows(got) == _sorted_rows(want)
        for r in got.to_pylist():
            assert r["p10"] <= r["p50"] <= r["p90"]

    def test_single_value_day(self, ray_session, tmp_path):
        rows = [(0, 0, 1, "a", 2.5)]
        _events(tmp_path, rows)
        got = _table(QUERIES["daily_median_band"][0](str(tmp_path)))
        r = got.to_pylist()[0]
        assert (r["p10"], r["p50"], r["p90"]) == (250, 250, 250)
