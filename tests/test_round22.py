"""Round-22 operators: pairwise_spread (exact Gini numerator from
histogram partials) and peak_hour_per_type (argmax over a derived
key). Value assertions beyond the gate: brute-force O(n²) parity for
the order-statistics identity, duplicate-heavy inputs, and the
tie-to-smallest-hour rule.
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


class TestPairwiseSpread:
    def test_brute_force_parity(self, ray_session, tmp_path):
        rng = np.random.default_rng(101)
        # duplicate-heavy: only 7 distinct cents values
        vals = rng.choice([0.05, 0.10, 0.10, 0.25, 1.00, 3.33, 9.99],
                          size=500)
        rows = [(i, i, 1, ["a", "b"][i % 2], float(v))
                for i, v in enumerate(vals)]
        _events(tmp_path, rows)
        got = _table(QUERIES["pairwise_spread"][0](str(tmp_path)))
        for r in got.to_pylist():
            c = np.floor(np.array(
                [v for i, v in enumerate(vals)
                 if ["a", "b"][i % 2] == r["event_type"]]) * 100) \
                .astype(np.int64)
            brute = int(np.abs(c[:, None] - c[None, :]).sum() // 2)
            assert r["abs_diff_sum"] == brute
            assert r["n"] == len(c)

    def test_oracle_parity_random(self, ray_session, tmp_path):
        rng = np.random.default_rng(103)
        rows = [(i, i, 1, ["a", "b", "c"][int(rng.integers(0, 3))],
                 float(rng.uniform(-3, 60))) for i in range(3000)]
        _events(tmp_path, rows)
        got = _table(QUERIES["pairwise_spread"][0](str(tmp_path)))
        want = _oracle(tmp_path, QUERIES["pairwise_spread"][1])
        assert _sorted_rows(got) == _sorted_rows(want)


class TestPeakHourPerType:
    def test_tie_to_smallest_hour(self, ray_session, tmp_path):
        hour = 3_600_000_000
        # type a: 2 events at hour 5, 2 at hour 2 -> tie, pick hour 2
        rows = [(0, 5 * hour, 1, "a", 1.0), (1, 5 * hour, 1, "a", 1.0),
                (2, 2 * hour, 1, "a", 1.0), (3, 2 * hour, 1, "a", 1.0),
                (4, 7 * hour, 1, "b", 1.0)]
        _events(tmp_path, rows)
        got = _table(QUERIES["peak_hour_per_type"][0](str(tmp_path)))
        peaks = {r["event_type"]: (r["peak_hour"], r["n_peak"])
                 for r in got.to_pylist()}
        assert peaks == {"a": (2, 2), "b": (7, 1)}

    def test_oracle_parity_random(self, ray_session, tmp_path):
        rng = np.random.default_rng(107)
        rows = [(i, int(rng.integers(0, 72)) * 3_600_000_000, 1,
                 ["a", "b", "c", "d"][int(rng.integers(0, 4))], 1.0)
                for i in range(4000)]
        _events(tmp_path, rows)
        got = _table(QUERIES["peak_hour_per_type"][0](str(tmp_path)))
        want = _oracle(tmp_path, QUERIES["peak_hour_per_type"][1])
        assert _sorted_rows(got) == _sorted_rows(want)
