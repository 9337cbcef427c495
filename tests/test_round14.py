"""Round-14 operators: union_sources, time_weighted_value,
weighted_sample, unpivot_measures. Value assertions beyond the DuckDB
gate: cross-source day alignment, held-duration weighting arithmetic,
weight-scaled inclusion odds, and null-faithful long-format reshape.
(token_freq_sketch is covered in tests/test_sketches.py.)
"""
import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from raybeats.queries import QUERIES

_DAY = 86_400_000_000


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


def _orders(tmp_path, rows):
    t = pa.table({
        "o_orderkey": pa.array([r[0] for r in rows], pa.int64()),
        "o_custkey": pa.array([1] * len(rows), pa.int64()),
        "o_orderstatus": pa.array(["O"] * len(rows), pa.string()),
        "o_totalprice": pa.array([r[2] for r in rows], pa.float64()),
        "o_orderdate": pa.array([r[1] for r in rows], pa.int64())
        .cast(pa.timestamp("us")),
        "o_orderpriority": pa.array(["1-URGENT"] * len(rows),
                                    pa.string())})
    pq.write_table(t, tmp_path / "orders.parquet")


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


class TestUnionSources:
    def test_both_kinds_day_aligned(self, ray_session, tmp_path):
        _events(tmp_path, [(0, 10, 1, "a", 1.5),
                           (1, _DAY + 5, 1, "a", 2.0)])
        _orders(tmp_path, [(0, 20, 10.0), (1, 30, 20.0)])
        got = _table(QUERIES["union_sources"][0](str(tmp_path)))
        rows = sorted((int(r["day"].timestamp() * 1e6) // _DAY,
                       r["kind"], r["n"], r["total_cents"])
                      for r in got.to_pylist())
        assert rows == [(0, "event", 1, 150), (0, "order", 2, 3000),
                        (1, "event", 1, 200)]

    def test_oracle_parity_random(self, ray_session, tmp_path):
        rng = np.random.default_rng(91)
        _events(tmp_path, [(i, int(rng.integers(0, 5 * _DAY)), 1, "a",
                            float(rng.normal(20, 9)))
                           for i in range(800)])
        _orders(tmp_path, [(i, int(rng.integers(0, 5 * _DAY)),
                            float(rng.uniform(1, 900)))
                           for i in range(700)])
        got = _table(QUERIES["union_sources"][0](str(tmp_path)))
        want = _oracle(tmp_path, QUERIES["union_sources"][1],
                       tables=("events", "orders"))
        assert _sorted_rows(got) == _sorted_rows(want)


class TestTimeWeightedValue:
    def test_held_duration_weighting(self, ray_session, tmp_path):
        s = 1_000_000
        # user 1: a@0s v=2.00 held 10s -> num 200*10; b@10s v=5.00
        # held 20s -> num 500*20; c@30s last -> excluded
        rows = [(0, 0, 1, "a", 2.0), (1, 10 * s, 1, "b", 5.0),
                (2, 30 * s, 1, "c", 9.0)]
        _events(tmp_path, rows)
        got = _table(QUERIES["time_weighted_value"][0](str(tmp_path)))
        d = {r["event_type"]: (r["num_cents_s"], r["den_s"])
             for r in got.to_pylist()}
        assert d == {"a": (2000, 10), "b": (10000, 20)}

    def test_sub_second_gap_floors_to_zero(self, ray_session, tmp_path):
        rows = [(0, 0, 1, "a", 2.0), (1, 999_999, 1, "b", 5.0)]
        _events(tmp_path, rows)
        got = _table(QUERIES["time_weighted_value"][0](str(tmp_path)))
        d = {r["event_type"]: (r["num_cents_s"], r["den_s"])
             for r in got.to_pylist()}
        assert d == {"a": (0, 0)}

    def test_oracle_parity_random(self, ray_session, tmp_path):
        rng = np.random.default_rng(92)
        rows = [(i, int(rng.integers(0, 2 * _DAY)),
                 int(rng.integers(0, 15)),
                 str(rng.choice(["a", "b", "c"])),
                 float(rng.normal(30, 12))) for i in range(1500)]
        _events(tmp_path, rows)
        got = _table(QUERIES["time_weighted_value"][0](str(tmp_path)))
        want = _oracle(tmp_path, QUERIES["time_weighted_value"][1])
        assert _sorted_rows(got) == _sorted_rows(want)


class TestWeightedSample:
    def test_weights_boost_inclusion(self, ray_session, tmp_path):
        # 1000 error + 1000 view rows; weight 10 vs 1 must pull the
        # error share of the 200-sample far above its 50% base rate
        rows = [(i, i, 1, "error" if i < 1000 else "view", 1.0)
                for i in range(2000)]
        _events(tmp_path, rows)
        got = _table(QUERIES["weighted_sample"][0](str(tmp_path)))
        kinds = got.column("event_type").to_pylist()
        assert len(kinds) == 200
        assert kinds.count("error") > 140

    def test_rerun_stability(self, ray_session, tmp_path):
        rng = np.random.default_rng(93)
        rows = [(i, i, 1, str(rng.choice(["error", "view"])), 1.0)
                for i in range(3000)]
        _events(tmp_path, rows)
        a = _table(QUERIES["weighted_sample"][0](str(tmp_path)))
        b = _table(QUERIES["weighted_sample"][0](str(tmp_path)))
        assert a.equals(b)

    def test_oracle_parity(self, ray_session, tmp_path):
        rng = np.random.default_rng(94)
        rows = [(int(i), int(i), 1,
                 str(rng.choice(["error", "purchase", "view"])), 1.0)
                for i in rng.choice(10**6, size=2500, replace=False)]
        _events(tmp_path, rows)
        got = _table(QUERIES["weighted_sample"][0](str(tmp_path)))
        want = _oracle(tmp_path, QUERIES["weighted_sample"][1])
        assert _sorted_rows(got) == _sorted_rows(want)


class TestUnpivotMeasures:
    def test_long_format_and_nulls(self, ray_session, tmp_path):
        t = pa.table({
            "l_orderkey": pa.array([1, 2], pa.int64()),
            "l_partkey": pa.array([1, 1], pa.int64()),
            "l_suppkey": pa.array([1, 1], pa.int64()),
            "l_linenumber": pa.array([1, 1], pa.int32()),
            "l_quantity": pa.array([2.0, None], pa.float64()),
            "l_extendedprice": pa.array([10.5, 20.0], pa.float64()),
            "l_discount": pa.array([0.05, 0.1], pa.float64()),
            "l_tax": pa.array([0.02, 0.04], pa.float64()),
            "l_returnflag": pa.array(["N", "N"], pa.string()),
            "l_linestatus": pa.array(["O", "O"], pa.string()),
            "l_shipdate": pa.array([0, 0], pa.int64())
            .cast(pa.timestamp("us"))})
        pq.write_table(t, tmp_path / "lineitem.parquet")
        got = _table(QUERIES["unpivot_measures"][0](str(tmp_path)))
        assert got.num_rows == 8
        d = {(r["l_orderkey"], r["measure"]): r["val_cents"]
             for r in got.to_pylist()}
        assert d[(1, "l_quantity")] == 200
        assert d[(1, "l_extendedprice")] == 1050
        assert d[(2, "l_quantity")] is None  # null stays null
        assert d[(2, "l_discount")] == 10

    def test_oracle_parity_real_table(self, ray_session):
        got = _table(QUERIES["unpivot_measures"][0](
            "/root/testdata/sf0.001"))
        con = duckdb.connect()
        con.execute("CREATE VIEW lineitem AS SELECT * FROM "
                    "'/root/testdata/sf0.001/lineitem.parquet'")
        want = con.execute(QUERIES["unpivot_measures"][1]).arrow()
        assert _sorted_rows(got) == _sorted_rows(want)
