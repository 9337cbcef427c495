"""Round-34 operators: first_week_value (self-referential cohort
window), nation_customer_profile (broadcast-dimension rollup),
priority_mix_by_year. Value assertions beyond the gate: the 7-day
boundary is exclusive, later events excluded, negative balances
floor correctly, and year totals re-sum.
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


class TestFirstWeekValue:
    def test_boundary_exclusive(self, ray_session, tmp_path):
        # first at t=0: +6d23h59m59s counts, exactly +7d does NOT
        rows = [(0, 0, 1, "a", 1.0),
                (1, 7 * DAY - 1, 1, "a", 2.0),
                (2, 7 * DAY, 1, "a", 4.0),
                (3, 30 * DAY, 1, "a", 8.0)]
        _events(tmp_path, rows)
        got = _table(QUERIES["first_week_value"][0](str(tmp_path)))
        assert got.to_pylist() == [{"user_id": 1,
                                    "first_week_cents": 300}]

    def test_oracle_parity_random(self, ray_session, tmp_path):
        rng = np.random.default_rng(239)
        rows = [(i, int(rng.integers(0, 40)) * DAY
                 + int(rng.integers(0, 1000)),
                 int(rng.integers(0, 30)), "a",
                 float(rng.uniform(0, 20))) for i in range(3000)]
        _events(tmp_path, rows)
        got = _table(QUERIES["first_week_value"][0](str(tmp_path)))
        want = _oracle(tmp_path, QUERIES["first_week_value"][1])
        assert _sorted_rows(got) == _sorted_rows(want)


class TestNationCustomerProfile:
    def test_oracle_parity_negative_balances(self, ray_session):
        # TPC-H acctbal can be negative: floor(-1.005*100) rounds DOWN
        sf = "/root/testdata/sf0.001"
        got = _table(QUERIES["nation_customer_profile"][0](sf))
        con = duckdb.connect()
        for tb in ("customer", "nation"):
            con.execute(f"CREATE VIEW {tb} AS SELECT * FROM "
                        f"'{sf}/{tb}.parquet'")
        want = con.execute(
            QUERIES["nation_customer_profile"][1]).arrow()
        assert _sorted_rows(got) == _sorted_rows(want)
        assert got.num_rows == 25


class TestPriorityMixByYear:
    def test_year_totals_resum(self, ray_session):
        sf = "/root/testdata/sf0.001"
        got = _table(QUERIES["priority_mix_by_year"][0](sf))
        rows = got.to_pylist()
        by_year: dict = {}
        for r in rows:
            by_year.setdefault(r["yr"], []).append(r)
        for yr, rs in by_year.items():
            assert sum(x["n"] for x in rs) == rs[0]["year_total"]
            assert all(x["year_total"] == rs[0]["year_total"]
                       for x in rs)


class TestCallerErrorRate:
    def test_oracle_parity_and_rates(self, ray_session):
        sf = "/root/testdata/sf0.001"
        from raybeats.queries import QUERIES as Q
        got = _table(Q["caller_error_rate"][0](sf))
        con = duckdb.connect()
        con.execute(f"CREATE VIEW events AS SELECT * FROM "
                    f"'{sf}/events.parquet'")
        want = con.execute(Q["caller_error_rate"][1]).arrow()
        assert _sorted_rows(got) == _sorted_rows(want)
        rows = got.to_pylist()
        assert rows and all(0 <= r["n_error"] <= r["n_lines"]
                            for r in rows)
        # broken/JSON turns never parse: totals < corpus turns
        from raybeats.transcripts import read_transcripts
        total = read_transcripts(sf).count()
        assert sum(r["n_lines"] for r in rows) < total
