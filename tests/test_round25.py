"""Round-25 operators: skew_report (heavy-key diagnostic with exact
share totals), contingency_margins (chi-square cell prep with the
Sunday-0 day-of-week convention), turn_text_dups (cross-conversation
boilerplate detector). Value assertions beyond the gate: candidate
survival across buckets, margin arithmetic (row/col/grand consistency),
and single-conversation texts staying excluded.
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


class TestSkewReport:
    def test_hand_skew(self, ray_session, tmp_path):
        # user 7: 5 events, user 3: 3, users 1,2: 1 each -> total 10
        rows = []
        eid = 0
        for u, k in [(7, 5), (3, 3), (1, 1), (2, 1)]:
            for _ in range(k):
                rows.append((eid, eid, u, "a", 1.0))
                eid += 1
        _events(tmp_path, rows)
        got = _table(QUERIES["skew_report"][0](str(tmp_path)))
        out = [(r["user_id"], r["n_events"], r["total_events"])
               for r in got.to_pylist()]
        assert out == [(7, 5, 10), (3, 3, 10), (1, 1, 10), (2, 1, 10)]

    def test_oracle_parity_many_buckets(self, ray_session, tmp_path):
        rng = np.random.default_rng(149)
        # zipf-ish skew across enough users to span several buckets
        rows = [(i, i, int(rng.zipf(1.6)) % 500, "a", 1.0)
                for i in range(6000)]
        _events(tmp_path, rows)
        got = _table(QUERIES["skew_report"][0](str(tmp_path)))
        want = _oracle(tmp_path, QUERIES["skew_report"][1])
        assert _sorted_rows(got) == _sorted_rows(want)


class TestContingencyMargins:
    def test_margin_arithmetic(self, ray_session, tmp_path):
        rng = np.random.default_rng(151)
        day = 86_400_000_000
        rows = [(i, int(rng.integers(0, 21)) * day, 1,
                 ["a", "b"][int(rng.integers(0, 2))], 1.0)
                for i in range(2000)]
        _events(tmp_path, rows)
        got = _table(QUERIES["contingency_margins"][0](str(tmp_path)))
        want = _oracle(tmp_path, QUERIES["contingency_margins"][1])
        assert _sorted_rows(got) == _sorted_rows(want)
        rows_out = got.to_pylist()
        grand = rows_out[0]["grand_total"]
        assert sum(r["observed"] for r in rows_out) == grand
        # each row's margins must re-sum from the cells
        for r in rows_out:
            rt = sum(x["observed"] for x in rows_out
                     if x["event_type"] == r["event_type"])
            ct = sum(x["observed"] for x in rows_out
                     if x["dow"] == r["dow"])
            assert (r["row_total"], r["col_total"]) == (rt, ct)
        assert {r["dow"] for r in rows_out} <= set(range(7))


class TestTurnTextDups:
    def test_single_conv_excluded(self, ray_session, tmp_path):
        # props-texts repeat across users (convs); log-line texts embed
        # the unique event_id so they never dup
        rows = [(8, 100, 1, "view", 1.0),   # eid%10=8 -> text = props
                (18, 200, 2, "view", 1.0),  # same props text, conv 2
                (28, 300, 1, "view", 1.0),  # same text, conv 1 again
                (9, 400, 3, "view", 1.0)]   # props text, single conv
        t = pa.table({
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array([r[1] for r in rows], pa.int64())
            .cast(pa.timestamp("us")),
            "user_id": pa.array([r[2] for r in rows], pa.int64()),
            "event_type": pa.array([r[3] for r in rows], pa.string()),
            "value": pa.array([r[4] for r in rows], pa.float64()),
            "props": pa.array(['{"k":1}', '{"k":1}', '{"k":1}',
                               '{"k":9}'], pa.string())})
        pq.write_table(t, tmp_path / "events.parquet")
        got = _table(QUERIES["turn_text_dups"][0](str(tmp_path)))
        out = {r["text"]: (r["n_turns"], r["n_convs"])
               for r in got.to_pylist()}
        assert out == {'{"k":1}': (3, 2)}

    def test_oracle_parity_sf(self, ray_session):
        got = _table(QUERIES["turn_text_dups"][0](
            "/root/testdata/sf0.001"))
        con = duckdb.connect()
        con.execute("CREATE VIEW events AS SELECT * FROM "
                    "'/root/testdata/sf0.001/events.parquet'")
        want = con.execute(QUERIES["turn_text_dups"][1]).arrow()
        assert _sorted_rows(got) == _sorted_rows(want)
