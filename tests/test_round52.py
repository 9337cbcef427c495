"""Round-52 operator: csv_roundtrip (CSV sink → read_csv source).
Value assertions: exact parity on random events, and quoting survives
delimiter/quote characters embedded in string values.
"""
import datetime

import pyarrow as pa
import pyarrow.parquet as pq

from raybeats.queries import QUERIES


def _us(i):
    return int(datetime.datetime(2024, 1, 1,
                                 tzinfo=datetime.timezone.utc)
               .timestamp() * 1_000_000) + i * 1_000_000


def _events(tmp_path, rows):
    """rows: (event_id, event_type)."""
    t = pa.table({
        "event_id": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array([_us(r[0]) for r in rows], pa.int64())
        .cast(pa.timestamp("us")),
        "user_id": pa.array([1] * len(rows), pa.int64()),
        "event_type": pa.array([r[1] for r in rows], pa.string()),
        "value": pa.array([1.0] * len(rows), pa.float64()),
        "props": pa.array(["{}"] * len(rows), pa.string())})
    pq.write_table(t, tmp_path / "events.parquet")


def _table(res):
    if isinstance(res, pa.Table):
        return res
    return pa.concat_tables(res.iter_batches(batch_format="pyarrow"),
                            promote_options="default")


class TestCsvRoundtrip:
    def test_quoting_survives(self, ray_session, tmp_path):
        rows = [(1, "plain"), (2, "with,comma"), (3, 'with"quote'),
                (4, "semi;colon"), (5, " leading space")]
        _events(tmp_path, rows)
        got = _table(QUERIES["csv_roundtrip"][0](str(tmp_path)))
        assert sorted(zip(got.column("event_id").to_pylist(),
                          got.column("event_type").to_pylist())) \
            == sorted(rows)

    def test_parity_sf(self, ray_session):
        got = _table(QUERIES["csv_roundtrip"][0](
            "/root/testdata/sf0.001"))
        want = pq.read_table("/root/testdata/sf0.001/events.parquet",
                             columns=["event_id", "event_type"])
        assert sorted(zip(got.column("event_id").to_pylist(),
                          got.column("event_type").to_pylist())) \
            == sorted(zip(want.column("event_id").to_pylist(),
                          want.column("event_type").to_pylist()))
