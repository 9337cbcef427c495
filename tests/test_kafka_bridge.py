"""Kafka-lane consumer → streaming bridge: time-sliced lane replay must
feed the keyed-actor streaming modes and reproduce the batch results
exactly (produce → lane-slice → stream ≡ batch over the same rows)."""

import pyarrow as pa
import pyarrow.parquet as pq

SF = "/root/testdata/sf0.001"


def _events_tbl():
    return pq.read_table(f"{SF}/events.parquet",
                         columns=["event_id", "user_id", "ts", "value"])


def _layout(tmp_path):
    import ray.data as rd

    from raybeats.sinks import write_kafka_layout
    out = str(tmp_path / "kafka")
    man = write_kafka_layout(rd.from_arrow(_events_tbl()).repartition(5),
                             out, hash_fields=["user_id"], n_partitions=6)
    assert man["rows"] == _events_tbl().num_rows
    return out


def test_bridge_window_agg_equals_batch(ray_session, tmp_path):
    from raybeats.streaming import kafka_micro_batches, streaming_window_agg
    from raybeats.util import hour_cents_partial

    out = _layout(tmp_path)
    batches = kafka_micro_batches(out, time_col="ts", n_slices=3,
                                  columns=["event_id", "user_id", "ts",
                                           "value"])
    streamed = streaming_window_agg(batches, n_buckets=4)

    want = hour_cents_partial(_events_tbl()).sort_by(
        [("user_id", "ascending"), ("hour", "ascending")])
    assert streamed.to_pylist() == want.to_pylist()


def test_bridge_sessionize_equals_batch(ray_session, tmp_path):
    from raybeats.queries import q_sessionization
    from raybeats.streaming import kafka_micro_batches, streaming_sessionize

    out = _layout(tmp_path)
    batches = kafka_micro_batches(out, time_col="ts", n_slices=4,
                                  columns=["event_id", "user_id", "ts"])
    streamed = streaming_sessionize(batches, n_buckets=3).to_pylist()
    batch = sorted(q_sessionization(SF).take_all(),
                   key=lambda r: r["user_id"])
    assert streamed == batch


def test_slices_are_time_ordered_and_complete(ray_session, tmp_path):
    """Every row lands in exactly one slice and slice k's max ts precedes
    slice k+1's min ts (the _drive_keyed_actors ordering contract)."""
    from raybeats.streaming import kafka_micro_batches

    out = _layout(tmp_path)
    seen, prev_max = 0, None
    for ds in kafka_micro_batches(out, time_col="ts", n_slices=3,
                                  columns=["event_id", "ts"]):
        t = pa.concat_tables(list(ds.iter_batches(batch_format="pyarrow")))
        if t.num_rows == 0:
            continue
        ts = sorted(t.column("ts").to_pylist())
        if prev_max is not None:
            assert ts[0] > prev_max
        prev_max = ts[-1]
        seen += t.num_rows
    assert seen == _events_tbl().num_rows
