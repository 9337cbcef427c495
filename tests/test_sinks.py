"""Kafka-style hash-partitioned sink layout + codec NDJSON sink."""

import json
import os

import pyarrow as pa
import pytest


def _fnv32(parts: list[str]) -> int:
    h = 0x811C9DC5
    for p in parts:
        for b in p.encode("utf-8"):
            h = ((h ^ b) * 0x01000193) & 0xFFFFFFFF
    return h


def _tbl():
    return pa.table({
        "conv_id": ["c1", "c2", "c1", "c3", None],
        "role": ["user", "tool", "user", "system", "user"],
        "n": [1, 2, 3, 4, 5]})


def test_kafka_partition_matches_reference_hash():
    from raybeats.sinks import add_kafka_partition
    out = add_kafka_partition(_tbl(), ["conv_id", "role"], 12)
    got = out.column("partition").to_pylist()
    want = [(_fnv32([c or "", r]) & 0x7FFFFFFF) % 12
            for c, r in zip(["c1", "c2", "c1", "c3", None],
                            ["user", "tool", "user", "system", "user"])]
    assert got == want
    # same key fields -> same partition (rows 0 and 2)
    assert got[0] == got[2]


def test_kafka_layout_write(ray_session, tmp_path):
    import ray.data as rd

    from raybeats.sinks import write_kafka_layout
    out = str(tmp_path / "kafka")
    man = write_kafka_layout(rd.from_arrow(_tbl()), out,
                             hash_fields=["conv_id"], n_partitions=4,
                             topic="turns")
    assert man["rows"] == 5
    assert sum(man["lanes"].values()) == 5
    assert all(k.startswith("turns/") for k in man["lanes"])
    # every lane holds only rows whose key hashes to it, and a key never
    # spans two lanes
    seen: dict[str, str] = {}
    for lane in man["lanes"]:
        pdir = os.path.join(out, f"topic=turns/partition={lane.split('/')[1]}")
        t = pa.concat_tables(list(
            rd.read_parquet(pdir).iter_batches(batch_format="pyarrow")))
        for c in t.column("conv_id").to_pylist():
            key = c or ""
            assert seen.setdefault(key, lane) == lane
    assert json.load(open(os.path.join(out, "manifest.json")))["rows"] == 5


def test_kafka_layout_topic_fmtstr_and_drop_fail(ray_session, tmp_path):
    import ray.data as rd

    from raybeats.sinks import write_kafka_layout
    man = write_kafka_layout(rd.from_arrow(_tbl()),
                             str(tmp_path / "k2"),
                             hash_fields=["conv_id"], n_partitions=2,
                             topic="t-%{[role]}")
    topics = {lane.split("/")[0] for lane in man["lanes"]}
    assert topics == {"t-user", "t-tool", "t-system"}
    man2 = write_kafka_layout(rd.from_arrow(_tbl()),
                              str(tmp_path / "k3"),
                              hash_fields=["absent"], n_partitions=2,
                              drop_fail=True)
    assert man2["rows"] == 0


def test_ndjson_json_codec(ray_session, tmp_path):
    import ray.data as rd

    from raybeats.sinks import write_ndjson
    out = str(tmp_path / "nd")
    man = write_ndjson(rd.from_arrow(_tbl()), out)
    assert man["rows"] == 5 and man["dropped"] == 0
    rows = []
    for f in man["files"]:
        with open(f) as fh:
            rows += [json.loads(line) for line in fh]
    assert sorted(r["n"] for r in rows) == [1, 2, 3, 4, 5]
    # compact one-line documents
    with open(man["files"][0]) as fh:
        assert all("\n" not in line.rstrip("\n") for line in fh)


def test_ndjson_escape_html_and_pretty(ray_session, tmp_path):
    import ray.data as rd

    from raybeats.sinks import write_ndjson
    t = pa.table({"msg": ["<b>&x</b>"]})
    man = write_ndjson(rd.from_arrow(t), str(tmp_path / "esc"),
                       codec={"json": {"escape_html": True}})
    text = open(man["files"][0]).read()
    assert "\\u003cb\\u003e\\u0026x" in text and "<" not in text
    assert json.loads(text)["msg"] == "<b>&x</b>"  # escapes round-trip
    man2 = write_ndjson(rd.from_arrow(t), str(tmp_path / "pretty"),
                        codec={"json": {"pretty": True}})
    assert "  " in open(man2["files"][0]).read()


def test_ndjson_format_codec(ray_session, tmp_path):
    import ray.data as rd

    from raybeats.sinks import write_ndjson
    man = write_ndjson(rd.from_arrow(_tbl()), str(tmp_path / "fmt"),
                       codec={"format": {
                           "string": "%{[role]} said %{[n]}"}})
    lines = []
    for f in man["files"]:
        lines += open(f).read().splitlines()
    assert "user said 1" in lines and "tool said 2" in lines
    assert man["rows"] == 5 and man["dropped"] == 0
    # null-rendering rows drop and are counted
    man2 = write_ndjson(rd.from_arrow(_tbl()), str(tmp_path / "fmt2"),
                        codec={"format": {"string": "%{[conv_id]}"}})
    assert man2["dropped"] == 1 and man2["rows"] == 4


def test_ndjson_bad_codec_rejected(ray_session, tmp_path):
    import ray.data as rd

    from raybeats.errors import ConfigError
    from raybeats.sinks import write_ndjson
    with pytest.raises(ConfigError):
        write_ndjson(rd.from_arrow(_tbl()), str(tmp_path / "x"),
                     codec={"nope": {}})


def test_sink_reruns_replace_not_accumulate(ray_session, tmp_path):
    """Re-running a sink over the same out_dir must REPLACE the previous
    generation (stage+swap), never double the manifest counts."""
    import ray.data as rd

    from raybeats.sinks import write_kafka_layout, write_ndjson
    kdir, ndir = str(tmp_path / "k"), str(tmp_path / "n")
    for _ in range(2):
        man_k = write_kafka_layout(rd.from_arrow(_tbl()), kdir,
                                   hash_fields=["conv_id"], n_partitions=4)
        man_n = write_ndjson(rd.from_arrow(_tbl()), ndir)
    assert man_k["rows"] == 5 and sum(man_k["lanes"].values()) == 5
    assert man_n["rows"] == 5 and len(man_n["files"]) >= 1
    stale = [f for f in os.listdir(ndir) if f.endswith(".ndjson")
             and os.path.join(ndir, f) not in man_n["files"]]
    assert stale == []


def test_ivf_rerun_replaces(ray_session, tmp_path):
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from raybeats.textops.knn import IvfIndex, write_ivf_partitioned
    rng = np.random.default_rng(1)
    t = pa.table({"vec_id": pa.array(range(100), pa.int64()),
                  "embedding": pa.array(
                      rng.standard_normal((100, 8)).tolist(),
                      pa.list_(pa.float64()))})
    ds = rd.from_arrow(t).repartition(4)
    index = IvfIndex.build(ds, n_centroids=4, seed=3)
    out = str(tmp_path / "ivf")
    for _ in range(2):
        lanes = write_ivf_partitioned(ds, index, out)
    assert sum(lanes.values()) == 100


def test_kafka_lane_consumer_round_trip(ray_session, tmp_path):
    """Round-trip: produce multi-topic fields-hash layout → lane-parallel
    consume → per-lane contiguity + per-key ordering preserved (the
    kafka per-partition contract; ref partition.go is the producer
    half)."""
    import pyarrow as pa
    import ray.data as rd

    from raybeats.sinks import read_kafka_lanes, write_kafka_layout

    n = 400
    t = pa.table({
        "conv_id": pa.array([f"c{i % 23}" for i in range(n)], pa.string()),
        "turn_idx": pa.array([i // 23 for i in range(n)], pa.int64()),
        "kind": pa.array(["a" if i % 3 else "b" for i in range(n)],
                         pa.string()),
        "ts": pa.array(range(n), pa.int64()),
    })
    out = str(tmp_path / "kafka")
    man = write_kafka_layout(rd.from_arrow(t).repartition(7), out,
                             hash_fields=["conv_id"], n_partitions=5,
                             topic="t-%{[kind]}")
    assert man["rows"] == n and len(man["lanes"]) > 1

    consumed = read_kafka_lanes(out, order_cols=("ts",)).take_all()
    assert len(consumed) == n
    # 1) lanes are contiguous in consumption order and internally
    #    ts-ordered (never interleaved)
    seen_lanes = []
    prev_lane, prev_ts = None, None
    for r in consumed:
        lane = (r["topic"], r["partition"])
        if lane != prev_lane:
            assert lane not in seen_lanes  # a lane appears exactly once
            seen_lanes.append(lane)
            prev_ts = -1
        assert r["ts"] > prev_ts
        prev_lane, prev_ts = lane, r["ts"]
    # 2) every key lives in exactly one lane, so per-key order == input
    by_key = {}
    for r in consumed:
        by_key.setdefault(r["conv_id"], []).append(r)
    for key, rows in by_key.items():
        # the fields-hash partitioner puts a key on ONE partition number
        assert len({r["partition"] for r in rows}) == 1
        # kafka contract: per (key, topic) rows arrive in append order
        per_topic: dict = {}
        for r in rows:
            per_topic.setdefault(r["topic"], []).append(r["turn_idx"])
        for seq in per_topic.values():
            assert seq == sorted(seq)
    # 3) full round trip: same multiset of rows
    got = sorted((r["conv_id"], r["turn_idx"]) for r in consumed)
    want = sorted(zip(t.column("conv_id").to_pylist(),
                      t.column("turn_idx").to_pylist()))
    assert got == want
    # 4) topic filter prunes at the scan
    only_b = read_kafka_lanes(out, topics=["t-b"]).take_all()
    assert {r["topic"] for r in only_b} == {"t-b"}
    assert len(only_b) == sum(v for k, v in man["lanes"].items()
                              if k.startswith("t-b/"))


def test_ndjson_write_read_round_trip(ray_session, tmp_path):
    """read_ndjson consumes write_ndjson's compact json codec back into
    a Dataset: values round-trip at the codec's fidelity (timestamps
    render as ISO strings and type-infer back at second precision),
    column projection works, and non-json codecs have no reader."""
    import datetime
    import ray.data as rd

    from raybeats.errors import ConfigError
    from raybeats.sinks import read_ndjson, write_ndjson
    t = pa.table({
        "a": pa.array([1, 2, 3], pa.int64()),
        "s": pa.array(["x", "y", None], pa.string()),
        "ts": pa.array([1_000_000, 2_000_000, 3_000_000],
                       pa.timestamp("us"))})
    out = str(tmp_path / "nd")
    man = write_ndjson(rd.from_arrow(t), out)
    assert man["rows"] == 3
    back = sorted(read_ndjson(out).take_all(), key=lambda r: r["a"])
    assert [r["a"] for r in back] == [1, 2, 3]
    assert [r["s"] for r in back] == ["x", "y", None]
    assert [r["ts"] for r in back] == [
        datetime.datetime(1970, 1, 1, 0, 0, s) for s in (1, 2, 3)]
    proj = read_ndjson(out, columns=["a"]).take_all()
    assert sorted(r["a"] for r in proj) == [1, 2, 3]
    assert all(set(r) == {"a"} for r in proj)
    with pytest.raises(ConfigError, match="no part"):
        read_ndjson(str(tmp_path / "missing"))


def test_read_ndjson_refuses_non_line_codecs(ray_session, tmp_path):
    import ray.data as rd

    from raybeats.errors import ConfigError
    from raybeats.sinks import read_ndjson, write_ndjson
    t = pa.table({"a": pa.array([1, 2], pa.int64())})
    pretty = str(tmp_path / "pretty")
    write_ndjson(rd.from_arrow(t), pretty, codec={"json": {"pretty": True}})
    with pytest.raises(ConfigError, match="pretty"):
        read_ndjson(pretty)
    fmt = str(tmp_path / "fmt")
    write_ndjson(rd.from_arrow(t), fmt,
                 codec={"format": {"string": "a=%{[a]}"}})
    with pytest.raises(ConfigError, match="format"):
        read_ndjson(fmt)
