"""Regression tests for the round-1 code-review findings."""

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from raybeats.processors import build_chain, build_processor
from raybeats.processors.timestamp import go_layout_to_strftime


def test_guarded_drop_fields_nulls_matched_rows():
    p = build_processor({"drop_fields": {"fields": ["secret"],
                                         "when": {"equals": {"role": "user"}}}})
    t = p.apply(pa.table({"role": ["user", "tool"],
                          "secret": ["hide-me", "keep"]}))
    assert t.column("secret").to_pylist() == [None, "keep"]


def test_guarded_rename_moves_value_per_row():
    p = build_processor({"rename": {"fields": [{"from": "a", "to": "b"}],
                                    "when": {"equals": {"x": 1}}}})
    t = p.apply(pa.table({"x": [1, 2], "a": ["v1", "v2"]}))
    assert t.column("b").to_pylist() == ["v1", None]
    assert t.column("a").to_pylist() == [None, "v2"]


def test_unix_fractional_epoch():
    p = build_processor({"timestamp": {"field": "raw", "layouts": ["UNIX"],
                                       "target_field": "out"}})
    t = p.apply(pa.table({"raw": ["1609459200.123456", "bogus"]}))
    vals = t.column("out").to_pylist()
    assert vals[0].microsecond == 123456
    assert vals[1] is None


def test_go_layout_full_month():
    assert go_layout_to_strftime("January 02, 2006") == "%B %d, %Y"
    p = build_processor({"timestamp": {"field": "raw",
                                       "layouts": ["January 02, 2006"],
                                       "target_field": "out"}})
    t = p.apply(pa.table({"raw": ["March 05, 2021"]}))
    v = t.column("out").to_pylist()[0]
    assert (v.year, v.month, v.day) == (2021, 3, 5)


def test_chain_schema_stable_on_empty_and_clean_batches():
    chain = build_chain([
        {"dissect": {"tokenizer": "a=%{a}", "field": "text",
                     "target_prefix": ""}},
        {"fingerprint": {"fields": ["text"]}},
        {"drop_event": {"when": {"equals": {"a": "drop"}}}},
    ])
    base = pa.table({"text": pa.array(["a=ok"])})
    empty = base.slice(0, 0)
    dirty = pa.table({"text": pa.array(["nope"])})
    schemas = {chain(b).schema for b in (base, empty, dirty)}
    assert len(schemas) == 1


def test_debug_only_partition_writes(ray_session, tmp_path):
    """A file whose rows ALL drop must still write schema-consistent
    (empty) output through the partitioned sink."""
    import ray.data as rd

    from raybeats.pipelines import flagship_pipeline

    rows = [{"conv_id": "conv-1", "turn_idx": i, "role": "user",
             "text": f'level=debug ts=t caller=c.go msg="m {i}"',
             "tool": "", "ts": 1_700_000_000_000_000 + i} for i in range(5)]
    t = pa.table({k: [r[k] for r in rows] for k in rows[0]})
    t = t.set_column(t.column_names.index("ts"), "ts",
                     t.column("ts").cast(pa.timestamp("us")))
    f1 = str(tmp_path / "all_debug.parquet")
    pq.write_table(t, f1)
    # second file with normal traffic
    rows2 = [dict(r, text=r["text"].replace("debug", "info")) for r in rows]
    t2 = pa.table({k: [r[k] for r in rows2] for k in rows[0]})
    t2 = t2.set_column(t2.column_names.index("ts"), "ts",
                       t2.column("ts").cast(pa.timestamp("us")))
    f2 = str(tmp_path / "normal.parquet")
    pq.write_table(t2, f2)

    pipe = flagship_pipeline()
    report = pipe.run([f1, f2], str(tmp_path / "out"), partitions=2)
    assert report["per_sink"].get("es_like") == 5
    assert report["pipeline.events.dropped"] == 5


def test_docker_trailing_partial_not_dropped():
    t = pa.table({"message": [
        "2024-01-01T00:00:00.1Z stdout P head-",
        "2024-01-01T00:00:00.2Z stdout P mid-",
    ]})
    out = build_processor({"docker_json": {}}).apply(t)
    assert out.column("container.log").to_pylist() == ["head-mid-"]
    assert "docker_json_partial" in out.column("log_flags").to_pylist()[0]


def test_docker_partial_streams_do_not_mix():
    t = pa.table({"message": [
        "2024-01-01T00:00:00.1Z stdout P out-part-",
        "2024-01-01T00:00:00.2Z stderr F err-line",
        "2024-01-01T00:00:00.3Z stdout F out-end",
    ]})
    out = build_processor({"docker_json": {}}).apply(t)
    logs = out.column("container.log").to_pylist()
    assert "err-line" in logs and "out-part-out-end" in logs


def test_multiline_config_validation():
    from raybeats.sources.logfiles import MultilineJoiner
    with pytest.raises(ValueError):
        MultilineJoiner(mode="count")
    with pytest.raises(ValueError):
        MultilineJoiner(mode="pattern")
    with pytest.raises(ValueError):
        MultilineJoiner(mode="nope", pattern="x")


def test_ratelimit_missing_key_field_raises():
    from raybeats.errors import ConfigError
    p = build_processor({"rate_limit": {"limit": "1/s", "fields": ["typo"]}})
    with pytest.raises(ConfigError):
        p.apply(pa.table({"ts": pa.array([0], pa.timestamp("us"))}))


def test_dissect_rowmode_typed_failure_is_null():
    from raybeats.dissect import Dissector
    d = Dissector("%{a#2|integer} %{b}")  # fixed-length forces row mode
    vals, ok = d.dissect_column(pa.array(["12 ok", "xy bad"]))
    assert vals["a"].to_pylist() == [12, None]
    assert vals["b"].to_pylist() == ["ok", "bad"]
    assert ok.to_pylist() == [True, True]


# ---- round-1 second review findings ----

def test_multiline_max_lines_truncates_not_splits():
    from raybeats.sources.logfiles import MultilineJoiner
    j = MultilineJoiner(mode="pattern", pattern=r"^\s", match="after",
                        max_lines=3)
    msgs, offs = j.join(["err", "  a", "  b", "  c", "  d", "ok"],
                        [0, 4, 8, 12, 16, 20])
    # overflow continuations (c, d) are consumed into truncation, NOT a
    # new event starting with a continuation line
    assert msgs == ["err\n  a\n  b", "ok"]
    assert offs == [0, 20]


def test_sliding_window_counts_ts_peers():
    import numpy as np
    ts = np.array([100, 100, 200], dtype=np.int64)
    lo = np.searchsorted(ts, ts - 3_600_000_000, side="left")
    hi = np.searchsorted(ts, ts, side="right")
    assert list(hi - lo) == [2, 2, 3]  # peers included, like SQL RANGE


def test_streaming_sessionize_empty(ray_session):
    from raybeats.streaming import streaming_sessionize
    out = streaming_sessionize([], n_buckets=2)
    assert out.num_rows == 0
    assert out.column_names == ["user_id", "n_sessions", "n_events"]


def test_read_ndjson_decodes(ray_session, tmp_path):
    from raybeats.sources import read_ndjson
    p = tmp_path / "x.ndjson"
    p.write_text('{"a": 1, "b": "x"}\n{"a": 2}\nnot json\n')
    rows = sorted(read_ndjson([str(p)], expected_keys=["a:int", "b"])
                  .take_all(), key=lambda r: r["log.offset"])
    assert [r["a"] for r in rows] == [1, 2, None]
    assert rows[0]["b"] == "x"


def test_ivf_per_query_probe_isolation(ray_session):
    """A query's neighbors must come from ITS probed lists and must not be
    crowded out by other queries' candidates (second-review fix)."""
    import numpy as np
    import ray.data as rd

    from raybeats.textops.knn import IvfIndex, knn_topk

    ds = rd.read_parquet("/root/testdata/sf0.001/embeddings.parquet",
                         columns=["vec_id", "embedding"])
    q, qids = [], []
    t = ds.take(5)
    for r in t[:3]:
        q.append(r["embedding"])
        qids.append(r["vec_id"])
    q = np.array(q, dtype=np.float64)
    index = IvfIndex.build(ds, n_centroids=8, seed=7)
    # full probe must STILL equal brute force after the rework
    brute = knn_topk(ds, q, qids, k=5).to_pylist()
    full = index.search(ds, q, qids, k=5, nprobe=8).to_pylist()
    assert sorted(map(tuple, (r.values() for r in full))) == \
        sorted(map(tuple, (r.values() for r in brute)))
    # subset probe returns at most k per query, all well-formed
    sub = index.search(ds, q, qids, k=5, nprobe=2).to_pylist()
    per_q = {}
    for r in sub:
        per_q.setdefault(r["query_id"], []).append(r["rank"])
    for qid, ranks in per_q.items():
        assert ranks == list(range(1, len(ranks) + 1))


# ---- round-1 third review findings ----

def test_fractional_second_go_layout():
    p = build_processor({"timestamp": {
        "field": "raw", "layouts": ["2006-01-02 15:04:05.999"],
        "target_field": "out"}})
    t = p.apply(pa.table({"raw": ["2024-01-02 03:04:05.123",
                                  "2024-01-02 03:04:06"]}))
    vals = t.column("out").to_pylist()
    assert vals[0].microsecond == 123000
    assert vals[1].second == 6 and vals[1].microsecond == 0


def test_syslog_layout_tokens():
    from raybeats.processors.timestamp import go_layout_to_strftime
    assert go_layout_to_strftime("Jan _2 15:04:05") == "%b %d %H:%M:%S"


def test_timestamp_ignore_failure_false_raises():
    p = build_processor({"timestamp": {
        "field": "raw", "layouts": ["2006-01-02"], "target_field": "out",
        "ignore_failure": False}})
    with pytest.raises(ValueError, match="failed to parse"):
        p.apply(pa.table({"raw": ["bogus"]}))


def test_when_guard_uncastable_unmatched_rows_flagged():
    p = build_processor({"convert": {
        "fields": [{"from": "code", "type": "long"}],
        "when": {"equals": {"role": "tool"}}}})
    t = p.apply(pa.table({"role": ["tool", "user"],
                          "code": ["7", "n/a"]}))
    assert t.column("code").to_pylist() == [7, None]
    assert "when_merge_type_conflict" in (t.column("log_flags")
                                          .to_pylist()[1] or "")


def test_if_then_else_preserves_order_and_schema():
    p = build_processor({
        "if": {"equals": {"k": "hit"}},
        "then": [{"add_fields": {"target": "", "fields": {"t": "T"}}}],
        "else": [{"add_fields": {"target": "", "fields": {"e": "E"}}}]})
    t = p.apply(pa.table({"k": ["miss", "hit", "miss"]}))
    assert t.column("k").to_pylist() == ["miss", "hit", "miss"]
    assert t.column("t").to_pylist() == [None, "T", None]
    # all-miss and empty batches keep the SAME schema
    t2 = p.apply(pa.table({"k": ["miss"]}))
    t3 = p.apply(pa.table({"k": pa.array([], pa.string())}))
    assert t.schema == t2.schema == t3.schema


def test_dissect_vectorized_ip_matches_row_mode():
    from raybeats.dissect import Dissector
    d = Dissector("%{src|ip} %{msg}")
    assert d.vectorized
    vals, ok = d.dissect_column(pa.array(["10.0.0.1 hello",
                                          "not-an-ip hello"]))
    assert vals["src"].to_pylist() == ["10.0.0.1", ""]
    # row mode agrees
    assert d.dissect_convert("not-an-ip hello")["src"] == ""


# ---- round-1 fourth review findings ----

def test_convert_overflow_flags_not_crashes():
    t = build_processor({"convert": {"fields": [
        {"from": "x", "to": "n", "type": "integer"}]}}).apply(
        pa.table({"x": ["5000000000", "7"]}))
    assert t.column("n").to_pylist() == [None, 7]
    assert "convert_error" in (t.column("log_flags").to_pylist()[0] or "")


def test_extract_array_schema_stable_when_all_short():
    p = build_processor({"extract_array": {"field": "arr",
                                           "mappings": {"third": 2}}})
    a = p.apply(pa.table({"arr": pa.array([["x", "y", "z"]],
                                          pa.list_(pa.string()))}))
    b = p.apply(pa.table({"arr": pa.array([["only"]],
                                          pa.list_(pa.string()))}))
    assert a.schema == b.schema
    assert a.column("third").to_pylist() == ["z"]
    assert b.column("third").to_pylist() == [None]


def test_document_id_merges_with_existing_meta_id():
    import json as json_mod
    t = pa.table({"text": [json_mod.dumps({"doc_id": "d1"}), "not json"],
                  "meta_id": ["old1", "old2"]})
    out = build_processor({"decode_json_fields": {
        "fields": ["text"], "document_id": "doc_id",
        "expected_keys": []}}).apply(t)
    assert out.column("meta_id").to_pylist() == ["d1", "old2"]


def test_empty_condition_bodies_rejected():
    from raybeats.conditions import compile_condition
    from raybeats.errors import ConfigError
    for bad in ({"equals": {}}, {"contains": {}}, {"range": {}},
                {"has_fields": []}):
        with pytest.raises(ConfigError):
            compile_condition(bad)


def test_network_fc00_is_private():
    from raybeats.conditions import compile_condition
    m = compile_condition({"network": {"ip": "private"}})(
        pa.table({"ip": ["fc00::1", "fd12::1", "2001:db8::1"]}))
    assert m.to_pylist() == [True, True, False]


def test_urldecode_plus_without_percent():
    t = build_processor({"urldecode": {"fields": [{"from": "u"}]}}).apply(
        pa.table({"u": ["a+b", "a+b%21", "plain"]}))
    assert t.column("u").to_pylist() == ["a b", "a b!", "plain"]


def test_validate_list_column_byte_limit():
    p = build_processor({"validate": {"max_field_bytes": {"tags": 10}}})
    t = p.apply(pa.table({"tags": pa.array([["a"], ["a" * 50]],
                                           pa.list_(pa.string()))}))
    assert t.column("meta_dead_letter").to_pylist() == [False, True]


def test_token_stats_counts_uppercase():
    from raybeats.textops.analysis import token_stats
    t = token_stats(pa.table({"doc_id": [1], "text": ["HELLO World foo"]}))
    assert t.column("n_tokens").to_pylist() == [3]


def test_docker_json_when_guard_preserves_order():
    t = pa.table({
        "message": ['{"log":"x","stream":"stdout","time":"t"}',
                    "passthrough",
                    '{"log":"y","stream":"stdout","time":"t"}'],
        "seq": [0, 1, 2]})
    p = build_processor({"docker_json": {
        "when": {"contains": {"message": "{"}}}})
    out = p.apply(t)
    assert out.column("seq").to_pylist() == [0, 1, 2]
