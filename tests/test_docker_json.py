import pyarrow as pa

from raybeats.processors import build_processor


def test_docker_json_file_format():
    t = pa.table({"message": [
        '{"log":"hello\\n","stream":"stdout","time":"2024-01-01T00:00:00Z"}',
        '{"log":"oops\\n","stream":"stderr","time":"2024-01-01T00:00:01Z"}',
        "garbage"]})
    p = build_processor({"docker_json": {}})
    out = p.apply(t)
    assert out.column("container.log").to_pylist() == ["hello\n", "oops\n",
                                                       None]
    assert out.column("container.stream").to_pylist() == ["stdout", "stderr",
                                                          None]


def test_cri_format_with_partial_join():
    t = pa.table({"message": [
        "2024-01-01T00:00:00.1Z stdout P part1-",
        "2024-01-01T00:00:00.2Z stdout F part2",
        "2024-01-01T00:00:00.3Z stderr F whole",
    ]})
    out = build_processor({"docker_json": {}}).apply(t)
    assert out.column("container.log").to_pylist() == ["part1-part2", "whole"]


def test_stream_filter():
    t = pa.table({"message": [
        "2024-01-01T00:00:00Z stdout F a",
        "2024-01-01T00:00:01Z stderr F b",
    ]})
    out = build_processor({"docker_json": {"stream": "stderr"}}).apply(t)
    assert out.column("container.log").to_pylist() == ["b"]
