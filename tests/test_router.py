import pyarrow as pa

from raybeats.model import META_DEAD_LETTER, SINK
from raybeats.router import Router


def T(**cols):
    return pa.table(cols)


def test_first_match_wins_and_default():
    r = Router(rules=[
        {"sink": "a", "when": {"equals": {"x": 1}}},
        {"sink": "b", "when": {"equals": {"x": 2}}},
    ], default="z")
    out = r.apply(T(x=pa.array([1, 2, 3])))
    assert out.column(SINK).to_pylist() == ["a", "b", "z"]


def test_fmtstr_rule_empty_falls_through():
    # a fmtstr over a null field produces no value -> next rule fires
    r = Router(rules=[
        {"fmtstr": "idx-%{[maybe]}"},
        {"sink": "fallback"},
    ])
    out = r.apply(T(maybe=pa.array(["v", None])))
    assert out.column(SINK).to_pylist() == ["idx-v", "fallback"]


def test_fmtstr_otherwise():
    r = Router(rules=[{"fmtstr": "idx-%{[maybe]}", "otherwise": "other"}])
    out = r.apply(T(maybe=pa.array([None, "x"])))
    assert out.column(SINK).to_pylist() == ["other", "idx-x"]


def test_mappings_rule_with_default():
    r = Router(rules=[
        {"field": "lvl", "mappings": {"error": "alerts", "warn": "watch"},
         "default": "bulk"},
    ])
    out = r.apply(T(lvl=pa.array(["error", "warn", "info", None])))
    assert out.column(SINK).to_pylist() == ["alerts", "watch", "bulk", "bulk"]


def test_dead_letter_override_beats_rules():
    r = Router(rules=[{"sink": "normal"}], default="normal",
               dead_letter="dlq")
    t = T(x=pa.array([1, 2]))
    t = t.append_column(META_DEAD_LETTER, pa.array([True, False]))
    out = r.apply(t)
    assert out.column(SINK).to_pylist() == ["dlq", "normal"]


def test_sink_indexes():
    r = Router(rules=[{"sink": "es", "when": {"equals": {"k": "a"}}},
                      {"sink": "ls"}],
               sink_indexes={"es": "events-%{[lvl]:none}", "ls": "fixed"})
    out = r.apply(T(k=pa.array(["a", "a", "b"]),
                    lvl=pa.array(["info", None, "x"])))
    assert out.column("index").to_pylist() == ["events-info", "events-none",
                                               "fixed"]


def test_from_yaml_example(ray_session, tiny_transcripts):
    import ray.data as rd

    from raybeats.pipeline import Pipeline

    pipe = Pipeline.from_yaml("examples/flagship.yaml")
    ds = pipe.build(rd.read_parquet(tiny_transcripts["files"]))
    rows = ds.take_all()
    sinks = {r["sink"] for r in rows}
    assert sinks == {"es_like", "ls_like", "dead_letter"}
    assert all("fingerprint" in r for r in rows)
