import pyarrow as pa
import pytest

from raybeats.conditions import compile_condition
from raybeats.errors import ConfigError


@pytest.fixture
def tbl():
    return pa.table({
        "role": ["user", "tool", "assistant", None],
        "text": ["hello traceback", "ok", "xyz", "tool"],
        "code": [200, 404, 500, None],
        "ip": ["127.0.0.1", "10.1.2.3", "8.8.8.8", "bogus"],
    })


def m(cfg, tbl):
    return compile_condition(cfg)(tbl).to_pylist()


def test_equals(tbl):
    assert m({"equals": {"role": "tool"}}, tbl) == [False, True, False, False]
    assert m({"equals": {"code": 404}}, tbl) == [False, True, False, False]


def test_equals_missing_field(tbl):
    assert m({"equals": {"nope": "x"}}, tbl) == [False] * 4


def test_contains(tbl):
    assert m({"contains": {"text": "traceback"}}, tbl) == [True, False, False, False]


def test_regexp(tbl):
    assert m({"regexp": {"text": "^x"}}, tbl) == [False, False, True, False]


def test_range(tbl):
    assert m({"range": {"code": {"gte": 400, "lt": 500}}}, tbl) == \
        [False, True, False, False]
    assert m({"range": {"code.gte": 500}}, tbl) == [False, False, True, False]


def test_has_fields(tbl):
    assert m({"has_fields": ["role", "code"]}, tbl) == [True, True, True, False]


def test_bool_composition(tbl):
    cfg = {"or": [{"equals": {"role": "tool"}},
                  {"contains": {"text": "traceback"}}]}
    assert m(cfg, tbl) == [True, True, False, False]
    assert m({"not": cfg}, tbl) == [False, False, True, True]
    cfg2 = {"and": [{"equals": {"role": "user"}},
                    {"range": {"code.lt": 300}}]}
    assert m(cfg2, tbl) == [True, False, False, False]


def test_network(tbl):
    assert m({"network": {"ip": "private"}}, tbl) == [False, True, False, False]
    assert m({"network": {"ip": "loopback"}}, tbl) == [True, False, False, False]
    assert m({"network": {"ip": "8.8.0.0/16"}}, tbl) == [False, False, True, False]


def test_bad_config():
    with pytest.raises(ConfigError):
        compile_condition({"frobnicate": {}})
