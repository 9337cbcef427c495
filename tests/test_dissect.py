"""Dissect tokenizer conformance.

Replays the shared Beats/Logstash corpus
(``libbeat/processors/dissect/testdata/dissect_tests.json``) through the
row-mode Dissector, and checks the vectorized Arrow path agrees with the row
path on every vectorizable tokenizer.
"""

import pyarrow as pa
import pytest

from raybeats.dissect import Dissector
from raybeats.errors import DissectError, DissectParseError


def test_reference_corpus(dissect_corpus):
    ran = 0
    for case in dissect_corpus:
        if case.get("skip"):
            continue
        tok, msg = case["tok"], case["msg"]
        if case.get("fail"):
            with pytest.raises((DissectError, DissectParseError)):
                Dissector(tok).dissect(msg)
        else:
            got = Dissector(tok).dissect(msg)
            assert got == case["expected"], case["name"]
        ran += 1
    assert ran >= 20


def test_vectorized_agrees_with_row_mode(dissect_corpus):
    checked = 0
    for case in dissect_corpus:
        if case.get("skip"):
            continue
        d = Dissector(case["tok"])
        if not d.vectorized:
            continue
        vals, ok = d.dissect_column(pa.array([case["msg"]]))
        if case.get("fail"):
            assert not ok[0].as_py(), case["name"]
        else:
            assert ok[0].as_py(), case["name"]
            got = {k: v[0].as_py() for k, v in vals.items() if v[0].is_valid}
            assert got == case["expected"], case["name"]
        checked += 1
    assert checked >= 10


def test_basic():
    d = Dissector("%{a} %{b}")
    assert d.dissect("hello world") == {"a": "hello", "b": "world"}


def test_greedy_padding():
    d = Dissector("%{a->} %{b}")
    assert d.dissect("foo      bar") == {"a": "foo", "b": "bar"}


def test_append_ordinal():
    d = Dissector("%{+key/2} %{+key/1}")
    assert d.dissect("hello world") == {"key": "world hello"}


def test_append_join_uses_previous_delimiter():
    d = Dissector("%{+key}-%{+key}")
    assert d.dissect("foo-bar") == {"key": "foo-bar"}


def test_indirect():
    d = Dissector("%{?key} %{&key}")
    assert d.dissect("hello world") == {"hello": "world"}


def test_pointer():
    d = Dissector("%{*key} %{&key}")
    assert d.dissect("hello world") == {"hello": "world"}


def test_skip_field():
    d = Dissector("%{} %{b}")
    assert d.dissect("x y") == {"b": "y"}


def test_fixed_length():
    d = Dissector("%{a#3}%{b}")
    assert d.dissect("abcdef") == {"a": "abc", "b": "def"}


def test_trailing_literal_drops_remainder():
    d = Dissector('msg="%{m}"')
    assert d.dissect('msg="hi" extra') == {"m": "hi"}


def test_trailing_key_takes_remainder():
    d = Dissector("a=%{a} rest=%{rest}")
    assert d.dissect("a=1 rest=x y z") == {"a": "1", "rest": "x y z"}


def test_type_conversion():
    d = Dissector("%{n|integer} %{f|float} %{b|boolean} %{s}")
    got = d.dissect_convert("42 1.5 true txt")
    assert got["n"] == 42 and isinstance(got["n"], int)
    assert abs(got["f"] - 1.5) < 1e-6
    assert got["b"] is True
    assert got["s"] == "txt"


def test_type_conversion_hex_and_failure():
    d = Dissector("%{n|long} %{bad|integer}")
    got = d.dissect_convert("0x10 zz")
    assert got["n"] == 16
    assert got["bad"] == "zz"  # failed conversion keeps the raw string


def test_trim():
    d = Dissector("%{a},%{b}", trim_values="all", trim_chars=" ")
    assert d.dissect(" foo , bar ") == {"a": "foo", "b": "bar"}


def test_parse_failures():
    d = Dissector("/var/log/%{key}.log")
    with pytest.raises(DissectParseError):
        d.dissect("foobar")
    with pytest.raises(DissectParseError):
        d.dissect("/var/log/foobar")
    with pytest.raises(DissectParseError):
        d.dissect("")


def test_vectorized_batch_mixed():
    d = Dissector('level=%{level} msg="%{msg}"')
    assert d.vectorized
    arr = pa.array(['level=info msg="ok"', "garbage", None, 'level=warn msg="x y"'])
    vals, ok = d.dissect_column(arr)
    assert ok.to_pylist() == [True, False, False, True]
    assert vals["level"].to_pylist() == ["info", None, None, "warn"]
    assert vals["msg"].to_pylist() == ["ok", None, None, "x y"]
