"""Property-based conformance: the vectorized dissect path must agree
with the exact row-mode implementation on arbitrary inputs."""

import pyarrow as pa
from hypothesis import given, settings, strategies as st

from raybeats.dissect import Dissector
from raybeats.errors import DissectParseError

TOKENIZERS = [
    "%{a} %{b}",
    'level=%{level} ts=%{ts} caller=%{caller} msg="%{msg}"',
    "%{a}-%{b}-%{rest}",
    "%{+joined} %{+joined} %{tail}",
    "%{a->} %{b}",
    "[%{ts}] %{}: %{msg}",
    "%{n|integer},%{f|double},%{s}",
]

text_strategy = st.text(
    alphabet=st.characters(blacklist_categories=("Cs",), max_codepoint=0x2FF),
    max_size=60)


@settings(max_examples=300, deadline=None)
@given(s=text_strategy, tok_i=st.integers(0, len(TOKENIZERS) - 1))
def test_vectorized_equals_row_mode(s, tok_i):
    d = Dissector(TOKENIZERS[tok_i])
    if not d.vectorized:
        return
    vals, ok = d.dissect_column(pa.array([s]))
    try:
        expected = (d.dissect_convert(s) if d.has_types else d.dissect(s))
        row_ok = True
    except DissectParseError:
        expected, row_ok = None, False
    assert ok[0].as_py() == row_ok, (s, TOKENIZERS[tok_i])
    if row_ok:
        got = {k: v[0].as_py() for k, v in vals.items()}
        typed = {f.key for f in d.fields if f.dtype
                 and f.dtype not in ("string", "ip")}
        for k, v in expected.items():
            g = got.get(k)
            if isinstance(v, str) and k in typed:
                # documented divergence (dissect._convert_column): row
                # mode falls back to the raw string on conversion
                # failure; a typed Arrow column holds null instead
                assert g is None, (s, k)
            elif isinstance(v, str) or v is None:
                assert g == v, (s, k)
            elif g is not None:
                assert abs(float(g) - float(v)) < 1e-6 or g == v, (s, k)
