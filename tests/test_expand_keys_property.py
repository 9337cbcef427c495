"""Property test: decode_json_fields expand_keys round-trip.

For any prefix-free set of dotted paths with scalar values, ANY way of
chunking those paths into literal dotted keys + nested objects must
expand and re-flatten to exactly the original path→value map
(jsontransform/expand.go semantics)."""

import json

import pyarrow as pa
from hypothesis import given, settings, strategies as st

from raybeats.processors import build_processor

_SEGS = ["a", "b", "c", "d", "e"]


@st.composite
def _paths_and_chunkings(draw):
    n = draw(st.integers(min_value=1, max_value=6))
    paths = []
    for _ in range(n):
        depth = draw(st.integers(min_value=1, max_value=3))
        p = tuple(draw(st.sampled_from(_SEGS)) for _ in range(depth))
        paths.append(p)
    # prefix-free + unique (a path that is a prefix of another would be
    # a scalar/object conflict by construction)
    uniq = []
    for p in paths:
        if any(q[:len(p)] == p or p[:len(q)] == q for q in uniq):
            continue
        uniq.append(p)
    # chunking: split each path into 1..depth literal dotted chunks
    chunked = []
    for p in uniq:
        cuts = sorted(draw(st.sets(
            st.integers(min_value=1, max_value=len(p) - 1),
            max_size=len(p) - 1))) if len(p) > 1 else []
        bounds = [0] + cuts + [len(p)]
        chunks = [".".join(p[bounds[i]:bounds[i + 1]])
                  for i in range(len(bounds) - 1)]
        chunked.append((p, chunks))
    return chunked


def _build(chunked):
    obj: dict = {}
    vals: dict = {}
    for i, (path, chunks) in enumerate(chunked):
        vals[".".join(path)] = f"v{i}"
        cur = obj
        for ch in chunks[:-1]:
            cur = cur.setdefault(ch, {})
        cur[chunks[-1]] = f"v{i}"
    return obj, vals


@settings(max_examples=150, deadline=None)
@given(_paths_and_chunkings())
def test_expand_keys_roundtrip(chunked):
    obj, want = _build(chunked)
    proc = build_processor({"decode_json_fields": {
        "fields": ["text"], "target": "", "expand_keys": True,
        "expected_keys": sorted(want)}})
    out = proc.apply(pa.table({"text": [json.dumps(obj)]}))
    assert out.column("json_ok").to_pylist() == [True]
    for path, val in want.items():
        assert out.column(path).to_pylist() == [val], path
