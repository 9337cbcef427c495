"""Property-based check: the vectorized condition compiler must agree
with a naive per-row python evaluation on random condition trees."""

import pyarrow as pa
from hypothesis import given, settings, strategies as st

from raybeats.conditions import compile_condition

FIELDS = ["s", "n", "b"]


def leaf_conditions():
    return st.one_of(
        st.builds(lambda f, v: {"equals": {f: v}},
                  st.sampled_from(["s"]), st.sampled_from(["a", "b", ""])),
        st.builds(lambda v: {"equals": {"n": v}}, st.integers(-5, 5)),
        st.builds(lambda v: {"equals": {"b": v}}, st.booleans()),
        st.builds(lambda v: {"contains": {"s": v}},
                  st.sampled_from(["a", "ab", "z"])),
        st.builds(lambda lo: {"range": {"n": {"gte": lo}}},
                  st.integers(-5, 5)),
        st.builds(lambda hi: {"range": {"n": {"lt": hi}}},
                  st.integers(-5, 5)),
        st.just({"has_fields": ["s"]}),
        st.just({"has_fields": ["missing_col"]}),
    )


conditions = st.recursive(
    leaf_conditions(),
    lambda kids: st.one_of(
        st.builds(lambda a, b: {"or": [a, b]}, kids, kids),
        st.builds(lambda a, b: {"and": [a, b]}, kids, kids),
        st.builds(lambda a: {"not": a}, kids),
    ),
    max_leaves=6)


def naive_eval(cfg: dict, row: dict) -> bool:
    (kind, body), = cfg.items()
    if kind == "equals":
        out = True
        for f, v in body.items():
            x = row.get(f)
            if x is None:
                return False
            if isinstance(v, bool):
                out = out and (bool(x) == v)
            elif isinstance(v, (int, float)):
                try:
                    out = out and (float(x) == float(v))
                except (TypeError, ValueError):
                    return False
            else:
                out = out and (str(x) == str(v))
        return out
    if kind == "contains":
        return all(row.get(f) is not None and str(v) in str(row[f])
                   for f, v in body.items())
    if kind == "range":
        for f, ops in body.items():
            x = row.get(f)
            if x is None:
                return False
            for op, v in ops.items():
                if op == "gte" and not x >= v:
                    return False
                if op == "lt" and not x < v:
                    return False
        return True
    if kind == "has_fields":
        fields = [body] if isinstance(body, str) else body
        return all(row.get(f) is not None for f in fields)
    if kind == "or":
        return any(naive_eval(c, row) for c in body)
    if kind == "and":
        return all(naive_eval(c, row) for c in body)
    if kind == "not":
        return not naive_eval(body, row)
    raise AssertionError(kind)


rows_strategy = st.lists(
    st.fixed_dictionaries({
        "s": st.one_of(st.none(), st.sampled_from(["a", "ab", "b", "z", ""])),
        "n": st.one_of(st.none(), st.integers(-5, 5)),
        "b": st.one_of(st.none(), st.booleans()),
    }), min_size=1, max_size=8)


@settings(max_examples=300, deadline=None)
@given(cfg=conditions, rows=rows_strategy)
def test_compiled_matches_naive(cfg, rows):
    tbl = pa.table({
        "s": pa.array([r["s"] for r in rows], pa.string()),
        "n": pa.array([r["n"] for r in rows], pa.int64()),
        "b": pa.array([r["b"] for r in rows], pa.bool_()),
    })
    got = [bool(x) for x in compile_condition(cfg)(tbl).to_pylist()]
    want = [naive_eval(cfg, r) for r in rows]
    assert got == want, cfg
