"""Property tests for the newest pure kernels — no Ray session:
`_overlap_pair_counts` against an O(n²) brute force (random keys,
clustered days, window boundaries), `_conv_tool_presence` triple/pair
counts against itertools combinations over sets, and the front-loaded
NTILE arithmetic against a direct simulation of SQL NTILE sizes.
"""
import itertools

import numpy as np
import pyarrow as pa
from hypothesis import given, settings, strategies as st

from raybeats.queries import (_conv_tool_presence, _ntile_front_loaded,
                              _overlap_pair_counts)


@settings(max_examples=200, deadline=None)
@given(st.lists(st.tuples(st.integers(0, 5), st.integers(0, 80)),
                min_size=0, max_size=40),
       st.integers(1, 40))
def test_overlap_pairs_match_brute_force(rows, window):
    c = np.array([r[0] for r in rows], np.int64)
    d = np.array([r[1] for r in rows], np.int64)
    custs, pairs = _overlap_pair_counts(c, d, window)
    got = dict(zip(custs.tolist(), pairs.tolist()))
    want: dict[int, int] = {}
    for i in range(len(rows)):
        for j in range(i + 1, len(rows)):
            if rows[i][0] == rows[j][0] \
                    and abs(rows[i][1] - rows[j][1]) < window:
                want[rows[i][0]] = want.get(rows[i][0], 0) + 1
    assert got == want


def test_overlap_span_guard_raises():
    c = np.zeros(2, np.int64)
    d = np.array([0, (1 << 16)], np.int64)
    try:
        _overlap_pair_counts(c, d, 30)
    except ValueError:
        pass
    else:  # pragma: no cover
        raise AssertionError("span guard did not fire")


@settings(max_examples=150, deadline=None)
@given(st.lists(st.tuples(st.integers(0, 8),
                          st.sampled_from(["a", "b", "c", "d", "e"])),
                min_size=0, max_size=60))
def test_presence_matrix_counts_match_sets(pairs):
    g = pa.table({"conv": pa.array([str(p[0]) for p in pairs],
                                   pa.string()),
                  "tool": pa.array([p[1] for p in pairs],
                                   pa.string())})
    tools_sorted, m, n_conv = _conv_tool_presence(g)
    sets: dict[str, set] = {}
    for cv, tl in pairs:
        sets.setdefault(str(cv), set()).add(tl)
    assert n_conv == len(sets)
    assert list(tools_sorted) == sorted({p[1] for p in pairs})
    idx = {t: i for i, t in enumerate(tools_sorted)}
    # pairwise and triple counts equal the set-combination truth
    for a, b in itertools.combinations(tools_sorted, 2):
        want = sum(1 for s in sets.values() if a in s and b in s)
        assert int(np.count_nonzero(m[:, idx[a]] & m[:, idx[b]])) \
            == want
    for a, b, c in itertools.combinations(tools_sorted, 3):
        want = sum(1 for s in sets.values()
                   if a in s and b in s and c in s)
        assert int(np.count_nonzero(
            m[:, idx[a]] & m[:, idx[b]] & m[:, idx[c]])) == want


def _sql_ntile_sizes(n, k=10):
    q, r = divmod(n, k)
    return [q + 1 if d < r else q for d in range(k)]


@settings(max_examples=300, deadline=None)
@given(st.integers(0, 500))
def test_ntile_arithmetic_matches_sql_sizes(n):
    """The REAL shared kernel (used by ntile_deciles and
    decile_transition) assigns the front-loaded tile of every rank,
    exactly SQL NTILE(10)."""
    sizes = _sql_ntile_sizes(n)
    want = np.repeat(np.arange(1, 11), sizes)
    rnk = np.arange(1, n + 1)
    dec = np.asarray(_ntile_front_loaded(rnk, n))
    assert dec.tolist() == want.tolist()
