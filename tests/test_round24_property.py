"""Property tests for the round 17-24 kernels: the edit-distance-1
verify against a DP Levenshtein reference over adversarial alphabets
(repeated chars, multi-byte codepoints, empty strings), the
exactly-one-shared-blocking-key invariant the single-shuffle fuzzy
join rests on, and the histogram-identity statistics against brute
force. Pure-kernel tests — no Ray session needed.
"""
import numpy as np
from hypothesis import given, settings, strategies as st

# small alphabets maximize collisions and repeated-char runs — the
# adversarial regime for deletion-neighborhood blocking
_ALPHA = st.sampled_from(["a", "b", "ã", "本"])
_WORD = st.lists(_ALPHA, min_size=0, max_size=6).map("".join)


def _lev(a, b):
    m, n = len(a), len(b)
    d = list(range(n + 1))
    for i in range(1, m + 1):
        prev, d[0] = d[0], i
        for j in range(1, n + 1):
            prev, d[j] = d[j], min(d[j] + 1, d[j - 1] + 1,
                                   prev + (a[i - 1] != b[j - 1]))
    return d[n]


@settings(max_examples=300, deadline=None)
@given(a=_WORD, b=_WORD)
def test_verify_edit1_matches_dp(a, b):
    from raybeats.joins import _verify_edit1
    got = _verify_edit1(np.array([a], object), np.array([b], object))
    assert bool(got[0]) == (_lev(a, b) == 1)


@settings(max_examples=300, deadline=None)
@given(a=_WORD, b=_WORD)
def test_distance1_pairs_share_exactly_one_key(a, b):
    """The exactly-once contract of edit1_self_join: a distance-1 pair
    shares exactly ONE deduplicated blocking key; any other distance
    shares zero or collides only as verify-rejected candidates."""
    if a == b:
        return
    ka = set([a] + [a[:i] + a[i + 1:] for i in range(len(a))])
    kb = set([b] + [b[:i] + b[i + 1:] for i in range(len(b))])
    shared = len(ka & kb)
    if _lev(a, b) == 1:
        assert shared == 1
    else:
        # blocking must NEVER find distance-0/2+ pairs via a unique
        # key contract violation that verify wouldn't reject — any
        # shared key here is a candidate the verify kernel drops
        from raybeats.joins import _verify_edit1
        assert not bool(_verify_edit1(np.array([a], object),
                                      np.array([b], object))[0])


@settings(max_examples=200, deadline=None)
@given(vals=st.lists(st.integers(-50, 50), min_size=1, max_size=60))
def test_pairwise_spread_identity(vals):
    """Σ_v n_v·(v·C_<v − S_<v) over sorted distinct values equals the
    brute-force Σ_{i<j}|xi−xj| (the q_pairwise_spread kernel)."""
    c = np.array(sorted(vals), np.int64)
    uniq, n = np.unique(c, return_counts=True)
    cn = np.cumsum(n)
    cs = np.cumsum(n * uniq)
    c_lt = cn - n
    s_lt = cs - n * uniq
    ident = int((n * (uniq * c_lt - s_lt)).sum())
    brute = int(np.abs(c[:, None] - c[None, :]).sum() // 2)
    assert ident == brute


@settings(max_examples=200, deadline=None)
@given(vals=st.lists(st.integers(-9, 9), min_size=1, max_size=50))
def test_trimmed_mean_overlap_identity(vals):
    """Position-overlap trim on the histogram equals sorting and
    slicing (the q_trimmed_mean kernel), ties included."""
    c = np.sort(np.array(vals, np.int64))
    total = len(c)
    k = total // 4
    kept_rows = c[k:total - k]
    uniq, n = np.unique(c, return_counts=True)
    cum = np.cumsum(n)
    lo = np.maximum(cum - n, k)
    hi = np.minimum(cum, total - k)
    kept = np.maximum(hi - lo, 0)
    assert int(kept.sum()) == len(kept_rows)
    assert int((kept * uniq).sum()) == int(kept_rows.sum())


@settings(max_examples=100, deadline=None)
@given(a=st.lists(st.integers(0, 20), min_size=1, max_size=80),
       b=st.lists(st.integers(0, 20), min_size=1, max_size=80))
def test_ks_numerator_identity(a, b):
    """Histogram-cumsum KS numerator equals the definitionally-computed
    max over the union grid (the q_ks_statistic kernel)."""
    aa, bb = np.array(a, np.int64), np.array(b, np.int64)
    grid = np.unique(np.concatenate([aa, bb]))
    ca = np.searchsorted(np.sort(aa), grid, side="right")
    cb = np.searchsorted(np.sort(bb), grid, side="right")
    brute = int(np.abs(ca * len(bb) - cb * len(aa)).max())
    # kernel path
    ua, na = np.unique(aa, return_counts=True)
    ub, nb = np.unique(bb, return_counts=True)
    hn_a = np.zeros(len(grid), np.int64)
    hn_b = np.zeros(len(grid), np.int64)
    hn_a[np.searchsorted(grid, ua)] = na
    hn_b[np.searchsorted(grid, ub)] = nb
    kern = int(np.abs(np.cumsum(hn_a) * len(bb)
                      - np.cumsum(hn_b) * len(aa)).max())
    assert kern == brute


@settings(max_examples=100, deadline=None)
@given(chunks=st.lists(
    st.lists(st.integers(0, 1 << 48), min_size=0, max_size=200),
    min_size=1, max_size=6))
def test_kmv_merge_equals_bulk(chunks):
    """KMV folding is order/split-invariant: merging per-chunk sketches
    equals one bulk fold (the mergeable-partial contract)."""
    from raybeats.textops.sketches import KmvSketch, _fmix64
    bulk = KmvSketch(32)
    allv = [v for ch in chunks for v in ch]
    if allv:
        bulk.add_hashed(_fmix64(np.array(allv, np.uint64)))
    merged = KmvSketch(32)
    for ch in chunks:
        sk = KmvSketch(32)
        if ch:
            sk.add_hashed(_fmix64(np.array(ch, np.uint64)))
        merged.merge(sk)
    assert (bulk.values == merged.values).all()
