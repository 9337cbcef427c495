"""Text analysis operators for training-data pipelines: token counting,
quality scoring, language-ID heuristics, document fingerprinting.

All are narrow (shuffle-free) vectorized ``map_batches`` stages over the
``documents`` table.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

TOKEN_RE = r"[a-zA-Z0-9]+"
STOPWORD_RE = r"\b(the|a|of|and|to|in|is|it)\b"

_STOP_PROFILES = {
    # tiny per-language stopword profiles for the n-gram/stopword heuristic
    "en": {"the", "and", "of", "a", "to", "in", "is", "it", "for", "on"},
    "es": {"el", "la", "de", "que", "y", "en", "un", "los", "se", "no"},
    "de": {"der", "die", "und", "das", "in", "von", "zu", "den", "mit", "ist"},
    "fr": {"le", "la", "de", "et", "les", "des", "un", "une", "du", "est"},
    "zh": set(),  # no-latin heuristic below
}


def flat_tokens(text: pa.ChunkedArray | pa.Array):
    """Lowercase ``[a-z0-9]+`` tokens of a string column, flattened:
    ``(row_id, tokens, n_rows)`` — the same token multiset per row as
    ``regexp_extract_all(lower(text), '[a-z0-9]+')`` (split on the
    complement class, empties dropped). Single-sourced here so the
    bigram, repetition and contamination kernels cannot desynchronize
    their tokenizers."""
    toks = pc.split_pattern_regex(pc.utf8_lower(text), "[^a-z0-9]+")
    if isinstance(toks, pa.ChunkedArray):
        toks = toks.combine_chunks()
    offsets = toks.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    flat = toks.flatten()
    row_id = np.repeat(np.arange(len(toks), dtype=np.int64),
                       np.diff(offsets))
    nonempty = pc.greater(pc.utf8_length(flat), 0)
    row_id = row_id[nonempty.to_numpy(zero_copy_only=False)]
    return row_id, flat.filter(nonempty), len(toks)


def token_counts(tbl: pa.Table, text_col: str = "text") -> pa.Table:
    """doc_id + n_tokens ONLY — one regex pass. `token_stats` also runs
    the stopword regex and a char-length kernel over the full text;
    callers that immediately discard those columns (quality_filter,
    pack_sequences, dedup_keep_best) should not pay two extra
    full-corpus scans. Same TOKEN_RE, so the SQL mirror
    (``length(regexp_extract_all(text, '[a-zA-Z0-9]+'))``) is
    unchanged."""
    return pa.table({
        "doc_id": tbl.column("doc_id"),
        "n_tokens": pc.cast(
            pc.count_substring_regex(tbl.column(text_col), TOKEN_RE),
            pa.int64()),
    })


def token_stats(tbl: pa.Table, text_col: str = "text") -> pa.Table:
    """doc_id, n_chars, n_tokens, n_stop — pure Arrow kernels."""
    text = tbl.column(text_col)
    return pa.table({
        "doc_id": tbl.column("doc_id"),
        "n_chars": pc.cast(pc.utf8_length(text), pa.int64()),
        "n_tokens": pc.cast(pc.count_substring_regex(text, TOKEN_RE),
                            pa.int64()),
        "n_stop": pc.cast(pc.count_substring_regex(text, STOPWORD_RE),
                          pa.int64()),
    })


def quality_score(tbl: pa.Table, text_col: str = "text") -> pa.Table:
    """Heuristic quality features: length, mean word length, stopword
    ratio, alpha ratio, and a composite keep/drop signal."""
    text = tbl.column(text_col)
    n_chars = pc.cast(pc.utf8_length(text), pa.float64())
    n_tokens = pc.cast(pc.count_substring_regex(text, TOKEN_RE), pa.float64())
    n_stop = pc.cast(pc.count_substring_regex(text, STOPWORD_RE), pa.float64())
    n_alpha = pc.cast(pc.count_substring_regex(text, r"[A-Za-z]"), pa.float64())
    denom_t = pc.max_element_wise(n_tokens, 1.0)
    denom_c = pc.max_element_wise(n_chars, 1.0)
    stop_ratio = pc.divide(n_stop, denom_t)
    alpha_ratio = pc.divide(n_alpha, denom_c)
    mean_word = pc.divide(pc.multiply(alpha_ratio, n_chars), denom_t)
    keep = pc.and_(pc.and_(pc.greater_equal(n_tokens, 5),
                           pc.greater_equal(alpha_ratio, 0.5)),
                   pc.less_equal(mean_word, 15.0))
    return pa.table({
        "doc_id": tbl.column("doc_id"),
        "n_tokens": pc.cast(n_tokens, pa.int64()),
        "stop_ratio": stop_ratio,
        "alpha_ratio": alpha_ratio,
        "keep": keep,
    })


class LangId:
    """Stopword-profile language-ID heuristic (actor-pool stage: profiles
    prepared once in ``__init__``, batches scored vectorized-ish)."""

    def __init__(self, profiles: dict[str, set[str]] | None = None):
        import re
        self.profiles = profiles or _STOP_PROFILES
        self.token_re = re.compile(r"[a-zA-Z]+")
        self.non_ascii_re = re.compile(r"[^\x00-\x7f]")

    def __call__(self, tbl: pa.Table) -> pa.Table:
        langs = []
        for text in tbl.column("text").to_pylist():
            if not text:
                langs.append("und")
                continue
            if len(self.non_ascii_re.findall(text)) > 0.3 * len(text):
                langs.append("zh")
                continue
            toks = set(t.lower() for t in self.token_re.findall(text))
            best, best_n = "und", 0
            for lang, stops in self.profiles.items():
                n = len(toks & stops)
                if n > best_n:
                    best, best_n = lang, n
            langs.append(best)
        return pa.table({"doc_id": tbl.column("doc_id"),
                         "lang_pred": pa.array(langs, pa.string())})


def bigram_counts_partial(tbl: pa.Table, text_col: str = "text") \
        -> pa.Table:
    """Per-batch bigram count partial: lowercase ``[a-z0-9]+`` tokens
    (the token_topk tokenizer), adjacent same-document pairs joined
    with a single space, counted with one arrow group_by — the shuffle
    downstream moves one row per (batch, distinct bigram), never one
    per occurrence. Fully vectorized: tokens flatten once, adjacency is
    two shifted views + a same-row mask, the join is one
    ``binary_join_element_wise`` kernel."""
    row_id, flat, _ = flat_tokens(tbl.column(text_col))
    empty = pa.table({"bigram": pa.array([], pa.string()),
                      "n": pa.array([], pa.int64())})
    if len(flat) < 2:
        return empty
    same_row = pa.array(row_id[:-1] == row_id[1:])
    a = flat.slice(0, len(flat) - 1).filter(same_row)
    b = flat.slice(1).filter(same_row)
    if len(a) == 0:
        return empty
    big = pc.binary_join_element_wise(a, b, " ")
    g = pa.table({"bigram": big}).group_by("bigram") \
        .aggregate([([], "count_all")])
    return pa.table({"bigram": g.column("bigram"),
                     "n": pc.cast(g.column("count_all"), pa.int64())})


def rolling_fingerprint(tbl: pa.Table, text_col: str = "text",
                        window: int = 16) -> pa.Table:
    """Polynomial rolling-hash document fingerprint (Rabin-Karp style):
    the min rolling hash over all windows — stable under small shifts."""
    out = []
    base = 257
    for text in tbl.column(text_col).to_pylist():
        if not text:
            out.append(0)
            continue
        b = text.encode("utf-8")
        if len(b) <= window:
            out.append(int(hashlib.md5(b).hexdigest()[:15], 16))
            continue
        arr = np.frombuffer(b, dtype=np.uint8).astype(np.uint64)
        h = np.uint64(0)
        powers = np.power(np.uint64(base),
                          np.arange(window, dtype=np.uint64),
                          dtype=np.uint64)
        # vectorized windowed dot products via convolution-free cumsum trick
        n = len(arr) - window + 1
        hashes = np.zeros(n, dtype=np.uint64)
        for j in range(window):  # window is small constant
            hashes += arr[j:j + n] * powers[window - 1 - j]
        out.append(int(hashes.min()) & 0x7FFFFFFFFFFFFFFF)
    return pa.table({"doc_id": tbl.column("doc_id"),
                     "fp": pa.array(out, pa.int64())})


def bpe_merges(words: list[str], counts, n_merges: int = 8):
    """Weighted byte-pair-encoding merge training over a WORD-TYPE
    table — the tokenizer-training core (Sennrich et al. 2016,
    "Neural Machine Translation of Rare Words with Subword Units",
    public algorithm). Each word type starts as its character
    sequence; each iteration merges the adjacent symbol pair with the
    highest corpus-weighted count. Runs driver-side over the type
    table because that IS the scale shape of real BPE trainers
    (fastBPE, HF tokenizers): the 100-TB corpus is touched once by
    the distributed type-count pass; iterations then cost
    O(types × word_len), independent of corpus size. No end-of-word
    marker (documented divergence; adding one is a caller-side
    ``w + "</w>"`` map). Deterministic tie-break: highest count, then
    lexicographically smallest (left, right).

    Returns ``[(left, right, merged, pair_count), ...]`` with at most
    ``n_merges`` entries (fewer when no pair remains)."""
    seqs = [list(w) for w in words]
    weights = [int(c) for c in counts]
    out = []
    for _ in range(int(n_merges)):
        pair_counts: dict = {}
        for seq, c in zip(seqs, weights):
            for a, b in zip(seq, seq[1:]):
                pair_counts[(a, b)] = pair_counts.get((a, b), 0) + c
        if not pair_counts:
            break
        (left, right), cnt = min(pair_counts.items(),
                                 key=lambda kv: (-kv[1], kv[0]))
        merged = left + right
        out.append((left, right, merged, cnt))
        for i, seq in enumerate(seqs):
            if len(seq) < 2:
                continue
            new = []
            j = 0
            while j < len(seq):
                if (j + 1 < len(seq) and seq[j] == left
                        and seq[j + 1] == right):
                    new.append(merged)
                    j += 2
                else:
                    new.append(seq[j])
                    j += 1
            seqs[i] = new
    return out


def bpe_apply_len(word: str, merges: list[tuple[str, str, str]],
                  memo: dict | None = None) -> int:
    """Symbol count of ``word`` after applying trained BPE merges IN
    TRAINING ORDER (each merge rewrites all its occurrences before the
    next is considered — the exact update rule :func:`bpe_merges`
    itself uses, so encode ≡ the trainer's final segmentation for any
    word type the trainer saw, and composes consistently for unseen
    types). ``memo`` caches per word TYPE: apply cost is paid once per
    distinct word, never per occurrence — the same types-not-tokens
    scale shape as training."""
    if memo is not None and word in memo:
        return memo[word]
    seq = list(word)
    for left, right, merged in merges:
        if len(seq) < 2:
            break
        new = []
        j = 0
        while j < len(seq):
            if (j + 1 < len(seq) and seq[j] == left
                    and seq[j + 1] == right):
                new.append(merged)
                j += 2
            else:
                new.append(seq[j])
                j += 1
        seq = new
    n = len(seq)
    if memo is not None:
        memo[word] = n
    return n


def template_partial(txt) -> pa.Table:
    """Per-batch partial for Drain-style template mining (shared
    verbatim by the batch ``log_templates`` query and the streaming
    :class:`raybeats.streaming.TemplateState`): DISTINCT
    (n_tokens, first_token, position, token) rows — bounded by
    template-vocabulary size, not line count — plus one count row per
    group (``p = -1``, line tally in ``lines``). Both partial kinds
    merge commutatively (set-union / sum), so any split folds to the
    same state."""
    import numpy as np

    if isinstance(txt, pa.ChunkedArray):
        txt = txt.combine_chunks()
    toks = pc.split_pattern(txt, " ")
    offs = np.asarray(toks.offsets)
    lens = np.diff(offs)
    flat = toks.flatten()
    first = flat.take(offs[:-1])
    n_rows = len(txt)
    row_idx = np.repeat(np.arange(n_rows), lens)
    pos = (np.arange(len(flat))
           - np.repeat(offs[:-1], lens)).astype(np.int64)
    ex = pa.table({
        "n": pa.array(lens[row_idx].astype(np.int64), pa.int64()),
        "t0": pc.cast(first.take(pa.array(row_idx)), pa.string()),
        "p": pa.array(pos + 1, pa.int64()),
        "tok": pc.cast(flat, pa.string())})
    dd = ex.group_by(["n", "t0", "p", "tok"]).aggregate([])
    cnt = pa.table({
        "n": pa.array(lens.astype(np.int64), pa.int64()),
        "t0": pc.cast(first, pa.string()),
        "one": pa.array(np.ones(n_rows, np.int64), pa.int64())
    }).group_by(["n", "t0"]).aggregate([("one", "sum")])
    return pa.concat_tables([
        pa.table({"n": dd.column("n"), "t0": dd.column("t0"),
                  "p": dd.column("p"), "tok": dd.column("tok"),
                  "lines": pa.array([0] * dd.num_rows, pa.int64())}),
        pa.table({"n": cnt.column("n"), "t0": cnt.column("t0"),
                  "p": pa.array([-1] * cnt.num_rows, pa.int64()),
                  "tok": pa.array([None] * cnt.num_rows, pa.string()),
                  "lines": pc.cast(cnt.column("one_sum"),
                                   pa.int64())})])


def template_finalize(merged: pa.Table) -> pa.Table:
    """Fold merged :func:`template_partial` rows into the final
    (n_tokens, first_token, template, n_lines) table."""
    import numpy as np

    toks = merged.filter(pc.greater_equal(merged.column("p"), 0))
    toks = toks.group_by(["n", "t0", "p", "tok"]).aggregate([])
    counts = merged.filter(pc.equal(merged.column("p"), -1)) \
        .group_by(["n", "t0"]).aggregate([("lines", "sum")])
    per_pos = toks.group_by(["n", "t0", "p"]).aggregate(
        [("tok", "count_distinct"), ("tok", "min")])
    n = per_pos.column("n").to_numpy(zero_copy_only=False)
    t0 = per_pos.column("t0").to_pylist()
    p = per_pos.column("p").to_numpy(zero_copy_only=False)
    nd = per_pos.column("tok_count_distinct") \
        .to_numpy(zero_copy_only=False)
    mn = per_pos.column("tok_min").to_pylist()
    groups: dict[tuple, list] = {}
    for i in range(len(n)):
        groups.setdefault((int(n[i]), t0[i]), []).append(
            (int(p[i]), mn[i] if nd[i] == 1 else "<*>"))
    out_n, out_t0, out_tpl = [], [], []
    for (gn, gt0), items in groups.items():
        items.sort()
        out_n.append(gn)
        out_t0.append(gt0)
        out_tpl.append(" ".join(tok for _, tok in items))
    tpl = pa.table({"n_tokens": pa.array(out_n, pa.int64()),
                    "first_token": pa.array(out_t0, pa.string()),
                    "template": pa.array(out_tpl, pa.string())})
    lines = pa.table({
        "n_tokens": counts.column("n"),
        "first_token": counts.column("t0"),
        "n_lines": pc.cast(counts.column("lines_sum"), pa.int64())})
    return tpl.join(lines, keys=["n_tokens", "first_token"],
                    join_type="inner")
