"""Corpus-curation operators for training-data pipelines: PII scrubbing,
Gopher-style repetition statistics, deterministic train/val/test hash
splits, and benchmark-contamination flagging.

All are narrow (shuffle-free) vectorized ``map_batches`` stages over the
``documents`` table; every kernel is chosen so an exact DuckDB oracle
exists (RE2 regex semantics on both sides, IEEE double ratios of integer
counts, HUGEINT-safe modular hashing).
"""

from __future__ import annotations

import unicodedata as _unicodedata

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

# RE2 patterns — pyarrow and DuckDB both compile RE2, so
# count_substring_regex / replace_substring_regex match
# len(regexp_extract_all(...)) / regexp_replace(..., 'g') exactly.
PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_SSN = r"\b\d{3}-\d{2}-\d{4}\b"
PII_IP = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"


def pii_scrub(tbl: pa.Table, text_col: str = "text") -> pa.Table:
    """Redact emails, SSN-shaped ids and IPv4 addresses.

    Patterns are applied in a fixed stage order (email → ssn → ip), each
    counted on the text AS THE PREVIOUS STAGE LEFT IT — an IP-shaped
    substring inside an email must not be double-counted, and staging
    makes the count/replace pair deterministic and SQL-mirrorable.
    """
    t0 = tbl.column(text_col)
    n_email = pc.count_substring_regex(t0, PII_EMAIL)
    t1 = pc.replace_substring_regex(t0, PII_EMAIL, "<EMAIL>")
    n_ssn = pc.count_substring_regex(t1, PII_SSN)
    t2 = pc.replace_substring_regex(t1, PII_SSN, "<SSN>")
    n_ip = pc.count_substring_regex(t2, PII_IP)
    t3 = pc.replace_substring_regex(t2, PII_IP, "<IP>")
    return pa.table({
        "doc_id": tbl.column("doc_id"),
        "clean_text": t3,
        "n_email": pc.cast(n_email, pa.int64()),
        "n_ssn": pc.cast(n_ssn, pa.int64()),
        "n_ip": pc.cast(n_ip, pa.int64()),
    })


def _flat_token_hashes(text: pa.ChunkedArray | pa.Array):
    """Lowercase → [a-z0-9]+ tokens → (row_id, fnv1a hash) flat arrays
    (`analysis.flat_tokens` + the vectorized FNV kernel — tokenizer
    single-sourced so the repetition/contamination/bigram kernels
    cannot drift apart)."""
    from ..util import fnv1a_u64
    from .analysis import flat_tokens
    row_id, flat, n_rows = flat_tokens(text)
    return row_id, fnv1a_u64(flat), n_rows


def repetition_stats(tbl: pa.Table, text_col: str = "text",
                     min_tokens: int = 5, min_distinct_ratio: float = 0.3,
                     max_top_ratio: float = 0.2) -> pa.Table:
    """Gopher-style within-document repetition features: token count,
    distinct-token ratio, top-token frequency ratio, and a keep flag.
    One lexsort over the flattened (row, token-hash) pairs computes all
    per-row distinct/run-length stats — no python loop over rows.
    """
    row_id, hashes, n_rows = _flat_token_hashes(tbl.column(text_col))
    n_tokens = np.bincount(row_id, minlength=n_rows).astype(np.int64)
    n_distinct = np.zeros(n_rows, dtype=np.int64)
    max_run = np.zeros(n_rows, dtype=np.int64)
    if len(row_id):
        order = np.lexsort((hashes, row_id))
        r, h = row_id[order], hashes[order]
        # boundaries where (row, hash) changes → run starts
        new_run = np.empty(len(r), dtype=bool)
        new_run[0] = True
        new_run[1:] = (r[1:] != r[:-1]) | (h[1:] != h[:-1])
        starts = np.flatnonzero(new_run)
        run_len = np.diff(np.append(starts, len(r)))
        run_row = r[starts]
        np.add.at(n_distinct, run_row, 1)
        np.maximum.at(max_run, run_row, run_len)
    denom = np.maximum(n_tokens, 1).astype(np.float64)
    distinct_ratio = n_distinct / denom
    top_ratio = max_run / denom
    keep = ((n_tokens >= min_tokens) & (distinct_ratio >= min_distinct_ratio)
            & (top_ratio <= max_top_ratio))
    return pa.table({
        "doc_id": tbl.column("doc_id"),
        "n_tokens": pa.array(n_tokens, pa.int64()),
        "distinct_ratio": pa.array(distinct_ratio, pa.float64()),
        "top_ratio": pa.array(top_ratio, pa.float64()),
        "keep": pa.array(keep, pa.bool_()),
    })


# multiplicative-hash split constants (Knuth); the product stays inside
# int64 for ids < ~2^32, and the SQL side widens through HUGEINT so both
# engines compute the identical 32-bit mix
_SPLIT_MULT = 2654435761
_SPLIT_MOD = 1 << 32


def hash_split(tbl: pa.Table, id_col: str = "doc_id",
               train_pct: int = 80, val_pct: int = 10) -> pa.Table:
    """Deterministic train/val/test assignment from a multiplicative
    hash of the id — stable across runs, machines and partitionings (the
    property a resumable 100-TB curation job needs; a content-keyed
    split would use the fingerprint column instead)."""
    ids = tbl.column(id_col).to_numpy(zero_copy_only=False) \
        .astype(np.uint64)
    h = (ids * np.uint64(_SPLIT_MULT)) % np.uint64(_SPLIT_MOD)
    h = h ^ (h >> np.uint64(15))
    bucket = (h % np.uint64(100)).astype(np.int64)
    split = np.where(bucket < train_pct, "train",
                     np.where(bucket < train_pct + val_pct, "val", "test"))
    return pa.table({
        "doc_id": tbl.column(id_col),
        "bucket": pa.array(bucket, pa.int64()),
        "split": pa.array(split, pa.string()),
    })


def _mix32(ids: np.ndarray) -> np.ndarray:
    """The shared 32-bit multiplicative mix (see hash_split)."""
    h = (ids.astype(np.uint64) * np.uint64(_SPLIT_MULT)) \
        % np.uint64(_SPLIT_MOD)
    return h ^ (h >> np.uint64(15))


def stratified_sample(tbl: pa.Table, *, group_col: str, id_col: str,
                      rates_pct: dict[str, int],
                      default_pct: int = 0) -> pa.Table:
    """Deterministic per-stratum RATE sampling: keep a row iff
    ``mix32(id) % 100 < rates_pct[group]`` — the "downsample web crawl
    to 5%, keep all books" mixture-rebalancing step. Quota sampling
    (:func:`quota_sample`) caps a COUNT per group; this keeps a FIXED
    FRACTION per group, so the sample grows with the stratum.

    Stability: the keep decision depends only on the row id, so reruns,
    retried partitions and different partitionings keep identical rows
    (the resumability property of hash_split). Groups absent from
    ``rates_pct`` get ``default_pct``. Rates are integer percent so the
    DuckDB mirror (HUGEINT mix + CASE) is integer-exact.

    Null ids are DROPPED (the SQL mirror's ``b < rate`` is NULL for a
    NULL id — and a NaN→uint64 cast would make the keep decision
    platform-dependent). Scale shape: narrow (shuffle-free) vectorized
    filter; the rate dict is tiny and ships in the task closure."""
    bad = {g: r for g, r in [*rates_pct.items(),
                             ("<default_pct>", default_pct)]
           if not (isinstance(r, (int, np.integer)) and 0 <= r <= 100)}
    if bad:
        raise ValueError(f"rates must be integer percent in [0, 100]: {bad}")

    keys = pa.array(list(rates_pct), pa.string())
    vals = np.fromiter(rates_pct.values(), np.int64, len(rates_pct))

    tbl = tbl.filter(pc.is_valid(tbl.column(id_col)))
    idx = pc.index_in(tbl.column(group_col), value_set=keys) \
        .to_numpy(zero_copy_only=False)
    known = ~np.isnan(idx) if idx.dtype.kind == "f" else \
        np.ones(len(idx), bool)
    rate = np.full(tbl.num_rows, default_pct, np.int64)
    if known.any():
        rate[known] = vals[idx[known].astype(np.int64)]
    ids = tbl.column(id_col).to_numpy(zero_copy_only=False)
    keep = (_mix32(ids.astype(np.uint64)) % np.uint64(100)) \
        .astype(np.int64) < rate
    return tbl.filter(pa.array(keep))


def chunk_text(tbl: pa.Table, *, size: int, stride: int,
               text_col: str = "text",
               id_col: str = "doc_id") -> pa.Table:
    """Split documents into fixed-size character windows with overlap
    (``stride < size``) — the context-window chunking step of a
    training/RAG pipeline. Window k covers codepoints
    ``[k*stride, k*stride + size)``; windows start while ``k*stride <
    len``, so every character lands in ≥1 chunk and the tail chunk may
    be short. Null/empty text yields no chunks (the SQL
    ``generate_series`` lateral's semantics).

    Vectorized as one ``utf8_slice_codeunits`` pass PER WINDOW INDEX
    over the rows that still have that window (window count is bounded
    by max-doc-length / stride, not the corpus) — a narrow flat-map
    explode, no python per-row work, no shuffle. Codepoint slicing
    matches SQL ``substr`` character semantics for any encoding."""
    if size <= 0 or stride <= 0 or stride > size:
        raise ValueError(f"need 0 < stride <= size: {size=} {stride=}")
    text = tbl.column(text_col)
    ln = pc.fill_null(pc.utf8_length(text), 0) \
        .to_numpy(zero_copy_only=False).astype(np.int64)
    nwin = np.where(ln > 0, (np.maximum(ln, 1) - 1) // stride + 1, 0)
    parts = []
    # survivors shrink monotonically (nwin > k ⇒ nwin > k-1): filter
    # the previous subset, not the full table, so one long outlier doc
    # among short ones costs O(survivors) per window, not O(N)
    sub, sub_nwin, k = tbl, nwin, 0
    while len(sub_nwin) and k < int(nwin.max(initial=0)):
        mask = sub_nwin > k
        sub, sub_nwin = sub.filter(pa.array(mask)), sub_nwin[mask]
        parts.append(pa.table({
            id_col: sub.column(id_col),
            "chunk_idx": pa.array(
                np.full(sub.num_rows, k, np.int64), pa.int64()),
            "chunk_text": pc.utf8_slice_codeunits(
                sub.column(text_col), k * stride, k * stride + size)}))
        k += 1
    if not parts:
        return pa.table({
            id_col: pa.array([], tbl.schema.field(id_col).type),
            "chunk_idx": pa.array([], pa.int64()),
            "chunk_text": pa.array([], pa.string())})
    return pa.concat_tables(parts)


def quota_sample(ds, group_col: str = "lang", id_col: str = "doc_id",
                 n_per_group: int = 20):
    """Deterministic per-group quota sample: keep the ``n_per_group``
    rows with the lowest (hash-priority, id) per group — the
    "cap documents per source/language" curation step.

    Scale shape: each batch prunes LOCALLY to ≤ n_per_group rows per
    group first, so the groupby that finalizes sees only
    ``blocks × groups × n`` pre-pruned fixed-width rows — the shuffle
    volume is set by the quota, never the corpus. Priority is the same
    multiplicative mix as :func:`hash_split` (stable across runs and
    partitionings; ties broken by id).
    """
    def partial(t: pa.Table) -> pa.Table:
        ids = t.column(id_col).to_numpy(zero_copy_only=False)
        prio = _mix32(ids).astype(np.int64)
        sub = pa.table({group_col: t.column(group_col),
                        id_col: t.column(id_col),
                        "prio": pa.array(prio, pa.int64())})
        sub = sub.sort_by([(group_col, "ascending"),
                           ("prio", "ascending"), (id_col, "ascending")])
        g = sub.column(group_col).to_numpy(zero_copy_only=False)
        new_grp = np.empty(len(sub), dtype=bool)
        if len(sub):
            new_grp[0] = True
            new_grp[1:] = g[1:] != g[:-1]
        rank = np.arange(len(sub)) - \
            np.maximum.accumulate(np.where(new_grp, np.arange(len(sub)),
                                           -1))
        return sub.filter(pa.array(rank < n_per_group))

    def finalize(grp: pa.Table) -> pa.Table:
        return partial(grp)

    return ds.map_batches(partial, batch_format="pyarrow") \
        .groupby(group_col).map_groups(finalize, batch_format="pyarrow")


def _nfc(v: str) -> str:
    """Module-local NFC hook (tests patch THIS, not the global
    unicodedata.normalize — pytest itself calls the global during a
    run, so patching it aborts the session as an INTERNALERROR)."""
    return _unicodedata.normalize("NFC", v)


def normalize_text(tbl: pa.Table, text_col: str = "text") -> pa.Table:
    """Canonical text normalization for dedup/training prep: Unicode
    NFC (combining sequences compose — 'e' + U+0301 → 'é'), full
    lowercase, every whitespace run collapsed to one space, then
    space-trimmed. DuckDB mirrors it verbatim
    (``trim(regexp_replace(lower(nfc_normalize(x)), '\\s+', ' ',
    'g'))``). Collapse BEFORE trim so tab/newline edges normalize
    identically on both sides (SQL ``trim`` strips only spaces).

    NFC path: this pyarrow build's ``utf8_normalize`` DECOMPOSES
    regardless of the requested form (measured: form='NFC' of both
    'Caf\\xe9' and 'Cafe'+U+0301 returns the decomposed bytes), so
    composition falls back to ``unicodedata.normalize`` — applied ONLY
    to the rows that contain non-ASCII bytes (vectorized regex mask +
    ``replace_with_mask`` scatter; ASCII is NFC by construction), so a
    mostly-ASCII corpus never pays the python path.

    Output: every input column passes through unchanged, plus
    ``norm_text`` (callers keep their ids/metadata and compose)."""
    text = tbl.column(text_col)
    text = text.combine_chunks() if isinstance(
        text, pa.ChunkedArray) else text
    non_ascii = pc.match_substring_regex(text, r"[^\x00-\x7f]")
    non_ascii = pc.fill_null(non_ascii, False)
    if pc.any(non_ascii).as_py():
        fixed = pa.array(
            [_nfc(v) if v is not None else None
             for v in text.filter(non_ascii).to_pylist()], pa.string())
        text = pc.replace_with_mask(text, non_ascii, fixed)
    norm = pc.utf8_trim(
        pc.replace_substring_regex(pc.utf8_lower(text), r"\s+", " "),
        " ")
    return tbl.append_column("norm_text", norm)


def _shingle_hash(h: np.ndarray, w: int) -> np.ndarray:
    """Rolling width-``w`` combine of consecutive token hashes: one
    uint64 value per start position (``len(h) - w + 1`` outputs),
    ``s = fold((s * FNV_PRIME) ^ h_j)`` — vectorized as ``w`` shifted
    passes, no per-position loop."""
    n = max(0, len(h) - w + 1)
    s = np.full(n, 0xCBF29CE484222325, np.uint64)
    prime = np.uint64(1099511628211)
    for j in range(w):
        s = (s * prime) ^ h[j:j + n]
    return s


class ContaminationFlagger:
    """Actor-pool stage: flag documents containing any benchmark snippet
    (exact, case-sensitive substring — ``contains()`` semantics).

    ONE shingle-hash probe pass per batch, not K substring scans: at
    ``__init__`` each snippet's INTERIOR tokens (its first and last
    token may be words cut mid-character by the snippet boundary, so
    they are excluded — any true substring occurrence embeds the
    interior tokens as complete, contiguous doc tokens) yield a probe
    shingle of width ≤ ``probe_w`` whose rolling hash lands in a
    per-width lookup table. Per batch the doc text tokenizes ONCE
    (`_flat_token_hashes`, the repetition_stats kernel — the SAME
    kernel tokenizes the snippets, so probe hashes cannot diverge),
    each width's rolling shingle hashes probe the table with one
    vectorized ``np.isin``, and only the candidate (row, snippet)
    pairs get the exact ``match_substring`` confirm — work is
    tokenize + O(widths ≤ 3) probes + output-proportional confirm,
    never suite × corpus. Snippets with no interior token (≤ 2
    tokens — pathological for a benchmark suite) fall back to the
    per-snippet exact scan, bounded by their count.

    The probe is a lowercase token hash, so it over-admits (case /
    punctuation variants become candidates); the confirm stage is
    exact, so the result is identical to the K-scan kernel (tested at
    10k+ snippets). No false negatives: a snippet substring occurrence
    always contributes its interior-token shingle to the doc's token
    stream.
    """

    def __init__(self, snippets: list[str] | object, probe_w: int = 3):
        import ray
        if isinstance(snippets, ray.ObjectRef):
            snippets = ray.get(snippets)
        self.snippets = list(snippets)
        self.n_probe_passes = 0  # per-batch probe-pass counter (tests)
        row_id, hashes, _ = _flat_token_hashes(
            pa.array(self.snippets, pa.string()))
        counts = np.bincount(row_id, minlength=len(self.snippets))
        offs = np.concatenate([[0], np.cumsum(counts)])
        interior = counts - 2
        self.fallback = np.flatnonzero(interior <= 0).tolist()
        # per width: each snippet's probe shingle = the rolling hash at
        # its first-interior-token position, read from ONE full-stream
        # shingle pass per width (no per-snippet slicing)
        self.by_width: dict[int, tuple] = {}
        for w in range(1, probe_w + 1):
            sel = np.flatnonzero(interior >= probe_w) if w == probe_w \
                else np.flatnonzero(interior == w)
            if len(sel) == 0:
                continue
            sh = _shingle_hash(hashes, w)
            probes = sh[offs[sel] + 1]
            order = np.argsort(probes, kind="stable")
            # (dedup'd probe set for isin, sorted probes + aligned
            # snippet ids for the searchsorted hash→snippets expand)
            self.by_width[w] = (np.unique(probes), probes[order],
                                sel[order].astype(np.int64))

    def __call__(self, tbl: pa.Table) -> pa.Table:
        text = tbl.column("text")
        text = text.combine_chunks() if isinstance(
            text, pa.ChunkedArray) else text
        hits = np.zeros(len(tbl), dtype=np.int64)
        for i in self.fallback:
            hits += pc.match_substring(text, self.snippets[i]).to_numpy(
                zero_copy_only=False).astype(np.int64)
        if not self.by_width:
            return self._emit(tbl, hits)
        row_id, h, _ = _flat_token_hashes(text)
        pair_rows, pair_snips = [], []
        for w, (uniq, ph_sorted, sid_sorted) in self.by_width.items():
            if len(h) < w:
                continue
            self.n_probe_passes += 1
            n = len(h) - w + 1
            sh = _shingle_hash(h, w)
            # a shingle must not span two rows
            m = (row_id[:n] == row_id[w - 1:]) & np.isin(sh, uniq)
            if not m.any():
                continue
            pos = np.flatnonzero(m)
            pr, ph = row_id[pos], sh[pos]
            # dedupe (row, hash): several occurrences in one doc are
            # one candidate
            order = np.lexsort((ph, pr))
            pr, ph = pr[order], ph[order]
            first = np.empty(len(pr), bool)
            first[0] = True
            first[1:] = (pr[1:] != pr[:-1]) | (ph[1:] != ph[:-1])
            pr, ph = pr[first], ph[first]
            # expand hash → snippet ids (a probe hash may be shared by
            # several snippets): searchsorted window + aranges explode
            lo = np.searchsorted(ph_sorted, ph, side="left")
            hi = np.searchsorted(ph_sorted, ph, side="right")
            lens = hi - lo
            tot = int(lens.sum())
            ridx = np.repeat(np.arange(len(ph)), lens)
            o2 = np.cumsum(lens) - lens
            pair_rows.append(pr[ridx])
            pair_snips.append(sid_sorted[lo[ridx] +
                                         (np.arange(tot) - o2[ridx])])
        if pair_rows:
            rows_all = np.concatenate(pair_rows)
            snips_all = np.concatenate(pair_snips)
            # exact confirm, one C-level str-find per candidate pair —
            # output-proportional (the pair count), never suite ×
            # corpus. A per-snippet vectorized match_substring would
            # pay one take+kernel dispatch per snippet-with-candidates
            # (~ms each), which loses badly when a low-selectivity
            # probe yields many snippets with few rows each. (row,
            # snippet) pairs are unique here — one probe hash per
            # snippet, (row, hash) deduped above — so each hit adds
            # exactly 1.
            # convert only the CANDIDATE rows' text to python strings —
            # a whole-batch to_pylist would copy every multi-KB doc to
            # serve a handful of checks
            cand_rows = np.unique(rows_all)
            texts = dict(zip(cand_rows.tolist(),
                             text.take(pa.array(cand_rows, pa.int64()))
                             .to_pylist()))
            snips = self.snippets
            ok = np.fromiter(
                (snips[s] in texts[r]
                 for s, r in zip(snips_all.tolist(), rows_all.tolist())),
                bool, len(rows_all))
            np.add.at(hits, rows_all[ok], 1)
        return self._emit(tbl, hits)

    @staticmethod
    def _emit(tbl: pa.Table, hits: np.ndarray) -> pa.Table:
        return pa.table({
            "doc_id": tbl.column("doc_id"),
            "n_hits": pa.array(hits, pa.int64()),
            "contaminated": pa.array(hits > 0, pa.bool_()),
        })


def pack_sequences(ds, *, budget: int, id_max: int,
                   id_col: str = "doc_id", tok_col: str = "n_tok",
                   n_buckets: int | None = None):
    """Deterministic sequence packing: assign each document the
    training-pack id its FIRST token lands in under a running
    ``budget``-token boundary over ``id_col`` order —
    ``pack_id = (cumsum(n_tok) - n_tok) // budget``. The contiguous
    streaming-pack contract (docs may straddle pack boundaries; the
    straddler belongs to the pack it starts in) rather than greedy bin
    packing, BECAUSE it is order-deterministic, partition-invariant
    and exactly mirrorable as a SQL running-sum window — a greedy
    packer's output depends on visit order and cannot be oracled.

    A global ordered cumsum is the textbook sequential op; here it is
    a two-pass distributed prefix sum: pass 1 (narrow) emits per-batch
    token totals per monotone id-range bucket (``id // step`` with
    ``step = ceil((id_max+1) / n_buckets)`` — `util.range_bucket`;
    monotone in id, so bucket order IS id order, and division cannot
    wrap int64 the way ``id * n // span`` does for snowflake ids) and
    the driver exclusive-prefixes the ``n_buckets`` totals; pass 2 is
    ONE keyed shuffle whose groups sort locally by id and add their
    bucket's offset. Nothing global ever sorts; the driver sees
    ``n_buckets × blocks`` fixed-width partial rows. ``id_max`` comes
    from footer stats (a ``.count()``/max scan on a transformed
    lineage would execute it just for sizing).

    Input must already carry ``tok_col`` (see `analysis.token_stats`
    for the oracle-mirrorable token count). Ids must be non-negative
    and ≤ ``id_max``; token counts non-negative.

    ``n_buckets`` defaults to ``adaptive_buckets(id_max + 1)`` — the
    bucket count scales with the id span so each finalize group
    materializes a bounded ~``target_rows`` slice of the 24-byte
    projection regardless of corpus size (a fixed count would make
    each group corpus/k rows). The id span is the right sizing proxy
    here because the buckets are monotone id RANGES: density below
    1 only makes groups smaller. The result is invariant to
    ``n_buckets`` (the prefix offsets are exact at any split)."""
    from ..util import adaptive_buckets
    span = id_max + 1
    if n_buckets is None:
        n_buckets = adaptive_buckets(span)

    def add_bucket(t: pa.Table) -> pa.Table:
        from ..util import range_bucket
        ids = t.column(id_col)
        return pa.table({id_col: ids, tok_col: t.column(tok_col),
                         "bucket": range_bucket(ids, n_buckets, span)})

    # materialize the 3-int64-column projection: BOTH passes consume it
    # (totals scan + the final groupby) and Ray recomputes lineage per
    # consumer — without this the upstream (typically the full-text
    # read + token regex, the query's dominant cost) would execute
    # twice. 24 bytes/doc in the object store, spillable.
    bucketed = ds.map_batches(add_bucket,
                              batch_format="pyarrow").materialize()

    def bucket_totals(t: pa.Table) -> pa.Table:
        g = t.group_by("bucket").aggregate([(tok_col, "sum")])
        return pa.table({"bucket": g.column("bucket"),
                         "tot": g.column(f"{tok_col}_sum")})

    totals = np.zeros(n_buckets, np.int64)
    for b in bucketed.map_batches(bucket_totals, batch_format="pyarrow") \
            .iter_batches(batch_size=None, batch_format="pyarrow"):
        np.add.at(totals, b.column("bucket").to_numpy(zero_copy_only=False),
                  b.column("tot").to_numpy(zero_copy_only=False))
    offsets = np.zeros(n_buckets, np.int64)
    np.cumsum(totals[:-1], out=offsets[1:])

    def finalize(g: pa.Table) -> pa.Table:
        ids = g.column(id_col).to_numpy(zero_copy_only=False)
        tok = g.column(tok_col).to_numpy(zero_copy_only=False)
        order = np.argsort(ids, kind="stable")
        cum = np.cumsum(tok[order])
        bkt = int(g.column("bucket")[0].as_py())
        start = offsets[bkt] + cum - tok[order]
        out = np.empty(len(ids), np.int64)
        out[order] = start // budget
        return pa.table({id_col: g.column(id_col),
                         tok_col: g.column(tok_col),
                         "pack_id": pa.array(out, pa.int64())})

    return bucketed.groupby("bucket").map_groups(
        finalize, batch_format="pyarrow")


def oversample_rows(t: pa.Table, millis: np.ndarray,
                    id_col: str = "doc_id") -> pa.Table:
    """Deterministic mixture-oversampling kernel: emit each row
    ``floor(millis/1000)`` times plus one more iff the row's shared
    32-bit mix (`_mix32`, the hash_split/quota hash) falls under the
    fractional-part threshold — integer-exact on both engines
    (``(millis % 1000) * 2^32 // 1000``, no float rounding). Output
    repeats the row with ``epoch`` = 1..count; count-0 rows drop.
    Narrow (per-batch explode, no shuffle): the dataset-mixing
    primitive (epochs per source) of a training-data pipeline."""
    millis = millis.astype(np.int64)
    ids = t.column(id_col).to_numpy(zero_copy_only=False)
    prio = _mix32(ids).astype(np.int64)
    thresh = (millis % 1000) * (1 << 32) // 1000
    cnt = millis // 1000 + (prio < thresh)
    ridx = np.repeat(np.arange(len(cnt)), cnt)
    offs = np.cumsum(cnt) - cnt
    epoch = np.arange(int(cnt.sum())) - offs[ridx] + 1
    cols = {}
    for c in t.column_names:
        col = t.column(c)
        col = col.combine_chunks() if isinstance(
            col, pa.ChunkedArray) else col
        cols[c] = pc.take(col, pa.array(ridx, pa.int64()))
    cols["epoch"] = pa.array(epoch, pa.int64())
    return pa.table(cols)


def oversample_mixture(ds, weights_millis: dict[str, int], *,
                       source_col: str = "source",
                       id_col: str = "doc_id",
                       default_millis: int = 1000):
    """Per-source mixture oversampling: each row of source ``s`` is
    emitted ``weights_millis[s] / 1000`` epochs in expectation —
    exactly ``floor`` plus a deterministic id-hash Bernoulli on the
    remainder, so reruns and retried partitions emit identical rows
    (no RNG state). Weights are integer permille (2250 = 2.25 epochs);
    unknown sources get ``default_millis``. The weight dict is tiny
    and ships in the task closure."""
    if any(m < 0 for m in weights_millis.values()) or default_millis < 0:
        raise ValueError("weights must be non-negative permille ints")

    keys = pa.array(list(weights_millis), pa.string())
    vals = np.fromiter(weights_millis.values(), np.int64,
                       len(weights_millis))

    def fn(t: pa.Table) -> pa.Table:
        # vectorized dict lookup: index_in + take, default for misses
        idx = pc.index_in(t.column(source_col), value_set=keys) \
            .to_numpy(zero_copy_only=False)
        known = ~np.isnan(idx) if idx.dtype.kind == "f" else \
            np.ones(len(idx), bool)
        millis = np.full(t.num_rows, default_millis, np.int64)
        if known.any():
            millis[known] = vals[idx[known].astype(np.int64)]
        return oversample_rows(t, millis, id_col=id_col)

    return ds.map_batches(fn, batch_format="pyarrow")


# --------------------------------------------- T5-style span corruption

_SC_MULT = np.uint64(1_000_003)
_SC_KNUTH = np.uint64(2_654_435_761)
_SC_M32 = np.uint64(0xFFFFFFFF)


def _span_mask(doc_ids: np.ndarray, pos: np.ndarray,
               rate_pct: int) -> np.ndarray:
    """Deterministic per-token mask decision: mix (doc_id, pos) through
    the same 32-bit multiplicative scheme as :func:`hash_split`
    (``m = (doc_id·1000003 + pos) mod 2^32``, Knuth multiply, xor-shift
    15) and mask when ``mix % 100 < rate_pct``. Pure integer
    arithmetic — the DuckDB mirror computes the identical bits via
    HUGEINT modular ops, so mask decisions can never diverge between
    engines (no RNG, partition-invariant, resumable)."""
    m = (doc_ids.astype(np.uint64) * _SC_MULT + pos.astype(np.uint64)) \
        & _SC_M32
    m = (m * _SC_KNUTH) & _SC_M32
    m = m ^ (m >> np.uint64(15))
    return (m % np.uint64(100)) < np.uint64(rate_pct)


def span_corruption(tbl: pa.Table, *, rate_pct: int = 15,
                    id_col: str = "doc_id",
                    text_col: str = "text") -> pa.Table:
    """T5/UL2-style denoising-pair construction (Raffel et al. 2020,
    arXiv:1910.10683 §3.1.4): per document, deterministically mask
    ``rate_pct`` % of tokens, collapse each maximal masked RUN into one
    ``<extra_id_N>`` sentinel in the input, and emit the masked spans
    prefixed by their sentinel as the target. Output:
    ``(doc_id, input_text, target_text)`` — one row per non-null doc.

    Shuffle-free: every document lies wholly inside its batch (one row
    = one doc), so this is a single vectorized ``map_batches`` pass —
    tokens come from the shared ``[a-z0-9]+`` tokenizer
    (:func:`..analysis.flat_tokens`), runs and sentinel ordinals from
    segmented numpy cumsums, and both output strings from ONE
    ``ListArray`` + ``binary_join`` per column (no per-row Python).
    Docs with no tokens (or nothing masked) get ``''`` in the empty
    column — the COALESCE('') contract mirrored in SQL. The reference
    engine has no training-format stage; this extends its
    per-record-transform family (SURVEY §2.2) with the denoising
    objective an LLM pipeline ships."""
    from .analysis import flat_tokens

    if not (0 < rate_pct < 100):
        raise ValueError(f"rate_pct must be in (0,100): {rate_pct}")
    sub = tbl.filter(pc.is_valid(tbl.column(text_col)))
    n_rows = sub.num_rows
    doc_col = pc.cast(sub.column(id_col), pa.int64())
    row_id, toks, _ = flat_tokens(sub.column(text_col))
    doc_ids = doc_col.to_numpy(zero_copy_only=False)

    # per-token position within its doc (row_id is sorted, contiguous)
    n = len(row_id)
    if n:
        row_start = np.r_[True, row_id[1:] != row_id[:-1]]
        start_idx = np.flatnonzero(row_start)
        pos = np.arange(n, dtype=np.int64) - \
            np.repeat(start_idx, np.diff(np.r_[start_idx, n]))
        masked = _span_mask(doc_ids[row_id], pos, rate_pct)
        # a run starts at a masked token whose predecessor (within the
        # same doc) is unmasked — or at the doc's first token
        run_start = masked & (row_start | np.r_[True, ~masked[:-1]])
        # sentinel ordinal = run starts seen so far WITHIN the doc − 1
        # (segmented cumsum: global cumsum minus the doc-entry base)
        g = np.cumsum(run_start.astype(np.int64))
        seg_len = np.diff(np.r_[start_idx, n])
        base = np.repeat(g[start_idx] - run_start[start_idx], seg_len)
        sid = g - base - 1  # >= 0 for every masked token
    else:
        masked = np.zeros(0, bool)
        run_start = np.zeros(0, bool)
        sid = np.zeros(0, np.int64)
        pos = np.zeros(0, np.int64)

    tok_arr = toks.combine_chunks() if isinstance(toks, pa.ChunkedArray) \
        else toks
    sent = pc.binary_join_element_wise(
        pa.scalar("<extra_id_"),
        pc.cast(pa.array(np.maximum(sid, 0), pa.int64()), pa.string()),
        pa.scalar(">"), pa.scalar(""))

    def join_rows(keep: np.ndarray, pieces: pa.Array) -> pa.Array:
        """Join kept pieces per row with ' ' → one string per input
        row (empty when a row keeps nothing)."""
        kept_rows = row_id[keep]
        kept = pieces.filter(pa.array(keep))
        counts = np.bincount(kept_rows, minlength=n_rows) \
            if n else np.zeros(n_rows, np.int64)
        offsets = np.r_[0, np.cumsum(counts)].astype(np.int32)
        lst = pa.ListArray.from_arrays(pa.array(offsets, pa.int32()),
                                       kept)
        return pc.binary_join(lst, pa.scalar(" "))

    # input: unmasked tokens as-is; each run start becomes its sentinel
    in_pieces = pc.if_else(pa.array(masked), sent, tok_arr)
    input_text = join_rows(~masked | run_start, in_pieces)
    # target: masked tokens; run starts prefixed by "<sentinel> "
    tgt_pieces = pc.if_else(
        pa.array(run_start),
        pc.binary_join_element_wise(sent, tok_arr, pa.scalar(" ")),
        tok_arr)
    target_text = join_rows(masked, tgt_pieces)
    return pa.table({id_col: doc_col,
                     "input_text": input_text,
                     "target_text": target_text})
