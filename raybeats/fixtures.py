"""Deterministic synthetic transcript fixtures (FIXTURES.md).

Everything is seeded — no wall clock, no external data. Conversations are
contiguous within a file (preserving the per-conversation locality the
reference gets from per-file harvester FIFO). Text rows mix four classes:
dissect-parseable log lines (~70%), JSON turns (~15%), malformed lines
(~10%), and edge cases (~5%).
"""

from __future__ import annotations

import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

BASE_EPOCH_US = 1_704_067_200_000_000  # 2024-01-01T00:00:00Z

LEVELS = ["info", "warn", "error", "debug"]
CALLERS = ["main.go:222", "router.py:88", "agent.rs:12", "exec.go:915",
           "tool.py:41"]
VERBS = ["starting", "completed", "retrying", "spawning", "closing",
         "flushing", "denied"]
ROLES = ["user", "assistant", "system", "tool"]
ROLE_W = [0.4, 0.4, 0.05, 0.15]
TOOLS = ["", "search", "code", "browser", "db"]
TOOL_W = [0.5, 0.15, 0.15, 0.1, 0.1]


def role_tool_meta() -> list[dict]:
    """Small enrichment dictionary (broadcast-join side table). Some
    (role, tool) combos present in transcripts are deliberately missing so
    lookup-miss tagging is exercised."""
    rows = []
    teams = ["core", "infra", "apps"]
    costs = ["free", "metered", "premium"]
    i = 0
    for role in ROLES:
        for tool in TOOLS:
            if (role == "user" and tool == "db") or (role == "system" and tool):
                continue  # deliberate misses
            rows.append({
                "role": role, "tool": tool,
                "team": teams[i % 3],
                "cost_class": costs[(i * 7) % 3],
                "priority": i % 10,
            })
            i += 1
    return rows


def _gen_conv_lengths(rng: np.random.Generator, n_convs: int) -> np.ndarray:
    # mildly skewed conversation lengths, occasionally huge (skew exercise)
    lens = rng.integers(2, 30, size=n_convs)
    hot = rng.random(n_convs) < 0.01
    lens = np.where(hot, lens * 20, lens)
    return lens.astype(np.int64)


def make_transcripts_table(n_convs: int, seed: int = 42,
                           conv_offset: int = 0) -> pa.Table:
    """One deterministic chunk of transcript rows (n_convs conversations,
    ids starting at conv_offset)."""
    rng = np.random.default_rng([seed, conv_offset])
    lens = _gen_conv_lengths(rng, n_convs)
    n = int(lens.sum())
    conv_ids_num = np.repeat(np.arange(conv_offset, conv_offset + n_convs), lens)
    turn_idx = np.concatenate([np.arange(l) for l in lens]).astype(np.int32)

    roles = rng.choice(len(ROLES), size=n, p=ROLE_W)
    tools = rng.choice(len(TOOLS), size=n, p=TOOL_W)
    unknown_tool = rng.random(n) < 0.02

    # timestamps: per-conversation base + monotone per-turn offsets
    conv_base = (conv_ids_num.astype(np.int64) * 97_000_003) % (86400 * 365)
    ts = BASE_EPOCH_US + conv_base * 1_000_000 + turn_idx.astype(np.int64) * 1_250_000

    cls = rng.choice(4, size=n, p=[0.70, 0.15, 0.10, 0.05])
    lvl = rng.choice(len(LEVELS), size=n, p=[0.45, 0.2, 0.15, 0.2])
    caller = rng.integers(0, len(CALLERS), size=n)
    verb = rng.integers(0, len(VERBS), size=n)
    kval = rng.integers(0, 100, size=n)
    edge_kind = rng.integers(0, 4, size=n)

    import pyarrow.compute as pc

    def take(vals: list[str], idx) -> pa.Array:
        return pc.take(pa.array(vals, pa.string()),
                       pa.array(idx, pa.int32()))

    def s(arr) -> pa.Array:
        return pc.cast(pa.array(arr), pa.string())

    def pad2(arr) -> pa.Array:
        return pc.utf8_lpad(s(arr), 2, "0")

    j = pc.binary_join_element_wise
    lvl_s = take(LEVELS, lvl)
    caller_s = take(CALLERS, caller)
    verb_s = take(VERBS, verb)
    conv_s = s(conv_ids_num)
    turn_s = s(turn_idx)
    # majority class for every row; minority classes overwrite their subset
    # only (replace_with_mask), so no full-size arrays of rare payloads
    texts = j("level=", lvl_s, " ts=2024-01-01T00:", pad2(turn_idx % 60),
              ":", pad2(kval % 60), 'Z caller=', caller_s, ' msg="',
              verb_s, " conv=", conv_s, " turn=", turn_s, '"', "")

    def sub(arr, idx):
        return pc.take(arr, pa.array(idx, pa.int64()))

    # JSON turns (same shapes json.dumps(..., separators=(",", ":")) makes)
    i1 = np.nonzero(cls == 1)[0]
    if len(i1):
        k1, c1, t1, v1 = kval[i1], sub(conv_s, i1), sub(turn_s, i1), \
            sub(verb_s, i1)
        doc_part = pc.if_else(pa.array(k1 % 3 == 0),
                              j(',"doc_id":"d', c1, "-", t1, '"', ""),
                              pa.array([""] * len(i1), pa.string()))
        nested_part = pc.if_else(pa.array(k1 % 7 == 0),
                                 j(',"nested":{"a":', s(k1), ',"b":[1,2]}',
                                   ""),
                                 pa.array([""] * len(i1), pa.string()))
        json_line = j('{"event":"', v1, '","k":', s(k1), doc_part,
                      nested_part, "}", "")
        texts = pc.replace_with_mask(texts, pa.array(cls == 1), json_line)
    i2 = np.nonzero(cls == 2)[0]
    if len(i2):
        k2, l2 = kval[i2], sub(lvl_s, i2)
        malformed = pc.case_when(
            pc.make_struct(pa.array(k2 % 3 == 0), pa.array(k2 % 3 == 1)),
            j("lvl=", l2, " wrong leading delimiter", ""),
            j("level=", l2, " truncated", ""),
            pa.array(['{"broken": json,,'] * len(i2), pa.string()))
        texts = pc.replace_with_mask(texts, pa.array(cls == 2), malformed)
    i3 = np.nonzero(cls == 3)[0]
    if len(i3):
        big = "level=info ts=t caller=c msg=\"" + "längère-✓" * 400 + "\""
        e3, c3 = edge_kind[i3], sub(conv_s, i3)
        edge = pc.case_when(
            pc.make_struct(pa.array(e3 == 0), pa.array(e3 == 1),
                           pa.array(e3 == 2)),
            pa.array([""] * len(i3), pa.string()),
            pa.array(["level= ts= caller= msg=\"\""] * len(i3), pa.string()),
            pa.array([big] * len(i3), pa.string()),
            j('level=info ts=t caller=c msg="drop-me conv=', c3, '"', ""))
        texts = pc.replace_with_mask(texts, pa.array(cls == 3), edge)

    tool_s = pc.if_else(pa.array(unknown_tool),
                        j("tool-x", s(tools), ""),
                        take(TOOLS, tools))
    return pa.table({
        "conv_id": j("conv-", pc.utf8_lpad(conv_s, 8, "0"), ""),
        "turn_idx": pa.array(turn_idx, pa.int32()),
        "role": take(ROLES, roles),
        "text": texts,
        "tool": tool_s,
        "ts": pa.array(ts, pa.timestamp("us")),
    })


_VOCAB_BASE = ("the data stream batch merge sort join filter map shuffle "
               "spark ray arrow block actor task vector column row group "
               "window session key hash index store spill limit probe scan "
               "agg").split()
# widened vocabulary (~341 tokens): small vocabularies give random doc
# pairs high baseline Jaccard, which no LSH tuning can fix
_VOCAB = _VOCAB_BASE + [f"{w}{i}" for w in _VOCAB_BASE for i in range(10)]


def make_documents_table(n_docs: int, seed: int = 42,
                         exact_dup_rate: float = 0.08,
                         near_dup_rate: float = 0.08,
                         doc_offset: int = 0) -> pa.Table:
    """Deterministic word-salad documents with PLANTED exact and near
    duplicates (near = an earlier doc with a few words swapped), so dedup
    recall is measurable. ``dup_kind``: 0 unique, 1 exact dup, 2 near dup;
    ``dup_of``: source doc id (or -1)."""
    rng = np.random.default_rng([seed, doc_offset, 7])
    lens = rng.integers(30, 120, size=n_docs)
    kinds = rng.choice(3, size=n_docs,
                       p=[1 - exact_dup_rate - near_dup_rate,
                          exact_dup_rate, near_dup_rate])
    kinds[: max(1, n_docs // 20)] = 0  # a pool of originals first
    texts: list[str] = []
    dup_of = np.full(n_docs, -1, dtype=np.int64)
    for i in range(n_docs):
        if kinds[i] != 0 and i > 0:
            src = int(rng.integers(0, i))
            dup_of[i] = src + doc_offset
            if kinds[i] == 1:
                texts.append(texts[src])
                continue
            words = texts[src].split()
            n_swap = max(1, len(words) // 25)  # ~4% token churn
            for _ in range(n_swap):
                words[int(rng.integers(0, len(words)))] = \
                    _VOCAB[int(rng.integers(0, len(_VOCAB)))]
            texts.append(" ".join(words))
            continue
        kinds[i] = 0
        words = [_VOCAB[int(w)] for w in
                 rng.integers(0, len(_VOCAB), size=int(lens[i]))]
        texts.append(" ".join(words))
    return pa.table({
        "doc_id": pa.array(np.arange(doc_offset, doc_offset + n_docs),
                           pa.int64()),
        "text": pa.array(texts, pa.string()),
        "dup_kind": pa.array(kinds.astype(np.int32), pa.int32()),
        "dup_of": pa.array(dup_of, pa.int64()),
    })


def write_documents(out_dir: str, n_docs: int = 100_000, seed: int = 42,
                    num_files: int = 16) -> dict:
    os.makedirs(out_dir, exist_ok=True)
    per = max(1, n_docs // num_files)
    files, off, idx = [], 0, 0
    while off < n_docs:
        take = min(per, n_docs - off)
        tbl = make_documents_table(take, seed=seed, doc_offset=off)
        path = os.path.join(out_dir, f"docs-{idx:05d}.parquet")
        pq.write_table(tbl, path)
        files.append(path)
        off += take
        idx += 1
    return {"dir": out_dir, "files": files, "rows": n_docs, "seed": seed}


def write_transcripts(out_dir: str, n_convs: int = 1000, seed: int = 42,
                      num_files: int = 8, row_group_size: int = 10_000) -> dict:
    """Write a deterministic multi-file transcripts dataset; returns an info
    dict {dir, files, rows, n_convs, seed}. Conversations never straddle a
    file boundary."""
    os.makedirs(out_dir, exist_ok=True)
    per_file = max(1, n_convs // num_files)
    files = []
    rows = 0
    off = 0
    idx = 0
    while off < n_convs:
        take = min(per_file, n_convs - off)
        tbl = make_transcripts_table(take, seed=seed, conv_offset=off)
        path = os.path.join(out_dir, f"part-{idx:05d}.parquet")
        pq.write_table(tbl, path, row_group_size=row_group_size)
        files.append(path)
        rows += tbl.num_rows
        off += take
        idx += 1
    return {"dir": out_dir, "files": files, "rows": rows,
            "n_convs": n_convs, "seed": seed}
