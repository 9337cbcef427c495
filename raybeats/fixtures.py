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

    texts: list[str] = []
    for i in range(n):
        c = cls[i]
        if c == 0:
            texts.append(
                f'level={LEVELS[lvl[i]]} ts=2024-01-01T00:{turn_idx[i] % 60:02d}:'
                f'{kval[i] % 60:02d}Z caller={CALLERS[caller[i]]} '
                f'msg="{VERBS[verb[i]]} conv={conv_ids_num[i]} turn={turn_idx[i]}"')
        elif c == 1:
            obj = {"event": VERBS[verb[i]], "k": int(kval[i])}
            if kval[i] % 3 == 0:
                obj["doc_id"] = f"d{conv_ids_num[i]}-{turn_idx[i]}"
            if kval[i] % 7 == 0:
                obj["nested"] = {"a": int(kval[i]), "b": [1, 2]}
            texts.append(json.dumps(obj, separators=(",", ":")))
        elif c == 2:
            m = kval[i] % 3
            if m == 0:
                texts.append(f"lvl={LEVELS[lvl[i]]} wrong leading delimiter")
            elif m == 1:
                texts.append(f"level={LEVELS[lvl[i]]} truncated")
            else:
                texts.append('{"broken": json,,')
        else:
            k = edge_kind[i]
            if k == 0:
                texts.append("")
            elif k == 1:
                texts.append("level= ts= caller= msg=\"\"")
            elif k == 2:
                texts.append("level=info ts=t caller=c msg=\"" +
                             "längère-✓" * 400 + "\"")
            else:
                texts.append(f'level=info ts=t caller=c msg="drop-me conv={conv_ids_num[i]}"')

    tool_strs = [TOOLS[t] if not u else f"tool-x{t}"
                 for t, u in zip(tools, unknown_tool)]
    return pa.table({
        "conv_id": pa.array([f"conv-{c:08d}" for c in conv_ids_num], pa.string()),
        "turn_idx": pa.array(turn_idx, pa.int32()),
        "role": pa.array([ROLES[r] for r in roles], pa.string()),
        "text": pa.array(texts, pa.string()),
        "tool": pa.array(tool_strs, pa.string()),
        "ts": pa.array(ts, pa.timestamp("us")),
    })


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
