"""Pure-python, single-threaded oracle for the flagship pipeline.

Implements the per-event semantics of SURVEY.md §2 row-by-row (the
reference's ``-expected.json`` golden pattern): dissect row mode, JSON
decode, dead-letter marking, debug drop, dictionary enrich, first-match
routing, ES dead-letter rewrite. The Ray pipeline must match this
row-for-row.
"""

from __future__ import annotations

import hashlib
import json

from raybeats.dissect import Dissector
from raybeats.errors import DissectParseError
from raybeats.fixtures import role_tool_meta
from raybeats.pipelines.flagship import TOKENIZER


def fingerprint(row: dict, fields: list[str]) -> str:
    parts = []
    for k in sorted(set(fields)):
        v = row.get(k)
        if v is None:
            continue
        parts.append(f"|{k}|{v}")
    return hashlib.sha256(("".join(parts) + "|").encode()).hexdigest()


def oracle_route(rows: list[dict], enrich_rows=None) -> list[dict]:
    d = Dissector(TOKENIZER)
    side = {(r["role"], r["tool"]): r
            for r in (enrich_rows or role_tool_meta())}
    out = []
    for row in rows:
        ev = dict(row)
        flags = []
        try:
            parsed = d.dissect(ev["text"])
            ev.update(parsed)
        except DissectParseError:
            flags.append("dissect_parsing_error")
        # decode_json_fields
        s = (ev["text"] or "").strip()
        json_ok = False
        if s.startswith("{"):
            try:
                obj = json.loads(s)
                if isinstance(obj, dict):
                    json_ok = True
                    if "doc_id" in obj:
                        ev["meta_id"] = str(obj.pop("doc_id"))
                    if "event" in obj:
                        ev["j.event"] = obj["event"]
                    if "k" in obj:
                        ev["j.k"] = int(obj["k"])
            except (ValueError, TypeError):
                pass
        ev["json_ok"] = json_ok
        dead = bool(flags) and not json_ok
        # fingerprint over conv_id, text, turn_idx (sorted)
        ev["fingerprint"] = fingerprint(ev, ["conv_id", "turn_idx", "text"])
        # drop_event when level == debug
        if ev.get("level") == "debug":
            continue
        # enrich
        meta = side.get((ev["role"], ev["tool"]))
        ev["meta_miss"] = meta is None
        for k in ("team", "cost_class", "priority"):
            ev[f"meta.{k}"] = meta[k] if meta else None
        # route (first match wins; dead-letter override)
        if dead:
            sink = "dead_letter"
        elif ev["role"] == "tool" or "denied" in (ev.get("msg") or ""):
            sink = "ls_like"
        else:
            sink = "es_like"
        ev["sink"] = sink
        ev["index"] = (f"events-{ev.get('level') if ev.get('level') is not None else 'none'}"
                       if sink == "es_like" else
                       "beats" if sink == "ls_like" else None)
        if dead:
            ev["message"] = ev["text"]
            ev["error.type"] = "parse_error"
            ev["error.message"] = ",".join(flags)
        if flags:
            ev["log_flags"] = ",".join(flags)
        out.append(ev)
    return out


def oracle_counts(rows: list[dict], enrich_rows=None) -> dict[str, int]:
    counts: dict[str, int] = {}
    for ev in oracle_route(rows, enrich_rows):
        counts[ev["sink"]] = counts.get(ev["sink"], 0) + 1
    return counts
