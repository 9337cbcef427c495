"""The flagship transcript pipeline: parse → enrich → route → aggregate.

Mirrors the FIXTURES.md §3 routing config: dissect parse of log-style
turns, JSON decode of JSON turns, parse failures dead-lettered with the ES
rewrite shape, `level=debug` rows dropped, role/tool dictionary enrich in
an actor pool, first-match selector routing to es_like / ls_like /
dead_letter Parquet sinks with per-sink index format strings.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from ..fixtures import role_tool_meta
from ..model import FLAGS, META_DEAD_LETTER
from ..processors import get_column, set_column
from ..pipeline import Pipeline

TOKENIZER = 'level=%{level} ts=%{event_ts} caller=%{caller} msg="%{msg}"'


def mark_dead_letter(tbl: pa.Table) -> pa.Table:
    """parse failure = dissect failed AND the turn is not valid JSON."""
    flags = get_column(tbl, FLAGS)
    if flags is None:
        flags = pa.nulls(tbl.num_rows, pa.string())
    dissect_fail = pc.fill_null(
        pc.match_substring(flags, "dissect_parsing_error"), False)
    json_ok = get_column(tbl, "json_ok")
    if json_ok is None:
        json_ok = pa.array([False] * tbl.num_rows, pa.bool_())
    dead = pc.and_(dissect_fail, pc.invert(pc.fill_null(json_ok, False)))
    return set_column(tbl, META_DEAD_LETTER, dead)


def flagship_config(enrich_rows=None, enrich_concurrency: int = 4,
                    batch_size=None) -> dict:
    return {
        "processors": [
            {"dissect": {"tokenizer": TOKENIZER, "field": "text",
                         "target_prefix": ""}},
            {"decode_json_fields": {
                "fields": ["text"], "target": "j",
                "expected_keys": ["event", "k:int"],
                "document_id": "doc_id"}},
            {"script": {"fn": mark_dead_letter}},
            {"timestamp": {"field": "event_ts",
                           "layouts": ["2006-01-02T15:04:05Z"],
                           "target_field": "event_time",
                           "ignore_missing": True}},
            {"add_fields": {"target": "agent",
                            "fields": {"name": "raybeats", "version": "0.1"}}},
            {"fingerprint": {"fields": ["conv_id", "turn_idx", "text"]}},
            {"drop_event": {"when": {"equals": {"level": "debug"}}}},
        ],
        "enrich": {
            "rows": enrich_rows if enrich_rows is not None else role_tool_meta(),
            "key_fields": ["role", "tool"],
            "target_prefix": "meta",
            "concurrency": enrich_concurrency,
        },
        "router": {
            "rules": [
                {"sink": "ls_like",
                 "when": {"or": [{"equals": {"role": "tool"}},
                                 {"contains": {"msg": "denied"}}]}},
                {"sink": "es_like"},
            ],
            "default": "es_like",
            "dead_letter": "dead_letter",
            "sink_indexes": {"es_like": "events-%{[level]:none}",
                             "ls_like": "beats"},
        },
        "dead_letter_rewrite": True,
        "source_field": "text",
        "batch_size": batch_size,
    }


def flagship_pipeline(**kw) -> Pipeline:
    return Pipeline(flagship_config(**kw))
