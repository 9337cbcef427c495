"""Deterministic events → transcripts derivation.

The driver's testdata has no transcripts table, so the flagship pipeline's
correctness gate derives one deterministically from ``events`` — the same
per-row mapping expressed twice: vectorized Arrow (Ray side) and ANSI SQL
(DuckDB oracle side). Both must produce byte-identical rows.

Shape (BASELINE.json input_hint): (conv_id:string, turn_idx:int32,
role:string, text:string, tool:string, ts:timestamp). Text classes by
``event_id % 10``: 0-6 log-style dissect-parseable line, 7 malformed line,
8-9 JSON turn (the raw ``props`` JSON).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from .util import imod as _mod

_ROLE_KEYS = ["signup", "click", "view", "purchase", "error"]
_ROLE_VALS = ["system", "user", "user", "assistant", "tool"]
_TOOL_VALS = ["", "search", "browser", "db", "code"]
_LEVELS = ["info", "warn", "error", "debug"]


def _map(col: pa.Array, keys: list[str], vals: list[str]) -> pa.Array:
    idx = pc.index_in(col, value_set=pa.array(keys, pa.string()))
    return pc.take(pa.array(vals, pa.string()), idx)


def derive_transcripts(tbl: pa.Table) -> pa.Table:
    """events batch → transcripts batch (pure per-row, shuffle-free)."""
    eid = tbl.column("event_id")
    eid = eid.combine_chunks() if isinstance(eid, pa.ChunkedArray) else eid
    etype = tbl.column("event_type")
    ts = tbl.column("ts")
    conv_id = pc.binary_join_element_wise(
        "conv-",
        pc.utf8_lpad(pc.cast(tbl.column("user_id"), pa.string()), 8, "0"),
        "")
    turn_idx = pc.cast(eid, pa.int32())
    # unknown (or NULL) event types take the SQL CASE's ELSE branch —
    # index_in yields null there, which fill_null maps exactly like
    # DuckDB's ELSE 'tool' / ELSE 'code'
    role = pc.fill_null(_map(etype, _ROLE_KEYS, _ROLE_VALS), "tool")
    base_tool = pc.fill_null(_map(etype, _ROLE_KEYS, _TOOL_VALS), "code")
    unk = pc.equal(_mod(eid, 37), 0)
    unk_tool = pc.binary_join_element_wise(
        "tool-x", pc.cast(_mod(eid, 5), pa.string()), "")
    tool = pc.if_else(unk, unk_tool, base_tool)

    m10 = _mod(eid, 10)
    lvl = pc.take(pa.array(_LEVELS, pa.string()),
                  pc.cast(_mod(eid, 4), pa.int32()))
    # Arrow %S includes fractional seconds; DuckDB's does not — strip
    ts_iso = pc.replace_substring_regex(
        pc.strftime(ts, format="%Y-%m-%dT%H:%M:%SZ"), r"\.\d+", "")
    eid_str = pc.cast(eid, pa.string())
    log_line = pc.binary_join_element_wise(
        "level=", lvl, " ts=", ts_iso, " caller=", etype, ".go msg=\"evt ",
        eid_str, " ", etype, "\"", "")
    broken = pc.binary_join_element_wise(
        "lvl=", lvl, " broken evt ", eid_str, "")
    props = tbl.column("props")
    text = pc.if_else(pc.less_equal(m10, 6), log_line,
                      pc.if_else(pc.equal(m10, 7), broken,
                                 pc.cast(props, pa.string())))
    return pa.table({
        "conv_id": conv_id, "turn_idx": turn_idx, "role": role,
        "text": text, "tool": tool,
        "ts": pc.cast(ts, pa.timestamp("us")),
    })


# The same derivation as a DuckDB CTE body over the registered `events` view.
TRANSCRIPTS_SQL = """
SELECT
  'conv-' || lpad(CAST(user_id AS VARCHAR), 8, '0') AS conv_id,
  CAST(event_id AS INTEGER) AS turn_idx,
  CASE event_type WHEN 'signup' THEN 'system' WHEN 'click' THEN 'user'
       WHEN 'view' THEN 'user' WHEN 'purchase' THEN 'assistant'
       ELSE 'tool' END AS role,
  CASE
    WHEN event_id % 10 <= 6 THEN
      'level=' ||
      CASE event_id % 4 WHEN 0 THEN 'info' WHEN 1 THEN 'warn'
           WHEN 2 THEN 'error' ELSE 'debug' END ||
      ' ts=' || strftime(ts, '%Y-%m-%dT%H:%M:%SZ') ||
      ' caller=' || event_type || '.go msg="evt ' ||
      CAST(event_id AS VARCHAR) || ' ' || event_type || '"'
    WHEN event_id % 10 = 7 THEN
      'lvl=' ||
      CASE event_id % 4 WHEN 0 THEN 'info' WHEN 1 THEN 'warn'
           WHEN 2 THEN 'error' ELSE 'debug' END ||
      ' broken evt ' || CAST(event_id AS VARCHAR)
    ELSE props
  END AS text,
  CASE WHEN event_id % 37 = 0 THEN 'tool-x' || CAST(event_id % 5 AS VARCHAR)
       ELSE CASE event_type WHEN 'signup' THEN '' WHEN 'click' THEN 'search'
            WHEN 'view' THEN 'browser' WHEN 'purchase' THEN 'db'
            ELSE 'code' END END AS tool,
  ts
FROM events
"""

# regex equivalent of the flagship dissect tokenizer ON THIS CORPUS (values
# never contain the delimiters, so leftmost-delimiter dissect == regex)
DISSECT_REGEX_SQL = '^level=([^ ]*) ts=([^ ]*) caller=([^ ]*) msg="(.*)"$'


def read_transcripts(sf_dir: str, parallelism: int = -1):
    """Ray Dataset of derived transcripts for an sf dir."""
    import ray.data as rd
    ds = rd.read_parquet(f"{sf_dir}/events.parquet")
    return ds.map_batches(derive_transcripts, batch_format="pyarrow",
                          zero_copy_batch=True)
