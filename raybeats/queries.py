"""Query catalog: one entry per engine operator, with DuckDB oracle SQL.

Each Ray implementation and its SQL string compute the same result with
the same column names over the driver's parquet tables (views: region
nation customer supplier part orders lineitem events documents
embeddings). The flagship parse→enrich→route→aggregate family runs over
transcripts derived deterministically from ``events``
(:mod:`raybeats.transcripts` — the Arrow and SQL derivations are
byte-identical).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from .conditions import compile_condition
from .enrich import Enricher
from .fixtures import role_tool_meta
from .pipeline import Pipeline
from .processors import build_chain
from .util import adaptive_buckets, fnv1a_bucket, int_bucket
from .transcripts import (DISSECT_REGEX_SQL, TRANSCRIPTS_SQL,
                          derive_transcripts, read_transcripts)

RE = DISSECT_REGEX_SQL.replace("\\", "\\\\").replace("'", "''")
_T = f"WITH transcripts AS ({TRANSCRIPTS_SQL})"


def _read(sf_dir: str, table: str, columns=None, blocks: int | None = None):
    """Column-pruned parquet read. ``blocks`` overrides block planning for
    CPU-heavy downstream stages: a single small file otherwise becomes ONE
    block → one task → no parallelism (at 100 TB the fragment count makes
    this moot, but per-row-expensive ops need the split even on small
    inputs)."""
    import ray.data as rd
    kw = {}
    if blocks:
        kw["override_num_blocks"] = blocks
    return rd.read_parquet(f"{sf_dir}/{table}.parquet", columns=columns, **kw)


def _nrows(sf_dir: str, table: str) -> int:
    """Input row count from the parquet footer (metadata-only read) —
    sizes the adaptive bucket counts without executing anything."""
    return pq.read_metadata(f"{sf_dir}/{table}.parquet").num_rows


def _read_dim(sf_dir: str, table: str, columns=None):
    """Column-pruned read of a DIMENSION-scale table with a
    footer-sized block count. Ray's default split (cpus×2) turns a
    15k-row read into 64 tiny tasks PER downstream stage — task
    overhead exceeding the work (measured on snapshot_diff:
    4.5 s → 0.3 s warm). Grows with the footer count, so a dimension
    that turns out fact-sized still parallelizes."""
    n = _nrows(sf_dir, table)
    return _read(sf_dir, table, columns,
                 blocks=max(2, min(16, n // 50_000 + 2)))


# ------------------------------------------------------- flagship family

def events_flagship_config() -> dict:
    """Flagship config specialized to the events-derived corpus."""
    from .pipelines.flagship import flagship_config
    cfg = flagship_config()
    # the derived corpus' JSON turns are the events `props` objects
    cfg["processors"][1]["decode_json_fields"]["expected_keys"] = ["k:int"]
    del cfg["processors"][1]["decode_json_fields"]["document_id"]
    return cfg


def q_transcripts_derive(sf_dir: str):
    return read_transcripts(sf_dir)


SQL_TRANSCRIPTS = f"{_T} SELECT * FROM transcripts"


def q_parse_dissect(sf_dir: str):
    from .dissect import Dissector
    from .pipelines.flagship import TOKENIZER
    tok = Dissector(TOKENIZER)

    def parse(tbl: pa.Table) -> pa.Table:
        vals, ok = tok.dissect_column(tbl.column("text"))
        return pa.table({
            "conv_id": tbl.column("conv_id"),
            "turn_idx": tbl.column("turn_idx"),
            "parse_ok": ok,
            "level": vals["level"], "event_ts": vals["event_ts"],
            "caller": vals["caller"], "msg": vals["msg"],
        })

    return read_transcripts(sf_dir).map_batches(parse, batch_format="pyarrow",
                                                zero_copy_batch=True)


SQL_PARSE_DISSECT = f"""{_T}
SELECT conv_id, turn_idx,
  regexp_matches(text, '{RE}') AS parse_ok,
  CASE WHEN regexp_matches(text, '{RE}') THEN regexp_extract(text, '{RE}', 1) END AS level,
  CASE WHEN regexp_matches(text, '{RE}') THEN regexp_extract(text, '{RE}', 2) END AS event_ts,
  CASE WHEN regexp_matches(text, '{RE}') THEN regexp_extract(text, '{RE}', 3) END AS caller,
  CASE WHEN regexp_matches(text, '{RE}') THEN regexp_extract(text, '{RE}', 4) END AS msg
FROM transcripts"""

# shared routed-rows CTE for the route/aggregate oracles
_ROUTED_SQL = f"""{_T},
parsed AS (
  SELECT *,
    regexp_matches(text, '{RE}') AS dissect_ok,
    (text LIKE '{{%' AND json_valid(text)) AS json_ok,
    CASE WHEN regexp_matches(text, '{RE}')
         THEN regexp_extract(text, '{RE}', 1) END AS level,
    CASE WHEN regexp_matches(text, '{RE}')
         THEN regexp_extract(text, '{RE}', 4) END AS msg
  FROM transcripts),
routed AS (
  SELECT *,
    CASE WHEN (NOT dissect_ok) AND (NOT json_ok) THEN 'dead_letter'
         WHEN role = 'tool' OR msg LIKE '%denied%' THEN 'ls_like'
         ELSE 'es_like' END AS sink
  FROM parsed
  WHERE level IS NULL OR level <> 'debug')"""


def _routed_dataset(sf_dir: str):
    pipe = Pipeline(events_flagship_config())
    return pipe, pipe.build(read_transcripts(sf_dir))


def q_route_counts(sf_dir: str):
    pipe, ds = _routed_dataset(sf_dir)
    counts = pipe.counts_by_sink(ds)
    sinks = sorted(counts)
    return pa.table({"sink": pa.array(sinks, pa.string()),
                     "n": pa.array([counts[s] for s in sinks], pa.int64())})


SQL_ROUTE_COUNTS = f"""{_ROUTED_SQL}
SELECT sink, COUNT(*) AS n FROM routed GROUP BY sink ORDER BY sink"""


def q_routed_rows(sf_dir: str):
    _, ds = _routed_dataset(sf_dir)

    def project(tbl: pa.Table) -> pa.Table:
        return pa.table({
            "conv_id": tbl.column("conv_id"),
            "turn_idx": tbl.column("turn_idx"),
            "sink": tbl.column("sink"),
            "level": tbl.column("level"),
            "route_index": tbl.column("index"),
            "fingerprint": tbl.column("fingerprint"),
            "text": tbl.column("text"),
        })

    return ds.map_batches(project, batch_format="pyarrow")


SQL_ROUTED_ROWS = f"""{_ROUTED_SQL}
SELECT conv_id, turn_idx, sink, level,
  CASE WHEN sink = 'es_like' THEN 'events-' || coalesce(level, 'none')
       WHEN sink = 'ls_like' THEN 'beats' END AS route_index,
  sha256('|conv_id|' || conv_id || '|text|' || text ||
         '|turn_idx|' || CAST(turn_idx AS VARCHAR) || '|') AS fingerprint,
  text
FROM routed"""


def q_enrich_lookup(sf_dir: str):
    ds = read_transcripts(sf_dir)
    enr = Enricher(rows=role_tool_meta(), key_fields=("role", "tool"),
                   target_prefix="")

    def project(tbl: pa.Table) -> pa.Table:
        tbl = enr(tbl)
        return pa.table({
            "conv_id": tbl.column("conv_id"),
            "turn_idx": tbl.column("turn_idx"),
            "team": tbl.column("team"),
            "cost_class": tbl.column("cost_class"),
            "priority": pc.cast(tbl.column("priority"), pa.int64()),
            "miss": tbl.column("enrich_miss"),
        })

    return ds.map_batches(project, batch_format="pyarrow")


def _meta_values_sql() -> str:
    rows = role_tool_meta()
    vals = ", ".join(
        f"('{r['role']}', '{r['tool']}', '{r['team']}', "
        f"'{r['cost_class']}', {r['priority']})" for r in rows)
    return (f"meta(role, tool, team, cost_class, priority) AS "
            f"(SELECT * FROM (VALUES {vals}))")


SQL_ENRICH_LOOKUP = f"""{_T}, {_meta_values_sql()}
SELECT t.conv_id, t.turn_idx, m.team, m.cost_class,
       CAST(m.priority AS BIGINT) AS priority,
       (m.role IS NULL) AS miss
FROM transcripts t LEFT JOIN meta m
  ON t.role = m.role AND t.tool = m.tool"""


def q_conversation_assembly(sf_dir: str):
    """Multiline-equivalent conversation assembly. Bucketed shuffle: the
    groupby key is a fixed-cardinality hash bucket of conv_id (one
    vectorized pandas groupby-agg per bucket) rather than one python call
    per conversation — same shape salts away hot conversations at scale."""
    import pandas as pd

    # ~2 transcript turns per event; scale buckets with input so a group
    # stays ~target_rows regardless of corpus size
    n_buckets = adaptive_buckets(2 * _nrows(sf_dir, "events"))

    def add_bucket(tbl: pa.Table) -> pa.Table:
        return tbl.append_column(
            "bucket", fnv1a_bucket(tbl.column("conv_id"), n_buckets))

    def assemble(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["conv_id", "turn_idx"])
        agg = g.groupby("conv_id", sort=True).agg(
            n_turns=("text", "size"), joined=("text", "\n".join))
        agg["n_turns"] = agg["n_turns"].astype("int64")
        return agg.reset_index()[["conv_id", "n_turns", "joined"]]

    return (read_transcripts(sf_dir)
            .map_batches(add_bucket, batch_format="pyarrow")
            .groupby("bucket")
            .map_groups(assemble, batch_format="pandas"))


SQL_CONVERSATION_ASSEMBLY = f"""{_T}
SELECT conv_id, COUNT(*) AS n_turns,
       string_agg(text, chr(10) ORDER BY turn_idx) AS joined
FROM transcripts GROUP BY conv_id"""


# ------------------------------------------------------ processor queries

def q_json_decode(sf_dir: str):
    chain = build_chain([{"decode_json_fields": {
        "fields": ["props"], "target": "", "expected_keys": ["k:int"]}}])

    def run(tbl: pa.Table) -> pa.Table:
        t = chain(tbl)
        return pa.table({"event_id": t.column("event_id"),
                         "k": t.column("k")})

    return _read(sf_dir, "events", ["event_id", "props"]) \
        .map_batches(run, batch_format="pyarrow")


SQL_JSON_DECODE = ("SELECT event_id, CAST(json_extract_string(props, '$.k') "
                   "AS BIGINT) AS k FROM events")


def q_conditions_filter(sf_dir: str):
    cond = compile_condition({"and": [
        {"equals": {"event_type": "purchase"}},
        {"range": {"value.gte": 50}}]})

    def run(tbl: pa.Table) -> pa.Table:
        t = tbl.filter(pc.fill_null(cond(tbl), False))
        return pa.table({"event_id": t.column("event_id"),
                         "value": t.column("value")})

    return _read(sf_dir, "events", ["event_id", "event_type", "value"]) \
        .map_batches(run, batch_format="pyarrow")


SQL_CONDITIONS_FILTER = ("SELECT event_id, value FROM events "
                         "WHERE event_type = 'purchase' AND value >= 50")


def q_convert_types(sf_dir: str):
    chain = build_chain([{"convert": {"fields": [
        {"from": "user_id", "to": "user_str", "type": "string"},
        {"from": "event_id", "to": "event_f", "type": "double"}]}}])

    def run(tbl: pa.Table) -> pa.Table:
        t = chain(tbl)
        return pa.table({"event_id": t.column("event_id"),
                         "user_str": t.column("user_str"),
                         "event_f": t.column("event_f")})

    return _read(sf_dir, "events", ["event_id", "user_id"]) \
        .map_batches(run, batch_format="pyarrow")


SQL_CONVERT_TYPES = ("SELECT event_id, CAST(user_id AS VARCHAR) AS user_str, "
                     "CAST(event_id AS DOUBLE) AS event_f FROM events")


def q_replace_truncate(sf_dir: str):
    chain = build_chain([
        {"replace": {"fields": [{"field": "text", "pattern": "spark",
                                 "replacement": "ray"}]}},
        {"truncate_fields": {"fields": ["text"], "max_characters": 40}},
    ])

    def run(tbl: pa.Table) -> pa.Table:
        t = chain(tbl)
        return pa.table({"doc_id": t.column("doc_id"),
                         "excerpt": t.column("text")})

    return _read(sf_dir, "documents", ["doc_id", "text"]) \
        .map_batches(run, batch_format="pyarrow")


SQL_REPLACE_TRUNCATE = ("SELECT doc_id, substr(regexp_replace(text, 'spark', "
                        "'ray', 'g'), 1, 40) AS excerpt FROM documents")


def q_extract_field(sf_dir: str):
    chain = build_chain([{"extract_field": {
        "field": "text", "separator": " ", "index": 2, "target": "word3"}}])

    def run(tbl: pa.Table) -> pa.Table:
        t = chain(tbl)
        return pa.table({"doc_id": t.column("doc_id"),
                         "word3": t.column("word3")})

    return _read(sf_dir, "documents", ["doc_id", "text"]) \
        .map_batches(run, batch_format="pyarrow")


SQL_EXTRACT_FIELD = ("SELECT doc_id, string_split(text, ' ')[3] AS word3 "
                     "FROM documents")


def q_timestamp_roundtrip(sf_dir: str):
    chain = build_chain([{"timestamp": {
        "field": "ts_str", "layouts": ["%Y-%m-%dT%H:%M:%SZ"],
        "target_field": "parsed"}}])

    def run(tbl: pa.Table) -> pa.Table:
        iso = pc.replace_substring_regex(
            pc.strftime(tbl.column("ts"), format="%Y-%m-%dT%H:%M:%SZ"),
            r"\.\d+", "")
        t = chain(tbl.append_column("ts_str", iso))
        return pa.table({"event_id": t.column("event_id"),
                         "parsed": t.column("parsed")})

    return _read(sf_dir, "events", ["event_id", "ts"]) \
        .map_batches(run, batch_format="pyarrow")


SQL_TIMESTAMP_ROUNDTRIP = (
    "SELECT event_id, strptime(strftime(ts, '%Y-%m-%dT%H:%M:%SZ'), "
    "'%Y-%m-%dT%H:%M:%SZ') AS parsed FROM events")


def q_fingerprint_docs(sf_dir: str):
    chain = build_chain([{"fingerprint": {
        "fields": ["doc_id", "text"], "method": "sha256"}}])

    def run(tbl: pa.Table) -> pa.Table:
        t = chain(tbl)
        return pa.table({"doc_id": t.column("doc_id"),
                         "fp": t.column("fingerprint")})

    return _read(sf_dir, "documents", ["doc_id", "text"]) \
        .map_batches(run, batch_format="pyarrow")


SQL_FINGERPRINT_DOCS = (
    "SELECT doc_id, sha256('|doc_id|' || CAST(doc_id AS VARCHAR) || "
    "'|text|' || text || '|') AS fp FROM documents")


# --------------------------------------------------- training-data ops

def q_dedup_exact(sf_dir: str):
    from .textops.dedup import exact_dedup_groups
    return exact_dedup_groups(
        _read(sf_dir, "documents", ["doc_id", "text"], blocks=16))


SQL_DEDUP_EXACT = ("SELECT md5(text) AS h, MIN(doc_id) AS keep_id, "
                   "COUNT(*) AS dups FROM documents GROUP BY md5(text)")


def q_token_stats(sf_dir: str):
    from .textops.analysis import token_stats
    return _read(sf_dir, "documents", ["doc_id", "text"]) \
        .map_batches(token_stats, batch_format="pyarrow")


SQL_TOKEN_STATS = r"""SELECT doc_id,
  CAST(length(text) AS BIGINT) AS n_chars,
  CAST(length(regexp_extract_all(text, '[a-zA-Z0-9]+')) AS BIGINT) AS n_tokens,
  CAST(length(regexp_extract_all(text, '\b(the|a|of|and|to|in|is|it)\b'))
       AS BIGINT) AS n_stop
FROM documents"""


def q_token_topk(sf_dir: str):
    """Corpus-wide heavy hitters: top 25 tokens by total occurrences.
    The wide shuffle is pre-aggregated — each batch combines its own
    token counts (one np.unique pass) so the groupby moves one row per
    (batch, distinct-token), never one per token occurrence; ties break
    deterministically (count desc, token asc) on both sides."""
    import numpy as np
    import re as re_mod

    from ray.data.aggregate import Sum
    tok_re = re_mod.compile(r"[a-z0-9]+")

    def partial(tbl: pa.Table) -> pa.Table:
        toks: list[str] = []
        for t in tbl.column("text").to_pylist():
            toks.extend(tok_re.findall((t or "").lower()))
        if not toks:
            return pa.table({"token": pa.array([], pa.string()),
                             "n": pa.array([], pa.int64())})
        uniq, counts = np.unique(np.array(toks, dtype=object),
                                 return_counts=True)
        return pa.table({"token": pa.array(uniq.tolist(), pa.string()),
                         "n": pa.array(counts.astype("int64"), pa.int64())})

    agg = _read(sf_dir, "documents", ["text"], blocks=16) \
        .map_batches(partial, batch_format="pyarrow") \
        .groupby("token").aggregate(Sum("n", alias_name="n"))
    return agg.sort(["n", "token"], descending=[True, False]).limit(25)


SQL_TOKEN_TOPK = r"""WITH toks AS (
  SELECT unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS token
  FROM documents)
SELECT token, COUNT(*) AS n FROM toks
GROUP BY token ORDER BY n DESC, token LIMIT 25"""


def q_quality_score(sf_dir: str):
    from .textops.analysis import quality_score
    return _read(sf_dir, "documents", ["doc_id", "text"]) \
        .map_batches(quality_score, batch_format="pyarrow")


SQL_QUALITY_SCORE = r"""WITH f AS (
  SELECT doc_id,
    CAST(length(text) AS DOUBLE) AS n_chars,
    CAST(length(regexp_extract_all(text, '[a-zA-Z0-9]+')) AS DOUBLE) AS n_tokens,
    CAST(length(regexp_extract_all(text, '\b(the|a|of|and|to|in|is|it)\b'))
         AS DOUBLE) AS n_stop,
    CAST(length(regexp_extract_all(text, '[A-Za-z]')) AS DOUBLE) AS n_alpha
  FROM documents)
SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
  n_stop / GREATEST(n_tokens, 1.0) AS stop_ratio,
  n_alpha / GREATEST(n_chars, 1.0) AS alpha_ratio,
  (n_tokens >= 5 AND (n_alpha / GREATEST(n_chars, 1.0)) >= 0.5
   AND ((n_alpha / GREATEST(n_chars, 1.0)) * n_chars
        / GREATEST(n_tokens, 1.0)) <= 15.0) AS keep
FROM f"""


# planted PII suffix (engine + SQL both append it for doc_id % 7 == 0 so
# the scrub oracle is non-vacuous on a synthetic corpus with no real PII)
_PII_PLANT = " Contact user{id}@example.com ssn 123-45-6789 ip 10.0.0.1"


def _plant_pii(did, text):
    """Deterministic PII planting shared by pii_scrub, pii_report and
    the curation flagship: every doc_id % 7 == 0 gains an email + SSN
    + IP suffix. One definition so the scrub and its audit report are
    STRUCTURALLY consistent, not copy-paste consistent."""
    from .util import imod

    suffix = pc.binary_join_element_wise(
        " Contact user", pc.cast(did, pa.string()),
        "@example.com ssn 123-45-6789 ip 10.0.0.1", "")
    return pc.if_else(pc.equal(imod(did, 7), 0),
                      pc.binary_join_element_wise(text, suffix, ""),
                      text)


def q_pii_scrub(sf_dir: str):
    from .textops.curation import pii_scrub

    def plant(t: pa.Table) -> pa.Table:
        did = t.column("doc_id")
        return pa.table({"doc_id": did,
                         "text": _plant_pii(did, t.column("text"))})

    return _read(sf_dir, "documents", ["doc_id", "text"]) \
        .map_batches(plant, batch_format="pyarrow") \
        .map_batches(pii_scrub, batch_format="pyarrow")


# staged exactly like the engine: count each pattern on the text as the
# previous replacement left it (email → ssn → ip)
SQL_PII_SCRUB = r"""WITH d AS (
  SELECT doc_id, CASE WHEN doc_id % 7 = 0 THEN text || ' Contact user' ||
    CAST(doc_id AS VARCHAR) || '@example.com ssn 123-45-6789 ip 10.0.0.1'
    ELSE text END AS t0 FROM documents),
s1 AS (SELECT doc_id, t0,
  CAST(length(regexp_extract_all(t0,
    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS BIGINT) AS n_email,
  regexp_replace(t0, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}',
    '<EMAIL>', 'g') AS t1 FROM d),
s2 AS (SELECT doc_id, n_email,
  CAST(length(regexp_extract_all(t1, '\b\d{3}-\d{2}-\d{4}\b')) AS BIGINT)
    AS n_ssn,
  regexp_replace(t1, '\b\d{3}-\d{2}-\d{4}\b', '<SSN>', 'g') AS t2 FROM s1)
SELECT doc_id,
  regexp_replace(t2, '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '<IP>', 'g')
    AS clean_text,
  n_email, n_ssn,
  CAST(length(regexp_extract_all(t2,
    '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b')) AS BIGINT) AS n_ip
FROM s2"""


def q_repetition_stats(sf_dir: str):
    from .textops.curation import repetition_stats
    from .util import imod

    def plant(t: pa.Table) -> pa.Table:
        # doc_id % 13 == 0 gets 30 repeated filler tokens so the keep
        # filter actually fires on this low-repetition synthetic corpus
        did = t.column("doc_id")
        text = pc.if_else(pc.equal(imod(did, 13), 0),
                          pc.binary_join_element_wise(
                              t.column("text"), " spam" * 30, ""),
                          t.column("text"))
        return pa.table({"doc_id": did, "text": text})

    return _read(sf_dir, "documents", ["doc_id", "text"], blocks=8) \
        .map_batches(plant, batch_format="pyarrow") \
        .map_batches(repetition_stats, batch_format="pyarrow")


SQL_REPETITION_STATS = """WITH d AS (
  SELECT doc_id, CASE WHEN doc_id % 13 = 0
    THEN text || repeat(' spam', 30) ELSE text END AS text FROM documents),
t AS (SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9]+'))
      AS tok FROM d),
g AS (SELECT doc_id, tok, COUNT(*) AS c FROM t GROUP BY 1, 2),
s AS (SELECT doc_id, SUM(c) AS n_tokens, COUNT(*) AS n_distinct,
             MAX(c) AS max_c FROM g GROUP BY 1)
SELECT d.doc_id,
  CAST(COALESCE(s.n_tokens, 0) AS BIGINT) AS n_tokens,
  CAST(COALESCE(s.n_distinct, 0) AS DOUBLE)
    / GREATEST(CAST(COALESCE(s.n_tokens, 0) AS DOUBLE), 1.0)
    AS distinct_ratio,
  CAST(COALESCE(s.max_c, 0) AS DOUBLE)
    / GREATEST(CAST(COALESCE(s.n_tokens, 0) AS DOUBLE), 1.0) AS top_ratio,
  (COALESCE(s.n_tokens, 0) >= 5
   AND CAST(COALESCE(s.n_distinct, 0) AS DOUBLE)
       / GREATEST(CAST(COALESCE(s.n_tokens, 0) AS DOUBLE), 1.0) >= 0.3
   AND CAST(COALESCE(s.max_c, 0) AS DOUBLE)
       / GREATEST(CAST(COALESCE(s.n_tokens, 0) AS DOUBLE), 1.0) <= 0.2)
    AS keep
FROM d LEFT JOIN s ON s.doc_id = d.doc_id"""


def q_hash_split(sf_dir: str):
    from .textops.curation import hash_split
    return _read(sf_dir, "documents", ["doc_id"]) \
        .map_batches(hash_split, batch_format="pyarrow")


SQL_HASH_SPLIT = """WITH h AS (
  SELECT doc_id, CAST(CAST(doc_id AS HUGEINT) * 2654435761 % 4294967296
                      AS BIGINT) AS m FROM documents),
b AS (SELECT doc_id, xor(m, m >> 15) % 100 AS bucket FROM h)
SELECT doc_id, CAST(bucket AS BIGINT) AS bucket,
  CASE WHEN bucket < 80 THEN 'train' WHEN bucket < 90 THEN 'val'
       ELSE 'test' END AS split FROM b"""


def q_quota_sample(sf_dir: str):
    """Per-language quota sample (cap 20 docs/lang, deterministic hash
    priority): per-batch local prune → tiny groupby finalize, so the
    shuffle carries only quota-bounded fixed-width rows."""
    from .textops.curation import quota_sample
    return quota_sample(_read(sf_dir, "documents", ["doc_id", "lang"]),
                        group_col="lang", n_per_group=20)


SQL_QUOTA_SAMPLE = """WITH h AS (
  SELECT doc_id, lang,
    CAST(CAST(doc_id AS HUGEINT) * 2654435761 % 4294967296 AS BIGINT) AS m
  FROM documents),
p AS (SELECT doc_id, lang, xor(m, m >> 15) AS prio FROM h),
r AS (SELECT *, row_number() OVER (PARTITION BY lang
                                   ORDER BY prio, doc_id) AS rn FROM p)
SELECT lang, doc_id, CAST(prio AS BIGINT) AS prio FROM r WHERE rn <= 20"""


def q_contamination(sf_dir: str):
    """Benchmark-contamination flag: the 'benchmark suite' is derived
    deterministically from the corpus itself (40-char snippets of the
    first 100 docs with doc_id % 97 == 0) so the oracle is
    self-contained; in production the snippet set is a fixed external
    artifact broadcast via ``ray.put``, bounded by suite size — never by
    corpus size."""
    from .textops.curation import ContaminationFlagger
    from .util import imod

    def local_top100(t: pa.Table) -> pa.Table:
        # per-batch candidate filter + LOCAL lowest-100 doc_ids: the
        # driver merge then sees ≤ 100 × n_blocks tiny rows — no
        # distributed sort (Ray's sort floor dwarfs this selection)
        t = t.filter(pc.and_(
            pc.equal(imod(t.column("doc_id"), 97), 0),
            pc.greater_equal(pc.utf8_length(t.column("text")), 60)))
        return t.sort_by("doc_id").slice(0, 100)

    cand = pa.concat_tables(_read(sf_dir, "documents", ["doc_id", "text"])
                            .map_batches(local_top100,
                                         batch_format="pyarrow")
                            .iter_batches(batch_size=None, batch_format="pyarrow"),
                            promote_options="default")
    bench = cand.sort_by("doc_id").slice(0, 100)
    snippets = sorted({t[20:60] for t in bench.column("text").to_pylist()})
    return _read(sf_dir, "documents", ["doc_id", "text"], blocks=8) \
        .map_batches(ContaminationFlagger, batch_format="pyarrow",
                     concurrency=(1, 4),
                     fn_constructor_kwargs={"snippets": snippets})


SQL_CONTAMINATION = """WITH b AS (
  SELECT DISTINCT substr(text, 21, 40) AS snip FROM (
    SELECT doc_id, text FROM documents
    WHERE doc_id % 97 = 0 AND length(text) >= 60
    ORDER BY doc_id LIMIT 100)),
n AS (SELECT d.doc_id,
        (SELECT COUNT(*) FROM b WHERE contains(d.text, b.snip)) AS n_hits
      FROM documents d)
SELECT doc_id, CAST(n_hits AS BIGINT) AS n_hits,
       n_hits > 0 AS contaminated FROM n"""


def q_knn_cosine(sf_dir: str):
    import pyarrow.dataset as pads

    from .textops.knn import knn_topk
    qt = pads.dataset(f"{sf_dir}/embeddings.parquet").to_table(
        filter=pc.field("vec_id") < 3)
    qt = qt.sort_by("vec_id")
    import numpy as np
    queries = np.array(qt.column("embedding").to_pylist(), dtype=np.float64)
    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"], blocks=16)
    return knn_topk(ds, queries, qt.column("vec_id").to_pylist(), k=5)


SQL_KNN_COSINE = """WITH q AS (
  SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qe
  FROM embeddings WHERE vec_id < 3),
s AS (
  SELECT q.query_id, e.vec_id AS neighbor_id,
         list_cosine_similarity(q.qe, CAST(e.embedding AS DOUBLE[])) AS sim
  FROM q, embeddings e WHERE e.vec_id <> q.query_id)
SELECT query_id, neighbor_id,
       row_number() OVER (PARTITION BY query_id
                          ORDER BY sim DESC, neighbor_id) AS rank
FROM s QUALIFY rank <= 5 ORDER BY query_id, rank"""


def q_window_agg(sf_dir: str):
    """Tumbling event-time window aggregate (hour buckets) — the windowed
    aggregate the reference lacks, expressed as derive-bucket → partial
    agg per batch → tiny combine. Sums are exact (integer cents)."""
    # partial kernel shared with the streaming TumblingWindowState so
    # the flush-equals-batch invariant cannot drift (util.py); hour is
    # already normalized to µs (DuckDB's resolution) inside it
    from .util import hour_cents_partial as partial

    small = _read(sf_dir, "events", ["user_id", "ts", "value"]) \
        .map_batches(partial, batch_format="pyarrow")
    # user_id × hour cardinality grows with input, so the combine is the
    # DISTRIBUTED groupby by default; below a statically-known input
    # budget (parquet footer rows bound the partial rows) one driver
    # arrow group_by beats the multi-second Ray shuffle floor — the same
    # bounded-fast-path pattern as duplicate_clusters
    if _nrows(sf_dir, "events") <= 2_000_000:
        return _combine_partials(
            small, ["user_id", "hour"],
            {"total_cents": "total_cents", "n": "n"})
    from ray.data.aggregate import Sum
    agg = small.groupby(["user_id", "hour"]).aggregate(
        Sum("total_cents", alias_name="total_cents"),
        Sum("n", alias_name="n"))

    def normalize(tbl: pa.Table) -> pa.Table:
        # Ray's hash-aggregate demotes the timestamp key's unit; DuckDB
        # (and the fast path) emit µs
        return tbl.set_column(tbl.column_names.index("hour"), "hour",
                              pc.cast(tbl.column("hour"),
                                      pa.timestamp("us")))
    return agg.map_batches(normalize, batch_format="pyarrow")


SQL_WINDOW_AGG = """SELECT user_id, date_trunc('hour', ts) AS hour,
  CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS total_cents,
  COUNT(*) AS n
FROM events GROUP BY user_id, date_trunc('hour', ts)"""


def q_sessionization(sf_dir: str):
    """Session windows (30-min inactivity gap) per user — the streaming-
    window shape: groupby key, order by time within group, count gap
    breaks. Partitioning assumption: one group sees all of a user's rows."""
    import pandas as pd

    gap_us = 30 * 60 * 1_000_000
    n_buckets = adaptive_buckets(_nrows(sf_dir, "events"))

    def add_bucket(tbl: pa.Table) -> pa.Table:
        return tbl.append_column(
            "bucket", int_bucket(tbl.column("user_id"), n_buckets))

    def sessions(g: pd.DataFrame) -> pd.DataFrame:
        # vectorized within the bucket: per-user ordered diff via shift
        g = g.sort_values(["user_id", "ts", "event_id"])
        ts = g["ts"].astype("int64")
        same_user = g["user_id"].eq(g["user_id"].shift())
        brk = (ts.diff() > gap_us) & same_user
        agg = g.assign(brk=brk).groupby("user_id", sort=True).agg(
            brks=("brk", "sum"), n_events=("brk", "size"))
        return pd.DataFrame({
            "user_id": agg.index.to_numpy(),
            "n_sessions": (agg["brks"] + 1).astype("int64").to_numpy(),
            "n_events": agg["n_events"].astype("int64").to_numpy(),
        })

    return _read(sf_dir, "events", ["user_id", "ts", "event_id"]) \
        .map_batches(add_bucket, batch_format="pyarrow") \
        .groupby("bucket").map_groups(sessions, batch_format="pandas")


SQL_SESSIONIZATION = """WITH d AS (
  SELECT user_id, ts,
    CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id
                                 ORDER BY ts, event_id)
              > INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS brk
  FROM events)
SELECT user_id, CAST(SUM(brk) + 1 AS BIGINT) AS n_sessions,
       COUNT(*) AS n_events
FROM d GROUP BY user_id"""


def q_value_histogram(sf_dir: str):
    """Fixed-bin histogram of event values (20 bins of width 10): derive
    bin per batch, partial counts, tiny combine — the aggregate sketch
    pattern with an exact oracle."""
    def partial(tbl: pa.Table) -> pa.Table:
        v = tbl.column("value")
        bin_id = pc.cast(pc.floor(pc.divide(v, 10.0)), pa.int64())
        bin_id = pc.min_element_wise(pc.max_element_wise(bin_id, 0), 19)
        t = pa.table({"bin": bin_id})
        g = t.group_by("bin").aggregate([("bin", "count")])
        return pa.table({"bin": g.column("bin"),
                         "n": pc.cast(g.column("bin_count"), pa.int64())})

    small = _read(sf_dir, "events", ["value"]) \
        .map_batches(partial, batch_format="pyarrow")
    return _combine_partials(small, ["bin"], {"n": "n"})


SQL_VALUE_HISTOGRAM = """SELECT
  LEAST(GREATEST(CAST(floor(value / 10.0) AS BIGINT), 0), 19) AS bin,
  COUNT(*) AS n
FROM events GROUP BY 1"""


def q_sliding_window(sf_dir: str):
    """Sliding event-time window: for every event, the count of that
    user's events in the trailing hour (inclusive). Keyed bucket shuffle,
    then a vectorized two-pointer (searchsorted) per user."""
    import numpy as np
    import pandas as pd

    n_buckets = adaptive_buckets(_nrows(sf_dir, "events"))

    def add_bucket(tbl: pa.Table) -> pa.Table:
        return tbl.append_column(
            "bucket", int_bucket(tbl.column("user_id"), n_buckets))

    def windowed(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"])
        out = []
        for uid, u in g.groupby("user_id", sort=True):
            ts = u["ts"].astype("int64").to_numpy()
            lo = np.searchsorted(ts, ts - 3_600_000_000, side="left")
            # side="right" includes ts-PEERS, matching SQL's RANGE ...
            # CURRENT ROW frame semantics when timestamps tie
            hi = np.searchsorted(ts, ts, side="right")
            n_in_window = hi - lo
            out.append(pd.DataFrame({
                "event_id": u["event_id"].to_numpy(),
                "user_id": uid,
                "n_trailing_hour": n_in_window.astype("int64")}))
        return pd.concat(out) if out else pd.DataFrame(
            {"event_id": pd.array([], dtype="int64"),
             "user_id": pd.array([], dtype="int64"),
             "n_trailing_hour": pd.array([], dtype="int64")})

    return _read(sf_dir, "events", ["event_id", "user_id", "ts"]) \
        .map_batches(add_bucket, batch_format="pyarrow") \
        .groupby("bucket").map_groups(windowed, batch_format="pandas")


SQL_SLIDING_WINDOW = """SELECT event_id, user_id,
  CAST(COUNT(*) OVER (PARTITION BY user_id ORDER BY ts
       RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
       AS BIGINT) AS n_trailing_hour
FROM events"""


def q_topk_per_user(sf_dir: str):
    """Top-3 purchases by value per user (grouped top-k): bucketed keyed
    shuffle + one vectorized pandas sort/head per bucket."""
    import pandas as pd

    n_buckets = adaptive_buckets(_nrows(sf_dir, "events"))

    def add_bucket(tbl: pa.Table) -> pa.Table:
        t = tbl.filter(pc.equal(tbl.column("event_type"), "purchase"))
        return t.append_column(
            "bucket", int_bucket(t.column("user_id"), n_buckets))

    def topk(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "value", "event_id"],
                          ascending=[True, False, True])
        out = g.groupby("user_id", sort=True).head(3)
        return pd.DataFrame({"user_id": out["user_id"].to_numpy(),
                             "event_id": out["event_id"].to_numpy(),
                             "value": out["value"].to_numpy()})

    return _read(sf_dir, "events", ["event_id", "user_id", "event_type",
                                    "value"]) \
        .map_batches(add_bucket, batch_format="pyarrow") \
        .groupby("bucket").map_groups(topk, batch_format="pandas")


SQL_TOPK_PER_USER = """SELECT user_id, event_id, value FROM events
WHERE event_type = 'purchase'
QUALIFY row_number() OVER (PARTITION BY user_id
                           ORDER BY value DESC, event_id) <= 3"""


def q_dedup_by_id(sf_dir: str):
    """ES create-op duplicate semantics over a synthetic id: the events
    `props.k` value plays Meta._id; first event per id (min by ts,
    event_id) survives."""
    from .textops.dedup import dedup_first_by_key
    chain = build_chain([{"decode_json_fields": {
        "fields": ["props"], "target": "", "expected_keys": ["k:int"]}}])

    def prep(tbl: pa.Table) -> pa.Table:
        t = chain(tbl)
        # rows with no id are excluded here (the engine-level
        # dedup_first_by_key would pass them through — ES semantics — but
        # the oracle's PARTITION BY would fold all NULLs into one group)
        t = t.filter(pc.is_valid(t.column("k")))
        return pa.table({"k": t.column("k"), "ts": t.column("ts"),
                         "event_id": t.column("event_id")})

    ds = _read(sf_dir, "events", ["event_id", "ts", "props"]) \
        .map_batches(prep, batch_format="pyarrow")
    out = dedup_first_by_key(ds, key="k", order_cols=("ts", "event_id"),
                             n_buckets=adaptive_buckets(
                                 _nrows(sf_dir, "events")))

    def project(tbl: pa.Table) -> pa.Table:
        return pa.table({"k": tbl.column("k"),
                         "event_id": tbl.column("event_id")})
    return out.map_batches(project, batch_format="pyarrow")


SQL_DEDUP_BY_ID = """SELECT CAST(json_extract_string(props, '$.k') AS BIGINT)
    AS k, event_id
FROM events
WHERE json_extract_string(props, '$.k') IS NOT NULL
QUALIFY row_number() OVER (PARTITION BY k ORDER BY ts, event_id) = 1"""


def q_ratelimit(sf_dir: str):
    """Keyed event-time token-bucket rate limiting over derived
    transcripts (1 turn/min per conversation), CO-PARTITIONED: conv_id
    hash-buckets shuffle so every key's rows meet exactly one bucket
    state — deterministic and key-exact, per the processor's own
    contract (``processors/ratelimit.py`` module docstring). Groups
    pre-sort on (conv_id, ts, turn_idx) so event-time ties break
    deterministically. Oracled by ``SQL_RATELIMIT`` (recursive-CTE token
    bucket, bit-identical double arithmetic); parity with a
    single-process application and run-to-run stability are also
    unit-tested (tests/test_stateful_ops.py)."""
    from .processors.ratelimit import RateLimit

    n_buckets = adaptive_buckets(2 * _nrows(sf_dir, "events"))

    def add_bucket(tbl: pa.Table) -> pa.Table:
        return tbl.append_column(
            "bucket", fnv1a_bucket(tbl.column("conv_id"), n_buckets))

    def limit(group: pa.Table) -> pa.Table:
        rl = RateLimit(limit="1/m", fields=["conv_id"])
        g = group.drop_columns(["bucket"]).sort_by(
            [("conv_id", "ascending"), ("ts", "ascending"),
             ("turn_idx", "ascending")])
        return rl.apply(g)

    return read_transcripts(sf_dir) \
        .map_batches(add_bucket, batch_format="pyarrow") \
        .groupby("bucket").map_groups(limit, batch_format="pyarrow")


# the 1/m-per-conv token bucket IS SQL-expressible after all (round-2
# verdict #7): with burst=1 the per-key state is a single (tokens, last)
# recurrence, stepped by a recursive CTE one turn-rank per iteration —
# identical IEEE double ops in the same order as RateLimit.apply, so the
# keep decisions bit-match (verified at sf0.001 and sf0.01)
SQL_RATELIMIT = _T.replace("WITH ", "WITH RECURSIVE ", 1) + r""",
tt AS (
  SELECT conv_id, turn_idx, role, text, tool, ts,
         row_number() OVER (PARTITION BY conv_id
                            ORDER BY ts, turn_idx) AS rn,
         epoch_us(ts) / 1000000.0 AS sec
  FROM transcripts),
rec AS (
  SELECT conv_id, rn, sec, CAST(0.0 AS DOUBLE) AS tokens, TRUE AS keep
  FROM tt WHERE rn = 1
  UNION ALL
  SELECT tt.conv_id, tt.rn, tt.sec,
    CASE WHEN LEAST(1.0, rec.tokens + (tt.sec - rec.sec) * (1.0/60.0))
              >= 1.0
         THEN LEAST(1.0, rec.tokens + (tt.sec - rec.sec) * (1.0/60.0))
              - 1.0
         ELSE LEAST(1.0, rec.tokens + (tt.sec - rec.sec) * (1.0/60.0))
         END,
    LEAST(1.0, rec.tokens + (tt.sec - rec.sec) * (1.0/60.0)) >= 1.0
  FROM rec JOIN tt ON tt.conv_id = rec.conv_id AND tt.rn = rec.rn + 1)
SELECT t.conv_id, t.turn_idx, t.role, t.text, t.tool, t.ts
FROM rec JOIN tt t ON t.conv_id = rec.conv_id AND t.rn = rec.rn
WHERE rec.keep"""


def q_corpus_prep(sf_dir: str):
    """Composed training-data prep: quality filter → exact dedup (keep
    min doc_id per content hash) → per-survivor token stats. All narrow
    except the one dedup groupby on fixed-width hash rows."""
    from .textops.analysis import TOKEN_RE

    def score_and_hash(tbl: pa.Table) -> pa.Table:
        text = tbl.column("text")
        n_chars = pc.cast(pc.utf8_length(text), pa.float64())
        n_tokens = pc.cast(pc.count_substring_regex(text, TOKEN_RE),
                           pa.float64())
        n_alpha = pc.cast(pc.count_substring_regex(text, r"[A-Za-z]"),
                          pa.float64())
        alpha_ratio = pc.divide(n_alpha, pc.max_element_wise(n_chars, 1.0))
        keep = pc.and_(pc.greater_equal(n_tokens, 5.0),
                       pc.greater_equal(alpha_ratio, 0.5))
        t = tbl.filter(pc.fill_null(keep, False))
        from .textops.dedup import _md5_column
        h = _md5_column(t.column("text").to_pylist())
        toks = pc.cast(pc.count_substring_regex(t.column("text"), TOKEN_RE),
                       pa.int64())
        return pa.table({"doc_id": t.column("doc_id"),
                         "h": h,
                         "n_tokens": toks})

    from ray.data.aggregate import Count, Min
    scored = _read(sf_dir, "documents", ["doc_id", "text"], blocks=16) \
        .map_batches(score_and_hash, batch_format="pyarrow")
    groups = scored.groupby("h").aggregate(
        Min("doc_id", alias_name="doc_id"),
        Min("n_tokens", alias_name="n_tokens"),
        Count(alias_name="dups"))

    def project(tbl: pa.Table) -> pa.Table:
        return pa.table({"doc_id": tbl.column("doc_id"),
                         "n_tokens": tbl.column("n_tokens"),
                         "dups": tbl.column("dups")})
    return groups.map_batches(project, batch_format="pyarrow")


SQL_CORPUS_PREP = r"""WITH f AS (
  SELECT doc_id, text,
    CAST(length(regexp_extract_all(text, '[a-zA-Z0-9]+')) AS DOUBLE)
      AS n_tokens,
    CAST(length(regexp_extract_all(text, '[A-Za-z]')) AS DOUBLE) /
      GREATEST(CAST(length(text) AS DOUBLE), 1.0) AS alpha_ratio
  FROM documents),
kept AS (SELECT * FROM f WHERE n_tokens >= 5 AND alpha_ratio >= 0.5)
SELECT MIN(doc_id) AS doc_id,
       MIN(CAST(n_tokens AS BIGINT)) AS n_tokens,
       COUNT(*) AS dups
FROM kept GROUP BY md5(text)"""


def q_knn_ivf(sf_dir: str):
    """IVF ANN: k-means coarse quantizer (driver-side sample), per-batch
    centroid assignment, probe-limited exact search. Approximate (nprobe
    < n_centroids) → rows-only check; exactness vs brute force when
    probing all lists is unit-tested."""
    import numpy as np
    import pyarrow.dataset as pads

    from .textops.knn import IvfIndex
    qt = pads.dataset(f"{sf_dir}/embeddings.parquet").to_table(
        filter=pc.field("vec_id") < 3).sort_by("vec_id")
    queries = np.array(qt.column("embedding").to_pylist(), dtype=np.float64)
    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"], blocks=16)
    index = IvfIndex.build(ds, n_centroids=16, seed=7)
    return index.search(ds, queries, qt.column("vec_id").to_pylist(),
                        k=5, nprobe=4)


def q_knn_ivf_full(sf_dir: str):
    """IVF ANN probing ALL centroid lists — exactly brute force, so the
    brute-force SQL oracle applies bit-for-bit (the exactness property
    the approximate q_knn_ivf relies on, now oracle-checked instead of
    only unit-tested)."""
    import numpy as np
    import pyarrow.dataset as pads

    from .textops.knn import IvfIndex
    qt = pads.dataset(f"{sf_dir}/embeddings.parquet").to_table(
        filter=pc.field("vec_id") < 3).sort_by("vec_id")
    queries = np.array(qt.column("embedding").to_pylist(), dtype=np.float64)
    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"], blocks=16)
    index = IvfIndex.build(ds, n_centroids=16, seed=7)
    return index.search(ds, queries, qt.column("vec_id").to_pylist(),
                        k=5, nprobe=16)


def _planted_embeddings(ids: "np.ndarray", m: "np.ndarray"):
    """Deterministic near-dup planting (the fixture has no natural
    cos ≥ 0.9 pairs — max off-diagonal cosine is ~0.51, which made the
    round-1 oracle vacuous): every vec_id < 50 gains a scaled copy
    (id + 100000, vector × 1.25 — cosine exactly 1 to fp). The SAME
    augmentation is expressed in the oracle SQL via list_transform, so
    the ≥ 0.9 predicate now must find exactly the planted pairs."""
    import numpy as np
    sel = ids < 50
    return (np.concatenate([ids, ids[sel] + 100000]),
            np.vstack([m, m[sel] * 1.25]))


def q_embed_neardup_sample(sf_dir: str):
    """Embedding-cosine near-duplicate pairs (cos ≥ 0.9) on a bounded
    sample (vec_id < 300, plus planted near-dup copies) — exact,
    SQL-oracled. One numpy matmul per batch pair; the unbounded-scale
    path is q_embed_neardup_lsh."""
    import numpy as np
    import pyarrow.dataset as pads

    t = pads.dataset(f"{sf_dir}/embeddings.parquet").to_table(
        filter=pc.field("vec_id") < 300).sort_by("vec_id")
    ids = np.asarray(t.column("vec_id").to_pylist(), dtype=np.int64)
    m = np.array(t.column("embedding").to_pylist(), dtype=np.float64)
    ids, m = _planted_embeddings(ids, m)
    mn = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-30)
    sims = mn @ mn.T
    ai, bi = np.nonzero(np.triu(sims >= 0.9, k=1))
    a, b = ids[ai], ids[bi]
    lo, hi = np.minimum(a, b), np.maximum(a, b)
    return pa.table({"a": pa.array(lo, pa.int64()),
                     "b": pa.array(hi, pa.int64())})


_EMBED_AUGMENT_SQL = """base AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
  FROM embeddings {where}),
planted AS (
  SELECT vec_id + 100000 AS vec_id, list_transform(v, x -> x * 1.25) AS v
  FROM base WHERE vec_id < 50),
e AS (SELECT vec_id, v FROM base UNION ALL SELECT vec_id, v FROM planted)"""

SQL_EMBED_NEARDUP_SAMPLE = f"""WITH {_EMBED_AUGMENT_SQL.format(
    where='WHERE vec_id < 300')}
SELECT LEAST(x.vec_id, y.vec_id) AS a, GREATEST(x.vec_id, y.vec_id) AS b
FROM e x, e y
WHERE x.vec_id < y.vec_id
  AND list_cosine_similarity(x.v, y.v) >= 0.9"""


def q_embed_neardup_lsh(sf_dir: str):
    """Scale path for embedding near-dup: BANDED random-hyperplane LSH
    (4 independent tables) with an input-ADAPTIVE plane count —
    ``n_planes`` grows log2 with the corpus so expected bucket
    population stays ≈128 and the in-bucket O(b²) cosine verify stays
    bounded at any scale (round-2's fixed 10-plane bucketer was the
    last fixed-cardinality shuffle). Degenerate buckets cap at
    ``max_bucket`` with cosine-verified star links to the bucket hub.
    SQL-oracled against the exhaustive O(n²) predicate: the planted
    pairs (scaled copies → identical hyperplane signs in EVERY band)
    always co-bucket, and no natural pair reaches cos 0.9 in this
    fixture, so the probabilistic bucketing provably recovers the full
    answer here."""
    import numpy as np
    import pandas as pd

    from .textops.knn import LshBucketer, _matrix
    import pyarrow.parquet as pq_mod
    dim = len(pq_mod.read_table(f"{sf_dir}/embeddings.parquet",
                                columns=["embedding"]).column(0)[0])
    nrows = _nrows(sf_dir, "embeddings") + 50  # + planted copies
    n_bands = 4
    max_bucket = 2048
    bucketer = LshBucketer(
        dim=dim, seed=99, n_bands=n_bands,
        n_planes=LshBucketer.adaptive_planes(nrows, target_bucket=128))
    # coarsen the (band, bucket) shuffle with input-scaled cardinality
    n_buckets = adaptive_buckets(n_bands * nrows)
    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"], blocks=16)

    def augment(tbl: pa.Table) -> pa.Table:
        ids = np.asarray(tbl.column("vec_id").to_pylist(), dtype=np.int64)
        m = _matrix(tbl.column("embedding"))
        ids, m = _planted_embeddings(ids, m)
        return pa.table({
            "vec_id": pa.array(ids, pa.int64()),
            "embedding": pa.array(m.tolist(), pa.list_(pa.float64()))})

    def with_vec(tbl: pa.Table) -> pa.Table:
        out = bucketer(tbl)  # n_bands rows per vector, id-major order
        idx = np.repeat(np.arange(tbl.num_rows, dtype=np.int64),
                        bucketer.n_bands)
        emb = tbl.column("embedding").take(pa.array(idx, pa.int64()))
        out = out.append_column("embedding", emb)
        key = pc.bit_wise_xor(
            pc.multiply(pc.cast(out.column("band"), pa.int64()), 1_000_003),
            out.column("bucket"))
        return out.append_column(
            "sbucket",
            int_bucket(pc.bit_wise_and(key, 0x7FFFFFFFFFFFFFFF), n_buckets))

    bucketed = ds.map_batches(augment, batch_format="pyarrow") \
        .map_batches(with_vec, batch_format="pyarrow")

    def verify(g: pd.DataFrame) -> pd.DataFrame:
        out_a: list = []
        out_b: list = []
        for _, sub in g.groupby(["band", "bucket"], sort=False):
            if len(sub) < 2:
                continue
            sub = sub.sort_values("vec_id")
            head = sub.head(max_bucket)
            ids = head["vec_id"].to_numpy()
            m = np.array(list(head["embedding"]), dtype=np.float64)
            mn = m / np.maximum(
                np.linalg.norm(m, axis=1, keepdims=True), 1e-30)
            sims = mn @ mn.T
            ai, bi = np.nonzero(np.triu(sims >= 0.9, k=1))
            out_a.append(ids[ai])
            out_b.append(ids[bi])
            if len(sub) > max_bucket:
                # over-cap members: exact-cosine star links vs the hub
                # (linear) keep them reachable through clustering
                extras = sub.iloc[max_bucket:]
                em = np.array(list(extras["embedding"]), dtype=np.float64)
                emn = em / np.maximum(
                    np.linalg.norm(em, axis=1, keepdims=True), 1e-30)
                s = emn @ mn[0]
                hit = s >= 0.9
                out_a.append(np.full(int(hit.sum()), ids[0]))
                out_b.append(extras["vec_id"].to_numpy()[hit])
        if not out_a:
            return pd.DataFrame({"a": pd.array([], dtype="int64"),
                                 "b": pd.array([], dtype="int64")})
        a = np.concatenate(out_a).astype("int64")
        b = np.concatenate(out_b).astype("int64")
        lo, hi = np.minimum(a, b), np.maximum(a, b)
        return pd.DataFrame({"a": lo, "b": hi})

    cand = bucketed.groupby("sbucket").map_groups(verify,
                                                  batch_format="pandas")
    # a pair found in several bands must emit once
    from ray.data.aggregate import Count
    deduped = cand.groupby(["a", "b"]).aggregate(Count(alias_name="nb"))

    def project(tbl: pa.Table) -> pa.Table:
        return pa.table({"a": tbl.column("a"), "b": tbl.column("b")})
    return deduped.map_batches(project, batch_format="pyarrow")


SQL_EMBED_NEARDUP_LSH = f"""WITH {_EMBED_AUGMENT_SQL.format(where='')}
SELECT LEAST(x.vec_id, y.vec_id) AS a, GREATEST(x.vec_id, y.vec_id) AS b
FROM e x, e y
WHERE x.vec_id < y.vec_id
  AND list_cosine_similarity(x.v, y.v) >= 0.9"""


# ------------------------------------------------------ relational demos

def _combine_partials(ds, keys: list[str], sums: dict[str, str],
                      seed: pa.Table | None = None) -> pa.Table:
    """Collect tiny per-batch partial aggregates and combine them with one
    driver-side arrow group_by (a handful of rows per batch — no
    distributed shuffle needed). ``seed`` (zero rows to add into the
    sums) keeps fixed-row reports well-defined when the upstream
    filters everything out — without it an empty stream cannot even
    be concatenated."""
    tables = list(ds.iter_batches(batch_size=None, batch_format="pyarrow"))
    if seed is not None:
        tables.append(seed)
    merged = pa.concat_tables(tables)
    agg = merged.group_by(keys).aggregate(
        [(src, "sum") for src in sums])
    cols = {k: agg.column(k) for k in keys}
    cols.update({out: agg.column(f"{src}_sum")
                 for src, out in sums.items()})
    return pa.table(cols)


def q_agg_lineitem(sf_dir: str):
    ds = _read(sf_dir, "lineitem",
               ["l_returnflag", "l_linestatus", "l_quantity"])
    keys = ["l_returnflag", "l_linestatus"]

    def partial(tbl: pa.Table) -> pa.Table:
        g = tbl.group_by(keys).aggregate([("l_quantity", "sum"),
                                          ("l_quantity", "count")])
        return pa.table({
            "l_returnflag": g.column("l_returnflag"),
            "l_linestatus": g.column("l_linestatus"),
            "sum_qty": g.column("l_quantity_sum"),
            "n": pc.cast(g.column("l_quantity_count"), pa.int64())})

    small = ds.map_batches(partial, batch_format="pyarrow")
    return _combine_partials(small, keys, {"sum_qty": "sum_qty", "n": "n"})


SQL_AGG_LINEITEM = ("SELECT l_returnflag, l_linestatus, "
                    "SUM(l_quantity) AS sum_qty, COUNT(*) AS n "
                    "FROM lineitem GROUP BY l_returnflag, l_linestatus")


def q_mktsegment_counts(sf_dir: str):
    side = pq.read_table(f"{sf_dir}/customer.parquet",
                         columns=["c_custkey", "c_mktsegment"])
    side = side.rename_columns(["o_custkey", "c_mktsegment"])
    enr = Enricher(rows=side, key_fields=("o_custkey",), target_prefix="",
                   miss_flag=False)

    def partial(tbl: pa.Table) -> pa.Table:
        t = enr(tbl)
        # inner-join mirror: enrich misses (null segment) must not
        # form a group the oracle's JOIN would drop
        t = t.filter(pc.is_valid(t.column("c_mktsegment")))
        g = t.group_by("c_mktsegment").aggregate([("o_custkey", "count")])
        return pa.table({"c_mktsegment": g.column("c_mktsegment"),
                         "n": pc.cast(g.column("o_custkey_count"),
                                      pa.int64())})

    small = _read(sf_dir, "orders", ["o_custkey"]) \
        .map_batches(partial, batch_format="pyarrow")
    return _combine_partials(small, ["c_mktsegment"], {"n": "n"})


SQL_MKTSEGMENT_COUNTS = ("SELECT c_mktsegment, COUNT(*) AS n FROM orders "
                         "JOIN customer ON o_custkey = c_custkey "
                         "GROUP BY c_mktsegment")


def q_distinct_langs(sf_dir: str):
    """Distinct values (ds.unique — a set-op shuffle) with counts."""
    from ray.data.aggregate import Count
    return _read(sf_dir, "documents", ["lang"]) \
        .groupby("lang").aggregate(Count(alias_name="n"))


SQL_DISTINCT_LANGS = ("SELECT lang, COUNT(*) AS n FROM documents "
                      "GROUP BY lang")


def q_top10_orders(sf_dir: str):
    return _read(sf_dir, "orders", ["o_orderkey", "o_totalprice"]) \
        .sort("o_totalprice", descending=True).limit(10)


SQL_TOP10_ORDERS = ("SELECT o_orderkey, o_totalprice FROM orders "
                    "ORDER BY o_totalprice DESC LIMIT 10")


# --------------------------------------------- rows-only (no SQL oracle)

def q_lang_id(sf_dir: str):
    from .textops.analysis import LangId
    return _read(sf_dir, "documents", ["doc_id", "text"], blocks=16) \
        .map_batches(LangId(), batch_format="pyarrow")


# the stopword-profile heuristic is exactly SQL-expressible: distinct
# [a-z]+ tokens ∩ each profile, argmax with first-in-order tie-breaking
# (the CASE chain implements "first strict max" en>es>de>fr), the zh
# branch via the >30% non-ascii test — full oracle, not rows-only
SQL_LANG_ID = r"""WITH f AS (
  SELECT doc_id, text,
    len(regexp_extract_all(text, '[^\x00-\x7F]')) AS n_na,
    length(text) AS n_ch,
    list_distinct(regexp_extract_all(lower(text), '[a-z]+')) AS toks
  FROM documents),
c AS (SELECT doc_id, n_na, n_ch,
  len(list_intersect(toks, ['the','and','of','a','to','in','is','it',
                            'for','on'])) AS en,
  len(list_intersect(toks, ['el','la','de','que','y','en','un','los',
                            'se','no'])) AS es,
  len(list_intersect(toks, ['der','die','und','das','in','von','zu',
                            'den','mit','ist'])) AS de,
  len(list_intersect(toks, ['le','la','de','et','les','des','un','une',
                            'du','est'])) AS fr
  FROM f)
SELECT doc_id, CASE
  WHEN n_na > 0.3 * n_ch THEN 'zh'
  WHEN en = 0 AND es = 0 AND de = 0 AND fr = 0 THEN 'und'
  WHEN en >= es AND en >= de AND en >= fr THEN 'en'
  WHEN es >= de AND es >= fr THEN 'es'
  WHEN de >= fr THEN 'de'
  ELSE 'fr' END AS lang_pred
FROM c"""


def q_simhash(sf_dir: str):
    from .textops.dedup import SimHasher
    return _read(sf_dir, "documents", ["doc_id", "text"], blocks=16) \
        .map_batches(SimHasher(), batch_format="pyarrow")


def q_minhash_pairs(sf_dir: str):
    """MinHash-LSH candidates → exact jaccard verify. ORACLE NOTE: the
    SQL oracle is the EXHAUSTIVE all-pairs 8-shingle jaccard ≥ 0.5 set;
    the seeded LSH recovers it completely on this corpus (verified
    bit-exact at sf0.001 and sf0.01 — planted dups sit near j≈0.97
    where 16×6-row band recall is ~1). A corpus with borderline ~0.5
    pairs would make LSH recall probabilistic and this oracle too
    strict; the recall floor is separately asserted in
    tests/test_dedup_recall.py."""
    from .textops.dedup import jaccard_verify, minhash_candidates
    n_docs = _nrows(sf_dir, "documents")
    docs = _read(sf_dir, "documents", ["doc_id", "text"], blocks=32)
    cand = minhash_candidates(docs, bands=16, num_hashes=96, shingle_k=8,
                              n_buckets=adaptive_buckets(16 * n_docs),
                              dedup=False)  # verify cogroup dedups
    return jaccard_verify(cand, docs, threshold=0.5,
                          n_buckets=adaptive_buckets(n_docs))


# exhaustive 8-char-shingle jaccard (== the engine's 8-BYTE shingles on
# this all-ASCII corpus; 64-bit shingle-hash collisions would be the
# only divergence and there are none)
_SQL_JACCARD_PAIRS_CTE = """
WITH {rec} pos AS (
  SELECT doc_id, text,
         unnest(generate_series(1, greatest(length(text) - 7, 1))) AS i
  FROM documents
), sh AS (
  SELECT DISTINCT doc_id, substr(text, i, 8) AS s FROM pos
), cnt AS (SELECT doc_id, count(*) AS c FROM sh GROUP BY doc_id),
inter AS (
  SELECT x.doc_id AS a, y.doc_id AS b, count(*) AS i
  FROM sh x JOIN sh y ON x.s = y.s AND x.doc_id < y.doc_id
  GROUP BY 1, 2),
jpairs AS (
  SELECT inter.a, inter.b,
         CAST(i AS DOUBLE) / CAST(ca.c + cb.c - i AS DOUBLE) AS jaccard
  FROM inter JOIN cnt ca ON ca.doc_id = inter.a
             JOIN cnt cb ON cb.doc_id = inter.b
  WHERE CAST(i AS DOUBLE) / CAST(ca.c + cb.c - i AS DOUBLE) >= 0.5)
"""

SQL_MINHASH_PAIRS = _SQL_JACCARD_PAIRS_CTE.format(rec="") + \
    "SELECT a, b, jaccard FROM jpairs"


def q_simhash_neardup(sf_dir: str):
    from .textops.dedup import simhash_near_dup_pairs
    return simhash_near_dup_pairs(
        _read(sf_dir, "documents", ["doc_id", "text"], blocks=16),
        max_hamming=3,
        n_buckets=adaptive_buckets(4 * _nrows(sf_dir, "documents")))


def q_simhash_groups(sf_dir: str):
    """Hamming-0 simhash duplicate groups. The fixture has almost no
    natural simhash collisions (round 1: a single 1-row result asserted
    nothing), so every doc_id < 25 gains an exact-copy row
    (doc_id + 1_000_000) — the planted identical-text classes must all
    surface as groups with ≥ 2 members."""
    from .textops.dedup import simhash_duplicate_groups

    def augment(tbl: pa.Table) -> pa.Table:
        sel = tbl.filter(pc.less(tbl.column("doc_id"), 25))
        if sel.num_rows == 0:
            return tbl
        planted = pa.table({
            "doc_id": pc.add(sel.column("doc_id"), 1_000_000),
            "text": sel.column("text")})
        return pa.concat_tables([tbl.select(["doc_id", "text"]), planted])

    ds = _read(sf_dir, "documents", ["doc_id", "text"], blocks=16) \
        .map_batches(augment, batch_format="pyarrow")
    return simhash_duplicate_groups(ds)


def q_dedup_clusters(sf_dir: str):
    """End-to-end near-dup clustering: minhash candidates → jaccard
    verify → distributed connected components → (node, cluster) ids."""
    from .textops.dedup import (duplicate_clusters, jaccard_verify,
                                minhash_candidates)
    n_docs = _nrows(sf_dir, "documents")
    docs = _read(sf_dir, "documents", ["doc_id", "text"], blocks=16)
    cand = minhash_candidates(docs,
                              n_buckets=adaptive_buckets(16 * n_docs),
                              dedup=False)  # verify cogroup dedups
    pairs = jaccard_verify(cand, docs, threshold=0.5,
                           n_buckets=adaptive_buckets(n_docs))
    return duplicate_clusters(pairs,
                              n_buckets=adaptive_buckets(n_docs, lo=32))


# connected components as a recursive transitive closure over the
# exhaustive jaccard pair set (tiny planted components keep the closure
# bounded); cluster = min reachable node id, matching
# duplicate_clusters' canonical label
SQL_DEDUP_CLUSTERS = _SQL_JACCARD_PAIRS_CTE.format(rec="RECURSIVE") + """,
edges AS (SELECT a AS u, b AS v FROM jpairs
          UNION ALL SELECT b, a FROM jpairs),
reach(node, r) AS (
  SELECT DISTINCT u, u FROM edges
  UNION
  SELECT reach.node, e.v FROM reach JOIN edges e ON e.u = reach.r
)
SELECT node, MIN(r) AS cluster FROM reach GROUP BY node"""


def q_rolling_fingerprint(sf_dir: str):
    from .textops.analysis import rolling_fingerprint
    return _read(sf_dir, "documents", ["doc_id", "text"], blocks=16) \
        .map_batches(rolling_fingerprint, batch_format="pyarrow")


def q_approx_distinct_users(sf_dir: str):
    """HyperLogLog approximate COUNT(DISTINCT user_id): fixed-size
    register partials per batch, bounded driver merge. Rows-only check
    (the estimate is approximate by construction); accuracy vs exact is
    asserted in tests/test_sketches.py (<5% at this scale, ~0.8% rse)."""
    from .textops.sketches import approx_distinct
    est = approx_distinct(_read(sf_dir, "events", ["user_id"], blocks=8),
                          "user_id", p=14)
    return pa.table({"metric": pa.array(["approx_distinct_users"],
                                        pa.string()),
                     "estimate": pa.array([float(est)], pa.float64())})


def q_media_features(sf_dir: str):
    """Multimodal actor-pool stage over a media table DERIVED from
    ``documents`` (payload = UTF-8 text bytes) so the deterministic
    decode stub — sha256-digest features — is fully SQL-expressible and
    the query gets a real value oracle. The feature vector is flattened
    to scalar columns f0..f7 for the driver compare (its sorted value
    hash needs sortable, non-nested columns); the library op keeps the
    ``list<float32>`` layout. The synth-payload variant stays covered in
    tests/test_stateful_ops.py."""
    import numpy as np

    from .textops.multimodal import extract_media_features

    _kinds = np.array(["image", "audio", "video"])

    def to_media(t: pa.Table) -> pa.Table:
        did = t.column("doc_id").to_numpy(zero_copy_only=False)
        return pa.table({
            "media_id": t.column("doc_id"),
            "kind": pa.array(_kinds[did % 3], pa.string()),
            "payload": pc.cast(t.column("text"), pa.binary()),
        })

    def flatten(t: pa.Table) -> pa.Table:
        feats = t.column("features").combine_chunks()
        arr = feats.flatten().to_numpy(zero_copy_only=False) \
            .reshape(len(t), -1)
        cols = {"media_id": t.column("media_id"), "kind": t.column("kind")}
        for i in range(arr.shape[1]):
            cols[f"f{i}"] = pa.array(arr[:, i], pa.float32())
        return pa.table(cols)

    media = _read(sf_dir, "documents", ["doc_id", "text"], blocks=8) \
        .map_batches(to_media, batch_format="pyarrow")
    return extract_media_features(media, concurrency=2, batch_size=64) \
        .map_batches(flatten, batch_format="pyarrow")


def _sha_u32(i: int) -> str:
    """SQL for the little-endian uint32 at digest bytes [4i, 4i+4)."""
    return "(" + " + ".join(
        f"CAST('0x' || substr(hex, {2 * (4 * i + k) + 1}, 2) AS BIGINT)"
        f" * {256 ** k}" for k in range(4)) + ")"


# the decode stub: feature[i] = float32(u32_le(sha256(payload), i) %
# 1000) / float32(1000) — DuckDB FLOAT division is the same IEEE f32 op
SQL_MEDIA_FEATURES = """
WITH m AS (
  SELECT doc_id AS media_id,
         CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'image'
              WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
         sha256(text) AS hex
  FROM documents)
SELECT media_id, kind, {feats} FROM m
""".format(feats=", ".join(
    f"CAST({_sha_u32(i)} % 1000 AS FLOAT) / CAST(1000 AS FLOAT) AS f{i}"
    for i in range(8)))


# ------------------------------------------------------- temporal joins

def q_asof_join(sf_dir: str):
    """Backward as-of join: each purchase event gets the latest prior
    error event for the same user (state-enrich at event time — the
    classic as-of shape). One keyed shuffle; vectorized merge kernel
    (raybeats/joins.py). (user_id, ts) is collision-free in this corpus
    at every sf (checked), so no tie-break is needed for determinism."""
    from .joins import asof_join

    nb = adaptive_buckets(_nrows(sf_dir, "events"))

    def split(t: pa.Table):
        # both sides slice the SAME scan → single-scan asof_join mode
        p = t.filter(pc.equal(t.column("event_type"), "purchase")) \
            .select(["event_id", "ts", "user_id", "value"]) \
            .rename_columns(["event_id", "ts", "user_id",
                             "purchase_value"])
        e = t.filter(pc.equal(t.column("event_type"), "error")) \
            .select(["ts", "user_id", "value"])
        return p, e

    ev = _read(sf_dir, "events",
               ["event_id", "ts", "user_id", "event_type", "value"])
    return asof_join(ev, on="ts", by="user_id", split=split,
                     right_cols={"ts": "err_ts", "value": "err_value"},
                     direction="backward", how="left", n_buckets=nb)


SQL_ASOF_JOIN = """
SELECT l.event_id, l.ts, l.user_id, l.value AS purchase_value,
       r.ts AS err_ts, r.value AS err_value
FROM (SELECT * FROM events WHERE event_type = 'purchase') l
ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'error') r
  ON l.user_id = r.user_id AND l.ts >= r.ts
"""


def q_asof_forward(sf_dir: str):
    """FORWARD as-of join with a tolerance: each error event gets the
    user's NEXT purchase, but only if it lands within one hour —
    the time-to-recovery / conversion-after-failure shape. Exercises
    the asof operator's forward direction and tolerance gate (a match
    farther than the tolerance nulls out rather than falling back to
    a later one — nearest-only semantics, like the SQL mirror's CASE
    over DuckDB's forward ASOF JOIN). Same single-scan split and
    keyed-shuffle shape as ``asof_join``."""
    from .joins import asof_join

    nb = adaptive_buckets(_nrows(sf_dir, "events"))

    def split(t: pa.Table):
        e = t.filter(pc.equal(t.column("event_type"), "error")) \
            .select(["event_id", "ts", "user_id"])
        p = t.filter(pc.equal(t.column("event_type"), "purchase")) \
            .select(["ts", "user_id", "value"])
        return e, p

    ev = _read(sf_dir, "events",
               ["event_id", "ts", "user_id", "event_type", "value"])
    return asof_join(ev, on="ts", by="user_id", split=split,
                     right_cols={"ts": "next_ts", "value": "next_value"},
                     direction="forward", tolerance_us=3_600_000_000,
                     how="left", n_buckets=nb)


SQL_ASOF_FORWARD = """
SELECT l.event_id, l.ts, l.user_id,
       CASE WHEN r.ts - l.ts <= INTERVAL 1 HOUR THEN r.ts END
         AS next_ts,
       CASE WHEN r.ts - l.ts <= INTERVAL 1 HOUR THEN r.value END
         AS next_value
FROM (SELECT * FROM events WHERE event_type = 'error') l
ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') r
  ON l.user_id = r.user_id AND l.ts <= r.ts
"""


_VALUE_BANDS = [("micro", 0.0, 15.0), ("low", 10.0, 60.0),
                ("mid", 50.0, 130.0), ("high", 120.0, 1_000_000.0)]


def q_range_join(sf_dir: str):
    """Range join events to OVERLAPPING value bands (one output row per
    containing band — a true interval join, not binning). The band
    table broadcasts once; no shuffle (raybeats/joins.py)."""
    from .joins import range_join_broadcast

    bands = pa.table({
        "band": pa.array([b[0] for b in _VALUE_BANDS], pa.string()),
        "lo": pa.array([b[1] for b in _VALUE_BANDS], pa.float64()),
        "hi": pa.array([b[2] for b in _VALUE_BANDS], pa.float64())})
    ev = _read(sf_dir, "events", ["event_id", "value"])
    return range_join_broadcast(ev, bands, value_col="value",
                                closed="left")


SQL_RANGE_JOIN = """
SELECT e.event_id, e.value, b.band, b.lo, b.hi
FROM events e JOIN (
  SELECT * FROM (VALUES {bands}) t(band, lo, hi)) b
  ON e.value >= b.lo AND e.value < b.hi
""".format(bands=", ".join(
    f"('{n}', CAST({lo} AS DOUBLE), CAST({hi} AS DOUBLE))"
    for n, lo, hi in _VALUE_BANDS))


def q_hash_join_rows(sf_dir: str):
    """Row-level large×large equi-join: every lineitem of a
    high-value order, via ONE native hash-shuffle join
    (:func:`raybeats.joins.hash_join`), partitions sized to the input.
    Both reads are column-pruned; the orders side filters BEFORE the
    join so only matching keys enter the exchange."""
    from .joins import hash_join

    li = _read(sf_dir, "lineitem",
               ["l_orderkey", "l_linenumber", "l_extendedprice"])
    orders = _read(sf_dir, "orders",
                   ["o_orderkey", "o_totalprice", "o_orderpriority"]) \
        .map_batches(lambda t: t.filter(
            pc.greater(t.column("o_totalprice"), 250_000.0)),
            batch_format="pyarrow")
    # partition count from parquet footers (metadata-only): counting
    # the filtered side would execute the filter once just for sizing
    nparts = adaptive_buckets(
        _nrows(sf_dir, "lineitem") + _nrows(sf_dir, "orders"),
        target_rows=500_000, lo=4, hi=1 << 16)
    out = hash_join(li, orders, on="l_orderkey", right_on="o_orderkey",
                    how="inner", num_partitions=nparts)
    return out.select_columns(["l_orderkey", "l_linenumber",
                               "l_extendedprice", "o_totalprice",
                               "o_orderpriority"])


SQL_HASH_JOIN_ROWS = """
SELECT l_orderkey, l_linenumber, l_extendedprice, o_totalprice,
       o_orderpriority
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE o_totalprice > 250000.0"""


def q_join_revenue(sf_dir: str):
    """Join-then-aggregate (TPC-H-Q3-ish): revenue per order priority
    over completed orders. hash_join exchanges both large tables once;
    revenue is per-row floor-cents int64 so the distributed sum is
    exact and associative (float sums are order-dependent and would
    break the driver's value hash); the groupby is per-batch partials
    + tiny driver combine — only (batch × priority) rows move after
    the join."""
    from .joins import hash_join

    li = _read(sf_dir, "lineitem",
               ["l_orderkey", "l_extendedprice", "l_discount"])
    orders = _read(sf_dir, "orders", ["o_orderkey", "o_orderstatus",
                                      "o_orderpriority"]) \
        .map_batches(lambda t: t.filter(
            pc.equal(t.column("o_orderstatus"), "F"))
            .drop_columns(["o_orderstatus"]), batch_format="pyarrow")
    nparts = adaptive_buckets(
        _nrows(sf_dir, "lineitem") + _nrows(sf_dir, "orders"),
        target_rows=500_000, lo=4, hi=1 << 16)
    joined = hash_join(li, orders, on="l_orderkey",
                       right_on="o_orderkey", how="inner",
                       num_partitions=nparts)

    def partial(t: pa.Table) -> pa.Table:
        import numpy as np
        ep = t.column("l_extendedprice").to_numpy(zero_copy_only=False)
        disc = t.column("l_discount").to_numpy(zero_copy_only=False)
        cents = np.floor(ep * (1.0 - disc) * 100.0).astype(np.int64)
        tt = pa.table({"o_orderpriority": t.column("o_orderpriority"),
                       "rev": pa.array(cents, pa.int64())})
        g = tt.group_by(["o_orderpriority"]).aggregate(
            [("rev", "sum"), ("rev", "count")])
        return pa.table({
            "o_orderpriority": g.column("o_orderpriority"),
            "revenue_cents": g.column("rev_sum"),
            "n_items": pc.cast(g.column("rev_count"), pa.int64())})

    small = joined.map_batches(partial, batch_format="pyarrow")
    return _combine_partials(small, ["o_orderpriority"],
                             {"revenue_cents": "revenue_cents",
                              "n_items": "n_items"})


SQL_JOIN_REVENUE = """
SELECT o_orderpriority,
       CAST(SUM(CAST(FLOOR(l_extendedprice * (1 - l_discount) * 100.0)
                     AS BIGINT)) AS BIGINT) AS revenue_cents,
       COUNT(*) AS n_items
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE o_orderstatus = 'F'
GROUP BY o_orderpriority"""


def q_quantiles(sf_dir: str):
    """Exact p50/p95/p99 of the (cent-quantized) event value per
    event_type with NO global sort: per-batch (key, quantum, count)
    pre-aggregation bounds the keyed shuffle by value range ×
    precision, never corpus size (raybeats/aggregates.py)."""
    from .aggregates import grouped_exact_quantiles
    return grouped_exact_quantiles(
        _read(sf_dir, "events", ["event_type", "value"]),
        value_col="value", by="event_type", qs=(0.5, 0.95, 0.99))


SQL_QUANTILES = """
WITH c AS (SELECT event_type,
                  CAST(FLOOR(value * 100) AS BIGINT) AS q FROM events),
g AS (SELECT event_type, q, COUNT(*) AS cnt FROM c
      GROUP BY event_type, q),
s AS (SELECT event_type, q,
        SUM(cnt) OVER (PARTITION BY event_type ORDER BY q) AS cum,
        SUM(cnt) OVER (PARTITION BY event_type) AS total FROM g)
SELECT event_type, CAST(MAX(total) AS BIGINT) AS n,
  CAST(MIN(CASE WHEN cum >= CEIL(0.5 * total) THEN q END)
       AS BIGINT) AS p50_cents,
  CAST(MIN(CASE WHEN cum >= CEIL(0.95 * total) THEN q END)
       AS BIGINT) AS p95_cents,
  CAST(MIN(CASE WHEN cum >= CEIL(0.99 * total) THEN q END)
       AS BIGINT) AS p99_cents
FROM s GROUP BY event_type"""


def q_inverted_index(sf_dir: str):
    """Inverted-index statistics: per token, document frequency (df)
    and total term frequency (tf) over the corpus. Exactly-one-shuffle
    build: a document's rows live wholly inside one batch, so each
    batch's (token, docs-containing, occurrences) partial sums to the
    EXACT global df/tf — the groupby moves one row per
    (batch, distinct-token), never per token occurrence. Same
    tokenizer as ``token_topk`` ([a-z0-9]+ on lowered text)."""
    import re as re_mod

    import numpy as np
    from ray.data.aggregate import Sum
    tok_re = re_mod.compile(r"[a-z0-9]+")

    def partial(tbl: pa.Table) -> pa.Table:
        toks: list[str] = []
        idx: list[int] = []
        for i, t in enumerate(tbl.column("text").to_pylist()):
            f = tok_re.findall((t or "").lower())
            toks.extend(f)
            idx.extend([i] * len(f))
        if not toks:
            return pa.table({"token": pa.array([], pa.string()),
                             "df": pa.array([], pa.int64()),
                             "tf": pa.array([], pa.int64())})
        arr = np.array(toks, dtype=object)
        di = np.array(idx, np.int64)
        uniq_t, inv = np.unique(arr, return_inverse=True)
        tf = np.bincount(inv, minlength=len(uniq_t))
        # df: distinct (doc, token) pairs in this batch
        pairs = np.unique(di * len(uniq_t) + inv)
        df = np.bincount(pairs % len(uniq_t), minlength=len(uniq_t))
        return pa.table({
            "token": pa.array(uniq_t.tolist(), pa.string()),
            "df": pa.array(df.astype(np.int64), pa.int64()),
            "tf": pa.array(tf.astype(np.int64), pa.int64())})

    return _read(sf_dir, "documents", ["text"], blocks=16) \
        .map_batches(partial, batch_format="pyarrow") \
        .groupby("token").aggregate(Sum("df", alias_name="df"),
                                    Sum("tf", alias_name="tf"))


SQL_INVERTED_INDEX = r"""WITH toks AS (
  SELECT doc_id,
         unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS token
  FROM documents)
SELECT token, COUNT(DISTINCT doc_id) AS df,
       CAST(COUNT(*) AS BIGINT) AS tf
FROM toks GROUP BY token"""


def q_anti_join(sf_dir: str):
    """Dedup-against-a-reference-set: events whose user is NOT in the
    allowlist (customers of one segment). Large×large ANTI join — the
    right side moves as per-batch-deduped fixed-width keys through ONE
    bucketed-union shuffle; per-group test is one vectorized is_in
    (raybeats/joins.key_filter_join)."""
    from .joins import key_filter_join

    ev = _read(sf_dir, "events", ["event_id", "user_id"])
    allow = _read_dim(sf_dir, "customer", ["c_custkey", "c_mktsegment"]) \
        .map_batches(lambda t: t.filter(
            pc.equal(t.column("c_mktsegment"), "AUTOMOBILE"))
            .select(["c_custkey"]), batch_format="pyarrow")
    return key_filter_join(
        ev, allow, on="user_id", right_on="c_custkey", keep="anti",
        n_buckets=adaptive_buckets(_nrows(sf_dir, "events") +
                                   _nrows(sf_dir, "customer")))


SQL_ANTI_JOIN = """
SELECT event_id, user_id FROM events e
WHERE NOT EXISTS (SELECT 1 FROM customer c
                  WHERE c.c_custkey = e.user_id
                    AND c.c_mktsegment = 'AUTOMOBILE')"""


def q_distinctive_terms(sf_dir: str):
    """Per-document distinctive terms: top-3 tokens ranked by
    (df asc, tf desc, token asc) — tf-idf's intent with an EXACT
    integer lexicographic rank (float idf ordering is libm-dependent
    and would flake the driver hash; rarity-then-frequency is the same
    signal). Two-phase shape: the df table (bounded vocab) builds once
    via the ``inverted_index`` shuffle, collects small, broadcasts via
    ``ray.put``; scoring is then a NARROW map_batches — per-doc tf +
    one lexsort, no second shuffle."""
    import ray

    import numpy as _np
    df_tbl = pa.concat_tables(list(
        q_inverted_index(sf_dir).iter_batches(batch_size=None, batch_format="pyarrow"))) \
        .sort_by("token")
    # prebuild the sorted vocab + df arrays ONCE on the driver — the
    # per-batch cost is then just the searchsorted lookup, not an
    # O(V log V) python re-sort of the whole vocabulary per batch
    vocab_arr = _np.array(df_tbl.column("token").to_pylist(),
                          dtype=object)
    dfv_arr = df_tbl.column("df").to_numpy(zero_copy_only=False) \
        .astype(_np.int64)
    ref = ray.put((vocab_arr, dfv_arr))

    def score(tbl: pa.Table) -> pa.Table:
        import re as re_mod

        import numpy as np
        import ray as _ray
        vocab, dfv = _ray.get(ref)
        tok_re = re_mod.compile(r"[a-z0-9]+")
        toks: list[str] = []
        didx: list[int] = []
        for i, text in enumerate(tbl.column("text").to_pylist()):
            f = tok_re.findall((text or "").lower())
            toks.extend(f)
            didx.extend([i] * len(f))
        empty = pa.table({
            "doc_id": pa.array([], pa.int64()),
            "token": pa.array([], pa.string()),
            "df": pa.array([], pa.int64()),
            "tf": pa.array([], pa.int64()),
            "rank": pa.array([], pa.int64())})
        if not toks:
            return empty
        # one flattened pass: tf per (doc, token) pair, df via a
        # searchsorted vocab lookup, ONE global lexsort, then a
        # running-group rank — no per-doc python loop
        code = np.searchsorted(vocab, np.array(toks, dtype=object))
        pair = np.array(didx, np.int64) * len(vocab) + code
        upair, tf = np.unique(pair, return_counts=True)
        pdoc, pcode = upair // len(vocab), upair % len(vocab)
        pdf = dfv[pcode]
        ptok = vocab[pcode]
        order = np.lexsort((ptok, -tf, pdf, pdoc))
        sd = pdoc[order]
        new_grp = np.empty(len(sd), bool)
        new_grp[0] = True
        new_grp[1:] = sd[1:] != sd[:-1]
        pos = np.arange(len(sd))
        rank = pos - np.maximum.accumulate(
            np.where(new_grp, pos, -1)) + 1
        keep = rank <= 3
        sel = order[keep]
        doc_ids = tbl.column("doc_id").to_numpy(
            zero_copy_only=False)[pdoc[sel]]
        return pa.table({
            "doc_id": pa.array(doc_ids.astype(np.int64), pa.int64()),
            "token": pa.array(ptok[sel].tolist(), pa.string()),
            "df": pa.array(pdf[sel], pa.int64()),
            "tf": pa.array(tf[sel].astype(np.int64), pa.int64()),
            "rank": pa.array(rank[keep].astype(np.int64), pa.int64())})

    return _read(sf_dir, "documents", ["doc_id", "text"], blocks=16) \
        .map_batches(score, batch_format="pyarrow")


SQL_DISTINCTIVE_TERMS = r"""WITH toks AS (
  SELECT doc_id,
         unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS token
  FROM documents),
tf AS (SELECT doc_id, token, CAST(COUNT(*) AS BIGINT) AS tf
       FROM toks GROUP BY doc_id, token),
df AS (SELECT token, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df
       FROM toks GROUP BY token),
r AS (SELECT tf.doc_id, tf.token, df.df, tf.tf,
        row_number() OVER (PARTITION BY tf.doc_id
                           ORDER BY df.df, tf.tf DESC, tf.token)
          AS rank
      FROM tf JOIN df USING (token))
SELECT doc_id, token, df, tf, CAST(rank AS BIGINT) AS rank
FROM r WHERE rank <= 3"""


def q_curation_pipeline(sf_dir: str):
    """The end-to-end corpus-curation flagship in ONE lazy plan:
    plant-PII → pii_scrub → quality filter (on the SCRUBBED text) →
    exact dedup (min doc_id per md5 of clean text) → deterministic
    train/val/test hash split. Everything is narrow map_batches except
    the single dedup groupby, which moves only fixed-width
    (hash, id, counters) rows — the composition inherits each
    operator's scale shape unchanged."""
    from ray.data.aggregate import Count, Min

    from .textops.curation import _mix32, pii_scrub
    from .util import imod

    def plant(t: pa.Table) -> pa.Table:
        # row-local deterministic planting (fixture has no natural
        # dups/PII): doc_id%13==1 docs share one of 5 seed texts —
        # scrubbing then collapses even the PII-suffixed variants onto
        # the same clean text, exercising dedup ACROSS the scrub stage
        did = t.column("doc_id")
        base = pc.if_else(
            pc.equal(imod(did, 13), 1),
            pc.binary_join_element_wise(
                "duplicate seed text number ",
                pc.cast(imod(did, 5), pa.string()), ""),
            t.column("text"))
        return pa.table({"doc_id": did,
                         "text": _plant_pii(did, base)})

    def scrub_score(tbl: pa.Table) -> pa.Table:
        from .textops.dedup import _md5_column
        t = pii_scrub(tbl)
        text = t.column("clean_text")
        n_chars = pc.cast(pc.utf8_length(text), pa.float64())
        n_tokens = pc.cast(
            pc.count_substring_regex(text, r"[a-zA-Z0-9]+"),
            pa.float64())
        n_alpha = pc.cast(pc.count_substring_regex(text, r"[A-Za-z]"),
                          pa.float64())
        alpha_ratio = pc.divide(n_alpha,
                                pc.max_element_wise(n_chars, 1.0))
        keep = pc.and_(pc.greater_equal(n_tokens, 5.0),
                       pc.greater_equal(alpha_ratio, 0.5))
        t = t.filter(pc.fill_null(keep, False))
        n_red = pc.add(pc.add(t.column("n_email"), t.column("n_ssn")),
                       t.column("n_ip"))
        return pa.table({
            "doc_id": t.column("doc_id"),
            "h": _md5_column(t.column("clean_text").to_pylist()),
            "n_red": n_red})

    groups = _read(sf_dir, "documents", ["doc_id", "text"], blocks=16) \
        .map_batches(plant, batch_format="pyarrow") \
        .map_batches(scrub_score, batch_format="pyarrow") \
        .groupby("h").aggregate(Min("doc_id", alias_name="doc_id"),
                                Min("n_red", alias_name="n_red"),
                                Count(alias_name="dups"))

    def split(t: pa.Table) -> pa.Table:
        import numpy as np
        ids = t.column("doc_id").to_numpy(zero_copy_only=False)
        bucket = (_mix32(ids) % np.uint64(100)).astype(np.int64)
        lab = np.where(bucket < 80, "train",
                       np.where(bucket < 90, "val", "test"))
        return pa.table({
            "doc_id": t.column("doc_id"),
            "n_red": t.column("n_red"),
            "dups": t.column("dups"),
            "bucket": pa.array(bucket, pa.int64()),
            "split": pa.array(lab.tolist(), pa.string())})

    return groups.map_batches(split, batch_format="pyarrow")


SQL_CURATION_PIPELINE = r"""WITH p AS (
  SELECT doc_id, CASE WHEN doc_id % 13 = 1
    THEN 'duplicate seed text number ' || CAST(doc_id % 5 AS VARCHAR)
    ELSE text END AS base FROM documents),
d AS (
  SELECT doc_id, CASE WHEN doc_id % 7 = 0 THEN base || ' Contact user' ||
    CAST(doc_id AS VARCHAR) || '@example.com ssn 123-45-6789 ip 10.0.0.1'
    ELSE base END AS t0 FROM p),
s1 AS (SELECT doc_id,
  CAST(length(regexp_extract_all(t0,
    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS BIGINT)
    AS n_email,
  regexp_replace(t0, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}',
    '<EMAIL>', 'g') AS t1 FROM d),
s2 AS (SELECT doc_id, n_email,
  CAST(length(regexp_extract_all(t1, '\b\d{3}-\d{2}-\d{4}\b'))
    AS BIGINT) AS n_ssn,
  regexp_replace(t1, '\b\d{3}-\d{2}-\d{4}\b', '<SSN>', 'g') AS t2
  FROM s1),
s3 AS (SELECT doc_id, n_email, n_ssn,
  CAST(length(regexp_extract_all(t2,
    '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b')) AS BIGINT) AS n_ip,
  regexp_replace(t2, '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b',
    '<IP>', 'g') AS clean_text FROM s2),
q AS (SELECT doc_id, clean_text, n_email + n_ssn + n_ip AS n_red,
  CAST(length(regexp_extract_all(clean_text, '[a-zA-Z0-9]+'))
    AS DOUBLE) AS n_tokens,
  CAST(length(regexp_extract_all(clean_text, '[A-Za-z]')) AS DOUBLE) /
    GREATEST(CAST(length(clean_text) AS DOUBLE), 1.0) AS alpha_ratio
  FROM s3),
kept AS (SELECT * FROM q WHERE n_tokens >= 5 AND alpha_ratio >= 0.5),
g AS (SELECT MIN(doc_id) AS doc_id, CAST(MIN(n_red) AS BIGINT) AS n_red,
      COUNT(*) AS dups FROM kept GROUP BY md5(clean_text)),
h AS (SELECT doc_id, n_red, dups,
  CAST(CAST(doc_id AS HUGEINT) * 2654435761 % 4294967296 AS BIGINT)
    AS m FROM g),
b AS (SELECT doc_id, n_red, dups, xor(m, m >> 15) % 100 AS bucket
      FROM h)
SELECT doc_id, n_red, dups, CAST(bucket AS BIGINT) AS bucket,
  CASE WHEN bucket < 80 THEN 'train' WHEN bucket < 90 THEN 'val'
       ELSE 'test' END AS split FROM b"""


def q_semi_join_bloom(sf_dir: str):
    """Keep only events from allowlisted users — the SEMI counterpart
    of ``anti_join``, on the bloom-prefilter scale path
    (raybeats/joins.bloom_filter_join): one narrow right scan builds a
    broadcast bloom bitmap, the left probe is narrow, and ONLY the
    candidate rows (true members + ~1% false positives) enter the
    exact confirm shuffle — at 100 TB the all-to-all moves the match
    set, not the corpus. Result is exact (bloom has no false
    negatives; the confirm removes the false positives)."""
    from .joins import bloom_filter_join

    ev = _read(sf_dir, "events", ["event_id", "user_id"])
    allow = _read_dim(sf_dir, "customer", ["c_custkey", "c_mktsegment"]) \
        .map_batches(lambda t: t.filter(
            pc.equal(t.column("c_mktsegment"), "MACHINERY"))
            .select(["c_custkey"]), batch_format="pyarrow")
    return bloom_filter_join(
        ev, allow, on="user_id", right_on="c_custkey", keep="semi",
        right_count=_nrows(sf_dir, "customer"),
        left_count=_nrows(sf_dir, "events"))


SQL_SEMI_JOIN_BLOOM = """
SELECT event_id, user_id FROM events e
WHERE EXISTS (SELECT 1 FROM customer c
              WHERE c.c_custkey = e.user_id
                AND c.c_mktsegment = 'MACHINERY')"""


def q_latest_event(sf_dir: str):
    """Compaction: the newest event per user (ts desc, event_id desc
    tiebreak) — keep-newest-version-per-key, the upsert primitive.
    Each batch compacts locally before the single keyed shuffle
    (raybeats/aggregates.keep_latest), so the all-to-all moves at most
    keys × blocks rows."""
    from .aggregates import keep_latest

    ds = _read(sf_dir, "events",
               ["event_id", "ts", "user_id", "event_type", "value"])
    return keep_latest(ds, key="user_id", order_by=("ts", "event_id"),
                       n_buckets=adaptive_buckets(
                           _nrows(sf_dir, "events")))


SQL_LATEST_EVENT = """
SELECT event_id, ts, user_id, event_type, value FROM (
  SELECT event_id, ts, user_id, event_type, value,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY ts DESC, event_id DESC) AS rn
  FROM events) WHERE rn = 1"""


def q_rollup_revenue(sf_dir: str):
    """One-pass GROUP BY ROLLUP (l_returnflag, l_linestatus): revenue
    at every level — full tuple, per-returnflag subtotal, grand total —
    from ONE scan. Each batch emits partials for all levels tagged
    with the SQL GROUPING() bitmask (raybeats/aggregates
    .rollup_cents_partial); the combine moves Σ_level distinct-keys
    fixed-width rows per batch, never the corpus. Revenue is exact
    int64 cents (half-away rounding, the window_agg recipe) — float
    sums are order-dependent across engines."""
    from .aggregates import rollup_cents_partial, rollup_null_levels

    keys = ["l_returnflag", "l_linestatus"]
    partial = rollup_cents_partial(keys, "cents")

    def derive(t: pa.Table) -> pa.Table:
        cents = pc.cast(pc.round(pc.multiply(pc.multiply(
            t.column("l_extendedprice"),
            pc.subtract(pa.scalar(1.0), t.column("l_discount"))), 100.0),
            round_mode="half_towards_infinity"), pa.int64())
        return pa.table({"l_returnflag": t.column("l_returnflag"),
                         "l_linestatus": t.column("l_linestatus"),
                         "cents": cents})

    small = _read(sf_dir, "lineitem",
                  ["l_returnflag", "l_linestatus", "l_extendedprice",
                   "l_discount"]) \
        .map_batches(lambda t: partial(derive(t)), batch_format="pyarrow")
    # level cardinality is bounded by the finest level (flag×status ≤ 9
    # here) — below the footer-row budget one driver combine beats the
    # multi-second Ray shuffle floor, same pattern as window_agg
    if _nrows(sf_dir, "lineitem") <= 2_000_000:
        merged = _combine_partials(small, keys + ["lvl"],
                                   {"__sum": "revenue_cents", "__n": "n"})
        return rollup_null_levels(merged, keys)
    from ray.data.aggregate import Sum
    agg = small.groupby(keys + ["lvl"]).aggregate(
        Sum("__sum", alias_name="revenue_cents"),
        Sum("__n", alias_name="n"))
    return agg.map_batches(lambda t: rollup_null_levels(t, keys),
                           batch_format="pyarrow")


SQL_ROLLUP_REVENUE = """
SELECT l_returnflag, l_linestatus,
  CAST(GROUPING(l_returnflag, l_linestatus) AS BIGINT) AS lvl,
  CAST(SUM(CAST(round(l_extendedprice * (1 - l_discount) * 100)
                AS BIGINT)) AS BIGINT) AS revenue_cents,
  COUNT(*) AS n
FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)"""


def q_cube_orders(sf_dir: str):
    """GROUP BY CUBE (o_orderstatus, o_orderpriority) in one pass —
    the same one-scan grouping-sets kernel as rollup_revenue, with all
    2^k subsets (aggregates.cube_sets). Exact int64 cents."""
    from .aggregates import (cube_sets, rollup_cents_partial,
                             rollup_null_levels)

    keys = ["o_orderstatus", "o_orderpriority"]
    partial = rollup_cents_partial(keys, "cents", sets=cube_sets(keys))

    def derive(t: pa.Table) -> pa.Table:
        cents = pc.cast(pc.round(pc.multiply(t.column("o_totalprice"),
                                             100.0),
                                 round_mode="half_towards_infinity"),
                        pa.int64())
        return pa.table({keys[0]: t.column(keys[0]),
                         keys[1]: t.column(keys[1]), "cents": cents})

    small = _read(sf_dir, "orders",
                  ["o_orderstatus", "o_orderpriority", "o_totalprice"]) \
        .map_batches(lambda t: partial(derive(t)), batch_format="pyarrow")
    if _nrows(sf_dir, "orders") <= 2_000_000:
        merged = _combine_partials(small, keys + ["lvl"],
                                   {"__sum": "total_cents", "__n": "n"})
        return rollup_null_levels(merged, keys)
    from ray.data.aggregate import Sum
    agg = small.groupby(keys + ["lvl"]).aggregate(
        Sum("__sum", alias_name="total_cents"),
        Sum("__n", alias_name="n"))
    return agg.map_batches(lambda t: rollup_null_levels(t, keys),
                           batch_format="pyarrow")


SQL_CUBE_ORDERS = """
SELECT o_orderstatus, o_orderpriority,
  CAST(GROUPING(o_orderstatus, o_orderpriority) AS BIGINT) AS lvl,
  CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
    AS total_cents,
  COUNT(*) AS n
FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)"""


def q_embedding_centroids(sf_dir: str):
    """Grouped EXACT vector reduce over the embedding column:
    per-label component-wise int64-quantized sums + vector counts
    (textops/knn.centroid_sum_partial), exploded to one row per
    (label, component) so the cross-engine compare never hashes
    floats or lists. Partials are labels × dim fixed rows per batch;
    the combine is bounded by labels × dim × blocks (labels is a
    small categorical here — a high-cardinality ``by`` would take the
    distributed groupby like window_agg)."""
    from .textops.knn import centroid_sum_partial

    small = _read(sf_dir, "embeddings", ["label", "embedding"]) \
        .map_batches(centroid_sum_partial, batch_format="pyarrow")
    return _combine_partials(small, ["label", "idx"],
                             {"s": "s", "n": "n"})


SQL_EMBEDDING_CENTROIDS = """
WITH x AS (
  SELECT label, unnest(embedding) AS v,
         generate_subscripts(embedding, 1) AS i
  FROM embeddings)
SELECT CAST(label AS BIGINT) AS label, CAST(i AS BIGINT) AS idx,
  CAST(SUM(CAST(round(CAST(v AS DOUBLE) * 1000000) AS BIGINT))
       AS BIGINT) AS s,
  COUNT(*) AS n
FROM x GROUP BY label, i"""


def q_kmeans_iter(sf_dir: str):
    """One EXACT k-means (Lloyd) iteration over the embedding column —
    the iterative-ML primitive (vector quantization / IVF training):
    assign every vector to its nearest seed centroid (vectorized
    squared-L2 argmin per batch against the broadcast 8-seed matrix,
    ties → lowest id) and emit the per-cluster int64-quantized
    component sums + counts (the `embedding_centroids` reduce keyed by
    the ASSIGNED cluster instead of a stored label — new centroids are
    s/(n·scale) at whatever precision the consumer wants, and a full
    k-means is this query looped with the seeds swapped). Partials are
    clusters × dim fixed rows per batch; nothing shuffles."""
    import numpy as np
    import pyarrow.dataset as pads

    from .textops.knn import centroid_sum_partial, kmeans_assign

    seeds = pads.dataset(f"{sf_dir}/embeddings.parquet").to_table(
        filter=pc.field("vec_id") < 8, columns=["vec_id", "embedding"]) \
        .sort_by("vec_id")
    cents = np.array(seeds.column("embedding").to_pylist(),
                     dtype=np.float64)
    # label clusters by the seeds' ACTUAL vec_ids (ascending, so the
    # first-occurrence argmin tiebreak = lowest cid like the SQL
    # window) — positional labels only coincide when ids are 0..k-1
    seed_ids = np.array(seeds.column("vec_id").to_pylist(), np.int64)

    def assign_partial(t: pa.Table) -> pa.Table:
        return centroid_sum_partial(
            kmeans_assign(t, centroids=cents, centroid_ids=seed_ids),
            by="cid")

    small = _read(sf_dir, "embeddings", ["embedding"], blocks=16) \
        .map_batches(assign_partial, batch_format="pyarrow")
    return _combine_partials(small, ["cid", "idx"], {"s": "s", "n": "n"})


SQL_KMEANS_ITER = """
WITH c AS (SELECT vec_id AS cid, CAST(embedding AS DOUBLE[]) AS ce
           FROM embeddings WHERE vec_id < 8),
a AS (SELECT e.vec_id, e.embedding, c.cid,
        row_number() OVER (PARTITION BY e.vec_id
          ORDER BY list_distance(CAST(e.embedding AS DOUBLE[]), c.ce),
                   c.cid) AS rn
      FROM embeddings e, c),
l AS (SELECT embedding, cid FROM a WHERE rn = 1),
x AS (SELECT cid, unnest(embedding) AS v,
             generate_subscripts(embedding, 1) AS i FROM l)
SELECT CAST(cid AS BIGINT) AS cid, CAST(i AS BIGINT) AS idx,
  CAST(SUM(CAST(round(CAST(v AS DOUBLE) * 1000000) AS BIGINT))
       AS BIGINT) AS s,
  COUNT(*) AS n
FROM x GROUP BY cid, i"""


def q_value_percentile(sf_dir: str):
    """Per-event exact percentile position: how many events (corpus-
    wide) have a cent-quantized value ≤ this event's — the global-CDF
    normalization step of feature pipelines (score → rank). Two narrow
    passes, no shuffle: pass 1 folds per-batch (quantum, count)
    partials into the exact CDF (`aggregates.fold_quantum_cdf` —
    bounded by value range × precision, the quantiles-partial shape);
    pass 2 broadcasts the two int64 CDF arrays in the map closure and
    answers every row with one searchsorted. Integer output (cum count
    ≤, not a float ratio) so the cross-engine hash is exact; consumers
    divide by n at whatever precision they want."""
    import numpy as np

    from .aggregates import fold_quantum_cdf

    cdf_uniq, cdf_cum = fold_quantum_cdf(
        _read(sf_dir, "events", ["value"]), value_col="value", scale=100)

    def rank(t: pa.Table) -> pa.Table:
        v = pc.cast(t.column("value"), pa.float64()) \
            .to_numpy(zero_copy_only=False)
        ok = ~np.isnan(v)
        quanta = np.floor(v[ok] * 100).astype(np.int64)
        idx = np.searchsorted(cdf_uniq, quanta, side="left")
        return pa.table({
            "event_id": t.column("event_id").filter(pa.array(ok)),
            "cents": pa.array(quanta, pa.int64()),
            "cum_le": pa.array(cdf_cum[idx], pa.int64())})

    return _read(sf_dir, "events", ["event_id", "value"], blocks=8) \
        .map_batches(rank, batch_format="pyarrow")


SQL_VALUE_PERCENTILE = """
WITH c AS (SELECT event_id, CAST(FLOOR(value * 100) AS BIGINT) AS q
           FROM events WHERE value IS NOT NULL AND NOT isnan(value)),
g AS (SELECT q, COUNT(*) AS cnt FROM c GROUP BY q),
s AS (SELECT q, SUM(cnt) OVER (ORDER BY q) AS cum FROM g)
SELECT c.event_id, c.q AS cents, CAST(s.cum AS BIGINT) AS cum_le
FROM c JOIN s USING (q)"""


# deterministic unicode plant (combining accent, ligature-free, tabs,
# run-length spaces) appended for doc_id % 5 == 0 in BOTH engines: the
# synthetic corpus is pure ASCII, so without it the normalization
# oracle would be vacuous (the pii_scrub planting pattern)
_NORM_PLANT = "  Café\t\tNAÏVE  "


def q_column_profile(sf_dir: str):
    """Ingest validation / data-quality profile: one row per numeric
    column with rows, nulls, min, max (aggregates.profile_columns —
    one fixed row per column per batch, min/max are exact selections,
    driver folds blocks × columns rows; the check a 100-TB load runs
    before anything else)."""
    from .aggregates import profile_columns
    return profile_columns(
        _read(sf_dir, "events", ["event_id", "user_id", "value"]),
        ["event_id", "user_id", "value"])


SQL_COLUMN_PROFILE = """
SELECT 'event_id' AS col, COUNT(*) AS n,
  COUNT(*) - COUNT(event_id) AS n_null,
  CAST(MIN(event_id) AS DOUBLE) AS min_v,
  CAST(MAX(event_id) AS DOUBLE) AS max_v FROM events
UNION ALL
SELECT 'user_id', COUNT(*), COUNT(*) - COUNT(user_id),
  CAST(MIN(user_id) AS DOUBLE), CAST(MAX(user_id) AS DOUBLE)
FROM events
UNION ALL
SELECT 'value', COUNT(*), COUNT(*) - COUNT(value),
  MIN(value) FILTER (WHERE NOT isnan(value)),
  MAX(value) FILTER (WHERE NOT isnan(value)) FROM events"""


def q_text_normalize(sf_dir: str):
    """Canonical text normalization (NFC + lowercase + whitespace
    collapse — textops/curation.normalize_text): the first step of
    exact/near dedup and training prep, narrow and shuffle-free."""
    from .textops.curation import normalize_text
    from .util import imod

    def fn(t: pa.Table) -> pa.Table:
        sel = pc.equal(imod(t.column("doc_id"), 5), 0)
        text = pc.if_else(
            sel, pc.binary_join_element_wise(
                t.column("text"), pa.scalar(_NORM_PLANT), ""),
            t.column("text"))
        return normalize_text(pa.table({"doc_id": t.column("doc_id"),
                                        "text": text})) \
            .select(["doc_id", "norm_text"])

    return _read(sf_dir, "documents", ["doc_id", "text"], blocks=8) \
        .map_batches(fn, batch_format="pyarrow")


SQL_TEXT_NORMALIZE = r"""SELECT doc_id,
  trim(regexp_replace(lower(nfc_normalize(
    CASE WHEN doc_id % 5 = 0
         THEN text || '  Cafe' || chr(769) || chr(9) || chr(9) ||
              'NAI' || chr(776) || 'VE  '
         ELSE text END)), '\s+', ' ', 'g')) AS norm_text
FROM documents"""


def q_token_heavy_hitters(sf_dir: str):
    """Corpus-wide top-25 tokens via the mergeable Misra-Gries sketch
    (textops/sketches.heavy_hitters) — NO shuffle: each batch reduces
    its exact local counts to a fixed 4096-entry summary, the driver
    sums key-wise and reduces once. The scale path of the exact
    ``token_topk`` groupby for web-scale key cardinalities (tokens,
    URLs, ids) where per-batch distinct rows would swamp the shuffle.
    On this corpus the vocabulary (31 tokens) is far below the summary
    capacity, so the estimates are EXACT with bound 0 and the DuckDB
    mirror holds verbatim; the approximation regime (capacity
    overflow, nonzero bound) is value-asserted in
    tests/test_sketches.py against the MG guarantee
    ``est ≤ true ≤ est + bound``."""
    from .textops.analysis import flat_tokens
    from .textops.sketches import heavy_hitters

    def explode(t: pa.Table) -> pa.Table:
        _, flat, _ = flat_tokens(t.column("text"))
        return pa.table({"token": flat})

    ds = _read(sf_dir, "documents", ["text"], blocks=16) \
        .map_batches(explode, batch_format="pyarrow")
    return heavy_hitters(ds, "token", k=25, m=4096)


SQL_TOKEN_HEAVY_HITTERS = r"""WITH toks AS (
  SELECT unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS key
  FROM documents)
SELECT key, COUNT(*) AS est, CAST(0 AS BIGINT) AS bound FROM toks
GROUP BY key ORDER BY est DESC, key LIMIT 25"""


def q_running_sum(sf_dir: str):
    """Per-user cumulative running total (the ordered window-function
    shape: SUM() OVER (PARTITION BY key ORDER BY ts)). Partitioning
    assumption: one group sees all of a user's rows — the same
    bucketed-cogroup contract as sessionization. The per-group kernel
    is the SHARED ``util.running_cents_fold`` (one lexsort + segmented
    exact-cents cumsum, per-segment np.repeat bases so negative values
    stay correct) — the streaming ``RunningTotalState`` folds the same
    literal function, so batch/stream parity cannot drift."""
    from .util import running_cents_fold

    n_buckets = adaptive_buckets(_nrows(sf_dir, "events"))

    def add_bucket(t: pa.Table) -> pa.Table:
        return t.append_column(
            "bucket", int_bucket(t.column("user_id"), n_buckets))

    return _read(sf_dir, "events",
                 ["event_id", "user_id", "ts", "value"]) \
        .map_batches(add_bucket, batch_format="pyarrow") \
        .groupby("bucket").map_groups(running_cents_fold,
                                      batch_format="pyarrow")


SQL_RUNNING_SUM = """
SELECT event_id, user_id,
  CAST(SUM(CAST(round(value * 100) AS BIGINT))
       OVER (PARTITION BY user_id ORDER BY ts, event_id)
       AS BIGINT) AS running_cents
FROM events"""


def _lag_scaffold(part_cols, ts, eid):
    """Shared LAG kernel scaffolding (event_gaps annotates, burst_dedup
    filters — both must agree): lexsort by (*part_cols, ts, eid) and
    return ``(order, new_run, gap)`` where ``new_run`` marks partition
    starts in the sorted order and ``gap`` is the adjacent ts diff
    (0 at position 0; callers mask/branch on ``new_run``)."""
    import numpy as np

    order = np.lexsort((eid, ts) + tuple(reversed(list(part_cols))))
    n = len(order)
    new_run = np.empty(n, bool)
    gap = np.empty(n, np.int64)
    if n:
        new_run[0] = True
        changed = np.zeros(n - 1, bool)
        for c in part_cols:
            cs = c[order]
            changed |= cs[1:] != cs[:-1]
        new_run[1:] = changed
        tss = ts[order]
        gap[0] = 0
        gap[1:] = tss[1:] - tss[:-1]
    return order, new_run, gap


def q_event_gaps(sf_dir: str):
    """LAG window shape: per event, microseconds since the same
    user's PREVIOUS event (NULL for each user's first) — the
    inter-arrival-time primitive sessionization thresholds are built
    on. Same bucketed-cogroup contract as running_sum; per bucket one
    lexsort + one vectorized diff with run starts nulled
    (`_lag_scaffold`, shared with burst_dedup)."""
    import numpy as np

    n_buckets = adaptive_buckets(_nrows(sf_dir, "events"))

    def add_bucket(t: pa.Table) -> pa.Table:
        return t.append_column(
            "bucket", int_bucket(t.column("user_id"), n_buckets))

    def gaps(g: pa.Table) -> pa.Table:
        u = g.column("user_id").to_numpy(zero_copy_only=False)
        ts = pc.cast(g.column("ts"), pa.int64()) \
            .to_numpy(zero_copy_only=False)
        eid = g.column("event_id").to_numpy(zero_copy_only=False)
        order, first, gap = _lag_scaffold([u], ts, eid)
        return pa.table({
            "event_id": pa.array(eid[order], pa.int64()),
            "user_id": pa.array(u[order], pa.int64()),
            "gap_us": pa.array(gap, pa.int64(), mask=first)})

    return _read(sf_dir, "events", ["event_id", "user_id", "ts"]) \
        .map_batches(add_bucket, batch_format="pyarrow") \
        .groupby("bucket").map_groups(gaps, batch_format="pyarrow")


SQL_EVENT_GAPS = """
SELECT event_id, user_id,
  CAST(date_diff('microsecond',
                 lag(ts) OVER (PARTITION BY user_id
                               ORDER BY ts, event_id), ts)
       AS BIGINT) AS gap_us
FROM events"""


def _footer_max(sf_dir: str, table: str, col: str) -> int:
    """Max of a column from parquet row-group statistics — metadata
    only, nothing executes."""
    md = pq.read_metadata(f"{sf_dir}/{table}.parquet")
    mx = None
    for rg in range(md.num_row_groups):
        g = md.row_group(rg)
        for ci in range(g.num_columns):
            c = g.column(ci)
            if c.path_in_schema == col and c.statistics is not None \
                    and c.statistics.has_min_max:
                v = c.statistics.max
                mx = v if mx is None else max(mx, v)
    if mx is None:
        raise ValueError(f"no {col} statistics in {table} footer")
    return int(mx)


def _footer_ts_range(sf_dir: str, table: str,
                     col: str = "ts") -> tuple[int, int]:
    """(min, max) of a timestamp column in µs from parquet row-group
    statistics — metadata only; falls back to a pruned single-column
    scan when stats are absent."""
    path = f"{sf_dir}/{table}.parquet"
    md = pq.read_metadata(path)
    idx = md.schema.to_arrow_schema().get_field_index(col)
    lo = hi = None
    for rg in range(md.num_row_groups):
        st = md.row_group(rg).column(idx).statistics
        if st is None or not st.has_min_max:
            lo = None
            break
        lo = st.min if lo is None or st.min < lo else lo
        hi = st.max if hi is None or st.max > hi else hi
    if lo is None:
        c = pq.read_table(path, columns=[col]).column(0)
        lo, hi = pc.min(c).as_py(), pc.max(c).as_py()
    return (pa.scalar(lo, pa.timestamp("us")).value,
            pa.scalar(hi, pa.timestamp("us")).value)


def q_pack_sequences(sf_dir: str):
    """Sequence packing for training batches: each document gets the
    pack id its first token lands in under a running 4096-token
    boundary over doc_id order (textops/curation.pack_sequences — a
    two-pass distributed prefix sum over monotone id-range buckets;
    nothing global sorts). Token counts share the token_stats
    TOKEN_RE (one-regex `token_counts` — the full token_stats would
    also pay the stopword regex and char-length scans just to drop
    them) so the SQL window mirror is exact."""
    from .textops.analysis import token_counts
    from .textops.curation import pack_sequences

    toks = _read(sf_dir, "documents", ["doc_id", "text"]) \
        .map_batches(token_counts, batch_format="pyarrow")
    return pack_sequences(toks, budget=4096,
                          id_max=_footer_max(sf_dir, "documents",
                                             "doc_id"),
                          tok_col="n_tokens")


SQL_PACK_SEQUENCES = r"""
WITH tok AS (
  SELECT doc_id,
    CAST(length(regexp_extract_all(text, '[a-zA-Z0-9]+')) AS BIGINT)
      AS n_tokens
  FROM documents),
c AS (
  SELECT doc_id, n_tokens,
    SUM(n_tokens) OVER (ORDER BY doc_id
                        ROWS BETWEEN UNBOUNDED PRECEDING
                        AND CURRENT ROW) AS cum
  FROM tok)
SELECT doc_id, n_tokens,
       CAST((cum - n_tokens) // 4096 AS BIGINT) AS pack_id
FROM c"""


def q_ship_window_join(sf_dir: str):
    """Large×large containment join: every lineitem shipped within an
    URGENT finished order's first day — BOTH sides scale with the
    corpus, so the broadcast range join doesn't apply. Grid-cell
    cogroup (raybeats/joins.interval_point_join): day cells, one keyed
    shuffle, per-bucket sorted-points + two searchsorted probes per
    interval copy, per-cell clipping so straddling intervals never
    double-match."""
    from .joins import interval_point_join

    day_us = 86_400_000_000
    pts = _read(sf_dir, "lineitem",
                ["l_orderkey", "l_linenumber", "l_shipdate"])

    def mk_iv(t: pa.Table) -> pa.Table:
        t = t.filter(pc.and_(
            pc.equal(t.column("o_orderpriority"), "1-URGENT"),
            pc.equal(t.column("o_orderstatus"), "F")))
        lo = pc.cast(t.column("o_orderdate"), pa.int64())
        return pa.table({"o_orderkey": t.column("o_orderkey"),
                         "lo": lo, "hi": pc.add(lo, day_us)})

    ivs = _read(sf_dir, "orders",
                ["o_orderkey", "o_orderdate", "o_orderpriority",
                 "o_orderstatus"]) \
        .map_batches(mk_iv, batch_format="pyarrow")
    joined = interval_point_join(
        pts, ivs, value_col="l_shipdate", lo_col="lo", hi_col="hi",
        cell=day_us,
        n_buckets=adaptive_buckets(_nrows(sf_dir, "lineitem")),
        # transformed lineage: pass the schema, never fetch it
        interval_schema=pa.schema([("o_orderkey", pa.int64()),
                                   ("lo", pa.int64()),
                                   ("hi", pa.int64())]))
    return joined.map_batches(
        lambda t: t.select(["l_orderkey", "l_linenumber", "l_shipdate",
                            "o_orderkey"]), batch_format="pyarrow")


SQL_SHIP_WINDOW_JOIN = """
WITH iv AS (
  SELECT o_orderkey, o_orderdate AS lo,
         o_orderdate + INTERVAL 1 DAY AS hi
  FROM orders
  WHERE o_orderpriority = '1-URGENT' AND o_orderstatus = 'F')
SELECT l.l_orderkey, l.l_linenumber, l.l_shipdate, iv.o_orderkey
FROM lineitem l JOIN iv
  ON l.l_shipdate >= iv.lo AND l.l_shipdate < iv.hi"""


def q_frame_sample(sf_dir: str):
    """Video frame-sampling plumbing (textops/multimodal
    .sample_frames): the 'video' rows of the documents-derived media
    table get a deterministic duration (n_chars × 10 ms) and explode
    to one row per 2.5 s sample — the flat-map multimodal shape, no
    shuffle. Timing/index arithmetic is real and integer-exact; the
    per-frame decode is the container's digest stub, chosen
    SQL-expressible so the whole pipeline has a value oracle."""
    from .textops.multimodal import sample_frames

    def to_video(t: pa.Table) -> pa.Table:
        did = t.column("doc_id").to_numpy(zero_copy_only=False)
        t = t.filter(pa.array(did % 3 == 2))
        return pa.table({
            "media_id": t.column("doc_id"),
            "payload": pc.cast(t.column("text"), pa.binary()),
            "duration_ms": pc.multiply(t.column("n_chars"), 10)})

    vids = _read(sf_dir, "documents", ["doc_id", "text", "n_chars"]) \
        .map_batches(to_video, batch_format="pyarrow")
    return sample_frames(vids, every_ms=2500, fps=30)


SQL_FRAME_SAMPLE = """
WITH v AS (
  SELECT doc_id AS media_id, text, n_chars * 10 AS duration_ms
  FROM documents WHERE doc_id % 3 = 2 AND n_chars > 0),
f AS (
  SELECT media_id, text,
         unnest(generate_series(0,
             CAST((duration_ms - 1) // 2500 AS BIGINT))) AS k
  FROM v)
SELECT media_id, CAST(k * 2500 AS BIGINT) AS ts_ms,
       CAST(k * 2500 * 30 // 1000 AS BIGINT) AS frame_idx,
       substr(sha256(text || '-' || CAST(k * 2500 AS VARCHAR)), 1, 8)
         AS frame_sig
FROM f"""


def q_mixture_oversample(sf_dir: str):
    """Dataset-mixing oversampling (textops/curation.oversample_rows):
    each document repeats per its source's epoch weight — floor plus a
    deterministic id-hash Bernoulli on the fractional permille, so
    reruns/retries emit identical rows (no RNG). Weights here derive
    from the source suffix (500 + 250·n mod 2000 permille, spanning
    sub-1 and >1 epochs) so the oracle is self-contained. Narrow
    per-batch explode, no shuffle."""
    from .textops.curation import oversample_rows

    def fn(t: pa.Table) -> pa.Table:
        import numpy as np
        n = pc.cast(pc.utf8_slice_codeunits(t.column("source"), 3, 99),
                    pa.int64()).to_numpy(zero_copy_only=False)
        millis = 500 + (n * 250) % 2000
        return oversample_rows(
            t.select(["doc_id", "source"]), millis.astype(np.int64))

    return _read(sf_dir, "documents", ["doc_id", "source"]) \
        .map_batches(fn, batch_format="pyarrow")


SQL_MIXTURE_OVERSAMPLE = """
WITH w AS (
  SELECT doc_id, source,
    500 + (CAST(substr(source, 4) AS BIGINT) * 250) % 2000 AS millis,
    CAST(CAST(doc_id AS HUGEINT) * 2654435761 % 4294967296 AS BIGINT)
      AS m
  FROM documents),
c AS (
  SELECT doc_id, source,
    millis // 1000
    + CASE WHEN xor(m, m >> 15)
                < (millis % 1000) * 4294967296 // 1000
           THEN 1 ELSE 0 END AS cnt
  FROM w)
SELECT doc_id, source,
       CAST(unnest(generate_series(1, CAST(cnt AS BIGINT))) AS BIGINT)
         AS epoch
FROM c WHERE cnt > 0"""


def q_bigram_topk(sf_dir: str):
    """Corpus-wide top-25 bigrams — the n-gram statistics primitive of
    a training-data pipeline (vocabulary induction, boilerplate
    detection). Per-batch partials (`analysis.bigram_counts_partial`:
    tokens flatten once, adjacency is two shifted views) mean the
    groupby moves one row per (batch, distinct bigram), never one per
    occurrence; ties break (count desc, bigram asc) on both sides."""
    from ray.data.aggregate import Sum

    from .textops.analysis import bigram_counts_partial
    agg = _read(sf_dir, "documents", ["text"], blocks=16) \
        .map_batches(bigram_counts_partial, batch_format="pyarrow") \
        .groupby("bigram").aggregate(Sum("n", alias_name="n"))
    return agg.sort(["n", "bigram"], descending=[True, False]).limit(25)


SQL_BIGRAM_TOPK = r"""WITH t AS (
  SELECT regexp_extract_all(lower(text), '[a-z0-9]+') AS toks
  FROM documents),
b AS (
  SELECT unnest(list_transform(
    generate_series(1, greatest(len(toks) - 1, 0)),
    i -> toks[i] || ' ' || toks[i + 1])) AS bigram FROM t)
SELECT bigram, COUNT(*) AS n FROM b GROUP BY bigram
ORDER BY n DESC, bigram LIMIT 25"""


def q_quality_filter(sf_dir: str):
    """Quantile-gated curation filter: drop the shortest 25% of the
    corpus by token count — the 'drop the bottom p% by quality' step
    where the cutoff is a CORPUS statistic, not a constant. Two-phase
    threshold-broadcast shape (aggregates.global_discrete_quantile):
    phase 1 folds per-batch (quantum, count) partials — bounded by the
    value range, never the corpus — into one exact driver-side
    threshold; phase 2 broadcasts that scalar in the filter closure.
    The 16-byte (doc_id, n_tokens) projection is materialized because
    BOTH phases consume it and Ray recomputes lineage per consumer —
    without it the text read + token regex (the dominant cost) would
    run twice."""
    from .aggregates import global_discrete_quantile
    from .textops.analysis import token_counts

    proj = _read(sf_dir, "documents", ["doc_id", "text"]) \
        .map_batches(token_counts,
                     batch_format="pyarrow").materialize()
    thr, _ = global_discrete_quantile(proj, value_col="n_tokens", q=0.25)

    def keep(t: pa.Table) -> pa.Table:
        return t.filter(pc.greater_equal(t.column("n_tokens"), thr))

    return proj.map_batches(keep, batch_format="pyarrow")


SQL_QUALITY_FILTER = r"""WITH tok AS (
  SELECT doc_id,
    CAST(length(regexp_extract_all(text, '[a-zA-Z0-9]+')) AS BIGINT)
      AS n_tokens
  FROM documents),
g AS (SELECT n_tokens AS q, COUNT(*) AS cnt FROM tok GROUP BY q),
s AS (SELECT q, SUM(cnt) OVER (ORDER BY q) AS cum,
             SUM(cnt) OVER () AS total FROM g),
thr AS (SELECT MIN(CASE WHEN cum >= CEIL(0.25 * total) THEN q END) AS t
        FROM s)
SELECT doc_id, n_tokens FROM tok, thr WHERE n_tokens >= thr.t"""


def q_dedup_keep_best(sf_dir: str):
    """Near-dup cluster CANONICALIZATION — the step after clustering
    that dedup pipelines actually ship: per cluster keep the best
    member (longest by token count, ties → smallest id). Composes the
    engine's own primitives end-to-end: minhash-LSH candidates →
    exact jaccard verify → connected components → one hash-shuffle
    join against the narrow (doc_id, n_tokens) projection →
    `keep_latest` compaction (local argmax per batch, then one
    bounded keyed shuffle). The cluster map is materialized (16 B per
    duplicate doc, spillable) so the join's internal schema fetch
    cannot re-execute the whole minhash + verify + CC lineage."""
    from .aggregates import keep_latest
    from .joins import hash_join
    from .textops.analysis import token_counts
    from .textops.dedup import (duplicate_clusters, jaccard_verify,
                                minhash_candidates)

    n_docs = _nrows(sf_dir, "documents")
    docs = _read(sf_dir, "documents", ["doc_id", "text"], blocks=16)
    cand = minhash_candidates(docs,
                              n_buckets=adaptive_buckets(16 * n_docs),
                              dedup=False)  # verify cogroup dedups
    pairs = jaccard_verify(cand, docs, threshold=0.5,
                           n_buckets=adaptive_buckets(n_docs))
    clusters = duplicate_clusters(
        pairs, n_buckets=adaptive_buckets(n_docs, lo=32)).materialize()
    toks = _read(sf_dir, "documents", ["doc_id", "text"]) \
        .map_batches(token_counts, batch_format="pyarrow")
    joined = hash_join(clusters, toks, on="node", right_on="doc_id",
                       how="inner",
                       num_partitions=adaptive_buckets(2 * n_docs, lo=4))

    def neg(t: pa.Table) -> pa.Table:
        # keep_latest keeps the MAX order tuple; negate the id so the
        # tiebreak lands on the SMALLEST doc_id
        return t.append_column("neg_id", pc.negate(t.column("node")))

    best = keep_latest(joined.map_batches(neg, batch_format="pyarrow"),
                       key="cluster", order_by=("n_tokens", "neg_id"),
                       n_buckets=adaptive_buckets(n_docs, lo=32))

    def finish(t: pa.Table) -> pa.Table:
        return pa.table({"cluster": t.column("cluster"),
                         "keep_id": t.column("node"),
                         "n_tokens": t.column("n_tokens")})

    return best.map_batches(finish, batch_format="pyarrow")


SQL_DEDUP_KEEP_BEST = _SQL_JACCARD_PAIRS_CTE.format(rec="RECURSIVE") + """,
edges AS (SELECT a AS u, b AS v FROM jpairs
          UNION ALL SELECT b, a FROM jpairs),
reach(node, r) AS (
  SELECT DISTINCT u, u FROM edges
  UNION
  SELECT reach.node, e.v FROM reach JOIN edges e ON e.u = reach.r
),
cl AS (SELECT node, MIN(r) AS cluster FROM reach GROUP BY node),
tok AS (SELECT doc_id,
  CAST(length(regexp_extract_all(text, '[a-zA-Z0-9]+')) AS BIGINT)
    AS n_tokens
  FROM documents),
m AS (SELECT cl.cluster, cl.node, tok.n_tokens
      FROM cl JOIN tok ON tok.doc_id = cl.node),
r2 AS (SELECT *, row_number() OVER (PARTITION BY cluster
        ORDER BY n_tokens DESC, node ASC) AS rn FROM m)
SELECT cluster, node AS keep_id, n_tokens FROM r2 WHERE rn = 1"""


# --------------------------------------------- round-5 curation additions

_STRAT_RATES = {"click": 10, "view": 5, "purchase": 100,
                "signup": 50, "error": 25}


def q_stratified_sample(sf_dir: str):
    """Per-stratum rate sampling (downsample clicks/views, keep all
    purchases): deterministic id-hash keep decision, shuffle-free."""
    from .textops.curation import stratified_sample

    def pick(t: pa.Table) -> pa.Table:
        return stratified_sample(t, group_col="event_type",
                                 id_col="event_id",
                                 rates_pct=_STRAT_RATES)

    return _read(sf_dir, "events",
                 ["event_id", "event_type", "user_id"]) \
        .map_batches(pick, batch_format="pyarrow")


SQL_STRATIFIED_SAMPLE = """WITH h AS (
  SELECT event_id, event_type, user_id,
    CAST(CAST(event_id AS HUGEINT) * 2654435761 % 4294967296 AS BIGINT)
      AS m FROM events),
s AS (SELECT event_id, event_type, user_id, xor(m, m >> 15) % 100 AS b
      FROM h)
SELECT event_id, event_type, user_id FROM s
WHERE b < CASE event_type
  WHEN 'click' THEN 10 WHEN 'view' THEN 5 WHEN 'purchase' THEN 100
  WHEN 'signup' THEN 50 WHEN 'error' THEN 25 ELSE 0 END"""


def q_snapshot_diff(sf_dir: str):
    """Keyed snapshot diff (added/removed/changed/same between two
    table versions). The "new" snapshot is derived deterministically
    from the old: every 4th key dropped (removed), every remaining 3rd
    key's value bumped (changed), plus shifted supplier keys appended
    (added) — so all four statuses are exercised non-vacuously."""
    from .joins import snapshot_diff

    old = _read_dim(sf_dir, "customer", ["c_custkey", "c_nationkey"]) \
        .map_batches(lambda t: pa.table({
            "key": t.column("c_custkey"),
            "val": pc.cast(t.column("c_nationkey"), pa.int64())}),
            batch_format="pyarrow")

    def derive_new(t: pa.Table) -> pa.Table:
        from .util import imod
        keep = t.filter(pc.not_equal(
            imod(t.column("c_custkey"), 4), 0))
        key = keep.column("c_custkey")
        bump = pc.cast(pc.equal(imod(key, 3), 0), pa.int64())
        return pa.table({
            "key": key,
            "val": pc.add(pc.cast(keep.column("c_nationkey"),
                                  pa.int64()), bump)})

    new = _read_dim(sf_dir, "customer", ["c_custkey", "c_nationkey"]) \
        .map_batches(derive_new, batch_format="pyarrow") \
        .union(_read_dim(sf_dir, "supplier", ["s_suppkey", "s_nationkey"])
               .map_batches(lambda t: pa.table({
                   "key": pc.add(t.column("s_suppkey"), 1_000_000),
                   "val": pc.cast(t.column("s_nationkey"), pa.int64())}),
                   batch_format="pyarrow"))

    schema = pa.schema([("key", pa.int64()), ("val", pa.int64())])
    n = _nrows(sf_dir, "customer") + _nrows(sf_dir, "supplier")
    from .util import adaptive_buckets as _ab
    return snapshot_diff(old, new, on="key", compare="val",
                         n_buckets=_ab(2 * n), old_schema=schema)


SQL_SNAPSHOT_DIFF = """WITH old AS (
  SELECT c_custkey AS key, CAST(c_nationkey AS BIGINT) AS val
  FROM customer),
new AS (
  SELECT c_custkey AS key,
    CAST(c_nationkey AS BIGINT)
      + CASE WHEN c_custkey % 3 = 0 THEN 1 ELSE 0 END AS val
  FROM customer WHERE c_custkey % 4 <> 0
  UNION ALL
  SELECT s_suppkey + 1000000 AS key, CAST(s_nationkey AS BIGINT) AS val
  FROM supplier)
SELECT COALESCE(old.key, new.key) AS key,
  CASE WHEN new.key IS NULL THEN 'removed'
       WHEN old.key IS NULL THEN 'added'
       WHEN old.val = new.val THEN 'same' ELSE 'changed' END AS status,
  old.val AS old_val, new.val AS new_val
FROM old FULL OUTER JOIN new ON old.key = new.key"""


def q_funnel_conversion(sf_dir: str):
    """Two-step funnel: first click → first purchase strictly after it
    within 24 hours, per user (converting users only)."""
    from .aggregates import funnel_first_conversion
    n_buckets = adaptive_buckets(_nrows(sf_dir, "events"))
    return funnel_first_conversion(
        _read(sf_dir, "events", ["user_id", "ts", "event_type"]),
        first_type="click", then_type="purchase",
        within_us=24 * 3_600_000_000, n_buckets=n_buckets)


SQL_FUNNEL_CONVERSION = """WITH a AS (
  SELECT user_id, MIN(ts) AS t0 FROM events
  WHERE event_type = 'click' GROUP BY user_id)
SELECT a.user_id, a.t0 AS first_ts, MIN(e.ts) AS conv_ts
FROM a JOIN events e ON e.user_id = a.user_id
  AND e.event_type = 'purchase' AND e.ts > a.t0
  AND e.ts <= a.t0 + INTERVAL '24 hours'
GROUP BY a.user_id, a.t0"""


def q_winsorize(sf_dir: str):
    """Outlier clipping at the exact discrete p05/p95 of
    floor(value*100): two narrow shuffle-free passes — the quantum-CDF
    fold broadcasts two scalar thresholds into a vectorized clip.
    Output stays integer cents (the `quantiles` contract) so the
    cross-engine hash is exact."""
    import numpy as np
    from .aggregates import fold_quantum_cdf, quantile_from_cdf

    ds = _read(sf_dir, "events", ["event_id", "value"])
    uniq, cum = fold_quantum_cdf(ds, value_col="value", scale=100)
    if len(uniq) == 0:
        raise ValueError("winsorize: no non-null values")
    lo = quantile_from_cdf(uniq, cum, 0.05)
    hi = quantile_from_cdf(uniq, cum, 0.95)

    def clip(t: pa.Table) -> pa.Table:
        v = t.column("value").to_numpy(zero_copy_only=False)
        ok = ~np.isnan(v)
        q = np.floor(v[ok] * 100).astype(np.int64)
        return pa.table({
            "event_id": t.column("event_id").filter(pa.array(ok)),
            "value_cents_w": pa.array(np.clip(q, lo, hi), pa.int64())})

    return ds.map_batches(clip, batch_format="pyarrow")


SQL_WINSORIZE = """WITH v AS (
  SELECT event_id, CAST(FLOOR(value * 100) AS BIGINT) AS q
  FROM events WHERE NOT isnan(value)),
c AS (SELECT q, COUNT(*) AS cnt FROM v GROUP BY q),
cdf AS (SELECT q, SUM(cnt) OVER (ORDER BY q) AS cum,
               SUM(cnt) OVER () AS n FROM c),
lo AS (SELECT MIN(q) AS v FROM cdf WHERE cum >= CEIL(0.05 * n)),
hi AS (SELECT MIN(q) AS v FROM cdf WHERE cum >= CEIL(0.95 * n))
SELECT v.event_id, LEAST(GREATEST(v.q, lo.v), hi.v) AS value_cents_w
FROM v, lo, hi"""


def q_anomaly_events(sf_dir: str):
    """Robust outlier flagging: |value_cents − median| > 3·MAD, both
    statistics exact discrete quanta from the CDF fold (median of the
    values, then median of the absolute deviations) — integer-exact on
    both engines, no shuffle in any pass."""
    import numpy as np
    from .aggregates import fold_quantum_cdf, quantile_from_cdf

    ds = _read(sf_dir, "events", ["event_id", "value"])

    uniq, cum = fold_quantum_cdf(ds, value_col="value", scale=100)
    if len(uniq) == 0:
        raise ValueError("anomaly_events: no non-null values")
    med = quantile_from_cdf(uniq, cum, 0.5)

    def to_dev(t: pa.Table) -> pa.Table:
        v = t.column("value").to_numpy(zero_copy_only=False)
        ok = ~np.isnan(v)
        q = np.floor(v[ok] * 100).astype(np.int64)
        return pa.table({
            "event_id": t.column("event_id").filter(pa.array(ok)),
            "value_cents": pa.array(q, pa.int64()),
            "dev_cents": pa.array(np.abs(q - med), pa.int64())})

    devs = ds.map_batches(to_dev, batch_format="pyarrow")
    du, dc = fold_quantum_cdf(devs, value_col="dev_cents", scale=1)
    mad = quantile_from_cdf(du, dc, 0.5)

    def flag(t: pa.Table) -> pa.Table:
        d = t.column("dev_cents").to_numpy(zero_copy_only=False)
        return t.filter(pa.array(d > 3 * mad))

    return devs.map_batches(flag, batch_format="pyarrow")


SQL_ANOMALY_EVENTS = """WITH v AS (
  SELECT event_id, CAST(FLOOR(value * 100) AS BIGINT) AS q
  FROM events WHERE NOT isnan(value)),
c1 AS (SELECT q, COUNT(*) AS cnt FROM v GROUP BY q),
d1 AS (SELECT q, SUM(cnt) OVER (ORDER BY q) AS cum,
              SUM(cnt) OVER () AS n FROM c1),
med AS (SELECT MIN(q) AS m FROM d1 WHERE cum >= CEIL(0.5 * n)),
dev AS (SELECT v.event_id, v.q AS value_cents, ABS(v.q - med.m) AS d
        FROM v, med),
c2 AS (SELECT d, COUNT(*) AS cnt FROM dev GROUP BY d),
d2 AS (SELECT d, SUM(cnt) OVER (ORDER BY d) AS cum,
              SUM(cnt) OVER () AS n FROM c2),
mad AS (SELECT MIN(d) AS m FROM d2 WHERE cum >= CEIL(0.5 * n))
SELECT dev.event_id, dev.value_cents, dev.d AS dev_cents
FROM dev, mad WHERE dev.d > 3 * mad.m"""


def q_approx_users_per_type(sf_dir: str):
    """Grouped HLL approximate COUNT(DISTINCT user) per event type —
    the sketch scale path of the exact `users_per_type` (one 4 KiB
    register row per (batch, group) partial, commutative register-max
    fold, NO shuffle). Rows-only check (approximate by construction);
    per-group error vs exact is asserted in tests."""
    from .textops.sketches import grouped_approx_distinct
    return grouped_approx_distinct(
        _read(sf_dir, "events", ["event_type", "user_id"], blocks=8),
        group_col="event_type", value_col="user_id", p=12)


def q_global_rank(sf_dir: str):
    """Distributed ROW_NUMBER() over (value, id) with no global sort
    (`aggregates.global_row_number`): two-level (quantum, id-range)
    cells — counts fold to exclusive prefix offsets, one keyed shuffle
    ranks each bounded cell locally."""
    from .aggregates import global_row_number
    return global_row_number(
        _read(sf_dir, "events", ["event_id", "value"]),
        value_col="value", id_col="event_id", scale=100,
        id_max=_footer_max(sf_dir, "events", "event_id"))


SQL_GLOBAL_RANK = """
SELECT event_id, CAST(FLOOR(value * 100) AS BIGINT) AS value_cents,
  CAST(ROW_NUMBER() OVER (ORDER BY FLOOR(value * 100), event_id)
       AS BIGINT) AS rnk
FROM events WHERE NOT isnan(value)"""


def q_daily_change(sf_dir: str):
    """Day-over-day count deltas per event type — the telemetry
    trend-report shape (LAG over an aggregated series). Per-batch
    (day, type) count partials make the shuffle fixed-width; the
    per-type finalize folds days × blocks partial rows (bounded by
    the time range) with one sort + diff."""
    import numpy as np

    def partial(t: pa.Table) -> pa.Table:
        # null ts dropped on both sides (a null day would turn into
        # NaN in the finalize's numpy sort/diff)
        day = pc.floor_temporal(t.column("ts"), unit="day")
        g = pa.table({
            "day": day, "event_type": t.column("event_type"),
        }).filter(pc.is_valid(day)) \
            .group_by(["day", "event_type"]).aggregate([("day", "count")])
        return pa.table({"day": g.column("day"),
                         "event_type": g.column("event_type"),
                         "n": pc.cast(g.column("day_count"), pa.int64())})

    def finalize(g: pa.Table) -> pa.Table:
        comb = g.group_by("day").aggregate([("n", "sum")])
        di = pc.cast(comb.column("day"), pa.int64()) \
            .to_numpy(zero_copy_only=False)
        n = pc.cast(comb.column("n_sum"), pa.int64()) \
            .to_numpy(zero_copy_only=False)
        order = np.argsort(di)
        di, n = di[order], n[order]
        # map_groups never delivers an empty group, so [0] is safe
        delta = np.empty(len(n), np.int64)
        delta[0] = 0
        delta[1:] = n[1:] - n[:-1]
        first = np.zeros(len(n), bool)
        first[0] = True
        typ = g.column("event_type").slice(0, 1).to_pylist() * len(n)
        return pa.table({
            "day": pa.array(di, pa.int64()).cast(pa.timestamp("us")),
            "event_type": pa.array(typ, pa.string()),
            "n": pa.array(n, pa.int64()),
            "delta": pa.array(delta, pa.int64(), mask=first)})

    return _read(sf_dir, "events", ["ts", "event_type"]) \
        .map_batches(partial, batch_format="pyarrow") \
        .groupby("event_type") \
        .map_groups(finalize, batch_format="pyarrow")


SQL_DAILY_CHANGE = """WITH d AS (
  SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day, event_type,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM events WHERE ts IS NOT NULL GROUP BY 1, 2)
SELECT day, event_type, n,
  n - lag(n) OVER (PARTITION BY event_type ORDER BY day) AS delta
FROM d"""


_WEEK_US = 7 * 86_400_000_000


def q_weekly_retention(sf_dir: str):
    """Week-over-week user retention: users active in week w AND week
    w+1, counted per w — the cohort-health primitive. Per-batch
    distinct (user, week) pairs bound the shuffle; the per-user-bucket
    kernel dedups globally and finds retained weeks with ONE adjacent
    comparison (weeks are distinct and sorted per user, so w+7d
    present ⇔ the next entry equals it); a final tiny groupby sums
    per-bucket week counts."""
    import numpy as np

    n_buckets = adaptive_buckets(_nrows(sf_dir, "events"))

    def tag(t: pa.Table) -> pa.Table:
        week = pc.cast(pc.floor_temporal(t.column("ts"), unit="week"),
                       pa.int64())
        sub = pa.table({"u": t.column("user_id"), "w": week}) \
            .filter(pc.is_valid(week))
        d = sub.group_by(["u", "w"]).aggregate([])
        return d.append_column("bucket", int_bucket(d.column("u"),
                                                    n_buckets))

    def grp(g: pa.Table) -> pa.Table:
        u = g.column("u").to_numpy(zero_copy_only=False)
        w = g.column("w").to_numpy(zero_copy_only=False)
        order = np.lexsort((w, u))
        u, w = u[order], w[order]
        # global dedup of the per-batch distinct partials
        keep = np.append(True, (u[1:] != u[:-1]) | (w[1:] != w[:-1])) \
            if len(u) else np.array([], bool)
        u, w = u[keep], w[keep]
        retained = (u[1:] == u[:-1]) & (w[1:] - w[:-1] == _WEEK_US)
        weeks, cnt = np.unique(w[:-1][retained], return_counts=True)
        return pa.table({"week": pa.array(weeks, pa.int64()),
                         "cnt": pa.array(cnt.astype(np.int64),
                                         pa.int64())})

    def sum_week(g: pa.Table) -> pa.Table:
        total = pc.sum(g.column("cnt")).as_py()
        return pa.table({
            "week": g.column("week").slice(0, 1).combine_chunks()
            .cast(pa.timestamp("us")),
            "n_retained": pa.array([total], pa.int64())})

    return _read(sf_dir, "events", ["user_id", "ts"]) \
        .map_batches(tag, batch_format="pyarrow") \
        .groupby("bucket").map_groups(grp, batch_format="pyarrow") \
        .groupby("week").map_groups(sum_week, batch_format="pyarrow")


SQL_WEEKLY_RETENTION = """WITH p AS (
  SELECT DISTINCT user_id,
    CAST(date_trunc('week', ts) AS TIMESTAMP) AS week
  FROM events WHERE ts IS NOT NULL)
SELECT a.week, CAST(COUNT(*) AS BIGINT) AS n_retained
FROM p a JOIN p b ON b.user_id = a.user_id
  AND b.week = a.week + INTERVAL '7 days'
GROUP BY a.week"""


def q_revenue_by_segment(sf_dir: str):
    """Three-table star join (TPC-H-Q3 family): revenue per
    (market segment, order month). The PLAN is the point — the
    dimension (customer) broadcasts once into an actor-pool enrich on
    the orders scan (no shuffle for the small side), and only the
    fact×fact edge (lineitem ⋈ enriched orders) pays the hash-shuffle
    exchange; revenue is per-row floor-cents int64 (exact associative
    sum), and the final groupby moves batch × (segment × month)
    fixed-width partials. A dimension too big for one object would
    flip the enrich to a second hash_join — same result, one more
    exchange."""
    import numpy as np
    from .joins import hash_join

    side = pq.read_table(f"{sf_dir}/customer.parquet",
                         columns=["c_custkey", "c_mktsegment"]) \
        .rename_columns(["o_custkey", "c_mktsegment"])
    enr = Enricher(rows=side, key_fields=("o_custkey",),
                   target_prefix="", miss_flag=False)

    def orders_prep(t: pa.Table) -> pa.Table:
        e = enr(t)
        # inner-join mirror: a dangling/null o_custkey enriches to a
        # null segment and must NOT survive (the oracle's JOIN drops it)
        e = e.filter(pc.is_valid(e.column("c_mktsegment")))
        return pa.table({
            "o_orderkey": e.column("o_orderkey"),
            "c_mktsegment": e.column("c_mktsegment"),
            "month": pc.floor_temporal(e.column("o_orderdate"),
                                       unit="month")})

    orders = _read(sf_dir, "orders",
                   ["o_orderkey", "o_custkey", "o_orderdate"]) \
        .map_batches(orders_prep, batch_format="pyarrow")
    li = _read(sf_dir, "lineitem",
               ["l_orderkey", "l_extendedprice", "l_discount"])
    nparts = adaptive_buckets(
        _nrows(sf_dir, "lineitem") + _nrows(sf_dir, "orders"),
        target_rows=500_000, lo=4, hi=1 << 16)
    joined = hash_join(li, orders, on="l_orderkey",
                       right_on="o_orderkey", how="inner",
                       num_partitions=nparts)

    def partial(t: pa.Table) -> pa.Table:
        ep = t.column("l_extendedprice").to_numpy(zero_copy_only=False)
        disc = t.column("l_discount").to_numpy(zero_copy_only=False)
        cents = np.floor(ep * (1.0 - disc) * 100.0).astype(np.int64)
        tt = pa.table({"c_mktsegment": t.column("c_mktsegment"),
                       "month": t.column("month"),
                       "rev": pa.array(cents, pa.int64())})
        g = tt.group_by(["c_mktsegment", "month"]).aggregate(
            [("rev", "sum"), ("rev", "count")])
        return pa.table({
            "c_mktsegment": g.column("c_mktsegment"),
            "month": g.column("month"),
            "revenue_cents": g.column("rev_sum"),
            "n_items": pc.cast(g.column("rev_count"), pa.int64())})

    small = joined.map_batches(partial, batch_format="pyarrow")
    return _combine_partials(small, ["c_mktsegment", "month"],
                             {"revenue_cents": "revenue_cents",
                              "n_items": "n_items"})


SQL_REVENUE_BY_SEGMENT = """
SELECT c_mktsegment,
  CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month,
  CAST(SUM(CAST(FLOOR(l_extendedprice * (1.0 - l_discount) * 100.0)
                AS BIGINT)) AS BIGINT) AS revenue_cents,
  CAST(COUNT(*) AS BIGINT) AS n_items
FROM lineitem
JOIN orders ON o_orderkey = l_orderkey
JOIN customer ON c_custkey = o_custkey
GROUP BY c_mktsegment, month"""


def q_users_per_type(sf_dir: str):
    """Exact grouped COUNT(DISTINCT): distinct users per event type.
    Two-level distinct: per-batch distinct (type, user) pairs prune
    duplicates where the data sits, ONE fixed-width pair shuffle
    keyed by a user-hash bucket (each user's pairs co-locate, so the
    per-group dedup is globally exact and group size is bounded by
    the bucket target — per-TYPE groups would grow with the user
    count), then a tiny per-type driver combine. Null users skipped
    (COUNT DISTINCT convention)."""
    import numpy as np

    n_buckets = adaptive_buckets(_nrows(sf_dir, "events"))

    def tag(t: pa.Table) -> pa.Table:
        sub = pa.table({"event_type": t.column("event_type"),
                        "u": t.column("user_id")}) \
            .filter(pc.is_valid(t.column("user_id")))
        d = sub.group_by(["event_type", "u"]).aggregate([])
        return d.append_column("bucket", int_bucket(d.column("u"),
                                                    n_buckets))

    def grp(g: pa.Table) -> pa.Table:
        d = g.group_by(["event_type", "u"]).aggregate([])
        c = d.group_by("event_type").aggregate([("u", "count")])
        return pa.table({"event_type": c.column("event_type"),
                         "n_users": pc.cast(c.column("u_count"),
                                            pa.int64())})

    small = _read(sf_dir, "events", ["event_type", "user_id"]) \
        .map_batches(tag, batch_format="pyarrow") \
        .groupby("bucket").map_groups(grp, batch_format="pyarrow")
    return _combine_partials(small, ["event_type"],
                             {"n_users": "n_users"})


SQL_USERS_PER_TYPE = """
SELECT event_type, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
FROM events GROUP BY event_type"""


_PIVOT_TYPES = ("click", "error", "purchase", "signup", "view")


def q_pivot_counts(sf_dir: str):
    """Cross-tab reshaping: event counts per ISO weekday pivoted into
    one column per event type (the report-table shape). Per-batch
    (dow, type) count partials are fixed-width; the pivot itself runs
    on the driver over the tiny combined table (7 × types rows)."""

    def partial(t: pa.Table) -> pa.Table:
        dow = pc.day_of_week(t.column("ts"), count_from_zero=False,
                             week_start=1)  # ISO: Monday=1 .. Sunday=7
        g = pa.table({"dow": pc.cast(dow, pa.int64()),
                      "event_type": t.column("event_type")}) \
            .filter(pc.is_valid(t.column("ts"))) \
            .group_by(["dow", "event_type"]).aggregate([("dow", "count")])
        return pa.table({"dow": g.column("dow"),
                         "event_type": g.column("event_type"),
                         "n": pc.cast(g.column("dow_count"), pa.int64())})

    small = _read(sf_dir, "events", ["ts", "event_type"]) \
        .map_batches(partial, batch_format="pyarrow")
    flat = _combine_partials(small, ["dow", "event_type"], {"n": "n"})
    dows = sorted(set(flat.column("dow").to_pylist()))
    counts = {(r["dow"], r["event_type"]): r["n"]
              for r in flat.to_pylist()}
    cols: dict = {"dow": pa.array(dows, pa.int64())}
    for typ in _PIVOT_TYPES:
        cols[f"n_{typ}"] = pa.array(
            [counts.get((d, typ), 0) for d in dows], pa.int64())
    return pa.table(cols)


SQL_PIVOT_COUNTS = """
SELECT CAST(isodow(ts) AS BIGINT) AS dow,
  CAST(COUNT(*) FILTER (WHERE event_type = 'click') AS BIGINT)
    AS n_click,
  CAST(COUNT(*) FILTER (WHERE event_type = 'error') AS BIGINT)
    AS n_error,
  CAST(COUNT(*) FILTER (WHERE event_type = 'purchase') AS BIGINT)
    AS n_purchase,
  CAST(COUNT(*) FILTER (WHERE event_type = 'signup') AS BIGINT)
    AS n_signup,
  CAST(COUNT(*) FILTER (WHERE event_type = 'view') AS BIGINT)
    AS n_view
FROM events WHERE ts IS NOT NULL GROUP BY dow"""


def q_left_join_agg(sf_dir: str):
    """LEFT OUTER join with the aggregate pushed BELOW the join:
    per-order count of heavy lineitems (quantity > 45), null for
    orders with none. The pre-join groupby means the exchange moves
    one fixed-width row per (batch, order) instead of every heavy
    lineitem row — aggregation-pushdown, the plan shape that matters
    when the fact side dwarfs the key side; the left-outer edge then
    keeps every order (the oracle's LEFT JOIN null semantics)."""
    from .joins import hash_join

    # finalize keyed by a COARSE bucket (the users_per_type shape):
    # a per-order-key map_groups would run one python call per
    # distinct key — per-key groups that grow with the corpus
    n_buckets = adaptive_buckets(_nrows(sf_dir, "lineitem"))

    def heavy_partial(t: pa.Table) -> pa.Table:
        f = t.filter(pc.greater(t.column("l_quantity"), 45))
        g = f.group_by("l_orderkey").aggregate([("l_orderkey", "count")])
        return pa.table({
            "l_orderkey": g.column("l_orderkey"),
            "cnt": pc.cast(g.column("l_orderkey_count"), pa.int64()),
            "bucket": int_bucket(g.column("l_orderkey"), n_buckets)})

    def heavy_final(g: pa.Table) -> pa.Table:
        gg = g.group_by("l_orderkey").aggregate([("cnt", "sum")])
        return pa.table({
            "l_orderkey": gg.column("l_orderkey"),
            "n_heavy": pc.cast(gg.column("cnt_sum"), pa.int64())})

    heavy = _read(sf_dir, "lineitem", ["l_orderkey", "l_quantity"]) \
        .map_batches(heavy_partial, batch_format="pyarrow") \
        .groupby("bucket") \
        .map_groups(heavy_final, batch_format="pyarrow")
    orders = _read(sf_dir, "orders", ["o_orderkey", "o_orderpriority"])
    nparts = adaptive_buckets(
        _nrows(sf_dir, "orders") + _nrows(sf_dir, "lineitem"),
        target_rows=500_000, lo=4, hi=1 << 16)
    return hash_join(orders, heavy, on="o_orderkey",
                     right_on="l_orderkey", how="left",
                     num_partitions=nparts)


SQL_LEFT_JOIN_AGG = """WITH h AS (
  SELECT l_orderkey, CAST(COUNT(*) AS BIGINT) AS n_heavy
  FROM lineitem WHERE l_quantity > 45 GROUP BY l_orderkey)
SELECT o_orderkey, o_orderpriority, h.n_heavy
FROM orders LEFT JOIN h ON h.l_orderkey = o_orderkey"""


def q_chunk_docs(sf_dir: str):
    """Context-window chunking (200-codepoint windows, stride 150):
    narrow flat-map explode, one vectorized slice pass per window
    index (`textops/curation.chunk_text`)."""
    from .textops.curation import chunk_text

    def fn(t: pa.Table) -> pa.Table:
        return chunk_text(t, size=200, stride=150)

    return _read(sf_dir, "documents", ["doc_id", "text"]) \
        .map_batches(fn, batch_format="pyarrow")


SQL_CHUNK_DOCS = """
SELECT doc_id, CAST(i AS BIGINT) AS chunk_idx,
       substr(text, 1 + CAST(i AS INT) * 150, 200) AS chunk_text
FROM (SELECT doc_id, text,
        unnest(generate_series(0,
          CAST((length(text) - 1) // 150 AS BIGINT))) AS i
      FROM documents WHERE length(text) > 0)"""


_BURST_GAP_US = 6 * 3_600_000_000


def q_burst_dedup(sf_dir: str):
    """Proximity dedup: drop repeats of the same (user, type) within
    6 hours of the previous kept-or-dropped occurrence — the
    retried-event / duplicate-beacon suppression step (LAG-gap filter,
    the FILTERING member of the event_gaps/sessionization family).
    Bucketed cogroup by user; per group one lexsort + vectorized
    adjacent-gap mask."""
    import numpy as np

    n_buckets = adaptive_buckets(_nrows(sf_dir, "events"))

    def add_bucket(t: pa.Table) -> pa.Table:
        return t.append_column(
            "bucket", int_bucket(t.column("user_id"), n_buckets))

    def grp(g: pa.Table) -> pa.Table:
        u = g.column("user_id").to_numpy(zero_copy_only=False)
        eid = g.column("event_id").to_numpy(zero_copy_only=False)
        ts = pc.cast(g.column("ts"), pa.int64()) \
            .to_numpy(zero_copy_only=False)
        tcode = pc.dictionary_encode(
            g.column("event_type").combine_chunks()).indices \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        order, new_run, gap = _lag_scaffold([u, tcode], ts, eid)
        keep = new_run | (gap > _BURST_GAP_US)
        return g.take(pa.array(order[np.nonzero(keep)[0]], pa.int64())) \
            .select(["event_id", "user_id", "event_type", "ts"])

    return _read(sf_dir, "events",
                 ["event_id", "user_id", "event_type", "ts"]) \
        .map_batches(add_bucket, batch_format="pyarrow") \
        .groupby("bucket").map_groups(grp, batch_format="pyarrow")


SQL_BURST_DEDUP = f"""WITH g AS (
  SELECT event_id, user_id, event_type, ts,
    date_diff('microsecond',
              lag(ts) OVER (PARTITION BY user_id, event_type
                            ORDER BY ts, event_id), ts) AS gap
  FROM events)
SELECT event_id, user_id, event_type, ts FROM g
WHERE gap IS NULL OR gap > {_BURST_GAP_US}"""


def q_cooccurrence(sf_dir: str):
    """Market-basket co-occurrence: for every unordered pair of event
    types, how many users did BOTH — the self-join-on-entity pattern
    (tag/label co-occurrence in a curation pipeline). Per-batch
    distinct (user, type) pairs bound the shuffle; the per-user-bucket
    kernel dedups globally and explodes each user's sorted type set
    into its C(m,2) pairs with a fully vectorized repeat/arange
    expansion (m ≤ the type cardinality, so the explode is bounded per
    user); a tiny (type, type) combine finishes on the driver."""
    import numpy as np

    n_buckets = adaptive_buckets(_nrows(sf_dir, "events"))

    def tag(t: pa.Table) -> pa.Table:
        d = pa.table({"u": t.column("user_id"),
                      "event_type": t.column("event_type")}) \
            .group_by(["u", "event_type"]).aggregate([])
        return d.append_column("bucket", int_bucket(d.column("u"),
                                                    n_buckets))

    def grp(g: pa.Table) -> pa.Table:
        u = g.column("u").to_numpy(zero_copy_only=False)
        enc = pc.dictionary_encode(g.column("event_type")
                                   .combine_chunks())
        vals = np.asarray(enc.dictionary.to_pylist(), dtype=object)
        # dictionary codes are first-seen order; SQL's a < b compares
        # STRINGS — re-rank codes lexicographically
        rank_of = np.empty(len(vals), np.int64)
        sort_idx = np.argsort(vals)
        rank_of[sort_idx] = np.arange(len(vals))
        vals_sorted = vals[sort_idx]
        tc = rank_of[enc.indices.to_numpy(zero_copy_only=False)
                     .astype(np.int64)]
        order = np.lexsort((tc, u))
        us, tcs = u[order], tc[order]
        keep = np.append(True, (us[1:] != us[:-1]) | (tcs[1:] != tcs[:-1])) \
            if len(us) else np.array([], bool)
        us, tcs = us[keep], tcs[keep]
        starts = np.flatnonzero(np.append(True, us[1:] != us[:-1])) \
            if len(us) else np.array([], np.int64)
        cnts = np.diff(np.append(starts, len(us)))
        run_of = np.repeat(np.arange(len(starts)), cnts)
        pos = np.arange(len(us)) - starts[run_of]
        reps = cnts[run_of] - pos - 1
        lefts = np.repeat(np.arange(len(us)), reps)
        tot = int(reps.sum())
        block = np.concatenate([[0], np.cumsum(reps)[:-1]]).astype(
            np.int64) if len(reps) else np.array([], np.int64)
        rights = lefts + 1 + (np.arange(tot) - np.repeat(block, reps))
        pair = tcs[lefts] * np.int64(len(vals) + 1) + tcs[rights]
        uniq, n = np.unique(pair, return_counts=True)
        ta = (uniq // (len(vals) + 1)).astype(np.int64)
        tb = (uniq % (len(vals) + 1)).astype(np.int64)
        return pa.table({
            "type_a": pa.array(vals_sorted[ta], pa.string()),
            "type_b": pa.array(vals_sorted[tb], pa.string()),
            "n_users": pa.array(n.astype(np.int64), pa.int64())})

    small = _read(sf_dir, "events", ["user_id", "event_type"]) \
        .map_batches(tag, batch_format="pyarrow") \
        .groupby("bucket").map_groups(grp, batch_format="pyarrow")
    return _combine_partials(small, ["type_a", "type_b"],
                             {"n_users": "n_users"})


SQL_COOCCURRENCE = """WITH p AS (
  SELECT DISTINCT user_id, event_type FROM events)
SELECT a.event_type AS type_a, b.event_type AS type_b,
       CAST(COUNT(*) AS BIGINT) AS n_users
FROM p a JOIN p b ON a.user_id = b.user_id
  AND a.event_type < b.event_type
GROUP BY type_a, type_b"""


def _ntile_front_loaded(rnk, n: int, k: int = 10):
    """SQL NTILE(k) assignment from a 1-based rank: the first n%k
    tiles take one extra row (property-tested against a direct
    simulation of SQL's sizes). Shared by ntile_deciles and
    decile_transition so the arithmetic cannot drift."""
    import numpy as np

    q_sz, rem = divmod(n, k)
    if q_sz == 0:
        return rnk
    cut = rem * (q_sz + 1)
    return np.where(rnk <= cut,
                    (rnk + q_sz) // (q_sz + 1),
                    rem + (rnk - cut + q_sz - 1) // q_sz)


def q_ntile_deciles(sf_dir: str):
    """NTILE(10) decile summary over the global (value, id) order —
    the score-band report (how do the corpus deciles look). Rides the
    `global_row_number` scaffold (two-level cells, no global sort);
    decile assignment is pure arithmetic on the rank with SQL NTILE's
    front-loaded sizes (first N%10 tiles get the extra row), so the
    only additions are one narrow count pass for N and a tiny
    (decile, n, min, max) partial fold."""
    import numpy as np
    from .aggregates import global_row_number

    # N = non-NaN row count: one narrow pass over the single needed
    # column (the footer row count can't see NaNs)
    n_total = 0
    for t in _read(sf_dir, "events", ["value"]) \
            .map_batches(
                lambda t: pa.table({"n": pa.array(
                    [len(t) - np.count_nonzero(np.isnan(
                        t.column("value").to_numpy(
                            zero_copy_only=False)))], pa.int64())}),
                batch_format="pyarrow") \
            .iter_batches(batch_size=None, batch_format="pyarrow"):
        n_total += int(pc.sum(t.column("n")).as_py() or 0)

    ranked = global_row_number(
        _read(sf_dir, "events", ["event_id", "value"]),
        value_col="value", id_col="event_id", scale=100,
        id_max=_footer_max(sf_dir, "events", "event_id"))

    def partial(t: pa.Table) -> pa.Table:
        rnk = t.column("rnk").to_numpy(zero_copy_only=False)
        cents = t.column("value_cents").to_numpy(zero_copy_only=False)
        dec = _ntile_front_loaded(rnk, n_total)
        g = pa.table({"decile": pa.array(dec.astype(np.int64),
                                         pa.int64()),
                      "c": pa.array(cents, pa.int64())}) \
            .group_by("decile").aggregate(
                [("c", "count"), ("c", "min"), ("c", "max")])
        return pa.table({
            "decile": g.column("decile"),
            "n": pc.cast(g.column("c_count"), pa.int64()),
            "mn": g.column("c_min"), "mx": g.column("c_max")})

    merged = pa.concat_tables(list(
        ranked.map_batches(partial, batch_format="pyarrow")
        .iter_batches(batch_size=None, batch_format="pyarrow")))
    agg = merged.group_by("decile").aggregate(
        [("n", "sum"), ("mn", "min"), ("mx", "max")])
    return pa.table({"decile": agg.column("decile"),
                     "n": agg.column("n_sum"),
                     "min_cents": agg.column("mn_min"),
                     "max_cents": agg.column("mx_max")})


SQL_NTILE_DECILES = """WITH r AS (
  SELECT CAST(FLOOR(value * 100) AS BIGINT) AS cents,
         NTILE(10) OVER (ORDER BY FLOOR(value * 100), event_id) AS d
  FROM events WHERE NOT isnan(value))
SELECT CAST(d AS BIGINT) AS decile, CAST(COUNT(*) AS BIGINT) AS n,
       MIN(cents) AS min_cents, MAX(cents) AS max_cents
FROM r GROUP BY d"""


def q_new_users_daily(sf_dir: str):
    """Daily new-user arrivals + cumulative audience size — the
    corpus-growth report. First-seen day per user is an associative
    MIN: per-batch (user, min day) partials, ONE fixed-width shuffle
    keyed by a user-hash bucket (each user's partials co-locate, so
    the per-group min is globally exact), per-bucket day counts, then
    a days-sized driver fold for the running total (bounded by the
    time range, like daily_change)."""
    import numpy as np

    n_buckets = adaptive_buckets(_nrows(sf_dir, "events"))

    def tag(t: pa.Table) -> pa.Table:
        day = pc.floor_temporal(t.column("ts"), unit="day")
        sub = pa.table({"u": t.column("user_id"), "day": day}) \
            .filter(pc.and_(pc.is_valid(day),
                            pc.is_valid(t.column("user_id"))))
        d = sub.group_by("u").aggregate([("day", "min")])
        return pa.table({"u": d.column("u"),
                         "day": d.column("day_min"),
                         "bucket": int_bucket(d.column("u"),
                                              n_buckets)})

    def grp(g: pa.Table) -> pa.Table:
        first = g.group_by("u").aggregate([("day", "min")])
        c = first.group_by("day_min").aggregate([("u", "count")])
        return pa.table({"day": c.column("day_min"),
                         "n_new": pc.cast(c.column("u_count"),
                                          pa.int64())})

    small = _read(sf_dir, "events", ["user_id", "ts"]) \
        .map_batches(tag, batch_format="pyarrow") \
        .groupby("bucket").map_groups(grp, batch_format="pyarrow")
    per_day = _combine_partials(small, ["day"], {"n_new": "n_new"})
    di = pc.cast(per_day.column("day"), pa.int64()) \
        .to_numpy(zero_copy_only=False)
    n = per_day.column("n_new").to_numpy(zero_copy_only=False)
    order = np.argsort(di)
    di, n = di[order], n[order]
    return pa.table({
        "day": pa.array(di, pa.int64()).cast(pa.timestamp("us")),
        "n_new": pa.array(n, pa.int64()),
        "cum_users": pa.array(np.cumsum(n).astype(np.int64),
                              pa.int64())})


SQL_NEW_USERS_DAILY = """WITH f AS (
  SELECT user_id,
    MIN(CAST(date_trunc('day', ts) AS TIMESTAMP)) AS day
  FROM events WHERE ts IS NOT NULL AND user_id IS NOT NULL
  GROUP BY user_id)
SELECT day, CAST(COUNT(*) AS BIGINT) AS n_new,
  CAST(SUM(COUNT(*)) OVER (ORDER BY day) AS BIGINT) AS cum_users
FROM f GROUP BY day"""


def q_longest_streak(sf_dir: str):
    """Longest run of CONSECUTIVE active days per user — the classic
    gaps-and-islands window chain (engagement streaks), done with no
    window function: per-batch distinct (user, epoch-day) pairs bound
    the shuffle; the per-user-bucket kernel dedups globally, then
    island id = day − per-user-rank (constant within a consecutive
    run), run lengths via one reduceat, per-user max via a second
    reduceat — runs stay contiguous per user after the lexsort, so
    the whole kernel is three numpy passes."""
    import numpy as np

    n_buckets = adaptive_buckets(_nrows(sf_dir, "events"))
    day_us = 86_400_000_000

    def tag(t: pa.Table) -> pa.Table:
        day = pc.floor_temporal(t.column("ts"), unit="day")
        sub = pa.table({"u": t.column("user_id"),
                        "d": pc.cast(day, pa.int64())}) \
            .filter(pc.and_(pc.is_valid(day),
                            pc.is_valid(t.column("user_id"))))
        d = sub.group_by(["u", "d"]).aggregate([])
        return d.append_column("bucket", int_bucket(d.column("u"),
                                                    n_buckets))

    def grp(g: pa.Table) -> pa.Table:
        u = g.column("u").to_numpy(zero_copy_only=False)
        d = g.column("d").to_numpy(zero_copy_only=False) // day_us
        order = np.lexsort((d, u))
        u, d = u[order], d[order]
        keep = np.append(True, (u[1:] != u[:-1]) | (d[1:] != d[:-1])) \
            if len(u) else np.array([], bool)
        u, d = u[keep], d[keep]
        user_start = np.append(True, u[1:] != u[:-1]) if len(u) \
            else np.array([], bool)
        starts = np.flatnonzero(user_start)
        run_idx = np.repeat(np.arange(len(starts)),
                            np.diff(np.append(starts, len(u))))
        pos = np.arange(len(u)) - starts[run_idx]
        anchor = d - pos
        new_run = user_start | np.append(
            False, anchor[1:] != anchor[:-1])
        run_starts = np.flatnonzero(new_run)
        lens = np.diff(np.append(run_starts, len(u)))
        run_user = u[run_starts]
        first_of_user = np.append(True, run_user[1:] != run_user[:-1]) \
            if len(run_user) else np.array([], bool)
        ustarts = np.flatnonzero(first_of_user)
        best = np.maximum.reduceat(lens, ustarts) if len(ustarts) \
            else np.array([], np.int64)
        return pa.table({
            "user_id": pa.array(run_user[ustarts], pa.int64()),
            "streak": pa.array(best.astype(np.int64), pa.int64())})

    return _read(sf_dir, "events", ["user_id", "ts"]) \
        .map_batches(tag, batch_format="pyarrow") \
        .groupby("bucket").map_groups(grp, batch_format="pyarrow")


SQL_LONGEST_STREAK = """WITH d AS (
  SELECT DISTINCT user_id,
    datediff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS di
  FROM events WHERE ts IS NOT NULL AND user_id IS NOT NULL),
r AS (SELECT user_id, di,
        di - ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY di)
          AS anch
      FROM d),
s AS (SELECT user_id, CAST(COUNT(*) AS BIGINT) AS run
      FROM r GROUP BY user_id, anch)
SELECT user_id, MAX(run) AS streak FROM s GROUP BY user_id"""


def q_grouped_corr(sf_dir: str):
    """Exact grouped correlation MOMENTS between value-cents and
    hour-of-day per event type — the feature-correlation scan. All
    five co-moment sums are associative int64 partials (groups ×
    batch fixed-width, no shuffle); the driver emits the exact
    integer numerators n·Σxy−ΣxΣy / n·Σx²−(Σx)² / n·Σy²−(Σy)²
    (python-int combine, so the products can't wrap) — correlation
    itself is a float divide the caller does, kept out of the output
    so the cross-engine hash stays exact. At 100 TB the partials
    stay int64-safe up to ~9e18 per sum; past that the same partials
    switch to mean-centered (Welford) form."""
    import numpy as np

    def partial(t: pa.Table) -> pa.Table:
        v = t.column("value").to_numpy(zero_copy_only=False)
        ok = ~np.isnan(v) & pc.is_valid(t.column("ts")) \
            .to_numpy(zero_copy_only=False)
        x = np.floor(v[ok] * 100.0).astype(np.int64)
        y = pc.hour(t.column("ts")).to_numpy(zero_copy_only=False)[ok] \
            .astype(np.int64)
        tt = pa.table({
            "event_type": pc.array_filter(
                t.column("event_type").combine_chunks(),
                pa.array(ok)),
            "x": pa.array(x, pa.int64()), "y": pa.array(y, pa.int64()),
            "xx": pa.array(x * x, pa.int64()),
            "yy": pa.array(y * y, pa.int64()),
            "xy": pa.array(x * y, pa.int64())})
        g = tt.group_by("event_type").aggregate(
            [("x", "sum"), ("y", "sum"), ("xx", "sum"),
             ("yy", "sum"), ("xy", "sum"), ("x", "count")])
        return pa.table({
            "event_type": g.column("event_type"),
            "sx": g.column("x_sum"), "sy": g.column("y_sum"),
            "sxx": g.column("xx_sum"), "syy": g.column("yy_sum"),
            "sxy": g.column("xy_sum"),
            "n": pc.cast(g.column("x_count"), pa.int64())})

    small = _read(sf_dir, "events", ["event_type", "value", "ts"]) \
        .map_batches(partial, batch_format="pyarrow")
    comb = _combine_partials(small, ["event_type"],
                             {"sx": "sx", "sy": "sy", "sxx": "sxx",
                              "syy": "syy", "sxy": "sxy", "n": "n"})
    rows = comb.to_pylist()
    return pa.table({
        "event_type": pa.array([r["event_type"] for r in rows],
                               pa.string()),
        "n": pa.array([r["n"] for r in rows], pa.int64()),
        "cov_num": pa.array(
            [r["n"] * r["sxy"] - r["sx"] * r["sy"] for r in rows],
            pa.int64()),
        "varx_num": pa.array(
            [r["n"] * r["sxx"] - r["sx"] * r["sx"] for r in rows],
            pa.int64()),
        "vary_num": pa.array(
            [r["n"] * r["syy"] - r["sy"] * r["sy"] for r in rows],
            pa.int64())})


SQL_GROUPED_CORR = """WITH p AS (
  SELECT event_type,
    CAST(FLOOR(value * 100) AS BIGINT) AS x,
    CAST(EXTRACT(hour FROM ts) AS BIGINT) AS y
  FROM events WHERE NOT isnan(value) AND ts IS NOT NULL)
SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
  CAST(COUNT(*) * SUM(x*y) - SUM(x) * SUM(y) AS BIGINT) AS cov_num,
  CAST(COUNT(*) * SUM(x*x) - SUM(x) * SUM(x) AS BIGINT) AS varx_num,
  CAST(COUNT(*) * SUM(y*y) - SUM(y) * SUM(y) AS BIGINT) AS vary_num
FROM p GROUP BY event_type"""


def q_top_user_per_type(sf_dir: str):
    """Heaviest key per group (modal contributor): the single most
    active user per event type, ties to the smallest user id. Argmax
    is NOT associative across arbitrary splits of the same (type,
    user) pair — so the shuffle keys on a USER-hash bucket (each
    pair's partial counts co-locate and sum exactly), each bucket
    emits one candidate per type, and the tiny driver fold picks the
    global winner over buckets × types candidates."""
    import numpy as np

    n_buckets = adaptive_buckets(_nrows(sf_dir, "events"))

    def tag(t: pa.Table) -> pa.Table:
        sub = pa.table({"event_type": t.column("event_type"),
                        "u": t.column("user_id")}) \
            .filter(pc.is_valid(t.column("user_id")))
        g = sub.group_by(["event_type", "u"]).aggregate([("u", "count")])
        return pa.table({
            "event_type": g.column("event_type"), "u": g.column("u"),
            "cnt": pc.cast(g.column("u_count"), pa.int64()),
            "bucket": int_bucket(g.column("u"), n_buckets)})

    def grp(g: pa.Table) -> pa.Table:
        comb = g.group_by(["event_type", "u"]).aggregate(
            [("cnt", "sum")])
        u = comb.column("u").to_numpy(zero_copy_only=False)
        c = comb.column("cnt_sum").to_numpy(zero_copy_only=False)
        enc = pc.dictionary_encode(comb.column("event_type")
                                   .combine_chunks())
        tcode = enc.indices.to_numpy(zero_copy_only=False)
        # best per type: sort (type, -cnt, u), take first of each type
        order = np.lexsort((u, -c, tcode))
        tcode, u, c = tcode[order], u[order], c[order]
        first = np.append(True, tcode[1:] != tcode[:-1]) if len(tcode) \
            else np.array([], bool)
        return pa.table({
            "event_type": pc.take(enc.dictionary,
                                  pa.array(tcode[first], pa.int32())),
            "top_user": pa.array(u[first], pa.int64()),
            "n_events": pa.array(c[first], pa.int64())})

    cands = pa.concat_tables(list(
        _read(sf_dir, "events", ["event_type", "user_id"])
        .map_batches(tag, batch_format="pyarrow")
        .groupby("bucket").map_groups(grp, batch_format="pyarrow")
        .iter_batches(batch_size=None, batch_format="pyarrow")))
    import numpy as np
    u = cands.column("top_user").to_numpy(zero_copy_only=False)
    c = cands.column("n_events").to_numpy(zero_copy_only=False)
    enc = pc.dictionary_encode(cands.column("event_type")
                               .combine_chunks())
    tcode = enc.indices.to_numpy(zero_copy_only=False)
    order = np.lexsort((u, -c, tcode))
    tcode, u, c = tcode[order], u[order], c[order]
    first = np.append(True, tcode[1:] != tcode[:-1]) if len(tcode) \
        else np.array([], bool)
    return pa.table({
        "event_type": pc.take(enc.dictionary,
                              pa.array(tcode[first], pa.int32())),
        "top_user": pa.array(u[first], pa.int64()),
        "n_events": pa.array(c[first], pa.int64())})


SQL_TOP_USER_PER_TYPE = """WITH c AS (
  SELECT event_type, user_id, CAST(COUNT(*) AS BIGINT) AS cnt
  FROM events WHERE user_id IS NOT NULL GROUP BY 1, 2)
SELECT event_type, user_id AS top_user, cnt AS n_events
FROM c
QUALIFY ROW_NUMBER() OVER (PARTITION BY event_type
                           ORDER BY cnt DESC, user_id) = 1"""


def q_full_outer_series(sf_dir: str):
    """FULL OUTER equi-join (the join family's last missing `how`):
    hourly click counts vs hourly purchase counts, hours present on
    only one side keeping SQL's null-on-the-other-side semantics.
    Each side pre-aggregates per batch to fixed-width (hour, n)
    partials (bounded by the time range, never the corpus) before the
    join, so the distributed hash exchange —
    `joins.hash_join(how='full')`, Ray's native full_outer shuffle
    join, which coalesces the key across sides — moves only the two
    bounded series."""
    from .joins import hash_join

    def side(t: pa.Table, typ: str, out: str) -> pa.Table:
        sub = pa.table({
            "h": pc.cast(pc.floor_temporal(t.column("ts"), unit="hour"),
                         pa.int64())}) \
            .filter(pc.and_(pc.equal(t.column("event_type"), typ),
                            pc.is_valid(t.column("ts"))))
        g = sub.group_by("h").aggregate([("h", "count")])
        return pa.table({"h": g.column("h"),
                         out: pc.cast(g.column("h_count"), pa.int64())})

    def series(typ: str, out: str):
        import ray.data as rd
        part = _read(sf_dir, "events", ["event_type", "ts"]) \
            .map_batches(lambda t, typ=typ, out=out: side(t, typ, out),
                         batch_format="pyarrow")
        # fold the bounded partials driver-side and re-ship with a
        # KNOWN schema: Ray's join aggregator builds a zero-column
        # empty table for a hash partition that received no blocks
        # from an unknown-schema side (map_groups output) and acero
        # then fails the key FieldRef — from_arrow sides are immune
        return rd.from_arrow(_combine_partials(part, ["h"],
                                               {out: out}))

    joined = hash_join(series("click", "n_click"),
                       series("purchase", "n_purchase"),
                       on="h", how="full", num_partitions=4)

    def out(t: pa.Table) -> pa.Table:
        return pa.table({
            "hour": pc.cast(t.column("h"), pa.timestamp("us")),
            "n_click": t.column("n_click"),
            "n_purchase": t.column("n_purchase")})

    return joined.map_batches(out, batch_format="pyarrow")


SQL_FULL_OUTER_SERIES = """WITH c AS (
  SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS h,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM events WHERE event_type = 'click' AND ts IS NOT NULL GROUP BY 1),
p AS (
  SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS h,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM events WHERE event_type = 'purchase' AND ts IS NOT NULL
  GROUP BY 1)
SELECT COALESCE(c.h, p.h) AS hour, c.n AS n_click, p.n AS n_purchase
FROM c FULL OUTER JOIN p ON c.h = p.h"""


def q_transition_counts(sf_dir: str):
    """Event-sequence transition matrix (Markov-chain mining): counts
    of (event_type → next event_type) pairs per user under the total
    order (ts, event_id). Sequence adjacency is NOT associative across
    splits, so rows shuffle ONCE keyed by a user-hash bucket; each
    bucket lexsorts its users' events, pairs adjacent same-user rows
    with one shifted comparison, and pre-counts its (src, dst) pairs —
    the driver fold combines types² × buckets fixed-width partials."""
    import numpy as np

    n_buckets = adaptive_buckets(_nrows(sf_dir, "events"))

    def tag(t: pa.Table) -> pa.Table:
        sub = pa.table({"u": t.column("user_id"),
                        "ts": pc.cast(t.column("ts"), pa.int64()),
                        "eid": t.column("event_id"),
                        "et": t.column("event_type")}) \
            .filter(pc.and_(pc.is_valid(t.column("user_id")),
                            pc.is_valid(t.column("ts"))))
        return sub.append_column("bucket", int_bucket(sub.column("u"),
                                                      n_buckets))

    def grp(g: pa.Table) -> pa.Table:
        u = g.column("u").to_numpy(zero_copy_only=False)
        ts = g.column("ts").to_numpy(zero_copy_only=False)
        eid = g.column("eid").to_numpy(zero_copy_only=False)
        enc = pc.dictionary_encode(g.column("et").combine_chunks())
        code = enc.indices.to_numpy(zero_copy_only=False)
        order = np.lexsort((eid, ts, u))
        u, code = u[order], code[order]
        same = u[1:] == u[:-1]
        src, dst = code[:-1][same], code[1:][same]
        k = len(enc.dictionary)
        pair, cnt = np.unique(src.astype(np.int64) * k + dst,
                              return_counts=True)
        return pa.table({
            "src": pc.take(enc.dictionary, pa.array(pair // k,
                                                    pa.int32())),
            "dst": pc.take(enc.dictionary, pa.array(pair % k,
                                                    pa.int32())),
            "n": pa.array(cnt.astype(np.int64), pa.int64())})

    small = _read(sf_dir, "events",
                  ["event_id", "user_id", "ts", "event_type"]) \
        .map_batches(tag, batch_format="pyarrow") \
        .groupby("bucket").map_groups(grp, batch_format="pyarrow")
    return _combine_partials(small, ["src", "dst"], {"n": "n"})


SQL_TRANSITION_COUNTS = """WITH s AS (
  SELECT user_id, event_type,
    LEAD(event_type) OVER (PARTITION BY user_id
                           ORDER BY ts, event_id) AS nxt
  FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL)
SELECT event_type AS src, nxt AS dst, CAST(COUNT(*) AS BIGINT) AS n
FROM s WHERE nxt IS NOT NULL GROUP BY 1, 2"""


def q_quantile_cont(sf_dir: str):
    """Interpolated (continuous) grouped quantiles — SQL
    ``quantile_cont`` semantics where the rank falls between two
    values (`aggregates.grouped_quantile_cont`): exact IQR per event
    type from the same bounded (key, quantum, count) partials as the
    discrete `quantiles`, interpolation restricted to dyadic q so the
    float output hashes identically across engines."""
    from .aggregates import grouped_quantile_cont
    return grouped_quantile_cont(
        _read(sf_dir, "events", ["event_type", "value"]),
        value_col="value", by="event_type", qs=(0.25, 0.5, 0.75))


SQL_QUANTILE_CONT = """WITH c AS (
  SELECT event_type, CAST(FLOOR(value * 100) AS BIGINT) AS q
  FROM events WHERE NOT isnan(value))
SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
  quantile_cont(q, 0.25) AS p25_cont,
  quantile_cont(q, 0.5) AS p50_cont,
  quantile_cont(q, 0.75) AS p75_cont
FROM c GROUP BY event_type"""


def q_cohort_matrix(sf_dir: str):
    """Full cohort-retention matrix: users grouped by first-active
    week (the cohort), counted per week-offset since that cohort —
    `weekly_retention`'s adjacent-week check widened to every offset.
    Per-batch distinct (user, week) pairs bound the ONE user-bucket
    shuffle; each bucket dedups globally, takes the per-user MIN week
    from the sorted run (its first element), and pre-counts
    (cohort, offset) cells; the driver fold combines weeks² × buckets
    fixed-width partials."""
    import numpy as np

    n_buckets = adaptive_buckets(_nrows(sf_dir, "events"))

    def tag(t: pa.Table) -> pa.Table:
        week = pc.cast(pc.floor_temporal(t.column("ts"), unit="week"),
                       pa.int64())
        sub = pa.table({"u": t.column("user_id"), "w": week}) \
            .filter(pc.and_(pc.is_valid(week),
                            pc.is_valid(t.column("user_id"))))
        d = sub.group_by(["u", "w"]).aggregate([])
        return d.append_column("bucket", int_bucket(d.column("u"),
                                                    n_buckets))

    def grp(g: pa.Table) -> pa.Table:
        u = g.column("u").to_numpy(zero_copy_only=False)
        w = g.column("w").to_numpy(zero_copy_only=False)
        order = np.lexsort((w, u))
        u, w = u[order], w[order]
        keep = np.append(True, (u[1:] != u[:-1]) | (w[1:] != w[:-1])) \
            if len(u) else np.array([], bool)
        u, w = u[keep], w[keep]
        user_start = np.append(True, u[1:] != u[:-1]) if len(u) \
            else np.array([], bool)
        starts = np.flatnonzero(user_start)
        run_idx = np.repeat(np.arange(len(starts)),
                            np.diff(np.append(starts, len(u))))
        cohort = w[starts][run_idx]          # per-user MIN week
        offset = (w - cohort) // _WEEK_US
        # no integer packing: cohort is epoch-MICROSECOND scale, so a
        # cohort*K+offset key would overflow int64 — group the two
        # columns directly
        cells = pa.table({"cw": pa.array(cohort, pa.int64()),
                          "offset_weeks": pa.array(offset, pa.int64())}) \
            .group_by(["cw", "offset_weeks"]) \
            .aggregate([("cw", "count")])
        return pa.table({
            "cw": cells.column("cw"),
            "offset_weeks": cells.column("offset_weeks"),
            "n": pc.cast(cells.column("cw_count"), pa.int64())})

    small = _read(sf_dir, "events", ["user_id", "ts"]) \
        .map_batches(tag, batch_format="pyarrow") \
        .groupby("bucket").map_groups(grp, batch_format="pyarrow")
    comb = _combine_partials(small, ["cw", "offset_weeks"], {"n": "n"})
    return pa.table({
        "cohort_week": pc.cast(comb.column("cw"), pa.timestamp("us")),
        "offset_weeks": comb.column("offset_weeks"),
        "n_active": comb.column("n")})


SQL_COHORT_MATRIX = """WITH d AS (
  SELECT DISTINCT user_id,
    CAST(date_trunc('week', ts) AS TIMESTAMP) AS week
  FROM events WHERE ts IS NOT NULL AND user_id IS NOT NULL),
f AS (SELECT user_id, week,
        MIN(week) OVER (PARTITION BY user_id) AS cohort FROM d)
SELECT cohort AS cohort_week,
  (epoch_us(week) - epoch_us(cohort)) // 604800000000
    AS offset_weeks,
  CAST(COUNT(*) AS BIGINT) AS n_active
FROM f GROUP BY 1, 2"""


def q_gap_fill_hours(sf_dir: str):
    """Time-series gap filling (resampling to a dense grid): hourly
    event counts with every missing hour between the corpus min and
    max ZERO-filled — the step that makes a sparse series chartable /
    joinable on a regular grid. Per-batch (hour, n) partials bound
    everything by the time range; the dense grid is one driver-side
    ``np.arange`` scatter over the folded series (SQL mirror:
    generate_series LEFT JOIN COALESCE)."""
    import numpy as np

    def partial(t: pa.Table) -> pa.Table:
        sub = pa.table({
            "h": pc.cast(pc.floor_temporal(t.column("ts"), unit="hour"),
                         pa.int64())}) \
            .filter(pc.is_valid(t.column("ts")))
        g = sub.group_by("h").aggregate([("h", "count")])
        return pa.table({"h": g.column("h"),
                         "n": pc.cast(g.column("h_count"), pa.int64())})

    small = _read(sf_dir, "events", ["ts"]) \
        .map_batches(partial, batch_format="pyarrow")
    comb = _combine_partials(small, ["h"], {"n": "n"})
    h = comb.column("h").to_numpy(zero_copy_only=False)
    n = comb.column("n").to_numpy(zero_copy_only=False)
    hour_us = 3_600_000_000
    grid = np.arange(h.min(), h.max() + hour_us, hour_us)
    dense = np.zeros(len(grid), np.int64)
    dense[(h - h.min()) // hour_us] = n
    return pa.table({
        "hour": pa.array(grid, pa.int64()).cast(pa.timestamp("us")),
        "n": pa.array(dense, pa.int64())})


SQL_GAP_FILL_HOURS = """WITH c AS (
  SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS h,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM events WHERE ts IS NOT NULL GROUP BY 1),
g AS (SELECT unnest(generate_series((SELECT MIN(h) FROM c),
                                    (SELECT MAX(h) FROM c),
                                    INTERVAL 1 HOUR)) AS h)
SELECT g.h AS hour, COALESCE(c.n, 0) AS n
FROM g LEFT JOIN c ON c.h = g.h"""


def q_rolling_active_users(sf_dir: str):
    """7-day rolling active users (the DAU→WAU series): for each
    window day, distinct users active in [day−6, day]. Windowed
    COUNT(DISTINCT) decomposes exactly: per-batch distinct (user, day)
    pairs bound the ONE user-bucket shuffle; each bucket dedups
    globally, explodes each pair to its 7 window days (np.repeat +
    tile), dedups (user, window) WITHIN the bucket — users co-locate,
    so that dedup is globally exact — and pre-counts per window day;
    the driver fold sums days × buckets fixed-width partials."""
    import numpy as np

    n_buckets = adaptive_buckets(_nrows(sf_dir, "events"))
    day_us = 86_400_000_000

    def tag(t: pa.Table) -> pa.Table:
        day = pc.cast(pc.floor_temporal(t.column("ts"), unit="day"),
                      pa.int64())
        sub = pa.table({"u": t.column("user_id"), "d": day}) \
            .filter(pc.and_(pc.is_valid(day),
                            pc.is_valid(t.column("user_id"))))
        d = sub.group_by(["u", "d"]).aggregate([])
        return d.append_column("bucket", int_bucket(d.column("u"),
                                                    n_buckets))

    def grp(g: pa.Table) -> pa.Table:
        u = g.column("u").to_numpy(zero_copy_only=False)
        d = g.column("d").to_numpy(zero_copy_only=False)
        uu = np.repeat(u, 7)
        wd = np.repeat(d, 7) + np.tile(
            np.arange(7, dtype=np.int64) * day_us, len(d))
        # dedup (user, window day): a user active on several days of
        # one window must count once — two-column unique via lexsort
        order = np.lexsort((wd, uu))
        uu, wd = uu[order], wd[order]
        keep = np.append(True, (uu[1:] != uu[:-1]) | (wd[1:] != wd[:-1])) \
            if len(uu) else np.array([], bool)
        days, cnt = np.unique(wd[keep], return_counts=True)
        return pa.table({"d": pa.array(days, pa.int64()),
                         "n": pa.array(cnt.astype(np.int64), pa.int64())})

    small = _read(sf_dir, "events", ["user_id", "ts"]) \
        .map_batches(tag, batch_format="pyarrow") \
        .groupby("bucket").map_groups(grp, batch_format="pyarrow")
    comb = _combine_partials(small, ["d"], {"n": "n"})
    return pa.table({
        "day": pc.cast(comb.column("d"), pa.timestamp("us")),
        "n_active_7d": comb.column("n")})


SQL_ROLLING_ACTIVE_USERS = """WITH d AS (
  SELECT DISTINCT user_id,
    CAST(date_trunc('day', ts) AS TIMESTAMP) AS day
  FROM events WHERE ts IS NOT NULL AND user_id IS NOT NULL),
w AS (SELECT user_id, day + INTERVAL 1 DAY * k.k AS wd
      FROM d, range(7) k(k))
SELECT wd AS day, CAST(COUNT(DISTINCT user_id) AS BIGINT)
  AS n_active_7d
FROM w GROUP BY wd"""


def q_sample_uniform(sf_dir: str, k: int = 100):
    """Deterministic exact-k uniform sample — the distributed
    reservoir-sample equivalent with NO shuffle and no RNG: rank every
    row by a multiplicative hash of its id (uniform over ids,
    partition-invariant, reproducible), keep each batch's k smallest
    as a partial, and let the tiny driver fold merge batches × k
    candidates. The modular form ``(id mod M)·A mod M`` keeps every
    intermediate below 2^63 for ANY id, so the SQL mirror needs no
    HUGEINT."""
    import numpy as np

    M, A = 1_000_000_007, 2_654_435_761

    def partial(t: pa.Table) -> pa.Table:
        eid = t.column("event_id").to_numpy(zero_copy_only=False)
        h = (eid % M).astype(np.int64) * A % M
        take = min(k, len(h))
        # k smallest by (h, eid): argpartition on h then exact sort of
        # the candidate head (ties on h resolved by id)
        cand = np.argpartition(h, take - 1)[:take] if take else \
            np.array([], np.int64)
        order = cand[np.lexsort((eid[cand], h[cand]))]
        return pa.table({
            "event_id": pa.array(eid[order], pa.int64()),
            "user_id": t.column("user_id").take(pa.array(order)),
            "event_type": t.column("event_type").take(pa.array(order)),
            "h": pa.array(h[order], pa.int64())})

    merged = pa.concat_tables(list(
        _read(sf_dir, "events", ["event_id", "user_id", "event_type"])
        .map_batches(partial, batch_format="pyarrow")
        .iter_batches(batch_size=None, batch_format="pyarrow")))
    top = merged.sort_by([("h", "ascending"), ("event_id", "ascending")]) \
        .slice(0, k)
    return top.select(["event_id", "user_id", "event_type"])


SQL_SAMPLE_UNIFORM = """SELECT event_id, user_id, event_type
FROM events
ORDER BY (event_id % 1000000007) * 2654435761 % 1000000007, event_id
LIMIT 100"""


def q_min_value_rows(sf_dir: str):
    """Per-group argmin RETRIEVAL (TPC-H Q2 family): every event row
    achieving its type's minimum value — unlike `top_user_per_type`'s
    single winner, ties all come back. Two narrow passes: fixed-width
    (type, min) partials fold to a tiny threshold table the driver
    BROADCASTS into a filter stage closure (the aggregate→broadcast→
    filter-back plan — no self-join, no shuffle)."""
    import numpy as np

    def min_partial(t: pa.Table) -> pa.Table:
        v = t.column("value").to_numpy(zero_copy_only=False)
        ok = ~np.isnan(v)
        cents = np.floor(v * 100.0)
        tt = pa.table({"event_type": t.column("event_type")
                       .filter(pa.array(ok)),
                       "c": pa.array(cents[ok].astype(np.int64),
                                     pa.int64())})
        g = tt.group_by("event_type").aggregate([("c", "min")])
        return pa.table({"event_type": g.column("event_type"),
                         "mn": g.column("c_min")})

    small = _read(sf_dir, "events", ["event_type", "value"]) \
        .map_batches(min_partial, batch_format="pyarrow")
    merged = pa.concat_tables(list(
        small.iter_batches(batch_size=None, batch_format="pyarrow")))
    agg = merged.group_by("event_type").aggregate([("mn", "min")])
    thr_types = agg.column("event_type").combine_chunks()
    thr_mins = agg.column("mn_min").to_numpy(zero_copy_only=False)

    def pick(t: pa.Table) -> pa.Table:
        v = t.column("value").to_numpy(zero_copy_only=False)
        cents = np.floor(v * 100.0)
        # vectorized threshold lookup: index_in against the broadcast
        # type list, unseen types -> sentinel (never equal)
        idx = pc.fill_null(pc.index_in(t.column("event_type"),
                                       value_set=thr_types), -1) \
            .to_numpy(zero_copy_only=False)
        miss = idx < 0
        thr = thr_mins[np.where(miss, 0, idx)]
        ok = ~np.isnan(v) & ~miss & (cents == thr)
        sel = t.filter(pa.array(ok))
        return pa.table({
            "event_id": sel.column("event_id"),
            "event_type": sel.column("event_type"),
            "min_cents": pa.array(
                np.floor(sel.column("value")
                         .to_numpy(zero_copy_only=False) * 100.0)
                .astype(np.int64), pa.int64())})

    return _read(sf_dir, "events", ["event_id", "event_type", "value"]) \
        .map_batches(pick, batch_format="pyarrow")


SQL_MIN_VALUE_ROWS = """WITH c AS (
  SELECT event_id, event_type,
         CAST(FLOOR(value * 100) AS BIGINT) AS cents
  FROM events WHERE NOT isnan(value))
SELECT event_id, event_type, cents AS min_cents FROM c
QUALIFY cents = MIN(cents) OVER (PARTITION BY event_type)"""


def q_mad_per_type(sf_dir: str):
    """Grouped robust spread: median absolute deviation of value-cents
    per event type (`aggregates.grouped_mad`) — `anomaly_events`' global
    median+MAD core turned into a per-group statistic. Two narrow
    (key, quantum, count)-partial passes, median table broadcast into
    the second; no corpus-sized shuffle."""
    from .aggregates import grouped_mad
    return grouped_mad(_read(sf_dir, "events", ["event_type", "value"]))


# quantile_disc at q=0.5 == the repo's ceil-rule selection (see
# grouped_mad docstring), so the mirror can use the native aggregate.
SQL_MAD_PER_TYPE = """WITH c AS (
  SELECT event_type, CAST(FLOOR(value * 100) AS BIGINT) AS q
  FROM events WHERE NOT isnan(value)),
m AS (SELECT event_type, quantile_disc(q, 0.5) AS med FROM c GROUP BY 1)
SELECT c.event_type, CAST(COUNT(*) AS BIGINT) AS n,
       quantile_disc(ABS(c.q - m.med), 0.5) AS mad_cents
FROM c JOIN m USING (event_type) GROUP BY c.event_type"""


def q_conversion_lag(sf_dir: str):
    """First-touch conversion latency: per user, microseconds from the
    FIRST view to the FIRST purchase, emitted only when the purchase
    came strictly after (the funnel-latency primitive). MIN is
    associative, so each batch pre-aggregates to (user, side, min_ts)
    partials — ≤ 2 rows per user per batch — and ONE user-bucket
    shuffle folds them; the per-bucket kernel is a lexsort + adjacent
    pair check (each user ends with at most one view row then one
    purchase row)."""
    import numpy as np

    n_buckets = adaptive_buckets(_nrows(sf_dir, "events"))

    def tag(t: pa.Table) -> pa.Table:
        keep = pc.and_(
            pc.is_in(t.column("event_type"),
                     value_set=pa.array(["view", "purchase"])),
            pc.and_(pc.is_valid(t.column("user_id")),
                    pc.is_valid(t.column("ts"))))
        sel = t.filter(keep)
        tt = pa.table({"u": sel.column("user_id"),
                       "p": pc.equal(sel.column("event_type"),
                                     "purchase"),
                       "ts": pc.cast(sel.column("ts"), pa.int64())})
        g = tt.group_by(["u", "p"]).aggregate([("ts", "min")])
        out = pa.table({"u": g.column("u"), "p": g.column("p"),
                        "mts": g.column("ts_min")})
        return out.append_column("bucket", int_bucket(out.column("u"),
                                                      n_buckets))

    def grp(g: pa.Table) -> pa.Table:
        u = g.column("u").to_numpy(zero_copy_only=False)
        is_p = g.column("p").to_numpy(zero_copy_only=False)
        mts = g.column("mts").to_numpy(zero_copy_only=False)
        order = np.lexsort((mts, is_p, u))
        u, is_p, mts = u[order], is_p[order], mts[order]
        # min per (user, side) = first row of each sorted run
        first = np.ones(len(u), bool)
        first[1:] = (u[1:] != u[:-1]) | (is_p[1:] != is_p[:-1])
        u, mts = u[first], mts[first]
        # view sorts before purchase (False < True): a user with both
        # sides is exactly the adjacent same-user pair (view, purchase)
        both = u[1:] == u[:-1]
        vt, pt, uu = mts[:-1][both], mts[1:][both], u[:-1][both]
        keep = pt > vt
        return pa.table({"user_id": pa.array(uu[keep], pa.int64()),
                         "lag_us": pa.array((pt - vt)[keep],
                                            pa.int64())})

    return _read(sf_dir, "events", ["user_id", "ts", "event_type"]) \
        .map_batches(tag, batch_format="pyarrow") \
        .groupby("bucket").map_groups(grp, batch_format="pyarrow")


SQL_CONVERSION_LAG = """WITH
v AS (SELECT user_id, MIN(ts) AS vt FROM events
      WHERE event_type = 'view' AND user_id IS NOT NULL GROUP BY 1),
p AS (SELECT user_id, MIN(ts) AS pt FROM events
      WHERE event_type = 'purchase' AND user_id IS NOT NULL GROUP BY 1)
SELECT v.user_id,
       CAST(date_diff('microseconds', v.vt, p.pt) AS BIGINT) AS lag_us
FROM v JOIN p USING (user_id) WHERE p.pt > v.vt"""


_PATH_K = 3


def q_user_paths(sf_dir: str):
    """User-journey mining: the ordered event-type path of each user's
    first `_PATH_K` events (total order (ts, event_id)), counted per
    distinct path — the ORDERED STRING AGGREGATION shape
    (``string_agg ... ORDER BY``). Sequence order is not associative
    across splits, so rows shuffle ONCE keyed by user-hash bucket;
    each bucket lexsorts, takes the first K per user run with a
    repeat/aranges gather, builds the path strings in one
    ``ListArray`` + ``binary_join`` pass, and pre-counts its paths —
    the driver fold combines ≤ types^K × buckets fixed-width rows.
    The K-prefix cap is part of the operator contract: it bounds both
    the per-user state and the output cardinality at any corpus size."""
    import numpy as np

    n_buckets = adaptive_buckets(_nrows(sf_dir, "events"))

    def tag(t: pa.Table) -> pa.Table:
        sub = pa.table({"u": t.column("user_id"),
                        "ts": pc.cast(t.column("ts"), pa.int64()),
                        "eid": t.column("event_id"),
                        "et": t.column("event_type")}) \
            .filter(pc.and_(pc.is_valid(t.column("user_id")),
                            pc.and_(pc.is_valid(t.column("ts")),
                                    pc.is_valid(t.column("event_type")))))
        return sub.append_column("bucket", int_bucket(sub.column("u"),
                                                      n_buckets))

    def grp(g: pa.Table) -> pa.Table:
        u = g.column("u").to_numpy(zero_copy_only=False)
        ts = g.column("ts").to_numpy(zero_copy_only=False)
        eid = g.column("eid").to_numpy(zero_copy_only=False)
        et = g.column("et").combine_chunks()
        order, new_run, _ = _lag_scaffold([u], ts, eid)
        starts = np.flatnonzero(new_run)
        take = np.minimum(
            np.diff(np.append(starts, len(order))), _PATH_K)
        cum = np.cumsum(take)
        total = int(cum[-1]) if len(cum) else 0
        within = np.arange(total) - np.repeat(cum - take, take)
        idx = order[np.repeat(starts, take) + within]
        vals = pc.take(et, pa.array(idx, pa.int64()))
        offsets = pa.array(np.concatenate(([0], cum)).astype(np.int32),
                           pa.int32())
        paths = pc.binary_join(pa.ListArray.from_arrays(offsets, vals),
                               ">")
        gg = pa.table({"path": paths}).group_by("path") \
            .aggregate([("path", "count")])
        return pa.table({"path": gg.column("path"),
                         "n": pc.cast(gg.column("path_count"),
                                      pa.int64())})

    small = _read(sf_dir, "events",
                  ["event_id", "user_id", "ts", "event_type"]) \
        .map_batches(tag, batch_format="pyarrow") \
        .groupby("bucket").map_groups(grp, batch_format="pyarrow")
    return _combine_partials(small, ["path"], {"n": "n_users"})


SQL_USER_PATHS = f"""WITH r AS (
  SELECT user_id, event_type,
    ROW_NUMBER() OVER (PARTITION BY user_id
                       ORDER BY ts, event_id) AS rn
  FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL
    AND event_type IS NOT NULL),
p AS (SELECT user_id, string_agg(event_type, '>' ORDER BY rn) AS path
      FROM r WHERE rn <= {_PATH_K} GROUP BY 1)
SELECT path, CAST(COUNT(*) AS BIGINT) AS n_users FROM p GROUP BY 1"""


def q_second_event(sf_dir: str):
    """Per-group Nth-row retrieval (``ROW_NUMBER() = 2``): each user's
    SECOND event type under the (ts, event_id) total order — the
    onboarding-analysis "what do users do right after signup" shape,
    distinct from `top_user_per_type`'s value-argmax and
    `new_users_daily`'s first-seen MIN (position 2 is not expressible
    as an associative aggregate). One user-bucket shuffle; per bucket
    the shared lexsort scaffold marks run starts and a single gather
    picks ``start+1`` where the run has ≥ 2 rows."""
    import numpy as np

    n_buckets = adaptive_buckets(_nrows(sf_dir, "events"))

    def tag(t: pa.Table) -> pa.Table:
        sub = pa.table({"u": t.column("user_id"),
                        "ts": pc.cast(t.column("ts"), pa.int64()),
                        "eid": t.column("event_id"),
                        "et": t.column("event_type")}) \
            .filter(pc.and_(pc.is_valid(t.column("user_id")),
                            pc.is_valid(t.column("ts"))))
        return sub.append_column("bucket", int_bucket(sub.column("u"),
                                                      n_buckets))

    def grp(g: pa.Table) -> pa.Table:
        u = g.column("u").to_numpy(zero_copy_only=False)
        ts = g.column("ts").to_numpy(zero_copy_only=False)
        eid = g.column("eid").to_numpy(zero_copy_only=False)
        order, new_run, _ = _lag_scaffold([u], ts, eid)
        starts = np.flatnonzero(new_run)
        lens = np.diff(np.append(starts, len(order)))
        sel = order[starts[lens >= 2] + 1]
        return pa.table({
            "user_id": pa.array(u[sel], pa.int64()),
            "second_type": g.column("et").combine_chunks()
            .take(pa.array(sel, pa.int64()))})

    return _read(sf_dir, "events",
                 ["event_id", "user_id", "ts", "event_type"]) \
        .map_batches(tag, batch_format="pyarrow") \
        .groupby("bucket").map_groups(grp, batch_format="pyarrow")


SQL_SECOND_EVENT = """WITH r AS (
  SELECT user_id, event_type,
    ROW_NUMBER() OVER (PARTITION BY user_id
                       ORDER BY ts, event_id) AS rn
  FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL)
SELECT user_id, event_type AS second_type FROM r WHERE rn = 2"""


def q_view_no_buy_days(sf_dir: str):
    """Same-table distinct-set EXCEPT: (user, day) pairs that saw a
    view but NO purchase — the engaged-but-didn't-convert slice
    (`anti_join` is two-table; this is the SQL ``EXCEPT`` shape over
    one scan). Each batch pre-distincts (user, day, is_view) — bounded
    by users × days per batch — then ONE user-bucket shuffle; the
    per-bucket kernel is a pure-Arrow group_by keeping (user, day)
    groups where ``min(is_view)`` is true (every event that day was a
    view)."""
    n_buckets = adaptive_buckets(_nrows(sf_dir, "events"))

    def tag(t: pa.Table) -> pa.Table:
        keep = pc.and_(
            pc.is_in(t.column("event_type"),
                     value_set=pa.array(["view", "purchase"])),
            pc.and_(pc.is_valid(t.column("user_id")),
                    pc.is_valid(t.column("ts"))))
        sel = t.filter(keep)
        tt = pa.table({
            "u": sel.column("user_id"),
            "d": pc.cast(pc.floor_temporal(sel.column("ts"),
                                           unit="day"), pa.int64()),
            "isv": pc.equal(sel.column("event_type"), "view")})
        g = tt.group_by(["u", "d", "isv"]).aggregate([])
        return g.append_column("bucket", int_bucket(g.column("u"),
                                                    n_buckets))

    def grp(g: pa.Table) -> pa.Table:
        agg = g.group_by(["u", "d"]).aggregate([("isv", "min")])
        out = agg.filter(agg.column("isv_min"))
        return pa.table({
            "user_id": out.column("u"),
            "day": pc.cast(out.column("d"), pa.timestamp("us"))})

    return _read(sf_dir, "events", ["user_id", "ts", "event_type"]) \
        .map_batches(tag, batch_format="pyarrow") \
        .groupby("bucket").map_groups(grp, batch_format="pyarrow")


SQL_VIEW_NO_BUY_DAYS = """
SELECT DISTINCT user_id, CAST(date_trunc('day', ts) AS TIMESTAMP) AS day
FROM events WHERE event_type = 'view' AND user_id IS NOT NULL
  AND ts IS NOT NULL
EXCEPT
SELECT DISTINCT user_id, CAST(date_trunc('day', ts) AS TIMESTAMP)
FROM events WHERE event_type = 'purchase' AND user_id IS NOT NULL
  AND ts IS NOT NULL"""


def q_scd2_intervals(sf_dir: str):
    """Change-data-capture interval construction (SCD type-2): per
    user, consecutive runs of the SAME event_type (under the
    (ts, event_id) total order) compress to one validity interval
    ``[valid_from, valid_to)`` — ``valid_to`` is the next state
    change's timestamp, NULL for the user's current state. The
    state-history/temporal-table build step. One user-bucket shuffle;
    the per-bucket kernel is the shared lexsort scaffold + one shifted
    type-code comparison, then a gather of run starts."""
    import numpy as np

    n_buckets = adaptive_buckets(_nrows(sf_dir, "events"))

    def tag(t: pa.Table) -> pa.Table:
        sub = pa.table({"u": t.column("user_id"),
                        "ts": pc.cast(t.column("ts"), pa.int64()),
                        "eid": t.column("event_id"),
                        "et": t.column("event_type")}) \
            .filter(pc.and_(pc.is_valid(t.column("user_id")),
                            pc.and_(pc.is_valid(t.column("ts")),
                                    pc.is_valid(t.column("event_type")))))
        return sub.append_column("bucket", int_bucket(sub.column("u"),
                                                      n_buckets))

    def grp(g: pa.Table) -> pa.Table:
        u = g.column("u").to_numpy(zero_copy_only=False)
        ts = g.column("ts").to_numpy(zero_copy_only=False)
        eid = g.column("eid").to_numpy(zero_copy_only=False)
        enc = pc.dictionary_encode(g.column("et").combine_chunks())
        code = enc.indices.to_numpy(zero_copy_only=False)
        order, new_run, _ = _lag_scaffold([u], ts, eid)
        cs, us, tss, eids = code[order], u[order], ts[order], eid[order]
        change = new_run.copy()
        change[1:] |= cs[1:] != cs[:-1]
        starts = np.flatnonzero(change)
        # valid_to = the NEXT run's start ts when it belongs to the
        # same user; the user's last run stays open (NULL)
        nxt_ts = np.empty(len(starts), np.int64)
        closed = np.zeros(len(starts), bool)
        if len(starts) > 1:
            same = us[starts[1:]] == us[starts[:-1]]
            closed[:-1] = same
            nxt_ts[:-1] = tss[starts[1:]]
        return pa.table({
            "user_id": pa.array(us[starts], pa.int64()),
            "state": pc.take(enc.dictionary,
                             pa.array(cs[starts], pa.int32())),
            "valid_from": pa.array(tss[starts], pa.int64())
            .cast(pa.timestamp("us")),
            "start_eid": pa.array(eids[starts], pa.int64()),
            "valid_to": pa.array(
                np.where(closed, nxt_ts, 0).astype(np.int64),
                pa.int64(), mask=~closed).cast(pa.timestamp("us"))})

    return _read(sf_dir, "events",
                 ["event_id", "user_id", "ts", "event_type"]) \
        .map_batches(tag, batch_format="pyarrow") \
        .groupby("bucket").map_groups(grp, batch_format="pyarrow")


SQL_SCD2_INTERVALS = """WITH s AS (
  SELECT user_id, event_type, ts, event_id,
    LAG(event_type) OVER (PARTITION BY user_id
                          ORDER BY ts, event_id) AS prev
  FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL
    AND event_type IS NOT NULL),
c AS (SELECT user_id, event_type AS state, ts AS valid_from,
             event_id AS start_eid
      FROM s WHERE prev IS NULL OR prev != event_type)
SELECT user_id, state, valid_from, start_eid,
  LEAD(valid_from) OVER (PARTITION BY user_id
                         ORDER BY valid_from, start_eid) AS valid_to
FROM c"""


_DENSE_TOPK = 3


def q_dense_topk(sf_dir: str):
    """Grouped DISTINCT top-k (``DENSE_RANK() <= k``): per event type
    the `_DENSE_TOPK` highest distinct value-cents with their dense
    rank. Distinct-selection is associative — the global top-k
    distinct values are contained in the union of per-batch top-k
    distinct values — so each batch compacts to ≤ k × types rows (one
    lexsort + the run-start gather) and the driver re-applies the SAME
    kernel to the concatenated partials; no shuffle at all."""
    import numpy as np

    def topk(types: pa.Array, cents: np.ndarray):
        """(type, cents) distinct → indices of each type's top-k
        distinct cents in (type, cents desc) order."""
        enc = pc.dictionary_encode(types)
        code = enc.indices.to_numpy(zero_copy_only=False)
        order = np.lexsort((-cents, code))
        cs, vs = code[order], cents[order]
        new_t = np.empty(len(order), bool)
        if len(order):
            new_t[0] = True
            new_t[1:] = cs[1:] != cs[:-1]
        starts = np.flatnonzero(new_t)
        take = np.minimum(np.diff(np.append(starts, len(order))),
                          _DENSE_TOPK)
        cum = np.cumsum(take)
        total = int(cum[-1]) if len(cum) else 0
        within = np.arange(total) - np.repeat(cum - take, take)
        sel = order[np.repeat(starts, take) + within]
        rnk = within + 1
        return sel, rnk

    def partial(t: pa.Table) -> pa.Table:
        v = t.column("value").to_numpy(zero_copy_only=False)
        ok = ~np.isnan(v)
        tt = pa.table({"event_type": t.column("event_type")
                       .filter(pa.array(ok)),
                       "cents": pa.array(
                           np.floor(v[ok] * 100).astype(np.int64),
                           pa.int64())})
        d = tt.group_by(["event_type", "cents"]).aggregate([])
        et = d.column("event_type").combine_chunks()
        cents = d.column("cents").to_numpy(zero_copy_only=False)
        sel, _ = topk(et, cents)
        idx = pa.array(sel, pa.int64())
        return pa.table({"event_type": et.take(idx),
                         "cents": pa.array(cents[sel], pa.int64())})

    merged = pa.concat_tables(list(
        _read(sf_dir, "events", ["event_type", "value"])
        .map_batches(partial, batch_format="pyarrow")
        .iter_batches(batch_size=None, batch_format="pyarrow")))
    d = merged.group_by(["event_type", "cents"]).aggregate([])
    et = d.column("event_type").combine_chunks()
    cents = d.column("cents").to_numpy(zero_copy_only=False)
    sel, rnk = topk(et, cents)
    idx = pa.array(sel, pa.int64())
    return pa.table({"event_type": et.take(idx),
                     "cents": pa.array(cents[sel], pa.int64()),
                     "rnk": pa.array(rnk, pa.int64())})


SQL_DENSE_TOPK = f"""WITH c AS (
  SELECT DISTINCT event_type, CAST(FLOOR(value * 100) AS BIGINT) AS cents
  FROM events WHERE NOT isnan(value)),
r AS (SELECT event_type, cents,
        DENSE_RANK() OVER (PARTITION BY event_type
                           ORDER BY cents DESC) AS rnk FROM c)
SELECT event_type, cents, CAST(rnk AS BIGINT) AS rnk FROM r
WHERE rnk <= {_DENSE_TOPK}"""


def q_first_occurrence(sf_dir: str):
    """Keep-FIRST compaction with full-row retrieval: per
    (user, event_type), the first event's timestamp and id under the
    (ts, event_id) total order — `latest_event`'s upsert primitive
    mirrored to first-touch attribution, and REUSING the single-sourced
    `keep_latest` kernel on NEGATED order columns (keep-first ≡
    keep-latest under order reversal). Composite key travels as one
    "<user>|<type>" string (user digits contain no '|', so the coding
    is injective); local per-batch compaction bounds the one keyed
    shuffle at keys × blocks rows."""
    from .aggregates import keep_latest

    n_buckets = adaptive_buckets(_nrows(sf_dir, "events"))

    def tag(t: pa.Table) -> pa.Table:
        sel = t.filter(pc.and_(pc.is_valid(t.column("user_id")),
                               pc.and_(pc.is_valid(t.column("ts")),
                                       pc.is_valid(
                                           t.column("event_type")))))
        tsi = pc.cast(sel.column("ts"), pa.int64())
        return pa.table({
            "user_id": sel.column("user_id"),
            "event_type": sel.column("event_type"),
            "first_ts": sel.column("ts"),
            "first_eid": sel.column("event_id"),
            "__k": pc.binary_join_element_wise(
                pc.cast(sel.column("user_id"), pa.string()),
                sel.column("event_type"), "|"),
            "__neg_ts": pc.negate(tsi),
            "__neg_eid": pc.negate(sel.column("event_id"))})

    def strip(t: pa.Table) -> pa.Table:
        return t.drop_columns(["__k", "__neg_ts", "__neg_eid"])

    tagged = _read(sf_dir, "events",
                   ["event_id", "user_id", "ts", "event_type"]) \
        .map_batches(tag, batch_format="pyarrow")
    return keep_latest(tagged, key="__k",
                       order_by=("__neg_ts", "__neg_eid"),
                       n_buckets=n_buckets) \
        .map_batches(strip, batch_format="pyarrow")


SQL_FIRST_OCCURRENCE = """
SELECT user_id, event_type, ts AS first_ts, event_id AS first_eid
FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL
  AND event_type IS NOT NULL
QUALIFY ROW_NUMBER() OVER (PARTITION BY user_id, event_type
                           ORDER BY ts, event_id) = 1"""


def q_dwell_time(sf_dir: str):
    """LEAD-attribution aggregate: each user's gap to their NEXT event
    is attributed to the CURRENT event's type ("time spent on this
    step"), summed per type — the screen-time/step-duration shape,
    `event_gaps`' LAG diff re-keyed to the earlier row and folded.
    One user-bucket shuffle; per bucket the shared scaffold's adjacent
    diff is attributed to the sorted-previous row's type and
    pre-summed to types × buckets fixed-width partials."""
    import numpy as np

    n_buckets = adaptive_buckets(_nrows(sf_dir, "events"))

    def tag(t: pa.Table) -> pa.Table:
        sub = pa.table({"u": t.column("user_id"),
                        "ts": pc.cast(t.column("ts"), pa.int64()),
                        "eid": t.column("event_id"),
                        "et": t.column("event_type")}) \
            .filter(pc.and_(pc.is_valid(t.column("user_id")),
                            pc.is_valid(t.column("ts"))))
        return sub.append_column("bucket", int_bucket(sub.column("u"),
                                                      n_buckets))

    def grp(g: pa.Table) -> pa.Table:
        u = g.column("u").to_numpy(zero_copy_only=False)
        ts = g.column("ts").to_numpy(zero_copy_only=False)
        eid = g.column("eid").to_numpy(zero_copy_only=False)
        enc = pc.dictionary_encode(g.column("et").combine_chunks())
        code = enc.indices.to_numpy(zero_copy_only=False)
        order, new_run, gap = _lag_scaffold([u], ts, eid)
        has_next = ~new_run[1:]          # row i-1 has a next same-user row
        src = code[order][:-1][has_next]  # attribute to the EARLIER row
        dur = gap[1:][has_next]
        k = len(enc.dictionary)
        cnt = np.bincount(src, minlength=k)
        tot = np.bincount(src, weights=dur.astype(np.float64),
                          minlength=k).astype(np.int64)
        nz = np.flatnonzero(cnt)
        return pa.table({
            "event_type": pc.take(enc.dictionary,
                                  pa.array(nz, pa.int32())),
            "n": pa.array(cnt[nz].astype(np.int64), pa.int64()),
            "us": pa.array(tot[nz], pa.int64())})

    small = _read(sf_dir, "events",
                  ["event_id", "user_id", "ts", "event_type"]) \
        .map_batches(tag, batch_format="pyarrow") \
        .groupby("bucket").map_groups(grp, batch_format="pyarrow")
    return _combine_partials(small, ["event_type"],
                             {"n": "n_gaps", "us": "dwell_us"})


SQL_DWELL_TIME = """WITH s AS (
  SELECT user_id, event_type, ts,
    LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS nxt
  FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL)
SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_gaps,
       CAST(SUM(date_diff('microseconds', ts, nxt)) AS BIGINT)
         AS dwell_us
FROM s WHERE nxt IS NOT NULL GROUP BY 1"""


def q_median_gap_per_user(sf_dir: str):
    """Per-entity order statistic WITHOUT quantization: each user's
    median inter-arrival gap (lower median, the `quantile_from_cdf`
    ceil rule). Because a user's events co-locate in their bucket, the
    median is computed EXACTLY on the raw microsecond gaps inside the
    cogroup — no (quantum, count) sketch needed; this is the
    entity-local complement to `mad_per_type`'s broadcast two-pass.
    One user-bucket shuffle; per bucket two lexsorts (event order,
    then gap order per user) and a rank gather."""
    import numpy as np

    n_buckets = adaptive_buckets(_nrows(sf_dir, "events"))

    def tag(t: pa.Table) -> pa.Table:
        sub = pa.table({"u": t.column("user_id"),
                        "ts": pc.cast(t.column("ts"), pa.int64()),
                        "eid": t.column("event_id")}) \
            .filter(pc.and_(pc.is_valid(t.column("user_id")),
                            pc.is_valid(t.column("ts"))))
        return sub.append_column("bucket", int_bucket(sub.column("u"),
                                                      n_buckets))

    def grp(g: pa.Table) -> pa.Table:
        u = g.column("u").to_numpy(zero_copy_only=False)
        ts = g.column("ts").to_numpy(zero_copy_only=False)
        eid = g.column("eid").to_numpy(zero_copy_only=False)
        order, new_run, gap = _lag_scaffold([u], ts, eid)
        keep = ~new_run
        ug, gv = u[order][keep], gap[keep]
        o2 = np.lexsort((gv, ug))
        ug, gv = ug[o2], gv[o2]
        starts = np.flatnonzero(
            np.append(True, ug[1:] != ug[:-1])) if len(ug) else \
            np.array([], np.int64)
        lens = np.diff(np.append(starts, len(ug)))
        # lower median = 0-based position ceil(n/2) - 1 in sorted gaps
        med = gv[starts + (lens + 1) // 2 - 1] if len(starts) else \
            np.array([], np.int64)
        return pa.table({
            "user_id": pa.array(ug[starts] if len(starts) else
                                np.array([], np.int64), pa.int64()),
            "n_gaps": pa.array(lens.astype(np.int64), pa.int64()),
            "median_gap_us": pa.array(med, pa.int64())})

    return _read(sf_dir, "events", ["event_id", "user_id", "ts"]) \
        .map_batches(tag, batch_format="pyarrow") \
        .groupby("bucket").map_groups(grp, batch_format="pyarrow")


SQL_MEDIAN_GAP_PER_USER = """WITH s AS (
  SELECT user_id, ts,
    LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
  FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL),
g AS (SELECT user_id,
        date_diff('microseconds', prev, ts) AS gap
      FROM s WHERE prev IS NOT NULL)
SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_gaps,
       quantile_disc(gap, 0.5) AS median_gap_us
FROM g GROUP BY 1"""


def q_cluster_radius(sf_dir: str):
    """Cluster-quality metric: per label, the MAX squared quantized
    distance from the label's (rounded) centroid — the radius that
    tells you which clusters are tight and which are junk before
    using them for IVF routing. Two passes, both narrow: pass 1 folds
    the `centroid_sum_partial` labels × dim partials on the driver and
    rounds each centroid component to an int64 quantum
    (``floor(s/n + 0.5)`` — s converts through float64 identically in
    both engines, so the rounding is deterministic even where the
    conversion is lossy); pass 2 broadcasts the centroid matrix and
    emits (label, n, max_sq) per-batch partials (MAX and COUNT are
    associative). dim=64, |q|≲3e6 → per-vector sums ≲2e15, int64-safe."""
    import numpy as np
    from .textops.knn import centroid_sum_partial

    parts = pa.concat_tables(list(
        _read(sf_dir, "embeddings", ["label", "embedding"])
        .map_batches(lambda t: centroid_sum_partial(t),
                     batch_format="pyarrow")
        .iter_batches(batch_size=None, batch_format="pyarrow")))
    agg = parts.group_by(["label", "idx"]).aggregate(
        [("s", "sum"), ("n", "sum")])
    labs = agg.column("label").to_numpy(zero_copy_only=False)
    idxs = agg.column("idx").to_numpy(zero_copy_only=False)
    ss = agg.column("s_sum").to_numpy(zero_copy_only=False)
    ns = agg.column("n_sum").to_numpy(zero_copy_only=False)
    uniq = np.unique(labs)
    d = int(idxs.max())
    cents = np.empty((len(uniq), d), np.int64)
    pos = np.searchsorted(uniq, labs)
    cents[pos, idxs - 1] = np.floor(
        ss.astype(np.float64) / ns + 0.5).astype(np.int64)

    def partial(t: pa.Table) -> pa.Table:
        emb = t.column("embedding")
        emb = emb.combine_chunks() if isinstance(emb, pa.ChunkedArray) \
            else emb
        n = len(emb)
        if n == 0:
            return pa.table({"label": pa.array([], pa.int64()),
                             "n": pa.array([], pa.int64()),
                             "max_sq": pa.array([], pa.int64())})
        q = pc.cast(pc.round(pc.multiply(
            pc.cast(emb.flatten(), pa.float64()), 1_000_000.0),
            round_mode="half_towards_infinity"), pa.int64()) \
            .to_numpy(zero_copy_only=False).reshape(n, d)
        lab = pc.cast(t.column("label"), pa.int64()) \
            .to_numpy(zero_copy_only=False)
        diff = q - cents[np.searchsorted(uniq, lab)]
        sq = np.einsum("ij,ij->i", diff, diff)
        order = np.argsort(lab, kind="stable")
        ls = lab[order]
        u, start = np.unique(ls, return_index=True)
        mx = np.maximum.reduceat(sq[order], start)
        cnt = np.diff(np.append(start, n))
        return pa.table({"label": pa.array(u, pa.int64()),
                         "n": pa.array(cnt.astype(np.int64), pa.int64()),
                         "max_sq": pa.array(mx, pa.int64())})

    small = pa.concat_tables(list(
        _read(sf_dir, "embeddings", ["label", "embedding"])
        .map_batches(partial, batch_format="pyarrow")
        .iter_batches(batch_size=None, batch_format="pyarrow")))
    g = small.group_by("label").aggregate([("n", "sum"),
                                           ("max_sq", "max")])
    return pa.table({"label": g.column("label"),
                     "n": g.column("n_sum"),
                     "max_sq": g.column("max_sq_max")})


SQL_CLUSTER_RADIUS = """WITH q AS (
  SELECT vec_id, label,
    CAST(round(CAST(unnest(embedding) AS DOUBLE) * 1000000)
         AS BIGINT) AS qv,
    generate_subscripts(embedding, 1) AS i
  FROM embeddings),
s AS (SELECT label, i, SUM(qv) AS s, COUNT(*) AS n
      FROM q GROUP BY 1, 2),
c AS (SELECT label, i,
        CAST(FLOOR(CAST(s AS DOUBLE) / n + 0.5) AS BIGINT) AS c
      FROM s),
d AS (SELECT q.vec_id, q.label,
        SUM((qv - c.c) * (qv - c.c)) AS dd
      FROM q JOIN c ON q.label = c.label AND q.i = c.i
      GROUP BY 1, 2)
SELECT CAST(label AS BIGINT) AS label, CAST(COUNT(*) AS BIGINT) AS n,
       CAST(MAX(dd) AS BIGINT) AS max_sq
FROM d GROUP BY 1"""


def q_vocab_per_source(sf_dir: str):
    """Grouped COUNT(DISTINCT token) over exploded text — vocabulary
    size per source, the Heaps-law corpus-diversity check. Distinct
    counting does not decompose per batch, but tokens partition
    DISJOINTLY by hash: each batch emits its distinct (source, token)
    pairs (bounded by batch vocab, not batch tokens), ONE token-hash
    bucket shuffle dedups pairs per bucket, and the per-source counts
    SUM across buckets exactly because no token spans two buckets.
    Tokenizer single-sourced with the other text ops (`flat_tokens`)."""
    from .textops.analysis import flat_tokens

    n_buckets = adaptive_buckets(_nrows(sf_dir, "documents"))

    def tag(t: pa.Table) -> pa.Table:
        row_id, toks, _ = flat_tokens(t.column("text"))
        src = t.column("source").combine_chunks() \
            .take(pa.array(row_id, pa.int64()))
        tt = pa.table({"source": src, "token": toks})
        d = tt.group_by(["source", "token"]).aggregate([])
        return d.append_column(
            "bucket", fnv1a_bucket(d.column("token"), n_buckets))

    def grp(g: pa.Table) -> pa.Table:
        d = g.group_by(["source", "token"]).aggregate([])
        cnt = d.group_by("source").aggregate([("token", "count")])
        return pa.table({"source": cnt.column("source"),
                         "n": pc.cast(cnt.column("token_count"),
                                      pa.int64())})

    small = _read(sf_dir, "documents", ["source", "text"]) \
        .map_batches(tag, batch_format="pyarrow") \
        .groupby("bucket").map_groups(grp, batch_format="pyarrow")
    return _combine_partials(small, ["source"], {"n": "vocab"})


SQL_VOCAB_PER_SOURCE = r"""WITH toks AS (
  SELECT source,
         unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS token
  FROM documents)
SELECT source, CAST(COUNT(DISTINCT token) AS BIGINT) AS vocab
FROM toks GROUP BY 1"""


def q_quartile_bucket(sf_dir: str):
    """Per-row CDF binning against GROUPED thresholds: each event gets
    its type's quartile bin (1–4) — the score→tier normalization step
    (`value_percentile` is the global-rank variant; this is the
    grouped-threshold variant). The discrete p25/p50/p75 thresholds
    come from the shared (key, quantum, count) partials, collect to a
    types × 3 driver table, and broadcast into a narrow filter-free
    map stage (vectorized `index_in` + three comparisons)."""
    import numpy as np
    from .aggregates import grouped_exact_quantiles

    thr = pa.concat_tables(list(
        grouped_exact_quantiles(
            _read(sf_dir, "events", ["event_type", "value"]),
            qs=(0.25, 0.5, 0.75))
        .iter_batches(batch_size=None, batch_format="pyarrow")))
    types = thr.column("event_type").combine_chunks()
    p25 = thr.column("p25_cents").to_numpy(zero_copy_only=False)
    p50 = thr.column("p50_cents").to_numpy(zero_copy_only=False)
    p75 = thr.column("p75_cents").to_numpy(zero_copy_only=False)

    def binit(t: pa.Table) -> pa.Table:
        v = t.column("value").to_numpy(zero_copy_only=False)
        idx = pc.fill_null(pc.index_in(t.column("event_type"),
                                       value_set=types), -1) \
            .to_numpy(zero_copy_only=False)
        ok = ~np.isnan(v) & (idx >= 0)
        sel = t.filter(pa.array(ok))
        cents = np.floor(v[ok] * 100).astype(np.int64)
        i = idx[ok]
        bins = (1 + (cents > p25[i]).astype(np.int64)
                + (cents > p50[i]) + (cents > p75[i]))
        return pa.table({"event_id": sel.column("event_id"),
                         "event_type": sel.column("event_type"),
                         "cents": pa.array(cents, pa.int64()),
                         "bin": pa.array(bins, pa.int64())})

    return _read(sf_dir, "events",
                 ["event_id", "event_type", "value"]) \
        .map_batches(binit, batch_format="pyarrow")


SQL_QUARTILE_BUCKET = """WITH c AS (
  SELECT event_id, event_type, CAST(FLOOR(value * 100) AS BIGINT)
    AS cents FROM events WHERE NOT isnan(value)),
g AS (SELECT event_type, cents AS q, COUNT(*) AS cnt FROM c
      GROUP BY 1, 2),
s AS (SELECT event_type, q,
        SUM(cnt) OVER (PARTITION BY event_type ORDER BY q) AS cum,
        SUM(cnt) OVER (PARTITION BY event_type) AS total FROM g),
t AS (SELECT event_type,
        MIN(CASE WHEN cum >= CEIL(0.25 * total) THEN q END) AS p25,
        MIN(CASE WHEN cum >= CEIL(0.5 * total) THEN q END) AS p50,
        MIN(CASE WHEN cum >= CEIL(0.75 * total) THEN q END) AS p75
      FROM s GROUP BY 1)
SELECT c.event_id, c.event_type, c.cents,
  CAST(1 + (CASE WHEN c.cents > t.p25 THEN 1 ELSE 0 END)
         + (CASE WHEN c.cents > t.p50 THEN 1 ELSE 0 END)
         + (CASE WHEN c.cents > t.p75 THEN 1 ELSE 0 END)
       AS BIGINT) AS bin
FROM c JOIN t USING (event_type)"""


def q_supplier_by_region(sf_dir: str):
    """Snowflake dimension-chain rollup: suppliers counted and their
    account balances summed per REGION, two dimension hops away
    (supplier → nation → region). The chain composes DRIVER-SIDE into
    one nationkey→region dict (both dims are catalog-scale), which
    broadcasts into a single enrich pass over the supplier scan — the
    multi-hop star schema costs ZERO shuffles when the hops are all
    small. Balance cents are floor-int64 (exact associative sum;
    negative balances floor consistently in both engines)."""
    import numpy as np

    nation = pq.read_table(f"{sf_dir}/nation.parquet",
                           columns=["n_nationkey", "n_regionkey"])
    region = pq.read_table(f"{sf_dir}/region.parquet")
    rmap = dict(zip(region.column("r_regionkey").to_pylist(),
                    region.column("r_name").to_pylist()))
    nat_keys = nation.column("n_nationkey").combine_chunks()
    nat_region = pa.array(
        [rmap.get(rk) for rk in
         nation.column("n_regionkey").to_pylist()], pa.string())

    def partial(t: pa.Table) -> pa.Table:
        idx = pc.index_in(t.column("s_nationkey"), value_set=nat_keys)
        rname = nat_region.take(pc.fill_null(idx, 0)) \
            if t.num_rows else pa.array([], pa.string())
        # inner-join mirror: dangling nationkeys drop
        valid = pc.is_valid(idx)
        bal = t.column("s_acctbal").to_numpy(zero_copy_only=False)
        cents = np.floor(bal * 100.0).astype(np.int64)
        tt = pa.table({"r_name": rname,
                       "cents": pa.array(cents, pa.int64())}) \
            .filter(valid)
        g = tt.group_by("r_name").aggregate([("cents", "sum"),
                                             ("cents", "count")])
        return pa.table({"r_name": g.column("r_name"),
                         "bal": g.column("cents_sum"),
                         "n": pc.cast(g.column("cents_count"),
                                      pa.int64())})

    small = _read_dim(sf_dir, "supplier",
                      ["s_nationkey", "s_acctbal"]) \
        .map_batches(partial, batch_format="pyarrow")
    return _combine_partials(small, ["r_name"],
                             {"n": "n_suppliers",
                              "bal": "acctbal_cents"})


SQL_SUPPLIER_BY_REGION = """
SELECT r_name, CAST(COUNT(*) AS BIGINT) AS n_suppliers,
  CAST(SUM(CAST(FLOOR(s_acctbal * 100) AS BIGINT)) AS BIGINT)
    AS acctbal_cents
FROM supplier JOIN nation ON s_nationkey = n_nationkey
              JOIN region ON n_regionkey = r_regionkey
GROUP BY 1"""


def q_brand_revenue(sf_dir: str):
    """Fact-to-dimension broadcast join + rollup: lineitem revenue per
    part BRAND. part is the broadcast side (an `Enricher` actor pool —
    read once into the object store, indexed once per actor), so the
    fact table never shuffles; revenue uses the repo's exact
    floor-cents recipe and the groupby moves batch × brands partials.
    At a scale where part outgrows one object, this flips to
    `hash_join` — same result, one exchange (the `join_revenue`
    plan)."""
    import numpy as np

    side = pq.read_table(f"{sf_dir}/part.parquet",
                         columns=["p_partkey", "p_brand"]) \
        .rename_columns(["l_partkey", "p_brand"])
    enr = Enricher(rows=side, key_fields=("l_partkey",),
                   target_prefix="", miss_flag=False)

    def partial(t: pa.Table) -> pa.Table:
        e = enr(t)
        e = e.filter(pc.is_valid(e.column("p_brand")))
        ep = e.column("l_extendedprice").to_numpy(zero_copy_only=False)
        disc = e.column("l_discount").to_numpy(zero_copy_only=False)
        cents = np.floor(ep * (1.0 - disc) * 100.0).astype(np.int64)
        tt = pa.table({"p_brand": e.column("p_brand"),
                       "rev": pa.array(cents, pa.int64())})
        g = tt.group_by("p_brand").aggregate([("rev", "sum"),
                                              ("rev", "count")])
        return pa.table({"p_brand": g.column("p_brand"),
                         "rev": g.column("rev_sum"),
                         "n": pc.cast(g.column("rev_count"),
                                      pa.int64())})

    small = _read(sf_dir, "lineitem",
                  ["l_partkey", "l_extendedprice", "l_discount"]) \
        .map_batches(partial, batch_format="pyarrow")
    return _combine_partials(small, ["p_brand"],
                             {"rev": "revenue_cents", "n": "n_items"})


SQL_BRAND_REVENUE = """
SELECT p_brand,
  CAST(SUM(CAST(FLOOR(l_extendedprice * (1 - l_discount) * 100.0)
                AS BIGINT)) AS BIGINT) AS revenue_cents,
  CAST(COUNT(*) AS BIGINT) AS n_items
FROM lineitem JOIN part ON l_partkey = p_partkey
GROUP BY 1"""


_TOP_TYPES_K = 2


def q_user_top_types(sf_dir: str):
    """Per-entity top-k by AGGREGATED count: each user's
    `_TOP_TYPES_K` most frequent event types, ranked, ties broken by
    type name — grouped top-k where the ranking measure is itself a
    distributed aggregate (unlike `dense_topk`'s raw-value ranking).
    COUNT partials are associative: each batch emits (user, type,
    count) rows, ONE user-bucket shuffle folds them, and the per-user
    rank is a lexsort where the lexical tie-break rides on
    ``np.unique``'s sorted factorization (code order == name order)."""
    import numpy as np

    n_buckets = adaptive_buckets(_nrows(sf_dir, "events"))

    def tag(t: pa.Table) -> pa.Table:
        sel = pa.table({"u": t.column("user_id"),
                        "et": t.column("event_type")}) \
            .filter(pc.and_(pc.is_valid(t.column("user_id")),
                            pc.is_valid(t.column("event_type"))))
        g = sel.group_by(["u", "et"]).aggregate([("et", "count")])
        out = pa.table({"u": g.column("u"), "et": g.column("et"),
                        "n": pc.cast(g.column("et_count"), pa.int64())})
        return out.append_column("bucket", int_bucket(out.column("u"),
                                                      n_buckets))

    def grp(g: pa.Table) -> pa.Table:
        f = g.group_by(["u", "et"]).aggregate([("n", "sum")])
        u = f.column("u").to_numpy(zero_copy_only=False)
        n = f.column("n_sum").to_numpy(zero_copy_only=False)
        # sorted factorization: codes order lexically, so the lexsort
        # tie-break (codes asc within equal counts) == ORDER BY name
        names, code = np.unique(
            np.asarray(f.column("et").to_pylist(), dtype=object),
            return_inverse=True)
        order = np.lexsort((code, -n, u))
        us = u[order]
        starts = np.flatnonzero(
            np.append(True, us[1:] != us[:-1])) if len(us) else \
            np.array([], np.int64)
        take = np.minimum(np.diff(np.append(starts, len(us))),
                          _TOP_TYPES_K)
        cum = np.cumsum(take)
        total = int(cum[-1]) if len(cum) else 0
        within = np.arange(total) - np.repeat(cum - take, take)
        sel = order[np.repeat(starts, take) + within]
        return pa.table({
            "user_id": pa.array(u[sel], pa.int64()),
            "event_type": pa.array(names[code[sel]].tolist(),
                                   pa.string()),
            "n": pa.array(n[sel], pa.int64()),
            "rnk": pa.array(within + 1, pa.int64())})

    return _read(sf_dir, "events", ["user_id", "event_type"]) \
        .map_batches(tag, batch_format="pyarrow") \
        .groupby("bucket").map_groups(grp, batch_format="pyarrow")


SQL_USER_TOP_TYPES = f"""WITH c AS (
  SELECT user_id, event_type, COUNT(*) AS n FROM events
  WHERE user_id IS NOT NULL AND event_type IS NOT NULL GROUP BY 1, 2),
r AS (SELECT user_id, event_type, n,
        ROW_NUMBER() OVER (PARTITION BY user_id
                           ORDER BY n DESC, event_type) AS rnk FROM c)
SELECT user_id, event_type, CAST(n AS BIGINT) AS n,
       CAST(rnk AS BIGINT) AS rnk
FROM r WHERE rnk <= {_TOP_TYPES_K}"""


def q_cumulative_users(sf_dir: str):
    """Cumulative distinct count over time: for each day with at least
    one first-time user, the TOTAL distinct users seen so far — the
    audience-growth curve. Cumulative COUNT(DISTINCT) does not
    decompose, but it equals the prefix sum of FIRST-SEEN counts: MIN
    is associative, so per-batch (user, min-day) partials fold through
    ONE user-bucket shuffle into per-day new-user counts, and the
    (time-range-bounded) day series prefix-sums on the driver."""
    import numpy as np

    n_buckets = adaptive_buckets(_nrows(sf_dir, "events"))

    def tag(t: pa.Table) -> pa.Table:
        sel = pa.table({
            "u": t.column("user_id"),
            "d": pc.cast(pc.floor_temporal(t.column("ts"), unit="day"),
                         pa.int64())}) \
            .filter(pc.and_(pc.is_valid(t.column("user_id")),
                            pc.is_valid(t.column("ts"))))
        g = sel.group_by("u").aggregate([("d", "min")])
        out = pa.table({"u": g.column("u"), "d": g.column("d_min")})
        return out.append_column("bucket", int_bucket(out.column("u"),
                                                      n_buckets))

    def grp(g: pa.Table) -> pa.Table:
        f = g.group_by("u").aggregate([("d", "min")])
        c = f.group_by("d_min").aggregate([("d_min", "count")])
        return pa.table({"d": c.column("d_min"),
                         "n": pc.cast(c.column("d_min_count"),
                                      pa.int64())})

    small = _read(sf_dir, "events", ["user_id", "ts"]) \
        .map_batches(tag, batch_format="pyarrow") \
        .groupby("bucket").map_groups(grp, batch_format="pyarrow")
    per_day = _combine_partials(small, ["d"], {"n": "n"})
    d = per_day.column("d").to_numpy(zero_copy_only=False)
    n = per_day.column("n").to_numpy(zero_copy_only=False)
    order = np.argsort(d)
    return pa.table({
        "day": pa.array(d[order], pa.int64()).cast(pa.timestamp("us")),
        "cum_users": pa.array(np.cumsum(n[order]), pa.int64())})


SQL_CUMULATIVE_USERS = """WITH f AS (
  SELECT user_id, MIN(date_trunc('day', ts)) AS d FROM events
  WHERE user_id IS NOT NULL AND ts IS NOT NULL GROUP BY 1),
n AS (SELECT d, COUNT(*) AS nn FROM f GROUP BY 1)
SELECT CAST(d AS TIMESTAMP) AS day,
       CAST(SUM(nn) OVER (ORDER BY d) AS BIGINT) AS cum_users FROM n"""


def q_degree_dist(sf_dir: str):
    """Group-size (degree) distribution: how many orders have exactly
    k lineitems — the key-skew diagnostic you run BEFORE choosing a
    partitioning (a heavy tail here is what makes a naive groupby
    stall at 100 TB). Two-level aggregate: per-batch (key, count)
    partials fold through ONE key-bucket shuffle, each bucket
    histograms its per-key totals, and the driver sums the (size,
    count) histograms — output bounded by the max degree, not the
    key count."""

    n_buckets = adaptive_buckets(_nrows(sf_dir, "lineitem"))

    def tag(t: pa.Table) -> pa.Table:
        g = t.group_by("l_orderkey").aggregate([("l_orderkey", "count")])
        out = pa.table({"k": g.column("l_orderkey"),
                        "n": pc.cast(g.column("l_orderkey_count"),
                                     pa.int64())})
        return out.append_column("bucket", int_bucket(out.column("k"),
                                                      n_buckets))

    def grp(g: pa.Table) -> pa.Table:
        f = g.group_by("k").aggregate([("n", "sum")])
        h = f.group_by("n_sum").aggregate([("n_sum", "count")])
        return pa.table({"n_lines": h.column("n_sum"),
                         "cnt": pc.cast(h.column("n_sum_count"),
                                        pa.int64())})

    small = _read(sf_dir, "lineitem", ["l_orderkey"]) \
        .map_batches(tag, batch_format="pyarrow") \
        .groupby("bucket").map_groups(grp, batch_format="pyarrow")
    return _combine_partials(small, ["n_lines"], {"cnt": "n_orders"})


SQL_DEGREE_DIST = """WITH c AS (
  SELECT l_orderkey, COUNT(*) AS n_lines FROM lineitem GROUP BY 1)
SELECT CAST(n_lines AS BIGINT) AS n_lines,
       CAST(COUNT(*) AS BIGINT) AS n_orders
FROM c GROUP BY 1"""


def q_user_summary(sf_dir: str):
    """Multi-measure per-entity summary in ONE partial shape: per
    user, event count, first/last timestamps, activity span and exact
    value-cents total — the lifetime-value profile row. COUNT / MIN /
    MAX / SUM are all associative, so one batch pass emits a 5-wide
    partial per (user, batch) and ONE user-bucket shuffle folds them;
    NaN values contribute NULL to the sum (SQL aggregate convention),
    tracked through the fold with a valid-count column."""
    import numpy as np

    n_buckets = adaptive_buckets(_nrows(sf_dir, "events"))

    def tag(t: pa.Table) -> pa.Table:
        v = t.column("value").to_numpy(zero_copy_only=False)
        cents = np.where(np.isnan(v), 0,
                         np.floor(v * 100.0)).astype(np.int64)
        sel = pa.table({
            "u": t.column("user_id"),
            "ts": pc.cast(t.column("ts"), pa.int64()),
            "cents": pa.array(cents, pa.int64()),
            "ok": pa.array((~np.isnan(v)).astype(np.int64),
                           pa.int64())}) \
            .filter(pc.and_(pc.is_valid(t.column("user_id")),
                            pc.is_valid(t.column("ts"))))
        g = sel.group_by("u").aggregate(
            [("ts", "min"), ("ts", "max"), ("ts", "count"),
             ("cents", "sum"), ("ok", "sum")])
        return pa.table({
            "u": g.column("u"), "mn": g.column("ts_min"),
            "mx": g.column("ts_max"),
            "n": pc.cast(g.column("ts_count"), pa.int64()),
            "c": g.column("cents_sum"), "k": g.column("ok_sum")}) \
            .append_column("bucket", int_bucket(g.column("u"),
                                                n_buckets))

    def grp(g: pa.Table) -> pa.Table:
        f = g.group_by("u").aggregate(
            [("mn", "min"), ("mx", "max"), ("n", "sum"),
             ("c", "sum"), ("k", "sum")])
        mn = f.column("mn_min").to_numpy(zero_copy_only=False)
        mx = f.column("mx_max").to_numpy(zero_copy_only=False)
        k = f.column("k_sum").to_numpy(zero_copy_only=False)
        c = f.column("c_sum").to_numpy(zero_copy_only=False)
        return pa.table({
            "user_id": f.column("u"),
            "n_events": f.column("n_sum"),
            "first_ts": pa.array(mn, pa.int64()).cast(pa.timestamp("us")),
            "last_ts": pa.array(mx, pa.int64()).cast(pa.timestamp("us")),
            "span_us": pa.array(mx - mn, pa.int64()),
            # all-NaN users sum to SQL NULL
            "value_cents": pa.array(c, pa.int64(), mask=k == 0)})

    return _read(sf_dir, "events", ["user_id", "ts", "value"]) \
        .map_batches(tag, batch_format="pyarrow") \
        .groupby("bucket").map_groups(grp, batch_format="pyarrow")


SQL_USER_SUMMARY = """
SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_events,
  MIN(ts) AS first_ts, MAX(ts) AS last_ts,
  CAST(date_diff('microseconds', MIN(ts), MAX(ts)) AS BIGINT)
    AS span_us,
  CAST(SUM(CASE WHEN isnan(value) THEN NULL
            ELSE CAST(FLOOR(value * 100) AS BIGINT) END) AS BIGINT)
    AS value_cents
FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL GROUP BY 1"""


def q_mode_per_type(sf_dir: str):
    """Grouped MODE: the most frequent value-cents per event type,
    ties to the smallest value — the categorical central tendency the
    mean/median family can't express. (key, quantum, COUNT) partials
    are associative and bounded by value range × precision; the driver
    folds them and takes one argmax per key (count desc, quantum asc)."""
    import numpy as np

    def partial(t: pa.Table) -> pa.Table:
        v = t.column("value").to_numpy(zero_copy_only=False)
        ok = ~np.isnan(v)
        tt = pa.table({"event_type": t.column("event_type")
                       .filter(pa.array(ok)),
                       "cents": pa.array(
                           np.floor(v[ok] * 100).astype(np.int64),
                           pa.int64())})
        g = tt.group_by(["event_type", "cents"]).aggregate(
            [("cents", "count")])
        return pa.table({"event_type": g.column("event_type"),
                         "cents": g.column("cents"),
                         "n": pc.cast(g.column("cents_count"),
                                      pa.int64())})

    merged = pa.concat_tables(list(
        _read(sf_dir, "events", ["event_type", "value"])
        .map_batches(partial, batch_format="pyarrow")
        .iter_batches(batch_size=None, batch_format="pyarrow")))
    f = merged.group_by(["event_type", "cents"]).aggregate(
        [("n", "sum")])
    enc = pc.dictionary_encode(f.column("event_type").combine_chunks())
    code = enc.indices.to_numpy(zero_copy_only=False)
    cents = f.column("cents").to_numpy(zero_copy_only=False)
    n = f.column("n_sum").to_numpy(zero_copy_only=False)
    order = np.lexsort((cents, -n, code))
    cs = code[order]
    first = np.append(True, cs[1:] != cs[:-1])
    sel = order[np.flatnonzero(first)]
    return pa.table({
        "event_type": pc.take(enc.dictionary,
                              pa.array(code[sel], pa.int32())),
        "mode_cents": pa.array(cents[sel], pa.int64()),
        "n_mode": pa.array(n[sel], pa.int64())})


SQL_MODE_PER_TYPE = """WITH c AS (
  SELECT event_type, CAST(FLOOR(value * 100) AS BIGINT) AS cents
  FROM events WHERE NOT isnan(value)),
g AS (SELECT event_type, cents, COUNT(*) AS n FROM c GROUP BY 1, 2)
SELECT event_type, cents AS mode_cents, CAST(n AS BIGINT) AS n_mode
FROM g
QUALIFY ROW_NUMBER() OVER (PARTITION BY event_type
                           ORDER BY n DESC, cents) = 1"""


def q_centroid_dists(sf_dir: str):
    """Inter-cluster separation matrix: pairwise squared quantized
    distance between label centroids (a < b) — `cluster_radius`'
    complement (tight clusters far apart = a usable IVF routing table;
    radius ≫ separation = merge them). The labels × dim centroid fold
    is the SAME pass-1 as cluster_radius; the k² pair matrix is pure
    driver arithmetic on the rounded int64 centroid matrix — nothing
    shuffles, nothing re-reads."""
    import numpy as np
    from .textops.knn import centroid_sum_partial

    parts = pa.concat_tables(list(
        _read(sf_dir, "embeddings", ["label", "embedding"])
        .map_batches(lambda t: centroid_sum_partial(t),
                     batch_format="pyarrow")
        .iter_batches(batch_size=None, batch_format="pyarrow")))
    agg = parts.group_by(["label", "idx"]).aggregate(
        [("s", "sum"), ("n", "sum")])
    labs = agg.column("label").to_numpy(zero_copy_only=False)
    idxs = agg.column("idx").to_numpy(zero_copy_only=False)
    ss = agg.column("s_sum").to_numpy(zero_copy_only=False)
    ns = agg.column("n_sum").to_numpy(zero_copy_only=False)
    uniq = np.unique(labs)
    d = int(idxs.max())
    cents = np.empty((len(uniq), d), np.int64)
    cents[np.searchsorted(uniq, labs), idxs - 1] = np.floor(
        ss.astype(np.float64) / ns + 0.5).astype(np.int64)
    ai, bi = np.triu_indices(len(uniq), k=1)
    diff = cents[ai] - cents[bi]
    return pa.table({
        "label_a": pa.array(uniq[ai], pa.int64()),
        "label_b": pa.array(uniq[bi], pa.int64()),
        "dist_sq": pa.array(np.einsum("ij,ij->i", diff, diff),
                            pa.int64())})


SQL_CENTROID_DISTS = """WITH q AS (
  SELECT label,
    CAST(round(CAST(unnest(embedding) AS DOUBLE) * 1000000)
         AS BIGINT) AS qv,
    generate_subscripts(embedding, 1) AS i
  FROM embeddings),
c AS (SELECT label, i,
        CAST(FLOOR(CAST(SUM(qv) AS DOUBLE) / COUNT(*) + 0.5)
             AS BIGINT) AS c
      FROM q GROUP BY 1, 2)
SELECT CAST(a.label AS BIGINT) AS label_a,
       CAST(b.label AS BIGINT) AS label_b,
       CAST(SUM((a.c - b.c) * (a.c - b.c)) AS BIGINT) AS dist_sq
FROM c a JOIN c b ON a.i = b.i AND a.label < b.label
GROUP BY 1, 2"""


def q_moving_avg3(sf_dir: str):
    """ROWS-frame window aggregate: per event, the exact cents sum and
    row count of the centered 3-row frame (``ROWS BETWEEN 1 PRECEDING
    AND 1 FOLLOWING``) within the user's (ts, event_id) order — the
    positional smoothing window (the repo's other rolling ops are all
    time-RANGE frames). Sum and count stay integer so the consumer
    divides at whatever precision it wants. One user-bucket shuffle;
    the per-bucket kernel is one lexsort + two shifted adds with
    run-boundary masks."""
    import numpy as np

    n_buckets = adaptive_buckets(_nrows(sf_dir, "events"))

    def tag(t: pa.Table) -> pa.Table:
        v = t.column("value").to_numpy(zero_copy_only=False)
        ok = pa.array(~np.isnan(v))
        sub = pa.table({"u": t.column("user_id"),
                        "ts": pc.cast(t.column("ts"), pa.int64()),
                        "eid": t.column("event_id"),
                        "c": pa.array(
                            np.where(np.isnan(v), 0,
                                     np.floor(v * 100.0))
                            .astype(np.int64), pa.int64())}) \
            .filter(pc.and_(pc.and_(pc.is_valid(t.column("user_id")),
                                    pc.is_valid(t.column("ts"))), ok))
        return sub.append_column("bucket", int_bucket(sub.column("u"),
                                                      n_buckets))

    def grp(g: pa.Table) -> pa.Table:
        u = g.column("u").to_numpy(zero_copy_only=False)
        ts = g.column("ts").to_numpy(zero_copy_only=False)
        eid = g.column("eid").to_numpy(zero_copy_only=False)
        c = g.column("c").to_numpy(zero_copy_only=False)
        order, new_run, _ = _lag_scaffold([u], ts, eid)
        cs = c[order]
        n = len(cs)
        has_prev = ~new_run
        has_next = np.append(~new_run[1:], False)
        w = cs.copy()
        w[has_prev] += cs[:-1][has_prev[1:]] if n else 0
        w[has_next] += cs[1:][has_next[:-1]] if n else 0
        cnt = 1 + has_prev.astype(np.int64) + has_next
        return pa.table({
            "event_id": pa.array(eid[order], pa.int64()),
            "user_id": pa.array(u[order], pa.int64()),
            "w_sum_cents": pa.array(w, pa.int64()),
            "w_n": pa.array(cnt, pa.int64())})

    return _read(sf_dir, "events",
                 ["event_id", "user_id", "ts", "value"]) \
        .map_batches(tag, batch_format="pyarrow") \
        .groupby("bucket").map_groups(grp, batch_format="pyarrow")


SQL_MOVING_AVG3 = """WITH c AS (
  SELECT event_id, user_id, ts, event_id AS eid,
         CAST(FLOOR(value * 100) AS BIGINT) AS cents
  FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL
    AND NOT isnan(value))
SELECT event_id, user_id,
  CAST(SUM(cents) OVER w AS BIGINT) AS w_sum_cents,
  CAST(COUNT(*) OVER w AS BIGINT) AS w_n
FROM c WINDOW w AS (PARTITION BY user_id ORDER BY ts, eid
                    ROWS BETWEEN 1 PRECEDING AND 1 FOLLOWING)"""


def q_dup_rate_per_source(sf_dir: str):
    """Dedup REPORTING composition: per source, total docs and how
    many belong to a multi-doc exact-duplicate class (md5 of text) —
    the per-shard contamination scoreboard a curation run publishes.
    Each batch hashes its docs once (`_md5_column`, the dedup_exact
    coding) and emits (hash, source) rows; ONE hash-bucket shuffle
    marks classes with ≥ 2 members, and per-source (total, dup)
    partials fold on the driver."""
    from .textops.dedup import _md5_column

    n_buckets = adaptive_buckets(_nrows(sf_dir, "documents"))

    def tag(t: pa.Table) -> pa.Table:
        out = pa.table({
            "h": _md5_column(t.column("text").to_pylist()),
            "source": t.column("source")})
        return out.append_column(
            "bucket", fnv1a_bucket(out.column("h"), n_buckets))

    def grp(g: pa.Table) -> pa.Table:
        sizes = g.group_by("h").aggregate([("h", "count")])
        dup_h = sizes.filter(
            pc.greater(sizes.column("h_count"), 1)).column("h")
        isdup = pc.cast(pc.is_in(g.column("h"), value_set=dup_h),
                        pa.int64())
        tt = pa.table({"source": g.column("source"), "d": isdup})
        agg = tt.group_by("source").aggregate([("d", "sum"),
                                               ("d", "count")])
        return pa.table({"source": agg.column("source"),
                         "dup": agg.column("d_sum"),
                         "tot": pc.cast(agg.column("d_count"),
                                        pa.int64())})

    small = _read(sf_dir, "documents", ["text", "source"]) \
        .map_batches(tag, batch_format="pyarrow") \
        .groupby("bucket").map_groups(grp, batch_format="pyarrow")
    return _combine_partials(small, ["source"],
                             {"tot": "n_docs", "dup": "n_dup"})


SQL_DUP_RATE_PER_SOURCE = """WITH h AS (
  SELECT source, md5(text) AS h FROM documents),
s AS (SELECT h, COUNT(*) > 1 AS dup FROM h GROUP BY 1)
SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
  CAST(SUM(CASE WHEN s.dup THEN 1 ELSE 0 END) AS BIGINT) AS n_dup
FROM h JOIN s USING (h) GROUP BY 1"""


_CONCURRENCY_WINDOW_US = 300_000_000  # each event holds a 5-min presence
_DAY_US = 86_400_000_000


def q_max_concurrency(sf_dir: str):
    """Sweep-line peak concurrency: each event opens a 5-minute
    presence window; the answer is the maximum number of simultaneously
    open windows and the earliest instant it is reached — the
    peak-concurrent-connections / capacity-planning operator. The
    sweep needs a GLOBAL prefix sum, which decomposes over monotone
    DAY buckets: each bucket sorts its ±1 points ((t, d) — closes
    before opens at the same instant), returns (day, delta,
    local_max, t_at_first_max), and the driver offsets each bucket by
    the exclusive cumsum of earlier deltas. Partials are 4 ints per
    day — bounded by the time range, never the corpus."""
    import numpy as np

    def tag(t: pa.Table) -> pa.Table:
        ts = pc.cast(t.column("ts"), pa.int64()) \
            .drop_null().to_numpy(zero_copy_only=False)
        pts = np.concatenate([ts, ts + _CONCURRENCY_WINDOW_US])
        d = np.concatenate([np.ones(len(ts), np.int64),
                            np.full(len(ts), -1, np.int64)])
        return pa.table({"t": pa.array(pts, pa.int64()),
                         "d": pa.array(d, pa.int64()),
                         "bucket": pa.array(pts // _DAY_US, pa.int64())})

    def grp(g: pa.Table) -> pa.Table:
        t = g.column("t").to_numpy(zero_copy_only=False)
        d = g.column("d").to_numpy(zero_copy_only=False)
        order = np.lexsort((d, t))       # -1 sorts before +1 at ties
        run = np.cumsum(d[order])
        mx = int(run.max())
        at = int(t[order][int(np.argmax(run))])
        return pa.table({
            "day": g.column("bucket").slice(0, 1),
            "delta": pa.array([int(run[-1])], pa.int64()),
            "local_max": pa.array([mx], pa.int64()),
            "at_t": pa.array([at], pa.int64())})

    parts = pa.concat_tables(list(
        _read(sf_dir, "events", ["ts"])
        .map_batches(tag, batch_format="pyarrow")
        .groupby("bucket").map_groups(grp, batch_format="pyarrow")
        .iter_batches(batch_size=None, batch_format="pyarrow")))
    day = parts.column("day").to_numpy(zero_copy_only=False)
    order = np.argsort(day)
    delta = parts.column("delta").to_numpy(zero_copy_only=False)[order]
    lmax = parts.column("local_max").to_numpy(zero_copy_only=False)[order]
    at = parts.column("at_t").to_numpy(zero_copy_only=False)[order]
    offs = np.concatenate(([0], np.cumsum(delta)[:-1]))
    tot = offs + lmax
    peak = int(tot.max())
    first = int(np.argmax(tot))          # earliest day wins ties
    return pa.table({
        "peak": pa.array([peak], pa.int64()),
        "at_ts": pa.array([at[first]], pa.int64())
        .cast(pa.timestamp("us"))})


SQL_MAX_CONCURRENCY = """WITH pts AS (
  SELECT ts AS t, 1 AS d FROM events WHERE ts IS NOT NULL
  UNION ALL
  SELECT ts + INTERVAL 300 SECOND, -1 FROM events WHERE ts IS NOT NULL),
s AS (SELECT t, SUM(d) OVER (ORDER BY t, d) AS run FROM pts),
m AS (SELECT MAX(run) AS peak FROM s)
SELECT CAST(m.peak AS BIGINT) AS peak, MIN(s.t) AS at_ts
FROM s, m WHERE s.run = m.peak GROUP BY m.peak"""


def q_daily_type_share(sf_dir: str):
    """Ratio-to-report window shape: per (day, type), the event count
    and its integer permille share OF THAT DAY's total
    (``n / SUM(n) OVER (PARTITION BY day)``) — the composition-mix
    report. (day, type, count) partials fold on the driver (bounded by
    time range × types); the share divides exactly in int64 both
    engines (floor division)."""
    import numpy as np

    def partial(t: pa.Table) -> pa.Table:
        sel = pa.table({
            "day": pc.cast(pc.floor_temporal(t.column("ts"),
                                             unit="day"), pa.int64()),
            "event_type": t.column("event_type")}) \
            .filter(pc.is_valid(t.column("ts")))
        g = sel.group_by(["day", "event_type"]).aggregate(
            [("day", "count")])
        return pa.table({"day": g.column("day"),
                         "event_type": g.column("event_type"),
                         "n": pc.cast(g.column("day_count"),
                                      pa.int64())})

    folded = _combine_partials(
        _read(sf_dir, "events", ["ts", "event_type"])
        .map_batches(partial, batch_format="pyarrow"),
        ["day", "event_type"], {"n": "n"})
    day = folded.column("day").to_numpy(zero_copy_only=False)
    n = folded.column("n").to_numpy(zero_copy_only=False)
    uniq, inv = np.unique(day, return_inverse=True)
    # integer scatter-add: bincount's float64 weights would go inexact
    # past 2^53 events/day
    totals = np.zeros(len(uniq), np.int64)
    np.add.at(totals, inv, n)
    return pa.table({
        "day": pa.array(day, pa.int64()).cast(pa.timestamp("us")),
        "event_type": folded.column("event_type"),
        "n": pa.array(n, pa.int64()),
        "share_permille": pa.array(n * 1000 // totals[inv],
                                   pa.int64())})


SQL_DAILY_TYPE_SHARE = """WITH c AS (
  SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day, event_type,
         COUNT(*) AS n
  FROM events WHERE ts IS NOT NULL GROUP BY 1, 2)
SELECT day, event_type, CAST(n AS BIGINT) AS n,
  CAST(n * 1000 // SUM(n) OVER (PARTITION BY day) AS BIGINT)
    AS share_permille
FROM c"""


def q_error_report(sf_dir: str):
    """Composite operational report in ONE scan: per day of ERROR
    events — count, exact distinct affected users, max value-cents and
    the discrete p95 — four aggregate KINDS (count / distinct / max /
    order statistic) whose partials ride different lawful shapes:
    counts+max+CDF fold as (day, quantum, count)-style rows straight to
    the driver, while exact DISTINCT needs one user-bucket shuffle
    (users partition disjointly, so per-bucket distinct day-counts SUM
    exactly — the `vocab_per_source` argument). The three small day
    tables join driver-side."""
    import numpy as np

    n_buckets = adaptive_buckets(_nrows(sf_dir, "events"))

    def stats_partial(t: pa.Table) -> pa.Table:
        sel = t.filter(pc.equal(t.column("event_type"), "error"))
        v = sel.column("value").to_numpy(zero_copy_only=False)
        ok = ~np.isnan(v)
        tt = pa.table({
            "day": pc.cast(pc.floor_temporal(sel.column("ts"),
                                             unit="day"), pa.int64())
            .filter(pa.array(ok)),
            "q": pa.array(np.floor(v[ok] * 100).astype(np.int64),
                          pa.int64())})
        g = tt.group_by(["day", "q"]).aggregate([("q", "count")])
        return pa.table({"day": g.column("day"), "q": g.column("q"),
                         "cnt": pc.cast(g.column("q_count"),
                                        pa.int64())})

    def users_partial(t: pa.Table) -> pa.Table:
        sel = t.filter(pc.and_(pc.equal(t.column("event_type"),
                                        "error"),
                               pc.is_valid(t.column("user_id"))))
        d = pa.table({
            "day": pc.cast(pc.floor_temporal(sel.column("ts"),
                                             unit="day"), pa.int64()),
            "u": sel.column("user_id")}).group_by(["day", "u"]) \
            .aggregate([])
        return d.append_column("bucket", int_bucket(d.column("u"),
                                                    n_buckets))

    def users_grp(g: pa.Table) -> pa.Table:
        d = g.group_by(["day", "u"]).aggregate([])
        c = d.group_by("day").aggregate([("u", "count")])
        return pa.table({"day": c.column("day"),
                         "nu": pc.cast(c.column("u_count"),
                                       pa.int64())})

    cols = ["ts", "user_id", "event_type", "value"]
    cdf = pa.concat_tables(list(
        _read(sf_dir, "events", cols)
        .map_batches(stats_partial, batch_format="pyarrow")
        .iter_batches(batch_size=None, batch_format="pyarrow")))
    users = _combine_partials(
        _read(sf_dir, "events", cols)
        .map_batches(users_partial, batch_format="pyarrow")
        .groupby("bucket").map_groups(users_grp,
                                      batch_format="pyarrow"),
        ["day"], {"nu": "n_users"})

    from .aggregates import quantile_from_cdf
    folded = cdf.group_by(["day", "q"]).aggregate([("cnt", "sum")])
    day = folded.column("day").to_numpy(zero_copy_only=False)
    q = folded.column("q").to_numpy(zero_copy_only=False)
    cnt = folded.column("cnt_sum").to_numpy(zero_copy_only=False)
    order = np.lexsort((q, day))
    day, q, cnt = day[order], q[order], cnt[order]
    starts = np.flatnonzero(np.append(True, day[1:] != day[:-1])) \
        if len(day) else np.array([], np.int64)
    ends = np.append(starts[1:], len(day))
    out_day, n_err, mx, p95 = [], [], [], []
    for s, e in zip(starts, ends):
        cum = np.cumsum(cnt[s:e])
        out_day.append(int(day[s]))
        n_err.append(int(cum[-1]))
        mx.append(int(q[e - 1]))
        p95.append(quantile_from_cdf(q[s:e], cum, 0.95))
    stats = pa.table({"day": pa.array(out_day, pa.int64()),
                      "n_errors": pa.array(n_err, pa.int64()),
                      "max_cents": pa.array(mx, pa.int64()),
                      "p95_cents": pa.array(p95, pa.int64())})
    udays = {d: n for d, n in zip(
        users.column("day").to_pylist(),
        users.column("n_users").to_pylist())}
    return pa.table({
        "day": pa.array(out_day, pa.int64()).cast(pa.timestamp("us")),
        "n_errors": stats.column("n_errors"),
        "n_users": pa.array([udays.get(d, 0) for d in out_day],
                            pa.int64()),
        "max_cents": stats.column("max_cents"),
        "p95_cents": stats.column("p95_cents")})


SQL_ERROR_REPORT = """WITH e AS (
  SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day, user_id,
         CAST(FLOOR(value * 100) AS BIGINT) AS q
  FROM events WHERE event_type = 'error' AND NOT isnan(value)),
g AS (SELECT day, q, COUNT(*) AS cnt FROM e GROUP BY 1, 2),
s AS (SELECT day, q,
        SUM(cnt) OVER (PARTITION BY day ORDER BY q) AS cum,
        SUM(cnt) OVER (PARTITION BY day) AS total FROM g)
SELECT e2.day, CAST(COUNT(*) AS BIGINT) AS n_errors,
  CAST(COUNT(DISTINCT e2.user_id) AS BIGINT) AS n_users,
  CAST(MAX(e2.q) AS BIGINT) AS max_cents,
  CAST(MIN(t.p95) AS BIGINT) AS p95_cents
FROM e e2 JOIN (
  SELECT day, MIN(CASE WHEN cum >= CEIL(0.95 * total) THEN q END)
    AS p95 FROM s GROUP BY 1) t USING (day)
GROUP BY e2.day"""


def q_orders_no_lines(sf_dir: str):
    """Referential ANTI join between two FACT tables: orders whose
    key never appears in lineitem (unfulfilled orders / dangling-FK
    audit — the `anti_join` shape where both sides are fact-scale, so
    neither broadcasts). The right side moves only as per-batch
    distinct keys through `key_filter_join`'s one bucketed-union
    shuffle."""
    from .joins import key_filter_join

    nb = adaptive_buckets(_nrows(sf_dir, "orders")
                          + _nrows(sf_dir, "lineitem"))
    return key_filter_join(
        _read(sf_dir, "orders", ["o_orderkey", "o_orderstatus",
                                 "o_totalprice"]),
        _read(sf_dir, "lineitem", ["l_orderkey"]),
        on="o_orderkey", right_on="l_orderkey", keep="anti",
        n_buckets=nb)


SQL_ORDERS_NO_LINES = """
SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders o
WHERE NOT EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey)"""


def q_value_quantile_sketch(sf_dir: str):
    """Approximate global quantiles via the mergeable KLL compactor
    stack (`textops.sketches.KllSketch`) — the quantile path for
    UNBOUNDED real-valued domains where the exact (quantum, count) CDF
    (bounded by value range × precision) does not apply. Per-batch
    fixed-size sketches ship ≤ k × levels rows each; the driver merge
    is KBs regardless of corpus size. Rows-only: approximate by
    contract (rank error ≤ ~H·n/k, value-asserted against the exact
    CDF in tests/test_sketches.py)."""
    from .textops.sketches import sketch_quantiles
    return sketch_quantiles(_read(sf_dir, "events", ["value"]),
                            value_col="value")


def q_type_quantile_sketch(sf_dir: str):
    """Per-group approximate quantiles via one KLL compactor stack per
    event type (`textops.sketches.grouped_sketch_quantiles`) — the
    grouped mirror of `value_quantile_sketch`, for unbounded value
    domains where `quantiles`' exact (quantum, count) CDF can't bound
    its partials. Rows-only: approximate by contract, error-bound
    tested per group."""
    from .textops.sketches import grouped_sketch_quantiles
    return grouped_sketch_quantiles(
        _read(sf_dir, "events", ["event_type", "value"]),
        group_col="event_type", value_col="value")


def q_grouping_sets_mix(sf_dir: str):
    """Explicit GROUPING SETS — the third member of the one-scan
    grouping family (`rollup_revenue` = prefixes, `cube_orders` = all
    subsets, this = an arbitrary list): revenue by returnflag AND by
    linestatus from ONE scan, where naive SQL would aggregate the
    corpus twice. Same `rollup_cents_partial` kernel, same GROUPING()
    bitmask contract."""
    from .aggregates import rollup_cents_partial, rollup_null_levels

    keys = ["l_returnflag", "l_linestatus"]
    partial = rollup_cents_partial(
        keys, "cents", sets=[("l_returnflag",), ("l_linestatus",)])

    def derive(t: pa.Table) -> pa.Table:
        cents = pc.cast(pc.round(pc.multiply(pc.multiply(
            t.column("l_extendedprice"),
            pc.subtract(pa.scalar(1.0), t.column("l_discount"))), 100.0),
            round_mode="half_towards_infinity"), pa.int64())
        return pa.table({"l_returnflag": t.column("l_returnflag"),
                         "l_linestatus": t.column("l_linestatus"),
                         "cents": cents})

    small = _read(sf_dir, "lineitem",
                  ["l_returnflag", "l_linestatus", "l_extendedprice",
                   "l_discount"]) \
        .map_batches(lambda t: partial(derive(t)), batch_format="pyarrow")
    merged = _combine_partials(small, keys + ["lvl"],
                               {"__sum": "revenue_cents", "__n": "n"})
    return rollup_null_levels(merged, keys)


SQL_GROUPING_SETS_MIX = """
SELECT l_returnflag, l_linestatus,
  CAST(GROUPING(l_returnflag, l_linestatus) AS BIGINT) AS lvl,
  CAST(SUM(CAST(round(l_extendedprice * (1 - l_discount) * 100)
                AS BIGINT)) AS BIGINT) AS revenue_cents,
  COUNT(*) AS n
FROM lineitem
GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus))"""


def q_zscore_outliers(sf_dir: str):
    """Parametric 3-sigma outlier flag with EXACT integer algebra —
    the classical complement to `anomaly_events`' robust median/MAD
    flag. The test ``|v - mean| > 3*stddev_pop`` is algebraically
    ``(n*v - s)^2 > 9*(n*q - s^2)`` over integer cents (s = sum,
    q = sum of squares): both sides stay integers, so the boundary
    cannot float-drift between engines (SQL widens through HUGEINT;
    here the flag is decided in arbitrary-precision python ints).

    Scale shape: pass 1 folds per-batch ``(type, cents, count)``
    partials (bounded by types x distinct quanta — the quantum-CDF
    trick); the driver computes the per-(type, cents) flag exactly
    ONCE per distinct pair, and pass 2 is a narrow vectorized
    ``index_in`` against the broadcast flag table. No shuffle; the
    corpus never materializes.
    """
    import numpy as np

    ds = _read(sf_dir, "events", ["event_id", "event_type", "value"])

    def partial(t: pa.Table) -> pa.Table:
        v = t.column("value").to_numpy(zero_copy_only=False)
        ok = ~np.isnan(v) & pc.is_valid(t.column("event_type")) \
            .to_numpy(zero_copy_only=False)
        cents = np.floor(v[ok] * 100.0).astype(np.int64)
        tt = pa.table({"event_type": t.column("event_type")
                       .filter(pa.array(ok)),
                       "cents": pa.array(cents, pa.int64())})
        g = tt.group_by(["event_type", "cents"]).aggregate(
            [("cents", "count")])
        return pa.table({"event_type": g.column("event_type"),
                         "cents": g.column("cents"),
                         "cnt": pc.cast(g.column("cents_count"),
                                        pa.int64())})

    pairs = _combine_partials(ds.map_batches(partial,
                                             batch_format="pyarrow"),
                              ["event_type", "cents"], {"cnt": "cnt"})
    # exact per-type moments and per-pair flags in python ints (the
    # squared compare reaches ~1e28 at petabyte n — past int64, never
    # past python)
    et = pairs.column("event_type").to_pylist()
    cv = pairs.column("cents").to_pylist()
    cn = pairs.column("cnt").to_pylist()
    mom: dict[str, list[int]] = {}
    for ty, v, c in zip(et, cv, cn):
        m = mom.setdefault(ty, [0, 0, 0])
        m[0] += c
        m[1] += c * v
        m[2] += c * v * v
    flags = []
    for ty, v in zip(et, cv):
        n, s, q = mom[ty]
        d = n * v - s
        flags.append(d * d > 9 * (n * q - s * s))
    key = pc.binary_join_element_wise(
        pairs.column("event_type").combine_chunks(),
        pc.cast(pairs.column("cents"), pa.string()), "|")
    flag_arr = pa.array(flags, pa.bool_())

    def mark(t: pa.Table) -> pa.Table:
        v = t.column("value").to_numpy(zero_copy_only=False)
        ok = ~np.isnan(v) & pc.is_valid(t.column("event_type")) \
            .to_numpy(zero_copy_only=False)
        sub = t.filter(pa.array(ok))
        cents = np.floor(v[ok] * 100.0).astype(np.int64)
        k = pc.binary_join_element_wise(
            sub.column("event_type").combine_chunks(),
            pc.cast(pa.array(cents, pa.int64()), pa.string()), "|")
        idx = pc.index_in(k, value_set=key)
        return pa.table({
            "event_id": sub.column("event_id"),
            "event_type": sub.column("event_type"),
            "value_cents": pa.array(cents, pa.int64()),
            "is_outlier": pc.take(flag_arr, idx)})

    return ds.map_batches(mark, batch_format="pyarrow")


SQL_ZSCORE_OUTLIERS = """WITH e AS (
  SELECT event_id, event_type,
         CAST(floor(value * 100) AS BIGINT) AS cents
  FROM events WHERE value IS NOT NULL AND event_type IS NOT NULL),
m AS (SELECT event_type, CAST(COUNT(*) AS HUGEINT) AS n,
             CAST(SUM(cents) AS HUGEINT) AS s,
             SUM(CAST(cents AS HUGEINT) * cents) AS q
      FROM e GROUP BY 1)
SELECT event_id, e.event_type, cents AS value_cents,
  (n * cents - s) * (n * cents - s) > 9 * (n * q - s * s) AS is_outlier
FROM e JOIN m USING (event_type)"""


def q_pareto_front(sf_dir: str):
    """2-D skyline (Pareto frontier): events not dominated by any
    other on (value_cents, ts) — kept iff no other row is >= on both
    axes and > on at least one. The multi-objective "best tradeoffs"
    query, and a new REDUCTION shape for the catalog: the frontier
    operator is ASSOCIATIVE (frontier(A u B) = frontier(frontier(A) u
    frontier(B)) — removing a dominated point never removes a
    dominator), so each batch emits its local frontier and the driver
    folds frontier-of-frontiers once. No shuffle; driver traffic is
    the frontier size (O(distinct values) worst-case, ~log n expected
    on independent axes), not the corpus.
    """
    import numpy as np

    def _frontier(eid, ts, v):
        # sort value desc, ts desc; within an equal-value group only
        # max-ts rows survive (ties duplicated on both axes all
        # survive — identical points do not strictly dominate);
        # a group survives iff its max ts exceeds every strictly
        # higher-value group's max ts (running max, exclusive)
        order = np.lexsort((-ts, -v))
        vs, tss = v[order], ts[order]
        new_grp = np.empty(len(order), bool)
        new_grp[0] = True
        new_grp[1:] = vs[1:] != vs[:-1]
        heads = np.flatnonzero(new_grp)
        gmax = tss[heads]  # ts desc within group -> head is group max
        run = np.maximum.accumulate(gmax)
        prev = np.empty(len(heads), np.int64)
        prev[0] = np.iinfo(np.int64).min
        prev[1:] = run[:-1]
        gid = np.cumsum(new_grp) - 1
        keep = (tss == gmax[gid]) & (tss > prev[gid])
        sel = order[keep]
        return eid[sel], ts[sel], v[sel]

    def partial(t: pa.Table) -> pa.Table:
        v = t.column("value").to_numpy(zero_copy_only=False)
        tsv = t.column("ts")
        ok = ~np.isnan(v) & pc.is_valid(tsv).to_numpy(zero_copy_only=False)
        cents = np.floor(v[ok] * 100.0).astype(np.int64)
        ts = pc.cast(tsv, pa.int64()).to_numpy(zero_copy_only=False)[ok]
        eid = t.column("event_id").to_numpy(zero_copy_only=False)[ok]
        if not len(eid):
            return pa.table({"event_id": pa.array([], pa.int64()),
                             "ts_us": pa.array([], pa.int64()),
                             "value_cents": pa.array([], pa.int64())})
        fe, ft, fv = _frontier(eid, ts, cents)
        return pa.table({"event_id": pa.array(fe, pa.int64()),
                         "ts_us": pa.array(ft, pa.int64()),
                         "value_cents": pa.array(fv, pa.int64())})

    merged = pa.concat_tables(list(
        _read(sf_dir, "events", ["event_id", "ts", "value"])
        .map_batches(partial, batch_format="pyarrow")
        .iter_batches(batch_size=None, batch_format="pyarrow")))
    eid = merged.column("event_id").to_numpy(zero_copy_only=False)
    ts = merged.column("ts_us").to_numpy(zero_copy_only=False)
    v = merged.column("value_cents").to_numpy(zero_copy_only=False)
    if len(eid):
        eid, ts, v = _frontier(eid, ts, v)
    return pa.table({
        "event_id": pa.array(eid, pa.int64()),
        "ts": pc.cast(pa.array(ts, pa.int64()), pa.timestamp("us")),
        "value_cents": pa.array(v, pa.int64())})


SQL_PARETO_FRONT = """WITH e AS (
  SELECT event_id, ts, CAST(floor(value * 100) AS BIGINT) AS cents
  FROM events WHERE value IS NOT NULL AND ts IS NOT NULL),
g AS (SELECT cents, MAX(ts) AS gm FROM e GROUP BY 1),
p AS (SELECT cents, gm,
        MAX(gm) OVER (ORDER BY cents DESC
          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pm
      FROM g)
SELECT e.event_id, e.ts, e.cents AS value_cents
FROM e JOIN p USING (cents)
WHERE e.ts = p.gm AND (p.pm IS NULL OR p.pm < e.ts)"""


def q_missing_ranges(sf_dir: str):
    """Gaps-and-islands GAP detection: the maximal missing id runs in
    the 'click' event-id sequence — the sequence-completeness audit of
    an ingest pipeline (longest_streak is the ISLAND side; this is the
    complement). A global LEAD over sorted ids decomposes over
    MONOTONE id-range buckets (`util.range_bucket`, the
    pack_sequences/global_rank contract): each bucket finds its
    internal gaps locally (sort + diff) and reports its (min, max)
    boundary; the driver stitches ADJACENT non-empty buckets (a gap
    spanning whole empty buckets falls out of the stitch naturally).
    One keyed shuffle of 1-int rows; driver sees 2 ints per bucket.
    """
    import numpy as np

    span = _nrows(sf_dir, "events")  # ids < n_rows for this corpus
    n_buckets = adaptive_buckets(span)
    from .util import range_bucket

    def tag(t: pa.Table) -> pa.Table:
        sub = t.filter(pc.equal(t.column("event_type"), "click"))
        ids = sub.column("event_id")
        return pa.table({"event_id": ids,
                         "bucket": range_bucket(ids, n_buckets,
                                                span + 1)})

    # per-bucket kernel returns internal gaps; boundaries are emitted
    # as one summary row per bucket (kind=1) in the same table
    def grp(g: pa.Table) -> pa.Table:
        ids = np.unique(g.column("event_id")
                        .to_numpy(zero_copy_only=False))
        d = np.diff(ids)
        pos = np.flatnonzero(d > 1)
        gs = np.concatenate([ids[pos] + 1, [ids[0]]])
        ge = np.concatenate([ids[pos + 1] - 1, [ids[-1]]])
        kind = np.concatenate([np.zeros(len(pos), np.int8), [1]])
        return pa.table({"gap_start": pa.array(gs, pa.int64()),
                         "gap_end": pa.array(ge, pa.int64()),
                         "kind": pa.array(kind, pa.int8())})

    batches = list(
        _read(sf_dir, "events", ["event_id", "event_type"])
        .map_batches(tag, batch_format="pyarrow")
        .groupby("bucket").map_groups(grp, batch_format="pyarrow")
        .iter_batches(batch_size=None, batch_format="pyarrow"))
    empty = pa.table({"gap_start": pa.array([], pa.int64()),
                      "gap_end": pa.array([], pa.int64())})
    if not batches:
        return empty
    parts = pa.concat_tables(batches)
    if not parts.num_rows:
        return empty
    kind = parts.column("kind").to_numpy(zero_copy_only=False)
    gaps_s = parts.column("gap_start").to_numpy(
        zero_copy_only=False)[kind == 0]
    gaps_e = parts.column("gap_end").to_numpy(
        zero_copy_only=False)[kind == 0]
    bmin = parts.column("gap_start").to_numpy(
        zero_copy_only=False)[kind == 1]
    bmax = parts.column("gap_end").to_numpy(
        zero_copy_only=False)[kind == 1]
    order = np.argsort(bmin)
    bmin, bmax = bmin[order], bmax[order]
    # stitch: gap between consecutive buckets' max and min
    if len(bmin) > 1:
        cross = bmin[1:] > bmax[:-1] + 1
        gaps_s = np.concatenate([gaps_s, bmax[:-1][cross] + 1])
        gaps_e = np.concatenate([gaps_e, bmin[1:][cross] - 1])
    order = np.argsort(gaps_s)
    return pa.table({"gap_start": pa.array(gaps_s[order], pa.int64()),
                     "gap_end": pa.array(gaps_e[order], pa.int64())})


SQL_MISSING_RANGES = """WITH s AS (
  SELECT event_id, LEAD(event_id) OVER (ORDER BY event_id) AS nxt
  FROM events WHERE event_type = 'click')
SELECT event_id + 1 AS gap_start, nxt - 1 AS gap_end
FROM s WHERE nxt > event_id + 1"""


def q_interval_coverage(sf_dir: str):
    """Interval-UNION length per user: total microseconds covered by
    the union of [ts, ts+5min) presence windows — the "actual active
    time" metric (`max_concurrency` is the sweep-line PEAK over the
    same windows; this is the per-entity MERGE-overlaps length).
    Because every window has the SAME width W, the union length
    collapses to an exact adjacent-gap formula — per user over sorted
    ts: sum(min(next_ts - ts, W)) + W for the last row — so the
    kernel is the shared `_lag_scaffold` diff, no interval merging
    state. One user-bucket shuffle; per-bucket partials are
    users x buckets fixed-width rows (users co-locate, so per-user
    sums are exact in one pass).
    """
    import numpy as np

    _MIN5 = 300_000_000
    n_buckets = adaptive_buckets(_nrows(sf_dir, "events"))

    def tag(t: pa.Table) -> pa.Table:
        sub = pa.table({"u": t.column("user_id"),
                        "ts": pc.cast(t.column("ts"), pa.int64()),
                        "eid": t.column("event_id")}) \
            .filter(pc.and_(pc.is_valid(t.column("user_id")),
                            pc.is_valid(t.column("ts"))))
        return sub.append_column("bucket", int_bucket(sub.column("u"),
                                                      n_buckets))

    def grp(g: pa.Table) -> pa.Table:
        u = g.column("u").to_numpy(zero_copy_only=False)
        ts = g.column("ts").to_numpy(zero_copy_only=False)
        eid = g.column("eid").to_numpy(zero_copy_only=False)
        order, new_run, gap = _lag_scaffold([u], ts, eid)
        n = len(order)
        contrib = np.empty(n, np.int64)
        # row i contributes min(gap to next same-user row, W); the
        # last row of each user run contributes W
        last = np.empty(n, bool)
        last[:-1] = new_run[1:]
        last[-1] = True
        contrib[last] = _MIN5
        contrib[~last] = np.minimum(gap[1:][~last[:-1]], _MIN5)
        us = u[order]
        uniq, inv = np.unique(us, return_inverse=True)
        tot = np.bincount(inv, weights=contrib.astype(np.float64),
                          minlength=len(uniq)).astype(np.int64)
        return pa.table({"user_id": pa.array(uniq, pa.int64()),
                         "covered": pa.array(tot, pa.int64())})

    small = _read(sf_dir, "events", ["event_id", "user_id", "ts"]) \
        .map_batches(tag, batch_format="pyarrow") \
        .groupby("bucket").map_groups(grp, batch_format="pyarrow")
    return _combine_partials(small, ["user_id"], {"covered": "covered_us"})


SQL_INTERVAL_COVERAGE = """WITH s AS (
  SELECT user_id, ts,
    LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS nxt
  FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL)
SELECT user_id, CAST(SUM(CASE WHEN nxt IS NULL THEN 300000000
    ELSE LEAST(date_diff('microseconds', ts, nxt), 300000000) END)
  AS BIGINT) AS covered_us
FROM s GROUP BY 1"""


def q_tfidf_top_terms(sf_dir: str):
    """Distributed TF-IDF: each document's top-3 terms ranked by
    (tf DESC, df ASC, token ASC) — rarity-aware keyword extraction,
    the canonical two-shuffle text shape the catalog lacked. Ranking
    on the integer (tf, df) pair IS the tf-idf order for a fixed doc
    (idf is monotone-decreasing in df) while staying float-free, so
    the oracle compares exactly.

    Shuffle 1 (token-hash buckets): per-batch (doc, token, tf) rows —
    exact per batch because a document lives in one row — cogroup by
    token computes df (= distinct docs per token; rows are already
    per-doc-distinct) and annotates each row. Shuffle 2 (doc buckets):
    per-doc rank via one lexsort, keep rank <= 3. Both exchanges move
    fixed-width rows bounded by the doc-token pair count, never the
    text.
    """
    import numpy as np
    from .textops.analysis import flat_tokens

    n_tok_buckets = adaptive_buckets(_nrows(sf_dir, "documents"))
    n_doc_buckets = adaptive_buckets(_nrows(sf_dir, "documents"))

    def tf_rows(t: pa.Table) -> pa.Table:
        row_id, toks, _ = flat_tokens(t.column("text"))
        doc = t.column("doc_id").combine_chunks() \
            .take(pa.array(row_id, pa.int64()))
        tt = pa.table({"doc_id": doc, "token": toks})
        g = tt.group_by(["doc_id", "token"]).aggregate(
            [("token", "count")])
        out = pa.table({"doc_id": g.column("doc_id"),
                        "token": g.column("token"),
                        "tf": pc.cast(g.column("token_count"),
                                      pa.int64())})
        return out.append_column(
            "bucket", fnv1a_bucket(out.column("token"), n_tok_buckets))

    def with_df(g: pa.Table) -> pa.Table:
        tok = g.column("token").combine_chunks()
        enc = pc.dictionary_encode(tok)
        code = enc.indices.to_numpy(zero_copy_only=False)
        df = np.bincount(code, minlength=len(enc.dictionary))
        out = pa.table({"doc_id": g.column("doc_id"), "token": tok,
                        "tf": g.column("tf"),
                        "df": pa.array(df[code], pa.int64())})
        return out.append_column(
            "bucket2", int_bucket(out.column("doc_id"), n_doc_buckets))

    def topk(g: pa.Table) -> pa.Table:
        doc = g.column("doc_id").to_numpy(zero_copy_only=False)
        tf = g.column("tf").to_numpy(zero_copy_only=False)
        df = g.column("df").to_numpy(zero_copy_only=False)
        tok = g.column("token").to_numpy(zero_copy_only=False)
        # np.unique's sorted factorization gives lexicographic int
        # codes — object-array lexsort would compare python strings
        _, tok_code = np.unique(tok, return_inverse=True)
        order = np.lexsort((tok_code, df, -tf, doc))
        ds_ = doc[order]
        new_doc = np.empty(len(ds_), bool)
        new_doc[0] = True
        new_doc[1:] = ds_[1:] != ds_[:-1]
        rnk = np.arange(len(ds_)) - np.maximum.accumulate(
            np.where(new_doc, np.arange(len(ds_)), -1)) + 1
        keep = rnk <= 3
        sel = order[keep]
        return pa.table({
            "doc_id": pa.array(doc[sel], pa.int64()),
            "token": pa.array(tok[sel], pa.string()),
            "tf": pa.array(tf[sel], pa.int64()),
            "df": pa.array(df[sel], pa.int64()),
            "rnk": pa.array(rnk[keep], pa.int64())})

    return _read(sf_dir, "documents", ["doc_id", "text"]) \
        .map_batches(tf_rows, batch_format="pyarrow") \
        .groupby("bucket").map_groups(with_df, batch_format="pyarrow") \
        .groupby("bucket2").map_groups(topk, batch_format="pyarrow")


SQL_TFIDF_TOP_TERMS = r"""WITH toks AS (
  SELECT doc_id,
         unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS token
  FROM documents),
tf AS (SELECT doc_id, token, CAST(COUNT(*) AS BIGINT) AS tf
       FROM toks GROUP BY 1, 2),
df AS (SELECT token, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY 1),
r AS (SELECT tf.doc_id, tf.token, tf.tf, df.df,
        ROW_NUMBER() OVER (PARTITION BY tf.doc_id
          ORDER BY tf.tf DESC, df.df ASC, tf.token) AS rnk
      FROM tf JOIN df USING (token))
SELECT doc_id, token, tf, df, CAST(rnk AS BIGINT) AS rnk
FROM r WHERE rnk <= 3"""


def q_union_sources(sf_dir: str):
    """Heterogeneous multi-source harmonization: events and orders
    project to ONE common (day, kind, cents) activity schema and
    union as a single Dataset (``ds.union`` — lazy block
    concatenation, NO shuffle, both reads stay column-pruned), then a
    per-(day, kind) count/sum rollup folds from fixed-width partials.
    The multi-source ingest shape of a warehouse feed: every later
    stage sees one schema regardless of origin.
    """
    import numpy as np

    _DAY = 86_400_000_000

    def ev(t: pa.Table) -> pa.Table:
        v = t.column("value").to_numpy(zero_copy_only=False)
        ok = ~np.isnan(v) & pc.is_valid(t.column("ts")) \
            .to_numpy(zero_copy_only=False)
        ts = pc.cast(t.column("ts"), pa.int64()) \
            .to_numpy(zero_copy_only=False)[ok]
        cents = np.floor(v[ok] * 100.0).astype(np.int64)
        return pa.table({
            "day": pa.array(ts // _DAY * _DAY, pa.int64()),
            "kind": pa.array(np.repeat("event", len(cents)),
                             pa.string()),
            "cents": pa.array(cents, pa.int64())})

    def od(t: pa.Table) -> pa.Table:
        v = t.column("o_totalprice").to_numpy(zero_copy_only=False)
        ok = ~np.isnan(v) & pc.is_valid(t.column("o_orderdate")) \
            .to_numpy(zero_copy_only=False)
        ts = pc.cast(t.column("o_orderdate"), pa.int64()) \
            .to_numpy(zero_copy_only=False)[ok]
        cents = np.floor(v[ok] * 100.0).astype(np.int64)
        return pa.table({
            "day": pa.array(ts // _DAY * _DAY, pa.int64()),
            "kind": pa.array(np.repeat("order", len(cents)),
                             pa.string()),
            "cents": pa.array(cents, pa.int64())})

    def partial(t: pa.Table) -> pa.Table:
        g = t.group_by(["day", "kind"]).aggregate(
            [("cents", "sum"), ("cents", "count")])
        return pa.table({"day": g.column("day"),
                         "kind": g.column("kind"),
                         "total": g.column("cents_sum"),
                         "n": pc.cast(g.column("cents_count"),
                                      pa.int64())})

    u = _read(sf_dir, "events", ["ts", "value"]) \
        .map_batches(ev, batch_format="pyarrow") \
        .union(_read(sf_dir, "orders", ["o_orderdate", "o_totalprice"])
               .map_batches(od, batch_format="pyarrow"))
    out = _combine_partials(u.map_batches(partial,
                                          batch_format="pyarrow"),
                            ["day", "kind"],
                            {"total": "total_cents", "n": "n"})
    return pa.table({
        "day": pc.cast(out.column("day"), pa.timestamp("us")),
        "kind": out.column("kind"),
        "total_cents": out.column("total_cents"),
        "n": out.column("n")})


SQL_UNION_SOURCES = """WITH u AS (
  SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
         'event' AS kind,
         CAST(floor(value * 100) AS BIGINT) AS cents
  FROM events WHERE ts IS NOT NULL AND value IS NOT NULL
  UNION ALL
  SELECT CAST(date_trunc('day', o_orderdate) AS TIMESTAMP), 'order',
         CAST(floor(o_totalprice * 100) AS BIGINT)
  FROM orders WHERE o_orderdate IS NOT NULL
    AND o_totalprice IS NOT NULL)
SELECT day, kind, CAST(SUM(cents) AS BIGINT) AS total_cents,
       COUNT(*) AS n
FROM u GROUP BY 1, 2"""


def q_time_weighted_value(sf_dir: str):
    """Time-weighted value integral per event type: each event's value
    holds until the same user's NEXT event, so the per-type mean-gauge
    numerator is sum(cents x held_seconds) and the denominator
    sum(held_seconds) — the telemetry "average gauge over time"
    semantics, where a value held for an hour counts 3600x a value
    held a second (`dwell_time` integrates TIME per type; this
    integrates VALUE x time). Both sums stay integers so the oracle
    compares exactly; the consumer divides. One user-bucket shuffle,
    per-bucket `_lag_scaffold` diff + bincount partials.
    """
    import numpy as np

    n_buckets = adaptive_buckets(_nrows(sf_dir, "events"))

    def tag(t: pa.Table) -> pa.Table:
        v = t.column("value").to_numpy(zero_copy_only=False)
        ok = pa.array(~np.isnan(v)
                      & pc.is_valid(t.column("user_id"))
                      .to_numpy(zero_copy_only=False)
                      & pc.is_valid(t.column("ts"))
                      .to_numpy(zero_copy_only=False))
        sub = pa.table({"u": t.column("user_id"),
                        "ts": pc.cast(t.column("ts"), pa.int64()),
                        "eid": t.column("event_id"),
                        "et": t.column("event_type"),
                        "cents": pa.array(
                            np.floor(v * 100.0), pa.float64())}) \
            .filter(ok)
        sub = sub.set_column(4, "cents",
                             pc.cast(sub.column("cents"), pa.int64()))
        return sub.append_column("bucket", int_bucket(sub.column("u"),
                                                      n_buckets))

    def grp(g: pa.Table) -> pa.Table:
        u = g.column("u").to_numpy(zero_copy_only=False)
        ts = g.column("ts").to_numpy(zero_copy_only=False)
        eid = g.column("eid").to_numpy(zero_copy_only=False)
        cents = g.column("cents").to_numpy(zero_copy_only=False)
        enc = pc.dictionary_encode(g.column("et").combine_chunks())
        code = enc.indices.to_numpy(zero_copy_only=False)
        order, new_run, gap = _lag_scaffold([u], ts, eid)
        has_next = ~new_run[1:]
        src = code[order][:-1][has_next]
        held_s = gap[1:][has_next] // 1_000_000
        val = cents[order][:-1][has_next]
        k = len(enc.dictionary)
        den = np.bincount(src, weights=held_s.astype(np.float64),
                          minlength=k).astype(np.int64)
        num = np.bincount(src, weights=(val * held_s)
                          .astype(np.float64),
                          minlength=k).astype(np.int64)
        cnt = np.bincount(src, minlength=k)
        nz = np.flatnonzero(cnt)
        return pa.table({
            "event_type": pc.take(enc.dictionary,
                                  pa.array(nz, pa.int32())),
            "num": pa.array(num[nz], pa.int64()),
            "den": pa.array(den[nz], pa.int64())})

    small = _read(sf_dir, "events",
                  ["event_id", "user_id", "ts", "event_type", "value"]) \
        .map_batches(tag, batch_format="pyarrow") \
        .groupby("bucket").map_groups(grp, batch_format="pyarrow")
    return _combine_partials(small, ["event_type"],
                             {"num": "num_cents_s", "den": "den_s"})


SQL_TIME_WEIGHTED_VALUE = """WITH s AS (
  SELECT user_id, event_type,
    CAST(floor(value * 100) AS BIGINT) AS cents,
    date_diff('microseconds', ts,
      LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id))
      // 1000000 AS held_s
  FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL
    AND value IS NOT NULL)
SELECT event_type,
  CAST(SUM(cents * held_s) AS BIGINT) AS num_cents_s,
  CAST(SUM(held_s) AS BIGINT) AS den_s
FROM s WHERE held_s IS NOT NULL GROUP BY 1"""


def q_weighted_sample(sf_dir: str, k: int = 200):
    """Deterministic WEIGHTED sample: `sample_uniform`'s hash-rank
    order with the rank divided by a per-type weight — a type with
    weight w gets ~w x the inclusion odds of weight 1 (integer
    division keeps the SQL mirror HUGEINT-free and the tie order
    id-deterministic). The mixture-curation counterpart of uniform
    sampling: boost rare-but-valuable classes in a fixed-size sample,
    reproducibly across reruns and partitionings. Same no-shuffle
    shape: per-batch k-smallest partials, blocks x k driver fold.
    """
    import numpy as np

    M, A = 1_000_000_007, 2_654_435_761
    WEIGHTS = {"error": 10, "purchase": 4}

    def partial(t: pa.Table) -> pa.Table:
        eid = t.column("event_id").to_numpy(zero_copy_only=False)
        h = (eid % M).astype(np.int64) * A % M
        wv = np.ones(len(h), np.int64)
        et = t.column("event_type")
        for ty, wt in WEIGHTS.items():
            wv[pc.fill_null(pc.equal(et, ty), False)
               .to_numpy(zero_copy_only=False).astype(bool)] = wt
        prio = h // wv
        take = min(k, len(prio))
        cand = np.argpartition(prio, take - 1)[:take] if take else \
            np.array([], np.int64)
        order = cand[np.lexsort((eid[cand], prio[cand]))]
        return pa.table({
            "event_id": pa.array(eid[order], pa.int64()),
            "event_type": et.take(pa.array(order)),
            "prio": pa.array(prio[order], pa.int64())})

    merged = pa.concat_tables(list(
        _read(sf_dir, "events", ["event_id", "event_type"])
        .map_batches(partial, batch_format="pyarrow")
        .iter_batches(batch_size=None, batch_format="pyarrow")))
    top = merged.sort_by([("prio", "ascending"),
                          ("event_id", "ascending")]).slice(0, k)
    return top.select(["event_id", "event_type"])


SQL_WEIGHTED_SAMPLE = """SELECT event_id, event_type
FROM events
ORDER BY ((event_id % 1000000007) * 2654435761 % 1000000007)
  // (CASE event_type WHEN 'error' THEN 10
      WHEN 'purchase' THEN 4 ELSE 1 END), event_id
LIMIT 200"""


def q_unpivot_measures(sf_dir: str):
    """UNPIVOT reshape — wide measure columns to long (key, measure,
    val) rows, the inverse of `pivot_counts`: lineitem's four numeric
    measures become 4n tall-format rows for measure-generic downstream
    stages (profilers, plotters, metric sinks take ONE schema). Narrow
    per-batch explode (4 column takes, no python rows, no shuffle);
    cents-quantized so the oracle compares exactly.
    """
    import numpy as np

    MEASURES = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]

    def explode(t: pa.Table) -> pa.Table:
        parts = []
        for m in MEASURES:
            v = t.column(m).to_numpy(zero_copy_only=False)
            # null-faithful: floor(NULL) stays NULL in the mirror
            miss = np.isnan(v)
            cents = np.where(miss, 0, np.floor(v * 100.0)) \
                .astype(np.int64)
            parts.append(pa.table({
                "l_orderkey": t.column("l_orderkey"),
                "l_linenumber": t.column("l_linenumber"),
                "measure": pa.array(np.repeat(m, len(v)), pa.string()),
                "val_cents": pa.array(cents, pa.int64(), mask=miss)}))
        return pa.concat_tables(parts)

    return _read(sf_dir, "lineitem",
                 ["l_orderkey", "l_linenumber"] + MEASURES) \
        .map_batches(explode, batch_format="pyarrow")


SQL_UNPIVOT_MEASURES = """
SELECT l_orderkey, l_linenumber, measure,
       CAST(floor(val * 100) AS BIGINT) AS val_cents
FROM (
  SELECT l_orderkey, l_linenumber, 'l_quantity' AS measure,
         l_quantity AS val FROM lineitem
  UNION ALL SELECT l_orderkey, l_linenumber, 'l_extendedprice',
         l_extendedprice FROM lineitem
  UNION ALL SELECT l_orderkey, l_linenumber, 'l_discount',
         l_discount FROM lineitem
  UNION ALL SELECT l_orderkey, l_linenumber, 'l_tax',
         l_tax FROM lineitem)"""


def q_token_freq_sketch(sf_dir: str):
    """Count-Min point-frequency estimates for a fixed probe list over
    the document token stream — the 4th mergeable sketch
    (`textops.sketches.CountMinSketch`; HLL = distinct, MG = heaviest,
    KLL = quantiles, CMS = "how often does THIS key occur" for ANY
    probe chosen after the scan). No shuffle: per-batch d x w count
    matrices, element-wise driver sum. Rows-only: est >= true always;
    est <= true + e/w x n w.h.p. — both value-asserted against exact
    counts in tests/test_sketches.py.
    """
    from .textops.sketches import cms_point_estimates

    probes = ["the", "data", "scan", "window", "sort", "zebra"]
    return cms_point_estimates(
        _read(sf_dir, "documents", ["text"]),
        column="text", probes=probes, tokenize=True)


def q_pagerank_iter(sf_dir: str):
    """One EXACT PageRank-style message-passing iteration over the
    customer→supplier purchase graph — the graph-propagation primitive
    (kmeans_iter is the centroid iteration, dedup_clusters the
    connected components; this is the third iterative-algorithm
    family: a full PageRank is this query looped with ranks swapped).
    Every supplier receives sum(1e6 // outdeg(c)) over its DISTINCT
    customer edges — integer-permille quantized (floor division) so
    both engines agree bit-for-bit with no float mass drift.

    Plan: edges come from ONE fact×fact hash-shuffle join
    (orders⨝lineitem on orderkey, both sides projected to 2 ints),
    then ONE customer-bucket cogroup dedups edges exactly (a
    customer's edges co-locate), computes outdeg locally, and emits
    per-supplier partial sums — the degree never ships, only
    fixed-width (supplier, ppm) partials fold at the driver.
    """
    import numpy as np
    from .joins import hash_join

    n_orders = _nrows(sf_dir, "orders")
    n_li = _nrows(sf_dir, "lineitem")
    n_buckets = adaptive_buckets(n_li)

    orders = _read(sf_dir, "orders", ["o_orderkey", "o_custkey"])
    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_suppkey"])
    joined = hash_join(li, orders, on="l_orderkey",
                       right_on="o_orderkey",
                       num_partitions=max(4, (n_orders + n_li)
                                          // 500_000 + 1))

    def tag(t: pa.Table) -> pa.Table:
        # local distinct (cust, supp) shrinks the shuffle; the bucket
        # cogroup dedups exactly
        d = t.select(["o_custkey", "l_suppkey"]) \
            .group_by(["o_custkey", "l_suppkey"]).aggregate([])
        return d.append_column(
            "bucket", int_bucket(d.column("o_custkey"), n_buckets))

    def grp(g: pa.Table) -> pa.Table:
        c = g.column("o_custkey").to_numpy(zero_copy_only=False)
        s = g.column("l_suppkey").to_numpy(zero_copy_only=False)
        # exact dedup inside the bucket
        pairs = np.stack([c, s], axis=1)
        pairs = np.unique(pairs, axis=0)
        c, s = pairs[:, 0], pairs[:, 1]
        cu, cinv = np.unique(c, return_inverse=True)
        outdeg = np.bincount(cinv)
        ppm = 1_000_000 // outdeg[cinv]
        su, sinv = np.unique(s, return_inverse=True)
        tot = np.bincount(sinv, weights=ppm.astype(np.float64)) \
            .astype(np.int64)
        return pa.table({"l_suppkey": pa.array(su, pa.int64()),
                         "ppm": pa.array(tot, pa.int64())})

    small = joined.map_batches(tag, batch_format="pyarrow") \
        .groupby("bucket").map_groups(grp, batch_format="pyarrow")
    return _combine_partials(small, ["l_suppkey"], {"ppm": "rank_ppm"})


SQL_PAGERANK_ITER = """WITH edges AS (
  SELECT DISTINCT o_custkey AS c, l_suppkey AS s
  FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
deg AS (SELECT c, COUNT(*) AS d FROM edges GROUP BY 1)
SELECT s AS l_suppkey, CAST(SUM(1000000 // d) AS BIGINT) AS rank_ppm
FROM edges JOIN deg USING (c) GROUP BY 1"""


def q_dense_rank_rows(sf_dir: str):
    """DENSE_RANK retrieval WITH ties: every event whose value sits in
    its type's top-3 DISTINCT values — `dense_topk` returns the
    distinct VALUES, `topk_per_user` exactly k rows; this returns ALL
    rows occupying the top value classes (ties included), the "show
    me every record at the best three price points" shape. The top-3
    distinct set is ASSOCIATIVE (top-3 distinct of a union = top-3
    distinct of partial top-3s), so pass 1 folds <= 3 rows per
    (batch, type) partials into a tiny driver threshold/rank table and
    pass 2 is a narrow broadcast filter-back — no shuffle, no
    self-join.
    """
    import numpy as np

    ds = _read(sf_dir, "events", ["event_id", "event_type", "value"])

    def partial(t: pa.Table) -> pa.Table:
        v = t.column("value").to_numpy(zero_copy_only=False)
        ok = ~np.isnan(v) & pc.is_valid(t.column("event_type")) \
            .to_numpy(zero_copy_only=False)
        cents = np.floor(v[ok] * 100.0).astype(np.int64)
        et = t.column("event_type").filter(pa.array(ok)) \
            .combine_chunks()
        enc = pc.dictionary_encode(et)
        code = enc.indices.to_numpy(zero_copy_only=False)
        # per type: top-3 distinct local cents
        pairs = np.unique(np.stack([code.astype(np.int64), cents],
                                   axis=1), axis=0)
        keep = np.zeros(len(pairs), bool)
        # pairs sorted by (code, cents) asc: the top-3 of each code
        # run are its LAST 3 rows
        cd = pairs[:, 0]
        last = np.flatnonzero(np.append(cd[1:] != cd[:-1], True))
        for off in range(3):
            idx = last - off
            valid = idx >= 0
            # an index may step into the previous code's run; mask it
            valid &= cd[idx.clip(0)] == cd[last]
            keep[idx[valid]] = True
        sel = pairs[keep]
        return pa.table({
            "event_type": pc.take(enc.dictionary,
                                  pa.array(sel[:, 0], pa.int32())),
            "cents": pa.array(sel[:, 1], pa.int64())})

    folded = _combine_partials(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["event_type", "cents"], {"cents": "c2"}).drop_columns(["c2"])
    et = folded.column("event_type").to_pylist()
    cv = folded.column("cents").to_pylist()
    by_type: dict[str, list[int]] = {}
    for ty, v in zip(et, cv):
        by_type.setdefault(ty, []).append(v)
    keys, rnks = [], []
    for ty, vals in by_type.items():
        for r, v in enumerate(sorted(set(vals), reverse=True)[:3], 1):
            keys.append(f"{ty}|{v}")
            rnks.append(r)
    key_arr = pa.array(keys, pa.string())
    rnk_arr = pa.array(rnks, pa.int64())

    def mark(t: pa.Table) -> pa.Table:
        v = t.column("value").to_numpy(zero_copy_only=False)
        ok = ~np.isnan(v) & pc.is_valid(t.column("event_type")) \
            .to_numpy(zero_copy_only=False)
        sub = t.filter(pa.array(ok))
        cents = np.floor(v[ok] * 100.0).astype(np.int64)
        k = pc.binary_join_element_wise(
            sub.column("event_type").combine_chunks(),
            pc.cast(pa.array(cents, pa.int64()), pa.string()), "|")
        idx = pc.index_in(k, value_set=key_arr)
        hit = pc.is_valid(idx)
        out = pa.table({
            "event_id": sub.column("event_id"),
            "event_type": sub.column("event_type"),
            "value_cents": pa.array(cents, pa.int64()),
            "drnk": pc.take(rnk_arr, idx)})
        return out.filter(hit)

    return ds.map_batches(mark, batch_format="pyarrow")


SQL_DENSE_RANK_ROWS = """WITH e AS (
  SELECT event_id, event_type,
         CAST(floor(value * 100) AS BIGINT) AS cents
  FROM events WHERE value IS NOT NULL AND event_type IS NOT NULL)
SELECT event_id, event_type, cents AS value_cents,
  CAST(DENSE_RANK() OVER (PARTITION BY event_type
       ORDER BY cents DESC) AS BIGINT) AS drnk
FROM e QUALIFY drnk <= 3"""


def q_time_weighted_median(sf_dir: str):
    """Time-weighted MEDIAN gauge value per type: the smallest cents
    value whose cumulative HELD-SECONDS weight reaches half the
    type's total — the order-statistic complement of
    `time_weighted_value`'s mean (a gauge that idles at 0 for an hour
    then spikes for a second has median 0, mean near 0, max high).
    Weighted quantiles decompose exactly like the count-weighted ones:
    the user-bucket cogroup emits (type, cents, held_s) partials
    (bounded by types x distinct quanta), the driver folds weights and
    reads the smallest cents with cum >= ceil(total/2).
    """
    import numpy as np

    n_buckets = adaptive_buckets(_nrows(sf_dir, "events"))

    def tag(t: pa.Table) -> pa.Table:
        v = t.column("value").to_numpy(zero_copy_only=False)
        ok = pa.array(~np.isnan(v)
                      & pc.is_valid(t.column("user_id"))
                      .to_numpy(zero_copy_only=False)
                      & pc.is_valid(t.column("ts"))
                      .to_numpy(zero_copy_only=False))
        sub = pa.table({"u": t.column("user_id"),
                        "ts": pc.cast(t.column("ts"), pa.int64()),
                        "eid": t.column("event_id"),
                        "et": t.column("event_type"),
                        "cents": pa.array(
                            np.floor(v * 100.0), pa.float64())}) \
            .filter(ok)
        sub = sub.set_column(4, "cents",
                             pc.cast(sub.column("cents"), pa.int64()))
        return sub.append_column("bucket", int_bucket(sub.column("u"),
                                                      n_buckets))

    def grp(g: pa.Table) -> pa.Table:
        u = g.column("u").to_numpy(zero_copy_only=False)
        ts = g.column("ts").to_numpy(zero_copy_only=False)
        eid = g.column("eid").to_numpy(zero_copy_only=False)
        cents = g.column("cents").to_numpy(zero_copy_only=False)
        et = g.column("et").combine_chunks()
        order, new_run, gap = _lag_scaffold([u], ts, eid)
        has_next = ~new_run[1:]
        held_s = gap[1:][has_next] // 1_000_000
        src = order[:-1][has_next]
        tt = pa.table({"event_type": et.take(pa.array(src, pa.int64())),
                       "cents": pa.array(cents[src], pa.int64()),
                       "w": pa.array(held_s, pa.int64())})
        gg = tt.group_by(["event_type", "cents"]).aggregate(
            [("w", "sum")])
        return pa.table({"event_type": gg.column("event_type"),
                         "cents": gg.column("cents"),
                         "w": gg.column("w_sum")})

    small = _read(sf_dir, "events",
                  ["event_id", "user_id", "ts", "event_type", "value"]) \
        .map_batches(tag, batch_format="pyarrow") \
        .groupby("bucket").map_groups(grp, batch_format="pyarrow")
    folded = _combine_partials(small, ["event_type", "cents"],
                               {"w": "w"})
    et = folded.column("event_type").to_pylist()
    cv = folded.column("cents").to_numpy(zero_copy_only=False)
    wv = folded.column("w").to_numpy(zero_copy_only=False)
    out_t, out_m, out_tot = [], [], []
    for ty in sorted(set(et)):
        mask = np.array([x == ty for x in et])
        c, w = cv[mask], wv[mask]
        o = np.argsort(c)
        c, w = c[o], w[o]
        cum = np.cumsum(w)
        tot = int(cum[-1]) if len(cum) else 0
        thr = (tot + 1) // 2
        pos = int(np.searchsorted(cum, thr))
        out_t.append(ty)
        out_m.append(int(c[min(pos, len(c) - 1)]))
        out_tot.append(tot)
    return pa.table({"event_type": pa.array(out_t, pa.string()),
                     "median_cents": pa.array(out_m, pa.int64()),
                     "total_s": pa.array(out_tot, pa.int64())})


SQL_TIME_WEIGHTED_MEDIAN = """WITH s AS (
  SELECT user_id, event_type,
    CAST(floor(value * 100) AS BIGINT) AS cents,
    date_diff('microseconds', ts,
      LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id))
      // 1000000 AS held_s
  FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL
    AND value IS NOT NULL),
w AS (SELECT event_type, cents, CAST(SUM(held_s) AS BIGINT) AS w
      FROM s WHERE held_s IS NOT NULL GROUP BY 1, 2),
c AS (SELECT event_type, cents, w,
        SUM(w) OVER (PARTITION BY event_type ORDER BY cents) AS cum,
        SUM(w) OVER (PARTITION BY event_type) AS tot
      FROM w)
SELECT event_type,
  CAST(MIN(CASE WHEN cum >= (tot + 1) // 2 THEN cents END)
       AS BIGINT) AS median_cents,
  CAST(MAX(tot) AS BIGINT) AS total_s
FROM c GROUP BY 1"""


def q_funnel_steps(sf_dir: str):
    """Three-step strictly-ordered funnel per user: first 'view', then
    the first 'click' STRICTLY AFTER it, then the first 'purchase'
    strictly after that — the sequential-pattern match
    (`funnel_conversion` is the 2-step windowed variant; this is the
    n-step dependent chain, where each step's anchor is the PREVIOUS
    step's result, not a fixed window). One user-bucket shuffle; per
    bucket each step is one masked ``np.minimum.at`` against the
    previous step's per-user anchor — vectorized, step count x O(rows),
    no per-user loop. Users missing a step carry NULL from that step
    on (LEFT-join chain semantics).
    """
    import numpy as np

    STEPS = ["view", "click", "purchase"]
    n_buckets = adaptive_buckets(_nrows(sf_dir, "events"))

    def tag(t: pa.Table) -> pa.Table:
        keep = pc.and_(pc.and_(pc.is_valid(t.column("user_id")),
                               pc.is_valid(t.column("ts"))),
                       pc.is_in(t.column("event_type"),
                                value_set=pa.array(STEPS, pa.string())))
        sub = pa.table({"u": t.column("user_id"),
                        "ts": pc.cast(t.column("ts"), pa.int64()),
                        "et": t.column("event_type")}).filter(keep)
        return sub.append_column("bucket", int_bucket(sub.column("u"),
                                                      n_buckets))

    BIG = np.iinfo(np.int64).max

    def grp(g: pa.Table) -> pa.Table:
        u = g.column("u").to_numpy(zero_copy_only=False)
        ts = g.column("ts").to_numpy(zero_copy_only=False)
        et = g.column("et").to_numpy(zero_copy_only=False)
        uniq, inv = np.unique(u, return_inverse=True)
        anchors = []
        prev = np.full(len(uniq), -1, np.int64)  # ts > -1 always true
        for step in STEPS:
            cur = np.full(len(uniq), BIG, np.int64)
            m = (et == step) & (ts > prev[inv])
            np.minimum.at(cur, inv[m], ts[m])
            anchors.append(cur)
            prev = cur
        t1, t2, t3 = anchors
        has1 = t1 < BIG
        return pa.table({
            "user_id": pa.array(uniq[has1], pa.int64()),
            "t1": pa.array(t1[has1], pa.int64()),
            "t2": pa.array(t2[has1], pa.int64(), mask=t2[has1] == BIG),
            "t3": pa.array(t3[has1], pa.int64(),
                           mask=t3[has1] == BIG)})

    out = pa.concat_tables(list(
        _read(sf_dir, "events", ["user_id", "ts", "event_type"])
        .map_batches(tag, batch_format="pyarrow")
        .groupby("bucket").map_groups(grp, batch_format="pyarrow")
        .iter_batches(batch_size=None, batch_format="pyarrow")),
        promote_options="default")
    return pa.table({
        "user_id": out.column("user_id"),
        "t1": pc.cast(out.column("t1"), pa.timestamp("us")),
        "t2": pc.cast(out.column("t2"), pa.timestamp("us")),
        "t3": pc.cast(out.column("t3"), pa.timestamp("us"))})


SQL_FUNNEL_STEPS = """WITH v AS (
  SELECT user_id, MIN(ts) AS t1 FROM events
  WHERE event_type = 'view' AND user_id IS NOT NULL
    AND ts IS NOT NULL GROUP BY 1),
c AS (SELECT e.user_id, MIN(e.ts) AS t2 FROM events e
      JOIN v ON e.user_id = v.user_id
      WHERE e.event_type = 'click' AND e.ts > v.t1 GROUP BY 1),
p AS (SELECT e.user_id, MIN(e.ts) AS t3 FROM events e
      JOIN c ON e.user_id = c.user_id
      WHERE e.event_type = 'purchase' AND e.ts > c.t2 GROUP BY 1)
SELECT v.user_id, v.t1, c.t2, p.t3
FROM v LEFT JOIN c USING (user_id) LEFT JOIN p USING (user_id)"""


def q_nested_quantiles(sf_dir: str):
    """NESTED order statistics: each user's EXACT p95 value, then the
    median and p95 of that per-user distribution — "what does a
    typical user's tail look like", the two-level fleet-latency shape
    (`quantiles` is one global level; this composes entity-local order
    statistics under a population-level one). Level 1 is exact on raw
    cents inside the user-bucket cogroup (users co-locate — the
    `median_gap_per_user` contract); each bucket ships (p95, count)
    partials bounded by its distinct p95 values; level 2 reads the
    population quantiles off the folded CDF with the repo's single
    selection rule (`aggregates.quantile_from_cdf` — both levels, so
    the SQL CEIL expression matches bit-for-bit).
    """
    import numpy as np
    from .aggregates import quantile_from_cdf

    n_buckets = adaptive_buckets(_nrows(sf_dir, "events"))

    def tag(t: pa.Table) -> pa.Table:
        v = t.column("value").to_numpy(zero_copy_only=False)
        ok = pa.array(~np.isnan(v)
                      & pc.is_valid(t.column("user_id"))
                      .to_numpy(zero_copy_only=False))
        sub = pa.table({"u": t.column("user_id"),
                        "cents": pa.array(np.floor(v * 100.0),
                                          pa.float64())}).filter(ok)
        sub = sub.set_column(1, "cents",
                             pc.cast(sub.column("cents"), pa.int64()))
        return sub.append_column("bucket", int_bucket(sub.column("u"),
                                                      n_buckets))

    def grp(g: pa.Table) -> pa.Table:
        u = g.column("u").to_numpy(zero_copy_only=False)
        c = g.column("cents").to_numpy(zero_copy_only=False)
        order = np.lexsort((c, u))
        us, cs = u[order], c[order]
        new_u = np.empty(len(us), bool)
        new_u[0] = True
        new_u[1:] = us[1:] != us[:-1]
        starts = np.flatnonzero(new_u)
        ends = np.append(starts[1:], len(us))
        n_u = ends - starts
        # per user: smallest cents with rank >= ceil(0.95 * n) — the
        # shared selection rule on the user's sorted run
        pos = starts + np.ceil(0.95 * n_u).astype(np.int64) - 1
        p95 = cs[pos]
        uniq, cnt = np.unique(p95, return_counts=True)
        return pa.table({"p95": pa.array(uniq, pa.int64()),
                         "cnt": pa.array(cnt.astype(np.int64),
                                         pa.int64())})

    folded = _combine_partials(
        _read(sf_dir, "events", ["user_id", "value"])
        .map_batches(tag, batch_format="pyarrow")
        .groupby("bucket").map_groups(grp, batch_format="pyarrow"),
        ["p95"], {"cnt": "cnt"})
    vals = folded.column("p95").to_numpy(zero_copy_only=False)
    cnts = folded.column("cnt").to_numpy(zero_copy_only=False)
    order = np.argsort(vals)
    uniq, cum = vals[order], np.cumsum(cnts[order])
    return pa.table({
        "n_users": pa.array([int(cum[-1])], pa.int64()),
        "med_user_p95": pa.array([quantile_from_cdf(uniq, cum, 0.5)],
                                 pa.int64()),
        "p95_user_p95": pa.array([quantile_from_cdf(uniq, cum, 0.95)],
                                 pa.int64())})


SQL_NESTED_QUANTILES = """WITH c AS (
  SELECT user_id, CAST(floor(value * 100) AS BIGINT) AS q
  FROM events WHERE user_id IS NOT NULL AND value IS NOT NULL),
g AS (SELECT user_id, q, COUNT(*) AS cnt FROM c GROUP BY 1, 2),
s AS (SELECT user_id, q,
        SUM(cnt) OVER (PARTITION BY user_id ORDER BY q) AS cum,
        SUM(cnt) OVER (PARTITION BY user_id) AS total FROM g),
up AS (SELECT user_id,
         MIN(CASE WHEN cum >= CEIL(0.95 * total) THEN q END) AS p95
       FROM s GROUP BY 1),
g2 AS (SELECT p95, COUNT(*) AS cnt FROM up GROUP BY 1),
s2 AS (SELECT p95, SUM(cnt) OVER (ORDER BY p95) AS cum,
         SUM(cnt) OVER () AS total FROM g2)
SELECT CAST(MAX(total) AS BIGINT) AS n_users,
  CAST(MIN(CASE WHEN cum >= CEIL(0.5 * total) THEN p95 END)
       AS BIGINT) AS med_user_p95,
  CAST(MIN(CASE WHEN cum >= CEIL(0.95 * total) THEN p95 END)
       AS BIGINT) AS p95_user_p95
FROM s2"""


def q_power_iter(sf_dir: str):
    """One EXACT power-method iteration on the embedding Gram matrix:
    ``y = X^T (X @ 1)`` over int64-quantized components — the dominant-
    eigenvector step of PCA/spectral methods, and the fourth iterative
    family (kmeans = centroids, pagerank = graph, dedup_clusters = CC,
    this = linear algebra; a full power method loops it with the
    normalized y as the next probe). Quantization (round(v * 1e6))
    makes the matrix-vector fold integer-exact on both engines.
    Narrow: each batch reshapes its list column once (slice-aware
    flatten), emits ONE dim-length partial row set; the driver folds
    blocks x dim ints. Nothing shuffles, nothing materializes.
    """
    import numpy as np

    def partial(t: pa.Table) -> pa.Table:
        emb = t.column("embedding")
        emb = emb.combine_chunks() if isinstance(
            emb, pa.ChunkedArray) else emb
        flat = emb.flatten().to_numpy(zero_copy_only=False)
        n = len(emb)
        if n == 0:
            return pa.table({"idx": pa.array([], pa.int64()),
                             "y": pa.array([], pa.int64())})
        d = len(flat) // n
        q = np.round(flat.astype(np.float64) * 1e6) \
            .astype(np.int64).reshape(n, d)
        s = q.sum(axis=1)  # X @ 1, exact
        y = (q * s[:, None]).sum(axis=0)  # X^T s, exact
        return pa.table({"idx": pa.array(np.arange(1, d + 1), pa.int64()),
                         "y": pa.array(y, pa.int64())})

    return _combine_partials(
        _read(sf_dir, "embeddings", ["embedding"])
        .map_batches(partial, batch_format="pyarrow"),
        ["idx"], {"y": "y"})


SQL_POWER_ITER = """WITH q AS (
  SELECT vec_id,
    CAST(round(CAST(unnest(embedding) AS DOUBLE) * 1000000)
         AS BIGINT) AS qv,
    CAST(generate_subscripts(embedding, 1) AS BIGINT) AS i
  FROM embeddings),
s AS (SELECT vec_id, CAST(SUM(qv) AS BIGINT) AS s FROM q GROUP BY 1)
SELECT q.i AS idx, CAST(SUM(q.qv * s.s) AS BIGINT) AS y
FROM q JOIN s USING (vec_id) GROUP BY 1"""


def q_source_vocab_overlap(sf_dir: str):
    """Pairwise Jaccard overlap BETWEEN GROUP vocabularies: for every
    source pair, |Va n Vb| and |Va u Vb| over distinct token sets —
    corpus-mixture redundancy ("is src3 just src7 re-crawled?"), the
    set-similarity-between-GROUPS shape (minhash/jaccard dedup compares
    documents; this compares whole strata). Tokens partition disjointly
    by hash (the `vocab_per_source` contract), so ONE token-bucket
    cogroup sees every source a token occurs in: it emits C(m, 2)
    pair partials (vectorized repeat/aranges explode — the
    `cooccurrence` kernel shape) plus per-source distinct counts, and
    both fold exactly because no token spans two buckets. Pair space
    is sources^2 — a group-key cardinality, not a corpus one.
    """
    import numpy as np
    from .textops.analysis import flat_tokens

    n_buckets = adaptive_buckets(_nrows(sf_dir, "documents"))

    def tag(t: pa.Table) -> pa.Table:
        row_id, toks, _ = flat_tokens(t.column("text"))
        src = t.column("source").combine_chunks() \
            .take(pa.array(row_id, pa.int64()))
        tt = pa.table({"source": src, "token": toks})
        d = tt.group_by(["source", "token"]).aggregate([])
        return d.append_column(
            "bucket", fnv1a_bucket(d.column("token"), n_buckets))

    def grp(g: pa.Table) -> pa.Table:
        d = g.group_by(["source", "token"]).aggregate([])
        src = d.column("source").to_numpy(zero_copy_only=False)
        tok = d.column("token").to_numpy(zero_copy_only=False)
        _, tcode = np.unique(tok, return_inverse=True)
        scode_u, scode = np.unique(src, return_inverse=True)
        order = np.lexsort((scode, tcode))
        tc, sc = tcode[order], scode[order]
        # C(m, 2) explode per token run — the `cooccurrence`
        # repeat/arange kernel: element e of a run pairs with the
        # (remaining) elements after it; sources sort asc inside the
        # run so a < b holds positionally
        starts = np.flatnonzero(np.append(True, tc[1:] != tc[:-1])) \
            if len(tc) else np.array([], np.int64)
        cnts = np.diff(np.append(starts, len(tc)))
        run_of = np.repeat(np.arange(len(starts)), cnts)
        pos = np.arange(len(tc)) - starts[run_of]
        reps = cnts[run_of] - pos - 1
        lefts = np.repeat(np.arange(len(tc)), reps)
        tot = int(reps.sum())
        block = np.concatenate([[0], np.cumsum(reps)[:-1]]).astype(
            np.int64) if len(reps) else np.array([], np.int64)
        rights = lefts + 1 + (np.arange(tot) - np.repeat(block, reps))
        k = len(scode_u) + 1
        pair = sc[lefts] * np.int64(k) + sc[rights]
        uniq, n = np.unique(pair, return_counts=True)
        a = (uniq // k).astype(np.int64)
        b = (uniq % k).astype(np.int64)
        sz = np.bincount(sc, minlength=len(scode_u)).astype(np.int64)
        # per-source distinct sizes ride along as (source, "") rows
        return pa.table({
            "src_a": pa.concat_arrays([
                pc.take(pa.array(scode_u), pa.array(a, pa.int64())),
                pa.array(scode_u, pa.string())]),
            "src_b": pa.concat_arrays([
                pc.take(pa.array(scode_u), pa.array(b, pa.int64())),
                pa.array(np.repeat("", len(scode_u)), pa.string())]),
            "n": pa.concat_arrays([
                pa.array(n.astype(np.int64), pa.int64()),
                pa.array(sz, pa.int64())])})

    folded = _combine_partials(
        _read(sf_dir, "documents", ["source", "text"])
        .map_batches(tag, batch_format="pyarrow")
        .groupby("bucket").map_groups(grp, batch_format="pyarrow"),
        ["src_a", "src_b"], {"n": "n"})
    sa = folded.column("src_a").to_pylist()
    sb = folded.column("src_b").to_pylist()
    nn = folded.column("n").to_numpy(zero_copy_only=False)
    sizes = {a: int(n) for a, b, n in zip(sa, sb, nn) if b == ""}
    out_a, out_b, out_i, out_u = [], [], [], []
    for a, b, n in zip(sa, sb, nn):
        if b == "":
            continue
        out_a.append(a)
        out_b.append(b)
        out_i.append(int(n))
        out_u.append(sizes[a] + sizes[b] - int(n))
    return pa.table({"src_a": pa.array(out_a, pa.string()),
                     "src_b": pa.array(out_b, pa.string()),
                     "inter": pa.array(out_i, pa.int64()),
                     "uni": pa.array(out_u, pa.int64())})


SQL_SOURCE_VOCAB_OVERLAP = r"""WITH t0 AS (
  SELECT source,
         unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS token
  FROM documents),
toks AS (SELECT DISTINCT source, token FROM t0),
pairs AS (SELECT a.source AS src_a, b.source AS src_b,
                 CAST(COUNT(*) AS BIGINT) AS inter
          FROM toks a JOIN toks b
            ON a.token = b.token AND a.source < b.source
          GROUP BY 1, 2),
sizes AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS v
          FROM toks GROUP BY 1)
SELECT src_a, src_b, inter, sa.v + sb.v - inter AS uni
FROM pairs
JOIN sizes sa ON sa.source = src_a
JOIN sizes sb ON sb.source = src_b"""


def q_customers_full_coverage(sf_dir: str):
    """Relational DIVISION ("for all"): customers whose orders span
    EVERY distinct order priority — the classic universal-quantifier
    query no other catalog entry expresses (semi/anti joins are
    EXISTS/NOT EXISTS; this is FORALL, done as count-distinct =
    global-distinct-count). Per-batch distinct (cust, priority) pairs
    shrink the exchange; ONE customer-bucket cogroup counts exact
    distinct priorities per customer (pairs co-locate); the divisor —
    the global distinct priority count — folds from tiny per-batch
    distinct lists. Output: the qualifying customer keys.
    """
    import numpy as np

    n_buckets = adaptive_buckets(_nrows(sf_dir, "orders"))

    def tag(t: pa.Table) -> pa.Table:
        d = t.select(["o_custkey", "o_orderpriority"]) \
            .group_by(["o_custkey", "o_orderpriority"]).aggregate([])
        return d.append_column(
            "bucket", int_bucket(d.column("o_custkey"), n_buckets))

    # divisor: global distinct priorities (tiny fold; its own small
    # execution — the filter threshold must exist before the cogroup)
    def prios(t: pa.Table) -> pa.Table:
        d = t.select(["o_orderpriority"]) \
            .group_by("o_orderpriority").aggregate([])
        return d.append_column("one", pa.array([1] * d.num_rows,
                                               pa.int64()))

    n_prio = _combine_partials(
        _read(sf_dir, "orders", ["o_orderpriority"])
        .map_batches(prios, batch_format="pyarrow"),
        ["o_orderpriority"], {"one": "one"}).num_rows

    def grp(g: pa.Table) -> pa.Table:
        d = g.group_by(["o_custkey", "o_orderpriority"]).aggregate([])
        cnt = d.group_by("o_custkey").aggregate(
            [("o_orderpriority", "count")])
        full = cnt.filter(pc.equal(cnt.column("o_orderpriority_count"),
                                   n_prio))
        return pa.table({"o_custkey": full.column("o_custkey")})

    out = pa.concat_tables(list(
        _read(sf_dir, "orders", ["o_custkey", "o_orderpriority"])
        .map_batches(tag, batch_format="pyarrow")
        .groupby("bucket").map_groups(grp, batch_format="pyarrow")
        .iter_batches(batch_size=None, batch_format="pyarrow")),
        promote_options="default")
    return out


SQL_CUSTOMERS_FULL_COVERAGE = """
SELECT o_custkey FROM orders
GROUP BY o_custkey
HAVING COUNT(DISTINCT o_orderpriority) =
  (SELECT COUNT(DISTINCT o_orderpriority) FROM orders)"""


def q_fuzzy_name_pairs(sf_dir: str):
    """Fuzzy string self-join: pairs of distinct customer names at
    Levenshtein distance EXACTLY 1 — the record-linkage / typo-blocking
    primitive. Deletion-neighborhood blocking (:func:`joins.
    edit1_self_join`): each name emits len+1 keys, a distance-1 pair
    shares exactly one key, so ONE keyed shuffle finds every pair
    exactly once with an O(candidates) vectorized codepoint verify —
    linear shuffle volume vs the oracle's V² cross join."""
    from .joins import edit1_self_join
    return edit1_self_join(
        _read_dim(sf_dir, "customer", ["c_name"]), on="c_name",
        n_buckets=adaptive_buckets(_nrows(sf_dir, "customer")))


SQL_FUZZY_NAME_PAIRS = """WITH c AS (
  SELECT DISTINCT c_name FROM customer WHERE c_name IS NOT NULL)
SELECT a.c_name AS name_a, b.c_name AS name_b
FROM c a JOIN c b
ON a.c_name < b.c_name AND levenshtein(a.c_name, b.c_name) = 1"""


def q_trend_slope(sf_dir: str):
    """Grouped OLS trend (``regr_slope`` family): per event type, the
    exact integer numerator/denominator of the least-squares slope of
    value-cents against the day index — emitted as exact int64s (the
    ``grouped_corr`` convention) so the cross-engine hash never touches
    a float divide. The day index rebases to the CORPUS MIN DAY read
    from the parquet FOOTER statistics (metadata-only, no extra
    execution; falls back to a pruned one-column scan when stats are
    absent) — rebasing keeps n·Σxy within int64 at petabyte row counts
    where raw epoch-day products would wrap. One streaming pass of
    per-batch fixed-width partials, no shuffle."""
    import numpy as np

    lo_us, _ = _footer_ts_range(sf_dir, "events")
    base_day = lo_us // 86_400_000_000

    def partial(t: pa.Table) -> pa.Table:
        v = t.column("value").to_numpy(zero_copy_only=False)
        ok = ~np.isnan(v) & pc.is_valid(t.column("ts")) \
            .to_numpy(zero_copy_only=False)
        y = np.floor(v[ok] * 100.0).astype(np.int64)
        x = pc.cast(t.column("ts"), pa.int64()) \
            .to_numpy(zero_copy_only=False)[ok] // 86_400_000_000 \
            - base_day
        tt = pa.table({
            "event_type": pc.array_filter(
                t.column("event_type").combine_chunks(), pa.array(ok)),
            "x": pa.array(x, pa.int64()), "y": pa.array(y, pa.int64()),
            "xx": pa.array(x * x, pa.int64()),
            "xy": pa.array(x * y, pa.int64())})
        g = tt.group_by("event_type").aggregate(
            [("x", "sum"), ("y", "sum"), ("xx", "sum"), ("xy", "sum"),
             ("x", "count")])
        return pa.table({
            "event_type": g.column("event_type"),
            "sx": g.column("x_sum"), "sy": g.column("y_sum"),
            "sxx": g.column("xx_sum"), "sxy": g.column("xy_sum"),
            "n": pc.cast(g.column("x_count"), pa.int64())})

    small = _read(sf_dir, "events", ["event_type", "value", "ts"]) \
        .map_batches(partial, batch_format="pyarrow")
    comb = _combine_partials(small, ["event_type"],
                             {"sx": "sx", "sy": "sy", "sxx": "sxx",
                              "sxy": "sxy", "n": "n"})
    rows = comb.to_pylist()
    return pa.table({
        "event_type": pa.array([r["event_type"] for r in rows],
                               pa.string()),
        "n": pa.array([r["n"] for r in rows], pa.int64()),
        "slope_num": pa.array(
            [r["n"] * r["sxy"] - r["sx"] * r["sy"] for r in rows],
            pa.int64()),
        "slope_den": pa.array(
            [r["n"] * r["sxx"] - r["sx"] * r["sx"] for r in rows],
            pa.int64())})


SQL_TREND_SLOPE = """WITH p AS (
  SELECT event_type,
    datediff('day',
      (SELECT MIN(CAST(ts AS DATE)) FROM events WHERE ts IS NOT NULL),
      CAST(ts AS DATE)) AS x,
    CAST(FLOOR(value * 100) AS BIGINT) AS y
  FROM events WHERE NOT isnan(value) AND ts IS NOT NULL)
SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
  CAST(COUNT(*) * SUM(x*y) - SUM(x) * SUM(y) AS BIGINT) AS slope_num,
  CAST(COUNT(*) * SUM(x*x) - SUM(x) * SUM(x) AS BIGINT) AS slope_den
FROM p GROUP BY event_type"""


def q_entry_exit(sf_dir: str):
    """Entry/exit-page analysis: per user the FIRST and LAST event type
    under the (ts, event_id) total order, counted by (entry, exit)
    pair. First+last is not an associative aggregate over arbitrary
    splits, so ONE user-bucket shuffle co-locates each user; the
    per-bucket kernel is one shared lexsort scaffold plus two gathers
    (run starts / run ends), pre-reduced to per-bucket pair counts so
    only types² rows per bucket reach the tiny driver combine."""
    import numpy as np

    n_buckets = adaptive_buckets(_nrows(sf_dir, "events"))

    def tag(t: pa.Table) -> pa.Table:
        sub = pa.table({"u": t.column("user_id"),
                        "ts": pc.cast(t.column("ts"), pa.int64()),
                        "eid": t.column("event_id"),
                        "et": t.column("event_type")}) \
            .filter(pc.and_(pc.is_valid(t.column("user_id")),
                            pc.is_valid(t.column("ts"))))
        return sub.append_column("bucket", int_bucket(sub.column("u"),
                                                      n_buckets))

    def grp(g: pa.Table) -> pa.Table:
        u = g.column("u").to_numpy(zero_copy_only=False)
        ts = g.column("ts").to_numpy(zero_copy_only=False)
        eid = g.column("eid").to_numpy(zero_copy_only=False)
        order, new_run, _ = _lag_scaffold([u], ts, eid)
        starts = np.flatnonzero(new_run)
        ends = np.append(starts[1:], len(order)) - 1
        et = g.column("et").combine_chunks()
        part = pa.table({
            "entry_type": et.take(pa.array(order[starts], pa.int64())),
            "exit_type": et.take(pa.array(order[ends], pa.int64())),
            "one": pa.array(np.ones(len(starts), np.int64), pa.int64())})
        gg = part.group_by(["entry_type", "exit_type"]).aggregate(
            [("one", "sum")])
        return pa.table({"entry_type": gg.column("entry_type"),
                         "exit_type": gg.column("exit_type"),
                         "n_users": gg.column("one_sum")})

    small = _read(sf_dir, "events",
                  ["event_id", "user_id", "ts", "event_type"]) \
        .map_batches(tag, batch_format="pyarrow") \
        .groupby("bucket").map_groups(grp, batch_format="pyarrow")
    return _combine_partials(small, ["entry_type", "exit_type"],
                             {"n_users": "n_users"})


SQL_ENTRY_EXIT = """WITH o AS (
  SELECT user_id,
    FIRST(event_type ORDER BY ts, event_id) AS entry_type,
    LAST(event_type ORDER BY ts, event_id) AS exit_type
  FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL
  GROUP BY user_id)
SELECT entry_type, exit_type, CAST(COUNT(*) AS BIGINT) AS n_users
FROM o GROUP BY entry_type, exit_type"""


def q_conv_turn_histogram(sf_dir: str):
    """Two-level aggregate over the flagship transcripts: conversation
    length (turns per conv) → histogram (how many convs have each
    length). Level 1 is the conversation_assembly conv-bucket shuffle;
    level 2 pre-reduces to per-bucket (n_turns, count) partials so the
    driver combine sees buckets × distinct-lengths rows, never one row
    per conversation."""
    import numpy as np

    n_buckets = adaptive_buckets(2 * _nrows(sf_dir, "events"))

    def add_bucket(tbl: pa.Table) -> pa.Table:
        return tbl.append_column(
            "bucket", fnv1a_bucket(tbl.column("conv_id"), n_buckets))

    def grp(g: pa.Table) -> pa.Table:
        per_conv = g.group_by("conv_id").aggregate([("turn_idx", "count")])
        lens = pc.cast(per_conv.column("turn_idx_count"), pa.int64()) \
            .to_numpy(zero_copy_only=False)
        uniq, counts = np.unique(lens, return_counts=True)
        return pa.table({"n_turns": pa.array(uniq, pa.int64()),
                         "n_convs": pa.array(counts.astype(np.int64),
                                             pa.int64())})

    small = read_transcripts(sf_dir) \
        .map_batches(add_bucket, batch_format="pyarrow") \
        .groupby("bucket").map_groups(grp, batch_format="pyarrow")
    return _combine_partials(small, ["n_turns"], {"n_convs": "n_convs"})


SQL_CONV_TURN_HISTOGRAM = f"""{_T},
c AS (SELECT conv_id, CAST(COUNT(*) AS BIGINT) AS n_turns
      FROM transcripts GROUP BY conv_id)
SELECT n_turns, CAST(COUNT(*) AS BIGINT) AS n_convs
FROM c GROUP BY n_turns"""


def q_doc_rarity(sf_dir: str):
    """Corpus-frequency document scoring (the unigram-LM quality-signal
    shape): per document, token count plus the SUM and MIN of each
    token's GLOBAL corpus frequency — exact integers, so no float
    log-prob leaves the engine. Two stages composed the scale-right
    way: (1) global token counts via pre-aggregated partials (one row
    per batch×distinct-token moves, never per occurrence); (2) the
    count table broadcasts ONCE (``ray.put``) and each batch scores
    its docs with one ``pc.index_in`` lookup + segmented
    ``np.add/minimum.reduceat`` — no second shuffle. The broadcast
    assumes the vocabulary fits the object store (true far past 1e8
    types); a larger-than-memory vocab would swap stage 2 for a
    token-keyed cogroup."""
    import re as re_mod

    import numpy as np
    import ray

    tok_re = re_mod.compile(r"[a-z0-9]+")

    def tokenize(texts):
        toks, doc_lens = [], []
        for t in texts:
            found = tok_re.findall((t or "").lower())
            toks.extend(found)
            doc_lens.append(len(found))
        return toks, np.asarray(doc_lens, np.int64)

    def count_partial(tbl: pa.Table) -> pa.Table:
        toks, _ = tokenize(tbl.column("text").to_pylist())
        if not toks:
            return pa.table({"token": pa.array([], pa.string()),
                             "cnt": pa.array([], pa.int64())})
        uniq, counts = np.unique(np.array(toks, object),
                                 return_counts=True)
        return pa.table({"token": pa.array(uniq.tolist(), pa.string()),
                         "cnt": pa.array(counts.astype(np.int64),
                                         pa.int64())})

    counts = _combine_partials(
        _read(sf_dir, "documents", ["text"], blocks=16)
        .map_batches(count_partial, batch_format="pyarrow"),
        ["token"], {"cnt": "cnt"})
    ref = ray.put(counts)

    def score(tbl: pa.Table) -> pa.Table:
        side = ray.get(ref)
        toks, doc_lens = tokenize(tbl.column("text").to_pylist())
        keep = doc_lens > 0
        if not keep.any():
            return pa.table({"doc_id": pa.array([], pa.int64()),
                             "n_tokens": pa.array([], pa.int64()),
                             "rarity_sum": pa.array([], pa.int64()),
                             "rarest": pa.array([], pa.int64())})
        idx = pc.index_in(pa.array(toks, pa.string()),
                          side.column("token").combine_chunks())
        cnt = side.column("cnt").to_numpy(zero_copy_only=False)[
            idx.to_numpy(zero_copy_only=False)]
        offs = (np.cumsum(doc_lens) - doc_lens)[keep]
        return pa.table({
            "doc_id": pc.array_filter(
                tbl.column("doc_id").combine_chunks(), pa.array(keep)),
            "n_tokens": pa.array(doc_lens[keep], pa.int64()),
            "rarity_sum": pa.array(np.add.reduceat(cnt, offs),
                                   pa.int64()),
            "rarest": pa.array(np.minimum.reduceat(cnt, offs),
                               pa.int64())})

    return _read(sf_dir, "documents", ["doc_id", "text"], blocks=16) \
        .map_batches(score, batch_format="pyarrow")


SQL_DOC_RARITY = r"""WITH toks AS (
  SELECT doc_id,
    unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS token
  FROM documents),
tc AS (SELECT token, CAST(COUNT(*) AS BIGINT) AS cnt
       FROM toks GROUP BY token)
SELECT t.doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens,
       CAST(SUM(tc.cnt) AS BIGINT) AS rarity_sum,
       CAST(MIN(tc.cnt) AS BIGINT) AS rarest
FROM toks t JOIN tc USING (token) GROUP BY t.doc_id"""


def q_behavior_signatures(sf_dir: str):
    """Behavioral cohorts as bitmask aggregation: each user's set of
    event types packs into one int64 signature (bit per type, codes =
    the sorted global type order), then a histogram of signatures —
    "how many users share each exact behavior profile". Distinct
    (user, type) pairs bound the one user-bucket shuffle (the
    cooccurrence tag); the type→bit code map comes from a tiny
    distinct-types pass (pruned single column, per-batch unique) and
    ships in the stage closure. Bit-OR folds as a SUM over globally
    deduplicated pair bits, exact because each (user, bit) contributes
    once."""
    import numpy as np

    types = set()
    for b in _read(sf_dir, "events", ["event_type"]) \
            .map_batches(lambda t: pa.table({
                "event_type": pc.unique(
                    pc.drop_null(t.column("event_type")))}),
                batch_format="pyarrow") \
            .iter_batches(batch_size=None, batch_format="pyarrow"):
        types.update(b.column("event_type").to_pylist())
    code = {t: i for i, t in enumerate(sorted(types))}
    if len(code) > 62:
        raise ValueError(f"{len(code)} event types exceed the int64 "
                         "bitmask width; use a list signature instead")

    n_buckets = adaptive_buckets(_nrows(sf_dir, "events"))

    def tag(t: pa.Table) -> pa.Table:
        d = pa.table({"u": t.column("user_id"),
                      "event_type": t.column("event_type")}) \
            .filter(pc.and_(pc.is_valid(t.column("user_id")),
                            pc.is_valid(t.column("event_type")))) \
            .group_by(["u", "event_type"]).aggregate([])
        bit = np.array([1 << code[x] for x in
                        d.column("event_type").to_pylist()], np.int64)
        return pa.table({"u": d.column("u"),
                         "bit": pa.array(bit, pa.int64())}) \
            .append_column("bucket", int_bucket(d.column("u"),
                                                n_buckets))

    def grp(g: pa.Table) -> pa.Table:
        u = g.column("u").to_numpy(zero_copy_only=False)
        bit = g.column("bit").to_numpy(zero_copy_only=False)
        order = np.lexsort((bit, u))
        us, bs = u[order], bit[order]
        keep = np.append(True, (us[1:] != us[:-1]) | (bs[1:] != bs[:-1]))
        us, bs = us[keep], bs[keep]
        starts = np.flatnonzero(np.append(True, us[1:] != us[:-1])) \
            if len(us) else np.array([], np.int64)
        sig = np.add.reduceat(bs, starts) if len(starts) \
            else np.array([], np.int64)
        uniq, counts = np.unique(sig, return_counts=True)
        return pa.table({"signature": pa.array(uniq, pa.int64()),
                         "n_users": pa.array(counts.astype(np.int64),
                                             pa.int64())})

    small = _read(sf_dir, "events", ["user_id", "event_type"]) \
        .map_batches(tag, batch_format="pyarrow") \
        .groupby("bucket").map_groups(grp, batch_format="pyarrow")
    return _combine_partials(small, ["signature"],
                             {"n_users": "n_users"})


SQL_BEHAVIOR_SIGNATURES = """WITH tc AS (
  SELECT event_type, ROW_NUMBER() OVER (ORDER BY event_type) - 1 AS code
  FROM (SELECT DISTINCT event_type FROM events
        WHERE event_type IS NOT NULL)),
ut AS (SELECT DISTINCT user_id, event_type FROM events
       WHERE user_id IS NOT NULL AND event_type IS NOT NULL),
sig AS (SELECT u.user_id, CAST(SUM(1 << t.code) AS BIGINT) AS signature
        FROM ut u JOIN tc t USING (event_type) GROUP BY u.user_id)
SELECT signature, CAST(COUNT(*) AS BIGINT) AS n_users
FROM sig GROUP BY signature"""


def q_cum_distinct_types(sf_dir: str):
    """Expanding distinct-count window: per event, how many DISTINCT
    event types its user has used up to and including it under the
    (ts, event_id) total order — the novelty-exposure curve. SQL needs
    a first-occurrence flag + running sum (COUNT(DISTINCT) OVER has no
    native form); the kernel mirrors that in two lexsorts per bucket:
    one over (user, type, ts, id) marks first occurrences, one over
    (user, ts, id) runs a segmented cumsum of the flags. One
    user-bucket shuffle, all-numpy group kernel."""
    import numpy as np

    n_buckets = adaptive_buckets(_nrows(sf_dir, "events"))

    def tag(t: pa.Table) -> pa.Table:
        sub = pa.table({"u": t.column("user_id"),
                        "ts": pc.cast(t.column("ts"), pa.int64()),
                        "eid": t.column("event_id"),
                        "et": pc.cast(t.column("event_type"),
                                      pa.string())}) \
            .filter(pc.and_(pc.is_valid(t.column("user_id")),
                            pc.is_valid(t.column("ts"))))
        return sub.append_column("bucket", int_bucket(sub.column("u"),
                                                      n_buckets))

    def grp(g: pa.Table) -> pa.Table:
        u = g.column("u").to_numpy(zero_copy_only=False)
        ts = g.column("ts").to_numpy(zero_copy_only=False)
        eid = g.column("eid").to_numpy(zero_copy_only=False)
        enc = pc.dictionary_encode(g.column("et").combine_chunks())
        # a NULL type is its own window partition in SQL: sentinel code
        tcode = pc.fill_null(enc.indices, -1) \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        # pass 1: first occurrence of each (user, type) in time order
        o2 = np.lexsort((eid, ts, tcode, u))
        u2, t2 = u[o2], tcode[o2]
        first = np.append(True, (u2[1:] != u2[:-1]) | (t2[1:] != t2[:-1]))
        flag = np.zeros(len(u), np.int64)
        flag[o2[first]] = 1
        # pass 2: segmented running sum of flags per user in time order
        order, new_run, _ = _lag_scaffold([u], ts, eid)
        f = flag[order]
        cs = np.cumsum(f)
        starts = np.flatnonzero(new_run)
        lens = np.diff(np.append(starts, len(order)))
        base = np.repeat(cs[starts] - f[starts], lens)
        return pa.table({
            "event_id": pa.array(eid[order], pa.int64()),
            "user_id": pa.array(u[order], pa.int64()),
            "n_types_so_far": pa.array(cs - base, pa.int64())})

    return _read(sf_dir, "events",
                 ["event_id", "user_id", "ts", "event_type"]) \
        .map_batches(tag, batch_format="pyarrow") \
        .groupby("bucket").map_groups(grp, batch_format="pyarrow")


SQL_CUM_DISTINCT_TYPES = """WITH f AS (
  SELECT event_id, user_id, ts,
    CASE WHEN ROW_NUMBER() OVER (
        PARTITION BY user_id, event_type ORDER BY ts, event_id) = 1
      THEN 1 ELSE 0 END AS is_new
  FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL)
SELECT event_id, user_id,
  CAST(SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
       ROWS UNBOUNDED PRECEDING) AS BIGINT) AS n_types_so_far
FROM f"""


def q_ndjson_roundtrip(sf_dir: str):
    """Sink→source format round trip as a gated query: project events
    to its lossless-under-JSON columns (int64 id, string type), render
    through the codec NDJSON sink (write-audit-publish staging, one
    part per block), re-ingest with the ndjson reader (parallel
    ``read_json`` tasks), and return the rows — proving the shipper
    output format is consumable downstream with exact value parity
    (the oracle reads the original parquet). Scratch lives under /tmp;
    the engine's scale-path interchange format remains parquet."""
    import hashlib
    import shutil

    from .sinks import read_ndjson, write_ndjson

    # fixed per-corpus scratch, overwritten each run (no /tmp growth)
    out_dir = "/tmp/raybeats_ndjson_rt_" + hashlib.md5(
        sf_dir.encode()).hexdigest()[:12]
    shutil.rmtree(out_dir, ignore_errors=True)
    write_ndjson(_read(sf_dir, "events", ["event_id", "event_type"]),
                 out_dir)
    return read_ndjson(out_dir, columns=["event_id", "event_type"])


SQL_NDJSON_ROUNDTRIP = "SELECT event_id, event_type FROM events"


def q_kwic_snippets(sf_dir: str):
    """Keyword-in-context extraction: for documents whose lowered text
    contains ``merge``, a ±10-character window around the FIRST
    occurrence — the corpus-inspection / search-preview primitive.
    Fully vectorized and codepoint-exact: the match position comes
    from ``split_pattern`` + ``utf8_length`` (``find_substring``
    returns BYTE offsets, which diverge from SQL ``strpos`` on
    multi-byte text), the window from one ``utf8_slice_codeunits``.
    Pure map stage — no shuffle."""
    kw = "merge"

    def snip(t: pa.Table) -> pa.Table:
        lt = pc.utf8_lower(t.column("text"))
        hit = pc.not_equal(pc.find_substring(lt, kw), -1)
        hit = pc.fill_null(hit, False)
        sub = pa.table({"doc_id": t.column("doc_id"),
                        "lt": lt}).filter(hit)
        lt2 = sub.column("lt")
        prefix = pc.list_element(
            pc.split_pattern(lt2, kw, max_splits=1), 0)
        pos = pc.utf8_length(prefix)
        start = pc.max_element_wise(pc.subtract(pos, 10), 0)
        stop = pc.add(pc.add(pos, len(kw)), 10)
        return pa.table({
            "doc_id": sub.column("doc_id"),
            "snippet": _slice_varstart(lt2, start, stop)})

    return _read(sf_dir, "documents", ["doc_id", "text"], blocks=8) \
        .map_batches(snip, batch_format="pyarrow")


def _slice_varstart(col, start, stop) -> pa.Array:
    """Per-row-varying utf8 CODEPOINT slice (arrow's slice kernels
    take scalar bounds only) as one numpy pass over the utf8 buffers:
    codepoint starts are exactly the non-continuation bytes
    (``b & 0xC0 != 0x80``), so a cumsum over that mask maps each
    row-relative codepoint position to its absolute byte position and
    a single explode-gather builds the output buffer — no per-row
    python (the flat_tokens offset-gather pattern). Positions are
    clamped to the row's codepoint count; a null row falls back to a
    per-row slice (the kwic caller filters nulls upstream)."""
    import numpy as np
    st = np.asarray(start.to_numpy(zero_copy_only=False), np.int64)
    en = np.asarray(stop.to_numpy(zero_copy_only=False), np.int64)
    if col.null_count:
        s = col.to_pylist()
        return pa.array([None if v is None else v[a:b]
                         for v, a, b in zip(s, st, en)], pa.string())
    c = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    c = c.cast(pa.large_string())  # int64 offsets buffer
    if len(c) == 0 or c.buffers()[1] is None:
        return pa.array([""] * len(c), pa.string())
    offs = np.frombuffer(c.buffers()[1], np.int64,
                         len(c) + 1 + c.offset)[c.offset:]
    data_buf = c.buffers()[2]
    full = np.frombuffer(data_buf, np.uint8) if data_buf is not None \
        else np.empty(0, np.uint8)
    region = full[offs[0]:offs[-1]]
    offs = offs - offs[0]  # region-relative byte offsets per row
    cpmask = (region & 0xC0) != 0x80
    # byte position of global codepoint ordinal j; sentinel = region
    # end covers positions one past the last codepoint (empty trailing
    # rows collapse onto the same offset, so ordinal→offs[i+1] holds)
    cp_starts = np.append(np.flatnonzero(cpmask), len(region))
    cpx = np.concatenate([[0], np.cumsum(cpmask)])
    row_cp0 = cpx[offs[:-1]]          # codepoints before row i
    row_cpn = cpx[offs[1:]] - row_cp0  # codepoints in row i
    # full python slice semantics so this path and the null-row
    # fallback can never disagree: negative positions count from the
    # row end, then clamp into [0, row_cpn]
    st = np.where(st < 0, row_cpn + st, st)
    en = np.where(en < 0, row_cpn + en, en)
    b0 = cp_starts[row_cp0 + np.clip(st, 0, row_cpn)]
    b1 = cp_starts[row_cp0 + np.clip(en, 0, row_cpn)]
    lens = np.maximum(b1 - b0, 0)
    out_off = np.concatenate([[0], np.cumsum(lens)]).astype(np.int64)
    out_buf = region[np.repeat(b0, lens) + _aranges(lens)]
    arr = pa.Array.from_buffers(
        pa.large_string(), len(lens),
        [None, pa.py_buffer(out_off.tobytes()),
         pa.py_buffer(out_buf.tobytes())])
    return arr.cast(pa.string())


SQL_KWIC_SNIPPETS = """WITH d AS (
  SELECT doc_id, lower(text) AS lt FROM documents
  WHERE text IS NOT NULL AND strpos(lower(text), 'merge') > 0)
SELECT doc_id,
  substr(lt, greatest(strpos(lt, 'merge') - 10, 1),
         (strpos(lt, 'merge') - greatest(strpos(lt, 'merge') - 10, 1))
         + length('merge') + 10) AS snippet
FROM d"""


def q_gap_histogram(sf_dir: str):
    """Inter-arrival-time distribution: per-user consecutive event gaps
    (µs, (ts, event_id) order) bucketed by binary magnitude — bucket =
    bit length of the gap (0 for a zero gap) — then a global histogram.
    The log2 binning stays in EXACT integers on both engines (numpy:
    searchsorted against powers of two; SQL: ``length(bin(gap))``), so
    no float boundary can flip a bucket. One user-bucket shuffle with
    per-bucket pre-reduction to (bucket, count) partials."""
    import numpy as np

    n_buckets = adaptive_buckets(_nrows(sf_dir, "events"))
    powers = np.left_shift(np.int64(1), np.arange(63, dtype=np.int64))

    def tag(t: pa.Table) -> pa.Table:
        sub = pa.table({"u": t.column("user_id"),
                        "ts": pc.cast(t.column("ts"), pa.int64()),
                        "eid": t.column("event_id")}) \
            .filter(pc.and_(pc.is_valid(t.column("user_id")),
                            pc.is_valid(t.column("ts"))))
        return sub.append_column("bucket", int_bucket(sub.column("u"),
                                                      n_buckets))

    def grp(g: pa.Table) -> pa.Table:
        u = g.column("u").to_numpy(zero_copy_only=False)
        ts = g.column("ts").to_numpy(zero_copy_only=False)
        eid = g.column("eid").to_numpy(zero_copy_only=False)
        order, new_run, gap = _lag_scaffold([u], ts, eid)
        gaps = gap[~new_run]
        mag = np.where(gaps == 0, 0,
                       np.searchsorted(powers, gaps, side="right"))
        uniq, counts = np.unique(mag, return_counts=True)
        return pa.table({"magnitude": pa.array(uniq, pa.int64()),
                         "n_gaps": pa.array(counts.astype(np.int64),
                                            pa.int64())})

    small = _read(sf_dir, "events", ["event_id", "user_id", "ts"]) \
        .map_batches(tag, batch_format="pyarrow") \
        .groupby("bucket").map_groups(grp, batch_format="pyarrow")
    return _combine_partials(small, ["magnitude"], {"n_gaps": "n_gaps"})


SQL_GAP_HISTOGRAM = """WITH g AS (
  SELECT epoch_us(ts) - LAG(epoch_us(ts)) OVER (
      PARTITION BY user_id ORDER BY ts, event_id) AS gap
  FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL),
m AS (SELECT CASE WHEN gap = 0 THEN 0
             ELSE CAST(length(bin(gap)) AS BIGINT) END AS magnitude
      FROM g WHERE gap IS NOT NULL)
SELECT magnitude, CAST(COUNT(*) AS BIGINT) AS n_gaps
FROM m GROUP BY magnitude"""


def q_role_flow_histogram(sf_dir: str):
    """Flagship conversation-shape analysis: each conversation's ROLE
    FLOW — the distinct roles joined with ``>`` in order of first
    appearance — histogrammed across the corpus ("how many convs are
    user>assistant vs user>assistant>tool"). One conv-bucket shuffle
    (the conversation_assembly shape); the per-bucket kernel reduces
    each conversation to its first-occurrence role sequence before
    anything is stringified, and only (flow, count) partials reach the
    driver combine."""
    import pandas as pd

    n_buckets = adaptive_buckets(2 * _nrows(sf_dir, "events"))

    def add_bucket(tbl: pa.Table) -> pa.Table:
        return tbl.append_column(
            "bucket", fnv1a_bucket(tbl.column("conv_id"), n_buckets))

    def grp(g: pd.DataFrame) -> pd.DataFrame:
        first = g.groupby(["conv_id", "role"], sort=False)["turn_idx"] \
            .min().reset_index().sort_values(["conv_id", "turn_idx"])
        flows = first.groupby("conv_id", sort=False)["role"] \
            .agg(">".join)
        hist = flows.value_counts()
        return pd.DataFrame({"flow": hist.index.to_numpy(),
                             "n_convs": hist.to_numpy().astype("int64")})

    small = read_transcripts(sf_dir) \
        .map_batches(add_bucket, batch_format="pyarrow") \
        .groupby("bucket").map_groups(grp, batch_format="pandas")
    return _combine_partials(small, ["flow"], {"n_convs": "n_convs"})


SQL_ROLE_FLOW_HISTOGRAM = f"""{_T},
f AS (SELECT conv_id, role, MIN(turn_idx) AS first_turn
      FROM transcripts GROUP BY conv_id, role),
s AS (SELECT conv_id, string_agg(role, '>' ORDER BY first_turn) AS flow
      FROM f GROUP BY conv_id)
SELECT flow, CAST(COUNT(*) AS BIGINT) AS n_convs FROM s GROUP BY flow"""


def q_global_running_sum(sf_dir: str):
    """GLOBAL running totals — cumulative row count and exact cents sum
    over the WHOLE corpus in (ts, event_id) order, no partition key
    (the cumulative-revenue curve). SQL's ``SUM OVER (ORDER BY ...)``
    with no PARTITION BY cannot shuffle by key; the scale shape is a
    DISTRIBUTED PREFIX SUM: (1) a narrow shuffle-free pass folds
    per-batch (time-slice, n, cents) partials — slices are monotone
    equal-width time ranges sized from the parquet footer min/max, so
    slice order IS time order; (2) the driver exclusive-prefix-sums
    the ≤ adaptive_buckets(n) slice totals; (3) ONE keyed shuffle on
    the slice, each group sorting locally and adding its slice's
    offsets. Equal timestamps always share a slice, so the
    (ts, event_id) tiebreak never crosses groups."""
    import numpy as np

    lo_us, hi_us = _footer_ts_range(sf_dir, "events")
    from .util import range_bucket_step
    n_slices = adaptive_buckets(_nrows(sf_dir, "events"))
    step = range_bucket_step(hi_us - lo_us + 1, n_slices)

    def project(t: pa.Table) -> pa.Table:
        sub = t.filter(pc.is_valid(t.column("ts")))
        v = sub.column("value").to_numpy(zero_copy_only=False)
        ts = pc.cast(sub.column("ts"), pa.int64()) \
            .to_numpy(zero_copy_only=False)
        cents = np.where(np.isnan(v), 0,
                         np.floor(v * 100.0)).astype(np.int64)
        return pa.table({
            "eid": sub.column("event_id"),
            "ts": pa.array(ts, pa.int64()),
            "cents": pa.array(cents, pa.int64()),
            "slice": pa.array((ts - lo_us) // step, pa.int64())})

    proj = _read(sf_dir, "events", ["event_id", "ts", "value"]) \
        .map_batches(project, batch_format="pyarrow").materialize()

    def totals(t: pa.Table) -> pa.Table:
        g = t.group_by("slice").aggregate([("cents", "sum"),
                                           ("cents", "count")])
        return pa.table({"slice": g.column("slice"),
                         "c": g.column("cents_sum"),
                         "n": pc.cast(g.column("cents_count"),
                                      pa.int64())})

    tot = _combine_partials(
        proj.map_batches(totals, batch_format="pyarrow"),
        ["slice"], {"c": "c", "n": "n"})
    s = tot.column("slice").to_numpy(zero_copy_only=False)
    order = np.argsort(s)
    c = tot.column("c").to_numpy(zero_copy_only=False)[order]
    n = tot.column("n").to_numpy(zero_copy_only=False)[order]
    off_c = dict(zip(s[order].tolist(),
                     (np.cumsum(c) - c).tolist()))
    off_n = dict(zip(s[order].tolist(),
                     (np.cumsum(n) - n).tolist()))

    def grp(g: pa.Table) -> pa.Table:
        sl = int(g.column("slice")[0].as_py())
        ts = g.column("ts").to_numpy(zero_copy_only=False)
        eid = g.column("eid").to_numpy(zero_copy_only=False)
        cents = g.column("cents").to_numpy(zero_copy_only=False)
        order = np.lexsort((eid, ts))
        run_c = np.cumsum(cents[order]) + off_c[sl]
        run_n = np.arange(1, len(order) + 1) + off_n[sl]
        return pa.table({
            "event_id": pa.array(eid[order], pa.int64()),
            "running_n": pa.array(run_n, pa.int64()),
            "running_cents": pa.array(run_c, pa.int64())})

    return proj.groupby("slice").map_groups(grp, batch_format="pyarrow")


SQL_GLOBAL_RUNNING_SUM = """WITH p AS (
  SELECT event_id, ts,
    CASE WHEN isnan(value) THEN 0
         ELSE CAST(FLOOR(value * 100) AS BIGINT) END AS cents
  FROM events WHERE ts IS NOT NULL)
SELECT event_id,
  CAST(ROW_NUMBER() OVER (ORDER BY ts, event_id) AS BIGINT)
    AS running_n,
  CAST(SUM(cents) OVER (ORDER BY ts, event_id
       ROWS UNBOUNDED PRECEDING) AS BIGINT) AS running_cents
FROM p"""


def q_type_overlap_kmv(sf_dir: str):
    """Audience overlap via the KMV distinct sketch
    (:class:`textops.sketches.KmvSketch`): estimated distinct users of
    'view' and 'purchase' and of their INTERSECTION — set algebra HLL
    cannot do — from one streaming pass of fixed-width mergeable
    partials. EXACT below k=4096 distinct users per side (the sf
    corpora are; asserted via the ``exact`` flag), ≈1.6% rse past
    saturation. Rows-only: the estimator is not SQL-expressible; the
    parity pytest checks the exact regime against COUNT(DISTINCT)."""
    from .textops.sketches import kmv_type_overlap
    return kmv_type_overlap(
        _read(sf_dir, "events", ["user_id", "event_type"]),
        type_a="view", type_b="purchase", k=4096)


def q_last_buy_carry(sf_dir: str):
    """Last-observation-carried-forward imputation (the training-data
    gap-fill primitive): per event, the user's most recent ``buy``
    value-cents at or before it under (ts, event_id) order — NULL
    until the first buy. SQL is ``LAST_VALUE(... IGNORE NULLS)``; the
    kernel is the classic vectorized ffill: mark observation indices,
    ``np.maximum.accumulate`` per user segment, one gather. One
    user-bucket shuffle."""
    import numpy as np

    n_buckets = adaptive_buckets(_nrows(sf_dir, "events"))

    def tag(t: pa.Table) -> pa.Table:
        v = t.column("value").to_numpy(zero_copy_only=False)
        cents = np.where(np.isnan(v), 0,
                         np.floor(v * 100.0)).astype(np.int64)
        is_buy = pc.equal(t.column("event_type"), "purchase")
        obs = pc.and_(pc.fill_null(is_buy, False),
                      pa.array(~np.isnan(v))) \
            .to_numpy(zero_copy_only=False)
        sub = pa.table({"u": t.column("user_id"),
                        "ts": pc.cast(t.column("ts"), pa.int64()),
                        "eid": t.column("event_id"),
                        "cents": pa.array(cents, pa.int64()),
                        "obs": pa.array(obs, pa.bool_())}) \
            .filter(pc.and_(pc.is_valid(t.column("user_id")),
                            pc.is_valid(t.column("ts"))))
        return sub.append_column("bucket", int_bucket(sub.column("u"),
                                                      n_buckets))

    def grp(g: pa.Table) -> pa.Table:
        u = g.column("u").to_numpy(zero_copy_only=False)
        ts = g.column("ts").to_numpy(zero_copy_only=False)
        eid = g.column("eid").to_numpy(zero_copy_only=False)
        cents = g.column("cents").to_numpy(zero_copy_only=False)
        obs = g.column("obs").to_numpy(zero_copy_only=False)
        order, new_run, _ = _lag_scaffold([u], ts, eid)
        o_obs = obs[order]
        # ffill: index of the latest observation at or before each row,
        # reset at user-run starts via the segment-base trick
        idx = np.where(o_obs, np.arange(len(order)), -1)
        starts = np.flatnonzero(new_run)
        lens = np.diff(np.append(starts, len(order)))
        seg = np.repeat(np.arange(len(starts)), lens)
        # per-segment accumulate: offset each segment so -1 never leaks
        # across users — add a huge per-segment base, accumulate, strip
        base = seg.astype(np.int64) * (len(order) + 2)
        filled = np.maximum.accumulate(
            np.where(idx >= 0, idx + base, -1))
        have = filled >= base  # an observation exists in THIS segment
        src = np.where(have, filled - base, 0).astype(np.int64)
        vals = cents[order][src]
        return pa.table({
            "event_id": pa.array(eid[order], pa.int64()),
            "user_id": pa.array(u[order], pa.int64()),
            "last_buy_cents": pa.array(vals, pa.int64(), mask=~have)})

    return _read(sf_dir, "events",
                 ["event_id", "user_id", "ts", "event_type", "value"]) \
        .map_batches(tag, batch_format="pyarrow") \
        .groupby("bucket").map_groups(grp, batch_format="pyarrow")


SQL_LAST_BUY_CARRY = """WITH p AS (
  SELECT event_id, user_id, ts,
    CASE WHEN event_type = 'purchase' AND NOT isnan(value)
      THEN CAST(FLOOR(value * 100) AS BIGINT) END AS buy_cents
  FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL)
SELECT event_id, user_id,
  LAST_VALUE(buy_cents IGNORE NULLS) OVER (
    PARTITION BY user_id ORDER BY ts, event_id
    ROWS UNBOUNDED PRECEDING) AS last_buy_cents
FROM p"""


def q_systematic_sample(sf_dir: str):
    """Systematic (every-Nth) sampling in GLOBAL (ts, event_id) order —
    the deterministic eval-slice cut that, unlike hash sampling,
    guarantees exact stride coverage of the timeline. Same distributed
    prefix-sum shape as ``global_running_sum`` (monotone footer-sized
    time slices, driver exclusive scan of slice counts, one keyed
    shuffle) with only COUNTS in the narrow pass; each group emits the
    rows whose global position ≡ 1 (mod 100)."""
    import numpy as np

    lo_us, hi_us = _footer_ts_range(sf_dir, "events")
    from .util import range_bucket_step
    n_slices = adaptive_buckets(_nrows(sf_dir, "events"))
    step = range_bucket_step(hi_us - lo_us + 1, n_slices)
    stride = 100

    def project(t: pa.Table) -> pa.Table:
        sub = t.filter(pc.is_valid(t.column("ts")))
        ts = pc.cast(sub.column("ts"), pa.int64()) \
            .to_numpy(zero_copy_only=False)
        return pa.table({
            "eid": sub.column("event_id"),
            "ts": pa.array(ts, pa.int64()),
            "slice": pa.array((ts - lo_us) // step, pa.int64())})

    proj = _read(sf_dir, "events", ["event_id", "ts"]) \
        .map_batches(project, batch_format="pyarrow").materialize()

    def totals(t: pa.Table) -> pa.Table:
        g = t.group_by("slice").aggregate([("slice", "count")])
        return pa.table({"slice": g.column("slice"),
                         "n": pc.cast(g.column("slice_count"),
                                      pa.int64())})

    tot = _combine_partials(
        proj.map_batches(totals, batch_format="pyarrow"),
        ["slice"], {"n": "n"})
    s = tot.column("slice").to_numpy(zero_copy_only=False)
    order = np.argsort(s)
    n = tot.column("n").to_numpy(zero_copy_only=False)[order]
    off_n = dict(zip(s[order].tolist(), (np.cumsum(n) - n).tolist()))

    def grp(g: pa.Table) -> pa.Table:
        sl = int(g.column("slice")[0].as_py())
        ts = g.column("ts").to_numpy(zero_copy_only=False)
        eid = g.column("eid").to_numpy(zero_copy_only=False)
        order = np.lexsort((eid, ts))
        pos = np.arange(1, len(order) + 1) + off_n[sl]
        keep = pos % stride == 1
        return pa.table({
            "event_id": pa.array(eid[order][keep], pa.int64()),
            "pos": pa.array(pos[keep], pa.int64())})

    return proj.groupby("slice").map_groups(grp, batch_format="pyarrow")


SQL_SYSTEMATIC_SAMPLE = """WITH r AS (
  SELECT event_id,
    CAST(ROW_NUMBER() OVER (ORDER BY ts, event_id) AS BIGINT) AS pos
  FROM events WHERE ts IS NOT NULL)
SELECT event_id, pos FROM r WHERE pos % 100 = 1"""


def q_pairwise_spread(sf_dir: str):
    """Exact mean-absolute-difference dispersion (the Gini numerator):
    per event type, Σ_{i<j} |cents_i − cents_j| and n — as exact
    int64s. The naive form is O(n²) per group and the SQL form needs a
    per-type global sort; the scale shape computes it from the
    (type, cents)→count HISTOGRAM (the mode_per_type shuffle: partials
    bounded by types × distinct quanta, never corpus rows) via the
    order-statistics identity Σ|xi−xj| = Σ_v n_v·(v·C_{<v} − S_{<v})
    over sorted distinct values with prefix counts C / prefix sums S —
    one vectorized pass per type, tie-insensitive by construction.
    int64 bound: ≤ n²·max|cents| ≈ 2e15 at sf0.1; past ~1e7 rows/type
    the partials switch to python-int combine like grouped_corr."""
    import numpy as np

    def partial(t: pa.Table) -> pa.Table:
        v = t.column("value").to_numpy(zero_copy_only=False)
        ok = ~np.isnan(v)
        part = pa.table({
            "event_type": pc.array_filter(
                t.column("event_type").combine_chunks(), pa.array(ok)),
            "cents": pa.array(np.floor(v[ok] * 100).astype(np.int64),
                              pa.int64()),
            "n": pa.array(np.ones(int(ok.sum()), np.int64), pa.int64())})
        g = part.group_by(["event_type", "cents"]).aggregate(
            [("n", "sum")])
        return pa.table({"event_type": g.column("event_type"),
                         "cents": g.column("cents"),
                         "n": g.column("n_sum")})

    hist = _combine_partials(
        _read(sf_dir, "events", ["event_type", "value"])
        .map_batches(partial, batch_format="pyarrow"),
        ["event_type", "cents"], {"n": "n"})
    et = np.asarray(hist.column("event_type").to_pylist(), object)
    cents = hist.column("cents").to_numpy(zero_copy_only=False)
    n = hist.column("n").to_numpy(zero_copy_only=False)
    order = np.lexsort((cents, et.astype("U")))
    et, cents, n = et[order], cents[order], n[order]
    new_run = np.append(True, et[1:] != et[:-1])
    starts = np.flatnonzero(new_run)
    lens = np.diff(np.append(starts, len(et)))
    # per-type exclusive prefix count / sum over sorted distinct cents
    csum_n = np.cumsum(n)
    csum_s = np.cumsum(n * cents)
    base_n = np.repeat(csum_n[starts] - n[starts], lens)
    base_s = np.repeat(csum_s[starts] - (n * cents)[starts], lens)
    c_lt = csum_n - n - base_n          # count of rows with smaller v
    s_lt = csum_s - n * cents - base_s  # their cents sum
    contrib = n * (cents * c_lt - s_lt)
    spread = np.add.reduceat(contrib, starts)
    total_n = np.add.reduceat(n, starts)
    return pa.table({
        "event_type": pa.array(et[starts].tolist(), pa.string()),
        "n": pa.array(total_n, pa.int64()),
        "abs_diff_sum": pa.array(spread, pa.int64())})


SQL_PAIRWISE_SPREAD = """WITH p AS (
  SELECT event_type, CAST(FLOOR(value * 100) AS BIGINT) AS c
  FROM events WHERE NOT isnan(value)),
r AS (SELECT event_type, c,
        ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY c) AS rn,
        COUNT(*) OVER (PARTITION BY event_type) AS n
      FROM p)
SELECT event_type, CAST(MAX(n) AS BIGINT) AS n,
  CAST(SUM((2 * rn - n - 1) * c) AS BIGINT) AS abs_diff_sum
FROM r GROUP BY event_type"""


def q_peak_hour_per_type(sf_dir: str):
    """Peak-load profile: for each event type, the hour-of-day with the
    most events (ties to the smallest hour) and its count — the
    capacity-planning argmax over a DERIVED key. Partials are
    fixed-width (type × 24 rows per batch); the argmax folds on the
    driver over the combined ≤ types×24 table."""
    import numpy as np

    def partial(t: pa.Table) -> pa.Table:
        ok = pc.is_valid(t.column("ts"))
        sub = pa.table({"event_type": t.column("event_type"),
                        "hour": pc.cast(pc.hour(t.column("ts")),
                                        pa.int64())}).filter(ok)
        g = sub.group_by(["event_type", "hour"]).aggregate(
            [("hour", "count")])
        return pa.table({"event_type": g.column("event_type"),
                         "hour": g.column("hour"),
                         "n": pc.cast(g.column("hour_count"),
                                      pa.int64())})

    comb = _combine_partials(
        _read(sf_dir, "events", ["event_type", "ts"])
        .map_batches(partial, batch_format="pyarrow"),
        ["event_type", "hour"], {"n": "n"})
    et = np.asarray(comb.column("event_type").to_pylist(), object)
    hour = comb.column("hour").to_numpy(zero_copy_only=False)
    n = comb.column("n").to_numpy(zero_copy_only=False)
    order = np.lexsort((hour, -n, et.astype("U")))
    ets, hs, ns = et[order], hour[order], n[order]
    sel = np.flatnonzero(np.append(True, ets[1:] != ets[:-1]))
    return pa.table({
        "event_type": pa.array(ets[sel].tolist(), pa.string()),
        "peak_hour": pa.array(hs[sel], pa.int64()),
        "n_peak": pa.array(ns[sel], pa.int64())})


SQL_PEAK_HOUR_PER_TYPE = """WITH h AS (
  SELECT event_type, CAST(EXTRACT(hour FROM ts) AS BIGINT) AS hour,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM events WHERE ts IS NOT NULL GROUP BY event_type, hour),
r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY event_type
        ORDER BY n DESC, hour) AS rk FROM h)
SELECT event_type, hour AS peak_hour, n AS n_peak FROM r WHERE rk = 1"""


def q_tool_latency(sf_dir: str):
    """Flagship tool-latency report: for every transcript turn with
    ``role='tool'``, the time since the conversation's PREVIOUS turn
    (turn_idx order) — aggregated per tool as (n, sum_µs, max_µs)
    exact ints. One conv-bucket shuffle (the conversation_assembly
    key); the per-bucket kernel dictionary-encodes conv ids, runs the
    shared LAG scaffold, and pre-reduces to per-tool partials so only
    tools × buckets rows reach the driver max/sum fold."""
    import numpy as np

    n_buckets = adaptive_buckets(2 * _nrows(sf_dir, "events"))

    def add_bucket(tbl: pa.Table) -> pa.Table:
        return tbl.append_column(
            "bucket", fnv1a_bucket(tbl.column("conv_id"), n_buckets))

    def grp(g: pa.Table) -> pa.Table:
        conv = pc.dictionary_encode(g.column("conv_id")
                                    .combine_chunks()).indices \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        ti = g.column("turn_idx").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        ts = pc.cast(g.column("ts"), pa.int64()) \
            .to_numpy(zero_copy_only=False)
        order = np.lexsort((ti, conv))
        n = len(order)
        new_run = np.empty(n, bool)
        if n:
            new_run[0] = True
            cs = conv[order]
            new_run[1:] = cs[1:] != cs[:-1]
        gap = np.zeros(n, np.int64)
        if n:
            tss = ts[order]
            gap[1:] = tss[1:] - tss[:-1]
        role = np.asarray(g.column("role").to_pylist(), object)[order]
        tool = np.asarray(g.column("tool").to_pylist(), object)[order]
        keep = (role == "tool") & ~new_run
        part = pa.table({
            "tool": pa.array(tool[keep].tolist(), pa.string()),
            "gap": pa.array(gap[keep], pa.int64())})
        gg = part.group_by("tool").aggregate(
            [("gap", "sum"), ("gap", "max"), ("gap", "count")])
        return pa.table({
            "tool": gg.column("tool"),
            "s": gg.column("gap_sum"), "mx": gg.column("gap_max"),
            "n": pc.cast(gg.column("gap_count"), pa.int64())})

    parts = list(
        read_transcripts(sf_dir)
        .map_batches(add_bucket, batch_format="pyarrow")
        .groupby("bucket").map_groups(grp, batch_format="pyarrow")
        .iter_batches(batch_size=None, batch_format="pyarrow"))
    empty = pa.schema([("tool", pa.string()), ("s", pa.int64()),
                       ("mx", pa.int64()), ("n", pa.int64())]) \
        .empty_table()
    small = pa.concat_tables(parts or [empty],
                             promote_options="default")
    f = small.group_by("tool").aggregate(
        [("n", "sum"), ("s", "sum"), ("mx", "max")])
    return pa.table({"tool": f.column("tool"),
                     "n": f.column("n_sum"),
                     "sum_gap_us": f.column("s_sum"),
                     "max_gap_us": f.column("mx_max")})


SQL_TOOL_LATENCY = f"""{_T},
g AS (SELECT conv_id, role, tool,
        epoch_us(ts) - LAG(epoch_us(ts)) OVER (
          PARTITION BY conv_id ORDER BY turn_idx) AS gap
      FROM transcripts)
SELECT tool, CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(gap) AS BIGINT) AS sum_gap_us,
       CAST(MAX(gap) AS BIGINT) AS max_gap_us
FROM g WHERE role = 'tool' AND gap IS NOT NULL GROUP BY tool"""


def q_ks_statistic(sf_dir: str):
    """Distribution-drift detection: the exact Kolmogorov–Smirnov
    statistic between the 'view' and 'purchase' value distributions,
    emitted as EXACT INTEGERS — ks_num = max_c |CDF_a(c)·n_b −
    CDF_b(c)·n_a| over the cents grid (the caller divides by n_a·n_b)
    plus the smallest cents where the max occurs. The scale shape is
    the histogram-partials fold (bounded by distinct quanta, never
    corpus rows): per-batch (side, cents) counts, driver cumsum over
    the sorted union grid — the two-sample drift gate a training
    pipeline runs between corpus snapshots."""
    import numpy as np

    def partial(t: pa.Table) -> pa.Table:
        v = t.column("value").to_numpy(zero_copy_only=False)
        et = t.column("event_type")
        ok = pa.array(~np.isnan(v)) \
            if isinstance(et, pa.ChunkedArray) else pa.array(~np.isnan(v))
        side = pc.if_else(pc.equal(et, "view"), 0,
                          pc.if_else(pc.equal(et, "purchase"), 1, -1))
        sub = pa.table({
            "side": side,
            "cents": pa.array(np.floor(v * 100).astype(np.int64),
                              pa.int64())}) \
            .filter(pc.and_(pc.not_equal(side, -1), ok))
        g = sub.group_by(["side", "cents"]).aggregate([("side", "count")])
        return pa.table({"side": g.column("side"),
                         "cents": g.column("cents"),
                         "n": pc.cast(g.column("side_count"),
                                      pa.int64())})

    h = _combine_partials(
        _read(sf_dir, "events", ["event_type", "value"])
        .map_batches(partial, batch_format="pyarrow"),
        ["side", "cents"], {"n": "n"})
    ta, tb, mx, at = _ks_exact(h)
    return pa.table({"n_view": pa.array([ta], pa.int64()),
                     "n_buy": pa.array([tb], pa.int64()),
                     "ks_num": pa.array([mx], pa.int64()),
                     "at_cents": pa.array([at], pa.int64())})


def _ks_exact(h: pa.Table) -> tuple[int, int, int, int]:
    """Exact two-sample KS fold over a combined (side, cents, n)
    histogram: returns (n_a, n_b, max|CDF_a·n_b − CDF_b·n_a|,
    smallest cents achieving the max). Shared by every drift query."""
    import numpy as np

    side = h.column("side").to_numpy(zero_copy_only=False)
    cents = h.column("cents").to_numpy(zero_copy_only=False)
    n = h.column("n").to_numpy(zero_copy_only=False)
    grid = np.unique(cents)
    na = np.zeros(len(grid), np.int64)
    nb = np.zeros(len(grid), np.int64)
    pos = np.searchsorted(grid, cents)
    np.add.at(na, pos[side == 0], n[side == 0])
    np.add.at(nb, pos[side == 1], n[side == 1])
    ca, cb = np.cumsum(na), np.cumsum(nb)
    ta, tb = int(ca[-1]), int(cb[-1])
    gap = np.abs(ca * tb - cb * ta)
    mx = int(gap.max())
    at = int(grid[np.flatnonzero(gap == mx)[0]])
    return ta, tb, mx, at


SQL_KS_STATISTIC = """WITH p AS (
  SELECT event_type AS t, CAST(FLOOR(value * 100) AS BIGINT) AS c
  FROM events WHERE event_type IN ('view', 'purchase')
    AND NOT isnan(value)),
h AS (SELECT c, COUNT(*) FILTER (WHERE t = 'view') AS na,
             COUNT(*) FILTER (WHERE t = 'purchase') AS nb
      FROM p GROUP BY c),
tot AS (SELECT SUM(na) AS ta, SUM(nb) AS tb FROM h),
cum AS (SELECT c, SUM(na) OVER (ORDER BY c) AS ca,
               SUM(nb) OVER (ORDER BY c) AS cb FROM h),
d AS (SELECT c, ABS(ca * (SELECT tb FROM tot)
                    - cb * (SELECT ta FROM tot)) AS gap FROM cum)
SELECT CAST((SELECT ta FROM tot) AS BIGINT) AS n_view,
       CAST((SELECT tb FROM tot) AS BIGINT) AS n_buy,
       CAST(MAX(gap) AS BIGINT) AS ks_num,
       CAST(MIN(CASE WHEN gap = (SELECT MAX(gap) FROM d) THEN c END)
            AS BIGINT) AS at_cents
FROM d"""


def q_type_trigrams(sf_dir: str):
    """Sequential pattern mining one level past transition_counts:
    counts of CONSECUTIVE event-type TRIPLES per user stream
    ((ts, event_id) order) — the "what three-step journeys happen"
    question. One user-bucket shuffle; the per-bucket kernel is the
    shared lexsort scaffold plus two shifts (a triple exists where
    positions i, i+1, i+2 share a user), pre-reduced to per-bucket
    (t1, t2, t3, n) partials."""
    import numpy as np

    n_buckets = adaptive_buckets(_nrows(sf_dir, "events"))

    def tag(t: pa.Table) -> pa.Table:
        sub = pa.table({"u": t.column("user_id"),
                        "ts": pc.cast(t.column("ts"), pa.int64()),
                        "eid": t.column("event_id"),
                        "et": t.column("event_type")}) \
            .filter(pc.and_(pc.is_valid(t.column("user_id")),
                            pc.is_valid(t.column("ts"))))
        return sub.append_column("bucket", int_bucket(sub.column("u"),
                                                      n_buckets))

    def grp(g: pa.Table) -> pa.Table:
        u = g.column("u").to_numpy(zero_copy_only=False)
        ts = g.column("ts").to_numpy(zero_copy_only=False)
        eid = g.column("eid").to_numpy(zero_copy_only=False)
        order, new_run, _ = _lag_scaffold([u], ts, eid)
        et = np.asarray(g.column("et").to_pylist(), object)[order]
        # a trigram starts at i when neither i+1 nor i+2 begins a new
        # user run
        ok = ~new_run[1:-1] & ~new_run[2:] if len(order) >= 3 \
            else np.array([], bool)
        starts = np.flatnonzero(ok)
        part = pa.table({
            "t1": pa.array(et[starts].tolist(), pa.string()),
            "t2": pa.array(et[starts + 1].tolist(), pa.string()),
            "t3": pa.array(et[starts + 2].tolist(), pa.string()),
            "one": pa.array(np.ones(len(starts), np.int64), pa.int64())})
        gg = part.group_by(["t1", "t2", "t3"]).aggregate([("one", "sum")])
        return pa.table({"t1": gg.column("t1"), "t2": gg.column("t2"),
                         "t3": gg.column("t3"),
                         "n": gg.column("one_sum")})

    small = _read(sf_dir, "events",
                  ["event_id", "user_id", "ts", "event_type"]) \
        .map_batches(tag, batch_format="pyarrow") \
        .groupby("bucket").map_groups(grp, batch_format="pyarrow")
    return _combine_partials(small, ["t1", "t2", "t3"], {"n": "n"})


SQL_TYPE_TRIGRAMS = """WITH s AS (
  SELECT event_type AS t1,
    LEAD(event_type, 1) OVER w AS t2,
    LEAD(event_type, 2) OVER w AS t3,
    LEAD(event_id, 2) OVER w AS e3
  FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
SELECT t1, t2, t3, CAST(COUNT(*) AS BIGINT) AS n
FROM s WHERE e3 IS NOT NULL
GROUP BY t1, t2, t3"""


def q_trimmed_mean(sf_dir: str):
    """Exact interquartile (25–75%) trimmed mean per event type,
    emitted as exact integers (kept-row count and kept cents sum; the
    caller divides): drop the k = ⌊n/4⌋ smallest and largest rows by
    cents — tie-insensitive because equal values contribute equally
    whichever copies are cut. Computed from the (type, cents)→count
    HISTOGRAM (the pairwise_spread shape — partials bounded by types ×
    distinct quanta): prefix counts locate both cut points and the
    boundary quanta contribute partial multiplicities, no per-row sort
    anywhere."""
    import numpy as np

    def partial(t: pa.Table) -> pa.Table:
        v = t.column("value").to_numpy(zero_copy_only=False)
        ok = ~np.isnan(v)
        part = pa.table({
            "event_type": pc.array_filter(
                t.column("event_type").combine_chunks(), pa.array(ok)),
            "cents": pa.array(np.floor(v[ok] * 100).astype(np.int64),
                              pa.int64()),
            "n": pa.array(np.ones(int(ok.sum()), np.int64), pa.int64())})
        g = part.group_by(["event_type", "cents"]).aggregate(
            [("n", "sum")])
        return pa.table({"event_type": g.column("event_type"),
                         "cents": g.column("cents"),
                         "n": g.column("n_sum")})

    hist = _combine_partials(
        _read(sf_dir, "events", ["event_type", "value"])
        .map_batches(partial, batch_format="pyarrow"),
        ["event_type", "cents"], {"n": "n"})
    et = np.asarray(hist.column("event_type").to_pylist(), object)
    cents = hist.column("cents").to_numpy(zero_copy_only=False)
    n = hist.column("n").to_numpy(zero_copy_only=False)
    order = np.lexsort((cents, et.astype("U")))
    et, cents, n = et[order], cents[order], n[order]
    starts = np.flatnonzero(np.append(True, et[1:] != et[:-1]))
    lens = np.diff(np.append(starts, len(et)))
    out_t, out_n, out_kn, out_ks = [], [], [], []
    for s, ln in zip(starts, lens):
        cs, ns = cents[s:s + ln], n[s:s + ln]
        total = int(ns.sum())
        k = total // 4
        cum = np.cumsum(ns)
        # kept positions are (k, total-k]: per quantum, the overlap of
        # its position range (cum-ns, cum] with the kept interval
        lo = np.maximum(cum - ns, k)
        hi = np.minimum(cum, total - k)
        kept = np.maximum(hi - lo, 0)
        out_t.append(et[s])
        out_n.append(total)
        out_kn.append(int(kept.sum()))
        out_ks.append(int((kept * cs).sum()))
    return pa.table({
        "event_type": pa.array(out_t, pa.string()),
        "n": pa.array(out_n, pa.int64()),
        "kept_n": pa.array(out_kn, pa.int64()),
        "kept_sum": pa.array(out_ks, pa.int64())})


SQL_TRIMMED_MEAN = """WITH p AS (
  SELECT event_type, CAST(FLOOR(value * 100) AS BIGINT) AS c
  FROM events WHERE NOT isnan(value)),
r AS (SELECT event_type, c,
        ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY c) AS rn,
        COUNT(*) OVER (PARTITION BY event_type) AS n
      FROM p)
SELECT event_type, CAST(MAX(n) AS BIGINT) AS n,
  CAST(COUNT(*) AS BIGINT) AS kept_n,
  CAST(SUM(c) AS BIGINT) AS kept_sum
FROM r WHERE rn > n // 4 AND rn <= n - n // 4
GROUP BY event_type"""


def q_skew_report(sf_dir: str):
    """Key-skew diagnostic — the report you run BEFORE choosing a
    partitioning key: the 10 heaviest users by event count (ties to
    the smallest user id) with the exact corpus total beside each, so
    the reader gets each key's share as an exact fraction. Per-batch
    (user, count) partials → one user-bucket shuffle (counts for a
    user co-locate and SUM exactly) → 10 candidates per bucket →
    driver fold over buckets × 10 rows. The total rides the same
    partials — no second pass."""
    import numpy as np

    n_buckets = adaptive_buckets(_nrows(sf_dir, "events"))

    def tag(t: pa.Table) -> pa.Table:
        sub = t.filter(pc.is_valid(t.column("user_id")))
        g = sub.group_by("user_id").aggregate([("user_id", "count")])
        out = pa.table({"u": g.column("user_id"),
                        "n": pc.cast(g.column("user_id_count"),
                                     pa.int64())})
        return out.append_column("bucket", int_bucket(out.column("u"),
                                                      n_buckets))

    def grp(g: pa.Table) -> pa.Table:
        f = g.group_by("u").aggregate([("n", "sum")])
        u = f.column("u").to_numpy(zero_copy_only=False)
        n = f.column("n_sum").to_numpy(zero_copy_only=False)
        order = np.lexsort((u, -n))[:10]
        # bucket total rides row 0 only, so the driver's grand total
        # is a plain column sum — no per-bucket dedup needed
        tot = np.zeros(len(order), np.int64)
        if len(order):
            tot[0] = int(n.sum())
        return pa.table({
            "u": pa.array(u[order], pa.int64()),
            "n": pa.array(n[order], pa.int64()),
            "tot": pa.array(tot, pa.int64())})

    parts = pa.concat_tables(list(
        _read(sf_dir, "events", ["user_id"])
        .map_batches(tag, batch_format="pyarrow")
        .groupby("bucket").map_groups(grp, batch_format="pyarrow")
        .iter_batches(batch_size=None, batch_format="pyarrow")),
        promote_options="default")
    u = parts.column("u").to_numpy(zero_copy_only=False)
    n = parts.column("n").to_numpy(zero_copy_only=False)
    total = int(parts.column("tot").to_numpy(
        zero_copy_only=False).sum())
    order = np.lexsort((u, -n))[:10]
    return pa.table({
        "user_id": pa.array(u[order], pa.int64()),
        "n_events": pa.array(n[order], pa.int64()),
        "total_events": pa.array([total] * len(order), pa.int64())})


SQL_SKEW_REPORT = """WITH c AS (
  SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_events
  FROM events WHERE user_id IS NOT NULL GROUP BY user_id)
SELECT user_id, n_events,
  (SELECT CAST(SUM(n_events) AS BIGINT) FROM c) AS total_events
FROM c ORDER BY n_events DESC, user_id LIMIT 10"""


def q_contingency_margins(sf_dir: str):
    """Independence-test cell table (the chi-square prep): for every
    (event_type, day-of-week) cell, the observed count plus its row
    total, column total and grand total as exact ints — the caller
    forms (O·N − R·C)²/(R·C·N) without any float leaving the engine.
    One pass of fixed-width partials (types × 7 per batch); margins
    are driver arithmetic over the combined ≤ types×7 table."""
    import numpy as np

    def partial(t: pa.Table) -> pa.Table:
        ok = pc.is_valid(t.column("ts"))
        # arrow day_of_week is 0=Monday; DuckDB dayofweek is 0=Sunday —
        # count_from/week_start reproduces the Sunday-0 convention
        sub = pa.table({
            "event_type": t.column("event_type"),
            "dow": pc.cast(pc.day_of_week(t.column("ts"),
                                          count_from_zero=True,
                                          week_start=7), pa.int64()),
        }).filter(ok)
        g = sub.group_by(["event_type", "dow"]).aggregate(
            [("dow", "count")])
        return pa.table({"event_type": g.column("event_type"),
                         "dow": g.column("dow"),
                         "n": pc.cast(g.column("dow_count"),
                                      pa.int64())})

    comb = _combine_partials(
        _read(sf_dir, "events", ["event_type", "ts"])
        .map_batches(partial, batch_format="pyarrow"),
        ["event_type", "dow"], {"n": "n"})
    et = np.asarray(comb.column("event_type").to_pylist(), object)
    dow = comb.column("dow").to_numpy(zero_copy_only=False)
    n = comb.column("n").to_numpy(zero_copy_only=False)
    row_tot = {}
    col_tot = {}
    for e, d, c in zip(et, dow, n):
        row_tot[e] = row_tot.get(e, 0) + int(c)
        col_tot[int(d)] = col_tot.get(int(d), 0) + int(c)
    grand = int(n.sum())
    return pa.table({
        "event_type": pa.array(et.tolist(), pa.string()),
        "dow": pa.array(dow, pa.int64()),
        "observed": pa.array(n, pa.int64()),
        "row_total": pa.array([row_tot[e] for e in et], pa.int64()),
        "col_total": pa.array([col_tot[int(d)] for d in dow],
                              pa.int64()),
        "grand_total": pa.array([grand] * len(et), pa.int64())})


SQL_CONTINGENCY_MARGINS = """WITH h AS (
  SELECT event_type, CAST(dayofweek(ts) AS BIGINT) AS dow,
         CAST(COUNT(*) AS BIGINT) AS observed
  FROM events WHERE ts IS NOT NULL GROUP BY event_type, dow)
SELECT event_type, dow, observed,
  CAST(SUM(observed) OVER (PARTITION BY event_type) AS BIGINT)
    AS row_total,
  CAST(SUM(observed) OVER (PARTITION BY dow) AS BIGINT) AS col_total,
  CAST(SUM(observed) OVER () AS BIGINT) AS grand_total
FROM h"""


def q_turn_text_dups(sf_dir: str):
    """Flagship cross-conversation text dedup: transcript texts that
    appear in MORE THAN ONE conversation, with occurrence and
    distinct-conversation counts — the repeated-boilerplate detector
    a curation pass runs before training. Per-batch distinct
    (text, conv) pairs bound the one text-hash shuffle; each group
    counts occurrences and distinct convs exactly (a text's rows all
    land in its bucket)."""
    n_buckets = adaptive_buckets(2 * _nrows(sf_dir, "events"))

    def tag(t: pa.Table) -> pa.Table:
        d = pa.table({"text": t.column("text"),
                      "conv_id": t.column("conv_id"),
                      "one": pa.array([1] * t.num_rows, pa.int64())}) \
            .group_by(["text", "conv_id"]).aggregate([("one", "sum")])
        out = pa.table({"text": d.column("text"),
                        "conv_id": d.column("conv_id"),
                        "n": d.column("one_sum")})
        return out.append_column(
            "bucket", fnv1a_bucket(out.column("text"), n_buckets))

    def grp(g: pa.Table) -> pa.Table:
        f = g.group_by("text").aggregate([("n", "sum"),
                                          ("conv_id", "count_distinct")])
        out = pa.table({
            "text": f.column("text"),
            "n_turns": f.column("n_sum"),
            "n_convs": pc.cast(f.column("conv_id_count_distinct"),
                               pa.int64())})
        return out.filter(pc.greater(out.column("n_convs"), 1))

    return read_transcripts(sf_dir) \
        .map_batches(tag, batch_format="pyarrow") \
        .groupby("bucket").map_groups(grp, batch_format="pyarrow")


SQL_TURN_TEXT_DUPS = f"""{_T}
SELECT text, CAST(COUNT(*) AS BIGINT) AS n_turns,
       CAST(COUNT(DISTINCT conv_id) AS BIGINT) AS n_convs
FROM transcripts GROUP BY text
HAVING COUNT(DISTINCT conv_id) > 1"""


def _session_bounds(g: pa.Table, gap_us: int):
    """Shared sessionized-kernel scaffold: lexsort the bucket's rows by
    (user, ts, event_id), mark session starts (user change OR gap >
    ``gap_us``), and return ``(order, starts)`` — the per-session
    boundary decomposition the session_lengths / sessions_with_buy
    kernels both reduceat over."""
    import numpy as np

    u = g.column("u").to_numpy(zero_copy_only=False)
    ts = g.column("ts").to_numpy(zero_copy_only=False)
    eid = g.column("eid").to_numpy(zero_copy_only=False)
    order, new_run, gap = _lag_scaffold([u], ts, eid)
    brk = new_run | (gap > gap_us)
    return order, np.flatnonzero(brk)


def q_session_lengths(sf_dir: str):
    """Session-size distribution: how many 30-min-gap sessions contain
    exactly k events — the engagement-depth histogram one level past
    `sessionization`'s per-user counts. One user-bucket shuffle; the
    per-bucket kernel marks session boundaries once (shared
    `_session_bounds`) and reduceats to per-session sizes, then
    pre-reduces to (length, count) partials bounded by the max session
    length."""
    import numpy as np

    gap_us = 30 * 60 * 1_000_000
    n_buckets = adaptive_buckets(_nrows(sf_dir, "events"))

    def tag(t: pa.Table) -> pa.Table:
        sub = pa.table({"u": t.column("user_id"),
                        "ts": pc.cast(t.column("ts"), pa.int64()),
                        "eid": t.column("event_id")}) \
            .filter(pc.and_(pc.is_valid(t.column("user_id")),
                            pc.is_valid(t.column("ts"))))
        return sub.append_column("bucket", int_bucket(sub.column("u"),
                                                      n_buckets))

    def grp(g: pa.Table) -> pa.Table:
        order, starts = _session_bounds(g, gap_us)
        sizes = np.diff(np.append(starts, len(order)))
        uniq, counts = np.unique(sizes, return_counts=True)
        return pa.table({"n_events": pa.array(uniq, pa.int64()),
                         "n_sessions": pa.array(
                             counts.astype(np.int64), pa.int64())})

    small = _read(sf_dir, "events", ["event_id", "user_id", "ts"]) \
        .map_batches(tag, batch_format="pyarrow") \
        .groupby("bucket").map_groups(grp, batch_format="pyarrow")
    return _combine_partials(small, ["n_events"],
                             {"n_sessions": "n_sessions"})


SQL_SESSION_LENGTHS = """WITH d AS (
  SELECT user_id, ts, event_id,
    CASE WHEN epoch_us(ts) - LAG(epoch_us(ts)) OVER (
           PARTITION BY user_id ORDER BY ts, event_id)
         > 30 * 60 * 1000000 THEN 1 ELSE 0 END AS brk
  FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL),
s AS (SELECT user_id,
        SUM(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
                       ROWS UNBOUNDED PRECEDING) AS sid
      FROM d),
c AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_events
      FROM s GROUP BY user_id, sid)
SELECT n_events, CAST(COUNT(*) AS BIGINT) AS n_sessions
FROM c GROUP BY n_events"""


def q_sessions_with_buy(sf_dir: str):
    """Sessionized conversion: of all 30-min-gap sessions, how many
    contain at least one 'purchase' — the session-level conversion rate's
    exact numerator/denominator (funnel_conversion is user-level; this
    is per-visit). Same `_session_bounds` decomposition; per-session
    any-buy is one maximum.reduceat over the sorted flag."""
    import numpy as np

    gap_us = 30 * 60 * 1_000_000
    n_buckets = adaptive_buckets(_nrows(sf_dir, "events"))

    def tag(t: pa.Table) -> pa.Table:
        sub = pa.table({"u": t.column("user_id"),
                        "ts": pc.cast(t.column("ts"), pa.int64()),
                        "eid": t.column("event_id"),
                        "buy": pc.cast(pc.fill_null(pc.equal(
                            t.column("event_type"), "purchase"), False),
                            pa.int64())}) \
            .filter(pc.and_(pc.is_valid(t.column("user_id")),
                            pc.is_valid(t.column("ts"))))
        return sub.append_column("bucket", int_bucket(sub.column("u"),
                                                      n_buckets))

    def grp(g: pa.Table) -> pa.Table:
        import numpy as np
        order, starts = _session_bounds(g, gap_us)
        buy = g.column("buy").to_numpy(zero_copy_only=False)[order]
        any_buy = np.maximum.reduceat(buy, starts) if len(starts) \
            else np.array([], np.int64)
        return pa.table({
            "n_sessions": pa.array([len(starts)], pa.int64()),
            "n_buy_sessions": pa.array([int(any_buy.sum())],
                                       pa.int64())})

    small = _read(sf_dir, "events",
                  ["event_id", "user_id", "ts", "event_type"]) \
        .map_batches(tag, batch_format="pyarrow") \
        .groupby("bucket").map_groups(grp, batch_format="pyarrow")
    t = pa.concat_tables(list(small.iter_batches(
        batch_size=None, batch_format="pyarrow")), promote_options="default")
    return pa.table({
        "n_sessions": pa.array([int(pc.sum(
            t.column("n_sessions")).as_py() or 0)], pa.int64()),
        "n_buy_sessions": pa.array([int(pc.sum(
            t.column("n_buy_sessions")).as_py() or 0)], pa.int64())})


SQL_SESSIONS_WITH_BUY = """WITH d AS (
  SELECT user_id, ts, event_id, event_type,
    CASE WHEN epoch_us(ts) - LAG(epoch_us(ts)) OVER (
           PARTITION BY user_id ORDER BY ts, event_id)
         > 30 * 60 * 1000000 THEN 1 ELSE 0 END AS brk
  FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL),
s AS (SELECT user_id, event_type,
        SUM(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
                       ROWS UNBOUNDED PRECEDING) AS sid
      FROM d),
c AS (SELECT MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
        AS has_buy FROM s GROUP BY user_id, sid)
SELECT CAST(COUNT(*) AS BIGINT) AS n_sessions,
       CAST(SUM(has_buy) AS BIGINT) AS n_buy_sessions FROM c"""


def q_tool_cooccurrence(sf_dir: str):
    """Flagship market-basket over tools: for every unordered pair of
    DISTINCT tools used in the same conversation, the number of
    conversations using both — the toolchain-affinity matrix. The
    cooccurrence shape on the transcripts table: per-batch distinct
    (conv, tool) pairs bound the one conv-bucket shuffle; the bucket
    kernel dedups globally and explodes each conversation's sorted
    tool set with the repeat/arange kernel (≤ C(tools,2) per conv)."""
    import numpy as np

    n_buckets = adaptive_buckets(2 * _nrows(sf_dir, "events"))

    def tag(t: pa.Table) -> pa.Table:
        d = pa.table({"conv_id": t.column("conv_id"),
                      "tool": t.column("tool")}) \
            .group_by(["conv_id", "tool"]).aggregate([])
        return d.append_column(
            "bucket", fnv1a_bucket(d.column("conv_id"), n_buckets))

    def grp(g: pa.Table) -> pa.Table:
        conv = pc.dictionary_encode(g.column("conv_id")
                                    .combine_chunks()).indices \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        enc = pc.dictionary_encode(g.column("tool").combine_chunks())
        vals = np.asarray(enc.dictionary.to_pylist(), object)
        sort_idx = np.argsort(vals.astype("U"))
        rank_of = np.empty(len(vals), np.int64)
        rank_of[sort_idx] = np.arange(len(vals))
        tc = rank_of[enc.indices.to_numpy(zero_copy_only=False)
                     .astype(np.int64)]
        vals_sorted = vals[sort_idx]
        order = np.lexsort((tc, conv))
        cs, ts_ = conv[order], tc[order]
        keep = np.append(True, (cs[1:] != cs[:-1]) | (ts_[1:] != ts_[:-1])) \
            if len(cs) else np.array([], bool)
        cs, ts_ = cs[keep], ts_[keep]
        starts = np.flatnonzero(np.append(True, cs[1:] != cs[:-1])) \
            if len(cs) else np.array([], np.int64)
        cnts = np.diff(np.append(starts, len(cs)))
        run_of = np.repeat(np.arange(len(starts)), cnts)
        pos = np.arange(len(cs)) - starts[run_of]
        reps = cnts[run_of] - pos - 1
        lefts = np.repeat(np.arange(len(cs)), reps)
        tot = int(reps.sum())
        block = (np.cumsum(reps) - reps).astype(np.int64)
        rights = lefts + 1 + (np.arange(tot) - np.repeat(block, reps))
        pair = ts_[lefts] * np.int64(len(vals) + 1) + ts_[rights]
        uniq, counts = np.unique(pair, return_counts=True)
        k = np.int64(len(vals) + 1)
        return pa.table({
            "tool_a": pa.array(vals_sorted[(uniq // k)].tolist(),
                               pa.string()),
            "tool_b": pa.array(vals_sorted[(uniq % k)].tolist(),
                               pa.string()),
            "n_convs": pa.array(counts.astype(np.int64), pa.int64())})

    small = read_transcripts(sf_dir) \
        .map_batches(tag, batch_format="pyarrow") \
        .groupby("bucket").map_groups(grp, batch_format="pyarrow")
    return _combine_partials(small, ["tool_a", "tool_b"],
                             {"n_convs": "n_convs"})


SQL_TOOL_COOCCURRENCE = f"""{_T},
f AS (SELECT DISTINCT conv_id, tool FROM transcripts)
SELECT a.tool AS tool_a, b.tool AS tool_b,
       CAST(COUNT(*) AS BIGINT) AS n_convs
FROM f a JOIN f b ON a.conv_id = b.conv_id AND a.tool < b.tool
GROUP BY a.tool, b.tool"""


def q_lorenz_deciles(sf_dir: str):
    """Activity-concentration (Lorenz) deciles: users ranked by event
    count DESC and cut into NTILE(10) tiles; per decile the user count
    and exact event total — "the top 10% of users generate X% of
    traffic". No global sort: per-user counts fold through one
    user-bucket shuffle, each bucket emits a (count → n_users)
    HISTOGRAM partial (bounded by distinct activity levels), and the
    driver allocates histogram rows to deciles by position-interval
    overlap — exactly NTILE's sizes (first N%10 tiles get one extra
    user), and tie groups split arbitrarily cost nothing because every
    user in a tie contributes the same count."""
    import numpy as np

    n_buckets = adaptive_buckets(_nrows(sf_dir, "events"))

    def tag(t: pa.Table) -> pa.Table:
        sub = t.filter(pc.is_valid(t.column("user_id")))
        g = sub.group_by("user_id").aggregate([("user_id", "count")])
        out = pa.table({"u": g.column("user_id"),
                        "n": pc.cast(g.column("user_id_count"),
                                     pa.int64())})
        return out.append_column("bucket", int_bucket(out.column("u"),
                                                      n_buckets))

    def grp(g: pa.Table) -> pa.Table:
        f = g.group_by("u").aggregate([("n", "sum")])
        cnt = f.column("n_sum").to_numpy(zero_copy_only=False)
        uniq, m = np.unique(cnt, return_counts=True)
        return pa.table({"n": pa.array(uniq, pa.int64()),
                         "m": pa.array(m.astype(np.int64), pa.int64())})

    hist = _combine_partials(
        _read(sf_dir, "events", ["user_id"])
        .map_batches(tag, batch_format="pyarrow")
        .groupby("bucket").map_groups(grp, batch_format="pyarrow"),
        ["n"], {"m": "m"})
    n = hist.column("n").to_numpy(zero_copy_only=False)
    m = hist.column("m").to_numpy(zero_copy_only=False)
    order = np.argsort(-n)  # activity DESC — decile 1 = heaviest
    n, m = n[order], m[order]
    total_users = int(m.sum())
    q, r = divmod(total_users, 10)
    sizes = np.array([q + 1 if d < r else q for d in range(10)],
                     np.int64)
    bounds = np.cumsum(sizes)
    starts = bounds - sizes
    cum = np.cumsum(m)
    row_lo = cum - m
    out_d, out_u, out_e = [], [], []
    for d in range(10):
        if sizes[d] == 0:
            continue
        lo = np.maximum(row_lo, starts[d])
        hi = np.minimum(cum, bounds[d])
        take = np.maximum(hi - lo, 0)
        out_d.append(d + 1)
        out_u.append(int(take.sum()))
        out_e.append(int((take * n).sum()))
    return pa.table({"decile": pa.array(out_d, pa.int64()),
                     "n_users": pa.array(out_u, pa.int64()),
                     "n_events": pa.array(out_e, pa.int64())})


SQL_LORENZ_DECILES = """WITH c AS (
  SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n
  FROM events WHERE user_id IS NOT NULL GROUP BY user_id),
t AS (SELECT n, NTILE(10) OVER (ORDER BY n DESC, user_id) AS decile
      FROM c)
SELECT CAST(decile AS BIGINT) AS decile,
       CAST(COUNT(*) AS BIGINT) AS n_users,
       CAST(SUM(n) AS BIGINT) AS n_events
FROM t GROUP BY decile"""


def q_view_to_buy_lag(sf_dir: str):
    """Per-purchase conversion latency: for every 'purchase', the
    microseconds since the same user's most recent 'view' at or before
    it ((ts, event_id) order; NULL when no view precedes) —
    conversion_lag's per-event refinement, the distribution marketing
    actually reads. Same LOCF kernel as last_buy_carry (vectorized
    maximum.accumulate ffill with per-segment bases), carrying the
    view timestamp instead of a value; one user-bucket shuffle."""
    import numpy as np

    n_buckets = adaptive_buckets(_nrows(sf_dir, "events"))

    def tag(t: pa.Table) -> pa.Table:
        et = t.column("event_type")
        sub = pa.table({"u": t.column("user_id"),
                        "ts": pc.cast(t.column("ts"), pa.int64()),
                        "eid": t.column("event_id"),
                        "is_view": pc.fill_null(
                            pc.equal(et, "view"), False),
                        "is_buy": pc.fill_null(
                            pc.equal(et, "purchase"), False)}) \
            .filter(pc.and_(pc.is_valid(t.column("user_id")),
                            pc.is_valid(t.column("ts"))))
        return sub.append_column("bucket", int_bucket(sub.column("u"),
                                                      n_buckets))

    def grp(g: pa.Table) -> pa.Table:
        u = g.column("u").to_numpy(zero_copy_only=False)
        ts = g.column("ts").to_numpy(zero_copy_only=False)
        eid = g.column("eid").to_numpy(zero_copy_only=False)
        is_view = g.column("is_view").to_numpy(zero_copy_only=False)
        is_buy = g.column("is_buy").to_numpy(zero_copy_only=False)
        order, new_run, _ = _lag_scaffold([u], ts, eid)
        o_view = is_view[order]
        idx = np.where(o_view, np.arange(len(order)), -1)
        starts = np.flatnonzero(new_run)
        lens = np.diff(np.append(starts, len(order)))
        seg = np.repeat(np.arange(len(starts)), lens)
        base = seg.astype(np.int64) * (len(order) + 2)
        filled = np.maximum.accumulate(
            np.where(idx >= 0, idx + base, -1))
        have = filled >= base
        src = np.where(have, filled - base, 0).astype(np.int64)
        o_ts = ts[order]
        lag = o_ts - o_ts[src]
        buys = is_buy[order]
        return pa.table({
            "event_id": pa.array(eid[order][buys], pa.int64()),
            "lag_us": pa.array(lag[buys], pa.int64(),
                               mask=~have[buys])})

    return _read(sf_dir, "events",
                 ["event_id", "user_id", "ts", "event_type"]) \
        .map_batches(tag, batch_format="pyarrow") \
        .groupby("bucket").map_groups(grp, batch_format="pyarrow")


SQL_VIEW_TO_BUY_LAG = """WITH p AS (
  SELECT event_id, user_id, ts, event_type,
    LAST_VALUE(CASE WHEN event_type = 'view' THEN epoch_us(ts) END
               IGNORE NULLS) OVER (
      PARTITION BY user_id ORDER BY ts, event_id
      ROWS UNBOUNDED PRECEDING) AS view_ts
  FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL)
SELECT event_id, epoch_us(ts) - view_ts AS lag_us
FROM p WHERE event_type = 'purchase'"""


def q_monthly_orders_yoy(sf_dir: str):
    """Seasonality report: orders per calendar month with the
    year-over-year delta (same month, previous year; NULL when that
    month is absent) — the trend table a capacity review reads.
    Per-batch (month, n) partials bound the exchange by the time
    range; the YoY self-join is driver arithmetic on the ≤ months
    series via a month-index dict, robust to gaps (a LAG(12) over
    the series would misalign across missing months)."""
    import numpy as np

    def partial(t: pa.Table) -> pa.Table:
        ok = pc.is_valid(t.column("o_orderdate"))
        mon = pc.floor_temporal(t.column("o_orderdate"), unit="month")
        g = pa.table({"mon": mon}).filter(ok) \
            .group_by("mon").aggregate([("mon", "count")])
        return pa.table({"mon": g.column("mon"),
                         "n": pc.cast(g.column("mon_count"),
                                      pa.int64())})

    comb = _combine_partials(
        _read(sf_dir, "orders", ["o_orderdate"])
        .map_batches(partial, batch_format="pyarrow"),
        ["mon"], {"n": "n"})
    mon = comb.column("mon")
    yr = pc.year(mon).to_numpy(zero_copy_only=False)
    mo = pc.month(mon).to_numpy(zero_copy_only=False)
    idx = yr * 12 + (mo - 1)
    n = comb.column("n").to_numpy(zero_copy_only=False)
    by_idx = dict(zip(idx.tolist(), n.tolist()))
    prev = np.array([by_idx.get(int(i) - 12, -1) for i in idx],
                    np.int64)
    order = np.argsort(idx)
    return pa.table({
        "mon": pc.take(mon.combine_chunks() if isinstance(
            mon, pa.ChunkedArray) else mon,
            pa.array(order, pa.int64())),
        "n_orders": pa.array(n[order], pa.int64()),
        "yoy_delta": pa.array((n - np.where(prev < 0, 0, prev))[order],
                              pa.int64(), mask=(prev < 0)[order])})


SQL_MONTHLY_ORDERS_YOY = """WITH m AS (
  SELECT CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS mon,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM orders WHERE o_orderdate IS NOT NULL GROUP BY mon)
SELECT a.mon, a.n AS n_orders, a.n - b.n AS yoy_delta
FROM m a LEFT JOIN m b ON b.mon = a.mon - INTERVAL 12 MONTH"""


def q_order_to_ship_days(sf_dir: str):
    """Fulfilment-latency distribution: days between an order's date
    and each lineitem's ship date, histogrammed — a two-FACT-table
    join (neither side broadcasts) feeding a bounded aggregate.
    `hash_join` exchanges both tables once with input-adaptive
    partitions; after the join only (batch × distinct-day) partial
    rows move."""
    from .joins import hash_join

    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_shipdate"])
    orders = _read(sf_dir, "orders", ["o_orderkey", "o_orderdate"])
    nparts = adaptive_buckets(
        _nrows(sf_dir, "lineitem") + _nrows(sf_dir, "orders"),
        target_rows=500_000, lo=4, hi=1 << 16)
    joined = hash_join(li, orders, on="l_orderkey",
                       right_on="o_orderkey", how="inner",
                       num_partitions=nparts)

    DAY = 86_400_000_000

    def partial(t: pa.Table) -> pa.Table:
        ship = pc.cast(t.column("l_shipdate"), pa.int64())
        od = pc.cast(t.column("o_orderdate"), pa.int64())
        ok = pc.and_(pc.is_valid(ship), pc.is_valid(od))
        # both dates are midnight-aligned, so the µs floor-div equals
        # the calendar-day diff
        days = pc.divide(pc.subtract(ship, od), DAY)
        g = pa.table({"days": days}).filter(ok) \
            .group_by("days").aggregate([("days", "count")])
        return pa.table({"days": g.column("days"),
                         "n": pc.cast(g.column("days_count"),
                                      pa.int64())})

    return _combine_partials(
        joined.map_batches(partial, batch_format="pyarrow"),
        ["days"], {"n": "n"})


SQL_ORDER_TO_SHIP_DAYS = """WITH j AS (
  SELECT datediff('day', o.o_orderdate, l.l_shipdate) AS d
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
  WHERE l.l_shipdate IS NOT NULL AND o.o_orderdate IS NOT NULL)
SELECT CAST(d AS BIGINT) AS days, CAST(COUNT(*) AS BIGINT) AS n
FROM j GROUP BY d"""


def q_rfm_customers(sf_dir: str):
    """RFM segmentation inputs: per customer the Recency (days since
    their last order, against the corpus max order date — read from
    the parquet FOOTER, no extra execution), Frequency (order count)
    and Monetary total (exact floor-cents) — the classic marketing
    segmentation, all exact ints. COUNT/MAX/SUM are associative: one
    customer-bucket shuffle folds per-batch partials."""
    import numpy as np

    _, max_us = _footer_ts_range(sf_dir, "orders", "o_orderdate")
    DAY = 86_400_000_000
    n_buckets = adaptive_buckets(_nrows(sf_dir, "orders"))

    def tag(t: pa.Table) -> pa.Table:
        v = t.column("o_totalprice").to_numpy(zero_copy_only=False)
        sub = pa.table({
            "c": t.column("o_custkey"),
            "d": pc.cast(t.column("o_orderdate"), pa.int64()),
            "cents": pa.array(np.floor(v * 100.0).astype(np.int64),
                              pa.int64()),
            "one": pa.array(np.ones(t.num_rows, np.int64), pa.int64())}) \
            .filter(pc.and_(pc.is_valid(t.column("o_custkey")),
                            pc.is_valid(t.column("o_orderdate"))))
        g = sub.group_by("c").aggregate(
            [("d", "max"), ("cents", "sum"), ("one", "sum")])
        out = pa.table({"c": g.column("c"), "d": g.column("d_max"),
                        "cents": g.column("cents_sum"),
                        "n": g.column("one_sum")})
        return out.append_column("bucket", int_bucket(out.column("c"),
                                                      n_buckets))

    def grp(g: pa.Table) -> pa.Table:
        f = g.group_by("c").aggregate(
            [("d", "max"), ("cents", "sum"), ("n", "sum")])
        d = f.column("d_max").to_numpy(zero_copy_only=False)
        return pa.table({
            "o_custkey": f.column("c"),
            "recency_days": pa.array((max_us - d) // DAY, pa.int64()),
            "frequency": f.column("n_sum"),
            "monetary_cents": f.column("cents_sum")})

    return _read(sf_dir, "orders",
                 ["o_custkey", "o_orderdate", "o_totalprice"]) \
        .map_batches(tag, batch_format="pyarrow") \
        .groupby("bucket").map_groups(grp, batch_format="pyarrow")


SQL_RFM_CUSTOMERS = """WITH mx AS (
  SELECT MAX(o_orderdate) AS m FROM orders)
SELECT o_custkey,
  CAST(datediff('day', MAX(o_orderdate), (SELECT m FROM mx))
       AS BIGINT) AS recency_days,
  CAST(COUNT(*) AS BIGINT) AS frequency,
  CAST(SUM(CAST(FLOOR(o_totalprice * 100) AS BIGINT)) AS BIGINT)
    AS monetary_cents
FROM orders WHERE o_custkey IS NOT NULL AND o_orderdate IS NOT NULL
GROUP BY o_custkey"""


def q_type_percent_rank(sf_dir: str):
    """Grouped exact percent-rank inputs: per event, the count of
    STRICTLY smaller cents within its type (= RANK()−1) and the
    type's row count — the within-segment score-normalization step,
    as exact ints (the caller divides for percent_rank). No per-type
    sort of the corpus: the (type, cents)→count HISTOGRAM folds once
    (bounded by types × distinct quanta), its per-type exclusive
    cumulative broadcasts in the stage closure, and a second narrow
    pass answers every row with one searchsorted per (batch, type).
    The two-pass shape trades one extra READ of the pruned 3-column
    projection for never exchanging corpus rows."""
    import numpy as np

    def partial(t: pa.Table) -> pa.Table:
        v = t.column("value").to_numpy(zero_copy_only=False)
        ok = ~np.isnan(v)
        part = pa.table({
            "event_type": pc.array_filter(
                t.column("event_type").combine_chunks(), pa.array(ok)),
            "cents": pa.array(np.floor(v[ok] * 100).astype(np.int64),
                              pa.int64()),
            "n": pa.array(np.ones(int(ok.sum()), np.int64), pa.int64())})
        g = part.group_by(["event_type", "cents"]).aggregate(
            [("n", "sum")])
        return pa.table({"event_type": g.column("event_type"),
                         "cents": g.column("cents"),
                         "n": g.column("n_sum")})

    hist = _combine_partials(
        _read(sf_dir, "events", ["event_type", "value"])
        .map_batches(partial, batch_format="pyarrow"),
        ["event_type", "cents"], {"n": "n"})
    et = np.asarray(hist.column("event_type").to_pylist(), object)
    cents = hist.column("cents").to_numpy(zero_copy_only=False)
    n = hist.column("n").to_numpy(zero_copy_only=False)
    order = np.lexsort((cents, et.astype("U")))
    et, cents, n = et[order], cents[order], n[order]
    cdf: dict = {}
    starts = np.flatnonzero(np.append(True, et[1:] != et[:-1]))
    lens = np.diff(np.append(starts, len(et)))
    for s, ln in zip(starts, lens):
        cs, ns = cents[s:s + ln], n[s:s + ln]
        cum = np.cumsum(ns)
        # exclusive: count of strictly smaller = cum shifted right
        cdf[et[s]] = (cs, np.concatenate([[0], cum[:-1]]),
                      int(cum[-1]))

    def rank(t: pa.Table) -> pa.Table:
        v = t.column("value").to_numpy(zero_copy_only=False)
        ok = ~np.isnan(v)
        sub = pa.table({"event_id": t.column("event_id"),
                        "event_type": t.column("event_type")}) \
            .filter(pa.array(ok))
        c = np.floor(v[ok] * 100).astype(np.int64)
        ets = np.asarray(sub.column("event_type").to_pylist(), object)
        smaller = np.zeros(len(c), np.int64)
        total = np.zeros(len(c), np.int64)
        for ty in np.unique(ets.astype("U")):
            m = ets == ty
            cs, excl, tot = cdf[ty]
            pos = np.searchsorted(cs, c[m], side="left")
            # c[m] always exists in cs (built from the same corpus)
            smaller[m] = excl[pos]
            total[m] = tot
        return pa.table({
            "event_id": sub.column("event_id"),
            "smaller_n": pa.array(smaller, pa.int64()),
            "type_n": pa.array(total, pa.int64())})

    return _read(sf_dir, "events",
                 ["event_id", "event_type", "value"]) \
        .map_batches(rank, batch_format="pyarrow")


SQL_TYPE_PERCENT_RANK = """WITH p AS (
  SELECT event_id, event_type,
         CAST(FLOOR(value * 100) AS BIGINT) AS c
  FROM events WHERE NOT isnan(value))
SELECT event_id,
  CAST(RANK() OVER (PARTITION BY event_type ORDER BY c) - 1
       AS BIGINT) AS smaller_n,
  CAST(COUNT(*) OVER (PARTITION BY event_type) AS BIGINT) AS type_n
FROM p"""


def q_dim_profile(sf_dir: str):
    """Per-dimension embedding profile: for every vector dimension,
    count / exact-quantized sum / min / max — the feature-drift
    monitor a training pipeline runs per corpus snapshot. The explode
    never materializes rows×dims: each batch reads the ListArray's
    flat values zero-copy (slice-aware ``flatten``), derives each
    value's dimension from the offsets arithmetic, and pre-reduces to
    a dims-wide partial; quantization (×1e6 floor) keeps every output
    int64-exact across engines."""
    import numpy as np

    def partial(t: pa.Table) -> pa.Table:
        col = t.column("embedding")
        col = col.combine_chunks() if isinstance(col, pa.ChunkedArray) \
            else col
        offs = col.offsets.to_numpy(zero_copy_only=False)
        flat = pc.cast(col.flatten(), pa.float64()) \
            .to_numpy(zero_copy_only=False)
        q = np.floor(flat * 1_000_000.0).astype(np.int64)
        lens = np.diff(offs)
        # dimension index (1-based, the SQL generate_subscripts
        # convention): CAUTION — a zero-copy-sliced ListArray's
        # offsets need not start at 0, and flatten() returns only the
        # slice's values, so positions rebase against offs[0]
        flat_pos = np.arange(len(q)) + offs[0]
        dim = (flat_pos - np.repeat(offs[:-1], lens)) + 1
        part = pa.table({"idx": pa.array(dim.astype(np.int64),
                                         pa.int64()),
                         "qv": pa.array(q, pa.int64())})
        g = part.group_by("idx").aggregate(
            [("qv", "sum"), ("qv", "min"), ("qv", "max"),
             ("qv", "count")])
        return pa.table({"idx": g.column("idx"),
                         "s": g.column("qv_sum"),
                         "mn": g.column("qv_min"),
                         "mx": g.column("qv_max"),
                         "n": pc.cast(g.column("qv_count"),
                                      pa.int64())})

    parts = pa.concat_tables(list(
        _read(sf_dir, "embeddings", ["embedding"])
        .map_batches(partial, batch_format="pyarrow")
        .iter_batches(batch_size=None, batch_format="pyarrow")),
        promote_options="default")
    g = parts.group_by("idx").aggregate(
        [("n", "sum"), ("s", "sum"), ("mn", "min"), ("mx", "max")])
    return pa.table({"idx": g.column("idx"),
                     "n": g.column("n_sum"),
                     "sum_q": g.column("s_sum"),
                     "min_q": g.column("mn_min"),
                     "max_q": g.column("mx_max")})


SQL_DIM_PROFILE = """WITH u AS (
  SELECT unnest(embedding) AS v,
         generate_subscripts(embedding, 1) AS idx
  FROM embeddings),
q AS (SELECT CAST(idx AS BIGINT) AS idx,
             CAST(FLOOR(CAST(v AS DOUBLE) * 1000000) AS BIGINT) AS qv
      FROM u)
SELECT idx, CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(qv) AS BIGINT) AS sum_q,
       CAST(MIN(qv) AS BIGINT) AS min_q,
       CAST(MAX(qv) AS BIGINT) AS max_q
FROM q GROUP BY idx"""


def q_repurchase_gaps(sf_dir: str):
    """Repeat-purchase intervals: full-day gaps between a user's
    CONSECUTIVE purchases ((ts, event_id) order), histogrammed — the
    retention-curve input. The LAG runs on the purchase SUBSET (the
    filter pushes below the shuffle, so only purchase rows move);
    per-bucket kernel is the shared lexsort scaffold, pre-reduced to
    (days, count) partials."""
    import numpy as np

    n_buckets = adaptive_buckets(_nrows(sf_dir, "events"))
    DAY = 86_400_000_000

    def tag(t: pa.Table) -> pa.Table:
        sub = pa.table({"u": t.column("user_id"),
                        "ts": pc.cast(t.column("ts"), pa.int64()),
                        "eid": t.column("event_id")}) \
            .filter(pc.and_(pc.and_(
                pc.is_valid(t.column("user_id")),
                pc.is_valid(t.column("ts"))),
                pc.fill_null(pc.equal(t.column("event_type"),
                                      "purchase"), False)))
        return sub.append_column("bucket", int_bucket(sub.column("u"),
                                                      n_buckets))

    def grp(g: pa.Table) -> pa.Table:
        u = g.column("u").to_numpy(zero_copy_only=False)
        ts = g.column("ts").to_numpy(zero_copy_only=False)
        eid = g.column("eid").to_numpy(zero_copy_only=False)
        order, new_run, gap = _lag_scaffold([u], ts, eid)
        days = gap[~new_run] // DAY
        uniq, counts = np.unique(days, return_counts=True)
        return pa.table({"days": pa.array(uniq, pa.int64()),
                         "n": pa.array(counts.astype(np.int64),
                                       pa.int64())})

    small = _read(sf_dir, "events", ["event_id", "user_id", "ts",
                                     "event_type"]) \
        .map_batches(tag, batch_format="pyarrow") \
        .groupby("bucket").map_groups(grp, batch_format="pyarrow")
    return _combine_partials(small, ["days"], {"n": "n"})


SQL_REPURCHASE_GAPS = """WITH p AS (
  SELECT user_id, ts, event_id FROM events
  WHERE event_type = 'purchase' AND user_id IS NOT NULL
    AND ts IS NOT NULL),
g AS (SELECT (epoch_us(ts) - LAG(epoch_us(ts)) OVER (
        PARTITION BY user_id ORDER BY ts, event_id))
        // 86400000000 AS days
      FROM p)
SELECT CAST(days AS BIGINT) AS days, CAST(COUNT(*) AS BIGINT) AS n
FROM g WHERE days IS NOT NULL GROUP BY days"""


def q_behavior_twins(sf_dir: str):
    """Set-equality grouping ("behavior twins"): users whose DISTINCT
    active-day sets are IDENTICAL, reported as a class-size histogram
    (how many equivalence classes have exactly k members). Two
    shuffles, both irreducible: one user-bucket pass builds each
    user's canonical sorted day-set key (distinct (user, day) pairs
    bound what moves), one key-hash pass groups identical sets —
    the key is the literal day list rendered to a string, so equality
    is exact (no fingerprint collisions)."""
    import numpy as np
    import pandas as pd

    n_buckets = adaptive_buckets(_nrows(sf_dir, "events"))
    DAY = 86_400_000_000

    def tag(t: pa.Table) -> pa.Table:
        # arrow integer divide truncates toward zero vs SQL //'s floor —
        # identical for the corpus's post-epoch timestamps
        sub = pa.table({"u": t.column("user_id"),
                        "d": pc.divide(pc.cast(
                            t.column("ts"), pa.int64()), DAY)}) \
            .filter(pc.and_(pc.is_valid(t.column("user_id")),
                            pc.is_valid(t.column("ts")))) \
            .group_by(["u", "d"]).aggregate([])
        return sub.append_column("bucket", int_bucket(sub.column("u"),
                                                      n_buckets))

    def day_sets(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates(["u", "d"]).sort_values(["u", "d"])
        key = g.groupby("u", sort=False)["d"].agg(
            lambda s: ",".join(map(str, s)))
        return pd.DataFrame({"key": key.to_numpy()})

    def grp2(g: pa.Table) -> pa.Table:
        f = g.group_by("key").aggregate([("key", "count")])
        sizes = pc.cast(f.column("key_count"), pa.int64()) \
            .to_numpy(zero_copy_only=False)
        uniq, counts = np.unique(sizes, return_counts=True)
        return pa.table({"class_size": pa.array(uniq, pa.int64()),
                         "n_classes": pa.array(
                             counts.astype(np.int64), pa.int64())})

    keys = _read(sf_dir, "events", ["user_id", "ts"]) \
        .map_batches(tag, batch_format="pyarrow") \
        .groupby("bucket").map_groups(day_sets, batch_format="pandas") \
        .map_batches(lambda t: t.append_column(
            "kb", fnv1a_bucket(t.column("key"), n_buckets)),
        batch_format="pyarrow")
    small = keys.groupby("kb").map_groups(grp2, batch_format="pyarrow")
    return _combine_partials(small, ["class_size"],
                             {"n_classes": "n_classes"})


SQL_BEHAVIOR_TWINS = """WITH d AS (
  SELECT DISTINCT user_id, epoch_us(ts) // 86400000000 AS day
  FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL),
k AS (SELECT user_id, string_agg(CAST(day AS VARCHAR), ',' ORDER BY day)
        AS key FROM d GROUP BY user_id),
c AS (SELECT key, CAST(COUNT(*) AS BIGINT) AS class_size
      FROM k GROUP BY key)
SELECT class_size, CAST(COUNT(*) AS BIGINT) AS n_classes
FROM c GROUP BY class_size"""


def _md5_first_hex(col) -> pa.Array:
    """First hex digit of md5(value) — the cross-engine GROUP-level
    split key (DuckDB: ``substr(md5(x), 1, 1)``). Row-at-a-time md5 is
    fine here: it runs once per DISTINCT conv per batch, not per
    turn."""
    import hashlib
    return pa.array([hashlib.md5(v.encode()).hexdigest()[0]
                     if v is not None else None
                     for v in col.to_pylist()], pa.string())


_SPLIT_CASE = ("CASE WHEN h <= 'b' THEN 'train' "
               "WHEN h <= 'd' THEN 'val' ELSE 'test' END")


def _split_of(hexdigit: pa.Array) -> pa.Array:
    train = pc.less_equal(hexdigit, "b")
    val = pc.less_equal(hexdigit, "d")
    return pc.if_else(train, "train", pc.if_else(val, "val", "test"))


def q_conv_split(sf_dir: str):
    """GROUP-consistent train/val/test split — the conversation-leakage
    guard an LLM pipeline needs (row-level `hash_split` would scatter
    one conversation's turns across splits): every turn follows its
    conv_id's deterministic md5 bucket (first hex digit: 12/16 train,
    2/16 val, 2/16 test). Per-batch the split derives from the
    DISTINCT convs present (md5 once per conv, not per turn), then
    fixed-width (split, n_convs, n_turns) partials fold — counting
    distinct convs exactly via one conv-bucket shuffle."""
    import numpy as np

    n_buckets = adaptive_buckets(2 * _nrows(sf_dir, "events"))

    def tag(t: pa.Table) -> pa.Table:
        d0 = pa.table({"conv_id": t.column("conv_id"),
                       "one": pa.array([1] * t.num_rows, pa.int64())}) \
            .group_by("conv_id").aggregate([("one", "sum")])
        d = pa.table({"conv_id": d0.column("conv_id"),
                      "one": d0.column("one_sum")})
        return d.append_column(
            "bucket", fnv1a_bucket(d.column("conv_id"), n_buckets))

    def grp(g: pa.Table) -> pa.Table:
        f = g.group_by("conv_id").aggregate([("one", "sum")])
        split = _split_of(_md5_first_hex(f.column("conv_id")))
        part = pa.table({"split": split,
                         "n_turns": f.column("one_sum"),
                         "one": pa.array([1] * f.num_rows, pa.int64())})
        gg = part.group_by("split").aggregate(
            [("one", "sum"), ("n_turns", "sum")])
        return pa.table({"split": gg.column("split"),
                         "n_convs": gg.column("one_sum"),
                         "n_turns": gg.column("n_turns_sum")})

    small = read_transcripts(sf_dir) \
        .map_batches(tag, batch_format="pyarrow") \
        .groupby("bucket").map_groups(grp, batch_format="pyarrow")
    return _combine_partials(small, ["split"],
                             {"n_convs": "n_convs",
                              "n_turns": "n_turns"})


SQL_CONV_SPLIT = f"""{_T},
c AS (SELECT conv_id, CAST(COUNT(*) AS BIGINT) AS n_turns
      FROM transcripts GROUP BY conv_id),
s AS (SELECT conv_id, n_turns, substr(md5(conv_id), 1, 1) AS h FROM c)
SELECT {_SPLIT_CASE} AS split,
       CAST(COUNT(*) AS BIGINT) AS n_convs,
       CAST(SUM(n_turns) AS BIGINT) AS n_turns
FROM s GROUP BY split"""


def q_split_leakage(sf_dir: str):
    """Cross-split text-leakage audit AFTER the group-consistent
    `conv_split`: how many distinct turn texts appear in MORE THAN ONE
    split — group-level splitting prevents conversation leakage but
    NOT repeated-boilerplate leakage, and this is the check that
    proves it (the corpus's repeated props texts leak; its unique log
    lines don't). One text-hash shuffle of per-batch distinct
    (text, split) pairs; per group the distinct-split count is exact.
    Returns (n_texts, n_leaked)."""
    n_buckets = adaptive_buckets(2 * _nrows(sf_dir, "events"))

    def tag(t: pa.Table) -> pa.Table:
        split = _split_of(_md5_first_hex(t.column("conv_id")))
        d = pa.table({"text": t.column("text"), "split": split}) \
            .group_by(["text", "split"]).aggregate([])
        return d.append_column(
            "bucket", fnv1a_bucket(d.column("text"), n_buckets))

    def grp(g: pa.Table) -> pa.Table:
        f = g.group_by("text").aggregate([("split", "count_distinct")])
        k = pc.cast(f.column("split_count_distinct"), pa.int64())
        return pa.table({
            "n_texts": pa.array([f.num_rows], pa.int64()),
            "n_leaked": pa.array(
                [pc.sum(pc.cast(pc.greater(k, 1), pa.int64())).as_py()
                 or 0], pa.int64())})

    small = read_transcripts(sf_dir) \
        .map_batches(tag, batch_format="pyarrow") \
        .groupby("bucket").map_groups(grp, batch_format="pyarrow")
    t = pa.concat_tables(list(small.iter_batches(
        batch_size=None, batch_format="pyarrow")), promote_options="default")
    return pa.table({
        "n_texts": pa.array([int(pc.sum(t.column("n_texts")).as_py()
                                 or 0)], pa.int64()),
        "n_leaked": pa.array([int(pc.sum(t.column("n_leaked")).as_py()
                                  or 0)], pa.int64())})


SQL_SPLIT_LEAKAGE = f"""{_T},
s AS (SELECT conv_id, substr(md5(conv_id), 1, 1) AS h
      FROM (SELECT DISTINCT conv_id FROM transcripts)),
j AS (SELECT t.text, {_SPLIT_CASE} AS split
      FROM transcripts t JOIN s USING (conv_id)),
d AS (SELECT text, COUNT(DISTINCT split) AS k FROM j GROUP BY text)
SELECT CAST(COUNT(*) AS BIGINT) AS n_texts,
       CAST(COUNT(*) FILTER (WHERE k > 1) AS BIGINT) AS n_leaked
FROM d"""


def q_value_autocorr_lag1(sf_dir: str):
    """Serial (lag-1) correlation inputs per event type: exact integer
    co-moment numerators over each user's ADJACENT event pairs
    ((ts, event_id) order, both values non-NaN) — the
    autocorrelation-based anomaly signal, float-free like
    grouped_corr. One user-bucket shuffle; the per-bucket kernel is
    the shared LAG scaffold emitting (prev_cents, cur_cents) pairs
    keyed by the CURRENT event's type, pre-reduced to five int64 sums
    per (bucket, type)."""
    import numpy as np

    n_buckets = adaptive_buckets(_nrows(sf_dir, "events"))

    def tag(t: pa.Table) -> pa.Table:
        v = t.column("value").to_numpy(zero_copy_only=False)
        sub = pa.table({"u": t.column("user_id"),
                        "ts": pc.cast(t.column("ts"), pa.int64()),
                        "eid": t.column("event_id"),
                        "et": t.column("event_type"),
                        "cents": pa.array(
                            np.floor(v * 100.0).astype(np.int64),
                            pa.int64()),
                        "ok": pa.array(~np.isnan(v))}) \
            .filter(pc.and_(pc.is_valid(t.column("user_id")),
                            pc.is_valid(t.column("ts"))))
        return sub.append_column("bucket", int_bucket(sub.column("u"),
                                                      n_buckets))

    def grp(g: pa.Table) -> pa.Table:
        u = g.column("u").to_numpy(zero_copy_only=False)
        ts = g.column("ts").to_numpy(zero_copy_only=False)
        eid = g.column("eid").to_numpy(zero_copy_only=False)
        cents = g.column("cents").to_numpy(zero_copy_only=False)
        okv = g.column("ok").to_numpy(zero_copy_only=False)
        order, new_run, _ = _lag_scaffold([u], ts, eid)
        c = cents[order]
        o = okv[order]
        pair = ~new_run[1:] & o[1:] & o[:-1]
        x = c[:-1][pair]  # prev
        y = c[1:][pair]   # cur
        et = np.asarray(g.column("et").to_pylist(), object)[order][1:][pair]
        part = pa.table({
            "event_type": pa.array(et.tolist(), pa.string()),
            "x": pa.array(x, pa.int64()), "y": pa.array(y, pa.int64()),
            "xx": pa.array(x * x, pa.int64()),
            "yy": pa.array(y * y, pa.int64()),
            "xy": pa.array(x * y, pa.int64()),
            "one": pa.array(np.ones(len(x), np.int64), pa.int64())})
        gg = part.group_by("event_type").aggregate(
            [("x", "sum"), ("y", "sum"), ("xx", "sum"), ("yy", "sum"),
             ("xy", "sum"), ("one", "sum")])
        return pa.table({
            "event_type": gg.column("event_type"),
            "sx": gg.column("x_sum"), "sy": gg.column("y_sum"),
            "sxx": gg.column("xx_sum"), "syy": gg.column("yy_sum"),
            "sxy": gg.column("xy_sum"), "n": gg.column("one_sum")})

    comb = _combine_partials(
        _read(sf_dir, "events",
              ["event_id", "user_id", "ts", "event_type", "value"])
        .map_batches(tag, batch_format="pyarrow")
        .groupby("bucket").map_groups(grp, batch_format="pyarrow"),
        ["event_type"],
        {"sx": "sx", "sy": "sy", "sxx": "sxx", "syy": "syy",
         "sxy": "sxy", "n": "n"})
    rows = comb.to_pylist()
    return pa.table({
        "event_type": pa.array([r["event_type"] for r in rows],
                               pa.string()),
        "n": pa.array([r["n"] for r in rows], pa.int64()),
        "cov_num": pa.array(
            [r["n"] * r["sxy"] - r["sx"] * r["sy"] for r in rows],
            pa.int64()),
        "varx_num": pa.array(
            [r["n"] * r["sxx"] - r["sx"] * r["sx"] for r in rows],
            pa.int64()),
        "vary_num": pa.array(
            [r["n"] * r["syy"] - r["sy"] * r["sy"] for r in rows],
            pa.int64())})


SQL_VALUE_AUTOCORR_LAG1 = """WITH o AS (
  SELECT user_id, ts, event_id, event_type,
    CASE WHEN isnan(value) THEN NULL
         ELSE CAST(FLOOR(value * 100) AS BIGINT) END AS c,
    LAG(CASE WHEN isnan(value) THEN NULL
             ELSE CAST(FLOOR(value * 100) AS BIGINT) END) OVER w AS px
  FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
p AS (SELECT event_type, px AS x, c AS y FROM o
      WHERE px IS NOT NULL AND c IS NOT NULL)
SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
  CAST(COUNT(*) * SUM(x*y) - SUM(x) * SUM(y) AS BIGINT) AS cov_num,
  CAST(COUNT(*) * SUM(x*x) - SUM(x) * SUM(x) AS BIGINT) AS varx_num,
  CAST(COUNT(*) * SUM(y*y) - SUM(y) * SUM(y) AS BIGINT) AS vary_num
FROM p GROUP BY event_type"""


def q_daily_median_band(sf_dir: str):
    """Per-day quantile band (p10 / p50 / p90 of value-cents) — the
    time-series monitoring band drawn on every ops dashboard, exact
    discrete quantiles through the repo's ONE selection rule
    (`aggregates.quantile_from_cdf`: smallest quantum whose cumulative
    count reaches ceil(q·n)). The (day, quantum)→count histogram folds
    once (bounded by days × distinct quanta); all three selections are
    driver arithmetic per day."""
    import numpy as np

    from .aggregates import quantile_from_cdf

    DAY = 86_400_000_000

    def partial(t: pa.Table) -> pa.Table:
        v = t.column("value").to_numpy(zero_copy_only=False)
        ts = pc.cast(t.column("ts"), pa.int64()) \
            .to_numpy(zero_copy_only=False)
        ok = ~np.isnan(v) & pc.is_valid(t.column("ts")) \
            .to_numpy(zero_copy_only=False)
        part = pa.table({
            "day": pa.array(ts[ok] // DAY, pa.int64()),
            "cents": pa.array(np.floor(v[ok] * 100).astype(np.int64),
                              pa.int64()),
            "n": pa.array(np.ones(int(ok.sum()), np.int64),
                          pa.int64())})
        g = part.group_by(["day", "cents"]).aggregate([("n", "sum")])
        return pa.table({"day": g.column("day"),
                         "cents": g.column("cents"),
                         "n": g.column("n_sum")})

    hist = _combine_partials(
        _read(sf_dir, "events", ["ts", "value"])
        .map_batches(partial, batch_format="pyarrow"),
        ["day", "cents"], {"n": "n"})
    day = hist.column("day").to_numpy(zero_copy_only=False)
    cents = hist.column("cents").to_numpy(zero_copy_only=False)
    n = hist.column("n").to_numpy(zero_copy_only=False)
    order = np.lexsort((cents, day))
    day, cents, n = day[order], cents[order], n[order]
    starts = np.flatnonzero(np.append(True, day[1:] != day[:-1]))
    lens = np.diff(np.append(starts, len(day)))
    out = {"day": [], "p10": [], "p50": [], "p90": []}
    for s, ln in zip(starts, lens):
        cum = np.cumsum(n[s:s + ln])
        uniq = cents[s:s + ln]
        out["day"].append(int(day[s]) * DAY)
        for q, col in ((0.1, "p10"), (0.5, "p50"), (0.9, "p90")):
            out[col].append(quantile_from_cdf(uniq, cum, q))
    return pa.table({
        "day": pa.array(out["day"], pa.int64())
        .cast(pa.timestamp("us")),
        "p10": pa.array(out["p10"], pa.int64()),
        "p50": pa.array(out["p50"], pa.int64()),
        "p90": pa.array(out["p90"], pa.int64())})


SQL_DAILY_MEDIAN_BAND = """WITH p AS (
  SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
         CAST(FLOOR(value * 100) AS BIGINT) AS c
  FROM events WHERE ts IS NOT NULL AND NOT isnan(value)),
h AS (SELECT day, c, COUNT(*) AS n FROM p GROUP BY day, c),
cdf AS (SELECT day, c,
          SUM(n) OVER (PARTITION BY day ORDER BY c) AS cum,
          SUM(n) OVER (PARTITION BY day) AS total
        FROM h)
SELECT day,
  CAST(MIN(CASE WHEN cum >= CEIL(0.1 * total) THEN c END) AS BIGINT)
    AS p10,
  CAST(MIN(CASE WHEN cum >= CEIL(0.5 * total) THEN c END) AS BIGINT)
    AS p50,
  CAST(MIN(CASE WHEN cum >= CEIL(0.9 * total) THEN c END) AS BIGINT)
    AS p90
FROM cdf GROUP BY day"""


def q_type_run_lengths(sf_dir: str):
    """Run-length distribution of REPEATED event types: how often a
    user emits the same type k times in a row ((ts, event_id) order) —
    the repetition/bot-signal histogram. The shared lexsort scaffold
    partitions on (user, type-code): a run break is a user OR type
    change; per-bucket reduceat sizes the runs and pre-reduces to
    (length, count) partials."""
    import numpy as np

    n_buckets = adaptive_buckets(_nrows(sf_dir, "events"))

    def tag(t: pa.Table) -> pa.Table:
        sub = pa.table({"u": t.column("user_id"),
                        "ts": pc.cast(t.column("ts"), pa.int64()),
                        "eid": t.column("event_id"),
                        "et": t.column("event_type")}) \
            .filter(pc.and_(pc.is_valid(t.column("user_id")),
                            pc.is_valid(t.column("ts"))))
        return sub.append_column("bucket", int_bucket(sub.column("u"),
                                                      n_buckets))

    def grp(g: pa.Table) -> pa.Table:
        u = g.column("u").to_numpy(zero_copy_only=False)
        ts = g.column("ts").to_numpy(zero_copy_only=False)
        eid = g.column("eid").to_numpy(zero_copy_only=False)
        enc = pc.dictionary_encode(g.column("et").combine_chunks())
        tc = pc.fill_null(enc.indices, -1) \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        # ORDER stays (u, ts, eid); runs break on user OR type change
        order, new_user, _ = _lag_scaffold([u], ts, eid)
        tcs = tc[order]
        brk = new_user.copy()
        brk[1:] |= tcs[1:] != tcs[:-1]
        starts = np.flatnonzero(brk)
        sizes = np.diff(np.append(starts, len(order)))
        uniq, counts = np.unique(sizes, return_counts=True)
        return pa.table({"run_len": pa.array(uniq, pa.int64()),
                         "n_runs": pa.array(counts.astype(np.int64),
                                            pa.int64())})

    small = _read(sf_dir, "events",
                  ["event_id", "user_id", "ts", "event_type"]) \
        .map_batches(tag, batch_format="pyarrow") \
        .groupby("bucket").map_groups(grp, batch_format="pyarrow")
    return _combine_partials(small, ["run_len"], {"n_runs": "n_runs"})


SQL_TYPE_RUN_LENGTHS = """WITH o AS (
  SELECT user_id, ts, event_id,
    CASE WHEN LAG(event_type) OVER w IS DISTINCT FROM event_type
         THEN 1 ELSE 0 END AS brk
  FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
r AS (SELECT user_id,
        SUM(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
                       ROWS UNBOUNDED PRECEDING) AS rid
      FROM o),
c AS (SELECT CAST(COUNT(*) AS BIGINT) AS run_len
      FROM r GROUP BY user_id, rid)
SELECT run_len, CAST(COUNT(*) AS BIGINT) AS n_runs
FROM c GROUP BY run_len"""


def q_daily_peak_share(sf_dir: str):
    """Traffic-concentration series: per day, the busiest hour's count
    and the day total (the caller's ratio = how peaked the day is) —
    exact ints from one (day, hour)→count partial fold, bounded by
    days × 24; argmax + totals are driver arithmetic."""
    import numpy as np

    def partial(t: pa.Table) -> pa.Table:
        ok = pc.is_valid(t.column("ts"))
        sub = pa.table({
            "day": pc.cast(pc.floor_temporal(t.column("ts"),
                                             unit="day"),
                           pa.timestamp("us")),
            "hour": pc.cast(pc.hour(t.column("ts")), pa.int64()),
        }).filter(ok)
        g = sub.group_by(["day", "hour"]).aggregate([("hour", "count")])
        return pa.table({"day": g.column("day"),
                         "hour": g.column("hour"),
                         "n": pc.cast(g.column("hour_count"),
                                      pa.int64())})

    comb = _combine_partials(
        _read(sf_dir, "events", ["ts"])
        .map_batches(partial, batch_format="pyarrow"),
        ["day", "hour"], {"n": "n"})
    day = pc.cast(comb.column("day"), pa.int64()) \
        .to_numpy(zero_copy_only=False)
    hour = comb.column("hour").to_numpy(zero_copy_only=False)
    n = comb.column("n").to_numpy(zero_copy_only=False)
    order = np.lexsort((hour, -n, day))
    ds, hs, ns = day[order], hour[order], n[order]
    sel = np.flatnonzero(np.append(True, ds[1:] != ds[:-1]))
    totals = {}
    for d, c in zip(day, n):
        totals[int(d)] = totals.get(int(d), 0) + int(c)
    return pa.table({
        "day": pa.array(ds[sel], pa.int64()).cast(pa.timestamp("us")),
        "peak_hour": pa.array(hs[sel], pa.int64()),
        "peak_n": pa.array(ns[sel], pa.int64()),
        "day_total": pa.array([totals[int(d)] for d in ds[sel]],
                              pa.int64())})


SQL_DAILY_PEAK_SHARE = """WITH h AS (
  SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
         CAST(EXTRACT(hour FROM ts) AS BIGINT) AS hour,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM events WHERE ts IS NOT NULL GROUP BY day, hour),
r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY day
        ORDER BY n DESC, hour) AS rk,
        SUM(n) OVER (PARTITION BY day) AS tot FROM h)
SELECT day, hour AS peak_hour, n AS peak_n,
       CAST(tot AS BIGINT) AS day_total
FROM r WHERE rk = 1"""


def q_container_profile(sf_dir: str):
    """Dimension-table profile: per part brand, part count, total size
    and exact retail-price cents — the catalog-coverage report (adds
    the part table to the star schema's covered surface). Pure
    partial-aggregate fold; brands bound the combine."""
    import numpy as np

    def partial(t: pa.Table) -> pa.Table:
        v = t.column("p_retailprice").to_numpy(zero_copy_only=False)
        part = pa.table({
            "p_brand": t.column("p_brand"),
            "sz": pc.cast(t.column("p_size"), pa.int64()),
            "cents": pa.array(np.floor(v * 100.0).astype(np.int64),
                              pa.int64()),
            "one": pa.array(np.ones(t.num_rows, np.int64), pa.int64())})
        g = part.group_by("p_brand").aggregate(
            [("one", "sum"), ("sz", "sum"), ("cents", "sum")])
        return pa.table({"p_brand": g.column("p_brand"),
                         "n_parts": g.column("one_sum"),
                         "total_size": g.column("sz_sum"),
                         "retail_cents": g.column("cents_sum")})

    return _combine_partials(
        _read_dim(sf_dir, "part", ["p_brand", "p_size",
                                   "p_retailprice"])
        .map_batches(partial, batch_format="pyarrow"),
        ["p_brand"], {"n_parts": "n_parts", "total_size": "total_size",
                      "retail_cents": "retail_cents"})


SQL_CONTAINER_PROFILE = """
SELECT p_brand, CAST(COUNT(*) AS BIGINT) AS n_parts,
       CAST(SUM(p_size) AS BIGINT) AS total_size,
       CAST(SUM(CAST(FLOOR(p_retailprice * 100) AS BIGINT)) AS BIGINT)
         AS retail_cents
FROM part GROUP BY p_brand"""


def q_first_week_value(sf_dir: str):
    """First-week cohort value: per user, the exact cents total of
    events within 7 days of THEIR OWN first event (inclusive start,
    exclusive +7d) — the early-LTV metric cohort analyses anchor on.
    Self-referential window (each row's predicate depends on the
    user's MIN ts), so one user-bucket shuffle co-locates users; the
    kernel reads each run's first timestamp once and masks — no second
    pass, no join."""
    import numpy as np

    WEEK = 7 * 86_400_000_000
    n_buckets = adaptive_buckets(_nrows(sf_dir, "events"))

    def tag(t: pa.Table) -> pa.Table:
        v = t.column("value").to_numpy(zero_copy_only=False)
        sub = pa.table({"u": t.column("user_id"),
                        "ts": pc.cast(t.column("ts"), pa.int64()),
                        "eid": t.column("event_id"),
                        "cents": pa.array(np.where(
                            np.isnan(v), 0,
                            np.floor(v * 100.0)).astype(np.int64),
                            pa.int64())}) \
            .filter(pc.and_(pc.is_valid(t.column("user_id")),
                            pc.is_valid(t.column("ts"))))
        return sub.append_column("bucket", int_bucket(sub.column("u"),
                                                      n_buckets))

    def grp(g: pa.Table) -> pa.Table:
        u = g.column("u").to_numpy(zero_copy_only=False)
        ts = g.column("ts").to_numpy(zero_copy_only=False)
        eid = g.column("eid").to_numpy(zero_copy_only=False)
        cents = g.column("cents").to_numpy(zero_copy_only=False)
        order, new_run, _ = _lag_scaffold([u], ts, eid)
        starts = np.flatnonzero(new_run)
        lens = np.diff(np.append(starts, len(order)))
        tss = ts[order]
        first = np.repeat(tss[starts], lens)
        inwk = tss < first + WEEK
        c = np.where(inwk, cents[order], 0)
        sums = np.add.reduceat(c, starts)
        return pa.table({
            "user_id": pa.array(u[order][starts], pa.int64()),
            "first_week_cents": pa.array(sums, pa.int64())})

    return _read(sf_dir, "events",
                 ["event_id", "user_id", "ts", "value"]) \
        .map_batches(tag, batch_format="pyarrow") \
        .groupby("bucket").map_groups(grp, batch_format="pyarrow")


SQL_FIRST_WEEK_VALUE = """WITH p AS (
  SELECT user_id, ts,
    CASE WHEN isnan(value) THEN 0
         ELSE CAST(FLOOR(value * 100) AS BIGINT) END AS cents,
    MIN(ts) OVER (PARTITION BY user_id) AS first_ts
  FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL)
SELECT user_id,
  CAST(SUM(CASE WHEN epoch_us(ts) < epoch_us(first_ts)
                     + 7 * 86400000000 THEN cents ELSE 0 END)
       AS BIGINT) AS first_week_cents
FROM p GROUP BY user_id"""


def q_nation_customer_profile(sf_dir: str):
    """Snowflake-dimension profile: customers per NATION NAME with the
    exact account-balance cents total — nation (tiny) broadcasts into
    the stage closure, customers fold as fixed-width partials; no
    shuffle anywhere."""
    import numpy as np

    nat = pq.read_table(f"{sf_dir}/nation.parquet",
                        columns=["n_nationkey", "n_name"])
    name_of = dict(zip(nat.column("n_nationkey").to_pylist(),
                       nat.column("n_name").to_pylist()))

    def partial(t: pa.Table) -> pa.Table:
        v = t.column("c_acctbal").to_numpy(zero_copy_only=False)
        names = [name_of.get(k) for k in
                 t.column("c_nationkey").to_pylist()]
        part = pa.table({
            "n_name": pa.array(names, pa.string()),
            "cents": pa.array(np.floor(v * 100.0).astype(np.int64),
                              pa.int64()),
            "one": pa.array(np.ones(t.num_rows, np.int64), pa.int64())})
        g = part.group_by("n_name").aggregate(
            [("one", "sum"), ("cents", "sum")])
        return pa.table({"n_name": g.column("n_name"),
                         "n_customers": g.column("one_sum"),
                         "acctbal_cents": g.column("cents_sum")})

    return _combine_partials(
        _read_dim(sf_dir, "customer", ["c_nationkey", "c_acctbal"])
        .map_batches(partial, batch_format="pyarrow"),
        ["n_name"], {"n_customers": "n_customers",
                     "acctbal_cents": "acctbal_cents"})


SQL_NATION_CUSTOMER_PROFILE = """
SELECT n.n_name, CAST(COUNT(*) AS BIGINT) AS n_customers,
       CAST(SUM(CAST(FLOOR(c.c_acctbal * 100) AS BIGINT)) AS BIGINT)
         AS acctbal_cents
FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
GROUP BY n.n_name"""


def q_priority_mix_by_year(sf_dir: str):
    """Order-priority mix over time: per (year, priority) the order
    count plus the year total — the workload-mix drift table; exact
    ints from one fixed-width partial fold (years × priorities)."""
    import numpy as np

    def partial(t: pa.Table) -> pa.Table:
        ok = pc.is_valid(t.column("o_orderdate"))
        sub = pa.table({
            "yr": pc.cast(pc.year(t.column("o_orderdate")), pa.int64()),
            "pri": t.column("o_orderpriority")}).filter(ok)
        g = sub.group_by(["yr", "pri"]).aggregate([("yr", "count")])
        return pa.table({"yr": g.column("yr"), "pri": g.column("pri"),
                         "n": pc.cast(g.column("yr_count"),
                                      pa.int64())})

    comb = _combine_partials(
        _read(sf_dir, "orders", ["o_orderdate", "o_orderpriority"])
        .map_batches(partial, batch_format="pyarrow"),
        ["yr", "pri"], {"n": "n"})
    yr = comb.column("yr").to_numpy(zero_copy_only=False)
    n = comb.column("n").to_numpy(zero_copy_only=False)
    tot: dict = {}
    for y, c in zip(yr, n):
        tot[int(y)] = tot.get(int(y), 0) + int(c)
    return pa.table({
        "yr": comb.column("yr"), "pri": comb.column("pri"),
        "n": comb.column("n"),
        "year_total": pa.array([tot[int(y)] for y in yr], pa.int64())})


SQL_PRIORITY_MIX_BY_YEAR = """WITH h AS (
  SELECT CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS yr,
         o_orderpriority AS pri, CAST(COUNT(*) AS BIGINT) AS n
  FROM orders WHERE o_orderdate IS NOT NULL GROUP BY yr, pri)
SELECT yr, pri, n,
  CAST(SUM(n) OVER (PARTITION BY yr) AS BIGINT) AS year_total
FROM h"""


def q_caller_error_rate(sf_dir: str):
    """Flagship parse analytics: per CALLER (the dissect-extracted
    ``caller=X.go`` field), total parseable log lines and how many are
    ``level=error`` — the error-rate-by-component report a log
    pipeline exists to produce. One vectorized ``extract_regex`` per
    batch over the flagship tokenizer's anchored pattern (non-matching
    lines — broken/JSON turns — drop exactly like dissect's miss
    path), pre-reduced to (caller, n, n_error) partials."""

    # arrow extract_regex requires NAMED groups; same pattern as the
    # SQL's numbered-group regexp_extract
    pattern = ('^level=(?P<lvl>[^ ]*) ts=(?P<ts>[^ ]*) '
               'caller=(?P<caller>[^ ]*) msg="(?P<msg>.*)"$')

    def partial(t: pa.Table) -> pa.Table:
        m = pc.extract_regex(t.column("text"), pattern)
        ok = pc.is_valid(m)
        lvl = pc.struct_field(m, "lvl")
        caller = pc.struct_field(m, "caller")
        part = pa.table({
            "caller": caller,
            "err": pc.cast(pc.fill_null(pc.equal(lvl, "error"), False),
                           pa.int64()),
            "one": pa.array([1] * t.num_rows, pa.int64())}).filter(ok)
        g = part.group_by("caller").aggregate(
            [("one", "sum"), ("err", "sum")])
        return pa.table({"caller": g.column("caller"),
                         "n_lines": g.column("one_sum"),
                         "n_error": g.column("err_sum")})

    return _combine_partials(
        read_transcripts(sf_dir)
        .map_batches(partial, batch_format="pyarrow"),
        ["caller"], {"n_lines": "n_lines", "n_error": "n_error"})


SQL_CALLER_ERROR_RATE = f"""{_T},
m AS (SELECT regexp_extract(text, '{RE}', 1) AS lvl,
             regexp_extract(text, '{RE}', 3) AS caller
      FROM transcripts WHERE regexp_matches(text, '{RE}'))
SELECT caller, CAST(COUNT(*) AS BIGINT) AS n_lines,
       CAST(SUM(CASE WHEN lvl = 'error' THEN 1 ELSE 0 END) AS BIGINT)
         AS n_error
FROM m GROUP BY caller"""


def q_weekend_ks(sf_dir: str):
    """Temporal drift gate: the exact KS statistic between WEEKDAY and
    WEEKEND value distributions (all types) — "does weekend traffic
    carry different values", the calendar-seasonality twin of
    ks_statistic's type drift. Same histogram-partials shape and the
    shared `_ks_exact` fold; the side is dow ∈ {0,6} (Sunday-0
    convention on both engines)."""
    import numpy as np

    def partial(t: pa.Table) -> pa.Table:
        v = t.column("value").to_numpy(zero_copy_only=False)
        ok = ~np.isnan(v) & pc.is_valid(t.column("ts")) \
            .to_numpy(zero_copy_only=False)
        dow = pc.cast(pc.day_of_week(t.column("ts"),
                                     count_from_zero=True,
                                     week_start=7), pa.int64()) \
            .to_numpy(zero_copy_only=False)[ok]
        side = np.where((dow == 0) | (dow == 6), 1, 0)
        part = pa.table({
            "side": pa.array(side.astype(np.int64), pa.int64()),
            "cents": pa.array(np.floor(v[ok] * 100).astype(np.int64),
                              pa.int64()),
            "n": pa.array(np.ones(int(ok.sum()), np.int64),
                          pa.int64())})
        g = part.group_by(["side", "cents"]).aggregate([("n", "sum")])
        return pa.table({"side": g.column("side"),
                         "cents": g.column("cents"),
                         "n": g.column("n_sum")})

    h = _combine_partials(
        _read(sf_dir, "events", ["ts", "value"])
        .map_batches(partial, batch_format="pyarrow"),
        ["side", "cents"], {"n": "n"})
    ta, tb, mx, at = _ks_exact(h)
    return pa.table({"n_weekday": pa.array([ta], pa.int64()),
                     "n_weekend": pa.array([tb], pa.int64()),
                     "ks_num": pa.array([mx], pa.int64()),
                     "at_cents": pa.array([at], pa.int64())})


SQL_WEEKEND_KS = """WITH p AS (
  SELECT CASE WHEN dayofweek(ts) IN (0, 6) THEN 1 ELSE 0 END AS s,
         CAST(FLOOR(value * 100) AS BIGINT) AS c
  FROM events WHERE ts IS NOT NULL AND NOT isnan(value)),
h AS (SELECT c, COUNT(*) FILTER (WHERE s = 0) AS na,
             COUNT(*) FILTER (WHERE s = 1) AS nb
      FROM p GROUP BY c),
tot AS (SELECT SUM(na) AS ta, SUM(nb) AS tb FROM h),
cum AS (SELECT c, SUM(na) OVER (ORDER BY c) AS ca,
               SUM(nb) OVER (ORDER BY c) AS cb FROM h),
d AS (SELECT c, ABS(ca * (SELECT tb FROM tot)
                    - cb * (SELECT ta FROM tot)) AS gap FROM cum)
SELECT CAST((SELECT ta FROM tot) AS BIGINT) AS n_weekday,
       CAST((SELECT tb FROM tot) AS BIGINT) AS n_weekend,
       CAST(MAX(gap) AS BIGINT) AS ks_num,
       CAST(MIN(CASE WHEN gap = (SELECT MAX(gap) FROM d) THEN c END)
            AS BIGINT) AS at_cents
FROM d"""


def q_first_response_lag(sf_dir: str):
    """Flagship time-to-first-response: per conversation, the µs
    between the FIRST user turn and the first assistant turn AFTER it
    (turn_idx order; conversations without that pair are excluded) —
    the latency SLA of a conversational system. One conv-bucket
    shuffle; the kernel takes per-run minima over masked turn indices,
    no join."""
    import numpy as np

    n_buckets = adaptive_buckets(2 * _nrows(sf_dir, "events"))

    def add_bucket(tbl: pa.Table) -> pa.Table:
        return tbl.append_column(
            "bucket", fnv1a_bucket(tbl.column("conv_id"), n_buckets))

    def grp(g: pa.Table) -> pa.Table:
        conv_arr = g.column("conv_id").combine_chunks()
        enc = pc.dictionary_encode(conv_arr)
        conv = enc.indices.to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        ti = g.column("turn_idx").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        ts = pc.cast(g.column("ts"), pa.int64()) \
            .to_numpy(zero_copy_only=False)
        role = np.asarray(g.column("role").to_pylist(), object)
        order = np.lexsort((ti, conv))
        cs, tis, tss = conv[order], ti[order], ts[order]
        ro = role[order]
        new_run = np.append(True, cs[1:] != cs[:-1])
        starts = np.flatnonzero(new_run)
        lens = np.diff(np.append(starts, len(cs)))
        seg = np.repeat(np.arange(len(starts)), lens)
        BIG = np.int64(1) << 62
        u_ti = np.where(ro == "user", tis, BIG)
        # first user turn per conv (by turn_idx)
        first_user = np.minimum.reduceat(u_ti, starts)
        fu = first_user[seg]
        a_ok = (ro == "assistant") & (tis > fu)
        a_ti = np.where(a_ok, tis, BIG)
        first_asst = np.minimum.reduceat(a_ti, starts)
        has = (first_user < BIG) & (first_asst < BIG)
        # gather the ts of those two turns: positions via searchsorted
        # inside each run over the sorted turn_idx
        out_conv, out_lag = [], []
        run_ids = np.flatnonzero(has)
        for r in run_ids:
            s, ln = starts[r], lens[r]
            iu = s + np.searchsorted(tis[s:s + ln], first_user[r])
            ia = s + np.searchsorted(tis[s:s + ln], first_asst[r])
            out_conv.append(r)
            out_lag.append(int(tss[ia] - tss[iu]))
        dict_vals = enc.dictionary
        conv_ids = pc.take(
            dict_vals, pa.array(cs[starts[run_ids]], pa.int64()))
        return pa.table({
            "conv_id": conv_ids,
            "lag_us": pa.array(out_lag, pa.int64())})

    return read_transcripts(sf_dir) \
        .map_batches(add_bucket, batch_format="pyarrow") \
        .groupby("bucket").map_groups(grp, batch_format="pyarrow")


SQL_FIRST_RESPONSE_LAG = f"""{_T},
fu AS (SELECT conv_id, MIN(turn_idx) AS uturn
       FROM transcripts WHERE role = 'user' GROUP BY conv_id),
fa AS (SELECT t.conv_id, MIN(t.turn_idx) AS aturn
       FROM transcripts t JOIN fu ON t.conv_id = fu.conv_id
       WHERE t.role = 'assistant' AND t.turn_idx > fu.uturn
       GROUP BY t.conv_id),
j AS (SELECT fu.conv_id, uturn, aturn FROM fu JOIN fa
      ON fu.conv_id = fa.conv_id)
SELECT j.conv_id, epoch_us(ta.ts) - epoch_us(tu.ts) AS lag_us
FROM j
JOIN transcripts tu ON tu.conv_id = j.conv_id
  AND tu.turn_idx = j.uturn
JOIN transcripts ta ON ta.conv_id = j.conv_id
  AND ta.turn_idx = j.aturn"""


def q_vocab_growth(sf_dir: str):
    """Vocabulary-growth (Heaps-law) curve: per doc_id, how many tokens
    make their GLOBAL first appearance there, with the running
    cumulative in doc order — the corpus-diversity diagnostic behind
    "is more data still adding vocabulary". First occurrence = MIN over
    an all-to-all, so one token-hash shuffle folds (token, min doc)
    exactly; the per-bucket kernel pre-reduces to a (first_doc, n_new)
    histogram. Docs with zero new tokens are absent (their cumulative
    equals the previous row's). The final cumulative folds driver-side
    over ≤ one row per contributing doc — past ~1e7 docs the same
    monotone doc-range prefix-sum shape as global_running_sum takes
    over (documented, not needed at current scale)."""
    import numpy as np

    from .textops.analysis import flat_tokens

    n_buckets = adaptive_buckets(_nrows(sf_dir, "documents") * 100)

    def tag(t: pa.Table) -> pa.Table:
        row_id, toks, _ = flat_tokens(t.column("text"))
        docs = t.column("doc_id").to_numpy(zero_copy_only=False)[row_id]
        part = pa.table({"token": toks,
                         "doc": pa.array(docs, pa.int64())}) \
            .group_by("token").aggregate([("doc", "min")])
        out = pa.table({"token": part.column("token"),
                        "doc": part.column("doc_min")})
        return out.append_column(
            "bucket", fnv1a_bucket(out.column("token"), n_buckets))

    def grp(g: pa.Table) -> pa.Table:
        f = g.group_by("token").aggregate([("doc", "min")])
        first = f.column("doc_min").to_numpy(zero_copy_only=False)
        uniq, counts = np.unique(first, return_counts=True)
        return pa.table({"doc_id": pa.array(uniq, pa.int64()),
                         "n_new": pa.array(counts.astype(np.int64),
                                           pa.int64())})

    comb = _combine_partials(
        _read(sf_dir, "documents", ["doc_id", "text"], blocks=16)
        .map_batches(tag, batch_format="pyarrow")
        .groupby("bucket").map_groups(grp, batch_format="pyarrow"),
        ["doc_id"], {"n_new": "n_new"})
    doc = comb.column("doc_id").to_numpy(zero_copy_only=False)
    n_new = comb.column("n_new").to_numpy(zero_copy_only=False)
    order = np.argsort(doc)
    return pa.table({
        "doc_id": pa.array(doc[order], pa.int64()),
        "n_new": pa.array(n_new[order], pa.int64()),
        "cum_new": pa.array(np.cumsum(n_new[order]), pa.int64())})


SQL_VOCAB_GROWTH = r"""WITH toks AS (
  SELECT doc_id,
    unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS token
  FROM documents),
f AS (SELECT token, MIN(doc_id) AS first_doc FROM toks GROUP BY token),
h AS (SELECT first_doc AS doc_id, CAST(COUNT(*) AS BIGINT) AS n_new
      FROM f GROUP BY first_doc)
SELECT doc_id, n_new,
  CAST(SUM(n_new) OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING)
       AS BIGINT) AS cum_new
FROM h"""


def q_top_bigram_per_source(sf_dir: str):
    """Grouped n-gram argmax: each source's most frequent bigram (ties
    to the smallest bigram) with its count — the per-domain
    boilerplate signature. Bigram-hash bucketing co-locates every
    (source, bigram) pair's partial counts (same bigram → same
    bucket), each bucket emits one candidate per source, and the tiny
    driver fold picks winners over buckets × sources rows — the
    top_user_per_type shape over text n-grams."""
    import numpy as np

    from .textops.analysis import flat_tokens

    n_buckets = adaptive_buckets(_nrows(sf_dir, "documents") * 100)

    def tag(t: pa.Table) -> pa.Table:
        row_id, toks, _ = flat_tokens(t.column("text"))
        tok = np.asarray(toks.to_pylist(), object)
        src = np.asarray(t.column("source").to_pylist(),
                         object)[row_id]
        adj = row_id[1:] == row_id[:-1]
        big = np.array([a + " " + b for a, b in
                        zip(tok[:-1][adj], tok[1:][adj])], object) \
            if adj.any() else np.array([], object)
        part = pa.table({
            "source": pa.array(src[:-1][adj].tolist() if len(big)
                               else [], pa.string()),
            "bigram": pa.array(big.tolist(), pa.string()),
            "one": pa.array(np.ones(len(big), np.int64), pa.int64())})
        g = part.group_by(["source", "bigram"]).aggregate(
            [("one", "sum")])
        out = pa.table({"source": g.column("source"),
                        "bigram": g.column("bigram"),
                        "n": g.column("one_sum")})
        return out.append_column(
            "bucket", fnv1a_bucket(out.column("bigram"), n_buckets))

    def grp(g: pa.Table) -> pa.Table:
        f = g.group_by(["source", "bigram"]).aggregate([("n", "sum")])
        src = np.asarray(f.column("source").to_pylist(), object)
        big = np.asarray(f.column("bigram").to_pylist(), object)
        n = f.column("n_sum").to_numpy(zero_copy_only=False)
        order = np.lexsort((big.astype("U"), -n, src.astype("U")))
        ss = src[order]
        sel = order[np.flatnonzero(np.append(True, ss[1:] != ss[:-1]))]
        return pa.table({
            "source": pa.array(src[sel].tolist(), pa.string()),
            "bigram": pa.array(big[sel].tolist(), pa.string()),
            "n": pa.array(n[sel], pa.int64())})

    cand = pa.concat_tables(list(
        _read(sf_dir, "documents", ["source", "text"], blocks=16)
        .map_batches(tag, batch_format="pyarrow")
        .groupby("bucket").map_groups(grp, batch_format="pyarrow")
        .iter_batches(batch_size=None, batch_format="pyarrow")),
        promote_options="default")
    src = np.asarray(cand.column("source").to_pylist(), object)
    big = np.asarray(cand.column("bigram").to_pylist(), object)
    n = cand.column("n").to_numpy(zero_copy_only=False)
    order = np.lexsort((big.astype("U"), -n, src.astype("U")))
    ss = src[order]
    sel = order[np.flatnonzero(np.append(True, ss[1:] != ss[:-1]))]
    return pa.table({
        "source": pa.array(src[sel].tolist(), pa.string()),
        "bigram": pa.array(big[sel].tolist(), pa.string()),
        "n": pa.array(n[sel], pa.int64())})


SQL_TOP_BIGRAM_PER_SOURCE = r"""WITH t AS (
  SELECT source, regexp_extract_all(lower(text), '[a-z0-9]+') AS toks
  FROM documents),
b AS (SELECT source, unnest(list_transform(
        generate_series(1, greatest(len(toks) - 1, 0)),
        i -> toks[i] || ' ' || toks[i + 1])) AS bigram FROM t),
c AS (SELECT source, bigram, CAST(COUNT(*) AS BIGINT) AS n
      FROM b GROUP BY source, bigram),
r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY source
        ORDER BY n DESC, bigram) AS rk FROM c)
SELECT source, bigram, n FROM r WHERE rk = 1"""


def q_order_cadence(sf_dir: str):
    """Customer order cadence: full-day gaps between a customer's
    CONSECUTIVE orders (o_orderdate, o_orderkey order), histogrammed —
    the purchase-rhythm distribution behind replenishment forecasting.
    The repurchase_gaps shape on the ORDERS fact: one customer-bucket
    shuffle, shared LAG scaffold, (days, count) partials."""
    import numpy as np

    DAY = 86_400_000_000
    n_buckets = adaptive_buckets(_nrows(sf_dir, "orders"))

    def tag(t: pa.Table) -> pa.Table:
        sub = pa.table({"u": t.column("o_custkey"),
                        "ts": pc.cast(t.column("o_orderdate"),
                                      pa.int64()),
                        "eid": t.column("o_orderkey")}) \
            .filter(pc.and_(pc.is_valid(t.column("o_custkey")),
                            pc.is_valid(t.column("o_orderdate"))))
        return sub.append_column("bucket", int_bucket(sub.column("u"),
                                                      n_buckets))

    def grp(g: pa.Table) -> pa.Table:
        u = g.column("u").to_numpy(zero_copy_only=False)
        ts = g.column("ts").to_numpy(zero_copy_only=False)
        eid = g.column("eid").to_numpy(zero_copy_only=False)
        order, new_run, gap = _lag_scaffold([u], ts, eid)
        days = gap[~new_run] // DAY
        uniq, counts = np.unique(days, return_counts=True)
        return pa.table({"days": pa.array(uniq, pa.int64()),
                         "n": pa.array(counts.astype(np.int64),
                                       pa.int64())})

    small = _read(sf_dir, "orders",
                  ["o_orderkey", "o_custkey", "o_orderdate"]) \
        .map_batches(tag, batch_format="pyarrow") \
        .groupby("bucket").map_groups(grp, batch_format="pyarrow")
    return _combine_partials(small, ["days"], {"n": "n"})


SQL_ORDER_CADENCE = """WITH g AS (
  SELECT (epoch_us(o_orderdate) - LAG(epoch_us(o_orderdate)) OVER (
      PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey))
      // 86400000000 AS days
  FROM orders
  WHERE o_custkey IS NOT NULL AND o_orderdate IS NOT NULL)
SELECT CAST(days AS BIGINT) AS days, CAST(COUNT(*) AS BIGINT) AS n
FROM g WHERE days IS NOT NULL GROUP BY days"""


def q_extreme_vectors(sf_dir: str):
    """Embedding outlier retrieval: the 10 vectors with the LARGEST
    exact quantized squared L2 norm (ties to the smallest vec_id) —
    the magnitude-outlier sweep run before normalization. Norms come
    from the zero-copy flat values + offsets reduceat (never a
    row-per-dimension explode); each batch keeps its local top 10, the
    driver folds blocks × 10 candidates. Quantization (×1e6 floor per
    component, then integer squares) keeps the score int64-exact
    cross-engine."""
    import numpy as np

    def partial(t: pa.Table) -> pa.Table:
        col = t.column("embedding")
        col = col.combine_chunks() if isinstance(col, pa.ChunkedArray) \
            else col
        offs = col.offsets.to_numpy(zero_copy_only=False)
        flat = pc.cast(col.flatten(), pa.float64()) \
            .to_numpy(zero_copy_only=False)
        q = np.floor(flat * 1_000_000.0).astype(np.int64)
        lens = np.diff(offs)
        nonempty = lens > 0
        starts_rel = (offs[:-1] - offs[0])[nonempty]
        sq = np.add.reduceat(q * q, starts_rel) if nonempty.any() \
            else np.array([], np.int64)
        vid = t.column("vec_id").to_numpy(
            zero_copy_only=False)[nonempty]
        order = np.lexsort((vid, -sq))[:10]
        return pa.table({"vec_id": pa.array(vid[order], pa.int64()),
                         "norm_sq_q": pa.array(sq[order], pa.int64())})

    cand = pa.concat_tables(list(
        _read_dim(sf_dir, "embeddings", ["vec_id", "embedding"])
        .map_batches(partial, batch_format="pyarrow")
        .iter_batches(batch_size=None, batch_format="pyarrow")),
        promote_options="default")
    vid = cand.column("vec_id").to_numpy(zero_copy_only=False)
    sq = cand.column("norm_sq_q").to_numpy(zero_copy_only=False)
    order = np.lexsort((vid, -sq))[:10]
    return pa.table({"vec_id": pa.array(vid[order], pa.int64()),
                     "norm_sq_q": pa.array(sq[order], pa.int64())})


SQL_EXTREME_VECTORS = """WITH u AS (
  SELECT vec_id,
         CAST(FLOOR(CAST(unnest(embedding) AS DOUBLE) * 1000000)
              AS BIGINT) AS qv
  FROM embeddings),
n AS (SELECT vec_id, CAST(SUM(qv * qv) AS BIGINT) AS norm_sq_q
      FROM u GROUP BY vec_id)
SELECT vec_id, norm_sq_q FROM n
ORDER BY norm_sq_q DESC, vec_id LIMIT 10"""


def q_tool_switches(sf_dir: str):
    """Flagship tool-churn histogram: per conversation, how many
    ADJACENT turn pairs (turn_idx order) change tool — 0 means one
    tool end-to-end; high counts flag thrashing agents. One
    conv-bucket shuffle; the kernel counts boundary changes per run
    and pre-reduces to (n_switches, n_convs) partials."""
    import numpy as np

    n_buckets = adaptive_buckets(2 * _nrows(sf_dir, "events"))

    def add_bucket(tbl: pa.Table) -> pa.Table:
        return tbl.append_column(
            "bucket", fnv1a_bucket(tbl.column("conv_id"), n_buckets))

    def grp(g: pa.Table) -> pa.Table:
        conv = pc.dictionary_encode(g.column("conv_id")
                                    .combine_chunks()).indices \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        ti = g.column("turn_idx").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        tool = pc.dictionary_encode(g.column("tool").combine_chunks())
        tc = pc.fill_null(tool.indices, -1) \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.lexsort((ti, conv))
        cs, ts_ = conv[order], tc[order]
        same_conv = cs[1:] == cs[:-1]
        switch = same_conv & (ts_[1:] != ts_[:-1])
        # per-conv switch count: segmented sum over run boundaries
        starts = np.flatnonzero(np.append(True, ~same_conv))
        sw = np.zeros(len(cs), np.int64)
        sw[1:][switch] = 1
        per_conv = np.add.reduceat(sw, starts) if len(starts) \
            else np.array([], np.int64)
        uniq, counts = np.unique(per_conv, return_counts=True)
        return pa.table({"n_switches": pa.array(uniq, pa.int64()),
                         "n_convs": pa.array(counts.astype(np.int64),
                                             pa.int64())})

    small = read_transcripts(sf_dir) \
        .map_batches(add_bucket, batch_format="pyarrow") \
        .groupby("bucket").map_groups(grp, batch_format="pyarrow")
    return _combine_partials(small, ["n_switches"],
                             {"n_convs": "n_convs"})


SQL_TOOL_SWITCHES = f"""{_T},
o AS (SELECT conv_id,
        CASE WHEN LAG(tool) OVER (PARTITION BY conv_id
               ORDER BY turn_idx) IS DISTINCT FROM tool
             AND LAG(tool) OVER (PARTITION BY conv_id
               ORDER BY turn_idx) IS NOT NULL
          THEN 1 ELSE 0 END AS sw
      FROM transcripts),
c AS (SELECT conv_id, CAST(SUM(sw) AS BIGINT) AS n_switches
      FROM o GROUP BY conv_id)
SELECT n_switches, CAST(COUNT(*) AS BIGINT) AS n_convs
FROM c GROUP BY n_switches"""


def q_props_value_histogram(sf_dir: str):
    """Processor→aggregate composition: run the real
    ``decode_json_fields`` chain over ``props``, then histogram the
    decoded integer ``k`` — proving the Beats-processor surface feeds
    distributed aggregation directly (decode stays vectorized per
    batch, the histogram folds fixed-width partials)."""
    chain = build_chain([{"decode_json_fields": {
        "fields": ["props"], "target": "", "expected_keys": ["k:int"]}}])

    def partial(tbl: pa.Table) -> pa.Table:
        t = chain(tbl)
        k = t.column("k")
        g = pa.table({"k": k}).filter(pc.is_valid(k)) \
            .group_by("k").aggregate([("k", "count")])
        return pa.table({"k": g.column("k"),
                         "n": pc.cast(g.column("k_count"), pa.int64())})

    return _combine_partials(
        _read(sf_dir, "events", ["props"])
        .map_batches(partial, batch_format="pyarrow"),
        ["k"], {"n": "n"})


SQL_PROPS_VALUE_HISTOGRAM = """WITH d AS (
  SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
  FROM events)
SELECT k, CAST(COUNT(*) AS BIGINT) AS n
FROM d WHERE k IS NOT NULL GROUP BY k"""


def q_conv_token_budget(sf_dir: str):
    """Context-window budgeting over the flagship transcripts: per
    conversation, the total ``[a-z0-9]+`` token count of all its turns
    and whether it exceeds the 4096-token window — the pre-pack
    gating decision of an LLM training pipeline. Per-batch tokens
    count vectorized (one list-length pass, no per-row python), then
    ONE conv-bucket shuffle folds per-conv sums."""
    import numpy as np

    n_buckets = adaptive_buckets(2 * _nrows(sf_dir, "events"))
    BUDGET = 4096

    def tag(t: pa.Table) -> pa.Table:
        toks = pc.split_pattern_regex(
            pc.utf8_lower(t.column("text")), "[^a-z0-9]+")
        toks = toks.combine_chunks() if isinstance(
            toks, pa.ChunkedArray) else toks
        flat = toks.flatten()
        nonempty = pc.greater(pc.utf8_length(flat), 0) \
            .to_numpy(zero_copy_only=False)
        offs = toks.offsets.to_numpy(zero_copy_only=False)
        lens = np.diff(offs)
        row_id = np.repeat(np.arange(len(lens)), lens)
        counts = np.zeros(len(lens), np.int64)
        np.add.at(counts, row_id[nonempty], 1)
        d = pa.table({"conv_id": t.column("conv_id"),
                      "n_tokens": pa.array(counts, pa.int64())}) \
            .group_by("conv_id").aggregate([("n_tokens", "sum")])
        out = pa.table({"conv_id": d.column("conv_id"),
                        "n_tokens": d.column("n_tokens_sum")})
        return out.append_column(
            "bucket", fnv1a_bucket(out.column("conv_id"), n_buckets))

    def grp(g: pa.Table) -> pa.Table:
        f = g.group_by("conv_id").aggregate([("n_tokens", "sum")])
        n = f.column("n_tokens_sum")
        return pa.table({
            "conv_id": f.column("conv_id"),
            "n_tokens": n,
            "over_budget": pc.greater(n, BUDGET)})

    return read_transcripts(sf_dir) \
        .map_batches(tag, batch_format="pyarrow") \
        .groupby("bucket").map_groups(grp, batch_format="pyarrow")


SQL_CONV_TOKEN_BUDGET = f"""{_T}
SELECT conv_id,
  CAST(SUM(len(regexp_extract_all(lower(text), '[a-z0-9]+')))
       AS BIGINT) AS n_tokens,
  SUM(len(regexp_extract_all(lower(text), '[a-z0-9]+'))) > 4096
    AS over_budget
FROM transcripts GROUP BY conv_id"""


def q_region_nation_rollup(sf_dir: str):
    """Two-level snowflake ROLLUP: customer counts and exact acctbal
    cents at (region, nation), per-region subtotal, and grand total —
    one scan, every level tagged with the SQL GROUPING() bitmask
    (the rollup_revenue convention). Both dims are tiny and ship in
    the closure; the combine moves Σ_level distinct-keys fixed-width
    rows per batch."""
    import numpy as np

    nat = pq.read_table(f"{sf_dir}/nation.parquet",
                        columns=["n_nationkey", "n_name",
                                 "n_regionkey"])
    reg = pq.read_table(f"{sf_dir}/region.parquet",
                        columns=["r_regionkey", "r_name"])
    rname = dict(zip(reg.column("r_regionkey").to_pylist(),
                     reg.column("r_name").to_pylist()))
    nation_of = {k: (rname[rk], n) for k, n, rk in zip(
        nat.column("n_nationkey").to_pylist(),
        nat.column("n_name").to_pylist(),
        nat.column("n_regionkey").to_pylist())}

    def partial(t: pa.Table) -> pa.Table:
        v = t.column("c_acctbal").to_numpy(zero_copy_only=False)
        pairs = [nation_of.get(k) for k in
                 t.column("c_nationkey").to_pylist()]
        base = pa.table({
            "region": pa.array([p[0] for p in pairs], pa.string()),
            "nation": pa.array([p[1] for p in pairs], pa.string()),
            "cents": pa.array(np.floor(v * 100.0).astype(np.int64),
                              pa.int64()),
            "one": pa.array(np.ones(t.num_rows, np.int64), pa.int64())})
        levels = []
        for grouping, keys in ((0, ["region", "nation"]),
                               (1, ["region"]), (3, [])):
            if keys:
                g = base.group_by(keys).aggregate(
                    [("one", "sum"), ("cents", "sum")])
                lv = pa.table({
                    "region": g.column("region"),
                    "nation": g.column("nation") if "nation" in keys
                    else pa.nulls(g.num_rows, pa.string()),
                    "n_customers": g.column("one_sum"),
                    "acctbal_cents": g.column("cents_sum"),
                    "grouping": pa.array([grouping] * g.num_rows,
                                         pa.int64())})
            else:
                lv = pa.table({
                    "region": pa.nulls(1, pa.string()),
                    "nation": pa.nulls(1, pa.string()),
                    "n_customers": pa.array(
                        [base.num_rows], pa.int64()),
                    "acctbal_cents": pa.array(
                        [int(base.column("cents").to_numpy(
                            zero_copy_only=False).sum())], pa.int64()),
                    "grouping": pa.array([grouping], pa.int64())})
            levels.append(lv)
        return pa.concat_tables(levels)

    return _combine_partials(
        _read_dim(sf_dir, "customer", ["c_nationkey", "c_acctbal"])
        .map_batches(partial, batch_format="pyarrow"),
        ["region", "nation", "grouping"],
        {"n_customers": "n_customers",
         "acctbal_cents": "acctbal_cents"})


SQL_REGION_NATION_ROLLUP = """
SELECT r.r_name AS region, n.n_name AS nation,
  CAST(COUNT(*) AS BIGINT) AS n_customers,
  CAST(SUM(CAST(FLOOR(c.c_acctbal * 100) AS BIGINT)) AS BIGINT)
    AS acctbal_cents,
  CAST(GROUPING(r.r_name, n.n_name) AS BIGINT) AS grouping
FROM customer c
JOIN nation n ON c.c_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
GROUP BY ROLLUP (r.r_name, n.n_name)"""


def q_session_duration_band(sf_dir: str):
    """Session-duration quantile band: exact p10/p50/p90 of 30-min-gap
    session durations in SECONDS — the dwell-time SLA panel (the
    durations complement of session_lengths' size histogram).
    `_session_bounds` marks sessions per user bucket, durations
    pre-reduce to a (seconds, count) histogram bounded by the distinct
    duration values, and all three selections run through the repo's
    one quantile rule."""
    import numpy as np

    from .aggregates import quantile_from_cdf

    gap_us = 30 * 60 * 1_000_000
    n_buckets = adaptive_buckets(_nrows(sf_dir, "events"))

    def tag(t: pa.Table) -> pa.Table:
        sub = pa.table({"u": t.column("user_id"),
                        "ts": pc.cast(t.column("ts"), pa.int64()),
                        "eid": t.column("event_id")}) \
            .filter(pc.and_(pc.is_valid(t.column("user_id")),
                            pc.is_valid(t.column("ts"))))
        return sub.append_column("bucket", int_bucket(sub.column("u"),
                                                      n_buckets))

    def grp(g: pa.Table) -> pa.Table:
        order, starts = _session_bounds(g, gap_us)
        ts = g.column("ts").to_numpy(zero_copy_only=False)[order]
        ends = np.append(starts[1:], len(order)) - 1
        dur_s = (ts[ends] - ts[starts]) // 1_000_000
        uniq, counts = np.unique(dur_s, return_counts=True)
        return pa.table({"secs": pa.array(uniq, pa.int64()),
                         "n": pa.array(counts.astype(np.int64),
                                       pa.int64())})

    hist = _combine_partials(
        _read(sf_dir, "events", ["event_id", "user_id", "ts"])
        .map_batches(tag, batch_format="pyarrow")
        .groupby("bucket").map_groups(grp, batch_format="pyarrow"),
        ["secs"], {"n": "n"})
    secs = hist.column("secs").to_numpy(zero_copy_only=False)
    n = hist.column("n").to_numpy(zero_copy_only=False)
    order = np.argsort(secs)
    uniq, cum = secs[order], np.cumsum(n[order])
    return pa.table({
        "p10_secs": pa.array([quantile_from_cdf(uniq, cum, 0.1)],
                             pa.int64()),
        "p50_secs": pa.array([quantile_from_cdf(uniq, cum, 0.5)],
                             pa.int64()),
        "p90_secs": pa.array([quantile_from_cdf(uniq, cum, 0.9)],
                             pa.int64())})


SQL_SESSION_DURATION_BAND = """WITH d AS (
  SELECT user_id, ts, event_id,
    CASE WHEN epoch_us(ts) - LAG(epoch_us(ts)) OVER (
           PARTITION BY user_id ORDER BY ts, event_id)
         > 30 * 60 * 1000000 THEN 1 ELSE 0 END AS brk
  FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL),
s AS (SELECT user_id, ts,
        SUM(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
                       ROWS UNBOUNDED PRECEDING) AS sid
      FROM d),
c AS (SELECT (epoch_us(MAX(ts)) - epoch_us(MIN(ts))) // 1000000
        AS secs FROM s GROUP BY user_id, sid),
h AS (SELECT secs, COUNT(*) AS n FROM c GROUP BY secs),
cdf AS (SELECT secs, SUM(n) OVER (ORDER BY secs) AS cum,
               SUM(n) OVER () AS total FROM h)
SELECT
  CAST(MIN(CASE WHEN cum >= CEIL(0.1 * total) THEN secs END)
       AS BIGINT) AS p10_secs,
  CAST(MIN(CASE WHEN cum >= CEIL(0.5 * total) THEN secs END)
       AS BIGINT) AS p50_secs,
  CAST(MIN(CASE WHEN cum >= CEIL(0.9 * total) THEN secs END)
       AS BIGINT) AS p90_secs
FROM cdf"""


def q_revenue_deciles(sf_dir: str):
    """Revenue-concentration deciles: orders ranked by exact
    total-price cents DESC, NTILE(10), per decile the order count and
    revenue total — "the top 10% of orders carry X% of revenue". The
    lorenz_deciles histogram allocation on the (cents → n_orders)
    distribution: tie groups carry identical cents, so splitting them
    across a decile boundary cannot change either per-decile sum, and
    the NTILE size rule (first N%10 tiles one larger) reproduces SQL
    exactly."""
    import numpy as np

    def partial(t: pa.Table) -> pa.Table:
        v = t.column("o_totalprice").to_numpy(zero_copy_only=False)
        cents = np.floor(v * 100.0).astype(np.int64)
        uniq, m = np.unique(cents, return_counts=True)
        return pa.table({"cents": pa.array(uniq, pa.int64()),
                         "m": pa.array(m.astype(np.int64), pa.int64())})

    hist = _combine_partials(
        _read(sf_dir, "orders", ["o_totalprice"])
        .map_batches(partial, batch_format="pyarrow"),
        ["cents"], {"m": "m"})
    cents = hist.column("cents").to_numpy(zero_copy_only=False)
    m = hist.column("m").to_numpy(zero_copy_only=False)
    order = np.argsort(-cents)
    cents, m = cents[order], m[order]
    total = int(m.sum())
    q, r = divmod(total, 10)
    sizes = np.array([q + 1 if d < r else q for d in range(10)],
                     np.int64)
    bounds = np.cumsum(sizes)
    starts = bounds - sizes
    cum = np.cumsum(m)
    row_lo = cum - m
    out = {"decile": [], "n_orders": [], "revenue_cents": []}
    for d in range(10):
        if sizes[d] == 0:
            continue
        lo = np.maximum(row_lo, starts[d])
        hi = np.minimum(cum, bounds[d])
        take = np.maximum(hi - lo, 0)
        out["decile"].append(d + 1)
        out["n_orders"].append(int(take.sum()))
        out["revenue_cents"].append(int((take * cents).sum()))
    return pa.table({
        "decile": pa.array(out["decile"], pa.int64()),
        "n_orders": pa.array(out["n_orders"], pa.int64()),
        "revenue_cents": pa.array(out["revenue_cents"], pa.int64())})


SQL_REVENUE_DECILES = """WITH c AS (
  SELECT CAST(FLOOR(o_totalprice * 100) AS BIGINT) AS cents,
         o_orderkey
  FROM orders),
t AS (SELECT cents,
        NTILE(10) OVER (ORDER BY cents DESC, o_orderkey) AS decile
      FROM c)
SELECT CAST(decile AS BIGINT) AS decile,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(cents) AS BIGINT) AS revenue_cents
FROM t GROUP BY decile"""


def q_time_to_third_purchase(sf_dir: str):
    """Milestone latency: per user with ≥3 purchases, the microseconds
    from their FIRST event (any type) to their THIRD purchase — the
    habit-formation metric growth teams track. One user-bucket shuffle
    carrying all rows with a purchase flag; the kernel takes each
    run's min ts and the 3rd purchase by (ts, event_id) via one masked
    scan (no second pass, no join)."""
    import numpy as np

    n_buckets = adaptive_buckets(_nrows(sf_dir, "events"))

    def tag(t: pa.Table) -> pa.Table:
        sub = pa.table({"u": t.column("user_id"),
                        "ts": pc.cast(t.column("ts"), pa.int64()),
                        "eid": t.column("event_id"),
                        "buy": pc.fill_null(pc.equal(
                            t.column("event_type"), "purchase"),
                            False)}) \
            .filter(pc.and_(pc.is_valid(t.column("user_id")),
                            pc.is_valid(t.column("ts"))))
        return sub.append_column("bucket", int_bucket(sub.column("u"),
                                                      n_buckets))

    def grp(g: pa.Table) -> pa.Table:
        u = g.column("u").to_numpy(zero_copy_only=False)
        ts = g.column("ts").to_numpy(zero_copy_only=False)
        eid = g.column("eid").to_numpy(zero_copy_only=False)
        buy = g.column("buy").to_numpy(zero_copy_only=False)
        order, new_run, _ = _lag_scaffold([u], ts, eid)
        starts = np.flatnonzero(new_run)
        lens = np.diff(np.append(starts, len(order)))
        seg = np.repeat(np.arange(len(starts)), lens)
        b = buy[order]
        # per-run running purchase count; the 3rd purchase is where the
        # cumulative (rebased per run) first reaches 3
        cs = np.cumsum(b.astype(np.int64))
        base = np.repeat(cs[starts] - b[starts].astype(np.int64), lens)
        rank = cs - base
        third = b & (rank == 3)
        tss = ts[order]
        first_ts = tss[starts]
        out_u, out_lag = [], []
        idx3 = np.flatnonzero(third)
        for i in idx3:
            r = seg[i]
            out_u.append(int(u[order][starts[r]]))
            out_lag.append(int(tss[i] - first_ts[r]))
        return pa.table({
            "user_id": pa.array(out_u, pa.int64()),
            "lag_us": pa.array(out_lag, pa.int64())})

    return _read(sf_dir, "events",
                 ["event_id", "user_id", "ts", "event_type"]) \
        .map_batches(tag, batch_format="pyarrow") \
        .groupby("bucket").map_groups(grp, batch_format="pyarrow")


SQL_TIME_TO_THIRD_PURCHASE = """WITH f AS (
  SELECT user_id, MIN(ts) AS first_ts FROM events
  WHERE user_id IS NOT NULL AND ts IS NOT NULL GROUP BY user_id),
p AS (SELECT user_id, ts,
        ROW_NUMBER() OVER (PARTITION BY user_id
                           ORDER BY ts, event_id) AS rn
      FROM events WHERE event_type = 'purchase'
        AND user_id IS NOT NULL AND ts IS NOT NULL)
SELECT p.user_id, epoch_us(p.ts) - epoch_us(f.first_ts) AS lag_us
FROM p JOIN f ON p.user_id = f.user_id WHERE p.rn = 3"""


def q_tools_per_role(sf_dir: str):
    """Flagship grouped COUNT DISTINCT: how many distinct tools each
    ROLE uses across the corpus — the capability-surface matrix.
    Per-batch distinct (role, tool) pairs bound the one tool-bucket
    shuffle (tools partition disjointly across buckets, so per-bucket
    distinct counts SUM exactly — the vocab_per_source contract)."""
    n_buckets = adaptive_buckets(2 * _nrows(sf_dir, "events"))

    def tag(t: pa.Table) -> pa.Table:
        d = pa.table({"role": t.column("role"),
                      "tool": t.column("tool")}) \
            .group_by(["role", "tool"]).aggregate([])
        return d.append_column(
            "bucket", fnv1a_bucket(d.column("tool"), n_buckets))

    def grp(g: pa.Table) -> pa.Table:
        f = g.group_by(["role", "tool"]).aggregate([]) \
            .group_by("role").aggregate([("tool", "count")])
        return pa.table({"role": f.column("role"),
                         "n_tools": pc.cast(f.column("tool_count"),
                                            pa.int64())})

    small = read_transcripts(sf_dir) \
        .map_batches(tag, batch_format="pyarrow") \
        .groupby("bucket").map_groups(grp, batch_format="pyarrow")
    return _combine_partials(small, ["role"], {"n_tools": "n_tools"})


SQL_TOOLS_PER_ROLE = f"""{_T}
SELECT role, CAST(COUNT(DISTINCT tool) AS BIGINT) AS n_tools
FROM transcripts GROUP BY role"""


def q_monthly_new_vs_returning(sf_dir: str):
    """Growth accounting: per calendar month, active users split into
    NEW (first-ever activity that month) vs RETURNING — the
    top-of-dashboard growth metric. Distinct (user, month) pairs bound
    the one user-bucket shuffle; each bucket derives its users' first
    months locally (buckets partition users, so first-seen is exact)
    and emits (month, active, new) partials."""
    import numpy as np

    n_buckets = adaptive_buckets(_nrows(sf_dir, "events"))

    def tag(t: pa.Table) -> pa.Table:
        mon = pc.cast(pc.floor_temporal(t.column("ts"), unit="month"),
                      pa.timestamp("us"))
        d = pa.table({"u": t.column("user_id"), "mon": mon}) \
            .filter(pc.and_(pc.is_valid(t.column("user_id")),
                            pc.is_valid(t.column("ts")))) \
            .group_by(["u", "mon"]).aggregate([])
        return d.append_column("bucket", int_bucket(d.column("u"),
                                                    n_buckets))

    def grp(g: pa.Table) -> pa.Table:
        f = g.group_by(["u", "mon"]).aggregate([])
        u = f.column("u").to_numpy(zero_copy_only=False)
        mon = pc.cast(f.column("mon"), pa.int64()) \
            .to_numpy(zero_copy_only=False)
        order = np.lexsort((mon, u))
        us, ms = u[order], mon[order]
        first = np.append(True, us[1:] != us[:-1])
        part = pa.table({
            "mon": pa.array(ms, pa.int64()),
            "active": pa.array(np.ones(len(ms), np.int64), pa.int64()),
            "new": pa.array(first.astype(np.int64), pa.int64())})
        gg = part.group_by("mon").aggregate(
            [("active", "sum"), ("new", "sum")])
        return pa.table({"mon": gg.column("mon"),
                         "n_active": gg.column("active_sum"),
                         "n_new": gg.column("new_sum")})

    comb = _combine_partials(
        _read(sf_dir, "events", ["user_id", "ts"])
        .map_batches(tag, batch_format="pyarrow")
        .groupby("bucket").map_groups(grp, batch_format="pyarrow"),
        ["mon"], {"n_active": "n_active", "n_new": "n_new"})
    return pa.table({
        "mon": pc.cast(comb.column("mon"), pa.timestamp("us")),
        "n_active": comb.column("n_active"),
        "n_new": comb.column("n_new"),
        "n_returning": pc.subtract(comb.column("n_active"),
                                   comb.column("n_new"))})


SQL_MONTHLY_NEW_VS_RETURNING = """WITH a AS (
  SELECT DISTINCT user_id,
    CAST(date_trunc('month', ts) AS TIMESTAMP) AS mon
  FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL),
f AS (SELECT user_id, MIN(mon) AS first_mon FROM a GROUP BY user_id)
SELECT a.mon, CAST(COUNT(*) AS BIGINT) AS n_active,
  CAST(SUM(CASE WHEN a.mon = f.first_mon THEN 1 ELSE 0 END)
       AS BIGINT) AS n_new,
  CAST(SUM(CASE WHEN a.mon = f.first_mon THEN 0 ELSE 1 END)
       AS BIGINT) AS n_returning
FROM a JOIN f ON a.user_id = f.user_id GROUP BY a.mon"""


def q_q6_revenue(sf_dir: str):
    """The classic predicate-band aggregate (TPC-H Q6 shape): revenue
    from 1996 lineitems with discount in [0.05, 0.07] and quantity
    < 24 — one pruned scan, a vectorized three-way mask, and an exact
    cents sum (the extendedprice×discount double product rounds once
    identically on both engines before the floor). No shuffle; one
    fixed-width partial per batch."""
    import numpy as np

    def partial(t: pa.Table) -> pa.Table:
        sd = t.column("l_shipdate")
        ep = t.column("l_extendedprice").to_numpy(zero_copy_only=False)
        dc = t.column("l_discount").to_numpy(zero_copy_only=False)
        qt = t.column("l_quantity").to_numpy(zero_copy_only=False)
        yr = pc.year(sd).to_numpy(zero_copy_only=False)
        ok = (yr == 1996) & (dc >= 0.05) & (dc <= 0.07) & (qt < 24)
        cents = np.floor(ep[ok] * dc[ok] * 100.0).astype(np.int64)
        return pa.table({
            "k": pa.array([0], pa.int64()),
            "revenue_cents": pa.array([int(cents.sum())], pa.int64()),
            "n_items": pa.array([int(ok.sum())], pa.int64())})

    comb = _combine_partials(
        _read(sf_dir, "lineitem",
              ["l_shipdate", "l_extendedprice", "l_discount",
               "l_quantity"])
        .map_batches(partial, batch_format="pyarrow"),
        ["k"], {"revenue_cents": "revenue_cents",
                "n_items": "n_items"})
    return comb.drop_columns(["k"])


SQL_Q6_REVENUE = """
SELECT CAST(SUM(CAST(FLOOR(l_extendedprice * l_discount * 100)
                     AS BIGINT)) AS BIGINT) AS revenue_cents,
       CAST(COUNT(*) AS BIGINT) AS n_items
FROM lineitem
WHERE EXTRACT(year FROM l_shipdate) = 1996
  AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24"""


def q_type_gini(sf_dir: str):
    """Per-user behavioral diversity as EXACT integers: n_events and
    the Simpson numerator Σ c_t² over the user's per-type counts
    (Gini impurity = 1 − Σ(c/n)² = (n² − Σc²)/n² derives from the two
    columns without ever computing a float). Per-batch (user, type)
    count partials bound the one user-bucket shuffle; users co-locate,
    so the per-bucket fold of exact counts squares exactly."""
    n_buckets = adaptive_buckets(_nrows(sf_dir, "events"))

    def tag(t: pa.Table) -> pa.Table:
        sub = pa.table({"u": t.column("user_id"),
                        "et": t.column("event_type")}) \
            .filter(pc.and_(pc.is_valid(t.column("user_id")),
                            pc.is_valid(t.column("event_type"))))
        d = sub.group_by(["u", "et"]).aggregate([([], "count_all")])
        return d.append_column("bucket", int_bucket(d.column("u"),
                                                    n_buckets))

    def grp(g: pa.Table) -> pa.Table:
        f = g.group_by(["u", "et"]).aggregate([("count_all", "sum")])
        m = pc.cast(f.column("count_all_sum"), pa.int64())
        per_u = pa.table({
            "u": f.column("u"), "m": m,
            "mm": pc.multiply_checked(m, m)}) \
            .group_by("u").aggregate([("m", "sum"), ("mm", "sum")])
        return pa.table({
            "user_id": per_u.column("u"),
            "n_events": per_u.column("m_sum"),
            "sum_sq": per_u.column("mm_sum")})

    return _read(sf_dir, "events", ["user_id", "event_type"]) \
        .map_batches(tag, batch_format="pyarrow") \
        .groupby("bucket").map_groups(grp, batch_format="pyarrow")


SQL_TYPE_GINI = """WITH c AS (
  SELECT user_id, event_type, COUNT(*) AS m FROM events
  WHERE user_id IS NOT NULL AND event_type IS NOT NULL
  GROUP BY user_id, event_type)
SELECT user_id, CAST(SUM(m) AS BIGINT) AS n_events,
       CAST(SUM(m * m) AS BIGINT) AS sum_sq
FROM c GROUP BY user_id"""


def _overlap_pair_counts(c, day, window_days: int):
    """Pure kernel of `overlapping_orders` (property-tested against
    brute force): per key in ``c``, the number of unordered index
    pairs whose ``day`` values differ by < ``window_days``. One
    composite (dense-key-rank · 2^16 + rebased-day) array and ONE
    global searchsorted answer every row within its own segment; a
    reduceat sums pairs per key. Raises when the day span nears the
    2^16 stride instead of silently wrapping."""
    import numpy as np

    if day.size and int(day.max()) - int(day.min()) >= (1 << 16) \
            - window_days:
        raise ValueError("day span exceeds the composite-key "
                         "window; widen the key stride")
    base = day - (day.min() if day.size else 0)
    order = np.lexsort((base, c))
    cs, ds = c[order], base[order]
    # dense per-bucket key rank keeps rank·2^16 in int64
    new_c = np.append(True, cs[1:] != cs[:-1]) \
        if len(cs) else np.array([], bool)
    rank = np.cumsum(new_c) - 1 if len(cs) else np.array([], np.int64)
    key = rank.astype(np.int64) * (1 << 16) + ds
    hi = np.searchsorted(key, key + window_days, side="left")
    cnt = hi - np.arange(len(key)) - 1
    starts = np.flatnonzero(new_c)
    pairs = np.add.reduceat(cnt, starts).astype(np.int64) \
        if len(starts) else np.array([], np.int64)
    keep = pairs > 0
    return cs[starts][keep], pairs[keep]


def q_overlapping_orders(sf_dir: str):
    """Per-customer interval SELF-overlap join: count unordered pairs
    of a customer's orders whose 30-day fulfillment windows overlap
    (|Δdate| < 30 days) — the duplicate-shipment / order-collision
    audit. The quadratic self-join never materializes: one custkey
    bucket shuffle, then a composite (customer-rank · 2^16 + epoch-day)
    key makes ONE global searchsorted answer every row's window count
    within its own customer segment (day spans < 2^16 keep segments
    disjoint; raises if the corpus ever exceeds that), and a reduceat
    sums pairs per customer. Each unordered pair is counted once, from
    its earlier sorted endpoint."""
    import numpy as np

    n_buckets = adaptive_buckets(_nrows(sf_dir, "orders"))
    window_days = 30

    def tag(t: pa.Table) -> pa.Table:
        sub = pa.table({"c": t.column("o_custkey"),
                        "day": pc.cast(pc.floor(pc.divide(
                            pc.cast(t.column("o_orderdate"), pa.int64()),
                            86_400_000_000)), pa.int64())}) \
            .filter(pc.is_valid(t.column("o_orderdate")))
        return sub.append_column("bucket", int_bucket(sub.column("c"),
                                                      n_buckets))

    def grp(g: pa.Table) -> pa.Table:
        c = g.column("c").to_numpy(zero_copy_only=False)
        day = g.column("day").to_numpy(zero_copy_only=False)
        custs, pairs = _overlap_pair_counts(c, day, window_days)
        return pa.table({
            "custkey": pa.array(custs, pa.int64()),
            "n_pairs": pa.array(pairs, pa.int64())})

    return _read(sf_dir, "orders", ["o_custkey", "o_orderdate"]) \
        .map_batches(tag, batch_format="pyarrow") \
        .groupby("bucket").map_groups(grp, batch_format="pyarrow")


SQL_OVERLAPPING_ORDERS = """WITH o AS (
  SELECT o_custkey, o_orderkey,
         epoch_us(o_orderdate) // 86400000000 AS day
  FROM orders WHERE o_orderdate IS NOT NULL)
SELECT a.o_custkey AS custkey, CAST(COUNT(*) AS BIGINT) AS n_pairs
FROM o a JOIN o b
  ON a.o_custkey = b.o_custkey AND a.o_orderkey < b.o_orderkey
  AND ABS(a.day - b.day) < 30
GROUP BY a.o_custkey"""


def q_rank_topk_ties(sf_dir: str):
    """RANK()-with-ties top-k retrieval: per event type, every user
    whose event count ranks in the top 3 INCLUDING boundary ties
    (RANK ≤ 3 keeps all rows tied at the 3rd count, where ROW_NUMBER
    would cut arbitrarily — the leaderboard contract). RANK() ≤ k ⟺
    count ≥ the kth-largest row value, so no rank is ever computed:
    one user-bucket shuffle folds exact (type, user, n) rows
    (materialized — the COMPACTED aggregate, one row per distinct
    pair, spillable); per-batch top-3-per-type candidates fold to a
    driver threshold table (types × 3 × blocks rows); a narrow
    filter-back keeps n ≥ threshold. No per-type global sort."""
    import numpy as np

    k = 3
    n_buckets = adaptive_buckets(_nrows(sf_dir, "events"))

    def tag(t: pa.Table) -> pa.Table:
        sub = pa.table({"u": t.column("user_id"),
                        "et": t.column("event_type")}) \
            .filter(pc.and_(pc.is_valid(t.column("user_id")),
                            pc.is_valid(t.column("event_type"))))
        d = sub.group_by(["u", "et"]).aggregate([([], "count_all")])
        return d.append_column("bucket", int_bucket(d.column("u"),
                                                    n_buckets))

    def fold(g: pa.Table) -> pa.Table:
        f = g.group_by(["u", "et"]).aggregate([("count_all", "sum")])
        return pa.table({
            "event_type": f.column("et"),
            "user_id": f.column("u"),
            "n_events": pc.cast(f.column("count_all_sum"),
                                pa.int64())})

    counts = _read(sf_dir, "events", ["user_id", "event_type"]) \
        .map_batches(tag, batch_format="pyarrow") \
        .groupby("bucket").map_groups(fold, batch_format="pyarrow") \
        .materialize()

    def cand(t: pa.Table) -> pa.Table:
        et = t.column("event_type").to_numpy(zero_copy_only=False)
        n = t.column("n_events").to_numpy(zero_copy_only=False)
        order = np.lexsort((-n, et))
        ets, ns = et[order], n[order]
        starts = np.flatnonzero(np.append(True, ets[1:] != ets[:-1])) \
            if len(ets) else np.array([], np.int64)
        pos = np.arange(len(ets)) - np.repeat(
            starts, np.diff(np.append(starts, len(ets))))
        keep = pos < k
        return pa.table({"event_type": pa.array(ets[keep]),
                         "n_events": pa.array(ns[keep], pa.int64())})

    top = pa.concat_tables(list(
        counts.map_batches(cand, batch_format="pyarrow")
        .iter_batches(batch_size=None, batch_format="pyarrow")))
    thr: dict[str, int] = {}
    et = top.column("event_type").to_pylist()
    n = top.column("n_events").to_pylist()
    by_type: dict[str, list[int]] = {}
    for e, v in zip(et, n):
        by_type.setdefault(e, []).append(v)
    for e, vs in by_type.items():
        vs.sort(reverse=True)
        thr[e] = vs[k - 1] if len(vs) >= k else (vs[-1] if vs else 0)

    thr_types = pa.array(list(thr), pa.string())
    thr_vals = np.array([thr[e] for e in thr], np.int64)

    def filt(t: pa.Table) -> pa.Table:
        # vectorized threshold join: index_in against the tiny
        # threshold table, no per-row python
        idx = pc.index_in(t.column("event_type"),
                          value_set=thr_types) \
            .to_numpy(zero_copy_only=False)
        lim = thr_vals[idx.astype(np.int64)]
        return t.filter(pa.array(
            t.column("n_events").to_numpy(zero_copy_only=False)
            >= lim))

    return counts.map_batches(filt, batch_format="pyarrow")


SQL_RANK_TOPK_TIES = """WITH c AS (
  SELECT event_type, user_id, CAST(COUNT(*) AS BIGINT) AS n_events
  FROM events
  WHERE user_id IS NOT NULL AND event_type IS NOT NULL
  GROUP BY event_type, user_id)
SELECT event_type, user_id, n_events FROM c
QUALIFY RANK() OVER (PARTITION BY event_type
                     ORDER BY n_events DESC) <= 3"""


def _conv_tool_presence(g: pa.Table):
    """Shared kernel for the set-mining queries: dedup a bucket's
    (conv, tool) pairs and return ``(tools_sorted, m, n_conv)`` where
    ``m`` is the conversations × tools boolean presence matrix and
    ``tools_sorted`` is the lexical tool order (SQL's ``a < b``
    compares strings). Refuses tool cardinality > 64 rather than
    letting the C(T,k) combination loops explode."""
    import numpy as np

    d = g.group_by(["conv", "tool"]).aggregate([])
    enc_t = pc.dictionary_encode(d.column("tool").combine_chunks())
    tools = np.asarray(enc_t.dictionary.to_pylist(), dtype=object)
    if len(tools) > 64:
        raise ValueError("tool cardinality exceeds the pairwise/"
                         "triple kernel bound; shard the tool "
                         "universe")
    order = np.argsort(tools)
    rank_of = np.empty(len(tools), np.int64)
    rank_of[order] = np.arange(len(tools))
    tc = rank_of[enc_t.indices.to_numpy(zero_copy_only=False)
                 .astype(np.int64)]
    enc_c = pc.dictionary_encode(d.column("conv").combine_chunks())
    cc = enc_c.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    n_conv = len(enc_c.dictionary)
    m = np.zeros((n_conv, len(tools)), bool)
    m[cc, tc] = True
    return tools[order], m, n_conv


def q_tool_triples(sf_dir: str):
    """Set-based frequent-triple mining (the market-basket step past
    pairwise cooccurrence): for every unordered TRIPLE of tools, how
    many conversations used all three. Per-batch distinct
    (conv, tool) pairs bound the one conv-bucket shuffle; each bucket
    dedups globally, builds a conversations × tools boolean presence
    matrix (`_conv_tool_presence`; null conversations dropped on both
    engines), and counts each of the C(T,3) column combinations with
    vectorized ANDs (T = tool cardinality, bounded — the kernel
    refuses T > 64 rather than silently exploding); tiny
    (a, b, c, n) partials combine on the driver."""
    import numpy as np

    n_buckets = adaptive_buckets(_nrows(sf_dir, "events"))

    def tag(t: pa.Table) -> pa.Table:
        sub = pa.table({"conv": t.column("conv_id"),
                        "tool": t.column("tool")}) \
            .filter(pc.and_(pc.is_valid(t.column("tool")),
                            pc.is_valid(t.column("conv_id"))))
        d = sub.group_by(["conv", "tool"]).aggregate([])
        return d.append_column(
            "bucket", fnv1a_bucket(d.column("conv"), n_buckets))

    def grp(g: pa.Table) -> pa.Table:
        tools_sorted, m, _ = _conv_tool_presence(g)
        ta, tb_, tcc, n = [], [], [], []
        nt = len(tools_sorted)
        for i in range(nt):
            mi = m[:, i]
            for j in range(i + 1, nt):
                mij = mi & m[:, j]
                for kk in range(j + 1, nt):
                    c = int(np.count_nonzero(mij & m[:, kk]))
                    if c:
                        ta.append(tools_sorted[i])
                        tb_.append(tools_sorted[j])
                        tcc.append(tools_sorted[kk])
                        n.append(c)
        return pa.table({"tool_a": pa.array(ta, pa.string()),
                         "tool_b": pa.array(tb_, pa.string()),
                         "tool_c": pa.array(tcc, pa.string()),
                         "n_convs": pa.array(n, pa.int64())})

    small = read_transcripts(sf_dir) \
        .map_batches(tag, batch_format="pyarrow") \
        .groupby("bucket").map_groups(grp, batch_format="pyarrow")
    return _combine_partials(small, ["tool_a", "tool_b", "tool_c"],
                             {"n_convs": "n_convs"})


SQL_TOOL_TRIPLES = f"""{_T},
d AS (SELECT DISTINCT conv_id, tool FROM transcripts
      WHERE tool IS NOT NULL AND conv_id IS NOT NULL)
SELECT a.tool AS tool_a, b.tool AS tool_b, c.tool AS tool_c,
       CAST(COUNT(*) AS BIGINT) AS n_convs
FROM d a
JOIN d b ON a.conv_id = b.conv_id AND a.tool < b.tool
JOIN d c ON b.conv_id = c.conv_id AND b.tool < c.tool
GROUP BY a.tool, b.tool, c.tool"""


def q_role_tool_list(sf_dir: str):
    """Ordered DISTINCT string aggregation per group: each role's
    full tool surface as one comma-joined, lexically sorted list —
    the capability manifest a routing config is generated from.
    Per-batch distinct (role, tool) pairs bound the one role-bucket
    shuffle (roles are few but each group is only the DISTINCT tool
    set — bounded by tool cardinality, not corpus size); the
    per-group kernel dedups, sorts, and joins with arrow kernels."""
    n_buckets = 8

    def tag(t: pa.Table) -> pa.Table:
        sub = pa.table({"role": t.column("role"),
                        "tool": t.column("tool")}) \
            .filter(pc.is_valid(t.column("tool")))
        d = sub.group_by(["role", "tool"]).aggregate([])
        return d.append_column(
            "bucket", fnv1a_bucket(d.column("role"), n_buckets))

    def grp(g: pa.Table) -> pa.Table:
        d = g.group_by(["role", "tool"]).aggregate([])
        roles = d.column("role")
        tools = d.column("tool")
        order = pc.sort_indices(
            pa.table({"r": roles, "t": tools}),
            sort_keys=[("r", "ascending"), ("t", "ascending")])
        rs = pc.take(roles, order).combine_chunks()
        ts_ = pc.take(tools, order).combine_chunks()
        import numpy as np
        ra = np.asarray(rs.to_pylist(), dtype=object)
        starts = np.flatnonzero(np.append(True, ra[1:] != ra[:-1])) \
            if len(ra) else np.array([], np.int64)
        out_r, out_t = [], []
        bounds = np.append(starts, len(ra))
        tl = ts_.to_pylist()
        for i, s in enumerate(starts):
            out_r.append(ra[s])
            out_t.append(",".join(tl[s:bounds[i + 1]]))
        return pa.table({"role": pa.array(out_r, pa.string()),
                         "tools": pa.array(out_t, pa.string())})

    return read_transcripts(sf_dir) \
        .map_batches(tag, batch_format="pyarrow") \
        .groupby("bucket").map_groups(grp, batch_format="pyarrow")


SQL_ROLE_TOOL_LIST = f"""{_T},
d AS (SELECT DISTINCT role, tool FROM transcripts
      WHERE tool IS NOT NULL)
SELECT role, string_agg(tool, ',' ORDER BY tool) AS tools
FROM d GROUP BY role"""


def q_turn_len_by_role(sf_dir: str):
    """Grouped text-length profile of the flagship corpus: per role,
    turn count, total and max codepoint length — the byte-budget
    planning numbers for a downstream tokenizer stage. One vectorized
    utf8_length pass per batch; fixed-width (role, n, total, max)
    partials; counts and sums fold by addition, max by max — no
    shuffle anywhere."""
    def partial(t: pa.Table) -> pa.Table:
        ln = pc.cast(pc.utf8_length(t.column("text")), pa.int64())
        g = pa.table({"role": t.column("role"), "ln": ln}) \
            .filter(pc.is_valid(ln)) \
            .group_by("role").aggregate([("ln", "count"),
                                         ("ln", "sum"),
                                         ("ln", "max")])
        return pa.table({
            "role": g.column("role"),
            "n_turns": pc.cast(g.column("ln_count"), pa.int64()),
            "total_chars": pc.cast(g.column("ln_sum"), pa.int64()),
            "max_chars": pc.cast(g.column("ln_max"), pa.int64())})

    parts = pa.concat_tables(list(
        read_transcripts(sf_dir)
        .map_batches(partial, batch_format="pyarrow")
        .iter_batches(batch_size=None, batch_format="pyarrow")))
    agg = parts.group_by("role").aggregate([("n_turns", "sum"),
                                            ("total_chars", "sum"),
                                            ("max_chars", "max")])
    return pa.table({"role": agg.column("role"),
                     "n_turns": agg.column("n_turns_sum"),
                     "total_chars": agg.column("total_chars_sum"),
                     "max_chars": agg.column("max_chars_max")})


SQL_TURN_LEN_BY_ROLE = f"""{_T}
SELECT role, CAST(COUNT(text) AS BIGINT) AS n_turns,
       CAST(SUM(length(text)) AS BIGINT) AS total_chars,
       CAST(MAX(length(text)) AS BIGINT) AS max_chars
FROM transcripts WHERE text IS NOT NULL GROUP BY role"""


def q_decile_transition(sf_dir: str):
    """Rank-decile MIGRATION matrix: customers NTILE(10)-ranked by
    exact yearly revenue in 1995 and again in 1996, counted per
    (prev-decile, next-decile) cell — the churn/upsell mobility report
    (two global rankings + a join, with no global sort anywhere).
    Yearly totals fold through one custkey-bucket shuffle into a
    COMPACTED (cust, year, cents) aggregate; BOTH years ride one
    `global_row_number` pass on a composite (year · 2^40 − cents)
    key (year-1995 ranks wholly precede year-1996's, so within-year
    rank is the global rank minus the prior-year count), NTILE
    arithmetic assigns front-loaded tiles, and one cust-bucket
    shuffle of the tagged decile projections pairs the years per
    customer into tiny 10×10 matrix partials."""
    import numpy as np

    from .aggregates import global_row_number

    y1, y2 = 1995, 1996
    n_buckets = adaptive_buckets(_nrows(sf_dir, "orders"))
    cust_max = _footer_max(sf_dir, "orders", "o_custkey")

    def tag(t: pa.Table) -> pa.Table:
        yr = pc.cast(pc.year(t.column("o_orderdate")), pa.int64())
        cents = pc.cast(pc.floor(pc.multiply(
            t.column("o_totalprice"), 100.0)), pa.int64())
        sub = pa.table({"cust": t.column("o_custkey"), "y": yr,
                        "c": cents}) \
            .filter(pc.and_(pc.is_valid(t.column("o_orderdate")),
                            pc.is_in(yr, value_set=pa.array(
                                [y1, y2], pa.int64()))))
        g = sub.group_by(["cust", "y"]).aggregate([("c", "sum")])
        return g.append_column("bucket", int_bucket(g.column("cust"),
                                                    n_buckets))

    def fold(g: pa.Table) -> pa.Table:
        f = g.group_by(["cust", "y"]).aggregate([("c_sum", "sum")])
        return pa.table({"cust": f.column("cust"),
                         "y": f.column("y"),
                         "cents": f.column("c_sum_sum")})

    totals = _read(sf_dir, "orders",
                   ["o_custkey", "o_orderdate", "o_totalprice"]) \
        .map_batches(tag, batch_format="pyarrow") \
        .groupby("bucket").map_groups(fold, batch_format="pyarrow") \
        .materialize()

    n_year = {y1: 0, y2: 0}
    for t in totals.iter_batches(batch_size=None, batch_format="pyarrow"):
        g = t.group_by("y").aggregate([([], "count_all")])
        for y, c in zip(g.column("y").to_pylist(),
                        g.column("count_all").to_pylist()):
            n_year[y] += c

    # ONE rank pass for both years: the composite key
    # (year-index · 2^40 − cents) orders year-1995 rows (≤ 0) wholly
    # before year-1996 rows (> 0), and within a year by cents DESC —
    # so rank-within-year = global rank − prior-year count, and the
    # same customer appearing in both years keeps (value, id) unique.
    # Composite stays far under 2^53, so the kernel's float64 pass is
    # exact; the magnitude guard raises rather than silently folding
    # years together.
    K = 1 << 40

    def comp(t: pa.Table) -> pa.Table:
        cents = t.column("cents").to_numpy(zero_copy_only=False)
        if cents.size and (cents.min() < 0 or cents.max() >= K):
            raise ValueError("cents outside the composite-key range")
        y = t.column("y").to_numpy(zero_copy_only=False)
        return pa.table({
            "cust": t.column("cust"),
            "compv": pa.array((y - y1) * K - cents, pa.int64())})

    ranked = global_row_number(
        totals.map_batches(comp, batch_format="pyarrow"),
        value_col="compv", id_col="cust", id_max=cust_max, scale=1)
    n1, n2 = n_year[y1], n_year[y2]

    def to_dec(t: pa.Table) -> pa.Table:
        rnk = t.column("rnk").to_numpy(zero_copy_only=False)
        is_y2 = t.column("value_cents") \
            .to_numpy(zero_copy_only=False) > 0
        dec = np.where(is_y2,
                       _ntile_front_loaded(rnk - n1, max(n2, 1)),
                       _ntile_front_loaded(rnk, max(n1, 1)))
        out = pa.table({
            "cust": t.column("cust"),
            "dec": pa.array(dec.astype(np.int64), pa.int64()),
            "side": pc.if_else(pa.array(is_y2), "n", "p")})
        return out.append_column(
            "bucket", int_bucket(out.column("cust"), n_buckets))

    def pair(g: pa.Table) -> pa.Table:
        cu = g.column("cust").to_numpy(zero_copy_only=False)
        dec = g.column("dec").to_numpy(zero_copy_only=False)
        is_prev = pc.equal(g.column("side"), "p") \
            .to_numpy(zero_copy_only=False)
        order = np.lexsort((np.where(is_prev, 0, 1), cu))
        cs, ds_, pv = cu[order], dec[order], is_prev[order]
        both = np.flatnonzero(
            (cs[:-1] == cs[1:]) & pv[:-1] & ~pv[1:]) \
            if len(cs) > 1 else np.array([], np.int64)
        t = pa.table({"d_prev": pa.array(ds_[both], pa.int64()),
                      "d_next": pa.array(ds_[both + 1], pa.int64())})
        g2 = t.group_by(["d_prev", "d_next"]).aggregate(
            [([], "count_all")])
        return pa.table({
            "d_prev": g2.column("d_prev"),
            "d_next": g2.column("d_next"),
            "n_customers": pc.cast(g2.column("count_all"),
                                   pa.int64())})

    small = ranked.map_batches(to_dec, batch_format="pyarrow") \
        .groupby("bucket").map_groups(pair, batch_format="pyarrow")
    return _combine_partials(small, ["d_prev", "d_next"],
                             {"n_customers": "n_customers"})


SQL_DECILE_TRANSITION = """WITH t AS (
  SELECT o_custkey AS cust,
         CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS y,
         SUM(CAST(FLOOR(o_totalprice * 100) AS BIGINT)) AS cents
  FROM orders
  WHERE o_orderdate IS NOT NULL
    AND EXTRACT(year FROM o_orderdate) IN (1995, 1996)
  GROUP BY 1, 2),
r1 AS (SELECT cust, NTILE(10) OVER (ORDER BY cents DESC, cust) AS d
       FROM t WHERE y = 1995),
r2 AS (SELECT cust, NTILE(10) OVER (ORDER BY cents DESC, cust) AS d
       FROM t WHERE y = 1996)
SELECT CAST(r1.d AS BIGINT) AS d_prev, CAST(r2.d AS BIGINT) AS d_next,
       CAST(COUNT(*) AS BIGINT) AS n_customers
FROM r1 JOIN r2 ON r1.cust = r2.cust
GROUP BY 1, 2"""


def q_tool_affinity(sf_dir: str):
    """Association-lift report as EXACT integers: for each unordered
    tool pair, the numerators of lift = P(ab)/(P(a)·P(b)) —
    conversations using both, each margin, and the total — so the
    float ratio never enters the result (the recommender/affinity
    scoreboard). One conv-bucket shuffle of distinct (conv, tool)
    pairs (null conversations dropped on both engines): each bucket
    emits pair counts, margin counts AND its conversation count from
    the same `_conv_tool_presence` pass; the driver folds the tiny
    partials and joins margins onto pairs."""
    import numpy as np

    n_buckets = adaptive_buckets(_nrows(sf_dir, "events"))

    def tag(t: pa.Table) -> pa.Table:
        sub = pa.table({"conv": t.column("conv_id"),
                        "tool": t.column("tool")}) \
            .filter(pc.and_(pc.is_valid(t.column("tool")),
                            pc.is_valid(t.column("conv_id"))))
        d = sub.group_by(["conv", "tool"]).aggregate([])
        return d.append_column(
            "bucket", fnv1a_bucket(d.column("conv"), n_buckets))

    def grp(g: pa.Table) -> pa.Table:
        tools_sorted, m, n_conv = _conv_tool_presence(g)
        margins = m.sum(axis=0).astype(np.int64)
        ta, tb_, nab = [], [], []
        nt = len(tools_sorted)
        for i in range(nt):
            mi = m[:, i]
            for j in range(i + 1, nt):
                c = int(np.count_nonzero(mi & m[:, j]))
                if c:
                    ta.append(tools_sorted[i])
                    tb_.append(tools_sorted[j])
                    nab.append(c)
        pair = pa.table({
            "tool_a": pa.array(ta, pa.string()),
            "tool_b": pa.array(tb_, pa.string()),
            "n_both": pa.array(nab, pa.int64()),
            "kind": pa.array(["p"] * len(ta), pa.string())})
        marg = pa.table({
            "tool_a": pa.array(tools_sorted, pa.string()),
            "tool_b": pa.array([""] * nt, pa.string()),
            "n_both": pa.array(margins, pa.int64()),
            "kind": pa.array(["m"] * nt, pa.string())})
        tot = pa.table({
            "tool_a": pa.array([""], pa.string()),
            "tool_b": pa.array([""], pa.string()),
            "n_both": pa.array([n_conv], pa.int64()),
            "kind": pa.array(["t"], pa.string())})
        return pa.concat_tables([pair, marg, tot])

    folded = _combine_partials(
        read_transcripts(sf_dir)
        .map_batches(tag, batch_format="pyarrow")
        .groupby("bucket").map_groups(grp, batch_format="pyarrow"),
        ["kind", "tool_a", "tool_b"], {"n_both": "n_both"})
    kind = folded.column("kind").to_numpy(zero_copy_only=False)
    ta = folded.column("tool_a").to_numpy(zero_copy_only=False)
    tb_ = folded.column("tool_b").to_numpy(zero_copy_only=False)
    n = folded.column("n_both").to_numpy(zero_copy_only=False)
    marg = {t: int(v) for t, v in zip(ta[kind == "m"], n[kind == "m"])}
    total = int(n[kind == "t"].sum())
    sel = kind == "p"
    return pa.table({
        "tool_a": pa.array(ta[sel], pa.string()),
        "tool_b": pa.array(tb_[sel], pa.string()),
        "n_both": pa.array(n[sel], pa.int64()),
        "n_a": pa.array([marg[t] for t in ta[sel]], pa.int64()),
        "n_b": pa.array([marg[t] for t in tb_[sel]], pa.int64()),
        "n_total": pa.array([total] * int(sel.sum()), pa.int64())})


SQL_TOOL_AFFINITY = f"""{_T},
d AS (SELECT DISTINCT conv_id, tool FROM transcripts
      WHERE tool IS NOT NULL AND conv_id IS NOT NULL),
marg AS (SELECT tool, COUNT(*) AS n FROM d GROUP BY tool),
tot AS (SELECT COUNT(DISTINCT conv_id) AS n FROM d)
SELECT a.tool AS tool_a, b.tool AS tool_b,
       CAST(COUNT(*) AS BIGINT) AS n_both,
       CAST(ANY_VALUE(ma.n) AS BIGINT) AS n_a,
       CAST(ANY_VALUE(mb.n) AS BIGINT) AS n_b,
       CAST(ANY_VALUE(tot.n) AS BIGINT) AS n_total
FROM d a
JOIN d b ON a.conv_id = b.conv_id AND a.tool < b.tool
JOIN marg ma ON ma.tool = a.tool
JOIN marg mb ON mb.tool = b.tool
CROSS JOIN tot
GROUP BY a.tool, b.tool"""


def q_lang_confusion(sf_dir: str):
    """Model-eval confusion matrix: the LangId actor stage's
    prediction crossed with the labeled ``lang`` column, counted per
    (label, prediction) cell — the quality report that decides
    whether a heuristic classifier is good enough to gate a corpus.
    The classifier state (compiled regexes, stopword profiles) loads
    once per actor; each batch scores locally and emits tiny
    (lang, lang_pred, n) partials — no shuffle, driver fold of
    labels × predictions cells."""
    from .textops.analysis import LangId

    class Confusion(LangId):
        def __call__(self, tbl: pa.Table) -> pa.Table:
            pred = LangId.__call__(self, tbl)  # row-aligned
            g = pa.table({"lang": tbl.column("lang"),
                          "lang_pred": pred.column("lang_pred")}) \
                .group_by(["lang", "lang_pred"]) \
                .aggregate([([], "count_all")])
            return pa.table({
                "lang": g.column("lang"),
                "lang_pred": g.column("lang_pred"),
                "n": pc.cast(g.column("count_all"), pa.int64())})

    parts = _read(sf_dir, "documents", ["doc_id", "text", "lang"],
                  blocks=16) \
        .map_batches(Confusion(), batch_format="pyarrow")
    return _combine_partials(parts, ["lang", "lang_pred"],
                             {"n": "n"})


SQL_LANG_CONFUSION = r"""WITH f AS (
  SELECT lang,
    len(regexp_extract_all(text, '[^\x00-\x7F]')) AS n_na,
    length(text) AS n_ch,
    list_distinct(regexp_extract_all(lower(text), '[a-z]+')) AS toks
  FROM documents),
c AS (SELECT lang, n_na, n_ch,
  len(list_intersect(toks, ['the','and','of','a','to','in','is','it',
                            'for','on'])) AS en,
  len(list_intersect(toks, ['el','la','de','que','y','en','un','los',
                            'se','no'])) AS es,
  len(list_intersect(toks, ['der','die','und','das','in','von','zu',
                            'den','mit','ist'])) AS de,
  len(list_intersect(toks, ['le','la','de','et','les','des','un','une',
                            'du','est'])) AS fr
  FROM f),
p AS (SELECT lang, CASE
  WHEN n_na > 0.3 * n_ch THEN 'zh'
  WHEN en = 0 AND es = 0 AND de = 0 AND fr = 0 THEN 'und'
  WHEN en >= es AND en >= de AND en >= fr THEN 'en'
  WHEN es >= de AND es >= fr THEN 'es'
  WHEN de >= fr THEN 'de'
  ELSE 'fr' END AS lang_pred FROM c)
SELECT lang, lang_pred, CAST(COUNT(*) AS BIGINT) AS n
FROM p GROUP BY lang, lang_pred"""


def q_repeat_collapse(sf_dir: str):
    """Consecutive-duplicate compression — the syslog/journald "last
    message repeated N times" operator: within each conversation's
    turn order, runs of identical adjacent texts collapse to their
    first turn plus a repeat count. One conv-bucket shuffle; the
    per-bucket kernel is a lexsort + adjacent object-equality scan
    (None adjacent to None joins the run — SQL IS NOT DISTINCT FROM
    semantics, asserted in tests) with reduceat-free run arithmetic;
    null conversations are dropped on both engines. Output rows
    shrink the stream; nothing re-expands downstream."""
    import numpy as np

    n_buckets = adaptive_buckets(_nrows(sf_dir, "events"))

    def tag(t: pa.Table) -> pa.Table:
        sub = t.select(["conv_id", "turn_idx", "text"]) \
            .filter(pc.is_valid(t.column("conv_id")))
        return sub.append_column(
            "bucket", fnv1a_bucket(sub.column("conv_id"), n_buckets))

    def grp(g: pa.Table) -> pa.Table:
        conv = pc.dictionary_encode(g.column("conv_id")
                                    .combine_chunks())
        cc = conv.indices.to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        turn = g.column("turn_idx").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        text = np.asarray(g.column("text").to_pylist(), dtype=object)
        order = np.lexsort((turn, cc))
        cs, ts_, xs = cc[order], turn[order], text[order]
        if len(cs) == 0:
            return pa.table({"conv_id": pa.array([], pa.string()),
                             "turn_idx": pa.array([], pa.int32()),
                             "text": pa.array([], pa.string()),
                             "n_times": pa.array([], pa.int64())})
        # python object != is None-safe: None != None is False, so
        # null runs join (IS NOT DISTINCT FROM)
        new_run = np.append(True, (cs[1:] != cs[:-1])
                            | (xs[1:] != xs[:-1]))
        starts = np.flatnonzero(new_run)
        lens = np.diff(np.append(starts, len(cs)))
        names = np.asarray(conv.dictionary.to_pylist(), dtype=object)
        return pa.table({
            "conv_id": pa.array(names[cs[starts]], pa.string()),
            "turn_idx": pa.array(ts_[starts].astype(np.int32),
                                 pa.int32()),
            "text": pa.array(xs[starts], pa.string()),
            "n_times": pa.array(lens.astype(np.int64), pa.int64())})

    return read_transcripts(sf_dir) \
        .map_batches(tag, batch_format="pyarrow") \
        .groupby("bucket").map_groups(grp, batch_format="pyarrow")


SQL_REPEAT_COLLAPSE = f"""{_T},
d AS (SELECT conv_id, turn_idx, text,
        CASE WHEN text IS NOT DISTINCT FROM
               LAG(text) OVER (PARTITION BY conv_id ORDER BY turn_idx)
             THEN 0 ELSE 1 END AS brk
      FROM transcripts WHERE conv_id IS NOT NULL),
r AS (SELECT conv_id, turn_idx, text,
        SUM(brk) OVER (PARTITION BY conv_id ORDER BY turn_idx
                       ROWS UNBOUNDED PRECEDING) AS rid
      FROM d)
SELECT conv_id, CAST(MIN(turn_idx) AS INTEGER) AS turn_idx,
       MIN(text) AS text, CAST(COUNT(*) AS BIGINT) AS n_times
FROM r GROUP BY conv_id, rid"""


def q_rule_violations(sf_dir: str):
    """Cross-event constraint validation — the ingest-QA rule engine
    for event streams: count purchases that happen BEFORE their
    user's first signup, and purchases by users with NO signup at
    all (ordering/referential rules that a per-row validator cannot
    see). One user-bucket shuffle of the two event types only; the
    per-bucket kernel takes grouped signup minima (reduceat) and
    classifies every purchase with one searchsorted lookup. Both
    rules always report (0 when clean), so the result doubles as a
    monitoring time series."""
    import numpy as np

    n_buckets = adaptive_buckets(_nrows(sf_dir, "events"))
    rules = ["purchase_before_signup", "purchase_no_signup"]

    def tag(t: pa.Table) -> pa.Table:
        et = t.column("event_type")
        sub = pa.table({"u": t.column("user_id"),
                        "ts": pc.cast(t.column("ts"), pa.int64()),
                        "buy": pc.equal(et, "purchase")}) \
            .filter(pc.and_(
                pc.and_(pc.is_valid(t.column("user_id")),
                        pc.is_valid(t.column("ts"))),
                pc.is_in(et, value_set=pa.array(
                    ["signup", "purchase"], pa.string()))))
        return sub.append_column("bucket", int_bucket(sub.column("u"),
                                                      n_buckets))

    def grp(g: pa.Table) -> pa.Table:
        u = g.column("u").to_numpy(zero_copy_only=False)
        ts = g.column("ts").to_numpy(zero_copy_only=False)
        buy = g.column("buy").to_numpy(zero_copy_only=False)
        su, st = u[~buy], ts[~buy]
        order = np.argsort(su, kind="stable")
        su, st = su[order], st[order]
        starts = np.flatnonzero(np.append(True, su[1:] != su[:-1])) \
            if len(su) else np.array([], np.int64)
        sig_users = su[starts]
        first_sig = np.minimum.reduceat(st, starts) if len(starts) \
            else np.array([], np.int64)
        pu, pt = u[buy], ts[buy]
        if len(sig_users) == 0:
            has_sig = np.zeros(len(pu), bool)
            before = np.zeros(len(pu), bool)
        else:
            idx = np.searchsorted(sig_users, pu)
            idx_c = np.clip(idx, 0, len(sig_users) - 1)
            has_sig = sig_users[idx_c] == pu
            before = has_sig & (pt < first_sig[idx_c])
        return pa.table({
            "rule": pa.array(rules, pa.string()),
            "n": pa.array([int(before.sum()),
                           int((~has_sig).sum() if len(pu) else 0)],
                          pa.int64())})

    folded = _combine_partials(
        _read(sf_dir, "events", ["user_id", "ts", "event_type"])
        .map_batches(tag, batch_format="pyarrow")
        .groupby("bucket").map_groups(grp, batch_format="pyarrow"),
        ["rule"], {"n": "n"},
        seed=pa.table({"rule": pa.array(rules, pa.string()),
                       "n": pa.array([0, 0], pa.int64())}))
    have = dict(zip(folded.column("rule").to_pylist(),
                    folded.column("n").to_pylist()))
    return pa.table({
        "rule": pa.array(rules, pa.string()),
        "n": pa.array([int(have.get(r, 0)) for r in rules],
                      pa.int64())})


SQL_RULE_VIOLATIONS = """WITH e AS (
  SELECT user_id, ts, event_type FROM events
  WHERE user_id IS NOT NULL AND ts IS NOT NULL),
s AS (SELECT user_id, MIN(ts) AS first_signup FROM e
      WHERE event_type = 'signup' GROUP BY user_id),
p AS (SELECT e.user_id, e.ts, s.first_signup
      FROM e LEFT JOIN s USING (user_id)
      WHERE e.event_type = 'purchase')
SELECT 'purchase_before_signup' AS rule,
       CAST(COUNT(*) FILTER (first_signup IS NOT NULL
                             AND ts < first_signup) AS BIGINT) AS n
FROM p
UNION ALL
SELECT 'purchase_no_signup',
       CAST(COUNT(*) FILTER (first_signup IS NULL) AS BIGINT)
FROM p"""


def _scratch_dir(prefix: str, sf_dir: str) -> str:
    """Per-(corpus, pid) /tmp scratch: repeated runs in one process
    reuse and overwrite; concurrent processes get disjoint dirs; and
    dirs left by DEAD pids are purged here (live siblings are left
    alone — deleting them would reintroduce the cross-process race
    this scheme exists to prevent), so repeated fresh-process
    bench/gate invocations cannot accumulate /tmp copies."""
    import glob
    import hashlib
    import os
    import shutil

    base = f"/tmp/{prefix}_" + hashlib.md5(
        sf_dir.encode()).hexdigest()[:12]
    # legacy fixed-name dirs (pre-pid scheme) can never belong to a
    # live process under the current naming — purge unconditionally
    shutil.rmtree(base, ignore_errors=True)
    for stale in glob.glob(f"{base}_*"):
        try:
            pid = int(stale.rsplit("_", 1)[1])
        except ValueError:
            continue
        if pid != os.getpid() and not os.path.exists(f"/proc/{pid}"):
            shutil.rmtree(stale, ignore_errors=True)
    out_dir = f"{base}_{os.getpid()}"
    shutil.rmtree(out_dir, ignore_errors=True)
    return out_dir


def q_csv_roundtrip(sf_dir: str):
    """CSV sink→source round trip as a gated query (the third
    interchange format after parquet and NDJSON): project events to
    its CSV-lossless columns, write with Ray's parallel CSV writer to
    scratch, re-ingest with ``ray.data.read_csv`` (schema inferred
    back to int64/string), and return the rows — exact value parity
    against the original parquet. CSV remains an EDGE format: headers
    per shard, no nested types; the scale-path interchange stays
    parquet (documented, as for NDJSON)."""
    import ray.data as rd

    out_dir = _scratch_dir("raybeats_csv_rt", sf_dir)
    _read(sf_dir, "events", ["event_id", "event_type"]) \
        .write_csv(out_dir)
    return rd.read_csv(out_dir)


SQL_CSV_ROUNDTRIP = "SELECT event_id, event_type FROM events"


def q_pii_report(sf_dir: str):
    """Per-source PII audit — the scoreboard a compliance review reads
    BEFORE releasing a corpus: per source, total email/SSN/IP hits and
    how many documents carried any (same planted corpus and staged
    count-then-replace kernel as `pii_scrub`, so the two queries are
    provably consistent). Narrow fixed-width (source, sums) partials;
    no shuffle."""
    from .textops.curation import pii_scrub
    from .util import imod

    def partial(t: pa.Table) -> pa.Table:
        did = t.column("doc_id")
        s = pii_scrub(pa.table({
            "doc_id": did,
            "text": _plant_pii(did, t.column("text"))}))
        hits = pc.add(pc.add(s.column("n_email"), s.column("n_ssn")),
                      s.column("n_ip"))
        g = pa.table({
            "source": t.column("source"),
            "n_email": s.column("n_email"),
            "n_ssn": s.column("n_ssn"),
            "n_ip": s.column("n_ip"),
            "hit": pc.cast(pc.greater(hits, 0), pa.int64())}) \
            .group_by("source").aggregate(
                [("n_email", "sum"), ("n_ssn", "sum"),
                 ("n_ip", "sum"), ("hit", "sum")])
        return pa.table({
            "source": g.column("source"),
            "n_email": g.column("n_email_sum"),
            "n_ssn": g.column("n_ssn_sum"),
            "n_ip": g.column("n_ip_sum"),
            "n_docs_hit": g.column("hit_sum")})

    return _combine_partials(
        _read(sf_dir, "documents", ["doc_id", "text", "source"],
              blocks=16)
        .map_batches(partial, batch_format="pyarrow"),
        ["source"], {"n_email": "n_email", "n_ssn": "n_ssn",
                     "n_ip": "n_ip", "n_docs_hit": "n_docs_hit"})


SQL_PII_REPORT = r"""WITH d AS (
  SELECT doc_id, source, CASE WHEN doc_id % 7 = 0 THEN text ||
    ' Contact user' || CAST(doc_id AS VARCHAR) ||
    '@example.com ssn 123-45-6789 ip 10.0.0.1'
    ELSE text END AS t0 FROM documents),
s1 AS (SELECT doc_id, source,
  CAST(length(regexp_extract_all(t0,
    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS BIGINT)
    AS n_email,
  regexp_replace(t0, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}',
    '<EMAIL>', 'g') AS t1 FROM d),
s2 AS (SELECT doc_id, source, n_email,
  CAST(length(regexp_extract_all(t1, '\b\d{3}-\d{2}-\d{4}\b'))
    AS BIGINT) AS n_ssn,
  regexp_replace(t1, '\b\d{3}-\d{2}-\d{4}\b', '<SSN>', 'g') AS t2
  FROM s1),
s3 AS (SELECT source, n_email, n_ssn,
  CAST(length(regexp_extract_all(t2,
    '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b')) AS BIGINT) AS n_ip
  FROM s2)
SELECT source, CAST(SUM(n_email) AS BIGINT) AS n_email,
  CAST(SUM(n_ssn) AS BIGINT) AS n_ssn,
  CAST(SUM(n_ip) AS BIGINT) AS n_ip,
  CAST(COUNT(*) FILTER (n_email + n_ssn + n_ip > 0) AS BIGINT)
    AS n_docs_hit
FROM s3 GROUP BY source"""


def q_split_novelty(sf_dir: str):
    """Generalization-gap eval: how many DISTINCT validation-split
    bigrams never occur in the train split — the n-gram novelty
    number that tells you whether a held-out split actually holds
    anything out (split rule and tokenizer single-sourced from
    `hash_split` and `flat_tokens`, so this cannot drift from the
    split/bigram queries). Per-batch distinct (bigram, split-flag)
    pairs bound the one bigram-hash shuffle; bigrams partition
    disjointly across buckets, so per-bucket novel/val counts SUM
    exactly; the driver folds one fixed-width row per bucket."""
    import numpy as np

    from .textops.analysis import flat_tokens
    from .textops.curation import hash_split

    n_buckets = adaptive_buckets(50 * _nrows(sf_dir, "documents"))

    def tag(t: pa.Table) -> pa.Table:
        sp = hash_split(t)  # row-aligned with t
        split = np.asarray(sp.column("split").to_pylist(), dtype=object)
        row_id, flat, _ = flat_tokens(t.column("text"))
        empty = pa.table({"bigram": pa.array([], pa.string()),
                          "it": pa.array([], pa.int64()),
                          "iv": pa.array([], pa.int64()),
                          "bucket": pa.array([], pa.int32())})
        if len(flat) < 2:
            return empty
        same_row = pa.array(row_id[:-1] == row_id[1:])
        a = flat.slice(0, len(flat) - 1).filter(same_row)
        b = flat.slice(1).filter(same_row)
        if len(a) == 0:
            return empty
        rows = row_id[:-1][row_id[:-1] == row_id[1:]]
        bsplit = split[rows]
        keep = (bsplit == "train") | (bsplit == "val")
        if not keep.any():
            return empty
        big = pc.binary_join_element_wise(a, b, " ") \
            .filter(pa.array(keep))
        is_train = bsplit[keep] == "train"
        d = pa.table({"bigram": big,
                      "it": pa.array(is_train.astype(np.int64),
                                     pa.int64()),
                      "iv": pa.array((~is_train).astype(np.int64),
                                     pa.int64())}) \
            .group_by("bigram").aggregate([("it", "max"),
                                           ("iv", "max")])
        out = pa.table({"bigram": d.column("bigram"),
                        "it": d.column("it_max"),
                        "iv": d.column("iv_max")})
        return out.append_column(
            "bucket", fnv1a_bucket(out.column("bigram"), n_buckets))

    def grp(g: pa.Table) -> pa.Table:
        f = g.group_by("bigram").aggregate([("it", "max"),
                                            ("iv", "max")])
        it = f.column("it_max").to_numpy(zero_copy_only=False)
        iv = f.column("iv_max").to_numpy(zero_copy_only=False)
        return pa.table({
            "k": pa.array([0], pa.int64()),
            "n_val_bigrams": pa.array([int(iv.sum())], pa.int64()),
            "n_novel_bigrams": pa.array(
                [int((iv & (1 - it)).sum())], pa.int64())})

    comb = _combine_partials(
        _read(sf_dir, "documents", ["doc_id", "text"], blocks=16)
        .map_batches(tag, batch_format="pyarrow")
        .groupby("bucket").map_groups(grp, batch_format="pyarrow"),
        ["k"], {"n_val_bigrams": "n_val_bigrams",
                "n_novel_bigrams": "n_novel_bigrams"},
        seed=pa.table({"k": pa.array([0], pa.int64()),
                       "n_val_bigrams": pa.array([0], pa.int64()),
                       "n_novel_bigrams": pa.array([0], pa.int64())}))
    return comb.drop_columns(["k"])


SQL_SPLIT_NOVELTY = r"""WITH h AS (
  SELECT text, CAST(CAST(doc_id AS HUGEINT) * 2654435761 % 4294967296
                    AS BIGINT) AS m FROM documents),
s AS (SELECT text,
        CASE WHEN xor(m, m >> 15) % 100 < 80 THEN 'train'
             WHEN xor(m, m >> 15) % 100 < 90 THEN 'val'
             ELSE 'test' END AS split FROM h),
t AS (SELECT split, regexp_extract_all(lower(text), '[a-z0-9]+')
        AS toks FROM s WHERE split IN ('train', 'val')),
b0 AS (SELECT split, unnest(list_transform(
         generate_series(1, greatest(len(toks) - 1, 0)),
         i -> toks[i] || ' ' || toks[i + 1])) AS bigram FROM t),
b AS (SELECT DISTINCT split, bigram FROM b0)
SELECT CAST(COUNT(*) AS BIGINT) AS n_val_bigrams,
       CAST(COUNT(*) FILTER (bigram NOT IN
         (SELECT bigram FROM b WHERE split = 'train')) AS BIGINT)
         AS n_novel_bigrams
FROM b WHERE split = 'val'"""


def q_encode_docs(sf_dir: str):
    """Tokenizer ENCODING — the text→ids step a training pipeline runs
    last: induce a 64-entry vocabulary from corpus token counts (rank
    by count desc, token asc), then encode every document as its
    comma-joined token-id sequence with -1 for OOV. Phase 1 is the
    token_topk shuffle (per-batch np.unique partials, one token
    groupby) reduced to a driver-side top-64; phase 2 broadcasts the
    tiny vocab and encodes each batch fully vectorized: one
    `flat_tokens` pass, one index_in against the vocab, and a
    per-row rebuild via offsets — no python loop over rows. Ids are
    emitted as a STRING so the cross-engine value hash stays exact."""
    import numpy as np

    from ray.data.aggregate import Sum

    from .textops.analysis import flat_tokens

    vocab_k = 64

    def count_partial(tbl: pa.Table) -> pa.Table:
        _, flat, _ = flat_tokens(tbl.column("text"))
        g = pa.table({"token": flat}).group_by("token") \
            .aggregate([([], "count_all")])
        return pa.table({"token": g.column("token"),
                         "n": pc.cast(g.column("count_all"),
                                      pa.int64())})

    # distributed top-k (the token_topk idiom): the full vocabulary
    # never reaches the driver — only the k winning rows do
    top = _read(sf_dir, "documents", ["text"], blocks=16) \
        .map_batches(count_partial, batch_format="pyarrow") \
        .groupby("token").aggregate(Sum("n", alias_name="n")) \
        .sort(["n", "token"], descending=[True, False]) \
        .limit(vocab_k)
    vocab = [r["token"] for r in top.take_all()]
    vocab_arr = pa.array(vocab, pa.string())

    def encode(tbl: pa.Table) -> pa.Table:
        row_id, flat, n_rows = flat_tokens(tbl.column("text"))
        ids = pc.fill_null(pc.cast(
            pc.index_in(flat, value_set=vocab_arr), pa.int64()), -1) \
            .to_numpy(zero_copy_only=False)
        id_str = np.empty(len(ids), dtype=object)
        for v in np.unique(ids):
            id_str[ids == v] = str(int(v))
        # per-row join: counts per row from row_id (rows with zero
        # tokens get the empty string)
        per_row = np.bincount(row_id, minlength=n_rows) \
            if len(row_id) else np.zeros(n_rows, np.int64)
        offs = np.concatenate([[0], np.cumsum(per_row)]).astype(
            np.int32)
        joined = pc.binary_join(
            pa.ListArray.from_arrays(pa.array(offs),
                                     pa.array(id_str, pa.string())),
            ",")
        return pa.table({"doc_id": tbl.column("doc_id"),
                         "token_ids": joined})

    return _read(sf_dir, "documents", ["doc_id", "text"], blocks=16) \
        .map_batches(encode, batch_format="pyarrow")


SQL_ENCODE_DOCS = r"""WITH t AS (
  SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+')
    AS toks FROM documents),
f AS (SELECT unnest(toks) AS token FROM t),
v AS (SELECT token,
        ROW_NUMBER() OVER (ORDER BY COUNT(*) DESC, token) - 1 AS id
      FROM f GROUP BY token
      ORDER BY COUNT(*) DESC, token LIMIT 64),
e AS (SELECT doc_id, i, toks[i] AS token
      FROM t, unnest(generate_series(1, greatest(len(toks), 0)))
        AS u(i)),
j AS (SELECT e.doc_id, e.i, COALESCE(v.id, -1) AS id
      FROM e LEFT JOIN v ON e.token = v.token)
SELECT t.doc_id,
  COALESCE((SELECT string_agg(CAST(id AS VARCHAR), ',' ORDER BY i)
            FROM j WHERE j.doc_id = t.doc_id), '') AS token_ids
FROM t"""


def q_dataset_card(sf_dir: str):
    """One-row dataset card — the release-notes numbers a corpus ships
    with: document count, exact token and codepoint totals, distinct
    language/source counts, and the exact count of md5 duplicate
    classes (docs − distinct fingerprints = removable copies). One
    narrow pass emits fixed-width partials for the scalar measures;
    the two tiny dimensions fold as distinct sets; the fingerprint
    arm reuses the dedup_exact md5 and moves only per-batch DISTINCT
    hashes through one adaptive shuffle."""
    import numpy as np

    from .textops.analysis import flat_tokens
    from .textops.dedup import _md5_column

    n_buckets = adaptive_buckets(_nrows(sf_dir, "documents"))

    def partial(t: pa.Table) -> pa.Table:
        _, flat, _ = flat_tokens(t.column("text"))
        chars = pc.sum(pc.utf8_length(t.column("text"))).as_py() or 0
        return pa.table({
            "k": pa.array([0], pa.int64()),
            "n_docs": pa.array([len(t)], pa.int64()),
            "n_tokens": pa.array([len(flat)], pa.int64()),
            "n_chars": pa.array([int(chars)], pa.int64())})

    scalars = _combine_partials(
        _read(sf_dir, "documents", ["text"], blocks=16)
        .map_batches(partial, batch_format="pyarrow"),
        ["k"], {"n_docs": "n_docs", "n_tokens": "n_tokens",
                "n_chars": "n_chars"})

    def dims(t: pa.Table) -> pa.Table:
        return pa.table({"lang": t.column("lang"),
                         "source": t.column("source")}) \
            .group_by(["lang", "source"]).aggregate([])

    dim_rows = pa.concat_tables(list(
        _read(sf_dir, "documents", ["lang", "source"], blocks=16)
        .map_batches(dims, batch_format="pyarrow")
        .iter_batches(batch_size=None, batch_format="pyarrow")))
    # COUNT(DISTINCT x) excludes NULLs — mirror exactly
    n_langs = len(set(dim_rows.column("lang").to_pylist()) - {None})
    n_sources = len(set(dim_rows.column("source").to_pylist())
                    - {None})

    def fp(t: pa.Table) -> pa.Table:
        # null text → null fingerprint; COUNT(DISTINCT md5(text))
        # excludes it, so drop before the distinct fold
        fps = _md5_column(t.column("text").to_pylist())
        d = pa.table({"fp": fps}).filter(pc.is_valid(fps)) \
            .group_by("fp").aggregate([])
        return d.append_column("bucket",
                               fnv1a_bucket(d.column("fp"), n_buckets))

    def fp_count(g: pa.Table) -> pa.Table:
        return pa.table({"n": pa.array(
            [g.group_by("fp").aggregate([]).num_rows], pa.int64())})

    n_distinct = 0
    for t in _read(sf_dir, "documents", ["text"], blocks=16) \
            .map_batches(fp, batch_format="pyarrow") \
            .groupby("bucket").map_groups(fp_count,
                                          batch_format="pyarrow") \
            .iter_batches(batch_size=None, batch_format="pyarrow"):
        n_distinct += int(pc.sum(t.column("n")).as_py() or 0)

    s = scalars.to_pylist()[0]
    return pa.table({
        "n_docs": pa.array([s["n_docs"]], pa.int64()),
        "n_tokens": pa.array([s["n_tokens"]], pa.int64()),
        "n_chars": pa.array([s["n_chars"]], pa.int64()),
        "n_langs": pa.array([n_langs], pa.int64()),
        "n_sources": pa.array([n_sources], pa.int64()),
        "n_dup_docs": pa.array([s["n_docs"] - n_distinct],
                               pa.int64())})


SQL_DATASET_CARD = r"""SELECT
  CAST(COUNT(*) AS BIGINT) AS n_docs,
  CAST(SUM(len(regexp_extract_all(lower(text), '[a-z0-9]+')))
       AS BIGINT) AS n_tokens,
  CAST(SUM(length(text)) AS BIGINT) AS n_chars,
  CAST(COUNT(DISTINCT lang) AS BIGINT) AS n_langs,
  CAST(COUNT(DISTINCT source) AS BIGINT) AS n_sources,
  CAST(COUNT(*) - COUNT(DISTINCT md5(text)) AS BIGINT) AS n_dup_docs
FROM documents"""


def q_pack_efficiency(sf_dir: str):
    """Packing-fill report over the pack_sequences assignment: for
    each pack, the exact token total, histogrammed by capacity decile
    (bin = tokens·10 // 4096; the greedy prefix-sum packer can
    overshoot a boundary, so bins above 10 are real) — THE metric
    that says how much training throughput the packer wastes. Pack
    fragments straddle batch boundaries, so per-batch (pack, tokens)
    partials fold exactly through one pack-bucket shuffle before the
    tiny bin histogram; the pack table itself (corpus/4096 rows)
    never reaches the driver."""
    cap = 4096
    n_buckets = adaptive_buckets(max(
        _nrows(sf_dir, "documents") // 64, 1))

    def tag(t: pa.Table) -> pa.Table:
        g = t.group_by("pack_id").aggregate([("n_tokens", "sum")])
        out = pa.table({"pack_id": g.column("pack_id"),
                        "tokens": pc.cast(g.column("n_tokens_sum"),
                                          pa.int64())})
        return out.append_column(
            "bucket", int_bucket(out.column("pack_id"), n_buckets))

    def grp(g: pa.Table) -> pa.Table:
        f = g.group_by("pack_id").aggregate([("tokens", "sum")])
        tok = pc.cast(f.column("tokens_sum"), pa.int64())
        bins = pa.table({"fill_decile": pc.cast(pc.floor(pc.divide(
            pc.multiply(tok, 10), cap)), pa.int64())}) \
            .group_by("fill_decile").aggregate([([], "count_all")])
        return pa.table({
            "fill_decile": bins.column("fill_decile"),
            "n_packs": pc.cast(bins.column("count_all"), pa.int64())})

    return _combine_partials(
        q_pack_sequences(sf_dir)
        .map_batches(tag, batch_format="pyarrow")
        .groupby("bucket").map_groups(grp, batch_format="pyarrow"),
        ["fill_decile"], {"n_packs": "n_packs"})


SQL_PACK_EFFICIENCY = r"""WITH tok AS (
  SELECT doc_id,
    CAST(length(regexp_extract_all(text, '[a-zA-Z0-9]+')) AS BIGINT)
      AS n_tokens
  FROM documents),
c AS (
  SELECT doc_id, n_tokens,
    SUM(n_tokens) OVER (ORDER BY doc_id
                        ROWS BETWEEN UNBOUNDED PRECEDING
                        AND CURRENT ROW) AS cum
  FROM tok),
p AS (SELECT CAST((cum - n_tokens) // 4096 AS BIGINT) AS pack_id,
             n_tokens FROM c),
s AS (SELECT pack_id, SUM(n_tokens) AS tokens FROM p
      GROUP BY pack_id)
SELECT CAST(tokens * 10 // 4096 AS BIGINT) AS fill_decile,
       CAST(COUNT(*) AS BIGINT) AS n_packs
FROM s GROUP BY 1"""


def q_prefix_dups(sf_dir: str):
    """Prefix-duplicate detection: flag every doc whose text is a
    PROPER prefix of another doc's text — the web-crawl artifact
    (truncated fetches, re-crawled pages with appended footers) that
    exact-hash dedup misses and MinHash only catches above the
    jaccard threshold.

    Distributed contract: a proper-prefix pair shares its first 4
    codeunits, so routing by ``fnv1a(first-4-cu slice)`` co-locates
    every pair with len(prefix) >= 4 in one group — NO global string
    sort. Within a group, the sorted-adjacency theorem (the set of
    strings extending X is contiguous immediately after X in sorted
    order) reduces the check to one vectorized byte-compare between
    each distinct text and its successor, over the group's UTF-8
    buffer via the offsets window (never per-row Python). Texts
    shorter than 4 codeunits (can be a prefix of docs in ANY bucket)
    are a bounded broadcast side: a parquet-pushdown pre-pass on the
    ``n_chars`` stats column collects them driver-side, the tag pass
    probes every batch against them (``pc.starts_with``, one scalar
    pattern per short text), and bucket ``-1`` folds the hit markers —
    zero extra rows when the corpus has no shorts (the common case)."""
    import numpy as np

    n_docs = _nrows(sf_dir, "documents")
    n_buckets = adaptive_buckets(n_docs)

    import pyarrow.dataset as pads
    shorts_t = pads.dataset(f"{sf_dir}/documents.parquet").to_table(
        columns=["doc_id", "text"],
        filter=(pads.field("n_chars") < 8) & (pads.field("n_chars") > 0))
    sl = pc.utf8_length(shorts_t.column("text"))
    shorts_t = shorts_t.filter(
        pc.and_(pc.greater(sl, 0), pc.less(sl, 4)))
    short_texts = shorts_t.column("text").to_pylist()
    short_ids = shorts_t.column("doc_id").to_pylist()
    short_lens = pc.utf8_length(shorts_t.column("text")).to_pylist()

    def tag(t: pa.Table) -> pa.Table:
        txt = t.column("text")
        ln = pc.utf8_length(txt)
        keep = pc.and_(pc.is_valid(txt), pc.greater_equal(ln, 4))
        sub = t.filter(keep)
        head = pc.utf8_slice_codeunits(sub.column("text"), 0, 4)
        out = pa.table({
            "doc_id": sub.column("doc_id"),
            "text": sub.column("text"),
            "bucket": pc.cast(fnv1a_bucket(head, n_buckets),
                              pa.int32())})
        if short_texts:
            # presence markers: short i extended by some row here
            hit_rows = []
            for i, st in enumerate(short_texts):
                m = pc.and_(pc.starts_with(txt, st),
                            pc.not_equal(txt, st))
                if pc.any(pc.and_(pc.is_valid(txt), m)).as_py():
                    hit_rows.append(i)
            if hit_rows:
                out = pa.concat_tables([out, pa.table({
                    "doc_id": pa.array([-1 - i for i in hit_rows],
                                       pa.int64()),
                    "text": pa.array([None] * len(hit_rows),
                                     pa.string()),
                    "bucket": pa.array([-1] * len(hit_rows),
                                       pa.int32())})])
        return out

    def grp(g: pa.Table) -> pa.Table:
        b = g.column("bucket")[0].as_py()
        if b == -1:
            # fold the short-hit markers: distinct short index →
            # that short doc's output row
            idx = np.unique(-1 - g.column("doc_id")
                            .to_numpy(zero_copy_only=False))
            return pa.table({
                "doc_id": pa.array([short_ids[i] for i in idx],
                                   pa.int64()),
                "n_chars": pa.array([short_lens[i] for i in idx],
                                    pa.int64())})
        txt = g.column("text").combine_chunks()
        uniq = pc.unique(txt)
        s = uniq.take(pc.sort_indices(uniq))  # UTF-8 byte == cp order
        s = s.cast(pa.large_string())         # int64 offsets buffer
        offs = np.frombuffer(s.buffers()[1], np.int64,
                             len(s) + 1 + s.offset)[s.offset:]
        base = offs[0]
        buf = np.frombuffer(s.buffers()[2], np.uint8)
        la = np.diff(offs)                       # byte length per text
        # adjacent pair (i, i+1): prefix iff la[i] < la[i+1] and the
        # first la[i] bytes match — one exploded elementwise compare
        cand = np.flatnonzero(la[:-1] < la[1:])
        pref = np.zeros(len(s), bool)
        if len(cand):
            seg = la[cand]
            a0 = np.repeat(offs[cand] - base, seg) + _aranges(seg)
            b0 = np.repeat(offs[cand + 1] - base, seg) + _aranges(seg)
            eq = buf[a0] == buf[b0]
            bounds = np.concatenate([[0], np.cumsum(seg)[:-1]])
            pref[cand] = np.logical_and.reduceat(eq, bounds)
        flagged = s.filter(pa.array(pref))
        hit = pc.is_in(txt, value_set=flagged)
        sel = g.filter(hit)
        return pa.table({
            "doc_id": sel.column("doc_id"),
            "n_chars": pc.cast(pc.utf8_length(sel.column("text")),
                               pa.int64())})

    return _read(sf_dir, "documents", ["doc_id", "text"]) \
        .map_batches(tag, batch_format="pyarrow") \
        .groupby("bucket").map_groups(grp, batch_format="pyarrow")


def _aranges(lens):
    """Concatenated ``arange(l)`` per segment — the shared explode
    helper (np.repeat of exclusive bases subtracted from a global
    arange)."""
    import numpy as np
    total = int(lens.sum())
    bases = np.repeat(np.concatenate([[0], np.cumsum(lens)[:-1]]), lens)
    return np.arange(total, dtype=np.int64) - bases


SQL_PREFIX_DUPS = """WITH nz AS (
  SELECT doc_id, text FROM documents
  WHERE text IS NOT NULL AND length(text) > 0),
d AS (SELECT DISTINCT text FROM nz),
s AS (SELECT text, lead(text) OVER (ORDER BY text) AS nxt FROM d),
p AS (SELECT text FROM s
      WHERE nxt IS NOT NULL AND starts_with(nxt, text)
        AND nxt <> text)
SELECT nz.doc_id, CAST(length(nz.text) AS BIGINT) AS n_chars
FROM nz JOIN p USING (text)"""


def q_triangle_parts(sf_dir: str, *, edge_budget: int | None = None):
    """Triangle counting on the part co-purchase graph (distinct part
    pairs sharing an order): top-25 parts by triangle participation —
    the graph-density / community-strength primitive (a part in many
    triangles sits in a dense substitute/complement cluster). Fourth
    member of the graph family (pagerank_iter = propagation,
    dedup_clusters = components, degree_dist = degrees).

    Exactly-once via total-order orientation: orient every edge from
    its smaller (degree, id) endpoint; each triangle then has exactly
    ONE node with both triangle edges outgoing, so wedges enumerated
    per-source count each triangle once, and max out-degree is
    O(sqrt(m)) even on skewed graphs.

    TWO plans behind an edge-count budget switch — a footer-only
    pre-switch (``3 × lineitem rows``, exact for ≤7-item orders)
    backed by an exact runtime guard in the driver fold (aborts to
    the distributed plan past 1.25 × budget raw keys, so bulk-order
    corpora the heuristic underestimates still never blow the driver
    envelope). Small graphs (under ``edge_budget`` keys): (1) one orderkey-bucket cogroup emits
    locally-deduped part-pair keys, collected driver-side (the edge
    set is the BROADCAST side of this plan by design — 8 B/key,
    ~10 MB at sf0.1) where global unique / degrees / orientation are
    three vectorized numpy passes over edge-count arrays; (2) the
    oriented edges go back out via ``from_arrow`` into one src-bucket
    cogroup whose wedge-membership probe is a LOCAL searchsorted into
    the broadcast sorted key array — the 40M+ candidate wedges never
    enter a shuffle. Two executions total: every extra chained
    execution pays this box's multi-second floor.

    Above the budget (10^9+ edges — the broadcast side would outgrow
    driver heap and object store) the FULLY DISTRIBUTED plan
    (:func:`_triangle_counts_cogroup`) runs instead: edge-hash
    cogroup dedup, half-edge degree cogroup, per-edge orientation
    cogroup, then a (w1,w2)-bucket cogroup of wedge rows against edge
    rows — nothing edge- or wedge-proportional ever sits on the
    driver. More exchange floors, so it is the big-graph path only;
    both plans share Stage A and the top-25 epilogue and are
    parity-tested against each other and the oracle
    (``triangle_parts_dist`` pins ``edge_budget=0``)."""
    import numpy as np

    n_li = _nrows(sf_dir, "lineitem")
    n_buckets = adaptive_buckets(n_li)
    if edge_budget is None:
        edge_budget = 150_000_000  # keys: ~1.2 GB driver-side

    def pair_tag(t: pa.Table) -> pa.Table:
        return t.append_column(
            "bucket", int_bucket(t.column("l_orderkey"), n_buckets))

    def pairs_grp(g: pa.Table) -> pa.Table:
        o = g.column("l_orderkey").to_numpy(zero_copy_only=False)
        p = g.column("l_partkey").to_numpy(zero_copy_only=False)
        op = np.unique(np.stack([o, p], axis=1), axis=0)
        o, p = op[:, 0], op[:, 1]
        starts = np.flatnonzero(np.append(True, o[1:] != o[:-1]))
        lens = np.diff(np.append(starts, len(o)))
        # explode per order: all (i < j) index pairs
        npairs = lens * (lens - 1) // 2
        ordr = np.repeat(starts, npairs)
        k = _aranges(npairs)
        # triangular unrank: pair k of a segment -> (i, j), i < j
        i = np.floor((2 * np.repeat(lens, npairs) - 1
                      - np.sqrt((2 * np.repeat(lens, npairs) - 1) ** 2
                                - 8 * k)) / 2).astype(np.int64)
        j = k - i * (2 * np.repeat(lens, npairs) - i - 1) // 2 + i + 1
        u = p[ordr + i]
        v = p[ordr + j]
        lo, hi = np.minimum(u, v), np.maximum(u, v)
        key = np.unique((lo << np.int64(32)) | hi)
        out = pa.table({"k": pa.array(key, pa.int64())})
        return out.append_column("bucket",
                                 int_bucket(out.column("k"), n_buckets))

    edges = _read(sf_dir, "lineitem", ["l_orderkey", "l_partkey"]) \
        .map_batches(pair_tag, batch_format="pyarrow") \
        .groupby("bucket").map_groups(pairs_grp,
                                      batch_format="pyarrow")

    # budget switch, two layers. Pre-switch: 3 × n_li bounds the
    # distinct pair count for ≤7-item orders ((L-1)/2 pairs per ROW —
    # TPC-H's shape); at or above budget nothing that grows with the
    # edge set may touch the driver, so take the all-cogroup plan
    # (>= so edge_budget=0 pins it even on an empty input). The
    # heuristic is NOT a bound for bulk-order corpora (mean L > 7),
    # so the driver fold below carries an exact runtime guard.
    if 3 * n_li >= edge_budget:
        return _triangle_top25(
            _triangle_counts_cogroup(edges, n_buckets))

    # execution 1: collect the per-order-bucket-deduped pair keys;
    # global dedup / degrees / orientation are vectorized numpy over
    # edge-count arrays on the driver (the edge set IS the broadcast
    # side below — holding it here is the algorithm's stated budget).
    # Runtime guard: the RAW key count (an overcount of the unique
    # edge set — cross-bucket duplicates inflate it, never deflate)
    # is tracked as batches land; past 1.25 × budget the fold ABORTS
    # to the distributed plan before driver memory leaves its
    # envelope. The rare mis-estimate pays one extra Stage-A scan
    # (edges re-executes lazily), never an OOM.
    fold_cap = edge_budget + (edge_budget >> 2)
    kparts, total = [], 0
    for t in edges.iter_batches(batch_size=None,
                                batch_format="pyarrow"):
        arr = t.column("k").to_numpy(zero_copy_only=False)
        total += len(arr)
        if total > fold_cap:
            del kparts
            return _triangle_top25(
                _triangle_counts_cogroup(edges, n_buckets))
        kparts.append(arr)
    ekeys = np.unique(np.concatenate(kparts)) if kparts \
        else np.array([], np.int64)  # unique output is sorted
    eu = ekeys >> np.int64(32)
    ev = ekeys & np.int64(0xFFFFFFFF)
    nodes_s, inv = np.unique(np.concatenate([eu, ev]),
                             return_inverse=True)
    degs_s = np.bincount(inv, minlength=len(nodes_s)).astype(np.int64)
    du = degs_s[inv[:len(eu)]]
    dv = degs_s[inv[len(eu):]]
    u_first = (du < dv) | ((du == dv) & (eu < ev))
    src = np.where(u_first, eu, ev)
    dst = np.where(u_first, ev, eu)

    import ray
    import ray.data as rd
    ekeys_ref = ray.put(ekeys)
    # Split the wedge stage by its WORK (Σ C(d⁺,2) wedges — known
    # exactly from the out-degrees), not by node count, and WITHOUT a
    # groupby shuffle: the driver already holds the oriented edges
    # (they ARE the broadcast side), so sort by src once here, cut at
    # src-segment boundaries nearest each work quantile, and ship each
    # contiguous slice as its own block via from_arrow_refs. A
    # from_arrow → groupby cogroup would start from ONE block and ran
    # the whole 41M-wedge graph as a single 20 s task; slicing
    # driver-side gives perfect balance with zero exchange. Skew-safe:
    # one src contributes ≤ C(max_out_degree, 2) wedges and
    # orientation caps max out-degree at O(√m).
    order = np.lexsort((dst, src))
    src, dst = src[order], dst[order]
    seg_starts = np.flatnonzero(
        np.append(True, src[1:] != src[:-1]))
    seg_lens = np.diff(np.append(seg_starts, len(src)))
    seg_work = seg_lens * (seg_lens - 1) // 2
    n_wedges = int(seg_work.sum())
    n_chunks = int(min(256, max(8, n_wedges // 500_000 + 1)))
    cum = np.cumsum(seg_work)
    # first segment index whose cumulative work crosses each quantile
    cuts = np.searchsorted(cum, np.arange(1, n_chunks)
                           * (n_wedges / n_chunks))
    bounds = np.unique(np.concatenate(
        [[0], seg_starts[np.minimum(cuts, len(seg_starts) - 1)],
         [len(src)]]))
    chunk_refs = [
        ray.put(pa.table({"src": pa.array(src[a:b], pa.int64()),
                          "dst": pa.array(dst[a:b], pa.int64())}))
        for a, b in zip(bounds[:-1], bounds[1:]) if b > a]
    if not chunk_refs:  # edge-free graph: nothing to enumerate
        return pa.table({"l_partkey": pa.array([], pa.int64()),
                         "n_triangles": pa.array([], pa.int64())})

    def wedge_grp(g: pa.Table) -> pa.Table:
        # Shared shift-based wedge enumeration (`_iter_wedges`);
        # membership probe per offset is a LOCAL searchsorted into
        # the broadcast sorted key array, so only hit triples are
        # ever accumulated. Input chunks arrive (src, dst)-sorted
        # from the driver cut.
        ek = ray.get(ekeys_ref)
        s = g.column("src").to_numpy(zero_copy_only=False)
        d = g.column("dst").to_numpy(zero_copy_only=False)
        node_parts = []
        for cen, w1, w2 in _iter_wedges(s, d):
            wkey = (w1 << np.int64(32)) | w2
            pos = np.searchsorted(ek, wkey)
            pos_c = np.minimum(pos, len(ek) - 1) if len(ek) else pos
            hit = (ek[pos_c] == wkey) if len(ek) else \
                np.zeros(len(wkey), bool)
            if hit.any():
                node_parts += [cen[hit], w1[hit], w2[hit]]
        if node_parts:
            nu, cnt = np.unique(np.concatenate(node_parts),
                                return_counts=True)
        else:
            nu = cnt = np.array([], np.int64)
        return pa.table({"node": pa.array(nu, pa.int64()),
                         "cnt": pa.array(cnt.astype(np.int64),
                                         pa.int64())})

    # seed: a triangle-free graph with edges leaves every wedge
    # partial empty, and Ray drops 0-row outputs — without the seed
    # the driver concat would have no tables at all
    counts = _combine_partials(
        rd.from_arrow_refs(chunk_refs)
        .map_batches(wedge_grp, batch_size=None,
                     batch_format="pyarrow"),
        ["node"], {"cnt": "n_triangles"},
        seed=pa.table({"node": pa.array([], pa.int64()),
                       "cnt": pa.array([], pa.int64())}))
    return _triangle_top25(counts)


def _iter_wedges(s, d):
    """Shift-based wedge enumeration over (src, dst)-SORTED oriented
    edges — the single source of the exactly-once invariant both
    triangle plans rely on: within a src segment dst is strictly
    increasing (edges distinct), so pairing positions (i, i+k) for
    k = 1..max_out_degree emits every unordered neighbor pair exactly
    once, ALREADY (lo, hi) ordered — no triangular unranking, no
    wedge-count-sized temporaries. Yields per-offset
    ``(center, w1, w2)`` arrays; work per offset is one vectorized
    slice-compare, and the loop ends at the orientation's O(sqrt(m))
    out-degree cap (no segment longer than k ⇒ none longer than
    k+1)."""
    import numpy as np
    n = len(s)
    k = 1
    while k < n:
        mask = s[:-k] == s[k:]
        if not mask.any():
            break
        yield s[:-k][mask], d[:-k][mask], d[k:][mask]
        k += 1


def _triangle_top25(counts: pa.Table) -> pa.Table:
    """Shared epilogue of both triangle plans: top-25 nodes by
    triangle participation, id-ascending within ties."""
    import numpy as np
    part = counts.column("node").to_numpy(zero_copy_only=False)
    nt = counts.column("n_triangles").to_numpy(zero_copy_only=False)
    top = np.lexsort((part, -nt))[:25]
    return pa.table({
        "l_partkey": pa.array(part[top], pa.int64()),
        "n_triangles": pa.array(nt[top], pa.int64())})


def _triangle_counts_cogroup(edges, n_buckets: int) -> pa.Table:
    """Fully distributed triangle participation counts — the
    big-graph plan of :func:`q_triangle_parts` (same semantics as the
    driver-broadcast plan; see its docstring for the switch).

    Five bucketed cogroup exchanges after the shared Stage A (steps
    1–4 below; step 4's output feeds the final key-bucket probe
    cogroup), each holding only its own slice:

    1. edge-key bucket — ``pairs_grp``'s locally-deduped keys arrive
       hashed by key, so a group-local ``np.unique`` IS the global
       edge dedup; each unique edge leaves as TWO half-edge rows
       (node, k) bucketed by node.
    2. node bucket — every half-edge of a node is co-located, so the
       node's global degree is the group-local count; rows leave
       re-bucketed by edge key carrying (k, node, deg).
    3. edge-key bucket — the two degree-stamped halves of each edge
       meet; orient src→dst from the smaller (degree, id) endpoint;
       oriented edges leave bucketed by src.
    4. src bucket — all out-edges of a src are co-located: sort
       (src, dst) once, shift-enumerate neighbor pairs (positions
       i, i+k share a src; dst strictly increasing ⇒ wedge already
       (lo, hi)-ordered, out-degree capped O(√m) by the orientation)
       into wedge rows keyed (w1<<32)|w2. The SAME group also emits
       its own edges re-keyed (lo<<32)|hi (each oriented edge lives
       in exactly one src group), so one output stream carries both
       sides — no materialize, no second consumer, no union. Both
       row kinds bucket by that key, and the closing-edge probe is a
       group-local searchsorted of wedge keys into the group's edge
       keys. Per-group pre-aggregated (node, cnt) partials are the
       only thing the driver ever folds.
    """
    import numpy as np

    M32 = np.int64(0xFFFFFFFF)

    def dedup_grp(g: pa.Table) -> pa.Table:
        k = np.unique(g.column("k").to_numpy(zero_copy_only=False))
        node = np.concatenate([k >> np.int64(32), k & M32])
        out = pa.table({
            "k": pa.array(np.concatenate([k, k]), pa.int64()),
            "node": pa.array(node, pa.int64())})
        return out.append_column(
            "bucket", int_bucket(out.column("node"), n_buckets))

    halves = edges.groupby("bucket").map_groups(
        dedup_grp, batch_format="pyarrow")

    def degree_grp(g: pa.Table) -> pa.Table:
        node = g.column("node").to_numpy(zero_copy_only=False)
        k = g.column("k").to_numpy(zero_copy_only=False)
        order = np.argsort(node, kind="stable")
        node, k = node[order], k[order]
        starts = np.flatnonzero(np.append(True, node[1:] != node[:-1]))
        lens = np.diff(np.append(starts, len(node)))
        out = pa.table({
            "k": pa.array(k, pa.int64()),
            "node": pa.array(node, pa.int64()),
            "deg": pa.array(np.repeat(lens, lens), pa.int64())})
        return out.append_column(
            "bucket", int_bucket(out.column("k"), n_buckets))

    degreed = halves.groupby("bucket").map_groups(
        degree_grp, batch_format="pyarrow")

    def orient_grp(g: pa.Table) -> pa.Table:
        k = g.column("k").to_numpy(zero_copy_only=False)
        node = g.column("node").to_numpy(zero_copy_only=False)
        deg = g.column("deg").to_numpy(zero_copy_only=False)
        order = np.lexsort((node, k))
        node, deg = node[order], deg[order]
        # rows pairwise per edge: (lo, hi) with lo < hi strict
        u, v = node[0::2], node[1::2]
        du, dv = deg[0::2], deg[1::2]
        u_first = (du < dv) | ((du == dv) & (u < v))
        src = np.where(u_first, u, v)
        dst = np.where(u_first, v, u)
        out = pa.table({"src": pa.array(src, pa.int64()),
                        "dst": pa.array(dst, pa.int64())})
        return out.append_column(
            "bucket", int_bucket(out.column("src"), n_buckets))

    oriented = degreed.groupby("bucket").map_groups(
        orient_grp, batch_format="pyarrow")

    def wedge_edge_rows_grp(g: pa.Table) -> pa.Table:
        s = g.column("src").to_numpy(zero_copy_only=False)
        d = g.column("dst").to_numpy(zero_copy_only=False)
        order = np.lexsort((d, s))
        s, d = s[order], d[order]
        keys, cens = [], []
        for c, w1, w2 in _iter_wedges(s, d):
            keys.append((w1 << np.int64(32)) | w2)
            cens.append(c)
        wkey = np.concatenate(keys) if keys else np.array([], np.int64)
        cen = np.concatenate(cens) if cens else np.array([], np.int64)
        # edge side from the same group: each oriented edge lives in
        # exactly ONE src group, so no dedup/materialize is needed
        ekey = (np.minimum(s, d) << np.int64(32)) | np.maximum(s, d)
        out = pa.table({
            "key": pa.array(np.concatenate([wkey, ekey]), pa.int64()),
            "center": pa.array(
                np.concatenate([cen, np.zeros(len(ekey), np.int64)]),
                pa.int64()),
            "side": pa.array(np.concatenate(
                [np.zeros(len(wkey), np.int8),
                 np.ones(len(ekey), np.int8)]), pa.int8())})
        return out.append_column(
            "bucket", int_bucket(out.column("key"), n_buckets))

    both = oriented.groupby("bucket").map_groups(
        wedge_edge_rows_grp, batch_format="pyarrow")

    def probe_grp(g: pa.Table) -> pa.Table:
        side = g.column("side").to_numpy(zero_copy_only=False)
        key = g.column("key").to_numpy(zero_copy_only=False)
        ek = np.unique(key[side == 1])
        wsel = side == 0
        wk = key[wsel]
        cen = g.column("center").to_numpy(zero_copy_only=False)[wsel]
        if len(ek) and len(wk):
            pos = np.minimum(np.searchsorted(ek, wk), len(ek) - 1)
            hit = ek[pos] == wk
        else:
            hit = np.zeros(len(wk), bool)
        if hit.any():
            whit = wk[hit]
            nodes = np.concatenate(
                [cen[hit], whit >> np.int64(32), whit & M32])
            nu, cnt = np.unique(nodes, return_counts=True)
        else:
            nu = cnt = np.array([], np.int64)
        return pa.table({"node": pa.array(nu, pa.int64()),
                         "cnt": pa.array(cnt.astype(np.int64),
                                         pa.int64())})

    seed = pa.table({"node": pa.array([], pa.int64()),
                     "cnt": pa.array([], pa.int64())})
    return _combine_partials(
        both.groupby("bucket").map_groups(
            probe_grp, batch_format="pyarrow"),
        ["node"], {"cnt": "n_triangles"}, seed=seed)


def q_triangle_parts_dist(sf_dir: str):
    """`triangle_parts` with ``edge_budget=0`` — pins the fully
    distributed cogroup plan so the big-graph path stays under the
    same DuckDB oracle gate as the broadcast plan every round."""
    return q_triangle_parts(sf_dir, edge_budget=0)


SQL_TRIANGLE_PARTS = """WITH e AS (
  SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
  FROM lineitem a JOIN lineitem b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey),
t AS (SELECT e1.u AS a, e1.v AS b, e2.v AS c
      FROM e e1 JOIN e e2 ON e2.u = e1.v
      JOIN e e3 ON e3.u = e1.u AND e3.v = e2.v),
n AS (SELECT unnest([a, b, c]) AS part FROM t)
SELECT part AS l_partkey, CAST(COUNT(*) AS BIGINT) AS n_triangles
FROM n GROUP BY 1 ORDER BY n_triangles DESC, l_partkey LIMIT 25"""


def q_ema_cents(sf_dir: str):
    """Per-user exponential moving average with half-life decay
    alpha = 1/2, in EXACT integer arithmetic: s_1 = c_1,
    s_i = floor((c_i + s_{i-1}) / 2) over round-half-away cents — the
    ordered RECURSIVE window shape (each row depends on the previous
    OUTPUT, not a prefix aggregate), which no associative fold can
    express. The integer floor recurrence makes every engine agree
    bit-for-bit where a float EMA's rounding order would diverge.

    Same bucketed-cogroup contract as running_sum; per group ONE
    lexsort, then the recurrence steps VECTORIZED ACROSS USERS: step k
    updates position k of every user's segment simultaneously
    (np arithmetic shift = floor for negatives), so the Python-level
    loop is bounded by the deepest per-user history in the bucket —
    never the row count."""
    import numpy as np

    n_buckets = adaptive_buckets(_nrows(sf_dir, "events"))

    def add_bucket(t: pa.Table) -> pa.Table:
        v = t.column("value")
        ok = pc.and_(pc.and_(pc.is_valid(v),
                             pc.invert(pc.is_nan(v))),
                     pc.and_(pc.is_valid(t.column("ts")),
                             pc.is_valid(t.column("user_id"))))
        sub = t.filter(ok)
        return sub.append_column(
            "bucket", int_bucket(sub.column("user_id"), n_buckets))

    def ema_grp(g: pa.Table) -> pa.Table:
        u = g.column("user_id").to_numpy(zero_copy_only=False)
        ts = pc.cast(g.column("ts"), pa.int64()) \
            .to_numpy(zero_copy_only=False)
        eid = g.column("event_id").to_numpy(zero_copy_only=False)
        cents = pc.cast(
            pc.round(pc.multiply(g.column("value"), 100.0),
                     round_mode="half_towards_infinity"),
            pa.int64()).to_numpy(zero_copy_only=False)
        order = np.lexsort((eid, ts, u))
        us, c = u[order], cents[order]
        starts = np.flatnonzero(np.append(True, us[1:] != us[:-1]))
        lens = np.diff(np.append(starts, len(us)))
        s = c.copy()
        for k in range(1, int(lens.max()) if len(lens) else 0):
            sel = lens > k
            p = starts[sel] + k
            s[p] = (c[p] + s[p - 1]) >> 1
        return pa.table({
            "event_id": pa.array(eid[order], pa.int64()),
            "user_id": pa.array(us, pa.int64()),
            "ema_cents": pa.array(s, pa.int64())})

    return _read(sf_dir, "events",
                 ["event_id", "user_id", "ts", "value"]) \
        .map_batches(add_bucket, batch_format="pyarrow") \
        .groupby("bucket").map_groups(ema_grp, batch_format="pyarrow")


SQL_EMA_CENTS = """WITH RECURSIVE base AS (
  SELECT event_id, user_id,
         CAST(round(value * 100) AS BIGINT) AS c,
         ROW_NUMBER() OVER (PARTITION BY user_id
                            ORDER BY ts, event_id) AS rn
  FROM events
  WHERE value IS NOT NULL AND NOT isnan(value)
    AND ts IS NOT NULL AND user_id IS NOT NULL),
r AS (
  SELECT event_id, user_id, rn, c AS s FROM base WHERE rn = 1
  UNION ALL
  SELECT b.event_id, b.user_id, b.rn,
         CAST(floor((b.c + r.s) / 2.0) AS BIGINT)
  FROM r JOIN base b ON b.user_id = r.user_id AND b.rn = r.rn + 1)
SELECT event_id, user_id, s AS ema_cents FROM r"""


_BM25_TERMS = ("dup", "spark", "window", "merge", "batch")


def _bm25_scores(sf_dir: str, k: int = 25) -> pa.Table:
    """BM25 retrieval: top-``k`` docs for a fixed 5-term query
    (k1 = 1.2, b = 0.75) with the ODDS idf — (N − df + 0.5)/(df + 0.5),
    i.e. Robertson's idf WITHOUT the log — because every op is then
    rational double arithmetic (+ − × ÷ are correctly-rounded IEEE in
    both engines, transcendental libm calls are not), so the oracle
    compares bit-for-bit. Per term the odds transform is monotone in
    the classic idf; the summed score is the exact-arithmetic variant.

    Plan: one tokenize pass projects (doc_id, dl, tf per term) — 7
    fixed-width ints, materialized because the stats fold AND the
    score pass both consume it (the quality_filter justification);
    df/N/total fold from one-row-per-batch partials at the driver; the
    score pass broadcasts 7 scalars in the closure and keeps a LOCAL
    top-25 per batch, so the final fold sees <= 25 rows per batch and
    nothing global sorts. Score terms sum left-associative t0..t4,
    mirrored exactly in the SQL; tf = 0 contributes an exact 0.0, so
    no branch is needed."""
    import numpy as np
    from .textops.analysis import flat_tokens

    terms = pa.array(_BM25_TERMS, pa.string())

    def project(t: pa.Table) -> pa.Table:
        sub = t.filter(pc.is_valid(t.column("text")))
        row_id, toks, n_rows = flat_tokens(sub.column("text"))
        dl = np.bincount(row_id, minlength=n_rows).astype(np.int64)
        code = pc.index_in(toks, value_set=terms) \
            .to_numpy(zero_copy_only=False)
        # index_in yields null (→ NaN via to_numpy) for misses
        codes = np.nan_to_num(code.astype(np.float64),
                              nan=-1).astype(np.int64)
        m = codes >= 0
        tf = np.zeros((n_rows, len(_BM25_TERMS)), np.int64)
        if m.any():
            np.add.at(tf, (row_id[m], codes[m]), 1)
        cols = {"doc_id": sub.column("doc_id"),
                "dl": pa.array(dl, pa.int64())}
        for i in range(len(_BM25_TERMS)):
            cols[f"tf{i}"] = pa.array(tf[:, i], pa.int64())
        return pa.table(cols)

    proj = _read(sf_dir, "documents", ["doc_id", "text"], blocks=16) \
        .map_batches(project, batch_format="pyarrow").materialize()

    def stats_partial(t: pa.Table) -> pa.Table:
        row = {"one": pa.array([1], pa.int64()),
               "n": pa.array([t.num_rows], pa.int64()),
               "total": pa.array([pc.sum(t.column("dl")).as_py() or 0],
                                 pa.int64())}
        for i in range(len(_BM25_TERMS)):
            row[f"df{i}"] = pa.array(
                [pc.sum(pc.cast(pc.greater(t.column(f"tf{i}"), 0),
                                pa.int64())).as_py() or 0], pa.int64())
        return pa.table(row)

    sums = {"n": "n", "total": "total"}
    sums.update({f"df{i}": f"df{i}"
                 for i in range(len(_BM25_TERMS))})
    st = _combine_partials(
        proj.map_batches(stats_partial, batch_format="pyarrow"),
        ["one"], sums)
    n_d = np.float64(st.column("n")[0].as_py())
    total = np.float64(st.column("total")[0].as_py())
    avgdl = total / n_d
    idf = [(n_d - np.float64(st.column(f"df{i}")[0].as_py())) + 0.5
           for i in range(len(_BM25_TERMS))]
    idf = [a / (np.float64(st.column(f"df{i}")[0].as_py()) + 0.5)
           for i, a in enumerate(idf)]

    def score_partial(t: pa.Table) -> pa.Table:
        dl = t.column("dl").to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        denom_norm = 1.2 * (0.25 + 0.75 * (dl / avgdl))
        score = np.zeros(len(dl), np.float64)
        for i in range(len(_BM25_TERMS)):
            tf = t.column(f"tf{i}").to_numpy(zero_copy_only=False) \
                .astype(np.float64)
            score = score + idf[i] * ((tf * 2.2) / (tf + denom_norm))
        doc = t.column("doc_id").to_numpy(zero_copy_only=False)
        top = np.lexsort((doc, -score))[:k]
        return pa.table({"doc_id": pa.array(doc[top], pa.int64()),
                         "score": pa.array(score[top], pa.float64())})

    parts = pa.concat_tables(list(
        proj.map_batches(score_partial, batch_format="pyarrow")
        .iter_batches(batch_size=None, batch_format="pyarrow")))
    doc = parts.column("doc_id").to_numpy(zero_copy_only=False)
    score = parts.column("score").to_numpy(zero_copy_only=False)
    top = np.lexsort((doc, -score))[:k]
    return pa.table({"doc_id": pa.array(doc[top], pa.int64()),
                     "score": pa.array(score[top], pa.float64())})



def q_bm25_topk(sf_dir: str):
    """See :func:`_bm25_scores` (k=25) — the scorer is shared with
    `rrf_fusion`, which ranks a deeper k=100 cut of the same scores."""
    return _bm25_scores(sf_dir, 25)


def _bm25_sql(k: int = 25) -> str:
    tf_cols = ",\n  ".join(
        f"CAST(len(list_filter(toks, x -> x = '{t}')) AS BIGINT) AS tf{i}"
        for i, t in enumerate(_BM25_TERMS))
    df_cols = ",\n  ".join(
        f"CAST(SUM(CASE WHEN tf{i} > 0 THEN 1 ELSE 0 END) AS DOUBLE)"
        f" AS df{i}" for i in range(len(_BM25_TERMS)))
    score = "\n  + ".join(
        f"(((st.n - st.df{i}) + 0.5) / (st.df{i} + 0.5))"
        f" * ((CAST(f.tf{i} AS DOUBLE) * 2.2)"
        f" / (CAST(f.tf{i} AS DOUBLE)"
        f" + 1.2 * (0.25 + 0.75 * (CAST(f.dl AS DOUBLE)"
        f" / (st.total / st.n)))))"
        for i in range(len(_BM25_TERMS)))
    return f"""WITH tok AS (
  SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS toks
  FROM documents WHERE text IS NOT NULL),
f AS (SELECT doc_id, CAST(len(toks) AS BIGINT) AS dl,
  {tf_cols}
  FROM tok),
st AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n,
  CAST(SUM(dl) AS DOUBLE) AS total,
  {df_cols}
  FROM f)
SELECT f.doc_id, {score} AS score
FROM f, st ORDER BY score DESC, f.doc_id LIMIT {k}"""


SQL_BM25_TOPK = _bm25_sql()


def q_sft_examples(sf_dir: str):
    """SFT training-pair construction: one (prompt, completion) row
    per ASSISTANT turn, prompt = the previous ≤2 turns of the same
    conversation rendered as ``role: text\\n`` lines — the
    transcripts→supervised-examples step of an LLM data pipeline
    (the LAG-over-text window shape, here producing strings rather
    than numbers).

    Same bucketed-cogroup contract as conversation_assembly: one
    conv-hash shuffle, per group one Arrow sort + two shifted-array
    joins (``binary_join_element_wise``), zero per-row Python. A turn
    with null text contributes an EMPTY line to the prompt (the
    COALESCE('') contract, mirrored exactly in SQL); conversation
    boundaries are masked so a prompt never leaks the previous
    conversation's turns."""
    n_buckets = adaptive_buckets(_nrows(sf_dir, "events"))

    def add_bucket(t: pa.Table) -> pa.Table:
        return t.append_column(
            "bucket", fnv1a_bucket(t.column("conv_id"), n_buckets))

    def grp(g: pa.Table) -> pa.Table:
        idx = pc.sort_indices(
            g, sort_keys=[("conv_id", "ascending"),
                          ("turn_idx", "ascending")])
        s = g.take(idx)
        n = s.num_rows
        conv = s.column("conv_id").combine_chunks()
        role = s.column("role").combine_chunks()
        text = s.column("text").combine_chunks()

        def shifted(arr: pa.Array, k: int) -> pa.Array:
            if n <= k:
                return pa.nulls(n, arr.type)
            return pa.concat_arrays(
                [pa.nulls(k, arr.type), arr.slice(0, n - k)])

        def piece(k: int) -> pa.Array:
            same = pc.equal(conv, shifted(conv, k))  # null at starts
            p = pc.binary_join_element_wise(
                shifted(role, k), pa.scalar(": "), shifted(text, k),
                pa.scalar("\n"), pa.scalar(""))
            cond = pc.fill_null(
                pc.and_kleene(same, pc.is_valid(p)), False)
            return pc.if_else(cond, p, pa.scalar("", pa.string()))

        prompt = pc.binary_join_element_wise(
            piece(2), piece(1), pa.scalar(""))
        keep = pc.equal(role, pa.scalar("assistant"))
        out = pa.table({
            "conv_id": conv, "turn_idx": s.column("turn_idx"),
            "prompt": prompt, "completion": text})
        return out.filter(pc.fill_null(keep, False))

    return read_transcripts(sf_dir) \
        .map_batches(add_bucket, batch_format="pyarrow") \
        .groupby("bucket").map_groups(grp, batch_format="pyarrow")


SQL_SFT_EXAMPLES = f"""{_T},
w AS (SELECT conv_id, turn_idx, role, text,
        lag(role, 1) OVER win AS r1, lag(text, 1) OVER win AS t1,
        lag(role, 2) OVER win AS r2, lag(text, 2) OVER win AS t2
      FROM transcripts
      WINDOW win AS (PARTITION BY conv_id ORDER BY turn_idx))
SELECT conv_id, turn_idx,
       COALESCE(r2 || ': ' || t2 || chr(10), '') ||
       COALESCE(r1 || ': ' || t1 || chr(10), '') AS prompt,
       text AS completion
FROM w WHERE role = 'assistant'"""


def q_ols_fit(sf_dir: str):
    """Grouped multiple linear regression: per event type, fit
    value-cents on TWO features — hour-of-day and day-slot-of-week,
    both pure epoch integer arithmetic so neither engine touches
    timezone/calendar semantics — by exact integer normal equations.
    All nine sufficient statistics (n, Σx₁, Σx₂, Σy, Σx₁², Σx₁x₂,
    Σx₂², Σx₁y, Σx₂y) are associative int64 partials (groups × batch
    fixed-width rows, NO shuffle — the grouped_corr shape, one order
    higher); the driver solves the 3×3 system by Cramer cofactors in
    python ints (cannot wrap), mirrored in SQL as HUGEINT sums with
    the IDENTICAL cofactor polynomials, so determinant and numerators
    are exact integers in both engines and each coefficient is ONE
    correctly-rounded double division. Singular groups (det = 0) are
    excluded in both."""

    def partial(t: pa.Table) -> pa.Table:
        import numpy as np

        v = t.column("value").to_numpy(zero_copy_only=False)
        ok = ~np.isnan(v) & pc.is_valid(t.column("ts")) \
            .to_numpy(zero_copy_only=False)
        y = np.floor(v[ok] * 100.0).astype(np.int64)
        us = pc.cast(t.column("ts"), pa.int64()) \
            .to_numpy(zero_copy_only=False)[ok]
        x1 = (us // 3_600_000_000) % 24
        x2 = (us // 86_400_000_000) % 7
        tt = pa.table({
            "event_type": pc.array_filter(
                t.column("event_type").combine_chunks(),
                pa.array(ok)),
            "y": pa.array(y, pa.int64()),
            "x1": pa.array(x1, pa.int64()),
            "x2": pa.array(x2, pa.int64()),
            "x11": pa.array(x1 * x1, pa.int64()),
            "x12": pa.array(x1 * x2, pa.int64()),
            "x22": pa.array(x2 * x2, pa.int64()),
            "x1y": pa.array(x1 * y, pa.int64()),
            "x2y": pa.array(x2 * y, pa.int64())})
        g = tt.group_by("event_type").aggregate(
            [("y", "sum"), ("x1", "sum"), ("x2", "sum"),
             ("x11", "sum"), ("x12", "sum"), ("x22", "sum"),
             ("x1y", "sum"), ("x2y", "sum"), ("y", "count")])
        return pa.table({
            "event_type": g.column("event_type"),
            "sy": g.column("y_sum"), "s1": g.column("x1_sum"),
            "s2": g.column("x2_sum"), "s11": g.column("x11_sum"),
            "s12": g.column("x12_sum"), "s22": g.column("x22_sum"),
            "s1y": g.column("x1y_sum"), "s2y": g.column("x2y_sum"),
            "n": pc.cast(g.column("y_count"), pa.int64())})

    comb = _combine_partials(
        _read(sf_dir, "events", ["event_type", "value", "ts"])
        .map_batches(partial, batch_format="pyarrow"),
        ["event_type"],
        {"sy": "sy", "s1": "s1", "s2": "s2", "s11": "s11",
         "s12": "s12", "s22": "s22", "s1y": "s1y", "s2y": "s2y",
         "n": "n"})
    types, ns, b0s, b1s, b2s = [], [], [], [], []
    for r in comb.to_pylist():
        n, s1, s2, sy = r["n"], r["s1"], r["s2"], r["sy"]
        s11, s12, s22 = r["s11"], r["s12"], r["s22"]
        s1y, s2y = r["s1y"], r["s2y"]
        det = (n * (s11 * s22 - s12 * s12)
               - s1 * (s1 * s22 - s12 * s2)
               + s2 * (s1 * s12 - s11 * s2))
        if det == 0:
            continue
        num0 = (sy * (s11 * s22 - s12 * s12)
                - s1 * (s1y * s22 - s12 * s2y)
                + s2 * (s1y * s12 - s11 * s2y))
        num1 = (n * (s1y * s22 - s12 * s2y)
                - sy * (s1 * s22 - s12 * s2)
                + s2 * (s1 * s2y - s1y * s2))
        num2 = (n * (s11 * s2y - s1y * s12)
                - s1 * (s1 * s2y - s1y * s2)
                + sy * (s1 * s12 - s11 * s2))
        types.append(r["event_type"])
        ns.append(n)
        b0s.append(float(num0) / float(det))
        b1s.append(float(num1) / float(det))
        b2s.append(float(num2) / float(det))
    return pa.table({
        "event_type": pa.array(types, pa.string()),
        "n": pa.array(ns, pa.int64()),
        "b0": pa.array(b0s, pa.float64()),
        "b_hour": pa.array(b1s, pa.float64()),
        "b_dayslot": pa.array(b2s, pa.float64())})


SQL_OLS_FIT = """WITH p AS (
  SELECT event_type,
    CAST(FLOOR(value * 100) AS BIGINT) AS y,
    (epoch_us(ts) // 3600000000) % 24 AS x1,
    (epoch_us(ts) // 86400000000) % 7 AS x2
  FROM events WHERE NOT isnan(value) AND ts IS NOT NULL),
s AS (SELECT event_type,
    CAST(COUNT(*) AS HUGEINT) AS n,
    CAST(SUM(y) AS HUGEINT) AS sy,
    CAST(SUM(x1) AS HUGEINT) AS s1,
    CAST(SUM(x2) AS HUGEINT) AS s2,
    CAST(SUM(x1*x1) AS HUGEINT) AS s11,
    CAST(SUM(x1*x2) AS HUGEINT) AS s12,
    CAST(SUM(x2*x2) AS HUGEINT) AS s22,
    CAST(SUM(x1*y) AS HUGEINT) AS s1y,
    CAST(SUM(x2*y) AS HUGEINT) AS s2y
  FROM p GROUP BY event_type),
d AS (SELECT *,
    n*(s11*s22 - s12*s12) - s1*(s1*s22 - s12*s2)
      + s2*(s1*s12 - s11*s2) AS det
  FROM s)
SELECT event_type, CAST(n AS BIGINT) AS n,
  CAST(sy*(s11*s22 - s12*s12) - s1*(s1y*s22 - s12*s2y)
       + s2*(s1y*s12 - s11*s2y) AS DOUBLE)
    / CAST(det AS DOUBLE) AS b0,
  CAST(n*(s1y*s22 - s12*s2y) - sy*(s1*s22 - s12*s2)
       + s2*(s1*s2y - s1y*s2) AS DOUBLE)
    / CAST(det AS DOUBLE) AS b_hour,
  CAST(n*(s11*s2y - s1y*s12) - s1*(s1*s2y - s1y*s2)
       + sy*(s1*s12 - s11*s2) AS DOUBLE)
    / CAST(det AS DOUBLE) AS b_dayslot
FROM d WHERE det <> 0"""


def q_dup_spans(sf_dir: str, w: int = 8):
    """Exact repeated-substring spans (the Lee et al. exact-substring
    dedup shape, arXiv:2107.06499, at token-window granularity): the
    top-25 documents by how many of their DISTINCT ``w``-token spans
    also occur in at least one OTHER document. Exact-hash dedup misses
    these (the documents differ); minhash finds the documents but not
    WHICH spans — this is the span-level primitive a dedup-by-excision
    pass needs.

    Shape: one tokenize pass (`flat_tokens` — the single-sourced
    tokenizer, so the SQL mirror cannot drift), span strings built by
    ``w`` shifted zero-copy slices joined in C
    (``binary_join_element_wise``), per-batch (doc, span) Arrow
    hash-distinct, then ONE span-hash-bucketed cogroup: a span's full
    document set lands in one group (bucketed on the span STRING's
    hash), so each group independently counts distinct docs per exact
    span string and emits fixed-width per-doc partials
    (doc, n_spans, n_dup_spans). The span strings DO ride that one
    all-to-all (~w× the text volume — the price of exactness, same
    as inverted_index's token shuffle); the 100-TB variant prefixes
    it with a (hash64, doc) pass and re-shuffles only candidate
    strings for exact confirm (the semi_join_bloom shape, one extra
    execution). Driver folds partials
    (docs × buckets rows — swap for a doc-bucket groupby at 1e9+
    docs) and takes the top-25. Skew-safe: a pathological span
    repeated across the whole corpus is ONE group row per doc, not a
    pair explosion."""
    from .textops.analysis import flat_tokens
    import numpy as np

    n_docs = _nrows(sf_dir, "documents")
    n_buckets = adaptive_buckets(n_docs * 60)  # ≈ spans per doc

    def spans(t: pa.Table) -> pa.Table:
        row_id, toks, _ = flat_tokens(t.column("text"))
        n = len(toks)
        if n < w:
            return pa.table({"doc_id": pa.array([], pa.int64()),
                             "gram": pa.array([], pa.string()),
                             "bucket": pa.array([], pa.int32())})
        m = n - w + 1
        # a span must not cross a document boundary
        ok = row_id[:m] == row_id[w - 1:]
        parts = [toks.slice(j, m) for j in range(w)]
        args: list = []
        for j, p in enumerate(parts):
            if j:
                args.append(pa.scalar(" "))
            args.append(p)
        grams = pc.binary_join_element_wise(*args, pa.scalar(""))
        docs = t.column("doc_id").combine_chunks().take(
            pa.array(row_id[:m][ok], pa.int64()))
        pairs = pa.table({
            "doc_id": docs,
            "gram": grams.filter(pa.array(ok))}) \
            .group_by(["doc_id", "gram"]).aggregate([])
        return pairs.append_column(
            "bucket", fnv1a_bucket(pairs.column("gram"), n_buckets))

    def grp(g: pa.Table) -> pa.Table:
        # (doc, gram) pairs are globally distinct (one doc = one row =
        # one batch), so count-per-gram here IS distinct-doc count
        nd = g.group_by("gram").aggregate([("doc_id", "count")])
        dup = nd.filter(pc.greater(nd.column("doc_id_count"), 1)) \
            .column("gram")
        is_dup = pc.is_in(g.column("gram"), value_set=dup.combine_chunks())
        tt = pa.table({
            "doc_id": g.column("doc_id"),
            "one": pa.array(np.ones(g.num_rows, np.int64)),
            "dup": pc.cast(is_dup, pa.int64())})
        agg = tt.group_by("doc_id").aggregate(
            [("one", "sum"), ("dup", "sum")])
        return pa.table({"doc_id": agg.column("doc_id"),
                         "ns": agg.column("one_sum"),
                         "nd": agg.column("dup_sum")})

    per_doc = _combine_partials(
        _read(sf_dir, "documents", ["doc_id", "text"])
        .map_batches(spans, batch_format="pyarrow")
        .groupby("bucket").map_groups(grp, batch_format="pyarrow"),
        ["doc_id"], {"ns": "n_spans", "nd": "n_dup_spans"})
    d = per_doc.column("doc_id").to_numpy(zero_copy_only=False)
    ns = per_doc.column("n_spans").to_numpy(zero_copy_only=False)
    nd = per_doc.column("n_dup_spans").to_numpy(zero_copy_only=False)
    top = np.lexsort((d, -nd))[:25]
    return pa.table({"doc_id": pa.array(d[top], pa.int64()),
                     "n_spans": pa.array(ns[top], pa.int64()),
                     "n_dup_spans": pa.array(nd[top], pa.int64())})


def q_preference_pairs(sf_dir: str):
    """Preference-pair construction (the DPO/RLHF counterpart of
    `sft_examples`): per conversation with ≥ 2 assistant turns, one
    (chosen, rejected) pair — chosen = the longest assistant turn
    (tie → earliest turn), rejected = the shortest (tie → latest
    turn), codepoint length as the deterministic stand-in for a
    reward score (no model in this container; the kernel is
    score-agnostic — swap the length column for a model score column
    and nothing else changes).

    Shape: one conv-hash cogroup (a conversation's turns co-locate),
    per group two argmin/argmax passes via np.lexsort over
    dictionary-encoded conv codes — both extremes in one group visit,
    no window materialization. Null conv_id / null text rows are
    dropped in BOTH engines (SQL's join-on-conv and length(NULL)
    semantics)."""
    import numpy as np

    n_buckets = adaptive_buckets(_nrows(sf_dir, "events"))

    def add_bucket(t: pa.Table) -> pa.Table:
        return t.append_column(
            "bucket", fnv1a_bucket(t.column("conv_id"), n_buckets))

    def grp(g: pa.Table) -> pa.Table:
        keep = pc.and_kleene(
            pc.and_kleene(pc.equal(g.column("role"), "assistant"),
                          pc.is_valid(g.column("text"))),
            pc.is_valid(g.column("conv_id")))
        s = g.filter(pc.fill_null(keep, False))
        empty = pa.table({
            "conv_id": pa.array([], pa.string()),
            "chosen_idx": pa.array([], pa.int64()),
            "rejected_idx": pa.array([], pa.int64()),
            "chosen_len": pa.array([], pa.int64()),
            "rejected_len": pa.array([], pa.int64())})
        if s.num_rows == 0:
            return empty
        enc = pc.dictionary_encode(s.column("conv_id").combine_chunks())
        codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        lens = pc.cast(pc.utf8_length(s.column("text")), pa.int64()) \
            .to_numpy(zero_copy_only=False)
        idx = pc.cast(s.column("turn_idx"), pa.int64()) \
            .to_numpy(zero_copy_only=False)
        counts = np.bincount(codes)
        ok_convs = np.flatnonzero(counts >= 2)
        if len(ok_convs) == 0:
            return empty
        # chosen: max len, tie min idx → first row per conv in
        # (conv asc, len desc, idx asc) order
        o1 = np.lexsort((idx, -lens, codes))
        c1 = codes[o1]
        first1 = np.flatnonzero(np.append(True, c1[1:] != c1[:-1]))
        # rejected: min len, tie max idx
        o2 = np.lexsort((-idx, lens, codes))
        c2 = codes[o2]
        first2 = np.flatnonzero(np.append(True, c2[1:] != c2[:-1]))
        # first1/first2 both enumerate every distinct code in order
        sel = np.isin(c1[first1], ok_convs)
        ch, rj = o1[first1][sel], o2[first2][sel]
        conv_vals = enc.dictionary.take(pa.array(c1[first1][sel],
                                                 pa.int32()))
        return pa.table({
            "conv_id": conv_vals,
            "chosen_idx": pa.array(idx[ch], pa.int64()),
            "rejected_idx": pa.array(idx[rj], pa.int64()),
            "chosen_len": pa.array(lens[ch], pa.int64()),
            "rejected_len": pa.array(lens[rj], pa.int64())})

    return read_transcripts(sf_dir) \
        .map_batches(add_bucket, batch_format="pyarrow") \
        .groupby("bucket").map_groups(grp, batch_format="pyarrow")


SQL_PREFERENCE_PAIRS = f"""{_T},
a AS (SELECT conv_id, turn_idx, length(text) AS len
      FROM transcripts
      WHERE role = 'assistant' AND text IS NOT NULL
        AND conv_id IS NOT NULL),
r AS (SELECT conv_id, turn_idx, len,
        ROW_NUMBER() OVER (PARTITION BY conv_id
                           ORDER BY len DESC, turn_idx ASC) AS rc,
        ROW_NUMBER() OVER (PARTITION BY conv_id
                           ORDER BY len ASC, turn_idx DESC) AS rr,
        COUNT(*) OVER (PARTITION BY conv_id) AS n
      FROM a)
SELECT c.conv_id,
       CAST(c.turn_idx AS BIGINT) AS chosen_idx,
       CAST(j.turn_idx AS BIGINT) AS rejected_idx,
       CAST(c.len AS BIGINT) AS chosen_len,
       CAST(j.len AS BIGINT) AS rejected_len
FROM r c JOIN r j ON c.conv_id = j.conv_id AND c.rc = 1 AND j.rr = 1
WHERE c.n >= 2"""


def q_hard_negatives(sf_dir: str):
    """Hard-negative mining for retrieval training: for each query
    vector, the 3 most-similar vectors with a DIFFERENT label (the
    contrastive-training counterpart of `knn_cosine` — a hard
    negative is the nearest wrong-class item). Query side bounded
    (vec_id < 8, one per observed label at small sf) and broadcast in
    the stage closure; per-batch masked top-k, tiny driver merge."""
    import numpy as np
    import pyarrow.dataset as pads

    from .textops.knn import hard_negatives_topk
    qt = pads.dataset(f"{sf_dir}/embeddings.parquet").to_table(
        filter=pc.field("vec_id") < 8).sort_by("vec_id")
    queries = np.array(qt.column("embedding").to_pylist(),
                       dtype=np.float64)
    return hard_negatives_topk(
        _read(sf_dir, "embeddings", ["vec_id", "embedding", "label"],
              blocks=16),
        queries, qt.column("vec_id").to_pylist(),
        pc.cast(qt.column("label"), pa.int64()).to_pylist(), k=3)


SQL_HARD_NEGATIVES = """WITH q AS (
  SELECT vec_id AS query_id, label AS qlabel,
         CAST(embedding AS DOUBLE[]) AS qe
  FROM embeddings WHERE vec_id < 8),
s AS (
  SELECT q.query_id, e.vec_id AS neg_id,
         list_cosine_similarity(q.qe, CAST(e.embedding AS DOUBLE[]))
           AS sim
  FROM q, embeddings e WHERE e.label <> q.qlabel)
SELECT query_id, neg_id,
       row_number() OVER (PARTITION BY query_id
                          ORDER BY sim DESC, neg_id) AS rank
FROM s QUALIFY rank <= 3 ORDER BY query_id, rank"""


def q_error_window_types(sf_dir: str):
    """Dynamic runtime-filter pushdown (the 'dynamic partition
    pruning' optimizer pattern): profile event types inside the time
    window where errors occurred. Phase 1 scans TWO columns for the
    error ts bounds (fixed-width min/max partials); the driver turns
    the bounds into a pyarrow dataset filter pushed INTO the phase-2
    read — at 100 TB the parquet row-group/fragment stats skip
    everything outside the window, so the second scan touches only
    the window's data instead of filtering post-read."""
    import numpy as np
    import pyarrow.dataset as pads
    import ray.data as rd

    def bounds_partial(t: pa.Table) -> pa.Table:
        m = pc.equal(t.column("event_type"), "error")
        ts = pc.cast(t.column("ts"), pa.int64()).filter(
            pc.fill_null(m, False))
        if len(ts) == 0:
            return pa.table({"k": pa.array([], pa.int64()),
                             "neg_lo": pa.array([], pa.int64()),
                             "hi": pa.array([], pa.int64())})
        return pa.table({
            "k": pa.array([0], pa.int64()),
            # max(-ts) = -min(ts): one sum-shaped fold does both
            "neg_lo": pa.array([-pc.min(ts).as_py()], pa.int64()),
            "hi": pa.array([pc.max(ts).as_py()], pa.int64())})

    parts = pa.concat_tables(list(
        _read(sf_dir, "events", ["event_type", "ts"])
        .map_batches(bounds_partial, batch_format="pyarrow")
        .iter_batches(batch_size=None, batch_format="pyarrow")))
    empty = pa.table({"event_type": pa.array([], pa.string()),
                      "n": pa.array([], pa.int64()),
                      "cents": pa.array([], pa.int64())})
    if parts.num_rows == 0:
        return empty  # no errors → empty window (SQL BETWEEN NULL)
    lo = -int(pc.max(parts.column("neg_lo")).as_py())
    hi = int(pc.max(parts.column("hi")).as_py())
    expr = ((pads.field("ts") >= pa.scalar(lo, pa.timestamp("us")))
            & (pads.field("ts") <= pa.scalar(hi, pa.timestamp("us"))))

    def profile(t: pa.Table) -> pa.Table:
        v = t.column("value").to_numpy(zero_copy_only=False)
        ok = ~np.isnan(v)
        cents = np.floor(v * 100.0)
        cents[~ok] = 0
        tt = pa.table({
            "event_type": t.column("event_type"),
            "one": pa.array(np.ones(t.num_rows, np.int64)),
            "cents": pa.array(cents.astype(np.int64), pa.int64())})
        g = tt.group_by("event_type").aggregate(
            [("one", "sum"), ("cents", "sum")])
        return pa.table({"event_type": g.column("event_type"),
                         "n": g.column("one_sum"),
                         "cents": g.column("cents_sum")})

    return _combine_partials(
        rd.read_parquet(f"{sf_dir}/events.parquet",
                        columns=["event_type", "ts", "value"],
                        filter=expr)
        .map_batches(profile, batch_format="pyarrow"),
        ["event_type"], {"n": "n", "cents": "cents"}, seed=empty)


SQL_ERROR_WINDOW_TYPES = """WITH b AS (
  SELECT MIN(ts) AS lo, MAX(ts) AS hi FROM events
  WHERE event_type = 'error')
SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CASE WHEN isnan(value) THEN 0
                     ELSE CAST(FLOOR(value * 100) AS BIGINT) END)
            AS BIGINT) AS cents
FROM events, b WHERE ts BETWEEN b.lo AND b.hi
GROUP BY 1"""


def q_user_activity_fold(sf_dir: str):
    """Rare-category folding (the feature-engineering staple): users
    with below-average event counts fold into one 'other' bucket so a
    downstream categorical feature has bounded cardinality. The
    below-MEAN rule (n·n_users < total) is scale-invariant — a fixed
    absolute threshold flips vacuous as sf grows. Per-batch (user,
    count) partials fold driver-side under the same footer-bounded
    budget as window_agg's fast path (above it, swap the fold for a
    user-bucket groupby — the type_gini shape); everything after the
    fold is arithmetic on the folded table."""
    import numpy as np

    def partial(t: pa.Table) -> pa.Table:
        g = pa.table({"user_id": t.column("user_id")}) \
            .group_by("user_id").aggregate([([], "count_all")])
        return pa.table({"user_id": g.column("user_id"),
                         "n": g.column("count_all")})

    per_user = _combine_partials(
        _read(sf_dir, "events", ["user_id"])
        .map_batches(partial, batch_format="pyarrow"),
        ["user_id"], {"n": "n"})
    n = per_user.column("n").to_numpy(zero_copy_only=False)
    uid = per_user.column("user_id").to_numpy(zero_copy_only=False)
    total, nu = int(n.sum()), len(n)
    keep = n * nu >= total
    rows = {"user_key": [str(u) for u in uid[keep]],
            "n_events": n[keep].tolist(),
            "n_users": [1] * int(keep.sum())}
    if (~keep).any():
        rows["user_key"].append("other")
        rows["n_events"].append(int(n[~keep].sum()))
        rows["n_users"].append(int((~keep).sum()))
    return pa.table({"user_key": pa.array(rows["user_key"], pa.string()),
                     "n_events": pa.array(rows["n_events"], pa.int64()),
                     "n_users": pa.array(rows["n_users"], pa.int64())})


SQL_USER_ACTIVITY_FOLD = """WITH c AS (
  SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n FROM events GROUP BY 1),
t AS (SELECT CAST(SUM(n) AS BIGINT) AS total,
             CAST(COUNT(*) AS BIGINT) AS nu FROM c)
SELECT CASE WHEN c.n * t.nu >= t.total
            THEN CAST(c.user_id AS VARCHAR) ELSE 'other' END AS user_key,
       CAST(SUM(c.n) AS BIGINT) AS n_events,
       CAST(COUNT(*) AS BIGINT) AS n_users
FROM c, t GROUP BY 1"""


SQL_DUP_SPANS = """WITH toks AS (
  SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS ts,
         len(regexp_extract_all(lower(text), '[a-z0-9]+')) AS nt
  FROM documents),
idx AS (SELECT doc_id, ts, unnest(range(1, nt - 6)) AS i
        FROM toks WHERE nt >= 8),
g AS (SELECT DISTINCT doc_id, array_to_string(ts[i:i+7], ' ') AS gram
      FROM idx),
c AS (SELECT gram, COUNT(DISTINCT doc_id) AS nd FROM g GROUP BY 1),
p AS (SELECT doc_id,
             CAST(COUNT(*) AS BIGINT) AS n_spans,
             CAST(COUNT(*) FILTER (WHERE c.nd > 1) AS BIGINT)
               AS n_dup_spans
      FROM g JOIN c USING (gram) GROUP BY 1)
SELECT doc_id, n_spans, n_dup_spans
FROM p ORDER BY n_dup_spans DESC, doc_id LIMIT 25"""


def q_ngram_jaccard(sf_dir: str):
    """EXACT all-pairs token-4-gram Jaccard ≥ 0.6 via symmetric prefix
    filtering (All-Pairs/PPJoin family) — the COMPLETE counterpart of
    `minhash_pairs`: no recall parameter, every qualifying pair is
    guaranteed (`dedup.prefix_filter_candidates` proves the prefix
    theorem it relies on). Shape: narrow prefix-posting pass (~40% of
    each doc's gram set) → ONE gram-hash-bucketed groupby emitting
    ratio-filtered candidate pairs → the shared `jaccard_verify`
    fetch-and-verify (exact gram-hash-set jaccard, token_gram_hash_set
    — same kernels as the candidate stage). Gram HASH sets stand in
    for gram strings on the Ray side (64-bit collisions are the only
    possible divergence from the SQL's exact string grams — none exist
    on this corpus; the minhash_pairs convention)."""
    from .textops.dedup import exact_ngram_jaccard_pairs
    n_docs = _nrows(sf_dir, "documents")
    return exact_ngram_jaccard_pairs(
        _read(sf_dir, "documents", ["doc_id", "text"], blocks=16),
        _read(sf_dir, "documents", ["doc_id", "text"], blocks=16),
        tnum=3, tden=5, w=4,
        n_buckets=adaptive_buckets(24 * n_docs))


SQL_NGRAM_JACCARD = """WITH toks AS (
  SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS ts,
         len(regexp_extract_all(lower(text), '[a-z0-9]+')) AS nt
  FROM documents),
idx AS (SELECT doc_id, ts, unnest(range(1, nt - 2)) AS i
        FROM toks WHERE nt >= 4),
g AS (SELECT DISTINCT doc_id, array_to_string(ts[i:i+3], ' ') AS gram
      FROM idx),
cnt AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS c FROM g GROUP BY 1),
inter AS (SELECT x.doc_id AS a, y.doc_id AS b, COUNT(*) AS i
          FROM g x JOIN g y ON x.gram = y.gram AND x.doc_id < y.doc_id
          GROUP BY 1, 2)
SELECT a, b,
       CAST(i AS DOUBLE) / CAST(ca.c + cb.c - i AS DOUBLE) AS jaccard
FROM inter JOIN cnt ca ON ca.doc_id = inter.a
           JOIN cnt cb ON cb.doc_id = inter.b
WHERE CAST(i AS DOUBLE) / CAST(ca.c + cb.c - i AS DOUBLE) >= 0.6"""


def q_table_digest(sf_dir: str):
    """Order-invariant per-source content checksum — the 100-TB
    data-integrity primitive (verify a migration/compaction/rewrite
    preserved content without comparing rows): per row,
    ``md5_number_lower(doc_id || '|' || text)`` (the low 64 bits of the
    md5 digest, little-endian — DuckDB's `md5_number_lower`); per
    source, the modular sum mod 2^63. Addition commutes, so the digest
    is invariant to row order, partitioning and batch boundaries, and
    per-batch partials fold exactly: each batch ships one (source, n,
    digest) row. Null text contributes nothing (SQL `||` null
    propagation), but still counts in n_rows."""
    import hashlib

    MOD = 1 << 63

    def partial(t: pa.Table) -> pa.Table:
        # md5 per row is a per-row C call (no vectorized md5 exists in
        # arrow); the canonical string matches the SQL concat exactly.
        # Per-source sums fold in PYTHON ints mod 2^63 — raw 64-bit
        # hash values would wrap an arrow int64 sum (up to 2^64 each),
        # and (Σv) mod m == (Σ(v mod m)) mod m keeps the fold exact.
        acc: dict[str, list[int]] = {}
        for i, tx, src in zip(t.column("doc_id").to_pylist(),
                              t.column("text").to_pylist(),
                              t.column("source").to_pylist()):
            a = acc.setdefault(src, [0, 0])
            a[0] += 1
            if tx is not None:
                a[1] = (a[1] + int.from_bytes(
                    hashlib.md5(f"{i}|{tx}".encode()).digest()[8:16],
                    "little")) % MOD
        return pa.table({
            "source": pa.array(list(acc), pa.string()),
            "n_rows": pa.array([a[0] for a in acc.values()], pa.int64()),
            "digest": pa.array([a[1] for a in acc.values()], pa.int64())})

    # driver fold in python ints (an arrow sum of 2^63-bounded partials
    # would overflow past ~1 block); sources × blocks rows, tiny
    out: dict[str, list[int]] = {}
    for t in _read(sf_dir, "documents", ["doc_id", "text", "source"]) \
            .map_batches(partial, batch_format="pyarrow") \
            .iter_batches(batch_size=None, batch_format="pyarrow"):
        for src, n, d in zip(t.column("source").to_pylist(),
                             t.column("n_rows").to_pylist(),
                             t.column("digest").to_pylist()):
            a = out.setdefault(src, [0, 0])
            a[0] += n
            a[1] = (a[1] + d) % MOD
    return pa.table({
        "source": pa.array(list(out), pa.string()),
        "n_rows": pa.array([a[0] for a in out.values()], pa.int64()),
        "digest": pa.array([a[1] for a in out.values()], pa.int64())})


SQL_TABLE_DIGEST = """SELECT source,
  CAST(COUNT(*) AS BIGINT) AS n_rows,
  CAST(CAST(SUM(CAST(md5_number_lower(
         CAST(doc_id AS VARCHAR) || '|' || text) AS HUGEINT))
       AS HUGEINT) % 9223372036854775808 AS BIGINT) AS digest
FROM documents GROUP BY source"""


def q_rrf_fusion(sf_dir: str):
    """Hybrid-retrieval rank fusion (Cormack et al. SIGIR'09 reciprocal
    rank fusion): fuse the BM25 lexical ranking (shared `_bm25_scores`
    kernel, k=100) with the embedding-cosine ranking against the
    vec_id-0 query vector (shared `knn_topk` kernel, k=100) —
    ``rrf = Σ_lists floor(10^12 / (60 + rank))``. The classic RRF
    1/(60+r) is scaled to INTEGER contributions so the fused score is
    order-invariant exact int64 arithmetic on both engines (a float
    1/(60+r) sum would be association-order-dependent). Corpus
    contract: ``embeddings.vec_id`` is 1:1 with ``documents.doc_id``
    (the fixture generator's layout), so the two rankings share an id
    space. Absent-from-a-list ids contribute 0 (rank reported as 0).

    Scale shape: both arms are per-batch local-top-k partials (the
    driver folds ≤ k rows per block); the fusion itself is driver
    arithmetic on ≤ 2k rows."""
    import numpy as np
    import pyarrow.dataset as pads

    from .textops.knn import knn_topk

    K, SCALE, C = 100, 10 ** 12, 60
    lex = _bm25_scores(sf_dir, K)
    # rank by (score desc, doc asc) — _bm25_scores returns in that order
    lex_rank = {int(d): i + 1
                for i, d in enumerate(lex.column("doc_id").to_pylist())}
    qt = pads.dataset(f"{sf_dir}/embeddings.parquet").to_table(
        filter=pc.field("vec_id") == 0)
    qv = np.array(qt.column("embedding").to_pylist(), dtype=np.float64)
    vec = knn_topk(_read(sf_dir, "embeddings", ["vec_id", "embedding"],
                         blocks=16), qv, [0], k=K)
    vec_rank = {int(d): int(r)
                for d, r in zip(vec.column("neighbor_id").to_pylist(),
                                vec.column("rank").to_pylist())}
    ids = sorted(set(lex_rank) | set(vec_rank))
    rrf = [(SCALE // (C + lex_rank[d]) if d in lex_rank else 0)
           + (SCALE // (C + vec_rank[d]) if d in vec_rank else 0)
           for d in ids]
    order = np.lexsort((np.array(ids), -np.array(rrf)))[:25]
    ids_a = np.array(ids, np.int64)[order]
    return pa.table({
        "doc_id": pa.array(ids_a, pa.int64()),
        "rrf": pa.array(np.array(rrf, np.int64)[order], pa.int64()),
        "rank_lex": pa.array([lex_rank.get(int(d), 0) for d in ids_a],
                             pa.int64()),
        "rank_vec": pa.array([vec_rank.get(int(d), 0) for d in ids_a],
                             pa.int64())})


SQL_RRF_FUSION = f"""WITH bm AS (
  SELECT doc_id, row_number() OVER (ORDER BY score DESC, doc_id) AS r
  FROM ({_bm25_sql(100)})),
q AS (SELECT CAST(embedding AS DOUBLE[]) AS qe
      FROM embeddings WHERE vec_id = 0),
v AS (
  SELECT vec_id AS doc_id,
         row_number() OVER (ORDER BY list_cosine_similarity(
           q.qe, CAST(e.embedding AS DOUBLE[])) DESC, e.vec_id) AS r
  FROM embeddings e, q WHERE e.vec_id <> 0
  QUALIFY r <= 100),
f AS (
  SELECT COALESCE(bm.doc_id, v.doc_id) AS doc_id,
         COALESCE(1000000000000 // (60 + bm.r), 0)
           + COALESCE(1000000000000 // (60 + v.r), 0) AS rrf,
         COALESCE(bm.r, 0) AS rank_lex,
         COALESCE(v.r, 0) AS rank_vec
  FROM bm FULL OUTER JOIN v ON bm.doc_id = v.doc_id)
SELECT doc_id, rrf, rank_lex, rank_vec
FROM f ORDER BY rrf DESC, doc_id LIMIT 25"""


def q_changepoint_cusum(sf_dir: str):
    """CUSUM changepoint detection over the daily 'error'-count series
    — the monitoring/drift primitive (where did the error rate shift?).
    The statistic is kept in EXACT integers: with daily counts over
    the dense min..max day grid (gap days count 0), prefix sums
    ``S_i`` and total ``S_n``, the changepoint maximizes
    ``|n·S_i − i·S_n|`` over ``1 ≤ i < n`` (the scaled
    mean-difference CUSUM — same argmax as the float statistic,
    ties → earliest day).

    Scale shape: per-batch (day, count) partials fold driver-side
    (bounded by the CALENDAR span, not the corpus — the gap_fill
    argument); the scan over days is driver numpy."""
    import numpy as np

    DAY = 86_400_000_000

    def partial(t: pa.Table) -> pa.Table:
        m = pc.and_(pc.equal(t.column("event_type"), "error"),
                    pc.is_valid(t.column("ts")))
        ts = pc.cast(t.column("ts"), pa.int64()).filter(
            pc.fill_null(m, False))
        day = pc.floor(pc.divide(pc.cast(ts, pa.float64()), DAY))
        g = pa.table({"day": pc.cast(day, pa.int64())}) \
            .group_by("day").aggregate([([], "count_all")])
        return pa.table({"day": g.column("day"),
                         "n": pc.cast(g.column("count_all"), pa.int64())})

    per_day = _combine_partials(
        _read(sf_dir, "events", ["event_type", "ts"])
        .map_batches(partial, batch_format="pyarrow"),
        ["day"], {"n": "n"})
    empty = pa.table({"day": pa.array([], pa.timestamp("us")),
                      "stat": pa.array([], pa.int64())})
    if per_day.num_rows < 2:
        return empty
    d = per_day.column("day").to_numpy(zero_copy_only=False)
    c = per_day.column("n").to_numpy(zero_copy_only=False)
    lo, hi = int(d.min()), int(d.max())
    dense = np.zeros(hi - lo + 1, np.int64)
    dense[d - lo] = c
    n = len(dense)
    s = np.cumsum(dense)
    i = np.arange(1, n)  # prefix lengths 1..n-1
    stat = np.abs(n * s[:-1] - i * s[-1])
    best = int(np.argmax(stat))  # first max → earliest day
    return pa.table({
        "day": pa.array([(lo + best) * DAY], pa.int64()).cast(
            pa.timestamp("us")),
        "stat": pa.array([int(stat[best])], pa.int64())})


SQL_CHANGEPOINT_CUSUM = """WITH e AS (
  SELECT epoch_us(ts) // 86400000000 AS day
  FROM events WHERE event_type = 'error' AND ts IS NOT NULL),
b AS (SELECT MIN(day) AS lo, MAX(day) AS hi FROM e),
grid AS (SELECT unnest(range(b.lo, b.hi + 1)) AS day FROM b),
c AS (
  SELECT g.day, CAST(COUNT(e.day) AS BIGINT) AS n
  FROM grid g LEFT JOIN e ON e.day = g.day GROUP BY 1),
t AS (SELECT CAST(COUNT(*) AS BIGINT) AS nd,
             CAST(SUM(n) AS BIGINT) AS tot FROM c),
s AS (
  SELECT day,
         SUM(n) OVER (ORDER BY day ROWS UNBOUNDED PRECEDING) AS cum,
         ROW_NUMBER() OVER (ORDER BY day) AS i
  FROM c)
SELECT CAST(to_timestamp(s.day * 86400) AS TIMESTAMP) AS day,
       CAST(ABS(t.nd * s.cum - s.i * t.tot) AS BIGINT) AS stat
FROM s, t WHERE s.i < t.nd
ORDER BY stat DESC, s.day LIMIT 1"""


def q_incremental_agg(sf_dir: str):
    """Incremental materialized-view maintenance: a per-(event_type,
    day) count/cents aggregate is kept as a STATE parquet; new data
    arrives as a delta slice and the refresh merges delta partials
    into the state — producing exactly the full recompute (the oracle
    aggregates the whole table) without rescanning history. The
    sum/count measures are associative, so merge ≡ recompute holds for
    ANY split point; the split here is the footer ts midpoint (no
    data-dependent execution just for sizing).

    Scale shape at 100 TB: history is never rescanned — the state read
    is proportional to the AGGREGATE's cardinality (types × days), the
    delta scan is filter-pushed (`pads.field(\"ts\") >= T0` prunes
    row groups), and the merge is one tiny groupby."""
    import hashlib as _hl

    import pyarrow.dataset as pads
    import pyarrow.parquet as _pq
    import ray.data as rd

    meta = _pq.read_metadata(f"{sf_dir}/events.parquet")
    # footer min/max of ts (row-group stats; no execution)
    los, his = [], []
    for rg in range(meta.num_row_groups):
        for ci in range(meta.row_group(rg).num_columns):
            col = meta.row_group(rg).column(ci)
            if col.path_in_schema == "ts" and col.statistics is not None:
                los.append(col.statistics.min)
                his.append(col.statistics.max)
    t0 = min(los) + (max(his) - min(los)) // 2
    t0_us = int(t0.timestamp() * 1_000_000) if hasattr(t0, "timestamp") \
        else int(t0)

    def agg(ds) -> pa.Table:
        def partial(t: pa.Table) -> pa.Table:
            import numpy as np
            v = t.column("value").to_numpy(zero_copy_only=False)
            cents = np.floor(v * 100.0)
            cents[np.isnan(v)] = 0
            day = pc.cast(pc.floor(pc.divide(
                pc.cast(pc.cast(t.column("ts"), pa.int64()),
                        pa.float64()), 86_400_000_000)), pa.int64())
            sub = pa.table({
                "event_type": t.column("event_type"), "day": day,
                "one": pa.array(np.ones(t.num_rows, np.int64)),
                "cents": pa.array(cents.astype(np.int64), pa.int64())})
            g = sub.group_by(["event_type", "day"]).aggregate(
                [("one", "sum"), ("cents", "sum")])
            return pa.table({"event_type": g.column("event_type"),
                             "day": g.column("day"),
                             "n": g.column("one_sum"),
                             "cents": g.column("cents_sum")})
        return _combine_partials(
            ds.map_batches(partial, batch_format="pyarrow"),
            ["event_type", "day"], {"n": "n", "cents": "cents"})

    # 1. build + PUBLISH the state for the history slice (ts < T0);
    # clean first — write_parquet ADDS uniquely-named files, so a rerun
    # into a stale dir would double the state (the ndjson_roundtrip
    # convention)
    import shutil as _sh
    state_dir = "/tmp/raybeats_incr_state_" + _hl.md5(
        sf_dir.encode()).hexdigest()[:10]
    _sh.rmtree(state_dir, ignore_errors=True)
    hist = rd.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_type", "ts", "value"],
        filter=pads.field("ts") < pa.scalar(t0_us, pa.timestamp("us")))
    rd.from_arrow(agg(hist)).write_parquet(state_dir)
    # 2. refresh: read the state back + aggregate ONLY the delta
    state = rd.read_parquet(state_dir)
    delta = rd.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_type", "ts", "value"],
        filter=pads.field("ts") >= pa.scalar(t0_us, pa.timestamp("us")))
    merged = pa.concat_tables(
        [agg(delta)] + list(state.iter_batches(batch_size=None,
                                               batch_format="pyarrow")))
    g = merged.group_by(["event_type", "day"]).aggregate(
        [("n", "sum"), ("cents", "sum")])
    return pa.table({"event_type": g.column("event_type"),
                     "day": g.column("day"),
                     "n": g.column("n_sum"),
                     "cents": g.column("cents_sum")})


SQL_INCREMENTAL_AGG = """SELECT event_type,
  epoch_us(ts) // 86400000000 AS day,
  CAST(COUNT(*) AS BIGINT) AS n,
  CAST(SUM(CASE WHEN isnan(value) THEN 0
                ELSE CAST(FLOOR(value * 100) AS BIGINT) END)
       AS BIGINT) AS cents
FROM events GROUP BY 1, 2"""


def q_interpolate_daily(sf_dir: str):
    """Time-series resampling with LINEAR interpolation: the daily
    'purchase' cents series on the dense min..max day grid, with
    missing days filled by exact integer interpolation between the
    surrounding observed days — the imputation member between
    `gap_fill_hours` (zero fill) and `last_buy_carry` (LOCF). The
    interpolant ``(prev·(dn−d) + next·(d−dp)) // (dn−dp)`` stays in
    non-negative int64 (cents ≥ 0), so floor division is
    truncation-safe and both engines compute it bit-identically.
    Days before the first / after the last observation are excluded
    (no extrapolation; the SQL's null arithmetic drops them).

    Scale shape: per-batch (day, cents) partials fold driver-side —
    bounded by the CALENDAR span, not the corpus (the gap_fill
    argument); the grid scan is driver numpy over days."""
    import numpy as np

    DAY = 86_400_000_000

    def partial(t: pa.Table) -> pa.Table:
        m = pc.and_(pc.equal(t.column("event_type"), "purchase"),
                    pc.is_valid(t.column("ts")))
        m = pc.and_(m, pc.is_valid(t.column("value")))
        sub = t.filter(pc.fill_null(m, False))
        v = sub.column("value").to_numpy(zero_copy_only=False)
        cents = np.floor(v * 100.0)
        cents[np.isnan(v)] = 0
        day = pc.cast(pc.floor(pc.divide(
            pc.cast(pc.cast(sub.column("ts"), pa.int64()),
                    pa.float64()), DAY)), pa.int64())
        g = pa.table({"day": day,
                      "cents": pa.array(cents.astype(np.int64),
                                        pa.int64())}) \
            .group_by("day").aggregate([("cents", "sum")])
        return pa.table({"day": g.column("day"),
                         "cents": g.column("cents_sum")})

    per_day = _combine_partials(
        _read(sf_dir, "events", ["event_type", "ts", "value"])
        .map_batches(partial, batch_format="pyarrow"),
        ["day"], {"cents": "cents"})
    empty = pa.table({"day": pa.array([], pa.timestamp("us")),
                      "cents": pa.array([], pa.int64()),
                      "observed": pa.array([], pa.bool_())})
    if per_day.num_rows == 0:
        return empty
    d = per_day.column("day").to_numpy(zero_copy_only=False)
    c = per_day.column("cents").to_numpy(zero_copy_only=False)
    lo, hi = int(d.min()), int(d.max())
    n = hi - lo + 1
    obs = np.zeros(n, bool)
    vals = np.zeros(n, np.int64)
    obs[d - lo] = True
    vals[d - lo] = c
    idx = np.arange(n)
    # prev/next observed index via ffill/bfill of the index
    pidx = np.where(obs, idx, -1)
    pidx = np.maximum.accumulate(pidx)
    nidx = np.where(obs, idx, n)
    nidx = np.minimum.accumulate(nidx[::-1])[::-1]
    # interior grid only (lo..hi always has obs at both ends here)
    dp, dn = pidx, nidx
    span = np.maximum(dn - dp, 1)
    interp = (vals[np.clip(dp, 0, n - 1)] * (dn - idx)
              + vals[np.clip(dn, 0, n - 1)] * (idx - dp)) // span
    out_c = np.where(obs, vals, interp)
    return pa.table({
        "day": pa.array((idx + lo) * DAY, pa.int64()).cast(
            pa.timestamp("us")),
        "cents": pa.array(out_c, pa.int64()),
        "observed": pa.array(obs, pa.bool_())})


SQL_INTERPOLATE_DAILY = """WITH p AS (
  SELECT epoch_us(ts) // 86400000000 AS day,
         CAST(SUM(CAST(FLOOR(value * 100) AS BIGINT)) AS BIGINT) AS cents
  FROM events
  WHERE event_type = 'purchase' AND ts IS NOT NULL
        AND value IS NOT NULL AND NOT isnan(value)
  GROUP BY 1),
b AS (SELECT MIN(day) AS lo, MAX(day) AS hi FROM p),
grid AS (SELECT unnest(range(b.lo, b.hi + 1)) AS day FROM b),
g AS (
  SELECT grid.day, p.cents, p.day IS NOT NULL AS observed
  FROM grid LEFT JOIN p ON p.day = grid.day),
f AS (
  SELECT day, cents, observed,
    LAST_VALUE(CASE WHEN observed THEN day END IGNORE NULLS)
      OVER (ORDER BY day ROWS UNBOUNDED PRECEDING) AS dp,
    LAST_VALUE(cents IGNORE NULLS)
      OVER (ORDER BY day ROWS UNBOUNDED PRECEDING) AS pv,
    FIRST_VALUE(CASE WHEN observed THEN day END IGNORE NULLS)
      OVER (ORDER BY day ROWS BETWEEN CURRENT ROW
                                  AND UNBOUNDED FOLLOWING) AS dn,
    FIRST_VALUE(cents IGNORE NULLS)
      OVER (ORDER BY day ROWS BETWEEN CURRENT ROW
                                  AND UNBOUNDED FOLLOWING) AS nv
  FROM g)
SELECT CAST(to_timestamp(day * 86400) AS TIMESTAMP) AS day,
  CAST(CASE WHEN observed THEN cents
            ELSE (pv * (dn - day) + nv * (day - dp)) // (dn - dp)
       END AS BIGINT) AS cents,
  observed
FROM f"""


def q_survivorship(sf_dir: str):
    """Golden-record survivorship over near-dup clusters (the MDM
    merge step after entity resolution): per multi-member cluster,
    compose the best value PER FIELD from different members —
    ``best_doc_id`` = the longest text's id (ties → min id),
    ``first_source`` = the alphabetically-first source,
    ``total_chars`` / ``n_members`` audit sums. `dedup_keep_best`
    keeps one whole ROW; survivorship is field-wise, which is why it
    exists as a separate op.

    Plan: the verified near-dup cluster map (the full `dedup_clusters`
    pipeline — minhash → jaccard verify → connected components) is by
    nature a SMALL side (only verified duplicates appear), so it
    collects to a broadcast dict; one narrow documents scan tags rows
    with their cluster and emits per-batch per-cluster partials
    (count, char sum, max-(n_chars, −id) candidate, min source) that
    fold associatively at the driver."""
    import numpy as np

    empty = pa.table({"cluster": pa.array([], pa.int64()),
                      "n_members": pa.array([], pa.int64()),
                      "total_chars": pa.array([], pa.int64()),
                      "best_doc_id": pa.array([], pa.int64()),
                      "first_source": pa.array([], pa.string())})
    batches = list(q_dedup_clusters(sf_dir).iter_batches(
        batch_size=None, batch_format="pyarrow"))
    if not batches:  # no verified duplicates anywhere
        return empty
    cl = pa.concat_tables(batches)
    cmap = dict(zip(cl.column("node").to_pylist(),
                    cl.column("cluster").to_pylist()))
    nodes = pa.array(list(cmap), pa.int64())
    clusters = np.fromiter(cmap.values(), np.int64, len(cmap))

    def partial(t: pa.Table) -> pa.Table:
        idx = pc.index_in(t.column("doc_id"), value_set=nodes) \
            .to_numpy(zero_copy_only=False)
        known = ~np.isnan(idx) if idx.dtype.kind == "f" else \
            np.ones(len(idx), bool)
        sub = t.filter(pa.array(known))
        if sub.num_rows == 0:
            return pa.table({
                "cluster": pa.array([], pa.int64()),
                "n": pa.array([], pa.int64()),
                "chars": pa.array([], pa.int64()),
                "best_chars": pa.array([], pa.int64()),
                "best_doc": pa.array([], pa.int64()),
                "src": pa.array([], pa.string())})
        cid = clusters[idx[known].astype(np.int64)]
        doc = sub.column("doc_id").to_numpy(zero_copy_only=False)
        nch = sub.column("n_chars").to_numpy(zero_copy_only=False)
        src = sub.column("source").to_pylist()
        acc: dict[int, list] = {}
        for c, d, nc, s in zip(cid.tolist(), doc.tolist(),
                               nch.tolist(), src):
            a = acc.get(c)
            if a is None:
                acc[c] = [1, nc, nc, d, s]
            else:
                a[0] += 1
                a[1] += nc
                if (nc, -d) > (a[2], -a[3]):
                    a[2], a[3] = nc, d
                if s < a[4]:
                    a[4] = s
        return pa.table({
            "cluster": pa.array(list(acc), pa.int64()),
            "n": pa.array([a[0] for a in acc.values()], pa.int64()),
            "chars": pa.array([a[1] for a in acc.values()], pa.int64()),
            "best_chars": pa.array([a[2] for a in acc.values()],
                                   pa.int64()),
            "best_doc": pa.array([a[3] for a in acc.values()],
                                 pa.int64()),
            "src": pa.array([a[4] for a in acc.values()], pa.string())})

    out: dict[int, list] = {}
    for t in _read(sf_dir, "documents",
                   ["doc_id", "n_chars", "source"]) \
            .map_batches(partial, batch_format="pyarrow") \
            .iter_batches(batch_size=None, batch_format="pyarrow"):
        for c, n, ch, bc, bd, s in zip(*(t.column(k).to_pylist()
                                         for k in t.column_names)):
            a = out.get(c)
            if a is None:
                out[c] = [n, ch, bc, bd, s]
            else:
                a[0] += n
                a[1] += ch
                if (bc, -bd) > (a[2], -a[3]):
                    a[2], a[3] = bc, bd
                if s < a[4]:
                    a[4] = s
    multi = {c: a for c, a in out.items() if a[0] > 1}
    return pa.table({
        "cluster": pa.array(list(multi), pa.int64()),
        "n_members": pa.array([a[0] for a in multi.values()], pa.int64()),
        "total_chars": pa.array([a[1] for a in multi.values()],
                                pa.int64()),
        "best_doc_id": pa.array([a[3] for a in multi.values()],
                                pa.int64()),
        "first_source": pa.array([a[4] for a in multi.values()],
                                 pa.string())})


# compose the dedup_clusters CTE chain: cut its final SELECT and keep
# the WITH list, then aggregate per cluster with a field-wise
# survivorship (argmax by (n_chars, -doc_id) via ROW_NUMBER)
_SQL_CLUSTER_CTES = SQL_DEDUP_CLUSTERS[
    :SQL_DEDUP_CLUSTERS.rindex("SELECT node")]
SQL_SURVIVORSHIP = _SQL_CLUSTER_CTES + """,
cl AS (SELECT node, MIN(r) AS cluster FROM reach GROUP BY node),
j AS (
  SELECT cl.cluster, d.doc_id, d.n_chars, d.source
  FROM documents d JOIN cl ON cl.node = d.doc_id),
r AS (
  SELECT cluster, doc_id,
         ROW_NUMBER() OVER (PARTITION BY cluster
                            ORDER BY n_chars DESC, doc_id) AS rk
  FROM j),
a AS (
  SELECT cluster, CAST(COUNT(*) AS BIGINT) AS n_members,
         CAST(SUM(n_chars) AS BIGINT) AS total_chars,
         MIN(source) AS first_source
  FROM j GROUP BY 1)
SELECT a.cluster, a.n_members, a.total_chars,
       r.doc_id AS best_doc_id, a.first_source
FROM a JOIN r ON r.cluster = a.cluster AND r.rk = 1
WHERE a.n_members > 1"""


def q_seasonal_naive_error(sf_dir: str):
    """Forecast backtest (capacity-planning primitive): the weekly
    seasonal-naive forecaster ``f(d) = actual(d − 7)`` evaluated over
    the dense daily total-cents grid (missing days are true zeros) —
    reports the day count scored, total absolute error and total bias
    in EXACT integer cents. The first 7 grid days have no forecast and
    are excluded on both engines.

    Scale shape: the same bounded (day, cents) partial fold as
    `changepoint_cusum`; the lag-7 comparison is driver numpy over the
    calendar span."""
    import numpy as np

    DAY = 86_400_000_000

    def partial(t: pa.Table) -> pa.Table:
        m = pc.and_(pc.is_valid(t.column("ts")),
                    pc.is_valid(t.column("value")))
        sub = t.filter(pc.fill_null(m, False))
        v = sub.column("value").to_numpy(zero_copy_only=False)
        cents = np.floor(v * 100.0)
        cents[np.isnan(v)] = 0
        day = pc.cast(pc.floor(pc.divide(
            pc.cast(pc.cast(sub.column("ts"), pa.int64()),
                    pa.float64()), DAY)), pa.int64())
        g = pa.table({"day": day,
                      "cents": pa.array(cents.astype(np.int64),
                                        pa.int64())}) \
            .group_by("day").aggregate([("cents", "sum")])
        return pa.table({"day": g.column("day"),
                         "cents": g.column("cents_sum")})

    per_day = _combine_partials(
        _read(sf_dir, "events", ["ts", "value"])
        .map_batches(partial, batch_format="pyarrow"),
        ["day"], {"cents": "cents"})
    empty = pa.table({"n_days": pa.array([], pa.int64()),
                      "abs_err_cents": pa.array([], pa.int64()),
                      "bias_cents": pa.array([], pa.int64())})
    if per_day.num_rows == 0:
        return empty
    d = per_day.column("day").to_numpy(zero_copy_only=False)
    c = per_day.column("cents").to_numpy(zero_copy_only=False)
    lo, hi = int(d.min()), int(d.max())
    dense = np.zeros(hi - lo + 1, np.int64)
    dense[d - lo] = c
    if len(dense) <= 7:
        return pa.table({"n_days": pa.array([0], pa.int64()),
                         "abs_err_cents": pa.array([0], pa.int64()),
                         "bias_cents": pa.array([0], pa.int64())})
    err = dense[7:] - dense[:-7]
    return pa.table({
        "n_days": pa.array([len(err)], pa.int64()),
        "abs_err_cents": pa.array([int(np.abs(err).sum())], pa.int64()),
        "bias_cents": pa.array([int(err.sum())], pa.int64())})


SQL_SEASONAL_NAIVE_ERROR = """WITH p AS (
  SELECT epoch_us(ts) // 86400000000 AS day,
         CAST(SUM(CASE WHEN isnan(value) THEN 0
                       ELSE CAST(FLOOR(value * 100) AS BIGINT) END)
              AS BIGINT) AS cents
  FROM events WHERE ts IS NOT NULL AND value IS NOT NULL
  GROUP BY 1),
b AS (SELECT MIN(day) AS lo, MAX(day) AS hi FROM p),
grid AS (SELECT unnest(range(b.lo, b.hi + 1)) AS day FROM b),
g AS (
  SELECT grid.day, COALESCE(p.cents, 0) AS cents
  FROM grid LEFT JOIN p ON p.day = grid.day),
l AS (
  SELECT day, cents,
         LAG(cents, 7) OVER (ORDER BY day) AS fc
  FROM g)
SELECT CAST(COUNT(*) AS BIGINT) AS n_days,
       CAST(SUM(ABS(cents - fc)) AS BIGINT) AS abs_err_cents,
       CAST(SUM(cents - fc) AS BIGINT) AS bias_cents
FROM l WHERE fc IS NOT NULL"""


def q_threshold_sweep(sf_dir: str):
    """Dedup-threshold tuning report: verified near-dup PAIR counts at
    every candidate jaccard threshold (0.5 … 0.9) from ONE
    candidate+verify pass — the sweep a curation engineer runs before
    committing to a dedup cutoff (each threshold re-run from scratch
    would cost a full LSH pass per point). Reuses the `minhash_pairs`
    pipeline at the LOWEST threshold; the driver banding is a handful
    of comparisons over the verified pair set (bounded by the
    duplicate count, not the corpus). Threshold constants are double
    literals — both engines compare the SAME verified jaccard doubles
    (integer-ratio arithmetic, correctly rounded identically), so
    banding cannot drift. Recall caveat inherited from
    `minhash_pairs`: the LSH candidate set is exhaustive on this
    corpus (see its oracle note)."""
    import numpy as np

    pairs = q_minhash_pairs(sf_dir)
    tables = list(pairs.iter_batches(batch_size=None,
                                     batch_format="pyarrow"))
    j = (pa.concat_tables(tables).column("jaccard")
         .to_numpy(zero_copy_only=False)
         if tables else np.empty(0, np.float64))
    thr = [0.5, 0.6, 0.7, 0.8, 0.9]
    return pa.table({
        "threshold": pa.array(thr, pa.float64()),
        "n_pairs": pa.array([int((j >= t).sum()) for t in thr],
                            pa.int64())})


SQL_THRESHOLD_SWEEP = _SQL_JACCARD_PAIRS_CTE.format(rec="") + """
SELECT CAST(t.threshold AS DOUBLE) AS threshold,
       CAST(COUNT(j.a) AS BIGINT) AS n_pairs
FROM (VALUES (0.5), (0.6), (0.7), (0.8), (0.9)) t(threshold)
LEFT JOIN jpairs j ON j.jaccard >= CAST(t.threshold AS DOUBLE)
GROUP BY 1"""


def q_knn_label_eval(sf_dir: str):
    """k-NN classification eval over the embedding column: predict
    each vector's label by 5-NN majority vote (self excluded;
    neighbor ties → lower vec_id; vote ties → lower label) and report
    per-label n / n_correct — the label-quality / leave-one-out eval
    of a labeled vector corpus (`lang_confusion` is the text-model
    analog). EXACT cross-engine arithmetic: vectors quantize to int64
    (`round(x·10^6)`, the cluster_radius mirror) and every distance is
    ``‖a‖² + ‖b‖² − 2a·b`` on integers < 2^53, which float64 matmul
    computes EXACTLY — so neighbor order (dist, vec_id) is
    deterministic on both engines, no float-tie exposure.

    Scale shape: the corpus matrix broadcasts once via ``ray.put``
    (5k × 64 int64 ≈ 2.5 MB; at real scale swap the brute-force probe
    for the IVF partition layout per `knn_ivf`); per batch ONE float64
    matmul + a stable axis-1 argsort; per-label partials fold at the
    driver."""
    import numpy as np
    import ray

    full = pq.read_table(f"{sf_dir}/embeddings.parquet",
                         columns=["vec_id", "embedding", "label"]) \
        .sort_by("vec_id")
    emb = full.column("embedding")
    emb = emb.combine_chunks() if isinstance(emb, pa.ChunkedArray) else emb
    n, d = len(emb), len(emb[0])
    corpus = pc.cast(pc.round(pc.multiply(
        pc.cast(emb.flatten(), pa.float64()), 1_000_000.0),
        round_mode="half_towards_infinity"), pa.int64()) \
        .to_numpy(zero_copy_only=False).reshape(n, d).astype(np.float64)
    c_ids = full.column("vec_id").to_numpy(zero_copy_only=False)
    c_lab = full.column("label").to_numpy(zero_copy_only=False) \
        .astype(np.int64)
    c_norm = (corpus * corpus).sum(axis=1)  # exact: ints < 2^53
    ref = ray.put((corpus, c_ids, c_lab, c_norm))
    n_lab = int(c_lab.max()) + 1 if len(c_lab) else 0

    def partial(t: pa.Table) -> pa.Table:
        cp, ids, labs, nrm = ray.get(ref)
        e = t.column("embedding")
        e = e.combine_chunks() if isinstance(e, pa.ChunkedArray) else e
        m = len(e)
        if m == 0:
            return pa.table({"label": pa.array([], pa.int64()),
                             "n": pa.array([], pa.int64()),
                             "n_correct": pa.array([], pa.int64())})
        q = pc.cast(pc.round(pc.multiply(
            pc.cast(e.flatten(), pa.float64()), 1_000_000.0),
            round_mode="half_towards_infinity"), pa.int64()) \
            .to_numpy(zero_copy_only=False).reshape(m, d) \
            .astype(np.float64)
        qid = t.column("vec_id").to_numpy(zero_copy_only=False)
        tl = t.column("label").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        # all values integer and < 2^53 → float64 matmul is exact
        dist = (q * q).sum(axis=1)[:, None] + nrm[None, :] \
            - 2.0 * (q @ cp.T)
        dist[qid[:, None] == ids[None, :]] = np.inf  # self out
        # corpus sorted by vec_id → stable argsort = (dist, vec_id)
        top = np.argsort(dist, axis=1, kind="stable")[:, :5]
        votes = labs[top]  # (m, 5)
        cnt = np.zeros((m, n_lab), np.int64)
        np.add.at(cnt, (np.repeat(np.arange(m), votes.shape[1]),
                        votes.ravel()), 1)
        pred = np.argmax(cnt, axis=1)  # first max → lowest label
        sub = pa.table({
            "label": pa.array(tl, pa.int64()),
            "one": pa.array(np.ones(m, np.int64)),
            "ok": pa.array((pred == tl).astype(np.int64), pa.int64())})
        g = sub.group_by("label").aggregate([("one", "sum"),
                                             ("ok", "sum")])
        return pa.table({"label": g.column("label"),
                         "n": g.column("one_sum"),
                         "n_correct": g.column("ok_sum")})

    return _combine_partials(
        _read(sf_dir, "embeddings", ["vec_id", "embedding", "label"],
              blocks=16)
        .map_batches(partial, batch_format="pyarrow"),
        ["label"], {"n": "n", "n_correct": "n_correct"})


SQL_KNN_LABEL_EVAL = """WITH q AS (
  SELECT vec_id, label,
         list_transform(embedding,
           x -> CAST(round(CAST(x AS DOUBLE) * 1000000) AS DOUBLE))
           AS ql
  FROM embeddings),
nn AS (SELECT vec_id, label, ql,
              list_inner_product(ql, ql) AS nrm FROM q),
d AS (
  SELECT a.vec_id, a.label AS tl, b.vec_id AS nb, b.label AS nl,
         CAST(a.nrm + b.nrm
              - 2 * list_inner_product(a.ql, b.ql) AS BIGINT) AS dd
  FROM nn a JOIN nn b ON a.vec_id <> b.vec_id),
r AS (
  SELECT vec_id, tl, nl,
         row_number() OVER (PARTITION BY vec_id
                            ORDER BY dd, nb) AS rk
  FROM d),
k AS (SELECT vec_id, tl, nl, COUNT(*) AS c
      FROM r WHERE rk <= 5 GROUP BY 1, 2, 3),
p AS (
  SELECT vec_id, tl, nl,
         row_number() OVER (PARTITION BY vec_id
                            ORDER BY c DESC, nl) AS pr
  FROM k)
SELECT CAST(tl AS BIGINT) AS label, CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CASE WHEN nl = tl THEN 1 ELSE 0 END) AS BIGINT)
         AS n_correct
FROM p WHERE pr = 1 GROUP BY 1"""


def q_topk_diversified(sf_dir: str):
    """Diversified global top-k (the search-results/page-layout rule):
    the 10 highest-cents events overall, but AT MOST 2 per user —
    `topk_per_user` ranks within each user; this caps a group's share
    of one GLOBAL ranking. Total order (cents desc, event_id asc).

    One narrow pass: each batch keeps its per-user top-2 candidates
    (a row outside its user's batch-local top-2 is outside the global
    answer a fortiori — the quota_sample partial argument), so the
    driver folds ≤ 2 × users-per-batch fixed-width rows and re-applies
    the same rule exactly."""
    import numpy as np

    def _diversify(uid, eid, cents, k=10, cap=2):
        order = np.lexsort((eid, -cents))
        uid, eid, cents = uid[order], eid[order], cents[order]
        # rank within user along the global order, vectorized: count
        # prior same-user rows via sorted (uid, position) ranks
        pos_by_u = np.lexsort((np.arange(len(uid)), uid))
        r = np.empty(len(uid), np.int64)
        if len(uid):
            u_sorted = uid[pos_by_u]
            starts = np.flatnonzero(np.concatenate(
                [[True], u_sorted[1:] != u_sorted[:-1]]))
            seg_lens = np.diff(np.append(starts, len(uid)))
            r[pos_by_u] = np.arange(len(uid)) - np.repeat(starts,
                                                          seg_lens)
        keep = r < cap
        return (uid[keep][:k], eid[keep][:k], cents[keep][:k])

    def partial(t: pa.Table) -> pa.Table:
        m = pc.and_(pc.is_valid(t.column("user_id")),
                    pc.is_valid(t.column("value")))
        sub = t.filter(pc.fill_null(m, False))
        v = sub.column("value").to_numpy(zero_copy_only=False)
        ok = ~np.isnan(v)
        cents = np.floor(v * 100.0).astype(np.int64)[ok]
        uid = sub.column("user_id").to_numpy(zero_copy_only=False)[ok]
        eid = sub.column("event_id").to_numpy(zero_copy_only=False)[ok]
        # batch-local per-user top-cap keeps every global candidate;
        # k-cut deferred to the driver (a batch may hold many winners)
        u, e, c = _diversify(uid, eid, cents, k=len(uid), cap=2)
        return pa.table({"user_id": pa.array(u, pa.int64()),
                         "event_id": pa.array(e, pa.int64()),
                         "cents": pa.array(c, pa.int64())})

    parts = pa.concat_tables(list(
        _read(sf_dir, "events", ["event_id", "user_id", "value"])
        .map_batches(partial, batch_format="pyarrow")
        .iter_batches(batch_size=None, batch_format="pyarrow")))
    import numpy as np
    u, e, c = _diversify(
        parts.column("user_id").to_numpy(zero_copy_only=False),
        parts.column("event_id").to_numpy(zero_copy_only=False),
        parts.column("cents").to_numpy(zero_copy_only=False))
    return pa.table({"user_id": pa.array(u, pa.int64()),
                     "event_id": pa.array(e, pa.int64()),
                     "cents": pa.array(c, pa.int64())})


SQL_TOPK_DIVERSIFIED = """WITH e AS (
  SELECT event_id, user_id,
         CAST(FLOOR(value * 100) AS BIGINT) AS cents
  FROM events
  WHERE user_id IS NOT NULL AND value IS NOT NULL
        AND NOT isnan(value)),
r AS (
  SELECT event_id, user_id, cents,
         ROW_NUMBER() OVER (PARTITION BY user_id
                            ORDER BY cents DESC, event_id) AS ur
  FROM e)
SELECT user_id, event_id, cents
FROM r WHERE ur <= 2
ORDER BY cents DESC, event_id LIMIT 10"""


def q_dedup_method_overlap(sf_dir: str):
    """Dedup-method comparison report: how do the BYTE-shingle
    MinHash-verified pairs (j ≥ 0.5, `minhash_pairs`) and the exact
    TOKEN-4-gram prefix-filter pairs (j ≥ 0.6, `ngram_jaccard`) agree?
    One row: each method's pair count and the intersection — the
    report that justifies choosing one dedup definition over another
    (precision/recall of A against B read straight off the counts).
    Both pair sets are verified-duplicate-bounded, so the set algebra
    is a driver fold; the heavy lifting is the two pipelines' own
    bounded shuffles."""
    def _pairset(res):
        if not isinstance(res, pa.Table):
            batches = list(res.iter_batches(batch_size=None,
                                            batch_format="pyarrow"))
            if not batches:  # a clean corpus yields zero pair blocks
                return set()
            res = pa.concat_tables(batches)
        if res.num_rows == 0:
            return set()
        return set(zip(res.column("a").to_pylist(),
                       res.column("b").to_pylist()))

    a = _pairset(q_minhash_pairs(sf_dir))
    b = _pairset(q_ngram_jaccard(sf_dir))
    return pa.table({
        "n_byte_pairs": pa.array([len(a)], pa.int64()),
        "n_token_pairs": pa.array([len(b)], pa.int64()),
        "n_both": pa.array([len(a & b)], pa.int64())})


SQL_DEDUP_METHOD_OVERLAP = f"""WITH byte_pairs AS (
  SELECT a, b FROM ({SQL_MINHASH_PAIRS})),
tok_pairs AS (
  SELECT a, b FROM ({SQL_NGRAM_JACCARD}))
SELECT
  (SELECT CAST(COUNT(*) AS BIGINT) FROM byte_pairs) AS n_byte_pairs,
  (SELECT CAST(COUNT(*) AS BIGINT) FROM tok_pairs) AS n_token_pairs,
  (SELECT CAST(COUNT(*) AS BIGINT)
   FROM byte_pairs JOIN tok_pairs USING (a, b)) AS n_both"""


def q_hive_partition_prune(sf_dir: str):
    """Hive-partitioned sink + partition-PRUNED re-read: write events
    partitioned by ``event_type`` (``write_parquet(partition_cols=…)``
    — one directory per value, the 100-TB layout that lets a reader
    skip whole partitions), then read back ONLY the error/purchase
    partitions with a partition filter and aggregate. The pruning is
    structural: non-matching partitions are never opened (directory
    planning, not row filtering). Oracle = the same aggregate from a
    plain row filter over the source table.

    Write goes to a per-sf_dir scratch dir rebuilt each run (unique
    file names would otherwise accumulate — the incremental_agg
    convention)."""
    import hashlib as _hl
    import shutil as _sh

    import numpy as np
    import ray.data as rd

    out_dir = "/tmp/raybeats_hive_" + _hl.md5(
        sf_dir.encode()).hexdigest()[:10]
    _sh.rmtree(out_dir, ignore_errors=True)
    _read(sf_dir, "events", ["event_id", "event_type", "value"]) \
        .write_parquet(out_dir, partition_cols=["event_type"])

    from ray.data.datasource.partitioning import PathPartitionFilter
    back = rd.read_parquet(
        out_dir,
        partition_filter=PathPartitionFilter.of(
            lambda kv: kv.get("event_type") in ("error", "purchase")))

    def partial(t: pa.Table) -> pa.Table:
        v = t.column("value").to_numpy(zero_copy_only=False)
        cents = np.floor(v * 100.0)
        cents[np.isnan(v)] = 0
        sub = pa.table({
            "event_type": t.column("event_type"),
            "one": pa.array(np.ones(t.num_rows, np.int64)),
            "cents": pa.array(cents.astype(np.int64), pa.int64())})
        g = sub.group_by("event_type").aggregate(
            [("one", "sum"), ("cents", "sum")])
        return pa.table({
            "event_type": pc.cast(g.column("event_type"), pa.string()),
            "n": g.column("one_sum"),
            "cents": g.column("cents_sum")})

    return _combine_partials(
        back.map_batches(partial, batch_format="pyarrow"),
        ["event_type"], {"n": "n", "cents": "cents"})


SQL_HIVE_PARTITION_PRUNE = """SELECT event_type,
  CAST(COUNT(*) AS BIGINT) AS n,
  CAST(SUM(CASE WHEN isnan(value) THEN 0
                ELSE CAST(FLOOR(value * 100) AS BIGINT) END)
       AS BIGINT) AS cents
FROM events WHERE event_type IN ('error', 'purchase')
GROUP BY 1"""


def q_clamped_balance(sf_dir: str):
    """Floor-clamped running balance (inventory/credit-ledger shape):
    per user under (ts, event_id) order, 'click' adds its cents and
    'purchase' subtracts, with the balance CLAMPED at zero after every
    step — ``s_i = max(0, s_{i-1} + d_i)``, the canonical NON-LINEAR
    recurrence (no prefix aggregate expresses the clamp directly, and
    `ema_cents` needed a python step loop for its division
    recurrence). The clamp has a reflection closed form that makes it
    one vector pass: ``s_i = P_i − min(0, min_{j≤i} P_j)`` with ``P``
    the plain prefix sum — cumsum + running min, both exact int64.
    The SQL mirror computes the SAME closed form with window MIN, so
    the oracle is bit-exact without a recursive CTE.

    One user-hash bucket shuffle (sequence recurrences are not
    associative across splits); the per-bucket kernel is one lexsort +
    segmented cumsum/cummin. The segmented running min uses integer
    segment-spacing (``p + seg_id·BIG``) with a runtime guard raising
    if ``segments × BIG`` could leave int64 (never at sane per-user
    cent sums; the guard keeps the kernel honest rather than silently
    wrong). Output per user: final balance + how many steps sat on
    the floor (bal == 0)."""
    import numpy as np

    n_buckets = adaptive_buckets(_nrows(sf_dir, "events"))

    def tag(t: pa.Table) -> pa.Table:
        m = pc.and_(pc.is_valid(t.column("user_id")),
                    pc.is_valid(t.column("ts")))
        m = pc.and_(m, pc.is_in(
            t.column("event_type"),
            value_set=pa.array(["click", "purchase"])))
        m = pc.and_(m, pc.is_valid(t.column("value")))
        sub = t.filter(pc.fill_null(m, False))
        v = sub.column("value").to_numpy(zero_copy_only=False)
        ok = ~np.isnan(v)
        cents = np.floor(v * 100.0).astype(np.int64)
        sign = np.where(pc.equal(sub.column("event_type"), "click")
                        .to_numpy(zero_copy_only=False), 1, -1)
        sub = sub.filter(pa.array(ok))
        out = pa.table({
            "u": pc.cast(sub.column("user_id"), pa.int64()),
            "ts": pc.cast(sub.column("ts"), pa.int64()),
            "eid": sub.column("event_id"),
            "d": pa.array((cents * sign)[ok], pa.int64())})
        return out.append_column("bucket", int_bucket(out.column("u"),
                                                      n_buckets))

    def grp(g: pa.Table) -> pa.Table:
        u = g.column("u").to_numpy(zero_copy_only=False)
        ts = g.column("ts").to_numpy(zero_copy_only=False)
        eid = g.column("eid").to_numpy(zero_copy_only=False)
        d = g.column("d").to_numpy(zero_copy_only=False)
        order = np.lexsort((eid, ts, u))
        u, d = u[order], d[order]
        n = len(u)
        new_seg = np.empty(n, bool)
        new_seg[0] = True
        new_seg[1:] = u[1:] != u[:-1]
        seg_id = np.cumsum(new_seg) - 1
        heads = np.flatnonzero(new_seg)
        seg_lens = np.diff(np.append(heads, n))
        # segmented prefix sum: global cumsum minus each segment's base
        cs = np.cumsum(d)
        p = cs - np.repeat(cs[heads] - d[heads], seg_lens)
        # segmented running min via integer segment spacing
        pmax = int(np.abs(p).max()) if n else 0
        big = 2 * pmax + 1
        n_segs = len(heads)
        if n_segs * big >= (1 << 62):
            raise ValueError(
                f"clamped_balance spacing overflow: {n_segs} segments "
                f"x spacing {big}; split the bucket or rescale")
        # offsets must DECREASE with seg_id for a MINIMUM accumulate:
        # earlier segments then sit in HIGHER bands and cannot leak
        # into a later segment's prefix min (bands disjoint because
        # big > 2·max|p|)
        run_min = np.minimum.accumulate(p - seg_id * big) + seg_id * big
        s = p - np.minimum(run_min, 0)
        tails = np.append(heads[1:] - 1, n - 1)
        n_floor = np.zeros(n_segs, np.int64)
        np.add.at(n_floor, seg_id, (s == 0).astype(np.int64))
        return pa.table({
            "user_id": pa.array(u[heads], pa.int64()),
            "balance": pa.array(s[tails], pa.int64()),
            "n_floor": pa.array(n_floor, pa.int64())})

    return _read(sf_dir, "events",
                 ["event_id", "user_id", "ts", "event_type", "value"]) \
        .map_batches(tag, batch_format="pyarrow") \
        .groupby("bucket").map_groups(grp, batch_format="pyarrow") \
        .select_columns(["user_id", "balance", "n_floor"])


SQL_CLAMPED_BALANCE = """WITH e AS (
  SELECT user_id, ts, event_id,
         CASE WHEN event_type = 'click'
              THEN CAST(FLOOR(value * 100) AS BIGINT)
              ELSE -CAST(FLOOR(value * 100) AS BIGINT) END AS d
  FROM events
  WHERE event_type IN ('click', 'purchase')
        AND user_id IS NOT NULL AND ts IS NOT NULL
        AND value IS NOT NULL AND NOT isnan(value)),
p AS (
  SELECT user_id, ts, event_id,
         SUM(d) OVER (PARTITION BY user_id ORDER BY ts, event_id
                      ROWS UNBOUNDED PRECEDING) AS pf
  FROM e),
m AS (
  SELECT user_id, ts, event_id, pf,
         LEAST(MIN(pf) OVER (PARTITION BY user_id
                             ORDER BY ts, event_id
                             ROWS UNBOUNDED PRECEDING), 0) AS runmin
  FROM p),
s AS (SELECT user_id, ts, event_id, pf - runmin AS bal FROM m),
r AS (
  SELECT user_id, bal,
         ROW_NUMBER() OVER (PARTITION BY user_id
                            ORDER BY ts DESC, event_id DESC) AS rk
  FROM s),
agg AS (
  SELECT user_id,
         CAST(SUM(CASE WHEN bal = 0 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_floor
  FROM s GROUP BY 1)
SELECT agg.user_id, CAST(r.bal AS BIGINT) AS balance, agg.n_floor
FROM agg JOIN r ON r.user_id = agg.user_id AND r.rk = 1"""


def q_cluster_split(sf_dir: str):
    """Leakage-free train/val/test split: every EXACT-DUP CLUSTER is
    assigned to one split as a unit, keyed by the cluster root (min
    doc_id per content hash) — the curation step that prevents a
    duplicated document from landing in both train and eval
    (`split_leakage` MEASURES that failure; this op prevents it).
    The split hash is the same 32-bit multiplicative mix as
    `hash_split`, applied to the ROOT id so membership, not identity,
    decides the split.

    Shape: narrow (md5, doc_id) projection → ONE hash-bucket cogroup
    (each content hash co-locates; only 16-byte digests + ids move) →
    per-bucket lexsort + segment-head broadcast for the root. No
    join-back: the root is computed and consumed inside the group."""
    import numpy as np

    from .textops.curation import _mix32
    from .textops.dedup import _md5_column

    n_buckets = adaptive_buckets(_nrows(sf_dir, "documents"))

    def hashed(t: pa.Table) -> pa.Table:
        out = pa.table({
            "h": _md5_column(t.column("text").to_pylist()),
            "doc_id": t.column("doc_id")})
        return out.append_column(
            "bucket", fnv1a_bucket(out.column("h"), n_buckets))

    def assign(g: pa.Table) -> pa.Table:
        h = g.column("h").to_numpy(zero_copy_only=False)
        ids = g.column("doc_id").to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, h))
        h, ids = h[order], ids[order]
        n = len(ids)
        new_seg = np.empty(n, bool)
        new_seg[0] = True
        new_seg[1:] = h[1:] != h[:-1]
        heads = np.flatnonzero(new_seg)
        seg_lens = np.diff(np.append(heads, n))
        root = np.repeat(ids[heads], seg_lens)
        b = _mix32(root) % np.uint64(100)
        split = np.where(b < 80, "train",
                         np.where(b < 90, "val", "test"))
        return pa.table({
            "doc_id": pa.array(ids, pa.int64()),
            "root_id": pa.array(root, pa.int64()),
            "split": pa.array(split, pa.string())})

    return _read(sf_dir, "documents", ["doc_id", "text"], blocks=16) \
        .map_batches(hashed, batch_format="pyarrow") \
        .groupby("bucket").map_groups(assign, batch_format="pyarrow") \
        .select_columns(["doc_id", "root_id", "split"])


SQL_CLUSTER_SPLIT = """WITH r AS (
  SELECT doc_id,
         MIN(doc_id) OVER (PARTITION BY md5(text)) AS root_id
  FROM documents),
h AS (
  SELECT doc_id, root_id,
         CAST(CAST(root_id AS HUGEINT) * 2654435761 % 4294967296
              AS BIGINT) AS m
  FROM r),
b AS (SELECT doc_id, root_id, xor(m, m >> 15) % 100 AS bucket FROM h)
SELECT doc_id, root_id,
  CASE WHEN bucket < 80 THEN 'train' WHEN bucket < 90 THEN 'val'
       ELSE 'test' END AS split
FROM b"""


def q_k_anonymity(sf_dir: str):
    """k-anonymity / l-diversity audit over the customer table:
    quasi-identifiers (nation, market segment) define the equivalence
    classes; the sensitive attribute is the account-balance band
    (negative / low / high at 5000.0 — doubles compare exactly on
    both engines, no arithmetic). Per class: size n, count of
    distinct sensitive bands l, and the k≥10 / l≥2 re-identification
    flags — the release-gate report an anonymized-export pipeline
    runs before shipping data.

    Shape: per-batch fixed-width partials on (nat, seg, band) —
    bounded by 25 nations × 5 segments × 3 bands — folded driver-side;
    the class-level rollup (sum n, count bands) is a second arrow
    group_by on ≤375 rows. Nothing wide ever shuffles."""

    def partial(t: pa.Table) -> pa.Table:
        ok = pc.and_(pc.is_valid(t.column("c_nationkey")),
                     pc.is_valid(t.column("c_mktsegment")))
        ok = pc.and_(ok, pc.is_valid(t.column("c_acctbal")))
        sub = t.filter(pc.fill_null(ok, False))
        bal = sub.column("c_acctbal")
        band = pc.if_else(
            pc.less(bal, 0.0), "neg",
            pc.if_else(pc.less(bal, 5000.0), "low", "high"))
        g = pa.table({
            "nat": pc.cast(sub.column("c_nationkey"), pa.int64()),
            "seg": sub.column("c_mktsegment"),
            "band": band}).group_by(["nat", "seg", "band"]) \
            .aggregate([("band", "count")])
        return pa.table({
            "nat": g.column("nat"), "seg": g.column("seg"),
            "band": g.column("band"),
            "n": pc.cast(g.column("band_count"), pa.int64())})

    comb = _combine_partials(
        _read(sf_dir, "customer",
              ["c_nationkey", "c_mktsegment", "c_acctbal"])
        .map_batches(partial, batch_format="pyarrow"),
        ["nat", "seg", "band"], {"n": "n"})
    cls = comb.group_by(["nat", "seg"]).aggregate(
        [("n", "sum"), ("band", "count")])
    n = pc.cast(cls.column("n_sum"), pa.int64())
    l = pc.cast(cls.column("band_count"), pa.int64())
    return pa.table({
        "nat": cls.column("nat"), "seg": cls.column("seg"),
        "n": n, "l": l,
        "k_anon": pc.greater_equal(n, 10),
        "l_div": pc.greater_equal(l, 2)})


SQL_K_ANONYMITY = """WITH b AS (
  SELECT CAST(c_nationkey AS BIGINT) AS nat, c_mktsegment AS seg,
         CASE WHEN c_acctbal < 0.0 THEN 'neg'
              WHEN c_acctbal < 5000.0 THEN 'low' ELSE 'high' END AS band
  FROM customer
  WHERE c_nationkey IS NOT NULL AND c_mktsegment IS NOT NULL
        AND c_acctbal IS NOT NULL)
SELECT nat, seg, CAST(COUNT(*) AS BIGINT) AS n,
       CAST(COUNT(DISTINCT band) AS BIGINT) AS l,
       COUNT(*) >= 10 AS k_anon,
       COUNT(DISTINCT band) >= 2 AS l_div
FROM b GROUP BY nat, seg"""


def q_benford_digits(sf_dir: str):
    """Leading-digit (Benford) profile of order totals — the
    fraud/synthetic-data screen: per first significant digit 1-9 of
    the integer part of o_totalprice, the order count and its exact
    integer permille of all qualifying orders. The digit comes from
    floor → int64 → decimal string head, exact on both engines (no
    float log10); permille is integer division, so the oracle is
    bit-exact. Orders below 1.0 have no integer leading digit and are
    excluded symmetrically.

    Shape: per-batch 9-row fixed partials folded driver-side; the
    grand total is the partials' own sum — one pass, no shuffle."""

    def partial(t: pa.Table) -> pa.Table:
        v = t.column("o_totalprice")
        ok = pc.and_(pc.is_valid(v), pc.greater_equal(v, 1.0))
        ints = pc.cast(pc.floor(v.filter(pc.fill_null(ok, False))),
                       pa.int64())
        digit = pc.cast(
            pc.utf8_slice_codeunits(pc.cast(ints, pa.string()), 0, 1),
            pa.int64())
        g = pa.table({"digit": digit}).group_by(["digit"]) \
            .aggregate([("digit", "count")])
        return pa.table({
            "digit": g.column("digit"),
            "n": pc.cast(g.column("digit_count"), pa.int64())})

    comb = _combine_partials(
        _read(sf_dir, "orders", ["o_totalprice"])
        .map_batches(partial, batch_format="pyarrow"),
        ["digit"], {"n": "n"})
    import numpy as np
    total = int(pc.sum(comb.column("n")).as_py() or 0)
    narr = comb.column("n").to_numpy(zero_copy_only=False)
    permille = pa.array(narr * 1000 // max(total, 1), pa.int64())
    return pa.table({"digit": comb.column("digit"),
                     "n": comb.column("n"), "permille": permille})


SQL_BENFORD_DIGITS = """WITH d AS (
  SELECT CAST(substr(CAST(CAST(FLOOR(o_totalprice) AS BIGINT)
                          AS VARCHAR), 1, 1) AS BIGINT) AS digit
  FROM orders WHERE o_totalprice IS NOT NULL AND o_totalprice >= 1.0)
SELECT digit, CAST(COUNT(*) AS BIGINT) AS n,
       CAST(COUNT(*) * 1000 // SUM(COUNT(*)) OVER () AS BIGINT)
         AS permille
FROM d GROUP BY digit"""


def q_attribution_last_touch(sf_dir: str):
    """Last-touch conversion attribution: each purchase is credited to
    the user's most recent PRIOR non-purchase event within a 7-day
    lookback, else '(none)' — the marketing/causal rollup every
    event-log warehouse runs. Same vectorized LOCF kernel as
    `last_buy_carry` (observation marks = non-purchase rows, segmented
    `np.maximum.accumulate`, one gather); a purchase row is never an
    observation so 'at or before' degenerates to 'strictly before'
    exactly as the SQL's IGNORE-NULLS window does. One user-bucket
    shuffle; per-group output is the tiny (attributed, n) partial, so
    the driver fold sees ≤types+1 rows per bucket."""
    import numpy as np

    n_buckets = adaptive_buckets(_nrows(sf_dir, "events"))
    window_us = 7 * 86_400 * 1_000_000

    def tag(t: pa.Table) -> pa.Table:
        sub = pa.table({
            "u": t.column("user_id"),
            "ts": pc.cast(t.column("ts"), pa.int64()),
            "eid": t.column("event_id"),
            "typ": t.column("event_type")}) \
            .filter(pc.and_(pc.is_valid(t.column("user_id")),
                            pc.is_valid(t.column("ts"))))
        return sub.append_column("bucket", int_bucket(sub.column("u"),
                                                      n_buckets))

    def grp(g: pa.Table) -> pa.Table:
        u = g.column("u").to_numpy(zero_copy_only=False)
        ts = g.column("ts").to_numpy(zero_copy_only=False)
        eid = g.column("eid").to_numpy(zero_copy_only=False)
        typ = g.column("typ")
        is_buy = pc.fill_null(pc.equal(typ, "purchase"), False) \
            .to_numpy(zero_copy_only=False)
        obs = pc.fill_null(
            pc.and_(pc.is_valid(typ), pc.not_equal(typ, "purchase")),
            False).to_numpy(zero_copy_only=False)
        order = np.lexsort((eid, ts, u))
        u, ts = u[order], ts[order]
        n = len(u)
        new_run = np.empty(n, bool)
        new_run[0] = True
        new_run[1:] = u[1:] != u[:-1]
        idx = np.where(obs[order], np.arange(n), -1)
        starts = np.flatnonzero(new_run)
        lens = np.diff(np.append(starts, n))
        seg = np.repeat(np.arange(len(starts)), lens)
        base = seg.astype(np.int64) * (n + 2)
        filled = np.maximum.accumulate(
            np.where(idx >= 0, idx + base, -1))
        have = filled >= base
        src = np.where(have, filled - base, 0).astype(np.int64)
        buys = np.flatnonzero(is_buy[order])
        s = src[buys]
        ok = have[buys] & (ts[buys] - ts[s] <= window_us)
        typ_sorted = typ.take(pa.array(order))
        attributed = pc.if_else(
            pa.array(ok), typ_sorted.take(pa.array(s)), "(none)")
        part = pa.table({"attributed": attributed}) \
            .group_by(["attributed"]).aggregate([("attributed", "count")])
        return pa.table({
            "attributed": part.column("attributed"),
            "n": pc.cast(part.column("attributed_count"), pa.int64())})

    return _combine_partials(
        _read(sf_dir, "events",
              ["event_id", "user_id", "ts", "event_type"])
        .map_batches(tag, batch_format="pyarrow")
        .groupby("bucket").map_groups(grp, batch_format="pyarrow"),
        ["attributed"], {"n": "n"})


SQL_ATTRIBUTION_LAST_TOUCH = """WITH e AS (
  SELECT user_id, ts, event_id, event_type FROM events
  WHERE user_id IS NOT NULL AND ts IS NOT NULL),
w AS (
  SELECT event_type, ts,
    LAST_VALUE(CASE WHEN event_type <> 'purchase' THEN event_type END
               IGNORE NULLS) OVER
      (PARTITION BY user_id ORDER BY ts, event_id
       ROWS UNBOUNDED PRECEDING) AS src_type,
    LAST_VALUE(CASE WHEN event_type <> 'purchase' THEN ts END
               IGNORE NULLS) OVER
      (PARTITION BY user_id ORDER BY ts, event_id
       ROWS UNBOUNDED PRECEDING) AS src_ts
  FROM e)
SELECT COALESCE(
         CASE WHEN src_ts IS NOT NULL
                   AND epoch_us(ts) - epoch_us(src_ts)
                       <= 604800000000
              THEN src_type END, '(none)') AS attributed,
       CAST(COUNT(*) AS BIGINT) AS n
FROM w WHERE event_type = 'purchase' GROUP BY 1"""


def q_target_encode(sf_dir: str):
    """Leave-one-out target (mean) encoding of the event-type
    categorical — the feature-engineering op that replaces a category
    with the mean target of its OTHER members, avoiding self-leakage:
    ``loo = (S_type − c) / (n_type − 1)``, NULL for singleton types.
    Both operands are exact int64 (cents, counts), so the one double
    division is correctly rounded identically in numpy and DuckDB —
    bit-exact oracle despite the float output.

    Shape: pass 1 folds (type, sum, n) partials driver-side (types are
    bounded); pass 2 broadcasts that tiny dict in the closure — NO
    shuffle, the per-row encode is embarrassingly parallel."""
    import numpy as np

    def partial(t: pa.Table) -> pa.Table:
        v = t.column("value").to_numpy(zero_copy_only=False)
        ok = pc.and_(pc.is_valid(t.column("event_type")),
                     pc.is_valid(t.column("value")))
        ok = pc.and_(ok, pa.array(~np.isnan(v)))
        sub = t.filter(pc.fill_null(ok, False))
        c = np.floor(sub.column("value").to_numpy(
            zero_copy_only=False) * 100.0).astype(np.int64)
        g = pa.table({"typ": sub.column("event_type"),
                      "c": pa.array(c, pa.int64()),
                      "one": pa.array(np.ones(len(c), np.int64))}) \
            .group_by(["typ"]).aggregate([("c", "sum"), ("one", "sum")])
        return pa.table({"typ": g.column("typ"),
                         "s": pc.cast(g.column("c_sum"), pa.int64()),
                         "n": pc.cast(g.column("one_sum"), pa.int64())})

    stats = _combine_partials(
        _read(sf_dir, "events", ["event_type", "value"])
        .map_batches(partial, batch_format="pyarrow"),
        ["typ"], {"s": "s", "n": "n"})
    lut = {t: (int(s), int(n)) for t, s, n in zip(
        stats.column("typ").to_pylist(), stats.column("s").to_pylist(),
        stats.column("n").to_pylist())}

    def encode(t: pa.Table) -> pa.Table:
        v = t.column("value").to_numpy(zero_copy_only=False)
        ok = pc.and_(pc.is_valid(t.column("event_type")),
                     pc.is_valid(t.column("value")))
        ok = pc.and_(ok, pa.array(~np.isnan(v)))
        sub = t.filter(pc.fill_null(ok, False))
        c = np.floor(sub.column("value").to_numpy(
            zero_copy_only=False) * 100.0).astype(np.int64)
        typ = sub.column("event_type").to_pylist()
        s = np.array([lut[x][0] for x in typ], np.int64)
        n = np.array([lut[x][1] for x in typ], np.int64)
        single = n <= 1
        loo = (s - c).astype(np.float64) / \
            np.where(single, 1, n - 1).astype(np.float64)
        return pa.table({
            "event_id": sub.column("event_id"),
            "event_type": sub.column("event_type"),
            "loo_cents": pa.array(loo, pa.float64(), mask=single)})

    return _read(sf_dir, "events",
                 ["event_id", "event_type", "value"]) \
        .map_batches(encode, batch_format="pyarrow")


SQL_TARGET_ENCODE = """WITH e AS (
  SELECT event_id, event_type,
         CAST(FLOOR(value * 100) AS BIGINT) AS c
  FROM events
  WHERE event_type IS NOT NULL AND value IS NOT NULL
        AND NOT isnan(value))
SELECT event_id, event_type,
  CAST(SUM(c) OVER (PARTITION BY event_type) - c AS DOUBLE)
    / NULLIF(COUNT(*) OVER (PARTITION BY event_type) - 1, 0)
    AS loo_cents
FROM e"""


def q_ohlc_weekly(sf_dir: str):
    """Positional OPEN/HIGH/LOW/CLOSE bars per (event_type, week) —
    the first/last-by-time selection aggregate family (candlesticks,
    session snapshots). first/last is not associative over arbitrary
    splits, so each batch emits a CARRIER partial per local group —
    (open, its (ts,event_id) key; close, its key; high; low; n) — and
    the driver folds carriers with two lexsorts (min-key run starts →
    open, max-key run ends → close) plus three reduceats. Only
    blocks × types × weeks fixed-width rows ever move; values are
    selections of original doubles (no float arithmetic), so the
    DuckDB FIRST/LAST/MAX/MIN oracle is bit-exact."""
    import numpy as np

    schema = pa.schema([
        ("typ", pa.string()), ("wk", pa.int64()),
        ("o_ts", pa.int64()), ("o_eid", pa.int64()),
        ("open_v", pa.float64()),
        ("c_ts", pa.int64()), ("c_eid", pa.int64()),
        ("close_v", pa.float64()),
        ("high_v", pa.float64()), ("low_v", pa.float64()),
        ("n", pa.int64())])

    def partial(t: pa.Table) -> pa.Table:
        v = t.column("value")
        vnp = v.to_numpy(zero_copy_only=False)
        ok = pc.and_(pc.is_valid(t.column("ts")),
                     pc.is_valid(t.column("event_type")))
        ok = pc.and_(ok, pc.is_valid(v))
        ok = pc.and_(ok, pa.array(~np.isnan(vnp)))
        sub = t.filter(pc.fill_null(ok, False))
        if len(sub) == 0:
            return schema.empty_table()
        wk = pc.cast(pc.floor_temporal(sub.column("ts"), unit="week"),
                     pa.int64()).to_numpy(zero_copy_only=False)
        ts = pc.cast(sub.column("ts"), pa.int64()) \
            .to_numpy(zero_copy_only=False)
        eid = sub.column("event_id").to_numpy(zero_copy_only=False)
        val = sub.column("value").to_numpy(zero_copy_only=False)
        typ = sub.column("event_type").to_numpy(zero_copy_only=False)
        _, code = np.unique(typ, return_inverse=True)
        order = np.lexsort((eid, ts, wk, code))
        c_s, w_s = code[order], wk[order]
        n = len(order)
        new_run = np.empty(n, bool)
        new_run[0] = True
        new_run[1:] = (c_s[1:] != c_s[:-1]) | (w_s[1:] != w_s[:-1])
        starts = np.flatnonzero(new_run)
        ends = np.append(starts[1:], n) - 1
        v_s = val[order]
        return pa.table({
            "typ": pa.array(typ[order][starts], pa.string()),
            "wk": pa.array(w_s[starts], pa.int64()),
            "o_ts": pa.array(ts[order][starts], pa.int64()),
            "o_eid": pa.array(eid[order][starts], pa.int64()),
            "open_v": pa.array(v_s[starts], pa.float64()),
            "c_ts": pa.array(ts[order][ends], pa.int64()),
            "c_eid": pa.array(eid[order][ends], pa.int64()),
            "close_v": pa.array(v_s[ends], pa.float64()),
            "high_v": pa.array(np.maximum.reduceat(v_s, starts),
                               pa.float64()),
            "low_v": pa.array(np.minimum.reduceat(v_s, starts),
                              pa.float64()),
            "n": pa.array(np.diff(np.append(starts, n)).astype(np.int64),
                          pa.int64())})

    small = _read(sf_dir, "events",
                  ["event_id", "ts", "event_type", "value"]) \
        .map_batches(partial, batch_format="pyarrow")
    m = pa.concat_tables(
        list(small.iter_batches(batch_size=None, batch_format="pyarrow"))
        + [schema.empty_table()]).combine_chunks()
    typ = m.column("typ").to_numpy(zero_copy_only=False)
    wk = m.column("wk").to_numpy(zero_copy_only=False)
    _, code = np.unique(typ, return_inverse=True)
    cols = {k: m.column(k).to_numpy(zero_copy_only=False)
            for k in schema.names[2:]}
    o = np.lexsort((cols["o_eid"], cols["o_ts"], wk, code))
    n = len(o)
    c_o, w_o = code[o], wk[o]
    new_run = np.empty(n, bool)
    if n:
        new_run[0] = True
        new_run[1:] = (c_o[1:] != c_o[:-1]) | (w_o[1:] != w_o[:-1])
    starts = np.flatnonzero(new_run)
    # same (type, week) group boundaries under the close-key sort —
    # the primary lexsort keys are identical
    oc = np.lexsort((cols["c_eid"], cols["c_ts"], wk, code))
    ends = (np.append(starts[1:], n) - 1) if len(starts) else starts
    return pa.table({
        "event_type": pa.array(typ[o][starts], pa.string()),
        "week_start": pa.array(w_o[starts], pa.int64())
            .cast(pa.timestamp("us")),
        "open_v": pa.array(cols["open_v"][o][starts], pa.float64()),
        "high_v": pa.array(np.maximum.reduceat(cols["high_v"][o], starts)
                           if n else np.array([], np.float64),
                           pa.float64()),
        "low_v": pa.array(np.minimum.reduceat(cols["low_v"][o], starts)
                          if n else np.array([], np.float64),
                          pa.float64()),
        "close_v": pa.array(cols["close_v"][oc][ends], pa.float64()),
        "n": pa.array(np.add.reduceat(cols["n"][o], starts)
                      if n else np.array([], np.int64), pa.int64())})


SQL_OHLC_WEEKLY = """WITH e AS (
  SELECT event_type,
         CAST(date_trunc('week', ts) AS TIMESTAMP) AS week_start,
         ts, event_id, value
  FROM events
  WHERE ts IS NOT NULL AND event_type IS NOT NULL
        AND value IS NOT NULL AND NOT isnan(value))
SELECT event_type, week_start,
  FIRST(value ORDER BY ts, event_id) AS open_v,
  MAX(value) AS high_v,
  MIN(value) AS low_v,
  LAST(value ORDER BY ts, event_id) AS close_v,
  CAST(COUNT(*) AS BIGINT) AS n
FROM e GROUP BY event_type, week_start"""


def q_chat_format_check(sf_dir: str):
    """SFT chat-template QA over the flagship transcripts — the
    pre-training-format lint every fine-tuning pipeline runs before
    tokenization: per conversation, (a) does it open with a system or
    user turn, (b) how many adjacent same-role turns (template
    renderers that merge or reject them need the count), (c) how many
    'tool' turns not directly preceded by an assistant turn (orphan
    tool results), plus an overall ``ok`` verdict. One conv-bucket
    shuffle co-locates conversations; the per-bucket kernel is one
    lexsort + three vectorized masks + reduceat — output is one row
    per conversation, no driver combine."""
    import numpy as np

    n_buckets = adaptive_buckets(2 * _nrows(sf_dir, "events"))

    def add_bucket(tbl: pa.Table) -> pa.Table:
        return tbl.append_column(
            "bucket", fnv1a_bucket(tbl.column("conv_id"), n_buckets))

    def grp(g: pa.Table) -> pa.Table:
        conv = g.column("conv_id").to_numpy(zero_copy_only=False)
        tix = g.column("turn_idx").to_numpy(
            zero_copy_only=False).astype(np.int64)
        role = g.column("role").to_numpy(zero_copy_only=False)
        _, code = np.unique(conv, return_inverse=True)
        order = np.lexsort((tix, code))
        c_s, r_s = code[order], role[order]
        n = len(order)
        new_run = np.empty(n, bool)
        new_run[0] = True
        new_run[1:] = c_s[1:] != c_s[:-1]
        starts = np.flatnonzero(new_run)
        lens = np.diff(np.append(starts, n)).astype(np.int64)
        first_role = r_s[starts]
        bad_start = ~((first_role == "system") | (first_role == "user"))
        same = np.zeros(n, bool)
        same[1:] = (r_s[1:] == r_s[:-1]) & ~new_run[1:]
        n_same = np.add.reduceat(same.astype(np.int64), starts)
        prev_not_asst = np.empty(n, bool)
        prev_not_asst[0] = True
        prev_not_asst[1:] = r_s[:-1] != "assistant"
        orphan = (r_s == "tool") & (new_run | prev_not_asst)
        n_orphan = np.add.reduceat(orphan.astype(np.int64), starts)
        ok = ~bad_start & (n_same == 0) & (n_orphan == 0)
        return pa.table({
            "conv_id": pa.array(conv[order][starts], pa.string()),
            "n_turns": pa.array(lens, pa.int64()),
            "bad_start": pa.array(bad_start, pa.bool_()),
            "n_consec_same": pa.array(n_same, pa.int64()),
            "n_orphan_tool": pa.array(n_orphan, pa.int64()),
            "ok": pa.array(ok, pa.bool_())})

    return read_transcripts(sf_dir) \
        .map_batches(add_bucket, batch_format="pyarrow") \
        .groupby("bucket").map_groups(grp, batch_format="pyarrow") \
        .select_columns(["conv_id", "n_turns", "bad_start",
                         "n_consec_same", "n_orphan_tool", "ok"])


SQL_CHAT_FORMAT_CHECK = f"""{_T},
w AS (
  SELECT conv_id, role,
    LAG(role) OVER (PARTITION BY conv_id ORDER BY turn_idx) AS prev_role
  FROM transcripts),
per AS (
  SELECT conv_id,
    CAST(COUNT(*) AS BIGINT) AS n_turns,
    FIRST(role ORDER BY conv_id) FILTER (prev_role IS NULL)
      NOT IN ('system', 'user') AS bad_start,
    CAST(SUM(CASE WHEN role = prev_role THEN 1 ELSE 0 END) AS BIGINT)
      AS n_consec_same,
    CAST(SUM(CASE WHEN role = 'tool'
                   AND (prev_role IS NULL OR prev_role <> 'assistant')
             THEN 1 ELSE 0 END) AS BIGINT) AS n_orphan_tool
  FROM w GROUP BY conv_id)
SELECT conv_id, n_turns, bad_start, n_consec_same, n_orphan_tool,
       (NOT bad_start AND n_consec_same = 0 AND n_orphan_tool = 0) AS ok
FROM per"""


def q_order_reconciliation(sf_dir: str):
    """Billing reconciliation report — the ingest-QA join every
    warehouse load runs: does each order's header total equal the sum
    of its line extensions? Per-line charge is floor-cents int64 of
    the literal double chain ``((ext*(1-disc))*(1+tax))*100`` (same
    IEEE evaluation order as the SQL, so bit-exact), summed per order
    as exact integers. Shape: lineitem pre-aggregates per-batch
    (okey → partial cents, one row per distinct okey per batch), both
    sides move tagged through ONE okey-hash cogroup, and each group
    emits per-status partials (n, mismatches, Σ|diff|, max|diff|) —
    only statuses × buckets rows reach the driver fold."""
    import numpy as np

    n_buckets = adaptive_buckets(_nrows(sf_dir, "lineitem"),
                                 target_rows=200_000)
    schema = pa.schema([
        ("okey", pa.int64()), ("c", pa.int64()),
        ("status", pa.string()), ("side", pa.int8())])
    part_schema = pa.schema([
        ("o_orderstatus", pa.string()), ("n", pa.int64()),
        ("mism", pa.int64()), ("sad", pa.int64()), ("mad", pa.int64())])

    def tag_line(t: pa.Table) -> pa.Table:
        ext = t.column("l_extendedprice").to_numpy(zero_copy_only=False)
        disc = t.column("l_discount").to_numpy(zero_copy_only=False)
        tax = t.column("l_tax").to_numpy(zero_copy_only=False)
        cents = np.floor(((ext * (1.0 - disc)) * (1.0 + tax))
                         * 100.0).astype(np.int64)
        part = pa.table({"okey": t.column("l_orderkey"),
                         "c": pa.array(cents, pa.int64())}) \
            .group_by("okey").aggregate([("c", "sum")])
        n = part.num_rows
        return pa.table({
            "okey": part.column("okey"),
            "c": pc.cast(part.column("c_sum"), pa.int64()),
            "status": pa.nulls(n, pa.string()),
            "side": pa.array(np.ones(n, np.int8), pa.int8())})

    def tag_order(t: pa.Table) -> pa.Table:
        tot = t.column("o_totalprice").to_numpy(zero_copy_only=False)
        n = t.num_rows
        return pa.table({
            "okey": t.column("o_orderkey"),
            "c": pa.array(np.floor(tot * 100.0).astype(np.int64),
                          pa.int64()),
            "status": t.column("o_orderstatus"),
            "side": pa.array(np.zeros(n, np.int8), pa.int8())})

    tagged = _read(sf_dir, "lineitem",
                   ["l_orderkey", "l_extendedprice", "l_discount",
                    "l_tax"]) \
        .map_batches(tag_line, batch_format="pyarrow") \
        .union(_read(sf_dir, "orders",
                     ["o_orderkey", "o_totalprice", "o_orderstatus"])
               .map_batches(tag_order, batch_format="pyarrow")) \
        .map_batches(lambda t: t.append_column(
            "bucket", int_bucket(t.column("okey"), n_buckets)),
            batch_format="pyarrow")

    def grp(g: pa.Table) -> pa.Table:
        okey = g.column("okey").to_numpy(zero_copy_only=False)
        c = g.column("c").to_numpy(zero_copy_only=False)
        side = g.column("side").to_numpy(zero_copy_only=False)
        m1 = side == 1
        k1, c1 = okey[m1], c[m1]
        o1 = np.argsort(k1, kind="stable")
        k1s, c1s = k1[o1], c1[o1]
        if len(k1s):
            starts = np.flatnonzero(
                np.append(True, k1s[1:] != k1s[:-1]))
            uk = k1s[starts]
            sums = np.add.reduceat(c1s, starts)
        else:
            uk = k1s
            sums = c1s
        m0 = ~m1
        if not m0.any():
            return part_schema.empty_table()
        k0, tot = okey[m0], c[m0]
        if len(uk):
            pos = np.minimum(np.searchsorted(uk, k0), len(uk) - 1)
            found = uk[pos] == k0
            line = np.where(found, sums[pos], 0)
        else:
            line = np.zeros(len(k0), np.int64)
        diff = np.abs(line - tot)
        part = pa.table({
            "o_orderstatus": g.column("status").filter(pa.array(m0)),
            "one": pa.array(np.ones(len(k0), np.int64), pa.int64()),
            "mism": pa.array((diff != 0).astype(np.int64), pa.int64()),
            "ad": pa.array(diff, pa.int64())})
        gg = part.group_by("o_orderstatus").aggregate(
            [("one", "sum"), ("mism", "sum"), ("ad", "sum"),
             ("ad", "max")])
        return pa.table({
            "o_orderstatus": gg.column("o_orderstatus"),
            "n": pc.cast(gg.column("one_sum"), pa.int64()),
            "mism": pc.cast(gg.column("mism_sum"), pa.int64()),
            "sad": pc.cast(gg.column("ad_sum"), pa.int64()),
            "mad": pc.cast(gg.column("ad_max"), pa.int64())})

    small = tagged.groupby("bucket").map_groups(
        grp, batch_format="pyarrow")
    m = pa.concat_tables(
        list(small.iter_batches(batch_size=None, batch_format="pyarrow"))
        + [part_schema.empty_table()]).combine_chunks()
    gg = m.group_by("o_orderstatus").aggregate(
        [("n", "sum"), ("mism", "sum"), ("sad", "sum"), ("mad", "max")])
    return pa.table({
        "o_orderstatus": gg.column("o_orderstatus"),
        "n_orders": pc.cast(gg.column("n_sum"), pa.int64()),
        "n_mismatch": pc.cast(gg.column("mism_sum"), pa.int64()),
        "sum_abs_diff": pc.cast(gg.column("sad_sum"), pa.int64()),
        "max_abs_diff": pc.cast(gg.column("mad_max"), pa.int64())})


SQL_ORDER_RECONCILIATION = """WITH l AS (
  SELECT l_orderkey AS okey,
    SUM(CAST(FLOOR(((l_extendedprice * (1 - l_discount))
                    * (1 + l_tax)) * 100) AS BIGINT)) AS line_cents
  FROM lineitem GROUP BY l_orderkey),
o AS (
  SELECT o_orderkey AS okey, o_orderstatus,
         CAST(FLOOR(o_totalprice * 100) AS BIGINT) AS total_cents
  FROM orders)
SELECT o_orderstatus,
  CAST(COUNT(*) AS BIGINT) AS n_orders,
  CAST(SUM(CASE WHEN COALESCE(l.line_cents, 0) <> o.total_cents
           THEN 1 ELSE 0 END) AS BIGINT) AS n_mismatch,
  CAST(SUM(ABS(COALESCE(l.line_cents, 0) - o.total_cents)) AS BIGINT)
    AS sum_abs_diff,
  CAST(MAX(ABS(COALESCE(l.line_cents, 0) - o.total_cents)) AS BIGINT)
    AS max_abs_diff
FROM o LEFT JOIN l USING (okey)
GROUP BY o_orderstatus"""


def q_out_of_order_audit(sf_dir: str):
    """Watermark-lateness audit — the streaming-ingest QA that sizes
    allowed-lateness: treating ``event_id`` as arrival order, how many
    events arrive with ``ts`` OLDER than the running maximum ts seen
    so far, per event type, and how stale was the worst one? The
    global prefix-MAX is distributed like ``global_running_sum``'s
    prefix sum: (1) a shuffle-free pass folds per-batch per-id-range
    bucket max-ts partials (buckets are monotone event_id ranges from
    the parquet footer); (2) the driver exclusive-prefix-maxes the
    ≤ adaptive_buckets totals; (3) ONE keyed shuffle, each group
    sorting by event_id and folding its carry-in max. Output is one
    row per event type — per-bucket partials are types-wide."""
    import numpy as np

    from .util import range_bucket_step

    id_max = _footer_max(sf_dir, "events", "event_id")
    n_buckets = adaptive_buckets(_nrows(sf_dir, "events"))
    step = range_bucket_step(id_max + 1, n_buckets)
    part_schema = pa.schema([
        ("event_type", pa.string()), ("n", pa.int64()),
        ("n_late", pa.int64()), ("max_late_us", pa.int64())])

    def project(t: pa.Table) -> pa.Table:
        sub = t.filter(pc.is_valid(t.column("ts")))
        eid = sub.column("event_id").to_numpy(zero_copy_only=False)
        return pa.table({
            "eid": sub.column("event_id"),
            "ts": pc.cast(sub.column("ts"), pa.int64()),
            "typ": sub.column("event_type"),
            "bucket": pa.array(eid // step, pa.int64())})

    proj = _read(sf_dir, "events", ["event_id", "ts", "event_type"]) \
        .map_batches(project, batch_format="pyarrow").materialize()

    def bmax(t: pa.Table) -> pa.Table:
        g = t.group_by("bucket").aggregate([("ts", "max")])
        return pa.table({"bucket": g.column("bucket"),
                         "m": g.column("ts_max")})

    parts = pa.concat_tables(list(
        proj.map_batches(bmax, batch_format="pyarrow")
        .iter_batches(batch_size=None, batch_format="pyarrow")))
    gm = parts.group_by("bucket").aggregate([("m", "max")])
    b = gm.column("bucket").to_numpy(zero_copy_only=False)
    m = gm.column("m_max").to_numpy(zero_copy_only=False)
    order = np.argsort(b)
    mx = m[order]
    lo = np.iinfo(np.int64).min
    carry = dict(zip(
        b[order].tolist(),
        np.append(lo, np.maximum.accumulate(mx)[:-1]).tolist()))

    def grp(g: pa.Table) -> pa.Table:
        cin = carry[int(g.column("bucket")[0].as_py())]
        eid = g.column("eid").to_numpy(zero_copy_only=False)
        ts = g.column("ts").to_numpy(zero_copy_only=False)
        order = np.argsort(eid)
        ts_s = ts[order]
        n = len(order)
        prev = np.empty(n, np.int64)
        prev[0] = cin
        np.maximum(np.maximum.accumulate(ts_s)[:-1], cin, out=prev[1:])
        late = ts_s < prev
        lateness = np.where(late, prev - ts_s, 0)
        part = pa.table({
            "event_type": g.column("typ").take(pa.array(order)),
            "one": pa.array(np.ones(n, np.int64), pa.int64()),
            "late": pa.array(late.astype(np.int64), pa.int64()),
            "lateness": pa.array(lateness, pa.int64()),
            "is_late": pa.array(late, pa.bool_())})
        gg = part.group_by("event_type").aggregate(
            [("one", "sum"), ("late", "sum")])
        lg = part.filter(part.column("is_late")) \
            .group_by("event_type").aggregate([("lateness", "max")])
        mlu = {t: v for t, v in zip(
            lg.column("event_type").to_pylist(),
            lg.column("lateness_max").to_pylist())}
        typs = gg.column("event_type").to_pylist()
        return pa.table({
            "event_type": gg.column("event_type"),
            "n": pc.cast(gg.column("one_sum"), pa.int64()),
            "n_late": pc.cast(gg.column("late_sum"), pa.int64()),
            "max_late_us": pa.array([mlu.get(t) for t in typs],
                                    pa.int64())})

    small = proj.groupby("bucket").map_groups(grp,
                                              batch_format="pyarrow")
    mm = pa.concat_tables(
        list(small.iter_batches(batch_size=None, batch_format="pyarrow"))
        + [part_schema.empty_table()]).combine_chunks()
    gg = mm.group_by("event_type").aggregate(
        [("n", "sum"), ("n_late", "sum"), ("max_late_us", "max")])
    return pa.table({
        "event_type": gg.column("event_type"),
        "n": pc.cast(gg.column("n_sum"), pa.int64()),
        "n_late": pc.cast(gg.column("n_late_sum"), pa.int64()),
        "max_late_us": pc.cast(gg.column("max_late_us_max"),
                               pa.int64())})


SQL_OUT_OF_ORDER_AUDIT = """WITH w AS (
  SELECT event_type, ts,
    MAX(ts) OVER (ORDER BY event_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
      AS prev_max
  FROM events WHERE ts IS NOT NULL)
SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
  CAST(SUM(CASE WHEN ts < prev_max THEN 1 ELSE 0 END) AS BIGINT)
    AS n_late,
  CAST(MAX(CASE WHEN ts < prev_max
            THEN epoch_us(prev_max) - epoch_us(ts) END) AS BIGINT)
    AS max_late_us
FROM w GROUP BY event_type"""


def q_compressibility(sf_dir: str):
    """zlib-compressibility quality signal per document — the
    published low-entropy/boilerplate heuristic large-corpus curation
    stacks run alongside the Gopher repetition rules (highly
    repetitive or templated text compresses far below natural prose).
    Per doc: raw UTF-8 bytes, zlib-deflate(level 6) bytes, their
    ratio, and a ``flag_repetitive`` verdict at ratio < 0.3.
    Embarrassingly parallel map_batches; the per-doc zlib call is C
    compute (like model inference), raw lengths stay vectorized.
    Rows-only: zlib is not SQL-expressible; the pytest recomputes
    every row with zlib directly (brute-force equivalence)."""
    import zlib

    def score(t: pa.Table) -> pa.Table:
        raw = pc.cast(pc.binary_length(t.column("text")), pa.int64())
        comp = [len(zlib.compress(s.encode("utf-8"), 6)) if s is not None
                else None for s in t.column("text").to_pylist()]
        comp_a = pa.array(comp, pa.int64())
        ratio = pc.divide(pc.cast(comp_a, pa.float64()),
                          pc.cast(pc.max_element_wise(raw, 1),
                                  pa.float64()))
        return pa.table({
            "doc_id": t.column("doc_id"),
            "raw_bytes": raw,
            "comp_bytes": comp_a,
            "ratio": ratio,
            "flag_repetitive": pc.less(ratio, 0.3)})

    return _read(sf_dir, "documents", ["doc_id", "text"]) \
        .map_batches(score, batch_format="pyarrow")


def q_bpe_merges(sf_dir: str):
    """BPE tokenizer-training merge table over the documents corpus:
    ONE distributed pass folds word-type counts (per-batch group-by
    partials — one row per distinct token per batch moves, never per
    occurrence), then the weighted merge loop runs driver-side over
    the bounded type table (`textops.analysis.bpe_merges` — that is
    the real trainers' scale shape too). Output: the first 8 merges
    as (iteration, left, right, merged, pair_count). Rows-only: the
    iterative argmax is not SQL-expressible; the pytest replays the
    algorithm independently from raw SQL word counts."""
    merges = _train_bpe(sf_dir, n_merges=8)
    return pa.table({
        "iteration": pa.array(range(1, len(merges) + 1), pa.int64()),
        "left": pa.array([m[0] for m in merges], pa.string()),
        "right": pa.array([m[1] for m in merges], pa.string()),
        "merged": pa.array([m[2] for m in merges], pa.string()),
        "pair_count": pa.array([m[3] for m in merges], pa.int64())})


def _train_bpe(sf_dir: str, n_merges: int):
    """Shared trainer for `bpe_merges` / `bpe_encode`: ONE distributed
    word-type-count fold (per-batch group-by partials), then the
    weighted merge loop driver-side over the bounded type table."""
    from .textops.analysis import bpe_merges, flat_tokens

    def partial(t: pa.Table) -> pa.Table:
        import numpy as np
        _, toks, _ = flat_tokens(t.column("text"))
        g = pa.table({
            "w": toks,
            "one": pa.array(np.ones(len(toks), np.int64), pa.int64())
        }).group_by("w").aggregate([("one", "sum")])
        return pa.table({"w": g.column("w"),
                         "n": pc.cast(g.column("one_sum"), pa.int64())})

    counts = _combine_partials(
        _read(sf_dir, "documents", ["text"])
        .map_batches(partial, batch_format="pyarrow"),
        ["w"], {"n": "n"})
    counts = counts.sort_by("w")
    return bpe_merges(counts.column("w").to_pylist(),
                      counts.column("n").to_pylist(), n_merges=n_merges)


def q_bpe_encode(sf_dir: str):
    """BPE APPLY — the other half of the tokenizer loop `bpe_merges`
    trains: encode every document with the trained merge table and
    report ``(doc_id, n_tokens, n_symbols)`` (symbols after merges —
    the number a subword tokenizer would bill the doc at; fertility =
    n_symbols / n_tokens). Train once (driver, from the distributed
    type-count fold), broadcast the tiny merge list in the stage
    closure, then one vectorized pass: per batch the apply loop runs
    ONLY over the batch's DISTINCT word types (memoized `bpe_apply_len`
    — types not occurrences, the same scale shape as training) and
    per-doc symbol sums come from an Arrow group-by over
    ``index_in``-mapped per-type lengths. Rows-only: the iterative
    merge application is not SQL-expressible; value-asserted by an
    independent reference replay + committed golden fixture."""
    import numpy as np

    from .textops.analysis import bpe_apply_len, flat_tokens

    merges3 = [(m[0], m[1], m[2]) for m in _train_bpe(sf_dir, 8)]

    def encode(t: pa.Table) -> pa.Table:
        sub = t.filter(pc.is_valid(t.column("text")))
        row_id, toks, n_rows = flat_tokens(sub.column("text"))
        doc = pc.cast(sub.column("doc_id"), pa.int64()) \
            .to_numpy(zero_copy_only=False)
        types = pc.unique(toks)
        memo: dict = {}
        lens = np.fromiter(
            (bpe_apply_len(w, merges3, memo) for w in types.to_pylist()),
            np.int64, len(types))
        code = pc.index_in(toks, value_set=types) \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        sym = lens[code]
        n_tok = np.bincount(row_id, minlength=n_rows).astype(np.int64)
        n_sym = np.bincount(row_id, weights=sym,
                            minlength=n_rows).astype(np.int64)
        return pa.table({"doc_id": pa.array(doc, pa.int64()),
                         "n_tokens": pa.array(n_tok, pa.int64()),
                         "n_symbols": pa.array(n_sym, pa.int64())})

    return _read(sf_dir, "documents", ["doc_id", "text"], blocks=16) \
        .map_batches(encode, batch_format="pyarrow")


def q_feature_hashing(sf_dir: str):
    """Hashing-trick text vectorizer (Weinberger et al. 2009 /
    sklearn HashingVectorizer, public algorithm): each token hashes
    to one of 64 feature indices via FNV-1a, with a signed ±1
    contribution from an independent hash bit, so collisions cancel
    in expectation. Output is the exploded sparse form
    (doc_id, idx, weight) — exact integers, join-able and
    SQL-checkable (the oracle replays FNV-1a byte-for-byte with a
    HUGEINT list_reduce). NO shuffle at all: a document is one row,
    so every (doc, idx) group completes inside its batch — the whole
    vectorizer is embarrassingly parallel map_batches over the
    shared `flat_tokens` tokenizer and the vectorized `fnv1a_u64`."""
    import numpy as np

    from .textops.analysis import flat_tokens
    from .util import fnv1a_u64

    def vectorize(t: pa.Table) -> pa.Table:
        row_id, toks, _ = flat_tokens(t.column("text"))
        hv = fnv1a_u64(toks)
        idx = (hv % np.uint64(64)).astype(np.int64)
        sign = np.where((hv >> np.uint64(6)) & np.uint64(1) == 0,
                        1, -1).astype(np.int64)
        doc = t.column("doc_id").to_numpy(
            zero_copy_only=False)[row_id]
        g = pa.table({"doc_id": pa.array(doc, pa.int64()),
                      "idx": pa.array(idx, pa.int64()),
                      "s": pa.array(sign, pa.int64())}) \
            .group_by(["doc_id", "idx"]).aggregate([("s", "sum")])
        return pa.table({
            "doc_id": g.column("doc_id"),
            "idx": g.column("idx"),
            "weight": pc.cast(g.column("s_sum"), pa.int64())})

    return _read(sf_dir, "documents", ["doc_id", "text"]) \
        .map_batches(vectorize, batch_format="pyarrow")


SQL_FEATURE_HASHING = """WITH tok AS (
  SELECT doc_id,
    unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS w
  FROM documents),
h AS (
  SELECT doc_id, list_reduce(
    list_prepend(CAST(14695981039346656037 AS UBIGINT),
      list_transform(split(w, ''), c -> CAST(unicode(c) AS UBIGINT))),
    (h, c) -> CAST(CAST((CAST(xor(h, c) AS HUGEINT) * 1099511628211)
                        % 18446744073709551616 AS HUGEINT)
                   AS UBIGINT)) AS hv
  FROM tok)
SELECT doc_id, CAST(hv % 64 AS BIGINT) AS idx,
  CAST(SUM(CASE WHEN (hv >> 6) & 1 = 0 THEN 1 ELSE -1 END) AS BIGINT)
    AS weight
FROM h GROUP BY doc_id, idx"""


def q_vocab_coverage(sf_dir: str):
    """Top-p (nucleus) vocabulary truncation — the tokenizer-design
    question "how many types cover 90% of corpus mass?": rank tokens
    by count (ties broken lexicographically) and keep the smallest
    prefix whose cumulative count reaches 90% of all occurrences; a
    token is kept iff the mass BEFORE it is under the threshold.
    Distributed partial counts (one row per batch×type), driver-side
    rank/cumsum over the bounded type table; the 90% test is exact
    integer arithmetic (``(cum−n)·10 < total·9``) — no float
    threshold to disagree on."""
    import numpy as np

    from .textops.analysis import flat_tokens

    def partial(t: pa.Table) -> pa.Table:
        _, toks, _ = flat_tokens(t.column("text"))
        g = pa.table({
            "w": toks,
            "one": pa.array(np.ones(len(toks), np.int64), pa.int64())
        }).group_by("w").aggregate([("one", "sum")])
        return pa.table({"w": g.column("w"),
                         "n": pc.cast(g.column("one_sum"), pa.int64())})

    counts = _combine_partials(
        _read(sf_dir, "documents", ["text"])
        .map_batches(partial, batch_format="pyarrow"),
        ["w"], {"n": "n"})
    w = np.array(counts.column("w").to_pylist(), object)
    n = counts.column("n").to_numpy(zero_copy_only=False)
    order = np.lexsort((w, -n))
    w, n = w[order], n[order]
    cum = np.cumsum(n)
    total = int(cum[-1]) if len(cum) else 0
    keep = (cum - n) * 10 < total * 9
    return pa.table({
        "token": pa.array(w[keep], pa.string()),
        "n": pa.array(n[keep], pa.int64()),
        "rank": pa.array(np.arange(1, len(w) + 1)[keep], pa.int64()),
        "cum_n": pa.array(cum[keep], pa.int64())})


SQL_VOCAB_COVERAGE = """WITH tok AS (
  SELECT unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS w
  FROM documents),
c AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS n FROM tok GROUP BY w),
r AS (SELECT w, n,
        CAST(ROW_NUMBER() OVER (ORDER BY n DESC, w) AS BIGINT)
          AS rank,
        CAST(SUM(n) OVER (ORDER BY n DESC, w ROWS UNBOUNDED PRECEDING)
             AS BIGINT) AS cum_n
      FROM c),
t AS (SELECT CAST(SUM(n) AS BIGINT) AS total FROM c)
SELECT w AS token, n, rank, cum_n
FROM r, t WHERE (cum_n - n) * 10 < total * 9"""


def q_span_corruption(sf_dir: str):
    """T5/UL2-style span-corruption denoising pairs over `documents`
    (see :func:`raybeats.textops.curation.span_corruption`): mask a
    deterministic 15% of tokens, collapse each masked run into an
    ``<extra_id_N>`` sentinel, emit ``(doc_id, input_text,
    target_text)``. One shuffle-free vectorized pass — each row is a
    whole document, so spans never cross batches; the mask decision is
    the `hash_split` integer mix on ``(doc_id, position)``, bit-equal
    in HUGEINT SQL."""
    from .textops.curation import span_corruption

    def fn(t: pa.Table) -> pa.Table:
        return span_corruption(t, rate_pct=15)

    return _read(sf_dir, "documents", ["doc_id", "text"], blocks=16) \
        .map_batches(fn, batch_format="pyarrow")


SQL_SPAN_CORRUPTION = """WITH base AS (
  SELECT doc_id, lower(text) AS lt FROM documents
  WHERE text IS NOT NULL),
tok AS (SELECT doc_id,
          unnest(regexp_extract_all(lt, '[a-z0-9]+')) AS tk,
          generate_subscripts(regexp_extract_all(lt, '[a-z0-9]+'), 1)
            - 1 AS pos
        FROM base),
mk AS (SELECT doc_id, tk, pos,
         (xor(m2, m2 >> 15) % 100) < 15 AS masked
       FROM (SELECT doc_id, tk, pos,
               CAST(CAST((CAST(doc_id AS HUGEINT) * 1000003 + pos)
                         % 4294967296 AS HUGEINT)
                    * 2654435761 % 4294967296 AS BIGINT) AS m2
             FROM tok) h),
r AS (SELECT *, CASE WHEN masked AND
                     NOT coalesce(lag(masked) OVER w, FALSE)
                THEN 1 ELSE 0 END AS rs
      FROM mk WINDOW w AS (PARTITION BY doc_id ORDER BY pos)),
s AS (SELECT *, CAST(SUM(rs) OVER (PARTITION BY doc_id ORDER BY pos)
                     AS BIGINT) - 1 AS sid FROM r),
inp AS (SELECT doc_id,
          string_agg(CASE WHEN rs = 1
                     THEN '<extra_id_' || CAST(sid AS VARCHAR) || '>'
                     ELSE tk END, ' ' ORDER BY pos)
            FILTER (WHERE NOT masked OR rs = 1) AS input_text
        FROM s GROUP BY doc_id),
tgt AS (SELECT doc_id,
          string_agg(CASE WHEN rs = 1
                     THEN '<extra_id_' || CAST(sid AS VARCHAR)
                          || '> ' || tk
                     ELSE tk END, ' ' ORDER BY pos)
            FILTER (WHERE masked) AS target_text
        FROM s GROUP BY doc_id)
SELECT b.doc_id, coalesce(i.input_text, '') AS input_text,
       coalesce(t.target_text, '') AS target_text
FROM base b LEFT JOIN inp i USING (doc_id)
LEFT JOIN tgt t USING (doc_id)"""


def q_cdc_apply(sf_dir: str):
    """Change-data-capture APPLY with delete semantics: treat `events`
    as a keyed op log (key = user_id, delete op = ``'error'``) and
    materialize the final table state — the last op per key wins; a
    key whose last op is a delete is ABSENT from the output. Extends
    `latest_event`/`keep_latest` (upsert-only compaction) with the
    tombstone rule every CDC sink (Debezium-style) needs. One bounded
    keyed shuffle (`keep_latest`: local argmax per batch, then
    keys × blocks survivors), delete filter applied after — a
    tombstone must SUPPRESS earlier upserts, so it can only be
    dropped post-compaction."""
    from .aggregates import keep_latest

    ev = _read(sf_dir, "events",
               ["event_id", "user_id", "event_type", "value", "ts"])
    last = keep_latest(ev, key="user_id", order_by=("ts", "event_id"),
                       n_buckets=adaptive_buckets(
                           _nrows(sf_dir, "events"), lo=8))

    def fin(t: pa.Table) -> pa.Table:
        live = t.filter(pc.invert(pc.equal(t.column("event_type"),
                                           pa.scalar("error"))))
        return pa.table({"user_id": live.column("user_id"),
                         "last_op": live.column("event_type"),
                         "value": live.column("value"),
                         "ts": live.column("ts")})

    return last.map_batches(fin, batch_format="pyarrow")


SQL_CDC_APPLY = """WITH last AS (
  SELECT user_id, event_type, value, ts,
    row_number() OVER (PARTITION BY user_id
                       ORDER BY ts DESC, event_id DESC) AS rn
  FROM events)
SELECT user_id, event_type AS last_op, value, ts
FROM last WHERE rn = 1 AND event_type <> 'error'"""


def q_weighted_median(sf_dir: str):
    """Exact per-flag WEIGHTED median of lineitem price quanta under
    quantity weights (see
    :func:`raybeats.aggregates.grouped_weighted_median`) — weighted
    order statistics, the weight-aware generalization of the exact
    quantile family."""
    from .aggregates import grouped_weighted_median

    li = _read(sf_dir, "lineitem",
               ["l_returnflag", "l_extendedprice", "l_quantity"])
    return grouped_weighted_median(li, value_col="l_extendedprice",
                                   weight_col="l_quantity",
                                   by="l_returnflag")


SQL_WEIGHTED_MEDIAN = """WITH q AS (
  SELECT l_returnflag,
    CAST(floor(l_extendedprice * 100) AS BIGINT) AS qq,
    CAST(l_quantity AS BIGINT) AS w
  FROM lineitem WHERE l_extendedprice IS NOT NULL),
g AS (SELECT l_returnflag, qq, SUM(w) AS w FROM q GROUP BY 1, 2),
c AS (SELECT l_returnflag, qq,
        SUM(w) OVER (PARTITION BY l_returnflag ORDER BY qq
                     ROWS UNBOUNDED PRECEDING) AS cum,
        SUM(w) OVER (PARTITION BY l_returnflag) AS tot
      FROM g)
SELECT l_returnflag, CAST(tot AS BIGINT) AS total_w,
       MIN(qq) AS wmedian_cents
FROM c WHERE 2 * cum >= tot GROUP BY l_returnflag, tot"""


def q_auc_score(sf_dir: str):
    """Exact ROC-AUC (≡ Mann-Whitney U) of `value` as a score for the
    binary label ``event_type = 'purchase'`` — the ranking-eval metric
    an LLM-data pipeline uses to validate quality/reward scores
    against labels. Computed WITHOUT a global sort: per-batch
    ``(quantum, n_pos, n_neg)`` partials (quantum = floor(value·100),
    bounded by value range × precision — the exact-quantile CDF
    shape), driver fold, then the tie-aware integer identity
    ``2U = Σ_q pos_q·(2·cumneg_below + neg_q)`` (ties count half).
    ``auc = 2U / (2·n_pos·n_neg)`` is ONE division of exact integers —
    both engines round int→double→divide identically, so the oracle
    compares bit-for-bit."""
    import numpy as np

    def partial(t: pa.Table) -> pa.Table:
        v = t.column("value").to_numpy(zero_copy_only=False)
        ok = ~np.isnan(v)
        pos = pc.fill_null(pc.equal(t.column("event_type"),
                                    pa.scalar("purchase")), False) \
            .to_numpy(zero_copy_only=False)[ok].astype(np.int64)
        tt = pa.table({
            "q": pa.array(np.floor(v[ok] * 100).astype(np.int64),
                          pa.int64()),
            "np": pa.array(pos, pa.int64()),
            "nn": pa.array(1 - pos, pa.int64())})
        g = tt.group_by("q").aggregate([("np", "sum"), ("nn", "sum")])
        return pa.table({"q": g.column("q"),
                         "np": pc.cast(g.column("np_sum"), pa.int64()),
                         "nn": pc.cast(g.column("nn_sum"), pa.int64())})

    cdf = _combine_partials(
        _read(sf_dir, "events", ["event_type", "value"])
        .map_batches(partial, batch_format="pyarrow"),
        ["q"], {"np": "np", "nn": "nn"})
    import numpy as np
    q = cdf.column("q").to_numpy(zero_copy_only=False)
    npos_q = cdf.column("np").to_numpy(zero_copy_only=False)
    nneg_q = cdf.column("nn").to_numpy(zero_copy_only=False)
    order = np.argsort(q, kind="stable")
    npos_q, nneg_q = npos_q[order], nneg_q[order]
    cumneg_below = np.r_[0, np.cumsum(nneg_q)[:-1]]
    two_u = int(np.sum(npos_q * (2 * cumneg_below + nneg_q)))
    n_pos, n_neg = int(npos_q.sum()), int(nneg_q.sum())
    auc = float(two_u) / ((2.0 * float(n_pos)) * float(n_neg)) \
        if n_pos and n_neg else 0.0
    return pa.table({"n_pos": pa.array([n_pos], pa.int64()),
                     "n_neg": pa.array([n_neg], pa.int64()),
                     "two_u": pa.array([two_u], pa.int64()),
                     "auc": pa.array([auc], pa.float64())})


SQL_AUC_SCORE = """WITH e AS (
  SELECT CAST(floor(value * 100) AS BIGINT) AS q,
         CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS pos
  FROM events WHERE NOT isnan(value)),
g AS (SELECT q, SUM(pos) AS np, SUM(1 - pos) AS nn
      FROM e GROUP BY q),
c AS (SELECT q, np, nn,
        coalesce(SUM(nn) OVER (ORDER BY q
          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
          AS cumneg
      FROM g)
SELECT CAST(SUM(np) AS BIGINT) AS n_pos,
  CAST(SUM(nn) AS BIGINT) AS n_neg,
  CAST(SUM(np * (2 * cumneg + nn)) AS BIGINT) AS two_u,
  CASE WHEN SUM(np) = 0 OR SUM(nn) = 0 THEN 0.0
       ELSE CAST(SUM(np * (2 * cumneg + nn)) AS DOUBLE)
            / (2.0 * CAST(SUM(np) AS DOUBLE)
               * CAST(SUM(nn) AS DOUBLE)) END AS auc
FROM c"""


def q_cohens_kappa(sf_dir: str):
    """Cohen's kappa of the LangId classifier against the labeled
    ``lang`` column — chance-corrected agreement, the scalar summary
    of `lang_confusion`'s matrix. Reuses that query's actor-stage
    confusion fold verbatim, then exact integer arithmetic on the
    driver: ``kappa = (N·diag − Σ_k row_k·col_k)
    / (N² − Σ_k row_k·col_k)`` — numerator and denominator are exact
    int64s, the double ratio is one division, so the oracle compares
    bit-for-bit."""
    conf = q_lang_confusion(sf_dir)
    lang = conf.column("lang").to_pylist()
    pred = conf.column("lang_pred").to_pylist()
    n = conf.column("n").to_pylist()
    total = sum(n)
    diag = sum(c for la, p, c in zip(lang, pred, n) if la == p)
    rows: dict = {}
    cols: dict = {}
    for la, p, c in zip(lang, pred, n):
        rows[p] = rows.get(p, 0) + c
        cols[la] = cols.get(la, 0) + c
    chance = sum(rows.get(k, 0) * cols.get(k, 0)
                 for k in set(rows) | set(cols))
    num, den = total * diag - chance, total * total - chance
    kappa = float(num) / float(den) if den else 0.0
    return pa.table({"n_docs": pa.array([total], pa.int64()),
                     "n_agree": pa.array([diag], pa.int64()),
                     "kappa_num": pa.array([num], pa.int64()),
                     "kappa_den": pa.array([den], pa.int64()),
                     "kappa": pa.array([kappa], pa.float64())})


SQL_COHENS_KAPPA = f"""WITH conf AS ({SQL_LANG_CONFUSION}),
tot AS (SELECT SUM(n) AS nn FROM conf),
diag AS (SELECT coalesce(SUM(n), 0) AS d FROM conf
         WHERE lang = lang_pred),
marg AS (SELECT coalesce(SUM(r.rn * c.cn), 0) AS ch FROM
  (SELECT lang_pred AS k, SUM(n) AS rn FROM conf GROUP BY 1) r
  JOIN (SELECT lang AS k, SUM(n) AS cn FROM conf GROUP BY 1) c
  USING (k))
SELECT CAST(nn AS BIGINT) AS n_docs, CAST(d AS BIGINT) AS n_agree,
  CAST(nn * d - ch AS BIGINT) AS kappa_num,
  CAST(nn * nn - ch AS BIGINT) AS kappa_den,
  CASE WHEN nn * nn - ch = 0 THEN 0.0
       ELSE CAST(nn * d - ch AS DOUBLE)
            / CAST(nn * nn - ch AS DOUBLE) END AS kappa
FROM tot, diag, marg"""


def q_calibration_bins(sf_dir: str):
    """Reliability-diagram (calibration) report — the companion of
    `auc_score`: bin events by exact global DECILE THRESHOLDS of
    ``value`` and report each bin's size and purchase rate. A
    well-calibrated score shows monotone rates; AUC alone can't see
    miscalibration. Deciles come from the same bounded
    ``(quantum, count)`` CDF the quantile family uses (threshold
    ``t_k`` = smallest quantum with ``cum ≥ ceil(k·N/10)``) and TIES
    SHARE A BIN (bin = 1 + #{k ≤ 9 : q > t_k}) — unlike NTILE, this
    assignment is engine-order-independent, so the oracle compares
    bit-for-bit. Two narrow passes (CDF fold, then assignment with
    the 9 thresholds broadcast in the closure), driver fold of ≤10
    rows per batch; ``pos_rate`` is one int→double division."""
    import numpy as np

    def cdf_partial(t: pa.Table) -> pa.Table:
        v = t.column("value").to_numpy(zero_copy_only=False)
        ok = ~np.isnan(v)
        tt = pa.table({"q": pa.array(
            np.floor(v[ok] * 100).astype(np.int64), pa.int64())})
        g = tt.group_by("q").aggregate([([], "count_all")])
        return pa.table({"q": g.column("q"),
                         "n": pc.cast(g.column("count_all"),
                                      pa.int64())})

    ds = _read(sf_dir, "events", ["event_type", "value"])
    cdf = _combine_partials(
        ds.map_batches(cdf_partial, batch_format="pyarrow"),
        ["q"], {"n": "n"})
    import numpy as np
    q = cdf.column("q").to_numpy(zero_copy_only=False)
    n = cdf.column("n").to_numpy(zero_copy_only=False)
    order = np.argsort(q, kind="stable")
    uniq, cum = q[order], np.cumsum(n[order])
    total = int(cum[-1])
    # t_k = smallest quantum with cum >= ceil(k*N/10), k = 1..9
    ranks = [(k * total + 9) // 10 for k in range(1, 10)]
    thresholds = np.array(
        [int(uniq[np.searchsorted(cum, r, side="left")])
         for r in ranks], np.int64)

    def assign(t: pa.Table) -> pa.Table:
        v = t.column("value").to_numpy(zero_copy_only=False)
        ok = ~np.isnan(v)
        qq = np.floor(v[ok] * 100).astype(np.int64)
        pos = pc.fill_null(pc.equal(t.column("event_type"),
                                    pa.scalar("purchase")), False) \
            .to_numpy(zero_copy_only=False)[ok].astype(np.int64)
        bins = 1 + (qq[:, None] > thresholds[None, :]).sum(axis=1)
        tt = pa.table({"bin": pa.array(bins, pa.int64()),
                       "np": pa.array(pos, pa.int64()),
                       "one": pa.array(np.ones(len(qq), np.int64),
                                       pa.int64())})
        g = tt.group_by("bin").aggregate([("np", "sum"),
                                          ("one", "sum")])
        return pa.table({"bin": g.column("bin"),
                         "np": pc.cast(g.column("np_sum"), pa.int64()),
                         "n": pc.cast(g.column("one_sum"),
                                      pa.int64())})

    agg = _combine_partials(
        ds.map_batches(assign, batch_format="pyarrow"),
        ["bin"], {"np": "np", "n": "n"})
    b = agg.column("bin").to_numpy(zero_copy_only=False)
    npos = agg.column("np").to_numpy(zero_copy_only=False)
    cnt = agg.column("n").to_numpy(zero_copy_only=False)
    order = np.argsort(b, kind="stable")
    b, npos, cnt = b[order], npos[order], cnt[order]
    rate = np.array([float(p) / float(c) for p, c in zip(npos, cnt)],
                    np.float64)
    return pa.table({"bin": pa.array(b, pa.int64()),
                     "n": pa.array(cnt, pa.int64()),
                     "n_pos": pa.array(npos, pa.int64()),
                     "pos_rate": pa.array(rate, pa.float64())})


SQL_CALIBRATION_BINS = """WITH e AS (
  SELECT CAST(floor(value * 100) AS BIGINT) AS q,
         CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS pos
  FROM events WHERE NOT isnan(value)),
g AS (SELECT q, CAST(COUNT(*) AS BIGINT) AS n FROM e GROUP BY q),
c AS (SELECT q, SUM(n) OVER (ORDER BY q
        ROWS UNBOUNDED PRECEDING) AS cum FROM g),
tot AS (SELECT SUM(n) AS total FROM g),
thr AS (SELECT k, MIN(q) AS t FROM c, tot,
          (SELECT unnest(range(1, 10)) AS k)
        WHERE cum >= (k * total + 9) // 10 GROUP BY k),
a AS (SELECT e.q, e.pos,
        1 + (SELECT COUNT(*) FROM thr WHERE e.q > thr.t) AS bin
      FROM e)
SELECT bin, CAST(COUNT(*) AS BIGINT) AS n,
  CAST(SUM(pos) AS BIGINT) AS n_pos,
  CAST(SUM(pos) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS pos_rate
FROM a GROUP BY bin"""


GROK_LOG = ('level=%{WORD:level} ts=%{TIMESTAMP_ISO8601:event_ts} '
            'caller=%{NOTSPACE:caller} '
            'msg="evt %{INT:evt_id:int} %{WORD:action}"')


def q_grok_parse(sf_dir: str):
    """Grok named-pattern parse of the flagship log lines — the regex
    companion of ``parse_dissect`` (:mod:`raybeats.grok`; the public
    ``%{SYNTAX:semantic:type}`` grammar with composite library
    patterns — TIMESTAMP_ISO8601 here expands through 6 sub-patterns —
    and ``:int`` type conversion). One compile driver-side, one
    C-level RE2 ``extract_regex`` pass + one int cast per batch; the
    oracle runs the IDENTICAL expanded regex string (both engines are
    RE2), extracting by capture-group index."""
    from .grok import GrokParser
    p = GrokParser(f"^{GROK_LOG}$")

    def parse(tbl: pa.Table) -> pa.Table:
        vals, ok = p.parse_column(tbl.column("text"))
        return pa.table({
            "conv_id": tbl.column("conv_id"),
            "turn_idx": tbl.column("turn_idx"),
            "parse_ok": ok, **vals})

    return read_transcripts(sf_dir).map_batches(
        parse, batch_format="pyarrow", zero_copy_batch=True)


def _grok_sql_fields(parser, re_sql: str, *, skip=(),
                     when: str = "") -> str:
    # DuckDB's regexp_extract BY INDEX caps at group 9; wide patterns
    # (COMMONAPACHELOG has 10 fields) extract through the named-struct
    # form instead, which has no such cap. DuckDB assigns the name
    # list POSITIONALLY by group index (verified — it ignores the
    # regex's own group names), so the list MUST be ordered by index,
    # not by field-registration order (they differ for named composite
    # references like %{COMMONAPACHELOG:line}).
    by_struct = any(i > 9 for _, i, _ in parser.sql_groups)
    by_index = sorted(zip(parser.fields, parser.sql_groups),
                      key=lambda fg: fg[1][1])
    gnames = [g for (_f, g, _t), _sg in by_index]
    parts = []
    for (field, gname, typ), (_f, idx, _t) in zip(parser.fields,
                                                  parser.sql_groups):
        if field in skip:
            continue
        if by_struct:
            ex = (f"regexp_extract(text, '{re_sql}', "
                  f"{gnames!r}).{gname}")
        else:
            ex = f"regexp_extract(text, '{re_sql}', {idx})"
        # NULLIF: an optional group that did not participate extracts
        # as '' — the engine maps that to NULL for numeric fields
        if typ == "int":
            ex = f"CAST(NULLIF({ex}, '') AS BIGINT)"
        elif typ == "float":
            ex = f"CAST(NULLIF({ex}, '') AS DOUBLE)"
        cond = f"regexp_matches(text, '{re_sql}')"
        if when:
            cond = f"{when} AND {cond}"
        parts.append(f"CASE WHEN {cond} THEN {ex} END AS {field}")
    return ",\n  ".join(parts)


def _grok_parse_sql() -> str:
    from .grok import GrokParser
    p = GrokParser(f"^{GROK_LOG}$")
    re_sql = p.regex_str.replace("'", "''")
    return f"""{_T}
SELECT conv_id, turn_idx,
  regexp_matches(text, '{re_sql}') AS parse_ok,
  {_grok_sql_fields(p, re_sql)}
FROM transcripts"""


SQL_GROK_PARSE = _grok_parse_sql()

GROK_BROKEN = 'lvl=%{WORD:level} broken evt %{INT:evt_id:int}'


def q_grok_multi(sf_dir: str):
    """First-match-wins grok over an ordered pattern list (the ES
    ingest ``patterns: [...]`` contract, :class:`raybeats.grok.
    MultiGrok`): the healthy log grammar first, the degraded
    ``lvl=… broken`` grammar second. A row matched by pattern 1 never
    takes pattern 2's fields even where both match; output columns are
    the union. JSON turns match neither → all-null + matched=false."""
    from .grok import MultiGrok
    g = MultiGrok([f"^(?:{GROK_LOG})$", f"^(?:{GROK_BROKEN})$"])

    def parse(tbl: pa.Table) -> pa.Table:
        vals, matched = g.parse_column(tbl.column("text"))
        return pa.table({
            "conv_id": tbl.column("conv_id"),
            "turn_idx": tbl.column("turn_idx"),
            "matched": matched, **vals})

    return read_transcripts(sf_dir).map_batches(
        parse, batch_format="pyarrow", zero_copy_batch=True)


def _grok_multi_sql() -> str:
    from .grok import GrokParser
    p1 = GrokParser(f"^(?:{GROK_LOG})$")
    p2 = GrokParser(f"^(?:{GROK_BROKEN})$")
    r1 = p1.regex_str.replace("'", "''")
    r2 = p2.regex_str.replace("'", "''")
    m1 = f"regexp_matches(text, '{r1}')"
    m2 = f"regexp_matches(text, '{r2}')"
    # level and evt_id exist in BOTH grammars — one union column each,
    # pattern-1 rows always take pattern 1's group (first-match-wins)
    g1 = {f: (i, t) for f, i, t in p1.sql_groups}
    g2 = {f: (i, t) for f, i, t in p2.sql_groups}
    lvl = (f"CASE WHEN {m1} THEN regexp_extract(text, '{r1}', "
           f"{g1['level'][0]}) WHEN {m2} THEN regexp_extract(text, "
           f"'{r2}', {g2['level'][0]}) END AS level")
    evt = (f"CASE WHEN {m1} THEN CAST(regexp_extract(text, '{r1}', "
           f"{g1['evt_id'][0]}) AS BIGINT) WHEN {m2} THEN "
           f"CAST(regexp_extract(text, '{r2}', {g2['evt_id'][0]}) "
           f"AS BIGINT) END AS evt_id")
    return f"""{_T}
SELECT conv_id, turn_idx,
  ({m1} OR {m2}) AS matched,
  {lvl},
  {evt},
  {_grok_sql_fields(p1, r1, skip=('level', 'evt_id'))}
FROM transcripts"""


SQL_GROK_MULTI = _grok_multi_sql()


def _cidr_rules():
    """Deterministic overlapping CIDR rule set: every /8, a /16 for
    every second-octet multiple of 8, a /24 under those for a < 128
    and third-octet multiples of 4 (≈271k rules — dense enough that
    all three depths fire even on the 15-user sf0.001 corpus). Labels
    carry the rule's own prefix value; the SQL oracle builds the same
    table from ``range()`` cross products."""
    import numpy as np

    def mk(prefixes: "np.ndarray", plen: int) -> dict:
        return {"prefix": prefixes,
                "label": np.char.add(f"net{plen}-",
                                     prefixes.astype("U10"))}

    a = np.arange(256, dtype=np.int64)
    b = np.arange(0, 256, 8, dtype=np.int64)
    c = np.arange(0, 256, 4, dtype=np.int64)
    p16 = (a[:, None] * 256 + b[None, :]).ravel()
    p24 = (a[:128, None, None] * 65536 + b[None, :, None] * 256
           + c[None, None, :]).ravel()
    return mk(a, 8), mk(p16, 16), mk(p24, 24)


def q_cidr_enrich(sf_dir: str):
    """Longest-prefix-match network enrichment (the geoip /
    ``add_network_direction``-style lookup family — ref
    ``libbeat/conditions/network.go`` matches single CIDRs per event;
    this is the table form a shipper enriches against): each event's
    IPv4 (derived deterministically from ``user_id``) is probed
    against a BROADCAST rule table grouped by prefix length, deepest
    match wins. Scale shape: the rule table ships once per worker
    (closure capture here; ``ray.put`` past ~1e6 rules), the per-batch
    probe is one ``searchsorted`` + one equality check PER PREFIX
    LENGTH (≤32 lengths ever exist, typically 3-6), never per rule —
    no shuffle anywhere."""
    import numpy as np
    r8, r16, r24 = _cidr_rules()
    p16 = r16["prefix"]  # already sorted (monotone in a)
    p24 = r24["prefix"]

    def probe(tbl: pa.Table) -> pa.Table:
        u = tbl.column("user_id").to_numpy(zero_copy_only=False)
        ip = (u * 2654435761 + 12345) % (1 << 32)
        a = ip >> 24
        k16 = ip >> 16
        k24 = ip >> 8
        i16 = np.searchsorted(p16, k16)
        hit16 = (i16 < len(p16)) & (p16[i16.clip(max=len(p16) - 1)]
                                    == k16)
        i24 = np.searchsorted(p24, k24)
        hit24 = (i24 < len(p24)) & (p24[i24.clip(max=len(p24) - 1)]
                                    == k24)
        network = r8["label"][a]
        network = np.where(hit16, r16["label"][i16.clip(
            max=len(p16) - 1)], network)
        network = np.where(hit24, r24["label"][i24.clip(
            max=len(p24) - 1)], network)
        plen = np.where(hit24, 24, np.where(hit16, 16, 8))
        return pa.table({
            "event_id": tbl.column("event_id"),
            "ip": pa.array(ip, pa.int64()),
            "network": pa.array(network.tolist(), pa.string()),
            "plen": pa.array(plen.astype(np.int64), pa.int64())})

    return _read(sf_dir, "events", ["event_id", "user_id"]).map_batches(
        probe, batch_format="pyarrow", zero_copy_batch=True)


SQL_CIDR_ENRICH = """WITH ips AS (
  SELECT event_id,
         (user_id * 2654435761 + 12345) % 4294967296 AS ip
  FROM events),
r16 AS (SELECT a, b, 'net16-' || (a * 256 + b) AS label
        FROM (SELECT unnest(range(0, 256)) AS a),
             (SELECT unnest(range(0, 256, 8)) AS b)),
r24 AS (SELECT a, b, c,
               'net24-' || (a * 65536 + b * 256 + c) AS label
        FROM (SELECT unnest(range(0, 128)) AS a),
             (SELECT unnest(range(0, 256, 8)) AS b),
             (SELECT unnest(range(0, 256, 4)) AS c)),
x AS (SELECT event_id, ip, ip // 16777216 AS a,
             (ip // 65536) % 256 AS b, (ip // 256) % 256 AS c
      FROM ips)
SELECT x.event_id, x.ip,
  COALESCE(r24.label, r16.label, 'net8-' || x.a) AS network,
  CAST(CASE WHEN r24.label IS NOT NULL THEN 24
            WHEN r16.label IS NOT NULL THEN 16 ELSE 8 END
       AS BIGINT) AS plen
FROM x
LEFT JOIN r24 ON x.a = r24.a AND x.b = r24.b AND x.c = r24.c
LEFT JOIN r16 ON x.a = r16.a AND x.b = r16.b"""


def q_isotonic_fit(sf_dir: str):
    """Exact isotonic calibration (pool-adjacent-violators) of the
    purchase rate against the whole-dollar value quantum — the
    monotone-calibration step after ``auc_score``/``calibration_bins``.
    Scale shape: per-batch (quantum, n_pos, n) partials bounded by the
    value RANGE (≈300 rows) regardless of corpus size, one driver-side
    PAV stack pass over the folded partials (integer cross-multiplied
    mean comparisons — no float enters the merge decision), blocks out.
    ``fit`` is the single division n_pos/n per block: IEEE division is
    correctly rounded, so the oracle's minimax formulation
    (fit(k) = max_{i<=k} min_{j>=k} mean(i..j), grouped into maximal
    equal-fit runs) lands on the bit-identical double."""
    import numpy as np

    def assign(tbl: pa.Table) -> pa.Table:
        v = tbl.column("value").to_numpy(zero_copy_only=False)
        pos = pc.equal(tbl.column("event_type"), "purchase") \
            .to_numpy(zero_copy_only=False)
        keep = ~np.isnan(v)
        q = np.floor(v[keep]).astype(np.int64)
        p = pos[keep].astype(np.int64)
        uniq, inv = np.unique(q, return_inverse=True)
        return pa.table({
            "q": pa.array(uniq, pa.int64()),
            "np": pa.array(np.bincount(inv, weights=p).astype(np.int64),
                           pa.int64()),
            "n": pa.array(np.bincount(inv).astype(np.int64),
                          pa.int64())})

    agg = _combine_partials(
        _read(sf_dir, "events", ["value", "event_type"]).map_batches(
            assign, batch_format="pyarrow"),
        ["q"], {"np": "np", "n": "n"})
    q = agg.column("q").to_numpy(zero_copy_only=False)
    npos = agg.column("np").to_numpy(zero_copy_only=False)
    cnt = agg.column("n").to_numpy(zero_copy_only=False)
    order = np.argsort(q, kind="stable")
    q, npos, cnt = q[order], npos[order], cnt[order]
    from .aggregates import pav_blocks
    stack = pav_blocks(npos, cnt)
    return pa.table({
        "q_lo": pa.array([int(q[b[2]]) for b in stack], pa.int64()),
        "q_hi": pa.array([int(q[b[3]]) for b in stack], pa.int64()),
        "n": pa.array([b[1] for b in stack], pa.int64()),
        "n_pos": pa.array([b[0] for b in stack], pa.int64()),
        "fit": pa.array([b[0] / b[1] for b in stack], pa.float64())})


SQL_ISOTONIC_FIT = """WITH e AS (
  SELECT CAST(floor(value) AS BIGINT) AS q,
         CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS pos
  FROM events WHERE NOT isnan(value)),
b AS (SELECT q, SUM(pos) AS np, COUNT(*) AS n FROM e GROUP BY q),
idx AS (SELECT q, np, n,
          ROW_NUMBER() OVER (ORDER BY q) AS k,
          SUM(np) OVER (ORDER BY q) AS cp,
          SUM(n) OVER (ORDER BY q) AS cn
        FROM b),
pairs AS (
  SELECT i.k AS i, j.k AS j,
         j.cp - i.cp + i.np AS sp, j.cn - i.cn + i.n AS sn
  FROM idx i JOIN idx j ON j.k >= i.k),
inner_min AS (
  SELECT p.i, m.k,
         MIN(CAST(p.sp AS DOUBLE) / CAST(p.sn AS DOUBLE)) AS v
  FROM pairs p JOIN idx m ON p.i <= m.k AND p.j >= m.k
  GROUP BY p.i, m.k),
fit AS (SELECT k, MAX(v) AS fit FROM inner_min GROUP BY k),
runs AS (
  SELECT idx.q, idx.np, idx.n, f.fit,
         SUM(CASE WHEN prev IS NULL OR prev <> f.fit THEN 1 ELSE 0 END)
           OVER (ORDER BY idx.k) AS blk
  FROM idx JOIN fit f ON f.k = idx.k
  JOIN (SELECT k, LAG(fit) OVER (ORDER BY k) AS prev
        FROM fit) lf ON lf.k = idx.k)
SELECT MIN(q) AS q_lo, MAX(q) AS q_hi,
  CAST(SUM(n) AS BIGINT) AS n, CAST(SUM(np) AS BIGINT) AS n_pos,
  CAST(SUM(np) AS DOUBLE) / CAST(SUM(n) AS DOUBLE) AS fit
FROM runs GROUP BY blk"""


def q_in_subquery_mark(sf_dir: str):
    """Null-aware ``IN``-subquery marks (:func:`raybeats.joins.
    mark_join` — the three-valued SQL ``IN``, which differs from the
    EXISTS/anti-join family exactly on its NULL branches): per event,
    ``in_err`` = event_id IN (error events' ids, where every 11th is
    NULL — so non-matching rows are NULL, never FALSE) and
    ``in_signup`` = event_id IN (a null-free signup subset — plain
    TRUE/FALSE). BOTH marks ride ONE fused bucketed-union shuffle
    (:func:`raybeats.joins.multi_mark_join` — one execution instead
    of two, measured 5.5 s vs 6.6 s in a same-process A/B at sf0.1);
    explicit schema/bucket sizing so nothing sizes itself by
    executing another's lineage."""
    from .joins import multi_mark_join
    n = _nrows(sf_dir, "events")
    nb = adaptive_buckets(n)
    left = _read(sf_dir, "events", ["event_id"])

    def err_keys(tbl: pa.Table) -> pa.Table:
        t = tbl.filter(pc.equal(tbl.column("event_type"), "error"))
        eid = t.column("event_id")
        k = pc.if_else(pc.equal(_mod_col(eid, 11), 3),
                       pa.scalar(None, pa.int64()), eid)
        return pa.table({"k": k})

    def signup_keys(tbl: pa.Table) -> pa.Table:
        t = tbl.filter(pc.and_(
            pc.equal(tbl.column("event_type"), "signup"),
            pc.equal(_mod_col(tbl.column("event_id"), 7), 0)))
        return pa.table({"k": t.column("event_id")})

    ev = _read(sf_dir, "events", ["event_id", "event_type"])
    return multi_mark_join(
        left,
        [(ev.map_batches(err_keys, batch_format="pyarrow"),
          "k", "in_err"),
         (ev.map_batches(signup_keys, batch_format="pyarrow"),
          "k", "in_signup")],
        on="event_id", n_buckets=nb,
        left_schema=pa.schema([("event_id", pa.int64())]))


def _mod_col(col, m: int):
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    import numpy as np
    v = col.to_numpy(zero_copy_only=False) % m
    return pa.array(v, pa.int64())


SQL_IN_SUBQUERY_MARK = """SELECT event_id,
  event_id IN (SELECT CASE WHEN event_id % 11 = 3 THEN NULL
                           ELSE event_id END
               FROM events WHERE event_type = 'error') AS in_err,
  event_id IN (SELECT event_id FROM events
               WHERE event_type = 'signup' AND event_id % 7 = 0)
    AS in_signup
FROM events"""


def morton_spread16(v):
    """Spread the low 16 bits of ``v`` to even positions (the standard
    mask-spread; works on python ints and numpy int64 arrays). Shared
    by ``q_zorder_stats`` and its bit-by-bit interleave test."""
    v = (v | (v << 8)) & 0x00FF00FF
    v = (v | (v << 4)) & 0x0F0F0F0F
    v = (v | (v << 2)) & 0x33333333
    v = (v | (v << 1)) & 0x55555555
    return v


def q_zorder_stats(sf_dir: str):
    """Z-order (Morton) layout keys + per-curve-bucket locality stats —
    the multi-column clustering step before a sorted write (the
    space-filling-curve complement of ``hive_partition_prune``: one
    sort key gives BOTH dimensions bounded min/max ranges per output
    block, so a reader can prune on either predicate from footer
    stats). Interleaves 16 bits of day index × whole-dollar value via
    the standard mask-spread (5 shifts, exact int64), then fixed-width
    per-batch partials (count/min/max per bucket — bounded by the
    65,536 bucket space, not the corpus) folded driver-side. The dims
    are range-checked: an out-of-range input raises rather than
    silently aliasing the curve."""
    import numpy as np

    spread = morton_spread16
    epoch = np.datetime64("2024-01-01")

    def partial(tbl: pa.Table) -> pa.Table:
        v = tbl.column("value").to_numpy(zero_copy_only=False)
        keep = ~np.isnan(v)
        ts = tbl.column("ts").to_numpy(zero_copy_only=False)[keep]
        day = ((ts - epoch) // np.timedelta64(1, "D")).astype(np.int64)
        usd = np.floor(v[keep]).astype(np.int64)
        if len(day) and ((day < 0).any() or (day > 0xFFFF).any()
                         or (usd < 0).any() or (usd > 0xFFFF).any()):
            raise ValueError("zorder dims out of the 16-bit curve range")
        z = spread(day) | (spread(usd) << 1)
        zb = z >> 16
        uniq, inv = np.unique(zb, return_inverse=True)
        out = {"zbucket": uniq, "n": np.bincount(inv).astype(np.int64)}
        for name, dim in (("day", day), ("usd", usd)):
            lo = np.full(len(uniq), np.iinfo(np.int64).max)
            hi = np.full(len(uniq), np.iinfo(np.int64).min)
            np.minimum.at(lo, inv, dim)
            np.maximum.at(hi, inv, dim)
            out[f"{name}_lo"], out[f"{name}_hi"] = lo, hi
        return pa.table({k: pa.array(a, pa.int64())
                         for k, a in out.items()})

    parts = pa.concat_tables(list(
        _read(sf_dir, "events", ["ts", "value"]).map_batches(
            partial, batch_format="pyarrow")
        .iter_batches(batch_size=None, batch_format="pyarrow")))
    agg = parts.group_by("zbucket").aggregate(
        [("n", "sum"), ("day_lo", "min"), ("day_hi", "max"),
         ("usd_lo", "min"), ("usd_hi", "max")])
    return pa.table({
        "zbucket": agg.column("zbucket"),
        "n": pc.cast(agg.column("n_sum"), pa.int64()),
        "day_lo": agg.column("day_lo_min"),
        "day_hi": agg.column("day_hi_max"),
        "usd_lo": agg.column("usd_lo_min"),
        "usd_hi": agg.column("usd_hi_max")})


SQL_ZORDER_STATS = """WITH e AS (
  SELECT CAST(date_diff('day', DATE '2024-01-01', ts) AS BIGINT) AS day,
         CAST(floor(value) AS BIGINT) AS usd
  FROM events WHERE NOT isnan(value)),
s1 AS (SELECT day, usd,
         (day | (day << 8)) & 16711935 AS d1,
         (usd | (usd << 8)) & 16711935 AS u1 FROM e),
s2 AS (SELECT *, (d1 | (d1 << 4)) & 252645135 AS d2,
         (u1 | (u1 << 4)) & 252645135 AS u2 FROM s1),
s3 AS (SELECT *, (d2 | (d2 << 2)) & 858993459 AS d3,
         (u2 | (u2 << 2)) & 858993459 AS u3 FROM s2),
s4 AS (SELECT *, (d3 | (d3 << 1)) & 1431655765 AS d4,
         (u3 | (u3 << 1)) & 1431655765 AS u4 FROM s3)
SELECT (d4 | (u4 << 1)) >> 16 AS zbucket,
  CAST(COUNT(*) AS BIGINT) AS n,
  MIN(day) AS day_lo, MAX(day) AS day_hi,
  MIN(usd) AS usd_lo, MAX(usd) AS usd_hi
FROM s4 GROUP BY zbucket"""


_POISSON1_CDF = None


def _poisson1_thresholds():
    """Cumulative Poisson(1) CDF, exact doubles shared by the numpy
    searchsorted kernel and the SQL CASE ladder (one source, so the
    branch constants cannot diverge)."""
    global _POISSON1_CDF
    if _POISSON1_CDF is None:
        import math
        import numpy as np
        fact, cum, out = 1, 0.0, []
        for k in range(8):
            if k:
                fact *= k
            cum += math.exp(-1.0) / fact
            out.append(cum)
        _POISSON1_CDF = np.array(out, np.float64)
    return _POISSON1_CDF


def q_bootstrap_mean(sf_dir: str):
    """Deterministic Poisson bootstrap of mean revenue (the
    resampling-CI primitive, made partition-invariant): 32 replicas,
    weight per (event, replica) = Poisson(1) drawn by inverting the
    CDF at u = mix(event_id·32 + b)/2³² — the ``hash_split`` integer
    mix, no RNG state anywhere, so any re-run or re-partition produces
    the same replicas. Only (replica, Σw·cents, Σw) partials leave a
    batch (32 fixed rows per batch at any corpus size). The uint64
    wraparound equals the oracle's HUGEINT product exactly because
    2³² divides 2⁶⁴; u and the final mean are single correctly-rounded
    divisions, bit-equal across engines."""
    import numpy as np
    thr = _poisson1_thresholds()
    B = 32

    def part(tbl: pa.Table) -> pa.Table:
        tbl = tbl.filter(pc.invert(pc.is_nan(tbl.column("value"))))
        cents = pc.cast(
            pc.round(pc.multiply(tbl.column("value"), 100.0),
                     round_mode="half_towards_infinity"),
            pa.int64()).to_numpy(zero_copy_only=False)
        eid = tbl.column("event_id").to_numpy(zero_copy_only=False)
        key = (eid.astype(np.uint64)[:, None] * np.uint64(B)
               + np.arange(B, dtype=np.uint64)[None, :])
        m = (key * np.uint64(2654435761)) % np.uint64(1 << 32)
        v = m ^ (m >> np.uint64(15))
        u = v.astype(np.float64) / float(1 << 32)
        w = np.searchsorted(thr, u, side="right").astype(np.int64)
        return pa.table({
            "b": pa.array(np.arange(B, dtype=np.int64), pa.int64()),
            "num": pa.array((w * cents[:, None]).sum(axis=0),
                            pa.int64()),
            "den": pa.array(w.sum(axis=0), pa.int64())})

    agg = _combine_partials(
        _read(sf_dir, "events", ["event_id", "value"]).map_batches(
            part, batch_format="pyarrow"),
        ["b"], {"num": "num", "den": "den"})
    import numpy as np
    b = agg.column("b").to_numpy(zero_copy_only=False)
    num = agg.column("num").to_numpy(zero_copy_only=False)
    den = agg.column("den").to_numpy(zero_copy_only=False)
    o = np.argsort(b, kind="stable")
    b, num, den = b[o], num[o], den[o]
    mean = [float(n) / float(d) if d else None
            for n, d in zip(num, den)]
    return pa.table({
        "b": pa.array(b, pa.int64()),
        "num": pa.array(num, pa.int64()),
        "den": pa.array(den, pa.int64()),
        "mean_cents": pa.array(mean, pa.float64())})


def _bootstrap_sql() -> str:
    thr = _poisson1_thresholds()
    case = " ".join(f"WHEN u < {t!r} THEN {k}"
                    for k, t in enumerate(thr))
    return f"""WITH e AS (
  SELECT event_id, CAST(round(value * 100) AS BIGINT) AS cents
  FROM events WHERE NOT isnan(value)),
x AS (SELECT event_id, cents, b
      FROM e, (SELECT unnest(range(0, 32)) AS b)),
h AS (SELECT b, cents,
        CAST(CAST(event_id * 32 + b AS HUGEINT) * 2654435761
             % 4294967296 AS BIGINT) AS m FROM x),
uu AS (SELECT b, cents,
         CAST(xor(m, m >> 15) AS DOUBLE) / 4294967296 AS u FROM h),
w AS (SELECT b, cents, CASE {case} ELSE 8 END AS w FROM uu)
SELECT b, CAST(SUM(w * cents) AS BIGINT) AS num,
  CAST(SUM(w) AS BIGINT) AS den,
  CAST(SUM(w * cents) AS DOUBLE) / CAST(SUM(w) AS DOUBLE) AS mean_cents
FROM w GROUP BY b"""


SQL_BOOTSTRAP_MEAN = _bootstrap_sql()


def q_embed_quantize(sf_dir: str):
    """Int8-style embedding quantization audit (the vector-compression
    step before shipping an ANN index): per dimension, corpus min/max
    (pass 1, fixed dims×blocks partials), then a broadcast
    (lo, scale) table and a second narrow pass reporting the max
    absolute reconstruction error and the clip count of
    q = floor((x−lo)/scale) at 255. All arithmetic is the same IEEE
    double chain in both engines (float32 inputs widen exactly; MIN/
    MAX/abs are order-independent), so even this float-heavy audit is
    hash-exact. Constant dimensions (scale 0) quantize to 0 with zero
    error rather than dividing by zero."""
    import numpy as np

    def flat(tbl: pa.Table):
        emb = tbl.column("embedding")
        if isinstance(emb, pa.ChunkedArray):
            emb = emb.combine_chunks()
        vals = np.asarray(emb.flatten(), np.float64)
        return vals.reshape(len(emb), -1)

    def minmax_part(tbl: pa.Table) -> pa.Table:
        m = flat(tbl)
        d = m.shape[1]
        return pa.table({
            "dim": pa.array(np.arange(1, d + 1), pa.int64()),
            "lo": pa.array(m.min(axis=0), pa.float64()),
            "hi": pa.array(m.max(axis=0), pa.float64())})

    parts = pa.concat_tables(list(
        _read(sf_dir, "embeddings", ["embedding"]).map_batches(
            minmax_part, batch_format="pyarrow")
        .iter_batches(batch_size=None, batch_format="pyarrow")))
    g = parts.group_by("dim").aggregate([("lo", "min"), ("hi", "max")])
    import numpy as np
    dim = g.column("dim").to_numpy(zero_copy_only=False)
    order = np.argsort(dim, kind="stable")
    lo = g.column("lo_min").to_numpy(zero_copy_only=False)[order]
    hi = g.column("hi_max").to_numpy(zero_copy_only=False)[order]
    scale = (hi - lo) / 255.0

    def err_part(tbl: pa.Table) -> pa.Table:
        m = flat(tbl)
        with np.errstate(divide="ignore", invalid="ignore"):
            q = np.floor((m - lo[None, :]) / scale[None, :])
        q = np.where(scale[None, :] == 0.0, 0.0, np.minimum(q, 255.0))
        recon = lo[None, :] + (q + 0.5) * scale[None, :]
        err = np.abs(m - recon)
        err = np.where(scale[None, :] == 0.0, 0.0, err)
        return pa.table({
            "dim": pa.array(np.arange(1, m.shape[1] + 1), pa.int64()),
            "max_err": pa.array(err.max(axis=0), pa.float64()),
            "n_clip": pa.array((q == 255.0).sum(axis=0).astype(np.int64),
                               pa.int64())})

    eparts = pa.concat_tables(list(
        _read(sf_dir, "embeddings", ["embedding"]).map_batches(
            err_part, batch_format="pyarrow")
        .iter_batches(batch_size=None, batch_format="pyarrow")))
    eg = eparts.group_by("dim").aggregate(
        [("max_err", "max"), ("n_clip", "sum")])
    edim = eg.column("dim").to_numpy(zero_copy_only=False)
    eo = np.argsort(edim, kind="stable")
    return pa.table({
        "dim": pa.array(edim[eo], pa.int64()),
        "lo": pa.array(lo, pa.float64()),
        "hi": pa.array(hi, pa.float64()),
        "max_err": pa.array(
            eg.column("max_err_max").to_numpy(zero_copy_only=False)[eo],
            pa.float64()),
        "n_clip": pa.array(pc.cast(eg.column("n_clip_sum"),
                                   pa.int64()).to_numpy()[eo],
                           pa.int64())})


SQL_EMBED_QUANTIZE = """WITH x AS (
  SELECT CAST(unnest(embedding) AS DOUBLE) AS x,
         CAST(generate_subscripts(embedding, 1) AS BIGINT) AS dim
  FROM embeddings),
s AS (SELECT dim, MIN(x) AS lo, MAX(x) AS hi FROM x GROUP BY dim),
p AS (SELECT x.dim, x.x, s.lo, s.hi, (s.hi - s.lo) / 255 AS scale
      FROM x JOIN s USING (dim)),
qq AS (SELECT dim, lo, hi, scale, x,
         CASE WHEN scale = 0 THEN 0
              ELSE LEAST(floor((x - lo) / scale), 255) END AS q
       FROM p)
SELECT dim, MIN(lo) AS lo, MIN(hi) AS hi,
  MAX(CASE WHEN scale = 0 THEN 0
           ELSE abs(x - (lo + (q + 0.5) * scale)) END) AS max_err,
  CAST(SUM(CASE WHEN q = 255 THEN 1 ELSE 0 END) AS BIGINT) AS n_clip
FROM qq GROUP BY dim"""


def q_km_survival(sf_dir: str):
    """Kaplan-Meier survival ingredients for user churn (last activity
    day = the churn event; exact integers only — the Π(1 − dᵢ/nᵢ)
    product is one trivial fold away for the consumer, kept out so the
    cross-engine hash never touches an ordered float product): per
    day, the number of users whose LAST event fell on it and the
    at-risk count (users still active on or after it). Last-day-per-
    user is the :func:`aggregates.keep_latest` compaction (per-batch
    local compact → one bounded keyed shuffle); the day table then
    folds driver-side (days are calendar-bounded, never
    corpus-bounded)."""
    import numpy as np
    from .aggregates import keep_latest
    nb = adaptive_buckets(_nrows(sf_dir, "events"))

    def to_day(tbl: pa.Table) -> pa.Table:
        day = pc.days_between(
            pa.scalar(__import__("datetime").date(2024, 1, 1)),
            pc.cast(tbl.column("ts"), pa.date32()))
        return pa.table({"user_id": tbl.column("user_id"),
                         "day": pc.cast(day, pa.int64())})

    last = keep_latest(
        _read(sf_dir, "events", ["user_id", "ts"]).map_batches(
            to_day, batch_format="pyarrow"),
        key="user_id", order_by=("day",), n_buckets=nb)
    parts = pa.concat_tables(list(
        last.map_batches(
            lambda t: pa.table(
                {"day": t.column("day"),
                 "one": pa.array(np.ones(t.num_rows, np.int64))}),
            batch_format="pyarrow")
        .iter_batches(batch_size=None, batch_format="pyarrow")))
    g = parts.group_by("day").aggregate([("one", "sum")])
    day = g.column("day").to_numpy(zero_copy_only=False)
    churn = pc.cast(g.column("one_sum"), pa.int64()) \
        .to_numpy(zero_copy_only=False)
    o = np.argsort(day, kind="stable")
    day, churn = day[o], churn[o]
    at_risk = churn[::-1].cumsum()[::-1]
    return pa.table({"day": pa.array(day, pa.int64()),
                     "n_churn": pa.array(churn, pa.int64()),
                     "at_risk": pa.array(at_risk, pa.int64())})


SQL_KM_SURVIVAL = """WITH u AS (
  SELECT user_id,
    MAX(CAST(date_diff('day', DATE '2024-01-01', ts) AS BIGINT))
      AS last_day
  FROM events GROUP BY user_id),
d AS (SELECT last_day AS day, CAST(COUNT(*) AS BIGINT) AS n_churn
      FROM u GROUP BY last_day)
SELECT day, n_churn,
  CAST(SUM(n_churn) OVER (ORDER BY day DESC
       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
    AS at_risk
FROM d"""


def q_did_estimate(sf_dir: str):
    """Difference-in-differences estimator (the 2×2 causal baseline):
    treatment = odd user_id, post = second half of the corpus window
    (day ≥ 15), outcome = purchase spend cents. Emits the four cell
    sums/counts as exact integers plus each cell mean and the DiD
    — (post,treat − pre,treat) − (post,ctrl − pre,ctrl) — as single
    correctly-rounded double expressions, so the hash stays exact.
    One fixed 4-row partial per batch, no shuffle."""
    import numpy as np
    epoch = np.datetime64("2024-01-01")

    def part(tbl: pa.Table) -> pa.Table:
        t = tbl.filter(pc.equal(tbl.column("event_type"), "purchase"))
        cents = pc.cast(
            pc.round(pc.multiply(t.column("value"), 100.0),
                     round_mode="half_towards_infinity"),
            pa.int64()).to_numpy(zero_copy_only=False)
        ts = t.column("ts").to_numpy(zero_copy_only=False)
        day = ((ts - epoch) // np.timedelta64(1, "D")).astype(np.int64)
        uid = t.column("user_id").to_numpy(zero_copy_only=False)
        cell = (uid % 2) * 2 + (day >= 15)
        sums = np.zeros(4, np.int64)
        cnts = np.zeros(4, np.int64)
        np.add.at(sums, cell, cents)
        np.add.at(cnts, cell, 1)
        return pa.table({
            "treat": pa.array([0, 0, 1, 1], pa.int64()),
            "post": pa.array([0, 1, 0, 1], pa.int64()),
            "cents": pa.array(sums, pa.int64()),
            "n": pa.array(cnts, pa.int64())})

    agg = _combine_partials(
        _read(sf_dir, "events",
              ["user_id", "ts", "event_type", "value"]).map_batches(
            part, batch_format="pyarrow"),
        ["treat", "post"], {"cents": "cents", "n": "n"})
    import numpy as np
    rows = {(t, p): (c, n) for t, p, c, n in zip(
        agg.column("treat").to_pylist(), agg.column("post").to_pylist(),
        agg.column("cents").to_pylist(), agg.column("n").to_pylist())}
    # empty cells are OMITTED, matching the oracle's GROUP BY (a cell
    # with no purchases produces no row there); a missing cell also
    # nulls the DiD, exactly as the oracle's MAX over an absent row
    rows = {k: v for k, v in rows.items() if v[1] > 0}
    mean = {k: v[0] / v[1] for k, v in rows.items()}
    cells = [(1, 1), (1, 0), (0, 1), (0, 0)]
    did = None if any(k not in mean for k in cells) else \
        ((mean[(1, 1)] - mean[(1, 0)])
         - (mean[(0, 1)] - mean[(0, 0)]))
    out = {"treat": [], "post": [], "cents": [], "n": [],
           "mean_cents": []}
    for k in sorted(rows):
        out["treat"].append(k[0])
        out["post"].append(k[1])
        out["cents"].append(rows[k][0])
        out["n"].append(rows[k][1])
        out["mean_cents"].append(mean[k])
    return pa.table({
        "treat": pa.array(out["treat"], pa.int64()),
        "post": pa.array(out["post"], pa.int64()),
        "cents": pa.array(out["cents"], pa.int64()),
        "n": pa.array(out["n"], pa.int64()),
        "mean_cents": pa.array(out["mean_cents"], pa.float64()),
        "did": pa.array([did] * len(out["treat"]), pa.float64())})


SQL_DID_ESTIMATE = """WITH p AS (
  SELECT CAST(user_id % 2 AS BIGINT) AS treat,
    CAST(CASE WHEN date_diff('day', DATE '2024-01-01', ts) >= 15
         THEN 1 ELSE 0 END AS BIGINT) AS post,
    CAST(round(value * 100) AS BIGINT) AS cents
  FROM events WHERE event_type = 'purchase'),
c AS (SELECT treat, post, CAST(SUM(cents) AS BIGINT) AS cents,
        CAST(COUNT(*) AS BIGINT) AS n,
        CAST(SUM(cents) AS DOUBLE) / COUNT(*) AS mean_cents
      FROM p GROUP BY treat, post),
d AS (SELECT
  (MAX(CASE WHEN treat = 1 AND post = 1 THEN mean_cents END)
   - MAX(CASE WHEN treat = 1 AND post = 0 THEN mean_cents END))
  - (MAX(CASE WHEN treat = 0 AND post = 1 THEN mean_cents END)
     - MAX(CASE WHEN treat = 0 AND post = 0 THEN mean_cents END))
    AS did FROM c)
SELECT c.*, d.did FROM c, d"""


def q_evolve_roundtrip(sf_dir: str):
    """Schema-evolution read (the storage capability a long-lived
    table needs: old files lack columns added later): writes the
    corpus as two parquet generations to scratch — v1 with
    (event_id, event_type), v2 with an added ``value_cents`` column —
    then reads the MIXED directory back through one ``read_parquet``
    with a declared target schema, the v1 rows surfacing NULL for the
    late column — on a resumable partitioned layout (each generation
    its own subdirectory, as a real ingest would leave behind)."""
    import ray.data as rd

    out_dir = _scratch_dir("raybeats_evolve", sf_dir)

    ev = _read(sf_dir, "events", ["event_id", "event_type", "ts",
                                  "value"])

    def v1(tbl: pa.Table) -> pa.Table:
        t = tbl.filter(pc.less(_mod_col(tbl.column("event_id"), 2), 1))
        return pa.table({"event_id": t.column("event_id"),
                         "event_type": t.column("event_type")})

    def v2(tbl: pa.Table) -> pa.Table:
        t = tbl.filter(pc.equal(_mod_col(tbl.column("event_id"), 2), 1))
        cents = pc.cast(
            pc.round(pc.multiply(t.column("value"), 100.0),
                     round_mode="half_towards_infinity"), pa.int64())
        return pa.table({"event_id": t.column("event_id"),
                         "event_type": t.column("event_type"),
                         "value_cents": cents})

    ev.map_batches(v1, batch_format="pyarrow") \
        .write_parquet(f"{out_dir}/gen=1")
    ev.map_batches(v2, batch_format="pyarrow") \
        .write_parquet(f"{out_dir}/gen=2")
    # Ray reads each fragment with ITS OWN schema (no automatic
    # unification across generations) — the declared target schema is
    # what makes the old fragments surface the late column as nulls
    unified = pa.schema([("event_id", pa.int64()),
                         ("event_type", pa.string()),
                         ("value_cents", pa.int64())])
    return rd.read_parquet(out_dir, schema=unified).map_batches(
        lambda t: t.select(["event_id", "event_type", "value_cents"]),
        batch_format="pyarrow")


SQL_EVOLVE_ROUNDTRIP = """SELECT event_id, event_type,
  CASE WHEN event_id % 2 = 1
       THEN CAST(round(value * 100) AS BIGINT) END AS value_cents
FROM events"""


def q_encoding_profile(sf_dir: str):
    """Column-encoding advisor (the storage-planner report that decides
    dictionary vs plain encoding before a large write): per string
    column of ``events``, row count, distinct count, total value bytes
    (plain-encoding payload) and distinct value bytes (dictionary
    payload) — all exact integers. Per-batch partials carry each
    batch's DISTINCT values once (bounded by the column's real
    cardinality, the quantity being measured; a column whose distincts
    did not fit would be the advisor's answer, not its input), folded
    driver-side with one arrow group_by."""
    import numpy as np

    cols = ["event_type", "props"]

    def part(tbl: pa.Table) -> pa.Table:
        names, ns, bs, vals = [], [], [], []
        for c in cols:
            col = tbl.column(c)
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            nn = col.drop_null()
            u = nn.unique()
            names.append(c)
            ns.append(len(nn))
            bs.append(int(pc.sum(pc.binary_length(nn)).as_py() or 0))
            vals.append(u)
        out = []
        for c, n, b, u in zip(names, ns, bs, vals):
            out.append(pa.table({
                "col": pa.array([c] * len(u), pa.string()),
                "val": pc.cast(u, pa.string()),
                "n": pa.array([0] * len(u), pa.int64()),
                "bytes": pa.array([0] * len(u), pa.int64())}))
            # one summary row per column carries the batch totals
            out.append(pa.table({
                "col": pa.array([c], pa.string()),
                "val": pa.array([None], pa.string()),
                "n": pa.array([n], pa.int64()),
                "bytes": pa.array([b], pa.int64())}))
        return pa.concat_tables(out)

    merged = pa.concat_tables(list(
        _read(sf_dir, "events", cols).map_batches(
            part, batch_format="pyarrow")
        .iter_batches(batch_size=None, batch_format="pyarrow")))
    rows = []
    for c in cols:
        sub = merged.filter(pc.equal(merged.column("col"), c))
        summ = sub.filter(pc.is_null(sub.column("val")))
        uniq = sub.filter(pc.is_valid(sub.column("val"))) \
            .column("val").unique()
        n = int(pc.sum(summ.column("n")).as_py() or 0)
        plain = int(pc.sum(summ.column("bytes")).as_py() or 0)
        dict_bytes = int(pc.sum(pc.binary_length(uniq)).as_py() or 0)
        rows.append((c, n, len(uniq), plain, dict_bytes))
    return pa.table({
        "col": pa.array([r[0] for r in rows], pa.string()),
        "n": pa.array([r[1] for r in rows], pa.int64()),
        "n_distinct": pa.array([r[2] for r in rows], pa.int64()),
        "plain_bytes": pa.array([r[3] for r in rows], pa.int64()),
        "dict_bytes": pa.array([r[4] for r in rows], pa.int64())})


SQL_ENCODING_PROFILE = """SELECT col, n, n_distinct, plain_bytes,
  dict_bytes
FROM (
  SELECT 'event_type' AS col,
    CAST(COUNT(event_type) AS BIGINT) AS n,
    CAST(COUNT(DISTINCT event_type) AS BIGINT) AS n_distinct,
    CAST(SUM(strlen(event_type)) AS BIGINT) AS plain_bytes,
    CAST((SELECT SUM(strlen(v)) FROM
          (SELECT DISTINCT event_type AS v FROM events
           WHERE event_type IS NOT NULL)) AS BIGINT) AS dict_bytes
  FROM events
  UNION ALL
  SELECT 'props',
    CAST(COUNT(props) AS BIGINT),
    CAST(COUNT(DISTINCT props) AS BIGINT),
    CAST(SUM(strlen(props)) AS BIGINT),
    CAST((SELECT SUM(strlen(v)) FROM
          (SELECT DISTINCT props AS v FROM events
           WHERE props IS NOT NULL)) AS BIGINT)
  FROM events)"""


_LTTB_OUT = 24


def lttb_select(x, y, n_out: int):
    """Largest-Triangle-Three-Buckets downsampling over an integer
    series, EXACT: triangle areas are evaluated as the avg-denominator-
    scaled integer cross product |（xp·n − Σx)(yc − yp) − (xp − xc)(Σy −
    yp·n)| — python ints, no float ever — and ties break to the lowest
    index (the oracle's ORDER BY area DESC, i LIMIT 1). Returns
    selected indices; the whole series when it already fits."""
    n = len(x)
    if n <= n_out:
        return list(range(n))
    b = n_out - 2
    # interior point i (1..n-2) belongs to bucket (i-1)*b // (n-2)
    bounds = [1 + (k * (n - 2) + b - 1) // b for k in range(b + 1)]
    bounds[0], bounds[b] = 1, n - 1
    sel = [0]
    prev = 0
    for k in range(b):
        lo, hi = bounds[k], bounds[k + 1]
        if k + 1 < b:
            nlo, nhi = bounds[k + 1], bounds[k + 2]
        else:
            nlo, nhi = n - 1, n
        sx = sum(int(v) for v in x[nlo:nhi])
        sy = sum(int(v) for v in y[nlo:nhi])
        cnt = nhi - nlo
        xp, yp = int(x[prev]), int(y[prev])
        best, best_a = lo, -1
        for i in range(lo, hi):
            a = abs((xp * cnt - sx) * (int(y[i]) - yp)
                    - (xp - int(x[i])) * (sy - yp * cnt))
            if a > best_a:
                best, best_a = i, a
        sel.append(best)
        prev = best
    sel.append(n - 1)
    return sel


def q_lttb_downsample(sf_dir: str):
    """Largest-Triangle-Three-Buckets downsampling of the hourly
    revenue series to 24 visually-representative points (the
    time-series sketching step before a dashboard render — Steinarsson
    2013, public algorithm). The SERIES is built distributively
    (bounded (hour, Σcents) partials — calendar-bounded, never
    corpus-bounded); the sequential selection then runs driver-side
    over ≤ calendar-hours points with EXACT integer triangle areas, so
    the oracle — the same selection unrolled into one generated CTE
    chain per step — lands on identical points. The engine passes a
    series already at or under the target through unchanged; the
    UNROLLED mirror always runs its fixed steps, so the oracle is
    meaningful only for series longer than the target (driver corpora
    span 720 hours ≫ 24; a shorter corpus would want the engine's
    passthrough, which is the general answer)."""
    import numpy as np

    def part(tbl: pa.Table) -> pa.Table:
        t = tbl.filter(pc.invert(pc.is_nan(tbl.column("value"))))
        hour = pc.cast(pc.hours_between(
            pa.scalar(__import__("datetime").datetime(2024, 1, 1)),
            t.column("ts")), pa.int64())
        cents = pc.cast(
            pc.round(pc.multiply(t.column("value"), 100.0),
                     round_mode="half_towards_infinity"), pa.int64())
        g = pa.table({"x": hour, "y": cents}).group_by("x") \
            .aggregate([("y", "sum")])
        return pa.table({"x": g.column("x"),
                         "y": pc.cast(g.column("y_sum"), pa.int64())})

    agg = _combine_partials(
        _read(sf_dir, "events", ["ts", "value"]).map_batches(
            part, batch_format="pyarrow"),
        ["x"], {"y": "y"})
    import numpy as np
    x = agg.column("x").to_numpy(zero_copy_only=False)
    y = agg.column("y").to_numpy(zero_copy_only=False)
    o = np.argsort(x, kind="stable")
    x, y = x[o], y[o]
    sel = lttb_select(x, y, _LTTB_OUT)
    return pa.table({
        "pos": pa.array(range(len(sel)), pa.int64()),
        "x": pa.array(x[sel], pa.int64()),
        "y": pa.array(y[sel], pa.int64())})


def _lttb_sql() -> str:
    b = _LTTB_OUT - 2
    ctes = ["""series AS (
  SELECT CAST(date_diff('hour', TIMESTAMP '2024-01-01', ts) AS BIGINT)
           AS x,
         CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS y
  FROM events WHERE NOT isnan(value) GROUP BY 1)""", f"""pts AS (
  SELECT row_number() OVER (ORDER BY x) - 1 AS i, x, y FROM series)""",
            "nn AS (SELECT COUNT(*) AS n FROM pts)", f"""bkt AS (
  SELECT p.i, p.x, p.y, ((p.i - 1) * {b}) // (nn.n - 2) AS b
  FROM pts p, nn WHERE p.i >= 1 AND p.i <= nn.n - 2)""", f"""bavg AS (
  SELECT b, SUM(x) AS sx, SUM(y) AS sy, COUNT(*) AS cnt
  FROM bkt GROUP BY b)""", """lastp AS (
  SELECT p.x, p.y FROM pts p, nn WHERE p.i = nn.n - 1)""",
            "s0 AS (SELECT CAST(0 AS BIGINT) AS pos, x, y FROM pts WHERE i = 0)"]
    for k in range(b):
        nxt = (f"SELECT sx, sy, cnt FROM bavg WHERE b = {k + 1}"
               if k + 1 < b else
               "SELECT x AS sx, y AS sy, 1 AS cnt FROM lastp")
        ctes.append(f"""s{k + 1} AS (
  SELECT CAST({k + 1} AS BIGINT) AS pos, c.x, c.y
  FROM bkt c, s{k} p, ({nxt}) a
  WHERE c.b = {k}
  ORDER BY abs((p.x * a.cnt - a.sx) * (c.y - p.y)
               - (p.x - c.x) * (a.sy - p.y * a.cnt)) DESC, c.i
  LIMIT 1)""")
    sels = " UNION ALL ".join(
        [f"SELECT * FROM s{k}" for k in range(b + 1)]
        + [f"SELECT CAST({b + 1} AS BIGINT) AS pos, x, y FROM lastp"])
    return "WITH " + ",\n".join(ctes) + "\n" + sels


SQL_LTTB_DOWNSAMPLE = _lttb_sql()


def q_log_templates(sf_dir: str):
    """Log-template mining (the Drain-family SRE primitive, simplified
    to a deterministic one-pass rule): lines group by (token count,
    first token); within a group, a position keeps its token iff
    exactly ONE distinct token ever appears there, else it becomes the
    ``<*>`` wildcard — turning the raw stream into templates +
    volumes. Scale shape: per-batch DISTINCT (group, position, token)
    rows move (bounded by template-vocabulary size, not line count)
    plus fixed-width group counts; template assembly folds driver-side
    over groups × positions rows. Kernels shared verbatim with the
    streaming ``TemplateState`` (:mod:`raybeats.textops.analysis`)."""
    from .textops.analysis import template_finalize, template_partial

    merged = pa.concat_tables(list(
        read_transcripts(sf_dir).map_batches(
            lambda t: template_partial(t.column("text")),
            batch_format="pyarrow")
        .iter_batches(batch_size=None, batch_format="pyarrow")))
    return template_finalize(merged)


SQL_LOG_TEMPLATES = f"""{_T},
g AS (SELECT text, string_split(text, ' ') AS toks FROM transcripts),
gg AS (SELECT text, toks, CAST(len(toks) AS BIGINT) AS n,
              toks[1] AS t0 FROM g),
e AS (SELECT n, t0, unnest(toks) AS tok,
             CAST(generate_subscripts(toks, 1) AS BIGINT) AS p
      FROM gg),
d AS (SELECT n, t0, p, COUNT(DISTINCT tok) AS nd,
             MIN(tok) AS only_tok
      FROM e GROUP BY n, t0, p),
tpl AS (SELECT n, t0,
          string_agg(CASE WHEN nd = 1 THEN only_tok ELSE '<*>' END,
                     ' ' ORDER BY p) AS template
        FROM d GROUP BY n, t0),
c AS (SELECT n, t0, CAST(COUNT(*) AS BIGINT) AS n_lines
      FROM gg GROUP BY n, t0)
SELECT c.n AS n_tokens, c.t0 AS first_token, tpl.template, c.n_lines
FROM c JOIN tpl ON c.n = tpl.n AND c.t0 = tpl.t0"""


def q_grok_apache(sf_dir: str):
    """COMMONAPACHELOG under the correctness gate: access-log lines
    are derived deterministically from ``events`` (the transcripts
    trick — both engines build byte-identical text), then parsed with
    the composite library pattern — nested named fields, the
    ``(?:bytes|-)`` optional numeric group (NULL via the ''→NULL
    mapping), int conversions. One derive+parse ``map_batches`` pass;
    the oracle runs the IDENTICAL expanded regex by group index over
    the same derived lines."""
    import numpy as np

    from .grok import GrokParser
    p = GrokParser("^%{COMMONAPACHELOG}$")

    def derive(tbl: pa.Table) -> pa.Table:
        t = tbl.filter(pc.invert(pc.is_nan(tbl.column("value"))))
        eid = t.column("event_id")
        if isinstance(eid, pa.ChunkedArray):
            eid = eid.combine_chunks()
        u = t.column("user_id").to_numpy(zero_copy_only=False)
        e = eid.to_numpy(zero_copy_only=False)
        ip = (u * 2654435761 + 12345) % (1 << 32)

        def oct_str(v):
            return pc.cast(pa.array(v, pa.int64()), pa.string())

        ip_str = pc.binary_join_element_wise(
            oct_str(ip >> 24), ".", oct_str((ip >> 16) & 255), ".",
            oct_str((ip >> 8) & 255), ".", oct_str(ip & 255), "")
        user = pc.if_else(
            pc.equal(pa.array(e % 5, pa.int64()), 0),
            pa.scalar("-"),
            pc.binary_join_element_wise(
                "u", pc.cast(t.column("user_id"), pa.string()), ""))
        ts = pc.replace_substring_regex(
            pc.strftime(t.column("ts"),
                        format="%d/%b/%Y:%H:%M:%S +0000"),
            r"\.\d+", "")
        verb = pc.if_else(pc.equal(t.column("event_type"), "purchase"),
                          pa.scalar("POST"), pa.scalar("GET"))
        path = pc.binary_join_element_wise(
            "/", t.column("event_type"), "/",
            pc.cast(pa.array(e % 50, pa.int64()), pa.string()), "")
        code = pc.if_else(
            pc.equal(t.column("event_type"), "error"), pa.scalar("500"),
            pc.if_else(pc.equal(t.column("event_type"), "purchase"),
                       pa.scalar("201"), pa.scalar("200")))
        cents = pc.cast(
            pc.round(pc.multiply(t.column("value"), 100.0),
                     round_mode="half_towards_infinity"), pa.int64())
        nbytes = pc.if_else(pc.equal(pa.array(e % 7, pa.int64()), 0),
                            pa.scalar("-"),
                            pc.cast(cents, pa.string()))
        line = pc.binary_join_element_wise(
            ip_str, " - ", user, " [", ts, "] \"", verb, " ", path,
            " HTTP/1.1\" ", code, " ", nbytes, "")
        vals, ok = p.parse_column(line)
        return pa.table({"event_id": eid, "parse_ok": ok, **vals})

    return _read(sf_dir, "events",
                 ["event_id", "user_id", "ts", "event_type",
                  "value"]).map_batches(derive, batch_format="pyarrow",
                                        zero_copy_batch=True)


def _grok_apache_sql() -> str:
    from .grok import GrokParser
    p = GrokParser("^%{COMMONAPACHELOG}$")
    re_sql = p.regex_str.replace("'", "''")
    return f"""WITH lines AS (
  SELECT event_id,
    CAST((user_id * 2654435761 + 12345) % 4294967296 // 16777216
         AS VARCHAR) || '.' ||
    CAST((user_id * 2654435761 + 12345) % 4294967296 // 65536 % 256
         AS VARCHAR) || '.' ||
    CAST((user_id * 2654435761 + 12345) % 4294967296 // 256 % 256
         AS VARCHAR) || '.' ||
    CAST((user_id * 2654435761 + 12345) % 4294967296 % 256
         AS VARCHAR) || ' - ' ||
    CASE WHEN event_id % 5 = 0 THEN '-'
         ELSE 'u' || CAST(user_id AS VARCHAR) END ||
    ' [' || strftime(ts, '%d/%b/%Y:%H:%M:%S +0000') || '] "' ||
    CASE WHEN event_type = 'purchase' THEN 'POST' ELSE 'GET' END ||
    ' /' || event_type || '/' || CAST(event_id % 50 AS VARCHAR) ||
    ' HTTP/1.1" ' ||
    CASE WHEN event_type = 'error' THEN '500'
         WHEN event_type = 'purchase' THEN '201' ELSE '200' END ||
    ' ' ||
    CASE WHEN event_id % 7 = 0 THEN '-'
         ELSE CAST(CAST(round(value * 100) AS BIGINT) AS VARCHAR) END
      AS text
  FROM events WHERE NOT isnan(value))
SELECT event_id, regexp_matches(text, '{re_sql}') AS parse_ok,
  {_grok_sql_fields(p, re_sql)}
FROM lines"""


SQL_GROK_APACHE = _grok_apache_sql()


def q_template_drift(sf_dir: str):
    """Template-volume drift (the SRE anomaly screen on top of
    template mining): per (token count, first token) template group,
    line counts in the corpus window's first vs second half plus the
    per-mille share in each — a group whose share moves is a format /
    behavior change worth an alert. Exact integers only (share in
    permille of each half's total); fixed-width
    (group, half, count) partials, driver fold."""
    import numpy as np

    def part(tbl: pa.Table) -> pa.Table:
        txt = tbl.column("text")
        if isinstance(txt, pa.ChunkedArray):
            txt = txt.combine_chunks()
        toks = pc.split_pattern(txt, " ")
        offs = np.asarray(toks.offsets)
        lens = np.diff(offs).astype(np.int64)
        first = pc.cast(toks.flatten().take(offs[:-1]), pa.string())
        ts = tbl.column("ts").to_numpy(zero_copy_only=False)
        half = (ts >= np.datetime64("2024-01-16")).astype(np.int64)
        t = pa.table({"n": pa.array(lens, pa.int64()), "t0": first,
                      "half": pa.array(half, pa.int64()),
                      "one": pa.array(np.ones(len(lens), np.int64),
                                      pa.int64())})
        g = t.group_by(["n", "t0", "half"]).aggregate([("one", "sum")])
        return pa.table({"n": g.column("n"), "t0": g.column("t0"),
                         "half": g.column("half"),
                         "c": pc.cast(g.column("one_sum"),
                                      pa.int64())})

    agg = _combine_partials(
        read_transcripts(sf_dir).map_batches(
            part, batch_format="pyarrow"),
        ["n", "t0", "half"], {"c": "c"})
    import numpy as np
    n = agg.column("n").to_numpy(zero_copy_only=False)
    t0 = agg.column("t0").to_pylist()
    half = agg.column("half").to_numpy(zero_copy_only=False)
    c = agg.column("c").to_numpy(zero_copy_only=False)
    tot = np.zeros(2, np.int64)
    np.add.at(tot, half, c)
    rows: dict[tuple, list[int]] = {}
    for i in range(len(n)):
        rows.setdefault((int(n[i]), t0[i]), [0, 0])[int(half[i])] = \
            int(c[i])
    out = {"n_tokens": [], "first_token": [], "n_first": [],
           "n_second": [], "pm_first": [], "pm_second": []}
    for (gn, gt0), (c0, c1) in rows.items():
        out["n_tokens"].append(gn)
        out["first_token"].append(gt0)
        out["n_first"].append(c0)
        out["n_second"].append(c1)
        out["pm_first"].append(c0 * 1000 // int(tot[0])
                               if tot[0] else None)
        out["pm_second"].append(c1 * 1000 // int(tot[1])
                                if tot[1] else None)
    return pa.table({
        "n_tokens": pa.array(out["n_tokens"], pa.int64()),
        "first_token": pa.array(out["first_token"], pa.string()),
        "n_first": pa.array(out["n_first"], pa.int64()),
        "n_second": pa.array(out["n_second"], pa.int64()),
        "pm_first": pa.array(out["pm_first"], pa.int64()),
        "pm_second": pa.array(out["pm_second"], pa.int64())})


SQL_TEMPLATE_DRIFT = f"""{_T},
g AS (SELECT CAST(len(string_split(text, ' ')) AS BIGINT) AS n,
             string_split(text, ' ')[1] AS t0,
             CAST(CASE WHEN ts >= TIMESTAMP '2024-01-16'
                  THEN 1 ELSE 0 END AS BIGINT) AS half
      FROM transcripts),
c AS (SELECT n, t0, half, CAST(COUNT(*) AS BIGINT) AS c
      FROM g GROUP BY n, t0, half),
tot AS (SELECT half, SUM(c) AS t FROM c GROUP BY half),
p AS (SELECT n, t0,
        CAST(COALESCE(SUM(CASE WHEN half = 0 THEN c END), 0)
             AS BIGINT) AS n_first,
        CAST(COALESCE(SUM(CASE WHEN half = 1 THEN c END), 0)
             AS BIGINT) AS n_second
      FROM c GROUP BY n, t0)
SELECT p.n AS n_tokens, p.t0 AS first_token, p.n_first, p.n_second,
  CAST(p.n_first * 1000 // (SELECT t FROM tot WHERE half = 0)
       AS BIGINT) AS pm_first,
  CAST(p.n_second * 1000 // (SELECT t FROM tot WHERE half = 1)
       AS BIGINT) AS pm_second
FROM p"""


def q_grok_syslog(sf_dir: str):
    """SYSLOGLINE under the correctness gate (the companion of
    ``grok_apache``): classic syslog lines derived byte-identically in
    both engines — host, program, a POSITIVE pid (POSINT's contract),
    free-text message — parsed by the composite with its public-style
    ``program``/``pid`` field names."""
    from .grok import GrokParser
    p = GrokParser("^%{SYSLOGLINE}$")

    def derive(tbl: pa.Table) -> pa.Table:
        eid = tbl.column("event_id")
        if isinstance(eid, pa.ChunkedArray):
            eid = eid.combine_chunks()
        e = eid.to_numpy(zero_copy_only=False)
        ts = pc.replace_substring_regex(
            pc.strftime(tbl.column("ts"), format="%b %d %H:%M:%S"),
            r"\.\d+", "")
        host = pc.binary_join_element_wise(
            "web", pc.cast(pa.array(e % 4, pa.int64()), pa.string()),
            "")
        pid = pc.cast(pa.array(e % 1000 + 1, pa.int64()), pa.string())
        line = pc.binary_join_element_wise(
            ts, " ", host, " ", tbl.column("event_type").combine_chunks()
            if isinstance(tbl.column("event_type"), pa.ChunkedArray)
            else tbl.column("event_type"), "[", pid, "]: evt ",
            pc.cast(eid, pa.string()), "")
        vals, ok = p.parse_column(line)
        return pa.table({"event_id": eid, "parse_ok": ok, **vals})

    return _read(sf_dir, "events",
                 ["event_id", "ts", "event_type"]).map_batches(
        derive, batch_format="pyarrow", zero_copy_batch=True)


def _grok_syslog_sql() -> str:
    from .grok import GrokParser
    p = GrokParser("^%{SYSLOGLINE}$")
    re_sql = p.regex_str.replace("'", "''")
    return f"""WITH lines AS (
  SELECT event_id,
    strftime(ts, '%b %d %H:%M:%S') || ' web' ||
    CAST(event_id % 4 AS VARCHAR) || ' ' || event_type || '[' ||
    CAST(event_id % 1000 + 1 AS VARCHAR) || ']: evt ' ||
    CAST(event_id AS VARCHAR) AS text
  FROM events)
SELECT event_id, regexp_matches(text, '{re_sql}') AS parse_ok,
  {_grok_sql_fields(p, re_sql)}
FROM lines"""


SQL_GROK_SYSLOG = _grok_syslog_sql()


# ----------------------------------------------------------------- export

QUERIES = {
    "transcripts_derive": (q_transcripts_derive, SQL_TRANSCRIPTS),
    "parse_dissect": (q_parse_dissect, SQL_PARSE_DISSECT),
    "route_counts": (q_route_counts, SQL_ROUTE_COUNTS),
    "routed_rows": (q_routed_rows, SQL_ROUTED_ROWS),
    "enrich_lookup": (q_enrich_lookup, SQL_ENRICH_LOOKUP),
    "conversation_assembly": (q_conversation_assembly,
                              SQL_CONVERSATION_ASSEMBLY),
    "json_decode": (q_json_decode, SQL_JSON_DECODE),
    "conditions_filter": (q_conditions_filter, SQL_CONDITIONS_FILTER),
    "convert_types": (q_convert_types, SQL_CONVERT_TYPES),
    "replace_truncate": (q_replace_truncate, SQL_REPLACE_TRUNCATE),
    "extract_field": (q_extract_field, SQL_EXTRACT_FIELD),
    "timestamp_roundtrip": (q_timestamp_roundtrip, SQL_TIMESTAMP_ROUNDTRIP),
    "fingerprint_docs": (q_fingerprint_docs, SQL_FINGERPRINT_DOCS),
    "dedup_exact": (q_dedup_exact, SQL_DEDUP_EXACT),
    "corpus_prep": (q_corpus_prep, SQL_CORPUS_PREP),
    "token_stats": (q_token_stats, SQL_TOKEN_STATS),
    "token_topk": (q_token_topk, SQL_TOKEN_TOPK),
    "quality_score": (q_quality_score, SQL_QUALITY_SCORE),
    "pii_scrub": (q_pii_scrub, SQL_PII_SCRUB),
    "repetition_stats": (q_repetition_stats, SQL_REPETITION_STATS),
    "hash_split": (q_hash_split, SQL_HASH_SPLIT),
    "quota_sample": (q_quota_sample, SQL_QUOTA_SAMPLE),
    "contamination": (q_contamination, SQL_CONTAMINATION),
    "knn_cosine": (q_knn_cosine, SQL_KNN_COSINE),
    "embed_neardup_sample": (q_embed_neardup_sample,
                             SQL_EMBED_NEARDUP_SAMPLE),
    "window_agg": (q_window_agg, SQL_WINDOW_AGG),
    "sessionization": (q_sessionization, SQL_SESSIONIZATION),
    "sliding_window": (q_sliding_window, SQL_SLIDING_WINDOW),
    "value_histogram": (q_value_histogram, SQL_VALUE_HISTOGRAM),
    "topk_per_user": (q_topk_per_user, SQL_TOPK_PER_USER),
    "dedup_by_id": (q_dedup_by_id, SQL_DEDUP_BY_ID),
    "agg_lineitem": (q_agg_lineitem, SQL_AGG_LINEITEM),
    "mktsegment_counts": (q_mktsegment_counts, SQL_MKTSEGMENT_COUNTS),
    "top10_orders": (q_top10_orders, SQL_TOP10_ORDERS),
    "distinct_langs": (q_distinct_langs, SQL_DISTINCT_LANGS),
    "embed_neardup_lsh": (q_embed_neardup_lsh, SQL_EMBED_NEARDUP_LSH),
    "knn_ivf_full": (q_knn_ivf_full, SQL_KNN_COSINE),
    "lang_id": (q_lang_id, SQL_LANG_ID),
    "ratelimit": (q_ratelimit, SQL_RATELIMIT),
    "asof_join": (q_asof_join, SQL_ASOF_JOIN),
    "asof_forward": (q_asof_forward, SQL_ASOF_FORWARD),
    "kmeans_iter": (q_kmeans_iter, SQL_KMEANS_ITER),
    "token_heavy_hitters": (q_token_heavy_hitters,
                            SQL_TOKEN_HEAVY_HITTERS),
    "value_percentile": (q_value_percentile, SQL_VALUE_PERCENTILE),
    "text_normalize": (q_text_normalize, SQL_TEXT_NORMALIZE),
    "column_profile": (q_column_profile, SQL_COLUMN_PROFILE),
    "range_join": (q_range_join, SQL_RANGE_JOIN),
    "hash_join_rows": (q_hash_join_rows, SQL_HASH_JOIN_ROWS),
    "join_revenue": (q_join_revenue, SQL_JOIN_REVENUE),
    "quantiles": (q_quantiles, SQL_QUANTILES),
    "inverted_index": (q_inverted_index, SQL_INVERTED_INDEX),
    "anti_join": (q_anti_join, SQL_ANTI_JOIN),
    "distinctive_terms": (q_distinctive_terms, SQL_DISTINCTIVE_TERMS),
    "curation_pipeline": (q_curation_pipeline, SQL_CURATION_PIPELINE),
    "semi_join_bloom": (q_semi_join_bloom, SQL_SEMI_JOIN_BLOOM),
    "latest_event": (q_latest_event, SQL_LATEST_EVENT),
    "rollup_revenue": (q_rollup_revenue, SQL_ROLLUP_REVENUE),
    "cube_orders": (q_cube_orders, SQL_CUBE_ORDERS),
    "embedding_centroids": (q_embedding_centroids,
                            SQL_EMBEDDING_CENTROIDS),
    "running_sum": (q_running_sum, SQL_RUNNING_SUM),
    "event_gaps": (q_event_gaps, SQL_EVENT_GAPS),
    "pack_sequences": (q_pack_sequences, SQL_PACK_SEQUENCES),
    "ship_window_join": (q_ship_window_join, SQL_SHIP_WINDOW_JOIN),
    "frame_sample": (q_frame_sample, SQL_FRAME_SAMPLE),
    "mixture_oversample": (q_mixture_oversample, SQL_MIXTURE_OVERSAMPLE),
    "bigram_topk": (q_bigram_topk, SQL_BIGRAM_TOPK),
    "quality_filter": (q_quality_filter, SQL_QUALITY_FILTER),
    "dedup_keep_best": (q_dedup_keep_best, SQL_DEDUP_KEEP_BEST),
    "stratified_sample": (q_stratified_sample, SQL_STRATIFIED_SAMPLE),
    "snapshot_diff": (q_snapshot_diff, SQL_SNAPSHOT_DIFF),
    "funnel_conversion": (q_funnel_conversion, SQL_FUNNEL_CONVERSION),
    "winsorize": (q_winsorize, SQL_WINSORIZE),
    "anomaly_events": (q_anomaly_events, SQL_ANOMALY_EVENTS),
    "global_rank": (q_global_rank, SQL_GLOBAL_RANK),
    "daily_change": (q_daily_change, SQL_DAILY_CHANGE),
    "weekly_retention": (q_weekly_retention, SQL_WEEKLY_RETENTION),
    "revenue_by_segment": (q_revenue_by_segment, SQL_REVENUE_BY_SEGMENT),
    "users_per_type": (q_users_per_type, SQL_USERS_PER_TYPE),
    "pivot_counts": (q_pivot_counts, SQL_PIVOT_COUNTS),
    "left_join_agg": (q_left_join_agg, SQL_LEFT_JOIN_AGG),
    "chunk_docs": (q_chunk_docs, SQL_CHUNK_DOCS),
    "burst_dedup": (q_burst_dedup, SQL_BURST_DEDUP),
    "cooccurrence": (q_cooccurrence, SQL_COOCCURRENCE),
    "ntile_deciles": (q_ntile_deciles, SQL_NTILE_DECILES),
    "new_users_daily": (q_new_users_daily, SQL_NEW_USERS_DAILY),
    "longest_streak": (q_longest_streak, SQL_LONGEST_STREAK),
    "grouped_corr": (q_grouped_corr, SQL_GROUPED_CORR),
    "top_user_per_type": (q_top_user_per_type, SQL_TOP_USER_PER_TYPE),
    "full_outer_series": (q_full_outer_series, SQL_FULL_OUTER_SERIES),
    "transition_counts": (q_transition_counts, SQL_TRANSITION_COUNTS),
    "quantile_cont": (q_quantile_cont, SQL_QUANTILE_CONT),
    "cohort_matrix": (q_cohort_matrix, SQL_COHORT_MATRIX),
    "gap_fill_hours": (q_gap_fill_hours, SQL_GAP_FILL_HOURS),
    "rolling_active_users": (q_rolling_active_users,
                             SQL_ROLLING_ACTIVE_USERS),
    "sample_uniform": (q_sample_uniform, SQL_SAMPLE_UNIFORM),
    "min_value_rows": (q_min_value_rows, SQL_MIN_VALUE_ROWS),
    "mad_per_type": (q_mad_per_type, SQL_MAD_PER_TYPE),
    "conversion_lag": (q_conversion_lag, SQL_CONVERSION_LAG),
    "user_paths": (q_user_paths, SQL_USER_PATHS),
    "second_event": (q_second_event, SQL_SECOND_EVENT),
    "view_no_buy_days": (q_view_no_buy_days, SQL_VIEW_NO_BUY_DAYS),
    "scd2_intervals": (q_scd2_intervals, SQL_SCD2_INTERVALS),
    "dense_topk": (q_dense_topk, SQL_DENSE_TOPK),
    "first_occurrence": (q_first_occurrence, SQL_FIRST_OCCURRENCE),
    "dwell_time": (q_dwell_time, SQL_DWELL_TIME),
    "median_gap_per_user": (q_median_gap_per_user,
                            SQL_MEDIAN_GAP_PER_USER),
    "cluster_radius": (q_cluster_radius, SQL_CLUSTER_RADIUS),
    "vocab_per_source": (q_vocab_per_source, SQL_VOCAB_PER_SOURCE),
    "quartile_bucket": (q_quartile_bucket, SQL_QUARTILE_BUCKET),
    "supplier_by_region": (q_supplier_by_region,
                           SQL_SUPPLIER_BY_REGION),
    "brand_revenue": (q_brand_revenue, SQL_BRAND_REVENUE),
    "user_top_types": (q_user_top_types, SQL_USER_TOP_TYPES),
    "cumulative_users": (q_cumulative_users, SQL_CUMULATIVE_USERS),
    "degree_dist": (q_degree_dist, SQL_DEGREE_DIST),
    "user_summary": (q_user_summary, SQL_USER_SUMMARY),
    "mode_per_type": (q_mode_per_type, SQL_MODE_PER_TYPE),
    "centroid_dists": (q_centroid_dists, SQL_CENTROID_DISTS),
    "moving_avg3": (q_moving_avg3, SQL_MOVING_AVG3),
    "dup_rate_per_source": (q_dup_rate_per_source,
                            SQL_DUP_RATE_PER_SOURCE),
    "max_concurrency": (q_max_concurrency, SQL_MAX_CONCURRENCY),
    "daily_type_share": (q_daily_type_share, SQL_DAILY_TYPE_SHARE),
    "grouping_sets_mix": (q_grouping_sets_mix, SQL_GROUPING_SETS_MIX),
    "orders_no_lines": (q_orders_no_lines, SQL_ORDERS_NO_LINES),
    "error_report": (q_error_report, SQL_ERROR_REPORT),
    "nested_quantiles": (q_nested_quantiles, SQL_NESTED_QUANTILES),
    "power_iter": (q_power_iter, SQL_POWER_ITER),
    "source_vocab_overlap": (q_source_vocab_overlap,
                             SQL_SOURCE_VOCAB_OVERLAP),
    "customers_full_coverage": (q_customers_full_coverage,
                                SQL_CUSTOMERS_FULL_COVERAGE),
    "pagerank_iter": (q_pagerank_iter, SQL_PAGERANK_ITER),
    "dense_rank_rows": (q_dense_rank_rows, SQL_DENSE_RANK_ROWS),
    "time_weighted_median": (q_time_weighted_median,
                             SQL_TIME_WEIGHTED_MEDIAN),
    "funnel_steps": (q_funnel_steps, SQL_FUNNEL_STEPS),
    "union_sources": (q_union_sources, SQL_UNION_SOURCES),
    "time_weighted_value": (q_time_weighted_value,
                            SQL_TIME_WEIGHTED_VALUE),
    "weighted_sample": (q_weighted_sample, SQL_WEIGHTED_SAMPLE),
    "unpivot_measures": (q_unpivot_measures, SQL_UNPIVOT_MEASURES),
    "token_freq_sketch": (q_token_freq_sketch, None),
    "zscore_outliers": (q_zscore_outliers, SQL_ZSCORE_OUTLIERS),
    "pareto_front": (q_pareto_front, SQL_PARETO_FRONT),
    "missing_ranges": (q_missing_ranges, SQL_MISSING_RANGES),
    "interval_coverage": (q_interval_coverage, SQL_INTERVAL_COVERAGE),
    "tfidf_top_terms": (q_tfidf_top_terms, SQL_TFIDF_TOP_TERMS),
    "value_quantile_sketch": (q_value_quantile_sketch, None),
    "type_quantile_sketch": (q_type_quantile_sketch, None),
    "fuzzy_name_pairs": (q_fuzzy_name_pairs, SQL_FUZZY_NAME_PAIRS),
    "trend_slope": (q_trend_slope, SQL_TREND_SLOPE),
    "entry_exit": (q_entry_exit, SQL_ENTRY_EXIT),
    "doc_rarity": (q_doc_rarity, SQL_DOC_RARITY),
    "behavior_signatures": (q_behavior_signatures,
                            SQL_BEHAVIOR_SIGNATURES),
    "cum_distinct_types": (q_cum_distinct_types,
                           SQL_CUM_DISTINCT_TYPES),
    "ndjson_roundtrip": (q_ndjson_roundtrip, SQL_NDJSON_ROUNDTRIP),
    "kwic_snippets": (q_kwic_snippets, SQL_KWIC_SNIPPETS),
    "gap_histogram": (q_gap_histogram, SQL_GAP_HISTOGRAM),
    "role_flow_histogram": (q_role_flow_histogram,
                            SQL_ROLE_FLOW_HISTOGRAM),
    "global_running_sum": (q_global_running_sum,
                           SQL_GLOBAL_RUNNING_SUM),
    "type_overlap_kmv": (q_type_overlap_kmv, None),
    "last_buy_carry": (q_last_buy_carry, SQL_LAST_BUY_CARRY),
    "systematic_sample": (q_systematic_sample, SQL_SYSTEMATIC_SAMPLE),
    "pairwise_spread": (q_pairwise_spread, SQL_PAIRWISE_SPREAD),
    "peak_hour_per_type": (q_peak_hour_per_type,
                           SQL_PEAK_HOUR_PER_TYPE),
    "tool_latency": (q_tool_latency, SQL_TOOL_LATENCY),
    "ks_statistic": (q_ks_statistic, SQL_KS_STATISTIC),
    "type_trigrams": (q_type_trigrams, SQL_TYPE_TRIGRAMS),
    "trimmed_mean": (q_trimmed_mean, SQL_TRIMMED_MEAN),
    "skew_report": (q_skew_report, SQL_SKEW_REPORT),
    "contingency_margins": (q_contingency_margins,
                            SQL_CONTINGENCY_MARGINS),
    "turn_text_dups": (q_turn_text_dups, SQL_TURN_TEXT_DUPS),
    "session_lengths": (q_session_lengths, SQL_SESSION_LENGTHS),
    "sessions_with_buy": (q_sessions_with_buy, SQL_SESSIONS_WITH_BUY),
    "tool_cooccurrence": (q_tool_cooccurrence, SQL_TOOL_COOCCURRENCE),
    "lorenz_deciles": (q_lorenz_deciles, SQL_LORENZ_DECILES),
    "view_to_buy_lag": (q_view_to_buy_lag, SQL_VIEW_TO_BUY_LAG),
    "monthly_orders_yoy": (q_monthly_orders_yoy,
                           SQL_MONTHLY_ORDERS_YOY),
    "order_to_ship_days": (q_order_to_ship_days,
                           SQL_ORDER_TO_SHIP_DAYS),
    "rfm_customers": (q_rfm_customers, SQL_RFM_CUSTOMERS),
    "type_percent_rank": (q_type_percent_rank, SQL_TYPE_PERCENT_RANK),
    "dim_profile": (q_dim_profile, SQL_DIM_PROFILE),
    "repurchase_gaps": (q_repurchase_gaps, SQL_REPURCHASE_GAPS),
    "behavior_twins": (q_behavior_twins, SQL_BEHAVIOR_TWINS),
    "conv_split": (q_conv_split, SQL_CONV_SPLIT),
    "split_leakage": (q_split_leakage, SQL_SPLIT_LEAKAGE),
    "value_autocorr_lag1": (q_value_autocorr_lag1,
                            SQL_VALUE_AUTOCORR_LAG1),
    "daily_median_band": (q_daily_median_band, SQL_DAILY_MEDIAN_BAND),
    "type_run_lengths": (q_type_run_lengths, SQL_TYPE_RUN_LENGTHS),
    "daily_peak_share": (q_daily_peak_share, SQL_DAILY_PEAK_SHARE),
    "container_profile": (q_container_profile, SQL_CONTAINER_PROFILE),
    "first_week_value": (q_first_week_value, SQL_FIRST_WEEK_VALUE),
    "nation_customer_profile": (q_nation_customer_profile,
                                SQL_NATION_CUSTOMER_PROFILE),
    "priority_mix_by_year": (q_priority_mix_by_year,
                             SQL_PRIORITY_MIX_BY_YEAR),
    "caller_error_rate": (q_caller_error_rate, SQL_CALLER_ERROR_RATE),
    "weekend_ks": (q_weekend_ks, SQL_WEEKEND_KS),
    "first_response_lag": (q_first_response_lag,
                           SQL_FIRST_RESPONSE_LAG),
    "vocab_growth": (q_vocab_growth, SQL_VOCAB_GROWTH),
    "top_bigram_per_source": (q_top_bigram_per_source,
                              SQL_TOP_BIGRAM_PER_SOURCE),
    "order_cadence": (q_order_cadence, SQL_ORDER_CADENCE),
    "extreme_vectors": (q_extreme_vectors, SQL_EXTREME_VECTORS),
    "tool_switches": (q_tool_switches, SQL_TOOL_SWITCHES),
    "props_value_histogram": (q_props_value_histogram,
                              SQL_PROPS_VALUE_HISTOGRAM),
    "conv_token_budget": (q_conv_token_budget, SQL_CONV_TOKEN_BUDGET),
    "region_nation_rollup": (q_region_nation_rollup,
                             SQL_REGION_NATION_ROLLUP),
    "session_duration_band": (q_session_duration_band,
                              SQL_SESSION_DURATION_BAND),
    "revenue_deciles": (q_revenue_deciles, SQL_REVENUE_DECILES),
    "time_to_third_purchase": (q_time_to_third_purchase,
                               SQL_TIME_TO_THIRD_PURCHASE),
    "tools_per_role": (q_tools_per_role, SQL_TOOLS_PER_ROLE),
    "monthly_new_vs_returning": (q_monthly_new_vs_returning,
                                 SQL_MONTHLY_NEW_VS_RETURNING),
    "q6_revenue": (q_q6_revenue, SQL_Q6_REVENUE),
    "type_gini": (q_type_gini, SQL_TYPE_GINI),
    "overlapping_orders": (q_overlapping_orders,
                           SQL_OVERLAPPING_ORDERS),
    "rank_topk_ties": (q_rank_topk_ties, SQL_RANK_TOPK_TIES),
    "tool_triples": (q_tool_triples, SQL_TOOL_TRIPLES),
    "role_tool_list": (q_role_tool_list, SQL_ROLE_TOOL_LIST),
    "turn_len_by_role": (q_turn_len_by_role, SQL_TURN_LEN_BY_ROLE),
    "decile_transition": (q_decile_transition, SQL_DECILE_TRANSITION),
    "tool_affinity": (q_tool_affinity, SQL_TOOL_AFFINITY),
    "lang_confusion": (q_lang_confusion, SQL_LANG_CONFUSION),
    "repeat_collapse": (q_repeat_collapse, SQL_REPEAT_COLLAPSE),
    "rule_violations": (q_rule_violations, SQL_RULE_VIOLATIONS),
    "csv_roundtrip": (q_csv_roundtrip, SQL_CSV_ROUNDTRIP),
    "pii_report": (q_pii_report, SQL_PII_REPORT),
    "split_novelty": (q_split_novelty, SQL_SPLIT_NOVELTY),
    "encode_docs": (q_encode_docs, SQL_ENCODE_DOCS),
    "dataset_card": (q_dataset_card, SQL_DATASET_CARD),
    "pack_efficiency": (q_pack_efficiency, SQL_PACK_EFFICIENCY),
    "conv_turn_histogram": (q_conv_turn_histogram,
                            SQL_CONV_TURN_HISTOGRAM),
    "prefix_dups": (q_prefix_dups, SQL_PREFIX_DUPS),
    "triangle_parts": (q_triangle_parts, SQL_TRIANGLE_PARTS),
    "triangle_parts_dist": (q_triangle_parts_dist, SQL_TRIANGLE_PARTS),
    "ema_cents": (q_ema_cents, SQL_EMA_CENTS),
    "bm25_topk": (q_bm25_topk, SQL_BM25_TOPK),
    "sft_examples": (q_sft_examples, SQL_SFT_EXAMPLES),
    "ols_fit": (q_ols_fit, SQL_OLS_FIT),
    "dup_spans": (q_dup_spans, SQL_DUP_SPANS),
    "ngram_jaccard": (q_ngram_jaccard, SQL_NGRAM_JACCARD),
    "table_digest": (q_table_digest, SQL_TABLE_DIGEST),
    "rrf_fusion": (q_rrf_fusion, SQL_RRF_FUSION),
    "changepoint_cusum": (q_changepoint_cusum, SQL_CHANGEPOINT_CUSUM),
    "incremental_agg": (q_incremental_agg, SQL_INCREMENTAL_AGG),
    "interpolate_daily": (q_interpolate_daily, SQL_INTERPOLATE_DAILY),
    "survivorship": (q_survivorship, SQL_SURVIVORSHIP),
    "seasonal_naive_error": (q_seasonal_naive_error,
                             SQL_SEASONAL_NAIVE_ERROR),
    "threshold_sweep": (q_threshold_sweep, SQL_THRESHOLD_SWEEP),
    "knn_label_eval": (q_knn_label_eval, SQL_KNN_LABEL_EVAL),
    "topk_diversified": (q_topk_diversified, SQL_TOPK_DIVERSIFIED),
    "dedup_method_overlap": (q_dedup_method_overlap,
                             SQL_DEDUP_METHOD_OVERLAP),
    "hive_partition_prune": (q_hive_partition_prune,
                             SQL_HIVE_PARTITION_PRUNE),
    "clamped_balance": (q_clamped_balance, SQL_CLAMPED_BALANCE),
    "cluster_split": (q_cluster_split, SQL_CLUSTER_SPLIT),
    "k_anonymity": (q_k_anonymity, SQL_K_ANONYMITY),
    "benford_digits": (q_benford_digits, SQL_BENFORD_DIGITS),
    "attribution_last_touch": (q_attribution_last_touch,
                               SQL_ATTRIBUTION_LAST_TOUCH),
    "target_encode": (q_target_encode, SQL_TARGET_ENCODE),
    "preference_pairs": (q_preference_pairs, SQL_PREFERENCE_PAIRS),
    "hard_negatives": (q_hard_negatives, SQL_HARD_NEGATIVES),
    "error_window_types": (q_error_window_types,
                           SQL_ERROR_WINDOW_TYPES),
    "user_activity_fold": (q_user_activity_fold,
                           SQL_USER_ACTIVITY_FOLD),
    "ohlc_weekly": (q_ohlc_weekly, SQL_OHLC_WEEKLY),
    "chat_format_check": (q_chat_format_check, SQL_CHAT_FORMAT_CHECK),
    "order_reconciliation": (q_order_reconciliation,
                             SQL_ORDER_RECONCILIATION),
    "feature_hashing": (q_feature_hashing, SQL_FEATURE_HASHING),
    "vocab_coverage": (q_vocab_coverage, SQL_VOCAB_COVERAGE),
    "out_of_order_audit": (q_out_of_order_audit,
                           SQL_OUT_OF_ORDER_AUDIT),
    "span_corruption": (q_span_corruption, SQL_SPAN_CORRUPTION),
    "cdc_apply": (q_cdc_apply, SQL_CDC_APPLY),
    "weighted_median": (q_weighted_median, SQL_WEIGHTED_MEDIAN),
    "auc_score": (q_auc_score, SQL_AUC_SCORE),
    "cohens_kappa": (q_cohens_kappa, SQL_COHENS_KAPPA),
    "calibration_bins": (q_calibration_bins, SQL_CALIBRATION_BINS),
    "grok_parse": (q_grok_parse, SQL_GROK_PARSE),
    "grok_multi": (q_grok_multi, SQL_GROK_MULTI),
    "cidr_enrich": (q_cidr_enrich, SQL_CIDR_ENRICH),
    "isotonic_fit": (q_isotonic_fit, SQL_ISOTONIC_FIT),
    "in_subquery_mark": (q_in_subquery_mark, SQL_IN_SUBQUERY_MARK),
    "zorder_stats": (q_zorder_stats, SQL_ZORDER_STATS),
    "bootstrap_mean": (q_bootstrap_mean, SQL_BOOTSTRAP_MEAN),
    "embed_quantize": (q_embed_quantize, SQL_EMBED_QUANTIZE),
    "km_survival": (q_km_survival, SQL_KM_SURVIVAL),
    "did_estimate": (q_did_estimate, SQL_DID_ESTIMATE),
    "evolve_roundtrip": (q_evolve_roundtrip, SQL_EVOLVE_ROUNDTRIP),
    "encoding_profile": (q_encoding_profile, SQL_ENCODING_PROFILE),
    "lttb_downsample": (q_lttb_downsample, SQL_LTTB_DOWNSAMPLE),
    "log_templates": (q_log_templates, SQL_LOG_TEMPLATES),
    "grok_apache": (q_grok_apache, SQL_GROK_APACHE),
    "template_drift": (q_template_drift, SQL_TEMPLATE_DRIFT),
    "grok_syslog": (q_grok_syslog, SQL_GROK_SYSLOG),
    # rows-only (non-SQL-expressible; driver records weaker check).
    # simhash_groups stays here deliberately: the md5-equality-class
    # oracle (round-2 verdict #7) is empirically WRONG for this corpus —
    # planted near-dup texts (different md5) share identical simhashes,
    # so simhash groups merge md5 classes (checked at sf0.001/sf0.01).
    "simhash": (q_simhash, None),
    "simhash_groups": (q_simhash_groups, None),
    "simhash_neardup": (q_simhash_neardup, None),
    "minhash_pairs": (q_minhash_pairs, SQL_MINHASH_PAIRS),
    "dedup_clusters": (q_dedup_clusters, SQL_DEDUP_CLUSTERS),
    "rolling_fingerprint": (q_rolling_fingerprint, None),
    "compressibility": (q_compressibility, None),
    "bpe_merges": (q_bpe_merges, None),
    "bpe_encode": (q_bpe_encode, None),
    "knn_ivf": (q_knn_ivf, None),
    "approx_distinct_users": (q_approx_distinct_users, None),
    "approx_users_per_type": (q_approx_users_per_type, None),
    "media_features": (q_media_features, SQL_MEDIA_FEATURES),
}
