"""Output sinks beyond the per-sink parquet writer: a kafka-style
fields-hash partitioned layout and codec-rendered NDJSON.

Ray-Data-first shapes: the partition/topic columns are derived
vectorized inside ``map_batches`` and the write is one partitioned
``write_parquet`` (partition dirs = kafka topic/partition lanes, so a
downstream consumer reads one lane per worker); the NDJSON sink renders
each block and writes one file per block from the task itself — the
returned manifest rows are the audit trail, no driver fan-in of data.
"""

from __future__ import annotations

import glob as glob_mod
import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from .errors import ConfigError
from .fmtstr import EventFormatString
from .util import fnv1a_u32_fold


def add_kafka_partition(tbl: pa.Table, hash_fields: list[str],
                        n_partitions: int, topic: str = "events",
                        topic_fmt: EventFormatString | None = None,
                        drop_fail: bool = False) -> pa.Table:
    """Derive (topic, partition) columns per the reference's fields-hash
    partitioner (``kafka/partition.go:240-277``): one FNV-32a hasher fed
    the string form of each configured field's bytes in order, then
    ``hash2Partition`` → ``(h & 0x7FFFFFFF) % n`` (``partition.go:274-277``).

    Divergence (documented): on a missing hash field the reference picks
    a RANDOM partition (non-reproducible); this engine either drops the
    rows (``drop_fail=True``, the reference's ``random: false`` path) or
    hashes the remaining fields deterministically."""
    n = tbl.num_rows
    missing = [f for f in hash_fields if f not in tbl.column_names]
    if missing and drop_fail:
        tbl = tbl.slice(0, 0)
        n = 0
    h = np.full(n, 0x811C9DC5, dtype=np.uint32)
    for f in hash_fields:
        if f in tbl.column_names:
            h = fnv1a_u32_fold(tbl.column(f), h)
    part = (h.astype(np.int64) & 0x7FFFFFFF) % n_partitions
    if topic_fmt is not None:
        topics = pc.fill_null(topic_fmt.evaluate(tbl), topic)
    else:
        topics = pa.array([topic] * n, pa.string())
    tbl = tbl.append_column("topic", topics)
    return tbl.append_column("partition", pa.array(part, pa.int64()))


def write_kafka_layout(ds, out_dir: str, hash_fields: list[str],
                       n_partitions: int = 12, topic: str = "events",
                       drop_fail: bool = False) -> dict:
    """Write ``out_dir/topic=T/partition=P/*.parquet`` with a manifest
    row per (topic, partition) lane (counts re-derived from the written
    footers — write-audit-publish, same as the pipeline sinks). ``topic``
    may be an event format string (``%{[field]}`` refs)."""
    from .state.manifest import stage_and_swap

    topic_fmt = EventFormatString(topic) if "%{" in topic else None

    def tag(tbl: pa.Table) -> pa.Table:
        return add_kafka_partition(tbl, hash_fields, n_partitions,
                                   topic=topic, topic_fmt=topic_fmt,
                                   drop_fail=drop_fail)

    # write-audit-publish: stage + atomic swap so a crashed or re-run
    # write never leaves stale generations that the footer scan would
    # double-count
    stage_and_swap(out_dir,
                   lambda staging: ds.map_batches(
                       tag, batch_format="pyarrow").write_parquet(
                           staging, partition_cols=["topic", "partition"]))
    lanes: dict[str, int] = {}
    for tdir in sorted(glob_mod.glob(os.path.join(out_dir, "topic=*"))):
        tname = os.path.basename(tdir).split("=", 1)[1]
        for pdir in sorted(glob_mod.glob(os.path.join(tdir,
                                                      "partition=*"))):
            pnum = os.path.basename(pdir).split("=", 1)[1]
            rows = sum(pq.read_metadata(f).num_rows for f in
                       glob_mod.glob(os.path.join(pdir, "*.parquet")))
            lanes[f"{tname}/{pnum}"] = rows
    manifest = {"topic": topic, "hash_fields": list(hash_fields),
                "n_partitions": n_partitions, "lanes": lanes,
                "rows": sum(lanes.values())}
    with open(os.path.join(out_dir, "manifest.json"), "w") as f:
        json.dump(manifest, f, indent=1, sort_keys=True)
    return manifest


def read_kafka_lanes(out_dir: str, topics: list[str] | None = None,
                     order_cols: tuple[str, ...] | None = None,
                     columns: list[str] | None = None,
                     row_filter=None):
    """Consumer half of the kafka-style layout (the reference ships the
    PRODUCER half, ``kafka/partition.go:141-277``; real consumers read
    one partition per group member): one Ray task per
    ``topic=T/partition=P`` lane, so lanes process in parallel but each
    lane's rows stay together and in order — the kafka per-partition
    ordering contract. Parquet part files carry no append order, so the
    deterministic equivalent is an explicit per-lane sort on
    ``order_cols`` (e.g. the event-time columns the producer wrote);
    per-KEY ordering follows because the fields-hash partitioner sends
    a key to exactly one lane.

    Returns a lazy Dataset of the lane rows with (topic, partition)
    attached. ``topics`` filters lanes at the SCAN (unselected topics
    never leave storage); ``columns`` prunes the parquet read;
    ``row_filter`` (a ``pyarrow.dataset`` expression, e.g. a time-range
    predicate) pushes down to the parquet scan so pruned row groups
    never leave storage — the replay-a-time-slice path the streaming
    bridge uses."""
    import ray.data as rd

    lanes = []
    for tdir in sorted(glob_mod.glob(os.path.join(out_dir, "topic=*"))):
        tname = os.path.basename(tdir).split("=", 1)[1]
        if topics is not None and tname not in topics:
            continue
        for pdir in sorted(glob_mod.glob(os.path.join(tdir,
                                                      "partition=*"))):
            lanes.append({"topic": tname,
                          "partition": int(os.path.basename(pdir)
                                           .split("=", 1)[1]),
                          "dir": pdir})
    empty = pa.table({"topic": pa.array([], pa.string()),
                      "partition": pa.array([], pa.int64())})
    if not lanes:
        return rd.from_arrow(empty)

    def read_lane(batch: pa.Table):
        # batch_size=1 → exactly one lane per call; the generator yields
        # the lane as one ordered table (never interleaved with another
        # lane's rows)
        for row in batch.to_pylist():
            files = sorted(glob_mod.glob(os.path.join(row["dir"],
                                                      "*.parquet")))
            if not files:
                continue
            t = pa.concat_tables([pq.read_table(f, columns=columns,
                                                filters=row_filter)
                                  for f in files])
            if order_cols:
                t = t.sort_by([(c, "ascending") for c in order_cols])
            n = t.num_rows
            t = t.append_column("topic",
                                pa.array([row["topic"]] * n, pa.string()))
            t = t.append_column("partition",
                                pa.array([row["partition"]] * n,
                                         pa.int64()))
            yield t

    return rd.from_items(lanes, override_num_blocks=len(lanes)) \
        .map_batches(read_lane, batch_size=1, batch_format="pyarrow")


# ------------------------------------------------------------- codecs

def _escape_html(s: str) -> str:
    # Go's SetEscapeHTML(true): <, >, & escape wherever they appear in
    # strings; structural JSON never contains them, so a global replace
    # over the serialized text is exact (outputs/codec/json/json.go)
    return (s.replace("&", "\\u0026").replace("<", "\\u003c")
             .replace(">", "\\u003e"))


def encode_json_lines(tbl: pa.Table, pretty: bool = False,
                      escape_html: bool = False) -> list[str]:
    """``codec/json``: one JSON document per event. Output encoding is
    inherently per-row (it feeds a line-oriented consumer); keys are
    sorted for determinism. NaN/inf render as null (the reference's
    IgnoreInvalidFloat)."""
    out = []
    for r in tbl.to_pylist():
        clean = {k: (None if isinstance(v, float) and
                     (v != v or v in (float("inf"), float("-inf"))) else v)
                 for k, v in r.items()}
        s = json.dumps(clean, sort_keys=True, default=str,
                       indent=2 if pretty else None,
                       separators=None if pretty else (",", ":"))
        out.append(_escape_html(s) if escape_html else s)
    return out


def write_ndjson(ds, out_dir: str, codec: dict | None = None) -> dict:
    """Codec-rendered newline-delimited sink (``outputs/codec``):

    * ``{"json": {"pretty": ..., "escape_html": ...}}`` (default) — one
      JSON document per event (pretty documents still newline-separated);
    * ``{"format": {"string": "..."}}`` — each event rendered through the
      event format string (``codec/format``); rows where the format
      evaluates to null are dropped and counted, mirroring the codec
      error path.

    Each block writes its own ``part-*.ndjson`` file from the task; the
    manifest aggregates (file, rows, dropped) — no data through the
    driver."""
    codec = codec or {"json": {}}
    if len(codec) != 1 or next(iter(codec)) not in ("json", "format"):
        raise ConfigError(f"write_ndjson: unknown codec {codec!r}")
    kind, cfg = next(iter(codec.items()))
    fmt = None
    if kind == "format":
        if not cfg.get("string"):
            raise ConfigError("write_ndjson: format codec needs 'string'")
        fmt = EventFormatString(cfg["string"])
    from .state.manifest import stage_and_swap

    def run_write(staging: str) -> None:
        def write_block(tbl: pa.Table) -> pa.Table:
            import uuid
            dropped = 0
            if fmt is not None:
                rendered = fmt.evaluate(tbl)
                dropped = rendered.null_count
                lines = [x for x in rendered.to_pylist() if x is not None]
            else:
                lines = encode_json_lines(
                    tbl, pretty=cfg.get("pretty", False),
                    escape_html=cfg.get("escape_html", False))
            name = f"part-{uuid.uuid4().hex}.ndjson"
            with open(os.path.join(staging, name), "w") as f:
                for line in lines:
                    f.write(line)
                    f.write("\n")
            return pa.table({"name": pa.array([name], pa.string()),
                             "rows": pa.array([len(lines)], pa.int64()),
                             "dropped": pa.array([dropped], pa.int64())})

        parts.extend(ds.map_batches(write_block,
                                    batch_format="pyarrow").take_all())

    # stage + atomic swap (shared write-audit-publish helper): re-runs
    # replace the directory instead of accumulating stale part files
    parts: list[dict] = []
    stage_and_swap(out_dir, run_write)
    manifest = {"codec": kind,
                # read_ndjson refuses non-line-delimited renderings
                "pretty": bool(cfg.get("pretty", False))
                if kind == "json" else False,
                "files": sorted(os.path.join(out_dir, p["name"])
                                for p in parts),
                "rows": sum(p["rows"] for p in parts),
                "dropped": sum(p["dropped"] for p in parts)}
    with open(os.path.join(out_dir, "manifest.json"), "w") as f:
        json.dump(manifest, f, indent=1, sort_keys=True)
    return manifest


def read_ndjson(out_dir: str, columns: list[str] | None = None):
    """Reader half of :func:`write_ndjson`'s default compact ``json``
    codec (one JSON document per line — the reference's file/console
    output format, ``outputs/fileout``): one lazy Dataset over the
    ``part-*.ndjson`` files, parsed by arrow's JSON reader inside Ray's
    ``read_json`` tasks (parallel per file, streaming). The ``pretty``
    and ``format`` codecs are render-only (multi-line / lossy) and have
    no reader.

    JSON is a row-oriented TEXT format: there is no parse-time column
    pruning, so ``columns`` projects AFTER the parse
    (``select_columns``). The engine's scale-path interchange format
    stays parquet — this reader exists to consume ndjson feeds
    produced by shippers, not to make ndjson a storage format. Type
    note: the json codec renders timestamps as ISO strings and arrow's
    JSON reader type-infers them back (to second precision — the
    codec's rendered granularity), so a write→read round trip
    preserves values at the codec's fidelity, exactly like
    re-ingesting any shipper's output (asserted in tests)."""
    import ray.data as rd

    # codec guard: a pretty/format directory's manifest says so — its
    # multi-line / free-form lines would hit arrow's line-oriented
    # parser as an opaque ParseError (or worse, parse wrong rows)
    man_path = os.path.join(out_dir, "manifest.json")
    if os.path.exists(man_path):
        with open(man_path) as f:
            man = json.load(f)
        if man.get("codec") != "json" or man.get("pretty", False):
            raise ConfigError(
                f"read_ndjson: {out_dir!r} was written with the "
                f"{man.get('codec')!r} codec"
                f"{' (pretty)' if man.get('pretty') else ''} — only the "
                "compact json codec is line-delimited and readable")
    files = sorted(glob_mod.glob(os.path.join(out_dir, "part-*.ndjson")))
    if not files:
        raise ConfigError(f"read_ndjson: no part-*.ndjson under "
                          f"{out_dir!r}")
    # Ray's default extension filter rejects .ndjson; the files are
    # plain line-delimited JSON, so accept the extension explicitly
    ds = rd.read_json(files, file_extensions=["ndjson"])
    if columns is not None:
        ds = ds.select_columns(columns)
    return ds
