"""Text log-file sources — the harvester re-expressed.

The reference's harvester reads one file sequentially through a reader
chain (encode → line split → multiline → limit) and emits
``{message, log.offset, log.file.path}`` per line
(``filebeat/input/log/harvester.go:413-477``). Here a file is one read
task (``read_binary_files(include_paths=True)``), and the reader chain is
one vectorized ``map_batches``: newline positions found with numpy, byte
offsets exact, optional multiline join (pattern / count / while modes,
``libbeat/reader/multiline/``) applied per file before emit.
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa


def _split_file(path: str, data: bytes, encoding: str,
                line_terminator: bytes, max_bytes: int | None):
    """→ (messages, offsets): exact byte offset of each line start."""
    if not data:
        return [], []
    if len(line_terminator) != 1:
        raise ValueError("only single-byte line terminators supported")
    arr = np.frombuffer(data, dtype=np.uint8)
    term = line_terminator[0]
    ends = np.nonzero(arr == term)[0]
    starts = np.concatenate(([0], ends + 1))
    stops = np.concatenate((ends, [len(data)]))
    if starts[-1] >= len(data):  # trailing terminator: no final empty line
        starts, stops = starts[:-1], stops[:-1]
    msgs, offs = [], []
    for a, b in zip(starts.tolist(), stops.tolist()):
        chunk = data[a:b]
        if chunk.endswith(b"\r"):
            chunk = chunk[:-1]
        if max_bytes and len(chunk) > max_bytes:
            chunk = chunk[:max_bytes]
        msgs.append(chunk.decode(encoding, errors="replace"))
        offs.append(a)
    return msgs, offs


class MultilineJoiner:
    """Multiline modes of ``libbeat/reader/multiline``: ``pattern``
    (negate/match ``before``/``after``, ``max_lines``), ``count``,
    ``while_pattern``. Applied per file (lines arrive file-complete)."""

    def __init__(self, mode: str = "pattern", pattern: str = "",
                 negate: bool = False, match: str = "after",
                 max_lines: int = 500, count: int = 0,
                 separator: str = "\n"):
        if mode not in ("pattern", "count", "while_pattern"):
            raise ValueError(f"multiline: bad mode {mode!r}")
        if mode in ("pattern", "while_pattern") and not pattern:
            raise ValueError(f"multiline mode {mode!r} requires a pattern")
        if mode == "count" and count < 1:
            raise ValueError("multiline mode 'count' requires count >= 1")
        self.mode = mode
        self.re = re.compile(pattern) if pattern else None
        self.negate = negate
        self.match = match
        self.max_lines = max_lines
        self.count = count
        self.sep = separator

    def _matches(self, line: str) -> bool:
        m = bool(self.re.search(line))
        return (not m) if self.negate else m

    def join(self, msgs: list[str], offs: list[int]):
        out_m: list[str] = []
        out_o: list[int] = []
        if self.mode == "count":
            for i in range(0, len(msgs), max(1, self.count)):
                seg = msgs[i:i + self.count]
                out_m.append(self.sep.join(seg))
                out_o.append(offs[i])
            return out_m, out_o
        if self.mode == "while_pattern":
            buf: list[str] = []
            start = 0
            for m, o in zip(msgs, offs):
                if self._matches(m):
                    if not buf:
                        start = o
                    buf.append(m)
                else:
                    if buf:
                        out_m.append(self.sep.join(buf))
                        out_o.append(start)
                        buf = []
                    out_m.append(m)
                    out_o.append(o)
            if buf:
                out_m.append(self.sep.join(buf))
                out_o.append(start)
            return out_m, out_o
        # pattern mode: a matching line continues the previous event
        # (match=after) or attaches to the next line (match=before)
        buf = []
        start = 0
        if self.match == "after":
            for m, o in zip(msgs, offs):
                if buf and self._matches(m):
                    if len(buf) < self.max_lines:
                        buf.append(m)
                    # else: overflow continuation lines are CONSUMED and
                    # dropped (the event truncates) — they never start a
                    # new event, matching libbeat's multiline reader
                else:
                    if buf:
                        out_m.append(self.sep.join(buf))
                        out_o.append(start)
                    buf = [m]
                    start = o
        else:
            for m, o in zip(msgs, offs):
                if not buf:
                    start = o
                buf.append(m)
                if not self._matches(m) or len(buf) >= self.max_lines:
                    out_m.append(self.sep.join(buf))
                    out_o.append(start)
                    buf = []
        if buf:
            out_m.append(self.sep.join(buf))
            out_o.append(start)
        return out_m, out_o


def read_log_lines(paths, encoding: str = "utf-8",
                   line_terminator: bytes = b"\n",
                   max_bytes: int | None = None,
                   multiline: dict | None = None):
    """Dataset of ``(message, log.offset, log.file.path)`` rows from text
    log files — one read task per file, vectorized line split."""
    import ray.data as rd

    joiner = MultilineJoiner(**multiline) if multiline else None

    def split(batch: pa.Table) -> pa.Table:
        msgs_all, offs_all, paths_all = [], [], []
        for path, data in zip(batch.column("path").to_pylist(),
                              batch.column("bytes").to_pylist()):
            msgs, offs = _split_file(path, bytes(data), encoding,
                                     line_terminator, max_bytes)
            if joiner is not None:
                msgs, offs = joiner.join(msgs, offs)
            msgs_all.extend(msgs)
            offs_all.extend(offs)
            paths_all.extend([path] * len(msgs))
        return pa.table({
            "message": pa.array(msgs_all, pa.string()),
            "log.offset": pa.array(offs_all, pa.int64()),
            "log.file.path": pa.array(paths_all, pa.string()),
        })

    ds = rd.read_binary_files(paths, include_paths=True)
    return ds.map_batches(split, batch_format="pyarrow")


def read_log_lines_incremental(paths, store, identity: str = "native",
                               encoding: str = "utf-8",
                               line_terminator: bytes = b"\n",
                               max_bytes: int | None = None,
                               multiline: dict | None = None):
    """Resumable harvester: read only each file's NEW complete lines
    since the last ACKed cursor (rotation-aware — see
    :mod:`raybeats.sources.identity`). Returns ``(dataset, plans)``;
    after the consumer has published, call
    ``identity.commit_scan(store, plans)`` to ACK.

    Rotation semantics inherited from the identity module: a renamed
    file keeps its inode identity (no re-read), a copy-truncated file
    restarts at offset 0, a fresh file at the old path is a new
    identity. Line offsets are absolute file offsets.

    Multiline + incremental: each scan FLUSHES its trailing multiline
    event even if continuation lines are still being appended — the
    same behavior as the reference's ``multiline.timeout`` (default 5 s,
    ``libbeat/reader/multiline/pattern.go``) firing between scans, where
    a pending event flushes and later continuation lines start a new
    event. Scans therefore ack up to the last complete LINE, not the
    last complete multiline EVENT."""
    import ray.data as rd

    from .identity import plan_scan
    plans = plan_scan(list(paths), store, identity=identity,
                      line_terminator=line_terminator)
    joiner = MultilineJoiner(**multiline) if multiline else None
    empty = pa.table({"message": pa.array([], pa.string()),
                      "log.offset": pa.array([], pa.int64()),
                      "log.file.path": pa.array([], pa.string())})
    if not plans:
        return rd.from_arrow(empty), plans

    def load(batch: pa.Table) -> pa.Table:
        msgs_all, offs_all, paths_all = [], [], []
        for path, start, end in zip(batch.column("path").to_pylist(),
                                    batch.column("start").to_pylist(),
                                    batch.column("end").to_pylist()):
            with open(path, "rb") as f:
                f.seek(start)
                data = f.read(end - start)
            msgs, offs = _split_file(path, data, encoding,
                                     line_terminator, max_bytes)
            if joiner is not None:
                msgs, offs = joiner.join(msgs, offs)
            msgs_all.extend(msgs)
            offs_all.extend(o + start for o in offs)
            paths_all.extend([path] * len(msgs))
        return pa.table({
            "message": pa.array(msgs_all, pa.string()),
            "log.offset": pa.array(offs_all, pa.int64()),
            "log.file.path": pa.array(paths_all, pa.string()),
        })

    ds = rd.from_items(plans).map_batches(load, batch_format="pyarrow")
    return ds, plans


def read_ndjson(paths, expected_keys=None, target: str = "",
                **read_kwargs):
    """NDJSON source (the reference's JSON reader path): line split, then
    ``decode_json_fields`` applied to the ``message`` column."""
    from ..processors import build_chain
    chain = build_chain([{"decode_json_fields": {
        "fields": ["message"], "target": target,
        "expected_keys": expected_keys}}])
    return read_log_lines(paths, **read_kwargs) \
        .map_batches(chain, batch_format="pyarrow")
