"""File identity + ACKed-offset cursors for the raw-log source.

Re-expresses the filestream identity/registrar machinery:

* identity ``native`` = ``"<inode>-<device>"``
  (``filebeat/input/filestream/identifier.go:101-127``) — a rotated
  (renamed) file keeps its identity, so its acked offset survives the
  rename and only appended bytes are read; ``path`` identity is the
  legacy fallback (``identifier.go:136-166``).
* truncation: a stored offset beyond the current size means the file
  was truncated/copy-truncated — reading restarts at 0
  (``filebeat/input/filestream/filestream.go:238-250``,
  ``ErrFileTruncate``).
* cursors persist as a JSON registry with atomic replace (the
  registrar analog, ``filebeat/registrar/registrar.go:194-214``); the
  caller commits offsets only after the batch that consumed them
  published (ACK-then-advance).
* only terminator-complete lines ack: the scan plans each file's read
  region up to its last line terminator, so a partially-appended line
  is re-offered next scan (the harvester's complete-line semantics).
"""

from __future__ import annotations

import json
import os

_TAIL_SCAN = 1 << 20  # how far back to look for the last terminator


def file_identity(path: str, mode: str = "native") -> str:
    if mode == "path":
        return f"path::{path}"
    if mode != "native":
        raise ValueError(f"file identity mode {mode!r} not supported")
    st = os.stat(path)
    return f"{st.st_ino}-{st.st_dev}"


class CursorStore:
    """identity → acked byte offset, JSON-persisted atomically."""

    def __init__(self, path: str):
        self.path = path
        self.cursors: dict[str, int] = {}
        if os.path.exists(path):
            with open(path) as f:
                self.cursors = {k: int(v) for k, v in json.load(f).items()}

    def offset(self, identity: str) -> int:
        return self.cursors.get(identity, 0)

    def advance(self, identity: str, offset: int) -> None:
        self.cursors[identity] = max(offset,
                                     self.cursors.get(identity, 0))

    def reset(self, identity: str, offset: int = 0) -> None:
        self.cursors[identity] = offset

    def flush(self) -> None:
        tmp = self.path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(self.cursors, f, indent=1, sort_keys=True)
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, self.path)


def _last_terminator_end(path: str, start: int, size: int,
                         terminator: bytes) -> int:
    """End offset (exclusive) of the last complete line in
    [start, size), scanning a bounded tail window backwards; ``start``
    when none found."""
    tlen = len(terminator)
    with open(path, "rb") as f:
        pos = size
        while pos > start:
            lo = max(start, pos - _TAIL_SCAN)
            f.seek(lo)
            # read past `pos` by tlen-1 so a terminator straddling the
            # window boundary is still seen (multi-byte terminators)
            chunk = f.read(min(size, pos + tlen - 1) - lo)
            idx = chunk.rfind(terminator)
            if idx >= 0 and lo + idx + tlen <= size:
                return lo + idx + tlen
            pos = lo
    return start


def plan_scan(paths: list[str], store: CursorStore,
              identity: str = "native",
              line_terminator: bytes = b"\n") -> list[dict]:
    """→ read plans ``{path, identity, start, end}`` for files with new
    COMPLETE lines. Truncation (offset > size) restarts at 0 and resets
    the stored cursor."""
    plans = []
    for p in sorted(paths):
        if not os.path.exists(p):
            continue  # rotated away and deleted; cursor stays harmless
        ident = file_identity(p, identity)
        size = os.path.getsize(p)
        start = store.offset(ident)
        if start > size:  # truncated / copy-truncated: restart
            store.reset(ident, 0)
            start = 0
        end = _last_terminator_end(p, start, size, line_terminator)
        if end > start:
            plans.append({"path": p, "identity": ident,
                          "start": start, "end": end})
    return plans


def commit_scan(store: CursorStore, plans: list[dict]) -> None:
    """ACK a consumed scan: advance each file's cursor to its planned
    end and persist (call AFTER the downstream write published)."""
    for plan in plans:
        store.advance(plan["identity"], plan["end"])
    store.flush()
