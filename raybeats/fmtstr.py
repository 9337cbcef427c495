"""Event format strings, vectorized.

Re-expresses the reference's ``fmtstr`` event format language
(``libbeat/common/fmtstr/formatevents.go``): ``%{[field.path]}`` field
refs, ``%{[field]:default}`` defaults, and ``%{+FORMAT}`` timestamp
formatting (Joda-style tokens) against the ``ts`` column. Compiles once to
a part list; evaluates per batch with Arrow kernels. A row where any
referenced field is null/missing and has no default evaluates to null
(the selector treats null as "rule does not produce a value").
"""

from __future__ import annotations

import re

import pyarrow as pa
import pyarrow.compute as pc

from .errors import ConfigError

_REF_RE = re.compile(r"%\{([^}]*)\}")

_JODA = [("yyyy", "%Y"), ("MM", "%m"), ("dd", "%d"), ("HH", "%H"),
         ("mm", "%M"), ("ss", "%S")]


def _joda_to_strftime(fmt: str) -> str:
    out = fmt
    for j, s in _JODA:
        out = out.replace(j, s)
    return out


class EventFormatString:
    def __init__(self, raw: str, ts_field: str = "ts"):
        self.raw = raw
        self.parts: list[tuple[str, str, str | None]] = []  # (kind, val, default)
        pos = 0
        for m in _REF_RE.finditer(raw):
            if m.start() > pos:
                self.parts.append(("lit", raw[pos:m.start()], None))
            body = m.group(1)
            if body.startswith("+"):
                self.parts.append(("ts", _joda_to_strftime(body[1:]), None))
            else:
                if body.startswith("["):
                    end = body.rfind("]")
                    if end < 0:
                        raise ConfigError(f"bad field ref in {raw!r}")
                    inner = body[1:end]
                    rest = body[end + 1:]
                else:
                    inner, _, rest = body.partition(":")
                    rest = f":{rest}" if rest else ""
                # allow %{[a][b]} nested syntax -> dotted column name
                inner = inner.replace("][", ".")
                default = rest[1:] if rest.startswith(":") else None
                if not inner:
                    raise ConfigError(f"empty field ref in {raw!r}")
                self.parts.append(("field", inner, default))
            pos = m.end()
        if pos < len(raw):
            self.parts.append(("lit", raw[pos:], None))
        self.ts_field = ts_field
        self.is_const = all(k == "lit" for k, _, _ in self.parts)

    def const_value(self) -> str:
        return "".join(v for _, v, _ in self.parts)

    def evaluate(self, tbl: pa.Table) -> pa.Array:
        """Returns a string array (null where unresolvable)."""
        n = tbl.num_rows
        if self.is_const:
            return pa.array([self.const_value()] * n, pa.string())
        cols: list = []
        for kind, val, default in self.parts:
            if kind == "lit":
                cols.append(val)
            elif kind == "ts":
                if self.ts_field in tbl.column_names:
                    cols.append(pc.strftime(tbl.column(self.ts_field), format=val))
                else:
                    cols.append(pa.nulls(n, pa.string()))
            else:
                if val in tbl.column_names:
                    c = pc.cast(tbl.column(val), pa.string())
                    if default is not None:
                        c = pc.fill_null(c, default)
                    cols.append(c.combine_chunks()
                                if isinstance(c, pa.ChunkedArray) else c)
                elif default is not None:
                    cols.append(pa.array([default] * n, pa.string()))
                else:
                    cols.append(pa.nulls(n, pa.string()))
        if len(cols) == 1:
            c = cols[0]
            return (pa.array([c] * n, pa.string())
                    if isinstance(c, str) else c)
        return pc.binary_join_element_wise(*cols, "")
