"""Dissect tokenizer — exact row-mode semantics + a vectorized Arrow path.

Behavior replicated (from observation) from the reference implementation at
``libbeat/processors/dissect/{parser.go,dissect.go,field.go,delimiter.go,
trim.go}`` and validated against the shared Logstash/Beats conformance corpus
``libbeat/processors/dissect/testdata/dissect_tests.json``.

Two execution modes:

* :class:`Dissector` — pure-python, string-at-a-time, byte-exact with the
  reference (used by unit tests, the oracle, and as fallback for patterns the
  regex translation cannot express).
* :meth:`Dissector.dissect_column` — vectorized over a ``pyarrow``
  string array using ``pyarrow.compute.extract_regex`` with a single anchored
  RE2 pattern compiled from the tokenizer (the hot path inside
  ``Dataset.map_batches``). Falls back to the row loop automatically when the
  tokenizer uses fixed-length fields, multi-char greedy delimiters, or
  indirection (``%{*ptr}``/``%{&ref}``/``%{?named}``), which produce
  row-dependent keys or Go-quirk matching the regex cannot express.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field as dc_field

import pyarrow as pa
import pyarrow.compute as pc

from .errors import DissectError, DissectParseError

# Tokenizer grammar (reference: dissect const.go): pairs of (delimiter, key).
_TOKEN_RE = re.compile(r"(?s)(.*?)%\{([^}]*?)\}")
# key[/ordinal][#length][->][|type]
_SUFFIX_RE = re.compile(
    r"(?s)(.+?)"
    r"(?:/(\d{1,2}))?"
    r"(?:#(\d{1,2}))?"
    r"(->)?"
    r"(?:\|([A-Za-z]*))?$"
)

_DATA_TYPES = {"integer", "long", "float", "double", "string", "boolean", "ip"}

NORMAL, SKIP, NAMED_SKIP, POINTER, APPEND, INDIRECT = range(6)

DEFAULT_JOIN = " "


@dataclass
class Field:
    id: int  # tokenizer order
    key: str
    kind: int
    ordinal: int = 0
    length: int = 0  # 0 = not fixed-length
    greedy: bool = False
    dtype: str = ""
    join: str = DEFAULT_JOIN  # append join = preceding delimiter (or " ")

    @property
    def saveable(self) -> bool:
        return self.kind in (NORMAL, APPEND, INDIRECT)

    @property
    def fixed(self) -> bool:
        return self.length > 0


def _new_field(fid: int, raw: str, prev_delim: str) -> Field:
    if raw == "":
        return Field(fid, "", SKIP)
    m = _SUFFIX_RE.match(raw)
    if m is None:
        raise DissectError(f"empty key in %{{{raw}}}")
    key, ordinal, length, greedy, dtype = m.groups()
    if raw.endswith("|"):
        raise DissectError("missing data type")
    if dtype and dtype not in _DATA_TYPES:
        raise DissectError(f"invalid data type {dtype!r}")
    ordinal = int(ordinal) if ordinal else 0
    length = int(length) if length else 0
    greedy = bool(greedy)
    dtype = dtype or ""
    if key.startswith("+&") or key.startswith("&+"):
        raise DissectError("mixed prefix `&+`/`+&`")
    if key.startswith("?"):
        return Field(fid, key[1:], NAMED_SKIP, length=length)
    if key.startswith("*"):
        return Field(fid, key[1:], POINTER, length=length)
    if key.startswith("+"):
        join = prev_delim if prev_delim else DEFAULT_JOIN
        return Field(fid, key[1:], APPEND, ordinal=ordinal, length=length,
                     greedy=greedy, join=join)
    if key.startswith("&"):
        return Field(fid, key[1:], INDIRECT, length=length, dtype=dtype)
    return Field(fid, key, NORMAL, ordinal=ordinal, length=length,
                 greedy=greedy, dtype=dtype)


def convert_value(dtype: str, value: str):
    """Type conversion with the reference's semantics: trailing spaces
    stripped; on parse failure the raw string is returned unchanged."""
    v = value.rstrip(" ")
    try:
        if dtype in ("long", "integer"):
            if v.lower().startswith(("0x", "-0x", "+0x")):
                n = int(v, 16)
            else:
                n = int(v, 10)
            bits = 64 if dtype == "long" else 32
            lim = 1 << (bits - 1)
            if not (-lim <= n < lim):
                # Go strconv.ParseInt range error -> conversion failure
                return value
            return n
        if dtype in ("float", "double"):
            return float(v)
        if dtype == "boolean":
            if v in ("1", "t", "T", "TRUE", "true", "True"):
                return True
            if v in ("0", "f", "F", "FALSE", "false", "False"):
                return False
            return value
        if dtype == "ip":
            import ipaddress
            try:
                ipaddress.ip_address(v)
                return v
            except ValueError:
                return ""  # reference returns "" for invalid IP
        return v  # "string"
    except (ValueError, OverflowError):
        return value


class Dissector:
    """Compiled dissect tokenizer.

    ``dissect(s)`` returns a dict of extracted string values (raising
    :class:`DissectParseError` on failure) — exact reference semantics.
    ``dissect_column(arr)`` runs the vectorized path over a pyarrow
    StringArray and returns ``(dict[key -> pa.Array], ok_mask)``.
    """

    def __init__(self, tokenizer: str, trim_values: str = "none",
                 trim_chars: str = " "):
        self.raw = tokenizer
        matches = list(_TOKEN_RE.finditer(tokenizer))
        if not matches:
            raise DissectError("invalid dissect tokenizer")
        self.delims: list[str] = []
        self.fields: list[Field] = []  # tokenizer order (id order)
        pos = 0
        for i, m in enumerate(matches):
            d = m.group(1)
            self.delims.append(d)
            self.fields.append(_new_field(i, m.group(2), d))
            pos = m.end()
        if pos < len(tokenizer):
            self.delims.append(tokenizer[pos:])
        # ordinal-stable sort (reference uses a small-slice sort that is
        # stable in practice for the sizes involved)
        self.sorted_fields = sorted(self.fields, key=lambda f: f.ordinal)
        self.reference_fields = [f for f in self.sorted_fields if not f.saveable]
        if not any(f.saveable for f in self.fields):
            raise DissectError("tokenizer requires at least one saveable field")
        self.has_types = any(f.dtype for f in self.fields)
        self.trim_left = trim_values in ("left", "all")
        self.trim_right = trim_values in ("right", "all")
        self.trim_chars = trim_chars
        self._regex = self._compile_regex()

    # ------------------------------------------------------------------ row
    def _extract(self, s: str) -> list[tuple[int, int]]:
        if len(s) == 0:
            raise DissectParseError("empty string")
        delims, fields = self.delims, self.fields
        n = len(fields)
        d0 = delims[0]
        if d0 and not s.startswith(d0):
            raise DissectParseError("beginning delimiter not found")
        offset = len(d0)
        positions = [(0, 0)] * n
        i = 0
        while i + 1 < len(delims):
            fld = fields[i]
            nxt = delims[i + 1]
            start = offset
            if fld.fixed:
                end = offset + fld.length
                if end > len(s):
                    raise DissectParseError("fixed-length field overruns input")
            else:
                end = s.find(nxt, offset)
                if end == -1:
                    raise DissectParseError(f"delimiter {nxt!r} not found")
            offset = end
            if fld.greedy:
                while True:
                    look = s.find(nxt, offset + 1)
                    if look != offset + 1:
                        break
                    offset = look
            positions[i] = (start, end)
            offset += len(nxt)
            i += 1
        if i < n:
            fld = fields[i]
            if fld.fixed and offset + fld.length != len(s):
                raise DissectParseError("last fixed-length field does not fit")
            if offset < len(s):
                positions[i] = (offset, len(s))
        else:
            # reference quirk: when the tokenizer ends with a literal the
            # final bounds check consults the first *sorted* field
            fld = self.sorted_fields[0]
            if fld.fixed and offset + fld.length != len(s):
                raise DissectParseError("last fixed-length field does not fit")
        return positions

    def _trim_span(self, s: str, a: int, b: int) -> tuple[int, int]:
        if self.trim_left:
            while a < b and s[a] in self.trim_chars:
                a += 1
        if self.trim_right:
            while a < b and s[b - 1] in self.trim_chars:
                b -= 1
        return a, b

    def dissect(self, s: str) -> dict[str, str]:
        """String-mode extraction (no type conversion); trims apply."""
        positions = self._extract(s)
        if self.trim_left or self.trim_right:
            positions = [self._trim_span(s, a, b) for a, b in positions]
        return self._resolve(s, positions)

    def _resolve(self, s: str, positions) -> dict[str, str]:
        m: dict[str, str] = {}
        for f in self.sorted_fields:
            a, b = positions[f.id]
            val = s[a:b]
            if f.kind in (NORMAL, NAMED_SKIP, POINTER):
                m[f.key] = val
            elif f.kind == INDIRECT:
                if f.key in m:
                    m[m[f.key]] = val
            elif f.kind == APPEND:
                if f.key in m:
                    m[f.key] = m[f.key] + f.join + val
                else:
                    m[f.key] = val
        for f in self.reference_fields:
            m.pop(f.key, None)
        return m

    def dissect_convert(self, s: str) -> dict[str, object]:
        """Typed extraction (reference ``DissectConvert``: no trimming)."""
        positions = self._extract(s)
        lookup: dict[str, str] = {}
        m: dict[str, str] = {}
        mc: dict[str, object] = {}
        for f in self.sorted_fields:
            a, b = positions[f.id]
            val = s[a:b]
            # string-map Apply (mirrors resolve)
            if f.kind in (NORMAL, NAMED_SKIP, POINTER):
                m[f.key] = val
            elif f.kind == INDIRECT:
                if f.key in m:
                    m[m[f.key]] = val
            elif f.kind == APPEND:
                m[f.key] = (m[f.key] + f.join + val) if f.key in m else val
            if not f.saveable:
                lookup[f.key] = val
            else:
                key = lookup.get(f.key, f.key)
                v = m.get(key, "")
                mc[key] = convert_value(f.dtype, v) if f.dtype else v
        for f in self.reference_fields:
            mc.pop(f.key, None)
        return mc

    # ----------------------------------------------------------- vectorized
    def _compile_regex(self) -> str | None:
        """Translate the delimiter chain to one anchored RE2 pattern, or
        return None when the tokenizer needs the row loop."""
        for f in self.fields:
            if f.fixed:
                return None  # reference skips delimiter verification here
            if f.kind in (NAMED_SKIP, POINTER, INDIRECT):
                return None  # row-dependent output keys
            if f.greedy:
                nxt = self.delims[f.id + 1] if f.id + 1 < len(self.delims) else ""
                if len(nxt) != 1:
                    return None  # greedy run semantics are per-char
        n = len(self.fields)
        parts = ["^", re.escape(self.delims[0])]
        for i, f in enumerate(self.fields):
            has_next = i + 1 < len(self.delims)
            if has_next:
                nxt = self.delims[i + 1]
                if f.greedy and len(nxt) == 1:
                    parts.append(f"(?P<g{i}>.*?)")
                    parts.append(f"(?:{re.escape(nxt)})+")
                elif i == n - 1 and len(self.delims) == n + 1:
                    # trailing literal: leftmost match, remainder dropped
                    parts.append(f"(?P<g{i}>.*?)")
                    parts.append(re.escape(nxt))
                    parts.append("(?s:.*)")
                else:
                    parts.append(f"(?P<g{i}>.*?)")
                    parts.append(re.escape(nxt))
            else:
                parts.append(f"(?P<g{i}>.*)")
        parts.append("$")
        pattern = "(?s)" + "".join(parts)
        try:
            re.compile(pattern)
        except re.error:  # pragma: no cover
            return None
        return pattern

    @property
    def vectorized(self) -> bool:
        return self._regex is not None

    def output_keys(self) -> list[str]:
        """Static output key list (vectorizable tokenizers only)."""
        keys: list[str] = []
        for f in self.sorted_fields:
            if f.kind in (NORMAL, APPEND) and f.key not in keys:
                keys.append(f.key)
        return keys

    def dissect_column(self, arr: pa.Array):
        """Vectorized extraction over a string array.

        Returns ``(values, ok)`` where ``values`` maps each output key to a
        ``pa.Array`` (null on unmatched rows) and ``ok`` is a BooleanArray of
        per-row success. Uses ``pc.extract_regex`` when the pattern allows,
        else a python row loop (still batch-at-a-time).
        """
        if isinstance(arr, pa.ChunkedArray):
            arr = arr.combine_chunks()
        if self._regex is not None:
            return self._dissect_column_regex(arr)
        return self._dissect_column_rows(arr)

    def _dissect_column_regex(self, arr: pa.Array):
        struct = pc.extract_regex(arr, self._regex)
        ok = pc.is_valid(struct)
        # empty input strings are a parse failure in the reference even when
        # the regex would accept them
        ok = pc.and_(ok, pc.not_equal(pc.coalesce(arr, ""), ""))
        groups = {f"g{i}": struct.field(f"g{i}") for i in range(len(self.fields))}
        if self.trim_left or self.trim_right:
            tchars = self.trim_chars
            for k, v in groups.items():
                if self.trim_left and self.trim_right:
                    groups[k] = pc.utf8_trim(v, tchars)
                elif self.trim_left:
                    groups[k] = pc.utf8_ltrim(v, tchars)
                else:
                    groups[k] = pc.utf8_rtrim(v, tchars)
        values: dict[str, pa.Array] = {}
        for f in self.sorted_fields:
            if f.kind == SKIP:
                continue
            col = groups[f"g{f.id}"]
            if f.key in values:  # APPEND continuation
                values[f.key] = pc.binary_join_element_wise(
                    values[f.key], col, f.join)
            else:
                values[f.key] = col
        # null-out values on failed rows (extract_regex already yields null
        # for unmatched; the empty-string adjustment may need masking)
        for k, v in values.items():
            values[k] = pc.if_else(ok, v, pa.nulls(len(arr), pa.string()))
        if self.has_types:
            values = {k: self._convert_column(k, v) for k, v in values.items()}
        return values, ok

    def _convert_column(self, key: str, col: pa.Array) -> pa.Array:
        dtype = next((f.dtype for f in self.fields if f.key == key and f.dtype), "")
        if not dtype:
            return col
        v = pc.utf8_rtrim(col, " ")
        if dtype == "ip":
            # reference: invalid IPs become "" (convert_value); keep the
            # vectorized path consistent with row mode
            import ipaddress
            out = []
            for s in v.to_pylist():
                if s is None:
                    out.append(None)
                    continue
                try:
                    ipaddress.ip_address(s)
                    out.append(s)
                except ValueError:
                    out.append("")
            return pa.array(out, pa.string())
        try:
            if dtype in ("long", "integer"):
                return pc.cast(v, pa.int64() if dtype == "long" else pa.int32())
            if dtype in ("float", "double"):
                return pc.cast(v, pa.float64() if dtype == "double" else pa.float32())
            if dtype == "boolean":
                return pc.cast(v, pa.bool_())
            return v
        except pa.ArrowInvalid:
            # divergence from reference (which falls back per-row to the raw
            # string): a typed Arrow column cannot hold mixed types, so rows
            # that fail conversion become null
            target = {"long": pa.int64(), "integer": pa.int32(),
                      "float": pa.float32(), "double": pa.float64(),
                      "boolean": pa.bool_()}[dtype]
            import numpy as np
            out = []
            for s in v.to_pylist():
                if s is None:
                    out.append(None)
                    continue
                val = convert_value(dtype, s)
                out.append(val if not isinstance(val, str) else None)
            return pa.array(out, type=target)

    def _dissect_column_rows(self, arr: pa.Array):
        keys = self.output_keys()
        if self.has_types:
            fn = self.dissect_convert
        else:
            fn = self.dissect
        dtypes = {f.key: f.dtype for f in self.fields if f.dtype}
        cols: dict[str, list] = {k: [] for k in keys}
        oks: list[bool] = []
        for s in arr.to_pylist():
            if s is None:
                oks.append(False)
                for k in keys:
                    cols[k].append(None)
                continue
            try:
                d = fn(s)
            except DissectParseError:
                oks.append(False)
                for k in keys:
                    cols[k].append(None)
                continue
            oks.append(True)
            for k in keys:
                v = d.get(k)
                # a typed key whose conversion failed comes back as the
                # raw string (reference behavior); an Arrow column cannot
                # mix types, so those rows become null (same documented
                # narrowing as the vectorized path)
                if k in dtypes and isinstance(v, str) and \
                        dtypes[k] not in ("string", "ip"):
                    v = None
                cols[k].append(v)
        type_map = {"long": pa.int64(), "integer": pa.int32(),
                    "float": pa.float32(), "double": pa.float64(),
                    "boolean": pa.bool_()}
        values = {k: pa.array(v, type=type_map.get(dtypes.get(k, ""),
                                                   pa.string()))
                  for k, v in cols.items()}
        return values, pa.array(oks, type=pa.bool_())
