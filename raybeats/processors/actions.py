"""Stateless action processors (reference: ``libbeat/processors/actions/``).

All are pure Arrow-compute column transforms; none iterates rows in the hot
path except the few whose semantics require a python codec (base64, gzip,
csv), which operate batch-at-a-time on the single affected column.

``fail_on_error`` is accepted on every processor for config parity with
the reference, but a vectorized batch engine cannot abort per event: the
uniform behavior here is per-row null + ``log_flags`` entry (the
reference's publisher-pipeline "log and continue" mode).
"""

from __future__ import annotations

import base64
import binascii
import gzip as gzip_mod
import urllib.parse

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..errors import ConfigError
from ..model import META_COLUMNS, META_DEAD_LETTER, META_ID
from . import (Processor, add_flag, const_column, flatten_config_map,
               get_column, register, set_column)


@register("add_fields")
class AddFields(Processor):
    """Deep-merge a constant map under ``target`` (default ``fields``);
    nested maps become dotted column names. Reference:
    ``actions/add_fields.go:74-109``."""

    def __init__(self, fields: dict, target: str = "fields"):
        prefix = f"{target}." if target else ""
        self.values = flatten_config_map(fields, prefix)

    def apply(self, tbl: pa.Table) -> pa.Table:
        for k, v in self.values.items():
            tbl = set_column(tbl, k, const_column(tbl.num_rows, v))
        return tbl


@register("add_labels")
class AddLabels(AddFields):
    """``add_fields`` specialization: flattened under ``labels``
    (``actions/add_labels.go``)."""

    def __init__(self, labels: dict):
        super().__init__(fields=labels, target="labels")


@register("add_tags")
class AddTags(Processor):
    """Append a string list to the ``tags`` list column (dedup union,
    ``actions/add_tags.go`` / ``common.AddTagsWithKey``)."""

    def __init__(self, tags: list[str], target: str = "tags"):
        self.tags = [str(t) for t in tags]
        self.target = target

    def apply(self, tbl: pa.Table) -> pa.Table:
        cur = get_column(tbl, self.target)
        n = tbl.num_rows
        if cur is None:
            arr = pa.array([self.tags] * n, pa.list_(pa.string()))
        else:
            # small-list merge; tags columns are tiny
            merged = []
            for row in cur.to_pylist():
                row = list(row or [])
                row.extend(t for t in self.tags if t not in row)
                merged.append(row)
            arr = pa.array(merged, pa.list_(pa.string()))
        return set_column(tbl, self.target, arr)


@register("copy_fields")
class CopyFields(Processor):
    """Copy ``from``→``to`` pairs (``actions/copy_fields.go``)."""

    def __init__(self, fields: list[dict], fail_on_error: bool = True,
                 ignore_missing: bool = False):
        self.pairs = [(f["from"], f["to"]) for f in fields]
        self.fail_on_error = fail_on_error
        self.ignore_missing = ignore_missing

    def apply(self, tbl: pa.Table) -> pa.Table:
        for src, dst in self.pairs:
            col = get_column(tbl, src)
            if col is None:
                if self.ignore_missing or not self.fail_on_error:
                    continue
                raise ConfigError(f"copy_fields: missing {src!r}")
            if dst in tbl.column_names:
                # reference never overwrites an existing target
                # (actions/copy_fields.go:94-96): error when
                # fail_on_error, else leave the event unchanged
                if self.fail_on_error:
                    raise ConfigError(f"copy_fields: target {dst!r} exists")
                continue
            tbl = set_column(tbl, dst, col)
        return tbl


@register("rename")
class Rename(Processor):
    """Move fields; fails if target exists (``actions/rename.go``)."""

    def __init__(self, fields: list[dict], fail_on_error: bool = True,
                 ignore_missing: bool = False):
        self.pairs = [(f["from"], f["to"]) for f in fields]
        self.fail_on_error = fail_on_error
        self.ignore_missing = ignore_missing

    def apply(self, tbl: pa.Table) -> pa.Table:
        for src, dst in self.pairs:
            col = get_column(tbl, src)
            if col is None:
                if self.ignore_missing or not self.fail_on_error:
                    continue
                raise ConfigError(f"rename: missing {src!r}")
            if dst in tbl.column_names:
                if self.fail_on_error:
                    raise ConfigError(f"rename: target {dst!r} exists")
                continue
            tbl = set_column(tbl.drop_columns([src]), dst, col)
        return tbl


@register("replace")
class Replace(Processor):
    """Regex replace per field (``actions/replace.go``); fully vectorized
    via ``pc.replace_substring_regex``."""

    def __init__(self, fields: list[dict], fail_on_error: bool = True,
                 ignore_missing: bool = False):
        self.rules = [(f["field"], f["pattern"], f["replacement"])
                      for f in fields]
        self.ignore_missing = ignore_missing
        self.fail_on_error = fail_on_error

    def apply(self, tbl: pa.Table) -> pa.Table:
        for field, pat, rep in self.rules:
            col = get_column(tbl, field)
            if col is None:
                if self.ignore_missing or not self.fail_on_error:
                    continue
                raise ConfigError(f"replace: missing {field!r}")
            tbl = set_column(tbl, field,
                             pc.replace_substring_regex(col, pat, rep))
        return tbl


@register("truncate_fields")
class TruncateFields(Processor):
    """Truncate to ``max_characters`` (codepoints) or ``max_bytes``
    (``actions/truncate_fields.go``). Byte mode slices on UTF-8 boundaries
    (≤ max_bytes), a safe narrowing of the reference's raw byte cut."""

    def __init__(self, fields: list[str], max_characters: int = 0,
                 max_bytes: int = 0, fail_on_error: bool = True,
                 ignore_missing: bool = False):
        if bool(max_characters) == bool(max_bytes):
            raise ConfigError("truncate_fields: exactly one of "
                              "max_characters/max_bytes")
        self.fields = fields
        self.max_characters = max_characters
        self.max_bytes = max_bytes
        self.ignore_missing = ignore_missing

    def apply(self, tbl: pa.Table) -> pa.Table:
        for f in self.fields:
            col = get_column(tbl, f)
            if col is None:
                if self.ignore_missing:
                    continue
                raise ConfigError(f"truncate_fields: missing {f!r}")
            if self.max_characters:
                out = pc.utf8_slice_codeunits(col, 0, self.max_characters)
            else:
                lens = pc.binary_length(col)  # bytes for string arrays
                over = pc.fill_null(pc.greater(lens, self.max_bytes), False)
                if pc.any(over).as_py():
                    vals = col.to_pylist()
                    vals = [v if v is None or len(v.encode()) <= self.max_bytes
                            else v.encode()[:self.max_bytes].decode("utf-8", "ignore")
                            for v in vals]
                    out = pa.array(vals, pa.string())
                else:
                    out = col
            tbl = set_column(tbl, f, out)
        return tbl


@register("drop_fields")
class DropFields(Processor):
    """Delete listed fields (``actions/drop_fields.go``); silently keeps
    mandatory fields like the reference protects ``type``."""

    MANDATORY = {"ts", "conv_id", "turn_idx"}

    def __init__(self, fields: list[str], ignore_missing: bool = True):
        self.fields = [f for f in fields if f not in self.MANDATORY]
        self.ignore_missing = ignore_missing

    def apply(self, tbl: pa.Table) -> pa.Table:
        present = [f for f in self.fields if f in tbl.column_names]
        if not self.ignore_missing and len(present) != len(self.fields):
            missing = set(self.fields) - set(present)
            raise ConfigError(f"drop_fields: missing {missing}")
        return tbl.drop_columns(present) if present else tbl


@register("include_fields")
class IncludeFields(Processor):
    """Keep-list projection; always keeps the timestamp and meta columns
    (``actions/include_fields.go`` always keeps ``@timestamp``+``type``)."""

    ALWAYS = ("ts", "conv_id", "turn_idx")

    def __init__(self, fields: list[str]):
        self.fields = list(fields)

    def apply(self, tbl: pa.Table) -> pa.Table:
        keep = [c for c in tbl.column_names
                if c in self.fields or c in self.ALWAYS or c in META_COLUMNS]
        return tbl.select(keep)


@register("drop_event")
class DropEvent(Processor):
    """Unconditional drop — meaningful only with ``when``
    (``actions/drop_event.go``)."""

    row_filter = True

    def __init__(self):
        pass

    def apply(self, tbl: pa.Table) -> pa.Table:
        return tbl.slice(0, 0)

    def apply_masked(self, tbl: pa.Table, mask) -> pa.Table:
        return tbl.filter(pc.invert(pc.fill_null(mask, False)))


@register("decode_base64_field")
class DecodeBase64Field(Processor):
    """Base64-decode ``field.from`` → ``field.to``
    (``actions/decode_base64_field.go``)."""

    def __init__(self, field: dict, ignore_missing: bool = False,
                 fail_on_error: bool = True):
        self.src, self.dst = field["from"], field["to"]
        self.ignore_missing = ignore_missing

    def apply(self, tbl: pa.Table) -> pa.Table:
        col = get_column(tbl, self.src)
        if col is None:
            if self.ignore_missing:
                return tbl
            raise ConfigError(f"decode_base64_field: missing {self.src!r}")
        out, bad = [], []
        for v in col.to_pylist():
            if v is None:
                out.append(None)
                bad.append(False)
                continue
            try:
                out.append(base64.b64decode(v, validate=True).decode("utf-8"))
                bad.append(False)
            except (binascii.Error, UnicodeDecodeError, ValueError):
                out.append(None)
                bad.append(True)
        tbl = set_column(tbl, self.dst, pa.array(out, pa.string()))
        return add_flag(tbl, pa.array(bad, pa.bool_()), "decode_base64_error")


@register("decompress_gzip_field")
class DecompressGzipField(Processor):
    """Gunzip ``field.from`` bytes → ``field.to``
    (``actions/decompress_gzip_field.go``)."""

    def __init__(self, field: dict, ignore_missing: bool = False,
                 fail_on_error: bool = True):
        self.src, self.dst = field["from"], field["to"]
        self.ignore_missing = ignore_missing

    def apply(self, tbl: pa.Table) -> pa.Table:
        col = get_column(tbl, self.src)
        if col is None:
            if self.ignore_missing:
                return tbl
            raise ConfigError(f"decompress_gzip_field: missing {self.src!r}")
        out, bad = [], []
        for v in col.to_pylist():
            if v is None:
                out.append(None)
                bad.append(False)
                continue
            try:
                raw = v if isinstance(v, bytes) else bytes(v)
                out.append(gzip_mod.decompress(raw).decode("utf-8"))
                bad.append(False)
            except Exception:
                out.append(None)
                bad.append(True)
        tbl = set_column(tbl, self.dst, pa.array(out, pa.string()))
        return add_flag(tbl, pa.array(bad, pa.bool_()), "decompress_gzip_error")


@register("urldecode")
class UrlDecode(Processor):
    """URL-unescape fields (``processors/urldecode/``). Only rows that
    contain ``%`` are decoded (vectorized pre-filter)."""

    def __init__(self, fields: list[dict], ignore_missing: bool = False,
                 fail_on_error: bool = True):
        self.pairs = [(f["from"], f.get("to", f["from"])) for f in fields]
        self.ignore_missing = ignore_missing

    def apply(self, tbl: pa.Table) -> pa.Table:
        for src, dst in self.pairs:
            col = get_column(tbl, src)
            if col is None:
                if self.ignore_missing:
                    continue
                raise ConfigError(f"urldecode: missing {src!r}")
            needs = pc.fill_null(
                pc.or_(pc.match_substring(col, "%"),
                       pc.match_substring(col, "+")), False)
            if pc.any(needs).as_py():
                vals = [urllib.parse.unquote_plus(v)
                        if v is not None and ("%" in v or "+" in v)
                        else v for v in col.to_pylist()]
                out = pa.array(vals, pa.string())
            else:
                out = col
            tbl = set_column(tbl, dst, out)
        return tbl


@register("extract_field")
class ExtractField(Processor):
    """Split ``field`` by ``separator``, take ``index`` → ``target``
    (``actions/extract_field.go``); vectorized split+list_element."""

    def __init__(self, field: str, separator: str, index: int, target: str,
                 ignore_missing: bool = False, fail_on_error: bool = True):
        self.field, self.sep, self.index, self.target = (
            field, separator, index, target)
        self.ignore_missing = ignore_missing

    def apply(self, tbl: pa.Table) -> pa.Table:
        col = get_column(tbl, self.field)
        if col is None:
            if self.ignore_missing:
                return tbl
            raise ConfigError(f"extract_field: missing {self.field!r}")
        parts = pc.split_pattern(col, self.sep)
        lens = pc.list_value_length(parts)
        ok = pc.fill_null(pc.greater(lens, self.index), False)
        # guard short rows: list_element raises on out-of-range
        safe = pc.if_else(ok, parts,
                          pa.array([[""] * (self.index + 1)] * tbl.num_rows,
                                   pa.list_(pa.string())))
        vals = pc.list_element(safe, self.index)
        vals = pc.if_else(ok, vals, pa.nulls(tbl.num_rows, pa.string()))
        tbl = set_column(tbl, self.target, vals)
        return add_flag(tbl, pc.invert(ok), "extract_field_error")


@register("extract_array")
class ExtractArray(Processor):
    """Map array positions to fields (``extract_array/extract_array.go``)."""

    def __init__(self, field: str, mappings: dict[str, int],
                 ignore_missing: bool = False, omit_empty: bool = False,
                 fail_on_error: bool = True):
        self.field = field
        self.mappings = dict(mappings)
        self.ignore_missing = ignore_missing

    def apply(self, tbl: pa.Table) -> pa.Table:
        col = get_column(tbl, self.field)
        if col is None:
            if self.ignore_missing:
                return tbl
            raise ConfigError(f"extract_array: missing {self.field!r}")
        # output columns typed from the list's value type so the schema is
        # data-independent (type inference on an all-null batch would
        # produce a null-typed column and break block unification)
        value_type = (col.type.value_type
                      if pa.types.is_list(col.type) else pa.string())
        rows = col.to_pylist()
        for target, idx in self.mappings.items():
            vals = [row[idx] if row is not None and len(row) > idx else None
                    for row in rows]
            tbl = set_column(tbl, target, pa.array(vals, type=value_type))
        return tbl


@register("decode_csv_fields")
class DecodeCsvFields(Processor):
    """RFC-4180 CSV parse per field → list<string> column
    (``decode_csv_fields/decode_csv_fields.go``)."""

    def __init__(self, fields: dict[str, str], separator: str = ",",
                 trim_leading_space: bool = False,
                 ignore_missing: bool = False, overwrite_keys: bool = False,
                 fail_on_error: bool = True):
        self.fields = dict(fields)
        self.sep = separator
        self.trim = trim_leading_space
        self.ignore_missing = ignore_missing

    def apply(self, tbl: pa.Table) -> pa.Table:
        import csv
        import io
        for src, dst in self.fields.items():
            col = get_column(tbl, src)
            if col is None:
                if self.ignore_missing:
                    continue
                raise ConfigError(f"decode_csv_fields: missing {src!r}")
            out, bad = [], []
            for v in col.to_pylist():
                if v is None:
                    out.append(None)
                    bad.append(False)
                    continue
                try:
                    row = next(csv.reader(io.StringIO(v),
                                          delimiter=self.sep,
                                          skipinitialspace=self.trim))
                    out.append(row)
                    bad.append(False)
                except (csv.Error, StopIteration):
                    out.append(None)
                    bad.append(True)
            tbl = set_column(tbl, dst, pa.array(out, pa.list_(pa.string())))
            tbl = add_flag(tbl, pa.array(bad, pa.bool_()), "decode_csv_error")
        return tbl


@register("add_id")
class AddId(Processor):
    """Generate a unique id per event → ``meta_id``
    (``processors/add_id/``); vectorized via random bytes per batch."""

    def __init__(self, target_field: str = META_ID, type: str = "uuid"):
        self.target = target_field

    def apply(self, tbl: pa.Table) -> pa.Table:
        n = tbl.num_rows
        raw = np.frombuffer(np.random.bytes(16 * n), dtype=np.uint8)
        hexes = raw.reshape(n, 16)
        ids = [bytes(h).hex() for h in hexes]
        return set_column(tbl, self.target, pa.array(ids, pa.string()))


@register("detect_mime_type")
class DetectMimeType(Processor):
    """Content sniff of a field → ``target``
    (``actions/detect_mime_type.go``); magic-byte heuristic."""

    # prefix magic bytes, longest-prefix-first within a first-byte group
    # (signature set mirrors the sniffing table the reference's mime
    # package wraps — libbeat/mime/{byte,string}.go via h2non/filetype)
    MAGIC = [
        (b"\x89PNG\r\n\x1a\n", "image/png"),
        (b"\x89PNG", "image/png"),
        (b"\xff\xd8\xff", "image/jpeg"),
        (b"GIF87a", "image/gif"), (b"GIF89a", "image/gif"),
        (b"BM", "image/bmp"),
        (b"II*\x00", "image/tiff"), (b"MM\x00*", "image/tiff"),
        (b"%PDF", "application/pdf"),
        (b"PK\x03\x04", "application/zip"),
        (b"Rar!\x1a\x07", "application/vnd.rar"),
        (b"7z\xbc\xaf\x27\x1c", "application/x-7z-compressed"),
        (b"\x1f\x8b", "application/gzip"),
        (b"BZh", "application/x-bzip2"),
        (b"\xfd7zXZ\x00", "application/x-xz"),
        (b"\x28\xb5\x2f\xfd", "application/zstd"),
        (b"ustar", None),  # tar magic sits at offset 257; handled below
        (b"ID3", "audio/mpeg"),
        (b"\xff\xfb", "audio/mpeg"), (b"\xff\xf3", "audio/mpeg"),
        (b"fLaC", "audio/x-flac"),
        (b"OggS", "audio/ogg"),
        (b"\x1aE\xdf\xa3", "video/x-matroska"),
        (b"\x00\x00\x00\x14ftyp", "video/mp4"),
        (b"\x00\x00\x00\x18ftyp", "video/mp4"),
        (b"\x00\x00\x00\x1cftyp", "video/mp4"),
        (b"\x00\x00\x00\x20ftyp", "video/mp4"),
        (b"wOFF", "font/woff"), (b"wOF2", "font/woff2"),
        (b"\x7fELF", "application/x-executable"),
        (b"MZ", "application/vnd.microsoft.portable-executable"),
        (b"\x00asm", "application/wasm"),
        (b"SQLite format 3\x00", "application/vnd.sqlite3"),
        (b"PAR1", "application/vnd.apache.parquet"),
    ]
    # container refinements for zip-based formats (first PK entry name)
    _ZIP_KINDS = [(b"word/", "application/vnd.openxmlformats-officedocument"
                   ".wordprocessingml.document"),
                  (b"xl/", "application/vnd.openxmlformats-officedocument"
                   ".spreadsheetml.sheet"),
                  (b"ppt/", "application/vnd.openxmlformats-officedocument"
                   ".presentationml.presentation")]

    def __init__(self, field: str, target: str):
        self.field, self.target = field, target

    def _sniff(self, v) -> str | None:
        if v is None:
            return None
        b = v.encode("utf-8", "ignore") if isinstance(v, str) else bytes(v)
        for magic, mime in self.MAGIC:
            if mime is not None and b.startswith(magic):
                if mime == "application/zip":
                    for marker, refined in self._ZIP_KINDS:
                        if marker in b[:256]:
                            return refined
                return mime
        if len(b) > 262 and b[257:262] == b"ustar":
            return "application/x-tar"
        if b[4:8] == b"ftyp":  # mp4 family with other box sizes
            return "video/mp4"
        s = b.lstrip()
        if s.startswith((b"{", b"[")):
            return "application/json"
        if s.startswith(b"<"):
            return "text/xml"
        return "text/plain"

    def apply(self, tbl: pa.Table) -> pa.Table:
        col = get_column(tbl, self.field)
        if col is None:
            return tbl
        vals = [self._sniff(v) for v in col.to_pylist()]
        return set_column(tbl, self.target, pa.array(vals, pa.string()))


def _load_psl_rules(path: str | None = None):
    """Parse the vendored public-suffix snapshot
    (``raybeats/data/public_suffix_snapshot.dat``, publicsuffix.org rule
    format) → (exact_rules, wildcard_bases, exception_rules) as sets of
    dotted strings. Loaded once per processor construction; the sets
    ship in the stage closure (broadcast, not per-batch)."""
    import os
    if path is None:
        path = os.path.join(os.path.dirname(os.path.dirname(__file__)),
                            "data", "public_suffix_snapshot.dat")
    exact, wildcard, exception = set(), set(), set()
    with open(path, encoding="utf-8") as f:
        for line in f:
            line = line.strip().lower()
            if not line or line.startswith("//"):
                continue
            if line.startswith("!"):
                exception.add(line[1:])
            elif line.startswith("*."):
                wildcard.add(line[2:])
            else:
                exact.add(line)
    return exact, wildcard, exception


@register("registered_domain")
class RegisteredDomain(Processor):
    """eTLD+1 / subdomain / eTLD of a hostname
    (``registered_domain/registered_domain.go:21-132``), implementing
    the public-suffix-list algorithm over a VENDORED snapshot of the
    public suffix database (``data/public_suffix_snapshot.dat`` —
    public data, no network at runtime; the reference links the full
    golang.org/x/net/publicsuffix table):

    * exact, ``*.``-wildcard and ``!``-exception rules; the prevailing
      match is the exception if any, else the longest rule;
    * unlisted TLDs fall to the implicit ``*`` default rule (so
      ``www.example.zz`` → ``example.zz`` like the reference);
    * a hostname that IS a public suffix has no registered domain
      (reference errors; with ``ignore_failure=true`` this engine emits
      null instead of raising).

    ``ignore_failure`` defaults false, matching the reference config
    default (``registered_domain/config.go``); the missing-field path
    passes the event through when IgnoreMissing OR IgnoreFailure is
    set, like ``registered_domain.go:79``. ``custom_suffixes`` adds
    extra rules (PSL syntax, any label count)."""

    def __init__(self, field: str, target_field: str,
                 target_subdomain_field: str | None = None,
                 target_etld_field: str | None = None,
                 ignore_missing: bool = False, ignore_failure: bool = False,
                 custom_suffixes: list[str] | None = None):
        self.field, self.target = field, target_field
        self.target_sub = target_subdomain_field
        self.target_etld = target_etld_field
        self.ignore_missing = ignore_missing
        self.ignore_failure = ignore_failure
        self.exact, self.wildcard, self.exception = _load_psl_rules()
        for s in custom_suffixes or []:
            s = s.lower().strip(".")
            if s.startswith("!"):
                self.exception.add(s[1:])
            elif s.startswith("*."):
                self.wildcard.add(s[2:])
            elif s:
                self.exact.add(s)

    def _suffix_len(self, labels: list[str]) -> int:
        """Number of labels in the prevailing public suffix (PSL
        algorithm: exception wins, else longest match, else the
        implicit ``*`` rule = 1)."""
        n = len(labels)
        best = 1  # implicit * default rule
        for i in range(n):
            s = ".".join(labels[i:])
            if s in self.exception:
                return n - i - 1  # exception: rule minus leftmost label
            if s in self.exact and n - i > best:
                best = n - i
            # wildcard *.base matches exactly one extra label
            if i + 1 <= n and ".".join(labels[i + 1:]) in self.wildcard \
                    and n - i > best:
                best = n - i
        return best

    def _split(self, host: str | None):
        """→ (registered_domain, subdomain, etld) or (None, None, None)
        when the hostname has no registered domain (bare suffix /
        single label / empty)."""
        if not host:
            return None, None, None
        h = host.lower().rstrip(".")
        if not h or "." not in h:
            return None, None, None
        labels = h.split(".")
        if any(not p for p in labels):
            return None, None, None
        ps = self._suffix_len(labels)
        if ps >= len(labels):
            return None, None, None  # hostname IS a public suffix
        etld = ".".join(labels[-ps:])
        rd = ".".join(labels[-(ps + 1):])
        sub = ".".join(labels[:-(ps + 1)]) or None
        return rd, sub, etld

    def apply(self, tbl: pa.Table) -> pa.Table:
        col = get_column(tbl, self.field)
        if col is None:
            if self.ignore_missing or self.ignore_failure:
                return tbl
            raise ConfigError(f"registered_domain: missing {self.field!r}")
        rds, subs, etlds = [], [], []
        n_bad = 0
        for v in col.to_pylist():
            rd, sub, etld = self._split(v)
            if rd is None and v:
                n_bad += 1
            rds.append(rd)
            subs.append(sub)
            etlds.append(etld)
        if n_bad and not self.ignore_failure:
            raise ValueError(
                f"registered_domain: {n_bad} value(s) have no registered "
                f"domain (ignore_failure=false)")
        tbl = set_column(tbl, self.target, pa.array(rds, pa.string()))
        if self.target_sub:
            tbl = set_column(tbl, self.target_sub,
                             pa.array(subs, pa.string()))
        if self.target_etld:
            tbl = set_column(tbl, self.target_etld,
                             pa.array(etlds, pa.string()))
        return tbl

@register("add_locale")
class AddLocale(Processor):
    """Host timezone offset (``add_locale/``); sandbox runs UTC."""

    def __init__(self, format: str = "offset"):
        pass

    def apply(self, tbl: pa.Table) -> pa.Table:
        import time
        off = -time.timezone
        sign = "+" if off >= 0 else "-"
        off = abs(off)
        val = f"{sign}{off // 3600:02d}:{(off % 3600) // 60:02d}"
        return set_column(tbl, "event.timezone",
                          const_column(tbl.num_rows, val))


@register("add_host_metadata")
class AddHostMetadata(Processor):
    """Host info snapshot → constant columns (``add_host_metadata/``);
    computed once at construction (the driver broadcast pattern)."""

    def __init__(self, netinfo_enabled: bool = False, **_):
        import platform
        import socket
        u = platform.uname()
        self.values = {
            "host.name": socket.gethostname(),
            "host.os.platform": u.system.lower(),
            "host.architecture": u.machine,
            "host.os.kernel": u.release,
        }

    def apply(self, tbl: pa.Table) -> pa.Table:
        for k, v in self.values.items():
            tbl = set_column(tbl, k, const_column(tbl.num_rows, v))
        return tbl


@register("validate")
class Validate(Processor):
    """Pre-write validation — the engine-side equivalent of the
    elasticsearch output's per-item 4xx triage
    (``elasticsearch/client.go:359-426``): rows violating constraints are
    marked ``meta_dead_letter`` (the ``Meta.deadlettered`` flag,
    ``non_indexable_policy.go:31``) so the router's dead-letter override
    re-routes them and the rewrite stage produces the
    ``{message, error.type, error.message}`` shape. Constraints:
    ``required`` fields non-null; ``max_field_bytes`` per listed field."""

    def __init__(self, required: list[str] | None = None,
                 max_field_bytes: dict[str, int] | None = None):
        self.required = list(required or [])
        self.max_bytes = dict(max_field_bytes or {})

    def apply(self, tbl: pa.Table) -> pa.Table:
        n = tbl.num_rows
        bad = pa.array([False] * n, pa.bool_())
        for f in self.required:
            col = get_column(tbl, f)
            miss = (pa.array([True] * n, pa.bool_()) if col is None
                    else pc.is_null(col))
            bad = pc.or_(bad, miss)
        for f, limit in self.max_bytes.items():
            col = get_column(tbl, f)
            if col is None:
                continue
            try:
                lens = pc.binary_length(pc.cast(col, pa.string()))
            except (pa.ArrowInvalid, pa.ArrowNotImplementedError):
                # non-string-castable (list/struct): serialized length
                lens = pa.array(
                    [None if v is None else len(str(v).encode())
                     for v in col.to_pylist()], pa.int64())
            over = pc.fill_null(pc.greater(lens, limit), False)
            bad = pc.or_(bad, over)
        prev = get_column(tbl, META_DEAD_LETTER)
        if prev is not None:
            bad = pc.or_(bad, pc.fill_null(pc.cast(prev, pa.bool_()), False))
        tbl = set_column(tbl, META_DEAD_LETTER, bad)
        return add_flag(tbl, bad, "validation_error")


@register("script")
class Script(Processor):
    """UDF escape hatch (reference: JS ``script`` processor with pooled VMs,
    ``script/javascript/session.go``). Here: a python callable
    ``process(pa.Table) -> pa.Table`` given directly or as source text."""

    def __init__(self, source: str | None = None, fn=None, lang: str = "python"):
        if fn is not None:
            self.fn = fn
        elif source:
            ns: dict = {}
            exec(compile(source, "<script processor>", "exec"), ns)
            if "process" not in ns:
                raise ConfigError("script: source must define process(table)")
            self.fn = ns["process"]
        else:
            raise ConfigError("script: need source or fn")

    def apply(self, tbl: pa.Table) -> pa.Table:
        return self.fn(tbl)
