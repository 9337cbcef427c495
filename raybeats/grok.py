"""Grok pattern engine: ``%{SYNTAX:semantic:type}`` named-pattern
references expanded into ONE compiled regex, applied vectorized.

The public grok syntax (Logstash / Elasticsearch ingest — the regex
companion to the dissect tokenizer the flagship pipeline already runs;
reference parity target: the same parse→fields contract as
``raybeats/dissect.py``, on delimiter-free formats dissect cannot
express). The base pattern set below follows the public
logstash-patterns-core *semantics* (WORD, NUMBER, TIMESTAMP_ISO8601, …)
but every regex is written here independently, RE2-safe (no
backreferences, no lookaround) and with ONLY non-capturing groups
inside, so:

* the same pattern string runs IDENTICALLY on Arrow's
  ``pc.extract_regex`` (RE2), DuckDB's regexp functions (RE2) and
  Python ``re`` — the engine and its SQL oracle share one regex;
* capture-group numbering is exactly the named fields in reference
  order, so a SQL mirror can extract by group index
  (:attr:`GrokParser.sql_groups`).

Scale shape: compilation happens once per actor (``__init__`` of the
processor / callable class), the per-batch path is one C-level
``extract_regex`` pass plus one cast per typed field — no Python in
the row loop.
"""

from __future__ import annotations

import re

import pyarrow as pa
import pyarrow.compute as pc

from .errors import ConfigError

# Every entry uses only non-capturing groups — a capturing paren here
# would silently shift the sql group indexes. Guarded by a test.
BASE_PATTERNS: dict[str, str] = {
    "USERNAME": r"[a-zA-Z0-9._-]+",
    "USER": r"%{USERNAME}",
    "INT": r"[+-]?[0-9]+",
    "POSINT": r"\b[1-9][0-9]*\b",
    "NONNEGINT": r"\b[0-9]+\b",
    "BASE10NUM": r"[+-]?(?:[0-9]+(?:\.[0-9]+)?|\.[0-9]+)",
    "NUMBER": r"%{BASE10NUM}",
    "BASE16NUM": r"(?:0[xX])?[0-9a-fA-F]+",
    "WORD": r"\b\w+\b",
    "NOTSPACE": r"\S+",
    "SPACE": r"\s*",
    "DATA": r".*?",
    "GREEDYDATA": r".*",
    # simplified vs logstash-core: no backslash-escape handling inside
    # the quotes (RE2-safe; the full grammar needs alternation on \\.)
    "QUOTEDSTRING": r"\"[^\"]*\"",
    "UUID": r"[A-Fa-f0-9]{8}-(?:[A-Fa-f0-9]{4}-){3}[A-Fa-f0-9]{12}",
    "IPV4": (r"(?:(?:25[0-5]|2[0-4][0-9]|1[0-9]{2}|[1-9]?[0-9])\.){3}"
             r"(?:25[0-5]|2[0-4][0-9]|1[0-9]{2}|[1-9]?[0-9])"),
    "IP": r"%{IPV4}",
    "HOSTNAME": (r"\b(?:[0-9A-Za-z][0-9A-Za-z-]{0,62})"
                 r"(?:\.(?:[0-9A-Za-z][0-9A-Za-z-]{0,62}))*\.?\b"),
    "YEAR": r"(?:\d\d){1,2}",
    "MONTHNUM": r"(?:0[1-9]|1[0-2])",
    "MONTHDAY": r"(?:0[1-9]|[12][0-9]|3[01]|[1-9])",
    "HOUR": r"(?:2[0123]|[01]?[0-9])",
    "MINUTE": r"[0-5][0-9]",
    "SECOND": r"(?:[0-5][0-9]|60)(?:[:.,][0-9]+)?",
    "TIME": r"%{HOUR}:%{MINUTE}(?::%{SECOND})?",
    "ISO8601_TIMEZONE": r"(?:Z|[+-]%{HOUR}(?::?%{MINUTE}))",
    "TIMESTAMP_ISO8601": (r"%{YEAR}-%{MONTHNUM}-%{MONTHDAY}[T ]"
                          r"%{HOUR}:?%{MINUTE}(?::?%{SECOND})?"
                          r"%{ISO8601_TIMEZONE}?"),
    "LOGLEVEL": (r"(?:[Aa]lert|ALERT|[Tt]race|TRACE|[Dd]ebug|DEBUG|"
                 r"[Nn]otice|NOTICE|[Ii]nfo|INFO|[Ww]arn(?:ing)?|"
                 r"WARN(?:ING)?|[Ee]rr(?:or)?|ERR(?:OR)?|"
                 r"[Cc]rit(?:ical)?|CRIT(?:ICAL)?|[Ff]atal|FATAL|"
                 r"[Ss]evere|SEVERE|[Ee]merg(?:ency)?|EMERG(?:ENCY)?)"),
    "URIPATH": r"(?:/[A-Za-z0-9$.+!*'(){},~:;=@#%_\-]*)+",
    "PROG": r"[A-Za-z0-9._/-]+",
    # carries its own field names like the public pattern
    "SYSLOGPROG": r"%{PROG:program}(?:\[%{POSINT:pid:int}\])?",
    "SYSLOGTIMESTAMP": r"%{MONTH} +%{MONTHDAY} %{TIME}",
    "SYSLOGLINE": (r"%{SYSLOGTIMESTAMP:timestamp} "
                   r"%{HOSTNAME:logsource} %{SYSLOGPROG}: "
                   r"%{GREEDYDATA:message}"),
    "MONTH": (r"\b(?:Jan(?:uary)?|Feb(?:ruary)?|Mar(?:ch)?|"
              r"Apr(?:il)?|May|Jun(?:e)?|Jul(?:y)?|Aug(?:ust)?|"
              r"Sep(?:tember)?|Oct(?:ober)?|Nov(?:ember)?|"
              r"Dec(?:ember)?)\b"),
    "HTTPDATE": r"%{MONTHDAY}/%{MONTH}/%{YEAR}:%{TIME} %{INT}",
    "IPORHOST": r"(?:%{IP}|%{HOSTNAME})",
    # carries its own semantic field names, like the public pattern —
    # referencing %{COMMONAPACHELOG} unnamed still yields them all
    "COMMONAPACHELOG": (
        r'%{IPORHOST:clientip} %{USER:ident} %{USER:auth} '
        r'\[%{HTTPDATE:timestamp}\] '
        r'"(?:%{WORD:verb} %{NOTSPACE:request}'
        r'(?: HTTP/%{NUMBER:httpversion})?|%{DATA:rawrequest})" '
        r'%{NUMBER:response:int} (?:%{NUMBER:bytes:int}|-)'),
}

_TYPES = ("int", "float")
# %{NAME}, %{NAME:field} or %{NAME:field:type}; field may be a dotted /
# bracketed event path (sanitized for the regex group name)
_REF = re.compile(r"%\{(\w+)(?::([\w.\[\]@-]+))?(?::(\w+))?\}")
_MAX_DEPTH = 16


def expand_pattern(pattern: str, defs: dict[str, str],
                   fields: list, group_names: set, depth: int = 0) -> str:
    """Expand ``%{...}`` references recursively into plain regex.

    Named references become ``(?P<gN>…)`` capture groups appended to
    ``fields`` as ``(field, group_name, type)`` in reference order;
    unnamed references become non-capturing groups. Depth-capped so a
    cyclic custom definition raises instead of recursing forever.
    """
    if depth > _MAX_DEPTH:
        raise ConfigError(
            "grok: pattern recursion exceeds %d levels — cyclic "
            "pattern_definitions?" % _MAX_DEPTH)

    def sub(m: re.Match) -> str:
        name, field, typ = m.group(1), m.group(2), m.group(3)
        if name not in defs:
            raise ConfigError(f"grok: unknown pattern %{{{name}}}")
        if typ is not None and typ not in _TYPES:
            raise ConfigError(f"grok: unsupported type {typ!r} for "
                              f"{field!r} (int|float)")
        inner = expand_pattern(defs[name], defs, fields, group_names,
                               depth + 1)
        if field is None:
            return f"(?:{inner})"
        gname = re.sub(r"\W", "_", field)
        if gname in group_names:
            raise ConfigError(f"grok: duplicate field {field!r}")
        group_names.add(gname)
        fields.append((field, gname, typ or "string"))
        return f"(?P<{gname}>{inner})"

    return _REF.sub(sub, pattern)


class GrokParser:
    """One grok pattern, compiled once; vectorized column parse.

    ``sql_groups`` maps each output field to its 1-based capture-group
    index in :attr:`regex_str` — the exact same string a DuckDB
    ``regexp_extract(text, re, idx)`` mirror uses (both engines are
    RE2, so match semantics cannot diverge).
    """

    def __init__(self, pattern: str,
                 pattern_definitions: dict[str, str] | None = None):
        defs = dict(BASE_PATTERNS)
        if pattern_definitions:
            defs.update(pattern_definitions)
        self.fields: list[tuple[str, str, str]] = []
        names: set[str] = set()
        self.regex_str = expand_pattern(pattern, defs, self.fields, names)
        try:
            compiled = re.compile(self.regex_str)
        except re.error as e:  # pragma: no cover - config error path
            raise ConfigError(f"grok: invalid expanded regex: {e}")
        # every capture group must BE a named field (library patterns
        # add no anonymous groups) — indexes need not be in field-list
        # order: a named reference to a composite pattern that itself
        # carries named fields (e.g. %{COMMONAPACHELOG:line}) opens
        # the outer group before the inner ones. A FIELD-LESS pattern
        # may contain raw capturing groups (match-only use via
        # match_substring_regex, where they are harmless).
        self.sql_groups = [(f, compiled.groupindex[g], t)
                           for f, g, t in self.fields]
        if self.fields and (compiled.groups != len(self.fields)
                            or sorted(i for _, i, _ in self.sql_groups)
                            != list(range(1, len(self.fields) + 1))):
            raise ConfigError(
                "grok: a pattern introduced an anonymous capturing "
                "group; library patterns must be non-capturing")

    def parse_column(self, arr) -> tuple[dict[str, pa.Array], pa.Array]:
        """→ ({field: array (typed, null on no-match)}, ok bool array)."""
        if isinstance(arr, pa.ChunkedArray):
            arr = arr.combine_chunks()
        if not self.fields:
            ok = pc.fill_null(
                pc.match_substring_regex(arr, self.regex_str), False)
            return {}, ok
        ex = pc.extract_regex(arr, self.regex_str)
        ok = pc.is_valid(ex)
        out: dict[str, pa.Array] = {}
        for field, gname, typ in self.fields:
            col = pc.struct_field(ex, gname)
            if typ in ("int", "float"):
                # an OPTIONAL group that did not participate in a
                # matched row extracts as '' (both RE2 engines) — a
                # numeric pattern can never match empty, so '' maps to
                # NULL, mirroring the oracle's NULLIF(..., '') cast.
                # Arrow's string→int64 also rejects the leading '+'
                # the INT pattern (and DuckDB's CAST) accept — strip.
                col = pc.if_else(pc.equal(col, ""),
                                 pa.scalar(None, pa.string()), col)
            if typ == "int":
                col = pc.replace_substring_regex(col, r"^\+", "")
                # NUMBER:int can match '12.5'; DuckDB's CAST rounds
                # half-away while Arrow's string→int64 raises — route
                # dotted values through float64 + the same rounding,
                # undotted values through the exact direct cast
                dotted = pc.fill_null(
                    pc.match_substring(col, "."), False)
                if pc.any(dotted).as_py():
                    via_float = pc.cast(pc.round(
                        pc.cast(col, pa.float64()),
                        round_mode="half_towards_infinity"), pa.int64())
                    direct = pc.cast(pc.if_else(
                        dotted, pa.scalar("0", pa.string()), col),
                        pa.int64())
                    col = pc.if_else(dotted, via_float, direct)
                else:
                    col = pc.cast(col, pa.int64())
            elif typ == "float":
                col = pc.cast(col, pa.float64())
            out[field] = col
        return out, ok


class MultiGrok:
    """First-match-wins over an ordered pattern list (the ES ingest
    ``patterns: [...]`` contract): the FIRST pattern that matches a row
    determines every output field for that row; fields of losing
    patterns stay null even when they would match. Output columns are
    the union of all patterns' fields, in first-seen order."""

    def __init__(self, patterns: list[str],
                 pattern_definitions: dict[str, str] | None = None):
        if not patterns:
            raise ConfigError("grok: empty pattern list")
        self.parsers = [GrokParser(p, pattern_definitions)
                        for p in patterns]
        self.out_fields: list[tuple[str, str]] = []
        seen: dict[str, str] = {}
        for p in self.parsers:
            for field, _g, typ in p.fields:
                if field in seen:
                    if seen[field] != typ:
                        raise ConfigError(
                            f"grok: field {field!r} typed differently "
                            f"across patterns")
                else:
                    seen[field] = typ
                    self.out_fields.append((field, typ))

    def parse_column(self, arr) -> tuple[dict[str, pa.Array], pa.Array]:
        if isinstance(arr, pa.ChunkedArray):
            arr = arr.combine_chunks()
        per = [p.parse_column(arr) for p in self.parsers]
        # winner i = matched AND no earlier pattern matched
        taken = None
        winner_masks = []
        for _, ok in per:
            win = ok if taken is None else pc.and_(ok, pc.invert(taken))
            winner_masks.append(win)
            taken = ok if taken is None else pc.or_(taken, ok)
        out: dict[str, pa.Array] = {}
        for field, typ in self.out_fields:
            acc = pa.nulls(len(arr),
                           pa.int64() if typ == "int"
                           else pa.float64() if typ == "float"
                           else pa.string())
            # reverse order so earlier patterns overwrite later ones
            for (vals, _ok), win in zip(reversed(per),
                                        reversed(winner_masks)):
                if field in vals:
                    acc = pc.if_else(win, vals[field], acc)
            out[field] = acc
        return out, taken
