"""Parse processors: dissect and decode_json_fields.

Dissect wrapper semantics (reference ``dissect/processor.go``): reads
``field`` (default ``message``), writes keys under ``target_prefix``
(default ``dissect``, empty = root), refuses to overwrite existing columns
unless ``overwrite_keys``, and on per-row parse failure appends
``dissect_parsing_error`` to the flags column (instead of erroring, i.e.
the ``ignore_failure`` path — a distributed batch engine cannot abort a
chain per row).
"""

from __future__ import annotations

import json

import pyarrow as pa
import pyarrow.compute as pc

from ..dissect import Dissector
from ..errors import ConfigError
from ..model import FLAG_DISSECT_ERROR, META_ID
from . import (Processor, _conform, add_flag, get_column, register,
               set_column)


@register("dissect")
class DissectProcessor(Processor):
    def __init__(self, tokenizer: str, field: str = "message",
                 target_prefix: str = "dissect",
                 overwrite_keys: bool = False, ignore_failure: bool = True,
                 trim_values: str = "none", trim_chars: str = " "):
        self.d = Dissector(tokenizer, trim_values=trim_values,
                           trim_chars=trim_chars)
        if not self.d.vectorized and any(
                f.kind in (3, 5) for f in self.d.fields):  # POINTER/INDIRECT
            raise ConfigError(
                "dissect: indirect/pointer keys produce row-dependent output "
                "columns; use the script processor for those patterns")
        self.field = field
        self.prefix = f"{target_prefix}." if target_prefix else ""
        self.overwrite = overwrite_keys

    def apply(self, tbl: pa.Table) -> pa.Table:
        col = get_column(tbl, self.field)
        if col is None:
            raise ConfigError(f"dissect: missing field {self.field!r}")
        values, ok = self.d.dissect_column(col)
        for key, arr in values.items():
            name = self.prefix + key
            if name in tbl.column_names and not self.overwrite:
                raise ConfigError(f"dissect: cannot override existing key "
                                  f"{name!r}")
            tbl = set_column(tbl, name, arr)
        return add_flag(tbl, pc.invert(ok), FLAG_DISSECT_ERROR)


@register("grok")
class GrokProcessor(Processor):
    """Named-pattern regex parse (:mod:`raybeats.grok` — the public
    ``%{SYNTAX:semantic:type}`` grammar, first-match-wins over a
    pattern list). The regex companion of :class:`DissectProcessor`
    for delimiter-free formats; one compile per actor, one C-level
    ``extract_regex`` pass per batch per pattern."""

    def __init__(self, patterns, field: str = "message",
                 target_prefix: str = "", overwrite_keys: bool = False,
                 pattern_definitions: dict | None = None,
                 anchor: bool = True):
        from ..grok import MultiGrok
        if isinstance(patterns, str):
            patterns = [patterns]
        if anchor:
            patterns = [f"^(?:{p})$" for p in patterns]
        self.g = MultiGrok(patterns, pattern_definitions)
        self.field = field
        self.prefix = f"{target_prefix}." if target_prefix else ""
        self.overwrite = overwrite_keys

    def apply(self, tbl: pa.Table) -> pa.Table:
        col = get_column(tbl, self.field)
        if col is None:
            raise ConfigError(f"grok: missing field {self.field!r}")
        values, ok = self.g.parse_column(col)
        for key, arr in values.items():
            name = self.prefix + key
            if name in tbl.column_names and not self.overwrite:
                raise ConfigError(
                    f"grok: cannot override existing key {name!r}")
            tbl = set_column(tbl, name, arr)
        return add_flag(tbl, pc.invert(ok), "grok_error")


@register("docker_json")
class DockerJson(Processor):
    """Docker / CRI-O container log framing parser
    (``libbeat/reader/readjson/docker_json.go``). Handles both formats:

    * Docker json-file: ``{"log": "...", "stream": "stdout", "time": ...}``
    * CRI: ``2019-05-07T18:57:50.904Z stdout F message``

    Extracts ``<target>.log/stream/time``; optional ``stream`` filter
    (``all``/``stdout``/``stderr``) drops non-matching rows. CRI partial
    lines (``P`` flag) are joined within a batch per the partial-join
    semantics; cross-batch partials are flagged ``docker_json_partial``
    (a distributed batch engine's documented narrowing)."""

    row_filter = True

    def __init__(self, field: str = "message", target: str = "container",
                 stream: str = "all", ignore_failure: bool = True):
        self.field = field
        self.prefix = f"{target}." if target else ""
        self.stream = stream

    def _parse_row(self, v: str | None):
        if not v:
            return None
        s = v.strip()
        if s.startswith("{"):
            try:
                obj = json.loads(s)
                return (str(obj.get("log", "")),
                        str(obj.get("stream", "")),
                        str(obj.get("time", "")), False)
            except (json.JSONDecodeError, ValueError):
                return None
        parts = v.split(" ", 3)
        if len(parts) == 4 and parts[1] in ("stdout", "stderr"):
            return (parts[3], parts[1], parts[0], parts[2] == "P")
        return None

    def apply(self, tbl: pa.Table) -> pa.Table:
        col = get_column(tbl, self.field)
        if col is None:
            raise ConfigError(f"docker_json: missing {self.field!r}")
        parsed = [self._parse_row(v) for v in col.to_pylist()]
        # join CRI partial ('P') lines onto the next FULL line of the SAME
        # stream; a trailing carry at batch end is emitted (never dropped)
        # and flagged docker_json_partial. Cross-batch/file partials are a
        # documented narrowing (batches are file-aligned in our sources).
        n = len(parsed)
        logs: list = [None] * n
        streams: list = [None] * n
        times: list = [None] * n
        bad = [False] * n
        part_flag = [False] * n
        keep = [True] * n
        carry: dict[str, tuple[str, list[int]]] = {}
        for i, p in enumerate(parsed):
            if p is None:
                bad[i] = True
                continue
            log, stream, ts, partial = p
            if partial:
                t, idxs = carry.get(stream, ("", []))
                carry[stream] = (t + log, idxs + [i])
                keep[i] = False
                continue
            pre, _ = carry.pop(stream, ("", []))
            logs[i] = pre + log
            streams[i] = stream
            times[i] = ts
        for stream, (t, idxs) in carry.items():
            i = idxs[-1]
            keep[i] = True
            logs[i] = t
            streams[i] = stream
            times[i] = parsed[i][2]
            part_flag[i] = True
        for name, vals in (("log", logs), ("stream", streams),
                           ("time", times)):
            tbl = set_column(tbl, self.prefix + name,
                             pa.array(vals, pa.string()))
        tbl = add_flag(tbl, pa.array(bad, pa.bool_()), "docker_json_error")
        tbl = add_flag(tbl, pa.array(part_flag, pa.bool_()),
                       "docker_json_partial")
        mask = pa.array(keep, pa.bool_())
        if self.stream in ("stdout", "stderr"):
            stream_col = get_column(tbl, self.prefix + "stream")
            mask = pc.and_(mask, pc.fill_null(
                pc.equal(stream_col, self.stream), True))
        return tbl.filter(mask)

    def apply_masked(self, tbl: pa.Table, mask) -> pa.Table:
        # thread a hidden index so the matched/unmatched split does not
        # permute the original row order
        idx_col = "_dj_row_idx"
        tagged = tbl.append_column(idx_col,
                                   pa.array(range(tbl.num_rows), pa.int64()))
        matched = self.apply(tagged.filter(mask))
        rest = tagged.filter(pc.invert(pc.fill_null(mask, False)))
        schema = pa.unify_schemas([matched.schema, rest.schema],
                                  promote_options="permissive")
        merged = pa.concat_tables([_conform(matched, schema),
                                   _conform(rest, schema)])
        if merged.num_rows:
            merged = merged.sort_by(idx_col)
        return merged.drop_columns([idx_col])


@register("decode_xml")
class DecodeXml(Processor):
    """Parse an XML string field into flattened dotted keys
    (``decode_xml/decode_xml.go``). Attributes become keys; repeated child
    tags collapse to their last value (static-schema narrowing: pass
    ``expected_keys`` for stable distributed schemas, like
    ``decode_json_fields``)."""

    def __init__(self, field: str = "message", target: str = "",
                 expected_keys: list[str] | None = None,
                 ignore_missing: bool = True, ignore_failure: bool = True):
        self.field = field
        self.prefix = f"{target}." if target else ""
        self.expected = list(expected_keys) if expected_keys else None
        self.ignore_missing = ignore_missing

    def _flatten(self, el, prefix: str, out: dict):
        for k, v in el.attrib.items():
            out[f"{prefix}{k}"] = v
        kids = list(el)
        if not kids:
            if el.text and el.text.strip():
                out[prefix.rstrip(".") or el.tag] = el.text.strip()
            return
        for child in kids:
            self._flatten(child, f"{prefix}{child.tag}.", out)

    def apply(self, tbl: pa.Table) -> pa.Table:
        import xml.etree.ElementTree as ET
        col = get_column(tbl, self.field)
        if col is None:
            if self.ignore_missing:
                return tbl
            raise ConfigError(f"decode_xml: missing {self.field!r}")
        rows, bad = [], []
        for v in col.to_pylist():
            if not v or not v.lstrip().startswith("<"):
                rows.append(None)
                bad.append(v is not None)
                continue
            try:
                root = ET.fromstring(v)
            except ET.ParseError:
                rows.append(None)
                bad.append(True)
                continue
            flat: dict = {}
            self._flatten(root, f"{root.tag}.", flat)
            rows.append(flat)
            bad.append(False)
        keys = self.expected
        if keys is None:
            seen: list[str] = []
            for r in rows:
                if r:
                    for k in r:
                        if k not in seen:
                            seen.append(k)
            keys = seen
        for key in keys:
            vals = [None if r is None else r.get(key) for r in rows]
            tbl = set_column(tbl, self.prefix + key,
                             pa.array(vals, pa.string()))
        return add_flag(tbl, pa.array(bad, pa.bool_()), "decode_xml_error")


@register("decode_xml_wineventlog")
class DecodeXmlWinEventLog(Processor):
    """Windows Event Log XML → ``winlog.*`` (+ ECS) columns
    (``decode_xml_wineventlog/processor.go``; field shapes from the
    reference's own test expectations, ``processor_test.go:43-105``):
    System metadata, ``event_data.*`` from ``<Data Name=..>``, rendered
    message/level/task/opcode/keywords, audit outcome from the keywords
    mask (success ``0x20000000000000`` / failure ``0x10000000000000``).
    Static-schema narrowing like ``decode_xml``: columns are the keys
    seen in the batch unless ``expected_keys`` pins them."""

    _NS = "{http://schemas.microsoft.com/win/2004/08/events/event}"
    _LEVELS = {"0": "information", "1": "critical", "2": "error",
               "3": "warning", "4": "information", "5": "verbose"}

    def __init__(self, field: str = "message", target: str = "winlog",
                 overwrite_keys: bool = True, map_ecs_fields: bool = True,
                 ignore_missing: bool = False, ignore_failure: bool = False,
                 expected_keys: list[str] | None = None):
        self.field = field
        self.prefix = f"{target}." if target else ""
        self.ecs = map_ecs_fields
        self.ignore_missing = ignore_missing
        self.ignore_failure = ignore_failure
        self.overwrite_keys = overwrite_keys
        self.expected = list(expected_keys) if expected_keys else None

    def _decode_one(self, text: str) -> dict | None:
        import xml.etree.ElementTree as ET
        try:
            root = ET.fromstring(text)
        except ET.ParseError:
            return None
        try:
            return self._map_event(root)
        except ValueError:
            # malformed numeric field (e.g. hex EventRecordID): flag the
            # ROW, never fail the whole batch task
            return None

    def _map_event(self, root) -> dict | None:
        if not root.tag.endswith("Event"):
            return None
        ns = self._NS if root.tag.startswith("{") else ""

        def find(parent, name):
            return parent.find(f"{ns}{name}") if parent is not None else None

        out: dict = {}
        system = find(root, "System")
        provider = find(system, "Provider")
        if provider is not None:
            if provider.get("Name"):
                out["provider_name"] = provider.get("Name")
            if provider.get("Guid"):
                out["provider_guid"] = provider.get("Guid")
        for tag, key in (("EventID", "event_id"), ("Channel", "channel"),
                         ("Computer", "computer_name")):
            el = find(system, tag)
            if el is not None and el.text:
                out[key] = el.text
        rec = find(system, "EventRecordID")
        if rec is not None and rec.text:
            out["record_id"] = int(rec.text)
        corr = find(system, "Correlation")
        if corr is not None and corr.get("ActivityID"):
            out["activity_id"] = corr.get("ActivityID")
        execu = find(system, "Execution")
        if execu is not None:
            if execu.get("ProcessID"):
                out["process.pid"] = int(execu.get("ProcessID"))
            if execu.get("ThreadID"):
                out["process.thread.id"] = int(execu.get("ThreadID"))
        tc = find(system, "TimeCreated")
        if tc is not None and tc.get("SystemTime"):
            out["time_created"] = tc.get("SystemTime")
        keywords_mask = None
        kw = find(system, "Keywords")
        if kw is not None and kw.text:
            try:
                keywords_mask = int(kw.text, 16)
            except ValueError:
                pass
        level_num = find(system, "Level")

        data = find(root, "EventData")
        if data is not None:
            for d in data.findall(f"{ns}Data"):
                name = d.get("Name")
                if name:
                    out[f"event_data.{name}"] = d.text or ""
        rendering = find(root, "RenderingInfo")
        if rendering is not None:
            for tag, key in (("Message", "message"), ("Task", "task"),
                             ("Opcode", "opcode")):
                el = find(rendering, tag)
                if el is not None and el.text:
                    out[key] = el.text
            lvl = find(rendering, "Level")
            if lvl is not None and lvl.text:
                out["level"] = lvl.text.lower()
            kws = find(rendering, "Keywords")
            if kws is not None:
                vals = [k.text for k in kws.findall(f"{ns}Keyword")
                        if k.text]
                if vals:
                    out["keywords"] = ",".join(vals)
        if "level" not in out and level_num is not None and level_num.text:
            out["level"] = self._LEVELS.get(level_num.text, "")
        if keywords_mask is not None:
            if keywords_mask & 0x20000000000000:
                out["outcome"] = "success"
            elif keywords_mask & 0x10000000000000:
                out["outcome"] = "failure"
        return out

    def apply(self, tbl: pa.Table) -> pa.Table:
        col = get_column(tbl, self.field)
        if col is None:
            if self.ignore_missing:
                return tbl
            raise ConfigError(
                f"decode_xml_wineventlog: missing {self.field!r}")
        rows, bad = [], []
        for v in col.to_pylist():
            if not v or not v.lstrip().startswith("<"):
                rows.append(None)
                bad.append(v is not None)
                continue
            decoded = self._decode_one(v)
            rows.append(decoded)
            bad.append(decoded is None)
        if not self.ignore_failure and any(bad):
            # reference error path: a failing decode errors the event;
            # the batch-engine abort equivalent is raising loudly (same
            # convention as Timestamp with ignore_failure=false)
            raise ValueError(
                f"decode_xml_wineventlog: {sum(bad)} value(s) failed to "
                f"decode (ignore_failure=false)")
        keys = self.expected
        if keys is None:
            seen: list[str] = []
            for r in rows:
                if r:
                    for k in r:
                        if k not in seen:
                            seen.append(k)
            keys = seen
        int_keys = {"record_id", "process.pid", "process.thread.id"}

        def put(t: pa.Table, name: str, arr) -> pa.Table:
            # overwrite_keys=false (reference config): existing event
            # columns win over decoded ones
            if not self.overwrite_keys and name in t.column_names:
                return t
            return set_column(t, name, arr)

        for key in keys:
            vals = [None if r is None else r.get(key) for r in rows]
            if key in int_keys:
                arr = pa.array(vals, pa.int64())
            elif key == "time_created":
                # strip the fraction and the trailing Z independently —
                # SystemTime may carry either, both, or neither
                cleaned = pc.replace_substring_regex(
                    pc.replace_substring_regex(
                        pa.array(vals, pa.string()), r"\.\d+", ""),
                    r"Z$", "")
                arr = pc.cast(pc.strptime(
                    cleaned, format="%Y-%m-%dT%H:%M:%S", unit="us",
                    error_is_null=True), pa.timestamp("us"))
            else:
                arr = pa.array(vals, pa.string())
            tbl = put(tbl, self.prefix + key, arr)
        if self.ecs:
            ecs_map = {"event.action": "task", "event.code": "event_id",
                       "event.outcome": "outcome",
                       "event.provider": "provider_name",
                       "host.name": "computer_name",
                       "log.level": "level", "message": "message"}
            for ecs_key, src in ecs_map.items():
                vals = [None if r is None else r.get(src) for r in rows]
                if any(v is not None for v in vals):
                    tbl = put(tbl, ecs_key, pa.array(vals, pa.string()))
            tbl = put(
                tbl, "event.kind",
                pa.array(["event" if r is not None else None
                          for r in rows], pa.string()))
        return add_flag(tbl, pa.array(bad, pa.bool_()),
                        "wineventlog_decode_error")


@register("decode_json_fields")
class DecodeJsonFields(Processor):
    """Parse JSON string field(s) (``actions/decode_json_fields.go``).

    Decoded keys are flattened to dotted names and written under ``target``
    (or the root when ``target`` is ``""``). For stable distributed schemas
    the output column set must be static per pipeline: pass
    ``expected_keys`` (list of dotted keys, optionally ``key:type`` with
    type in str/int/float/bool); keys outside the list are preserved in a
    ``<target>._raw``-free manner only if ``keep_unexpected_json`` names a
    column to hold the raw remainder. ``document_id`` extracts that key
    into ``meta_id`` and removes it from the decoded map.

    ``max_depth`` follows the reference's ``unmarshal`` semantics
    (``decode_json_fields.go:176-214``): it limits recursive re-decoding
    of nested JSON *strings* (depth 1 = top-level decode only); nested
    OBJECTS always flatten fully to dotted column names (the columnar
    image of the reference's nested event map). ``expand_keys`` de-dots
    literal dotted keys into the nested structure with deep merging
    (``jsontransform/expand.go:37-80``); a conflicting expansion (object
    vs scalar at the same path) marks the row as a decode error, like
    the reference's error event.
    """

    _TYPES = {"str": pa.string(), "int": pa.int64(), "float": pa.float64(),
              "bool": pa.bool_()}

    def __init__(self, fields: list[str], target: str = "",
                 expected_keys: list[str] | None = None,
                 max_depth: int = 1, process_array: bool = False,
                 overwrite_keys: bool = False, add_error_key: bool = False,
                 document_id: str = "", ignore_missing: bool = True,
                 expand_keys: bool = False):
        self.fields = [fields] if isinstance(fields, str) else list(fields)
        self.prefix = f"{target}." if target else ""
        self.max_depth = max_depth
        self.process_array = process_array
        self.overwrite = overwrite_keys
        self.add_error_key = add_error_key
        self.document_id = document_id
        self.ignore_missing = ignore_missing
        self.expand_keys = expand_keys
        self.expected: list[tuple[str, pa.DataType]] | None = None
        if expected_keys is not None:
            self.expected = []
            for k in expected_keys:
                if ":" in k:
                    name, t = k.rsplit(":", 1)
                    self.expected.append((name, self._TYPES[t]))
                else:
                    self.expected.append((k, pa.string()))

    def _flatten(self, obj, prefix: str, out: dict):
        for k, v in obj.items():
            key = prefix + k
            if isinstance(v, dict):
                self._flatten(v, key + ".", out)
            else:
                out[key] = v

    def _deep_decode(self, obj, depth_left: int):
        """Reference unmarshal (``decode_json_fields.go:176-214``): only
        structured JSON STRING values that are IMMEDIATE children of a
        freshly-decoded container re-decode, consuming one depth level
        each; nested objects block further re-decoding. Arrays re-decode
        only with process_array (kept as the original string otherwise)."""
        if depth_left <= 1 or not isinstance(obj, (dict, list)):
            return obj

        def try_str(v):
            if isinstance(v, str):
                s = v.strip()
                if s.startswith("{") or s.startswith("["):
                    try:
                        inner = json.loads(s)
                    except (json.JSONDecodeError, ValueError):
                        return v
                    if isinstance(inner, list) and not self.process_array:
                        return v
                    return self._deep_decode(inner, depth_left - 1)
            return v

        if isinstance(obj, dict):
            return {k: try_str(v) for k, v in obj.items()}
        return [try_str(v) for v in obj]

    @classmethod
    def _merge(cls, dst: dict, src: dict) -> bool:
        for k, v in src.items():
            old = dst.get(k)
            if old is None and k not in dst:
                dst[k] = v
            elif isinstance(old, dict) and isinstance(v, dict):
                if not cls._merge(old, v):
                    return False
            else:
                return False  # conflicting key
        return True

    def _expand(self, obj: dict):
        """De-dot literal dotted keys into nested maps with deep merge
        (``jsontransform/expand.go``). → (expanded, ok); ok=False on a
        conflicting expansion (the reference errors the event)."""
        out: dict = {}
        for k, v in obj.items():
            if isinstance(v, dict):
                v, ok = self._expand(v)
                if not ok:
                    return None, False
            parts = k.split(".") if "." in k else [k]
            cur = out
            for p in parts[:-1]:
                nxt = cur.get(p)
                if nxt is None and p not in cur:
                    nxt = {}
                    cur[p] = nxt
                elif not isinstance(nxt, dict):
                    return None, False
                cur = nxt
            leaf = parts[-1]
            old = cur.get(leaf)
            if old is None and leaf not in cur:
                cur[leaf] = v
            elif isinstance(old, dict) and isinstance(v, dict):
                if not self._merge(old, v):
                    return None, False
            else:
                return None, False
        return out, True

    def apply(self, tbl: pa.Table) -> pa.Table:
        n = tbl.num_rows
        for field in self.fields:
            col = get_column(tbl, field)
            if col is None:
                if self.ignore_missing:
                    continue
                raise ConfigError(f"decode_json_fields: missing {field!r}")
            # vectorized pre-filter: only JSON-looking rows leave Arrow
            trimmed = pc.utf8_trim_whitespace(pc.cast(col, pa.string()))
            looks = pc.starts_with(trimmed, pattern="{")
            if self.process_array:
                looks = pc.or_(looks, pc.starts_with(trimmed, pattern="["))
            looks = pc.fill_null(looks, False)
            rows: list[dict | None] = [None] * n
            bad = pc.invert(pc.or_(looks, pc.is_null(col))).to_pylist()
            if pc.any(looks).as_py():
                idxs = pc.indices_nonzero(looks).to_pylist()
                for i, s in zip(idxs, pc.take(trimmed, idxs).to_pylist()):
                    try:
                        obj = json.loads(s)
                    except (json.JSONDecodeError, ValueError):
                        bad[i] = True
                        continue
                    obj = self._deep_decode(obj, self.max_depth)
                    if isinstance(obj, dict) and self.expand_keys:
                        obj, ok_exp = self._expand(obj)
                        if not ok_exp:
                            bad[i] = True
                            continue
                    if isinstance(obj, dict):
                        flat: dict = {}
                        self._flatten(obj, "", flat)
                        rows[i] = flat
                    elif isinstance(obj, list) and self.process_array:
                        rows[i] = {"array": obj}
                    else:
                        bad[i] = True
            if self.document_id:
                ids = [None if r is None else r.pop(self.document_id, None)
                       for r in rows]
                if any(x is not None for x in ids):
                    new_ids = pa.array(
                        [None if x is None else str(x) for x in ids],
                        pa.string())
                    old_ids = get_column(tbl, META_ID)
                    if old_ids is not None:
                        # merge: only rows that actually carried a
                        # document_id overwrite an existing meta_id
                        new_ids = pc.if_else(pc.is_valid(new_ids), new_ids,
                                             old_ids)
                    tbl = set_column(tbl, META_ID, new_ids)
            if self.expected is not None:
                keys = self.expected
            else:
                seen: list[str] = []
                for r in rows:
                    if r:
                        for k in r:
                            if k not in seen:
                                seen.append(k)
                keys = [(k, None) for k in seen]
            for key, typ in keys:
                name = self.prefix + key
                if name in tbl.column_names and not self.overwrite:
                    continue
                vals = [None if r is None else r.get(key) for r in rows]
                if typ is not None:
                    conv = []
                    for x in vals:
                        if x is None:
                            conv.append(None)
                        elif typ == pa.string() and not isinstance(x, str):
                            conv.append(json.dumps(x, separators=(",", ":")))
                        else:
                            try:
                                conv.append(
                                    x if typ == pa.string() else
                                    int(x) if typ == pa.int64() else
                                    float(x) if typ == pa.float64() else
                                    bool(x))
                            except (TypeError, ValueError):
                                conv.append(None)
                    arr = pa.array(conv, typ)
                else:
                    try:
                        arr = pa.array(vals)
                    except (pa.ArrowInvalid, pa.ArrowTypeError):
                        arr = pa.array([None if x is None else
                                        json.dumps(x, separators=(",", ":"))
                                        if not isinstance(x, str) else x
                                        for x in vals], pa.string())
                tbl = set_column(tbl, name, arr)
            if self.add_error_key:
                tbl = add_flag(tbl, pa.array(bad, pa.bool_()),
                               "json_decode_error")
            # always expose per-row success for routing decisions
            oks = pa.array([r is not None for r in rows], pa.bool_())
            tbl = set_column(tbl, f"{field}_json_ok" if field != "text"
                             else "json_ok", oks)
        return tbl
