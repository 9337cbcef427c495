"""Routing: selector compiler (sink fan-out).

Re-expresses the reference's output selector
(``libbeat/outputs/outil/select.go``): an ordered rule list where the
first rule producing a non-empty value wins. Rule kinds: constant,
event-format-string (with ``otherwise`` fallback), value-``mappings``
table with ``default``, each optionally guarded by ``when:``. The
dead-letter override (``elasticsearch/death_letter_selector.go:26-36``)
routes rows with ``meta_dead_letter`` set to the dead-letter sink
regardless of rule outcome.

Vectorized: one pass per rule filling only still-null slots
(``pc.if_else(mask & is_null(sink), value, sink)``), producing a ``sink``
string column; sinks then fan out via partitioned parquet writes.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from .conditions import compile_condition
from .errors import ConfigError
from .fmtstr import EventFormatString
from .model import INDEX, META_DEAD_LETTER, SINK
from .processors import set_column


class _Rule:
    def __init__(self, cfg: dict):
        self.cond = compile_condition(cfg["when"]) if cfg.get("when") else None
        if "sink" in cfg:
            self.kind = "const"
            self.value = str(cfg["sink"])
        elif "fmtstr" in cfg:
            self.kind = "fmt"
            self.fmt = EventFormatString(cfg["fmtstr"])
            self.otherwise = cfg.get("otherwise")
        elif "mappings" in cfg:
            self.kind = "map"
            if "field" not in cfg:
                raise ConfigError(f"mappings rule needs 'field': {cfg}")
            self.field = cfg["field"]
            self.mappings = {str(k): str(v) for k, v in cfg["mappings"].items()}
            self.default = cfg.get("default")
        else:
            raise ConfigError(f"router rule needs sink/fmtstr/mappings: {cfg}")

    def evaluate(self, tbl: pa.Table) -> pa.Array:
        n = tbl.num_rows
        if self.kind == "const":
            return pa.array([self.value] * n, pa.string())
        if self.kind == "fmt":
            out = self.fmt.evaluate(tbl)
            if self.otherwise is not None:
                out = pc.fill_null(out, self.otherwise)
            return out
        col = (pc.cast(tbl.column(self.field), pa.string())
               if self.field in tbl.column_names
               else pa.nulls(n, pa.string()))
        keys = pa.array(list(self.mappings.keys()), pa.string())
        vals = pa.array(list(self.mappings.values()), pa.string())
        idx = pc.index_in(col, value_set=keys)
        out = pc.take(vals, idx)
        if self.default is not None:
            out = pc.fill_null(out, self.default)
        return out


class Router:
    """Computes the ``sink`` column (and optional per-sink ``index``
    format strings). Usable directly inside a processor chain."""

    name = "router"
    row_filter = False

    def __init__(self, rules: list[dict], default: str | None = None,
                 dead_letter: str | None = "dead_letter",
                 sink_indexes: dict[str, str] | None = None):
        self.rules = [_Rule(r) for r in rules]
        self.default = default
        self.dead_letter = dead_letter
        self.sink_indexes = {k: EventFormatString(v)
                             for k, v in (sink_indexes or {}).items()}

    def apply(self, tbl: pa.Table) -> pa.Table:
        n = tbl.num_rows
        sink = pa.nulls(n, pa.string())
        for rule in self.rules:
            open_slots = pc.is_null(sink)
            if not pc.any(open_slots).as_py():
                break
            cand = rule.evaluate(tbl)
            ok = pc.and_(pc.is_valid(cand),
                         pc.not_equal(pc.coalesce(cand, ""), ""))
            if rule.cond is not None:
                ok = pc.and_(ok, pc.fill_null(rule.cond(tbl), False))
            take = pc.and_(open_slots, ok)
            sink = pc.if_else(take, cand, sink)
        if self.default is not None:
            sink = pc.fill_null(sink, self.default)
        if self.dead_letter and META_DEAD_LETTER in tbl.column_names:
            dl = pc.fill_null(
                pc.cast(tbl.column(META_DEAD_LETTER), pa.bool_()), False)
            sink = pc.if_else(dl, self.dead_letter, sink)
        tbl = set_column(tbl, SINK, sink)
        if self.sink_indexes:
            index = pa.nulls(n, pa.string())
            for name, fmt in self.sink_indexes.items():
                mask = pc.fill_null(pc.equal(sink, name), False)
                if pc.any(mask).as_py():
                    index = pc.if_else(mask, fmt.evaluate(tbl), index)
            tbl = set_column(tbl, INDEX, index)
        return tbl

    __call__ = apply
