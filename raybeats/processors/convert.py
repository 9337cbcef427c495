"""``convert`` processor (reference ``libbeat/processors/convert/``):
cast fields between declared types, copy or rename mode, per-row failure
flags instead of rollback (documented divergence: a vectorized engine
flags failed rows rather than restoring a per-event snapshot)."""

from __future__ import annotations

import ipaddress

import pyarrow as pa
import pyarrow.compute as pc

from ..errors import ConfigError
from . import Processor, add_flag, get_column, register, set_column

_TYPES = {
    "integer": pa.int32(),
    "long": pa.int64(),
    "float": pa.float32(),
    "double": pa.float64(),
    "string": pa.string(),
    "boolean": pa.bool_(),
}


@register("convert")
class Convert(Processor):
    def __init__(self, fields: list[dict], mode: str = "copy",
                 ignore_missing: bool = False, fail_on_error: bool = True):
        if mode not in ("copy", "rename"):
            raise ConfigError(f"convert: bad mode {mode!r}")
        self.rules = []
        for f in fields:
            typ = f.get("type", "string")
            if typ != "ip" and typ not in _TYPES:
                raise ConfigError(f"convert: bad type {typ!r}")
            self.rules.append((f["from"], f.get("to", f["from"]), typ))
        self.mode = mode
        self.ignore_missing = ignore_missing

    def _cast(self, col: pa.Array, typ: str):
        if typ == "ip":
            vals, bad = [], []
            for v in col.to_pylist():
                if v is None:
                    vals.append(None)
                    bad.append(False)
                    continue
                try:
                    ipaddress.ip_address(str(v))
                    vals.append(str(v))
                    bad.append(False)
                except ValueError:
                    vals.append(None)
                    bad.append(True)
            return pa.array(vals, pa.string()), pa.array(bad, pa.bool_())
        target = _TYPES[typ]
        try:
            return pc.cast(col, target), None
        except (pa.ArrowInvalid, pa.ArrowNotImplementedError):
            # per-row salvage
            lim = {"integer": 1 << 31, "long": 1 << 63}.get(typ)
            vals, bad = [], []
            for v in col.to_pylist():
                if v is None:
                    vals.append(None)
                    bad.append(False)
                    continue
                try:
                    if typ in ("integer", "long"):
                        n = int(str(v).strip())
                        if not (-lim <= n < lim):
                            raise ValueError("out of range")
                        vals.append(n)
                    elif typ in ("float", "double"):
                        vals.append(float(v))
                    elif typ == "boolean":
                        s = str(v).strip().lower()
                        if s in ("true", "t", "1"):
                            vals.append(True)
                        elif s in ("false", "f", "0"):
                            vals.append(False)
                        else:
                            raise ValueError(s)
                    else:
                        vals.append(str(v))
                    bad.append(False)
                except (ValueError, TypeError):
                    vals.append(None)
                    bad.append(True)
            return pa.array(vals, target), pa.array(bad, pa.bool_())

    def apply(self, tbl: pa.Table) -> pa.Table:
        for src, dst, typ in self.rules:
            col = get_column(tbl, src)
            if col is None:
                if self.ignore_missing:
                    continue
                raise ConfigError(f"convert: missing {src!r}")
            out, bad = self._cast(col, typ)
            if self.mode == "rename" and dst != src:
                tbl = tbl.drop_columns([src])
            tbl = set_column(tbl, dst, out)
            if bad is not None:
                tbl = add_flag(tbl, bad, "convert_error")
        return tbl
