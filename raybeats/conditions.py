"""Condition compiler: config tree → vectorized mask over an Arrow table.

Re-expresses the reference's conditions engine
(``libbeat/conditions/conditions.go:31-100``) as a single compile step
producing ``fn(pa.Table) -> pa.BooleanArray``. One compiler powers ``when:``
processor guards, ``drop_event``, and router/selector predicates. Missing
fields and nulls evaluate to False (reference: missing field ⇒ condition
false, ``conditions/equals.go``).

Supported nodes: ``equals, contains, regexp, range, has_fields, network,
or, and, not``.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from .errors import ConfigError

_RANGE_OPS = {"gte": pc.greater_equal, "gt": pc.greater,
              "lte": pc.less_equal, "lt": pc.less}


def _false(tbl: pa.Table) -> pa.Array:
    return pa.array([False] * tbl.num_rows, pa.bool_())


def _col(tbl: pa.Table, name: str):
    if name in tbl.column_names:
        c = tbl.column(name)
        return c.combine_chunks() if isinstance(c, pa.ChunkedArray) else c
    return None


def _as_bool(arr, tbl: pa.Table) -> pa.Array:
    return pc.fill_null(arr, False)


def _equals_one(tbl: pa.Table, field: str, value) -> pa.Array:
    col = _col(tbl, field)
    if col is None:
        return _false(tbl)
    try:
        if isinstance(value, bool):
            m = pc.equal(pc.cast(col, pa.bool_()), value)
        elif isinstance(value, (int, float)):
            m = pc.equal(pc.cast(col, pa.float64()), float(value))
        else:
            m = pc.equal(pc.cast(col, pa.string()), str(value))
    except (pa.ArrowInvalid, pa.ArrowNotImplementedError):
        return _false(tbl)
    return _as_bool(m, tbl)


def compile_condition(cfg: dict):
    """Compile a condition config dict into ``fn(tbl) -> BooleanArray``."""
    if not isinstance(cfg, dict) or not cfg:
        raise ConfigError(f"invalid condition: {cfg!r}")
    fns = [_compile_node(k, v) for k, v in cfg.items()]
    if len(fns) == 1:
        return fns[0]

    def _and_all(tbl: pa.Table) -> pa.Array:
        m = fns[0](tbl)
        for f in fns[1:]:
            m = pc.and_(m, f(tbl))
        return m
    return _and_all


def _compile_node(kind: str, body):
    if kind in ("equals", "contains", "regexp", "range", "network",
                "has_fields") and not body:
        raise ConfigError(f"empty {kind!r} condition")
    if kind == "equals":
        items = list(body.items())

        def _equals(tbl):
            m = _equals_one(tbl, *items[0])
            for f, v in items[1:]:
                m = pc.and_(m, _equals_one(tbl, f, v))
            return m
        return _equals

    if kind == "contains":
        items = list(body.items())

        def _contains(tbl):
            m = None
            for f, v in items:
                col = _col(tbl, f)
                x = (_false(tbl) if col is None else
                     _as_bool(pc.match_substring(pc.cast(col, pa.string()),
                                                 str(v)), tbl))
                m = x if m is None else pc.and_(m, x)
            return m
        return _contains

    if kind == "regexp":
        items = list(body.items())

        def _regexp(tbl):
            m = None
            for f, v in items:
                col = _col(tbl, f)
                x = (_false(tbl) if col is None else
                     _as_bool(pc.match_substring_regex(
                         pc.cast(col, pa.string()), str(v)), tbl))
                m = x if m is None else pc.and_(m, x)
            return m
        return _regexp

    if kind == "range":
        # accepts {field: {gte: v, lt: v}} and the reference's flat
        # {"field.gte": v} form
        bounds: dict[str, dict[str, float]] = {}
        for k, v in body.items():
            if isinstance(v, dict):
                bounds.setdefault(k, {}).update(
                    {op: float(x) for op, x in v.items()})
            else:
                f, _, op = k.rpartition(".")
                if op not in _RANGE_OPS:
                    raise ConfigError(f"bad range op in {k!r}")
                bounds.setdefault(f, {})[op] = float(v)
        for f, ops in bounds.items():
            for op in ops:
                if op not in _RANGE_OPS:
                    raise ConfigError(f"bad range op {op!r}")

        def _range(tbl):
            m = None
            for f, ops in bounds.items():
                col = _col(tbl, f)
                if col is None:
                    x = _false(tbl)
                else:
                    try:
                        num = pc.cast(col, pa.float64())
                    except (pa.ArrowInvalid, pa.ArrowNotImplementedError):
                        x = _false(tbl)
                    else:
                        x = None
                        for op, v in ops.items():
                            c = _as_bool(_RANGE_OPS[op](num, v), tbl)
                            x = c if x is None else pc.and_(x, c)
                m = x if m is None else pc.and_(m, x)
            return m
        return _range

    if kind == "has_fields":
        fields = [body] if isinstance(body, str) else list(body)

        def _has(tbl):
            m = None
            for f in fields:
                col = _col(tbl, f)
                x = _false(tbl) if col is None else pc.is_valid(col)
                m = x if m is None else pc.and_(m, x)
            return m
        return _has

    if kind == "network":
        items = list(body.items())
        import ipaddress
        named = {
            "loopback": [ipaddress.ip_network("127.0.0.0/8"),
                         ipaddress.ip_network("::1/128")],
            "private": [ipaddress.ip_network(n) for n in
                        ("10.0.0.0/8", "172.16.0.0/12", "192.168.0.0/16",
                         "fc00::/7")],
            "public": None,  # = not private/loopback/unspecified
        }

        def _in_ranges(val: str | None, spec) -> bool:
            if val is None:
                return False
            try:
                ip = ipaddress.ip_address(val)
            except ValueError:
                return False
            specs = spec if isinstance(spec, list) else [spec]
            for s in specs:
                if s in named:
                    nets = named[s]
                    if nets is None:
                        if ip.is_global:
                            return True
                    elif any(ip in n for n in nets):
                        return True
                else:
                    try:
                        if ip in ipaddress.ip_network(s):
                            return True
                    except ValueError:
                        pass
            return False

        def _network(tbl):
            m = None
            for f, spec in items:
                col = _col(tbl, f)
                if col is None:
                    x = _false(tbl)
                else:
                    x = pa.array([_in_ranges(v, spec)
                                  for v in pc.cast(col, pa.string()).to_pylist()],
                                 pa.bool_())
                m = x if m is None else pc.and_(m, x)
            return m
        return _network

    if kind == "or":
        if not body:
            raise ConfigError("empty 'or' condition")
        subs = [compile_condition(c) for c in body]

        def _or(tbl):
            m = subs[0](tbl)
            for f in subs[1:]:
                m = pc.or_(m, f(tbl))
            return m
        return _or

    if kind == "and":
        if not body:
            raise ConfigError("empty 'and' condition")
        subs = [compile_condition(c) for c in body]

        def _and(tbl):
            m = subs[0](tbl)
            for f in subs[1:]:
                m = pc.and_(m, f(tbl))
            return m
        return _and

    if kind == "not":
        sub = compile_condition(body)
        return lambda tbl: pc.invert(sub(tbl))

    raise ConfigError(f"unknown condition {kind!r}")
