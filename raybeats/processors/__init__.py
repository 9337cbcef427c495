"""Processor framework: registry, chain, and conditional wrappers.

The reference's processor contract is ``Run(*beat.Event) (*beat.Event,
error)`` with a registry of named constructors
(``libbeat/processors/registry.go``, ``processor.go:72-123``). Here a
processor is a vectorized table transform ``apply(pa.Table) -> pa.Table``;
a chain applies them serially per batch inside one ``map_batches`` stage.

Semantics kept from the reference:

* ``when:`` guard on any processor (``libbeat/processors/conditionals.go``)
  — evaluated as a mask; column changes are merged back with ``if_else`` so
  unmatched rows keep their old values.
* ``if/then/else`` compound processor.
* per-row errors set flags (``log_flags`` column) instead of aborting the
  batch (the publisher-pipeline "log and continue" semantics,
  ``libbeat/publisher/processing/processors.go:120-137``).
* dropped events (``drop_event``, failed ``when`` chains) are removed by
  filtering the batch.
"""

from __future__ import annotations

import re as _re

import pyarrow as pa
import pyarrow.compute as pc

from ..conditions import compile_condition
from ..errors import ConfigError
from ..model import FLAGS

REGISTRY: dict[str, type] = {}


def register(name: str):
    def deco(cls):
        REGISTRY[name] = cls
        cls.name = name
        return cls
    return deco


class Processor:
    """Base: a pure, vectorized table transform."""

    name = "?"
    row_filter = False  # True if apply() may remove rows

    def __init__(self, **cfg):
        self.cfg = cfg

    def apply(self, tbl: pa.Table) -> pa.Table:  # pragma: no cover
        raise NotImplementedError

    @classmethod
    def from_config(cls, body: dict):
        return cls(**body)

    def __repr__(self):
        return f"<{type(self).__name__}>"


# ------------------------------------------------------------------ helpers

def set_column(tbl: pa.Table, name: str, arr) -> pa.Table:
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    if name in tbl.column_names:
        return tbl.set_column(tbl.column_names.index(name), name, arr)
    return tbl.append_column(name, arr)


def get_column(tbl: pa.Table, name: str):
    if name in tbl.column_names:
        c = tbl.column(name)
        return c.combine_chunks() if isinstance(c, pa.ChunkedArray) else c
    return None


def add_flag(tbl: pa.Table, mask, flag: str) -> pa.Table:
    """Append ``flag`` to the ``log_flags`` set column for rows in mask
    (mirrors ``common.AddTagsWithKey`` on ``log.flags``). The column is
    materialized even when nothing is flagged so block schemas stay
    identical regardless of data."""
    cur = get_column(tbl, FLAGS)
    if cur is None:
        cur = pa.nulls(tbl.num_rows, pa.string())
        tbl = set_column(tbl, FLAGS, cur)
    if mask is None or tbl.num_rows == 0 or not pc.any(mask).as_py():
        return tbl
    # exact membership in the comma-joined set — a plain substring test
    # would treat a flag whose name is a substring of another (or of a
    # value containing it) as already present and silently skip it
    has = pc.fill_null(
        pc.match_substring_regex(cur, f"(^|,){_re.escape(flag)}($|,)"),
        False)
    need = pc.and_(pc.fill_null(mask, False), pc.invert(has))
    joined = pc.if_else(pc.is_valid(cur),
                        pc.binary_join_element_wise(cur, flag, ","),
                        pa.array([flag] * tbl.num_rows, pa.string()))
    out = pc.if_else(need, joined, cur)
    return set_column(tbl, FLAGS, out)


def flatten_config_map(d: dict, prefix: str = "") -> dict[str, object]:
    out = {}
    for k, v in d.items():
        key = f"{prefix}{k}"
        if isinstance(v, dict):
            out.update(flatten_config_map(v, key + "."))
        else:
            out[key] = v
    return out


def const_column(n: int, value) -> pa.Array:
    if isinstance(value, bool):
        return pa.array([value] * n, pa.bool_())
    if isinstance(value, int):
        return pa.array([value] * n, pa.int64())
    if isinstance(value, float):
        return pa.array([value] * n, pa.float64())
    if isinstance(value, list):
        return pa.array([value] * n)
    return pa.array([str(value)] * n, pa.string())


# -------------------------------------------------------------- wrappers

class WhenProcessor(Processor):
    """Guarded processor: apply inner to the batch, then keep the inner
    result only on rows matching the condition (column-merge semantics).
    Row-filtering processors receive the mask directly."""

    def __init__(self, inner: Processor, cond_cfg: dict):
        self.inner = inner
        self.cond = compile_condition(cond_cfg)

    def apply(self, tbl: pa.Table) -> pa.Table:
        mask = pc.fill_null(self.cond(tbl), False)
        if self.inner.row_filter:
            return self.inner.apply_masked(tbl, mask)
        # run the inner on the full batch even when no row matches: the
        # output schema must not depend on the batch's data, or blocks
        # diverge and partitioned writes break
        new = self.inner.apply(tbl)
        if new.num_rows != tbl.num_rows:
            raise ConfigError(
                f"{self.inner} changed row count under a when: guard")
        out = tbl
        type_conflict = None
        for name in new.column_names:
            new_col = get_column(new, name)
            old_col = get_column(tbl, name)
            if old_col is None:
                old_col = pa.nulls(tbl.num_rows, new_col.type)
            elif old_col.type != new_col.type:
                try:
                    old_col = pc.cast(old_col, new_col.type)
                except (pa.ArrowInvalid, pa.ArrowNotImplementedError):
                    # unmatched rows hold values the inner's output type
                    # cannot represent: null them + flag instead of
                    # aborting the batch (per-row error contract)
                    old_col = pa.nulls(tbl.num_rows, new_col.type)
                    type_conflict = pc.invert(mask)
            out = set_column(out, name, pc.if_else(mask, new_col, old_col))
        if type_conflict is not None:
            out = add_flag(out, type_conflict, "when_merge_type_conflict")
        # columns the inner REMOVED (drop_fields/rename source): per-row
        # removal in a columnar batch = null on matched rows
        for name in tbl.column_names:
            if name not in new.column_names:
                old_col = get_column(out, name)
                out = set_column(out, name,
                                 pc.if_else(mask,
                                            pa.nulls(tbl.num_rows,
                                                     old_col.type),
                                            old_col))
        return out

    def __repr__(self):
        return f"<when {self.inner!r}>"


class IfThenElse(Processor):
    def __init__(self, cond_cfg: dict, then_procs: list, else_procs: list):
        self.cond = compile_condition(cond_cfg)
        self.then_chain = Chain(then_procs)
        self.else_chain = Chain(else_procs)

    _IDX = "_ite_row_idx"

    def apply(self, tbl: pa.Table) -> pa.Table:
        # BOTH chains always run (even on empty splits) so the output
        # schema is data-independent, and the original row order is
        # restored via a hidden index column
        mask = pc.fill_null(self.cond(tbl), False)
        idx = pa.array(range(tbl.num_rows), pa.int64())
        tagged = tbl.append_column(self._IDX, idx)
        a = self.then_chain(tagged.filter(mask))
        b = self.else_chain(tagged.filter(pc.invert(mask)))
        schema = pa.unify_schemas([a.schema, b.schema],
                                  promote_options="permissive")
        merged = pa.concat_tables([_conform(a, schema), _conform(b, schema)])
        if self._IDX not in merged.column_names:
            return merged  # a branch projected the index away: keep order
        if merged.num_rows:
            merged = merged.sort_by(self._IDX)
        return merged.drop_columns([self._IDX])


def _conform(tbl: pa.Table, schema: pa.Schema) -> pa.Table:
    cols = []
    for f in schema:
        c = get_column(tbl, f.name)
        if c is None:
            c = pa.nulls(tbl.num_rows, f.type)
        elif c.type != f.type:
            c = pc.cast(c, f.type)
        cols.append(c)
    return pa.table(dict(zip(schema.names, cols)))


_arrow_pool_pinned = False


def pin_arrow_threads() -> None:
    """Each Ray task reserves one CPU; Arrow's global pools default to
    ``os.cpu_count()`` threads PER WORKER PROCESS, so 32 workers × 32
    threads thrash the box. Pin the pools to 1 inside worker-side stages
    (idempotent per process)."""
    global _arrow_pool_pinned
    if not _arrow_pool_pinned:
        pa.set_cpu_count(1)
        pa.set_io_thread_count(2)
        _arrow_pool_pinned = True


class Chain:
    """Ordered processor list; one callable suitable for ``map_batches``."""

    def __init__(self, processors: list[Processor]):
        self.processors = list(processors)

    def __call__(self, tbl: pa.Table) -> pa.Table:
        # never short-circuit on empty batches: every processor must run
        # so the output SCHEMA is identical for empty, clean and dirty
        # blocks (partitioned writes unify block schemas)
        pin_arrow_threads()
        for p in self.processors:
            tbl = p.apply(tbl)
        return tbl

    def __repr__(self):
        return f"<Chain {self.processors!r}>"


# ---------------------------------------------------------------- builder

def build_processor(cfg: dict) -> Processor:
    """One config entry → processor. Shapes:
    ``{name: {...body...}}``, optional ``when:`` inside the body, or an
    ``{"if": cond, "then": [...], "else": [...]}`` compound."""
    if "if" in cfg:
        then = cfg.get("then", [])
        els = cfg.get("else", [])
        then = then if isinstance(then, list) else [then]
        els = els if isinstance(els, list) else [els]
        return IfThenElse(cfg["if"],
                          [build_processor(c) for c in then],
                          [build_processor(c) for c in els])
    entries = [(k, v) for k, v in cfg.items() if k != "when"]
    if len(entries) != 1:
        raise ConfigError(f"processor config must have one key: {cfg!r}")
    name, body = entries[0]
    if name not in REGISTRY:
        raise ConfigError(f"unknown processor {name!r}")
    body = dict(body or {})
    when = body.pop("when", None) or cfg.get("when")
    proc = REGISTRY[name].from_config(body)
    if when:
        proc = WhenProcessor(proc, when)
    return proc


def build_chain(cfgs: list[dict]) -> Chain:
    return Chain([build_processor(c) for c in cfgs])


# import concrete processors so they self-register
from . import actions as _actions            # noqa: E402,F401
from . import parsers as _parsers            # noqa: E402,F401
from . import convert as _convert            # noqa: E402,F401
from . import timestamp as _timestamp        # noqa: E402,F401
from . import fingerprint as _fingerprint    # noqa: E402,F401
from . import ratelimit as _ratelimit        # noqa: E402,F401
from . import network as _network            # noqa: E402,F401
