"""Lookup-enrich stage: broadcast hash join of a small side table.

Ray-idiomatic generalization of the reference's cache-holding metadata
processors (``add_docker_metadata``, ``dns``, … — SURVEY §2.3): the side
table is ``ray.put`` once on the driver; each actor of the
``map_batches(Enricher, concurrency=N)`` pool fetches it ONCE in
``__init__`` (zero-copy from the object store) and builds its lookup
index there; per batch the join is fully vectorized
(``pc.index_in`` + ``pc.take``). Misses null-fill and set a boolean
``<prefix>_miss`` column (the ``tag_on_failure`` pattern,
``libbeat/processors/dns/config.go:37``).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from .errors import ConfigError
from .processors import pin_arrow_threads, set_column

_SEP = "\x1f"


def _join_keys(tbl: pa.Table, key_fields) -> tuple[pa.Array, pa.Array]:
    """→ (joined key, any-null mask). A null key field must always MISS
    (SQL join semantics) — fill_null('') alone would let it match a side
    row whose key is the empty string."""
    cols = []
    null_mask = None
    for f in key_fields:
        if f not in tbl.column_names:
            raise ConfigError(f"enrich: missing key field {f!r}")
        c = tbl.column(f)
        c = c.combine_chunks() if isinstance(c, pa.ChunkedArray) else c
        isnull = pc.is_null(c)
        null_mask = isnull if null_mask is None else pc.or_(null_mask, isnull)
        cols.append(pc.fill_null(pc.cast(c, pa.string()), ""))
    key = cols[0] if len(cols) == 1 else \
        pc.binary_join_element_wise(*cols, _SEP)
    return key, null_mask


class Enricher:
    """Callable class for ``map_batches`` actor pools.

    Parameters
    ----------
    rows / table_ref
        The side table: a list of dicts, a ``pa.Table``, or a
        ``ray.ObjectRef`` to either (preferred at scale: put once, read
        per actor).
    key_fields
        Join key columns, e.g. ``("role", "tool")``.
    target_prefix
        Output columns are ``<prefix>.<value_col>`` (empty = root).
    """

    def __init__(self, rows=None, table_ref=None,
                 key_fields=("role", "tool"), target_prefix: str = "meta",
                 miss_flag: bool = True):
        if table_ref is not None:
            import ray
            rows = ray.get(table_ref)
        if rows is None:
            raise ConfigError("enrich: need rows or table_ref")
        side = rows if isinstance(rows, pa.Table) else \
            pa.Table.from_pylist(list(rows))
        self.key_fields = tuple(key_fields)
        self.prefix = f"{target_prefix}." if target_prefix else ""
        self.miss_col = (f"{target_prefix}_miss" if target_prefix
                         else "enrich_miss") if miss_flag else None
        self.index, side_nulls = _join_keys(side, self.key_fields)
        if pc.any(side_nulls).as_py():
            raise ConfigError("enrich: null key in side table")
        self.value_cols = {
            name: side.column(name).combine_chunks()
            for name in side.column_names if name not in self.key_fields}
        if len(self.index) != len(set(self.index.to_pylist())):
            raise ConfigError("enrich: duplicate keys in side table")

    def __call__(self, tbl: pa.Table) -> pa.Table:
        pin_arrow_threads()
        keys, null_mask = _join_keys(tbl, self.key_fields)
        idx = pc.index_in(keys, value_set=self.index)
        if pc.any(null_mask).as_py():
            # null-key rows always miss
            idx = pc.if_else(null_mask, pa.nulls(len(idx), idx.type), idx)
        for name, col in self.value_cols.items():
            taken = pc.take(col, idx)
            tbl = set_column(tbl, self.prefix + name, taken)
        if self.miss_col:
            tbl = set_column(tbl, self.miss_col, pc.is_null(idx))
        return tbl
