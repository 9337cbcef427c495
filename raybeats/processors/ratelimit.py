"""``rate_limit`` processor (reference ``libbeat/processors/ratelimit/``):
token-bucket limiting keyed by the hashed values of configured fields;
non-conforming events are DROPPED.

Distributed semantics (documented divergence): the reference holds one
global bucket map in one process. A distributed engine has three honest
options: (a) per-task buckets (limit × tasks aggregate rate), (b) a keyed
shuffle so each key's events meet exactly one bucket, (c) a shared-state
actor. This implements (b)-compatible event-time buckets: rows are
processed in ``ts`` order per batch and refill uses EVENT time, so the
result is deterministic and key-exact whenever a key's rows are
co-partitioned (e.g. after ``repartition_by_column`` on the key fields, or
with conversation-local input layout). Used standalone per batch it is the
per-partition approximation (a).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from ..errors import ConfigError
from . import Processor, get_column, register, set_column

_UNITS = {"s": 1.0, "m": 60.0, "h": 3600.0}


@register("rate_limit")
class RateLimit(Processor):
    row_filter = True

    def __init__(self, limit: str, fields: list[str] | None = None,
                 burst_multiplier: float = 1.0, ts_field: str = "ts"):
        try:
            rate, unit = limit.split("/")
            self.per_sec = float(rate) / _UNITS[unit]
        except (ValueError, KeyError) as e:
            raise ConfigError(f"rate_limit: bad limit {limit!r}") from e
        self.fields = sorted(fields or [])
        self.burst = max(1.0, float(rate) * burst_multiplier)
        self.ts_field = ts_field
        self.buckets: dict[tuple, tuple[float, float]] = {}  # key -> (tokens, last_ts)

    def apply(self, tbl: pa.Table) -> pa.Table:
        if tbl.num_rows == 0:
            return tbl
        order = pc.sort_indices(tbl, sort_keys=[(self.ts_field, "ascending")])
        ts_us = pc.cast(pc.take(tbl.column(self.ts_field), order),
                        pa.int64()).to_pylist()
        if self.fields:
            missing = [f for f in self.fields if f not in tbl.column_names]
            if missing:
                raise ConfigError(f"rate_limit: missing key fields "
                                  f"{missing} — a silently collapsed key "
                                  f"would mass-drop events")
            key_cols = [pc.take(tbl.column(f), order).to_pylist()
                        for f in self.fields]
            keys = list(zip(*key_cols)) if key_cols else [()] * len(ts_us)
        else:
            keys = [()] * len(ts_us)
        keep_sorted = []
        for key, t in zip(keys, ts_us):
            tsec = t / 1e6
            tokens, last = self.buckets.get(key, (self.burst, tsec))
            tokens = min(self.burst, tokens + (tsec - last) * self.per_sec)
            if tokens >= 1.0:
                tokens -= 1.0
                keep_sorted.append(True)
            else:
                keep_sorted.append(False)
            self.buckets[key] = (tokens, tsec)
        # scatter the keep decisions back to original row order
        keep = [False] * tbl.num_rows
        for pos, orig in enumerate(order.to_pylist()):
            keep[orig] = keep_sorted[pos]
        return tbl.filter(pa.array(keep, pa.bool_()))

    def apply_masked(self, tbl: pa.Table, mask) -> pa.Table:
        matched = tbl.filter(mask)
        limited = self.apply(matched)
        rest = tbl.filter(pc.invert(pc.fill_null(mask, False)))
        if rest.num_rows == 0:
            return limited
        if limited.num_rows == 0:
            return rest
        return pa.concat_tables([limited, rest])


@register("timeseries")
class Timeseries(Processor):
    """``timeseries.instance`` hash from dimension fields
    (``libbeat/processors/timeseries/``): same serialization shape as
    fingerprint, md5-folded to a uint64-style instance id."""

    def __init__(self, fields: list[str]):
        from .fingerprint import Fingerprint
        self.fp = Fingerprint(fields=fields, method="md5", encoding="hex",
                              target_field="_ts_fp", ignore_missing=True)

    def apply(self, tbl: pa.Table) -> pa.Table:
        t = self.fp.apply(tbl)
        hexes = get_column(t, "_ts_fp")
        vals = [None if h is None else int(h[:15], 16)
                for h in hexes.to_pylist()]
        t = t.drop_columns(["_ts_fp"])
        return set_column(t, "timeseries.instance",
                          pa.array(vals, pa.int64()))


def _stub(name: str, reason: str):
    @register(name)
    class _Stub(Processor):  # noqa: N801
        def __init__(self, **_cfg):
            raise NotImplementedError(
                f"{name}: {reason} (registered for config parity with the "
                f"reference; not applicable to transcript pipelines)")
    _Stub.__name__ = f"Stub_{name}"
    return _Stub


@register("lookup_enrich")
class LookupEnrich(Processor):
    """Config-surface wrapper around :class:`raybeats.enrich.Enricher` so
    YAML pipelines can express the dictionary-enrich stage (the engine's
    generalization of the reference's metadata enrichers, SURVEY §2.3).
    ``rows`` inline, or ``parquet`` path to a small side table."""

    def __init__(self, key_fields: list[str], rows: list[dict] | None = None,
                 parquet: str | None = None, target_prefix: str = "meta",
                 miss_flag: bool = True):
        from ..enrich import Enricher
        side = rows
        if parquet:
            import pyarrow.parquet as pq
            side = pq.read_table(parquet)
        self.enricher = Enricher(rows=side, key_fields=tuple(key_fields),
                                 target_prefix=target_prefix,
                                 miss_flag=miss_flag)

    def apply(self, tbl: pa.Table) -> pa.Table:
        return self.enricher(tbl)


_stub("dns", "no resolver in this environment; use lookup_enrich with a "
      "resolution table")
_stub("add_docker_metadata", "no Docker daemon; use lookup_enrich with a "
      "container metadata table")
_stub("add_kubernetes_metadata", "no K8s API; use lookup_enrich with a pod "
      "metadata table")
_stub("add_process_metadata", "host process table not meaningful for "
      "distributed batch workers")
_stub("add_cloud_metadata", "no cloud metadata endpoint in this environment")
