"""Distributed EXACT quantiles over quantized numerics.

Reference parity: the reference engine has no quantile operator (its
metrics snapshots report only counters/gauges,
libbeat/monitoring/report/log/log.go); this is one of the
beyond-the-reference aggregates the large-scale-pipeline brief names
(p50/p95/p99 latency / value percentiles per route).

Scale shape: a naive distributed quantile needs a global sort (an
all-to-all of every row). Instead the value is quantized to a fixed
precision (``floor(value * scale)`` — quantization is part of the
operator's CONTRACT, not an approximation knob hidden from the user),
so each batch pre-aggregates to (key, quantum, count) rows and the
keyed shuffle carries at most ``groups × distinct-quanta`` fixed-width
rows per batch — bounded by the value range and precision, never by
the corpus. The per-key finalize is one sort + cumsum over the merged
counts. Exactness: every row with the same quantized value is
interchangeable for rank statistics at that precision, so the selected
quantum equals the quantized exact-order statistic.

Selection rule (DuckDB-mirrorable with window functions): the q-th
quantile is the SMALLEST quantum whose cumulative count reaches
``ceil(q * n)`` — the classic discrete lower quantile.
"""
from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def grouped_exact_quantiles(ds, *, value_col: str = "value",
                            by: str = "event_type",
                            qs: tuple[float, ...] = (0.5, 0.95, 0.99),
                            scale: int = 100):
    """Per-``by``-key exact discrete quantiles of
    ``floor(value * scale)``. Returns one row per key with columns
    ``by``, ``n`` and ``p{q}_cents`` (int64 quanta) per requested q.

    ``qs`` must lie in (0, 1]. Output quanta stay integer (int64) —
    dividing back to a double would re-introduce float formatting
    divergence between engines.
    """
    if not qs or any(not (0.0 < q <= 1.0) for q in qs):
        raise ValueError(f"qs must be in (0, 1]: {qs!r}")
    qnames = [f"p{str(q * 100).rstrip('0').rstrip('.').replace('.', '_')}"
              for q in qs]
    if len(set(qnames)) != len(qnames):
        raise ValueError(f"duplicate quantiles: {qs!r}")

    def partial(t: pa.Table) -> pa.Table:
        v = t.column(value_col).to_numpy(zero_copy_only=False)
        # nulls/NaN are ignored (SQL-aggregate convention) — floor(NaN)
        # .astype(int64) would otherwise sort a garbage INT64_MIN
        # quantum first and silently shift every rank
        ok = ~np.isnan(v)
        quanta = np.floor(v[ok] * scale).astype(np.int64)
        tt = pa.table({by: t.column(by).filter(pa.array(ok)),
                       "q": pa.array(quanta, pa.int64())})
        g = tt.group_by([by, "q"]).aggregate([("q", "count")])
        return pa.table({by: g.column(by), "q": g.column("q"),
                         "cnt": pc.cast(g.column("q_count"), pa.int64())})

    def finalize(grp: pa.Table) -> pa.Table:
        quanta = grp.column("q").to_numpy(zero_copy_only=False)
        cnt = grp.column("cnt").to_numpy(zero_copy_only=False)
        order = np.argsort(quanta, kind="stable")
        qs_sorted = quanta[order]
        uniq, start = np.unique(qs_sorted, return_index=True)
        cum = np.cumsum(np.add.reduceat(cnt[order], start))
        total = int(cum[-1])
        cols: dict = {by: grp.column(by).slice(0, 1).combine_chunks(),
                      "n": pa.array([total], pa.int64())}
        for q, name in zip(qs, qnames):
            # same float expr as the SQL mirror: ceil(q * n), double math
            target = np.ceil(q * total)
            idx = int(np.searchsorted(cum, target, side="left"))
            cols[f"{name}_cents"] = pa.array([int(uniq[idx])], pa.int64())
        return pa.table(cols)

    return ds.map_batches(partial, batch_format="pyarrow") \
             .groupby(by).map_groups(finalize, batch_format="pyarrow")
