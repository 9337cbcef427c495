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
            cols[f"{name}_cents"] = pa.array(
                [quantile_from_cdf(uniq, cum, q)], pa.int64())
        return pa.table(cols)

    return ds.map_batches(partial, batch_format="pyarrow") \
             .groupby(by).map_groups(finalize, batch_format="pyarrow")


def grouped_quantile_cont(ds, *, value_col: str = "value",
                          by: str = "event_type",
                          qs: tuple[float, ...] = (0.25, 0.5, 0.75),
                          scale: int = 100):
    """Per-``by``-key INTERPOLATED (continuous) quantiles of
    ``floor(value * scale)`` — SQL ``quantile_cont`` /
    ``percentile_cont`` semantics, where a quantile falling between
    two ranks returns the linear interpolation instead of the discrete
    `grouped_exact_quantiles` selection. Same scale shape: per-batch
    (key, quantum, count) partials bound the keyed shuffle by value
    range × precision, never corpus size; each group finalizes from
    its CDF with two ``searchsorted`` rank probes per quantile.

    ``qs`` must be DYADIC fractions (k/2^m — 0.5, 0.25, 0.75, 0.125…):
    then ``h = q·(n−1)``, the rank fraction, and the interpolation
    ``lo + frac·(hi−lo)`` are all exact in binary doubles on integer
    quanta, so the output hashes identically across engines. A
    non-dyadic q (0.9, 0.33) would make the result depend on the
    engine's operation ORDER — refused loudly rather than flaky.

    Returns one row per key: ``by``, ``n``, ``p{q}_cont`` (float64).
    """
    if not qs or any(not (0.0 < q < 1.0) for q in qs):
        raise ValueError(f"qs must be in (0, 1): {qs!r}")
    for q in qs:
        if (q * 4096.0) != int(q * 4096.0):
            raise ValueError(
                f"q={q} is not dyadic (k/2^m, m<=12): interpolation "
                f"would not be cross-engine exact")
    qnames = [f"p{str(q * 100).rstrip('0').rstrip('.').replace('.', '_')}"
              for q in qs]
    if len(set(qnames)) != len(qnames):
        raise ValueError(f"duplicate quantiles: {qs!r}")

    def partial(t: pa.Table) -> pa.Table:
        v = t.column(value_col).to_numpy(zero_copy_only=False)
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
        n = int(cum[-1])
        cols: dict = {by: grp.column(by).slice(0, 1).combine_chunks(),
                      "n": pa.array([n], pa.int64())}
        for q, name in zip(qs, qnames):
            h = q * (n - 1)          # 0-based fractional rank, exact
            lo_p = int(np.floor(h))
            hi_p = int(np.ceil(h))
            # element at 0-based position p = first quantum whose
            # cumulative count covers rank p+1
            lo = int(uniq[np.searchsorted(cum, lo_p + 1, side="left")])
            hi = int(uniq[np.searchsorted(cum, hi_p + 1, side="left")])
            cols[f"{name}_cont"] = pa.array(
                [float(lo) + (h - lo_p) * (float(hi) - float(lo))],
                pa.float64())
        return pa.table(cols)

    return ds.map_batches(partial, batch_format="pyarrow") \
             .groupby(by).map_groups(finalize, batch_format="pyarrow")


def grouped_mad(ds, *, value_col: str = "value",
                by: str = "event_type", scale: int = 100):
    """Grouped median absolute deviation (the robust spread statistic):
    per ``by``-key, the discrete median of ``|quantum − median(quantum)|``
    where ``quantum = floor(value * scale)``. Two narrow passes over the
    input, each shipping only (key, quantum, count) partials bounded by
    value range × precision — never a corpus-sized shuffle:

    1. the grouped discrete median (`grouped_exact_quantiles` at q=0.5)
       collects to a tiny keys×1 table on the driver, and
    2. a second scan broadcasts that table into the partial closure
       (vectorized ``index_in`` lookup per batch) and folds
       (key, |dev| quantum, count) partials through the same
       `quantile_from_cdf` selection.

    Integer quanta keep every step cross-engine exact; at q=0.5 the
    repo's ceil-rule selection provably equals SQL ``quantile_disc``
    (``floor((n−1)/2)+1 == ceil(n/2)`` for every n), so the DuckDB
    mirror can use the native aggregate. Keys whose values are all
    null/NaN have no median and are dropped (SQL inner-join
    convention). Returns one row per key: ``by``, ``n``, ``mad_cents``.
    """
    med_tb = pa.concat_tables(list(
        grouped_exact_quantiles(ds, value_col=value_col, by=by,
                                qs=(0.5,), scale=scale)
        .iter_batches(batch_size=None, batch_format="pyarrow")))
    med_keys = med_tb.column(by).combine_chunks()
    med_vals = med_tb.column("p50_cents").to_numpy(zero_copy_only=False)

    def partial(t: pa.Table) -> pa.Table:
        v = t.column(value_col).to_numpy(zero_copy_only=False)
        idx = pc.fill_null(pc.index_in(t.column(by),
                                       value_set=med_keys), -1) \
            .to_numpy(zero_copy_only=False)
        ok = ~np.isnan(v) & (idx >= 0)
        dev = np.abs(np.floor(v[ok] * scale).astype(np.int64)
                     - med_vals[idx[ok]])
        tt = pa.table({by: t.column(by).filter(pa.array(ok)),
                       "q": pa.array(dev, pa.int64())})
        g = tt.group_by([by, "q"]).aggregate([("q", "count")])
        return pa.table({by: g.column(by), "q": g.column("q"),
                         "cnt": pc.cast(g.column("q_count"), pa.int64())})

    def finalize(grp: pa.Table) -> pa.Table:
        quanta = grp.column("q").to_numpy(zero_copy_only=False)
        cnt = grp.column("cnt").to_numpy(zero_copy_only=False)
        order = np.argsort(quanta, kind="stable")
        uniq, start = np.unique(quanta[order], return_index=True)
        cum = np.cumsum(np.add.reduceat(cnt[order], start))
        return pa.table({
            by: grp.column(by).slice(0, 1).combine_chunks(),
            "n": pa.array([int(cum[-1])], pa.int64()),
            "mad_cents": pa.array([quantile_from_cdf(uniq, cum, 0.5)],
                                  pa.int64())})

    return ds.map_batches(partial, batch_format="pyarrow") \
             .groupby(by).map_groups(finalize, batch_format="pyarrow")


def global_discrete_quantile(ds, *, value_col: str, q: float,
                             scale: int = 1) -> tuple[int, int]:
    """EXACT corpus-wide discrete quantile of ``floor(value * scale)``
    with no shuffle at all: each batch pre-aggregates to (quantum,
    count) rows — bounded by the value range × precision, never the
    corpus — and the driver folds them into one dict and takes the
    smallest quantum whose cumulative count reaches ``ceil(q * n)``
    (the `grouped_exact_quantiles` selection rule with a single
    implicit group). Returns ``(threshold_quantum, n_rows)``.

    This is the threshold half of a quantile-gated filter ("drop the
    bottom p% by quality"): compute once, broadcast the scalar into
    the filter stage's closure. Nulls/NaNs are ignored (SQL-aggregate
    convention)."""
    if not (0.0 < q <= 1.0):
        raise ValueError(f"q must be in (0, 1]: {q!r}")
    uniq, cum = fold_quantum_cdf(ds, value_col=value_col, scale=scale)
    if len(uniq) == 0:
        raise ValueError(f"no non-null {value_col!r} values")
    return quantile_from_cdf(uniq, cum, q), int(cum[-1])


def quantile_from_cdf(uniq: np.ndarray, cum: np.ndarray,
                      q: float) -> int:
    """The repo's ONE discrete-quantile selection rule: the smallest
    quantum whose cumulative count reaches ``ceil(q * n)`` — float
    ``np.ceil`` on the double product, exactly the SQL mirrors'
    ``MIN(q) ... WHERE cum >= CEIL(q * n)``. Every quantile-shaped
    query (thresholds, medians, MAD, winsorize bounds) must select
    through this helper so the cross-engine-exact expression lives in
    one place."""
    total = int(cum[-1])
    idx = int(np.searchsorted(cum, np.ceil(q * total), side="left"))
    return int(uniq[idx])


def fold_quantum_cdf(ds, *, value_col: str, scale: int = 1) \
        -> tuple[np.ndarray, np.ndarray]:
    """Exact corpus-wide discrete CDF of ``floor(value * scale)``:
    per-batch (quantum, count) partials — bounded by the value range ×
    precision, never the corpus — folded into sorted quanta and their
    cumulative counts ``(uniq, cum)``; ``cum[i]`` = number of rows with
    quantum ≤ ``uniq[i]``. Nulls/NaNs are ignored (SQL-aggregate
    convention). The broadcastable half of quantile thresholds
    (`global_discrete_quantile`) and per-row percentile ranks."""

    def partial(t: pa.Table) -> pa.Table:
        v = pc.cast(t.column(value_col), pa.float64()) \
            .to_numpy(zero_copy_only=False)
        ok = ~np.isnan(v)
        quanta = np.floor(v[ok] * scale).astype(np.int64)
        uniq, counts = np.unique(quanta, return_counts=True)
        return pa.table({"q": pa.array(uniq, pa.int64()),
                         "cnt": pa.array(counts.astype(np.int64),
                                         pa.int64())})

    acc: dict[int, int] = {}
    for b in ds.map_batches(partial, batch_format="pyarrow") \
            .iter_batches(batch_size=None, batch_format="pyarrow"):
        for quantum, cnt in zip(
                b.column("q").to_numpy(zero_copy_only=False),
                b.column("cnt").to_numpy(zero_copy_only=False)):
            acc[int(quantum)] = acc.get(int(quantum), 0) + int(cnt)
    uniq = np.array(sorted(acc), np.int64)
    cum = np.cumsum([acc[int(u)] for u in uniq]).astype(np.int64) \
        if len(uniq) else np.array([], np.int64)
    return uniq, cum


def profile_columns(ds, columns: list[str]) -> pa.Table:
    """Data-quality profile of numeric/timestamp columns: one row per
    column with ``n`` (rows), ``n_null``, ``min_v``/``max_v`` (DOUBLE).
    The ingest-validation step of a pipeline (row counts match the
    manifest, null explosions surface, value ranges sanity-check)
    without one query per column.

    Scale shape: each batch emits ONE fixed row per column (min/max
    are selections, not accumulations — a DOUBLE passes through
    bit-exactly, so the cross-engine compare stays exact; sums are
    deliberately absent); the driver folds ``blocks × columns`` rows
    with one arrow group_by. NaNs are excluded from min/max like
    nulls (numpy min would otherwise propagate NaN where SQL
    comparisons order it last — mirror with ``FILTER (WHERE NOT
    isnan(x))``)."""

    def partial(t: pa.Table) -> pa.Table:
        names, ns, nulls, mins, maxs = [], [], [], [], []
        for c in columns:
            col = t.column(c)
            # timestamps have no direct cast to double: hop via int64
            # (epoch micros)
            if pa.types.is_timestamp(col.type):
                col = pc.cast(col, pa.int64())
            v = pc.cast(col, pa.float64()).to_numpy(zero_copy_only=False)
            col = t.column(c)
            ok = ~np.isnan(v)
            names.append(c)
            ns.append(t.num_rows)
            nulls.append(col.null_count)
            mins.append(float(v[ok].min()) if ok.any() else None)
            maxs.append(float(v[ok].max()) if ok.any() else None)
        return pa.table({
            "col": pa.array(names, pa.string()),
            "n": pa.array(ns, pa.int64()),
            "n_null": pa.array(nulls, pa.int64()),
            "min_v": pa.array(mins, pa.float64()),
            "max_v": pa.array(maxs, pa.float64())})

    batches = list(ds.map_batches(partial, batch_format="pyarrow")
                   .iter_batches(batch_size=None, batch_format="pyarrow"))
    if not batches:
        # a zero-batch input (empty/filtered-away ingest) is exactly
        # what a validation profile must REPORT, not crash on
        return pa.table({
            "col": pa.array(columns, pa.string()),
            "n": pa.array([0] * len(columns), pa.int64()),
            "n_null": pa.array([0] * len(columns), pa.int64()),
            "min_v": pa.nulls(len(columns), pa.float64()),
            "max_v": pa.nulls(len(columns), pa.float64())})
    merged = pa.concat_tables(batches)
    g = merged.group_by("col").aggregate(
        [("n", "sum"), ("n_null", "sum"), ("min_v", "min"),
         ("max_v", "max")])
    return pa.table({
        "col": g.column("col"),
        "n": pc.cast(g.column("n_sum"), pa.int64()),
        "n_null": pc.cast(g.column("n_null_sum"), pa.int64()),
        "min_v": g.column("min_v_min"),
        "max_v": g.column("max_v_max")})


# ----------------------------------------------------- keep-latest compaction

def _key_codes(col) -> np.ndarray:
    """Per-batch integer codes for an arbitrary key column (grouping
    within one batch only — codes are NOT stable across batches and
    never leave the kernel). Non-null integer keys pass through
    zero-copy; everything else goes through arrow's
    ``dictionary_encode`` — the same single C pass as pandas
    factorize without the pandas conversion — with nulls mapped to
    one fresh code (SQL ``PARTITION BY`` puts all NULLs in one
    partition)."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if pa.types.is_integer(col.type) and col.null_count == 0:
        return col.to_numpy(zero_copy_only=False)
    enc = col.dictionary_encode()
    idx = pc.fill_null(pc.cast(enc.indices, pa.int64()),
                       len(enc.dictionary))
    return idx.to_numpy(zero_copy_only=False)


def keep_latest(ds, *, key: str, order_by: tuple[str, ...],
                n_buckets: int):
    """Compaction: keep ONE row per ``key`` — the row with the maximum
    ``order_by`` tuple (``ROW_NUMBER() OVER (PARTITION BY key ORDER BY
    order_by... DESC) = 1``). The upsert/keep-newest-version primitive
    of a curation pipeline (latest snapshot per document id, last event
    per user).

    Scale shape: keep-latest is an associative, commutative SELECTION,
    so each batch first compacts locally (≤ one row per distinct key
    per batch — a narrow pass that does the heavy reduction where the
    data already is), and only those survivors enter ONE keyed bucketed
    shuffle whose groups re-apply the same kernel. The all-to-all moves
    at most ``keys × blocks`` rows, never the corpus. Buckets must be
    sized by the caller (`adaptive_buckets` over the parquet footer
    count — ``.count()`` on a transformed lineage would execute it
    once just for sizing).

    ``order_by`` columns must be integers or timestamps (cast to int64
    epoch internally) and should form a total order per key (append a
    unique id as the last tiebreak; otherwise ties resolve
    deterministically but arbitrarily). NULL order values sort as
    -inf (oldest). The reference engine has no compaction operator —
    its registrar keeps latest-offset state per file
    (filebeat/registrar semantics); this is that idea generalized to
    a keyed dataset."""
    from .util import fnv1a_bucket

    def kernel(t: pa.Table) -> pa.Table:
        return keep_latest_table(t, key=key, order_by=order_by)

    def add_bucket(t: pa.Table) -> pa.Table:
        return t.append_column(
            "__kl_bkt", fnv1a_bucket(t.column(key), n_buckets))

    def final(g: pa.Table) -> pa.Table:
        return kernel(g.drop_columns(["__kl_bkt"]))

    return (ds.map_batches(kernel, batch_format="pyarrow")
              .map_batches(add_bucket, batch_format="pyarrow")
              .groupby("__kl_bkt")
              .map_groups(final, batch_format="pyarrow"))


def keep_latest_table(t: pa.Table, *, key: str,
                      order_by: tuple[str, ...]) -> pa.Table:
    """One-table keep-latest compaction: the row with the max
    ``order_by`` tuple per ``key`` (see :func:`keep_latest` for the
    semantics). Single-sourced so the batch stages and the streaming
    upsert cache (``streaming.LatestEventState``) fold the LITERAL
    same kernel — the flush ≡ batch parity claim rests on it."""
    if t.num_rows == 0:
        return t
    i64min = np.iinfo(np.int64).min
    karr = _key_codes(t.column(key))
    ocols = [pc.fill_null(pc.cast(t.column(c), pa.int64()), i64min)
             .to_numpy(zero_copy_only=False) for c in order_by]
    # lexsort: last key is primary → (tiebreaks..., first order
    # col, key); the LAST row of each key run is its max
    order = np.lexsort(tuple(reversed(ocols)) + (karr,))
    ks = karr[order]
    last = np.append(ks[1:] != ks[:-1], True)
    return t.take(pa.array(order[np.nonzero(last)[0]], pa.int64()))


# ------------------------------------------------------- rollup aggregate

def rollup_cents_partial(keys: list[str], cents_col: str,
                         sets: list[tuple[str, ...]] | None = None):
    """Partial kernel for a one-pass ROLLUP / CUBE / GROUPING SETS
    aggregate: for each batch, emit partial (sum, count) rows for
    EVERY grouping set, tagged with the SQL ``GROUPING()`` bitmask in
    ``lvl`` (bit i set = keys[i] rolled up). ``sets`` defaults to the
    ROLLUP levels (full tuple, each proper prefix, grand total —
    levels 0, 1, 3 for two keys); pass all subsets for CUBE or any
    explicit list for GROUPING SETS. Rolled-up key slots carry ``""``
    placeholders through the combine (constant within a level, so they
    collide with nothing — ``lvl`` is part of the combine key) and
    :func:`rollup_null_levels` nulls them afterwards.

    One scan, one combine: the naive alternative re-aggregates the
    corpus once per grouping set. Partial output is bounded by
    ``Σ_set distinct(set keys)`` per batch — fixed-width rows,
    independent of batch size. String keys only (the placeholder is a
    string); cents must already be an exact int64 column (see the
    half-away cents recipe in `util.hour_cents_partial`). Edge: a
    dataset that yields ZERO batches emits no rows at all, where SQL
    would still return one grand-total row (COUNT 0, SUM NULL) — an
    all-empty-batches input does emit it."""
    if sets is None:
        sets = [tuple(keys[:p]) for p in range(len(keys), -1, -1)]
    seen = set()
    for s in sets:
        if not set(s) <= set(keys):
            raise ValueError(f"grouping set {s!r} not a subset of {keys}")
        if len(set(s)) != len(s):
            raise ValueError(f"grouping set {s!r} repeats a key")
        # canonicalize before the duplicate check: the kernel reorders
        # each set to the caller's key order, so ('b','a') IS ('a','b')
        # and letting both through would silently double the aggregates
        canon = frozenset(s)
        if canon in seen:
            raise ValueError(f"duplicate grouping set {s!r}")
        seen.add(canon)

    def partial(t: pa.Table) -> pa.Table:
        outs = []
        nk = len(keys)
        for kept_set in sets:
            lvl = sum(1 << (nk - 1 - i) for i, k in enumerate(keys)
                      if k not in kept_set)
            # keep the caller's key order, not the set's
            kept = [k for k in keys if k in kept_set]
            if kept:
                # COUNT(*) semantics (count_all), matching the SQL
                # oracles — plain "count" is only_valid and would drop
                # null-cents rows from n
                g = (t.select(kept + [cents_col]).group_by(kept)
                     .aggregate([(cents_col, "sum"), ([], "count_all")]))
                n = g.num_rows
                cols = {c: g.column(c) for c in kept}
                sums = g.column(f"{cents_col}_sum")
                cnts = pc.cast(g.column("count_all"), pa.int64())
            else:
                n = 1
                cols = {}
                c = t.column(cents_col)
                # SUM of no/all-null values is NULL (SQL), not 0; the
                # combine's Sum skips null partials, so an all-null
                # input stays NULL end-to-end
                sums = pa.array([pc.sum(c).as_py()], pa.int64())
                cnts = pa.array([len(c)], pa.int64())
            for k in keys:
                if k not in kept_set:
                    cols[k] = pa.array([""] * n, pa.string())
            cols["lvl"] = pa.array([lvl] * n, pa.int64())
            cols["__sum"] = sums
            cols["__n"] = cnts
            outs.append(pa.table({c: cols[c] for c in
                                  keys + ["lvl", "__sum", "__n"]}))
        return pa.concat_tables(outs)

    return partial


def cube_sets(keys: list[str]) -> list[tuple[str, ...]]:
    """All subsets of ``keys`` — the ``GROUP BY CUBE`` grouping-set
    list for :func:`rollup_cents_partial`."""
    from itertools import combinations
    return [s for r in range(len(keys), -1, -1)
            for s in combinations(keys, r)]


def rollup_null_levels(t: pa.Table, keys: list[str]) -> pa.Table:
    """Replace the rollup placeholder ``""`` with NULL in every key
    slot whose ``lvl`` bit is set — after this the rows match SQL
    ``GROUP BY ROLLUP`` output exactly."""
    lvl = t.column("lvl").to_numpy(zero_copy_only=False)
    nk = len(keys)
    for i, k in enumerate(keys):
        rolled = pa.array((lvl >> (nk - 1 - i)) & 1 > 0)
        col = t.column(k)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        t = t.set_column(t.column_names.index(k), k,
                         pc.if_else(rolled, pa.scalar(None, pa.string()),
                                    col))
    return t


# ------------------------------------------------------- funnel analysis

def funnel_first_conversion(ds, *, first_type: str, then_type: str,
                            within_us: int, n_buckets: int,
                            user_col: str = "user_id",
                            ts_col: str = "ts",
                            type_col: str = "event_type"):
    """Two-step funnel: for each user, the FIRST ``first_type`` event
    and the first ``then_type`` event STRICTLY after it within
    ``within_us`` microseconds — emitted only for converting users
    (inner-join semantics). The activation/conversion primitive
    (signup→first-action, click→purchase) that sessionization and
    plain window functions don't express.

    Scale shape: a narrow pre-pass keeps only the two event types and
    locally combines the ``first_type`` side to one (user, min ts) row
    per user PER BATCH, so the single keyed shuffle moves the
    ``then_type`` rows plus ``users × blocks`` compacted firsts — never
    the corpus. The per-bucket kernel is one lexsort over the merged
    rows: candidates sort before their user's query row (ties on ts
    break query-last, making "strictly after" positional), and one
    reversed ``np.minimum.accumulate`` finds each query's next
    candidate row — no per-user python loop.

    Null timestamps are dropped in the pre-pass (SQL MIN/comparison
    semantics ignore them). Output: ``(user_col, first_ts, conv_ts)``
    as timestamp[us].
    """
    from .util import int_bucket

    if within_us <= 0:
        raise ValueError(f"within_us must be positive: {within_us}")

    def tag(t: pa.Table) -> pa.Table:
        c = funnel_compact(t, first_type=first_type,
                           then_type=then_type, user_col=user_col,
                           ts_col=ts_col, type_col=type_col)
        return pa.table({"__fn_bkt": int_bucket(c.column("u"),
                                                n_buckets),
                         "side": c.column("side"), "u": c.column("u"),
                         "t": c.column("t")})

    def grp(g: pa.Table) -> pa.Table:
        return funnel_kernel(g, within_us=within_us, user_col=user_col)

    return (ds.map_batches(tag, batch_format="pyarrow")
              .groupby("__fn_bkt")
              .map_groups(grp, batch_format="pyarrow"))


def pav_blocks(npos, cnt) -> list:
    """Pool-adjacent-violators over positional (n_pos, n) pairs —
    EXACT: merge decisions by integer cross-multiplication, ``>=`` so
    adjacent equal-mean blocks pool (maximal equal-fit runs, matching
    a GROUP-BY-fit oracle). → ``[[sum_pos, sum_n, lo_idx, hi_idx]]``.
    Shared verbatim by ``q_isotonic_fit`` and its brute-force
    property test, so the tested loop IS the production loop."""
    stack: list[list[int]] = []
    for i in range(len(npos)):
        stack.append([int(npos[i]), int(cnt[i]), i, i])
        while len(stack) > 1 and (stack[-2][0] * stack[-1][1]
                                  >= stack[-1][0] * stack[-2][1]):
            sp, sn, lo, _ = stack[-2]
            sp2, sn2, _, hi = stack.pop()
            stack[-1] = [sp + sp2, sn + sn2, lo, hi]
    return stack


def funnel_compact(t: pa.Table, *, first_type: str, then_type: str,
                   user_col: str = "user_id", ts_col: str = "ts",
                   type_col: str = "event_type") -> pa.Table:
    """The funnel pre-pass as a standalone kernel (shared verbatim by
    the batch :func:`funnel_first_conversion` tag stage and the
    streaming :class:`raybeats.streaming.StreamFunnelState`, so their
    parity cannot drift): keep the two event types, locally combine
    the first-step side to one (user, min ts) row per user, drop null
    timestamps. → columns (side[1=first-step,0=candidate], u, t)."""
    typ = t.column(type_col)
    ok_ts = pc.is_valid(t.column(ts_col))
    a = t.filter(pc.and_(pc.fill_null(
        pc.equal(typ, first_type), False), ok_ts))
    b = t.filter(pc.and_(pc.fill_null(
        pc.equal(typ, then_type), False), ok_ts))
    ag = pa.table({
        "u": a.column(user_col),
        "t": pc.cast(a.column(ts_col), pa.int64()),
    }).group_by("u").aggregate([("t", "min")])
    u = pa.concat_arrays([
        pc.cast(ag.column("u"), pa.int64()).combine_chunks(),
        pc.cast(b.column(user_col), pa.int64()).combine_chunks()])
    ts = pa.concat_arrays([
        pc.cast(ag.column("t_min"), pa.int64()).combine_chunks(),
        pc.cast(b.column(ts_col), pa.int64()).combine_chunks()])
    side = pa.array(np.concatenate([
        np.ones(ag.num_rows, np.int8),
        np.zeros(b.num_rows, np.int8)]))
    return pa.table({"side": side, "u": u, "t": ts})


def funnel_kernel(g: pa.Table, *, within_us: int,
                  user_col: str = "user_id") -> pa.Table:
    """The funnel per-group join kernel on (side, u, t) rows (shared
    by batch and streaming — see :func:`funnel_compact`): one lexsort,
    candidates tie-sorted before their user's query row so "strictly
    after" is positional, one reversed minimum.accumulate."""
    def empty() -> pa.Table:
        return pa.table({user_col: pa.array([], pa.int64()),
                         "first_ts": pa.array([], pa.timestamp("us")),
                         "conv_ts": pa.array([], pa.timestamp("us"))})

    side = g.column("side").to_numpy(zero_copy_only=False)
    u = g.column("u").to_numpy(zero_copy_only=False)
    t = g.column("t").to_numpy(zero_copy_only=False)
    am = side == 1
    au, at_ = u[am], t[am]
    # fold the per-batch firsts to the global per-user first ts
    order = np.lexsort((at_, au))
    au, at_ = au[order], at_[order]
    first = np.append(True, au[1:] != au[:-1]) if len(au) else \
        np.array([], bool)
    au, at0 = au[first], at_[first]
    pu, pt = u[~am], t[~am]
    if len(au) == 0 or len(pu) == 0:
        return empty()
    cu = np.concatenate([pu, au])
    ct = np.concatenate([pt, at0])
    isq = np.concatenate([np.zeros(len(pu), np.int8),
                          np.ones(len(au), np.int8)])
    order = np.lexsort((isq, ct, cu))
    cu_s, ct_s, isq_s = cu[order], ct[order], isq[order]
    n = len(cu_s)
    pos = np.where(isq_s == 0, np.arange(n), n)
    nxt = np.minimum.accumulate(pos[::-1])[::-1]
    qi = np.nonzero(isq_s == 1)[0]
    j = nxt[qi]
    ok = j < n
    jj = np.where(ok, j, 0)
    ok &= cu_s[jj] == cu_s[qi]
    ok &= ct_s[jj] <= ct_s[qi] + within_us
    if not ok.any():
        return empty()
    return pa.table({
        user_col: pa.array(cu_s[qi][ok], pa.int64()),
        "first_ts": pa.array(ct_s[qi][ok], pa.int64())
        .cast(pa.timestamp("us")),
        "conv_ts": pa.array(ct_s[jj][ok], pa.int64())
        .cast(pa.timestamp("us"))})


# --------------------------------------------- distributed ROW_NUMBER

def global_row_number(ds, *, value_col: str, id_col: str, id_max: int,
                      scale: int = 1, n_id_buckets: int | None = None):
    """Distributed dense row numbering: ``ROW_NUMBER() OVER (ORDER BY
    floor(value*scale), id)`` with NO global sort — the
    rank-the-corpus-by-score step (order documents by quality score,
    take a global position) expressed as order statistics.

    Two-level decomposition: the primary order key is the quantized
    value (the `quantiles` contract), the tiebreak is the id. Pass 1
    (narrow, shuffle-free) counts rows per (quantum, id_bucket) cell,
    where ``id_bucket`` is the monotone id-range bucketing of
    `pack_sequences` — monotone in id, so cell order IS row order
    within a quantum. The driver folds ``blocks × cells`` fixed-width
    partials and exclusive-prefix-sums them in (quantum, id_bucket)
    order. Pass 2 is ONE keyed shuffle on the cell; each group sorts
    its ids locally and adds its cell's offset.

    The two-level cell bounds every shuffle group by the id-bucket
    target EVEN when every row carries the same value — the all-ties
    worst case that would make a per-quantum cogroup corpus-sized.
    Cells are 24-byte fixed-width rows, at most
    ``distinct-quanta × n_id_buckets`` and at least one per
    ``target_rows`` input rows; a corpus whose cell table outgrows the
    driver should ``ray.put`` the offset arrays instead of shipping
    the dict in the closure (noted, not needed at current scale).

    Ids must be non-negative, ≤ ``id_max`` and unique (rows tied on
    BOTH keys would take interchangeable ranks — same output multiset,
    but the per-row assignment would be arbitrary). Null/NaN values
    are excluded (SQL-aggregate convention... a SQL ROW_NUMBER would
    rank NULLs last; mirror with a WHERE on both sides). Output:
    ``(id_col, value_cents, rnk)``.
    """
    from .util import adaptive_buckets, range_bucket_step
    span = id_max + 1
    if n_id_buckets is None:
        n_id_buckets = adaptive_buckets(span)
    step = range_bucket_step(span, n_id_buckets)

    def to_cells(t: pa.Table) -> pa.Table:
        v = pc.cast(t.column(value_col), pa.float64()) \
            .to_numpy(zero_copy_only=False)
        ok = ~np.isnan(v)
        ids = t.column(id_col).to_numpy(zero_copy_only=False)[ok]
        q = np.floor(v[ok] * scale).astype(np.int64)
        b = ids.astype(np.int64) // step
        return pa.table({"__q": pa.array(q, pa.int64()),
                         "__b": pa.array(b.astype(np.int32), pa.int32()),
                         id_col: pa.array(ids.astype(np.int64),
                                          pa.int64())})

    # both passes consume the projection; materialize the 3-int-column
    # slice so the upstream read/transform executes once (spillable)
    cells = ds.map_batches(to_cells, batch_format="pyarrow") \
        .materialize()

    def cell_counts(t: pa.Table) -> pa.Table:
        g = t.group_by(["__q", "__b"]).aggregate([("__q", "count")])
        return pa.table({"__q": g.column("__q"), "__b": g.column("__b"),
                         "cnt": pc.cast(g.column("__q_count"),
                                        pa.int64())})

    # vectorized fold of the blocks × cells partials: one lexsort +
    # reduceat over the concatenated arrays (the pack_sequences fold
    # shape); only the UNIQUE cells touch python, building the dict
    qs_l, bs_l, cs_l = [], [], []
    for t in cells.map_batches(cell_counts, batch_format="pyarrow") \
            .iter_batches(batch_size=None, batch_format="pyarrow"):
        qs_l.append(t.column("__q").to_numpy(zero_copy_only=False))
        bs_l.append(t.column("__b").to_numpy(zero_copy_only=False))
        cs_l.append(t.column("cnt").to_numpy(zero_copy_only=False))
    qs = np.concatenate(qs_l) if qs_l else np.array([], np.int64)
    bs = np.concatenate(bs_l) if bs_l else np.array([], np.int64)
    cs = np.concatenate(cs_l) if cs_l else np.array([], np.int64)
    order = np.lexsort((bs, qs))
    qs, bs, cs = qs[order], bs[order], cs[order]
    new_cell = np.append(True, (qs[1:] != qs[:-1]) | (bs[1:] != bs[:-1])) \
        if len(qs) else np.array([], bool)
    starts = np.flatnonzero(new_cell)
    totals = np.add.reduceat(cs, starts) if len(starts) else \
        np.array([], np.int64)
    excl = np.concatenate([[0], np.cumsum(totals)[:-1]]).astype(np.int64) \
        if len(totals) else np.array([], np.int64)
    offs = {(int(q), int(b)): int(o)
            for q, b, o in zip(qs[starts], bs[starts], excl)}

    def rank_group(g: pa.Table) -> pa.Table:
        q = g.column("__q")[0].as_py()
        b = g.column("__b")[0].as_py()
        ids = g.column(id_col).to_numpy(zero_copy_only=False)
        order = np.argsort(ids, kind="stable")
        rnk = offs[(q, b)] + 1 + np.arange(len(ids), dtype=np.int64)
        return pa.table({
            id_col: pa.array(ids[order], pa.int64()),
            "value_cents": pa.array(np.full(len(ids), q, np.int64)),
            "rnk": pa.array(rnk, pa.int64())})

    return cells.groupby(["__q", "__b"]) \
        .map_groups(rank_group, batch_format="pyarrow")


# ------------------------------------------- weighted order statistics

def grouped_weighted_median(ds, *, value_col: str, weight_col: str,
                            by: str, scale: int = 100):
    """Per-``by``-key exact LOWER WEIGHTED MEDIAN of
    ``floor(value·scale)`` quanta under integer weights: the smallest
    quantum whose cumulative weight reaches half the group's total
    (``2·cum ≥ total``). Weighted order statistics generalize
    `grouped_exact_quantiles` — the unweighted op is the special case
    weight ≡ 1 — and power weight-aware curation decisions
    (price-weighted medians, token-weighted length cuts).

    Scale shape is identical to the quantile family: per-batch
    ``(key, quantum, Σweight)`` partials bound the keyed shuffle by
    value range × precision — never corpus size; each group finalizes
    from its weighted CDF with one ``searchsorted`` probe. Weights are
    cast to int64 (must be integral — fractional weights would make
    the half-total comparison engine-dependent); null/NaN values and
    null weights are ignored (SQL aggregate convention).

    Output: one row per key — ``by``, ``total_w`` (int64),
    ``wmedian_cents`` (int64 quantum)."""

    def partial(t: pa.Table) -> pa.Table:
        v = t.column(value_col).to_numpy(zero_copy_only=False)
        w = pc.fill_null(pc.cast(t.column(weight_col), pa.int64()), 0) \
            .to_numpy(zero_copy_only=False)
        ok = ~np.isnan(v)
        tt = pa.table({by: t.column(by).filter(pa.array(ok)),
                       "q": pa.array(np.floor(v[ok] * scale)
                                     .astype(np.int64), pa.int64()),
                       "w": pa.array(w[ok], pa.int64())})
        g = tt.group_by([by, "q"]).aggregate([("w", "sum")])
        return pa.table({by: g.column(by), "q": g.column("q"),
                         "w": pc.cast(g.column("w_sum"), pa.int64())})

    def finalize(grp: pa.Table) -> pa.Table:
        quanta = grp.column("q").to_numpy(zero_copy_only=False)
        w = grp.column("w").to_numpy(zero_copy_only=False)
        order = np.argsort(quanta, kind="stable")
        qs = quanta[order]
        uniq, start = np.unique(qs, return_index=True)
        cum = np.cumsum(np.add.reduceat(w[order], start))
        total = int(cum[-1])
        # smallest quantum with 2*cum >= total  <=>  cum >= ceil(t/2)
        med = int(uniq[np.searchsorted(cum, (total + 1) // 2,
                                       side="left")])
        return pa.table({by: grp.column(by).slice(0, 1).combine_chunks(),
                         "total_w": pa.array([total], pa.int64()),
                         "wmedian_cents": pa.array([med], pa.int64())})

    return ds.map_batches(partial, batch_format="pyarrow") \
             .groupby(by).map_groups(finalize, batch_format="pyarrow")
