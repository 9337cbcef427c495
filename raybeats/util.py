"""Shared small kernels.

pyarrow has no modulo kernel; for NON-NEGATIVE integers truncating
integer divide is exact, which is the only regime these helpers support
(ids/hashes). String bucketing/hashing uses vectorized FNV-1a over the
arrow buffers (process-stable, unlike python ``hash``, and no per-row
python).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc


def imod(col, b: int) -> pa.Array:
    """``col % b`` for non-negative integer columns."""
    c = pc.cast(col, pa.int64())
    return pc.subtract(c, pc.multiply(pc.divide(c, b), b))


def int_bucket(col, n_buckets: int) -> pa.Array:
    """Deterministic bucket id (int32) for a non-negative int column."""
    return pc.cast(imod(col, n_buckets), pa.int32())


def range_bucket_step(span: int, n_buckets: int) -> int:
    """Step size for MONOTONE id-range bucketing: ``bucket = id //
    step`` lands in ``[0, n_buckets)`` for ``0 <= id < span`` and
    preserves id order across buckets (bucket order IS id order — the
    distributed-prefix-sum contract of pack_sequences /
    global_row_number). Division, not the ``id * n // span`` multiply:
    snowflake-scale ids (id_max ≥ ~2^43 with a 2^20 bucket count)
    would silently wrap int64 in the multiply and break monotonicity."""
    return -(-span // n_buckets)


def range_bucket(col, n_buckets: int, span: int) -> pa.Array:
    """Monotone id-range bucket id (int32) — see `range_bucket_step`."""
    step = range_bucket_step(span, n_buckets)
    return pc.cast(pc.divide(pc.cast(col, pa.int64()), step),
                   pa.int32())


_FNV64_VEC_MAX_LEN = 512  # padded-matrix width bound (see fnv1a_u64)


def fnv1a_u64(col) -> "object":
    """Vectorized 64-bit FNV-1a of a SHORT string column: folded over a
    padded byte matrix built straight from the arrow buffers (no per-row
    python). Memory is ``n_rows × min(max_len, 512)`` bytes: rows longer
    than the bound (a degenerate hex/base64 blob token in a log corpus
    would otherwise inflate the matrix to total_rows × blob_len and OOM
    a worker) are hashed exactly by a per-row fallback instead — same
    FNV-1a value, never a truncation. Returns a numpy uint64 array
    (null → hash of the empty string; mask separately if nulls
    matter)."""
    import numpy as np

    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    col = pc.cast(col, pa.string())
    col = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    n = len(col)
    h = np.full(n, 0xCBF29CE484222325, dtype=np.uint64)
    if n == 0:
        return h
    bufs = col.buffers()
    offs = np.frombuffer(bufs[1], dtype=np.int32)[col.offset:
                                                  col.offset + n + 1]
    data = (np.frombuffer(bufs[2], dtype=np.uint8)
            if bufs[2] is not None else np.zeros(0, np.uint8))
    starts = offs[:-1].astype(np.int64)
    lens = offs[1:].astype(np.int64) - starts
    max_len = int(lens.max())
    fnv = np.uint64(0x100000001B3)
    long_rows = None
    if max_len > _FNV64_VEC_MAX_LEN:
        long_rows = np.nonzero(lens > _FNV64_VEC_MAX_LEN)[0]
        vec_lens = np.where(lens > _FNV64_VEC_MAX_LEN, 0, lens)
        max_len = int(vec_lens.max()) if n else 0
    else:
        vec_lens = lens
    if max_len:
        pos = np.arange(max_len, dtype=np.int64)
        idx = np.minimum(starts[:, None] + pos[None, :],
                         max(0, len(data) - 1))
        valid = pos[None, :] < vec_lens[:, None]
        m = np.where(valid, data[idx], 0).astype(np.uint64)
        for j in range(max_len):
            h = np.where(valid[:, j], (h ^ m[:, j]) * fnv, h)
    if long_rows is not None and len(long_rows):
        mask64 = (1 << 64) - 1
        for i in long_rows:
            v = 0xCBF29CE484222325
            for byte in data[starts[i]:starts[i] + lens[i]].tobytes():
                v = ((v ^ byte) * 0x100000001B3) & mask64
            h[i] = v
    return h


def fnv1a_bucket(col, n_buckets: int) -> pa.Array:
    """Deterministic bucket id (int32) for a SHORT string key column —
    vectorized FNV-1a (see :func:`fnv1a_u64`) mod ``n_buckets``."""
    import numpy as np

    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    col = pc.cast(col, pa.string())
    col = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    if len(col) == 0:
        return pa.array([], pa.int32())
    h = fnv1a_u64(col)
    out = pa.array((h % np.uint64(n_buckets)).astype(np.int32), pa.int32())
    if col.null_count:
        out = pc.if_else(pc.is_valid(col), out, pa.nulls(len(col),
                                                         pa.int32()))
    return out


def fnv1a_u32_fold(col, h=None) -> "object":
    """Vectorized 32-bit FNV-1a over a string column, CHAINABLE: pass the
    previous field's hash vector as ``h`` to hash the concatenation of
    several fields' bytes exactly like the reference's single hasher fed
    field-by-field (``kafka/partition.go:240-277``). Null values
    contribute no bytes. Returns a numpy uint32 array."""
    import numpy as np

    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    col = pc.cast(col, pa.string())
    col = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    n = len(col)
    if h is None:
        h = np.full(n, 0x811C9DC5, dtype=np.uint32)
    else:
        h = h.astype(np.uint32, copy=True)
    if n == 0:
        return h
    bufs = col.buffers()
    offs = np.frombuffer(bufs[1], dtype=np.int32)[col.offset:
                                                  col.offset + n + 1]
    data = (np.frombuffer(bufs[2], dtype=np.uint8)
            if bufs[2] is not None else np.zeros(0, np.uint8))
    starts = offs[:-1].astype(np.int64)
    lens = offs[1:].astype(np.int64) - starts
    if col.null_count:
        valid_mask = np.array(pc.is_valid(col).to_pylist(), dtype=bool)
        lens = np.where(valid_mask, lens, 0)
    max_len = int(lens.max()) if n else 0
    prime = np.uint32(0x01000193)
    if max_len:
        pos = np.arange(max_len, dtype=np.int64)
        idx = np.minimum(starts[:, None] + pos[None, :],
                         max(0, len(data) - 1))
        valid = pos[None, :] < lens[:, None]
        m = np.where(valid, data[idx], 0).astype(np.uint32)
        for j in range(max_len):
            h = np.where(valid[:, j], (h ^ m[:, j]) * prime, h)
    return h


def hour_cents_partial(tbl: pa.Table) -> pa.Table:
    """Shared tumbling-window partial kernel (batch ``window_agg`` query
    AND the streaming ``TumblingWindowState`` fold use THIS function, so
    their flush-equals-batch parity cannot drift): hour-floor the ``ts``
    column (normalized to µs), exact integer cents via DuckDB-compatible
    half-away-from-zero rounding, one partial row per (user_id, hour)."""
    hour = pc.cast(pc.floor_temporal(tbl.column("ts"), unit="hour"),
                   pa.timestamp("us"))
    cents = pc.cast(pc.round(pc.multiply(tbl.column("value"), 100.0),
                             round_mode="half_towards_infinity"),
                    pa.int64())
    t = pa.table({"user_id": tbl.column("user_id"), "hour": hour,
                  "cents": cents})
    g = t.group_by(["user_id", "hour"]).aggregate(
        [("cents", "sum"), ("cents", "count")])
    return pa.table({"user_id": g.column("user_id"),
                     "hour": g.column("hour"),
                     "total_cents": g.column("cents_sum"),
                     "n": pc.cast(g.column("cents_count"), pa.int64())})


def adaptive_buckets(nrows: int, target_rows: int = 100_000,
                     lo: int = 64, hi: int = 1 << 20) -> int:
    """Bucket count for coarsened keyed shuffles: scales LINEARLY with
    input so per-group materialization stays bounded near ``target_rows``
    rows (a fixed count would make each group 1/k of the whole dataset —
    ~1.6 TB per group at 100 TB with k=64). Never below ``lo`` (the
    parallelism floor) nor above ``hi``."""
    import math
    return int(max(lo, min(hi, math.ceil(nrows / max(1, target_rows)))))


def running_cents_fold(tbl: pa.Table,
                       carry: dict[int, int] | None = None) -> pa.Table:
    """Shared per-user running-total kernel (the batch ``running_sum``
    query AND the streaming ``RunningTotalState`` fold use THIS
    function, so their parity cannot drift — the hour_cents_partial
    convention): sort by (user_id, ts, event_id), exact half-away
    int64 cents, segmented cumulative sum via per-segment ``np.repeat``
    bases (correct for negative values). With ``carry`` (streaming),
    each user's segment continues from the carried total and the dict
    is updated in place with the new totals."""
    import numpy as np

    u = tbl.column("user_id").to_numpy(zero_copy_only=False)
    ts = pc.cast(tbl.column("ts"), pa.int64()).to_numpy(
        zero_copy_only=False)
    eid = tbl.column("event_id").to_numpy(zero_copy_only=False)
    cents = pc.cast(pc.round(pc.multiply(tbl.column("value"), 100.0),
                             round_mode="half_towards_infinity"),
                    pa.int64()).to_numpy(zero_copy_only=False)
    order = np.lexsort((eid, ts, u))
    us = u[order]
    cum = np.cumsum(cents[order])
    starts = np.nonzero(np.append(True, us[1:] != us[:-1]))[0]
    seg_base = np.zeros(len(starts), np.int64)
    seg_base[1:] = cum[starts[1:] - 1]
    lens = np.diff(np.append(starts, len(us)))
    run = cum - np.repeat(seg_base, lens)
    if carry is not None and len(starts):
        seg_users = us[starts]
        base = np.array([carry.get(int(x), 0) for x in seg_users],
                        np.int64)
        run = run + np.repeat(base, lens)
        for x, tot in zip(seg_users, run[starts + lens - 1]):
            carry[int(x)] = int(tot)
    return pa.table({
        "event_id": pa.array(eid[order], pa.int64()),
        "user_id": pa.array(us, pa.int64()),
        "running_cents": pa.array(run, pa.int64())})
