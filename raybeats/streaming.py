"""Streaming-shaped execution: micro-batches over an ordered log with
cross-batch keyed state in actors.

Ray Data has no event-time windows/watermarks; the reference is an
unbounded shipper. The bridge (per the Ray Data streaming-workload
pattern): treat the input as a time-ordered sequence of micro-batches
(files / time slices), key the state space into B hash buckets, and hold
each bucket's per-key state in ONE long-lived actor. Each micro-batch is
a keyed shuffle (``groupby(bucket)``) whose per-bucket task forwards its
group to the bucket's actor; the driver advances micro-batches in order,
so every actor sees its keys' rows in event-time order.

This is the documented "raw actors as a last resort" case: a shared
mutable index the Dataset API cannot express. Demonstrated with
incremental sessionization whose final flush equals the batch
``sessionization`` query exactly (tested).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from .util import int_bucket


class SessionState:
    """Per-bucket incremental session tracker (30-min-gap semantics,
    vectorized within each arriving micro-batch)."""

    def __init__(self, gap_us: int):
        self.gap_us = gap_us
        # user -> [last_ts_us, n_sessions, n_events]
        self.state: dict[int, list] = {}

    def process(self, tbl: pa.Table) -> int:
        if tbl.num_rows == 0:
            return 0
        g = tbl.to_pandas().sort_values(["user_id", "ts", "event_id"])
        ts = g["ts"].astype("int64")
        same_user = g["user_id"].eq(g["user_id"].shift())
        brk = ((ts.diff() > self.gap_us) & same_user).astype("int64")
        agg = g.assign(brk=brk, ts_int=ts).groupby("user_id", sort=False) \
            .agg(brks=("brk", "sum"), n=("brk", "size"),
                 first_ts=("ts_int", "min"), last_ts=("ts_int", "max"))
        for user, row in agg.iterrows():
            st = self.state.get(user)
            if st is None:
                self.state[user] = [int(row.last_ts), 1 + int(row.brks),
                                    int(row.n)]
            else:
                gap_break = int(row.first_ts) - st[0] > self.gap_us
                st[0] = int(row.last_ts)
                st[1] += int(row.brks) + (1 if gap_break else 0)
                st[2] += int(row.n)
        return tbl.num_rows

    def flush(self) -> pa.Table:
        users = sorted(self.state)
        return pa.table({
            "user_id": pa.array(users, pa.int64()),
            "n_sessions": pa.array([self.state[u][1] for u in users],
                                   pa.int64()),
            "n_events": pa.array([self.state[u][2] for u in users],
                                 pa.int64()),
        })


class TrailingWindowState:
    """Per-bucket incremental sliding-window counter: for every event,
    the count of that user's events in the trailing ``window_us``
    (inclusive). State per user is only the timestamps still inside the
    window (bounded by window × per-key rate), merged with each arriving
    micro-batch via one searchsorted pass per user.

    Watermark handling: the batch RANGE frame counts equal-timestamp
    PEERS, and a peer of this batch's maximum timestamp may still
    arrive in the next micro-batch (time-ordered input guarantees only
    ts >= max). Rows at the batch max are therefore DEFERRED and
    emitted with the next batch (or at ``flush``), keeping exact parity
    with the batch query across arbitrary micro-batch boundaries."""

    _EMPTY = pa.table({"event_id": pa.array([], pa.int64()),
                       "user_id": pa.array([], pa.int64()),
                       "n_trailing_hour": pa.array([], pa.int64())})

    def __init__(self, window_us: int):
        self.window_us = window_us
        self.buf: dict[int, np.ndarray] = {}
        self.pending: pd.DataFrame | None = None

    def _emit(self, g: pd.DataFrame) -> pa.Table:
        if len(g) == 0:
            return self._EMPTY
        g = g.sort_values(["user_id", "ts", "event_id"])
        out = []
        nothing = np.array([], dtype=np.int64)
        for uid, u in g.groupby("user_id", sort=False):
            ts = u["ts"].astype("int64").to_numpy()
            allts = np.concatenate([self.buf.get(uid, nothing), ts])
            lo = np.searchsorted(allts, ts - self.window_us, side="left")
            hi = np.searchsorted(allts, ts, side="right")
            out.append(pd.DataFrame({
                "event_id": u["event_id"].to_numpy(),
                "user_id": np.int64(uid),
                "n_trailing_hour": (hi - lo).astype("int64")}))
            # keep the boundary value: the batch frame (RANGE ... 1 HOUR
            # PRECEDING) INCLUDES an event exactly window_us older
            self.buf[uid] = allts[allts >= ts[-1] - self.window_us]
        df = pd.concat(out)
        return pa.table({
            "event_id": pa.array(df["event_id"].to_numpy(), pa.int64()),
            "user_id": pa.array(df["user_id"].to_numpy(), pa.int64()),
            "n_trailing_hour": pa.array(df["n_trailing_hour"].to_numpy(),
                                        pa.int64())})

    def process(self, tbl: pa.Table) -> pa.Table:
        frames = [] if self.pending is None else [self.pending]
        if tbl.num_rows:
            frames.append(tbl.to_pandas())
        if not frames:
            return self._EMPTY
        g = pd.concat(frames, ignore_index=True)
        max_ts = g["ts"].astype("int64").max()
        at_max = g["ts"].astype("int64") == max_ts
        self.pending = g[at_max]
        return self._emit(g[~at_max])

    def flush(self) -> pa.Table:
        g, self.pending = self.pending, None
        return self._emit(g if g is not None else pd.DataFrame())


def streaming_sliding_window(micro_batches, window_minutes: int = 60,
                             n_buckets: int = 4):
    """Incremental counterpart of the batch ``sliding_window`` query:
    per-event trailing-window counts over time-ordered micro-batches,
    keyed actor state per bucket. The union of per-batch outputs equals
    the batch query exactly (tested)."""
    import ray

    window_us = window_minutes * 60 * 1_000_000
    Actor = ray.remote(TrailingWindowState)
    actors = [Actor.remote(window_us) for _ in range(n_buckets)]

    def route(g: pd.DataFrame) -> pd.DataFrame:
        bucket = int(g["bucket"].iloc[0])
        tbl = pa.Table.from_pandas(g.drop(columns=["bucket"]),
                                   preserve_index=False)
        res = ray.get(actors[bucket].process.remote(tbl))
        return res.to_pandas()

    def add_bucket(tbl: pa.Table) -> pa.Table:
        return tbl.append_column(
            "bucket", int_bucket(tbl.column("user_id"), n_buckets))

    parts = []
    for slice_ds in micro_batches:
        got = slice_ds.map_batches(add_bucket, batch_format="pyarrow") \
            .groupby("bucket").map_groups(route, batch_format="pandas") \
            .take_all()
        parts.extend(got)
    # end-of-stream: flush deferred max-watermark rows from every actor
    for flushed in ray.get([a.flush.remote() for a in actors]):
        parts.extend(flushed.to_pylist())
    if not parts:
        return pa.table({"event_id": pa.array([], pa.int64()),
                         "user_id": pa.array([], pa.int64()),
                         "n_trailing_hour": pa.array([], pa.int64())})
    import pyarrow.compute as pc  # noqa: F401  (sort below)
    out = pa.Table.from_pylist(parts)
    return out.sort_by([("user_id", "ascending"),
                        ("event_id", "ascending")])


class TumblingWindowState:
    """Per-bucket incremental tumbling-window aggregate: exact integer
    cents sums per (user_id, hour). Each arriving micro-batch folds one
    vectorized arrow partial into the keyed dict — state is one row per
    live window key, flushed at end of stream. Matches the batch
    ``window_agg`` query exactly (same half-away-from-zero rounding)."""

    def __init__(self):
        self.state: dict[tuple[int, int], list[int]] = {}

    def process(self, tbl: pa.Table) -> int:
        import pyarrow.compute as pc
        if tbl.num_rows == 0:
            return 0
        # normalize to µs BEFORE the int cast (source ts may be
        # second-resolution; flush rebuilds timestamp[us] from the ints)
        hour = pc.cast(pc.cast(pc.floor_temporal(tbl.column("ts"),
                                                 unit="hour"),
                               pa.timestamp("us")), pa.int64())
        cents = pc.cast(pc.round(pc.multiply(tbl.column("value"), 100.0),
                                 round_mode="half_towards_infinity"),
                        pa.int64())
        t = pa.table({"u": tbl.column("user_id"), "h": hour, "c": cents})
        g = t.group_by(["u", "h"]).aggregate([("c", "sum"),
                                              ("c", "count")])
        for u, h, s, n in zip(g.column("u").to_pylist(),
                              g.column("h").to_pylist(),
                              g.column("c_sum").to_pylist(),
                              g.column("c_count").to_pylist()):
            st = self.state.setdefault((u, h), [0, 0])
            st[0] += s
            st[1] += n
        return tbl.num_rows

    def flush(self) -> pa.Table:
        keys = sorted(self.state)
        return pa.table({
            "user_id": pa.array([k[0] for k in keys], pa.int64()),
            "hour": pa.array([k[1] for k in keys], pa.timestamp("us")),
            "total_cents": pa.array([self.state[k][0] for k in keys],
                                    pa.int64()),
            "n": pa.array([self.state[k][1] for k in keys], pa.int64()),
        })


def streaming_window_agg(micro_batches, n_buckets: int = 4):
    """Incremental counterpart of the batch ``window_agg`` query
    (tumbling hour windows): keyed actor state per bucket, flush equals
    the batch result exactly (tested)."""
    import ray

    Actor = ray.remote(TumblingWindowState)
    actors = [Actor.remote() for _ in range(n_buckets)]

    def route(g: pd.DataFrame) -> pd.DataFrame:
        bucket = int(g["bucket"].iloc[0])
        tbl = pa.Table.from_pandas(g.drop(columns=["bucket"]),
                                   preserve_index=False)
        n = ray.get(actors[bucket].process.remote(tbl))
        return pd.DataFrame({"bucket": [bucket], "rows": [int(n)]})

    def add_bucket(tbl: pa.Table) -> pa.Table:
        return tbl.append_column(
            "bucket", int_bucket(tbl.column("user_id"), n_buckets))

    for slice_ds in micro_batches:
        slice_ds.map_batches(add_bucket, batch_format="pyarrow") \
            .groupby("bucket").map_groups(route, batch_format="pandas") \
            .take_all()
    parts = [p for p in ray.get([a.flush.remote() for a in actors])
             if p.num_rows]
    if not parts:
        return pa.table({"user_id": pa.array([], pa.int64()),
                         "hour": pa.array([], pa.timestamp("us")),
                         "total_cents": pa.array([], pa.int64()),
                         "n": pa.array([], pa.int64())})
    return pa.concat_tables(parts).sort_by([("user_id", "ascending"),
                                            ("hour", "ascending")])


def streaming_sessionize(micro_batches, gap_minutes: int = 30,
                         n_buckets: int = 4):
    """``micro_batches``: iterable of ``ray.data.Dataset`` slices in
    event-time order (e.g. one per input file / time window). Returns the
    flushed per-user session table, computed incrementally."""
    import ray

    gap_us = gap_minutes * 60 * 1_000_000
    Actor = ray.remote(SessionState)
    actors = [Actor.remote(gap_us) for _ in range(n_buckets)]

    def route(g: pd.DataFrame) -> pd.DataFrame:
        # one task per bucket per micro-batch: forward the whole group to
        # the bucket's state actor and wait (keeps event-time order)
        bucket = int(g["bucket"].iloc[0])
        tbl = pa.Table.from_pandas(g.drop(columns=["bucket"]),
                                   preserve_index=False)
        n = ray.get(actors[bucket].process.remote(tbl))
        return pd.DataFrame({"bucket": [bucket], "rows": [int(n)]})

    def add_bucket(tbl: pa.Table) -> pa.Table:
        return tbl.append_column(
            "bucket", int_bucket(tbl.column("user_id"), n_buckets))

    total = 0
    for slice_ds in micro_batches:
        acks = slice_ds.map_batches(add_bucket, batch_format="pyarrow") \
            .groupby("bucket").map_groups(route, batch_format="pandas") \
            .take_all()
        total += sum(r["rows"] for r in acks)
    parts = ray.get([a.flush.remote() for a in actors])
    nonempty = [p for p in parts if p.num_rows]
    if not nonempty:
        return pa.table({"user_id": pa.array([], pa.int64()),
                         "n_sessions": pa.array([], pa.int64()),
                         "n_events": pa.array([], pa.int64())})
    return pa.concat_tables(nonempty).sort_by("user_id")
