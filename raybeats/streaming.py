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
