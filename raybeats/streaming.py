"""Streaming-shaped execution: micro-batches over an ordered log with
cross-batch keyed state in actors.

Ray Data has no event-time windows/watermarks; the reference is an
unbounded shipper. The bridge (per the Ray Data streaming-workload
pattern): treat the input as a time-ordered sequence of micro-batches
(files / time slices), key the state space into B hash buckets, and
host the per-key state in a small pool of long-lived actors (bucket →
actor by modulo). Each micro-batch is a keyed shuffle
(``groupby(bucket)``) whose per-bucket task PUSHES its group to the
bucket's actor asynchronously — no task slot blocks on the actor; the
driver fences micro-batches with an executed-count barrier, so every
actor still sees its keys' rows in event-time order.

This is the documented "raw actors as a last resort" case: a shared
mutable index the Dataset API cannot express. Demonstrated with
incremental sessionization whose final flush equals the batch
``sessionization`` query exactly (tested).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .util import hour_cents_partial, int_bucket


def _drive_keyed_actors(micro_batches, state_cls, ctor_args: tuple,
                        n_buckets: int, collect_rows: bool = False,
                        key_col: str = "user_id",
                        n_actors: int | None = None,
                        restore_dir: str | None = None,
                        checkpoint_dir: str | None = None):
    """Shared micro-batch → keyed-actor fan-in (used by all streaming
    window modes): bucket rows by key, PUSH each bucket's group to its
    state actor asynchronously (fire from the map_groups task, no
    synchronous per-group ``ray.get`` — round-2's blocked-task-slot
    finding), and fence micro-batches with a processed-count barrier so
    every actor sees its keys' rows in event-time order.

    State is keyed by the EVENT key inside ``state_cls``, so buckets
    exist only for shuffle parallelism: a small pool of ``n_actors``
    hosts (bucket → actor by modulo) replaces round 2's one long-lived
    actor per bucket. The barrier awaits each actor's executed-push
    count reaching the acks the route tasks report (one blocking
    ``wait_processed`` ObjectRef per actor per micro-batch — an
    asyncio event inside the actor, no driver poll loop) — a count ≥
    expected proves the pushes EXECUTED (not merely enqueued), which a
    plain marker task cannot (cross-submitter actor-queue order is
    unspecified).

    Exactly-once folds under at-least-once task retries: each push is
    tagged with its ``(micro_batch, bucket)`` id — route runs inside a
    Ray Data ``map_groups`` task, and a worker that dies AFTER
    submitting its push but before its ack row is observed gets
    retried, re-pushing the same group; the actor drops already-seen
    ids, so the retried push neither double-folds state nor
    double-counts toward the barrier (the ack side deduplicates
    naturally: only the successful attempt's ack row reaches
    ``take_all``).

    Returns ``(actors, collected_rows)`` — ``collected_rows`` holds
    the actors' buffered per-batch result rows when ``collect_rows``
    (the actor's ``process`` returns a table)."""
    import ray

    n_actors = n_actors or min(n_buckets, 8)

    class _Host(state_cls):
        """Per-actor wrapper: deduplicates pushes by their
        ``(micro_batch, bucket)`` id (at-least-once task retries replay
        a push; folding it twice would silently diverge from batch),
        counts executed pushes (the barrier signal, asyncio-event
        driven), and buffers per-batch result tables for the driver to
        drain once — results never ride the push path.

        Errors CANNOT be raised out of ``process``: the push is
        fire-and-forget (its ObjectRef is dropped), so a raise would
        only be logged while ``_n_done`` stalls and the driver's count
        barrier waits forever. Instead the first error is captured and
        re-raised from ``wait_processed`` — the call the driver DOES
        ``ray.get`` — so a bad record fails the run loudly instead of
        hanging it. ``wait_processed`` being ``async`` makes the actor
        an asyncio actor, so the blocked barrier call does not stall
        queued ``process`` calls; ``process`` itself is sync (no await
        points), so each fold stays atomic.

        ORDERING INVARIANT (load-bearing): an asyncio actor does NOT
        execute calls in submission order (measured: 50 pushes from
        one submitter ran visibly shuffled). That is safe here only
        because (a) each micro-batch submits exactly ONE push per
        bucket (one map_groups group), (b) pushes for different
        buckets commute (state is keyed by bucket/event key), and
        (c) the driver fences micro-batches on ``wait_processed``
        before the next batch's route tasks can run — so no two
        pushes whose order matters are ever in flight together. A
        state needing several ordered pushes per bucket per
        micro-batch would need sequence numbers instead."""

        def __init__(self, *args):
            import asyncio
            super().__init__(*args)
            self._n_done = 0
            self._buf: list[pa.Table] = []
            self._err: Exception | None = None
            self._seen: set[tuple[int, int]] = set()
            self._done_event = asyncio.Event()

        def process(self, tbl: pa.Table, push_id: tuple[int, int]):
            if push_id in self._seen:
                return None  # retried task replaying its push: drop
            self._seen.add(push_id)
            try:
                res = super().process(tbl)
                if isinstance(res, pa.Table):
                    self._buf.append(res)
            except Exception as e:  # surfaced via wait_processed
                if self._err is None:
                    self._err = e
            finally:
                self._n_done += 1
                self._done_event.set()
            return None

        async def wait_processed(self, expected: int) -> int:
            while self._n_done < expected:
                await self._done_event.wait()
                self._done_event.clear()
            if self._err is not None:
                raise self._err
            return self._n_done

        def drain(self) -> list[pa.Table]:
            out, self._buf = self._buf, []
            return out

        def snapshot(self) -> dict:
            return self.state_tables()

        def restore(self, tables: dict) -> None:
            self.restore_tables(tables)

    Actor = ray.remote(_Host)
    actors = [Actor.remote(*ctor_args) for _ in range(n_actors)]
    if restore_dir is not None:
        # fenced BEFORE any push: asyncio actors give no cross-call
        # ordering, so the restore must be observed complete, not
        # merely enqueued
        ray.get(_restore_actors(actors, n_buckets, restore_dir))

    def make_route(batch_idx: int):
        def route(g: pa.Table) -> pa.Table:
            bucket = int(g.column("bucket")[0].as_py())
            # the bucket column STAYS in the pushed table: states that
            # defer watermark rows must key their pending state per
            # bucket — several buckets share one actor
            # (bucket % n_actors), and a deferral max computed over
            # another bucket's rows would fold a boundary tie
            # prematurely. Async push: the task slot frees as soon as
            # the call is submitted; ordering across micro-batches
            # comes from the driver's barrier below. The (batch,
            # bucket) id makes a retry's replayed push a no-op.
            actors[bucket % n_actors].process.remote(
                g, (batch_idx, bucket))
            return pa.table({"actor": pa.array([bucket % n_actors],
                                               pa.int64())})
        return route

    def add_bucket(tbl: pa.Table) -> pa.Table:
        # null keys route to bucket 0 (int_bucket yields null, and
        # route's int(bucket) would TypeError): SQL PARTITION BY puts
        # NULLs in one partition, and the state kernels key them the
        # same way, so parity with batch holds. States with stricter
        # key contracts (e.g. COUNT DISTINCT) pre-filter nulls
        # themselves.
        return tbl.append_column(
            "bucket", pc.fill_null(
                int_bucket(tbl.column(key_col), n_buckets), 0))

    expected = [0] * n_actors
    for batch_idx, slice_ds in enumerate(micro_batches):
        acks = slice_ds.map_batches(add_bucket, batch_format="pyarrow") \
            .groupby("bucket").map_groups(make_route(batch_idx),
                                          batch_format="pyarrow") \
            .take_all()
        for r in acks:
            expected[int(r["actor"])] += 1
        # event-time fence: micro-batch N+1 must not reach an actor
        # before N's pushes have run there — one blocking ObjectRef
        # per actor, resolved by the actor's own asyncio event
        ray.get([a.wait_processed.remote(e)
                 for a, e in zip(actors, expected)])

    # snapshot AFTER the last barrier (never while pushes are in
    # flight) and BEFORE any flush the caller may run — flush may
    # drain deferred state that must survive into the snapshot
    if checkpoint_dir is not None:
        checkpoint_actors(actors, n_buckets, checkpoint_dir)
    collected: list[dict] = []
    if collect_rows:
        for tables in ray.get([a.drain.remote() for a in actors]):
            for t in tables:
                collected.extend(t.to_pylist())
    return actors, collected


def checkpoint_actors(actors, n_buckets: int, ckpt_dir: str) -> None:
    """Snapshot every streaming actor's state to a parquet checkpoint
    (the streaming-lane counterpart of the batch registrar's
    write-audit-publish manifests): one ``actor=<i>/<component>.
    parquet`` file per state table, then the JSON manifest LAST via
    ``os.replace`` — a crash mid-checkpoint leaves no manifest, so a
    resume either sees the complete snapshot or none of it. The state
    class must expose ``state_tables() -> dict[str, pa.Table]`` /
    ``restore_tables(dict)`` (every streaming state class in this
    module does; a state without the protocol fails loudly at
    snapshot time).
    Barrier-fenced call sites only: checkpoint between micro-batches,
    never while pushes are in flight."""
    import json
    import os

    import pyarrow.parquet as _pq
    import ray

    # collect snapshots FIRST (a failed snapshot must not destroy a
    # still-valid prior checkpoint whose files were never touched),
    # THEN invalidate the prior manifest before the first overwrite:
    # the all-or-nothing guarantee must hold for rolling checkpoints —
    # a crash mid-overwrite must not leave the OLD manifest validating
    # a mix of old and new actor files
    snaps = ray.get([a.snapshot.remote() for a in actors])
    old_manifest = os.path.join(ckpt_dir, "_MANIFEST.json")
    if os.path.exists(old_manifest):
        os.remove(old_manifest)
    files: dict[str, list[str]] = {}
    for i, tables in enumerate(snaps):
        adir = os.path.join(ckpt_dir, f"actor={i}")
        os.makedirs(adir, exist_ok=True)
        files[str(i)] = sorted(tables)
        for name, t in tables.items():
            _pq.write_table(t, os.path.join(adir, f"{name}.parquet"))
    tmp = os.path.join(ckpt_dir, "_MANIFEST.json.tmp")
    with open(tmp, "w") as f:
        json.dump({"n_actors": len(actors), "n_buckets": n_buckets,
                   "files": files}, f)
    os.replace(tmp, os.path.join(ckpt_dir, "_MANIFEST.json"))


def _restore_actors(actors, n_buckets: int, ckpt_dir: str) -> list:
    """→ restore ObjectRefs (caller ``ray.get``s them as the fence).
    Refuses a checkpoint whose actor/bucket layout differs — state is
    keyed per bucket-modulo-actor, so a silent relayout would fold
    keys into the wrong actors."""
    import json
    import os

    import pyarrow.parquet as _pq

    man_path = os.path.join(ckpt_dir, "_MANIFEST.json")
    if not os.path.exists(man_path):
        raise FileNotFoundError(
            f"no streaming checkpoint manifest at {man_path} "
            "(an interrupted checkpoint leaves none — start fresh)")
    with open(man_path) as f:
        man = json.load(f)
    if man["n_actors"] != len(actors) or man["n_buckets"] != n_buckets:
        raise ValueError(
            f"checkpoint layout (actors={man['n_actors']}, "
            f"buckets={man['n_buckets']}) does not match the resume "
            f"call (actors={len(actors)}, buckets={n_buckets})")
    refs = []
    for i, actor in enumerate(actors):
        tables = {name: _pq.read_table(os.path.join(
            ckpt_dir, f"actor={i}", f"{name}.parquet"))
            for name in man["files"][str(i)]}
        refs.append(actor.restore.remote(tables))
    return refs


class _PerBucketPending:
    """Shared keyed watermark-deferral state for the window modes that
    defer boundary rows (Trailing / RunningTotal): pending rows are
    keyed PER BUCKET because several buckets share one actor
    (``bucket % n_actors``) and each push is one bucket's group — a
    deferral max computed over another bucket's (possibly later-ts)
    rows would fold a boundary tie before its same-ts peer arrives.
    Buckets partition the key space, so drain order is irrelevant.
    Single-sourced here so the invariant cannot diverge between the
    deferring modes; payloads are arrow tables end to end."""

    def __init__(self):
        self._pending: dict[int, object] = {}

    @staticmethod
    def bucket_of(tbl: pa.Table) -> int:
        return int(tbl.column("bucket")[0].as_py()) if tbl.num_rows \
            else -1

    @staticmethod
    def check_ts_not_null(tbl: pa.Table) -> None:
        """A null ts cannot be placed in event-time order; raise (the
        _Host wrapper surfaces it through the driver barrier) rather
        than silently dropping (arrow filter) or folding int64-min
        garbage (pandas NaT astype)."""
        if tbl.num_rows and tbl.column("ts").null_count:
            raise ValueError("null ts in a time-ordered stream: the "
                             "row cannot be placed in event-time order")

    def pop_pending(self, bkt: int):
        return self._pending.pop(bkt, None)

    def defer(self, bkt: int, payload) -> None:
        self._pending[bkt] = payload

    def drain_pending(self) -> list:
        out, self._pending = list(self._pending.values()), {}
        return out

    # checkpoint protocol helpers (see checkpoint_actors): the
    # deferral dict serializes as ONE table with a __bkt column so a
    # resumed run re-emits the held boundary rows instead of losing
    # them. Applies when payloads are arrow tables (TransitionState
    # overrides for its array-tuple payloads).
    def pending_state(self) -> pa.Table | None:
        parts = [t.append_column(
            "__bkt", pa.array([bkt] * t.num_rows, pa.int32()))
            for bkt, t in sorted(self._pending.items()) if t.num_rows]
        if not parts:
            return None
        return pa.concat_tables(parts, promote_options="default")

    def restore_pending(self, tbl: pa.Table | None) -> None:
        self._pending = {}
        if tbl is None:
            return
        b = tbl.column("__bkt").to_numpy(zero_copy_only=False)
        t2 = tbl.drop_columns(["__bkt"])
        for bkt in np.unique(b):
            self._pending[int(bkt)] = t2.filter(pa.array(b == bkt))


class SessionState:
    """Per-bucket incremental session tracker (30-min-gap semantics,
    vectorized within each arriving micro-batch)."""

    def __init__(self, gap_us: int):
        self.gap_us = gap_us
        # user -> [last_ts_us, n_sessions, n_events]
        self.state: dict[int, list] = {}

    def process(self, tbl: pa.Table) -> int:
        # null user/ts rows are excluded exactly like the batch
        # query's filter (a NaN key would otherwise split every null
        # row into its own group under numpy's NaN != NaN)
        tbl = tbl.filter(pc.and_(pc.is_valid(tbl.column("user_id")),
                                 pc.is_valid(tbl.column("ts"))))
        if tbl.num_rows == 0:
            return 0
        # the batch sessionization kernel's shape: one lexsort, gap
        # breaks from a shifted diff, per-user partials via reduceat —
        # no pandas hop in the actor fold
        u = tbl.column("user_id").to_numpy(zero_copy_only=False)
        ts = pc.cast(tbl.column("ts"), pa.int64()) \
            .to_numpy(zero_copy_only=False)
        eid = tbl.column("event_id").to_numpy(zero_copy_only=False)
        order = np.lexsort((eid, ts, u))
        u, ts = u[order], ts[order]
        starts = np.flatnonzero(np.append(True, u[1:] != u[:-1]))
        lens = np.diff(np.append(starts, len(u)))
        same_user = np.append(False, u[1:] == u[:-1])
        brk = (same_user
               & (np.append(np.int64(0), np.diff(ts)) > self.gap_us))
        brks = np.add.reduceat(brk.astype(np.int64), starts)
        first_ts, last_ts = ts[starts], ts[starts + lens - 1]
        for i, user in enumerate(u[starts].tolist()):
            st = self.state.get(user)
            if st is None:
                self.state[user] = [int(last_ts[i]), 1 + int(brks[i]),
                                    int(lens[i])]
            else:
                gap_break = int(first_ts[i]) - st[0] > self.gap_us
                st[0] = int(last_ts[i])
                st[1] += int(brks[i]) + (1 if gap_break else 0)
                st[2] += int(lens[i])
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

    # checkpoint protocol (see checkpoint_actors)
    def state_tables(self) -> dict:
        if not self.state:
            return {}
        users = sorted(self.state)
        return {"sessions": pa.table({
            "user_id": pa.array(users, pa.int64()),
            "last_ts": pa.array([self.state[u][0] for u in users],
                                pa.int64()),
            "n_sessions": pa.array([self.state[u][1] for u in users],
                                   pa.int64()),
            "n_events": pa.array([self.state[u][2] for u in users],
                                 pa.int64())})}

    def restore_tables(self, tables: dict) -> None:
        self.state = {}
        t = tables.get("sessions")
        if t is None:
            return
        for u, last, ns, ne in zip(t.column("user_id").to_pylist(),
                                   t.column("last_ts").to_pylist(),
                                   t.column("n_sessions").to_pylist(),
                                   t.column("n_events").to_pylist()):
            self.state[u] = [last, ns, ne]


class TrailingWindowState(_PerBucketPending):
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
        _PerBucketPending.__init__(self)
        self.window_us = window_us
        self.buf: dict[int, np.ndarray] = {}

    def _emit(self, g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return self._EMPTY
        u = g.column("user_id").to_numpy(zero_copy_only=False)
        ts = pc.cast(g.column("ts"), pa.int64()) \
            .to_numpy(zero_copy_only=False)
        eid = g.column("event_id").to_numpy(zero_copy_only=False)
        order = np.lexsort((eid, ts, u))
        u, ts, eid = u[order], ts[order], eid[order]
        starts = np.flatnonzero(np.append(True, u[1:] != u[:-1]))
        lens = np.diff(np.append(starts, len(u)))
        n_out = np.empty(len(u), np.int64)
        nothing = np.array([], dtype=np.int64)
        for s0, ln in zip(starts.tolist(), lens.tolist()):
            uid = int(u[s0])
            seg = slice(s0, s0 + ln)
            tseg = ts[seg]
            allts = np.concatenate([self.buf.get(uid, nothing), tseg])
            lo = np.searchsorted(allts, tseg - self.window_us,
                                 side="left")
            hi = np.searchsorted(allts, tseg, side="right")
            n_out[seg] = hi - lo
            # keep the boundary value: the batch frame (RANGE ... 1 HOUR
            # PRECEDING) INCLUDES an event exactly window_us older
            self.buf[uid] = allts[allts >= tseg[-1] - self.window_us]
        return pa.table({
            "event_id": pa.array(eid, pa.int64()),
            "user_id": pa.array(u, pa.int64()),
            "n_trailing_hour": pa.array(n_out, pa.int64())})

    def process(self, tbl: pa.Table) -> pa.Table:
        self.check_ts_not_null(tbl)
        # null-user rows are excluded like the batch query's filter (a
        # NaN key would split per-row groups under numpy NaN != NaN)
        tbl = tbl.filter(pc.is_valid(tbl.column("user_id")))
        bkt = self.bucket_of(tbl)
        prev = self.pop_pending(bkt)
        tabs = [] if prev is None else [prev]
        if tbl.num_rows:
            tabs.append(tbl)
        if not tabs:
            return self._EMPTY
        g = pa.concat_tables(tabs, promote_options="default")
        ts = pc.cast(g.column("ts"), pa.int64())
        at_max = pc.equal(ts, pc.max(ts))
        self.defer(bkt, g.filter(at_max))
        return self._emit(g.filter(pc.invert(at_max)))

    def flush(self) -> pa.Table:
        tabs = self.drain_pending()
        if not tabs:
            return self._EMPTY
        return self._emit(pa.concat_tables(tabs,
                                           promote_options="default"))

    # checkpoint protocol (see checkpoint_actors): per-user in-window
    # timestamps explode to rows (stored ascending, restored ascending
    # — the searchsorted invariant), deferral via _PerBucketPending
    def state_tables(self) -> dict:
        out = {}
        if self.buf:
            users = sorted(self.buf)
            lens = [len(self.buf[u]) for u in users]
            out["buf"] = pa.table({
                "user_id": pa.array(np.repeat(users, lens), pa.int64()),
                "ts": pa.array(np.concatenate(
                    [self.buf[u] for u in users]), pa.int64())})
        p = self.pending_state()
        if p is not None:
            out["pending"] = p
        return out

    def restore_tables(self, tables: dict) -> None:
        self.buf = {}
        t = tables.get("buf")
        if t is not None and t.num_rows:
            u = t.column("user_id").to_numpy(zero_copy_only=False)
            ts = t.column("ts").to_numpy(zero_copy_only=False)
            starts = np.flatnonzero(np.append(True, u[1:] != u[:-1]))
            lens = np.diff(np.append(starts, len(u)))
            for s0, ln in zip(starts.tolist(), lens.tolist()):
                self.buf[int(u[s0])] = ts[s0:s0 + ln].copy()
        self.restore_pending(tables.get("pending"))


def streaming_sliding_window(micro_batches, window_minutes: int = 60,
                             n_buckets: int = 4,
                             checkpoint_to: str | None = None,
                             restore_from: str | None = None):
    """Incremental counterpart of the batch ``sliding_window`` query:
    per-event trailing-window counts over time-ordered micro-batches,
    keyed actor state per bucket. The union of per-batch outputs equals
    the batch query exactly (tested). ``checkpoint_to`` SUSPENDS the
    stream rather than ending it: deferred watermark rows stay in the
    snapshot (no end-of-stream flush) and emit on the resumed run, so
    run-1 rows ∪ run-2 rows ≡ batch with no duplicates."""
    import ray

    window_us = window_minutes * 60 * 1_000_000
    actors, parts = _drive_keyed_actors(micro_batches, TrailingWindowState,
                                        (window_us,), n_buckets,
                                        collect_rows=True,
                                        restore_dir=restore_from,
                                        checkpoint_dir=checkpoint_to)
    if checkpoint_to is None:
        # end-of-stream: flush deferred max-watermark rows per actor
        for flushed in ray.get([a.flush.remote() for a in actors]):
            parts.extend(flushed.to_pylist())
    if not parts:
        return TrailingWindowState._EMPTY
    return pa.Table.from_pylist(parts).sort_by(
        [("user_id", "ascending"), ("event_id", "ascending")])


class TumblingWindowState:
    """Per-bucket incremental tumbling-window aggregate: exact integer
    cents sums per (user_id, hour). Each arriving micro-batch folds one
    vectorized arrow partial — the SAME ``util.hour_cents_partial``
    kernel the batch ``window_agg`` query uses, so the flush-equals-
    batch parity cannot drift — into the keyed dict; state is one row
    per live window key, flushed at end of stream."""

    def __init__(self):
        self.state: dict[tuple, list[int]] = {}

    def process(self, tbl: pa.Table) -> int:
        if tbl.num_rows == 0:
            return 0
        g = hour_cents_partial(tbl)
        for u, h, s, n in zip(g.column("user_id").to_pylist(),
                              g.column("hour").to_pylist(),
                              g.column("total_cents").to_pylist(),
                              g.column("n").to_pylist()):
            if s is None and n == 0:
                # all-null value group: nothing to fold (arrow's sum of
                # an all-null group is null; the batch combine likewise
                # sums nothing for it)
                continue
            st = self.state.setdefault((u, h), [0, 0])
            st[0] += s or 0
            st[1] += n
        return tbl.num_rows

    def flush(self) -> pa.Table:
        # nulls-last sort key: a (None, hour) window key exists
        # whenever the stream carries null-user rows (arrow group_by
        # emits the null group, like SQL GROUP BY)
        keys = sorted(self.state,
                      key=lambda k: tuple((v is None, v) for v in k))
        return pa.table({
            "user_id": pa.array([k[0] for k in keys], pa.int64()),
            "hour": pa.array([k[1] for k in keys], pa.timestamp("us")),
            "total_cents": pa.array([self.state[k][0] for k in keys],
                                    pa.int64()),
            "n": pa.array([self.state[k][1] for k in keys], pa.int64()),
        })

    # checkpoint protocol (see checkpoint_actors) — one row per live
    # window key, unsorted (keys may carry a null user_id)
    def state_tables(self) -> dict:
        if not self.state:
            return {}
        ks = list(self.state)
        return {"windows": pa.table({
            "user_id": pa.array([k[0] for k in ks], pa.int64()),
            "hour": pa.array([k[1] for k in ks], pa.timestamp("us")),
            "total_cents": pa.array([self.state[k][0] for k in ks],
                                    pa.int64()),
            "n": pa.array([self.state[k][1] for k in ks],
                          pa.int64())})}

    def restore_tables(self, tables: dict) -> None:
        self.state = {}
        t = tables.get("windows")
        if t is None:
            return
        for u, h, s, n in zip(t.column("user_id").to_pylist(),
                              t.column("hour").to_pylist(),
                              t.column("total_cents").to_pylist(),
                              t.column("n").to_pylist()):
            self.state[(u, h)] = [s, n]


def streaming_window_agg(micro_batches, n_buckets: int = 4,
                         checkpoint_to: str | None = None,
                         restore_from: str | None = None):
    """Incremental counterpart of the batch ``window_agg`` query
    (tumbling hour windows): keyed actor state per bucket, flush equals
    the batch result exactly (tested). ``checkpoint_to`` /
    ``restore_from`` snapshot and resume the window state across
    driver runs; the resumed flush covers BOTH runs' rows."""
    import ray

    actors, _ = _drive_keyed_actors(micro_batches, TumblingWindowState,
                                    (), n_buckets,
                                    restore_dir=restore_from,
                                    checkpoint_dir=checkpoint_to)
    parts = [p for p in ray.get([a.flush.remote() for a in actors])
             if p.num_rows]
    if not parts:
        return pa.table({"user_id": pa.array([], pa.int64()),
                         "hour": pa.array([], pa.timestamp("us")),
                         "total_cents": pa.array([], pa.int64()),
                         "n": pa.array([], pa.int64())})
    return pa.concat_tables(parts).sort_by([("user_id", "ascending"),
                                            ("hour", "ascending")])


def kafka_micro_batches(out_dir: str, time_col: str = "ts",
                        n_slices: int = 4, topics: list[str] | None = None,
                        columns: list[str] | None = None,
                        order_cols: tuple[str, ...] | None = None):
    """Bridge the kafka-layout CONSUMER into the streaming modes: yield
    the lanes under ``out_dir`` as ``n_slices`` event-time micro-batch
    Datasets in global time order — exactly the contract
    ``_drive_keyed_actors`` needs (batch N's events precede batch
    N+1's; within a batch the state kernels sort).

    Slice boundaries come from the lane parquet FOOTER statistics
    (metadata-only scan); each slice replays through
    :func:`raybeats.sinks.read_kafka_lanes` with a pushed-down
    time-range predicate, so row groups outside the slice never leave
    storage. A real deployment tails lanes incrementally instead of
    replaying; the slice replay is the deterministic batch equivalent.
    """
    import glob as glob_mod
    import os

    import pyarrow.dataset as pads
    import pyarrow.parquet as pq

    from .sinks import read_kafka_lanes

    files = sorted(glob_mod.glob(os.path.join(
        out_dir, "topic=*", "partition=*", "*.parquet")))
    if topics is not None:
        allowed = {f"topic={t}" for t in topics}
        files = [f for f in files
                 if os.path.basename(os.path.dirname(os.path.dirname(f)))
                 in allowed]
    lo = hi = None
    for f in files:
        md = pq.read_metadata(f)
        idx = md.schema.to_arrow_schema().get_field_index(time_col)
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(idx).statistics
            if st is None or not st.has_min_max:
                # stats disabled for this file: fall back to a pruned
                # single-column read
                col = pq.read_table(f, columns=[time_col]).column(0)
                import pyarrow.compute as pc2
                mn, mx = pc2.min(col).as_py(), pc2.max(col).as_py()
            else:
                mn, mx = st.min, st.max
            lo = mn if lo is None or mn < lo else lo
            hi = mx if hi is None or mx > hi else hi
    if lo is None:
        return
    lo_us = pa.scalar(lo, pa.timestamp("us")).value
    hi_us = pa.scalar(hi, pa.timestamp("us")).value
    step = max(1, (hi_us - lo_us) // n_slices + 1)
    for k in range(n_slices):
        a = pa.scalar(lo_us + k * step, pa.timestamp("us"))
        b = pa.scalar(min(lo_us + (k + 1) * step, hi_us + 1),
                      pa.timestamp("us"))
        if a.value > hi_us:
            break
        expr = (pads.field(time_col) >= a) & (pads.field(time_col) < b)
        yield read_kafka_lanes(out_dir, topics=topics, columns=columns,
                               order_cols=order_cols, row_filter=expr)


def streaming_sessionize(micro_batches, gap_minutes: int = 30,
                         n_buckets: int = 4,
                         checkpoint_to: str | None = None,
                         restore_from: str | None = None):
    """``micro_batches``: iterable of ``ray.data.Dataset`` slices in
    event-time order (e.g. one per input file / time window). Returns the
    flushed per-user session table, computed incrementally.
    ``checkpoint_to`` / ``restore_from`` snapshot and resume the
    per-user session state across driver runs (see
    :func:`checkpoint_actors`); the resumed flush covers BOTH runs'
    rows."""
    import ray

    gap_us = gap_minutes * 60 * 1_000_000
    actors, _ = _drive_keyed_actors(micro_batches, SessionState,
                                    (gap_us,), n_buckets,
                                    restore_dir=restore_from,
                                    checkpoint_dir=checkpoint_to)
    parts = ray.get([a.flush.remote() for a in actors])
    nonempty = [p for p in parts if p.num_rows]
    if not nonempty:
        return pa.table({"user_id": pa.array([], pa.int64()),
                         "n_sessions": pa.array([], pa.int64()),
                         "n_events": pa.array([], pa.int64())})
    return pa.concat_tables(nonempty).sort_by("user_id")


class RunningTotalState(_PerBucketPending):
    """Per-bucket incremental running total: for every event, the
    user's cumulative exact-cents total so far — the streaming
    counterpart of the batch ``running_sum`` query, folding the SAME
    ``util.running_cents_fold`` kernel so parity cannot drift. Carried
    state is one int per live user.

    Watermark handling: rows at each micro-batch's maximum timestamp
    are DEFERRED to the next batch (or flush) — time-ordered input
    guarantees only ``ts >= max``, and a same-ts row with a smaller
    event_id arriving later would otherwise have been folded out of
    (ts, event_id) order. Pending state is keyed PER BUCKET (several
    buckets share one actor; a deferral max computed over another
    bucket's rows would fold a boundary tie prematurely). A null ``ts``
    raises: a time-ordered stream cannot place it, and silently
    dropping or misordering it would break the documented batch parity
    (the batch kernel sorts nulls last)."""

    _EMPTY = pa.table({"event_id": pa.array([], pa.int64()),
                       "user_id": pa.array([], pa.int64()),
                       "running_cents": pa.array([], pa.int64())})

    def __init__(self):
        _PerBucketPending.__init__(self)
        self.carry: dict[int, int] = {}

    def process(self, tbl: pa.Table) -> pa.Table:
        from .util import running_cents_fold
        self.check_ts_not_null(tbl)
        bkt = self.bucket_of(tbl)
        prev = self.pop_pending(bkt)
        parts = [] if prev is None else [prev]
        if tbl.num_rows:
            parts.append(tbl.select(["event_id", "user_id", "ts",
                                     "value"]))
        if not parts:
            return self._EMPTY
        g = pa.concat_tables(parts, promote_options="default")
        ts = g.column("ts")
        max_ts = pa.compute.max(ts)
        at_max = pa.compute.equal(ts, max_ts)
        self.defer(bkt, g.filter(at_max))
        rest = g.filter(pa.compute.invert(at_max))
        if rest.num_rows == 0:
            return self._EMPTY
        return running_cents_fold(rest, self.carry)

    def flush(self) -> pa.Table:
        from .util import running_cents_fold
        parts = [p for p in self.drain_pending() if p.num_rows]
        if not parts:
            return self._EMPTY
        return running_cents_fold(
            pa.concat_tables(parts, promote_options="default"),
            self.carry)

    # checkpoint protocol (see checkpoint_actors)
    def state_tables(self) -> dict:
        out = {}
        if self.carry:
            users = sorted(self.carry)
            out["carry"] = pa.table({
                "user_id": pa.array(users, pa.int64()),
                "cents": pa.array([self.carry[u] for u in users],
                                  pa.int64())})
        p = self.pending_state()
        if p is not None:
            out["pending"] = p
        return out

    def restore_tables(self, tables: dict) -> None:
        self.carry = {}
        t = tables.get("carry")
        if t is not None:
            for u, c in zip(t.column("user_id").to_pylist(),
                            t.column("cents").to_pylist()):
                self.carry[u] = c
        self.restore_pending(tables.get("pending"))


class ApproxDistinctState:
    """Per-bucket incremental HLL distinct count — the streaming
    counterpart of the batch ``approx_distinct`` sketch. Register
    maxes commute and buckets partition the key space, so the merged
    flush equals the batch sketch BIT-EXACTLY for any micro-batch
    split (tested); no watermark handling is needed (max is
    order-insensitive)."""

    def __init__(self, column: str, p: int = 14):
        from .textops.sketches import HyperLogLog
        self.hll = HyperLogLog(p)
        self.column = column

    def process(self, tbl: pa.Table) -> None:
        if tbl.num_rows:
            self.hll.add_column(tbl.column(self.column))
        return None

    def flush(self) -> pa.Table:
        return pa.table({"regs": pa.array(
            [self.hll.registers.tobytes()], pa.binary())})

    # checkpoint protocol (see checkpoint_actors): the register array
    # is the whole state; register maxes commute so resume ≡ batch
    def state_tables(self) -> dict:
        return {"hll": self.flush()}

    def restore_tables(self, tables: dict) -> None:
        t = tables.get("hll")
        if t is not None:
            regs = t.column("regs")[0].as_py()
            if len(regs) != len(self.hll.registers):
                raise ValueError(
                    f"HLL checkpoint has {len(regs)} registers but the "
                    f"resume precision expects {len(self.hll.registers)}"
                    " — register arrays of different p cannot merge")
            self.hll.registers = np.frombuffer(
                regs, dtype=np.uint8,
                count=len(self.hll.registers)).copy()


def streaming_approx_distinct(micro_batches, column: str = "user_id",
                              n_buckets: int = 4, p: int = 14,
                              checkpoint_to: str | None = None,
                              restore_from: str | None = None) -> float:
    """Incremental approximate COUNT(DISTINCT column) over time-ordered
    micro-batches: keyed actor state per bucket, one fixed-size HLL per
    actor, merged registers at end of stream. Equals the batch
    ``textops.sketches.approx_distinct`` estimate exactly.
    ``checkpoint_to`` / ``restore_from`` snapshot and resume the
    registers across driver runs (maxes commute, so the resumed
    estimate equals the batch sketch over both runs' rows)."""
    import numpy as np
    import ray

    from .textops.sketches import HyperLogLog

    def drop_null_keys(t: pa.Table) -> pa.Table:
        # COUNT(DISTINCT) skips nulls (the batch sketch filters them in
        # add_column); they must also never reach the bucket router,
        # whose int() on a null bucket would fail the stream
        return t.filter(pa.compute.is_valid(t.column(column)))

    slices = (s.map_batches(drop_null_keys, batch_format="pyarrow")
              for s in micro_batches)
    actors, _ = _drive_keyed_actors(slices, ApproxDistinctState,
                                    (column, p), n_buckets,
                                    key_col=column,
                                    restore_dir=restore_from,
                                    checkpoint_dir=checkpoint_to)
    merged = HyperLogLog(p)
    for t in ray.get([a.flush.remote() for a in actors]):
        merged.merge_registers(np.frombuffer(
            t.column("regs")[0].as_py(), dtype=np.uint8, count=1 << p))
    return merged.estimate()


def streaming_running_total(micro_batches, n_buckets: int = 4,
                            checkpoint_to: str | None = None,
                            restore_from: str | None = None):
    """Incremental counterpart of the batch ``running_sum`` query:
    per-event cumulative totals over time-ordered micro-batches, keyed
    actor state per bucket. The union of per-batch outputs equals the
    batch query exactly (tested). ``checkpoint_to`` SUSPENDS the
    stream (no end-of-stream flush — deferred watermark rows stay in
    the snapshot and emit on the resumed run), so run-1 rows ∪ run-2
    rows ≡ batch with no duplicates."""
    import ray

    actors, parts = _drive_keyed_actors(micro_batches, RunningTotalState,
                                        (), n_buckets, collect_rows=True,
                                        restore_dir=restore_from,
                                        checkpoint_dir=checkpoint_to)
    if checkpoint_to is None:
        for flushed in ray.get([a.flush.remote() for a in actors]):
            parts.extend(flushed.to_pylist())
    if not parts:
        return RunningTotalState._EMPTY
    return pa.Table.from_pylist(parts).sort_by(
        [("user_id", "ascending"), ("event_id", "ascending")])


class StreamDedupState(_PerBucketPending):
    """Streaming exact dedup-by-key — ES create-op semantics as a
    STREAMING mode (the batch counterpart is ``dedup_by_id`` /
    ``textops.dedup.dedup_first_by_key``; ref semantics
    `libbeat/esleg/eslegclient` create-op duplicate rejection): the
    FIRST row per key in (ts, event_id) event-time order is emitted at
    push time, every later duplicate is dropped. State per bucket is
    one sorted int64 key array — bounded by the bucket's DISTINCT
    keys, never stream length (a TTL'd deployment would evict keys
    older than its horizon; unbounded retention is the exact-parity
    contract here).

    Watermark handling (the `_PerBucketPending` contract): rows at a
    push's max ts defer to the next push or flush — a same-ts
    smaller-event_id duplicate may still arrive and must win. The
    membership probe is one searchsorted per push; new keys merge in
    with one sorted concatenation. NULL-key rows pass through
    untouched, exactly like the batch kernel (ES indexes a
    no-id event, it never dedups it); output columns keep the caller's
    key name."""

    def __init__(self, key: str = "k"):
        _PerBucketPending.__init__(self)
        self.key = key
        self.seen = np.array([], np.int64)
        self._empty = pa.table({key: pa.array([], pa.int64()),
                                "event_id": pa.array([], pa.int64())})

    def _emit(self, g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return self._empty
        k = g.column(self.key).to_numpy(zero_copy_only=False)
        ts = pc.cast(g.column("ts"), pa.int64()) \
            .to_numpy(zero_copy_only=False)
        eid = g.column("event_id").to_numpy(zero_copy_only=False)
        order = np.lexsort((eid, ts, k))
        k2, eid2 = k[order], eid[order]
        first = np.append(True, k2[1:] != k2[:-1])
        ck, ceid = k2[first], eid2[first]  # per-key (ts,eid)-min row
        if len(self.seen):
            pos = np.minimum(np.searchsorted(self.seen, ck),
                             len(self.seen) - 1)
            new = self.seen[pos] != ck
        else:
            new = np.ones(len(ck), bool)
        out = pa.table({self.key: pa.array(ck[new], pa.int64()),
                        "event_id": pa.array(ceid[new], pa.int64())})
        if new.any():
            merged = np.concatenate([self.seen, ck[new]])
            merged.sort(kind="mergesort")  # two sorted runs
            self.seen = merged
        return out

    def process(self, tbl: pa.Table) -> pa.Table:
        self.check_ts_not_null(tbl)
        # null-key passthrough BEFORE any state: the batch kernel
        # emits no-id rows untouched (ES create-op never dedups them),
        # and a NaN key would corrupt the numpy compare below
        nulls = tbl.filter(pc.is_null(tbl.column(self.key)))
        tbl = tbl.filter(pc.is_valid(tbl.column(self.key)))
        passthrough = None
        if nulls.num_rows:
            passthrough = nulls.select([self.key, "event_id"])
        bkt = self.bucket_of(tbl)
        prev = self.pop_pending(bkt)
        parts = [] if prev is None else [prev]
        if tbl.num_rows:
            parts.append(tbl.select([self.key, "ts", "event_id"]))
        if not parts:
            return passthrough if passthrough is not None \
                else self._empty
        g = pa.concat_tables(parts, promote_options="default")
        ts = g.column("ts")
        at_max = pc.equal(ts, pc.max(ts))
        self.defer(bkt, g.filter(at_max))
        out = self._emit(g.filter(pc.invert(at_max)))
        if passthrough is not None:
            out = pa.concat_tables([out, passthrough],
                                   promote_options="default")
        return out

    def flush(self) -> pa.Table:
        parts = [p for p in self.drain_pending() if p.num_rows]
        if not parts:
            return self._empty
        return self._emit(pa.concat_tables(parts,
                                           promote_options="default"))

    # checkpoint protocol (see checkpoint_actors)
    def state_tables(self) -> dict:
        out = {}
        if len(self.seen):
            out["seen"] = pa.table({"k": pa.array(self.seen, pa.int64())})
        p = self.pending_state()
        if p is not None:
            out["pending"] = p
        return out

    def restore_tables(self, tables: dict) -> None:
        t = tables.get("seen")
        self.seen = t.column("k").to_numpy(zero_copy_only=False).copy() \
            if t is not None else np.array([], np.int64)
        self.restore_pending(tables.get("pending"))


def streaming_dedup_by_id(micro_batches, key: str = "k",
                          n_buckets: int = 4,
                          checkpoint_to: str | None = None,
                          restore_from: str | None = None):
    """Drive :class:`StreamDedupState` over time-ordered micro-batches
    (each slice must carry integer ``key``, ``ts``, ``event_id``
    columns; null keys are excluded upstream like the batch query).
    Returns the union of emitted (key, event_id) first-occurrence
    rows (null-key rows pass through untouched, like the batch
    kernel) — equal to the batch ``dedup_first_by_key`` over the
    concatenated stream for any split (tested). ``checkpoint_to``
    SUSPENDS the stream (seen keys and deferred watermark rows stay
    in the snapshot; no end-of-stream flush), so run-1 rows ∪ run-2
    rows ≡ batch with no duplicates."""
    import ray

    actors, parts = _drive_keyed_actors(micro_batches, StreamDedupState,
                                        (key,), n_buckets,
                                        key_col=key, collect_rows=True,
                                        restore_dir=restore_from,
                                        checkpoint_dir=checkpoint_to)
    if checkpoint_to is None:
        for flushed in ray.get([a.flush.remote() for a in actors]):
            parts.extend(flushed.to_pylist())
    if not parts:
        return pa.table({key: pa.array([], pa.int64()),
                         "event_id": pa.array([], pa.int64())})
    return pa.Table.from_pylist(parts).sort_by(
        [(key, "ascending"), ("event_id", "ascending")])


class LatestEventState:
    """Per-bucket incremental UPSERT cache: the current newest row per
    key, folded with the LITERAL batch kernel
    (``aggregates.keep_latest_table``) over (cache ∪ arriving rows).
    Keep-latest is an associative, commutative SELECTION, so the flush
    equals the batch ``keep_latest`` exactly for ANY micro-batch split
    and no watermark machinery is needed (a late row folds correctly —
    it simply loses to the newer cached row). Cache size is bounded by
    the bucket's distinct keys, never the stream length."""

    def __init__(self, key: str, order_by: tuple):
        self.key = key
        self.order_by = tuple(order_by)
        self.state: pa.Table | None = None

    def process(self, tbl: pa.Table) -> None:
        from .aggregates import keep_latest_table
        if "bucket" in tbl.column_names:
            tbl = tbl.drop_columns(["bucket"])
        if tbl.num_rows == 0:
            return None
        cur = tbl if self.state is None else pa.concat_tables(
            [self.state, tbl], promote_options="default")
        self.state = keep_latest_table(cur, key=self.key,
                                       order_by=self.order_by)
        return None

    def flush(self) -> pa.Table:
        return self.state if self.state is not None else pa.table({})

    # checkpoint protocol (see checkpoint_actors)
    def state_tables(self) -> dict:
        return {} if self.state is None else {"state": self.state}

    def restore_tables(self, tables: dict) -> None:
        self.state = tables.get("state")


def streaming_latest(micro_batches, key: str = "user_id",
                     order_by: tuple = ("ts", "event_id"),
                     n_buckets: int = 4,
                     checkpoint_to: str | None = None,
                     restore_from: str | None = None):
    """Incremental counterpart of the batch ``latest_event`` query: the
    newest row per key over time-ordered micro-batches (keyed upsert
    actors). Returns one table equal to the batch ``keep_latest`` over
    the concatenated stream (tested, any split). ``checkpoint_to``
    snapshots the actors' state after the last micro-batch;
    ``restore_from`` resumes a prior run's snapshot, so the flush
    equals the batch result over BOTH runs' rows (tested across
    separate driver calls)."""
    import ray

    actors, _ = _drive_keyed_actors(micro_batches, LatestEventState,
                                    (key, order_by), n_buckets,
                                    key_col=key,
                                    restore_dir=restore_from,
                                    checkpoint_dir=checkpoint_to)
    parts = [t for t in ray.get([a.flush.remote() for a in actors])
             if t.num_rows]
    if not parts:
        return pa.table({})
    return pa.concat_tables(parts, promote_options="default") \
        .sort_by([(key, "ascending")])


class QuantumCdfState:
    """Per-bucket incremental quantum-CDF fold: the streaming
    counterpart of the batch ``aggregates.fold_quantum_cdf``. Per
    micro-batch the bucket's rows pre-aggregate to (quantum, count)
    and fold into one dict — counts are commutative and associative,
    so the merged flush equals the batch fold EXACTLY for any
    micro-batch split (no watermark machinery; late rows just add).
    State size is bounded by the value range × precision, never the
    stream length. Null/NaN values are ignored (the batch fold's
    SQL-aggregate convention)."""

    def __init__(self, value_col: str, scale: int):
        self.value_col = value_col
        self.scale = scale
        self.acc: dict[int, int] = {}

    def process(self, tbl: pa.Table) -> None:
        if tbl.num_rows == 0:
            return None
        v = pc.cast(tbl.column(self.value_col), pa.float64()) \
            .to_numpy(zero_copy_only=False)
        ok = ~np.isnan(v)
        quanta = np.floor(v[ok] * self.scale).astype(np.int64)
        uniq, counts = np.unique(quanta, return_counts=True)
        for q, c in zip(uniq, counts):
            self.acc[int(q)] = self.acc.get(int(q), 0) + int(c)
        return None

    def flush(self) -> pa.Table:
        qs = sorted(self.acc)
        return pa.table({"q": pa.array(qs, pa.int64()),
                         "cnt": pa.array([self.acc[q] for q in qs],
                                         pa.int64())})

    # checkpoint protocol (see checkpoint_actors) — the CDF dict IS
    # the flush table, so snapshot and flush share one encoding
    def state_tables(self) -> dict:
        return {"cdf": self.flush()} if self.acc else {}

    def restore_tables(self, tables: dict) -> None:
        self.acc = {}
        if "cdf" in tables:
            t = tables["cdf"]
            self.acc = dict(zip(t.column("q").to_pylist(),
                                t.column("cnt").to_pylist()))


def streaming_quantile(micro_batches, *, q: float,
                       value_col: str = "value", scale: int = 100,
                       n_buckets: int = 4,
                       key_col: str = "user_id",
                       checkpoint_to: str | None = None,
                       restore_from: str | None = None
                       ) -> tuple[int, int]:
    """Incremental exact discrete quantile over time-ordered
    micro-batches — equals the batch
    ``aggregates.global_discrete_quantile`` bit-exactly for any split
    (tested). Returns ``(threshold_quantum, n_rows)``.
    ``checkpoint_to``/``restore_from`` snapshot and resume the CDF
    state across driver runs (see :func:`checkpoint_actors`)."""
    import ray

    from .aggregates import quantile_from_cdf

    if not (0.0 < q <= 1.0):
        raise ValueError(f"q must be in (0, 1]: {q!r}")
    actors, _ = _drive_keyed_actors(micro_batches, QuantumCdfState,
                                    (value_col, scale), n_buckets,
                                    key_col=key_col,
                                    restore_dir=restore_from,
                                    checkpoint_dir=checkpoint_to)
    acc: dict[int, int] = {}
    for t in ray.get([a.flush.remote() for a in actors]):
        for qq, c in zip(t.column("q").to_pylist(),
                         t.column("cnt").to_pylist()):
            acc[qq] = acc.get(qq, 0) + c
    if not acc:
        raise ValueError(f"no non-null {value_col!r} values")
    uniq = np.array(sorted(acc), np.int64)
    cum = np.cumsum([acc[int(u)] for u in uniq]).astype(np.int64)
    return quantile_from_cdf(uniq, cum, q), int(cum[-1])


class TransitionState(_PerBucketPending):
    """Per-bucket incremental Markov transition counter — the streaming
    counterpart of the batch ``transition_counts`` query, pairing each
    user's events in (ts, event_id) order ACROSS micro-batch
    boundaries. State per user is one tuple (last event's order key +
    type); (src, dst) counts fold additively, so flush ≡ batch for any
    event-time-ordered split. Boundary-tie safety (the
    `_PerBucketPending` contract): rows carrying a push's max ts are
    deferred per bucket until the next push — a same-ts smaller-id
    peer may still arrive and must order BEFORE them — and drained at
    flush. Null user/ts rows are dropped exactly like the batch
    query's filter (not raised: the row is excluded from ordering on
    both sides, so parity holds)."""

    def __init__(self):
        super().__init__()
        self.last: dict[int, tuple] = {}       # u -> (ts, eid, type)
        self.counts: dict[tuple, int] = {}

    @staticmethod
    def _arrays(tbl: pa.Table):
        ok = pc.and_(pc.is_valid(tbl.column("user_id")),
                     pc.is_valid(tbl.column("ts")))
        sub = tbl.filter(ok)
        return (sub.column("user_id").to_numpy(zero_copy_only=False),
                pc.cast(sub.column("ts"), pa.int64())
                .to_numpy(zero_copy_only=False),
                sub.column("event_id").to_numpy(zero_copy_only=False),
                np.asarray(sub.column("event_type").to_pylist(),
                           dtype=object))

    def _fold(self, u, ts, eid, et) -> None:
        order = np.lexsort((eid, ts, u))
        u, ts, eid, et = u[order], ts[order], eid[order], et[order]
        same = u[1:] == u[:-1] if len(u) else np.array([], bool)
        # within-push adjacent pairs: vectorized pair-code counting
        src, dst = et[:-1][same], et[1:][same]
        if len(src):
            types, codes = np.unique(np.concatenate([src, dst]),
                                     return_inverse=True)
            k = len(types)
            sc, dc = codes[:len(src)], codes[len(src):]
            pair, cnt = np.unique(sc.astype(np.int64) * k + dc,
                                  return_counts=True)
            for p, c in zip(pair, cnt):
                key = (str(types[p // k]), str(types[p % k]))
                self.counts[key] = self.counts.get(key, 0) + int(c)
        # boundary pairs vs stored per-user last + state update: one
        # step per DISTINCT user in the push, not per row
        starts = np.flatnonzero(np.append(True, ~same)) if len(u) \
            else np.array([], np.int64)
        ends = np.append(starts[1:], len(u)) - 1
        for s_i, e_i in zip(starts, ends):
            uu = int(u[s_i])
            prev = self.last.get(uu)
            if prev is not None:
                key = (prev[2], str(et[s_i]))
                self.counts[key] = self.counts.get(key, 0) + 1
            self.last[uu] = (int(ts[e_i]), int(eid[e_i]), str(et[e_i]))

    def process(self, tbl: pa.Table) -> int:
        bkt = self.bucket_of(tbl)
        u, ts, eid, et = self._arrays(tbl)
        pend = self.pop_pending(bkt)
        if pend is not None:
            pu, pts, peid, pet = pend
            u = np.concatenate([pu, u])
            ts = np.concatenate([pts, ts])
            eid = np.concatenate([peid, eid])
            et = np.concatenate([pet, et])
        if not len(u):
            return tbl.num_rows
        mx = ts.max()
        hold = ts == mx
        if hold.any():
            self.defer(bkt, (u[hold], ts[hold], eid[hold], et[hold]))
        now = ~hold
        if now.any():
            self._fold(u[now], ts[now], eid[now], et[now])
        return tbl.num_rows

    def flush(self) -> pa.Table:
        for pu, pts, peid, pet in self.drain_pending():
            self._fold(pu, pts, peid, pet)
        keys = sorted(self.counts)
        return pa.table({
            "src": pa.array([k[0] for k in keys], pa.string()),
            "dst": pa.array([k[1] for k in keys], pa.string()),
            "n": pa.array([self.counts[k] for k in keys], pa.int64())})

    # checkpoint protocol (see checkpoint_actors); pending payloads
    # here are array TUPLES, so the _PerBucketPending table helpers
    # are overridden with a columnar rendering of the same rows
    def pending_state(self) -> pa.Table | None:
        parts = []
        for bkt, (pu, pts, peid, pet) in sorted(self._pending.items()):
            if len(pu):
                parts.append(pa.table({
                    "user_id": pa.array(pu, pa.int64()),
                    "ts": pa.array(pts, pa.int64()),
                    "event_id": pa.array(peid, pa.int64()),
                    "event_type": pa.array(list(pet), pa.string()),
                    "__bkt": pa.array([bkt] * len(pu), pa.int32())}))
        return pa.concat_tables(parts) if parts else None

    def restore_pending(self, tbl: pa.Table | None) -> None:
        self._pending = {}
        if tbl is None:
            return
        b = tbl.column("__bkt").to_numpy(zero_copy_only=False)
        for bkt in np.unique(b):
            sub = tbl.filter(pa.array(b == bkt))
            self._pending[int(bkt)] = (
                sub.column("user_id").to_numpy(zero_copy_only=False),
                sub.column("ts").to_numpy(zero_copy_only=False),
                sub.column("event_id").to_numpy(zero_copy_only=False),
                np.asarray(sub.column("event_type").to_pylist(),
                           dtype=object))

    def state_tables(self) -> dict:
        out = {}
        if self.last:
            users = sorted(self.last)
            out["last"] = pa.table({
                "user_id": pa.array(users, pa.int64()),
                "ts": pa.array([self.last[u][0] for u in users],
                               pa.int64()),
                "event_id": pa.array([self.last[u][1] for u in users],
                                     pa.int64()),
                "event_type": pa.array([self.last[u][2] for u in users],
                                       pa.string())})
        if self.counts:
            keys = sorted(self.counts)
            out["counts"] = pa.table({
                "src": pa.array([k[0] for k in keys], pa.string()),
                "dst": pa.array([k[1] for k in keys], pa.string()),
                "n": pa.array([self.counts[k] for k in keys],
                              pa.int64())})
        p = self.pending_state()
        if p is not None:
            out["pending"] = p
        return out

    def restore_tables(self, tables: dict) -> None:
        self.last = {}
        self.counts = {}
        t = tables.get("last")
        if t is not None:
            for u, ts, eid, et in zip(
                    t.column("user_id").to_pylist(),
                    t.column("ts").to_pylist(),
                    t.column("event_id").to_pylist(),
                    t.column("event_type").to_pylist()):
                self.last[u] = (ts, eid, et)
        t = tables.get("counts")
        if t is not None:
            for s, d, n in zip(t.column("src").to_pylist(),
                               t.column("dst").to_pylist(),
                               t.column("n").to_pylist()):
                self.counts[(s, d)] = n
        self.restore_pending(tables.get("pending"))


def streaming_transition_counts(micro_batches, n_buckets: int = 4,
                                checkpoint_to: str | None = None,
                                restore_from: str | None = None):
    """Flushed (src, dst, n) transition counts over event-time-ordered
    micro-batches — equals the batch ``transition_counts`` query for
    any split (buckets partition users, so per-actor counts sum
    exactly). ``checkpoint_to`` / ``restore_from`` snapshot and
    resume counts, per-user last events AND deferred watermark rows
    across driver runs (the snapshot precedes the flush's pending
    drain, so the resumed flush covers both runs' rows)."""
    import ray

    actors, _ = _drive_keyed_actors(micro_batches, TransitionState,
                                    (), n_buckets,
                                    restore_dir=restore_from,
                                    checkpoint_dir=checkpoint_to)
    parts = [p for p in ray.get([a.flush.remote() for a in actors])
             if p.num_rows]
    if not parts:
        return pa.table({"src": pa.array([], pa.string()),
                         "dst": pa.array([], pa.string()),
                         "n": pa.array([], pa.int64())})
    g = pa.concat_tables(parts).group_by(["src", "dst"]) \
        .aggregate([("n", "sum")])
    return pa.table({"src": g.column("src"), "dst": g.column("dst"),
                     "n": g.column("n_sum")}) \
        .sort_by([("src", "ascending"), ("dst", "ascending")])


class UserSummaryState:
    """Per-bucket incremental multi-measure profile: per user, COUNT /
    MIN(ts) / MAX(ts) / SUM(valid cents) / valid-count, folded with the
    same associative partial shape as the batch ``user_summary`` query.
    Every measure commutes and needs no ordering, so the flush equals
    the batch query for ANY event-time split with no watermark
    machinery; cache size is bounded by the bucket's distinct users,
    never the stream length."""

    _SCHEMA = pa.schema([("u", pa.int64()), ("mn", pa.int64()),
                         ("mx", pa.int64()), ("n", pa.int64()),
                         ("c", pa.int64()), ("k", pa.int64())])

    def __init__(self):
        self.cache = self._SCHEMA.empty_table()

    def process(self, tbl: pa.Table) -> None:
        if tbl.num_rows == 0:
            return None
        v = tbl.column("value").to_numpy(zero_copy_only=False)
        part = pa.table({
            "u": tbl.column("user_id"),
            "mn": pc.cast(tbl.column("ts"), pa.int64()),
            "mx": pc.cast(tbl.column("ts"), pa.int64()),
            "n": pa.array(np.ones(tbl.num_rows, np.int64), pa.int64()),
            "c": pa.array(np.where(np.isnan(v), 0, np.floor(v * 100.0))
                          .astype(np.int64), pa.int64()),
            "k": pa.array((~np.isnan(v)).astype(np.int64), pa.int64())}) \
            .filter(pc.and_(pc.is_valid(tbl.column("user_id")),
                            pc.is_valid(tbl.column("ts"))))
        g = pa.concat_tables([self.cache, part]).group_by("u") \
            .aggregate([("mn", "min"), ("mx", "max"), ("n", "sum"),
                        ("c", "sum"), ("k", "sum")])
        self.cache = pa.table({
            "u": g.column("u"), "mn": g.column("mn_min"),
            "mx": g.column("mx_max"), "n": g.column("n_sum"),
            "c": g.column("c_sum"), "k": g.column("k_sum")})
        return None

    def flush(self) -> pa.Table:
        return self.cache

    # checkpoint protocol (see checkpoint_actors): the partials cache
    # IS the state (associative measures — resume ≡ batch trivially)
    def state_tables(self) -> dict:
        return {} if self.cache.num_rows == 0 else {"cache": self.cache}

    def restore_tables(self, tables: dict) -> None:
        self.cache = tables.get("cache", self._SCHEMA.empty_table())


def streaming_user_summary(micro_batches, n_buckets: int = 4,
                           checkpoint_to: str | None = None,
                           restore_from: str | None = None):
    """Flushed per-user lifetime profile over event-time-ordered
    micro-batches — equals the batch ``user_summary`` query for any
    split (buckets partition users; all five measures are associative
    and commutative). ``checkpoint_to`` / ``restore_from`` snapshot
    and resume the partials cache across driver runs."""
    import ray

    actors, _ = _drive_keyed_actors(micro_batches, UserSummaryState,
                                    (), n_buckets,
                                    restore_dir=restore_from,
                                    checkpoint_dir=checkpoint_to)
    parts = [p for p in ray.get([a.flush.remote() for a in actors])
             if p.num_rows]
    if not parts:
        merged = UserSummaryState._SCHEMA.empty_table()
    else:
        g = pa.concat_tables(parts).group_by("u").aggregate(
            [("mn", "min"), ("mx", "max"), ("n", "sum"),
             ("c", "sum"), ("k", "sum")])
        merged = pa.table({
            "u": g.column("u"), "mn": g.column("mn_min"),
            "mx": g.column("mx_max"), "n": g.column("n_sum"),
            "c": g.column("c_sum"), "k": g.column("k_sum")})
    mn = merged.column("mn").to_numpy(zero_copy_only=False)
    mx = merged.column("mx").to_numpy(zero_copy_only=False)
    k = merged.column("k").to_numpy(zero_copy_only=False)
    c = merged.column("c").to_numpy(zero_copy_only=False)
    return pa.table({
        "user_id": merged.column("u"),
        "n_events": merged.column("n"),
        "first_ts": pa.array(mn, pa.int64()).cast(pa.timestamp("us")),
        "last_ts": pa.array(mx, pa.int64()).cast(pa.timestamp("us")),
        "span_us": pa.array(mx - mn, pa.int64()),
        "value_cents": pa.array(c, pa.int64(), mask=k == 0)}) \
        .sort_by([("user_id", "ascending")])


class ModeCountState:
    """Per-bucket incremental (event_type, cents, count) table —
    additive across buckets AND micro-batches, so the merged flush
    argmax equals the batch ``mode_per_type`` query for any split.
    State is bounded by types × distinct quanta (the value range at
    cents precision), never the stream length."""

    _SCHEMA = pa.schema([("event_type", pa.string()),
                         ("cents", pa.int64()), ("n", pa.int64())])

    def __init__(self):
        self.cache = self._SCHEMA.empty_table()

    def process(self, tbl: pa.Table) -> None:
        if tbl.num_rows == 0:
            return None
        v = tbl.column("value").to_numpy(zero_copy_only=False)
        ok = ~np.isnan(v)
        part = pa.table({
            "event_type": tbl.column("event_type").filter(pa.array(ok)),
            "cents": pa.array(np.floor(v[ok] * 100).astype(np.int64),
                              pa.int64()),
            "n": pa.array(np.ones(int(ok.sum()), np.int64), pa.int64())})
        g = pa.concat_tables([self.cache, part]) \
            .group_by(["event_type", "cents"]).aggregate([("n", "sum")])
        self.cache = pa.table({"event_type": g.column("event_type"),
                               "cents": g.column("cents"),
                               "n": g.column("n_sum")})
        return None

    def flush(self) -> pa.Table:
        return self.cache

    # checkpoint protocol (see checkpoint_actors): the counts cache
    # IS the state (additive — resume ≡ batch trivially)
    def state_tables(self) -> dict:
        return {} if self.cache.num_rows == 0 else {"cache": self.cache}

    def restore_tables(self, tables: dict) -> None:
        self.cache = tables.get("cache", self._SCHEMA.empty_table())


def streaming_mode_per_type(micro_batches, n_buckets: int = 4,
                            checkpoint_to: str | None = None,
                            restore_from: str | None = None):
    """Flushed grouped mode over event-time-ordered micro-batches —
    equals the batch ``mode_per_type`` query for any split (counts are
    additive; the argmax with the tie-to-smallest rule runs once on the
    merged table). ``checkpoint_to`` / ``restore_from`` snapshot and
    resume the counts cache across driver runs."""
    import ray

    actors, _ = _drive_keyed_actors(micro_batches, ModeCountState,
                                    (), n_buckets,
                                    restore_dir=restore_from,
                                    checkpoint_dir=checkpoint_to)
    parts = [p for p in ray.get([a.flush.remote() for a in actors])
             if p.num_rows]
    if not parts:
        return pa.table({"event_type": pa.array([], pa.string()),
                         "mode_cents": pa.array([], pa.int64()),
                         "n_mode": pa.array([], pa.int64())})
    f = pa.concat_tables(parts).group_by(["event_type", "cents"]) \
        .aggregate([("n", "sum")])
    enc = pc.dictionary_encode(f.column("event_type").combine_chunks())
    code = enc.indices.to_numpy(zero_copy_only=False)
    cents = f.column("cents").to_numpy(zero_copy_only=False)
    n = f.column("n_sum").to_numpy(zero_copy_only=False)
    order = np.lexsort((cents, -n, code))
    cs = code[order]
    sel = order[np.flatnonzero(np.append(True, cs[1:] != cs[:-1]))]
    return pa.table({
        "event_type": pc.take(enc.dictionary,
                              pa.array(code[sel], pa.int32())),
        "mode_cents": pa.array(cents[sel], pa.int64()),
        "n_mode": pa.array(n[sel], pa.int64())}) \
        .sort_by([("event_type", "ascending")])


class RuleViolationState:
    """Per-bucket incremental QA-rule counter (streaming counterpart of
    the batch ``rule_violations`` query): purchases strictly before
    their user's first signup, and purchases by users who never sign
    up. Event-time-ordered micro-batches make this exact without
    watermarks: a signup arriving in a LATER slice has a strictly
    greater ts than every earlier-slice event (equal timestamps always
    share a slice), so a pending purchase promotes to "before" only by
    the strict comparison against the eventual first-signup ts —
    pending purchases therefore keep their timestamps, not just a
    count. Signups fold before purchases within a slice so an
    equal-ts signup+purchase pair stays clean (strict <), matching
    the batch kernel. State: one int per signed-up user plus the
    pending purchase timestamps of not-yet-signed-up users — bounded
    by the bucket's users and their pre-signup purchases, never the
    stream length. The per-slice fold loops over the slice's DISTINCT
    users (the documented demo-scale streaming-lane shape, as in
    TransitionState)."""

    def __init__(self):
        self.first: dict[int, int] = {}
        self.pending: dict[int, list[int]] = {}
        self.before = 0

    def process(self, tbl: pa.Table) -> None:
        if tbl.num_rows == 0:
            return None
        et = tbl.column("event_type")
        sub = pa.table({"u": tbl.column("user_id"),
                        "ts": pc.cast(tbl.column("ts"), pa.int64()),
                        "buy": pc.equal(et, "purchase")}) \
            .filter(pc.and_(
                pc.and_(pc.is_valid(tbl.column("user_id")),
                        pc.is_valid(tbl.column("ts"))),
                pc.is_in(et, value_set=pa.array(
                    ["signup", "purchase"], pa.string()))))
        if sub.num_rows == 0:
            return None
        u = sub.column("u").to_numpy(zero_copy_only=False)
        ts = sub.column("ts").to_numpy(zero_copy_only=False)
        buy = sub.column("buy").to_numpy(zero_copy_only=False)
        # signups first: an equal-ts signup+purchase pair in one slice
        # must compare strictly (purchase at ts == first signup is
        # clean)
        su, st = u[~buy], ts[~buy]
        order = np.argsort(su, kind="stable")
        su, st = su[order], st[order]
        starts = np.flatnonzero(np.append(True, su[1:] != su[:-1])) \
            if len(su) else np.array([], np.int64)
        for user, smin in zip(
                su[starts],
                (np.minimum.reduceat(st, starts) if len(starts)
                 else np.array([], np.int64))):
            user, smin = int(user), int(smin)
            f = self.first.get(user)
            if f is None or smin < f:
                self.first[user] = smin if f is None else min(f, smin)
                pend = self.pending.pop(user, None)
                if pend:
                    self.before += sum(1 for p in pend
                                       if p < self.first[user])
        pu, pt = u[buy], ts[buy]
        for user, t in zip(pu, pt):
            user, t = int(user), int(t)
            f = self.first.get(user)
            if f is not None:
                if t < f:
                    self.before += 1
            else:
                self.pending.setdefault(user, []).append(t)
        return None

    def flush(self) -> pa.Table:
        return pa.table({
            "before": pa.array([self.before], pa.int64()),
            "no_signup": pa.array(
                [sum(len(v) for v in self.pending.values())],
                pa.int64())})

    # checkpoint protocol (see checkpoint_actors): first-signup map,
    # pending pre-signup purchase timestamps (exploded — a late
    # signup in the resumed run must still promote them), and the
    # violation counter so far
    def state_tables(self) -> dict:
        out = {}
        if self.first:
            users = sorted(self.first)
            out["first"] = pa.table({
                "user_id": pa.array(users, pa.int64()),
                "ts": pa.array([self.first[u] for u in users],
                               pa.int64())})
        if self.pending:
            users = sorted(self.pending)
            lens = [len(self.pending[u]) for u in users]
            out["pending"] = pa.table({
                "user_id": pa.array(np.repeat(users, lens), pa.int64()),
                "ts": pa.array(
                    np.concatenate([np.asarray(self.pending[u],
                                               np.int64)
                                    for u in users]), pa.int64())})
        if self.before:
            out["before"] = pa.table({
                "n": pa.array([self.before], pa.int64())})
        return out

    def restore_tables(self, tables: dict) -> None:
        self.first = {}
        self.pending = {}
        self.before = 0
        t = tables.get("first")
        if t is not None:
            for u, ts in zip(t.column("user_id").to_pylist(),
                             t.column("ts").to_pylist()):
                self.first[u] = ts
        t = tables.get("pending")
        if t is not None:
            for u, ts in zip(t.column("user_id").to_pylist(),
                             t.column("ts").to_pylist()):
                self.pending.setdefault(u, []).append(ts)
        t = tables.get("before")
        if t is not None:
            self.before = int(t.column("n")[0].as_py())


def streaming_rule_violations(micro_batches, n_buckets: int = 4,
                              checkpoint_to: str | None = None,
                              restore_from: str | None = None):
    """Flushed cross-event constraint counts over event-time-ordered
    micro-batches — equals the batch ``rule_violations`` query for any
    event-time split (parity-tested incl. the equal-ts straddle and
    the late-signup promotion). ``checkpoint_to`` / ``restore_from``
    snapshot and resume the signup map, the pending pre-signup
    purchases and the violation counter across driver runs."""
    import ray

    actors, _ = _drive_keyed_actors(micro_batches, RuleViolationState,
                                    (), n_buckets,
                                    restore_dir=restore_from,
                                    checkpoint_dir=checkpoint_to)
    parts = ray.get([a.flush.remote() for a in actors])
    before = sum(int(p.column("before")[0].as_py()) for p in parts)
    no_sig = sum(int(p.column("no_signup")[0].as_py()) for p in parts)
    return pa.table({
        "rule": pa.array(["purchase_before_signup",
                          "purchase_no_signup"], pa.string()),
        "n": pa.array([before, no_sig], pa.int64())})


def streaming_cdc_apply(micro_batches, key: str = "user_id",
                        order_by: tuple = ("ts", "event_id"),
                        op_col: str = "event_type",
                        delete_op: str = "error",
                        n_buckets: int = 4,
                        checkpoint_to: str | None = None,
                        restore_from: str | None = None):
    """Incremental counterpart of the batch ``cdc_apply`` query:
    change-log apply with tombstone deletes over time-ordered
    micro-batches. The upsert cache (`LatestEventState`) retains
    tombstone rows IN STATE — a delete must keep suppressing earlier
    upserts, including ones that arrive late — and the delete filter
    runs only at flush, exactly where the batch kernel applies it.
    Keep-latest selection + flush-time filter are both order-free, so
    the flush equals the batch result for ANY micro-batch split
    (tested, including a late upsert older than its key's tombstone)."""
    out = streaming_latest(micro_batches, key=key, order_by=order_by,
                           n_buckets=n_buckets,
                           checkpoint_to=checkpoint_to,
                           restore_from=restore_from)
    if out.num_rows == 0:
        return out
    return out.filter(pc.invert(pc.equal(out.column(op_col),
                                         pa.scalar(delete_op))))


class StreamFunnelState:
    """Stream-stream two-step funnel join (the streaming counterpart
    of the batch ``funnel_conversion`` query): per user, the FIRST
    first-step event and the first candidate event strictly after it
    within the window, computed over time-ordered micro-batches.

    Both sides fold with the LITERAL batch kernels
    (:func:`raybeats.aggregates.funnel_compact` per push,
    :func:`raybeats.aggregates.funnel_kernel` at flush), so the flush
    equals the batch query for ANY micro-batch split by construction.
    No watermark: a LATE first-step row folds via the per-user min and
    can retroactively claim an already-buffered candidate; a late
    candidate simply appends. That correctness choice has the usual
    cost — the candidate buffer is bounded by the bucket's candidate
    ROWS (not its keys); a deployment that can tolerate dropping
    late-beyond-horizon rows would add a watermark eviction on
    ``first_ts + within`` at push time."""

    def __init__(self, first_type: str, then_type: str,
                 within_us: int):
        self.first_type = first_type
        self.then_type = then_type
        self.within_us = within_us
        self.firsts: pa.Table | None = None  # (u, t) min-folded
        self.cands: list[pa.Table] = []

    def process(self, tbl: pa.Table) -> None:
        from .aggregates import funnel_compact
        if "bucket" in tbl.column_names:
            tbl = tbl.drop_columns(["bucket"])
        if tbl.num_rows == 0:
            return None
        c = funnel_compact(tbl, first_type=self.first_type,
                           then_type=self.then_type)
        side = c.column("side").to_numpy(zero_copy_only=False)
        f = c.filter(pa.array(side == 1)).select(["u", "t"])
        p = c.filter(pa.array(side == 0)).select(["u", "t"])
        if p.num_rows:
            self.cands.append(p)
        if f.num_rows:
            cur = f if self.firsts is None else pa.concat_tables(
                [self.firsts, f])
            g = cur.group_by("u").aggregate([("t", "min")])
            self.firsts = pa.table({"u": g.column("u"),
                                    "t": g.column("t_min")})
        return None

    def flush(self) -> pa.Table:
        import numpy as np

        from .aggregates import funnel_kernel
        firsts = self.firsts if self.firsts is not None else \
            pa.table({"u": pa.array([], pa.int64()),
                      "t": pa.array([], pa.int64())})
        cands = pa.concat_tables(self.cands) if self.cands else \
            pa.table({"u": pa.array([], pa.int64()),
                      "t": pa.array([], pa.int64())})
        g = pa.table({
            "side": pa.array(np.concatenate(
                [np.ones(firsts.num_rows, np.int8),
                 np.zeros(cands.num_rows, np.int8)])),
            "u": pa.concat_arrays(
                [pc.cast(firsts.column("u"),
                         pa.int64()).combine_chunks(),
                 pc.cast(cands.column("u"),
                         pa.int64()).combine_chunks()]),
            "t": pa.concat_arrays(
                [pc.cast(firsts.column("t"),
                         pa.int64()).combine_chunks(),
                 pc.cast(cands.column("t"),
                         pa.int64()).combine_chunks()])})
        return funnel_kernel(g, within_us=self.within_us)

    # checkpoint protocol (see checkpoint_actors)
    def state_tables(self) -> dict:
        out = {}
        if self.firsts is not None:
            out["firsts"] = self.firsts
        if self.cands:
            out["cands"] = pa.concat_tables(self.cands)
        return out

    def restore_tables(self, tables: dict) -> None:
        self.firsts = tables.get("firsts")
        self.cands = [tables["cands"]] if "cands" in tables else []


def streaming_funnel(micro_batches, first_type: str = "click",
                     then_type: str = "purchase",
                     within_us: int = 24 * 3600 * 1_000_000,
                     n_buckets: int = 4,
                     checkpoint_to: str | None = None,
                     restore_from: str | None = None):
    """Drive :class:`StreamFunnelState` over time-ordered
    micro-batches; returns one table equal to the batch
    ``funnel_conversion`` over the concatenated stream (tested for
    any split, including late first-step rows). ``checkpoint_to`` /
    ``restore_from`` snapshot and resume the actors' state across
    driver runs (see :func:`checkpoint_actors`)."""
    import ray

    actors, _ = _drive_keyed_actors(
        micro_batches, StreamFunnelState,
        (first_type, then_type, within_us), n_buckets,
        restore_dir=restore_from,
        checkpoint_dir=checkpoint_to)
    parts = [t for t in ray.get([a.flush.remote() for a in actors])
             if t.num_rows]
    if not parts:
        return pa.table({"user_id": pa.array([], pa.int64()),
                         "first_ts": pa.array([], pa.timestamp("us")),
                         "conv_ts": pa.array([], pa.timestamp("us"))})
    return pa.concat_tables(parts).sort_by(
        [("user_id", "ascending"), ("first_ts", "ascending")])


class RatelimitState:
    """Streaming keyed token-bucket rate limiting — the reference's
    ``ratelimit`` processor is inherently a streaming concept (one
    persistent bucket map fed by an ordered event stream); this state
    hosts the LITERAL batch processor (`processors.ratelimit.
    RateLimit`), whose bucket dict persists across pushes, so the
    union of per-run flushes equals one batch apply over the full
    time-ordered stream exactly (same per-key token arithmetic chain).

    ORDER-SENSITIVE, unlike the commutative states: token refill
    depends on event order, so micro-batches MUST arrive time-ordered
    (the kafka lane's per-lane ordering contract supplies this); a
    late row would see a refilled bucket the batch run never had.
    Kept rows buffer per run and are NOT checkpointed — each run
    emits its own kept rows exactly once, and only the bucket state
    crosses runs."""

    def __init__(self, limit: str, fields: tuple,
                 burst_multiplier: float = 1.0, ts_field: str = "ts"):
        from .processors.ratelimit import RateLimit
        self.rl = RateLimit(limit=limit, fields=list(fields),
                            burst_multiplier=burst_multiplier,
                            ts_field=ts_field)
        self.fields = list(self.rl.fields)  # processor sorts them
        self.kept: list[pa.Table] = []

    def process(self, tbl: pa.Table) -> None:
        if "bucket" in tbl.column_names:
            tbl = tbl.drop_columns(["bucket"])
        if tbl.num_rows == 0:
            return None
        out = self.rl.apply(tbl)
        if out.num_rows:
            self.kept.append(out)
        return None

    def flush(self) -> pa.Table:
        if not self.kept:
            return pa.table({})
        return pa.concat_tables(self.kept, promote_options="default")

    # checkpoint protocol (see checkpoint_actors): one row per bucket,
    # key fields as typed columns + (tokens, last_ts) doubles
    def state_tables(self) -> dict:
        if not self.rl.buckets:
            return {}
        keys = list(self.rl.buckets)
        cols = {f"k{i}": pa.array([k[i] for k in keys])
                for i in range(len(self.fields))}
        cols["tokens"] = pa.array(
            [self.rl.buckets[k][0] for k in keys], pa.float64())
        cols["last"] = pa.array(
            [self.rl.buckets[k][1] for k in keys], pa.float64())
        return {"buckets": pa.table(cols)}

    def restore_tables(self, tables: dict) -> None:
        self.rl.buckets = {}
        if "buckets" not in tables:
            return
        t = tables["buckets"]
        key_cols = [t.column(f"k{i}").to_pylist()
                    for i in range(len(self.fields))]
        toks = t.column("tokens").to_pylist()
        last = t.column("last").to_pylist()
        for i in range(t.num_rows):
            self.rl.buckets[tuple(c[i] for c in key_cols)] = \
                (toks[i], last[i])


def streaming_ratelimit(micro_batches, limit: str = "60/m",
                        fields: tuple = ("user_id",),
                        burst_multiplier: float = 1.0,
                        n_buckets: int = 4,
                        checkpoint_to: str | None = None,
                        restore_from: str | None = None) -> pa.Table:
    """Drive :class:`RatelimitState` over TIME-ORDERED micro-batches;
    returns the kept rows (this run's), equal to the batch
    ``rate_limit`` processor applied once over the runs' concatenated
    stream (tested, including across a checkpoint/resume boundary).
    Rows bucket by the first key field so each key's events meet
    exactly one bucket's actor."""
    import ray

    actors, _ = _drive_keyed_actors(
        micro_batches, RatelimitState,
        (limit, tuple(fields), burst_multiplier), n_buckets,
        key_col=fields[0], restore_dir=restore_from,
        checkpoint_dir=checkpoint_to)
    parts = [t for t in ray.get([a.flush.remote() for a in actors])
             if t.num_rows]
    if not parts:
        return pa.table({})
    out = pa.concat_tables(parts, promote_options="default")
    keys = [(f, "ascending") for f in sorted(fields)]
    return out.sort_by(keys + [("ts", "ascending")])


class TemplateState:
    """Streaming Drain-style log-template mining: folds the LITERAL
    batch partials (:func:`raybeats.textops.analysis.
    template_partial`) — distinct (group, position, token) rows union
    and line counts sum, both commutative and associative — so the
    flush equals the batch ``log_templates`` result for ANY
    micro-batch split with no watermark machinery (a late line can
    only widen a position to ``<*>`` or add counts, exactly as it
    would have in batch). State is bounded by template-vocabulary
    size, never stream length. The template space is global (no
    per-key partitioning), so this state ignores the bucket column
    and each actor holds its shard's partials; the driver merges at
    flush."""

    def __init__(self, text_col: str = "text"):
        self.text_col = text_col
        self.acc: pa.Table | None = None

    def process(self, tbl: pa.Table) -> None:
        from .textops.analysis import template_partial
        if tbl.num_rows == 0:
            return None
        part = template_partial(tbl.column(self.text_col))
        cur = part if self.acc is None else pa.concat_tables(
            [self.acc, part])
        # re-compact: distinct token rows + summed count rows
        toks = cur.filter(pc.greater_equal(cur.column("p"), 0)) \
            .group_by(["n", "t0", "p", "tok"]).aggregate([])
        toks = toks.append_column(
            "lines", pa.array([0] * toks.num_rows, pa.int64()))
        cnts = cur.filter(pc.equal(cur.column("p"), -1)) \
            .group_by(["n", "t0"]).aggregate([("lines", "sum")])
        cnts = pa.table({
            "n": cnts.column("n"), "t0": cnts.column("t0"),
            "p": pa.array([-1] * cnts.num_rows, pa.int64()),
            "tok": pa.array([None] * cnts.num_rows, pa.string()),
            "lines": pc.cast(cnts.column("lines_sum"), pa.int64())})
        self.acc = pa.concat_tables([toks.select(
            ["n", "t0", "p", "tok", "lines"]), cnts])
        return None

    def flush(self) -> pa.Table:
        return self.acc if self.acc is not None else pa.table({})

    # checkpoint protocol (see checkpoint_actors)
    def state_tables(self) -> dict:
        return {} if self.acc is None else {"partials": self.acc}

    def restore_tables(self, tables: dict) -> None:
        self.acc = tables.get("partials")


def streaming_log_templates(micro_batches, text_col: str = "text",
                            key_col: str = "turn_idx",
                            n_buckets: int = 4,
                            checkpoint_to: str | None = None,
                            restore_from: str | None = None
                            ) -> pa.Table:
    """Incremental counterpart of the batch ``log_templates`` query:
    template partials fold in keyed actors over time-ordered
    micro-batches; the driver merges every actor's partials and runs
    the LITERAL batch finalize — flush ≡ batch for any split
    (commutative partials). ``key_col`` only spreads load (the
    template space is global) and must be numeric (the shared
    ``int_bucket`` router). ``checkpoint_to``/``restore_from``
    snapshot and resume the partial state across driver runs."""
    import ray

    from .textops.analysis import template_finalize

    actors, _ = _drive_keyed_actors(
        micro_batches, TemplateState, (text_col,), n_buckets,
        key_col=key_col, restore_dir=restore_from,
        checkpoint_dir=checkpoint_to)
    parts = [t for t in ray.get([a.flush.remote() for a in actors])
             if t.num_rows]
    if not parts:
        return pa.table({})
    return template_finalize(pa.concat_tables(parts)).sort_by(
        [("n_tokens", "ascending"), ("first_token", "ascending")])
