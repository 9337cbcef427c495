"""Temporal joins the Dataset API lacks: as-of join and range join.

Reference parity: the reference engine has no join operator (its
enrich/lookup processors are the closest analogue), but SURVEY.md §2.8
and the large-scale-pipeline brief name as-of and range joins as core
custom operators; these are the Ray-Data-first compositions.

* :func:`asof_join` — one keyed shuffle (bucketed union cogroup, the
  ``conversation_assembly`` shape) then a fully-vectorized per-group
  kernel: both sides merge-sort by (key, ts) and a single
  ``np.maximum.accumulate`` carries the latest right-row index past
  each left row — no per-key python loop, O((l+r) log(l+r)) per group.
* :func:`range_join_broadcast` — the small interval side broadcasts
  (``ray.put`` once, read per task), each batch joins vectorized; no
  shuffle at all. Intended for interval tables that fit in one object
  (bands, SLA windows, calendars); a billion-interval side would need
  the cogroup shape instead.
* :func:`hash_join` — large×large equi-join: Ray Data's native
  hash-shuffle join with input-adaptive partition sizing.
* :func:`key_filter_join` — large×large SEMI / ANTI join (keep left
  rows whose key does / does not appear on the right) — the
  dedup-against-a-reference-corpus primitive; one bucketed-union
  shuffle, right side reduced to its key column before it moves.
* :func:`bloom_filter_join` — the SEMI/ANTI scale path: a broadcast
  bloom bitmap resolves definite non-members with no shuffle; only
  candidates enter the exact confirm. Result is exact.
* :func:`interval_point_join` — large×large containment join
  (point ∈ [lo, hi)) via grid cells: one keyed shuffle, per-bucket
  sorted points + searchsorted, per-cell clipping for exactly-once
  pairs. The complement of the broadcast range join when the
  interval side also scales with the corpus.
"""
from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .util import adaptive_buckets, fnv1a_bucket

_SIDE = "__asof_side"
_BKT = "__asof_bucket"
_TS = "__asof_ts"
_RPREF = "__r_"


def asof_join(left_ds, right_ds=None, *, on: str = "ts",
              by: str = "user_id", right_cols: dict[str, str],
              direction: str = "backward",
              tolerance_us: int | None = None, how: str = "left",
              n_buckets: int | None = None, split=None):
    """As-of join: attach to each left row the nearest right row with
    the same ``by`` key and ``right.on <= left.on`` (``backward``) or
    ``>=`` (``forward``); ties on ``on`` admit the right row.

    ``right_cols`` maps right column → output name (may include ``on``
    itself, e.g. ``{"ts": "err_ts"}``). ``how`` is ``left`` (no-match →
    nulls) or ``inner``. Rows where the right side has duplicate
    (key, on) values pick one deterministically (the last in
    (key, on, input-order) sort order).

    Single-scan mode: when both sides derive from the SAME upstream
    dataset (e.g. two event_type slices of one events table), pass that
    dataset as ``left_ds`` with ``right_ds=None`` and ``split`` = a
    function ``batch_table → (left_table, right_table)``. The input is
    then scanned ONCE and both sides tagged from each batch — half the
    input IO of the two-dataset form at 100-TB scale. Side schemas are
    inferred by applying ``split`` to an empty batch, so ``split`` must
    be schema-stable (pure filter/select/rename).
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction {direction!r}")
    mult = 1 if direction == "backward" else -1

    in_schema = getattr(left_ds.schema(), "base_schema", left_ds.schema())
    if split is not None:
        if right_ds is not None:
            raise ValueError("pass either right_ds or split, not both")
        empty_l, empty_r = split(in_schema.empty_table())
        left_schema, right_schema = empty_l.schema, empty_r.schema
    else:
        left_schema = in_schema
        right_schema = getattr(right_ds.schema(), "base_schema",
                               right_ds.schema())
    left_names = list(left_schema.names)
    rsrc = list(right_cols)
    out_names = list(right_cols.values())
    if set(out_names) & set(left_names):
        raise ValueError("right_cols output names collide with left")
    rtypes = {n: right_schema.field(n).type for n in rsrc}
    if n_buckets is None:
        n_buckets = adaptive_buckets(
            left_ds.count() + (right_ds.count() if right_ds is not None
                               else 0))

    # one union schema so the two sides concatenate into one shuffle:
    # bucket, side, key, int64 ts, left payload, prefixed right payload
    def _tag_table(t: pa.Table, side: int) -> pa.Table:
        n = t.num_rows
        key = t.column(by)
        cols = {
            _BKT: fnv1a_bucket(key, n_buckets),
            _SIDE: pa.array(np.full(n, side, np.int8)),
            by: key,
            _TS: pc.cast(t.column(on), pa.int64()),
        }
        for c in left_names:
            if c in (by,):
                continue
            cols[c] = (t.column(c) if side == 0
                       else pa.nulls(n, left_schema.field(c).type))
        for c in rsrc:
            cols[_RPREF + c] = (t.column(c) if side == 1
                                else pa.nulls(n, rtypes[c]))
        return pa.table(cols)

    if split is not None:
        def tag_both(t: pa.Table) -> pa.Table:
            lt, rt = split(t)
            return pa.concat_tables([_tag_table(lt, 0), _tag_table(rt, 1)])
        tagged = left_ds.map_batches(tag_both, batch_format="pyarrow")
    else:
        tagged = left_ds.map_batches(
            lambda t: _tag_table(t, 0), batch_format="pyarrow").union(
            right_ds.map_batches(lambda t: _tag_table(t, 1),
                                 batch_format="pyarrow"))

    def join_group(g: pa.Table) -> pa.Table:
        side = g.column(_SIDE).to_numpy(zero_copy_only=False)
        lmask, rmask = side == 0, side == 1
        left = g.filter(pa.array(lmask))
        right = g.filter(pa.array(rmask))
        out_cols = {c: left.column(c) for c in left_names}
        nl, nr = left.num_rows, right.num_rows
        if nr == 0:
            match = np.full(nl, -1, np.int64)
            rsorted = right
        else:
            lt = mult * left.column(_TS).to_numpy(zero_copy_only=False)
            rt = mult * right.column(_TS).to_numpy(zero_copy_only=False)
            # null-aware key coding (SQL ASOF/EXISTS semantics: NULL
            # never matches NULL): arrow dictionary indices instead of
            # np.unique — nulls would collapse as equal NaNs for int
            # keys and raise TypeError for string keys. Null left keys
            # code -1, null right keys -2, so they never pair; a
            # null-key left row still emits (with null right payload)
            # under how='left'.
            both = pa.concat_arrays([
                left.column(by).combine_chunks(),
                right.column(by).combine_chunks()])
            codes = pc.fill_null(pc.dictionary_encode(both).indices, -1) \
                .to_numpy(zero_copy_only=False).astype(np.int64)
            lc, rc = codes[:nl], codes[nl:]
            rc = np.where(rc < 0, -2, rc)
            rorder = np.lexsort((rt, rc))
            rsorted = right.take(pa.array(rorder, pa.int64()))
            rc_s, rt_s = rc[rorder], rt[rorder]
            # merged (key, ts) order, right rows first at equal ts so
            # equality admits the right row; the running max of
            # right-row indices at each left position IS the as-of match
            mk = np.concatenate([rc_s, lc])
            mt = np.concatenate([rt_s, lt])
            prio = np.concatenate([np.zeros(nr, np.int8),
                                   np.ones(nl, np.int8)])
            morder = np.lexsort((prio, mt, mk))
            rid = np.concatenate([np.arange(nr, dtype=np.int64),
                                  np.full(nl, -1, np.int64)])[morder]
            carry = np.maximum.accumulate(rid)
            at_left = rid == -1
            match_sorted = carry[at_left]
            # a carried index from a previous key is not a match
            key_sorted = mk[morder][at_left]
            ok = (match_sorted >= 0)
            valid = match_sorted.clip(min=0)
            ok &= rc_s[valid] == key_sorted
            if tolerance_us is not None:
                lt_sorted = mt[morder][at_left]
                ok &= (lt_sorted - rt_s[valid]) <= tolerance_us
            match_sorted = np.where(ok, match_sorted, -1)
            # back to the group's left-row order
            match = np.empty(nl, np.int64)
            match[morder[at_left] - nr] = match_sorted
        idx = pa.array(np.where(match >= 0, match, 0), pa.int64())
        mask = pa.array(match >= 0)
        for src, dst in zip(rsrc, out_names):
            col = rsorted.column(_RPREF + src) if nr else \
                pa.nulls(0, rtypes[src])
            taken = pc.take(col.combine_chunks() if
                            isinstance(col, pa.ChunkedArray) else col,
                            idx) if nr else pa.nulls(nl, rtypes[src])
            out_cols[dst] = pc.if_else(mask, taken,
                                       pa.nulls(nl, rtypes[src])) \
                if nr else taken
        out = pa.table(out_cols)
        if how == "inner":
            out = out.filter(mask)
        return out

    return (tagged.groupby(_BKT)
            .map_groups(join_group, batch_format="pyarrow"))


_JOIN_TYPES = {"inner": "inner", "left": "left_outer",
               "right": "right_outer", "full": "full_outer"}


def hash_join(left_ds, right_ds, *, on, right_on=None, how: str = "inner",
              num_partitions: int | None = None, left_suffix=None,
              right_suffix: str = "_r", target_rows: int = 500_000):
    """Distributed large×large equi-join — the join family the
    broadcast (`enrich` lookup / :func:`range_join_broadcast`) and
    temporal (:func:`asof_join`) paths don't cover.

    Thin wrapper over Ray Data's native hash-shuffle join
    (``Dataset.join``): both sides hash-partition on the key across
    ``num_partitions`` aggregating actors, i.e. ONE all-to-all
    exchange of both tables. Pick the broadcast lookup join when one
    side fits in the object store; pick this when BOTH sides are
    large. ``num_partitions`` defaults to input-linear sizing
    (~``target_rows`` rows per partition, floor 4 — each partition is
    a long-lived aggregator actor, and measured locally the actor
    startup/exchange overhead beats added parallelism below ~500k rows
    per side) per the repo's
    no-fixed-cardinality-shuffle convention, so per-aggregator memory
    stays bounded as the corpus grows while the partition count — not
    the partition size — absorbs the scale.

    ``on`` / ``right_on`` are a column name or tuple of names;
    ``how`` ∈ inner/left/right/full. When key names differ, only the
    left key column appears in the output (Ray keeps both sides'
    non-key payload, suffixing collisions with ``right_suffix``).

    NOTE: the default sizing calls ``count()`` on both inputs — free
    for plain parquet reads (metadata-only) but a full execution for
    inputs behind ``map_batches`` transforms. Such callers should pass
    ``num_partitions`` (pre-filter `_nrows`-style footer counts are a
    fine upper bound).

    NOTE: a side whose schema Ray cannot know before execution (e.g.
    behind ``map_groups``) crashes the join aggregator whenever a hash
    partition receives ZERO blocks from that side — Ray builds a
    zero-column empty table and acero fails the key FieldRef ("No
    match or multiple matches"). Keep ``num_partitions`` well under
    the distinct-key count for such inputs, or materialize a bounded
    side and re-ship it via ``from_arrow`` (known schema ⇒ empty
    partitions are fine).
    """
    on = (on,) if isinstance(on, str) else tuple(on)
    if right_on is not None and isinstance(right_on, str):
        right_on = (right_on,)
    elif right_on is not None:
        right_on = tuple(right_on)
    if how not in _JOIN_TYPES:
        raise ValueError(f"how {how!r}: one of {sorted(_JOIN_TYPES)}")
    if num_partitions is None:
        num_partitions = adaptive_buckets(
            left_ds.count() + right_ds.count(),
            target_rows=target_rows, lo=4, hi=1 << 16)
    return left_ds.join(right_ds, _JOIN_TYPES[how], num_partitions,
                        on=on, right_on=right_on,
                        left_suffix=left_suffix,
                        right_suffix=right_suffix)


def snapshot_diff(old_ds, new_ds, *, on: str, compare: str,
                  new_on: str | None = None,
                  new_compare: str | None = None,
                  n_buckets: int | None = None,
                  old_schema: pa.Schema | None = None):
    """Keyed snapshot diff: classify every key across two table
    versions as ``added`` (new only), ``removed`` (old only),
    ``changed`` (both, compare column differs) or ``same`` — the
    dataset-versioning primitive (what changed between two ingest
    snapshots / corpus releases) a 100-TB pipeline audits with.

    Output: ``(key, status, old_val, new_val)`` with nulls on the
    absent side. Keys must be non-null and UNIQUE per side (snapshot
    semantics — duplicates raise rather than silently pairing).
    Value comparison follows SQL ``=``: a null on either side of a
    both-sides key is never ``same`` (mirrors ``CASE WHEN o.v = n.v``
    falling through to ``changed``).

    Scale shape: ONE bucketed-union keyed shuffle (the
    :func:`key_filter_join` contract) moving only (key, value)
    projections of both sides; the per-group kernel is all arrow C
    kernels (``index_in`` / ``is_in`` / ``take`` / ``equal``) — no
    python per-row work, any key/value type arrow can hash.
    """
    new_on = new_on or on
    new_compare = new_compare or compare
    # as with key_filter_join: both defaults EXECUTE a transformed
    # lineage once just for sizing — such callers pass both explicitly
    if n_buckets is None:
        n_buckets = adaptive_buckets(old_ds.count() + new_ds.count())
    if old_schema is None:
        old_schema = getattr(old_ds.schema(), "base_schema",
                             old_ds.schema())
    key_type = old_schema.field(on).type
    val_type = old_schema.field(compare).type

    def tag(side_id: int, key_col: str, val_col: str):
        def fn(t: pa.Table) -> pa.Table:
            key = pc.cast(t.column(key_col), key_type)
            if pc.any(pc.is_null(key)).as_py():
                raise ValueError(
                    f"snapshot_diff: null key in side {side_id}")
            return pa.table({
                _BKT: fnv1a_bucket(key, n_buckets),
                _SIDE: pa.array(np.full(t.num_rows, side_id, np.int8)),
                "key": key,
                "val": pc.cast(t.column(val_col), val_type)})
        return fn

    tagged = old_ds.map_batches(tag(0, on, compare),
                                batch_format="pyarrow") \
        .union(new_ds.map_batches(tag(1, new_on, new_compare),
                                  batch_format="pyarrow"))

    def diff_group(g: pa.Table) -> pa.Table:
        side = g.column(_SIDE).to_numpy(zero_copy_only=False)
        old = g.filter(pa.array(side == 0))
        new = g.filter(pa.array(side == 1))
        for nm, t in (("old", old), ("new", new)):
            k = t.column("key")
            if pc.count_distinct(k).as_py() != len(k):
                raise ValueError(
                    f"snapshot_diff: duplicate keys in {nm} snapshot")
        okey = old.column("key").combine_chunks()
        nkey = new.column("key").combine_chunks()
        # new side: position of each key in the old side (null = added)
        midx = pc.index_in(nkey, value_set=okey)
        added = new.filter(pc.is_null(midx))
        both_new = new.filter(pc.is_valid(midx))
        oval = old.column("val").combine_chunks()
        both_old_val = pc.take(oval, midx.drop_null())
        both_new_val = both_new.column("val").combine_chunks()
        eq = pc.fill_null(pc.equal(both_old_val, both_new_val), False)
        # old side: keys absent from the new snapshot were removed
        removed = old.filter(
            pc.invert(pc.is_in(okey, value_set=nkey)))
        status = pa.concat_arrays([
            pa.array(np.full(added.num_rows, "added"), pa.string()),
            pc.if_else(eq, pa.scalar("same", pa.string()),
                       pa.scalar("changed", pa.string())),
            pa.array(np.full(removed.num_rows, "removed"), pa.string()),
        ])
        key_out = pa.concat_arrays(
            [added.column("key").combine_chunks(),
             both_new.column("key").combine_chunks(),
             removed.column("key").combine_chunks()])
        old_val = pa.concat_arrays(
            [pa.nulls(added.num_rows, val_type), both_old_val,
             removed.column("val").combine_chunks()])
        new_val = pa.concat_arrays(
            [added.column("val").combine_chunks(), both_new_val,
             pa.nulls(removed.num_rows, val_type)])
        return pa.table({"key": key_out, "status": status,
                         "old_val": old_val, "new_val": new_val})

    return (tagged.groupby(_BKT)
            .map_groups(diff_group, batch_format="pyarrow"))


def key_filter_join(left_ds, right_ds, *, on: str, right_on: str | None
                    = None, keep: str = "anti",
                    n_buckets: int | None = None,
                    left_schema: pa.Schema | None = None):
    """Distributed SEMI (``keep='semi'``) or ANTI (``keep='anti'``)
    join: return left rows whose ``on`` key does (semi) / does not
    (anti) appear in the right side's ``right_on`` column.

    This is the dedup-against-a-reference-corpus primitive (drop
    documents whose hash already exists in a prior training set; keep
    only allowlisted users). Both sides are large: the right side
    projects to its DISTINCT key column per batch before anything
    moves, then ONE keyed bucketed-union shuffle co-locates left rows
    with the right keys that could match them; the per-group
    membership test is a single vectorized ``pc.is_in``. Buckets scale
    with input (`adaptive_buckets`); as with :func:`hash_join`, pass
    ``n_buckets`` when an input hides transforms behind ``map_batches``
    (the default sizing ``count()`` would execute them once just to
    size the shuffle) — and ``left_schema`` for the same reason: the
    default ``left_ds.schema()`` fetch runs a limit-1 execution of a
    transformed lineage, which both wastes a pass and can wedge when
    that lineage holds a fixed-size actor pool as wide as the cluster
    (every CPU parked in probe actors, none left for the limit's task
    ops). A right side small enough to broadcast should
    use the `enrich` lookup path instead — this shape is for reference
    sets too big for one object. Null keys never match (SQL
    EXISTS/NOT EXISTS semantics): null-key left rows are dropped by
    ``semi`` and kept by ``anti``.
    """
    if keep not in ("semi", "anti"):
        raise ValueError(f"keep {keep!r}: 'semi' or 'anti'")
    right_on = right_on or on
    if left_schema is None:
        left_schema = getattr(left_ds.schema(), "base_schema",
                              left_ds.schema())
    left_names = list(left_schema.names)
    key_type = left_schema.field(on).type
    if n_buckets is None:
        n_buckets = adaptive_buckets(left_ds.count() + right_ds.count())

    def tag_left(t: pa.Table) -> pa.Table:
        cols = {_BKT: fnv1a_bucket(t.column(on), n_buckets),
                _SIDE: pa.array(np.zeros(t.num_rows, np.int8))}
        for c in left_names:
            cols[c] = t.column(c)
        return pa.table(cols)

    def tag_right(t: pa.Table) -> pa.Table:
        # distinct keys only — at 100 TB the reference corpus moves as
        # deduped fixed-width keys, not rows. Nulls drop here: SQL
        # EXISTS equality never matches NULL, but Arrow is_in would
        # (null-key left rows must land in the no-match branch)
        keys = pc.cast(t.column(right_on), key_type).unique() \
            .drop_null()
        n = len(keys)
        cols = {_BKT: fnv1a_bucket(keys, n_buckets),
                _SIDE: pa.array(np.ones(n, np.int8))}
        # SAME column order as tag_left — the union must see one schema
        for c in left_names:
            cols[c] = keys if c == on else \
                pa.nulls(n, left_schema.field(c).type)
        return pa.table(cols)

    tagged = left_ds.map_batches(tag_left, batch_format="pyarrow") \
        .union(right_ds.map_batches(tag_right, batch_format="pyarrow"))

    def filter_group(g: pa.Table) -> pa.Table:
        side = g.column(_SIDE).to_numpy(zero_copy_only=False)
        left = g.filter(pa.array(side == 0))
        rkeys = g.filter(pa.array(side == 1)).column(on)
        if len(rkeys):
            member = pc.is_in(left.column(on),
                              value_set=rkeys.combine_chunks())
            mask = member if keep == "semi" else \
                pc.invert(pc.fill_null(member, False))
        else:
            mask = pa.array(np.full(left.num_rows,
                                    keep == "anti", bool))
        return left.filter(mask).select(left_names)

    return (tagged.groupby(_BKT)
            .map_groups(filter_group, batch_format="pyarrow"))


def mark_join(left_ds, right_ds, *, on: str, right_on: str | None = None,
              mark_col: str = "mark", n_buckets: int | None = None,
              left_schema: pa.Schema | None = None):
    """Null-aware IN-subquery mark join: append a three-valued BOOLEAN
    column ``mark_col`` = SQL ``left.on IN (SELECT right_on FROM ...)``.
    Single-subquery form of :func:`multi_mark_join` (see there for the
    semantics and the marker-row mechanism)."""
    return multi_mark_join(
        left_ds, [(right_ds, right_on or on, mark_col)], on=on,
        n_buckets=n_buckets, left_schema=left_schema)


def multi_mark_join(left_ds, rights, *, on: str,
                    n_buckets: int | None = None,
                    left_schema: pa.Schema | None = None):
    """Null-aware IN-subquery marks for SEVERAL subqueries over the
    same left key in ONE bucketed-union shuffle: ``rights`` is a list
    of ``(right_ds, right_on, mark_col)``; each mark column is the
    three-valued SQL ``left.on IN (SELECT right_on FROM right)``.

    SQL ``IN`` is not a semi-join filter — it is three-valued: TRUE on
    a match; NULL (not FALSE!) when there is no match but the subquery
    produced any NULL, or when the left key is NULL and the subquery
    is non-empty; FALSE only when no match is possible against a
    null-free (or empty) right side. :func:`key_filter_join` gives the
    two-valued EXISTS semantics; this gives the ``IN`` semantics that
    differ from it exactly on those NULL branches.

    Each right side moves as per-batch-deduped keys. The two GLOBAL
    facts a bucket cannot see locally — "some right key was NULL" and
    "the right side is non-empty" — ride the same shuffle as
    replicated fixed-width marker rows (one row per bucket per fact
    per right batch, bounded), so no second pass over any right side
    is needed. Fusing several subqueries into one exchange saves one
    full execution (shuffle + its fixed floor) per extra subquery:
    the two-mark query measured 5.5 s fused vs 6.6 s chained in a
    same-process A/B at sf0.1, and the gap widens with each floor.

    ``_SIDE`` encoding: 0 = left row; for right j (0-based):
    ``1 + 3j`` = key row, ``2 + 3j`` = had-NULL marker, ``3 + 3j`` =
    non-empty marker.
    """
    if not rights:
        raise ValueError("multi_mark_join: empty rights list")
    if len(rights) > 40:  # side codes are int8: 1 + 3*j + 2 <= 127
        raise ValueError(f"multi_mark_join: {len(rights)} subqueries "
                         "exceed the int8 side-code space (max 40)")
    if left_schema is None:
        left_schema = getattr(left_ds.schema(), "base_schema",
                              left_ds.schema())
    left_names = list(left_schema.names)
    seen_marks = set()
    for _rds, _ron, mark_col in rights:
        if mark_col in left_names or mark_col in seen_marks:
            raise ValueError(f"multi_mark_join: duplicate or reserved "
                             f"mark column {mark_col!r}")
        seen_marks.add(mark_col)
    key_type = left_schema.field(on).type
    if n_buckets is None:
        n_buckets = adaptive_buckets(
            left_ds.count() + sum(r.count() for r, _, _ in rights))

    def tag_left(t: pa.Table) -> pa.Table:
        # NULL left keys hash to a NULL bucket — pin them to bucket 0
        # so they still flow through exactly one group
        cols = {_BKT: pc.fill_null(fnv1a_bucket(t.column(on), n_buckets),
                                   pa.scalar(0, pa.int32())),
                _SIDE: pa.array(np.zeros(t.num_rows, np.int8))}
        for c in left_names:
            cols[c] = t.column(c)
        return pa.table(cols)

    all_buckets = pa.array(np.arange(n_buckets, dtype=np.int32),
                           pa.int32())

    def make_tag_right(j: int, right_on: str):
        base = 1 + 3 * j

        def tag_right(t: pa.Table) -> pa.Table:
            keys = pc.cast(t.column(right_on), key_type).unique()
            nonnull = keys.drop_null()
            n = len(nonnull)
            bkt = [fnv1a_bucket(nonnull, n_buckets)]
            side = [np.full(n, base, np.int8)]
            key_col = [nonnull]
            if len(keys) > n:  # batch had NULL keys
                bkt.append(all_buckets)
                side.append(np.full(n_buckets, base + 1, np.int8))
                key_col.append(pa.nulls(n_buckets, key_type))
            if len(keys):  # batch non-empty
                bkt.append(all_buckets)
                side.append(np.full(n_buckets, base + 2, np.int8))
                key_col.append(pa.nulls(n_buckets, key_type))
            total = sum(len(b) for b in bkt)
            cols = {_BKT: pa.concat_arrays(bkt),
                    _SIDE: pa.array(np.concatenate(side))}
            for c in left_names:
                cols[c] = (pa.concat_arrays(
                    [k.combine_chunks() if isinstance(k, pa.ChunkedArray)
                     else k for k in key_col])
                    if c == on else pa.nulls(total,
                                             left_schema.field(c).type))
            return pa.table(cols)

        return tag_right

    tagged = left_ds.map_batches(tag_left, batch_format="pyarrow")
    for j, (rds, ron, _mc) in enumerate(rights):
        tagged = tagged.union(rds.map_batches(
            make_tag_right(j, ron or on), batch_format="pyarrow"))
    mark_cols = [mc for _, _, mc in rights]

    def mark_group(g: pa.Table) -> pa.Table:
        side = g.column(_SIDE).to_numpy(zero_copy_only=False)
        left = g.filter(pa.array(side == 0))
        lkey = left.column(on)
        null_left = pc.is_null(lkey)
        out = left.select(left_names)
        for j, mark_col in enumerate(mark_cols):
            base = 1 + 3 * j
            rkeys = g.filter(pa.array(side == base)).column(on)
            has_null = bool((side == base + 1).any())
            nonempty = bool((side == base + 2).any())
            if len(rkeys):
                matched = pc.fill_null(
                    pc.is_in(lkey, value_set=rkeys.combine_chunks()),
                    False)
            else:
                matched = pa.array(np.zeros(left.num_rows, bool))
            to_null = pc.and_(pc.invert(matched),
                              pc.or_(pa.scalar(has_null),
                                     pc.and_(null_left,
                                             pa.scalar(nonempty))))
            out = out.append_column(mark_col, pc.if_else(
                to_null, pa.scalar(None, pa.bool_()), matched))
        return out

    return (tagged.groupby(_BKT)
            .map_groups(mark_group, batch_format="pyarrow"))


def range_join_broadcast(ds, intervals: pa.Table, *, value_col: str,
                         lo_col: str = "lo", hi_col: str = "hi",
                         closed: str = "left",
                         max_intervals: int = 65_536):
    """Inner-join each row to EVERY interval containing
    ``row[value_col]`` (intervals may overlap — each match emits a
    row). The interval table broadcasts once via ``ray.put``; each
    batch sorts its values ONCE and answers every interval with two
    ``searchsorted`` probes (the same kernel shape as
    :func:`interval_point_join`'s per-group join) — O((B + K)·log B +
    output) per batch, not K full-column mask passes.
    ``closed``: ``left`` = ``lo <= v < hi``, ``both`` = ``lo <= v <=
    hi``. Bounded to ``max_intervals`` — per the no-silent-caps
    convention an over-limit side raises rather than degrades."""
    import ray

    if intervals.num_rows > max_intervals:
        raise ValueError(
            f"{intervals.num_rows} intervals > {max_intervals}: "
            "broadcast range join is for small interval sides; use the "
            "cogroup shape for large ones")
    if closed not in ("left", "both"):
        raise ValueError(f"closed {closed!r}")
    iv_ref = ray.put({
        "lo": pc.cast(intervals.column(lo_col), pa.float64())
        .to_numpy(zero_copy_only=False),
        "hi": pc.cast(intervals.column(hi_col), pa.float64())
        .to_numpy(zero_copy_only=False),
        "table": intervals,
    })

    def join_batch(t: pa.Table) -> pa.Table:
        iv = ray.get(iv_ref)
        v = pc.cast(t.column(value_col), pa.float64()) \
            .to_numpy(zero_copy_only=False)
        # sort the batch once; each interval is two binary-search
        # probes into the sorted values, then one np.repeat/aranges
        # explode emits all (row, interval) pairs. NaN values sort
        # past any finite hi so they never match; a NaN/null BOUND must
        # be masked explicitly — searchsorted would place a NaN hi
        # after every finite value (matching everything >= lo) where
        # the comparison-mask semantics match nothing.
        order = np.argsort(v, kind="stable")
        v_s = v[order]
        starts = np.searchsorted(v_s, iv["lo"], side="left")
        ends = np.searchsorted(v_s, iv["hi"],
                               side="right" if closed == "both"
                               else "left")
        lens = np.maximum(ends - starts, 0)
        lens[np.isnan(iv["lo"]) | np.isnan(iv["hi"])] = 0
        total = int(lens.sum())
        if total == 0:
            rows = pa.array([], pa.int64())
            ivs = pa.array([], pa.int64())
        else:
            iidx = np.repeat(np.arange(len(lens)), lens)
            offs = np.cumsum(lens) - lens
            pidx = starts[iidx] + (np.arange(total) - offs[iidx])
            rows = pa.array(order[pidx], pa.int64())
            ivs = pa.array(iidx, pa.int64())
        out = t.take(rows)
        for c in iv["table"].column_names:
            col = iv["table"].column(c)
            out = out.append_column(c, pc.take(
                col.combine_chunks() if isinstance(col, pa.ChunkedArray)
                else col, ivs))
        return out

    return ds.map_batches(join_batch, batch_format="pyarrow")


# --------------------------------------------------------- bloom join

def _splitmix64(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 finalizer (public-domain constants,
    Steele/Lea/Flood 2014) — full-avalanche 64-bit mix for integer
    keys; numpy uint64 arithmetic wraps mod 2^64 as the algorithm
    requires."""
    z = x.astype(np.uint64) + np.uint64(0x9E3779B97F4A7C15)
    z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return z ^ (z >> np.uint64(31))


def _key_hash64(col) -> tuple[np.ndarray, np.ndarray]:
    """64-bit hash of a key column plus its null mask. Integer keys mix
    numerically (splitmix64 — no string round-trip); everything else
    hashes through the vectorized FNV-1a string kernel. Null slots get
    the hash of 0/"" — callers must mask them with the returned null
    mask (SQL join semantics: NULL never matches)."""
    from .util import fnv1a_u64
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    null = pc.is_null(col).to_numpy(zero_copy_only=False)
    if pa.types.is_integer(col.type):
        vals = pc.fill_null(col, 0).to_numpy(zero_copy_only=False)
        return _splitmix64(vals), null
    return fnv1a_u64(pc.fill_null(pc.cast(col, pa.string()), "")), null


def bloom_params(n_keys: int, fpp: float = 0.01,
                 max_bits: int = 1 << 30) -> tuple[int, int]:
    """Standard bloom sizing: bits/key = -log2(fpp)/ln(2), k =
    bits/key·ln(2). ``max_bits`` caps the broadcast bitmap at 128 MiB —
    beyond that the cap does NOT break correctness (a bloom filter has
    no false negatives at any size), it only raises the false-positive
    rate, which the exact confirm stage absorbs; noted per the
    no-silent-caps convention."""
    import math
    bits_per_key = -math.log2(fpp) / math.log(2)
    n_bits = min(max_bits, max(1024, int(n_keys * bits_per_key)))
    k = max(1, round(bits_per_key * math.log(2)))
    return n_bits, k


def _bloom_positions(h1: np.ndarray, i: int, n_bits: int) -> np.ndarray:
    # Kirsch-Mitzenmacher double hashing: pos_i = h1 + i·h2, h2 odd
    h2 = _splitmix64(h1) | np.uint64(1)
    return (h1 + np.uint64(i) * h2) % np.uint64(n_bits)


def _bloom_key_positions(t: pa.Table, on: str, n_bits: int, n_hashes: int,
                         key_type: pa.DataType | None) -> np.ndarray:
    """All bloom bit positions for one batch's deduped non-null keys
    (uint64 array of length ≤ distinct-keys × n_hashes)."""
    keys = t.column(on)
    if key_type is not None and keys.type != key_type:
        keys = pc.cast(keys, key_type)
    keys = keys.unique()
    h1, null = _key_hash64(keys)
    h1 = h1[~null]
    if len(h1) == 0:
        return np.array([], np.uint64)
    return np.concatenate([_bloom_positions(h1, i, n_bits)
                           for i in range(n_hashes)])


def _bloom_set_bits(words: np.ndarray, pos: np.ndarray) -> None:
    np.bitwise_or.at(words, (pos >> np.uint64(6)).astype(np.int64),
                     np.uint64(1) << (pos & np.uint64(63)))


_KIND_BITMAP, _KIND_SPARSE = 0, 1


def _bloom_partial_table(t: pa.Table, *, on: str, n_bits: int,
                         n_hashes: int,
                         key_type: pa.DataType | None = None) -> pa.Table:
    """One batch's bloom partial: a full ``n_bits/8``-byte bitmap when
    the batch sets many bits, or a SPARSE uint32 position list when the
    set-bit count is small (< ``n_bits/32`` positions — the break-even
    where 4-byte positions undercut the bitmap bytes). Sparse partials
    cut the per-block object traffic from bitmap-size to
    output-proportional for many-block right sides whose distinct keys
    per block ≪ bitmap bits; the merged bitmap is bit-for-bit identical
    either way (tested). uint32 positions are always safe: ``n_bits``
    is capped at 2^30 (`bloom_params`)."""
    pos = np.unique(_bloom_key_positions(t, on, n_bits, n_hashes,
                                         key_type))
    if len(pos) < n_bits // 32:
        payload = pos.astype(np.uint32).tobytes()
        kind = _KIND_SPARSE
    else:
        words = np.zeros((n_bits + 63) // 64, np.uint64)
        _bloom_set_bits(words, pos)
        payload = words.tobytes()
        kind = _KIND_BITMAP
    return pa.table({"__bloom": pa.array([payload], pa.large_binary()),
                     "__kind": pa.array([kind], pa.int8())})


def _iter_bloom_payloads(col):
    # zero-copy uint8 views into the arrow large_binary buffers —
    # .to_pylist() would duplicate every payload as python bytes
    arr = col.combine_chunks() if isinstance(
        col, pa.ChunkedArray) else col
    if len(arr) == 0 or arr.buffers()[2] is None:
        return
    # honor a sliced view's offset into the shared buffers
    off = np.frombuffer(arr.buffers()[1], np.int64,
                        len(arr) + 1 + arr.offset)[arr.offset:]
    dat = np.frombuffer(arr.buffers()[2], np.uint8)
    for i in range(len(arr)):
        yield dat[off[i]:off[i + 1]]


def _bloom_merge_table(t: pa.Table, n_bits: int) -> pa.Table:
    """OR-merge a batch of mixed bitmap/sparse partials; stays sparse
    when every input is sparse and the union is still under the sparse
    break-even, else densifies."""
    kinds = t.column("__kind").to_numpy(zero_copy_only=False)
    sparse_parts, words = [], None
    for payload, kind in zip(_iter_bloom_payloads(t.column("__bloom")),
                             kinds):
        if kind == _KIND_SPARSE:
            sparse_parts.append(payload.view(np.uint32))
        else:
            if words is None:
                words = np.zeros((n_bits + 63) // 64, np.uint64)
            words |= payload.view(np.uint64)
    pos = np.unique(np.concatenate(sparse_parts)) if sparse_parts \
        else np.array([], np.uint32)
    if words is None and len(pos) < n_bits // 32:
        return pa.table({
            "__bloom": pa.array([pos.tobytes()], pa.large_binary()),
            "__kind": pa.array([_KIND_SPARSE], pa.int8())})
    if words is None:
        words = np.zeros((n_bits + 63) // 64, np.uint64)
    if len(pos):
        _bloom_set_bits(words, pos.astype(np.uint64))
    return pa.table({"__bloom": pa.array([words.tobytes()],
                                         pa.large_binary()),
                     "__kind": pa.array([_KIND_BITMAP], pa.int8())})


def build_bloom(right_ds, *, on: str, n_bits: int,
                n_hashes: int, key_type: pa.DataType | None = None) \
        -> np.ndarray:
    """One narrow scan over the right side builds a bloom bitmap:
    each batch dedups + hashes its keys and emits a local partial
    (a full bitmap row, or a sparse position list when the batch sets
    few bits — see `_bloom_partial_table`); the driver OR-merges the
    partials — a bounded reduction (#blocks × partial), the same shape
    as the HLL sketch merge. Returns the merged uint64 word array.

    ``key_type`` (pass the PROBE side's key type) casts keys before
    hashing — `_key_hash64` dispatches on the column's own type
    (splitmix64 for integers, FNV-1a-of-string otherwise), so a
    string right side probed by an integer left side would otherwise
    hash through a different kernel and produce false NEGATIVES,
    breaking the no-false-negative exactness contract."""
    n_words = (n_bits + 63) // 64

    def partial(t: pa.Table) -> pa.Table:
        return _bloom_partial_table(t, on=on, n_bits=n_bits,
                                    n_hashes=n_hashes, key_type=key_type)

    def or_merge(t: pa.Table) -> pa.Table:
        return _bloom_merge_table(t, n_bits)

    acc = np.zeros(n_words, np.uint64)
    partials = right_ds.map_batches(partial, batch_format="pyarrow")
    # worker-side fan-in BEFORE the driver merge: each or_merge batch
    # collapses a group of block bitmaps into one, so the driver pulls
    # ~#blocks/fan_in bitmaps instead of every block's (at a 128 MiB
    # capped bitmap × thousands of right-side blocks the un-fanned
    # driver loop would stream the whole partial set through one
    # process — the exact driver-bottleneck shape this repo bans).
    # fan-in sized so one task's input batch stays ≤ ~512 MiB of
    # bitmaps regardless of n_bits
    fan_in = int(max(2, min(32, (512 << 20) // max(1, n_words * 8))))
    merged = partials.map_batches(or_merge, batch_format="pyarrow",
                                  batch_size=fan_in)
    sparse_acc = []
    for b in merged.iter_batches(batch_size=None, batch_format="pyarrow"):
        kinds = b.column("__kind").to_numpy(zero_copy_only=False)
        for payload, kind in zip(
                _iter_bloom_payloads(b.column("__bloom")), kinds):
            if kind == _KIND_SPARSE:
                sparse_acc.append(payload.view(np.uint32))
            else:
                acc |= payload.view(np.uint64)
    if sparse_acc:
        _bloom_set_bits(acc, np.concatenate(sparse_acc).astype(np.uint64))
    return acc


class _BitmapHolder:
    """Rendezvous actor for the FUSED bloom build: the build thread
    deposits an ObjectRef to the finished bitmap (wrapped in a list so
    the actor call does not auto-deref it — probes plasma-share the
    one object instead of each ``get`` materializing a copy), and
    probe actors block in ``get`` (asyncio event — the actor stays
    responsive) until it lands. A build failure is re-raised here so
    the waiting probes fail the run loudly instead of hanging it."""

    def __init__(self):
        import asyncio
        self._event = asyncio.Event()
        self._ref_box: list | None = None
        self._err: str | None = None

    def set_result(self, ref_box: list) -> None:
        self._ref_box = ref_box
        self._event.set()

    def set_error(self, msg: str) -> None:
        self._err = msg
        self._event.set()

    async def get(self) -> list:
        await self._event.wait()
        if self._err is not None:
            raise RuntimeError(f"bloom build failed: {self._err}")
        return self._ref_box


class _BloomProbe:
    """Actor-pool probe stage: the bitmap ships once per actor via
    ``ray.put`` (plasma-shared per node), never per batch. Emits the
    input rows plus a ``__bloom_hit`` candidate column. ``words_ref``
    may be the array itself, an ObjectRef, or a `_BitmapHolder` handle
    (the fused path — ``__init__`` blocks until the overlapped build
    deposits the bitmap)."""

    def __init__(self, words_ref, on: str, n_bits: int, n_hashes: int):
        import ray
        if isinstance(words_ref, ray.actor.ActorHandle):
            words_ref = ray.get(words_ref.get.remote())[0]
        self.words = ray.get(words_ref) if not isinstance(
            words_ref, np.ndarray) else words_ref
        self.on, self.n_bits, self.n_hashes = on, n_bits, n_hashes

    def __call__(self, t: pa.Table) -> pa.Table:
        h1, null = _key_hash64(t.column(self.on))
        hit = np.ones(len(h1), bool)
        for i in range(self.n_hashes):
            pos = _bloom_positions(h1, i, self.n_bits)
            bits = (self.words[(pos >> np.uint64(6)).astype(np.int64)]
                    >> (pos & np.uint64(63))) & np.uint64(1)
            hit &= bits.astype(bool)
        hit &= ~null  # NULL never matches (SQL EXISTS semantics)
        return t.append_column("__bloom_hit", pa.array(hit, pa.bool_()))


def bloom_filter_join(left_ds, right_ds, *, on: str,
                      right_on: str | None = None, keep: str = "anti",
                      fpp: float = 0.01, right_count: int | None = None,
                      left_count: int | None = None,
                      n_buckets: int | None = None,
                      probe_concurrency: int = 4,
                      left_schema: pa.Schema | None = None,
                      fused: bool = True):
    """SEMI / ANTI join with a bloom prefilter — the scale path of
    :func:`key_filter_join`. Result is EXACT (bit-identical to
    ``key_filter_join``): the bloom pass has no false negatives, so
    every definite non-member resolves with NO shuffle, and only the
    candidate rows (true members + ~``fpp`` false positives) enter the
    exact confirm shuffle. At 100 TB with a selective filter this cuts
    the all-to-all exchange from the whole left table to roughly the
    match set: build (one narrow right scan, bounded bitmap reduce) →
    broadcast → narrow probe → confirm shuffle over candidates only.

    ``right_count`` sizes the bitmap (pass the parquet footer count —
    ``.count()`` on a transformed input would execute it once just for
    sizing); it defaults to ``right_ds.count()``. ``left_count``
    (same footer-count caveat) sizes the confirm shuffle for the
    WORST case — candidate volume scales with left-side match
    multiplicity plus ``fpp × left``, not with right-side key count,
    so when it's omitted the default ``2 × right_count`` sizing
    under-buckets a low-selectivity filter over a huge left side;
    pass it (or an explicit ``n_buckets``) for anything big.
    ``left_schema`` skips the ``left_ds.schema()`` fetch when the
    left side hides transforms (a schema fetch on a transformed
    lineage runs it once with limit 1). A bitmap capped at
    ``max_bits`` (see :func:`bloom_params`) degrades fpp, never
    correctness.

    Exactness precondition: the left lineage must be DETERMINISTIC.
    The anti path scans it twice (misses branch + confirm branch) and
    Ray recomputes lineage per consumer — a nondeterministic upstream
    (sampling, unseeded shuffle) would give the two scans different
    row sets.

    ``fused`` (default): the bloom build runs in a background driver
    thread OVERLAPPED with the main (probe + confirm) execution —
    probe actors block on a `_BitmapHolder` rendezvous until the
    bitmap lands, while the left read / right tag stages of the
    confirm execution proceed on the remaining slots, so the caller
    pays ~max(build, confirm) wall-clock instead of build + confirm
    (each Dataset execution carries a fixed scheduler floor).
    Exactly-once is unchanged: the build still consumes its own
    execution via ``iter_batches``. ``fused=False`` keeps the
    sequential two-execution form (deterministic timing for
    benchmarking the phases separately)."""
    if keep not in ("semi", "anti"):
        raise ValueError(f"keep {keep!r}: 'semi' or 'anti'")
    right_on = right_on or on
    if right_count is None:
        right_count = right_ds.count()
    if n_buckets is None:
        # size the confirm shuffle WITHOUT counting the candidate
        # lineage (that would execute the probe once just for sizing).
        # With left_count: worst case is every left row a candidate.
        # Without: candidates ≈ members + fpp·left ≲ a small multiple
        # of right — only safe when the filter is selective.
        n_buckets = adaptive_buckets(
            max(2 * right_count, left_count or 0, 1))
    n_bits, n_hashes = bloom_params(right_count, fpp)
    if left_schema is None:
        left_schema = getattr(left_ds.schema(), "base_schema",
                              left_ds.schema())
    left_names = list(left_schema.names)
    if "__bloom_hit" in left_names:
        raise ValueError("reserved column name in input: __bloom_hit")
    import ray
    key_type = left_schema.field(on).type
    if fused:
        # DEADLOCK GUARD: fused probes block holding their actor CPU
        # until the background build finishes, and the build's own map
        # tasks need CPUs to run. Cap the probe pools so blocked actors
        # can never park every core (the anti path forks the probed
        # stream into TWO pools), and fall back to the sequential form
        # on clusters too small to carve out build headroom.
        total_cpus = int(ray.cluster_resources().get("CPU", 0) or 0)
        if total_cpus < 4:
            fused = False
        else:
            n_pools = 2 if keep == "anti" else 1
            probe_concurrency = max(
                1, min(probe_concurrency, (total_cpus - 2) // n_pools))
    if fused:
        import threading
        holder = ray.remote(_BitmapHolder).remote()

        def _build():
            try:
                words = build_bloom(right_ds, on=right_on, n_bits=n_bits,
                                    n_hashes=n_hashes, key_type=key_type)
                ray.get(holder.set_result.remote([ray.put(words)]))
            except Exception as e:  # surfaced from _BitmapHolder.get
                try:
                    ray.get(holder.set_error.remote(repr(e)))
                except Exception:
                    pass

        threading.Thread(target=_build, daemon=True,
                         name="bloom-build").start()
        words_ref = holder
    else:
        words_ref = ray.put(build_bloom(
            right_ds, on=right_on, n_bits=n_bits, n_hashes=n_hashes,
            key_type=key_type))
    # autoscaling pool (1, N), not fixed N: a fixed pool as wide as the
    # cluster parks every CPU in probe actors and starves the task-pool
    # ops sharing the pipeline (deadlocks a 4-cpu test session)
    probed = left_ds.map_batches(
        _BloomProbe, fn_constructor_args=(words_ref, on, n_bits,
                                          n_hashes),
        batch_format="pyarrow", concurrency=(1, probe_concurrency))

    def take_hits(t: pa.Table) -> pa.Table:
        return t.filter(t.column("__bloom_hit")).select(left_names)

    candidates = probed.map_batches(take_hits, batch_format="pyarrow")
    # pass the schema we already know — letting key_filter_join fetch
    # it would run a limit-1 execution of the whole probe lineage
    confirmed = key_filter_join(candidates, right_ds, on=on,
                                right_on=right_on, keep=keep,
                                n_buckets=n_buckets,
                                left_schema=left_schema)
    if keep == "semi":
        return confirmed
    # anti: bloom misses are DEFINITE non-members (kept, zero shuffle);
    # only candidates need the exact confirm. The two branches fork the
    # probed stream, which Ray Data recomputes per consumer — the left
    # side is scanned+probed twice (both passes narrow). For a
    # selective anti filter that still beats the alternative (the
    # WHOLE left table through the confirm all-to-all); a caller that
    # can't afford the second scan uses key_filter_join directly.

    def take_misses(t: pa.Table) -> pa.Table:
        return t.filter(pc.invert(t.column("__bloom_hit"))) \
            .select(left_names)

    misses = probed.map_batches(take_misses, batch_format="pyarrow")
    return misses.union(confirmed)


# --------------------------------------------- large×large interval join

def interval_point_join(points_ds, intervals_ds, *, value_col: str,
                        lo_col: str, hi_col: str, cell: int,
                        n_buckets: int,
                        point_schema: pa.Schema | None = None,
                        interval_schema: pa.Schema | None = None,
                        max_span_cells: int = 64):
    """Inner containment join where BOTH sides are large: emit one row
    per (point, interval) with ``lo <= point_value < hi`` — the
    large×large complement of :func:`range_join_broadcast` (which
    requires an interval side small enough to ``ray.put``).

    Scale shape (the grid/spatial-join pattern): time quantizes to
    ``cell``-sized grid cells; every interval replicates to every cell
    it overlaps (bounded: an interval spanning more than
    ``max_span_cells`` cells raises — no silent caps) and each point
    maps to exactly ONE cell, so one keyed bucketed-union shuffle
    co-locates every possible match and nothing else is ever
    compared. The per-group kernel sorts the bucket's points once and
    answers each interval copy with two ``searchsorted`` probes — and
    clips each copy's [lo, hi) to ITS OWN cell's range, so a pair is
    found exactly once (in the point's cell) even when several of an
    interval's cells hash to the same bucket. O((P + I)·log P +
    output) per bucket; output volume is the join's true cardinality,
    never a cross product.

    GROUP-SIZE KNOB — ``n_buckets`` alone cannot shrink a group below
    one cell's points (a cell is atomic under cell-hash bucketing):
    the per-group materialization bound is ``cell``, NOT ``n_buckets``.
    When cells outnumber buckets, groups hold several cells; when the
    corpus grows, shrink ``cell`` (and raise ``max_span_cells``
    accordingly) — interval replication grows linearly with
    span/cell while group volume shrinks linearly, and the per-cell
    clip keeps the result exact at any cell size. E.g. day-long
    intervals at 100 TB: hour cells → 24-25 copies per interval,
    groups 1/24th the size.

    ``value_col`` / ``lo_col`` / ``hi_col`` must be timestamps or
    integers (cast to int64 internally; ``cell`` in those units).
    Rows with NULL value/lo/hi never match (SQL range-predicate
    semantics) and are dropped at the tag stage. ``point_schema`` /
    ``interval_schema`` skip the ``.schema()`` fetch on transformed
    lineages (the limit-1-execution caveat documented on
    :func:`key_filter_join`). Column names must not collide across
    the two sides or with the ``__cell``/``__bkt``/``__side`` tags."""
    if point_schema is None:
        point_schema = getattr(points_ds.schema(), "base_schema",
                               points_ds.schema())
    if interval_schema is None:
        interval_schema = getattr(intervals_ds.schema(), "base_schema",
                                  intervals_ds.schema())
    p_names = list(point_schema.names)
    i_names = list(interval_schema.names)
    clash = set(p_names) & set(i_names)
    if clash:
        raise ValueError(f"column collision across sides: {clash}")
    reserved = {"__cell", "__bkt", "__side"} & set(p_names + i_names)
    if reserved:
        raise ValueError(f"reserved column names in input: {reserved}")
    out_names = p_names + i_names
    cell_i = int(cell)

    def _i64(col):
        return pc.cast(col, pa.int64()).to_numpy(zero_copy_only=False)

    def _drop_null(t: pa.Table, cols: list[str]) -> pa.Table:
        for c in cols:
            if t.column(c).null_count:
                t = t.filter(pc.is_valid(t.column(c)))
        return t

    def _bkt(g: np.ndarray) -> pa.Array:
        return pa.array((g % n_buckets).astype(np.int32), pa.int32())

    def tag_points(t: pa.Table) -> pa.Table:
        t = _drop_null(t, [value_col])
        v = _i64(t.column(value_col))
        g = v // cell_i
        cols = {"__cell": pa.array(g, pa.int64()),
                "__bkt": _bkt(g),
                "__side": pa.array(np.zeros(len(v), np.int8))}
        for c in p_names:
            cols[c] = t.column(c)
        for c in i_names:
            cols[c] = pa.nulls(len(v), interval_schema.field(c).type)
        return pa.table(cols)

    def tag_intervals(t: pa.Table) -> pa.Table:
        t = _drop_null(t, [lo_col, hi_col])
        lo = _i64(t.column(lo_col))
        hi = _i64(t.column(hi_col))
        g0 = lo // cell_i
        g1 = np.maximum(g0, (hi - 1) // cell_i)  # empty iv stays 1 cell
        span = g1 - g0 + 1
        if len(span) and span.max() > max_span_cells:
            raise ValueError(
                f"interval spans {int(span.max())} cells > "
                f"{max_span_cells}: raise `cell` or split the interval")
        ridx = np.repeat(np.arange(len(lo)), span)
        # vectorized per-interval cell ranges (aranges trick)
        offs = np.cumsum(span) - span
        g = g0[ridx] + (np.arange(int(span.sum())) - offs[ridx])
        cols = {"__cell": pa.array(g, pa.int64()),
                "__bkt": _bkt(g),
                "__side": pa.array(np.ones(len(g), np.int8))}
        for c in p_names:
            cols[c] = pa.nulls(len(g), point_schema.field(c).type)
        for c in i_names:
            col = t.column(c)
            col = col.combine_chunks() if isinstance(
                col, pa.ChunkedArray) else col
            cols[c] = pc.take(col, pa.array(ridx, pa.int64()))
        return pa.table(cols)

    tagged = points_ds.map_batches(tag_points, batch_format="pyarrow") \
        .union(intervals_ds.map_batches(tag_intervals,
                                        batch_format="pyarrow"))

    def join_group(grp: pa.Table) -> pa.Table:
        side = grp.column("__side").to_numpy(zero_copy_only=False)
        pts = grp.filter(pa.array(side == 0))
        ivs = grp.filter(pa.array(side == 1))
        if pts.num_rows == 0 or ivs.num_rows == 0:
            return grp.slice(0, 0).select(out_names)
        pv = _i64(pts.column(value_col))
        order = np.argsort(pv, kind="stable")
        pv_s = pv[order]
        lo = _i64(ivs.column(lo_col))
        hi = _i64(ivs.column(hi_col))
        gcell = ivs.column("__cell").to_numpy(zero_copy_only=False)
        # clip each copy's window to its own cell so a pair matches
        # exactly once — in the point's cell
        lo_c = np.maximum(lo, gcell * cell_i)
        hi_c = np.minimum(hi, (gcell + 1) * cell_i)
        starts = np.searchsorted(pv_s, lo_c, side="left")
        ends = np.searchsorted(pv_s, hi_c, side="left")
        lens = np.maximum(ends - starts, 0)
        total = int(lens.sum())
        if total == 0:
            return grp.slice(0, 0).select(out_names)
        iidx = np.repeat(np.arange(len(lo)), lens)
        offs = np.cumsum(lens) - lens
        pidx = starts[iidx] + (np.arange(total) - offs[iidx])
        ptake = pa.array(order[pidx], pa.int64())
        itake = pa.array(iidx, pa.int64())
        cols = {c: pc.take(pts.column(c).combine_chunks()
                           if isinstance(pts.column(c), pa.ChunkedArray)
                           else pts.column(c), ptake) for c in p_names}
        for c in i_names:
            col = ivs.column(c)
            cols[c] = pc.take(col.combine_chunks() if isinstance(
                col, pa.ChunkedArray) else col, itake)
        return pa.table({c: cols[c] for c in out_names})

    return tagged.groupby("__bkt").map_groups(join_group,
                                              batch_format="pyarrow")


def _run_positions(lens: np.ndarray) -> np.ndarray:
    """0..len-1 position index within each run of the given lengths
    (vectorized): [2, 3] → [0, 1, 0, 1, 2]."""
    if not len(lens):
        return np.array([], np.int64)
    starts = np.cumsum(lens) - lens
    return np.arange(int(lens.sum())) - np.repeat(starts, lens)


def _codepoint_matrix(vals: np.ndarray) -> tuple[np.ndarray, int]:
    """Strings → (n, W) uint32 CODEPOINT matrix (numpy UCS-4 view, so
    multi-byte UTF-8 never splits — edit distance stays character-
    level like SQL ``levenshtein``), zero-padded to the widest string.
    Returns (matrix, W)."""
    u = vals.astype("U")  # fixed-width UCS4, zero-padded
    w = u.dtype.itemsize // 4
    if w == 0:  # all-empty input
        return np.zeros((len(u), 0), np.uint32), 0
    return u.view(np.uint32).reshape(len(u), w), w


def _verify_edit1(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Vectorized EXACT edit-distance-==-1 check for candidate string
    pairs (object arrays of equal length). Pairs are split by the
    (len(a), len(b)) class: equal length → hamming == 1 (one padded
    codepoint-matrix compare); |len| diff == 1 → one-char-deletion
    match via two cumprods (prefix-equal and suffix-aligned-equal);
    any other length gap can never be distance 1. No python loop over
    pairs — classes are O(distinct lengths), not O(pairs)."""
    out = np.zeros(len(a), bool)
    if not len(a):
        return out
    la = np.fromiter((len(x) for x in a), np.int64, len(a))
    lb = np.fromiter((len(x) for x in b), np.int64, len(b))
    # --- substitution class: equal lengths, hamming distance == 1
    eq = la == lb
    if eq.any():
        ma, _ = _codepoint_matrix(a[eq])
        mb, _ = _codepoint_matrix(b[eq])
        w = min(ma.shape[1], mb.shape[1])
        # widths can differ only via padding; padded tails compare
        # equal (both zero) for same-length strings
        out[np.flatnonzero(eq)] = (
            (ma[:, :w] != mb[:, :w]).sum(1)
            + (ma[:, w:] != 0).sum(1) + (mb[:, w:] != 0).sum(1)) == 1
    # --- indel class: length gap exactly 1 (long l, short s)
    gap1 = np.abs(la - lb) == 1
    if gap1.any():
        idx = np.flatnonzero(gap1)
        swap = lb[idx] > la[idx]
        longv = np.where(swap, b[idx], a[idx])
        shortv = np.where(swap, a[idx], b[idx])
        ml, _ = _codepoint_matrix(longv)
        ms, _ = _codepoint_matrix(shortv)
        ls = np.fromiter((len(x) for x in shortv), np.int64,
                         len(shortv))
        w = ls.max() if len(ls) else 0
        if ml.shape[1] < w + 1:
            ml = np.pad(ml, ((0, 0), (0, w + 1 - ml.shape[1])))
        if ms.shape[1] < w:
            ms = np.pad(ms, ((0, 0), (0, w - ms.shape[1])))
        cols = np.arange(w)
        inside = cols[None, :] < ls[:, None]
        # P[:, k]: long[:k] == short[:k]; R[:, k]: long[k+1:] == short[k:]
        pre = np.logical_or(ml[:, :w] == ms[:, :w], ~inside)
        P = np.cumprod(pre, 1, dtype=bool)
        suf = np.logical_or(ml[:, 1:w + 1] == ms[:, :w], ~inside)
        R = np.flip(np.cumprod(np.flip(suf, 1), 1, dtype=bool), 1)
        # deleting long[k] works iff prefix before k and suffix from k
        # both match, for some k in [0, len(short)]; k == len(short)
        # means the deleted char is long's last
        kmatch = np.concatenate(
            [np.ones((len(ls), 1), bool), P[:, :w]], 1) \
            & np.concatenate([R, np.ones((len(ls), 1), bool)], 1)
        out[idx] = np.logical_and(
            kmatch, np.arange(w + 1)[None, :] <= ls[:, None]).any(1)
    return out


def edit1_self_join(ds, *, on: str, n_buckets: int | None = None):
    """Fuzzy self-join: all unordered pairs of DISTINCT string values
    of ``on`` at Levenshtein distance EXACTLY 1 (the record-linkage /
    typo-blocking primitive; SQL spells it ``levenshtein(a,b)=1`` over
    a V² cross join).

    Scale shape — deletion-neighborhood blocking: every value ``s``
    emits ``len(s)+1`` blocking keys (``s`` itself plus each one-char
    deletion, deduplicated per string). Two values are within edit
    distance 1 IFF they share a key — indel pairs meet AT the shorter
    string, substitution pairs at the common deletion — so blocking
    has no false negatives, and shuffle volume is (avg_len+1)×V,
    linear in the corpus, vs the naive all-pairs V² scan. Collisions
    (keys shared by distance-2 pairs, e.g. "ab"/"ba" share "a") cost
    only the exact vectorized verify.

    EXACTLY-ONCE without a dedup pass: a distance-1 pair shares
    EXACTLY ONE key once each string's key set is deduplicated —
    an indel pair's only common key is the shorter string (all other
    keys differ in length), and a substitution pair's only common key
    is the deletion at the single mismatch position — so each pair is
    found in precisely one key group and the single keyed shuffle is
    the whole join. Duplicate VALUES (across rows or batches) collapse
    inside the group kernel's per-key ``np.unique``, which also makes
    per-batch pre-distinct merely an optimization, never a correctness
    requirement.

    Returns (name_a, name_b) with name_a < name_b. NULL values never
    match (SQL join semantics). O(V·len) generation, O(candidates)
    verify; group sizes are bounded by key collision counts (strings
    within distance 1 of a common deletion), not the corpus."""
    schema = getattr(ds.schema(), "base_schema", ds.schema())
    if on not in schema.names:
        raise ValueError(f"no column {on!r} in input")

    def gen_keys(t: pa.Table) -> pa.Table:
        col = t.column(on)
        vals = pc.unique(pc.drop_null(
            col.combine_chunks() if isinstance(col, pa.ChunkedArray)
            else col)).to_numpy(zero_copy_only=False)
        if not len(vals):
            return pa.table({"key": pa.array([], pa.string()),
                             "val": pa.array([], pa.string())})
        lens = np.fromiter((len(v) for v in vals), np.int64, len(vals))
        keys = [vals]  # the string itself is always a key
        owners = [np.arange(len(vals))]
        for L in np.unique(lens):
            sel = np.flatnonzero(lens == L)
            if L == 0:
                continue
            if L == 1:
                keys.append(np.full(len(sel), "", object))
                owners.append(sel)
                continue
            m, _ = _codepoint_matrix(vals[sel])
            m = m[:, :L]
            for i in range(L):
                md = np.ascontiguousarray(
                    np.concatenate([m[:, :i], m[:, i + 1:]], 1))
                keys.append(md.view(f"<U{L - 1}").ravel()
                            .astype(object))
                owners.append(sel)
        key_arr = np.concatenate(keys)
        own_arr = np.concatenate(owners)
        # dedup (key, owner): repeated-char runs yield identical
        # deletions — the exactly-once guarantee needs one key per pair
        uniq = np.unique(
            np.stack([key_arr.astype("U"), vals[own_arr].astype("U")],
                     axis=1), axis=0)
        return pa.table({"key": pa.array(uniq[:, 0], pa.string()),
                         "val": pa.array(uniq[:, 1], pa.string())})

    nb = n_buckets or 64

    def add_bucket(t: pa.Table) -> pa.Table:
        return t.append_column("bucket",
                               fnv1a_bucket(t.column("key"), nb))

    def pairs_group(g: pa.Table) -> pa.Table:
        k = g.column("key").to_numpy(zero_copy_only=False)
        v = g.column("val").to_numpy(zero_copy_only=False)
        order = np.lexsort((v.astype("U"), k.astype("U")))
        k, v = k[order], v[order]
        # drop duplicate (key, val) rows arriving from different batches
        keep = np.append(True, (k[1:] != k[:-1]) | (v[1:] != v[:-1]))
        k, v = k[keep], v[keep]
        new_run = np.append(True, k[1:] != k[:-1])
        starts = np.flatnonzero(new_run)
        lens = np.diff(np.append(starts, len(k)))
        # triangle explode per run (the cooccurrence kernel shape)
        m = lens[lens >= 2]
        st = starts[lens >= 2]
        if not len(m):
            return pa.table({"name_a": pa.array([], pa.string()),
                             "name_b": pa.array([], pa.string())})
        # repeat/arange triangle explode (the cooccurrence kernel):
        # element at run position p pairs with the cnt-p-1 that follow
        sel = np.repeat(st, m) + _run_positions(m)
        run_of = np.repeat(np.arange(len(m)), m)
        pos = _run_positions(m)
        reps = m[run_of] - pos - 1
        lefts = np.repeat(sel, reps)
        tot = int(reps.sum())
        block = (np.cumsum(reps) - reps).astype(np.int64)
        rights = lefts + 1 + (np.arange(tot) - np.repeat(block, reps))
        ai = v[lefts]
        bj = v[rights]
        ok = _verify_edit1(ai, bj)
        ai, bj = ai[ok], bj[ok]
        lo = np.where(ai.astype("U") < bj.astype("U"), ai, bj)
        hi = np.where(ai.astype("U") < bj.astype("U"), bj, ai)
        return pa.table({"name_a": pa.array(lo.astype("U")),
                         "name_b": pa.array(hi.astype("U"))})

    return ds.map_batches(gen_keys, batch_format="pyarrow") \
        .map_batches(add_bucket, batch_format="pyarrow") \
        .groupby("bucket").map_groups(pairs_group,
                                      batch_format="pyarrow")
