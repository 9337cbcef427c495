"""Mergeable sketches for wide aggregates: HyperLogLog distinct count.

The 100-TB shape: each batch folds its values into a FIXED-SIZE register
array inside ``map_batches`` (one row of ``m`` bytes per batch — the
combiner pattern), partials merge by element-wise max anywhere (tasks,
tree, or driver: the fan-in is ``n_batches × m`` bytes regardless of
data volume, which is what makes a sketch a sketch). Standard HLL
(Flajolet et al. 2007) with the linear-counting small-range correction.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..util import fnv1a_u64


def _fmix64(h: np.ndarray) -> np.ndarray:
    """Murmur3 finalizer: FNV-1a's last multiply barely avalanches into
    the TOP bits for short inputs (consecutive single-char keys share
    their high 12+ bits), and HLL indexes by the top p bits — mix first."""
    h = h.astype(np.uint64, copy=True)
    h ^= h >> np.uint64(33)
    h *= np.uint64(0xFF51AFD7ED558CCD)
    h ^= h >> np.uint64(33)
    h *= np.uint64(0xC4CEB9FE1A85EC53)
    h ^= h >> np.uint64(33)
    return h


class HyperLogLog:
    """Vectorized HLL with 2**p registers (p=14 → 16 KiB, ~0.8% rse)."""

    def __init__(self, p: int = 14):
        # p >= 7 keeps the asymptotic alpha formula within its validity
        # range (m >= 128 per the HLL paper; smaller m needs the fixed
        # alpha_16/32/64 constants this implementation omits)
        assert 7 <= p <= 18
        self.p = p
        self.m = 1 << p
        self.registers = np.zeros(self.m, dtype=np.uint8)

    def add_hashed(self, h: np.ndarray) -> None:
        """Fold 64-bit hashes: register index = top p bits, rank = count
        of leading zeros in the remaining 64-p bits + 1."""
        h = h.astype(np.uint64, copy=False)
        idx = (h >> np.uint64(64 - self.p)).astype(np.int64)
        suffix = h & np.uint64((1 << (64 - self.p)) - 1)
        # bit_length via frexp: exact for suffix < 2^53 (any p >= 11);
        # below that the float rounding could only carry at the 2^-52
        # tail — immaterial to the estimator
        width = 64 - self.p
        s = suffix.astype(np.float64)
        with np.errstate(divide="ignore"):
            _, exp = np.frexp(s)
        bit_length = np.where(suffix > 0, exp, 0).astype(np.int64)
        rho = (width - bit_length + 1).astype(np.uint8)
        np.maximum.at(self.registers, idx, rho)

    def add_column(self, col) -> None:
        """Fold an arrow column (strings hash directly, other types via
        string cast — nulls skipped, matching COUNT(DISTINCT))."""
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        valid = pc.is_valid(col)
        if not pc.any(valid).as_py():
            return
        col = col.filter(valid)
        self.add_hashed(_fmix64(fnv1a_u64(pc.cast(col, pa.string()))))

    def merge(self, other: "HyperLogLog") -> "HyperLogLog":
        assert other.p == self.p
        np.maximum(self.registers, other.registers, out=self.registers)
        return self

    def merge_registers(self, regs: np.ndarray) -> None:
        np.maximum(self.registers, regs.astype(np.uint8),
                   out=self.registers)

    def estimate(self) -> float:
        m = float(self.m)
        alpha = 0.7213 / (1 + 1.079 / m)
        inv = np.power(2.0, -self.registers.astype(np.float64))
        raw = alpha * m * m / inv.sum()
        zeros = int((self.registers == 0).sum())
        if raw <= 2.5 * m and zeros:
            return m * np.log(m / zeros)  # linear counting
        return raw


def mg_summarize(keys: np.ndarray, counts: np.ndarray,
                 m: int) -> tuple[np.ndarray, np.ndarray, int]:
    """One Misra-Gries reduction: keep the ``m`` largest counts after
    subtracting the (m+1)-th largest from everything (counts ≤ 0
    drop). Returns ``(keys, reduced_counts, offset)`` where ``offset``
    is the amount subtracted — the summary's contribution to the
    global underestimate bound. The classic mergeable-summaries result
    (Agarwal et al., PODS'12): summing summaries key-wise and reducing
    again is itself an MG summary whose error bound is the SUM of the
    offsets, so partials can merge in any shape (tasks, tree, driver)."""
    if len(keys) <= m:
        return keys, counts, 0
    order = np.argsort(counts, kind="stable")[::-1]
    offset = int(counts[order[m]])
    keep = order[:m]
    reduced = counts[keep] - offset
    pos = reduced > 0
    return keys[keep][pos], reduced[pos], offset


def heavy_hitters(ds, column: str, k: int = 25,
                  m: int = 4096) -> pa.Table:
    """Approximate corpus-wide top-k heavy hitters with NO shuffle:
    each batch reduces its exact local counts to an ``m``-entry
    Misra-Gries summary (fixed-width rows regardless of batch
    cardinality), the driver sums summaries key-wise and reduces once
    more. Estimates UNDERCOUNT by at most ``bound`` = Σ offsets
    (≈ N/(m+1) per reduction): ``est ≤ true ≤ est + bound``, and any
    key with true count > bound is guaranteed present.

    This is the scale path of the exact ``token_topk`` groupby: that
    shuffle moves one row per (batch, distinct key) — fine for a
    bounded vocabulary, unbounded for web-scale token/URL/id columns —
    while the sketch's fan-in is ``n_batches × m`` rows no matter how
    many distinct keys exist. Returns (key, est, bound) for the top
    ``k`` by estimate (count desc, key asc — deterministic), plus the
    global bound on every row."""

    def partial(tbl: pa.Table) -> pa.Table:
        col = tbl.column(column)
        col = col.combine_chunks() if isinstance(
            col, pa.ChunkedArray) else col
        col = pc.cast(col.drop_null(), pa.string())
        g = pa.table({"k": col}).group_by("k") \
            .aggregate([([], "count_all")])
        keys = g.column("k").to_numpy(zero_copy_only=False)
        counts = g.column("count_all").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        keys, counts, off = mg_summarize(keys, counts, m)
        # one sentinel null-key row per batch carries its offset
        return pa.table({
            "key": pa.array(keys.tolist() + [None], pa.string()),
            "cnt": pa.array(np.append(counts, off), pa.int64()),
        })

    acc: dict[str, int] = {}
    total_off = 0
    for b in ds.map_batches(partial, batch_format="pyarrow") \
            .iter_batches(batch_size=None, batch_format="pyarrow"):
        for key, cnt in zip(b.column("key").to_pylist(),
                            b.column("cnt").to_numpy(
                                zero_copy_only=False)):
            if key is None:
                total_off += int(cnt)
            elif cnt > 0:
                acc[key] = acc.get(key, 0) + int(cnt)
    if acc:
        keys = np.array(list(acc.keys()), object)
        counts = np.fromiter(acc.values(), np.int64, len(acc))
        keys, counts, off2 = mg_summarize(keys, counts, m)
        total_off += off2
    else:
        keys = np.array([], object)
        counts = np.array([], np.int64)
    order = np.lexsort((keys, -counts))[:k]
    return pa.table({
        "key": pa.array(keys[order].tolist(), pa.string()),
        "est": pa.array(counts[order], pa.int64()),
        "bound": pa.array(np.full(len(order), total_off, np.int64),
                          pa.int64()),
    })


def approx_distinct(ds, column: str, p: int = 14) -> float:
    """Distributed approximate COUNT(DISTINCT column): per-batch HLL
    partials (one m-byte register row each) merged on the driver —
    bounded fan-in regardless of input size."""
    m = 1 << p

    def partial(tbl: pa.Table) -> pa.Table:
        hll = HyperLogLog(p)
        hll.add_column(tbl.column(column))
        return pa.table({"regs": pa.array([hll.registers.tobytes()],
                                          pa.binary())})

    merged = HyperLogLog(p)
    for batch in ds.map_batches(partial, batch_format="pyarrow") \
                   .iter_batches(batch_size=None, batch_format="pyarrow"):
        for blob in batch.column("regs").to_pylist():
            merged.merge_registers(np.frombuffer(blob, dtype=np.uint8,
                                                 count=m))
    return merged.estimate()


def grouped_approx_distinct(ds, *, group_col: str, value_col: str,
                            p: int = 12) -> pa.Table:
    """Approximate COUNT(DISTINCT value) PER GROUP — the grouped-sketch
    scale path of an exact two-level distinct (`users_per_type`): when
    per-group distinct sets outgrow what an exact dedup shuffle should
    carry, each batch emits one ``2**p``-byte register row per distinct
    group it contains and the driver folds ``groups × blocks``
    fixed-size partials with register maxes (commutative — any fold
    order gives the identical sketch). Default p=12 → 4 KiB/row,
    ~1.6% rse. Null groups and null values are skipped
    (COUNT DISTINCT / GROUP BY mirror-test convention).

    Returns an arrow table ``(group_col, estimate: float64)`` sorted
    by group."""
    from ..util import fnv1a_u64
    m = 1 << p

    def partial(t: pa.Table) -> pa.Table:
        both = pc.and_(pc.is_valid(t.column(group_col)),
                       pc.is_valid(t.column(value_col)))
        sub = t.filter(both)
        if sub.num_rows == 0:
            return pa.table({group_col: pa.array([], pa.string()),
                             "regs": pa.array([], pa.binary())})
        enc = pc.dictionary_encode(pc.cast(sub.column(group_col),
                                           pa.string())
                                   .combine_chunks())
        idx = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        h = _fmix64(fnv1a_u64(pc.cast(sub.column(value_col),
                                      pa.string())))
        groups, regs = [], []
        # python loop over the batch's DISTINCT groups only (bounded by
        # the group cardinality, never the rows)
        for gi, gname in enumerate(enc.dictionary.to_pylist()):
            hll = HyperLogLog(p)
            hll.add_hashed(h[idx == gi])
            groups.append(gname)
            regs.append(hll.registers.tobytes())
        return pa.table({group_col: pa.array(groups, pa.string()),
                         "regs": pa.array(regs, pa.binary())})

    acc: dict[str, np.ndarray] = {}
    for batch in ds.map_batches(partial, batch_format="pyarrow") \
                   .iter_batches(batch_size=None, batch_format="pyarrow"):
        for g, blob in zip(batch.column(group_col).to_pylist(),
                           batch.column("regs").to_pylist()):
            r = np.frombuffer(blob, dtype=np.uint8, count=m)
            cur = acc.get(g)
            acc[g] = r.copy() if cur is None else np.maximum(cur, r)
    out_g = sorted(acc)
    ests = []
    for g in out_g:
        hll = HyperLogLog(p)
        hll.merge_registers(acc[g])
        ests.append(float(hll.estimate()))
    return pa.table({group_col: pa.array(out_g, pa.string()),
                     "estimate": pa.array(ests, pa.float64())})


class KllSketch:
    """Mergeable streaming quantile sketch (Karnin–Lang–Liberty
    compactor stack, fixed per-level capacity ``k``): level-``i`` items
    carry weight ``2^i``; a full level sorts and promotes alternate
    items, emptying itself. Each level-``i`` compaction perturbs any
    rank by ≤ ``2^i``, and level ``i`` compacts ≤ ``n / (k·2^i)``
    times, so the additive rank error is ≤ ``H·n/k`` over
    ``H ≈ log2(n/k)`` levels — the classic compactor bound. This is
    the quantile path for UNBOUNDED real-valued domains where the
    exact (quantum, count) CDF (bounded by value range × precision)
    does not apply.

    The compaction offset is DETERMINISTIC pseudo-randomness —
    ``_fmix64`` of (level, compaction count) — so any machine computes
    the identical sketch from the identical stream order (no RNG, the
    repo-wide determinism rule), at the cost of the randomized
    analysis' independence assumption (tested empirically on sorted
    adversarial input).

    Size: ≤ ``k`` float64 per level, ``H`` levels — KBs at any n.
    """

    def __init__(self, k: int = 256):
        if k < 8 or k % 2:
            raise ValueError(f"k must be even and >= 8: {k}")
        self.k = k
        self.levels: list[np.ndarray] = [np.empty(0, np.float64)]
        self.n = 0
        self._compactions = 0

    def add(self, values: np.ndarray) -> None:
        v = np.asarray(values, np.float64)
        v = v[~np.isnan(v)]
        if not len(v):
            return
        self.n += len(v)
        self.levels[0] = np.concatenate([self.levels[0], v])
        self._compact_all()

    def add_column(self, col) -> None:
        arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) \
            else col
        self.add(pc.cast(arr.drop_null(), pa.float64())
                 .to_numpy(zero_copy_only=False))

    def _compact_all(self) -> None:
        i = 0
        while i < len(self.levels):
            if len(self.levels[i]) >= self.k:
                buf = np.sort(self.levels[i], kind="stable")
                # an odd buffer leaves its max behind: promoting
                # ceil/floor(L/2) items at doubled weight would drift
                # the total weight off n (weight conservation is what
                # makes quantile()'s cum[-1] == n exact)
                if len(buf) % 2:
                    keep, buf = buf[-1:], buf[:-1]
                else:
                    keep = np.empty(0, np.float64)
                off = int(_fmix64(np.array(
                    [(i << 32) | self._compactions],
                    np.uint64))[0] & np.uint64(1))
                self._compactions += 1
                promoted = buf[off::2]
                self.levels[i] = keep
                if i + 1 == len(self.levels):
                    self.levels.append(np.empty(0, np.float64))
                self.levels[i + 1] = np.concatenate(
                    [self.levels[i + 1], promoted])
            i += 1

    def merge(self, other: "KllSketch") -> "KllSketch":
        if other.k != self.k:
            raise ValueError("k mismatch")
        while len(self.levels) < len(other.levels):
            self.levels.append(np.empty(0, np.float64))
        for i, buf in enumerate(other.levels):
            self.levels[i] = np.concatenate([self.levels[i], buf])
        self.n += other.n
        self._compactions += other._compactions
        self._compact_all()
        return self

    def _weighted(self) -> tuple[np.ndarray, np.ndarray]:
        vals = np.concatenate(self.levels) if self.levels else \
            np.empty(0, np.float64)
        wts = np.concatenate(
            [np.full(len(buf), 1 << i, np.int64)
             for i, buf in enumerate(self.levels)]) if self.levels \
            else np.empty(0, np.int64)
        order = np.argsort(vals, kind="stable")
        return vals[order], np.cumsum(wts[order])

    def quantile(self, q: float) -> float:
        """Smallest stored value whose cumulative weight reaches
        ``ceil(q·n)`` — the repo's discrete selection rule on the
        sketch's weighted sample."""
        if not self.n:
            raise ValueError("empty sketch")
        vals, cum = self._weighted()
        idx = int(np.searchsorted(cum, np.ceil(q * cum[-1]),
                                  side="left"))
        return float(vals[min(idx, len(vals) - 1)])

    def to_table(self) -> pa.Table:
        """(level, value) rows — the mergeable partial a map_batches
        stage ships (≤ k × H rows per batch regardless of batch size).
        No separate count column: weight conservation makes
        ``n == Σ 2^level`` exactly, so ANY regrouping of these rows
        (Ray re-batches freely between operators) rebuilds correctly."""
        lv = np.concatenate(
            [np.full(len(buf), i, np.int64)
             for i, buf in enumerate(self.levels)]) if self.levels \
            else np.empty(0, np.int64)
        return pa.table({"level": pa.array(lv, pa.int64()),
                         "value": pa.array(np.concatenate(self.levels)
                                           if self.levels else
                                           np.empty(0, np.float64),
                                           pa.float64())})

    @classmethod
    def from_table(cls, t: pa.Table, k: int = 256) -> "KllSketch":
        """Rebuild from ``to_table`` rows — or from any concatenation /
        split of such rows: the level column carries each item's
        weight, and the total count is their exact sum."""
        s = cls(k)
        lv = t.column("level").to_numpy(zero_copy_only=False)
        vals = t.column("value").to_numpy(zero_copy_only=False)
        top = int(lv.max()) if len(lv) else 0
        s.levels = [vals[lv == i].astype(np.float64)
                    for i in range(top + 1)]
        s.n = int((np.int64(1) << lv).sum())
        s._compact_all()
        return s


def sketch_quantiles(ds, *, value_col: str,
                     qs: tuple[float, ...] = (0.5, 0.95, 0.99),
                     k: int = 256) -> pa.Table:
    """Distributed approximate quantiles via per-batch KLL sketches:
    each batch folds into a fixed-size compactor stack and ships
    (level, value) partial rows (≤ k × levels per batch — independent
    of batch size); the driver merges the stacks and reads the
    quantiles off the weighted sample. Rank error ≤ ~H·n/k (H =
    log2(n/k) levels) — value-asserted against the exact CDF in
    tests."""
    def partial(t: pa.Table) -> pa.Table:
        s = KllSketch(k)
        s.add_column(t.column(value_col))
        return s.to_table()

    merged = KllSketch(k)
    for batch in ds.map_batches(partial, batch_format="pyarrow") \
                   .iter_batches(batch_size=None, batch_format="pyarrow"):
        if batch.num_rows:
            merged.merge(KllSketch.from_table(batch, k))
    cols: dict = {"n": pa.array([merged.n], pa.int64())}
    for q in qs:
        name = f"p{str(q * 100).rstrip('0').rstrip('.').replace('.', '_')}"
        cols[f"{name}_est"] = pa.array([merged.quantile(q)],
                                       pa.float64())
    return pa.table(cols)


def grouped_sketch_quantiles(ds, *, group_col: str, value_col: str,
                             qs: tuple[float, ...] = (0.5, 0.95, 0.99),
                             k: int = 256) -> pa.Table:
    """Per-group approximate quantiles via KLL — `sketch_quantiles`
    with one compactor stack per group (the sketch mirror of
    `grouped_exact_quantiles`, for unbounded value domains). Each batch
    ships (group, level, value) rows bounded by groups × k × levels —
    independent of batch size; the driver merges stacks per group.
    The per-batch python loop runs over the batch's DISTINCT groups
    only (the `grouped_approx_distinct` convention)."""
    def partial(t: pa.Table) -> pa.Table:
        both = pc.and_(pc.is_valid(t.column(group_col)),
                       pc.is_valid(t.column(value_col)))
        sub = t.filter(both)
        if sub.num_rows == 0:
            return pa.table({group_col: pa.array([], pa.string()),
                             "level": pa.array([], pa.int64()),
                             "value": pa.array([], pa.float64())})
        enc = pc.dictionary_encode(pc.cast(sub.column(group_col),
                                           pa.string())
                                   .combine_chunks())
        idx = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        v = pc.cast(sub.column(value_col), pa.float64()) \
            .to_numpy(zero_copy_only=False)
        gs, lvs, vals = [], [], []
        for gi, gname in enumerate(enc.dictionary.to_pylist()):
            s = KllSketch(k)
            s.add(v[idx == gi])
            t_g = s.to_table()
            m = t_g.num_rows
            gs.extend([gname] * m)
            lvs.append(t_g.column("level"))
            vals.append(t_g.column("value"))
        return pa.table({
            group_col: pa.array(gs, pa.string()),
            "level": pa.concat_arrays(
                a.combine_chunks() if isinstance(a, pa.ChunkedArray)
                else a for a in lvs),
            "value": pa.concat_arrays(
                a.combine_chunks() if isinstance(a, pa.ChunkedArray)
                else a for a in vals)})

    acc: dict[str, KllSketch] = {}
    for batch in ds.map_batches(partial, batch_format="pyarrow") \
                   .iter_batches(batch_size=None, batch_format="pyarrow"):
        if batch.num_rows == 0:
            continue
        enc = pc.dictionary_encode(batch.column(group_col)
                                   .combine_chunks())
        idx = enc.indices.to_numpy(zero_copy_only=False)
        for gi, gname in enumerate(enc.dictionary.to_pylist()):
            part = batch.filter(pa.array(idx == gi))
            s = KllSketch.from_table(part, k)
            cur = acc.get(gname)
            acc[gname] = s if cur is None else cur.merge(s)
    out_g = sorted(acc)
    cols: dict = {group_col: pa.array(out_g, pa.string()),
                  "n": pa.array([acc[g].n for g in out_g], pa.int64())}
    for q in qs:
        name = f"p{str(q * 100).rstrip('0').rstrip('.').replace('.', '_')}"
        cols[f"{name}_est"] = pa.array(
            [acc[g].quantile(q) for g in out_g], pa.float64())
    return pa.table(cols)


class CountMinSketch:
    """Count-Min frequency sketch (Cormode & Muthukrishnan 2005):
    a ``d x w`` counter matrix; every key increments one counter per
    row (Kirsch-Mitzenmacher double hashing off the shared `_fmix64`
    mix — deterministic, no RNG, so reruns and retried partitions fold
    identically); a point query reads the MIN over the d rows.
    Guarantees: ``est >= true`` ALWAYS (counters only over-count), and
    ``est <= true + e/w * N`` with probability ``1 - e^-d`` per query
    (N = total weight added). Merging is element-wise SUM — fully
    commutative/associative, so per-batch sketches fold under ANY
    re-batching (the KLL lesson: never ship per-sketch totals as
    repeated rows; here the matrix rows are self-describing).

    The frequency complement of the catalog's other sketches: HLL
    answers "how many distinct", Misra-Gries "which are the heaviest",
    KLL "what are the quantiles", CMS "how often does THIS key occur"
    for keys chosen AFTER the scan — heavy_hitters can only answer for
    survivors of its summary, CMS for any probe.
    """

    def __init__(self, w: int = 2048, d: int = 4):
        assert w >= 2 and 1 <= d <= 16
        self.w, self.d = w, d
        self.counts = np.zeros((d, w), np.int64)
        self.n = 0  # total added weight

    def _rows(self, h: np.ndarray) -> np.ndarray:
        """(d, len(h)) column indices via double hashing: ``h1 + i*h2``
        with h2 forced odd (nonzero stride for every key)."""
        h1 = _fmix64(h)
        h2 = _fmix64(h ^ np.uint64(0x9E3779B97F4A7C15)) | np.uint64(1)
        i = np.arange(self.d, dtype=np.uint64)[:, None]
        return ((h1[None, :] + i * h2[None, :])
                % np.uint64(self.w)).astype(np.int64)

    def add_hashes(self, h: np.ndarray, weights: np.ndarray | None = None):
        """Fold pre-hashed uint64 keys (use `util.fnv1a_u64` for string
        columns so probe and build hash identically)."""
        if not len(h):
            return self
        w = np.ones(len(h), np.int64) if weights is None \
            else weights.astype(np.int64)
        idx = self._rows(h)
        for r in range(self.d):
            np.add.at(self.counts[r], idx[r], w)
        self.n += int(w.sum())
        return self

    def query_hashes(self, h: np.ndarray) -> np.ndarray:
        """Point estimates (int64) for pre-hashed keys: min over rows."""
        if not len(h):
            return np.array([], np.int64)
        idx = self._rows(h)
        ests = np.stack([self.counts[r][idx[r]] for r in range(self.d)])
        return ests.min(axis=0)

    def merge(self, other: "CountMinSketch") -> "CountMinSketch":
        assert (self.w, self.d) == (other.w, other.d), "shape mismatch"
        self.counts += other.counts
        self.n += other.n
        return self

    def to_table(self) -> pa.Table:
        """One row per matrix row: (row, counters list) — weights are
        implied by position, so rows survive arbitrary re-batching."""
        return pa.table({
            "row": pa.array(np.arange(self.d, dtype=np.int64),
                            pa.int64()),
            "counters": pa.array(list(self.counts),
                                 pa.list_(pa.int64()))})

    @classmethod
    def from_table(cls, t: pa.Table, w: int, d: int) -> "CountMinSketch":
        """Rebuild by element-wise SUM of every (row, counters) row in
        the table — rows from several per-batch sketches may be mixed
        by Ray's re-batching; addition commutes so the fold is exact."""
        s = cls(w, d)
        rows = t.column("row").to_numpy(zero_copy_only=False)
        ctrs = t.column("counters")
        ctrs = ctrs.combine_chunks() if isinstance(
            ctrs, pa.ChunkedArray) else ctrs
        flat = ctrs.flatten().to_numpy(zero_copy_only=False) \
            .reshape(len(rows), w)
        np.add.at(s.counts, rows, flat)
        # n is recovered from row 0's counter sum (every add puts its
        # full weight in each row exactly once)
        s.n = int(flat[rows == 0].sum())
        return s


def cms_point_estimates(ds, *, column: str, probes: list[str],
                        w: int = 2048, d: int = 4,
                        tokenize: bool = False) -> pa.Table:
    """Distributed point-frequency estimation with NO shuffle: each
    batch folds its keys (or its `flat_tokens` tokens when
    ``tokenize``) into a fixed ``d x w`` Count-Min matrix and ships it
    as d rows; the driver sums matrices element-wise and answers the
    probe list. Fan-in is ``n_batches x d x w`` ints regardless of key
    cardinality — the CMS shape for unbounded vocabularies where the
    exact groupby's (batch x distinct) shuffle rows blow up. Returns
    ``(key, est, n)``: est >= true always; est <= true + e/w * n w.h.p.
    """
    from ..util import fnv1a_u64
    from .analysis import flat_tokens

    def partial(t: pa.Table) -> pa.Table:
        col = t.column(column)
        col = col.combine_chunks() if isinstance(
            col, pa.ChunkedArray) else col
        if tokenize:
            _, col, _ = flat_tokens(col)
        else:
            col = pc.cast(col.drop_null(), pa.string())
        s = CountMinSketch(w, d)
        if len(col):
            s.add_hashes(fnv1a_u64(col))
        return s.to_table()

    merged = CountMinSketch(w, d)
    for batch in ds.map_batches(partial, batch_format="pyarrow") \
                   .iter_batches(batch_size=None, batch_format="pyarrow"):
        if batch.num_rows:
            merged.merge(CountMinSketch.from_table(batch, w, d))
    parr = pa.array(probes, pa.string())
    est = merged.query_hashes(fnv1a_u64(parr))
    return pa.table({
        "key": parr,
        "est": pa.array(est, pa.int64()),
        "n": pa.array(np.full(len(probes), merged.n, np.int64),
                      pa.int64())})


class KmvSketch:
    """K-minimum-values distinct sketch with SET ALGEBRA the HLL lacks:
    keeping the k smallest distinct 64-bit hashes of a set supports
    union (merge + re-truncate) AND intersection/Jaccard estimation —
    the theta-sketch family's trick (public: Beyer et al., "On synopses
    for distinct-value estimation under multiset operations", SIGMOD
    2007). Exactness guarantee: while fewer than k distinct hashes have
    been seen the sketch IS the exact distinct set, so small sets
    estimate with zero error; past k the estimator is (k-1)/θ with
    θ = kth-smallest hash / 2^64, rse ≈ 1/√(k−2).

    All operations are vectorized (one np.unique + slice per fold);
    state is a sorted uint64 array of ≤ k values — fixed-width,
    mergeable, shippable as partial-aggregate rows."""

    def __init__(self, k: int = 1024,
                 values: np.ndarray | None = None):
        assert k >= 8
        self.k = k
        self.values = np.array([], np.uint64) if values is None \
            else values

    def add_hashed(self, h: np.ndarray) -> None:
        merged = np.unique(np.concatenate(
            [self.values, h.astype(np.uint64, copy=False)]))
        self.values = merged[:self.k]

    def add_column(self, col) -> None:
        """Fold an arrow column (nulls skipped — COUNT(DISTINCT)
        semantics; hashing matches :class:`HyperLogLog.add_column`)."""
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        valid = pc.is_valid(col)
        if not pc.any(valid).as_py():
            return
        col = col.filter(valid)
        self.add_hashed(_fmix64(fnv1a_u64(pc.cast(col, pa.string()))))

    def merge(self, other: "KmvSketch") -> "KmvSketch":
        assert other.k == self.k
        self.add_hashed(other.values)
        return self

    @property
    def saturated(self) -> bool:
        return len(self.values) >= self.k

    def estimate(self) -> float:
        """Distinct-count estimate; EXACT while unsaturated."""
        if not self.saturated:
            return float(len(self.values))
        theta = (float(self.values[self.k - 1]) + 1.0) / 2.0 ** 64
        return (self.k - 1) / theta

    def intersect_estimate(self, other: "KmvSketch") -> float:
        """|A ∩ B| estimate: over the union sketch's k smallest hashes,
        the fraction present in BOTH scales the union estimate. Exact
        when both sides are unsaturated (the sketches are the true
        hash sets and the union stays below k... or k'=|union| acts as
        the full support)."""
        assert other.k == self.k
        u = np.unique(np.concatenate([self.values, other.values]))
        u = u[:self.k]
        in_both = np.isin(u, self.values) & np.isin(u, other.values)
        union = KmvSketch(self.k, u)
        if not self.saturated and not other.saturated:
            return float(in_both.sum())  # exact: u is the true union
        return float(in_both.sum()) / len(u) * union.estimate()


def kmv_type_overlap(ds, *, type_a: str, type_b: str,
                     key_col: str = "user_id",
                     type_col: str = "event_type",
                     k: int = 1024) -> pa.Table:
    """Distinct-key overlap between two event types via mergeable KMV
    partials: |keys(A)|, |keys(B)|, and |keys(A) ∩ keys(B)| estimates —
    the audience-overlap question COUNT(DISTINCT) cannot answer from
    two separate scans. One streaming pass: each batch folds its keys
    into per-type k-minimum partials (fixed-width uint64 rows — the
    shuffle payload is sketches, never keys), the driver merges per
    type. EXACT below k distinct keys per side (asserted in tests);
    ≈1/√(k−2) rse past it."""

    def partial(t: pa.Table) -> pa.Table:
        out_type, out_vals = [], []
        for name in (type_a, type_b):
            sub = t.filter(pc.equal(t.column(type_col), name))
            sk = KmvSketch(k)
            if sub.num_rows:
                sk.add_column(sub.column(key_col))
            out_type.append(name)
            out_vals.append(sk.values.tobytes())
        return pa.table({"t": pa.array(out_type, pa.string()),
                         "vals": pa.array(out_vals, pa.binary())})

    sketches = {type_a: KmvSketch(k), type_b: KmvSketch(k)}
    for b in ds.map_batches(partial, batch_format="pyarrow") \
            .iter_batches(batch_size=None, batch_format="pyarrow"):
        for name, blob in zip(b.column("t").to_pylist(),
                              b.column("vals").to_pylist()):
            sketches[name].add_hashed(np.frombuffer(blob, np.uint64))
    a, bb = sketches[type_a], sketches[type_b]
    return pa.table({
        "type_a": pa.array([type_a], pa.string()),
        "type_b": pa.array([type_b], pa.string()),
        "est_a": pa.array([a.estimate()], pa.float64()),
        "est_b": pa.array([bb.estimate()], pa.float64()),
        "est_intersection": pa.array([a.intersect_estimate(bb)],
                                     pa.float64()),
        "exact": pa.array([not (a.saturated or bb.saturated)],
                          pa.bool_())})
