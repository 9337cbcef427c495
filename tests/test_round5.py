"""Round-5 operators: stratified_sample, snapshot_diff,
funnel_first_conversion, and the CDF-derived winsorize / anomaly
queries' kernels. Each new operator gets value assertions beyond the
DuckDB gate (edge cases the sf tables don't exercise: null values,
duplicate keys, window boundaries, partition invariance)."""
import numpy as np
import pyarrow as pa
import pytest


# ------------------------------------------------- stratified_sample

class TestStratifiedSample:
    def _tbl(self, n=2000, seed=3):
        rng = np.random.RandomState(seed)
        return pa.table({
            "doc_id": pa.array(np.arange(n), pa.int64()),
            "source": pa.array(
                rng.choice(["web", "books", "code"], n).tolist())})

    def test_rates_and_determinism(self):
        from raybeats.textops.curation import stratified_sample
        t = self._tbl()
        rates = {"web": 10, "books": 100, "code": 0}
        out = stratified_sample(t, group_col="source", id_col="doc_id",
                                rates_pct=rates)
        src = out.column("source").to_pylist()
        n_books_in = t.filter(
            pa.compute.equal(t.column("source"), "books")).num_rows
        assert src.count("books") == n_books_in        # rate 100: all
        assert src.count("code") == 0                   # rate 0: none
        n_web_in = t.filter(
            pa.compute.equal(t.column("source"), "web")).num_rows
        # hash rate ~10% with slack
        assert 0.03 * n_web_in < src.count("web") < 0.2 * n_web_in
        # rerun → identical rows (no RNG state)
        again = stratified_sample(t, group_col="source",
                                  id_col="doc_id", rates_pct=rates)
        assert again.equals(out)

    def test_partition_invariance(self):
        """The keep set must not depend on how rows are batched — the
        resumability property retried partitions rely on."""
        from raybeats.textops.curation import stratified_sample
        t = self._tbl()
        rates = {"web": 37, "books": 64, "code": 5}
        whole = stratified_sample(t, group_col="source",
                                  id_col="doc_id", rates_pct=rates)
        parts = [stratified_sample(t.slice(i, 400), group_col="source",
                                   id_col="doc_id", rates_pct=rates)
                 for i in range(0, 2000, 400)]
        stitched = pa.concat_tables(parts)
        assert stitched.equals(whole)

    def test_unknown_group_gets_default(self):
        from raybeats.textops.curation import stratified_sample
        t = pa.table({"doc_id": pa.array([1, 2, 3], pa.int64()),
                      "source": pa.array(["x", "x", "x"])})
        none = stratified_sample(t, group_col="source", id_col="doc_id",
                                 rates_pct={"web": 50})
        assert none.num_rows == 0          # default_pct=0 drops unknowns
        everything = stratified_sample(t, group_col="source",
                                       id_col="doc_id",
                                       rates_pct={"web": 50},
                                       default_pct=100)
        assert everything.num_rows == 3

    def test_rate_validation(self):
        from raybeats.textops.curation import stratified_sample
        t = self._tbl(10)
        with pytest.raises(ValueError, match="rates"):
            stratified_sample(t, group_col="source", id_col="doc_id",
                              rates_pct={"web": 101})
        with pytest.raises(ValueError, match="rates"):
            stratified_sample(t, group_col="source", id_col="doc_id",
                              rates_pct={"web": 10}, default_pct=-1)
        # a group literally named '' must not mask default_pct's check
        with pytest.raises(ValueError, match="rates"):
            stratified_sample(t, group_col="source", id_col="doc_id",
                              rates_pct={"": 150})
        # fractional rates would silently truncate — reject them
        with pytest.raises(ValueError, match="rates"):
            stratified_sample(t, group_col="source", id_col="doc_id",
                              rates_pct={"web": 10.5})

    def test_null_ids_dropped(self):
        """SQL mirror: NULL id → NULL hash → row dropped; a NaN→uint64
        cast would otherwise make the keep decision platform-defined."""
        from raybeats.textops.curation import stratified_sample
        t = pa.table({"doc_id": pa.array([1, None, None], pa.int64()),
                      "source": pa.array(["web"] * 3)})
        out = stratified_sample(t, group_col="source", id_col="doc_id",
                                rates_pct={"web": 100})
        assert out.column("doc_id").to_pylist() == [1]


# ---------------------------------------------------- snapshot_diff

class TestSnapshotDiff:
    def _diff(self, old_rows, new_rows, **kw):
        import ray.data as rd
        from raybeats.joins import snapshot_diff
        old = rd.from_arrow(pa.table({
            "k": pa.array([r[0] for r in old_rows], pa.int64()),
            "v": pa.array([r[1] for r in old_rows], pa.int64())}))
        new = rd.from_arrow(pa.table({
            "k": pa.array([r[0] for r in new_rows], pa.int64()),
            "v": pa.array([r[1] for r in new_rows], pa.int64())}))
        out = snapshot_diff(old, new, on="k", compare="v",
                            n_buckets=kw.pop("n_buckets", 3), **kw)
        t = pa.concat_tables(
            out.iter_batches(batch_format="pyarrow"),
            promote_options="default")
        return {r["key"]: (r["status"], r["old_val"], r["new_val"])
                for r in t.to_pylist()}

    def test_all_four_statuses(self, ray_session):
        got = self._diff(
            old_rows=[(1, 10), (2, 20), (3, 30)],
            new_rows=[(2, 20), (3, 99), (4, 40)])
        assert got == {1: ("removed", 10, None),
                       2: ("same", 20, 20),
                       3: ("changed", 30, 99),
                       4: ("added", None, 40)}

    def test_null_value_is_never_same(self, ray_session):
        """SQL `=` semantics: null on either side of a both-sides key
        falls through to 'changed' (never 'same')."""
        got = self._diff(old_rows=[(1, None), (2, None), (3, 5)],
                         new_rows=[(1, None), (2, 7), (3, None)])
        assert {k: s for k, (s, _, _) in got.items()} == {
            1: "changed", 2: "changed", 3: "changed"}

    def test_duplicate_key_raises(self, ray_session):
        with pytest.raises(Exception, match="duplicate keys"):
            self._diff(old_rows=[(1, 1), (1, 2)], new_rows=[(2, 2)],
                       n_buckets=1)

    def test_null_key_raises(self, ray_session):
        import ray.data as rd
        from raybeats.joins import snapshot_diff
        old = rd.from_arrow(pa.table({
            "k": pa.array([1, None], pa.int64()),
            "v": pa.array([1, 2], pa.int64())}))
        new = rd.from_arrow(pa.table({
            "k": pa.array([1], pa.int64()),
            "v": pa.array([1], pa.int64())}))
        ds = snapshot_diff(old, new, on="k", compare="v", n_buckets=1)
        with pytest.raises(Exception, match="null key"):
            ds.materialize()


# ------------------------------------------- funnel_first_conversion

def _funnel(rows, within_us, n_buckets=2, blocks=None):
    import ray.data as rd
    from raybeats.aggregates import funnel_first_conversion
    t = pa.table({
        "user_id": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array([r[1] for r in rows], pa.int64())
        .cast(pa.timestamp("us")),
        "event_type": pa.array([r[2] for r in rows])})
    ds = rd.from_arrow(t)
    if blocks:
        ds = ds.repartition(blocks)
    out = funnel_first_conversion(ds, first_type="A", then_type="B",
                                  within_us=within_us,
                                  n_buckets=n_buckets)
    got = pa.concat_tables(out.iter_batches(batch_format="pyarrow"),
                           promote_options="default")
    users = got.column("user_id").to_pylist()
    f = pa.compute.cast(got.column("first_ts"), pa.int64()).to_pylist()
    c = pa.compute.cast(got.column("conv_ts"), pa.int64()).to_pylist()
    return dict(zip(users, zip(f, c)))


class TestFunnelFirstConversion:
    def test_strictly_after_and_window_bounds(self, ray_session):
        rows = [
            # u1: B at exactly t0 is NOT after; next B at t0+5 converts
            (1, 100, "A"), (1, 100, "B"), (1, 105, "B"),
            # u2: B exactly at t0+within (inclusive bound) converts
            (2, 200, "A"), (2, 210, "B"),
            # u3: B only past the window → no conversion
            (3, 300, "A"), (3, 311, "B"),
            # u4: B before A only → no conversion
            (4, 400, "B"), (4, 405, "A"),
            # u5: two As — the FIRST defines t0; first B after it wins
            (5, 500, "A"), (5, 502, "A"), (5, 501, "B"), (5, 503, "B"),
        ]
        got = _funnel(rows, within_us=10)
        assert got == {1: (100, 105), 2: (200, 210), 5: (500, 501)}

    def test_partition_and_bucket_invariance(self, ray_session):
        rng = np.random.RandomState(5)
        rows = [(int(rng.randint(0, 30)), int(rng.randint(0, 1000)),
                 str(rng.choice(["A", "B", "C"])))
                for _ in range(600)]
        base = _funnel(rows, within_us=50, n_buckets=1)
        assert base  # non-vacuous
        for nb, blocks in ((7, 5), (3, 11)):
            assert _funnel(rows, within_us=50, n_buckets=nb,
                           blocks=blocks) == base

    def test_naive_reference_parity(self, ray_session):
        rng = np.random.RandomState(9)
        rows = [(int(rng.randint(0, 20)), int(rng.randint(0, 500)),
                 str(rng.choice(["A", "B"])))
                for _ in range(400)]
        within = 40
        expect = {}
        for u in {r[0] for r in rows}:
            a_ts = [t for (uu, t, k) in rows if uu == u and k == "A"]
            b_ts = sorted(t for (uu, t, k) in rows
                          if uu == u and k == "B")
            if not a_ts:
                continue
            t0 = min(a_ts)
            conv = [t for t in b_ts if t0 < t <= t0 + within]
            if conv:
                expect[u] = (t0, conv[0])
        assert _funnel(rows, within_us=within, n_buckets=4) == expect

    def test_validation(self, ray_session):
        from raybeats.aggregates import funnel_first_conversion
        with pytest.raises(ValueError, match="within_us"):
            funnel_first_conversion(None, first_type="A", then_type="B",
                                    within_us=0, n_buckets=1)


# ---------------------------------------------------- global_row_number

class TestGlobalRowNumber:
    def _run(self, values, ids, n_id_buckets=None, scale=100):
        import ray.data as rd
        from raybeats.aggregates import global_row_number
        t = pa.table({"id": pa.array(ids, pa.int64()),
                      "v": pa.array(values, pa.float64())})
        out = global_row_number(rd.from_arrow(t).repartition(4),
                                value_col="v", id_col="id",
                                id_max=max(ids), scale=scale,
                                n_id_buckets=n_id_buckets)
        got = pa.concat_tables(out.iter_batches(batch_format="pyarrow"),
                               promote_options="default")
        return {r["id"]: (r["value_cents"], r["rnk"])
                for r in got.to_pylist()}

    def test_parity_with_argsort(self, ray_session):
        rng = np.random.RandomState(7)
        n = 500
        ids = rng.permutation(n * 2)[:n].tolist()
        vals = np.round(rng.uniform(0, 20, n), 2)
        vals[::37] = np.nan                    # NaNs excluded
        got = self._run(vals.tolist(), ids)
        ok = ~np.isnan(vals)
        q = np.floor(vals[ok] * 100).astype(np.int64)
        iid = np.array(ids)[ok]
        order = np.lexsort((iid, q))
        expect = {int(iid[j]): (int(q[j]), r + 1)
                  for r, j in enumerate(order)}
        assert got == expect

    def test_bucket_invariance_and_all_ties(self, ray_session):
        """The all-ties worst case (every row one value) must still
        rank purely by id, at any id-bucket count."""
        ids = list(range(100))
        vals = [7.0] * 100
        base = self._run(vals, ids, n_id_buckets=1)
        assert base == {i: (700, i + 1) for i in ids}
        assert self._run(vals, ids, n_id_buckets=13) == base

    def test_negative_values(self, ray_session):
        """Negative quanta (floor of negative values) must sort before
        positives in the offset fold."""
        vals = [-3.17, 2.0, -0.01, 0.0, -3.17, 5.5]
        ids = [10, 20, 30, 40, 50, 60]
        got = self._run(vals, ids)
        q = np.floor(np.array(vals) * 100).astype(np.int64)
        order = np.lexsort((np.array(ids), q))
        expect = {ids[j]: (int(q[j]), r + 1)
                  for r, j in enumerate(order)}
        assert got == expect


# -------------------------------------------------------- daily_change

class TestDailyChange:
    def test_gap_days_and_null_ts(self, ray_session, tmp_path):
        import pyarrow.parquet as pq
        import duckdb
        from raybeats.queries import QUERIES
        day = 86_400_000_000
        rows = []
        # type A: days 0, 1, 3 (gap at 2 — LAG crosses the gap)
        for d, k in [(0, 3), (1, 1), (3, 5)]:
            rows += [(d * day + i, "A") for i in range(k)]
        rows += [(0, "B"), (None, "B"), (None, "A")]  # null ts dropped
        t = pa.table({
            "event_id": pa.array(range(len(rows)), pa.int64()),
            "ts": pa.array([r[0] for r in rows], pa.int64())
            .cast(pa.timestamp("us")),
            "user_id": pa.array([0] * len(rows), pa.int64()),
            "event_type": pa.array([r[1] for r in rows]),
            "value": pa.array([1.0] * len(rows), pa.float64()),
            "props": pa.array(["{}"] * len(rows))})
        pq.write_table(t, tmp_path / "events.parquet")
        out = QUERIES["daily_change"][0](str(tmp_path))
        got = pa.concat_tables(out.iter_batches(batch_format="pyarrow"),
                               promote_options="default")
        con = duckdb.connect()
        con.execute(f"CREATE VIEW events AS SELECT * FROM "
                    f"'{tmp_path}/events.parquet'")
        want = con.execute(QUERIES["daily_change"][1]).arrow()
        key = lambda tb: sorted(map(tuple, zip(
            *[tb.column(c).to_pylist()
              for c in sorted(tb.column_names)])))
        assert key(got) == key(want)
        # the gap: day-3 delta is vs day 1 (5-1=4), not vs absent day 2
        a = {r["day"].day: r["delta"] for r in got.to_pylist()
             if r["event_type"] == "A"}
        assert a[4] == 4 and a[1] is None   # Jan 4 = day index 3


# ---------------------------------------------------- weekly_retention

class TestWeeklyRetention:
    def test_dedup_and_skipped_weeks(self, ray_session, tmp_path):
        import pyarrow.parquet as pq
        from raybeats.queries import QUERIES
        week = 7 * 86_400_000_000
        # u0 active weeks 0,1,2 (retained at w0 and w1);
        # u1 active weeks 0,2 (gap — NOT retained at w0);
        # u2 active week 1 twice across batches (dedup; no next week)
        rows = [(0, 0), (0, 1), (0, 2), (1, 0), (1, 2), (2, 1), (2, 1)]
        t = pa.table({
            "event_id": pa.array(range(len(rows)), pa.int64()),
            "ts": pa.array([w * week + u for u, w in rows], pa.int64())
            .cast(pa.timestamp("us")),
            "user_id": pa.array([r[0] for r in rows], pa.int64()),
            "event_type": pa.array(["view"] * len(rows)),
            "value": pa.array([1.0] * len(rows), pa.float64()),
            "props": pa.array(["{}"] * len(rows))})
        pq.write_table(t, tmp_path / "events.parquet")
        out = QUERIES["weekly_retention"][0](str(tmp_path))
        got = pa.concat_tables(out.iter_batches(batch_format="pyarrow"),
                               promote_options="default")
        week_us = pa.compute.cast(got.column("week"),
                                  pa.int64()).to_pylist()
        counts = dict(zip(week_us, got.column("n_retained").to_pylist()))
        # epoch 1970-01-01 is a Thursday: the Monday week floor of
        # ts=0 is Dec 29 1969, i.e. -3 days
        floor0 = -3 * 86_400_000_000
        assert counts == {floor0: 1, floor0 + week: 1}


# ------------------------------------------------- range bucket overflow

class TestRangeBucketOverflow:
    def test_snowflake_scale_ids_stay_monotone(self):
        """id * n_buckets // span silently wraps int64 for id_max >=
        ~2^43 at a 2^20 bucket count; the step-division form must not."""
        from raybeats.util import range_bucket, range_bucket_step
        span = 1 << 62
        n = 1 << 20
        ids = pa.array([0, 1 << 44, 1 << 55, span - 1], pa.int64())
        b = range_bucket(ids, n, span).to_pylist()
        assert b == sorted(b) and 0 <= b[0] and b[-1] == n - 1
        # the multiply form wraps negative here — the bug this guards
        step = range_bucket_step(span, n)
        assert (span - 1) // step == n - 1

    def test_global_row_number_sparse_huge_ids(self, ray_session):
        """End-to-end with ids near 2^55: ranks must follow id order."""
        import ray.data as rd
        from raybeats.aggregates import global_row_number
        ids = [(1 << 55) + i * (1 << 33) for i in range(50)]
        t = pa.table({"id": pa.array(ids, pa.int64()),
                      "v": pa.array([1.0] * 50, pa.float64())})
        out = global_row_number(rd.from_arrow(t).repartition(3),
                                value_col="v", id_col="id",
                                id_max=max(ids), scale=1)
        got = pa.concat_tables(out.iter_batches(batch_format="pyarrow"),
                               promote_options="default")
        by_id = dict(zip(got.column("id").to_pylist(),
                         got.column("rnk").to_pylist()))
        assert by_id == {i: r + 1 for r, i in enumerate(sorted(ids))}


# ------------------------------------------------ randomized parity

class TestRandomizedParity:
    def test_snapshot_diff_random(self, ray_session):
        """Random unique-key snapshots vs a dict reference, across
        bucket counts."""
        import ray.data as rd
        from raybeats.joins import snapshot_diff
        rng = np.random.RandomState(17)
        for trial in range(3):
            ok = rng.permutation(300)[:150]
            nk = rng.permutation(300)[:150]
            ov = rng.randint(0, 4, 150)
            nv = rng.randint(0, 4, 150)
            old_d = dict(zip(ok.tolist(), ov.tolist()))
            new_d = dict(zip(nk.tolist(), nv.tolist()))
            expect = {}
            for k in set(old_d) | set(new_d):
                if k not in new_d:
                    expect[k] = "removed"
                elif k not in old_d:
                    expect[k] = "added"
                else:
                    expect[k] = "same" if old_d[k] == new_d[k] \
                        else "changed"
            old = rd.from_arrow(pa.table({
                "k": pa.array(ok, pa.int64()),
                "v": pa.array(ov, pa.int64())})).repartition(4)
            new = rd.from_arrow(pa.table({
                "k": pa.array(nk, pa.int64()),
                "v": pa.array(nv, pa.int64())})).repartition(3)
            out = snapshot_diff(old, new, on="k", compare="v",
                                n_buckets=2 + trial * 5)
            got = {r["key"]: r["status"] for t in
                   out.iter_batches(batch_format="pyarrow")
                   for r in t.to_pylist()}
            assert got == expect

    def test_users_per_type_random_partitions(self, ray_session,
                                              tmp_path):
        """Exact distinct counts survive duplicate-heavy data and any
        file split."""
        import duckdb
        import pyarrow.parquet as pq
        from raybeats.queries import QUERIES
        rng = np.random.RandomState(23)
        n = 5000
        t = pa.table({
            "event_id": pa.array(range(n), pa.int64()),
            "ts": pa.array([0] * n, pa.int64())
            .cast(pa.timestamp("us")),
            "user_id": pa.array(rng.randint(0, 40, n), pa.int64()),
            "event_type": pa.array(
                rng.choice(["a", "b", "c"], n).tolist()),
            "value": pa.array([0.0] * n, pa.float64()),
            "props": pa.array(["{}"] * n)})
        pq.write_table(t, tmp_path / "events.parquet")
        out = QUERIES["users_per_type"][0](str(tmp_path))
        got = {r["event_type"]: r["n_users"] for r in out.to_pylist()}
        con = duckdb.connect()
        con.execute(f"CREATE VIEW events AS SELECT * FROM "
                    f"'{tmp_path}/events.parquet'")
        want = dict(con.execute(
            "SELECT event_type, COUNT(DISTINCT user_id) FROM events "
            "GROUP BY 1").fetchall())
        assert got == want


def test_read_dim_block_sizing(monkeypatch):
    """_read_dim grows blocks with the footer count: tiny dimensions
    get a handful of blocks (not cpus*2 tiny tasks), fact-sized
    inputs still parallelize. Exercises the REAL function by capturing
    the blocks kwarg it passes to _read."""
    import raybeats.queries as q
    seen = {}

    def fake_read(sf_dir, table, columns=None, blocks=None):
        seen[table] = blocks
        return "ds"

    for n, want in ((1_000, 2), (15_000, 2), (150_000, 5),
                    (10_000_000, 16)):
        monkeypatch.setattr(q, "_nrows", lambda s, t, n=n: n)
        monkeypatch.setattr(q, "_read", fake_read)
        assert q._read_dim("/x", "tbl") == "ds"
        assert seen["tbl"] == want


def test_snapshot_diff_string_keys_and_values(ray_session):
    """The kernel is arrow-generic: string keys and values classify
    through the same index_in/equal path."""
    import ray.data as rd
    from raybeats.joins import snapshot_diff
    old = rd.from_arrow(pa.table({
        "k": pa.array(["a", "b", "c"]),
        "v": pa.array(["x", "y", "z"])}))
    new = rd.from_arrow(pa.table({
        "k": pa.array(["b", "c", "d"]),
        "v": pa.array(["y", "Q", "w"])}))
    out = snapshot_diff(old, new, on="k", compare="v", n_buckets=2)
    got = {r["key"]: r["status"] for t in
           out.iter_batches(batch_format="pyarrow")
           for r in t.to_pylist()}
    assert got == {"a": "removed", "b": "same", "c": "changed",
                   "d": "added"}


class TestChunkText:
    def test_windows_cover_and_overlap(self):
        from raybeats.textops.curation import chunk_text
        text = "abcdefghij" * 5            # 50 chars
        t = pa.table({"doc_id": pa.array([1], pa.int64()),
                      "text": pa.array([text])})
        out = chunk_text(t, size=20, stride=15)
        chunks = out.column("chunk_text").to_pylist()
        assert chunks[0] == text[0:20]
        assert chunks[1] == text[15:35]
        assert chunks[2] == text[30:50]
        assert chunks[3] == text[45:50]    # short tail
        assert out.column("chunk_idx").to_pylist() == [0, 1, 2, 3]
        # reconstruction: stitching strides recovers the original
        assert "".join(c[:15] for c in chunks)[:50] == text

    def test_null_empty_and_validation(self):
        from raybeats.textops.curation import chunk_text
        t = pa.table({"doc_id": pa.array([1, 2, 3], pa.int64()),
                      "text": pa.array(["", None, "xy"])})
        out = chunk_text(t, size=5, stride=3)
        assert out.column("doc_id").to_pylist() == [3]
        assert out.column("chunk_text").to_pylist() == ["xy"]
        import pytest as _pt
        with _pt.raises(ValueError, match="stride"):
            chunk_text(t, size=5, stride=6)

    def test_codepoint_slicing_non_ascii(self):
        """Slicing counts CODEPOINTS (SQL substr character semantics),
        not bytes — a multi-byte char must not shift the windows."""
        from raybeats.textops.curation import chunk_text
        text = "é" * 7                      # 7 codepoints, 14 bytes
        t = pa.table({"doc_id": pa.array([1], pa.int64()),
                      "text": pa.array([text])})
        out = chunk_text(t, size=4, stride=3)
        assert out.column("chunk_text").to_pylist() == [
            "é" * 4, "é" * 4, "é"]

    def test_string_id_and_all_empty_batch_schema(self):
        """All-empty batches must emit the id column's REAL type —
        an int64 hardcode would break Ray block-schema unification for
        string ids."""
        from raybeats.textops.curation import chunk_text
        t = pa.table({"doc_id": pa.array(["a", "b"]),
                      "text": pa.array([None, ""])})
        out = chunk_text(t, size=5, stride=3, id_col="doc_id")
        assert out.num_rows == 0
        assert out.schema.field("doc_id").type == pa.string()

    def test_random_property_sweep(self):
        """Randomized invariants: chunk k equals text[k*stride :
        k*stride+size] (codepoints), every codepoint is covered, and
        chunk counts match ceil(len/stride)."""
        from raybeats.textops.curation import chunk_text
        rng = np.random.RandomState(31)
        alphabet = list("abΩ語 x")
        for trial in range(20):
            size = int(rng.randint(2, 12))
            stride = int(rng.randint(1, size + 1))
            texts = ["".join(rng.choice(alphabet,
                                        rng.randint(0, 40)).tolist())
                     for _ in range(10)]
            t = pa.table({"doc_id": pa.array(range(10), pa.int64()),
                          "text": pa.array(texts)})
            out = chunk_text(t, size=size, stride=stride)
            got: dict = {}
            for r in out.to_pylist():
                got.setdefault(r["doc_id"], {})[r["chunk_idx"]] = \
                    r["chunk_text"]
            for i, txt in enumerate(texts):
                n = 0 if not txt else (len(txt) - 1) // stride + 1
                chunks = got.get(i, {})
                assert len(chunks) == n
                for k in range(n):
                    assert chunks[k] == txt[k * stride:
                                            k * stride + size]


def test_cooccurrence_pairs_and_string_order(ray_session, tmp_path):
    """Hand-checkable basket: pair explode yields C(m,2) per user and
    pair order is LEXICOGRAPHIC (SQL a < b on strings), not
    dictionary-code first-seen order."""
    import pyarrow.parquet as pq
    from raybeats.queries import QUERIES
    # user 1: zeta, alpha, mid (seen in non-lexicographic order);
    # user 2: zeta, alpha; user 3: alpha only (no pairs)
    rows = [(1, "zeta"), (1, "alpha"), (1, "mid"), (1, "zeta"),
            (2, "zeta"), (2, "alpha"), (3, "alpha")]
    n = len(rows)
    t = pa.table({
        "event_id": pa.array(range(n), pa.int64()),
        "ts": pa.array([0] * n, pa.int64()).cast(pa.timestamp("us")),
        "user_id": pa.array([r[0] for r in rows], pa.int64()),
        "event_type": pa.array([r[1] for r in rows]),
        "value": pa.array([0.0] * n, pa.float64()),
        "props": pa.array(["{}"] * n)})
    pq.write_table(t, tmp_path / "events.parquet")
    out = QUERIES["cooccurrence"][0](str(tmp_path))
    got = {(r["type_a"], r["type_b"]): r["n_users"]
           for r in out.to_pylist()}
    assert got == {("alpha", "mid"): 1, ("alpha", "zeta"): 2,
                   ("mid", "zeta"): 1}
