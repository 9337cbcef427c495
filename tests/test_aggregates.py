"""grouped_exact_quantiles: naive parity, partition invariance."""
import numpy as np
import pyarrow as pa
import pytest

from raybeats.aggregates import grouped_exact_quantiles


def _naive(vals: np.ndarray, q: float, scale: int = 100) -> int:
    quanta = np.sort(np.floor(vals * scale).astype(np.int64))
    target = int(np.ceil(q * len(quanta)))
    return int(quanta[target - 1])  # smallest with cum >= ceil(q*n)


def _table(n=5000, seed=7):
    rng = np.random.default_rng(seed)
    return pa.table({
        "event_type": pa.array(
            [["click", "view", "purchase"][i % 3] for i in range(n)],
            pa.string()),
        "value": pa.array(rng.uniform(0, 200, n), pa.float64())})


class TestGroupedExactQuantiles:
    def test_matches_naive_per_key(self, ray_session):
        import ray.data as rd
        t = _table()
        out = grouped_exact_quantiles(
            rd.from_arrow(t).repartition(6)).to_pandas() \
            .set_index("event_type")
        vals = t.column("value").to_numpy()
        keys = np.array(t.column("event_type").to_pylist())
        for k in ("click", "view", "purchase"):
            kv = vals[keys == k]
            assert out.loc[k, "n"] == len(kv)
            for q, col in ((0.5, "p50_cents"), (0.95, "p95_cents"),
                           (0.99, "p99_cents")):
                assert out.loc[k, col] == _naive(kv, q), (k, q)

    def test_partition_invariant_with_heavy_duplicates(self, ray_session):
        import ray.data as rd
        # many identical quantized values — the reduceat duplicate-merge
        # path across batches must not double-pick
        t = pa.table({
            "event_type": pa.array(["a"] * 1000, pa.string()),
            "value": pa.array(([1.23] * 990) + [50.0] * 10, pa.float64())})
        a = grouped_exact_quantiles(rd.from_arrow(t)).to_pandas()
        b = grouped_exact_quantiles(
            rd.from_arrow(t).repartition(13)).to_pandas()
        assert a.equals(b)
        assert a.loc[0, "p50_cents"] == 123
        assert a.loc[0, "p99_cents"] == 123  # 990/1000 >= 0.99
        assert a.loc[0, "n"] == 1000

    def test_validation(self):
        import ray.data as rd
        ds = rd.from_arrow(_table(30))
        with pytest.raises(ValueError, match="qs"):
            grouped_exact_quantiles(ds, qs=(0.0, 0.5))
        with pytest.raises(ValueError, match="qs"):
            grouped_exact_quantiles(ds, qs=())


class TestInvertedIndex:
    def test_df_tf_exact_across_partitions(self, ray_session):
        import ray.data as rd
        from raybeats.queries import QUERIES
        import duckdb
        import os, tempfile
        # df counts documents, tf counts occurrences — and both must be
        # partition-invariant because a doc's row is atomic in a batch
        t = pa.table({
            "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
            "text": pa.array(["cat cat dog", "dog", "CAT!", "fish"],
                             pa.string())})
        with tempfile.TemporaryDirectory() as d:
            import pyarrow.parquet as pq_
            pq_.write_table(t, os.path.join(d, "documents.parquet"))
            out = QUERIES["inverted_index"][0](d).to_pandas() \
                .set_index("token")
        assert out.loc["cat", "df"] == 2 and out.loc["cat", "tf"] == 3
        assert out.loc["dog", "df"] == 2 and out.loc["dog", "tf"] == 2
        assert out.loc["fish", "df"] == 1 and out.loc["fish", "tf"] == 1


def test_quantiles_ignore_nan_and_null(ray_session):
    import ray.data as rd
    # nulls/NaN ignored like SQL aggregates — not folded into garbage
    # INT64_MIN quanta (review finding)
    t = pa.table({
        "event_type": pa.array(["a"] * 6, pa.string()),
        "value": pa.array([1.0, 2.0, 3.0, None, float("nan"), 4.0],
                          pa.float64())})
    out = grouped_exact_quantiles(rd.from_arrow(t)).to_pandas()
    assert out.loc[0, "n"] == 4
    assert out.loc[0, "p50_cents"] == 200
    assert out.loc[0, "p99_cents"] == 400


# ------------------------------------------------------------ keep_latest

class TestKeepLatest:
    def _naive(self, df):
        import pandas as pd
        return (df.sort_values(["ts", "event_id"])
                  .groupby("k", dropna=False).tail(1))

    def test_matches_pandas_and_partition_invariant(self, ray_session):
        import ray.data as rd
        from raybeats.aggregates import keep_latest
        rng = np.random.default_rng(11)
        n = 3000
        t = pa.table({
            "k": pa.array(rng.integers(0, 80, n), pa.int64()),
            "ts": pa.array(rng.integers(0, 500, n), pa.int64()),
            "event_id": pa.array(rng.permutation(n), pa.int64()),
            "payload": pa.array([f"p{i}" for i in range(n)], pa.string())})
        want = self._naive(t.to_pandas())
        want = sorted(zip(want["k"], want["event_id"], want["payload"]))
        for parts in (1, 7):
            got = keep_latest(rd.from_arrow(t).repartition(parts),
                              key="k", order_by=("ts", "event_id"),
                              n_buckets=5).to_pandas()
            rows = sorted(zip(got["k"], got["event_id"], got["payload"]))
            assert rows == want

    def test_string_keys_null_key_group_and_null_order(self, ray_session):
        import ray.data as rd
        from raybeats.aggregates import keep_latest
        # null keys form ONE group (SQL PARTITION BY semantics); null
        # order values sort oldest
        t = pa.table({
            "k": pa.array(["a", "a", None, None, "b"], pa.string()),
            "ts": pa.array([5, 9, 2, None, 1], pa.int64()),
            "event_id": pa.array([1, 2, 3, 4, 5], pa.int64())})
        got = keep_latest(rd.from_arrow(t).repartition(2), key="k",
                          order_by=("ts", "event_id"),
                          n_buckets=2).to_pandas()
        picked = {(None if k is None or (isinstance(k, float)) else k): e
                  for k, e in zip(got["k"].where(got["k"].notna(), None),
                                  got["event_id"])}
        assert picked == {"a": 2, None: 3, "b": 5}

    def test_timestamp_order_column(self, ray_session):
        import ray.data as rd
        from raybeats.aggregates import keep_latest
        t = pa.table({
            "k": pa.array([1, 1, 2], pa.int64()),
            "ts": pa.array([1_000_000, 2_000_000, 500],
                           pa.timestamp("us")),
            "event_id": pa.array([10, 20, 30], pa.int64())})
        got = keep_latest(rd.from_arrow(t), key="k",
                          order_by=("ts", "event_id"),
                          n_buckets=2).to_pandas()
        assert sorted(zip(got["k"], got["event_id"])) == [(1, 20), (2, 30)]


# ---------------------------------------------------------------- rollup

class TestRollup:
    def _fixture(self, n=2000, seed=3):
        rng = np.random.default_rng(seed)
        return pa.table({
            "a": pa.array(rng.choice(["x", "y", "z"], n), pa.string()),
            "b": pa.array(rng.choice(["p", "q"], n), pa.string()),
            "cents": pa.array(rng.integers(-500, 500, n), pa.int64())})

    def _duck(self, t):
        import duckdb
        con = duckdb.connect()
        con.register("t", t)
        return con.execute(
            """SELECT a, b, CAST(GROUPING(a, b) AS BIGINT) AS lvl,
                 CAST(SUM(cents) AS BIGINT) AS s, COUNT(*) AS n
               FROM t GROUP BY ROLLUP (a, b)""").arrow()

    @staticmethod
    def _rows(tbl, s_col="s"):
        rows = zip(tbl.column("a").to_pylist(),
                   tbl.column("b").to_pylist(),
                   tbl.column("lvl").to_pylist(),
                   tbl.column(s_col).to_pylist(),
                   tbl.column("n").to_pylist())
        return sorted(rows, key=lambda r: (r[2], r[0] or "", r[1] or ""))

    def test_distributed_groupby_path_matches_duckdb(self, ray_session):
        # the gate only exercises the bounded driver fast path; this
        # drives the Ray groupby combine the 100-TB input would take
        import ray.data as rd
        from ray.data.aggregate import Sum
        from raybeats.aggregates import (rollup_cents_partial,
                                         rollup_null_levels)
        t = self._fixture()
        partial = rollup_cents_partial(["a", "b"], "cents")
        small = rd.from_arrow(t).repartition(5) \
            .map_batches(partial, batch_format="pyarrow")
        agg = small.groupby(["a", "b", "lvl"]).aggregate(
            Sum("__sum", alias_name="s"), Sum("__n", alias_name="n"))
        got = pa.concat_tables(list(agg.map_batches(
            lambda x: rollup_null_levels(x, ["a", "b"]),
            batch_format="pyarrow").iter_batches(batch_format="pyarrow")))
        assert self._rows(got) == self._rows(self._duck(t))

    def test_partial_bitmask_and_placeholders(self):
        from raybeats.aggregates import rollup_cents_partial
        t = pa.table({"a": pa.array(["x", "y"]),
                      "b": pa.array(["p", "p"]),
                      "cents": pa.array([10, -4], pa.int64())})
        out = rollup_cents_partial(["a", "b"], "cents")(t)
        lvls = sorted(set(out.column("lvl").to_pylist()))
        assert lvls == [0, 1, 3]
        grand = out.filter(pa.compute.equal(out.column("lvl"), 3))
        assert grand.num_rows == 1
        assert grand.column("__sum").to_pylist() == [6]
        assert grand.column("a").to_pylist() == [""]
        assert grand.column("b").to_pylist() == [""]

    def test_cube_distributed_path_matches_duckdb(self, ray_session):
        import duckdb
        import ray.data as rd
        from ray.data.aggregate import Sum
        from raybeats.aggregates import (cube_sets, rollup_cents_partial,
                                         rollup_null_levels)
        t = self._fixture(seed=9)
        partial = rollup_cents_partial(["a", "b"], "cents",
                                       sets=cube_sets(["a", "b"]))
        small = rd.from_arrow(t).repartition(4) \
            .map_batches(partial, batch_format="pyarrow")
        agg = small.groupby(["a", "b", "lvl"]).aggregate(
            Sum("__sum", alias_name="s"), Sum("__n", alias_name="n"))
        got = pa.concat_tables(list(agg.map_batches(
            lambda x: rollup_null_levels(x, ["a", "b"]),
            batch_format="pyarrow").iter_batches(batch_format="pyarrow")))
        con = duckdb.connect()
        con.register("t", t)
        want = con.execute(
            """SELECT a, b, CAST(GROUPING(a, b) AS BIGINT) AS lvl,
                 CAST(SUM(cents) AS BIGINT) AS s, COUNT(*) AS n
               FROM t GROUP BY CUBE (a, b)""").arrow()
        assert self._rows(got) == self._rows(want)
        # cube has the b-only level (lvl=2) that rollup lacks
        assert 2 in set(got.column("lvl").to_pylist())

    def test_grouping_set_validation(self):
        from raybeats.aggregates import rollup_cents_partial
        with pytest.raises(ValueError, match="not a subset"):
            rollup_cents_partial(["a"], "c", sets=[("zz",)])
        with pytest.raises(ValueError, match="duplicate"):
            rollup_cents_partial(["a"], "c", sets=[("a",), ("a",)])

    def test_reordered_and_repeated_grouping_sets_rejected(self):
        from raybeats.aggregates import rollup_cents_partial
        # ('b','a') canonicalizes to ('a','b') in the kernel — letting
        # both through would double that level's aggregates
        with pytest.raises(ValueError, match="duplicate"):
            rollup_cents_partial(["a", "b"], "c",
                                 sets=[("a", "b"), ("b", "a")])
        with pytest.raises(ValueError, match="repeats"):
            rollup_cents_partial(["a", "b"], "c", sets=[("a", "a")])

    def test_count_star_and_null_sum_semantics(self, ray_session):
        # n is COUNT(*) (null-cents rows counted); SUM of an all-null
        # group is NULL, not 0 — both matching the SQL oracles
        import duckdb
        import ray.data as rd
        from ray.data.aggregate import Sum
        from raybeats.aggregates import (rollup_cents_partial,
                                         rollup_null_levels)
        t = pa.table({
            "a": pa.array(["x", "x", "y", "y"], pa.string()),
            "b": pa.array(["p", "p", "q", "q"], pa.string()),
            "cents": pa.array([5, None, None, None], pa.int64())})
        partial = rollup_cents_partial(["a", "b"], "cents")
        small = rd.from_arrow(t).repartition(2) \
            .map_batches(partial, batch_format="pyarrow")
        agg = small.groupby(["a", "b", "lvl"]).aggregate(
            Sum("__sum", alias_name="s"), Sum("__n", alias_name="n"))
        got = pa.concat_tables(list(agg.map_batches(
            lambda x: rollup_null_levels(x, ["a", "b"]),
            batch_format="pyarrow").iter_batches(batch_format="pyarrow")))
        con = duckdb.connect()
        con.register("t", t)
        want = con.execute(
            """SELECT a, b, CAST(GROUPING(a, b) AS BIGINT) AS lvl,
                 CAST(SUM(cents) AS BIGINT) AS s, COUNT(*) AS n
               FROM t GROUP BY ROLLUP (a, b)""").arrow()
        assert self._rows(got) == self._rows(want)
        # the (y, q) group counts 2 rows despite all-null cents, and
        # its sum is NULL
        yq = [r for r in self._rows(got) if r[0] == "y" and r[2] == 0]
        assert yq == [("y", "q", 0, None, 2)]


class TestProfileColumns:
    def test_counts_nulls_nans_and_extremes(self, ray_session):
        import numpy as np
        import ray.data as rd

        from raybeats.aggregates import profile_columns
        t = pa.table({
            "a": pa.array([1, None, 3, None], pa.int64()),
            "b": pa.array([2.5, float("nan"), -7.0, None], pa.float64())})
        out = profile_columns(rd.from_arrow(t).repartition(2),
                              ["a", "b"])
        rows = {r["col"]: r for r in out.to_pylist()}
        assert rows["a"]["n"] == 4 and rows["a"]["n_null"] == 2
        assert rows["a"]["min_v"] == 1.0 and rows["a"]["max_v"] == 3.0
        # NaN excluded from min/max but NOT counted as null
        assert rows["b"]["n_null"] == 1
        assert rows["b"]["min_v"] == -7.0 and rows["b"]["max_v"] == 2.5

    def test_all_null_column(self, ray_session):
        import ray.data as rd

        from raybeats.aggregates import profile_columns
        t = pa.table({"a": pa.array([None, None], pa.float64())})
        out = profile_columns(rd.from_arrow(t), ["a"]).to_pylist()
        assert out[0]["n_null"] == 2 and out[0]["min_v"] is None

    def test_timestamp_column_and_empty_input(self, ray_session):
        import ray.data as rd

        from raybeats.aggregates import profile_columns
        t = pa.table({"ts": pa.array([1_000_000, 3_000_000, None],
                                     pa.timestamp("us"))})
        out = profile_columns(rd.from_arrow(t), ["ts"]).to_pylist()
        assert out[0]["n_null"] == 1
        assert out[0]["min_v"] == 1e6 and out[0]["max_v"] == 3e6
        # zero-batch input reports n=0, doesn't crash
        empty = rd.from_arrow(t.slice(0, 0))
        out2 = profile_columns(empty, ["ts"]).to_pylist()
        assert out2[0]["n"] == 0 and out2[0]["min_v"] is None
