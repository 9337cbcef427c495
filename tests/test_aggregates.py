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
