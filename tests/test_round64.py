"""Round-64 operators: interpolate_daily (linear-interpolated daily
resample), survivorship (field-wise golden record per near-dup
cluster), seasonal_naive_error (lag-7 forecast backtest)."""
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from raybeats.queries import QUERIES

DAY = 86_400_000_000


def _table(res):
    if isinstance(res, pa.Table):
        return res
    batches = list(res.iter_batches(batch_size=None,
                                    batch_format="pyarrow"))
    if not batches:
        return pa.table({})
    return pa.concat_tables(batches, promote_options="default")


def _events(tmp_path, rows):
    """rows: (event_id, ts_us, event_type, value)."""
    pq.write_table(pa.table({
        "event_id": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array([r[1] for r in rows], pa.int64()).cast(
            pa.timestamp("us")),
        "user_id": pa.array([1] * len(rows), pa.int64()),
        "event_type": pa.array([r[2] for r in rows], pa.string()),
        "value": pa.array([r[3] for r in rows], pa.float64()),
        "props": pa.array(["{}"] * len(rows), pa.string())}),
        tmp_path / "events.parquet")


def _docs(tmp_path, rows):
    """rows: (doc_id, text, source)."""
    pq.write_table(pa.table({
        "doc_id": pa.array([r[0] for r in rows], pa.int64()),
        "text": pa.array([r[1] for r in rows], pa.string()),
        "lang": pa.array(["en"] * len(rows), pa.string()),
        "source": pa.array([r[2] for r in rows], pa.string()),
        "n_chars": pa.array([len(r[1] or "") for r in rows],
                            pa.int64())}),
        tmp_path / "documents.parquet")


class TestInterpolateDaily:
    def test_hand_interpolation(self, ray_session, tmp_path):
        # observed day 0 = 100 cents, day 3 = 400 cents:
        # day 1 = (100*2 + 400*1)//3 = 200, day 2 = 300
        _events(tmp_path, [
            (1, 0, "purchase", 1.00),
            (2, 3 * DAY, "purchase", 4.00),
            (3, 1 * DAY, "click", 9.99)])  # non-purchase ignored
        out = _table(QUERIES["interpolate_daily"][0](str(tmp_path)))
        assert pa.compute.cast(out.column("day"),
                               pa.int64()).to_pylist() == [
            0, DAY, 2 * DAY, 3 * DAY]
        assert out.column("cents").to_pylist() == [100, 200, 300, 400]
        assert out.column("observed").to_pylist() == [
            True, False, False, True]

    def test_same_day_purchases_sum(self, ray_session, tmp_path):
        _events(tmp_path, [
            (1, 10, "purchase", 1.00), (2, 20, "purchase", 0.50),
            (3, 2 * DAY, "purchase", 3.00)])
        out = _table(QUERIES["interpolate_daily"][0](str(tmp_path)))
        # day0 = 150, day1 = (150*1 + 300*1)//2 = 225, day2 = 300
        assert out.column("cents").to_pylist() == [150, 225, 300]


class TestSurvivorship:
    def test_field_wise_merge(self, ray_session, tmp_path):
        # docs 1, 2, 3 share identical long text (one near-dup
        # cluster); doc 4 unrelated. best_doc_id = longest text — all
        # equal length, tie -> min id = 1; first_source = min source
        base = "the quick brown fox jumps over the lazy dog " * 4
        _docs(tmp_path, [
            (1, base, "web"), (2, base, "arxiv"), (3, base, "books"),
            (4, "completely different text about other things entirely "
                "with many distinct words here", "web")])
        out = _table(QUERIES["survivorship"][0](str(tmp_path)))
        assert out.num_rows == 1
        r = {c: out.column(c)[0].as_py() for c in out.column_names}
        assert r["cluster"] == 1
        assert r["n_members"] == 3
        assert r["best_doc_id"] == 1
        assert r["first_source"] == "arxiv"
        assert r["total_chars"] == 3 * len(base)

    def test_longest_wins_ties_min_id(self, ray_session, tmp_path):
        # doc 6's text is longer (extra tail keeps jaccard >= 0.5)
        base = "alpha beta gamma delta epsilon zeta eta theta " * 6
        _docs(tmp_path, [
            (5, base, "s1"), (6, base + "iota kappa", "s2")])
        out = _table(QUERIES["survivorship"][0](str(tmp_path)))
        assert out.num_rows == 1
        assert out.column("best_doc_id").to_pylist() == [6]
        assert out.column("n_members").to_pylist() == [2]

    def test_no_clusters_empty(self, ray_session, tmp_path):
        _docs(tmp_path, [
            (1, "totally unique first document text", "a"),
            (2, "another entirely different second text", "b")])
        out = _table(QUERIES["survivorship"][0](str(tmp_path)))
        assert out.num_rows == 0


class TestSeasonalNaiveError:
    def test_hand_backtest(self, ray_session, tmp_path):
        # daily cents: [100, 0(gap), 200] + day 7..9 [110, 50, 200]
        rows = [(1, 0, "click", 1.00), (2, 2 * DAY, "click", 2.00),
                (3, 7 * DAY, "click", 1.10), (4, 8 * DAY, "click", 0.50),
                (5, 9 * DAY, "click", 2.00)]
        _events(tmp_path, rows)
        out = _table(QUERIES["seasonal_naive_error"][0](str(tmp_path)))
        # dense: d0..d9 = [100,0,200,0,0,0,0,110,50,200]
        dense = np.array([100, 0, 200, 0, 0, 0, 0, 110, 50, 200])
        err = dense[7:] - dense[:-7]
        assert out.column("n_days").to_pylist() == [3]
        assert out.column("abs_err_cents").to_pylist() == [
            int(np.abs(err).sum())]
        assert out.column("bias_cents").to_pylist() == [int(err.sum())]

    def test_short_series_scores_nothing(self, ray_session, tmp_path):
        _events(tmp_path, [(1, 0, "click", 1.0),
                           (2, 3 * DAY, "click", 1.0)])
        out = _table(QUERIES["seasonal_naive_error"][0](str(tmp_path)))
        assert out.column("n_days").to_pylist() == [0]
