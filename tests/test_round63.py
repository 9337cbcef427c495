"""Round-63 operators: rrf_fusion (reciprocal-rank hybrid retrieval),
changepoint_cusum (integer CUSUM over the daily error series),
incremental_agg (materialized-view maintenance: state + delta merge ≡
full recompute). Hand-value cases and invariants."""
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from raybeats.queries import QUERIES

US = 1_000_000
DAY = 86_400_000_000
SCALE, C = 10 ** 12, 60


def _table(res):
    if isinstance(res, pa.Table):
        return res
    batches = list(res.iter_batches(batch_size=None,
                                    batch_format="pyarrow"))
    if not batches:
        return pa.table({})
    return pa.concat_tables(batches, promote_options="default")


def _docs(tmp_path, rows):
    pq.write_table(pa.table({
        "doc_id": pa.array([r[0] for r in rows], pa.int64()),
        "text": pa.array([r[1] for r in rows], pa.string()),
        "lang": pa.array(["en"] * len(rows), pa.string()),
        "source": pa.array(["s"] * len(rows), pa.string()),
        "n_chars": pa.array([len(r[1] or "") for r in rows],
                            pa.int64())}),
        tmp_path / "documents.parquet")


def _embs(tmp_path, rows):
    pq.write_table(pa.table({
        "vec_id": pa.array([r[0] for r in rows], pa.int64()),
        "embedding": pa.array([r[1] for r in rows],
                              pa.list_(pa.float32())),
        "label": pa.array([0] * len(rows), pa.int32())}),
        tmp_path / "embeddings.parquet")


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


class TestRrfFusion:
    def test_hand_fusion(self, ray_session, tmp_path):
        # lexical ranks by bm25 terms: doc 1 hits all 5 terms (rank 1),
        # doc 2 one term (rank 2), doc 3 none (score 0, rank 3 by id)
        _docs(tmp_path, [
            (1, "dup spark window merge batch"),
            (2, "dup and nothing else here at all longer text pad"),
            (3, "plain words only")])
        # vector ranks vs query vec 0 = [1, 0]: vec 2 cos=1 (rank 1),
        # vec 3 cos≈0.707 (rank 2), vec 1 cos=0 (rank 3); vec 0 is the
        # query itself and excluded
        _embs(tmp_path, [
            (0, [1.0, 0.0]), (1, [0.0, 1.0]),
            (2, [1.0, 0.0]), (3, [1.0, 1.0])])
        out = _table(QUERIES["rrf_fusion"][0](str(tmp_path)))
        got = {d: (r, rl, rv) for d, r, rl, rv in zip(
            out.column("doc_id").to_pylist(),
            out.column("rrf").to_pylist(),
            out.column("rank_lex").to_pylist(),
            out.column("rank_vec").to_pylist())}
        lex = {1: 1, 2: 2, 3: 3}
        vec = {2: 1, 3: 2, 1: 3}
        exp = {}
        for d in {1, 2, 3}:
            exp[d] = (SCALE // (C + lex[d]) + SCALE // (C + vec[d]),
                      lex[d], vec[d])
        # doc 0 has an embedding but no document row: never appears
        # in the lexical arm; it is the QUERY vector so never in the
        # vector arm either
        assert got == exp

    def test_single_list_contribution(self, ray_session, tmp_path):
        # doc 9 exists only in documents (no embedding row): vector
        # rank 0, single lexical contribution
        _docs(tmp_path, [(9, "dup spark window merge batch")])
        _embs(tmp_path, [(0, [1.0, 0.0]), (5, [1.0, 0.0])])
        out = _table(QUERIES["rrf_fusion"][0](str(tmp_path)))
        got = {d: (r, rl, rv) for d, r, rl, rv in zip(
            out.column("doc_id").to_pylist(),
            out.column("rrf").to_pylist(),
            out.column("rank_lex").to_pylist(),
            out.column("rank_vec").to_pylist())}
        assert got[9] == (SCALE // 61, 1, 0)
        assert got[5] == (SCALE // 61, 0, 1)


class TestChangepointCusum:
    def test_hand_shift(self, ray_session, tmp_path):
        # counts per day: [1, 1, 1, 9, 9] → argmax of |5*S_i - i*45|
        rows, eid = [], 0
        for day, n in enumerate([1, 1, 1, 9, 9]):
            for _ in range(n):
                rows.append((eid, day * DAY + eid, "error", 1.0))
                eid += 1
        _events(tmp_path, rows)
        out = _table(QUERIES["changepoint_cusum"][0](str(tmp_path)))
        s = np.cumsum([1, 1, 1, 9, 9])
        i = np.arange(1, 5)
        stat = np.abs(5 * s[:-1] - i * s[-1])
        best = int(np.argmax(stat))
        assert pa.compute.cast(out.column("day"),
                               pa.int64()).to_pylist() == [best * DAY]
        assert out.column("stat").to_pylist() == [int(stat[best])]

    def test_gap_days_count_zero(self, ray_session, tmp_path):
        # errors only on day 0 and day 4: the dense grid inserts three
        # zero days, which shifts the argmax vs a sparse series
        _events(tmp_path, [
            (0, 0, "error", 1.0), (1, 1, "error", 1.0),
            (2, 4 * DAY, "error", 1.0)])
        out = _table(QUERIES["changepoint_cusum"][0](str(tmp_path)))
        dense = np.array([2, 0, 0, 0, 1])
        s = np.cumsum(dense)
        i = np.arange(1, 5)
        stat = np.abs(5 * s[:-1] - i * s[-1])
        best = int(np.argmax(stat))
        assert pa.compute.cast(out.column("day"),
                               pa.int64()).to_pylist() == [best * DAY]

    def test_under_two_days_empty(self, ray_session, tmp_path):
        _events(tmp_path, [(0, 5, "error", 1.0), (1, 9, "error", 1.0)])
        out = _table(QUERIES["changepoint_cusum"][0](str(tmp_path)))
        assert out.num_rows == 0  # a 1-day series has no 1 <= i < n


class TestIncrementalAgg:
    def _full(self, rows):
        exp = {}
        for _, ts, et, v in rows:
            k = (et, ts // DAY)
            n, c = exp.get(k, (0, 0))
            exp[k] = (n + 1, c + int(np.floor(v * 100)))
        return exp

    def test_merge_equals_recompute(self, ray_session, tmp_path):
        rng = np.random.RandomState(5)
        rows = [(i, int(rng.randint(0, 10 * DAY)),
                 ["click", "error"][int(rng.randint(2))],
                 float(rng.randint(1, 500)) / 7.0)
                for i in range(400)]
        _events(tmp_path, rows)
        out = _table(QUERIES["incremental_agg"][0](str(tmp_path)))
        got = {(et, d): (n, c) for et, d, n, c in zip(
            out.column("event_type").to_pylist(),
            out.column("day").to_pylist(),
            out.column("n").to_pylist(),
            out.column("cents").to_pylist())}
        assert got == self._full(rows)

    def test_rerun_idempotent(self, ray_session, tmp_path):
        # the state dir is rebuilt per run (stale files removed) — a
        # second run must not double the history
        rows = [(i, i * DAY // 2, "click", 1.0) for i in range(20)]
        _events(tmp_path, rows)
        a = _table(QUERIES["incremental_agg"][0](str(tmp_path)))
        b = _table(QUERIES["incremental_agg"][0](str(tmp_path)))
        assert a.sort_by([("event_type", "ascending"),
                          ("day", "ascending")]).equals(
            b.sort_by([("event_type", "ascending"),
                       ("day", "ascending")]))
        assert a.num_rows > 0
