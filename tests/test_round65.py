"""Round-65 operators: threshold_sweep (multi-threshold dedup tuning
from one verify pass), knn_label_eval (exact quantized-L2 5-NN
majority-vote label eval)."""
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from raybeats.queries import QUERIES


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


def _shingles(text):
    """The oracle's byte-8 shingle set: substr(text, i, 8) for
    i in 1..greatest(len-7, 1)."""
    n = max(len(text) - 7, 1)
    return {text[i:i + 8] for i in range(n)}


def _brute_sweep(rows, thresholds):
    pairs = []
    sets = {i: _shingles(t) for i, t in rows}
    ids = sorted(sets)
    for x in range(len(ids)):
        for y in range(x + 1, len(ids)):
            a, b = sets[ids[x]], sets[ids[y]]
            inter = len(a & b)
            if inter:
                j = inter / (len(a) + len(b) - inter)
                if j >= 0.5:
                    pairs.append(j)
    return [sum(1 for j in pairs if j >= t) for t in thresholds]


class TestThresholdSweep:
    def test_hand_bands(self, ray_session, tmp_path):
        base = "the quick brown fox jumps over the lazy dog " * 4
        rows = [
            (1, base), (2, base),                  # j = 1.0
            (3, base + "tail bits"),               # high-j pair w/ 1,2
            (4, "completely unrelated text about gardens and rain "
                "with plenty of distinct words to keep it apart"),
        ]
        _docs(tmp_path, rows)
        out = _table(QUERIES["threshold_sweep"][0](str(tmp_path)))
        thr = out.column("threshold").to_pylist()
        got = out.column("n_pairs").to_pylist()
        assert thr == [0.5, 0.6, 0.7, 0.8, 0.9]
        assert got == _brute_sweep(rows, thr)
        # counts are monotone non-increasing and the j=1.0 pair is in
        # every band
        assert all(a >= b for a, b in zip(got, got[1:]))
        assert got[-1] >= 1

    def test_no_pairs_zero_rows_kept(self, ray_session, tmp_path):
        _docs(tmp_path, [
            (1, "first unique document body with its own words"),
            (2, "second text sharing nothing at all with the other")])
        out = _table(QUERIES["threshold_sweep"][0](str(tmp_path)))
        assert out.column("n_pairs").to_pylist() == [0] * 5


def _embs(tmp_path, rows):
    """rows: (vec_id, vector, label)."""
    pq.write_table(pa.table({
        "vec_id": pa.array([r[0] for r in rows], pa.int64()),
        "embedding": pa.array([r[1] for r in rows],
                              pa.list_(pa.float32())),
        "label": pa.array([r[2] for r in rows], pa.int32())}),
        tmp_path / "embeddings.parquet")


def _brute_knn_eval(rows, k=5):
    q = {i: np.round(np.array(v, np.float64) * 1e6).astype(np.int64)
         for i, v, _ in rows}
    lab = {i: l for i, _, l in rows}
    per_label = {}
    for i in q:
        dists = sorted((int(((q[i] - q[j]) ** 2).sum()), j)
                       for j in q if j != i)
        votes = [lab[j] for _, j in dists[:k]]
        cnt = {}
        for v in votes:
            cnt[v] = cnt.get(v, 0) + 1
        pred = min(cnt, key=lambda v: (-cnt[v], v))
        n, c = per_label.get(lab[i], (0, 0))
        per_label[lab[i]] = (n + 1, c + (pred == lab[i]))
    return per_label


class TestKnnLabelEval:
    def test_hand_majority_and_ties(self, ray_session, tmp_path):
        # query 0 at x=0: neighbors at 1,2 (label 0), 3,4 (label 1),
        # 5 (label 2), 100 (label 3, outside top-5).
        # votes [0,0,1,1,2] -> 2-2 tie -> min label 0
        rows = [
            (0, [0.0, 0.0], 9),
            (1, [1.0, 0.0], 0), (2, [2.0, 0.0], 0),
            (3, [3.0, 0.0], 1), (4, [4.0, 0.0], 1),
            (5, [5.0, 0.0], 2), (6, [100.0, 0.0], 3)]
        _embs(tmp_path, rows)
        out = _table(QUERIES["knn_label_eval"][0](str(tmp_path)))
        got = {l: (n, c) for l, n, c in zip(
            out.column("label").to_pylist(),
            out.column("n").to_pylist(),
            out.column("n_correct").to_pylist())}
        assert got == _brute_knn_eval(rows)
        assert got[9] == (1, 0)  # the tie resolved to 0, not 9

    def test_self_excluded_duplicate_included(self, ray_session,
                                              tmp_path):
        # vec 1 and 2 identical: each other's nearest (dist 0), self
        # never votes
        rows = [(1, [0.0, 0.0], 0), (2, [0.0, 0.0], 1),
                (3, [1.0, 0.0], 0), (4, [2.0, 0.0], 0),
                (5, [3.0, 0.0], 0), (6, [4.0, 0.0], 0)]
        _embs(tmp_path, rows)
        out = _table(QUERIES["knn_label_eval"][0](str(tmp_path)))
        got = {l: (n, c) for l, n, c in zip(
            out.column("label").to_pylist(),
            out.column("n").to_pylist(),
            out.column("n_correct").to_pylist())}
        assert got == _brute_knn_eval(rows)

    def test_random_parity_vs_brute(self, ray_session, tmp_path):
        rng = np.random.RandomState(17)
        rows = [(i, [float(x) for x in rng.randn(8)],
                 int(rng.randint(0, 3))) for i in range(60)]
        _embs(tmp_path, rows)
        out = _table(QUERIES["knn_label_eval"][0](str(tmp_path)))
        got = {l: (n, c) for l, n, c in zip(
            out.column("label").to_pylist(),
            out.column("n").to_pylist(),
            out.column("n_correct").to_pylist())}
        assert got == _brute_knn_eval(rows)
