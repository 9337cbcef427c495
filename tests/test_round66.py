"""Round-66 operators: topk_diversified (global top-k with per-group
cap), dedup_method_overlap (pair-set agreement report),
hive_partition_prune (hive-partitioned write + partition-pruned read).
"""
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


def _events(tmp_path, rows):
    """rows: (event_id, user_id, event_type, value)."""
    pq.write_table(pa.table({
        "event_id": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array([r[0] for r in rows], pa.int64()).cast(
            pa.timestamp("us")),
        "user_id": pa.array([r[1] for r in rows], pa.int64()),
        "event_type": pa.array([r[2] for r in rows], pa.string()),
        "value": pa.array([r[3] for r in rows], pa.float64()),
        "props": pa.array(["{}"] * len(rows), pa.string())}),
        tmp_path / "events.parquet")


def _brute_diversified(rows, k=10, cap=2):
    """rows: (event_id, user_id, cents) — global order (cents desc,
    eid asc), at most cap per user, first k."""
    out, used = [], {}
    for eid, uid, c in sorted(rows, key=lambda r: (-r[2], r[0])):
        if used.get(uid, 0) < cap:
            used[uid] = used.get(uid, 0) + 1
            out.append((uid, eid, c))
        if len(out) == k:
            break
    return out


class TestTopkDiversified:
    def test_cap_enforced(self, ray_session, tmp_path):
        # user 1 owns the 5 highest values but may place only 2
        rows = [(i, 1, "click", 100.0 - i) for i in range(5)]
        rows += [(10 + i, 2 + i, "click", 50.0 - i) for i in range(12)]
        _events(tmp_path, rows)
        out = _table(QUERIES["topk_diversified"][0](str(tmp_path)))
        got = list(zip(out.column("user_id").to_pylist(),
                       out.column("event_id").to_pylist(),
                       out.column("cents").to_pylist()))
        exp = _brute_diversified(
            [(e, u, int(np.floor(v * 100))) for e, u, _, v in rows])
        assert got == exp
        assert sum(1 for u, _, _ in got if u == 1) == 2

    def test_random_parity(self, ray_session, tmp_path):
        rng = np.random.RandomState(23)
        rows = [(i, int(rng.randint(0, 8)), "click",
                 float(rng.randint(1, 1000)) / 3.0)
                for i in range(300)]
        _events(tmp_path, rows)
        out = _table(QUERIES["topk_diversified"][0](str(tmp_path)))
        got = list(zip(out.column("user_id").to_pylist(),
                       out.column("event_id").to_pylist(),
                       out.column("cents").to_pylist()))
        assert got == _brute_diversified(
            [(e, u, int(np.floor(v * 100))) for e, u, _, v in rows])


def _docs(tmp_path, rows):
    pq.write_table(pa.table({
        "doc_id": pa.array([r[0] for r in rows], pa.int64()),
        "text": pa.array([r[1] for r in rows], pa.string()),
        "lang": pa.array(["en"] * len(rows), pa.string()),
        "source": pa.array(["s"] * len(rows), pa.string()),
        "n_chars": pa.array([len(r[1] or "") for r in rows],
                            pa.int64())}),
        tmp_path / "documents.parquet")


class TestDedupMethodOverlap:
    def test_identical_pair_in_both(self, ray_session, tmp_path):
        base = ("the quick brown fox jumps over the lazy dog and "
                "keeps running through the long green field ") * 3
        _docs(tmp_path, [
            (1, base), (2, base),
            (3, "entirely different words about palace gardens "
                "and the weather patterns of distant storms")])
        out = _table(QUERIES["dedup_method_overlap"][0](str(tmp_path)))
        r = {c: out.column(c)[0].as_py() for c in out.column_names}
        # an identical pair is j=1.0 under BOTH definitions
        assert r["n_byte_pairs"] >= 1
        assert r["n_token_pairs"] >= 1
        assert r["n_both"] >= 1
        assert r["n_both"] <= min(r["n_byte_pairs"], r["n_token_pairs"])

    def test_empty_corpus_agreement(self, ray_session, tmp_path):
        _docs(tmp_path, [
            (1, "one lonely text body here"),
            (2, "and a second unrelated piece of writing")])
        out = _table(QUERIES["dedup_method_overlap"][0](str(tmp_path)))
        assert [out.column(c)[0].as_py() for c in out.column_names] \
            == [0, 0, 0]


class TestHivePartitionPrune:
    def test_only_matching_partitions_read(self, ray_session, tmp_path):
        rows = [(1, 1, "error", 1.0), (2, 1, "purchase", 2.5),
                (3, 1, "click", 9.0), (4, 2, "error", 0.25),
                (5, 2, "view", 7.0)]
        _events(tmp_path, rows)
        out = _table(QUERIES["hive_partition_prune"][0](
            str(tmp_path))).sort_by("event_type")
        assert out.column("event_type").to_pylist() == [
            "error", "purchase"]
        assert out.column("n").to_pylist() == [2, 1]
        assert out.column("cents").to_pylist() == [125, 250]

    def test_rerun_idempotent(self, ray_session, tmp_path):
        _events(tmp_path, [(1, 1, "error", 1.0),
                           (2, 1, "purchase", 2.0)])
        a = _table(QUERIES["hive_partition_prune"][0](str(tmp_path)))
        b = _table(QUERIES["hive_partition_prune"][0](str(tmp_path)))
        assert a.sort_by("event_type").equals(b.sort_by("event_type"))
