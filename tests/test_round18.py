"""Round-18 operators: doc_rarity (broadcast-after-aggregate unigram
frequency scoring), behavior_signatures (bitmask cohort histogram),
cum_distinct_types (expanding distinct-count window). Value assertions
beyond the DuckDB gate: hand-computed rarity sums/mins with empty and
repeated-token docs, signature discrimination on sparse profiles (the
sf corpus is dense enough to collapse to one row), and novelty-curve
monotonicity/reset semantics.
"""
import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from raybeats.queries import QUERIES


def _events(tmp_path, rows):
    t = pa.table({
        "event_id": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array([r[1] for r in rows], pa.int64())
        .cast(pa.timestamp("us")),
        "user_id": pa.array([r[2] for r in rows], pa.int64()),
        "event_type": pa.array([r[3] for r in rows], pa.string()),
        "value": pa.array([r[4] for r in rows], pa.float64()),
        "props": pa.array(["{}"] * len(rows), pa.string())})
    pq.write_table(t, tmp_path / "events.parquet")


def _documents(tmp_path, rows):
    t = pa.table({
        "doc_id": pa.array([r[0] for r in rows], pa.int64()),
        "text": pa.array([r[1] for r in rows], pa.string()),
        "lang": pa.array(["en"] * len(rows), pa.string()),
        "source": pa.array(["s"] * len(rows), pa.string()),
        "n_chars": pa.array([len(r[1] or "") for r in rows],
                            pa.int64())})
    pq.write_table(t, tmp_path / "documents.parquet")


def _table(res):
    if isinstance(res, pa.Table):
        return res
    return pa.concat_tables(res.iter_batches(batch_format="pyarrow"),
                            promote_options="default")


def _oracle(tmp_path, sql, tables=("events",)):
    con = duckdb.connect()
    for tb in tables:
        con.execute(f"CREATE VIEW {tb} AS SELECT * FROM "
                    f"'{tmp_path}/{tb}.parquet'")
    return con.execute(sql).arrow()


def _sorted_rows(tb):
    cols = sorted(tb.column_names)
    return sorted(
        map(tuple, zip(*[tb.column(c).to_pylist() for c in cols])),
        key=lambda r: tuple((v is None, v) for v in r))


class TestDocRarity:
    def test_hand_counts(self, ray_session, tmp_path):
        # global counts: aa=2, bb=2, zz=1. doc0 "aa bb aa": sum
        # 2+2+2=6 min 2; doc1 "bb zz": sum 3 min 1; doc2 "": dropped.
        _documents(tmp_path, [(0, "aa bb aa"), (1, "bb zz"), (2, "")])
        got = _table(QUERIES["doc_rarity"][0](str(tmp_path)))
        rows = {r["doc_id"]: r for r in got.to_pylist()}
        assert set(rows) == {0, 1}
        assert rows[0] == {"doc_id": 0, "n_tokens": 3,
                           "rarity_sum": 6, "rarest": 2}
        assert rows[1] == {"doc_id": 1, "n_tokens": 2,
                           "rarity_sum": 3, "rarest": 1}

    def test_oracle_parity_random(self, ray_session, tmp_path):
        rng = np.random.default_rng(31)
        words = ["alpha", "beta", "gamma", "delta", "x9", "qq"]
        docs = [(i, " ".join(rng.choice(words,
                                        size=rng.integers(0, 12))))
                for i in range(400)]
        _documents(tmp_path, docs)
        got = _table(QUERIES["doc_rarity"][0](str(tmp_path)))
        want = _oracle(tmp_path, QUERIES["doc_rarity"][1],
                       tables=("documents",))
        assert _sorted_rows(got) == _sorted_rows(want)


class TestBehaviorSignatures:
    def test_discriminates_profiles(self, ray_session, tmp_path):
        # codes sorted: a=0 b=1 c=2. u1:{a}=1, u2:{a,b}=3, u3:{a,b}=3,
        # u4:{c}=4 -> histogram {1:1, 3:2, 4:1}
        rows = [(0, 0, 1, "a", 1.0), (1, 1, 2, "a", 1.0),
                (2, 2, 2, "b", 1.0), (3, 3, 2, "b", 1.0),
                (4, 4, 3, "b", 1.0), (5, 5, 3, "a", 1.0),
                (6, 6, 4, "c", 1.0)]
        _events(tmp_path, rows)
        got = _table(QUERIES["behavior_signatures"][0](str(tmp_path)))
        hist = {r["signature"]: r["n_users"] for r in got.to_pylist()}
        assert hist == {1: 1, 3: 2, 4: 1}

    def test_oracle_parity_random(self, ray_session, tmp_path):
        rng = np.random.default_rng(47)
        types = list("abcdefg")
        rows = [(i, int(rng.integers(0, 1000)),
                 int(rng.integers(0, 60)),
                 types[int(rng.integers(0, 7))], 1.0)
                for i in range(2500)]
        _events(tmp_path, rows)
        got = _table(QUERIES["behavior_signatures"][0](str(tmp_path)))
        want = _oracle(tmp_path, QUERIES["behavior_signatures"][1])
        assert _sorted_rows(got) == _sorted_rows(want)
        assert got.num_rows > 3  # sparse profiles must discriminate


class TestCumDistinctTypes:
    def test_novelty_curve(self, ray_session, tmp_path):
        # u1 sequence a,b,a,c -> 1,2,2,3; u2 sequence b,b -> 1,1
        rows = [(0, 10, 1, "a", 1.0), (1, 20, 1, "b", 1.0),
                (2, 30, 1, "a", 1.0), (3, 40, 1, "c", 1.0),
                (4, 10, 2, "b", 1.0), (5, 20, 2, "b", 1.0)]
        _events(tmp_path, rows)
        got = _table(QUERIES["cum_distinct_types"][0](str(tmp_path)))
        curve = {r["event_id"]: r["n_types_so_far"]
                 for r in got.to_pylist()}
        assert curve == {0: 1, 1: 2, 2: 2, 3: 3, 4: 1, 5: 1}

    def test_oracle_parity_with_ties(self, ray_session, tmp_path):
        rng = np.random.default_rng(53)
        # coarse ts grid forces (ts) ties broken by event_id
        rows = [(i, int(rng.integers(0, 50)) * 1000,
                 int(rng.integers(0, 25)),
                 list("abcd")[int(rng.integers(0, 4))], 1.0)
                for i in range(3000)]
        _events(tmp_path, rows)
        got = _table(QUERIES["cum_distinct_types"][0](str(tmp_path)))
        want = _oracle(tmp_path, QUERIES["cum_distinct_types"][1])
        assert _sorted_rows(got) == _sorted_rows(want)
