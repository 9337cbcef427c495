"""Round-57 operator: pack_efficiency (packing-fill decile
histogram). Value assertions: hand-built doc lengths give known pack
totals and bins (including an over-capacity bin from a straddling
doc), pack-count conservation, and oracle parity.
"""
import duckdb
import pyarrow as pa
import pyarrow.parquet as pq

from raybeats.queries import QUERIES


def _docs(tmp_path, rows):
    """rows: (doc_id, n_tokens) — text synthesized as n 'w' tokens."""
    t = pa.table({
        "doc_id": pa.array([r[0] for r in rows], pa.int64()),
        "text": pa.array([" ".join(["w"] * r[1]) for r in rows],
                         pa.string()),
        "lang": pa.array(["en"] * len(rows), pa.string()),
        "source": pa.array(["s"] * len(rows), pa.string()),
        "n_chars": pa.array([2 * r[1] for r in rows], pa.int64())})
    pq.write_table(t, tmp_path / "documents.parquet")


def _table(res):
    if isinstance(res, pa.Table):
        return res
    return pa.concat_tables(res.iter_batches(batch_format="pyarrow"),
                            promote_options="default")


class TestPackEfficiency:
    def test_hand_bins(self, ray_session, tmp_path):
        # doc_id order drives the prefix sum: 3000 + 2000 straddles
        # the 4096 boundary → pack 0 holds BOTH (5000 tokens,
        # decile 12 — overshoot is real); next doc starts pack 1
        rows = [(1, 3000), (2, 2000), (3, 410)]
        _docs(tmp_path, rows)
        got = _table(QUERIES["pack_efficiency"][0](str(tmp_path)))
        r = {x["fill_decile"]: x["n_packs"] for x in got.to_pylist()}
        assert r == {12: 1, 1: 1}  # 5000*10//4096=12; 410*10//4096=1

    def test_parity_and_conservation(self, ray_session):
        sf = "/root/testdata/sf0.001"
        got = _table(QUERIES["pack_efficiency"][0](sf))
        con = duckdb.connect()
        con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                    f"'{sf}/documents.parquet'")
        want = con.execute(QUERIES["pack_efficiency"][1]).arrow()
        g = {x["fill_decile"]: x["n_packs"] for x in got.to_pylist()}
        w = {x["fill_decile"]: x["n_packs"] for x in want.to_pylist()}
        assert g == w
        packs = _table(QUERIES["pack_sequences"][0](sf))
        n_packs = len(set(packs.column("pack_id").to_pylist()))
        assert sum(g.values()) == n_packs
