"""Round-31 operators: conv_split (group-consistent train/val/test)
and split_leakage (cross-split text audit). Value assertions beyond
the gate: turn-count conservation across splits, leakage positivity on
repeated texts plus exactness vs a driver-side recompute, and the
md5-bucket determinism.
"""
import hashlib

import duckdb
import numpy as np
import pyarrow as pa

from raybeats.queries import QUERIES
from raybeats.transcripts import read_transcripts


def _table(res):
    if isinstance(res, pa.Table):
        return res
    return pa.concat_tables(res.iter_batches(batch_format="pyarrow"),
                            promote_options="default")


class TestConvSplit:
    def test_conservation_and_determinism(self, ray_session):
        sf = "/root/testdata/sf0.001"
        got = _table(QUERIES["conv_split"][0](sf))
        rows = {r["split"]: r for r in got.to_pylist()}
        # conservation: turns across splits == corpus turns; convs sum
        t = pa.concat_tables(list(read_transcripts(sf).iter_batches(
            batch_format="pyarrow")))
        convs = set(t.column("conv_id").to_pylist())
        assert sum(r["n_turns"] for r in rows.values()) == t.num_rows
        assert sum(r["n_convs"] for r in rows.values()) == len(convs)
        # determinism: recompute the expected split sizes directly
        want = {}
        for c in convs:
            h = hashlib.md5(c.encode()).hexdigest()[0]
            s = "train" if h <= "b" else ("val" if h <= "d" else "test")
            want[s] = want.get(s, 0) + 1
        assert {k: v["n_convs"] for k, v in rows.items()} == want

    def test_group_consistency(self, ray_session):
        # every conv contributes all its turns to exactly one split —
        # implied by construction (split is a function of conv_id);
        # assert the function matches SQL md5 on a sample
        sf = "/root/testdata/sf0.001"
        t = pa.concat_tables(list(read_transcripts(sf).iter_batches(
            batch_format="pyarrow")))
        con = duckdb.connect()
        some = sorted(set(t.column("conv_id").to_pylist()))[:20]
        for c in some:
            sql_h = con.execute(
                "SELECT substr(md5(?), 1, 1)", [c]).fetchone()[0]
            assert sql_h == hashlib.md5(c.encode()).hexdigest()[0]


class TestSplitLeakage:
    def test_leakage_positive_and_exact(self, ray_session):
        sf = "/root/testdata/sf0.001"
        got = _table(QUERIES["split_leakage"][0](sf)).to_pylist()[0]
        # repeated props texts cross conv (and thus split) boundaries;
        # unique log-line texts never leak
        assert 0 < got["n_leaked"] < got["n_texts"]
        # exactness vs a driver-side recompute
        t = pa.concat_tables(list(read_transcripts(sf).iter_batches(
            batch_format="pyarrow")))
        seen: dict = {}
        for c, x in zip(t.column("conv_id").to_pylist(),
                        t.column("text").to_pylist()):
            h = hashlib.md5(c.encode()).hexdigest()[0]
            s = "train" if h <= "b" else ("val" if h <= "d" else "test")
            seen.setdefault(x, set()).add(s)
        assert got["n_texts"] == len(seen)
        assert got["n_leaked"] == sum(1 for v in seen.values()
                                      if len(v) > 1)
