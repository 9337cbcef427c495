"""Pipeline.compact: small-file compaction over a published sink tree.
Asserts the write-audit-publish contract: fragments merge to one file
with identical rows, the audit stays green, unpublished partitions are
untouched, count mismatches are refused (never silently rewritten),
oversized fragments are left alone, and a second run is a no-op.
"""
import glob
import os

import pyarrow as pa
import pyarrow.parquet as pq

from raybeats.pipeline import Pipeline
from raybeats.state.manifest import CheckpointManifest


def _frag(path, lo, hi):
    pq.write_table(pa.table({"x": pa.array(range(lo, hi), pa.int64()),
                             "s": pa.array([f"r{i}" for i in
                                            range(lo, hi)],
                                           pa.string())}), path)


def _tree(tmp_path):
    out = str(tmp_path / "out")
    m = CheckpointManifest(out)
    # part 00000: sink a → 3 fragments, sink b → already single
    d_a = os.path.join(out, "part=00000", "sink=a")
    d_b = os.path.join(out, "part=00000", "sink=b")
    os.makedirs(d_a), os.makedirs(d_b)
    _frag(os.path.join(d_a, "f0.parquet"), 0, 10)
    _frag(os.path.join(d_a, "f1.parquet"), 10, 15)
    _frag(os.path.join(d_a, "f2.parquet"), 15, 22)
    _frag(os.path.join(d_b, "f0.parquet"), 0, 4)
    m.publish("00000", {"per_sink": {"a": 22, "b": 4}})
    # part 00001: sink a → 2 fragments
    d_c = os.path.join(out, "part=00001", "sink=a")
    os.makedirs(d_c)
    _frag(os.path.join(d_c, "f0.parquet"), 0, 3)
    _frag(os.path.join(d_c, "f1.parquet"), 3, 9)
    m.publish("00001", {"per_sink": {"a": 9}})
    # part 00002: UNPUBLISHED (no manifest) → must not be touched
    d_u = os.path.join(out, "part=00002", "sink=a")
    os.makedirs(d_u)
    _frag(os.path.join(d_u, "f0.parquet"), 0, 2)
    _frag(os.path.join(d_u, "f1.parquet"), 2, 5)
    return out


def _rows(sink_dir):
    t = pa.concat_tables(
        [pq.read_table(f) for f in
         sorted(glob.glob(os.path.join(sink_dir, "*.parquet")))])
    return sorted(t.column("x").to_pylist())


class TestCompact:
    def test_compacts_and_audits(self, ray_session, tmp_path):
        out = _tree(tmp_path)
        before = _rows(os.path.join(out, "part=00000", "sink=a"))
        rep = Pipeline.compact(out)
        assert rep["compacted"] == 2 and not rep["refused"]
        a = glob.glob(os.path.join(out, "part=00000", "sink=a",
                                   "*.parquet"))
        assert len(a) == 1  # three fragments became one file
        assert _rows(os.path.join(out, "part=00000", "sink=a")) \
            == before
        # audit against the republished manifests stays green
        assert Pipeline.audit(out)["ok"]
        man = CheckpointManifest(out).read("00000")
        assert man["compaction"]["a"]["files_before"] == 3
        assert man["per_sink"] == {"a": 22, "b": 4}  # counts untouched
        # unpublished partition untouched
        assert len(glob.glob(os.path.join(
            out, "part=00002", "sink=a", "*.parquet"))) == 2
        # second run is a no-op
        rep2 = Pipeline.compact(out)
        assert rep2["compacted"] == 0

    def test_refuses_count_mismatch(self, ray_session, tmp_path):
        out = _tree(tmp_path)
        m = CheckpointManifest(out)
        bad = m.read("00001")
        bad["per_sink"]["a"] = 999  # lie about the published count
        m.publish("00001", bad)
        rep = Pipeline.compact(out)
        assert [r["partition"] for r in rep["refused"]] == ["00001"]
        # refused dir keeps its fragments
        assert len(glob.glob(os.path.join(
            out, "part=00001", "sink=a", "*.parquet"))) == 2
        # the healthy partition still compacted
        assert rep["compacted"] == 1

    def test_skip_large_fragments(self, ray_session, tmp_path):
        out = _tree(tmp_path)
        rep = Pipeline.compact(out, small_file_bytes=1)
        assert rep["compacted"] == 0 and rep["skip_large"] == 2

    def test_resumes_over_killed_staging(self, ray_session, tmp_path):
        # a compaction killed mid-write leaves <sink>.staging with a
        # partial file; the re-run must discard it and still produce
        # exactly the manifest row count (no duplication, no crash)
        out = _tree(tmp_path)
        sink = os.path.join(out, "part=00000", "sink=a")
        staging = sink + ".staging"
        os.makedirs(staging)
        _frag(os.path.join(staging, "compacted-0.parquet"), 0, 7)
        rep = Pipeline.compact(out)
        assert rep["compacted"] == 2 and not rep["refused"]
        assert not os.path.exists(staging)
        assert _rows(sink) == list(range(22))
        assert Pipeline.audit(out)["ok"]
