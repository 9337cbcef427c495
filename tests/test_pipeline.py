"""End-to-end flagship pipeline vs the pure-python oracle, plus
checkpoint/resume semantics (the reference's registrar restart tests,
``filebeat/tests/system/test_registrar.py`` pattern)."""

import glob
import os
import shutil

import pyarrow.parquet as pq
import pytest

from tests.oracle import oracle_counts, oracle_route


def load_rows(info):
    rows = []
    for f in sorted(info["files"]):
        rows.extend(pq.read_table(f).to_pylist())
    return rows


@pytest.fixture(scope="module")
def flagship(ray_session, tiny_transcripts):
    import ray.data as rd

    from raybeats.pipelines import flagship_pipeline

    pipe = flagship_pipeline(enrich_concurrency=2)
    ds = pipe.build(rd.read_parquet(tiny_transcripts["files"]))
    got = ds.take_all()
    want = oracle_route(load_rows(tiny_transcripts))
    return pipe, got, want


def test_per_sink_counts_match_oracle(flagship, tiny_transcripts):
    _, got, want = flagship
    got_counts: dict = {}
    for r in got:
        got_counts[r["sink"]] = got_counts.get(r["sink"], 0) + 1
    assert got_counts == oracle_counts(load_rows(tiny_transcripts))
    assert set(got_counts) == {"es_like", "ls_like", "dead_letter"}


def test_routed_row_equality(flagship):
    _, got, want = flagship
    key = lambda r: (r["conv_id"], r["turn_idx"])
    gm = {key(r): r for r in got}
    wm = {key(r): r for r in want}
    assert set(gm) == set(wm)
    for k, w in wm.items():
        g = gm[k]
        assert g["sink"] == w["sink"], k
        assert g["text"] == w["text"], k  # per-turn text equality
        assert g["fingerprint"] == w["fingerprint"], k
        assert g.get("level") == w.get("level"), k
        assert g.get("index") == w.get("index"), k
        assert g.get("meta.team") == w.get("meta.team"), k
        assert bool(g.get("meta_miss")) == w["meta_miss"], k
        if w["sink"] == "dead_letter":
            assert g.get("message") == w["text"], k
            assert g.get("error.type") == "parse_error", k


def test_counts_by_sink_aggregate(flagship, tiny_transcripts):
    import ray.data as rd
    pipe, got, _ = flagship
    ds = pipe.build(rd.read_parquet(tiny_transcripts["files"]))
    agg = pipe.counts_by_sink(ds)
    direct: dict = {}
    for r in got:
        direct[r["sink"]] = direct.get(r["sink"], 0) + 1
    assert agg == direct


def test_stable_order_within_conversation(flagship):
    _, got, _ = flagship
    per_conv: dict = {}
    for r in got:
        per_conv.setdefault(r["conv_id"], []).append(r["turn_idx"])
    # sorting by (conv_id, turn_idx) must reconstruct dense per-conv order
    for conv, idxs in per_conv.items():
        assert sorted(idxs) == sorted(set(idxs)), conv


def test_checkpointed_run_and_resume(ray_session, tiny_transcripts, tmp_path):
    from raybeats.pipelines import flagship_pipeline

    out = str(tmp_path / "out")
    pipe = flagship_pipeline(enrich_concurrency=2)
    r1 = pipe.run(tiny_transcripts["files"], out, partitions=4)
    assert r1["partitions_run"] == 4 and r1["partitions_skipped"] == 0
    assert r1["per_sink"] == oracle_counts(load_rows(tiny_transcripts))
    assert (r1["pipeline.events.total"] ==
            r1["pipeline.events.published"] + r1["pipeline.events.dropped"])

    inventory1 = sorted(glob.glob(os.path.join(out, "part=*", "*", "*.parquet")))

    # full resume: nothing re-runs, nothing re-emitted
    r2 = pipe.run(tiny_transcripts["files"], out, partitions=4)
    assert r2["partitions_run"] == 0 and r2["partitions_skipped"] == 4
    assert r2["per_sink"] == r1["per_sink"]
    assert sorted(glob.glob(os.path.join(out, "part=*", "*", "*.parquet"))) == \
        inventory1

    # simulate a crash after 2 partitions published: drop 2 manifests +
    # their data, leave a stale staging dir behind
    for pid in ("00002", "00003"):
        os.remove(os.path.join(out, "_manifest", f"part-{pid}.json"))
        shutil.rmtree(os.path.join(out, f"part={pid}"))
    os.makedirs(os.path.join(out, "part=00002.staging", "junk"), exist_ok=True)

    r3 = pipe.run(tiny_transcripts["files"], out, partitions=4)
    assert r3["partitions_run"] == 2 and r3["partitions_skipped"] == 2
    assert r3["per_sink"] == r1["per_sink"]
    assert not glob.glob(os.path.join(out, "*.staging"))


def test_sort_output_within_partition(ray_session, tiny_transcripts, tmp_path):
    import pyarrow.parquet as pq

    from raybeats.pipelines import flagship_config
    from raybeats.pipeline import Pipeline

    cfg = flagship_config(enrich_concurrency=2)
    cfg["sort_output"] = ["conv_id", "turn_idx"]
    out = str(tmp_path / "sorted_out")
    Pipeline(cfg).run(tiny_transcripts["files"][:2], out, partitions=1)
    files = sorted(glob.glob(os.path.join(out, "part=00000", "sink=es_like",
                                          "*.parquet")))
    rows = []
    for f in files:
        rows.extend(pq.read_table(f, columns=["conv_id", "turn_idx"])
                    .to_pylist())
    keys = [(r["conv_id"], r["turn_idx"]) for r in rows]
    # per-file runs must be sorted (per-partition global order requires
    # preserve_order on the executor; per-file order suffices for the
    # reference's per-file FIFO analog)
    start = 0
    for f in files:
        n = pq.read_metadata(f).num_rows
        chunk = keys[start:start + n]
        assert chunk == sorted(chunk), f
        start += n


def test_audit_detects_tampered_partition(ray_session, tiny_transcripts,
                                          tmp_path):
    from raybeats.pipelines import flagship_pipeline
    from raybeats.pipeline import Pipeline

    out = str(tmp_path / "audit_out")
    pipe = flagship_pipeline()
    pipe.run(tiny_transcripts["files"][:2], out, partitions=2)
    audit = Pipeline.audit(out)
    assert audit["ok"] and audit["partitions"] == 2
    # tamper: remove one output file -> audit must flag the partition
    victim = glob.glob(os.path.join(out, "part=00000", "sink=es_like",
                                    "*.parquet"))[0]
    os.remove(victim)
    audit2 = Pipeline.audit(out)
    assert not audit2["ok"]
    assert audit2["mismatches"][0]["partition"] == "00000"


def test_coalesced_group_run_matches_per_partition(ray_session,
                                                   tiny_transcripts,
                                                   tmp_path):
    """coalesce_runs>1: one spanning Dataset per group, but identical
    per-partition manifests / per-sink counts / resume behavior as the
    per-partition path."""
    from raybeats.pipelines import flagship_pipeline

    base = str(tmp_path / "base")
    coal = str(tmp_path / "coal")
    pipe = flagship_pipeline(enrich_concurrency=2)
    r1 = pipe.run(tiny_transcripts["files"], base, partitions=4)
    r2 = pipe.run(tiny_transcripts["files"], coal, partitions=4,
                  coalesce_runs=2)
    assert r2["partitions_run"] == 4
    assert r2["per_sink"] == r1["per_sink"]
    assert r2["pipeline.events.published"] == r1["pipeline.events.published"]

    # per-partition manifests exist and agree with the data on disk
    from raybeats.pipeline import Pipeline
    audit = Pipeline.audit(coal)
    assert audit["ok"] and audit["partitions"] == 4
    # and per-partition row contents match the per-partition run
    for pid in range(4):
        a = sorted(r["fingerprint"] for f in glob.glob(
            os.path.join(base, f"part={pid:05d}", "*", "*.parquet"))
            for r in pq.read_table(f, columns=["fingerprint"]).to_pylist())
        b = sorted(r["fingerprint"] for f in glob.glob(
            os.path.join(coal, f"part={pid:05d}", "*", "*.parquet"))
            for r in pq.read_table(f, columns=["fingerprint"]).to_pylist())
        assert a == b, pid

    # resume: everything skips; no staging leftovers
    r3 = pipe.run(tiny_transcripts["files"], coal, partitions=4,
                  coalesce_runs=2)
    assert r3["partitions_run"] == 0 and r3["partitions_skipped"] == 4
    assert not glob.glob(os.path.join(coal, "_group_*"))

    # partial resume: drop one partition's manifest+data; only its GROUP
    # re-runs (coarser granularity, still no re-emit of finished groups)
    os.remove(os.path.join(coal, "_manifest", "part-00003.json"))
    shutil.rmtree(os.path.join(coal, "part=00003"))
    r4 = pipe.run(tiny_transcripts["files"], coal, partitions=4,
                  coalesce_runs=2)
    assert r4["partitions_run"] == 1 and r4["partitions_skipped"] == 3
    assert Pipeline.audit(coal)["ok"]


def test_coalesced_run_same_basename_across_dirs(ray_session, tmp_path):
    """Partition provenance keys by FULL path: two input files with the
    SAME basename in different directories must land in their own
    partitions (a basename key would silently merge them)."""
    import pyarrow as pa

    from raybeats.pipeline import Pipeline

    files = []
    for i, d in enumerate(("d1", "d2")):
        p = tmp_path / d
        p.mkdir()
        f = str(p / "data.parquet")
        pq.write_table(pa.table({"text": [f"row-{i}-{j}" for j in range(5)],
                                 "src": [i] * 5}), f)
        files.append(f)
    out = str(tmp_path / "out")
    rep = Pipeline({}).run(files, out, partitions=2, coalesce_runs=2)
    assert rep["partitions_run"] == 2
    assert rep["pipeline.events.published"] == 10
    for pid, src in ((0, 0), (1, 1)):
        rows = []
        for f in glob.glob(os.path.join(out, f"part={pid:05d}", "*",
                                        "*.parquet")):
            rows.extend(pq.read_table(f, columns=["src"]).to_pylist())
        assert len(rows) == 5 and {r["src"] for r in rows} == {src}, pid
