import pyarrow as pa
import pytest

from raybeats.enrich import Enricher
from raybeats.errors import ConfigError


def test_enricher_direct():
    side = [{"role": "user", "tool": "db", "team": "core"},
            {"role": "tool", "tool": "", "team": "infra"}]
    e = Enricher(rows=side, key_fields=("role", "tool"), target_prefix="m")
    t = e(pa.table({"role": ["user", "user", "tool"],
                    "tool": ["db", "search", ""]}))
    assert t.column("m.team").to_pylist() == ["core", None, "infra"]
    assert t.column("m_miss").to_pylist() == [False, True, False]


def test_enricher_duplicate_keys_rejected():
    side = [{"k": "a", "v": 1}, {"k": "a", "v": 2}]
    with pytest.raises(ConfigError):
        Enricher(rows=side, key_fields=("k",))


def test_actor_pool_enrich_mode(ray_session, tiny_transcripts):
    """Force the broadcast actor-pool path (big-side mode) and check it
    matches the fused tasks-mode result."""
    import ray.data as rd

    from raybeats.pipelines import flagship_config
    from raybeats.pipeline import Pipeline

    cfg_a = flagship_config(enrich_concurrency=2)
    cfg_a["enrich"]["mode"] = "actors"
    cfg_b = flagship_config(enrich_concurrency=2)
    cfg_b["enrich"]["mode"] = "tasks"

    files = tiny_transcripts["files"][:2]
    rows_a = Pipeline(cfg_a).build(rd.read_parquet(files)).take_all()
    rows_b = Pipeline(cfg_b).build(rd.read_parquet(files)).take_all()
    key = lambda r: (r["conv_id"], r["turn_idx"])
    a = {key(r): (r["sink"], r.get("meta.team"), r.get("meta_miss"))
         for r in rows_a}
    b = {key(r): (r["sink"], r.get("meta.team"), r.get("meta_miss"))
         for r in rows_b}
    assert a == b and len(a) > 0


def test_failed_partition_isolated(ray_session, tiny_transcripts, tmp_path):
    """One partition blowing up must not lose the others' manifests; the
    error surfaces at the end and a resumed run retries only the failure."""
    from raybeats.pipelines import flagship_pipeline

    pipe = flagship_pipeline()
    boom = {"count": 0}
    orig_build = pipe.build

    def flaky_build(ds):
        boom["count"] += 1
        if boom["count"] == 2:  # second partition fails at plan time
            raise RuntimeError("injected")
        return orig_build(ds)

    pipe.build = flaky_build
    out = str(tmp_path / "out")
    with pytest.raises(RuntimeError, match="partition"):
        pipe.run(tiny_transcripts["files"], out, partitions=4,
                 partition_parallelism=1)
    import glob
    import os
    published = glob.glob(os.path.join(out, "_manifest", "part-*.json"))
    assert len(published) == 3

    pipe2 = flagship_pipeline()
    report = pipe2.run(tiny_transcripts["files"], out, partitions=4)
    assert report["partitions_run"] == 1
    assert report["partitions_skipped"] == 3
