"""True mid-run kill → resume: a subprocess running the checkpointed
pipeline is SIGKILLed after the first manifest publishes; the resumed run
must skip published partitions, clean stale staging, and finish with
golden counts (``filebeat/tests/system/test_registrar.py`` pattern)."""

import glob
import os
import signal
import subprocess
import sys
import time

RUNNER = """
import sys
sys.path.insert(0, {repo!r})
import ray
ray.init(address="local", num_cpus=4, include_dashboard=False,
         logging_level="ERROR")
from ray.data import DataContext
DataContext.get_current().enable_progress_bars = False
from raybeats.pipelines import flagship_pipeline
import json
info = json.load(open({info!r}))
pipe = flagship_pipeline()
pipe.run(info["files"], {out!r}, partitions=4, partition_parallelism=1)
ray.shutdown()
"""


def test_kill_mid_run_then_resume(ray_session, tiny_transcripts, tmp_path):
    import json

    from raybeats.pipelines import flagship_pipeline
    from tests.oracle import oracle_counts
    from tests.test_pipeline import load_rows

    out = str(tmp_path / "out")
    info_path = str(tmp_path / "info.json")
    with open(info_path, "w") as f:
        json.dump({"files": tiny_transcripts["files"]}, f)

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    script = RUNNER.format(repo=repo, info=info_path, out=out)
    proc = subprocess.Popen([sys.executable, "-c", script],
                            stdout=subprocess.DEVNULL,
                            stderr=subprocess.DEVNULL)
    # kill the child as soon as the first manifest is published
    deadline = time.time() + 180
    manifest_glob = os.path.join(out, "_manifest", "part-*.json")
    while time.time() < deadline:
        if glob.glob(manifest_glob):
            break
        if proc.poll() is not None:
            break
        time.sleep(0.1)
    if proc.poll() is None:
        proc.send_signal(signal.SIGKILL)
        proc.wait()
    published_before = set(glob.glob(manifest_glob))
    assert published_before, "child never published a manifest"
    assert len(published_before) < 4, "child finished before the kill"

    # resume in-process: must skip the published partitions
    pipe = flagship_pipeline()
    report = pipe.run(tiny_transcripts["files"], out, partitions=4)
    assert report["partitions_skipped"] == len(published_before)
    assert report["partitions_run"] == 4 - len(published_before)
    assert report["per_sink"] == oracle_counts(load_rows(tiny_transcripts))
    assert not glob.glob(os.path.join(out, "*.staging"))

    # second resume: nothing re-runs, identical counts (no re-emission)
    report2 = pipe.run(tiny_transcripts["files"], out, partitions=4)
    assert report2["partitions_run"] == 0
    assert report2["per_sink"] == report["per_sink"]
