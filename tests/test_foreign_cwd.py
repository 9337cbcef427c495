"""The driver contract must work regardless of the driver's CWD: Ray
workers can't rely on the repo being importable, so stages serialize by
value (regression test for the CWD-dependence fix)."""

import os
import subprocess
import sys

SCRIPT = """
import os, importlib.util
os.chdir("/tmp")
import ray
ray.init(address="local", num_cpus=4, include_dashboard=False,
         logging_level="ERROR")
from ray.data import DataContext
DataContext.get_current().enable_progress_bars = False
spec = importlib.util.spec_from_file_location(
    "__ray_entry__", {entry_path!r})
m = importlib.util.module_from_spec(spec)
spec.loader.exec_module(m)
n = m.entry().count()
assert n > 0, n
counts = m.queries()["route_counts"]("/root/testdata/sf0.001").to_pandas()
assert set(counts["sink"]) == {{"dead_letter", "es_like", "ls_like"}}
print("FOREIGN_CWD_OK", n)
ray.shutdown()
"""


def test_entry_runs_from_foreign_cwd():
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    entry = os.path.join(repo, "__ray_entry__.py")
    env = dict(os.environ)
    env.pop("PYTHONPATH", None)
    out = subprocess.run(
        [sys.executable, "-c", SCRIPT.format(entry_path=entry)],
        capture_output=True, text=True, timeout=300, cwd="/tmp", env=env)
    assert "FOREIGN_CWD_OK" in out.stdout, out.stderr[-2000:]
