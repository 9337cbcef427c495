"""Registrar-style per-partition checkpoint manifest.

The reference persists per-file ACKed offsets in the registrar
(``filebeat/registrar/registrar.go:194-214,303-313``) so a restart resumes
without re-emitting acknowledged data. The batch-engine equivalent is
write-audit-publish per partition: a partition's per-sink Parquet files are
written to a staging directory, atomically renamed into place, and only
then is ``_manifest/part-<id>.json`` published (input fragments, per-sink
row counts, output files, pipeline counters). On resume the planner skips
partitions whose manifest exists; deterministic directory naming makes a
retried partition overwrite, not duplicate.
"""

from __future__ import annotations

import json
import os
import shutil
import time


class CheckpointManifest:
    def __init__(self, root: str):
        self.root = root
        self.dir = os.path.join(root, "_manifest")
        os.makedirs(self.dir, exist_ok=True)

    def _path(self, partition_id: str) -> str:
        return os.path.join(self.dir, f"part-{partition_id}.json")

    def done(self) -> set[str]:
        out = set()
        for name in os.listdir(self.dir):
            if name.startswith("part-") and name.endswith(".json"):
                out.add(name[len("part-"):-len(".json")])
        return out

    def is_done(self, partition_id: str) -> bool:
        return os.path.exists(self._path(partition_id))

    def publish(self, partition_id: str, payload: dict) -> None:
        """Atomic publish: write temp file in the same dir, rename."""
        path = self._path(partition_id)
        tmp = path + ".tmp"
        payload = dict(payload)
        payload.setdefault("partition_id", partition_id)
        payload.setdefault("published_unix", time.time())
        with open(tmp, "w") as f:
            json.dump(payload, f, indent=1, sort_keys=True, default=str)
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, path)

    def read(self, partition_id: str) -> dict:
        with open(self._path(partition_id)) as f:
            return json.load(f)

    def read_all(self) -> dict[str, dict]:
        return {pid: self.read(pid) for pid in sorted(self.done())}


def stage_and_swap(final_dir: str, write_fn) -> None:
    """Write-audit-publish for one partition's data directory: write into
    ``<final>.staging`` via ``write_fn(staging_dir)``, then atomically swap
    into place (removing any partial previous attempt)."""
    staging = final_dir + ".staging"
    if os.path.exists(staging):
        shutil.rmtree(staging)
    os.makedirs(staging, exist_ok=True)
    write_fn(staging)
    if os.path.exists(final_dir):
        shutil.rmtree(final_dir)
    os.replace(staging, final_dir)
