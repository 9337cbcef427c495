"""Pipeline assembly and execution: parse → enrich → route → aggregate.

The reference's publisher pipeline (``libbeat/publisher/pipeline/``) is
re-expressed as a lazy Ray ``Dataset`` plan:

* read: ``ray.data.read_parquet`` over the partition's fragments (the
  harvester/prospector equivalent — discovery is fragment planning);
* processor chain: ONE stateless ``map_batches`` applying the compiled
  chain per Arrow batch (zero-copy);
* lookup-enrich: an actor-pool ``map_batches`` stage (state in
  ``__init__``, work in ``__call__``);
* route: the selector computes the ``sink`` column; dead-letter rows get
  the ES non-indexable rewrite (``message``/``error.type``/
  ``error.message`` — ``elasticsearch/client.go:393-411``);
* sinks: partitioned Parquet (``partition_cols=["sink"]``) per input
  partition, write-audit-publish with a registrar-style manifest (§4 of
  SURVEY.md) so a killed run resumes without re-emitting published
  partitions.

Counters use the reference metric names
(``pipeline.events.{total,published,dropped,failed}``,
``libbeat/publisher/pipeline/monitoring.go:46-75``).
"""

from __future__ import annotations

import glob as glob_mod
import json
import os
import shutil
import time

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from .enrich import Enricher
from .errors import ConfigError
from .model import FLAGS, META_DEAD_LETTER, SINK
from .processors import Chain, build_chain, get_column, set_column
from .router import Router


class DeadLetterRewrite:
    """ES 4xx-triage rewrite for dead-lettered rows: original document
    serialized into ``message``, failure reason into ``error.type`` /
    ``error.message`` (``elasticsearch/client.go:404-409``,
    ``non_indexable_policy.go``)."""

    def __init__(self, dead_letter_sink: str = "dead_letter",
                 source_field: str = "text"):
        self.sink = dead_letter_sink
        self.source = source_field

    def apply(self, tbl: pa.Table) -> pa.Table:
        if SINK not in tbl.column_names:
            return tbl
        # always materialize the rewrite columns (null when not
        # dead-lettered) so block schemas are data-independent
        mask = pc.fill_null(pc.equal(tbl.column(SINK), self.sink), False)
        n = tbl.num_rows
        src = get_column(tbl, self.source)
        if src is None:
            src = pa.nulls(n, pa.string())
        flags = get_column(tbl, FLAGS)
        if flags is None:
            flags = pa.nulls(n, pa.string())
        msg = pc.if_else(mask, src, pa.nulls(n, pa.string()))
        etype = pc.if_else(mask, "parse_error", pa.nulls(n, pa.string()))
        emsg = pc.if_else(mask, pc.fill_null(flags, ""), pa.nulls(n, pa.string()))
        tbl = set_column(tbl, "message", msg)
        tbl = set_column(tbl, "error.type", etype)
        tbl = set_column(tbl, "error.message", emsg)
        return tbl

    __call__ = apply


class Pipeline:
    """Compiled pipeline. Config keys:

    ``processors`` (pre-enrich chain), ``enrich`` (side-table lookup),
    ``post_processors``, ``router`` (rules/default/dead_letter/
    sink_indexes), ``dead_letter_rewrite`` (bool), ``source_field``,
    plus execution knobs ``batch_size``, ``enrich_concurrency``.
    """

    def __init__(self, config: dict):
        self.config = config
        self.chain = build_chain(config.get("processors", []))
        self.post_chain = build_chain(config.get("post_processors", []))
        router_cfg = config.get("router")
        self.router = Router(**router_cfg) if router_cfg else None
        self.dead_letter_sink = (router_cfg or {}).get("dead_letter",
                                                       "dead_letter")
        self.rewrite = (DeadLetterRewrite(self.dead_letter_sink,
                                          config.get("source_field", "text"))
                        if config.get("dead_letter_rewrite") else None)
        self.enrich_cfg = config.get("enrich")
        self.batch_size = config.get("batch_size")  # None = whole block
        self.enrich_concurrency = config.get("enrich_concurrency", 4)
        self._enrich_ref = None
        self._enricher = None
        # materialize the side table ONCE at construction (generator rows
        # would be consumed by the first build; partition threads call
        # build() concurrently)
        self._enrich_side = None
        if self.enrich_cfg:
            rows = self.enrich_cfg.get("rows")
            self._enrich_side = (rows if isinstance(rows, pa.Table)
                                 else pa.Table.from_pylist(list(rows)))
        import threading
        self._enrich_lock = threading.Lock()

    @classmethod
    def from_yaml(cls, path_or_text: str) -> "Pipeline":
        import yaml
        if os.path.exists(path_or_text):
            with open(path_or_text) as f:
                cfg = yaml.safe_load(f)
        else:
            cfg = yaml.safe_load(path_or_text)
        return cls(cfg)

    # ------------------------------------------------------------- plan
    def _tail_stage(self):
        post, router, rewrite = self.post_chain, self.router, self.rewrite

        def tail(tbl: pa.Table) -> pa.Table:
            tbl = post(tbl)
            if router is not None:
                tbl = router.apply(tbl)
                if rewrite is not None:
                    tbl = rewrite.apply(tbl)
            return tbl
        return tail

    def build(self, ds):
        """Attach all pipeline stages to a Dataset (lazy)."""
        chain = self.chain
        if chain.processors:
            ds = ds.map_batches(chain, batch_format="pyarrow",
                                batch_size=self.batch_size,
                                zero_copy_batch=True)
        if self.enrich_cfg:
            cfg = dict(self.enrich_cfg)
            cfg.pop("rows", None)
            concurrency = cfg.pop("concurrency", self.enrich_concurrency)
            side = self._enrich_side
            mode = cfg.pop("mode",
                           "tasks" if side.num_rows <= 100_000 else "actors")
            if mode == "tasks":
                # small side table: build the index once on the driver and
                # ship the enricher inside the fused task stage (no actor
                # pool spin-up; the stage fuses with its neighbors)
                with self._enrich_lock:
                    if self._enricher is None:
                        self._enricher = Enricher(rows=side, **cfg)
                ds = ds.map_batches(self._enricher, batch_format="pyarrow",
                                    batch_size=self.batch_size,
                                    zero_copy_batch=True)
            else:
                # big side table: broadcast ONCE via the object store; each
                # actor fetches zero-copy and builds its index in __init__
                import ray
                with self._enrich_lock:
                    if self._enrich_ref is None:
                        self._enrich_ref = ray.put(side)
                ds = ds.map_batches(Enricher, batch_format="pyarrow",
                                    batch_size=self.batch_size,
                                    zero_copy_batch=True,
                                    concurrency=(1, concurrency),
                                    fn_constructor_kwargs={
                                        "table_ref": self._enrich_ref, **cfg})
        if self.post_chain.processors or self.router is not None:
            ds = ds.map_batches(self._tail_stage(), batch_format="pyarrow",
                                batch_size=self.batch_size,
                                zero_copy_batch=True)
        return ds

    # -------------------------------------------------------- aggregates
    def counts_by_sink(self, ds) -> dict[str, int]:
        """Exact per-sink tallies (the reference's per-output
        ``events.acked`` counters). Pre-aggregated per batch inside
        ``map_batches`` so the final groupby shuffles one tiny row per
        (batch, sink) instead of every event."""

        def partial(tbl: pa.Table) -> pa.Table:
            if tbl.num_rows == 0:
                return pa.table({SINK: pa.array([], pa.string()),
                                 "n": pa.array([], pa.int64())})
            # count_all, not (SINK, "count"): the latter counts non-null
            # values and would report a null-sink group as 0
            counts = tbl.group_by(SINK).aggregate([([], "count_all")])
            return pa.table({SINK: counts.column(SINK),
                             "n": counts.column("count_all")})

        small = ds.map_batches(partial, batch_format="pyarrow")
        # the partials are a handful of rows per batch — combine on the
        # driver with one vectorized arrow group_by instead of paying a
        # distributed shuffle for a few hundred rows
        parts = pa.concat_tables(
            list(small.iter_batches(batch_size=None, batch_format="pyarrow"))
            or [pa.table({SINK: pa.array([], pa.string()),
                          "n": pa.array([], pa.int64())})])
        agg = parts.group_by(SINK).aggregate([("n", "sum")])
        return dict(zip(agg.column(SINK).to_pylist(),
                        agg.column("n_sum").to_pylist()))

    # --------------------------------------------------------------- run
    def run(self, input_paths, out_dir: str, partitions: int | None = None,
            resume: bool = True,
            partition_parallelism: int | None = None,
            coalesce_runs: int = 1) -> dict:
        """Checkpointed execution: partition the input file list, process
        each unfinished partition as its own (internally parallel) Dataset,
        write per-sink Parquet with write-audit-publish, publish a manifest
        per partition, and return a job report.

        ``partition_parallelism`` driver threads overlap partition
        executions (Ray schedules their tasks on one shared CPU pool), so
        per-partition fixed costs amortize; manifests still publish
        per-partition, preserving resume granularity.

        ``coalesce_runs`` > 1 combines that many partitions into ONE
        spanning Dataset execution (each branch tagged with its partition
        id, one partitioned write, then per-partition swap + manifest
        publish). This pays the per-execution fixed cost (plan build,
        executor start/stop) once per GROUP — the knob that recovers
        high-core-count efficiency — at the price of coarser mid-run
        resume granularity: a kill during a group re-runs the whole
        group (finished groups still skip)."""
        import ray.data as rd

        from .state.manifest import CheckpointManifest, stage_and_swap

        _settle_fsspec_http_import()
        source_cfg = dict(self.config.get("source") or {"type": "parquet"})
        source_type = source_cfg.pop("type", "parquet")
        if isinstance(input_paths, str):
            pattern = ("*.parquet" if source_type == "parquet" else "*")
            input_paths = sorted(glob_mod.glob(os.path.join(input_paths,
                                                            pattern)) or
                                 glob_mod.glob(input_paths))
        if not input_paths:
            raise ConfigError("pipeline.run: no input files")
        if partitions is None:
            partitions = min(len(input_paths), 16)
        groups: list[list[str]] = [[] for _ in range(partitions)]
        for i, p in enumerate(input_paths):
            groups[i % partitions].append(p)
        groups = [g for g in groups if g]

        manifest = CheckpointManifest(out_dir)
        done = manifest.done() if resume else set()
        report = {"partitions_total": len(groups),
                  "partitions_skipped": 0, "partitions_run": 0,
                  "pipeline.events.total": 0,
                  "pipeline.events.published": 0,
                  "pipeline.events.dropped": 0,
                  "per_sink": {}, "elapsed_sec": 0.0}
        t0 = time.monotonic()

        def read_source(files: list[str]):
            """Partition reader per configured source type: parquet rows
            (default), raw log lines, or NDJSON (the harvester path)."""
            if source_type == "parquet":
                # keep at least one block per input file: Ray merges small
                # files into one 128MB block, which would serialize the
                # chain within a partition (irrelevant at 100 TB, decisive
                # on small benches)
                return rd.read_parquet(files,
                                       override_num_blocks=len(files))
            from .sources import read_log_lines, read_ndjson
            if source_type == "log_lines":
                return read_log_lines(files, **source_cfg)
            if source_type == "ndjson":
                return read_ndjson(files, **source_cfg)
            raise ConfigError(f"unknown source type {source_type!r}")

        def count_input_rows(files: list[str]) -> int:
            if source_type == "parquet":
                return sum(pq.read_metadata(f).num_rows for f in files)
            # log sources: count line terminators in fixed-size chunks
            # (never the whole file in driver memory)
            n = 0
            for f in files:
                last = b""
                empty = True
                with open(f, "rb") as fh:
                    while chunk := fh.read(1 << 22):
                        empty = False
                        n += chunk.count(b"\n")
                        last = chunk[-1:]
                if not empty and last != b"\n":
                    n += 1
            return n

        def run_partition(pid_num: int, files: list[str]) -> dict:
            pid = f"{pid_num:05d}"
            t_part = time.monotonic()
            part_dir = os.path.join(out_dir, f"part={pid}")
            in_rows = count_input_rows(files)
            ds = self.build(read_source(files))
            if self.router is None:
                # no router → no sink column; synthesize a constant one so
                # the partitioned write (and per-sink counts) still work
                ds = ds.map_batches(_ensure_sink, batch_format="pyarrow")
            sort_cols = self.config.get("sort_output")
            if sort_cols:
                # stable (conv_id, turn_idx) order within the partition
                # before write (never a global sort — SURVEY §4 ordering)
                ds = ds.sort(list(sort_cols))
            stage_and_swap(part_dir,
                           lambda staging: ds.write_parquet(
                               staging, partition_cols=[SINK]))
            sink_counts = _scan_partition_counts(part_dir)
            published = sum(sink_counts.values())
            payload = {
                "input_files": files,
                "input_rows": in_rows,
                "per_sink": sink_counts,
                "pipeline.events.total": in_rows,
                "pipeline.events.published": published,
                "pipeline.events.dropped": in_rows - published,
                "output_dir": part_dir,
                "elapsed_sec": round(time.monotonic() - t_part, 3),
                "rows_per_sec": round(in_rows /
                                      max(1e-9,
                                          time.monotonic() - t_part)),
            }
            manifest.publish(pid, payload)
            return payload

        def run_partition_group(items: list[tuple[int, list[str]]]) \
                -> list[dict]:
            """One spanning Dataset over several partitions: build each
            branch, tag it with its pid AFTER the chain (a config's
            drop/include_fields must not eat the lane column), union,
            ONE partitioned write into a group staging dir, then swap +
            publish every partition individually."""
            t_grp = time.monotonic()
            in_rows = {f"{p:05d}": count_input_rows(f) for p, f in items}
            if source_type == "parquet":
                # ONE read over the whole group with per-file provenance:
                # a single fused plan (read→chain→enrich→route→write)
                # pipelines far better than a union of per-partition
                # branches. The lane id derives from the source path
                # before the chain — a config that drops unknown columns
                # must preserve "part" (documented coalesce requirement).
                all_files = [f for _, fs in items for f in fs]
                # keyed by the VERBATIM input path — basenames collide
                # across dirs, and Ray's include_paths echoes the input
                # string as-is (absolutizing here would break relative
                # inputs)
                path_pid = {f: f"{p:05d}" for p, fs in items for f in fs}
                pid_keys = pa.array(sorted(path_pid), pa.string())
                pid_vals = pa.array([path_pid[k]
                                     for k in sorted(path_pid)], pa.string())

                def derive_part(tbl: pa.Table) -> pa.Table:
                    idx = pc.index_in(tbl.column("path"),
                                      value_set=pid_keys)
                    if pc.any(pc.is_null(idx)).as_py():
                        seen = set(tbl.column("path").to_pylist())
                        raise RuntimeError(
                            "coalesced run: reader path does not match "
                            f"planned input paths (sample: "
                            f"{sorted(seen)[:2]})")
                    return tbl.drop_columns(["path"]).append_column(
                        "part", pc.take(pid_vals, idx))

                raw = rd.read_parquet(all_files, include_paths=True,
                                      override_num_blocks=len(all_files))
                ds = self.build(raw.map_batches(derive_part,
                                                batch_format="pyarrow"))
                if self.router is None:
                    ds = ds.map_batches(_ensure_sink,
                                        batch_format="pyarrow")
            else:
                branches = []
                for pid_num, files in items:
                    pid = f"{pid_num:05d}"
                    b = self.build(read_source(files))

                    def tag(tbl: pa.Table, pid=pid) -> pa.Table:
                        tbl = _ensure_sink(tbl)
                        return tbl.append_column(
                            "part", pa.array([pid] * tbl.num_rows,
                                             pa.string()))
                    branches.append(b.map_batches(tag,
                                                  batch_format="pyarrow"))
                ds = branches[0]
                for b in branches[1:]:
                    ds = ds.union(b)
            sort_cols = self.config.get("sort_output")
            if sort_cols:
                ds = ds.sort(["part"] + list(sort_cols))
            gid = f"{items[0][0]:05d}"
            staging = os.path.join(out_dir, f"_group_{gid}.staging")
            import shutil
            shutil.rmtree(staging, ignore_errors=True)
            ds.write_parquet(staging, partition_cols=["part", SINK])
            elapsed = round(time.monotonic() - t_grp, 3)
            payloads = []
            for pid_num, files in items:
                pid = f"{pid_num:05d}"
                part_dir = os.path.join(out_dir, f"part={pid}")
                src = os.path.join(staging, f"part={pid}")
                os.makedirs(src, exist_ok=True)  # all-dropped partition
                if os.path.exists(part_dir):
                    shutil.rmtree(part_dir)
                os.replace(src, part_dir)
                sink_counts = _scan_partition_counts(part_dir)
                published = sum(sink_counts.values())
                rows = in_rows[pid]
                payload = {
                    "input_files": files,
                    "input_rows": rows,
                    "per_sink": sink_counts,
                    "pipeline.events.total": rows,
                    "pipeline.events.published": published,
                    "pipeline.events.dropped": rows - published,
                    "output_dir": part_dir,
                    "coalesced_group": gid,
                    "elapsed_sec": elapsed,
                }
                manifest.publish(pid, payload)
                payloads.append(payload)
            shutil.rmtree(staging, ignore_errors=True)
            return payloads

        todo = []
        for pid_num, files in enumerate(groups):
            pid = f"{pid_num:05d}"
            if pid in done:
                report["partitions_skipped"] += 1
                self._fold_counts(report, manifest.read(pid))
            else:
                todo.append((pid_num, files))
        failures: list[tuple[str, str]] = []

        def attempt(pid_num: int, files: list[str]):
            try:
                return run_partition(pid_num, files)
            except Exception as e:  # isolate: other partitions proceed,
                failures.append((f"{pid_num:05d}", repr(e)))
                return None

        def attempt_group(items: list[tuple[int, list[str]]]):
            try:
                return run_partition_group(items)
            except Exception as e:  # the whole group fails together
                failures.extend((f"{p:05d}", repr(e)) for p, _ in items)
                return None

        results: list[dict | None] = []
        if coalesce_runs > 1 and len(todo) > 1:
            batches = [todo[i:i + coalesce_runs]
                       for i in range(0, len(todo), coalesce_runs)]
            workers = partition_parallelism or min(4, max(1, len(batches)))
            if workers <= 1 or len(batches) <= 1:
                grouped = [attempt_group(b) for b in batches]
            else:
                from concurrent.futures import ThreadPoolExecutor
                with ThreadPoolExecutor(max_workers=workers) as pool:
                    futs = [pool.submit(attempt_group, b) for b in batches]
                    grouped = [fut.result() for fut in futs]
            for g in grouped:
                results.extend(g or [])
        else:
            workers = partition_parallelism or min(4, max(1, len(todo)))
            if workers <= 1 or len(todo) <= 1:
                results = [attempt(p, f) for p, f in todo]
            else:
                from concurrent.futures import ThreadPoolExecutor
                with ThreadPoolExecutor(max_workers=workers) as pool:
                    futs = [pool.submit(attempt, p, f) for p, f in todo]
                    results = [fut.result() for fut in futs]
        for payload in results:
            if payload is not None:
                self._fold_counts(report, payload)
                report["partitions_run"] += 1
        report["elapsed_sec"] = time.monotonic() - t0
        if failures:
            report["failed_partitions"] = failures
        with open(os.path.join(out_dir, "job_report.json"), "w") as f:
            json.dump(report, f, indent=1, sort_keys=True)
        if failures:
            raise RuntimeError(
                f"{len(failures)} partition(s) failed (others completed and "
                f"published; a resumed run retries only the failures): "
                f"{failures}")
        return report

    @staticmethod
    def audit(out_dir: str) -> dict:
        """The audit half of write-audit-publish: re-derive per-sink row
        counts from the published Parquet footers and compare with every
        partition manifest. Returns {partitions, ok, mismatches}."""
        from .state.manifest import CheckpointManifest
        manifest = CheckpointManifest(out_dir)
        mismatches = []
        n = 0
        for pid, payload in manifest.read_all().items():
            n += 1
            actual = _scan_partition_counts(
                os.path.join(out_dir, f"part={pid}"))
            if actual != payload.get("per_sink", {}):
                mismatches.append({"partition": pid,
                                   "manifest": payload.get("per_sink"),
                                   "actual": actual})
        return {"partitions": n, "ok": not mismatches,
                "mismatches": mismatches}

    @staticmethod
    def compact(out_dir: str, *, small_file_bytes: int = 32 << 20) -> dict:
        """Small-file compaction over a PUBLISHED sink tree — the
        maintenance job a long-running 100-TB ingest needs once many
        resumed partitions have left multi-fragment sink directories
        (tiny Parquet files dominate open/footer cost on later scans).

        Per (partition, sink) directory whose fragments are ALL below
        ``small_file_bytes``, the fragments are rewritten into one file
        through the same write-audit-publish contract as the original
        write: rows are verified against the partition manifest BEFORE
        the swap (a count mismatch refuses the directory — compaction
        never "fixes" a corrupt partition silently), the staging
        directory swaps in atomically (`stage_and_swap`), and the
        manifest is republished with a compaction stamp. A kill at any
        point leaves either the old fragments or the swapped file —
        both audit-clean — and a re-run skips single-file directories,
        so the job is idempotent and resumable like the pipeline
        itself (registrar semantics, filebeat/registrar/registrar.go:194-214).

        Raw Ray tasks, deliberately: each unit is an atomic
        filesystem rewrite of one directory — per-directory
        parallelism with no dataset semantics, the documented
        raw-task case. Assumes the sink tree is on storage shared
        with the workers (same assumption the writer makes)."""
        import ray

        from .state.manifest import CheckpointManifest

        manifest = CheckpointManifest(out_dir)

        @ray.remote(num_cpus=1)
        def compact_dir(sink_dir: str, expected_rows: int) -> dict:
            staging, old = sink_dir + ".staging", sink_dir + ".old"
            # recovery from a kill in a previous run, in swap order:
            # .old + missing final → restore the fragments; .old with
            # the final present → the swap completed, drop the backup;
            # any .staging is a partial write — always discard
            if os.path.exists(old):
                if not os.path.exists(sink_dir):
                    os.rename(old, sink_dir)
                else:
                    shutil.rmtree(old)
            if os.path.exists(staging):
                shutil.rmtree(staging)
            if not os.path.isdir(sink_dir):
                return {"action": "refused",
                        "manifest_rows": expected_rows,
                        "actual_rows": 0,
                        "error": "sink directory missing"}
            files = sorted(glob_mod.glob(
                os.path.join(sink_dir, "*.parquet")))
            if len(files) <= 1:
                return {"action": "noop", "files": len(files)}
            if any(os.path.getsize(f) > small_file_bytes
                   for f in files):
                return {"action": "skip_large", "files": len(files)}
            before = sum(pq.read_metadata(f).num_rows for f in files)
            if before != expected_rows:
                return {"action": "refused",
                        "manifest_rows": expected_rows,
                        "actual_rows": before}
            tbl = pa.concat_tables([pq.read_table(f) for f in files],
                                   promote_options="default")
            os.makedirs(staging)
            pq.write_table(
                tbl, os.path.join(staging, "compacted-0.parquet"))
            # backup-swap, never a destructive window: the published
            # fragments move ASIDE (rename, not rmtree) before the
            # compacted dir takes their place, so a kill at any point
            # leaves the rows on disk and the recovery above restores
            os.rename(sink_dir, old)
            os.rename(staging, sink_dir)
            shutil.rmtree(old)
            after = sum(
                pq.read_metadata(f).num_rows for f in glob_mod.glob(
                    os.path.join(sink_dir, "*.parquet")))
            if after != before:  # pragma: no cover - audit backstop
                raise RuntimeError(
                    f"compaction row drift in {sink_dir}: "
                    f"{before} -> {after}")
            return {"action": "compacted", "files_before": len(files),
                    "rows": after}

        tasks, meta = [], []
        report = {"directories": 0, "compacted": 0, "noop": 0,
                  "skip_large": 0, "refused": [], "failed": []}
        for pid in sorted(manifest.done()):
            per_sink = manifest.read(pid).get("per_sink", {})
            part_dir = os.path.join(out_dir, f"part={pid}")
            # manifest-driven: every sink the manifest accounts for is
            # a candidate EVEN if its directory is currently renamed
            # aside by an interrupted swap (the task's recovery path
            # restores it); an on-disk sink dir the manifest does NOT
            # know is refused untouched
            for sink in sorted(per_sink):
                tasks.append(compact_dir.remote(
                    os.path.join(part_dir, f"{SINK}={sink}"),
                    per_sink[sink]))
                meta.append((pid, sink))
            for sink_dir in sorted(glob_mod.glob(
                    os.path.join(part_dir, f"{SINK}=*"))):
                if sink_dir.endswith((".staging", ".old")):
                    continue
                sink = os.path.basename(sink_dir).split("=", 1)[1]
                if sink not in per_sink:
                    report["refused"].append(
                        {"partition": pid, "sink": sink,
                         "action": "refused_unknown_sink"})

        report["directories"] = len(tasks)
        stamped: dict[str, dict] = {}
        for (pid, sink), ref in zip(meta, tasks):
            # per-task gather: one failing directory must not discard
            # the report (or the manifest stamps) of the ones that
            # already swapped — Pipeline.run's partial-failure stance
            try:
                res = ray.get(ref)
            except Exception as exc:  # noqa: BLE001 - surfaced in report
                report["failed"].append(
                    {"partition": pid, "sink": sink,
                     "error": repr(exc)})
                continue
            act = res["action"]
            if act == "compacted":
                report["compacted"] += 1
                stamped.setdefault(pid, {})[sink] = {
                    "files_before": res["files_before"],
                    "files_after": 1, "rows": res["rows"]}
            elif act == "refused":
                report["refused"].append(
                    {"partition": pid, "sink": sink, **res})
            else:
                report[act if act in report else "noop"] += 1
        for pid, sinks in stamped.items():
            payload = manifest.read(pid)
            payload.setdefault("compaction", {}).update(sinks)
            payload["compacted_unix"] = time.time()
            manifest.publish(pid, payload)
        return report

    @staticmethod
    def _fold_counts(report: dict, payload: dict) -> None:
        for k in ("pipeline.events.total", "pipeline.events.published",
                  "pipeline.events.dropped"):
            report[k] += payload.get(k, 0)
        for sink, n in payload.get("per_sink", {}).items():
            report["per_sink"][sink] = report["per_sink"].get(sink, 0) + n


def _ensure_sink(tbl: pa.Table, sink: str = "default") -> pa.Table:
    """Synthesize a constant sink lane when no router produced one."""
    if SINK in tbl.column_names:
        return tbl
    return tbl.append_column(SINK, pa.array([sink] * tbl.num_rows,
                                            pa.string()))


def _settle_fsspec_http_import() -> None:
    """Ray's path resolution retries ``from fsspec.implementations.http
    import HTTPFileSystem`` on every call; with aiohttp absent the import
    fails each time and concurrent partition threads can race the import
    machinery (plain ImportError escapes Ray's ModuleNotFoundError
    handler). Register a sentinel module once so the lookup settles."""
    try:
        import fsspec.implementations.http  # noqa: F401
    except ImportError:
        import sys
        import types

        mod = types.ModuleType("fsspec.implementations.http")

        class HTTPFileSystem:  # sentinel — never instantiated offline
            def __init__(self, *a, **k):
                raise ImportError("aiohttp missing: HTTP filesystem "
                                  "unavailable in this environment")

        mod.HTTPFileSystem = HTTPFileSystem
        sys.modules["fsspec.implementations.http"] = mod


def _scan_partition_counts(part_dir: str) -> dict[str, int]:
    """Per-sink row counts from written Parquet footers (no data read)."""
    out: dict[str, int] = {}
    for sink_dir in sorted(glob_mod.glob(os.path.join(part_dir, f"{SINK}=*"))):
        sink = os.path.basename(sink_dir).split("=", 1)[1]
        n = 0
        for f in glob_mod.glob(os.path.join(sink_dir, "*.parquet")):
            n += pq.read_metadata(f).num_rows
        out[sink] = n
    return out
