"""Replicate the driver's correctness gate locally.

Runs every ``queries()`` entry that has an ``oracle_sql()`` entry at a
given scale factor (default sf0.01 — the driver's compare scale), and
checks the three driver criteria plus a STRICTER dtype check:

* row count match
* schema match — column NAMES (driver sorts columns by name) AND exact
  arrow types (int64 vs decimal128, timestamp[s] vs [us] break the
  driver's value hash, so we fail them here first)
* value match — rows sorted by all columns, compared exactly
  (order-insensitive, like the driver's sorted value hash)

Usage::

    python scripts/gate.py [sf_dir] [query ...]

With no query names, runs all oracled queries. Exits non-zero on any
mismatch. Owns its Ray session (script entry point, not library code).
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import duckdb
import pyarrow as pa

TABLES = ("region nation customer supplier part orders lineitem "
          "events documents embeddings").split()


def to_arrow(res) -> pa.Table:
    import pandas as pd
    import ray.data
    if isinstance(res, ray.data.Dataset):
        batches = list(res.iter_batches(batch_size=None, batch_format="pyarrow"))
        if not batches:
            return pa.table({})
        return pa.concat_tables(batches, promote_options="default")
    if isinstance(res, pd.DataFrame):
        return pa.Table.from_pandas(res, preserve_index=False)
    return res


def compare(name: str, ours: pa.Table, theirs: pa.Table) -> list[str]:
    errs = []
    if ours.num_rows != theirs.num_rows:
        errs.append(f"rows {ours.num_rows} vs oracle {theirs.num_rows}")
    ours = ours.select(sorted(ours.column_names))
    theirs = theirs.select(sorted(theirs.column_names))
    if ours.column_names != theirs.column_names:
        errs.append(f"cols {ours.column_names} vs {theirs.column_names}")
        return errs
    for c in ours.column_names:
        if ours.schema.field(c).type != theirs.schema.field(c).type:
            errs.append(f"dtype[{c}] {ours.schema.field(c).type} vs "
                        f"{theirs.schema.field(c).type}")
    if errs:
        return errs
    keys = ours.column_names
    if keys:
        sort_keys = [(k, "ascending") for k in keys]
        o = ours.sort_by(sort_keys)
        t = theirs.sort_by(sort_keys)
        if not o.equals(t):
            for c in keys:
                if not o.column(c).equals(t.column(c)):
                    ov, tv = o.column(c).to_pylist(), t.column(c).to_pylist()
                    bad = next((i for i, (x, y) in enumerate(zip(ov, tv))
                                if x != y), None)
                    errs.append(
                        f"values[{c}] differ at sorted row {bad}: "
                        f"{ov[bad] if bad is not None else '?'} vs "
                        f"{tv[bad] if bad is not None else '?'}")
    return errs


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 and "/" in sys.argv[1] \
        else "/root/testdata/sf0.01"
    only = [a for a in sys.argv[1:] if "/" not in a]

    import ray
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=32, include_dashboard=False,
                 logging_level="ERROR")
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False

    import __ray_entry__ as entry
    queries, oracles = entry.queries(), entry.oracle_sql()

    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM "
                f"read_parquet('{sf_dir}/{t}.parquet')")

    failed, ran, skipped = [], 0, 0
    for name, fn in queries.items():
        if only and name not in only:
            continue
        if name not in oracles:
            skipped += 1
            continue
        ran += 1
        try:
            ours = to_arrow(fn(sf_dir))
            theirs = con.sql(oracles[name]).arrow()
            errs = compare(name, ours, theirs)
        except Exception as exc:  # noqa: BLE001 — report, keep going
            errs = [f"EXCEPTION {type(exc).__name__}: {exc}"]
        if errs:
            failed.append(name)
            print(f"FAIL {name}: " + "; ".join(errs), flush=True)
        else:
            print(f"ok   {name} ({ours.num_rows} rows)", flush=True)
    print(f"\n{ran - len(failed)}/{ran} oracled queries green "
          f"({skipped} rows-only skipped) at {sf_dir}")
    ray.shutdown()
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main())
