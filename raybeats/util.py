"""Shared small kernels.

pyarrow has no modulo kernel; for NON-NEGATIVE integers truncating
integer divide is exact, which is the only regime these helpers support
(ids/hashes). String bucketing uses crc32 (process-stable, unlike python
``hash``).
"""

from __future__ import annotations

import zlib

import pyarrow as pa
import pyarrow.compute as pc


def imod(col, b: int) -> pa.Array:
    """``col % b`` for non-negative integer columns."""
    c = pc.cast(col, pa.int64())
    return pc.subtract(c, pc.multiply(pc.divide(c, b), b))


def int_bucket(col, n_buckets: int) -> pa.Array:
    """Deterministic bucket id (int32) for a non-negative int column."""
    return pc.cast(imod(col, n_buckets), pa.int32())


def crc32_bucket(col, n_buckets: int) -> pa.Array:
    """Deterministic bucket id (int32) for a string column — crc32, NOT
    python hash() (which is salted per process and would scatter the same
    key across buckets in different workers)."""
    vals = pc.cast(col, pa.string()).to_pylist()
    return pa.array([None if v is None else
                     zlib.crc32(v.encode()) % n_buckets for v in vals],
                    pa.int32())
