"""``fingerprint`` processor (reference ``libbeat/processors/fingerprint/``).

Byte-exact serialization with the reference: fields sorted, each present
field contributes ``|key|value`` (Go ``%v`` formatting), with a trailing
``|``; the digest of that byte string is encoded (hex/base32/base64) into
``target_field`` (default ``fingerprint``). Exact for string / int / bool
columns and timestamps (rendered as Go ``time.Time.String()`` UTC); float
rendering follows python's shortest-repr which matches Go ``%v`` for
typical values (documented approximation).

Vectorized: the per-row serialization string is assembled with
``pc.binary_join_element_wise``; only the digest itself is a per-row
hashlib call.
"""

from __future__ import annotations

import base64
import hashlib

import pyarrow as pa
import pyarrow.compute as pc

from ..errors import ConfigError
from . import Processor, get_column, register, set_column

_METHODS = {"md5", "sha1", "sha256", "sha384", "sha512"}

# xxh64 constants (public XXH64 specification)
_P1 = 0x9E3779B185EBCA87
_P2 = 0xC2B2AE3D27D4EB4F
_P3 = 0x165667B19E3779F9
_P4 = 0x85EBCA77C2B2AE63
_P5 = 0x27D4EB2F165667C5
_M64 = 0xFFFFFFFFFFFFFFFF


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M64


def xxh64(data: bytes, seed: int = 0) -> int:
    """Pure-python XXH64 (spec-exact; validated against the public test
    vectors and the reference's fingerprint golden digest) — fallback
    for the absent xxhash wheel. Per-row cost like the hashlib path."""
    data = bytes(data)
    n = len(data)
    i = 0
    if n >= 32:
        v1 = (seed + _P1 + _P2) & _M64
        v2 = (seed + _P2) & _M64
        v3 = seed & _M64
        v4 = (seed - _P1) & _M64
        while i <= n - 32:
            v1 = (_rotl((v1 + int.from_bytes(data[i:i + 8], "little")
                         * _P2) & _M64, 31) * _P1) & _M64
            v2 = (_rotl((v2 + int.from_bytes(data[i + 8:i + 16], "little")
                         * _P2) & _M64, 31) * _P1) & _M64
            v3 = (_rotl((v3 + int.from_bytes(data[i + 16:i + 24], "little")
                         * _P2) & _M64, 31) * _P1) & _M64
            v4 = (_rotl((v4 + int.from_bytes(data[i + 24:i + 32], "little")
                         * _P2) & _M64, 31) * _P1) & _M64
            i += 32
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12)
             + _rotl(v4, 18)) & _M64
        for v in (v1, v2, v3, v4):
            h = ((h ^ ((_rotl((v * _P2) & _M64, 31) * _P1) & _M64))
                 * _P1 + _P4) & _M64
    else:
        h = (seed + _P5) & _M64
    h = (h + n) & _M64
    while i <= n - 8:
        k = int.from_bytes(data[i:i + 8], "little")
        h = (h ^ ((_rotl((k * _P2) & _M64, 31) * _P1) & _M64)) & _M64
        h = (_rotl(h, 27) * _P1 + _P4) & _M64
        i += 8
    if i <= n - 4:
        h = (h ^ (int.from_bytes(data[i:i + 4], "little") * _P1)) & _M64
        h = (_rotl(h, 23) * _P2 + _P3) & _M64
        i += 4
    while i < n:
        h = (h ^ (data[i] * _P5)) & _M64
        h = (_rotl(h, 11) * _P1) & _M64
        i += 1
    h ^= h >> 33
    h = (h * _P2) & _M64
    h ^= h >> 29
    h = (h * _P3) & _M64
    h ^= h >> 32
    return h


def _format_column(col: pa.Array) -> pa.Array:
    t = col.type
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        return col
    if pa.types.is_timestamp(t):
        # Arrow %S includes fractional seconds; Go time.String() prints the
        # fraction only when non-zero, trailing zeros trimmed
        s = pc.strftime(col, format="%Y-%m-%d %H:%M:%S")
        s = pc.replace_substring_regex(s, r"\.(\d*?)0+$", r".\1")
        s = pc.replace_substring_regex(s, r"\.$", "")
        return pc.binary_join_element_wise(s, " +0000 UTC", "")
    if pa.types.is_boolean(t):
        return pc.if_else(col, "true", "false")
    if pa.types.is_floating(t):
        return pa.array([None if v is None else repr(float(v))
                         for v in col.to_pylist()], pa.string())
    return pc.cast(col, pa.string())


@register("fingerprint")
class Fingerprint(Processor):
    def __init__(self, fields: list[str], method: str = "sha256",
                 encoding: str = "hex", target_field: str = "fingerprint",
                 ignore_missing: bool = False):
        if method != "xxhash" and method not in _METHODS:
            raise ConfigError(f"fingerprint: bad method {method!r}")
        if encoding not in ("hex", "base32", "base64"):
            raise ConfigError(f"fingerprint: bad encoding {encoding!r}")
        self.fields = sorted(set(fields))
        self.method = method
        self.encoding = encoding
        self.target = target_field
        self.ignore_missing = ignore_missing

    def _digest(self, data: bytes) -> str:
        if self.method == "xxhash":
            # big-endian digest bytes, matching Sum() of the reference's
            # hash.Hash adapter (fingerprint/hash.go:57)
            raw = xxh64(data).to_bytes(8, "big")
        else:
            raw = hashlib.new(self.method, data).digest()
        if self.encoding == "hex":
            return raw.hex()
        if self.encoding == "base32":
            return base64.b32encode(raw).decode()
        return base64.b64encode(raw).decode()

    def apply(self, tbl: pa.Table) -> pa.Table:
        n = tbl.num_rows
        segments = []
        all_ok = pa.array([True] * n, pa.bool_())
        for f in self.fields:
            col = get_column(tbl, f)
            if col is None:
                if self.ignore_missing:
                    continue
                raise ConfigError(f"fingerprint: missing field {f!r}")
            formatted = _format_column(col)
            seg = pc.binary_join_element_wise(
                "|" + f + "|", formatted, "")
            if self.ignore_missing:
                seg = pc.fill_null(seg, "")
            else:
                all_ok = pc.and_(all_ok, pc.is_valid(col))
            segments.append(seg)
        if segments:
            concat = (pc.binary_join_element_wise(*segments, "")
                      if len(segments) > 1 else segments[0])
            serialized = pc.binary_join_element_wise(concat, "|", "")
        else:
            serialized = pa.array(["|"] * n, pa.string())
        out = self._digest_column(serialized, all_ok)
        return set_column(tbl, self.target, out)

    def _digest_column(self, serialized: pa.Array, all_ok) -> pa.Array:
        """Hash each row's bytes straight out of the Arrow buffer
        (memoryview slices) — no per-row python string materialization in
        the hot loop."""
        import numpy as np
        if isinstance(serialized, pa.ChunkedArray):
            serialized = serialized.combine_chunks()
        serialized = pc.cast(serialized, pa.string())
        if len(serialized) == 0:
            return pa.array([], pa.string())
        bufs = serialized.buffers()
        off0 = serialized.offset
        offsets = np.frombuffer(bufs[1], dtype=np.int32,
                                count=len(serialized) + 1 + off0)[off0:]
        data = memoryview(bufs[2])
        valid = pc.and_(pc.is_valid(serialized), all_ok).to_numpy(
            zero_copy_only=False)
        digest = self._digest
        out = [digest(data[offsets[i]:offsets[i + 1]]) if valid[i] else None
               for i in range(len(serialized))]
        return pa.array(out, pa.string())
