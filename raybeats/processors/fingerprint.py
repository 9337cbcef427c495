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
        if method == "xxhash":
            try:
                import xxhash  # noqa: F401
            except ImportError as e:
                raise ConfigError("fingerprint: xxhash unavailable") from e
        elif method not in _METHODS:
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
            import xxhash
            raw = xxhash.xxh64(data).digest()
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
