"""``timestamp`` processor (reference ``libbeat/processors/timestamp/``):
parse a string field with a layout fallback chain into a timestamp column
(UTC). Go reference-time layouts are translated to strftime; ``UNIX`` and
``UNIX_MS`` numeric layouts supported. Arrow's strptime has no ``%f``, so
fractional seconds are split off and re-added as microseconds."""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from ..errors import ConfigError
from . import Processor, add_flag, get_column, register, set_column

# Go reference-time tokens -> strftime; longer tokens MUST precede their
# prefixes/substrings (January before Jan, 2006 before 06 before single
# digits). Bare single-digit tokens are translated last and are inherently
# ambiguous with literal digits — Go's own parser has positional context we
# approximate.
_GO_TOKENS = [
    ("January", "%B"), ("Jan", "%b"), ("Monday", "%A"), ("Mon", "%a"),
    ("2006", "%Y"),
    ("01", "%m"), ("02", "%d"), ("_2", "%d"), ("15", "%H"), ("04", "%M"),
    ("05", "%S"), ("06", "%y"),
    ("Z07:00", "%z"), ("Z0700", "%z"), ("-07:00", "%z"), ("-0700", "%z"),
    ("MST", "%Z"),
    ("PM", "%p"), ("pm", "%p"),
    ("3", "%I"), ("4", "%M"), ("5", "%S"), ("2", "%d"), ("1", "%m"),
]


def go_layout_to_strftime(layout: str) -> str:
    if "%" in layout:
        return layout  # already strftime
    out = layout
    # fractional seconds: .000... / .999...
    import re
    out = re.sub(r"\.(0+|9+)", ".%f", out)
    for go, st in _GO_TOKENS:
        out = out.replace(go, st)
    # a Go token that survived translation (e.g. a zone form this table
    # lacks) would silently null every row — fail at construction instead
    if re.search(r"2006|Jan|Mon|MST|Z07", out):
        raise ConfigError(
            f"timestamp: layout {layout!r} has untranslated Go tokens "
            f"(translated: {out!r})")
    return out


def _strptime_with_fraction(col: pa.Array, layout: str) -> pa.Array:
    """Arrow strptime cannot parse %f: strip the fraction from the input,
    parse the base, and add the fraction back as microseconds."""
    if "%f" not in layout:
        return pc.cast(pc.strptime(col, format=layout, unit="us",
                                   error_is_null=True),
                       pa.timestamp("us"))
    base_fmt = layout.replace(".%f", "")
    frac = pc.extract_regex(col, r"\.(?P<f>\d+)")
    digits = pc.if_else(pc.is_valid(frac),
                        frac.field("f") if not isinstance(frac, pa.ChunkedArray)
                        else frac.combine_chunks().field("f"),
                        "0")
    # normalize to exactly 6 digits (pad right, truncate)
    digits = pc.utf8_slice_codeunits(
        pc.binary_join_element_wise(digits, "000000", ""), 0, 6)
    micros = pc.cast(digits, pa.int64())
    stripped = pc.replace_substring_regex(col, r"\.\d+", "")
    base = pc.cast(pc.strptime(stripped, format=base_fmt, unit="us",
                               error_is_null=True),
                   pa.timestamp("us"))
    shifted = pc.add(pc.cast(base, pa.int64()), micros)
    return pc.if_else(pc.is_valid(base),
                      pc.cast(shifted, pa.timestamp("us")),
                      pa.nulls(len(col), pa.timestamp("us")))


@register("timestamp")
class Timestamp(Processor):
    def __init__(self, field: str, layouts: list[str],
                 target_field: str = "ts", timezone: str = "UTC",
                 ignore_missing: bool = False, ignore_failure: bool = True,
                 test: list[str] | None = None):
        self.field = field
        self.layouts = [go_layout_to_strftime(x) for x in
                        ([layouts] if isinstance(layouts, str) else layouts)]
        self.target = target_field
        self.ignore_missing = ignore_missing
        self.ignore_failure = ignore_failure
        # timezone config (timestamp/config.go): naive layouts are
        # interpreted in this zone and normalized to UTC. IANA names go
        # through arrow's assume_timezone (DST-correct, vectorized);
        # fixed ±HH:MM offsets are applied arithmetically ("Local" is
        # UTC in this engine — a cluster has no meaningful local zone).
        import re
        tz = timezone or "UTC"
        self.tz_name: str | None = None
        self.tz_offset_us: int | None = None
        if tz not in ("UTC", "Etc/UTC", "Local"):
            m = re.fullmatch(r"([+-])(\d{2}):?(\d{2})", tz)
            if m:
                sign = 1 if m.group(1) == "+" else -1
                self.tz_offset_us = sign * 1_000_000 * (
                    int(m.group(2)) * 3600 + int(m.group(3)) * 60)
            else:
                try:
                    # non-empty probe: arrow defers tz-db lookup on
                    # empty input, so an empty array never raises
                    pc.assume_timezone(pa.array([0], pa.timestamp("us")),
                                       timezone=tz)
                except (pa.ArrowInvalid, pa.ArrowNotImplementedError):
                    raise ConfigError(
                        f"timestamp: unknown timezone {tz!r}")
                self.tz_name = tz
        if test:
            probe = pa.array(test, pa.string())
            parsed, _ = self._parse(probe)
            if parsed.null_count:
                raise ConfigError(f"timestamp: test values failed: {test}")

    def _localize(self, cand: pa.Array) -> pa.Array:
        """Interpret a naive parse in the configured zone → UTC."""
        if self.tz_name:
            aware = pc.assume_timezone(cand, timezone=self.tz_name,
                                       ambiguous="earliest",
                                       nonexistent="earliest")
            return pc.cast(aware, pa.timestamp("us"))
        if self.tz_offset_us is not None:
            shifted = pc.subtract(pc.cast(cand, pa.int64()),
                                  self.tz_offset_us)
            return pc.cast(shifted, pa.timestamp("us"))
        return cand

    def _parse(self, col: pa.Array):
        result = pa.nulls(len(col), pa.timestamp("us"))
        for layout in self.layouts:
            if layout in ("UNIX", "UNIX_MS"):
                unit = 1_000_000 if layout == "UNIX" else 1_000
                try:
                    numeric = pc.match_substring_regex(
                        col, r"^-?\d+(\.\d+)?([eE][+-]?\d+)?$")
                    clean = pc.if_else(pc.fill_null(numeric, False), col,
                                       pa.nulls(len(col), pa.string()))
                    num = pc.cast(clean, pa.float64())
                    # fractional epochs are the norm: round to whole µs
                    # (Go time.Unix keeps the fraction too)
                    cand = pc.cast(
                        pc.cast(pc.round(pc.multiply(num, float(unit))),
                                pa.int64(), safe=False),
                        pa.timestamp("us"))
                except (pa.ArrowInvalid, pa.ArrowNotImplementedError):
                    continue
            else:
                try:
                    cand = _strptime_with_fraction(col, layout)
                except (pa.ArrowInvalid, pa.ArrowNotImplementedError):
                    continue
                if "%z" not in layout and "%Z" not in layout:
                    cand = self._localize(cand)
            result = pc.if_else(pc.is_valid(result), result, cand)
            if result.null_count == 0:
                break
        ok = pc.or_(pc.is_valid(result), pc.is_null(col))
        return result, ok

    def apply(self, tbl: pa.Table) -> pa.Table:
        col = get_column(tbl, self.field)
        if col is None:
            if self.ignore_missing:
                return tbl
            raise ConfigError(f"timestamp: missing {self.field!r}")
        parsed, ok = self._parse(pc.cast(col, pa.string()))
        n_bad = tbl.num_rows - pc.sum(pc.cast(ok, pa.int64())).as_py() \
            if tbl.num_rows else 0
        if n_bad and not self.ignore_failure:
            # reference semantics: a failing parse errors the event chain;
            # the batch-engine equivalent of abort is raising (the task
            # fails loudly rather than silently tolerating)
            raise ValueError(
                f"timestamp: {n_bad} value(s) failed to parse with layouts "
                f"{self.layouts} (ignore_failure=false)")
        if self.target in tbl.column_names:
            old = get_column(tbl, self.target)
            if old.type == parsed.type:
                parsed = pc.if_else(pc.is_valid(parsed), parsed, old)
        tbl = set_column(tbl, self.target, parsed)
        return add_flag(tbl, pc.invert(ok), "timestamp_parse_error")
