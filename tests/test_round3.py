"""Round-3 regression tests (ADVICE findings + verdict items)."""

import numpy as np
import pyarrow as pa
import pytest


def _fnv64(b: bytes) -> int:
    v = 0xCBF29CE484222325
    for byte in b:
        v = ((v ^ byte) * 0x100000001B3) & ((1 << 64) - 1)
    return v


def test_fnv1a_u64_long_row_fallback_is_exact_and_bounded():
    """A degenerate long token must not inflate the padded matrix
    (ADVICE: OOM risk) and must hash to the exact FNV-1a value."""
    from raybeats.util import _FNV64_VEC_MAX_LEN, fnv1a_u64
    vals = ["short", "x" * (_FNV64_VEC_MAX_LEN + 1), "", "y" * 10_000,
            None, "mid" * 100]
    h = fnv1a_u64(pa.array(vals, pa.string()))
    for got, v in zip(h, vals):
        assert int(got) == _fnv64((v or "").encode())


def test_last_terminator_end_multibyte(tmp_path):
    """Multi-byte line terminators ack to the END of the terminator, not
    one byte past its first byte (ADVICE identity.py finding)."""
    from raybeats.sources import identity as ident
    p = tmp_path / "log.txt"
    p.write_bytes(b"line1\r\nline2\r\npartial")
    end = ident._last_terminator_end(str(p), 0, p.stat().st_size, b"\r\n")
    assert end == len(b"line1\r\nline2\r\n")


def test_last_terminator_end_straddles_window(tmp_path, monkeypatch):
    """A terminator straddling the tail-scan window boundary is found."""
    from raybeats.sources import identity as ident
    monkeypatch.setattr(ident, "_TAIL_SCAN", 8)
    # place \r\n so the window boundary falls between \r and \n
    data = b"aaaaaa\r\n" + b"b" * 7  # size 15; windows [7,15) then [0,7+1)
    p = tmp_path / "log.txt"
    p.write_bytes(data)
    end = ident._last_terminator_end(str(p), 0, len(data), b"\r\n")
    assert end == 8


def test_wineventlog_ignore_failure_raises():
    from raybeats.processors import build_processor
    t = pa.table({"message": ["<not-an-event/>"]})
    with pytest.raises(ValueError, match="decode_xml_wineventlog"):
        build_processor({"decode_xml_wineventlog": {}}).apply(t)
    out = build_processor(
        {"decode_xml_wineventlog": {"ignore_failure": True}}).apply(t)
    assert out.column("log_flags").to_pylist()[0] is not None


def test_wineventlog_overwrite_keys_false_preserves_existing():
    from raybeats.processors import build_processor
    xml = ("<Event><System><Channel>Security</Channel>"
           "<Computer>box</Computer></System></Event>")
    t = pa.table({"message": [xml],
                  "winlog.channel": ["pre-existing"]})
    out = build_processor({"decode_xml_wineventlog": {
        "overwrite_keys": False, "ignore_failure": True}}).apply(t)
    assert out.column("winlog.channel").to_pylist() == ["pre-existing"]
    assert out.column("winlog.computer_name").to_pylist() == ["box"]
