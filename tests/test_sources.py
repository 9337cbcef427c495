import gzip
import os

import pyarrow as pa
import pytest

from raybeats.processors import build_processor
from raybeats.sources.logfiles import MultilineJoiner, _split_file


def test_split_file_offsets():
    data = b"alpha\nbeta\n\ngamma"
    msgs, offs = _split_file("f", data, "utf-8", b"\n", None)
    assert msgs == ["alpha", "beta", "", "gamma"]
    assert offs == [0, 6, 11, 12]


def test_split_file_crlf_and_trailing_newline():
    msgs, offs = _split_file("f", b"a\r\nb\r\n", "utf-8", b"\n", None)
    assert msgs == ["a", "b"]
    assert offs == [0, 3]


def test_multiline_pattern_after():
    # continuation lines start with whitespace (classic stack trace)
    j = MultilineJoiner(mode="pattern", pattern=r"^\s", match="after")
    msgs, offs = j.join(["err: boom", "  at a()", "  at b()", "ok"],
                        [0, 10, 20, 30])
    assert msgs == ["err: boom\n  at a()\n  at b()", "ok"]
    assert offs == [0, 30]


def test_multiline_pattern_negate_after():
    # lines NOT starting with [ continue the previous event
    j = MultilineJoiner(mode="pattern", pattern=r"^\[", negate=True,
                        match="after")
    msgs, _ = j.join(["[1] start", "cont", "[2] next"], [0, 10, 20])
    assert msgs == ["[1] start\ncont", "[2] next"]


def test_multiline_count():
    j = MultilineJoiner(mode="count", count=2)
    msgs, offs = j.join(["a", "b", "c"], [0, 2, 4])
    assert msgs == ["a\nb", "c"]
    assert offs == [0, 4]


def test_multiline_while_pattern():
    j = MultilineJoiner(mode="while_pattern", pattern=r"^x")
    msgs, _ = j.join(["x1", "x2", "y", "x3"], [0, 3, 6, 8])
    assert msgs == ["x1\nx2", "y", "x3"]


def test_read_log_lines_end_to_end(ray_session, tmp_path):
    from raybeats.sources import read_log_lines

    p1 = tmp_path / "a.log"
    p1.write_text("one\ntwo\nthree\n")
    p2 = tmp_path / "b.log"
    p2.write_text("err: x\n  trace1\n  trace2\nnext\n")
    ds = read_log_lines([str(p1), str(p2)],
                        multiline={"mode": "pattern", "pattern": r"^\s",
                                   "match": "after"})
    rows = sorted(ds.take_all(), key=lambda r: (r["log.file.path"],
                                                r["log.offset"]))
    by_file = {}
    for r in rows:
        by_file.setdefault(os.path.basename(r["log.file.path"]), []).append(
            r["message"])
    assert by_file["a.log"] == ["one", "two", "three"]
    assert by_file["b.log"] == ["err: x\n  trace1\n  trace2", "next"]
    offs = [r["log.offset"] for r in rows if "a.log" in r["log.file.path"]]
    assert offs == [0, 4, 8]


def test_validate_marks_dead_letter():
    t = pa.table({"msg": ["ok", None, "x" * 100],
                  "ts": pa.array([1, 2, 3], pa.int64())})
    p = build_processor({"validate": {"required": ["msg"],
                                      "max_field_bytes": {"msg": 50}}})
    out = p.apply(t)
    assert out.column("meta_dead_letter").to_pylist() == [False, True, True]
    flags = out.column("log_flags").to_pylist()
    assert flags[0] is None and "validation_error" in flags[1]


def test_log_file_source_through_pipeline(ray_session, tmp_path):
    """Raw .log files → dissect → route → partitioned sinks through the
    config surface (the full harvester-to-output path)."""
    from raybeats.pipeline import Pipeline

    log1 = tmp_path / "app1.log"
    log1.write_text("INFO start job=a\nERROR boom job=b\nINFO done job=c\n")
    log2 = tmp_path / "app2.log"
    log2.write_text("WARN slow job=d\ngarbage line\n")

    pipe = Pipeline({
        "source": {"type": "log_lines"},
        "processors": [
            {"dissect": {"tokenizer": "%{level} %{msg} job=%{job}",
                         "field": "message", "target_prefix": ""}},
        ],
        "router": {
            "rules": [
                {"sink": "dead_letter",
                 "when": {"contains": {"log_flags": "dissect_parsing_error"}}},
                {"sink": "alerts", "when": {"equals": {"level": "ERROR"}}},
                {"sink": "bulk"},
            ],
            "default": "bulk",
        },
    })
    out = str(tmp_path / "out")
    report = pipe.run([str(log1), str(log2)], out, partitions=2)
    assert report["per_sink"] == {"alerts": 1, "bulk": 3, "dead_letter": 1}
    assert report["pipeline.events.total"] == 5
    assert report["pipeline.events.dropped"] == 0


def test_incremental_harvester_append_rotate_truncate(ray_session,
                                                      tmp_path):
    """filestream identity semantics: appends read only new complete
    lines; a renamed (rotated) file keeps its inode cursor; a
    copy-truncated file restarts at 0; a fresh file at the old path is
    a new identity."""
    import os
    import shutil

    from raybeats.sources.identity import CursorStore, commit_scan
    from raybeats.sources.logfiles import read_log_lines_incremental

    log = str(tmp_path / "app.log")
    store = CursorStore(str(tmp_path / "cursors.json"))

    def ingest():
        ds, plans = read_log_lines_incremental([log], store)
        rows = sorted(ds.take_all(), key=lambda r: r["log.offset"])
        commit_scan(store, plans)
        return rows

    with open(log, "w") as f:
        f.write("one\ntwo\npartial")
    rows = ingest()
    assert [r["message"] for r in rows] == ["one", "two"]  # partial waits
    assert [r["log.offset"] for r in rows] == [0, 4]

    with open(log, "a") as f:
        f.write(" line\nthree\n")
    rows = ingest()
    assert [r["message"] for r in rows] == ["partial line", "three"]
    assert rows[0]["log.offset"] == 8  # absolute offset

    # rename rotation: same inode under a new name -> nothing re-read
    rotated = str(tmp_path / "app.log.1")
    os.rename(log, rotated)
    with open(log, "w") as f:
        f.write("fresh\n")
    ds, plans = read_log_lines_incremental([log, rotated], store)
    rows = sorted(ds.take_all(), key=lambda r: r["log.file.path"])
    commit_scan(store, plans)
    assert [r["message"] for r in rows] == ["fresh"]  # only the new file

    # copy-truncate: same inode, size < cursor -> restart at 0 (the
    # reference's detectability boundary too: filestream.go:238-250
    # compares offset > size, so a truncate-then-write-LONGER file is
    # indistinguishable from an append there as well)
    shutil.copy(log, str(tmp_path / "app.log.bak"))
    with open(log, "w") as f:
        pass  # truncate
    with open(log, "a") as f:
        f.write("ok\n")
    ds, plans = read_log_lines_incremental([log], store)
    rows = ds.take_all()
    commit_scan(store, plans)
    assert [r["message"] for r in rows] == ["ok"]
    assert rows[0]["log.offset"] == 0

    # cursors survive a store reload (registrar restart)
    store2 = CursorStore(str(tmp_path / "cursors.json"))
    ds, plans = read_log_lines_incremental([log, rotated], store2)
    assert ds.count() == 0 and plans == []


def test_incremental_multiline_flushes_at_scan(ray_session, tmp_path):
    """Multiline + incremental scans: the trailing multiline event
    flushes at scan end (the reference's multiline.timeout behavior) and
    later continuation lines start a new event; acked offsets stay
    line-accurate."""
    from raybeats.sources.identity import CursorStore, commit_scan
    from raybeats.sources.logfiles import read_log_lines_incremental

    log = str(tmp_path / "app.log")
    store = CursorStore(str(tmp_path / "cur.json"))
    ml = {"mode": "pattern", "pattern": r"^\s", "match": "after"}

    def ingest():
        ds, plans = read_log_lines_incremental([log], store, multiline=ml)
        rows = sorted(ds.take_all(), key=lambda r: r["log.offset"])
        commit_scan(store, plans)
        return [r["message"] for r in rows]

    with open(log, "w") as f:
        f.write("ERROR boom\n  at frame1\n  at frame2\n")
    assert ingest() == ["ERROR boom\n  at frame1\n  at frame2"]

    # continuation lines appended AFTER the flush start a new event
    # (same as the reference when multiline.timeout fired in between)
    with open(log, "a") as f:
        f.write("  at frame3\nINFO next\n")
    assert ingest() == ["  at frame3", "INFO next"]
