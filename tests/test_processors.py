import base64
import gzip
import json

import pyarrow as pa
import pytest

from raybeats.errors import ConfigError
from raybeats.fmtstr import EventFormatString
from raybeats.model import FLAGS, META_ID
from raybeats.processors import build_chain, build_processor


def T(**cols):
    return pa.table(cols)


def col(tbl, name):
    return tbl.column(name).to_pylist()


# ----------------------------------------------------------------- fmtstr

def test_fmtstr_fields_and_defaults():
    f = EventFormatString("events-%{[level]:none}")
    t = T(level=pa.array(["info", None, "warn"]))
    assert f.evaluate(t).to_pylist() == ["events-info", "events-none", "events-warn"]
    g = EventFormatString("x-%{[missing]}")
    assert g.evaluate(t).to_pylist() == [None, None, None]


def test_fmtstr_date():
    f = EventFormatString("idx-%{+yyyy.MM.dd}")
    t = T(ts=pa.array([1704067200000000], pa.timestamp("us")))
    assert f.evaluate(t).to_pylist() == ["idx-2024.01.01"]


# ------------------------------------------------------------- processors

def test_add_fields_nested_target():
    p = build_processor({"add_fields": {"target": "project",
                                        "fields": {"name": "x", "meta": {"v": 1}}}})
    t = p.apply(T(a=pa.array([1, 2])))
    assert col(t, "project.name") == ["x", "x"]
    assert col(t, "project.meta.v") == [1, 1]


def test_add_tags_union():
    p = build_processor({"add_tags": {"tags": ["web", "prod"]}})
    t = p.apply(T(a=pa.array([1])))
    t = build_processor({"add_tags": {"tags": ["prod", "x"]}}).apply(t)
    assert col(t, "tags") == [["web", "prod", "x"]]


def test_rename_copy_drop_include():
    t = T(a=pa.array([1]), b=pa.array(["z"]), ts=pa.array([0]))
    t2 = build_processor({"rename": {"fields": [{"from": "a", "to": "c"}]}}).apply(t)
    assert "a" not in t2.column_names and col(t2, "c") == [1]
    t3 = build_processor({"copy_fields": {"fields": [{"from": "b", "to": "b2"}]}}).apply(t2)
    assert col(t3, "b2") == ["z"]
    t4 = build_processor({"drop_fields": {"fields": ["b2", "nope"]}}).apply(t3)
    assert "b2" not in t4.column_names
    t5 = build_processor({"include_fields": {"fields": ["c"]}}).apply(t4)
    assert set(t5.column_names) == {"c", "ts"}


def test_rename_conflict_raises():
    t = T(a=pa.array([1]), b=pa.array([2]))
    with pytest.raises(ConfigError):
        build_processor({"rename": {"fields": [{"from": "a", "to": "b"}]}}).apply(t)


def test_replace_truncate():
    t = T(s=pa.array(["aaa-bbb", "xyz"]))
    t = build_processor({"replace": {"fields": [
        {"field": "s", "pattern": "a+", "replacement": "A"}]}}).apply(t)
    assert col(t, "s") == ["A-bbb", "xyz"]
    t = build_processor({"truncate_fields": {"fields": ["s"],
                                             "max_characters": 3}}).apply(t)
    assert col(t, "s") == ["A-b", "xyz"]


def test_drop_event_when():
    p = build_processor({"drop_event": {"when": {"equals": {"lvl": "debug"}}}})
    t = p.apply(T(lvl=pa.array(["info", "debug", "warn"])))
    assert col(t, "lvl") == ["info", "warn"]


def test_when_guard_column_merge():
    p = build_processor({"add_fields": {"target": "", "fields": {"hit": "y"},
                                        "when": {"equals": {"lvl": "err"}}}})
    t = p.apply(T(lvl=pa.array(["err", "ok"])))
    assert col(t, "hit") == ["y", None]


def test_if_then_else():
    p = build_processor({
        "if": {"range": {"n.gte": 10}},
        "then": [{"add_fields": {"target": "", "fields": {"size": "big"}}}],
        "else": [{"add_fields": {"target": "", "fields": {"size": "small"}}}]})
    t = p.apply(T(n=pa.array([5, 20])))
    got = dict(zip(col(t, "n"), col(t, "size")))
    assert got == {5: "small", 20: "big"}


def test_convert():
    t = T(s=pa.array(["1", "2", "zz"]))
    t = build_processor({"convert": {"fields": [
        {"from": "s", "to": "n", "type": "long"}]}}).apply(t)
    assert col(t, "n") == [1, 2, None]
    assert "convert_error" in (col(t, FLAGS)[2] or "")


def test_timestamp_layouts():
    t = T(raw=pa.array(["2024-01-02T03:04:05Z", "bogus"]))
    t = build_processor({"timestamp": {
        "field": "raw", "layouts": ["2006-01-02T15:04:05Z"],
        "target_field": "parsed"}}).apply(t)
    vals = col(t, "parsed")
    assert vals[0] is not None and vals[0].year == 2024 and vals[0].second == 5
    assert vals[1] is None


def test_timestamp_timezone_config():
    """timezone config (timestamp/config.go): naive layouts interpret in
    the configured zone and normalize to UTC — IANA names are
    DST-correct, fixed offsets arithmetic."""
    from raybeats.processors.timestamp import Timestamp
    ts = Timestamp(field="s", layouts=["2006-01-02 15:04:05"],
                   target_field="p", timezone="Europe/Berlin")
    out = ts.apply(pa.table({"s": ["2024-03-01 10:00:00",
                                   "2024-07-01 10:00:00"]}))
    # CET (+1) in March, CEST (+2) in July
    assert [v.hour for v in col(out, "p")] == [9, 8]
    ts2 = Timestamp(field="s", layouts=["2006-01-02 15:04:05"],
                    target_field="p", timezone="-05:00")
    out2 = ts2.apply(pa.table({"s": ["2024-03-01 10:00:00"]}))
    assert col(out2, "p")[0].hour == 15
    # zoned layouts ignore the timezone config (the value carries it)
    ts3 = Timestamp(field="s", layouts=["2006-01-02T15:04:05Z0700"],
                    target_field="p", timezone="Europe/Berlin")
    out3 = ts3.apply(pa.table({"s": ["2024-03-01T10:00:00+0100"]}))
    assert col(out3, "p")[0].hour == 9
    with pytest.raises(ConfigError):
        Timestamp(field="s", layouts=["2006-01-02"], timezone="Not/AZone")


def test_timestamp_untranslatable_layout_raises():
    from raybeats.processors.timestamp import Timestamp
    with pytest.raises(ConfigError):
        Timestamp(field="s", layouts=["15:04 Z07"], target_field="p")


def test_decode_json_fields():
    rows = [json.dumps({"event": "go", "k": 7, "doc_id": "d1",
                        "nested": {"a": 1}}),
            "not json", None]
    t = T(text=pa.array(rows))
    p = build_processor({"decode_json_fields": {
        "fields": ["text"], "target": "j", "max_depth": 2,
        "document_id": "doc_id",
        "expected_keys": ["event", "k:int", "nested.a:int"]}})
    t = p.apply(t)
    assert col(t, "j.event") == ["go", None, None]
    assert col(t, "j.k") == [7, None, None]
    assert col(t, "j.nested.a") == [1, None, None]
    assert col(t, META_ID) == ["d1", None, None]
    assert col(t, "json_ok") == [True, False, False]


def test_decode_json_expand_keys():
    """Reference TestExpandKeys (decode_json_fields_test.go:427-445):
    dotted keys de-dot and deep-merge with nested objects."""
    rows = [json.dumps({"a.b": {"c": "c"}, "a.b.d": "d"})]
    t = T(text=pa.array(rows))
    out = build_processor({"decode_json_fields": {
        "fields": ["text"], "target": "", "expand_keys": True,
        "expected_keys": ["a.b.c", "a.b.d"]}}).apply(t)
    assert col(out, "a.b.c") == ["c"]
    assert col(out, "a.b.d") == ["d"]
    assert col(out, "json_ok") == [True]


def test_decode_json_expand_keys_conflict_errors():
    """Reference TestExpandKeysError (decode_json_fields_test.go:447-473):
    a conflicting expansion (scalar vs object at the same path) errors
    the event instead of writing keys."""
    rows = [json.dumps({"a.b": "c", "a.b.c": "d"}),
            json.dumps({"a.b": "x"})]
    t = T(text=pa.array(rows))
    out = build_processor({"decode_json_fields": {
        "fields": ["text"], "target": "", "expand_keys": True,
        "add_error_key": True, "expected_keys": ["a.b"]}}).apply(t)
    assert col(out, "json_ok") == [False, True]
    assert col(out, "a.b") == [None, "x"]
    flags = col(out, "log_flags")
    assert "json_decode_error" in (flags[0] or "")


def test_decode_json_max_depth_string_redecode():
    """Reference unmarshal semantics: max_depth limits recursive
    re-decoding of nested JSON STRINGS; strings inside nested OBJECTS
    do not re-decode (decode_json_fields.go:176-214)."""
    inner = json.dumps({"b": 1})
    rows = [json.dumps({"a": inner, "o": {"inner": inner}})]
    shallow = build_processor({"decode_json_fields": {
        "fields": ["text"], "target": "", "max_depth": 1,
        "expected_keys": ["a", "o.inner"]}}).apply(T(text=pa.array(rows)))
    assert col(shallow, "a") == [inner]  # kept as the raw string
    deep = build_processor({"decode_json_fields": {
        "fields": ["text"], "target": "", "max_depth": 2,
        "expected_keys": ["a.b:int", "o.inner"]}}).apply(
            T(text=pa.array(rows)))
    assert col(deep, "a.b") == [1]  # immediate child string re-decoded
    assert col(deep, "o.inner") == [inner]  # blocked by the object


def test_base64_and_gzip():
    payload = "hello world"
    b64 = base64.b64encode(payload.encode()).decode()
    t = T(b=pa.array([b64, "!!!"]))
    t = build_processor({"decode_base64_field": {
        "field": {"from": "b", "to": "out"}}}).apply(t)
    assert col(t, "out") == [payload, None]
    gz = gzip.compress(b"zipped")
    t2 = T(g=pa.array([gz], pa.binary()))
    t2 = build_processor({"decompress_gzip_field": {
        "field": {"from": "g", "to": "out"}}}).apply(t2)
    assert col(t2, "out") == ["zipped"]


def test_extract_field():
    t = T(path=pa.array(["/a/b/c", "short"]))
    t = build_processor({"extract_field": {
        "field": "path", "separator": "/", "index": 2, "target": "seg"}}).apply(t)
    assert col(t, "seg") == ["b", None]


def test_decode_csv_fields():
    t = T(line=pa.array(['a,"b,c",d']))
    t = build_processor({"decode_csv_fields": {
        "fields": {"line": "cells"}}}).apply(t)
    assert col(t, "cells") == [["a", "b,c", "d"]]


def test_urldecode():
    t = T(u=pa.array(["a%20b", "plain"]))
    t = build_processor({"urldecode": {"fields": [{"from": "u"}]}}).apply(t)
    assert col(t, "u") == ["a b", "plain"]


def test_add_id_unique():
    t = build_processor({"add_id": {}}).apply(T(a=pa.array(range(100))))
    ids = col(t, META_ID)
    assert len(set(ids)) == 100 and all(len(i) == 32 for i in ids)


def test_script_udf():
    src = "import pyarrow.compute as pc\n" \
          "def process(t):\n" \
          "    return t.append_column('y', pc.add(t['x'], 1))\n"
    t = build_processor({"script": {"source": src}}).apply(T(x=pa.array([1, 2])))
    assert col(t, "y") == [2, 3]


# --------------------------------------------- fingerprint golden vectors
# expected digests from the reference's own unit tests
# (libbeat/processors/fingerprint/fingerprint_test.go:76-205)

FP_FIELDS = {"field1": "foo", "field2": "bar", "unused_field": "baz"}


def fp(cfg, fields):
    t = pa.table({k: pa.array([v]) for k, v in fields.items()})
    p = build_processor({"fingerprint": cfg})
    return p.apply(t).column("fingerprint").to_pylist()[0]


@pytest.mark.parametrize("method,expected", [
    ("md5", "4c45df4792f3ef850c928ec5f5232538"),
    ("sha1", "22f76427d626516d3f7a05785165b99617683b22"),
    ("sha256", "1208288932231e313b369bae587ff574cd3016a408e52e7128d7bee752674003"),
    ("sha384", "295adfe0bc03908948e4b0b6a54f441767867e426dda590430459c8a147fbba2"
               "42a38cba282adee78335b9e08877b86c"),
    ("sha512", "f50ad51b63c92a0ed0c910527119b81806f3110f0afaa1dcb93506a78371ea76"
               "1e50c0fc09b08c441d832dd2da1b45e5d8361adfb240e1fffc2695122a23e183"),
])
def test_fingerprint_methods(method, expected):
    got = fp({"fields": ["field1", "field2"], "method": method}, FP_FIELDS)
    assert got == expected


@pytest.mark.parametrize("encoding,expected", [
    ("hex", "8934ca639027aab1ee9f3944d4d6bd1e"),
    ("base32", "RE2MUY4QE6VLD3U7HFCNJVV5DY======"),
    ("base64", "iTTKY5AnqrHunzlE1Na9Hg=="),
])
def test_fingerprint_encodings(encoding, expected):
    got = fp({"fields": ["field2", "nested.field"], "method": "md5",
              "encoding": encoding},
             {"field2": "bar", "nested.field": "qux"})
    assert got == expected


def test_fingerprint_sorted_and_dedup():
    exp = "3d51237d384215a6e731f2cc67ead6d7d9a5138377897c8f542a915be3c25bcf"
    fields = {"field1": "foo", "nested.field": "qux"}
    for order in (["field1", "nested.field"], ["nested.field", "field1"],
                  ["nested.field", "field1", "nested.field"]):
        assert fp({"fields": order}, fields) == exp


def test_fingerprint_timestamp_utc():
    # time.Date(2019,10,29,0,0,0,0,UTC) -> Go %v "2019-10-29 00:00:00 +0000 UTC"
    exp = "4534d56a673c2da41df32db5da87cf47e639e84fe82907f2c015c8dfcac5d4f5"
    t = pa.table({"timestamp": pa.array([1572307200000000], pa.timestamp("us"))})
    p = build_processor({"fingerprint": {"fields": ["timestamp"]}})
    assert p.apply(t).column("fingerprint").to_pylist()[0] == exp


def test_chain_order():
    chain = build_chain([
        {"add_fields": {"target": "", "fields": {"stage": "one"}}},
        {"replace": {"fields": [{"field": "stage", "pattern": "one",
                                 "replacement": "two"}]}},
    ])
    t = chain(T(a=pa.array([1])))
    assert col(t, "stage") == ["two"]


def test_convert_rename_mode():
    t = T(s=pa.array(["7"]))
    t = build_processor({"convert": {"mode": "rename", "fields": [
        {"from": "s", "to": "n", "type": "long"}]}}).apply(t)
    assert "s" not in t.column_names and col(t, "n") == [7]


def test_truncate_max_bytes_utf8_boundary():
    t = T(s=pa.array(["héllo"]))  # é is 2 bytes
    t = build_processor({"truncate_fields": {"fields": ["s"],
                                             "max_bytes": 2}}).apply(t)
    assert col(t, "s") == ["h"]  # cut lands mid-é -> dropped, not mojibake


def test_fmtstr_nested_bracket_syntax():
    f = EventFormatString("%{[a][b]}-x")
    t = T(**{"a.b": pa.array(["v"])})
    assert f.evaluate(t).to_pylist() == ["v-x"]


def test_empty_bool_condition_rejected():
    from raybeats.conditions import compile_condition
    for bad in ({"or": []}, {"and": []}):
        with pytest.raises(ConfigError):
            compile_condition(bad)


def test_decode_xml_wineventlog_reference_case():
    """The reference's own processor test event
    (decode_xml_wineventlog/processor_test.go:43-105)."""
    xml = ("<Event xmlns='http://schemas.microsoft.com/win/2004/08/events/event'>"
           "<System><Provider Name='Microsoft-Windows-Security-Auditing' "
           "Guid='{54849625-5478-4994-a5ba-3e3b0328c30d}'/>"
           "<EventID>4672</EventID><Version>0</Version><Level>0</Level>"
           "<Task>12548</Task><Opcode>0</Opcode>"
           "<Keywords>0x8020000000000000</Keywords>"
           "<TimeCreated SystemTime='2021-03-23T09:56:13.137310000Z'/>"
           "<EventRecordID>11303</EventRecordID>"
           "<Correlation ActivityID='{ffb23523-1f32-0000-c335-b2ff321fd701}'/>"
           "<Execution ProcessID='652' ThreadID='4660'/>"
           "<Channel>Security</Channel><Computer>vagrant</Computer>"
           "<Security/></System>"
           "<EventData><Data Name='SubjectUserSid'>S-1-5-18</Data>"
           "<Data Name='SubjectUserName'>SYSTEM</Data></EventData>"
           "<RenderingInfo Culture='en-US'>"
           "<Message>Special privileges assigned to new logon.</Message>"
           "<Level>Information</Level><Task>Special Logon</Task>"
           "<Opcode>Info</Opcode><Channel>Security</Channel>"
           "<Provider>Microsoft Windows security auditing.</Provider>"
           "<Keywords><Keyword>Audit Success</Keyword></Keywords>"
           "</RenderingInfo></Event>")
    t = T(message=pa.array([xml, "not xml"]))
    # reference default is ignore_failure=false → a bad row raises; the
    # flag-row path needs the explicit opt-in
    with pytest.raises(ValueError, match="decode_xml_wineventlog"):
        build_processor({"decode_xml_wineventlog": {}}).apply(t)
    out = build_processor(
        {"decode_xml_wineventlog": {"ignore_failure": True}}).apply(t)

    def c(name):
        return out.column(name).to_pylist()

    assert c("winlog.event_id") == ["4672", None]
    assert c("winlog.provider_name") == [
        "Microsoft-Windows-Security-Auditing", None]
    assert c("winlog.provider_guid") == [
        "{54849625-5478-4994-a5ba-3e3b0328c30d}", None]
    assert c("winlog.record_id") == [11303, None]
    assert c("winlog.computer_name") == ["vagrant", None]
    assert c("winlog.channel") == ["Security", None]
    assert c("winlog.activity_id") == [
        "{ffb23523-1f32-0000-c335-b2ff321fd701}", None]
    assert c("winlog.process.pid") == [652, None]
    assert c("winlog.process.thread.id") == [4660, None]
    assert c("winlog.level") == ["information", None]
    assert c("winlog.task") == ["Special Logon", None]
    assert c("winlog.opcode") == ["Info", None]
    assert c("winlog.keywords") == ["Audit Success", None]
    assert c("winlog.outcome") == ["success", None]
    assert c("winlog.event_data.SubjectUserSid") == ["S-1-5-18", None]
    tc = c("winlog.time_created")[0]
    assert tc.year == 2021 and tc.second == 13
    # ECS mapping
    assert c("event.code") == ["4672", None]
    assert c("event.action") == ["Special Logon", None]
    assert c("event.outcome") == ["success", None]
    assert c("event.kind") == ["event", None]
    assert c("host.name") == ["vagrant", None]
    assert c("log.level") == ["information", None]
    assert c("message") == [
        "Special privileges assigned to new logon.", None]
    flags = c("log_flags")
    assert flags[0] is None and "wineventlog_decode_error" in flags[1]


def test_detect_mime_type_signatures():
    cases = {
        b"\x89PNG\r\n\x1a\n....": "image/png",
        b"\xff\xd8\xff\xe0..": "image/jpeg",
        b"GIF89a....": "image/gif",
        b"%PDF-1.4": "application/pdf",
        b"PK\x03\x04plainzip": "application/zip",
        b"PK\x03\x04..xl/workbook.xml": (
            "application/vnd.openxmlformats-officedocument"
            ".spreadsheetml.sheet"),
        b"\x1f\x8bgz": "application/gzip",
        b"fLaC...": "audio/x-flac",
        b"\x00\x00\x00\x18ftypmp42": "video/mp4",
        b"\x00\x00\x00\x24ftypisom": "video/mp4",  # odd box size fallback
        b"\x7fELF..": "application/x-executable",
        b"PAR1...": "application/vnd.apache.parquet",
        b'{"a": 1}': "application/json",
        b"<xml/>": "text/xml",
        b"hello world": "text/plain",
        (b"x" * 257 + b"ustar" + b"\x00" * 50): "application/x-tar",
    }
    p = build_processor({"detect_mime_type": {"field": "b",
                                              "target": "mime"}})
    t = p.apply(T(b=pa.array(list(cases), pa.binary())))
    assert col(t, "mime") == list(cases.values())


def test_fingerprint_xxhash_golden():
    """Pure-python XXH64: public spec vectors + the reference's own
    fingerprint golden digest (fingerprint_test.go:77-93)."""
    from raybeats.processors.fingerprint import xxh64
    assert xxh64(b"") == 0xEF46DB3751D8E999
    assert xxh64(b"", seed=1) == 0xD5AFBA1336A3BE4B
    # 43 bytes: exercises the 32-byte stripe loop (public vector)
    assert xxh64(b"The quick brown fox jumps over the lazy dog") == \
        0x0B242D361FDA71BC
    p = build_processor({"fingerprint": {
        "fields": ["field1", "field2"], "method": "xxhash"}})
    t = p.apply(T(field1=pa.array(["foo"]), field2=pa.array(["bar"]),
                  unused_field=pa.array(["baz"])))
    assert col(t, "fingerprint") == ["37bc50682fba6686"]
