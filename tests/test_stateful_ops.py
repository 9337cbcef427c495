import pyarrow as pa
import pytest

from raybeats.errors import ConfigError
from raybeats.processors import build_processor


def T(**cols):
    return pa.table(cols)


def test_rate_limit_event_time_bucket():
    # 1/s with burst 1: events 0.0s,0.2s,1.5s,3.0s per key -> keep 0,2,3
    us = 1_000_000
    t = T(ts=pa.array([0, 200_000, 1_500_000, 3 * us, 0, 10 * us],
                      pa.timestamp("us")),
          k=pa.array(["a", "a", "a", "a", "b", "b"]))
    p = build_processor({"rate_limit": {"limit": "1/s", "fields": ["k"]}})
    out = p.apply(t)
    kept = sorted(zip(out.column("k").to_pylist(),
                      [x.timestamp() for x in out.column("ts").to_pylist()]))
    assert kept == [("a", 0.0), ("a", 1.5), ("a", 3.0), ("b", 0.0), ("b", 10.0)]


def test_rate_limit_bad_config():
    with pytest.raises(ConfigError):
        build_processor({"rate_limit": {"limit": "10/x"}})


def test_timeseries_instance():
    t = T(dim1=pa.array(["a", "a", "b"]), dim2=pa.array(["x", "x", "y"]))
    p = build_processor({"timeseries": {"fields": ["dim1", "dim2"]}})
    out = p.apply(t).column("timeseries.instance").to_pylist()
    assert out[0] == out[1] != out[2]


def test_decode_xml():
    t = T(message=pa.array(
        ['<ev id="7"><user name="bo"/><msg>hi</msg></ev>', "not xml", None]))
    p = build_processor({"decode_xml": {"field": "message", "target": "x"}})
    out = p.apply(t)
    assert out.column("x.ev.id").to_pylist() == ["7", None, None]
    assert out.column("x.ev.user.name").to_pylist() == ["bo", None, None]
    assert out.column("x.ev.msg").to_pylist() == ["hi", None, None]
    assert "decode_xml_error" in (out.column("log_flags").to_pylist()[1] or "")


def test_stub_processors_raise():
    # env-bound metadata enrichers stay stubs pointing at lookup_enrich
    for name in ("dns", "add_docker_metadata"):
        with pytest.raises(NotImplementedError):
            build_processor({name: {}})


def test_translate_sid_with_account_table():
    """translate_sid resolves from a provided account directory (the
    reference's LookupAccountSid semantics over data instead of the OS;
    config surface from translate_sid/config.go:22-37)."""
    accounts = [{"sid": "S-1-5-18", "account_name": "SYSTEM",
                 "account_type": "Well Known Group",
                 "domain": "NT AUTHORITY"}]
    p = build_processor({"translate_sid": {
        "field": "sid", "account_name_target": "user.name",
        "domain_target": "user.domain", "accounts": accounts,
        "ignore_failure": True}})
    t = p.apply(pa.table({"sid": ["S-1-5-18", "S-1-0-0", None]}))
    assert t.column("user.name").to_pylist() == ["SYSTEM", None, None]
    assert t.column("user.domain").to_pylist() == \
        ["NT AUTHORITY", None, None]
    # no targets configured -> ConfigError (reference Validate)
    with pytest.raises(ConfigError):
        build_processor({"translate_sid": {
            "field": "sid", "accounts": accounts}})
    # unresolvable SID with ignore_failure=false -> loud error
    strict = build_processor({"translate_sid": {
        "field": "sid", "account_name_target": "n",
        "accounts": accounts}})
    with pytest.raises(ValueError):
        strict.apply(pa.table({"sid": ["S-1-0-0"]}))


def test_community_id_reference_vectors():
    """Golden hashes from the reference's own test suite
    (``processors/communityid/communityid_test.go:56-148``)."""
    base = {
        "source.ip": "128.232.110.120", "source.port": 34855,
        "destination.ip": "66.35.250.204", "destination.port": 80,
    }

    def run(extra, seed=0, drop=()):
        row = {k: v for k, v in {**base, **extra}.items()
               if k not in drop}
        cols = {k: [v] for k, v in row.items()}
        t = pa.table(cols)
        p = build_processor({"community_id": {"seed": seed}})
        return p.apply(t).column("network.community_id")[0].as_py()

    assert run({"network.transport": "TCP"}) == \
        "1:LQU9qZlK+B5F3KDmev6m5PMibrg="
    assert run({"network.transport": "TCP"}, seed=123) == \
        "1:hTSGlFQnR58UCk+NfKRZzA32dPg="
    assert run({"network.transport": "icmp", "icmp.type": 3,
                "icmp.code": 3}) == "1:KF3iG9XD24nhlSy4r1TcYIr5mfE="
    assert run({"network.transport": "icmp"}) == \
        "1:PAE85ZfR4SbNXl5URZwWYyDehwU="
    assert run({"network.transport": "igmp"},
               drop=("source.port", "destination.port")) == \
        "1:D3t8Q1aFA6Ev0A/AO4i9PnU3AeI="
    assert run({"network.transport": "2"},
               drop=("source.port", "destination.port")) == \
        "1:D3t8Q1aFA6Ev0A/AO4i9PnU3AeI="
    assert run({"network.iana_number": 6}) == \
        "1:LQU9qZlK+B5F3KDmev6m5PMibrg="
    # invalid tuple -> null, not an error
    assert run({"network.transport": "tcp", "source.ip": "not-an-ip"}) \
        is None


def test_dedup_first_by_key(ray_session):
    import ray.data as rd

    from raybeats.textops.dedup import dedup_first_by_key

    t = pa.table({
        "meta_id": ["x", "x", "y", None, None],
        "ts": pa.array([5, 3, 1, 9, 9], pa.int64()),
        "v": ["late", "early", "only", "null1", "null2"],
    })
    out = dedup_first_by_key(rd.from_arrow(t), key="meta_id",
                             order_cols=("ts",)).take_all()
    vals = sorted(r["v"] for r in out)
    assert vals == ["early", "null1", "null2", "only"]


def test_media_feature_stage(ray_session):
    import ray.data as rd

    from raybeats.textops.multimodal import (extract_media_features,
                                             synth_media_table)
    media = rd.from_arrow(synth_media_table(50, seed=3))
    out = extract_media_features(media, concurrency=2, batch_size=16) \
        .take_all()
    assert len(out) == 50
    assert all(len(r["features"]) == 8 for r in out)
    # deterministic stub: same payload -> same features
    again = extract_media_features(
        rd.from_arrow(synth_media_table(50, seed=3)),
        concurrency=2, batch_size=16).take_all()
    f1 = {r["media_id"]: r["features"] for r in out}
    f2 = {r["media_id"]: r["features"] for r in again}
    assert f1 == f2


def test_ratelimit_keyed_query_deterministic_and_key_exact(ray_session):
    """q_ratelimit co-partitions by conv_id: the surviving row set must
    equal a single-process application of the same limiter to the whole
    (globally sorted) input, and be identical across runs."""
    from raybeats.processors.ratelimit import RateLimit
    from raybeats.queries import q_ratelimit
    from raybeats.transcripts import read_transcripts

    sf = "/root/testdata/sf0.001"

    def rowset(ds):
        t = pa.concat_tables(list(ds.iter_batches(batch_format="pyarrow")))
        return sorted(zip(t.column("conv_id").to_pylist(),
                          t.column("turn_idx").to_pylist()))

    got1 = rowset(q_ratelimit(sf))
    got2 = rowset(q_ratelimit(sf))
    assert got1 == got2  # run-to-run stable

    # single-process oracle: same limiter over the whole sorted corpus
    full = pa.concat_tables(list(
        read_transcripts(sf).iter_batches(batch_format="pyarrow")))
    full = full.sort_by([("conv_id", "ascending"), ("ts", "ascending"),
                         ("turn_idx", "ascending")])
    want = RateLimit(limit="1/m", fields=["conv_id"]).apply(full)
    assert got1 == sorted(zip(want.column("conv_id").to_pylist(),
                              want.column("turn_idx").to_pylist()))
    assert 0 < len(got1) < full.num_rows  # the limiter actually bit


def test_media_resizer_aspect_math_and_plumbing(ray_session):
    import ray.data as rd
    from raybeats.textops.multimodal import (MediaResizer, resize_media,
                                             synth_media_table)
    # aspect arithmetic is the real (non-stub) part: exact integer
    # floors, never upscales, 1px floor
    assert MediaResizer.target_size(640, 480, 256) == (256, 192)
    assert MediaResizer.target_size(100, 50, 256) == (100, 50)  # no upscale
    assert MediaResizer.target_size(10000, 2, 256) == (256, 1)  # 1px floor
    out = resize_media(rd.from_arrow(synth_media_table(30, seed=7)),
                       target_w=64).to_pandas()
    assert len(out) == 30
    assert (out["width"] <= 64).all()
    assert (out["height"] >= 1).all()
    assert out["payload"].notna().all()


def test_sample_frames_timing_arithmetic_and_explode(ray_session):
    import hashlib
    import ray.data as rd
    from raybeats.textops.multimodal import sample_frames
    t = pa.table({
        "media_id": pa.array([1, 2, 3, 4], pa.int64()),
        "payload": pa.array([b"aa", b"bb", b"cc", b"dd"], pa.binary()),
        # 6000ms -> frames at 0, 2500, 5000; 2500 -> 0; 1 -> 0; 0 -> none
        "duration_ms": pa.array([6000, 2500, 1, 0], pa.int32())})
    out = sample_frames(rd.from_arrow(t).repartition(2),
                        every_ms=2500, fps=30).to_pandas() \
        .sort_values(["media_id", "ts_ms"]).reset_index(drop=True)
    got = list(zip(out["media_id"], out["ts_ms"], out["frame_idx"]))
    assert got == [(1, 0, 0), (1, 2500, 75), (1, 5000, 150),
                   (2, 0, 0), (3, 0, 0)]
    # digest stub matches its documented definition exactly
    want = hashlib.sha256(b"aa-2500").hexdigest()[:8]
    assert out.loc[1, "frame_sig"] == want
