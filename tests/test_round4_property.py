"""Property tests for the round-4 kernels: the contamination shingle
probe and the broadcast range join must equal their naive definitions on
arbitrary inputs (unicode, punctuation-only, mid-token snippet cuts,
empty/degenerate intervals, NaN bounds)."""
import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
from hypothesis import given, settings, strategies as st

# text with ascii words, unicode, digits and punctuation so tokenizer
# edges (empty tokens, non-ascii lowercasing) get exercised
_text = st.text(
    alphabet=st.sampled_from(list("abcXYZ019 .,-_@é漢\t")), max_size=60)


@settings(max_examples=120, deadline=None)
@given(docs=st.lists(_text, min_size=1, max_size=12),
       cuts=st.lists(st.tuples(st.integers(0, 11), st.integers(0, 50),
                               st.integers(1, 20)),
                     min_size=1, max_size=10))
def test_contamination_equals_naive_scan(docs, cuts):
    from raybeats.textops.curation import ContaminationFlagger
    snips = []
    for di, start, width in cuts:
        d = docs[di % len(docs)]
        s = d[start:start + width]
        if s:
            snips.append(s)
    if not snips:
        snips = ["zz never matches"]
    tbl = pa.table({"doc_id": pa.array(range(len(docs)), pa.int64()),
                    "text": pa.array(docs, pa.string())})
    got = ContaminationFlagger(snips)(tbl).column("n_hits").to_pylist()
    # per-entry semantics: a snippet passed twice counts twice (matches
    # the K-scan kernel; q_contamination dedupes upstream)
    exp = [sum(s in d for s in snips) for d in docs]
    assert got == exp, (docs, snips)


@settings(max_examples=40, deadline=None)
@given(vals=st.lists(st.floats(allow_infinity=False, width=32),
                     min_size=0, max_size=40),
       ivs=st.lists(st.tuples(st.floats(allow_infinity=False, width=32),
                              st.floats(allow_infinity=False, width=32)),
                    min_size=1, max_size=15),
       closed=st.sampled_from(["left", "both"]))
def test_range_join_equals_mask_semantics(ray_session, vals, ivs, closed):
    import ray.data as rd

    from raybeats.joins import range_join_broadcast
    t = pa.table({"id": pa.array(range(len(vals)), pa.int64()),
                  "value": pa.array(vals, pa.float64())})
    iv = pa.table({"lo": pa.array([a for a, _ in ivs], pa.float64()),
                   "hi": pa.array([b for _, b in ivs], pa.float64()),
                   "band": pa.array(range(len(ivs)), pa.int64())})
    got = sorted((r["id"], r["band"]) for r in range_join_broadcast(
        rd.from_arrow(t), iv, value_col="value", closed=closed)
        .take_all())
    v = np.array(vals, np.float64)
    exp = []
    for i, (a, b) in enumerate(ivs):
        m = (v >= a) & ((v <= b) if closed == "both" else (v < b))
        exp.extend((int(r), i) for r in np.nonzero(m)[0])
    assert got == sorted(exp)


@settings(max_examples=30, deadline=None)
@given(seed=st.integers(0, 10_000),
       direction=st.sampled_from(["backward", "forward"]),
       tol=st.sampled_from([None, 0, 5, 50]),
       nl=st.integers(1, 40), nr=st.integers(0, 40))
def test_asof_join_matches_pandas_merge_asof(ray_session, seed,
                                             direction, tol, nl, nr):
    """pandas.merge_asof is an independent reference implementation of
    the same contract (nearest by-key match, equal timestamps admit,
    inclusive tolerance): the distributed kernel must agree on
    arbitrary inputs. Right-side (key, ts) duplicates are excluded —
    both implementations pick deterministically but by different
    input-order conventions, which no shuffled distributed kernel can
    reproduce (the engine documents last-in-sort-order)."""
    import pandas as pd
    import ray.data as rd

    from raybeats.joins import asof_join
    rng = np.random.RandomState(seed)
    lt = pa.table({
        "lid": pa.array(range(nl), pa.int64()),
        "ts": pa.array(rng.randint(0, 100, nl) * 1_000_000,
                       pa.timestamp("us")),
        "user_id": pa.array(rng.randint(0, 4, nl), pa.int64())})
    # unique (key, ts) pairs on the right: tie-pick conventions differ
    pairs = {(int(k), int(t)) for k, t in zip(
        rng.randint(0, 4, nr), rng.randint(0, 100, nr))}
    rt = pa.table({
        "user_id": pa.array([k for k, _ in sorted(pairs)], pa.int64()),
        "ts": pa.array([t * 1_000_000 for _, t in sorted(pairs)],
                       pa.timestamp("us")),
        "rv": pa.array([k * 1000 + t for k, t in sorted(pairs)],
                       pa.int64())})
    got = asof_join(rd.from_arrow(lt), rd.from_arrow(rt), on="ts",
                    by="user_id", right_cols={"rv": "rv"},
                    direction=direction,
                    tolerance_us=None if tol is None else tol * 1_000_000,
                    how="left", n_buckets=3).take_all()
    got = {r["lid"]: r["rv"] for r in got}
    exp_df = pd.merge_asof(
        lt.to_pandas().sort_values("ts", kind="stable"),
        rt.to_pandas().sort_values("ts", kind="stable"),
        on="ts", by="user_id", direction=direction,
        tolerance=None if tol is None else pd.Timedelta(seconds=tol),
        allow_exact_matches=True)
    exp = {int(r.lid): (None if pd.isna(r.rv) else int(r.rv))
           for r in exp_df.itertuples()}
    assert got == exp, (seed, direction, tol)


@settings(max_examples=8, deadline=None)
@given(seed=st.integers(0, 1000),
       n_splits=st.integers(1, 5),
       n_buckets=st.integers(1, 9),
       mode=st.sampled_from(["sliding", "running"]))
def test_streaming_equals_batch_random_splits(ray_session, seed,
                                              n_splits, n_buckets, mode):
    """Randomized micro-batch boundaries × bucket counts × actor
    sharing: the round-3 watermark bug (another bucket's later-ts push
    folding a boundary tie early) lived exactly at such a boundary —
    sweep the space instead of trusting fixed splits. Ties ON the
    split boundary are planted deliberately (duplicate timestamps)."""
    import ray.data as rd

    from raybeats.streaming import (streaming_running_total,
                                    streaming_sliding_window)
    from raybeats.util import running_cents_fold
    rng = np.random.RandomState(seed)
    n = 60
    ts_vals = np.sort(rng.randint(0, 20, n)) * 60_000_000  # many ties
    t = pa.table({
        "event_id": pa.array(range(n), pa.int64()),
        "user_id": pa.array(rng.randint(0, 7, n), pa.int64()),
        "ts": pa.array(ts_vals, pa.timestamp("us")),
        "value": pa.array(rng.uniform(-5, 50, n).round(2), pa.float64())})
    cuts = sorted(set([0, n] + list(rng.randint(1, n, n_splits))))
    slices = [rd.from_arrow(t.slice(a, b - a))
              for a, b in zip(cuts, cuts[1:]) if b > a]
    if mode == "running":
        got = streaming_running_total(slices, n_buckets=n_buckets) \
            .to_pylist()
        exp = running_cents_fold(
            t.select(["event_id", "user_id", "ts", "value"]), {}) \
            .sort_by([("user_id", "ascending"),
                      ("event_id", "ascending")]).to_pylist()
        assert got == exp, (seed, n_splits, n_buckets)
    else:
        got = streaming_sliding_window(slices, window_minutes=5,
                                       n_buckets=n_buckets).to_pylist()
        # batch reference: per-user trailing RANGE-frame count
        df = t.to_pandas().sort_values(["user_id", "ts", "event_id"])
        out = {}
        for uid, u in df.groupby("user_id"):
            tsv = u["ts"].astype("int64").to_numpy()
            lo = np.searchsorted(tsv, tsv - 5 * 60_000_000, side="left")
            hi = np.searchsorted(tsv, tsv, side="right")
            for eid, c in zip(u["event_id"], (hi - lo)):
                out[int(eid)] = int(c)
        got_map = {r["event_id"]: r["n_trailing_hour"] for r in got}
        assert got_map == out, (seed, n_splits, n_buckets)
