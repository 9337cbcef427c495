"""Round-5 property tests: the vectorized varying-slice kernel against
python slice semantics, streaming dedup against the batch first-per-key
rule under arbitrary micro-batch splits, and both triangle plans
against a brute-force triangle counter on random graphs.

Pure-kernel properties (no Ray) run at full example counts; the two
Ray-driven properties keep tiny example counts — each example spins
actors/executions, and the deterministic seeds already cover the
boundary shapes the kernels defend (equal-ts straddles, duplicate
edges, empty segments)."""
import numpy as np
import pyarrow as pa
from hypothesis import given, settings, strategies as st


# ---------------------------------------------------------- slice kernel

texts = st.lists(
    st.text(alphabet=st.characters(codec="utf-8"), max_size=12),
    min_size=1, max_size=20)


@settings(max_examples=200, deadline=None)
@given(vals=texts, data=st.data())
def test_slice_varstart_matches_python(vals, data):
    from raybeats.queries import _slice_varstart
    n = len(vals)
    st_pos = data.draw(st.lists(st.integers(-15, 15),
                                min_size=n, max_size=n))
    en_pos = data.draw(st.lists(st.integers(-15, 15),
                                min_size=n, max_size=n))
    got = _slice_varstart(pa.array(vals, pa.string()),
                          pa.array(st_pos, pa.int64()),
                          pa.array(en_pos, pa.int64()))
    assert got.to_pylist() == [v[a:b] for v, a, b
                               in zip(vals, st_pos, en_pos)]


# ------------------------------------------------------- streaming dedup

def _dedup_want(keys, ts, eids):
    """First (ts, event_id) row per non-null key + null passthrough."""
    best = {}
    for k, t, e in zip(keys, ts, eids):
        if k is None:
            continue
        if k not in best or (t, e) < best[k]:
            best[k] = (t, e)
    rows = [(k, e) for k, (t, e) in best.items()]
    rows += [(None, e) for k, t, e in zip(keys, ts, eids) if k is None]
    return sorted(rows, key=lambda r: (r[0] is None, r[0], r[1]))


@settings(max_examples=10, deadline=None)
@given(data=st.data())
def test_streaming_dedup_any_split(ray_session, data):
    import ray.data as rd

    from raybeats.streaming import streaming_dedup_by_id
    n = data.draw(st.integers(5, 40))
    keys = data.draw(st.lists(
        st.one_of(st.none(), st.integers(0, 6)), min_size=n, max_size=n))
    ts = sorted(data.draw(st.lists(st.integers(0, 10),
                                   min_size=n, max_size=n)))
    eids = list(range(n))
    t = pa.table({"k": pa.array(keys, pa.int64()),
                  "ts": pa.array(ts, pa.int64())
                  .cast(pa.timestamp("us")),
                  "event_id": pa.array(eids, pa.int64())})
    cut = data.draw(st.integers(0, n))
    slices = [s for s in (t.slice(0, cut), t.slice(cut)) if s.num_rows]
    got = streaming_dedup_by_id([rd.from_arrow(s) for s in slices],
                                n_buckets=3)
    rows = sorted(((r["k"], r["event_id"]) for r in got.to_pylist()),
                  key=lambda r: (r[0] is None, r[0], r[1]))
    assert rows == _dedup_want(keys, ts, eids)


# ------------------------------------------------------- triangle plans

def _brute_triangles(pairs):
    """Brute-force per-node triangle participation over (order, part)
    rows."""
    from collections import defaultdict
    from itertools import combinations
    by_order = defaultdict(set)
    for o, p in pairs:
        by_order[o].add(p)
    edges = set()
    for parts in by_order.values():
        for a, b in combinations(sorted(parts), 2):
            edges.add((a, b))
    counts = defaultdict(int)
    nodes = sorted({x for e in edges for x in e})
    eset = edges
    for i, a in enumerate(nodes):
        for b in nodes[i + 1:]:
            if (a, b) not in eset:
                continue
            for c in nodes[nodes.index(b) + 1:]:
                if (a, c) in eset and (b, c) in eset:
                    for x in (a, b, c):
                        counts[x] += 1
    top = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:25]
    return [{"l_partkey": k, "n_triangles": v} for k, v in top]


@settings(max_examples=6, deadline=None)
@given(data=st.data())
def test_triangle_plans_match_brute(ray_session, data, tmp_path_factory):
    import pyarrow.parquet as pq

    from raybeats.queries import q_triangle_parts
    n = data.draw(st.integers(6, 60))
    pairs = [(data.draw(st.integers(0, 8)), data.draw(st.integers(0, 9)))
             for _ in range(n)]
    d = tmp_path_factory.mktemp("tri")
    pq.write_table(pa.table({
        "l_orderkey": pa.array([p[0] for p in pairs], pa.int64()),
        "l_partkey": pa.array([p[1] for p in pairs], pa.int64())}),
        d / "lineitem.parquet")
    want = _brute_triangles(pairs)
    dist = q_triangle_parts(str(d), edge_budget=0)
    bcast = q_triangle_parts(str(d), edge_budget=1 << 40)
    assert dist.to_pylist() == want
    assert bcast.to_pylist() == want
