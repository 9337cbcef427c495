import numpy as np
import pyarrow.dataset as pads
import pyarrow.compute as pc

SF = "/root/testdata/sf0.001"


def _queries():
    qt = pads.dataset(f"{SF}/embeddings.parquet").to_table(
        filter=pc.field("vec_id") < 3).sort_by("vec_id")
    q = np.array(qt.column("embedding").to_pylist(), dtype=np.float64)
    return q, qt.column("vec_id").to_pylist()


def test_ivf_full_probe_equals_brute_force(ray_session):
    import ray.data as rd

    from raybeats.textops.knn import IvfIndex, knn_topk

    ds = rd.read_parquet(f"{SF}/embeddings.parquet",
                         columns=["vec_id", "embedding"])
    q, qids = _queries()
    brute = knn_topk(ds, q, qids, k=5).to_pylist()
    index = IvfIndex.build(ds, n_centroids=8, seed=7)
    full = index.search(ds, q, qids, k=5, nprobe=8).to_pylist()
    assert sorted(map(tuple, (r.values() for r in full))) == \
        sorted(map(tuple, (r.values() for r in brute)))


def test_ivf_probe_subset_recall(ray_session):
    import ray.data as rd

    from raybeats.textops.knn import IvfIndex, knn_topk

    ds = rd.read_parquet(f"{SF}/embeddings.parquet",
                         columns=["vec_id", "embedding"])
    q, qids = _queries()
    brute = {(r["query_id"], r["neighbor_id"])
             for r in knn_topk(ds, q, qids, k=5).to_pylist()}
    index = IvfIndex.build(ds, n_centroids=8, seed=7)
    approx = {(r["query_id"], r["neighbor_id"])
              for r in index.search(ds, q, qids, k=5, nprobe=4).to_pylist()}
    # probing half the lists keeps useful recall even on uniform vectors
    assert len(approx & brute) / len(brute) >= 0.2
    assert all(len([1 for a in approx if a[0] == qid]) <= 5 for qid in qids)


def test_ivf_partitioned_layout_prunes_at_read(ray_session, tmp_path):
    """write_ivf_partitioned + search_ivf_partitioned: reading only the
    probed centroid dirs returns exactly IvfIndex.search on the full
    dataset; unprobed lanes never leave storage."""
    import glob
    import numpy as np
    import pyarrow.parquet as pq
    import ray.data as rd

    from raybeats.textops.knn import (IvfIndex, search_ivf_partitioned,
                                      write_ivf_partitioned)

    sf = "/root/testdata/sf0.01"
    full = pq.read_table(f"{sf}/embeddings.parquet",
                         columns=["vec_id", "embedding"])
    ds = rd.from_arrow(full).repartition(8)
    index = IvfIndex.build(ds, n_centroids=8, seed=7)
    out = str(tmp_path / "ivf")
    lanes = write_ivf_partitioned(ds, index, out)
    assert sum(lanes.values()) == full.num_rows and len(lanes) > 2

    queries = np.array(full.column("embedding").to_pylist()[:3],
                       dtype=np.float64)
    qids = full.column("vec_id").to_pylist()[:3]
    got = search_ivf_partitioned(out, index, queries, qids, k=5, nprobe=2)
    want = index.search(rd.from_arrow(full), queries, qids, k=5, nprobe=2)
    assert got.to_pylist() == want.to_pylist()
    # pruning is real: more lanes exist than a 3-query nprobe=2 union
    assert len(glob.glob(out + "/centroid=*")) >= 3
