"""Similarity search: brute-force exactness + LSH/IVF recall."""

import numpy as np
import pyarrow as pa
import ray.data as rd

from shacl_validator_ray.stages import similarity


def _emb(n=300, dim=16, seed=7):
    rng = np.random.RandomState(seed)
    m = rng.normal(size=(n, dim))
    return rd.from_arrow(pa.table({
        "vec_id": pa.array(range(n), pa.int64()),
        "embedding": pa.array([r.tolist() for r in m], pa.list_(pa.float32())),
        "label": pa.array([i % 5 for i in range(n)], pa.int32()),
    }))


def _numpy_topk(emb_ds, qids, k=5):
    df = emb_ds.to_pandas()
    m = np.stack(df["embedding"].to_numpy()).astype(np.float64)
    m = m / np.linalg.norm(m, axis=1, keepdims=True)
    ids = df["vec_id"].to_numpy()
    out = {}
    for q in qids:
        qi = list(ids).index(q)
        sims = m @ m[qi]
        order = sorted(range(len(ids)), key=lambda j: (-round(sims[j], 6), ids[j]))
        out[q] = [int(ids[j]) for j in order if ids[j] != q][:k]
    return out


def test_knn_bruteforce_exact():
    ds = _emb()
    got = similarity.knn_bruteforce(ds, [0, 1, 2], k=5).to_pandas()
    want = _numpy_topk(ds, [0, 1, 2])
    for q in (0, 1, 2):
        rows = got[got["qid"] == q].sort_values(["sim", "nid"],
                                                ascending=[False, True])
        assert list(rows["nid"]) == want[q]


def test_knn_ivf_recall():
    ds = _emb()
    got = similarity.knn_ivf(ds, [0, 1, 2], k=5, n_centroids=8, nprobe=4)
    df = got.to_pandas()
    want = _numpy_topk(ds, [0, 1, 2])
    hits = total = 0
    for q in (0, 1, 2):
        nids = set(df[df["qid"] == q]["nid"])
        hits += len(nids & set(want[q]))
        total += 5
    assert hits / total >= 0.6  # approximate: probes 4/8 lists


def test_knn_lsh_shape():
    df = similarity.knn_lsh(_emb(), [0, 1], k=3, n_planes=2).to_pandas()
    assert set(df.columns) == {"qid", "nid", "sim"}
    assert set(df["qid"]) <= {0, 1}
    assert (df.groupby("qid").size() <= 3).all()


def test_knn_lsh_multiprobe_recall():
    """flip-1 multiprobe over 2^4 buckets: probing 5/16 of the space must
    recover a solid fraction of the exact top-5 (and candidates are never
    materialized as whole buckets — map-side partials only)."""
    ds = _emb()
    df = similarity.knn_lsh(ds, [0, 1, 2], k=5, n_planes=4,
                            multiprobe=1).to_pandas()
    want = _numpy_topk(ds, [0, 1, 2])
    hits = total = 0
    for q in (0, 1, 2):
        hits += len(set(df[df["qid"] == q]["nid"]) & set(want[q]))
        total += 5
    assert hits / total >= 0.5, hits / total


def test_embedding_dup_pairs_ivf_recall():
    """IVF soft-assignment blocking recovers most exact near-dup pairs
    without any natural blocking key (the at-scale path for
    embedding_dup_pairs)."""
    from shacl_validator_ray.stages import dedup

    ds = _emb(n=200, dim=8, seed=3)
    exact = dedup.embedding_dup_pairs(
        ds.map_batches(lambda b: b.set_column(
            b.column_names.index("label"),
            "label", __import__("pyarrow").array([0] * b.num_rows,
                                                 __import__("pyarrow").int32())),
            batch_format="pyarrow"),
        tau=0.8).to_pandas()
    approx = dedup.embedding_dup_pairs_ivf(ds, tau=0.8, n_centroids=8,
                                           assign_k=2).to_pandas()
    exact_pairs = set(zip(exact["vec1"], exact["vec2"]))
    approx_pairs = set(zip(approx["vec1"], approx["vec2"]))
    assert approx_pairs <= exact_pairs  # no false pairs (sim is exact)
    assert len(exact_pairs) > 0
    assert len(approx_pairs & exact_pairs) / len(exact_pairs) >= 0.6


def test_knn_lsh_multiprobe_order_2_improves_or_matches_recall():
    """Hamming-≤2 probing must recall at least as much of the exact
    top-k as flip-1, and at multiprobe == n_planes the probe set covers
    every bucket → recall is exactly 1."""
    emb = _emb()
    exact = similarity.knn_bruteforce(emb, query_ids=[0, 1], k=5).to_pandas()

    def recall(mp):
        got = similarity.knn_lsh(emb, query_ids=[0, 1], k=5, n_planes=4,
                                 multiprobe=mp).to_pandas()
        hits = 0
        for q in (0, 1):
            e = set(exact.loc[exact["qid"] == q, "nid"])
            g = set(got.loc[got["qid"] == q, "nid"])
            hits += len(e & g)
        return hits / (2 * 5)

    r1, r2, r_all = recall(1), recall(2), recall(4)
    assert r2 >= r1
    assert r_all == 1.0


def test_knn_over_quantized_embeddings_recall():
    """8-bit quantized vectors support ANN: brute-force top-k over the
    dequantized corpus recovers almost all of the exact float top-k
    (the compression-for-ANN use the quantizer exists for)."""
    import pyarrow as pa
    import ray.data as rd

    ds = _emb(n=300, dim=16, seed=7)
    stats = similarity.embedding_quantization_stats(ds)
    lo, hi = stats
    q = (similarity.quantize_embeddings(ds).to_pandas()
         .sort_values(["vec_id", "dim"]))
    import numpy as np

    n = q["vec_id"].nunique()
    dim = q["dim"].max() + 1
    codes = q["q"].to_numpy().reshape(n, dim)
    step = (hi - lo) / 255.0
    deq = lo + codes * step
    ids = q["vec_id"].unique()
    deq_ds = rd.from_arrow(pa.table({
        "vec_id": pa.array(ids, pa.int64()),
        "embedding": pa.array([r.tolist() for r in deq],
                              pa.list_(pa.float32()))}))
    got = similarity.knn_bruteforce(deq_ds, [0, 1, 2], k=5).to_pandas()
    want = _numpy_topk(ds, [0, 1, 2])
    hits = total = 0
    for qid in (0, 1, 2):
        hits += len(set(got[got["qid"] == qid]["nid"]) & set(want[qid]))
        total += 5
    assert hits / total >= 0.8, hits / total
