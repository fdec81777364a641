"""Similarity search over an embedding column (``list<float>``).

Brute-force cosine top-k is the exact baseline: the query matrix is
broadcast once (``ray.put``), each batch does one numpy matmul and emits
its LOCAL top-k per query (partial top-k combiner), and a final tiny
groupby keeps the global top-k — so the full score matrix never exists.

The scale path is an LSH-bucketed variant: random-hyperplane signs
bucket vectors; queries probe only their own bucket (approximate).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data as rd


def _norm_rows(m: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(m, axis=1, keepdims=True)
    n[n == 0] = 1.0
    return m / n


def knn_bruteforce(emb: rd.Dataset, query_ids: list[int], k: int = 5,
                   id_col: str = "vec_id", vec_col: str = "embedding") -> rd.Dataset:
    """Exact top-k cosine neighbors for each query id (queries drawn from the
    same table). Output: (qid, nid, sim) with deterministic tie-break on nid."""
    qset = set(query_ids)
    qrows = (emb.map_batches(
        lambda b: b.filter(pa.compute.is_in(b[id_col], value_set=pa.array(query_ids))),
        batch_format="pyarrow", zero_copy_batch=True)
        .to_pandas())
    qrows = qrows.sort_values(id_col)
    qids = qrows[id_col].to_numpy()
    qm = _norm_rows(np.stack(qrows[vec_col].to_numpy()).astype(np.float64))
    ref = ray.put((qids, qm))

    def partial_topk(b: pa.Table) -> pa.Table:
        qids_, qm_ = ray.get(ref)
        ids = np.asarray(b[id_col])
        m = _norm_rows(np.stack(b[vec_col].to_pylist()).astype(np.float64))
        sims = qm_ @ m.T  # (nq, nb)
        out_q, out_n, out_s = [], [], []
        for qi in range(len(qids_)):
            row = sims[qi]
            cnt = 0
            for j in np.argsort(-row, kind="stable"):
                if ids[j] == qids_[qi]:
                    continue  # a vector is not its own neighbor
                out_q.append(int(qids_[qi])); out_n.append(int(ids[j]))
                out_s.append(round(float(row[j]), 6))
                cnt += 1
                if cnt >= 2 * k:  # local 2k margin so rounding ties can't drop a global top-k row
                    break
        return pa.table({"qid": pa.array(out_q, pa.int64()),
                         "nid": pa.array(out_n, pa.int64()),
                         "sim": pa.array(out_s, pa.float64())})

    partials = emb.map_batches(partial_topk, batch_format="pyarrow", zero_copy_batch=True)

    def final_topk(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["sim", "nid"], ascending=[False, True]).head(k)
        return g

    return partials.groupby("qid").map_groups(final_topk, batch_format="pandas")


def train_ivf_centroids(emb: rd.Dataset, n_centroids: int = 16, iters: int = 5,
                        sample: int = 2048, seed: int = 42,
                        vec_col: str = "embedding") -> np.ndarray:
    """Coarse quantizer for IVF: Lloyd's k-means on a driver-side sample
    (the standard IVF train step — sample size is fixed regardless of
    corpus size; assignment below streams)."""
    take = emb.limit(sample).to_pandas()
    m = _norm_rows(np.stack(take[vec_col].to_numpy()).astype(np.float64))
    rng = np.random.RandomState(seed)
    cents = m[rng.choice(len(m), size=min(n_centroids, len(m)), replace=False)]
    for _ in range(iters):
        assign = (m @ cents.T).argmax(axis=1)
        for c in range(len(cents)):
            mask = assign == c
            if mask.any():
                v = m[mask].mean(axis=0)
                n = np.linalg.norm(v)
                if n > 0:
                    cents[c] = v / n
    return cents


def knn_ivf(emb: rd.Dataset, query_ids: list[int], k: int = 5,
            n_centroids: int = 16, nprobe: int = 4, seed: int = 42,
            id_col: str = "vec_id", vec_col: str = "embedding") -> rd.Dataset:
    """IVF approximate top-k: vectors are assigned to their nearest
    centroid (one streaming pass); each query probes only its ``nprobe``
    nearest centroid lists. Output schema matches :func:`knn_bruteforce`.
    """
    cents = train_ivf_centroids(emb, n_centroids, seed=seed, vec_col=vec_col)
    cref = ray.put(cents)

    def assign(b: pa.Table) -> pa.Table:
        c = ray.get(cref)
        m = _norm_rows(np.stack(b[vec_col].to_pylist()).astype(np.float64))
        lists = (m @ c.T).argmax(axis=1)
        return b.append_column("ivf_list", pa.array(lists.astype(np.int64)))

    assigned = emb.map_batches(assign, batch_format="pyarrow", zero_copy_batch=True)

    qrows = (emb.map_batches(
        lambda b: b.filter(pa.compute.is_in(b[id_col], value_set=pa.array(query_ids))),
        batch_format="pyarrow", zero_copy_batch=True).to_pandas())
    qm = _norm_rows(np.stack(qrows[vec_col].to_numpy()).astype(np.float64))
    probes = np.argsort(-(qm @ cents.T), axis=1)[:, :nprobe]
    probe_of = {int(q): set(map(int, p)) for q, p in zip(qrows[id_col], probes)}
    pref = ray.put((probe_of, {int(q): qm[i] for i, q in enumerate(qrows[id_col])}))

    def per_list(g: pd.DataFrame) -> pd.DataFrame:
        probe_map, qvecs = ray.get(pref)
        lid = int(g["ivf_list"].iloc[0])
        qids = [q for q, ps in probe_map.items() if lid in ps]
        if not qids:
            return pd.DataFrame({"qid": pd.array([], dtype="int64"),
                                 "nid": pd.array([], dtype="int64"),
                                 "sim": pd.array([], dtype="float64")})
        ids = g[id_col].to_numpy()
        m = _norm_rows(np.stack(g[vec_col].to_numpy()).astype(np.float64))
        out_q, out_n, out_s = [], [], []
        for q in qids:
            sims = m @ qvecs[q]
            order = sorted(range(len(ids)), key=lambda j: (-sims[j], ids[j]))
            cnt = 0
            for j in order:
                if ids[j] == q:
                    continue
                out_q.append(q); out_n.append(int(ids[j]))
                out_s.append(round(float(sims[j]), 6))
                cnt += 1
                if cnt >= k:
                    break
        return pd.DataFrame({"qid": pd.array(out_q, dtype="int64"),
                             "nid": pd.array(out_n, dtype="int64"),
                             "sim": pd.array(out_s, dtype="float64")})

    partials = assigned.groupby("ivf_list").map_groups(per_list, batch_format="pandas")

    def final_topk(g: pd.DataFrame) -> pd.DataFrame:
        return g.sort_values(["sim", "nid"], ascending=[False, True]).head(k)

    return partials.groupby("qid").map_groups(final_topk, batch_format="pandas")


class _LSHBucketer:
    """Random-hyperplane LSH bucketing (stateful: planes built once per
    actor, lazily sized to the embedding dim of the first batch)."""

    def __init__(self, dim: int, n_planes: int, seed: int, id_col: str, vec_col: str):
        self.dim, self.n_planes, self.seed = dim, n_planes, seed
        self.planes: np.ndarray | None = None
        self.id_col, self.vec_col = id_col, vec_col

    def __call__(self, b: pa.Table) -> pa.Table:
        m = np.stack(b[self.vec_col].to_pylist()).astype(np.float64)
        if self.planes is None or self.planes.shape[0] != m.shape[1]:
            rng = np.random.RandomState(self.seed)
            self.planes = rng.normal(size=(m.shape[1], self.n_planes))
        signs = (m @ self.planes) > 0
        bucket = signs @ (1 << np.arange(signs.shape[1]))
        return b.append_column("bucket", pa.array(bucket.astype(np.int64)))


def knn_lsh(emb: rd.Dataset, query_ids: list[int], k: int = 5, n_planes: int = 4,
            seed: int = 42, dim: int = 64, id_col: str = "vec_id",
            vec_col: str = "embedding", concurrency: int = 2) -> rd.Dataset:
    """Approximate top-k: probe only the query's LSH bucket.

    At scale this replaces the brute-force scan with a bucket-key groupby;
    recall depends on n_planes (fewer planes → bigger buckets → higher recall).
    """
    bucketed = emb.map_batches(
        _LSHBucketer, fn_constructor_args=(dim, n_planes, seed, id_col, vec_col),
        batch_format="pyarrow", concurrency=concurrency, batch_size=4096)

    qset = set(query_ids)

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        qs = g[g[id_col].isin(qset)]
        if qs.empty:
            return pd.DataFrame({"qid": pd.array([], dtype="int64"),
                                 "nid": pd.array([], dtype="int64"),
                                 "sim": pd.array([], dtype="float64")})
        m = _norm_rows(np.stack(g[vec_col].to_numpy()).astype(np.float64))
        ids = g[id_col].to_numpy()
        qm = _norm_rows(np.stack(qs[vec_col].to_numpy()).astype(np.float64))
        sims = qm @ m.T
        out_q, out_n, out_s = [], [], []
        for qi, qid in enumerate(qs[id_col].to_numpy()):
            order = sorted(range(len(ids)), key=lambda j: (-sims[qi, j], ids[j]))
            cnt = 0
            for j in order:
                if ids[j] == qid:
                    continue
                out_q.append(int(qid)); out_n.append(int(ids[j]))
                out_s.append(round(float(sims[qi, j]), 6))
                cnt += 1
                if cnt >= k:
                    break
        return pd.DataFrame({"qid": pd.array(out_q, dtype="int64"),
                             "nid": pd.array(out_n, dtype="int64"),
                             "sim": pd.array(out_s, dtype="float64")})

    return bucketed.groupby("bucket").map_groups(per_bucket, batch_format="pandas")
