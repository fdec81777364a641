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
    """IVF approximate top-k, MAP-SIDE (the :func:`knn_lsh` shape).

    Each query probes its ``nprobe`` nearest coarse centroids. The scan
    never shuffles the corpus: every batch assigns its rows to their
    nearest centroid with one matmul, keeps only rows whose list some
    query probes, emits LOCAL per-query top-2k partials, and a tiny
    ``qid`` groupby merges the partials. No task ever holds a whole IVF
    list (the previous ``groupby("ivf_list").map_groups`` put
    corpus/n_centroids rows — ~6e10 vectors at 10^12 docs with the
    default 16 lists — into one pandas group). Output schema matches
    :func:`knn_bruteforce`.
    """
    cents = train_ivf_centroids(emb, n_centroids, seed=seed, vec_col=vec_col)

    qrows = (emb.map_batches(
        lambda b: b.filter(pa.compute.is_in(b[id_col], value_set=pa.array(query_ids))),
        batch_format="pyarrow", zero_copy_batch=True).to_pandas())
    qrows = qrows.sort_values(id_col)
    qids = qrows[id_col].to_numpy()
    qm = _norm_rows(np.stack(qrows[vec_col].to_numpy()).astype(np.float64))
    probes = np.argsort(-(qm @ cents.T), axis=1)[:, :nprobe]
    probe_sets = [np.sort(p).astype(np.int64) for p in probes]
    all_probed = np.unique(np.concatenate(probe_sets))
    ref = ray.put((qids, qm, cents, probe_sets, all_probed))

    def partial_topk(b: pa.Table) -> pa.Table:
        qids_, qm_, cents_, probes_, allp_ = ray.get(ref)
        ids = np.asarray(b[id_col])
        m = _norm_rows(np.stack(b[vec_col].to_pylist()).astype(np.float64))
        lists = (m @ cents_.T).argmax(axis=1).astype(np.int64)
        cand = np.isin(lists, allp_)
        if not cand.any():
            return pa.table({"qid": pa.array([], pa.int64()),
                             "nid": pa.array([], pa.int64()),
                             "sim": pa.array([], pa.float64())})
        ids, m, lists = ids[cand], m[cand], lists[cand]
        sims = qm_ @ m.T  # (nq, ncand)
        out_q, out_n, out_s = [], [], []
        for qi in range(len(qids_)):
            allowed = np.isin(lists, probes_[qi])
            row, rids = sims[qi][allowed], ids[allowed]
            cnt = 0
            # lexsort: sim desc, ties broken by ascending neighbor id —
            # deterministic regardless of batch/partition composition.
            for j in np.lexsort((rids, -row)):
                if rids[j] == qids_[qi]:
                    continue
                out_q.append(int(qids_[qi])); out_n.append(int(rids[j]))
                out_s.append(round(float(row[j]), 6))
                cnt += 1
                if cnt >= 2 * k:  # local 2k margin (rounding-tie safety)
                    break
        return pa.table({"qid": pa.array(out_q, pa.int64()),
                         "nid": pa.array(out_n, pa.int64()),
                         "sim": pa.array(out_s, pa.float64())})

    partials = emb.map_batches(partial_topk, batch_format="pyarrow",
                               zero_copy_batch=True)

    def final_topk(g: pd.DataFrame) -> pd.DataFrame:
        return g.sort_values(["sim", "nid"], ascending=[False, True]).head(k)

    return partials.groupby("qid").map_groups(final_topk, batch_format="pandas")


def knn_lsh(emb: rd.Dataset, query_ids: list[int], k: int = 5, n_planes: int = 6,
            multiprobe: int = 1, seed: int = 42, id_col: str = "vec_id",
            vec_col: str = "embedding") -> rd.Dataset:
    """Approximate top-k via random-hyperplane LSH with MULTIPROBE.

    Each query probes its own sign bucket plus every bucket within
    hamming distance ``multiprobe`` of it (all plane-sign flip
    combinations up to that order). The scan is map-side: each batch
    keeps only rows whose bucket is probed by some query, emits LOCAL
    per-query top-2k partials, and a tiny final groupby merges — no
    bucket is ever materialized whole in one worker (the previous
    whole-bucket groupby held n/2^planes vectors per task, a scale
    ceiling). Probed fraction ≈ Σ_{r≤multiprobe} C(n_planes, r)
    / 2^n_planes of the corpus per query.
    """
    from itertools import combinations

    qrows = (emb.map_batches(
        lambda b: b.filter(pa.compute.is_in(b[id_col], value_set=pa.array(query_ids))),
        batch_format="pyarrow", zero_copy_batch=True).to_pandas())
    qrows = qrows.sort_values(id_col)
    qids = qrows[id_col].to_numpy()
    qm = _norm_rows(np.stack(qrows[vec_col].to_numpy()).astype(np.float64))
    rng = np.random.RandomState(seed)
    planes = rng.normal(size=(qm.shape[1], n_planes))
    weights = (1 << np.arange(n_planes)).astype(np.int64)
    qbuckets = (((qm @ planes) > 0) @ weights).astype(np.int64)
    probes = []  # per query: every bucket within hamming ≤ multiprobe
    for qb in qbuckets:
        ps = {int(qb)}
        for r in range(1, min(multiprobe, n_planes) + 1):
            for combo in combinations(range(n_planes), r):
                mask = 0
                for i in combo:
                    mask |= 1 << i
                ps.add(int(qb ^ mask))
        probes.append(np.array(sorted(ps), dtype=np.int64))
    all_probed = np.unique(np.concatenate(probes))
    ref = ray.put((qids, qm, planes, weights, probes, all_probed))

    def partial_topk(b: pa.Table) -> pa.Table:
        qids_, qm_, planes_, w_, probes_, allp_ = ray.get(ref)
        ids = np.asarray(b[id_col])
        m = np.stack(b[vec_col].to_pylist()).astype(np.float64)
        buckets = (((m @ planes_) > 0) @ w_).astype(np.int64)
        cand = np.isin(buckets, allp_)
        if not cand.any():
            return pa.table({"qid": pa.array([], pa.int64()),
                             "nid": pa.array([], pa.int64()),
                             "sim": pa.array([], pa.float64())})
        ids, m, buckets = ids[cand], _norm_rows(m[cand]), buckets[cand]
        sims = qm_ @ m.T  # (nq, ncand)
        out_q, out_n, out_s = [], [], []
        for qi in range(len(qids_)):
            allowed = np.isin(buckets, probes_[qi])
            row, rids = sims[qi][allowed], ids[allowed]
            cnt = 0
            # lexsort: sim desc, ties broken by ascending neighbor id —
            # deterministic regardless of batch/partition composition.
            for j in np.lexsort((rids, -row)):
                if rids[j] == qids_[qi]:
                    continue
                out_q.append(int(qids_[qi])); out_n.append(int(rids[j]))
                out_s.append(round(float(row[j]), 6))
                cnt += 1
                if cnt >= 2 * k:
                    break
        return pa.table({"qid": pa.array(out_q, pa.int64()),
                         "nid": pa.array(out_n, pa.int64()),
                         "sim": pa.array(out_s, pa.float64())})

    partials = emb.map_batches(partial_topk, batch_format="pyarrow",
                               zero_copy_batch=True)

    def final_topk(g: pd.DataFrame) -> pd.DataFrame:
        return g.sort_values(["sim", "nid"], ascending=[False, True]).head(k)

    return partials.groupby("qid").map_groups(final_topk, batch_format="pandas")



def _label_dim_partials(label_col: str, vec_col: str):
    """Batch fn: per-batch (labels × dims) sum matrix + counts as rows —
    the fixed-size centroid partial shared by label_centroids and
    centroid_confusion."""

    def partials(b: pa.Table) -> pa.Table:
        labels = np.asarray(b[label_col].to_pandas(), dtype=np.int64)
        m = np.stack(b[vec_col].to_pandas().to_numpy()).astype(np.float64)
        uniq, inv = np.unique(labels, return_inverse=True)
        sums = np.zeros((len(uniq), m.shape[1]), dtype=np.float64)
        np.add.at(sums, inv, m)
        counts = np.bincount(inv, minlength=len(uniq)).astype(np.int64)
        n_lab, dim = sums.shape
        return pa.table({
            label_col: pa.array(np.repeat(uniq, dim), pa.int64()),
            "dim": pa.array(np.tile(np.arange(dim, dtype=np.int64), n_lab)),
            "s": pa.array(sums.ravel(), pa.float64()),
            "n": pa.array(np.repeat(counts, dim), pa.int64())})

    return partials


def label_centroids(emb: rd.Dataset, id_col: str = "vec_id",
                    vec_col: str = "embedding",
                    label_col: str = "label") -> rd.Dataset:
    """Per-label embedding centroid as (label, dim, c) rows — the
    textbook partial-aggregation shape: each batch reduces to one
    (labels × dims) sum matrix + counts (vectorized ``np.add.at``),
    those fixed-size partials shuffle through a (label, dim) groupby,
    and the final map divides. The full embedding table never
    concentrates anywhere; partial size is independent of batch row
    count."""
    from ray.data.aggregate import Sum

    partials = _label_dim_partials(label_col, vec_col)

    agg = (emb.map_batches(partials, batch_format="pyarrow",
                           zero_copy_batch=True)
           .groupby([label_col, "dim"])
           .aggregate(Sum("s", alias_name="s"), Sum("n", alias_name="n")))

    def finish(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        return pa.table({
            label_col: b[label_col].cast(pa.int64()),
            "dim": b["dim"].cast(pa.int64()),
            "c": pc.round(pc.divide(b["s"].cast(pa.float64()),
                                    b["n"].cast(pa.float64())), 6)})

    return agg.map_batches(finish, batch_format="pyarrow")


def centroid_confusion(emb: rd.Dataset, id_col: str = "vec_id",
                       vec_col: str = "embedding",
                       label_col: str = "label") -> rd.Dataset:
    """Nearest-centroid classification eval: assign every vector to the
    label centroid with the highest cosine similarity (ties → smallest
    label) and report the (true label, predicted label, n) confusion
    counts. Centroids come from the distributed partial-sum aggregate
    (fixed labels × dims size), are collected once and broadcast; the
    assignment is one vectorized matmul per batch; the confusion table
    is one tiny groupby."""
    from ray.data.aggregate import Count, Sum

    partials = _label_dim_partials(label_col, vec_col)

    agg = (emb.map_batches(partials, batch_format="pyarrow",
                           zero_copy_batch=True)
           .groupby([label_col, "dim"])
           .aggregate(Sum("s", alias_name="s"), Sum("n", alias_name="n"))
           .to_pandas())  # fixed size: labels × dims
    agg = agg.sort_values([label_col, "dim"])
    labels_sorted = sorted(agg[label_col].unique())
    cent = np.stack([
        (agg.loc[agg[label_col] == lb, "s"].to_numpy()
         / agg.loc[agg[label_col] == lb, "n"].to_numpy())
        for lb in labels_sorted])
    cent_n = cent / np.linalg.norm(cent, axis=1, keepdims=True)
    ref = ray.put((np.asarray(labels_sorted, dtype=np.int64), cent_n))

    def assign(b: pa.Table) -> pa.Table:
        lbls, cn = ray.get(ref)
        m = np.stack(b[vec_col].to_pandas().to_numpy()).astype(np.float64)
        mn = _norm_rows(m)
        sims = mn @ cn.T
        # argmax with min-label tie-break: labels_sorted is ascending,
        # np.argmax returns the FIRST maximal index
        pred = lbls[np.argmax(sims, axis=1)]
        return pa.table({
            "label": pa.array(np.asarray(b[label_col].to_pandas(),
                                         dtype=np.int64), pa.int64()),
            "pred_label": pa.array(pred, pa.int64())})

    out = (emb.map_batches(assign, batch_format="pyarrow",
                           zero_copy_batch=True)
           .groupby(["label", "pred_label"])
           .aggregate(Count(alias_name="n")))
    return out.map_batches(
        lambda b: pa.table({"label": b["label"].cast(pa.int64()),
                            "pred_label": b["pred_label"].cast(pa.int64()),
                            "n": b["n"].cast(pa.int64())}),
        batch_format="pyarrow")


def embedding_quantization_stats(emb: rd.Dataset,
                                 vec_col: str = "embedding") -> "np.ndarray":
    """Per-dimension (lo, hi) ranges as a (2, dims) float64 array from
    FIXED-SIZE mergeable partials: each batch reduces to one per-dim
    min/max row pair, the tiny partials fold on the driver. One pass,
    no shuffle — the quantizer-training shape."""
    lo = None
    hi = None

    def partial(b: pa.Table) -> pa.Table:
        m = np.stack(b[vec_col].to_pylist()).astype(np.float64)
        return pa.table({
            "lo": pa.array([m.min(axis=0).tolist()], pa.list_(pa.float64())),
            "hi": pa.array([m.max(axis=0).tolist()], pa.list_(pa.float64()))})

    for b in emb.map_batches(partial, batch_format="pyarrow",
                             zero_copy_batch=True).iter_batches(
                                 batch_format="pyarrow"):
        for l, h in zip(b["lo"].to_pylist(), b["hi"].to_pylist()):
            l, h = np.asarray(l), np.asarray(h)
            lo = l if lo is None else np.minimum(lo, l)
            hi = h if hi is None else np.maximum(hi, h)
    return np.stack([lo, hi])


def quantize_embeddings(emb: rd.Dataset, id_col: str = "vec_id",
                        vec_col: str = "embedding") -> rd.Dataset:
    """Symmetric 8-bit scalar quantization of an embedding column (the
    standard ANN compression step): per-dim ranges from one mergeable
    stats pass, then a vectorized per-batch map emits
    ``q = floor((v - lo) * 255 / (hi - lo) + 0.5)`` (half-up — floor
    +0.5 on BOTH the engine and the SQL oracle, so rounding never
    diverges). Output LONG format (vec_id, dim, q) for the exact
    oracle; :func:`dequantize_error_bound` pins |v - deq| ≤ step/2."""
    stats = embedding_quantization_stats(emb, vec_col)
    ref = ray.put(stats)

    def quant(b: pa.Table) -> pa.Table:
        lo, hi = ray.get(ref)
        m = np.stack(b[vec_col].to_pylist()).astype(np.float64)
        rng = hi - lo
        safe = np.where(rng == 0, 1.0, rng)
        q = np.floor((m - lo) * 255.0 / safe + 0.5)
        q = np.where(rng == 0, 0.0, q).astype(np.int64)
        n, d = m.shape
        ids = np.repeat(np.asarray(b[id_col], dtype=np.int64), d)
        return pa.table({
            id_col: pa.array(ids, pa.int64()),
            "dim": pa.array(np.tile(np.arange(d, dtype=np.int64), n)),
            "q": pa.array(q.ravel(), pa.int64())})

    return emb.map_batches(quant, batch_format="pyarrow",
                           zero_copy_batch=True)
