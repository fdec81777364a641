"""Deduplication stages: exact, all-pairs Jaccard (blocked), MinHash+LSH,
SimHash, embedding-cosine near-dup.

Scale shape: exact dedup = hash-partition + per-group first; near-dup =
per-batch signature computation (``map_batches``) → explode to
(band, hash) rows → ``groupby`` banding buckets → candidate pairs →
exact verification. No stage materializes the full corpus on the driver.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from ..functions import textfns as tf


# --- exact dedup: keep min-id row per normalized-text group (D1) ---
def exact_dedup(docs: rd.Dataset, id_col: str = "doc_id", text_col: str = "text") -> rd.Dataset:
    def fp(b: pa.Table) -> pa.Table:
        texts = b.column(text_col).to_pylist()
        return b.append_column(
            "fp", pa.array([tf.md5_fingerprint(t or "") for t in texts], pa.string()))

    def first(g: pd.DataFrame) -> pd.DataFrame:
        return g.sort_values(id_col).head(1).drop(columns=["fp"])

    return (docs.map_batches(fp, batch_format="pyarrow", zero_copy_batch=True)
                .groupby("fp").map_groups(first, batch_format="pandas"))


# --- all-pairs word-set Jaccard within blocks (n-gram Jaccard dedup oracle) ---
def jaccard_dup_pairs(docs: rd.Dataset, block_col: str = "lang", tau: float = 0.95,
                      id_col: str = "doc_id", text_col: str = "text") -> rd.Dataset:
    """Exact all-pairs Jaccard inside each block (baseline / oracle path;
    the scale path is :func:`minhash_lsh_dup_pairs`)."""

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        rows = sorted(zip(g[id_col], g[text_col]))
        sets = [(i, tf.word_set(t)) for i, t in rows]
        d1, d2, jac = [], [], []
        for a in range(len(sets)):
            for b in range(a + 1, len(sets)):
                j = tf.jaccard(sets[a][1], sets[b][1])
                if j >= tau:
                    d1.append(sets[a][0]); d2.append(sets[b][0]); jac.append(round(j, 6))
        return pd.DataFrame({"doc1": pd.array(d1, dtype="int64"),
                             "doc2": pd.array(d2, dtype="int64"),
                             "jac": pd.array(jac, dtype="float64")})

    return docs.groupby(block_col).map_groups(pairs, batch_format="pandas")


class _MinHashStage:
    """Actor-pool stage: compile the MinHasher once per actor (T5 shape).

    Emits one row per (doc, band) carrying the FULL band-hash vector —
    needed downstream for the first-matching-band trick."""

    def __init__(self, n_perm: int, n_bands: int, id_col: str, text_col: str,
                 block_col: str | None):
        self.mh = tf.MinHasher(n_perm=n_perm)
        self.n_bands = n_bands
        self.id_col, self.text_col, self.block_col = id_col, text_col, block_col

    def __call__(self, b: pa.Table) -> pa.Table:
        blocks = (b.column(self.block_col).to_pylist() if self.block_col
                  else [""] * b.num_rows)
        ids, blk, bands, bhash, allb = [], [], [], [], []
        for i, t, bl in zip(b.column(self.id_col).to_pylist(),
                            b.column(self.text_col).to_pylist(), blocks):
            sig = self.mh.signature(tf.word_set(t or ""))
            hs = [np.int64(np.uint64(h).astype(np.int64))
                  for h in self.mh.bands(sig, self.n_bands)]
            for bi, h in enumerate(hs):
                ids.append(i); blk.append(bl); bands.append(bi); bhash.append(h)
                allb.append(hs)
        return pa.table({
            self.id_col: pa.array(ids, pa.int64()),
            "block": pa.array(blk, pa.string()),
            "band": pa.array(bands, pa.int32()),
            "bhash": pa.array(bhash, pa.int64()),
            "all_bands": pa.array(allb, pa.list_(pa.int64())),
        })


def minhash_lsh_dup_pairs(docs: rd.Dataset, tau: float = 0.95, n_perm: int = 32,
                          n_bands: int = 8, id_col: str = "doc_id",
                          text_col: str = "text", block_col: str | None = "lang",
                          concurrency: int = 4, n_buckets: int = 64) -> rd.Dataset:
    """MinHash+LSH near-dup: signature → band rows → ONE shuffle keyed by
    bucket-hash → vectorized within-bucket pair generation → exact-Jaccard
    verification.

    Each candidate pair is emitted exactly once — from its FIRST matching
    band (a pair in bucket (band i, h) is skipped when its band-hash
    vectors already agree at some band j < i) — so no global pair-dedup
    shuffle is needed. r = n_perm/n_bands = 4 rows/band keeps low-Jaccard
    pairs out of the candidate set while recall at τ=0.95 stays ~1-1e-6.

    The verification side table (id → word-set) is broadcast; at 100 TB it
    would be replaced by a join of candidate pairs back to the text table
    (same bucket key), keeping everything distributed.
    """
    import hashlib

    import ray

    texts_tbl = pa.concat_tables(
        docs.select_columns([id_col, text_col]).iter_batches(batch_format="pyarrow"))
    lookup = {i: tf.word_set(t or "") for i, t in
              zip(texts_tbl.column(id_col).to_pylist(), texts_tbl.column(text_col).to_pylist())}
    ref = ray.put(lookup)

    band_rows = docs.map_batches(
        _MinHashStage, fn_constructor_args=(n_perm, n_bands, id_col, text_col, block_col),
        batch_format="pyarrow", concurrency=concurrency, batch_size=1024)

    def add_bucket(b: pa.Table) -> pa.Table:
        bk = [int.from_bytes(
            hashlib.blake2b(f"{bl}|{bd}|{h}".encode(), digest_size=4).digest(),
            "little") % n_buckets
            for bl, bd, h in zip(b["block"].to_pylist(), b["band"].to_pylist(),
                                 b["bhash"].to_pylist())]
        return b.append_column("bucket", pa.array(bk, pa.int32()))

    bucketed = band_rows.map_batches(add_bucket, batch_format="pyarrow")

    def gen_pairs(g: pd.DataFrame) -> pd.DataFrame:
        d1, d2 = [], []
        for (_, band, _), sub in g.groupby(["block", "band", "bhash"], sort=False):
            if len(sub) < 2:
                continue
            sub = sub.sort_values(id_col)
            ids = sub[id_col].to_numpy()
            ab = np.stack(sub["all_bands"].to_numpy())  # (n, n_bands)
            iu, ju = np.triu_indices(len(ids), k=1)
            if band > 0:
                # first-matching-band: drop pairs already caught earlier
                earlier = (ab[iu, :band] == ab[ju, :band]).any(axis=1)
                iu, ju = iu[~earlier], ju[~earlier]
            d1.extend(ids[iu]); d2.extend(ids[ju])
        return pd.DataFrame({"doc1": pd.array(d1, dtype="int64"),
                             "doc2": pd.array(d2, dtype="int64")})

    cand = bucketed.groupby("bucket").map_groups(gen_pairs, batch_format="pandas")

    def verify(b: pa.Table) -> pa.Table:
        lk = ray.get(ref)
        d1o, d2o, jo = [], [], []
        for x, y in zip(b["doc1"].to_pylist(), b["doc2"].to_pylist()):
            j = tf.jaccard(lk[x], lk[y])
            if j >= tau:
                d1o.append(x); d2o.append(y); jo.append(round(j, 6))
        return pa.table({"doc1": pa.array(d1o, pa.int64()),
                         "doc2": pa.array(d2o, pa.int64()),
                         "jac": pa.array(jo, pa.float64())})

    return cand.map_batches(verify, batch_format="pyarrow", batch_size=65536)


def simhash_dup_pairs(docs: rd.Dataset, max_hamming: int = 3, id_col: str = "doc_id",
                      text_col: str = "text") -> rd.Dataset:
    """SimHash near-dup: 64-bit signatures, candidate pairs share one of four
    16-bit sub-bands (catches all pairs within hamming ≤ 3 by pigeonhole)."""

    def sigs(b: pa.Table) -> pa.Table:
        ids, band, key, sig = [], [], [], []
        for i, t in zip(b.column(id_col).to_pylist(), b.column(text_col).to_pylist()):
            s = tf.simhash64((t or "").split())
            for bi in range(4):
                ids.append(i); band.append(bi)
                key.append((s >> (16 * bi)) & 0xFFFF); sig.append(s)
        return pa.table({id_col: pa.array(ids, pa.int64()),
                         "band": pa.array(band, pa.int32()),
                         "key": pa.array(key, pa.int64()),
                         "sig": pa.array(np.array(sig, dtype=np.uint64).astype(np.int64))})

    import pyarrow.compute as pc
    from ray.data.aggregate import Min

    sig_rows = docs.map_batches(sigs, batch_format="pyarrow",
                                zero_copy_batch=True).materialize()
    joined = sig_rows.join(sig_rows, "inner", 8, on=("band", "key"),
                           left_suffix="_1", right_suffix="_2")

    def to_pairs(b: pa.Table) -> pa.Table:
        b = b.filter(pc.less(b[f"{id_col}_1"], b[f"{id_col}_2"]))
        x = np.asarray(b["sig_1"]).astype(np.uint64)
        y = np.asarray(b["sig_2"]).astype(np.uint64)
        xor = np.bitwise_xor(x, y)
        ham = np.unpackbits(xor.view(np.uint8).reshape(len(xor), 8),
                            axis=1).sum(axis=1) if len(xor) else np.array([], dtype=int)
        keep = ham <= max_hamming
        return pa.table({"doc1": pa.array(np.asarray(b[f"{id_col}_1"])[keep]),
                         "doc2": pa.array(np.asarray(b[f"{id_col}_2"])[keep]),
                         "hamming": pa.array(ham[keep].astype(np.int64))})

    pairs = joined.map_batches(to_pairs, batch_format="pyarrow")
    return pairs.groupby(["doc1", "doc2"]).aggregate(
        Min("hamming", alias_name="hamming"))


def embedding_dup_pairs(emb: rd.Dataset, tau: float = 0.4, block_col: str = "label",
                        id_col: str = "vec_id", vec_col: str = "embedding") -> rd.Dataset:
    """Embedding-cosine near-dup pairs, blocked by a coarse key (label here;
    an IVF/LSH bucket at scale). Vectorized numpy matmul per block."""

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(id_col)
        ids = g[id_col].to_numpy()
        m = np.stack(g[vec_col].to_numpy()).astype(np.float64)
        m = m / np.linalg.norm(m, axis=1, keepdims=True)
        sims = m @ m.T
        iu, ju = np.triu_indices(len(ids), k=1)
        mask = sims[iu, ju] >= tau
        return pd.DataFrame({"vec1": pd.array(ids[iu[mask]], dtype="int64"),
                             "vec2": pd.array(ids[ju[mask]], dtype="int64"),
                             "sim": np.round(sims[iu, ju][mask], 6)})

    return emb.groupby(block_col).map_groups(pairs, batch_format="pandas")
