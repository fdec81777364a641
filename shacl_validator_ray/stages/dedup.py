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
import ray
import ray.data as rd

from ..functions import textfns as tf


# --- exact dedup: keep min-id row per normalized-text group (D1) ---
def exact_dedup(docs: rd.Dataset, id_col: str = "doc_id", text_col: str = "text") -> rd.Dataset:
    """Per-block keep-min (vectorized drop_duplicates — the combiner,
    shrinking the shuffle to ≤ one row per distinct fp per block) →
    ONE hash-bucketed merge whose per-bucket kernel is the same single
    vectorized sort+drop_duplicates call across all groups in the
    bucket. No per-group Python anywhere (replaces a
    groupby.map_groups pandas ``head(1)`` per fingerprint)."""
    def fp(b: pa.Table) -> pa.Table:
        texts = b.column(text_col).to_pylist()
        return b.append_column(
            "fp", pa.array([tf.md5_fingerprint(t or "") for t in texts], pa.string()))

    def keep_min(df: pd.DataFrame) -> pd.DataFrame:
        return df.sort_values(id_col, kind="mergesort").drop_duplicates(
            "fp", keep="first")

    from .discovery import bucketed_block_apply

    partial = (docs.map_batches(fp, batch_format="pyarrow",
                                zero_copy_batch=True)
                   .map_batches(keep_min, batch_format="pandas"))
    return bucketed_block_apply(partial, "fp", keep_min).drop_columns(["fp"])


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


def containment_dup_pairs(docs: rd.Dataset, tau: float = 0.9,
                          block_col: str = "lang", id_col: str = "doc_id",
                          text_col: str = "text",
                          min_size: int = 1) -> rd.Dataset:
    """Near-CONTAINMENT pairs: |A ∩ B| / min(|A|, |B|) ≥ tau — the
    quote/subset duplicates symmetric Jaccard structurally misses (a
    short doc embedded in a long one has low Jaccard but containment
    ≈ 1). Exact all-pairs inside each block (baseline / oracle path,
    the :func:`jaccard_dup_pairs` precedent); at corpus scale, block
    by a coarser key or run after :func:`minhash_lsh_dup_pairs` has
    removed the symmetric near-dups."""

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        rows = sorted(zip(g[id_col], g[text_col]))
        sets = [(i, tf.word_set(t)) for i, t in rows]
        d1, d2, cont = [], [], []
        for a in range(len(sets)):
            for b in range(a + 1, len(sets)):
                sa, sb = sets[a][1], sets[b][1]
                m = min(len(sa), len(sb))
                if m < max(min_size, 1):
                    # tiny word sets are trivially contained — the
                    # standard guard (C4-style min-length gating)
                    continue
                c = len(sa & sb) / m
                if c >= tau:
                    d1.append(sets[a][0]); d2.append(sets[b][0])
                    cont.append(round(c, 6))
        return pd.DataFrame({"doc1": pd.array(d1, dtype="int64"),
                             "doc2": pd.array(d2, dtype="int64"),
                             "containment": pd.array(cont, dtype="float64")})

    return docs.groupby(block_col).map_groups(pairs, batch_format="pandas")


class _MinHashStage:
    """Actor-pool stage: compile the MinHasher once per actor (T5 shape).

    Emits one row per (doc, band) carrying the FULL band-hash vector —
    needed downstream for the first-matching-band trick."""

    def __init__(self, n_perm: int, n_bands: int, id_col: str, text_col: str,
                 block_col: str | None, carry_tokens: bool = False):
        self.mh = tf.MinHasher(n_perm=n_perm)
        self.n_bands = n_bands
        self.id_col, self.text_col, self.block_col = id_col, text_col, block_col
        # inline-verify variant: ship the doc's word set on every band
        # row (n_bands × token volume through the ONE shuffle) so
        # verification happens inside the band bucket — no join passes,
        # no pinned token table
        self.carry_tokens = carry_tokens

    def __call__(self, b: pa.Table) -> pa.Table:
        blocks = (b.column(self.block_col).to_pylist() if self.block_col
                  else [""] * b.num_rows)
        ids, blk, bands, bhash, allb, toks = [], [], [], [], [], []
        for i, t, bl in zip(b.column(self.id_col).to_pylist(),
                            b.column(self.text_col).to_pylist(), blocks):
            ws = tf.word_set(t or "")
            sig = self.mh.signature(ws)
            hs = [np.int64(np.uint64(h).astype(np.int64))
                  for h in self.mh.bands(sig, self.n_bands)]
            tstr = "\x1f".join(sorted(ws)) if self.carry_tokens else ""
            for bi, h in enumerate(hs):
                ids.append(i); blk.append(bl); bands.append(bi); bhash.append(h)
                allb.append(hs)
                if self.carry_tokens:
                    toks.append(tstr)
        cols = {
            self.id_col: pa.array(ids, pa.int64()),
            "block": pa.array(blk, pa.string()),
            "band": pa.array(bands, pa.int32()),
            "bhash": pa.array(bhash, pa.int64()),
            "all_bands": pa.array(allb, pa.list_(pa.int64())),
        }
        if self.carry_tokens:
            cols["toks"] = pa.array(toks, pa.string())
        return pa.table(cols)


def minhash_lsh_candidates(docs: rd.Dataset, n_perm: int = 32,
                           n_bands: int = 8, id_col: str = "doc_id",
                           text_col: str = "text", block_col: str | None = "lang",
                           concurrency: int = 4,
                           n_buckets: int | None = None,
                           verify_tau: float | None = None,
                           hot_cap: int = 10_000) -> rd.Dataset:
    """LSH candidate generation: signature → band rows → ONE shuffle keyed
    by bucket-hash → vectorized within-bucket pair generation.

    Each candidate pair is emitted exactly once — from its FIRST matching
    band (a pair in bucket (band i, h) is skipped when its band-hash
    vectors already agree at some band j < i) — so no global pair-dedup
    shuffle is needed. r = n_perm/n_bands = 4 rows/band keeps low-Jaccard
    pairs out of the candidate set while recall at τ=0.95 stays ~1-1e-6.

    With ``verify_tau`` set, band rows additionally carry the doc's word
    set and exact-Jaccard verification runs INSIDE the band bucket —
    the whole near-dup pipeline is then this single shuffle (no join
    passes, no pinned token table) at the cost of n_bands × the token
    volume through it; output gains the ``jac`` column.

    Hot buckets (> ``hot_cap`` docs in one (block, band, hash) group —
    boilerplate floods, the quadratic-bucket hazard): instead of
    C(n, 2) pairs, the bucket emits its n-1 CONSECUTIVE id-sorted pairs
    (chain emission). A duplicate CLUSTER stays fully connected — the
    downstream union-find in :func:`fuzzy_dedup_keep` resolves the same
    components — while per-bucket work drops from quadratic to linear;
    only the exhaustive pair LIST is approximated, and only inside the
    flood (a RuntimeWarning in the worker log flags each occurrence;
    exact all-pairs floods are exact_dedup's job, run it first).
    """
    from ..sources import io as io_mod

    if n_buckets is None:
        n_buckets = io_mod.default_num_blocks(factor=4, cap=512)

    band_rows = docs.map_batches(
        _MinHashStage,
        fn_constructor_args=(n_perm, n_bands, id_col, text_col, block_col,
                             verify_tau is not None),
        batch_format="pyarrow", concurrency=concurrency, batch_size=1024)

    def add_bucket(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        key = pc.binary_join_element_wise(
            b["block"].cast(pa.string()), b["band"].cast(pa.string()),
            b["bhash"].cast(pa.string()), "|")
        h = pd.util.hash_pandas_object(pd.Series(key.to_pandas()), index=False)
        return b.append_column("bucket",
                               pa.array((h % n_buckets).astype("int32")))

    bucketed = band_rows.map_batches(add_bucket, batch_format="pyarrow")

    def gen_pairs(g: pd.DataFrame) -> pd.DataFrame:
        inline = verify_tau is not None
        d1, d2, jac = [], [], []
        memo: dict[int, frozenset] = {}

        def ws(i: int, s: str) -> frozenset:
            v = memo.get(i)
            if v is None:
                v = frozenset(s.split("\x1f")) if s else frozenset()
                memo[i] = v
            return v

        for (_, band, _), sub in g.groupby(["block", "band", "bhash"], sort=False):
            n_sub = len(sub)
            if n_sub < 2:
                continue
            sub = sub.sort_values(id_col)
            ids = sub[id_col].to_numpy()
            ab = np.stack(sub["all_bands"].to_numpy())  # (n, n_bands)
            if n_sub > hot_cap:
                # chain emission: linear, cluster-connectivity-preserving
                import warnings

                warnings.warn(
                    f"minhash_lsh_candidates: (block, band, hash) bucket "
                    f"of {n_sub} docs exceeds hot_cap={hot_cap}; emitting "
                    f"its {n_sub - 1} consecutive pairs instead of all "
                    f"pairs (run exact_dedup first for identical floods)",
                    RuntimeWarning, stacklevel=2)
                iu = np.arange(n_sub - 1)
                ju = iu + 1
            else:
                iu, ju = np.triu_indices(n_sub, k=1)
            if band > 0:
                # first-matching-band: drop pairs already caught earlier
                # (a chain pair skipped here is emitted — exactly or as
                # part of an earlier band's chain — by that band, so
                # cluster connectivity survives either way)
                earlier = (ab[iu, :band] == ab[ju, :band]).any(axis=1)
                iu, ju = iu[~earlier], ju[~earlier]
            if inline:
                tk = sub["toks"].to_numpy()
                for a, b in zip(iu, ju):
                    j = tf.jaccard(ws(ids[a], tk[a]), ws(ids[b], tk[b]))
                    if j >= verify_tau:
                        d1.append(ids[a]); d2.append(ids[b])
                        jac.append(round(j, 6))
            else:
                d1.extend(ids[iu]); d2.extend(ids[ju])
        out = {"doc1": pd.array(d1, dtype="int64"),
               "doc2": pd.array(d2, dtype="int64")}
        if inline:
            out["jac"] = pd.array(jac, dtype="float64")
        return pd.DataFrame(out)

    return bucketed.groupby("bucket").map_groups(gen_pairs, batch_format="pandas")


def minhash_lsh_dup_pairs(docs: rd.Dataset, tau: float = 0.95, n_perm: int = 32,
                          n_bands: int = 8, id_col: str = "doc_id",
                          text_col: str = "text", block_col: str | None = "lang",
                          concurrency: int = 4, n_buckets: int | None = None,
                          num_join_partitions: int | None = None,
                          verify: str = "inline",
                          hot_cap: int = 10_000) -> rd.Dataset:
    """MinHash+LSH near-dup: :func:`minhash_lsh_candidates` → exact-Jaccard
    verification, fully distributed (the corpus is never materialized on
    the driver). Two verification plans, identical output:

    - ``verify="inline"`` (default): band rows carry the word set and
      verification runs inside the band bucket — ONE shuffle total, no
      joins, no pinned token table, at n_bands × the token volume
      through that shuffle. Measured 2× faster than the join plan at
      sf0.1/32 CPUs (8.3/7.0 s vs 16.2/13.5 s, two windows each,
      identical 47,452-pair output) — the join plan's per-partition
      aggregator actors dominate its wall at this scale.
    - ``verify="join"``: candidate pairs hash-join back to a pinned
      (doc_id, word-set) table on doc1 then doc2 (two shuffles of
      pair-sized data + two of the token table), exact Jaccard inside
      the join partitions. Ships ~4× fewer token bytes (2 × tokens vs
      n_bands × tokens) but transiently pins ~1 × the token corpus in
      the (spillable) object store — the right plan when network bytes,
      not actor overhead, dominate (very large corpora with high
      n_bands).
    """
    if verify == "inline":
        return minhash_lsh_candidates(
            docs, n_perm=n_perm, n_bands=n_bands, id_col=id_col,
            text_col=text_col, block_col=block_col,
            concurrency=concurrency, n_buckets=n_buckets, verify_tau=tau,
            hot_cap=hot_cap)
    if verify != "join":
        raise ValueError(f"unknown verify plan {verify!r} "
                         "(expected 'join' or 'inline')")
    cand = minhash_lsh_candidates(docs, n_perm=n_perm, n_bands=n_bands,
                                  id_col=id_col, text_col=text_col,
                                  block_col=block_col, concurrency=concurrency,
                                  n_buckets=n_buckets, hot_cap=hot_cap)

    # Tokens travel as a single \x1f-delimited string column: Acero join
    # payloads cannot be list-typed, and a flat string is cheaper to
    # shuffle anyway.
    def to_tokens(b: pa.Table) -> pa.Table:
        toks = ["\x1f".join(sorted(tf.word_set(t or "")))
                for t in b.column(text_col).to_pylist()]
        return pa.table({id_col: b.column(id_col).cast(pa.int64()),
                         "toks": pa.array(toks, pa.string())})

    # Pinned in the (distributed, spillable) object store: `tokens` feeds
    # BOTH joins, and breaking the DAG here keeps the hash-join
    # aggregator actors from competing with the upstream MinHash actor
    # pool inside one streaming execution (deadlock-prone on small CPU
    # counts). Nothing is collected to the driver.
    tokens = docs.select_columns([id_col, text_col]).map_batches(
        to_tokens, batch_format="pyarrow", zero_copy_batch=True).materialize()
    cand = cand.materialize()

    if num_join_partitions is None:
        # scale with the PAIR volume (cand is materialized → count is
        # free metadata): ~125k pairs per partition (swept 8/16/32 at
        # sf0.1's 2M pairs — 16 wins; 250k left half the CPUs idle,
        # 64k paid actor startup). Each hash-join partition is one
        # aggregator actor — at 1e10 pairs this fans out to the cap.
        num_join_partitions = max(8, min(512, -(-cand.count() // 125_000)))

    j1 = cand.join(tokens, "inner", num_join_partitions,
                   on=("doc1",), right_on=(id_col,))
    # pinned: chaining two JoinOperators in one streaming execution spawns
    # 2 × num_join_partitions aggregator actors at once and thrashes /
    # deadlocks on small clusters; the checkpoint is pair-sized,
    # distributed, and spillable
    j1 = j1.map_batches(
        lambda b: pa.table({"doc1": b["doc1"], "doc2": b["doc2"],
                            "toks1": b["toks"]}),
        batch_format="pyarrow", zero_copy_batch=True).materialize()
    j2 = j1.join(tokens, "inner", num_join_partitions,
                 on=("doc2",), right_on=(id_col,))

    def verify(b: pa.Table) -> pa.Table:
        # memo: a doc appears in many pairs within a batch — split its
        # token string and build the set once
        memo: dict[int, frozenset] = {}

        def ws(i: int, s: str) -> frozenset:
            v = memo.get(i)
            if v is None:
                v = frozenset(s.split("\x1f")) if s else frozenset()
                memo[i] = v
            return v

        d1o, d2o, jo = [], [], []
        for x, y, t1, t2 in zip(b["doc1"].to_pylist(), b["doc2"].to_pylist(),
                                b["toks1"].to_pylist(), b["toks"].to_pylist()):
            j = tf.jaccard(ws(x, t1), ws(y, t2))
            if j >= tau:
                d1o.append(x); d2o.append(y); jo.append(round(j, 6))
        return pa.table({"doc1": pa.array(d1o, pa.int64()),
                         "doc2": pa.array(d2o, pa.int64()),
                         "jac": pa.array(jo, pa.float64())})

    return j2.map_batches(verify, batch_format="pyarrow", batch_size=65536)


def simhash_dup_pairs(docs: rd.Dataset, max_hamming: int = 3, id_col: str = "doc_id",
                      text_col: str = "text", hot_cap: int = 10_000,
                      n_buckets: int | None = None) -> rd.Dataset:
    """SimHash near-dup: 64-bit signatures, candidate pairs share one of four
    16-bit sub-bands (catches all pairs within hamming ≤ 3 by pigeonhole).

    Scale shape: ONE shuffle keyed by hash(band, key) with fan-out scaled
    to the cluster (``io.shuffle_buckets``, replacing a previous fixed
    8-partition self-join); pair generation is vectorized inside each
    bucket with the first-matching-band trick (a pair already caught by
    an earlier band is skipped — every earlier band key is recomputable
    from the signature itself), so no global pair-dedup shuffle is
    needed. A (band, key) bucket holding more than ``hot_cap`` docs —
    boilerplate floods of near-identical documents, the quadratic-bucket
    hazard — is skipped with a loud RuntimeWarning, the same policy as
    ``graph.shared_attribute_pairs`` (millions of identical docs are
    exact_dedup's job; their complete pair graph is inherently
    quadratic output). The hot set is broadcast into pair generation so
    the first-matching-band skip only fires when the earlier band's
    bucket was actually processed — a pair co-occurring with a
    boilerplate flood in band 0 but sitting in a small band-1 bucket is
    still emitted (once, by its first NON-hot matching band).

    Cardinality ceiling: 16-bit bands give only 4 × 65,536 possible
    (band, key) buckets, so the AVERAGE bucket holds ~n_docs/65,536
    rows. Once the corpus exceeds ~hot_cap × 65,536 docs (~650M at the
    default cap) every bucket is hot and the stage degenerates to
    emitting nothing; a RuntimeWarning flags that configuration —
    raise ``hot_cap`` (pair output is quadratic in bucket size) or
    route such corpora through MinHash-LSH, whose key space scales
    with content."""
    import warnings

    from ..sources import io as io_mod

    if n_buckets is None:
        n_buckets = max(8, io_mod.shuffle_buckets() // 4)

    def sigs(b: pa.Table) -> pa.Table:
        ids, bk, sig = [], [], []
        for i, t in zip(b.column(id_col).to_pylist(), b.column(text_col).to_pylist()):
            s = tf.simhash64((t or "").split())
            for bi in range(4):
                ids.append(i)
                bk.append((bi << 16) | ((s >> (16 * bi)) & 0xFFFF))
                sig.append(s)
        return pa.table({id_col: pa.array(ids, pa.int64()),
                         "bk": pa.array(bk, pa.int64()),
                         "sig": pa.array(np.array(sig, dtype=np.uint64).astype(np.int64))})

    from .discovery import bucketed_block_apply

    sig_rows = docs.map_batches(sigs, batch_format="pyarrow",
                                zero_copy_batch=True).materialize()

    # driver-side hot check on the small per-(band,key) count table;
    # collect the hot bucket KEYS (bounded by the 4×2^16 key space, so
    # at most ~262k int64s on the driver) for broadcast into pair
    # generation — the earlier-band skip must not fire for a band that
    # was itself skipped as hot, or its pairs would be lost entirely.
    import pyarrow.compute as pc

    hot_keys = np.sort(np.concatenate(
        [np.asarray(b["bk"]) for b in sig_rows.groupby("bk").count()
         .map_batches(lambda t: t.filter(
             pc.greater(t["count()"], hot_cap)).select(["bk"]),
             batch_format="pyarrow").iter_batches(batch_format="pyarrow")]
        or [np.array([], dtype=np.int64)])).astype(np.int64)
    if len(hot_keys):
        warnings.warn(
            f"simhash_dup_pairs: {len(hot_keys)} (band, key) bucket(s) "
            f"exceed hot_cap={hot_cap} docs and are excluded from pair "
            f"generation", RuntimeWarning, stacklevel=2)
    n_docs = sig_rows.count() // 4
    if n_docs > hot_cap * 65_536:
        warnings.warn(
            f"simhash_dup_pairs: corpus of {n_docs} docs exceeds the "
            f"hot_cap×65536 cardinality ceiling of the 16-bit band key "
            f"space — every bucket averages above hot_cap and the stage "
            f"degenerates; raise hot_cap or use minhash_lsh_dup_pairs",
            RuntimeWarning, stacklevel=2)
    hot_ref = ray.put(hot_keys)

    def pairs_bucket(g: pd.DataFrame) -> pd.DataFrame:
        hot_ = ray.get(hot_ref)
        d1, d2, hm = [], [], []
        for bk, sub in g.groupby("bk", sort=False):
            if len(sub) < 2 or len(sub) > hot_cap:
                continue
            band = int(bk) >> 16
            sub = sub.sort_values(id_col)
            ids = sub[id_col].to_numpy()
            sg = sub["sig"].to_numpy().astype(np.uint64)
            iu, ju = np.triu_indices(len(ids), k=1)
            xor = np.bitwise_xor(sg[iu], sg[ju])
            if band > 0:
                # first-matching-band: drop pairs already caught by an
                # earlier band — unless that earlier (band, key) bucket
                # was hot (skipped), in which case this band must emit.
                earlier = np.zeros(len(xor), dtype=bool)
                for eb in range(band):
                    seg = ((xor >> np.uint64(16 * eb))
                           & np.uint64(0xFFFF)) == 0
                    if len(hot_) and seg.any():
                        ebk = ((np.int64(eb) << 16) | ((sg[iu] >> np.uint64(
                            16 * eb)) & np.uint64(0xFFFF)).astype(np.int64))
                        seg &= ~np.isin(ebk, hot_)
                    earlier |= seg
                iu, ju, xor = iu[~earlier], ju[~earlier], xor[~earlier]
            ham = (np.unpackbits(xor.view(np.uint8).reshape(len(xor), 8),
                                 axis=1).sum(axis=1) if len(xor)
                   else np.array([], dtype=int))
            keep = ham <= max_hamming
            d1.extend(ids[iu[keep]]); d2.extend(ids[ju[keep]])
            hm.extend(ham[keep])
        return pd.DataFrame({"doc1": pd.array(d1, dtype="int64"),
                             "doc2": pd.array(d2, dtype="int64"),
                             "hamming": pd.array(hm, dtype="int64")})

    return bucketed_block_apply(sig_rows, "bk", pairs_bucket,
                                n_buckets=n_buckets)


def embedding_dup_pairs_ivf(emb: rd.Dataset, tau: float = 0.4,
                            n_centroids: int = 16, assign_k: int = 2,
                            seed: int = 42, id_col: str = "vec_id",
                            vec_col: str = "embedding",
                            sub_block_rows: int = 4096) -> rd.Dataset:
    """Embedding-cosine near-dup at scale: IVF-bucketed blocking with
    SUB-BLOCKED (tiled) pair generation.

    Each vector is soft-assigned to its ``assign_k`` nearest coarse
    centroids (near-boundary pairs still co-occur in some list). Within
    each list the all-pairs work is tiled: a list estimated at S rows is
    split into ``n_sub = ceil(S / sub_block_rows)`` deterministic
    sub-blocks (``id % n_sub``), each row is routed to the ``n_sub``
    tiles ``(list, min(s,t), max(s,t))`` it participates in, and each
    tile task compares at most ~2·sub_block_rows vectors (one triangle
    tile or one cross tile). No task ever holds a whole IVF list —
    previously one ``groupby("ivf_list").map_groups`` group held
    corpus·assign_k/n_centroids rows and ran an O(|list|²) matmul in a
    single worker. List sizes are ESTIMATED from a fixed 2,048-row
    sample (the same size the centroid trainer uses), so the plan adds
    no extra corpus pass; the estimate only tunes per-task size, never
    correctness. Duplicate pairs from shared lists/tiles collapse in
    the final (vec1, vec2) groupby. Recall is tested against the exact
    :func:`embedding_dup_pairs` oracle path.
    """
    import ray
    from ray.data.aggregate import Max

    from .similarity import _norm_rows, train_ivf_centroids

    cents = train_ivf_centroids(emb, n_centroids, seed=seed, vec_col=vec_col)

    # estimate list populations from a fixed-size sample → n_sub per list
    samp = emb.limit(2048).to_pandas()
    sm = _norm_rows(np.stack(samp[vec_col].to_numpy()).astype(np.float64))
    sorder = np.argsort(-(sm @ cents.T), axis=1)[:, :assign_k]
    sfrac = np.bincount(sorder.reshape(-1), minlength=len(cents)) / max(1, len(sm))
    total = emb.count() * assign_k
    n_sub = np.maximum(1, np.ceil(sfrac * total / sub_block_rows)).astype(np.int64)
    cref = ray.put((cents, n_sub))

    def assign_tiles(b: pa.Table) -> pa.Table:
        c, nsub = ray.get(cref)
        m = _norm_rows(np.stack(b[vec_col].to_pylist()).astype(np.float64))
        order = np.argsort(-(m @ c.T), axis=1)[:, :assign_k]
        ids = np.asarray(b[id_col], dtype=np.int64)
        # fully vectorized emission: a row in list l with sub-block
        # s = id % n_sub[l] joins the n_sub[l] tiles (l, min(s,t),
        # max(s,t)); per-row tile indices come from one segmented arange
        idx_parts, list_parts, ta_parts, tb_parts, sub_parts = \
            [], [], [], [], []
        for j in range(order.shape[1]):
            lst = order[:, j].astype(np.int64)
            ns = nsub[lst]
            s = ids % ns
            reps = ns.astype(np.int64)
            total = int(reps.sum())
            row_idx = np.repeat(np.arange(len(ids)), reps)
            starts = np.repeat(np.cumsum(reps) - reps, reps)
            t = np.arange(total, dtype=np.int64) - starts
            s_rep = np.repeat(s, reps)
            idx_parts.append(row_idx)
            list_parts.append(np.repeat(lst, reps))
            ta_parts.append(np.minimum(s_rep, t))
            tb_parts.append(np.maximum(s_rep, t))
            sub_parts.append(s_rep)
        row_idx = np.concatenate(idx_parts)
        take_idx = pa.array(row_idx, pa.int64())
        return pa.table({
            id_col: pa.array(ids[row_idx], pa.int64()),
            "ivf_list": pa.array(np.concatenate(list_parts), pa.int64()),
            "tile_a": pa.array(np.concatenate(ta_parts), pa.int64()),
            "tile_b": pa.array(np.concatenate(tb_parts), pa.int64()),
            "sub": pa.array(np.concatenate(sub_parts), pa.int64()),
            vec_col: b[vec_col].take(take_idx),
        })

    tiled = emb.map_batches(assign_tiles, batch_format="pyarrow",
                            zero_copy_batch=True)

    def empty_pairs() -> pd.DataFrame:
        return pd.DataFrame({"vec1": pd.array([], dtype="int64"),
                             "vec2": pd.array([], dtype="int64"),
                             "sim": pd.array([], dtype="float64")})

    def tile_pairs(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates(id_col).sort_values(id_col)
        ta, tb = int(g["tile_a"].iloc[0]), int(g["tile_b"].iloc[0])
        if ta == tb:  # triangle tile: all pairs within one sub-block
            ids = g[id_col].to_numpy()
            if len(ids) < 2:
                return empty_pairs()
            m = _norm_rows(np.stack(g[vec_col].to_numpy()).astype(np.float64))
            sims = m @ m.T
            iu, ju = np.triu_indices(len(ids), k=1)
            mask = sims[iu, ju] >= tau
            return pd.DataFrame({"vec1": pd.array(ids[iu[mask]], dtype="int64"),
                                 "vec2": pd.array(ids[ju[mask]], dtype="int64"),
                                 "sim": np.round(sims[iu, ju][mask], 6)})
        ga, gb = g[g["sub"] == ta], g[g["sub"] == tb]
        if not len(ga) or not len(gb):
            return empty_pairs()
        ida, idb = ga[id_col].to_numpy(), gb[id_col].to_numpy()
        ma = _norm_rows(np.stack(ga[vec_col].to_numpy()).astype(np.float64))
        mb = _norm_rows(np.stack(gb[vec_col].to_numpy()).astype(np.float64))
        sims = ma @ mb.T
        ai, bj = np.nonzero(sims >= tau)
        lo = np.minimum(ida[ai], idb[bj])
        hi = np.maximum(ida[ai], idb[bj])
        return pd.DataFrame({"vec1": pd.array(lo, dtype="int64"),
                             "vec2": pd.array(hi, dtype="int64"),
                             "sim": np.round(sims[ai, bj], 6)})

    out = tiled.groupby(["ivf_list", "tile_a", "tile_b"]).map_groups(
        tile_pairs, batch_format="pandas")
    return out.groupby(["vec1", "vec2"]).aggregate(Max("sim", alias_name="sim"))


def embedding_dup_pairs(emb: rd.Dataset, tau: float = 0.4, block_col: str = "label",
                        id_col: str = "vec_id", vec_col: str = "embedding") -> rd.Dataset:
    """Embedding-cosine near-dup pairs, blocked by an exact coarse key
    (label — the oracle path); :func:`embedding_dup_pairs_ivf` is the
    blocking-key-free scale path. Vectorized numpy matmul per block."""

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


def substring_dedup(docs: rd.Dataset, k: int = 8, id_col: str = "doc_id",
                    text_col: str = "text",
                    n_buckets: int | None = None,
                    sub_k: int | None = None,
                    sub_k_min_count: int = 10) -> rd.Dataset:
    """Exact repeated-substring REMOVAL (span surgery) — the Lee et al.
    2022 "Deduplicating Training Data Makes Language Models Better"
    operation the whole-document dedup family can't do: a passage of
    ≥ k tokens appearing more than once ANYWHERE in the corpus is
    excised from every occurrence except the canonical first one
    (minimum ``(doc_id, position)``), keeping the surrounding text.

    Distributed shape (suffix arrays don't shard; rolling k-gram
    fingerprints do):

    1. one pass emits (fp(k-gram), doc_id, pos) rolling fingerprints —
       every length-≥k repeat is a run of ≥1 duplicated k-grams;
    2. ONE shuffle keyed by the gram hash: each duplicated gram keeps
       its minimum-(doc, pos) occurrence and marks every other
       occurrence's [pos, pos+k) token span for removal;
    3. removal marks merge back onto the corpus in a bucketed
       tagged-union keyed on the doc id; per doc the marked spans union
       into a token mask (overlapping grams coalesce into maximal
       spans) and the kept tokens re-join with single spaces.

    A repeated passage of length L ≥ k duplicates all L-k+1 of its
    gram positions, so the whole passage is removed from non-canonical
    occurrences; shorter chance collisions remove exactly their k
    tokens. Output: (doc_id, text, n_removed) for EVERY document
    (n_removed = tokens excised; original whitespace normalizes to
    single spaces — the tokenizer is whitespace). Oracle: the same
    window/anti-join arithmetic in SQL, grouping on the exact gram
    STRING (the ground truth the fingerprints approximate at 2^-64
    collision odds).

    Gram kernel (the hot loop at corpus scale): each DISTINCT token in
    the batch is md5-hashed ONCE to 64 bits, then gram fingerprints are
    a vectorized rotate-XOR (Buzhash-style cyclic polynomial, rotation
    = in-window offset) over the token-hash array — k numpy ops per
    document instead of one md5 + k-token string join per POSITION
    (the previous interpreter-bound kernel).

    SUB-k refinement (``sub_k``): repeats SHORTER than the gram length
    are invisible to the k pass, yet high-multiplicity short boilerplate
    ("all rights reserved") is exactly what poisons training data. With
    ``sub_k`` set (< k), a second gram width rides the SAME shuffle:
    sub_k-grams occurring ≥ ``sub_k_min_count`` times corpus-wide are
    excised everywhere except their canonical first occurrence — the
    higher count bar is the evidence threshold that replaces length
    (count ≥ 2 at length ≥ k; count ≥ min_count at length sub_k). This
    rolling-fingerprint formulation is the shardable equivalent of a
    within-bucket suffix-automaton pass: gram groups ARE the repeat
    classes, and the count gate bounds the marked volume.
    """
    import hashlib

    from .discovery import bucketed_block_apply

    if sub_k is not None and not (2 <= sub_k < k):
        raise ValueError(f"sub_k={sub_k} must satisfy 2 <= sub_k < k={k}")
    widths = [k] if sub_k is None else [k, sub_k]

    def grams(b: pa.Table) -> pa.Table:
        doc_toks = [(d, (t or "").split())
                    for d, t in zip(b.column(id_col).to_pylist(),
                                    b.column(text_col).to_pylist())]
        vocab: dict[str, int] = {}
        for _, toks in doc_toks:
            for tok in toks:
                if tok not in vocab:
                    vocab[tok] = int.from_bytes(
                        hashlib.md5(tok.encode()).digest()[:8], "little")
        ids_a, pos_a, g_a, w_a = [], [], [], []
        for d, toks in doc_toks:
            H = None
            for w in widths:
                n = len(toks) - w + 1
                if n <= 0:
                    continue
                if H is None:
                    H = np.fromiter((vocab[tok] for tok in toks),
                                    dtype=np.uint64, count=len(toks))
                g = np.full(n, np.uint64(w * 0x9E3779B97F4A7C15 % 2**64),
                            dtype=np.uint64)  # width salt: no cross-width
                for j in range(w):  # w vectorized ops, not n md5 calls
                    hj = H[j:j + n]
                    r = w - 1 - j
                    g ^= (((hj << np.uint64(r)) | (hj >> np.uint64(64 - r)))
                          if r else hj)
                ids_a.append(np.full(n, d, dtype=np.int64))
                pos_a.append(np.arange(n, dtype=np.int64))
                g_a.append(g.view(np.int64))
                w_a.append(np.full(n, w, dtype=np.int64))
        if not ids_a:
            return pa.table({id_col: pa.array([], pa.int64()),
                             "pos": pa.array([], pa.int64()),
                             "g": pa.array([], pa.int64()),
                             "w": pa.array([], pa.int64())})
        return pa.table({id_col: pa.array(np.concatenate(ids_a)),
                         "pos": pa.array(np.concatenate(pos_a)),
                         "g": pa.array(np.concatenate(g_a)),
                         "w": pa.array(np.concatenate(w_a))})

    gram_rows = docs.map_batches(grams, batch_format="pyarrow",
                                 zero_copy_batch=True)

    def removals(g: pd.DataFrame) -> pd.DataFrame:
        parts = []
        kg_ = g[g["w"] == k]
        dup = kg_[kg_.duplicated("g", keep=False)]
        if len(dup):
            dup = dup.sort_values(["g", id_col, "pos"])
            keeper = ~dup.duplicated("g", keep="first")
            parts.append(dup.loc[~keeper, [id_col, "pos", "w"]])
        if sub_k is not None:
            sg = g[g["w"] == sub_k]
            if len(sg):
                counts = sg.groupby("g")["g"].transform("size")
                hot = sg[counts >= sub_k_min_count]
                if len(hot):
                    hot = hot.sort_values(["g", id_col, "pos"])
                    keeper = ~hot.duplicated("g", keep="first")
                    parts.append(hot.loc[~keeper, [id_col, "pos", "w"]])
        if not parts:
            return pd.DataFrame({id_col: pd.array([], dtype="int64"),
                                 "pos": pd.array([], dtype="int64"),
                                 "w": pd.array([], dtype="int64")})
        return pd.concat(parts).astype("int64")

    rm = bucketed_block_apply(gram_rows, "g", removals, n_buckets=n_buckets)

    # tagged union keyed on the doc id: doc rows + removal marks
    def tag_doc(b: pa.Table) -> pa.Table:
        return pa.table({
            id_col: b[id_col].cast(pa.int64()),
            text_col: b[text_col].cast(pa.string()),
            "pos": pa.nulls(b.num_rows, pa.int64()),
            "w": pa.nulls(b.num_rows, pa.int64()),
            "is_rm": pa.nulls(b.num_rows, pa.bool_()).fill_null(False)})

    def tag_rm(b: pa.Table) -> pa.Table:
        return pa.table({
            id_col: b[id_col].cast(pa.int64()),
            text_col: pa.nulls(b.num_rows, pa.string()),
            "pos": b["pos"].cast(pa.int64()),
            "w": b["w"].cast(pa.int64()),
            "is_rm": pa.nulls(b.num_rows, pa.bool_()).fill_null(True)})

    tagged = (docs.select_columns([id_col, text_col])
              .map_batches(tag_doc, batch_format="pyarrow")
              .union(rm.map_batches(tag_rm, batch_format="pyarrow")))

    def excise(g: pd.DataFrame) -> pd.DataFrame:
        out_id, out_text, out_rm = [], [], []
        for did, sub in g.groupby(id_col, sort=False):
            drows = sub.loc[~sub["is_rm"]]
            if not len(drows):
                continue
            toks = (drows[text_col].iloc[0] or "").split()
            mask = np.zeros(len(toks), dtype=bool)
            marks = sub.loc[sub["is_rm"], ["pos", "w"]]
            for p, w in zip(marks["pos"], marks["w"]):
                mask[int(p):int(p) + int(w)] = True
            out_id.append(did)
            out_text.append(" ".join(t for t, m in zip(toks, mask)
                                     if not m))
            out_rm.append(int(mask.sum()))
        return pd.DataFrame({id_col: pd.array(out_id, dtype="int64"),
                             text_col: pd.array(out_text, dtype="string"),
                             "n_removed": pd.array(out_rm, dtype="int64")})

    return bucketed_block_apply(tagged, id_col, excise, n_buckets=n_buckets)


def fuzzy_dedup_keep(docs: rd.Dataset, tau: float = 0.95,
                     id_col: str = "doc_id", text_col: str = "text",
                     block_col: str | None = "lang",
                     components_driver_threshold: int = 200_000,
                     n_buckets: int | None = None) -> rd.Dataset:
    """Cluster-based near-dup removal (the SlimPajama / RefinedWeb "keep
    one per duplicate cluster" step): MinHash+LSH verified pairs →
    connected components over the dup-pair graph (the engine's
    distributed union-find) → per-component survivor = min doc id.

    Returns EVERY document as ``(doc_id, rep_id, keep)`` where ``rep_id``
    is the minimum doc id of its near-dup component (itself when it has
    no near-dup) and ``keep`` marks the one survivor per component —
    ``filter keep`` is the deduplicated corpus, the full map is the
    provenance record.

    Scale shape: pair generation is the banded-LSH shuffle
    (:func:`minhash_lsh_dup_pairs`), component resolution is iterative
    groupby-aggregate label propagation (``canonicalize
    .connected_components`` — dup clusters are shallow, so rounds ≈ 2),
    and the survivor join back onto the corpus is one bucketed shuffle
    keyed on the doc id. Nothing corpus-scale touches the driver: the
    pair graph is orders of magnitude smaller than the corpus, and the
    driver fast path in ``connected_components`` only engages below
    ``components_driver_threshold`` edges.
    """
    from .canonicalize import connected_components
    from .discovery import bucketed_block_apply

    pairs = minhash_lsh_dup_pairs(docs, tau=tau, id_col=id_col,
                                  text_col=text_col, block_col=block_col)

    # Zero-padded decimal ids: union-find roots are lexicographic min
    # labels, and 20-digit padding makes string order == numeric order
    # for non-negative int64 ids.
    def to_edges(b: pa.Table) -> pa.Table:
        return pa.table({
            "a": pa.array([f"{x:020d}" for x in b["doc1"].to_pylist()],
                          pa.string()),
            "b": pa.array([f"{x:020d}" for x in b["doc2"].to_pylist()],
                          pa.string())})

    comp = connected_components(
        pairs.map_batches(to_edges, batch_format="pyarrow",
                          zero_copy_batch=True),
        driver_threshold=components_driver_threshold)

    # survivor map back onto the full corpus: tagged union + one bucketed
    # merge keyed on the doc id (rep rows carry is_rep=True)
    reps = comp.map_batches(
        lambda b: pa.table({
            id_col: pa.array([int(x) for x in b["entity_id"].to_pylist()],
                             pa.int64()),
            "rep": pa.array([int(x) for x in b["root_id"].to_pylist()],
                            pa.int64()),
            "is_rep": pa.nulls(b.num_rows, pa.bool_()).fill_null(True)}),
        batch_format="pyarrow")
    base = docs.select_columns([id_col]).map_batches(
        lambda b: pa.table({
            id_col: b[id_col].cast(pa.int64()),
            "rep": pa.nulls(b.num_rows, pa.int64()),
            "is_rep": pa.nulls(b.num_rows, pa.bool_()).fill_null(False)}),
        batch_format="pyarrow")

    def attach(g: pd.DataFrame) -> pd.DataFrame:
        r = g.loc[g["is_rep"], [id_col, "rep"]]
        d = g.loc[~g["is_rep"], [id_col]]
        m = d.merge(r, on=id_col, how="left")
        rep_id = m["rep"].fillna(m[id_col]).astype("int64")
        return pd.DataFrame({id_col: m[id_col].astype("int64"),
                             "rep_id": rep_id,
                             "keep": m[id_col].astype("int64") == rep_id})

    return bucketed_block_apply(base.union(reps), id_col, attach,
                                n_buckets=n_buckets)
