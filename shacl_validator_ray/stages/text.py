"""Text-analysis stages over a document table (training-data-pipeline ops).

Token counting, quality scoring, fingerprinting, language ID — each a
stateless ``map_batches`` transform over Arrow batches.
"""

from __future__ import annotations

import hashlib

import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from ..functions import textfns as tf


def token_counts(docs: rd.Dataset, id_col: str = "doc_id", text_col: str = "text") -> rd.Dataset:
    def fn(b: pa.Table) -> pa.Table:
        texts = b.column(text_col).to_pylist()
        return pa.table({
            id_col: b.column(id_col),
            "n_tokens": pa.array([tf.token_count(t or "") for t in texts], pa.int64()),
            "n_bpe_tokens": pa.array([tf.bpe_token_count(t or "") for t in texts], pa.int64()),
        })
    return docs.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def quality_scores(docs: rd.Dataset, id_col: str = "doc_id", text_col: str = "text") -> rd.Dataset:
    def fn(b: pa.Table) -> pa.Table:
        out = tf.add_quality_columns(b, text_col)
        keep = [id_col, "q_chars", "q_tokens", "q_mean_token_len",
                "q_upper_ratio", "q_punct_ratio", "q_stopword_ratio"]
        return out.select(keep)
    return docs.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def fingerprints(docs: rd.Dataset, id_col: str = "doc_id", text_col: str = "text") -> rd.Dataset:
    def fn(b: pa.Table) -> pa.Table:
        texts = b.column(text_col).to_pylist()
        return pa.table({
            id_col: b.column(id_col),
            "fp": pa.array([hashlib.md5((t or "").lower().strip().encode()).hexdigest()
                            for t in texts], pa.string()),
        })
    return docs.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def language_id(docs: rd.Dataset, id_col: str = "doc_id", text_col: str = "text") -> rd.Dataset:
    def fn(b: pa.Table) -> pa.Table:
        texts = b.column(text_col).to_pylist()
        return pa.table({
            id_col: b.column(id_col),
            "pred_lang": pa.array([tf.lang_id(t or "") for t in texts], pa.string()),
        })
    return docs.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def _prefix_levels(lvl0: rd.Dataset, fanout: int,
                   driver_cap: int) -> list[rd.Dataset]:
    """Reduce a (_rb, s) bucket-sum table by ``fanout`` per level until
    the top level holds ≤ ``driver_cap`` rows — the hierarchical-scan
    invariant that bounds the driver-side table at ANY corpus size
    (``levels[-1].count() <= driver_cap`` whenever lvl0 is non-empty,
    since each level is ≥ fanout× smaller)."""
    import numpy as np
    from ray.data.aggregate import Sum

    levels = [lvl0]
    while levels[-1].count() > driver_cap:
        def up(b: pa.Table) -> pa.Table:
            rb = np.asarray(b["_rb"], dtype=np.int64)
            return pa.table({"_rb": pa.array(rb // fanout, pa.int64()),
                             "s": b["s"].cast(pa.int64())})

        levels.append(levels[-1].map_batches(up, batch_format="pyarrow")
                      .groupby("_rb").aggregate(Sum("s", alias_name="s"))
                      .materialize())
    return levels


def sequence_pack(docs: rd.Dataset, seq_len: int = 2048,
                  range_bucket: int = 500, id_col: str = "doc_id",
                  text_col: str = "text", fanout: int = 4096,
                  driver_cap: int = 65536) -> rd.Dataset:
    """Sequence packing for LLM pretraining: assign each document a
    global token offset in doc_id order and the id of the fixed-length
    pack its first token lands in (``pack_id = offset // seq_len``).

    The global prefix sum is a HIERARCHICAL distributed scan — the
    driver-side table is bounded by ``driver_cap`` at ANY corpus size
    (the previous single-level design held n_docs / range_bucket
    entries on the driver — 2e9 at 10^12 docs):

    1. one pass emits (range_bucket(doc), n_tokens) and reduces to
       per-bucket token sums (cardinality n_docs / range_bucket);
    2. that level is repeatedly re-reduced by ``fanout`` (buckets of
       buckets) until it fits in ``driver_cap`` rows; the driver
       prefix-sums ONLY the top level;
    3. base offsets descend level by level as distributed tagged-union
       merges — each task holds one parent's ≤ fanout children;
    4. the final pass sorts WITHIN each leaf bucket (≤ range_bucket
       docs per group) and adds its merged base offset.

    Assumes lexicographic doc_id order == intended corpus order (the
    synthetic ids are zero-padded). Output: (doc_id, n_tokens,
    token_offset, pack_id)."""
    import numpy as np
    import pandas as pd
    import ray
    from ray.data.aggregate import Sum

    from ..functions import textfns as tf_
    from .discovery import bucketed_block_apply, bucketed_groupby_apply

    def with_counts(b: pa.Table) -> pa.Table:
        texts = b.column(text_col).to_pylist()
        ids = b.column(id_col).to_pylist()
        # range bucket from the numeric doc suffix: contiguous doc-id
        # ranges share a bucket, so within-bucket sort is a local sort
        nums = [int(str(d).rsplit("-", 1)[-1]) for d in ids]
        return pa.table({
            id_col: b.column(id_col),
            "_num": pa.array(nums, pa.int64()),
            "_rb": pa.array([n // range_bucket for n in nums], pa.int64()),
            "n_tokens": pa.array([tf_.token_count(t or "") for t in texts],
                                 pa.int64())})

    counted = docs.map_batches(with_counts, batch_format="pyarrow",
                               zero_copy_batch=True).materialize()

    # phase 1: leaf-bucket sums, then reduce by `fanout` until the top
    # level fits on the driver
    lvl0 = counted.groupby("_rb").aggregate(
        Sum("n_tokens", alias_name="s")).materialize()
    levels = _prefix_levels(lvl0, fanout, driver_cap)

    top = levels[-1].to_pandas()
    if not len(top):
        return rd.from_arrow(pa.table({
            id_col: pa.array([], pa.string()),
            "n_tokens": pa.array([], pa.int64()),
            "token_offset": pa.array([], pa.int64()),
            "pack_id": pa.array([], pa.int64())}))
    top = top.sort_values("_rb").reset_index(drop=True)
    top_base = pd.DataFrame({"_pk": top["_rb"].astype("int64"),
                             "base": (top["s"].cumsum() - top["s"])
                             .astype("int64")})
    # base table for the top level lives on the driver (≤ driver_cap
    # rows by construction); lower-level base tables stay distributed
    base_ds = rd.from_pandas(top_base)

    def _descend(children: rd.Dataset, base: rd.Dataset) -> rd.Dataset:
        """children (_rb, s) + parent base (_pk, base) → child base
        (_pk=_rb, base) via one bucketed tagged-union merge; every task
        holds one hash-bucket of parents × their ≤ fanout children."""

        def tag_child(b: pa.Table) -> pa.Table:
            rb = np.asarray(b["_rb"], dtype=np.int64)
            return pa.table({
                "_pk": pa.array(rb // fanout, pa.int64()),
                "_rb": b["_rb"].cast(pa.int64()),
                "s": b["s"].cast(pa.int64()),
                "base": pa.nulls(b.num_rows, pa.int64()),
                "is_base": pa.nulls(b.num_rows, pa.bool_()).fill_null(False)})

        def tag_base(b: pa.Table) -> pa.Table:
            return pa.table({
                "_pk": b["_pk"].cast(pa.int64()),
                "_rb": pa.nulls(b.num_rows, pa.int64()),
                "s": pa.nulls(b.num_rows, pa.int64()),
                "base": b["base"].cast(pa.int64()),
                "is_base": pa.nulls(b.num_rows, pa.bool_()).fill_null(True)})

        tagged = (children.map_batches(tag_child, batch_format="pyarrow")
                  .union(base.map_batches(tag_base, batch_format="pyarrow")))

        def attach(g: pd.DataFrame) -> pd.DataFrame:
            outs = []
            for _, sub in g.groupby("_pk", sort=False):
                pb = sub.loc[sub["is_base"], "base"]
                pbv = int(pb.iloc[0]) if len(pb) else 0
                ch = sub.loc[~sub["is_base"]].sort_values("_rb")
                if not len(ch):
                    continue
                s = ch["s"].astype("int64")
                outs.append(pd.DataFrame({
                    "_pk": ch["_rb"].astype("int64"),
                    "base": (s.cumsum() - s + pbv).astype("int64")}))
            if not outs:
                return pd.DataFrame({"_pk": pd.array([], dtype="int64"),
                                     "base": pd.array([], dtype="int64")})
            return pd.concat(outs, ignore_index=True)

        return bucketed_block_apply(tagged, "_pk", attach)

    for lvl in reversed(levels[:-1]):
        base_ds = _descend(lvl, base_ds).materialize()

    if len(levels) == 1:
        # fast path: leaf bases fit on the driver — broadcast a dict
        bp = base_ds.to_pandas()
        base_map = dict(zip(bp["_pk"], bp["base"]))
        base_ref = ray.put(base_map)

        def pack_bucket(g: pd.DataFrame) -> pd.DataFrame:
            base_ = ray.get(base_ref)
            g = g.sort_values("_num")
            off = (g["n_tokens"].cumsum() - g["n_tokens"]
                   + base_[g["_rb"].iloc[0]])
            return pd.DataFrame({
                id_col: g[id_col],
                "n_tokens": g["n_tokens"].astype("int64"),
                "token_offset": off.astype("int64"),
                "pack_id": (off // seq_len).astype("int64")})

        return bucketed_groupby_apply(counted, "_rb", pack_bucket)

    # distributed final merge: leaf bases join the doc rows by _rb
    sch = counted.schema()
    id_type = getattr(sch, "base_schema", sch).field(id_col).type

    def tag_doc(b: pa.Table) -> pa.Table:
        return pa.table({
            "_rb": b["_rb"].cast(pa.int64()),
            id_col: b[id_col],
            "_num": b["_num"].cast(pa.int64()),
            "n_tokens": b["n_tokens"].cast(pa.int64()),
            "base": pa.nulls(b.num_rows, pa.int64()),
            "is_base": pa.nulls(b.num_rows, pa.bool_()).fill_null(False)})

    def tag_leaf_base(b: pa.Table) -> pa.Table:
        return pa.table({
            "_rb": b["_pk"].cast(pa.int64()),
            id_col: pa.nulls(b.num_rows, id_type),
            "_num": pa.nulls(b.num_rows, pa.int64()),
            "n_tokens": pa.nulls(b.num_rows, pa.int64()),
            "base": b["base"].cast(pa.int64()),
            "is_base": pa.nulls(b.num_rows, pa.bool_()).fill_null(True)})

    tagged = (counted.map_batches(tag_doc, batch_format="pyarrow")
              .union(base_ds.map_batches(tag_leaf_base,
                                         batch_format="pyarrow")))

    def pack_merged(g: pd.DataFrame) -> pd.DataFrame:
        outs = []
        for _, sub in g.groupby("_rb", sort=False):
            pb = sub.loc[sub["is_base"], "base"]
            pbv = int(pb.iloc[0]) if len(pb) else 0
            ch = sub.loc[~sub["is_base"]].sort_values("_num")
            if not len(ch):
                continue
            nt = ch["n_tokens"].astype("int64")
            off = nt.cumsum() - nt + pbv
            outs.append(pd.DataFrame({
                id_col: ch[id_col],
                "n_tokens": nt,
                "token_offset": off.astype("int64"),
                "pack_id": (off // seq_len).astype("int64")}))
        if not outs:
            return pd.DataFrame({
                id_col: pd.array([], dtype="string"),
                "n_tokens": pd.array([], dtype="int64"),
                "token_offset": pd.array([], dtype="int64"),
                "pack_id": pd.array([], dtype="int64")})
        return pd.concat(outs, ignore_index=True)

    return bucketed_block_apply(tagged, "_rb", pack_merged)


def contamination(docs: rd.Dataset, eval_mod: int = 50, n: int = 8,
                  id_col: str = "doc_id",
                  text_col: str = "text") -> rd.Dataset:
    """Train/eval DECONTAMINATION: flag training documents sharing any
    word n-gram (default n=8, the GPT-3-style overlap rule) with the
    eval split. Here the eval split is ``doc number % eval_mod == 0``;
    a production run passes explicit eval ids the same way.

    Architecture: eval sets are FIXED-SIZE regardless of corpus scale,
    so the eval n-gram set is collected once and broadcast via
    ``ray.put`` (never a shuffle join against the full corpus); the
    training-side scan is one per-batch set intersection. Output:
    (doc_id, n_hits) for contaminated non-eval docs — n_hits = distinct
    overlapping n-grams."""
    import ray

    def doc_num(d) -> int:
        return int(str(d).rsplit("-", 1)[-1])

    def grams_of(text: str) -> set:
        toks = (text or "").split()
        return {" ".join(toks[i:i + n]) for i in range(len(toks) - n + 1)}

    def eval_gram_rows(b: pa.Table) -> pa.Table:
        out = set()
        for d, t in zip(b.column(id_col).to_pylist(),
                        b.column(text_col).to_pylist()):
            if doc_num(d) % eval_mod == 0:
                out |= grams_of(t)
        return pa.table({"g": pa.array(sorted(out), pa.string())})

    ev = set()
    for b in docs.map_batches(eval_gram_rows, batch_format="pyarrow",
                              zero_copy_batch=True).iter_batches(
                                  batch_format="pyarrow"):
        ev.update(b["g"].to_pylist())
    ev_ref = ray.put(frozenset(ev))

    def scan(b: pa.Table) -> pa.Table:
        ev_ = ray.get(ev_ref)
        ids, hits = [], []
        for d, t in zip(b.column(id_col).to_pylist(),
                        b.column(text_col).to_pylist()):
            if doc_num(d) % eval_mod == 0:
                continue
            k = len(grams_of(t) & ev_)
            if k:
                ids.append(d)
                hits.append(k)
        return pa.table({id_col: pa.array(ids, b.column(id_col).type),
                         "n_hits": pa.array(hits, pa.int64())})

    return docs.map_batches(scan, batch_format="pyarrow",
                            zero_copy_batch=True)


def split_assign(docs: rd.Dataset, id_col: str = "doc_id",
                 val_pct: int = 10, test_pct: int = 10) -> rd.Dataset:
    """Deterministic train/val/test assignment: md5 of the id modulo 100
    (content-independent, language-portable — the oracle reproduces the
    same arithmetic in SQL). A document keeps its split forever, across
    corpus growth and re-shards; no shuffle, one vectorized map."""
    import hashlib

    def fn(b: pa.Table) -> pa.Table:
        ids = b.column(id_col).to_pylist()
        h = [int(hashlib.md5(str(d).encode()).hexdigest()[:8], 16) % 100
             for d in ids]
        split = ["test" if x < test_pct
                 else "val" if x < test_pct + val_pct
                 else "train" for x in h]
        return pa.table({id_col: b.column(id_col),
                         "bucket": pa.array(h, pa.int64()),
                         "split": pa.array(split, pa.string())})

    return docs.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def _tf_rows_fn(id_col: str, text_col: str):
    """Batch fn: one (doc, term, tf, dl) posting row per distinct term
    per document — tf and dl are row-local, so this is a stateless map."""
    from collections import Counter

    def tf_rows(bt: pa.Table) -> pa.Table:
        ids, terms, tfs, dls = [], [], [], []
        for i, t_ in zip(bt.column(id_col).to_pylist(),
                         bt.column(text_col).to_pylist()):
            toks = (t_ or "").split()
            for term, c in Counter(toks).items():
                ids.append(i)
                terms.append(term)
                tfs.append(c)
                dls.append(len(toks))
        return pa.table({id_col: pa.array(ids, bt.column(id_col).type),
                         "term": pa.array(terms, pa.string()),
                         "tf": pa.array(tfs, pa.int64()),
                         "dl": pa.array(dls, pa.int64())})

    return tf_rows


def tfidf_top_terms(docs: rd.Dataset, k: int = 5, id_col: str = "doc_id",
                    text_col: str = "text",
                    n_buckets: int | None = None,
                    scheme: str = "tfidf", k1: float = 1.5,
                    b: float = 0.75) -> rd.Dataset:
    """Per-document top-k terms by TF-IDF (tf · ln(N/df), whitespace
    tokens) or BM25 (``scheme="bm25"``: Robertson idf with +1 smoothing,
    tf saturation k1, length normalization b), in exactly two shuffles:

    1. term frequency and doc length are LOCAL to a row (a document is
       one row), so the (doc, term, tf, dl) expansion is a stateless
       map; bucketing that table by TERM co-locates every posting of a
       term, so the document frequency is just the bucket-local row
       count per term — df + the idf join collapse into one shuffle
       instead of a groupby-count plus a separate join.
    2. a second bucketed shuffle on the document id ranks each doc's
       terms (weight desc, term asc — deterministic under ties) and
       keeps the top k.

    N (corpus doc count) and, for BM25, the average doc length are the
    only driver-side values. Hot terms skew term buckets at corpus
    scale; buckets hold many terms each (hash-bucketed, cluster-scaled
    count) which amortizes stragglers the same way the engine's other
    bucketed shuffles do."""
    import numpy as np
    import pandas as pd

    from .discovery import bucketed_block_apply

    n_docs = docs.count()

    postings = docs.map_batches(_tf_rows_fn(id_col, text_col),
                                batch_format="pyarrow",
                                zero_copy_batch=True)
    if scheme == "bm25":
        # avgdl over ALL docs (empty ones included): total tokens is the
        # posting tf sum — one streaming aggregate, one driver float
        postings = postings.materialize()
        avgdl = (postings.sum("tf") or 0) / n_docs

    def weight_bucket(g: pd.DataFrame) -> pd.DataFrame:
        if not len(g):
            return pd.DataFrame({id_col: pd.Series(dtype="int64"),
                                 "term": pd.Series(dtype=object),
                                 "wt": pd.Series(dtype="float64")})
        df = g.groupby("term")["tf"].transform("size").to_numpy(dtype=float)
        tf = g["tf"].to_numpy(dtype=float)
        if scheme == "bm25":
            dl = g["dl"].to_numpy(dtype=float)
            idf = np.log((n_docs - df + 0.5) / (df + 0.5) + 1.0)
            wt = idf * (tf * (k1 + 1.0)) \
                / (tf + k1 * (1.0 - b + b * dl / avgdl))
        else:
            wt = tf * np.log(n_docs / df)
        return pd.DataFrame({id_col: g[id_col], "term": g["term"],
                             "wt": wt})

    weighted = bucketed_block_apply(postings, "term", weight_bucket,
                                    n_buckets=n_buckets)
    out_col = scheme

    def topk_bucket(g: pd.DataFrame) -> pd.DataFrame:
        if not len(g):
            return pd.DataFrame({id_col: pd.Series(dtype="int64"),
                                 "term": pd.Series(dtype=object),
                                 out_col: pd.Series(dtype="float64"),
                                 "rank": pd.Series(dtype="int64")})
        g = g.sort_values(["wt", "term"], ascending=[False, True],
                          kind="mergesort")
        out = g.groupby(id_col, sort=False).head(k)
        return pd.DataFrame({
            id_col: out[id_col], "term": out["term"],
            out_col: out["wt"].round(6),
            "rank": (out.groupby(id_col, sort=False).cumcount()
                     + 1).astype("int64")})

    return bucketed_block_apply(weighted, id_col, topk_bucket,
                                n_buckets=n_buckets)


def quota_sample(docs: rd.Dataset, group_col: str = "source", k: int = 20,
                 id_col: str = "doc_id") -> rd.Dataset:
    """Per-group quota downsample: keep at most ``k`` rows per group,
    chosen by md5-of-id order — pseudorandom (unbiased w.r.t. corpus
    order) yet fully deterministic/reproducible, the curation analog of
    split_assign. One bucketed shuffle on the group key; groups larger
    than a worker never materialize beyond the bucket (per-group work is
    a sort + head)."""
    import hashlib

    import pandas as pd

    from .discovery import bucketed_groupby_apply

    def head_k(g: pd.DataFrame) -> pd.DataFrame:
        h = g[id_col].map(lambda d: hashlib.md5(str(d).encode()).hexdigest())
        return (g.assign(_h=h).sort_values(["_h", id_col])
                .head(k).drop(columns=["_h"]))

    return bucketed_groupby_apply(docs, group_col, head_k)


def repetition_scores(docs: rd.Dataset, id_col: str = "doc_id",
                      text_col: str = "text",
                      top_frac: float = 0.2,
                      dup_frac: float = 0.4) -> rd.Dataset:
    """Within-document repetition metrics (the Gopher-rule family):
    fraction of total token mass held by the single most frequent token,
    and the fraction of word n-gram occurrences (n = 2, 3, 4) that are
    duplicates (1 − distinct/total). ``flagged`` marks docs exceeding
    the top-unigram threshold or the bigram-duplicate threshold (the
    3/4-gram columns are reported for caller-side policies). Stateless
    per-row map — no shuffle."""
    from collections import Counter

    def dup_frac_of(toks: list, n: int) -> float:
        grams = list(zip(*(toks[i:] for i in range(n))))
        if not grams:
            return 0.0
        return round(1.0 - len(set(grams)) / len(grams), 6)

    def fn(b: pa.Table) -> pa.Table:
        tops, flags, toks_n = [], [], []
        dups: dict[int, list] = {2: [], 3: [], 4: []}
        for t_ in b.column(text_col).to_pylist():
            toks = (t_ or "").split()
            n = len(toks)
            toks_n.append(n)
            if n == 0:
                tops.append(0.0)
                flags.append(False)
                for m in dups:
                    dups[m].append(0.0)
                continue
            top = round(max(Counter(toks).values()) / n, 6)
            for m in dups:
                dups[m].append(dup_frac_of(toks, m))
            tops.append(top)
            flags.append(top > top_frac or dups[2][-1] > dup_frac)
        return pa.table({
            id_col: b.column(id_col),
            "n_tokens": pa.array(toks_n, pa.int64()),
            "top_unigram_frac": pa.array(tops, pa.float64()),
            "dup_bigram_frac": pa.array(dups[2], pa.float64()),
            "dup_trigram_frac": pa.array(dups[3], pa.float64()),
            "dup_fourgram_frac": pa.array(dups[4], pa.float64()),
            "flagged": pa.array(flags, pa.bool_())})

    return docs.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def unigram_doc_nll(docs: rd.Dataset, id_col: str = "doc_id",
                    text_col: str = "text",
                    n_buckets: int | None = None) -> rd.Dataset:
    """Corpus-trained unigram-LM document scoring (the CCNet-style LM
    quality signal, with the corpus itself as the LM): per document the
    average negative log-likelihood ``-(1/dl) Σ_t tf_t · ln(cf_t / N)``
    where cf is the corpus frequency of the term and N the total corpus
    token count. Low nll ≈ stereotypical text, high nll ≈ rare-token
    text — the standard perplexity-bucket curation axis.

    Same two-shuffle plan as :func:`tfidf_top_terms`: the (doc, term,
    tf, dl) expansion is stateless; bucketing by TERM makes the corpus
    frequency a bucket-local sum (training the LM and scoring the
    postings collapse into one shuffle); re-bucketing by DOC sums the
    per-term contributions. N is the only driver-side value. No
    smoothing is needed: every scored token occurs in the corpus."""
    import numpy as np
    import pandas as pd

    from .discovery import bucketed_block_apply

    postings = docs.map_batches(
        _tf_rows_fn(id_col, text_col), batch_format="pyarrow",
        zero_copy_batch=True).materialize()
    n_tokens = float(postings.sum("tf") or 0)
    if n_tokens == 0:
        return rd.from_arrow(pa.table({id_col: pa.array([], pa.int64()),
                                       "dl": pa.array([], pa.int64()),
                                       "nll": pa.array([], pa.float64())}))

    def contrib_bucket(g: pd.DataFrame) -> pd.DataFrame:
        if not len(g):
            return pd.DataFrame({id_col: pd.Series(dtype="int64"),
                                 "dl": pd.Series(dtype="int64"),
                                 "c": pd.Series(dtype="float64")})
        cf = g.groupby("term")["tf"].transform("sum").to_numpy(dtype=float)
        tf = g["tf"].to_numpy(dtype=float)
        return pd.DataFrame({id_col: g[id_col], "dl": g["dl"],
                             "c": tf * np.log(cf / n_tokens)})

    contrib = bucketed_block_apply(postings, "term", contrib_bucket,
                                   n_buckets=n_buckets)

    def doc_bucket(g: pd.DataFrame) -> pd.DataFrame:
        if not len(g):
            return pd.DataFrame({id_col: pd.Series(dtype="int64"),
                                 "dl": pd.Series(dtype="int64"),
                                 "nll": pd.Series(dtype="float64")})
        a = g.groupby(id_col, sort=False).agg(
            dl=("dl", "max"), s=("c", "sum")).reset_index()
        return pd.DataFrame({id_col: a[id_col], "dl": a["dl"].astype("int64"),
                             "nll": np.round(-a["s"] / a["dl"], 6)})

    return bucketed_block_apply(contrib, id_col, doc_bucket,
                                n_buckets=n_buckets)


def postings_index(docs: rd.Dataset, cap: int = 10, id_col: str = "doc_id",
                   text_col: str = "text",
                   n_buckets: int | None = None) -> rd.Dataset:
    """Inverted-index build: per term its document frequency, collection
    frequency, and a champion posting list (the first ``cap`` doc ids,
    ascending — the classic search-index layout). ONE term-bucketed
    shuffle: the (doc, term, tf) expansion is stateless, and df/cf/the
    posting list are all bucket-local per term. At corpus scale the
    posting STRING is capped (``cap``) so no term's output row grows
    with the corpus; full posting lists belong in the partitioned
    parquet sink, not an aggregate row."""
    import pandas as pd

    from .discovery import bucketed_block_apply

    postings = docs.map_batches(_tf_rows_fn(id_col, text_col),
                                batch_format="pyarrow",
                                zero_copy_batch=True)

    def per_term_bucket(g: pd.DataFrame) -> pd.DataFrame:
        if not len(g):
            return pd.DataFrame({"term": pd.Series(dtype=object),
                                 "df": pd.Series(dtype="int64"),
                                 "cf": pd.Series(dtype="int64"),
                                 "postings": pd.Series(dtype=object)})
        g = g.sort_values([ "term", id_col])
        agg = g.groupby("term", sort=False).agg(
            df=(id_col, "size"), cf=("tf", "sum"),
            postings=(id_col,
                      lambda s: ",".join(str(x) for x in s.iloc[:cap])))
        return agg.reset_index()

    return bucketed_block_apply(postings, "term", per_term_bucket,
                                n_buckets=n_buckets)


def bigram_doc_nll(docs: rd.Dataset, lam: float = 0.7,
                   id_col: str = "doc_id", text_col: str = "text",
                   n_buckets: int | None = None) -> rd.Dataset:
    """Interpolated bigram-LM document scoring (the KenLM-style
    perplexity axis, corpus-as-model): per document the average
    negative log-likelihood with
    ``p(w_i|w_{i-1}) = λ·c(w_{i-1}w_i)/c(w_{i-1}·) + (1-λ)·c(w_i)/N``
    and the document-initial token scored by the unigram term alone.

    Plan: one stateless (doc, prev, cur, dl) transition expansion, then
    every count attaches BUCKET-LOCALLY (bucketing by the count's own
    key co-locates all its occurrences — the tfidf df trick): unigram
    counts on the cur-keyed shuffle, bigram + prefix counts together on
    the prev-keyed shuffle, and a doc-keyed reduce sums the log terms.
    Document-INITIAL rows skip the bigram stage entirely (they'd all
    share the empty prev key — a doc-count hot bucket at corpus
    scale); N is the only driver scalar."""
    import numpy as np
    import pandas as pd

    from .discovery import bucketed_block_apply

    def rows(bt: pa.Table) -> pa.Table:
        ids, prevs, curs, dls = [], [], [], []
        for i, t_ in zip(bt.column(id_col).to_pylist(),
                         bt.column(text_col).to_pylist()):
            toks = (t_ or "").split()
            for j, w in enumerate(toks):
                ids.append(i)
                prevs.append(toks[j - 1] if j else "")
                curs.append(w)
                dls.append(len(toks))
        return pa.table({id_col: pa.array(ids, bt.column(id_col).type),
                         "prev": pa.array(prevs, pa.string()),
                         "cur": pa.array(curs, pa.string()),
                         "dl": pa.array(dls, pa.int64())})

    tr = docs.map_batches(rows, batch_format="pyarrow",
                          zero_copy_batch=True).materialize()
    n_tokens = float(tr.count())
    if n_tokens == 0:
        return rd.from_arrow(pa.table({id_col: pa.array([], pa.int64()),
                                       "dl": pa.array([], pa.int64()),
                                       "nll": pa.array([], pa.float64())}))

    # unigram count rides every row (first tokens need it too)
    def uni_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.copy()
        g["c_uni"] = g.groupby("cur")["cur"].transform("size")
        return g

    with_uni = bucketed_block_apply(tr, "cur", uni_bucket,
                                    n_buckets=n_buckets)

    firsts = with_uni.map_batches(
        lambda b: b.filter(pc.equal(b["prev"], "")),
        batch_format="pyarrow", zero_copy_batch=True)
    trans = with_uni.map_batches(
        lambda b: b.filter(pc.not_equal(b["prev"], "")),
        batch_format="pyarrow", zero_copy_batch=True)

    # bigram AND prefix counts are both prev-co-located: one shuffle
    def prev_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.copy()
        g["c_prefix"] = g.groupby("prev")["prev"].transform("size")
        g["c_big"] = g.groupby(["prev", "cur"])["cur"].transform("size")
        return g

    trans = bucketed_block_apply(trans, "prev", prev_bucket,
                                 n_buckets=n_buckets)

    def first_lp(b: pa.Table) -> pa.Table:
        lp = np.log(np.asarray(b["c_uni"], dtype=np.float64) / n_tokens)
        return pa.table({id_col: b[id_col], "dl": b["dl"],
                         "lp": pa.array(lp, pa.float64())})

    def trans_lp(b: pa.Table) -> pa.Table:
        cu = np.asarray(b["c_uni"], dtype=np.float64)
        cb = np.asarray(b["c_big"], dtype=np.float64)
        cp = np.asarray(b["c_prefix"], dtype=np.float64)
        lp = np.log(lam * cb / cp + (1.0 - lam) * cu / n_tokens)
        return pa.table({id_col: b[id_col], "dl": b["dl"],
                         "lp": pa.array(lp, pa.float64())})

    terms = firsts.map_batches(first_lp, batch_format="pyarrow").union(
        trans.map_batches(trans_lp, batch_format="pyarrow"))

    def doc_bucket(g: pd.DataFrame) -> pd.DataFrame:
        if not len(g):
            return pd.DataFrame({id_col: pd.Series(dtype="int64"),
                                 "dl": pd.Series(dtype="int64"),
                                 "nll": pd.Series(dtype="float64")})
        a = g.groupby(id_col, sort=False).agg(
            dl=("dl", "max"), s=("lp", "sum")).reset_index()
        return pd.DataFrame({id_col: a[id_col],
                             "dl": a["dl"].astype("int64"),
                             "nll": np.round(-a["s"] / a["dl"], 6)})

    return bucketed_block_apply(terms, id_col, doc_bucket,
                                n_buckets=n_buckets)


REDACT_RULES = (
    (r"[0-9]{4}-[0-9]{2}-[0-9]{2}T[0-9]{2}:[0-9]{2}:[0-9]{2}Z",
     "<TIMESTAMP>"),
    (r"[0-9]+", "<NUM>"),
)


class _RedactStage:
    """Actor-pool stage (T-shape: compile once per actor, work per
    batch): apply ordered regex redaction rules to the TEXT spans of an
    interleaved-docs table, passing media spans through untouched. Span
    order, kind and media_ref survive — the north rule's span-sequence
    invariant holds on the redacted output."""

    def __init__(self, rules=REDACT_RULES):
        import re

        self.rules = [(re.compile(p), r) for p, r in rules]

    def __call__(self, b: pa.Table) -> pa.Table:
        ids, idxs, kinds, texts, refs, hits = [], [], [], [], [], []
        for d, spans in zip(b["doc_id"].to_pylist(),
                            b["spans"].to_pylist()):
            for i, sp in enumerate(spans):
                t = sp.get("text") or ""
                n = 0
                if sp.get("kind") == "text":
                    for rx, rep in self.rules:
                        t, k = rx.subn(rep, t)
                        n += k
                ids.append(d); idxs.append(i)
                kinds.append(sp.get("kind") or "")
                texts.append(t); refs.append(sp.get("media_ref") or "")
                hits.append(n)
        return pa.table({
            "doc_id": pa.array(ids, pa.string()),
            "span_idx": pa.array(idxs, pa.int64()),
            "kind": pa.array(kinds, pa.string()),
            "text": pa.array(texts, pa.string()),
            "media_ref": pa.array(refs, pa.string()),
            "n_hits": pa.array(hits, pa.int64())})


def redact_spans(docs: rd.Dataset, rules=REDACT_RULES,
                 concurrency: int = 4, batch_size: int = 1024) -> rd.Dataset:
    """Regex redaction over interleaved text+media documents (the PII-
    scrub / number-normalization curation step): ordered rules rewrite
    text spans (timestamps then bare numbers by default), media spans
    pass through, and every span keeps its (kind, media_ref, order)
    identity. Oracle: the same two regexp_replace calls in SQL."""
    return docs.map_batches(_RedactStage, fn_constructor_args=(rules,),
                            batch_format="pyarrow", concurrency=concurrency,
                            batch_size=batch_size, zero_copy_batch=True)


def source_cap(docs: rd.Dataset, cap: int = 10, id_col: str = "doc_id",
               source_col: str = "source",
               n_buckets: int | None = None) -> rd.Dataset:
    """C4/RefinedWeb-style per-source (host-level) document cap: keep at
    most ``cap`` documents per source, chosen deterministically by
    ascending doc id — the anti-overrepresentation step that stops one
    crawler host from dominating the training mix.

    One bucketed groupby keyed on the source; within a group the rank
    is a bounded local sort. Output: every document with its
    within-source rank and the keep flag (filter ``keep`` for the
    capped corpus, the full map is the provenance record)."""
    import pandas as pd

    from .discovery import bucketed_groupby_apply

    def rank_group(g: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        g = g.sort_values(id_col)
        rk = np.arange(1, len(g) + 1, dtype="int64")
        return pd.DataFrame({
            id_col: g[id_col].to_numpy(),
            source_col: g[source_col].to_numpy(),
            "src_rank": rk,
            "keep": rk <= cap})

    return bucketed_groupby_apply(
        docs.select_columns([id_col, source_col]), source_col, rank_group,
        n_buckets=n_buckets)
