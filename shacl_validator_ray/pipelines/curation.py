"""Training-data curation: the composed filter a large-scale text
pipeline runs before training — length/quality gating + near-duplicate
removal — as one Ray Data flow over a document table.

Dedup rule (deterministic, oracle-checkable): from every verified
near-dup pair (doc1 < doc2), the higher id is dropped — the classic
"keep first occurrence" greedy; the drop set is small relative to the
corpus → broadcast anti-join (no shuffle of the documents).
"""

from __future__ import annotations

import pyarrow as pa
import ray
import ray.data as rd

from ..functions import textfns as tf
from ..stages import dedup as dedup_stage


def curate(docs: rd.Dataset, *, min_tokens: int = 20, max_tokens: int = 200,
           dup_tau: float = 0.95, id_col: str = "doc_id",
           text_col: str = "text") -> rd.Dataset:
    """documents → surviving (doc_id, n_tokens) after quality + dedup gates."""
    pairs = dedup_stage.minhash_lsh_dup_pairs(docs, tau=dup_tau,
                                              id_col=id_col, text_col=text_col)
    drop: set[int] = set()
    for b in pairs.iter_batches(batch_format="pyarrow"):
        drop.update(b["doc2"].to_pylist())
    ref = ray.put(drop)

    def gate(b: pa.Table) -> pa.Table:
        d = ray.get(ref)
        ids = b[id_col].to_pylist()
        texts = b[text_col].to_pylist()
        keep_ids, keep_tok = [], []
        for i, t in zip(ids, texts):
            n = tf.token_count(t or "")
            if min_tokens <= n <= max_tokens and i not in d:
                keep_ids.append(i); keep_tok.append(n)
        return pa.table({id_col: pa.array(keep_ids, pa.int64()),
                         "n_tokens": pa.array(keep_tok, pa.int64())})

    return docs.map_batches(gate, batch_format="pyarrow", zero_copy_batch=True)


def curate_full(docs: rd.Dataset, *, min_tokens: int = 20,
                max_tokens: int = 200, dup_tau: float = 0.95,
                eval_mod: int = 10, seq_len: int = 2048,
                id_col: str = "doc_id",
                text_col: str = "text") -> rd.Dataset:
    """The END-TO-END training-data curation flagship: quality gate →
    cluster-based fuzzy dedup (keep one per near-dup component) →
    train/eval decontamination (drop 8-gram overlaps AND the eval split
    itself) → sequence packing over the survivors. Output:
    (doc_id, n_tokens, token_offset, pack_id) — the pack manifest a
    pretraining loader consumes.

    Every stage is the engine's existing distributed operator; the
    gates compose as ONE bucketed merge keyed on the doc id (drop-side
    tables are all ≪ corpus: keep flags are corpus-sized but shuffle
    with the same bucketing; the contamination set is eval-bounded).
    Nothing corpus-scale touches the driver."""
    import pandas as pd

    from ..stages import text as text_stage
    from ..stages.discovery import bucketed_block_apply

    keep_map = dedup_stage.fuzzy_dedup_keep(
        docs, tau=dup_tau, id_col=id_col, text_col=text_col)
    contaminated = text_stage.contamination(docs, eval_mod=eval_mod,
                                            id_col=id_col, text_col=text_col)

    # one bucketed merge applies every gate: doc rows + keep flags +
    # contamination hits co-locate by doc id
    def tag_docs(b: pa.Table) -> pa.Table:
        texts = b.column(text_col).to_pylist()
        return pa.table({
            id_col: b.column(id_col).cast(pa.int64()),
            text_col: b.column(text_col).cast(pa.string()),
            "n_tokens": pa.array([tf.token_count(t or "") for t in texts],
                                 pa.int64()),
            "keep": pa.nulls(b.num_rows, pa.bool_()),
            "contam": pa.nulls(b.num_rows, pa.bool_())})

    def tag_keep(b: pa.Table) -> pa.Table:
        return pa.table({
            id_col: b[id_col].cast(pa.int64()),
            text_col: pa.nulls(b.num_rows, pa.string()),
            "n_tokens": pa.nulls(b.num_rows, pa.int64()),
            "keep": b["keep"].cast(pa.bool_()),
            "contam": pa.nulls(b.num_rows, pa.bool_())})

    def tag_contam(b: pa.Table) -> pa.Table:
        return pa.table({
            id_col: b[id_col].cast(pa.int64()),
            text_col: pa.nulls(b.num_rows, pa.string()),
            "n_tokens": pa.nulls(b.num_rows, pa.int64()),
            "keep": pa.nulls(b.num_rows, pa.bool_()),
            "contam": pa.nulls(b.num_rows, pa.bool_()).fill_null(True)})

    both = (docs.map_batches(tag_docs, batch_format="pyarrow",
                             zero_copy_batch=True)
            .union(keep_map.map_batches(tag_keep, batch_format="pyarrow"),
                   contaminated.select_columns([id_col]).map_batches(
                       tag_contam, batch_format="pyarrow")))

    def gate(g: pd.DataFrame) -> pd.DataFrame:
        d = g.loc[g[text_col].notna()]
        keeps = g.loc[g["keep"].notna(), [id_col, "keep"]]
        bad = set(g.loc[g["contam"].notna(), id_col])
        m = d.merge(keeps, on=id_col, how="left", suffixes=("", "_k"))
        ok = (m["n_tokens"].between(min_tokens, max_tokens)
              & m["keep_k"].fillna(True).astype(bool)
              & (m[id_col] % eval_mod != 0)
              & ~m[id_col].isin(bad))
        out = m.loc[ok, [id_col, text_col]]
        return out if len(out) else m.iloc[0:0][[id_col, text_col]]

    survivors = bucketed_block_apply(both, id_col, gate)
    return text_stage.sequence_pack(survivors, seq_len=seq_len,
                                    id_col=id_col, text_col=text_col)
