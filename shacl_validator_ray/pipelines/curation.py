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
