"""Text-analysis stages over a document table (training-data-pipeline ops).

Token counting, quality scoring, fingerprinting, language ID — each a
stateless ``map_batches`` transform over Arrow batches.
"""

from __future__ import annotations

import hashlib

import pyarrow as pa
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
