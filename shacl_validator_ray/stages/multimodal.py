"""Multimodal columns: media spans as opaque binary payloads + typed metadata.

Image/audio decode libraries are not available in this container, so the
DECODE KERNEL is stubbed (deterministic fake payload derived from the
media_ref, or ``NotImplementedError`` in strict mode) — but the Ray-side
plumbing is real and tested: span explode (fan-out inside the batch fn),
actor-pool stages with per-actor setup, small ``batch_size`` for wide
binary rows, Arrow ``binary()`` columns end-to-end (binary stays in
``batch_format="pyarrow"`` — pandas would object-box it).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import ray.data as rd

MEDIA_SCHEMA = pa.schema([
    pa.field("doc_id", pa.string()),
    pa.field("span_idx", pa.int32()),
    pa.field("kind", pa.string()),
    pa.field("media_ref", pa.string()),
    pa.field("payload", pa.binary()),
    pa.field("width", pa.int32()),
    pa.field("height", pa.int32()),
    pa.field("n_frames", pa.int32()),
])

FEATURE_DIM = 16

try:  # pragma: no cover — not installed in this container
    from PIL import Image  # noqa: F401

    HAVE_PIL = True
except ImportError:
    HAVE_PIL = False


def media_spans(docs: rd.Dataset) -> rd.Dataset:
    """Explode non-text spans to one row each (doc → N media rows)."""

    def fn(b: pa.Table) -> pa.Table:
        doc, si, kind, ref = [], [], [], []
        for d, spans in zip(b["doc_id"].to_pylist(), b["spans"].to_pylist()):
            for i, s in enumerate(spans or []):
                if s["kind"] != "text":
                    doc.append(d); si.append(i); kind.append(s["kind"])
                    ref.append(s["media_ref"])
        return pa.table({"doc_id": pa.array(doc, pa.string()),
                         "span_idx": pa.array(si, pa.int32()),
                         "kind": pa.array(kind, pa.string()),
                         "media_ref": pa.array(ref, pa.string())})

    return docs.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


class MediaDecoder:
    """Actor-pool decode stage. Real decoders would be loaded once here
    (``__init__``); the stub synthesizes a deterministic payload + dims
    from the media_ref so downstream plumbing is fully exercised."""

    def __init__(self, strict: bool = False, payload_bytes: int = 256):
        if strict and not HAVE_PIL:
            raise NotImplementedError(
                "media decode requires an image library not present in this "
                "environment; run with strict=False for the deterministic stub")
        self.payload_bytes = payload_bytes

    def _fake(self, ref: str) -> tuple[bytes, int, int, int]:
        h = hashlib.blake2b(ref.encode(), digest_size=16).digest()
        rng = np.random.RandomState(int.from_bytes(h[:4], "little"))
        payload = rng.bytes(self.payload_bytes)
        w, h_, f = 16 + h[4] % 64, 16 + h[5] % 64, 1 + h[6] % 8
        return payload, w, h_, f

    def __call__(self, b: pa.Table) -> pa.Table:
        payloads, ws, hs, fs = [], [], [], []
        for ref in b["media_ref"].to_pylist():
            p, w, h, f = self._fake(ref)
            payloads.append(p); ws.append(w); hs.append(h); fs.append(f)
        return pa.table({
            "doc_id": b["doc_id"], "span_idx": b["span_idx"], "kind": b["kind"],
            "media_ref": b["media_ref"],
            "payload": pa.array(payloads, pa.binary()),
            "width": pa.array(ws, pa.int32()),
            "height": pa.array(hs, pa.int32()),
            "n_frames": pa.array(fs, pa.int32()),
        })


class FeatureExtractor:
    """Actor-pool feature stage: payload → fixed-dim embedding (stub: a
    deterministic byte-histogram projection; a model would load in
    ``__init__`` and run batched inference in ``__call__``)."""

    def __init__(self, dim: int = FEATURE_DIM, seed: int = 42):
        rng = np.random.RandomState(seed)
        self.proj = rng.normal(size=(256, dim)).astype(np.float32)

    def __call__(self, b: pa.Table) -> pa.Table:
        feats = []
        for payload in b["payload"].to_pylist():
            hist = np.bincount(np.frombuffer(payload, dtype=np.uint8),
                               minlength=256).astype(np.float32)
            feats.append((hist / max(1.0, hist.sum())) @ self.proj)
        return (b.select(["doc_id", "span_idx", "kind", "media_ref"])
                 .append_column("feature",
                                pa.array([f.tolist() for f in feats],
                                         pa.list_(pa.float32()))))


def frame_sample(decoded: rd.Dataset, every: int = 2) -> rd.Dataset:
    """Frame sampling plumbing: one row per sampled frame index."""

    def fn(b: pa.Table) -> pa.Table:
        doc, si, ref, frame = [], [], [], []
        for d, i, r, nf in zip(b["doc_id"].to_pylist(), b["span_idx"].to_pylist(),
                               b["media_ref"].to_pylist(), b["n_frames"].to_pylist()):
            for fi in range(0, nf, every):
                doc.append(d); si.append(i); ref.append(r); frame.append(fi)
        return pa.table({"doc_id": pa.array(doc, pa.string()),
                         "span_idx": pa.array(si, pa.int32()),
                         "media_ref": pa.array(ref, pa.string()),
                         "frame": pa.array(frame, pa.int32())})

    return decoded.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def decode_media(docs: rd.Dataset, concurrency: int | tuple = (1, 4),
                 batch_size: int = 256) -> rd.Dataset:
    """documents → decoded media table (small batch_size: wide binary rows)."""
    return media_spans(docs).map_batches(
        MediaDecoder, batch_format="pyarrow", batch_size=batch_size,
        concurrency=concurrency, num_cpus=0.5)


def media_features(docs: rd.Dataset, concurrency: int | tuple = (1, 4)) -> rd.Dataset:
    return decode_media(docs, concurrency=concurrency).map_batches(
        FeatureExtractor, batch_format="pyarrow", batch_size=256,
        concurrency=concurrency, num_cpus=0.5)
