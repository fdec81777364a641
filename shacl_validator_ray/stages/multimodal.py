"""Multimodal columns: media spans as opaque binary payloads + typed metadata.

The decode kernel is REAL for the formats decodable without external
libraries: binary PPM (P6) / PGM (P5) parse with pure numpy
(:func:`decode_image_bytes`), and the synthetic corpus payloads are
valid P6 images, so decode → pixel features → nearest-neighbor resize
run on actual pixel data end-to-end. JPEG/PNG/audio decoding needs
libraries absent from this container and raises ``NotImplementedError``
in strict mode (the documented stub boundary). The Ray-side plumbing is
production-shaped throughout: span explode (fan-out inside the batch
fn), actor-pool stages with per-actor setup, small ``batch_size`` for
wide binary rows, Arrow ``binary()`` columns end-to-end (binary stays in
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


def decode_image_bytes(data: bytes) -> tuple[int, int, np.ndarray]:
    """Pure-numpy image decode for binary PPM (P6) / PGM (P5): header
    (magic, dims, maxval, ``#`` comments allowed) + raw samples →
    (width, height, uint8 array of shape (h, w, 3) or (h, w)).
    Raises ValueError for anything else (JPEG/PNG need external libs)."""
    if not (data.startswith(b"P6") or data.startswith(b"P5")):
        raise ValueError("not a binary PPM/PGM payload")
    channels = 3 if data.startswith(b"P6") else 1
    # header: 4 whitespace-separated tokens, # comments to end-of-line
    pos, tokens = 2, []
    while len(tokens) < 3 and pos < len(data):
        c = data[pos:pos + 1]
        if c == b"#":
            pos = data.index(b"\n", pos) + 1
        elif c.isspace():
            pos += 1
        else:
            end = pos
            while end < len(data) and not data[end:end + 1].isspace():
                end += 1
            tokens.append(int(data[pos:end]))
            pos = end
    pos += 1  # single whitespace after maxval
    w, h, maxval = tokens
    if maxval > 255:
        raise ValueError("16-bit PPM not supported")
    n = w * h * channels
    pixels = np.frombuffer(data[pos:pos + n], dtype=np.uint8)
    if len(pixels) != n:
        raise ValueError("truncated PPM payload")
    return w, h, (pixels.reshape(h, w, 3) if channels == 3
                  else pixels.reshape(h, w))


def resize_nearest(img: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
    """Nearest-neighbor resize via index maps (pure numpy)."""
    h, w = img.shape[:2]
    yi = (np.arange(out_h) * h // out_h).clip(0, h - 1)
    xi = (np.arange(out_w) * w // out_w).clip(0, w - 1)
    return img[yi][:, xi]


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
    """Actor-pool decode stage. The synthetic fetch produces a VALID
    binary PPM payload per media_ref (deterministic pixels), and the
    decode is the REAL parser (:func:`decode_image_bytes`) — width and
    height come from actually parsing the header, not from metadata.
    ``strict=True`` marks the JPEG/PNG boundary: those formats need an
    image library absent from this container."""

    def __init__(self, strict: bool = False, payload_bytes: int = 256):
        if strict and not HAVE_PIL:
            raise NotImplementedError(
                "JPEG/PNG decode requires an image library not present in "
                "this environment; PPM/PGM decode (the pure-numpy path) "
                "works with strict=False")
        self.payload_bytes = payload_bytes

    def _synth_fetch(self, ref: str) -> tuple[bytes, int]:
        """Stand-in for the payload fetch (object store / blob read):
        the deterministic payload is owned by the corpus generator
        (synth.media_payload) so the planted gt_media decode stats are
        an independent oracle for the real-parse path below."""
        from .. import synth

        payload, n_frames, _ = synth.media_payload(ref)
        return payload, n_frames

    def __call__(self, b: pa.Table) -> pa.Table:
        payloads, ws, hs, fs = [], [], [], []
        for ref in b["media_ref"].to_pylist():
            payload, frames = self._synth_fetch(ref)
            w, h, _ = decode_image_bytes(payload)  # REAL parse
            payloads.append(payload); ws.append(w); hs.append(h)
            fs.append(frames)
        return pa.table({
            "doc_id": b["doc_id"], "span_idx": b["span_idx"], "kind": b["kind"],
            "media_ref": b["media_ref"],
            "payload": pa.array(payloads, pa.binary()),
            "width": pa.array(ws, pa.int32()),
            "height": pa.array(hs, pa.int32()),
            "n_frames": pa.array(fs, pa.int32()),
        })


class ImageStats:
    """Actor-pool pixel-feature stage over DECODED images: per-channel
    mean/std + a 4×4 nearest-neighbor grayscale thumbnail (19 dims),
    computed from real pixel data."""

    def __init__(self, thumb: int = 4):
        self.thumb = thumb

    def __call__(self, b: pa.Table) -> pa.Table:
        feats = []
        for payload in b["payload"].to_pylist():
            w, h, img = decode_image_bytes(payload)
            if img.ndim == 2:
                img = np.stack([img] * 3, axis=-1)
            gray = img.mean(axis=2)
            tiny = resize_nearest(gray, self.thumb, self.thumb) / 255.0
            feats.append(np.concatenate([
                img.reshape(-1, 3).mean(axis=0) / 255.0,
                img.reshape(-1, 3).std(axis=0) / 255.0,
                tiny.reshape(-1)]).astype(np.float32))
        return (b.select(["doc_id", "span_idx", "kind", "media_ref"])
                 .append_column("pixel_feature",
                                pa.array([f.tolist() for f in feats],
                                         pa.list_(pa.float32()))))


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


def image_stats_table(docs: rd.Dataset,
                      concurrency: int | tuple = (1, 4)) -> rd.Dataset:
    """decode (REAL PPM parse) → integer-exact per-image statistics:
    width/height from the parsed header, per-channel pixel SUMS (not
    float means, so the DuckDB oracle over the planted gt_media table
    hashes exactly)."""

    def fn(b: pa.Table) -> pa.Table:
        ws, hs, sr, sg, sb = [], [], [], [], []
        for payload in b["payload"].to_pylist():
            w, h, img = decode_image_bytes(payload)
            if img.ndim == 2:
                img = np.stack([img] * 3, axis=-1)
            s = img.reshape(-1, 3).sum(axis=0, dtype=np.int64)
            ws.append(w); hs.append(h)
            sr.append(int(s[0])); sg.append(int(s[1])); sb.append(int(s[2]))
        return pa.table({
            "doc_id": b["doc_id"], "span_idx": b["span_idx"],
            "kind": b["kind"], "media_ref": b["media_ref"],
            "width": pa.array(ws, pa.int32()),
            "height": pa.array(hs, pa.int32()),
            "n_frames": b["n_frames"],
            "sum_r": pa.array(sr, pa.int64()),
            "sum_g": pa.array(sg, pa.int64()),
            "sum_b": pa.array(sb, pa.int64())})

    return decode_media(docs, concurrency=concurrency).map_batches(
        fn, batch_format="pyarrow", batch_size=256)


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


def image_pixel_features(docs: rd.Dataset,
                         concurrency: int | tuple = (1, 4)) -> rd.Dataset:
    """decode (real PPM parse) → per-image pixel statistics + thumbnail."""
    return decode_media(docs, concurrency=concurrency).map_batches(
        ImageStats, batch_format="pyarrow", batch_size=256,
        concurrency=concurrency, num_cpus=0.5)
