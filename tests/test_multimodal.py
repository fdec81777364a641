"""Multimodal plumbing: explode, actor decode (stub), features, frame sampling."""

import numpy as np
import pyarrow as pa
import ray.data as rd

from shacl_validator_ray import synth
from shacl_validator_ray.stages import multimodal as mm


def _docs(n=80):
    docs, _, _mgt = synth.make_corpus_tables(n)
    return rd.from_arrow(docs)


def test_media_spans_explode():
    docs, _, _mgt = synth.make_corpus_tables(80)
    expected = sum(1 for r in docs.to_pylist() for s in r["spans"]
                   if s["kind"] != "text")
    ds = mm.media_spans(rd.from_arrow(docs))
    assert ds.count() == expected
    assert set(ds.schema().names) == {"doc_id", "span_idx", "kind", "media_ref"}


def test_decode_deterministic_binary():
    out1 = mm.decode_media(_docs(), concurrency=1).to_pandas().sort_values(
        ["doc_id", "span_idx"]).reset_index(drop=True)
    out2 = mm.decode_media(_docs(), concurrency=2).to_pandas().sort_values(
        ["doc_id", "span_idx"]).reset_index(drop=True)
    assert len(out1) > 0
    assert (out1["media_ref"] == out2["media_ref"]).all()
    # payloads are real P6 images now: magic + header + w*h*3 samples
    assert all(isinstance(p, bytes) and p.startswith(b"P6") for p in out1["payload"])
    assert (out1["payload"] == out2["payload"]).all()
    assert (out1["width"] >= 16).all() and (out1["n_frames"] >= 1).all()


def test_strict_mode_raises_without_libs():
    import pytest

    if mm.HAVE_PIL:
        pytest.skip("image lib present")
    ds = mm.decode_media(_docs(20), concurrency=1)
    with pytest.raises(Exception):
        # actor __init__ raises NotImplementedError → surfaces on execution
        mm.media_spans(_docs(20)).map_batches(
            mm.MediaDecoder, fn_constructor_kwargs={"strict": True},
            batch_format="pyarrow", concurrency=1).count()


def test_features_fixed_dim():
    feats = mm.media_features(_docs(), concurrency=1).to_pandas()
    assert len(feats) > 0
    vecs = np.stack(feats["feature"].map(np.asarray))
    assert vecs.shape[1] == mm.FEATURE_DIM
    assert np.isfinite(vecs).all()


def test_frame_sampling():
    dec = mm.decode_media(_docs(), concurrency=1)
    frames = mm.frame_sample(dec, every=2).to_pandas()
    dec_df = dec.to_pandas()
    expected = sum((nf + 1) // 2 for nf in dec_df["n_frames"])
    assert len(frames) == expected
    assert (frames["frame"] % 2 == 0).all()


def test_decode_image_bytes_ppm_pgm():
    import numpy as np

    from shacl_validator_ray.stages import multimodal as mm

    pix = np.arange(2 * 3 * 3, dtype=np.uint8).reshape(2, 3, 3)
    data = b"P6\n# a comment\n3 2\n255\n" + pix.tobytes()
    w, h, img = mm.decode_image_bytes(data)
    assert (w, h) == (3, 2) and (img == pix).all()

    gray = np.arange(6, dtype=np.uint8).reshape(2, 3)
    data = b"P5 3 2 255\n" + gray.tobytes()
    w, h, img = mm.decode_image_bytes(data)
    assert (w, h) == (3, 2) and (img == gray).all()

    import pytest
    with pytest.raises(ValueError):
        mm.decode_image_bytes(b"\x89PNG....")
    with pytest.raises(ValueError):
        mm.decode_image_bytes(b"P6\n3 2\n255\n\x00")  # truncated


def test_resize_nearest():
    import numpy as np

    from shacl_validator_ray.stages import multimodal as mm

    img = np.arange(16, dtype=np.uint8).reshape(4, 4)
    out = mm.resize_nearest(img, 2, 2)
    assert out.shape == (2, 2)
    assert (out == np.array([[0, 2], [8, 10]])).all()


def test_image_pixel_features_real_decode():
    ray_docs_small = _docs(40)
    from shacl_validator_ray.stages import multimodal as mm

    feats = mm.image_pixel_features(ray_docs_small, concurrency=1).to_pandas()
    assert len(feats) > 0
    assert all(len(f) == 6 + 16 for f in feats["pixel_feature"])
    # pixel stats are in [0, 1] and deterministic per media_ref
    import numpy as np
    arr = np.stack(feats["pixel_feature"].to_numpy())
    assert (arr >= 0).all() and (arr <= 1).all()
    again = mm.image_pixel_features(ray_docs_small, concurrency=1).to_pandas()
    m1 = dict(zip(feats["media_ref"], map(tuple, feats["pixel_feature"])))
    m2 = dict(zip(again["media_ref"], map(tuple, again["pixel_feature"])))
    assert m1 == m2


def test_image_stats_match_planted_gt():
    """image_stats_table (PPM encode → REAL parse → integer sums) must
    reproduce the gt_media stats the corpus generator planted from the
    raw pixel arrays — the local form of the kg_image_stats oracle."""
    import pandas as pd

    docs, _, gt_media = synth.make_corpus_tables(60)
    got = (mm.image_stats_table(rd.from_arrow(docs))
           .to_pandas().sort_values(["doc_id", "span_idx"])
           .reset_index(drop=True))
    stat_cols = ["doc_id", "span_idx", "kind", "media_ref", "width",
                 "height", "n_frames", "sum_r", "sum_g", "sum_b"]
    want = (gt_media.to_pandas().sort_values(["doc_id", "span_idx"])
            .reset_index(drop=True))[stat_cols]
    pd.testing.assert_frame_equal(
        got[stat_cols].astype(want.dtypes.to_dict()), want)


def test_media_features_match_planted_gt():
    """The feature-extractor stage reproduces the per-dimension feature
    expectations planted by the independent synth-side computation."""
    import numpy as np

    docs, _, gt_media = synth.make_corpus_tables(40)
    feats = mm.media_features(rd.from_arrow(docs)).to_pandas()
    want = gt_media.to_pandas()
    m = feats.merge(want, on=["doc_id", "span_idx"])
    assert len(m) == len(want) and len(want) > 0
    got = np.array([list(v) for v in m["feature"]], dtype=np.float64)
    exp = m[[f"f{i}" for i in range(16)]].to_numpy(dtype=np.float64)
    assert np.allclose(got, exp, atol=1e-7)
