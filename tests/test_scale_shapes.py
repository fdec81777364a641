"""Round-4 scale-shape pins: the ANN family and the packing prefix must
keep per-task and driver-side state bounded regardless of corpus size.

Each test forces the at-scale code path on a small input and checks the
result is unchanged from the simple path (or the planted expectation).
"""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from shacl_validator_ray.stages import dedup, text as text_mod


def _emb(n=200, dim=8, seed=3):
    rng = np.random.RandomState(seed)
    m = rng.normal(size=(n, dim))
    return rd.from_arrow(pa.table({
        "vec_id": pa.array(range(n), pa.int64()),
        "embedding": pa.array([r.tolist() for r in m], pa.list_(pa.float32())),
        "label": pa.array([i % 5 for i in range(n)], pa.int32()),
    }))


def test_embedding_dups_ivf_subblocking_is_lossless():
    """Forcing tiny sub-blocks (every IVF list split into many tiles, so
    no task ever holds a whole list) must produce the SAME pair set as
    the untiled assignment — tiles cover every within-list pair exactly
    once and duplicates collapse in the final pair groupby."""
    ds = _emb()
    untiled = dedup.embedding_dup_pairs_ivf(
        ds, tau=0.8, n_centroids=8, assign_k=2,
        sub_block_rows=10_000).to_pandas()
    tiled = dedup.embedding_dup_pairs_ivf(
        ds, tau=0.8, n_centroids=8, assign_k=2,
        sub_block_rows=16).to_pandas()
    u = set(zip(untiled["vec1"], untiled["vec2"]))
    t = set(zip(tiled["vec1"], tiled["vec2"]))
    assert len(u) > 0
    assert t == u


def test_simhash_hot_bucket_cap_skips_flood_with_warning():
    """A boilerplate flood (many identical docs → one quadratic (band,
    key) bucket) is excluded under hot_cap with a loud RuntimeWarning;
    pairs outside the flood are still found."""
    flood = ["lorem ipsum dolor sit amet boilerplate footer text"] * 40
    # two near-identical non-flood docs (simhash hamming 0: the one
    # differing rare token loses every bit vote to the repeated core)
    a = " ".join(["common word stream"] * 20 + ["delta"])
    b = " ".join(["common word stream"] * 20 + ["epsilon"])
    docs = rd.from_arrow(pa.table({
        "doc_id": pa.array(range(len(flood) + 2), pa.int64()),
        "text": pa.array(flood + [a, b], pa.string())}))
    with pytest.warns(RuntimeWarning, match="hot_cap"):
        got = dedup.simhash_dup_pairs(docs, hot_cap=10).to_pandas()
    pairs = set(zip(got["doc1"], got["doc2"]))
    assert (40, 41) in pairs          # the non-flood near-dup survives
    flood_ids = set(range(40))
    assert not any(p in flood_ids or q in flood_ids for p, q in pairs)


def test_simhash_no_cap_matches_previous_semantics():
    """Without a hot bucket the capped pipeline emits the exact banded
    pair set (each pair once, from its first matching band)."""
    a = " ".join(["common word stream"] * 20 + ["delta"])
    b = " ".join(["common word stream"] * 20 + ["epsilon"])
    docs = rd.from_arrow(pa.table({
        "doc_id": pa.array([7, 11], pa.int64()),
        "text": pa.array([a, b], pa.string())}))
    got = dedup.simhash_dup_pairs(docs).to_pandas()
    assert len(got) == 1
    assert (got["doc1"].iloc[0], got["doc2"].iloc[0]) == (7, 11)
    assert got["hamming"].iloc[0] == 0


def _pack_docs(n):
    ids = [f"doc-{i:06d}" for i in range(n)]
    texts = [" ".join(["tok"] * (1 + (i * 7) % 13)) for i in range(n)]
    return rd.from_arrow(pa.table({"doc_id": pa.array(ids, pa.string()),
                                   "text": pa.array(texts, pa.string())}))


def test_sequence_pack_hierarchical_matches_fast_path():
    """Forcing the multi-level prefix (driver_cap smaller than the leaf
    bucket count) must reproduce the single-level result exactly."""
    docs = _pack_docs(240)
    fast = (text_mod.sequence_pack(docs, seq_len=64, range_bucket=4)
            .to_pandas().sort_values("doc_id").reset_index(drop=True))
    hier = (text_mod.sequence_pack(docs, seq_len=64, range_bucket=4,
                                   fanout=4, driver_cap=8)
            .to_pandas().sort_values("doc_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(
        hier[["doc_id", "n_tokens", "token_offset", "pack_id"]],
        fast[["doc_id", "n_tokens", "token_offset", "pack_id"]])


def test_prefix_levels_driver_table_bounded_independent_of_size():
    """The top prefix level never exceeds driver_cap, whatever the leaf
    bucket count — the invariant that keeps the packing scan's
    driver-side state fixed at 10^12-doc scale."""
    for n_leaves in (10, 100, 1000):
        lvl0 = rd.from_arrow(pa.table({
            "_rb": pa.array(range(n_leaves), pa.int64()),
            "s": pa.array([3] * n_leaves, pa.int64())})).materialize()
        levels = text_mod._prefix_levels(lvl0, fanout=8, driver_cap=16)
        assert levels[-1].count() <= 16
        # total token mass is conserved at every level
        for lvl in levels:
            assert sum(lvl.to_pandas()["s"]) == 3 * n_leaves


def test_substring_dedup_excises_repeated_passage():
    """A ≥k-token passage planted in two documents survives only in the
    minimum-(doc, pos) occurrence; surrounding text is kept intact."""
    passage = "alpha beta gamma delta epsilon zeta eta theta"  # 8 tokens
    docs = rd.from_arrow(pa.table({
        "doc_id": pa.array([1, 2, 3], pa.int64()),
        "text": pa.array([
            f"intro one {passage} outro one",
            f"prefix two two {passage} suffix two",
            "no overlap here at all whatsoever in this document",
        ], pa.string())}))
    got = (dedup.substring_dedup(docs, k=8).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    assert list(got["doc_id"]) == [1, 2, 3]
    assert got.loc[0, "text"] == f"intro one {passage} outro one"
    assert got.loc[0, "n_removed"] == 0
    assert got.loc[1, "text"] == "prefix two two suffix two"
    assert got.loc[1, "n_removed"] == 8
    assert got.loc[2, "n_removed"] == 0


def test_substring_dedup_idempotent_on_planted_fixture():
    """Re-running span surgery on its own output removes nothing more
    (no new cross-document repeats are created by the excision)."""
    passage = "one two three four five six seven eight nine ten"
    docs = rd.from_arrow(pa.table({
        "doc_id": pa.array([1, 2, 3], pa.int64()),
        "text": pa.array([
            f"{passage} tail a b c",
            f"head x y z {passage}",
            f"mid p q {passage} r s",
        ], pa.string())}))
    once = dedup.substring_dedup(docs, k=10).to_pandas()
    again = (dedup.substring_dedup(
        rd.from_pandas(once[["doc_id", "text"]]), k=10).to_pandas()
        .sort_values("doc_id").reset_index(drop=True))
    once = once.sort_values("doc_id").reset_index(drop=True)
    assert (again["n_removed"] == 0).all()
    assert list(again["text"]) == list(once["text"])
