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


def test_simhash_pair_in_hot_band0_bucket_survives_via_band1():
    """A near-dup pair whose band-0 bucket is flooded (hot, skipped) but
    whose band-1 bucket is small must still be emitted — the
    first-matching-band skip only applies when the earlier band's bucket
    was actually processed. 'flood274563' is a precomputed single-token
    text whose simhash band-0 segment (0xfcd6) equals the pair's, while
    its band-1 segment differs."""
    flood = ["flood274563"] * 40
    a = " ".join(["common word stream"] * 20 + ["delta"])
    b = " ".join(["common word stream"] * 20 + ["epsilon"])
    docs = rd.from_arrow(pa.table({
        "doc_id": pa.array(range(len(flood) + 2), pa.int64()),
        "text": pa.array(flood + [a, b], pa.string())}))
    with pytest.warns(RuntimeWarning, match="hot_cap"):
        got = dedup.simhash_dup_pairs(docs, hot_cap=10).to_pandas()
    pairs = set(zip(got["doc1"], got["doc2"]))
    assert (40, 41) in pairs          # rescued by band 1
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


def test_ranked_ntile_exact_on_skewed_values_with_balanced_buckets():
    """Quantile-derived range cutoffs: ranks/ntiles stay exact on a
    heavily skewed (lognormal) distribution AND no range bucket
    concentrates — the uniform-width cutoffs this replaces put ~all
    rows of a lognormal in bucket 0."""
    from shacl_validator_ray.functions.sketch import approx_quantiles
    from shacl_validator_ray.pipelines.relational import ranked_ntile

    rng = np.random.RandomState(5)
    n = 4000
    vals = np.round(rng.lognormal(0, 2.0, size=n), 4)  # heavy right tail
    ds = rd.from_arrow(pa.table({
        "id": pa.array(range(n), pa.int64()),
        "v": pa.array(vals, pa.float64())})).repartition(8)

    got = (ranked_ntile(ds, "v", "id", n_tiles=4, n_range_buckets=16)
           .to_pandas().sort_values("id").reset_index(drop=True))
    order = sorted(range(n), key=lambda i: (vals[i], i))
    want_rank = np.empty(n, dtype=np.int64)
    for r, i in enumerate(order, start=1):
        want_rank[i] = r
    assert (got["rnk"].to_numpy() == want_rank).all()
    big, rem = n // 4 + 1, n % 4
    cut = big * rem
    want_tile = np.where(want_rank <= cut, (want_rank - 1) // big + 1,
                         (want_rank - 1 - cut) // (n // 4) + rem + 1)
    assert (got["quartile"].to_numpy() == want_tile).all()

    # bucket balance under skew: quantile cutoffs keep every range
    # bucket within 3x the ideal share (uniform min/max width puts
    # >90% of a lognormal in the first bucket)
    cuts = np.asarray(approx_quantiles(ds, "v",
                                       [i / 16 for i in range(1, 16)]))
    rb = np.searchsorted(cuts, vals, side="right")
    assert np.bincount(rb, minlength=16).max() <= 3 * (n // 16)
    lo, hi = vals.min(), vals.max()
    uniform = np.clip(((vals - lo) / ((hi - lo) / 16)).astype(int), 0, 15)
    assert np.bincount(uniform, minlength=16).max() > 0.9 * n


def test_weighted_sample_reservoir_equals_topk_path():
    """The k-bounded reservoir finalize is bit-identical to the
    sort/limit finalize on the same A-ES keys (same sample, same order,
    same rounded keys)."""
    from shacl_validator_ray.stages import windows

    rng = np.random.RandomState(9)
    n = 3000
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array(range(n), pa.int64()),
        "n_chars": pa.array(rng.randint(1, 5000, size=n), pa.int64()),
    })).repartition(7)
    def norm(df):
        # both paths round keys to 6 dp on output; ties within a rounded
        # key are order-free — normalize to (key desc, id asc)
        return (df.sort_values(["key", "doc_id"], ascending=[False, True])
                .reset_index(drop=True)
                .astype({"doc_id": "int64", "n_chars": "int64"}))

    a = norm(windows.weighted_sample(ds, k=50).to_pandas())
    b = norm(windows.weighted_sample_reservoir(ds, k=50).to_pandas())
    pd.testing.assert_frame_equal(a, b)


def test_quantize_embeddings_error_bound_and_range():
    """8-bit quantization: codes are in [0, 255] and dequantization
    error is within half a step per dimension."""
    from shacl_validator_ray.stages import similarity

    ds = _emb(n=100, dim=6, seed=11)
    stats = similarity.embedding_quantization_stats(ds)
    lo, hi = stats
    q = (similarity.quantize_embeddings(ds).to_pandas()
         .sort_values(["vec_id", "dim"]).reset_index(drop=True))
    assert q["q"].between(0, 255).all()
    df = ds.to_pandas().sort_values("vec_id").reset_index(drop=True)
    vals = np.stack(df["embedding"].to_numpy()).astype(np.float64)
    step = (hi - lo) / 255.0
    deq = lo + q["q"].to_numpy().reshape(vals.shape) * step
    assert (np.abs(deq - vals) <= step / 2 + 1e-9).all()


def test_redact_spans_preserves_span_sequence():
    """Redaction rewrites text spans only; kind / media_ref / order are
    untouched (the north rule's span-sequence invariant)."""
    from shacl_validator_ray.stages import text as text_mod

    spans_type = pa.list_(pa.struct([
        ("kind", pa.string()), ("text", pa.string()),
        ("media_ref", pa.string()), ("offset", pa.int32())]))
    docs = rd.from_arrow(pa.table({
        "doc_id": pa.array(["d1"], pa.string()),
        "spans": pa.array([[
            {"kind": "text", "text": "issued 2020-01-02T03:04:05Z ok",
             "media_ref": "", "offset": 0},
            {"kind": "image", "text": "", "media_ref": "m/1.ppm",
             "offset": 30},
            {"kind": "text", "text": "size 12345 bytes 67",
             "media_ref": "", "offset": 31},
        ]], spans_type)}))
    got = (text_mod.redact_spans(docs).to_pandas()
           .sort_values("span_idx").reset_index(drop=True))
    assert list(got["kind"]) == ["text", "image", "text"]
    assert got.loc[0, "text"] == "issued <TIMESTAMP> ok"
    assert got.loc[0, "n_hits"] == 1
    assert got.loc[1, "media_ref"] == "m/1.ppm" and got.loc[1, "n_hits"] == 0
    assert got.loc[2, "text"] == "size <NUM> bytes <NUM>"
    assert got.loc[2, "n_hits"] == 2


def test_minhash_verify_plans_agree():
    """The inline (tokens-on-band-rows, one shuffle) and join (pinned
    token table, two reduce-side joins) verification plans must produce
    the identical verified pair set."""
    texts = ([" ".join(["alpha beta gamma delta"] * 6)] * 3
             + [" ".join(["zeta eta theta iota"] * 6)] * 2
             + [f"unique doc {i} with words w{i} x{i} y{i}" for i in range(5)])
    docs = rd.from_arrow(pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(["en"] * len(texts), pa.string())}))
    a = dedup.minhash_lsh_dup_pairs(docs, verify="inline").to_pandas()
    b = dedup.minhash_lsh_dup_pairs(docs, verify="join").to_pandas()
    sa = set(zip(a.doc1, a.doc2, a.jac))
    sb = set(zip(b.doc1, b.doc2, b.jac))
    assert sa == sb and len(sa) >= 4  # 3+2 dup groups → C(3,2)+C(2,2)
    with pytest.raises(ValueError, match="verify plan"):
        dedup.minhash_lsh_dup_pairs(docs, verify="nope")


def test_substring_dedup_subk_excises_short_boilerplate():
    """A 3-token boilerplate phrase repeated ≥ min_count times — shorter
    than k, so invisible to the k pass — is excised everywhere except
    its canonical first (doc, pos) occurrence when sub_k is set."""
    phrase = "all rights reserved"
    texts = [f"doc zero{i} body{i} {phrase} tail{i} words here"
             for i in range(6)]
    texts.append("clean document with no boilerplate at all")
    docs = rd.from_arrow(pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts, pa.string())}))
    # without sub_k: the 3-token repeat survives (below gram length)
    plain = (dedup.substring_dedup(docs, k=5).to_pandas()
             .sort_values("doc_id").reset_index(drop=True))
    assert all(phrase in t for t in plain.loc[:5, "text"])
    # with sub_k: only doc 0 keeps the phrase
    got = (dedup.substring_dedup(docs, k=5, sub_k=3, sub_k_min_count=5)
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    assert phrase in got.loc[0, "text"]
    for i in range(1, 6):
        assert phrase not in got.loc[i, "text"]
        assert got.loc[i, "n_removed"] == 3
    assert got.loc[6, "n_removed"] == 0
    with pytest.raises(ValueError, match="sub_k"):
        dedup.substring_dedup(docs, k=5, sub_k=7)


def test_minhash_hot_bucket_chain_emission_preserves_clusters():
    """An identical-doc flood above hot_cap emits a connected CHAIN
    (n-1 pairs, linear) instead of the quadratic all-pairs set; pairs
    outside the flood are exact; fuzzy_dedup_keep still resolves the
    flood to ONE survivor (connectivity preserved)."""
    flood_n = 30
    texts = ([" ".join(["flood body words repeated here"] * 8)] * flood_n
             + [" ".join(["alpha beta gamma delta"] * 8)] * 2
             + [f"unique{i} content w{i} x{i} y{i} z{i}" for i in range(4)])
    docs = rd.from_arrow(pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(["en"] * len(texts), pa.string())}))
    pairs = dedup.minhash_lsh_dup_pairs(docs, hot_cap=10).to_pandas()
    in_flood = pairs[(pairs.doc1 < flood_n) & (pairs.doc2 < flood_n)]
    # chain: exactly n-1 consecutive pairs, not C(30,2)=435
    assert len(in_flood) == flood_n - 1
    assert sorted(zip(in_flood.doc1, in_flood.doc2)) == \
        [(i, i + 1) for i in range(flood_n - 1)]
    # the small near-dup pair outside the flood is exact
    assert ((pairs.doc1 == flood_n) & (pairs.doc2 == flood_n + 1)).any()
    # connectivity: one survivor for the flood component
    keep = dedup.fuzzy_dedup_keep(docs, n_buckets=8).to_pandas()
    flood_rows = keep[keep.doc_id < flood_n]
    assert set(flood_rows.rep_id) == {0}
    assert flood_rows.keep.sum() == 1
