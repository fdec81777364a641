"""Property-style invariants (SURVEY.md §5.2 item 4), using hypothesis."""

import pyarrow as pa
import ray.data as rd
from hypothesis import given, settings, strategies as st

from shacl_validator_ray import synth
from shacl_validator_ray.functions import textfns as tf, turtle
from shacl_validator_ray.stages import rdfio

# plain-ASCII literal text without quotes/backslashes plus escapables
literal_text = st.text(
    alphabet=st.sampled_from(list("abc XYZ123\"\\\n\t'é")), max_size=30)
iri_local = st.text(alphabet=st.sampled_from(list("abcdef0123456789")),
                    min_size=1, max_size=12)


@settings(max_examples=50, deadline=None)
@given(st.lists(st.tuples(iri_local, iri_local, literal_text, st.sampled_from(
    ["", "en", "es"])), min_size=1, max_size=10))
def test_ntriples_roundtrip_property(rows):
    triples = [(f"http://e/{s}", f"http://e/p/{p}", "literal", v, "", lang)
               for s, p, v, lang in rows]
    nt = turtle.serialize_ntriples(triples)
    again = turtle.parse_turtle(nt)
    assert {tuple(r) for r in again} == set(triples)


@settings(max_examples=20, deadline=None)
@given(st.lists(st.text(alphabet=st.sampled_from(list("abcd ")), max_size=20),
                min_size=1, max_size=8))
def test_minhash_estimates_bounded(texts):
    mh = tf.MinHasher(n_perm=32)
    sigs = [mh.signature(tf.word_set(t)) for t in texts]
    for s in sigs:
        assert len(s) == 32
    # identical inputs → identical signatures (determinism)
    assert all((mh.signature(tf.word_set(t)) == mh.signature(tf.word_set(t))).all()
               for t in texts)


def test_dedup_idempotent():
    from shacl_validator_ray.stages import extract, shacl

    docs, _, _mgt = synth.make_corpus_tables(40)
    triples = rd.from_arrow(extract.extract_triples_batch(docs))
    once = shacl.dedup_triples(triples).materialize()
    twice = shacl.dedup_triples(once).materialize()
    k = ["subj", "pred", "obj_kind", "obj_value", "obj_datatype", "obj_lang"]
    a = sorted(map(tuple, once.to_pandas()[k].itertuples(index=False)))
    b = sorted(map(tuple, twice.to_pandas()[k].itertuples(index=False)))
    assert a == b


def test_blank_node_doc_scoping():
    """J2 / SURVEY §7.3: the same blank-node label in two documents must
    stay two distinct nodes after parsing (doc-scoped relabeling)."""
    ttl = "@prefix ex: <http://e/> . ex:s ex:p _:b1 . _:b1 ex:q \"v\" ."
    docs = rd.from_arrow(pa.Table.from_pylist([
        {"doc_id": "d1", "content": ttl, "content_type": "", "url": ""},
        {"doc_id": "d2", "content": ttl, "content_type": "", "url": ""},
    ]))
    df = rdfio.parse_documents(docs).to_pandas()
    bnodes = df.loc[df["obj_kind"] == "blank", ["doc_id", "obj_value"]]
    per_doc = dict(zip(bnodes["doc_id"], bnodes["obj_value"]))
    assert per_doc["d1"] != per_doc["d2"]  # no cross-document collision
    # within each doc, subject side of the bnode's own triple matches
    for d, label in per_doc.items():
        sub = df[(df["doc_id"] == d) & (df["subj"] == label)]
        assert len(sub) == 1 and sub.iloc[0]["obj_value"] == "v"


def test_extraction_batchsize_invariance():
    docs, _, _mgt = synth.make_corpus_tables(60)
    from shacl_validator_ray.stages import extract

    whole = extract.extract_triples_batch(docs)
    parts = [extract.extract_triples_batch(docs.slice(i, 7))
             for i in range(0, docs.num_rows, 7)]
    merged = pa.concat_tables(parts)
    assert sorted(map(tuple, whole.to_pylist()[0].items())) is not None
    assert whole.num_rows == merged.num_rows
    assert {tuple(r.values()) for r in whole.to_pylist()} == \
        {tuple(r.values()) for r in merged.to_pylist()}


def test_hll_approx_distinct_within_error():
    import ray.data as rd_

    from shacl_validator_ray.functions import sketch

    ds = rd_.read_parquet("/root/testdata/sf0.01/lineitem.parquet",
                          columns=["l_partkey"])
    exact = len(ds.unique("l_partkey"))
    est = sketch.approx_distinct(ds, "l_partkey", p=12)
    assert abs(est - exact) / exact < 0.05  # ~1.6% expected, 5% bound
    # determinism: same input → same estimate
    assert sketch.approx_distinct(ds, "l_partkey", p=12) == est


def test_bloom_filter_no_false_negatives_and_low_fp():
    import numpy as np

    from shacl_validator_ray.functions import sketch

    items = [f"http://example.org/e/{i}" for i in range(20_000)]
    bf = sketch.BloomFilter.from_items(items)
    present = np.array(items, dtype=object)
    assert bf.contains_array(present).all()  # zero false negatives, ever
    absent = np.array([f"http://example.org/x/{i}" for i in range(200_000)],
                      dtype=object)
    fp = int(bf.contains_array(absent).sum())
    assert fp / len(absent) < 1e-4, fp  # sized for ~4e-9; 1e-4 = hard bound
    # mergeable: OR of two partial blooms == bloom of the union
    half1 = sketch.BloomFilter(bf.n_bits, bf.k)
    half2 = sketch.BloomFilter(bf.n_bits, bf.k)
    half1.add_array(present[:10_000])
    half2.add_array(present[10_000:])
    merged = half1.merge(half2)
    assert (merged.bits == bf.bits).all()


def test_validate_bloom_path_equivalence():
    """bloom_threshold=0 forces EVERY membership set through the Bloom
    path; the violation multiset must be unchanged (kg_validate oracle
    equivalence, VERDICT item 5)."""
    import ray.data as rd

    from shacl_validator_ray import synth
    from shacl_validator_ray.stages import extract, shacl
    from shacl_validator_ray.state import shapes as shapes_mod

    docs, _, _mgt = synth.make_corpus_tables(150)
    triples = rd.from_arrow(extract.extract_triples_batch(docs))
    ttl = shapes_mod.load_profile_ttl("dcat_ap_demo")

    def key_set(ds):
        return sorted((r["severity"], r["focus_node"], r["path"], r["value"],
                       r["source_constraint_component"])
                      for r in ds.to_pandas().to_dict("records"))

    exact = key_set(shacl.validate(triples, ttl))
    bloomed = key_set(shacl.validate(triples, ttl, bloom_threshold=0))
    assert exact == bloomed and len(exact) > 0


def test_collect_members_distributed_matches_exact():
    """The mergeable HLL-sized partial-bloom collector admits every exact
    member (zero false negatives) with a negligible FP rate — the fully
    driver-set-free 10^12 membership path."""
    import numpy as np
    import ray.data as rd

    from shacl_validator_ray import synth
    from shacl_validator_ray.stages import extract, shacl
    from shacl_validator_ray.state import shapes as shapes_mod

    docs, _, _mgt = synth.make_corpus_tables(200)
    triples = rd.from_arrow(extract.extract_triples_batch(docs)).materialize()
    compiled = shapes_mod.compile_shapes(
        shapes_mod.load_profile_ttl("dcat_ap_demo"))

    exact = shacl.collect_members(triples, compiled)
    approx = shacl.collect_members_distributed(triples, compiled)
    assert set(exact) <= set(approx)
    fp = 0
    absent = np.array([f"http://example.org/absent/{i}" for i in range(20000)],
                      dtype=object)
    for key, s in exact.items():
        members = np.array(sorted(s), dtype=object)
        if len(members):
            assert approx[key].contains_array(members).all(), key
        fp += int(approx[key].contains_array(absent).sum())
    assert fp == 0, fp


def test_quantile_sketch_rank_error_bound():
    """Merged per-batch quantile sketches stay within 1% rank error of
    the exact quantiles (one pass, fixed-size partials)."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from shacl_validator_ray.functions import sketch

    rng = np.random.RandomState(11)
    vals = rng.lognormal(0, 1.0, size=50_000)
    ds = rd.from_arrow(pa.table({"v": vals})).repartition(16)
    got = sketch.approx_quantiles(ds, "v", [0.1, 0.5, 0.9, 0.99])
    srt = np.sort(vals)
    for q, est in zip([0.1, 0.5, 0.9, 0.99], got):
        # rank of the estimate must be within 1% of the true rank
        rank = np.searchsorted(srt, est) / len(srt)
        assert abs(rank - q) < 0.01, (q, est, rank)
    # determinism: same input → same estimates
    assert got == sketch.approx_quantiles(ds, "v", [0.1, 0.5, 0.9, 0.99])


def test_sequence_pack_exact_prefix_sum_and_partition_invariance():
    """sequence_pack's two-phase distributed prefix sum must equal the
    single-threaded cumulative sum in corpus order, regardless of input
    partitioning (the bucket-offset broadcast is the only coupling)."""
    import pandas as pd
    import ray.data as rd

    from shacl_validator_ray.stages import text as text_mod

    docs, _, _m = synth.make_corpus_tables(120)
    # spans → a text column like the driver documents table
    texts = [" ".join(s["text"] for s in spans if s["kind"] == "text")
             for spans in docs["spans"].to_pylist()]
    import pyarrow as pa
    tbl = pa.table({"doc_id": docs["doc_id"], "text": texts})

    expect = pd.DataFrame({
        "doc_id": tbl["doc_id"].to_pylist(),
        "n_tokens": [len(t.split()) for t in texts]})
    expect = expect.sort_values("doc_id").reset_index(drop=True)
    expect["token_offset"] = expect["n_tokens"].cumsum() - expect["n_tokens"]
    expect["pack_id"] = expect["token_offset"] // 512

    for parts in (1, 7):
        got = (text_mod.sequence_pack(
            rd.from_arrow(tbl).repartition(parts), seq_len=512,
            range_bucket=16)
            .to_pandas().sort_values("doc_id").reset_index(drop=True))
        pd.testing.assert_frame_equal(
            got[["doc_id", "n_tokens", "token_offset", "pack_id"]]
            .astype({"n_tokens": "int64", "token_offset": "int64",
                     "pack_id": "int64"}),
            expect.astype({"n_tokens": "int64", "token_offset": "int64",
                           "pack_id": "int64"}))


def test_contamination_flags_planted_ngram_overlap():
    """A training doc sharing an 8-gram with an eval doc is flagged with
    the exact distinct-overlap count; eval docs and clean docs are not."""
    import pyarrow as pa
    import ray.data as rd

    from shacl_validator_ray.stages import text as text_mod

    shared = "alpha beta gamma delta epsilon zeta eta theta"  # 8 tokens
    docs = pa.table({
        "doc_id": [0, 1, 2, 3],
        "text": [
            f"{shared} iota kappa",          # eval doc (0 % 2 == 0... use mod 4)
            f"prefix {shared} suffix",        # contaminated (1 shared 8-gram... plus shifted)
            "totally different words here with no overlap at all",
            f"{shared} iota kappa",           # exact dup of eval doc
        ]})
    out = text_mod.contamination(rd.from_arrow(docs), eval_mod=4, n=8)
    got = {r["doc_id"]: r["n_hits"] for r in out.to_pandas().to_dict("records")}
    # doc 0 is eval (0 % 4 == 0); doc 3 duplicates it entirely: its
    # 8-grams are {shared, shared[1:]+iota, shared[2:]+iota kappa} = 3
    assert got[3] == 3
    # doc 1 contains `shared` as its only overlapping 8-gram
    assert got[1] == 1
    assert 2 not in got and 0 not in got


@settings(max_examples=15, deadline=None)
@given(st.lists(st.tuples(st.integers(0, 5), st.integers(0, 2),
                          st.integers(0, 5)),
                min_size=1, max_size=25))
def test_bgp_two_pattern_join_matches_naive_evaluation(edges):
    """Distributed BGP (join on shared variable) ≡ naive nested-loop
    evaluation on random small graphs: patterns
    ($this p?P ?x), (?x pB ?y) with pB fixed."""
    from shacl_validator_ray.stages.bgp import BGPConstraint

    E = "http://e/"
    triples = [
        {"subj": f"{E}n{s}", "pred": f"{E}p{p}", "obj_kind": "iri",
         "obj_value": f"{E}n{o}", "obj_datatype": "", "obj_lang": "",
         "doc_id": "d", "span_idx": i}
        for i, (s, p, o) in enumerate(edges)]
    from shacl_validator_ray import schema as S
    ds = rd.from_arrow(pa.Table.from_pylist(triples, schema=S.TRIPLES))

    cc = BGPConstraint(
        patterns=[("$this", f"{E}p0", "?x"), ("?x", f"{E}p1", "?y")],
        component=f"{E}c#X")
    got = sorted(r["focus_node"]
                 for r in cc.violations(ds).to_pandas().to_dict("records"))

    # naive nested loops over the triple list
    expect = sorted({
        t1["subj"]
        for t1 in triples if t1["pred"] == f"{E}p0"
        for t2 in triples
        if t2["pred"] == f"{E}p1" and t2["subj"] == t1["obj_value"]})
    assert got == expect


def test_countmin_never_undercounts_and_heavy_hitters_exact():
    """CMS property: estimate >= true count for every value (so the
    threshold filter keeps a superset); the sketch-gated operator's
    output equals the exact GROUP BY HAVING on a skewed dataset."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from shacl_validator_ray.functions.sketch import CountMin
    from shacl_validator_ray.pipelines.relational import heavy_hitters

    rng = np.random.RandomState(7)
    # zipf-ish: a few heavy keys + a long tail
    vals = np.concatenate([
        np.repeat([f"hub{i}" for i in range(5)], [500, 300, 120, 60, 30]),
        np.array([f"tail{i}" for i in rng.randint(0, 2000, size=3000)])])
    rng.shuffle(vals)

    cm = CountMin(width=1024, depth=4)
    cm.add_array(vals)
    true = pd.Series(vals).value_counts()
    est = cm.estimate_array(true.index.to_numpy())
    assert (est >= true.to_numpy()).all()

    ds = rd.from_arrow(pa.table({"k": pa.array(vals, pa.string())}))
    got = {r["k"]: r["n"] for r in heavy_hitters(ds, "k", 50)
           .to_pandas().to_dict("records")}
    expect = {k: int(v) for k, v in true[true >= 50].items()}
    assert got == expect


def test_tfidf_top_terms_matches_naive():
    """tfidf_top_terms == a single-threaded tf·ln(N/df) computation with
    the same (weight desc, term asc) tie-break, including a doc with
    fewer than k distinct terms and an empty doc (absent from output)."""
    import math
    from collections import Counter

    import pyarrow as pa
    import ray.data as rd

    from shacl_validator_ray.stages.text import tfidf_top_terms

    texts = ["red blue blue green", "blue green green gold", "red red",
             "", "gold gold gold silver red"]
    docs = rd.from_arrow(pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts, pa.string())}))

    n = len(texts)
    tfs = {i: Counter(t.split()) for i, t in enumerate(texts)}
    df = Counter(term for c in tfs.values() for term in c)
    expect = set()
    for i, c in tfs.items():
        w = sorted(((t, cnt * math.log(n / df[t])) for t, cnt in c.items()),
                   key=lambda kv: (-kv[1], kv[0]))
        for rk, (t, wt) in enumerate(w[:5], 1):
            expect.add((i, t, round(wt, 6), rk))

    got = {(r["doc_id"], r["term"], r["tfidf"], r["rank"])
           for r in tfidf_top_terms(docs, k=5, n_buckets=3)
           .to_pandas().to_dict("records")}
    assert got == expect, got.symmetric_difference(expect)


def test_quota_sample_and_repetition_scores():
    """quota_sample keeps at most k rows per group, deterministically
    (same selection on rerun and independent of row order);
    repetition_scores matches hand-computed metrics."""
    import pyarrow as pa
    import ray.data as rd

    from shacl_validator_ray.stages.text import (quota_sample,
                                                 repetition_scores)

    docs = pa.table({
        "doc_id": pa.array(range(40), pa.int64()),
        "source": pa.array([f"s{i % 3}" for i in range(40)], pa.string())})
    ds = rd.from_arrow(docs)
    got = quota_sample(ds, group_col="source", k=5).to_pandas()
    assert (got.groupby("source").size() <= 5).all()
    assert len(got) == 15
    rev = rd.from_arrow(docs.take(list(range(39, -1, -1))))
    got2 = quota_sample(rev, group_col="source", k=5).to_pandas()
    assert sorted(got["doc_id"]) == sorted(got2["doc_id"])

    texts = ["a a a a b", "x y x y", "six unique words here today ok", ""]
    rds = rd.from_arrow(pa.table({
        "doc_id": pa.array(range(4), pa.int64()),
        "text": pa.array(texts, pa.string())}))
    rows = {r["doc_id"]: r for r in
            repetition_scores(rds).to_pandas().to_dict("records")}
    assert rows[0]["top_unigram_frac"] == 0.8 and rows[0]["flagged"]
    # "a a a a b": trigrams aaa,aaa,aab -> 1 dup of 3; fourgrams
    # aaaa,aaab -> 0 dups
    assert rows[0]["dup_trigram_frac"] == round(1 - 2 / 3, 6)
    assert rows[0]["dup_fourgram_frac"] == 0.0
    # "x y x y": bigrams (x,y),(y,x),(x,y) -> 1 dup of 3
    assert rows[1]["dup_bigram_frac"] == round(1 - 2 / 3, 6)
    assert rows[1]["flagged"]  # top 0.5 > 0.2
    assert not rows[2]["flagged"]
    assert rows[3]["n_tokens"] == 0 and not rows[3]["flagged"]


def test_bm25_top_terms_matches_naive():
    """scheme="bm25" == single-threaded Robertson BM25 with the same
    k1/b, length normalization, and tie-break."""
    import math
    from collections import Counter

    import pyarrow as pa
    import ray.data as rd

    from shacl_validator_ray.stages.text import tfidf_top_terms

    texts = ["red blue blue green", "blue green green gold gold gold",
             "red red", "", "gold silver red blue green copper zinc"]
    docs = rd.from_arrow(pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts, pa.string())}))

    n = len(texts)
    k1, b_ = 1.5, 0.75
    tfs = {i: Counter(t.split()) for i, t in enumerate(texts)}
    dls = {i: len(t.split()) for i, t in enumerate(texts)}
    avgdl = sum(dls.values()) / n
    df = Counter(term for c in tfs.values() for term in c)
    expect = set()
    for i, c in tfs.items():
        w = []
        for t, tf in c.items():
            idf = math.log((n - df[t] + 0.5) / (df[t] + 0.5) + 1.0)
            wt = idf * (tf * (k1 + 1.0)) \
                / (tf + k1 * (1.0 - b_ + b_ * dls[i] / avgdl))
            w.append((t, wt))
        w.sort(key=lambda kv: (-kv[1], kv[0]))
        for rk, (t, wt) in enumerate(w[:3], 1):
            expect.add((i, t, round(wt, 6), rk))

    got = {(r["doc_id"], r["term"], r["bm25"], r["rank"])
           for r in tfidf_top_terms(docs, k=3, scheme="bm25", n_buckets=3)
           .to_pandas().to_dict("records")}
    assert got == expect, got.symmetric_difference(expect)


def test_fuzzy_dedup_keep_distributed_matches_driver():
    """fuzzy_dedup_keep: the distributed union-find path
    (components_driver_threshold=0) must match the driver fast path, and
    exactly one survivor must be kept per near-dup component."""
    from shacl_validator_ray.stages import dedup

    texts = (["alpha beta gamma delta epsilon zeta"] * 3
             + ["one two three four five six seven"] * 2
             + ["unique document number %d words here" % i for i in range(4)])
    docs = rd.from_arrow(pa.table({
        "doc_id": pa.array(list(range(len(texts))), pa.int64()),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(["en"] * len(texts), pa.string())}))
    fast = dedup.fuzzy_dedup_keep(docs, tau=0.95).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    dist = dedup.fuzzy_dedup_keep(docs, tau=0.95,
                                  components_driver_threshold=0).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    assert fast.equals(dist)
    # clusters {0,1,2} and {3,4}: min-id survivor, everyone maps to it
    assert fast.loc[fast["doc_id"].isin([0, 1, 2]), "rep_id"].tolist() == [0, 0, 0]
    assert fast.loc[fast["doc_id"].isin([3, 4]), "rep_id"].tolist() == [3, 3]
    assert fast["keep"].tolist() == [True, False, False, True, False,
                                     True, True, True, True]


def test_fuzzy_dedup_survivors_have_no_remaining_dups():
    """Idempotence: re-running near-dup detection over the survivors of
    fuzzy_dedup_keep finds NO pair at the same tau — one pass removes
    every near-dup cluster, not just pairwise firsts."""
    from shacl_validator_ray.stages import dedup

    base = ["alpha beta gamma delta epsilon zeta eta theta"] * 4 \
        + ["one two three four five six seven eight"] * 3 \
        + ["unique doc %d with different words entirely %d" % (i, i * 7)
           for i in range(5)]
    docs = rd.from_arrow(pa.table({
        "doc_id": pa.array(list(range(len(base))), pa.int64()),
        "text": pa.array(base, pa.string()),
        "lang": pa.array(["en"] * len(base), pa.string())}))
    keep = dedup.fuzzy_dedup_keep(docs, tau=0.95).to_pandas()
    kept_ids = set(keep.loc[keep["keep"], "doc_id"])
    survivors = docs.filter(lambda r: r["doc_id"] in kept_ids).materialize()
    again = dedup.minhash_lsh_dup_pairs(survivors, tau=0.95)
    assert again.count() == 0
