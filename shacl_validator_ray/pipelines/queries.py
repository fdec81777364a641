"""The driver-contract registry: QUERIES (Ray pipelines) + ORACLE_SQL (DuckDB).

Every implemented operator from SURVEY.md §2 gets an entry; column names
in the Ray result and the SQL are kept identical (the driver compares
sorted-by-name columns with an order-insensitive value hash).

Float-valued results are rounded to 6 dp on both sides; quality metrics
are emitted as integer numerators/denominators so hashes are exact.
"""

from __future__ import annotations

from . import relational as R


def _docs(sf_dir: str):
    return R.t(sf_dir, "documents")


def _emb(sf_dir: str):
    return R.t(sf_dir, "embeddings")


# ---- text analysis ----

def q_token_counts(sf_dir: str):
    from ..stages import text
    return text.token_counts(_docs(sf_dir))


def q_bm25_top_terms(sf_dir: str):
    """Top-5 BM25 terms per document (k1=1.5, b=0.75; same two-shuffle
    plan as TF-IDF with doc length carried on the postings)."""
    from ..stages import text
    return text.tfidf_top_terms(_docs(sf_dir), k=5, scheme="bm25")


def q_unigram_nll(sf_dir: str):
    """Unigram-LM document scoring (avg negative log-likelihood under
    the corpus's own unigram distribution) — the perplexity-bucket
    curation axis, two bucketed shuffles."""
    from ..stages import text
    return text.unigram_doc_nll(_docs(sf_dir))


def q_bigram_nll(sf_dir: str):
    """Interpolated bigram-LM document scoring (λ=0.7 bigram +
    0.3 unigram backoff); counts attach bucket-locally."""
    from ..stages import text
    return text.bigram_doc_nll(_docs(sf_dir))


def q_postings_index(sf_dir: str):
    """Inverted-index build: per-term df/cf + capped champion posting
    list, one term-bucketed shuffle."""
    from ..stages import text
    return text.postings_index(_docs(sf_dir), cap=10)


def q_quota_sample(sf_dir: str):
    """At most 20 docs per source, selected by md5-of-id order
    (deterministic pseudorandom quota downsample)."""
    from ..stages import text
    return text.quota_sample(
        R.t(sf_dir, "documents", ["doc_id", "source"]), k=20)


def q_repetition_scores(sf_dir: str):
    """Gopher-style within-doc repetition metrics + flag."""
    from ..stages import text
    return text.repetition_scores(_docs(sf_dir))


def q_tfidf_top_terms(sf_dir: str):
    """Top-5 TF-IDF terms per document (tf·ln(N/df); two bucketed
    shuffles — df folds into the term-bucketed weight pass)."""
    from ..stages import text
    return text.tfidf_top_terms(_docs(sf_dir), k=5)


def q_quality_counts(sf_dir: str):
    import pyarrow as pa

    def fn(b: pa.Table) -> pa.Table:
        texts = b.column("text").to_pylist()
        stop = {"the", "a", "and", "of", "to", "in"}
        rows = {"doc_id": b.column("doc_id"), "q_chars": [], "q_tokens": [],
                "q_token_len_sum": [], "q_upper": [], "q_punct": [], "q_stopwords": []}
        for t in texts:
            t = t or ""
            toks = t.split()
            rows["q_chars"].append(len(t))
            rows["q_tokens"].append(len(toks))
            rows["q_token_len_sum"].append(sum(map(len, toks)))
            rows["q_upper"].append(sum(c.isupper() for c in t))
            rows["q_punct"].append(sum((not c.isalnum()) and (not c.isspace()) for c in t))
            rows["q_stopwords"].append(sum(w in stop for w in toks))
        return pa.table(rows)

    return _docs(sf_dir).map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def q_fingerprints(sf_dir: str):
    from ..stages import text
    return text.fingerprints(_docs(sf_dir))


def q_lang_id(sf_dir: str):
    from ..stages import text
    return text.language_id(_docs(sf_dir))


def q_sequence_pack(sf_dir: str):
    """LLM-pretraining sequence packing: global token offsets in corpus
    order via a two-phase distributed prefix sum + pack assignment."""
    from ..stages import text
    return text.sequence_pack(_docs(sf_dir), seq_len=2048)


def q_split_assign(sf_dir: str):
    """Deterministic md5-based train/val/test split assignment."""
    from ..stages import text
    return text.split_assign(_docs(sf_dir))


def q_contamination(sf_dir: str):
    """Train/eval decontamination: 8-gram overlap vs the eval split."""
    from ..stages import text
    return text.contamination(_docs(sf_dir), eval_mod=10)


# ---- dedup family ----

def q_exact_dedup(sf_dir: str):
    from ..stages import dedup
    return dedup.exact_dedup(_docs(sf_dir))


def q_jaccard_dups(sf_dir: str):
    from ..stages import dedup
    return dedup.jaccard_dup_pairs(_docs(sf_dir), tau=0.95)


def q_minhash_lsh_dups(sf_dir: str):
    from ..stages import dedup
    return dedup.minhash_lsh_dup_pairs(_docs(sf_dir), tau=0.95)


def q_simhash_dups(sf_dir: str):
    from ..stages import dedup
    return dedup.simhash_dup_pairs(_docs(sf_dir), max_hamming=3)


def q_embedding_dups(sf_dir: str):
    from ..stages import dedup
    return dedup.embedding_dup_pairs(_emb(sf_dir), tau=0.4)


def q_embedding_dups_ivf(sf_dir: str):
    """At-scale variant: IVF soft-assignment blocking, no natural key
    (rows-only — approximate by design, recall-tested in pytest)."""
    from ..stages import dedup
    return dedup.embedding_dup_pairs_ivf(_emb(sf_dir), tau=0.4)


def q_hash_split(sf_dir: str):
    """Deterministic hash train/val/test assignment over documents —
    the re-run/reshard-stable dataset-split step; oracle mirrors the
    little-endian md5 byte arithmetic exactly."""
    from ..stages import windows
    return windows.hash_split(_docs(sf_dir))


def q_retention_cohorts(sf_dir: str):
    """Cohort retention triangle over the event log: users cohorted by
    first-event week, distinct actives per (cohort, weeks-since) cell.
    One user-keyed shuffle + one small groupby."""
    from ..stages import windows
    from . import relational as R_
    return windows.retention_cohorts(
        R_.t(sf_dir, "events", ["user_id", "ts"]))


def q_table_profile(sf_dir: str):
    """Per-column data-quality profile of the orders table (count,
    nulls, exact distinct, min/max): fixed-size per-batch partials for
    the scalar stats + ONE (column, value) shuffle for exact distinct."""
    from . import relational as R_
    return R_.table_profile(
        R_.t(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_totalprice",
                                "o_orderstatus", "o_orderpriority"]),
        num_cols=["o_orderkey", "o_custkey", "o_totalprice"],
        str_cols=["o_orderstatus", "o_orderpriority"])


def q_source_cap(sf_dir: str):
    """C4-style per-source document cap (keep <= 10 per source by
    ascending doc id) — the host-level anti-overrepresentation step;
    one bucketed source-keyed groupby."""
    from ..stages import text
    return text.source_cap(_docs(sf_dir), cap=10)


def q_substring_dedup(sf_dir: str):
    """Exact repeated-substring removal (Lee et al. 2022 span surgery):
    every ≥5-token passage occurring more than once in the corpus is
    excised from all but its minimum-(doc, pos) occurrence; kept tokens
    re-join. Oracle reproduces the rolling-gram window arithmetic in
    SQL."""
    from ..stages import dedup
    return dedup.substring_dedup(_docs(sf_dir), k=5)


def q_substring_dedup_subk(sf_dir: str):
    """Span surgery WITH the sub-k boilerplate refinement: ≥5-token
    passages at count ≥ 2 (the Lee et al. pass) plus 3-token phrases at
    count ≥ 5 corpus-wide (high-multiplicity short boilerplate the k
    pass cannot see), both excised outside their canonical first
    occurrence — two gram widths riding one shuffle."""
    from ..stages import dedup
    return dedup.substring_dedup(_docs(sf_dir), k=5, sub_k=3,
                                 sub_k_min_count=5)


def q_fuzzy_dedup_keep(sf_dir: str):
    """Cluster-based near-dup removal: MinHash pairs → connected
    components → per-cluster survivor (min doc id). Oracle closes the
    exact all-pairs Jaccard graph with a recursive CTE."""
    from ..stages import dedup
    return dedup.fuzzy_dedup_keep(_docs(sf_dir), tau=0.95)


def q_dup_cluster_sizes(sf_dir: str):
    """Dedup REPORTING: near-dup cluster size histogram (size →
    number of clusters) off the fuzzy keep-one map — the
    dedup-effectiveness summary a curation run logs. Two tiny
    groupbys over the cluster map; oracle extends the recursive-CTE
    closure with the same histogram."""
    from ray.data.aggregate import Count

    from ..stages import dedup

    keep = dedup.fuzzy_dedup_keep(_docs(sf_dir), tau=0.95)
    return (keep.groupby("rep_id").aggregate(Count(alias_name="size"))
            .groupby("size").aggregate(Count(alias_name="n_clusters")))


def q_containment_dups(sf_dir: str):
    """Near-containment pairs (quote/subset duplicates Jaccard misses):
    |A∩B| / min(|A|,|B|) >= 0.95 within language blocks, min word-set
    size 25 (tiny sets are trivially contained)."""
    from ..stages import dedup
    return dedup.containment_dup_pairs(_docs(sf_dir), tau=0.95,
                                       min_size=25)


def q_curate_full(sf_dir: str):
    """End-to-end curation flagship: quality gate → cluster fuzzy dedup
    → decontamination (incl. dropping the eval split) → sequence
    packing. One bucketed merge applies every gate."""
    from . import curation
    return curation.curate_full(_docs(sf_dir))


def q_curation(sf_dir: str):
    from . import curation
    return curation.curate(_docs(sf_dir))


# ---- similarity search ----

def q_label_centroids(sf_dir: str):
    """Per-label embedding centroids as (label, dim, c) rows via
    fixed-size per-batch partials (labels × dims sums) + one groupby."""
    from ..stages import similarity
    return similarity.label_centroids(_emb(sf_dir))


def q_centroid_confusion(sf_dir: str):
    """Nearest-centroid classification confusion counts: distributed
    centroid partials → broadcast → vectorized assign → tiny groupby."""
    from ..stages import similarity
    return similarity.centroid_confusion(_emb(sf_dir))


def q_knn_bruteforce(sf_dir: str):
    from ..stages import similarity
    return similarity.knn_bruteforce(_emb(sf_dir), query_ids=[0, 1, 2], k=5)


def q_knn_lsh(sf_dir: str):
    from ..stages import similarity
    return similarity.knn_lsh(_emb(sf_dir), query_ids=[0, 1, 2], k=5)


def q_knn_ivf(sf_dir: str):
    from ..stages import similarity
    return similarity.knn_ivf(_emb(sf_dir), query_ids=[0, 1, 2], k=5)


# ---- streaming-shaped ops over the events log (SURVEY.md §2.9) ----

def q_tumbling_window(sf_dir: str):
    from ..stages import windows
    return windows.tumbling_window(R.t(sf_dir, "events", ["event_type", "ts", "value"]))


def q_session_windows(sf_dir: str):
    from ..stages import windows
    return windows.session_windows(R.t(sf_dir, "events",
                                       ["user_id", "ts", "event_id"]))


def q_sliding_window(sf_dir: str):
    from ..stages import windows
    return windows.sliding_window(R.t(sf_dir, "events", ["event_type", "ts", "value"]))


def q_stratified_sample(sf_dir: str):
    from ..stages import windows
    return windows.stratified_sample(
        R.t(sf_dir, "events", ["event_type", "event_id", "user_id"]),
        "event_type", "event_id", n_per_stratum=5)


def q_funnel_counts(sf_dir: str):
    """Ordered view→click→purchase funnel reach counts (strict-after
    step semantics); one user-keyed shuffle + scalar merges."""
    from ..stages import windows
    return windows.funnel_counts(
        R.t(sf_dir, "events", ["user_id", "event_type", "ts"]))


def q_zscore_outliers(sf_dir: str):
    """Per-user z-score anomalies (|z| > 2.5, sample std): two
    user-keyed shuffles, stats merged back without driver state."""
    from ..stages import windows
    return windows.zscore_outliers(
        R.t(sf_dir, "events", ["user_id", "event_id", "value"]))


def q_weighted_sample(sf_dir: str):
    """Deterministic A-ES weight-proportional sample (top-100 by
    u^(1/w), u from md5(doc_id)); per-batch local top-k partials folded
    through a k-bounded streaming reservoir (no sort shuffle; driver
    state is k rows at any corpus size)."""
    from ..stages import windows
    return windows.weighted_sample_reservoir(_docs(sf_dir), k=100)


def q_event_gaps(sf_dir: str):
    """Per-user inter-event gaps — the lag() window primitive as one
    user-keyed shuffle with bounded per-group sorts."""
    from ..stages import windows
    return windows.event_gaps(
        R.t(sf_dir, "events", ["user_id", "event_id", "ts"]))


def q_windowed_distinct(sf_dir: str):
    """Exact distinct users per tumbling day window (local pair dedup
    shrinks the shuffle; HLL is the at-scale swap)."""
    from ..stages import windows
    return windows.windowed_distinct_users(
        R.t(sf_dir, "events", ["ts", "user_id"]))


def q_props_stats(sf_dir: str):
    """Semi-structured JSON extraction: regex-pull k from props,
    aggregate per decile."""
    from ..stages import windows
    return windows.props_stats(
        R.t(sf_dir, "events", ["props", "value"]))


def q_decayed_user_stats(sf_dir: str):
    """Recency-weighted per-user engagement: exponentially decayed
    event count and value sum at the stream horizon (mergeable decayed
    partials; one streaming max for the horizon)."""
    from ..stages import windows
    return windows.decayed_user_stats(
        R.t(sf_dir, "events", ["user_id", "ts", "value"]))


def q_windowed_topk(sf_dir: str):
    """Per-tumbling-window heavy users (top-3 by count, deterministic
    tie-break) — windows composed with ranked top-k per group."""
    from ..stages import windows
    return windows.windowed_topk_users(
        R.t(sf_dir, "events", ["ts", "user_id"]), size_s=86400, k=3)


def q_watermark_filter(sf_dir: str):
    """Allowed-lateness gate over the bounded events log (§2.9)."""
    from ..stages import windows
    return windows.watermark_filter(
        R.t(sf_dir, "events", ["event_id", "user_id", "ts"]),
        delay_s=86400).select_columns(["event_id", "user_id"])


def q_asof_join(sf_dir: str):
    """As-of join: each click joins the latest view at-or-before it per
    user (custom §2.9 operator; DuckDB expresses it as a windowed
    greatest-match join)."""
    from ..stages import windows
    return windows.asof_join(
        R.t(sf_dir, "events", ["event_id", "user_id", "ts", "event_type"]))


def q_interval_join(sf_dir: str):
    """Range join: every event joined back to the session window that
    contains it (sessions from session_windows — non-overlapping per
    user, the operator's documented partitioning assumption)."""
    import pyarrow as pa

    from ..stages import windows

    ev = R.t(sf_dir, "events", ["event_id", "user_id", "ts"])
    points = ev.map_batches(
        lambda b: pa.table({
            "event_id": b["event_id"].cast(pa.int64()),
            "user_id": b["user_id"].cast(pa.int64()),
            "ts_s": pa.compute.divide(b["ts"].cast(pa.int64()),
                                      1_000_000).cast(pa.int64())}),
        batch_format="pyarrow", zero_copy_batch=True)
    sessions = windows.session_windows(
        R.t(sf_dir, "events", ["user_id", "ts", "event_id"]))
    return windows.interval_join(points, sessions)


def q_upsert_latest(sf_dir: str):
    from ..stages import windows
    return windows.upsert_latest(R.t(sf_dir, "events"))


def q_systematic_sample(sf_dir: str):
    from ..stages import windows
    return windows.systematic_sample(
        R.t(sf_dir, "events", ["event_id", "user_id", "event_type"]), "event_id")


# ---- multi-format RDF ingestion (S1–S4/M19 over report fixtures) ----

def q_jsonld_projection(sf_dir: str):
    from . import kg
    from ..stages import rdfio
    return rdfio.jsonld_projection(kg.triples_dataset(sf_dir))


# ---- flagship KG pipeline (over this repo's own synthetic corpus) ----
#
# Oracles for these run DuckDB directly over the deterministic corpus
# parquet under /tmp (written by synth.ensure_corpus — same seed, same
# rows for queries and oracle). The canonical-triples oracle checks the
# WHOLE pipeline (extract → link → canonicalize → dedup) against the
# planted ground truth; the validation oracle re-implements the four
# SHACL components in SQL (minCount as an anti-join — the absence path).

def q_kg_extract(sf_dir: str):
    # span_idx is dropped for the oracle compare: the planted ground truth
    # records which doc a fact came from, not which span the generator's
    # shuffle placed its sentence in
    from . import kg
    return kg.triples_dataset(sf_dir).select_columns(
        ["subj", "pred", "obj_kind", "obj_value", "obj_datatype", "obj_lang",
         "doc_id"])


def q_kg_canonical(sf_dir: str):
    from . import kg
    return kg.flagship(sf_dir).select_columns(
        ["subj", "pred", "obj_kind", "obj_value", "obj_datatype", "obj_lang"])


def q_kg_conformant(sf_dir: str):
    from . import kg
    return kg.conformant_triples(sf_dir).select_columns(
        ["subj", "pred", "obj_kind", "obj_value", "obj_datatype", "obj_lang"])


def q_kg_validate(sf_dir: str):
    from . import kg
    return kg.violations_dataset(sf_dir).select_columns(
        ["severity", "focus_node", "path", "value", "source_constraint_component"])


def q_kg_incremental(sf_dir: str):
    """Incremental revalidation end-to-end: full run as prior, then
    every even-numbered document is 'changed' and revalidated in
    isolation, splicing into the prior. The result must reproduce the
    full-run oracle exactly — the doc-local-focus contract in action."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from . import kg

    prior = kg.violations_dataset(sf_dir).materialize()
    docs = kg.documents_dataset(sf_dir)
    changed = []
    for b in docs.select_columns(["doc_id"]).iter_batches(
            batch_format="pyarrow"):
        for d in b["doc_id"].to_pylist():
            if int(str(d).rsplit("-", 1)[-1]) % 2 == 0:
                changed.append(d)
    out = kg.incremental_validate(sf_dir, changed, prior)
    return out.select_columns(
        ["severity", "focus_node", "path", "value",
         "source_constraint_component"])


def q_kg_validate_paths(sf_dir: str):
    """Round-2 breadth: property paths (sequence/alternative), target
    selectors, and length/in/hasValue components over the same corpus."""
    from ..stages import shacl
    from ..state import shapes as shapes_mod
    from . import kg
    return shacl.validate(
        kg.triples_dataset(sf_dir),
        shapes_mod.load_profile_ttl("paths_demo")).select_columns(
        ["severity", "focus_node", "path", "value",
         "source_constraint_component"])


def q_kg_validate_logic(sf_dir: str):
    """sh:or / sh:not logical constraints (logic_demo profile)."""
    from ..stages import shacl
    from ..state import shapes as shapes_mod
    from . import kg
    return shacl.validate(
        kg.triples_dataset(sf_dir),
        shapes_mod.load_profile_ttl("logic_demo")).select_columns(
        ["severity", "focus_node", "path", "value",
         "source_constraint_component"])


def q_kg_validate_node(sf_dir: str):
    """sh:node nested-shape validation (node_demo profile)."""
    from ..stages import shacl
    from ..state import shapes as shapes_mod
    from . import kg
    return shacl.validate(
        kg.triples_dataset(sf_dir),
        shapes_mod.load_profile_ttl("node_demo")).select_columns(
        ["severity", "focus_node", "path", "value",
         "source_constraint_component"])


def q_kg_validate_qualified(sf_dir: str):
    """sh:qualifiedValueShape (qualified_demo profile)."""
    from ..stages import shacl
    from ..state import shapes as shapes_mod
    from . import kg
    return shacl.validate(
        kg.triples_dataset(sf_dir),
        shapes_mod.load_profile_ttl("qualified_demo")).select_columns(
        ["severity", "focus_node", "path", "value",
         "source_constraint_component"])


def q_kg_validate_pairs(sf_dir: str):
    """Property-pair components (pairs_demo profile): sh:equals /
    sh:disjoint / sh:lessThan / sh:lessThanOrEquals over the planted
    timeline (issued/modified) and size (byteSize/quota/recheck) pairs."""
    from ..stages import shacl
    from ..state import shapes as shapes_mod
    from . import kg
    return shacl.validate(
        kg.triples_dataset(sf_dir),
        shapes_mod.load_profile_ttl("pairs_demo")).select_columns(
        ["severity", "focus_node", "path", "value",
         "source_constraint_component"])


def q_kg_validate_full(sf_dir: str):
    """Integration: EVERY feature family in one validate() run (the five
    demo profiles' shapes concatenated into a single shapes graph)."""
    from ..stages import shacl
    from ..state import shapes as shapes_mod
    from . import kg
    return shacl.validate(
        kg.triples_dataset(sf_dir),
        shapes_mod.load_profile_ttl("full_demo")).select_columns(
        ["severity", "focus_node", "path", "value",
         "source_constraint_component"])


def q_kg_paths_constraint_counts(sf_dir: str):
    from ..stages import report, shacl
    from ..state import shapes as shapes_mod
    from . import kg
    viols = shacl.validate(kg.triples_dataset(sf_dir),
                           shapes_mod.load_profile_ttl("paths_demo"))
    return report.constraint_components(viols)


def q_kg_severity_counts(sf_dir: str):
    from ..stages import shacl
    from . import kg
    return shacl.severity_partition(kg.violations_dataset(sf_dir))


def q_kg_constraint_counts(sf_dir: str):
    from ..stages import report
    from . import kg
    return report.constraint_components(kg.violations_dataset(sf_dir))


def q_kg_top_shapes(sf_dir: str):
    from ..stages import report
    from . import kg
    df = report.top_shapes(kg.violations_dataset(sf_dir), k=6)
    return df[["source_shape", "violation", "warning", "info", "total"]]


def q_kg_links(sf_dir: str):
    from . import kg
    return kg.links_dataset(sf_dir)


def q_kg_discovery(sf_dir: str):
    """Streams the FULL record set (discover_datasets_ds — no unbounded
    driver page) and projects the compared columns distributively."""
    import json as _json

    import pyarrow as pa

    from ..stages import discovery
    from . import kg

    ds = discovery.discover_datasets_ds(kg.triples_dataset(sf_dir))

    def project(b: pa.Table) -> pa.Table:
        recs = [_json.loads(r) for r in b["rec"].to_pylist()]
        return pa.table({
            "id": pa.array([r["id"] for r in recs], pa.string()),
            "title": pa.array([r["title"] for r in recs], pa.string()),
            "n_dists": pa.array([len(r["distributions"]) for r in recs],
                                pa.int64())})

    return ds.map_batches(project, batch_format="pyarrow")


def q_kg_media_features(sf_dir: str):
    """Media feature extraction (byte-histogram × fixed projection),
    oracle-checked against feature vectors planted independently at
    corpus-synthesis time — one column per dimension for exact hashing."""
    import pyarrow as pa

    from ..stages import multimodal
    from . import kg

    feats = multimodal.media_features(kg.documents_dataset(sf_dir))

    def widen(b: pa.Table) -> pa.Table:
        import numpy as np

        f = np.array([list(v) for v in b["feature"].to_pylist()],
                     dtype=np.float32) if b.num_rows else \
            np.zeros((0, 16), dtype=np.float32)
        cols = {c: b[c] for c in ("doc_id", "span_idx", "kind", "media_ref")}
        for i in range(16):
            cols[f"f{i}"] = pa.array(f[:, i].astype("float64"), pa.float64())
        return pa.table(cols)

    return feats.map_batches(widen, batch_format="pyarrow",
                             zero_copy_batch=True)


def q_kg_image_stats(sf_dir: str):
    """Real PPM decode → integer-exact pixel statistics, oracle-checked
    against the gt_media table planted at corpus-synthesis time."""
    from ..stages import multimodal
    from . import kg
    return multimodal.image_stats_table(kg.documents_dataset(sf_dir))


def q_kg_bgp_constraint(sf_dir: str):
    """sh:sparql analog (§2.10): declarative BGP constraint — flag every
    dataset offering a PDF-only distribution format, expressed as two
    joined triple patterns over the extracted graph."""
    from ..functions import ns
    from ..stages.bgp import BGPConstraint
    from . import kg

    cc = BGPConstraint(
        patterns=[("$this", ns.DCAT + "distribution", "?d"),
                  ("?d", ns.DCT + "format", "application/pdf")],
        component="http://example.org/constraints#NoPdfDistribution",
        message="dataset offers a PDF distribution")
    return cc.violations(kg.triples_dataset(sf_dir)).select_columns(
        ["severity", "focus_node", "value", "source_constraint_component"])


def q_kg_bgp_union(sf_dir: str):
    """sh:sparql UNION analog: a dataset violates when ANY alternative
    chain matches — here a PDF distribution OR a text/turtle one; each
    alternative is an independent distributed chain, unioned as
    distinct focus sets."""
    from ..functions import ns
    from ..stages.bgp import BGPConstraint
    from . import kg

    cc = BGPConstraint(
        patterns=[("$this", ns.DCAT + "distribution", "?d"),
                  ("?d", ns.DCT + "format", "application/pdf")],
        union_patterns=[[("$this", ns.DCAT + "distribution", "?e"),
                         ("?e", ns.DCT + "format", "text/turtle")]],
        component="http://example.org/constraints#NoPdfOrTurtle",
        message="dataset offers a PDF or Turtle distribution")
    return cc.violations(kg.triples_dataset(sf_dir)).select_columns(
        ["severity", "focus_node", "value", "source_constraint_component"])


def q_kg_bgp_optional(sf_dir: str):
    """sh:sparql OPTIONAL analog: the PDF-distribution violation
    annotated with the dataset's title when one exists (left-outer
    bucketed merge; OPTIONAL never filters)."""
    from ..functions import ns
    from ..stages.bgp import BGPConstraint
    from . import kg

    cc = BGPConstraint(
        patterns=[("$this", ns.DCAT + "distribution", "?d"),
                  ("?d", ns.DCT + "format", "application/pdf")],
        optional_pattern=("$this", ns.DCT + "title", "?t"),
        component="http://example.org/constraints#NoPdfDistributionTitled",
        message="dataset offers a PDF distribution")
    return cc.violations(kg.triples_dataset(sf_dir)).select_columns(
        ["severity", "focus_node", "path", "value",
         "source_constraint_component"])


def q_kg_bgp_not_exists(sf_dir: str):
    """sh:sparql FILTER NOT EXISTS analog: datasets that offer at least
    one distribution but NONE in text/csv — a distributed anti-join of
    two BGP solution sets."""
    from ..functions import ns
    from ..stages.bgp import BGPConstraint
    from . import kg

    cc = BGPConstraint(
        patterns=[("$this", ns.DCAT + "distribution", "?d")],
        absent_patterns=[("$this", ns.DCAT + "distribution", "?z"),
                         ("?z", ns.DCT + "format", "text/csv")],
        component="http://example.org/constraints#NoCsvDistribution",
        message="dataset has distributions but none in text/csv")
    return cc.violations(kg.triples_dataset(sf_dir)).select_columns(
        ["severity", "focus_node", "value", "source_constraint_component"])


def q_kg_bgp_paths(sf_dir: str):
    """sh:sparql property-path analog: patterns whose predicate is a
    SHACL path — a sequence path collapses the dataset→distribution→
    format 2-hop join into one virtual-predicate match, and an
    alternative path requires a title-or-description label; both reuse
    the validator's path derivation (shacl._seq_rows / alt rows)."""
    from ..functions import ns
    from ..stages.bgp import BGPConstraint
    from . import kg

    cc = BGPConstraint(
        patterns=[("$this", ("seq", [ns.DCAT + "distribution",
                                     ns.DCT + "format"]),
                   "application/pdf"),
                  ("$this", ("alt", [ns.DCT + "title",
                                     ns.DCT + "description"]), "?label")],
        component="http://example.org/constraints#PdfViaPath",
        message="dataset reaches a PDF format via its distributions")
    return cc.violations(kg.triples_dataset(sf_dir)).select_columns(
        ["severity", "focus_node", "value", "source_constraint_component"])


def q_kg_bgp_varpred(sf_dir: str):
    """sh:sparql variable-predicate analog: ?p in predicate position
    binds the pred column; the FILTER restricts the binding to the
    dct: namespace. Flags every node carrying 'application/pdf' under
    any dct predicate."""
    from ..functions import ns
    from ..stages.bgp import BGPConstraint
    from . import kg

    dct = ns.DCT
    cc = BGPConstraint(
        patterns=[("$this", "?p", "application/pdf")],
        filter_fn=lambda df: df["?p"].str.startswith(dct),
        component="http://example.org/constraints#PdfValueAnyDctPred",
        message="node carries application/pdf under a dct predicate")
    return cc.violations(kg.triples_dataset(sf_dir)).select_columns(
        ["severity", "focus_node", "value", "source_constraint_component"])


def q_kg_bgp_scalar_subquery(sf_dir: str):
    """sh:sparql scalar-subquery analog: compare a binding against a
    PRECOMPUTED corpus aggregate (here: distributions whose byteSize
    exceeds the corpus average) — the aggregate is one tiny distributed
    reduction broadcast into the FILTER, the SPARQL
    ``(SELECT avg(...) ...)`` pattern."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from ..functions import ns
    from ..stages.bgp import BGPConstraint
    from . import kg

    from ..stages import shacl as shacl_mod

    # set semantics for the aggregate (the oracle averages DISTINCT
    # rows): dedup before the mean, mirroring the quad-store model
    triples = shacl_mod.dedup_triples(
        kg.triples_dataset(sf_dir)).materialize()
    size_pred = ns.DCAT + "byteSize"

    def sizes(b: pa.Table) -> pa.Table:
        f = b.filter(pc.equal(b["pred"], size_pred))
        return pa.table({"v": pc.cast(f["obj_value"], pa.float64())})

    sz = triples.map_batches(sizes, batch_format="pyarrow",
                             zero_copy_batch=True)
    mean = sz.mean("v")

    cc = BGPConstraint(
        patterns=[("$this", size_pred, "?v")],
        filter_fn=lambda df, m=mean: df["?v"].astype(float) > m,
        component="http://example.org/constraints#AboveAvgByteSize",
        message="distribution byteSize exceeds the corpus average")
    return cc.violations(triples).select_columns(
        ["severity", "focus_node", "value", "source_constraint_component"])


def q_kg_bgp_having(sf_dir: str):
    """sh:sparql aggregate analog (GROUP BY $this HAVING count): flag
    publishers credited on more than 30 distinct datasets — a
    variable-subject pattern grouped on the object, counted
    distributed (two binding-sized groupbys, vectorized threshold)."""
    from ..functions import ns
    from ..stages.bgp import BGPConstraint
    from . import kg

    cc = BGPConstraint(
        patterns=[("?d", ns.DCT + "publisher", "$this")],
        having=("?d", ">", 30),
        component="http://example.org/constraints#ProlificPublisher",
        message="publisher credited on more than 30 datasets")
    return cc.violations(kg.triples_dataset(sf_dir)).select_columns(
        ["severity", "focus_node", "value", "source_constraint_component"])


def q_kg_bgp_having_sum(sf_dir: str):
    """Numeric HAVING aggregate (parsed from SELECT text): datasets
    whose summed distribution byteSize exceeds 5 MB — SUM over the
    DISTINCT solution set per focus (set semantics; two ?d with equal
    sizes both count), two binding-sized shuffles."""
    from ..functions.sparql import parse_select
    from . import kg

    cc = parse_select(
        """
        PREFIX dcat: <http://www.w3.org/ns/dcat#>
        SELECT $this WHERE {
            $this dcat:distribution ?d .
            ?d dcat:byteSize ?s .
        } GROUP BY $this HAVING (SUM(?s) > 5000000)""",
        component="http://example.org/constraints#OversizedDataset",
        message="dataset's distributions exceed 5MB in total")
    return cc.violations(kg.triples_dataset(sf_dir)).select_columns(
        ["severity", "focus_node", "value", "source_constraint_component"])


def q_kg_bgp_value_projection(sf_dir: str):
    """SHACL-SPARQL ?value projection (parsed from SELECT text): one
    violation per (dataset, PDF-distribution) solution pair, with the
    distribution IRI in the report's value column."""
    from ..functions.sparql import parse_select
    from . import kg

    cc = parse_select(
        """
        PREFIX dcat: <http://www.w3.org/ns/dcat#>
        PREFIX dct: <http://purl.org/dc/terms/>
        SELECT $this ?value WHERE {
            $this dcat:distribution ?value .
            ?value dct:format "application/pdf" .
        }""",
        component="http://example.org/constraints#PdfDistributionValue",
        message="dataset offers this PDF distribution")
    return cc.violations(kg.triples_dataset(sf_dir)).select_columns(
        ["severity", "focus_node", "value", "source_constraint_component"])


def q_kg_bgp_values(sf_dir: str):
    """SPARQL VALUES inline table, parsed from SELECT text (the
    sh:select parser path end-to-end): distributions whose format is in
    the VALUES list — applied as one vectorized inner merge with the
    broadcast inline table, never a shuffle."""
    from ..functions.sparql import parse_select
    from . import kg

    cc = parse_select(
        """
        PREFIX dcat: <http://www.w3.org/ns/dcat#>
        PREFIX dct: <http://purl.org/dc/terms/>
        SELECT $this WHERE {
            $this dcat:distribution ?d .
            ?d dct:format ?f .
            VALUES ?f { "application/pdf" "text/turtle" }
        }""",
        component="http://example.org/constraints#PdfOrTurtleValues",
        message="dataset offers a PDF or Turtle distribution")
    return cc.violations(kg.triples_dataset(sf_dir)).select_columns(
        ["severity", "focus_node", "value", "source_constraint_component"])


def q_kg_bgp_nested_optional(sf_dir: str):
    """Nested OPTIONAL (parsed from SELECT text): the PDF violation
    annotated with the min distribution's format via a two-step
    left-outer chain — OPTIONAL { $this dist ?dd . OPTIONAL { ?dd
    format ?ff } }; value = deepest bound value, path = that step's
    predicate, first-value-ascending at every step."""
    from ..functions.sparql import parse_select
    from . import kg

    cc = parse_select(
        """
        PREFIX dcat: <http://www.w3.org/ns/dcat#>
        PREFIX dct: <http://purl.org/dc/terms/>
        SELECT $this WHERE {
            $this dcat:distribution ?d .
            ?d dct:format "application/pdf" .
            OPTIONAL { $this dcat:distribution ?dd .
                       OPTIONAL { ?dd dct:format ?ff } }
        }""",
        component="http://example.org/constraints#PdfNestedOptional",
        message="dataset offers a PDF distribution")
    return cc.violations(kg.triples_dataset(sf_dir)).select_columns(
        ["severity", "focus_node", "path", "value",
         "source_constraint_component"])


def q_kg_validate_sparql_ttl(sf_dir: str):
    """sh:sparql constraints carried IN a profile TTL (sparql_demo) and
    validated end-to-end: compile_shapes parses the SELECT text (with
    sh:prefixes/sh:declare) into BGPConstraints, validate() runs them
    alongside the built-ins — the reference's data-driven plug-in
    surface (SHACLValidationService.ts:399-406) with zero Python in the
    loop."""
    import pyarrow.compute as pc

    from ..functions import ns
    from ..stages import shacl
    from ..state import shapes as shapes_mod
    from . import kg

    viols = shacl.validate(kg.triples_dataset(sf_dir),
                           shapes_mod.load_profile_ttl("sparql_demo"))
    comp = ns.SH + "SPARQLConstraintComponent"
    return viols.map_batches(
        lambda b: b.filter(pc.equal(b["source_constraint_component"], comp))
                   .select(["severity", "focus_node", "value"]),
        batch_format="pyarrow")


def q_embedding_quantize(sf_dir: str):
    """Symmetric 8-bit scalar quantization of the embedding column (the
    ANN compression step): per-dim ranges from one fixed-size mergeable
    stats pass, vectorized per-batch quantize, half-up rounding
    mirrored exactly in SQL. Long (vec_id, dim, q) output."""
    from ..stages import similarity
    return similarity.quantize_embeddings(_emb(sf_dir))


def q_kg_redact(sf_dir: str):
    """Regex redaction over the interleaved text+media documents (PII
    scrub / number normalization): timestamps then bare numbers rewrite
    in text spans, media spans pass through, span order/kind/media_ref
    survive (the north rule's span-sequence invariant)."""
    from ..stages import text as text_mod
    from . import kg
    return text_mod.redact_spans(kg.documents_dataset(sf_dir))


def q_kg_canon_diff(sf_dir: str):
    """Graph snapshot diff (the change feed between two materialized
    graphs): what canonicalization changed — triples present only in
    the raw extracted set ('del': mention-IRI rows the rewrite retired)
    vs only in the canonical set ('add': their canonical rewrites).
    One bucketed tagged-union merge keyed on the subject."""
    from ..stages import materialize, shacl
    from . import kg

    raw = shacl.dedup_triples(kg.triples_dataset(sf_dir))
    canon = kg.canonical_triples(sf_dir)
    return materialize.triple_diff(raw, canon).select_columns(
        ["op", "subj", "pred", "obj_kind", "obj_value", "obj_datatype",
         "obj_lang"])


def q_kg_pagerank(sf_dir: str):
    """Distributed PageRank over the extracted resource graph (5 power
    iterations, d=0.85; SQL oracle unrolls the same iterations)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from ..stages.graph import pagerank
    from . import kg

    def to_edges(b: pa.Table) -> pa.Table:
        f = b.filter(pc.equal(b["obj_kind"], "iri"))
        return pa.table({"src": f["subj"].cast(pa.string()),
                         "dst": f["obj_value"].cast(pa.string())})

    edges = kg.triples_dataset(sf_dir).map_batches(
        to_edges, batch_format="pyarrow", zero_copy_batch=True)
    return pagerank(edges, iters=5)


def q_kg_ppr(sf_dir: str):
    """PERSONALIZED PageRank (random walk with restart): restart mass
    goes to the catalog root instead of uniformly — seed-relative
    relevance over the extracted resource graph. Oracle: the unrolled
    iterations with the seed-case base term."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from ..functions import ns
    from ..stages.graph import pagerank
    from . import kg

    def to_edges(b: pa.Table) -> pa.Table:
        f = b.filter(pc.equal(b["obj_kind"], "iri"))
        return pa.table({"src": f["subj"].cast(pa.string()),
                         "dst": f["obj_value"].cast(pa.string())})

    edges = kg.triples_dataset(sf_dir).map_batches(
        to_edges, batch_format="pyarrow", zero_copy_batch=True)
    return pagerank(edges, iters=5, seeds=[ns.EX + "catalog/main"])


def q_kg_ppr_dangling(sf_dir: str):
    """Personalized PageRank with dangling-mass teleport to the SEED
    set (ranks sum to 1): sink mass returns to the restart
    distribution each round, the standard personalized-walk rule."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from ..functions import ns
    from ..stages.graph import pagerank
    from . import kg

    def to_edges(b: pa.Table) -> pa.Table:
        f = b.filter(pc.equal(b["obj_kind"], "iri"))
        return pa.table({"src": f["subj"].cast(pa.string()),
                         "dst": f["obj_value"].cast(pa.string())})

    edges = kg.triples_dataset(sf_dir).map_batches(
        to_edges, batch_format="pyarrow", zero_copy_batch=True)
    return pagerank(edges, iters=5, seeds=[ns.EX + "catalog/main"],
                    redistribute_dangling=True)


def q_kg_pagerank_dangling(sf_dir: str):
    """PageRank with dangling-mass teleport: sink-node rank is
    redistributed uniformly each round so ranks sum to 1 (oracle adds
    the identical d·D_t/N term per unrolled iteration)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from ..stages.graph import pagerank
    from . import kg

    def to_edges(b: pa.Table) -> pa.Table:
        f = b.filter(pc.equal(b["obj_kind"], "iri"))
        return pa.table({"src": f["subj"].cast(pa.string()),
                         "dst": f["obj_value"].cast(pa.string())})

    edges = kg.triples_dataset(sf_dir).map_batches(
        to_edges, batch_format="pyarrow", zero_copy_batch=True)
    return pagerank(edges, iters=5, redistribute_dangling=True)


def q_kg_triangles(sf_dir: str):
    """Exact triangle count of the undirected resource graph
    (degree-ordered orientation; oracle counts wedges through each
    triangle's minimum node)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from ..stages.graph import triangle_count
    from . import kg

    def to_edges(b: pa.Table) -> pa.Table:
        f = b.filter(pc.equal(b["obj_kind"], "iri"))
        return pa.table({"src": f["subj"].cast(pa.string()),
                         "dst": f["obj_value"].cast(pa.string())})

    edges = kg.triples_dataset(sf_dir).map_batches(
        to_edges, batch_format="pyarrow", zero_copy_batch=True)
    return triangle_count(edges)


def q_kg_validate_versioned(sf_dir: str):
    """Reference-parity versioned profile: version/branch-resolved
    MULTI-FILE shape union (two TTL files re-declaring one node shape,
    each contributing a property — S7 union semantics) validated over
    the corpus at the default version/branch."""
    from ..stages import shacl
    from ..state import shapes as shapes_mod
    from . import kg
    return shacl.validate(
        kg.triples_dataset(sf_dir),
        shapes_mod.load_profile_ttl("versioned_demo")).select_columns(
        ["severity", "focus_node", "path", "value",
         "source_constraint_component"])


def q_kg_incremental_graph(sf_dir: str):
    """Incremental canonicalize/materialize end-to-end: full run as
    prior, every even-numbered document 'changes', its links re-resolve
    and splice into the prior canonical map (affected components only),
    and the rewrite must reproduce the full-run canonical graph hash
    exactly."""
    from ..stages import canonicalize
    from . import kg

    prior_links = kg.links_dataset(sf_dir).materialize()
    prior_map = canonicalize.canonical_map_from_links(
        prior_links).materialize()
    docs = kg.documents_dataset(sf_dir)
    changed = []
    for b in docs.select_columns(["doc_id"]).iter_batches(
            batch_format="pyarrow"):
        for d in b["doc_id"].to_pylist():
            if int(str(d).rsplit("-", 1)[-1]) % 2 == 0:
                changed.append(d)
    out = kg.incremental_canonical_triples(sf_dir, changed, prior_links,
                                           prior_map)
    return out.select_columns(
        ["subj", "pred", "obj_kind", "obj_value", "obj_datatype", "obj_lang"])


def q_kg_components(sf_dir: str):
    """Weakly connected components over the dataset→distribution edge
    graph via the engine's distributed union-find (label propagation as
    iterative groupby-aggregate rounds); ``driver_threshold=0`` forces
    the distributed path even at oracle scale, so the driver-checked
    result exercises the 10^12-route. Oracle: recursive-CTE closure,
    rep = min IRI per component."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from ..stages.canonicalize import connected_components
    from ..stages import extract as ex
    from . import kg

    dist_pred = "http://www.w3.org/ns/dcat#distribution"

    def to_edges(b: pa.Table) -> pa.Table:
        f = b.filter(pc.and_(pc.equal(b["obj_kind"], "iri"),
                             pc.equal(b["pred"], dist_pred)))
        f = f.filter(pc.not_equal(f["subj"], f["obj_value"]))
        return pa.table({"a": f["subj"].cast(pa.string()),
                         "b": f["obj_value"].cast(pa.string())})

    edges = kg.triples_dataset(sf_dir).map_batches(
        to_edges, batch_format="pyarrow", zero_copy_batch=True)
    return connected_components(edges, driver_threshold=0)


def q_kg_kcore(sf_dir: str):
    """k-core decomposition (k=2) of the undirected resource graph by
    distributed iterative peeling; every round shrinks the edge set and
    checkpoints it. Oracle unrolls the same peeling rule."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from ..stages.graph import kcore
    from . import kg

    def to_edges(b: pa.Table) -> pa.Table:
        f = b.filter(pc.equal(b["obj_kind"], "iri"))
        return pa.table({"src": f["subj"].cast(pa.string()),
                         "dst": f["obj_value"].cast(pa.string())})

    edges = kg.triples_dataset(sf_dir).map_batches(
        to_edges, batch_format="pyarrow", zero_copy_batch=True)
    return kcore(edges, k=2)


def q_kg_communities(sf_dir: str):
    """Community detection: 3 rounds of deterministic semi-synchronous
    label propagation (most frequent neighbor label, ties → min) over
    the undirected resource graph; oracle unrolls the same rule."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from ..stages.graph import label_propagation
    from . import kg

    def to_edges(b: pa.Table) -> pa.Table:
        f = b.filter(pc.equal(b["obj_kind"], "iri"))
        return pa.table({"src": f["subj"].cast(pa.string()),
                         "dst": f["obj_value"].cast(pa.string())})

    edges = kg.triples_dataset(sf_dir).map_batches(
        to_edges, batch_format="pyarrow", zero_copy_batch=True)
    return label_propagation(edges, rounds=3)


def q_kg_shared_themes(sf_dir: str):
    """Set-similarity self-join: dataset pairs sharing ≥2 themes via
    the inverted-index plan (value-keyed pair emission, pair-keyed
    threshold count); hot values are capped with a warning."""
    from ..functions import ns
    from ..stages.graph import shared_attribute_pairs
    from . import kg

    return shared_attribute_pairs(kg.triples_dataset(sf_dir),
                                  ns.DCAT + "theme", min_shared=2)


def q_kg_hops(sf_dir: str):
    """BFS hop distances from the catalog roots over the directed
    catalog→dataset→distribution containment edges (3 relax rounds;
    oracle unrolls the identical min-relaxation)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from ..functions import ns
    from ..stages.graph import bfs_hops
    from . import kg

    preds = pa.array([ns.DCAT + "dataset", ns.DCAT + "distribution"])

    def to_edges(b: pa.Table) -> pa.Table:
        f = b.filter(pc.and_(pc.equal(b["obj_kind"], "iri"),
                             pc.is_in(b["pred"], value_set=preds)))
        return pa.table({"src": f["subj"].cast(pa.string()),
                         "dst": f["obj_value"].cast(pa.string())})

    def to_sources(b: pa.Table) -> pa.Table:
        f = b.filter(pc.equal(b["pred"], ns.DCAT + "dataset"))
        return pa.table({"node": pc.unique(f["subj"].cast(pa.string()))})

    tr = kg.triples_dataset(sf_dir).materialize()
    edges = tr.map_batches(to_edges, batch_format="pyarrow",
                           zero_copy_batch=True)
    sources = tr.map_batches(to_sources, batch_format="pyarrow",
                             zero_copy_batch=True).groupby("node").count() \
        .select_columns(["node"])
    return bfs_hops(edges, sources, rounds=3)


def q_kg_property_breakdown(sf_dir: str):
    """A6 (ReportViewer.tsx:166-190): per-path severity pivot, top 8."""
    from ..stages import report
    from . import kg
    df = report.property_breakdown(kg.violations_dataset(sf_dir))
    return df[["path", "violation", "warning", "info", "total"]]


def q_kg_focus_types(sf_dir: str):
    """A7 (ReportViewer.tsx:193-216): regex-classified focus-node types."""
    from ..stages import report
    from . import kg
    df = report.focus_node_breakdown(kg.violations_dataset(sf_dir))
    return df[["node_class", "violation", "warning", "info", "total"]]


def q_kg_grouped_findings(sf_dir: str):
    from ..stages import report
    from . import kg
    df = report.grouped_findings(kg.violations_dataset(sf_dir)).to_pandas()
    return df[["severity", "source_shape", "source_constraint_component",
               "msg_fp", "total"]]


QUERIES = {
    # flagship KG pipeline (oracle over the deterministic corpus ground truth)
    "kg_extract": q_kg_extract,
    "kg_canonical": q_kg_canonical,
    "kg_conformant": q_kg_conformant,
    "kg_validate": q_kg_validate,
    "kg_incremental": q_kg_incremental,
    "kg_incremental_graph": q_kg_incremental_graph,
    "kg_validate_versioned": q_kg_validate_versioned,
    "kg_validate_paths": q_kg_validate_paths,
    "kg_validate_logic": q_kg_validate_logic,
    "kg_validate_node": q_kg_validate_node,
    "kg_validate_qualified": q_kg_validate_qualified,
    "kg_validate_pairs": q_kg_validate_pairs,
    "kg_validate_full": q_kg_validate_full,
    "kg_paths_constraint_counts": q_kg_paths_constraint_counts,
    "kg_severity_counts": q_kg_severity_counts,
    "kg_constraint_counts": q_kg_constraint_counts,
    "kg_top_shapes": q_kg_top_shapes,
    "kg_grouped_findings": q_kg_grouped_findings,
    "kg_property_breakdown": q_kg_property_breakdown,
    "kg_focus_types": q_kg_focus_types,
    "kg_links": q_kg_links,
    "kg_discovery": q_kg_discovery,
    "kg_bgp_constraint": q_kg_bgp_constraint,
    "kg_bgp_not_exists": q_kg_bgp_not_exists,
    "kg_bgp_union": q_kg_bgp_union,
    "kg_bgp_optional": q_kg_bgp_optional,
    "kg_bgp_paths": q_kg_bgp_paths,
    "kg_bgp_varpred": q_kg_bgp_varpred,
    "kg_bgp_having": q_kg_bgp_having,
    "kg_bgp_values": q_kg_bgp_values,
    "kg_bgp_value_projection": q_kg_bgp_value_projection,
    "kg_bgp_having_sum": q_kg_bgp_having_sum,
    "kg_bgp_nested_optional": q_kg_bgp_nested_optional,
    "kg_validate_sparql_ttl": q_kg_validate_sparql_ttl,
    "kg_bgp_scalar_subquery": q_kg_bgp_scalar_subquery,
    "embedding_quantize": q_embedding_quantize,
    "kg_redact": q_kg_redact,
    "kg_canon_diff": q_kg_canon_diff,
    "kg_pagerank": q_kg_pagerank,
    "kg_ppr": q_kg_ppr,
    "kg_ppr_dangling": q_kg_ppr_dangling,
    "kg_pagerank_dangling": q_kg_pagerank_dangling,
    "kg_triangles": q_kg_triangles,
    "kg_components": q_kg_components,
    "kg_kcore": q_kg_kcore,
    "kg_communities": q_kg_communities,
    "kg_shared_themes": q_kg_shared_themes,
    "kg_hops": q_kg_hops,
    "kg_media_features": q_kg_media_features,
    "kg_image_stats": q_kg_image_stats,
    # relational operator inventory (SURVEY.md §2)
    "severity_counts": R.severity_counts,
    "pruned_agg": R.pruned_agg,
    "stats_agg": R.stats_agg,
    "first_match": R.first_match,
    "multi_value": R.multi_value,
    "topk_brands": R.topk_brands,
    "distinct_counts": R.distinct_counts,
    "quantiles_qty": R.quantiles_qty,
    "dedup_first": R.dedup_first,
    "join_orders_customers": R.join_orders_customers,
    "join_native": R.join_native,
    "two_hop_join": R.two_hop_join,
    "anti_join_customers": R.anti_join_customers,
    "anti_join_native": R.anti_join_native,
    "left_join_native": R.left_join_native,
    "full_outer_native": R.full_outer_native,
    "star_join_revenue": R.star_join_revenue,
    "pivot_counts": R.pivot_counts,
    "customers_above_avg": R.customers_above_avg,
    "value_histogram": R.value_histogram,
    "regression_per_type": R.regression_per_type,
    "rank_quartiles": R.rank_quartiles,
    "q6_revenue": R.q6_revenue,
    "orders_by_month": R.orders_by_month,
    "cardinality_bounds": R.cardinality_bounds,
    "union_distinct": R.union_distinct,
    "top_orders": R.top_orders,
    "top_orders_per_customer": R.top_orders_per_customer,
    "running_total_per_user": R.running_total_per_user,
    "snapshot_counts": R.snapshot_counts,
    "salted_group_count": R.salted_group_count,
    "heavy_users": R.heavy_users,
    "bigram_counts": R.bigram_counts,
    "group_quantiles": R.group_quantiles,
    "rollup_counts": R.rollup_counts,
    "filter_search_limit": R.filter_search_limit,
    # text analysis
    "token_counts": q_token_counts,
    "tfidf_top_terms": q_tfidf_top_terms,
    "bm25_top_terms": q_bm25_top_terms,
    "quota_sample": q_quota_sample,
    "unigram_nll": q_unigram_nll,
    "bigram_nll": q_bigram_nll,
    "postings_index": q_postings_index,
    "repetition_scores": q_repetition_scores,
    "quality_counts": q_quality_counts,
    "fingerprints": q_fingerprints,
    "sequence_pack": q_sequence_pack,
    "contamination": q_contamination,
    "split_assign": q_split_assign,
    "lang_id": q_lang_id,
    # dedup family
    "exact_dedup": q_exact_dedup,
    "jaccard_dups": q_jaccard_dups,
    "minhash_lsh_dups": q_minhash_lsh_dups,
    "simhash_dups": q_simhash_dups,
    "embedding_dups": q_embedding_dups,
    "embedding_dups_ivf": q_embedding_dups_ivf,
    "fuzzy_dedup_keep": q_fuzzy_dedup_keep,
    "dup_cluster_sizes": q_dup_cluster_sizes,
    "containment_dups": q_containment_dups,
    "substring_dedup": q_substring_dedup,
    "substring_dedup_subk": q_substring_dedup_subk,
    "source_cap": q_source_cap,
    "table_profile": q_table_profile,
    "retention_cohorts": q_retention_cohorts,
    "hash_split": q_hash_split,
    "curation": q_curation,
    "curate_full": q_curate_full,
    # similarity search
    "label_centroids": q_label_centroids,
    "centroid_confusion": q_centroid_confusion,
    "knn_bruteforce": q_knn_bruteforce,
    "knn_lsh": q_knn_lsh,
    "knn_ivf": q_knn_ivf,
    # streaming-shaped windows / upsert / sampling
    "tumbling_window": q_tumbling_window,
    "sliding_window": q_sliding_window,
    "session_windows": q_session_windows,
    "upsert_latest": q_upsert_latest,
    "asof_join": q_asof_join,
    "interval_join": q_interval_join,
    "watermark_filter": q_watermark_filter,
    "funnel_counts": q_funnel_counts,
    "zscore_outliers": q_zscore_outliers,
    "weighted_sample": q_weighted_sample,
    "event_gaps": q_event_gaps,
    "windowed_topk": q_windowed_topk,
    "decayed_user_stats": q_decayed_user_stats,
    "windowed_distinct": q_windowed_distinct,
    "props_stats": q_props_stats,
    "stratified_sample": q_stratified_sample,
    "systematic_sample": q_systematic_sample,
    # RDF projection
    "jsonld_projection": q_jsonld_projection,
}

_JACCARD_PAIRS_SQL = """
WITH t AS (SELECT doc_id, lang, list_distinct(string_split(text, ' ')) AS ws FROM documents),
p AS (
  SELECT a.doc_id AS doc1, b.doc_id AS doc2,
         len(list_intersect(a.ws, b.ws))::DOUBLE
           / len(list_distinct(list_concat(a.ws, b.ws))) AS j
  FROM t a JOIN t b ON a.lang = b.lang AND a.doc_id < b.doc_id)
SELECT doc1, doc2, round(j, 6) AS jac FROM p WHERE j >= 0.95
"""

ORACLE_SQL = {
    "severity_counts":
        "SELECT l_returnflag, count(*) AS n FROM lineitem GROUP BY l_returnflag",
    "pruned_agg": """
        SELECT l_returnflag, l_linestatus,
               round(sum(l_quantity), 2) AS sum_qty,
               round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_rev,
               count(*) AS n
        FROM lineitem GROUP BY l_returnflag, l_linestatus""",
    "stats_agg": """
        SELECT l_returnflag, round(avg(l_quantity), 6) AS avg_qty,
               round(stddev_samp(l_quantity), 6) AS std_qty, count(*) AS n
        FROM lineitem GROUP BY l_returnflag""",
    "first_match":
        "SELECT o_custkey, arg_min(o_orderdate, o_orderkey) AS first_orderdate "
        "FROM orders GROUP BY o_custkey",
    "multi_value":
        "SELECT o_custkey, array_to_string(list_sort(list(DISTINCT o_orderpriority)), ',') "
        "AS priorities FROM orders GROUP BY o_custkey",
    "topk_brands":
        "SELECT p_brand, count(*) AS n FROM part GROUP BY p_brand "
        "ORDER BY n DESC, p_brand LIMIT 6",
    "distinct_counts":
        "SELECT count(DISTINCT l_partkey) AS parts, count(DISTINCT l_suppkey) AS supps, "
        "count(DISTINCT l_orderkey) AS orders FROM lineitem",
    "quantiles_qty":
        "SELECT round(quantile_disc(l_quantity, 0.25), 2) AS q25, "
        "round(quantile_disc(l_quantity, 0.5), 2) AS q50, "
        "round(quantile_disc(l_quantity, 0.75), 2) AS q75 FROM lineitem",
    "dedup_first":
        "SELECT l_orderkey, min(l_linenumber) AS l_linenumber FROM lineitem "
        "GROUP BY l_orderkey",
    "join_orders_customers": """
        SELECT c_nationkey, round(sum(o_totalprice), 2) AS total, count(*) AS n
        FROM orders JOIN customer ON o_custkey = c_custkey GROUP BY c_nationkey""",
    "join_native": """
        SELECT p_brand, round(sum(l_quantity), 2) AS sum_qty, count(*) AS n
        FROM lineitem JOIN part ON l_partkey = p_partkey GROUP BY p_brand""",
    "two_hop_join": """
        SELECT r_name, count(*) AS n_suppliers, round(sum(s_acctbal), 2) AS total_bal
        FROM supplier JOIN nation ON s_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey GROUP BY r_name""",
    "anti_join_customers": """
        SELECT c_mktsegment, count(*) AS n FROM customer
        WHERE c_custkey NOT IN
          (SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT')
        GROUP BY c_mktsegment""",
    "anti_join_native": """
        SELECT c_mktsegment, count(*) AS n FROM customer
        WHERE c_custkey NOT IN
          (SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT')
        GROUP BY c_mktsegment""",
    "cardinality_bounds": """
        SELECT o_custkey AS c_custkey, count(*) AS n FROM orders
        GROUP BY o_custkey HAVING count(*) > 15""",
    "union_distinct":
        "SELECT DISTINCT c_nationkey FROM customer "
        "WHERE c_mktsegment IN ('AUTOMOBILE', 'BUILDING')",
    "top_orders":
        "SELECT o_orderkey, o_totalprice FROM orders "
        "ORDER BY o_totalprice DESC, o_orderkey LIMIT 10",
    "top_orders_per_customer": """
        SELECT o_custkey, o_orderkey, o_totalprice FROM orders
        QUALIFY row_number() OVER (PARTITION BY o_custkey
                                   ORDER BY o_totalprice DESC, o_orderkey) <= 2""",
    "running_total_per_user": """
        SELECT user_id, event_id,
               round(sum(value) OVER (PARTITION BY user_id ORDER BY event_id
                                      ROWS UNBOUNDED PRECEDING), 2)
                 AS running_total
        FROM events""",
    "snapshot_counts":
        "SELECT event_type, count(DISTINCT user_id) AS n_users FROM events "
        "GROUP BY event_type",
    "salted_group_count":
        "SELECT user_id, count(*) AS n FROM events GROUP BY user_id",
    # sketch-gated exact heavy hitters ≡ plain GROUP BY HAVING
    "heavy_users":
        "SELECT user_id::VARCHAR AS user_id, count(*) AS n FROM events "
        "GROUP BY user_id HAVING count(*) >= 80",
    # bigrams: \s+ split leaves '' only at the edges, and any pair
    # containing '' is filtered — identical to Python str.split pairs
    "bigram_counts": r"""
        WITH toks AS (SELECT regexp_split_to_array(coalesce(text, ''),
                                                   '\s+') AS ws
                      FROM documents),
        g AS (SELECT ws[i] || ' ' || ws[i + 1] AS gram
              FROM toks CROSS JOIN range(1, 3000) t(i)
              WHERE i + 1 <= len(ws) AND ws[i] != '' AND ws[i + 1] != '')
        SELECT gram, count(*) AS n FROM g
        GROUP BY gram ORDER BY n DESC, gram LIMIT 50""",
    "group_quantiles": """
        SELECT event_type,
               round(quantile_disc(value, 0.25), 2) AS q25,
               round(quantile_disc(value, 0.5), 2) AS q50,
               round(quantile_disc(value, 0.75), 2) AS q75
        FROM events GROUP BY event_type""",
    "filter_search_limit":
        "SELECT doc_id, source FROM documents WHERE contains(text, 'merge') "
        "ORDER BY doc_id LIMIT 50",
    "rollup_counts": """
        SELECT coalesce(l_returnflag, 'ALL') AS l_returnflag,
               coalesce(l_linestatus, 'ALL') AS l_linestatus,
               count(*) AS n, round(sum(l_quantity), 2) AS sum_qty
        FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)""",
    "left_join_native": """
        SELECT c.c_custkey, c.c_mktsegment,
               coalesce(o.n_orders, 0)::BIGINT AS n_orders
        FROM customer c
        LEFT JOIN (SELECT o_custkey, count(*) AS n_orders
                   FROM orders GROUP BY o_custkey) o
          ON c.c_custkey = o.o_custkey""",
    # explicit sufficient-statistics arithmetic (NOT regr_slope) so the
    # summation form matches the engine's mergeable partials; x centered
    # at 2024-01-01 for conditioning, intercept at that origin
    "regression_per_type": """
        WITH e AS (SELECT event_type,
                          epoch_us(ts) / 1e6 - 1704067200.0 AS x,
                          value AS y
                   FROM events),
        s AS (SELECT event_type, count(*)::DOUBLE AS n, sum(x) AS sx,
                     sum(y) AS sy, sum(x * y) AS sxy, sum(x * x) AS sxx
              FROM e GROUP BY event_type)
        SELECT event_type, n::BIGINT AS n,
               round((sxy / n - (sx / n) * (sy / n))
                     / (sxx / n - (sx / n) * (sx / n)), 6) AS slope,
               round(sy / n - ((sxy / n - (sx / n) * (sy / n))
                               / (sxx / n - (sx / n) * (sx / n)))
                             * (sx / n), 6) AS intercept
        FROM s""",
    "orders_by_month": """
        SELECT (year(o_orderdate) * 100 + month(o_orderdate))::BIGINT
                   AS month,
               count(*) AS n, round(sum(o_totalprice), 2) AS total
        FROM orders GROUP BY 1""",
    "q6_revenue": """
        SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue,
               count(*) AS n
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate < TIMESTAMP '1997-01-01'
          AND l_discount BETWEEN 0.05 AND 0.07
          AND l_quantity < 24""",
    "rank_quartiles": """
        SELECT c_custkey,
               row_number() OVER (ORDER BY c_acctbal, c_custkey) AS rnk,
               ntile(4) OVER (ORDER BY c_acctbal, c_custkey) AS quartile
        FROM customer""",
    "customers_above_avg": """
        SELECT c_custkey, round(c_acctbal, 2) AS c_acctbal FROM customer
        WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer)""",
    "value_histogram": """
        SELECT floor(l_quantity / 5.0) * 5.0 AS bucket, count(*) AS n
        FROM lineitem GROUP BY 1""",
    "star_join_revenue": """
        SELECT c.c_mktsegment,
               round(sum(l.l_extendedprice * (1 - l.l_discount)), 2)
                   AS revenue,
               count(*) AS n
        FROM lineitem l
        JOIN orders o ON l.l_orderkey = o.o_orderkey
        JOIN customer c ON o.o_custkey = c.c_custkey
        GROUP BY c.c_mktsegment""",
    "pivot_counts": """
        SELECT source,
               count(*) FILTER (WHERE lang = 'en') AS n_en,
               count(*) FILTER (WHERE lang = 'es') AS n_es,
               count(*) FILTER (WHERE lang = 'de') AS n_de,
               count(*) FILTER (WHERE lang = 'fr') AS n_fr,
               count(*) FILTER (WHERE lang = 'zh') AS n_zh
        FROM documents GROUP BY source""",
    "full_outer_native": """
        SELECT coalesce(c.nationkey, s.nationkey) AS nationkey,
               coalesce(c.n_cust, 0)::BIGINT AS n_cust,
               coalesce(s.n_supp, 0)::BIGINT AS n_supp
        FROM (SELECT c_nationkey AS nationkey, count(*) AS n_cust
              FROM customer GROUP BY c_nationkey) c
        FULL OUTER JOIN (SELECT s_nationkey AS nationkey, count(*) AS n_supp
                         FROM supplier GROUP BY s_nationkey) s
          ON c.nationkey = s.nationkey""",
    # BM25: Robertson idf with +1 smoothing, k1=1.5, b=0.75 — identical
    # double expression order as stages/text.py::tfidf_top_terms(bm25)
    "bm25_top_terms": r"""
        WITH toks AS (SELECT doc_id,
                             regexp_extract_all(coalesce(text, ''), '\S+')
                               AS ws
                      FROM documents),
        t AS (SELECT doc_id, unnest(ws) AS term, len(ws) AS dl FROM toks),
        tf AS (SELECT doc_id, term, count(*)::DOUBLE AS tf,
                      any_value(dl)::DOUBLE AS dl
               FROM t GROUP BY doc_id, term),
        nn AS (SELECT count(*)::DOUBLE AS n FROM documents),
        ad AS (SELECT coalesce(sum(tf), 0) / (SELECT n FROM nn) AS avgdl
               FROM tf),
        df AS (SELECT term, count(*)::DOUBLE AS df FROM tf GROUP BY term),
        w AS (SELECT t2.doc_id, t2.term,
                     ln(((SELECT n FROM nn) - d.df + 0.5) / (d.df + 0.5)
                        + 1.0)
                     * (t2.tf * (1.5 + 1.0))
                     / (t2.tf + 1.5 * (1.0 - 0.75
                        + 0.75 * t2.dl / (SELECT avgdl FROM ad))) AS wt
              FROM tf t2 JOIN df d USING (term)),
        r AS (SELECT doc_id, term, wt,
                     row_number() OVER (PARTITION BY doc_id
                                        ORDER BY wt DESC, term) AS rk
              FROM w)
        SELECT doc_id, term, round(wt, 6) AS bm25, rk AS rank
        FROM r WHERE rk <= 5""",
    "quota_sample": """
        SELECT doc_id, source FROM
          (SELECT doc_id, source,
                  row_number() OVER (PARTITION BY source
                                     ORDER BY md5(doc_id::VARCHAR), doc_id)
                    AS rk
           FROM documents)
        WHERE rk <= 20""",
    # unigram LM trained on the corpus itself; ln() sum order differs
    # from the engine's per-bucket accumulation only below the 1e-6
    # rounding grain
    "unigram_nll": r"""
        WITH toks AS (SELECT doc_id,
                             regexp_extract_all(coalesce(text, ''), '\S+')
                               AS ws
                      FROM documents),
        t AS (SELECT doc_id, unnest(ws) AS term, len(ws) AS dl FROM toks),
        tc AS (SELECT doc_id, term, max(dl) AS dl, count(*) AS tf
               FROM t GROUP BY doc_id, term),
        cf AS (SELECT term, sum(tf) AS cf FROM tc GROUP BY term),
        n AS (SELECT sum(tf)::DOUBLE AS nt FROM tc)
        SELECT tc.doc_id, max(tc.dl)::BIGINT AS dl,
               round(-sum(tc.tf * ln(cf.cf / n.nt)) / max(tc.dl), 6) AS nll
        FROM tc JOIN cf USING (term), n
        GROUP BY tc.doc_id""",
    # parallel unnest zips value and index positionally
    "label_centroids": """
        WITH e AS (SELECT label, unnest(embedding) AS x,
                          unnest(range(0, len(embedding))) AS dim
                   FROM embeddings)
        SELECT label::BIGINT AS label, dim::BIGINT AS dim,
               round(avg(x), 6) AS c
        FROM e GROUP BY label, dim""",
    # nearest-centroid assignment; argmax tie-break = smallest label on
    # both sides (row_number label asc / numpy first-max over ascending
    # label order)
    "centroid_confusion": """
        WITH cent AS (SELECT label AS clabel,
                             list(avgv ORDER BY dim) AS cvec
                      FROM (SELECT label, dim, avg(x) AS avgv FROM
                              (SELECT label, unnest(embedding) AS x,
                                      unnest(range(0, len(embedding)))
                                        AS dim
                               FROM embeddings)
                            GROUP BY label, dim)
                      GROUP BY label),
        sims AS (SELECT e.vec_id, e.label, c.clabel,
                        list_cosine_similarity(e.embedding, c.cvec) AS s
                 FROM embeddings e CROSS JOIN cent c),
        best AS (SELECT vec_id, label, clabel,
                        row_number() OVER (PARTITION BY vec_id
                            ORDER BY s DESC, clabel) AS rn
                 FROM sims)
        SELECT label::BIGINT AS label, clabel::BIGINT AS pred_label,
               count(*) AS n
        FROM best WHERE rn = 1 GROUP BY 1, 2""",
    # interpolated bigram LM: identical probability expression order;
    # doc-initial tokens score by the unigram term alone
    "bigram_nll": r"""
        WITH toks AS (SELECT doc_id, string_split(text, ' ') AS wl
                      FROM documents),
        t AS (SELECT doc_id, wl[i] AS cur,
                     CASE WHEN i = 1 THEN '' ELSE wl[i - 1] END AS prev,
                     len(wl) AS dl
              FROM toks CROSS JOIN range(1, 2000) q(i)
              WHERE i <= len(wl)),
        n AS (SELECT count(*)::DOUBLE AS nt FROM t),
        uni AS (SELECT cur, count(*)::DOUBLE AS c FROM t GROUP BY cur),
        big AS (SELECT prev, cur, count(*)::DOUBLE AS c FROM t
                WHERE prev != '' GROUP BY prev, cur),
        pref AS (SELECT prev, count(*)::DOUBLE AS c FROM t
                 WHERE prev != '' GROUP BY prev),
        terms AS (SELECT t.doc_id, t.dl,
                    CASE WHEN t.prev = '' THEN ln(u.c / n.nt)
                         ELSE ln(0.7 * b.c / p.c + 0.3 * u.c / n.nt)
                    END AS lp
                  FROM t JOIN uni u ON u.cur = t.cur
                       LEFT JOIN big b ON b.prev = t.prev
                                      AND b.cur = t.cur
                       LEFT JOIN pref p ON p.prev = t.prev, n)
        SELECT doc_id, max(dl)::BIGINT AS dl,
               round(-sum(lp) / max(dl), 6) AS nll
        FROM terms GROUP BY doc_id""",
    "postings_index": r"""
        WITH toks AS (SELECT doc_id,
                             regexp_extract_all(coalesce(text, ''), '\S+')
                               AS ws
                      FROM documents),
        t AS (SELECT doc_id, unnest(ws) AS term FROM toks),
        tc AS (SELECT doc_id, term, count(*) AS tf
               FROM t GROUP BY doc_id, term)
        SELECT term, count(*)::BIGINT AS df, sum(tf)::BIGINT AS cf,
               array_to_string(
                   list_slice(list(doc_id ORDER BY doc_id), 1, 10),
                   ',') AS postings
        FROM tc GROUP BY term""",
    # the composed curation flagship: every gate is the SQL analog of
    # its distributed stage, chained exactly as the Ray pipeline chains
    "curate_full": r"""
WITH RECURSIVE t AS (SELECT doc_id, lang, text,
        list_distinct(string_split(text, ' ')) AS ws,
        length(regexp_extract_all(text, '\S+'))::BIGINT AS n_tokens
      FROM documents),
p AS (SELECT a.doc_id AS d1, b.doc_id AS d2
      FROM t a JOIN t b ON a.lang = b.lang AND a.doc_id < b.doc_id
      WHERE len(list_intersect(a.ws, b.ws))::DOUBLE
              / len(list_distinct(list_concat(a.ws, b.ws))) >= 0.95),
e AS (SELECT d1 AS a, d2 AS b FROM p UNION SELECT d2, d1 FROM p),
reach(n, m) AS (SELECT a, b FROM e
                UNION
                SELECT r.n, e2.b FROM reach r JOIN e e2 ON r.m = e2.a),
rep AS (SELECT n AS doc_id, least(n, min(m)) AS rep_id FROM reach GROUP BY n),
tokd AS (SELECT doc_id, string_split(text, ' ') AS wl FROM documents),
grams AS (SELECT doc_id, array_to_string(wl[i:i+7], ' ') AS g
          FROM tokd CROSS JOIN range(1, 2000) q(i) WHERE i + 7 <= len(wl)
          GROUP BY doc_id, g),
ev AS (SELECT DISTINCT g FROM grams WHERE doc_id % 10 = 0),
contam AS (SELECT DISTINCT gr.doc_id FROM grams gr JOIN ev ON gr.g = ev.g
           WHERE gr.doc_id % 10 != 0),
final AS (SELECT t.doc_id, t.n_tokens
          FROM t LEFT JOIN rep ON rep.doc_id = t.doc_id
          WHERE t.n_tokens BETWEEN 20 AND 200
            AND coalesce(rep.rep_id, t.doc_id) = t.doc_id
            AND t.doc_id % 10 != 0
            AND t.doc_id NOT IN (SELECT doc_id FROM contam)),
c AS (SELECT doc_id, n_tokens,
        (sum(n_tokens) OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING)
         - n_tokens)::BIGINT AS token_offset
      FROM final)
SELECT doc_id, n_tokens, token_offset,
       (token_offset // 2048)::BIGINT AS pack_id
FROM c""",
    # same token/n-gram expressions as the Python Counter-based metrics
    "repetition_scores": r"""
        WITH q AS (SELECT doc_id,
                          regexp_extract_all(coalesce(text, ''), '\S+')
                            AS toks
                   FROM documents),
        g AS (SELECT doc_id, toks, len(toks) AS n,
                     CASE WHEN len(toks) >= 2 THEN
                       [toks[i] || ' ' || toks[i + 1]
                        FOR i IN range(1, len(toks))]
                     ELSE [] END AS g2,
                     CASE WHEN len(toks) >= 3 THEN
                       [toks[i] || ' ' || toks[i + 1] || ' ' || toks[i + 2]
                        FOR i IN range(1, len(toks) - 1)]
                     ELSE [] END AS g3,
                     CASE WHEN len(toks) >= 4 THEN
                       [toks[i] || ' ' || toks[i + 1] || ' ' || toks[i + 2]
                        || ' ' || toks[i + 3]
                        FOR i IN range(1, len(toks) - 2)]
                     ELSE [] END AS g4
              FROM q),
        m AS (SELECT doc_id, n,
                     CASE WHEN n = 0 THEN 0.0 ELSE round(
                       (SELECT max(c)::DOUBLE FROM (
                          SELECT count(*) AS c FROM unnest(toks) AS u(t)
                          GROUP BY t)) / n, 6) END AS topf,
                     CASE WHEN len(g2) = 0 THEN 0.0 ELSE round(
                       1.0 - len(list_distinct(g2))::DOUBLE
                           / len(g2), 6) END AS dupf2,
                     CASE WHEN len(g3) = 0 THEN 0.0 ELSE round(
                       1.0 - len(list_distinct(g3))::DOUBLE
                           / len(g3), 6) END AS dupf3,
                     CASE WHEN len(g4) = 0 THEN 0.0 ELSE round(
                       1.0 - len(list_distinct(g4))::DOUBLE
                           / len(g4), 6) END AS dupf4
              FROM g)
        SELECT doc_id, n AS n_tokens, topf AS top_unigram_frac,
               dupf2 AS dup_bigram_frac, dupf3 AS dup_trigram_frac,
               dupf4 AS dup_fourgram_frac,
               (topf > 0.2 OR dupf2 > 0.4) AS flagged
        FROM m""",
    # tf·ln(N/df) with the identical double-precision expression order;
    # ties (equal weight in one doc) break on term asc in both engines
    "tfidf_top_terms": r"""
        WITH toks AS (SELECT doc_id,
                             unnest(regexp_extract_all(coalesce(text, ''),
                                                       '\S+')) AS term
                      FROM documents),
        tf AS (SELECT doc_id, term, count(*)::DOUBLE AS tf
               FROM toks GROUP BY doc_id, term),
        nn AS (SELECT count(*)::DOUBLE AS n FROM documents),
        df AS (SELECT term, count(*)::DOUBLE AS df FROM tf GROUP BY term),
        w AS (SELECT t.doc_id, t.term,
                     t.tf * ln((SELECT n FROM nn) / d.df) AS wt
              FROM tf t JOIN df d USING (term)),
        r AS (SELECT doc_id, term, wt,
                     row_number() OVER (PARTITION BY doc_id
                                        ORDER BY wt DESC, term) AS rk
              FROM w)
        SELECT doc_id, term, round(wt, 6) AS tfidf, rk AS rank
        FROM r WHERE rk <= 5""",
    "hash_split": """
        WITH u AS (SELECT doc_id,
                          ('0x' || substr(h,7,2) || substr(h,5,2)
                           || substr(h,3,2) || substr(h,1,2))::UINTEGER
                              ::DOUBLE / 4294967296 AS u
                   FROM (SELECT doc_id,
                                md5('split|' || doc_id::VARCHAR) AS h
                         FROM documents))
        SELECT doc_id, CASE WHEN u < 0.9 THEN 'train'
                            WHEN u < 0.95 THEN 'val'
                            ELSE 'test' END AS split
        FROM u""",
    "retention_cohorts": r"""
        WITH up AS (SELECT user_id,
                           epoch_us(ts) // 604800000000 AS period
                    FROM events),
        d AS (SELECT DISTINCT user_id, period FROM up),
        c AS (SELECT user_id, min(period) AS cohort FROM d
              GROUP BY user_id)
        SELECT c.cohort AS cohort_period,
               d.period - c.cohort AS period_offset,
               count(*) AS n_users
        FROM d JOIN c USING (user_id)
        GROUP BY 1, 2""",
    "table_profile": r"""
        SELECT 'o_orderkey' AS "column", count(*) AS n,
               count(*) - count(o_orderkey) AS nulls,
               count(DISTINCT o_orderkey) AS n_distinct,
               round(min(o_orderkey), 6)::DOUBLE AS min_v, round(max(o_orderkey), 6)::DOUBLE AS max_v,
               NULL::VARCHAR AS min_s, NULL::VARCHAR AS max_s
        FROM orders
        UNION ALL
        SELECT 'o_custkey' AS "column", count(*) AS n,
               count(*) - count(o_custkey) AS nulls,
               count(DISTINCT o_custkey) AS n_distinct,
               round(min(o_custkey), 6)::DOUBLE AS min_v, round(max(o_custkey), 6)::DOUBLE AS max_v,
               NULL::VARCHAR AS min_s, NULL::VARCHAR AS max_s
        FROM orders
        UNION ALL
        SELECT 'o_totalprice' AS "column", count(*) AS n,
               count(*) - count(o_totalprice) AS nulls,
               count(DISTINCT o_totalprice) AS n_distinct,
               round(min(o_totalprice), 6)::DOUBLE AS min_v, round(max(o_totalprice), 6)::DOUBLE AS max_v,
               NULL::VARCHAR AS min_s, NULL::VARCHAR AS max_s
        FROM orders
        UNION ALL
        SELECT 'o_orderstatus' AS "column", count(*) AS n,
               count(*) - count(o_orderstatus) AS nulls,
               count(DISTINCT o_orderstatus) AS n_distinct,
               NULL::DOUBLE AS min_v, NULL::DOUBLE AS max_v,
               min(o_orderstatus)::VARCHAR AS min_s, max(o_orderstatus)::VARCHAR AS max_s
        FROM orders
        UNION ALL
        SELECT 'o_orderpriority' AS "column", count(*) AS n,
               count(*) - count(o_orderpriority) AS nulls,
               count(DISTINCT o_orderpriority) AS n_distinct,
               NULL::DOUBLE AS min_v, NULL::DOUBLE AS max_v,
               min(o_orderpriority)::VARCHAR AS min_s, max(o_orderpriority)::VARCHAR AS max_s
        FROM orders""",
    "source_cap": r"""
        SELECT doc_id, source,
               row_number() OVER (PARTITION BY source
                                  ORDER BY doc_id) AS src_rank,
               row_number() OVER (PARTITION BY source
                                  ORDER BY doc_id) <= 10 AS keep
        FROM documents""",
    "embedding_quantize": r"""
        WITH e AS (SELECT vec_id,
                          unnest(embedding)::DOUBLE AS v,
                          generate_subscripts(embedding, 1) - 1 AS dim
                   FROM embeddings),
        st AS (SELECT dim, min(v) AS lo, max(v) AS hi FROM e GROUP BY dim)
        SELECT e.vec_id, e.dim,
               CASE WHEN st.hi = st.lo THEN 0
                    ELSE floor((e.v - st.lo) * 255.0
                               / (st.hi - st.lo) + 0.5)::BIGINT
               END AS q
        FROM e JOIN st USING (dim)""",
    "token_counts": r"""
        SELECT doc_id,
               length(regexp_extract_all(text, '\S+')) AS n_tokens,
               length(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^\sA-Za-z0-9]+'))
                 AS n_bpe_tokens
        FROM documents""",
    "quality_counts": r"""
        WITH q AS (SELECT doc_id, text, regexp_extract_all(text, '\S+') AS toks
                   FROM documents)
        SELECT doc_id,
               length(text)::BIGINT AS q_chars,
               len(toks)::BIGINT AS q_tokens,
               coalesce(list_aggregate(list_transform(toks, x -> length(x)), 'sum'), 0)::BIGINT
                 AS q_token_len_sum,
               length(regexp_replace(text, '[^A-Z]', '', 'g'))::BIGINT AS q_upper,
               length(regexp_replace(text, '[A-Za-z0-9\s]', '', 'g'))::BIGINT AS q_punct,
               len(list_filter(toks, x -> x IN ('the','a','and','of','to','in')))::BIGINT
                 AS q_stopwords
        FROM q""",
    "fingerprints":
        "SELECT doc_id, md5(lower(trim(text))) AS fp FROM documents",
    # md5-modulo split assignment (same arithmetic as the Ray stage)
    "split_assign": """
        WITH h AS (SELECT doc_id,
                          ('0x' || substr(md5(doc_id::VARCHAR), 1, 8))::UBIGINT
                          % 100 AS bucket
                   FROM documents)
        SELECT doc_id, bucket::BIGINT AS bucket,
               CASE WHEN bucket < 10 THEN 'test'
                    WHEN bucket < 20 THEN 'val'
                    ELSE 'train' END AS split
        FROM h""",
    # 8-gram overlap vs the eval split (doc_id % 10 == 0); distinct
    # grams per doc, counted per training doc
    "contamination": """
        WITH toks AS (SELECT doc_id, string_split(text, ' ') AS ws
                      FROM documents),
        grams AS (SELECT doc_id, array_to_string(ws[i:i+7], ' ') AS g
                  FROM toks CROSS JOIN range(1, 2000) t(i)
                  WHERE i + 7 <= len(ws)
                  GROUP BY doc_id, g),
        ev AS (SELECT DISTINCT g FROM grams WHERE doc_id % 10 = 0),
        hits AS (SELECT g.doc_id, count(*) AS n_hits
                 FROM grams g JOIN ev ON g.g = ev.g
                 WHERE g.doc_id % 10 != 0 GROUP BY g.doc_id)
        SELECT doc_id, n_hits FROM hits""",
    # prefix-sum pack assignment: offset = running token total BEFORE
    # the doc (corpus order = doc_id order); pack = offset // seq_len
    "sequence_pack": r"""
        WITH t AS (SELECT doc_id,
                          length(regexp_extract_all(text, '\S+'))::BIGINT AS n_tokens
                   FROM documents),
        c AS (SELECT doc_id, n_tokens,
                     (sum(n_tokens) OVER (ORDER BY doc_id
                                          ROWS UNBOUNDED PRECEDING)
                      - n_tokens)::BIGINT AS token_offset
              FROM t)
        SELECT doc_id, n_tokens, token_offset,
               (token_offset // 2048)::BIGINT AS pack_id
        FROM c""",
    "exact_dedup":
        "SELECT doc_id, text, lang, source, n_chars FROM documents",
    "jaccard_dups": _JACCARD_PAIRS_SQL,
    "minhash_lsh_dups": _JACCARD_PAIRS_SQL,
    # survivor map: exact all-pairs dup graph, closed transitively with a
    # recursive CTE (dup clusters are tiny, so the closure is cheap at
    # oracle scale), rep = min doc id reachable
    # substring_dedup: the same rolling 5-gram window arithmetic in SQL —
    # duplicated grams (count ≥ 2 over the corpus) mark every occurrence
    # except the (doc_id, pos)-minimum; marked [pos, pos+5) token spans
    # union into a removal mask per doc; kept tokens string_agg in order.
    # Groups on the exact gram STRING — the ground truth the engine's
    # 64-bit rotate-XOR fingerprints approximate (2^-64 collision odds)
    "substring_dedup": r"""
        WITH toks AS (SELECT doc_id,
                             regexp_extract_all(coalesce(text, ''), '\S+') AS tl
                      FROM documents),
        gi AS (SELECT doc_id, tl,
                      unnest(range(0, greatest(len(tl) - 4, 0))) AS i
               FROM toks),
        g AS (SELECT doc_id, i,
                     array_to_string(list_slice(tl, i + 1, i + 5), ' ') AS g
              FROM gi),
        marked AS (SELECT doc_id, i,
                          row_number() OVER (PARTITION BY g
                                             ORDER BY doc_id, i) AS rn,
                          count(*) OVER (PARTITION BY g) AS c
                   FROM g),
        rm AS (SELECT doc_id, i FROM marked WHERE c >= 2 AND rn > 1),
        ti AS (SELECT doc_id, tl, unnest(range(0, len(tl))) AS ti
               FROM toks),
        tok AS (SELECT doc_id, ti, tl[ti + 1] AS tok FROM ti),
        kept AS (SELECT k.doc_id, k.ti, k.tok
                 FROM tok k
                 WHERE NOT EXISTS (SELECT 1 FROM rm r
                                   WHERE r.doc_id = k.doc_id
                                     AND r.i <= k.ti AND k.ti < r.i + 5))
        SELECT d.doc_id,
               coalesce(string_agg(kp.tok, ' ' ORDER BY kp.ti), '') AS text,
               len(x.tl) - count(kp.tok) AS n_removed
        FROM documents d
        JOIN toks x ON x.doc_id = d.doc_id
        LEFT JOIN kept kp ON kp.doc_id = d.doc_id
        GROUP BY d.doc_id, len(x.tl)""",
    # substring_dedup_subk: the same arithmetic plus the 3-gram
    # boilerplate gate (count >= 5 corpus-wide); removal spans carry
    # their own width
    "substring_dedup_subk": r"""
        WITH toks AS (SELECT doc_id,
                             regexp_extract_all(coalesce(text, ''), '\S+') AS tl
                      FROM documents),
        gi5 AS (SELECT doc_id, tl,
                       unnest(range(0, greatest(len(tl) - 4, 0))) AS i
                FROM toks),
        g5 AS (SELECT doc_id, i,
                      array_to_string(list_slice(tl, i + 1, i + 5), ' ') AS g
               FROM gi5),
        m5 AS (SELECT doc_id, i,
                      row_number() OVER (PARTITION BY g
                                         ORDER BY doc_id, i) AS rn,
                      count(*) OVER (PARTITION BY g) AS c
               FROM g5),
        gi3 AS (SELECT doc_id, tl,
                       unnest(range(0, greatest(len(tl) - 2, 0))) AS i
                FROM toks),
        g3 AS (SELECT doc_id, i,
                      array_to_string(list_slice(tl, i + 1, i + 3), ' ') AS g
               FROM gi3),
        m3 AS (SELECT doc_id, i,
                      row_number() OVER (PARTITION BY g
                                         ORDER BY doc_id, i) AS rn,
                      count(*) OVER (PARTITION BY g) AS c
               FROM g3),
        rm AS (SELECT doc_id, i, 5 AS w FROM m5 WHERE c >= 2 AND rn > 1
               UNION ALL
               SELECT doc_id, i, 3 AS w FROM m3 WHERE c >= 5 AND rn > 1),
        ti AS (SELECT doc_id, tl, unnest(range(0, len(tl))) AS ti
               FROM toks),
        tok AS (SELECT doc_id, ti, tl[ti + 1] AS tok FROM ti),
        kept AS (SELECT k.doc_id, k.ti, k.tok
                 FROM tok k
                 WHERE NOT EXISTS (SELECT 1 FROM rm r
                                   WHERE r.doc_id = k.doc_id
                                     AND r.i <= k.ti AND k.ti < r.i + r.w))
        SELECT d.doc_id,
               coalesce(string_agg(kp.tok, ' ' ORDER BY kp.ti), '') AS text,
               len(x.tl) - count(kp.tok) AS n_removed
        FROM documents d
        JOIN toks x ON x.doc_id = d.doc_id
        LEFT JOIN kept kp ON kp.doc_id = d.doc_id
        GROUP BY d.doc_id, len(x.tl)""",
    "dup_cluster_sizes": """
WITH RECURSIVE t AS (SELECT doc_id, lang, list_distinct(string_split(text, ' ')) AS ws FROM documents),
p AS (
  SELECT a.doc_id AS d1, b.doc_id AS d2
  FROM t a JOIN t b ON a.lang = b.lang AND a.doc_id < b.doc_id
  WHERE len(list_intersect(a.ws, b.ws))::DOUBLE
          / len(list_distinct(list_concat(a.ws, b.ws))) >= 0.95),
e AS (SELECT d1 AS a, d2 AS b FROM p UNION SELECT d2, d1 FROM p),
reach(n, m) AS (
  SELECT a, b FROM e
  UNION
  SELECT r.n, e2.b FROM reach r JOIN e e2 ON r.m = e2.a),
rep AS (SELECT n AS doc_id, least(n, min(m)) AS rep_id FROM reach GROUP BY n),
cm AS (SELECT d.doc_id, coalesce(r.rep_id, d.doc_id) AS rep_id
       FROM documents d LEFT JOIN rep r USING (doc_id)),
sz AS (SELECT rep_id, count(*) AS size FROM cm GROUP BY rep_id)
SELECT size, count(*) AS n_clusters FROM sz GROUP BY size""",
    "containment_dups": """
WITH t AS (SELECT doc_id, lang,
                  list_distinct(string_split(text, ' ')) AS ws
           FROM documents)
SELECT a.doc_id AS doc1, b.doc_id AS doc2,
       round(len(list_intersect(a.ws, b.ws))::DOUBLE
             / least(len(a.ws), len(b.ws)), 6) AS containment
FROM t a JOIN t b ON a.lang = b.lang AND a.doc_id < b.doc_id
WHERE least(len(a.ws), len(b.ws)) >= 25
  AND len(list_intersect(a.ws, b.ws))::DOUBLE
        / least(len(a.ws), len(b.ws)) >= 0.95""",
    "fuzzy_dedup_keep": """
WITH RECURSIVE t AS (SELECT doc_id, lang, list_distinct(string_split(text, ' ')) AS ws FROM documents),
p AS (
  SELECT a.doc_id AS d1, b.doc_id AS d2
  FROM t a JOIN t b ON a.lang = b.lang AND a.doc_id < b.doc_id
  WHERE len(list_intersect(a.ws, b.ws))::DOUBLE
          / len(list_distinct(list_concat(a.ws, b.ws))) >= 0.95),
e AS (SELECT d1 AS a, d2 AS b FROM p UNION SELECT d2, d1 FROM p),
reach(n, m) AS (
  SELECT a, b FROM e
  UNION
  SELECT r.n, e2.b FROM reach r JOIN e e2 ON r.m = e2.a),
rep AS (SELECT n AS doc_id, least(n, min(m)) AS rep_id FROM reach GROUP BY n)
SELECT d.doc_id,
       coalesce(r.rep_id, d.doc_id) AS rep_id,
       coalesce(r.rep_id, d.doc_id) = d.doc_id AS keep
FROM documents d LEFT JOIN rep r USING (doc_id)
""",
    "curation": r"""
WITH t AS (SELECT doc_id, lang, list_distinct(string_split(text, ' ')) AS ws,
                  length(regexp_extract_all(text, '\S+')) AS n_tokens
           FROM documents),
p AS (SELECT a.doc_id AS doc1, b.doc_id AS doc2,
             len(list_intersect(a.ws, b.ws))::DOUBLE
               / len(list_distinct(list_concat(a.ws, b.ws))) AS j
      FROM t a JOIN t b ON a.lang = b.lang AND a.doc_id < b.doc_id),
dropped AS (SELECT DISTINCT doc2 FROM p WHERE j >= 0.95)
SELECT doc_id, n_tokens FROM t
WHERE n_tokens BETWEEN 20 AND 200
  AND doc_id NOT IN (SELECT doc2 FROM dropped)""",
    "embedding_dups": """
        WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS emb FROM embeddings)
        SELECT a.vec_id AS vec1, b.vec_id AS vec2,
               round(list_cosine_similarity(a.emb, b.emb), 6) AS sim
        FROM e a JOIN e b ON a.label = b.label AND a.vec_id < b.vec_id
        WHERE list_cosine_similarity(a.emb, b.emb) >= 0.4""",
    "knn_bruteforce": """
        WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings),
        q AS (SELECT vec_id AS qid, emb AS qe FROM e WHERE vec_id IN (0, 1, 2)),
        s AS (SELECT qid, vec_id AS nid, list_cosine_similarity(qe, emb) AS sim
              FROM q, e WHERE vec_id != qid)
        SELECT qid, nid, round(sim, 6) AS sim FROM s
        QUALIFY row_number() OVER (PARTITION BY qid ORDER BY round(sim, 6) DESC, nid) <= 5""",
    "tumbling_window": """
        SELECT event_type, epoch(date_trunc('hour', ts))::BIGINT AS window_start,
               count(*) AS n, round(sum(value), 2) AS total
        FROM events GROUP BY event_type, window_start""",
    "session_windows": """
        WITH e AS (SELECT user_id, event_id, ts, floor(epoch(ts))::BIGINT AS ts_s
                   FROM events),
        g AS (SELECT *, CASE WHEN lag(ts_s) OVER w IS NULL
                             OR ts_s - lag(ts_s) OVER w > 1800
                        THEN 1 ELSE 0 END AS brk
              FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        s AS (SELECT *, (sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                        ROWS UNBOUNDED PRECEDING))::BIGINT AS sid
              FROM g)
        SELECT user_id, sid, count(*) AS n_events,
               min(ts_s) AS session_start, max(ts_s) AS session_end
        FROM s GROUP BY user_id, sid""",
    "upsert_latest": """
        SELECT event_id, ts, user_id, event_type, value, props FROM events
        QUALIFY row_number() OVER (PARTITION BY user_id ORDER BY event_id DESC) = 1""",
    # range join: events → containing session window (sessions as in
    # the session_windows oracle; containment on floored epoch seconds)
    "interval_join": """
        WITH e AS (SELECT user_id, event_id, ts, floor(epoch(ts))::BIGINT AS ts_s
                   FROM events),
        g AS (SELECT *, CASE WHEN lag(ts_s) OVER w IS NULL
                             OR ts_s - lag(ts_s) OVER w > 1800
                        THEN 1 ELSE 0 END AS brk
              FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        s AS (SELECT *, (sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                        ROWS UNBOUNDED PRECEDING))::BIGINT AS sid
              FROM g),
        sess AS (SELECT user_id, sid, min(ts_s) AS session_start,
                        max(ts_s) AS session_end
                 FROM s GROUP BY user_id, sid)
        SELECT e.event_id, e.user_id, e.ts_s, sess.sid
        FROM e JOIN sess ON e.user_id = sess.user_id
                        AND e.ts_s BETWEEN sess.session_start
                                       AND sess.session_end""",
    # as-of: latest view at-or-before each click per user; ties on the
    # timestamp break to max right event_id (the engine's tie-break)
    "asof_join": """
        WITH l AS (SELECT event_id, user_id, epoch_us(ts) AS ts_us
                   FROM events WHERE event_type = 'click'),
        r AS (SELECT event_id, user_id, epoch_us(ts) AS ts_us
              FROM events WHERE event_type = 'view'),
        pairs AS (SELECT l.event_id, l.user_id, l.ts_us,
                         r.event_id AS right_event_id,
                         l.ts_us - r.ts_us AS lag_us,
                         row_number() OVER (PARTITION BY l.event_id
                             ORDER BY r.ts_us DESC, r.event_id DESC) AS rn
                  FROM l JOIN r ON l.user_id = r.user_id
                              AND r.ts_us <= l.ts_us)
        SELECT event_id, user_id, ts_us, right_event_id, lag_us
        FROM pairs WHERE rn = 1""",
    "systematic_sample":
        "SELECT event_id, user_id, event_type FROM events WHERE event_id % 20 = 3",
    "stratified_sample": """
        SELECT event_type, event_id, user_id FROM events
        QUALIFY row_number() OVER (PARTITION BY event_type
                                   ORDER BY event_id) <= 5""",
    "watermark_filter": """
        SELECT event_id, user_id FROM events
        WHERE epoch_us(ts) >= (SELECT max(epoch_us(ts)) FROM events)
                              - 86400000000::BIGINT""",
    # ordered funnel: each step's clock = earliest qualifying time of
    # the previous step; later steps require STRICTLY greater ts
    "funnel_counts": """
        WITH v AS (SELECT user_id, min(ts) AS t FROM events
                   WHERE event_type = 'view' GROUP BY user_id),
        c AS (SELECT e.user_id, min(e.ts) AS t FROM events e
              JOIN v ON e.user_id = v.user_id AND e.ts > v.t
              WHERE e.event_type = 'click' GROUP BY e.user_id),
        p AS (SELECT e.user_id, min(e.ts) AS t FROM events e
              JOIN c ON e.user_id = c.user_id AND e.ts > c.t
              WHERE e.event_type = 'purchase' GROUP BY e.user_id)
        SELECT (SELECT count(*) FROM v)::BIGINT AS step_1,
               (SELECT count(*) FROM c)::BIGINT AS step_2,
               (SELECT count(*) FROM p)::BIGINT AS step_3""",
    # A-ES weighted sampling: identical md5-uniform + pow key expression
    "weighted_sample": """
        SELECT doc_id, n_chars, round(key, 6) AS key FROM (
          SELECT doc_id, n_chars,
                 pow((('0x' || substr(md5(doc_id::VARCHAR), 1, 8))::UBIGINT)
                       / 4294967296.0,
                     1.0 / greatest(n_chars, 1e-12)) AS key
          FROM documents)
        ORDER BY key DESC, doc_id LIMIT 100""",
    "windowed_distinct": """
        SELECT (epoch_us(ts) // 86400000000) * 86400 AS window_start,
               count(DISTINCT user_id) AS n_users
        FROM events GROUP BY 1""",
    "props_stats": r"""
        SELECT (regexp_extract(props, '"k":\s*(\d+)', 1)::BIGINT // 10)
                   AS k_decile,
               count(*) AS n, round(avg(value), 6) AS avg_value
        FROM events GROUP BY 1""",
    "decayed_user_stats": """
        WITH h AS (SELECT max(epoch_us(ts)) / 1e6 AS t FROM events)
        SELECT user_id,
               round(sum(pow(0.5, (h.t - epoch_us(ts) / 1e6)
                                  / 604800.0)), 6) AS decayed_n,
               round(sum(value * pow(0.5, (h.t - epoch_us(ts) / 1e6)
                                          / 604800.0)), 6)
                   AS decayed_value
        FROM events, h GROUP BY user_id""",
    "windowed_topk": """
        WITH c AS (SELECT (epoch_us(ts) // 86400000000) * 86400
                            AS window_start,
                          user_id, count(*) AS n
                   FROM events GROUP BY 1, 2),
        r AS (SELECT *, row_number() OVER (PARTITION BY window_start
                  ORDER BY n DESC, user_id) AS rk FROM c)
        SELECT window_start::BIGINT AS window_start, user_id,
               n::BIGINT AS n
        FROM r WHERE rk <= 3""",
    "event_gaps": """
        WITH e AS (SELECT user_id, event_id,
                          floor(epoch(ts))::BIGINT AS ts_s,
                          lag(floor(epoch(ts))::BIGINT) OVER
                            (PARTITION BY user_id ORDER BY ts, event_id)
                              AS prev
                   FROM events)
        SELECT event_id, user_id, (ts_s - prev)::BIGINT AS gap_s
        FROM e WHERE prev IS NOT NULL""",
    "zscore_outliers": """
        WITH s AS (SELECT user_id, avg(value) AS mu,
                          stddev_samp(value) AS sd, count(*) AS n
                   FROM events GROUP BY user_id)
        SELECT e.event_id, e.user_id,
               round((e.value - s.mu) / s.sd, 6) AS z
        FROM events e JOIN s ON e.user_id = s.user_id
        WHERE s.n >= 2 AND s.sd > 0
          AND abs((e.value - s.mu) / s.sd) > 2.5""",
    # every event lands in all k = size/slide windows covering it
    # (generate_series fan-out mirrors the map_batches explode)
    "sliding_window": """
        WITH e AS (SELECT event_type, epoch_us(ts)::BIGINT AS us, value
                   FROM events),
        x AS (SELECT event_type, value,
                     (us // 900000000) * 900 - 900 * j AS window_start
              FROM e, generate_series(0, 3) t(j)
              WHERE (us // 900000000) * 900 - 900 * j >= 0)
        SELECT event_type, window_start, count(*) AS n,
               round(sum(value), 2) AS total
        FROM x GROUP BY event_type, window_start""",
    # exact SimHash re-implementation: 64-bit md5-based token hash
    # (little-endian first 8 digest bytes, matching textfns._md5_hash64),
    # per-bit ±1 vote, exact all-pairs hamming via bit_count(xor(...)) —
    # the banded Ray pipeline guarantees full recall at hamming ≤ 3 by
    # pigeonhole, so the all-pairs SQL is the exact expected output
    "simhash_dups": r"""
        WITH toks AS (
          SELECT doc_id, unnest(regexp_extract_all(text, '\S+')) AS tok
          FROM documents),
        h AS (SELECT doc_id,
                     ('0x' || substr(md5(tok),15,2) || substr(md5(tok),13,2)
                      || substr(md5(tok),11,2) || substr(md5(tok),9,2)
                      || substr(md5(tok),7,2) || substr(md5(tok),5,2)
                      || substr(md5(tok),3,2) || substr(md5(tok),1,2))::UBIGINT
                       AS h64
              FROM toks),
        bits AS (SELECT doc_id, j,
                        sum(CASE WHEN ((h64 >> j) & 1) = 1
                                 THEN 1 ELSE -1 END) AS acc
                 FROM h, generate_series(0, 63) t(j) GROUP BY doc_id, j),
        sigs AS (SELECT doc_id,
                        sum(CASE WHEN acc > 0 THEN (1::HUGEINT << j)
                                 ELSE 0::HUGEINT END)::UBIGINT AS sig
                 FROM bits GROUP BY doc_id),
        sig2 AS (SELECT d.doc_id, coalesce(s.sig, 0::UBIGINT) AS sig
                 FROM documents d LEFT JOIN sigs s ON d.doc_id = s.doc_id)
        SELECT a.doc_id AS doc1, b.doc_id AS doc2,
               bit_count(xor(a.sig, b.sig))::BIGINT AS hamming
        FROM sig2 a JOIN sig2 b ON a.doc_id < b.doc_id
        WHERE bit_count(xor(a.sig, b.sig)) <= 3""",
    # lang_id: exact SQL re-implementation of the stopword-profile
    # heuristic — distinct lowercase whitespace tokens intersected with
    # each profile; first-wins priority en > es > fr > de on ties, 'und'
    # when nothing matches (textfns.lang_id)
    "lang_id": r"""
        WITH tok AS (SELECT doc_id,
                            unnest(regexp_split_to_array(
                                lower(coalesce(text, '')), '\s+')) AS t
                     FROM documents),
        d AS (SELECT DISTINCT doc_id, t FROM tok),
        c AS (SELECT doc_id,
                count(*) FILTER (WHERE t IN
                    ('the','and','of','is','was','with')) AS en,
                count(*) FILTER (WHERE t IN
                    ('el','la','de','es','con','por')) AS es,
                count(*) FILTER (WHERE t IN
                    ('le','la','de','est','avec','pour')) AS fr,
                count(*) FILTER (WHERE t IN
                    ('der','die','das','und','ist','mit')) AS de
              FROM d GROUP BY doc_id)
        SELECT doc_id, CASE
            WHEN de > greatest(en, es, fr) THEN 'de'
            WHEN fr > greatest(en, es) THEN 'fr'
            WHEN es > en THEN 'es'
            WHEN en > 0 THEN 'en'
            ELSE 'und' END AS pred_lang
        FROM c""",
    # knn_lsh / knn_ivf (approximate recall-tested),
    # kg_media_features (stub-shaped feature floats): rows-only
}


def _kcore_sql(mapped: str, k: int = 2, rounds: int = 8) -> str:
    """Unrolled iterative-peeling SQL: each chained CTE round recomputes
    degrees and keeps only edges whose BOTH endpoints have deg >= k —
    identical rule to stages/graph.py::kcore. ``rounds`` must cover the
    peeling depth at oracle scale (extra rounds are no-ops once the
    edge set stabilizes, so over-provisioning is safe)."""
    sql = "WITH " + mapped.strip() + """,
e0 AS MATERIALIZED (SELECT DISTINCT least(subj, obj_value) AS a,
              greatest(subj, obj_value) AS b
       FROM mapped WHERE obj_kind = 'iri' AND subj != obj_value)"""
    cur = "e0"
    # MATERIALIZED: each round references its predecessor three times;
    # inlined CTEs would grow the plan 3^rounds
    for i in range(1, rounds + 1):
        sql += f""",
d{i} AS MATERIALIZED (SELECT node, count(*) AS deg FROM (
           SELECT a AS node FROM {cur} UNION ALL SELECT b FROM {cur})
         GROUP BY node),
e{i} AS MATERIALIZED (SELECT e.a, e.b FROM {cur} e
         JOIN d{i} da ON da.node = e.a JOIN d{i} db ON db.node = e.b
         WHERE da.deg >= {k} AND db.deg >= {k})"""
        cur = f"e{i}"
    sql += f""",
df AS (SELECT node, count(*) AS deg FROM (
         SELECT a AS node FROM {cur} UNION ALL SELECT b FROM {cur})
       GROUP BY node)
SELECT node, deg::BIGINT AS deg FROM df"""
    return sql


def _lpa_sql(mapped: str, rounds: int = 3) -> str:
    """Unrolled semi-synchronous label propagation: per round each node
    adopts the most frequent neighbor label, ties → smallest label —
    identical rule to stages/graph.py::label_propagation."""
    sql = "WITH " + mapped.strip() + """,
e0 AS MATERIALIZED (SELECT DISTINCT least(subj, obj_value) AS a,
              greatest(subj, obj_value) AS b
       FROM mapped WHERE obj_kind = 'iri' AND subj != obj_value),
adj AS MATERIALIZED (SELECT a AS node, b AS nbr FROM e0
                     UNION ALL SELECT b, a FROM e0),
l0 AS MATERIALIZED (SELECT DISTINCT node, node AS label FROM adj)"""
    cur = "l0"
    for i in range(1, rounds + 1):
        sql += f""",
m{i} AS MATERIALIZED (SELECT ad.node, l.label, count(*) AS c
        FROM adj ad JOIN {cur} l ON l.node = ad.nbr
        GROUP BY ad.node, l.label),
l{i} AS MATERIALIZED (SELECT node, label FROM (
          SELECT *, row_number() OVER (PARTITION BY node
                        ORDER BY c DESC, label) AS rn FROM m{i})
        WHERE rn = 1)"""
        cur = f"l{i}"
    sql += f"""
SELECT node, label FROM {cur}"""
    return sql


def _pagerank_sql(mapped: str, iters: int = 5, d: float = 0.85,
                  redistribute: bool = False, seeds=None) -> str:
    """Unrolled power-iteration SQL: r0 = 1/N, then ``iters`` chained
    CTE rounds of contribution-sum + damping (same dangling-mass rule
    as stages/graph.py::pagerank — sinks leak by default; with
    ``redistribute`` each round adds d·D_t/N, D_t = sink-node mass)."""
    sql = "WITH " + mapped.strip() + f""",
edges AS (SELECT DISTINCT subj AS src, obj_value AS dst FROM mapped
          WHERE obj_kind = 'iri'),
nodes AS (SELECT DISTINCT node FROM
          (SELECT src AS node FROM edges UNION SELECT dst FROM edges)),
nn AS (SELECT count(*)::DOUBLE AS n FROM nodes),
deg AS (SELECT src, count(*)::DOUBLE AS c FROM edges GROUP BY src),
r0 AS (SELECT node, {{r0_expr}} AS rank FROM nodes)"""
    if seeds is None:
        sql = sql.replace("{r0_expr}", "1.0 / (SELECT n FROM nn)")
        base_expr = f"(1 - {d}) / (SELECT n FROM nn)"
    else:
        seed_list = ", ".join(f"'{s}'" for s in seeds)
        w = 1.0 / len(seeds)
        seed_case = (f"CASE WHEN node IN ({seed_list}) THEN {w} "
                     f"ELSE 0.0 END")
        sql = sql.replace("{r0_expr}", seed_case)
        base_expr = f"(1 - {d}) * (CASE WHEN n.node IN ({seed_list}) " \
                    f"THEN {w} ELSE 0.0 END)"
    for i in range(1, iters + 1):
        extra = ""
        if redistribute:
            sql += f""",
dm{i} AS (SELECT coalesce(sum(rank), 0) AS m FROM r{i - 1}
          WHERE node NOT IN (SELECT src FROM deg))"""
            if seeds is None:
                extra = (f" + {d} * (SELECT m FROM dm{i})"
                         f" / (SELECT n FROM nn)")
            else:
                seed_list = ", ".join(f"'{s}'" for s in seeds)
                w = 1.0 / len(seeds)
                extra = (f" + {d} * (SELECT m FROM dm{i})"
                         f" * (CASE WHEN n.node IN ({seed_list}) "
                         f"THEN {w} ELSE 0.0 END)")
        sql += f""",
s{i} AS (SELECT e.dst AS node, sum(r.rank / dg.c) AS m
         FROM r{i - 1} r JOIN edges e ON r.node = e.src
         JOIN deg dg ON dg.src = e.src
         GROUP BY e.dst),
r{i} AS (SELECT n.node,
                {base_expr}
                + {d} * coalesce(s.m, 0){extra} AS rank
         FROM nodes n LEFT JOIN s{i} s ON n.node = s.node)"""
    sql += f"\nSELECT node, round(rank, 6) AS rank FROM r{iters}"
    return sql


def _kg_oracle_sql(sf: float = 0.01) -> dict[str, str]:
    """Oracles for the flagship pipeline: DuckDB over the deterministic
    corpus ground truth under /tmp (written by synth.ensure_corpus with
    the same seed the queries use). The validation CTE re-implements the
    four SHACL-core components in SQL — minCount as an anti-join."""
    from ..functions import ns
    from .. import synth

    corpus = synth.ensure_corpus(sf)
    gt = f"read_parquet('{corpus}/gt_triples/part-*.parquet')"
    sh, dct, dcat, xsd = ns.SH, ns.DCT, ns.DCAT, ns.XSD
    shp = "http://example.org/shapes/"

    base = f"""
WITH gt AS (SELECT DISTINCT subj, pred, obj_kind, obj_value, obj_datatype, obj_lang
            FROM {gt}),
datasets AS (SELECT DISTINCT subj FROM gt
             WHERE pred = '{ns.RDF_TYPE}' AND obj_value = '{dcat}Dataset'),
typed_dist AS (SELECT DISTINCT subj FROM gt
               WHERE pred = '{ns.RDF_TYPE}' AND obj_value = '{dcat}Distribution'),
viol AS (
  SELECT 'Violation' AS severity, d.subj AS focus_node, '{dct}title' AS path,
         '' AS value, '{sh}MinCountConstraintComponent' AS source_constraint_component,
         '{shp}DatasetTitleShape' AS source_shape
  FROM datasets d
  WHERE d.subj NOT IN (SELECT subj FROM gt WHERE pred = '{dct}title')
  UNION ALL
  SELECT 'Violation', g.subj, '{dct}title', '', '{sh}MaxCountConstraintComponent',
         '{shp}DatasetTitleShape'
  FROM (SELECT subj FROM gt
        WHERE pred = '{dct}title' AND subj IN (SELECT subj FROM datasets)
        GROUP BY subj HAVING count(*) > 2) g
  UNION ALL
  SELECT 'Violation', g.subj, '{dct}issued', g.obj_value,
         '{sh}DatatypeConstraintComponent', '{shp}DatasetIssuedShape'
  FROM gt g WHERE g.pred = '{dct}issued' AND g.subj IN (SELECT subj FROM datasets)
    AND (g.obj_datatype != '{xsd}dateTime' OR g.obj_kind != 'literal')
  UNION ALL
  SELECT 'Warning', g.subj, '{dct}description', g.obj_value,
         '{sh}PatternConstraintComponent', '{shp}DatasetDescShape'
  FROM gt g WHERE g.pred = '{dct}description' AND g.subj IN (SELECT subj FROM datasets)
    AND NOT regexp_matches(g.obj_value, '\\S')
  UNION ALL
  SELECT 'Violation', g.subj, '{dcat}distribution', g.obj_value,
         '{sh}ClassConstraintComponent', '{shp}DatasetDistShape'
  FROM gt g WHERE g.pred = '{dcat}distribution' AND g.subj IN (SELECT subj FROM datasets)
    AND (g.obj_kind != 'iri' OR g.obj_value NOT IN (SELECT subj FROM typed_dist))
  UNION ALL
  SELECT 'Violation', g.subj, '{dcat}distribution', g.obj_value,
         '{sh}NodeKindConstraintComponent', '{shp}DatasetDistShape'
  FROM gt g WHERE g.pred = '{dcat}distribution' AND g.subj IN (SELECT subj FROM datasets)
    AND g.obj_kind != 'iri'
)
"""
    msg_case = f"""CASE source_shape
      WHEN '{shp}DatasetTitleShape' THEN 'en::Dataset must have a dct:title.'
      WHEN '{shp}DatasetIssuedShape' THEN 'en::dct:issued must be an xsd:dateTime literal.'
      WHEN '{shp}DatasetDescShape' THEN 'en::dct:description must not be blank.'
      WHEN '{shp}DatasetDistShape' THEN 'en::dcat:distribution must point to a typed dcat:Distribution.'
      END"""

    # paths_demo profile (q_kg_validate_paths): canonical path strings as
    # the engine renders them (seq "a/b", alternative "(a | b)")
    seq_fmt = f"{dcat}distribution/{dct}format"
    alt_label = f"({dct}title | {dct}description)"
    cat_path = f"{dcat}dataset/{dct}title"
    paths_viol = f"""
WITH gt AS (SELECT DISTINCT subj, pred, obj_kind, obj_value, obj_datatype, obj_lang
            FROM {gt}),
datasets AS (SELECT DISTINCT subj FROM gt
             WHERE pred = '{ns.RDF_TYPE}' AND obj_value = '{dcat}Dataset'),
distfmt AS (SELECT DISTINCT d.subj AS ds, f.obj_value AS fmt
            FROM gt d JOIN gt f ON d.obj_value = f.subj
            WHERE d.pred = '{dcat}distribution' AND f.pred = '{dct}format'),
viol AS (
  SELECT 'Warning' AS severity, ds AS focus_node, '{seq_fmt}' AS path,
         fmt AS value, '{sh}InConstraintComponent' AS source_constraint_component
  FROM distfmt
  WHERE ds IN (SELECT subj FROM datasets)
    AND fmt NOT IN ('text/csv', 'application/json', 'text/turtle')
  UNION ALL
  SELECT 'Violation', d.subj, '{alt_label}', '', '{sh}MinCountConstraintComponent'
  FROM datasets d
  WHERE d.subj NOT IN (SELECT subj FROM gt
                       WHERE pred IN ('{dct}title', '{dct}description'))
  UNION ALL
  SELECT 'Info', g.subj, '{dct}format', g.obj_value,
         '{sh}MinLengthConstraintComponent'
  FROM gt g WHERE g.pred = '{dct}format' AND length(g.obj_value) < 9
  UNION ALL
  SELECT 'Info', g.subj, '{dct}format', g.obj_value,
         '{sh}MaxLengthConstraintComponent'
  FROM gt g WHERE g.pred = '{dct}format' AND length(g.obj_value) > 32
  UNION ALL
  SELECT 'Violation', o.obj_value, '{ns.RDF_TYPE}', '',
         '{sh}HasValueConstraintComponent'
  FROM (SELECT DISTINCT obj_value FROM gt WHERE pred = '{dcat}distribution') o
  WHERE o.obj_value NOT IN
      (SELECT subj FROM gt
       WHERE pred = '{ns.RDF_TYPE}' AND obj_value = '{dcat}Distribution')
  UNION ALL
  SELECT 'Violation', '{ns.EX}catalog/main', '{cat_path}', '',
         '{sh}MinCountConstraintComponent'
  WHERE NOT EXISTS
      (SELECT 1 FROM gt c JOIN gt t ON c.obj_value = t.subj
       WHERE c.subj = '{ns.EX}catalog/main' AND c.pred = '{dcat}dataset'
         AND t.pred = '{dct}title')
  UNION ALL
  SELECT 'Info', obj_value, '^{dcat}theme', '',
         '{sh}MaxCountConstraintComponent'
  FROM gt WHERE pred = '{dcat}theme'
  GROUP BY obj_value HAVING count(DISTINCT subj) > 100
)
"""

    # extraction oracle: the ground truth stores canonical IRIs plus the
    # exact publisher surface form written into the text; non-canonical
    # surfaces map to the extractor's provisional mention IRIs
    # (urllib.parse.quote(safe="") on these surfaces only encodes spaces)
    mapped = f"""
mapped AS (
  SELECT subj, pred, obj_kind,
         CASE WHEN pred = '{dct}publisher' AND surface != ''
                   AND NOT regexp_matches(surface, '^Organization [0-9]+$')
              THEN '{ns.EX}mention/' || replace(surface, ' ', '%20')
              ELSE obj_value END AS obj_value,
         obj_datatype, obj_lang, doc_id
  FROM {gt})
"""

    logic_viol = f"""
WITH gt AS (SELECT DISTINCT subj, pred, obj_kind, obj_value, obj_datatype, obj_lang
            FROM {gt}),
datasets AS (SELECT DISTINCT subj FROM gt
             WHERE pred = '{ns.RDF_TYPE}' AND obj_value = '{dcat}Dataset'),
viol AS (
  SELECT 'Violation' AS severity, g.subj AS focus_node, '{dct}format' AS path,
         g.obj_value AS value, '{sh}OrConstraintComponent' AS source_constraint_component
  FROM gt g
  WHERE g.pred = '{dct}format'
    AND g.obj_value NOT IN ('text/csv', 'application/json')
    AND NOT regexp_matches(g.obj_value, '^text/')
  UNION ALL
  SELECT 'Violation', g.subj, '{dct}description', g.obj_value,
         '{sh}NotConstraintComponent'
  FROM gt g
  WHERE g.pred = '{dct}description' AND g.subj IN (SELECT subj FROM datasets)
    AND regexp_matches(g.obj_value, '^\\s*$')
)
"""

    node_viol = f"""
WITH gt AS (SELECT DISTINCT subj, pred, obj_kind, obj_value, obj_datatype, obj_lang
            FROM {gt}),
datasets AS (SELECT DISTINCT subj FROM gt
             WHERE pred = '{ns.RDF_TYPE}' AND obj_value = '{dcat}Dataset'),
dist_of AS (SELECT DISTINCT g.subj AS ds, g.obj_value AS dist FROM gt g
            WHERE g.pred = '{dcat}distribution'
              AND g.subj IN (SELECT subj FROM datasets)),
badfmt AS (SELECT DISTINCT f.subj AS dist, f.obj_value AS fmt FROM gt f
           WHERE f.pred = '{dct}format'
             AND f.subj IN (SELECT dist FROM dist_of)
             AND f.obj_value NOT IN ('text/csv', 'application/json',
                                     'text/turtle')),
viol AS (
  SELECT 'Warning' AS severity, dist AS focus_node, '{dct}format' AS path,
         fmt AS value, '{sh}InConstraintComponent' AS source_constraint_component
  FROM badfmt
  UNION ALL
  SELECT 'Warning', d.ds, '{dcat}distribution', d.dist,
         '{sh}NodeConstraintComponent'
  FROM dist_of d WHERE d.dist IN (SELECT dist FROM badfmt)
)
"""

    qualified_sql = f"""
WITH gt AS (SELECT DISTINCT subj, pred, obj_kind, obj_value, obj_datatype, obj_lang
            FROM {gt}),
datasets AS (SELECT DISTINCT subj FROM gt
             WHERE pred = '{ns.RDF_TYPE}' AND obj_value = '{dcat}Dataset')
SELECT 'Info' AS severity, d.subj AS focus_node, '{dcat}theme' AS path,
       '' AS value,
       '{sh}QualifiedMinCountConstraintComponent' AS source_constraint_component
FROM datasets d
WHERE d.subj NOT IN
    (SELECT subj FROM gt
     WHERE pred = '{dcat}theme'
       AND regexp_matches(obj_value, 'theme/T[0-3]$'))
"""

    # pairs_demo profile: SPARQL-ish ordering (numeric when BOTH values
    # cast, else binary string compare — same rule as shacl._pair_lt)
    ex = ns.EX

    def lt(v: str, w: str) -> str:
        return (f"(CASE WHEN try_cast({v} AS DOUBLE) IS NOT NULL "
                f"AND try_cast({w} AS DOUBLE) IS NOT NULL "
                f"THEN try_cast({v} AS DOUBLE) < try_cast({w} AS DOUBLE) "
                f"ELSE {v} < {w} END)")

    pairs_viol = f"""
WITH gt AS (SELECT DISTINCT subj, pred, obj_value FROM {gt}),
datasets AS (SELECT DISTINCT subj FROM gt
             WHERE pred = '{ns.RDF_TYPE}' AND obj_value = '{dcat}Dataset'),
iss AS (SELECT DISTINCT subj, obj_value FROM gt WHERE pred = '{dct}issued'
        AND subj IN (SELECT subj FROM datasets)),
mo AS (SELECT DISTINCT subj, obj_value FROM gt WHERE pred = '{dct}modified'
       AND subj IN (SELECT subj FROM datasets)),
bs AS (SELECT DISTINCT subj, obj_value FROM gt
       WHERE pred = '{dcat}byteSize'),
qt AS (SELECT DISTINCT subj, obj_value FROM gt WHERE pred = '{ex}quotaBytes'
       AND subj IN (SELECT subj FROM bs)),
rc AS (SELECT DISTINCT subj, obj_value FROM gt WHERE pred = '{ex}sizeRecheck'
       AND subj IN (SELECT subj FROM bs)),
viol AS (
  SELECT 'Violation' AS severity, a.subj AS focus_node,
         '{dct}issued' AS path, a.obj_value AS value,
         '{sh}LessThanOrEqualsConstraintComponent'
             AS source_constraint_component
  FROM iss a WHERE EXISTS (SELECT 1 FROM mo b WHERE b.subj = a.subj
      AND {lt('b.obj_value', 'a.obj_value')})
  UNION ALL
  SELECT 'Info', a.subj, '{dct}issued', a.obj_value,
         '{sh}LessThanConstraintComponent'
  FROM iss a WHERE EXISTS (SELECT 1 FROM mo b WHERE b.subj = a.subj
      AND NOT {lt('a.obj_value', 'b.obj_value')})
  UNION ALL
  SELECT 'Violation', a.subj, '{dcat}byteSize', a.obj_value,
         '{sh}LessThanOrEqualsConstraintComponent'
  FROM bs a WHERE EXISTS (SELECT 1 FROM qt b WHERE b.subj = a.subj
      AND {lt('b.obj_value', 'a.obj_value')})
  UNION ALL
  SELECT 'Warning', a.subj, '{dcat}byteSize', a.obj_value,
         '{sh}EqualsConstraintComponent'
  FROM bs a WHERE NOT EXISTS (SELECT 1 FROM rc b
      WHERE b.subj = a.subj AND b.obj_value = a.obj_value)
  UNION ALL
  SELECT 'Warning', b.subj, '{dcat}byteSize', b.obj_value,
         '{sh}EqualsConstraintComponent'
  FROM rc b WHERE NOT EXISTS (SELECT 1 FROM bs a
      WHERE a.subj = b.subj AND a.obj_value = b.obj_value)
  UNION ALL
  SELECT 'Info', a.subj, '{ex}quotaBytes', a.obj_value,
         '{sh}DisjointConstraintComponent'
  FROM qt a JOIN rc b ON a.subj = b.subj AND a.obj_value = b.obj_value
)
SELECT severity, focus_node, path, value, source_constraint_component
FROM viol"""

    out = {
        "kg_validate_pairs": pairs_viol,
        "kg_validate_qualified": qualified_sql,
        "kg_validate_node": node_viol +
            "SELECT severity, focus_node, path, value, "
            "source_constraint_component FROM viol",
        "kg_validate_logic": logic_viol +
            "SELECT severity, focus_node, path, value, "
            "source_constraint_component FROM viol",
        "kg_extract": "WITH " + mapped +
            "SELECT subj, pred, obj_kind, obj_value, obj_datatype, obj_lang, "
            "doc_id FROM mapped",
        # byte-identical JSON-LD reconstruction: compact separators +
        # sorted keys ("@id" sorts before http… predicates)
        "jsonld_projection": "WITH " + mapped + """,
g AS (SELECT subj, pred, list_sort(list(obj_value)) AS vals
      FROM mapped GROUP BY subj, pred),
j AS (SELECT subj, pred,
             CASE WHEN len(vals) = 1 THEN to_json(vals[1])::VARCHAR
                  ELSE to_json(vals)::VARCHAR END AS jv
      FROM g),
agg AS (SELECT subj,
               string_agg(to_json(pred)::VARCHAR || ':' || jv, ','
                          ORDER BY pred) AS body
        FROM j GROUP BY subj)
SELECT subj, '{"@id":' || to_json(subj)::VARCHAR || ',' || body || '}' AS jsonld
FROM agg""",
        "kg_validate_paths": paths_viol +
            "SELECT severity, focus_node, path, value, "
            "source_constraint_component FROM viol",
        "kg_paths_constraint_counts": paths_viol + """
SELECT regexp_extract(source_constraint_component, '[^#/]+$') AS name,
       count(*) AS value
FROM viol GROUP BY 1 ORDER BY value DESC, name LIMIT 8""",
        "kg_canonical":
            f"SELECT DISTINCT subj, pred, obj_kind, obj_value, obj_datatype, obj_lang "
            f"FROM {gt}",
        # incremental link-merge + rewrite must reproduce the full-run
        # canonical graph exactly
        "kg_incremental_graph":
            f"SELECT DISTINCT subj, pred, obj_kind, obj_value, obj_datatype, obj_lang "
            f"FROM {gt}",
        "kg_conformant": base + """
SELECT DISTINCT subj, pred, obj_kind, obj_value, obj_datatype, obj_lang FROM gt
WHERE subj NOT IN (SELECT focus_node FROM viol WHERE severity = 'Violation')""",
        "kg_validate": base +
            "SELECT severity, focus_node, path, value, source_constraint_component "
            "FROM viol",
        # incremental splice must reproduce the full run exactly
        "kg_incremental": base +
            "SELECT severity, focus_node, path, value, source_constraint_component "
            "FROM viol",
        "kg_severity_counts": base +
            "SELECT severity, count(*) AS n FROM viol GROUP BY severity",
        "kg_constraint_counts": base + """
SELECT regexp_extract(source_constraint_component, '[^#/]+$') AS name,
       count(*) AS value
FROM viol GROUP BY 1 ORDER BY value DESC, name LIMIT 8""",
        "kg_top_shapes": base + """
SELECT source_shape,
       count(*) FILTER (WHERE severity = 'Violation') AS violation,
       count(*) FILTER (WHERE severity = 'Warning') AS warning,
       count(*) FILTER (WHERE severity = 'Info') AS info,
       count(*) AS total
FROM viol GROUP BY source_shape ORDER BY total DESC, source_shape LIMIT 6""",
        "kg_property_breakdown": base + """
SELECT path,
       count(*) FILTER (WHERE severity = 'Violation') AS violation,
       count(*) FILTER (WHERE severity = 'Warning') AS warning,
       count(*) FILTER (WHERE severity = 'Info') AS info,
       count(*) AS total
FROM viol WHERE path != '' GROUP BY path ORDER BY total DESC, path LIMIT 8""",
        "kg_focus_types": base + """
SELECT CASE regexp_extract(lower(focus_node),
         '/(dataset|distribution|catalog|dataservice|agent|organization|contactpoint|periodoftime)', 1)
         WHEN 'dataset' THEN 'Dataset' WHEN 'distribution' THEN 'Distribution'
         WHEN 'catalog' THEN 'Catalog' WHEN 'dataservice' THEN 'Dataservice'
         WHEN 'agent' THEN 'Agent' WHEN 'organization' THEN 'Organization'
         WHEN 'contactpoint' THEN 'Contactpoint'
         WHEN 'periodoftime' THEN 'Periodoftime' ELSE 'Other' END AS node_class,
       count(*) FILTER (WHERE severity = 'Violation') AS violation,
       count(*) FILTER (WHERE severity = 'Warning') AS warning,
       count(*) FILTER (WHERE severity = 'Info') AS info,
       count(*) AS total
FROM viol GROUP BY 1""",
        "kg_grouped_findings": base + f"""
SELECT severity, source_shape, source_constraint_component,
       {msg_case} AS msg_fp, count(*) AS total
FROM viol GROUP BY 1, 2, 3, 4""",
        "kg_discovery": base + f""",
comp AS (
  SELECT DISTINCT g.subj AS ds, g.obj_value AS dist FROM gt g
  WHERE g.pred = '{dcat}distribution'
    AND g.obj_value IN (SELECT subj FROM gt WHERE pred = '{dct}format'
                        AND obj_value IN ('text/csv', 'application/json'))),
titles AS (SELECT subj, min(obj_value) AS title FROM gt
           WHERE pred = '{dct}title' GROUP BY subj)
SELECT c.ds AS id, coalesce(t.title, 'Unnamed Dataset') AS title,
       count(*) AS n_dists
FROM comp c LEFT JOIN titles t ON c.ds = t.subj GROUP BY c.ds, t.title""",
        # kg_links: full-fidelity re-implementation of the linker in SQL —
        # exact alias-dict hits score 1.0; fuzzy mentions link to the
        # BEST char-3-shingle Jaccard candidate over the whole alias
        # table (tie-break: min IRI), threshold tau=0.5. The Ray side
        # uses MinHash-LSH candidate pruning, so this oracle also proves
        # the LSH loses no candidate at this scale. Mention IRIs are
        # percent-encoded surfaces (space → %20 is the only escapable
        # char the generator emits).
        "kg_links": f"""
WITH gtp AS (SELECT surface, min(doc_id) AS doc_id FROM {gt}
             WHERE pred = '{dct}publisher' AND surface <> ''
               AND NOT regexp_matches(surface, '^Organization [0-9]+$')
             GROUP BY surface),
alias AS (SELECT 'Organization ' || k AS surface,
                 'http://example.org/org/' || k AS iri FROM range(50) t(k)
          UNION ALL
          SELECT 'Org-' || k, 'http://example.org/org/' || k
          FROM range(50) t(k)),
exact_hit AS (SELECT g.surface, a.iri, 1.0 AS score, g.doc_id
              FROM gtp g JOIN alias a USING (surface)),
fuzzy_m AS (SELECT surface, doc_id FROM gtp
            WHERE surface NOT IN (SELECT surface FROM alias)),
msh AS (SELECT surface,
               substring('^' || lower(surface) || '$', i, 3) AS sh
        FROM fuzzy_m CROSS JOIN range(1, 64) t(i)
        WHERE i <= len(surface) GROUP BY 1, 2),
ash AS (SELECT surface, iri,
               substring('^' || lower(surface) || '$', i, 3) AS sh
        FROM alias CROSS JOIN range(1, 64) t(i)
        WHERE i <= len(surface) GROUP BY 1, 2, 3),
msz AS (SELECT surface, count(*) AS n FROM msh GROUP BY surface),
asz AS (SELECT surface, count(*) AS n FROM ash GROUP BY surface),
inter AS (SELECT m.surface AS ms, a.surface AS asf, a.iri, count(*) AS c
          FROM msh m JOIN ash a ON m.sh = a.sh GROUP BY 1, 2, 3),
scored AS (SELECT i.ms AS surface, i.iri,
                  i.c::DOUBLE / (mz.n + az.n - i.c) AS j
           FROM inter i JOIN msz mz ON mz.surface = i.ms
                        JOIN asz az ON az.surface = i.asf),
best AS (SELECT surface, iri, j, row_number() OVER (
             PARTITION BY surface ORDER BY j DESC, iri ASC) AS rn
         FROM scored),
fuzzy_hit AS (SELECT b.surface, b.iri, round(b.j, 6) AS score, m.doc_id
              FROM best b JOIN fuzzy_m m USING (surface)
              WHERE b.rn = 1 AND b.j >= 0.5),
links AS (SELECT * FROM exact_hit UNION ALL SELECT * FROM fuzzy_hit)
SELECT surface AS mention,
       'http://example.org/mention/' || replace(surface, ' ', '%20')
           AS mention_iri,
       iri AS candidate_iri, score, doc_id
FROM links""",
        # kg_bgp_constraint: the two-pattern BGP join in SQL — datasets
        # whose distribution carries format 'application/pdf'
        "kg_bgp_constraint": f"""
WITH g AS (SELECT DISTINCT subj, pred, obj_value FROM {gt}),
hits AS (SELECT DISTINCT a.subj FROM g a JOIN g b ON a.obj_value = b.subj
         WHERE a.pred = '{dcat}distribution' AND b.pred = '{dct}format'
           AND b.obj_value = 'application/pdf')
SELECT 'Violation' AS severity, subj AS focus_node, subj AS value,
       'http://example.org/constraints#NoPdfDistribution'
           AS source_constraint_component
FROM hits""",
        # kg_bgp_not_exists: BGP + NOT EXISTS anti-join in SQL
        "kg_bgp_not_exists": f"""
WITH g AS (SELECT DISTINCT subj, pred, obj_value FROM {gt}),
has_dist AS (SELECT DISTINCT subj FROM g
             WHERE pred = '{dcat}distribution'),
has_csv AS (SELECT DISTINCT a.subj FROM g a JOIN g b ON a.obj_value = b.subj
            WHERE a.pred = '{dcat}distribution' AND b.pred = '{dct}format'
              AND b.obj_value = 'text/csv')
SELECT 'Violation' AS severity, subj AS focus_node, subj AS value,
       'http://example.org/constraints#NoCsvDistribution'
           AS source_constraint_component
FROM has_dist WHERE subj NOT IN (SELECT subj FROM has_csv)""",
        # kg_bgp_union: SPARQL-UNION analog — either alternative marks
        # the dataset; SQL mirrors the distinct-focus union
        "kg_bgp_union": f"""
WITH g AS (SELECT DISTINCT subj, pred, obj_value FROM {gt}),
hits AS (SELECT DISTINCT a.subj FROM g a JOIN g b ON a.obj_value = b.subj
         WHERE a.pred = '{dcat}distribution' AND b.pred = '{dct}format'
           AND b.obj_value IN ('application/pdf', 'text/turtle'))
SELECT 'Violation' AS severity, subj AS focus_node, subj AS value,
       'http://example.org/constraints#NoPdfOrTurtle'
           AS source_constraint_component
FROM hits""",
        # kg_bgp_optional: OPTIONAL annotates, never filters — LEFT
        # JOIN of the hit set with first-title lookups
        "kg_bgp_optional": f"""
WITH g AS (SELECT DISTINCT subj, pred, obj_value FROM {gt}),
hits AS (SELECT DISTINCT a.subj FROM g a JOIN g b ON a.obj_value = b.subj
         WHERE a.pred = '{dcat}distribution' AND b.pred = '{dct}format'
           AND b.obj_value = 'application/pdf'),
tt AS (SELECT subj, min(obj_value) AS t FROM g
       WHERE pred = '{dct}title' GROUP BY subj)
SELECT 'Violation' AS severity, h.subj AS focus_node,
       CASE WHEN tt.t IS NOT NULL AND tt.t != '' THEN '{dct}title'
            ELSE '' END AS path,
       CASE WHEN tt.t IS NOT NULL AND tt.t != '' THEN tt.t
            ELSE h.subj END AS value,
       'http://example.org/constraints#NoPdfDistributionTitled'
           AS source_constraint_component
FROM hits h LEFT JOIN tt ON tt.subj = h.subj""",
        # kg_validate_versioned: the two-file union profile in SQL —
        # title minCount (Violation, core file) + description minCount
        # (Warning, extra file) over typed datasets
        "kg_validate_versioned": f"""
WITH g AS (SELECT DISTINCT subj, pred, obj_value FROM {gt}),
datasets AS (SELECT DISTINCT subj FROM g
             WHERE pred = '{ns.RDF_TYPE}' AND obj_value = '{dcat}Dataset')
SELECT 'Violation' AS severity, d.subj AS focus_node,
       '{dct}title' AS path, '' AS value,
       '{sh}MinCountConstraintComponent' AS source_constraint_component
FROM datasets d
WHERE d.subj NOT IN (SELECT subj FROM g WHERE pred = '{dct}title')
UNION ALL
SELECT 'Warning', d.subj, '{dct}description', '',
       '{sh}MinCountConstraintComponent'
FROM datasets d
WHERE d.subj NOT IN (SELECT subj FROM g WHERE pred = '{dct}description')""",
        # kg_canon_diff: set difference both ways between the
        # mention-mapped (raw extraction space) and canonical triple
        # sets, via EXCEPT
        "kg_canon_diff": "WITH " + mapped.strip() + f"""
, raw AS (SELECT DISTINCT subj, pred, obj_kind, obj_value,
                 obj_datatype, obj_lang FROM mapped),
canon AS (SELECT DISTINCT subj, pred, obj_kind, obj_value,
                 obj_datatype, obj_lang FROM {gt})
SELECT 'del' AS op, * FROM (SELECT * FROM raw EXCEPT SELECT * FROM canon)
UNION ALL
SELECT 'add' AS op, * FROM (SELECT * FROM canon EXCEPT SELECT * FROM raw)""",
        # kg_redact: the same ordered regexp_replace rules in SQL over
        # the interleaved spans (generate_subscripts keeps span order)
        "kg_redact": f"""
WITH s AS (SELECT doc_id, unnest(spans) AS sp,
                  generate_subscripts(spans, 1) - 1 AS span_idx
           FROM read_parquet('{corpus}/documents/*.parquet'))
SELECT doc_id, span_idx, sp.kind AS kind,
       CASE WHEN sp.kind = 'text' THEN
            regexp_replace(regexp_replace(sp.text,
                '[0-9]{{4}}-[0-9]{{2}}-[0-9]{{2}}T[0-9]{{2}}:[0-9]{{2}}:[0-9]{{2}}Z',
                '<TIMESTAMP>', 'g'),
                '[0-9]+', '<NUM>', 'g')
       ELSE coalesce(sp.text, '') END AS text,
       coalesce(sp.media_ref, '') AS media_ref,
       CASE WHEN sp.kind = 'text' THEN
            len(regexp_extract_all(sp.text,
                '[0-9]{{4}}-[0-9]{{2}}-[0-9]{{2}}T[0-9]{{2}}:[0-9]{{2}}:[0-9]{{2}}Z'))
            + len(regexp_extract_all(regexp_replace(sp.text,
                '[0-9]{{4}}-[0-9]{{2}}-[0-9]{{2}}T[0-9]{{2}}:[0-9]{{2}}:[0-9]{{2}}Z',
                '<TIMESTAMP>', 'g'), '[0-9]+'))
       ELSE 0 END AS n_hits
FROM s""",
        # kg_bgp_paths: sequence path = 2-hop join; alternative path =
        # either-predicate existence, in SQL
        "kg_bgp_paths": f"""
WITH g AS (SELECT DISTINCT subj, pred, obj_value FROM {gt}),
pdf AS (SELECT DISTINCT a.subj FROM g a JOIN g b ON a.obj_value = b.subj
        WHERE a.pred = '{dcat}distribution' AND b.pred = '{dct}format'
          AND b.obj_value = 'application/pdf'),
lbl AS (SELECT DISTINCT subj FROM g
        WHERE pred IN ('{dct}title', '{dct}description'))
SELECT 'Violation' AS severity, subj AS focus_node, subj AS value,
       'http://example.org/constraints#PdfViaPath'
           AS source_constraint_component
FROM pdf WHERE subj IN (SELECT subj FROM lbl)""",
        # kg_bgp_varpred: variable predicate + namespace FILTER in SQL
        "kg_bgp_varpred": f"""
WITH g AS (SELECT DISTINCT subj, pred, obj_value FROM {gt}),
hits AS (SELECT DISTINCT subj FROM g
         WHERE obj_value = 'application/pdf'
           AND pred LIKE '{dct}%')
SELECT 'Violation' AS severity, subj AS focus_node, subj AS value,
       'http://example.org/constraints#PdfValueAnyDctPred'
           AS source_constraint_component
FROM hits""",
        # kg_bgp_scalar_subquery: binding vs corpus-average subselect
        "kg_bgp_scalar_subquery": f"""
WITH g AS (SELECT DISTINCT subj, pred, obj_value FROM {gt}),
sz AS (SELECT subj, obj_value::DOUBLE AS v FROM g
       WHERE pred = '{dcat}byteSize'),
hits AS (SELECT DISTINCT subj FROM sz
         WHERE v > (SELECT avg(v) FROM sz))
SELECT 'Violation' AS severity, subj AS focus_node, subj AS value,
       'http://example.org/constraints#AboveAvgByteSize'
           AS source_constraint_component
FROM hits""",
        # kg_bgp_having_sum: SUM over the distinct solution set per
        # focus (subj, d, s), thresholded
        "kg_bgp_having_sum": f"""
WITH g AS (SELECT DISTINCT subj, pred, obj_value FROM {gt}),
sol AS (SELECT DISTINCT a.subj, a.obj_value AS d, b.obj_value AS s
        FROM g a JOIN g b ON a.obj_value = b.subj
        WHERE a.pred = '{dcat}distribution' AND b.pred = '{dcat}byteSize')
SELECT 'Violation' AS severity, subj AS focus_node, subj AS value,
       'http://example.org/constraints#OversizedDataset'
           AS source_constraint_component
FROM sol GROUP BY subj HAVING sum(s::DOUBLE) > 5000000""",
        # kg_bgp_value_projection: one row per (focus, value) pair,
        # value column = the bound distribution IRI
        "kg_bgp_value_projection": f"""
WITH g AS (SELECT DISTINCT subj, pred, obj_value FROM {gt})
SELECT DISTINCT 'Violation' AS severity, a.subj AS focus_node,
       a.obj_value AS value,
       'http://example.org/constraints#PdfDistributionValue'
           AS source_constraint_component
FROM g a JOIN g b ON a.obj_value = b.subj
WHERE a.pred = '{dcat}distribution' AND b.pred = '{dct}format'
  AND b.obj_value = 'application/pdf'""",
        # kg_bgp_values: the VALUES inline table as a SQL IN list over
        # the two-pattern join (component string differs from kg_bgp_union)
        "kg_bgp_values": f"""
WITH g AS (SELECT DISTINCT subj, pred, obj_value FROM {gt}),
hits AS (SELECT DISTINCT a.subj FROM g a JOIN g b ON a.obj_value = b.subj
         WHERE a.pred = '{dcat}distribution' AND b.pred = '{dct}format'
           AND b.obj_value IN ('application/pdf', 'text/turtle'))
SELECT 'Violation' AS severity, subj AS focus_node, subj AS value,
       'http://example.org/constraints#PdfOrTurtleValues'
           AS source_constraint_component
FROM hits""",
        # kg_bgp_nested_optional: two-step left-outer annotation — the
        # min distribution per focus, then the min format of THAT
        # distribution; value = deepest bound value, path = its predicate
        "kg_bgp_nested_optional": f"""
WITH g AS (SELECT DISTINCT subj, pred, obj_value FROM {gt}),
hits AS (SELECT DISTINCT a.subj FROM g a JOIN g b ON a.obj_value = b.subj
         WHERE a.pred = '{dcat}distribution' AND b.pred = '{dct}format'
           AND b.obj_value = 'application/pdf'),
mind AS (SELECT a.subj, min(a.obj_value) AS d FROM g a
         WHERE a.pred = '{dcat}distribution'
           AND a.subj IN (SELECT subj FROM hits)
         GROUP BY a.subj),
minf AS (SELECT m.subj, min(b.obj_value) AS f FROM mind m
         JOIN g b ON b.subj = m.d AND b.pred = '{dct}format'
         GROUP BY m.subj)
SELECT 'Violation' AS severity, h.subj AS focus_node,
       CASE WHEN mf.f IS NOT NULL THEN '{dct}format'
            ELSE '{dcat}distribution' END AS path,
       coalesce(mf.f, md.d) AS value,
       'http://example.org/constraints#PdfNestedOptional'
           AS source_constraint_component
FROM hits h
JOIN mind md ON md.subj = h.subj
LEFT JOIN minf mf ON mf.subj = h.subj""",
        # kg_validate_sparql_ttl: the sparql_demo profile's two sh:sparql
        # constraints in SQL — BGP join (Violation) + NOT EXISTS
        # (Warning), both restricted to the dcat:Dataset target class
        "kg_validate_sparql_ttl": f"""
WITH g AS (SELECT DISTINCT subj, pred, obj_value FROM {gt}),
datasets AS (SELECT DISTINCT subj FROM g
             WHERE pred = '{ns.RDF_TYPE}' AND obj_value = '{dcat}Dataset'),
pdf AS (SELECT DISTINCT a.subj FROM g a JOIN g b ON a.obj_value = b.subj
        WHERE a.pred = '{dcat}distribution' AND b.pred = '{dct}format'
          AND b.obj_value = 'application/pdf'
          AND a.subj IN (SELECT subj FROM datasets)),
has_dist AS (SELECT DISTINCT subj FROM g
             WHERE pred = '{dcat}distribution'
               AND subj IN (SELECT subj FROM datasets)),
has_csv AS (SELECT DISTINCT a.subj FROM g a JOIN g b ON a.obj_value = b.subj
            WHERE a.pred = '{dcat}distribution' AND b.pred = '{dct}format'
              AND b.obj_value = 'text/csv')
SELECT 'Violation' AS severity, subj AS focus_node, subj AS value FROM pdf
UNION ALL
SELECT 'Warning', subj, subj FROM has_dist
WHERE subj NOT IN (SELECT subj FROM has_csv)""",
        # kg_bgp_having: GROUP BY $this HAVING count(distinct ?d) > 30
        # over the mention-mapped publisher edges
        "kg_bgp_having": "WITH " + mapped.strip() + f"""
SELECT 'Violation' AS severity, obj_value AS focus_node,
       obj_value AS value,
       'http://example.org/constraints#ProlificPublisher'
           AS source_constraint_component
FROM mapped
WHERE pred = '{dct}publisher'
GROUP BY obj_value HAVING count(DISTINCT subj) > 30""",
        # kg_pagerank: the same 5 power iterations unrolled as chained
        # CTEs over the mention-mapped resource graph
        "kg_pagerank": _pagerank_sql(mapped),
        "kg_ppr": _pagerank_sql(mapped, seeds=[ns.EX + "catalog/main"]),
        "kg_ppr_dangling": _pagerank_sql(mapped, seeds=[ns.EX + "catalog/main"], redistribute=True),
        "kg_pagerank_dangling": _pagerank_sql(mapped, redistribute=True),
        # kg_kcore: unrolled peeling rounds (fixpoint well inside 8 at
        # oracle scale; the engine iterates to fixpoint with the same
        # rule and warns if max_rounds ever binds)
        "kg_kcore": _kcore_sql(mapped, k=2, rounds=8),
        # kg_communities: 3 fixed LPA rounds, deterministic tie-break
        "kg_communities": _lpa_sql(mapped, rounds=3),
        # kg_hops: unrolled BFS min-relaxation (3 rounds, MATERIALIZED —
        # each round references its predecessor twice)
        "kg_hops": "WITH " + mapped.strip() + f""",
eh AS MATERIALIZED (SELECT DISTINCT subj AS a, obj_value AS b FROM mapped
       WHERE obj_kind = 'iri'
         AND pred IN ('{dcat}dataset', '{dcat}distribution')),
h0 AS MATERIALIZED (SELECT DISTINCT subj AS node, 0 AS d FROM mapped
       WHERE pred = '{dcat}dataset'),
h1 AS MATERIALIZED (SELECT node, min(d) AS d FROM (
        SELECT node, d FROM h0
        UNION ALL
        SELECT eh.b, h0.d + 1 FROM h0 JOIN eh ON eh.a = h0.node)
      GROUP BY node),
h2 AS MATERIALIZED (SELECT node, min(d) AS d FROM (
        SELECT node, d FROM h1
        UNION ALL
        SELECT eh.b, h1.d + 1 FROM h1 JOIN eh ON eh.a = h1.node)
      GROUP BY node),
h3 AS MATERIALIZED (SELECT node, min(d) AS d FROM (
        SELECT node, d FROM h2
        UNION ALL
        SELECT eh.b, h2.d + 1 FROM h2 JOIN eh ON eh.a = h2.node)
      GROUP BY node)
SELECT node, d::BIGINT AS d FROM h3""",
        # kg_shared_themes: inverted-index set-similarity self-join
        "kg_shared_themes": "WITH " + mapped.strip() + f""",
sv AS (SELECT DISTINCT subj, obj_value AS val FROM mapped
       WHERE pred = '{dcat}theme'),
pr AS (SELECT a.subj AS a, b.subj AS b, count(*) AS n_shared
       FROM sv a JOIN sv b ON a.val = b.val AND a.subj < b.subj
       GROUP BY a.subj, b.subj)
SELECT a, b, n_shared::BIGINT AS n_shared FROM pr WHERE n_shared >= 2""",
        # each triangle {x<y<z} is exactly one wedge through its minimum
        # node x (pairs of canonical edges sharing a) closed by (y,z)
        "kg_triangles": "WITH " + mapped.strip() + """,
e0 AS (SELECT DISTINCT least(subj, obj_value) AS a,
              greatest(subj, obj_value) AS b
       FROM mapped WHERE obj_kind = 'iri' AND subj != obj_value),
w AS (SELECT e1.b AS x, e2.b AS y
      FROM e0 e1 JOIN e0 e2 ON e1.a = e2.a AND e1.b < e2.b)
SELECT count(*)::BIGINT AS n_triangles
FROM w JOIN e0 e ON e.a = w.x AND e.b = w.y""",
        # kg_components: undirected closure over dcat:distribution edges
        # (per-dataset star components keep the oracle closure cheap);
        # rep = lexicographic min IRI in the component, matching the
        # engine's ranked-min union-find root (no mention IRIs here)
        "kg_components": "WITH RECURSIVE " + mapped.strip() + f""",
de AS (SELECT DISTINCT subj AS a, obj_value AS b FROM mapped
       WHERE obj_kind = 'iri' AND pred = '{dcat}distribution'
         AND subj != obj_value),
e AS (SELECT a, b FROM de UNION SELECT b, a FROM de),
reach(n, m) AS (SELECT a, b FROM e
                UNION
                SELECT r.n, e2.b FROM reach r JOIN e e2 ON r.m = e2.a)
SELECT n AS entity_id, least(n, min(m)) AS root_id
FROM reach GROUP BY n""",
        # kg_media_features: planted per-dimension feature expectations
        "kg_media_features": f"""
SELECT doc_id, span_idx, kind, media_ref,
       {', '.join(f'f{i}' for i in range(16))}
FROM read_parquet('{corpus}/gt_media/part-*.parquet')""",
        # kg_image_stats: the corpus generator plants the expected decode
        # results (dimensions + integer channel sums straight off the
        # pixel array) in gt_media; the engine recomputes them through
        # PPM encode → REAL header/pixel parse → stats
        "kg_image_stats": f"""
SELECT doc_id, span_idx, kind, media_ref, width, height, n_frames,
       sum_r, sum_g, sum_b
FROM read_parquet('{corpus}/gt_media/part-*.parquet')""",
    }
    # integration oracle: the union of the five independent per-profile
    # SQL re-implementations — validates that one combined validate()
    # run over all feature families reproduces each family exactly
    out["kg_validate_full"] = " UNION ALL ".join(
        f"SELECT * FROM ({out[k]})"
        for k in ("kg_validate", "kg_validate_paths", "kg_validate_logic",
                  "kg_validate_node", "kg_validate_qualified",
                  "kg_validate_pairs"))
    return out


def get_oracle_sql() -> dict[str, str]:
    return {**ORACLE_SQL, **_kg_oracle_sql()}
