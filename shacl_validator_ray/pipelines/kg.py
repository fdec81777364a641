"""The flagship KG-construction pipeline (SURVEY.md §3.1 restatement).

read documents → extract triples → SHACL validate → link entities →
canonicalize → materialize graph. Each stage is added here as it lands;
every function takes and returns ``ray.data.Dataset`` and never calls
``ray.init`` (driver contract, /root/repo/__ray_entry__.py:11-13).
"""

from __future__ import annotations

import ray.data as rd

from .. import synth
from ..sources import io
from ..stages import canonicalize, extract, linking, materialize, shacl
from ..state import shapes as shapes_mod


def documents_dataset(sf_dir: str) -> rd.Dataset:
    """Synthesize (cached) + read the interleaved-docs corpus for this scale."""
    corpus = synth.ensure_corpus(sf_dir)
    return io.read_table(f"{corpus}/documents")


def triples_dataset(sf_dir: str, batch_size: int = 1024) -> rd.Dataset:
    return extract.extract_triples(documents_dataset(sf_dir), batch_size=batch_size)


def violations_dataset(sf_dir: str, profile: str = "dcat_ap_demo") -> rd.Dataset:
    return shacl.validate(triples_dataset(sf_dir), shapes_mod.load_profile_ttl(profile))


def links_dataset(sf_dir: str, tau: float = 0.5) -> rd.Dataset:
    alias_rows = [(r["surface"], r["iri"]) for r in synth.alias_table().to_pylist()]
    return linking.link_entities(triples_dataset(sf_dir), alias_rows, tau=tau)


def canonical_map(sf_dir: str) -> rd.Dataset:
    return canonicalize.canonical_map_from_links(links_dataset(sf_dir))


def canonical_triples(sf_dir: str) -> rd.Dataset:
    """extract → link → canonicalize → rewrite → dedup (graph set)."""
    triples = triples_dataset(sf_dir)
    canon = canonical_map(sf_dir)
    return shacl.dedup_triples(materialize.canonical_rewrite(triples, canon))


def conformant_triples(sf_dir: str, profile: str = "dcat_ap_demo",
                       bloom_threshold: int | None = None) -> rd.Dataset:
    """Canonicalized graph gated on validation: triples whose subject has a
    Violation-severity result are excluded (the "SHACL-conformant triple
    set" of the north star) — a fully DISTRIBUTED anti-join (A11
    both-sides-large formulation, relational.anti_join_native): the
    violating focus set is distinct-reduced by one groupby and
    left_outer-joined against the graph on subject; the null probe keeps
    conformant rows. The driver never holds the violating set, even
    transiently — it scales with data on a dirty corpus (VERDICT r2 #1).
    ``bloom_threshold`` is kept for API compatibility; the exact
    anti-join replaced the Bloom broadcast, so it gates nothing."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from .. import schema as S

    viols = shacl.validate(triples_dataset(sf_dir),
                           shapes_mod.load_profile_ttl(profile))
    from ray.data.aggregate import Count

    bad = (viols.map_batches(
               lambda b: b.filter(pc.equal(b["severity"], "Violation"))
                          .select(["focus_node"])
                          .rename_columns(["bad_subj"]),
               batch_format="pyarrow", zero_copy_batch=True)
           .groupby("bad_subj").aggregate(Count(alias_name="_nviol"))
           .materialize())
    # pin the Arrow schema on both sides: pandas-produced blocks report
    # object dtypes, which breaks the hash-join planner's key resolution
    triples = canonical_triples(sf_dir).map_batches(
        lambda b: pa.table({f.name: b[f.name].cast(f.type)
                            for f in S.TRIPLES}, schema=S.TRIPLES),
        batch_format="pyarrow", zero_copy_batch=True)
    if bad.count() == 0:
        return triples
    bad = bad.map_batches(
        lambda b: pa.table({"bad_subj": b["bad_subj"].cast(pa.string()),
                            "_nviol": b["_nviol"].cast(pa.int64())}),
        batch_format="pyarrow")
    joined = triples.join(bad, "left_outer", io.shuffle_buckets(),
                          on=("subj",), right_on=("bad_subj",))
    cols = [f.name for f in S.TRIPLES]
    return joined.map_batches(
        lambda b: b.filter(pc.is_null(b["_nviol"])).select(cols),
        batch_format="pyarrow")


def materialized_graph(sf_dir: str, out_dir: str, **kw) -> dict:
    """Full pipeline with partitioned, resumable output (S12)."""
    triples = triples_dataset(sf_dir)
    canon = canonical_map(sf_dir)
    rewritten = materialize.canonical_rewrite(triples, canon)
    return materialize.materialize_graph(rewritten, out_dir, **kw)


def full_pipeline(sf_dir: str, out_dir: str, profile: str = "dcat_ap_demo",
                  hub_threshold: int = 5000, instrument: bool = False) -> dict:
    """One production-shaped run sharing intermediates: extract ONCE →
    dedup (checkpointed via materialize) → {validate, link} off the same
    deduped set → canonicalize → rewrite → partitioned graph write.

    Returns counts per stage. At 100 TB the ``materialize()`` calls become
    partitioned parquet checkpoints (resume points); nothing else changes.
    ``instrument=True`` wraps the extraction stage with the A12 metrics
    sidecar (per-batch rows_in/rows_out/wall into the collector actor).
    """
    docs = documents_dataset(sf_dir)
    if instrument:
        from ..state import metrics as metrics_mod
        from ..stages.extract import extract_triples_batch

        fn = metrics_mod.instrument(extract_triples_batch, "extract")
        triples = docs.map_batches(fn, batch_format="pyarrow", batch_size=1024,
                                   zero_copy_batch=True)
    else:
        triples = extract.extract_triples(docs)
    deduped = shacl.dedup_triples(triples).materialize()

    viols = shacl.validate(deduped, shapes_mod.load_profile_ttl(profile),
                           deduped=True).materialize()
    n_viols = viols.count()

    alias_rows = [(r["surface"], r["iri"]) for r in synth.alias_table().to_pylist()]
    links = linking.link_entities(deduped, alias_rows)
    canon = canonicalize.canonical_map_from_links(links)
    rewritten = materialize.canonical_rewrite(deduped, canon)
    manifest = materialize.materialize_graph(rewritten, out_dir, deduped=False,
                                             hub_threshold=hub_threshold)

    # lineage sidecars next to the graph: violations table + run-history row
    import os

    from ..state import metrics as metrics_mod

    viols.write_parquet(os.path.join(out_dir, "_violations"))
    n_triples = deduped.count()
    metrics_mod.append_run(os.path.join(out_dir, "_history"), {
        "sf_dir": sf_dir, "profile": profile, "violations": n_viols,
        "triples": n_triples, "wall_s": manifest["wall_s"]})
    return {"violations": n_viols, "manifest": manifest, "triples": n_triples}


def flagship(sf_dir: str) -> rd.Dataset:
    """The end-to-end KG-construction spine: canonicalized deduped triples."""
    return canonical_triples(sf_dir)


def incremental_canonical_triples(sf_dir: str, changed_doc_ids,
                                  prior_links: rd.Dataset,
                                  prior_map: rd.Dataset) -> rd.Dataset:
    """Incremental canonicalize + rewrite — the 100 TB rerun primitive
    for the GRAPH side (the validation side is
    :func:`incremental_validate`): re-link ONLY the changed documents,
    splice their components into the prior canonical map
    (``canonicalize.incremental_canonical_map`` — affected components
    recompute, untouched ones pass through), and rewrite the triple set
    through the spliced map. Equivalence with the from-scratch graph is
    oracle-checked (``kg_incremental_graph`` reproduces the full-run
    ``kg_canonical`` hash exactly)."""
    import pyarrow as pa
    import ray

    changed = set(changed_doc_ids)
    ch_ref = ray.put(changed)

    docs = documents_dataset(sf_dir)

    def keep_changed(b: pa.Table) -> pa.Table:
        ch = ray.get(ch_ref)
        mask = pa.array([d in ch for d in b["doc_id"].to_pylist()],
                        pa.bool_())
        return b.filter(mask)

    tr_changed = extract.extract_triples(
        docs.map_batches(keep_changed, batch_format="pyarrow",
                         zero_copy_batch=True))
    alias_rows = [(r["surface"], r["iri"])
                  for r in synth.alias_table().to_pylist()]
    new_links = linking.link_entities(tr_changed, alias_rows).materialize()

    canon = canonicalize.incremental_canonical_map(
        prior_links, prior_map, new_links, changed)
    return shacl.dedup_triples(
        materialize.canonical_rewrite(triples_dataset(sf_dir), canon))


def incremental_update(out_dir: str, prior_triples: rd.Dataset,
                       prior_links: rd.Dataset, prior_map: rd.Dataset,
                       changed_doc_ids, changed_docs: rd.Dataset,
                       alias_rows=None, **materialize_kw) -> dict:
    """The production RERUN primitive, end-to-end: given a previously
    materialized graph directory and the prior run's artifacts
    (triples, links, canonical map), apply a document-level change —
    extraction scans ONLY the changed documents, the canonical map
    splices only the components the change touches
    (``canonicalize.incremental_canonical_map``), and the partitioned
    write rewrites ONLY the write groups that can contain an affected
    subject (``materialize.incremental_materialize``). Every other
    group's parquet partitions stay on disk untouched.

    ``changed_docs`` carries the NEW content of the changed documents
    (an empty Dataset deletes them). The affected-subject set =
    increment-bounded union of (a) raw subjects of the changed docs'
    OLD and NEW triples and (b) every entity/root of a spliced
    component (covers triples of UNCHANGED docs whose rewritten subject
    moved when a component's root changed). Equivalence with a
    from-scratch run on the new corpus is pytest-enforced (row-set
    equality of the final graphs)."""
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray

    changed = set(changed_doc_ids)
    ch_ref = ray.put(changed)

    def drop_changed(b: pa.Table) -> pa.Table:
        ch = ray.get(ch_ref)
        mask = pa.array([d not in ch for d in b["doc_id"].to_pylist()],
                        pa.bool_())
        return b.filter(mask)

    tr_changed = extract.extract_triples(changed_docs).materialize()
    kept = prior_triples.map_batches(drop_changed, batch_format="pyarrow",
                                     zero_copy_batch=True)
    triples_new = kept.union(tr_changed)

    if alias_rows is None:
        alias_rows = [(r["surface"], r["iri"])
                      for r in synth.alias_table().to_pylist()]
    new_links = linking.link_entities(tr_changed, alias_rows).materialize()

    canon_new, affected = canonicalize.incremental_canonical_map(
        prior_links, prior_map, new_links, changed, return_affected=True)

    # raw subjects of the changed docs' OLD and NEW triples (both are
    # increment-bounded scans; the old side reuses the prior artifact)
    subjects = set(affected)
    for b in tr_changed.select_columns(["subj"]).iter_batches(
            batch_format="pyarrow"):
        subjects.update(pc.unique(b["subj"]).to_pylist())

    def keep_changed_subj(b: pa.Table) -> pa.Table:
        ch = ray.get(ch_ref)
        mask = pa.array([d in ch for d in b["doc_id"].to_pylist()],
                        pa.bool_())
        return b.filter(mask).select(["subj"])

    for b in prior_triples.map_batches(
            keep_changed_subj, batch_format="pyarrow",
            zero_copy_batch=True).iter_batches(batch_format="pyarrow"):
        subjects.update(pc.unique(b["subj"]).to_pylist())

    rewritten = materialize.canonical_rewrite(triples_new, canon_new)
    manifest = materialize.incremental_materialize(
        rewritten, out_dir, subjects, **materialize_kw)
    manifest["affected_subjects"] = len(subjects)
    return manifest


def incremental_validate(sf_dir: str, changed_doc_ids, prior: rd.Dataset,
                         profile: str = "dcat_ap_demo") -> rd.Dataset:
    """Incremental revalidation — the 100 TB rerun primitive: revalidate
    ONLY the changed documents and splice the results into a prior
    full-run violations Dataset.

    Contract (documented partitioning assumption): focus nodes are
    DOCUMENT-LOCAL — every triple of a validated focus node lives in
    the document that introduced it (true for this corpus's
    dataset/distribution records; cross-document entities are the
    canonicalization stage's concern, not shape validation's). Under
    that contract a changed doc's focus nodes validate identically in
    isolation, so:

    1. extract triples from the changed documents only (predicate
       pushdown on the documents read — the increment, not the corpus,
       is scanned);
    2. validate that slice with the same profile;
    3. drop prior results whose focus node belongs to the changed docs
       (broadcast membership — bounded by the increment size) and union
       the fresh results.

    Equivalence with a from-scratch full run is pytest-enforced
    (test_kg_pipeline) and oracle-checked (the kg_incremental query
    splices half the corpus and must reproduce the full-run oracle)."""
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray

    changed = set(changed_doc_ids)
    ch_ref = ray.put(changed)

    docs = documents_dataset(sf_dir)

    def keep_changed(b: pa.Table) -> pa.Table:
        ch = ray.get(ch_ref)
        mask = pa.array([d in ch for d in b["doc_id"].to_pylist()],
                        pa.bool_())
        return b.filter(mask)

    tr = extract.extract_triples(
        docs.map_batches(keep_changed, batch_format="pyarrow",
                         zero_copy_batch=True)).materialize()
    fresh = shacl.validate(tr, shapes_mod.load_profile_ttl(profile))

    # affected focus set: distinct subjects of the increment (bounded by
    # the change set, never corpus-scale)
    focus = set()
    for b in tr.select_columns(["subj"]).iter_batches(
            batch_format="pyarrow"):
        focus.update(pc.unique(b["subj"]).to_pylist())
    f_ref = ray.put(frozenset(focus))

    def drop_stale(b: pa.Table) -> pa.Table:
        f = ray.get(f_ref)
        mask = pa.array([x not in f for x in b["focus_node"].to_pylist()],
                        pa.bool_())
        return b.filter(mask)

    kept = prior.map_batches(drop_stale, batch_format="pyarrow")
    return kept.union(fresh)
