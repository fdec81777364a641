"""Benchmark harness (driver contract; see BASELINE.md).

Plain run: executes the headline pipelines over ``$GRAFT_SF_DIR``
(default /root/testdata/sf0.1) with ``ray.init(address="local",
num_cpus=int($RAY_GRAFT_CPUS))`` (default 32) and prints ONE JSON line:
``{"metric": ..., "value": <headline seconds>, "unit": "sec",
"queries": {...}, "sf": ..., "num_cpus": N, "docs_per_sec": ...}``.

``--scaling``: runs the headline KG pipeline twice in FRESH processes at
two parallelism levels (8 and 32 CPUs — the sandbox stand-in for N vs 4N
nodes) on the same input and reports both throughputs + scaling
efficiency (BASELINE.json north_rule).
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import time


def _headline(sf_dir: str) -> dict:
    """The flagship KG-construction pipeline — ONE production-shaped run
    (extract once, shared intermediates; see kg.full_pipeline)."""
    from shacl_validator_ray import synth
    from shacl_validator_ray.pipelines import kg

    out = {}
    synth.ensure_corpus(sf_dir)  # untimed: corpus synth + page-cache warm
    n_docs = synth.num_docs_for_sf(synth.sf_of_dir(sf_dir))

    t0 = time.time()
    n_triples = kg.triples_dataset(sf_dir).count()
    out["extract_only"] = round(time.time() - t0, 3)

    graph_dir = f"/tmp/svr_bench_graph_{os.getpid()}"
    shutil.rmtree(graph_dir, ignore_errors=True)
    t0 = time.time()
    stats = kg.full_pipeline(sf_dir, graph_dir)
    out["full_pipeline"] = round(time.time() - t0, 3)
    shutil.rmtree(graph_dir, ignore_errors=True)

    out["_n_docs"] = n_docs
    out["_n_triples"] = n_triples
    out["_n_viols"] = stats["violations"]
    return out


def _aux_queries(sf_dir: str) -> dict:
    """Representative non-KG pipelines over the driver tables, plus the
    all-families SHACL profile (the heaviest validation path)."""
    from shacl_validator_ray.pipelines import kg, queries as q
    from shacl_validator_ray.stages import shacl
    from shacl_validator_ray.state import shapes as shapes_mod

    out = {}
    for name in ("pruned_agg", "join_orders_customers", "minhash_lsh_dups",
                 "fuzzy_dedup_keep", "knn_bruteforce", "token_counts",
                 "unigram_nll", "substring_dedup"):
        t0 = time.time()
        res = q.QUERIES[name](sf_dir)
        if hasattr(res, "count"):
            res.count()
        out[name] = round(time.time() - t0, 3)

    deduped = shacl.dedup_triples(kg.triples_dataset(sf_dir)).materialize()
    t0 = time.time()
    shacl.validate(deduped, shapes_mod.load_profile_ttl("full_demo"),
                   deduped=True).count()
    out["validate_all_families"] = round(time.time() - t0, 3)

    # the rerun primitive: one changed document spliced into a prior
    # materialized graph (vs full_pipeline's full rewrite) — untimed
    # prior-artifact setup, timed incremental_update only
    import shutil

    import pyarrow as pa

    from shacl_validator_ray import synth
    from shacl_validator_ray.stages import canonicalize, linking, materialize

    alias_rows = [(r["surface"], r["iri"])
                  for r in synth.alias_table().to_pylist()]
    prior_triples = deduped
    prior_links = linking.link_entities(deduped, alias_rows).materialize()
    prior_map = canonicalize.canonical_map_from_links(
        prior_links).materialize()
    g = f"/tmp/svr_bench_incr_{os.getpid()}"
    shutil.rmtree(g, ignore_errors=True)
    materialize.materialize_graph(
        materialize.canonical_rewrite(deduped, prior_map), g)
    docs = kg.documents_dataset(sf_dir)
    first = docs.take(1)[0]
    changed_docs = docs.filter(
        lambda r, d=first["doc_id"]: r["doc_id"] == d)
    t0 = time.time()
    kg.incremental_update(g, prior_triples, prior_links, prior_map,
                          {first["doc_id"]}, changed_docs,
                          alias_rows=alias_rows)
    out["incremental_update_1doc"] = round(time.time() - t0, 3)
    shutil.rmtree(g, ignore_errors=True)
    return out


def run_once() -> dict:
    import logging

    import ray

    sf_dir = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
    ncpus = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
    ray.init(address="local", num_cpus=ncpus, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    logging.getLogger("ray.data").setLevel(logging.ERROR)

    stages = _headline(sf_dir)
    aux = _aux_queries(sf_dir)
    ray.shutdown()

    n_docs = stages.pop("_n_docs")
    stages.pop("_n_triples"), stages.pop("_n_viols")
    headline = stages["full_pipeline"]
    from shacl_validator_ray import synth

    return {
        "metric": "kg_construct end-to-end (extract+validate+link+canon+materialize)",
        "value": headline,
        "unit": "sec",
        "queries": {**stages, **aux},
        "sf": synth.sf_of_dir(sf_dir),
        "num_cpus": ncpus,
        "docs_per_sec": round(n_docs / headline, 1) if headline else None,
    }


def run_emit() -> dict:
    """Triple-emission throughput (THE BASELINE.json metric): read the
    interleaved-docs corpus → extract triples → count, with one untimed
    warm pass (worker spin-up + page cache) before the timed pass."""
    import logging

    import ray

    ncpus = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
    ndocs = int(os.environ.get("GRAFT_SCALE_DOCS", "4000000"))
    ray.init(address="local", num_cpus=ncpus, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    logging.getLogger("ray.data").setLevel(logging.ERROR)

    import pyarrow as pa

    from shacl_validator_ray import synth
    from shacl_validator_ray.sources import io
    from shacl_validator_ray.stages import extract

    corpus = synth.ensure_corpus_n(ndocs)

    def emit(paths) -> int:
        # count-projection consume: the extraction UDF runs in full, but
        # emitted blocks reduce to per-batch counts instead of landing in
        # the single-node object store (which is a per-NODE resource on a
        # real cluster and would scale with nodes, not with num_cpus)
        docs = io.read_table(paths)
        tr = extract.extract_triples(docs, batch_size=2048)
        counts = tr.map_batches(
            lambda b: pa.table({"n": pa.array([b.num_rows], pa.int64())}),
            batch_format="pyarrow", zero_copy_batch=True)
        return counts.sum("n")

    docs_dir = f"{corpus}/documents"
    shards = sorted(os.path.join(docs_dir, f) for f in os.listdir(docs_dir))
    emit(shards[: max(4, len(shards) // 8)])  # untimed warm: worker spin-up
    best, n_triples = None, 0
    for _ in range(2):
        t0 = time.time()
        n_triples = emit(docs_dir)
        sec = time.time() - t0
        best = sec if best is None or sec < best else best
    sec = round(best, 3)
    ray.shutdown()
    return {"sec": sec, "docs_per_sec": round(ndocs / sec, 1),
            "triples": n_triples, "num_cpus": ncpus, "ndocs": ndocs}


def run_scaling() -> dict:
    """North-rule criterion: same triple-emission job, same input, two
    parallelism levels (8 vs 32 CPUs) in fresh processes — the sandbox
    stand-in for N vs 4N nodes."""
    from shacl_validator_ray import synth

    ndocs = int(os.environ.get("GRAFT_SCALE_DOCS", "4000000"))
    synth.ensure_corpus_n(ndocs)  # generate once, shared by both runs

    def run(ncpu: int) -> dict:
        env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu),
                   GRAFT_SCALE_DOCS=str(ndocs))
        out = subprocess.run([sys.executable, os.path.abspath(__file__), "--emit"],
                             env=env, capture_output=True, text=True,
                             check=True).stdout
        return json.loads(out.strip().splitlines()[-1])

    # best-of-2 timed passes per process × two interleaved process rounds
    # per level: this shared sandbox's wall-clock noise (±30% run-to-run,
    # worst at full machine load) otherwise dominates the ratio
    runs = [run(8), run(32), run(8), run(32)]
    lo = min((r for r in runs if r["num_cpus"] == 8), key=lambda r: r["sec"])
    hi = min((r for r in runs if r["num_cpus"] == 32), key=lambda r: r["sec"])
    eff = (lo["sec"] / hi["sec"]) / (32 / 8)
    return {
        "metric": "triple-emission scaling (8 → 32 CPUs, fresh processes, same input)",
        "ndocs": ndocs,
        "sec_8": lo["sec"], "sec_32": hi["sec"],
        "docs_per_sec_8": lo["docs_per_sec"], "docs_per_sec_32": hi["docs_per_sec"],
        "all_runs": [{"num_cpus": r["num_cpus"], "sec": r["sec"]} for r in runs],
        "scaling_efficiency": round(eff, 3),
    }


def run_e2e_samples(n: int = 3) -> dict:
    """Matched-window sampling for the headline numbers: run the full
    bench ``n`` times in FRESH processes back-to-back (one quiet-window
    candidate) and report every sample plus the best — shared-sandbox
    tenancy noise is ±30%, so single-shot round-over-round deltas are
    not interpretable (BASELINE.md noise note)."""
    samples = []
    for _ in range(n):
        out = subprocess.run([sys.executable, os.path.abspath(__file__)],
                             env=dict(os.environ), capture_output=True,
                             text=True, check=True).stdout
        samples.append(json.loads(out.strip().splitlines()[-1]))
    best = min(samples, key=lambda s: s["value"])
    return {
        "metric": "e2e matched-window samples (fresh process each)",
        "samples": [{"full_pipeline": s["queries"]["full_pipeline"],
                     "extract_only": s["queries"]["extract_only"],
                     "docs_per_sec": s["docs_per_sec"]} for s in samples],
        "best": best,
    }


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        print(json.dumps(run_scaling()))
    elif "--emit" in sys.argv:
        print(json.dumps(run_emit()))
    elif "--e2e-samples" in sys.argv:
        print(json.dumps(run_e2e_samples()))
    else:
        print(json.dumps(run_once()))
