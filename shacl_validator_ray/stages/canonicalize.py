"""Canonicalization: merge co-referent entities via distributed union-find
(north-rule D5) — hash-min label propagation as iterative
groupby-aggregate rounds, no driver-side graph.

Labels are *ranked*: canonical entity IRIs outrank mention IRIs, so a
component's root is always a canonical IRI when one is present (rank
prefix "0|" vs "1|"). Convergence: labels are monotonically
non-increasing; fixpoint is detected with a global checksum aggregate;
round count is bounded by component diameter (star-shaped link graphs
converge in 2). ``max_rounds`` caps the cost at scale (SURVEY.md §7.3).
"""

from __future__ import annotations

import hashlib

import pandas as pd
import pyarrow as pa
import ray.data as rd
from ray.data.aggregate import Min

from ..stages import extract


def _rank(iri: str) -> str:
    return ("1|" if iri.startswith(extract.MENTION_NS) else "0|") + iri


def _unrank(label: str) -> str:
    return label[2:]


def _checksum(labels: rd.Dataset) -> int:
    def h(b: pa.Table) -> pa.Table:
        out = [int.from_bytes(hashlib.blake2b(f"{n}\0{l}".encode(), digest_size=7).digest(),
                              "little")
               for n, l in zip(b["node"].to_pylist(), b["label"].to_pylist())]
        return pa.table({"h": pa.array(out, pa.int64())})

    res = labels.map_batches(h, batch_format="pyarrow").sum("h")
    return int(res or 0)


def connected_components(edges: rd.Dataset, max_rounds: int = 8,
                         driver_threshold: int = 200_000) -> rd.Dataset:
    """edges (a, b) → (entity_id, root_id) for every node in the graph.

    Each round: one union + bucketed-merge propagation, one
    groupby-aggregate(Min) hash-min — the "iterative groupby-aggregate
    rounds" formulation of union-find.

    Graphs below ``driver_threshold`` edges short-circuit to an exact
    driver-side union-find (identical result, no per-round shuffle
    overhead); the distributed path is the 10^12-scale route and is
    exercised in tests with ``driver_threshold=0``.
    """
    # One pass decides the path AND feeds the fast path: collect edge
    # batches up to the threshold; only a graph that overflows it pays the
    # distributed rounds (and re-reads the edges there).
    if driver_threshold > 0:
        collected: list[pa.Table] = []
        n = 0
        for b in edges.iter_batches(batch_format="pyarrow"):
            collected.append(b)
            n += b.num_rows
            if n > driver_threshold:
                break
        else:
            import ray.data as rd_

            small = (pa.concat_tables(collected) if collected
                     else pa.schema([pa.field("a", pa.string()),
                                     pa.field("b", pa.string())]).empty_table())
            return _driver_components(rd_.from_arrow(small))
    # adjacency, both directions, ranked labels
    def to_adj(b: pa.Table) -> pa.Table:
        a = [_rank(x) for x in b["a"].to_pylist()]
        bb = [_rank(x) for x in b["b"].to_pylist()]
        return pa.table({"node": pa.array(a + bb, pa.string()),
                         "nbr": pa.array(bb + a, pa.string())})

    adj = edges.map_batches(to_adj, batch_format="pyarrow").materialize()
    labels = (adj.groupby("node").aggregate(Min("nbr", alias_name="label"))
              .map_batches(
                  lambda b: pa.table({
                      "node": b["node"],
                      "label": pa.array(
                          [min(n, l) for n, l in zip(b["node"].to_pylist(),
                                                     b["label"].to_pylist())],
                          pa.string())}),
                  batch_format="pyarrow")
              .materialize())

    from ..sources import io as io_mod

    n_buckets = io_mod.shuffle_buckets()

    def bucketize(b: pa.Table) -> pa.Table:
        return b.append_column("bucket",
                               io_mod.hash_bucket_column(b["node"], n_buckets))

    def tag_adj(b: pa.Table) -> pa.Table:
        return pa.table({"node": b["node"], "nbr": b["nbr"],
                         "label": pa.array([""] * b.num_rows, pa.string()),
                         "bucket": b["bucket"]})

    adj_b = adj.map_batches(bucketize, batch_format="pyarrow") \
               .map_batches(tag_adj, batch_format="pyarrow").materialize()

    def propagate(g: pd.DataFrame) -> pd.DataFrame:
        # bucketed hash join (pandas merge per bucket — vectorized):
        # every adjacency row receives its node's current label
        lbl = g.loc[g["label"] != "", ["node", "label"]]
        ad = g.loc[g["label"] == "", ["node", "nbr"]]
        m = ad.merge(lbl, on="node")
        out = pd.concat(
            [lbl, m[["nbr", "label"]].rename(columns={"nbr": "node"})],
            ignore_index=True)
        return out

    prev = _checksum(labels)
    for _ in range(max_rounds):
        # propagate: bucket-partitioned join of adjacency with current
        # labels (one shuffle keyed by node-hash bucket), then the
        # hash-min aggregate. No per-node Python calls — one vectorized
        # pandas merge per bucket.
        lbl_b = labels.map_batches(bucketize, batch_format="pyarrow") \
                      .map_batches(
            lambda b: pa.table({"node": b["node"],
                                "nbr": pa.array([""] * b.num_rows, pa.string()),
                                "label": b["label"], "bucket": b["bucket"]}),
            batch_format="pyarrow")
        msgs = (adj_b.union(lbl_b).groupby("bucket")
                .map_groups(propagate, batch_format="pandas"))
        labels = (msgs.groupby("node").aggregate(Min("label", alias_name="label"))
                  .materialize())
        cur = _checksum(labels)
        if cur == prev:
            break
        prev = cur

    return labels.map_batches(
        lambda b: pa.table({
            "entity_id": pa.array([_unrank(x) for x in b["node"].to_pylist()], pa.string()),
            "root_id": pa.array([_unrank(x) for x in b["label"].to_pylist()], pa.string()),
        }),
        batch_format="pyarrow")


def _driver_components(edges: rd.Dataset) -> rd.Dataset:
    """Exact union-find on the driver (small-graph fast path); same ranked
    root selection as the distributed rounds."""
    parent: dict[str, str] = {}

    def find(x: str) -> str:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for b in edges.iter_batches(batch_format="pyarrow"):
        for a_, b_ in zip(b["a"].to_pylist(), b["b"].to_pylist()):
            ra, rb = _rank(a_), _rank(b_)
            parent.setdefault(ra, ra)
            parent.setdefault(rb, rb)
            x, y = find(ra), find(rb)
            if x != y:
                if y < x:
                    x, y = y, x
                parent[y] = x  # min ranked label wins → canonical IRIs root
    rows = [{"entity_id": _unrank(n), "root_id": _unrank(find(n))} for n in parent]
    rows.sort(key=lambda r: r["entity_id"])
    import ray.data as rd_

    return rd_.from_arrow(pa.Table.from_pylist(
        rows, schema=pa.schema([pa.field("entity_id", pa.string()),
                                pa.field("root_id", pa.string())])))


def canonical_map_from_links(links: rd.Dataset, max_rounds: int = 8) -> rd.Dataset:
    """entity-links → canonical map (schema.CANONICAL_MAP)."""
    edges = links.map_batches(
        lambda b: pa.table({"a": b["mention_iri"], "b": b["candidate_iri"]}),
        batch_format="pyarrow", zero_copy_batch=True)
    return connected_components(edges, max_rounds=max_rounds)


def incremental_canonical_map(prior_links: rd.Dataset, prior_map: rd.Dataset,
                              new_links: rd.Dataset, changed_doc_ids,
                              max_rounds: int = 8,
                              return_affected: bool = False):
    """Incremental co-reference merge — union-find components are
    mergeable, so a document change never re-resolves the whole graph:

    1. the increment's link endpoints (the changed docs' OLD links,
       dropped, plus their NEW links) name the AFFECTED prior
       components (roots looked up in ``prior_map``);
    2. only links touching an affected component — plus the new links —
       re-run :func:`connected_components`; every other component's
       rows pass through from the prior map untouched.

    Prior components are link-closed, so affected/unaffected is a true
    partition: an unchanged link can never straddle the boundary.

    Documented partitioning assumption (the same boundedness contract
    as ``kg.incremental_validate``): the affected component MEMBER set
    is increment-sized, not corpus-sized — it is broadcast for the
    link filter. A change touching a giant component (say a hub merged
    with millions of mentions) degrades to recomputing that component,
    which is exactly the work a correct result requires.

    Equivalence with the from-scratch map is oracle-checked
    (``kg_incremental_graph`` reproduces the full-run ``kg_canonical``
    hash) and pytest-enforced."""
    import pyarrow.compute as pc
    import ray

    changed = frozenset(changed_doc_ids)
    ch_ref = ray.put(changed)

    def split(keep_changed: bool):
        def fn(b: pa.Table) -> pa.Table:
            ch = ray.get(ch_ref)
            mask = pa.array([(d in ch) == keep_changed
                             for d in b["doc_id"].to_pylist()], pa.bool_())
            return b.filter(mask)
        return fn

    kept_links = prior_links.map_batches(split(False),
                                         batch_format="pyarrow",
                                         zero_copy_batch=True)
    old_changed = prior_links.map_batches(split(True),
                                          batch_format="pyarrow",
                                          zero_copy_batch=True)

    # increment endpoints (bounded by the change set)
    nodes0: set[str] = set()
    for src in (old_changed, new_links):
        for b in src.select_columns(["mention_iri", "candidate_iri"]) \
                    .iter_batches(batch_format="pyarrow"):
            nodes0.update(b["mention_iri"].to_pylist())
            nodes0.update(b["candidate_iri"].to_pylist())
    n0_ref = ray.put(frozenset(nodes0))

    # affected roots = prior components containing any increment endpoint
    def roots_of(b: pa.Table) -> pa.Table:
        n0 = ray.get(n0_ref)
        mask = pa.array([e in n0 for e in b["entity_id"].to_pylist()],
                        pa.bool_())
        return b.filter(mask).select(["root_id"])

    aroots: set[str] = set()
    for b in prior_map.map_batches(roots_of, batch_format="pyarrow") \
                      .iter_batches(batch_format="pyarrow"):
        aroots.update(b["root_id"].to_pylist())
    ar_ref = ray.put(frozenset(aroots))

    # affected MEMBERS (increment-sized per the contract above)
    def members_of(b: pa.Table) -> pa.Table:
        ar = ray.get(ar_ref)
        mask = pa.array([r in ar for r in b["root_id"].to_pylist()],
                        pa.bool_())
        return b.filter(mask).select(["entity_id"])

    aent: set[str] = set(nodes0)
    for b in prior_map.map_batches(members_of, batch_format="pyarrow") \
                      .iter_batches(batch_format="pyarrow"):
        aent.update(b["entity_id"].to_pylist())
    ae_ref = ray.put(frozenset(aent))

    def touches_affected(b: pa.Table) -> pa.Table:
        ae = ray.get(ae_ref)
        mask = pa.array(
            [m in ae or c in ae
             for m, c in zip(b["mention_iri"].to_pylist(),
                             b["candidate_iri"].to_pylist())], pa.bool_())
        return b.filter(mask)

    def to_edges(b: pa.Table) -> pa.Table:
        return pa.table({"a": b["mention_iri"].cast(pa.string()),
                         "b": b["candidate_iri"].cast(pa.string())})

    re_edges = (kept_links.map_batches(touches_affected,
                                       batch_format="pyarrow")
                .union(new_links)
                .map_batches(to_edges, batch_format="pyarrow",
                             zero_copy_batch=True))
    recomputed = connected_components(re_edges, max_rounds=max_rounds)

    def untouched(b: pa.Table) -> pa.Table:
        ar = ray.get(ar_ref)
        mask = pa.array([r not in ar for r in b["root_id"].to_pylist()],
                        pa.bool_())
        return b.filter(mask)

    base = prior_map.map_batches(untouched, batch_format="pyarrow")
    fix = lambda b: pa.table({
        "entity_id": b["entity_id"].cast(pa.string()),
        "root_id": b["root_id"].cast(pa.string())})
    out = (base.map_batches(fix, batch_format="pyarrow")
           .union(recomputed.map_batches(fix, batch_format="pyarrow")))
    if return_affected:
        # the increment-bounded entity set whose canonical mapping MAY
        # have changed (affected component members + increment
        # endpoints + their prior roots) — the write-invalidation key
        # set for incremental_materialize
        return out, aent | aroots
    return out
