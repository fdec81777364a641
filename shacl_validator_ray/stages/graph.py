"""Iterative graph analytics over the extracted KG (SURVEY §2 extension).

PageRank as fixed-iteration power iteration, Ray-Data-first: every round
is two bucketed shuffles — (1) current ranks hash-join the out-degree-
annotated edge list on the source node (union-tag + bucketed merge, the
engine's J1 formulation), (2) contributions reduce by destination — plus
one broadcast-free merge back onto the node universe. The rank vector
and the edge list live in the (distributed, spillable) object store;
nothing node- or edge-scale touches the driver. Dangling-node mass is
NOT redistributed (documented; the oracle applies the same rule), so
ranks sum to < 1 when sinks exist.

Companion to the non-iterative graph ops already in the engine
(connected components via union-find in stages/canonicalize.py, heavy-
hitter hub detection in stages/materialize.py).
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from .discovery import bucketed_block_apply


def _coalesce(ds: rd.Dataset, k: int) -> rd.Dataset:
    """Arrow-normalize + coalesce: Ray's sort-groupby pays per
    (input block × partition), and repartition refuses mixed
    Arrow/pandas block unions."""
    return ds.map_batches(lambda b: b, batch_format="pyarrow",
                          zero_copy_batch=True).repartition(k)


def pagerank(edges: rd.Dataset, iters: int = 5, damping: float = 0.85,
             src: str = "src", dst: str = "dst",
             n_buckets: int | None = None) -> rd.Dataset:
    """(src, dst) edge Dataset → (node, rank) after ``iters`` rounds.

    rank_0 = 1/N; rank_{t+1}(v) = (1-d)/N + d · Σ_{(u,v)∈E} rank_t(u)/deg(u).
    """
    from ..sources import io as io_mod

    if n_buckets is None:
        # quarter of the global fan-out: PageRank runs 2 shuffles per
        # iteration, and Ray's sort pays per (block × partition) — the
        # target still scales with the cluster
        n_buckets = max(8, io_mod.shuffle_buckets() // 4)
    k = n_buckets

    # distinct edges (set semantics like the quad store)
    def dedup_bucket(g: pd.DataFrame) -> pd.DataFrame:
        return g.drop_duplicates([src, dst])

    e = bucketed_block_apply(
        edges.map_batches(
            lambda b: pa.table({src: b[src].cast(pa.string()),
                                dst: b[dst].cast(pa.string())}),
            batch_format="pyarrow", zero_copy_batch=True),
        src, dedup_bucket, n_buckets=n_buckets)
    e = _coalesce(e, k).materialize()

    # out-degree annotation: per-src count inside the same bucketing
    def with_deg(g: pd.DataFrame) -> pd.DataFrame:
        g = g.copy()
        g["outdeg"] = g.groupby(src)[dst].transform("count")
        return g

    e_deg = _coalesce(bucketed_block_apply(e, src, with_deg,
                                           n_buckets=n_buckets),
                      k).materialize()

    # node universe = distinct src ∪ dst
    def node_rows(b: pa.Table) -> pa.Table:
        return pa.table({"node": pa.concat_arrays(
            [b[src].cast(pa.string()).combine_chunks(),
             b[dst].cast(pa.string()).combine_chunks()])})

    def distinct_bucket(g: pd.DataFrame) -> pd.DataFrame:
        return g.drop_duplicates(["node"])

    nodes = _coalesce(bucketed_block_apply(
        e.map_batches(node_rows, batch_format="pyarrow",
                      zero_copy_batch=True),
        "node", distinct_bucket, n_buckets=n_buckets), k).materialize()
    n_nodes = nodes.count()
    if n_nodes == 0:
        return rd.from_arrow(pa.table({"node": pa.array([], pa.string()),
                                       "rank": pa.array([], pa.float64())}))
    base = (1.0 - damping) / n_nodes
    init = 1.0 / n_nodes

    ranks = nodes.map_batches(
        lambda b: b.append_column("rank",
                                  pa.nulls(b.num_rows,
                                           pa.float64()).fill_null(init)),
        batch_format="pyarrow").materialize()

    def contrib_merge(g: pd.DataFrame) -> pd.DataFrame:
        """ranks ⨝ edges on the source node → (dst, contribution)."""
        rs = g.loc[g[dst] == "", ["node", "rank"]]
        es = g.loc[g[dst] != "", ["node", dst, "outdeg"]]
        m = es.merge(rs, on="node")
        if not len(m):
            return pd.DataFrame({"dst_": pd.Series(dtype=object),
                                 "c": pd.Series(dtype="float64")})
        return pd.DataFrame({"dst_": m[dst],
                             "c": m["rank"] / m["outdeg"]})

    def sum_apply_merge(g: pd.DataFrame) -> pd.DataFrame:
        """Fused reduce+apply (both keyed by the destination node): sum
        the bucket's contributions per node, then produce the new rank
        for every universe node in the bucket — one shuffle instead of
        two per iteration."""
        ns = g.loc[g["c"].isna(), ["node"]]
        cs = g.loc[~g["c"].isna(), ["node", "c"]]
        sums = cs.groupby("node", sort=False)["c"].sum() if len(cs) else None
        m = ns.merge(sums.reset_index(), on="node", how="left") \
            if sums is not None else ns.assign(c=0.0)
        return pd.DataFrame({
            "node": m["node"],
            "rank": base + damping * m["c"].fillna(0.0)})

    for _ in range(iters):
        tagged_r = ranks.map_batches(
            lambda b: pa.table({
                "node": b["node"].cast(pa.string()),
                "rank": b["rank"].cast(pa.float64()),
                dst: pa.nulls(b.num_rows, pa.string()).fill_null(""),
                "outdeg": pa.nulls(b.num_rows, pa.int64()).fill_null(0)}),
            batch_format="pyarrow")
        tagged_e = e_deg.map_batches(
            lambda b: pa.table({
                "node": b[src].cast(pa.string()),
                "rank": pa.nulls(b.num_rows, pa.float64()).fill_null(0.0),
                dst: b[dst].cast(pa.string()),
                "outdeg": b["outdeg"].cast(pa.int64())}),
            batch_format="pyarrow")
        contrib = bucketed_block_apply(
            _coalesce(tagged_r.union(tagged_e), k), "node", contrib_merge,
            n_buckets=n_buckets)
        tagged_n = nodes.map_batches(
            lambda b: pa.table({"node": b["node"].cast(pa.string()),
                                "c": pa.nulls(b.num_rows, pa.float64())}),
            batch_format="pyarrow")
        tagged_c = contrib.map_batches(
            lambda b: pa.table({"node": b["dst_"].cast(pa.string()),
                                "c": b["c"].cast(pa.float64())})
            if b.num_rows else pa.table(
                {"node": pa.array([], pa.string()),
                 "c": pa.array([], pa.float64())}),
            batch_format="pyarrow")
        ranks = bucketed_block_apply(
            _coalesce(tagged_n.union(tagged_c), k), "node", sum_apply_merge,
            n_buckets=n_buckets)
        # iterative: each round's vector is the next round's input —
        # pin it (at 100 TB this is the per-iteration checkpoint)
        ranks = _coalesce(ranks, k).materialize()

    return ranks.map_batches(
        lambda b: pa.table({"node": b["node"].cast(pa.string()),
                            "rank": pc.round(b["rank"].cast(pa.float64()),
                                             6)}),
        batch_format="pyarrow")
