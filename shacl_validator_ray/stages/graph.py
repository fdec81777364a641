"""Iterative graph analytics over the extracted KG (SURVEY §2 extension).

PageRank as fixed-iteration power iteration, Ray-Data-first: every round
is two bucketed shuffles — (1) current ranks hash-join the out-degree-
annotated edge list on the source node (union-tag + bucketed merge, the
engine's J1 formulation), (2) contributions reduce by destination — plus
one broadcast-free merge back onto the node universe. The rank vector
and the edge list live in the (distributed, spillable) object store;
nothing node- or edge-scale touches the driver. By default dangling-node
mass is NOT redistributed (the oracle applies the same rule), so ranks
sum to < 1 when sinks exist; ``redistribute_dangling=True`` teleports
sink mass uniformly each round (D_t is a one-float streaming aggregate)
so ranks sum to 1.

Companion to the non-iterative graph ops already in the engine
(connected components via union-find in stages/canonicalize.py, heavy-
hitter hub detection in stages/materialize.py).
"""

from __future__ import annotations

import numpy as np
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


def _canonical_edges(edges: rd.Dataset, src: str, dst: str,
                     n_buckets: int, k: int) -> rd.Dataset:
    """Distinct undirected simple edges as canonical (a < b) pairs,
    self-loops dropped — the shared front door of triangle_count,
    kcore and label_propagation. One bucketed dedup shuffle; the
    result is materialized (every caller reads it more than once)."""

    def canon(b: pa.Table) -> pa.Table:
        a = b[src].cast(pa.string())
        d = b[dst].cast(pa.string())
        lo = pc.min_element_wise(a, d)
        hi = pc.max_element_wise(a, d)
        t = pa.table({"a": lo, "b": hi})
        return t.filter(pc.not_equal(t["a"], t["b"]))

    def dedup_bucket(g: pd.DataFrame) -> pd.DataFrame:
        return g.drop_duplicates(["a", "b"])

    return _coalesce(bucketed_block_apply(
        edges.map_batches(canon, batch_format="pyarrow",
                          zero_copy_batch=True),
        "a", dedup_bucket, n_buckets=n_buckets), k).materialize()


def pagerank(edges: rd.Dataset, iters: int = 5, damping: float = 0.85,
             src: str = "src", dst: str = "dst",
             n_buckets: int | None = None,
             redistribute_dangling: bool = False,
             seeds=None) -> rd.Dataset:
    """(src, dst) edge Dataset → (node, rank) after ``iters`` rounds.

    rank_0 = 1/N; rank_{t+1}(v) = (1-d)/N + d · Σ_{(u,v)∈E} rank_t(u)/deg(u).

    With ``redistribute_dangling`` the mass parked on sink nodes is
    teleported uniformly each round (rank_{t+1} gains d·D_t/N where
    D_t = Σ rank_t over out-degree-0 nodes), so ranks sum to 1. With
    ``seeds`` the walk is PERSONALIZED: restart mass goes to the seed
    set instead of uniformly (r_0 = s, rank_{t+1}(v) = (1-d)·s(v) +
    d·Σ contributions, s(v) = 1/|S| on seeds else 0 — the random walk
    with restart used for seed-relative relevance). Seeds are a small
    broadcast set; the per-node restart mass rides the node table, so
    the iteration shape is unchanged. The
    dangling flag is computed ONCE (one extra setup shuffle: universe
    anti-join distinct sources) and rides the rank vector; D_t itself
    is a single-float streaming aggregate per round — nothing
    node-scale reaches the driver."""
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

    if redistribute_dangling:
        # dangling = universe node with no outgoing edge: bucketed
        # anti-join of the node universe against distinct sources
        def mark_bucket(g: pd.DataFrame) -> pd.DataFrame:
            has_src = set(g.loc[g["is_src"], "node"])
            un = g.loc[~g["is_src"]]
            return pd.DataFrame({
                "node": un["node"],
                "dangling": [n not in has_src for n in un["node"]]})

        srcs = e.map_batches(
            lambda b: pa.table({
                "node": b[src].cast(pa.string()),
                "is_src": pa.nulls(b.num_rows, pa.bool_()).fill_null(True)}),
            batch_format="pyarrow")
        univ = nodes.map_batches(
            lambda b: pa.table({
                "node": b["node"].cast(pa.string()),
                "is_src": pa.nulls(b.num_rows, pa.bool_()).fill_null(False)}),
            batch_format="pyarrow")
        nodes = _coalesce(bucketed_block_apply(
            _coalesce(srcs.union(univ), k), "node", mark_bucket,
            n_buckets=n_buckets), k).materialize()
    else:
        nodes = nodes.map_batches(
            lambda b: b.append_column(
                "dangling", pa.nulls(b.num_rows, pa.bool_()).fill_null(False)),
            batch_format="pyarrow").materialize()

    if seeds is not None:
        # with redistribute_dangling, sink mass teleports to the SEED
        # set (weighted by s(v)) instead of uniformly — the standard
        # personalized-walk dangling rule
        import ray as _ray

        seed_set = frozenset(str(s) for s in seeds)
        if not seed_set:
            raise ValueError("seeds must be non-empty")
        sm_ref = _ray.put((seed_set, 1.0 / len(seed_set)))

        def with_sm(b: pa.Table) -> pa.Table:
            ss, w = _ray.get(sm_ref)
            return b.append_column("sm", pa.array(
                [w if n in ss else 0.0 for n in b["node"].to_pylist()],
                pa.float64()))

        nodes = nodes.map_batches(with_sm,
                                  batch_format="pyarrow").materialize()
    else:
        nodes = nodes.map_batches(
            lambda b: b.append_column(
                "sm", pa.nulls(b.num_rows, pa.float64()).fill_null(0.0)),
            batch_format="pyarrow").materialize()

    ranks = nodes.map_batches(
        lambda b: b.append_column(
            "rank", b["sm"].cast(pa.float64()) if seeds is not None
            else pa.nulls(b.num_rows, pa.float64()).fill_null(init)),
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

    def make_sum_apply(row_base: float):
        def sum_apply_merge(g: pd.DataFrame) -> pd.DataFrame:
            """Fused reduce+apply (both keyed by the destination node):
            sum the bucket's contributions per node, then produce the
            new rank for every universe node in the bucket — one shuffle
            instead of two per iteration. ``row_base`` folds in this
            round's share of redistributed dangling mass."""
            ns = g.loc[g["c"].isna(), ["node", "dangling", "sm"]]
            cs = g.loc[~g["c"].isna(), ["node", "c"]]
            sums = (cs.groupby("node", sort=False)["c"].sum()
                    if len(cs) else None)
            m = ns.merge(sums.reset_index(), on="node", how="left") \
                if sums is not None else ns.assign(c=0.0)
            # seeds: base = s(v)·((1-d) + d·D_t) — restart mass plus
            # this round's dangling teleport, both proportional to s(v)
            per_node_base = (m["sm"] * row_base
                             if seeds is not None else row_base)
            return pd.DataFrame({
                "node": m["node"], "dangling": m["dangling"],
                "sm": m["sm"],
                "rank": per_node_base + damping * m["c"].fillna(0.0)})
        return sum_apply_merge

    for _ in range(iters):
        row_base = (1.0 - damping) if seeds is not None else base
        if redistribute_dangling:
            # D_t: one float off a streaming aggregate over the pinned
            # rank vector (the vector itself never leaves the cluster)
            d_mass = ranks.map_batches(
                lambda b: pa.table({"s": pa.array(
                    [pc.sum(pc.if_else(b["dangling"],
                                       b["rank"].cast(pa.float64()),
                                       0.0)).as_py() or 0.0],
                    pa.float64())}),
                batch_format="pyarrow").sum("s") or 0.0
            if seeds is not None:
                row_base = (1.0 - damping) + damping * d_mass
            else:
                row_base = base + damping * d_mass / n_nodes
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
                                "dangling": b["dangling"].cast(pa.bool_()),
                                "sm": b["sm"].cast(pa.float64()),
                                "c": pa.nulls(b.num_rows, pa.float64())}),
            batch_format="pyarrow")
        tagged_c = contrib.map_batches(
            lambda b: pa.table({"node": b["dst_"].cast(pa.string()),
                                "dangling": pa.nulls(
                                    b.num_rows, pa.bool_()).fill_null(False),
                                "sm": pa.nulls(
                                    b.num_rows, pa.float64()).fill_null(0.0),
                                "c": b["c"].cast(pa.float64())})
            if b.num_rows else pa.table(
                {"node": pa.array([], pa.string()),
                 "dangling": pa.array([], pa.bool_()),
                 "sm": pa.array([], pa.float64()),
                 "c": pa.array([], pa.float64())}),
            batch_format="pyarrow")
        ranks = bucketed_block_apply(
            _coalesce(tagged_n.union(tagged_c), k), "node",
            make_sum_apply(row_base), n_buckets=n_buckets)
        # iterative: each round's vector is the next round's input —
        # pin it (at 100 TB this is the per-iteration checkpoint)
        ranks = _coalesce(ranks, k).materialize()

    return ranks.map_batches(
        lambda b: pa.table({"node": b["node"].cast(pa.string()),
                            "rank": pc.round(b["rank"].cast(pa.float64()),
                                             6)}),
        batch_format="pyarrow")


def triangle_count(edges: rd.Dataset, src: str = "src", dst: str = "dst",
                   n_buckets: int | None = None) -> rd.Dataset:
    """Exact global triangle count over the undirected simple graph of
    ``edges`` — one row ``{n_triangles}``.

    Degree-ordered orientation (the standard skew bound): each
    undirected edge {a,b} is directed from the (degree, node)-smaller
    endpoint, so every out-neighborhood is O(√m) and the wedge
    self-join never explodes on hubs — a million-degree hub oriented by
    node id alone would emit ~10^12 wedges; ordered by degree it emits
    none. Stages (all bucketed shuffles, nothing graph-scale on the
    driver): canonical distinct edges → degree count → orient →
    per-source wedge self-join → close wedges against the canonical
    edge set → scalar sum."""
    from ..sources import io as io_mod

    if n_buckets is None:
        n_buckets = max(8, io_mod.shuffle_buckets() // 4)
    k = n_buckets

    one_row = lambda n: rd.from_arrow(  # noqa: E731
        pa.table({"n_triangles": pa.array([n], pa.int64())}))

    e = _canonical_edges(edges, src, dst, n_buckets, k)
    if e.count() == 0:
        return one_row(0)

    # degree per node (each canonical pair hits both endpoints)
    def endpoints(b: pa.Table) -> pa.Table:
        return pa.table({"node": pa.concat_arrays(
            [b["a"].cast(pa.string()).combine_chunks(),
             b["b"].cast(pa.string()).combine_chunks()])})

    def count_bucket(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby("node", sort=False).size().rename("deg") \
            .reset_index()

    deg = _coalesce(bucketed_block_apply(
        e.map_batches(endpoints, batch_format="pyarrow",
                      zero_copy_batch=True),
        "node", count_bucket, n_buckets=n_buckets), k).materialize()

    # orient by (deg, node): two union-tag bucketed merges, one per
    # endpoint (deg rows carry a=0-sentinel "" side markers)
    def attach(e_ds: rd.Dataset, cols: list[str], key_col: str,
               out_col: str) -> rd.Dataset:
        tagged_e = e_ds.map_batches(
            lambda b: pa.table({
                "node": b[key_col].cast(pa.string()),
                **{c: b[c].cast(pa.string()) for c in cols},
                "deg": pa.nulls(b.num_rows, pa.int64())}),
            batch_format="pyarrow")
        tagged_d = deg.map_batches(
            lambda b: pa.table({
                "node": b["node"].cast(pa.string()),
                **{c: pa.nulls(b.num_rows, pa.string()).fill_null("")
                   for c in cols},
                "deg": b["deg"].cast(pa.int64())}),
            batch_format="pyarrow")

        def merge_bucket(g: pd.DataFrame) -> pd.DataFrame:
            es = g.loc[g["deg"].isna()].drop(columns=["deg"])
            ds_ = g.loc[~g["deg"].isna(), ["node", "deg"]]
            m = es.merge(ds_, on="node")
            return m.drop(columns=["node"]).rename(columns={"deg": out_col})

        return _coalesce(bucketed_block_apply(
            _coalesce(tagged_e.union(tagged_d), k), "node", merge_bucket,
            n_buckets=n_buckets), k)

    e2 = attach(e, ["a", "b"], "a", "deg_a")
    e2 = attach(e2, ["a", "b", "deg_a"], "b", "deg_b").materialize()

    def orient(b: pa.Table) -> pa.Table:
        df = b.to_pandas()
        da = df["deg_a"].astype("int64")
        db = df["deg_b"].astype("int64")
        fwd = (da < db) | ((da == db) & (df["a"] < df["b"]))
        return pa.table({
            "u": pa.array(df["a"].where(fwd, df["b"]), pa.string()),
            "v": pa.array(df["b"].where(fwd, df["a"]), pa.string())})

    o = e2.map_batches(orient, batch_format="pyarrow").materialize()

    # wedges: per-source cross pairs of out-neighbors, canonicalized
    def wedge_bucket(g: pd.DataFrame) -> pd.DataFrame:
        m = g.merge(g, on="u")
        m = m[m["v_x"] < m["v_y"]]
        if not len(m):
            return pd.DataFrame({"a": pd.Series(dtype=object),
                                 "b": pd.Series(dtype=object),
                                 "w": pd.Series(dtype="int64")})
        return (m.groupby(["v_x", "v_y"], sort=False).size()
                .rename("w").reset_index()
                .rename(columns={"v_x": "a", "v_y": "b"}))

    wedges = bucketed_block_apply(o, "u", wedge_bucket,
                                  n_buckets=n_buckets)

    # close: wedge (a,b) is already canonical (a<b) — membership
    # semi-join against the canonical edge set, keyed on the FULL pair
    # "a|b" rather than a alone: wedge counts concentrate on the
    # (degree, node)-minimal endpoints (every wedge's a is a canonical
    # min), so an a-keyed shuffle skews; the pair key hashes uniformly
    # and still co-locates each wedge with its closing edge exactly
    def pair_key(b: pa.Table, a_col: str = "a", b_col: str = "b"):
        return pc.binary_join_element_wise(
            b[a_col].cast(pa.string()), b[b_col].cast(pa.string()), "|")

    tagged_w = wedges.map_batches(
        lambda b: pa.table({"ab": pair_key(b),
                            "w": b["w"].cast(pa.int64())})
        if b.num_rows else pa.table({"ab": pa.array([], pa.string()),
                                     "w": pa.array([], pa.int64())}),
        batch_format="pyarrow")
    tagged_e = e.map_batches(
        lambda b: pa.table({"ab": pair_key(b),
                            "w": pa.nulls(b.num_rows, pa.int64())}),
        batch_format="pyarrow")

    def close_bucket(g: pd.DataFrame) -> pd.DataFrame:
        ws = g.loc[~g["w"].isna()]
        es = g.loc[g["w"].isna(), ["ab"]]
        m = ws.merge(es, on="ab")
        return pd.DataFrame({"n": [int(m["w"].sum())]})

    parts = bucketed_block_apply(
        _coalesce(tagged_w.union(tagged_e), k), "ab", close_bucket,
        n_buckets=n_buckets)
    total = parts.sum("n")
    return one_row(int(total or 0))


def kcore(edges: rd.Dataset, k: int = 2, max_rounds: int = 8,
          src: str = "src", dst: str = "dst",
          n_buckets: int | None = None) -> rd.Dataset:
    """k-core decomposition by iterative peeling: repeatedly drop every
    edge with an endpoint of degree < k until fixpoint. Returns the
    surviving (node, deg) table — every node in the k-core with its
    degree inside the core.

    Each round is three bucketed shuffles (degree count + one
    degree-attach per endpoint — the same union-tag merge the triangle
    counter uses) over a MONOTONICALLY SHRINKING edge set; fixpoint is
    detected with the free row count of the per-round materialized
    checkpoint (the per-iteration spill point at 10^12 edges).
    ``max_rounds`` bounds cost on adversarially deep peeling chains; a
    loud RuntimeWarning fires if the loop exhausts rounds before
    fixpoint (matching the path-closure convention in stages/shacl.py).
    """
    import warnings

    from ..sources import io as io_mod

    if n_buckets is None:
        n_buckets = max(8, io_mod.shuffle_buckets() // 4)
    kb = n_buckets

    e = _canonical_edges(edges, src, dst, n_buckets, kb)

    def endpoints(b: pa.Table) -> pa.Table:
        return pa.table({"node": pa.concat_arrays(
            [b["a"].cast(pa.string()).combine_chunks(),
             b["b"].cast(pa.string()).combine_chunks()])})

    def count_bucket(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby("node", sort=False).size().rename("deg") \
            .reset_index()

    def degrees(e_ds: rd.Dataset) -> rd.Dataset:
        return _coalesce(bucketed_block_apply(
            e_ds.map_batches(endpoints, batch_format="pyarrow",
                             zero_copy_batch=True),
            "node", count_bucket, n_buckets=n_buckets), kb).materialize()

    def attach(e_ds: rd.Dataset, deg: rd.Dataset, cols: list[str],
               key_col: str, out_col: str) -> rd.Dataset:
        tagged_e = e_ds.map_batches(
            lambda b: pa.table({
                "node": b[key_col].cast(pa.string()),
                **{c: b[c].cast(pa.string()) for c in cols},
                "deg": pa.nulls(b.num_rows, pa.int64())}),
            batch_format="pyarrow")
        tagged_d = deg.map_batches(
            lambda b: pa.table({
                "node": b["node"].cast(pa.string()),
                **{c: pa.nulls(b.num_rows, pa.string()).fill_null("")
                   for c in cols},
                "deg": b["deg"].cast(pa.int64())}),
            batch_format="pyarrow")

        def merge_bucket(g: pd.DataFrame) -> pd.DataFrame:
            es = g.loc[g["deg"].isna()].drop(columns=["deg"])
            ds_ = g.loc[~g["deg"].isna(), ["node", "deg"]]
            m = es.merge(ds_, on="node")
            return m.drop(columns=["node"]).rename(columns={"deg": out_col})

        return _coalesce(bucketed_block_apply(
            _coalesce(tagged_e.union(tagged_d), kb), "node", merge_bucket,
            n_buckets=n_buckets), kb)

    n_edges = e.count()
    deg = degrees(e)
    converged = n_edges == 0
    for _ in range(max_rounds):
        if converged:
            break
        e2 = attach(e, deg, ["a", "b"], "a", "deg_a")
        e2 = attach(e2, deg, ["a", "b", "deg_a"], "b", "deg_b")

        def keep(b: pa.Table) -> pa.Table:
            m = pc.and_(
                pc.greater_equal(b["deg_a"].cast(pa.int64()), k),
                pc.greater_equal(b["deg_b"].cast(pa.int64()), k))
            f = b.filter(m)
            return pa.table({"a": f["a"].cast(pa.string()),
                             "b": f["b"].cast(pa.string())})

        e = _coalesce(e2.map_batches(keep, batch_format="pyarrow"),
                      kb).materialize()
        n2 = e.count()
        if n2 == n_edges or n2 == 0:
            converged = True
        n_edges = n2
        deg = degrees(e)
    if not converged:
        warnings.warn(
            f"kcore: edge set still shrinking after {max_rounds} peeling "
            f"rounds — result is an over-approximation of the {k}-core; "
            f"raise max_rounds", RuntimeWarning, stacklevel=2)

    return deg.map_batches(
        lambda b: pa.table({"node": b["node"].cast(pa.string()),
                            "deg": b["deg"].cast(pa.int64())}),
        batch_format="pyarrow")


def label_propagation(edges: rd.Dataset, rounds: int = 3,
                      src: str = "src", dst: str = "dst",
                      n_buckets: int | None = None) -> rd.Dataset:
    """Community detection by SEMI-SYNCHRONOUS label propagation with a
    deterministic update rule: every round, each node adopts the most
    frequent label among its neighbors (ties → smallest label). Fixed
    ``rounds`` (the oracle unrolls the identical rule), initial label =
    own id. Returns (node, label).

    Scale shape per round: one bucketed merge keyed on the NEIGHBOR
    (labels ride to adjacency rows) + one reduce keyed on the node
    (vectorized pandas mode with the deterministic tie-break) — the
    label vector is materialized per round as the iteration checkpoint,
    exactly like the PageRank rank vector."""
    from ..sources import io as io_mod

    if n_buckets is None:
        n_buckets = max(8, io_mod.shuffle_buckets() // 4)
    kb = n_buckets

    e = _canonical_edges(edges, src, dst, n_buckets, kb)

    # symmetric adjacency keyed by the NEIGHBOR (labels merge on nbr)
    def to_adj(b: pa.Table) -> pa.Table:
        a = b["a"].cast(pa.string()).combine_chunks()
        d = b["b"].cast(pa.string()).combine_chunks()
        return pa.table({"node": pa.concat_arrays([a, d]),
                         "nbr": pa.concat_arrays([d, a])})

    adj = _coalesce(e.map_batches(to_adj, batch_format="pyarrow"),
                    kb).materialize()

    def distinct_bucket(g: pd.DataFrame) -> pd.DataFrame:
        return g.drop_duplicates(["node"])

    labels = _coalesce(bucketed_block_apply(
        adj.map_batches(lambda b: pa.table({"node": b["node"]}),
                        batch_format="pyarrow", zero_copy_batch=True),
        "node", distinct_bucket, n_buckets=n_buckets), kb).map_batches(
        lambda b: pa.table({"node": b["node"],
                            "label": b["node"]}),
        batch_format="pyarrow").materialize()

    for _ in range(rounds):
        # labels ride to adjacency rows via a bucketed merge on nbr
        tagged_a = adj.map_batches(
            lambda b: pa.table({"nbr": b["nbr"].cast(pa.string()),
                                "node": b["node"].cast(pa.string()),
                                "label": pa.nulls(b.num_rows, pa.string())}),
            batch_format="pyarrow")
        tagged_l = labels.map_batches(
            lambda b: pa.table({"nbr": b["node"].cast(pa.string()),
                                "node": pa.nulls(b.num_rows, pa.string()),
                                "label": b["label"].cast(pa.string())}),
            batch_format="pyarrow")

        def carry(g: pd.DataFrame) -> pd.DataFrame:
            ad = g.loc[g["label"].isna(), ["nbr", "node"]]
            lb = g.loc[~g["label"].isna(), ["nbr", "label"]]
            m = ad.merge(lb, on="nbr")
            return m[["node", "label"]] if len(m) else pd.DataFrame(
                {"node": pd.Series(dtype=object),
                 "label": pd.Series(dtype=object)})

        msgs = bucketed_block_apply(
            _coalesce(tagged_a.union(tagged_l), kb), "nbr", carry,
            n_buckets=n_buckets)

        def adopt(g: pd.DataFrame) -> pd.DataFrame:
            c = (g.groupby(["node", "label"], sort=False).size()
                 .rename("c").reset_index()
                 .sort_values(["node", "c", "label"],
                              ascending=[True, False, True]))
            top = c.groupby("node", sort=False).first().reset_index()
            return top[["node", "label"]]

        labels = _coalesce(bucketed_block_apply(
            _coalesce(msgs, kb), "node", adopt, n_buckets=n_buckets),
            kb).materialize()

    return labels.map_batches(
        lambda b: pa.table({"node": b["node"].cast(pa.string()),
                            "label": b["label"].cast(pa.string())}),
        batch_format="pyarrow")


def shared_attribute_pairs(triples: rd.Dataset, pred: str,
                           min_shared: int = 2,
                           hot_cap: int = 10_000,
                           n_buckets: int | None = None) -> rd.Dataset:
    """Set-similarity self-join: pairs of subjects sharing at least
    ``min_shared`` values of ``pred`` (e.g. datasets sharing ≥2
    themes). Classic inverted-index plan: one shuffle keyed on the
    VALUE co-locates its subject list, per-value pairs are emitted
    bucket-locally, and a (a, b) pair-keyed count keeps pairs reaching
    the threshold.

    Per-value pair emission is quadratic in that value's subject list —
    the hot-attribute hazard. ``hot_cap`` bounds it: values held by
    more than ``hot_cap`` subjects are skipped with a loud
    RuntimeWarning (a value shared by everyone carries no similarity
    signal anyway — the same reasoning as the hub handling in
    stages/materialize.py)."""
    import warnings

    from ..sources import io as io_mod

    if n_buckets is None:
        n_buckets = max(8, io_mod.shuffle_buckets() // 4)
    kb = n_buckets

    def project(b: pa.Table) -> pa.Table:
        f = b.filter(pc.equal(b["pred"], pred))
        return pa.table({"subj": f["subj"].cast(pa.string()),
                         "val": f["obj_value"].cast(pa.string())})

    sv = _coalesce(triples.map_batches(project, batch_format="pyarrow",
                                       zero_copy_batch=True),
                   kb)

    def dedup_bucket(g: pd.DataFrame) -> pd.DataFrame:
        return g.drop_duplicates(["subj", "val"])

    sv = _coalesce(bucketed_block_apply(sv, "val", dedup_bucket,
                                        n_buckets=n_buckets),
                   kb).materialize()

    def pairs_bucket(g: pd.DataFrame) -> pd.DataFrame:
        outs = []
        for val, sub in g.groupby("val", sort=False):
            subs = sub["subj"].sort_values().to_numpy()
            if len(subs) > hot_cap:  # excluded; counted driver-side below
                continue
            if len(subs) < 2:
                continue
            iu, ju = np.triu_indices(len(subs), k=1)
            outs.append(pd.DataFrame({"a": subs[iu], "b": subs[ju]}))
        if not outs:
            return pd.DataFrame({"a": pd.Series(dtype=object),
                                 "b": pd.Series(dtype=object)})
        return pd.concat(outs, ignore_index=True)

    # driver-side hot check on the small per-value count table
    vc = sv.groupby("val").count().filter(
        lambda r: r["count()"] > hot_cap).count()
    if vc:
        warnings.warn(
            f"shared_attribute_pairs: {vc} value(s) of {pred} exceed "
            f"hot_cap={hot_cap} subjects and are excluded from pair "
            f"generation", RuntimeWarning, stacklevel=2)

    pairs = bucketed_block_apply(sv, "val", pairs_bucket,
                                 n_buckets=n_buckets)

    def count_bucket(g: pd.DataFrame) -> pd.DataFrame:
        c = (g.groupby(["a", "b"], sort=False).size().rename("n_shared")
             .reset_index())
        return c[c["n_shared"] >= min_shared]

    def pair_key(b: pa.Table) -> pa.Table:
        if not b.num_rows:
            return pa.table({"a": pa.array([], pa.string()),
                             "b": pa.array([], pa.string()),
                             "ab": pa.array([], pa.string())})
        return b.append_column(
            "ab", pc.binary_join_element_wise(
                b["a"].cast(pa.string()), b["b"].cast(pa.string()), "|"))

    out = bucketed_block_apply(
        _coalesce(pairs.map_batches(pair_key, batch_format="pyarrow"), kb),
        "ab", lambda g: count_bucket(g.drop(columns=["ab"])),
        n_buckets=n_buckets)
    return out.map_batches(
        lambda b: pa.table({"a": b["a"].cast(pa.string()),
                            "b": b["b"].cast(pa.string()),
                            "n_shared": b["n_shared"].cast(pa.int64())})
        if b.num_rows else pa.table({"a": pa.array([], pa.string()),
                                     "b": pa.array([], pa.string()),
                                     "n_shared": pa.array([], pa.int64())}),
        batch_format="pyarrow")


def bfs_hops(edges: rd.Dataset, sources: rd.Dataset, rounds: int = 3,
             src: str = "src", dst: str = "dst",
             n_buckets: int | None = None) -> rd.Dataset:
    """Single-source-set BFS hop distances over a DIRECTED edge list:
    (node, d) for every node reachable from ``sources`` within
    ``rounds`` hops (d = minimum hop count; sources are d=0).

    Frontier expansion as iterative relax-and-min: each round the
    current distance vector rides a src-keyed bucketed merge onto the
    edges (neighbors receive d+1) and a node-keyed min-combine folds
    them into the vector — the same two-shuffle-per-round shape as
    PageRank, with the vector materialized per round as the iteration
    checkpoint. The oracle unrolls identical rounds."""
    from ..sources import io as io_mod

    if n_buckets is None:
        n_buckets = max(8, io_mod.shuffle_buckets() // 4)
    kb = n_buckets

    def dedup_bucket(g: pd.DataFrame) -> pd.DataFrame:
        return g.drop_duplicates(["a", "b"])

    e = _coalesce(bucketed_block_apply(
        edges.map_batches(
            lambda b: pa.table({"a": b[src].cast(pa.string()),
                                "b": b[dst].cast(pa.string())}),
            batch_format="pyarrow", zero_copy_batch=True),
        "a", dedup_bucket, n_buckets=n_buckets), kb).materialize()

    dist = _coalesce(sources.map_batches(
        lambda b: pa.table({"node": b["node"].cast(pa.string()),
                            "d": pa.nulls(b.num_rows,
                                          pa.int64()).fill_null(0)}),
        batch_format="pyarrow"), kb).materialize()

    for _ in range(rounds):
        tagged_d = dist.map_batches(
            lambda b: pa.table({"a": b["node"].cast(pa.string()),
                                "b": pa.nulls(b.num_rows, pa.string()),
                                "d": b["d"].cast(pa.int64())}),
            batch_format="pyarrow")
        tagged_e = e.map_batches(
            lambda b: pa.table({"a": b["a"].cast(pa.string()),
                                "b": b["b"].cast(pa.string()),
                                "d": pa.nulls(b.num_rows, pa.int64())}),
            batch_format="pyarrow")

        def relax(g: pd.DataFrame) -> pd.DataFrame:
            ds_ = g.loc[g["b"].isna(), ["a", "d"]]
            es_ = g.loc[~g["b"].isna(), ["a", "b"]]
            m = es_.merge(ds_, on="a")
            out = pd.DataFrame({"node": m["b"], "d": m["d"] + 1})
            cur = g.loc[g["b"].isna()].rename(columns={"a": "node"})
            return pd.concat([cur[["node", "d"]], out], ignore_index=True)

        msgs = bucketed_block_apply(
            _coalesce(tagged_d.union(tagged_e), kb), "a", relax,
            n_buckets=n_buckets)

        def min_bucket(g: pd.DataFrame) -> pd.DataFrame:
            return g.groupby("node", sort=False)["d"].min().reset_index()

        dist = _coalesce(bucketed_block_apply(
            _coalesce(msgs, kb), "node", min_bucket,
            n_buckets=n_buckets), kb).materialize()

    return dist.map_batches(
        lambda b: pa.table({"node": b["node"].cast(pa.string()),
                            "d": b["d"].cast(pa.int64())}),
        batch_format="pyarrow")
