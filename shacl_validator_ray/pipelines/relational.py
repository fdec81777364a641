"""Relational operator pipelines over the driver's TPC-H-ish tables.

Each function implements one operator family from SURVEY.md §2 as an
idiomatic Ray Data pipeline (vectorized batch fns, broadcast small
sides, partial aggregation) and is paired with a DuckDB oracle in
``pipelines/queries.py``. Reference semantics cited per function.

Scale notes: small sides (customer, nation, region, distinct key sets)
are broadcast with ``ray.put`` once and read per worker — no shuffle;
the only all-to-all exchanges are the final small groupbys and sorts.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import ray
import ray.data as rd
from ray.data.aggregate import Count, Min, Sum


def t(sf_dir: str, name: str, columns: list[str] | None = None) -> rd.Dataset:
    from ..sources import io

    return io.read_table(f"{sf_dir}/{name}.parquet", columns=columns)


def _small(sf_dir: str, name: str, columns: list[str]) -> pa.Table:
    """Driver-side read of a small dimension table (broadcast side)."""
    return pq.read_table(f"{sf_dir}/{name}.parquet", columns=columns)


# --- A1 analog: severity partition counts (SHACLValidationService.ts:411-413) ---
def severity_counts(sf_dir: str):
    return (
        t(sf_dir, "lineitem", ["l_returnflag"])
        .groupby("l_returnflag")
        .aggregate(Count(alias_name="n"))
    )


# --- A4/A5 machinery: grouped sums (TPC-H Q1 shape), column-pruned read ---
def pruned_agg(sf_dir: str):
    ds = t(sf_dir, "lineitem",
           ["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice", "l_discount"])

    def revenue(b: pa.Table) -> pa.Table:
        rev = pc.multiply(b["l_extendedprice"], pc.subtract(pa.scalar(1.0), b["l_discount"]))
        return b.append_column("rev", rev)

    out = (
        ds.map_batches(revenue, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["l_returnflag", "l_linestatus"])
        .aggregate(
            Sum("l_quantity", alias_name="sum_qty"),
            Sum("rev", alias_name="sum_rev"),
            Count(alias_name="n"),
        )
    )

    def rnd(b: pa.Table) -> pa.Table:
        return b.set_column(b.column_names.index("sum_qty"), "sum_qty", pc.round(b["sum_qty"], 2)) \
                .set_column(b.column_names.index("sum_rev"), "sum_rev", pc.round(b["sum_rev"], 2))

    return out.map_batches(rnd, batch_format="pyarrow")


# --- statistical aggregates (Mean/Std over groups; A4-family breadth) ---
def stats_agg(sf_dir: str):
    from ray.data.aggregate import Mean, Std

    out = (t(sf_dir, "lineitem", ["l_returnflag", "l_quantity"])
           .groupby("l_returnflag")
           .aggregate(Mean("l_quantity", alias_name="avg_qty"),
                      Std("l_quantity", alias_name="std_qty"),
                      Count(alias_name="n")))

    def rnd(b: pa.Table) -> pa.Table:
        b = b.set_column(b.column_names.index("avg_qty"), "avg_qty",
                         pc.round(b["avg_qty"], 6))
        return b.set_column(b.column_names.index("std_qty"), "std_qty",
                            pc.round(b["std_qty"], 6))

    return out.map_batches(rnd, batch_format="pyarrow")


# --- M14: first-match property projection (DataDiscoveryService.ts:131-137) ---
def first_match(sf_dir: str):
    """Per-block keep-min combiner (vectorized drop_duplicates) → one
    bucketed merge with the same whole-bucket kernel — no per-group
    pandas (replaces a map_groups ``head(1)`` per customer)."""
    from ..stages.discovery import bucketed_block_apply

    ds = t(sf_dir, "orders", ["o_custkey", "o_orderkey", "o_orderdate"])

    def keep_min(df: pd.DataFrame) -> pd.DataFrame:
        return df.sort_values("o_orderkey", kind="mergesort").drop_duplicates(
            "o_custkey", keep="first")

    partial = ds.map_batches(keep_min, batch_format="pandas")
    merged = bucketed_block_apply(partial, "o_custkey", keep_min)
    return merged.map_batches(
        lambda b: b.select(["o_custkey", "o_orderdate"]).rename_columns(
            ["o_custkey", "first_orderdate"]),
        batch_format="pyarrow", zero_copy_batch=True)


# --- M15: multi-value property projection (DataDiscoveryService.ts:138-142) ---
def multi_value(sf_dir: str):
    """Per-block distinct-pair combiner → one bucketed merge whose
    kernel is a single pandas groupby-agg join across every customer in
    the bucket — no Ray-level per-group map_groups."""
    from ..stages.discovery import bucketed_block_apply

    ds = t(sf_dir, "orders", ["o_custkey", "o_orderpriority"])

    partial = ds.map_batches(lambda df: df.drop_duplicates(),
                             batch_format="pandas")

    def collect_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.drop_duplicates().sort_values(
            ["o_custkey", "o_orderpriority"])
        s = df.groupby("o_custkey", sort=False)["o_orderpriority"].agg(
            ",".join)
        return pd.DataFrame({"o_custkey": s.index.to_numpy(),
                             "priorities": s.to_numpy()})

    return bucketed_block_apply(partial, "o_custkey", collect_bucket)


# --- A5/O2: top-k by group count (ReportViewer.tsx:140-163) ---
def topk_brands(sf_dir: str):
    return (
        t(sf_dir, "part", ["p_brand"])
        .groupby("p_brand")
        .aggregate(Count(alias_name="n"))
        .sort(["n", "p_brand"], descending=[True, False])
        .limit(6)
    )


# --- A9/D4: distinct counts (ReportViewer.tsx:235-248) ---
def distinct_counts(sf_dir: str):
    """ONE pass over lineitem for all three exact distinct counts:
    per-batch local dedup (shrinks the shuffle) → (tag, value) distinct
    groupby → per-tag count. Replaces three full-scan ``unique()``
    executions that each materialized the distinct key list on the
    driver; here the driver sees only the 3-row final table. (The
    approximate swap at 10^12 scale is the mergeable HLL sketch in
    functions/sketch.py.)"""
    cols = {"parts": "l_partkey", "supps": "l_suppkey", "orders": "l_orderkey"}
    ds = t(sf_dir, "lineitem", list(cols.values()))

    def partials(b: pa.Table) -> pa.Table:
        outs = []
        for tag, col in cols.items():
            u = pc.unique(b[col]).cast(pa.int64())
            outs.append(pa.table({"tag": pa.array([tag] * len(u), pa.string()),
                                  "val": u}))
        return pa.concat_tables(outs)

    counts = (ds.map_batches(partials, batch_format="pyarrow",
                             zero_copy_batch=True)
              .groupby(["tag", "val"]).aggregate(Count(alias_name="c"))
              .groupby("tag").aggregate(Count(alias_name="n")))
    m = dict(zip(*(counts.to_pandas()[c] for c in ("tag", "n"))))
    return pd.DataFrame({"parts": [m.get("parts", 0)],
                         "supps": [m.get("supps", 0)],
                         "orders": [m.get("orders", 0)]})


# --- exact distributed quantiles WITHOUT a global sort (A-family
#     breadth): pass 1 = count/min/max; pass 2 = mergeable per-batch
#     histograms (4096 uniform buckets, driver sums 4096-int partials);
#     pass 3 = collect ONLY the rank-containing buckets (~n/4096 rows)
#     and select exactly. 3 scans of one numeric column vs an
#     all-to-all sort; matches DuckDB quantile_disc (rank ceil(q·n)−1,
#     verified empirically across n where candidate rules diverge). ---
def quantiles_qty(sf_dir: str, qs: tuple = (0.25, 0.5, 0.75),
                  n_buckets: int = 4096):
    import math

    ds = t(sf_dir, "lineitem", ["l_quantity"]).materialize()
    from ray.data.aggregate import Max as AMax, Min as AMin

    stats = ds.aggregate(AMin("l_quantity", alias_name="lo"),
                         AMax("l_quantity", alias_name="hi"),
                         Count(alias_name="n"))
    lo, hi, n = float(stats["lo"]), float(stats["hi"]), int(stats["n"])
    width = (hi - lo) / n_buckets or 1.0

    def hist(b: pa.Table) -> pa.Table:
        v = np.asarray(b["l_quantity"], dtype=np.float64)
        idx = np.clip(((v - lo) / width).astype(np.int64), 0, n_buckets - 1)
        return pa.table({"bucket": pa.array(np.arange(n_buckets, dtype=np.int64)),
                         "c": pa.array(np.bincount(idx, minlength=n_buckets)
                                       .astype(np.int64))})

    counts = np.zeros(n_buckets, dtype=np.int64)
    for b in ds.map_batches(hist, batch_format="pyarrow",
                            zero_copy_batch=True).iter_batches(
                                batch_format="pyarrow"):
        counts[np.asarray(b["bucket"])] += np.asarray(b["c"])
    cum = np.cumsum(counts)
    ranks = [math.ceil(q * n) - 1 for q in qs]
    buckets = {int(np.searchsorted(cum, r + 1)) for r in ranks}
    barr = pa.array(sorted(buckets), pa.int64())

    def in_buckets(b: pa.Table) -> pa.Table:
        v = np.asarray(b["l_quantity"], dtype=np.float64)
        idx = np.clip(((v - lo) / width).astype(np.int64), 0, n_buckets - 1)
        keep = np.isin(idx, np.asarray(barr))
        return pa.table({"l_quantity": pa.array(v[keep]),
                         "bucket": pa.array(idx[keep])})

    band = ds.map_batches(in_buckets, batch_format="pyarrow",
                          zero_copy_batch=True).to_pandas()
    out = {}
    for q, r in zip(qs, ranks):
        bk = int(np.searchsorted(cum, r + 1))
        below = int(cum[bk - 1]) if bk > 0 else 0
        vals = np.sort(band.loc[band["bucket"] == bk, "l_quantity"].to_numpy())
        out[f"q{int(q * 100)}"] = [round(float(vals[r - below]), 2)]
    return pd.DataFrame(out)


# --- skew-safe two-phase aggregation: salt the hot key, partial-count,
#     then merge (the SURVEY §4.2 salting pattern, provably exact) ---
def salted_group_count(sf_dir: str, salt: int = 8):
    import numpy as np

    ds = t(sf_dir, "events", ["user_id"])

    def add_salt(b: pa.Table) -> pa.Table:
        s = (np.asarray(b["user_id"]) * 2654435761 % salt).astype(np.int32)
        return b.append_column("salt", pa.array(s))

    partial = (ds.map_batches(add_salt, batch_format="pyarrow",
                              zero_copy_batch=True)
               .groupby(["user_id", "salt"]).aggregate(Count(alias_name="pn")))
    return (partial.groupby("user_id").aggregate(Sum("pn", alias_name="n")))


# --- D1: exact dedup keep-first (quad-set semantics, SHACLValidationService.ts:133) ---
def dedup_first(sf_dir: str):
    return (
        t(sf_dir, "lineitem", ["l_orderkey", "l_linenumber"])
        .groupby("l_orderkey")
        .aggregate(Min("l_linenumber", alias_name="l_linenumber"))
    )


# --- J1: hash/broadcast join dataset→distributions analog
#     (DataDiscoveryService.ts:158-170): orders ⋈ customer, small side broadcast ---
def join_orders_customers(sf_dir: str):
    cust = _small(sf_dir, "customer", ["c_custkey", "c_nationkey"])
    keys = np.asarray(cust["c_custkey"])
    order = np.argsort(keys)
    ref = ray.put((keys[order], np.asarray(cust["c_nationkey"])[order]))

    def add_nation(b: pa.Table) -> pa.Table:
        k, v = ray.get(ref)
        ck = np.asarray(b["o_custkey"])
        idx = np.searchsorted(k, ck)
        return b.append_column("c_nationkey", pa.array(v[idx], pa.int32()))

    out = (
        t(sf_dir, "orders", ["o_custkey", "o_totalprice"])
        .map_batches(add_nation, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("c_nationkey")
        .aggregate(Sum("o_totalprice", alias_name="total"), Count(alias_name="n"))
    )
    return out.map_batches(
        lambda b: b.set_column(b.column_names.index("total"), "total", pc.round(b["total"], 2)),
        batch_format="pyarrow",
    )


# --- J1 variant: NATIVE hash-partitioned join (Dataset.join) for the
#     both-sides-large case — lineitem ⋈ part on partkey ---
def join_native(sf_dir: str):
    li = t(sf_dir, "lineitem", ["l_partkey", "l_quantity"])
    part = t(sf_dir, "part", ["p_partkey", "p_brand"]).map_batches(
        lambda b: b.rename_columns(["l_partkey", "p_brand"]),
        batch_format="pyarrow")
    joined = li.join(part, "inner", 8, on=("l_partkey",))
    out = (joined.groupby("p_brand")
           .aggregate(Sum("l_quantity", alias_name="sum_qty"),
                      Count(alias_name="n")))
    return out.map_batches(
        lambda b: b.set_column(b.column_names.index("sum_qty"), "sum_qty",
                               pc.round(b["sum_qty"], 2)),
        batch_format="pyarrow")


# --- J2: two-hop deref join analog (DataDiscoveryService.ts:281-321):
#     supplier → nation → region via chained broadcast lookups ---
def two_hop_join(sf_dir: str):
    nation = _small(sf_dir, "nation", ["n_nationkey", "n_regionkey"])
    region = _small(sf_dir, "region", ["r_regionkey", "r_name"])
    n2r = dict(zip(nation["n_nationkey"].to_pylist(), nation["n_regionkey"].to_pylist()))
    r2name = dict(zip(region["r_regionkey"].to_pylist(), region["r_name"].to_pylist()))
    lookup = {nk: r2name[rk] for nk, rk in n2r.items()}
    ref = ray.put(lookup)

    def add_region(b: pa.Table) -> pa.Table:
        lk = ray.get(ref)
        names = [lk[nk] for nk in b["s_nationkey"].to_pylist()]
        return b.append_column("r_name", pa.array(names, pa.string()))

    out = (
        t(sf_dir, "supplier", ["s_nationkey", "s_acctbal"])
        .map_batches(add_region, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("r_name")
        .aggregate(Count(alias_name="n_suppliers"), Sum("s_acctbal", alias_name="total_bal"))
    )
    return out.map_batches(
        lambda b: b.set_column(b.column_names.index("total_bal"), "total_bal",
                               pc.round(b["total_bal"], 2)),
        batch_format="pyarrow",
    )


# --- A11 absence: anti-join (minCount-0 violations need target-node anti-join,
#     SURVEY.md §7.3): customers with no orders, per segment ---
def anti_join_customers(sf_dir: str):
    urgent = (
        t(sf_dir, "orders", ["o_custkey", "o_orderpriority"])
        .map_batches(
            lambda b: b.filter(pc.equal(b["o_orderpriority"], "1-URGENT"))
                       .select(["o_custkey"]),
            batch_format="pyarrow", zero_copy_batch=True)
    )
    with_orders = set(urgent.unique("o_custkey"))
    ref = ray.put(with_orders)

    def keep_orderless(b: pa.Table) -> pa.Table:
        s = ray.get(ref)
        mask = pa.array([k not in s for k in b["c_custkey"].to_pylist()])
        return b.filter(mask)

    return (
        t(sf_dir, "customer", ["c_custkey", "c_mktsegment"])
        .map_batches(keep_orderless, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("c_mktsegment")
        .aggregate(Count(alias_name="n"))
    )


# --- A11 absence, both-sides-large variant: NATIVE distributed anti-join
#     (left_outer join + null-probe filter) — same semantics as the
#     broadcast anti_join_customers, no side collected anywhere ---
def anti_join_native(sf_dir: str):
    urgent = (t(sf_dir, "orders", ["o_custkey", "o_orderpriority"])
              .map_batches(
                  lambda b: b.filter(pc.equal(b["o_orderpriority"], "1-URGENT"))
                             .select(["o_custkey"])
                             .rename_columns(["u_custkey"]),
                  batch_format="pyarrow", zero_copy_batch=True)
              .groupby("u_custkey").aggregate(Count(alias_name="dummy"))
              .materialize())
    cust = t(sf_dir, "customer", ["c_custkey", "c_mktsegment"])
    joined = cust.join(urgent, "left_outer", 16,
                       on=("c_custkey",), right_on=("u_custkey",))
    return (joined.map_batches(
        lambda b: b.filter(pc.is_null(b["dummy"])).select(["c_mktsegment"]),
        batch_format="pyarrow")
        .groupby("c_mktsegment").aggregate(Count(alias_name="n")))


# --- A11: cardinality bound check (sh:maxCount analog): per-key counts over bound ---
def cardinality_bounds(sf_dir: str, bound: int = 15):
    out = (
        t(sf_dir, "orders", ["o_custkey"])
        .groupby("o_custkey")
        .aggregate(Count(alias_name="n"))
    )
    return out.map_batches(
        lambda b: b.filter(pc.greater(b["n"], bound)).rename_columns(["c_custkey", "n"]),
        batch_format="pyarrow",
    )


# --- D3: union + distinct (shape-file union semantics,
#     SHACLValidationService.ts:124-134) ---
def union_distinct(sf_dir: str):
    cust = t(sf_dir, "customer", ["c_mktsegment", "c_nationkey"])
    a = cust.map_batches(
        lambda b: b.filter(pc.equal(b["c_mktsegment"], "AUTOMOBILE")).select(["c_nationkey"]),
        batch_format="pyarrow")
    b = cust.map_batches(
        lambda t_: t_.filter(pc.equal(t_["c_mktsegment"], "BUILDING")).select(["c_nationkey"]),
        batch_format="pyarrow")
    vals = sorted(a.union(b).unique("c_nationkey"))
    return pd.DataFrame({"c_nationkey": pd.array(vals, dtype="int32")})


# --- window-function family: top-k PER GROUP (row_number() OVER
#     (PARTITION BY key ORDER BY v DESC) <= k) — per-key head inside a
#     bucketed shuffle; no global sort ---
def top_orders_per_customer(sf_dir: str, k: int = 2):
    from ..stages.discovery import bucketed_groupby_apply

    ds = t(sf_dir, "orders", ["o_custkey", "o_orderkey", "o_totalprice"])

    def head_k(g: pd.DataFrame) -> pd.DataFrame:
        return g.sort_values(["o_totalprice", "o_orderkey"],
                             ascending=[False, True]).head(k)

    return bucketed_groupby_apply(ds, "o_custkey", head_k)


# --- window-function family: cumulative per-partition aggregate
#     (SUM(v) OVER (PARTITION BY key ORDER BY ts ROWS UNBOUNDED
#     PRECEDING)) — per-key pandas cumsum inside a bucketed shuffle ---
def running_total_per_user(sf_dir: str):
    from ..stages.discovery import bucketed_groupby_apply

    ds = t(sf_dir, "events", ["user_id", "event_id", "value"])

    def cumsum(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("event_id")
        return pd.DataFrame({
            "user_id": g["user_id"].values,
            "event_id": g["event_id"].values,
            "running_total": np.round(g["value"].cumsum().values, 2)})

    return bucketed_groupby_apply(ds, "user_id", cumsum)


# --- O1/O2: sort + top-k (ValidationResults.tsx:189-193, ReportViewer.tsx:162) ---
def top_orders(sf_dir: str):
    return (
        t(sf_dir, "orders", ["o_orderkey", "o_totalprice"])
        .sort(["o_totalprice", "o_orderkey"], descending=[True, False])
        .limit(10)
    )


# --- M18/A10: distinct-subject snapshot per type (ValidatorInput.tsx:156-189) ---
def snapshot_counts(sf_dir: str):
    return (
        t(sf_dir, "events", ["event_type", "user_id"])
        .groupby(["event_type", "user_id"])
        .aggregate(Count(alias_name="dummy"))
        .select_columns(["event_type"])
        .groupby("event_type")
        .aggregate(Count(alias_name="n_users"))
    )


# --- O3 + discovery text filter (DataDiscoveryService.ts:41-50): substring search ---
def filter_search_limit(sf_dir: str, needle: str = "merge"):
    return (
        t(sf_dir, "documents", ["doc_id", "text", "source"])
        .map_batches(
            lambda b: b.filter(pc.match_substring(b["text"], needle)).select(["doc_id", "source"]),
            batch_format="pyarrow", zero_copy_batch=True)
        .sort("doc_id")
        .limit(50)
    )


# --- sketch-gated exact heavy hitters (Count-Min prune + exact verify) ---
def heavy_hitters(ds: rd.Dataset, col: str, threshold: int,
                  width: int = 4096, depth: int = 4) -> rd.Dataset:
    """Exact heavy hitters at sketch cost: pass 1 merges per-batch
    Count-Min PARTIALS (fixed ``depth×width`` arrays — the driver only
    adds matrices); pass 2 filters each batch's distinct values by the
    broadcast sketch estimate MAP-SIDE (CMS never undercounts → the
    filter keeps a superset of the true hitters) and one small exact
    groupby over the surviving candidates applies the threshold. The
    all-to-all only ever carries near-heavy values; everything else
    drops at the map stage."""
    from ..functions.sketch import CountMin

    def cms_partial(b: pa.Table) -> pa.Table:
        vc = pd.Series(np.asarray(b[col].to_pandas())).value_counts()
        cm = CountMin(width, depth)
        cm.add_array(vc.index.to_numpy(), vc.to_numpy())
        return pa.table({"t": pa.array([cm.table.tobytes()], pa.binary())})

    merged = CountMin(width, depth)
    for b in ds.map_batches(cms_partial, batch_format="pyarrow",
                            zero_copy_batch=True).iter_batches(
                                batch_format="pyarrow"):
        for raw in b["t"].to_pylist():
            merged.table += np.frombuffer(
                raw, dtype=np.int64).reshape(depth, width)
    ref = ray.put(merged)

    def candidates(b: pa.Table) -> pa.Table:
        cm = ray.get(ref)
        vc = pd.Series(np.asarray(b[col].to_pandas())).value_counts()
        vals = vc.index.to_numpy()
        keep = cm.estimate_array(vals) >= threshold
        return pa.table({col: pa.array(vals[keep].astype(str), pa.string()),
                         "n": pa.array(vc.to_numpy()[keep], pa.int64())})

    out = (ds.map_batches(candidates, batch_format="pyarrow",
                          zero_copy_batch=True)
           .groupby(col).aggregate(Sum("n", alias_name="n")))
    return out.map_batches(
        lambda b: b.filter(pc.greater_equal(b["n"], threshold)),
        batch_format="pyarrow")


def heavy_users(sf_dir: str, threshold: int = 80):
    """Query registration: users with ≥ threshold events."""
    return heavy_hitters(t(sf_dir, "events", ["user_id"]), "user_id",
                         threshold)


# --- corpus statistics: top-k n-grams + grouped exact quantiles ---
def bigram_counts(sf_dir: str, k: int = 50):
    """Top-k corpus bigrams: per-batch Counter partials (map-side
    pre-aggregation — the all-to-all only carries distinct grams), one
    groupby sum, deterministic (count desc, gram asc) top-k."""
    from collections import Counter

    def partial(b: pa.Table) -> pa.Table:
        c: Counter = Counter()
        for t_ in b["text"].to_pylist():
            toks = (t_ or "").split()
            c.update(zip(toks, toks[1:]))
        return pa.table({
            "gram": pa.array([f"{a} {b_}" for a, b_ in c], pa.string()),
            "n": pa.array(list(c.values()), pa.int64())})

    return (t(sf_dir, "documents", ["text"])
            .map_batches(partial, batch_format="pyarrow",
                         zero_copy_batch=True)
            .groupby("gram").aggregate(Sum("n", alias_name="n"))
            .sort([("n"), ("gram")], descending=[True, False])
            .limit(k))


def group_quantiles(sf_dir: str):
    """Per-group exact quantiles (rank = ceil(q·n)−1, the
    quantile_disc rule): one bucketed shuffle on the group key, per-group
    numpy selection. Groups are assumed worker-sized; the global
    histogram-guided selection (quantiles_qty) is the per-group scale
    path when they are not."""
    import math

    from ..stages.discovery import bucketed_groupby_apply

    def per_group(g: pd.DataFrame) -> pd.DataFrame:
        v = np.sort(g["value"].to_numpy(dtype=float))
        n = len(v)
        row = {"event_type": g["event_type"].iloc[0]}
        for q in (0.25, 0.5, 0.75):
            row[f"q{int(q * 100)}"] = round(float(v[math.ceil(q * n) - 1]),
                                            2)
        return pd.DataFrame([row])

    return bucketed_groupby_apply(
        t(sf_dir, "events", ["event_type", "value"]), "event_type",
        per_group)


# --- ROLLUP aggregate: all grouping levels from ONE base-table pass ---
def rollup_counts(sf_dir: str):
    """GROUP BY ROLLUP (l_returnflag, l_linestatus) — count + sum per
    (flag, status), per flag, and grand total, with 'ALL' sentinels.

    Scale shape: the base table is scanned ONCE into the finest-level
    aggregate (group-cardinality-sized — tiny relative to the fact
    table); the coarser levels re-aggregate those partials, so adding a
    rollup level costs a shuffle of the aggregate, never a rescan of
    the 100 TB input. Sums round only at the end so every level is
    float-exact against the oracle."""
    fine = (t(sf_dir, "lineitem",
              ["l_returnflag", "l_linestatus", "l_quantity"])
            .groupby(["l_returnflag", "l_linestatus"])
            .aggregate(Sum("l_quantity", alias_name="s"),
                       Count(alias_name="n"))
            .materialize())  # partials feed all coarser levels

    def finish(b: pa.Table) -> pa.Table:
        flag = (b["l_returnflag"] if "l_returnflag" in b.column_names
                else pa.nulls(b.num_rows, pa.string()).fill_null("ALL"))
        status = (b["l_linestatus"] if "l_linestatus" in b.column_names
                  else pa.nulls(b.num_rows, pa.string()).fill_null("ALL"))
        return pa.table({
            "l_returnflag": flag.cast(pa.string()),
            "l_linestatus": status.cast(pa.string()),
            "n": b["n"].cast(pa.int64()),
            "sum_qty": pc.round(b["s"].cast(pa.float64()), 2)})

    level1 = (fine.groupby("l_returnflag")
              .aggregate(Sum("s", alias_name="s"), Sum("n", alias_name="n"))
              .map_batches(finish, batch_format="pyarrow"))
    # grand total: two scalar streaming aggregates — one row, driver-safe
    # at any input size
    total = rd.from_arrow(pa.table({"s": pa.array([fine.sum("s") or 0.0],
                                                  pa.float64()),
                                    "n": pa.array([fine.sum("n") or 0],
                                                  pa.int64())})) \
        .map_batches(finish, batch_format="pyarrow")

    return fine.map_batches(finish, batch_format="pyarrow") \
        .union(level1, total)


# --- native outer joins (Acero hash join operator family) ---
def left_join_native(sf_dir: str):
    """Customers LEFT OUTER their order counts: customers with no
    orders survive with n_orders = 0. The aggregate side is built
    BEFORE the join (group-cardinality-sized), so the outer join
    shuffles the small side, not the fact table."""
    counts = (t(sf_dir, "orders", ["o_custkey"])
              .groupby("o_custkey").aggregate(Count(alias_name="n_orders"))
              .map_batches(
                  lambda b: b.rename_columns(["c_custkey", "n_orders"]),
                  batch_format="pyarrow"))
    cust = t(sf_dir, "customer", ["c_custkey", "c_mktsegment"])
    joined = cust.join(counts, "left_outer", 8, on=("c_custkey",))
    return joined.map_batches(
        lambda b: b.set_column(
            b.column_names.index("n_orders"), "n_orders",
            b["n_orders"].cast(pa.int64()).fill_null(0)),
        batch_format="pyarrow")


def full_outer_native(sf_dir: str):
    """Per-nation customer vs supplier counts via a native FULL OUTER
    join of two independent aggregates — either side may be absent for
    a nation; missing counts surface as 0."""
    cc = (t(sf_dir, "customer", ["c_nationkey"])
          .groupby("c_nationkey").aggregate(Count(alias_name="n_cust"))
          .map_batches(lambda b: b.rename_columns(["nationkey", "n_cust"]),
                       batch_format="pyarrow"))
    sc = (t(sf_dir, "supplier", ["s_nationkey"])
          .groupby("s_nationkey").aggregate(Count(alias_name="n_supp"))
          .map_batches(lambda b: b.rename_columns(["nationkey", "n_supp"]),
                       batch_format="pyarrow"))
    joined = cc.join(sc, "full_outer", 4, on=("nationkey",),
                     right_suffix="_r")

    def finish(b: pa.Table) -> pa.Table:
        nk = b["nationkey"].cast(pa.int64())
        if "nationkey_r" in b.column_names:
            nk = pc.coalesce(nk, b["nationkey_r"].cast(pa.int64()))
        return pa.table({
            "nationkey": nk,
            "n_cust": b["n_cust"].cast(pa.int64()).fill_null(0),
            "n_supp": b["n_supp"].cast(pa.int64()).fill_null(0)})

    return joined.map_batches(finish, batch_format="pyarrow")


# --- TPC-H Q3-shaped star join: fact table chained through two
#     dimension joins, aggregated per segment ---
def star_join_revenue(sf_dir: str):
    """Revenue per market segment: lineitem ⋈ orders ⋈ customer.
    The fact table streams once; orders→custkey is a native shuffle
    join (both sides large), the customer segment lookup is a
    broadcast dict (dimension-sized) applied map-side — the classic
    star-join plan: shuffle only between the two large tables."""
    seg_tbl = _small(sf_dir, "customer", ["c_custkey", "c_mktsegment"])
    seg_ref = ray.put(dict(zip(seg_tbl["c_custkey"].to_pylist(),
                               seg_tbl["c_mktsegment"].to_pylist())))

    li = t(sf_dir, "lineitem",
           ["l_orderkey", "l_extendedprice", "l_discount"]).map_batches(
        lambda b: pa.table({
            "o_orderkey": b["l_orderkey"].cast(pa.int64()),
            "rev": pc.multiply(b["l_extendedprice"],
                               pc.subtract(pa.scalar(1.0), b["l_discount"]))}),
        batch_format="pyarrow", zero_copy_batch=True)
    orders = t(sf_dir, "orders", ["o_orderkey", "o_custkey"])
    joined = li.join(orders, "inner", 8, on=("o_orderkey",))

    def add_segment(b: pa.Table) -> pa.Table:
        seg = ray.get(seg_ref)
        segs = [seg.get(c, "") for c in b["o_custkey"].to_pylist()]
        return pa.table({"c_mktsegment": pa.array(segs, pa.string()),
                         "rev": b["rev"].cast(pa.float64())})

    out = (joined.map_batches(add_segment, batch_format="pyarrow")
           .groupby("c_mktsegment")
           .aggregate(Sum("rev", alias_name="revenue"),
                      Count(alias_name="n")))
    return out.map_batches(
        lambda b: b.set_column(b.column_names.index("revenue"), "revenue",
                               pc.round(b["revenue"], 2)),
        batch_format="pyarrow")


# --- conditional-aggregate pivot: per source, one count column per
#     language (FILTER-aggregate family) ---
def pivot_counts(sf_dir: str, langs: tuple = ("en", "es", "de", "fr", "zh")):
    """Docs per source pivoted to fixed per-language columns in ONE
    scan: the per-batch partial is a (source × langs) count table
    (vectorized boolean masks), merged by a source-keyed groupby —
    column count is schema-fixed, so the pivot never widens with data."""

    def partials(b: pa.Table) -> pa.Table:
        import numpy as np

        src_arr = np.asarray(b["source"].to_pandas(), dtype=object)
        lang_arr = np.asarray(b["lang"].to_pandas(), dtype=object)
        uniq, inv = np.unique(src_arr, return_inverse=True)
        cols = {"source": pa.array(uniq, pa.string())}
        for lg in langs:
            m = (lang_arr == lg).astype(np.int64)
            cols[f"n_{lg}"] = pa.array(
                np.bincount(inv, weights=m, minlength=len(uniq))
                .astype(np.int64))
        return pa.table(cols)

    aggs = [Sum(f"n_{lg}", alias_name=f"n_{lg}") for lg in langs]
    out = (t(sf_dir, "documents", ["source", "lang"])
           .map_batches(partials, batch_format="pyarrow",
                        zero_copy_batch=True)
           .groupby("source").aggregate(*aggs))
    return out.map_batches(
        lambda b: pa.table({"source": b["source"].cast(pa.string()),
                            **{f"n_{lg}": b[f"n_{lg}"].cast(pa.int64())
                               for lg in langs}}),
        batch_format="pyarrow")


# --- scalar-subquery filter: one streaming aggregate broadcast into a
#     vectorized filter ---
def customers_above_avg(sf_dir: str):
    """Customers whose balance exceeds the global average — the scalar
    subquery plan: ONE streaming aggregate produces a single float, the
    filter applies it map-side; no shuffle at all."""
    ds = t(sf_dir, "customer", ["c_custkey", "c_acctbal"]).materialize()
    from ray.data.aggregate import Mean

    avg = ds.aggregate(Mean("c_acctbal", alias_name="m"))["m"]

    def keep(b: pa.Table) -> pa.Table:
        return b.filter(pc.greater(b["c_acctbal"], avg))

    return ds.map_batches(keep, batch_format="pyarrow",
                          zero_copy_batch=True).map_batches(
        lambda b: pa.table({"c_custkey": b["c_custkey"].cast(pa.int64()),
                            "c_acctbal": pc.round(b["c_acctbal"], 2)}),
        batch_format="pyarrow")


# --- fixed-width histogram: mergeable per-batch bincounts ---
def value_histogram(sf_dir: str, width: float = 5.0):
    """Histogram of lineitem quantity in fixed buckets of ``width``:
    per-batch vectorized bincount partials merged by one tiny groupby —
    the same mergeable-partial shape the exact-quantile machinery uses,
    exposed as a query."""
    ds = t(sf_dir, "lineitem", ["l_quantity"])

    def partials(b: pa.Table) -> pa.Table:
        v = np.asarray(b["l_quantity"], dtype=np.float64)
        idx = np.floor(v / width).astype(np.int64)
        uniq, counts = np.unique(idx, return_counts=True)
        return pa.table({"bucket": pa.array(uniq * width, pa.float64()),
                         "n": pa.array(counts.astype(np.int64))})

    return (ds.map_batches(partials, batch_format="pyarrow",
                           zero_copy_batch=True)
            .groupby("bucket").aggregate(Sum("n", alias_name="n"))
            .map_batches(
                lambda b: pa.table({"bucket": b["bucket"].cast(pa.float64()),
                                    "n": b["n"].cast(pa.int64())}),
                batch_format="pyarrow"))


# --- per-group linear regression from mergeable sufficient statistics ---
def regression_per_type(sf_dir: str):
    """Per event_type OLS of value on event time (epoch seconds):
    slope + intercept from the five sufficient statistics
    (n, Σx, Σy, Σxy, Σx²) computed as vectorized per-batch partials and
    merged by one tiny groupby — the canonical mergeable-statistics
    pattern (no per-group data concentration, ever)."""
    ds = t(sf_dir, "events", ["event_type", "ts", "value"])
    X0 = 1_704_067_200.0  # 2024-01-01 UTC: centering keeps x^2 sums
    # well-conditioned (raw epoch² would cancel catastrophically)

    def partials(b: pa.Table) -> pa.Table:
        et = np.asarray(b["event_type"].to_pandas(), dtype=object)
        x = np.asarray(b["ts"].cast(pa.int64())) / 1e6 - X0
        y = np.asarray(b["value"], dtype=np.float64)
        uniq, inv = np.unique(et, return_inverse=True)
        def acc(v):
            return np.bincount(inv, weights=v, minlength=len(uniq))
        return pa.table({
            "event_type": pa.array(uniq, pa.string()),
            "n": pa.array(np.bincount(inv, minlength=len(uniq))
                          .astype(np.int64)),
            "sx": pa.array(acc(x), pa.float64()),
            "sy": pa.array(acc(y), pa.float64()),
            "sxy": pa.array(acc(x * y), pa.float64()),
            "sxx": pa.array(acc(x * x), pa.float64())})

    agg = (ds.map_batches(partials, batch_format="pyarrow",
                          zero_copy_batch=True)
           .groupby("event_type")
           .aggregate(Sum("n", alias_name="n"), Sum("sx", alias_name="sx"),
                      Sum("sy", alias_name="sy"),
                      Sum("sxy", alias_name="sxy"),
                      Sum("sxx", alias_name="sxx")))

    def finish(b: pa.Table) -> pa.Table:
        n = np.asarray(b["n"], dtype=np.float64)
        sx = np.asarray(b["sx"]); sy = np.asarray(b["sy"])
        sxy = np.asarray(b["sxy"]); sxx = np.asarray(b["sxx"])
        # slope is shift-invariant; intercept is AT THE SHIFTED ORIGIN
        # (2024-01-01) — the oracle uses identical explicit arithmetic,
        # not regr_slope, so summation forms match
        exy = sxy / n - (sx / n) * (sy / n)
        exx = sxx / n - (sx / n) ** 2
        slope = exy / exx
        intercept = sy / n - slope * (sx / n)
        return pa.table({
            "event_type": b["event_type"].cast(pa.string()),
            "n": b["n"].cast(pa.int64()),
            "slope": pa.array(np.round(slope, 6), pa.float64()),
            "intercept": pa.array(np.round(intercept, 6), pa.float64())})

    return agg.map_batches(finish, batch_format="pyarrow")


# --- exact distributed global rank + ntile WITHOUT a global sort
#     bottleneck: range-bucket prefix offsets (the sequence-pack
#     two-phase scan generalized to an arbitrary sort key) ---
def ranked_ntile(ds, value_col: str, id_col: str, n_tiles: int = 4,
                 n_range_buckets: int = 64):
    """Exact global rank by ``(value, id)`` + SQL ntile WITHOUT a global
    sort: rows land in order-contiguous VALUE-RANGE buckets whose
    cutoffs come from the engine's mergeable QUANTILE sketch (one pass,
    fixed-size partials), so buckets stay ~equal-count under ANY value
    skew — a lognormal or point-mass-heavy distribution no longer
    concentrates one bucket the way the previous uniform-width
    (min/max) cutoffs did. A bucket-count table (n_range_buckets rows)
    prefix-sums on the driver; phase 2 sorts WITHIN each bucket and
    adds the broadcast base offset. Ranks are exact regardless of
    cutoff quality (assignment is monotone in value, ties share a
    bucket); cutoffs only balance the work.
    ntile uses the SQL rule: the first ``n % tiles`` tiles get the
    extra row."""
    from ..functions.sketch import approx_quantiles

    ds = ds.materialize()
    n = ds.count()
    qs = [i / n_range_buckets for i in range(1, n_range_buckets)]
    cuts = np.asarray(approx_quantiles(ds, value_col, qs), dtype=np.float64)
    cuts_ref = ray.put(cuts)

    def add_bucket(b: pa.Table) -> pa.Table:
        c = ray.get(cuts_ref)
        v = np.asarray(b[value_col], dtype=np.float64)
        rb = np.searchsorted(c, v, side="right").astype(np.int64)
        return b.append_column("_rb", pa.array(rb, pa.int64()))

    bucketed = ds.map_batches(add_bucket, batch_format="pyarrow",
                              zero_copy_batch=True).materialize()
    counts = bucketed.groupby("_rb").aggregate(
        Count(alias_name="c")).to_pandas().sort_values("_rb")
    base = dict(zip(counts["_rb"],
                    counts["c"].cumsum() - counts["c"]))
    base_ref = ray.put((base, n, n_tiles))

    def rank_bucket(g: pd.DataFrame) -> pd.DataFrame:
        base_, n_, tiles = ray.get(base_ref)
        g = g.sort_values([value_col, id_col])
        rk = np.arange(len(g), dtype=np.int64) + 1 + base_[g["_rb"].iloc[0]]
        # SQL ntile: first (n % tiles) tiles have ceil(n/tiles) rows
        big, rem = n_ // tiles + 1, n_ % tiles
        cut = big * rem
        small = max(n_ // tiles, 1)  # guard n < tiles (else branch unused)
        tile = np.where(rk <= cut, (rk - 1) // big + 1,
                        (rk - 1 - cut) // small + rem + 1)
        return pd.DataFrame({id_col: g[id_col].astype("int64"),
                             "rnk": rk,
                             "quartile": tile.astype("int64")})

    from ..stages.discovery import bucketed_groupby_apply

    return bucketed_groupby_apply(bucketed, "_rb", rank_bucket)


# --- exact distributed global rank + ntile over the customer table ---
def rank_quartiles(sf_dir: str, n_tiles: int = 4,
                   n_range_buckets: int = 64):
    """Every customer's exact global rank by (acctbal, custkey) and its
    ntile(4) quartile — :func:`ranked_ntile` over the customer table."""
    ds = t(sf_dir, "customer", ["c_custkey", "c_acctbal"])
    return ranked_ntile(ds, "c_acctbal", "c_custkey", n_tiles=n_tiles,
                        n_range_buckets=n_range_buckets)


# --- TPC-H Q6 shape with REAL predicate pushdown at the parquet read ---
def q6_revenue(sf_dir: str):
    """Forecast-revenue aggregate (TPC-H Q6): one-year shipdate window,
    discount band, quantity cap. The predicates travel INTO the read as
    a pyarrow dataset filter, so row groups outside the window never
    leave storage and the surviving rows arrive pre-filtered — the
    "prune at the read" rule with rows, not just columns. The aggregate
    is a single streaming sum."""
    import datetime as _dt

    import pyarrow.dataset as pds

    lo = _dt.datetime(1996, 1, 1)
    hi = _dt.datetime(1997, 1, 1)
    flt = ((pds.field("l_shipdate") >= lo) & (pds.field("l_shipdate") < hi)
           & (pds.field("l_discount") >= 0.05)
           & (pds.field("l_discount") <= 0.07)
           & (pds.field("l_quantity") < 24.0))
    from ..sources import io as io_mod

    ds = io_mod.read_table(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_extendedprice", "l_discount"], filter=flt)

    def rev(b: pa.Table) -> pa.Table:
        r = pc.sum(pc.multiply(b["l_extendedprice"], b["l_discount"]))
        return pa.table({"r": pa.array([r.as_py() or 0.0], pa.float64()),
                         "n": pa.array([b.num_rows], pa.int64())})

    parts = ds.map_batches(rev, batch_format="pyarrow",
                           zero_copy_batch=True)
    total = parts.sum("r") or 0.0
    n = parts.sum("n") or 0
    return rd.from_arrow(pa.table({
        "revenue": pa.array([round(total, 2)], pa.float64()),
        "n": pa.array([int(n)], pa.int64())}))


# --- calendar resample: orders per month (temporal rollup) ---
def orders_by_month(sf_dir: str):
    """Monthly order counts + revenue: the calendar-bucket resample.
    Month key computed vectorized from the timestamp (epoch-free:
    year*100+month is locale/zone-stable), one tiny groupby."""
    ds = t(sf_dir, "orders", ["o_orderdate", "o_totalprice"])

    def bucketize(b: pa.Table) -> pa.Table:
        y = pc.year(b["o_orderdate"]).cast(pa.int64())
        m = pc.month(b["o_orderdate"]).cast(pa.int64())
        return pa.table({
            "month": pc.add(pc.multiply(y, 100), m),
            "o_totalprice": b["o_totalprice"].cast(pa.float64())})

    out = (ds.map_batches(bucketize, batch_format="pyarrow",
                          zero_copy_batch=True)
           .groupby("month")
           .aggregate(Count(alias_name="n"),
                      Sum("o_totalprice", alias_name="total")))
    return out.map_batches(
        lambda b: pa.table({"month": b["month"].cast(pa.int64()),
                            "n": b["n"].cast(pa.int64()),
                            "total": pc.round(b["total"].cast(pa.float64()),
                                              2)}),
        batch_format="pyarrow")


# --- generic table profiler (data-quality stats per column) ---
def table_profile(ds: rd.Dataset, num_cols: list[str],
                  str_cols: list[str],
                  n_buckets: int | None = None) -> rd.Dataset:
    """Per-column data-quality profile: row count, null count, EXACT
    distinct count, min and max — the schema-stats pass a pipeline runs
    before trusting a new table.

    Counts/nulls/min/max fold from FIXED-SIZE per-batch partials (one
    row per column per batch, merged on the driver); the exact distinct
    count is the only data-scale piece and runs as ONE shuffle of
    (column, value) rows through a bucketed dedup + per-column count.
    Output: (column, n, nulls, n_distinct, min_v, max_v, min_s, max_s)
    — numeric columns fill min_v/max_v (round 6), string columns fill
    min_s/max_s."""
    import pandas as pd
    from ray.data.aggregate import Count

    from ..stages.discovery import bucketed_block_apply

    cols = list(num_cols) + list(str_cols)

    # fixed-size partials: (column, n, nulls, min, max) per batch
    stats: dict[str, dict] = {c: {"n": 0, "nulls": 0, "mn": None, "mx": None}
                              for c in cols}

    def partial(b: pa.Table) -> pa.Table:
        rows = []
        for c in cols:
            col = b[c]
            nn = col.null_count
            valid = col.drop_null()
            mn = mx = None
            if len(valid):
                mn, mx = pc.min(valid).as_py(), pc.max(valid).as_py()
            rows.append({"column": c, "n": b.num_rows, "nulls": nn,
                         "mn": str(mn) if mn is not None else None,
                         "mx": str(mx) if mx is not None else None,
                         "is_num": c in num_cols})
        return pa.Table.from_pylist(rows)

    for b in ds.map_batches(partial, batch_format="pyarrow",
                            zero_copy_batch=True).iter_batches(
                                batch_format="pyarrow"):
        for r in b.to_pylist():
            s = stats[r["column"]]
            s["n"] += r["n"]; s["nulls"] += r["nulls"]
            for key, pick in (("mn", min), ("mx", max)):
                v = r[key]
                if v is None:
                    continue
                v2 = float(v) if r["is_num"] else v
                s[key[:2]] = v2 if s[key[:2]] is None else pick(s[key[:2]], v2)

    # exact distinct: one (column, value) shuffle
    def explode(b: pa.Table) -> pa.Table:
        outs_c, outs_v = [], []
        for c in cols:
            vals = b[c].drop_null()
            outs_c.extend([c] * len(vals))
            outs_v.extend(str(v) for v in vals.to_pylist())
        return pa.table({"column": pa.array(outs_c, pa.string()),
                         "v": pa.array(outs_v, pa.string())})

    def dedup_bucket(g: pd.DataFrame) -> pd.DataFrame:
        return g.drop_duplicates(["column", "v"])

    nd = (bucketed_block_apply(
            ds.map_batches(explode, batch_format="pyarrow",
                           zero_copy_batch=True),
            "v", dedup_bucket, n_buckets=n_buckets)
          .groupby("column").aggregate(Count(alias_name="n_distinct"))
          .to_pandas())
    nd_map = dict(zip(nd["column"], nd["n_distinct"]))

    rows = []
    for c in cols:
        s = stats[c]
        isnum = c in num_cols
        rows.append({
            "column": c, "n": s["n"], "nulls": s["nulls"],
            "n_distinct": int(nd_map.get(c, 0)),
            "min_v": (round(float(s["mn"]), 6)
                      if isnum and s["mn"] is not None else None),
            "max_v": (round(float(s["mx"]), 6)
                      if isnum and s["mx"] is not None else None),
            "min_s": None if isnum else s["mn"],
            "max_s": None if isnum else s["mx"]})
    return rd.from_arrow(pa.Table.from_pylist(rows, schema=pa.schema([
        ("column", pa.string()), ("n", pa.int64()), ("nulls", pa.int64()),
        ("n_distinct", pa.int64()), ("min_v", pa.float64()),
        ("max_v", pa.float64()), ("min_s", pa.string()),
        ("max_s", pa.string())])))
