"""Windowed aggregates over an ordered event log (SURVEY.md §2.9 note).

Ray Data has no event-time windows; per the engine's streaming-shaped
contract the input is treated as a partitioned log (key = user_id,
ordered by ts within partition) and windows are computed per partition:

- tumbling: vectorized bucket column (ts // size) + one groupby
- sliding: fan-out to every covering window inside ``map_batches``
- session: per-key pandas gap-split inside a bucketed groupby

Ordering assumption: within a (user) partition, rows are processed
sorted by (ts, event_id) — ties broken by event_id.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd
from ray.data.aggregate import Count, Sum

from .discovery import bucketed_groupby_apply

US = 1_000_000


def tumbling_window(events: rd.Dataset, size_s: int = 3600,
                    key: str = "event_type") -> rd.Dataset:
    """(key, window_start_epoch_s) → count + sum(value), one shuffle."""

    def bucketize(b: pa.Table) -> pa.Table:
        us = b["ts"].cast(pa.int64())
        win = pc.multiply(pc.divide(us, size_s * US), size_s)  # floor to window start (s)
        return b.append_column("window_start", win.cast(pa.int64()))

    out = (events.map_batches(bucketize, batch_format="pyarrow",
                              zero_copy_batch=True)
           .groupby([key, "window_start"])
           .aggregate(Count(alias_name="n"), Sum("value", alias_name="total")))
    return out.map_batches(
        lambda b: b.set_column(b.column_names.index("total"), "total",
                               pc.round(b["total"], 2)),
        batch_format="pyarrow")


def sliding_window(events: rd.Dataset, size_s: int = 3600, slide_s: int = 900,
                   key: str = "event_type") -> rd.Dataset:
    """Each event lands in every window covering it (size/slide fan-out in
    the batch fn — no per-row Python dispatch downstream)."""
    k = size_s // slide_s

    def explode(b: pa.Table) -> pa.Table:
        us = np.asarray(b["ts"].cast(pa.int64()))
        last = (us // (slide_s * US)) * slide_s  # latest window start covering ts
        keys, starts, vals = [], [], []
        kcol = b[key].to_pylist()
        vcol = np.asarray(b["value"])
        for i in range(len(us)):
            for j in range(k):
                start = last[i] - j * slide_s
                if start < 0:
                    break
                keys.append(kcol[i]); starts.append(start); vals.append(vcol[i])
        return pa.table({key: pa.array(keys, pa.string()),
                         "window_start": pa.array(starts, pa.int64()),
                         "value": pa.array(vals, pa.float64())})

    out = (events.map_batches(explode, batch_format="pyarrow", zero_copy_batch=True)
           .groupby([key, "window_start"])
           .aggregate(Count(alias_name="n"), Sum("value", alias_name="total")))
    return out.map_batches(
        lambda b: b.set_column(b.column_names.index("total"), "total",
                               pc.round(b["total"], 2)),
        batch_format="pyarrow")


def session_windows(events: rd.Dataset, gap_s: int = 1800,
                    key: str = "user_id") -> rd.Dataset:
    """Gap-based sessionization per key: a new session starts when the gap
    to the previous event exceeds ``gap_s``. Output: (key, sid 1-based,
    n_events, session_start, session_end) — epoch seconds."""

    def sessions(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["ts", "event_id"])
        ts = g["ts"].astype("int64") // US
        brk = (ts.diff().fillna(gap_s + 1) > gap_s).astype(int)
        sid = brk.cumsum()
        out = pd.DataFrame({"ts_s": ts, "sid": sid})
        agg = out.groupby("sid")["ts_s"].agg(["count", "min", "max"]).reset_index()
        return pd.DataFrame({
            key: g[key].iloc[0],
            "sid": agg["sid"].astype("int64"),
            "n_events": agg["count"].astype("int64"),
            "session_start": agg["min"].astype("int64"),
            "session_end": agg["max"].astype("int64"),
        })

    return bucketed_groupby_apply(
        events.select_columns([key, "ts", "event_id"]), key, sessions)


def watermark_filter(events: rd.Dataset, delay_s: int = 3600,
                     ts_col: str = "ts") -> rd.Dataset:
    """Allowed-lateness gate: drop events older than
    ``max(event time) − delay``. On an unbounded stream the watermark
    advances per partition as data arrives; on a bounded log the horizon
    is the global max event time, which keeps the operator deterministic
    (and SQL-checkable). One tiny aggregate + one vectorized filter."""
    from ray.data.aggregate import Max

    hi = events.aggregate(Max(ts_col, alias_name="hi"))["hi"]
    horizon = pa.scalar(hi).cast(pa.int64()).as_py() - delay_s * US

    def keep(b: pa.Table) -> pa.Table:
        return b.filter(pc.greater_equal(b[ts_col].cast(pa.int64()),
                                         horizon))

    return events.map_batches(keep, batch_format="pyarrow",
                              zero_copy_batch=True)


def systematic_sample(ds: rd.Dataset, id_col: str, modulus: int = 20,
                      keep: int = 3) -> rd.Dataset:
    """O5 deterministic systematic sampling: keep rows with
    id % modulus == keep (seeded ``ds.random_sample`` exists for
    statistical sampling; this variant is reproducible for oracles)."""
    def fn(b: pa.Table) -> pa.Table:
        mask = (np.asarray(b[id_col]) % modulus) == keep
        return b.filter(pa.array(mask))

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def stratified_sample(ds: rd.Dataset, stratum: str, id_col: str,
                      n_per_stratum: int = 5) -> rd.Dataset:
    """O5 variant: deterministic first-n per stratum (the reproducible
    stratified sample — seeded random variants exist via
    ``ds.random_sample``). One bucketed shuffle keyed by the stratum."""
    from .discovery import bucketed_groupby_apply

    def head_n(g):
        return g.sort_values(id_col).head(n_per_stratum)

    return bucketed_groupby_apply(ds, stratum, head_n)


def upsert_latest(events: rd.Dataset, key: str = "user_id",
                  order_col: str = "event_id") -> rd.Dataset:
    """D2 replace-by-content semantics (DataDiscoveryService.ts:24-27):
    keep only each key's latest row (max order_col)."""

    def latest(g: pd.DataFrame) -> pd.DataFrame:
        return g.sort_values(order_col).tail(1)

    return bucketed_groupby_apply(events, key, latest)


def asof_join(events: rd.Dataset, left_type: str = "click",
              right_type: str = "view", key: str = "user_id") -> rd.Dataset:
    """As-of join — a custom operator Ray Data has no native form of
    (§2.9): each LEFT-type event joins the most recent RIGHT-type event
    of the same key at or before its timestamp (inner: unmatched left
    rows drop). ONE bucketed shuffle on the key; inside each bucket a
    single vectorized ``pandas.merge_asof`` handles every key at once
    (``by=key``), so per-bucket work is O(n log n) sort + linear merge —
    no per-key Python loop and no all-pairs blowup. Tie-break on equal
    timestamps: max right event_id (deterministic).

    Output: (event_id, user_id, ts_us, right_event_id, lag_us)."""
    types = pa.array([left_type, right_type])

    def project(b: pa.Table) -> pa.Table:
        f = b.filter(pc.is_in(b["event_type"], value_set=types))
        return pa.table({
            "event_id": f["event_id"].cast(pa.int64()),
            key: f[key].cast(pa.int64()),
            "ts_us": f["ts"].cast(pa.timestamp("us")).cast(pa.int64()),
            "event_type": f["event_type"].cast(pa.string())})

    need = events.map_batches(project, batch_format="pyarrow",
                              zero_copy_batch=True)

    out_cols = ["event_id", key, "ts_us", "right_event_id", "lag_us"]

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        left = g.loc[g["event_type"] == left_type].sort_values(
            ["ts_us", "event_id"])
        right = g.loc[g["event_type"] == right_type].sort_values(
            ["ts_us", "event_id"])
        if not len(left) or not len(right):
            return pd.DataFrame({c: pd.Series(dtype="int64")
                                 for c in out_cols})
        right = right.assign(r_ts_us=right["ts_us"])  # the on-column is
        # consumed by merge_asof; keep the right timestamp for the lag
        m = pd.merge_asof(left, right, on="ts_us", by=key,
                          direction="backward", suffixes=("", "_r"))
        m = m.dropna(subset=["event_id_r"])
        return pd.DataFrame({
            "event_id": m["event_id"].astype("int64"),
            key: m[key].astype("int64"),
            "ts_us": m["ts_us"].astype("int64"),
            "right_event_id": m["event_id_r"].astype("int64"),
            "lag_us": (m["ts_us"] - m["r_ts_us"]).astype("int64"),
        })

    from .discovery import bucketed_block_apply

    return bucketed_block_apply(need, key, per_bucket)


def interval_join(points: rd.Dataset, intervals: rd.Dataset,
                  key: str = "user_id", ts_col: str = "ts_s",
                  point_id: str = "event_id", interval_id: str = "sid",
                  start_col: str = "session_start",
                  end_col: str = "session_end") -> rd.Dataset:
    """Range/interval join — each point row joins the per-key interval
    containing its timestamp (inner; unmatched points drop). PARTITIONING
    ASSUMPTION: intervals are NON-OVERLAPPING per key (sessions, windows,
    validity ranges) — containment is then equivalent to "latest interval
    start at-or-before ts whose end covers ts", so ONE bucketed shuffle
    on the key + a single vectorized ``merge_asof`` per bucket resolves
    every key at once. No per-key loop, no point×interval blowup.

    Output: (point_id, key, ts_col, interval_id)."""
    p_cols = [point_id, key, ts_col]
    i_cols = [key, interval_id, start_col, end_col]
    all_cols = [point_id, key, ts_col, interval_id, start_col, end_col]

    def tag(side: str, cols: list[str]):
        def fn(b: pa.Table) -> pa.Table:
            arrays = {"_side": pa.array([side] * b.num_rows, pa.string())}
            for c in all_cols:
                arrays[c] = (b[c].cast(pa.int64()) if c in cols
                             else pa.nulls(b.num_rows, pa.int64()))
            return pa.table(arrays)
        return fn

    both = (points.map_batches(tag("p", p_cols), batch_format="pyarrow")
            .union(intervals.map_batches(tag("i", i_cols),
                                         batch_format="pyarrow")))

    out_cols = [point_id, key, ts_col, interval_id]

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        pts = g.loc[g["_side"] == "p", p_cols].sort_values([ts_col, point_id])
        ivs = g.loc[g["_side"] == "i", i_cols].sort_values([start_col])
        if not len(pts) or not len(ivs):
            return pd.DataFrame({c: pd.Series(dtype="int64")
                                 for c in out_cols})
        m = pd.merge_asof(pts, ivs, left_on=ts_col, right_on=start_col,
                          by=key, direction="backward")
        m = m.dropna(subset=[interval_id])
        m = m.loc[m[ts_col] <= m[end_col]]
        return pd.DataFrame({c: m[c].astype("int64") for c in out_cols})

    from .discovery import bucketed_block_apply

    return bucketed_block_apply(both, key, per_bucket)


def funnel_counts(events: rd.Dataset,
                  steps: tuple[str, ...] = ("view", "click", "purchase"),
                  key: str = "user_id") -> rd.Dataset:
    """Ordered funnel: per user, step i+1 counts only with an event
    STRICTLY after the earliest qualifying time of step i (the standard
    product-analytics funnel). Returns one row of per-step reach counts
    ``step_1..step_k``.

    Scale shape: one column-pruned filter to funnel event types, ONE
    shuffle keyed on the user, then a vectorized per-group scan (numpy
    min over each step's timestamps) — counts merge as scalar sums, so
    nothing user-scale reaches the driver."""

    def per_user(g: pd.DataFrame) -> pd.DataFrame:
        ts = g["ts"].astype("int64")
        reached = np.zeros(len(steps), dtype=np.int64)
        prev = None  # earliest qualifying time of the previous step
        for i, s in enumerate(steps):
            m = g["event_type"] == s
            if prev is not None:
                m &= ts > prev
            if not m.any():
                break
            reached[i] = 1
            prev = ts[m].min()
        return pd.DataFrame({f"step_{i + 1}": [int(reached[i])]
                             for i in range(len(steps))})

    step_set = list(steps)

    def keep_steps(b: pa.Table) -> pa.Table:
        return b.filter(pc.is_in(b["event_type"],
                                 value_set=pa.array(step_set, pa.string())))

    typed = events.select_columns([key, "event_type", "ts"]).map_batches(
        keep_steps, batch_format="pyarrow", zero_copy_batch=True)
    per = bucketed_groupby_apply(typed, key, per_user)
    agg = per.aggregate(*[Sum(f"step_{i + 1}", alias_name=f"step_{i + 1}")
                          for i in range(len(steps))]) or {}
    return rd.from_arrow(pa.table(
        {f"step_{i + 1}": pa.array([int(agg.get(f"step_{i + 1}") or 0)],
                                   pa.int64())
         for i in range(len(steps))}))


def zscore_outliers(events: rd.Dataset, threshold: float = 2.5,
                    key: str = "user_id") -> rd.Dataset:
    """Per-user z-score anomalies: events whose value deviates more than
    ``threshold`` sample standard deviations from that user's mean.
    Two shuffles, both keyed on the user: (1) per-user mean/std partials,
    (2) the events bucketed back against their user's stats (tagged
    union + one bucketed merge — no corpus-scale driver state)."""

    def per_user(g: pd.DataFrame) -> pd.DataFrame:
        v = g["value"].astype("float64")
        if len(v) < 2:
            return pd.DataFrame({"event_id": pd.Series(dtype="int64"),
                                 "user_id": pd.Series(dtype="int64"),
                                 "z": pd.Series(dtype="float64")})
        mu, sd = v.mean(), v.std(ddof=1)
        if sd == 0.0:
            return pd.DataFrame({"event_id": pd.Series(dtype="int64"),
                                 "user_id": pd.Series(dtype="int64"),
                                 "z": pd.Series(dtype="float64")})
        z = (v - mu) / sd
        m = z.abs() > threshold
        return pd.DataFrame({"event_id": g.loc[m, "event_id"].astype("int64"),
                             "user_id": g.loc[m, key].astype("int64"),
                             "z": np.round(z[m], 6)})

    cols = events.select_columns([key, "event_id", "value"])
    return bucketed_groupby_apply(cols, key, per_user)


def weighted_sample(ds: rd.Dataset, k: int = 100, id_col: str = "doc_id",
                    weight_col: str = "n_chars") -> rd.Dataset:
    """Deterministic weight-proportional sampling without replacement
    (Efraimidis–Spirakis A-ES): each row draws u from the md5 of its id
    (reproducible across runs/engines) and is ranked by u^(1/w); the
    global top-k is the weighted sample. Per-batch keys are vectorized
    and each batch emits only its LOCAL top-k (partial combiner), so
    the final sort sees ≤ k rows per block — never the corpus."""
    import hashlib

    def keys(b: pa.Table) -> pa.Table:
        ids = b[id_col].to_pylist()
        u = np.array([int(hashlib.md5(str(i).encode()).hexdigest()[:8], 16)
                      for i in ids], dtype=np.float64) / 4294967296.0
        w = np.asarray(b[weight_col].to_pandas(), dtype=np.float64)
        w = np.maximum(w, 1e-12)
        key = u ** (1.0 / w)
        t = pa.table({id_col: b[id_col], weight_col: b[weight_col],
                      "key": pa.array(key, pa.float64())})
        if t.num_rows > k:  # local top-k partial
            order = pc.sort_indices(
                t, sort_keys=[("key", "descending"), (id_col, "ascending")])
            t = t.take(order[:k])
        return t

    top = (ds.select_columns([id_col, weight_col])
           .map_batches(keys, batch_format="pyarrow", zero_copy_batch=True)
           .sort(["key", id_col], descending=[True, False]).limit(k))
    return top.map_batches(
        lambda b: pa.table({id_col: b[id_col],
                            weight_col: b[weight_col],
                            "key": pc.round(b["key"], 6)}),
        batch_format="pyarrow")


def weighted_sample_reservoir(ds: rd.Dataset, k: int = 100,
                              id_col: str = "doc_id",
                              weight_col: str = "n_chars") -> rd.Dataset:
    """:func:`weighted_sample` with a RESERVOIR finalize (the
    Efraimidis–Spirakis streaming formulation): the per-batch vectorized
    key computation and local top-k partials are identical, but instead
    of a distributed sort over the n_batches×k partial rows, a k-bounded
    min-heap folds the streamed partials — total driver state is k rows
    at ANY corpus size and the sort shuffle disappears. Same keys, same
    deterministic tie-break, bit-identical output (equivalence is
    property-tested and the oracle is shared)."""
    import heapq
    import hashlib

    def keys(b: pa.Table) -> pa.Table:
        ids = b[id_col].to_pylist()
        u = np.array([int(hashlib.md5(str(i).encode()).hexdigest()[:8], 16)
                      for i in ids], dtype=np.float64) / 4294967296.0
        w = np.asarray(b[weight_col].to_pandas(), dtype=np.float64)
        w = np.maximum(w, 1e-12)
        key = u ** (1.0 / w)
        t = pa.table({id_col: b[id_col], weight_col: b[weight_col],
                      "key": pa.array(key, pa.float64())})
        if t.num_rows > k:  # local top-k partial
            order = pc.sort_indices(
                t, sort_keys=[("key", "descending"), (id_col, "ascending")])
            t = t.take(order[:k])
        return t

    partials = ds.select_columns([id_col, weight_col]).map_batches(
        keys, batch_format="pyarrow", zero_copy_batch=True)

    # k-bounded streaming reservoir: heap orders by (key asc, id desc) so
    # the root is the weakest member under the (key desc, id asc) rank;
    # _NegId makes the id tie-break invert cleanly for any id type
    class _NegId:
        __slots__ = ("v",)

        def __init__(self, v):
            self.v = v

        def __lt__(self, other):
            return other.v < self.v

        def __eq__(self, other):
            return self.v == other.v

    heap: list = []
    for b in partials.iter_batches(batch_format="pyarrow"):
        for i, w, key in zip(b[id_col].to_pylist(),
                             b[weight_col].to_pylist(),
                             b["key"].to_pylist()):
            item = (key, _NegId(i), w)
            if len(heap) < k:
                heapq.heappush(heap, item)
            elif item > heap[0]:
                heapq.heapreplace(heap, item)
    rows = sorted(heap, key=lambda t: (-t[0], t[1].v))
    return rd.from_arrow(pa.table({
        id_col: pa.array([r[1].v for r in rows]),
        weight_col: pa.array([r[2] for r in rows]),
        "key": pa.array([round(r[0], 6) for r in rows], pa.float64())}))


def event_gaps(events: rd.Dataset, key: str = "user_id") -> rd.Dataset:
    """Per-user inter-event gaps (the lag-window primitive): for every
    event after a user's first, the seconds since that user's previous
    event (ties broken by event_id). One user-keyed shuffle; the
    within-group sort is bounded by the user's own history."""

    def per_user(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["ts", "event_id"])
        ts = g["ts"].astype("int64") // 1_000_000  # epoch seconds
        gap = ts.diff()
        out = g.iloc[1:]
        return pd.DataFrame({
            "event_id": out["event_id"].astype("int64"),
            key: out[key].astype("int64"),
            "gap_s": gap.iloc[1:].astype("int64")})

    cols = events.select_columns([key, "event_id", "ts"])
    return bucketed_groupby_apply(cols, key, per_user)


def windowed_topk_users(events: rd.Dataset, size_s: int = 86400,
                        k: int = 3) -> rd.Dataset:
    """Per tumbling window, the top-k users by event count (count desc,
    user asc — deterministic under ties): the streaming heavy-hitters
    report. Two shuffles: (window, user) count groupby, then a
    window-keyed bucketed rank that sees only per-user counts (already
    group-cardinality-sized), never raw events."""

    def bucketize(b: pa.Table) -> pa.Table:
        us = b["ts"].cast(pa.int64())
        win = pc.multiply(pc.divide(us, size_s * US), size_s)
        return pa.table({"window_start": win.cast(pa.int64()),
                         "user_id": b["user_id"].cast(pa.int64())})

    counts = (events.select_columns(["ts", "user_id"])
              .map_batches(bucketize, batch_format="pyarrow",
                           zero_copy_batch=True)
              .groupby(["window_start", "user_id"])
              .aggregate(Count(alias_name="n")))

    def topk(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["n", "user_id"], ascending=[False, True])
        out = g.head(k)
        return pd.DataFrame({
            "window_start": out["window_start"].astype("int64"),
            "user_id": out["user_id"].astype("int64"),
            "n": out["n"].astype("int64")})

    return bucketed_groupby_apply(counts, "window_start", topk)


def decayed_user_stats(events: rd.Dataset, half_life_s: float = 604800.0,
                       key: str = "user_id") -> rd.Dataset:
    """Exponentially time-decayed per-user engagement at the stream
    horizon (global max event time): decayed event count
    ``Σ 0.5^((T-ts)/half_life)`` and decayed value sum — the standard
    recency-weighted feature pair. One streaming max for T, then
    vectorized per-batch partials merged by a user groupby; decayed
    sums are mergeable, so no per-user history ever concentrates."""
    from ray.data.aggregate import Max

    hi = events.aggregate(Max("ts", alias_name="hi"))["hi"]
    horizon_s = pa.scalar(hi).cast(pa.int64()).as_py() / US

    def partials(b: pa.Table) -> pa.Table:
        u = np.asarray(b[key].cast(pa.int64()))
        ts = np.asarray(b["ts"].cast(pa.int64())) / US
        v = np.asarray(b["value"], dtype=np.float64)
        w = np.power(0.5, (horizon_s - ts) / half_life_s)
        uniq, inv = np.unique(u, return_inverse=True)
        return pa.table({
            key: pa.array(uniq, pa.int64()),
            "dc": pa.array(np.bincount(inv, weights=w,
                                       minlength=len(uniq)), pa.float64()),
            "dv": pa.array(np.bincount(inv, weights=w * v,
                                       minlength=len(uniq)), pa.float64())})

    agg = (events.select_columns([key, "ts", "value"])
           .map_batches(partials, batch_format="pyarrow",
                        zero_copy_batch=True)
           .groupby(key).aggregate(Sum("dc", alias_name="dc"),
                                   Sum("dv", alias_name="dv")))
    return agg.map_batches(
        lambda b: pa.table({key: b[key].cast(pa.int64()),
                            "decayed_n": pc.round(b["dc"].cast(pa.float64()),
                                                  6),
                            "decayed_value": pc.round(
                                b["dv"].cast(pa.float64()), 6)}),
        batch_format="pyarrow")


def windowed_distinct_users(events: rd.Dataset,
                            size_s: int = 86400) -> rd.Dataset:
    """Exact distinct users per tumbling window: per-batch local
    (window, user) dedup shrinks the shuffle, one distinct groupby,
    then a window-keyed count — the exact path whose 10^12-scale
    approximate swap is the mergeable HLL in functions/sketch.py."""

    def project(b: pa.Table) -> pa.Table:
        us = b["ts"].cast(pa.int64())
        win = pc.multiply(pc.divide(us, size_s * US), size_s)
        t = pa.table({"window_start": win.cast(pa.int64()),
                      "user_id": b["user_id"].cast(pa.int64())})
        # local dedup: repeated (window, user) pairs never ship
        return t.group_by(["window_start", "user_id"]).aggregate([])

    return (events.select_columns(["ts", "user_id"])
            .map_batches(project, batch_format="pyarrow",
                         zero_copy_batch=True)
            .groupby(["window_start", "user_id"])
            .aggregate(Count(alias_name="_c"))
            .groupby("window_start").aggregate(Count(alias_name="n_users"))
            .map_batches(
                lambda b: pa.table({
                    "window_start": b["window_start"].cast(pa.int64()),
                    "n_users": b["n_users"].cast(pa.int64())}),
                batch_format="pyarrow"))


def props_stats(events: rd.Dataset) -> rd.Dataset:
    """Semi-structured extraction: pull the integer ``k`` out of the
    JSON ``props`` column (vectorized regex — no per-row json.loads)
    and aggregate count + mean value per k-decile. The extraction is a
    stateless map; the aggregate is one tiny groupby."""

    def extract_k(b: pa.Table) -> pa.Table:
        ks = pc.extract_regex(b["props"], r'"k":\s*(?P<k>\d+)')
        kv = pc.struct_field(ks, "k").cast(pa.int64())
        return pa.table({"k_decile": pc.divide(kv, 10),
                         "value": b["value"].cast(pa.float64())})

    out = (events.select_columns(["props", "value"])
           .map_batches(extract_k, batch_format="pyarrow",
                        zero_copy_batch=True)
           .groupby("k_decile")
           .aggregate(Count(alias_name="n"), Sum("value", alias_name="sv")))

    def finish(b: pa.Table) -> pa.Table:
        return pa.table({
            "k_decile": b["k_decile"].cast(pa.int64()),
            "n": b["n"].cast(pa.int64()),
            "avg_value": pc.round(
                pc.divide(b["sv"].cast(pa.float64()),
                          b["n"].cast(pa.float64())), 6)})

    return out.map_batches(finish, batch_format="pyarrow")


def retention_cohorts(events: rd.Dataset, period_us: int = 604_800_000_000,
                      user_col: str = "user_id", ts_col: str = "ts",
                      n_buckets: int | None = None) -> rd.Dataset:
    """Cohort retention (the classic product-analytics triangle): users
    are cohorted by the period (default: 7-day epoch week) of their
    FIRST event; for every (cohort, periods-since) cell, count the
    distinct cohort members active in that period.

    Shape: one vectorized map emits (user, period) rows; ONE user-keyed
    bucketed shuffle computes each user's cohort AND its distinct
    active periods in the same group (per-user history is bounded);
    the (cohort, offset) cells reduce in one small groupby. Output:
    (cohort_period, period_offset, n_users)."""
    import pandas as pd
    from ray.data.aggregate import Count

    from .discovery import bucketed_groupby_apply

    def user_periods(b: pa.Table) -> pa.Table:
        us = b[ts_col].cast(pa.timestamp("us")).cast(pa.int64())
        import numpy as np

        periods = (np.asarray(us, dtype=np.int64) // period_us)
        return pa.table({user_col: b[user_col].cast(pa.int64()),
                         "period": pa.array(periods, pa.int64())})

    up = events.map_batches(user_periods, batch_format="pyarrow",
                            zero_copy_batch=True)

    def cohort_rows(g: pd.DataFrame) -> pd.DataFrame:
        periods = g["period"].drop_duplicates().sort_values()
        cohort = int(periods.iloc[0])
        return pd.DataFrame({
            "cohort_period": cohort,
            "period_offset": (periods - cohort).astype("int64").to_numpy()})

    cells = bucketed_groupby_apply(up, user_col, cohort_rows,
                                   n_buckets=n_buckets)
    out = cells.groupby(["cohort_period", "period_offset"]).aggregate(
        Count(alias_name="n_users"))
    return out.map_batches(
        lambda b: pa.table({
            "cohort_period": b["cohort_period"].cast(pa.int64()),
            "period_offset": b["period_offset"].cast(pa.int64()),
            "n_users": b["n_users"].cast(pa.int64())}),
        batch_format="pyarrow")


def hash_split(docs: rd.Dataset, fractions: dict[str, float] | None = None,
               id_col: str = "doc_id", salt: str = "split") -> rd.Dataset:
    """Deterministic train/val/test assignment — the dataset-split step
    of a training-data pipeline, done the only way that survives
    re-runs, resharding and late-arriving data: a pure hash of the
    document id (no global state, no sampling pass, no order
    dependence). u = first 4 little-endian md5 bytes of
    ``"{salt}|{id}"`` / 2^32 ∈ [0, 1); cumulative fraction thresholds
    map u to a split label. One stateless vectorized pass; the SQL
    oracle mirrors the byte arithmetic exactly.

    Reference analog: none (the reference validates, it doesn't
    train) — this is part of the LLM-curation surface the engine adds.
    """
    import hashlib

    if fractions is None:
        fractions = {"train": 0.9, "val": 0.05, "test": 0.05}
    if abs(sum(fractions.values()) - 1.0) > 1e-9:
        raise ValueError(f"fractions must sum to 1, got {fractions}")
    names, cuts, acc = [], [], 0.0
    for name, f in fractions.items():  # insertion order = precedence
        acc += f
        names.append(name)
        cuts.append(acc)
    cuts[-1] = 1.0 + 1e-12  # closed top bucket

    def assign(b: pa.Table) -> pa.Table:
        ids = [str(x) for x in b.column(id_col).to_pylist()]
        u = np.array([int.from_bytes(
            hashlib.md5(f"{salt}|{i}".encode()).digest()[:4], "little")
            for i in ids], dtype=np.float64) / 2.0 ** 32
        idx = np.searchsorted(np.array(cuts), u, side="right")
        return pa.table({
            id_col: b[id_col],
            "split": pa.array([names[i] for i in idx], pa.string())})

    return docs.map_batches(assign, batch_format="pyarrow",
                            zero_copy_batch=True)
