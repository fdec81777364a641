"""Graph materialization (S12, D1): canonical rewrite → exact dedup →
subject-hash bucketing with hub salting → resumable partitioned write.

Output layout: ``<out>/bucket=<i>/*.parquet`` plus ``_MANIFEST.json``
listing completed buckets — a rerun skips buckets already present
(resumable-from-checkpoint per the north rule). A metrics sidecar table
(schema.METRICS) is written next to the data.
"""

from __future__ import annotations

import json
import os
import time

import numpy as np
import pyarrow as pa

import ray
import ray.data as rd


from ..stages import shacl as shacl_stage


def _pin_absent_fsspec_http() -> None:
    """Make ``fsspec.implementations.http`` import DETERMINISTIC when
    aiohttp is absent. The real module fails to import (no aiohttp) and
    Python does not cache failed imports, so EVERY Ray path resolution
    re-attempts it (path_util._is_http_filesystem); two overlapped
    write threads re-attempting concurrently can race the
    partial-module window, and the loser sees ImportError — which Ray's
    ``except ModuleNotFoundError`` does not tolerate. Installing a stub
    once ends the re-import churn: ``from fsspec.implementations.http
    import HTTPFileSystem`` succeeds, the stub class never
    isinstance-matches a real filesystem, and constructing it raises
    the same ModuleNotFoundError the real import would."""
    import importlib.util
    import sys
    import types

    if "fsspec.implementations.http" in sys.modules:
        return
    if importlib.util.find_spec("aiohttp") is not None:
        return  # the real module can import; nothing to pin
    try:
        import fsspec.implementations as _fsi  # noqa: F401
    except Exception:
        return
    mod = types.ModuleType("fsspec.implementations.http")

    class HTTPFileSystem:  # pragma: no cover — never constructed
        def __init__(self, *a, **k):
            raise ModuleNotFoundError("aiohttp is not installed")

    mod.HTTPFileSystem = HTTPFileSystem
    sys.modules["fsspec.implementations.http"] = mod
    _fsi.http = mod


def subj_bucket(subj: str, n_buckets: int) -> int:
    """Single-value twin of the vectorized bucket hash (io.hash_bucket_column)."""
    import pandas as pd

    return int(pd.util.hash_pandas_object(pd.Series([subj]),
                                          index=False).iloc[0] % n_buckets)


def canonical_rewrite(triples: rd.Dataset, canon: rd.Dataset,
                      broadcast_threshold: int = 2_000_000) -> rd.Dataset:
    """Rewrite subj/obj through the canonical map.

    The map covers only linked mention IRIs + their roots — normally a
    tiny fraction of the entity space — so it is broadcast (``ray.put``)
    and applied map-side (SURVEY.md §4.2). Past ``broadcast_threshold``
    entries the rewrite switches to two distributed left joins (subj,
    then obj) so no node ever holds the whole map; both paths produce
    identical output (partition-invariance tested).
    """
    pairs = {}
    over = False
    for b in canon.iter_batches(batch_format="pyarrow"):
        for e, r in zip(b["entity_id"].to_pylist(), b["root_id"].to_pylist()):
            if e != r:
                pairs[e] = r
        if len(pairs) > broadcast_threshold:
            over = True
            pairs = None
            break

    if over:
        return _canonical_rewrite_join(triples, canon)

    ref = ray.put(pairs)

    def rewrite(b: pa.Table) -> pa.Table:
        m = ray.get(ref)
        if not m:
            return b
        subj = [m.get(x, x) for x in b["subj"].to_pylist()]
        obj = [m.get(x, x) for x in b["obj_value"].to_pylist()]
        b = b.set_column(b.column_names.index("subj"), "subj", pa.array(subj, pa.string()))
        return b.set_column(b.column_names.index("obj_value"), "obj_value",
                            pa.array(obj, pa.string()))

    return triples.map_batches(rewrite, batch_format="pyarrow", zero_copy_batch=True)


def _canonical_rewrite_join(triples: rd.Dataset, canon: rd.Dataset) -> rd.Dataset:
    """At-scale rewrite: two distributed left joins against the non-trivial
    (entity_id != root_id) slice of the canonical map, coalescing the
    root over the original term."""
    import pyarrow.compute as pc

    from ..sources import io as io_mod

    nontrivial = canon.map_batches(
        lambda b: b.filter(pc.not_equal(b["entity_id"], b["root_id"])),
        batch_format="pyarrow", zero_copy_batch=True).materialize()
    nparts = max(8, io_mod.default_num_blocks() // 2)

    def rewrite_col(ds: rd.Dataset, col: str) -> rd.Dataset:
        j = ds.join(nontrivial, "left_outer", nparts,
                    on=(col,), right_on=("entity_id",))
        cols = [c for c in ds.schema().names]

        def apply(b: pa.Table) -> pa.Table:
            new = pc.coalesce(b["root_id"], b[col])
            b = b.set_column(b.column_names.index(col), col,
                             new.cast(pa.string()))
            return b.select(cols)

        # pinned between the two joins (chained JoinOperators thrash —
        # see dedup.py)
        return j.map_batches(apply, batch_format="pyarrow").materialize()

    return rewrite_col(rewrite_col(triples, "subj"), "obj_value")


def detect_hubs(triples: rd.Dataset, threshold: int, top_m: int = 4096,
                driver_threshold: int = 200_000) -> set[str]:
    """Subjects whose triple count exceeds ``threshold`` (skew candidates).

    Shuffle-free approximate heavy hitters: each batch emits its top-M
    subject partial counts (vectorized pandas ``value_counts``). A true
    hub (≫ threshold) appears in every block's top-M, so its global
    count is exact; only subjects *near* the threshold can be
    undercounted (bounded by rows/M per block) — harmless, since hub
    salting is a performance heuristic, not a correctness property.

    Partial MERGE is two-path (the connected_components pattern):
    partials under ``driver_threshold`` rows sum on the driver (no
    shuffle at all — the common case, and ~1 s cheaper per write);
    past it, a distributed groupby merges so the driver never holds
    the union of every block's top-M (which grows with block count at
    100 TB). Both are the standard space-saving / Misra-Gries
    mergeable-partial shape."""
    import pandas as pd
    import pyarrow.compute as pc
    from ray.data.aggregate import Sum

    def partial(b: pa.Table) -> pa.Table:
        vc = pd.Series(b["subj"].to_pylist()).value_counts().head(top_m)
        return pa.table({"subj": pa.array(vc.index.astype(str), pa.string()),
                         "n": pa.array(vc.to_numpy(), pa.int64())})

    # Materialize the partials table before the threshold probe: it is
    # blocks × top_m rows — far smaller than the corpus — and pinning it
    # means the overflow path merges the SAME pass instead of re-running
    # the corpus-scale pre-pass a second time (overflow is the common
    # case at scale, where the double-scan would dominate).
    partials = triples.map_batches(partial, batch_format="pyarrow",
                                   zero_copy_batch=True).materialize()
    n = partials.count()
    if n <= driver_threshold:
        if n == 0:
            return set()
        t = pa.concat_tables(
            list(partials.iter_batches(batch_format="pyarrow")))
        s = pd.Series(np.asarray(t["n"]),
                      index=t["subj"].to_pylist()).groupby(level=0).sum()
        return set(s[s > threshold].index)

    # overflow: distributed merge over the pinned partials (no re-scan)
    totals = (partials.groupby("subj").aggregate(Sum("n", alias_name="n")))
    hubs: set[str] = set()
    for b in totals.map_batches(
            lambda t: t.filter(pc.greater(t["n"], threshold)).select(["subj"]),
            batch_format="pyarrow").iter_batches(batch_format="pyarrow"):
        hubs.update(b["subj"].to_pylist())
    return hubs


def materialize_graph(triples: rd.Dataset, out_dir: str, *,
                      n_buckets: int | None = None,
                      hub_threshold: int = 10_000, salt: int = 4,
                      deduped: bool = False, write_groups: int = 4,
                      parallel_writes: int = 1,
                      only_groups=None) -> dict:
    """Dedup → bucket (+salt hubs) → hive-partitioned parquet + manifest.

    The write is split into ``write_groups`` bucket groups, each recorded
    in the manifest as it completes — a rerun after a mid-write failure
    skips finished groups (per-partition resume, north rule). Hub
    assignment is deterministic from the data, and a resumed run restores
    the bucket layout (n_buckets / salt / write_groups) from the
    manifest, so resume is consistent even when the cluster size — and
    with it the default fan-out — changed between attempts.

    Hub subjects (detected by a count pre-pass) are salted across
    ``salt`` sub-buckets so one hub entity cannot put a whole partition
    on one writer (explicit skew handling per the north rule).
    """
    from ..sources import io as io_mod

    if n_buckets is None:
        # output-layout granularity scales with the cluster: one bucket ≈
        # one writer task / one resume unit
        n_buckets = max(16, io_mod.shuffle_buckets(factor=1, cap=256))
    manifest_path = os.path.join(out_dir, "_MANIFEST.json")
    manifest = {"complete": False, "groups_done": [], "n_buckets": n_buckets,
                "salt": salt, "write_groups": write_groups, "hubs": [],
                "wall_s": 0.0}
    if os.path.exists(manifest_path):
        with open(manifest_path) as f:
            manifest = json.load(f)
        if manifest.get("complete"):
            return manifest  # resume: everything already written
        # resume MUST reuse the original layout or buckets shift
        n_buckets = manifest.get("n_buckets", n_buckets)
        salt = manifest.get("salt", salt)
        write_groups = manifest.get("write_groups", write_groups)

    def save():
        with open(manifest_path, "w") as f:
            json.dump(manifest, f, indent=1)

    t0 = time.time()
    if only_groups is not None:
        # incremental rewrite: slice the input to the invalidated write
        # groups BEFORE the dedup + bucketize passes, so the increment —
        # not the corpus — flows through them. Group assignment is pure
        # subject-hash arithmetic (group = base_bucket % write_groups),
        # so the pre-filter needs no dedup; and dedup restricted to the
        # slice equals global dedup restricted to the slice (identical
        # rows share a subject, hence a group).
        import numpy as np

        og = np.array(sorted({int(g) for g in only_groups}), dtype=np.int64)
        nb_, wg_ = n_buckets, write_groups

        def slice_groups(b: pa.Table) -> pa.Table:
            base = np.asarray(io_mod.hash_bucket_column(b["subj"], nb_),
                              dtype=np.int64)
            return b.filter(pa.array(np.isin(base % wg_, og)))

        triples = triples.map_batches(slice_groups, batch_format="pyarrow",
                                      zero_copy_batch=True)
    if not deduped:
        # pin: the deduped set feeds the hub pre-pass AND the bucketize
        # pass (plus one scan per write group) — unpinned, every consumer
        # re-runs the dedup shuffle from scratch
        triples = shacl_stage.dedup_triples(triples).materialize()
    # resumed/incremental runs reuse the manifest's hub set: detection is
    # a corpus-scale pre-pass, and hub salting only shapes the write
    # layout WITHIN a base bucket, so any hub set yields a valid layout —
    # reuse skips the pass without touching correctness (a subject that
    # newly crossed the threshold just isn't salted until a full rewrite)
    if manifest.get("hubs_detected"):
        hubs = set(manifest["hubs"])
    else:
        hubs = detect_hubs(triples, hub_threshold)
        manifest["hubs"] = sorted(hubs)
        manifest["hubs_detected"] = True
        os.makedirs(out_dir, exist_ok=True)
        save()
    hubs_ref = ray.put(hubs)

    nb, slt = n_buckets, salt

    def bucketize(b: pa.Table) -> pa.Table:
        """Vectorized: pandas-hash base bucket, pc.is_in hub membership,
        pandas-hash (pred,obj) sub-salt — no per-row Python at the widest
        point of the pipeline."""
        import numpy as np
        import pyarrow.compute as pc

        hub_set = ray.get(hubs_ref)
        base = np.asarray(io_mod.hash_bucket_column(b["subj"], nb),
                          dtype=np.int64)
        bucket = base * slt
        if hub_set:
            is_hub = np.asarray(
                pc.is_in(b["subj"], value_set=pa.array(sorted(hub_set))))
            if is_hub.any():
                # \x1f separator: pandas' string hash treats \x00 as a
                # C-string terminator and would collapse all salts
                po = pc.binary_join_element_wise(b["pred"], b["obj_value"], "\x1f")
                sal = np.asarray(io_mod.hash_bucket_column(po, slt),
                                 dtype=np.int64)
                bucket = bucket + np.where(is_hub, sal, 0)
        return b.append_column("bucket", pa.array(bucket.astype("int32")))

    bucketed = triples.map_batches(bucketize, batch_format="pyarrow",
                                   zero_copy_batch=True).materialize()
    os.makedirs(out_dir, exist_ok=True)

    import shutil
    import threading

    import numpy as np

    lock = threading.Lock()

    def write_group(g: int) -> None:
        def group_filter(b: pa.Table, g=g) -> pa.Table:
            # bucket = base*salt + sub-salt, so the UNSALTED base bucket
            # assigns the group — all of a hub's salted sub-buckets stay
            # in one group, and groups are non-degenerate for any
            # (salt, write_groups) combination.
            mask = ((np.asarray(b["bucket"]) // salt) % write_groups) == g
            return b.filter(pa.array(mask))

        part = bucketed.map_batches(group_filter, batch_format="pyarrow",
                                    zero_copy_batch=True)
        # Stage-then-commit: write the group into a staging dir, then move
        # each completed bucket=* partition into place (replacing any
        # leftover partial files from a crashed attempt) BEFORE the
        # manifest records the group. A rerun after a crash at any point
        # rewrites the whole group wholesale — never alongside leftovers.
        staging = os.path.join(out_dir, f"_staging_g{g}")
        for attempt in range(3):
            shutil.rmtree(staging, ignore_errors=True)
            try:
                # explicit filesystem for scheme-less (local) paths:
                # skips Ray's fsspec-based URI resolution, whose http
                # module first-import is the race the retry guards
                if "://" in out_dir:
                    part.write_parquet(staging, partition_cols=["bucket"])
                else:
                    from pyarrow import fs as pafs

                    part.write_parquet(staging, partition_cols=["bucket"],
                                       filesystem=pafs.LocalFileSystem())
                break
            except ImportError:
                # concurrent writers can race fsspec's http module
                # first-import (aiohttp absent): the loser sees a
                # partially-torn-down module and gets ImportError instead
                # of the ModuleNotFoundError Ray tolerates; retry after
                # the window closes
                if attempt == 2:
                    raise
                time.sleep(0.2 * (attempt + 1))
        if os.path.isdir(staging):  # empty groups write nothing
            for d in sorted(os.listdir(staging)):
                if not d.startswith("bucket="):
                    continue
                dst = os.path.join(out_dir, d)
                shutil.rmtree(dst, ignore_errors=True)
                os.rename(os.path.join(staging, d), dst)
            shutil.rmtree(staging, ignore_errors=True)
        with lock:
            manifest["groups_done"] = sorted(set(manifest["groups_done"]) | {g})
            save()

    pending = [g for g in range(write_groups)
               if g not in manifest["groups_done"]]  # resume: skip done
    _pin_absent_fsspec_http()  # threaded writes: end the import race
    if parallel_writes > 1 and len(pending) > 1:
        # overlap group writes (each is its own Ray execution over the
        # pinned bucketed set; resume granularity stays per-group)
        from concurrent.futures import ThreadPoolExecutor


        with ThreadPoolExecutor(max_workers=parallel_writes) as ex:
            list(ex.map(write_group, pending))
    else:
        for g in pending:
            write_group(g)

    manifest["complete"] = True
    manifest["hubs"] = sorted(hubs)
    manifest["wall_s"] = round(time.time() - t0, 3)
    save()
    return manifest


def incremental_materialize(triples: rd.Dataset, out_dir: str,
                            affected_subjects, redetect_hubs: bool = False,
                            **kw) -> dict:
    """Partition-invalidated incremental rewrite: only the write groups
    whose (unsalted) subject bucket can contain an affected subject are
    recomputed and atomically replaced; every other group's parquet
    partitions stay on disk untouched.

    The manifest already records the layout (n_buckets / salt /
    write_groups) and per-group completion — invalidation is just
    "drop the affected groups from ``groups_done`` and resume":
    :func:`materialize_graph`'s stage-then-commit rerun rewrites each
    invalidated group wholesale from the new triple set. Group
    assignment replays the same hash arithmetic as the full write
    (``group = base_bucket % write_groups``; hub salting only splits
    WITHIN a base bucket, so it never moves a subject across groups).

    ``triples`` must be the NEW full (post-change) rewritten triple
    set — the invalidated groups re-filter it; the untouched groups
    never read it (their tasks are skipped by the manifest)."""
    from ..sources import io as io_mod

    manifest_path = os.path.join(out_dir, "_MANIFEST.json")
    with open(manifest_path) as f:
        manifest = json.load(f)
    nb, wg = manifest["n_buckets"], manifest["write_groups"]
    subs = sorted(set(affected_subjects))
    if subs:
        import numpy as np

        base = np.asarray(io_mod.hash_bucket_column(
            pa.array(subs, pa.string()), nb), dtype=np.int64)
        invalid = sorted({int(x) % wg for x in base})
    else:
        invalid = []
    if not invalid:
        manifest["groups_rewritten"] = []
        return manifest  # nothing to rewrite — no pass over the corpus
    manifest["complete"] = False
    manifest["groups_done"] = sorted(set(manifest["groups_done"])
                                     - set(invalid))
    if redetect_hubs:
        # opt-in: a change big enough to mint new hub subjects re-runs
        # the detection pre-pass (default reuses the manifest's hub set
        # — salting is write-layout only, never correctness)
        manifest["hubs_detected"] = False
    with open(manifest_path, "w") as f:
        json.dump(manifest, f, indent=1)
    # the invalidated groups re-read ONLY their subject-hash slice: the
    # dedup + bucketize passes run over the increment's groups, not the
    # corpus (redetect_hubs is the exception — hub detection is a
    # corpus-scale count and must see every subject)
    out = materialize_graph(triples, out_dir,
                            only_groups=None if redetect_hubs else invalid,
                            **kw)
    out["groups_rewritten"] = invalid
    return out


def read_graph(out_dir: str) -> rd.Dataset:
    return rd.read_parquet(out_dir)


def triple_diff(a: rd.Dataset, b: rd.Dataset,
                n_buckets: int | None = None) -> rd.Dataset:
    """Graph snapshot DIFF: set difference of two triple Datasets over
    the six value columns — rows only in ``a`` emit ``op='del'``, rows
    only in ``b`` emit ``op='add'`` (the change feed a downstream
    consumer replays to move snapshot a to snapshot b).

    One bucketed tagged-union merge keyed on the subject (both sides of
    a subject land in the same task; per-bucket pandas merge with
    indicator does the set compare) — no driver-side state, fan-out
    scales with the cluster."""
    import pandas as pd

    from ..stages.discovery import bucketed_block_apply

    cols = ["subj", "pred", "obj_kind", "obj_value", "obj_datatype",
            "obj_lang"]

    def tag(side: str):
        def fn(t: pa.Table) -> pa.Table:
            return pa.table({
                **{c: t[c].cast(pa.string()) for c in cols},
                "_side": pa.array([side] * t.num_rows, pa.string())})
        return fn

    both = (a.map_batches(tag("a"), batch_format="pyarrow",
                          zero_copy_batch=True)
            .union(b.map_batches(tag("b"), batch_format="pyarrow",
                                 zero_copy_batch=True)))

    def diff(g: pd.DataFrame) -> pd.DataFrame:
        la = g.loc[g["_side"] == "a", cols].drop_duplicates()
        rb = g.loc[g["_side"] == "b", cols].drop_duplicates()
        m = la.merge(rb, on=cols, how="outer", indicator=True)
        out = m[m["_merge"] != "both"].copy()
        out["op"] = np.where(out["_merge"] == "left_only", "del", "add")
        return out[["op"] + cols]

    return bucketed_block_apply(both, "subj", diff, n_buckets=n_buckets)
