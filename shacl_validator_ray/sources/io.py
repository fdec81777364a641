"""Table IO shim: Lance when the bindings exist, Parquet otherwise.

BASELINE.json names Lance tables as the input format; this sandbox has
no ``lance`` bindings (SURVEY.md §7), so both paths expose identical
schemas and the rest of the engine only sees ``ray.data.Dataset``.
Column pruning is pushed into the read (SURVEY — "prune at the read").
"""

from __future__ import annotations

import ray.data as rd

try:  # pragma: no cover - lance not installed in this sandbox
    import lance  # noqa: F401

    HAVE_LANCE = True
except ImportError:
    HAVE_LANCE = False


def default_num_blocks(factor: int = 2, cap: int = 128) -> int:
    """Blocks ≈ factor × cluster CPUs. Small-file inputs otherwise collapse
    into one or two 128 MiB-target blocks and the whole pipeline runs at
    parallelism ≤ 2 — the read must fan out to keep every core busy."""
    import ray

    try:
        cpus = int(ray.cluster_resources().get("CPU", 8))
    except Exception:
        cpus = 8
    return max(4, min(cap, factor * cpus))


def auto_pool(num_cpus_per_actor: float = 0.5, cap: int = 64) -> tuple[int, int]:
    """Actor-pool sizing that scales with the cluster: a fixed (1, 4) pool
    caps a stage at parallelism 4 no matter how many cores exist — the
    single biggest scaling-efficiency killer on a bigger cluster."""
    import ray

    try:
        cpus = int(ray.cluster_resources().get("CPU", 8))
    except Exception:
        cpus = 8
    hi = max(2, min(cap, int(cpus / num_cpus_per_actor)))
    return (1, hi)


def shuffle_buckets(factor: int = 4, cap: int = 1024) -> int:
    """Fan-out for hash-bucketed shuffles (one bucket ≈ one reduce task):
    scales with cluster CPUs instead of a fixed constant, so per-bucket
    memory shrinks as the cluster grows — a fixed 16/64-bucket shuffle
    caps parallelism AND makes each bucket data/16 regardless of cluster
    size (the 100 TB failure mode)."""
    return default_num_blocks(factor=factor, cap=cap)


def hash_bucket_column(values, n_buckets: int):
    """Vectorized, process-stable hash bucket for a string/int Arrow array
    (pandas hash_array with its fixed key — deterministic across runs, so
    resumable layouts stay consistent). Returns an int32 Arrow array."""
    import pandas as pd
    import pyarrow as pa

    s = values.to_pandas() if hasattr(values, "to_pandas") else values
    h = pd.util.hash_pandas_object(pd.Series(s), index=False)
    return pa.array((h % n_buckets).astype("int32"))


def _strip_schema_metadata(b):
    # pandas-written parquet carries a `pandas` schema-metadata dict that
    # makes pa.Schema unhashable — Ray's block coalescing then logs
    # "Failed to hash the schemas (for deduplication)" from EVERY reduce
    # task (log flood at scale). Dropping the metadata is zero-copy.
    return b.replace_schema_metadata(None) if b.schema.metadata else b


def read_table(path: str, columns: list[str] | None = None,
               parallel: bool = True, **kwargs) -> rd.Dataset:
    if parallel and "override_num_blocks" not in kwargs:
        kwargs["override_num_blocks"] = default_num_blocks()
    if HAVE_LANCE and path.endswith(".lance"):  # pragma: no cover
        ds = rd.read_lance(path, columns=columns, **kwargs)
    else:
        ds = rd.read_parquet(path, columns=columns, **kwargs)
    return ds.map_batches(_strip_schema_metadata, batch_format="pyarrow",
                          zero_copy_batch=True)


def write_table(ds: rd.Dataset, path: str, **kwargs) -> None:
    if HAVE_LANCE and path.endswith(".lance"):  # pragma: no cover
        ds.write_lance(path, **kwargs)
        return
    ds.write_parquet(path, **kwargs)
