"""Per-partition metrics + lineage sidecar tables (north-rule A12/T3).

The reference keeps only a 10-entry localStorage run history
(/root/reference/src/components/Validator/ValidationResults.tsx:28,246-250);
here every instrumented stage emits one metrics row per batch into a
named collector actor, and each run appends a summary row to a parquet
history table with a windowed reader (O4 semantics).

The collector is a single lightweight actor receiving tiny rows
(fire-and-forget ``remote`` calls from workers) — it never sits on the
data path.
"""

from __future__ import annotations

import os
import time

import pyarrow as pa
import pyarrow.parquet as pq
import ray

from .. import schema as S


@ray.remote(num_cpus=0)
class MetricsCollector:
    def __init__(self):
        self.rows: list[dict] = []

    def add(self, stage: str, partition_id: int, rows_in: int, rows_out: int,
            wall_s: float) -> None:
        self.rows.append({"stage": stage, "partition_id": partition_id,
                          "rows_in": rows_in, "rows_out": rows_out,
                          "wall_s": wall_s})

    def table(self) -> pa.Table:
        return pa.Table.from_pylist(self.rows, schema=S.METRICS)

    def clear(self) -> None:
        self.rows = []


def collector() -> "ray.actor.ActorHandle":
    return MetricsCollector.options(
        name="svr_metrics", get_if_exists=True, lifetime="detached").remote()


def instrument(fn, stage: str, handle=None):
    """Wrap a batch fn so each call reports (rows_in, rows_out, wall_s).

    The report is a fire-and-forget actor call carrying ~5 scalars —
    no backpressure on the data path."""
    def wrapped(batch):
        h = handle if handle is not None else collector()
        t0 = time.time()
        out = fn(batch)
        rows_in = getattr(batch, "num_rows", None) or len(batch)
        rows_out = getattr(out, "num_rows", None) or len(out)
        h.add.remote(stage, -1, rows_in, rows_out, round(time.time() - t0, 6))
        return out

    wrapped.__name__ = f"instrumented_{getattr(fn, '__name__', stage)}"
    return wrapped


def stage_summary(handle=None) -> pa.Table:
    h = handle if handle is not None else collector()
    return ray.get(h.table.remote())


# ---- run history (T3/O4) ----

def append_run(history_dir: str, run: dict) -> None:
    os.makedirs(history_dir, exist_ok=True)
    ts = run.get("timestamp") or time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime())
    run = {**run, "timestamp": ts}
    tbl = pa.Table.from_pylist([run])
    pq.write_table(tbl, os.path.join(history_dir, f"run-{time.time_ns()}.parquet"))


def recent_runs(history_dir: str, limit: int = 10) -> pa.Table:
    """Latest-N window (reference keeps 10, ValidationResults.tsx:28,246)."""
    files = sorted((f for f in os.listdir(history_dir) if f.endswith(".parquet")),
                   reverse=True)[:limit]
    tables = [pq.read_table(os.path.join(history_dir, f)) for f in files]
    if not tables:
        return pa.table({})
    return pa.concat_tables(tables, promote_options="default")
