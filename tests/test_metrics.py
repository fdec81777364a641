"""Metrics sidecar + run-history window (A12/T3/O4)."""

import pyarrow as pa
import ray
import ray.data as rd

from shacl_validator_ray.state import metrics


def test_instrumented_stage_collects_rows():
    h = metrics.collector()
    ray.get(h.clear.remote())

    def double(b: pa.Table) -> pa.Table:
        return pa.concat_tables([b, b])

    ds = rd.range(1000).map_batches(
        metrics.instrument(double, "double", h), batch_format="pyarrow",
        batch_size=250)
    assert ds.count() == 2000
    import time

    for _ in range(50):
        tbl = metrics.stage_summary(h)
        if tbl.num_rows >= 4:
            break
        time.sleep(0.1)
    assert tbl.num_rows >= 4
    rows = tbl.to_pylist()
    assert all(r["stage"] == "double" for r in rows)
    assert sum(r["rows_in"] for r in rows) == 1000
    assert sum(r["rows_out"] for r in rows) == 2000
    assert all(r["wall_s"] >= 0 for r in rows)


def test_run_history_window(tmp_path):
    d = str(tmp_path / "hist")
    for i in range(13):
        metrics.append_run(d, {"run": i, "docs": i * 10,
                               "timestamp": f"2026-01-{i + 1:02d}T00:00:00Z"})
    tbl = metrics.recent_runs(d, limit=10)
    assert tbl.num_rows == 10
    runs = sorted(tbl.column("run").to_pylist())
    assert runs == list(range(3, 13))  # latest 10 kept, oldest 3 dropped


def test_full_pipeline_instrumented(tmp_path):
    from shacl_validator_ray.pipelines import kg
    from shacl_validator_ray.state import metrics

    h = metrics.collector()
    ray.get(h.clear.remote())
    stats = kg.full_pipeline("/root/testdata/sf0.001", str(tmp_path / "g"),
                             instrument=True)
    assert stats["manifest"]["complete"]
    import time

    for _ in range(50):
        tbl = metrics.stage_summary(h)
        if tbl.num_rows > 0:
            break
        time.sleep(0.1)
    rows = tbl.to_pylist()
    assert rows and all(r["stage"] == "extract" for r in rows)
    assert sum(r["rows_in"] for r in rows) == 200  # sf0.001 corpus docs
