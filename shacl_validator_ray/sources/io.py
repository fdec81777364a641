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


def read_table(path: str, columns: list[str] | None = None, **kwargs) -> rd.Dataset:
    if HAVE_LANCE and path.endswith(".lance"):  # pragma: no cover
        return rd.read_lance(path, columns=columns, **kwargs)
    return rd.read_parquet(path, columns=columns, **kwargs)


def write_table(ds: rd.Dataset, path: str, **kwargs) -> None:
    if HAVE_LANCE and path.endswith(".lance"):  # pragma: no cover
        ds.write_lance(path, **kwargs)
        return
    ds.write_parquet(path, **kwargs)
