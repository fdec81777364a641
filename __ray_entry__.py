"""Driver contract for the graft builder (Ray Data target).

The driver's verify calls ``entry()`` as a smoke check (Ray is already
initialised, local mode), runs each ``queries()[name](sf_dir)`` at
sf=0.01 and compares it against the matching ``oracle_sql()[name]`` via
DuckDB (row-count + schema + order-insensitive value-hash →
CORRECTNESS_r{N}.json).

Ray is initialised by the driver BEFORE this module is imported: no
``ray.init()`` / ``ray.shutdown()`` here or in library code.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any


def entry() -> Any:
    """Flagship KG pipeline on /root/testdata/sf0.001 → triples Dataset."""
    from shacl_validator_ray.pipelines import kg

    return kg.flagship("/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[str], Any]]:
    from shacl_validator_ray.pipelines import queries as q

    return q.QUERIES


def oracle_sql() -> dict[str, str]:
    from shacl_validator_ray.pipelines import queries as q

    return q.get_oracle_sql()
