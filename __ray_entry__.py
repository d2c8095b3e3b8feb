"""Driver contract for the graft builder (Ray Data target).

The driver's verify calls ``entry()`` as a smoke check (Ray is already
initialised, local mode), runs each ``queries()[name](sf_dir)`` at sf=0.01
and compares it against the matching ``oracle_sql()[name]`` via DuckDB
(row-count + schema + order-insensitive value-hash -> CORRECTNESS_r{N}.json).

Ray is initialised by the driver BEFORE this module is imported: nothing
here (or in morph_kgc_ray) calls ray.init()/ray.shutdown().
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

import morph_kgc_ray  # noqa: F401  (sets the hash-shuffle DataContext before any Dataset)


def entry() -> Any:
    """Flagship pipeline smoke check on sf0.001: the RML engine's customer
    materialization plus the web KG-construction pipeline; returns the web
    pipeline's triples Dataset (stable schema: partition/subject/predicate/
    object)."""
    from morph_kgc_ray.pipelines.benchmarks import QUERIES
    return QUERIES['web_kg_construction']('/root/testdata/sf0.001')


def queries() -> dict[str, Callable[[str], Any]]:
    from morph_kgc_ray.pipelines.benchmarks import QUERIES
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from morph_kgc_ray.pipelines.benchmarks import get_oracle_sql
    return get_oracle_sql()
