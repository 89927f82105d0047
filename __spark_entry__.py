"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship star-join on sf0.001; ``queries()`` /
``oracle_sql()`` expose the operator registry
(:mod:`pyspark_cdc_engine.operators`) — one named entry per implemented
SURVEY §2 inventory row, each with a DuckDB oracle where SQL-expressible.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

from pyspark.sql import DataFrame, SparkSession

from pyspark_cdc_engine.operators import REGISTRY


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return REGISTRY["region_revenue"].spark(spark, "/root/testdata/sf0.001")


def _certification_order(
    artifact_dir: "Path | None" = None,
    registry_names: "list[str] | None" = None,
) -> list[str]:
    """Registry names sorted least-recently-certified first.

    The driver's correctness gate samples a prefix of ``queries()`` in dict
    order, so iteration order decides which operators get a driver-side DuckDB
    certification each round.  To guarantee every operator is eventually
    certified (not just locally parity-tested), rotate: a query green in round
    N sorts after one last green in round M < N, and queries never yet sampled
    sort first.  Ties keep registry (registration) order.  Reading the
    committed ``CORRECTNESS_r*.json`` artifacts makes this self-maintaining —
    no per-round hand edits.

    ``artifact_dir``/``registry_names`` exist for the contract unit test
    (tests/test_certification_order.py) — production callers pass nothing.
    """
    import json
    import re

    reg_names = registry_names if registry_names is not None else list(REGISTRY)
    reg_set = set(reg_names)
    last_green: dict[str, int] = {}
    here = artifact_dir if artifact_dir is not None else Path(__file__).resolve().parent
    for p in sorted(here.glob("CORRECTNESS_r*.json")):
        m = re.search(r"r(\d+)", p.name)
        if not m:
            continue
        rnd = int(m.group(1))
        try:
            results = json.loads(p.read_text())
        except (OSError, ValueError):
            continue
        for name, row in results.items():
            if not isinstance(row, dict) or name not in reg_set:
                continue
            if row.get("rows_match") and row.get("hash_match") in (True, None):
                last_green[name] = max(last_green.get(name, 0), rnd)

    idx = {n: i for i, n in enumerate(reg_names)}
    return sorted(reg_names, key=lambda n: (last_green.get(n, 0), idx[n]))


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2.

    Ordered least-recently-driver-certified first (see
    :func:`_certification_order`) so prefix sampling rotates coverage.
    """
    return {name: REGISTRY[name].spark for name in _certification_order()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL per query (omitted → rows-only check)."""
    return {
        name: REGISTRY[name].oracle
        for name in _certification_order()
        if REGISTRY[name].oracle is not None
    }
