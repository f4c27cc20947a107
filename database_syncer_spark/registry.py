"""Assemble the full queries()/oracle_sql() registry for __spark_entry__.py.

Import is deliberately lazy-tolerant: a broken module must not take down
the whole registry (the driver grades per-key).
"""

from __future__ import annotations

import importlib
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_MODULES = [
    "database_syncer_spark.queries.diff",
    "database_syncer_spark.queries.relational",
    "database_syncer_spark.queries.extended",
    "database_syncer_spark.queries.aggregates",
    "database_syncer_spark.queries.functions",
    "database_syncer_spark.queries.dump",
    "database_syncer_spark.queries.streaming",
    "database_syncer_spark.queries.pipeline",
]


def _load() -> tuple[dict, dict]:
    queries: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    oracles: dict[str, str] = {}
    for modname in _MODULES:
        try:
            mod = importlib.import_module(modname)
        except Exception as exc:  # pragma: no cover — per-key isolation
            import sys
            print(f"[registry] failed to import {modname}: {exc}", file=sys.stderr)
            continue
        queries.update(getattr(mod, "QUERIES", {}))
        oracles.update(getattr(mod, "ORACLES", {}))
    return queries, oracles


def all_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _load()[0]


def all_oracles() -> dict[str, str]:
    return _load()[1]
