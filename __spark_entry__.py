"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Implementation lives in ``database_syncer_spark`` (see SURVEY.md §2 for
the operator inventory these keys cover).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: the reference's core computation — snapshot CDC diff
    (full-outer join + classify) on a deterministic prod/backup pair
    derived from sf0.001 orders. Returns the changes DataFrame."""
    from database_syncer_spark.queries.diff import diff_cdc_fullouter

    return diff_cdc_fullouter(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    from database_syncer_spark.registry import all_queries

    return all_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query key (omitted → rows-only check)."""
    from database_syncer_spark.registry import all_oracles

    return all_oracles()
