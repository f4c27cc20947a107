"""Bucketed snapshot storage: the zero-shuffle layout for the diff.

SCALE.md's core claim for the snapshot diff is that its one shuffle per
side disappears entirely when both snapshots are stored bucketed by the
primary key — the full-outer join then reads co-located buckets and
merges in place. This module makes that layout a first-class helper, and
tests/test_plans.py proves the plan (zero Exchange nodes).

At 100 TB this is the steady-state deployment: each sync run writes its
post-image bucketed by PK, so the NEXT run's diff is shuffle-free; only
the first-ever snapshot pays a one-time clustering write. Bucket count
is a storage property — pick it once per table from target bucket size
(~128-512 MB), not per query.
"""

from __future__ import annotations

import os
import re
import shutil

from pyspark.sql import DataFrame, SparkSession

#: Table names are interpolated into SQL and mapped to warehouse paths
#: that get rmtree'd — restrict to plain identifiers so an unexpected
#: string can't become SQL or a path traversal (ADVICE r2).
_IDENT = re.compile(r"^\w+$")


def _check_ident(table: str) -> str:
    if not _IDENT.match(table):
        raise ValueError(
            f"bucketed snapshot table name must match \\w+: {table!r}")
    return table


def _clear_stale_location(spark: SparkSession, table: str) -> None:
    """Remove a leftover managed-table directory from a PREVIOUS session.

    The default catalog is in-memory, so a fresh session doesn't know the
    table, but its warehouse directory survives on disk —
    ``saveAsTable`` then fails with LOCATION_ALREADY_EXISTS even under
    ``mode("overwrite")``. Dropping the (unknown) table is a no-op, so
    the location itself has to go."""
    wh = spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse")
    if wh.startswith("file:"):
        wh = wh.removeprefix("file:")
    loc = os.path.join(wh, table.lower())
    if os.path.isdir(loc):
        shutil.rmtree(loc, ignore_errors=True)


def write_bucketed_snapshot(df: DataFrame, table: str, pk_cols: list[str],
                            n_buckets: int) -> DataFrame:
    """Persist a snapshot bucketed (and sorted) by PK as a managed
    parquet table; returns the re-read table whose scan carries the
    bucketing metadata Catalyst needs to elide the diff shuffle.

    Single-driver assumption: the managed-table location is derived from
    the table name, so two concurrent sessions sharing one warehouse dir
    must use distinct table names (the query keys embed the sf tag)."""
    spark = df.sparkSession
    _check_ident(table)
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    _clear_stale_location(spark, table)
    (df.write.mode("overwrite")
       .bucketBy(n_buckets, *pk_cols)
       .sortBy(*pk_cols)
       .format("parquet")
       .saveAsTable(table))
    return spark.table(table)


def drop_snapshot(spark: SparkSession, table: str) -> None:
    spark.sql(f"DROP TABLE IF EXISTS {_check_ident(table)}")
