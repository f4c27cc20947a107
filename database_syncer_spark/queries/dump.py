"""Query key for the SQL-dump source (SURVEY.md §2 B1 scan_sql_dump).

Round-trip shape: a deterministic slice of the orders fixture is rendered
as a mysqldump-style file (driver-side, small), then ingested back through
the full distributed dump pipeline (statement split -> Arrow-batched
tokenizer -> typed cast). The oracle is simply the source slice — so the
driver's value-hash verifies the ENTIRE ingest path end to end.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from database_syncer_spark.catalog import load_table
from database_syncer_spark.sources.dump import read_sql_dump, write_sql_dump

_SLICE = 200  # o_orderkey < 200 at any sf


#: bump when the dump rendering format changes — invalidates cached files
_DUMP_FMT = "v2"


def scan_sql_dump(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Measures INGEST: the fixture dump is rendered once per (sf, format
    version) and reused — its content is a pure function of the read-only
    fixture, so re-rendering on every call would only time the writer."""
    tag = os.path.basename(os.path.normpath(sf_dir))
    path = os.path.join(
        tempfile.gettempdir(), f"dss_dump_{_DUMP_FMT}_{tag}_orders.sql")
    if not (os.path.exists(path) and os.path.getsize(path) > 0):
        orders = load_table(spark, sf_dir, "orders").where(
            F.col("o_orderkey") < _SLICE)
        write_sql_dump(orders, "orders", ["o_orderkey"], path)
    back = read_sql_dump(spark, path)["orders"]
    return back.withColumn(
        "o_orderdate", F.col("o_orderdate").cast("timestamp_ntz"))


def scan_sql_dump_composite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Second ingest shape: COMPOSITE primary key (l_orderkey,
    l_linenumber — the case the reference's PK regex cannot match and
    silently mis-keys, sync.py:89-104 / SURVEY §1.3), DECIMAL columns
    with exact precision/scale through DDL parse + typed cast, and real
    NULLs in a value column. Same render-once/ingest-per-call shape as
    scan_sql_dump."""
    tag = os.path.basename(os.path.normpath(sf_dir))
    path = os.path.join(
        tempfile.gettempdir(), f"dss_dump_{_DUMP_FMT}_{tag}_lineitem_ck.sql")
    if not (os.path.exists(path) and os.path.getsize(path) > 0):
        from pyspark.sql import Window as W

        li = load_table(spark, sf_dir, "lineitem").where(
            F.col("l_orderkey") < _SLICE)
        # The synthetic fixture's (orderkey, linenumber) is NOT unique;
        # keep single-row keys so the dump's last-wins dedup (which
        # depends on statement order) never fires and the oracle is
        # deterministic.
        li = li.withColumn(
            "__n", F.count("*").over(
                W.partitionBy("l_orderkey", "l_linenumber"))
        ).where(F.col("__n") == 1)
        li = li.select(
            "l_orderkey", "l_linenumber",
            F.col("l_quantity").cast("decimal(12,2)").alias("l_quantity"),
            F.col("l_extendedprice").cast("decimal(14,2)")
             .alias("l_extendedprice"),
            F.expr("nullif(l_returnflag, 'N')").alias("l_returnflag"),
        )
        write_sql_dump(li, "lineitem_ck", ["l_orderkey", "l_linenumber"], path)
    return read_sql_dump(spark, path)["lineitem_ck"]


QUERIES = {
    "scan_sql_dump": scan_sql_dump,
    "scan_sql_dump_composite": scan_sql_dump_composite,
}

ORACLES = {
    "scan_sql_dump": f"""
SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderdate,
       o_orderpriority
FROM orders WHERE o_orderkey < {_SLICE}
""",
    "scan_sql_dump_composite": f"""
SELECT l_orderkey, l_linenumber,
       CAST(l_quantity AS DECIMAL(12,2)) AS l_quantity,
       CAST(l_extendedprice AS DECIMAL(14,2)) AS l_extendedprice,
       nullif(l_returnflag, 'N') AS l_returnflag
FROM lineitem WHERE l_orderkey < {_SLICE}
QUALIFY count(*) OVER (PARTITION BY l_orderkey, l_linenumber) = 1
""",
}
