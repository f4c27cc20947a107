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


QUERIES = {"scan_sql_dump": scan_sql_dump}

ORACLES = {
    "scan_sql_dump": f"""
SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderdate,
       o_orderpriority
FROM orders WHERE o_orderkey < {_SLICE}
""",
}
