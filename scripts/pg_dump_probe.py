#!/usr/bin/env python
"""pg-dump ingest scale probe: the registry key's fixture dump is
slice-bounded (o_orderkey < 200), so this renders a REPLICATED orders
table (--scale x, keys shifted per replica) as a PostgreSQL plain dump
and times the full distributed ingest (marker collect -> broadcast
range join -> unescape -> typed cast -> noop sink). For a same-host
yardstick it renders the SAME rows as a mysqldump file and times the
mysql reader on it — the two dialects' ingest paths differ (statement
split + Arrow tokenizer vs line split + built-in unescape), so the
comparison is shape-vs-shape, not a regression gate.

Prints one JSON line; SCALE.md carries the table.
Usage: python scripts/pg_dump_probe.py [--scale 20] [--work /tmp/dss_pg]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SRC = "/root/testdata/sf0.1"


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--scale", type=int, default=20,
                    help="orders replication (20 => 3M rows)")
    ap.add_argument("--work", default="/tmp/dss_pg_probe")
    ap.add_argument("--skip-mysql", action="store_true")
    args = ap.parse_args()

    from pyspark.sql import functions as F
    from database_syncer_spark.session import get_spark
    from database_syncer_spark.catalog import load_table
    from database_syncer_spark.sources.dump import read_sql_dump, write_sql_dump
    from database_syncer_spark.sources.pg_dump import read_pg_dump, write_pg_dump

    spark = get_spark("pg_dump_probe", shuffle_partitions=64)
    spark.sparkContext.setLogLevel("ERROR")
    os.makedirs(args.work, exist_ok=True)
    pg_path = os.path.join(args.work, f"orders_x{args.scale}_pg.sql")
    my_path = os.path.join(args.work, f"orders_x{args.scale}_my.sql")

    orders = (load_table(spark, SRC, "orders")
              .select("*", F.explode(F.sequence(
                  F.lit(0), F.lit(args.scale - 1))).alias("rep"))
              .withColumn("o_orderkey", F.col("o_orderkey")
                          + F.col("rep").cast("long") * 1_000_000_000)
              .drop("rep"))
    n_rows = None
    out = {"metric": "pg_dump_ingest_probe", "scale": args.scale}

    if not os.path.exists(pg_path):
        t0 = time.perf_counter()
        write_pg_dump(orders, "orders", ["o_orderkey"], pg_path)
        out["pg_render_sec"] = round(time.perf_counter() - t0, 1)
    out["pg_bytes"] = os.path.getsize(pg_path)

    t0 = time.perf_counter()
    df = read_pg_dump(spark, pg_path)["orders"]
    df.write.format("noop").mode("overwrite").save()
    out["pg_ingest_sec"] = round(time.perf_counter() - t0, 1)
    n_rows = df.count()
    out["rows"] = n_rows

    if not args.skip_mysql:
        if not os.path.exists(my_path):
            t0 = time.perf_counter()
            write_sql_dump(orders, "orders", ["o_orderkey"], my_path)
            out["mysql_render_sec"] = round(time.perf_counter() - t0, 1)
        out["mysql_bytes"] = os.path.getsize(my_path)
        t0 = time.perf_counter()
        mdf = read_sql_dump(spark, my_path)["orders"]
        mdf.write.format("noop").mode("overwrite").save()
        out["mysql_ingest_sec"] = round(time.perf_counter() - t0, 1)
        assert mdf.count() == n_rows, "dialect row-count mismatch"

    print(json.dumps(out))


if __name__ == "__main__":
    main()
