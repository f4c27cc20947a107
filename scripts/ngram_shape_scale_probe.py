#!/usr/bin/env python
"""Scale-regime probe for the r13 ngram shingle-stage rewrite: the two
candidate shapes' SHINGLE stage (explode -> per-doc distinct -> n_sh,
up to and including the df-cap window) at a multiplied corpus, where
per-element HOF interpretation and exchange volume actually bite.
The self-join downstream is identical across shapes and is NOT timed
(its cost would drown the stage being changed, and multiplying a
corpus of near-dups explodes pair volume quadratically).

Usage: python scripts/ngram_shape_scale_probe.py [mult] [reps]
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import Window as W
from pyspark.sql import functions as F


def old_sh(documents, k=3, df_cap=10_000):
    from database_syncer_spark.pipeline.dedup import with_shingles
    sh = with_shingles(documents, k).select(
        "doc_id", F.explode("shingles").alias("sh"),
        F.size("shingles").alias("n_sh"))
    return sh.withColumn(
        "__df", F.count("*").over(W.partitionBy("sh"))
    ).where(F.col("__df") <= df_cap).drop("__df")


def _raw(documents, k):
    toks = documents.repartition("doc_id").select(
        "doc_id", F.split("text", " ").alias("__toks"))
    pos = toks.select(
        "doc_id", "__toks",
        F.explode(F.sequence(
            F.lit(1), F.greatest(F.size("__toks") - (k - 1), F.lit(1)))
        ).alias("__i"))
    return pos.select(
        "doc_id",
        F.concat_ws(" ", F.slice("__toks", F.col("__i"), k)).alias("sh"))


def new1_sh(documents, k=3, df_cap=10_000):
    dist = _raw(documents, k).dropDuplicates(["doc_id", "sh"])
    sh = dist.withColumn("n_sh", F.count("*").over(W.partitionBy("doc_id")))
    return sh.withColumn(
        "__df", F.count("*").over(W.partitionBy("sh"))
    ).where(F.col("__df") <= df_cap).drop("__df")


def new2_sh(documents, k=3, df_cap=10_000):
    sets = _raw(documents, k).groupBy("doc_id").agg(
        F.collect_set("sh").alias("shingles"))
    sh = sets.select("doc_id", F.explode("shingles").alias("sh"),
                     F.size("shingles").alias("n_sh"))
    return sh.withColumn(
        "__df", F.count("*").over(W.partitionBy("sh"))
    ).where(F.col("__df") <= df_cap).drop("__df")


def main() -> None:
    mult = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3

    from database_syncer_spark.catalog import load_table
    from database_syncer_spark.session import get_spark

    spark = get_spark("ngram_scale_probe")
    spark.sparkContext.setLogLevel("ERROR")
    base = load_table(spark, "/root/testdata/sf0.1", "documents")
    n = base.count()
    copies = spark.range(mult).select(F.col("id").alias("__m"))
    docs = (base.crossJoin(copies)
            .select((F.col("doc_id") * mult + F.col("__m")).alias("doc_id"),
                    F.concat(F.col("text"), F.lit(" uniq"),
                             (F.col("doc_id") * mult + F.col("__m"))
                             .cast("string")).alias("text"))
            .repartition(32)
            .write.mode("overwrite")
            .parquet("/tmp/dss_ngram_scale_probe"))
    docs = spark.read.parquet("/tmp/dss_ngram_scale_probe")
    print(f"probe corpus: {n} x {mult} = {docs.count()} docs", flush=True)

    def t(fn) -> float:
        t0 = time.perf_counter()
        fn(docs).write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    t(old_sh); t(new1_sh); t(new2_sh)
    for r in range(reps):
        a, b, c = t(old_sh), t(new1_sh), t(new2_sh)
        print(f"rep{r}: old={a:.2f}s new1={b:.2f}s new2={c:.2f}s", flush=True)


if __name__ == "__main__":
    main()
