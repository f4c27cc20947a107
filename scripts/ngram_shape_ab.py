#!/usr/bin/env python
"""r13 measure-first A/B for the ngram_jaccard/containment candidate
stage (VERDICT r12 item 1): the current _shingle_intersections builds
the per-doc distinct shingle ARRAY via with_shingles — an interpreted
HOF transform evaluated per element — then explodes it. Hypothesis
(from the text_decontaminate 4x win, guide §4.1): a codegen
posexplode + slice/concat_ws pass with the distinct done by a
map-side-combined groupBy(doc_id, sh) (+ a doc_id window for n_sh)
beats the interpreted transform even though it adds exchanges.

Interleaved same-session timings (the host is bimodal; cross-run
deltas are not evidence — BASELINE.md), plus value equality of the
final pair sets.

Usage: python scripts/ngram_shape_ab.py [sf_dir] [reps]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window as W
from pyspark.sql import functions as F


def old_inter(documents, k=3, df_cap=10_000):
    from database_syncer_spark.pipeline.dedup import with_shingles
    sh = with_shingles(documents, k).select(
        "doc_id", F.explode("shingles").alias("sh"),
        F.size("shingles").alias("n_sh"),
    )
    sh = sh.withColumn(
        "__df", F.count("*").over(W.partitionBy("sh"))
    ).where(F.col("__df") <= df_cap).drop("__df")
    a, b = sh.alias("a"), sh.alias("b")
    return (
        a.join(b, "sh")
        .where(F.col("a.doc_id") < F.col("b.doc_id"))
        .groupBy(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"),
            F.col("a.n_sh").alias("na"), F.col("b.n_sh").alias("nb"))
        .agg(F.count("*").alias("c"))
    )


def new_inter(documents, k=3, df_cap=10_000):
    """Codegen explode (the minhash_signatures shape) + groupBy distinct
    + window n_sh, with the corpus repartitioned by doc_id FIRST so the
    distinct agg and the n_sh window are both partition-local (the
    repetition_score trick: hashpartitioning(doc_id) satisfies both
    clusterings, so the exploded shingle rows never cross the wire)."""
    toks = documents.repartition("doc_id").select(
        "doc_id", F.split("text", " ").alias("__toks"))
    pos = toks.select(
        "doc_id", "__toks",
        F.explode(F.sequence(
            F.lit(1), F.greatest(F.size("__toks") - (k - 1), F.lit(1)))
        ).alias("__i"))
    raw = pos.select(
        "doc_id",
        F.concat_ws(" ", F.slice("__toks", F.col("__i"), k)).alias("sh"))
    dist = raw.dropDuplicates(["doc_id", "sh"])
    sh = dist.withColumn("n_sh", F.count("*").over(W.partitionBy("doc_id")))
    sh = sh.withColumn(
        "__df", F.count("*").over(W.partitionBy("sh"))
    ).where(F.col("__df") <= df_cap).drop("__df")
    a, b = sh.alias("a"), sh.alias("b")
    return (
        a.join(b, "sh")
        .where(F.col("a.doc_id") < F.col("b.doc_id"))
        .groupBy(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"),
            F.col("a.n_sh").alias("na"), F.col("b.n_sh").alias("nb"))
        .agg(F.count("*").alias("c"))
    )


def new2_inter(documents, k=3, df_cap=10_000):
    """Codegen explode + collect_set distinct (object agg), re-explode
    with n_sh = size(set); same doc_id pre-repartition."""
    toks = documents.repartition("doc_id").select(
        "doc_id", F.split("text", " ").alias("__toks"))
    pos = toks.select(
        "doc_id", "__toks",
        F.explode(F.sequence(
            F.lit(1), F.greatest(F.size("__toks") - (k - 1), F.lit(1)))
        ).alias("__i"))
    raw = pos.select(
        "doc_id",
        F.concat_ws(" ", F.slice("__toks", F.col("__i"), k)).alias("sh"))
    sets = raw.groupBy("doc_id").agg(F.collect_set("sh").alias("shingles"))
    sh = sets.select(
        "doc_id", F.explode("shingles").alias("sh"),
        F.size("shingles").alias("n_sh"))
    sh = sh.withColumn(
        "__df", F.count("*").over(W.partitionBy("sh"))
    ).where(F.col("__df") <= df_cap).drop("__df")
    a, b = sh.alias("a"), sh.alias("b")
    return (
        a.join(b, "sh")
        .where(F.col("a.doc_id") < F.col("b.doc_id"))
        .groupBy(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"),
            F.col("a.n_sh").alias("na"), F.col("b.n_sh").alias("nb"))
        .agg(F.count("*").alias("c"))
    )


def jac(inter, threshold=0.2):
    j = F.col("c").cast("double") / (F.col("na") + F.col("nb") - F.col("c"))
    return (inter.select("doc_a", "doc_b", F.round(j, 6).alias("jaccard"))
            .where(F.col("jaccard") >= threshold))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3

    from database_syncer_spark.catalog import load_table
    from database_syncer_spark.session import get_spark

    spark = get_spark("ngram_shape_ab")
    spark.sparkContext.setLogLevel("ERROR")
    docs = load_table(spark, sf_dir, "documents")

    # value equality first (full frames, sorted)
    o = sorted(map(tuple, jac(old_inter(docs)).collect()))
    n = sorted(map(tuple, jac(new_inter(docs)).collect()))
    n2 = sorted(map(tuple, jac(new2_inter(docs)).collect()))
    print(f"rows old={len(o)} new={len(n)} new2={len(n2)} "
          f"equal={o == n} equal2={o == n2}", flush=True)
    if o != n or o != n2:
        for nm, s in (("new", n), ("new2", n2)):
            only_o = set(o) - set(s)
            only_n = set(s) - set(o)
            if only_o or only_n:
                print(nm, "only_old", list(only_o)[:5],
                      "only_new", list(only_n)[:5])
        raise SystemExit("VALUES DIFFER — do not adopt")

    def t(fn) -> float:
        t0 = time.perf_counter()
        jac(fn(docs)).write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    t(old_inter); t(new_inter); t(new2_inter)  # warm codegen all shapes
    for r in range(reps):
        a = t(old_inter)
        b = t(new_inter)
        c = t(new2_inter)
        print(f"rep{r}: old={a:.3f}s new={b:.3f}s new2={c:.3f}s", flush=True)


if __name__ == "__main__":
    main()
