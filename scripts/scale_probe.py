#!/usr/bin/env python
"""sf1+-scale probe (VERDICT r3 item 5): the plan guards prove SHAPE, this
proves the shapes survive 10-500x the driver fixtures without memory or
skew cliffs.

Builds a synthetic big fixture dir by replicating /root/testdata/sf0.1
with key shifts and CONTENT perturbation (a naive copy would make every
doc an exact near-dup of its replicas and every embedding a duplicate
point — trivializing dedup and ANN instead of stressing them):

- orders   x ORDERS_MULT  (o_orderkey shifted per replica)          ~1.5M
- documents x DOCS_MULT   (doc_id shifted; ~half the tokens of each
  replica get a replica-specific suffix via xxhash64, pushing
  cross-replica Jaccard to ~1/3 — organic near-dups within a replica
  survive, replicas don't collapse into one giant cluster)          ~1M
- embeddings x EMB_MULT   (vec_id shifted; each component scaled by a
  deterministic +-5% factor keyed on (vec_id, pos, replica), so
  replicas are nearby-but-distinct points — cells stay balanced)    ~1M

Then runs the three 100-TB-story keys END TO END through the registry
(same code the driver grades): diff_bucketed_zeroshuffle,
dedup_minhash_lsh, sim_ivfpq_ann. Records wall seconds and the JVM's
peak RSS (VmHWM — cumulative, so per-key values are monotone; the delta
is what a key added). Prints one JSON line; SCALE.md carries the table.

Usage: python scripts/scale_probe.py [--out /tmp/dss_sf1] [--skip-gen]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SRC = "/root/testdata/sf0.1"
ORDERS_MULT = 10    # 150k -> 1.5M rows/side in the diff
DOCS_MULT = 200     # 5k   -> 1M docs through MinHash-LSH
EMB_MULT = 500     # 2k   -> 1M vectors through IVF-PQ
EVENTS_MULT = 100   # 100k -> 10M events through sessionization

KEYS = ["diff_bucketed_zeroshuffle", "dedup_minhash_lsh", "sim_ivfpq_ann",
        # r4 additions
        "win_sessionize", "text_ngram_lm_score", "text_chunk_split",
        "sink_cdc_compact", "dedup_incremental", "multimodal_frame_sample"]


def _jvm_peak_rss_kb() -> int | None:
    """VmHWM of the py4j-launched JVM (a direct child 'java' process)."""
    me = os.getpid()
    for pid in os.listdir("/proc"):
        if not pid.isdigit():
            continue
        try:
            with open(f"/proc/{pid}/stat") as fh:
                parts = fh.read().split()
            if parts[1] == "(java)" and int(parts[3]) == me:
                with open(f"/proc/{pid}/status") as fh:
                    for line in fh:
                        if line.startswith("VmHWM:"):
                            return int(line.split()[1])
        except (OSError, IndexError, ValueError):
            continue
    return None


def _generate(spark, out: str, tables: set[str],
              orders_mult: int = ORDERS_MULT,
              docs_mult: int = DOCS_MULT,
              emb_mult: int = EMB_MULT) -> list[str]:
    """Returns the list of tables actually (re)generated this run —
    tables already present in `out` are REUSED at whatever multiplier
    they were originally written with, so the caller must not label
    their timings with this run's multiplier."""
    from pyspark.sql import functions as F
    from database_syncer_spark.catalog import load_table

    generated: list[str] = []

    def reps(n):
        return F.explode(F.sequence(F.lit(0), F.lit(n - 1))).alias("rep")

    def missing(name):
        return (name in tables
                and not os.path.isdir(os.path.join(out, f"{name}.parquet")))

    if missing("events"):
        # replicas shift user_id (fresh users) and event_id; ts jitters
        # +rep seconds so replica sessions don't stack on identical
        # timestamps (gap structure per user is preserved).
        events = load_table(spark, SRC, "events")
        (events.select("*", reps(EVENTS_MULT))
         .withColumn("event_id",
                     F.col("event_id") + F.col("rep").cast("long") * 1_000_000_000)
         .withColumn("user_id",
                     F.col("user_id") + F.col("rep").cast("long") * 1_000_000)
         .withColumn("ts", F.col("ts") + F.make_interval(
             secs=F.col("rep").cast("double")))
         .drop("rep")
         .repartition(32)
         .write.mode("overwrite").parquet(os.path.join(out, "events.parquet")))
        generated.append("events")

    if missing("orders"):
        _gen_orders(spark, out, reps, orders_mult)
        generated.append("orders")
    if missing("documents"):
        _gen_documents(spark, out, reps, docs_mult)
        generated.append("documents")
    if missing("embeddings"):
        _gen_embeddings(spark, out, reps, emb_mult)
        generated.append("embeddings")
    if missing("lineitem"):
        # composite-PK dump ingest probe: replicas shift l_orderkey so
        # (l_orderkey, l_linenumber) stays unique
        li = load_table(spark, SRC, "lineitem")
        (li.select("*", reps(orders_mult))
         .withColumn("l_orderkey",
                     F.col("l_orderkey") + F.col("rep").cast("long") * 1_000_000_000)
         .drop("rep")
         .repartition(32)
         .write.mode("overwrite").parquet(os.path.join(out, "lineitem.parquet")))
        generated.append("lineitem")
    for dim in ("region", "nation", "supplier", "part"):
        # dims stay UNREPLICATED (the realistic shape: facts grow,
        # dimensions don't) — copied so dim-joining keys can run at
        # fact scale
        if missing(dim):
            load_table(spark, SRC, dim).write.mode("overwrite").parquet(
                os.path.join(out, f"{dim}.parquet"))
            generated.append(dim)
    if missing("customer"):
        # window/agg keys over customer: replicate 10x with shifted keys
        from pyspark.sql import functions as F
        from database_syncer_spark.catalog import load_table

        cust = load_table(spark, SRC, "customer")
        (cust.select("*", reps(10))
         .withColumn("c_custkey",
                     F.col("c_custkey") + F.col("rep").cast("long") * 1_000_000_000)
         .drop("rep")
         .repartition(32)
         .write.mode("overwrite").parquet(os.path.join(out, "customer.parquet")))
        generated.append("customer")
    return generated


def _gen_orders(spark, out, reps, mult=ORDERS_MULT):
    from pyspark.sql import functions as F
    from database_syncer_spark.catalog import load_table

    orders = load_table(spark, SRC, "orders")
    (orders.select("*", reps(mult))
     .withColumn("o_orderkey",
                 F.col("o_orderkey") + F.col("rep").cast("long") * 1_000_000_000)
     .drop("rep")
     .repartition(32)
     .write.mode("overwrite").parquet(os.path.join(out, "orders.parquet")))


def _gen_documents(spark, out, reps, mult=DOCS_MULT):
    from pyspark.sql import functions as F
    from database_syncer_spark.catalog import load_table

    docs = load_table(spark, SRC, "documents")
    toks = F.split(F.col("text"), " ")
    perturbed = F.transform(
        toks,
        lambda t, pos: F.when(
            F.pmod(F.xxhash64(F.col("doc_id"), pos, F.col("rep")), F.lit(2)) == 0,
            F.concat(t, F.lit("_r"), F.col("rep").cast("string"))
        ).otherwise(t))
    (docs.select("*", reps(mult))
     .withColumn("doc_id",
                 F.col("doc_id") + F.col("rep").cast("long") * 100_000_000)
     .withColumn("text", F.when(F.col("rep") == 0, F.col("text"))
                 .otherwise(F.concat_ws(" ", perturbed)))
     .withColumn("n_chars", F.length("text"))
     .drop("rep")
     .repartition(32)
     .write.mode("overwrite").parquet(os.path.join(out, "documents.parquet")))


def _gen_embeddings(spark, out, reps, mult=EMB_MULT):
    from pyspark.sql import functions as F
    from database_syncer_spark.catalog import load_table

    emb = load_table(spark, SRC, "embeddings")

    def scaled(v, pos):
        f = (1.0 + 0.05 * (
            F.pmod(F.xxhash64(F.col("vec_id"), pos, F.col("rep")),
                   F.lit(7)).cast("double") - 3.0) / 3.0)
        return (v.cast("double") * f).cast("float")

    (emb.select("*", reps(mult))
     .withColumn("vec_id",
                 F.col("vec_id") + F.col("rep").cast("long") * 100_000_000)
     .withColumn("embedding", F.transform("embedding", scaled))
     .drop("rep")
     .repartition(32)
     .write.mode("overwrite").parquet(os.path.join(out, "embeddings.parquet")))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/dss_sf1")
    ap.add_argument("--skip-gen", action="store_true")
    ap.add_argument("--keys", default=",".join(KEYS))
    ap.add_argument("--orders-mult", type=int, default=ORDERS_MULT,
                    help="orders replication factor (100 => 15M rows/side "
                         "through the bucketed diff)")
    ap.add_argument("--docs-mult", type=int, default=DOCS_MULT,
                    help="documents replication factor (500 => 2.5M docs "
                         "through the dedup/text/sampling keys)")
    ap.add_argument("--emb-mult", type=int, default=EMB_MULT,
                    help="embeddings replication factor (500 => 1M vectors)")
    ap.add_argument("--tables", default="events,orders,documents,embeddings",
                    help="comma list of tables to replicate into --out "
                         "(generate only what the probed keys read)")
    args = ap.parse_args()

    from database_syncer_spark.session import get_spark
    from database_syncer_spark.registry import all_queries

    spark = get_spark("scale_probe", shuffle_partitions=64)
    spark.sparkContext.setLogLevel("ERROR")

    gen_sec, generated = None, []
    if not args.skip_gen or not os.path.isdir(args.out):
        t0 = time.perf_counter()
        generated = _generate(spark, args.out, set(args.tables.split(",")),
                              orders_mult=args.orders_mult,
                              docs_mult=args.docs_mult,
                              emb_mult=args.emb_mult)
        gen_sec = round(time.perf_counter() - t0, 1)

    queries = all_queries()
    results = {}
    for key in args.keys.split(","):
        t0 = time.perf_counter()
        try:
            queries[key](spark, args.out).write.format("noop") \
                .mode("overwrite").save()
        except Exception as exc:  # a missing table in --out must not
            results[key] = {"error": str(exc).splitlines()[0][:200]}
            print(key, results[key], file=sys.stderr)
            continue                # kill the rest of the sweep
        results[key] = {
            "wall_sec": round(time.perf_counter() - t0, 1),
            "jvm_peak_rss_gb": round((_jvm_peak_rss_kb() or 0) / 1e6, 2),
        }
        print(key, results[key], file=sys.stderr)

    print(json.dumps({
        "metric": "sf1_scale_probe",
        "src": SRC,
        # mults describe tables GENERATED THIS RUN; anything in
        # reused_existing was written by an earlier run and keeps that
        # run's multiplier — don't label its timings with these values.
        "mults": {"orders": args.orders_mult, "documents": args.docs_mult,
                  "embeddings": args.emb_mult},
        "generated": generated,
        "reused_existing": sorted(
            t for t in args.tables.split(",")
            if t not in generated
            and os.path.isdir(os.path.join(args.out, f"{t}.parquet"))),
        "gen_sec": gen_sec,
        "results": results,
    }))


if __name__ == "__main__":
    main()
