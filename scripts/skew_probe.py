"""Skew instrumentation probe (r8): measured behavior of the window and
join families under deliberately zipfian key distributions (all prior
probe fixtures were uniform-ish)."""
import math, os, sys, time

if len(sys.argv) < 2:   # fail in ms, not after minutes of fixture gen
    sys.exit("usage: skew_probe.py <mode> [fixture_dir]  "
             "(modes: sessionize_zipf sessionize_uniform salted "
             "salted_smj plain plain_noskewfix)")
sys.path.insert(0, "/root/repo")
from pyspark.sql import functions as F
from database_syncer_spark.session import get_spark
from database_syncer_spark.catalog import load_table
from database_syncer_spark.registry import all_queries

SRC = "/root/testdata/sf0.1"
OUT = "/tmp/dss_skew"
spark = get_spark("skew_probe", shuffle_partitions=64)
spark.sparkContext.setLogLevel("ERROR")
q = all_queries()

def gen():
    rep = F.explode(F.sequence(F.lit(0), F.lit(99))).alias("rep")
    ev = load_table(spark, SRC, "events")
    # log-uniform (zipf-1) user assignment over 15k users: count(u) ~ 1/u,
    # top user ~1/ln(15000) of ALL 10M events (~1.04M)
    h = F.pmod(F.xxhash64("event_id", "rep"), F.lit(1_000_000)).cast("double") / 1e6
    zipf_u = (F.floor(F.exp(h * math.log(15_000))) ).cast("long")
    (ev.select("*", rep)
     .withColumn("event_id", F.col("event_id") + F.col("rep").cast("long") * 1_000_000_000)
     .withColumn("ts", F.col("ts") + F.make_interval(secs=F.col("rep").cast("double")))
     .withColumn("user_id", zipf_u)
     .drop("rep").repartition(32)
     .write.mode("overwrite").parquet(os.path.join(OUT, "events.parquet")))
    # hot-key orders at 10x (1.5M rows): 30% of rows hit custkey 7
    o = load_table(spark, SRC, "orders")
    rep10 = F.explode(F.sequence(F.lit(0), F.lit(9))).alias("rep")
    hot = F.pmod(F.xxhash64("o_orderkey", "rep"), F.lit(10)) < 3
    (o.select("*", rep10)
     .withColumn("o_orderkey", F.col("o_orderkey") + F.col("rep").cast("long") * 1_000_000_000)
     .withColumn("o_custkey", F.when(hot, F.lit(7)).otherwise(F.col("o_custkey")))
     .drop("rep").repartition(32)
     .write.mode("overwrite").parquet(os.path.join(OUT, "orders.parquet")))
    load_table(spark, SRC, "customer").write.mode("overwrite").parquet(
        os.path.join(OUT, "customer.parquet"))

if not os.path.isdir(os.path.join(OUT, "events.parquet")):
    t0=time.time(); gen(); print("gen", round(time.time()-t0,1))

OUT2 = "/tmp/dss_skew100"   # 15M orders, 50% on one custkey (~7.5M hot rows)
def gen2():
    o = load_table(spark, SRC, "orders")
    rep100 = F.explode(F.sequence(F.lit(0), F.lit(99))).alias("rep")
    hot = F.pmod(F.xxhash64("o_orderkey", "rep"), F.lit(10)) < 5
    (o.select("*", rep100)
     .withColumn("o_orderkey", F.col("o_orderkey") + F.col("rep").cast("long") * 1_000_000_000)
     .withColumn("o_custkey", F.when(hot, F.lit(7)).otherwise(F.col("o_custkey")))
     .drop("rep").repartition(64)
     .write.mode("overwrite").parquet(os.path.join(OUT2, "orders.parquet")))
    load_table(spark, SRC, "customer").write.mode("overwrite").parquet(
        os.path.join(OUT2, "customer.parquet"))
if not os.path.isdir(os.path.join(OUT2, "orders.parquet")):
    t0=time.time(); gen2(); print("gen2", round(time.time()-t0,1))

mode = sys.argv[1]
fix = sys.argv[2] if len(sys.argv) > 2 else OUT

def plain_join(skewfix=True):
    o = load_table(spark, fix, "orders").select("o_orderkey","o_custkey","o_totalprice")
    c = load_table(spark, fix, "customer").select("c_custkey","c_nationkey")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    if not skewfix:
        spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
    return (o.join(c, o.o_custkey == c.c_custkey)
            .groupBy("c_nationkey")
            .agg(F.count("*").alias("n_orders"),
                 F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast("double").alias("sum_price")))

t0 = time.time()
if mode == "sessionize_zipf":
    q["win_sessionize"](spark, OUT).write.format("noop").mode("overwrite").save()
elif mode == "sessionize_uniform":
    q["win_sessionize"](spark, "/tmp/dss_sf1").write.format("noop").mode("overwrite").save()
elif mode == "salted":
    q["join_skew_salted"](spark, fix).write.format("noop").mode("overwrite").save()
elif mode == "salted_smj":
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    q["join_skew_salted"](spark, fix).write.format("noop").mode("overwrite").save()
elif mode == "plain":
    plain_join(True).write.format("noop").mode("overwrite").save()
elif mode == "plain_noskewfix":
    plain_join(False).write.format("noop").mode("overwrite").save()
print("RESULT", mode, fix, round(time.time()-t0,1), "sec", flush=True)
