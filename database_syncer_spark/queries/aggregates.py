"""Aggregation & window surface: SURVEY.md §2 B4-B5.

Float discipline: money aggregates go through DECIMAL(18,s) so the sum is
exact and order-independent — a double sum's value depends on shuffle
order, which would break both determinism at scale and oracle hashing.
Integer-valued doubles (l_quantity) sum exactly in double, so they stay
native.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from database_syncer_spark.catalog import load_table, sf_dir_tag


def _money_sum(col, scale: int = 4):
    return F.sum(col.cast(f"decimal(18,{scale})")).cast("double")


# --- B4: aggregations -----------------------------------------------------

def agg_groupby_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hash agg with map-side partial aggregation (ref stats, sync.py:293-300)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag", "l_linestatus").agg(F.count("*").alias("n"))


def agg_global_sums(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return li.agg(
        F.count("*").alias("n_rows"),
        F.sum("l_quantity").alias("total_qty"),
        _money_sum(revenue).alias("total_revenue"),
    )


def agg_multi_measures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: 2 group cols, 8 measures, date filter."""
    li = load_table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        li.where(F.col("l_shipdate") <= "1998-09-02")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum("l_quantity").alias("sum_qty"),
            _money_sum(F.col("l_extendedprice"), 2).alias("sum_base_price"),
            _money_sum(disc_price, 4).alias("sum_disc_price"),
            _money_sum(charge, 6).alias("sum_charge"),
            F.avg("l_quantity").alias("avg_qty"),
            (_money_sum(F.col("l_extendedprice"), 2) / F.count("*")).alias("avg_price"),
            (_money_sum(F.col("l_discount"), 2) / F.count("*")).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


def agg_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").agg(
        F.countDistinct("o_custkey").alias("n_customers"),
        F.count("*").alias("n_orders"),
    )


def agg_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL approx-distinct — the 100-TB path where exact distinct would
    shuffle every key. Raw HLL estimates differ per engine, so the
    VALUE-checked surface is the HLL contract itself: exact counts (the
    oracle recomputes them) plus within-10%-of-exact flags (2x the default
    rsd=0.05 — one-sigma excursions past 5% are expected and observed
    at sf0.001; HLL++ is deterministic, so the flags are stable). A broken
    sketch flips a flag and fails the driver hash — this upgrades the key
    from rows-only without pretending engines share sketch internals."""
    li = load_table(spark, sf_dir, "lineitem")
    # Three separate single-pass aggregates cross-joined (all 1-row):
    # mixing countDistinct columns with the sketches in ONE agg plans an
    # Expand that multiplies the scan by the distinct-group count
    # (measured 1.58s vs 0.55s at sf0.1). Each exact side is a plain
    # two-phase distinct aggregate on a single pruned column.
    est = li.agg(
        F.approx_count_distinct("l_orderkey").alias("approx_orders"),
        F.approx_count_distinct("l_partkey").alias("approx_parts"),
    )
    exact_o = li.agg(F.countDistinct("l_orderkey").alias("exact_orders"))
    exact_p = li.agg(F.countDistinct("l_partkey").alias("exact_parts"))

    def ok(approx, exact):
        return (F.abs(F.col(approx) - F.col(exact))
                <= 0.10 * F.col(exact)).alias(f"{approx}_within_10pct")
    return est.crossJoin(exact_o).crossJoin(exact_p).select(
        "exact_orders", "exact_parts",
        ok("approx_orders", "exact_orders"),
        ok("approx_parts", "exact_parts"),
    )


def agg_hll_sketch_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The STORABLE-sketch workflow `agg_approx_distinct` doesn't cover:
    build per-group Datasketches HLL sketches (`hll_sketch_agg`), write
    the binary sketch column to parquet and READ IT BACK (the store-now/
    merge-later contract a 100-TB rollup table depends on — daily
    sketches merged into monthly distincts without rescanning the
    corpus), then `hll_union_agg` the restored sketches into the global
    estimate. Verified surface follows the agg_approx_distinct
    discipline: the oracle recomputes EXACT per-group and global
    distincts; the sketch estimates ride as within-10%-of-exact flags
    (Datasketches HLL is deterministic, so the flags are stable). A
    broken sketch build, serialization round trip, or union flips a
    flag and fails the driver hash.

    Plan notes: sketches and exact distincts are SEPARATE aggregates
    joined on the group (mixing countDistinct with sketches in one agg
    plans an Expand that multiplies the scan — the agg_approx_distinct
    lesson); the union-merge side is group-cardinality-sized."""
    import os
    import tempfile

    o = load_table(spark, sf_dir, "orders")
    sk = (o.groupBy("o_orderpriority")
          .agg(F.hll_sketch_agg("o_custkey").alias("sk")))
    # serialization round trip: binary sketches at rest, then restored
    tag = sf_dir_tag(sf_dir)
    path = os.path.join(tempfile.gettempdir(), f"dss_hll_{tag}.parquet")
    sk.write.mode("overwrite").parquet(path)
    stored = spark.read.parquet(path)
    per_group = (stored.select(
        "o_orderpriority",
        F.hll_sketch_estimate("sk").alias("est")))
    exact_g = o.groupBy("o_orderpriority").agg(
        F.countDistinct("o_custkey").alias("exact_custs"))
    grp = (per_group.join(exact_g, "o_orderpriority")
           .select(
               F.col("o_orderpriority").alias("grp"),
               "exact_custs",
               (F.abs(F.col("est") - F.col("exact_custs"))
                <= 0.10 * F.col("exact_custs")).alias("within_10pct")))
    merged = stored.agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est"))
    exact_t = o.agg(F.countDistinct("o_custkey").alias("exact_custs"))
    total = (merged.crossJoin(exact_t)
             .select(F.lit("ALL").alias("grp"), "exact_custs",
                     (F.abs(F.col("est") - F.col("exact_custs"))
                      <= 0.10 * F.col("exact_custs")).alias("within_10pct")))
    return grp.unionByName(total)


def agg_approx_quantile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch-based quantiles (approx_percentile — the 100-TB path where
    exact percentiles would sort every partition's values). Same
    verification contract as agg_approx_distinct: sketch internals are
    engine-specific, so the value-checked surface is exact quantiles
    (oracle recomputes via quantile_cont) plus within-1%-of-exact flags
    for the sketch (measured deviation ≤ 0.024% across sf0.001-0.1 at
    the default accuracy=10000; the sketch is deterministic)."""
    li = load_table(spark, sf_dir, "lineitem")
    r = li.agg(
        F.expr("approx_percentile(l_extendedprice, array(0.5, 0.95))")
        .alias("ap"),
        F.expr("percentile(l_extendedprice, array(0.5, 0.95))").alias("ex"))

    def ok(i):
        return (F.abs(F.col("ap")[i] - F.col("ex")[i])
                <= 0.01 * F.col("ex")[i])
    return r.select(
        F.round(F.col("ex")[0], 4).alias("p50_exact"),
        F.round(F.col("ex")[1], 4).alias("p95_exact"),
        ok(0).alias("p50_within_1pct"),
        ok(1).alias("p95_within_1pct"))


def agg_percentile_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact median per group (interpolated) — deterministic because
    l_quantity is integer-valued."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.percentile("l_quantity", F.lit(0.5)).alias("median_qty"),
        F.count("*").alias("n"),
    )


def agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        F.count("*").alias("n"), F.sum("l_quantity").alias("sum_qty")
    )


def agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.cube("l_returnflag", "l_linestatus").agg(
        F.count("*").alias("n"), F.sum("l_quantity").alias("sum_qty")
    )


def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPING SETS via the SQL API (same Catalyst plan as DataFrame)."""
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("v_lineitem")
    return spark.sql("""
        SELECT l_returnflag, l_linestatus, count(*) AS n
        FROM v_lineitem
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
    """)


def agg_time_bucket_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style continuous-aggregate rollup: hour- AND day-grain
    time buckets per event_type in ONE pass via GROUPING SETS (one
    shuffle; Catalyst expands the sets map-side). ``bucket_hour`` is NULL
    on day-grain rows. The measure sums through decimal so the value is
    independent of partition/merge order (doubles are not associative)."""
    load_table(spark, sf_dir, "events").createOrReplaceTempView("v_events_tb")
    return spark.sql("""
        WITH e AS (
          SELECT date_trunc('DAY', ts) AS bucket_day,
                 date_trunc('HOUR', ts) AS bucket_hour,
                 event_type, CAST(value AS DECIMAL(18,4)) AS v
          FROM v_events_tb
        )
        SELECT bucket_day, bucket_hour, event_type,
               count(*) AS n_events, CAST(sum(v) AS DOUBLE) AS sum_value
        FROM e
        GROUP BY GROUPING SETS ((bucket_day, bucket_hour, event_type),
                                (bucket_day, event_type))
    """)


def agg_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot change-type-style stats into columns (ref stats dict shape,
    sync.py:294-300)."""
    li = load_table(spark, sf_dir, "lineitem")
    out = li.groupBy("l_returnflag").pivot("l_linestatus", ["O", "F"]).count()
    # pivot yields NULL for empty cells; align with the CASE-sum oracle (0)
    return out.select(
        "l_returnflag",
        F.coalesce("O", F.lit(0)).alias("n_open"),
        F.coalesce("F", F.lit(0)).alias("n_filled"),
    )


# --- B5: window functions -------------------------------------------------

def win_rank_topn_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    w = W.partitionBy("o_orderpriority").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey").asc()
    )
    return (
        o.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 3)
        .select("o_orderpriority", "rn", "o_orderkey", "o_totalprice")
    )


def win_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    w = (
        W.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    running = F.sum(F.col("o_totalprice").cast("decimal(18,2)")).over(w)
    return o.select(
        "o_custkey", "o_orderkey", "o_orderdate",
        running.cast("double").alias("running_total"),
    )


def win_lag_lead_change(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Change vs previous row — CDC-flavored lag/lead over event time."""
    ev = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    prev = F.lag("value").over(w)
    nxt = F.lead("value").over(w)
    return ev.select(
        "event_id", "user_id", "ts", "value",
        prev.alias("prev_value"),
        nxt.alias("next_value"),
        (F.col("value") - prev).alias("delta_prev"),
    )


QUERIES = {
    "agg_groupby_counts": agg_groupby_counts,
    "agg_global_sums": agg_global_sums,
    "agg_multi_measures": agg_multi_measures,
    "agg_distinct": agg_distinct,
    "agg_approx_distinct": agg_approx_distinct,  # exact counts + HLL bound flags
    "agg_approx_quantile": agg_approx_quantile,  # exact quantiles + sketch flags
    "agg_hll_sketch_merge": agg_hll_sketch_merge,  # storable sketches: build→store→union
    "agg_percentile_median": agg_percentile_median,
    "agg_rollup": agg_rollup,
    "agg_cube": agg_cube,
    "agg_grouping_sets": agg_grouping_sets,
    "agg_time_bucket_rollup": agg_time_bucket_rollup,
    "agg_pivot": agg_pivot,
    "win_rank_topn_per_group": win_rank_topn_per_group,
    "win_running_sum": win_running_sum,
    "win_lag_lead_change": win_lag_lead_change,
}

ORACLES = {
    "agg_approx_distinct": """
SELECT CAST(count(DISTINCT l_orderkey) AS BIGINT) AS exact_orders,
       CAST(count(DISTINCT l_partkey) AS BIGINT) AS exact_parts,
       TRUE AS approx_orders_within_10pct,
       TRUE AS approx_parts_within_10pct
FROM lineitem
""",
    "agg_hll_sketch_merge": """
SELECT o_orderpriority AS grp,
       CAST(count(DISTINCT o_custkey) AS BIGINT) AS exact_custs,
       TRUE AS within_10pct
FROM orders GROUP BY o_orderpriority
UNION ALL
SELECT 'ALL', CAST(count(DISTINCT o_custkey) AS BIGINT), TRUE FROM orders
""",
    "agg_approx_quantile": """
SELECT round(quantile_cont(l_extendedprice, 0.5), 4) AS p50_exact,
       round(quantile_cont(l_extendedprice, 0.95), 4) AS p95_exact,
       TRUE AS p50_within_1pct, TRUE AS p95_within_1pct
FROM lineitem
""",
    "agg_groupby_counts": """
SELECT l_returnflag, l_linestatus, count(*) AS n
FROM lineitem GROUP BY l_returnflag, l_linestatus
""",
    "agg_global_sums": """
SELECT count(*) AS n_rows, sum(l_quantity) AS total_qty,
       CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE)
         AS total_revenue
FROM lineitem
""",
    "agg_multi_measures": """
SELECT l_returnflag, l_linestatus,
       sum(l_quantity) AS sum_qty,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
       CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE)
         AS sum_disc_price,
       CAST(sum(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax) AS DECIMAL(18,6))) AS DOUBLE)
         AS sum_charge,
       avg(l_quantity) AS avg_qty,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_price,
       CAST(sum(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_disc,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
""",
    "agg_distinct": """
SELECT o_orderstatus, CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_customers,
       count(*) AS n_orders
FROM orders GROUP BY o_orderstatus
""",
    "agg_percentile_median": """
SELECT l_returnflag, quantile_cont(l_quantity, 0.5) AS median_qty, count(*) AS n
FROM lineitem GROUP BY l_returnflag
""",
    "agg_rollup": """
SELECT l_returnflag, l_linestatus, count(*) AS n, sum(l_quantity) AS sum_qty
FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
""",
    "agg_cube": """
SELECT l_returnflag, l_linestatus, count(*) AS n, sum(l_quantity) AS sum_qty
FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
""",
    "agg_time_bucket_rollup": """
WITH e AS (
  SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS bucket_day,
         date_trunc('hour', ts) AS bucket_hour,
         event_type, CAST(value AS DECIMAL(18,4)) AS v
  FROM events
)
SELECT bucket_day, bucket_hour, event_type,
       count(*) AS n_events, CAST(sum(v) AS DOUBLE) AS sum_value
FROM e
GROUP BY GROUPING SETS ((bucket_day, bucket_hour, event_type),
                        (bucket_day, event_type))
""",
    "agg_grouping_sets": """
SELECT l_returnflag, l_linestatus, count(*) AS n
FROM lineitem GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
""",
    "agg_pivot": """
SELECT l_returnflag,
       CAST(count(CASE WHEN l_linestatus = 'O' THEN 1 END) AS BIGINT) AS n_open,
       CAST(count(CASE WHEN l_linestatus = 'F' THEN 1 END) AS BIGINT) AS n_filled
FROM lineitem GROUP BY l_returnflag
""",
    "win_rank_topn_per_group": """
SELECT o_orderpriority, CAST(rn AS INT) AS rn, o_orderkey, o_totalprice FROM (
  SELECT o_orderpriority, o_orderkey, o_totalprice,
         row_number() OVER (PARTITION BY o_orderpriority
                            ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
  FROM orders
) WHERE rn <= 3
""",
    "win_running_sum": """
SELECT o_custkey, o_orderkey, o_orderdate,
       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
         PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_total
FROM orders
""",
    "win_lag_lead_change": """
SELECT event_id, user_id, ts, value,
       lag(value) OVER w AS prev_value,
       lead(value) OVER w AS next_value,
       value - lag(value) OVER w AS delta_prev
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
""",
}
