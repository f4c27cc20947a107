"""Relational operator surface: SURVEY.md §2 B1-B3, B6, B7.

Every query aliases computed columns identically to its oracle SQL and
avoids float-ordering hazards (raw column values or exact arithmetic only;
aggregated money goes through DECIMAL — see queries/aggregates.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from database_syncer_spark.catalog import load_table


# --- B1: scans ---------------------------------------------------------

def scan_parquet(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Projected parquet scan — column pruning reaches the reader
    (ReadSchema shows only these 4 columns)."""
    return load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice"
    )


# --- B2: projections / filters -----------------------------------------

def project_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_mktsegment"
    )


def project_key_concat(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composite-key derivation — the reference's '|'-joined PK
    (sync.py:173)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        F.concat_ws("|", "l_orderkey", "l_linenumber").alias("row_key"),
        "l_orderkey", "l_linenumber",
    )


def filter_predicate(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.where(
        F.col("l_quantity").between(10, 20)
        & (F.col("l_returnflag") == "R")
        & (F.col("l_shipdate") >= "1997-01-01")
        & F.col("l_discount").isin(0.02, 0.05, 0.08)
        & F.col("l_linestatus").like("F%")
    ).select("l_orderkey", "l_linenumber", "l_quantity", "l_discount", "l_shipdate")


def filter_null_safe_eq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe equality (<=>): NULL <=> NULL is true — the typed
    rebuild of the reference's string-NULL comparison (SURVEY §1.2)."""
    ev = load_table(spark, sf_dir, "events")
    a = F.nullif(F.col("event_type"), F.lit("error"))
    b = F.nullif(F.col("event_type"), F.lit("signup"))
    return ev.select(
        "event_id",
        a.alias("a_type"),
        b.alias("b_type"),
        a.eqNullSafe(b).alias("ns_equal"),
    )


# --- B3: joins ----------------------------------------------------------

def join_inner(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    return o.join(c, o.o_custkey == c.c_custkey, "inner").select(
        "o_orderkey", "c_custkey", "c_name", "o_totalprice"
    )


def join_left_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left").select(
        "c_custkey", "c_name", "o_orderkey", "o_totalprice"
    )


def join_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    a = o.where(F.col("o_orderkey") % 3 == 0).select("o_orderkey", "o_totalprice")
    b = o.where(F.col("o_orderkey") % 2 == 0).select(
        F.col("o_orderkey").alias("b_orderkey"), "o_orderpriority"
    )
    return a.join(b, a.o_orderkey == b.b_orderkey, "full_outer").select(
        F.coalesce("o_orderkey", "b_orderkey").alias("k"),
        "o_totalprice", "o_orderpriority",
    )


def join_left_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rows to INSERT, generalized (reference sync.py:264-267):
    customers with no high-value order."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").where(
        F.col("o_totalprice") > 300000.0).select(
        F.col("o_custkey").alias("c_custkey"))
    return c.join(o, "c_custkey", "left_anti").select("c_custkey", "c_name")


def join_left_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").where(
        F.col("o_orderstatus") == "F").select(F.col("o_custkey").alias("c_custkey"))
    return c.join(o, "c_custkey", "left_semi").select("c_custkey", "c_name")


def join_broadcast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Star dim join with explicit broadcast hints — zero shuffles for the
    dim sides at any fact-table scale."""
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(
            F.count("*").alias("n_customers"),
            F.sum(F.col("c_acctbal").cast("decimal(18,2)")).cast("double").alias("sum_bal"),
        )
    )


def join_theta_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Non-equi (range) join: broadcast nested-loop on the tiny side —
    the Spark-sane physical plan for a theta join."""
    s = load_table(spark, sf_dir, "supplier")
    c = load_table(spark, sf_dir, "customer")
    cond = c.c_acctbal.between(s.s_acctbal - 500.0, s.s_acctbal + 500.0)
    return (
        F.broadcast(s).join(c, cond, "left")
        .groupBy("s_suppkey")
        .agg(F.count("c_custkey").alias("n_close_customers"))
    )


def _asof_carried(ev: DataFrame) -> DataFrame:
    """The shared as-of merge: union signups+purchases, one
    last(ignorenulls) pass over (user_id, ts) carrying each user's
    latest signup_ts forward. Purchases come out with ``__carried``;
    both as-of keys project from this single plan (no per-row
    subqueries, no cross product).

    signup sorts before purchase at equal ts (prio) so ties count as
    "at or before"."""
    signups = ev.where(F.col("event_type") == "signup").select(
        "user_id", "ts", F.col("ts").alias("signup_ts"),
        F.lit(None).cast("long").alias("event_id"), F.lit(0).alias("prio"),
    )
    purchases = ev.where(F.col("event_type") == "purchase").select(
        "user_id", "ts", F.lit(None).cast("timestamp").alias("signup_ts"),
        "event_id", F.lit(1).alias("prio"),
    )
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "prio")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    merged = signups.unionByName(purchases).withColumn(
        "__carried", F.last("signup_ts", ignorenulls=True).over(w)
    )
    return merged.where(F.col("prio") == 1)


def join_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join (nearest earlier timestamp) without a native operator:
    union both sides, one pass of last(ignorenulls) over event time.

    For each 'purchase' event, find the same user's latest 'signup' at or
    before it. Scales as a single window over (user_id, ts) — no
    per-row subqueries, no cross product (SURVEY §2 B3 join_asof).
    """
    ev = load_table(spark, sf_dir, "events")
    return _asof_carried(ev).select(
        "event_id", "user_id", "ts",
        F.col("__carried").alias("asof_signup_ts"),
    )


def join_asof_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join with a max-staleness bound (pandas merge_asof's
    ``tolerance``, the feature-store point-in-time join semantic): each
    purchase matches the user's latest signup at or before it ONLY if
    that signup is within 7 days; older matches are nulled rather than
    served stale.

    Same single-window plan as join_asof (shared via _asof_carried) —
    the tolerance is a post-hoc null-out of the carried value, correct
    because the carried value is the LATEST qualifying row: if it is
    out of tolerance, every earlier candidate is too. No extra shuffle,
    no per-row subquery."""
    ev = load_table(spark, sf_dir, "events")
    fresh = F.col("__carried") >= F.expr("ts - INTERVAL 7 DAY")
    return _asof_carried(ev).select(
        "event_id", "user_id", "ts",
        F.when(fresh, F.col("__carried")).alias("asof_signup_ts"),
    )


def join_multiway_star(spark: SparkSession, sf_dir: str) -> DataFrame:
    """5-way star join (fact lineitem + 4 dims). Only the FIXED-size dims
    (nation/region) carry broadcast hints; customer scales with SF, so
    its strategy is AQE's runtime call — auto-broadcast at bench scale
    (file-size estimate under the threshold), shuffled join beyond it."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    revenue = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
        "decimal(18,4)")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name")
        .agg(
            F.sum(revenue).cast("double").alias("revenue"),
            F.count("*").alias("n_items"),
        )
    )


# --- B6: sorts / top-k ---------------------------------------------------

def sort_multi_col(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Total sort, made hash-visible by materializing the global rank."""
    o = load_table(spark, sf_dir, "orders")
    w = W.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
    return o.select("o_orderkey", "o_totalprice").withColumn(
        "rank_all", F.row_number().over(w)
    )


def topk_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return (
        o.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .limit(100)
    )


# --- B7: set operations ---------------------------------------------------

def _subsets(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders")
    a = o.where(F.col("o_orderkey") % 2 == 0).select("o_orderkey", "o_orderstatus")
    b = o.where(F.col("o_orderkey") % 3 == 0).select("o_orderkey", "o_orderstatus")
    return a, b


def set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set difference — the reference's catalog/row diffs (sync.py:245-283)."""
    a, b = _subsets(spark, sf_dir)
    return a.exceptAll(b)


def set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    a, b = _subsets(spark, sf_dir)
    return a.intersect(b)


def set_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    a, b = _subsets(spark, sf_dir)
    return a.unionByName(b)


QUERIES = {
    "scan_parquet": scan_parquet,
    "project_columns": project_columns,
    "project_key_concat": project_key_concat,
    "filter_predicate": filter_predicate,
    "filter_null_safe_eq": filter_null_safe_eq,
    "join_inner": join_inner,
    "join_left_outer": join_left_outer,
    "join_full_outer": join_full_outer,
    "join_left_anti": join_left_anti,
    "join_left_semi": join_left_semi,
    "join_broadcast": join_broadcast,
    "join_theta_range": join_theta_range,
    "join_asof": join_asof,
    "join_asof_tolerance": join_asof_tolerance,
    "join_multiway_star": join_multiway_star,
    "sort_multi_col": sort_multi_col,
    "topk_limit": topk_limit,
    "set_except": set_except,
    "set_intersect": set_intersect,
    "set_union": set_union,
}

ORACLES = {
    "scan_parquet": (
        "SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice FROM lineitem"
    ),
    "project_columns": "SELECT c_custkey, c_name, c_mktsegment FROM customer",
    "project_key_concat": """
SELECT concat_ws('|', l_orderkey, l_linenumber) AS row_key, l_orderkey, l_linenumber
FROM lineitem
""",
    "filter_predicate": """
SELECT l_orderkey, l_linenumber, l_quantity, l_discount, l_shipdate
FROM lineitem
WHERE l_quantity BETWEEN 10 AND 20 AND l_returnflag = 'R'
  AND l_shipdate >= TIMESTAMP '1997-01-01'
  AND l_discount IN (0.02, 0.05, 0.08) AND l_linestatus LIKE 'F%'
""",
    "filter_null_safe_eq": """
SELECT event_id,
       nullif(event_type, 'error') AS a_type,
       nullif(event_type, 'signup') AS b_type,
       nullif(event_type, 'error') IS NOT DISTINCT FROM nullif(event_type, 'signup') AS ns_equal
FROM events
""",
    "join_inner": """
SELECT o_orderkey, c_custkey, c_name, o_totalprice
FROM orders JOIN customer ON o_custkey = c_custkey
""",
    "join_left_outer": """
SELECT c_custkey, c_name, o_orderkey, o_totalprice
FROM customer LEFT JOIN orders ON c_custkey = o_custkey
""",
    "join_full_outer": """
SELECT coalesce(a.o_orderkey, b.b_orderkey) AS k, a.o_totalprice, b.o_orderpriority
FROM (SELECT o_orderkey, o_totalprice FROM orders WHERE o_orderkey % 3 = 0) a
FULL OUTER JOIN (SELECT o_orderkey AS b_orderkey, o_orderpriority FROM orders
                 WHERE o_orderkey % 2 = 0) b
ON a.o_orderkey = b.b_orderkey
""",
    "join_left_anti": """
SELECT c_custkey, c_name FROM customer c
WHERE NOT EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000.0)
""",
    "join_left_semi": """
SELECT c_custkey, c_name FROM customer c
WHERE EXISTS (SELECT 1 FROM orders o
              WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'F')
""",
    "join_broadcast": """
SELECT r_name, n_name, count(*) AS n_customers,
       CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS sum_bal
FROM customer
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name, n_name
""",
    "join_theta_range": """
SELECT s_suppkey, count(c_custkey) AS n_close_customers
FROM supplier LEFT JOIN customer
  ON c_acctbal BETWEEN s_acctbal - 500.0 AND s_acctbal + 500.0
GROUP BY s_suppkey
""",
    "join_asof": """
SELECT e.event_id, e.user_id, e.ts,
       (SELECT max(s.ts) FROM events s
        WHERE s.user_id = e.user_id AND s.event_type = 'signup' AND s.ts <= e.ts
       ) AS asof_signup_ts
FROM events e WHERE e.event_type = 'purchase'
""",
    "join_asof_tolerance": """
SELECT e.event_id, e.user_id, e.ts,
       (SELECT max(s.ts) FROM events s
        WHERE s.user_id = e.user_id AND s.event_type = 'signup'
          AND s.ts <= e.ts AND s.ts >= e.ts - INTERVAL 7 DAY
       ) AS asof_signup_ts
FROM events e WHERE e.event_type = 'purchase'
""",
    "join_multiway_star": """
SELECT r_name,
       CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
       count(*) AS n_items
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name
""",
    "sort_multi_col": """
SELECT o_orderkey, o_totalprice,
       CAST(row_number() OVER (ORDER BY o_totalprice DESC, o_orderkey ASC) AS INT) AS rank_all
FROM orders
""",
    "topk_limit": """
SELECT o_orderkey, o_custkey, o_totalprice FROM orders
ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 100
""",
    "set_except": """
SELECT o_orderkey, o_orderstatus FROM orders WHERE o_orderkey % 2 = 0
EXCEPT ALL
SELECT o_orderkey, o_orderstatus FROM orders WHERE o_orderkey % 3 = 0
""",
    "set_intersect": """
SELECT o_orderkey, o_orderstatus FROM orders WHERE o_orderkey % 2 = 0
INTERSECT
SELECT o_orderkey, o_orderstatus FROM orders WHERE o_orderkey % 3 = 0
""",
    "set_union": """
SELECT o_orderkey, o_orderstatus FROM orders WHERE o_orderkey % 2 = 0
UNION ALL
SELECT o_orderkey, o_orderstatus FROM orders WHERE o_orderkey % 3 = 0
""",
}
