"""Scalar-function surface: SURVEY.md §2 B8.

Generalizes the reference's string ops (regex extraction sync.py:34/55,
concat-with-separator sync.py:173,183, strip/startswith sync.py:80-81,
timestamp formatting sync.py:311) into the full function-category surface,
all JVM-side built-ins (no Python in the row path).

Determinism notes: sqrt is IEEE-exact, abs/floor/ceil/power-of-int are
exact, so no rounding is needed; ln is rounded to 6dp because libm
implementations may differ in the last ulp.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from database_syncer_spark.catalog import load_table


def fn_string(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.upper("c_name").alias("name_upper"),
        F.length("c_name").alias("name_len"),
        F.substring("c_name", 1, 8).alias("name_prefix"),
        F.regexp_extract("c_name", "([0-9]+)", 1).alias("name_digits"),
        F.concat_ws("-", "c_mktsegment", "c_name").alias("seg_name"),
        F.trim(F.lower("c_mktsegment")).alias("seg_lower"),
        F.col("c_name").startswith("Customer").alias("is_customer"),
    )


def fn_date(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").alias("o_year"),
        F.month("o_orderdate").alias("o_month"),
        F.date_trunc("month", "o_orderdate").alias("month_start"),
        F.datediff(F.lit("1998-01-01").cast("date"), F.col("o_orderdate")).alias(
            "days_to_1998"),
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("d_str"),
        F.weekday("o_orderdate").alias("dow_monday0"),
    )


def fn_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey", "l_linenumber",
        F.floor("l_quantity").alias("qty_floor"),
        F.ceil("l_extendedprice").alias("price_ceil"),
        F.sqrt("l_extendedprice").alias("price_sqrt"),
        F.abs(F.col("l_discount") - 0.05).alias("disc_dev"),
        F.pow("l_quantity", F.lit(2)).alias("qty_sq"),
        F.round(F.log("l_extendedprice"), 6).alias("price_ln6"),
    )


def fn_array(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings")
    emb = F.col("embedding")
    l1 = F.aggregate(
        emb, F.lit(0.0),
        lambda acc, x: acc + F.abs(x.cast("double")),
    )
    return e.select(
        "vec_id",
        F.size(emb).alias("dim"),
        F.element_at(emb, 1).alias("first_val"),
        F.round(l1, 6).alias("l1_norm6"),
        F.size(F.filter(emb, lambda x: x > 0)).alias("n_positive"),
    )


def fn_map_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON-in-string access (fixture events.props, e.g. '{"k": 87}')."""
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.get_json_object("props", "$.k").cast("int").alias("k_val"),
        F.from_json("props", "map<string,int>")["k"].alias("k_from_map"),
        F.col("props").like('%"k"%').alias("has_k"),
    )


def fn_json_variant(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 VARIANT type end to end: props parsed ONCE into a binary
    variant (try_parse_json — the open-schema semi-structured column
    type that replaces string-JSON re-parsing per access), typed field
    extraction with variant_get, then a per-event-type rollup. At scale
    variant beats get_json_object because the parse cost is paid once
    at ingest and extraction is a binary-offset lookup, not a JSON
    re-parse per expression."""
    ev = load_table(spark, sf_dir, "events")
    k = F.variant_get(F.try_parse_json("props"), "$.k", "int")
    return (ev.select("event_type", k.alias("k"))
            .groupBy("event_type")
            .agg(F.count(F.lit(1)).alias("n_events"),
                 F.count("k").alias("n_with_k"),
                 F.sum("k").alias("sum_k"),
                 F.max("k").alias("max_k")))


def fn_case_when(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CASE classification — the diff change-type classifier as a pure
    expression (SURVEY §2 fn_case_when, cf. A12-A14)."""
    o = load_table(spark, sf_dir, "orders")
    bucket = (
        F.when(F.col("o_totalprice") < 50000, "low")
        .when(F.col("o_totalprice") < 150000, "mid")
        .otherwise("high")
    )
    return o.select(
        "o_orderkey", bucket.alias("price_bucket"),
        (F.col("o_orderstatus") == "F").alias("is_final"),
    )


def fn_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cryptographic row fingerprints (md5/sha2 are engine-portable;
    xxhash64 is Spark-internal and used only for intra-engine row
    comparison, cf. core/diff.py)."""
    c = load_table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.md5("c_name").alias("h_md5"),
        F.sha2(F.concat_ws("|", "c_name", "c_mktsegment"), 256).alias("h_sha256"),
    )


QUERIES = {
    "fn_string": fn_string,
    "fn_date": fn_date,
    "fn_math": fn_math,
    "fn_array": fn_array,
    "fn_map_json": fn_map_json,
    "fn_case_when": fn_case_when,
    "fn_json_variant": fn_json_variant,
    "fn_hash": fn_hash,
}

ORACLES = {
    # sum(int) cast to BIGINT (DuckDB HUGEINT trap)
    "fn_json_variant": """
SELECT event_type, count(*) AS n_events,
       count(CAST(json_extract_string(props, '$.k') AS INT)) AS n_with_k,
       CAST(sum(CAST(json_extract_string(props, '$.k') AS INT)) AS BIGINT)
         AS sum_k,
       max(CAST(json_extract_string(props, '$.k') AS INT)) AS max_k
FROM events GROUP BY event_type
""",
    "fn_string": """
SELECT c_custkey,
       upper(c_name) AS name_upper,
       CAST(length(c_name) AS INT) AS name_len,
       substr(c_name, 1, 8) AS name_prefix,
       regexp_extract(c_name, '([0-9]+)', 1) AS name_digits,
       concat_ws('-', c_mktsegment, c_name) AS seg_name,
       trim(lower(c_mktsegment)) AS seg_lower,
       starts_with(c_name, 'Customer') AS is_customer
FROM customer
""",
    "fn_date": """
SELECT o_orderkey,
       CAST(year(o_orderdate) AS INT) AS o_year,
       CAST(month(o_orderdate) AS INT) AS o_month,
       CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month_start,
       CAST(date_diff('day', o_orderdate, DATE '1998-01-01') AS INT) AS days_to_1998,
       strftime(o_orderdate, '%Y-%m-%d') AS d_str,
       CAST(isodow(o_orderdate) - 1 AS INT) AS dow_monday0
FROM orders
""",
    "fn_math": """
SELECT l_orderkey, l_linenumber,
       CAST(floor(l_quantity) AS BIGINT) AS qty_floor,
       CAST(ceil(l_extendedprice) AS BIGINT) AS price_ceil,
       sqrt(l_extendedprice) AS price_sqrt,
       abs(l_discount - 0.05) AS disc_dev,
       pow(l_quantity, 2) AS qty_sq,
       round(ln(l_extendedprice), 6) AS price_ln6
FROM lineitem
""",
    "fn_array": """
SELECT vec_id,
       CAST(len(embedding) AS INT) AS dim,
       embedding[1] AS first_val,
       round(list_aggregate(list_transform(embedding, x -> abs(CAST(x AS DOUBLE))),
                            'sum'), 6) AS l1_norm6,
       CAST(len(list_filter(embedding, x -> x > 0)) AS INT) AS n_positive
FROM embeddings
""",
    "fn_map_json": """
SELECT event_id,
       CAST(json_extract_string(props, '$.k') AS INT) AS k_val,
       CAST(json_extract_string(props, '$.k') AS INT) AS k_from_map,
       props LIKE '%"k"%' AS has_k
FROM events
""",
    "fn_case_when": """
SELECT o_orderkey,
       CASE WHEN o_totalprice < 50000 THEN 'low'
            WHEN o_totalprice < 150000 THEN 'mid'
            ELSE 'high' END AS price_bucket,
       o_orderstatus = 'F' AS is_final
FROM orders
""",
    "fn_hash": """
SELECT c_custkey, md5(c_name) AS h_md5,
       sha256(concat_ws('|', c_name, c_mktsegment)) AS h_sha256
FROM customer
""",
}
