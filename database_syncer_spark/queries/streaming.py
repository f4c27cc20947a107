"""Streaming query keys (SURVEY.md §2 B9).

The window/dedup shapes run here in BATCH mode — the unified API makes the
same code a streaming job on a readStream source, and
tests/test_streaming.py replays the events fixture file-by-file to prove
batch/stream equivalence. stream_foreachbatch_merge and
stream_stateful_custom run REAL streaming jobs (micro-batch replay) inside
the query callable, then hand the materialized result to the driver.

Window-start arithmetic in the oracles mirrors Spark's epoch-aligned
window assignment: start = floor(epoch / slide) * slide.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from database_syncer_spark.catalog import load_table, sf_dir_tag
from database_syncer_spark.streaming.queries import (
    session_window_agg,
    sliding_agg,
    stream_distinct,
    tumbling_agg,
    watermarked_tumbling,
)

#: bump when any staged-source DERIVATION changes (chunk count, the
#: deriving transform, or the upstream snapshot derivation) — reuse=True
#: stagings are keyed by path, so without a version token an edited
#: derivation would silently serve the previous round's staged data
#: (same hazard the dump cache solves with _DUMP_FMT, queries/dump.py).
_STAGE_FMT = "v3"


def stream_tumbling_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    return tumbling_agg(load_table(spark, sf_dir, "events"))


def stream_sliding_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    return sliding_agg(load_table(spark, sf_dir, "events"))


def stream_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    return session_window_agg(load_table(spark, sf_dir, "events"))


def stream_watermark_late(spark: SparkSession, sf_dir: str) -> DataFrame:
    return watermarked_tumbling(load_table(spark, sf_dir, "events"))


def stream_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    return stream_distinct(load_table(spark, sf_dir, "events"))


def stream_foreachbatch_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental sync: CDC changes streamed in 5 micro-batches, each
    MERGEd into the backup state. Final state must equal production — the
    oracle is literally ``SELECT * FROM orders``."""
    from database_syncer_spark.core.diff import snapshot_diff
    from database_syncer_spark.core.snapshots import derive_backup
    from database_syncer_spark.streaming.runner import incremental_sync_foreachbatch

    prod = load_table(spark, sf_dir, "orders")
    backup = derive_backup(prod, "o_orderkey", "o_totalprice")
    changes = snapshot_diff(prod, backup, ["o_orderkey"])
    tag = sf_dir_tag(sf_dir)
    workdir = tempfile.mkdtemp(prefix=f"dss_febm_{tag}_")
    # changes are a pure function of the read-only fixture — stage once
    # per machine (reuse=True); state versions stay in the fresh workdir.
    return incremental_sync_foreachbatch(
        spark, changes, backup, ["o_orderkey"], n_chunks=3, workdir=workdir,
        changes_path=os.path.join(
            tempfile.gettempdir(), f"dss_febm_src_{_STAGE_FMT}_{tag}"),
        reuse_changes=True)


def _stateful_partitions(spark: SparkSession, events: DataFrame) -> int:
    """Input-adaptive shuffle/state-store partition count for the
    Python-state streaming jobs. Streaming aggregations pin their state
    layout to spark.sql.shuffle.partitions at query start (AQE cannot
    coalesce a stateful stream), so the value is a real knob: too low
    starves the Arrow/Python workers — the 100× probe measured the
    fixed 8 at 162 s vs 62 s with 32 for the SAME 10 M-event job —
    while too high multiplies per-partition state-store instances for
    nothing at bench scale. ~1 partition per 350 k input rows, capped
    at the core count, with the floor of 8 applied LAST so bench-scale
    jobs get exactly the pre-r6 fixed value on every host (a <8-core
    host would otherwise silently drop below it and break cross-host
    baseline comparability)."""
    cpus = spark.sparkContext.defaultParallelism
    return int(max(8, min(cpus, events.count() // 350_000)))


def stream_stateful_custom(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom per-user state machine (applyInPandasWithState) run as a real
    micro-batch streaming job; final running totals per user."""
    from database_syncer_spark.streaming.runner import (
        run_stream_to_memory, stage_as_stream_source)
    from database_syncer_spark.streaming.stateful import running_user_profile

    events = load_table(spark, sf_dir, "events")
    tag = sf_dir_tag(sf_dir)
    src = stage_as_stream_source(
        events, os.path.join(tempfile.gettempdir(), f"dss_stateful_src_{_STAGE_FMT}_{tag}"),
        3, reuse=True)
    staged = spark.read.parquet(src)
    sink = run_stream_to_memory(
        spark, src, staged.schema, running_user_profile,
        f"dss_stateful_{tag}", output_mode="update",
        shuffle_partitions=_stateful_partitions(spark, staged),
    )
    # update-mode sink holds one row per (user, batch); the final state is
    # the row with the greatest running count.
    w = W.partitionBy("user_id").orderBy(F.col("n_events").desc())
    return (
        sink.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .select("user_id", "n_events", "last_ts")
    )


def stream_transform_with_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user profile via transformWithStateInPandas (Spark 4's typed
    arbitrary-state API: ValueState + MapState), run as a real streaming
    job. Every state fold is order-independent (count / distinct-set /
    max), so the final per-user state equals the batch aggregate and the
    key is fully oracle-checkable."""
    from database_syncer_spark.streaming.runner import (
        run_stream_to_memory, stage_as_stream_source)
    from database_syncer_spark.streaming.stateful import user_type_profile_tws

    events = load_table(spark, sf_dir, "events")
    tag = sf_dir_tag(sf_dir)
    src = stage_as_stream_source(
        events, os.path.join(tempfile.gettempdir(), f"dss_tws_src_{_STAGE_FMT}_{tag}"),
        3, reuse=True)
    staged = spark.read.parquet(src)

    # transformWithState REQUIRES the RocksDB provider; since r7 the
    # runner pins RocksDB for every stateful run anyway (bounded-heap
    # default at scale), so both the tws shape and the
    # applyInPandasWithState fallback ride the same provider.
    sink = run_stream_to_memory(
        spark, src, staged.schema, user_type_profile_tws,
        f"dss_tws_{tag}", output_mode="update",
        shuffle_partitions=_stateful_partitions(spark, staged),
    )

    w = W.partitionBy("user_id").orderBy(F.col("n_events").desc())
    return (
        sink.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .select("user_id", "n_events", "n_types", "max_value")
    )


_TIER = (
    "CASE event_type WHEN 'purchase' THEN 'revenue' "
    "WHEN 'signup' THEN 'growth' ELSE 'engagement' END"
)


def stream_static_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream–static join run as a REAL micro-batch job: the event stream
    joins a small static dimension (event_type → business tier) and
    aggregates per tier. Stream–static is its own operator class in
    Structured Streaming — the static side is re-resolvable per trigger
    and broadcast into every micro-batch, no state, no watermark. The
    per-tier fold (count + exact decimal sum) is order-independent, so
    the complete-mode result equals the batch aggregate and the key is
    fully oracle-checkable."""
    from database_syncer_spark.streaming.runner import (
        run_stream_to_memory, stage_as_stream_source)

    events = load_table(spark, sf_dir, "events")
    tag = sf_dir_tag(sf_dir)
    src = stage_as_stream_source(
        events, os.path.join(tempfile.gettempdir(), f"dss_ssj_src_{_STAGE_FMT}_{tag}"),
        3, reuse=True)
    staged = spark.read.parquet(src)
    dim = (
        events.select("event_type").distinct()
        .withColumn("tier", F.expr(_TIER))
    )

    # Pin NULL semantics explicitly: a NULL event_type never
    # equality-joins the dim, while the oracle's CASE would bucket it
    # under ELSE — filter NULLs on BOTH sides so the contract is the
    # same even if the fixture ever gains NULL types.
    def shape(stream: DataFrame) -> DataFrame:
        return (
            stream.where(F.col("event_type").isNotNull())
            .join(F.broadcast(dim), "event_type")
            .groupBy("tier")
            .agg(
                F.count("*").alias("n"),
                F.sum(F.col("value").cast("decimal(18,2)"))
                .cast("double").alias("sum_value"),
            )
        )

    return run_stream_to_memory(
        spark, src, staged.schema, shape, f"dss_ssj_{tag}",
        output_mode="complete", shuffle_partitions=4,
    )


def stream_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermarked stream–stream INNER join run as a real micro-batch
    job: the click stream joins the purchase stream on user_id within a
    ±10-minute event-time band (attribution shape). Both sides carry
    watermarks and the join has a two-sided time-range condition, so
    per-key state is bounded by the band + watermark, not stream
    history. Inner-join matches emit as they occur (the watermark only
    gates state CLEANUP), so after processAllAvailable the sink equals
    the batch self-join and the key is fully value-oracled.

    Staging must be EVENT-TIME ordered: with random file order the
    watermark from an early batch's max timestamp evicts join state
    that later files' older rows still need — 7 of 13 fixture matches
    were silently dropped that way (correct streaming semantics, wrong
    replay harness). Ordered quantile files keep the watermark
    monotonic, and the 30-minute delay comfortably covers the ±10-min
    band across file boundaries.

    Only click/purchase rows are staged: other event types never join
    and only ever advanced the watermark (which the ordered staging
    already keeps monotonic) — at scale this is the filter pushed down
    to the sources; here it also cuts the replayed state volume."""
    from database_syncer_spark.streaming.runner import (
        run_stream_to_memory, stage_as_stream_source_ordered)

    events = load_table(spark, sf_dir, "events").where(
        F.col("event_type").isin("click", "purchase"))
    tag = sf_dir_tag(sf_dir)
    src = stage_as_stream_source_ordered(
        events,
        os.path.join(tempfile.gettempdir(), f"dss_ssj2cp_src_{_STAGE_FMT}_{tag}"),
        3, reuse=True)
    staged = spark.read.parquet(src)

    def shape(stream: DataFrame) -> DataFrame:
        s = stream.withColumn("ts", F.col("ts").cast("timestamp"))
        clicks = (
            s.where(F.col("event_type") == "click")
            .withWatermark("ts", "30 minutes")
            .select(F.col("user_id").alias("c_user"),
                    F.col("event_id").alias("click_id"),
                    F.col("ts").alias("c_ts"))
        )
        purchases = (
            s.where(F.col("event_type") == "purchase")
            .withWatermark("ts", "30 minutes")
            .select(F.col("user_id").alias("p_user"),
                    F.col("event_id").alias("purchase_id"),
                    F.col("ts").alias("p_ts"))
        )
        return clicks.join(
            purchases,
            F.expr("c_user = p_user AND "
                   "p_ts BETWEEN c_ts - INTERVAL 10 MINUTES "
                   "AND c_ts + INTERVAL 10 MINUTES"),
        ).select(F.col("c_user").alias("user_id"), "click_id", "purchase_id")

    return run_stream_to_memory(
        spark, src, staged.schema, shape, f"dss_ssj2_{tag}",
        output_mode="append", shuffle_partitions=4,
    )


def _bucket(col_sec: int, offset: str = "0") -> str:
    return (
        f"make_timestamp(CAST((floor(epoch(ts) / {col_sec}) - ({offset})) "
        f"* {col_sec} * 1000000 AS BIGINT))"
    )


QUERIES = {
    "stream_tumbling_agg": stream_tumbling_agg,
    "stream_sliding_agg": stream_sliding_agg,
    "stream_session_window": stream_session_window,
    "stream_watermark_late": stream_watermark_late,
    "stream_dedup": stream_dedup,
    "stream_static_join": stream_static_join,
    "stream_stream_join": stream_stream_join,
    "stream_foreachbatch_merge": stream_foreachbatch_merge,
    "stream_stateful_custom": stream_stateful_custom,
    "stream_transform_with_state": stream_transform_with_state,
}

ORACLES = {
    "stream_tumbling_agg": f"""
SELECT {_bucket(600)} AS window_start,
       {_bucket(600)} + INTERVAL 10 MINUTE AS window_end,
       event_type, count(*) AS n,
       CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
FROM events GROUP BY 1, 2, 3
""",
    "stream_sliding_agg": f"""
SELECT {_bucket(300, 'g.i')} AS window_start, event_type, count(*) AS n
FROM events CROSS JOIN (SELECT 0 AS i UNION ALL SELECT 1) g
GROUP BY 1, 2
""",
    "stream_session_window": """
WITH seq AS (
  SELECT user_id, ts,
         CASE WHEN lag(ts) OVER w IS NULL
                   OR ts - lag(ts) OVER w >= INTERVAL 5 MINUTE
              THEN 1 ELSE 0 END AS new_s
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts)
), sess AS (
  SELECT user_id, ts,
         sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
                          ROWS UNBOUNDED PRECEDING) AS sid
  FROM seq
)
SELECT min(ts) AS session_start,
       max(ts) + INTERVAL 5 MINUTE AS session_end,
       user_id, count(*) AS n_events
FROM sess GROUP BY user_id, sid
""",
    "stream_watermark_late": f"""
SELECT {_bucket(600)} AS window_start, event_type, count(*) AS n
FROM events GROUP BY 1, 2
""",
    "stream_dedup": "SELECT DISTINCT user_id, event_type FROM events",
    "stream_static_join": f"""
SELECT {_TIER} AS tier, count(*) AS n,
       CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
FROM events WHERE event_type IS NOT NULL GROUP BY 1
""",
    "stream_stream_join": """
SELECT c.user_id, c.event_id AS click_id, p.event_id AS purchase_id
FROM events c JOIN events p
  ON c.user_id = p.user_id
 AND c.event_type = 'click' AND p.event_type = 'purchase'
 AND p.ts BETWEEN c.ts - INTERVAL 10 MINUTE AND c.ts + INTERVAL 10 MINUTE
""",
    "stream_foreachbatch_merge": """
SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderdate,
       o_orderpriority
FROM orders
""",
    "stream_stateful_custom": """
SELECT user_id, count(*) AS n_events, max(ts) AS last_ts
FROM events GROUP BY user_id
""",
    "stream_transform_with_state": """
SELECT user_id, count(*) AS n_events,
       count(DISTINCT event_type) AS n_types,
       max(value) AS max_value
FROM events GROUP BY user_id
""",
}
