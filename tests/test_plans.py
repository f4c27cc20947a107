"""Physical-plan regression guards.

SCALE.md's claims are enforceable: dims broadcast, filters and projections
reach the parquet scan, aggregations partial-combine map-side, and the
core diff stays a single-shuffle-per-side sort-merge join. A refactor
that silently degrades any of these fails here, not at 100 TB.
"""

from __future__ import annotations

import re

import pytest


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_star_join_broadcasts_dims(spark, sf_dir):
    from database_syncer_spark.registry import all_queries

    plan = _plan(all_queries()["join_multiway_star"](spark, sf_dir))
    assert "SortMergeJoin" not in plan, "star dims must broadcast, not shuffle"
    assert plan.count("BroadcastHashJoin") >= 3


def test_scan_pushes_filter_and_prunes_columns(spark, sf_dir):
    from pyspark.sql import functions as F
    from database_syncer_spark.catalog import load_table

    df = (load_table(spark, sf_dir, "lineitem")
          .where(F.col("l_quantity") > 30)
          .select("l_orderkey", "l_quantity"))
    plan = _plan(df)
    assert re.search(r"PushedFilters: \[.*GreaterThan\(l_quantity", plan)
    m = re.search(r"ReadSchema: struct<([^>]*)>", plan)
    assert m and set(c.split(":")[0] for c in m.group(1).split(",")) == {
        "l_orderkey", "l_quantity"}, "scan must read only projected columns"


def test_agg_partial_combines_map_side(spark, sf_dir):
    from database_syncer_spark.registry import all_queries

    plan = _plan(all_queries()["agg_multi_measures"](spark, sf_dir))
    # partial + final HashAggregate pair around a single exchange
    assert plan.count("HashAggregate") >= 2
    assert len(re.findall(r"Exchange hashpartitioning", plan)) == 1


def test_diff_is_single_join_no_extra_exchanges(spark, sf_dir):
    from database_syncer_spark.registry import all_queries

    plan = _plan(all_queries()["diff_cdc_fullouter"](spark, sf_dir))
    assert plan.count("SortMergeJoin") == 1
    # one shuffle per side, none after the join
    assert len(re.findall(r"Exchange hashpartitioning", plan)) == 2


def test_dedup_last_wins_is_hash_agg_not_sort(spark):
    from database_syncer_spark.core.diff import dedup_last_wins

    df = spark.createDataFrame(
        [(1, 1, "a"), (1, 2, "b")], "id int, seq int, v string")
    plan = _plan(dedup_last_wins(df, ["id"], ["seq"]))
    assert "max_by" in plan or "HashAggregate" in plan
    assert "Window" not in plan
