"""Checks that the rows-only relational keys are not just runnable but
semantically right (the oracle can't cover them)."""

from __future__ import annotations

from pyspark.sql import functions as F

from database_syncer_spark.catalog import load_table
from database_syncer_spark.queries.aggregates import agg_approx_distinct
from database_syncer_spark.queries.relational import join_asof


def test_approx_distinct_error_bound(spark, sf_dir):
    """The key's own within-10% HLL flags hold, and the exact counts it
    carries match an independent recomputation."""
    row = agg_approx_distinct(spark, sf_dir).collect()[0]
    li = load_table(spark, sf_dir, "lineitem")
    exact = li.agg(
        F.countDistinct("l_orderkey"), F.countDistinct("l_partkey")
    ).collect()[0]
    assert row.exact_orders == exact[0] and row.exact_parts == exact[1]
    assert row.approx_orders_within_10pct and row.approx_parts_within_10pct


def test_asof_join_semantics(spark, sf_dir):
    """Every as-of match is the max signup ts <= purchase ts for the user
    (checked row-by-row against a driver-side index at smoke scale)."""
    ev = load_table(spark, sf_dir, "events").collect()
    signups = {}
    for r in ev:
        if r.event_type == "signup":
            signups.setdefault(r.user_id, []).append(r.ts)
    out = join_asof(spark, sf_dir).collect()
    purchases = [r for r in ev if r.event_type == "purchase"]
    assert len(out) == len(purchases)
    for r in out:
        expect = max((t for t in signups.get(r.user_id, []) if t <= r.ts),
                     default=None)
        assert r.asof_signup_ts == expect, (r, expect)
