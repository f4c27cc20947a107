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


def test_funnel_steps_ordering_constraints(spark):
    """Funnel steps only count events in sequence: clicks before the
    signup and purchases before the qualifying click are ignored."""
    import datetime as dt

    from database_syncer_spark.queries.extended import win_funnel_steps

    t = lambda m: dt.datetime(2026, 1, 1, 0, m)
    rows = [
        # user 1: full ordered journey
        (1, "signup", t(0)), (1, "click", t(1)), (1, "purchase", t(2)),
        # user 2: click precedes signup -> only step 1
        (2, "click", t(0)), (2, "signup", t(1)),
        # user 3: purchase precedes the post-signup click -> 2 steps
        (3, "signup", t(0)), (3, "purchase", t(1)), (3, "click", t(2)),
        # user 4: never signed up -> absent from the funnel
        (4, "click", t(0)), (4, "purchase", t(1)),
    ]
    ev = spark.createDataFrame(
        rows, "user_id long, event_type string, ts timestamp")
    ev.write.mode("overwrite").parquet("/tmp/dss_funnel_events")

    import database_syncer_spark.catalog as cat
    orig = cat.load_table
    try:
        cat.load_table = lambda sp, sf, name: sp.read.parquet(
            "/tmp/dss_funnel_events")
        import database_syncer_spark.queries.extended as ext
        ext_load = ext.load_table
        ext.load_table = cat.load_table
        try:
            got = {r.user_id: r.steps_completed
                   for r in win_funnel_steps(spark, "ignored").collect()}
        finally:
            ext.load_table = ext_load
    finally:
        cat.load_table = orig
    assert got == {1: 3, 2: 1, 3: 2}


def test_retention_cohort_matrix_semantics(spark):
    """Hand-checkable cohort matrix: cohort day = first event day,
    each (cohort, offset) cell counts distinct active users, offset 0
    is the full cohort (ppm exactly 1000000), and multiple events on
    one day count a user once."""
    import datetime as dt

    from database_syncer_spark.queries.extended import win_retention_cohort

    d = lambda day, h=0: dt.datetime(2026, 1, day, h)
    rows = [
        # cohort Jan 1: users 1,2. user 1 returns day+1 twice (dedup),
        # user 2 never returns.
        (1, d(1)), (1, d(2, 3)), (1, d(2, 9)),
        (2, d(1, 5)),
        # cohort Jan 3: user 3 alone, returns at offset 2
        (3, d(3)), (3, d(5)),
    ]
    # the query only needs a DataFrame with (user_id, ts) — hand the
    # in-memory frame straight through load_table, no scratch-path
    # parquet round trip (r9 advice: the hardcoded /tmp path collided
    # across concurrent runs)
    ev = spark.createDataFrame(rows, "user_id long, ts timestamp")

    import database_syncer_spark.queries.extended as ext
    orig = ext.load_table
    try:
        ext.load_table = lambda sp, sf, name: ev
        got = {(r.cohort_day.isoformat(), r.day_offset):
               (r.n_active, r.cohort_size, r.retention_ppm)
               for r in win_retention_cohort(spark, "ignored").collect()}
    finally:
        ext.load_table = orig
    assert got == {
        ("2026-01-01", 0): (2, 2, 1000000),
        ("2026-01-01", 1): (1, 2, 500000),
        ("2026-01-03", 0): (1, 1, 1000000),
        ("2026-01-03", 2): (1, 1, 1000000),
    }
