"""Local mirror of the driver's correctness gate.

Runs EVERY registered query key that has an oracle against DuckDB at
sf0.001 and requires exact canonical-value equality. If this passes, the
driver's sf0.01 check should too (same derivations, just more rows).
"""

from __future__ import annotations

import pytest

from database_syncer_spark.registry import all_oracles, all_queries

QUERIES = all_queries()
ORACLES = all_oracles()


def test_every_oracle_key_has_a_query():
    missing = set(ORACLES) - set(QUERIES)
    assert not missing, f"oracle keys without query impl: {missing}"


# Keys whose plans legitimately contain a BroadcastNestedLoopJoin: the
# broadcast-tiny crossJoins (a 1-row global aggregate or the Q query
# rows / model-state side) and the deliberately-naive theta-range
# sibling of join_range_banded. Anything NEW showing a BNLJ must either
# be justified here or re-planned.
_BNLJ_OK = {
    "agg_approx_distinct", "agg_hll_sketch_merge", "corpus_datacard",
    "join_theta_range", "sample_mix_epochs", "sample_temperature_mix",
    "sim_ivf_ann", "sim_ivf_incremental", "sim_ivfpq_ann", "sim_lsh_ann",
    "sim_pq_ann", "sim_topk_cosine", "text_langid", "text_tfidf_topk",
}


@pytest.mark.parametrize("key", sorted(ORACLES))
def test_oracle_parity(key, spark, duck, sf_dir):
    from database_syncer_spark.oracle import compare_query

    df = QUERIES[key](spark, sf_dir)
    res = compare_query(key, df, duck, ORACLES[key])
    assert res.ok, res.message()
    # Plan hygiene, checked AFTER execution so the string reflects the
    # AQE FINAL plan (pre-execution, AdaptiveSparkPlan prints the
    # initial plan and a runtime join-strategy demotion would slip
    # past — the same plan-guard blind spot the r5 codegen incident
    # exposed): no unconditional cross product, no row-at-a-time
    # Python, and BroadcastNestedLoopJoin only where a broadcast-tiny
    # side makes it the right plan (whitelist above).
    plan = df._jdf.queryExecution().executedPlan().toString()
    # An executed AdaptiveSparkPlan prints BOTH "== Final Plan ==" and
    # "== Initial Plan ==" sections; keep only the final one — a shape
    # AQE eliminated at runtime (empty-relation propagation, broadcast
    # conversion) must not fail the check for the plan that never ran.
    if "== Initial Plan ==" in plan:
        plan = plan.split("== Initial Plan ==")[0]
    assert "CartesianProduct" not in plan, f"{key}: unconditional cross product"
    # UDTFs are exempt from the row-at-a-time ban: the Arrow UDTF
    # evaluator A/B'd ~2x SLOWER at the 1M-doc probe for high-fanout
    # yields, so session.py deliberately KEEPS the default pickle path
    # and BatchEvalPythonUDTF is the measured right choice there; plain
    # BatchEvalPython (a UDF) stays banned.
    assert "BatchEvalPython" not in plan.replace("BatchEvalPythonUDTF", ""), \
        f"{key}: row-at-a-time Python"
    if "BroadcastNestedLoopJoin" in plan:
        assert key in _BNLJ_OK, f"{key}: unexpected BroadcastNestedLoopJoin"


_ROWS_ONLY = sorted(set(QUERIES) - set(ORACLES))

if _ROWS_ONLY:  # every key currently has an oracle; an empty parametrize
    # set would otherwise report a permanent phantom skip.
    @pytest.mark.parametrize("key", _ROWS_ONLY)
    def test_rows_only_keys_run(key, spark, sf_dir):
        df = QUERIES[key](spark, sf_dir)
        assert df.count() >= 0
else:
    def test_no_rows_only_keys():
        """Pin the invariant the registry currently holds: every query
        key ships a DuckDB value oracle (COVERAGE.md's headline)."""
        assert set(QUERIES) == set(ORACLES)
