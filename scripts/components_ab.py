#!/usr/bin/env python
"""r13 measure-first A/B for the connected-components loop (VERDICT r12
item 3): the current loop is 1 join + 1 cache-scan count per iteration,
O(diameter) iterations. Candidate: add a pointer-jumping step
(component <- label[component], the "path halving" half of
large-star/small-star) to the SAME iteration so label depth halves per
round — O(log d) iterations at the price of one extra join per round.

Measures, interleaved in one session:
  - fixture regime: minhash_lsh_dedup(sf0.1 documents) edges
  - chain regime: a synthetic path graph (worst-case diameter) at 1M
    edges, where O(d) vs O(log d) is the whole story

Reports iterations, jobs (statusTracker), wall seconds, and asserts the
label maps are identical.

Usage: python scripts/components_ab.py [sf_dir] [reps]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark import StorageLevel
from pyspark.sql import functions as F


def cc_current(edges, src="doc_a", dst="doc_b", max_iter=20):
    """Verbatim copy of pipeline/dedup.py connected_components, plus an
    iteration counter."""
    sym = (
        edges.select(F.explode(F.array(
            F.struct(F.col(src).alias("a"), F.col(dst).alias("b")),
            F.struct(F.col(dst).alias("a"), F.col(src).alias("b")),
        )).alias("e"))
        .select("e.a", "e.b")
    )
    sym = sym.persist(StorageLevel.MEMORY_AND_DISK)
    comp = (
        sym.select(F.col("a").alias("id")).distinct()
        .select("id", F.col("id").alias("component"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    cached = comp
    iters = 0
    for _ in range(max_iter):
        iters += 1
        nbr_min = (
            sym.join(comp, sym.b == comp.id)
            .groupBy(F.col("a").alias("id"))
            .agg(F.min("component").alias("nbr_component"))
        )
        nxt = (
            comp.join(nbr_min, "id", "left")
            .select(
                "id",
                F.least(
                    "component",
                    F.coalesce("nbr_component", F.col("component")),
                ).alias("component"),
                (F.coalesce("nbr_component", F.col("component"))
                 < F.col("component")).alias("__improved"),
            )
            .persist(StorageLevel.MEMORY_AND_DISK)
        )
        changed = nxt.where("__improved").count()
        cached.unpersist()
        cached = nxt
        comp = nxt.select("id", "component")
        if changed == 0:
            break
    result = (comp.select(F.col("id").alias("doc_id"), "component")
              .localCheckpoint(eager=True))
    cached.unpersist()
    sym.unpersist()
    return result, iters


def cc_selfedge(edges, src="doc_a", dst="doc_b", max_iter=20):
    """ONE join per iteration: self-edges (id, id) inject each node's
    own label into the neighbor-min, so min over N(a) ∪ {a} IS the
    update rule — the comp.join(nbr_min, left) disappears. Convergence
    by monotone label sum (labels strictly decrease on any change), so
    no __improved flag and only ONE reference to comp per iteration
    (the print/lineage tree grows linearly, not 2^i)."""
    sym = (
        edges.select(F.explode(F.array(
            F.struct(F.col(src).alias("a"), F.col(dst).alias("b")),
            F.struct(F.col(dst).alias("a"), F.col(src).alias("b")),
        )).alias("e"))
        .select("e.a", "e.b")
    )
    nodes = sym.select(F.col("a").alias("id")).distinct()
    sym = sym.unionByName(
        nodes.select(F.col("id").alias("a"), F.col("id").alias("b"))
    ).persist(StorageLevel.MEMORY_AND_DISK)
    comp = (nodes.select("id", F.col("id").alias("component"))
            .persist(StorageLevel.MEMORY_AND_DISK))
    prev_sum = None
    cached = comp
    iters = 0
    for _ in range(max_iter):
        iters += 1
        nxt = (
            sym.join(comp, sym.b == comp.id)
            .groupBy(F.col("a").alias("id"))
            .agg(F.min("component").alias("component"))
            .persist(StorageLevel.MEMORY_AND_DISK)
        )
        cur_sum = nxt.agg(
            F.sum(F.col("component").cast("decimal(38,0)"))).collect()[0][0]
        cached.unpersist()
        cached = nxt
        comp = nxt
        if cur_sum == prev_sum:
            break
        prev_sum = cur_sum
    result = (comp.select(F.col("id").alias("doc_id"), "component")
              .localCheckpoint(eager=True))
    cached.unpersist()
    sym.unpersist()
    return result, iters


def cc_doubling(edges, src="doc_a", dst="doc_b", max_iter=20):
    """Neighbor-min + pointer-jump per iteration: after taking the min
    over neighbors' labels, each node additionally adopts its label's
    label (label[label[id]]) — labels only decrease and every label is
    a reachable node's id, so correctness is unchanged while label
    depth roughly halves per round."""
    sym = (
        edges.select(F.explode(F.array(
            F.struct(F.col(src).alias("a"), F.col(dst).alias("b")),
            F.struct(F.col(dst).alias("a"), F.col(src).alias("b")),
        )).alias("e"))
        .select("e.a", "e.b")
    )
    sym = sym.persist(StorageLevel.MEMORY_AND_DISK)
    comp = (
        sym.select(F.col("a").alias("id")).distinct()
        .select("id", F.col("id").alias("component"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    cached = comp
    iters = 0
    for _ in range(max_iter):
        iters += 1
        nbr_min = (
            sym.join(comp, sym.b == comp.id)
            .groupBy(F.col("a").alias("id"))
            .agg(F.min("component").alias("nbr_component"))
        )
        upd = (
            comp.join(nbr_min, "id", "left")
            .select(
                "id",
                F.least(
                    "component",
                    F.coalesce("nbr_component", F.col("component")),
                ).alias("component"),
                (F.coalesce("nbr_component", F.col("component"))
                 < F.col("component")).alias("__improved"),
            )
        )
        # pointer jump through the PREVIOUS (persisted) map: jumping
        # through upd itself would reference the un-persisted update
        # subtree twice and execute it twice per materialization; the
        # stale map still halves depth (labels are monotone, and
        # comp_prev[l] <= l is a reachable label for every holder of l).
        lbl = comp.select(F.col("id").alias("__lid"),
                          F.col("component").alias("__lcomp"))
        nxt = (
            upd.join(lbl, upd.component == lbl.__lid, "left")
            .select(
                "id",
                F.least("component",
                        F.coalesce("__lcomp", F.col("component"))
                        ).alias("component"),
                (F.col("__improved")
                 | (F.coalesce("__lcomp", F.col("component"))
                    < F.col("component"))).alias("__improved"),
            )
            .persist(StorageLevel.MEMORY_AND_DISK)
        )
        changed = nxt.where("__improved").count()
        cached.unpersist()
        cached = nxt
        comp = nxt.select("id", "component")
        if changed == 0:
            break
    result = (comp.select(F.col("id").alias("doc_id"), "component")
              .localCheckpoint(eager=True))
    cached.unpersist()
    sym.unpersist()
    return result, iters


def run(spark, name, fn, edges):
    sc = spark.sparkContext
    group = f"ccab_{name}_{time.time_ns()}"
    sc.setJobGroup(group, name)
    t0 = time.perf_counter()
    res, iters = fn(edges)
    res.write.format("noop").mode("overwrite").save()
    wall = time.perf_counter() - t0
    sc._jsc.clearJobGroup()
    jobs = len(sc.statusTracker().getJobIdsForGroup(group))
    rows = sorted(map(tuple, res.collect()))
    print(f"  {name:10s} wall={wall:.3f}s iters={iters} jobs={jobs}",
          flush=True)
    return rows, wall


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 2

    from database_syncer_spark.catalog import load_table
    from database_syncer_spark.pipeline.dedup import minhash_lsh_dedup
    from database_syncer_spark.session import get_spark

    spark = get_spark("components_ab")
    spark.sparkContext.setLogLevel("ERROR")

    print("== fixture regime: LSH edges over sf0.1 documents ==", flush=True)
    docs = load_table(spark, sf_dir, "documents")
    edges = minhash_lsh_dedup(docs).localCheckpoint(eager=True)
    r_cur, _ = run(spark, "current", cc_current, edges)
    r_se, _ = run(spark, "selfedge", cc_selfedge, edges)
    assert r_cur == r_se, "label maps differ on fixture edges"
    for i in range(reps):
        run(spark, "current", cc_current, edges)
        run(spark, "selfedge", cc_selfedge, edges)

    # NOTE (r13): a 1M-node PATH graph regime was attempted first and
    # MELTED THE DRIVER on the current shape — each iteration references
    # the cached comp twice, so the printed/evented plan tree doubles
    # per iteration (2^i fragments) and SparkListenerSQLExecutionStart's
    # physicalPlanDescription stringification burned >21 min of driver
    # CPU in generateTreeString before the run was killed. Depth is
    # therefore capped at 8 here for the CURRENT variant's sake; the
    # selfedge variant's single comp reference keeps the tree linear.
    print("== chain regime: 125k chains x depth 8 = 1M edges ==",
          flush=True)
    chain8 = (spark.range(0, 1_000_000)
              .select(((F.col("id") % 125_000) * 1_000
                       + (F.col("id") / 125_000).cast("long")
                       ).alias("doc_a"),
                      ((F.col("id") % 125_000) * 1_000
                       + (F.col("id") / 125_000).cast("long")
                       + 1).alias("doc_b"))
              .repartition(32)
              .localCheckpoint(eager=True))
    # current is NOT run here: even at depth 8 its doubled-per-iteration
    # comp references make ANALYSIS of iteration i's plan walk ~2^i
    # fragments — a 580 s timeout expired inside the loop (the same
    # pathology as the depth-1M melt, just earlier in the pipeline than
    # the print). selfedge alone, to show convergence + linear plans:
    c_se, _ = run(spark, "selfedge", cc_selfedge, chain8)

    print("== star-forest regime: 1M edges, 10k clusters of 100 ==",
          flush=True)
    forest = (spark.range(0, 1_000_000)
              .select((F.col("id") % 10_000 * 1_000_000).alias("doc_a"),
                      (F.col("id") % 10_000 * 1_000_000
                       + (F.col("id") / 10_000).cast("long")
                       + 1).alias("doc_b"))
              .repartition(32)
              .localCheckpoint(eager=True))
    f_cur, _ = run(spark, "current", cc_current, forest)
    f_se, _ = run(spark, "selfedge", cc_selfedge, forest)
    assert f_cur == f_se, "label maps differ on star forest"


if __name__ == "__main__":
    main()
