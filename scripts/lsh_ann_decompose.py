#!/usr/bin/env python
"""r13 measure-first decomposition of sim_lsh_ann's residual ~2.5 s
(VERDICT r12 item 4): per-stage noop-sink timing of the registry key's
components — index build, serve (prebuilt vs inline), brute-force
exact side, recall join — plus job/stage/task counters, all in one
session so the numbers are cross-comparable on this bimodal host.

Usage: python scripts/lsh_ann_decompose.py [sf_dir] [reps]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3

    from database_syncer_spark.catalog import load_table
    from database_syncer_spark.pipeline import similarity as S
    from database_syncer_spark.queries.pipeline import _emb_dim
    from database_syncer_spark.session import get_spark

    spark = get_spark("lsh_ann_decompose")
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext
    emb = load_table(spark, sf_dir, "embeddings")
    dim = _emb_dim(sf_dir, emb)
    spark.range(0, 64, 1, 32).mapInPandas(lambda it: it, "id long").count()

    def timed(name, mk):
        def one(collect_counters: bool) -> float:
            group = f"{name}_{time.time_ns()}"
            if collect_counters:
                sc.setJobGroup(group, name)
            t0 = time.perf_counter()
            mk().write.format("noop").mode("overwrite").save()
            wall = time.perf_counter() - t0
            if collect_counters:
                sc._jsc.clearJobGroup()
                st = sc.statusTracker()
                jobs = st.getJobIdsForGroup(group)
                n_stages = n_tasks = 0
                for j in jobs:
                    ji = st.getJobInfo(j)
                    if ji is None:
                        continue
                    for s in ji.stageIds:
                        si = st.getStageInfo(s)
                        if si is not None:
                            n_stages += 1
                            n_tasks += si.numTasks
                print(f"  {name:28s} jobs={len(jobs)} stages={n_stages} "
                      f"tasks={n_tasks}", flush=True)
            return wall

        one(False)  # warmup
        walls = sorted(round(one(r == reps - 1), 3) for r in range(reps))
        print(f"  {name:28s} {walls}", flush=True)
        return walls

    print("== stage decomposition (sf0.1 embeddings) ==", flush=True)

    timed("full_key", lambda: S.ann_recall(
        emb, S.lsh_ann_topk(emb, dim=dim), dim=dim))
    timed("build_bucketed_only", lambda: S.build_lsh_index(
        emb, dim=dim)["bucketed"])
    timed("serve_inline_build", lambda: S.lsh_ann_topk(emb, dim=dim))
    idx = S.build_lsh_index(emb, dim=dim)
    idx["bucketed"] = idx["bucketed"].persist()
    idx["bucketed"].count()
    timed("serve_prebuilt", lambda: S.lsh_ann_topk(emb, dim=dim, index=idx))
    timed("brute_force_only", lambda: S.brute_force_topk(emb, dim=dim))
    timed("recall_of_prebuilt_serve", lambda: S.ann_recall(
        emb, S.lsh_ann_topk(emb, dim=dim, index=idx), dim=dim))
    ann = S.lsh_ann_topk(emb, dim=dim).localCheckpoint(eager=True)
    timed("recall_of_materialized_ann", lambda: S.ann_recall(
        emb, ann, dim=dim))
    idx["bucketed"].unpersist()


if __name__ == "__main__":
    main()
