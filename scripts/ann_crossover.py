#!/usr/bin/env python
"""ANN serving crossover probe (VERDICT r4 item 4): serving latency of
each prebuilt-index family vs exact brute force, at sf0.1 (2 k vectors)
AND at the 500x probe fixture (1 M vectors, scripts/scale_probe.py's
perturbed replicas). SCALE.md carries the resulting table.

The question this answers: past what corpus size does compressed /
pruned scanning (PQ ADC, IVF cell pruning) beat the exact Q x N codegen
scan? At toy scale fixed overheads (model broadcast, LUT construction,
the re-rank join) dominate; the probe shows where each family's
corpus-proportional savings overtake them.

Methodology matches bench.py's ann_serving section: index built ONCE,
at-rest corpus artifact persisted+counted outside the timings, then the
*_ann_topk serving call timed alone (noop sink), 1 warmup, median of 3.

Usage: python scripts/ann_crossover.py [--sf-dirs /root/testdata/sf0.1,/tmp/dss_sf1]
(the second dir must exist — run scale_probe.py first to generate it).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def probe_dir(spark, sf_dir: str) -> dict:
    from database_syncer_spark.catalog import load_table
    from database_syncer_spark.pipeline import similarity as S
    from database_syncer_spark.queries.pipeline import _emb_dim

    emb = load_table(spark, sf_dir, "embeddings")
    dim = _emb_dim(sf_dir, emb)
    n = emb.count()

    corpus_keys = {"lsh": "bucketed", "ivf": "assigned",
                   "pq": "coded", "ivfpq": "coded"}
    builders = {
        "lsh": lambda: S.build_lsh_index(emb, dim=dim),
        "ivf": lambda: S.build_ivf_index(emb, dim=dim),
        "pq": lambda: S.build_pq_index(emb, dim=dim),
        "ivfpq": lambda: S.build_ivfpq_index(emb, dim=dim),
    }
    build_sec, indexes = {}, {}
    for name, build in builders.items():
        t0 = time.perf_counter()
        idx = build()
        corpus = idx[corpus_keys[name]].persist()
        corpus.count()
        build_sec[name] = round(time.perf_counter() - t0, 2)
        indexes[name] = idx

    serving_fns = {
        "brute": lambda: S.brute_force_topk(emb, dim=dim),
        "lsh": lambda: S.lsh_ann_topk(emb, dim=dim, index=indexes["lsh"]),
        "ivf": lambda: S.ivf_ann_topk(emb, dim=dim, index=indexes["ivf"]),
        "pq": lambda: S.pq_ann_topk(emb, dim=dim, index=indexes["pq"]),
        "ivfpq": lambda: S.ivfpq_ann_topk(emb, dim=dim,
                                          index=indexes["ivfpq"]),
    }
    serve_sec = {}
    for skey, fn in serving_fns.items():
        def srun() -> float:
            t0 = time.perf_counter()
            fn().write.format("noop").mode("overwrite").save()
            return time.perf_counter() - t0
        srun()  # warmup
        serve_sec[skey] = round(sorted(srun() for _ in range(3))[1], 2)
        print(f"{sf_dir} {skey}: {serve_sec[skey]}s", file=sys.stderr)
    for idx in indexes.values():
        for key in set(corpus_keys.values()):
            if key in idx:
                idx[key].unpersist()
    return {"n_vectors": n, "build_sec": build_sec, "serve_sec": serve_sec}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dirs",
                    default="/root/testdata/sf0.1,/tmp/dss_sf1")
    args = ap.parse_args()

    from database_syncer_spark.session import get_spark

    spark = get_spark("ann_crossover", shuffle_partitions=64)
    spark.sparkContext.setLogLevel("ERROR")

    out = {d: probe_dir(spark, d) for d in args.sf_dirs.split(",")}
    print(json.dumps({"metric": "ann_serving_crossover", "results": out}))


if __name__ == "__main__":
    main()
