#!/usr/bin/env python
"""Re-measure the r9 secondary-bench outliers on a quiet host (VERDICT
r9 item 1): BENCH_r09 recorded `sim_lsh_ann` 150.3 s (r8: 2.096 s) plus
2.6-3.4× upticks on four other keys whose code the r9 diff never
touched. The adjudication question is burst-vs-regression; since the
code is unchanged (verified per-key with `git diff` in BASELINE.md),
a same-host quiet re-measure with the bench's own discipline (1 warmup,
3 timed, RAW triple reported) settles it: a median back at the r8 level
means the recorded number was a co-tenant burst.

Usage: python scripts/secondary_adjudicate.py [key ...]
Prints one JSON line with the raw triples.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DEFAULT_KEYS = [
    "sim_lsh_ann",          # recorded 150.312 vs r8 2.096
    "sink_merge_executor",  # 12.0 vs 4.2
    "stream_stream_join",   # 10.2 vs 3.5
    "dedup_corpus_keep",    # 10.3 vs 3.0
    "dedup_soft_keep",      # 7.7 vs 2.9
]


def main() -> None:
    keys = sys.argv[1:] or DEFAULT_KEYS
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from database_syncer_spark.registry import all_queries
    from database_syncer_spark.session import get_spark

    spark = get_spark("secondary_adjudicate")
    spark.sparkContext.setLogLevel("ERROR")
    queries = all_queries()
    # same warmups as bench.py's preamble
    spark.read.parquet(os.path.join(sf_dir, "region.parquet")).count()
    spark.range(0, 64, 1, 32).mapInPandas(lambda it: it, "id long").count()

    out: dict[str, list[float]] = {}
    for key in keys:
        fn = queries[key]

        def run() -> float:
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            return time.perf_counter() - t0

        run()  # warmup
        out[key] = sorted(round(run(), 3) for _ in range(3))
    print(json.dumps({"metric": "secondary_adjudication",
                      "sf_dir": sf_dir, "runs": out,
                      "loadavg": os.getloadavg()}))


if __name__ == "__main__":
    main()
