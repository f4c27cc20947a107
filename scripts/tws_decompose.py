#!/usr/bin/env python
"""r13 measure-first decomposition of stream_transform_with_state
(VERDICT r12 item 6: 7.8 s in the r12 profile, heaviest unbenched
streaming key). Questions the profile must answer before any change:

  1. per-epoch cost: how much of the wall is micro-batch barriers?
     (replay the same rows as 3 files/3 epochs vs 1 epoch)
  2. partition floor: state stores are per shuffle partition per epoch —
     what do 4 / 8 / 32 partitions cost on the fixed fixture?
  3. API: transformWithStateInPandas vs applyInPandasWithState on the
     identical fold (same rows, same partitions, same epochs).

All variants run interleaved in one session; each is 1 warmup + the
median of `reps`. The staged sources are the key's own (reuse=True) or
fresh per variant where the file count differs.

Usage: python scripts/tws_decompose.py [sf_dir] [reps]
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3

    from database_syncer_spark.catalog import load_table
    from database_syncer_spark.session import get_spark
    from database_syncer_spark.streaming.runner import (
        run_stream_to_memory, stage_as_stream_source)
    from database_syncer_spark.streaming.stateful import (
        user_type_profile_tws, tws_available)
    from database_syncer_spark.queries.pipeline import sf_dir_tag

    spark = get_spark("tws_decompose")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(0, 64, 1, 32).mapInPandas(lambda it: it, "id long").count()

    events = load_table(spark, sf_dir, "events")
    tag = sf_dir_tag(sf_dir)
    tmp = tempfile.gettempdir()
    src3 = stage_as_stream_source(
        events, os.path.join(tmp, f"dss_twsd3_{tag}"), 3, reuse=True)
    src1 = stage_as_stream_source(
        events, os.path.join(tmp, f"dss_twsd1_{tag}"), 1, reuse=True)
    schema = spark.read.parquet(src3).schema
    print(f"tws_available={tws_available(spark)} "
          f"rows={events.count()}", flush=True)

    def fallback_shape(ev):
        from database_syncer_spark.streaming.stateful import (
            TWS_OUTPUT_SCHEMA, _FALLBACK_STATE, _update_type_profile)
        return ev.groupBy("user_id").applyInPandasWithState(
            _update_type_profile,
            outputStructType=TWS_OUTPUT_SCHEMA,
            stateStructType=_FALLBACK_STATE,
            outputMode="update",
            timeoutConf="NoTimeout",
        )

    variants = {
        "tws_3ep_8p": (src3, user_type_profile_tws, 8),
        "tws_1ep_8p": (src1, user_type_profile_tws, 8),
        "tws_3ep_4p": (src3, user_type_profile_tws, 4),
        "tws_3ep_32p": (src3, user_type_profile_tws, 32),
        "apiws_3ep_8p": (src3, fallback_shape, 8),
    }

    def one(name, src, shape, parts) -> float:
        t0 = time.perf_counter()
        run_stream_to_memory(
            spark, src, schema, shape,
            f"dss_twsd_{name}_{time.time_ns() % 100000}",
            output_mode="update", shuffle_partitions=parts)
        return time.perf_counter() - t0

    for name, (src, shape, parts) in variants.items():
        one(name, src, shape, parts)  # warmup
        walls = sorted(round(one(name, src, shape, parts), 3)
                       for _ in range(reps))
        print(f"{name:14s} {walls}", flush=True)


if __name__ == "__main__":
    main()
