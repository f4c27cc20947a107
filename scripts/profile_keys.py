#!/usr/bin/env python
"""Simulate the round driver: run every registry key (Spark + DuckDB
oracle) at sf0.01 in registry order, timing each, so the heavy tail can
be found and shrunk — driver coverage is bounded, so key cost IS
coverage. Writes scripts/profile_keys.json.

Usage: python scripts/profile_keys.py [sf_dir] [--keys k1,k2]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = "/root/testdata/sf0.01"
    only = None
    args = sys.argv[1:]
    while args:
        a = args.pop(0)
        if a == "--keys":
            only = args.pop(0).split(",")
        else:
            sf_dir = a

    from database_syncer_spark.session import get_spark
    from database_syncer_spark.registry import all_queries, all_oracles
    from database_syncer_spark.oracle import duck_connection, compare_query

    spark = get_spark("profile")
    spark.sparkContext.setLogLevel("ERROR")
    queries = all_queries()
    oracles = all_oracles()
    con = duck_connection(sf_dir)

    out = {}
    t_total = time.perf_counter()
    for key, fn in queries.items():
        if only and key not in only:
            continue
        t0 = time.perf_counter()
        status = "ok"
        nrows = None
        try:
            df = fn(spark, sf_dir)
            if key in oracles:
                res = compare_query(key, df, con, oracles[key])
                nrows = res.spark_rows
                if not res.ok:
                    status = "MISMATCH"
            else:
                nrows = df.count()
                status = "rows-only"
        except Exception as exc:  # noqa: BLE001
            status = f"ERR {type(exc).__name__}: {exc}"[:200]
        dt = time.perf_counter() - t0
        out[key] = {"sec": round(dt, 3), "rows": nrows, "status": status}
        print(f"{dt:7.2f}s {key:32s} {status} rows={nrows}", flush=True)

    total = time.perf_counter() - t_total
    print(f"TOTAL {total:.1f}s for {len(out)} keys")
    # A --keys-filtered run must not clobber the full-registry artifact.
    name = "profile_keys.json" if not only else "profile_keys_partial.json"
    with open(os.path.join(os.path.dirname(__file__), name), "w") as f:
        json.dump({"total_sec": round(total, 1), "sf_dir": sf_dir, "keys": out}, f, indent=1)


if __name__ == "__main__":
    main()
