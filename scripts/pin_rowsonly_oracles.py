#!/usr/bin/env python
"""Measure the deterministic outputs of the remaining rows-only dedup keys
(dedup_minhash_lsh, dedup_simhash) on the driver-relevant fixtures and
print the pin tables queries/pipeline.py embeds in their oracles.

The algorithms are seed-free (xxhash64 minhash families / fingerprints,
fixed band structure) and the fixtures immutable, so the outputs are pure
functions of (code, fixture): pinning them gives the driver a value hash
to check instead of rows-only. For minhash the JACCARD VALUES come from
honest SQL (the exact inverted-index oracle); only the LSH-FOUND PAIR SET
is pinned — if LSH recall is 1.0 on a fixture the pin equals the exact
pair set. For simhash the (doc_a, doc_b, hamming) triples are pinned
whole (hamming distances of xxhash64 fingerprints are not SQL-derivable).

Rerun after ANY change to pipeline/dedup.py parameters or the fixtures,
and paste the printed dict into queries/pipeline.py.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    import duckdb

    from database_syncer_spark.catalog import load_table
    from database_syncer_spark.pipeline.dedup import (
        minhash_lsh_dedup, simhash_dedup)
    from database_syncer_spark.session import get_spark

    spark = get_spark("pin_oracles", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")

    print("_DEDUP_PINS = {")
    for sf in ("sf0.001", "sf0.01"):
        sf_dir = f"/root/testdata/{sf}"
        docs = load_table(spark, sf_dir, "documents")
        con = duckdb.connect()
        fp = con.execute(
            "SELECT CAST(count(*) + sum(n_chars) AS BIGINT) FROM "
            f"read_parquet('{sf_dir}/documents.parquet')").fetchone()[0]
        mh = sorted((int(r.doc_a), int(r.doc_b))
                    for r in minhash_lsh_dedup(docs).collect())
        sh = sorted((int(r.doc_a), int(r.doc_b), int(r.hamming))
                    for r in simhash_dedup(docs).collect())
        print(f"    # {sf}")
        print(f"    {fp}: {{")
        print(f"        'minhash_pairs': {mh},")
        print(f"        'simhash_rows': {sh},")
        print("    },")
    print("}")


if __name__ == "__main__":
    main()
