#!/usr/bin/env python
"""Regenerate the 5 regression-pinned oracle row sets WITHOUT Spark.

Derives `_SIMHASH_PINS` and `_ANN_PINS` (queries/pipeline.py) end to end
from the parquet fixtures with the numpy/pure-Python mirror in
tests/ann_reference.py — hyperplanes, xxhash64 seed selection, Lloyd
passes, ADC scan, exact re-rank, recall — and compares byte-for-byte
against the constants currently embedded in the engine. Exits non-zero
on any mismatch.

This replaces scripts/pin_rowsonly_oracles.py's transcription of the
engine's own measured output as the pin SOURCE (that script remains
useful as a quick Spark-side cross-check): pins produced here cannot
inherit a pin-time engine bug, because the mirror shares no Spark code.

Run after ANY change to pipeline/similarity.py, pipeline/dedup.py
parameters, or the fixtures; paste the printed dicts into
queries/pipeline.py on an intended change.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))

FIXTURES = ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]


def main() -> int:
    import ann_reference as AR

    from database_syncer_spark.queries.pipeline import (
        _ANN_PINS, _SIMHASH_PINS)

    ok = True

    print("# --- dedup_simhash pins (numpy-derived) ---")
    print("_SIMHASH_PINS = {")
    for sf_dir in FIXTURES:
        docs, fp = AR.load_documents(sf_dir)
        rows = AR.simhash_pairs(docs)
        match = sorted(_SIMHASH_PINS.get(fp, [])) == rows
        ok &= match
        print(f"    {fp}: {rows},  # {os.path.basename(sf_dir)} "
              f"{'== embedded' if match else '!= EMBEDDED (MISMATCH)'}")
    print("}")

    print("\n# --- sim_*_ann recall pins (numpy-derived) ---")
    print("_ANN_PINS = {")
    derived = {sf: AR.derive_ann_pins(sf) for sf in FIXTURES}
    for fam, embedded in _ANN_PINS.items():
        cols = tuple(derived[sf][fam] for sf in FIXTURES)
        match = cols == tuple(list(c) for c in embedded)
        ok &= match
        print(f"    {fam!r}: {cols},"
              f"  # {'== embedded' if match else '!= EMBEDDED (MISMATCH)'}")
    print("}")

    print("\nRESULT:", "byte-identical to embedded pins" if ok
          else "MISMATCH — inspect before repinning")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
