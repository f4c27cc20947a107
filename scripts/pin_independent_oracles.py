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

_ROOT = os.environ.get("TESTDATA_ROOT", "/root/testdata")
FIXTURES = [os.path.join(_ROOT, "sf0.001"), os.path.join(_ROOT, "sf0.01")]


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

    print("\n# --- dedup_minhash_lsh oracle premise (numpy-derived) ---")
    # The key's oracle is exact SQL, valid because LSH recall is TOTAL on
    # the fixtures; re-derive that premise without Spark: the mirror's
    # banded-LSH pair set must equal the exact all-pairs τ-threshold set.
    for sf_dir in FIXTURES:
        docs, _ = AR.load_documents(sf_dir)
        lsh = {(a, b) for a, b, _j in AR.minhash_lsh_pairs(docs)}
        sets = {}
        for d, t in docs:
            sets.setdefault(int(d), set()).update(AR.doc_shingles(t))
        ids = sorted(sets)
        exact = set()
        for i, a in enumerate(ids):
            for b in ids[i + 1:]:
                inter = len(sets[a] & sets[b])
                if AR.round6(inter / len(sets[a] | sets[b])) >= 0.5:
                    exact.add((a, b))
        total = lsh == exact
        ok &= total
        print(f"    {os.path.basename(sf_dir)}: lsh={len(lsh)} "
              f"exact={len(exact)} "
              f"{'RECALL TOTAL' if total else 'RECALL MISS (oracle premise broken)'}")

    print("\nRESULT:", "byte-identical to embedded pins" if ok
          else "MISMATCH — inspect before repinning")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
