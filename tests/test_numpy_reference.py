"""Engine-independent numpy/pure-Python reference checks for the 5
regression-pinned keys (dedup_simhash + the four ANN recall keys).

The driver oracle for these keys pins previously-measured rows — a
regression pin is blind to a bug present AT pin time. These tests close
that gap: every quantity is recomputed from the parquet fixture with
numpy / pure Python (no Spark expressions, no DuckDB), and the Spark
output is asserted EQUAL, not just bounded. The shared mirror lives in
tests/ann_reference.py (also used by scripts/pin_independent_oracles.py
to regenerate the pins without Spark).

- SimHash: a from-scratch xxHash64 (public spec, seed 42 — verified
  token-for-token against F.xxhash64), fingerprints re-derived from raw
  text, then ALL-PAIRS hamming — which also proves the Manku block-
  permutation candidate generation is exact-recall, since the Spark side
  only ever emits pairs its 20 pigeonhole tables surfaced.
- ANN recall: exact top-k ground truth re-derived with numpy float64
  cosines (round 6, vec_id tie-break — brute_force_topk's contract, the
  engine's balanced-tree summation replayed exactly), then the
  score-threshold recall of each family's Spark ANN rows is recomputed
  numpy-side from the retrieved (query_id, neighbor_id) ids alone —
  Spark's cosine column is deliberately NOT trusted.
- Pin independence (r6): the _ANN_PINS / _SIMHASH_PINS constants the
  driver oracles embed are re-derived END TO END — hyperplanes, seeds,
  Lloyd passes, ADC, re-rank, recall — by the Spark-free mirror and
  asserted byte-identical, on BOTH driver fixtures.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from ann_reference import (
    exact_thresholds,
    round6 as _round6,
    signed64 as _signed64,
    simhash_fp as _simhash_fp,
    tree_cosine as _tree_cosine,
    xxh64,
)


def test_xxh64_matches_spark(spark):
    from pyspark.sql import functions as F

    toks = ["hello", "a", "", "é-ü", "x" * 31, "y" * 32, "z" * 45,
            "the quick brown fox jumps over the lazy dog"]
    got = {r.t: r.h for r in spark.createDataFrame(
        [(t,) for t in toks], "t string")
        .select("t", F.xxhash64("t").alias("h")).collect()}
    for t in toks:
        assert _signed64(xxh64(t.encode("utf-8"))) == got[t], t


# --- SimHash reference ------------------------------------------------------



def test_simhash_pairs_match_numpy_reference(spark, sf_dir):
    """Spark simhash_dedup == all-pairs numpy hamming over re-derived
    fingerprints. Equality both ways: no false pairs AND no pair missed
    by the block-permutation candidate tables."""
    from database_syncer_spark.catalog import load_table
    from database_syncer_spark.pipeline.dedup import simhash_dedup

    docs = load_table(spark, sf_dir, "documents")
    got = {(r.doc_a, r.doc_b): r.hamming
           for r in simhash_dedup(docs).collect()}

    pdf = docs.select("doc_id", "text").toPandas()
    fps = {int(r.doc_id): _simhash_fp(r.text) for r in pdf.itertuples()}
    ids = sorted(fps)
    want = {}
    for ai in range(len(ids)):
        fa = fps[ids[ai]]
        for bi in range(ai + 1, len(ids)):
            ham = (fa ^ fps[ids[bi]]).bit_count()
            if ham <= 3:
                want[(ids[ai], ids[bi])] = ham
    assert got == want
    assert len(want) > 0  # the fixture must actually exercise the op


# --- ANN recall reference ---------------------------------------------------


@pytest.fixture(scope="module")
def _emb_numpy(spark, sf_dir):
    from database_syncer_spark.catalog import load_table
    from database_syncer_spark.queries.pipeline import _emb_dim

    emb = load_table(spark, sf_dir, "embeddings")
    dim = _emb_dim(sf_dir, emb)
    pdf = emb.select("vec_id", "embedding").toPandas()
    ids = pdf["vec_id"].to_numpy(dtype=np.int64)
    mat = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
    order = np.argsort(ids)
    return ids[order], mat[order], dim






_ANN_FAMILIES = ["lsh", "ivf", "pq", "ivfpq"]


@pytest.mark.parametrize("family", _ANN_FAMILIES)
def test_ann_recall_matches_numpy_reference(spark, sf_dir, _emb_numpy,
                                            family):
    """The sim_*_ann recall rows == numpy recomputation: hits counted
    with numpy cosines of the Spark-retrieved neighbor ids against the
    numpy exact threshold (score-threshold recall@k, the ann_recall
    contract). Only the retrieved (query_id, neighbor_id) pairs are
    taken from Spark — every score is independently re-derived."""
    from database_syncer_spark.catalog import load_table
    from database_syncer_spark.pipeline import similarity as S
    from database_syncer_spark.queries.pipeline import _emb_dim

    ids, mat, dim = _emb_numpy
    emb = load_table(spark, sf_dir, "embeddings")
    topk = {"lsh": S.lsh_ann_topk, "ivf": S.ivf_ann_topk,
            "pq": S.pq_ann_topk, "ivfpq": S.ivfpq_ann_topk}[family]
    ann = topk(emb, dim=dim)
    retrieved: dict[int, list[int]] = {}
    for r in ann.select("query_id", "neighbor_id").collect():
        retrieved.setdefault(int(r.query_id), []).append(int(r.neighbor_id))

    got = {int(r.query_id): (int(r.k), int(r.n_hits), float(r.recall))
           for r in S.ann_recall(emb, ann, dim=dim).collect()}

    k = 10
    thr = exact_thresholds(ids, mat, n_queries=10, k=k)
    pos = {int(v): i for i, v in enumerate(ids)}
    want = {}
    for qid, t in thr.items():
        hits = 0
        for nb in retrieved.get(qid, []):
            cos = _round6(_tree_cosine(mat[pos[nb]], mat[pos[qid]]))
            if cos >= t:
                hits += 1
        want[qid] = (k, hits, hits / float(k))
    assert got == want
    assert set(got) == set(thr)  # one row per query, none vanished


# --- pin independence (r6) ---------------------------------------------------


def test_xxh64_long_matches_spark(spark):
    """Seed selection (orderBy(xxhash64(vec_id))) replays Spark's
    xxhash64 on LONGS — verify the 8-byte-LE pure-Python form against
    the engine for negatives, boundaries, and the fixture id range."""
    import ann_reference as AR
    from pyspark.sql import functions as F

    vals = [0, 1, -1, 42, 499, 2**31, -(2**31), 2**63 - 1, -(2**63)]
    got = {r.v: r.h for r in spark.createDataFrame(
        [(v,) for v in vals], "v long")
        .select("v", F.xxhash64("v").alias("h")).collect()}
    for v in vals:
        assert AR.xxh64_long(v) == got[v], v


@pytest.mark.parametrize("sf_name_pin", ["sf0.001", "sf0.01"])
def test_ann_pins_match_independent_retrieval(sf_name_pin):
    """The _ANN_PINS constants the driver oracles embed == a Spark-free
    end-to-end re-derivation (seeds, Lloyd, hyperplanes/ADC retrieval,
    exact re-rank, recall) on BOTH driver fixtures. This closes the
    pin-time-bug hole: a defect in the engine's retrieval would have to
    be reproduced independently by this mirror to stay hidden."""
    import ann_reference as AR
    from conftest import sf_path
    from database_syncer_spark.queries.pipeline import _ANN_PINS

    sf_dir_pin = sf_path(sf_name_pin)
    ids, mat = AR.load_embeddings(sf_dir_pin)
    col = {-33.0: 0, 1.0: 1}[AR.embeddings_fingerprint(mat)]
    derived = AR.derive_ann_pins(sf_dir_pin)
    for fam, (h001, h01) in _ANN_PINS.items():
        assert derived[fam] == (h001, h01)[col], fam


@pytest.mark.parametrize("sf_name_pin", ["sf0.001", "sf0.01"])
def test_simhash_pins_match_independent_derivation(sf_name_pin):
    """_SIMHASH_PINS == pure-Python xxHash64 → fingerprints → all-pairs
    hamming, keyed by the oracle's own corpus fingerprint."""
    import ann_reference as AR
    from conftest import sf_path
    from database_syncer_spark.queries.pipeline import _SIMHASH_PINS

    docs, fp = AR.load_documents(sf_path(sf_name_pin))
    assert fp in _SIMHASH_PINS, fp
    assert AR.simhash_pairs(docs) == sorted(_SIMHASH_PINS[fp])


@pytest.mark.parametrize("sf_name_pin", ["sf0.001", "sf0.01"])
def test_minhash_lsh_pairs_match_independent_mirror(spark, sf_name_pin):
    """Spark minhash_lsh_dedup == the Spark-free mirror END TO END —
    shingling, the 16 chained-xxhash64 minhash families, 4-band
    bucketing, AND the exact-Jaccard verify, on BOTH driver fixtures.
    Independently confirms the oracle's 'LSH recall is total on the
    fixture' premise (the one part of dedup_minhash_lsh's exact-SQL
    oracle the engine itself asserts): a banding/signature bug now has
    to be reproduced by this pure-Python reimplementation to stay
    hidden."""
    import ann_reference as AR
    from conftest import sf_path
    from database_syncer_spark.catalog import load_table
    from database_syncer_spark.pipeline.dedup import minhash_lsh_dedup

    docs = load_table(spark, sf_path(sf_name_pin), "documents")
    got = sorted((int(r.doc_a), int(r.doc_b), float(r.jaccard))
                 for r in minhash_lsh_dedup(docs).collect())
    pdf = docs.select("doc_id", "text").toPandas()
    want = AR.minhash_lsh_pairs(list(zip(pdf["doc_id"], pdf["text"])))
    assert got == want
    assert len(want) > 0
