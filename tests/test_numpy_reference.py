"""Engine-independent numpy/pure-Python reference checks for the 5
regression-pinned keys (dedup_simhash + the four ANN recall keys).

The driver oracle for these keys pins previously-measured rows — a
regression pin is blind to a bug present AT pin time. These tests close
that gap: every quantity is recomputed from the parquet fixture with
numpy / pure Python (no Spark expressions, no DuckDB), and the Spark
output is asserted EQUAL, not just bounded.

- SimHash: a from-scratch xxHash64 (public spec, seed 42 — verified
  token-for-token against F.xxhash64), fingerprints re-derived from raw
  text, then ALL-PAIRS hamming — which also proves the Manku block-
  permutation candidate generation is exact-recall, since the Spark side
  only ever emits pairs its 20 pigeonhole tables surfaced.
- ANN recall: exact top-k ground truth re-derived with numpy float64
  cosines (round 6, vec_id tie-break — brute_force_topk's contract),
  then the score-threshold recall of each family's Spark ANN rows is
  recomputed numpy-side from the retrieved (query_id, neighbor_id) ids
  alone — Spark's cosine column is deliberately NOT trusted.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

# --- pure-Python xxHash64 (public xxHash spec; Spark's XxHash64 applies
# it to the UTF-8 bytes with seed 42) ---------------------------------------

_M = (1 << 64) - 1
_P1 = 0x9E3779B185EBCA87
_P2 = 0xC2B2AE3D27D4EB4F
_P3 = 0x165667B19E3779F9
_P4 = 0x85EBCA77C2B2AE63
_P5 = 0x27D4EB2F165667C5


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M


def xxh64(data: bytes, seed: int = 42) -> int:
    n = len(data)
    i = 0
    if n >= 32:
        v = [(seed + _P1 + _P2) & _M, (seed + _P2) & _M,
             seed & _M, (seed - _P1) & _M]
        while i + 32 <= n:
            for j in range(4):
                lane = int.from_bytes(data[i + 8 * j:i + 8 * j + 8], "little")
                vj = (v[j] + lane * _P2) & _M
                v[j] = (_rotl(vj, 31) * _P1) & _M
            i += 32
        h = (_rotl(v[0], 1) + _rotl(v[1], 7)
             + _rotl(v[2], 12) + _rotl(v[3], 18)) & _M
        for vj in v:
            vj = (_rotl((vj * _P2) & _M, 31) * _P1) & _M
            h = ((h ^ vj) * _P1 + _P4) & _M
    else:
        h = (seed + _P5) & _M
    h = (h + n) & _M
    while i + 8 <= n:
        lane = int.from_bytes(data[i:i + 8], "little")
        lane = (_rotl((lane * _P2) & _M, 31) * _P1) & _M
        h = (_rotl(h ^ lane, 27) * _P1 + _P4) & _M
        i += 8
    if i + 4 <= n:
        lane = int.from_bytes(data[i:i + 4], "little")
        h = (_rotl(h ^ ((lane * _P1) & _M), 23) * _P2 + _P3) & _M
        i += 4
    while i < n:
        h = (_rotl(h ^ ((data[i] * _P5) & _M), 11) * _P1) & _M
        i += 1
    h ^= h >> 33
    h = (h * _P2) & _M
    h ^= h >> 29
    h = (h * _P3) & _M
    h ^= h >> 32
    return h


def _signed64(x: int) -> int:
    return x - (1 << 64) if x >= (1 << 63) else x


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


def _simhash_fp(text: str) -> int:
    """64-bit SimHash exactly as pipeline/dedup.py builds it: split on
    single spaces, drop empties, xxhash64 each token (duplicates count),
    bit b set iff the ±1 bit-b contributions sum positive."""
    counts = np.zeros(64, dtype=np.int64)
    n_tok = 0
    for tok in text.split(" "):
        if tok == "":
            continue
        n_tok += 1
        h = xxh64(tok.encode("utf-8"))
        for b in range(64):
            counts[b] += 1 if (h >> b) & 1 else -1
    if n_tok == 0:
        return 0
    return sum(1 << b for b in range(64) if counts[b] > 0)


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


def _round6(x: float) -> float:
    """HALF_UP round to 6 dp, matching Spark's F.round exactly: Spark
    routes doubles through java BigDecimal.valueOf (shortest decimal
    repr — same contract as Python repr) + setScale(6, HALF_UP).
    np.round would be banker's-rounding on the binary double — it
    agrees except within an ulp of a .5e-6 boundary, where the two
    modes diverge and equality asserts would false-alarm."""
    from decimal import ROUND_HALF_UP, Decimal

    return float(Decimal(repr(float(x))).quantize(
        Decimal("0.000001"), rounding=ROUND_HALF_UP))


def _numpy_exact_threshold(ids, mat, n_queries=10, k=10):
    """Per query: the k-th exact cosine at round-6 (brute_force_topk's
    ranking contract: round(cos, 6) desc, vec_id asc, self excluded)."""
    nrm = np.linalg.norm(mat, axis=1)
    thr = {}
    for qpos in np.flatnonzero(ids < n_queries):
        qid = int(ids[qpos])
        raw = mat @ mat[qpos] / (nrm * nrm[qpos])
        cos = np.array([_round6(v) for v in raw])
        mask = ids != qid
        cand_ids, cand_cos = ids[mask], cos[mask]
        order = np.lexsort((cand_ids, -cand_cos))
        thr[qid] = float(cand_cos[order[k - 1]])
    return thr


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
    thr = _numpy_exact_threshold(ids, mat, n_queries=10, k=k)
    pos = {int(v): i for i, v in enumerate(ids)}
    nrm = np.linalg.norm(mat, axis=1)
    want = {}
    for qid, t in thr.items():
        hits = 0
        for nb in retrieved.get(qid, []):
            cos = _round6(
                mat[pos[nb]] @ mat[pos[qid]] / (nrm[pos[nb]] * nrm[pos[qid]]))
            if cos >= t:
                hits += 1
        want[qid] = (k, hits, hits / float(k))
    assert got == want
    assert set(got) == set(thr)  # one row per query, none vanished
