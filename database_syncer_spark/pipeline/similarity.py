"""Similarity search over embedding columns (SURVEY.md §2 B11
sim_topk_cosine / sim_lsh_ann; PAPERS.md top-k similarity corpus).

Two paths:

- brute_force_topk: exact cosine top-k. The query set broadcasts; the
  corpus streams through one codegen'd pass (unrolled dot product,
  pipeline/vector.py) and a per-query top-k window. Correct at any scale
  but O(Q×N) — the baseline and the verifier for the approximate path.
- lsh_ann_topk: random-hyperplane LSH. Deterministic hyperplanes (hash-
  seeded, no RNG), bucket ids for corpus and queries, candidates = same
  bucket in ANY of T tables, exact re-rank of candidates only. At 100 TB
  the bucket id is also the partitioning key, so a query touches one
  partition per table instead of the full corpus.
- ivf_ann_topk: inverted-file (IVF) partitioning. Deterministic seed
  centroids + one Lloyd refinement (all JVM-side: assignment is an argmax
  over C dot-product expressions, the per-cell mean is one groupBy with
  per-dimension F.sum — no explode, no Python). Queries probe their
  n_probe nearest cells; candidates = corpus rows in those cells; exact
  re-rank. At 100 TB the cell id is the storage partitioning key
  (write .partitionBy("cell")), so a probe reads n_probe/n_cells of the
  corpus instead of all of it. Centroid state is C×dim floats — driver-
  side model state, broadcast to executors (same shape as MLlib KMeans).
"""

from __future__ import annotations

import hashlib
import struct

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F

from database_syncer_spark.pipeline import vector as V


def brute_force_topk(embeddings: DataFrame, n_queries: int = 10,
                     k: int = 10, dim: int = 64) -> DataFrame:
    """Exact top-k cosine neighbors for the first ``n_queries`` vectors.

    Rank on round(cosine, 6) with vec_id tie-break so ordering is stable
    across engines and shuffle orders. The dot/norm expressions are
    unrolled over ``dim`` (pipeline/vector.py) so the whole scan stays in
    one whole-stage-codegen span.

    Callers should pass ``dim=multimodal.check_dim(df)`` rather than
    hardcode: non-ANSI GetArrayItem past the end returns NULL silently,
    so a wrong or ragged dim would otherwise produce NULL norms and
    quietly drop rows from every top-k. Validation deliberately lives in
    check_dim (one size-only aggregate), NOT as a per-row assert in this
    projection — an assert_true here measured +25% by dragging the scan
    out of whole-stage codegen."""
    e = embeddings.select(
        "vec_id", "embedding", V.norm("embedding", dim).alias("nrm"))
    q = (e.where(F.col("vec_id") < n_queries)
         .select(F.col("vec_id").alias("query_id"),
                 F.col("embedding").alias("q_emb"),
                 F.col("nrm").alias("q_nrm")))
    pairs = F.broadcast(q).crossJoin(e).where(F.col("vec_id") != F.col("query_id"))
    cos = F.round(V.dot("q_emb", "embedding", dim) / (F.col("q_nrm") * F.col("nrm")), 6)
    w = W.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id"))
    return (
        pairs.select("query_id", F.col("vec_id").alias("neighbor_id"),
                     cos.alias("cosine"))
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
    )


def ann_recall(embeddings: DataFrame, ann: DataFrame, n_queries: int = 10,
               k: int = 10, dim: int = 64) -> DataFrame:
    """Score-threshold recall@k of an ANN result against the exact top-k.

    A retrieved neighbor counts as a hit when its round(cosine, 6) is >=
    the query's k-th exact cosine — the tie-tolerant recall definition
    standard in ANN benchmarking (either member of a tie at rank k is a
    correct answer). Ground truth is the brute-force sibling
    (brute_force_topk) computed in the same job: recall verification
    REQUIRES exact truth by definition, so this key is O(Q×N) on the
    exact side — a verification artifact, not the serving path.

    Output (query_id, k, n_hits, recall) is deterministic: the ANN
    algorithms are seed-free (md5 hyperplanes / xxhash64 seed picks) and
    the fixture is fixed, so the driver can value-hash these rows against
    pinned measured values (engine-independent recomputation of LSH/IVF/PQ
    internals in SQL isn't feasible; quality bounds are asserted in
    tests/test_pipeline.py)."""
    exact = brute_force_topk(embeddings, n_queries=n_queries, k=k, dim=dim)
    thr = exact.groupBy("query_id").agg(F.min("cosine").alias("__thr"))
    # ONE consumption of the exact side (r12): LEFT-join the ANN rows
    # onto the thresholds and count hits inside the same aggregation.
    # The previous shape referenced ``thr`` twice (inner hits join +
    # left join back from the query set, so zero-retrieval queries
    # report recall 0 instead of vanishing) and Catalyst planned the
    # whole O(Q×N) brute-force subtree TWICE — the before-plan of every
    # sim_*_ann key shows two BroadcastNestedLoopJoin Cross + Window
    # chains (plans/r12/sim_lsh_ann_before.txt). The left join from thr
    # keeps the zero-retrieval guarantee: such queries yield one
    # NULL-cosine row, when() scores it 0, and the sum is never NULL.
    n_hits = (F.sum(F.when(F.col("cosine") >= F.col("__thr"), 1)
                    .otherwise(0)).cast("int"))
    return (
        thr.join(ann.select("query_id", "cosine"), "query_id", "left")
        .groupBy("query_id")
        .agg(n_hits.alias("n_hits"))
        .select("query_id", F.lit(k).alias("k"), "n_hits",
                (F.col("n_hits") / F.lit(float(k))).alias("recall"))
    )


def _hyperplanes(n_planes: int, dim: int, table: int) -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes from md5 — no RNG state,
    same planes on every executor and every run."""
    planes = []
    for p in range(n_planes):
        row = []
        for d in range(dim):
            h = hashlib.md5(f"dss-lsh:{table}:{p}:{d}".encode()).digest()
            (u,) = struct.unpack("<Q", h[:8])
            row.append((u / 2**63) - 1.0)  # uniform [-1, 1)
        planes.append(row)
    return planes


def _bucket_expr(planes: list[list[float]]):
    """Bucket id = sign bits of the plane projections (constant-folded,
    codegen'd dot products — no array literals, no lambdas)."""
    bucket = F.lit(0)
    for p, row in enumerate(planes):
        proj = V.dot_lit("embedding", row)
        bucket = bucket + F.when(proj > 0, F.lit(1 << p)).otherwise(F.lit(0))
    return bucket


def build_lsh_index(embeddings: DataFrame, n_planes: int = 4,
                    n_tables: int = 2, dim: int = 64) -> dict:
    """The at-rest LSH layout: the corpus with per-table bucket ids —
    what a 100-TB deployment precomputes once and stores partitioned by
    (tbl, bucket). Pass the result as ``index=`` to :func:`lsh_ann_topk`
    to time/serve queries without re-bucketing the corpus per call
    (persist it first to actually pin the at-rest state)."""
    e = embeddings.select("vec_id", "embedding",
                          V.norm("embedding", dim).alias("nrm"))
    per_table = []
    for t in range(n_tables):
        bucket = _bucket_expr(_hyperplanes(n_planes, dim, t))
        per_table.append(
            e.select("vec_id", "embedding", "nrm",
                     F.lit(t).alias("tbl"), bucket.alias("bucket")))
    bucketed = per_table[0]
    for p in per_table[1:]:
        bucketed = bucketed.unionByName(p)
    # carry the build params: serving must bucket queries with the SAME
    # planes the corpus was bucketed with, whatever the caller passes
    return {"bucketed": bucketed, "n_planes": n_planes,
            "n_tables": n_tables, "dim": dim}


def lsh_ann_topk(embeddings: DataFrame, n_queries: int = 10, k: int = 10,
                 n_planes: int = 4, n_tables: int = 2,
                 dim: int = 64, index: dict | None = None) -> DataFrame:
    """Approximate top-k: union of per-table bucket matches, exact re-rank.

    Returns the same schema as brute_force_topk (rank within retrieved
    candidates); tests measure recall against the exact path. ``index``:
    a prebuilt :func:`build_lsh_index` result (train-once/serve-many);
    built inline when absent — results are identical either way (the
    build is deterministic), pinned by test."""
    if index is None:
        index = build_lsh_index(embeddings, n_planes=n_planes,
                                n_tables=n_tables, dim=dim)
    bucketed = index["bucketed"]
    # serve with the params the index was BUILT with (query buckets must
    # come from the same hyperplanes as the corpus buckets)
    n_planes = index.get("n_planes", n_planes)
    n_tables = index.get("n_tables", n_tables)
    dim = index.get("dim", dim)

    # Queries come from the EMBEDDINGS argument (bucket just the Q query
    # rows — O(Q), not a corpus pass), matching pq/ivf/ivfpq: with a
    # prebuilt index, drawing queries from index["bucketed"] would
    # silently serve the wrong query set whenever the caller passes a
    # different embeddings frame (r4 review).
    # Per-table select + union, the same shape as the corpus side in
    # build_lsh_index — NOT one explode(array(struct(bucket_0, bucket_1,
    # ...))): that Generate inlines every table's n_planes×dim unrolled
    # dot products into a single generate_doConsume method, which blows
    # Janino's 64 KB method limit and silently drops the whole stage to
    # interpreted execution (the r5 bench's 8 "ERROR CodeGenerator:
    # Failed to compile" lines — root cause "Code grows beyond 64 KB",
    # pinned by tests/test_plans.py's codegen-fallback canary). The
    # union scans the FILTERED query rows n_tables times — O(Q·T), never
    # a corpus pass — and each branch's projection stays well inside one
    # codegen unit.
    q_base = (embeddings.where(F.col("vec_id") < n_queries)
              .select(F.col("vec_id").alias("query_id"),
                      F.col("embedding"),
                      V.norm("embedding", dim).alias("q_nrm")))
    per_table_q = []
    for t in range(n_tables):
        bucket = _bucket_expr(_hyperplanes(n_planes, dim, t))
        per_table_q.append(
            q_base.select("query_id", "embedding", "q_nrm",
                          F.lit(t).alias("tbl"), bucket.alias("bucket")))
    q = per_table_q[0]
    for p in per_table_q[1:]:
        q = q.unionByName(p)
    q = q.withColumnRenamed("embedding", "q_emb")
    cos = F.round(V.dot("q_emb", "embedding", dim) / (F.col("q_nrm") * F.col("nrm")), 6)
    cand = (
        # Q·n_tables rows vs the corpus: broadcast the query side so the
        # bucketed corpus is never shuffled (at rest it's partitioned by
        # (tbl, bucket); the broadcast probe preserves that layout).
        # Cosine is computed BEFORE the multi-table dedup so the dedup
        # Exchange carries three scalars per row, never the embedding
        # arrays (duplicate pairs score identically, so which survives
        # is value-irrelevant).
        F.broadcast(q).join(bucketed, ["tbl", "bucket"])
        .where(F.col("vec_id") != F.col("query_id"))
        .select("query_id", F.col("vec_id").alias("neighbor_id"),
                cos.alias("cosine"))
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    w = W.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id"))
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
    )


def train_pq_codebooks(embeddings: DataFrame, m: int = 8, dim: int = 64,
                       k_sub: int = 16,
                       lloyd_iters: int = 1) -> list[list[list[float]]]:
    """Product-quantization codebooks: ``m`` subspaces of dim/m dims,
    ``k_sub`` centroids each. Deterministic like IVF: seeds are the
    k_sub corpus vectors with smallest xxhash64(vec_id), sliced per
    subspace; each Lloyd pass assigns every vector's m subvectors to
    their nearest sub-centroid (one Arrow map pass) and re-averages
    (ONE groupBy over the exploded (subspace, code) pairs — 2·m·k_sub
    rows of dim/m sums cross the wire, corpus-size-independent).

    Everything PQ-side — seeds, assignment, re-average, the ADC LUT —
    operates in L2-NORMALIZED space (cosine setting), so the Lloyd sums
    divide each row by its norm; averaging raw vectors would put the
    centroids at the corpus's magnitude scale while assignment and
    scoring expect unit scale (caught in review before it shipped)."""
    import numpy as np

    if dim % m:
        raise ValueError(f"dim={dim} not divisible by m={m}")
    d_sub = dim // m
    seeds = (embeddings
             .orderBy(F.xxhash64("vec_id"), "vec_id")
             .limit(k_sub)
             .select("embedding")
             .collect())
    base = np.stack([_normalize([float(v) for v in r.embedding])
                     for r in seeds])           # k_sub × dim
    books = [base[:, s * d_sub:(s + 1) * d_sub].copy() for s in range(m)]
    for _ in range(lloyd_iters):
        coded = _with_pq_codes(
            embeddings.select("embedding"), books, m, dim)
        nrm = V.norm("embedding", dim)
        pairs = coded.select(
            "embedding", nrm.alias("__nrm"),
            F.posexplode("pq_codes").alias("sub", "code"))
        aggs = [F.sum((F.col("embedding")[F.col("sub") * d_sub + i]
                       / F.col("__nrm")).cast("double")).alias(f"s{i}")
                for i in range(d_sub)]
        sums = (pairs.where(F.col("__nrm") > 0)
                .groupBy("sub", "code")
                .agg(F.count("*").alias("n"), *aggs)
                .collect())
        for r in sums:
            # 9-dp rounding for partition-independent model state (same
            # rationale as train_ivf_centroids).
            books[r.sub][r.code] = np.round(np.asarray(
                [r[f"s{i}"] / r.n for i in range(d_sub)]), 9)
    return [b.tolist() for b in books]


def _with_pq_codes(df: DataFrame, books: list, m: int, dim: int,
                   emb_col: str = "embedding") -> DataFrame:
    """Append ``pq_codes``: per subspace, the nearest sub-centroid id
    (L2), via one Arrow-batched numpy pass (same Janino rationale as
    `_with_probe_cells`; m argmins over (B×d_sub)@(d_sub×k) products)."""
    import numpy as np
    import pandas as pd

    from pyspark.sql import types as T

    d_sub = dim // m
    bmats = [np.asarray(b, dtype=np.float64) for b in books]  # k × d_sub
    bnorm = [0.5 * (b * b).sum(axis=1) for b in bmats]
    out_schema = T.StructType(
        list(df.schema.fields)
        + [T.StructField("pq_codes", T.ArrayType(T.IntegerType()))])

    def assign(batches):
        for pdf in batches:
            if len(pdf):
                full = np.stack(pdf[emb_col].to_numpy()).astype(np.float64)
                nrm = np.linalg.norm(full, axis=1, keepdims=True)
                full = full / np.where(nrm == 0, 1.0, nrm)
                codes = np.empty((len(pdf), m), dtype=np.int32)
                for s in range(m):
                    sub = full[:, s * d_sub:(s + 1) * d_sub]
                    # argmin ||x-c||² == argmax (x·c − ½||c||²); 9-dp
                    # round for batch-shape-independent assignment (see
                    # _with_probe_cells).
                    codes[:, s] = np.argmax(
                        np.round(sub @ bmats[s].T - bnorm[s], 9), axis=1)
                pdf = pdf.assign(pq_codes=[row for row in codes])
            else:
                pdf = pdf.assign(pq_codes=pd.Series([], dtype=object))
            yield pdf

    return df.mapInPandas(assign, out_schema)


def _topk_cols_deterministic(approx, vids, keep):
    """Per-row top-`keep` column indices ordered by (adc desc, vec_id
    asc). Plain argpartition resolves ties in the 9-dp-rounded score at
    the keep boundary arbitrarily, so which tied candidate survives
    could vary with Arrow batch composition and flip a pinned recall
    row on a different host/batch size. Keeps the O(nb) argpartition as
    a prefilter, then lexsorts only the >=boundary superset (all
    boundary ties included), so the deterministic pass is ~keep-sized.
    Rows (queries) are few; the loop is driver-free executor numpy."""
    import numpy as np

    nq = approx.shape[0]
    out = np.empty((nq, keep), dtype=np.int64)
    for i in range(nq):
        a = approx[i]
        part = np.argpartition(-a, keep - 1)[:keep]
        cand = np.flatnonzero(a >= a[part].min())
        order = np.lexsort((vids[cand], -a[cand]))
        out[i] = cand[order[:keep]]
    return out


def build_pq_index(embeddings: DataFrame, m: int = 8, dim: int = 64,
                   k_sub: int = 16) -> dict:
    """The at-rest PQ artifact: trained codebooks (model state,
    m×k_sub×(dim/m) floats) + the coded corpus (m uint8 codes per row —
    the 32× compression that IS the point of PQ). A deployment builds
    this once per corpus version; pass as ``index=`` to
    :func:`pq_ann_topk` to serve without retraining/recoding."""
    if dim % m:
        raise ValueError(f"dim={dim} not divisible by m={m}")
    books = train_pq_codebooks(embeddings, m=m, dim=dim, k_sub=k_sub)
    coded = _with_pq_codes(
        embeddings.select("vec_id", "embedding"), books, m, dim
    ).select("vec_id", "pq_codes")
    return {"books": books, "coded": coded}


def pq_ann_topk(embeddings: DataFrame, n_queries: int = 10, k: int = 10,
                m: int = 8, dim: int = 64, k_sub: int = 16,
                refine: int = 8, index: dict | None = None) -> DataFrame:
    """Approximate top-k via product quantization + asymmetric distance
    (ADC): corpus vectors live as m uint8 codes (8 bytes vs 256 — the
    32× memory compression that fits a 100-TB embedding corpus in a
    cluster's RAM), each query builds an m×k_sub lookup table of
    subspace dot products, and the scan scores a row with m table
    lookups instead of dim multiplies. The top refine·k candidates by
    ADC score are re-ranked exactly against the full vectors; output
    schema matches brute_force_topk.

    Unlike IVF (which prunes WHICH rows are read), PQ compresses WHAT
    is read — at scale the two compose (IVF-PQ: probe cells, scan
    codes, re-rank survivors). The codes scan is one map pass over the
    code table, and the scorer keeps only each BATCH's top refine·k per
    query (argpartition), so the window that selects global candidates
    shuffles ~refine·k·Q·n_batches rows, never the Q×N cross product;
    the exact re-rank then joins refine·k·Q rows back to the full
    vectors by vec_id."""
    import numpy as np
    import pandas as pd

    if index is None:
        index = build_pq_index(embeddings, m=m, dim=dim, k_sub=k_sub)
    books, coded = index["books"], index["coded"]

    d_sub = dim // m
    qrows = (embeddings.where(F.col("vec_id") < n_queries)
             .select("vec_id", "embedding").collect())
    qids = [int(r.vec_id) for r in qrows]
    qmat = np.stack([_normalize([float(v) for v in r.embedding])
                     for r in qrows])            # Q × dim
    # LUT[q, s, j] = dot(q_s, c_sj) — Q·m·k_sub floats, broadcast state
    lut = np.stack([
        qmat[:, s * d_sub:(s + 1) * d_sub]
        @ np.asarray(books[s], dtype=np.float64).T
        for s in range(m)], axis=1)              # Q × m × k_sub

    from pyspark.sql import types as T
    out_schema = T.StructType([
        T.StructField("query_id", T.LongType()),
        T.StructField("vec_id", T.LongType()),
        T.StructField("adc", T.DoubleType()),
    ])

    keep = refine * k
    qarr = np.asarray(qids)

    def score(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            codes = np.stack(pdf["pq_codes"].to_numpy())    # B × m
            # approx[q, b] = Σ_s LUT[q, s, codes[b, s]]; 9-dp round so
            # the refine·k candidate boundary is partition-independent.
            approx = np.round(
                lut[:, np.arange(m)[None, :], codes].sum(axis=2), 9)
            # Mask each query's own vector BEFORE the argpartition prune:
            # filtering it afterwards would let it occupy a top-refine·k
            # slot and silently drop the true refine·k-th candidate.
            approx[np.equal.outer(qarr, pdf["vec_id"].to_numpy())] = -np.inf
            nq, nb = approx.shape
            vids = pdf["vec_id"].to_numpy()
            if nb > keep:
                # per-batch top refine·k per query: the global top-k is
                # a subset of every batch's top-k, so pruning here is
                # lossless and keeps the downstream shuffle
                # batch-count-proportional instead of corpus-sized.
                # Boundary ties break on vec_id (batch-composition-
                # independent), not argpartition order.
                idx = _topk_cols_deterministic(approx, vids, keep)
                yield pd.DataFrame({
                    "query_id": np.repeat(qarr, keep),
                    "vec_id": vids[idx].reshape(-1),
                    "adc": np.take_along_axis(approx, idx, axis=1).reshape(-1),
                })
            else:
                yield pd.DataFrame({
                    "query_id": np.repeat(qarr, nb),
                    "vec_id": np.tile(vids, nq),
                    "adc": approx.reshape(-1),
                })

    scored = coded.mapInPandas(score, out_schema).where(
        F.col("vec_id") != F.col("query_id"))
    return _exact_rerank(embeddings, scored, n_queries, k, refine, dim)


def _exact_rerank(embeddings: DataFrame, scored: DataFrame, n_queries: int,
                  k: int, refine: int, dim: int) -> DataFrame:
    """Shared ADC tail: global top refine·k by approximate score, then
    exact cosine re-rank against the full vectors (schema matches
    brute_force_topk)."""
    w_adc = W.partitionBy("query_id").orderBy(
        F.col("adc").desc(), F.col("vec_id"))
    cands = (scored.withColumn("__r", F.row_number().over(w_adc))
             .where(F.col("__r") <= refine * k)
             .select("query_id", "vec_id"))

    e = embeddings.select("vec_id", "embedding",
                          V.norm("embedding", dim).alias("nrm"))
    q = (embeddings.where(F.col("vec_id") < n_queries)
         .select(F.col("vec_id").alias("query_id"),
                 F.col("embedding").alias("q_emb"),
                 V.norm("embedding", dim).alias("q_nrm")))
    joined = cands.join(e, "vec_id").join(F.broadcast(q), "query_id")
    cos = F.round(
        V.dot("q_emb", "embedding", dim) / (F.col("q_nrm") * F.col("nrm")), 6)
    w = W.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id"))
    return (
        joined.select("query_id", F.col("vec_id").alias("neighbor_id"),
                      cos.alias("cosine"))
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
    )


def build_ivfpq_index(embeddings: DataFrame, n_cells: int = 16, m: int = 8,
                      dim: int = 64, k_sub: int = 16) -> dict:
    """The at-rest IVF-PQ artifact: IVF centroids + PQ codebooks (model
    state) and the corpus coded in ONE Arrow pass with (cell, pq_codes)
    — exactly what a 100-TB deployment stores ``partitionBy("cell")``.
    Pass as ``index=`` to :func:`ivfpq_ann_topk` to serve without
    retraining or re-coding."""
    if dim % m:
        raise ValueError(f"dim={dim} not divisible by m={m}")
    centroids = train_ivf_centroids(embeddings, n_cells=n_cells, dim=dim)
    books = train_pq_codebooks(embeddings, m=m, dim=dim, k_sub=k_sub)
    coded = _with_cell_and_codes(
        embeddings.select("vec_id", "embedding"), centroids, books, m, dim)
    return {"centroids": centroids, "books": books, "coded": coded}


def ivfpq_ann_topk(embeddings: DataFrame, n_queries: int = 10, k: int = 10,
                   n_cells: int = 16, n_probe: int = 4, m: int = 8,
                   dim: int = 64, k_sub: int = 16,
                   refine: int = 8, index: dict | None = None) -> DataFrame:
    """IVF-PQ: the composed 100-TB serving shape — IVF prunes WHICH rows
    are scanned (each query touches n_probe/n_cells of the corpus; at
    rest the code table partitions by cell so the pruning happens at the
    parquet scan), PQ compresses WHAT is scanned (m uint8 codes per row,
    ADC lookups instead of dim multiplies), and the survivors re-rank
    exactly against the full vectors. Reuses the IVF trainer/assigner
    and the PQ codebooks/ADC scorer of the standalone paths; the only
    new piece is the per-query cell mask inside the scan.

    Model state: C×dim centroids + m×k_sub×(dim/m) codebooks + the Q×C
    probe mask — all driver/broadcast scale. Determinism: every
    assignment and score rounds to 9 dp like the parent paths, so the
    recall rows are partition-independent and driver-pinnable."""
    import numpy as np
    import pandas as pd

    if index is None:
        index = build_ivfpq_index(embeddings, n_cells=n_cells, m=m,
                                  dim=dim, k_sub=k_sub)
    centroids, books, coded = (
        index["centroids"], index["books"], index["coded"])

    d_sub = dim // m
    qrows = (embeddings.where(F.col("vec_id") < n_queries)
             .select("vec_id", "embedding").collect())
    qarr = np.asarray([int(r.vec_id) for r in qrows])
    qmat = np.stack([_normalize([float(v) for v in r.embedding])
                     for r in qrows])            # Q × dim
    # Per-query probed cells: same rounded-argmax math as
    # _with_probe_cells, driver-side (Q rows of model-state work).
    cmat = np.asarray(centroids, dtype=np.float64).T
    qdots = np.round(qmat @ cmat, 9)             # Q × C
    order = np.argsort(-qdots, axis=1, kind="stable")[:, :n_probe]
    probe_ok = np.zeros((len(qarr), len(centroids)), dtype=bool)
    np.put_along_axis(probe_ok, order, True, axis=1)  # Q × C mask
    lut = np.stack([
        qmat[:, s * d_sub:(s + 1) * d_sub]
        @ np.asarray(books[s], dtype=np.float64).T
        for s in range(m)], axis=1)              # Q × m × k_sub

    from pyspark.sql import types as T
    out_schema = T.StructType([
        T.StructField("query_id", T.LongType()),
        T.StructField("vec_id", T.LongType()),
        T.StructField("adc", T.DoubleType()),
    ])
    keep = refine * k

    def score(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            codes = np.stack(pdf["pq_codes"].to_numpy())    # B × m
            approx = np.round(
                lut[:, np.arange(m)[None, :], codes].sum(axis=2), 9)
            # IVF mask: a row only competes for queries that probe its
            # cell (this is the at-rest partition pruning, expressed as
            # a mask because the local fixture is one unpartitioned
            # file). Self-matches masked before the prune as in PQ.
            cells = pdf["cell"].to_numpy()
            approx[~probe_ok[:, cells]] = -np.inf
            approx[np.equal.outer(qarr, pdf["vec_id"].to_numpy())] = -np.inf
            nq, nb = approx.shape
            vids = pdf["vec_id"].to_numpy()
            if nb > keep:
                idx = _topk_cols_deterministic(approx, vids, keep)
                yield pd.DataFrame({
                    "query_id": np.repeat(qarr, keep),
                    "vec_id": vids[idx].reshape(-1),
                    "adc": np.take_along_axis(approx, idx, axis=1).reshape(-1),
                })
            else:
                yield pd.DataFrame({
                    "query_id": np.repeat(qarr, nb),
                    "vec_id": np.tile(vids, nq),
                    "adc": approx.reshape(-1),
                })

    scored = (coded.mapInPandas(score, out_schema)
              .where(F.col("vec_id") != F.col("query_id"))
              .where(F.col("adc") != F.lit(float("-inf"))))
    return _exact_rerank(embeddings, scored, n_queries, k, refine, dim)


def _with_cell_and_codes(df: DataFrame, centroids: list[list[float]],
                         books: list, m: int, dim: int) -> DataFrame:
    """IVF cell + PQ codes in ONE Arrow pass (vs chaining
    _with_probe_cells and _with_pq_codes, which costs two Python round
    trips over the full corpus — the difference is a whole corpus scan
    at 100 TB). Identical math to the two parents, 9-dp rounding
    included, so assignments are bit-equal to the chained form."""
    import numpy as np
    import pandas as pd

    from pyspark.sql import types as T

    cmat = np.asarray(centroids, dtype=np.float64).T   # dim × C
    d_sub = dim // m
    bmats = [np.asarray(b, dtype=np.float64) for b in books]
    bnorm = [0.5 * (b * b).sum(axis=1) for b in bmats]
    out_schema = T.StructType([
        T.StructField("vec_id", T.LongType()),
        T.StructField("cell", T.IntegerType()),
        T.StructField("pq_codes", T.ArrayType(T.IntegerType())),
    ])

    def assign(batches):
        for pdf in batches:
            if not len(pdf):
                yield pd.DataFrame(
                    {"vec_id": pd.Series([], dtype="int64"),
                     "cell": pd.Series([], dtype="int32"),
                     "pq_codes": pd.Series([], dtype=object)})
                continue
            mtx = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
            dots = np.round(mtx @ cmat, 9)
            cell = np.argsort(-dots, axis=1, kind="stable")[:, 0]
            nrm = np.linalg.norm(mtx, axis=1, keepdims=True)
            full = mtx / np.where(nrm == 0, 1.0, nrm)
            codes = np.empty((len(pdf), m), dtype=np.int32)
            for s in range(m):
                sub = full[:, s * d_sub:(s + 1) * d_sub]
                codes[:, s] = np.argmax(
                    np.round(sub @ bmats[s].T - bnorm[s], 9), axis=1)
            yield pd.DataFrame({
                "vec_id": pdf["vec_id"].to_numpy(),
                "cell": cell.astype("int32"),
                "pq_codes": [row for row in codes],
            })

    return df.mapInPandas(assign, out_schema)


def _with_probe_cells(df: DataFrame, centroids: list[list[float]],
                      n_probe: int, emb_col: str = "embedding") -> DataFrame:
    """Append ``probe_cells``: the n_probe nearest centroid ids per row,
    nearest first, via an Arrow-batched numpy matmul (mapInPandas).

    Cosine argmax == dot-product argmax because the centroids are
    L2-normalized at build time (the row's own norm is a positive
    constant across cells).

    Why Python here and not a codegen expression: C unrolled dot
    products nested in one sort_array(array(struct...)) tree is a single
    C×dim-term expression — at C=16, dim=64 the generated doConsume
    method exceeds Janino's limits and compilation fails (measured), and
    higher-order-function lambdas are interpreted per element. A batch
    (B×dim)@(dim×C) BLAS matmul + argsort is the shape this computation
    actually is; Arrow moves it in columnar batches, no shuffle, scales
    as one map pass at any corpus size."""
    import numpy as np
    import pandas as pd

    from pyspark.sql import types as T

    cmat = np.asarray(centroids, dtype=np.float64).T  # dim × C
    # NB: StructType.add mutates in place — never call it on df.schema.
    out_schema = T.StructType(
        list(df.schema.fields)
        + [T.StructField("probe_cells", T.ArrayType(T.IntegerType()))])

    def assign(batches):
        for pdf in batches:
            if len(pdf):
                m = np.stack(pdf[emb_col].to_numpy()).astype(np.float64)
                # 9-dp round before the argsort: BLAS blocking can vary
                # with batch shape, and a 1e-16 wobble at a near-tie
                # would flip cell assignment between runs; rounding makes
                # such pairs exact ties, broken stably by cell index.
                dots = np.round(m @ cmat, 9)          # B × C
                order = np.argsort(-dots, axis=1, kind="stable")[:, :n_probe]
                pdf = pdf.assign(
                    probe_cells=[row.astype("int32") for row in order])
            else:
                pdf = pdf.assign(probe_cells=pd.Series([], dtype=object))
            yield pdf

    return df.mapInPandas(assign, out_schema)


def _normalize(vec: list[float]) -> list[float]:
    import math
    n = math.sqrt(sum(v * v for v in vec)) or 1.0
    return [v / n for v in vec]


def train_ivf_centroids(embeddings: DataFrame, n_cells: int = 16,
                        dim: int = 64, lloyd_iters: int = 1) -> list[list[float]]:
    """Deterministic IVF centroids: seeds = the n_cells corpus vectors with
    the smallest xxhash64(vec_id) (a uniform, order-independent sample),
    then ``lloyd_iters`` refinement passes. Each pass is one shuffle:
    groupBy(cell) with per-dimension F.sum — 2×C×dim doubles cross the
    wire, independent of corpus size. Centroid state (C×dim floats) lives
    on the driver like any broadcast model."""
    seeds = (embeddings
             .orderBy(F.xxhash64("vec_id"), "vec_id")
             .limit(n_cells)
             .select("embedding")
             .collect())
    centroids = [_normalize([float(v) for v in r.embedding]) for r in seeds]
    for _ in range(lloyd_iters):
        assigned = _with_probe_cells(
            embeddings.select("embedding"), centroids, n_probe=1)
        sums = (assigned
                .select(F.col("probe_cells")[0].alias("cell"), "embedding")
                .groupBy("cell")
                .agg(F.count("*").alias("n"),
                     *[F.sum(F.col("embedding")[i].cast("double")).alias(f"s{i}")
                       for i in range(dim)])
                .collect())
        new = list(centroids)
        for r in sums:
            # Round to 9 dp: F.sum over doubles is reduction-order-
            # dependent, so without a fixed precision the model (and any
            # recall pinned on it) would vary with partitioning.
            new[r.cell] = [round(v, 9) for v in _normalize(
                [r[f"s{i}"] / r.n for i in range(dim)])]
        centroids = new
    return centroids


def build_ivf_index(embeddings: DataFrame, n_cells: int = 16,
                    dim: int = 64) -> dict:
    """The at-rest IVF artifact: trained centroids (C×dim model state) +
    the corpus with its nearest-cell assignment — what a deployment
    stores ``partitionBy("cell")`` so probes prune at the scan. Pass as
    ``index=`` to :func:`ivf_ann_topk` to serve without retraining or
    re-assigning."""
    centroids = train_ivf_centroids(embeddings, n_cells=n_cells, dim=dim)
    assigned = (_with_probe_cells(
        embeddings.select("vec_id", "embedding"), centroids, n_probe=1)
        .select("vec_id", "embedding",
                V.norm("embedding", dim).alias("nrm"),
                F.col("probe_cells")[0].alias("cell")))
    return {"centroids": centroids, "assigned": assigned}


def append_ivf_index(index: dict, batch: DataFrame, dim: int = 64) -> dict:
    """Index MAINTENANCE for IVF — the vector-side twin of the dedup
    family's append_band_index: new vectors are assigned to the FROZEN
    centroids (one Arrow matmul pass over the batch; the model does not
    retrain and the existing corpus is not re-assigned) and their rows
    join the at-rest assigned set. Cost is O(batch); at 100 TB the
    append is a partitionBy("cell") write into the same layout the
    probes prune on, and a periodic retrain/re-assign is the
    compaction-class chore, not the per-ingest cost. Centroid drift is
    the known trade: a frozen model mis-cells vectors from a shifted
    distribution, which shows up as recall decay — the signal that
    schedules the retrain."""
    centroids = index["centroids"]
    add = (_with_probe_cells(
        batch.select("vec_id", "embedding"), centroids, n_probe=1)
        .select("vec_id", "embedding",
                V.norm("embedding", dim).alias("nrm"),
                F.col("probe_cells")[0].alias("cell")))
    return {"centroids": centroids,
            "assigned": index["assigned"].unionByName(add)}


def ivf_ann_topk(embeddings: DataFrame, n_queries: int = 10, k: int = 10,
                 n_cells: int = 16, n_probe: int = 4,
                 dim: int = 64, index: dict | None = None) -> DataFrame:
    """Approximate top-k via IVF cells: assign corpus rows to their nearest
    centroid, probe each query's n_probe nearest cells, exact re-rank of
    the candidates. Same output schema as brute_force_topk.

    Scale path: persist the corpus partitioned by cell
    (df.write.partitionBy("cell")) so a probe prunes to n_probe/n_cells of
    the data at the parquet-scan level; the candidate join below then
    shuffles only candidates, never the corpus."""
    if index is None:
        index = build_ivf_index(embeddings, n_cells=n_cells, dim=dim)
    centroids, e = index["centroids"], index["assigned"]
    q = (_with_probe_cells(
            embeddings.select("vec_id", "embedding")
            .where(F.col("vec_id") < n_queries), centroids, n_probe=n_probe)
         .select(F.col("vec_id").alias("query_id"),
                 F.col("embedding").alias("q_emb"),
                 V.norm("embedding", dim).alias("q_nrm"),
                 F.explode("probe_cells").alias("cell")))
    cand = (F.broadcast(q).join(e, "cell")
            .where(F.col("vec_id") != F.col("query_id")))
    cos = F.round(V.dot("q_emb", "embedding", dim) / (F.col("q_nrm") * F.col("nrm")), 6)
    w = W.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id"))
    return (
        cand.select("query_id", F.col("vec_id").alias("neighbor_id"),
                    cos.alias("cosine"))
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
    )
