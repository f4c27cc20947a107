"""Deduplication operators (SURVEY.md §2 B11; north-star mandate).

Five strategies, each a distributed query shape that survives 100 TB:

- exact: hash-groupBy on a content digest — one shuffle of (digest, id).
- MinHash+LSH: shingle -> K minhashes -> B banded bucket keys -> self-join
  per bucket -> exact-Jaccard verify. The self-join touches only
  same-bucket pairs (never the N² cross product); band count trades
  recall vs candidate volume.
- SimHash: 64-bit sign-of-weighted-sum fingerprint in 4×16-bit chunks;
  pigeonhole on chunks (hamming ≤ 3 ⇒ ≥ 1 identical chunk) prunes
  candidates, then exact hamming verify via xor+bit_count.
- n-gram Jaccard: inverted-index join on shingles (|A∩B| by counting
  shared shingles) — exact, no LSH approximation, heavier shuffle.
- embedding cosine: near-dup by vector similarity within blocking keys.

Everything is built-in expressions — xxhash64 / arrays / explode / joins —
no Python in any row path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# --- exact -------------------------------------------------------------------

def exact_dedup(documents: DataFrame) -> DataFrame:
    """Group identical texts by digest; keep the lowest doc_id as canonical
    (deterministic survivor rule)."""
    return (
        documents.select(F.sha2("text", 256).alias("digest"), "doc_id")
        .groupBy("digest")
        .agg(F.min("doc_id").alias("keep_id"), F.count("*").alias("n_copies"))
    )


# --- shingling ----------------------------------------------------------------

def with_shingles(documents: DataFrame, k: int = 3) -> DataFrame:
    """Distinct word k-shingles as strings — all in codegen, no Python.

    The token split is materialized as its own projection so the shingle
    transform slices a ready array; inlining ``split`` into the lambda
    would re-split the text once per shingle position (O(len²) per doc)."""
    toks = documents.select("doc_id", F.split("text", " ").alias("__toks"))
    shingles = F.array_distinct(F.expr(
        f"transform(sequence(1, greatest(size(__toks) - {k - 1}, 1)),"
        f" i -> concat_ws(' ', slice(__toks, CAST(i AS INT), {k})))"
    ))
    return toks.select("doc_id", shingles.alias("shingles"))


# --- MinHash + LSH --------------------------------------------------------------

N_HASHES = 16
N_BANDS = 4  # 4 rows per band


def minhash_signatures(documents: DataFrame, k: int = 3,
                       slim: bool = False) -> DataFrame:
    """K minhashes per doc — plus, unless ``slim``, the distinct shingle
    set for the exact verify: min over shingles of hash-family-i(shingle).

    Shape: explode shingle positions -> slice/concat_ws -> one
    xxhash64 per shingle STRING (the expensive variable-width hash); the
    K families re-hash that fixed-width bigint with a distinct literal
    seed inside K ``min`` aggregates of ONE groupBy(doc_id) — map-side
    partial combine reduces each partition to K longs + (non-slim) the
    shingle set before the shuffle. Every expression is whole-stage
    codegen.

    ``slim=True`` drops the ``collect_set(shingle)``: the partial aggs
    then carry K longs per doc instead of the doc's whole distinct
    shingle TEXT — measured 43.2 s -> 8.7 s for the signature pass at
    the 500×/2.5 M-doc probe (r6). Candidate verification fetches
    shingles separately (with_shingles is a pure projection) for only
    the docs that actually collide.

    (A previous form computed the families with ``transform(sh_hash,
    lambda h, i=i: xxhash64(lit(i), h))`` — a TWO-argument lambda, so
    Spark bound ``i`` to the array INDEX, shadowing the seed default:
    all K families collapsed into one position-dependent hash and LSH
    recall silently degraded. Caught by signature-equality A/B against
    this explicit shape; tests now pin family independence.)"""
    toks = documents.select("doc_id", F.split("text", " ").alias("__toks"))
    pos = toks.select(
        "doc_id", "__toks",
        F.explode(F.sequence(
            F.lit(1), F.greatest(F.size("__toks") - (k - 1), F.lit(1)))
        ).alias("__i"))
    sh = pos.select(
        "doc_id",
        F.concat_ws(" ", F.slice("__toks", F.col("__i"), k)).alias("shingle"))
    h = sh.select("doc_id", "shingle", F.xxhash64("shingle").alias("h"))
    aggs = [F.min(F.xxhash64(F.lit(i), F.col("h"))).alias(f"mh_{i}")
            for i in range(N_HASHES)]
    if slim:
        return h.groupBy("doc_id").agg(*aggs)
    return h.groupBy("doc_id").agg(
        F.collect_set("shingle").alias("shingles"), *aggs)


def _doc_shingle_sets(documents: DataFrame, k: int) -> DataFrame:
    """One (doc_id, shingles) row PER DOC ID for the exact-Jaccard
    verify — the per-id distinct UNION across rows, matching the old
    collect_set semantics when a corpus carries duplicate doc_id rows
    (with_shingles alone is per-ROW, which would fan the verify joins
    out into one differently-scored row per copy). Grouping here is
    candidate-sized: callers prune to colliding ids first."""
    return (with_shingles(documents, k)
            .groupBy("doc_id")
            .agg(F.array_distinct(F.flatten(F.collect_list("shingles")))
                 .alias("shingles")))


def _band_structs() -> F.Column:
    """The B banded bucket keys of a signature row: array of
    (band_id, band_hash) structs, band_hash = xxhash64 of the band's R
    minhash columns. One definition, used by the self-join, the
    incremental batch-vs-corpus join, and the candidate generator."""
    rows_per_band = N_HASHES // N_BANDS
    return F.array(*[
        F.struct(
            F.lit(b).alias("band_id"),
            F.xxhash64(*[F.col(f"mh_{b * rows_per_band + r}")
                         for r in range(rows_per_band)]).alias("band_hash"),
        )
        for b in range(N_BANDS)
    ])


def lsh_candidate_pairs(signed: DataFrame) -> DataFrame:
    """Band the signature (B bands × R rows), bucket-join within bands.

    Rows that agree on all R minhashes of any band collide; the join key
    (band_id, band_hash) keeps the shuffle proportional to data, not N².
    """
    bands = _band_structs()
    exploded = (
        signed.select("doc_id", F.explode(bands).alias("band"))
        .select("doc_id", "band.band_id", "band.band_hash")
    )
    a = exploded.alias("a")
    b = exploded.alias("b")
    return (
        a.join(b, ["band_id", "band_hash"])
        .where(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )


def minhash_lsh_dedup(documents: DataFrame, threshold: float = 0.5,
                      k: int = 3) -> DataFrame:
    """Near-dup pairs: LSH candidates verified by exact Jaccard.

    The band self-join is SKINNY — (doc_id, band_id, band_hash), 24
    bytes a row — and the shingle sets are fetched afterwards for only
    the docs that actually collide. An earlier shape let the shingle
    arrays ride along through the band explode to save the join back;
    that ships every doc's distinct shingle TEXT through the shuffle
    8× (4 bands × 2 join sides) while candidates are rare — measured
    at the 500×/2.5 M-doc probe (r6): 62.7 s ride-along vs 9.5 s
    skinny for the same 1,191 verified pairs. with_shingles is a pure
    per-row projection (no collect_set, no shuffle of its own), and the
    candidate set is shuffle-sized stats by the time the verify joins
    run, so AQE picks broadcast and the corpus-side shingle projection
    never shuffles at all; when a pathological corpus makes candidates
    huge, the same plan degrades gracefully to two shuffled joins —
    still strictly less traffic than the 8× ride-along."""
    signed = minhash_signatures(documents, k, slim=True)
    # The candidate pair set is referenced THREE times downstream (the
    # id set that prunes the corpus, and both sides of the verify
    # join); left lazy, Catalyst plans the whole signature + band-join
    # subtree once per reference (the r12 before-plan shows it 3x,
    # 112 operators — plans/r12/dedup_minhash_lsh_before.txt). The
    # pairs are candidate-sized by construction, so an EAGER node-local
    # checkpoint executes the generator once and hands all three
    # consumers a tiny materialized table (same discipline as
    # connected_components' result; measured ~12% on the key at sf0.1
    # and a 112-op -> ~40-op plan). The checkpointed RDD is freed by
    # the ContextCleaner when the result is dropped.
    cand = lsh_candidate_pairs(signed).localCheckpoint(eager=True)
    # Shingle ONLY the colliding docs: semi-join the corpus down to the
    # candidate id set FIRST (a broadcast probe on doc_id — the scan
    # reads text but does no shingle work for non-colliding rows), then
    # materialize shingles for that candidate-sized remainder.
    cand_ids = (cand.select(F.explode(F.array("doc_a", "doc_b"))
                            .alias("doc_id")).distinct())
    shing = _doc_shingle_sets(
        documents.join(cand_ids, "doc_id", "left_semi"), k)
    pairs = (
        cand
        .join(shing.select(F.col("doc_id").alias("doc_a"),
                           F.col("shingles").alias("sh_a")), "doc_a")
        .join(shing.select(F.col("doc_id").alias("doc_b"),
                           F.col("shingles").alias("sh_b")), "doc_b")
    )
    jac = (
        F.size(F.array_intersect("sh_a", "sh_b")).cast("double")
        / F.size(F.array_union("sh_a", "sh_b"))
    )
    return (
        pairs.select("doc_a", "doc_b", F.round(jac, 6).alias("jaccard"))
        .where(F.col("jaccard") >= threshold)
    )


def _corpus_band_rows(docs, k: int = 3) -> DataFrame:
    """(corpus_id, band_id, band_hash) band rows of a (doc_id, text)
    frame — THE at-rest band-index row shape. One definition shared by
    the index build, the append-only maintenance, and the inline
    fallback of the batch probe (r12 review: the block existed in three
    copies; a band-shape change applied to fewer than all three would
    silently diverge the stored index from the inline probe)."""
    sc = minhash_signatures(docs, k, slim=True)
    return (sc.select(F.col("doc_id").alias("corpus_id"),
                      F.explode(_band_structs()).alias("band"))
            .select("corpus_id", "band.band_id", "band.band_hash"))


def build_corpus_band_index(corpus: DataFrame, table: str,
                            k: int = 3, n_buckets: int = 16) -> DataFrame:
    """ONE-TIME at-rest index build for ingest-time dedup: the corpus's
    exploded MinHash band keys, persisted as a parquet table BUCKETED by
    (band_id, band_hash) — the layout incremental_near_dups' docstring
    promises. Steady state, each ingest batch computes only ITS OWN
    signatures and joins this stored table; the corpus side is never
    re-shingled, re-hashed, or re-shuffled (the bucketed scan carries
    its partitioning). Returns the re-read table (corpus_id, band_id,
    band_hash) to pass as ``corpus_bands``.

    Index maintenance is append-only: admitted docs' bands append to
    the table (at 100 TB, a periodic compaction rewrites small files —
    a storage chore, not a recompute)."""
    from database_syncer_spark.core.bucketing import write_bucketed_snapshot

    ec = _corpus_band_rows(corpus, k)
    return write_bucketed_snapshot(
        ec, table, ["band_id", "band_hash"], n_buckets)


def append_band_index(admitted: DataFrame, table: str, k: int = 3,
                      n_buckets: int = 16) -> DataFrame:
    """APPEND-ONLY maintenance of the at-rest band index — the other
    half of the steady-state deployment build_corpus_band_index's
    docstring promises: after an ingest batch's novel docs are admitted
    to the corpus, ONLY their band keys are computed and appended into
    the same bucketed layout (matching bucket spec, so the files land
    in the right buckets and the next batch's probe sees them through
    the identical bucket-pruned scan). Cost is O(admitted), never
    corpus-proportional; at 100 TB a periodic compaction folds the
    small appended files — a storage chore, not a recompute. Returns
    the refreshed table."""
    spark = admitted.sparkSession
    ec = _corpus_band_rows(admitted, k)
    (ec.write.mode("append")
       .bucketBy(n_buckets, "band_id", "band_hash")
       .sortBy("band_id", "band_hash")
       .format("parquet")
       .saveAsTable(table))
    # ``admitted`` may be bound to a DIFFERENT SparkSession than the
    # caller's (foreachBatch hands micro-batch frames on a per-epoch
    # session): each session keeps its OWN table-relation/file-listing
    # cache, so refreshing only admitted's session leaves a reader that
    # resolved the table through another session on the PREVIOUS file
    # listing — the r12 optimization round hit exactly this (the
    # stream_dedup_rolling day-3 probe silently missed day-1's
    # appended bands once plan timing shifted; caught by the oracle
    # value check). Refresh the writing, thread-active, and default
    # (builder.getOrCreate) sessions' catalogs — the set dedupes
    # same-wrapper repeats.
    from pyspark.sql import SparkSession

    # The WRITING session's refresh must propagate: swallowing it would
    # leave the stale file listing this refresh exists to fix (the
    # silent-miss bug class the r12 oracle check caught) with no signal
    # at all. Only the SECONDARY sessions' refreshes are best-effort —
    # a torn-down per-epoch session must not fail the append — and a
    # swallowed failure is at least logged (ADVICE r12).
    spark.catalog.refreshTable(table)
    active = SparkSession.getActiveSession()
    for s in {SparkSession.builder.getOrCreate(),
              *([active] if active is not None else [])} - {spark}:
        try:
            s.catalog.refreshTable(table)
        except Exception as exc:  # noqa: BLE001 — secondary session may be torn down
            import logging
            logging.getLogger(__name__).warning(
                "append_band_index: secondary-session catalog refresh "
                "of %s failed (%s: %s)", table, type(exc).__name__, exc)
    return spark.table(table)


def build_corpus_digest_index(corpus: DataFrame, table: str,
                              n_buckets: int = 16) -> DataFrame:
    """At-rest exact-dup gate: sha2(text) digests, bucketed by digest —
    the 64-byte probe table the exact-novelty semi-join reads instead
    of digesting the whole corpus per batch."""
    from database_syncer_spark.core.bucketing import write_bucketed_snapshot

    return write_bucketed_snapshot(
        corpus.select(F.sha2("text", 256).alias("digest")),
        table, ["digest"], n_buckets)


def _band_candidates(batch: DataFrame, corpus: DataFrame, k: int,
                     corpus_bands: DataFrame | None) -> DataFrame:
    """Skinny batch×corpus band-candidate generator (doc_id, corpus_id)
    — the same shape (and the same r6 500×-probe rationale) as
    minhash_lsh_dedup: the CORPUS side's collect_set would otherwise
    ship every stored doc's distinct shingle text through the shuffle
    on every ingest batch. With ``corpus_bands`` the corpus side is the
    AT-REST bucketed table scan; inline otherwise."""
    sb = minhash_signatures(batch, k, slim=True)
    eb = (sb.select("doc_id", F.explode(_band_structs()).alias("band"))
          .select("doc_id", "band.band_id", "band.band_hash"))
    if corpus_bands is not None:
        ec = corpus_bands.select("corpus_id", "band_id", "band_hash")
    else:
        ec = _corpus_band_rows(corpus, k)
    return (eb.join(ec, ["band_id", "band_hash"])
            .select("doc_id", "corpus_id").distinct())


def incremental_near_dups(batch: DataFrame, corpus: DataFrame,
                          threshold: float = 0.5, k: int = 3,
                          corpus_bands: DataFrame | None = None) -> DataFrame:
    """Ingest-time dedup: every BATCH doc checked for near-dups against
    the EXISTING corpus only — the daily-ingest question ("is this new
    doc a duplicate of anything we already have?") without recomputing
    any corpus self-pairs (yesterday's work). Output: one verdict row
    per batch doc — (doc_id, n_dups, max_jaccard, novel); novel docs
    report n_dups = 0 / NULL max (a LEFT join from the batch side, so a
    doc with zero collisions cannot silently vanish — the ann_recall
    lesson from r3's advice).

    Scale: the band join is batch×corpus, and at rest the corpus's
    banded signatures are PRECOMPUTED and bucketed by (band_id,
    band_hash) — pass that stored table as ``corpus_bands``
    (build_corpus_band_index) and a daily batch shuffles only its own
    bands and probes the bucket layout. Precisely: the corpus side is
    never re-shingled, re-hashed, or re-shuffled per batch; what remains
    corpus-proportional is ONE columnar scan of the skinny stored band
    table (three fixed-width columns, no text) — at 100 TB that scan is
    the band table's few hundred GB read bucket-parallel, not the corpus
    itself, and everything downstream (shuffle, verify) is batch +
    collision sized (measured: SCALE.md's at-rest-index A/B, a 0.81%
    batch at 3.2-4.8% of the full-curate wall). With ``corpus_bands=None`` the
    corpus side is derived inline (fixture-scale convenience; the
    one-time index build the steady state amortizes). ``corpus`` text
    is still consulted — but only for the CANDIDATES' shingle fetch
    (left-semi pruned). Recall is the LSH family's (same bands as
    minhash_lsh_dedup); verification is exact Jaccard."""
    # Same three-consumer shape as minhash_lsh_dedup (batch id set,
    # corpus id set, verify join): eager node-local checkpoint runs the
    # batch-signature + band-probe subtree once instead of once per
    # reference (r12; candidate-sized by construction). The generator
    # itself lives in _band_candidates so the stored-index-vs-inline
    # plan guard (test_plans.py) can still read its plan pre-checkpoint.
    # (r13: a lazy-candidates variant for the single-probe
    # dedup_incremental key — VERDICT r12 item 5's "checkpoint tax" —
    # was A/B'd INTERLEAVED in one session and measured parity
    # (eager 1.34-1.69 s vs lazy 1.24-1.56 s at sf0.1); the r12
    # before/after delta it was meant to recover was cross-session
    # host drift. The checkpoint stays unconditional: at scale the
    # lazy form re-executes the corpus-signature subtree per
    # reference, which is strictly worse.)
    cand = _band_candidates(
        batch, corpus, k, corpus_bands).localCheckpoint(eager=True)
    sh_b = _doc_shingle_sets(
        batch.join(cand.select("doc_id").distinct(), "doc_id", "left_semi"),
        k).withColumnRenamed("shingles", "sh_b")
    sh_c = (_doc_shingle_sets(
        corpus.join(cand.select(F.col("corpus_id").alias("doc_id")).distinct(),
                    "doc_id", "left_semi"), k)
        .select(F.col("doc_id").alias("corpus_id"),
                F.col("shingles").alias("sh_c")))
    pairs = cand.join(sh_b, "doc_id").join(sh_c, "corpus_id")
    jac = F.round(
        F.size(F.array_intersect("sh_b", "sh_c")).cast("double")
        / F.size(F.array_union("sh_b", "sh_c")), 6)
    verified = (pairs.select("doc_id", jac.alias("jaccard"))
                .where(F.col("jaccard") >= threshold))
    per_doc = verified.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_dups"),
        F.max("jaccard").alias("max_jaccard"))
    return (batch.select("doc_id").join(per_doc, "doc_id", "left")
            .select("doc_id",
                    F.coalesce("n_dups", F.lit(0)).alias("n_dups"),
                    "max_jaccard",
                    (F.coalesce("n_dups", F.lit(0)) == 0).alias("novel")))


# --- SimHash ---------------------------------------------------------------------

def simhash_chunks(documents: DataFrame) -> DataFrame:
    """64-bit SimHash as 4×16-bit chunk columns.

    Explode tokens, hash each, then per doc sum the ±1 contribution of
    every bit; bit = 1 iff the sum is positive. Chunks double as the
    pigeonhole join keys for hamming-bounded candidate search."""
    tok = (
        documents.select(
            "doc_id", F.explode(F.split("text", " ")).alias("token"))
        .where(F.col("token") != "")
        .select("doc_id", F.xxhash64("token").alias("h"))
    )
    chunk_cols = []
    for c in range(4):
        bits = []
        for i in range(16):
            bit = 16 * c + i
            # shiftright+mask instead of a 1<<bit literal: bit 63 would
            # overflow a signed long
            contrib = F.when(
                F.shiftright(F.col("h"), bit).bitwiseAND(F.lit(1)) == 1,
                1).otherwise(-1)
            bits.append(
                F.when(F.sum(contrib) > 0, F.lit(1 << i)).otherwise(F.lit(0)))
        chunk = bits[0]
        for extra in bits[1:]:
            chunk = chunk + extra
        chunk_cols.append(chunk.alias(f"chunk_{c}"))
    return tok.groupBy("doc_id").agg(*chunk_cols)


# Block-permutation candidate tables (Manku/Jarvelin web-dedup scheme,
# public WWW'07 construction): split the 64-bit fingerprint into
# _SH_BLOCKS blocks; max_hamming bit errors corrupt at most max_hamming
# blocks, so every pair within distance max_hamming agrees on SOME
# (_SH_BLOCKS - max_hamming)-subset of blocks. Keying candidates on every
# such subset keeps recall EXACT while widening the effective key from 16
# bits (the old 4-chunk pigeonhole: 65,536 buckets → ~N²/2¹⁷ candidate
# pairs, quadratic at web scale) to ~33 bits per table.
_SH_BLOCKS = 6
_SH_BLOCK_BOUNDS = [0, 11, 22, 33, 44, 54, 64]  # 6 blocks: 11×4 + 10×2 bits


def _simhash_tables(max_hamming: int) -> list[tuple[int, ...]]:
    from itertools import combinations
    keep = _SH_BLOCKS - max_hamming
    if keep < 1:
        raise ValueError(f"max_hamming={max_hamming} needs > {_SH_BLOCKS - 1}")
    return list(combinations(range(_SH_BLOCKS), keep))


def simhash_dedup(documents: DataFrame, max_hamming: int = 3,
                  bucket_cap: int = 10_000) -> DataFrame:
    """Near-dup pairs with SimHash hamming distance <= max_hamming.

    Candidates: assemble the 64-bit fingerprint from the 4 chunk columns,
    slice it into 6 blocks, and emit one (table_id, key) row per
    C(6, 6-max_hamming) block-subset table — every pair within the
    hamming budget shares a full key in at least one table (exact
    recall), and each table key spans ~33 bits, so bucket population
    scales as N/2³³ instead of N/2¹⁶. All tables ride ONE exploded
    self-join (the LSH-banding shape — one shuffle, ReuseExchange).

    ``bucket_cap`` drops candidate buckets larger than the cap before the
    join — the worst-case quadratic guard for adversarial key skew (e.g.
    boilerplate corpora whose fingerprints collapse to a handful of
    values). A dropped bucket means its docs agree on one block triple;
    near-identical docs also collide in other tables, so the practical
    recall cost is confined to corpora that are one giant near-dup
    cluster — where pair enumeration is the wrong output anyway
    (tests/test_pipeline.py pins the o(N²) bound on a skewed corpus).
    Verify = xor + bit_count, exact."""
    fps = simhash_chunks(documents)
    # shiftleft|bitwiseOR, not multiply|add: chunk_3 << 48 can set bit 63,
    # which overflows signed-long arithmetic but is fine bitwise.
    fp = F.lit(0).cast("long")
    for c in range(4):
        fp = fp.bitwiseOR(F.shiftleft(F.col(f"chunk_{c}").cast("long"), 16 * c))
    fps = fps.withColumn("fp", fp)

    def block(i: int):
        lo, hi = _SH_BLOCK_BOUNDS[i], _SH_BLOCK_BOUNDS[i + 1]
        return F.shiftrightunsigned("fp", lo).bitwiseAND(F.lit((1 << (hi - lo)) - 1))

    tables = F.array(*[
        F.struct(
            F.lit(t).alias("table_id"),
            F.xxhash64(F.lit(t), *[block(i) for i in combo]).alias("key"),
        )
        for t, combo in enumerate(_simhash_tables(max_hamming))
    ])
    keyed = (
        fps.select("doc_id", *[f"chunk_{i}" for i in range(4)],
                   F.explode(tables).alias("t"))
        .select("doc_id", "t.table_id", "t.key",
                *[f"chunk_{i}" for i in range(4)])
    )
    # Bucket-size guard: the count window partitions by the JOIN keys, so
    # it shares the join's hash shuffle (one exchange, reused).
    from pyspark.sql import Window as W
    keyed = keyed.withColumn(
        "__bucket_n", F.count("*").over(W.partitionBy("table_id", "key"))
    ).where(F.col("__bucket_n") <= bucket_cap).drop("__bucket_n")
    a, b = keyed.alias("a"), keyed.alias("b")
    cand = (
        a.join(b, ["table_id", "key"])
        .where(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            *[F.col(f"a.chunk_{i}").alias(f"ac{i}") for i in range(4)],
            *[F.col(f"b.chunk_{i}").alias(f"bc{i}") for i in range(4)],
        )
        .distinct()
    )
    hamming = sum(
        F.bit_count(F.col(f"ac{i}").bitwiseXOR(F.col(f"bc{i}")))
        for i in range(4)
    )
    return (
        cand.select("doc_a", "doc_b", hamming.alias("hamming"))
        .where(F.col("hamming") <= max_hamming)
    )


# --- exact n-gram Jaccard (inverted index) ------------------------------------

def _shingle_intersections(documents: DataFrame, k: int,
                           df_cap: int) -> DataFrame:
    """Shared candidate stage of the exact shingle measures: explode
    distinct k-shingles, apply the df_cap prefix filter (the count
    window partitions by the JOIN key, so it shares the join's hash
    exchange), inverted-index self-join, and count the intersection once
    per unordered pair. Returns (doc_a < doc_b, na, nb, c).

    Shingle stage (r13, guide §4.1/§2.4): positional explode +
    codegen'd slice/concat_ws — the minhash_signatures shape — instead
    of exploding the with_shingles HOF array, whose transform lambda is
    interpreted PER ELEMENT (the exact text_decontaminate finding; A/B
    at sf0.1: 2.3-2.9 s -> 1.0 s for the full jaccard key, and 4.1-6.4 s
    -> 1.2-1.5 s for this stage alone at a 100 k-doc probe, values
    identical — scripts/ngram_shape_ab.py / ngram_shape_scale_probe.py).
    The per-doc DISTINCT the array form gave row-locally comes from a
    collect_set grouped on doc_id, with the corpus repartitioned by
    doc_id FIRST (the repetition_score trick): hashpartitioning(doc_id)
    already satisfies the aggregation's clustering, so the one new
    exchange carries document TEXT (1x corpus) and the exploded shingle
    rows never cross the wire; n_sh = size(set) keeps counting ALL the
    doc's distinct shingles, preserving the df_cap one-sided-error
    argument below."""
    from pyspark.sql import Window as W

    # NULL text rows are row-identical across the shapes WITHOUT a
    # guard: with_shingles' sequence runs over greatest(size(NULL)-2, 1)
    # = 1, so the array form also emits exactly one '' shingle for a
    # NULL text — same as concat_ws over the NULL slice here (pinned by
    # test_shingle_intersections_equals_array_form's NULL/empty rows).
    toks = (documents.repartition("doc_id")
            .select("doc_id", F.split("text", " ").alias("__toks")))
    pos = toks.select(
        "doc_id", "__toks",
        F.explode(F.sequence(
            F.lit(1), F.greatest(F.size("__toks") - (k - 1), F.lit(1)))
        ).alias("__i"))
    raw = pos.select(
        "doc_id",
        F.concat_ws(" ", F.slice("__toks", F.col("__i"), k)).alias("sh"))
    sets = raw.groupBy("doc_id").agg(F.collect_set("sh").alias("shingles"))
    sh = sets.select(
        "doc_id", F.explode("shingles").alias("sh"),
        F.size("shingles").alias("n_sh"),
    )
    sh = sh.withColumn(
        "__df", F.count("*").over(W.partitionBy("sh"))
    ).where(F.col("__df") <= df_cap).drop("__df")
    a, b = sh.alias("a"), sh.alias("b")
    return (
        a.join(b, "sh")
        .where(F.col("a.doc_id") < F.col("b.doc_id"))
        .groupBy(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"),
            F.col("a.n_sh").alias("na"), F.col("b.n_sh").alias("nb"))
        .agg(F.count("*").alias("c"))
    )


def ngram_jaccard_pairs(documents: DataFrame, threshold: float = 0.2,
                        k: int = 3, df_cap: int = 10_000) -> DataFrame:
    """EXACT Jaccard over word k-shingles via an inverted-index self-join:
    |A∩B| = count of shared shingles; sizes come from the per-doc shingle
    count, so no second pass over text. The self-join costs
    sum(posting-list²), so ONE boilerplate shingle shared by f·N docs
    makes it quadratic (f=1% of 10¹⁰ docs → a 10¹⁶-pair bucket).

    ``df_cap`` drops shingles whose document frequency exceeds the cap
    before the join (the standard prefix-filter defence). Effect on
    exactness: the |A∩B| count loses at most the s capped shingles a pair
    shares, so the reported jaccard underestimates by at most
    s/(|A∪B|) — for df_cap ≫ typical DF the result is exact (no fixture
    shingle comes near the default cap), and a capped shingle is by
    construction near-content-free boilerplate for similarity purposes.
    The per-doc sizes ``n_sh`` keep counting ALL shingles, so capping
    never inflates a score — errors are one-sided (recall, never
    precision).

    MEASURED BOUNDARY (r5/r7 probes): 585 s at 1 M docs vs the banded
    LSH generator's 30 s for the same verified edges, and at 2.5 M docs
    the self-join's shuffle spill exhausted ~50 GB of free disk and the
    job ABORTED (ENOSPC). This is the exactness/oracle tool for
    fixture-scale verification; every end-to-end dedup artifact
    (corpus_keep, soft_keep) defaults to minhash_lsh_dedup."""
    inter = _shingle_intersections(documents, k, df_cap)
    jac = F.col("c").cast("double") / (F.col("na") + F.col("nb") - F.col("c"))
    return (
        inter.select("doc_a", "doc_b", F.round(jac, 6).alias("jaccard"))
        .where(F.col("jaccard") >= threshold)
    )


def ngram_containment_pairs(documents: DataFrame, threshold: float = 0.5,
                            k: int = 3, df_cap: int = 10_000) -> DataFrame:
    """EXACT shingle containment C(A→B) = |A∩B| / |A| — the asymmetric
    near-dup measure that catches SUB-document duplication (doc A mostly
    quoted/embedded inside doc B), which symmetric Jaccard misses when
    |B| ≫ |A|: C(A→B) can be 1.0 while J(A,B) ≈ |A|/|B| → 0.

    Shares the inverted-index shape (and the df_cap prefix-filter
    defence — same one-sided error argument) with
    :func:`ngram_jaccard_pairs`; the intersection count is computed ONCE
    per unordered pair and both directions are emitted by exploding two
    structs from it, so the asymmetry costs no second join."""
    inter = _shingle_intersections(documents, k, df_cap)
    cont = F.round(F.col("c").cast("double") / F.col("n_src"), 6)
    both = inter.select(F.explode(F.array(
        F.struct(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst"),
                 F.col("na").alias("n_src"), F.col("c")),
        F.struct(F.col("doc_b").alias("src"), F.col("doc_a").alias("dst"),
                 F.col("nb").alias("n_src"), F.col("c")),
    )).alias("p")).select("p.*")
    return (
        both.select("src", "dst", cont.alias("containment"))
        .where(F.col("containment") >= threshold)
    )


def soft_keep_weights(documents: DataFrame) -> DataFrame:
    """Soft dedup: the per-row duplication weighting table
    (doc_id, component, cluster_size, keep_ppm, kept) — keep each
    near-dup cluster once IN EXPECTATION instead of hard-dropping to
    one survivor (keep_ppm = floor(1e6 / cluster_size); membership via
    the engine-exact mod-first Knuth hash, so which member survives is
    random-but-reproducible).

    Cluster sizes MUST aggregate the corpus rows, not the components
    table: cluster_size counts duplicate INSTANCES — a doc_id present
    on 3 corpus rows contributes 3 — which is what the 1/cluster_size
    down-weighting exists to correct (and what the recursive-CTE
    oracle's `allc` counts). An r6 attempt to source sizes from the
    pairs-sized comp table (nodes, not rows) passed every unique-id
    fixture but silently stopped down-weighting duplicated doc_ids —
    caught in review, reverted, pinned by
    tests/test_pipeline.py::test_soft_keep_counts_duplicate_instances.
    The groupBy partial-combines map-side, so the shuffle carries
    component-count rows per partition, never the corpus."""
    comp = connected_components(minhash_lsh_dedup(documents))
    full = (documents.select("doc_id").join(comp, "doc_id", "left")
            .withColumn("component", F.coalesce("component", "doc_id")))
    sizes = full.groupBy("component").agg(
        F.count("*").alias("cluster_size"))
    return (full.join(sizes, "component")
            .withColumn("keep_ppm",
                        F.expr("CAST(1000000 DIV cluster_size AS BIGINT)"))
            .withColumn("kept",  # mod-first: overflow-proof, same values
                        F.pmod(F.pmod(F.col("doc_id"), F.lit(1000000))
                               * F.lit(2654435761),
                               F.lit(1000000)) < F.col("keep_ppm"))
            .select("doc_id", "component", "cluster_size",
                    "keep_ppm", "kept"))


# --- paragraph/line-level dedup ---------------------------------------------------

def paragraph_dedup(documents: DataFrame,
                    chunk_words: int = 10) -> DataFrame:
    """Sub-document exact dedup — the C4/RefinedWeb granularity the
    doc-level family (exact/near/soft/incremental) doesn't cover:
    remove every repeated SPAN across the corpus, keeping only its
    first occurrence (ordered by doc_id, then position), and re-emit
    the cleaned documents. Spans are consecutive ``chunk_words``-word
    chunks (the fixtures are single-line word streams; on newline-
    delimited corpora the same shape applies with split('\\n')).

    Output: (doc_id, clean_text, n_chunks, n_removed) — one row per
    input document, clean_text = the kept chunks re-joined in order
    (empty string when every span of a late exact-duplicate is
    scrubbed).

    Shape: corpus-sized explode, ONE (chunk) shuffle for the frequency/
    first-occurrence aggregate, one join back, one (doc_id) shuffle to
    reassemble. Keep-first is min(struct(doc_id, pos)) — a partially
    aggregable map-side-combined agg — NOT a row_number window: at
    corpus scale boilerplate chunks repeat millions of times, and a
    window's per-chunk sort partition inherits exactly that skew while
    min() reduces it on the map side. The join back is chunk-frequency
    sized per chunk but row-preserving (one agg row per distinct
    chunk), and AQE's skew-join split covers the residual probe skew."""
    # NULL text must still emit its one output row (split(NULL) would
    # otherwise yield size -1, NULL chunks, and a null-unsafe join that
    # silently DROPS the document — r8 review finding): treat NULL as ''
    words = F.split(F.coalesce(F.col("text"), F.lit("")), " ")
    n = F.ceil(F.size(words) / F.lit(chunk_words)).cast("int")
    chunks = F.transform(
        F.sequence(F.lit(0), n - 1),
        lambda i: F.array_join(
            F.slice(words, i * chunk_words + 1, chunk_words), " "))
    ch = (documents
          .select("doc_id", F.posexplode(chunks).alias("pos", "chunk")))
    firsts = ch.groupBy("chunk").agg(
        F.count("*").alias("freq"),
        F.min(F.struct("doc_id", "pos")).alias("first"))
    kept = (F.col("freq") == 1) | (
        (F.col("doc_id") == F.col("first.doc_id"))
        & (F.col("pos") == F.col("first.pos")))
    return (ch.join(firsts, "chunk")
            .groupBy("doc_id")
            .agg(
                F.array_join(
                    F.transform(
                        F.array_sort(F.collect_list(
                            F.when(kept, F.struct("pos", "chunk")))),
                        lambda s: s["chunk"]),
                    " ").alias("clean_text"),
                F.count("*").alias("n_chunks"),
                F.sum(F.when(kept, 0).otherwise(1)).alias("n_removed")))


# --- connected components over near-dup pairs -----------------------------------

def connected_components(edges: DataFrame, src: str = "doc_a",
                         dst: str = "doc_b", max_iter: int = 20) -> DataFrame:
    """Cluster near-dup pairs into components: (doc_id, component) where
    component = min doc_id reachable through any chain of pairs — the
    step that turns pairwise dedup output into keep/drop decisions (keep
    one doc per component).

    Iterative min-label propagation: each round every node takes the min
    of its own label and its neighbors' labels; converges in
    O(cluster diameter) rounds (near-dup clusters are shallow — a few
    rounds in practice, ``max_iter`` caps pathological chains). Each
    round is one join + one partial-agg'd groupBy, all JVM-side; the
    per-round result is persisted so round N+1 doesn't recompute rounds
    1..N. At extreme scale the same loop with large-star/small-star
    rewrites converges in O(log n) — the shape here is the standard one.
    """
    from pyspark import StorageLevel

    # Both directions from ONE pass over the edge plan: the union-of-two-
    # selects form executed the (possibly expensive) upstream pair plan
    # once per branch — measured +2.2 s per components call at sf0.1
    # after the r6 skinny-band rewrite added stages to that plan.
    # r13: SELF-EDGES inject each node's own label into the
    # neighbor-min, so "min over N(a) ∪ {a}" — the exact update rule —
    # is ONE join + one groupBy per iteration; the comp.join(nbr_min,
    # "left") + least() that previously re-attached the node's own
    # label disappears (-1 join, -1 Exchange per round; loop A/B
    # interleaved on pre-materialized edges: 18 -> 14 jobs,
    # 0.82-1.85 -> 0.64-1.05 s per call at sf0.1, 5.20 -> 3.98 s at a
    # 1 M-edge star-forest probe, label maps identical —
    # scripts/components_ab.py). The self-edges ride the SAME explode
    # as the symmetric pair — (a,b),(b,a),(a,a),(b,b), one pass over
    # the edge plan; duplicates of a self-edge are harmless under min
    # and cost less than the distinct-nodes union branch that would
    # otherwise execute the (possibly expensive, lazily-planned)
    # upstream pair generator a second time (measured: the union-branch
    # form regressed corpus_curate 3.6 -> 4.2 s while this form
    # improves it). Convergence is detected by the MONOTONE LABEL SUM:
    # labels only ever decrease, so any change strictly decreases
    # sum(component) — no flag column needed. The single comp
    # reference per iteration also keeps the logical tree LINEAR in
    # the iteration count: the old shape referenced the cached comp
    # twice per round, so analysis + event-log plan stringification
    # walked ~2^i fragments — measured as a driver MELT (>21 min of
    # generateTreeString CPU, run killed) on a deep-chain probe that
    # the new shape finishes in 27 s (9 iterations, 1 M edges,
    # depth 8).
    sym = (
        edges.select(F.explode(F.array(
            F.struct(F.col(src).alias("a"), F.col(dst).alias("b")),
            F.struct(F.col(dst).alias("a"), F.col(src).alias("b")),
            F.struct(F.col(src).alias("a"), F.col(src).alias("b")),
            F.struct(F.col(dst).alias("a"), F.col(dst).alias("b")),
        )).alias("e"))
        .select("e.a", "e.b")
    )
    sym = sym.persist(StorageLevel.MEMORY_AND_DISK)
    comp = (
        sym.select(F.col("a").alias("id")).distinct()
        .select("id", F.col("id").alias("component"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    # decimal(38,0): the sum of N doc_id-sized longs must not overflow
    # under ANSI mode (2^63-scale ids x 10^10 rows ~ 10^29 << 10^38)
    prev_sum = None
    cached = comp
    for it in range(max_iter):
        nxt = (
            sym.join(comp, sym.b == comp.id)
            .groupBy(F.col("a").alias("id"))
            .agg(F.min("component").alias("component"))
            .persist(StorageLevel.MEMORY_AND_DISK)
        )
        cur_sum = nxt.agg(
            F.sum(F.col("component").cast("decimal(38,0)"))).collect()[0][0]
        cached.unpersist()
        cached = nxt
        comp = nxt
        if cur_sum == prev_sum:
            break
        prev_sum = cur_sum
        # Lineage truncation every 8 rounds: even the single-reference
        # chain's per-iteration cost turns superlinear past ~10 nested
        # persist levels (measured at a depth-14 chain: iters 0-8 run
        # 0.3-0.8 s, then 1.5/2.1/3.8/8.4/17.8/60.3 s — the
        # unpersist-invalidated cache chain re-plans/re-executes ever
        # deeper lineage). A periodic eager localCheckpoint caps the
        # lineage depth at one segment. Shallow near-dup graphs
        # (2-5 rounds) never reach it, so the persist path — which
        # beats an every-iteration checkpoint 5.9 s vs 22.4 s at a
        # 1 M-edge star forest (stats/broadcast survive, no per-round
        # full re-store) — is untouched where it wins; a depth-14
        # chain drops 121 s -> 19 s with identical label maps
        # (scripts/components_ab.py regimes + the deep-chain test).
        if (it + 1) % 8 == 0:
            comp = comp.localCheckpoint(eager=True)
            cached.unpersist()
            cached = comp
    # Unpersisting sym/comp directly here would CASCADE: Spark's
    # CacheManager also evicts every cached plan containing the
    # unpersisted plan as a subplan — i.e. the result the caller is
    # about to read — forcing the whole iteration chain to re-execute
    # on first consumption (A/B r7: 1.7 s -> 4.8 s per
    # dedup_cluster_components call at sf0.1 with a bare unpersist(sym)
    # on this line). r7 therefore leaked the pairs-sized edge cache for
    # the session; r8 instead truncates lineage with an eager
    # localCheckpoint of the NODE-sized result (comp is already
    # materialized, so this is one cache scan), after which both caches
    # can be dropped safely. The checkpointed RDD itself is freed by the
    # ContextCleaner once the caller drops the returned frame — the
    # eviction-on-consumption semantics a registry sweep running several
    # dedup keys per session needs. (localCheckpoint trades executor-
    # loss recovery for zero-config lineage truncation; the loop above
    # already made that trade per-iteration via persist+count.)
    result = (comp.select(F.col("id").alias("doc_id"), "component")
              .localCheckpoint(eager=True))
    cached.unpersist()
    sym.unpersist()
    return result


# --- embedding cosine near-dup ---------------------------------------------------

def _lsh_block_planes(corpus_n: int) -> int:
    """Bucket-width policy for the LSH blocking: 2**n_planes buckets per
    band. The noise-collision term of the within-bucket self-join is
    ~N²/2**n_planes per band, so planes must track log2(N) at scale;
    small corpora (the driver fixtures) instead want FEW planes so recall
    stays total at the low-similarity thresholds the fixtures exercise
    (recall per pair at cosine c is 1-(1-p^r)^L with p = 1 - acos(c)/π —
    r=4/L=16 is measured total at τ=0.5 on all three fixture SFs,
    tests/test_pipeline.py)."""
    if corpus_n < 50_000:
        return 4
    planes = 12
    while (1 << planes) < corpus_n and planes < 24:
        planes += 1
    return planes


def _lsh_bucket_vectors(embeddings: DataFrame, n_planes: int, n_tables: int,
                        dim: int) -> DataFrame:
    """(vec_id, buckets array<long>[n_tables]) — every band's bucket id
    in ONE row per vector; bucket t is that band's n_planes sign bits
    against similarity.py's deterministic md5 hyperplanes. numpy per
    batch: for each plane, (X * p).sum(axis=1) — the reduced axis has
    fixed length dim, so numpy's pairwise summation gives every row the
    SAME ieee result whatever the batch size (partition-count-
    independent buckets)."""
    import numpy as np
    import pandas as pd

    from database_syncer_spark.pipeline import similarity as S

    flat = np.array(
        [row for t in range(n_tables)
         for row in S._hyperplanes(n_planes, dim, t)])  # (T*r, dim)
    weights = (1 << np.arange(n_planes, dtype=np.int64))

    def gen(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            X = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
            bits = np.empty((len(pdf), len(flat)), dtype=np.int64)
            for j in range(len(flat)):
                bits[:, j] = (X * flat[j]).sum(axis=1) > 0
            buckets = bits.reshape(len(pdf), n_tables, n_planes) @ weights
            yield pd.DataFrame({
                "vec_id": pdf["vec_id"].to_numpy(),
                "buckets": list(buckets),
            })

    return embeddings.select("vec_id", "embedding").mapInPandas(
        gen, "vec_id long, buckets array<long>")


def _lsh_band_rows(bucketed: DataFrame) -> DataFrame:
    """Explode a bucket-vector frame into per-band join rows
    (vec_id, buckets, tbl, bucket). The Generate carries only the
    n_tables-long array — no unrolled kernels, no Janino risk."""
    return bucketed.select(
        "vec_id", "buckets",
        F.posexplode("buckets").alias("tbl", "bucket"))


def _first_collision(a: str, b: str, n_tables: int) -> Column:
    """True iff this band is the FIRST where sides `a` and `b` share a
    bucket: for every earlier band s < tbl, a.buckets[s] != b.buckets[s].
    Replaces pair DISTINCT after the per-band self-join — each colliding
    pair survives in exactly one band, so no candidate-volume-sized
    exchange is needed (the r7 1 M-vector probe put the distinct at the
    top of the profile: ~8× candidate multiplicity on dense near-dup
    clusters shuffled ~2 B rows to dedupe ~250 M pairs)."""
    cond = F.lit(True)
    for s in range(n_tables - 1):
        cond = cond & ((F.col("tbl") <= F.lit(s))
                       | (F.col(f"{a}.buckets")[s]
                          != F.col(f"{b}.buckets")[s]))
    return cond


def _lsh_params(frame: DataFrame, n_planes: int | None,
                n_tables: int | None,
                corpus_n: int | None) -> tuple[int, int, int | None]:
    """One defaulting ladder for BOTH blocking callers
    (embedding_near_dup and embedding_incremental_near_dup must block
    identically or the shared recall pin stops covering the incremental
    path): count once if needed, planes from _lsh_block_planes, tables
    16 in the fixture regime / 8 at scale. Also returns the resolved
    corpus count (None only when both params were passed explicitly
    AND no count was supplied) so callers can size the probe-side
    partitioning from it (:func:`_probe_partitions`)."""
    if n_planes is None or n_tables is None:
        if corpus_n is None:
            corpus_n = frame.count()
        if n_planes is None:
            n_planes = _lsh_block_planes(corpus_n)
        if n_tables is None:
            n_tables = 16 if corpus_n < 50_000 else 8
    return n_planes, n_tables, corpus_n


def _probe_partitions(frame: DataFrame, n_planes: int, n_tables: int,
                      corpus_n: int | None) -> int:
    """Partition count for the band join's PROBE side (guide §2.5: AQE
    cannot see a join's output multiplication — it sizes partitions from
    input bytes). The band self-join multiplies its skinny input by the
    per-bucket pair volume (noise term ~N²/2^planes per table), and at
    fixture scale the upstream is a 1-4-split parquet scan whose
    partitioning flows straight through the BroadcastHashJoin — so the
    whole candidate expansion AND the unrolled exact-cosine verify ran
    in ≤4 tasks (measured: dedup_embedding_cosine 29.7 s at sf0.1 /
    2000 vectors, scripts/opt_profile_sf0.1.json). Size from the
    expected collision volume instead: ~200k candidate pairs per task,
    floored at defaultParallelism (fill the machine even when the
    estimate is small), capped at 4096 (one task per ~200k pairs is
    already generous at scale; beyond the cap per-task volume grows,
    which sort-merge handles by spilling)."""
    sc = frame.sparkSession.sparkContext
    dp = sc.defaultParallelism
    if corpus_n is None:
        return dp
    est = n_tables * corpus_n * corpus_n // (2 ** n_planes)
    return int(min(4096, max(dp, est // 200_000)))


def embedding_near_dup(embeddings: DataFrame, threshold: float = 0.5,
                       dim: int = 64, n_planes: int | None = None,
                       n_tables: int | None = None,
                       corpus_n: int | None = None,
                       block_col: str | None = None) -> DataFrame:
    """Vector near-dup pairs (round-6dp cosine >= threshold), blocked by
    random-hyperplane LSH buckets (similarity.py's deterministic md5
    planes) instead of a data column: candidate volume tracks the true
    near-dup pair count plus an N²/2**n_planes-per-band noise term, not
    the quadratic within-block blowup a label/category block gives
    (measured 2.5x rows -> 4.6x wall, ~9 h extrapolated at 1 M vectors —
    the r6 SCALE.md finding this rewrite kills).

    RECALL REGIME: below 50 k vectors the 4-plane/16-table policy makes
    recall TOTAL at τ=0.5 on the fixtures (pinned by
    tests/test_pipeline.py::test_embedding_lsh_blocking_recall_total);
    at >=50 k vectors _lsh_params switches to log2(N) planes / 8 tables,
    which keeps the noise term ~N per band but concentrates recall on
    the high-similarity regime real dedup thresholds live in (cosine
    0.99 pairs: >=0.99 at 1 M; cosine ~0.5 pairs: effectively 0 — the
    inherent LSH trade; callers needing mid-similarity recall at scale
    must raise n_tables or use the exact ``block_col`` variant).

    Band join rows carry (vec_id, buckets[n_tables], tbl, bucket) —
    (2+n_tables)×8 bytes, embedding-free — so the self-join ships no
    payload; the full bucket vector rides along because dedup across
    bands is the _first_collision FILTER, not a pair distinct.
    Embeddings are re-fetched candidate-sized for the exact cosine
    verify. ``block_col`` keeps the exact within-column variant (the old
    default) for oracle/exactness use.

    .. versionchanged:: r7
       Defaults changed semantics: ``threshold`` 0.9 -> 0.5 and
       ``block_col`` ``"label"`` -> ``None`` (hyperplane-LSH blocking
       instead of exact label blocks). Callers relying on the old exact
       label-blocked behavior must now pass ``block_col="label",
       threshold=0.9`` explicitly — with LSH blocking the emitted pair
       set is recall-total only in the regimes documented above."""
    from database_syncer_spark.pipeline import vector as V

    e = embeddings.select(
        "vec_id", "embedding", V.norm("embedding", dim).alias("nrm"))

    if block_col is not None:
        blocked = embeddings.select(
            "vec_id", F.col(block_col).alias("block"))
        a, b = blocked.alias("a"), blocked.alias("b")
        pairs = (
            a.join(b, "block")
            .where(F.col("a.vec_id") < F.col("b.vec_id"))
            .select(F.col("a.vec_id").alias("vec_a"),
                    F.col("b.vec_id").alias("vec_b")))
    else:
        n_planes, n_tables, corpus_n = _lsh_params(
            embeddings, n_planes, n_tables, corpus_n)
        # All n_tables band buckets in ONE Arrow-batched mapInPandas pass.
        # The unrolled-expression alternatives both fail here: explode(
        # array(struct(<16 band kernels>))) inlines 4096 product terms
        # into one generate_doConsume and blows Janino's 64 KB method
        # limit (the r6 sim_lsh_ann defect), and a 16-branch select+union
        # serializes a ~4k-term interpreted tree into EVERY task binary —
        # measured OOM at task DESERIALIZATION (ObjectInputStream handle
        # table) with 8 concurrent tasks on a 1 GiB heap, on a 500-row
        # fixture. A 64×64 sign-projection is one numpy GEMV per batch:
        # the serialized plan is KBs (planes travel as a closure
        # constant), the executor work is vectorized, and the per-row
        # dot uses a fixed-axis pairwise sum so a row's sign bits are
        # independent of batch boundaries (partition-count-independent
        # buckets — the same determinism rule the ANN model state pins).
        # Each pair is emitted ONLY from its first colliding band
        # (_first_collision) instead of DISTINCT over the per-band join
        # output — the join rows carry each side's full bucket vector
        # (n_tables longs) so the dedup is a codegen'd filter, not a
        # candidate-volume-sized exchange.
        # Explicit-count repartition on the join key: user-specified
        # counts survive AQE coalescing, so the pair expansion + verify
        # run at collision-volume-sized parallelism instead of the
        # scan's split count (guide §2.5; measured 29.7 s -> see
        # OPTIMIZATION_r12.md). Keyed on (tbl, bucket) so a shuffle
        # join at scale reuses this exchange outright.
        skinny = _lsh_band_rows(
            _lsh_bucket_vectors(embeddings, n_planes, n_tables, dim)
        ).repartition(
            _probe_partitions(embeddings, n_planes, n_tables, corpus_n),
            "tbl", "bucket")
        a, b = skinny.alias("a"), skinny.alias("b")
        pairs = (
            a.join(b, ["tbl", "bucket"])
            .where((F.col("a.vec_id") < F.col("b.vec_id"))
                   & _first_collision("a", "b", n_tables))
            .select(F.col("a.vec_id").alias("vec_a"),
                    F.col("b.vec_id").alias("vec_b")))

    dot = V.dot("ea.embedding", "eb.embedding", dim)
    cos = dot / (F.col("ea.nrm") * F.col("eb.nrm"))
    return (
        pairs
        .join(e.alias("ea"), F.col("vec_a") == F.col("ea.vec_id"))
        .join(e.alias("eb"), F.col("vec_b") == F.col("eb.vec_id"))
        .select("vec_a", "vec_b", F.round(cos, 6).alias("cosine"))
        .where(F.col("cosine") >= threshold)
    )


def embedding_incremental_near_dup(batch: DataFrame, corpus: DataFrame,
                                   threshold: float = 0.5, dim: int = 64,
                                   n_planes: int | None = None,
                                   n_tables: int | None = None,
                                   corpus_n: int | None = None) -> DataFrame:
    """Ingest-time embedding dedup — incremental_near_dups' shape for the
    vector modality: every BATCH vector checked against the EXISTING
    corpus only, candidates blocked by the same hyperplane-LSH band
    buckets as embedding_near_dup (at rest the corpus side is
    precomputed and partitioned by (tbl, bucket), so a daily batch
    shuffles only its own bands and its collision volume — never the
    corpus). Output: one verdict row per batch vector
    (vec_id, n_dups, max_cosine, novel); every aggregate is computed
    over the EXACT-cosine-verified pairs >= threshold only, so the rows
    are blocking-independent wherever blocking recall is total (the
    fixture regime — pinned in tests) and the exhaustive batch×corpus
    SQL is a complete oracle."""
    from database_syncer_spark.pipeline import vector as V

    n_planes, n_tables, corpus_n = _lsh_params(
        corpus, n_planes, n_tables, corpus_n)
    # First-collision emit instead of pair DISTINCT, same as
    # embedding_near_dup: dedup is a codegen'd filter over the carried
    # bucket vectors, never a candidate-volume-sized exchange.
    bb = _lsh_band_rows(
        _lsh_bucket_vectors(batch, n_planes, n_tables, dim)).alias("a")
    # Corpus side is the join's probe side (the batch side broadcasts):
    # same explicit-count repartition as embedding_near_dup so the
    # batch×corpus candidate expansion doesn't inherit the corpus
    # scan's 1-4 splits (guide §2.5). The corpus²-based estimate
    # overstates a batch probe's collision volume — the floor/cap
    # clamp keeps that harmless.
    bc = (_lsh_band_rows(
        _lsh_bucket_vectors(corpus, n_planes, n_tables, dim))
        .repartition(
            _probe_partitions(corpus, n_planes, n_tables, corpus_n),
            "tbl", "bucket")
        .withColumnRenamed("vec_id", "corpus_id").alias("b"))
    cand = (bb.join(bc, ["tbl", "bucket"])
            .where(_first_collision("a", "b", n_tables))
            .select("vec_id", "corpus_id"))
    # Fetch embeddings by joining cand with the full (vec_id, embedding,
    # nrm) projections directly — the same shape as embedding_near_dup.
    # An earlier form pre-pruned each side with a semi-join on cand's
    # distinct ids, which referenced the UNPERSISTED cand subtree three
    # times (hits + two id sets) and re-ran the whole candidate join per
    # reference (r7 review finding); cand is consumed exactly once here.
    eb = batch.select(
        "vec_id", "embedding", V.norm("embedding", dim).alias("nrm"))
    ec = corpus.select(
        F.col("vec_id").alias("corpus_id"),
        F.col("embedding").alias("c_embedding"),
        V.norm("embedding", dim).alias("c_nrm"))
    cos = F.round(
        V.dot("embedding", "c_embedding", dim)
        / (F.col("nrm") * F.col("c_nrm")), 6)
    hits = (cand.join(eb, "vec_id").join(ec, "corpus_id")
            .select("vec_id", cos.alias("cosine"))
            .where(F.col("cosine") >= threshold)
            .groupBy("vec_id")
            .agg(F.count("*").alias("n_dups"),
                 F.max("cosine").alias("max_cosine")))
    # LEFT from the batch side: a vector with zero collisions must emit
    # a novel row, not silently vanish (the ann_recall lesson).
    return (batch.select("vec_id").join(hits, "vec_id", "left")
            .select("vec_id",
                    F.coalesce("n_dups", F.lit(0)).alias("n_dups"),
                    "max_cosine",
                    (F.coalesce("n_dups", F.lit(0)) == 0).alias("novel")))
