#!/usr/bin/env python
"""Per-round benchmark: headline queries at $SPARK_GRAFT_SF_DIR.

Prints ONE JSON line:
  {"metric": "...", "value": total_sec, "unit": "sec",
   "queries": {key: sec, ...}, "sf": 0.1}

Each query is materialized through the built-in `noop` sink so the full
plan executes on the executors (scan -> shuffle -> agg) without paying
driver-side collect/serialization — the same discipline a cluster bench
would use.  Per key: two untimed warmup executions, then the MEDIAN of
five timed executions (secondary keys: three — they are heavy and not
part of the headline total).  The warmups absorb the per-plan one-time costs
that belong to the JVM, not the engine — whole-stage-codegen Janino
compilation and C2 JIT of the generated methods (measured on the CDC
diff at sf0.1: 6.2s first execution, 1.4s second, ~0.8s steady state —
one warmup still over-reports by ~1.6x) — and the median rejects
page-cache-cold first touches and GC outliers, so the reported number
is steady-state plan execution, which is what scales to a real cluster.
The JSON line carries "methodology" so cross-round trend tracking knows
what the numbers mean.

Headline set: one key per engine area from SURVEY.md §2 — CDC diff
(the reference's soul), star join, TPC-H-Q1-shape agg, window, set op,
dump ingest, streaming batch-shape, and the LLM-pipeline operators
(exact + MinHash dedup, top-k cosine, text stats).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HEADLINE = [
    "diff_cdc_fullouter",     # snapshot diff: full-outer join + classify
    "join_multiway_star",     # lineitem ⋈ orders ⋈ customer ⋈ nation ⋈ region
    "agg_multi_measures",     # TPC-H Q1 shape on lineitem
    "agg_approx_distinct",    # HLL sketch
    "win_rank_topn_per_group",
    "set_except",
    "scan_sql_dump",          # distributed dump ingest (text -> typed rows)
    "stream_tumbling_agg",    # windowed agg, batch shape
    "dedup_exact",
    "dedup_minhash_lsh",      # shingle -> minhash -> band -> bucket join
    "sim_topk_cosine",        # brute-force ANN baseline
    "text_quality_score",
]

# r11 headline rotation (VERDICT r10 item 7): the 12-key HEADLINE set
# was frozen at r1 and no longer spans the registry. These three are
# timed with the FULL headline discipline (2 warmups, median of 5, raw
# runs recorded) but kept OUT of "value" so the 12-key total stays
# directly comparable across rounds r1..r10.
HEADLINE_EXT = [
    "scan_pg_dump",               # pg COPY-protocol ingest
    "win_retention_cohort",       # cohort window + conditional agg
    "corpus_curate_incremental",  # ingest-time curation verdict
    # r12 rotation (VERDICT r11 item 6): the newest families accrue
    # trend history on the full headline discipline from birth
    "multimodal_jpeg_pixels",     # baseline-JPEG Huffman+IDCT decode
    "dedup_incremental_indexed",  # at-rest bucketed band-index probe
    #   (moved up from SECONDARY r12 — the ext discipline's 2-warmup/
    #   5-rep record is the stricter trend instrument)
]

# CPU-scaling sentinel (VERDICT r12 item 2): every 12-key HEADLINE
# entry is sub-1.2 s at sf0.1 — scheduling/barrier-bound, so the
# driver's 32-vs-8-core comparison over `queries` reads ≈1.0 for all
# of them and the honored $SPARK_GRAFT_CPUS contract looks broken
# ("suspect_cpus_ignored"). dedup_embedding_cosine is genuinely
# CPU-bound (measured 12.17 s @ 8 cores vs 5.58 s @ 32, BENCH_r12_c8),
# so timing it on the full headline discipline and reporting it INSIDE
# "queries" — while keeping "value" the sum of the original 12 keys so
# the headline total stays r1-comparable — makes the scaling contract
# legible in the surface the driver actually compares.
SCALING_SENTINEL = ["dedup_embedding_cosine"]

# Heaviest non-headline families, tracked so a regression is visible
# BEFORE a round touches them. Kept out of HEADLINE/"value" so the
# headline total stays directly comparable across rounds (BENCH_r01
# covers exactly the 12 keys above).
SECONDARY = [
    "stream_foreachbatch_merge",   # real micro-batch MERGE replay
    "stream_stateful_custom",      # applyInPandasWithState job
    "dedup_cluster_components",    # iterative label propagation
    "dedup_simhash",               # block-permutation candidate join
    "sim_lsh_ann",                 # hyperplane LSH + re-rank
    "sim_ivf_ann",                 # IVF cells + re-rank
    "sink_merge_executor",         # script apply through DuckDB
    "sim_pq_ann",                  # PQ codebooks + ADC scan + re-rank
    "sim_ivfpq_ann",               # composed IVF-PQ (probe + ADC + re-rank)
    "stream_stream_join",          # watermarked stream-stream join replay
    "dedup_corpus_keep",           # exact + near-dup + components keep-list
    # r4 additions, tracked from birth so their first regression is visible
    "win_sessionize",              # gap sessionization, single Exchange
    "text_ngram_lm_score",         # corpus-bigram LM scoring
    "sink_cdc_compact",            # two diffs + pk-keyed compaction agg
    "dedup_incremental",           # batch-vs-corpus banded LSH
    # r5 additions
    "sample_temperature_mix",      # domain-rebalanced sampling
    "dedup_soft_keep",             # components + 1/cluster down-weighting
    # r8 additions
    "dedup_paragraph",             # repeated-span scrub (chunk freq + keep-first)
    "corpus_curate",               # composed filter→scrub→dedup→pack pipeline
    # r10 additions
    "sink_merge_incremental",      # set-based CDC merge batches + replay
    # corpus_curate_incremental moved to HEADLINE_EXT (r11): it was
    # double-timed here AND there (11 executions of one of the heaviest
    # keys per bench); the ext slot's 2-warmup/5-rep discipline is the
    # stricter record
    # r11 addition dedup_incremental_indexed moved to HEADLINE_EXT (r12)
    # r12 additions
    "dedup_incremental_rolling",   # two-day admit-and-grow index loop
    "stream_dedup_rolling",        # the same loop as streaming foreachBatch
    "sim_ivf_incremental",         # frozen-centroid vector-index append
    # r12 optimization round addition dedup_embedding_cosine (tracked
    # from birth after the probe-side repartition fix, 29.7 s -> 5.6 s,
    # OPTIMIZATION_r12.md) moved to SCALING_SENTINEL (r13): it is now
    # timed on the full headline discipline and reported inside
    # "queries" (still excluded from "value") so the driver's CPU
    # scaling comparison sees it — double-timing it here too would
    # repeat the corpus_curate_incremental mistake r11 fixed.
]


def _host_probe(spark) -> dict:
    """Fixed-work, code-independent host calibration (VERDICT r10
    item 2): every BENCH artifact carries the host phase measured by
    the SAME pinned work, so cross-round per-key ratios read against
    `host_probe_sec` instead of relitigating the bimodal disk each
    round (three rounds running, the bench verdict section was
    dominated by exactly that).

    - ``cpu_runs``: 8M x 1M shuffle join + groupBy agg over
      spark.range — pure JVM/Tungsten work, zero repo code, zero
      disk. Sorted triple; median rejects the codegen first run.
    - ``disk_runs``: write a pinned incompressible ~330 MB parquet
      (xxhash64 columns over spark.range) to a fresh local dir, then
      os.sync() — times actual writeback, the phase the host's
      bimodal disk modulates. Sorted pair (it is the expensive half).
    - ``sec``: cpu median + disk min — the per-run scalar the machine
      record carries.
    """
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    def cpu_run() -> float:
        t0 = time.perf_counter()
        # pmod-bounded so the 8M-row sum can't overflow a long (the
        # session runs ANSI mode: overflow is an error, not a wrap)
        b = (spark.range(0, 1_000_000, 1, 32)
             .select(F.col("id").alias("bid"),
                     F.pmod(F.xxhash64("id"), F.lit(1_000_003)).alias("v")))
        (spark.range(0, 8_000_000, 1, 32)
         .withColumn("k", F.col("id") % 1_000_000)
         .join(b, F.col("k") == F.col("bid"))
         .groupBy((F.col("k") % 97).alias("g"))
         .agg(F.sum("v").alias("s"), F.count("*").alias("n"))
         .write.format("noop").mode("overwrite").save())
        return time.perf_counter() - t0

    cpu_runs = sorted(round(cpu_run(), 3) for _ in range(3))

    def disk_run() -> float:
        d = tempfile.mkdtemp(prefix="dss_host_probe_")
        try:
            t0 = time.perf_counter()
            (spark.range(0, 16_000_000, 1, 32)
             .select("id", F.xxhash64("id").alias("h1"),
                     F.xxhash64("id", "id").alias("h2"))
             .write.mode("overwrite").parquet(os.path.join(d, "p")))
            os.sync()
            return time.perf_counter() - t0
        finally:
            shutil.rmtree(d, ignore_errors=True)

    disk_runs = sorted(round(disk_run(), 3) for _ in range(2))
    return {"cpu_runs": cpu_runs, "disk_runs": disk_runs,
            "sec": round(cpu_runs[1] + disk_runs[0], 3)}


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    try:
        sf = float(os.path.basename(sf_dir.rstrip("/")).removeprefix("sf"))
    except ValueError:
        sf = None

    from database_syncer_spark.session import get_spark
    from database_syncer_spark.registry import all_queries

    spark = get_spark("bench")
    spark.sparkContext.setLogLevel("ERROR")
    queries = all_queries()

    # Warm the JVM + parquet footer caches on the smallest table so the
    # first timed key doesn't absorb one-time session costs.
    spark.read.parquet(os.path.join(sf_dir, "region.parquet")).count()
    # Warm the Python worker pool + Arrow serializer path the same way:
    # UDF-backed keys should time steady-state execution, not the one-time
    # fork of 32 interpreters (~5s measured on local[32]).
    spark.range(0, 64, 1, 32).mapInPandas(lambda it: it, "id long").count()
    # And the text-source scan path used by the dump source: its first use
    # loads the file-source classes — a one-statement probe file pays that
    # outside the timings.
    import tempfile

    from database_syncer_spark.sources.dump import read_dump_statements
    probe = os.path.join(tempfile.gettempdir(), "dss_bench_warm.sql")
    with open(probe, "w", encoding="utf-8") as fh:
        fh.write("SELECT 1;\n")
    read_dump_statements(spark, probe).count()

    def time_keys(keys: list[str], warmups: int, reps: int,
                  raw: dict[str, list[float]] | None = None,
                  ) -> dict[str, float]:
        out: dict[str, float] = {}
        for key in keys:
            fn = queries.get(key)
            if fn is None:
                continue

            def run() -> float:
                t0 = time.perf_counter()
                fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
                return time.perf_counter() - t0

            for _ in range(warmups):  # codegen/JIT + page cache
                run()
            runs = sorted(round(run(), 3) for _ in range(reps))
            out[key] = runs[reps // 2]
            if raw is not None:
                raw[key] = runs
        return out

    # Median of FIVE for the headline (was 3): this box shows sporadic
    # 2x per-key swings from co-tenant load; with 3 reps one spike lands
    # on the median, with 5 it takes three. Secondary keys are heavy, so
    # they stay at 3 reps — but their RAW run triple is recorded in the
    # detail artifact (r9 verdict item 1: a one-burst co-tenant outlier
    # like sim_lsh_ann's recorded 150.3 s must be self-diagnosing — a
    # [2.1, 2.2, 150.3] triple reads as a burst, a [148, 150, 153]
    # triple as a regression).
    probe_start = _host_probe(spark)
    timings = time_keys(HEADLINE, warmups=2, reps=5)
    scaling_sentinel = time_keys(SCALING_SENTINEL, warmups=2, reps=5)
    ext_runs: dict[str, list[float]] = {}
    headline_ext = time_keys(HEADLINE_EXT, warmups=2, reps=5, raw=ext_runs)
    secondary_runs: dict[str, list[float]] = {}
    secondary = time_keys(SECONDARY, warmups=1, reps=3, raw=secondary_runs)

    # ANN SERVING-ONLY timings (VERDICT r3 item 3): the sim_* registry
    # keys time ANN + exact brute force + recall join in one plan — a
    # verification artifact, so the metric ANN work should improve
    # (serving latency) was invisible. Time the *_ann_topk call alone
    # here; recall stays the correctness surface in the registry keys.
    from database_syncer_spark.catalog import load_table
    from database_syncer_spark.pipeline import similarity as S
    from database_syncer_spark.queries.pipeline import _emb_dim

    emb = load_table(spark, sf_dir, "embeddings")
    dim = _emb_dim(sf_dir, emb)

    # Train-once/serve-many (r4): a deployment builds each index ONCE
    # (model training + corpus coding — ann_index_build below), stores
    # the coded corpus at rest (persist+count here stands in for the
    # partitioned parquet), and serves queries against it. Serving
    # latency — the number ANN work should improve — is the index= path.
    ann_index_build: dict[str, float] = {}
    indexes: dict[str, dict] = {}
    corpus_keys = {"lsh": "bucketed", "ivf": "assigned",
                   "pq": "coded", "ivfpq": "coded"}
    builders = {
        "lsh": lambda: S.build_lsh_index(emb, dim=dim),
        "ivf": lambda: S.build_ivf_index(emb, dim=dim),
        "pq": lambda: S.build_pq_index(emb, dim=dim),
        "ivfpq": lambda: S.build_ivfpq_index(emb, dim=dim),
    }
    for name, build in builders.items():
        t0 = time.perf_counter()
        idx = build()
        corpus = idx[corpus_keys[name]].persist()
        corpus.count()          # materialize the at-rest artifact
        ann_index_build[name] = round(time.perf_counter() - t0, 3)
        indexes[name] = idx

    serving_fns = {
        "sim_topk_cosine_serve":
            lambda: S.brute_force_topk(emb, dim=dim),
        "sim_lsh_ann_serve":
            lambda: S.lsh_ann_topk(emb, dim=dim, index=indexes["lsh"]),
        "sim_ivf_ann_serve":
            lambda: S.ivf_ann_topk(emb, dim=dim, index=indexes["ivf"]),
        "sim_pq_ann_serve":
            lambda: S.pq_ann_topk(emb, dim=dim, index=indexes["pq"]),
        "sim_ivfpq_ann_serve":
            lambda: S.ivfpq_ann_topk(emb, dim=dim, index=indexes["ivfpq"]),
    }
    ann_serving: dict[str, float] = {}
    for skey, build in serving_fns.items():
        def srun() -> float:
            t0 = time.perf_counter()
            build().write.format("noop").mode("overwrite").save()
            return time.perf_counter() - t0
        srun()  # warmup
        ann_serving[skey] = round(sorted(srun() for _ in range(3))[1], 3)
    for idx in indexes.values():
        for name in corpus_keys.values():
            if name in idx:
                idx[name].unpersist()

    # Previous-round totals, so the regression gate is visible in the
    # artifact itself (BENCH_r01: 12-key headline total 8.13s at sf0.1).
    prev: dict[str, float] = {}
    import glob as _glob
    here = os.path.dirname(os.path.abspath(__file__))
    for p in sorted(_glob.glob(os.path.join(here, "BENCH_r*.json"))):
        try:
            with open(p, encoding="utf-8") as fh:
                d = json.load(fh)
            # the round driver wraps our JSON line under "parsed"
            prev[os.path.basename(p)] = d.get("parsed", d).get("value")
        except (OSError, ValueError, AttributeError):
            pass

    total = round(sum(timings.values()), 3)

    # VERDICT r5 defect #1: the driver tail-captures stdout and parses the
    # LAST line as the machine record; r5's single line (with its embedded
    # methodology narrative) outgrew that buffer and BENCH_r05.json came
    # back `parsed: null`. Split the output:
    #   line 1  — full detail (methodology, prev_totals, secondary, ANN
    #             splits), also written to BENCH_DETAIL_LAST.json so the
    #             narrative survives even if the tail truncates it;
    #   line 2  — the compact machine record, guaranteed < 2 KB, LAST.
    probe_end = _host_probe(spark)

    # Probe-normalized per-key ratios (VERDICT r11 item 7): key_sec /
    # mean(host_probe start, end sec). The next round's regression
    # screen is then a division against the previous round's normalized
    # value instead of an adjudication debate — a key whose RAW seconds
    # doubled but whose ratio held ran on a slow host, not slow code.
    probe_mean = round((probe_start["sec"] + probe_end["sec"]) / 2, 3)
    normalized = {
        k: round(v / probe_mean, 3)
        for block in (timings, scaling_sentinel, headline_ext, secondary)
        for k, v in block.items()}

    detail = {
        "metric": "bench_detail",
        "prev_totals": prev,
        "host_probe": {"start": probe_start, "end": probe_end},
        "probe_mean_sec": probe_mean,
        "normalized": normalized,
        "headline_ext": headline_ext,
        "headline_ext_runs": ext_runs,
        "secondary": secondary,
        "secondary_runs": secondary_runs,
        "ann_index_build": ann_index_build,
        "ann_serving": ann_serving,
        "methodology": (
            "noop-sink; headline: 2 warmups, median of 5 timed (r01 used "
            "median of 3); secondary (not in value): 1 warmup, median of "
            "3, RAW sorted triple in secondary_runs (a lone outlier run "
            "is a co-tenant burst, three elevated runs a regression); "
            "ann_serving: the *_ann_topk serving call against a "
            "PREBUILT persisted index (train-once/serve-many; "
            "ann_index_build is the one-time train+code cost), 1 warmup "
            "median of 3 — the sim_* secondary keys time inline-build "
            "serving + brute-force verify + recall join and so overstate "
            "serving cost by design. headline_ext (r11): three "
            "rotated-in keys on the FULL headline discipline, kept out "
            "of value so the 12-key total stays r1-comparable. "
            "queries additionally carries dedup_embedding_cosine (r13): "
            "the CPU-bound scaling sentinel, full headline discipline, "
            "EXCLUDED from value — value stays the sum of the original "
            "12 HEADLINE keys; the sentinel exists so the driver's "
            "32-vs-8-core ratio over queries has one key that actually "
            "scales with cores. "
            "host_probe: fixed-work code-independent calibration "
            "(shuffle-join CPU triple + synced ~330MB parquet write "
            "pair) at bench start and end — read per-key ratios "
            "against it before calling a regression. Host shows "
            "±30-45% uniform cross-round drift; same-host A/B on "
            "pinned fixtures (BASELINE.md) is the regression arbiter. "
            "Per-round adjudications live in BASELINE.md / SCALE.md, "
            "not here."),
    }
    # The effective parallelism contract, in the machine record itself
    # (VERDICT r12 item 1/"what's wrong"): session.py honors
    # $SPARK_GRAFT_CPUS via master(local[cpus]) but the driver could
    # not SEE that from the artifact — emit master + defaultParallelism
    # so a scaling run is self-describing.
    sc = spark.sparkContext
    machine = {
        "metric": "headline_queries_total_wall",
        "value": total,
        "unit": "sec",
        # queries = the 12 HEADLINE keys (their sum IS "value") + the
        # CPU-bound scaling sentinel, timed on the same discipline but
        # EXCLUDED from "value" so the total stays r1-comparable.
        # Entries are only ever ADDED here, never removed or renamed.
        "queries": {**timings, **scaling_sentinel},
        "headline_ext": headline_ext,
        "host_probe_sec": probe_start["sec"],
        "secondary": secondary,
        "ann_index_build": ann_index_build,
        "ann_serving": ann_serving,
        "master": sc.master,
        "default_parallelism": sc.defaultParallelism,
        "cpus_env": os.environ.get("SPARK_GRAFT_CPUS"),
        "sf": sf,
    }
    line = json.dumps(machine)
    if len(line) > 1900:  # never regress the tail-parse again
        # mark the elision (r6 ADVICE): a consumer of the last line must
        # be able to tell "dropped for size" from "not measured", and
        # where the full record lives
        line = json.dumps({**{k: machine[k] for k in
                              ("metric", "value", "unit", "queries",
                               "host_probe_sec", "master",
                               "default_parallelism", "sf")},
                           "truncated": True,
                           "detail": "BENCH_DETAIL_LAST.json"})
    try:
        with open(os.path.join(here, "BENCH_DETAIL_LAST.json"), "w",
                  encoding="utf-8") as fh:
            json.dump({**detail, **machine,
                       "metric": "headline_queries_total_wall"}, fh, indent=1)
    except OSError:
        pass
    print(json.dumps(detail))
    print(line)


if __name__ == "__main__":
    main()
