"""Streaming execution helpers: file replay, memory-sink runs, and the
foreachBatch incremental-sync loop (the reference's diff, incrementalized).
"""

from __future__ import annotations

import os
import shutil
import tempfile
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _staging_complete(path: str, n_files: int) -> bool:
    return (os.path.exists(os.path.join(path, "_SUCCESS"))
            and sum(f.endswith(".parquet")
                    for f in os.listdir(path)) == n_files)


def _publish_staging(tmp: str, path: str, n_files: int) -> str:
    """Atomically move a finished staging dir into place (mirrors the
    dump cache's tmp+os.replace pattern — ADVICE r2: fixed-path rmtree
    plus in-place write let one process delete or half-read a staging
    another process was still writing). os.rename fails if ``path``
    appeared concurrently; accept the winner's copy if it is complete."""
    try:
        os.rename(tmp, path)
    except OSError:
        if not _staging_complete(path, n_files):
            raise
        shutil.rmtree(tmp, ignore_errors=True)
    return path


def stage_as_stream_source(df: DataFrame, path: str, n_files: int = 5,
                           reuse: bool = False) -> str:
    """Write a DataFrame as N parquet files for file-by-file stream replay
    (FIXTURES.md §B3). Arrival order across files is arbitrary.

    ``reuse=True`` skips the write when ``path`` already holds a completed
    staging (Spark's own ``_SUCCESS`` marker plus the expected file count)
    — callers whose ``df`` is a pure function of an immutable fixture
    (the driver's correctness keys) pay the staging job once per machine
    instead of once per call. Pass ``reuse=False`` (default) whenever the
    input can change between calls. Writes land in a unique temp dir and
    are renamed into place, so concurrent stagers race safely."""
    if os.path.exists(path):
        if reuse and _staging_complete(path, n_files):
            return path
        shutil.rmtree(path)
    tmp = f"{path}.tmp{os.getpid()}"
    df.repartition(n_files).write.mode("overwrite").parquet(tmp)
    return _publish_staging(tmp, path, n_files)


def stage_as_stream_source_ordered(df: DataFrame, path: str, n_files: int = 5,
                                   order_col: str = "ts",
                                   reuse: bool = False) -> str:
    """Stage N files in EVENT-TIME order (file i holds the i-th time
    quantile, written sequentially so the file source replays them in
    arrival order). Required for watermark tests: with out-of-order
    replay a watermark legitimately drops late rows. ``reuse`` and the
    atomic tmp+rename publish as in :func:`stage_as_stream_source`
    (each sequential append leaves one part file, so the file count
    check holds here too)."""
    from pyspark.sql import Window as W

    if os.path.exists(path):
        if reuse and _staging_complete(path, n_files):
            return path
        shutil.rmtree(path)
    tmp = f"{path}.tmp{os.getpid()}"
    if os.path.exists(tmp):
        shutil.rmtree(tmp)
    chunked = df.withColumn(
        "__chunk", F.ntile(n_files).over(W.orderBy(order_col)))
    for i in range(1, n_files + 1):
        (chunked.where(F.col("__chunk") == i).drop("__chunk")
         .coalesce(1).write.mode("append").parquet(tmp))
    return _publish_staging(tmp, path, n_files)


def stage_as_stream_source_grouped(df: DataFrame, path: str,
                                   group_preds: list,
                                   reuse: bool = False) -> str:
    """Stage one file PER GROUP predicate, files written sequentially so
    the file source (maxFilesPerTrigger=1, mtime-ordered like the
    ordered stager) replays micro-batch k == group k exactly. For
    replays whose SEMANTICS depend on batch composition (e.g. rolling
    ingest: batch 2 must probe what batch 1 admitted), the ntile
    chunkers are wrong — a row-count boundary can split a group across
    batches. ``reuse`` and the atomic tmp+rename publish as in
    :func:`stage_as_stream_source`."""
    n_files = len(group_preds)
    if os.path.exists(path):
        if reuse and _staging_complete(path, n_files):
            return path
        shutil.rmtree(path)
    tmp = f"{path}.tmp{os.getpid()}"
    if os.path.exists(tmp):
        shutil.rmtree(tmp)
    for pred in group_preds:
        df.where(pred).coalesce(1).write.mode("append").parquet(tmp)
    return _publish_staging(tmp, path, n_files)


#: RocksDB is the session default for every stateful streaming run (r6
#: verdict item 4): the default HDFS-backed provider keeps every
#: partition's state map ON HEAP — at 100-TB event volumes that is the
#: executor OOM — while RocksDB bounds state to off-heap block cache +
#: local SSD with the same exactly-once semantics. At probe scale the two
#: measure within noise (scripts/state_store_probe.py: 10 M events), so
#: the bounded-memory provider is strictly the better default; pass
#: ``state_store_provider=None`` to run on whatever the session has.
ROCKSDB_PROVIDER = ("org.apache.spark.sql.execution.streaming.state."
                    "RocksDBStateStoreProvider")
_PROVIDER_KEY = "spark.sql.streaming.stateStore.providerClass"


def run_stream_to_memory(
    spark: SparkSession,
    source_path: str,
    schema,
    shape: Callable[[DataFrame], DataFrame],
    query_name: str,
    output_mode: str = "complete",
    max_files_per_trigger: int = 1,
    shuffle_partitions: int | None = None,
    state_store_provider: str | None = ROCKSDB_PROVIDER,
) -> DataFrame:
    """Replay a staged parquet dir through ``shape`` as a real streaming
    query (memory sink), synchronously to completion; return the sink.

    ``shuffle_partitions``: stateful operators build one state-store
    instance PER shuffle partition PER micro-batch; replaying a tiny
    fixture with the session's batch-tuned partition count (32 on the
    bench host) pays 32x the state-store maintenance for no parallelism.
    The override is applied for the query's planning only and restored
    immediately (streaming queries pin their partitioning at start).
    ``state_store_provider`` is pinned the same way (default RocksDB —
    see :data:`ROCKSDB_PROVIDER`)."""
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(source_path)
    )
    conf_key = "spark.sql.shuffle.partitions"
    prev = spark.conf.get(conf_key)
    prev_provider = spark.conf.get(_PROVIDER_KEY, None)
    if shuffle_partitions is not None:
        spark.conf.set(conf_key, str(shuffle_partitions))
    if state_store_provider is not None:
        spark.conf.set(_PROVIDER_KEY, state_store_provider)
    try:
        q = (
            shape(stream)
            .writeStream.outputMode(output_mode)
            .format("memory")
            .queryName(query_name)
            .start()
        )
    finally:
        if shuffle_partitions is not None:
            spark.conf.set(conf_key, prev)
        if state_store_provider is not None:
            if prev_provider is None:
                spark.conf.unset(_PROVIDER_KEY)
            else:
                spark.conf.set(_PROVIDER_KEY, prev_provider)
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.table(query_name)


def incremental_sync_foreachbatch(
    spark: SparkSession,
    changes: DataFrame,
    initial_state: DataFrame,
    pk_cols: list[str],
    n_chunks: int = 5,
    workdir: str | None = None,
    changes_path: str | None = None,
    reuse_changes: bool = False,
) -> DataFrame:
    """Incrementalized snapshot sync: stream CDC changes in micro-batches,
    each batch MERGEd into the running state via foreachBatch.

    This is the reference's one-shot diff-apply (sync.py:304-437) turned
    into a continuously-applying pipeline: at scale the 'state' is a
    Delta/Iceberg table and apply_changes becomes MERGE INTO; here state
    versions are parquet snapshots (no table format jars in the image).
    Each change-PK appears exactly once, so the final state is independent
    of how the stream is chunked.
    """
    from database_syncer_spark.core.diff import apply_changes

    workdir = workdir or tempfile.mkdtemp(prefix="dss_sync_stream_")
    src = stage_as_stream_source(
        changes, changes_path or os.path.join(workdir, "changes"),
        n_chunks, reuse=reuse_changes)

    state_path = os.path.join(workdir, "state_v0")
    initial_state.write.mode("overwrite").parquet(state_path)
    version = {"n": 0, "path": state_path}

    def merge_batch(batch: DataFrame, epoch_id: int) -> None:
        if batch.isEmpty():
            return
        cur = spark.read.parquet(version["path"])
        new = apply_changes(cur, batch, pk_cols)
        nxt = os.path.join(workdir, f"state_v{version['n'] + 1}")
        new.write.mode("overwrite").parquet(nxt)
        version["n"] += 1
        version["path"] = nxt

    q = (
        spark.readStream.schema(changes.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
        .writeStream.foreachBatch(merge_batch)
        .outputMode("update")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    # Only the FINAL state version is ever read again (the return value
    # references it lazily, so the workdir itself must survive the call);
    # dropping the intermediate versions keeps repeated bench/test runs
    # from accumulating n_chunks obsolete state copies per call.
    for n in range(version["n"]):
        shutil.rmtree(os.path.join(workdir, f"state_v{n}"),
                      ignore_errors=True)
    return spark.read.parquet(version["path"])
