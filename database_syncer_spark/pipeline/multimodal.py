"""Multimodal column plumbing (SURVEY.md §2 B11 multimodal_columns).

Pattern for 100-TB multimodal corpora: media payloads are opaque
``binary`` columns with typed metadata columns beside them; decode /
feature-extraction runs as Arrow-batched ``mapInPandas`` so each Python
worker sees a columnar batch of payloads (never one row at a time), and
partitioning/pruning stay fully Spark-native because the payload is just
another column.

The container has no image/audio codecs, so the real decoder is a
clearly-marked stub (NotImplementedError) and the default pipeline uses a
deterministic byte-level feature extractor — the Spark-side plumbing
(schema, batching, UDF signature) is identical to what a real decoder
would use.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DECODED_SCHEMA = "doc_id bigint, n_bytes int, payload_md5 string, header_hex string"


def attach_binary_payload(documents: DataFrame) -> DataFrame:
    """Materialize an opaque binary column (utf-8 bytes of text here; an
    image/audio blob in production — the engine treats both identically)."""
    return documents.withColumn("payload", F.encode("text", "utf-8"))


def decode_media(payload: bytes) -> dict:
    """REAL media decode (image/audio/video) — not available in this
    container (no codec libraries baked in). The distributed plumbing in
    extract_features works unchanged once this is implemented."""
    raise NotImplementedError(
        "media codecs not available in this environment; "
        "use extract_features (deterministic byte-level fake decode)")


def extract_features(with_payload: DataFrame) -> DataFrame:
    """mapInPandas feature extraction over binary payloads.

    Batch shape: the worker receives pandas DataFrames of (doc_id,
    payload) — one Arrow batch per ~10k rows — and emits fixed-schema
    features. Swap the body for decode_media + numpy once codecs exist.
    """
    def extract(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            payloads = pdf["payload"]
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"],
                "n_bytes": payloads.map(len).astype("int32"),
                "payload_md5": payloads.map(
                    lambda b: hashlib.md5(bytes(b)).hexdigest()),
                "header_hex": payloads.map(lambda b: bytes(b)[:4].hex()),
            })

    return (
        with_payload.select("doc_id", "payload")
        .mapInPandas(extract, DECODED_SCHEMA)
    )


FRAME_SCHEMA = ("doc_id bigint, frame_id int, byte_offset int, "
                "n_frame_bytes int, frame_md5 string")


def frame_sample(with_payload: DataFrame, frame_bytes: int = 64,
                 stride: int = 3) -> DataFrame:
    """Frame sampling over binary payloads — the video-pipeline shape
    (decode container -> sample every Nth frame -> per-frame feature)
    with the codec stubbed: a "frame" is a fixed-size byte window of the
    payload, sampling keeps every ``stride``-th frame, and the per-frame
    feature is its md5. The Spark-side plumbing is exactly what a real
    ffmpeg-backed sampler uses: Arrow-batched ``mapInPandas`` over
    (doc_id, payload), frame fan-out INSIDE the worker (no row explosion
    before the Python crossing), fixed output schema.

    Scale: doc-local, zero shuffles; output rows ~ len/(frame_bytes·
    stride) per doc. The DuckDB oracle recomputes frames from the TEXT
    the payload encodes — byte-exact because the fixture text is ASCII
    (one byte per char); a non-ASCII corpus would fail parity loudly,
    not silently."""
    def sample(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            out = {"doc_id": [], "frame_id": [], "byte_offset": [],
                   "n_frame_bytes": [], "frame_md5": []}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                data = bytes(payload)
                for f in range(0, -(-len(data) // frame_bytes)):
                    if f % stride:
                        continue
                    chunk = data[f * frame_bytes:(f + 1) * frame_bytes]
                    out["doc_id"].append(doc_id)
                    out["frame_id"].append(f)
                    out["byte_offset"].append(f * frame_bytes)
                    out["n_frame_bytes"].append(len(chunk))
                    out["frame_md5"].append(hashlib.md5(chunk).hexdigest())
            yield pd.DataFrame(out).astype(
                {"frame_id": "int32", "byte_offset": "int32",
                 "n_frame_bytes": "int32"})

    return (with_payload.select("doc_id", "payload")
            .where(F.length("payload") > 0)
            .mapInPandas(sample, FRAME_SCHEMA))


def probe_dim(embeddings: DataFrame, col: str = "embedding") -> int:
    """Embedding dimensionality from one sampled row (one-row driver
    read — model-state scale, not data scale). The unrolled vector
    kernels need dim at plan time; probing beats hardcoding because a
    wrong dim makes non-ANSI GetArrayItem return NULL silently."""
    row = embeddings.select(F.size(col).alias("d")).first()
    if row is None or row["d"] is None or row["d"] <= 0:
        raise ValueError(f"cannot probe embedding dim from column {col!r}")
    return int(row["d"])


def check_dim(embeddings: DataFrame, col: str = "embedding") -> int:
    """Probe AND validate: returns the corpus dim after one cheap
    aggregate proves every row agrees (min(size) == max(size)). A ragged
    corpus raises here, at plan-build time, instead of silently NULLing
    norms downstream — and the validation lives OUTSIDE the hot kernels,
    whose unrolled expressions stay in whole-stage codegen (a per-row
    assert_true in the norm projection measured +25% on the sf0.1
    brute-force scan). One size-only columnar scan, no data movement."""
    return check_dim_count(embeddings, col)[0]


def check_dim_count(embeddings: DataFrame,
                    col: str = "embedding") -> tuple[int, int]:
    """check_dim plus the corpus row count from the same single-scan
    probe — callers that size LSH blocking from N (pipeline/dedup.py)
    shouldn't pay a second job for a number this aggregate already
    computed."""
    row = embeddings.select(
        F.min(F.size(col)).alias("lo"), F.max(F.size(col)).alias("hi"),
        F.count(F.lit(1)).alias("n"), F.count(col).alias("nn")).first()
    if row is None or row["lo"] is None:
        raise ValueError(f"cannot probe embedding dim from column {col!r}")
    if row["n"] != row["nn"]:
        # min/max(size) skip NULLs, so without this a NULL-bearing corpus
        # would pass validation yet NULL its norms downstream — the exact
        # failure class this function exists to prevent.
        raise ValueError(
            f"column {col!r} has {row['n'] - row['nn']} NULL embedding "
            f"rows (of {row['n']})")
    if row["lo"] != row["hi"] or row["lo"] <= 0:
        raise ValueError(
            f"ragged embedding dim in column {col!r}: "
            f"size ranges {row['lo']}..{row['hi']}")
    return int(row["lo"]), int(row["n"])


def multimodal_join(documents: DataFrame, embeddings: DataFrame,
                    dim: int | None = None) -> DataFrame:
    """Mixed text + vector + scalar table: documents ⋈ embeddings with
    array math on the vector column (all built-in exprs). ``dim`` is
    probed from the data when not given; a per-row ``assert_true`` guard
    makes ragged embeddings fail loudly instead of yielding NULL norms."""
    from database_syncer_spark.pipeline import vector as V

    if dim is None:
        dim = probe_dim(embeddings)
    emb = F.col("embedding")
    l2sq = V.norm_sq(emb, dim)
    dim_ok = F.assert_true(
        F.size(emb) == dim,
        F.format_string("embedding dim != %d", F.lit(dim)))
    return (
        documents.join(
            embeddings, documents.doc_id == embeddings.vec_id, "inner")
        .select(
            "doc_id", "lang", "label",
            F.length("text").alias("text_len"),
            F.when(dim_ok.isNull(), F.size(emb)).alias("dim"),
            F.round(F.sqrt(l2sq), 6).alias("l2_norm"),
        )
    )
