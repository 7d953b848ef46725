"""Multimodal column plumbing: image/audio/video as opaque `binary` columns
with typed metadata, processed by Arrow-batched Pandas functions.

The container has no image/audio codecs, so the *decode* step is STUBBED
(`decode_image` raises NotImplementedError; `extract_features` uses a
clearly-marked deterministic fake derived from the bytes). Everything
Spark-side is real and tested: schema, binary handling, `mapInPandas`
batching, partition sizing.

Scale notes:
  * Media bytes never shuffle — all per-item work (decode, feature extract,
    resize, frame-sample) is map-only over the scan partitions.
  * `spark.sql.files.maxPartitionBytes` bounds partition size so a partition
    of blobs fits executor memory; for very large media, store pointers
    (path + range) and fetch inside the UDF instead of inlining bytes.
  * Feature vectors (small arrays) are what flows into downstream joins /
    similarity search — the heavy binary column is pruned immediately after
    the map (column pruning keeps it out of every exchange).
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from flink_release_1_14_5_comment_spark.catalog import register_views

MEDIA_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("content", T.BinaryType(), True),
    T.StructField("meta", T.StructType([
        T.StructField("mime", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.LongType(), True),
    ]), True),
])

N_FEATURES = 8


def synthetic_media(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic fake media table: documents' text utf-8 encoded as the
    binary payload (stands in for image bytes), with typed metadata."""
    t = register_views(spark, sf_dir)
    docs = t["documents"]
    # Documents often arrive as one file → one partition, serializing the
    # downstream Pandas-UDF work. Spread it — but scale partitions with the
    # data, not the core count: each Arrow batch costs a Python worker
    # round-trip, so tiny corpora want few, large partitions.
    n_parts = max(8, docs.rdd.getNumPartitions())
    return docs.repartition(n_parts).select(
        F.col("doc_id").alias("media_id"),
        F.encode("text", "utf-8").alias("content"),
        F.struct(
            F.lit("application/octet-stream").alias("mime"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(None).cast("long").alias("duration_ms"),
        ).alias("meta"),
    )


def decode_image(content: bytes):
    """STUB — no image codec in this environment. On a real deployment this
    is Pillow/libvips inside the same mapInPandas batch loop."""
    raise NotImplementedError("image decode requires an image codec (Pillow) — not available here")


def _fake_features(content: bytes) -> list[float]:
    """DETERMINISTIC FAKE feature extractor: md5(content) bytes → N floats in
    [0,1). Stands in for a real embedding model; keeps the pipeline testable."""
    h = hashlib.md5(content).digest()
    return [b / 255.0 for b in h[:N_FEATURES]]


def extract_features(media: DataFrame) -> DataFrame:
    """mapInPandas feature extraction: (media_id, n_bytes, sha1, features).

    The binary column is consumed inside the map and pruned from the output —
    downstream stages only carry the small feature vector.
    """
    out_schema = (
        "media_id long, n_bytes long, sha1 string, features array<double>"
    )

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            content = pdf["content"]
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "n_bytes": content.map(len).astype("int64"),
                "sha1": content.map(lambda b: hashlib.sha1(b).hexdigest()),
                "features": content.map(_fake_features),
            })

    # Project to the two columns the function reads BEFORE the Python
    # boundary: mapInPandas is opaque to Catalyst's column pruning, so
    # every input column would otherwise be Arrow-serialized into the
    # worker (guide: pass only what the function needs).
    return media.select("media_id", "content").mapInPandas(extract, out_schema)


def frame_sample(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling plumbing: emits (media_id, frame_idx, frame) rows.
    Decode is stubbed — frames are fixed-size byte slices standing in for
    decoded frames; the row-explosion + schema shape is the real contract."""
    out_schema = "media_id long, frame_idx int, frame binary"

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            contents = [bytes(c) if c is not None else b"" for c in pdf["content"]]
            lens = np.fromiter((len(c) for c in contents), dtype=np.int64,
                               count=len(contents))
            # FAKE: one "frame" per 64-byte slice, max 4 — stands in for
            # one frame per `every_ms` of real decoded video.
            n_frames = np.clip(lens // 64, 1, 4)
            frame_idx = (np.concatenate([np.arange(n) for n in n_frames])
                         if len(n_frames) else np.empty(0, dtype=np.int64))
            yield pd.DataFrame({
                "media_id": np.repeat(pdf["media_id"].to_numpy(), n_frames),
                "frame_idx": frame_idx.astype("int32"),
                "frame": [c[i * 64:(i + 1) * 64]
                          for c, n in zip(contents, n_frames) for i in range(n)],
            })

    return media.mapInPandas(sample, out_schema)


def resize_image(media: DataFrame, width: int, height: int) -> DataFrame:
    """Image-resize plumbing: (media_id, width, height, resized binary).

    Decode/re-encode is stubbed (no codec in this container): the fake
    "resized" payload is the source bytes truncated/cycled to a
    width*height-proportional length — deterministic, so tests can assert
    batch shape and size math. The Spark contract is the real part: pure
    map over scan partitions (media bytes never shuffle), Arrow-batched,
    output schema carries the typed target geometry."""
    out_schema = "media_id long, width int, height int, resized binary"
    target = max(1, (width * height) // 64)  # fake: 1 byte per 64 px

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            n = len(pdf)
            yield pd.DataFrame({
                "media_id": pdf["media_id"].astype("int64"),
                "width": np.full(n, width, dtype="int32"),
                "height": np.full(n, height, dtype="int32"),
                "resized": [
                    ((c := bytes(raw)) * (target // max(1, len(c)) + 1))[:target]
                    for raw in pdf["content"]
                ],
            })

    return media.mapInPandas(resize, out_schema)


def q_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature-extraction pipeline over the synthetic media table, reduced to
    oracle-checkable columns (the md5-derived fake features are reproducible
    in SQL from the payload's md5 hex — so even the Pandas-UDF path gets a
    full value-hash check; sha1 is covered by pytest only)."""
    feats = extract_features(synthetic_media(spark, sf_dir))
    return feats.select(
        "media_id",
        "n_bytes",
        F.round(F.expr("aggregate(features, cast(0.0 as double), (a, v) -> a + v)"), 6).alias("feat_sum"),
    )


ORACLE_Q_MULTIMODAL_FEATURES = """
SELECT doc_id AS media_id,
       CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
       ROUND(list_sum(list_transform(range(0, 8),
             i -> (('0x' || substr(md5(text), i*2 + 1, 2))::INT) / 255.0)), 6) AS feat_sum
FROM documents
"""


def q_stream_multimodal_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The multimodal ingest pipeline on a STREAM, oracle-graded: the binary
    media table replays in micro-batches, feature extraction runs as the
    same stateless Arrow mapInPandas inside the streaming topology (the
    shape a production media-ingest job has: decode/extract per batch as
    files land), and a complete-mode aggregate materializes per-bucket
    rollups. End state must equal the batch pipeline's — a dropped batch or
    a binary column mangled by the replay round-trip breaks byte counts and
    md5-derived feature sums alike."""
    from pyspark.sql import functions as F

    from flink_release_1_14_5_comment_spark.streaming import sources

    media = synthetic_media(spark, sf_dir)
    stream, tmp = sources.replay_as_stream(spark, media, n_chunks=3,
                                           order_col="media_id")
    try:
        feats = extract_features(stream)
        agg = (feats
               .withColumn("bucket", F.col("media_id") % 8)
               .withColumn("feat_sum", F.expr(
                   "aggregate(features, cast(0.0 as double), (a, v) -> a + v)"))
               .groupBy("bucket")
               .agg(F.count(F.lit(1)).cast("long").alias("n_media"),
                    F.sum("n_bytes").cast("long").alias("total_bytes"),
                    F.round(F.sum("feat_sum"), 4).alias("feat_total")))
        # lazy memory-sink read (the streaming_file_sink pattern): the
        # complete-mode memory table outlives the terminated query, so no
        # driver-side collect/recreate is needed
        from flink_release_1_14_5_comment_spark.streaming.stream_queries import (
            _run_to_memory,
        )

        return _run_to_memory(agg, mode="complete")
    finally:
        sources.cleanup(tmp)


ORACLE_Q_STREAM_MULTIMODAL_PIPELINE = """
SELECT doc_id % 8 AS bucket,
       CAST(COUNT(*) AS BIGINT) AS n_media,
       CAST(SUM(octet_length(encode(text))) AS BIGINT) AS total_bytes,
       ROUND(SUM(list_sum(list_transform(range(0, 8),
             i -> (('0x' || substr(md5(text), i*2 + 1, 2))::INT) / 255.0))), 4) AS feat_total
FROM documents
GROUP BY 1
"""


QUERIES = {
    "multimodal_features": q_multimodal_features,
    "stream_multimodal_pipeline": q_stream_multimodal_pipeline,
}

ORACLE = {
    "multimodal_features": ORACLE_Q_MULTIMODAL_FEATURES,
    "stream_multimodal_pipeline": ORACLE_Q_STREAM_MULTIMODAL_PIPELINE,
}

