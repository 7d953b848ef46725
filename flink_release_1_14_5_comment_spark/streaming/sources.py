"""Streaming sources (SURVEY §2.1).

Built-in Spark sources cover the reference's connector surface we target:
file-stream (FileSource), kafka (KafkaSource; config-only here — no broker in
the test env), rate (test source). This module adds a deterministic *replay*
helper: chunk a batch DataFrame into N parquet files and read them back with
``maxFilesPerTrigger=1`` so tests drive micro-batch-at-a-time processing,
mirroring the reference's harness tests (SURVEY §5: scripted element-by-element
operator harnesses).
"""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession


def replay_as_stream(
    spark: SparkSession,
    df: DataFrame,
    n_chunks: int = 4,
    order_col: str | None = None,
    files_per_trigger: int = 1,
    final_dfs: list[DataFrame] | None = None,
) -> tuple[DataFrame, str]:
    """Write `df` as `n_chunks` parquet files; return (streaming_df, tmpdir).

    Rows are range-partitioned by `order_col` (if given) so chunk k contains
    earlier timestamps than chunk k+1 — a realistic in-order replay.
    `final_dfs` (same schema) are each written as ONE extra file replayed in
    list order strictly AFTER every data chunk — the harness analog of the
    reference's end-of-input watermark flush (Watermark.MAX_WATERMARK on
    close). Spark's watermark for batch N is computed from data through
    batch N-1, so a flush that must OBSERVE an advanced watermark takes two
    trailing batches: first a watermark-advancer row above all data, then
    the per-key flush markers.
    Caller owns cleanup of tmpdir.
    """
    tmpdir = tempfile.mkdtemp(prefix="spark_graft_replay_")
    data_dir = os.path.join(tmpdir, "data")
    staged = df.repartitionByRange(n_chunks, order_col) if order_col else df.repartition(n_chunks)
    staged.write.mode("overwrite").parquet(data_dir)
    # Spark's file stream source orders new files by modification time, and
    # parallel-written parts share one mtime — the replay order would be
    # nondeterministic. Stamp strictly increasing mtimes in part order
    # (range partition k holds the k-th ts range → part-0000k replays k-th).
    for i, fdf in enumerate(final_dfs or []):
        fin_dir = os.path.join(tmpdir, f"final{i}")
        fdf.coalesce(1).write.mode("overwrite").parquet(fin_dir)
        fin_part = next(
            f for f in os.listdir(fin_dir)
            if f.startswith("part-") and f.endswith(".parquet")
        )
        shutil.move(os.path.join(fin_dir, fin_part),
                    os.path.join(data_dir, f"part-zzz-final{i}.parquet"))
    parts = sorted(
        f for f in os.listdir(data_dir) if f.startswith("part-") and f.endswith(".parquet")
    )
    base = os.path.getmtime(os.path.join(data_dir, parts[0])) if parts else 0
    for k, fname in enumerate(parts):
        path = os.path.join(data_dir, fname)
        os.utime(path, (base + 10 * k, base + 10 * k))
    schema = spark.read.parquet(data_dir).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", files_per_trigger)
        .parquet(data_dir)
    )
    return stream, tmpdir


def cleanup(tmpdir: str) -> None:
    shutil.rmtree(tmpdir, ignore_errors=True)


def rate_source(spark: SparkSession, rows_per_second: int = 100) -> DataFrame:
    """Test source (reference: legacy SourceFunction run-loop sources)."""
    return spark.readStream.format("rate").option("rowsPerSecond", rows_per_second).load()
