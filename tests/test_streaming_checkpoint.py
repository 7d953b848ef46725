"""Checkpoint / recovery evidence for the streaming engine (SURVEY §2.9
"Exactly-once checkpointing" row; reference CheckpointCoordinator.java:97 +
HashMapStateBackend.java:74).

Structured Streaming's WAL + state store replace the reference's barrier
protocol; this test proves the two properties the reference's checkpointing
guarantees, against a REAL stop/restart of the query (same checkpoint dir,
new query object):

1. **State restoration** — a keyed aggregation resumed from the checkpoint
   continues from the pre-stop counts (run 2's emitted counts include run
   1's contribution).
2. **Exactly-once source progress** — the file-source WAL prevents
   reprocessing: run 2 emits updates ONLY for keys present in the new file
   (if run 1's file were re-read, every key would re-emit and counts would
   double).
"""

from __future__ import annotations

import os
import shutil
import sys

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F


def _write_one_file(spark, rows, schema, data_dir: str, name: str) -> None:
    """Write rows as exactly one parquet file named `name` inside data_dir
    (staged via a temp dir because Spark writes part-files + _SUCCESS)."""
    tmp = data_dir + f".stage_{name}"
    spark.createDataFrame(rows, schema).coalesce(1).write.mode(
        "overwrite").parquet(tmp)
    part = next(f for f in os.listdir(tmp)
                if f.startswith("part-") and f.endswith(".parquet"))
    os.makedirs(data_dir, exist_ok=True)
    shutil.move(os.path.join(tmp, part), os.path.join(data_dir, name))
    shutil.rmtree(tmp, ignore_errors=True)


def test_checkpoint_recovery_exactly_once(spark, tmp_path):
    data_dir = str(tmp_path / "data")
    ckpt = str(tmp_path / "ckpt")
    schema = "k int, v int"

    # run 1 input: key k appears k+1 times (k = 0..4)
    _write_one_file(spark,
                    [(k, 1) for k in range(5) for _ in range(k + 1)],
                    schema, data_dir, "a.parquet")

    emitted: list[tuple[int, list]] = []

    def start():
        stream = (spark.readStream.schema(schema)
                  .option("maxFilesPerTrigger", "10").parquet(data_dir))
        agg = stream.groupBy("k").agg(F.count(F.lit(1)).alias("n"))
        q = (agg.writeStream
             .foreachBatch(lambda df, bid: emitted.append((bid, df.collect())))
             .outputMode("update")
             .option("checkpointLocation", ckpt)
             .trigger(availableNow=True).start())
        assert q.awaitTermination(180), "stream did not finish"
        return q

    start()
    run1 = {r["k"]: r["n"] for _, batch in emitted for r in batch}
    assert run1 == {k: k + 1 for k in range(5)}

    # stop/restart boundary: new file with extra rows for keys 0 and 1 only
    emitted.clear()
    _write_one_file(spark, [(0, 1)] * 3 + [(1, 1)] * 2,
                    schema, data_dir, "b.parquet")
    start()

    run2 = {r["k"]: r["n"] for _, batch in emitted for r in batch}
    # state restored: counts continue from run 1 (1+3, 2+2)
    assert run2 == {0: 4, 1: 4}, run2
    # exactly-once: keys 2..4 were NOT re-emitted (file a not reprocessed)
    assert not any(k in run2 for k in (2, 3, 4))


def test_checkpoint_recovery_batch_ids_continue(spark, tmp_path):
    """Restarted query continues the WAL's batch numbering — evidence the
    checkpoint (not a fresh query) drove the second run."""
    data_dir = str(tmp_path / "data")
    ckpt = str(tmp_path / "ckpt")
    schema = "k int, v int"
    _write_one_file(spark, [(1, 1)], schema, data_dir, "a.parquet")

    seen: list[int] = []

    def start():
        stream = (spark.readStream.schema(schema)
                  .option("maxFilesPerTrigger", "10").parquet(data_dir))
        q = (stream.writeStream
             .foreachBatch(lambda df, bid: (df.count(), seen.append(bid)))
             .option("checkpointLocation", ckpt)
             .trigger(availableNow=True).start())
        assert q.awaitTermination(180)

    start()
    first_max = max(seen)
    _write_one_file(spark, [(2, 1)], schema, data_dir, "b.parquet")
    start()
    assert max(seen) > first_max  # numbering resumed, not restarted at 0
