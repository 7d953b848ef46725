"""Savepoints: named state snapshots a query can be rewound or forked from
(SURVEY §2.9 checkpointing row's ops surface).

Reference: Flink savepoints are manually-triggered, self-contained state
snapshots (`CheckpointMetadata.java`, settings restored via
`SavepointRestoreSettings.forPath`, SavepointRestoreSettings.java:132) —
the operational tool for upgrades, A/B forks, and rewind-and-reprocess.

Spark-first re-expression: a Structured Streaming checkpoint directory IS a
self-contained snapshot (offsets WAL + commits + state store versions), so
a savepoint is a consistent COPY of it, and "start from savepoint" is just
`checkpointLocation = <copy>`:

* **trigger_savepoint(ckpt, sp_dir)** — copy the checkpoint after the last
  COMMITTED batch. Taken while no trigger is mid-flight (availableNow
  drained, or query stopped) the copy is trivially consistent; Spark keeps
  each batch's offsets/commit/state files immutable once written, so the
  copy needs no barrier protocol — the file layout provides the atomicity
  Flink gets from its checkpoint barriers.
* **restore path** — start ANY compatible query with the savepoint as its
  checkpointLocation. Like Flink, the restored job resumes from the
  snapshot's source offsets: input the ORIGINAL query consumed after the
  savepoint is re-processed by the fork (rewind semantics), and the
  original's later progress never leaks into the fork (tested).

Scale: the copy is pure file I/O proportional to live state size; on a
cluster, point `shutil.copytree` at the same routine over the checkpoint's
object-store prefix (distcp-style). No query downtime is required for
availableNow pipelines; continuous queries should be stopped (or a trigger
boundary awaited) first — same operational rule as Flink's
stop-with-savepoint.
"""

from __future__ import annotations

import os
import shutil


def trigger_savepoint(checkpoint: str, savepoint_dir: str) -> str:
    """Snapshot `checkpoint` into `savepoint_dir` (must not exist yet).
    Returns the savepoint path — pass it as `checkpointLocation` to fork or
    rewind. Raises if the checkpoint has no committed batch yet (an empty
    savepoint cannot restore anything, reference savepoints behave the
    same)."""
    commits = os.path.join(checkpoint, "commits")
    if not os.path.isdir(commits) or not any(
        not f.startswith(".") for f in os.listdir(commits)
    ):
        raise ValueError(
            f"savepoint: no committed batch under {checkpoint!r} yet")
    if os.path.exists(savepoint_dir):
        raise ValueError(f"savepoint target {savepoint_dir!r} already exists")
    shutil.copytree(checkpoint, savepoint_dir)
    return savepoint_dir


def last_committed_batch(checkpoint: str) -> int:
    """Highest committed micro-batch id in a checkpoint/savepoint — the
    analog of a savepoint's checkpoint id in its metadata."""
    commits = os.path.join(checkpoint, "commits")
    ids = [int(f) for f in os.listdir(commits)
           if not f.startswith(".") and f.isdigit()]
    if not ids:
        raise ValueError(f"no committed batches under {checkpoint!r}")
    return max(ids)
