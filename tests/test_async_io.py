"""Async I/O operator test (SURVEY §2.9 AsyncWaitOperator analog)."""

from __future__ import annotations

import asyncio
import sys

sys.path.insert(0, "/root/repo")

from flink_release_1_14_5_comment_spark.catalog import load_tables
from flink_release_1_14_5_comment_spark.streaming.async_io import async_map


def test_async_map_enriches_rows(spark, sf_dir):
    ev = load_tables(spark, sf_dir)["events"].limit(200).select("event_id", "user_id")

    async def fake_lookup(row: dict) -> dict:
        await asyncio.sleep(0.001)  # stands in for a network call
        return {"segment": f"seg_{row['user_id'] % 3}"}

    out = async_map(ev, fake_lookup, "event_id long, user_id long, segment string")
    pdf = out.toPandas()
    assert len(pdf) == 200
    assert (pdf["segment"] == "seg_" + (pdf["user_id"] % 3).astype(str)).all()


def test_async_map_capacity_amortizes_latency(spark, sf_dir):
    import time

    ev = load_tables(spark, sf_dir)["events"].limit(256).select("event_id").coalesce(1)

    async def slow(row: dict) -> dict:
        await asyncio.sleep(0.01)
        return {"ok": True}

    t0 = time.perf_counter()
    n = async_map(ev, slow, "event_id long, ok boolean", capacity=64).count()
    wall = time.perf_counter() - t0
    assert n == 256
    # serial would be >= 2.56 s of sleep alone; concurrent must be far less
    assert wall < 2.0, f"async capacity not effective: {wall:.2f}s"
