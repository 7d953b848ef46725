"""Flink DataStream API facade (SURVEY §3.3, §2.9).

The reference's DataStream programs are user topologies executed as written
(no optimizer). Here each fluent call composes DataFrame operations, so the
"topology" still benefits from Catalyst — a strict upgrade documented as a
semantic equivalence, not a behavioral difference.

Mapping (DataStream.java entry points):
  * map/flat_map (DataStream.java:573)    → selectExpr / mapInPandas
  * filter                                → filter
  * key_by → KeyedStream (KeyedStream.java)
  * keyed window().aggregate (KeyedStream.java:725) → groupBy(window, key).agg
  * keyed process (KeyedProcessFunction + timers) → applyInPandasWithState
  * union (DataStream.java:228)           → unionByName
  * side outputs → filter splits on a tag column (documented emulation)

Python lambdas ride `mapInPandas` (Arrow-batched). Expression strings are
preferred — they stay JVM-side.
"""

from __future__ import annotations

from typing import Callable, Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from flink_release_1_14_5_comment_spark.session import get_spark


class StreamExecutionEnvironment:
    """Entry point (StreamExecutionEnvironment.java:1898 execute)."""

    def __init__(self, spark: SparkSession | None = None):
        self.spark = spark or get_spark()

    @classmethod
    def get_execution_environment(cls, spark: SparkSession | None = None):
        return cls(spark)

    def from_data_frame(self, df: DataFrame) -> "DataStream":
        return DataStream(df, self)

    def from_collection(self, data, schema: str) -> "DataStream":
        return DataStream(self.spark.createDataFrame(data, schema), self)

    def read_parquet_stream(self, path: str, schema=None, max_files_per_trigger: int = 1) -> "DataStream":
        reader = self.spark.readStream
        if schema is not None:
            reader = reader.schema(schema)
        return DataStream(
            reader.option("maxFilesPerTrigger", max_files_per_trigger).parquet(path), self
        )


class DataStream:
    def __init__(self, df: DataFrame, env: StreamExecutionEnvironment):
        self._df = df
        self.env = env

    # -- stateless transforms ---------------------------------------------

    def map(self, fn: str | list[str] | Callable[[pd.DataFrame], pd.DataFrame],
            output_schema: str | None = None) -> "DataStream":
        """Expression string(s) (JVM fast path) or a pandas-batch callable
        (Arrow path, requires output_schema)."""
        if callable(fn):
            if output_schema is None:
                raise ValueError("callable map requires output_schema")

            def apply(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
                for pdf in batches:
                    yield fn(pdf)

            return DataStream(self._df.mapInPandas(apply, output_schema), self.env)
        exprs = [fn] if isinstance(fn, str) else fn
        return DataStream(self._df.selectExpr(*exprs), self.env)

    def filter(self, predicate: str | Column) -> "DataStream":
        return DataStream(self._df.filter(predicate), self.env)

    def flat_map(self, explode_expr: str) -> "DataStream":
        return DataStream(self._df.selectExpr("*", f"explode({explode_expr}) AS __flat"), self.env)

    def union(self, *others: "DataStream") -> "DataStream":
        df = self._df
        for o in others:
            df = df.unionByName(o._df)
        return DataStream(df, self.env)

    def assign_timestamps_and_watermarks(self, ts_col: str, delay: str) -> "DataStream":
        return DataStream(self._df.withWatermark(ts_col, delay), self.env)

    def co_group(self, other: "DataStream", key_cols: list[str],
                 left_ts: str, right_ts: str, size: str,
                 fn, extra_schema: str, delay: str = "0 seconds") -> "DataStream":
        """`a.coGroup(b).where(k).equalTo(k).window(tumble)` (reference
        CoGroupedStreams.java; DataStream.java:730): per (key, window) the
        fn sees all rows of BOTH sides — including windows one side missed."""
        from flink_release_1_14_5_comment_spark.streaming.stream_joins import co_group_stream

        return DataStream(
            co_group_stream(self._df, other._df, key_cols, left_ts, right_ts,
                            size, fn, extra_schema, delay),
            self.env,
        )

    def side_output(self, tag_predicate: str) -> tuple["DataStream", "DataStream"]:
        """Side-output emulation: (main, side) filter splits."""
        return (
            DataStream(self._df.filter(f"NOT ({tag_predicate})"), self.env),
            DataStream(self._df.filter(tag_predicate), self.env),
        )

    # -- keyed -------------------------------------------------------------

    # -- physical partitioning (reference DataStream.java rebalance/
    # rescale/shuffle/broadcast). In Spark the optimizer owns distribution;
    # these map onto the equivalent repartition/hint so a migrated program
    # keeps its explicit redistribution points.
    def rebalance(self, n: int | None = None) -> "DataStream":
        """Round-robin redistribution (RebalancePartitioner)."""
        df = self._df.repartition(n) if n else self._df.repartition(
            int(self._df.sparkSession.conf.get("spark.sql.shuffle.partitions")))
        return DataStream(df, self.env)

    rescale = rebalance  # local-group round-robin: same effect in Spark
    shuffle = rebalance  # random redistribution

    def broadcast_hint(self) -> "DataStream":
        """Mark this (small) stream as broadcast-able for a following join
        (BroadcastPartitioner; Spark: broadcast join hint)."""
        from pyspark.sql.functions import broadcast

        return DataStream(broadcast(self._df), self.env)

    def _select_struct(self, struct_col: str, fields: list[str]) -> "DataStream":
        keep = [c for c in self._df.columns if c != struct_col]
        return DataStream(
            self._df.select(*keep, *[F.col(f"{struct_col}.{f}").alias(f)
                                     for f in fields]), self.env)

    def key_by(self, *cols: str) -> "KeyedStream":
        return KeyedStream(self._df, list(cols), self.env)

    # -- sinks -------------------------------------------------------------

    def print(self, n: int = 20) -> None:
        self._df.show(n, truncate=False)

    def to_data_frame(self) -> DataFrame:
        return self._df

    def add_sink_parquet(self, path: str, checkpoint: str, mode: str = "append"):
        if self._df.isStreaming:
            return (
                self._df.writeStream.format("parquet")
                .option("path", path)
                .option("checkpointLocation", checkpoint)
                .outputMode(mode)
                .start()
            )
        self._df.write.mode("overwrite").parquet(path)
        return None


class KeyedStream:
    """Keyed stream: windows, reductions, and stateful process functions."""

    def __init__(self, df: DataFrame, keys: list[str], env: StreamExecutionEnvironment):
        self._df = df
        self._keys = keys
        self.env = env

    def window(self, ts_col: str, size: str, slide: str | None = None) -> "WindowedStream":
        return WindowedStream(self._df, self._keys, F.window(ts_col, size, slide), self.env)

    def session_window(self, ts_col: str, gap: str) -> "WindowedStream":
        return WindowedStream(self._df, self._keys, F.session_window(ts_col, gap), self.env)

    def count_window(self, size: int, value_col: str, id_col: str) -> DataStream:
        """Tumbling count window (KeyedStream.java:696): emit an aggregate
        row every `size` elements per key — a stateful counter op (no Spark
        builtin). Emits (key, window_seq, n, sum_value)."""
        from flink_release_1_14_5_comment_spark.streaming.count_windows import (
            tumbling_count_window,
        )

        return DataStream(
            tumbling_count_window(self._df, self._keys, value_col, id_col, size), self.env
        )

    def reduce(self, aggs: list[Column]) -> DataStream:
        return DataStream(self._df.groupBy(*self._keys).agg(*aggs), self.env)

    aggregate = reduce

    # Rolling aggregations (reference KeyedStream.java sum/min/max/minBy/
    # maxBy:779-934): Flink emits the running value per element — an update
    # stream. On a streaming frame the same groupBy in UPDATE output mode IS
    # that running aggregate (each micro-batch emits the new per-key value);
    # on a bounded frame the end-of-input state equals the final aggregate,
    # matching Flink's bounded-stream result.
    def sum(self, col: str) -> DataStream:
        return self.reduce([F.sum(col).alias(col)])

    def min(self, col: str) -> DataStream:
        return self.reduce([F.min(col).alias(col)])

    def max(self, col: str) -> DataStream:
        return self.reduce([F.max(col).alias(col)])

    def min_by(self, col: str) -> DataStream:
        """Row with the minimal `col` per key (KeyedStream.minBy). Flink
        keeps the FIRST minimal element in arrival order; a distributed
        shuffle has no arrival order, so ties break by the remaining
        columns' values instead (deterministic run-to-run — documented
        divergence, same spirit as the reference's `first=true` default)."""
        others = [c for c in self._df.columns if c not in self._keys]
        return self.reduce(
            [F.min(F.struct(F.col(col), *[F.col(o) for o in others
                                          if o != col])).alias("__m")]
        )._select_struct("__m", [col] + [o for o in others if o != col])

    def max_by(self, col: str) -> DataStream:
        others = [c for c in self._df.columns if c not in self._keys]
        return self.reduce(
            [F.max(F.struct(F.col(col), *[F.col(o) for o in others
                                          if o != col])).alias("__m")]
        )._select_struct("__m", [col] + [o for o in others if o != col])

    def process(self, fn, output_schema: str, state_schema: str,
                output_mode: str = "update", timeout: str = "NoTimeout") -> DataStream:
        """KeyedProcessFunction + keyed state (+ timers via GroupStateTimeout).

        `fn(key, pdf_iter, state)` — the applyInPandasWithState contract.
        """
        from pyspark.sql.streaming.state import GroupStateTimeout

        timeout_conf = getattr(GroupStateTimeout, timeout)
        out = self._df.groupBy(*self._keys).applyInPandasWithState(
            fn, output_schema, state_schema, output_mode, timeout_conf
        )
        return DataStream(out, self.env)


class WindowedStream:
    def __init__(self, df: DataFrame, keys: list[str], window_expr: Column,
                 env: StreamExecutionEnvironment):
        self._df = df
        self._keys = keys
        self._window = window_expr
        self.env = env

    def aggregate(self, aggs: list[Column]) -> DataStream:
        out = self._df.groupBy(self._window.alias("w"), *self._keys).agg(*aggs)
        rest = [c for c in out.columns if c != "w"]
        return DataStream(
            out.select(F.col("w.start").alias("w_start"), F.col("w.end").alias("w_end"), *rest),
            self.env,
        )

    reduce = aggregate
