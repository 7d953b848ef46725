"""Type mapping (SURVEY §1.3) + UDF/UDAF/UDTF surface (§2.10)."""

from __future__ import annotations

import sys

import pandas as pd
import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

sys.path.insert(0, "/root/repo")

from flink_release_1_14_5_comment_spark.types_map import flink_type_to_spark


@pytest.mark.parametrize("flink,spark_t", [
    ("INT", T.IntegerType()),
    ("BIGINT NOT NULL", T.LongType()),
    ("DECIMAL(10, 2)", T.DecimalType(10, 2)),
    ("VARCHAR(255)", T.StringType()),
    ("TIMESTAMP(3)", T.TimestampType()),  # LTZ engine convention (ADVICE r3)
    ("TIMESTAMP_LTZ(3)", T.TimestampType()),
    ("TIME(0)", T.LongType()),
    ("ARRAY<INT>", T.ArrayType(T.IntegerType())),
    ("MULTISET<STRING>", T.MapType(T.StringType(), T.IntegerType())),
    ("MAP<STRING, DOUBLE>", T.MapType(T.StringType(), T.DoubleType())),
    ("ROW<a INT, b ARRAY<STRING>>", T.StructType([
        T.StructField("a", T.IntegerType(), True),
        T.StructField("b", T.ArrayType(T.StringType()), True),
    ])),
    ("INTERVAL DAY TO SECOND", T.DayTimeIntervalType()),
])
def test_flink_type_mapping(flink, spark_t):
    assert flink_type_to_spark(flink) == spark_t


def test_unsupported_type_raises():
    with pytest.raises(ValueError):
        flink_type_to_spark("GEOMETRY")


# -- §2.10 UDF surface: Flink ScalarFunction / AggregateFunction /
#    TableFunction → Spark udf / pandas_udf / UDTF ---------------------------

def test_scalar_udf_and_pandas_udf(spark):
    df = spark.range(100).select(F.col("id").cast("double").alias("x"))

    @F.udf(T.DoubleType())
    def plain(x):  # ScalarFunction analog (slow path)
        return x * 2

    @F.pandas_udf(T.DoubleType())
    def vectorized(s: pd.Series) -> pd.Series:  # Arrow path
        return s * 2

    out = df.select(plain("x").alias("a"), vectorized("x").alias("b"))
    pdf = out.toPandas()
    assert (pdf["a"] == pdf["b"]).all()


def test_grouped_agg_pandas_udf(spark, sf_dir):
    """AggregateFunction (UDAF) analog: GROUPED_AGG pandas_udf."""
    from flink_release_1_14_5_comment_spark.catalog import load_tables

    @F.pandas_udf(T.DoubleType())
    def trimmed_mean(v: pd.Series) -> float:
        lo, hi = v.quantile([0.1, 0.9])
        clipped = v[(v >= lo) & (v <= hi)]
        return float(clipped.mean()) if len(clipped) else float(v.mean())

    ev = load_tables(spark, sf_dir)["events"]
    out = ev.groupBy("event_type").agg(trimmed_mean("value").alias("tm")).toPandas()
    assert len(out) == 5 and out["tm"].notna().all()


def test_table_aggregate_apply_in_pandas(spark, sf_dir):
    """TableAggregateFunction (emits multiple rows per group, e.g. top2) —
    GroupTableAggFunction.java analog via applyInPandas."""
    from flink_release_1_14_5_comment_spark.catalog import load_tables

    def top2(pdf: pd.DataFrame) -> pd.DataFrame:
        return pdf.nlargest(2, "o_totalprice")[["o_custkey", "o_orderkey", "o_totalprice"]]

    o = load_tables(spark, sf_dir)["orders"]
    out = (
        o.groupBy("o_custkey")
        .applyInPandas(top2, "o_custkey long, o_orderkey long, o_totalprice double")
    )
    counts = out.groupBy("o_custkey").count().toPandas()
    assert (counts["count"] <= 2).all()


def test_python_udtf(spark):
    """TableFunction (UDTF) analog: Spark Python UDTF (3.5+)."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="word: string, n: int")
    class Splitter:
        def eval(self, text: str):
            for w in (text or "").split(","):
                yield w, len(w)

    Splitter(F.lit("ab,cde")).collect()  # direct invocation
    spark.udtf.register("splitter", Splitter)
    rows = spark.sql("SELECT * FROM splitter('x,yy,zzz')").collect()
    assert [(r["word"], r["n"]) for r in rows] == [("x", 1), ("yy", 2), ("zzz", 3)]
