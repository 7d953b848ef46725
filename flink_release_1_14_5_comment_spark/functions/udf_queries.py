"""Oracle-graded Python-UDF gauntlet (SURVEY §2.10).

The reference runs Python user code through its Py4J/Beam bridge
(flink-python AbstractPythonFunctionOperator, vectorized variants in
PandasAggregateFunctionOperator); Spark's native equivalents are
Arrow-vectorized pandas UDFs and mapInPandas. §2.10's six rows are all
pytest-covered (tests/test_types_and_udfs.py); this query additionally puts
THREE Python execution paths behind the driver's DuckDB oracle in one plan:

  1. SCALAR pandas UDF (Arrow batch in/out)      — chars-per-token ratio;
  2. GROUPED_AGG pandas UDF (whole group in)     — geometric mean per lang;
  3. mapInPandas (UDTF-style one-to-many)        — token fan-out, first 10
     tokens per doc, long-token counting.

Every Python computation mirrors closed-form SQL (n/wc, exp(avg(ln x)),
unnest + filter), so a drift anywhere in the Arrow bridge — wrong batch
split, dropped group, off-by-one slice — fails the value hash.

Scale: all three paths are Arrow-batched (never row-at-a-time Py4J); the
scalar UDF and the fan-out are embarrassingly parallel maps, the grouped
agg shuffles once on a bounded key. This module is the ONLY place Python
touches the graded batch surface — everything else is codegen SQL — which
is exactly the "UDFs are the slow path, isolate them" posture the engine
documents (SCALE.md)."""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from flink_release_1_14_5_comment_spark.catalog import register_views

_TOKS = r"split(regexp_replace(lower(trim(text)), '\\s+', ' '), ' ')"
_FIRST_K = 10
_LONG = 5


def q_python_udf_gauntlet(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = register_views(spark, sf_dir)["documents"]

    @pandas_udf("double")
    def chars_per_tok(n_chars: pd.Series, wc: pd.Series) -> pd.Series:
        return n_chars / wc

    @pandas_udf("double")
    def geo_mean(v: pd.Series) -> float:
        import numpy as np

        return float(np.exp(np.log(v.to_numpy()).mean()))

    # Spark refuses mixing a GROUPED_AGG pandas UDF with built-in aggregates
    # in one Aggregate (INVALID_PANDAS_UDF_PLACEMENT) — the count therefore
    # also rides the pandas path, which incidentally grades it too.
    @pandas_udf("long")
    def grp_count(v: pd.Series) -> int:
        return int(len(v))

    def first_tokens(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            toks = (pdf["text"].str.strip().str.lower()
                    .str.replace(r"\s+", " ", regex=True).str.split(" "))
            out = pdf[["lang"]].copy()
            out["toks"] = toks.map(lambda t: t[:_FIRST_K])
            yield out.explode("toks").rename(columns={"toks": "tok"})[
                ["lang", "tok"]]

    base = docs.select(
        "lang", "text",
        F.col("n_chars").cast("double").alias("nc"),
        F.size(F.expr(_TOKS)).cast("double").alias("wc"))
    agg = (base.select("lang", chars_per_tok("nc", "wc").alias("cpt"))
           .groupBy("lang")
           .agg(grp_count("cpt").alias("n_docs"),
                F.round(geo_mean("cpt"), 4).alias("geo_cpt")))
    longs = (docs.select("lang", "text")
             .mapInPandas(first_tokens, "lang string, tok string")
             .filter(F.length("tok") >= _LONG)
             .groupBy("lang")
             .agg(F.count(F.lit(1)).alias("n_long_toks")))
    return agg.join(longs, "lang").select(
        "lang", "n_docs", "geo_cpt",
        F.col("n_long_toks").cast("long").alias("n_long_toks"))


ORACLE_Q_PYTHON_UDF_GAUNTLET = rf"""
WITH base AS (
  SELECT lang, n_chars,
         string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ') AS toks
  FROM documents
), agg AS (
  SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
         ROUND(EXP(AVG(LN(n_chars::DOUBLE / len(toks)))), 4) AS geo_cpt
  FROM base GROUP BY lang
), fan AS (
  SELECT lang, unnest(toks[1:{_FIRST_K}]) AS tok FROM base
), longs AS (
  SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_long_toks
  FROM fan WHERE length(tok) >= {_LONG} GROUP BY lang
)
SELECT a.lang, a.n_docs, a.geo_cpt, l.n_long_toks
FROM agg a JOIN longs l ON l.lang = a.lang
"""


def q_async_io_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Async I/O operator graded (reference AsyncWaitOperator.java:79 /
    AsyncDataStream ORDERED mode): every order row makes an awaited
    per-record "service call" under a bounded-capacity semaphore
    (streaming/async_io.async_map — asyncio.gather inside each Arrow
    batch). The stub service is deterministic arithmetic, so the oracle
    states the enrichment in SQL exactly; what this grades is the operator
    plumbing — loop lifecycle, capacity gating, row↔dict round-trip, column
    merge, declared output schema — none of which may lose or reorder
    fields without failing the hash."""
    import asyncio

    from flink_release_1_14_5_comment_spark.streaming.async_io import (
        async_map,
    )

    orders = register_views(spark, sf_dir)["orders"].select(
        "o_orderkey", "o_orderpriority", "o_totalprice")

    async def service(row: dict) -> dict:
        await asyncio.sleep(0)  # real await point, zero wall cost
        return {"bucket": int(row["o_orderkey"]) % 7,
                "pri_len": len(row["o_orderpriority"])}

    enriched = async_map(
        orders, service,
        "o_orderkey long, o_orderpriority string, o_totalprice double, "
        "bucket long, pri_len long",
        capacity=32)
    return (enriched.groupBy("bucket", "pri_len")
            .agg(F.count(F.lit(1)).cast("long").alias("n"),
                 F.round(F.sum("o_totalprice"), 2).alias("sum_price")))


ORACLE_Q_ASYNC_IO_ENRICH = """
SELECT o_orderkey % 7 AS bucket,
       CAST(length(o_orderpriority) AS BIGINT) AS pri_len,
       CAST(COUNT(*) AS BIGINT) AS n,
       ROUND(SUM(o_totalprice), 2) AS sum_price
FROM orders
GROUP BY 1, 2
"""


QUERIES = {"python_udf_gauntlet": q_python_udf_gauntlet,
           "async_io_enrich": q_async_io_enrich}
ORACLE = {"python_udf_gauntlet": ORACLE_Q_PYTHON_UDF_GAUNTLET,
          "async_io_enrich": ORACLE_Q_ASYNC_IO_ENRICH}
