"""Retrieval over the `documents`/`embeddings` tables: BM25 lexical top-k
and hybrid dense+sparse fusion (reciprocal rank fusion) — the search-side
primitives a training-data pipeline uses for decontamination lookups,
"more-like-this" near-dup triage, and retrieval-augmented filtering.

Reference parity note: the reference engine (Flink 1.14) ships no retrieval
operators; this module is deliberate beyond-reference surface alongside the
dedup/ANN family (SURVEY.md §2.4 note). The *join/agg shapes* it exercises
are the reference's hash-agg + broadcast-join physicals
(flink-table/flink-table-runtime/.../operators/join/HashJoinOperator.java,
aggregate/HashAggCodeGenerator.scala analog) — expressed declaratively so
Catalyst picks them.

Scale design (100 TB):
- Document length (the BM25 normalizer) is computed with `size(split(...))`
  — a pure per-row map; the full token multiset is NEVER shuffled for it.
- Tokens are exploded once and immediately inner-joined to the BROADCAST
  literal query-term table, so only tokens that appear in some query survive
  past the scan stage; the tf aggregation shuffles a few terms × docs, not
  the corpus token stream.
- Dense scoring is probe-broadcast brute force over pre-normalized vectors
  (the exactness baseline); the ANN serving path at scale is
  similarity.py's LSH/IVF/PQ family — fusion only needs the rank lists.
- All scores are rounded BEFORE ranking (4 dp) with doc_id tiebreaks, so
  ranking is deterministic across engines and partitionings.
- Every per-probe ranking stage runs through operators/scale.py's
  ``topk_per_key`` two-phase split (local row_number over
  (key, spark_partition_id) prune → global rank over ≤ k·n_partitions
  survivors) — with a handful of probe keys, a direct single-key window
  would funnel the whole corpus through 4-8 tasks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from flink_release_1_14_5_comment_spark.catalog import register_views
from flink_release_1_14_5_comment_spark.operators.scale import topk_per_key

# BM25 constants (Robertson/Sparck-Jones defaults; Lucene's idf variant).
_K1 = 1.2
_B = 0.75
_TOP_K = 5

# Literal query workload: term lists drawn from the synthetic corpus vocab.
_BM25_QUERIES = [
    (1, ("stream", "window", "join")),
    (2, ("hash", "merge", "sort")),
    (3, ("customer", "order", "table")),
    (4, ("filter", "scan", "batch")),
]

# Probe documents for document-as-query fusion (ids exist at every SF).
_PROBES = (7, 42, 123, 321)

_RRF_K = 60  # Cormack, Clarke & Buettcher 2009 constant

# Each retrieval side contributes its top-_RRF_DEPTH list to the fusion —
# the standard RRF formulation (fuse *retrieved lists*, not corpus-wide
# rankings). Besides being the textbook definition, this is what makes the
# operator scale-sane: ranks beyond the retrieval depth are never
# materialized. 128 also exceeds the proof bound R > 69 under which the
# fused top-5 membership equals the corpus-wide-rank variant's (a doc
# outside both top-128 lists has rrf ≤ 2/189 < 1/65, the worst 5th-best).
_RRF_DEPTH = 128


def _tok_arr() -> F.Column:
    """Whitespace tokens with empties removed — pure map, codegen'd."""
    return F.expr(
        "filter(split(regexp_replace(lower(trim(text)), '\\\\s+', ' '), ' '), x -> x <> '')"
    )


_TOKS_DUCK = (
    "list_filter(string_split(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' '), "
    "x -> x <> '')"
)


def _doc_stats(docs: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(per-doc length frame, 1-row corpus stats frame). dl comes from
    `size()` on the token array — no explode, no shuffle of tokens."""
    dl = docs.select("doc_id", F.size(_tok_arr()).cast("long").alias("dl"))
    stats = dl.agg(
        F.count(F.lit(1)).alias("n_docs"),
        # SUM(bigint)/COUNT is one exact integer sum + one division — the
        # same double in any engine / partition order.
        (F.sum("dl").cast("double") / F.count(F.lit(1))).alias("avgdl"),
    )
    return dl, stats


def _bm25_scores(spark: SparkSession, docs: DataFrame, qterms: DataFrame) -> DataFrame:
    """(qid, doc_id, score) for every doc matching ≥1 query term. qterms:
    (qid, term) — small, broadcast. Token stream is filtered by the
    broadcast join BEFORE any aggregation.

    r10 optimization note: two sharing variants for the double-consumed
    `hits` subtree were built and measured (tests/ab_compare_r10.py) —
    persisting the tokenized corpus, and persisting the tf aggregate so df
    derives from it. BOTH lost to this plain shape at bench scale: a
    persist costs a job + columnar materialization while re-running the
    tokenize map is one cheap codegen pass, and the df-from-tf rewrite is
    optimized right back to this plan by RemoveRedundantAggregates. At
    100 TB the sharing mechanism is a WRITTEN inverted index, not a
    session cache — out of scope for a query-shaped operator.

    Three MORE variants measured and rejected in session 5 on an idle
    host (OPTIMIZATION_r10.md "Session-5 negative results" — do not
    retry in round 2): (a) _spread()-style repartition before the
    tokenize/explode — no win, post-AQE stages coalesce to ~1 task at
    this SF anyway and the cost is per-job overhead, not the map;
    (b) deriving tf and df from one (term, doc_id) pre-aggregate hoping
    the shared Exchange is deduplicated — ReusedExchange NEVER fires
    (column pruning specializes each branch's copy), +3 exchanges;
    (c) carrying dl through the exploded token rows to drop the dl
    join — 3.5× worse (widened Generate + first() agg)."""
    dl, stats = _doc_stats(docs)
    toks = docs.select("doc_id", F.explode(_tok_arr()).alias("tok"))
    hits = toks.join(F.broadcast(qterms), toks.tok == qterms.term, "inner")
    tf = hits.groupBy("qid", "term", "doc_id").agg(F.count(F.lit(1)).alias("tf"))
    df_ = (
        hits.select("term", "doc_id").distinct()
        .groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    )
    idf = F.log(
        (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0
    )
    per_term = (
        tf.join(F.broadcast(df_), "term")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .withColumn(
            "w",
            idf * F.col("tf") * (_K1 + 1.0)
            / (F.col("tf") + _K1 * (1.0 - _B + _B * F.col("dl") / F.col("avgdl"))),
        )
    )
    return (
        per_term.groupBy("qid", "doc_id")
        .agg(F.round(F.sum("w"), 4).alias("score"))
    )


def q_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 top-5 per query over the document corpus. See module docstring
    for the 100 TB plan shape (broadcast term filter before the tf agg;
    size()-based dl with no token shuffle)."""
    t = register_views(spark, sf_dir)
    rows = [(qid, term) for qid, terms in _BM25_QUERIES for term in terms]
    qterms = spark.createDataFrame(rows, "qid int, term string")
    scored = _bm25_scores(spark, t["documents"], qterms)
    return (
        topk_per_key(scored, "qid", [F.col("score").desc(), F.col("doc_id")], _TOP_K)
        .withColumn("rn", F.col("rn").cast("long"))
        .select(F.col("qid").cast("int").alias("qid"), "doc_id", "score", "rn")
    )


# Shared DuckDB CTE chain: expects a `qterms(qid, term)` CTE to already be
# defined; yields dl/stats/toks/hits/tf/df_/scored.
_BM25_SCORED_CTES = f"""
dl AS (
  SELECT doc_id, CAST(len({_TOKS_DUCK}) AS BIGINT) AS dl FROM documents
), stats AS (
  SELECT COUNT(*) AS n_docs, SUM(dl)::DOUBLE / COUNT(*) AS avgdl FROM dl
), toks AS (
  SELECT doc_id, unnest({_TOKS_DUCK}) AS tok FROM documents
), hits AS (
  SELECT q.qid, q.term, t.doc_id FROM toks t JOIN qterms q ON t.tok = q.term
), tf AS (
  SELECT qid, term, doc_id, COUNT(*) AS tf FROM hits GROUP BY 1, 2, 3
), df_ AS (
  SELECT term, COUNT(DISTINCT doc_id) AS df FROM hits GROUP BY term
), scored AS (
  SELECT tf.qid, tf.doc_id,
         -- every operand cast to DOUBLE so DuckDB's DECIMAL arithmetic
         -- never enters: the Spark side computes in pure double
         ROUND(SUM(
           ln((s.n_docs - df_.df + 0.5::DOUBLE) / (df_.df + 0.5::DOUBLE) + 1.0)
           * tf.tf * {_K1 + 1.0}
           / (tf.tf + {_K1} * (1.0 - {_B} + {_B} * dl.dl / s.avgdl))
         ), 4) AS score
  FROM tf JOIN df_ USING (term) JOIN dl USING (doc_id) CROSS JOIN stats s
  GROUP BY 1, 2
)"""

_QTERMS_DUCK = "SELECT * FROM (VALUES " + ", ".join(
    f"({qid}, '{term}')" for qid, terms in _BM25_QUERIES for term in terms
) + ") t(qid, term)"

ORACLE_Q_BM25_TOPK = f"""
WITH qterms AS ({_QTERMS_DUCK}),
{_BM25_SCORED_CTES}
SELECT CAST(qid AS INT) AS qid, doc_id, score, CAST(rn AS BIGINT) AS rn
FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY qid ORDER BY score DESC, doc_id) AS rn
      FROM scored)
WHERE rn <= {_TOP_K}
"""


# ---------------------------------------------------------------------------
# Hybrid dense + sparse retrieval with reciprocal rank fusion.
# ---------------------------------------------------------------------------

_DOT = (
    "aggregate(zip_with({a}, {b}, (x, y) -> cast(x as double) * cast(y as double)), "
    "cast(0.0 as double), (acc, v) -> acc + v)"
)


def q_hybrid_rrf_fusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document-as-query hybrid retrieval: for each probe document, retrieve
    the top-128 corpus docs by (a) dense cosine over its embedding and (b)
    sparse BM25 over its distinct tokens, then fuse the two rank lists with
    reciprocal rank fusion (1/(60+rank), side absent from a list contributes
    0 — the standard RRF-over-retrieved-lists definition) and keep the
    top-5. This is the near-dup/contamination triage query: the probe's own
    row surfaces at dense rank 1 as a built-in sanity column. Both rank
    lists use rounded scores + doc_id tiebreaks, so fusion is
    engine-deterministic; every ranking stage runs through the two-phase
    ``topk_per_key`` split, so no window ever funnels the corpus through a
    single per-probe task."""
    t = register_views(spark, sf_dir)
    docs, emb = t["documents"], t["embeddings"]
    probes_pred = F.col("doc_id").isin(*_PROBES)

    # dense: broadcast the probe vectors, brute-force cosine (exact
    # baseline). Norms are hoisted OUT of the pair loop (each side's
    # self-dot computed once per row, not once per pair — the
    # similarity.py _cosine_pre pattern): sqrt operands are identical, so
    # the rounded score is bit-identical to the inline form.
    pe = (
        emb.filter(F.col("vec_id").isin(*_PROBES))
        .select(
            F.col("vec_id").alias("qid"),
            F.col("embedding").alias("qe"),
            F.sqrt(F.expr(_DOT.format(a="embedding", b="embedding"))).alias("qn"),
        )
    )
    corpus = emb.select(
        "vec_id", "embedding",
        F.sqrt(F.expr(_DOT.format(a="embedding", b="embedding"))).alias("en"),
    )
    dscored = corpus.crossJoin(F.broadcast(pe)).select(
        "qid",
        F.col("vec_id").alias("doc_id"),
        F.round(
            F.expr(_DOT.format(a="embedding", b="qe"))
            / (F.col("en") * F.col("qn")),
            4,
        ).alias("dscore"),
    )
    dense = topk_per_key(
        dscored, "qid", [F.col("dscore").desc(), F.col("doc_id")],
        _RRF_DEPTH, rank_col="drank",
    )

    # sparse: the probe's DISTINCT tokens are the query-term table (the
    # doc_id filter pushes to the scan, so only the 4 probe rows tokenize)
    qterms = (
        docs.filter(probes_pred)
        .select(F.col("doc_id").cast("int").alias("qid"), F.explode(_tok_arr()).alias("term"))
        .distinct()
    )
    sparse = topk_per_key(
        _bm25_scores(spark, docs, qterms),
        "qid", [F.col("score").desc(), F.col("doc_id")],
        _RRF_DEPTH, rank_col="srank",
    )

    # fused input is ≤ 2·_RRF_DEPTH rows per probe — already bounded
    fused = (
        dense.select("qid", "doc_id", "drank")
        .join(sparse.select("qid", "doc_id", "srank"), ["qid", "doc_id"], "full_outer")
        .withColumn(
            "rrf",
            F.round(
                F.coalesce(1.0 / (_RRF_K + F.col("drank")), F.lit(0.0))
                + F.coalesce(1.0 / (_RRF_K + F.col("srank")), F.lit(0.0)),
                6,
            ),
        )
    )
    return (
        topk_per_key(fused, "qid", [F.col("rrf").desc(), F.col("doc_id")], _TOP_K)
        .withColumn("rn", F.col("rn").cast("long"))
        .select(
            F.col("qid").cast("int").alias("qid"),
            "doc_id",
            "rrf",
            F.col("drank").cast("long").alias("dense_rank"),
            F.col("srank").cast("long").alias("sparse_rank"),
            "rn",
        )
    )


_PROBE_LIST = ", ".join(str(p) for p in _PROBES)

ORACLE_Q_HYBRID_RRF_FUSION = f"""
WITH pe AS (
  SELECT vec_id AS qid, embedding AS qe FROM embeddings WHERE vec_id IN ({_PROBE_LIST})
), dense AS (
  SELECT p.qid, e.vec_id AS doc_id,
         ROUND(list_cosine_similarity(e.embedding::DOUBLE[], p.qe::DOUBLE[]), 4) AS dscore
  FROM embeddings e CROSS JOIN pe p
), dranked AS (
  SELECT * FROM (
    SELECT qid, doc_id,
           ROW_NUMBER() OVER (PARTITION BY qid ORDER BY dscore DESC, doc_id) AS drank
    FROM dense)
  WHERE drank <= {_RRF_DEPTH}
), qterms AS (
  SELECT DISTINCT CAST(doc_id AS INT) AS qid, unnest({_TOKS_DUCK}) AS term
  FROM documents WHERE doc_id IN ({_PROBE_LIST})
),
{_BM25_SCORED_CTES},
sparse AS (
  SELECT * FROM (
    SELECT qid, doc_id, score,
           ROW_NUMBER() OVER (PARTITION BY qid ORDER BY score DESC, doc_id) AS srank
    FROM scored)
  WHERE srank <= {_RRF_DEPTH}
), fused AS (
  SELECT COALESCE(d.qid, s.qid) AS qid,
         COALESCE(d.doc_id, s.doc_id) AS doc_id,
         ROUND(COALESCE(1.0::DOUBLE / ({_RRF_K} + d.drank), 0.0)
               + COALESCE(1.0::DOUBLE / ({_RRF_K} + s.srank), 0.0), 6) AS rrf,
         d.drank, s.srank
  FROM dranked d FULL OUTER JOIN sparse s
    ON d.qid = s.qid AND d.doc_id = s.doc_id
)
SELECT CAST(qid AS INT) AS qid, doc_id, rrf,
       CAST(drank AS BIGINT) AS dense_rank,
       CAST(srank AS BIGINT) AS sparse_rank,
       CAST(rn AS BIGINT) AS rn
FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY qid ORDER BY rrf DESC, doc_id) AS rn
      FROM fused)
WHERE rn <= {_TOP_K}
"""


QUERIES = {
    "bm25_topk": q_bm25_topk,
    "hybrid_rrf_fusion": q_hybrid_rrf_fusion,
}

ORACLE = {
    "bm25_topk": ORACLE_Q_BM25_TOPK,
    "hybrid_rrf_fusion": ORACLE_Q_HYBRID_RRF_FUSION,
}
