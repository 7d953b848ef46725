"""Sketch- and sampling-based corpus operators: count-min heavy hitters,
Bloom-filter contamination screening, exact-percentile quality cuts,
weighted reservoir sampling (Efraimidis–Spirakis), and decile bucketing.

These are the *approximate / probabilistic* counterparts of the exact
operators in pipeline/packing.py (`contamination_overlap`) and
pipeline/text_analysis.py (`token_counts`): at 100 TB you cannot afford an
exact distinct-gram join against every benchmark, but a 1 KB Bloom bitmap or
a d×w count-min grid broadcast to every executor answers the same question
in one map pass. The reference engine ships no approximate aggregates
(SURVEY §2.4 note: APPROX_COUNT_DISTINCT/percentile are absent from
FlinkSqlOperatorTable.java) — these operators are the "beyond the reference"
training-pipeline surface this repo adds, in the same spirit as the
MinHash/SimHash family (pipeline/dedup.py).

Determinism contract: every hash derives from md5 (identical text output in
Spark and DuckDB), so the *same* sketch — same buckets, same bit positions,
same sample keys — is built by both engines and the DuckDB oracle checks
values exactly, not statistically.

Scale design (100 TB):
* `cms_heavy_hitters`: the sketch is d×w = 3×128 cells — the build is one
  explode + map-side-combined groupBy onto ≤384 keys (tiny, uniform: buckets
  are md5-distributed). The estimate join touches only candidate tokens;
  in production the d×w grid is `collect()`-ed (384 longs) and broadcast,
  making estimation a pure map. The top-k is TakeOrderedAndProject — only
  k rows reach the driver.
* `bloom_contamination`: the filter is m=8192 bits built from the eval
  split's grams; at scale it is a broadcast bitmap (Spark's own
  runtime-bloom-filter join uses the identical plan shape). Here the set of
  SET positions (≤8192 rows) broadcast-joins against probe-gram positions —
  no shuffle of the 100 TB side at all; the exact-join audit column is the
  part you'd drop in production.
* `quality_percentile_cut`: exact per-language percentiles need a full sort
  per group — fine for bounded language counts; at petabyte scale swap
  `percentile` for `approx_percentile` (documented in the docstring; the
  oracle pins the exact variant).
* `weighted_sample`: one window per language partition. Language is a
  bounded, potentially skewed key — the scale path is the standard two-phase
  top-k (per-partition row_number prune to k, then global), which AQE's
  skew-join handling approximates automatically for the window exchange.
* `quality_ntile_buckets`: a single global sort for exact deciles; at scale
  use `approx_percentile` cut points + a map-side bucket assignment (noted
  here, exact variant kept for the oracle).

Reference parity anchors: the reference's closest surface is its batch agg
stack (flink-table-runtime HashAggregate, `BatchExecHashAggregate.java:50`)
and rank operator (`RankOperator.java`); the sketches themselves are new
capability, built Spark-first.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from flink_release_1_14_5_comment_spark.catalog import register_views

# Shared tokenization — identical semantics in both dialects (see quality.py).
_TOKS_SPARK = r"split(regexp_replace(lower(trim(text)), '\\s+', ' '), ' ')"
_TOKS_DUCK = r"string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ')"

# Cross-engine 32-bit md5 hash of a string expression.
def _h_spark(expr: str) -> str:
    return f"cast(conv(substr(md5({expr}), 1, 8), 16, 10) as bigint)"


def _h_duck(expr: str) -> str:
    return f"('0x' || substr(md5({expr}), 1, 8))::BIGINT"


# ---------------------------------------------------------------------------
# 1. Count-min sketch heavy hitters (Cormode & Muthukrishnan 2005).
# ---------------------------------------------------------------------------

_CMS_DEPTH = 3
_CMS_WIDTH = 128
_CMS_TOPK = 20

_CMS_SPARK = f"""
WITH tok AS (
  SELECT word FROM (SELECT {_TOKS_SPARK} AS words FROM documents)
  LATERAL VIEW explode(words) t AS word
), truth AS (
  SELECT word, COUNT(*) AS true_count FROM tok GROUP BY word
), cells AS (
  -- sketch the pre-aggregated counts, not the raw token stream: one
  -- tokenize+word-count shuffle feeds both the sketch build and the audit
  SELECT r, {_h_spark("concat('cms', cast(r as string), ':', word)")} % {_CMS_WIDTH} AS bucket,
         SUM(true_count) AS cnt
  FROM truth LATERAL VIEW explode(sequence(0, {_CMS_DEPTH - 1})) d AS r
  GROUP BY 1, 2
), probe AS (
  SELECT word, r, {_h_spark("concat('cms', cast(r as string), ':', word)")} % {_CMS_WIDTH} AS bucket
  FROM truth LATERAL VIEW explode(sequence(0, {_CMS_DEPTH - 1})) d AS r
), est AS (
  SELECT p.word, MIN(c.cnt) AS est_count
  FROM probe p JOIN cells c ON p.r = c.r AND p.bucket = c.bucket
  GROUP BY p.word
)
SELECT e.word AS token,
       CAST(e.est_count AS BIGINT) AS est_count,
       CAST(t.true_count AS BIGINT) AS true_count,
       CAST(e.est_count - t.true_count AS BIGINT) AS overcount
FROM est e JOIN truth t ON e.word = t.word
ORDER BY est_count DESC, token
LIMIT {_CMS_TOPK}
"""

ORACLE_Q_CMS_HEAVY_HITTERS = f"""
WITH tok AS (
  SELECT unnest({_TOKS_DUCK}) AS word FROM documents
), truth AS (
  SELECT word, COUNT(*) AS true_count FROM tok GROUP BY word
), cells AS (
  SELECT r, {_h_duck("'cms' || r::VARCHAR || ':' || word")} % {_CMS_WIDTH} AS bucket,
         SUM(true_count) AS cnt
  FROM truth, unnest(generate_series(0, {_CMS_DEPTH - 1})) AS d(r)
  GROUP BY 1, 2
), probe AS (
  SELECT word, r, {_h_duck("'cms' || r::VARCHAR || ':' || word")} % {_CMS_WIDTH} AS bucket
  FROM truth, unnest(generate_series(0, {_CMS_DEPTH - 1})) AS d(r)
), est AS (
  SELECT p.word, MIN(c.cnt) AS est_count
  FROM probe p JOIN cells c ON p.r = c.r AND p.bucket = c.bucket
  GROUP BY p.word
)
SELECT e.word AS token,
       CAST(e.est_count AS BIGINT) AS est_count,
       CAST(t.true_count AS BIGINT) AS true_count,
       CAST(e.est_count - t.true_count AS BIGINT) AS overcount
FROM est e JOIN truth t ON e.word = t.word
ORDER BY est_count DESC, token
LIMIT {_CMS_TOPK}
"""


def q_cms_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch token-frequency estimation: build a 3×128 grid of
    md5-bucketed counters over the corpus token stream, then estimate each
    token's frequency as the MIN over its 3 cells and report the top-20
    estimated heavy hitters beside their true counts (`overcount` ≥ 0 is the
    CMS one-sided error — the oracle checks it exactly). The grid is the
    structure you'd broadcast to filter a 100 TB corpus by token frequency
    without a global word-count shuffle."""
    register_views(spark, sf_dir)
    return spark.sql(_CMS_SPARK)


# ---------------------------------------------------------------------------
# 2. Bloom-filter contamination screen (Bloom 1970; the sketch version of
#    packing.q_contamination_overlap).
# ---------------------------------------------------------------------------

_BF_BITS = 8192
_BF_K = 3

ORACLE_Q_BLOOM_CONTAMINATION = f"""
WITH base AS (
  SELECT doc_id, lang, {_TOKS_DUCK} AS t,
         {_h_duck("'eval:' || doc_id::VARCHAR")} % 20 = 0 AS is_eval
  FROM documents
), g AS (
  SELECT doc_id, lang, is_eval,
         unnest(CASE WHEN len(t) >= 5
                     THEN list_transform(range(1, len(t) - 3),
                                         i -> array_to_string(t[i:i+4], ' '))
                     ELSE [] END) AS gram
  FROM base
), bloom AS (
  SELECT DISTINCT {_h_duck("'bf' || j::VARCHAR || ':' || gram")} % {_BF_BITS} AS pos
  FROM (SELECT DISTINCT gram FROM g WHERE is_eval),
       unnest(generate_series(0, {_BF_K - 1})) AS d(j)
), train AS (
  SELECT DISTINCT lang, gram FROM g WHERE NOT is_eval
), probed AS (
  SELECT t.lang, t.gram, COUNT(b.pos) = {_BF_K} AS flagged
  FROM (
    SELECT lang, gram, j,
           {_h_duck("'bf' || j::VARCHAR || ':' || gram")} % {_BF_BITS} AS pos
    FROM train, unnest(generate_series(0, {_BF_K - 1})) AS d(j)
  ) t LEFT JOIN bloom b ON t.pos = b.pos
  GROUP BY t.lang, t.gram
), truth AS (
  SELECT tr.lang, tr.gram, eg.gram IS NOT NULL AS is_hit
  FROM train tr LEFT JOIN (SELECT DISTINCT gram FROM g WHERE is_eval) eg
    ON tr.gram = eg.gram
)
SELECT p.lang,
       CAST(COUNT(*) AS BIGINT) AS n_grams,
       CAST(SUM(CASE WHEN p.flagged THEN 1 ELSE 0 END) AS BIGINT) AS n_flagged,
       CAST(SUM(CASE WHEN t.is_hit THEN 1 ELSE 0 END) AS BIGINT) AS n_true,
       CAST(SUM(CASE WHEN p.flagged AND NOT t.is_hit THEN 1 ELSE 0 END) AS BIGINT) AS n_false_pos
FROM probed p JOIN truth t ON p.lang = t.lang AND p.gram = t.gram
GROUP BY p.lang
"""


def q_bloom_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter benchmark-contamination screen: hash the 5% eval split's
    distinct word 5-grams into an 8192-bit / 3-hash Bloom filter, probe every
    train-split gram against it, and report per-language flagged counts
    beside the exact join's truth (false positives = Bloom's one-sided
    error; false negatives are impossible and the oracle proves it). At
    100 TB the filter is a broadcast bitmap and the probe is a pure map —
    the exact-join audit columns are the part you drop in production.

    The gram explosion (the expensive map over the corpus) runs ONCE into a
    persisted frame that the bloom-build, probe, and exact-audit branches
    all read — the _BLOOM_SPARK CTE form would re-tokenize per branch
    (Spark CTEs are not materialized)."""
    register_views(spark, sf_dir)
    g = spark.sql(f"""
        WITH base AS (
          SELECT doc_id, lang, {_TOKS_SPARK} AS t,
                 {_h_spark("concat('eval:', cast(doc_id as string))")} % 20 = 0 AS is_eval
          FROM documents
        )
        SELECT doc_id, lang, is_eval, gram
        FROM base LATERAL VIEW explode(
          CASE WHEN size(t) >= 5 THEN transform(sequence(1, size(t) - 4),
               i -> concat_ws(' ', slice(t, i, 5)))
          ELSE CAST(array() AS array<string>) END) x AS gram
    """).persist()
    g.createOrReplaceTempView("__bloom_grams")
    return spark.sql(f"""
        WITH bloom AS (
          SELECT DISTINCT {_h_spark("concat('bf', cast(j as string), ':', gram)")} % {_BF_BITS} AS pos
          FROM (SELECT DISTINCT gram FROM __bloom_grams WHERE is_eval)
          LATERAL VIEW explode(sequence(0, {_BF_K - 1})) d AS j
        ), train AS (
          SELECT DISTINCT lang, gram FROM __bloom_grams WHERE NOT is_eval
        ), probed AS (
          SELECT t.lang, t.gram, COUNT(b.pos) = {_BF_K} AS flagged
          FROM (
            SELECT lang, gram, j,
                   {_h_spark("concat('bf', cast(j as string), ':', gram)")} % {_BF_BITS} AS pos
            FROM train LATERAL VIEW explode(sequence(0, {_BF_K - 1})) d AS j
          ) t LEFT JOIN bloom b ON t.pos = b.pos
          GROUP BY t.lang, t.gram
        ), truth AS (
          SELECT tr.lang, tr.gram, eg.gram IS NOT NULL AS is_hit
          FROM train tr LEFT JOIN
            (SELECT DISTINCT gram FROM __bloom_grams WHERE is_eval) eg
            ON tr.gram = eg.gram
        )
        SELECT p.lang,
               CAST(COUNT(*) AS BIGINT) AS n_grams,
               CAST(SUM(CASE WHEN p.flagged THEN 1 ELSE 0 END) AS BIGINT) AS n_flagged,
               CAST(SUM(CASE WHEN t.is_hit THEN 1 ELSE 0 END) AS BIGINT) AS n_true,
               CAST(SUM(CASE WHEN p.flagged AND NOT t.is_hit THEN 1 ELSE 0 END) AS BIGINT) AS n_false_pos
        FROM probed p JOIN truth t ON p.lang = t.lang AND p.gram = t.gram
        GROUP BY p.lang
    """)


# ---------------------------------------------------------------------------
# 3. Exact-percentile quality cut.
# ---------------------------------------------------------------------------

def _pct_sql(score_expr: str) -> str:
    """Shared percentile-cut SQL: linear-interpolated p10/p50/p90 computed
    MANUALLY from exact order statistics — a + (b-a)·frac over the same
    IEEE doubles in both engines, so the cuts are BIT-identical and the
    tail counts can compare raw scores against them with no ULP boundary
    (round-5 fix: Spark `percentile` vs DuckDB `quantile_cont` agreed to
    ~1e-15 but not to the bit, and at sf0.1 two docs sat exactly on the
    diverging bit)."""
    return f"""
WITH scored AS (
  SELECT doc_id, lang, {score_expr} AS score
  FROM documents
), counts AS (
  SELECT lang, COUNT(*) AS n FROM scored GROUP BY lang
), ranked AS (
  SELECT lang, score,
         ROW_NUMBER() OVER (PARTITION BY lang ORDER BY score, doc_id) AS rn
  FROM scored
), pos AS (
  SELECT c.lang, t.q,
         CAST(FLOOR(t.q * (c.n - 1)) AS BIGINT) AS lo,
         t.q * (c.n - 1) - FLOOR(t.q * (c.n - 1)) AS frac
  FROM counts c
  CROSS JOIN (SELECT CAST(0.1 AS DOUBLE) AS q
              UNION ALL SELECT 0.5 UNION ALL SELECT 0.9) t
), cuts AS (
  SELECT p.lang, p.q,
         ra.score + (COALESCE(rb.score, ra.score) - ra.score) * p.frac AS cut
  FROM pos p
  JOIN ranked ra ON ra.lang = p.lang AND ra.rn = p.lo + 1
  LEFT JOIN ranked rb ON rb.lang = p.lang AND rb.rn = p.lo + 2
), wide AS (
  SELECT lang,
         MAX(CASE WHEN q = 0.1 THEN cut END) AS p10,
         MAX(CASE WHEN q = 0.5 THEN cut END) AS p50,
         MAX(CASE WHEN q = 0.9 THEN cut END) AS p90
  FROM cuts GROUP BY lang
)
SELECT s.lang,
       ROUND(MAX(w.p10), 4) AS p10,
       ROUND(MAX(w.p50), 4) AS p50,
       ROUND(MAX(w.p90), 4) AS p90,
       CAST(SUM(CASE WHEN s.score < w.p10 THEN 1 ELSE 0 END) AS BIGINT) AS n_low_tail,
       CAST(SUM(CASE WHEN s.score > w.p90 THEN 1 ELSE 0 END) AS BIGINT) AS n_high_tail,
       CAST(COUNT(*) AS BIGINT) AS n_docs
FROM scored s JOIN wide w ON s.lang = w.lang
GROUP BY s.lang
"""


_PCT_SPARK = _pct_sql(f"CAST(length(text) AS DOUBLE) / size({_TOKS_SPARK})")
ORACLE_Q_QUALITY_PERCENTILE_CUT = _pct_sql(
    f"length(text)::DOUBLE / len({_TOKS_DUCK})")


def q_quality_percentile_cut(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language exact p10/p50/p90 of a chars-per-token quality score with
    tail counts — the threshold-derivation step of a quality filter (CCNet
    keeps the best-perplexity tercile the same way). The interpolation runs
    on exact order statistics with the identical formula text in both
    engines (see _pct_sql), matching percentile/quantile_cont semantics
    bit-for-bit. At 100 TB substitute
    `approx_percentile(score, array(0.1,0.5,0.9), accuracy)` — same plan
    shape, one pass, no per-group sort."""
    register_views(spark, sf_dir)
    return spark.sql(_PCT_SPARK)


# ---------------------------------------------------------------------------
# 4. Weighted sampling without replacement (Efraimidis & Spirakis 2006).
# ---------------------------------------------------------------------------

_WS_PER_LANG = 3

_WS_SPARK = f"""
WITH w AS (
  SELECT doc_id, lang, size({_TOKS_SPARK}) AS ntok,
         ({_h_spark("concat('ws:', cast(doc_id as string))")} % 1000000 + 1)
           / 1000001.0 AS u
  FROM documents
), keyed AS (
  SELECT doc_id, lang, ntok, LN(u) / ntok AS k FROM w WHERE ntok > 0
), ranked AS (
  SELECT doc_id, lang, ntok, k,
         ROW_NUMBER() OVER (PARTITION BY lang ORDER BY k DESC, doc_id) AS rn
  FROM keyed
)
SELECT lang, doc_id, CAST(ntok AS BIGINT) AS ntok, ROUND(k, 6) AS sample_key,
       CAST(rn AS INT) AS rn
FROM ranked WHERE rn <= {_WS_PER_LANG}
"""

ORACLE_Q_WEIGHTED_SAMPLE = f"""
WITH w AS (
  SELECT doc_id, lang, len({_TOKS_DUCK}) AS ntok,
         ({_h_duck("'ws:' || doc_id::VARCHAR")} % 1000000 + 1) / 1000001.0 AS u
  FROM documents
), keyed AS (
  SELECT doc_id, lang, ntok, LN(u) / ntok AS k FROM w WHERE ntok > 0
), ranked AS (
  SELECT doc_id, lang, ntok, k,
         ROW_NUMBER() OVER (PARTITION BY lang ORDER BY k DESC, doc_id) AS rn
  FROM keyed
)
SELECT lang, doc_id, CAST(ntok AS BIGINT) AS ntok, ROUND(k, 6) AS sample_key,
       CAST(rn AS INT) AS rn
FROM ranked WHERE rn <= {_WS_PER_LANG}
"""


def q_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic weighted sampling without replacement: Efraimidis-
    Spirakis keys ln(u)/w with md5-derived uniforms and token-count weights,
    top-3 per language — the standard one-pass distributed algorithm for
    'sample 1M docs proportional to length' (key computation is a pure map;
    only the top-k survives the exchange). The md5 uniform makes the sample
    reproducible run-to-run and engine-to-engine, which is what a training-
    data pipeline needs for auditability."""
    register_views(spark, sf_dir)
    return spark.sql(_WS_SPARK)


# ---------------------------------------------------------------------------
# 5. Decile bucketing (NTILE) of the corpus by quality score.
# ---------------------------------------------------------------------------

_NTILE_SPARK = f"""
WITH scored AS (
  SELECT doc_id, size({_TOKS_SPARK}) AS ntok,
         CAST(length(text) AS DOUBLE) / size({_TOKS_SPARK}) AS score
  FROM documents
), buckets AS (
  SELECT doc_id, ntok, score,
         NTILE(10) OVER (ORDER BY score, doc_id) AS decile
  FROM scored
)
SELECT CAST(decile AS INT) AS decile,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       ROUND(AVG(score), 4) AS avg_score,
       CAST(SUM(ntok) AS BIGINT) AS total_tokens
FROM buckets GROUP BY decile
"""

ORACLE_Q_QUALITY_NTILE_BUCKETS = f"""
WITH scored AS (
  SELECT doc_id, len({_TOKS_DUCK}) AS ntok,
         length(text)::DOUBLE / len({_TOKS_DUCK}) AS score
  FROM documents
), buckets AS (
  SELECT doc_id, ntok, score,
         NTILE(10) OVER (ORDER BY score, doc_id) AS decile
  FROM scored
)
SELECT CAST(decile AS INT) AS decile,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       ROUND(AVG(score), 4) AS avg_score,
       CAST(SUM(ntok) AS BIGINT) AS total_tokens
FROM buckets GROUP BY decile
"""


def q_quality_ntile_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact decile bucketing of the corpus by quality score (NTILE over a
    unique sort key, so the assignment is deterministic in any engine) with
    per-decile document and token rollups — the 'how much data survives each
    quality cut' planning table. At 100 TB replace the global NTILE sort
    with approx_percentile cut points + a map-side bucket assignment."""
    register_views(spark, sf_dir)
    return spark.sql(_NTILE_SPARK)


# ---------------------------------------------------------------------------
# 6. Linear-counting distinct estimation (Whang, Vander-Zanden & Taylor 1990).
# ---------------------------------------------------------------------------

_LC_M = 1024

_LC_SPARK = f"""
WITH ev AS (
  SELECT event_type, concat('u', cast(user_id as string)) AS item FROM events
), hits AS (
  SELECT event_type,
         COUNT(DISTINCT {_h_spark("concat('lc:', item)")} % {_LC_M}) AS occupied,
         COUNT(DISTINCT item) AS exact_distinct
  FROM ev GROUP BY event_type
)
SELECT event_type,
       CAST(occupied AS BIGINT) AS occupied,
       -- GREATEST guard: a saturated bitmap (occupied = m) would be LN(0);
       -- the standard fallback caps the estimate at m*ln(m)
       CAST(ROUND(-{_LC_M} * LN(GREATEST({_LC_M} - occupied, 1) / {_LC_M}.0), 0) AS BIGINT) AS est_distinct,
       CAST(exact_distinct AS BIGINT) AS exact_distinct
FROM hits
"""

ORACLE_Q_APPROX_DISTINCT_LINEAR = f"""
WITH ev AS (
  SELECT event_type, 'u' || user_id::VARCHAR AS item FROM events
), hits AS (
  SELECT event_type,
         COUNT(DISTINCT {_h_duck("'lc:' || item")} % {_LC_M}) AS occupied,
         COUNT(DISTINCT item) AS exact_distinct
  FROM ev GROUP BY event_type
)
SELECT event_type,
       CAST(occupied AS BIGINT) AS occupied,
       CAST(ROUND(-{_LC_M} * LN(GREATEST({_LC_M} - occupied, 1) / {_LC_M}.0), 0) AS BIGINT) AS est_distinct,
       CAST(exact_distinct AS BIGINT) AS exact_distinct
FROM hits
"""


def q_approx_distinct_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear-counting distinct-user estimation per event type: hash items
    into an m=1024-slot bitmap (md5-deterministic, so both engines build the
    identical bitmap) and estimate n̂ = -m·ln(empty/m), reported beside the
    exact distinct count. The bitmap is the per-group state you'd OR across
    partitions at 100 TB — a map-side combinable 128-byte sketch replacing a
    count-distinct shuffle of raw user ids. (Spark's own
    `approx_count_distinct` is the HLL production path — this operator
    exists because its estimate is oracle-checkable exactly, HLL's isn't.)"""
    register_views(spark, sf_dir)
    return spark.sql(_LC_SPARK)


# ---------------------------------------------------------------------------
# 7. Fixed-bin histogram quantile sketch (the mergeable-quantile pattern).
# ---------------------------------------------------------------------------

_HQ_WIDTH = 16   # chars per bin
_HQ_BINS = 64    # covers n_chars 0..1024; last bin absorbs the tail


def _hq_sql(values_clause: str, exact_fn: str) -> str:
    """Shared SQL for both dialects — only the VALUES spelling and the exact
    percentile function differ."""
    return f"""
WITH h AS (
  SELECT lang,
         LEAST(CAST(FLOOR(n_chars / {_HQ_WIDTH}) AS INT), {_HQ_BINS - 1}) AS bin,
         COUNT(*) AS cnt
  FROM documents GROUP BY 1, 2
), c AS (
  SELECT lang, bin, cnt,
         SUM(cnt) OVER (PARTITION BY lang ORDER BY bin) AS cum,
         SUM(cnt) OVER (PARTITION BY lang) AS total
  FROM h
), qs AS (
  SELECT CAST(q AS DOUBLE) AS q FROM {values_clause}
), first_bin AS (
  SELECT lang, q, bin, cnt, cum, total,
         ROW_NUMBER() OVER (PARTITION BY lang, q ORDER BY bin) AS rn
  FROM c CROSS JOIN qs WHERE c.cum >= q * c.total
), est AS (
  SELECT lang, q, total,
         ROUND(CAST(bin * {_HQ_WIDTH}
               + {_HQ_WIDTH} * (q * total - (cum - cnt)) / cnt AS DOUBLE), 4) AS est_val
  FROM first_bin WHERE rn = 1
), exact AS (
  SELECT lang,
         ROUND(CAST({exact_fn}(n_chars, 0.5) AS DOUBLE), 4) AS exact_p50,
         ROUND(CAST({exact_fn}(n_chars, 0.9) AS DOUBLE), 4) AS exact_p90
  FROM documents GROUP BY lang
)
SELECT e.lang,
       CAST(MAX(e.total) AS BIGINT) AS n_docs,
       MAX(CASE WHEN e.q = 0.5 THEN e.est_val END) AS est_p50,
       MAX(x.exact_p50) AS exact_p50,
       MAX(CASE WHEN e.q = 0.9 THEN e.est_val END) AS est_p90,
       MAX(x.exact_p90) AS exact_p90
FROM est e
JOIN exact x ON x.lang = e.lang
GROUP BY e.lang
"""


_HQ_SPARK = _hq_sql("VALUES (0.5), (0.9) AS t(q)", "percentile")
ORACLE_Q_HISTOGRAM_QUANTILE = _hq_sql("(VALUES (0.5), (0.9)) t(q)",
                                      "quantile_cont")


def q_histogram_quantile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable fixed-bin histogram quantiles beside the exact answer: bin
    n_chars into 64 equi-width cells per language, then read p50/p90 off the
    cumulative histogram with linear interpolation. The histogram is THE
    mergeable-quantile state at 100 TB — 64 counts per group OR together
    across partitions (map-side combinable, constant size), replacing the
    per-group full sort exact percentiles need; t-digest/KLL refine the same
    idea with adaptive bins. Deterministic bins → the oracle checks the
    ESTIMATE exactly, not statistically, and the exact column quantifies the
    sketch's error in the artifact itself."""
    register_views(spark, sf_dir)
    return spark.sql(_HQ_SPARK)


# ---------------------------------------------------------------------------
# 8. HyperLogLog distinct estimation (Flajolet et al. 2007), m = 64 registers.
# ---------------------------------------------------------------------------

_HLL_M = 64
_HLL_ALPHA = 0.709  # alpha_64 from the HLL paper


def _hll_sql(h_bucket: str, h_value: str, concat_item: str) -> str:
    """Shared HLL SQL. Registers are MAX(rho) per (group, bucket); rho =
    1 + leading zeros of a 32-bit hash = 33 - bit_length, via length(bin(h))
    (identical no-leading-zero semantics in Spark and DuckDB). The register
    sum uses POWER(0.5, rho): every term is an exact dyadic rational and the
    64-term sum spans < 52 mantissa bits, so it is EXACTLY the same double
    in any engine and any partition/merge order — that's what makes an HLL
    estimate oracle-checkable here. Small-range correction (linear counting
    on empty registers) applied per the paper."""
    return f"""
WITH ev AS (
  SELECT event_type, {concat_item} AS item FROM events
), regs AS (
  SELECT event_type,
         {h_bucket} % {_HLL_M} AS bucket,
         MAX(CASE WHEN {h_value} = 0 THEN 33
                  ELSE 33 - length(bin({h_value})) END) AS rho
  FROM ev GROUP BY 1, 2
), merged AS (
  SELECT event_type,
         COUNT(*) AS occupied,
         SUM(POWER(0.5, rho)) AS s
  FROM regs GROUP BY event_type
), est AS (
  SELECT event_type, occupied,
         {_HLL_ALPHA} * {_HLL_M} * {_HLL_M}
           / (s + ({_HLL_M} - occupied)) AS raw_est
  FROM merged
), corrected AS (
  SELECT event_type, occupied,
         CASE WHEN raw_est <= 2.5 * {_HLL_M} AND occupied < {_HLL_M}
              THEN {_HLL_M} * LN({_HLL_M}.0 / ({_HLL_M} - occupied))
              ELSE raw_est END AS est
  FROM est
), exact AS (
  SELECT event_type, COUNT(DISTINCT item) AS exact_distinct
  FROM ev GROUP BY event_type
)
SELECT c.event_type,
       CAST(c.occupied AS BIGINT) AS occupied,
       ROUND(c.est, 4) AS est_distinct,
       CAST(x.exact_distinct AS BIGINT) AS exact_distinct,
       ROUND(ABS(c.est - x.exact_distinct) / x.exact_distinct, 4) AS rel_err
FROM corrected c JOIN exact x ON c.event_type = x.event_type
"""


_HLL_SPARK = _hll_sql(
    _h_spark("concat('hllb:', item)"),
    _h_spark("concat('hllv:', item)"),
    "concat('u', cast(user_id as string))",
)
ORACLE_Q_APPROX_DISTINCT_HLL = _hll_sql(
    _h_duck("'hllb:' || item"),
    _h_duck("'hllv:' || item"),
    "'u' || user_id::VARCHAR",
)


def q_approx_distinct_hll(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog distinct-user estimation per event type, reported beside
    the exact count and relative error. The 64 registers are the whole
    per-group state at 100 TB: MAX per (group, bucket) is map-side
    combinable, so a count-distinct over billions of user ids shuffles 64
    small integers per group instead of the id stream — the same
    merge-by-MAX state layout Spark's own `approx_count_distinct` (HLL++)
    maintains; this operator exists because md5-deterministic registers
    make the ESTIMATE itself oracle-checkable, not just statistically
    plausible. Linear counting handles the small-cardinality range exactly
    as the 2007 paper prescribes."""
    register_views(spark, sf_dir)
    return spark.sql(_HLL_SPARK)


QUERIES = {
    "cms_heavy_hitters": q_cms_heavy_hitters,
    "histogram_quantile": q_histogram_quantile,
    "bloom_contamination": q_bloom_contamination,
    "quality_percentile_cut": q_quality_percentile_cut,
    "weighted_sample": q_weighted_sample,
    "quality_ntile_buckets": q_quality_ntile_buckets,
    "approx_distinct_linear": q_approx_distinct_linear,
    "approx_distinct_hll": q_approx_distinct_hll,
}

ORACLE = {
    "cms_heavy_hitters": ORACLE_Q_CMS_HEAVY_HITTERS,
    "histogram_quantile": ORACLE_Q_HISTOGRAM_QUANTILE,
    "bloom_contamination": ORACLE_Q_BLOOM_CONTAMINATION,
    "quality_percentile_cut": ORACLE_Q_QUALITY_PERCENTILE_CUT,
    "weighted_sample": ORACLE_Q_WEIGHTED_SAMPLE,
    "quality_ntile_buckets": ORACLE_Q_QUALITY_NTILE_BUCKETS,
    "approx_distinct_linear": ORACLE_Q_APPROX_DISTINCT_LINEAR,
    "approx_distinct_hll": ORACLE_Q_APPROX_DISTINCT_HLL,
}
