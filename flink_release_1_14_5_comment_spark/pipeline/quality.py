"""Corpus-quality operators for LLM training-data curation, part 2:
Gopher-style repetition signals, C4-style cross-document boilerplate
detection, deterministic train/val/test splitting, and fixed-size token
chunking with overlap.

These complement pipeline/text_analysis.py (token stats, lang-ID, Gopher
length/top-word rules, PII scrub): the operators here are the *repetition*
and *assembly* half of a pre-training data pipeline (Rae et al. 2021
"Scaling Language Models" §A.1.1 repetition filters; Raffel et al. 2020 C4
boilerplate removal; standard hash-split + sliding-window chunking).

Scale design (100 TB):
* Everything is Spark SQL over built-in functions — zero Python UDFs, the
  whole pipeline stays in whole-stage codegen.
* `repetition_metrics` is the canonical word-count shape: explode to
  (doc_id, token) then aggregate — one hash shuffle keyed by doc_id whose
  width is bounded by corpus token count, with map-side partial aggregation
  combining duplicate tokens before the exchange.
* `boilerplate_ngrams` shuffles DISTINCT (doc, ngram) pairs then counts per
  ngram — both stages partial-agg'd; the ≥MIN_DOCS filter and top-k are
  pushed into a TakeOrderedAndProject, so only k rows reach the driver.
* `split_assign` / `chunk_tokens` are pure maps (hash-mod bucketing,
  sequence+slice explode); the only shuffle is the final bounded-key rollup.

Reference parity: the reference engine expresses these as batch SQL over
its table runtime (flink-table-runtime HashAggregate / Expand operators);
here Catalyst picks the same partial-agg + exchange plans automatically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from flink_release_1_14_5_comment_spark.catalog import register_views

# Shared tokenization (identical in Spark and DuckDB dialects): lower, trim,
# collapse whitespace, split on single space.
_TOKS_SPARK = r"split(regexp_replace(lower(trim(text)), '\\s+', ' '), ' ')"
_TOKS_DUCK = r"string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ')"


# ---------------------------------------------------------------------------
# 1. Gopher repetition signals: duplicate-word character fraction and
#    top-bigram fraction per document, rolled up per language.
# ---------------------------------------------------------------------------

_REP_FLAG_DUP = 0.55   # chars-in-repeated-words fraction above which a doc
_REP_FLAG_BG = 0.05    # ... and top-bigram fraction above which it's flagged

_REPETITION_SPARK = f"""
WITH w AS (
  SELECT doc_id, lang, {_TOKS_SPARK} AS words FROM documents
), wc AS (
  SELECT doc_id, lang, word, COUNT(*) AS c
  FROM w LATERAL VIEW explode(words) t AS word
  GROUP BY doc_id, lang, word
), dup AS (
  SELECT doc_id, lang,
         SUM(c * length(word)) AS total_chars,
         SUM(CASE WHEN c > 1 THEN c * length(word) ELSE 0 END) AS dup_chars
  FROM wc GROUP BY doc_id, lang
), bg AS (
  SELECT doc_id, bigram, COUNT(*) AS c
  FROM w LATERAL VIEW explode(
    transform(sequence(1, size(words) - 1),
              i -> concat(element_at(words, i), ' ', element_at(words, i + 1)))
  ) t AS bigram
  GROUP BY doc_id, bigram
), bgf AS (
  SELECT doc_id, MAX(c) / CAST(SUM(c) AS DOUBLE) AS top_bigram_frac
  FROM bg GROUP BY doc_id
), per_doc AS (
  SELECT d.lang,
         d.dup_chars / CAST(d.total_chars AS DOUBLE) AS dup_char_frac,
         b.top_bigram_frac
  FROM dup d JOIN bgf b ON d.doc_id = b.doc_id
)
SELECT lang,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       ROUND(SUM(dup_char_frac), 6) / COUNT(*) AS avg_dup_char_frac,
       ROUND(SUM(top_bigram_frac), 6) / COUNT(*) AS avg_top_bigram_frac,
       CAST(SUM(CASE WHEN dup_char_frac > {_REP_FLAG_DUP}
                      AND top_bigram_frac > {_REP_FLAG_BG}
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_flagged
FROM per_doc GROUP BY lang
"""

ORACLE_Q_REPETITION_METRICS = f"""
WITH w AS (
  SELECT doc_id, lang, {_TOKS_DUCK} AS words FROM documents
), wc AS (
  SELECT doc_id, lang, word, COUNT(*) AS c
  FROM w, unnest(words) AS t(word)
  GROUP BY doc_id, lang, word
), dup AS (
  SELECT doc_id, lang,
         SUM(c * length(word)) AS total_chars,
         SUM(CASE WHEN c > 1 THEN c * length(word) ELSE 0 END) AS dup_chars
  FROM wc GROUP BY doc_id, lang
), bg AS (
  SELECT doc_id, bigram, COUNT(*) AS c
  FROM w, unnest(list_transform(generate_series(1, len(words) - 1),
                                i -> words[i] || ' ' || words[i + 1])) AS t(bigram)
  GROUP BY doc_id, bigram
), bgf AS (
  SELECT doc_id, MAX(c) / CAST(SUM(c) AS DOUBLE) AS top_bigram_frac
  FROM bg GROUP BY doc_id
), per_doc AS (
  SELECT d.lang,
         d.dup_chars / CAST(d.total_chars AS DOUBLE) AS dup_char_frac,
         b.top_bigram_frac
  FROM dup d JOIN bgf b ON d.doc_id = b.doc_id
)
SELECT lang,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       ROUND(SUM(dup_char_frac), 6) / COUNT(*) AS avg_dup_char_frac,
       ROUND(SUM(top_bigram_frac), 6) / COUNT(*) AS avg_top_bigram_frac,
       CAST(SUM(CASE WHEN dup_char_frac > {_REP_FLAG_DUP}
                      AND top_bigram_frac > {_REP_FLAG_BG}
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_flagged
FROM per_doc GROUP BY lang
"""


def q_repetition_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher repetition profile per language: average fraction of characters
    inside words repeated within their document, average top-bigram mass, and
    the count of docs tripping both repetition thresholds."""
    register_views(spark, sf_dir)
    return spark.sql(_REPETITION_SPARK)


# ---------------------------------------------------------------------------
# 2. C4-style boilerplate: word 3-grams shared across many documents.
# ---------------------------------------------------------------------------

_BOILER_MIN_DOCS = 4  # non-trivial output from sf0.001 up; top-k caps growth
_BOILER_TOP_K = 20

_BOILER_SPARK = f"""
WITH w AS (
  SELECT doc_id, {_TOKS_SPARK} AS words FROM documents
), tg AS (
  SELECT DISTINCT doc_id, ngram
  FROM w LATERAL VIEW explode(
    transform(sequence(1, size(words) - 2),
              i -> concat_ws(' ', element_at(words, i), element_at(words, i + 1),
                             element_at(words, i + 2)))
  ) t AS ngram
  WHERE size(words) >= 3
)
SELECT ngram, CAST(COUNT(*) AS BIGINT) AS n_docs
FROM tg GROUP BY ngram
HAVING COUNT(*) >= {_BOILER_MIN_DOCS}
ORDER BY n_docs DESC, ngram
LIMIT {_BOILER_TOP_K}
"""

ORACLE_Q_BOILERPLATE_NGRAMS = f"""
WITH w AS (
  SELECT doc_id, {_TOKS_DUCK} AS words FROM documents
), tg AS (
  SELECT DISTINCT doc_id, ngram
  FROM w, unnest(list_transform(generate_series(1, len(words) - 2),
           i -> words[i] || ' ' || words[i + 1] || ' ' || words[i + 2])) AS t(ngram)
  WHERE len(words) >= 3
)
SELECT ngram, CAST(COUNT(*) AS BIGINT) AS n_docs
FROM tg GROUP BY ngram
HAVING COUNT(*) >= {_BOILER_MIN_DOCS}
ORDER BY n_docs DESC, ngram
LIMIT {_BOILER_TOP_K}
"""


def q_boilerplate_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top cross-document 3-grams (the C4 boilerplate-detection primitive):
    distinct (doc, 3-gram) pairs, count docs per 3-gram, keep the top 20 with
    a total-order tie-break so LIMIT is deterministic across engines."""
    register_views(spark, sf_dir)
    return spark.sql(_BOILER_SPARK)


# ---------------------------------------------------------------------------
# 3. Deterministic hash split (train/val/test) stratified report.
# ---------------------------------------------------------------------------

# Portable hash: md5 of the doc_id string is identical in Spark and DuckDB;
# the first 6 hex chars parse to the same integer (Spark conv(_,16,10),
# DuckDB CAST('0x…')). Bucket = that integer mod 10 → 8/1/1 split.
_SPLIT_CASE = (
    "CASE WHEN bucket < 8 THEN 'train' WHEN bucket = 8 THEN 'val' "
    "ELSE 'test' END"
)

_SPLIT_SPARK = f"""
WITH b AS (
  SELECT lang, n_chars,
         CAST(size({_TOKS_SPARK}) AS BIGINT) AS ntok,
         CAST(conv(substr(md5(CAST(doc_id AS STRING)), 1, 6), 16, 10) AS BIGINT) % 10 AS bucket
  FROM documents
)
SELECT lang, {_SPLIT_CASE} AS split,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(ntok) AS BIGINT) AS total_tokens,
       ROUND(SUM(n_chars) / CAST(COUNT(*) AS DOUBLE), 4) AS avg_chars
FROM b GROUP BY lang, {_SPLIT_CASE}
"""

ORACLE_Q_SPLIT_ASSIGN = f"""
WITH b AS (
  SELECT lang, n_chars,
         CAST(len({_TOKS_DUCK}) AS BIGINT) AS ntok,
         CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 6) AS BIGINT) % 10 AS bucket
  FROM documents
)
SELECT lang, {_SPLIT_CASE} AS split,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(ntok) AS BIGINT) AS total_tokens,
       ROUND(SUM(n_chars) / CAST(COUNT(*) AS DOUBLE), 4) AS avg_chars
FROM b GROUP BY lang, {_SPLIT_CASE}
"""


def q_split_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 80/10/10 train/val/test assignment by md5(doc_id) mod
    10, reported stratified by language — the standard leakage-proof split
    (same doc always lands in the same fold, any engine, any run)."""
    register_views(spark, sf_dir)
    return spark.sql(_SPLIT_SPARK)


# ---------------------------------------------------------------------------
# 4. Fixed-size token chunking with overlap (sequence-packing front half).
# ---------------------------------------------------------------------------

_CHUNK_SIZE = 32
_CHUNK_STRIDE = 24  # 8-token overlap

_CHUNK_SPARK = f"""
WITH w AS (
  SELECT doc_id, lang, {_TOKS_SPARK} AS words FROM documents
), n AS (
  SELECT doc_id, lang, words, size(words) AS ntok,
         CASE WHEN size(words) <= {_CHUNK_SIZE} THEN 1
              ELSE CAST(CEIL((size(words) - {_CHUNK_SIZE}) / {_CHUNK_STRIDE}.0) AS INT) + 1
         END AS n_chunks
  FROM w
), c AS (
  SELECT doc_id, lang, ntok,
         size(slice(words, ci * {_CHUNK_STRIDE} + 1, {_CHUNK_SIZE})) AS chunk_tok,
         md5(concat_ws(' ', slice(words, ci * {_CHUNK_STRIDE} + 1, {_CHUNK_SIZE}))) AS chunk_hash
  FROM n LATERAL VIEW explode(sequence(0, n_chunks - 1)) t AS ci
)
SELECT lang,
       CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
       CAST(COUNT(*) AS BIGINT) AS total_chunks,
       CAST(COUNT(DISTINCT chunk_hash) AS BIGINT) AS distinct_chunks,
       ROUND(SUM(chunk_tok) / CAST(COUNT(*) AS DOUBLE), 4) AS avg_chunk_tokens
FROM c GROUP BY lang
"""

ORACLE_Q_CHUNK_TOKENS = f"""
WITH w AS (
  SELECT doc_id, lang, {_TOKS_DUCK} AS words FROM documents
), n AS (
  SELECT doc_id, lang, words, len(words) AS ntok,
         CASE WHEN len(words) <= {_CHUNK_SIZE} THEN 1
              ELSE CAST(CEIL((len(words) - {_CHUNK_SIZE}) / {_CHUNK_STRIDE}.0) AS INT) + 1
         END AS n_chunks
  FROM w
), c AS (
  SELECT doc_id, lang, ntok,
         len(list_slice(words, ci * {_CHUNK_STRIDE} + 1,
                        ci * {_CHUNK_STRIDE} + {_CHUNK_SIZE})) AS chunk_tok,
         md5(array_to_string(list_slice(words, ci * {_CHUNK_STRIDE} + 1,
                                        ci * {_CHUNK_STRIDE} + {_CHUNK_SIZE}), ' ')) AS chunk_hash
  FROM n, unnest(generate_series(0, n_chunks - 1)) AS t(ci)
)
SELECT lang,
       CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
       CAST(COUNT(*) AS BIGINT) AS total_chunks,
       CAST(COUNT(DISTINCT chunk_hash) AS BIGINT) AS distinct_chunks,
       ROUND(SUM(chunk_tok) / CAST(COUNT(*) AS DOUBLE), 4) AS avg_chunk_tokens
FROM c GROUP BY lang
"""


def q_chunk_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window tokenized chunking (32-token chunks, 24-token stride =
    8-token overlap) with per-language chunk accounting — the map half of
    sequence packing (pipeline/packing.py holds the bin-packing half)."""
    register_views(spark, sf_dir)
    return spark.sql(_CHUNK_SPARK)


# --- Source-level (URL/domain) quality filtering -------------------------
# RefinedWeb (Penedo et al. 2023 §3.1) and C4 both gate documents by the
# quality of their *origin* before any per-document scoring: a domain whose
# pages are mostly duplicated or degenerate is dropped wholesale. The
# per-source report aggregates three signals — corpus share, mean length,
# within-source exact-dup fraction (md5 of the full text) — and emits the
# keep/drop verdict. One hash shuffle keyed by `source` (bounded keys);
# COUNT(DISTINCT md5) is Catalyst's expand-based distinct rewrite, still
# map-side partial-agg'd. Identical SQL runs on both engines.
_SOURCE_FILTER_SQL = """
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       ROUND(AVG(n_chars), 2) AS mean_chars,
       ROUND(1 - COUNT(DISTINCT md5(text)) / CAST(COUNT(*) AS DOUBLE), 4)
         AS dup_frac,
       ROUND(SUM(CASE WHEN n_chars < 100 THEN 1 ELSE 0 END)
             / CAST(COUNT(*) AS DOUBLE), 4) AS short_frac,
       (ROUND(1 - COUNT(DISTINCT md5(text)) / CAST(COUNT(*) AS DOUBLE), 4)
          <= 0.2
        AND ROUND(AVG(n_chars), 2) >= 150
        AND ROUND(SUM(CASE WHEN n_chars < 100 THEN 1 ELSE 0 END)
              / CAST(COUNT(*) AS DOUBLE), 4) <= 0.5) AS keep
FROM documents
GROUP BY source
"""


def q_source_quality_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source (URL/domain-level) quality gate: corpus share, mean doc
    length, exact-dup and too-short fractions, and the keep/drop verdict a
    curation run applies before per-document filters."""
    register_views(spark, sf_dir)
    return spark.sql(_SOURCE_FILTER_SQL)


# --- LM-perplexity filtering (CCNet-style) ---------------------------------
# CCNet (Wenzek et al. 2020) and the Gopher/LLaMA pipelines score documents
# with an in-domain language model and drop the high-perplexity tail. Here
# the LM is a bigram model TRAINED ON THE CORPUS ITSELF in the same query
# (counts + add-1/2 smoothing — Lidstone), entirely in SQL:
#
#   p(w2 | w1) = (c(w1 w2) + 0.5) / (c(w1 ·) + 0.5 · |V|)
#   doc score  = mean over the doc's bigrams of −ln p   (avg NLL; ppl = e^s)
#
# Scale (100 TB): training = two hash-partial-agg'd groupBys over the bigram
# frame (vocab-bounded output); scoring = one hash join of the bigram frame
# against the count tables (uniform keys) — linear in corpus token count,
# zero Python. Determinism: counts are integers so every probability is the
# same double in both engines; ln/exp ulp drift dies in ROUND 6; the
# per-source mean sums per-doc scores as exact DECIMAL(18,6) so summation
# order cannot shift a rounded digit.
_LM_FLAG_NLL = 5.0  # docs with avg bigram NLL above this are flagged

_LM_PERPLEXITY_SPARK = f"""
WITH d AS (
  SELECT doc_id, source, {_TOKS_SPARK} AS words FROM documents
), big AS (
  SELECT doc_id, source, bg.w1, bg.w2
  FROM d LATERAL VIEW explode(
    transform(sequence(1, size(words) - 1),
              i -> struct(element_at(words, i) AS w1,
                          element_at(words, i + 1) AS w2))
  ) t AS bg
), c12 AS (
  SELECT w1, w2, COUNT(*) AS c12 FROM big GROUP BY w1, w2
), c1 AS (
  SELECT w1, COUNT(*) AS c1 FROM big GROUP BY w1
), v AS (
  SELECT COUNT(DISTINCT w2) AS v FROM big
), per_doc AS (
  SELECT b.doc_id, b.source,
         ROUND(AVG(-LN((c12.c12 + 0.5) / (c1.c1 + 0.5 * v.v))), 6) AS nll
  FROM big b
  JOIN c12 ON c12.w1 = b.w1 AND c12.w2 = b.w2
  JOIN c1 ON c1.w1 = b.w1
  CROSS JOIN v
  GROUP BY b.doc_id, b.source
)
SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
       ROUND(CAST(SUM(CAST(nll AS DECIMAL(18, 6))) AS DOUBLE)
             / COUNT(*), 6) AS avg_nll,
       CAST(SUM(CASE WHEN nll > {_LM_FLAG_NLL} THEN 1 ELSE 0 END) AS BIGINT)
         AS n_flagged
FROM per_doc GROUP BY source
"""

ORACLE_Q_LM_PERPLEXITY = f"""
WITH d AS (
  SELECT doc_id, source, {_TOKS_DUCK} AS words FROM documents
), big AS (
  -- generate_series can't lateral-join a column in DuckDB; build the
  -- bigram list per row (words are space-free post-split, so ' ' is a
  -- safe pair separator) exactly like ORACLE_Q_REPETITION_METRICS
  SELECT doc_id, source,
         string_split(bg, ' ')[1] AS w1, string_split(bg, ' ')[2] AS w2
  FROM d, unnest(list_transform(generate_series(1, len(words) - 1),
                                i -> words[i] || ' ' || words[i + 1])) AS t(bg)
), c12 AS (
  SELECT w1, w2, COUNT(*) AS c12 FROM big GROUP BY w1, w2
), c1 AS (
  SELECT w1, COUNT(*) AS c1 FROM big GROUP BY w1
), v AS (
  SELECT COUNT(DISTINCT w2) AS v FROM big
), per_doc AS (
  SELECT b.doc_id, b.source,
         ROUND(AVG(-LN((c12.c12 + 0.5) / (c1.c1 + 0.5 * v.v))), 6) AS nll
  FROM big b
  JOIN c12 ON c12.w1 = b.w1 AND c12.w2 = b.w2
  JOIN c1 ON c1.w1 = b.w1
  CROSS JOIN v
  GROUP BY b.doc_id, b.source
)
SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
       ROUND(CAST(SUM(CAST(nll AS DECIMAL(18, 6))) AS DOUBLE)
             / COUNT(*), 6) AS avg_nll,
       CAST(SUM(CASE WHEN nll > {_LM_FLAG_NLL} THEN 1 ELSE 0 END) AS BIGINT)
         AS n_flagged
FROM per_doc GROUP BY source
"""


def q_lm_perplexity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source LM-perplexity report: mean bigram NLL under a corpus-
    trained Lidstone bigram model and the count of high-perplexity docs —
    the CCNet-style quality signal, LM training and scoring in one query."""
    register_views(spark, sf_dir)
    return spark.sql(_LM_PERPLEXITY_SPARK)


QUERIES = {
    "repetition_metrics": q_repetition_metrics,
    "lm_perplexity": q_lm_perplexity,
    "source_quality_filter": q_source_quality_filter,
    "boilerplate_ngrams": q_boilerplate_ngrams,
    "split_assign": q_split_assign,
    "chunk_tokens": q_chunk_tokens,
}

ORACLE = {
    "repetition_metrics": ORACLE_Q_REPETITION_METRICS,
    "lm_perplexity": ORACLE_Q_LM_PERPLEXITY,
    "source_quality_filter": _SOURCE_FILTER_SQL,
    "boilerplate_ngrams": ORACLE_Q_BOILERPLATE_NGRAMS,
    "split_assign": ORACLE_Q_SPLIT_ASSIGN,
    "chunk_tokens": ORACLE_Q_CHUNK_TOKENS,
}
