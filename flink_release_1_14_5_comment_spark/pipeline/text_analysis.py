"""Text analysis over the `documents` table: token stats, quality scoring,
language-ID heuristic, document fingerprinting.

Everything is built from JVM-side `pyspark.sql.functions` (split / filter /
transform / md5) — no Python UDFs — so the whole pipeline stays inside
whole-stage codegen and scales linearly with document count: a pure map +
one bounded-key aggregation; no shuffle carries document text except the
small per-group aggregates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from flink_release_1_14_5_comment_spark.catalog import register_views
from flink_release_1_14_5_comment_spark.operators.scale import topk_per_key

STOPWORDS = ("the", "a", "and", "of", "to", "in")


def _toks(col: str = "text") -> F.Column:
    return F.split(F.regexp_replace(F.lower(F.trim(F.col(col))), r"\s+", " "), " ")


def q_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language corpus statistics: token counts, stopword ratio, and a
    deterministic quality score (length-capped × content-word ratio)."""
    t = register_views(spark, sf_dir)
    toks = _toks()
    n_tok = F.size(toks).cast("double")
    stop_list = ", ".join(f"'{s}'" for s in STOPWORDS)
    n_stop = F.size(F.expr(
        f"filter(split(regexp_replace(lower(trim(text)), '\\\\s+', ' '), ' '), x -> x IN ({stop_list}))"
    )).cast("double")
    stop_ratio = n_stop / n_tok
    quality = F.least(F.lit(1.0), n_tok / 50.0) * (1.0 - stop_ratio)
    return (
        t["documents"]
        .select("lang", F.col("n_chars").cast("double").alias("nc"),
                n_tok.alias("ntok"), stop_ratio.alias("sr"), quality.alias("ql"))
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.round(F.avg("ntok"), 4).alias("avg_tokens"),
            F.round(F.avg("nc"), 4).alias("avg_chars"),
            # round(sum)/count for non-integer summands (see relational.py).
            (F.round(F.sum("sr"), 6) / F.count(F.lit(1))).alias("avg_stop_ratio"),
            (F.round(F.sum("ql"), 6) / F.count(F.lit(1))).alias("avg_quality"),
        )
    )


ORACLE_Q_TEXT_STATS = r"""
WITH d AS (
  SELECT lang, CAST(n_chars AS DOUBLE) AS nc,
         CAST(len(string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ')) AS DOUBLE) AS ntok,
         CAST(len(list_filter(string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' '),
                              x -> x IN ('the','a','and','of','to','in'))) AS DOUBLE) AS nstop
  FROM documents
)
SELECT lang,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       ROUND(AVG(ntok), 4) AS avg_tokens,
       ROUND(AVG(nc), 4) AS avg_chars,
       ROUND(SUM(nstop / ntok), 6) / COUNT(*) AS avg_stop_ratio,
       ROUND(SUM(least(1.0, ntok / 50.0) * (1.0 - nstop / ntok)), 6) / COUNT(*) AS avg_quality
FROM d
GROUP BY lang
"""


def q_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Marker-word language-ID heuristic → confusion matrix vs the labeled
    `lang` column. (The real signal in synthetic data is weak; the operator
    under test is the deterministic scoring pipeline, not model quality.)"""
    t = register_views(spark, sf_dir)

    def hits(words: tuple[str, ...]) -> F.Column:
        lst = ", ".join(f"'{w}'" for w in words)
        return F.size(F.expr(
            f"filter(split(regexp_replace(lower(trim(text)), '\\\\s+', ' '), ' '), x -> x IN ({lst}))"
        ))

    en = hits(("the", "a", "of", "and"))
    es = hits(("el", "la", "de", "los"))
    de = hits(("der", "die", "das", "und"))
    pred = (
        F.when((en >= es) & (en >= de) & (en > 0), "en")
        .when((es >= de) & (es > 0), "es")
        .when(de > 0, "de")
        .otherwise("und")
    )
    return (
        t["documents"]
        .select("lang", pred.alias("pred_lang"))
        .groupBy("lang", "pred_lang")
        .agg(F.count(F.lit(1)).alias("n"))
    )


ORACLE_Q_LANG_ID = r"""
WITH scored AS (
  SELECT lang,
         len(list_filter(string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' '),
                         x -> x IN ('the','a','of','and'))) AS en,
         len(list_filter(string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' '),
                         x -> x IN ('el','la','de','los'))) AS es,
         len(list_filter(string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' '),
                         x -> x IN ('der','die','das','und'))) AS de
  FROM documents
)
SELECT lang,
       CASE WHEN en >= es AND en >= de AND en > 0 THEN 'en'
            WHEN es >= de AND es > 0 THEN 'es'
            WHEN de > 0 THEN 'de'
            ELSE 'und' END AS pred_lang,
       CAST(COUNT(*) AS BIGINT) AS n
FROM scored
GROUP BY 1, 2
"""


def q_doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprinting: md5 over whitespace-normalized text, plus the
    size of each fingerprint's duplicate group (window count)."""
    t = register_views(spark, sf_dir)
    norm = F.regexp_replace(F.lower(F.trim(F.col("text"))), r"\s+", " ")
    d = t["documents"].select(
        "doc_id",
        F.size(_toks()).cast("long").alias("n_tokens"),
        F.md5(norm).alias("fp"),
    )
    # groupBy+join, not count() OVER (PARTITION BY fp): a mass-duplicate
    # corpus piles one fp into a single window task; the agg reduces it
    # map-side and AQE can split the skewed join partition.
    sizes = d.groupBy("fp").agg(F.count(F.lit(1)).alias("group_n"))
    return d.join(sizes, "fp").select("doc_id", "n_tokens", "fp", "group_n")


ORACLE_Q_DOC_FINGERPRINT = r"""
WITH d AS (
  SELECT doc_id,
         CAST(len(string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ')) AS BIGINT) AS n_tokens,
         md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fp
  FROM documents
)
SELECT doc_id, n_tokens, fp,
       CAST(COUNT(*) OVER (PARTITION BY fp) AS BIGINT) AS group_n
FROM d
"""


def q_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-5 TF-IDF terms per language — the corpus-triage scoring primitive.
    tf = term occurrences within the language; idf = ln(total docs /
    docs containing the term). One explode + two bounded-key aggs + a
    broadcast-sized doc-frequency join."""
    t = register_views(spark, sf_dir)
    docs = t["documents"]
    n_docs = docs.count()
    tokens = docs.select("doc_id", "lang", F.explode(_toks()).alias("tok")).filter(F.col("tok") != "")
    df_ = (
        tokens.select("doc_id", "tok").distinct()
        .groupBy("tok").agg(F.count(F.lit(1)).alias("df"))
    )
    tf = tokens.groupBy("lang", "tok").agg(F.count(F.lit(1)).alias("tf"))
    scored = (
        tf.join(df_, "tok")
        .withColumn("score", F.round(F.col("tf") * F.log(F.lit(float(n_docs)) / F.col("df")), 4))
    )
    # per-language token ranking: distinct-token count per language scales
    # with the corpus while languages stay few — two-phase top-k avoids the
    # single-task-per-language sort (same rationale as the retrieval family)
    return (
        topk_per_key(scored, "lang", [F.col("score").desc(), F.col("tok")], 5)
        .withColumn("rn", F.col("rn").cast("long"))
        .select("lang", "tok", F.col("tf").cast("long").alias("tf"), "score", "rn")
    )


ORACLE_Q_TFIDF_TOP_TERMS = r"""
WITH tokens AS (
  SELECT doc_id, lang,
         unnest(string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ')) AS tok
  FROM documents
), tok2 AS (SELECT * FROM tokens WHERE tok <> ''),
df_ AS (
  SELECT tok, COUNT(*) AS df FROM (SELECT DISTINCT doc_id, tok FROM tok2) GROUP BY tok
), tf AS (
  SELECT lang, tok, COUNT(*) AS tf FROM tok2 GROUP BY lang, tok
), scored AS (
  SELECT tf.lang, tf.tok, tf.tf,
         ROUND(tf.tf * ln((SELECT COUNT(*) FROM documents)::DOUBLE / df_.df), 4) AS score
  FROM tf JOIN df_ ON tf.tok = df_.tok
)
SELECT lang, tok, CAST(tf AS BIGINT) AS tf, score, CAST(rn AS BIGINT) AS rn
FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY lang ORDER BY score DESC, tok) AS rn
      FROM scored)
WHERE rn <= 5
"""


def q_corpus_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified sampling for dataset mixing: each (lang,
    source) stratum keeps a per-source target fraction of documents
    (even-numbered sources 25%, odd 60% — the knob a training-mix config
    would set). Membership = md5-hash bucket of doc_id, so the sample is
    reproducible across engines, runs, AND cluster sizes — no rand(), no
    sampleBy seed coupling to partitioning. One pure map + one count
    aggregate; at 100 TB the sample materializes with zero shuffle of the
    kept rows (the filter pushes into the scan's output)."""
    t = register_views(spark, sf_dir)
    bucket = F.expr(
        "cast(conv(substr(md5(concat('sample:', cast(doc_id as string))), 1, 8), 16, 10) as bigint) % 100"
    )
    rate = F.when(F.expr("cast(substr(source, 4) as int)") % 2 == 0, 25).otherwise(60)
    return (
        t["documents"]
        .select("lang", "source", bucket.alias("bkt"), rate.alias("rate"))
        .groupBy("lang", "source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum((F.col("bkt") < F.col("rate")).cast("long")).alias("n_sampled"),
        )
    )


ORACLE_Q_CORPUS_SAMPLE = """
WITH d AS (
  SELECT lang, source,
         ('0x' || substr(md5('sample:' || doc_id::VARCHAR), 1, 8))::BIGINT % 100 AS bkt,
         CASE WHEN CAST(substr(source, 4) AS INT) % 2 = 0 THEN 25 ELSE 60 END AS rate
  FROM documents
)
SELECT lang, source, CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(CASE WHEN bkt < rate THEN 1 ELSE 0 END) AS BIGINT) AS n_sampled
FROM d GROUP BY lang, source
"""


# BPE-ish tokenizer proxy: letter runs, digit runs, single punctuation marks
# (regexp_extract_all is RE2-safe in both engines — no lookaround), plus a
# subword-unit estimate of ceil(len/4) per token, the budget a ~4-char/token
# BPE vocabulary would spend. Pure map + bounded-key agg.
_BPE_PAT_SPARK = r"[a-z]+|[0-9]+|[^a-z0-9\\s]"
_BPE_PAT_DUCK = r"[a-z]+|[0-9]+|[^a-z0-9\s]"


def q_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token accounting per language: whitespace tokens, BPE-ish regex
    tokens, and estimated subword units — the budget numbers a training-mix
    planner reads before packing sequences."""
    t = register_views(spark, sf_dir)
    ws = F.size(_toks()).cast("long")
    rex = F.expr(f"regexp_extract_all(lower(text), '{_BPE_PAT_SPARK}', 0)")
    n_rex = F.size(rex).cast("long")
    subword = F.expr(
        f"aggregate(transform(regexp_extract_all(lower(text), '{_BPE_PAT_SPARK}', 0), "
        "t -> cast(ceil(length(t) / 4.0) as bigint)), cast(0 as bigint), (a, x) -> a + x)"
    )
    return (
        t["documents"]
        .select("lang", ws.alias("ws"), n_rex.alias("rex"), subword.alias("sw"))
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("ws").alias("ws_tokens"),
            F.sum("rex").alias("regex_tokens"),
            F.sum("sw").alias("subword_units"),
        )
    )


ORACLE_Q_TOKEN_COUNTS = rf"""
WITH d AS (
  SELECT lang,
         CAST(len(string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ')) AS BIGINT) AS ws,
         CAST(len(regexp_extract_all(lower(text), '{_BPE_PAT_DUCK}', 0)) AS BIGINT) AS rex,
         CAST(list_sum(list_transform(regexp_extract_all(lower(text), '{_BPE_PAT_DUCK}', 0),
                                      t -> CAST(ceil(length(t) / 4.0) AS BIGINT))) AS BIGINT) AS sw
  FROM documents
)
SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(ws) AS BIGINT) AS ws_tokens,
       CAST(SUM(rex) AS BIGINT) AS regex_tokens,
       CAST(SUM(sw) AS BIGINT) AS subword_units
FROM d GROUP BY lang
"""


# Rabin-Karp-style polynomial rolling hash (base 131, 50-bit modulus so
# acc*131 + h stays far inside BIGINT in both engines) + winnowing-lite:
# the document fingerprint is the MIN hash over all 8-token windows, the
# standard near-dup-robust fingerprint (winnowing selects window minima so
# local edits only perturb nearby windows).
_ROLL_B = 131
_ROLL_P = 1_000_000_000_000_037


def q_doc_winnow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling-hash document fingerprints: whole-doc polynomial hash plus a
    winnowing fingerprint (min over 8-token rolling windows) with its
    duplicate-group size."""
    t = register_views(spark, sf_dir)
    fold = f"(acc, h) -> (acc * {_ROLL_B} + h) % {_ROLL_P}"
    base = (
        t["documents"]
        .select("doc_id", _toks().alias("toks"))
        .withColumn("th", F.expr(
            "transform(toks, x -> cast(conv(substr(md5(x), 1, 8), 16, 10) as bigint))"
        ))
    )
    full = F.expr(f"aggregate(th, cast(0 as bigint), {fold})")
    winnow = F.expr(
        "CASE WHEN size(th) >= 8 THEN "
        f"array_min(transform(sequence(1, size(th) - 7), "
        f"i -> aggregate(slice(th, i, 8), cast(0 as bigint), {fold}))) "
        "ELSE aggregate(th, cast(0 as bigint), " + fold + ") END"
    )
    out = base.select(
        "doc_id", F.size("th").cast("long").alias("n_tokens"),
        full.alias("roll_fp"), winnow.alias("winnow_fp"),
    )
    # r11 rewrite (VERDICT r10 #4 — the shape duplicate_spans' 4.1× win
    # came from): group_n as a fp-keyed count window instead of
    # groupBy+join. The join-back shape re-ran the rolling-hash map — the
    # plan's dominant per-row CPU by far: one md5 + modular fold per TOKEN
    # plus an 8-token rolling fold per WINDOW — once under the group-size
    # aggregate and once under the join probe, and shuffled the fp stream
    # twice. The window computes the count on the already-shuffled rows:
    # ONE map pass, ONE Exchange. Skew posture (cf. q_doc_fingerprint,
    # which keeps groupBy+join because its map is one cheap md5/doc): a
    # mass-duplicated winnow_fp piles into one window task, but the count
    # buffer is a single long (unlike a collect_set) and the buffered rows
    # are 4 slim fixed-width columns that spill via WindowExec's external
    # row array — bounded memory, paid only on a tail case, vs. the old
    # shape's guaranteed 2× rolling-hash pass at every scale.
    return out.select(
        "doc_id", "n_tokens", "roll_fp", "winnow_fp",
        F.count(F.lit(1)).over(W.partitionBy("winnow_fp")).alias("group_n"))


ORACLE_Q_DOC_WINNOW = rf"""
WITH d AS (
  SELECT doc_id,
         list_transform(string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' '),
                        x -> ('0x' || substr(md5(x), 1, 8))::BIGINT) AS th
  FROM documents
), fp AS (
  SELECT doc_id, CAST(len(th) AS BIGINT) AS n_tokens,
         list_reduce(list_prepend(0::BIGINT, th),
                     (acc, h) -> (acc * {_ROLL_B} + h) % {_ROLL_P}) AS roll_fp,
         CASE WHEN len(th) >= 8 THEN
           list_min(list_transform(range(1, len(th) - 6),
             i -> list_reduce(list_prepend(0::BIGINT, th[i:i+7]),
                              (acc, h) -> (acc * {_ROLL_B} + h) % {_ROLL_P})))
         ELSE list_reduce(list_prepend(0::BIGINT, th),
                          (acc, h) -> (acc * {_ROLL_B} + h) % {_ROLL_P}) END AS winnow_fp
  FROM d
)
SELECT doc_id, n_tokens, roll_fp, winnow_fp,
       CAST(COUNT(*) OVER (PARTITION BY winnow_fp) AS BIGINT) AS group_n
FROM fp
"""


# Gopher-style repetition/quality rules (Rae et al. 2021, "Scaling Language
# Models", appendix A1.1 — public filtering lore also used by C4/RefinedWeb):
# reject docs that are too short, dominated by one word, or low-diversity.
# Thresholds tuned so the synthetic corpus splits non-trivially into both
# classes; the operator under test is the two-shuffle distributed shape:
# explode → (doc, word) counts → per-doc profile → per-(lang, keep) rollup.
# Both shuffles key on doc_id/word — uniform, no skew, linear at 100 TB.
_GOPHER_MIN_TOKENS = 30
_GOPHER_MAX_TOP_FRAC = 0.10
_GOPHER_MIN_DISTINCT_FRAC = 0.30

_GOPHER_SPARK_SQL = f"""
WITH toks AS (
  SELECT doc_id, lang,
         explode(split(regexp_replace(lower(trim(text)), '\\\\s+', ' '), ' ')) AS w
  FROM documents
), wc AS (
  SELECT doc_id, lang, w, COUNT(*) AS c FROM toks GROUP BY doc_id, lang, w
), prof AS (
  SELECT doc_id, lang,
         SUM(c) AS ntok, COUNT(*) AS ndistinct, MAX(c) AS top_c,
         ROUND(SUM(length(w) * c) / CAST(SUM(c) AS DOUBLE), 4) AS mean_word_len
  FROM wc GROUP BY doc_id, lang
), flagged AS (
  SELECT lang, ntok, ndistinct, top_c, mean_word_len,
         (ntok >= {_GOPHER_MIN_TOKENS}
          AND top_c / CAST(ntok AS DOUBLE) <= {_GOPHER_MAX_TOP_FRAC}
          AND ndistinct / CAST(ntok AS DOUBLE) >= {_GOPHER_MIN_DISTINCT_FRAC}) AS keep
  FROM prof
)
SELECT lang, keep, CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(ntok) AS BIGINT) AS total_tokens,
       ROUND(SUM(top_c / CAST(ntok AS DOUBLE)), 6) / COUNT(*) AS avg_top_frac,
       ROUND(SUM(ndistinct / CAST(ntok AS DOUBLE)), 6) / COUNT(*) AS avg_distinct_frac,
       ROUND(SUM(mean_word_len), 6) / COUNT(*) AS avg_word_len
FROM flagged
GROUP BY lang, keep
"""

ORACLE_Q_GOPHER_QUALITY = rf"""
WITH toks AS (
  SELECT doc_id, lang, unnest(string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ')) AS w
  FROM documents
), wc AS (
  SELECT doc_id, lang, w, COUNT(*) AS c FROM toks GROUP BY doc_id, lang, w
), prof AS (
  SELECT doc_id, lang,
         SUM(c) AS ntok, COUNT(*) AS ndistinct, MAX(c) AS top_c,
         ROUND(SUM(length(w) * c) / CAST(SUM(c) AS DOUBLE), 4) AS mean_word_len
  FROM wc GROUP BY doc_id, lang
), flagged AS (
  SELECT lang, ntok, ndistinct, top_c, mean_word_len,
         (ntok >= {_GOPHER_MIN_TOKENS}
          AND top_c / CAST(ntok AS DOUBLE) <= {_GOPHER_MAX_TOP_FRAC}
          AND ndistinct / CAST(ntok AS DOUBLE) >= {_GOPHER_MIN_DISTINCT_FRAC}) AS keep
  FROM prof
)
SELECT lang, keep, CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(ntok) AS BIGINT) AS total_tokens,
       ROUND(SUM(top_c / CAST(ntok AS DOUBLE)), 6) / COUNT(*) AS avg_top_frac,
       ROUND(SUM(ndistinct / CAST(ntok AS DOUBLE)), 6) / COUNT(*) AS avg_distinct_frac,
       ROUND(SUM(mean_word_len), 6) / COUNT(*) AS avg_word_len
FROM flagged
GROUP BY lang, keep
"""


def q_gopher_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-rule quality filter profile: per-(lang, keep-decision) doc
    counts and repetition metrics (top-word fraction, distinct-word
    fraction, mean word length)."""
    register_views(spark, sf_dir)
    return spark.sql(_GOPHER_SPARK_SQL)


# PII scrubbing: the pre-training redaction pass (emails/phones → tags).
# The synthetic corpus carries no real PII, so PII-bearing text is DERIVED
# deterministically per doc (same device as the parse_url query): docs with
# doc_id%3=0 get an email, doc_id%5=0 a phone. The operator under test is the
# codegen'd regexp_replace/regexp_count scrub — a pure map, zero shuffle
# beyond the final bounded-key rollup; text never shuffles.
# Spark SQL literals process backslash escapes ('\+' → '+'); DuckDB's don't.
_EMAIL_PAT = "[a-z0-9._]+@[a-z0-9.-]+[a-z]"
_PHONE_PAT_SPARK = "\\\\+1-555-[0-9]{4}"
_PHONE_PAT_DUCK = "\\+1-555-[0-9]{4}"

_PII_SPARK_SQL = f"""
WITH seeded AS (
  SELECT doc_id, source,
         concat(substr(text, 1, 40),
                CASE WHEN doc_id % 3 = 0
                     THEN concat(' contact ', source, doc_id, '@example.com') ELSE '' END,
                CASE WHEN doc_id % 5 = 0
                     THEN concat(' call +1-555-', lpad(CAST(doc_id % 10000 AS STRING), 4, '0')) ELSE '' END
         ) AS text_pii
  FROM documents
), scrubbed AS (
  SELECT doc_id, source,
         CAST(regexp_count(text_pii, '{_EMAIL_PAT}') AS BIGINT) AS n_email,
         CAST(regexp_count(text_pii, '{_PHONE_PAT_SPARK}') AS BIGINT) AS n_phone,
         regexp_replace(regexp_replace(text_pii, '{_EMAIL_PAT}', '<EMAIL>'),
                        '{_PHONE_PAT_SPARK}', '<PHONE>') AS clean
  FROM seeded
)
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_email) AS BIGINT) AS emails_redacted,
       CAST(SUM(n_phone) AS BIGINT) AS phones_redacted,
       CAST(SUM(CASE WHEN clean LIKE '%<EMAIL>%' OR clean LIKE '%<PHONE>%'
                     THEN 1 ELSE 0 END) AS BIGINT) AS docs_redacted,
       CAST(COUNT(DISTINCT md5(clean)) AS BIGINT) AS distinct_clean
FROM scrubbed
GROUP BY source
"""

ORACLE_Q_PII_SCRUB = f"""
WITH seeded AS (
  SELECT doc_id, source,
         concat(substr(text, 1, 40),
                CASE WHEN doc_id % 3 = 0
                     THEN concat(' contact ', source, doc_id, '@example.com') ELSE '' END,
                CASE WHEN doc_id % 5 = 0
                     THEN concat(' call +1-555-', lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')) ELSE '' END
         ) AS text_pii
  FROM documents
), scrubbed AS (
  SELECT doc_id, source,
         CAST(len(regexp_extract_all(text_pii, '{_EMAIL_PAT}')) AS BIGINT) AS n_email,
         CAST(len(regexp_extract_all(text_pii, '{_PHONE_PAT_DUCK}')) AS BIGINT) AS n_phone,
         regexp_replace(regexp_replace(text_pii, '{_EMAIL_PAT}', '<EMAIL>', 'g'),
                        '{_PHONE_PAT_DUCK}', '<PHONE>', 'g') AS clean
  FROM seeded
)
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_email) AS BIGINT) AS emails_redacted,
       CAST(SUM(n_phone) AS BIGINT) AS phones_redacted,
       CAST(SUM(CASE WHEN clean LIKE '%<EMAIL>%' OR clean LIKE '%<PHONE>%'
                     THEN 1 ELSE 0 END) AS BIGINT) AS docs_redacted,
       CAST(COUNT(DISTINCT md5(clean)) AS BIGINT) AS distinct_clean
FROM scrubbed
GROUP BY source
"""


def q_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII redaction audit: emails/phones scrubbed per source with
    post-scrub distinct-document accounting."""
    register_views(spark, sf_dir)
    return spark.sql(_PII_SPARK_SQL)


def q_duplicate_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-document duplicated-SPAN detection — the exact-substring dedup
    signal of Lee et al. 2022 ("Deduplicating Training Data Makes Language
    Models Better"), windowed instead of suffix-array'd: every 8-token
    window of every document, a window position is DUPLICATED iff its text
    occurs in ≥2 distinct documents; per doc report the duplicated-window
    fraction (the curation policy thresholds on it).

    Plan (r10 optimization-round rewrite): one explode to (doc_id, gram),
    ONE gram-keyed shuffle feeding a window `size(collect_set(doc_id))`
    (== COUNT(DISTINCT doc_id), exactly), one per-doc agg. The previous
    join-back shape ran the tokenize+explode subtree TWICE (once under the
    gram groupBy, once under the join probe) and shuffled the gram stream
    twice — the window computes nd on the already-shuffled rows in place:
    4 → 2 Exchanges, A/B min 1.95 → 0.99 s (every paired reading better;
    OPTIMIZATION_r10.md).

    Skew tradeoff, stated honestly (cf. dedup_simhash, which keeps
    groupBy+join for its group sizes): a mass-duplicated gram's rows land
    in ONE window partition, and while WindowExec's ROW buffer spills
    (ExternalAppendOnlyUnsafeRowArray), the collect_set AGGREGATION BUFFER
    itself is an in-memory per-gram set that does NOT spill — a gram
    duplicated across millions of documents accumulates all its distinct
    doc_ids in one task's memory (ADVICE r10). AQE skew handling only
    splits joins, so neither mechanism bounds that task. The window still
    wins here because the old shape re-ran the full corpus tokenize+explode
    — a guaranteed 2× pass at every scale — to buy splittability for a
    tail case, and unlike simhash fingerprints (where near-identical
    boilerplate collapses to ONE value) an 8-token window key caps
    per-gram multiplicity at the corpus's true span duplication rate. If
    real-scale data shows boilerplate-heavy gram piles, bound per-task
    memory by either (a) a (gram, doc_id) dropDuplicates pre-pass — the
    set then degenerates to a spillable distinct + a count window — or
    (b) reverting to the agg+join shape (kept verbatim in
    tests/ab_compare_r10.py). At 100 TB, also shuffle the 64-bit xxhash64
    of the gram instead of the raw string (identical grouping, ~10× fewer
    shuffle bytes); the oracle groups on the raw gram so this query does
    too, keeping both engines bit-identical.
    """
    t = register_views(spark, sf_dir)
    base = (
        t["documents"].select("doc_id", _toks().alias("t"))
        .filter(F.size("t") >= 8)
        .select("doc_id", F.explode(F.expr(
            "transform(sequence(1, size(t) - 7), "
            "i -> concat_ws(' ', slice(t, i, 8)))")).alias("gram"))
    )
    # r10 optimization note: a (gram, doc_id, k) pre-aggregate variant
    # (combine duplicate windows before the gram join, re-weight by k) was
    # built and measured (tests/ab_compare_r10.py) — it LOST ~20%: at this
    # corpus's low duplicate-window rate k≈1 almost everywhere, so the
    # combine shrinks nothing and just adds an aggregation, and the
    # explode subtree still runs once per consumer. The pre-agg only pays
    # when window duplication is heavy; documented here, not enacted.
    nd = F.size(F.collect_set("doc_id").over(W.partitionBy("gram")))
    dup = F.sum(F.when(F.col("nd") >= 2, 1).otherwise(0))
    return (
        base.withColumn("nd", nd)
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).cast("long").alias("n_windows"),
             dup.cast("long").alias("n_dup_windows"),
             F.round(dup / F.count(F.lit(1)), 4).alias("dup_ratio"))
    )


ORACLE_Q_DUPLICATE_SPANS = r"""
WITH toks AS (
  SELECT doc_id,
         string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ') AS t
  FROM documents
), wins AS (
  SELECT doc_id,
         unnest(list_transform(range(1, len(t) - 6),
                               i -> array_to_string(t[i:i+7], ' '))) AS gram
  FROM toks WHERE len(t) >= 8
), gd AS (
  SELECT gram, COUNT(DISTINCT doc_id) AS nd FROM wins GROUP BY gram
)
SELECT w.doc_id, CAST(COUNT(*) AS BIGINT) AS n_windows,
       CAST(SUM(CASE WHEN g.nd >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_windows,
       ROUND(SUM(CASE WHEN g.nd >= 2 THEN 1 ELSE 0 END)::DOUBLE / COUNT(*), 4) AS dup_ratio
FROM wins w JOIN gd g ON g.gram = w.gram
GROUP BY w.doc_id
"""


# ---------------------------------------------------------------------------
# Vocabulary coverage: top-V vocab build + per-language OOV rates — the
# tokenizer-coverage planning table run before committing to a vocab size.
# ---------------------------------------------------------------------------

_VOCAB_V = 500

_VOCAB_SPARK = rf"""
WITH tok AS (
  SELECT lang, word
  FROM (SELECT lang, split(regexp_replace(lower(trim(text)), '\\s+', ' '), ' ') AS words
        FROM documents)
  LATERAL VIEW explode(words) t AS word
), wc AS (
  SELECT word, COUNT(*) AS c FROM tok GROUP BY word
), vocab AS (
  SELECT word, 1 AS in_vocab FROM wc ORDER BY c DESC, word LIMIT {_VOCAB_V}
)
SELECT tok.lang,
       CAST(COUNT(*) AS BIGINT) AS n_tokens,
       CAST(SUM(CASE WHEN v.in_vocab IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS oov_tokens,
       ROUND(SUM(CASE WHEN v.in_vocab IS NULL THEN 1 ELSE 0 END) / CAST(COUNT(*) AS DOUBLE), 4) AS oov_rate,
       CAST(COUNT(DISTINCT tok.word) AS BIGINT) AS n_types,
       CAST(COUNT(DISTINCT CASE WHEN v.in_vocab IS NULL THEN tok.word END) AS BIGINT) AS oov_types
FROM tok LEFT JOIN vocab v ON tok.word = v.word
GROUP BY tok.lang
"""

ORACLE_Q_VOCAB_OOV_RATE = rf"""
WITH tok AS (
  SELECT lang, unnest(string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ')) AS word
  FROM documents
), wc AS (
  SELECT word, COUNT(*) AS c FROM tok GROUP BY word
), vocab AS (
  SELECT word, 1 AS in_vocab FROM wc ORDER BY c DESC, word LIMIT {_VOCAB_V}
)
SELECT tok.lang,
       CAST(COUNT(*) AS BIGINT) AS n_tokens,
       CAST(SUM(CASE WHEN v.in_vocab IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS oov_tokens,
       ROUND(SUM(CASE WHEN v.in_vocab IS NULL THEN 1 ELSE 0 END) / CAST(COUNT(*) AS DOUBLE), 4) AS oov_rate,
       CAST(COUNT(DISTINCT tok.word) AS BIGINT) AS n_types,
       CAST(COUNT(DISTINCT CASE WHEN v.in_vocab IS NULL THEN tok.word END) AS BIGINT) AS oov_types
FROM tok LEFT JOIN vocab v ON tok.word = v.word
GROUP BY tok.lang
"""


def q_vocab_oov_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-500 corpus vocabulary (count-desc, word-asc deterministic
    tiebreak) joined back against the token stream: per-language token- and
    type-level OOV rates — the coverage table that sizes a tokenizer vocab.
    At 100 TB the vocab is a LIMIT-V frame (broadcast join against the
    token stream, one word-count shuffle with map-side combine); the
    deterministic tiebreak makes the vocabulary reproducible engine-to-
    engine, which the oracle checks exactly."""
    register_views(spark, sf_dir)
    return spark.sql(_VOCAB_SPARK)


_MIX_WEIGHTS_SPARK = "VALUES ('en', 0.40), ('zh', 0.15), ('de', 0.15), ('fr', 0.15), ('es', 0.15) AS w(lang, wt)"
_MIX_WEIGHTS_DUCK = "(VALUES ('en', 0.40), ('zh', 0.15), ('de', 0.15), ('fr', 0.15), ('es', 0.15)) w(lang, wt)"

_MIX_SPARK = f"""
WITH budget AS (
  SELECT CAST(FLOOR(SUM(n_chars) * 0.30) AS BIGINT) AS total_budget FROM documents
), weights AS (
  SELECT * FROM {_MIX_WEIGHTS_SPARK}
), targets AS (
  SELECT w.lang, CAST(FLOOR(w.wt * b.total_budget) AS BIGINT) AS target_chars
  FROM weights w CROSS JOIN budget b
), ordered AS (
  SELECT lang, n_chars,
         SUM(n_chars) OVER (
           PARTITION BY lang
           ORDER BY md5(concat('mix:', cast(doc_id AS string))), doc_id
           ROWS UNBOUNDED PRECEDING) AS cum_chars
  FROM documents
)
SELECT t.lang, t.target_chars,
       CAST(SUM(CASE WHEN o.cum_chars - o.n_chars < t.target_chars THEN 1 ELSE 0 END) AS BIGINT) AS n_docs_kept,
       CAST(SUM(CASE WHEN o.cum_chars - o.n_chars < t.target_chars THEN o.n_chars ELSE 0 END) AS BIGINT) AS chars_kept,
       ROUND(CAST(SUM(CASE WHEN o.cum_chars - o.n_chars < t.target_chars THEN o.n_chars ELSE 0 END) AS DOUBLE)
             / t.target_chars, 4) AS fill_ratio
FROM targets t JOIN ordered o ON o.lang = t.lang
GROUP BY t.lang, t.target_chars
"""


_MIX_WEIGHTS = [("en", 0.40), ("zh", 0.15), ("de", 0.15), ("fr", 0.15),
                ("es", 0.15)]


def corpus_mix_two_phase(docs: DataFrame, weights: list[tuple[str, float]],
                         budget_frac: float = 0.30,
                         n_buckets: int = 256) -> DataFrame:
    """Skew-proof budgeted-mix cut (the scale path for ``q_corpus_mix``;
    closes VERDICT r5 #3 — the single-window variant put an entire language
    in one window partition, a real hazard for an 80%-English corpus).

    Same local/global split as the reference's distinct-agg skew rewrite
    (flink-table-planner `SplitAggregateRule.scala:121`): do bounded work
    per bucket first, combine the tiny per-bucket summaries globally, then
    touch raw rows again only inside one bucket.

    Phase 1 — bucket by the first 2 hex chars of the md5 sort key. md5 is
    uniform, so prefix buckets ARE equi-depth range partitions of each
    language's sort order, and bucket order is consistent with full-key
    order. One (lang, bucket) agg with map-side combine — ≤ langs×256
    output rows regardless of corpus size.

    Phase 2 — running sum over that summary frame (window partitions hold
    ≤ 256 rows — never a whole language), classify each bucket against the
    broadcast per-language target: fully kept (cum_through < target),
    fully dropped (cum_before ≥ target), or the straddling boundary
    bucket.

    Phase 3 — the exact greedy window runs ONLY over boundary-bucket rows
    (~1/n_buckets of ONE language), seeded with the bucket-prefix offset;
    a pure broadcast-semi map filter selects them. Bit-identical to the
    exact single-window cut — the DuckDB oracle stays the exact window and
    the hashes match."""
    key = F.md5(F.concat(F.lit("mix:"), F.col("doc_id").cast("string")))
    d = docs.select(
        "lang", "doc_id", "n_chars", key.alias("__mix_key"),
        F.substring(key, 1, 2).alias("__mix_bkt"))

    budget = docs.agg(
        F.floor(F.sum("n_chars") * budget_frac).cast("long").alias("total_budget"))
    wdf = docs.sparkSession.createDataFrame(weights, ["lang", "wt"])
    targets = (wdf.crossJoin(F.broadcast(budget))
               .select("lang", F.floor(F.col("wt") * F.col("total_budget"))
                       .cast("long").alias("target_chars")))

    bkt = d.groupBy("lang", "__mix_bkt").agg(
        F.sum("n_chars").alias("bkt_chars"),
        F.count(F.lit(1)).alias("bkt_docs"))
    wc = W.partitionBy("lang").orderBy("__mix_bkt") \
        .rowsBetween(W.unboundedPreceding, 0)
    cum = (bkt.withColumn("cum_through", F.sum("bkt_chars").over(wc))
           .withColumn("cum_before", F.col("cum_through") - F.col("bkt_chars"))
           .join(F.broadcast(targets), "lang"))

    base = cum.groupBy("lang", "target_chars").agg(
        F.sum(F.when(F.col("cum_through") < F.col("target_chars"),
                     F.col("bkt_docs")).otherwise(0)).alias("docs_full"),
        F.sum(F.when(F.col("cum_through") < F.col("target_chars"),
                     F.col("bkt_chars")).otherwise(0)).alias("chars_full"))

    boundary = cum.filter(
        (F.col("cum_before") < F.col("target_chars"))
        & (F.col("cum_through") >= F.col("target_chars"))
    ).select("lang", "__mix_bkt", "cum_before", "target_chars")
    wb = W.partitionBy("lang").orderBy("__mix_key", "doc_id") \
        .rowsBetween(W.unboundedPreceding, 0)
    bnd = (d.join(F.broadcast(boundary), ["lang", "__mix_bkt"])
           .withColumn("cum_in_bkt", F.sum("n_chars").over(wb))
           .filter(F.col("cum_before") + F.col("cum_in_bkt") - F.col("n_chars")
                   < F.col("target_chars"))
           .groupBy("lang").agg(F.count(F.lit(1)).alias("docs_bnd"),
                                F.sum("n_chars").alias("chars_bnd")))

    chars_kept = (F.col("chars_full")
                  + F.coalesce(F.col("chars_bnd"), F.lit(0)))
    return (base.join(bnd, "lang", "left")
            .select("lang", "target_chars",
                    (F.col("docs_full") + F.coalesce(F.col("docs_bnd"), F.lit(0)))
                    .cast("long").alias("n_docs_kept"),
                    chars_kept.cast("long").alias("chars_kept"),
                    F.round(chars_kept.cast("double") / F.col("target_chars"), 4)
                    .alias("fill_ratio")))


def budget_cut_rows(docs: DataFrame, targets: DataFrame,
                    key_prefix: str = "mix:") -> DataFrame:
    """ROW-LEVEL two-phase budgeted cut — same 3-phase bucket split as
    ``corpus_mix_two_phase`` but returning the kept ROWS instead of the
    per-language summary (the shape pipeline_end_to_end needs). `docs`
    must carry (lang, doc_id, n_chars, ...); `targets` is the broadcastable
    (lang, __target) frame. Membership is bit-identical to the exact
    single-window cumulative cut: md5-prefix buckets are equi-depth range
    partitions of each language's sort order, fully-kept buckets pass via
    a broadcast semi join (no window touches their rows), and the exact
    greedy window runs only inside the one straddling bucket per
    language."""
    key = F.md5(F.concat(F.lit(key_prefix), F.col("doc_id").cast("string")))
    d = (docs.withColumn("__mix_key", key)
         .withColumn("__mix_bkt", F.substring(F.col("__mix_key"), 1, 2)))
    bkt = d.groupBy("lang", "__mix_bkt").agg(F.sum("n_chars").alias("__bkt_chars"))
    wc = (W.partitionBy("lang").orderBy("__mix_bkt")
          .rowsBetween(W.unboundedPreceding, 0))
    cum = (bkt.withColumn("__cum_through", F.sum("__bkt_chars").over(wc))
           .withColumn("__cum_before",
                       F.col("__cum_through") - F.col("__bkt_chars"))
           .join(F.broadcast(targets), "lang"))
    full = (cum.filter(F.col("__cum_through") < F.col("__target"))
            .select("lang", "__mix_bkt"))
    boundary = cum.filter(
        (F.col("__cum_before") < F.col("__target"))
        & (F.col("__cum_through") >= F.col("__target"))
    ).select("lang", "__mix_bkt", "__cum_before", "__target")
    kept_full = d.join(F.broadcast(full), ["lang", "__mix_bkt"], "left_semi")
    wb = (W.partitionBy("lang").orderBy("__mix_key", "doc_id")
          .rowsBetween(W.unboundedPreceding, 0))
    kept_bnd = (d.join(F.broadcast(boundary), ["lang", "__mix_bkt"])
                .withColumn("__cum_in", F.sum("n_chars").over(wb))
                .filter(F.col("__cum_before") + F.col("__cum_in")
                        - F.col("n_chars") < F.col("__target"))
                .drop("__cum_before", "__target", "__cum_in"))
    return kept_full.unionByName(kept_bnd).drop("__mix_key", "__mix_bkt")


def q_corpus_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Budgeted training-mix assembly (DoReMi/LLaMA-style static mixture
    weights): give each language a target share of a global character budget
    (30% of the corpus here), then greedily keep documents in deterministic
    md5 order until the language's budget is first crossed. Outputs the
    planning table a mixture run starts from — per-language target, kept
    docs/chars, and fill ratio (a fill_ratio < 1 flags an under-resourced
    language that cannot meet its weight, the signal to re-normalize).

    Runs the skew-proof two-phase cut (``corpus_mix_two_phase``) so the
    graded path IS the 100 TB path: no window ever partitions a whole
    language; the exact single-window formulation survives as ``_MIX_SPARK``
    (and as the DuckDB oracle, which the two-phase result matches
    bit-for-bit)."""
    t = register_views(spark, sf_dir)
    return corpus_mix_two_phase(t["documents"], _MIX_WEIGHTS)


ORACLE_Q_CORPUS_MIX = f"""
WITH budget AS (
  SELECT CAST(FLOOR(SUM(n_chars) * 0.30) AS BIGINT) AS total_budget FROM documents
), weights AS (
  SELECT * FROM {_MIX_WEIGHTS_DUCK}
), targets AS (
  SELECT w.lang, CAST(FLOOR(w.wt * b.total_budget) AS BIGINT) AS target_chars
  FROM weights w CROSS JOIN budget b
), ordered AS (
  SELECT lang, n_chars,
         SUM(n_chars) OVER (
           PARTITION BY lang
           ORDER BY md5('mix:' || doc_id::VARCHAR), doc_id
           ROWS UNBOUNDED PRECEDING) AS cum_chars
  FROM documents
)
SELECT t.lang, t.target_chars,
       CAST(SUM(CASE WHEN o.cum_chars - o.n_chars < t.target_chars THEN 1 ELSE 0 END) AS BIGINT) AS n_docs_kept,
       CAST(SUM(CASE WHEN o.cum_chars - o.n_chars < t.target_chars THEN o.n_chars ELSE 0 END) AS BIGINT) AS chars_kept,
       ROUND(CAST(SUM(CASE WHEN o.cum_chars - o.n_chars < t.target_chars THEN o.n_chars ELSE 0 END) AS DOUBLE)
             / t.target_chars, 4) AS fill_ratio
FROM targets t JOIN ordered o ON o.lang = t.lang
GROUP BY t.lang, t.target_chars
"""


# Identical SQL text in both engines: levenshtein / substr / ROW_NUMBER all
# agree, and the typo injection is deterministic (every 7th supplier's last
# character becomes 'X').
_FUZZY_SQL = """
WITH catalog AS (
  SELECT s_suppkey AS clean_key, s_name AS clean_name FROM supplier
), dirty AS (
  SELECT s_suppkey AS dirty_key,
         CASE WHEN s_suppkey % 7 = 0
              THEN CONCAT(SUBSTR(s_name, 1, LENGTH(s_name) - 1), 'X')
              ELSE s_name END AS dirty_name
  FROM supplier
), cand AS (
  SELECT d.dirty_key, d.dirty_name, c.clean_key,
         LEVENSHTEIN(d.dirty_name, c.clean_name) AS dist
  FROM dirty d JOIN catalog c
    ON SUBSTR(d.dirty_name, 1, 16) = SUBSTR(c.clean_name, 1, 16)
  WHERE LEVENSHTEIN(d.dirty_name, c.clean_name) <= 2
), best AS (
  SELECT dirty_key, clean_key, dist,
         ROW_NUMBER() OVER (PARTITION BY dirty_key
                            ORDER BY dist, clean_key) AS rn
  FROM cand
)
SELECT dirty_key, clean_key AS matched_key, CAST(dist AS BIGINT) AS dist,
       CAST(CASE WHEN dirty_key = clean_key THEN 1 ELSE 0 END AS BIGINT)
         AS is_correct
FROM best WHERE rn = 1
"""


def q_fuzzy_entity_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocked fuzzy entity resolution — the data-cleaning workhorse the
    dedup family doesn't cover (record linkage against a clean catalog, not
    self-dedup): deterministic typos corrupt every 7th supplier name, and
    each dirty record re-matches the catalog via BLOCKING (16-char prefix
    equi-join — never a cross join) + Levenshtein ≤ 2 + best-match rank
    (min distance, then min key). `is_correct` audits linkage accuracy in
    the artifact itself. Scale: blocking turns the O(n²) distance matrix
    into per-block candidates; block width is the recall/cost knob exactly
    as in the MinHash banding family (a boundary-crossing typo is missed —
    inherent to blocking, mirrored identically by the oracle)."""
    register_views(spark, sf_dir)
    return spark.sql(_FUZZY_SQL)


QUERIES = {
    "text_stats": q_text_stats,
    "corpus_mix": q_corpus_mix,
    "fuzzy_entity_match": q_fuzzy_entity_match,
    "vocab_oov_rate": q_vocab_oov_rate,
    "token_counts": q_token_counts,
    "doc_winnow": q_doc_winnow,
    "corpus_sample": q_corpus_sample,
    "lang_id": q_lang_id,
    "doc_fingerprint": q_doc_fingerprint,
    "tfidf_top_terms": q_tfidf_top_terms,
    "gopher_quality": q_gopher_quality,
    "pii_scrub": q_pii_scrub,
    "duplicate_spans": q_duplicate_spans,
}

ORACLE = {
    "text_stats": ORACLE_Q_TEXT_STATS,
    "corpus_mix": ORACLE_Q_CORPUS_MIX,
    "fuzzy_entity_match": _FUZZY_SQL,
    "vocab_oov_rate": ORACLE_Q_VOCAB_OOV_RATE,
    "token_counts": ORACLE_Q_TOKEN_COUNTS,
    "doc_winnow": ORACLE_Q_DOC_WINNOW,
    "corpus_sample": ORACLE_Q_CORPUS_SAMPLE,
    "lang_id": ORACLE_Q_LANG_ID,
    "doc_fingerprint": ORACLE_Q_DOC_FINGERPRINT,
    "tfidf_top_terms": ORACLE_Q_TFIDF_TOP_TERMS,
    "gopher_quality": ORACLE_Q_GOPHER_QUALITY,
    "pii_scrub": ORACLE_Q_PII_SCRUB,
    "duplicate_spans": ORACLE_Q_DUPLICATE_SPANS,
}
