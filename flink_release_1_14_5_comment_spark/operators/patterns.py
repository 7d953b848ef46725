"""Event-pattern detection (SURVEY §2.9 CEP / MATCH_RECOGNIZE — reference
NFA.java:86, CepOperator.java:81, StreamExecMatch.java:89).

Batch flavor: ordered-sequence patterns are relational — a pattern
A → B → C within T is a 3-way self-join with time-band predicates (the same
rewrite Flink's MATCH_RECOGNIZE planner performs for simple patterns, minus
greedy/quantifier semantics). The streaming NFA with quantifiers lives in
streaming/cep.py.

Scale: the self-joins are equi-keyed on user_id, time-banded — each join
shuffles on the key once; per-key event counts bound the intermediate size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flink_release_1_14_5_comment_spark.catalog import register_views


def q_funnel_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MATCH_RECOGNIZE 'V C P within 24h' funnel: views completed by a click
    then a purchase, strictly ordered, within 24 hours of the view."""
    t = register_views(spark, sf_dir)
    e = t["events"]
    v = e.filter(F.col("event_type") == "view").select(
        F.col("user_id").alias("u"), F.col("event_id").alias("view_id"), F.col("ts").alias("v_ts")
    )
    c = e.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("cu"), F.col("ts").alias("c_ts")
    )
    p = e.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("pu"), F.col("ts").alias("p_ts")
    )
    hour = F.expr("INTERVAL 24 HOURS")
    funnels = (
        v.join(c, (v.u == c.cu) & (c.c_ts > v.v_ts) & (c.c_ts <= v.v_ts + hour))
        .join(p, (v.u == F.col("pu")) & (F.col("p_ts") > F.col("c_ts")) & (F.col("p_ts") <= v.v_ts + hour))
        .select("u", "view_id")
        .distinct()
    )
    return (
        funnels.groupBy(F.col("u").alias("user_id"))
        .agg(F.count(F.lit(1)).alias("n_funnels"))
    )


ORACLE_Q_FUNNEL_MATCH = """
SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_funnels
FROM (
  SELECT DISTINCT v.user_id, v.event_id
  FROM events v
  JOIN events c ON c.user_id = v.user_id AND c.event_type = 'click'
               AND c.ts > v.ts AND c.ts <= v.ts + INTERVAL '24 hours'
  JOIN events p ON p.user_id = v.user_id AND p.event_type = 'purchase'
               AND p.ts > c.ts AND p.ts <= v.ts + INTERVAL '24 hours'
  WHERE v.event_type = 'view'
)
GROUP BY user_id
"""


def q_sessionize_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-session event-type paths (first 5 steps) — the sequence-extraction
    primitive under CEP/funnel analytics. Sessions = 30-min-gap islands."""
    return _sql(spark, sf_dir, """
        WITH flagged AS (
          SELECT user_id, ts, event_id, event_type,
                 CASE WHEN lag(ts) OVER w IS NULL
                      OR ts - lag(ts) OVER w >= INTERVAL 30 MINUTES
                      THEN 1 ELSE 0 END AS new_s
          FROM events
          WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ), numbered AS (
          SELECT *, SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                     ROWS UNBOUNDED PRECEDING) AS sid
          FROM flagged
        ), steps AS (
          SELECT user_id, sid, event_type, ts, event_id,
                 ROW_NUMBER() OVER (PARTITION BY user_id, sid ORDER BY ts, event_id) AS step
          FROM numbered
        )
        SELECT user_id, CAST(sid AS BIGINT) AS sid,
               concat_ws('>', sort_array(collect_list(struct(step, event_type))).event_type) AS path,
               CAST(COUNT(*) AS BIGINT) AS n_events
        FROM steps WHERE step <= 5
        GROUP BY user_id, sid
    """)


ORACLE_Q_SESSIONIZE_PATHS = """
WITH flagged AS (
  SELECT user_id, ts, event_id, event_type,
         CASE WHEN lag(ts) OVER w IS NULL
              OR ts - lag(ts) OVER w >= INTERVAL '30 minutes'
              THEN 1 ELSE 0 END AS new_s
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), numbered AS (
  SELECT *, SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                             ROWS UNBOUNDED PRECEDING) AS sid
  FROM flagged
), steps AS (
  SELECT user_id, sid, event_type, ts, event_id,
         ROW_NUMBER() OVER (PARTITION BY user_id, sid ORDER BY ts, event_id) AS step
  FROM numbered
)
SELECT user_id, CAST(sid AS BIGINT) AS sid,
       string_agg(event_type, '>' ORDER BY step) AS path,
       CAST(COUNT(*) AS BIGINT) AS n_events
FROM steps WHERE step <= 5
GROUP BY user_id, sid
"""


def _sql(spark: SparkSession, sf_dir: str, query: str) -> DataFrame:
    register_views(spark, sf_dir)
    return spark.sql(query)


def q_cep_nfa_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The CEP NFA itself on the BATCH path (cep() via applyInPandas —
    reference reuses CepOperator for bounded MATCH_RECOGNIZE): V→C→P within
    24 h under NO SKIP, with a MEASURES projection (SUM(P.value) = the
    matched purchase's value, exercising capture+aggregate). Same
    closed-form first-match oracle as stream_cep_funnel (two correlated
    MINs), extended to fetch the matched purchase's value — this
    hash-checks run seeding, first-match absorption, horizon pruning AND
    the measures pipeline on bounded input. Tie assumption as there:
    microsecond timestamps are collision-free in the testdata."""
    from flink_release_1_14_5_comment_spark.streaming.match_recognize import (
        match_recognize,
    )

    t = register_views(spark, sf_dir)
    ev = t["events"].select("user_id", "event_id", "ts", "event_type", "value")
    return match_recognize(
        ev,
        partition_by=["user_id"], order_by="ts",
        pattern="V C P",
        define={"V": "event_type = 'view'", "C": "event_type = 'click'",
                "P": "event_type = 'purchase'"},
        measures={"purchase_value": "SUM(P.value)"},
        after_match="NO SKIP",
        within_seconds=24 * 3600,
        id_col="event_id",
    ).select("user_id", "match_start", "match_end", "purchase_value")


ORACLE_Q_CEP_NFA_BATCH = """
WITH v AS (SELECT user_id, ts FROM events WHERE event_type='view'),
c AS (SELECT user_id, ts FROM events WHERE event_type='click'),
p AS (SELECT user_id, ts FROM events WHERE event_type='purchase'),
vc AS (
  SELECT v.user_id, v.ts AS v_ts,
         (SELECT MIN(c.ts) FROM c WHERE c.user_id = v.user_id AND c.ts > v.ts
           AND c.ts <= v.ts + INTERVAL '24 hours') AS c_ts
  FROM v
), vcp AS (
  SELECT user_id, v_ts, c_ts,
         (SELECT MIN(p.ts) FROM p WHERE p.user_id = vc.user_id
           AND p.ts > vc.c_ts
           AND p.ts <= vc.v_ts + INTERVAL '24 hours') AS p_ts
  FROM vc WHERE c_ts IS NOT NULL
)
SELECT vcp.user_id, v_ts AS match_start, p_ts AS match_end,
       pv.value AS purchase_value
FROM vcp
JOIN events pv ON pv.user_id = vcp.user_id AND pv.ts = vcp.p_ts
              AND pv.event_type = 'purchase'
WHERE p_ts IS NOT NULL
"""


_MR_SQL_TEXT = """
SELECT * FROM events MATCH_RECOGNIZE (
  PARTITION BY user_id
  ORDER BY ts
  MEASURES SUM(P.value) AS purchase_value
  AFTER MATCH NO SKIP
  PATTERN (V C P) WITHIN INTERVAL '24' HOUR
  DEFINE
    V AS event_type = 'view',
    C AS event_type = 'click',
    P AS event_type = 'purchase'
)
"""


def q_match_recognize_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SAME V->C->P funnel as cep_nfa_batch, entered through the Flink
    SQL TEXT (reference MatchRecognizeITCase / StreamExecMatch): the query
    string is parsed by parse_match_recognize_sql (paren-aware DEFINE and
    MEASURES splitting, WITHIN normalization, AFTER MATCH strategy) onto the
    identical NFA — so this grades the PARSER + translation layer against
    the closed-form oracle, where cep_nfa_batch grades only the operator.
    Identical oracle by design: any drift between the SQL path and the
    programmatic path shows up as exactly one of the two failing."""
    from flink_release_1_14_5_comment_spark.streaming.match_recognize import (
        match_recognize_sql,
    )

    t = register_views(spark, sf_dir)
    ev = t["events"].select("user_id", "event_id", "ts", "event_type", "value")
    return match_recognize_sql(ev, _MR_SQL_TEXT, id_col="event_id").select(
        "user_id", "match_start", "match_end", "purchase_value")


QUERIES = {
    "funnel_match": q_funnel_match,
    "sessionize_paths": q_sessionize_paths,
    "cep_nfa_batch": q_cep_nfa_batch,
    "match_recognize_sql": q_match_recognize_sql,
}

ORACLE = {
    "funnel_match": ORACLE_Q_FUNNEL_MATCH,
    "sessionize_paths": ORACLE_Q_SESSIONIZE_PATHS,
    "cep_nfa_batch": ORACLE_Q_CEP_NFA_BATCH,
    "match_recognize_sql": ORACLE_Q_CEP_NFA_BATCH,
}
