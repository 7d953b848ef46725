"""PySpark-native analytics engine with the query/data-processing surface of
Apache Flink 1.14.5 (reference: guyuetftb/flink-release-1.14.5-comment).

Architecture (SURVEY.md §7): everything Catalyst / Structured Streaming already
provides is *configured*, not re-built. Our code is:

1. ``session`` / ``catalog``   — tuned SparkSession + table registration
2. ``operators``               — batch relational operator surface (SURVEY §2.2-2.8)
3. ``streaming``               — Structured-Streaming surface + custom stateful ops (§2.9)
4. ``pipeline``                — LLM-data-pipeline extras (dedup, similarity, text, multimodal)
5. ``functions``               — Flink scalar-function shims that Spark lacks (§2.8)
6. ``api``                     — thin Table/DataStream facades with Flink semantics (§3)
"""

__version__ = "0.1.0"

from flink_release_1_14_5_comment_spark.session import get_spark  # noqa: F401
from flink_release_1_14_5_comment_spark.catalog import load_tables, register_views  # noqa: F401
