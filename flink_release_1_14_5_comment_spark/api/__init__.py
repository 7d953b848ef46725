"""Thin Python facades reproducing the reference's user-facing APIs
(SURVEY.md §3): Table/SQL (`TableEnvironment`, `Table`) and `DataStream`.

Design (SURVEY §3.2-3.3): Flink's Table API builds QueryOperation trees that
feed the same planner as SQL; Spark's DataFrame IS that API — the facades
translate surface syntax (DDL `WITH` options, `WATERMARK` clauses, expression
strings like "b.sum as total") and delegate everything else to Catalyst.
"""

from flink_release_1_14_5_comment_spark.api.table_env import (  # noqa: F401
    Over,
    Session,
    Slide,
    Table,
    TableEnvironment,
    Tumble,
)
from flink_release_1_14_5_comment_spark.api.datastream import (  # noqa: F401
    StreamExecutionEnvironment,
    DataStream,
    KeyedStream,
)
