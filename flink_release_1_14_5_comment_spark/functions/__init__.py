"""Flink scalar-function surface (SURVEY.md §2.8).

~95% of the reference's ~245 SQL operators map 1:1 onto
`pyspark.sql.functions` (see the SURVEY §2.8 table). This package holds the
shims for the remainder — all pure Column expressions (JVM-side, codegen'd),
no Python UDFs.
"""

from flink_release_1_14_5_comment_spark.functions.scalar import (  # noqa: F401
    split_index,
    is_decimal,
    is_digit,
    is_alpha,
    truncate_numeric,
    hash_code,
    regexp as regexp_fn,
    similar_to,
)
