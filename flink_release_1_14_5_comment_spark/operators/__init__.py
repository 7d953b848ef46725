"""Batch relational operator surface (SURVEY.md §2.2-§2.8).

Each module exports ``QUERIES: dict[str, Callable[(spark, sf_dir), DataFrame]]``
and ``ORACLE: dict[str, str]`` (DuckDB-SQL equivalents for the driver's
correctness gate). ``__spark_entry__.py`` aggregates them.
"""
