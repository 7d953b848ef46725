"""Flink Table/SQL API facade (SURVEY §3.1-3.2).

Reference entry points re-expressed:
  * ``TableEnvironment.execute_sql`` — TableEnvironmentImpl.java:735. DDL
    (`CREATE TABLE … WITH (…)`) is translated into Spark reader registration;
    queries pass through to `spark.sql` (Calcite's job → Catalyst's job).
  * ``WATERMARK FOR ts AS ts - INTERVAL '5' SECOND`` column clause →
    remembered rowtime; applied as ``withWatermark`` when the table is read
    as a stream (streaming=True connector or `to_stream`).
  * ``Table`` — Table.java:128 (select) etc.; expression strings support the
    Flink suffix-agg style ("b.sum AS total") plus any Spark SQL expression.

Unsupported DDL surface raises with a clear message (documented non-goals:
catalogs beyond in-memory, PRIMARY KEY enforcement — Flink's is
NOT ENFORCED anyway). ``CREATE TABLE … LIKE`` (FLIP-110) is supported with
the reference's INCLUDING/EXCLUDING/OVERWRITING merge strategies
(see ``_create_table_like``).
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flink_release_1_14_5_comment_spark.api.sql_translate import (
    translate_flink_sql,
)
from flink_release_1_14_5_comment_spark.session import get_spark
from flink_release_1_14_5_comment_spark.streaming.watermarks import parse_watermark_ddl

_CREATE_RE = re.compile(
    r"^\s*CREATE\s+(?:TEMPORARY\s+)?TABLE\s+(?:IF\s+NOT\s+EXISTS\s+)?(\w+)\s*\((?P<cols>.*)\)\s*WITH\s*\((?P<opts>.*)\)\s*$",
    re.IGNORECASE | re.DOTALL,
)
_OPT_RE = re.compile(r"'([^']+)'\s*=\s*'([^']*)'")
# CREATE TABLE with a PARTITIONED BY clause (reference SqlCreateTable
# partitionKeyList → FileSystemTableSink bucketed layout). Tried before
# _CREATE_RE, whose greedy cols capture would swallow the clause.
_CREATE_PART_RE = re.compile(
    r"^\s*CREATE\s+(?:TEMPORARY\s+)?TABLE\s+(?:IF\s+NOT\s+EXISTS\s+)?(\w+)\s*"
    r"\((?P<cols>.*)\)\s*PARTITIONED\s+BY\s*\((?P<parts>[^()]*)\)\s*"
    r"WITH\s*\((?P<opts>.*)\)\s*$",
    re.IGNORECASE | re.DOTALL,
)
# DDL generated-column items: `name AS expr` (computed) and
# `name TYPE METADATA [FROM 'key'] [VIRTUAL]` (metadata column)
_COMPUTED_COL_RE = re.compile(r"^`?(\w+)`?\s+AS\s+(.+)$",
                              re.IGNORECASE | re.DOTALL)
_METADATA_COL_RE = re.compile(
    r"^`?(\w+)`?\s+([A-Za-z]+(?:\(\d+(?:\s*,\s*\d+)?\))?)\s+METADATA"
    r"(?:\s+FROM\s+'([^']+)')?(?:\s+VIRTUAL)?$",
    re.IGNORECASE,
)
_INSERT_RE = re.compile(
    r"^\s*INSERT\s+(?P<mode>INTO|OVERWRITE)\s+(?P<tbl>\w+)\s*"
    r"(?:PARTITION\s*\((?P<static>[^()]*)\)\s*)?"
    r"(?P<query>SELECT\b.*|VALUES\b.*)$",
    re.IGNORECASE | re.DOTALL,
)
_STATIC_PART_RE = re.compile(r"`?(\w+)`?\s*=\s*(?:'([^']*)'|(\S+))")
# FLIP-110 CREATE TABLE ... LIKE (reference parser SqlCreateTableLike, merge
# semantics MergeTableLikeUtil.java). Must be tried BEFORE _CREATE_RE: that
# regex's greedy WITH(...) capture would swallow a trailing LIKE clause.
_CREATE_LIKE_RE = re.compile(
    r"^\s*CREATE\s+(?:TEMPORARY\s+)?TABLE\s+(?:IF\s+NOT\s+EXISTS\s+)?(?P<name>\w+)\s*"
    r"(?:\((?P<cols>.*?)\)\s*)?"
    r"(?:WITH\s*\((?P<opts>.*?)\)\s*)?"
    r"LIKE\s+(?P<src>\w+)\s*(?:\((?P<like>[^()]*)\))?\s*$",
    re.IGNORECASE | re.DOTALL,
)
_CREATE_VIEW_RE = re.compile(
    r"^\s*CREATE\s+(?:OR\s+REPLACE\s+)?(?:TEMPORARY\s+)?VIEW\s+"
    r"(?:IF\s+NOT\s+EXISTS\s+)?(\w+)\s+AS\s+(?P<query>.*)$",
    re.IGNORECASE | re.DOTALL,
)
_ALTER_RE = re.compile(
    r"^\s*ALTER\s+TABLE\s+(\w+)\s+(?:RENAME\s+TO\s+(\w+)|SET\s*\((.*)\))\s*$",
    re.IGNORECASE | re.DOTALL,
)
_DROP_RE = re.compile(
    r"^\s*DROP\s+(?:TEMPORARY\s+)?(?:TABLE|VIEW)\s+(?:IF\s+EXISTS\s+)?(\w+)\s*$",
    re.IGNORECASE,
)
_SHOW_DESCRIBE_RE = re.compile(
    r"^\s*(SHOW\s+TABLES|SHOW\s+VIEWS|SHOW\s+FUNCTIONS|DESCRIBE\s+\w+|DESC\s+\w+)\s*$",
    re.IGNORECASE,
)
_SET_RE = re.compile(r"^\s*SET\s+'([^']+)'\s*=\s*'([^']*)'\s*$", re.IGNORECASE)
# Flink TableConfig keys with a direct Spark session-conf counterpart;
# everything else is recorded in TableEnvironment._config for operators
# that read it (e.g. state TTL) and for SHOW-style introspection.
_CONFIG_MAP = {
    "table.exec.resource.default-parallelism": "spark.sql.shuffle.partitions",
    "table.optimizer.join.broadcast-threshold": "spark.sql.autoBroadcastJoinThreshold",
}

# Flink suffix aggregations for Table.select after group_by (Table API style).
_SUFFIX_AGGS = {"sum", "avg", "count", "min", "max", "stddev_pop", "stddev_samp"}
_SUFFIX_RE = re.compile(r"^(\w+)\.(" + "|".join(_SUFFIX_AGGS) + r")(?:\s+as\s+(\w+))?$", re.IGNORECASE)


# Flink SQL functions with no same-name Spark builtin, registered as
# SQL-defined functions (pure expressions — codegen'd, no Python). Flink
# semantics per BuiltInFunctionDefinitions.java / SqlFunctionUtils.
_FLINK_DIALECT_FUNCTIONS = [
    "CREATE OR REPLACE TEMPORARY FUNCTION SPLIT_INDEX(s STRING, sep STRING, i INT) "
    "RETURNS STRING RETURN try_element_at(split(s, sep), i + 1)",
    "CREATE OR REPLACE TEMPORARY FUNCTION IS_DECIMAL(s STRING) RETURNS BOOLEAN "
    r"RETURN s RLIKE '^[+-]?(\\d+(\\.\\d*)?|\\.\\d+)$'",
    "CREATE OR REPLACE TEMPORARY FUNCTION IS_DIGIT(s STRING) RETURNS BOOLEAN "
    r"RETURN s RLIKE '^\\d+$'",
    "CREATE OR REPLACE TEMPORARY FUNCTION IS_ALPHA(s STRING) RETURNS BOOLEAN "
    "RETURN s RLIKE '^[A-Za-z]+$'",
    "CREATE OR REPLACE TEMPORARY FUNCTION TRUNCATE_NUM(x DOUBLE, d INT) RETURNS DOUBLE "
    "RETURN CASE WHEN x >= 0 THEN floor(x * power(10, d)) ELSE ceil(x * power(10, d)) END "
    "/ power(10, d)",
    "CREATE OR REPLACE TEMPORARY FUNCTION HASH_CODE(s STRING) RETURNS INT RETURN hash(s)",
    "CREATE OR REPLACE TEMPORARY FUNCTION TO_BASE64(s STRING) RETURNS STRING "
    "RETURN base64(encode(s, 'UTF-8'))",
    "CREATE OR REPLACE TEMPORARY FUNCTION FROM_BASE64(s STRING) RETURNS STRING "
    "RETURN decode(unbase64(s), 'UTF-8')",
    "CREATE OR REPLACE TEMPORARY FUNCTION JSON_VALUE(j STRING, p STRING) RETURNS STRING "
    "RETURN get_json_object(j, p)",
    "CREATE OR REPLACE TEMPORARY FUNCTION JSON_EXISTS(j STRING, p STRING) RETURNS BOOLEAN "
    "RETURN get_json_object(j, p) IS NOT NULL",
    "CREATE OR REPLACE TEMPORARY FUNCTION RAND_INTEGER(n INT) RETURNS INT "
    "RETURN CAST(floor(rand() * n) AS INT)",
]


def register_flink_dialect(spark: SparkSession) -> None:
    """Register Flink-only SQL function names as Spark SQL-defined functions
    so Flink SQL text runs unchanged (§2.8 dialect gap closure)."""
    for ddl in _FLINK_DIALECT_FUNCTIONS:
        spark.sql(ddl)


class TableEnvironment:
    """In-memory catalog + SQL front door (GenericInMemoryCatalog.java:50)."""

    def __init__(self, spark: SparkSession | None = None,
                 legacy_cast: bool = False):
        """``legacy_cast``: Flink 1.14's CAST returns NULL on malformed
        input (legacy behavior, pre-FLIP-211); this engine runs Spark with
        ANSI mode ON (errors on bad casts — the stricter, safer default the
        whole oracle suite is written against). Migrating SQL that relies
        on null-on-error casts? Pass legacy_cast=True and every CAST( in
        SQL text rewrites to TRY_CAST( — exactly Flink 1.14 semantics,
        per the §2.8 casting mapping note in SURVEY."""
        self.spark = spark or get_spark()
        self._watermarks: dict[str, tuple[str, str]] = {}  # table -> (col, delay)
        self._sinks: dict[str, dict] = {}  # filesystem tables → write info
        self._config: dict[str, str] = {}  # SET 'k'='v' script options
        self._legacy_cast = legacy_cast
        self._temporal_fns: dict[str, object] = {}  # name → TemporalTableFunction
        self._ttf_views = 0
        self._ddl: dict[str, dict] = {}  # table → {cols, options} for LIKE
        register_flink_dialect(self.spark)

    @classmethod
    def create(cls, spark: SparkSession | None = None) -> "TableEnvironment":
        return cls(spark)

    # -- DDL / SQL ---------------------------------------------------------

    def execute_sql(self, sql: str) -> "Table | None":
        stripped = sql.strip().rstrip(";")
        m = _CREATE_LIKE_RE.match(stripped)
        if m:
            self._create_table_like(m.group("name"), m.group("cols") or "",
                                    m.group("opts") or "", m.group("src"),
                                    m.group("like") or "")
            return None
        m = _CREATE_PART_RE.match(stripped)
        if m:
            parts = [p.strip().strip("`") for p in m.group("parts").split(",")
                     if p.strip()]
            self._create_table(m.group(1), m.group("cols"), m.group("opts"),
                               partition_by=parts)
            return None
        m = _CREATE_RE.match(stripped)
        if m:
            self._create_table(m.group(1), m.group("cols"), m.group("opts"))
            return None
        m = _INSERT_RE.match(stripped)
        if m:
            static = None
            if m.group("static"):
                static = {sm.group(1): (sm.group(2) if sm.group(2) is not None
                                        else sm.group(3))
                          for sm in _STATIC_PART_RE.finditer(m.group("static"))}
            self._insert_into(m.group("tbl"),
                              self.sql_query(m.group("query")).to_data_frame(),
                              overwrite=m.group("mode").upper() == "OVERWRITE",
                              static_partition=static)
            return None
        m = _CREATE_VIEW_RE.match(stripped)
        if m:
            # reference TableEnvironment CREATE [TEMPORARY] VIEW — a named
            # query in the session catalog (CatalogViewImpl); here a Spark
            # temp view over the translated query's frame (lazy, re-planned
            # per use exactly like the reference's view expansion)
            self.sql_query(m.group("query")).to_data_frame() \
                .createOrReplaceTempView(m.group(1))
            return None
        m = re.match(r"^\s*SHOW\s+CREATE\s+TABLE\s+(\w+)\s*$", stripped,
                     re.IGNORECASE)
        if m:
            # reference SqlShowCreateTable → ShowCreateTableOperation:
            # reconstruct canonical DDL from the catalog registration
            name = m.group(1)
            ddl = self._ddl.get(name)
            if ddl is None:
                raise ValueError(f"SHOW CREATE TABLE: unknown table {name!r}")
            parts = (" PARTITIONED BY (" + ", ".join(ddl["partition_by"]) + ")"
                     if ddl.get("partition_by") else "")
            opts = ", ".join(f"'{k}' = '{v}'"
                             for k, v in sorted(ddl["options"].items()))
            text = (f"CREATE TABLE {name} (\n  "
                    + ",\n  ".join(i.strip() for i in
                                   _split_top_level_ddl(ddl["cols"]))
                    + f"\n){parts} WITH (\n  {opts}\n)")
            return Table(
                self.spark.createDataFrame([(text,)], "result string"), self)
        m = _ALTER_RE.match(stripped)
        if m:
            self._alter_table(m.group(1), rename_to=m.group(2),
                              set_opts=m.group(3))
            return None
        m = _DROP_RE.match(stripped)
        if m:
            self.spark.catalog.dropTempView(m.group(1))
            self._sinks.pop(m.group(1), None)
            self._watermarks.pop(m.group(1), None)
            self._ddl.pop(m.group(1), None)
            return None
        m = _SET_RE.match(stripped)
        if m:
            # Flink SQL-script `SET 'key' = 'value'` (TableConfig options):
            # recorded in _config; keys with a direct Spark counterpart are
            # applied to the session conf immediately
            key, value = m.group(1), m.group(2)
            self._config[key] = value
            spark_key = _CONFIG_MAP.get(key)
            if spark_key:
                self.spark.conf.set(spark_key, value)
            return None
        m = re.match(r"^\s*EXPLAIN\s+(?:PLAN\s+FOR\s+)?(?P<query>SELECT\b.*)$",
                     stripped, re.IGNORECASE | re.DOTALL)
        if m:
            # reference `EXPLAIN [PLAN FOR] <query>` — one-row report table
            report = self.sql_query(m.group("query")).explain()
            return Table(
                self.spark.createDataFrame([(report,)], "plan string"), self)
        if _SHOW_DESCRIBE_RE.match(stripped):
            # SHOW TABLES / SHOW VIEWS / SHOW FUNCTIONS / DESCRIBE t —
            # Spark's catalog commands return the same report shapes the
            # reference prints (TableEnvironment.executeSql passthrough)
            return Table(self.spark.sql(stripped), self)
        # Catalog navigation statements (reference TableEnvironmentImpl
        # executeSql SHOW/USE operations, 1.14 SQL-client surface). Column
        # names mirror Flink's result schemas.
        up = re.sub(r"\s+", " ", stripped).strip().upper()
        if up == "SHOW CURRENT CATALOG":
            return Table(self.spark.createDataFrame(
                [(self.spark.catalog.currentCatalog(),)],
                "`current catalog name` string"), self)
        if up == "SHOW CURRENT DATABASE":
            return Table(self.spark.createDataFrame(
                [(self.spark.catalog.currentDatabase(),)],
                "`current database name` string"), self)
        if up == "SHOW CATALOGS":
            return Table(self.spark.sql("SHOW CATALOGS")
                         .withColumnRenamed("catalog", "catalog name"), self)
        if up == "SHOW DATABASES":
            return Table(self.spark.sql("SHOW DATABASES")
                         .withColumnRenamed("namespace", "database name"), self)
        if up == "SHOW MODULES":
            # Spark has no module system — the loaded surface corresponds to
            # Flink's single default 'core' module.
            return Table(self.spark.createDataFrame(
                [("core",)], "`module name` string"), self)
        m = re.match(r"^\s*USE\s+(?:DATABASE\s+)?(\w+)\s*$", stripped,
                     re.IGNORECASE)
        if m and not stripped.upper().startswith("USE CATALOG"):
            self.spark.catalog.setCurrentDatabase(m.group(1))
            return None
        m = re.match(r"^\s*USE\s+CATALOG\s+(\w+)\s*$", stripped,
                     re.IGNORECASE)
        if m:
            self.spark.catalog.setCurrentCatalog(m.group(1))
            return None
        return self.sql_query(stripped)

    def explain_sql(self, sql: str) -> str:
        """Reference TableEnvironment.explainSql (TableEnvironmentImpl.
        java): the plan report for a query — parsed/analyzed/optimized
        logical plans + the physical plan, Catalyst's counterpart of
        Flink's AST/logical/physical explain sections."""
        return self.sql_query(sql).explain()

    def create_statement_set(self) -> "StatementSet":
        """Reference TableEnvironment.createStatementSet
        (flink-table-api-java .../TableEnvironment.java): batch several
        INSERT statements and submit together. Divergence (documented):
        Flink compiles one job DAG with shared source scans; here the
        statements execute sequentially — shared-scan reuse comes from
        Spark's own caching if the caller persists the common frame."""
        return StatementSet(self)

    def create_temporary_function(self, name: str, fn) -> None:
        """Reference TableEnvironment.createTemporarySystemFunction.
        TemporalTableFunction instances register for the SQL
        `LATERAL TABLE(name(ts))` rewrite; plain callables register as
        Spark UDFs (row-at-a-time — prefer pandas_udf for hot paths)."""
        from flink_release_1_14_5_comment_spark.operators.temporal_joins import (
            TemporalTableFunction,
        )

        if isinstance(fn, TemporalTableFunction):
            self._temporal_fns[name] = fn
        else:
            self.spark.udf.register(name, fn)

    # Flink 1.14's LATERAL TABLE(rates(o.ts)) comma-join form. The planner
    # rewrites it into a temporal join keyed on the function's primary key,
    # with the key equality taken from the WHERE conjuncts
    # (LogicalCorrelateToJoinFromTemporalTableRule.scala); same here.
    _LATERAL_TTF_RE = re.compile(
        r"FROM\s+(?P<probe>\w+)(?:\s+AS)?\s+(?P<pa>\w+)\s*,\s*"
        r"LATERAL\s+TABLE\s*\(\s*(?P<fn>\w+)\s*\(\s*(?P<arg>[\w.]+)\s*\)\s*\)"
        r"(?:\s+AS)?\s+(?P<ba>\w+)",
        re.IGNORECASE | re.DOTALL,
    )

    def _rewrite_lateral_ttf(self, sql: str) -> str:
        m = self._LATERAL_TTF_RE.search(sql)
        if not m or m.group("fn") not in self._temporal_fns:
            return sql
        from flink_release_1_14_5_comment_spark.operators.temporal_joins import (
            temporal_table_join,
        )

        fname, pa, ba = m.group("fn"), m.group("pa"), m.group("ba")
        fn_obj = self._temporal_fns[fname]
        wm = re.search(
            r"\bWHERE\b(?P<w>.*?)(?=\bGROUP\s+BY\b|\bORDER\s+BY\b|"
            r"\bHAVING\b|\bLIMIT\b|$)",
            sql, re.IGNORECASE | re.DOTALL)
        if not wm:
            raise ValueError(
                f"LATERAL TABLE({fname}(...)): the temporal table function "
                "join requires the primary-key equality in WHERE "
                f"({pa}.<key> = {ba}.{fn_obj.primary_key})")
        probe_key = None
        for conj in _split_conjuncts(wm.group("w")):
            m2 = re.match(r"^\s*(\w+)\.(\w+)\s*=\s*(\w+)\.(\w+)\s*$", conj)
            if not m2:
                continue
            a1, c1, a2, c2 = m2.groups()
            if a1 == ba and c1 == fn_obj.primary_key and a2 == pa:
                probe_key = c2
                break
            if a2 == ba and c2 == fn_obj.primary_key and a1 == pa:
                probe_key = c1
                break
        if probe_key is None:
            raise ValueError(
                f"LATERAL TABLE({fname}(...)): no WHERE conjunct equates "
                f"{ba}.{fn_obj.primary_key} with a {pa} column — Flink "
                "requires the primary-key equality for the temporal join")
        arg = m.group("arg")
        if "." in arg:
            aa, probe_ts = arg.split(".", 1)
            if aa != pa:
                raise ValueError(
                    f"LATERAL TABLE({fname}({arg})): the time argument must "
                    f"come from the probe table alias {pa!r}")
        else:
            probe_ts = arg
        joined = temporal_table_join(
            self.spark.table(m.group("probe")), fn_obj,
            probe_ts=probe_ts, probe_key=probe_key, how="inner")
        self._ttf_views += 1
        view = f"__ttf_{fname}_{self._ttf_views}"
        joined.createOrReplaceTempView(view)
        out = sql[:m.start()] + f"FROM {view}" + sql[m.end():]
        # both aliases now resolve against the single joined view; column
        # names are disjoint (enforced by temporal_table_join), so stripping
        # the qualifiers is unambiguous
        out = re.sub(rf"\b{pa}\.", "", out)
        out = re.sub(rf"\b{ba}\.", "", out)
        return out

    def sql_query(self, sql: str) -> "Table":
        stripped = sql.strip().rstrip(";")
        if "/*+" in stripped:
            stripped = self._apply_table_hints(stripped)
        if self._temporal_fns and re.search(r"\bLATERAL\s+TABLE\b",
                                            stripped, re.IGNORECASE):
            stripped = self._rewrite_lateral_ttf(stripped)
        if re.search(r"\bMATCH_RECOGNIZE\b", stripped, re.IGNORECASE):
            from flink_release_1_14_5_comment_spark.streaming.match_recognize import (
                match_recognize_sql,
                parse_match_recognize_sql,
            )

            tbl = parse_match_recognize_sql(stripped)["table"]
            return Table(
                match_recognize_sql(self.spark.table(tbl), stripped), self)
        out = translate_flink_sql(stripped)
        if self._legacy_cast:
            out = re.sub(r"(?<![A-Za-z_])(?<!TRY_)CAST\s*\(", "TRY_CAST(",
                         out, flags=re.IGNORECASE)
        return Table(self.spark.sql(out), self)

    def _apply_table_hints(self, sql: str) -> str:
        """FLIP-113 dynamic table options: ``FROM t /*+ OPTIONS('k'='v') */``
        (reference SqlHint → FlinkHints.HINT_NAME_OPTIONS; applied in
        CatalogSourceTable.createDynamicTableSource). Spark's SQL parser
        accepts hints only in the SELECT clause, so the relation-position
        hint is rewritten here: the hinted table re-registers under a
        one-off name with the merged options and the reference is swapped.
        Requires ``table.dynamic-table-options.enabled`` semantics — always
        on here, like the reference's default since 1.11."""
        keywords = {
            "WHERE", "GROUP", "ORDER", "HAVING", "LIMIT", "JOIN", "LEFT",
            "RIGHT", "FULL", "INNER", "CROSS", "ON", "UNION", "INTERSECT",
            "EXCEPT", "MATCH_RECOGNIZE", "LATERAL", "AND", "OR", "SELECT",
            "FOR", "TABLESAMPLE", "WINDOW", "QUALIFY",
        }
        pat = re.compile(
            r"\b(\w+)\s*/\*\+\s*OPTIONS\s*\(([^)]*)\)\s*\*/"
            r"(\s+AS\s+\w+|\s+\w+)?",
            re.IGNORECASE)

        def repl(m):
            tbl, optstr, trail = m.group(1), m.group(2), m.group(3) or ""
            ddl = self._ddl.get(tbl)
            if ddl is None:
                raise NotImplementedError(
                    f"OPTIONS hint on {tbl!r}: dynamic table options apply "
                    f"to tables created via CREATE TABLE DDL only")
            merged = {**ddl["options"], **dict(_OPT_RE.findall(optstr))}
            self._hint_views = getattr(self, "_hint_views", 0) + 1
            hname = f"__hinted_{tbl}_{self._hint_views}"
            opts_str = ", ".join(f"'{k}'='{v}'" for k, v in merged.items())
            self._create_table(hname, ddl["cols"], opts_str,
                               partition_by=ddl.get("partition_by") or [])
            trail_word = trail.strip()
            if trail_word and trail_word.split()[-1].upper() not in keywords:
                # user-supplied alias ([AS] a) — keep it
                alias = trail_word.split()[-1]
                return f"{hname} AS {alias}"
            # no alias: alias back to the original name so t.col refs resolve
            return f"{hname} AS {tbl}{trail}"

        return pat.sub(repl, sql)

    @staticmethod
    def _format_options(fmt: str, options: dict, side: str) -> dict:
        """flink-csv / flink-json WITH-options → Spark reader/writer options
        (reference CsvFormatFactory / JsonFormatFactory option sets). Only
        options with a faithful Spark equivalent map; unknown csv./json.
        options raise rather than silently changing the file contract."""
        known = {
            ("csv", "csv.field-delimiter"): ("sep", "both"),
            ("csv", "csv.quote-character"): ("quote", "both"),
            ("csv", "csv.escape-character"): ("escape", "both"),
            ("csv", "csv.null-literal"): ("nullValue", "both"),
            ("csv", "csv.allow-comments"): ("comment", "read"),
            ("csv", "csv.ignore-parse-errors"): ("mode", "read"),
            ("csv", "csv.include-header"): ("header", "both"),
            ("json", "json.ignore-parse-errors"): ("mode", "read"),
        }
        out = {}
        if fmt == "csv":
            out["header"] = options.get("csv.include-header", "true")
        for k, v in options.items():
            if not k.startswith(("csv.", "json.")):
                continue
            spec = known.get((fmt, k))
            if spec is None:
                raise NotImplementedError(
                    f"format option {k!r} has no Spark mapping")
            opt, sides = spec
            if sides != "both" and sides != side:
                continue
            if k.endswith("ignore-parse-errors"):
                out["mode"] = ("DROPMALFORMED"
                               if str(v).lower() == "true" else "FAILFAST")
            elif k == "csv.allow-comments":
                if str(v).lower() == "true":
                    out["comment"] = "#"
            else:
                out[opt] = v
        return out

    def _create_table(self, name: str, cols: str, opts: str,
                      partition_by: list[str] | None = None) -> None:
        options = dict(_OPT_RE.findall(opts))
        connector = options.get("connector", "")
        wm = None
        for clause in cols.split(","):
            if "WATERMARK" in clause.upper():
                # clauses may span the split; re-scan the whole cols string
                try:
                    wm = parse_watermark_ddl(cols)
                except ValueError:
                    wm = None
                break
        if connector == "filesystem":
            fmt = options.get("format", "parquet")
            path = options["path"]
            self._sinks[name] = {"path": path, "format": fmt,
                                 "options": options, "cols": cols,
                                 "partition_by": partition_by or []}
            import os as _os

            if _os.path.isfile(path) or (
                    _os.path.isdir(path) and _os.listdir(path)):
                reader = self.spark.read
                if fmt in ("csv", "json"):
                    reader = reader.options(
                        **self._format_options(fmt, options, "read"))
                    # Text formats carry no type information — the DECLARED
                    # schema drives the read, exactly Flink's model (the
                    # reference never infers; CsvRowDataDeserializationSchema
                    # is built from the DDL row type). Parquet/ORC embed
                    # their schema; inference there IS the file's own types.
                    reader = reader.schema(self._ddl_schema(cols))
                df = self._apply_generated_columns(getattr(reader, fmt)(path), cols)
            else:
                # SINK-table DDL (CREATE TABLE then INSERT INTO — the
                # standard Flink flow): nothing to scan yet, register an
                # empty view from the DECLARED schema so downstream DDL/
                # queries resolve; the first INSERT re-registers over data.
                # Generated columns are read-side (Flink: not insertable)
                # so the declared-schema view skips them.
                df = self.spark.createDataFrame([], self._ddl_schema(cols))
        elif connector in ("datagen", "values"):
            raise NotImplementedError(f"connector {connector!r}: use spark.createDataFrame + register_table")
        elif connector in ("kafka", "upsert-kafka"):
            # Translation via kafka_translate (contract-tested option maps;
            # no broker/jar in this environment, so load() may fail — that
            # failure is the data source's, not the translation's).
            from flink_release_1_14_5_comment_spark.streaming import kafka_translate

            stream = self.spark.readStream.format("kafka").options(
                **kafka_translate.source_options(options))
            df = stream.load()
        else:
            raise NotImplementedError(f"connector {connector!r} not supported")
        if wm:
            self._watermarks[name] = wm
        df.createOrReplaceTempView(name)
        self._ddl[name] = {"cols": cols, "options": options,
                           "partition_by": partition_by or []}

    def _alter_table(self, name: str, rename_to: str | None,
                     set_opts: str | None) -> None:
        """``ALTER TABLE t RENAME TO t2`` / ``ALTER TABLE t SET ('k'='v')``
        (reference SqlAlterTableRename / SqlAlterTableOptions →
        Catalog.renameTable / alterTable). RENAME moves the view and all
        catalog bookkeeping; SET merges options and re-registers the scan
        so path/format changes take effect immediately."""
        ddl = self._ddl.get(name)
        if ddl is None:
            raise ValueError(
                f"ALTER TABLE target {name!r} was not created via DDL in "
                f"this TableEnvironment")
        if rename_to:
            df = self.spark.table(name)
            df.createOrReplaceTempView(rename_to)
            self.spark.catalog.dropTempView(name)
            for registry in (self._ddl, self._sinks, self._watermarks):
                if name in registry:
                    registry[rename_to] = registry.pop(name)
            return
        new_opts = dict(_OPT_RE.findall(set_opts or ""))
        merged = {**ddl["options"], **new_opts}
        opts_str = ", ".join(f"'{k}'='{v}'" for k, v in merged.items())
        self._create_table(name, ddl["cols"], opts_str,
                           partition_by=ddl.get("partition_by") or [])

    def _create_table_like(self, name: str, cols: str, opts: str,
                           src: str, like_opts: str) -> None:
        """FLIP-110 ``CREATE TABLE … [(cols)] [WITH (...)] LIKE src (…)``.

        Schema, watermark, and options derive from the source table's DDL
        and merge with the new clauses under the reference's strategies
        (MergeTableLikeUtil.java): INCLUDING (default — duplicate
        definitions are an error), EXCLUDING (drop the inherited feature),
        OVERWRITING (new definition wins; valid for OPTIONS / WATERMARKS /
        GENERATED only, as in the reference parser SqlCreateTableLike)."""
        src_ddl = self._ddl.get(src)
        if src_ddl is None:
            raise ValueError(
                f"LIKE source table {src!r} unknown — it must have been "
                f"created via CREATE TABLE DDL in this TableEnvironment")
        strat = {k: "INCLUDING" for k in
                 ("OPTIONS", "WATERMARKS", "GENERATED", "CONSTRAINTS",
                  "PARTITIONS")}
        recognized = re.findall(
            r"(INCLUDING|EXCLUDING|OVERWRITING)\s+"
            r"(ALL|OPTIONS|WATERMARKS|GENERATED|CONSTRAINTS|PARTITIONS)",
            like_opts, re.IGNORECASE)
        leftover = re.sub(
            r"(INCLUDING|EXCLUDING|OVERWRITING)\s+"
            r"(ALL|OPTIONS|WATERMARKS|GENERATED|CONSTRAINTS|PARTITIONS)",
            "", like_opts, flags=re.IGNORECASE).strip(" ,\n\t")
        if leftover:
            raise ValueError(f"unsupported LIKE option(s): {leftover!r}")
        for verb, feat in ((v.upper(), f.upper()) for v, f in recognized):
            if feat == "ALL":
                if verb == "OVERWRITING":
                    raise ValueError("OVERWRITING ALL is not valid Flink syntax")
                strat = {k: verb for k in strat}
            else:
                if verb == "OVERWRITING" and feat in ("CONSTRAINTS", "PARTITIONS"):
                    raise ValueError(f"OVERWRITING {feat} is not valid Flink syntax")
                strat[feat] = verb

        def _is_wm(item: str) -> bool:
            return item.upper().startswith("WATERMARK")

        def _is_constraint(item: str) -> bool:
            up = item.upper()
            return up.startswith("PRIMARY KEY") or up.startswith("CONSTRAINT")

        def _is_generated(item: str) -> bool:
            return bool(_COMPUTED_COL_RE.match(item)) or bool(
                _METADATA_COL_RE.match(item))

        def _colname(item: str) -> str | None:
            if _is_wm(item) or _is_constraint(item):
                return None
            return item.split(None, 1)[0].strip("`").lower()

        src_items = [i.strip() for i in _split_top_level_ddl(src_ddl["cols"])
                     if i.strip()]
        inherited = [
            it for it in src_items
            if not (_is_wm(it) and strat["WATERMARKS"] == "EXCLUDING")
            and not (_is_constraint(it) and strat["CONSTRAINTS"] == "EXCLUDING")
            and not (_is_generated(it) and strat["GENERATED"] == "EXCLUDING")
        ]
        new_items = [i.strip() for i in _split_top_level_ddl(cols)
                     if i.strip()] if cols else []
        if any(_is_wm(i) for i in new_items) and any(_is_wm(i) for i in inherited):
            if strat["WATERMARKS"] == "OVERWRITING":
                inherited = [i for i in inherited if not _is_wm(i)]
            else:
                raise ValueError(
                    "there already exists a watermark spec in the LIKE "
                    "source; use OVERWRITING WATERMARKS or EXCLUDING "
                    "WATERMARKS (reference MergeTableLikeUtil)")
        inh_names = {_colname(i) for i in inherited} - {None}
        for item in new_items:
            n = _colname(item)
            if n in inh_names:
                if _is_generated(item) and strat["GENERATED"] == "OVERWRITING":
                    inherited = [x for x in inherited if _colname(x) != n]
                else:
                    raise ValueError(
                        f"column {n!r} already defined in LIKE source "
                        f"{src!r} (OVERWRITING GENERATED replaces computed "
                        f"columns only, per the reference)")
        merged_cols = ", ".join(inherited + new_items)

        src_opts = dict(src_ddl["options"]) if strat["OPTIONS"] != "EXCLUDING" else {}
        new_opts = dict(_OPT_RE.findall(opts))
        if strat["OPTIONS"] == "INCLUDING":
            clash = [k for k, v in new_opts.items()
                     if k in src_opts and src_opts[k] != v]
            if clash:
                raise ValueError(
                    f"option(s) {clash} already inherited with different "
                    f"values; use OVERWRITING OPTIONS or EXCLUDING OPTIONS")
        merged_opts = {**src_opts, **new_opts}
        if "connector" not in merged_opts:
            raise ValueError(
                "no 'connector' option after the LIKE merge — EXCLUDING "
                "OPTIONS requires a WITH clause declaring one")
        opts_str = ", ".join(f"'{k}'='{v}'" for k, v in merged_opts.items())
        inherited_parts = (src_ddl.get("partition_by") or []
                           if strat["PARTITIONS"] != "EXCLUDING" else [])
        self._create_table(name, merged_cols, opts_str,
                           partition_by=inherited_parts)

    def _apply_generated_columns(self, df: DataFrame, cols: str) -> DataFrame:
        """Computed columns (``total AS price * qty``, FLIP-70) and METADATA
        columns (``fp STRING METADATA FROM 'file.path'``,
        SupportsReadingMetadata) from CREATE TABLE DDL, applied to the
        scanned frame in declaration order. Flink's filesystem metadata
        keys map onto Spark's ``_metadata`` struct; ``PROCTIME()``
        translates to ``current_timestamp()`` (the proctime attribute).
        Reference: computed columns resolve in the planner
        (flink-table-planner DefaultSchemaResolver), metadata keys in
        the connector (FileSystemTableSource metadata support)."""
        from pyspark.sql import functions as F

        from flink_release_1_14_5_comment_spark.types_map import (
            flink_type_to_spark,
        )

        meta_keys = {
            "file.path": "file_path",
            "file.name": "file_name",
            "file.size": "file_size",
            "file.modification-time": "file_modification_time",
        }
        for item in _split_top_level_ddl(cols):
            text = item.strip()
            up = text.upper()
            if (up.startswith("WATERMARK") or up.startswith("PRIMARY KEY")
                    or up.startswith("CONSTRAINT")):
                continue
            mm = _METADATA_COL_RE.match(text)
            if mm:
                name, ftype, key = mm.group(1), mm.group(2), mm.group(3)
                skey = meta_keys.get((key or name).lower())
                if skey is None:
                    raise NotImplementedError(
                        f"metadata key {key or name!r}: filesystem connector "
                        f"supports {sorted(meta_keys)}")
                df = df.withColumn(
                    name, F.col(f"_metadata.{skey}")
                    .cast(flink_type_to_spark(ftype)))
                continue
            cm = _COMPUTED_COL_RE.match(text)
            if cm:
                name, expr = cm.group(1), cm.group(2).strip()
                expr = re.sub(r"\bPROCTIME\s*\(\s*\)", "current_timestamp()",
                              expr, flags=re.IGNORECASE)
                df = df.withColumn(name, F.expr(expr))
        return df

    def _ddl_schema(self, cols: str):
        """DECLARED physical columns → StructType (skips WATERMARK /
        PRIMARY KEY / computed `AS` columns)."""
        from pyspark.sql import types as T

        from flink_release_1_14_5_comment_spark.types_map import (
            flink_type_to_spark,
        )

        fields = []
        for item in _split_top_level_ddl(cols):
            up = item.upper().strip()
            if (up.startswith("WATERMARK") or up.startswith("PRIMARY KEY")
                    or up.startswith("CONSTRAINT") or " AS " in f" {up} "
                    or " METADATA" in f"{up} "):
                continue
            parts = item.strip().split(None, 1)
            if len(parts) != 2:
                continue
            fname, ftype = parts
            ftype = re.sub(r"\s+NOT\s+NULL\s*$", "", ftype, flags=re.IGNORECASE)
            fields.append(T.StructField(fname.strip("`"),
                                        flink_type_to_spark(ftype.strip()), True))
        return T.StructType(fields)

    def _insert_into(self, name: str, df: DataFrame, overwrite: bool = False,
                     static_partition: dict[str, str] | None = None) -> None:
        """INSERT INTO/OVERWRITE a filesystem table (reference FileSink /
        CommonExecSink): task-committed write through the Spark committer
        (cluster-safe), then the temp view re-registers over the files.

        Partitioned tables (``PARTITIONED BY`` DDL) write the Hive-style
        directory layout; ``INSERT ... PARTITION (k='v')`` static specs
        (reference SqlPartitionUtils / FileSystemTableSink static
        partitions) inject the literal columns, and INSERT OVERWRITE on a
        partitioned table replaces only the touched partitions (dynamic
        partition-overwrite — Flink's filesystem-sink overwrite grain)."""
        sink = self._sinks.get(name)
        if sink is None:
            raise ValueError(
                f"INSERT target {name!r} is not a filesystem table created "
                "via CREATE TABLE ... WITH ('connector'='filesystem', ...)")
        part_cols = sink.get("partition_by") or []
        static = static_partition or {}
        if static and not part_cols:
            raise ValueError(
                f"INSERT ... PARTITION on {name!r}, but the table has no "
                f"PARTITIONED BY clause")
        unknown = [k for k in static if k not in part_cols]
        if unknown:
            raise ValueError(
                f"static partition column(s) {unknown} not in PARTITIONED "
                f"BY {part_cols} of {name!r}")
        # Flink maps INSERT columns to the DECLARED sink schema by position
        # (reference DynamicSinkUtils#validateSchemaAndApplyImplicitCast);
        # rename positionally so the written files — and the re-registered
        # view — carry the CREATE TABLE names, not the SELECT's (or the
        # col1/col2 an INSERT ... VALUES produces). With a static PARTITION
        # spec the query supplies only the remaining columns (in declared
        # order) and the literals fill the rest, as in the reference.
        schema = self._ddl_schema(sink["cols"])
        declared = [f.name for f in schema.fields]
        if declared:
            expected = [c for c in declared if c not in static]
            if len(df.columns) != len(expected):
                raise ValueError(
                    f"INSERT into {name!r}: query produces {len(df.columns)} "
                    f"columns but the table declares {len(declared)}"
                    + (f" ({len(static)} filled by the static PARTITION "
                       f"spec)" if static else ""))
            df = df.toDF(*expected)
            types = {f.name: f.dataType for f in schema.fields}
            for k, v in static.items():
                df = df.withColumn(k, F.lit(v).cast(types[k]))
            df = df.select(*declared)
        writer = df.write.mode("overwrite" if overwrite else "append")
        if part_cols:
            writer = writer.partitionBy(*part_cols)
            if overwrite:
                # Flink's filesystem sink overwrites at partition grain for
                # partitioned inserts; Spark's default would drop the whole
                # table directory.
                writer = writer.option("partitionOverwriteMode", "dynamic")
        if sink["format"] in ("csv", "json"):
            writer = writer.options(**self._format_options(
                sink["format"], sink["options"], "write"))
        getattr(writer, sink["format"])(sink["path"])
        reader = self.spark.read
        if sink["format"] in ("csv", "json"):
            reader = reader.options(**self._format_options(
                sink["format"], sink["options"], "read"))
        if sink["format"] in ("csv", "json") and declared and not part_cols:
            # Text formats re-read through the DECLARED schema (same fix as
            # the CREATE TABLE scan path); the partitioned branch below
            # cast-backs instead, because partition values live in directory
            # names that Spark's discovery must map first.
            reader = reader.schema(schema)
        out = getattr(reader, sink["format"])(sink["path"])
        if part_cols and declared:
            # Spark's partition discovery infers directory values (dt=
            # 2024-01-01 → DATE); Flink's filesystem source keeps the
            # DECLARED type. Cast back and restore declared column order
            # (Spark appends partition columns last on read).
            types = {f.name: f.dataType for f in schema.fields}
            out = out.select(*[F.col(c).cast(types[c]).alias(c)
                               for c in declared])
        out.createOrReplaceTempView(name)

    # -- catalog -----------------------------------------------------------

    def register_table(self, name: str, df: DataFrame,
                       rowtime: tuple[str, str] | None = None) -> None:
        df.createOrReplaceTempView(name)
        if rowtime:
            self._watermarks[name] = rowtime

    def from_path(self, name: str) -> "Table":
        return Table(self.spark.table(name), self)

    def from_data_frame(self, df: DataFrame) -> "Table":
        """Wrap an existing DataFrame as a Table (the batch counterpart of
        StreamTableEnvironment.fromDataStream)."""
        return Table(df, self)

    def from_values(self, rows, schema: str | None = None) -> "Table":
        """Reference TableEnvironment.fromValues (TableEnvironmentImpl
        .java fromValues overloads): inline rows → Table. With no schema,
        column names default to f0, f1, … exactly as the reference derives
        them for untyped values."""
        if schema is None:
            first = rows[0]
            width = len(first) if isinstance(first, (tuple, list)) else 1
            if width == 1 and not isinstance(first, (tuple, list)):
                rows = [(r,) for r in rows]
            names = [f"f{i}" for i in range(width)]
            return Table(self.spark.createDataFrame(rows).toDF(*names), self)
        return Table(self.spark.createDataFrame(rows, schema), self)

    def list_tables(self) -> list[str]:
        """Reference TableEnvironment.listTables — names of every table and
        view visible in the session catalog."""
        return sorted(t.name for t in self.spark.catalog.listTables())

    def rowtime_of(self, name: str) -> tuple[str, str] | None:
        return self._watermarks.get(name)

    # -- Table <-> DataStream changelog bridge (reference
    # StreamTableEnvironment.fromChangelogStream / toChangelogStream /
    # toRetractStream, StreamTableEnvironmentImpl.java) -------------------

    def from_changelog_stream(self, df: DataFrame, primary_keys: list[str],
                              seq_col: str) -> "Table":
        """Changelog frame (``__rowkind`` ∈ +I/-U/+U/-D — the convention of
        streaming/changelog.py and cdc_formats.py) → Table holding the
        CURRENT state: per-key last-writer-wins with -D removal, i.e.
        ChangelogNormalize keyed on the primary key — exactly what the
        reference's planner inserts when a changelog stream becomes a
        table. ``seq_col`` is the arrival order (Flink sees single-record
        order; a DataFrame needs it made explicit)."""
        from flink_release_1_14_5_comment_spark.streaming.changelog import (
            changelog_normalize,
        )

        normalized = changelog_normalize(df, primary_keys, seq_col)
        drop = [c for c in ("__rowkind", seq_col) if c in normalized.columns]
        return Table(normalized.drop(*drop), self)

    def to_changelog_stream(self, table: "Table") -> DataFrame:
        """Table → changelog frame. A table that already carries
        ``__rowkind`` (produced by a retracting operator) passes through;
        an insert-only table is tagged +I on every row (the reference
        emits RowKind.INSERT for append tables)."""
        df = table.to_data_frame()
        if "__rowkind" in df.columns:
            return df
        return df.select(F.lit("+I").alias("__rowkind"), "*")

    def to_retract_stream(self, table: "Table") -> DataFrame:
        """Table → retract stream: the reference's (boolean, row) pairs —
        ``retract`` is True for -U/-D (accumulate=False) and False for
        +I/+U, the exact Tuple2<Boolean, Row> mapping of
        StreamTableEnvironment.toRetractStream."""
        cl = self.to_changelog_stream(table)
        return cl.select(
            F.col("__rowkind").isin("-U", "-D").alias("retract"),
            *[c for c in cl.columns if c != "__rowkind"],
        )


def _flink_interval(s: str) -> str:
    """Flink expression-string intervals ("10.minutes", "1.hour") →
    Spark duration strings ("10 minutes"); plain Spark strings pass."""
    m = re.match(r"^\s*(\d+)[.\s]+(\w+)\s*$", s)
    if not m:
        raise ValueError(f"unsupported interval {s!r}")
    return f"{m.group(1)} {m.group(2)}"


class GroupWindow:
    """Resolved Tumble/Slide/Session spec (reference GroupWindow.java)."""

    def __init__(self, kind: str, size: str | None = None,
                 slide: str | None = None, gap: str | None = None):
        self.kind = kind
        self.size = size
        self.slide = slide
        self.gap = gap
        self.time_col: str | None = None
        self.name: str | None = None

    def on(self, time_col: str) -> "GroupWindow":
        self.time_col = time_col
        return self

    def alias(self, name: str) -> "GroupWindow":
        self.name = name
        return self


class Tumble:
    """Tumble.over("10.minutes").on("ts").alias("w") — Tumble.java:55."""

    @staticmethod
    def over(size: str) -> GroupWindow:
        return GroupWindow("tumble", size=_flink_interval(size))


class Slide:
    """Slide.over("10.minutes").every("5.minutes").on("ts").alias("w") —
    Slide.java. Flink order: over = window size, every = slide."""

    @staticmethod
    def over(size: str) -> "Slide":
        s = Slide()
        s._size = _flink_interval(size)
        return s

    def every(self, slide: str) -> GroupWindow:
        return GroupWindow("slide", size=self._size,
                           slide=_flink_interval(slide))


class Session:
    """Session.with_gap("30.minutes").on("ts").alias("w") — Session.java."""

    @staticmethod
    def with_gap(gap: str) -> GroupWindow:
        return GroupWindow("session", gap=_flink_interval(gap))


class WindowGroupedTable:
    """group_by("w, key") on a group-windowed table
    (WindowGroupedTable.java): select supports keys, suffix aggs and the
    window accessors w.start / w.end / w.rowtime (end − 1 ms)."""

    def __init__(self, df: DataFrame, window: GroupWindow, keys: list[str],
                 env: TableEnvironment):
        self._df = df
        self._window = window
        self._keys = keys
        self._env = env

    def _window_col(self):
        w = self._window
        if w.time_col is None:
            raise ValueError("group window needs .on(<time column>)")
        if w.kind == "tumble":
            return F.window(w.time_col, w.size)
        if w.kind == "slide":
            return F.window(w.time_col, w.size, w.slide)
        return F.session_window(w.time_col, w.gap)

    def select(self, exprs: str) -> "Table":
        wname = self._window.name or "w"
        out_cols, aggs = [], []
        for item in _split_top_level(exprs):
            text = item.strip()
            acc = re.match(
                rf"^{wname}\.(start|end|rowtime)(?:\s+AS\s+(\w+))?$",
                text, re.IGNORECASE)
            if acc:
                field, alias = acc.group(1).lower(), acc.group(2)
                col = (F.col("__w.end") - F.expr("INTERVAL 1 MILLISECOND")
                       if field == "rowtime" else F.col(f"__w.{field}"))
                out_cols.append(col.alias(alias or f"{wname}_{field}"))
                continue
            m = _SUFFIX_RE.match(text)
            if m:
                col, fn, alias = m.groups()
                name = alias or f"{fn.lower()}_{col}"
                agg = getattr(F, "count" if fn.lower() == "count" else fn.lower())(col)
                aggs.append(agg.alias(name))
                out_cols.append(F.col(name))
            elif text in self._keys:
                out_cols.append(F.col(text))
            elif text == wname:
                continue  # bare window reference: keys only
            else:
                raise ValueError(
                    f"window-grouped select item {item!r}: expected a group "
                    f"key, <col>.<agg>, or {wname}.start/end/rowtime")
        if not aggs:
            aggs = [F.count(F.lit(1)).alias("__n")]
        grouped = self._df.groupBy(self._window_col().alias("__w"),
                                   *self._keys)
        return Table(grouped.agg(*aggs).select(*out_cols), self._env)


class GroupWindowedTable:
    """table.window(Tumble/Slide/Session ... .alias("w")) —
    GroupWindowedTable.java; group_by must reference the window alias
    (Flink's contract), remaining names are the data keys."""

    def __init__(self, df: DataFrame, window: GroupWindow,
                 env: TableEnvironment):
        self._df = df
        self._window = window
        self._env = env

    def group_by(self, keys: str) -> WindowGroupedTable:
        names = [k.strip() for k in keys.split(",") if k.strip()]
        wname = self._window.name or "w"
        if wname not in names:
            raise ValueError(
                f"group_by on a windowed table must include the window "
                f"alias {wname!r} (Flink GroupWindowedTable contract)")
        return WindowGroupedTable(
            self._df, self._window, [k for k in names if k != wname],
            self._env)


class OverWindow:
    """Built by the Over fluent API; holds partition/order/frame spec."""

    def __init__(self):
        self.partition: list[str] = []
        self.order: str | None = None
        self.prec: object = "UNBOUNDED_RANGE"
        self.foll: object = "CURRENT_RANGE"
        self.name: str | None = None


class Over:
    """Reference Over.java fluent builder:
    Over.partition_by("a").order_by("ts").preceding(10).alias("w");
    preceding/following accept an int (ROW count), "UNBOUNDED_ROW",
    "UNBOUNDED_RANGE", "CURRENT_ROW" or "CURRENT_RANGE". Time-interval
    ranges ride the SQL path / streaming over_agg operators."""

    @staticmethod
    def partition_by(cols: str) -> "Over":
        o = Over()
        o._w = OverWindow()
        o._w.partition = [c.strip() for c in cols.split(",") if c.strip()]
        return o

    @staticmethod
    def order_by_only(col: str) -> "Over":
        o = Over()
        o._w = OverWindow()
        o._w.order = col.strip()
        return o

    def order_by(self, col: str) -> "Over":
        self._w.order = col.strip()
        return self

    def preceding(self, bound) -> "Over":
        self._w.prec = bound
        return self

    def following(self, bound) -> "Over":
        self._w.foll = bound
        return self

    def alias(self, name: str) -> OverWindow:
        self._w.name = name
        return self._w


def _over_bound(bound, is_preceding: bool) -> int:
    from pyspark.sql import Window as W

    if isinstance(bound, int):
        return -bound if is_preceding else bound
    b = str(bound).upper()
    if b in ("UNBOUNDED_RANGE", "UNBOUNDED_ROW"):
        return W.unboundedPreceding if is_preceding else W.unboundedFollowing
    if b in ("CURRENT_ROW", "CURRENT_RANGE"):
        return W.currentRow
    raise NotImplementedError(
        f"over-window bound {bound!r}: use int row counts, UNBOUNDED_ROW/"
        "UNBOUNDED_RANGE or CURRENT_ROW/CURRENT_RANGE (time-interval "
        "ranges: SQL path or streaming.over_agg)")


_OVER_ITEM_RE = re.compile(
    r"^(\w+)\.(\w+)\s+over\s+(\w+)(?:\s+as\s+(\w+))?$", re.IGNORECASE)


class OverWindowedTable:
    """table.window(Over...alias("w")).select("a, b.sum over w AS s") —
    reference OverWindowedTable.java. RANGE bounds use Spark's default
    ties-respecting frame; ROW bounds map to rowsBetween — the same split
    as the reference's RANGE/ROWS over-agg operators."""

    def __init__(self, df: DataFrame, over: OverWindow, env: TableEnvironment):
        self._df = df
        self._over = over
        self._env = env

    def _spec(self):
        from pyspark.sql import Window as W

        w = self._over
        spec = W.partitionBy(*w.partition) if w.partition else W.partitionBy()
        if w.order:
            spec = spec.orderBy(w.order)
        range_mode = any(
            isinstance(b, str) and b.upper().endswith("_RANGE")
            for b in (w.prec, w.foll))
        lo, hi = _over_bound(w.prec, True), _over_bound(w.foll, False)
        if range_mode and not isinstance(w.prec, int) and not isinstance(w.foll, int):
            return spec.rangeBetween(lo, hi)
        return spec.rowsBetween(lo, hi)

    def select(self, exprs: str) -> "Table":
        spec = self._spec()
        cols = []
        for item in _split_top_level(exprs):
            m = _OVER_ITEM_RE.match(item.strip())
            if m:
                col, fn, wname, alias = m.groups()
                if wname != (self._over.name or wname):
                    raise ValueError(f"unknown over window {wname!r}")
                cols.append(getattr(F, fn.lower())(col).over(spec)
                            .alias(alias or f"{fn.lower()}_{col}"))
            else:
                cols.append(F.expr(item))
        return Table(self._df.select(*cols), self._env)


class GroupedTable:
    def __init__(self, df: DataFrame, keys: list[str], env: TableEnvironment):
        self._df = df
        self._keys = keys
        self._env = env

    def aggregate(self, fn, schema: str) -> "Table":
        """GroupedTable.aggregate / flatAggregate (reference
        Table.java:1110-1154, GroupTableAggFunction): ``fn`` is a callable
        pandas.DataFrame -> pandas.DataFrame run once per group via
        applyInPandas (Arrow-batched); emit 1 row (AggregateFunction) or
        many (TableAggregateFunction e.g. top-2)."""
        return Table(
            self._df.groupBy(*self._keys).applyInPandas(
                lambda pdf: fn(pdf), schema), self._env)

    flat_aggregate = aggregate

    def select(self, exprs: str) -> "Table":
        """Flink style: "key, value.sum AS total" after group_by."""
        keys, aggs = [], []
        for item in _split_top_level(exprs):
            m = _SUFFIX_RE.match(item.strip())
            if m:
                col, fn, alias = m.groups()
                agg = getattr(F, "count" if fn.lower() == "count" else fn.lower())(col)
                aggs.append(agg.alias(alias or f"{fn.lower()}_{col}"))
            elif item.strip() in self._keys:
                keys.append(item.strip())
            else:
                aggs.append(F.expr(item))
        return Table(self._df.groupBy(*self._keys).agg(*aggs), self._env)


class Table:
    """Flink Table facade over a DataFrame (Table.java surface subset)."""

    def __init__(self, df: DataFrame, env: TableEnvironment):
        self._df = df
        self._env = env

    # relational ops (Table.java:128 select, :234 where, :297 group_by, :343 join)
    def select(self, exprs: str) -> "Table":
        return Table(self._df.selectExpr(*_split_top_level(exprs)), self._env)

    def where(self, predicate: str) -> "Table":
        return Table(self._df.filter(predicate), self._env)

    filter = where

    def group_by(self, keys: str) -> GroupedTable:
        return GroupedTable(self._df, [k.strip() for k in keys.split(",")], self._env)

    def create_temporal_table_function(self, time_attr: str,
                                       primary_key: str):
        """Reference Table.createTemporalTableFunction (Table.java) —
        wraps this table's version history for `LATERAL TABLE(f(ts))`
        temporal joins; register via
        TableEnvironment.create_temporary_function."""
        from flink_release_1_14_5_comment_spark.operators.temporal_joins import (
            TemporalTableFunction,
        )

        return TemporalTableFunction(self._df, time_attr, primary_key)

    def join(self, other: "Table", on: str, how: str = "inner") -> "Table":
        return Table(self._df.join(other._df, F.expr(on), how), self._env)

    def left_outer_join(self, other: "Table", on: str) -> "Table":
        return self.join(other, on, "left")

    def union_all(self, other: "Table") -> "Table":
        return Table(self._df.unionByName(other._df), self._env)

    def minus(self, other: "Table") -> "Table":
        # Flink Table.minus has distinct-set semantics (duplicates removed);
        # bag difference is minus_all (Table.java minus/minusAll contract).
        return Table(self._df.subtract(other._df), self._env)

    def minus_all(self, other: "Table") -> "Table":
        return Table(self._df.exceptAll(other._df), self._env)

    def intersect(self, other: "Table") -> "Table":
        return Table(self._df.intersect(other._df), self._env)

    def intersect_all(self, other: "Table") -> "Table":
        return Table(self._df.intersectAll(other._df), self._env)

    def distinct(self) -> "Table":
        return Table(self._df.distinct(), self._env)

    def order_by(self, exprs: str) -> "Table":
        return Table(self._df.orderBy(*[F.expr(e) for e in _split_top_level(exprs)]), self._env)

    def fetch(self, n: int) -> "Table":
        return Table(self._df.limit(n), self._env)

    limit = fetch

    def offset(self, n: int) -> "Table":
        """Table.offset (reference Table.java offset/fetch pair — only
        meaningful after order_by, same caveat as the reference)."""
        return Table(self._df.offset(n), self._env)

    def get_schema(self):
        """Reference Table.getSchema/getResolvedSchema → the Spark schema
        (StructType plays ResolvedSchema's role here)."""
        return self._df.schema

    def print_schema(self) -> None:
        self._df.printSchema()

    # -- schema operations (reference Table.java:462-519) ------------------

    def add_columns(self, exprs: str) -> "Table":
        """Table.addColumns — appends fields; throws if a name already
        exists (use add_or_replace_columns to overwrite)."""
        out = self._df.select("*", *[F.expr(e) for e in _split_top_level(exprs)])
        dupes = {c for c in out.columns if out.columns.count(c) > 1}
        if dupes:
            raise ValueError(
                f"add_columns: field(s) {sorted(dupes)} already exist "
                "(Table.addColumns throws on duplicates; use "
                "add_or_replace_columns)")
        return Table(out, self._env)

    def add_or_replace_columns(self, exprs: str) -> "Table":
        """Table.addOrReplaceColumns — existing fields of the same name are
        replaced in place, new fields appended."""
        df = self._df
        for e in _split_top_level(exprs):
            m = re.match(r"^(.*?)\s+AS\s+(\w+)\s*$", e, re.IGNORECASE | re.DOTALL)
            if m:
                df = df.withColumn(m.group(2), F.expr(m.group(1)))
            else:
                df = df.select("*", F.expr(e))
        return Table(df, self._env)

    def rename_columns(self, exprs: str) -> "Table":
        """Table.renameColumns("a AS a1, b AS b1")."""
        df = self._df
        for e in _split_top_level(exprs):
            m = re.match(r"^\s*(\w+)\s+AS\s+(\w+)\s*$", e, re.IGNORECASE)
            if not m:
                raise ValueError(
                    f"rename_columns expects 'old AS new' items, got {e!r}")
            if m.group(1) not in df.columns:
                raise ValueError(f"rename_columns: no field {m.group(1)!r}")
            df = df.withColumnRenamed(m.group(1), m.group(2))
        return Table(df, self._env)

    def drop_columns(self, cols: str) -> "Table":
        """Table.dropColumns("a, b")."""
        names = [c.strip() for c in cols.split(",") if c.strip()]
        missing = [c for c in names if c not in self._df.columns]
        if missing:
            raise ValueError(f"drop_columns: no field(s) {missing}")
        return Table(self._df.drop(*names), self._env)

    # -- row-level map/flatMap (reference Table.java:1056-1106) ------------

    def map(self, fn, schema: str | None = None) -> "Table":
        """Table.map — one output row per input row. ``fn`` is either an
        expression list string (codegen'd select — the fast path; the
        reference's ScalarFunction row-mapping collapses to a projection)
        or a callable pandas.DataFrame -> pandas.DataFrame applied via
        mapInPandas (Arrow-batched; `schema` DDL required)."""
        if isinstance(fn, str):
            return Table(
                self._df.select(*[F.expr(e) for e in _split_top_level(fn)]),
                self._env)
        if schema is None:
            raise ValueError("Table.map(callable) requires an output schema")
        return Table(
            self._df.mapInPandas(lambda it: (fn(b) for b in it), schema),
            self._env)

    def flat_map(self, fn, schema: str | None = None) -> "Table":
        """Table.flatMap — 0..n output rows per input row (TableFunction).
        Callable pandas.DataFrame -> pandas.DataFrame (any row count) over
        mapInPandas; Arrow-batched like the reference's Python UDTF bridge,
        minus the Beam hop."""
        if schema is None:
            raise ValueError("Table.flat_map requires an output schema")
        return Table(
            self._df.mapInPandas(lambda it: (fn(b) for b in it), schema),
            self._env)

    def aggregate(self, fn, schema: str) -> "Table":
        """Table.aggregate without groupBy — global aggregate: one output
        row (AggregateFunction over the whole table)."""
        return Table(
            self._df.groupBy(F.lit(1).alias("__g"))
            .applyInPandas(lambda pdf: fn(pdf.drop(columns="__g", errors="ignore")), schema),
            self._env)

    flat_aggregate = aggregate  # multi-row emit is the only difference;
    # applyInPandas already permits any output row count (TableAggregate)

    # -- Table-API windows (reference Table.java:975 window(Over…) and
    # :930 window(GroupWindow…)) ------------------------------------------

    def window(self, w) -> "OverWindowedTable | GroupWindowedTable":
        if isinstance(w, GroupWindow):
            return GroupWindowedTable(self._df, w, self._env)
        return OverWindowedTable(self._df, w, self._env)

    # execution (Table.execute().collect() in the reference)
    def to_data_frame(self) -> DataFrame:
        return self._df

    def execute(self) -> DataFrame:
        return self._df

    def to_pandas(self):
        return self._df.toPandas()

    def explain(self) -> str:
        """Reference Table.explain() — returns the full plan report
        (parsed → analyzed → optimized → physical) as a string, the
        Catalyst counterpart of Flink's AST/logical/physical sections."""
        return self._df._jdf.queryExecution().toString()


def _split_top_level(s: str) -> list[str]:
    """Split a comma-separated expression list, ignoring commas in parens."""
    out, depth, cur = [], 0, []
    for ch in s:
        if ch == "," and depth == 0:
            out.append("".join(cur).strip())
            cur = []
        else:
            depth += ch in "(["
            depth -= ch in ")]"
            cur.append(ch)
    if cur:
        out.append("".join(cur).strip())
    return [x for x in out if x]


def _split_conjuncts(s: str) -> list[str]:
    """Split a WHERE clause on top-level ANDs (parens respected)."""
    out, depth, cur, i = [], 0, [], 0
    upper = s.upper()
    while i < len(s):
        ch = s[i]
        if ch in "([":
            depth += 1
        elif ch in ")]":
            depth -= 1
        if depth == 0 and upper[i:i + 5] == " AND ":
            out.append("".join(cur).strip())
            cur = []
            i += 5
            continue
        cur.append(ch)
        i += 1
    if cur:
        out.append("".join(cur).strip())
    return [x for x in out if x]


_ANGLE_TYPES = {"ARRAY", "MAP", "STRUCT", "ROW", "MULTISET"}


def _split_top_level_ddl(s: str) -> list[str]:
    """DDL column-list splitter: like _split_top_level, but additionally
    angle-bracket-aware so parameterized types (MAP<STRING, INT>,
    ARRAY<STRUCT<a: INT, b: STRING>>) don't mis-split. `<` opens a type
    argument list only when it follows a composite-type keyword, so
    comparison operators in computed-column expressions (`x AS a < b`)
    stay untouched."""
    out, depth, angle, cur = [], 0, 0, []
    for ch in s:
        if ch == "," and depth == 0 and angle == 0:
            out.append("".join(cur).strip())
            cur = []
            continue
        if ch in "([":
            depth += 1
        elif ch in ")]":
            depth -= 1
        elif ch == "<":
            tail = "".join(cur).rstrip()
            word = re.split(r"[^A-Za-z_]", tail)[-1].upper() if tail else ""
            if angle > 0 or word in _ANGLE_TYPES:
                angle += 1
        elif ch == ">" and angle > 0:
            angle -= 1
        cur.append(ch)
    if cur:
        out.append("".join(cur).strip())
    return [x for x in out if x]


class StatementSet:
    """Batched INSERT execution (reference StatementSetImpl,
    flink-table-api-java .../internal/StatementSetImpl.java): collect
    INSERT statements, submit together with .execute(). Statements run
    sequentially here (Flink merges them into one DAG with shared scans —
    persist() the shared frame for the same effect in Spark)."""

    def __init__(self, env: TableEnvironment):
        self._env = env
        self._stmts: list[tuple[str, object, bool]] = []

    def add_insert_sql(self, sql: str) -> "StatementSet":
        m = _INSERT_RE.match(sql.strip().rstrip(";"))
        if not m:
            raise ValueError(f"not an INSERT statement: {sql!r}")
        static = None
        if m.group("static"):
            static = {sm.group(1): (sm.group(2) if sm.group(2) is not None
                                    else sm.group(3))
                      for sm in _STATIC_PART_RE.finditer(m.group("static"))}
        self._stmts.append((m.group("tbl"), m.group("query"),
                            m.group("mode").upper() == "OVERWRITE", static))
        return self

    def add_insert(self, target: str, table: "Table",
                   overwrite: bool = False) -> "StatementSet":
        self._stmts.append((target, table, overwrite, None))
        return self

    def execute(self) -> list[str]:
        """Run every buffered INSERT; returns the target table names in
        execution order (the reference returns a TableResult per job)."""
        done = []
        for target, src, overwrite, static in self._stmts:
            df = (src.to_data_frame() if isinstance(src, Table)
                  else self._env.sql_query(src).to_data_frame())
            self._env._insert_into(target, df, overwrite=overwrite,
                                   static_partition=static)
            done.append(target)
        self._stmts.clear()
        return done
