"""SQL-over-DataFrames querying + SQL text helpers.

Reference parity (common.py):
- ``sqlQueryDataFrame`` (172-205) → :func:`sql_over`: register N DataFrames
  as temp views, run one SQL string. The reference's timing instrumentation
  measured lazy plan construction (SURVEY.md §8 #5); here timing is opt-in
  and measures a real action.
- ``getSQL`` (359-367) → :func:`build_select_sql` (distinct via GROUP BY all
  selected cols, exactly as the reference emits it).
- ``escapeName`` (129-138) → :func:`escape_name`.
- ``getTempTableName`` (146-164) → :func:`temp_table_name`.
- ``cleanString`` (124-127) → :func:`clean_string` (+ column form).
- ``firstCharIsNumeric`` (142-143) → :func:`first_char_is_numeric`
  (returns a real bool; reference returned falsy non-bool on empty input,
  SURVEY.md §8 #12).

Scale: temp-view registration is catalog-only (no data movement); the SQL
goes straight to Catalyst so pushdown/pruning/codegen all apply. This is the
thin waist of the engine — everything else feeds plans through here.
"""

from __future__ import annotations

import re
import time
import uuid

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def clean_string(input_string: str) -> str:
    """Strip all chars outside ``[a-zA-Z0-9_]`` (reference common.py:124-127)."""
    return re.sub(r"[^a-zA-Z0-9_]", "", input_string)


def clean_string_col(col: str | Column) -> Column:
    """Column form of :func:`clean_string` — native expression, JVM-side."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_replace(c, r"[^a-zA-Z0-9_]", "")


def first_char_is_numeric(input_string: str) -> bool:
    """True iff the first character is a digit (reference common.py:142-143,
    fixed to always return bool — SURVEY.md §8 #12)."""
    return bool(input_string) and input_string[0].isdigit()


def temp_table_name(prefix: str | None = None) -> str:
    """Unique temp-view name ``{prefix}_{uuid4hex}``, alnum-cleaned,
    ``_``-prefixed when it would start with a digit (reference
    common.py:146-164 — non-str or underscore-only prefixes normalize to
    ``tmp``, trailing underscores strip, exactly as the reference does)."""
    if not isinstance(prefix, str) or len(prefix.rstrip("_")) == 0:
        prefix = "tmp"
    else:
        prefix = prefix.rstrip("_")
    name = clean_string(f"{prefix}_{uuid.uuid4().hex}")
    if first_char_is_numeric(name):
        name = f"_{name}"
    return name


def escape_name(name: str) -> str:
    """Backtick-quote identifiers containing spaces or ``-``, recursing over
    ``.``-qualified parts; idempotent on pre-quoted names (reference
    ``escapeName`` common.py:129-138)."""
    if "." in name:
        return ".".join(escape_name(part) for part in name.split("."))
    if "`" in name:
        # reference passes through on ANY backtick (common.py:134-135), not
        # only fully-quoted names — re-wrapping would double-quote
        return name
    if " " in name or "-" in name:
        return f"`{name}`"
    return name


def build_select_sql(table_name: str, cols: str | list[str], distinct: bool = False) -> str:
    """``SELECT cols FROM tbl`` with distinct emitted as GROUP BY all selected
    cols, exactly like reference ``getSQL`` common.py:359-367 (``GROUP BY``
    all cols ≡ SELECT DISTINCT in Spark SQL semantics)."""
    col_list = [cols] if isinstance(cols, str) else list(cols)
    escaped = [escape_name(c) for c in col_list]
    select_list = ", ".join(escaped)
    sql = f"SELECT {select_list} FROM {escape_name(table_name)}"
    if distinct:
        sql += f" GROUP BY {select_list}"
    return sql


def sql_over(
    spark: SparkSession,
    dfs: DataFrame | list[DataFrame],
    names: str | list[str],
    sql: str,
    print_sql: bool = False,
    time_action: bool = False,
) -> DataFrame:
    """Register DataFrames as temp views under ``names``, run ``sql``.

    Reference ``sqlQueryDataFrame`` common.py:172-205. Arg-shape validation
    matches the reference's asserts (common.py:177-182). When
    ``time_action`` is set, a real action (count) is timed — the reference
    timed only lazy plan construction (SURVEY.md §8 #5).
    """
    df_list = [dfs] if isinstance(dfs, DataFrame) else list(dfs)
    name_list = [names] if isinstance(names, str) else list(names)
    if len(df_list) != len(name_list):
        raise ValueError(
            f"got {len(df_list)} DataFrames but {len(name_list)} view names"
        )
    for df, name in zip(df_list, name_list):
        df.createOrReplaceTempView(name)
    if print_sql:
        print(sql)
    out = spark.sql(sql)
    if time_action:
        t0 = time.perf_counter()
        n = out.count()
        print(f"executed in {time.perf_counter() - t0:.3f}s ({n} rows)")
    return out


def get_cols_from_df(df: DataFrame, cols: str | list[str], distinct: bool = False) -> DataFrame:
    """Column-projection scan, optionally distinct (reference
    ``getColsFromTable`` common.py:377-378). Declarative select/distinct so
    column pruning reaches the file scan."""
    col_list = [cols] if isinstance(cols, str) else list(cols)
    out = df.select(*col_list)
    return out.distinct() if distinct else out
