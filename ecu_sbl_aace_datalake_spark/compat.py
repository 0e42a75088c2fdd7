"""Drop-in compatibility surface: the reference's public API, re-expressed.

Every name the reference exports (``__all__`` at reference common.py:5-55,
see SURVEY.md appendix) exists here with the same call shape, implemented on
this engine's operators. A user of ``ecu_sbl_aace_datalake`` can switch
imports to ``ecu_sbl_aace_datalake_spark.compat`` and run the same code —
minus Fabric:

- Lakehouses are plain storage roots (:class:`~.sources.catalog.Lakehouse`);
  ``lakehouse_properties`` works over a registry you populate with
  :func:`register_lakehouse` instead of querying the Fabric control plane.
  ``lh_properties`` arguments accept either a Lakehouse or a reference-style
  property dict (any mapping with an ``abfsPath``/``source`` key).
- ``mountItUp`` is a no-op enrichment: open Spark reads abfss://s3a://file:/
  URIs directly, so "mounting" just records path aliases
  (reference common.py:248-263 needed Fabric's mssparkutils).
- Reference bugs are fixed, not replicated (SURVEY.md §8): ``readTable``
  really applies columns/condition, ``dropTable`` really drops,
  ``sparkSession`` honors appName, ``addIndexCol`` ids are contiguous,
  ``insertValueIntoList`` is pure, ``firstCharIsNumeric`` returns bool.
"""

from __future__ import annotations

import traceback
from collections.abc import Mapping
from typing import Any

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from .functions.cleaning import (
    ASSESS_LEVEL_LEGIT,
    STATUS_LEGIT,
    are_strings_similar,
    custom_initcap,
    custom_initcap_udf,
    fix_dodgy_assess_level as _fix_dodgy_assess_level,
    fix_dodgy_assess_level_udf as fixDodgyAssessLevel_udf,
    fix_dodgy_statuses as _fix_dodgy_statuses,
    fix_dodgy_statuses_udf as fixDodgyStatuses_udf,
    fix_dodgy_thing as _fix_dodgy_thing,
    fix_up_name as _fix_up_name,
    fix_up_name_udf as fixUpName_udf,
    garbage_clo as _garbage_clo,
    garbage_clo_udf as garbageCLO_udf,
)
from .operators import profile as _profile
from .operators import star as _star
from .operators import transform as _transform
from .operators.query import (
    build_select_sql,
    clean_string as cleanString,
    escape_name as escapeName,
    first_char_is_numeric as firstCharIsNumeric,
    get_cols_from_df,
    sql_over,
    temp_table_name as getTempTableName,
)
from .session import APPNAME_DEFAULT, get_spark
from .sources import io as _io
from .sources.catalog import Lakehouse, TableRegistry

__all__ = [
    "addIndexCol", "aliasColumns", "are_strings_similar", "castColumns",
    "castColumnsToInt", "cleanString", "createExtraRow", "custom_initcap",
    "dfShape", "Display", "dropTable", "escapeName", "extract_actual_error",
    "firstCharIsNumeric", "findAndDiagramRelationships",
    "fixDodgyAssessLevel", "fixDodgyStatuses", "fixDodgyThing", "fixUpName",
    "garbageCLO", "getColsFromTable", "getDistinctValsFromDataRowsInt",
    "getJoinCondition", "getLakehouseId", "getSQL", "getTables",
    "getTempTableName", "getWorkspace", "insertColumnAndAlias",
    "insertValueIntoList", "lakehouse_properties", "mountItUp", "readTable",
    "rename_columns_strip_prefix", "rename_columns_with_prefix",
    "replaceValueInList", "selectTable", "selectView", "setDFTextWhenNull",
    "setNullToZero", "simpleMap", "sparkSession", "sqlQueryDataFrame",
    "tablePath", "writeTable",
]

# module state mirroring the reference's globals (common.py:93-96) — but the
# session is NOT created at import time (reference bug #3)
spark: SparkSession | None = None
ALL_TABLES = TableRegistry()
_LAKEHOUSES: dict[str, Lakehouse] = {}


def sparkSession(appName: str | None = None) -> SparkSession:
    """Create/get the module session (reference common.py:111-122 — which
    ignored appName and ran at import; both fixed)."""
    global spark
    spark = get_spark(appName or APPNAME_DEFAULT)
    return spark


def _session() -> SparkSession:
    return spark if spark is not None else sparkSession()


def _as_lakehouse(lh_properties: Any) -> Lakehouse:
    """Accept a Lakehouse, a name registered via register_lakehouse, or a
    reference-style property dict (common.py:313-327 shape)."""
    if isinstance(lh_properties, Lakehouse):
        return lh_properties
    if isinstance(lh_properties, str):
        return _LAKEHOUSES[lh_properties]
    if isinstance(lh_properties, Mapping):
        source = (
            lh_properties.get("source")
            or lh_properties.get("abfsPath")
            or lh_properties.get("localPath")
        )
        if not source:
            raise ValueError("lakehouse properties need a source/abfsPath/localPath")
        return Lakehouse(
            name=lh_properties.get("lakehouse_name", "lakehouse"),
            source=source,
            description=lh_properties.get("description", ""),
        )
    raise TypeError(f"cannot interpret {type(lh_properties).__name__} as a lakehouse")


# ---------------------------------------------------------------- catalog

def register_lakehouse(name: str, source: str, description: str = "") -> dict[str, Any]:
    """Open-engine replacement for Fabric lakehouse provisioning: register a
    storage root under a name, get its property dict back."""
    lh = Lakehouse(name=name, source=source, description=description)
    _LAKEHOUSES[name] = lh
    return lakehouse_properties(name)


def lakehouse_properties(
    lakehouse_name: str | None = None,
    lakehouse_id: str | None = None,
    workspace: str | None = None,
    mountName: str | None = None,
    suppressDisplay: bool = True,
) -> dict[str, Any] | list[dict[str, Any]]:
    """Property dict for one/all registered lakehouses (reference
    common.py:273-351, minus the Fabric control-plane lookups)."""
    def props(lh: Lakehouse) -> dict[str, Any]:
        return {
            "lakehouse_id": lh.name,
            "type": "Lakehouse",
            "lakehouse_name": lh.name,
            "description": lh.description,
            "workspaceId": workspace or "local",
            "source": lh.source,
            "abfsPath": lh.source,
            "oneLakeTablesPath": lh.tables_path,
            "oneLakeFilesPath": lh.files_path,
            "localPath": lh.source,
            "localPathTables": lh.tables_path,
            "localPathFiles": lh.files_path,
        }

    key = lakehouse_name or lakehouse_id
    if key is not None:
        return props(_LAKEHOUSES[key])
    return [props(lh) for lh in _LAKEHOUSES.values()]


def getWorkspace(workspaceId: str | None = None) -> dict[str, Any]:
    """Workspace metadata (reference common.py:213-224). Open engine has one
    implicit 'local' workspace containing every registered lakehouse."""
    return {
        "id": workspaceId or "local",
        "name": "local",
        "lakehouses": sorted(_LAKEHOUSES),
    }


def getLakehouseId(lakehouse_name: str, workspace_id: str | None = None) -> str:
    """Name → id (reference common.py:232-238); ids ARE names here."""
    return _LAKEHOUSES[lakehouse_name].name


def mountItUp(lh_properties: Any, mountName: str) -> dict[str, Any]:
    """No-op path enrichment (reference common.py:248-263 mounted ABFS via
    Fabric mssparkutils; open Spark reads storage URIs directly)."""
    lh = _as_lakehouse(lh_properties)
    out = lakehouse_properties(lh.name) if lh.name in _LAKEHOUSES else {
        "lakehouse_name": lh.name, "source": lh.source, "abfsPath": lh.source,
        "localPath": lh.source, "localPathTables": lh.tables_path,
        "localPathFiles": lh.files_path,
    }
    out["mountName"] = mountName
    return out


def tablePath(lh_properties: Any, tableName: str) -> str:
    """Reference common.py:386-388."""
    from .sources.catalog import table_path

    return table_path(_as_lakehouse(lh_properties), tableName)


def viewPath(lh_properties: Any, viewName: str) -> str:
    """Reference common.py:390-392 (not in reference __all__ but public)."""
    from .sources.catalog import view_path

    return view_path(_as_lakehouse(lh_properties), viewName)


# ---------------------------------------------------------------- IO

def selectTable(lh_properties: Any, tableName: str, query: str | None = None) -> DataFrame:
    """Reference common.py:440-467. ``query`` may reference the registered
    view as ``{table}``."""
    return _io.select_table(_session(), _as_lakehouse(lh_properties), tableName, query)


def selectView(lh_properties: Any, viewName: str, query: str | None = None) -> DataFrame:
    """Reference common.py:461-462."""
    return _io.select_view(_session(), _as_lakehouse(lh_properties), viewName, query)


def readTable(
    lh_properties: Any,
    tableName: str,
    columns: str | list[str] = "*",
    condition: str = "",
) -> DataFrame:
    """Reference common.py:475-489 with bug #1 fixed: projection and
    condition are actually applied (and pushed into the scan)."""
    return _io.read_table(
        _session(), _as_lakehouse(lh_properties), tableName, columns, condition
    )


def getColsFromTable(
    tableName: str,
    cols: str | list[str],
    lh_properties: Any = None,
    distinct: bool = False,
) -> DataFrame:
    """Reference common.py:377-378."""
    df = _io.read_path(_session(), tablePath(lh_properties, tableName)) if lh_properties else _session().table(tableName)
    return get_cols_from_df(df, cols, distinct)


def writeTable(
    lh_properties: Any,
    tableName: str,
    df: DataFrame,
    partitionBy: str | list[str] | None = None,
) -> dict[str, Any]:
    """Reference common.py:525-538 (writer chaining fixed, shape opt-in via
    the underlying io.write_table; registry = module ALL_TABLES). The
    returned dict is a SUPERSET of the reference's
    ``{lakehouse_name, shape, columns, path}`` keys — a drop-in caller
    reading ``info['shape'][0]`` keeps working."""
    lh = _as_lakehouse(lh_properties)
    info = _io.write_table(
        lh, tableName, df,
        partition_by=partitionBy, registry=ALL_TABLES, with_shape=True,
    )
    info.setdefault("lakehouse_name", lh.name)
    if "shape" not in info and "rows" in info and "n_cols" in info:
        info["shape"] = (info["rows"], info["n_cols"])
    return info


def dropTable(lh_properties: Any, tableName: str, spark: SparkSession | None = None) -> None:
    """Reference common.py:512-517 with bug #2 fixed: a real drop."""
    _io.drop_table(spark or _session(), _as_lakehouse(lh_properties), tableName)


def getTables(lh_properties: Any) -> list[str]:
    """Reference common.py:497-503."""
    return _io.list_tables(_session(), _as_lakehouse(lh_properties))


# ---------------------------------------------------------------- querying

def sqlQueryDataFrame(
    df: DataFrame | list[DataFrame],
    tempTableName: str | list[str],
    qrySql: str,
    printSQL: bool = False,
) -> DataFrame:
    """Reference common.py:172-205."""
    return sql_over(_session(), df, tempTableName, qrySql, print_sql=printSQL)


def getSQL(tableName: str, cols: str | list[str], distinct: bool = False) -> str:
    """Reference common.py:359-367."""
    return build_select_sql(tableName, cols, distinct)


# ---------------------------------------------------------------- transforms

def castColumns(df: DataFrame, castCols: str | list[str], cast: str = "int") -> DataFrame:
    """Reference common.py:836-869 (single validation pass; failing columns
    keep their _orig twin and print a warning, like the reference). The
    parameter is named ``castCols`` exactly as the reference's, so
    keyword-style calls port unchanged."""
    out, failures = _transform.cast_columns(df, castCols, cast)
    for col, n in failures.items():
        if n:
            print(f"castColumns: {n} row(s) of {col!r} failed cast to {cast!r}; kept {col}_orig")
    return out


def castColumnsToInt(df: DataFrame, castCols: str | list[str]) -> DataFrame:
    """Reference common.py:877-878."""
    return castColumns(df, castCols, "int")


def setDFTextWhenNull(df: DataFrame, column_name: str, nullVal: str) -> DataFrame:
    """Reference common.py:762-764 (reference parameter names kept)."""
    return _transform.set_text_when_null(df, column_name, nullVal)


def setNullToZero(df: DataFrame, column_names: str | list[str]) -> DataFrame:
    """Reference common.py:772-779 (reference parameter name kept)."""
    return _transform.set_null_to_zero(df, column_names)


def addIndexCol(
    df: DataFrame,
    indexColName: str = "index",
    indexStart: int = 0,
    newColPos: int = 0,
    orderBy: str | list[str] | None = None,
) -> DataFrame:
    """Reference common.py:888-897, with contiguous row_number ids
    (bug #4 fixed); ``indexColName`` matches the reference's keyword."""
    return _transform.add_index_col(df, indexColName, indexStart, orderBy, newColPos)


def rename_columns_with_prefix(df: DataFrame, prefix: str) -> DataFrame:
    """Reference common.py:807-810."""
    return _transform.rename_columns_with_prefix(df, prefix)


def rename_columns_strip_prefix(df: DataFrame, prefix: str | list[str]) -> DataFrame:
    """Reference common.py:818-828 (reference parameter name kept; a list
    of prefixes is also accepted)."""
    return _transform.rename_columns_strip_prefix(df, prefix)


def createExtraRow(df: DataFrame, *args: Any) -> DataFrame:
    """Reference common.py:787-799: VARARGS leading values, exactly like
    the reference signature (``createExtraRow(df, v1, v2, ...)``); a single
    list argument is also accepted for engine-style calls. Zero-fills
    'isActualMetadata' when present, as the reference's setNullToZero call
    did."""
    if len(args) == 1 and isinstance(args[0], (list, tuple)):
        leading = list(args[0])
    else:
        leading = list(args)
    zero = ["isActualMetadata"] if "isActualMetadata" in df.columns else ()
    return _transform.create_extra_row(_session(), df, leading, zero)


def dfShape(df: DataFrame) -> dict:
    """Reference common.py:905-908 — returns the reference's exact shape:
    ``{"shape": (rows, cols), "columns": [...]}`` (the engine-native tuple
    form lives at transform.df_shape)."""
    rows, cols, columns = _transform.df_shape(df)
    return {"shape": (rows, cols), "columns": columns}


def insertValueIntoList(theList: list[Any], oldVal: Any, newVal: Any) -> list[Any]:
    """Reference common.py:593-607, pure (bug #7 fixed)."""
    return _transform.insert_value_into_list(theList, oldVal, newVal)


def replaceValueInList(theList: list[Any], oldVal: Any, newVal: Any) -> list[Any]:
    """Reference common.py:615-616."""
    return _transform.replace_value_in_list(theList, oldVal, newVal)


# ---------------------------------------------------------------- star kit

def getDistinctValsFromDataRowsInt(
    df: DataFrame,
    colNames: str | list[str],
    rowCountCol: str | None = None,
    indexStart: int = 0,
    suppressNullRawScore: bool = False,
    notNullCol: str | None = None,
) -> DataFrame:
    """Reference common.py:732-754. ``suppressNullRawScore`` keeps the
    reference's hard-coded RawScore filter name for compatibility;
    ``notNullCol`` is the parameterized form (bug #9)."""
    not_null = notNullCol or ("RawScore" if suppressNullRawScore else None)
    return _star.build_dimension(df, colNames, rowCountCol, indexStart, not_null)


def getJoinCondition(factCol: Column | str, mapCol: Column | str | None = None) -> Column:
    """Reference common.py:918-924 — null-safe equality as eqNullSafe."""
    f = F.col(factCol) if isinstance(factCol, str) else factCol
    m = F.col(mapCol) if isinstance(mapCol, str) else (mapCol if mapCol is not None else f)
    return _star.null_safe_eq(f, m)


def aliasColumns(selectCols: list[str], indexCol: str) -> list[str]:
    """Reference common.py:972-973: prefix the surrogate col 'map.', all
    others 'fact.' — select-list builder for aliased joins."""
    return [f"map.{c}" if c == indexCol else f"fact.{c}" for c in selectCols]


def insertColumnAndAlias(
    columns: list[str],
    valColumn: str,
    indexColumn: str,
    mapColumns: list[str] | None = None,
) -> list[str]:
    """Reference common.py:981-991: post-join select list with the natural
    key swapped for the surrogate at the same position, fact./map. aliased.
    Unlike the reference, EVERY column is qualified (fact. for fact-side,
    map. for the surrogate), which subsumes the reference's ``mapColumns``
    disambiguation pass — the parameter is accepted for signature parity
    and the fully-qualified list already covers its cases."""
    swapped = [indexColumn if c == valColumn else c for c in columns]
    return aliasColumns(swapped, indexColumn)


def simpleMap(
    factDF: DataFrame,
    metadataDF: DataFrame,
    joinCol: str,
    joinType: str = "inner",
) -> DataFrame:
    """Reference common.py:932-964 — null-safe broadcast dimension mapping
    with the row-count fan-out guard ON (matching reference behavior)."""
    return _star.simple_map(factDF, metadataDF, joinCol, joinType, validate=True)


# ---------------------------------------------------------------- cleaning

fixUpName = _fix_up_name
garbageCLO = _garbage_clo
fixDodgyThing = _fix_dodgy_thing
fixDodgyStatuses = _fix_dodgy_statuses
fixDodgyAssessLevel = _fix_dodgy_assess_level


# ---------------------------------------------------------------- profiling

def findAndDiagramRelationships(
    coverage_threshold: float = 0.95,
    name_similarity_threshold: float = 0.8,
    tables: dict[str, DataFrame] | None = None,
    render: bool = False,
    **kwargs: Any,
) -> DataFrame:
    """Reference common.py:995-1076 rebuilt on open Spark: relationship
    discovery over session-written tables (ALL_TABLES) or an explicit table
    dict; no SemPy, no full-table toPandas (bug #11), no UnboundLocalError
    on kwargs (bug #8). Returns the relationships DataFrame; optionally
    prints graphviz DOT."""
    table_map = tables or ALL_TABLES.dataframes()
    rels = _profile.find_relationships(
        _session(),
        table_map,
        coverage_threshold=coverage_threshold,
        name_similarity_threshold=name_similarity_threshold,
        **kwargs,
    )
    if render:
        print(_profile.to_graphviz(rels))
    return rels


# ---------------------------------------------------------------- notebook UX

def Display(thing: Any) -> None:
    """Reference common.py:98-109: render DataFrames/dicts/lists readably;
    console-friendly (show/print) instead of IPython display."""
    if isinstance(thing, DataFrame):
        thing.show(50, truncate=False)
    elif isinstance(thing, Mapping):
        for k, v in thing.items():
            print(f"{k}: {v}")
    elif isinstance(thing, (list, tuple)):
        for v in thing:
            print(v)
    else:
        print(thing)


def extract_actual_error(py4j_error: Any) -> str:
    """Pull the root 'Caused by:' line out of a Py4J error string
    (reference common.py:398-410)."""
    text = str(py4j_error)
    caused = [ln.strip() for ln in text.splitlines() if ln.strip().startswith("Caused by:")]
    return caused[-1] if caused else text.splitlines()[0] if text else ""


def display_exception(e: BaseException, raiseAgain: bool = False) -> None:
    """Reference common.py:419-436: render the traceback; optionally
    re-raise."""
    traceback.print_exception(type(e), e, e.__traceback__)
    if raiseAgain:
        raise e
