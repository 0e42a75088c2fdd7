"""The compat layer must expose the reference's exact public API
(reference common.py:5-55 export list, SURVEY.md appendix) and behave like
the (fixed) reference on representative flows."""

from __future__ import annotations

import tempfile

import pytest

# the reference's __all__ (common.py:5-55), verbatim
REFERENCE_ALL = [
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


def test_every_reference_export_exists():
    from ecu_sbl_aace_datalake_spark import compat

    missing = [n for n in REFERENCE_ALL if not hasattr(compat, n)]
    assert not missing, f"compat layer missing reference exports: {missing}"
    assert sorted(compat.__all__) == sorted(REFERENCE_ALL)


def test_non_all_publics_exist():
    """viewPath, display_exception and the *_udf objects exist in the
    reference module without being in __all__ (SURVEY.md appendix)."""
    from ecu_sbl_aace_datalake_spark import compat

    for n in (
        "viewPath", "display_exception", "custom_initcap_udf", "fixUpName_udf",
        "garbageCLO_udf", "fixDodgyStatuses_udf", "fixDodgyAssessLevel_udf",
        "ALL_TABLES", "APPNAME_DEFAULT",
    ):
        assert hasattr(compat, n), n


class TestCompatFlow:
    """A reference-style ETL session driven purely through compat names."""

    @pytest.fixture(scope="class")
    def lh(self, spark):
        from ecu_sbl_aace_datalake_spark import compat

        compat.spark = spark  # reuse the test session
        props = compat.register_lakehouse("test_lh", tempfile.mkdtemp())
        return props

    def test_write_select_read_drop(self, spark, sf_dir, lh):
        from ecu_sbl_aace_datalake_spark import compat
        from ecu_sbl_aace_datalake_spark.sources.io import load_table

        orders = load_table(spark, sf_dir, "orders")
        info = compat.writeTable(lh, "orders", orders, partitionBy="o_orderstatus")
        assert info["rows"] == orders.count()
        assert "orders" in compat.ALL_TABLES
        assert compat.getTables(lh) == ["orders"]

        df = compat.selectTable(lh, "orders", "SELECT COUNT(*) AS n FROM {table}")
        assert df.first().n == orders.count()

        filtered = compat.readTable(lh, "orders", "o_orderkey,o_totalprice", "o_totalprice > 100000")
        assert filtered.columns == ["o_orderkey", "o_totalprice"]
        assert 0 < filtered.count() < orders.count()

        compat.dropTable(lh, "orders")
        assert compat.getTables(lh) == []

    def test_dimension_mapping_flow(self, spark, sf_dir, lh):
        from ecu_sbl_aace_datalake_spark import compat
        from ecu_sbl_aace_datalake_spark.sources.io import load_table

        orders = load_table(spark, sf_dir, "orders")
        dim = compat.getDistinctValsFromDataRowsInt(orders, "o_orderpriority")
        assert dim.columns == ["indexoorderpriority", "o_orderpriority"]
        mapped = compat.simpleMap(orders, dim, "o_orderpriority")
        assert mapped.count() == orders.count()
        assert "indexoorderpriority" in mapped.columns

    def test_sql_query_dataframe(self, spark, sf_dir, lh):
        from ecu_sbl_aace_datalake_spark import compat
        from ecu_sbl_aace_datalake_spark.sources.io import load_table

        nation = load_table(spark, sf_dir, "nation")
        out = compat.sqlQueryDataFrame(
            nation, "nation_compat", "SELECT COUNT(*) AS n FROM nation_compat"
        )
        assert out.first().n == 25

    def test_transform_names(self, spark):
        from ecu_sbl_aace_datalake_spark import compat

        df = spark.createDataFrame([("1",), ("x",)], "v string")
        out = compat.castColumnsToInt(df, "v")
        assert "v_orig" in out.columns  # one failure → _orig kept
        assert compat.getSQL("t", ["a"], distinct=True) == "SELECT a FROM t GROUP BY a"
        assert compat.cleanString("a-b") == "ab"
        assert compat.escapeName("x y") == "`x y`"
        assert compat.fixUpName("DOE, JANE") == "Jane Doe"
        assert compat.garbageCLO("N/A")
        assert compat.fixDodgyStatuses("complted") == "Completed"

    def test_relationships_over_all_tables(self, spark, sf_dir, lh):
        from ecu_sbl_aace_datalake_spark import compat
        from ecu_sbl_aace_datalake_spark.sources.io import load_table

        compat.writeTable(lh, "nation", load_table(spark, sf_dir, "nation"))
        compat.writeTable(lh, "region", load_table(spark, sf_dir, "region"))
        rels = compat.findAndDiagramRelationships()
        found = {(r.from_table, r.to_table) for r in rels.collect()}
        assert ("nation", "region") in found

    def test_error_helpers(self):
        from ecu_sbl_aace_datalake_spark import compat

        msg = "Py4JJavaError: ...\n  at x\nCaused by: java.io.FileNotFoundException: gone\n  at y"
        assert compat.extract_actual_error(msg).startswith("Caused by: java.io.FileNotFoundException")
        compat.Display({"a": 1})
        compat.Display([1, 2])


class TestCreateExtraRowSignature:
    def test_varargs_like_reference(self, spark):
        from ecu_sbl_aace_datalake_spark import compat

        compat.sparkSession("t")
        df = spark.createDataFrame([(1, "a", 5)], "id long, name string, n long")
        # reference call shape: positional varargs
        out = compat.createExtraRow(df, 0, "zz")
        rows = sorted(map(tuple, out.collect()))
        assert (0, "zz", None) in rows and len(rows) == 2
        # engine call shape: a single list still works
        out2 = compat.createExtraRow(df, [0, "zz"])
        assert sorted(map(tuple, out2.collect())) == rows


class TestWriteTableReturnShape:
    def test_superset_of_reference_keys(self, spark, tmp_path):
        from ecu_sbl_aace_datalake_spark import compat

        compat.sparkSession("t")
        compat.register_lakehouse("wt_lh", str(tmp_path / "wt"))
        df = spark.range(4).withColumnRenamed("id", "x")
        info = compat.writeTable(compat.lakehouse_properties("wt_lh"), "t_ret", df)
        # reference common.py:534-537 keys must all exist
        assert info["shape"] == (4, 1)
        assert info["columns"] == ["x"]
        assert info["lakehouse_name"] == "wt_lh"
        assert "path" in info
