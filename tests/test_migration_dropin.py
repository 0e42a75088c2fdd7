"""End-to-end drop-in migration proof: a REFERENCE-STYLE workflow — the
call shapes the reference's notebooks use (keyword arguments, reference
parameter names, reference return contracts) — executed unchanged against
``ecu_sbl_aace_datalake_spark.compat``. This is the 'a user of the
reference could switch imports and run the same code' claim, as a test.

Mirrors the reference's medallion pattern: land raw → write table →
select/sql → build an integer dimension → simpleMap the fact onto it →
clean columns with the UDFs → write silver → inspect → drop.
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from ecu_sbl_aace_datalake_spark import compat


@pytest.fixture(scope="module")
def lh(spark, tmp_path_factory):
    compat.sparkSession("migration")
    root = tmp_path_factory.mktemp("migration_lh")
    compat.register_lakehouse("mig", str(root))
    return compat.lakehouse_properties(lakehouse_name="mig")


class TestReferenceWorkflow:
    def test_full_medallion_flow(self, spark, sf_dir, lh):
        from ecu_sbl_aace_datalake_spark.sources.io import load_table

        # ---- land a bronze table (reference: writeTable keyword style)
        raw = load_table(spark, sf_dir, "customer").select(
            "c_custkey", "c_name", "c_mktsegment", "c_acctbal"
        )
        info = compat.writeTable(
            lh_properties=lh, tableName="bronze_customer", df=raw
        )
        assert info["shape"][0] == raw.count()
        assert "bronze_customer" in compat.getTables(lh)

        # ---- selectTable + sqlQueryDataFrame (reference call shapes)
        bronze = compat.selectTable(lh_properties=lh, tableName="bronze_customer")
        agg = compat.sqlQueryDataFrame(
            df=bronze,
            tempTableName="cust",
            qrySql="SELECT c_mktsegment, COUNT(*) AS n FROM cust GROUP BY c_mktsegment",
        )
        assert agg.count() == 5

        # ---- integer dimension + simpleMap (reference common.py:732/932)
        dim = compat.getDistinctValsFromDataRowsInt(
            df=bronze, colNames="c_mktsegment", indexStart=1
        )
        # reference contract: index col named index<ColsNoUnderscores>, FIRST
        assert dim.columns[0] == "indexcmktsegment"
        mapped = compat.simpleMap(
            factDF=bronze, metadataDF=dim, joinCol="c_mktsegment"
        )
        assert "indexcmktsegment" in mapped.columns
        assert "c_mktsegment" not in mapped.columns
        assert mapped.count() == bronze.count()  # fan-out guard held

        # ---- cleaning UDFs + castColumns (reference keyword names)
        dirty = mapped.withColumn(
            "name_dirty", F.concat(F.lit("x, "), F.lower("c_name"))
        ).withColumn("bal_str", F.col("c_acctbal").cast("string"))
        cleaned = dirty.withColumn(
            "name_fixed", compat.fixUpName_udf(F.col("name_dirty"))
        )
        casted = compat.castColumns(df=cleaned, castCols="bal_str", cast="double")
        row = casted.select("name_dirty", "name_fixed", "bal_str").first()
        assert row.name_fixed == compat.fixUpName(row.name_dirty)
        assert isinstance(row.bal_str, float)

        # ---- silver write + dfShape + drop (reference contracts)
        silver_info = compat.writeTable(
            lh_properties=lh, tableName="silver_customer",
            df=casted.drop("name_dirty"),
        )
        shape = compat.dfShape(compat.selectTable(lh, "silver_customer"))
        assert shape["shape"] == silver_info["shape"]
        compat.dropTable(lh_properties=lh, tableName="silver_customer")
        assert "silver_customer" not in compat.getTables(lh)

    def test_helper_contracts_reference_style(self):
        # the helper quartet with reference keyword names
        assert compat.getSQL(tableName="t", cols=["a", "b-c"], distinct=True).count(
            "GROUP BY"
        ) == 1
        assert compat.escapeName("b-c") == "`b-c`"
        assert compat.cleanString("a-b c!") == "abc"
        assert compat.getTempTableName(prefix="stg__").startswith("stg_")
        cols = compat.insertColumnAndAlias(
            columns=["a", "seg", "b"], valColumn="seg", indexColumn="idx",
            mapColumns=["idx", "seg"],
        )
        assert cols == ["fact.a", "map.idx", "fact.b"]
