"""functions subpackage of ecu_sbl_aace_datalake_spark."""
