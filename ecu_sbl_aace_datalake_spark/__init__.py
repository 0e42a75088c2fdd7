"""ecu_sbl_aace_datalake_spark — a PySpark-native lakehouse analytics engine.

Brand-new implementation of the capabilities of the reference library
``itsalljustdata-sbl-aace/ecu_sbl_aace_datalake`` (a Fabric/OneLake PySpark
utility module), rebuilt Spark-first on open APIs only, plus LLM-data-pipeline
extensions (dedup, similarity search, text analysis, multimodal plumbing)
designed for 100 TB scale. See SURVEY.md for the blueprint and the
reference-parity map (every docstring cites reference common.py file:line).

Modules:
- ``session``    — explicit SparkSession factory (AQE/Arrow on)
- ``sources``    — path-based catalog + table IO (parquet/delta)
- ``operators``  — query/transform/star/dedup/similarity/textstats/profile
- ``functions``  — row-level cleaning functions (native expr + pandas_udf)
- ``streaming``  — event-time windowing & sessionization
"""

from .session import APPNAME_DEFAULT, get_spark

__all__ = ["get_spark", "APPNAME_DEFAULT"]
__version__ = "0.1.0"
