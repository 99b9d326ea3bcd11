"""data_pipelines_examples_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first re-expression of the query and data-processing
capabilities of the reference corpus ``fartzy/data-pipelines-examples``
(production-style Databricks/Zeppelin/Airflow pipelines). Everything is built
on the public PySpark DataFrame / SQL / Structured Streaming APIs; Catalyst
and Tungsten pick the physical strategy.

Layout (SURVEY.md §7):

- ``session``    — SparkSession factory + tuned config profiles
- ``schema``     — StructType compilers (field lists, DDL strings)
- ``sources``    — readers (csv/parquet/json/text/jdbc-shaped) and writers
  (partitioned, idempotent, count-validated)
- ``operators``  — relational / window / interval / dedup / similarity /
  text / json / unpivot / iteration operators
- ``functions``  — scalar function library (native-first, UDF fallback)
- ``plans``      — config profiles mirroring the reference's tuned confs
- ``streaming``  — file-source streaming ETL (CloudTrail shape)
- ``dq``         — declarative data-quality rule framework
"""

__version__ = "0.1.0"

from .cache import release_cached  # noqa: E402,F401 — caller-owned persist release hook
