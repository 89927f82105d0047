"""pyspark-cdc-engine — a PySpark-native analytics engine with the query and
data-processing capabilities of nnagarajan/transactional-cdc-processing-spark.

Layout (SURVEY.md §7):

- ``session``     — SparkSession factory (reference: SparkSessionCreator.scala)
- ``config``      — layered config (reference: AppConfig.scala)
- ``schemas``     — StructType constants (reference: model/*.scala)
- ``tables``      — parquet + JSON-commit-log table format ("deltalite") standing in
  for Delta Lake (append / overwrite / merge / time travel / vacuum / history)
- ``sources``     — batch + streaming readers (kafka gated, file, deltalite)
- ``operators``   — the batch operator library backing ``__spark_entry__.queries()``
- ``functions``   — reusable column expressions (HOF dedup/merge, text analysis, vectors)
- ``streaming``   — stateful transaction assembly + pipeline wiring
- ``scd1``        — version-aware merge (reference: ScdType1MergeApp.scala)
- ``maintenance`` — SQL script runner + table maintenance (reference: SeedJob.scala)
"""

__version__ = "0.1.0"
