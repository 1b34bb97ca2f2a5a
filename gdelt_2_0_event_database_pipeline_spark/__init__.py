"""PySpark-native analytics/ETL engine with the query and data-processing
capabilities of the GDELT-2.0-EVENT-DATABASE-Pipeline reference, re-expressed
Spark-first (DataFrame / Catalyst / Structured Streaming).

Subpackages
-----------
- ``functions``  — predicate DSL compiler, scalar helpers
- ``operators``  — sampling, dedup, similarity, text analysis, sketches
- ``sources``    — CSV ingest, parquet lake (flat + Hive-partitioned), manifests
- ``plans``      — declarative query library exposed through ``__spark_entry__``
- ``streaming``  — Structured Streaming ingest (extension surface)
"""

__version__ = "0.1.0"
