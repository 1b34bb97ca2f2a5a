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

# Python *workers* (forked by the executor JVM for Arrow/pandas UDF stages)
# resolve imports via PYTHONPATH, not the driver's sys.path — a mapInPandas
# closure that references this package would die with ModuleNotFoundError
# when the driver process was launched from another cwd. Exporting the repo
# root here runs before any SparkSession (hence the JVM) exists, so local
# workers inherit it. On a real cluster, ship the package as a wheel /
# --py-files instead.
import os as _os

_repo_root = _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
if _repo_root not in _os.environ.get("PYTHONPATH", "").split(_os.pathsep):
    _os.environ["PYTHONPATH"] = (
        _repo_root + _os.pathsep + _os.environ.get("PYTHONPATH", "")
    ).rstrip(_os.pathsep)
del _os, _repo_root
