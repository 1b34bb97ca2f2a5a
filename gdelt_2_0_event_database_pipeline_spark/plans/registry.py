"""Query registry backing ``__spark_entry__.py``.

Each entry pairs a PySpark plan (``(spark, sf_dir) -> DataFrame``) with an
equivalent ANSI-SQL string the DuckDB oracle runs on the same parquet tables
(``sql=None`` → non-SQL-expressible, driver runs a rows-only check).

Cross-engine comparison rules the queries follow:
- every computed column is aliased identically on both sides;
- floating-point *aggregates of doubles* are rounded on both sides (sum order
  differs between engines); ratios-of-integers and interpolations are left
  exact (IEEE ops on identical inputs are bit-identical);
- every top-k/limit query totally orders with explicit tiebreakers so the
  selected row set is engine-independent.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Optional

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)

#: dimension tables that are always broadcast-small (even at 100 TB the
#: nation/region dimensions stay tiny; part/supplier/customer are left to the
#: autoBroadcastJoinThreshold + AQE decision instead of a hard hint).
BROADCAST_DIMS = frozenset({"region", "nation"})


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: spark.read.parquet(f"{sf_dir}/{t}.parquet") for t in TABLES}


@dataclass(frozen=True)
class QueryDef:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    sql: Optional[str]
    doc: str = ""


QUERIES: dict[str, QueryDef] = {}


def register(name: str, sql: Optional[str], doc: str = ""):
    """Decorator: add a ``(spark, sf_dir) -> DataFrame`` plan to the registry."""

    def wrap(fn: Callable[[SparkSession, str], DataFrame]):
        QUERIES[name] = QueryDef(name=name, fn=fn, sql=sql, doc=doc)
        return fn

    return wrap
