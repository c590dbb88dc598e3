"""Driver contract for the spark-graft builder (PySpark target).

`entry(spark)` smoke-runs the flagship query; `queries()` /
`oracle_sql()` expose every implemented operator from SURVEY.md §2
with its DuckDB oracle twin. All implementations live in
`unified_vector_database_spark/` — this file is a thin adapter.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from unified_vector_database_spark import registry
from unified_vector_database_spark.session import tune_session

registry.load_all()


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: brute-force cosine knn over the embeddings collection."""
    tune_session(spark)
    return registry.QUERIES["knn_cosine"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    def _wrap(fn):
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            tune_session(spark)
            return fn(spark, sf_dir)
        return run
    return {name: _wrap(fn) for name, fn in registry.QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    return dict(registry.ORACLES)
