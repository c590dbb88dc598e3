"""Query registry: the single source of truth behind
__spark_entry__.queries() / oracle_sql().

Each operator module registers `name -> (spark, sf_dir) -> DataFrame`
plus (when SQL-expressible) the equivalent DuckDB oracle SQL. The
correctness driver runs both sides at sf=0.01 and hash-compares.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def register(name: str, oracle: str | None = None):
    def deco(fn: QueryFn) -> QueryFn:
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn
    return deco


def load_all() -> None:
    """Import every operator module for its registration side effects."""
    from . import api  # noqa: F401
    from .operators import (  # noqa: F401
        analytics, arrow_knn, cleanup, dedup, evaluation, geo, hybrid,
        index, inverted,
        knn, lm, matrix, multimodal, percolate, rerank, simhash, simjoin,
        spans, sparse, suggest, textops, timeseries, tpch_extra, tpch_more,
    )
    from .streaming import ingest as streaming_ingest  # noqa: F401
    from .streaming import stateful  # noqa: F401
