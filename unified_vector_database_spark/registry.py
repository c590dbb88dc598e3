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
# str, or a zero-arg callable resolved lazily at oracle_sql() time —
# for oracles that embed data-derived build artifacts (IVF centroids,
# PQ codebooks) as SQL literals: the artifact fit reads the oracle
# corpus, so the SQL string can only be produced where the parquet is
# reachable, not at import time.
ORACLES: dict[str, str | Callable[[], str]] = {}


def register(name: str, oracle: str | Callable[[], str] | None = None):
    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            # A silent overwrite once left a dead shadowed body behind
            # (VERDICT r5 #1) — duplicate names are a bug, not a merge.
            raise ValueError(f"duplicate query registration: {name!r}")
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn
    return deco


def resolved_oracles() -> dict[str, str]:
    """ORACLES with lazy entries rendered to SQL. A lazy oracle that
    fails to build (corpus unreadable) drops out — the driver then
    records the weaker rows-only check for it instead of erroring
    every other entry."""
    out: dict[str, str] = {}
    for name, o in ORACLES.items():
        if callable(o):
            try:
                out[name] = o()
            except Exception:  # pragma: no cover - defensive
                continue
        else:
            out[name] = o
    return out


def load_all() -> None:
    """Import every operator module for its registration side effects."""
    from . import api  # noqa: F401
    from .operators import (  # noqa: F401
        analytics, analyzer, arrow_knn, cleanup, dedup, esagg, esagg2,
        esagg3,
        esagg4, esagg5, esagg6, esagg7, esql, esql2, evaluation, geo,
        graph,
        hnsw,
        hybrid,
        index,
        inference,
        inverted,
        jpeg, knn, lifecycle, lm, matrix, multimodal, percolate,
        quality, refs, rerank, sampling, search_extras, search_extras2,
        search_extras3, search_extras4,
        search_more, simhash, simjoin, sketches, spans, sparse, stats,
        stats_more, suggest, textops, timeseries, tpch_extra,
        tpch_more,
    )
    from .streaming import ingest as streaming_ingest  # noqa: F401
    from .streaming import stateful  # noqa: F401
