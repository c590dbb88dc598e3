"""Custom stateful streaming operator (SURVEY §2.9):
applyInPandasWithState keeping a bounded running top-k per key — the
streaming twin of grouped top-k search, and the pattern for any
reference-style "maintain an index incrementally as vectors arrive"
flow. State per key is exactly k scalars, so the state store stays
O(keys * k) forever.
"""

from __future__ import annotations

import os

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from pyspark.sql.types import (
    ArrayType, DoubleType, LongType, StringType, StructField, StructType,
)

from .. import tables
from ..registry import register

OUTPUT_SCHEMA = StructType([
    StructField("key", StringType()),
    StructField("topk", ArrayType(DoubleType())),
    StructField("n_seen", LongType()),
])
STATE_SCHEMA = StructType([
    StructField("topk", ArrayType(DoubleType())),
    StructField("n_seen", LongType()),
])


def _update_topk(key, pdfs: Iterator[pd.DataFrame],
                 state: GroupState) -> Iterator[pd.DataFrame]:
    if state.exists:
        topk, n_seen = state.get
        topk = list(topk)
    else:
        topk, n_seen = [], 0
    k = 3
    for pdf in pdfs:
        n_seen += len(pdf)
        for v in pdf["value"]:
            topk.append(float(v))
        topk = sorted(topk, reverse=True)[:k]
    state.update((topk, n_seen))
    yield pd.DataFrame({"key": [key[0]], "topk": [topk],
                        "n_seen": [n_seen]})


def running_topk(stream: DataFrame, key_col: str = "event_type",
                 value_col: str = "value") -> DataFrame:
    """Per-key running top-3 of `value` across all micro-batches."""
    keyed = stream.selectExpr(f"{key_col} as key",
                              f"{value_col} as value").groupBy("key")
    return keyed.applyInPandasWithState(
        _update_topk,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout)


@register("stateful_topk_stream", oracle="""
WITH t AS (
  SELECT event_type AS key,
         list(value ORDER BY value DESC)[1:3] AS topk,
         count(*) AS n_seen
  FROM events GROUP BY event_type)
SELECT key, rank, topv, n_seen FROM (
  SELECT key,
         CAST(generate_subscripts(topk, 1) AS INT) AS rank,
         unnest(topk) AS topv,
         CAST(n_seen AS BIGINT) AS n_seen
  FROM t)
ORDER BY key, rank
""")
def stateful_topk_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W3 driven end-to-end for the correctness gate: replay events as
    a multi-batch file stream (maxFilesPerTrigger=1 -> 4 incremental
    state updates), run the REAL applyInPandasWithState running-top-k,
    and reduce the update-mode emissions to each key's final state
    (max_by on the monotone n_seen). The oracle is the batch fixpoint
    — per-key top-3 values + total count — so the streaming state
    machine is hash-checked, not just smoke-run. The final top-k is
    posexploded to (key, rank, topv) rows: the driver's pandas
    canonicalizer cannot sort/hash array cells (r3 ERR), so arrays
    never appear in a final queries() output schema."""
    import tempfile
    import uuid

    from .. import flags

    if flags.SCHEMA_ONLY:
        # applyInPandasWithState requires a streaming source; for
        # schema-only consumers, thread an empty frame with the
        # operator's declared OUTPUT_SCHEMA through the same
        # post-stream reduction so the final schema is the real one.
        emissions = spark.createDataFrame([], OUTPUT_SCHEMA)
    else:
        ev = tables.load_events(spark, sf_dir).select("event_type", "value")
        src = os.path.join(tempfile.gettempdir(),
                           f"uvdb_topk_src_{abs(hash(sf_dir)) % 10 ** 8}")
        ev.repartition(4).write.mode("overwrite").parquet(src)
        stream = (spark.readStream.schema("event_type string, value double")
                  .option("maxFilesPerTrigger", 1).parquet(src))
        name = "uvdb_topk_" + uuid.uuid4().hex[:8]
        q = (running_topk(stream).writeStream.format("memory")
             .queryName(name).outputMode("update")
             .trigger(availableNow=True).start())
        q.awaitTermination(300)
        emissions = spark.table(name)
    final = (emissions
             .groupBy("key")
             .agg(F.max_by("topk", "n_seen").alias("topk"),
                  F.max("n_seen").alias("n_seen")))
    return (final.select("key", "n_seen",
                         F.posexplode("topk").alias("_pos", "topv"))
                 .select("key", (F.col("_pos") + 1).cast("int").alias("rank"),
                         "topv", "n_seen")
                 .orderBy("key", "rank"))
