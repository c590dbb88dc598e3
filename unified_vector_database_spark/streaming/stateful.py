"""Custom stateful streaming operator (SURVEY §2.9):
applyInPandasWithState keeping a bounded running top-k per key — the
streaming twin of grouped top-k search, and the pattern for any
reference-style "maintain an index incrementally as vectors arrive"
flow. State per key is exactly k scalars, so the state store stays
O(keys * k) forever.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    ArrayType, DoubleType, LongType, StringType, StructField, StructType,
)

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
