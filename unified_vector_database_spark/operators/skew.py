"""Skew-aware join utility (SURVEY §6): explicit salting for hot keys,
the manual complement to AQE's skew-join splitting (which only kicks
in above its partition-size thresholds and cannot split a single hot
KEY's build side).

Pattern: replicate the small side R times with a salt column, salt the
big side by hash(id) % R on the hot keys only, join on (key, salt).
Uniform keys keep salt 0 so their shuffle volume is unchanged.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def salted_join(big: DataFrame, small: DataFrame, key: str,
                hot_keys: list, factor: int = 8,
                how: str = "inner") -> DataFrame:
    """Join `big` with `small` on `key`, spreading each hot key over
    `factor` salted partitions.

    Only inner/left are supported: the small side is replicated
    `factor` times for hot keys, so right/full outer would emit each
    UNMATCHED hot-key small-side row once per salt replica (ADVICE
    r1). For those, pre-aggregate or dedupe the unmatched side
    instead of salting."""
    if how not in ("inner", "left", "leftouter", "left_outer"):
        raise ValueError(
            f"salted_join supports inner/left joins only, got {how!r}: "
            "outer joins would duplicate unmatched hot-key rows "
            "(small side is replicated per salt)")
    hot = F.col(key).isin(hot_keys)
    big_salted = big.withColumn(
        "_salt",
        F.when(hot, F.pmod(F.xxhash64(F.monotonically_increasing_id()),
                           F.lit(factor)))
         .otherwise(F.lit(0)).cast("int"))
    small_salted = (small.withColumn(
        "_salts",
        F.when(F.col(key).isin(hot_keys),
               F.sequence(F.lit(0), F.lit(factor - 1)))
         .otherwise(F.array(F.lit(0))))
        .withColumn("_salt", F.explode("_salts")).drop("_salts"))
    out = big_salted.join(small_salted,
                          on=[key, "_salt"], how=how)
    return out.drop("_salt")
