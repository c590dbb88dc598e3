"""Deterministic cross-engine hashing.

Every hash bottoms out in md5 (identical hex output in Spark and
DuckDB), so MinHash signatures, LSH band keys and fingerprints are
bit-identical between the Spark operators and their SQL oracles.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

from ..constants import FP_LEN, FP_MOD, FP_POW, MINHASH_A, MINHASH_B, MINHASH_P


def md5_int32(col: Column | str) -> Column:
    """First 8 hex chars of md5 -> bigint in [0, 2^32)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.conv(F.substring(F.md5(c), 1, 8), 16, 10).cast("long")


def md5_int60(col: Column | str) -> Column:
    """First 15 hex chars of md5 -> bigint in [0, 2^60) — wide enough
    for 60-bit signature schemes, still exactly representable in a
    signed 64-bit long (and in DuckDB's BIGINT)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("long")


def minhash_perm(h: Column, j: int) -> Column:
    """j-th universal-hash permutation of a 32-bit base hash."""
    return (F.lit(MINHASH_A[j]) * h + F.lit(MINHASH_B[j])) % F.lit(MINHASH_P)


def rolling_fingerprint(text: Column | str, length: int = FP_LEN) -> Column:
    """Polynomial rolling hash of the first `length` chars:
    sum(ascii(c_i) * 131^i) mod 1e9+7 — terms stay < 2^63 so a single
    end-of-sum mod matches the oracle exactly."""
    c = F.col(text) if isinstance(text, str) else text
    # powers as longs: ascii(int) * power(int) overflows int32 under
    # ANSI mode; each long term stays < 128 * 1e9 << 2^63.
    pw = F.array(*[F.lit(p).cast("long") for p in FP_POW[:length]])
    n = F.least(F.length(c), F.lit(length))
    # empty-string guard: sequence(1, 0) defaults to step -1 and its
    # i=0 iteration raises INVALID_INDEX_OF_ZERO, and sequence(1,0,1)
    # throws outright — so gate the whole aggregate behind n > 0
    # (CASE WHEN evaluates only the taken branch) and define fp('')=0,
    # matching the oracle's COALESCE(list_sum(...), 0).
    agg = F.aggregate(
        F.sequence(F.lit(1), n),
        F.lit(0).cast("long"),
        lambda acc, i: acc + F.ascii(F.substring(c, 1, length).substr(i, F.lit(1)))
        .cast("long") * F.element_at(pw, i),
    ) % F.lit(FP_MOD)
    return F.when(n > 0, agg).otherwise(F.lit(0).cast("long"))
