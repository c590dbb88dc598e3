"""Loaders for the driver-generated test tables (TESTDATA.md).

Every queries() callable receives (spark, sf_dir) and goes through
these; they are thin `spark.read.parquet` wrappers except `events`,
whose TIMESTAMP(NANOS) column needs the nanosAsLong shim.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

# Per-(application, sf_dir, table) memo of the LAZY loader DataFrames.
# DataFrames are immutable plan handles, so handing every caller the
# same object is semantics-free — what it saves is real and per-call:
# spark.read.parquet re-reads footers for schema inference (~0.1 s)
# and load_parallel's .rdd partition probe forces a full physical
# planning of the scan (~0.15 s), measured r9. Most of the 286
# registered queries call these 1-3x per run, so this was a fixed
# ~0.2-0.3 s tax on nearly every query. No DATA is cached — plans
# stay lazy and every action still computes from the parquet inputs.
_DF_MEMO: dict[tuple, DataFrame] = {}


def _mtime(path: str) -> float:
    """Staleness key: tests (and the degenerate-corpus gates) overwrite
    table files in their synthetic sf dirs between loads; a memoized
    plan holds the old file listing. One stat() per call buys exact
    invalidation — an overwrite bumps the file/dir mtime and the memo
    rebuilds."""
    import os
    try:
        return os.path.getmtime(path)
    except OSError:
        return -1.0


def _memo(spark: SparkSession, path: str, key: tuple, build) -> DataFrame:
    k = (spark.sparkContext.applicationId, _mtime(path), *key)
    if k not in _DF_MEMO:
        _DF_MEMO[k] = build()
    return _DF_MEMO[k]


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name == "events":
        return load_events(spark, sf_dir)
    path = f"{sf_dir}/{name}.parquet"
    return _memo(spark, path, ("load", sf_dir, name),
                 lambda: spark.read.parquet(path))


def load_parallel(spark: SparkSession, sf_dir: str, name: str,
                  key: str) -> DataFrame:
    """Load + hash-repartition on `key` to the session's parallelism.

    The local test tables are single parquet files, i.e. one input
    split — compute-heavy per-row operators (shingling, fingerprints,
    per-pair vector math) would otherwise run on one core. On a real
    cluster the scan has one split per 128 MB and this shuffle is
    usually unnecessary — hence a distinct entry point rather than a
    default: operators opt in only where per-row work dominates scan
    cost (then the one-time shuffle amortizes at any scale)."""
    def build() -> DataFrame:
        df = load(spark, sf_dir, name)
        target = spark.sparkContext.defaultParallelism
        if df.rdd.getNumPartitions() < max(2, target // 2):
            df = df.repartition(target, key)
        return df

    return _memo(spark, f"{sf_dir}/{name}.parquet",
                 ("par", sf_dir, name, key), build)


def load_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _memo(spark, f"{sf_dir}/events.parquet", ("events", sf_dir),
                 lambda: _load_events_uncached(spark, sf_dir))


def _load_events_uncached(spark: SparkSession, sf_dir: str) -> DataFrame:
    # events.ts is parquet TIMESTAMP(not-UTC-adjusted) at NANOS or
    # MICROS precision depending on the generator. Spark-version
    # spread: pre-4.1 needs nanosAsLong for the NANOS files (read
    # bigint, floor-convert); 4.1+ ignores that conf and reads BOTH
    # layouts as TIMESTAMP_NTZ. Normalize every path to one canonical
    # TIMESTAMP (instant = wall clock @ UTC) so downstream unix_micros
    # / window math is identical regardless of Spark version AND of
    # the driver session's time zone.
    try:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    except Exception:
        pass  # removed in newer Sparks
    df = spark.read.parquet(f"{sf_dir}/events.parquet")
    ts_type = dict(df.dtypes)["ts"]
    if ts_type == "bigint":
        # integer DIV, not double /: nanos ~1.7e18 exceed double's 2^53
        # exact-integer range, so a float division garbles the low
        # microsecond digits (caught by the asof join's exact-µs oracle)
        df = df.withColumn(
            "ts", F.timestamp_micros(F.expr("ts DIV 1000")))
    elif ts_type == "timestamp_ntz":
        # NTZ wall clock -> absolute instant at UTC via pure wall-clock
        # arithmetic (timestampdiff on NTZ pairs) — a plain CAST would
        # route through the session time zone and shift the instant on
        # non-UTC drivers
        df = df.withColumn(
            "ts", F.timestamp_micros(F.expr(
                "timestampdiff(MICROSECOND, "
                "TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)")))
    return df
