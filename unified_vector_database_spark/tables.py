"""Loaders for the driver-generated test tables (TESTDATA.md).

Every queries() callable receives (spark, sf_dir) and goes through
these; they are thin `spark.read.parquet` wrappers except `events`,
whose TIMESTAMP(NANOS) column needs the nanosAsLong shim.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name == "events":
        return load_events(spark, sf_dir)
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


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
    df = load(spark, sf_dir, name)
    target = spark.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < max(2, target // 2):
        df = df.repartition(target, key)
    return df


def load_events(spark: SparkSession, sf_dir: str) -> DataFrame:
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
