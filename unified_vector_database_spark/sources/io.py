"""Sources/sinks beyond parquet (SURVEY §2.10 S2): schema-explicit
CSV / JSON-lines readers and writers, vector-column aware.

CSV cannot carry array<float> natively, so vectors ride as JSON
strings (`embedding_json`) and are restored with from_json on read —
lossless for float32 origins because Python/Java both round-trip
shortest-repr doubles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F, types as T


def write_jsonl(df: DataFrame, path: str) -> None:
    df.write.mode("overwrite").json(path)


def read_jsonl(spark: SparkSession, path: str,
               schema: T.StructType | str) -> DataFrame:
    # explicit schema: no inference pass over 100 TB
    return spark.read.schema(schema).json(path)


def write_csv(df: DataFrame, path: str,
              vector_cols: tuple[str, ...] = ()) -> None:
    out = df
    for c in vector_cols:
        out = out.withColumn(f"{c}_json", F.to_json(F.col(c))).drop(c)
    out.write.mode("overwrite").option("header", True).csv(path)


def read_csv(spark: SparkSession, path: str, schema: T.StructType | str,
             vector_cols: tuple[str, ...] = (),
             element_type: str = "float") -> DataFrame:
    df = spark.read.schema(schema).option("header", True).csv(path)
    for c in vector_cols:
        df = (df.withColumn(
                c, F.from_json(F.col(f"{c}_json"),
                               T.ArrayType(getattr(T, f"{element_type.capitalize()}Type")())))
                .drop(f"{c}_json"))
    return df


def write_bucketed(df: DataFrame, table: str, key: str,
                   num_buckets: int = 32) -> None:
    """Persist as a bucketed table: rows are hash-distributed into
    `num_buckets` files per partition by `key`, and the layout is
    recorded in the catalog. Joins/aggregations on `key` between two
    tables bucketed the same way then run WITHOUT a shuffle — at
    100 TB this converts every recurring id-join (collection x
    updates, corpus x scores) from an all-to-all exchange into a
    partition-local merge. The write itself pays one shuffle; it
    amortizes over every later query."""
    (df.repartition(num_buckets, key)
       .write.mode("overwrite")
       .bucketBy(num_buckets, key).sortBy(key)
       .saveAsTable(table))


def read_table(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table)


def morton_code(a: F.Column, b: F.Column, bits: int = 16) -> F.Column:
    """Interleave the low `bits` of two non-negative int columns into
    one Z-order (Morton) key — pure shift/mask JVM expressions."""
    parts = []
    for i in range(bits):
        parts.append(((a.bitwiseAND(F.lit(1 << i))) != 0)
                     .cast("long") * F.lit(1 << (2 * i)))
        parts.append(((b.bitwiseAND(F.lit(1 << i))) != 0)
                     .cast("long") * F.lit(1 << (2 * i + 1)))
    out = parts[0]
    for p in parts[1:]:
        out = out + p
    return out


def write_zorder(df: DataFrame, path: str, col_a: str, col_b: str,
                 num_files: int = 16, bits: int = 16) -> None:
    """OPTIMIZE ... ZORDER BY (a, b) analog: range-partition rows by
    the Morton interleave of two filter columns, so each output file
    covers a small rectangle of (a, b) space and its parquet footer
    min/max stats prune MOST files for a predicate on EITHER column —
    the multi-column data-skipping layout (Delta/Databricks Z-ORDER,
    Qdrant payload-index analog for two hot keys) that plain sorting
    gives only for the leading column.

    At 100 TB this is the difference between 'filtered_scan reads one
    column stripe of the corpus' and 'filtered_scan reads everything':
    row-group stats skip at the FILE level before any task launches.

    Both columns are min-max scaled to the full `bits` width BEFORE
    interleaving — raw interleave of a small-domain column (e.g. a
    10-value label) puts all its entropy in the low bits, the range
    partitioner then splits only on the other column's high bits, and
    the small column stops clustering entirely. The two scalar bounds
    rows are one tiny agg (the same stats pass any OPTIMIZE job runs)."""
    [b] = (df.agg(F.min(col_a).alias("a0"), F.max(col_a).alias("a1"),
                  F.min(col_b).alias("b0"), F.max(col_b).alias("b1"))
             .collect())
    top = (1 << bits) - 1

    def scaled(col: str, lo: int, hi: int) -> F.Column:
        span = max(int(hi) - int(lo), 1)
        return ((F.col(col).cast("long") - F.lit(int(lo)))
                * F.lit(top) / F.lit(span)).cast("long")

    z = morton_code(scaled(col_a, b.a0, b.a1),
                    scaled(col_b, b.b0, b.b1), bits)
    (df.withColumn("_z", z)
       .repartitionByRange(num_files, "_z")
       .sortWithinPartitions("_z")
       .drop("_z")
       .write.mode("overwrite").parquet(path))


def write_orc(df: DataFrame, path: str) -> None:
    """ORC sink — Spark-native columnar interop beside parquet (the
    Hive-ecosystem handoff format a cross-team pipeline gets handed).
    Same pushdown/pruning class as parquet (stripe-level min/max)."""
    df.write.mode("overwrite").orc(path)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.orc(path)


def read_evolved(spark: SparkSession, *paths: str) -> DataFrame:
    """Schema-evolution read across ingest generations: parquet
    `mergeSchema` unions the column sets (older files null-fill the
    columns they predate) — the schema-drift contract a long-lived
    100 TB collection needs when commit N adds a payload column.
    Pass the generation directories; filters on pre-existing columns
    still push down into every generation's scan."""
    return (spark.read.option("mergeSchema", "true")
            .parquet(*paths))
