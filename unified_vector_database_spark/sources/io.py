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
