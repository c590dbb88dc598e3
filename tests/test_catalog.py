"""Collection lifecycle (SURVEY §2.1 C1-C3, §2.3 I6): create / upsert
/ delete / snapshot / restore over versioned parquet."""

from __future__ import annotations

import pytest

from pyspark.sql import Row, functions as F

from unified_vector_database_spark.sources.catalog import Collection


def _rows(i0, n, tag):
    return [Row(id=i, embedding=[float(i), 1.0], tag=tag)
            for i in range(i0, i0 + n)]


def test_lifecycle(spark, tmp_path):
    base = str(tmp_path)
    col = Collection.create(spark, base, "c1", id_col="id", dim=2)
    assert Collection.list_collections(base) == ["c1"]
    assert col.describe().version == 0
    assert col.read() is None

    n = col.upsert(spark.createDataFrame(_rows(0, 10, "a")))
    assert n == 10 and col.count() == 10

    # upsert replaces overlapping ids, appends new
    n = col.upsert(spark.createDataFrame(_rows(5, 10, "b")))
    assert n == 15
    tags = dict(col.read().groupBy("tag").count().collect()
                and [(r.tag, r["count"]) for r in
                     col.read().groupBy("tag").count().collect()])
    assert tags == {"a": 5, "b": 10}

    col.snapshot("before-delete")
    assert col.delete(F.col("id") < 3) == 12
    assert col.count() == 12

    col.restore("before-delete")
    assert col.count() == 15

    with pytest.raises(ValueError):
        Collection.create(spark, base, "c1")

    col.drop()
    assert Collection.list_collections(base) == []


def test_update_metadata(spark, tmp_path):
    from pyspark.sql import functions as F
    base = str(tmp_path)
    col = Collection.create(spark, base, "c3")
    col.upsert(spark.createDataFrame(_rows(0, 6, "old")))
    col.update(F.col("id") >= 3, tag="new")
    tags = {r.id: r.tag for r in col.read().collect()}
    assert tags == {0: "old", 1: "old", 2: "old",
                    3: "new", 4: "new", 5: "new"}


def test_delete_ids_and_open(spark, tmp_path):
    base = str(tmp_path)
    col = Collection.create(spark, base, "c2")
    col.upsert(spark.createDataFrame(_rows(0, 5, "x")))
    col2 = Collection.open(spark, base, "c2")
    col2.delete_ids([0, 4])
    assert sorted(r.id for r in col2.read().collect()) == [1, 2, 3]
    with pytest.raises(ValueError):
        Collection.open(spark, base, "nope")


def test_compact_rewrites_small_files(spark, tmp_path):
    import glob
    import os
    base = str(tmp_path)
    col = Collection.create(spark, base, "c4")
    # trickle ingest: 4 upserts -> 4 versions, current one written by
    # a many-partition plan = many small files
    for i in range(4):
        col.upsert(spark.createDataFrame(_rows(i * 10, 10, "t"))
                   .repartition(8))
    m = col.describe()
    before = glob.glob(os.path.join(base, "c4", f"data_v{m.version}", "*.parquet"))
    assert len(before) > 1
    n = col.compact(target_rows_per_file=1000)
    assert n == 40 and col.count() == 40
    m2 = col.describe()
    after = glob.glob(os.path.join(base, "c4", f"data_v{m2.version}", "*.parquet"))
    assert len(after) == 1          # 40 rows < target -> one file
    assert m2.version == m.version + 1   # copy-on-write, old intact


def test_vacuum_keeps_manifest_and_snapshot_versions(spark, tmp_path):
    import os
    base = str(tmp_path)
    col = Collection.create(spark, base, "c5")
    col.upsert(spark.createDataFrame(_rows(0, 5, "a")))    # v1
    col.snapshot("pin")                                     # pins v1
    col.upsert(spark.createDataFrame(_rows(5, 10, "b")))    # v2
    col.upsert(spark.createDataFrame(_rows(10, 15, "c")))   # v3
    removed = col.vacuum()
    assert removed == [2]           # v1 pinned, v3 current
    assert os.path.isdir(os.path.join(base, "c5", "data_v1"))
    assert not os.path.isdir(os.path.join(base, "c5", "data_v2"))
    col.restore("pin")
    assert col.count() == 5         # pinned version still readable


def test_time_travel_reads(spark, tmp_path):
    base = str(tmp_path)
    col = Collection.create(spark, base, "c6")
    col.upsert(spark.createDataFrame(_rows(0, 5, "a")))     # v1
    col.snapshot("five")
    col.upsert(spark.createDataFrame(_rows(5, 7, "b")))     # v2
    assert col.read().count() == 12                          # current
    assert col.read(version=1).count() == 5                  # explicit
    assert col.read(tag="five").count() == 5                 # by tag
    assert col.describe().version == 2                       # no mutation
    with pytest.raises(ValueError, match="no snapshot"):
        col.read(tag="nope")
    with pytest.raises(ValueError, match="does not exist"):
        col.read(version=9)


def test_partitioned_collection_prunes_metadata_scans(spark, sf_dir, tmp_path):
    # hot-metadata layout: every commit hive-partitions on `lang`, so
    # a lang-filtered scan prunes unread partitions at file listing —
    # the payload-index analog of the reference backends
    import os

    from unified_vector_database_spark import tables
    from unified_vector_database_spark.plans.asserts import (
        assert_partition_pruned, plan_text,
    )

    docs = tables.load(spark, sf_dir, "documents").select(
        "doc_id", "lang", "n_chars")
    col = Collection.create(spark, str(tmp_path), "docs_by_lang",
                            id_col="doc_id", partition_by=["lang"])
    col.upsert(docs)

    langs = [r.lang for r in docs.select("lang").distinct().collect()]
    data_dir = col._data_path(col.describe().version)
    assert sorted(e for e in os.listdir(data_dir)
                  if e.startswith("lang=")) == sorted(
        f"lang={v}" for v in langs)

    scan = col.read().where(F.col("lang") == "en")
    assert_partition_pruned(scan, "lang")
    # correctness: the pruned scan returns exactly the en rows
    want = docs.where(F.col("lang") == "en").count()
    assert scan.count() == want

    # filters on a NON-partition column still push to parquet
    other = col.read().where(F.col("n_chars") > 300)
    assert "PushedFilters" in plan_text(other)
    col.drop()


def test_aliases_blue_green_swap(spark, tmp_path):
    from pyspark.sql import Row as R
    base = str(tmp_path)
    blue = Collection.create(spark, base, "docs_v1", id_col="id")
    blue.upsert(spark.createDataFrame([R(id=1, tag="blue")]))
    Collection.set_alias(base, "docs", "docs_v1")
    assert Collection.open_alias(spark, base, "docs").read().first().tag == "blue"

    # rebuild behind the alias, then swap atomically
    green = Collection.create(spark, base, "docs_v2", id_col="id")
    green.upsert(spark.createDataFrame([R(id=1, tag="green")]))
    Collection.set_alias(base, "docs", "docs_v2")
    assert Collection.open_alias(spark, base, "docs").read().first().tag == "green"
    assert Collection.list_aliases(base) == {"docs": "docs_v2"}

    with pytest.raises(ValueError):
        Collection.set_alias(base, "bad", "missing_collection")
    Collection.drop_alias(base, "docs")
    with pytest.raises(ValueError):
        Collection.open_alias(spark, base, "docs")


def test_collection_stats(spark, sf_dir, tmp_path):
    from unified_vector_database_spark import tables
    from unified_vector_database_spark.sources.catalog import Collection

    base = str(tmp_path / "cat")
    c = Collection.create(spark, base, "statcoll", id_col="vec_id",
                          dim=64)
    emb = tables.load(spark, sf_dir, "embeddings").limit(100)
    c.upsert(emb)
    c.snapshot("s1")
    c.upsert(emb.limit(10))  # second version
    st = c.stats()
    assert st["name"] == "statcoll"
    assert st["rows"] == 100
    assert st["version"] == 2
    assert st["files"] >= 1 and st["bytes"] > 0
    assert st["versions_retained"] >= 2
    assert st["snapshots"] == 1


def test_uri_catalog_roundtrip(spark, tmp_path):
    """Object-storage readiness (r4): the catalog must work through a
    URI-addressed store, not just bare posix paths. file:// exercises
    the full Hadoop FileSystem code path in sources/fsio.py — the
    SAME calls an s3a:// or hdfs:// base would take (only the
    FileSystem impl behind Path.getFileSystem differs), which is how
    the reference's MinIO-backed persistence maps onto Spark."""
    base = "file://" + str(tmp_path)
    col = Collection.create(spark, base, "c_uri", id_col="id", dim=2)
    assert Collection.list_collections(base) == ["c_uri"]

    col.upsert(spark.createDataFrame(_rows(0, 8, "a")))
    col.upsert(spark.createDataFrame(_rows(4, 8, "b")))  # 0-3 a, 4-11 b
    assert col.count() == 12
    assert col.describe().version == 2

    # snapshot + time-travel through the URI store
    col.snapshot("v2")
    col.delete(F.col("id") >= 10)
    assert col.count() == 10
    assert col.read(tag="v2").count() == 12

    # alias pointer swap lives in URI metadata too
    Collection.set_alias(base, "live", "c_uri")
    assert Collection.open_alias(spark, base, "live").count() == 10

    # stats walks the URI file listing; vacuum GCs URI dirs
    st = col.stats()
    assert st["rows"] == 10 and st["files"] > 0 and st["bytes"] > 0
    removed = col.vacuum()
    assert removed == [1]  # v2 pinned by snapshot, v3 current
    assert col.read(tag="v2").count() == 12  # pinned version survives

    # the posix view of the same tmp_path sees the identical layout:
    # fsio wrote real files, not a parallel namespace
    assert (tmp_path / "c_uri" / "manifest.json").exists()

    col.drop()
    assert Collection.list_collections(base) == []
