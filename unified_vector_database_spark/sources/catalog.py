"""Collection catalog (SURVEY §2.1, §2.10 S3): the durable form of a
reference 'collection' (create/list/describe/drop; add/upsert/delete;
snapshot/restore) as versioned parquet + a JSON manifest.

Layout:  <base>/<name>/manifest.json
         <base>/<name>/data_v<N>/part-*.parquet

Writes are copy-on-write: a new data_v<N+1> directory is fully
written, then the manifest pointer flips — readers of v<N> are never
disturbed, which is exactly how object-store tables (and the
reference's MinIO-backed snapshots) stay consistent without locks.

`base` may be a bare posix path OR any URI Spark's Hadoop stack can
reach (`file://`, `s3a://` MinIO/S3, `hdfs://`, ...): all metadata
I/O routes through sources/fsio.py, which uses the standard library
for posix paths and Hadoop's FileSystem for URIs — see fsio's
docstring for the atomicity/committer story on object stores.
Round-tripped through a URI store in tests/test_catalog.py.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame, SparkSession, functions as F

from . import fsio


@dataclass
class Manifest:
    name: str
    id_col: str
    dim: int | None
    metric: str
    version: int
    # hot metadata columns the data layout partitions on (hive-style
    # dirs): filtered scans on these prune at the FILE LISTING — the
    # metadata analog of the IVF cid layout (operators/index.py).
    # None = unpartitioned. Absent in pre-r2 manifests -> default.
    partition_by: list[str] | None = None
    # Row count of the CURRENT version, recorded at commit time from
    # the write job's observed metrics (r9 opt): count()/stats()/
    # compact() read it instead of re-scanning parquet footers. None
    # (pre-r9 manifests) -> callers fall back to a Spark count.
    rows: int | None = None

    def to_json(self) -> dict:
        return self.__dict__.copy()


class Collection:
    def __init__(self, spark: SparkSession, base: str, name: str):
        self.spark = spark
        self.base = base
        self.name = name
        self.path = fsio.join(base, name)

    # -------------------------------------------------------- lifecycle
    @classmethod
    def create(cls, spark: SparkSession, base: str, name: str,
               id_col: str = "id", dim: int | None = None,
               metric: str = "cosine",
               partition_by: list[str] | None = None) -> "Collection":
        """`partition_by`: low-cardinality hot metadata columns (the
        reference backends' payload-index analog). Every commit writes
        hive-partitioned on them, so metadata-filtered scans
        (filtered_scan / knn_filtered class) prune unread partitions
        at file listing instead of scanning the full collection —
        plan-asserted in tests/test_catalog.py."""
        col = cls(spark, base, name)
        if fsio.exists(col.path):
            raise ValueError(f"collection {name!r} already exists")
        fsio.makedirs(col.path)
        col._write_manifest(Manifest(name, id_col, dim, metric, version=0,
                                     partition_by=partition_by))
        return col

    @classmethod
    def open(cls, spark: SparkSession, base: str, name: str) -> "Collection":
        col = cls(spark, base, name)
        if not fsio.exists(col._manifest_path):
            raise ValueError(f"collection {name!r} does not exist")
        return col

    @staticmethod
    def list_collections(base: str) -> list[str]:
        if not fsio.isdir(base):
            return []
        return sorted(n for n in fsio.listdir(base)
                      if fsio.exists(fsio.join(base, n, "manifest.json")))

    # ---------------------------------------------------------- aliases
    # The blue-green reindex primitive every reference backend exposes
    # (Qdrant update_aliases, Milvus alter_alias, ES index aliases):
    # readers resolve a stable alias while a new collection builds
    # behind it; the swap is one atomic pointer write.
    @staticmethod
    def _aliases_path(base: str) -> str:
        return fsio.join(base, "_aliases.json")

    @staticmethod
    def _read_aliases(base: str) -> dict:
        p = Collection._aliases_path(base)
        if not fsio.exists(p):
            return {}
        return fsio.read_json(p)

    @staticmethod
    def set_alias(base: str, alias: str, name: str,
                  filter_sql: str | None = None) -> None:
        """Point `alias` at collection `name` (create or atomic swap).

        `filter_sql` makes it a FILTERED alias (the ES filtered-alias
        surface: reads through the alias auto-inject the predicate —
        the standard multi-tenant / scoped-view pattern). Stored as a
        dict entry; plain string entries stay valid for unfiltered
        aliases, so existing alias files keep working."""
        if not fsio.exists(fsio.join(base, name, "manifest.json")):
            raise ValueError(f"collection {name!r} does not exist")
        aliases = Collection._read_aliases(base)
        aliases[alias] = (name if filter_sql is None
                          else {"name": name, "filter": filter_sql})
        fsio.write_json(Collection._aliases_path(base), aliases)

    @staticmethod
    def _resolve_alias(base: str, alias: str) -> tuple[str, str | None]:
        aliases = Collection._read_aliases(base)
        if alias not in aliases:
            raise ValueError(f"no alias {alias!r}")
        tgt = aliases[alias]
        if isinstance(tgt, str):
            return tgt, None
        return tgt["name"], tgt.get("filter")

    @staticmethod
    def drop_alias(base: str, alias: str) -> None:
        aliases = Collection._read_aliases(base)
        aliases.pop(alias, None)
        fsio.write_json(Collection._aliases_path(base), aliases)

    @staticmethod
    def list_aliases(base: str) -> dict:
        return dict(Collection._read_aliases(base))

    @classmethod
    def open_alias(cls, spark: SparkSession, base: str,
                   alias: str) -> "Collection":
        """Resolve an alias to its current target collection (any
        alias filter is ignored here — use read_alias for the
        filter-injecting read path)."""
        name, _ = cls._resolve_alias(base, alias)
        return cls.open(spark, base, name)

    @classmethod
    def read_alias(cls, spark: SparkSession, base: str,
                   alias: str) -> DataFrame:
        """Read THROUGH an alias: resolves the target and auto-injects
        the alias filter (no-op for unfiltered aliases) — the ES
        filtered-alias read contract. The injected predicate is a
        plain Catalyst filter, so it pushes into the parquet scan
        like any user filter."""
        from pyspark.sql import functions as F

        name, flt = cls._resolve_alias(base, alias)
        df = cls.open(spark, base, name).read()
        return df.where(F.expr(flt)) if flt else df

    def drop(self) -> None:
        fsio.rmtree(self.path)

    def describe(self) -> Manifest:
        return Manifest(**fsio.read_json(self._manifest_path))

    # ---------------------------------------------------------- ingest
    def upsert(self, df: DataFrame) -> int:
        """Keep-latest upsert: existing rows whose id appears in the
        batch are replaced (anti-join), then the batch is appended.
        One shuffle on the id column; at scale the anti-join broadcasts
        when the batch is small."""
        m = self.describe()
        if m.id_col not in df.columns:
            raise ValueError(
                f"batch is missing the id column {m.id_col!r}")
        if m.dim is not None:
            vec_cols = [f.name for f in df.schema.fields
                        if f.dataType.typeName() == "array"]
            if vec_cols:
                bad = df.where(
                    F.size(vec_cols[0]) != m.dim).limit(1).count()
                if bad:
                    raise ValueError(
                        f"vector dim mismatch: collection expects {m.dim}")
        current = self.read()
        if current is not None:
            kept = current.join(df.select(m.id_col), m.id_col, "left_anti")
            out = kept.unionByName(df)
        else:
            out = df
        return self._commit(out, m)

    def delete(self, predicate) -> int:
        """Delete by predicate (Column) — rewrite keeping the negation."""
        m = self.describe()
        current = self.read()
        if current is None:
            return 0
        return self._commit(current.where(~predicate), m)

    def delete_ids(self, ids: list) -> int:
        m = self.describe()
        return self.delete(F.col(m.id_col).isin(ids))

    def update(self, predicate, **assignments) -> int:
        """Metadata update (reference: payload/metadata set on matching
        records): rewrite matching rows with the new column values —
        one conditional projection, no join."""
        m = self.describe()
        current = self.read()
        if current is None:
            return 0
        out = current
        for col, value in assignments.items():
            lit = value if isinstance(value, Column) else F.lit(value)
            out = out.withColumn(
                col, F.when(predicate, lit).otherwise(F.col(col)))
        return self._commit(out, m)

    # ----------------------------------------------------------- reads
    def read(self, *, version: int | None = None,
             tag: str | None = None) -> DataFrame | None:
        """Read the current version, or time-travel to an explicit
        `version` / pinned snapshot `tag` WITHOUT moving the manifest
        pointer (restore() moves it; this never mutates). Data dirs
        are immutable, so a historical read is just a different scan
        path — concurrent writers are unaffected."""
        if tag is not None:
            snaps = self._read_snapshots()
            if tag not in snaps:
                raise ValueError(f"no snapshot {tag!r}")
            version = snaps[tag]
        v = self.describe().version if version is None else version
        if v == 0:
            return None
        path = self._data_path(v)
        if not fsio.isdir(path):
            raise ValueError(f"version {v} does not exist (vacuumed?)")
        return self.spark.read.parquet(path)

    def count(self) -> int:
        m = self.describe()
        if m.rows is not None:
            return m.rows  # recorded at commit time — no scan
        df = self.read()
        return 0 if df is None else df.count()

    def stats(self) -> dict:
        """Collection telemetry (reference backends' describe surface:
        Qdrant collection info, Milvus get_collection_stats, ES
        _stats): row count, current-version file count and bytes,
        retained versions, snapshots. File-level numbers come from the
        directory listing — the same metadata a SHOW TABLE EXTENDED
        reports — so the call is O(files), not O(rows), except for the
        row count which is one parquet-footer-only Spark count."""
        m = self.describe()
        files, nbytes = 0, 0
        if m.version:
            for _, sz in fsio.parquet_files(self._data_path(m.version)):
                files += 1
                nbytes += sz
        versions = len([d for d in fsio.listdir(self.path)
                        if d.startswith("data_v")
                        and fsio.isdir(fsio.join(self.path, d))])
        return {
            "name": self.name,
            "rows": self.count(),
            "version": m.version,
            "files": files,
            "bytes": nbytes,
            "versions_retained": versions,
            "snapshots": len(self._read_snapshots()),
        }

    # ----------------------------------------------------- maintenance
    def compact(self, target_rows_per_file: int = 1_000_000) -> int:
        """OPTIMIZE: rewrite the current version into right-sized files.
        Micro-batch streaming ingest and trickle upserts leave a long
        tail of small files; scans then pay one task + one object-store
        request per file. Compaction is a coalesce-style rewrite into
        ceil(n / target) files — copy-on-write like every commit, so
        concurrent readers of the old version are undisturbed. (On a
        real deployment size by bytes via maxPartitionBytes; rows are
        the deterministic local proxy.)"""
        m = self.describe()
        current = self.read()
        if current is None:
            return 0
        n = m.rows if m.rows is not None else current.count()
        files = max(1, -(-n // target_rows_per_file))
        return self._commit(current.repartition(files), m)

    def vacuum(self) -> list[int]:
        """Drop data versions no longer reachable from the manifest or
        any snapshot tag — the GC half of copy-on-write. Returns the
        versions removed."""
        m = self.describe()
        keep = {m.version} | set(self._read_snapshots().values())
        removed = []
        for entry in fsio.listdir(self.path):
            if not entry.startswith("data_v"):
                continue
            v = int(entry.removeprefix("data_v"))
            if v not in keep:
                fsio.rmtree(fsio.join(self.path, entry))
                removed.append(v)
        return sorted(removed)

    # ------------------------------------------------------- snapshots
    def snapshot(self, tag: str) -> str:
        """Pin the current version under a tag (pointer copy, O(1) —
        data directories are immutable)."""
        m = self.describe()
        snaps = self._read_snapshots()
        snaps[tag] = m.version
        fsio.write_json(self._snapshots_path, snaps)
        return tag

    def restore(self, tag: str) -> None:
        snaps = self._read_snapshots()
        if tag not in snaps:
            raise ValueError(f"no snapshot {tag!r}")
        m = self.describe()
        m.version = snaps[tag]
        # the recorded count belongs to the version being abandoned;
        # the restored version's count is unknown here (None -> scan)
        m.rows = None
        self._write_manifest(m)

    # --------------------------------------------------------- private
    @property
    def _manifest_path(self) -> str:
        return fsio.join(self.path, "manifest.json")

    @property
    def _snapshots_path(self) -> str:
        return fsio.join(self.path, "snapshots.json")

    def _read_snapshots(self) -> dict:
        if not fsio.exists(self._snapshots_path):
            return {}
        return fsio.read_json(self._snapshots_path)

    def _data_path(self, version: int) -> str:
        return fsio.join(self.path, f"data_v{version}")

    def _write_manifest(self, m: Manifest) -> None:
        fsio.write_json(self._manifest_path, m.to_json())

    def _commit(self, df: DataFrame, m: Manifest) -> int:
        from pyspark.sql import Observation

        new_version = m.version + 1
        # row count observed INSIDE the write job (CollectMetrics node)
        # — the previous read-back count was a second full job per
        # commit (file listing + footer scan), paid by every
        # upsert/delete/update/compact across the lifecycle operators.
        obs = Observation()
        writer = (df.observe(obs, F.count(F.lit(1)).alias("n"))
                  .write.mode("overwrite"))
        if m.partition_by:
            writer = writer.partitionBy(*m.partition_by)
        writer.parquet(self._data_path(new_version))
        n = int(obs.get["n"])
        m.version = new_version
        m.rows = n
        self._write_manifest(m)
        return n
