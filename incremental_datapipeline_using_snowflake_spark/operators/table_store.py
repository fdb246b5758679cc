"""Versioned parquet table store — the engine's multi-layer catalog.

Replaces the reference's Snowflake database/schema/table catalog
(``config/dev.yml:9-14``, ``templates/setup.sql.j2:49-53``) with a
path-per-layer parquet warehouse:

    <root>/<namespace>/<table>/v=<NNNNNN>/part-*.parquet
    <root>/<namespace>/<table>/_VERSION        (text file: current version)

**Atomic overwrite protocol** (stage-and-swap): a new version directory is
fully written, then the ``_VERSION`` pointer is flipped with ``os.replace``
(atomic on POSIX). Readers resolve the pointer once at plan time, so an
in-flight overwrite never exposes partial files — this stands in for
Snowflake's ACID ``MERGE`` / ``CREATE OR REPLACE TABLE`` semantics
(reference ``co2_harmonized_sp/function.py:82-87,146-153``).
Single-writer-per-table semantics; at cluster scale the same protocol works
on any object store with atomic pointer writes (or swap in Delta/Iceberg).

Appends write additional parquet files *into* the current version directory
(standard Spark append); partitioned tables use Hive-style ``COL=value``
subdirectories so partition pruning applies (reference's year-foldered
layout, SURVEY.md §2.1 S6).
"""

from __future__ import annotations

import os
import shutil
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession


@dataclass
class TableStore:
    root: str
    # retained versions per table (current + history). 2 = current + the
    # immediately previous (the minimum for reader-in-flight safety);
    # raise it for time-travel depth — every retained version stays
    # readable via read_version / restorable via restore.
    keep_versions: int = 2
    # (table -> (version, schema)): parquet footer schema memoized per
    # version. Without it every spark.read.parquet launches a footer-
    # inference job — ~10 extra jobs per pipeline run, and at warehouse
    # scale a listing+footer fetch per read. Appends keep the version, and
    # the table schema is fixed, so version-keyed is exactly right.
    _schema_cache: dict = field(default_factory=dict, repr=False)

    # -- paths ------------------------------------------------------------
    def table_dir(self, name: str) -> str:
        """``namespace.table`` -> ``<root>/namespace/table``."""
        return os.path.join(self.root, *name.lower().split("."))

    def _version_file(self, name: str) -> str:
        return os.path.join(self.table_dir(name), "_VERSION")

    def current_version(self, name: str) -> int | None:
        vf = self._version_file(name)
        if not os.path.exists(vf):
            return None
        with open(vf) as f:
            return int(f.read().strip())

    def data_path(self, name: str) -> str:
        v = self.current_version(name)
        if v is None:
            raise FileNotFoundError(f"table {name!r} does not exist in {self.root}")
        return os.path.join(self.table_dir(name), f"v={v:06d}")

    def exists(self, name: str) -> bool:
        return self.current_version(name) is not None

    def create_namespace(self, namespace: str) -> None:
        os.makedirs(os.path.join(self.root, namespace.lower()), exist_ok=True)

    def list_tables(self, namespace: str) -> list[str]:
        ns_dir = os.path.join(self.root, namespace.lower())
        if not os.path.isdir(ns_dir):
            return []
        return sorted(
            d for d in os.listdir(ns_dir)
            if os.path.exists(os.path.join(ns_dir, d, "_VERSION"))
        )

    # -- reads ------------------------------------------------------------
    def read(self, spark: SparkSession, name: str) -> DataFrame:
        v = self.current_version(name)
        path = self.data_path(name)
        cached = self._schema_cache.get(name)
        if cached is not None and cached[0] == v:
            return spark.read.schema(cached[1]).parquet(path)
        df = spark.read.parquet(path)
        self._schema_cache[name] = (v, df.schema)
        return df

    def describe(self, spark: SparkSession, name: str) -> DataFrame:
        """``DESC TABLE`` parity (reference ``loading_data_sp/function.py:30``):
        one row per column — (col_name, data_type, nullable). Schema comes
        from parquet footer metadata only; no data scan."""
        fields = self.read(spark, name).schema.fields
        return spark.createDataFrame(
            [(f.name, f.dataType.simpleString(), f.nullable) for f in fields],
            schema="col_name string, data_type string, nullable boolean",
        )

    # -- table comments ----------------------------------------------------
    def _comment_file(self, name: str) -> str:
        return os.path.join(self.table_dir(name), "_COMMENT")

    def set_comment(self, name: str, comment: str) -> None:
        """``COMMENT ON TABLE`` parity (reference ``raw_co2_data.py:103-105``)."""
        if not self.exists(name):
            raise FileNotFoundError(f"table {name!r} does not exist in {self.root}")
        cf = self._comment_file(name)
        tmp = cf + ".tmp"
        with open(tmp, "w") as f:
            f.write(comment)
        os.replace(tmp, cf)

    def get_comment(self, name: str) -> str | None:
        cf = self._comment_file(name)
        if not os.path.exists(cf):
            return None
        with open(cf) as f:
            return f.read()

    # -- writes -----------------------------------------------------------
    def _commit_version(self, name: str, version: int) -> None:
        vf = self._version_file(name)
        tmp = vf + ".tmp"
        with open(tmp, "w") as f:
            f.write(str(version))
        os.replace(tmp, vf)  # atomic pointer flip

    def overwrite(
        self, df: DataFrame, name: str, partition_by: list[str] | None = None
    ) -> None:
        """Full-table replace via stage-and-swap; keeps one previous version."""
        tdir = self.table_dir(name)
        os.makedirs(tdir, exist_ok=True)
        prev = self.current_version(name)
        # allocate past every retained dir, not just the pointer: after a
        # restore() the pointer can sit below a still-retained version,
        # and reusing that number would clobber live history
        new = max([prev or 0, *self.versions(name)]) + 1
        target = os.path.join(tdir, f"v={new:06d}")
        writer = df.write.mode("overwrite")
        if partition_by:
            writer = writer.partitionBy(*partition_by)
        writer.parquet(target)
        self._commit_version(name, new)
        # GC versions beyond the retention window (the previous pointer's
        # version is always kept — even when restore() parked it below the
        # window — so a reader planned against the old pointer can still
        # finish; deeper windows give time travel).
        floor = min(prev or new, new - self.keep_versions + 1)
        for entry in os.listdir(tdir):
            if entry.startswith("v="):
                v = int(entry.split("=")[1])
                if v < floor:
                    shutil.rmtree(os.path.join(tdir, entry), ignore_errors=True)

    # -- time travel -------------------------------------------------------
    def versions(self, name: str) -> list[int]:
        """Retained (readable) version numbers, ascending."""
        tdir = self.table_dir(name)
        if not os.path.isdir(tdir):
            return []
        return sorted(
            int(e.split("=")[1])
            for e in os.listdir(tdir)
            if e.startswith("v=") and os.path.isdir(os.path.join(tdir, e))
        )

    def read_version(self, spark: SparkSession, name: str, version: int) -> DataFrame:
        """Time-travel read of a retained version (Delta `VERSION AS OF`
        analogue). Raises ``FileNotFoundError`` for GC'd versions."""
        path = os.path.join(self.table_dir(name), f"v={version:06d}")
        if not os.path.isdir(path):
            raise FileNotFoundError(
                f"{name} v{version} not retained (have {self.versions(name)}; "
                f"raise keep_versions for deeper history)"
            )
        return spark.read.option("recursiveFileLookup", "false").parquet(path)

    def restore(self, name: str, version: int) -> None:
        """Roll the table back to a retained version by pointer flip (the
        Delta RESTORE analogue). The rolled-back-over version stays
        retained until normal GC, so restore is itself reversible."""
        path = os.path.join(self.table_dir(name), f"v={version:06d}")
        if not os.path.isdir(path):
            raise FileNotFoundError(
                f"{name} v{version} not retained (have {self.versions(name)})"
            )
        self._commit_version(name, version)

    def append(
        self, df: DataFrame, name: str, partition_by: list[str] | None = None
    ) -> None:
        if not self.exists(name):
            self.overwrite(df, name, partition_by=partition_by)
            return
        writer = df.write.mode("append")
        if partition_by:
            writer = writer.partitionBy(*partition_by)
        writer.parquet(self.data_path(name))

    def compact(
        self,
        spark: SparkSession,
        name: str,
        target_file_bytes: int = 128 << 20,
        sort_by: list[str] | None = None,
        partition_by: list[str] | None = None,
    ) -> dict[str, int]:
        """Rewrite a table into right-sized files (small-file compaction).

        Append-heavy tables (the CDC changelog above all) accumulate one
        file per micro-batch; at warehouse scale thousands of KB-sized
        files make every scan listing-bound and defeat row-group pruning.
        Compaction reads the current version, repartitions to
        ``ceil(total_bytes / target_file_bytes)`` output files, and commits
        through the same stage-and-swap protocol as :meth:`overwrite` — so
        readers planned against the old version still finish, and a crash
        mid-compaction leaves the table untouched.

        ``sort_by`` range-partitions and sorts the rewrite on those columns
        so min/max row-group stats stay selective for predicates on them
        (e.g. ``_row_id`` offset seeks, event-time filters). File sizing
        uses driver-side file metadata only — no data scan before the
        rewrite. Returns ``{"files_before", "files_after"}``.
        """
        from math import ceil

        src = self.data_path(name)
        sizes = [
            os.path.getsize(os.path.join(r, f))
            for r, _, fs in os.walk(src)
            for f in fs
            if f.endswith(".parquet")
        ]
        n_out = max(1, ceil(sum(sizes) / target_file_bytes))
        df = self.read(spark, name)
        if sort_by:
            df = df.repartitionByRange(n_out, *sort_by).sortWithinPartitions(*sort_by)
        else:
            df = df.repartition(n_out)
        self.overwrite(df, name, partition_by=partition_by)
        out = self.data_path(name)
        files_after = sum(
            1 for r, _, fs in os.walk(out) for f in fs if f.endswith(".parquet")
        )
        return {"files_before": len(sizes), "files_after": files_after}

    def drop(self, name: str) -> None:
        shutil.rmtree(self.table_dir(name), ignore_errors=True)
