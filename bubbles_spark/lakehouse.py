"""Lakehouse table-format stores: Delta Lake and Apache Iceberg.

The modern equivalent of the reference's SQL-table target
(bubbles/backends/sql — SURVEY.md §2.1 S5): an ACID table a 100 TB
deployment can MERGE into with CONCURRENT writers, which
``FileStore.upsert``'s staged-rewrite explicitly cannot (its
docstring says so).  Both stores push the SCD1 merge down to the
engine's MERGE INTO — optimistic-concurrency commit protocols,
partition/file pruning on the match keys, no read-modify-rewrite of
untouched data.

Neither engine's jars ship in this environment, so both stores probe
the classpath lazily and raise a single explicit error naming the
exact ``--packages`` coordinate; every test skips cleanly when the
probe fails.  Nothing else in the package imports this module's
engines — plain parquet paths never pay for the probe.

Jar coordinates (Spark 4.x / Scala 2.13):

- Delta:   ``io.delta:delta-spark_2.13:4.0.0`` plus session confs
  ``spark.sql.extensions=io.delta.sql.DeltaSparkSessionExtension``
  and ``spark.sql.catalog.spark_catalog=
  org.apache.spark.sql.delta.catalog.DeltaCatalog``
- Iceberg: ``org.apache.iceberg:iceberg-spark-runtime-4.0_2.13:1.10.0``
  plus a catalog conf, e.g.
  ``spark.sql.catalog.local=org.apache.iceberg.spark.SparkCatalog``,
  ``spark.sql.catalog.local.type=hadoop``,
  ``spark.sql.catalog.local.warehouse=<path>``
"""

from __future__ import annotations

import os
from typing import Any, Sequence

from pyspark.sql import DataFrame, SparkSession

from bubbles_spark.io import DataStore, FileStore
from bubbles_spark.schema import FieldList

DELTA_COORD = "io.delta:delta-spark_2.13:4.0.0"
ICEBERG_COORD = "org.apache.iceberg:iceberg-spark-runtime-4.0_2.13:1.10.0"


def _jvm_class_present(spark: SparkSession, cls: str) -> bool:
    try:
        spark._jvm.java.lang.Class.forName(cls)  # noqa: SLF001
        return True
    except Exception:
        return False


def delta_available(spark: SparkSession) -> bool:
    """True when the delta-spark jars are on the session classpath."""
    return _jvm_class_present(spark, "io.delta.sql.DeltaSparkSessionExtension")


def iceberg_available(spark: SparkSession) -> bool:
    """True when the iceberg-spark runtime is on the classpath."""
    return _jvm_class_present(spark, "org.apache.iceberg.spark.SparkCatalog")


class DeltaStore(FileStore):
    """Directory of Delta tables, one per object name.

    Reads/writes go through ``format("delta")`` (jar is enough);
    ``upsert`` and ``history`` need the Delta SQL extension conf on
    the session as well.  ``upsert`` is a real MERGE INTO: matched
    rows update, new keys insert, and the Delta commit protocol makes
    concurrent upserts serialize instead of corrupting — the gap the
    staged-rewrite ``FileStore.upsert`` documents.
    """

    format = "delta"
    extension = ".delta"

    def _require(self) -> None:
        if not delta_available(self.spark):
            raise NotImplementedError(
                "Delta Lake jars not on the classpath; start the session "
                f"with --packages {DELTA_COORD} and "
                "spark.sql.extensions=io.delta.sql.DeltaSparkSessionExtension, "
                "spark.sql.catalog.spark_catalog="
                "org.apache.spark.sql.delta.catalog.DeltaCatalog"
            )

    def exists(self, name: str) -> bool:
        # a Delta table is a directory with a _delta_log
        return os.path.isdir(os.path.join(self._file(name), "_delta_log"))

    def objects(self) -> list[str]:
        if not os.path.isdir(self.path):
            return []
        return sorted(
            f[: -len(self.extension)]
            for f in os.listdir(self.path)
            if f.endswith(self.extension)
            and os.path.isdir(os.path.join(self.path, f, "_delta_log"))
        )

    def get_object(
        self,
        name: str,
        fields: FieldList | None = None,
        version: int | None = None,
    ) -> DataFrame:
        """Read a table, optionally time-traveling to ``version``
        (the Delta log keeps every committed snapshot)."""
        self._require()
        reader = self.spark.read.format("delta")
        if version is not None:
            reader = reader.option("versionAsOf", str(version))
        return reader.load(self._file(name))

    def create(
        self,
        name: str,
        fields: FieldList | None = None,
        replace: bool = False,
        from_obj: DataFrame | None = None,
        partition_by: Sequence[str] | None = None,
    ) -> None:
        self._require()
        super().create(
            name,
            fields=fields,
            replace=replace,
            from_obj=from_obj,
            partition_by=partition_by,
        )

    def upsert(
        self,
        name: str,
        updates: DataFrame,
        keys: str | Sequence[str],
        partition_by: Sequence[str] | None = None,
    ) -> None:
        """MERGE-pushdown SCD1: WHEN MATCHED UPDATE SET * / WHEN NOT
        MATCHED INSERT *.  Delta prunes the scan to files whose
        min/max key ranges can match, rewrites only those files, and
        commits atomically — safe under concurrent writers."""
        self._require()
        if not self.exists(name):
            self.create(name, from_obj=updates, partition_by=partition_by)
            return
        key_list = [keys] if isinstance(keys, str) else list(keys)
        view = f"__upsert_updates_{name}"
        updates.dropDuplicates(key_list).createOrReplaceTempView(view)
        on = " AND ".join(f"t.`{k}` = u.`{k}`" for k in key_list)
        try:
            self.spark.sql(
                f"MERGE INTO delta.`{self._file(name)}` t "
                f"USING {view} u ON {on} "
                "WHEN MATCHED THEN UPDATE SET * "
                "WHEN NOT MATCHED THEN INSERT *"
            )
        finally:
            self.spark.catalog.dropTempView(view)

    def history(self, name: str) -> DataFrame:
        """The table's commit log (version, timestamp, operation) —
        the audit trail FileStore can't offer."""
        self._require()
        return self.spark.sql(
            f"DESCRIBE HISTORY delta.`{self._file(name)}`"
        )


class IcebergStore(DataStore):
    """Apache Iceberg tables under a named Spark catalog.

    Unlike the path-addressed DeltaStore, Iceberg tables live in a
    catalog (``<catalog>.<namespace>.<table>``), so the store takes
    the catalog + namespace and addresses objects by table name.
    Semantics mirror DeltaStore: ACID MERGE upsert, snapshot time
    travel, concurrent-writer safety via optimistic commits.
    """

    def __init__(
        self,
        spark: SparkSession,
        catalog: str = "local",
        namespace: str = "db",
        **options: Any,
    ):
        self.spark = spark
        self.catalog = catalog
        self.namespace = namespace
        self.options = options

    def _require(self) -> None:
        if not iceberg_available(self.spark):
            raise NotImplementedError(
                "Iceberg runtime not on the classpath; start the session "
                f"with --packages {ICEBERG_COORD} and a "
                f"spark.sql.catalog.{self.catalog} configuration"
            )

    def _qualified(self, name: str) -> str:
        return f"{self.catalog}.{self.namespace}.`{name}`"

    def objects(self) -> list[str]:
        self._require()
        rows = self.spark.sql(
            f"SHOW TABLES IN {self.catalog}.{self.namespace}"
        ).collect()
        return sorted(r["tableName"] for r in rows)

    def exists(self, name: str) -> bool:
        self._require()
        return name in self.objects()

    def get_object(
        self, name: str, snapshot_id: int | None = None
    ) -> DataFrame:
        self._require()
        if snapshot_id is not None:
            return (
                self.spark.read.option("snapshot-id", str(snapshot_id))
                .table(self._qualified(name))
            )
        return self.spark.table(self._qualified(name))

    def create(
        self,
        name: str,
        fields: FieldList | None = None,
        replace: bool = False,
        from_obj: DataFrame | None = None,
        partition_by: Sequence[str] | None = None,
    ) -> None:
        self._require()
        if from_obj is None:
            raise ValueError("create() requires from_obj (a DataFrame)")
        writer = from_obj.writeTo(self._qualified(name)).using("iceberg")
        if partition_by:
            from pyspark.sql import functions as F

            writer = writer.partitionedBy(*[F.col(c) for c in partition_by])
        if replace:
            writer.createOrReplace()
        else:
            writer.create()

    def upsert(
        self,
        name: str,
        updates: DataFrame,
        keys: str | Sequence[str],
        partition_by: Sequence[str] | None = None,
    ) -> None:
        self._require()
        if not self.exists(name):
            self.create(name, from_obj=updates, partition_by=partition_by)
            return
        key_list = [keys] if isinstance(keys, str) else list(keys)
        view = f"__upsert_updates_{name}"
        updates.dropDuplicates(key_list).createOrReplaceTempView(view)
        on = " AND ".join(f"t.`{k}` = u.`{k}`" for k in key_list)
        try:
            self.spark.sql(
                f"MERGE INTO {self._qualified(name)} t "
                f"USING {view} u ON {on} "
                "WHEN MATCHED THEN UPDATE SET * "
                "WHEN NOT MATCHED THEN INSERT *"
            )
        finally:
            self.spark.catalog.dropTempView(view)
