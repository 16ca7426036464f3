"""Table-format adapter: Iceberg catalog tables when a catalog is
configured, parquet directories otherwise.

The north rule's input is an Iceberg-style webtext table.  This sandbox has
no Iceberg runtime jars, so the adapter keeps the ENGINE code
format-agnostic: every stage writes/reads through ``TableIO`` and the choice
of format is a deployment config, not an engine change.

Iceberg path (used when ``spark.sql.catalog.<name>`` is configured and the
identifier is catalog-qualified):
    df.writeTo("cat.db.tbl").using("iceberg").createOrReplace()
    spark.read.table("cat.db.tbl")
Parquet path (sandbox default): plain directory under ``root``.

The checkpointing layer (checkpoint.StageCheckpointer) writes stage tables
through the same directory layout the Iceberg branch would map to one table
per stage, so swapping formats does not change resume semantics.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, SparkSession


def catalog_configured(spark: SparkSession, catalog: str) -> bool:
    """True iff a Spark SQL catalog plugin named ``catalog`` is configured
    (e.g. spark.sql.catalog.my_cat=org.apache.iceberg.spark.SparkCatalog)."""
    try:
        return spark.conf.get(f"spark.sql.catalog.{catalog}", None) is not None
    except Exception:
        return False


class TableIO:
    """Write/read named tables in whichever format the session supports.

    ``identifier`` semantics:
      * with a configured catalog: ``<catalog>.<namespace>.<name>``
        written via the DataFrameWriterV2 Iceberg path;
      * otherwise: a parquet directory ``<root>/<name>``.
    """

    def __init__(
        self,
        spark: SparkSession,
        root: str,
        catalog: Optional[str] = None,
        namespace: str = "default",
    ):
        self.spark = spark
        self.root = root.rstrip("/")
        self.namespace = namespace
        self.catalog = catalog if (catalog and catalog_configured(spark, catalog)) else None

    def _ident(self, name: str) -> str:
        return f"{self.catalog}.{self.namespace}.{name}"

    def write(self, df: DataFrame, name: str, mode: str = "overwrite") -> None:
        if self.catalog is not None:
            writer = df.writeTo(self._ident(name)).using("iceberg")
            if mode == "overwrite":
                writer.createOrReplace()
            else:
                writer.append()
            return
        df.write.mode(mode).parquet(f"{self.root}/{name}")

    def read(self, name: str) -> DataFrame:
        if self.catalog is not None:
            return self.spark.read.table(self._ident(name))
        return self.spark.read.parquet(f"{self.root}/{name}")

    def exists(self, name: str) -> bool:
        if self.catalog is not None:
            return self.spark.catalog.tableExists(self._ident(name))
        import os

        return os.path.exists(f"{self.root}/{name}/_SUCCESS")
