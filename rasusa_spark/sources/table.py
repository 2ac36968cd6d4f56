"""Token-table storage (SURVEY §7.M9; north_rule: Iceberg tables).

The engine's canonical layout is an Iceberg table partitioned by
``(source, days(ts))``. The local PySpark 4.1.2 distribution bundles no
Iceberg runtime jar (verified), so this module speaks Iceberg when the
catalog is configured (``ICEBERG_CATALOG`` env or a ``catalog`` argument)
and otherwise falls back to parquet with the SAME partition layout —
``source=<v>/bucket_day=<date>/`` — which preserves the two properties the
engine depends on:

- partition pruning: a per-(source, day-range) query touches only its
  directories (Iceberg: manifest pruning; parquet: directory pruning), and
- co-partitioned selection: the downsample groups ARE the storage
  partitions, so the selection shuffle is aligned with the scan.

Switching to Iceberg on a real cluster is a config change
(``--packages org.apache.iceberg:iceberg-spark-runtime-...`` + catalog
conf), not a code change.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def iceberg_available(spark: SparkSession) -> bool:
    try:
        spark._jvm.java.lang.Class.forName(  # noqa: SLF001
            "org.apache.iceberg.spark.SparkCatalog"
        )
        return True
    except Exception:
        return False


def write_tokens_table(
    df: DataFrame,
    location: str,
    mode: str = "append",
    catalog_table: str | None = None,
) -> None:
    """Write the token table partitioned by (source, days(ts))."""
    spark = df.sparkSession
    if catalog_table and iceberg_available(spark):
        (
            df.writeTo(catalog_table)
            .partitionedBy(F.col("source"), F.expr("days(ts)"))
            .createOrReplace()
        )
        return
    out = df.withColumn("bucket_day", F.to_date("ts"))
    out.write.mode(mode).partitionBy("source", "bucket_day").parquet(location)


def read_tokens_table(
    spark: SparkSession,
    location: str,
    catalog_table: str | None = None,
) -> DataFrame:
    if catalog_table and iceberg_available(spark):
        return spark.read.table(catalog_table)
    df = spark.read.parquet(location)
    return df.drop("bucket_day") if "bucket_day" in df.columns else df


def default_catalog_table() -> str | None:
    return os.environ.get("ICEBERG_CATALOG_TABLE")
