"""Table loading and sink helpers.

``load_tables`` is the single entry point every query uses to get the
driver's parquet tables; keeping it central means partition-level tuning
(e.g. ``maxPartitionBytes``) has one place to live.

Sinks mirror the reference's two CSV exports (SURVEY.md §2.1 S6/S7):
single-file CSV is a *deliverable* semantic of the reference, so
``write_single_csv`` coalesces to 1 — documented as a deliberate
anti-scale choice.  ``write_partitioned_parquet`` is the scale path.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from .schemas import TESTDATA_TABLES

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one driver parquet table.  Parquet carries its schema;
    column pruning + predicate pushdown happen at the scan."""
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def load_tables(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR) -> dict[str, DataFrame]:
    """All driver tables as a dict (lazy — nothing is scanned yet)."""
    return {name: load_table(spark, sf_dir, name) for name in TESTDATA_TABLES}


def register_temp_views(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR) -> None:
    """Expose the driver tables to ``spark.sql`` under their plain names."""
    for name, df in load_tables(spark, sf_dir).items():
        df.createOrReplaceTempView(name)


def write_single_csv(df: DataFrame, path: str, header: bool = True) -> None:
    """Single-file CSV sink — matches the reference's deliverable format
    (reference ``gpd_etl_pipeline.R:520-523``).  ``coalesce(1)`` serializes
    the final write; fine for report-sized outputs, never for bulk data —
    use :func:`write_partitioned_parquet` for anything large.
    """
    df.coalesce(1).write.mode("overwrite").option("header", str(header).lower()).csv(path)


def write_partitioned_parquet(
    df: DataFrame, path: str, partition_by: list[str] | None = None
) -> None:
    """Scale-path sink: parquet, optionally hive-partitioned so downstream
    scans get partition pruning (e.g. partition the GDP fact by Variable)."""
    writer = df.write.mode("overwrite")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


def write_bucketed_table(
    df: DataFrame,
    table: str,
    bucket_by: list[str],
    num_buckets: int = 32,
    sort_by: list[str] | None = None,
) -> None:
    """Co-location path for repeated big-big joins: bucket both sides of
    a hot join key once at write time and every subsequent equi-join on
    that key is shuffle-free (SortMergeJoin with no Exchange — the
    single biggest lever for a fact⋈fact join repeated across a 100-TB
    pipeline).  Requires a saveAsTable target (buckets are metastore
    metadata, not plain-directory layout)."""
    writer = df.write.mode("overwrite").bucketBy(num_buckets, *bucket_by)
    if sort_by:
        writer = writer.sortBy(*sort_by)
    writer.saveAsTable(table)
