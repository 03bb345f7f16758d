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
from pyspark.sql import functions as F

from .schemas import TESTDATA_TABLES

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one driver parquet table.  Parquet carries its schema;
    column pruning + predicate pushdown happen at the scan."""
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def load_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Read the events table with a normalized µs ``ts`` timestamp,
    whatever the file's physical encoding.

    Driver testdata has shipped ``ts`` two ways: TIMESTAMP(NANOS) (which
    Spark's reader rejects unless ``nanosAsLong`` maps it to long) and
    plain TIMESTAMP(MICROS) (read natively as timestamp_ntz).  Inspect
    the footer schema — free, no data scan — and convert only when the
    column arrives as nanos-long.  ``ns div 1000`` is exact integer
    truncation, matching DuckDB bit-for-bit (a double division would
    corrupt: epoch-nanos ≈ 1.7e18 ≫ 2^53).
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    raw = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    if dict(raw.dtypes)["ts"] in ("bigint", "long"):
        raw = raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    else:
        # native TIMESTAMP(MICROS) arrives as timestamp_ntz; normalize to
        # TIMESTAMP (LTZ) so watermarks/windows accept it.  Session tz is
        # UTC, so the cast is value-preserving and oracle-neutral.
        raw = raw.withColumn("ts", F.col("ts").cast("timestamp"))
    return raw


def events_raw_ts_is_long(spark: SparkSession, sf_dir: str) -> bool:
    """Whether the events parquet stores ``ts`` as nanos (→ long under
    ``nanosAsLong``) rather than a native timestamp.  Footer-only probe;
    used by the streaming reader, which must declare its schema up front."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    raw = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    return dict(raw.dtypes)["ts"] in ("bigint", "long")


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
