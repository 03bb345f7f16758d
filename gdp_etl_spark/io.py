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
from pathlib import Path

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


def compact_parquet(
    spark: SparkSession,
    path: str,
    target_file_mb: int = 128,
    sort_within_by: list[str] | None = None,
) -> tuple[int, int]:
    """Small-file compaction: rewrite a parquet directory into files of
    ~``target_file_mb`` — the table-maintenance job every long-running
    ingest needs (streaming sinks and incremental merges accrete small
    files; scans then pay per-file open cost and lose row-group
    locality).

    File count comes from the CURRENT on-disk byte size (cheap driver
    listing, no data scan); ``sort_within_by`` optionally sorts within
    partitions during the rewrite so min/max row-group stats become
    selective (poor man's clustering).  Writes to a temp sibling then
    swaps, so a failed rewrite never loses the original.  Returns
    (files_before, files_after).
    """
    import shutil

    src = Path(path)
    part_files = [p for p in src.rglob("*.parquet") if p.is_file()]
    total_bytes = sum(p.stat().st_size for p in part_files)
    n_files = max(1, round(total_bytes / (target_file_mb * 1024 * 1024)))

    df = spark.read.parquet(path)
    out = df.repartition(n_files)
    if sort_within_by:
        out = out.sortWithinPartitions(*sort_within_by)
    tmp = str(src.with_name(src.name + "__compact_tmp"))
    out.write.mode("overwrite").parquet(tmp)
    shutil.rmtree(path)
    shutil.move(tmp, path)
    after = len([p for p in Path(path).rglob("*.parquet") if p.is_file()])
    return len(part_files), after


def zorder_key(x, y, bits: int = 10):
    """Interleave-bit (Morton / Z-order) key of two bounded ints —
    sort-cluster a table by this before writing and range predicates on
    EITHER column become selective against parquet min/max row-group
    stats (single-column sort only helps one column; Z-order preserves
    locality in both).

    Pure JVM bit arithmetic (shiftleft/or inside codegen); inputs must
    already be reduced to ``[0, 2^bits)`` (mod or bucketize first).
    """
    xc = F.col(x) if isinstance(x, str) else x
    yc = F.col(y) if isinstance(y, str) else y
    key = F.lit(0).cast("long")
    for b in range(bits):
        xbit = F.shiftright(xc.cast("long"), b).bitwiseAND(F.lit(1))
        ybit = F.shiftright(yc.cast("long"), b).bitwiseAND(F.lit(1))
        key = (
            key
            .bitwiseOR(F.shiftleft(xbit, 2 * b))
            .bitwiseOR(F.shiftleft(ybit, 2 * b + 1))
        )
    return key
