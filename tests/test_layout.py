"""Data-layout maintenance: small-file compaction and Z-order keys."""

from pyspark.sql import functions as F

from gdp_etl_spark.io import compact_parquet, zorder_key


def test_compact_parquet_reduces_files_and_keeps_rows(spark, tmp_path):
    path = str(tmp_path / "frag")
    df = spark.range(0, 10_000).withColumn("v", F.col("id") * 2)
    df.repartition(40).write.parquet(path)  # 40 tiny files
    before, after = compact_parquet(spark, path, target_file_mb=128)
    assert before == 40 and after == 1  # 10k rows ≪ 128 MB → one file
    back = spark.read.parquet(path)
    assert back.count() == 10_000
    assert back.agg(F.sum("v")).first()[0] == df.agg(F.sum("v")).first()[0]


def test_compact_parquet_sort_within_clusters_rowgroups(spark, tmp_path):
    path = str(tmp_path / "sorted")
    spark.range(0, 1000).select(
        (F.col("id") * 37 % 1000).alias("k")
    ).repartition(8).write.parquet(path)
    compact_parquet(spark, path, sort_within_by=["k"])
    vals = [r["k"] for r in spark.read.parquet(path).collect()]
    assert vals == sorted(vals)  # one file, sorted within


def test_zorder_key_interleaves_bits_exactly(spark):
    # reference: morton(x, y) with x in even bit positions
    def morton(x, y, bits=10):
        out = 0
        for b in range(bits):
            out |= ((x >> b) & 1) << (2 * b)
            out |= ((y >> b) & 1) << (2 * b + 1)
        return out

    df = spark.createDataFrame(
        [(x, y) for x in (0, 1, 5, 1023) for y in (0, 2, 7, 1023)],
        "x int, y int",
    )
    got = {
        (r["x"], r["y"]): r["z"]
        for r in df.select("x", "y", zorder_key("x", "y").alias("z")).collect()
    }
    for (x, y), z in got.items():
        assert z == morton(x, y), (x, y)
    assert got[(1023, 1023)] == (1 << 20) - 1  # all 20 bits set


def test_zorder_sorted_write_helps_both_columns(spark, tmp_path):
    """Cluster by z(x,y): a narrow predicate on EITHER column should
    touch a subset of files (min/max pruning), unlike a single-column
    sort which only helps its own column."""
    path = str(tmp_path / "zed")
    n = 1 << 14
    df = spark.range(0, n).select(
        (F.col("id") % 128).alias("x"),
        ((F.col("id") * 7919) % 128).alias("y"),
    )
    (
        df.withColumn("z", zorder_key("x", "y", bits=7))
        .repartitionByRange(8, "z")
        .sortWithinPartitions("z")
        .drop("z")
        .write.parquet(path)
    )
    import pyarrow.parquet as pq
    from pathlib import Path

    def files_overlapping(col, lo, hi):
        hit = 0
        for p in Path(path).rglob("*.parquet"):
            md = pq.read_metadata(p)
            for rg in range(md.num_row_groups):
                group = md.row_group(rg)
                cols = {
                    group.column(i).path_in_schema: group.column(i)
                    for i in range(group.num_columns)
                }
                st = cols[col].statistics
                if st.min <= hi and st.max >= lo:
                    hit += 1
                    break
        return hit

    total = len(list(Path(path).rglob("*.parquet")))
    assert total == 8
    # an eighth of the x-range and of the y-range each skip SOME files
    assert files_overlapping("x", 0, 15) < total
    assert files_overlapping("y", 0, 15) < total


def test_table_checksum_is_partitioning_and_order_independent(spark):
    from gdp_etl_spark.operators.profile import table_checksum

    df = spark.range(0, 500).selectExpr("id", "id % 7 AS g",
                                        "CAST(id * 1.5 AS DOUBLE) AS v")
    a = table_checksum(df.coalesce(1)).first()
    b = table_checksum(df.repartition(13, "g")).first()
    assert (a["n_rows"], a["checksum"]) == (b["n_rows"], b["checksum"])
    # any single-value change must move the checksum
    c = table_checksum(
        df.withColumn("v", F.when(F.col("id") == 250, 0.0).otherwise(F.col("v")))
    ).first()
    assert c["checksum"] != a["checksum"]


def test_table_checksum_distinguishes_null_from_null_string(spark):
    from gdp_etl_spark.operators.profile import table_checksum

    a = spark.createDataFrame([("NULL",)], "s string")
    b = spark.createDataFrame([(None,)], "s string")
    assert (
        table_checksum(a).first()["checksum"]
        != table_checksum(b).first()["checksum"]
    )


def test_zorder_key_property_random(spark):
    import random

    rng = random.Random(7)
    pts = [(rng.randrange(1024), rng.randrange(1024)) for _ in range(64)]

    def morton(x, y, bits=10):
        out = 0
        for b in range(bits):
            out |= ((x >> b) & 1) << (2 * b)
            out |= ((y >> b) & 1) << (2 * b + 1)
        return out

    df = spark.createDataFrame(pts, "x int, y int")
    got = {(r["x"], r["y"]): r["z"]
           for r in df.select("x", "y", zorder_key("x", "y").alias("z")).collect()}
    for (x, y) in pts:
        assert got[(x, y)] == morton(x, y)
