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


class TestZorderOperator:
    """End-to-end Z-order operator (operators/layout.py): observed-range
    quantization + interleave + per-bucket min/max envelope stats."""

    def _grid(self, spark, n=64):
        return spark.range(n * n).select(
            (F.col("id") % n).alias("x"),
            (F.col("id") / n).cast("long").alias("y"),
        )

    def test_quantization_hits_full_code_range(self, spark):
        from gdp_etl_spark.operators.layout import zorder_keys

        df = self._grid(spark, 64)
        out = zorder_keys(df, "x", "y", bits=6)
        r = out.agg(F.min("zval"), F.max("zval")).first()
        # min maps to code 0 in both dims, max to 63 -> full 12-bit span
        assert r[0] == 0 and r[1] == (1 << 12) - 1

    def test_constant_column_degenerates_safely(self, spark):
        from gdp_etl_spark.operators.layout import zorder_keys

        df = spark.range(100).select(
            F.lit(7).alias("x"), F.col("id").alias("y")
        )
        vals = zorder_keys(df, "x", "y", bits=8)
        assert vals.filter(F.col("zval") < 0).count() == 0
        # x contributes nothing; zval is y's bits at odd positions only
        assert vals.agg(F.min("zval")).first()[0] == 0

    def test_empty_or_all_null_input_raises_clear_error(self, spark):
        import pytest

        from gdp_etl_spark.operators.layout import zorder_keys

        empty = spark.range(0).select(
            F.col("id").alias("x"), F.col("id").alias("y")
        )
        with pytest.raises(ValueError, match="Z-order"):
            zorder_keys(empty, "x", "y")
        all_null = spark.range(5).select(
            F.lit(None).cast("long").alias("x"), F.col("id").alias("y")
        )
        with pytest.raises(ValueError, match="Z-order"):
            zorder_keys(all_null, "x", "y")

    def test_bucket_envelopes_are_narrow_in_both_dims(self, spark):
        from gdp_etl_spark.operators.layout import zorder_bucket_stats

        df = self._grid(spark, 64)
        stats = zorder_bucket_stats(df, "x", "y", bits=6, n_buckets=16)
        rows = stats.collect()
        assert len(rows) == 16
        assert sum(r["n_rows"] for r in rows) == 64 * 64
        for r in rows:
            # a single-column sort would leave the second dimension's
            # envelope at the FULL range (63); Z-order bounds both
            assert r["max_x"] - r["min_x"] <= 31
            assert r["max_y"] - r["min_y"] <= 31

    def test_operator_matches_raw_helper_on_prequantized_input(self, spark):
        from gdp_etl_spark.io import zorder_key
        from gdp_etl_spark.operators.layout import zorder_keys

        # inputs already spanning [0, 2^bits): quantization is identity
        df = self._grid(spark, 16)
        got = {
            (r["x"], r["y"]): r["zval"]
            for r in zorder_keys(df, "x", "y", bits=4).collect()
        }
        want = {
            (r["x"], r["y"]): r["z"]
            for r in df.select(
                "x", "y", zorder_key("x", "y", bits=4).alias("z")
            ).collect()
        }
        assert got == want


class TestShardLayout:
    """Deterministic shard assignment + manifest: pure functions of
    (id, seed), positions dense per shard, manifest totals reconcile."""

    def _docs(self, spark, n=200):
        return spark.range(0, n).select(
            F.col("id").alias("doc_id"),
            F.concat(F.lit("doc "), F.col("id").cast("string")).alias("text"),
        )

    def test_assignment_deterministic_and_partition_independent(self, spark):
        from gdp_etl_spark.operators.layout import shard_assignment

        docs = self._docs(spark)
        a = shard_assignment(docs, "doc_id", 8).collect()
        b = shard_assignment(docs.repartition(13), "doc_id", 8).collect()
        key = lambda rows: sorted((r.doc_id, r.shard_id, r.shard_pos)
                                  for r in rows)
        assert key(a) == key(b)

    def test_positions_dense_from_one(self, spark):
        from gdp_etl_spark.operators.layout import shard_assignment

        out = shard_assignment(self._docs(spark), "doc_id", 4).collect()
        by_shard = {}
        for r in out:
            by_shard.setdefault(r.shard_id, []).append(r.shard_pos)
        for shard, poss in by_shard.items():
            assert sorted(poss) == list(range(1, len(poss) + 1)), shard

    def test_seed_changes_layout(self, spark):
        from gdp_etl_spark.operators.layout import shard_assignment

        docs = self._docs(spark)
        a = {r.doc_id: r.shard_id
             for r in shard_assignment(docs, "doc_id", 8, seed="a").collect()}
        b = {r.doc_id: r.shard_id
             for r in shard_assignment(docs, "doc_id", 8, seed="b").collect()}
        assert a != b  # 200 docs, 8 shards: collision of all is ~impossible

    def test_manifest_reconciles_with_assignment(self, spark):
        from gdp_etl_spark.operators.layout import (
            shard_assignment, shard_manifest,
        )

        docs = self._docs(spark)
        man = {r.shard_id: r for r in
               shard_manifest(docs, "doc_id", "text", 8).collect()}
        got = shard_assignment(docs, "doc_id", 8).groupBy("shard_id").count()
        for r in got.collect():
            assert man[r.shard_id].n_docs == r["count"]
        assert sum(r.n_docs for r in man.values()) == 200
        assert sum(r.n_tokens for r in man.values()) == 400  # "doc <i>" = 2
        assert all(r.content_checksum > 0 for r in man.values())

    def test_manifest_checksum_detects_content_change(self, spark):
        from gdp_etl_spark.operators.layout import shard_manifest

        docs = self._docs(spark)
        tampered = docs.withColumn(
            "text",
            F.when(F.col("doc_id") == 7, F.lit("doc 7 TAMPERED"))
            .otherwise(F.col("text")),
        )
        a = {r.shard_id: r.content_checksum for r in
             shard_manifest(docs, "doc_id", "text", 8).collect()}
        b = {r.shard_id: r.content_checksum for r in
             shard_manifest(tampered, "doc_id", "text", 8).collect()}
        assert sum(1 for k in a if a[k] != b.get(k)) == 1

    def test_invalid_shard_count_raises(self, spark):
        import pytest as _pytest

        from gdp_etl_spark.operators.layout import (
            shard_assignment, shard_manifest,
        )

        docs = self._docs(spark, 5)
        with _pytest.raises(ValueError):
            shard_assignment(docs, "doc_id", 0)
        with _pytest.raises(ValueError):
            shard_manifest(docs, "doc_id", "text", -1)
