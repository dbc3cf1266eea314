"""Bloom-filter prefiltered join invariants (operators/bloom.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from cassowary_spark.operators.bloom import (
    bloom_build,
    bloom_might_contain,
    bloom_prefilter_join,
)

M, K = 1 << 12, 5


def test_no_false_negatives(spark):
    """Every build-side key must pass the membership test."""
    keys = spark.range(0, 500).select((F.col("id") * 7 + 3).alias("k"))
    bloom = bloom_build(keys, "k", M, K)
    missed = (
        keys.join(F.broadcast(bloom), how="cross")
        .filter(~bloom_might_contain("k", "bloom", M, K))
        .count()
    )
    assert missed == 0


def test_false_positive_rate_bounded(spark):
    """Non-members mostly fail the test (m=4096, n=500, k=5 → fpr ~5%)."""
    members = spark.range(0, 500).select(F.col("id").alias("k"))
    bloom = bloom_build(members, "k", M, K)
    non_members = spark.range(10_000, 30_000).select(F.col("id").alias("k"))
    fp = (
        non_members.join(F.broadcast(bloom), how="cross")
        .filter(bloom_might_contain("k", "bloom", M, K))
        .count()
    )
    assert fp / 20_000 < 0.25  # generous bound; sized-for-purpose filters sit ~5%


def test_prefilter_join_result_identical(spark, sf_dir):
    from cassowary_spark.tables import load_table

    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_extendedprice")
    hot = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_totalprice") > 400000)
        .select("o_orderkey")
    )
    got = bloom_prefilter_join(li, hot, "l_orderkey", "o_orderkey")
    want = li.join(hot, li["l_orderkey"] == hot["o_orderkey"], "inner")
    assert got.count() == want.count()
    assert got.exceptAll(want).count() == 0


def test_prefilter_join_mismatched_int_widths(spark):
    """int vs bigint keys: xxhash64 is type-sensitive, so both sides
    must widen to a common type for hashing or matching rows would be
    bloom-dropped as false negatives the exact join can't recover."""
    probe = spark.range(0, 100).select(F.col("id").cast("int").alias("pk"))
    build = spark.range(0, 50).select(F.col("id").alias("bk"))  # bigint
    got = bloom_prefilter_join(probe, build, "pk", "bk")
    assert got.count() == 50
    assert dict(got.dtypes)["pk"] == "int"  # output types untouched


def test_prefilter_join_rejects_outer_and_bad_dtypes(spark):
    import pytest

    probe = spark.range(10).select(F.col("id").alias("pk"))
    build = spark.range(5).select(F.col("id").alias("bk"))
    with pytest.raises(ValueError, match="inner/left_semi"):
        bloom_prefilter_join(probe, build, "pk", "bk", how="left")
    sprobe = spark.range(10).select(F.col("id").cast("string").alias("pk"))
    with pytest.raises(ValueError, match="not widenable"):
        bloom_prefilter_join(sprobe, build, "pk", "bk")


def test_prefilter_join_survives_bloom_column_collision(spark):
    """A probe column literally named 'bloom' must pass through."""
    probe = spark.range(0, 20).select(
        F.col("id").alias("pk"), F.lit("x").alias("bloom")
    )
    build = spark.range(0, 10).select(F.col("id").alias("bk"))
    got = bloom_prefilter_join(probe, build, "pk", "bk")
    assert got.count() == 10
    assert "bloom" in got.columns
