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
