"""Bloom-filter pre-filtered joins (SURVEY.md §2 B13f).

The scale pattern behind Spark's own runtime row-level filtering
(InjectRuntimeFilter) and Cassandra's per-SSTable key blooms
(reconstruction [P]; reference checkout empty — SURVEY.md §0),
expressed in public DataFrame ops so the plan is visible and
portable: build a bit-array bloom filter over the (selective) build
side's join keys, broadcast it as ONE row, and drop probe-side rows
that cannot join *before* they reach the join's shuffle.

Why it matters at 100 TB: a fact-table shuffle is priced per row
shipped. When the dim side's predicate keeps 1% of keys, the bloom
probe (row-local, JVM-only, zero shuffle) removes ~99% of fact rows
up front at the cost of broadcasting a few KB of bitmap. False
positives only cost wasted shuffle rows — the exact join behind the
filter keeps the result correct, so the composition is
result-identical to the plain join (that's what the oracle checks).

Layout: m bits as ceil(m/64) longs in one array<bigint> row. Bit i of
key k for hash seed s: ``pmod(xxhash64(k, s), m)``. All expressions
are built-in JVM functions — no UDFs, whole-stage-codegen friendly.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _bit_positions(key: Column, m_bits: int, k_hashes: int) -> list[Column]:
    """The k bloom bit positions of a key (int columns in [0, m))."""
    return [
        F.pmod(F.xxhash64(key, F.lit(seed)), F.lit(m_bits))
        for seed in range(k_hashes)
    ]


def bloom_build(build: DataFrame, key: str, m_bits: int = 1 << 16, k_hashes: int = 5) -> DataFrame:
    """Aggregate the build side's keys into a 1-row bitmap DataFrame.

    Plan shape: explode each key into k (word_idx, mask) pairs →
    partial-agg ``bit_or`` per word (shuffle carries ≤ m/64 rows
    total, regardless of build size) → assemble the full-domain word
    array in ONE final row (missing words zero-filled via a
    ``sequence`` spine, order restored by ``map_from_entries`` lookup
    so no collect_list ordering hazard).
    """
    assert m_bits % 64 == 0, "m_bits must be a multiple of 64"
    n_words = m_bits // 64
    bits = build.select(
        F.explode(F.array(*_bit_positions(F.col(key), m_bits, k_hashes))).alias("bit")
    )
    words = bits.select(
        (F.col("bit") / 64).cast("int").alias("word_idx"),
        # shiftleft's DataFrame form takes a literal shift count, so the
        # column-shift spelling goes through the SQL parser
        F.expr("shiftleft(CAST(1 AS BIGINT), CAST(bit % 64 AS INT))").alias("mask"),
    ).groupBy("word_idx").agg(F.bit_or("mask").alias("word"))
    # One row: map word_idx -> word, then read the full [0, n_words)
    # domain out of the map (absent -> 0). element_at on a map returns
    # NULL for missing keys; coalesce zero-fills.
    return words.agg(
        F.map_from_entries(F.collect_list(F.struct("word_idx", "word"))).alias("wmap")
    ).select(
        F.transform(
            F.sequence(F.lit(0), F.lit(n_words - 1)),
            lambda i: F.coalesce(F.element_at("wmap", i.cast("int")), F.lit(0).cast("long")),
        ).alias("bloom")
    )


def bloom_might_contain(key: str, bloom: str, m_bits: int, k_hashes: int) -> Column:
    """Row-local membership test: all k bits set (false positives
    possible, false negatives impossible). ``key``/``bloom`` are
    column names — the test is assembled as a SQL expression because
    the column-shift form of shiftleft is parser-only."""
    tests = []
    for seed in range(k_hashes):
        pos = f"pmod(xxhash64({key}, {seed}), {m_bits})"
        tests.append(
            f"(element_at({bloom}, CAST({pos} DIV 64 AS INT) + 1)"
            f" & shiftleft(CAST(1 AS BIGINT), CAST({pos} % 64 AS INT))) != 0"
        )
    return F.expr(" AND ".join(tests))


def bloom_prefilter_join(
    probe: DataFrame,
    build: DataFrame,
    probe_key: str,
    build_key: str,
    m_bits: int = 1 << 16,
    k_hashes: int = 5,
    how: str = "inner",
) -> DataFrame:
    """probe ⋈ build with a broadcast bloom prefilter on the probe side.

    Result-identical to ``probe.join(build, on, how)`` for inner/semi
    joins — the bloom only removes rows that provably cannot match;
    survivors still pass through the exact join, which eliminates the
    false positives. Outer join types are rejected: the prefilter
    drops unmatched probe rows before the join, which would silently
    change left/full outer results.

    xxhash64 is type-sensitive (an int and a bigint holding the same
    value hash differently), so mismatched key dtypes are widened to a
    common type for HASHING only — the join itself and the output
    columns keep their original types. Non-widenable mismatches raise
    rather than returning silent false negatives.
    """
    if how not in ("inner", "semi", "leftsemi", "left_semi"):
        raise ValueError(
            f"bloom_prefilter_join supports inner/left_semi joins, got {how!r}"
        )
    probe_t = dict(probe.dtypes)[probe_key]
    build_t = dict(build.dtypes)[build_key]
    int_types = ("tinyint", "smallint", "int", "bigint")
    if probe_t == build_t:
        hash_t = None
    elif probe_t in int_types and build_t in int_types:
        hash_t = "bigint"
    elif probe_t in ("float", "double") and build_t in ("float", "double"):
        hash_t = "double"
    else:
        raise ValueError(
            f"bloom_prefilter_join key dtypes differ and are not widenable: "
            f"probe {probe_key}: {probe_t} vs build {build_key}: {build_t}"
        )
    build_hash_col = (
        build_key if hash_t is None else f"CAST({build_key} AS {hash_t})"
    )
    probe_hash_col = (
        probe_key if hash_t is None else f"CAST({probe_key} AS {hash_t})"
    )
    bitmap_col = "__bloom_prefilter_bitmap__"  # never collides with user columns
    bloom = bloom_build(
        build.selectExpr(f"{build_hash_col} AS {build_key}"),
        build_key,
        m_bits,
        k_hashes,
    ).withColumnRenamed("bloom", bitmap_col)
    filtered = probe.join(F.broadcast(bloom), how="cross").filter(
        bloom_might_contain(probe_hash_col, bitmap_col, m_bits, k_hashes)
    ).drop(bitmap_col)
    if probe_key == build_key:
        # name-based join collapses the key to ONE output column —
        # matching the documented probe.join(build, key, how)
        # equivalence (an expression join would keep both same-named
        # columns and poison downstream by-name references)
        return filtered.join(build, probe_key, how)
    return filtered.join(build, filtered[probe_key] == build[build_key], how)
