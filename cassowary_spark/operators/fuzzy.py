"""Blocked fuzzy (edit-distance) self-join — the scale-safe formulation.

Round 1 shipped ``q_fuzzy_join`` as a broadcast nested-loop over all
O(n²) pairs; at 100k names that is 10¹⁰ levenshtein calls. This module
replaces it with a symmetric-delete (SymSpell-style) blocking stage:

  ed(a, b) <= k  ⟹  D≤k(a) ∩ D≤k(b) ≠ ∅

where ``D≤k(s)`` is the set of strings obtained by deleting at most k
characters from ``s`` (delete the ≤k edited positions from each side
and the remainders coincide). So generating every deletion variant and
equi-joining on the variant is **recall-lossless** for threshold k —
unlike prefix or length-band blocking, which the fixture's shared
``Supplier#0…`` prefix would defeat, and unlike positional q-grams,
which miss insert/delete shifts.

Scale shape: the explode is k=2 ⇒ 1 + L + C(L,2) slim rows per name
(L=18 ⇒ 172), each carrying only (key, xxhash64(variant)); the join is
a plain shuffled equi-join on the 64-bit hash, candidates are bounded
by the true near-pair count (names must agree on all but ≤2k chars to
share a variant), and every candidate is verified with the
threshold-bounded levenshtein. Hash collisions only add candidates —
the verify step removes them — never drop pairs. No nested loop, no
broadcast of the full table, no driver collect.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _deletion_variants(col_name: str, k: int) -> Column:
    """Array of all strings formed by deleting ≤k chars from column
    ``col_name`` (a plain column name, substituted into SQL text).

    Pure JVM higher-order functions (transform/sequence/flatten) —
    whole-stage codegen, no Python. Supports k ∈ {0, 1, 2}; k=2 is the
    classic near-duplicate threshold and keeps the variant count at
    O(L²) per string, which for name-length strings is ~10² slim rows.
    """
    if k not in (0, 1, 2):
        raise ValueError(f"deletion-neighborhood blocking supports k<=2, got {k}")
    s = col_name
    parts = [f"array({s})"]
    if k >= 1:
        # drop position i (1-based): s[1..i-1] ++ s[i+1..]
        parts.append(
            f"transform(sequence(1, length({s})), i -> "
            f"concat(substring({s}, 1, i-1), substring({s}, i+1, length({s}))))"
        )
    if k >= 2:
        parts.append(
            f"flatten(transform(sequence(1, greatest(length({s}) - 1, 1)), i -> "
            f"transform(sequence(least(i + 1, length({s})), length({s})), j -> "
            f"concat(substring({s}, 1, i-1), substring({s}, i+1, j-i-1), "
            f"substring({s}, j+1, length({s}))))))"
        )
    return F.expr(f"array_distinct(concat({', '.join(parts)}))")


def fuzzy_self_join(
    df: DataFrame,
    key_col: str,
    str_col: str,
    k: int = 2,
) -> DataFrame:
    """All pairs (a, b) with ``a.key < b.key`` and ``lev(a, b) <= k``.

    Returns columns ``key_a, key_b, name_a, name_b, distance``.

    Stages (all shuffled equi-joins — Catalyst never plans a nested
    loop here):
      1. explode each row into its deletion variants, hashed to 64 bits
         so the variant table is (key, hash) — strings never ride the
         big shuffle (the same slim-rows discipline as the MinHash band
         join in operators/dedup.py);
      2. self equi-join on the variant hash with ``key_a < key_b``;
      3. distinct candidate KEY pairs (a close pair shares up to
         ~L variants, so dedup before anything wide);
      4. re-join the names for the (small) candidate set and verify
         with the threshold-bounded levenshtein (banded DP, O(L·k)
         per pair, -1 past the bound).
    """
    base = df.select(
        F.col(key_col).alias("k"), F.col(str_col).alias("s")
    ).filter(F.col("s").isNotNull())
    ex = base.select(
        "k",
        F.explode(_deletion_variants("s", k)).alias("v"),
    ).select("k", F.xxhash64("v").alias("vh"))
    a, b = ex.alias("a"), ex.alias("b")
    cand = (
        a.join(b, (F.col("a.vh") == F.col("b.vh")) & (F.col("a.k") < F.col("b.k")))
        .select(F.col("a.k").alias("key_a"), F.col("b.k").alias("key_b"))
        .distinct()
    )
    names_a = base.select(F.col("k").alias("key_a"), F.col("s").alias("name_a"))
    names_b = base.select(F.col("k").alias("key_b"), F.col("s").alias("name_b"))
    pairs = cand.join(names_a, "key_a").join(names_b, "key_b")
    lev = F.levenshtein(F.col("name_a"), F.col("name_b"), k)
    return pairs.filter(lev >= 0).withColumn("distance", lev)
