"""Join surface (SURVEY.md §2 B5–B13).

Catalyst picks the physical join (broadcast-hash / shuffle-hash /
sort-merge); we hint `F.broadcast` on dims that stay small at ANY
scale (region=5, nation=25, per-type range tables) so a 100 TB fact
side never shuffles for them. AQE handles skew splitting and converts
to broadcast at runtime when a filtered side turns out small.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cassowary_spark.operators.asof import asof_join
from cassowary_spark.exprs import srnd
from cassowary_spark.registry import query
from cassowary_spark.tables import load_table


@query(
    "q_join_inner",
    oracle="""
    SELECT c.c_mktsegment,
           count(*)                                                   AS n_lineitems,
           floor((sum(l.l_extendedprice * (1 - l.l_discount))) * 100.0 + 0.5) / 100.0      AS revenue
    FROM lineitem l
    JOIN orders o   ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    GROUP BY c.c_mktsegment
    """,
)
def q_join_inner(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inner equi-join chain fact→orders→customer (B5, B10).

    lineitem⋈orders is a co-keyed shuffle join (both sides huge at
    scale); customer is the smaller side — AQE broadcast-converts it
    after the o_custkey filter stage when it fits.
    """
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("n_lineitems"),
            srnd(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"),
        )
    )


@query(
    "q_join_outer",
    oracle="""
    SELECT c.c_custkey, c.c_mktsegment,
           count(o.o_orderkey)                        AS n_orders,
           floor((coalesce(sum(o.o_totalprice), 0)) * 100.0 + 0.5) / 100.0 AS total_spend
    FROM customer c
    LEFT JOIN orders o ON c.c_custkey = o.o_custkey
    GROUP BY c.c_custkey, c.c_mktsegment
    """,
)
def q_join_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left outer join preserving order-less customers (B6)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey", "c_mktsegment")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            srnd(F.coalesce(F.sum("o_totalprice"), F.lit(0.0)), 2).alias("total_spend"),
        )
    )


@query(
    "q_join_semi",
    oracle="""
    SELECT c_custkey, c_name
    FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'P')
    """,
)
def q_join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left semi join = EXISTS (B7); probe side never duplicates rows."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "P")
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select("c_custkey", "c_name")


@query(
    "q_join_anti",
    oracle="""
    SELECT c_custkey, c_mktsegment
    FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'P')
    """,
)
def q_join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left anti join = NOT EXISTS (B8): customers with no pending
    orders. (Every customer has *some* order at sf0.01, so the anti is
    against the P-status subset — 56 rows, a non-trivial result.)"""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "P")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select("c_custkey", "c_mktsegment")


@query(
    "q_join_theta",
    oracle="""
    SELECT a.n_nationkey AS nk_a, b.n_nationkey AS nk_b,
           a.n_name AS name_a, b.n_name AS name_b
    FROM nation a JOIN nation b
      ON a.n_nationkey < b.n_nationkey AND a.n_regionkey = b.n_regionkey
    """,
)
def q_join_theta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theta join: same-region nation pairs via inequality (B9).

    Equi component (regionkey) keys the join; the inequality is a
    post-condition — so this stays a hash join, not a nested loop.
    """
    n = load_table(spark, sf_dir, "nation")
    a = n.alias("a")
    b = n.alias("b")
    return a.join(
        b,
        (F.col("a.n_nationkey") < F.col("b.n_nationkey"))
        & (F.col("a.n_regionkey") == F.col("b.n_regionkey")),
    ).select(
        F.col("a.n_nationkey").alias("nk_a"),
        F.col("b.n_nationkey").alias("nk_b"),
        F.col("a.n_name").alias("name_a"),
        F.col("b.n_name").alias("name_b"),
    )


@query(
    "q_join_range",
    oracle="""
    WITH ranges AS (
        SELECT event_type AS range_type,
               min(ts)                     AS lo,
               min(ts) + INTERVAL 7 DAY    AS hi
        FROM events GROUP BY event_type
    )
    SELECT r.range_type, count(*) AS n_in_range,
           floor((sum(e.value)) * 10000.0 + 0.5) / 10000.0 AS sum_value
    FROM events e JOIN ranges r ON e.ts >= r.lo AND e.ts < r.hi
    GROUP BY r.range_type
    """,
)
def q_join_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range/interval join: event ts ∈ [lo, hi) buckets (B11).

    The ranges side is tiny (one row per event type) and broadcast, so
    the non-equi condition evaluates map-side — no shuffle of the fact
    stream, which is the only formulation that survives 100 TB.
    """
    ev = load_table(spark, sf_dir, "events")
    ranges = ev.groupBy(F.col("event_type").alias("range_type")).agg(
        F.min("ts").alias("lo"),
        (F.min("ts") + F.expr("INTERVAL 7 DAY")).alias("hi"),
    )
    return (
        ev.join(F.broadcast(ranges), (ev.ts >= ranges.lo) & (ev.ts < ranges.hi))
        .groupBy("range_type")
        .agg(
            F.count("*").alias("n_in_range"),
            srnd(F.sum("value"), 4).alias("sum_value"),
        )
    )


@query(
    "q_join_asof",
    oracle="""
    SELECT e.event_id, e.user_id,
           (SELECT max(s.ts) FROM events s
            WHERE s.user_id = e.user_id AND s.event_type = 'signup'
              AND s.ts <= e.ts) AS asof_ts
    FROM events e
    WHERE e.event_type <> 'signup'
    """,
)
def q_join_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: latest signup at-or-before each event (B12).

    Uses the union-merge formulation (operators/asof.py): ONE shuffle
    on user_id vs the quadratic naive range join.
    """
    ev = load_table(spark, sf_dir, "events")
    facts = ev.filter(F.col("event_type") != "signup")
    signups = ev.filter(F.col("event_type") == "signup")
    joined = asof_join(
        facts,
        signups.select("user_id", "ts"),
        on=["user_id"],
        fact_ts="ts",
        dim_ts="ts",
        dim_value_cols=["ts"],
    )
    return joined.select("event_id", "user_id", F.col("asof_ts").alias("asof_ts"))


@query(
    "q_star_join",
    oracle="""
    SELECT r.r_name, p.p_brand,
           count(*)                                              AS n_items,
           floor((sum(CAST(floor(l.l_extendedprice
                                 * (1 - l.l_discount) * 10000.0 + 0.5)
                           AS BIGINT)) / 10000.0) * 100.0 + 0.5)
               / 100.0 AS revenue
    FROM lineitem l
    JOIN orders o   ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey  = c.c_custkey
    JOIN nation n   ON c.c_nationkey = n.n_nationkey
    JOIN region r   ON n.n_regionkey = r.r_regionkey
    JOIN part p     ON l.l_partkey   = p.p_partkey
    WHERE o.o_orderstatus = 'F' AND p.p_size < 20
    GROUP BY r.r_name, p.p_brand
    """,
)
def q_star_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-way star join over the full dimension graph (B13).

    region/nation are broadcast unconditionally (fixed cardinality at
    any SF); customer/part broadcast via AQE once filters reduce them.
    The only unavoidable big shuffle is lineitem⋈orders.

    Revenue quantizes each row's discounted price to exact 1e-4-unit
    BIGINTs BEFORE the sum (prices carry 2 decimals, discounts 2 —
    the product is exact in 4), so the aggregate is order-independent
    at any scale: the raw double sum drifted a cent between engines
    at sf1 (caught by the r11 sf1 parity probe). Headroom ~9e9 rows
    per group at 1e5-$ prices; beyond that the unit sum widens to
    DECIMAL, the C122 discipline.
    """
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_size") < 20)
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .join(p, li.l_partkey == p.p_partkey)
        .groupBy("r_name", "p_brand")
        .agg(
            F.count("*").alias("n_items"),
            srnd(
                F.sum(
                    F.floor(
                        F.col("l_extendedprice")
                        * (1 - F.col("l_discount"))
                        * 10000.0
                        + 0.5
                    ).cast("long")
                )
                / 10000.0,
                2,
            ).alias("revenue"),
        )
    )


@query(
    "q_join_skew",
    oracle="""
    SELECT s.s_nationkey,
           count(*) AS n_lineitems,
           floor((sum(l.l_extendedprice)) * 100.0 + 0.5) / 100.0 AS sum_price
    FROM lineitem l JOIN supplier s ON l.l_suppkey = s.s_suppkey
    GROUP BY s.s_nationkey
    """,
)
def q_join_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted (skew-spread) equi-join (B5 under skew; SCALE.md).

    The explicit 8-way salt spreads any hot l_suppkey over 8 tasks by
    replicating the supplier side per salt — the deterministic skew
    mitigation for when AQE's runtime splitting can't apply (non-SMJ
    plans, or a known-hot key pinned ahead of time). Results are
    byte-identical to the unsalted join, which is exactly what the
    oracle checks.
    """
    from cassowary_spark.operators.skew import salted_join

    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    return (
        salted_join(li, s, "l_suppkey", "s_suppkey", salts=8)
        .groupBy("s_nationkey")
        .agg(
            F.count("*").alias("n_lineitems"),
            srnd(F.sum("l_extendedprice"), 2).alias("sum_price"),
        )
    )


@query(
    "q_fuzzy_join",
    oracle="""
    SELECT levenshtein(a.s_name, b.s_name) AS distance,
           count(*) AS n_pairs
    FROM supplier a JOIN supplier b ON a.s_suppkey < b.s_suppkey
    WHERE levenshtein(a.s_name, b.s_name) <= 2
    GROUP BY distance
    """,
)
def q_fuzzy_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy (edit-distance) self-join on supplier names (B11-adjacent
    similarity join): pairs within Levenshtein distance 2, bucketed by
    distance.

    Round 1 ran this as a broadcast nested-loop over all O(n²) pairs —
    the one scale-killer the round-1 audit flagged. Now it uses the
    symmetric-delete blocked join (operators/fuzzy.py): deletion-
    variant explode → equi-join on the 64-bit variant hash → bounded
    levenshtein verify. Recall-lossless at threshold 2 (ed≤2 pairs
    always share a deletion variant — pigeonhole on the edited
    positions), so the oracle is the same exact quadratic SQL; the
    plan has no BroadcastNestedLoopJoin (asserted in tests/test_plans).
    """
    from cassowary_spark.operators.fuzzy import fuzzy_self_join

    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    pairs = fuzzy_self_join(s, key_col="s_suppkey", str_col="s_name", k=2)
    return pairs.groupBy("distance").agg(F.count("*").alias("n_pairs"))


@query(
    "q_bloom_join",
    oracle="""
    SELECT l.l_returnflag,
           count(*) AS n_items,
           floor((sum(l.l_extendedprice)) * 100.0 + 0.5) / 100.0 AS sum_price
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    WHERE o.o_totalprice > 450000
    GROUP BY l.l_returnflag
    """,
)
def q_bloom_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter pre-filtered join (B13f, operators/bloom.py):
    lineitem ⋈ high-value orders with a broadcast bitmap prefilter.

    The selective orders predicate (~10% of keys) is aggregated into a
    64 Kbit bloom; the probe drops non-matching lineitems row-locally
    BEFORE the join shuffle. False positives are eliminated by the
    exact join behind the filter, so the result — and the oracle — is
    the plain join's. At 100 TB this is the difference between
    shuffling the whole fact table and shuffling ~the matching rows;
    the bitmap build shuffles at most m/64 = 1024 longs no matter how
    big the build side is. tests/test_bloom.py asserts the no-false-
    negative invariant and the prefilter's selectivity on this plan.
    """
    from cassowary_spark.operators.bloom import bloom_prefilter_join

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_returnflag", "l_extendedprice"
    )
    hot = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_totalprice") > 450000)
        .select("o_orderkey")
    )
    joined = bloom_prefilter_join(li, hot, "l_orderkey", "o_orderkey")
    return joined.groupBy("l_returnflag").agg(
        F.count("*").alias("n_items"),
        srnd(F.sum("l_extendedprice"), 2).alias("sum_price"),
    )


@query(
    "q_join_nullsafe",
    oracle="""
    WITH a AS (
        SELECT NULLIF(l_returnflag, 'N') AS k, count(*) AS n_small
        FROM lineitem WHERE l_quantity < 25.0 GROUP BY 1
    ),
    b AS (
        SELECT NULLIF(l_returnflag, 'N') AS k, count(*) AS n_large
        FROM lineitem WHERE l_quantity >= 25.0 GROUP BY 1
    )
    SELECT coalesce(a.k, '<null>') AS flag, a.n_small, b.n_large
    FROM a JOIN b ON a.k IS NOT DISTINCT FROM b.k
    """,
)
def q_join_nullsafe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe equality join (B-family): `<=>` / IS NOT DISTINCT
    FROM — the join where NULL matches NULL exactly once instead of
    matching nothing. The nullable key is NULLIF(l_returnflag, 'N'),
    so the NULL bucket is real data ('N' lines), and a plain `=` join
    would silently drop it — the row this query exists to keep.

    Scale shape: `<=>` is a plain hash-joinable equality to Spark
    (EqualNullSafe is a valid hash key) — same single-shuffle
    sort-merge/broadcast plans as `=`, no null-bucket skew surprise
    here because each side pre-aggregates to ≤3 rows first.
    """
    li = load_table(spark, sf_dir, "lineitem")
    k = F.nullif(F.col("l_returnflag"), F.lit("N")).alias("k")
    a = li.filter(F.col("l_quantity") < 25.0).groupBy(k).agg(
        F.count("*").alias("n_small")
    )
    b = li.filter(F.col("l_quantity") >= 25.0).groupBy(k).agg(
        F.count("*").alias("n_large")
    )
    return a.join(b, a["k"].eqNullSafe(b["k"])).select(
        F.coalesce(a["k"], F.lit("<null>")).alias("flag"),
        "n_small",
        "n_large",
    )
