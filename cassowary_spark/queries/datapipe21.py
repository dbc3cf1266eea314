"""Round-6 wave 23 (SURVEY.md §2): experimentation and marketing
measurement — delta-method confidence intervals for ratio metrics
(with minimum detectable effect), and U-shaped multi-touch
attribution.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from cassowary_spark.exprs import sql_srnd, srnd
from cassowary_spark.registry import query
from cassowary_spark.tables import load_table

# ------------------------- C133 delta-method CI for a ratio metric

_Z975 = "1.959963984540054"
_Z80 = "0.8416212335729143"


@query(
    "q_delta_method_ci",
    oracle=f"""
    WITH per_cust AS (
        SELECT c.c_mktsegment AS seg,
               CAST(sum(CAST(floor(o.o_totalprice + 0.5) AS BIGINT))
                    AS BIGINT) AS x,
               CAST(count(*) AS BIGINT) AS y
        FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        GROUP BY c.c_custkey, c.c_mktsegment
    ),
    s AS (
        SELECT seg, CAST(count(*) AS BIGINT) AS n,
               CAST(sum(x) AS BIGINT) AS sx,
               CAST(sum(y) AS BIGINT) AS sy,
               CAST(sum(x * x) AS BIGINT) AS sxx,
               CAST(sum(y * y) AS BIGINT) AS syy,
               CAST(sum(x * y) AS BIGINT) AS sxy
        FROM per_cust GROUP BY 1
    ),
    a AS (
        SELECT seg, n, sx, sy,
               CAST(sx AS DOUBLE) / CAST(sy AS DOUBLE) AS r,
               (CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE)
                * CAST(sx AS DOUBLE) / CAST(n AS DOUBLE))
                   / (CAST(n AS DOUBLE) - 1.0) AS vx,
               (CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE)
                * CAST(sy AS DOUBLE) / CAST(n AS DOUBLE))
                   / (CAST(n AS DOUBLE) - 1.0) AS vy,
               (CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE)
                * CAST(sy AS DOUBLE) / CAST(n AS DOUBLE))
                   / (CAST(n AS DOUBLE) - 1.0) AS cxy,
               CAST(sy AS DOUBLE) / CAST(n AS DOUBLE) AS ybar
        FROM s
    ),
    b AS (
        SELECT seg, n, r,
               sqrt((vx - 2.0 * r * cxy + r * r * vy)
                    / (ybar * ybar) / CAST(n AS DOUBLE)) AS se
        FROM a
    )
    SELECT seg, n,
           {sql_srnd("r", 6)} AS ratio,
           {sql_srnd("se", 6)} AS se,
           {sql_srnd(f"r - {_Z975} * se", 6)} AS ci_lo,
           {sql_srnd(f"r + {_Z975} * se", 6)} AS ci_hi,
           {sql_srnd(
               f"({_Z975} + {_Z80}) * se * sqrt(2.0"
               " * CAST(n AS DOUBLE)) / sqrt(CAST(n AS DOUBLE)) / r",
               6)} AS mde_rel
    FROM b
    """,
)
def q_delta_method_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Delta-method CI for a ratio metric (C133): revenue-per-order
    by market segment, where the unit of randomization is the
    CUSTOMER — the metric is Σx/Σy over per-customer (revenue, order
    count) pairs, so naive per-order variance is wrong (orders within
    a customer are correlated). The delta method linearizes:
    Var(R) ≈ (σx² − 2R·σxy + R²·σy²) / (ȳ²·n) — the standard
    experimentation-platform treatment of ratio metrics, extending
    C76's binary A/B z-test to continuous ratios. Also reports the
    relative two-arm minimum detectable effect at α=0.05, power=0.8:
    MDE = (z.975 + z.80)·σ_R·√(2/n)/R with σ_R = se·√n — the "is
    this experiment even worth running at this n" number.

    Determinism: per-customer x (integer dollars; Σx² ≈ 6.8e15 at
    sf0.1 — documented BIGINT headroom) and y (order count) make all
    six sufficient statistics exact BIGINT sums in any order; the
    CI/MDE assembly is one fixed IEEE sequence with z-constants as
    shared literals, srnd6.

    Scale shape: one broadcast-dim join, a per-customer partial agg,
    then a 5-key partial agg over its output — two shuffles, both
    map-side combinable; everything after is arithmetic over 5 rows.
    """
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    dollars = F.floor(F.col("o_totalprice") + 0.5).cast("long")
    per_cust = (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("c_custkey", F.col("c_mktsegment").alias("seg"))
        .agg(
            F.sum(dollars).alias("x"),
            F.count("*").cast("long").alias("y"),
        )
    )
    s = per_cust.groupBy("seg").agg(
        F.count("*").cast("long").alias("n"),
        F.sum("x").cast("long").alias("sx"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx"),
        F.sum(F.col("y") * F.col("y")).cast("long").alias("syy"),
        F.sum(F.col("x") * F.col("y")).cast("long").alias("sxy"),
    )
    nd = F.col("n").cast("double")
    sx, sy = F.col("sx").cast("double"), F.col("sy").cast("double")
    r = sx / sy
    vx = (F.col("sxx").cast("double") - sx * sx / nd) / (nd - 1.0)
    vy = (F.col("syy").cast("double") - sy * sy / nd) / (nd - 1.0)
    cxy = (F.col("sxy").cast("double") - sx * sy / nd) / (nd - 1.0)
    ybar = sy / nd
    se = F.sqrt((vx - 2.0 * r * cxy + r * r * vy) / (ybar * ybar) / nd)
    z975, z80 = float(_Z975), float(_Z80)
    a = s.select(
        "seg", "n", r.alias("r"), se.alias("se")
    )
    return a.select(
        "seg",
        "n",
        srnd(F.col("r"), 6).alias("ratio"),
        srnd(F.col("se"), 6).alias("se"),
        srnd(F.col("r") - z975 * F.col("se"), 6).alias("ci_lo"),
        srnd(F.col("r") + z975 * F.col("se"), 6).alias("ci_hi"),
        srnd(
            (z975 + z80)
            * F.col("se")
            * F.sqrt(2.0 * F.col("n").cast("double"))
            / F.sqrt(F.col("n").cast("double"))
            / F.col("r"),
            6,
        ).alias("mde_rel"),
    )


# ----------------------- C134 U-shaped multi-touch attribution

_MTA_WINDOW_DAYS = 7
_MTA_TOUCH_TYPES = ("click", "view", "signup")


@query(
    "q_multi_touch_attribution",
    oracle=f"""
    WITH purchases AS (
        -- date_trunc to MICROSECONDS: the parquet carries ns
        -- timestamps, which DuckDB reads at ns while Spark truncates
        -- to us -- untruncated raw-ts comparisons would disagree at
        -- sub-us boundaries
        SELECT event_id AS pid, user_id,
               date_trunc('microseconds', ts) AS pt,
               CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS v_cents
        FROM events WHERE event_type = 'purchase'
    ),
    touches AS (
        SELECT event_id AS tid, user_id,
               date_trunc('microseconds', ts) AS tt, event_type
        FROM events
        WHERE event_type IN ('click', 'view', 'signup')
    ),
    paired AS (
        SELECT p.pid, p.v_cents, t.tid, t.event_type,
               row_number() OVER (PARTITION BY p.pid
                   ORDER BY t.tt, t.tid) AS rn,
               count(*) OVER (PARTITION BY p.pid) AS k
        FROM purchases p
        JOIN touches t
          ON t.user_id = p.user_id
         AND t.tt < p.pt
         AND t.tt >= p.pt - INTERVAL {_MTA_WINDOW_DAYS} DAY
    ),
    credited AS (
        SELECT event_type,
               CAST(floor(CAST(v_cents AS DOUBLE) * (
                   CASE
                       WHEN k = 1 THEN 1.0
                       WHEN k = 2 THEN 0.5
                       WHEN rn = 1 OR rn = k THEN 0.4
                       ELSE 0.2 / (CAST(k AS DOUBLE) - 2.0)
                   END) * 10000.0 + 0.5) AS BIGINT) AS credit4
        FROM paired
    )
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_credits,
           {sql_srnd(
               "CAST(CAST(sum(credit4) AS BIGINT) AS DOUBLE)"
               " / 1000000.0", 4)} AS attr_value
    FROM credited GROUP BY 1
    """,
)
def q_multi_touch_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U-shaped multi-touch attribution (C134): each purchase's value
    is split across the user's click/view/signup touches in the
    prior 7 days — 40% to the first touch, 40% to the last, the
    remaining 20% split evenly among the middles (1 touch → 100%,
    2 → 50/50) — position-based credit where C61's last-touch gives
    the final click everything. Reported as attributed value per
    touch type: the marketing-mix question "which interaction type
    actually drives purchases".

    Determinism: touch order within a purchase is (ts, event_id) —
    unambiguous; weights are exact rationals in a fixed CASE; each
    credit is one fixed IEEE product quantized to an exact
    1e-4-cent-scaled BIGINT before the per-type sum (order-free);
    the output divides exact integers.

    Scale shape: the purchase×touch pairing is an equi-join on
    user_id with a time-band predicate — per-user bounded, the C11
    range-join discipline (skewed hot users → AQE/salting); both
    window passes (rank, count) share the per-purchase partition
    key, ONE sort; the final agg is bounded by the touch-type
    vocabulary. Window length, not corpus size, bounds the fanout.
    """
    ev = load_table(spark, sf_dir, "events")
    cents = F.floor(F.col("value") * 100.0 + 0.5).cast("long")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("pid"),
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("pt"),
        cents.alias("v_cents"),
    )
    touches = ev.filter(
        F.col("event_type").isin(list(_MTA_TOUCH_TYPES))
    ).select(
        F.col("event_id").alias("tid"),
        F.col("user_id").alias("t_user"),
        F.col("ts").alias("tt"),
        "event_type",
    )
    paired = purchases.join(
        touches,
        (F.col("t_user") == F.col("p_user"))
        & (F.col("tt") < F.col("pt"))
        & (
            F.col("tt")
            >= F.col("pt") - F.expr(f"INTERVAL {_MTA_WINDOW_DAYS} DAYS")
        ),
    )
    wp = Window.partitionBy("pid")
    paired = paired.select(
        "pid",
        "v_cents",
        "event_type",
        F.row_number().over(wp.orderBy("tt", "tid")).alias("rn"),
        F.count("*").over(wp).alias("k"),
    )
    weight = (
        F.when(F.col("k") == 1, F.lit(1.0))
        .when(F.col("k") == 2, F.lit(0.5))
        .when((F.col("rn") == 1) | (F.col("rn") == F.col("k")), F.lit(0.4))
        .otherwise(F.lit(0.2) / (F.col("k").cast("double") - 2.0))
    )
    credited = paired.select(
        "event_type",
        F.floor(F.col("v_cents").cast("double") * weight * 1e4 + 0.5)
        .cast("long")
        .alias("credit4"),
    )
    return credited.groupBy("event_type").agg(
        F.count("*").cast("long").alias("n_credits"),
        srnd(
            F.sum("credit4").cast("long").cast("double") / 1e6, 4
        ).alias("attr_value"),
    )
