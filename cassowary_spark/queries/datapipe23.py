"""Round-6 wave 25 (SURVEY.md §2): sequential conversion and trend
analytics — time-window funnels (ClickHouse-style windowFunnel) and
trailing rolling-regression slopes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from cassowary_spark.exprs import sql_srnd, srnd
from cassowary_spark.registry import query
from cassowary_spark.tables import load_table

# ------------------------------------- C138 time-window funnel

_WF_HOURS = 24


@query(
    "q_window_funnel",
    oracle=f"""
    WITH ev AS (
        SELECT user_id, event_type,
               date_trunc('microseconds', ts) AS t
        FROM events
    ),
    users AS (SELECT DISTINCT user_id FROM ev),
    d1 AS (SELECT DISTINCT user_id FROM ev WHERE event_type = 'signup'),
    scm AS (
        SELECT s.user_id, s.t AS st, min(c.t) AS cmin
        FROM ev s JOIN ev c
          ON c.user_id = s.user_id AND c.event_type = 'click'
         AND c.t > s.t AND c.t <= s.t + INTERVAL {_WF_HOURS} HOUR
        WHERE s.event_type = 'signup'
        GROUP BY s.user_id, s.t
    ),
    d2 AS (SELECT DISTINCT user_id FROM scm),
    d3 AS (
        SELECT DISTINCT scm.user_id
        FROM scm JOIN ev p
          ON p.user_id = scm.user_id AND p.event_type = 'purchase'
         AND p.t > scm.cmin
         AND p.t <= scm.st + INTERVAL {_WF_HOURS} HOUR
    ),
    depth AS (
        SELECT u.user_id,
               CASE WHEN d3.user_id IS NOT NULL THEN 3
                    WHEN d2.user_id IS NOT NULL THEN 2
                    WHEN d1.user_id IS NOT NULL THEN 1
                    ELSE 0 END AS depth
        FROM users u
        LEFT JOIN d1 ON d1.user_id = u.user_id
        LEFT JOIN d2 ON d2.user_id = u.user_id
        LEFT JOIN d3 ON d3.user_id = u.user_id
    )
    SELECT depth, CAST(count(*) AS BIGINT) AS n_users
    FROM depth GROUP BY 1
    """,
)
def q_window_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-window funnel (C138): per user, the deepest prefix of
    signup → click → purchase completed INSIDE a 24-hour window that
    opens at the signup — ClickHouse's windowFunnel semantics, and a
    strictly harder contract than C52's ordered funnel: there the
    stages may be days apart; here the whole chain must fit the
    window, and ANY signup may open the qualifying window (not just
    the first). Users histogrammed by depth 0-3.

    Determinism: pure existence tests over exact µs timestamps
    (DuckDB date_truncs its ns read to match Spark's scan-time
    truncation); strict/inclusive boundaries are identical on both
    engines; output is integer counts.

    Scale shape: the stage chain is two user-keyed equi-joins with
    time-band predicates over PRE-FILTERED stage slices (each side
    carries only its stage's rows, not the event log), with the
    signup×click pairs collapsed to (signup, EARLIEST in-window
    click) BEFORE the purchase join — an exact reduction (a
    qualifying (c, p) exists iff one exists for the earliest c) that
    keeps per-user fanout quadratic-in-stage-counts instead of
    cubic (r11; the naive triple join exhausted the oracle at sf1).
    The depth sets are semi-join-shaped and user-bounded; all joins
    and distincts share the user hash family; hot users →
    AQE/salting.
    """
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", F.col("ts").alias("t")
    )
    win = F.expr(f"INTERVAL {_WF_HOURS} HOURS")
    s = ev.filter(F.col("event_type") == "signup").select(
        F.col("user_id").alias("su"), F.col("t").alias("st")
    )
    c = ev.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("cu"), F.col("t").alias("ct")
    )
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("pu"), F.col("t").alias("pt")
    )
    users = ev.select("user_id").distinct()
    d1 = s.select(F.col("su").alias("user_id")).distinct().select(
        "user_id", F.lit(1).alias("f1")
    )
    # earliest-click reduction: a (click, purchase) pair inside the
    # window exists iff a purchase follows the EARLIEST in-window
    # click — collapsing signup×click pairs to (signup, min click)
    # BEFORE the purchase join removes the cubic per-user fanout of
    # the naive triple join (the former form exhausted DuckDB temp
    # at sf1)
    scm = (
        s.join(
            c,
            (F.col("cu") == F.col("su"))
            & (F.col("ct") > F.col("st"))
            & (F.col("ct") <= F.col("st") + win),
        )
        .groupBy("su", "st")
        .agg(F.min("ct").alias("cmin"))
    )
    d2 = (
        scm.select(F.col("su").alias("user_id"))
        .distinct()
        .select("user_id", F.lit(1).alias("f2"))
    )
    d3 = (
        scm.join(
            p,
            (F.col("pu") == F.col("su"))
            & (F.col("pt") > F.col("cmin"))
            & (F.col("pt") <= F.col("st") + win),
        )
        .select(F.col("su").alias("user_id"))
        .distinct()
        .select("user_id", F.lit(1).alias("f3"))
    )
    depth = (
        users.join(d1, "user_id", "left")
        .join(d2, "user_id", "left")
        .join(d3, "user_id", "left")
        .select(
            F.when(F.col("f3").isNotNull(), 3)
            .when(F.col("f2").isNotNull(), 2)
            .when(F.col("f1").isNotNull(), 1)
            .otherwise(0)
            .alias("depth")
        )
    )
    return depth.groupBy("depth").agg(
        F.count("*").cast("long").alias("n_users")
    )


# --------------------------------- C139 trailing rolling-regression

_RS_FRAME_DAYS = 14


@query(
    "q_rolling_slope",
    oracle=f"""
    WITH daily AS (
        SELECT event_type,
               date_diff('day', DATE '2024-01-01',
                         CAST(date_trunc('microseconds', ts) AS DATE))
                   AS d,
               CAST(sum(CAST(floor(value * 100.0 + 0.5) AS BIGINT))
                    AS BIGINT) AS v
        FROM events GROUP BY 1, 2
    ),
    framed AS (
        SELECT event_type, d,
               CAST(count(*) OVER w AS BIGINT) AS n,
               CAST(sum(d) OVER w AS BIGINT) AS sx,
               CAST(sum(v) OVER w AS BIGINT) AS sy,
               CAST(sum(d * v) OVER w AS BIGINT) AS sxy,
               CAST(sum(d * d) OVER w AS BIGINT) AS sxx
        FROM daily
        WINDOW w AS (PARTITION BY event_type ORDER BY d
                     RANGE BETWEEN {_RS_FRAME_DAYS - 1} PRECEDING
                           AND CURRENT ROW)
    )
    SELECT event_type, d, n,
           {sql_srnd(
               "CASE WHEN n > 1 THEN"
               " (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)"
               "  - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))"
               " / nullif(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)"
               "  - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE), 0.0)"
               " / 100.0 END", 6)} AS slope_per_day
    FROM framed
    """,
)
def q_rolling_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing rolling-regression slope (C139): for every (event
    type, day), the least-squares slope of daily value over the
    trailing 14 days — B52's REGR_SLOPE made a MOVING diagnostic
    ("is this metric drifting, and since when") instead of one
    whole-history line; the changepoint-adjacent trend monitor
    (C103's CUSUM flags level shifts, this tracks local drift)
    every metrics platform ships. Series-head frames with a single
    point (or zero x-variance) are NULL by guard.

    Determinism: the daily collapse makes x an integer day index and
    y exact cents; all five frame statistics are exact BIGINT sums
    over an integer RANGE frame (identical frame semantics both
    engines — probed); the slope assembly is one fixed IEEE
    sequence, reported in dollars/day.

    Scale shape: the raw scan collapses to a calendar-bounded
    (type × day) agg FIRST (map-side combine), so the five windowed
    sums ride ONE sort of ~150 rows — the frame never touches raw
    events. This is the C122 discipline applied to frames: window
    input size is fixed by the calendar, not the corpus.
    """
    ev = load_table(spark, sf_dir, "events")
    cents = F.floor(F.col("value") * 100.0 + 0.5).cast("long")
    daily = ev.groupBy(
        "event_type",
        F.datediff(
            F.to_date("ts"), F.to_date(F.lit("2024-01-01"))
        ).alias("d"),
    ).agg(F.sum(cents).alias("v"))
    w = (
        Window.partitionBy("event_type")
        .orderBy("d")
        .rangeBetween(-(_RS_FRAME_DAYS - 1), 0)
    )
    framed = daily.select(
        "event_type",
        "d",
        F.count("*").over(w).cast("long").alias("n"),
        F.sum("d").over(w).cast("long").alias("sx"),
        F.sum("v").over(w).cast("long").alias("sy"),
        F.sum(F.col("d") * F.col("v")).over(w).cast("long").alias("sxy"),
        F.sum(F.col("d") * F.col("d")).over(w).cast("long").alias("sxx"),
    )
    nd = F.col("n").cast("double")
    sx, sy = F.col("sx").cast("double"), F.col("sy").cast("double")
    slope = (
        (nd * F.col("sxy").cast("double") - sx * sy)
        / F.nullif(
            nd * F.col("sxx").cast("double") - sx * sx, F.lit(0.0)
        )
        / 100.0
    )
    return framed.select(
        "event_type",
        "d",
        "n",
        srnd(F.when(F.col("n") > 1, slope), 6).alias("slope_per_day"),
    )
