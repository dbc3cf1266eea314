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

    Scale shape: ONE user-keyed aggregation collects each user's
    per-stage timestamp lists (bounded by per-user activity), and the
    depth test runs row-locally with higher-order functions — the
    earliest-click reduction becomes `transform(signups, s ->
    (s, min in-window click))` and both join-shaped stage confirms
    become array `exists` probes, so the event log is shuffled once
    (user hash) instead of feeding two time-band joins plus three
    distinct/left-join ladders. Exact: pure existence tests over the
    same exact µs timestamps; a qualifying (c, p) pair exists iff one
    exists for the earliest in-window c (r11 reduction, unchanged).
    Hot users → AQE-coalesced single exchange; per-user arrays are
    event-count-bounded, never corpus-bounded.
    """
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", F.col("ts").alias("t")
    )
    # collect_SET, not list (r15 skew guard): every probe below is an
    # exists/array_min over the array, so duplicate timestamps are
    # provably redundant — dedup bounds a hot user's array at their
    # DISTINCT per-stage timestamps and shrinks both the map-side
    # state and the shuffled bytes under event-duplication skew
    # (bot replays, at-least-once ingestion).
    per = ev.groupBy("user_id").agg(
        F.collect_set(
            F.when(F.col("event_type") == "signup", F.col("t"))
        ).alias("ss"),
        F.collect_set(
            F.when(F.col("event_type") == "click", F.col("t"))
        ).alias("cs"),
        F.collect_set(
            F.when(F.col("event_type") == "purchase", F.col("t"))
        ).alias("ps"),
    )
    # earliest-click reduction, row-local: per signup, the EARLIEST
    # in-window click (null when none) — a qualifying (click,
    # purchase) chain exists iff one exists for that earliest click
    iv = f"INTERVAL {_WF_HOURS} HOURS"
    depth = per.select(
        F.when(
            F.expr(
                "exists(transform(ss, s -> named_struct('st', s, 'cm',"
                f" array_min(filter(cs, c -> c > s AND c <= s + {iv})))),"
                " x -> x.cm IS NOT NULL AND"
                f" exists(ps, p -> p > x.cm AND p <= x.st + {iv}))"
            ),
            3,
        )
        .when(
            F.expr(
                "exists(ss, s ->"
                f" exists(cs, c -> c > s AND c <= s + {iv}))"
            ),
            2,
        )
        .when(F.size("ss") > 0, 1)
        .otherwise(0)
        .alias("depth")
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
