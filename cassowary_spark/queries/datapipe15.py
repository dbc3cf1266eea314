"""Round-6 wave 17 (SURVEY.md §2): feature-store and state analytics —
leakage-free point-in-time trailing features, right-censoring-aware
repurchase labels, time-in-state accounting, median imputation, and
bipartite degree distributions.

C113/C114 are the two halves of supervised-training-set assembly over
transactional data: features must look strictly BACKWARD from each
example's timestamp (no leakage), labels strictly FORWARD (no
censoring bias). Both are window ops sharing the entity-keyed shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from cassowary_spark.exprs import sql_srnd, srnd
from cassowary_spark.registry import query
from cassowary_spark.tables import load_table

# ------------------------------- C113 point-in-time trailing features

@query(
    "q_pit_features",
    oracle=f"""
    WITH t AS (
        SELECT o_custkey,
               date_diff('day', DATE '1990-01-01', o_orderdate) AS d,
               CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT) AS c
        FROM orders
    ),
    f AS (
        SELECT CAST(count(*) OVER w AS BIGINT) AS trailing_n,
               CAST(coalesce(sum(c) OVER w, 0) AS BIGINT) AS trailing_c
        FROM t
        WINDOW w AS (PARTITION BY o_custkey ORDER BY d
                     RANGE BETWEEN 90 PRECEDING AND 1 PRECEDING)
    )
    SELECT trailing_n,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST(sum(trailing_c) AS BIGINT) AS sum_trailing_cents,
           {sql_srnd("sum(trailing_c) * 1.0 / count(*)", 2)}
               AS avg_trailing_cents
    FROM f GROUP BY 1
    """,
)
def q_pit_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time trailing features (C113): for every order, the
    customer's order count and revenue over the STRICTLY PRIOR 90
    days — the feature-store computation for training examples, where
    a frame that included the current day would leak the label into
    the features. Rolled up into a trailing-count histogram so the
    audit (how many examples have how much history) is the output.

    Determinism: day index is an integer date diff, so the RANGE
    frame [−90, −1] is integer-bounded and excludes same-day peers
    identically in both engines (distance 0 ∉ [−90,−1] — the
    same-day-exclusion leak guard is part of the frame, not a
    filter); trailing sums are exact BIGINT cents.

    Scale shape: ONE custkey-partitioned window with an incremental
    RANGE frame (both bounds move forward monotonically — Spark's
    sliding frame, O(n) per partition) computes both features; the
    histogram is a small-key partial agg. Per-customer row counts
    bound partition size; no global sort, no self-join (the naive
    formulation is an O(n²) self-join on cust × date range).
    """
    o = load_table(spark, sf_dir, "orders")
    t = o.select(
        "o_custkey",
        F.datediff(
            F.col("o_orderdate"), F.to_date(F.lit("1990-01-01"))
        ).alias("d"),
        F.floor(F.col("o_totalprice") * 100.0 + 0.5).cast("long").alias("c"),
    )
    w = Window.partitionBy("o_custkey").orderBy("d").rangeBetween(-90, -1)
    f = t.select(
        F.count("*").over(w).cast("long").alias("trailing_n"),
        F.coalesce(F.sum("c").over(w), F.lit(0))
        .cast("long")
        .alias("trailing_c"),
    )
    return f.groupBy("trailing_n").agg(
        F.count("*").cast("long").alias("n_orders"),
        F.sum("trailing_c").cast("long").alias("sum_trailing_cents"),
        srnd(F.sum("trailing_c") * 1.0 / F.count("*"), 2).alias(
            "avg_trailing_cents"
        ),
    )


# ----------------------------------- C114 repurchase (churn) labels

@query(
    "q_churn_label",
    oracle=f"""
    WITH cz AS (SELECT max(o_orderdate) AS censor FROM orders),
    t AS (
        SELECT o_custkey, o_orderkey, o_orderdate,
               lead(o_orderdate) OVER (PARTITION BY o_custkey
                   ORDER BY o_orderdate, o_orderkey) AS nxt
        FROM orders
    ),
    lab AS (
        SELECT strftime(o_orderdate, '%Y-%m') AS month,
               CASE WHEN nxt IS NOT NULL
                         AND date_diff('day', o_orderdate, nxt) <= 90
                    THEN 1 ELSE 0 END AS y
        FROM t CROSS JOIN cz
        WHERE date_diff('day', o_orderdate, censor) >= 90
    ),
    per AS (
        SELECT month, CAST(count(*) AS BIGINT) AS n_orders,
               CAST(sum(y) AS BIGINT) AS n_repurchase
        FROM lab GROUP BY 1
    )
    SELECT month, n_orders, n_repurchase,
           {sql_srnd("n_repurchase * 1.0 / n_orders", 6)}
               AS repurchase_rate
    FROM per
    """,
)
def q_churn_label(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repurchase/churn labels (C114): for each order, did the same
    customer order again within 90 days — the forward-looking label
    paired with C113's backward-looking features. Orders less than 90
    days before the censor date are EXCLUDED (their label window is
    still open; keeping them would teach the model that recent
    customers churn — the right-censoring bias C103 corrects in
    aggregate form). Emitted as a per-month label-rate audit.

    Determinism: the next-order anchor is lead() over a totally
    ordered (date, orderkey) sequence; maturity and label cuts are
    integer day diffs; one srnd'd rate per month.

    Scale shape: one custkey-partitioned lead() window (same shuffle
    family as C113 — in a combined training-set job the two share
    one exchange), a 1-row censor broadcast, then a calendar-keyed
    partial agg. No joins against the fact table.
    """
    o = load_table(spark, sf_dir, "orders")
    cz = o.agg(F.max("o_orderdate").alias("censor"))
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    t = o.withColumn("nxt", F.lead("o_orderdate").over(w))
    lab = (
        t.crossJoin(F.broadcast(cz))
        .filter(F.datediff("censor", "o_orderdate") >= 90)
        .select(
            F.date_format("o_orderdate", "yyyy-MM").alias("month"),
            F.when(
                F.col("nxt").isNotNull()
                & (F.datediff("nxt", "o_orderdate") <= 90),
                1,
            )
            .otherwise(0)
            .alias("y"),
        )
    )
    per = lab.groupBy("month").agg(
        F.count("*").cast("long").alias("n_orders"),
        F.sum("y").cast("long").alias("n_repurchase"),
    )
    return per.select(
        "month",
        "n_orders",
        "n_repurchase",
        srnd(F.col("n_repurchase") * 1.0 / F.col("n_orders"), 6).alias(
            "repurchase_rate"
        ),
    )


# ------------------------------------------ C115 time in state

@query(
    "q_time_in_state",
    oracle=f"""
    WITH t AS (
        SELECT event_type, ts,
               lead(ts) OVER (PARTITION BY user_id
                              ORDER BY ts, event_id) AS nxt
        FROM events
    ),
    d AS (
        SELECT event_type AS state,
               date_diff('second', ts, nxt) AS dur_s
        FROM t WHERE nxt IS NOT NULL
    ),
    per AS (
        SELECT state, CAST(count(*) AS BIGINT) AS n_intervals,
               CAST(sum(dur_s) AS BIGINT) AS total_s,
               CAST(max(dur_s) AS BIGINT) AS max_s
        FROM d GROUP BY 1
    )
    SELECT state, n_intervals, total_s, max_s,
           {sql_srnd("total_s * 1.0 / n_intervals", 4)} AS avg_s
    FROM per
    """,
)
def q_time_in_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-in-state accounting (C115): treating each user's event
    stream as a state machine (the event marks entry into its state
    until the next event), the total/average/max dwell time per
    state — the engagement-accounting view behind session analysis:
    C23 cuts sessions, C87 times one funnel path, this accounts for
    EVERY state's occupancy. Terminal events (no successor) hold no
    measurable dwell and are excluded.

    Determinism: successor via lead() over the totally ordered
    (ts, event_id) stream; dwell is the integer second-boundary diff
    (identical to the unix_timestamp subtraction — the C87 idiom);
    sums/max are exact BIGINT.

    Scale shape: one user-keyed lead() window (incremental frame),
    then a state-keyed partial agg over ~5 keys. The event payload
    (props) is pruned at the scan; only (user, ts, type, id) shuffle.
    """
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    t = ev.select("event_type", "ts", F.lead("ts").over(w).alias("nxt"))
    d = t.filter(F.col("nxt").isNotNull()).select(
        F.col("event_type").alias("state"),
        (F.unix_timestamp("nxt") - F.unix_timestamp("ts"))
        .cast("long")
        .alias("dur_s"),
    )
    per = d.groupBy("state").agg(
        F.count("*").cast("long").alias("n_intervals"),
        F.sum("dur_s").cast("long").alias("total_s"),
        F.max("dur_s").cast("long").alias("max_s"),
    )
    return per.select(
        "state",
        "n_intervals",
        "total_s",
        "max_s",
        srnd(F.col("total_s") * 1.0 / F.col("n_intervals"), 4).alias(
            "avg_s"
        ),
    )


# ---------------------------------------- C116 median imputation

@query(
    "q_impute_median",
    oracle=f"""
    WITH c AS (
        SELECT c_mktsegment AS segment,
               CAST(floor(c_acctbal * 100.0 + 0.5) AS BIGINT) AS cents,
               CASE WHEN c_acctbal < 0 THEN 1 ELSE 0 END AS miss
        FROM customer
    ),
    per AS (
        SELECT segment,
               CAST(count(*) AS BIGINT) AS n_rows,
               CAST(sum(miss) AS BIGINT) AS n_missing,
               CAST(floor(quantile_cont(CASE WHEN miss = 0 THEN cents END,
                                        0.5) + 0.5) AS BIGINT) AS median_c,
               CAST(sum(CASE WHEN miss = 0 THEN cents ELSE 0 END)
                    AS BIGINT) AS sum_ok
        FROM c GROUP BY 1
    )
    SELECT segment, n_rows, n_missing, median_c,
           {sql_srnd("sum_ok * 1.0 / (n_rows - n_missing)", 2)}
               AS mean_observed_cents,
           {sql_srnd("(sum_ok + n_missing * median_c) * 1.0 / n_rows", 2)}
               AS mean_imputed_cents
    FROM per
    """,
)
def q_impute_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Median imputation audit (C116): per segment, treat negative
    account balances as the missing-value sentinel, impute them with
    the segment's observed median, and report observed vs imputed
    means + missing counts — the ML-prep imputation step with its
    before/after audit in one result (silent imputation is how
    training distributions drift).

    Determinism: balances quantized to integer cents; the median is
    the exact interpolated percentile over NON-missing values
    (conditional-NULL input — both engines skip NULLs), half-up
    quantized to integer cents BEFORE the imputed mean so the final
    numerator is an exact BIGINT expression.

    Scale shape: one segment-keyed partial agg computes counts, sums
    and the median together; the imputed mean is arithmetic on the
    agg row — no second pass, no join-back (contrast C109's clip,
    which must touch rows again). approx_percentile swap documented.
    """
    c = load_table(spark, sf_dir, "customer")
    base = c.select(
        F.col("c_mktsegment").alias("segment"),
        F.floor(F.col("c_acctbal") * 100.0 + 0.5).cast("long").alias(
            "cents"
        ),
        F.when(F.col("c_acctbal") < 0, 1).otherwise(0).alias("miss"),
    )
    per = base.groupBy("segment").agg(
        F.count("*").cast("long").alias("n_rows"),
        F.sum("miss").cast("long").alias("n_missing"),
        F.floor(
            F.expr(
                "percentile(CASE WHEN miss = 0 THEN cents END, 0.5)"
            )
            + 0.5
        )
        .cast("long")
        .alias("median_c"),
        F.sum(F.when(F.col("miss") == 0, F.col("cents")).otherwise(0))
        .cast("long")
        .alias("sum_ok"),
    )
    return per.select(
        "segment",
        "n_rows",
        "n_missing",
        "median_c",
        srnd(
            F.col("sum_ok") * 1.0 / (F.col("n_rows") - F.col("n_missing")),
            2,
        ).alias("mean_observed_cents"),
        srnd(
            (F.col("sum_ok") + F.col("n_missing") * F.col("median_c"))
            * 1.0
            / F.col("n_rows"),
            2,
        ).alias("mean_imputed_cents"),
    )


# ----------------------------------- C117 bipartite degree histogram

@query(
    "q_degree_distribution",
    oracle=f"""
    WITH edges AS (
        SELECT DISTINCT l.l_partkey, o.o_custkey
        FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
    ),
    deg AS (
        SELECT l_partkey, count(*) AS degree FROM edges GROUP BY 1
    ),
    per AS (
        SELECT CAST(degree AS BIGINT) AS degree,
               CAST(count(*) AS BIGINT) AS n_parts
        FROM deg GROUP BY 1
    ),
    tot AS (SELECT CAST(sum(n_parts) AS BIGINT) AS t FROM per)
    SELECT degree, n_parts,
           {sql_srnd("n_parts * 1.0 / t", 6)} AS pct_parts
    FROM per CROSS JOIN tot
    """,
)
def q_degree_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bipartite degree distribution (C117): how many distinct
    customers each part reaches through orders, histogrammed by
    degree — the graph-shape statistic that predicts co-occurrence
    blowup (C67's pair mining and C41's CC dedup both go quadratic in
    hub degree; this is the audit that finds the hubs first, the
    graph sibling of C108's join-fanout audit).

    Determinism: pure counts end-to-end; one srnd'd share.

    Scale shape: the fact join is keyed on orderkey with a
    column-pruned orders side (two longs); DISTINCT collapses
    (part, cust) edges in a partial-agg shuffle; degree and the
    histogram are two further small aggs. Histogram cardinality is
    bounded by max degree, not part count. At whale-part scale the
    DISTINCT is the cost — exactly the quantity this audit exists to
    surface before a downstream job eats it.
    """
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey"
    )
    # r14: countDistinct folds the former standalone distinct() into
    # the degree agg — Spark plans it as a map-side partial distinct
    # on (partkey, custkey) feeding ONE partkey-keyed exchange, where
    # distinct-then-count paid two exchanges. Identical degrees.
    deg = (
        li.select("l_partkey", "l_orderkey")
        .join(o, li["l_orderkey"] == o["o_orderkey"])
        .groupBy("l_partkey")
        .agg(F.countDistinct("o_custkey").alias("degree"))
    )
    per = deg.groupBy(F.col("degree").cast("long").alias("degree")).agg(
        F.count("*").cast("long").alias("n_parts")
    )
    tot = per.agg(F.sum("n_parts").cast("long").alias("t"))
    return per.crossJoin(F.broadcast(tot)).select(
        "degree",
        "n_parts",
        srnd(F.col("n_parts") * 1.0 / F.col("t"), 6).alias("pct_parts"),
    )
