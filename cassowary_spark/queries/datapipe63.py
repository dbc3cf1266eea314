"""Round-12 wave 66 (SURVEY.md §2): the classical-test completion —
Welch's t (C229), Jarque–Bera normality (C230), Levene variance
homogeneity (C231), the G-test (C232), Cramér's V (C233) and
Kendall's τ-b (C234).

These close the inferential-battery gaps around the existing
families: q_anova_f / q_mann_whitney / q_kruskal_wallis compare
locations, C229 adds the unequal-variance two-sample mean test;
C230/C231 test the ASSUMPTIONS (normality, homoscedasticity) that
decide which of those tests is valid; C232/C233 complete the
contingency family (χ² exists; G is its likelihood-ratio twin,
V its effect size); C234 adds the ordinal-association coefficient
Spearman (C168) approximates.

Shared discipline (the r11 overflow/fold rules): every statistic is
assembled from EXACT integer sufficient statistics gathered in one
map-side-combining groupBy (cents/micro-unit quantization where the
metric is a double), the only float steps are fixed IEEE expressions
identical in both engines, small cross-group float sums fold in key
order (C69), and every emitted double is srnd-quantized.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cassowary_spark.exprs import sql_srnd, srnd
from cassowary_spark.registry import query
from cassowary_spark.tables import load_table

# --------------------------------------------- C229 Welch's t-test

_WT_A, _WT_B = "purchase", "click"


@query(
    "q_welch_ttest",
    oracle=f"""
    WITH g AS (
        SELECT event_type,
               CAST(count(*) AS BIGINT) AS n,
               CAST(sum(CAST(floor(value * 100.0 + 0.5) AS BIGINT))
                    AS HUGEINT) AS s,
               CAST(sum(CAST(floor(value * 100.0 + 0.5) AS BIGINT)
                        * CAST(floor(value * 100.0 + 0.5) AS BIGINT))
                    AS HUGEINT) AS q
        FROM events WHERE event_type IN ('{_WT_A}', '{_WT_B}')
        GROUP BY event_type
    ),
    w AS (
        SELECT
            max(CASE WHEN event_type = '{_WT_A}' THEN n END) AS na,
            max(CASE WHEN event_type = '{_WT_B}' THEN n END) AS nb,
            max(CASE WHEN event_type = '{_WT_A}' THEN s END) AS sa,
            max(CASE WHEN event_type = '{_WT_B}' THEN s END) AS sb,
            max(CASE WHEN event_type = '{_WT_A}' THEN q END) AS qa,
            max(CASE WHEN event_type = '{_WT_B}' THEN q END) AS qb
        FROM g
    ),
    t AS (
        SELECT na, nb,
            CAST(sa AS DOUBLE) / CAST(na AS DOUBLE) / 100.0 AS ma,
            CAST(sb AS DOUBLE) / CAST(nb AS DOUBLE) / 100.0 AS mb,
            (CAST(qa AS DOUBLE) / CAST(na AS DOUBLE)
             - (CAST(sa AS DOUBLE) / CAST(na AS DOUBLE))
               * (CAST(sa AS DOUBLE) / CAST(na AS DOUBLE)))
              * CAST(na AS DOUBLE) / (CAST(na AS DOUBLE) - 1.0)
              / 10000.0 AS va,
            (CAST(qb AS DOUBLE) / CAST(nb AS DOUBLE)
             - (CAST(sb AS DOUBLE) / CAST(nb AS DOUBLE))
               * (CAST(sb AS DOUBLE) / CAST(nb AS DOUBLE)))
              * CAST(nb AS DOUBLE) / (CAST(nb AS DOUBLE) - 1.0)
              / 10000.0 AS vb
        FROM w
    )
    SELECT na AS n_a, nb AS n_b,
           {sql_srnd("ma", 6)} AS mean_a,
           {sql_srnd("mb", 6)} AS mean_b,
           {sql_srnd(
               "(ma - mb) / nullif(sqrt(va / na + vb / nb), 0.0)", 6
           )} AS t_stat,
           {sql_srnd(
               "((va / na + vb / nb) * (va / na + vb / nb))"
               " / nullif((va / na) * (va / na) / (na - 1.0)"
               "        + (vb / nb) * (vb / nb) / (nb - 1.0), 0.0)", 6
           )} AS df
    FROM t
    """,
)
def q_welch_ttest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Welch's unequal-variance t-test (C229): purchase vs click event
    value — the two-sample mean comparison that does NOT assume equal
    variances (the Student's-t pitfall), with the Welch–Satterthwaite
    degrees of freedom. The parametric sibling of C189's Mann-Whitney
    (same question, mean-scale instead of rank-scale).

    Determinism: cents-quantized values give exact BIGINT (n, Σ, Σ²)
    per group (sums in DECIMAL(38,0)/HUGEINT — Σ of cents² crosses
    int64 near sf10); means/variances/t/df are fixed IEEE expressions
    over those integers, srnd6'd, with nullif guards for degenerate
    zero-variance groups.

    Scale shape: ONE map-side-combining conditional groupBy to 2 rows;
    everything after is row-local arithmetic on a 1-row frame — the
    sufficient-statistics shape, nothing but 6 numbers ever shuffles.
    """
    cents = F.floor(F.col("value") * 100.0 + 0.5).cast("long")
    dec = "decimal(38,0)"
    g = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("event_type").isin(_WT_A, _WT_B))
        .select("event_type", cents.alias("x"))
        .groupBy("event_type")
        .agg(
            F.count("*").cast("long").alias("n"),
            F.sum(F.col("x").cast(dec)).alias("s"),
            F.sum((F.col("x") * F.col("x")).cast(dec)).alias("q"),
        )
    )
    w = g.agg(
        *[
            F.max(F.when(F.col("event_type") == t, F.col(c))).alias(c + sfx)
            for t, sfx in ((_WT_A, "a"), (_WT_B, "b"))
            for c in ("n", "s", "q")
        ]
    )
    na, nb = F.col("na").cast("double"), F.col("nb").cast("double")
    ma = F.col("sa").cast("double") / na / 100.0
    mb = F.col("sb").cast("double") / nb / 100.0
    va = (
        (F.col("qa").cast("double") / na
         - (F.col("sa").cast("double") / na)
         * (F.col("sa").cast("double") / na))
        * na / (na - 1.0) / 10000.0
    )
    vb = (
        (F.col("qb").cast("double") / nb
         - (F.col("sb").cast("double") / nb)
         * (F.col("sb").cast("double") / nb))
        * nb / (nb - 1.0) / 10000.0
    )
    sea, seb = va / na, vb / nb
    return w.select(
        F.col("na").alias("n_a"),
        F.col("nb").alias("n_b"),
        srnd(ma, 6).alias("mean_a"),
        srnd(mb, 6).alias("mean_b"),
        srnd(
            (ma - mb) / F.nullif(F.sqrt(sea + seb), F.lit(0.0)), 6
        ).alias("t_stat"),
        srnd(
            ((sea + seb) * (sea + seb))
            / F.nullif(
                sea * sea / (na - 1.0) + seb * seb / (nb - 1.0),
                F.lit(0.0),
            ),
            6,
        ).alias("df"),
    )


# --------------------------------------- C230 Jarque–Bera normality


@query(
    "q_jarque_bera",
    oracle=f"""
    WITH p AS (
        SELECT CAST(count(*) AS BIGINT) AS n,
               CAST(sum(CAST(l_quantity AS BIGINT)) AS HUGEINT) AS s1,
               CAST(sum(CAST(l_quantity AS BIGINT)
                        * CAST(l_quantity AS BIGINT)) AS HUGEINT) AS s2,
               CAST(sum(CAST(l_quantity AS BIGINT)
                        * CAST(l_quantity AS BIGINT)
                        * CAST(l_quantity AS BIGINT)) AS HUGEINT) AS s3,
               CAST(sum(CAST(l_quantity AS BIGINT)
                        * CAST(l_quantity AS BIGINT)
                        * CAST(l_quantity AS BIGINT)
                        * CAST(l_quantity AS BIGINT)) AS HUGEINT) AS s4
        FROM lineitem
    ),
    m AS (
        SELECT n,
            CAST(s1 AS DOUBLE) / n AS mu,
            CAST(s2 AS DOUBLE) / n AS r2,
            CAST(s3 AS DOUBLE) / n AS r3,
            CAST(s4 AS DOUBLE) / n AS r4
        FROM p
    ),
    c AS (
        SELECT n, mu,
            r2 - mu * mu AS m2,
            r3 - 3.0 * mu * r2 + 2.0 * mu * mu * mu AS m3,
            r4 - 4.0 * mu * r3 + 6.0 * mu * mu * r2
               - 3.0 * mu * mu * mu * mu AS m4
        FROM m
    ),
    sk AS (
        SELECT n,
            m3 / nullif(sqrt(m2 * m2 * m2), 0.0) AS skew,
            m4 / nullif(m2 * m2, 0.0) - 3.0 AS exk
        FROM c
    )
    SELECT n,
           {sql_srnd("skew", 6)} AS skewness,
           {sql_srnd("exk", 6)} AS ex_kurtosis,
           {sql_srnd(
               "n / 6.0 * (skew * skew + exk * exk / 4.0)", 4
           )} AS jb_stat
    FROM sk
    """,
)
def q_jarque_bera(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Jarque–Bera normality test (C230) on lineitem quantity: JB =
    n/6·(S² + K²/4) from sample skewness S and excess kurtosis K —
    the moment-based "is this column even normal" check that decides
    whether C229/C188's parametric tests or C189/C190's rank tests
    are the right tool (quantity is uniform on 1..50, so JB is huge
    and K ≈ −1.2 — the platykurtic signature the gate pins).

    Determinism: the four raw power sums are exact integers (Σx⁴ of
    BIGINT quantities in DECIMAL(38,0)/HUGEINT); raw→central moment
    conversion and S/K/JB are fixed IEEE expressions over their
    exact-int doubles, srnd'd. The small-magnitude domain (1..50)
    keeps the central-moment cancellation benign by construction.

    Scale shape: ONE map-side-combining full-table agg to a single
    row of 5 numbers — the canonical sufficient-statistics plan; the
    JB of 100 TB is the JB of its per-partition partial sums.
    """
    x = F.col("l_quantity").cast("long")
    dec = "decimal(38,0)"
    p = load_table(spark, sf_dir, "lineitem").agg(
        F.count("*").cast("long").alias("n"),
        F.sum(x.cast(dec)).alias("s1"),
        F.sum((x * x).cast(dec)).alias("s2"),
        F.sum((x * x * x).cast(dec)).alias("s3"),
        F.sum((x * x * x * x).cast(dec)).alias("s4"),
    )
    n = F.col("n").cast("double")
    mu = F.col("s1").cast("double") / n
    r2 = F.col("s2").cast("double") / n
    r3 = F.col("s3").cast("double") / n
    r4 = F.col("s4").cast("double") / n
    m2 = r2 - mu * mu
    m3 = r3 - 3.0 * mu * r2 + 2.0 * mu * mu * mu
    m4 = r4 - 4.0 * mu * r3 + 6.0 * mu * mu * r2 - 3.0 * mu * mu * mu * mu
    skew = m3 / F.nullif(F.sqrt(m2 * m2 * m2), F.lit(0.0))
    exk = m4 / F.nullif(m2 * m2, F.lit(0.0)) - 3.0
    return p.select(
        F.col("n"),
        srnd(skew, 6).alias("skewness"),
        srnd(exk, 6).alias("ex_kurtosis"),
        srnd(n / 6.0 * (skew * skew + exk * exk / 4.0), 4).alias("jb_stat"),
    )


# ------------------------------ C231 Levene variance-homogeneity test


@query(
    "q_levene",
    oracle=f"""
    WITH m AS (
        SELECT o_orderpriority AS grp,
               CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT) AS x
        FROM orders
    ),
    gm AS (
        SELECT grp, CAST(count(*) AS BIGINT) AS n,
               CAST(sum(x) AS BIGINT) AS s
        FROM m GROUP BY grp
    ),
    z AS (
        -- |x - group mean| in exact hundredth-cent micro-units:
        -- |x*n - s| is an exact integer, one float div + floor
        SELECT m.grp,
               CAST(floor(abs(CAST(m.x AS HUGEINT) * gm.n - gm.s)
                          * 100.0 / gm.n + 0.5) AS BIGINT) AS zu
        FROM m JOIN gm ON m.grp = gm.grp
    ),
    cells AS (
        SELECT grp, CAST(count(*) AS BIGINT) AS n,
               CAST(sum(CAST(zu AS HUGEINT)) AS HUGEINT) AS s,
               CAST(sum(CAST(zu AS HUGEINT) * zu) AS HUGEINT) AS q
        FROM z GROUP BY grp
    ),
    tot AS (
        SELECT CAST(sum(n) AS BIGINT) AS nn,
               CAST(sum(s) AS HUGEINT) AS ss,
               CAST(sum(q) AS HUGEINT) AS qq,
               CAST(count(*) AS BIGINT) AS g
        FROM cells
    ),
    parts AS (
        SELECT
            list_sum(list(
                CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / CAST(n AS DOUBLE)
                ORDER BY grp)) AS s2n
        FROM cells
    ),
    fin AS (
        SELECT (SELECT g FROM tot) AS g, (SELECT nn FROM tot) AS nn,
            (s2n - CAST((SELECT ss FROM tot) AS DOUBLE)
                   * CAST((SELECT ss FROM tot) AS DOUBLE)
                   / CAST((SELECT nn FROM tot) AS DOUBLE))
              / 1e8 / ((SELECT g FROM tot) - 1.0) AS msb,
            (CAST((SELECT qq FROM tot) AS DOUBLE) - s2n)
              / 1e8 / ((SELECT nn FROM tot) - (SELECT g FROM tot)) AS msw
        FROM parts
    )
    SELECT g AS n_groups, nn AS n_rows,
           {sql_srnd("msb", 4)} AS ms_between,
           {sql_srnd("msw", 4)} AS ms_within,
           {sql_srnd(
               "{a} / nullif({b}, 0.0)".format(
                   a=sql_srnd("msb", 4), b=sql_srnd("msw", 4)), 6
           )} AS w_stat
    FROM fin
    """,
)
def q_levene(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Levene variance-homogeneity test (C231): one-way ANOVA over the
    absolute deviations z = |x − x̄_group| of order value across the
    five order priorities — "do the groups differ in SPREAD", the
    homoscedasticity assumption behind C188's ANOVA and C229's
    pooled alternatives (mean-centered Levene; the median-centered
    Brown–Forsythe variant swaps x̄ for the group median).

    Determinism: x is exact cents; |x·n − s| is an exact wide integer
    so z needs exactly ONE float division + floor into hundredth-cent
    micro-units (identical both engines); the ANOVA assembly over z
    then reuses C188's recipe — exact integer cells, the s²/n fold in
    group order (C69), fixed srnd'd expressions. Emitted as MEAN
    squares, not raw sums: SSW over millions of cent²-scale rows
    crosses srnd4's exact-floor range (Spark's floor(double) is a
    LONG — values past 2^63/10⁴ saturate where DuckDB's DOUBLE floor
    does not, caught by this key's sf1 probe); mean squares are
    magnitude-stable at ANY row count, so the quantization is safe at
    every scale by construction.

    Scale shape: two map-side-combining groupBys (means, then z
    cells) with one broadcast join-back between them — the classic
    two-pass deviation shape; nothing after the second collapse
    exceeds |groups| rows.
    """
    dec = "decimal(38,0)"
    m = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderpriority").alias("grp"),
        F.floor(F.col("o_totalprice") * 100.0 + 0.5)
        .cast("long")
        .alias("x"),
    )
    gm = m.groupBy("grp").agg(
        F.count("*").cast("long").alias("n"),
        F.sum("x").cast("long").alias("s"),
    )
    z = m.join(F.broadcast(gm), "grp").select(
        "grp",
        F.floor(
            F.abs(F.col("x").cast(dec) * F.col("n") - F.col("s"))
            .cast("double")
            * 100.0
            / F.col("n")
            + 0.5
        )
        .cast("long")
        .alias("zu"),
    )
    cells = z.groupBy("grp").agg(
        F.count("*").cast("long").alias("n"),
        F.sum(F.col("zu").cast(dec)).alias("s"),
        F.sum((F.col("zu").cast(dec) * F.col("zu"))).alias("q"),
    )
    # r14: totals + the s²/n fold run row-locally over the packed
    # |groups|-row array in ONE 1-row aggregate (was: persisted cell
    # frame + total broadcast + separate fold job). The fold keeps
    # the C69 group order (sorted array); integer/decimal totals are
    # order-free.
    agg = cells.agg(
        F.expr("array_sort(collect_list(struct(grp, n, s, q)))").alias(
            "cls"
        )
    ).select(
        F.expr("aggregate(cls, 0L, (a, x) -> a + x.n)").alias("nn"),
        F.expr(
            "aggregate(cls, CAST(0 AS DECIMAL(38,0)), (a, x) ->"
            " CAST(a + x.s AS DECIMAL(38,0)))"
        ).alias("ss"),
        F.expr(
            "aggregate(cls, CAST(0 AS DECIMAL(38,0)), (a, x) ->"
            " CAST(a + x.q AS DECIMAL(38,0)))"
        ).alias("qq"),
        F.expr("CAST(size(cls) AS BIGINT)").alias("g"),
        F.expr(
            "aggregate(cls, CAST(0.0 AS DOUBLE), (acc, x) ->"
            " acc + CAST(x.s AS DOUBLE) * CAST(x.s AS DOUBLE)"
            " / CAST(x.n AS DOUBLE))"
        ).alias("s2n"),
    )
    g = F.col("g").cast("double")
    nn = F.col("nn").cast("double")
    msb = (
        F.col("s2n")
        - F.col("ss").cast("double") * F.col("ss").cast("double") / nn
    ) / 1e8 / (g - 1.0)
    msw = (F.col("qq").cast("double") - F.col("s2n")) / 1e8 / (nn - g)
    return agg.select(
        F.col("g").alias("n_groups"),
        F.col("nn").alias("n_rows"),
        srnd(msb, 4).alias("ms_between"),
        srnd(msw, 4).alias("ms_within"),
        srnd(
            srnd(msb, 4) / F.nullif(srnd(msw, 4), F.lit(0.0)), 6
        ).alias("w_stat"),
    )


# ----------------------------------------------- C232 G-test (LLR χ²)


@query(
    "q_g_test",
    oracle=f"""
    WITH o AS (
        SELECT event_type AS r, CAST(user_id % 2 AS BIGINT) AS c,
               CAST(count(*) AS BIGINT) AS o
        FROM events GROUP BY 1, 2
    ),
    marg AS (
        SELECT r, c, o,
               CAST(sum(o) OVER (PARTITION BY r) AS BIGINT) AS rm,
               CAST(sum(o) OVER (PARTITION BY c) AS BIGINT) AS cm,
               CAST(sum(o) OVER () AS BIGINT) AS n
        FROM o
    ),
    terms AS (
        SELECT r, c, n,
               CAST(o AS DOUBLE)
                 * ln(CAST(o AS DOUBLE) * CAST(n AS DOUBLE)
                      / (CAST(rm AS DOUBLE) * CAST(cm AS DOUBLE))) AS t
        FROM marg WHERE o > 0
    )
    SELECT max(n) AS n,
           CAST((count(DISTINCT r) - 1)
                * (count(DISTINCT c) - 1) AS BIGINT) AS dof,
           {sql_srnd(
               "2.0 * list_sum(list(t ORDER BY r, c))", 6
           )} AS g_stat
    FROM terms
    """,
)
def q_g_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G-test of independence (C232): the likelihood-ratio twin of
    C124's Pearson χ² over the event-type × user-cohort contingency
    table (cohort = user parity), G = 2·Σ O·ln(O·N/(R·C)). Additive
    across partitions of the table (χ² is not) — the property that
    makes G the right independence test to MERGE across shards of a
    100 TB event log.

    Determinism: cell/marginal counts are exact integers; each cell
    contributes one ln over a ratio of exact-int doubles; the ≤|r|·|c|
    float terms fold in (r, c) order (C69); srnd6.

    Scale shape: one map-side-combining groupBy to the contingency
    cells; marginals ride windows over that ≤10-row frame.
    """
    o = (
        load_table(spark, sf_dir, "events")
        .groupBy(
            F.col("event_type").alias("r"),
            (F.col("user_id") % 2).cast("long").alias("c"),
        )
        .agg(F.count("*").cast("long").alias("o"))
    )
    from pyspark.sql import Window

    marg = o.select(
        "r",
        "c",
        "o",
        F.sum("o").over(Window.partitionBy("r")).cast("long").alias("rm"),
        F.sum("o").over(Window.partitionBy("c")).cast("long").alias("cm"),
        F.sum("o").over(Window.partitionBy()).cast("long").alias("n"),
    )
    terms = marg.filter(F.col("o") > 0).select(
        "r",
        "c",
        "n",
        (
            F.col("o").cast("double")
            * F.log(
                F.col("o").cast("double")
                * F.col("n").cast("double")
                / (F.col("rm").cast("double") * F.col("cm").cast("double"))
            )
        ).alias("t"),
    )
    fold = F.expr(
        "aggregate(array_sort(collect_list(struct(r, c, t))),"
        " CAST(0.0 AS DOUBLE), (acc, x) -> acc + x.t)"
    )
    return terms.agg(
        F.max("n").alias("n"),
        (
            (F.countDistinct("r") - 1) * (F.countDistinct("c") - 1)
        )
        .cast("long")
        .alias("dof"),
        srnd(2.0 * fold, 6).alias("g_stat"),
    )


# ------------------------------------------------- C233 Cramér's V


@query(
    "q_cramers_v",
    oracle=f"""
    WITH o AS (
        SELECT o.o_orderpriority AS r, c.c_mktsegment AS c,
               CAST(count(*) AS BIGINT) AS o
        FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
        GROUP BY 1, 2
    ),
    marg AS (
        SELECT r, c, o,
               CAST(sum(o) OVER (PARTITION BY r) AS BIGINT) AS rm,
               CAST(sum(o) OVER (PARTITION BY c) AS BIGINT) AS cm,
               CAST(sum(o) OVER () AS BIGINT) AS n
        FROM o
    ),
    terms AS (
        SELECT r, c, n,
               (CAST(o AS DOUBLE)
                - CAST(rm AS DOUBLE) * CAST(cm AS DOUBLE)
                  / CAST(n AS DOUBLE))
               * (CAST(o AS DOUBLE)
                  - CAST(rm AS DOUBLE) * CAST(cm AS DOUBLE)
                    / CAST(n AS DOUBLE))
               / (CAST(rm AS DOUBLE) * CAST(cm AS DOUBLE)
                  / CAST(n AS DOUBLE)) AS t
        FROM marg
    ),
    agg AS (
        SELECT max(n) AS n,
               CAST(count(DISTINCT r) AS BIGINT) AS nr,
               CAST(count(DISTINCT c) AS BIGINT) AS nc,
               list_sum(list(t ORDER BY r, c)) AS chi2
        FROM terms
    )
    SELECT n, CAST((nr - 1) * (nc - 1) AS BIGINT) AS dof,
           {sql_srnd("chi2", 4)} AS chi2,
           {sql_srnd(
               "sqrt({c} / (CAST(n AS DOUBLE)"
               " * (least(nr, nc) - 1.0)))".format(
                   c=sql_srnd("chi2", 4)), 6
           )} AS cramers_v
    FROM agg
    """,
)
def q_cramers_v(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cramér's V (C233): the [0,1]-normalized effect size of the
    order-priority × customer-segment association — the number a
    dashboard can threshold where raw χ² (C124) only grows with N.
    Pearson χ² over the 5×5 contingency of the orders⋈customer join,
    then V = √(χ²/(N·(min(r,c)−1))).

    Determinism: cells/marginals exact integers; per-cell (O−E)²/E is
    a fixed IEEE expression; the 25 float terms fold in (r, c) order
    (C69); χ² is quantized BEFORE V so both emitted columns derive
    from the same srnd'd value.

    Scale shape: the fact-side groupBy collapses orders to one row
    per (priority, segment) AFTER an equi-join that AQE broadcasts
    (customer is the small side at fixture scale; at 100 TB it
    hash-joins on custkey, both sides partitioned on the key).
    """
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    cells = (
        o.join(c, o.o_custkey == c.c_custkey)
        .groupBy(
            F.col("o_orderpriority").alias("r"),
            F.col("c_mktsegment").alias("c"),
        )
        .agg(F.count("*").cast("long").alias("o"))
    )
    from pyspark.sql import Window

    marg = cells.select(
        "r",
        "c",
        "o",
        F.sum("o").over(Window.partitionBy("r")).cast("long").alias("rm"),
        F.sum("o").over(Window.partitionBy("c")).cast("long").alias("cm"),
        F.sum("o").over(Window.partitionBy()).cast("long").alias("n"),
    )
    e = (
        F.col("rm").cast("double")
        * F.col("cm").cast("double")
        / F.col("n").cast("double")
    )
    terms = marg.select(
        "r",
        "c",
        "n",
        ((F.col("o").cast("double") - e) * (F.col("o").cast("double") - e) / e).alias(
            "t"
        ),
    )
    fold = F.expr(
        "aggregate(array_sort(collect_list(struct(r, c, t))),"
        " CAST(0.0 AS DOUBLE), (acc, x) -> acc + x.t)"
    )
    agg = terms.agg(
        F.max("n").alias("n"),
        F.countDistinct("r").cast("long").alias("nr"),
        F.countDistinct("c").cast("long").alias("nc"),
        fold.alias("chi2_raw"),
    )
    chi2 = srnd(F.col("chi2_raw"), 4)
    return agg.select(
        "n",
        ((F.col("nr") - 1) * (F.col("nc") - 1)).cast("long").alias("dof"),
        chi2.alias("chi2"),
        srnd(
            F.sqrt(
                chi2
                / (
                    F.col("n").cast("double")
                    * (F.least("nr", "nc").cast("double") - 1.0)
                )
            ),
            6,
        ).alias("cramers_v"),
    )


# ----------------------------------------------- C234 Kendall's τ-b


@query(
    "q_kendall_tau",
    oracle=f"""
    WITH cells AS (
        SELECT CAST(l_quantity AS BIGINT) AS x,
               CAST(floor(l_discount * 100.0 + 0.5) AS BIGINT) AS y,
               CAST(count(*) AS BIGINT) AS n
        FROM lineitem GROUP BY 1, 2
    ),
    pair AS (
        SELECT
            CAST(sum(CASE WHEN (a.x < b.x AND a.y < b.y)
                            OR (a.x > b.x AND a.y > b.y)
                     THEN CAST(a.n AS HUGEINT) * b.n ELSE 0 END)
                 AS HUGEINT) // 2 AS conc,
            CAST(sum(CASE WHEN (a.x < b.x AND a.y > b.y)
                            OR (a.x > b.x AND a.y < b.y)
                     THEN CAST(a.n AS HUGEINT) * b.n ELSE 0 END)
                 AS HUGEINT) // 2 AS disc
        FROM cells a JOIN cells b
          ON NOT (a.x = b.x AND a.y = b.y)
    ),
    ties AS (
        SELECT
          (SELECT CAST(sum(n) AS HUGEINT) FROM cells) AS nn,
          (SELECT CAST(sum(CAST(t AS HUGEINT) * (t - 1)) AS HUGEINT) // 2
           FROM (SELECT sum(n) AS t FROM cells GROUP BY x)) AS tx,
          (SELECT CAST(sum(CAST(t AS HUGEINT) * (t - 1)) AS HUGEINT) // 2
           FROM (SELECT sum(n) AS t FROM cells GROUP BY y)) AS ty
    )
    SELECT CAST(nn AS BIGINT) AS n,
           CAST(conc AS BIGINT) AS concordant,
           CAST(disc AS BIGINT) AS discordant,
           {sql_srnd(
               "CAST(conc - disc AS DOUBLE)"
               " / nullif(sqrt("
               "   (CAST(nn AS DOUBLE) * (CAST(nn AS DOUBLE) - 1.0) / 2.0"
               "    - CAST(tx AS DOUBLE))"
               " * (CAST(nn AS DOUBLE) * (CAST(nn AS DOUBLE) - 1.0) / 2.0"
               "    - CAST(ty AS DOUBLE))), 0.0)", 6
           )} AS tau_b
    FROM pair, ties
    """,
)
def q_kendall_tau(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kendall's τ-b (C234) between lineitem quantity and discount —
    the concordant/discordant-pair ordinal association with the tie
    correction both variables need (quantity 1..50, discount in 11
    cent steps: ties dominate). Complements C168's Spearman: τ has a
    direct probabilistic reading (P(concordant) − P(discordant)) and
    is the coefficient of record for heavily tied ordinal pairs.

    Determinism: pure integer pair counting — concordant/discordant
    totals are exact products of cell counts (HUGEINT/DECIMAL(38,0);
    pair counts cross int64 at extreme scale), halved exactly; tie
    terms from exact marginals; one guarded srnd6 division.

    Scale shape: the corpus collapses to its ≤|x-domain|·|y-domain|
    JOINT CELLS (≤561 here — both domains are quantized and bounded),
    and ALL pair arithmetic runs on the cells' self-join (≤561² rows,
    corpus-size-independent) — the counts-discipline answer to a
    statistic naively defined over N²/2 row pairs.
    """
    dec = "DECIMAL(38,0)"
    li = load_table(spark, sf_dir, "lineitem")
    cells = li.groupBy(
        F.col("l_quantity").cast("long").alias("x"),
        F.floor(F.col("l_discount") * 100.0 + 0.5).cast("long").alias("y"),
    ).agg(F.count("*").cast("long").alias("n"))
    # r14: the ≤561² cell self-join (broadcast NLJ) plus the three
    # marginal/total jobs collapse into row-local HOF folds over the
    # packed cell array — one job, one exchange. All pair arithmetic
    # is exact DECIMAL(38,0) products of cell counts (fold order
    # irrelevant); the ordered-pair double count is halved exactly
    # like the old /2 (even by construction).
    packed = cells.agg(
        F.expr("array_sort(collect_list(struct(x, y, n)))").alias("cs")
    ).select(
        "cs",
        F.expr("aggregate(cs, 0L, (a, c) -> a + c.n)").alias("nn"),
        F.expr("array_sort(array_distinct(transform(cs, c -> c.x)))")
        .alias("xs"),
        F.expr("array_sort(array_distinct(transform(cs, c -> c.y)))")
        .alias("ys"),
    )

    def pair_sum(case: str) -> str:
        return (
            f"CAST(aggregate(cs, CAST(0 AS {dec}), (acc, a) ->"
            f" CAST(acc + aggregate(cs, CAST(0 AS {dec}), (ai, b) ->"
            f" CAST(ai + CASE WHEN {case}"
            f" THEN CAST(a.n AS {dec}) * b.n"
            f" ELSE CAST(0 AS {dec}) END AS {dec})) AS {dec}))"
            f" / 2 AS {dec})"
        )

    def tie_sum(axis: str, dom: str) -> str:
        t = (
            f"CAST(aggregate(filter(cs, c -> c.{axis} = v), 0L,"
            f" (at, ct) -> at + ct.n) AS {dec})"
        )
        return (
            f"CAST(aggregate({dom}, CAST(0 AS {dec}), (acc, v) ->"
            f" CAST(acc + {t} * ({t} - 1) AS {dec})) / 2 AS {dec})"
        )

    conc_case = (
        "((a.x < b.x AND a.y < b.y) OR (a.x > b.x AND a.y > b.y))"
    )
    disc_case = (
        "((a.x < b.x AND a.y > b.y) OR (a.x > b.x AND a.y < b.y))"
    )
    j = packed.select(
        "nn",
        F.expr(pair_sum(conc_case)).alias("conc"),
        F.expr(pair_sum(disc_case)).alias("disc"),
        F.expr(tie_sum("x", "xs")).alias("tx"),
        F.expr(tie_sum("y", "ys")).alias("ty"),
    )
    nd = F.col("nn").cast("double")
    n0 = nd * (nd - 1.0) / 2.0
    return j.select(
        F.col("nn").alias("n"),
        F.col("conc").cast("long").alias("concordant"),
        F.col("disc").cast("long").alias("discordant"),
        srnd(
            (F.col("conc") - F.col("disc")).cast("double")
            / F.nullif(
                F.sqrt(
                    (n0 - F.col("tx").cast("double"))
                    * (n0 - F.col("ty").cast("double"))
                ),
                F.lit(0.0),
            ),
            6,
        ).alias("tau_b"),
    )
