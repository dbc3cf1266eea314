"""Round-11 wave 57 (SURVEY.md §2): counts-frame order statistics —
Wilcoxon signed-rank for paired metrics (C200), per-group trimmed
means (C201), the Lorenz concentration curve (C202) and
Benjamini-Hochberg FDR control over a hypothesis battery (C203).

All four ride the operators/ranks discipline the r10 rank rewrite
established: the corpus collapses to a per-value counts frame first,
every rank/position/trim/band derives from exact BIGINT cumulative
counts over THAT frame, and no corpus-sized sort or single-partition
window exists in any plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from cassowary_spark.exprs import sql_srnd, srnd
from cassowary_spark.operators.ranks import counts_bands, doubled_midranks
from cassowary_spark.registry import query
from cassowary_spark.tables import load_table

# ------------------------------- C200 Wilcoxon signed-rank (paired)


@query(
    "q_wilcoxon_signed",
    oracle=f"""
    WITH e AS (
        SELECT user_id,
               CASE WHEN day(ts) <= 15 THEN 1 ELSE 2 END AS half,
               CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS cents
        FROM events
    ),
    per AS (
        SELECT user_id,
               max(CASE WHEN half = 1 THEN cents END) AS m1,
               max(CASE WHEN half = 2 THEN cents END) AS m2
        FROM e GROUP BY 1
    ),
    pairs AS (
        SELECT m2 - m1 AS d FROM per
        WHERE m1 IS NOT NULL AND m2 IS NOT NULL AND m2 <> m1
    ),
    cells AS (
        SELECT abs(d) AS a,
               CAST(count(*) AS BIGINT) AS cnt,
               CAST(sum(CASE WHEN d > 0 THEN 1 ELSE 0 END) AS BIGINT)
                   AS cnt_pos
        FROM pairs GROUP BY 1
    ),
    r AS (
        SELECT a, cnt, cnt_pos,
               CAST(2 * sum(cnt) OVER (ORDER BY a) - cnt + 1 AS BIGINT)
                   AS u2
        FROM cells
    ),
    s AS (
        SELECT CAST(sum(cnt_pos * u2) AS BIGINT) AS wp2,
               CAST(sum(cnt_pos) AS BIGINT) AS n_pos,
               CAST(sum(cnt) - sum(cnt_pos) AS BIGINT) AS n_neg,
               CAST(sum(cnt) AS BIGINT) AS n,
               CAST(coalesce(sum(CASE WHEN cnt > 1
                                 THEN cnt * cnt * cnt - cnt
                                 ELSE 0 END), 0) AS BIGINT) AS tsum
        FROM r
    )
    SELECT n, n_pos, n_neg,
           {sql_srnd("CAST(wp2 AS DOUBLE) / 2.0", 6)} AS w_plus,
           {sql_srnd(
               "(CAST(wp2 AS DOUBLE) / 2.0"
               " - CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) + 1.0) / 4.0)"
               " / nullif(sqrt("
               "   CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) + 1.0)"
               "   * (2.0 * CAST(n AS DOUBLE) + 1.0) / 24.0"
               "   - CAST(tsum AS DOUBLE) / 48.0), 0.0)", 6)} AS z
    FROM s
    """,
)
def q_wilcoxon_signed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wilcoxon signed-rank test (C200): did per-user peak event
    value RISE from the first half of the month to the second? Pairs
    are each user's max cents value per half (users active in both
    halves, zero differences dropped per the classic test); W+ sums
    the midranks of |d| over the positive differences, z uses the
    tie-corrected normal approximation. The PAIRED companion to
    C189's two-sample U — within-subject designs difference out
    per-user level effects a two-sample rank test would drown in.

    Determinism: pair metrics are exact BIGINT maxima of cents;
    midranks are the doubled-average-rank identity over |d| COUNTS
    (operators/ranks.doubled_midranks — 2W+ is an exact BIGINT,
    bit-identical to row ranking); W+, z are fixed srnd6 IEEE
    expressions over exact integers, tie correction an exact BIGINT.

    Scale shape: one user-keyed partial agg builds the pairs (user
    cardinality-bounded), one groupBy collapses pairs to the
    |d|-cells frame (cents-quantized domain), one running-sum window
    over THAT frame, then a 1-row reduce. No corpus sort, no
    single-partition corpus window (sp_corpus_windows = 0).
    """
    ev = load_table(spark, sf_dir, "events").select("user_id", "ts", "value")
    half = F.when(F.dayofmonth("ts") <= 15, 1).otherwise(2)
    cents = F.floor(F.col("value") * 100.0 + 0.5).cast("long")
    per = (
        ev.select("user_id", half.alias("half"), cents.alias("cents"))
        .groupBy("user_id")
        .agg(
            F.max(F.when(F.col("half") == 1, F.col("cents"))).alias("m1"),
            F.max(F.when(F.col("half") == 2, F.col("cents"))).alias("m2"),
        )
    )
    pairs = per.filter(
        F.col("m1").isNotNull()
        & F.col("m2").isNotNull()
        & (F.col("m2") != F.col("m1"))
    ).select((F.col("m2") - F.col("m1")).alias("d"))
    cells = pairs.groupBy(F.abs("d").alias("a")).agg(
        F.count("*").cast("long").alias("cnt"),
        F.sum(F.when(F.col("d") > 0, 1).otherwise(0))
        .cast("long")
        .alias("cnt_pos"),
    )
    r = doubled_midranks(cells, "a", "cnt")
    tie = F.col("cnt")
    s = r.agg(
        F.sum(F.col("cnt_pos") * F.col("u2")).cast("long").alias("wp2"),
        F.sum("cnt_pos").cast("long").alias("n_pos"),
        (F.sum("cnt") - F.sum("cnt_pos")).cast("long").alias("n_neg"),
        F.sum("cnt").cast("long").alias("n"),
        F.coalesce(
            F.sum(F.when(tie > 1, tie * tie * tie - tie).otherwise(F.lit(0))),
            F.lit(0),
        )
        .cast("long")
        .alias("tsum"),
    )
    nd = F.col("n").cast("double")
    w_plus = F.col("wp2").cast("double") / 2.0
    z = (w_plus - nd * (nd + 1.0) / 4.0) / F.nullif(
        F.sqrt(
            nd * (nd + 1.0) * (2.0 * nd + 1.0) / 24.0
            - F.col("tsum").cast("double") / 48.0
        ),
        F.lit(0.0),
    )
    return s.select(
        "n",
        "n_pos",
        "n_neg",
        srnd(w_plus, 6).alias("w_plus"),
        srnd(z, 6).alias("z"),
    )


# ------------------------------------ C201 per-group trimmed mean

_TRIM_PCT = 10  # percent trimmed from EACH tail


@query(
    "q_trimmed_mean",
    oracle=f"""
    WITH m AS (
        SELECT l_returnflag AS flag,
               CAST(floor(l_extendedprice * 100.0 + 0.5) AS BIGINT)
                   AS cents
        FROM lineitem
    ),
    cells AS (
        SELECT flag, cents, CAST(count(*) AS BIGINT) AS cnt
        FROM m GROUP BY 1, 2
    ),
    w AS (
        SELECT flag, cents, cnt,
               CAST(sum(cnt) OVER (PARTITION BY flag ORDER BY cents)
                    AS BIGINT) AS cum,
               CAST(sum(cnt) OVER (PARTITION BY flag) AS BIGINT) AS ng
        FROM cells
    ),
    k AS (
        SELECT flag, cents, cnt, cum, ng,
               (ng * {_TRIM_PCT}) // 100 AS lo
        FROM w
    ),
    kept AS (
        SELECT flag, ng, lo,
               greatest(CAST(0 AS BIGINT),
                        least(cum, ng - lo)
                        - greatest(cum - cnt + 1, lo + 1) + 1) AS keep,
               cents
        FROM k
    )
    SELECT flag,
           CAST(max(ng) AS BIGINT) AS n_rows,
           CAST(sum(keep) AS BIGINT) AS n_kept,
           {sql_srnd(
               "CAST(sum(keep * cents) AS DOUBLE)"
               " / CAST(sum(keep) AS DOUBLE) / 100.0", 4)}
               AS trimmed_mean
    FROM kept GROUP BY flag
    """,
)
def q_trimmed_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group trimmed mean (C201): the {p}%-each-tail trimmed mean
    of l_extendedprice per return flag — the robust location estimate
    between the mean (outlier-fragile) and the median (throws away
    80% of the data); the estimator C109's winsorize motivates but
    doesn't compute (winsorize CLAMPS tails, trimming EXCLUDES them).

    Computed without ever ranking rows: each (flag, cents) cell
    occupies the exact rank interval [cum−cnt+1, cum], so its kept
    mass is the BIGINT interval overlap with [lo+1, ng−lo] where
    lo = ⌊ng·{p}/100⌋ — partial tie groups contribute exactly the
    overlap, bit-identical to sorting and dropping lo rows per tail.

    Determinism: all interval arithmetic exact BIGINT; one srnd4
    division at the end.

    Scale shape: one groupBy to cents-quantized cells (domain-
    bounded), flag-PARTITIONED running-sum windows over the cells
    frame (parallel across flags), one flag-keyed rollup. No corpus
    sort; sp_corpus_windows = 0.
    """
    li = load_table(spark, sf_dir, "lineitem")
    m = li.select(
        F.col("l_returnflag").alias("flag"),
        F.floor(F.col("l_extendedprice") * 100.0 + 0.5)
        .cast("long")
        .alias("cents"),
    )
    cells = m.groupBy("flag", "cents").agg(
        F.count("*").cast("long").alias("cnt")
    )
    wcum = (
        Window.partitionBy("flag")
        .orderBy("cents")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wall = Window.partitionBy("flag")
    w = cells.select(
        "flag",
        "cents",
        "cnt",
        F.sum("cnt").over(wcum).cast("long").alias("cum"),
        F.sum("cnt").over(wall).cast("long").alias("ng"),
    )
    lo = (F.col("ng") * _TRIM_PCT - F.pmod(F.col("ng") * _TRIM_PCT, F.lit(100))) / 100
    k = w.withColumn("lo", lo.cast("long"))
    keep = F.greatest(
        F.lit(0).cast("long"),
        F.least(F.col("cum"), F.col("ng") - F.col("lo"))
        - F.greatest(F.col("cum") - F.col("cnt") + 1, F.col("lo") + 1)
        + 1,
    )
    kept = k.select("flag", "ng", keep.alias("keep"), "cents")
    return kept.groupBy("flag").agg(
        F.max("ng").cast("long").alias("n_rows"),
        F.sum("keep").cast("long").alias("n_kept"),
        srnd(
            F.sum(F.col("keep") * F.col("cents")).cast("double")
            / F.sum("keep").cast("double")
            / 100.0,
            4,
        ).alias("trimmed_mean"),
    )


q_trimmed_mean.__doc__ = q_trimmed_mean.__doc__.format(p=_TRIM_PCT)


# --------------------------------------- C202 Lorenz curve deciles

_LORENZ_BANDS = 10


@query(
    "q_lorenz_curve",
    oracle=f"""
    WITH cust AS (
        SELECT o_custkey,
               CAST(sum(CAST(floor(o_totalprice * 100.0 + 0.5)
                             AS BIGINT)) AS BIGINT) AS rev
        FROM orders GROUP BY 1
    ),
    cells AS (
        SELECT rev, CAST(count(*) AS BIGINT) AS cnt
        FROM cust GROUP BY 1
    ),
    banded AS (
        SELECT rev, cnt,
               CAST(1 + ((CAST(sum(cnt) OVER (ORDER BY rev) AS BIGINT)
                          - 1) * {_LORENZ_BANDS})
                    // CAST(sum(cnt) OVER () AS BIGINT) AS INT) AS band
        FROM cells
    ),
    per AS (
        SELECT band,
               CAST(sum(cnt) AS BIGINT) AS n_customers,
               CAST(sum(rev * cnt) AS BIGINT) AS band_cents
        FROM banded GROUP BY 1
    )
    SELECT band, n_customers,
           {sql_srnd(
               "CAST(band_cents AS DOUBLE)"
               " / CAST(sum(band_cents) OVER () AS DOUBLE)", 6)}
               AS rev_share,
           {sql_srnd(
               "CAST(sum(band_cents) OVER (ORDER BY band"
               " ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)"
               " AS DOUBLE)"
               " / CAST(sum(band_cents) OVER () AS DOUBLE)", 6)}
               AS cum_rev_share
    FROM per
    """,
)
def q_lorenz_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lorenz curve deciles (C202): customers banded into revenue
    deciles (poorest first, ties together), each band's share and
    cumulative share of total revenue — the CURVE behind C101's Gini
    scalar ("the bottom 50% of customers hold 11% of revenue"), the
    concentration report an account-risk review reads directly.

    Determinism: per-customer revenue is an exact BIGINT cents sum;
    banding is operators/ranks.counts_bands over the revenue-cells
    frame (exact BIGINT); shares are srnd6 divisions of exact
    BIGINTs; the cumulative window runs over ≤ {n} rows.

    Scale shape: one custkey partial agg, one groupBy to revenue
    cells (cents-quantized — domain-bounded), the banding window over
    THAT frame, a {n}-key rollup, windows over {n} rows. No corpus
    sort; sp_corpus_windows = 0.
    """
    o = load_table(spark, sf_dir, "orders")
    cents = F.floor(F.col("o_totalprice") * 100.0 + 0.5).cast("long")
    cust = o.groupBy("o_custkey").agg(F.sum(cents).cast("long").alias("rev"))
    cells = cust.groupBy("rev").agg(F.count("*").cast("long").alias("cnt"))
    banded = counts_bands(cells, "rev", "cnt", _LORENZ_BANDS, out_col="band")
    per = banded.groupBy("band").agg(
        F.sum("cnt").cast("long").alias("n_customers"),
        F.sum(F.col("rev") * F.col("cnt")).cast("long").alias("band_cents"),
    )
    wt = Window.partitionBy()
    wc = Window.orderBy("band").rowsBetween(Window.unboundedPreceding, 0)
    return per.select(
        "band",
        "n_customers",
        srnd(
            F.col("band_cents").cast("double")
            / F.sum("band_cents").over(wt).cast("double"),
            6,
        ).alias("rev_share"),
        srnd(
            F.sum("band_cents").over(wc).cast("double")
            / F.sum("band_cents").over(wt).cast("double"),
            6,
        ).alias("cum_rev_share"),
    )


q_lorenz_curve.__doc__ = q_lorenz_curve.__doc__.format(n=_LORENZ_BANDS)


# ------------------------------ C203 Benjamini-Hochberg FDR control

_BH_Q = 0.1  # target false-discovery rate


@query(
    "q_bh_fdr",
    oracle=f"""
    WITH hyp AS (
        SELECT p_brand AS brand,
               CAST(count(*) AS BIGINT) AS n_parts,
               floor((CAST(CAST('0x' || substr(md5(p_brand), 1, 8)
                                AS BIGINT) % 1000000 AS DOUBLE)
                      / 1000000.0
                      / CASE WHEN p_brand LIKE 'Brand#1%'
                             THEN 1000.0 ELSE 1.0 END)
                     * 1000000.0 + 0.5) / 1000000.0 AS p
        FROM part GROUP BY p_brand
    ),
    ranked AS (
        SELECT brand, n_parts, p,
               CAST(row_number() OVER (ORDER BY p, brand) AS BIGINT) AS k,
               CAST(count(*) OVER () AS BIGINT) AS m
        FROM hyp
    ),
    kstar AS (
        SELECT coalesce(max(CASE WHEN p <= CAST(k AS DOUBLE) * {_BH_Q}
                                      / CAST(m AS DOUBLE)
                             THEN k END), 0) AS ks
        FROM ranked
    )
    SELECT brand, n_parts, {sql_srnd("p", 6)} AS p,
           CAST(k AS BIGINT) AS k,
           CAST(CASE WHEN k <= (SELECT ks FROM kstar)
                THEN 1 ELSE 0 END AS INT) AS rejected
    FROM ranked
    """,
)
def q_bh_fdr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benjamini-Hochberg FDR control (C203): the step-up procedure
    over a per-brand hypothesis battery — order the m p-values
    ascending, find k* = max{{k : p_(k) ≤ k·q/m}}, reject the k*
    smallest. THE multiple-testing correction for metric batteries
    where C193's Holm (FWER) is too conservative: FDR trades "never
    a single false positive" for "≤ q fraction of discoveries
    false", which is what a 200-metric experiment review wants.
    P-values are md5-derived uniforms per brand with a planted
    signal block (Brand#1x scaled 1000× smaller) so the procedure
    has real discoveries to make — the operator under test is the
    step-up machinery, not the upstream test.

    Determinism: p is an srnd6-quantized pure function of the brand
    string; the ranking orders (p, brand) — a strict total order
    over the hypothesis frame; the threshold compare and k* fold are
    fixed IEEE expressions evaluated identically in both engines.

    Scale shape: hypotheses live at BRAND granularity — one part
    partial agg collapses the corpus to the ≤ |brands| hypothesis
    frame, and every window (rank, m, k*) runs over that
    catalog-bounded frame (the detector-accepted calendar/catalog
    class). No corpus-sized anything after the first agg.
    """
    p_tbl = load_table(spark, sf_dir, "part")
    u = (
        F.conv(F.substring(F.md5(F.col("p_brand")), 1, 8), 16, 10).cast(
            "long"
        )
        % 1000000
    ).cast("double") / 1000000.0
    planted = F.when(
        F.col("p_brand").startswith("Brand#1"), u / 1000.0
    ).otherwise(u)
    hyp = p_tbl.groupBy(F.col("p_brand").alias("brand")).agg(
        F.count("*").cast("long").alias("n_parts"),
        srnd(F.first(planted), 6).alias("p"),
    )
    wk = Window.orderBy("p", "brand")
    wm = Window.partitionBy()
    ranked = hyp.select(
        "brand",
        "n_parts",
        "p",
        F.row_number().over(wk).cast("long").alias("k"),
        F.count("*").over(wm).cast("long").alias("m"),
    )
    passes = F.when(
        F.col("p")
        <= F.col("k").cast("double") * _BH_Q / F.col("m").cast("double"),
        F.col("k"),
    )
    kstar = ranked.agg(F.coalesce(F.max(passes), F.lit(0)).alias("ks"))
    return ranked.crossJoin(F.broadcast(kstar)).select(
        "brand",
        "n_parts",
        srnd(F.col("p"), 6).alias("p"),
        "k",
        F.when(F.col("k") <= F.col("ks"), 1).otherwise(0).cast("int").alias(
            "rejected"
        ),
    )
