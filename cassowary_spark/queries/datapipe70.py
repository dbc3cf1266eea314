"""Round-13 wave 73 (SURVEY.md §2): reliability / divergence /
classification / dynamics finishers — one-way intraclass correlation
(C259) completing the agreement battery's variance-decomposition
member, the Bhattacharyya coefficient/distance (C260) beside
KL/JS/PSI, the Matthews correlation coefficient (C261) beside
C163's confusion matrix and C250's Youden point, and permutation
entropy of the daily revenue series (C262) beside C104/C249's
change detectors — the complexity measure that flags when a series
stops being forecastable.

Same determinism conventions as waves 66-72 (exact integer
sufficient statistics; quantized-integer sums for variable-length
float folds; single srnd assemblies).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from cassowary_spark.exprs import sql_srnd, srnd
from cassowary_spark.registry import query
from cassowary_spark.tables import load_table

# ------------------------ C259 one-way intraclass correlation ICC(1,1)


@query(
    "q_icc",
    oracle=f"""
    WITH per AS (
        SELECT user_id,
               CAST(count(*) AS BIGINT) AS n,
               CAST(sum(CAST(floor(value * 100.0 + 0.5) AS BIGINT))
                    AS BIGINT) AS s,
               CAST(sum(CAST(floor(value * 100.0 + 0.5) AS HUGEINT)
                        * CAST(floor(value * 100.0 + 0.5) AS HUGEINT))
                    AS HUGEINT) AS q
        FROM events GROUP BY 1
    ),
    agg AS (
        SELECT CAST(count(*) AS BIGINT) AS k,
               CAST(sum(n) AS BIGINT) AS nn,
               CAST(sum(s) AS HUGEINT) AS st,
               CAST(sum(q) AS HUGEINT) AS qt,
               CAST(sum(CAST(n AS HUGEINT) * n) AS HUGEINT) AS nsq,
               CAST(sum(CAST(floor(CAST(s AS DOUBLE) * s / n * 10000.0
                                   + 0.5) AS HUGEINT)) AS HUGEINT) AS ssq
        FROM per
    )
    SELECT k AS n_groups, nn AS n_rows,
           {sql_srnd(
               "((CAST(ssq AS DOUBLE) / 10000.0"
               "   - CAST(st AS DOUBLE) * st / nn) / (k - 1)"
               " - (CAST(qt AS DOUBLE)"
               "   - CAST(ssq AS DOUBLE) / 10000.0) / (nn - k))"
               " / ((CAST(ssq AS DOUBLE) / 10000.0"
               "   - CAST(st AS DOUBLE) * st / nn) / (k - 1)"
               " + ((CAST(nn AS DOUBLE) - CAST(nsq AS DOUBLE) / nn)"
               "     / (k - 1) - 1.0)"
               "   * (CAST(qt AS DOUBLE)"
               "     - CAST(ssq AS DOUBLE) / 10000.0) / (nn - k))", 6
           )} AS icc1
    FROM agg
    """,
)
def q_icc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-way intraclass correlation ICC(1,1) (C259): how much of
    event-value variance lives BETWEEN users vs within them —
    ICC = (MSB − MSW)/(MSB + (n₀−1)·MSW) with the unbalanced-design
    n₀ = (N − Σnᵢ²/N)/(k−1) — the variance-decomposition member of
    the agreement battery (C150/C216/C218/C256 measure label
    agreement; ICC measures continuous-measurement clustering, and
    is the number behind design effects in clustered experiments).

    Determinism: per-user n/Σx/Σx² exact; the one rational
    cross-group sum ΣSᵢ²/nᵢ is per-group floor-quantized (1e-4) and
    summed in HUGEINT/DECIMAL (C69 discipline); MSB/MSW/n₀ assemble
    in one spelled form; one srnd6.

    Scale shape: one user-keyed partial agg + a 1-row reduce — no
    joins, no windows.
    """
    ev = load_table(spark, sf_dir, "events")
    dec = "decimal(38,0)"
    cents = F.floor(F.col("value") * 100.0 + 0.5).cast("long")
    per = ev.groupBy("user_id").agg(
        F.count("*").cast("long").alias("n"),
        F.sum(cents).cast("long").alias("s"),
        F.sum(cents.cast(dec) * cents).alias("q"),
    )
    agg = per.agg(
        F.count("*").cast("long").alias("k"),
        F.sum("n").cast("long").alias("nn"),
        F.sum(F.col("s").cast(dec)).alias("st"),
        F.sum("q").alias("qt"),
        F.sum(F.col("n").cast(dec) * F.col("n")).alias("nsq"),
        F.sum(
            F.floor(
                F.col("s").cast("double") * F.col("s") / F.col("n") * 1e4
                + 0.5
            ).cast(dec)
        ).alias("ssq"),
    )
    k = F.col("k").cast("double")
    nn = F.col("nn").cast("double")
    ssq = F.col("ssq").cast("double") / 1e4
    ssb = ssq - F.col("st").cast("double") * F.col("st") / F.col("nn")
    ssw = F.col("qt").cast("double") - ssq
    msb = ssb / (F.col("k") - 1)
    msw = ssw / (F.col("nn") - F.col("k"))
    n0 = (nn - F.col("nsq").cast("double") / F.col("nn")) / (F.col("k") - 1)
    return agg.select(
        F.col("k").alias("n_groups"),
        F.col("nn").alias("n_rows"),
        srnd((msb - msw) / (msb + (n0 - 1.0) * msw), 6).alias("icc1"),
    )


# ------------------- C260 Bhattacharyya coefficient between sources

_BH_A, _BH_B = "src0", "src1"


@query(
    "q_bhattacharyya",
    oracle=f"""
    WITH cells AS (
        SELECT lang,
               CAST(sum(CASE WHEN source = '{_BH_A}' THEN 1 ELSE 0 END)
                    AS BIGINT) AS a,
               CAST(sum(CASE WHEN source = '{_BH_B}' THEN 1 ELSE 0 END)
                    AS BIGINT) AS b
        FROM documents WHERE source IN ('{_BH_A}', '{_BH_B}')
        GROUP BY 1
    ),
    tot AS (
        SELECT CAST(sum(a) AS BIGINT) AS na, CAST(sum(b) AS BIGINT) AS nb,
               CAST(count(*) AS BIGINT) AS n_langs
        FROM cells
    ),
    q AS (
        SELECT (SELECT n_langs FROM tot) AS n_langs,
               CAST(sum(CAST(floor(
                   sqrt((CAST(a AS DOUBLE) / (SELECT na FROM tot))
                        * (CAST(b AS DOUBLE) / (SELECT nb FROM tot)))
                   * 100000000.0 + 0.5) AS BIGINT)) AS BIGINT) AS bcq
        FROM cells
    )
    SELECT n_langs,
           {sql_srnd("CAST(bcq AS DOUBLE) / 100000000.0", 6)} AS bc,
           {sql_srnd("-ln(CAST(bcq AS DOUBLE) / 100000000.0)", 6)}
               AS bhattacharyya_dist
    FROM q
    """,
)
def q_bhattacharyya(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bhattacharyya coefficient and distance (C260) between the
    language mixes of two sources: BC = Σᵢ √(pᵢqᵢ), D_B = −ln BC —
    the overlap member of the divergence battery (C136 KL is
    asymmetric and blows up on zeros; C169 JS is its smoothed
    symmetrization; BC/D_B bound the Bayes error between the two
    mixes, which is why classifier-feasibility audits quote it).
    Zero-support cells contribute exactly 0 on both engines.

    Determinism: cell counts exact; each √(pq) term floor-quantizes
    to 1e-8 integer units before the cross-cell sum (bounded lang
    domain, C69 discipline); the distance re-derives from the SAME
    quantized BC; two srnd6 outputs.

    Scale shape: one filtered conditional-count groupBy(lang) (the
    cells frame is lang-domain-bounded) + a 1-row reduce.
    """
    d = load_table(spark, sf_dir, "documents").filter(
        F.col("source").isin(_BH_A, _BH_B)
    )
    cells = d.groupBy("lang").agg(
        F.sum(F.when(F.col("source") == _BH_A, 1).otherwise(0))
        .cast("long")
        .alias("a"),
        F.sum(F.when(F.col("source") == _BH_B, 1).otherwise(0))
        .cast("long")
        .alias("b"),
    )
    tot = cells.agg(
        F.sum("a").cast("long").alias("na"),
        F.sum("b").cast("long").alias("nb"),
        F.count("*").cast("long").alias("n_langs"),
    )
    q = (
        cells.crossJoin(F.broadcast(tot))
        .agg(
            F.max("n_langs").alias("n_langs"),
            F.sum(
                F.floor(
                    F.sqrt(
                        (F.col("a").cast("double") / F.col("na"))
                        * (F.col("b").cast("double") / F.col("nb"))
                    )
                    * 1e8
                    + 0.5
                ).cast("long")
            )
            .cast("long")
            .alias("bcq"),
        )
    )
    bc = F.col("bcq").cast("double") / 1e8
    return q.select(
        "n_langs",
        srnd(bc, 6).alias("bc"),
        srnd(-F.log(bc), 6).alias("bhattacharyya_dist"),
    )


# ------------------------- C261 Matthews correlation coefficient

_MCC_CUT = 650  # same operating point as C99's fixed-threshold TP/FP


@query(
    "q_mcc",
    oracle=f"""
    WITH scored AS (
        SELECT (CAST('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 8)
                     AS BIGINT) % 1000
                + 300 * CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END)
                   AS s,
               CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS y
        FROM orders
    ),
    c AS (
        SELECT
            CAST(sum(CASE WHEN s >= {_MCC_CUT} AND y = 1 THEN 1 ELSE 0 END)
                 AS BIGINT) AS tp,
            CAST(sum(CASE WHEN s >= {_MCC_CUT} AND y = 0 THEN 1 ELSE 0 END)
                 AS BIGINT) AS fp,
            CAST(sum(CASE WHEN s < {_MCC_CUT} AND y = 0 THEN 1 ELSE 0 END)
                 AS BIGINT) AS tn,
            CAST(sum(CASE WHEN s < {_MCC_CUT} AND y = 1 THEN 1 ELSE 0 END)
                 AS BIGINT) AS fn
        FROM scored
    )
    SELECT tp, fp, tn, fn,
           {sql_srnd(
               "CAST(CAST(tp AS HUGEINT) * tn - CAST(fp AS HUGEINT) * fn"
               "     AS DOUBLE)"
               " / sqrt((CAST(tp AS DOUBLE) + fp) * (CAST(tp AS DOUBLE) + fn)"
               "      * (CAST(tn AS DOUBLE) + fp) * (CAST(tn AS DOUBLE) + fn))",
               6,
           )} AS mcc
    FROM c
    """,
)
def q_mcc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Matthews correlation coefficient (C261) at the s ≥ {cut}
    operating point of C99's deterministic scorer — the
    single-number classifier summary that, unlike accuracy or F1,
    stays honest under class imbalance (it is the φ correlation of
    the 2×2 confusion table, so chance = 0 regardless of prevalence);
    completes the classification battery (C163 confusion matrix,
    C209 PR-AUC, C250 Youden J, C99 ROC).

    Determinism: four exact conditional counts; the numerator
    tp·tn − fp·fn in HUGEINT/DECIMAL (crosses int64 by sf100); the
    denominator's four factors multiply in ONE spelled double order;
    one srnd6.

    Scale shape: a single map-side-combining 1-row aggregate over
    the scan — the cheapest member of the battery by construction.
    """
    o = load_table(spark, sf_dir, "orders")
    dec = "decimal(38,0)"
    y = F.when(F.col("o_orderstatus") == "F", 1).otherwise(0)
    h = F.conv(
        F.substring(F.md5(F.col("o_orderkey").cast("string")), 1, 8), 16, 10
    ).cast("long")
    s = h % 1000 + 300 * y
    pred = s >= _MCC_CUT
    c = o.agg(
        F.sum(F.when(pred & (y == 1), 1).otherwise(0)).cast("long").alias("tp"),
        F.sum(F.when(pred & (y == 0), 1).otherwise(0)).cast("long").alias("fp"),
        F.sum(F.when(~pred & (y == 0), 1).otherwise(0)).cast("long").alias("tn"),
        F.sum(F.when(~pred & (y == 1), 1).otherwise(0)).cast("long").alias("fn"),
    )
    tp, fp = F.col("tp"), F.col("fp")
    tn, fn = F.col("tn"), F.col("fn")
    num = (tp.cast(dec) * tn - fp.cast(dec) * fn).cast("double")
    den = F.sqrt(
        (tp.cast("double") + fp)
        * (tp.cast("double") + fn)
        * (tn.cast("double") + fp)
        * (tn.cast("double") + fn)
    )
    return c.select("tp", "fp", "tn", "fn", srnd(num / den, 6).alias("mcc"))


q_mcc.__doc__ = q_mcc.__doc__.format(cut=_MCC_CUT)


# --------------------- C262 permutation entropy of daily revenue

_PE_NORM_PATTERNS = 6  # m=3 ordinal patterns


@query(
    "q_perm_entropy",
    oracle=f"""
    WITH daily AS (
        SELECT strftime(o_orderdate, '%Y-%m-%d') AS day,
               CAST(sum(CAST(floor(o_totalprice + 0.5) AS BIGINT))
                    AS BIGINT) AS rev
        FROM orders GROUP BY 1
    ),
    tri AS (
        SELECT rev AS a,
               lead(rev, 1) OVER (ORDER BY day) AS b,
               lead(rev, 2) OVER (ORDER BY day) AS c
        FROM daily
    ),
    pat AS (
        SELECT CASE
                 WHEN a < b AND b < c THEN 0
                 WHEN a < c AND c <= b THEN 1
                 WHEN b <= a AND a < c THEN 2
                 WHEN c <= a AND a < b THEN 3
                 WHEN b < c AND c <= a THEN 4
                 ELSE 5
               END AS p
        FROM tri WHERE b IS NOT NULL AND c IS NOT NULL
    ),
    cnt AS (
        SELECT p, CAST(count(*) AS BIGINT) AS n FROM pat GROUP BY 1
    ),
    agg AS (
        SELECT CAST(sum(n) AS BIGINT) AS nw,
               CAST(count(*) AS BIGINT) AS np,
               CAST(sum(CAST(floor(
                   -(CAST(n AS DOUBLE) / (SELECT sum(n) FROM cnt))
                   * ln(CAST(n AS DOUBLE) / (SELECT sum(n) FROM cnt))
                   * 100000000.0 + 0.5) AS BIGINT)) AS BIGINT) AS hq
        FROM cnt
    )
    SELECT nw AS n_windows, np AS n_patterns,
           {sql_srnd("CAST(hq AS DOUBLE) / 100000000.0", 6)} AS perm_entropy,
           {sql_srnd(
               "CAST(hq AS DOUBLE) / 100000000.0"
               f" / ln({_PE_NORM_PATTERNS}.0)", 6
           )} AS normalized
    FROM agg
    """,
)
def q_perm_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Permutation entropy, order m=3 (C262): the Shannon entropy of
    the ordinal-pattern distribution over consecutive daily-revenue
    triples (Bandt–Pompe) — the model-free complexity measure that
    complements C104/C249's change detectors: THEY flag a level
    shift, THIS flags when the series' local dynamics become noise
    (H → ln 6) or lock into a trend (H → 0), i.e. when forecasting
    (C129/C144) stops being worth running.

    Tie rule: ties collapse via strict-< comparisons with
    earlier-index precedence (the standard Bandt–Pompe convention),
    spelled as ONE 6-way CASE identical on both engines — no float
    ranks, no sort within the triple.

    Determinism: integer daily revenue; pattern counts exact; each
    −p·ln p term floor-quantizes (1e-8) before the ≤6-row sum; two
    srnd6 outputs (normalized = H/ln 6).

    Scale shape: calendar-bounded after the daily collapse (C249's
    shape): one ordered lead window over ~2.4k rows, a ≤6-row
    pattern agg, a 1-row reduce.
    """
    o = load_table(spark, sf_dir, "orders")
    daily = o.groupBy(
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("day")
    ).agg(
        F.sum(F.floor(F.col("o_totalprice") + 0.5).cast("long")).alias("rev")
    )
    w = Window.orderBy("day")
    tri = daily.select(
        F.col("rev").alias("a"),
        F.lead("rev", 1).over(w).alias("b"),
        F.lead("rev", 2).over(w).alias("c"),
    ).filter(F.col("b").isNotNull() & F.col("c").isNotNull())
    a, b, c = F.col("a"), F.col("b"), F.col("c")
    p = (
        F.when((a < b) & (b < c), 0)
        .when((a < c) & (c <= b), 1)
        .when((b <= a) & (a < c), 2)
        .when((c <= a) & (a < b), 3)
        .when((b < c) & (c <= a), 4)
        .otherwise(5)
    )
    cnt = tri.select(p.alias("p")).groupBy("p").agg(
        F.count("*").cast("long").alias("n")
    )
    tot = cnt.agg(F.sum("n").cast("long").alias("nw"))
    agg = (
        cnt.crossJoin(F.broadcast(tot))
        .agg(
            F.max("nw").alias("nw"),
            F.count("*").cast("long").alias("np"),
            F.sum(
                F.floor(
                    -(F.col("n").cast("double") / F.col("nw"))
                    * F.log(F.col("n").cast("double") / F.col("nw"))
                    * 1e8
                    + 0.5
                ).cast("long")
            )
            .cast("long")
            .alias("hq"),
        )
    )
    h = F.col("hq").cast("double") / 1e8
    import math

    return agg.select(
        F.col("nw").alias("n_windows"),
        F.col("np").alias("n_patterns"),
        srnd(h, 6).alias("perm_entropy"),
        srnd(h / math.log(_PE_NORM_PATTERNS), 6).alias("normalized"),
    )
