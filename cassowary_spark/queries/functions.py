"""Scalar-function batteries (SURVEY.md §2 B33–B41).

Each query exercises a family in one projection so the oracle hash
covers every function. Functions whose cross-engine semantics diverge
(initcap, months_between, bround, murmur hash, …) are exercised in
unit tests instead of oracle pairs — divergence there is legitimate,
not a bug. All expressions are JVM-side built-ins: whole-stage
codegen, no Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cassowary_spark.exprs import sql_srnd, srnd
from cassowary_spark.registry import query
from cassowary_spark.tables import load_table


@query(
    "q_fn_string",
    oracle="""
    SELECT p_partkey,
           length(p_name)                                   AS len_name,
           upper(p_brand)                                   AS up_brand,
           lower(p_type)                                    AS lo_type,
           substr(p_name, 1, 5)                             AS name5,
           lpad(p_brand, 12, '*')                           AS brand_lpad,
           rpad(p_brand, 12, '#')                           AS brand_rpad,
           trim(concat('  ', p_brand, '  '))                AS brand_trim,
           len(string_split(p_type, ' '))                   AS n_type_words,
           regexp_extract(p_name, '([a-z]+)', 1)            AS first_word,
           regexp_replace(p_name, '[aeiou]', '', 'g')       AS no_vowels,
           translate(p_brand, '#B', '_b')                   AS brand_tr,
           instr(p_name, 'a')                               AS pos_a,
           reverse(p_brand)                                 AS brand_rev,
           repeat(p_type, 2)                                AS type_x2,
           concat_ws('-', p_brand, p_type)                  AS brand_type,
           printf('%s:%d', p_brand, p_size)                 AS brand_size
    FROM part
    """,
)
def q_fn_string(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String battery (B33). Spark regexp_replace is global; DuckDB
    needs the 'g' flag — encoded in the oracle."""
    p = load_table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.length("p_name").alias("len_name"),
        F.upper("p_brand").alias("up_brand"),
        F.lower("p_type").alias("lo_type"),
        F.substring("p_name", 1, 5).alias("name5"),
        F.lpad("p_brand", 12, "*").alias("brand_lpad"),
        F.rpad("p_brand", 12, "#").alias("brand_rpad"),
        F.trim(F.concat(F.lit("  "), F.col("p_brand"), F.lit("  "))).alias("brand_trim"),
        F.size(F.split("p_type", " ")).alias("n_type_words"),
        F.regexp_extract("p_name", "([a-z]+)", 1).alias("first_word"),
        F.regexp_replace("p_name", "[aeiou]", "").alias("no_vowels"),
        F.translate("p_brand", "#B", "_b").alias("brand_tr"),
        F.instr("p_name", "a").alias("pos_a"),
        F.reverse("p_brand").alias("brand_rev"),
        F.repeat("p_type", 2).alias("type_x2"),
        F.concat_ws("-", "p_brand", "p_type").alias("brand_type"),
        F.format_string("%s:%d", F.col("p_brand"), F.col("p_size")).alias("brand_size"),
    )


@query(
    "q_fn_date",
    oracle="""
    SELECT o_orderkey,
           year(o_orderdate)                                  AS y,
           month(o_orderdate)                                 AS m,
           day(o_orderdate)                                   AS d,
           strftime(CAST(o_orderdate AS DATE), '%Y-%m-%d')    AS od,
           strftime(CAST(o_orderdate AS DATE) + 30, '%Y-%m-%d') AS od_plus30,
           date_diff('day', CAST(o_orderdate AS DATE), DATE '2000-01-01') AS days_to_y2k,
           strftime(CAST(CAST(o_orderdate AS DATE) + INTERVAL 3 MONTH AS DATE), '%Y-%m-%d') AS od_plus3m,
           date_trunc('month', o_orderdate)                   AS month_start,
           strftime(o_orderdate, '%Y-%m-%d')                  AS od_str,
           epoch_ms(o_orderdate)                              AS epoch_millis,
           strftime(last_day(CAST(o_orderdate AS DATE)), '%Y-%m-%d') AS month_end,
           CAST(quarter(o_orderdate) AS INT)                  AS qtr
    FROM orders
    """,
)
def q_fn_date(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/time battery (B34) on the timestamp-typed o_orderdate.

    DATE-typed results are stringified on both sides: Spark/Arrow
    surfaces dates as python date objects while DuckDB/pandas uses
    datetime64, so raw DATE columns hash differently engine-to-engine.
    """
    o = load_table(spark, sf_dir, "orders")
    od = F.col("o_orderdate")
    odate = od.cast("date")
    iso = "yyyy-MM-dd"
    return o.select(
        "o_orderkey",
        F.year(od).alias("y"),
        F.month(od).alias("m"),
        F.dayofmonth(od).alias("d"),
        F.date_format(odate, iso).alias("od"),
        F.date_format(F.date_add(odate, 30), iso).alias("od_plus30"),
        F.datediff(F.lit("2000-01-01").cast("date"), odate).alias("days_to_y2k"),
        F.date_format(F.add_months(odate, 3), iso).alias("od_plus3m"),
        F.date_trunc("month", od).alias("month_start"),
        F.date_format(od, "yyyy-MM-dd").alias("od_str"),
        # parquet timestamps read as TIMESTAMP_NTZ in Spark 4; session
        # TZ is UTC so the NTZ→instant cast matches DuckDB's epoch_ms.
        F.unix_millis(od.cast("timestamp")).alias("epoch_millis"),
        F.date_format(F.last_day(odate), iso).alias("month_end"),
        F.quarter(od).alias("qtr"),
    )


@query(
    "q_fn_math",
    oracle="""
    SELECT s_suppkey,
           abs(s_acctbal - 500)                       AS dist500,
           floor((s_acctbal) * 10.0 + 0.5) / 10.0                        AS bal_r1,
           ceil(s_acctbal)                            AS bal_ceil,
           floor(s_acctbal)                           AS bal_floor,
           floor((exp(s_acctbal / 1000)) * 10000.0 + 0.5) / 10000.0            AS e_bal,
           floor((ln(abs(s_acctbal) + 1)) * 10000.0 + 0.5) / 10000.0                AS ln_bal,
           floor((log10(abs(s_acctbal) + 1)) * 10000.0 + 0.5) / 10000.0             AS log10_bal,
           floor((log2(abs(s_acctbal) + 1)) * 10000.0 + 0.5) / 10000.0              AS log2_bal,
           floor((pow(s_acctbal, 2)) * 100.0 + 0.5) / 100.0                AS bal_sq,
           floor((sqrt(abs(s_acctbal))) * 10000.0 + 0.5) / 10000.0             AS bal_sqrt,
           sign(s_acctbal - 500)                      AS bal_sign,
           floor((sin(s_acctbal / 100)) * 10000.0 + 0.5) / 10000.0             AS sin_b,
           floor((cos(s_acctbal / 100)) * 10000.0 + 0.5) / 10000.0             AS cos_b,
           floor((degrees(s_acctbal / 1000)) * 10000.0 + 0.5) / 10000.0        AS deg_b,
           floor((radians(s_acctbal)) * 10000.0 + 0.5) / 10000.0               AS rad_b,
           ((s_suppkey % 7) + 7) % 7                  AS pmod7
    FROM supplier
    """,
)
def q_fn_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math battery (B35). pmod spelled as ((x%n)+n)%n on both sides;
    transcendentals rounded (JVM vs libm last-ulp drift)."""
    s = load_table(spark, sf_dir, "supplier")
    bal = F.col("s_acctbal")
    return s.select(
        "s_suppkey",
        F.abs(bal - 500).alias("dist500"),
        srnd(bal, 1).alias("bal_r1"),
        # Spark ceil/floor → LONG but DuckDB's → DOUBLE; the driver's
        # value hash is type-sensitive (int64 != double even when equal),
        # so cast to double to match the oracle exactly (round-1 red).
        F.ceil(bal).cast("double").alias("bal_ceil"),
        F.floor(bal).cast("double").alias("bal_floor"),
        srnd(F.exp(bal / 1000), 4).alias("e_bal"),
        srnd(F.log(F.abs(bal) + 1), 4).alias("ln_bal"),
        srnd(F.log10(F.abs(bal) + 1), 4).alias("log10_bal"),
        srnd(F.log2(F.abs(bal) + 1), 4).alias("log2_bal"),
        srnd(F.pow(bal, 2), 2).alias("bal_sq"),
        srnd(F.sqrt(F.abs(bal)), 4).alias("bal_sqrt"),
        # DuckDB sign() → INTEGER, Spark signum() → DOUBLE; cast to int
        # so both engines hash the value as a python int.
        F.signum(bal - 500).cast("int").alias("bal_sign"),
        srnd(F.sin(bal / 100), 4).alias("sin_b"),
        srnd(F.cos(bal / 100), 4).alias("cos_b"),
        srnd(F.degrees(bal / 1000), 4).alias("deg_b"),
        srnd(F.radians(bal), 4).alias("rad_b"),
        (((F.col("s_suppkey") % 7) + 7) % 7).alias("pmod7"),
    )


@query(
    "q_fn_array",
    oracle="""
    SELECT vec_id,
           len(embedding)                                                   AS dim,
           floor((CAST(embedding[1] AS DOUBLE)) * 10000.0 + 0.5) / 10000.0                           AS first_elem,
           floor((list_aggregate(CAST(embedding AS DOUBLE[]), 'sum')) * 10000.0 + 0.5) / 10000.0     AS elem_sum,
           floor((CAST(list_aggregate(embedding, 'min') AS DOUBLE)) * 10000.0 + 0.5) / 10000.0       AS elem_min,
           floor((CAST(list_aggregate(embedding, 'max') AS DOUBLE)) * 10000.0 + 0.5) / 10000.0       AS elem_max,
           floor((list_aggregate(CAST(embedding[1:8] AS DOUBLE[]), 'sum')) * 10000.0 + 0.5) / 10000.0 AS head8_sum,
           len(list_distinct(embedding))                                    AS n_distinct,
           len(flatten([embedding, embedding]))                             AS dim_x2
    FROM embeddings
    """,
)
def q_fn_array(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array battery (B36) on the 64-dim embedding column.

    Array-valued results are reduced to scalars (sums/sizes/elements)
    so the oracle hash is representation-independent. Sums accumulate
    in DOUBLE on both engines, in identical element order.
    """
    e = load_table(spark, sf_dir, "embeddings")
    emb = F.col("embedding")
    dbl = F.expr("transform(embedding, x -> cast(x as double))")
    return e.select(
        "vec_id",
        F.size(emb).alias("dim"),
        srnd(F.element_at(emb, 1).cast("double"), 4).alias("first_elem"),
        srnd(F.aggregate(dbl, F.lit(0.0), lambda acc, x: acc + x), 4).alias("elem_sum"),
        srnd(F.array_min(emb).cast("double"), 4).alias("elem_min"),
        srnd(F.array_max(emb).cast("double"), 4).alias("elem_max"),
        srnd(
            F.aggregate(F.slice(dbl, 1, 8), F.lit(0.0), lambda acc, x: acc + x), 4
        ).alias("head8_sum"),
        F.size(F.array_distinct(emb)).alias("n_distinct"),
        F.size(F.flatten(F.array(emb, emb))).alias("dim_x2"),
    )


@query(
    "q_fn_map",
    oracle="""
    SELECT event_id,
           event_type                              AS m_type,
           CAST(user_id AS VARCHAR)                AS m_uid,
           2                                       AS m_size,
           'type,uid'                              AS m_keys,
           CAST(event_id % 5 AS VARCHAR)           AS parsed_k
    FROM events
    """,
)
def q_fn_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map battery (B37): build → extract → keys → str_to_map.

    The oracle states the expected *values* in plain SQL — the map
    construction/extraction round-trip happens on the Spark side.
    """
    ev = load_table(spark, sf_dir, "events")
    m = F.create_map(
        F.lit("type"), F.col("event_type"),
        F.lit("uid"), F.col("user_id").cast("string"),
    )
    parsed = F.expr("str_to_map(concat('k:', cast(event_id % 5 as string)), ',', ':')")
    return ev.select(
        "event_id",
        F.element_at(m, F.lit("type")).alias("m_type"),
        F.element_at(m, F.lit("uid")).alias("m_uid"),
        F.size(m).alias("m_size"),
        F.concat_ws(",", F.sort_array(F.map_keys(m))).alias("m_keys"),
        F.element_at(parsed, F.lit("k")).alias("parsed_k"),
    )


@query(
    "q_json_extract",
    oracle="""
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_path,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_struct
    FROM events
    """,
)
def q_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON battery (B38): get_json_object + from_json over events.props
    (covers the reference's SerDe-style decode of dynamic columns, A4)."""
    ev = load_table(spark, sf_dir, "events")
    parsed = F.from_json(F.col("props"), "struct<k: bigint>")
    return ev.select(
        "event_id",
        F.get_json_object("props", "$.k").cast("bigint").alias("k_path"),
        parsed["k"].alias("k_struct"),
    )


@query(
    "q_fn_hash",
    oracle="""
    SELECT c_custkey,
           md5(c_name)            AS name_md5,
           sha256(c_name)         AS name_sha256,
           length(md5(c_name))    AS md5_len
    FROM customer
    """,
)
def q_fn_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hash battery (B39): md5/sha2 match across engines; Spark-only
    murmur3/xxhash64 (the 100 TB bucketing workhorses) are unit-tested."""
    c = load_table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.md5("c_name").alias("name_md5"),
        F.sha2(F.col("c_name"), 256).alias("name_sha256"),
        F.length(F.md5("c_name")).alias("md5_len"),
    )


@query(
    "q_lateral_explode",
    oracle="""
    SELECT doc_id, unnest(string_split(text, ' ')) AS token
    FROM documents
    WHERE lang = 'en'
    """,
)
def q_lateral_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LATERAL VIEW explode = generator in projection (B41)."""
    d = load_table(spark, sf_dir, "documents")
    return d.filter(F.col("lang") == "en").select(
        "doc_id", F.explode(F.split("text", " ")).alias("token")
    )


@query(
    "q_fn_bitwise",
    oracle="""
    SELECT o_orderkey,
           o_orderkey & 255                          AS k_and,
           o_orderkey | 4096                         AS k_or,
           xor(o_orderkey, 1365)                     AS k_xor,
           ~o_orderkey                               AS k_not,
           o_orderkey << 2                           AS k_shl,
           o_orderkey >> 3                           AS k_shr,
           CAST(bit_count(o_orderkey) AS INT)        AS k_popcount
    FROM orders
    """,
)
def q_fn_bitwise(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise battery (B35-adjacent): and/or/xor/not, shifts, and
    popcount — the bit-twiddling surface hash-bucketing and bloom/
    minhash code leans on. All int64 JVM exprs, engine-exact."""
    o = load_table(spark, sf_dir, "orders")
    k = F.col("o_orderkey")
    return o.select(
        "o_orderkey",
        k.bitwiseAND(F.lit(255)).alias("k_and"),
        k.bitwiseOR(F.lit(4096)).alias("k_or"),
        k.bitwiseXOR(F.lit(1365)).alias("k_xor"),
        F.bitwise_not(k).alias("k_not"),
        F.shiftleft(k, 2).alias("k_shl"),
        F.shiftright(k, 3).alias("k_shr"),
        F.bit_count(k).alias("k_popcount"),
    )


@query(
    "q_variant_json",
    oracle="""
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_typed,
           CAST(NULL AS BIGINT) AS missing_path,
           CAST(json_extract_string(props, '$.k') AS BIGINT) % 10
               AS k_mod
    FROM events
    """,
)
def q_variant_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 VariantType JSON path (B38 sibling): ``parse_json``
    into the binary Variant encoding, then typed ``variant_get``
    extraction — the modern engine-native JSON path (single parse,
    binary-encoded traversal) vs B38's per-path string extraction.
    ``try_variant_get`` on an absent path returns NULL instead of
    erroring — the lenient form pipelines need on heterogeneous
    payloads. The variant column itself never reaches the output
    (engines don't share a wire format for it); every output is a
    typed extraction.

    Scale shape: zero shuffle — parse and traversal are row-local
    JVM expressions; one parse serves all three extractions (vs one
    re-parse per get_json_object path in the string form).
    """
    ev = load_table(spark, sf_dir, "events")
    v = F.parse_json(F.col("props"))
    return ev.select(
        "event_id",
        F.variant_get(v, "$.k", "bigint").alias("k_typed"),
        F.try_variant_get(v, "$.missing", "bigint").alias("missing_path"),
        (F.variant_get(v, "$.k", "bigint") % 10).alias("k_mod"),
    )


@query(
    "q_try_arithmetic",
    oracle=f"""
    SELECT l_returnflag,
           count(*) AS n_rows,
           CAST(sum(CASE WHEN l_extendedprice / (l_quantity - 25.0)
                         IS NULL THEN 1 ELSE 0 END) AS BIGINT)
               AS div_zero_nulls,
           CAST(sum(CASE WHEN TRY_CAST(
                        CASE WHEN l_orderkey % 16 = 0 THEN l_returnflag
                             ELSE CAST(l_linenumber AS VARCHAR) END
                        AS BIGINT) IS NULL
                    THEN 1 ELSE 0 END) AS BIGINT) AS bad_cast_nulls,
           CAST(sum(CASE WHEN TRY_CAST(CAST(l_linenumber AS VARCHAR)
                                       AS BIGINT) IS NOT NULL
                    THEN 1 ELSE 0 END) AS BIGINT) AS good_cast_rows,
           {sql_srnd("avg(l_extendedprice / l_quantity)", 4)} AS avg_unit
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def q_try_arithmetic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lenient arithmetic battery (B40 sibling): ``try_divide`` /
    ``try_cast`` — the NULL-on-failure forms that matter because this
    engine (Spark 4) runs with ANSI mode ON, where a plain division
    by zero or a bad cast THROWS and kills the whole job. At 100 TB
    "one malformed row aborts a 6-hour pipeline" is the failure mode;
    try_* turns it into a countable NULL. The oracle exploits
    DuckDB's NULL-on-zero-division semantics and TRY_CAST for the
    same row-level outcomes. The planted failures are RARE (~2% zero
    denominators via quantity=25, ~6% unparseable strings via the
    orderkey mod) — deliberately: try_cast's failure path is
    exception-driven in the JVM (TryEval catches a
    NumberFormatException per failing row — measured ~9 µs/row,
    5.3 s for an all-fail column at sf0.1 vs 0.25 s all-pass), so a
    benchmark that fails every row measures exception plumbing, and a
    100 TB pipeline design should budget try_* by failure RATE, not
    treat it as free. Both outcomes stay covered at every sf.

    Scale shape: all row-local expressions inside one partial agg on
    a 3-value key — zero overhead vs the throwing forms when
    failures are rare (the production case).
    """
    li = load_table(spark, sf_dir, "lineitem")
    div0 = F.try_divide(
        F.col("l_extendedprice"),
        F.col("l_quantity") - F.lit(25.0),
    )
    mixed = F.when(
        F.col("l_orderkey") % 16 == 0, F.col("l_returnflag")
    ).otherwise(F.col("l_linenumber").cast("string"))
    return li.groupBy("l_returnflag").agg(
        F.count("*").alias("n_rows"),
        F.sum(F.when(div0.isNull(), 1).otherwise(0))
        .cast("long")
        .alias("div_zero_nulls"),
        F.sum(F.when(mixed.try_cast("bigint").isNull(), 1).otherwise(0))
        .cast("long")
        .alias("bad_cast_nulls"),
        F.sum(
            F.when(
                F.col("l_linenumber")
                .cast("string")
                .try_cast("bigint")
                .isNotNull(),
                1,
            ).otherwise(0)
        )
        .cast("long")
        .alias("good_cast_rows"),
        srnd(
            F.avg(
                F.try_divide(F.col("l_extendedprice"), F.col("l_quantity"))
            ),
            4,
        ).alias("avg_unit"),
    )


@query(
    "q_collation",
    oracle="""
    WITH mixed AS (
        SELECT p_partkey,
               CASE WHEN p_partkey % 2 = 1 THEN upper(p_name)
                    ELSE p_name END AS name
        FROM part
    )
    SELECT count(*) AS n_matches,
           CAST(sum(CASE WHEN m.name <> p.p_name THEN 1 ELSE 0 END)
                AS BIGINT) AS n_cross_case
    FROM mixed m
    JOIN part p ON lower(m.name) = lower(p.p_name)
    """,
)
def q_collation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collation-aware equality (Spark 4 collated strings, B33
    sibling): a case-insensitive join expressed with
    ``collate(..., 'UNICODE_CI')`` on BOTH keys — the engine-native
    form of "join on lower()" that keeps the original strings intact
    and lets the join use collation-aware hashing instead of
    materializing a derived key column. Half the left side is
    uppercased, so ~half the matches cross case — a case-SENSITIVE
    join would drop them, which is what n_cross_case pins. The
    oracle spells the same semantics as lower()=lower() (DuckDB has
    no collated join).

    Scale shape: a plain hash equi-join — the collation rides the
    key's hash/equality functions, no extra shuffle or projection.
    """
    p = load_table(spark, sf_dir, "part")
    mixed = p.select(
        F.col("p_partkey"),
        F.when(
            F.col("p_partkey") % 2 == 1, F.upper("p_name")
        ).otherwise(F.col("p_name")).alias("name"),
    )
    orig = p.select(F.col("p_name"))
    joined = mixed.join(
        orig,
        F.collate(mixed["name"], "UNICODE_CI")
        == F.collate(orig["p_name"], "UNICODE_CI"),
    )
    return joined.agg(
        F.count("*").alias("n_matches"),
        F.sum(
            F.when(F.col("name") != F.col("p_name"), 1).otherwise(0)
        )
        .cast("long")
        .alias("n_cross_case"),
    )
