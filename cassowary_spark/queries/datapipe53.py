"""Round-11 wave 56 (SURVEY.md §2): data-contract audits a warehouse
runs before trusting a batch — referential integrity (C196), primary-
key uniqueness (C197), per-source freshness lag (C198) and a column
null/blank profile (C199).

C97's data-contract check validates one table's value ranges; this
wave audits the RELATIONSHIPS and operational health a 100 TB lake
breaks first: dangling foreign keys after partial loads, duplicate
primary keys after at-least-once ingestion, stale sources, and silent
null creep. All four reduce to partial aggregates and anti-joins —
no corpus sort, no window over anything row-sized.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cassowary_spark.exprs import sql_srnd, srnd
from cassowary_spark.registry import query
from cassowary_spark.tables import load_table

# ------------------------------- C196 referential-integrity audit


@query(
    "q_referential_integrity",
    oracle=f"""
    WITH e1 AS (
        SELECT 'lineitem.l_orderkey->orders' AS edge,
               CAST(count(*) AS BIGINT) AS n_child,
               CAST(sum(CASE WHEN o.o_orderkey IS NULL THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_orphans
        FROM lineitem l LEFT JOIN orders o ON l.l_orderkey = o.o_orderkey
    ),
    e2 AS (
        SELECT 'lineitem.l_partkey->part' AS edge,
               CAST(count(*) AS BIGINT) AS n_child,
               CAST(sum(CASE WHEN p.p_partkey IS NULL THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_orphans
        FROM lineitem l LEFT JOIN part p ON l.l_partkey = p.p_partkey
    ),
    e3 AS (
        SELECT 'orders.o_custkey->customer' AS edge,
               CAST(count(*) AS BIGINT) AS n_child,
               CAST(sum(CASE WHEN c.c_custkey IS NULL THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_orphans
        FROM orders o LEFT JOIN customer c ON o.o_custkey = c.c_custkey
    ),
    e4 AS (
        SELECT 'customer.c_nationkey->nation' AS edge,
               CAST(count(*) AS BIGINT) AS n_child,
               CAST(sum(CASE WHEN n.n_nationkey IS NULL THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_orphans
        FROM customer c LEFT JOIN nation n ON c.c_nationkey = n.n_nationkey
    ),
    u AS (SELECT * FROM e1 UNION ALL SELECT * FROM e2
          UNION ALL SELECT * FROM e3 UNION ALL SELECT * FROM e4)
    SELECT edge, n_child, n_orphans,
           {sql_srnd(
               "CAST(n_orphans AS DOUBLE) / CAST(n_child AS DOUBLE)",
               6)} AS orphan_rate
    FROM u
    """,
)
def q_referential_integrity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Referential-integrity audit (C196): orphan counts and rates
    for every foreign-key edge of the star schema (lineitem→orders,
    lineitem→part, orders→customer, customer→nation) — the
    post-load check that catches partial ingestion (children landed,
    parents didn't) before a downstream join silently drops rows.

    Determinism: orphan detection is null-probing left joins on
    integer keys; counts are exact BIGINTs, the rate one srnd6
    division.

    Scale shape: each edge is ONE equi-join keyed on the FK — the
    child side shuffles by its key once and collapses to a 1-row
    aggregate on the map side of the join output; parent sides that
    are catalog-sized (nation, and part/customer at fixture scale)
    broadcast under AQE, orders-sized parents co-partition. The
    union glues four 1-row frames. Distinct-parent-key dedup is
    unnecessary (parents are PK sides). No corpus-wide sort or
    window anywhere.
    """
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    p = load_table(spark, sf_dir, "part")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")

    def edge(child, ck, parent, pk, name):
        j = child.select(F.col(ck)).join(
            parent.select(F.col(pk)), child[ck] == parent[pk], "left"
        )
        return j.agg(
            F.lit(name).alias("edge"),
            F.count("*").cast("long").alias("n_child"),
            F.sum(F.when(F.col(pk).isNull(), 1).otherwise(0))
            .cast("long")
            .alias("n_orphans"),
        )

    u = (
        edge(li, "l_orderkey", o, "o_orderkey", "lineitem.l_orderkey->orders")
        .unionAll(edge(li, "l_partkey", p, "p_partkey", "lineitem.l_partkey->part"))
        .unionAll(edge(o, "o_custkey", c, "c_custkey", "orders.o_custkey->customer"))
        .unionAll(edge(c, "c_nationkey", n, "n_nationkey", "customer.c_nationkey->nation"))
    )
    return u.select(
        "edge",
        "n_child",
        "n_orphans",
        srnd(
            F.col("n_orphans").cast("double") / F.col("n_child").cast("double"),
            6,
        ).alias("orphan_rate"),
    )


# ------------------------------------ C197 primary-key uniqueness


@query(
    "q_pk_uniqueness",
    oracle=f"""
    WITH t1 AS (
        SELECT 'orders(o_orderkey)' AS pk,
               CAST(count(*) AS BIGINT) AS n_rows,
               CAST(count(DISTINCT o_orderkey) AS BIGINT) AS n_keys
        FROM orders
    ),
    t2 AS (
        SELECT 'lineitem(l_orderkey,l_linenumber)' AS pk,
               CAST(count(*) AS BIGINT) AS n_rows,
               CAST(count(DISTINCT (l_orderkey, l_linenumber)) AS BIGINT)
                   AS n_keys
        FROM lineitem
    ),
    t3 AS (
        SELECT 'events(event_id)' AS pk,
               CAST(count(*) AS BIGINT) AS n_rows,
               CAST(count(DISTINCT event_id) AS BIGINT) AS n_keys
        FROM events
    ),
    t4 AS (
        SELECT 'documents(doc_id)' AS pk,
               CAST(count(*) AS BIGINT) AS n_rows,
               CAST(count(DISTINCT doc_id) AS BIGINT) AS n_keys
        FROM documents
    ),
    u AS (SELECT * FROM t1 UNION ALL SELECT * FROM t2
          UNION ALL SELECT * FROM t3 UNION ALL SELECT * FROM t4)
    SELECT pk, n_rows, n_keys,
           CAST(n_rows - n_keys AS BIGINT) AS dup_rows,
           {sql_srnd(
               "CAST(n_rows - n_keys AS DOUBLE)"
               " / CAST(n_rows AS DOUBLE)", 6)} AS dup_rate
    FROM u
    """,
)
def q_pk_uniqueness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Primary-key uniqueness audit (C197): declared-PK row vs key
    counts for the four row-identity tables (orders, lineitem's
    composite key, events, documents) — the at-least-once-delivery
    check (C1 dedups documents by content; this audits the KEY
    contract itself, the thing MERGE and CDC apply steps assume).

    Determinism: exact BIGINT counts; dup_rate one srnd6 division.

    Scale shape: count(DISTINCT key) compiles to a two-phase
    aggregate — partial distinct per partition, merged on the key
    shuffle — never a global sort; the composite key dedups on the
    pair directly (no concat-string materialization). Four
    independent 1-row aggregates unioned.
    """
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    ev = load_table(spark, sf_dir, "events")
    d = load_table(spark, sf_dir, "documents")

    def audit(df, name, *keys):
        return df.agg(
            F.lit(name).alias("pk"),
            F.count("*").cast("long").alias("n_rows"),
            F.countDistinct(*keys).cast("long").alias("n_keys"),
        )

    u = (
        audit(o, "orders(o_orderkey)", "o_orderkey")
        .unionAll(
            audit(
                li,
                "lineitem(l_orderkey,l_linenumber)",
                "l_orderkey",
                "l_linenumber",
            )
        )
        .unionAll(audit(ev, "events(event_id)", "event_id"))
        .unionAll(audit(d, "documents(doc_id)", "doc_id"))
    )
    return u.select(
        "pk",
        "n_rows",
        "n_keys",
        (F.col("n_rows") - F.col("n_keys")).cast("long").alias("dup_rows"),
        srnd(
            (F.col("n_rows") - F.col("n_keys")).cast("double")
            / F.col("n_rows").cast("double"),
            6,
        ).alias("dup_rate"),
    )


# ------------------------------------- C198 per-source freshness


@query(
    "q_freshness_lag",
    oracle="""
    WITH per AS (
        SELECT event_type,
               CAST(count(*) AS BIGINT) AS n_events,
               max(ts) AS last_ts
        FROM events GROUP BY 1
    ),
    g AS (SELECT max(ts) AS gmax FROM events)
    SELECT event_type, n_events,
           CAST(date_diff('second', last_ts, (SELECT gmax FROM g))
                AS BIGINT) AS lag_s,
           CAST(CASE WHEN date_diff('second', last_ts,
                                    (SELECT gmax FROM g)) > 86400
                THEN 1 ELSE 0 END AS INT) AS stale
    FROM per
    """,
)
def q_freshness_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source freshness audit (C198): each event type's lag (in
    seconds) behind the corpus high-water mark, with a 24 h
    staleness flag — the "is this feed still alive" check a
    streaming-ingest lake alerts on (S4 handles late DATA; this
    detects late SOURCES).

    Determinism: timestamps compare exactly (µs-precision parquet
    values); the lag is an integer second diff, the flag a
    comparison on that exact integer.

    Scale shape: one event_type-keyed partial-agg max (map-side
    combined; type cardinality is catalog-sized) plus a 1-row global
    max that broadcasts back — two scans collapse to a ≤ |types|-row
    frame before anything joins. No sort, no window.
    """
    ev = load_table(spark, sf_dir, "events").select("event_type", "ts")
    per = ev.groupBy("event_type").agg(
        F.count("*").cast("long").alias("n_events"),
        F.max("ts").alias("last_ts"),
    )
    g = ev.agg(F.max("ts").alias("gmax"))
    lag = (
        F.unix_timestamp("gmax") - F.unix_timestamp("last_ts")
    ).cast("long")
    return per.crossJoin(F.broadcast(g)).select(
        "event_type",
        "n_events",
        lag.alias("lag_s"),
        F.when(lag > 86400, 1).otherwise(0).cast("int").alias("stale"),
    )


# ------------------------------------------ C199 null/blank profile


@query(
    "q_null_profile",
    oracle=f"""
    WITH c1 AS (
        SELECT 'user_id' AS col,
               CAST(sum(CASE WHEN user_id IS NULL THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_null,
               CAST(0 AS BIGINT) AS n_blank,
               CAST(count(DISTINCT user_id) AS BIGINT) AS n_distinct
        FROM events
    ),
    c2 AS (
        SELECT 'event_type' AS col,
               CAST(sum(CASE WHEN event_type IS NULL THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_null,
               CAST(sum(CASE WHEN trim(event_type) = '' THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_blank,
               CAST(count(DISTINCT event_type) AS BIGINT) AS n_distinct
        FROM events
    ),
    c3 AS (
        SELECT 'value' AS col,
               CAST(sum(CASE WHEN value IS NULL THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_null,
               CAST(0 AS BIGINT) AS n_blank,
               CAST(count(DISTINCT value) AS BIGINT) AS n_distinct
        FROM events
    ),
    c4 AS (
        SELECT 'props' AS col,
               CAST(sum(CASE WHEN props IS NULL THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_null,
               CAST(sum(CASE WHEN props IS NOT NULL
                             AND trim(props) IN ('', '{{}}')
                        THEN 1 ELSE 0 END) AS BIGINT) AS n_blank,
               CAST(count(DISTINCT props) AS BIGINT) AS n_distinct
        FROM events
    ),
    u AS (SELECT * FROM c1 UNION ALL SELECT * FROM c2
          UNION ALL SELECT * FROM c3 UNION ALL SELECT * FROM c4),
    n AS (SELECT CAST(count(*) AS BIGINT) AS nn FROM events)
    SELECT col, n_null, n_blank, n_distinct,
           {sql_srnd(
               "CAST(n_null + n_blank AS DOUBLE)"
               " / CAST((SELECT nn FROM n) AS DOUBLE)", 6)}
               AS missing_rate
    FROM u
    """,
)
def q_null_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column null/blank profile (C199): per-column null, blank
    ('' / '{}' payloads) and distinct counts over the events feed
    with a combined missing rate — the null-creep detector (an
    upstream schema change that starts emitting empty props shows
    here a round before it breaks a consumer; C54 profiles value
    DISTRIBUTIONS, this audits presence).

    Determinism: exact BIGINT counts; distinct counts on exact
    column values (the double column's distinct compares binary
    values, identical in both engines); one srnd6 rate.

    Scale shape: all four column audits fold into ONE aggregate
    pass over the scan (Spark side — a single wide agg, one job; the
    oracle spells per-column CTEs for clarity); count(DISTINCT) per
    column expands to the standard expand+partial-distinct plan, the
    shuffle carrying distinct values only. The union output is 4
    rows assembled from one 1-row frame.
    """
    ev = load_table(spark, sf_dir, "events")
    nn = F.count("*").cast("long")
    wide = ev.agg(
        nn.alias("nn"),
        F.sum(F.when(F.col("user_id").isNull(), 1).otherwise(0))
        .cast("long")
        .alias("u_null"),
        F.countDistinct("user_id").cast("long").alias("u_dist"),
        F.sum(F.when(F.col("event_type").isNull(), 1).otherwise(0))
        .cast("long")
        .alias("t_null"),
        F.sum(F.when(F.trim(F.col("event_type")) == "", 1).otherwise(0))
        .cast("long")
        .alias("t_blank"),
        F.countDistinct("event_type").cast("long").alias("t_dist"),
        F.sum(F.when(F.col("value").isNull(), 1).otherwise(0))
        .cast("long")
        .alias("v_null"),
        F.countDistinct("value").cast("long").alias("v_dist"),
        F.sum(F.when(F.col("props").isNull(), 1).otherwise(0))
        .cast("long")
        .alias("p_null"),
        F.sum(
            F.when(
                F.col("props").isNotNull()
                & F.trim(F.col("props")).isin("", "{}"),
                1,
            ).otherwise(0)
        )
        .cast("long")
        .alias("p_blank"),
        F.countDistinct("props").cast("long").alias("p_dist"),
    )
    zero = F.lit(0).cast("long")
    rows = [
        ("user_id", F.col("u_null"), zero, F.col("u_dist")),
        ("event_type", F.col("t_null"), F.col("t_blank"), F.col("t_dist")),
        ("value", F.col("v_null"), zero, F.col("v_dist")),
        ("props", F.col("p_null"), F.col("p_blank"), F.col("p_dist")),
    ]
    # pivot the 1-row wide agg to 4 rows via inline(array(struct...)) —
    # a union of selects would re-execute the aggregate (and re-scan
    # events) once per column
    structs = [
        F.struct(
            F.lit(name).alias("col"),
            n_null.alias("n_null"),
            n_blank.alias("n_blank"),
            n_dist.alias("n_distinct"),
            srnd(
                (n_null + n_blank).cast("double") / F.col("nn").cast("double"),
                6,
            ).alias("missing_rate"),
        )
        for name, n_null, n_blank, n_dist in rows
    ]
    return wide.select(F.inline(F.array(*structs)))
