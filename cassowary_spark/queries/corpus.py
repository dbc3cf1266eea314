"""Corpus-hygiene queries (SURVEY.md §2 group C extensions).

The document-normalization stages that run FIRST in a web-scale
pretraining pipeline — before dedup/quality filtering ever sees the
text: boilerplate markup removal (HTML → clean text) and line-level
cross-document dedup (the CCNet/RefinedWeb pass that strips repeated
nav/footer lines shared across pages). Both are expressed over the
``documents`` fixture; the HTML fixture is synthesized deterministically
from it (the corpus has no markup of its own), so the oracle can check
byte-exact recovery.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from cassowary_spark.exprs import srnd, sql_srnd
from cassowary_spark.queries.llm import _DOCS_TWINS_SQL, _docs_with_twins
from cassowary_spark.registry import query
from cassowary_spark.tables import load_table

# ------------------------------------------------------------- line dedup

_LINE_TOKENS = 10


@query(
    "q_line_dedup",
    oracle=f"""
    WITH docs AS ({_DOCS_TWINS_SQL}),
    lines AS (
        SELECT doc_id, i AS line_no,
               md5(array_to_string(
                   list_slice(string_split(text, ' '),
                              i * {_LINE_TOKENS} + 1, i * {_LINE_TOKENS} + {_LINE_TOKENS}),
                   ' ')) AS line_hash
        FROM docs,
             UNNEST(range(CAST(ceil(len(string_split(text, ' ')) / {_LINE_TOKENS}.0)
                          AS BIGINT))) t(i)
    ),
    marked AS (
        SELECT doc_id, line_no,
               row_number() OVER (PARTITION BY line_hash ORDER BY doc_id, line_no)
                   AS occurrence
        FROM lines
    )
    SELECT doc_id,
           count(*) AS n_lines,
           count(*) FILTER (occurrence > 1) AS n_dup_lines,
           {sql_srnd("count(*) FILTER (occurrence > 1) * 1.0 / count(*)", 6)} AS dup_frac
    FROM marked GROUP BY doc_id
    """,
)
def q_line_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Line-level cross-document dedup accounting (C18) — the
    CCNet-style pass: split every doc into fixed 10-token lines, keep
    each line's FIRST occurrence corpus-wide (ordered by doc_id,
    line_no), and report the per-doc duplicated-line fraction a
    filtering stage would thresh on. Runs on the twin-augmented corpus
    so duplicated lines exist at every sf (each twin repeats all of
    its source's lines).

    Scale shape: the explode is row-local; the only shuffle is the
    window keyed by line_hash — md5 over 10-token lines is effectively
    unique per distinct line and uniformly distributed, so no hot keys
    (boilerplate lines DO repeat, but a window partition of ~dup-count
    rows ranks in O(n log n) per key — it never self-joins, unlike
    pair-based dedup). Per-doc reassembly is a second groupBy keyed by
    doc_id. Both keys are high-cardinality and skew-free.
    """
    base = _docs_with_twins(spark, sf_dir)
    toks = base.select("doc_id", F.split("text", " ").alias("toks"))
    n_lines = F.ceil(F.size("toks") / float(_LINE_TOKENS)).cast("int")
    # size(toks)=0 would make sequence(0, -1) emit [0, -1] (Spark
    # defaults to step -1 when start > stop) — two bogus lines where
    # the oracle's range(0) is empty. Empty docs must yield an empty
    # index array so posexplode drops them, exactly like DuckDB.
    line_idx = F.when(n_lines > 0, F.sequence(F.lit(0), n_lines - 1)).otherwise(
        F.array().cast("array<int>")
    )
    lines = toks.select(
        "doc_id",
        F.posexplode(
            F.transform(
                line_idx,
                lambda i: F.md5(
                    F.array_join(
                        F.slice("toks", i * _LINE_TOKENS + 1, _LINE_TOKENS), " "
                    )
                ),
            )
        ).alias("line_no", "line_hash"),
    )
    w = Window.partitionBy("line_hash").orderBy("doc_id", "line_no")
    marked = lines.withColumn("occurrence", F.row_number().over(w))
    dup = (F.col("occurrence") > 1).cast("long")
    return marked.groupBy("doc_id").agg(
        F.count("*").alias("n_lines"),
        F.sum(dup).alias("n_dup_lines"),
        srnd(F.sum(dup) / F.count("*"), 6).alias("dup_frac"),
    )


# ------------------------------------------------------------- HTML strip

# Deterministic HTML wrapper: tags + the three entities every real
# extractor must decode. Stripping must recover the original text.
_HTML_SQL = (
    "'<html><body><h1>doc ' || CAST(doc_id AS VARCHAR) || '</h1><p class=\"t\">' "
    "|| text || '</p><div>&lt;tail&gt; &amp; footer</div></body></html>'"
)


@query(
    "q_html_strip",
    oracle=f"""
    WITH wrapped AS (SELECT doc_id, text, {_HTML_SQL} AS html FROM documents),
    stripped AS (
        SELECT doc_id, text,
               trim(regexp_replace(
                   replace(replace(replace(
                       regexp_replace(html, '<[^>]*>', ' ', 'g'),
                       '&lt;', '<'), '&gt;', '>'), '&amp;', '&'),
                   '\\s+', ' ', 'g')) AS clean
        FROM wrapped
    )
    SELECT doc_id, clean,
           length(clean) AS clean_len,
           (clean = 'doc ' || CAST(doc_id AS VARCHAR) || ' ' || text
                    || ' <tail> & footer') AS recovered
    FROM stripped
    """,
)
def q_html_strip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HTML boilerplate removal (C19): strip tags, decode entities,
    collapse whitespace — the text-extraction step upstream of every
    corpus filter. The fixture has no markup, so documents are wrapped
    in a deterministic HTML shell first and the query must recover the
    original text exactly (the ``recovered`` flag is oracle-checked
    per row).

    Pure row-local JVM expressions (regexp_replace/replace/trim) —
    zero shuffles, whole-stage-codegen'd, embarrassingly parallel at
    any scale. The regexes are RE2-safe (no backtracking classes), so
    Spark's Java regex and DuckDB's RE2 agree byte-for-byte.
    """
    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    html = F.concat(
        F.lit('<html><body><h1>doc '), F.col("doc_id").cast("string"),
        F.lit('</h1><p class="t">'), F.col("text"),
        F.lit("</p><div>&lt;tail&gt; &amp; footer</div></body></html>"),
    )
    clean = F.trim(
        F.regexp_replace(
            F.replace(
                F.replace(
                    F.replace(
                        F.regexp_replace(html, F.lit("<[^>]*>"), F.lit(" ")),
                        F.lit("&lt;"), F.lit("<"),
                    ),
                    F.lit("&gt;"), F.lit(">"),
                ),
                F.lit("&amp;"), F.lit("&"),
            ),
            F.lit(r"\s+"), F.lit(" "),
        )
    )
    expected = F.concat(
        F.lit("doc "), F.col("doc_id").cast("string"), F.lit(" "),
        F.col("text"), F.lit(" <tail> & footer"),
    )
    return d.select(
        "doc_id",
        clean.alias("clean"),
        F.length(clean).alias("clean_len"),
        (clean == expected).alias("recovered"),
    )
