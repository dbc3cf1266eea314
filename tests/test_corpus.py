"""Semantic invariants for the corpus-hygiene queries (queries/corpus.py).

The oracle-parity twin checks Spark == DuckDB; these check the
*meaning*: HTML stripping must actually recover the original text, and
line dedup must actually mark the planted twins as duplicates.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from cassowary_spark import registry
from cassowary_spark.queries.llm import TWIN_OFFSET

registry.load_all()


def test_html_strip_recovers_text(spark, sf_dir):
    df = registry.QUERIES["q_html_strip"](spark, sf_dir)
    assert df.filter(~F.col("recovered")).count() == 0


def test_line_dedup_marks_twins(spark, sf_dir):
    df = registry.QUERIES["q_line_dedup"](spark, sf_dir)
    twins = df.filter(F.col("doc_id") >= TWIN_OFFSET)
    assert twins.count() > 0
    # a twin repeats every full line of its source; the appended
    # 3-token mutation can change the last line and spill one new
    # line, so at most 2 lines per twin are unique
    bad = twins.filter(F.col("n_dup_lines") < F.col("n_lines") - 2).count()
    assert bad == 0
    # originals sorted before twins, so their lines are first
    # occurrences — cross-doc collisions of short word-soup lines
    # happen, but originals must stay far less duplicated than twins
    originals = df.filter(F.col("doc_id") < TWIN_OFFSET)
    # short docs dilute the twin fraction (2 dup / 4 lines = 0.5),
    # so assert clear separation rather than an absolute bar
    o_avg = originals.agg(F.avg("dup_frac")).first()[0]
    t_avg = twins.agg(F.avg("dup_frac")).first()[0]
    assert t_avg > o_avg + 0.3 and o_avg < 0.3, (o_avg, t_avg)
