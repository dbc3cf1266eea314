"""Planted gates for wave 37: q_label_keywords (C162) and
q_confusion_matrix (C163)."""

from __future__ import annotations

import math

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from cassowary_spark import registry
from cassowary_spark.registry import QUERIES

registry.load_all()


def _srnd(x: float, n: int) -> float:
    s = float(10**n)
    return math.floor(x * s + 0.5) / s


def _write_labeled_corpus(tmp_path, docs):
    """docs = [(doc_id, text, label)] -> documents + embeddings."""
    d = pa.table(
        {
            "doc_id": pa.array([x[0] for x in docs], pa.int64()),
            "text": pa.array([x[1] for x in docs], pa.string()),
            "lang": pa.array(["en"] * len(docs), pa.string()),
            "source": pa.array(["s"] * len(docs), pa.string()),
            "n_chars": pa.array([len(x[1]) for x in docs], pa.int64()),
        }
    )
    e = pa.table(
        {
            "vec_id": pa.array([x[0] for x in docs], pa.int64()),
            "embedding": pa.array(
                [[0.0, 1.0]] * len(docs), pa.list_(pa.float32())
            ),
            "label": pa.array([x[2] for x in docs], pa.int32()),
        }
    )
    pq.write_table(d, str(tmp_path / "documents.parquet"))
    pq.write_table(e, str(tmp_path / "embeddings.parquet"))
    return str(tmp_path)


class TestLabelKeywords:
    def test_distinctive_terms_beat_shared_terms(self, spark, tmp_path):
        """A term exclusive to one label must outrank a term common to
        all labels, and sub-threshold terms never appear."""
        docs = []
        did = 0
        for _ in range(6):
            docs.append((did, "shared shared apple apple apple", 0)); did += 1
            docs.append((did, "shared shared banana banana banana", 1)); did += 1
        docs.append((did, "rare", 0)); did += 1  # tf=1 < threshold
        sf = _write_labeled_corpus(tmp_path, docs)
        rows = QUERIES["q_label_keywords"](spark, sf).collect()
        by = {(r.label, r.term): r for r in rows}
        assert ("0", "rare") not in by and (0, "rare") not in by
        r_apple, r_shared0 = by[(0, "apple")], by[(0, "shared")]
        assert r_apple.rnk < r_shared0.rnk
        assert by[(1, "banana")].rnk < by[(1, "shared")].rnk
        # hand math for apple: tf=18, tot_label0=30(+rare dropped), ...
        assert r_apple.tf == 18

    def test_fixture_shape(self, spark, sf_dir):
        rows = QUERIES["q_label_keywords"](spark, sf_dir).collect()
        assert rows
        per = {}
        for r in rows:
            per.setdefault(r.label, []).append(r)
            assert r.score > 0
        for label, rs in per.items():
            ranks = sorted(r.rnk for r in rs)
            assert ranks == list(range(1, len(ranks) + 1))
            # descending score within each label
            ordered = sorted(rs, key=lambda r: r.rnk)
            scores = [r.score for r in ordered]
            assert scores == sorted(scores, reverse=True)


class TestConfusionMatrix:
    def test_rows_normalize_and_diagonal_dominates(self, spark, sf_dir, duck):
        rows = QUERIES["q_confusion_matrix"](spark, sf_dir).collect()
        (n_docs,) = duck.execute("SELECT count(*) FROM documents").fetchone()
        assert sum(r.n for r in rows) == n_docs
        by_lang = {}
        for r in rows:
            by_lang.setdefault(r.lang, []).append(r)
        for lang, rs in by_lang.items():
            assert sum(r.frac for r in rs) == pytest.approx(1.0, abs=1e-4)
            diag = [r for r in rs if r.lang_pred == lang]
            # the heuristic should get its own language right more
            # often than any single confusion target
            if diag:
                others = [r.n for r in rs if r.lang_pred != lang]
                assert not others or diag[0].n >= max(others), lang

    def test_predictions_match_lang_id_operator(self, spark, sf_dir):
        """Cell counts must re-derive from applying the C4 operator
        row-by-row — the matrix is an aggregation, not a new model."""
        from pyspark.sql import functions as F

        from cassowary_spark.operators.text import lang_id
        from cassowary_spark.tables import load_table

        d = load_table(spark, sf_dir, "documents").select("lang", "text")
        expect = {
            (r.lang, r.p): r.n
            for r in d.select(
                "lang", lang_id(F.col("text")).alias("p")
            )
            .groupBy("lang", "p")
            .agg(F.count("*").alias("n"))
            .collect()
        }
        got = {
            (r.lang, r.lang_pred): r.n
            for r in QUERIES["q_confusion_matrix"](spark, sf_dir).collect()
        }
        assert got == expect
