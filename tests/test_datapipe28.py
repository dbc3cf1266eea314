"""Planted-input tests for wave 32 (C150-C152), each against a full
Python replication of the deterministic scorer: Cohen's kappa
confusion matrix, corpus BLEU with a repeated-token document (the
multiset-clipping case array_distinct shingles would get wrong), and
nDCG@10 with fewer positives than the cutoff (the short-ideal
branch).
"""

from __future__ import annotations

import datetime as dt
import hashlib
import math

import pyarrow as pa
import pyarrow.parquet as pq

from cassowary_spark import registry
from cassowary_spark.registry import QUERIES

registry.load_all()


def _srnd(x: float, n: int) -> float:
    s = float(10**n)
    return math.floor(x * s + 0.5) / s


def _score(okey, is_f):
    h = int(hashlib.md5(str(okey).encode()).hexdigest()[:8], 16)
    return h % 1000 + 300 * (1 if is_f else 0)


def _write_orders(tmp_path, rows):
    """rows = [(orderkey, status)]."""
    tbl = pa.table(
        {
            "o_orderkey": pa.array([r[0] for r in rows], pa.int64()),
            "o_custkey": pa.array([1] * len(rows), pa.int64()),
            "o_orderstatus": pa.array([r[1] for r in rows], pa.string()),
            "o_totalprice": pa.array([1.0] * len(rows), pa.float64()),
            "o_orderdate": pa.array(
                [dt.datetime(2024, 1, 1)] * len(rows), pa.timestamp("us")
            ),
            "o_orderpriority": pa.array(
                ["1-URGENT"] * len(rows), pa.string()
            ),
        }
    )
    pq.write_table(tbl, str(tmp_path / "orders.parquet"))
    return str(tmp_path)


def _write_documents(tmp_path, texts):
    tbl = pa.table(
        {
            "doc_id": pa.array(range(1, len(texts) + 1), pa.int64()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(["en"] * len(texts), pa.string()),
            "source": pa.array(["src0"] * len(texts), pa.string()),
            "n_chars": pa.array([len(t) for t in texts], pa.int64()),
        }
    )
    pq.write_table(tbl, str(tmp_path / "documents.parquet"))
    return str(tmp_path)


class TestCohensKappa:
    def test_python_confusion_replication(self, spark, tmp_path):
        """100 orders, 30 F: replicate both raters in Python and
        check the confusion matrix, p_o, p_e and kappa exactly."""
        rows = [(k, "F" if k <= 30 else "O") for k in range(1, 101)]
        sf = _write_orders(tmp_path, rows)
        out = QUERIES["q_cohens_kappa"](spark, sf).collect()[0]
        n11 = n10 = n01 = n00 = 0
        for k, st_ in rows:
            is_f = st_ == "F"
            a = 1 if _score(k, is_f) >= 650 else 0
            b = 1 if is_f else 0
            if a and b:
                n11 += 1
            elif a:
                n10 += 1
            elif b:
                n01 += 1
            else:
                n00 += 1
        n = 100
        assert (out["n11"], out["n10"], out["n01"], out["n00"]) == (
            n11, n10, n01, n00,
        )
        po = (n11 + n00) / n
        pe = ((n11 + n10) * (n11 + n01) + (n01 + n00) * (n10 + n00)) / (
            n * n
        )
        assert out["po"] == _srnd(po, 6)
        assert out["pe"] == _srnd(pe, 6)
        assert out["kappa"] == _srnd((po - pe) / (1 - pe), 6)


class TestCorpusBleu:
    def test_multiset_clipping_closed_form(self, spark, tmp_path):
        """Two docs, one with REPEATED tokens: clipped counts must be
        multiset mins ('a a b' contributes 2 for 'a', which distinct
        shingles would collapse to 1). Twins append 3 new tokens, so
        per ref of length L: p1 adds L/(L+3), p2 adds (L-1)/(L+2)."""
        texts = ["a a b", "c d e f"]
        sf = _write_documents(tmp_path, texts)
        out = QUERIES["q_corpus_bleu"](spark, sf).collect()[0]
        # doc1: L=3 -> c1 += 3, t1 += 6; bigrams: cand 5, matching 2
        # doc2: L=4 -> c1 += 4, t1 += 7; bigrams: cand 6, matching 3
        assert (out["c1"], out["t1"]) == (7, 13)
        assert (out["c2"], out["t2"]) == (5, 11)
        assert (out["cand_len"], out["ref_len"]) == (13, 7)
        p1, p2 = 7 / 13, 5 / 11
        assert out["bleu2"] == _srnd(
            math.exp((math.log(p1) + math.log(p2)) / 2.0), 6
        )


class TestNdcg:
    def test_short_ideal_and_python_ranking(self, spark, tmp_path):
        """Only 3 positives among 50 orders: IDCG is the 3-term
        prefix; DCG comes from replicating the hash ranking in
        Python."""
        rows = [(k, "F" if k in (7, 21, 40) else "O")
                for k in range(1, 51)]
        sf = _write_orders(tmp_path, rows)
        out = QUERIES["q_ndcg"](spark, sf).collect()[0]
        scored = sorted(
            ((_score(k, s == "F"), k, 1 if s == "F" else 0)
             for k, s in rows),
            key=lambda t: (-t[0], t[1]),
        )
        w = [
            math.floor(1.0 / math.log2(i + 1) * 1e8 + 0.5) / 1e8
            for i in range(1, 11)
        ]
        dcg = sum(w[i] * scored[i][2] for i in range(10))
        idcg = round(sum(w[:3]), 10)
        hits = sum(scored[i][2] for i in range(10))
        assert out["n_pos"] == 3
        assert out["hits"] == hits
        assert out["dcg"] == _srnd(dcg, 6)
        assert out["idcg"] == _srnd(idcg, 6)
        assert out["ndcg"] == _srnd(dcg / idcg, 6)
