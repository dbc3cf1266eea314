"""Planted gates for wave 58: distinct n-grams (C204), retrieval MRR
(C205), clustering depth (C206), Theil index (C207), Nelson-Aalen
(C208)."""

from __future__ import annotations

import datetime as dt
import math

import pyarrow as pa
import pyarrow.parquet as pq

from cassowary_spark import registry
from cassowary_spark.registry import QUERIES

registry.load_all()


def _srnd(x, n=6):
    return math.floor(x * 10**n + 0.5) / 10**n


def _write_docs(tmp_path, rows):
    """rows = [(doc_id, text)] or [(doc_id, text, source, n_chars)]"""
    full = [
        (r[0], r[1], r[2] if len(r) > 2 else "s",
         r[3] if len(r) > 3 else len(r[1]))
        for r in rows
    ]
    tbl = pa.table({
        "doc_id": pa.array([r[0] for r in full], pa.int64()),
        "text": pa.array([r[1] for r in full], pa.string()),
        "lang": pa.array(["en"] * len(full), pa.string()),
        "source": pa.array([r[2] for r in full], pa.string()),
        "n_chars": pa.array([r[3] for r in full], pa.int64()),
    })
    pq.write_table(tbl, str(tmp_path / "documents.parquet"))
    return str(tmp_path)


def _write_orders(tmp_path, rows):
    """rows = [(orderkey, custkey, totalprice, date)]"""
    n = len(rows)
    tbl = pa.table({
        "o_orderkey": pa.array([r[0] for r in rows], pa.int64()),
        "o_custkey": pa.array([r[1] for r in rows], pa.int64()),
        "o_orderstatus": pa.array(["F"] * n, pa.string()),
        "o_totalprice": pa.array([float(r[2]) for r in rows], pa.float64()),
        "o_orderdate": pa.array([r[3] for r in rows], pa.timestamp("us")),
        "o_orderpriority": pa.array(["1-URGENT"] * n, pa.string()),
    })
    pq.write_table(tbl, str(tmp_path / "orders.parquet"))
    return str(tmp_path)


def _write_customer(tmp_path, rows):
    """rows = [(custkey, segment)]"""
    n = len(rows)
    tbl = pa.table({
        "c_custkey": pa.array([r[0] for r in rows], pa.int64()),
        "c_name": pa.array([f"c{r[0]}" for r in rows], pa.string()),
        "c_nationkey": pa.array([0] * n, pa.int32()),
        "c_acctbal": pa.array([0.0] * n, pa.float64()),
        "c_mktsegment": pa.array([r[1] for r in rows], pa.string()),
    })
    pq.write_table(tbl, str(tmp_path / "customer.parquet"))
    return str(tmp_path)


class TestDistinctNgrams:
    def test_hand_counts_duplicated_doc(self, spark, tmp_path):
        sf = _write_docs(tmp_path, [(0, "a b c"), (1, "a b c")])
        out = {r.n: r for r in QUERIES["q_distinct_ngrams"](spark, sf).collect()}
        assert (out[1].total, out[1].n_distinct) == (6, 3)
        assert (out[2].total, out[2].n_distinct) == (4, 2)
        assert (out[3].total, out[3].n_distinct) == (2, 1)
        assert out[3].distinct_ratio == 0.5

    def test_short_docs_skip_higher_n(self, spark, tmp_path):
        sf = _write_docs(tmp_path, [(0, "a"), (1, "b c")])
        out = {r.n: r for r in QUERIES["q_distinct_ngrams"](spark, sf).collect()}
        assert out[1].total == 3
        assert out[2].total == 1  # only "b c"
        assert (out[3].total, out[3].n_distinct) == (0, 0)
        assert out[3].distinct_ratio is None

    def test_all_unique_ratio_one(self, spark, tmp_path):
        sf = _write_docs(tmp_path, [(0, "p q r s t u v w")])
        out = {r.n: r for r in QUERIES["q_distinct_ngrams"](spark, sf).collect()}
        for n in (1, 2, 3):
            assert out[n].distinct_ratio == 1.0


class TestRetrievalMrr:
    def test_planted_title_hit_at_rank_one(self, spark, tmp_path):
        """'top' is the highest-df term (in all 6 docs); doc 0 has it
        in the title with the highest tf -> rr = 1."""
        docs = [(0, "top top top filler " + "x" * 0)]
        docs += [(i, "pad" + str(i) + " words top") for i in range(1, 6)]
        sf = _write_docs(tmp_path, docs)
        out = {r.term: r for r in QUERIES["q_retrieval_mrr"](spark, sf).collect()}
        assert "top" in out
        r = out["top"]
        assert r.first_rel_rank == 1 and r.rr == 1.0

    def test_term_absent_from_titles_rr_zero(self, spark, tmp_path):
        """'tail' appears past the first 8 tokens everywhere -> no
        relevant docs -> first_rel_rank 0, rr 0."""
        base = "w1 w2 w3 w4 w5 w6 w7 w8"
        docs = [(i, f"{base} tail") for i in range(6)]
        sf = _write_docs(tmp_path, docs)
        out = {r.term: r for r in QUERIES["q_retrieval_mrr"](spark, sf).collect()}
        r = out["tail"]
        assert r.n_rel == 0 and r.first_rel_rank == 0 and r.rr == 0.0
        assert r.recall_at_k is None

    def test_recall_counts_top10_only(self, spark, tmp_path):
        """14 docs contain 'k' in the title; ranking is by (tf desc,
        doc_id), all tf=1 -> top 10 are doc_ids 0..9 -> recall 10/14."""
        docs = [(i, "k filler" + str(i)) for i in range(14)]
        sf = _write_docs(tmp_path, docs)
        out = {r.term: r for r in QUERIES["q_retrieval_mrr"](spark, sf).collect()}
        r = out["k"]
        assert r.n_rel == 14
        assert r.recall_at_k == _srnd(10 / 14, 6)


class TestClusteringDepth:
    def test_sorted_layout_depth_one(self, spark, tmp_path):
        """n_chars == doc_id: files hold disjoint ranges -> every
        probe hits exactly one file."""
        sf = _write_docs(
            tmp_path, [(i, "t", "s", i) for i in range(100)]
        )
        rows = QUERIES["q_clustering_depth"](spark, sf).collect()
        assert len(rows) == 16
        assert all(r.depth == 1 for r in rows)

    def test_interleaved_layout_full_overlap(self, spark, tmp_path):
        """Alternating small/large values put the full range in BOTH
        files -> every probe sees depth 2."""
        sf = _write_docs(
            tmp_path,
            [(i, "t", "s", (i % 2) * 1000 + (i % 50)) for i in range(100)],
        )
        rows = QUERIES["q_clustering_depth"](spark, sf).collect()
        assert all(r.depth == 2 for r in rows)

    def test_probe_grid_spans_domain(self, spark, sf_dir, duck):
        rows = sorted(
            QUERIES["q_clustering_depth"](spark, sf_dir).collect(),
            key=lambda r: r.probe_id,
        )
        gmin, gmax = duck.execute(
            "SELECT min(n_chars), max(n_chars) FROM documents"
        ).fetchone()
        assert rows[0].probe_val == gmin
        assert all(gmin <= r.probe_val <= gmax for r in rows)
        vals = [r.probe_val for r in rows]
        assert vals == sorted(vals)


class TestTheilIndex:
    def test_equal_revenues_zero(self, spark, tmp_path):
        t0 = dt.datetime(2024, 1, 1)
        _write_customer(tmp_path, [(i, "SEG") for i in range(4)])
        sf = _write_orders(tmp_path, [(i, i, 50.0, t0) for i in range(4)])
        r = QUERIES["q_theil_index"](spark, sf).collect()[0]
        assert r.n_customers == 4
        assert r.theil == 0.0

    def test_two_point_closed_form(self, spark, tmp_path):
        """Half the customers at a=100.00, half at b=300.00:
        T = (1/N)·Σ(x/μ)ln(x/μ) with μ=200.00."""
        t0 = dt.datetime(2024, 1, 1)
        _write_customer(tmp_path, [(i, "SEG") for i in range(4)])
        sf = _write_orders(
            tmp_path,
            [(0, 0, 100.0, t0), (1, 1, 100.0, t0),
             (2, 2, 300.0, t0), (3, 3, 300.0, t0)],
        )
        r = QUERIES["q_theil_index"](spark, sf).collect()[0]
        mu = 20000.0
        term = lambda x, cnt: math.floor(
            cnt * (x / mu) * math.log(x / mu) * 1e8 + 0.5
        ) / 1e8
        exp = _srnd((term(10000.0, 2) + term(30000.0, 2)) / 4.0, 6)
        assert r.theil == exp
        assert r.mean_cents == 20000.0

    def test_fixture_nonnegative_segments(self, spark, sf_dir):
        rows = QUERIES["q_theil_index"](spark, sf_dir).collect()
        assert rows
        for r in rows:
            assert r.theil >= -1e-9
            assert r.n_customers > 0


class TestNelsonAalen:
    def test_hand_math_single_event_time(self, spark, tmp_path):
        """3 customers first-order day 0; A and B reorder day 5, C
        never (censored day 5): one event time t=5 with n=3, d=2 ->
        H = 2/3, se = sqrt(2/9)."""
        t0 = dt.datetime(1995, 1, 1)
        t5 = t0 + dt.timedelta(days=5)
        rows = [
            (0, 0, 10.0, t0), (1, 0, 10.0, t5),
            (2, 1, 10.0, t0), (3, 1, 10.0, t5),
            (4, 2, 10.0, t0),
        ]
        sf = _write_orders(tmp_path, rows)
        out = QUERIES["q_nelson_aalen"](spark, sf).collect()
        assert len(out) == 1
        r = out[0]
        assert (r.t, r.n_risk, r.d) == (5, 3, 2)
        assert r.h_hat == _srnd(math.floor(2 / 3 * 1e8 + 0.5) / 1e8, 6)
        assert r.se == _srnd(
            math.sqrt(math.floor(2 / 9 * 1e8 + 0.5) / 1e8), 6
        )

    def test_hazard_dominates_km_log(self, spark, sf_dir):
        """Ĥ(t) >= -ln(Ŝ_KM(t)) pointwise (h >= -ln(1-h) is false;
        the inequality is Σd/n <= -Σln(1-d/n) — Nelson-Aalen is the
        SMALLER one), and both are monotone."""
        na = sorted(
            QUERIES["q_nelson_aalen"](spark, sf_dir).collect(),
            key=lambda r: r.t,
        )
        km = {
            r.t: r.s_hat
            for r in QUERIES["q_kaplan_meier"](spark, sf_dir).collect()
        }
        assert na
        hs = [r.h_hat for r in na]
        assert hs == sorted(hs)  # cumulative hazard is monotone
        for r in na:
            if r.t in km and km[r.t] > 0:
                assert r.h_hat <= -math.log(km[r.t]) + 1e-6
