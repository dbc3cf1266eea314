"""Planted gates for wave 63: best split (C222), Chao1 (C223),
capture-recapture (C224), Hurst R/S (C225), Neyman allocation
(C226)."""

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


def _write_orders(tmp_path, rows):
    """rows = [(orderkey, status, totalprice, date)]"""
    n = len(rows)
    tbl = pa.table({
        "o_orderkey": pa.array([r[0] for r in rows], pa.int64()),
        "o_custkey": pa.array([1] * n, pa.int64()),
        "o_orderstatus": pa.array([r[1] for r in rows], pa.string()),
        "o_totalprice": pa.array([float(r[2]) for r in rows], pa.float64()),
        "o_orderdate": pa.array([r[3] for r in rows], pa.timestamp("us")),
        "o_orderpriority": pa.array(["1-URGENT"] * n, pa.string()),
    })
    pq.write_table(tbl, str(tmp_path / "orders.parquet"))
    return str(tmp_path)


def _write_docs(tmp_path, rows):
    """rows = [(doc_id, text, source, n_chars)]"""
    tbl = pa.table({
        "doc_id": pa.array([r[0] for r in rows], pa.int64()),
        "text": pa.array([r[1] for r in rows], pa.string()),
        "lang": pa.array(["en"] * len(rows), pa.string()),
        "source": pa.array([r[2] for r in rows], pa.string()),
        "n_chars": pa.array([r[3] for r in rows], pa.int64()),
    })
    pq.write_table(tbl, str(tmp_path / "documents.parquet"))
    return str(tmp_path)


class TestBestSplit:
    def test_separable_scorer_near_zero_impurity(self, spark, sf_dir):
        r = QUERIES["q_best_split"](spark, sf_dir).collect()[0]
        # the +300 shift makes scores informative: the best split must
        # beat the root impurity
        assert r.gini_split < r.gini_root
        assert 0 < r.n_left < r.n_left + r.n_right
        assert 0.0 <= r.gini_split <= 0.5 + 1e-9

    def test_masses_cover_population(self, spark, sf_dir, duck):
        r = QUERIES["q_best_split"](spark, sf_dir).collect()[0]
        (n,) = duck.execute("SELECT count(*) FROM orders").fetchone()
        assert r.n_left + r.n_right == n


class TestChao1Vocab:
    def test_hand_vocabulary(self, spark, tmp_path):
        """Vocab: a×3, b×2, c×1, d×1 -> D=4, N=7, f1=2, f2=1,
        chao1 = 4 + 2·1/(2·2) = 4.5, p_unseen = 2/7,
        simpson = 1 - (6+2+0+0)/(7·6)."""
        sf = _write_docs(tmp_path, [(0, "a a a b", "s", 7),
                                    (1, "b c d", "s", 5)])
        r = QUERIES["q_chao1_vocab"](spark, sf).collect()[0]
        assert (r.observed_vocab, r.n_tokens, r.f1, r.f2) == (4, 7, 2, 1)
        assert r.chao1 == 4.5
        assert r.p_unseen == _srnd(2 / 7, 6)
        assert r.simpson == _srnd(1 - 8 / 42, 6)

    def test_no_hapax_closes_vocabulary(self, spark, tmp_path):
        sf = _write_docs(tmp_path, [(0, "a a b b", "s", 7)])
        r = QUERIES["q_chao1_vocab"](spark, sf).collect()[0]
        assert r.f1 == 0 and r.chao1 == float(r.observed_vocab)
        assert r.p_unseen == 0.0


class TestCaptureRecapture:
    def test_estimator_tracks_truth_on_fixture(self, spark, sf_dir):
        r = QUERIES["q_capture_recapture"](spark, sf_dir).collect()[0]
        # two ~50% hash crawls of the same population: Chapman should
        # land within 10% of the true distinct count
        assert r.m_both > 0
        assert abs(r.chapman_est - r.d_true) <= 0.1 * r.d_true
        assert r.n_a <= r.d_true and r.n_b <= r.d_true

    def test_full_overlap_recovers_truth(self, spark, tmp_path):
        """Doc ids chosen so every text is caught by BOTH crawls
        (dup doc ids per text make max-of-indicator 1 for both):
        duplicate every text under many ids so P(missed) ~ 0."""
        rows = []
        for t in range(5):
            for j in range(40):
                rows.append((t * 100 + j, f"text{t}", "s", 5))
        sf = _write_docs(tmp_path, rows)
        r = QUERIES["q_capture_recapture"](spark, sf).collect()[0]
        assert r.d_true == 5
        assert r.n_a == 5 and r.n_b == 5 and r.m_both == 5
        assert r.chapman_est == 5.0


class TestHurstRs:
    def test_structure_and_block_counts(self, spark, sf_dir, duck):
        rows = {r.size: r for r in QUERIES["q_hurst_rs"](spark, sf_dir).collect()}
        assert set(rows) == {7, 14, 28}
        (days,) = duck.execute(
            "SELECT count(DISTINCT strftime(o_orderdate, '%Y-%m-%d'))"
            " FROM orders"
        ).fetchone()
        for size, r in rows.items():
            assert r.n_blocks <= days // size
            assert r.n_blocks >= 1

    def test_random_walk_vs_alternating(self, spark, tmp_path):
        """A cumulative (integrated) series has growing R/S; the mean
        ln(R/S) must increase with block size much faster than for an
        alternating (anti-persistent) series."""
        import hashlib

        t0 = dt.datetime(2024, 1, 1)
        walk, x = [], 0
        for i in range(84):
            step = (int(hashlib.md5(str(i).encode()).hexdigest()[:8], 16)
                    % 200) - 100
            x += step
            walk.append(5000.0 + x)
        rows = [(i, "F", walk[i], t0 + dt.timedelta(days=i))
                for i in range(84)]
        sf = _write_orders(tmp_path, rows)
        out = {r.size: r.mean_log_rs
               for r in QUERIES["q_hurst_rs"](spark, sf).collect()}
        # integrated noise: R/S grows with n (H ~ 1 for a trend-free
        # walk measured over these scales)
        assert out[28] > out[14] > out[7]
        slope = (out[28] - out[7]) / (math.log(28) - math.log(7))
        assert slope > 0.5


class TestNeymanAllocation:
    def test_equal_strata_split_evenly(self, spark, tmp_path):
        rows = []
        for s in ("a", "b"):
            for i in range(10):
                rows.append((len(rows), "t", s, 100 + (i % 5) * 10))
        sf = _write_docs(tmp_path, rows)
        out = {r.source: r for r in QUERIES["q_neyman_allocation"](spark, sf).collect()}
        assert out["a"].alloc_share == out["b"].alloc_share == 0.5
        assert out["a"].alloc_n == out["b"].alloc_n == 500

    def test_zero_variance_stratum_gets_nothing(self, spark, tmp_path):
        rows = [(i, "t", "flat", 100) for i in range(10)]
        rows += [(100 + i, "t", "wild", 100 + i * 50) for i in range(10)]
        sf = _write_docs(tmp_path, rows)
        out = {r.source: r for r in QUERIES["q_neyman_allocation"](spark, sf).collect()}
        assert out["flat"].alloc_share == 0.0
        assert out["flat"].alloc_n == 0
        assert out["wild"].alloc_n == 1000

    def test_fixture_shares_sum_to_one(self, spark, sf_dir):
        rows = QUERIES["q_neyman_allocation"](spark, sf_dir).collect()
        assert rows
        assert abs(sum(r.alloc_share for r in rows) - 1.0) < 1e-4
        total = sum(r.alloc_n for r in rows)
        assert abs(total - 1000) <= len(rows)  # rounding slack
