"""Planted gates for wave 59: PR-AUC (C209), Brier decomposition
(C210), McNemar (C211)."""

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
    """rows = [(orderkey, status)]"""
    t0 = dt.datetime(2024, 1, 1)
    n = len(rows)
    tbl = pa.table({
        "o_orderkey": pa.array([r[0] for r in rows], pa.int64()),
        "o_custkey": pa.array([1] * n, pa.int64()),
        "o_orderstatus": pa.array([r[1] for r in rows], pa.string()),
        "o_totalprice": pa.array([10.0] * n, pa.float64()),
        "o_orderdate": pa.array([t0] * n, pa.timestamp("us")),
        "o_orderpriority": pa.array(["1-URGENT"] * n, pa.string()),
    })
    pq.write_table(tbl, str(tmp_path / "orders.parquet"))
    return str(tmp_path)


def _score(k, y):
    import hashlib

    h = int(hashlib.md5(str(k).encode()).hexdigest()[:8], 16)
    return h % 1000 + 300 * y


class TestPrAuc:
    @staticmethod
    def _ap(pairs):
        """pairs = [(s, y)]; replicate the grouped step-wise AP."""
        cells = {}
        for s, y in pairs:
            np_, nn = cells.get(s, (0, 0))
            cells[s] = (np_ + y, nn + (1 - y))
        P = sum(v[0] for v in cells.values())
        cum_tp = cum_fp = 0
        terms = {}
        for s in sorted(cells, reverse=True):
            np_, nn = cells[s]
            cum_tp += np_
            cum_fp += nn
            if np_ > 0:
                terms[s] = math.floor(
                    np_ * cum_tp / (P * (cum_tp + cum_fp)) * 1e8 + 0.5
                ) / 1e8
        return _srnd(sum(terms[s] for s in sorted(terms)), 6)

    def test_fixture_matches_python_replication(self, spark, sf_dir, duck):
        rows = duck.execute(
            "SELECT o_orderkey, CASE WHEN o_orderstatus='F' THEN 1 ELSE 0 END"
            " FROM orders"
        ).fetchall()
        pairs = [(_score(k, y), y) for k, y in rows]
        r = QUERIES["q_pr_auc"](spark, sf_dir).collect()[0]
        assert r.ap == self._ap(pairs)
        assert r.n_pos == sum(y for _, y in pairs)
        assert r.prevalence == _srnd(r.n_pos / (r.n_pos + r.n_neg), 6)

    def test_ap_beats_prevalence_on_informative_scorer(self, spark, sf_dir):
        r = QUERIES["q_pr_auc"](spark, sf_dir).collect()[0]
        # the +300 label shift makes the scorer informative: AP must
        # clear the random-classifier baseline (= prevalence)
        assert r.ap > r.prevalence + 0.05


class TestBrierDecomposition:
    def test_identity_holds_to_quantization(self, spark, sf_dir):
        r = QUERIES["q_brier_decomposition"](spark, sf_dir).collect()[0]
        # Murphy identity: brier = rel - res + unc (exact in algebra,
        # ~1e-5 after srnd8 per-bin quantization)
        assert abs(
            r.brier - (r.reliability - r.resolution + r.uncertainty)
        ) < 1e-4
        assert 0.0 <= r.brier <= 1.0
        assert r.reliability >= 0 and r.resolution >= 0
        assert 0.0 <= r.uncertainty <= 0.25 + 1e-9

    def test_informative_scorer_has_resolution(self, spark, sf_dir):
        r = QUERIES["q_brier_decomposition"](spark, sf_dir).collect()[0]
        # the scorer separates classes -> resolution meaningfully > 0
        assert r.resolution > 0.01


class TestMcnemar:
    def test_contingency_accounts_every_order(self, spark, sf_dir, duck):
        r = QUERIES["q_mcnemar"](spark, sf_dir).collect()[0]
        (n,) = duck.execute("SELECT count(*) FROM orders").fetchone()
        assert r.only_a + r.only_b + r.both_right + r.both_wrong == n

    def test_hand_math_on_planted_family(self, spark, tmp_path):
        """Replicate both hash classifiers in Python and check the
        chi-square assembly exactly."""
        import hashlib

        rows = [(k, "F" if k % 3 == 0 else "O") for k in range(1, 61)]
        sf = _write_orders(tmp_path, rows)
        only_a = only_b = both_r = both_w = 0
        for k, st in rows:
            y = 1 if st == "F" else 0
            hh = hashlib.md5(str(k).encode()).hexdigest()
            a = 1 if int(hh[:8], 16) % 1000 + 300 * y >= 650 else 0
            b = 1 if int(hh[8:16], 16) % 1000 + 200 * y >= 650 else 0
            if a == y and b != y:
                only_a += 1
            elif b == y and a != y:
                only_b += 1
            elif a == y:
                both_r += 1
            else:
                both_w += 1
        r = QUERIES["q_mcnemar"](spark, sf).collect()[0]
        assert (r.only_a, r.only_b, r.both_right, r.both_wrong) == (
            only_a, only_b, both_r, both_w,
        )
        if only_a + only_b:
            d = only_a - only_b
            assert r.chi2 == _srnd(d * d / (only_a + only_b), 6)
            assert r.chi2_cc == _srnd(
                (abs(d) - 1) ** 2 / (only_a + only_b), 6
            )
        else:
            assert r.chi2 is None
