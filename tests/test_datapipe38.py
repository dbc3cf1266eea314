"""Planted gates for wave 40: q_spearman_corr (C168), q_js_divergence
(C169), q_dim_variance (C170), q_ips_estimate (C171),
q_dup_rate_by_source (C172), q_perplexity_buckets (C173)."""

from __future__ import annotations

import hashlib
import math

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from cassowary_spark import registry
from cassowary_spark.registry import QUERIES

registry.load_all()


def _write_docs(tmp_path, rows):
    """rows = [(doc_id, text, lang, source)] -> documents.parquet
    (n_chars derived, matching the fixture convention)."""
    tbl = pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows], pa.int64()),
            "text": pa.array([r[1] for r in rows], pa.string()),
            "lang": pa.array([r[2] for r in rows], pa.string()),
            "source": pa.array([r[3] for r in rows], pa.string()),
            "n_chars": pa.array([len(r[1]) for r in rows], pa.int64()),
        }
    )
    pq.write_table(tbl, str(tmp_path / "documents.parquet"))
    return str(tmp_path)


# ------------------------------------------------ C168 Spearman rho


class TestSpearman:
    def test_perfect_monotone_is_one(self, spark, tmp_path):
        # longer text -> more chars AND more spaces: rho = +1
        rows = [(i, "w " * i + "end", "en", "s") for i in range(1, 8)]
        sf = _write_docs(tmp_path, rows)
        (r,) = QUERIES["q_spearman_corr"](spark, sf).collect()
        assert r.lang == "en" and r.n == 7
        assert r.spearman_rho == pytest.approx(1.0, abs=1e-9)

    def test_anti_monotone_is_minus_one(self, spark, tmp_path):
        # more chars but FEWER spaces: rho = -1 (rank-based, so the
        # nonlinear char counts don't matter)
        rows = [
            (i, "w " * (10 - i) + "x" * (5 * i), "en", "s")
            for i in range(1, 8)
        ]
        sf = _write_docs(tmp_path, rows)
        (r,) = QUERIES["q_spearman_corr"](spark, sf).collect()
        assert r.spearman_rho == pytest.approx(-1.0, abs=1e-9)

    def test_ties_average_ranks_hand_math(self, spark, tmp_path):
        # x = n_chars: [3, 3, 5]; y = spaces+1: [1, 2, 2]
        # avg ranks x: [1.5, 1.5, 3], y: [1, 2.5, 2.5]
        # Pearson over those = 0.5 (hand-computed)
        rows = [
            (1, "abc", "en", "s"),  # 3 chars, 1 token
            (2, "a b", "en", "s"),  # 3 chars, 2 tokens
            (3, "ab cd", "en", "s"),  # 5 chars, 2 tokens
        ]
        sf = _write_docs(tmp_path, rows)
        (r,) = QUERIES["q_spearman_corr"](spark, sf).collect()
        assert r.spearman_rho == pytest.approx(0.5, abs=1e-6)

    def test_fixture_bounds_and_grouping(self, spark, sf_dir):
        rows = QUERIES["q_spearman_corr"](spark, sf_dir).collect()
        assert rows
        langs = {r.lang for r in rows}
        assert len(langs) == len(rows)  # one row per lang
        for r in rows:
            assert r.spearman_rho is None or -1.0 <= r.spearman_rho <= 1.0


# ------------------------------------- C169 Jensen-Shannon divergence


class TestJsDivergence:
    def test_single_source_is_zero(self, spark, tmp_path):
        # one source: P == Q exactly -> JSD = 0
        rows = [(i, f"t{i}", ["en", "fr"][i % 2], "only") for i in range(8)]
        sf = _write_docs(tmp_path, rows)
        (r,) = QUERIES["q_js_divergence"](spark, sf).collect()
        assert r.source == "only" and r.n_docs == 8
        assert r.js_nats == pytest.approx(0.0, abs=1e-9)

    def test_hand_math_two_sources(self, spark, tmp_path):
        # s1: 4 en; s2: 4 fr. Corpus Q = (.5, .5).
        # For s1: P=(1,0); M_en=.75, M_fr=.25
        # JSD = .5*(1*ln(1/.75)) + .5*(.5*ln(.5/.75) + .5*ln(.5/.25))
        rows = [(i, f"t{i}", "en", "s1") for i in range(4)] + [
            (i + 4, f"t{i+4}", "fr", "s2") for i in range(4)
        ]
        sf = _write_docs(tmp_path, rows)
        expect = 0.5 * math.log(1 / 0.75) + 0.5 * (
            0.5 * math.log(0.5 / 0.75) + 0.5 * math.log(0.5 / 0.25)
        )
        out = {r.source: r for r in QUERIES["q_js_divergence"](spark, sf).collect()}
        for s in ("s1", "s2"):  # symmetric fixture -> equal JSD
            assert out[s].js_nats == pytest.approx(expect, abs=1e-5)

    def test_bounded_by_ln2_on_fixture(self, spark, sf_dir):
        rows = QUERIES["q_js_divergence"](spark, sf_dir).collect()
        assert rows
        for r in rows:
            assert -1e-9 <= r.js_nats <= math.log(2.0) + 1e-9


# ------------------------------------ C170 embedding dim variance


def _write_emb(tmp_path, vecs):
    tbl = pa.table(
        {
            "vec_id": pa.array(range(len(vecs)), pa.int64()),
            "embedding": pa.array(vecs, pa.list_(pa.float32())),
            "label": pa.array([0] * len(vecs), pa.int32()),
        }
    )
    pq.write_table(tbl, str(tmp_path / "embeddings.parquet"))
    return str(tmp_path)


class TestDimVariance:
    def test_constant_dim_is_dead_hand_math(self, spark, tmp_path):
        # dim1 constant 0.5 -> var 0, dead; dim2 = {0, 1} -> var .25
        sf = _write_emb(tmp_path, [[0.5, 0.0], [0.5, 1.0], [0.5, 0.0], [0.5, 1.0]])
        out = {r.dim: r for r in QUERIES["q_dim_variance"](spark, sf).collect()}
        assert out[1].mean == pytest.approx(0.5) and out[1].variance == 0.0
        assert out[1].is_dead == 1
        assert out[2].mean == pytest.approx(0.5)
        assert out[2].variance == pytest.approx(0.25, abs=1e-8)
        assert out[2].is_dead == 0

    def test_fixture_all_dims_present_nonnegative(self, spark, sf_dir):
        rows = QUERIES["q_dim_variance"](spark, sf_dir).collect()
        dims = sorted(r.dim for r in rows)
        assert dims == list(range(1, len(dims) + 1))
        for r in rows:
            assert r.variance >= 0.0
            assert (r.variance < 1e-4) == bool(r.is_dead)


# ----------------------------------------- C171 IPS policy estimate


def _write_events(tmp_path, rows):
    """rows = [(event_id, user_id, event_type, value)]"""
    import datetime

    tbl = pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array(
                [datetime.datetime(2024, 1, 1)] * len(rows),
                pa.timestamp("us"),
            ),
            "user_id": pa.array([r[1] for r in rows], pa.int64()),
            "event_type": pa.array([r[2] for r in rows], pa.string()),
            "value": pa.array([r[3] for r in rows], pa.float64()),
            "props": pa.array(["{}"] * len(rows), pa.string()),
        }
    )
    pq.write_table(tbl, str(tmp_path / "events.parquet"))
    return str(tmp_path)


def _policy_idx(user_id: int, k: int) -> int:
    u32 = int(hashlib.md5(str(user_id).encode()).hexdigest()[:8], 16)
    return 1 + (u32 % k)


class TestIpsEstimate:
    def test_single_action_reduces_to_mean_reward(self, spark, tmp_path):
        # one action: policy always matches, propensity 1 -> V = mean r
        rows = [(i, i, "click", float(i)) for i in range(1, 6)]
        sf = _write_events(tmp_path, rows)
        (r,) = QUERIES["q_ips_estimate"](spark, sf).collect()
        assert r.n_events == 5 and r.n_matched == 5
        assert r.ips_value == pytest.approx(3.0, abs=1e-6)

    def test_hand_math_two_actions(self, spark, tmp_path):
        # two actions a/b; users chosen so the md5 policy is known
        rows = [
            (i, u, t, v)
            for i, (u, t, v) in enumerate(
                [(1, "a", 10.0), (2, "a", 20.0), (3, "b", 30.0), (4, "b", 40.0)]
            )
        ]
        sf = _write_events(tmp_path, rows)
        # replicate the estimator in pure Python
        k = 2
        types = ["a", "b"]
        c = {"a": 2, "b": 2}
        s = {"a": 0.0, "b": 0.0}
        n_match = 0
        for _, u, t, v in rows:
            if _policy_idx(u, k) == 1 + types.index(t):
                s[t] += round(v * 100)
                n_match += 1
        expect = sum(s[t] / (100.0 * c[t]) for t in types)
        (r,) = QUERIES["q_ips_estimate"](spark, sf).collect()
        assert r.n_events == 4 and r.n_matched == n_match
        assert r.ips_value == pytest.approx(expect, abs=1e-6)

    def test_fixture_sanity(self, spark, sf_dir):
        (r,) = QUERIES["q_ips_estimate"](spark, sf_dir).collect()
        assert r.n_events > 0
        assert 0 <= r.n_matched <= r.n_events


# ------------------------------------- C172 per-source dup-rate audit


class TestDupRateBySource:
    def test_hand_counts_cross_source(self, spark, tmp_path):
        rows = [
            (1, "same", "en", "s1"),
            (2, "same", "en", "s2"),  # cross-source dup: BOTH flagged
            (3, "uniq1", "en", "s1"),
            (4, "within", "en", "s2"),
            (5, "within", "en", "s2"),  # within-source dup
            (6, "uniq2", "en", "s2"),
        ]
        sf = _write_docs(tmp_path, rows)
        out = {r.source: r for r in QUERIES["q_dup_rate_by_source"](spark, sf).collect()}
        assert out["s1"].n_docs == 2 and out["s1"].n_dup_docs == 1
        assert out["s1"].dup_rate == pytest.approx(0.5)
        assert out["s2"].n_docs == 4 and out["s2"].n_dup_docs == 3
        assert out["s2"].dup_rate == pytest.approx(0.75)

    def test_fixture_rates_bounded(self, spark, sf_dir):
        rows = QUERIES["q_dup_rate_by_source"](spark, sf_dir).collect()
        assert rows
        for r in rows:
            assert 0.0 <= r.dup_rate <= 1.0
            assert r.n_dup_docs <= r.n_docs


# ------------------------------------- C173 perplexity buckets


class TestPerplexityBuckets:
    def test_bucket_partition_and_order(self, spark, sf_dir):
        rows = QUERIES["q_perplexity_buckets"](spark, sf_dir).collect()
        assert rows
        buckets = {r.bucket for r in rows}
        assert buckets <= {1, 2, 3}
        # bucket 1 = highest lp (head). Across ALL langs, every
        # bucket-1 doc's lp >= every bucket-3 doc's lp (global cut).
        lo1 = min(r.lp_min for r in rows if r.bucket == 1)
        hi3 = max(r.lp_max for r in rows if r.bucket == 3)
        assert lo1 >= hi3 - 1e-9

    def test_counts_cover_corpus(self, spark, sf_dir, duck):
        rows = QUERIES["q_perplexity_buckets"](spark, sf_dir).collect()
        total = sum(r.n_docs for r in rows)
        (n_docs,) = duck.execute("SELECT count(*) FROM documents").fetchone()
        assert total == n_docs

    def test_terciles_near_equal(self, spark, sf_dir):
        rows = QUERIES["q_perplexity_buckets"](spark, sf_dir).collect()
        per_bucket = {}
        for r in rows:
            per_bucket[r.bucket] = per_bucket.get(r.bucket, 0) + r.n_docs
        ns = list(per_bucket.values())
        # ties-together banding: each tercile within one lp tie
        # group's mass of N/3 (lp is srnd6 of near-unique doc scores
        # on the fixture, so the slack is small)
        total = sum(ns)
        assert max(ns) - min(ns) <= max(2, 0.05 * total)
