"""Planted gates for wave 35: q_conformal_interval (C158) and
q_stratified_kfold (C159). Hash bucketing defeats hand-planted split
membership, so the gates replicate the exact pipeline in pure Python
over the fixture and check the statistical guarantees the operators
exist to provide."""

from __future__ import annotations

import hashlib
import math
from collections import defaultdict

import pytest

from cassowary_spark import registry
from cassowary_spark.registry import QUERIES

registry.load_all()


def _srnd(x: float, n: int) -> float:
    s = float(10**n)
    return math.floor(x * s + 0.5) / s


def _u32(key) -> int:
    return int(hashlib.md5(str(key).encode()).hexdigest()[:8], 16)


def _docs(duck):
    return duck.execute(
        "SELECT doc_id, lang, n_chars FROM documents"
    ).fetchall()


class TestConformalInterval:
    def test_matches_python_replication(self, spark, sf_dir, duck):
        rows = {r.lang: r for r in QUERIES["q_conformal_interval"](spark, sf_dir).collect()}
        train, cal, test = defaultdict(list), defaultdict(list), defaultdict(list)
        for doc_id, lang, n_chars in _docs(duck):
            b = _u32(doc_id) % 10
            (train if b <= 6 else cal if b <= 8 else test)[lang].append(n_chars)
        for lang, r in rows.items():
            pred = (sum(train[lang]) * 1000000) // len(train[lang])
            res = sorted(abs(c * 1000000 - pred) for c in cal[lang])
            k = min(math.ceil((len(res) + 1) * 0.9), len(res))
            q_hat = res[k - 1]
            assert r.n_cal == len(res)
            assert r.q_hat_micro == q_hat, lang
            assert r.n_test == len(test[lang])
            cov = sum(
                1 for c in test[lang] if abs(c * 1000000 - pred) <= q_hat
            )
            assert r.coverage == _srnd(cov / len(test[lang]), 4), lang

    def test_coverage_near_target(self, spark, sf_dir):
        """Split-conformal guarantees E[cover] >= 1 - alpha MARGINALLY
        over calibration draws; tiny strata (zh has 5 test docs at
        sf0.001) can legitimately miss by a lot in one realization, so
        the per-stratum bound applies only at n_test >= 30 and the
        pooled coverage carries the main gate."""
        rows = QUERIES["q_conformal_interval"](spark, sf_dir).collect()
        assert rows
        covered = total = 0
        for r in rows:
            assert r.q_hat_micro > 0
            covered += round(r.coverage * r.n_test)
            total += r.n_test
            if r.n_test >= 30:
                assert r.coverage >= 0.75, (r.lang, r.coverage)
        assert covered / total >= 0.6, (covered, total)

    def test_every_lang_present(self, spark, sf_dir, duck):
        langs = {x[0] for x in duck.execute("SELECT DISTINCT lang FROM documents").fetchall()}
        got = {r.lang for r in QUERIES["q_conformal_interval"](spark, sf_dir).collect()}
        assert got == langs


class TestStratifiedKfold:
    def test_matches_python_replication(self, spark, sf_dir, duck):
        rows = QUERIES["q_stratified_kfold"](spark, sf_dir).collect()
        per_n, per_s = defaultdict(int), defaultdict(int)
        for doc_id, lang, n_chars in _docs(duck):
            f = _u32(doc_id) % 5
            per_n[(f, lang)] += 1
            per_s[(f, lang)] += n_chars
        tot_n, tot_s = defaultdict(int), defaultdict(int)
        for (f, lang), n in per_n.items():
            tot_n[lang] += n
            tot_s[lang] += per_s[(f, lang)]
        assert len(rows) == len(per_n)
        for r in rows:
            key = (r.fold, r.lang)
            assert r.n == per_n[key]
            assert r.frac == _srnd(per_n[key] / tot_n[r.lang], 6)
            oof = (tot_s[r.lang] - per_s[key]) / (tot_n[r.lang] - per_n[key])
            assert r.oof_mean_chars == _srnd(oof, 6), key

    def test_oof_equals_naive_complement(self, spark, sf_dir, duck):
        """The one-pass leave-one-out identity must equal literally
        re-averaging the complement of each fold."""
        rows = QUERIES["q_stratified_kfold"](spark, sf_dir).collect()
        docs = _docs(duck)
        for r in rows[:5]:  # spot-check a handful
            comp = [
                n_chars
                for doc_id, lang, n_chars in docs
                if lang == r.lang and _u32(doc_id) % 5 != r.fold
            ]
            assert r.oof_mean_chars == _srnd(sum(comp) / len(comp), 6)

    def test_fracs_sum_to_one_per_stratum(self, spark, sf_dir):
        rows = QUERIES["q_stratified_kfold"](spark, sf_dir).collect()
        by_lang = defaultdict(float)
        for r in rows:
            by_lang[r.lang] += r.frac
        for lang, s in by_lang.items():
            assert s == pytest.approx(1.0, abs=1e-4), lang
