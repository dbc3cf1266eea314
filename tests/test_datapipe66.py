"""Wave-69 semantic gates (datapipe66): independent Python references
for the gap histogram, Wilson funnel, selectivity profile and join-
cardinality audit. Oracle parity runs in the standing battery."""

from __future__ import annotations

import math
from collections import Counter, defaultdict

from cassowary_spark import registry
from cassowary_spark.registry import QUERIES
from cassowary_spark.tables import load_table

registry.load_all()


def _srnd(x, n=6):
    return math.floor(x * 10**n + 0.5) / 10**n


def test_gap_histogram_reference(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events").collect()
    per_user = defaultdict(list)
    for r in ev:
        per_user[r.user_id].append((r.event_id, math.floor(r.ts.timestamp())))
    buckets = Counter()
    for rows in per_user.values():
        rows.sort()
        for (_, a), (_, b) in zip(rows, rows[1:]):
            g = b - a
            if g > 0:
                buckets[math.floor(math.log(g) / math.log(2.0))] += 1
    tot = sum(buckets.values())
    out = {r.bucket: r for r in QUERIES["q_gap_histogram"](spark, sf_dir).collect()}
    assert set(out) == set(buckets)
    for b, n in buckets.items():
        assert out[b].n_gaps == n
        assert out[b].share == _srnd(n / tot)
    assert abs(sum(r.share for r in out.values()) - 1.0) < 1e-4


def test_funnel_wilson_reference(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events").collect()
    flags = defaultdict(lambda: [0, 0, 0])
    steps = ["view", "click", "purchase"]
    for r in ev:
        if r.event_type in steps:
            flags[r.user_id][steps.index(r.event_type)] = 1
    z = 1.959963985
    out = {r.step: r for r in QUERIES["q_funnel_wilson"](spark, sf_dir).collect()}
    for i, name in enumerate(["view->click", "click->purchase"]):
        base = sum(1 for f in flags.values() if f[i])
        conv = sum(1 for f in flags.values() if f[i] and f[i + 1])
        p = conv / base
        half = z * math.sqrt((p * (1 - p) + z * z / (4 * base)) / base)
        denom = 1 + z * z / base
        r = out[name]
        assert (r.n_base, r.n_conv) == (base, conv)
        assert r.rate == _srnd(p)
        assert r.wilson_lo == _srnd((p + z * z / (2 * base) - half) / denom)
        assert r.wilson_hi == _srnd((p + z * z / (2 * base) + half) / denom)
        assert 0.0 <= r.wilson_lo <= r.rate <= r.wilson_hi <= 1.0


def test_selectivity_profile_reference(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").collect()
    out = {r.col: r for r in QUERIES["q_selectivity_profile"](spark, sf_dir).collect()}
    n = len(docs)
    for col in ("source", "lang"):
        cnt = Counter(getattr(d, col) for d in docs)
        r = out[col]
        assert r.ndv == len(cnt)
        assert r.top1_share == _srnd(max(cnt.values()) / n)
        eq = sum(c * c for c in cnt.values()) / (n * n)
        assert r.eq_selectivity == _srnd(eq)
        assert r.uniform_selectivity == _srnd(1.0 / len(cnt))
        # skewed columns: true selectivity >= uniform assumption
        assert r.eq_selectivity >= r.uniform_selectivity - 1e-9


def test_join_card_est_reference(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem").collect()
    cnt = Counter(r.l_partkey for r in li)
    n, ndv = len(li), len(cnt)
    actual = sum(c * c for c in cnt.values())
    out = QUERIES["q_join_card_est"](spark, sf_dir).collect()[0]
    assert (out.n_rows, out.ndv) == (n, ndv)
    assert out.actual_selfjoin == actual
    assert out.indep_est == n * n // ndv
    assert out.skew_factor == _srnd(actual / (n * n / ndv))
    assert out.skew_factor >= 0.99  # Cauchy-Schwarz: >= 1 up to srnd
