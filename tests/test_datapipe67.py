"""Wave-70 semantic gates (datapipe67): Python references for the
Page-Hinkley range and the Youden-J operating point."""

from __future__ import annotations

import math
from collections import Counter

from cassowary_spark import registry
from cassowary_spark.registry import QUERIES
from cassowary_spark.tables import load_table

registry.load_all()


def _srnd(x, n=6):
    return math.floor(x * 10**n + 0.5) / 10**n


def test_page_hinkley_reference(spark, sf_dir):
    rows = load_table(spark, sf_dir, "orders").collect()
    daily = Counter()
    for r in rows:
        daily[str(r.o_orderdate)[:10]] += math.floor(r.o_totalprice + 0.5)
    days = sorted(daily)
    n = len(days)
    s = sum(daily.values())
    cum = 0
    path = []
    for t, d in enumerate(days, start=1):
        cum += daily[d]
        path.append((cum * n - t * s, d))
    mx = max(v for v, _ in path)
    mn = min(v for v, _ in path)
    peak = min(d for v, d in path if v == mx)
    trough = min(d for v, d in path if v == mn)
    out = QUERIES["q_page_hinkley"](spark, sf_dir).collect()[0]
    assert out.n_days == n
    assert (out.peak_day, out.trough_day) == (peak, trough)
    assert out.ph_range == _srnd((mx - mn) / n / n, 4)
    assert out.ph_range >= 0


def test_youden_j_reference(spark, sf_dir):
    from cassowary_spark.queries.datapipe13 import _scored

    rows = _scored(spark, sf_dir).collect()
    by_s = {}
    for r in rows:
        np_, nn_ = by_s.get(r.s, (0, 0))
        by_s[r.s] = (np_ + r.y, nn_ + 1 - r.y)
    n_pos = sum(a for a, _ in by_s.values())
    n_neg = sum(b for _, b in by_s.values())
    best = None
    tp = fp = 0
    for s in sorted(by_s, reverse=True):
        tp += by_s[s][0]
        fp += by_s[s][1]
        j = tp * n_neg - fp * n_pos
        # ties break to the LOWEST threshold: >= on j wins later
        # (lower) s
        if best is None or j > best[0] or (j == best[0] and s < best[1]):
            best = (j, s, tp, fp)
    j, s, tp, fp = best
    out = QUERIES["q_youden_j"](spark, sf_dir).collect()[0]
    assert (out.threshold, out.tp, out.fp) == (s, tp, fp)
    assert (out.n_pos, out.n_neg) == (n_pos, n_neg)
    assert out.tpr == _srnd(tp / n_pos)
    assert out.fpr == _srnd(fp / n_neg)
    assert out.youden_j == _srnd(j / (n_pos * n_neg))
    # a synthetic scorer with +300 signal separates: J must be clearly
    # positive
    assert out.youden_j > 0.1
