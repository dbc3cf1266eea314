"""Wave-73 semantic gates (datapipe70): pure-Python references for
ICC(1,1), Bhattacharyya, MCC and permutation entropy. Oracle parity
runs in the standing battery (test_oracle_parity)."""

from __future__ import annotations

import hashlib
import math
from collections import Counter, defaultdict

from cassowary_spark import registry
from cassowary_spark.registry import QUERIES
from cassowary_spark.tables import load_table

registry.load_all()


def _srnd(x, n=6):
    return math.floor(x * 10**n + 0.5) / 10**n


def test_icc_reference(spark, sf_dir):
    rows = load_table(spark, sf_dir, "events").collect()
    per = defaultdict(list)
    for r in rows:
        per[r.user_id].append(math.floor(r.value * 100 + 0.5))
    k = len(per)
    nn = sum(len(v) for v in per.values())
    st = sum(sum(v) for v in per.values())
    qt = sum(x * x for v in per.values() for x in v)
    nsq = sum(len(v) ** 2 for v in per.values())
    ssq = sum(
        math.floor(sum(v) * sum(v) / len(v) * 1e4 + 0.5) for v in per.values()
    ) / 1e4
    ssb = ssq - st * st / nn
    ssw = qt - ssq
    msb, msw = ssb / (k - 1), ssw / (nn - k)
    n0 = (nn - nsq / nn) / (k - 1)
    icc = (msb - msw) / (msb + (n0 - 1) * msw)
    out = QUERIES["q_icc"](spark, sf_dir).collect()[0]
    assert (out.n_groups, out.n_rows) == (k, nn)
    assert abs(out.icc1 - _srnd(icc)) < 2e-6
    assert -1.0 <= out.icc1 <= 1.0


def test_bhattacharyya_reference(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").collect()
    a = Counter(r.lang for r in docs if r.source == "src0")
    b = Counter(r.lang for r in docs if r.source == "src1")
    langs = set(a) | set(b)
    na, nb = sum(a.values()), sum(b.values())
    bcq = sum(
        math.floor(
            math.sqrt((a.get(l, 0) / na) * (b.get(l, 0) / nb)) * 1e8 + 0.5
        )
        for l in langs
    )
    out = QUERIES["q_bhattacharyya"](spark, sf_dir).collect()[0]
    assert out.n_langs == len(langs)
    assert out.bc == _srnd(bcq / 1e8)
    assert out.bhattacharyya_dist == _srnd(-math.log(bcq / 1e8))
    assert 0 < out.bc <= 1.0 + 1e-9  # overlapping mixes


def test_mcc_reference(spark, sf_dir):
    rows = load_table(spark, sf_dir, "orders").collect()
    tp = fp = tn = fn = 0
    for r in rows:
        y = 1 if r.o_orderstatus == "F" else 0
        h = int(hashlib.md5(str(r.o_orderkey).encode()).hexdigest()[:8], 16)
        s = h % 1000 + 300 * y
        if s >= 650:
            tp, fp = tp + y, fp + (1 - y)
        else:
            fn, tn = fn + y, tn + (1 - y)
    mcc = (tp * tn - fp * fn) / math.sqrt(
        (tp + fp) * (tp + fn) * (tn + fp) * (tn + fn)
    )
    out = QUERIES["q_mcc"](spark, sf_dir).collect()[0]
    assert (out.tp, out.fp, out.tn, out.fn) == (tp, fp, tn, fn)
    assert abs(out.mcc - _srnd(mcc)) < 2e-6
    assert out.mcc > 0  # the planted +300 shift is better than chance


def test_perm_entropy_reference(spark, sf_dir):
    rows = load_table(spark, sf_dir, "orders").collect()
    daily = Counter()
    for r in rows:
        daily[str(r.o_orderdate)[:10]] += math.floor(r.o_totalprice + 0.5)
    rev = [daily[d] for d in sorted(daily)]

    def pat(a, b, c):
        if a < b and b < c:
            return 0
        if a < c and c <= b:
            return 1
        if b <= a and a < c:
            return 2
        if c <= a and a < b:
            return 3
        if b < c and c <= a:
            return 4
        return 5

    cnt = Counter(
        pat(rev[i], rev[i + 1], rev[i + 2]) for i in range(len(rev) - 2)
    )
    nw = sum(cnt.values())
    hq = sum(
        math.floor(-(n / nw) * math.log(n / nw) * 1e8 + 0.5)
        for n in cnt.values()
    )
    out = QUERIES["q_perm_entropy"](spark, sf_dir).collect()[0]
    assert (out.n_windows, out.n_patterns) == (nw, len(cnt))
    assert out.perm_entropy == _srnd(hq / 1e8)
    assert out.normalized == _srnd(hq / 1e8 / math.log(6))
    assert 0 <= out.normalized <= 1.0 + 1e-9
