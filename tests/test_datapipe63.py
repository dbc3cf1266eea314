"""Wave 66-68 semantic gates (datapipe63/64/65): every statistic is
recomputed by an independent pure-Python reference over the same
fixture rows (same quantization conventions), so a both-engines-
wrong oracle-parity pass cannot hide an algebra error. Oracle parity
itself runs in the standing battery (test_oracle_parity)."""

from __future__ import annotations

import math
from collections import Counter, defaultdict

from pyspark.sql import functions as F

from cassowary_spark import registry
from cassowary_spark.registry import QUERIES
from cassowary_spark.tables import load_table

registry.load_all()


def _srnd(x, n=6):
    return math.floor(x * 10**n + 0.5) / 10**n


def _cents(v):
    return math.floor(v * 100.0 + 0.5)


def test_welch_ttest_reference(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events").collect()
    groups = {"purchase": [], "click": []}
    for r in ev:
        if r.event_type in groups:
            groups[r.event_type].append(_cents(r.value))
    stats = {}
    for g, xs in groups.items():
        n = len(xs)
        s, q = sum(xs), sum(x * x for x in xs)
        m = s / n / 100.0
        v = (q / n - (s / n) ** 2) * n / (n - 1) / 10000.0
        stats[g] = (n, m, v)
    (na, ma, va), (nb, mb, vb) = stats["purchase"], stats["click"]
    out = QUERIES["q_welch_ttest"](spark, sf_dir).collect()[0]
    assert (out.n_a, out.n_b) == (na, nb)
    assert out.mean_a == _srnd(ma) and out.mean_b == _srnd(mb)
    se = va / na + vb / nb
    assert out.t_stat == _srnd((ma - mb) / math.sqrt(se))
    assert out.df == _srnd(
        se * se / (va / na * (va / na) / (na - 1) + vb / nb * (vb / nb) / (nb - 1))
    )


def test_jarque_bera_reference(spark, sf_dir):
    xs = [
        int(r.l_quantity)
        for r in load_table(spark, sf_dir, "lineitem")
        .select("l_quantity")
        .collect()
    ]
    n = len(xs)
    mu = sum(xs) / n
    r2 = sum(x * x for x in xs) / n
    r3 = sum(x**3 for x in xs) / n
    r4 = sum(x**4 for x in xs) / n
    m2 = r2 - mu * mu
    m3 = r3 - 3 * mu * r2 + 2 * mu**3
    m4 = r4 - 4 * mu * r3 + 6 * mu * mu * r2 - 3 * mu**4
    skew = m3 / math.sqrt(m2**3)
    exk = m4 / (m2 * m2) - 3.0
    out = QUERIES["q_jarque_bera"](spark, sf_dir).collect()[0]
    assert out.n == n
    assert out.skewness == _srnd(skew)
    assert out.ex_kurtosis == _srnd(exk)
    # uniform 1..50 is strongly platykurtic
    assert out.ex_kurtosis < -0.5


def test_levene_reference(spark, sf_dir):
    rows = load_table(spark, sf_dir, "orders").collect()
    by_grp = defaultdict(list)
    for r in rows:
        by_grp[r.o_orderpriority].append(_cents(r.o_totalprice))
    cells = {}
    for g, xs in by_grp.items():
        n, s = len(xs), sum(xs)
        zs = [math.floor(abs(x * n - s) * 100.0 / n + 0.5) for x in xs]
        cells[g] = (len(zs), sum(zs), sum(z * z for z in zs))
    nn = sum(c[0] for c in cells.values())
    ss = sum(c[1] for c in cells.values())
    qq = sum(c[2] for c in cells.values())
    gk = len(cells)
    s2n = 0.0
    for g in sorted(cells):
        n, s, _ = cells[g]
        s2n += float(s) * float(s) / float(n)
    msb = (s2n - float(ss) * float(ss) / nn) / 1e8 / (gk - 1)
    msw = (float(qq) - s2n) / 1e8 / (nn - gk)
    out = QUERIES["q_levene"](spark, sf_dir).collect()[0]
    assert (out.n_groups, out.n_rows) == (gk, nn)
    assert out.ms_between == _srnd(msb, 4)
    assert out.ms_within == _srnd(msw, 4)
    assert out.w_stat == _srnd(_srnd(msb, 4) / _srnd(msw, 4))


def _contingency(rows, rkey, ckey):
    o = Counter((rkey(r), ckey(r)) for r in rows)
    rm, cm = Counter(), Counter()
    for (rr, cc), k in o.items():
        rm[rr] += k
        cm[cc] += k
    n = sum(o.values())
    return o, rm, cm, n


def test_g_test_reference(spark, sf_dir):
    rows = load_table(spark, sf_dir, "events").collect()
    o, rm, cm, n = _contingency(
        rows, lambda r: r.event_type, lambda r: r.user_id % 2
    )
    g = 0.0
    for key in sorted(o):
        k = o[key]
        g += k * math.log(k * n / (rm[key[0]] * cm[key[1]]))
    out = QUERIES["q_g_test"](spark, sf_dir).collect()[0]
    assert out.n == n
    assert out.dof == (len(rm) - 1) * (len(cm) - 1)
    assert out.g_stat == _srnd(2.0 * g)


def test_cramers_v_reference(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders").collect()
    c = {
        r.c_custkey: r.c_mktsegment
        for r in load_table(spark, sf_dir, "customer").collect()
    }
    obs, rm, cm, n = _contingency(
        o, lambda r: r.o_orderpriority, lambda r: c[r.o_custkey]
    )
    chi2 = 0.0
    for rr in sorted(rm):
        for cc in sorted(cm):
            e = rm[rr] * cm[cc] / n
            chi2 += (obs.get((rr, cc), 0) - e) ** 2 / e
    out = QUERIES["q_cramers_v"](spark, sf_dir).collect()[0]
    assert out.n == n
    assert out.chi2 == _srnd(chi2, 4)
    v = math.sqrt(_srnd(chi2, 4) / (n * (min(len(rm), len(cm)) - 1)))
    assert out.cramers_v == _srnd(v)
    assert 0.0 <= out.cramers_v <= 1.0


def test_kendall_tau_reference(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem").collect()
    cells = Counter(
        (int(r.l_quantity), _cents(r.l_discount) // 1) for r in li
    )
    # recompute discount key exactly as the query (floor(d*100+0.5))
    cells = Counter()
    for r in li:
        cells[(int(r.l_quantity), math.floor(r.l_discount * 100.0 + 0.5))] += 1
    items = list(cells.items())
    conc = disc = 0
    for i, ((x1, y1), n1) in enumerate(items):
        for (x2, y2), n2 in items[i + 1 :]:
            if (x1 < x2 and y1 < y2) or (x1 > x2 and y1 > y2):
                conc += n1 * n2
            elif (x1 < x2 and y1 > y2) or (x1 > x2 and y1 < y2):
                disc += n1 * n2
    n = sum(cells.values())
    tx = Counter()
    ty = Counter()
    for (x, y), k in cells.items():
        tx[x] += k
        ty[y] += k
    n0 = n * (n - 1) / 2
    t1 = sum(t * (t - 1) // 2 for t in tx.values())
    t2 = sum(t * (t - 1) // 2 for t in ty.values())
    out = QUERIES["q_kendall_tau"](spark, sf_dir).collect()[0]
    assert (out.concordant, out.discordant) == (conc, disc)
    assert out.n == n
    assert out.tau_b == _srnd(
        (conc - disc) / math.sqrt((n0 - t1) * (n0 - t2))
    )


def test_friedman_reference(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events").collect()
    cells = Counter((str(r.ts)[:10], r.event_type) for r in ev)
    blocks = sorted({b for b, _ in cells})
    trts = sorted({t for _, t in cells})
    r2 = Counter()
    for b in blocks:
        vals = [(cells.get((b, t), 0), t) for t in trts]
        byv = Counter(v for v, _ in vals)
        srt = sorted(v for v, _ in vals)
        for v, t in vals:
            min_rank = srt.index(v) + 1
            r2[t] += 2 * min_rank + byv[v] - 1
    n, k = len(blocks), len(trts)
    q = 12.0 / (n * k * (k + 1)) * sum(
        float(r2[t]) * r2[t] / 4.0 for t in trts
    ) - 3.0 * n * (k + 1)
    out = QUERIES["q_friedman"](spark, sf_dir).collect()[0]
    assert (out.n_blocks, out.k_treatments) == (n, k)
    assert out.q_stat == _srnd(q)


def _daily_rev(spark, sf_dir):
    rows = load_table(spark, sf_dir, "orders").collect()
    daily = Counter()
    for r in rows:
        daily[str(r.o_orderdate)[:10]] += math.floor(r.o_totalprice + 0.5)
    return [daily[d] for d in sorted(daily)]


def test_durbin_watson_reference(spark, sf_dir):
    rev = _daily_rev(spark, sf_dir)
    n, s = len(rev), sum(rev)
    sdiff = sum((b - a) ** 2 for a, b in zip(rev, rev[1:]))
    sdev = sum((r * n - s) ** 2 for r in rev)
    out = QUERIES["q_durbin_watson"](spark, sf_dir).collect()[0]
    assert out.n_days == n
    assert out.dw_stat == _srnd(n * n * sdiff / sdev)
    assert 0.0 <= out.dw_stat <= 4.0


def test_ljung_box_reference(spark, sf_dir):
    rev = _daily_rev(spark, sf_dir)
    n = len(rev)
    qsum = 0.0
    for k in range(1, 8):
        xs, ys = rev[k:], rev[:-k]
        np_ = len(xs)
        sx, sy = sum(xs), sum(ys)
        sxx = sum(x * x for x in xs)
        syy = sum(y * y for y in ys)
        sxy = sum(x * y for x, y in zip(xs, ys))
        # the query pairs (rev, lag_k): rev_t with rev_{t-k} — same set
        r = _srnd(
            (np_ * sxy - sx * sy)
            / math.sqrt(
                float(np_ * sxx - sx * sx) * float(np_ * syy - sy * sy)
            )
        )
        qsum += r * r / (n - k)
    out = QUERIES["q_ljung_box"](spark, sf_dir).collect()[0]
    assert (out.n_days, out.dof) == (n, 7)
    assert out.q_stat == _srnd(n * (n + 2.0) * qsum)


def test_wald_iv_reference(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events").collect()
    per_user = defaultdict(lambda: [0, 0])
    for r in ev:
        if r.event_type == "purchase":
            per_user[r.user_id][0] += 1
            per_user[r.user_id][1] += _cents(r.value)
        else:
            per_user[r.user_id]
    arms = {0: [0, 0, 0], 1: [0, 0, 0]}
    for u, (x, y) in per_user.items():
        a = arms[u % 2]
        a[0] += 1
        a[1] += x
        a[2] += y
    (n0, sx0, sy0), (n1, sx1, sy1) = arms[0], arms[1]
    dy = sy1 / n1 / 100.0 - sy0 / n0 / 100.0
    dx = sx1 / n1 - sx0 / n0
    out = QUERIES["q_wald_iv"](spark, sf_dir).collect()[0]
    assert (out.n_users_0, out.n_users_1) == (n0, n1)
    assert out.itt_y == _srnd(dy)
    assert out.itt_x == _srnd(dx)
    assert out.wald_late == _srnd(dy / dx)


def test_rdd_placebo_near_zero(spark, sf_dir):
    # TPC-H has no threshold treatment at $150k: the fitted jump is a
    # placebo and must be small relative to the outcome scale (~4
    # lineitems per order)
    out = QUERIES["q_rdd_lite"](spark, sf_dir).collect()[0]
    assert out.n_left > 0 and out.n_right > 0
    assert abs(out.rdd_effect) < 1.5
    assert out.y0_left > 0 and out.y0_right > 0


def test_horvitz_thompson_reference(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").collect()
    strata = defaultdict(lambda: [0, 0, 0, 0])  # pop, sampled, true, ht
    for r in docs:
        short = r.n_chars < 1000
        m = 4 if short else 2
        st = strata["short" if short else "long"]
        st[0] += 1
        st[2] += r.n_chars
        if r.doc_id % m == 0:
            st[1] += 1
            st[3] += r.n_chars * m
    out = {r.stratum: r for r in QUERIES["q_horvitz_thompson"](spark, sf_dir).collect()}
    for name, (pop, ns, true, ht) in strata.items():
        r = out[name]
        assert (r.n_pop, r.n_sampled, r.true_total, r.ht_total) == (
            pop,
            ns,
            true,
            ht,
        )
        assert r.ht_ratio == _srnd(ht / true)
        assert 0.5 < r.ht_ratio < 2.0  # dense ids: estimator near 1


def test_colloc_llr_properties(spark, sf_dir):
    rows = QUERIES["q_colloc_llr"](spark, sf_dir).collect()
    assert rows, "top-k collocations must be non-empty"
    llrs = [r.llr for r in rows]
    assert llrs == sorted(llrs, reverse=True)
    assert all(r.k11 >= 5 for r in rows)
    # reference-check the TOP pair's LLR from raw bigram counts
    docs = load_table(spark, sf_dir, "documents").collect()
    cells = Counter()
    for d in docs:
        ts = d.text.split(" ")
        for a, b in zip(ts, ts[1:]):
            cells[(a, b)] += 1
    n = sum(cells.values())
    rm, cm = Counter(), Counter()
    for (a, b), k in cells.items():
        rm[a] += k
        cm[b] += k
    top = rows[0]
    k11 = cells[(top.w1, top.w2)]
    r_, c_ = rm[top.w1], cm[top.w2]
    k12, k21, k22 = r_ - k11, c_ - k11, n - r_ - c_ + k11
    llr = 2.0 * (
        k11 * math.log(k11 * n / (r_ * c_))
        + (k12 * math.log(k12 * n / (r_ * (n - c_))) if k12 > 0 else 0.0)
        + (k21 * math.log(k21 * n / ((n - r_) * c_)) if k21 > 0 else 0.0)
        + k22 * math.log(k22 * n / ((n - r_) * (n - c_)))
    )
    assert top.k11 == k11
    assert top.llr == _srnd(llr, 4)


def test_heaps_law_reference(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").collect()
    per_src = defaultdict(lambda: [0, set()])
    for d in docs:
        st = per_src[d.source]
        toks = d.text.split(" ")
        st[0] += len(toks)
        st[1].update(toks)
    sx = sy = sxx = sxy = 0.0
    for s in sorted(per_src):
        ntok, vocab = per_src[s][0], len(per_src[s][1])
        x, y = math.log(ntok), math.log(vocab)
        sx += x
        sy += y
        sxx += x * x
        sxy += x * y
    g = len(per_src)
    beta = (g * sxy - sx * sy) / (g * sxx - sx * sx)
    out = QUERIES["q_heaps_law"](spark, sf_dir).collect()[0]
    assert out.n_sources == g
    assert out.beta == _srnd(beta)
    assert out.k_coef == _srnd(math.exp((sy - beta * sx) / g), 4)
    assert 0.0 < out.beta <= 1.2  # sublinear-ish vocabulary growth


def test_lognormal_fit_reference(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").collect()
    lqs = [
        math.floor(math.log(d.n_chars) * 1e9 + 0.5)
        for d in docs
        if d.n_chars > 0
    ]
    n, s1, s2 = len(lqs), sum(lqs), sum(q * q for q in lqs)
    mu = s1 / n / 1e9
    sigma = math.sqrt((s2 / n - (s1 / n) ** 2) * n / (n - 1)) / 1e9
    out = QUERIES["q_lognormal_fit"](spark, sf_dir).collect()[0]
    assert out.n == n
    assert out.mu == _srnd(mu)
    assert out.sigma == _srnd(sigma)
    assert out.median_len == _srnd(math.exp(s1 / n / 1e9), 2)


def test_session_entropy_reference(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events").collect()
    per_user = defaultdict(Counter)
    for r in ev:
        per_user[r.user_id][r.event_type] += 1
    out = {
        r.user_id: r
        for r in QUERIES["q_session_entropy"](spark, sf_dir).collect()
    }
    assert set(out) == set(per_user)
    for u, cnts in per_user.items():
        n = sum(cnts.values())
        h = math.log(n) - sum(k * math.log(k) for k in cnts.values()) / n
        r = out[u]
        assert (r.n_events, r.n_types) == (n, len(cnts))
        assert r.entropy == _srnd(h)
        assert -1e-9 <= r.entropy <= math.log(5) + 1e-9
