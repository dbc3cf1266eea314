"""Wave-72 semantic gates (datapipe69): pure-Python references for
the effect-size / inequality / shift / reliability / retrieval /
rare-token operators. Oracle parity runs in the standing battery
(test_oracle_parity)."""

from __future__ import annotations

import math
from collections import Counter, defaultdict

from cassowary_spark import registry
from cassowary_spark.registry import QUERIES
from cassowary_spark.tables import load_table

registry.load_all()


def _srnd(x, n=6):
    return math.floor(x * 10**n + 0.5) / 10**n


def _events(spark, sf_dir):
    return load_table(spark, sf_dir, "events").collect()


def test_cohens_d_reference(spark, sf_dir):
    rows = _events(spark, sf_dir)
    a = [math.floor(r.value * 100 + 0.5) for r in rows if r.event_type == "click"]
    b = [math.floor(r.value * 100 + 0.5) for r in rows if r.event_type == "view"]
    na, nb = len(a), len(b)
    ma, mb = sum(a) / na, sum(b) / nb
    ssq = (sum(x * x for x in a) - sum(a) ** 2 / na) + (
        sum(x * x for x in b) - sum(b) ** 2 / nb
    )
    d = (ma - mb) / math.sqrt(ssq / (na + nb - 2))
    g = d * (1 - 3 / (4 * (na + nb) - 9))
    out = QUERIES["q_cohens_d"](spark, sf_dir).collect()[0]
    assert (out.n_a, out.n_b) == (na, nb)
    assert abs(out.cohens_d - _srnd(d)) < 2e-6
    assert abs(out.hedges_g - _srnd(g)) < 2e-6
    # the correction shrinks toward zero
    assert abs(out.hedges_g) <= abs(out.cohens_d) + 1e-12


def test_bartlett_reference(spark, sf_dir):
    rows = load_table(spark, sf_dir, "lineitem").collect()
    groups = defaultdict(list)
    for r in rows:
        groups[r.l_returnflag].append(math.floor(r.l_extendedprice + 0.5))
    k = len(groups)
    nn = sum(len(v) for v in groups.values())
    lnsum = 0
    wv = 0
    inv = 0
    for v in groups.values():
        n = len(v)
        a = n * sum(x * x for x in v) - sum(v) ** 2
        s2 = (a / n) / (n - 1)
        lnsum += (n - 1) * math.floor(math.log(s2) * 1e8 + 0.5)
        wv += (n - 1) * math.floor(s2 * 1e4 + 0.5)
        inv += math.floor(1e15 / (n - 1) + 0.5)
    sp2 = wv / 1e4 / (nn - k)
    num = (nn - k) * math.log(sp2) - lnsum / 1e8
    c = 1 + (inv / 1e15 - 1 / (nn - k)) / (3 * (k - 1))
    out = QUERIES["q_bartlett"](spark, sf_dir).collect()[0]
    assert (out.n_groups, out.n_rows) == (k, nn)
    assert abs(out.bartlett_t - _srnd(num / c)) < 2e-6
    assert out.bartlett_t >= 0  # T is a scaled log-ratio, >= 0 by AM-GM


def _spend(spark, sf_dir):
    rows = load_table(spark, sf_dir, "orders").collect()
    spend = Counter()
    for r in rows:
        spend[r.o_custkey] += math.floor(r.o_totalprice * 100 + 0.5)
    return spend


def test_atkinson_reference(spark, sf_dir):
    spend = _spend(spark, sf_dir)
    xs = [v for v in spend.values() if v > 0]
    n = len(xs)
    lq = sum(math.floor(math.log(x) * 1e8 + 0.5) for x in xs)
    a = 1 - math.exp(lq / n / 1e8) / (sum(xs) / n)
    out = QUERIES["q_atkinson_index"](spark, sf_dir).collect()[0]
    assert out.n_customers == n
    assert abs(out.atkinson - _srnd(a)) < 2e-6
    assert 0 <= out.atkinson < 1  # AM-GM: geomean <= mean


def test_palma_reference(spark, sf_dir):
    spend = _spend(spark, sf_dir)
    cells = Counter(spend.values())
    tot = sum(cells.values())
    cum = 0
    top = bot = 0
    for v in sorted(cells):
        cum += cells[v]
        band = 1 + ((cum - 1) * 10) // tot
        if band == 10:
            top += v * cells[v]
        elif band <= 4:
            bot += v * cells[v]
    out = QUERIES["q_palma_ratio"](spark, sf_dir).collect()[0]
    assert out.n_customers == tot
    assert (out.top10_cents, out.bottom40_cents) == (top, bot)
    assert out.palma == _srnd(top / bot)
    assert out.palma >= 0.25  # top decile can't hold less than its share


def test_hodges_lehmann_reference(spark, sf_dir):
    rows = _events(spark, sf_dir)
    a = Counter(
        math.floor(r.value + 0.5) for r in rows if r.event_type == "click"
    )
    b = Counter(
        math.floor(r.value + 0.5) for r in rows if r.event_type == "view"
    )
    diffs = Counter()
    for x, nx in a.items():
        for y, ny in b.items():
            diffs[x - y] += nx * ny
    tot = sum(diffs.values())
    cum = 0
    hl = None
    for d in sorted(diffs):
        cum += diffs[d]
        if 2 * cum >= tot:
            hl = d
            break
    out = QUERIES["q_hodges_lehmann"](spark, sf_dir).collect()[0]
    assert (out.n_a, out.n_b) == (sum(a.values()), sum(b.values()))
    assert out.n_pairs == tot
    assert out.hl_shift == hl


def test_cronbach_reference(spark, sf_dir):
    rows = _events(spark, sf_dir)
    items = ("click", "view", "purchase", "signup", "error")
    mat = defaultdict(lambda: [0] * len(items))
    for r in rows:
        if r.event_type in items:
            mat[r.user_id][items.index(r.event_type)] += math.floor(
                r.value * 100 + 0.5
            )
    n = len(mat)
    k = len(items)
    num = 0
    for i in range(k):
        xs = [v[i] for v in mat.values()]
        num += n * sum(x * x for x in xs) - sum(xs) ** 2
    ts = [sum(v) for v in mat.values()]
    den = n * sum(t * t for t in ts) - sum(ts) ** 2
    alpha = (k / (k - 1)) * (1 - num / den)
    out = QUERIES["q_cronbach_alpha"](spark, sf_dir).collect()[0]
    assert (out.n_users, out.k_items) == (n, k)
    assert abs(out.cronbach_alpha - _srnd(alpha)) < 2e-6


def test_dirichlet_lm_reference(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").collect()
    terms, mu = ("scan", "join", "vector"), 2000.0
    dl = {}
    tf = defaultdict(Counter)
    for r in docs:
        toks = r.text.split(" ")
        dl[r.doc_id] = len(toks)
        for w in toks:
            if w in terms:
                tf[r.doc_id][w] += 1
    coll = sum(dl.values())
    cf = Counter()
    for c in tf.values():
        cf.update(c)
    mup = {w: mu * cf[w] / coll for w in cf}
    basep = sum(math.floor(math.log(mup[w]) * 1e8 + 0.5) for w in cf)
    scored = []
    for d in dl:
        cq = sum(
            math.floor(
                (math.log(tf[d][w] + mup[w]) - math.log(mup[w])) * 1e8 + 0.5
            )
            for w in tf.get(d, {})
        )
        s = (basep + cq) / 1e8 - len(cf) * math.log(dl[d] + mu)
        scored.append((_srnd(s, 4), d, len(tf.get(d, {}))))
    scored.sort(key=lambda t: (-t[0], t[1]))
    got = QUERIES["q_dirichlet_lm"](spark, sf_dir).collect()
    assert len(got) == 20
    for row, (s, d, nm) in zip(got, scored[:20]):
        assert (row.doc_id, row.n_matched, row.dlm_score) == (d, nm, s)
    # docs matching more query terms rank above pure-smoothing docs
    assert got[0].n_matched >= got[-1].n_matched


def test_rare_token_docs_reference(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").collect()
    dts = {r.doc_id: set(r.text.split(" ")) for r in docs}
    src = {r.doc_id: r.source for r in docs}
    df = Counter()
    for s in dts.values():
        df.update(s)
    per_src = defaultdict(lambda: [0, 0, 0])  # n, flagged, frac_q sum
    for d, toks in dts.items():
        rare = sum(1 for w in toks if df[w] <= 2)
        fq = math.floor(rare / len(toks) * 1e6 + 0.5)
        e = per_src[src[d]]
        e[0] += 1
        e[1] += 1 if fq >= 200000 else 0
        e[2] += fq
    got = {r.source: r for r in QUERIES["q_rare_token_docs"](spark, sf_dir).collect()}
    assert set(got) == set(per_src)
    for s, (n, fl, fqs) in per_src.items():
        assert got[s].n_docs == n
        assert got[s].n_flagged == fl
        assert got[s].avg_rare_frac == _srnd(fqs / n / 1e6)
