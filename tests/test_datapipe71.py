"""Wave-74 semantic gates (datapipe71): Python references for
Cliff's delta and Theil's U. Oracle parity runs in the standing
battery (test_oracle_parity)."""

from __future__ import annotations

import math
from collections import Counter

from cassowary_spark import registry
from cassowary_spark.registry import QUERIES
from cassowary_spark.tables import load_table

registry.load_all()


def _srnd(x, n=6):
    return math.floor(x * 10**n + 0.5) / 10**n


def test_cliffs_delta_reference(spark, sf_dir):
    rows = load_table(spark, sf_dir, "events").collect()
    a = Counter(
        math.floor(r.value * 100 + 0.5) for r in rows if r.event_type == "click"
    )
    b = Counter(
        math.floor(r.value * 100 + 0.5) for r in rows if r.event_type == "view"
    )
    gt = sum(na * nb for x, na in a.items() for y, nb in b.items() if x > y)
    lt = sum(na * nb for x, na in a.items() for y, nb in b.items() if x < y)
    na_, nb_ = sum(a.values()), sum(b.values())
    out = QUERIES["q_cliffs_delta"](spark, sf_dir).collect()[0]
    assert (out.n_a, out.n_b) == (na_, nb_)
    assert (out.n_greater, out.n_less) == (gt, lt)
    assert out.cliffs_delta == _srnd((gt - lt) / (na_ * nb_))
    assert -1.0 <= out.cliffs_delta <= 1.0
    # Mann-Whitney identity: with U = gt + ties/2,
    # 2U/(nm) - 1 == (gt - lt)/(nm) exactly
    ties = na_ * nb_ - gt - lt
    u = gt + ties / 2
    assert abs((2 * u / (na_ * nb_) - 1) - (gt - lt) / (na_ * nb_)) < 1e-12


def test_theil_u_reference(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").collect()
    cells = Counter((r.source, r.lang) for r in docs)
    nn = sum(cells.values())
    lmarg = Counter()
    smarg = Counter()
    for (s, l), n in cells.items():
        lmarg[l] += n
        smarg[s] += n
    hq = sum(
        math.floor(-(n / nn) * math.log(n / nn) * 1e8 + 0.5)
        for n in lmarg.values()
    )
    hq2 = sum(
        math.floor(-(n / nn) * math.log(n / smarg[s]) * 1e8 + 0.5)
        for (s, _l), n in cells.items()
    )
    out = QUERIES["q_theil_u"](spark, sf_dir).collect()[0]
    assert (out.n_docs, out.n_sources, out.n_langs) == (
        nn,
        len(smarg),
        len(lmarg),
    )
    assert out.h_lang == _srnd(hq / 1e8)
    assert out.h_lang_given_source == _srnd(hq2 / 1e8)
    assert out.theil_u == _srnd((hq / 1e8 - hq2 / 1e8) / (hq / 1e8))
    # conditioning can only reduce entropy (up to quantization jitter)
    assert out.theil_u >= -1e-6
