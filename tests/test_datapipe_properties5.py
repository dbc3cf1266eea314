"""Property-based tests (hypothesis) for the wave-34 operators:
frequent itemsets and embedding drift are re-derived by independent
pure-Python/maths references over randomized inputs — one Spark job
per generated case, small example counts (the
test_datapipe_properties2/3/4.py discipline)."""

from __future__ import annotations

import math
from collections import Counter
from itertools import combinations

import pyarrow as pa
import pyarrow.parquet as pq
from hypothesis import given, settings
from hypothesis import strategies as st

from cassowary_spark import registry
from cassowary_spark.registry import QUERIES

registry.load_all()


def _srnd(x: float, n: int) -> float:
    s = float(10**n)
    return math.floor(x * s + 0.5) / s


# --------------------------------------------------- C155 freq itemsets

_BRANDS = [f"B{i}" for i in range(6)]

BASKETS = st.lists(
    st.sets(st.sampled_from(_BRANDS), min_size=1, max_size=5),
    min_size=1,
    max_size=25,
)


def _write_baskets(tmp_path, baskets):
    pkey = {b: i + 1 for i, b in enumerate(_BRANDS)}
    part = pa.table(
        {
            "p_partkey": pa.array(list(pkey.values()), pa.int64()),
            "p_brand": pa.array(list(pkey.keys()), pa.string()),
        }
    )
    oks, pks = [], []
    for oi, items in enumerate(baskets):
        for b in sorted(items):
            oks.append(oi + 1)
            pks.append(pkey[b])
    li = pa.table(
        {
            "l_orderkey": pa.array(oks, pa.int64()),
            "l_partkey": pa.array(pks, pa.int64()),
        }
    )
    pq.write_table(part, str(tmp_path / "part.parquet"))
    pq.write_table(li, str(tmp_path / "lineitem.parquet"))
    return str(tmp_path)


@settings(max_examples=8, deadline=None)
@given(baskets=BASKETS)
def test_freq_itemsets_matches_bruteforce(spark, tmp_path_factory, baskets):
    """For arbitrary small baskets, the emitted (k, items, count,
    rank) table must equal a pure-Python brute force over all 2-/3-
    subsets with the same minsup floor, top-k cap and tiebreak."""
    d = tmp_path_factory.mktemp("fi")
    sf = _write_baskets(d, baskets)
    rows = QUERIES["q_freq_itemsets"](spark, sf).collect()

    nb = len(baskets)
    counts: Counter[str] = Counter()
    for items in baskets:
        for k in (2, 3):
            for combo in combinations(sorted(items), k):
                counts[",".join(combo)] += 1
    expect = {}
    for k in (2, 3):
        surv = [
            (s, c)
            for s, c in counts.items()
            if s.count(",") == k - 1 and c * 1000 >= 1 * nb
        ]
        surv.sort(key=lambda sc: (-sc[1], sc[0]))
        for rnk, (s, c) in enumerate(surv[:25], start=1):
            expect[(k, s)] = (c, rnk, _srnd(c / nb, 6))

    got = {(r.k, r.items): (r.n_baskets, r.rnk, r.support) for r in rows}
    assert got == expect


# --------------------------------------------------- C157 embedding drift

VECS = st.lists(
    st.tuples(
        st.lists(
            st.floats(
                min_value=-2.0,
                max_value=2.0,
                allow_nan=False,
                allow_infinity=False,
                width=32,
            ),
            min_size=4,
            max_size=4,
        ),
        st.sampled_from(["s1", "s2", "s3"]),
    ),
    min_size=1,
    max_size=20,
)


def _write_corpus(tmp_path, vecs):
    emb = pa.table(
        {
            "vec_id": pa.array(range(len(vecs)), pa.int64()),
            "embedding": pa.array(
                [v for v, _ in vecs], pa.list_(pa.float32())
            ),
        }
    )
    doc = pa.table(
        {
            "doc_id": pa.array(range(len(vecs)), pa.int64()),
            "source": pa.array([s for _, s in vecs], pa.string()),
        }
    )
    pq.write_table(emb, str(tmp_path / "embeddings.parquet"))
    pq.write_table(doc, str(tmp_path / "documents.parquet"))
    return str(tmp_path)


@settings(max_examples=8, deadline=None)
@given(vecs=VECS)
def test_embedding_drift_matches_reference(spark, tmp_path_factory, vecs):
    """Per-source drift must equal a pure-Python replication of the
    exact pipeline: float32 read, micro-unit quantization, integer
    sums, centroid division, dim-ordered folds, srnd6."""
    import numpy as np

    d = tmp_path_factory.mktemp("ed")
    sf = _write_corpus(d, vecs)
    rows = {r.source: r for r in QUERIES["q_embedding_drift"](spark, sf).collect()}

    by_src: dict[str, list[list[float]]] = {}
    for v, s in vecs:
        by_src.setdefault(s, []).append(
            [float(np.float32(x)) for x in v]  # replicate float32 storage
        )
    dims = 4

    def quant_sums(vlists):
        return [
            sum(math.floor(v[i] * 1e6 + 0.5) for v in vlists)
            for i in range(dims)
        ]

    all_vecs = [v for vs in by_src.values() for v in vs]
    gq, gn = quant_sums(all_vecs), len(all_vecs)
    cg = [q / (gn * 1e6) for q in gq]
    for s, vlists in by_src.items():
        sq, n = quant_sums(vlists), len(vlists)
        cs = [q / (n * 1e6) for q in sq]
        dot = ss = gg = 0.0
        for i in range(dims):  # dim-ascending fold, same as both engines
            dot += cs[i] * cg[i]
            ss += cs[i] * cs[i]
            gg += cg[i] * cg[i]
        denom = math.sqrt(ss) * math.sqrt(gg)
        r = rows[s]
        assert r.n_vecs == n
        if denom == 0.0:
            assert r.cos_sim is None and r.drift is None
        else:
            assert r.cos_sim == _srnd(dot / denom, 6), s
            assert r.drift == _srnd(1.0 - dot / denom, 6), s
