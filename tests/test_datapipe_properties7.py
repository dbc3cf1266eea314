"""Property-based tests (hypothesis) for round-9 analytics: Spearman,
raking, the Hill estimator, jackknife variance and quantile
normalization are re-derived by independent pure-Python references
over randomized inputs — one Spark job per generated case, small
example counts (the test_datapipe_properties2-4.py discipline).
"""

from __future__ import annotations

import math

import pyarrow as pa
import pyarrow.parquet as pq
from hypothesis import assume, given, settings
from hypothesis import strategies as st

from cassowary_spark import registry
from cassowary_spark.registry import QUERIES

registry.load_all()


def _srnd(x: float, n: int) -> float:
    s = float(10**n)
    return math.floor(x * s + 0.5) / s


def _write_docs(path, rows):
    """rows = [(doc_id, text, lang, source, n_chars)]"""
    tbl = pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows], pa.int64()),
            "text": pa.array([r[1] for r in rows], pa.string()),
            "lang": pa.array([r[2] for r in rows], pa.string()),
            "source": pa.array([r[3] for r in rows], pa.string()),
            "n_chars": pa.array([r[4] for r in rows], pa.int64()),
        }
    )
    pq.write_table(tbl, str(path / "documents.parquet"))
    return str(path)


def _write_events(path, vals):
    """vals = [(event_id, event_type, cents)]"""
    import datetime

    tbl = pa.table(
        {
            "event_id": pa.array([v[0] for v in vals], pa.int64()),
            "ts": pa.array(
                [datetime.datetime(2024, 1, 1)] * len(vals),
                pa.timestamp("us"),
            ),
            "user_id": pa.array([v[0] for v in vals], pa.int64()),
            "event_type": pa.array([v[1] for v in vals], pa.string()),
            "value": pa.array([v[2] / 100.0 for v in vals], pa.float64()),
            "props": pa.array(["{}"] * len(vals), pa.string()),
        }
    )
    pq.write_table(tbl, str(path / "events.parquet"))
    return str(path)


# -------------------------------------------------- C168 Spearman


def _avg_ranks(xs):
    """Average ranks (1-based) with ties averaged."""
    order = sorted(range(len(xs)), key=lambda i: xs[i])
    ranks = [0.0] * len(xs)
    i = 0
    while i < len(order):
        j = i
        while j + 1 < len(order) and xs[order[j + 1]] == xs[order[i]]:
            j += 1
        avg = (i + j) / 2 + 1
        for k in range(i, j + 1):
            ranks[order[k]] = avg
        i = j + 1
    return ranks


@settings(max_examples=6, deadline=None)
@given(
    toks=st.lists(st.integers(min_value=1, max_value=9), min_size=3, max_size=12),
)
def test_spearman_matches_python(spark, tmp_path_factory, toks):
    """Docs whose text is `w `*k + padding: n_chars and token count
    vary independently enough; rho must equal the average-rank Pearson
    reference."""
    d = tmp_path_factory.mktemp("sp")
    rows = []
    xs, ys = [], []
    for i, k in enumerate(toks):
        text = "w " * (k - 1) + "x" * ((i * 7) % 11 + 1)
        rows.append((i, text, "en", "s", len(text)))
        xs.append(len(text))
        ys.append(k)
    sf = _write_docs(d, rows)
    (r,) = QUERIES["q_spearman_corr"](spark, sf).collect()
    rx, ry = _avg_ranks(xs), _avg_ranks(ys)
    n = len(xs)
    sx, sy = sum(rx), sum(ry)
    sxy = sum(a * b for a, b in zip(rx, ry))
    sxx = sum(a * a for a in rx)
    syy = sum(b * b for b in ry)
    den = math.sqrt(n * sxx - sx * sx) * math.sqrt(n * syy - sy * sy)
    if den == 0:
        assert r.spearman_rho is None
    else:
        rho = (n * sxy - sx * sy) / den
        assert r.spearman_rho == _srnd(rho, 6) or abs(
            r.spearman_rho - rho
        ) < 2e-6, (xs, ys)


# ---------------------------------------------------- C174 raking


@settings(max_examples=6, deadline=None)
@given(
    grid=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=1),
            st.integers(min_value=0, max_value=1),
            st.integers(min_value=1, max_value=40),
        ),
        min_size=4,
        max_size=4,
        unique_by=lambda t: (t[0], t[1]),
    )
)
def test_raking_source_margin_exact(spark, tmp_path_factory, grid):
    """Any full 2x2 grid: the LAST-fitted (source) margins must be
    uniform to quantization, and weights positive."""
    assume(len({(a, b) for a, b, _ in grid}) == 4)
    d = tmp_path_factory.mktemp("rk")
    rows = []
    did = 0
    for la, so, c in grid:
        for _ in range(c):
            rows.append((did, f"t{did}", f"l{la}", f"s{so}", 2))
            did += 1
    sf = _write_docs(d, rows)
    out = QUERIES["q_raking"](spark, sf).collect()
    total = sum(r.weighted_docs for r in out)
    src = {}
    for r in out:
        assert r.weight > 0
        src[r.source] = src.get(r.source, 0.0) + r.weighted_docs
    for v in src.values():
        assert abs(v - total / 2) < 1e-5 * max(total, 1.0), grid


# ------------------------------------------------ C178 Hill index


@settings(max_examples=6, deadline=None)
@given(
    cents=st.lists(
        st.integers(min_value=1, max_value=10**7),
        min_size=102,
        max_size=160,
        unique=True,
    )
)
def test_hill_matches_python(spark, tmp_path_factory, cents):
    d = tmp_path_factory.mktemp("hl")
    vals = [(i, "view", c) for i, c in enumerate(cents)]
    sf = _write_events(d, vals)
    (r,) = QUERIES["q_hill_tail_index"](spark, sf).collect()
    top = sorted(cents, reverse=True)[:101]
    ck = top[100]
    h = _srnd(
        sum(_srnd(math.log(x / ck), 8) for x in top[:100]) / 100.0, 8
    )
    assert r.hill_mean_log_excess == _srnd(h, 6), cents[:5]


# ------------------------------------------- C180 jackknife variance


@settings(max_examples=6, deadline=None)
@given(
    cells=st.lists(
        st.lists(
            st.integers(min_value=0, max_value=10**6),
            min_size=1,
            max_size=6,
        ),
        min_size=2,
        max_size=5,
    )
)
def test_jackknife_matches_python(spark, tmp_path_factory, cells):
    # at least one OTHER stratum must keep N - n_i > 0 for every i
    assume(sum(len(c) for c in cells) > max(len(c) for c in cells))
    d = tmp_path_factory.mktemp("jk")
    vals = []
    eid = 0
    for gi, grp in enumerate(cells):
        for c in grp:
            vals.append((eid, f"t{gi}", c))
            eid += 1
    sf = _write_events(d, vals)
    (r,) = QUERIES["q_jackknife_variance"](spark, sf).collect()
    N = sum(len(c) for c in cells)
    S = sum(sum(c) for c in cells)
    g = len(cells)
    loo = [
        _srnd((S - sum(c)) / (100.0 * (N - len(c))), 8) for c in cells
    ]
    bar = _srnd(sum(loo) / g, 8)
    d2 = [_srnd((t - bar) ** 2, 10) for t in loo]
    se = math.sqrt((g - 1) / g * sum(d2))
    assert r.g == g
    assert abs(r.jack_se - se) < 2e-6, cells


# --------------------------------------- C179 quantile normalization


@settings(max_examples=6, deadline=None)
@given(
    xs=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=2),
            st.integers(min_value=1, max_value=1000),
        ),
        min_size=3,
        max_size=20,
    )
)
def test_quantile_normalize_invariants(spark, tmp_path_factory, xs):
    """Random (source, length) rows: outputs come from the global
    value multiset, within-group monotone, row count preserved."""
    assume(len({s for s, _ in xs}) >= 2)
    d = tmp_path_factory.mktemp("qn")
    rows = [
        (i, "x" * ln, "en", f"s{s}", ln) for i, (s, ln) in enumerate(xs)
    ]
    sf = _write_docs(d, rows)
    out = QUERIES["q_quantile_normalize"](spark, sf).collect()
    assert len(out) == len(xs)
    glob = {ln for _, ln in xs}
    by_src = {}
    for r in out:
        assert r.x_norm in glob
        by_src.setdefault(r.source, []).append((r.x, r.doc_id, r.x_norm))
    for rows_ in by_src.values():
        rows_.sort()
        for a, b in zip(rows_, rows_[1:]):
            assert a[2] <= b[2], xs
