"""Property-based tests (hypothesis) for the wave-19/24/25
analytics: autocorrelation, TWAP, shingle containment and the window
funnel are re-derived by independent pure-Python references over
randomized inputs — one Spark job per generated case, small example
counts (the discipline of test_datapipe_properties2.py, which caught
a real divide-by-zero in the ROC query).
"""

from __future__ import annotations

import datetime as dt
import math

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


def _write_orders(path, day_revs):
    rows = [(i + 1, 1, "O", float(r), d) for i, (d, r) in enumerate(day_revs)]
    tbl = pa.table(
        {
            "o_orderkey": pa.array([r[0] for r in rows], pa.int64()),
            "o_custkey": pa.array([r[1] for r in rows], pa.int64()),
            "o_orderstatus": pa.array([r[2] for r in rows], pa.string()),
            "o_totalprice": pa.array([r[3] for r in rows], pa.float64()),
            "o_orderdate": pa.array([r[4] for r in rows], pa.timestamp("us")),
            "o_orderpriority": pa.array(
                ["1-URGENT"] * len(rows), pa.string()
            ),
        }
    )
    pq.write_table(tbl, str(path / "orders.parquet"))
    return str(path)


def _write_events(path, rows):
    tbl = pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array([r[1] for r in rows], pa.timestamp("ns")),
            "user_id": pa.array([r[2] for r in rows], pa.int64()),
            "event_type": pa.array([r[3] for r in rows], pa.string()),
            "value": pa.array([float(r[4]) for r in rows], pa.float64()),
            "props": pa.array(["{}"] * len(rows), pa.string()),
        }
    )
    pq.write_table(tbl, str(path / "events.parquet"))
    return str(path)


def _write_documents(path, texts):
    tbl = pa.table(
        {
            "doc_id": pa.array(range(1, len(texts) + 1), pa.int64()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(["en"] * len(texts), pa.string()),
            "source": pa.array(["src0"] * len(texts), pa.string()),
            "n_chars": pa.array([len(t) for t in texts], pa.int64()),
        }
    )
    pq.write_table(tbl, str(path / "documents.parquet"))
    return str(path)


def _pearson_or_none(xs, ys):
    n = len(xs)
    if n == 0:
        return None
    sx, sy = sum(xs), sum(ys)
    sxy = sum(a * b for a, b in zip(xs, ys))
    sxx = sum(a * a for a in xs)
    syy = sum(b * b for b in ys)
    # exact-int assembly then ONE float conversion per term — the
    # r11 engine semantics (DECIMAL/HUGEINT sufficient statistics)
    num = float(n * sxy - sx * sy)
    den = math.sqrt(
        float(n * sxx - sx * sx) * float(n * syy - sy * sy)
    )
    if den == 0.0:
        return None
    return _srnd(num / den, 6)


@settings(max_examples=6, deadline=None)
@given(
    revs=st.lists(
        st.integers(min_value=1, max_value=10**6), min_size=2, max_size=45
    )
)
def test_acf_matches_python_pearson(spark, tmp_path_factory, revs):
    """Arbitrary (even constant or too-short) daily series: every lag
    must match the Python Pearson over the same row-indexed pairs —
    NULL on zero variance or no pairs."""
    d = tmp_path_factory.mktemp("acf")
    start = dt.datetime(2024, 3, 1)
    sf = _write_orders(
        d, [(start + dt.timedelta(days=i), r) for i, r in enumerate(revs)]
    )
    out = {
        r["lag_days"]: r
        for r in QUERIES["q_autocorrelation"](spark, sf).collect()
    }
    for k in (1, 7, 30):
        xs = revs[:-k] if len(revs) > k else []
        ys = revs[k:]
        assert out[k]["n_pairs"] == len(xs)
        assert out[k]["acf_r"] == _pearson_or_none(xs, ys), (k, revs)


@settings(max_examples=6, deadline=None)
@given(
    evs=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=3600),  # second offset
            st.integers(min_value=-10**4, max_value=10**6),  # cents
        ),
        min_size=1,
        max_size=25,
        unique_by=lambda t: t[0],
    )
)
def test_twap_matches_python_fold(spark, tmp_path_factory, evs):
    """Arbitrary per-user step functions: TWAP must equal the Python
    duration-weighted fold; single-event users are NULL."""
    d = tmp_path_factory.mktemp("twap")
    t0 = dt.datetime(2024, 1, 3, 8, 0, 0)
    evs = sorted(evs)
    rows = [
        (i + 1, t0 + dt.timedelta(seconds=s), 1, "view", c / 100.0)
        for i, (s, c) in enumerate(evs)
    ]
    sf = _write_events(d, rows)
    out = QUERIES["q_time_weighted_avg"](spark, sf).collect()[0]
    assert out["n_events"] == len(evs)
    if len(evs) == 1:
        assert out["twap"] is None
        return
    swx = st_ = 0
    for (s1, c1), (s2, _) in zip(evs, evs[1:]):
        dt_us = (s2 - s1) * 1_000_000
        swx += c1 * dt_us
        st_ += dt_us
    assert out["twap"] == _srnd(swx / st_ / 100.0, 6), evs


def _shingle_set(text, k=3):
    toks = text.split(" ")
    n = max(len(toks) - k + 1, 1)
    return {" ".join(toks[i: i + k]) for i in range(n)}


@settings(max_examples=6, deadline=None)
@given(
    docs=st.lists(
        st.lists(
            st.sampled_from(["aa", "bb", "cc", "dd", "ee"]),
            min_size=1,
            max_size=9,
        ).map(" ".join),
        min_size=1,
        max_size=4,
    )
)
def test_containment_matches_python_pairs(spark, tmp_path_factory, docs):
    """Random tiny-vocab corpora (twins auto-added by the query): the
    pair set must equal the Python shingle replication exactly."""
    d = tmp_path_factory.mktemp("cont")
    sf = _write_documents(d, docs)
    out = {
        (r["contained_id"], r["container_id"]): r["containment"]
        for r in QUERIES["q_shingle_containment"](spark, sf).collect()
    }
    corpus = {i + 1: t for i, t in enumerate(docs)}
    corpus.update(
        {i + 1000001: t + " qq17 zz93 vv41" for i, t in enumerate(docs)}
    )
    # k=5 matches the query's r12 re-authoring (selective 5-grams +
    # df<=1000 cap — the cap never binds at <=8 docs)
    sets = {i: _shingle_set(t, k=5) for i, t in corpus.items()}
    exp = {}
    ids = sorted(sets)
    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            a, b = ids[i], ids[j]
            inter = len(sets[a] & sets[b])
            if not inter:
                continue
            small, big = (
                (a, b) if (len(sets[a]), a) < (len(sets[b]), b) else (b, a)
            )
            c = inter / min(len(sets[a]), len(sets[b]))
            if c >= 0.9:
                exp[(small, big)] = _srnd(c, 6)
    assert out == exp, docs


_WF_STAGES = ["signup", "click", "purchase", "view"]


def _py_depth(events, window_us):
    """events: [(t_us, type)] for one user."""
    sig = sorted(t for t, e in events if e == "signup")
    clk = sorted(t for t, e in events if e == "click")
    pur = sorted(t for t, e in events if e == "purchase")
    depth = 1 if sig else 0
    for s in sig:
        for c in clk:
            if s < c <= s + window_us:
                depth = max(depth, 2)
                for p in pur:
                    if c < p <= s + window_us:
                        return 3
    return depth


@settings(max_examples=6, deadline=None)
@given(
    evs=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=30 * 3600),  # sec offset
            st.sampled_from(_WF_STAGES),
        ),
        min_size=1,
        max_size=14,
        unique_by=lambda t: t[0],
    )
)
def test_window_funnel_matches_python_matcher(
    spark, tmp_path_factory, evs
):
    """Random single-user event sequences spanning past the 24h
    window: the depth histogram must equal the brute-force Python
    matcher (any signup may open the window)."""
    d = tmp_path_factory.mktemp("wf")
    t0 = dt.datetime(2024, 1, 8)
    rows = [
        (i + 1, t0 + dt.timedelta(seconds=s), 1, e, 0.0)
        for i, (s, e) in enumerate(evs)
    ]
    sf = _write_events(d, rows)
    out = {
        r["depth"]: r["n_users"]
        for r in QUERIES["q_window_funnel"](spark, sf).collect()
    }
    exp_depth = _py_depth(
        [(s * 1_000_000, e) for s, e in evs], 24 * 3600 * 1_000_000
    )
    assert out == {exp_depth: 1}, evs
