"""Property-based tests (hypothesis) for the wave-26/27/30
analytics: Theil-Sen, Mann-Kendall, PSI and the price index are
re-derived by independent pure-Python references over randomized
inputs — one Spark job per generated case, small example counts (the
test_datapipe_properties2/3.py discipline).
"""

from __future__ import annotations

import datetime as dt
import math
from collections import Counter

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


def _write_orders(path, day_revs, start=dt.datetime(2024, 3, 1)):
    rows = [
        (i + 1, 1, "O", float(r), start + dt.timedelta(days=i))
        for i, r in enumerate(day_revs)
    ]
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


_D0 = (dt.datetime(2024, 3, 1) - dt.datetime(1992, 1, 1)).days


@settings(max_examples=6, deadline=None)
@given(
    revs=st.lists(
        st.integers(min_value=1, max_value=10**5), min_size=2, max_size=16
    )
)
def test_theil_sen_matches_python(spark, tmp_path_factory, revs):
    """Arbitrary short daily series: slope and intercept must match
    the Python lower-median pairwise replication."""
    d = tmp_path_factory.mktemp("ts")
    sf = _write_orders(d, revs)
    out = QUERIES["q_theil_sen"](spark, sf).collect()[0]
    pts = [(_D0 + i, r) for i, r in enumerate(revs)]
    slopes = sorted(
        (y2 - y1) / (x2 - x1)
        for i, (x1, y1) in enumerate(pts)
        for (x2, y2) in pts[i + 1:]
    )
    m = slopes[(len(slopes) + 1) // 2 - 1]
    resid = sorted(y - m * x for x, y in pts)
    b = resid[(len(resid) + 1) // 2 - 1]
    assert out["n_pairs"] == len(slopes)
    assert out["ts_slope"] == _srnd(m, 6)
    assert out["ts_intercept"] == _srnd(b, 6), revs


@settings(max_examples=6, deadline=None)
@given(
    revs=st.lists(
        st.integers(min_value=1, max_value=50), min_size=2, max_size=25
    )
)
def test_mann_kendall_matches_python(spark, tmp_path_factory, revs):
    """Arbitrary (tie-heavy) series: S, the tie-corrected variance
    and z must match the Python replication; all-tied series must
    not divide by zero."""
    d = tmp_path_factory.mktemp("mk")
    sf = _write_orders(d, revs)
    out = QUERIES["q_mann_kendall"](spark, sf).collect()[0]
    n = len(revs)
    s = sum(
        (1 if b > a else -1 if b < a else 0)
        for i, a in enumerate(revs)
        for b in revs[i + 1:]
    )
    tie18 = sum(
        t * (t - 1) * (2 * t + 5) for t in Counter(revs).values() if t > 1
    )
    var = (n * (n - 1) * (2 * n + 5) - tie18) / 18.0
    if s > 0:
        z = (s - 1.0) / math.sqrt(var)
    elif s < 0:
        z = (s + 1.0) / math.sqrt(var)
    else:
        z = 0.0
    assert out["mk_s"] == s
    assert out["var_s"] == _srnd(var, 6)
    assert out["z"] == _srnd(z, 6), revs


def _write_orders_yr(path, rows):
    """rows = [(orderkey, totalprice, year)]."""
    tbl = pa.table(
        {
            "o_orderkey": pa.array([r[0] for r in rows], pa.int64()),
            "o_custkey": pa.array([1] * len(rows), pa.int64()),
            "o_orderstatus": pa.array(["O"] * len(rows), pa.string()),
            "o_totalprice": pa.array(
                [float(r[1]) for r in rows], pa.float64()
            ),
            "o_orderdate": pa.array(
                [dt.datetime(r[2], 6, 15) for r in rows],
                pa.timestamp("us"),
            ),
            "o_orderpriority": pa.array(
                ["1-URGENT"] * len(rows), pa.string()
            ),
        }
    )
    pq.write_table(tbl, str(path / "orders.parquet"))
    return str(path)


@settings(max_examples=6, deadline=None)
@given(
    ca=st.lists(st.integers(min_value=0, max_value=9), min_size=2,
                max_size=30),
    cb=st.lists(st.integers(min_value=0, max_value=9), min_size=2,
                max_size=30),
)
def test_psi_matches_python(spark, tmp_path_factory, ca, cb):
    """Random bin draws for both periods: per-bin terms and the PSI
    total must match the smoothed Python replication."""
    d = tmp_path_factory.mktemp("psi")
    rows, key = [], 0
    for yr, bins in ((1996, ca), (1997, cb)):
        for b in bins:
            key += 1
            price = 999_000 if b == 9 else b * 50_000 + 10_000
            rows.append((key, price, yr))
    sf = _write_orders_yr(d, rows)
    out = {r["bin"]: r for r in QUERIES["q_psi"](spark, sf).collect()}
    na, nb = len(ca), len(cb)
    cca, ccb = Counter(ca), Counter(cb)
    bins = sorted(set(ca) | set(cb))
    terms = {}
    for b in bins:
        a_ = cca.get(b, 0) + 0.5
        d_ = ccb.get(b, 0) + 0.5
        pa_ = a_ / (na + 5.0)
        pb_ = d_ / (nb + 5.0)
        terms[b] = _srnd(
            (pa_ - pb_) * math.log((a_ * (nb + 5.0)) / (d_ * (na + 5.0))),
            8,
        )
    total = _srnd(sum(terms.values()), 6)
    assert set(out) == set(terms)
    for b in bins:
        assert out[b]["term"] == terms[b], (b, ca, cb)
        assert out[b]["psi_total"] == total


def _write_lineitem_yr(path, rows):
    """rows = [(orderkey, partkey, qty, extprice, year)]."""
    tbl = pa.table(
        {
            "l_orderkey": pa.array([r[0] for r in rows], pa.int64()),
            "l_partkey": pa.array([r[1] for r in rows], pa.int64()),
            "l_linenumber": pa.array(
                list(range(1, len(rows) + 1)), pa.int32()
            ),
            "l_quantity": pa.array(
                [float(r[2]) for r in rows], pa.float64()
            ),
            "l_extendedprice": pa.array(
                [float(r[3]) for r in rows], pa.float64()
            ),
            "l_returnflag": pa.array(["N"] * len(rows), pa.string()),
            "l_shipdate": pa.array(
                [dt.datetime(r[4], 6, 1) for r in rows],
                pa.timestamp("us"),
            ),
        }
    )
    pq.write_table(tbl, str(path / "lineitem.parquet"))
    return str(path)


@settings(max_examples=6, deadline=None)
@given(
    basket=st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=500),   # p0 dollars
            st.integers(min_value=1, max_value=500),   # p1 dollars
            st.integers(min_value=1, max_value=50),    # q0
            st.integers(min_value=1, max_value=50),    # q1
        ),
        min_size=1,
        max_size=8,
    )
)
def test_price_index_matches_python(spark, tmp_path_factory, basket):
    """Random matched baskets (integer prices/quantities, so the
    quantization is exact): L, P and Fisher must match the Python
    replication."""
    d = tmp_path_factory.mktemp("pidx")
    rows, key = [], 0
    for pk, (p0, p1, q0, q1) in enumerate(basket, start=1):
        key += 1
        rows.append((key, pk, q0, p0 * q0, 1996))
        key += 1
        rows.append((key, pk, q1, p1 * q1, 1997))
    sf = _write_lineitem_yr(d, rows)
    out = QUERIES["q_price_index"](spark, sf).collect()[0]
    l_num = sum(p1 * 10**4 * q0 for p0, p1, q0, q1 in basket)
    l_den = sum(p0 * 10**4 * q0 for p0, p1, q0, q1 in basket)
    p_num = sum(p1 * 10**4 * q1 for p0, p1, q0, q1 in basket)
    p_den = sum(p0 * 10**4 * q1 for p0, p1, q0, q1 in basket)
    L, P = l_num / l_den, p_num / p_den
    assert out["n_parts"] == len(basket)
    assert out["laspeyres"] == _srnd(L, 6)
    assert out["paasche"] == _srnd(P, 6)
    assert out["fisher"] == _srnd(math.sqrt(L * P), 6), basket
