"""Property-based tests (hypothesis) for the wave-15/16/18 statistics:
AUC, weighted median, CUSUM peaks and streaks are re-derived by
independent pure-Python references over randomized inputs — the same
discipline as test_datapipe_properties.py, with one Spark job per
generated case and small example counts to keep the sweep fast.
"""

from __future__ import annotations

import datetime as dt
import hashlib
import math

import pyarrow as pa
import pyarrow.parquet as pq
from hypothesis import assume, given, settings
from hypothesis import strategies as st

from cassowary_spark import registry
from cassowary_spark.registry import QUERIES

registry.load_all()


def _write_orders(path, rows):
    """rows = (o_orderkey, custkey, status, totalprice, datetime)."""
    tbl = pa.table(
        {
            "o_orderkey": pa.array([r[0] for r in rows], pa.int64()),
            "o_custkey": pa.array([r[1] for r in rows], pa.int64()),
            "o_orderstatus": pa.array([r[2] for r in rows], pa.string()),
            "o_totalprice": pa.array([float(r[3]) for r in rows], pa.float64()),
            "o_orderdate": pa.array([r[4] for r in rows], pa.timestamp("us")),
            "o_orderpriority": pa.array(["1-URGENT"] * len(rows), pa.string()),
        }
    )
    pq.write_table(tbl, str(path / "orders.parquet"))
    return str(path)


@settings(max_examples=6, deadline=None)
@given(
    labels=st.lists(st.booleans(), min_size=4, max_size=40),
)
def test_auc_matches_pair_counting(spark, tmp_path_factory, labels):
    """For arbitrary label assignments, the rank-sum u2 must equal
    brute-force pair counting over the replicated hash scores."""
    assume(any(labels) and not all(labels))
    d = tmp_path_factory.mktemp("auc")
    rows = [
        (k + 1, 1, "F" if y else "O", 50.0, dt.datetime(2024, 1, 1))
        for k, y in enumerate(labels)
    ]
    sf = _write_orders(d, rows)

    def score(okey, y):
        h = int(hashlib.md5(str(okey).encode()).hexdigest()[:8], 16)
        return h % 1000 + 300 * (1 if y else 0)

    pos = [score(k + 1, y) for k, y in enumerate(labels) if y]
    neg = [score(k + 1, y) for k, y in enumerate(labels) if not y]
    u2 = sum(2 if p > n else (1 if p == n else 0) for p in pos for n in neg)
    out = QUERIES["q_roc_auc"](spark, sf).collect()[0]
    assert (out["n_pos"], out["n_neg"], out["u2"]) == (len(pos), len(neg), u2)
    assert 0.0 <= out["auc"] <= 1.0


def _write_lineitem(path, rows):
    """rows = (qty, price_dollars)."""
    tbl = pa.table(
        {
            "l_orderkey": pa.array(range(1, len(rows) + 1), pa.int64()),
            "l_partkey": pa.array([1] * len(rows), pa.int64()),
            "l_linenumber": pa.array([1] * len(rows), pa.int32()),
            "l_shipdate": pa.array(
                [dt.datetime(1996, 1, 1)] * len(rows), pa.timestamp("us")
            ),
            "l_quantity": pa.array([float(q) for q, _ in rows], pa.float64()),
            "l_extendedprice": pa.array(
                [float(p) for _, p in rows], pa.float64()
            ),
            "l_returnflag": pa.array(["N"] * len(rows), pa.string()),
        }
    )
    pq.write_table(tbl, str(path / "lineitem.parquet"))
    return str(path)


@settings(max_examples=6, deadline=None)
@given(
    rows=st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=50),
            st.integers(min_value=1, max_value=9).map(float),
        ),
        min_size=1,
        max_size=30,
    )
)
def test_weighted_median_matches_reference(spark, tmp_path_factory, rows):
    """Type-1 weighted median/p90 vs a pure-Python cumulative-weight
    scan; prices drawn from a tiny set so duplicate collapsing is
    exercised constantly."""
    d = tmp_path_factory.mktemp("wm")
    sf = _write_lineitem(d, rows)

    def ref(q_num, q_den):
        by_price: dict[int, int] = {}
        for qty, price in rows:
            by_price[price * 100] = by_price.get(price * 100, 0) + qty * 100
        tot = sum(by_price.values())
        cum = 0
        for price_c in sorted(by_price):
            cum += by_price[price_c]
            if q_den * cum >= q_num * tot:
                return int(price_c)
        raise AssertionError("unreachable")

    out = QUERIES["q_weighted_median"](spark, sf).collect()[0]
    assert out["wmedian_cents"] == ref(1, 2)
    assert out["wp90_cents"] == ref(9, 10)


@settings(max_examples=6, deadline=None)
@given(
    revs=st.lists(
        st.integers(min_value=1, max_value=100000), min_size=2, max_size=28
    )
)
def test_cusum_peak_matches_reference(spark, tmp_path_factory, revs):
    """The top |CUSUM| day must match a pure-Python scaled cumulative
    scan with the same (|cusum| desc, day asc) ordering."""
    d = tmp_path_factory.mktemp("cu")
    rows = [
        (i + 1, 1, "O", c / 100.0, dt.datetime(2024, 1, i + 1))
        for i, c in enumerate(revs)
    ]
    sf = _write_orders(d, rows)
    n, t = len(revs), sum(revs)
    cus, s = [], 0
    for i, c in enumerate(revs):
        s += c * n - t
        cus.append((f"2024-01-{i + 1:02d}", s))
    best = sorted(cus, key=lambda x: (-abs(x[1]), x[0]))[0]
    out = QUERIES["q_cusum_changepoint"](spark, sf).collect()[0]
    assert (out["day"], out["cusum_scaled"]) == best


def _write_events(path, rows):
    """rows = (event_id, user_id, day_of_jan)."""
    tbl = pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array(
                [dt.datetime(2024, 1, r[2], 9) for r in rows],
                pa.timestamp("us"),
            ),
            "user_id": pa.array([r[1] for r in rows], pa.int64()),
            "event_type": pa.array(["view"] * len(rows), pa.string()),
            "value": pa.array([0.0] * len(rows), pa.float64()),
            "props": pa.array(["{}"] * len(rows), pa.string()),
        }
    )
    pq.write_table(tbl, str(path / "events.parquet"))
    return str(path)


@settings(max_examples=6, deadline=None)
@given(
    daysets=st.lists(
        st.sets(
            st.integers(min_value=1, max_value=28), min_size=1, max_size=15
        ),
        min_size=1,
        max_size=5,
    )
)
def test_streaks_match_reference(spark, tmp_path_factory, daysets):
    """Per-user best streak vs a pure-Python consecutive-run scan,
    over arbitrary (including duplicate-event) day sets."""
    d = tmp_path_factory.mktemp("st")
    rows, eid = [], 0
    for u, days in enumerate(daysets, start=1):
        for day in days:
            for _ in range(2):  # duplicate events per day: must dedupe
                eid += 1
                rows.append((eid, u, day))
    sf = _write_events(d, rows)

    def best_streak(days: set) -> int:
        best = cur = 0
        prev = None
        for day in sorted(days):
            cur = cur + 1 if prev is not None and day == prev + 1 else 1
            best = max(best, cur)
            prev = day
        return best

    expected: dict[int, int] = {}
    for days in daysets:
        b = best_streak(days)
        expected[b] = expected.get(b, 0) + 1
    out = {
        r["best_streak"]: r["n_users"]
        for r in QUERIES["q_streaks"](spark, sf).collect()
    }
    assert out == expected
