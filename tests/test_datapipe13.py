"""Planted-input tests for the wave-17 operators: PIT features must
exclude same-day peers (leak guard), churn labels must drop immature
orders (censoring guard), time-in-state must skip terminal events,
imputation must use the observed-only median, and degree must count
DISTINCT customers.
"""

from __future__ import annotations

import datetime as dt
import math

import pyarrow as pa
import pyarrow.parquet as pq

from cassowary_spark import registry
from cassowary_spark.registry import QUERIES

registry.load_all()


def _write_orders(tmp_path, rows):
    """rows = (o_orderkey, custkey, totalprice, (y,m,d))."""
    tbl = pa.table(
        {
            "o_orderkey": pa.array([r[0] for r in rows], pa.int64()),
            "o_custkey": pa.array([r[1] for r in rows], pa.int64()),
            "o_orderstatus": pa.array(["O"] * len(rows), pa.string()),
            "o_totalprice": pa.array([float(r[2]) for r in rows], pa.float64()),
            "o_orderdate": pa.array(
                [dt.datetime(*r[3]) for r in rows], pa.timestamp("us")
            ),
            "o_orderpriority": pa.array(["1-URGENT"] * len(rows), pa.string()),
        }
    )
    pq.write_table(tbl, str(tmp_path / "orders.parquet"))
    return str(tmp_path)


def _write_events(tmp_path, rows):
    """rows = (event_id, user_id, (h,mi,s), event_type)."""
    tbl = pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array(
                [dt.datetime(2024, 1, 1, *r[2]) for r in rows],
                pa.timestamp("us"),
            ),
            "user_id": pa.array([r[1] for r in rows], pa.int64()),
            "event_type": pa.array([r[3] for r in rows], pa.string()),
            "value": pa.array([0.0] * len(rows), pa.float64()),
            "props": pa.array(["{}"] * len(rows), pa.string()),
        }
    )
    pq.write_table(tbl, str(tmp_path / "events.parquet"))
    return str(tmp_path)


def _write_customer(tmp_path, rows):
    """rows = (c_custkey, segment, acctbal)."""
    tbl = pa.table(
        {
            "c_custkey": pa.array([r[0] for r in rows], pa.int64()),
            "c_name": pa.array([f"c{r[0]}" for r in rows], pa.string()),
            "c_nationkey": pa.array([0] * len(rows), pa.int32()),
            "c_acctbal": pa.array([float(r[2]) for r in rows], pa.float64()),
            "c_mktsegment": pa.array([r[1] for r in rows], pa.string()),
        }
    )
    pq.write_table(tbl, str(tmp_path / "customer.parquet"))
    return str(tmp_path)


def _write_lineitem(tmp_path, rows):
    """rows = (l_orderkey, l_partkey)."""
    tbl = pa.table(
        {
            "l_orderkey": pa.array([r[0] for r in rows], pa.int64()),
            "l_partkey": pa.array([r[1] for r in rows], pa.int64()),
            "l_linenumber": pa.array(
                list(range(1, len(rows) + 1)), pa.int32()
            ),
            "l_extendedprice": pa.array([1.0] * len(rows), pa.float64()),
        }
    )
    pq.write_table(tbl, str(tmp_path / "lineitem.parquet"))
    return str(tmp_path)


def _srnd(x: float, n: int) -> float:
    s = float(10**n)
    return math.floor(x * s + 0.5) / s


class TestPitFeatures:
    def test_same_day_excluded_and_frame_bounded(self, spark, tmp_path):
        """Orders at day 0 ($1), two at day 31 ($2, $8), one at day
        151 ($4). Day-31 orders must see ONLY day 0 (never each
        other — the leak guard); day 151 is 120 days past day 31 —
        outside the 90-day frame."""
        sf = _write_orders(
            tmp_path,
            [
                (1, 1, 1.0, (1990, 1, 1)),
                (2, 1, 2.0, (1990, 2, 1)),
                (3, 1, 8.0, (1990, 2, 1)),
                (4, 1, 4.0, (1990, 6, 1)),
            ],
        )
        out = {
            r["trailing_n"]: r
            for r in QUERIES["q_pit_features"](spark, sf).collect()
        }
        assert set(out) == {0, 1}
        assert out[0]["n_orders"] == 2  # day 0 and day 151
        assert out[0]["sum_trailing_cents"] == 0
        assert out[1]["n_orders"] == 2  # both day-31 orders
        assert out[1]["sum_trailing_cents"] == 200  # 2 × day-0's 100c
        assert out[1]["avg_trailing_cents"] == 100.0


class TestChurnLabel:
    def test_immature_orders_dropped(self, spark, tmp_path):
        """Gaps: Jan→Feb = 31d (label 1), Feb→Aug = 182d (label 0).
        The two August orders sit inside the 90-day censor window and
        must not be emitted at all."""
        sf = _write_orders(
            tmp_path,
            [
                (1, 1, 1.0, (2020, 1, 1)),
                (2, 1, 1.0, (2020, 2, 1)),
                (3, 1, 1.0, (2020, 8, 1)),
                (4, 2, 1.0, (2020, 8, 1)),
            ],
        )
        out = {
            r["month"]: r
            for r in QUERIES["q_churn_label"](spark, sf).collect()
        }
        assert set(out) == {"2020-01", "2020-02"}
        assert (out["2020-01"]["n_orders"], out["2020-01"]["n_repurchase"]) \
            == (1, 1)
        assert out["2020-01"]["repurchase_rate"] == 1.0
        assert (out["2020-02"]["n_orders"], out["2020-02"]["n_repurchase"]) \
            == (1, 0)


class TestTimeInState:
    def test_terminal_events_excluded(self, spark, tmp_path):
        """User 1: view(30s)→click(60s)→purchase(terminal). User 2's
        lone view is terminal — the view state must count ONE
        interval, not two."""
        sf = _write_events(
            tmp_path,
            [
                (1, 1, (10, 0, 0), "view"),
                (2, 1, (10, 0, 30), "click"),
                (3, 1, (10, 1, 30), "purchase"),
                (4, 2, (9, 0, 0), "view"),
            ],
        )
        out = {
            r["state"]: r
            for r in QUERIES["q_time_in_state"](spark, sf).collect()
        }
        assert set(out) == {"view", "click"}
        assert (out["view"]["n_intervals"], out["view"]["total_s"]) == (1, 30)
        assert (out["click"]["n_intervals"], out["click"]["total_s"]) == (
            1, 60,
        )
        assert out["click"]["avg_s"] == 60.0
        assert out["view"]["max_s"] == 30


class TestImputeMedian:
    def test_median_over_observed_only(self, spark, tmp_path):
        """Balances -999.99 (missing), 10, 20, 40: median of the
        OBSERVED three is 2000c; imputed mean (7000+2000)/4 = 2250c —
        a median over all four would drag it far negative."""
        sf = _write_customer(
            tmp_path,
            [(1, "BUILDING", -999.99), (2, "BUILDING", 10.0),
             (3, "BUILDING", 20.0), (4, "BUILDING", 40.0)],
        )
        out = QUERIES["q_impute_median"](spark, sf).collect()
        assert len(out) == 1
        r = out[0]
        assert (r["n_rows"], r["n_missing"]) == (4, 1)
        assert r["median_c"] == 2000
        assert r["mean_observed_cents"] == _srnd(7000 / 3, 2)
        assert r["mean_imputed_cents"] == 2250.0


class TestDegreeDistribution:
    def test_distinct_customers_counted(self, spark, tmp_path):
        """Part 1 appears in orders of customers 1,2,1 → degree 2;
        part 2 appears twice in ONE order → degree 1 (dedup)."""
        _write_orders(
            tmp_path,
            [(1, 1, 1.0, (2024, 1, 1)), (2, 2, 1.0, (2024, 1, 1)),
             (3, 1, 1.0, (2024, 1, 1))],
        )
        sf = _write_lineitem(
            tmp_path, [(1, 1), (2, 1), (3, 1), (1, 2), (1, 2)]
        )
        out = {
            r["degree"]: r
            for r in QUERIES["q_degree_distribution"](spark, sf).collect()
        }
        assert set(out) == {1, 2}
        assert out[1]["n_parts"] == 1
        assert out[2]["n_parts"] == 1
        assert out[1]["pct_parts"] == 0.5
