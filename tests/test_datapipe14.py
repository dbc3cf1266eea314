"""Planted-input tests for the wave-18 operators: streaks must break
on gaps and dedupe same-day events, rank movers must rank inside the
both-periods cohort, the weighted median must follow volume (not row
count), and linkage scores must land exact pairs on exact thresholds.
"""

from __future__ import annotations

import datetime as dt

import pyarrow as pa
import pyarrow.parquet as pq

from cassowary_spark import registry
from cassowary_spark.registry import QUERIES

registry.load_all()


def _write_events(tmp_path, rows):
    """rows = (event_id, user_id, (m,d,h))."""
    tbl = pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array(
                [dt.datetime(2024, r[2][0], r[2][1], r[2][2]) for r in rows],
                pa.timestamp("us"),
            ),
            "user_id": pa.array([r[1] for r in rows], pa.int64()),
            "event_type": pa.array(["view"] * len(rows), pa.string()),
            "value": pa.array([0.0] * len(rows), pa.float64()),
            "props": pa.array(["{}"] * len(rows), pa.string()),
        }
    )
    pq.write_table(tbl, str(tmp_path / "events.parquet"))
    return str(tmp_path)


def _write_lineitem(tmp_path, rows):
    """rows = (l_partkey, (y,m,d), quantity, extendedprice)."""
    tbl = pa.table(
        {
            "l_orderkey": pa.array(range(1, len(rows) + 1), pa.int64()),
            "l_partkey": pa.array([r[0] for r in rows], pa.int64()),
            "l_linenumber": pa.array([1] * len(rows), pa.int32()),
            "l_shipdate": pa.array(
                [dt.datetime(*r[1]) for r in rows], pa.timestamp("us")
            ),
            "l_quantity": pa.array([float(r[2]) for r in rows], pa.float64()),
            "l_extendedprice": pa.array(
                [float(r[3]) for r in rows], pa.float64()
            ),
            "l_returnflag": pa.array(["N"] * len(rows), pa.string()),
        }
    )
    pq.write_table(tbl, str(tmp_path / "lineitem.parquet"))
    return str(tmp_path)


def _write_customer(tmp_path, rows):
    """rows = (c_custkey, nationkey, segment, acctbal)."""
    tbl = pa.table(
        {
            "c_custkey": pa.array([r[0] for r in rows], pa.int64()),
            "c_name": pa.array([f"c{r[0]}" for r in rows], pa.string()),
            "c_nationkey": pa.array([r[1] for r in rows], pa.int32()),
            "c_acctbal": pa.array([float(r[3]) for r in rows], pa.float64()),
            "c_mktsegment": pa.array([r[2] for r in rows], pa.string()),
        }
    )
    pq.write_table(tbl, str(tmp_path / "customer.parquet"))
    return str(tmp_path)


class TestStreaks:
    def test_gaps_break_and_same_day_dedupes(self, spark, tmp_path):
        """User 1: Jan 1,1,2,3 then Jan 10,11 → best streak 3 (the
        duplicate Jan-1 event must not inflate it). User 2: one day →
        best 1."""
        sf = _write_events(
            tmp_path,
            [
                (1, 1, (1, 1, 9)), (2, 1, (1, 1, 15)), (3, 1, (1, 2, 9)),
                (4, 1, (1, 3, 9)), (5, 1, (1, 10, 9)), (6, 1, (1, 11, 9)),
                (7, 2, (1, 5, 9)),
            ],
        )
        out = {
            r["best_streak"]: r
            for r in QUERIES["q_streaks"](spark, sf).collect()
        }
        assert set(out) == {3, 1}
        assert out[3]["n_users"] == 1
        assert out[1]["n_users"] == 1
        assert out[3]["pct_users"] == 0.5


class TestRankMovers:
    def test_rank_deltas_within_both_period_cohort(self, spark, tmp_path):
        """A climbs 3rd→1st (+2), B holds 2nd (0), C falls 1st→3rd
        (−2); D (1996-only) must not appear or shift anyone's rank."""
        sf = _write_lineitem(
            tmp_path,
            [
                (1, (1996, 5, 1), 1, 10.0), (1, (1997, 5, 1), 1, 30.0),
                (2, (1996, 5, 1), 1, 20.0), (2, (1997, 5, 1), 1, 20.0),
                (3, (1996, 5, 1), 1, 30.0), (3, (1997, 5, 1), 1, 10.0),
                (4, (1996, 5, 1), 1, 99.0),
            ],
        )
        out = QUERIES["q_rank_movers"](spark, sf).collect()
        assert [r["partkey"] for r in out] == [1, 2, 3]
        a, b, c = out
        assert (a["rank_a"], a["rank_b"], a["rank_climb"]) == (3, 1, 2)
        assert (b["rank_a"], b["rank_b"], b["rank_climb"]) == (2, 2, 0)
        assert (c["rank_a"], c["rank_b"], c["rank_climb"]) == (1, 3, -2)


class TestWeightedMedian:
    def test_median_follows_volume_not_rows(self, spark, tmp_path):
        """Prices 100/200/300c with quantities 1/1/98: the row median
        is 200 but 98% of VOLUME trades at 300 — the weighted median
        must be 300."""
        sf = _write_lineitem(
            tmp_path,
            [
                (1, (1996, 1, 1), 1, 1.0),
                (2, (1996, 1, 1), 1, 2.0),
                (3, (1996, 1, 1), 98, 3.0),
            ],
        )
        out = QUERIES["q_weighted_median"](spark, sf).collect()
        assert len(out) == 1
        r = out[0]
        assert r["total_weight"] == 10000  # centi-units
        assert r["wmedian_cents"] == 300
        assert r["wp90_cents"] == 300


class TestRecordLinkage:
    def test_exact_threshold_classification(self, spark, tmp_path):
        """Block (nation 0, $500-band 2) holds customers 1,2,3,5:
        (1,2) both-agree → 40 match; (1,5),(2,5) balance-only → 15
        possible; (3,5) segment-only → exactly 6, the inclusive
        'possible' boundary; (1,3),(2,3) both-disagree → −19."""
        sf = _write_customer(
            tmp_path,
            [
                (1, 0, "BUILDING", 1000.00),
                (2, 0, "BUILDING", 1000.50),
                (3, 0, "MACHINERY", 1400.00),
                (4, 1, "BUILDING", 1000.00),  # other nation: no pairs
                (5, 0, "MACHINERY", 1000.80),
            ],
        )
        out = {
            (r["score"], r["verdict"]): r["n_pairs"]
            for r in QUERIES["q_record_linkage"](spark, sf).collect()
        }
        assert out == {
            (40, "match"): 1,
            (15, "possible"): 2,
            (6, "possible"): 1,
            (-19, "non_match"): 2,
        }
