"""Planted-input tests for the wave-15 operators: AUC must equal
brute-force pair counting, the PVM bridge must tie out to the exact
revenue delta, the life table must censor short observation windows,
CUSUM must peak at the planted level shift, the grid spatial join must
equal an O(n²) brute force, and KS must hit 1.0 on disjoint supports.
"""

from __future__ import annotations

import datetime as dt
import hashlib
import math

import pyarrow as pa
import pyarrow.parquet as pq

from cassowary_spark import registry
from cassowary_spark.registry import QUERIES

registry.load_all()


def _write_orders(tmp_path, rows):
    """rows = (o_orderkey, custkey, status, totalprice, (y,m,d))."""
    tbl = pa.table(
        {
            "o_orderkey": pa.array([r[0] for r in rows], pa.int64()),
            "o_custkey": pa.array([r[1] for r in rows], pa.int64()),
            "o_orderstatus": pa.array([r[2] for r in rows], pa.string()),
            "o_totalprice": pa.array(
                [float(r[3]) for r in rows], pa.float64()
            ),
            "o_orderdate": pa.array(
                [dt.datetime(*r[4]) for r in rows], pa.timestamp("us")
            ),
            "o_orderpriority": pa.array(["1-URGENT"] * len(rows), pa.string()),
        }
    )
    pq.write_table(tbl, str(tmp_path / "orders.parquet"))
    return str(tmp_path)


def _write_customer(tmp_path, rows):
    """rows = (c_custkey, segment)."""
    tbl = pa.table(
        {
            "c_custkey": pa.array([r[0] for r in rows], pa.int64()),
            "c_name": pa.array([f"c{r[0]}" for r in rows], pa.string()),
            "c_nationkey": pa.array([0] * len(rows), pa.int32()),
            "c_acctbal": pa.array([0.0] * len(rows), pa.float64()),
            "c_mktsegment": pa.array([r[1] for r in rows], pa.string()),
        }
    )
    pq.write_table(tbl, str(tmp_path / "customer.parquet"))
    return str(tmp_path)


def _write_lineitem(tmp_path, rows):
    """rows = (returnflag, (y,m,d), quantity, extendedprice)."""
    tbl = pa.table(
        {
            "l_orderkey": pa.array(range(1, len(rows) + 1), pa.int64()),
            "l_linenumber": pa.array([1] * len(rows), pa.int32()),
            "l_returnflag": pa.array([r[0] for r in rows], pa.string()),
            "l_shipdate": pa.array(
                [dt.datetime(*r[1]) for r in rows], pa.timestamp("us")
            ),
            "l_quantity": pa.array([float(r[2]) for r in rows], pa.float64()),
            "l_extendedprice": pa.array(
                [float(r[3]) for r in rows], pa.float64()
            ),
        }
    )
    pq.write_table(tbl, str(tmp_path / "lineitem.parquet"))
    return str(tmp_path)


def _write_documents(tmp_path, texts):
    tbl = pa.table(
        {
            "doc_id": pa.array(range(1, len(texts) + 1), pa.int64()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(["en"] * len(texts), pa.string()),
            "source": pa.array(["t"] * len(texts), pa.string()),
            "n_chars": pa.array([len(t) for t in texts], pa.int64()),
        }
    )
    pq.write_table(tbl, str(tmp_path / "documents.parquet"))
    return str(tmp_path)


def _score(okey: int, status: str) -> tuple[int, int]:
    """Replicate the C88/C89 synthetic scorer outside Spark/DuckDB."""
    y = 1 if status == "F" else 0
    h = int(hashlib.md5(str(okey).encode()).hexdigest()[:8], 16)
    return h % 1000 + 300 * y, y


def _srnd(x: float, n: int) -> float:
    s = float(10**n)
    return math.floor(x * s + 0.5) / s


class TestRocAuc:
    def test_auc_equals_pair_counting(self, spark, tmp_path):
        """u2 from the rank-sum formula must equal the brute-force
        count of (pos, neg) pairs: 2 per win, 1 per tie."""
        rows = [
            (k, 1, "F" if k % 3 == 0 else "O", 100.0, (2024, 1, 1))
            for k in range(1, 61)
        ]
        sf = _write_orders(tmp_path, rows)
        scored = [_score(r[0], r[2]) for r in rows]
        pos = [s for s, y in scored if y == 1]
        neg = [s for s, y in scored if y == 0]
        u2 = sum(
            2 if p > n_ else (1 if p == n_ else 0) for p in pos for n_ in neg
        )
        tp = sum(1 for p in pos if p >= 650)
        fp = sum(1 for n_ in neg if n_ >= 650)
        out = QUERIES["q_roc_auc"](spark, sf).collect()[0]
        assert out["n_pos"] == len(pos)
        assert out["n_neg"] == len(neg)
        assert out["u2"] == u2
        assert out["auc"] == _srnd(u2 / (2.0 * len(pos) * len(neg)), 6)
        assert (out["tp"], out["fp"]) == (tp, fp)


class TestCalibrationBins:
    def test_bins_match_direct_computation(self, spark, tmp_path):
        rows = [
            (k, 1, "F" if k % 2 == 0 else "O", 100.0, (2024, 1, 1))
            for k in range(1, 41)
        ]
        sf = _write_orders(tmp_path, rows)
        scored = [_score(r[0], r[2]) for r in rows]
        out = {
            r["bin"]: r
            for r in QUERIES["q_calibration_bins"](spark, sf).collect()
        }
        bins: dict[int, list[tuple[int, int]]] = {}
        for s, y in scored:
            bins.setdefault(math.floor(s / 130.0), []).append((s, y))
        assert set(out) == set(bins)
        for b, members in bins.items():
            n = len(members)
            assert out[b]["n_rows"] == n
            assert out[b]["frac_pos"] == _srnd(
                sum(y for _, y in members) / n, 6
            )
            sq = sum((s - 1300 * y) ** 2 for s, y in members)
            assert out[b]["brier"] == _srnd(sq / (1690000.0 * n), 6)


class TestGiniConcentration:
    def test_hand_computed_gini(self, spark, tmp_path):
        """BUILDING: revenues 100c and 900c → gini 0.4; AUTOMOBILE:
        three equal revenues → gini 0. Customer 2's revenue arrives
        in two orders to exercise the pre-aggregation."""
        sf = _write_orders(
            tmp_path,
            [
                (1, 1, "O", 1.00, (2024, 1, 1)),
                (2, 2, "O", 4.00, (2024, 1, 2)),
                (3, 2, "O", 5.00, (2024, 1, 3)),
                (4, 3, "O", 1.00, (2024, 1, 1)),
                (5, 4, "O", 1.00, (2024, 1, 1)),
                (6, 5, "O", 1.00, (2024, 1, 1)),
            ],
        )
        _write_customer(
            tmp_path,
            [(1, "BUILDING"), (2, "BUILDING"), (3, "AUTOMOBILE"),
             (4, "AUTOMOBILE"), (5, "AUTOMOBILE")],
        )
        out = {
            r["segment"]: r
            for r in QUERIES["q_gini_concentration"](spark, sf).collect()
        }
        b = out["BUILDING"]
        # S = 1*100 + 2*900 = 1900, T = 1000, n = 2:
        # (2*1900 - 3*1000) / (2*1000) = 0.4
        assert b["n_cust"] == 2 and b["total_cents"] == 1000
        assert b["gini"] == 0.4
        assert b["top_decile_share"] == 0.0  # n div 10 == 0 → empty decile
        a = out["AUTOMOBILE"]
        assert a["gini"] == 0.0


class TestPriceVolumeMix:
    def test_bridge_ties_out(self, spark, tmp_path):
        """1996: 10 units @ $1 = $10; 1997: 20 units @ $2 = $40.
        price (Δp·qa) = vol (Δq·pa) = mix (Δp·Δq) = 1000c each,
        delta = 3000c — the bridge must tie out exactly."""
        sf = _write_lineitem(
            tmp_path,
            [
                ("N", (1996, 5, 1), 10, 10.00),
                ("N", (1997, 5, 1), 20, 40.00),
                ("R", (1995, 5, 1), 99, 99.00),  # outside both periods
            ],
        )
        out = QUERIES["q_price_volume_mix"](spark, sf).collect()
        assert len(out) == 1  # flag R fully outside the window
        r = out[0]
        assert r["returnflag"] == "N"
        assert (r["qty_a"], r["qty_b"]) == (1000, 2000)
        assert (r["rev_a_cents"], r["rev_b_cents"]) == (1000, 4000)
        assert r["delta_cents"] == 3000
        assert r["price_eff_cents"] == 1000.0
        assert r["vol_eff_cents"] == 1000.0
        assert r["mix_eff_cents"] == 1000.0
        assert (
            r["price_eff_cents"] + r["vol_eff_cents"] + r["mix_eff_cents"]
            == r["delta_cents"]
        )


class TestLifeTable:
    def test_censoring_excludes_short_windows(self, spark, tmp_path):
        """A: span 181d, window 349d. B: span 0d, window 349d.
        C: span 14d, window 14d (recent — censored out everywhere).
        At h=30..180 at_risk={A,B}, survived={A}; at h≥365 nobody is
        observable and the rate must be NULL, not 0."""
        sf = _write_orders(
            tmp_path,
            [
                (1, 1, "O", 1.0, (2020, 1, 1)),
                (2, 1, "O", 1.0, (2020, 6, 30)),
                (3, 2, "O", 1.0, (2020, 1, 1)),
                (4, 3, "O", 1.0, (2020, 12, 1)),
                (5, 3, "O", 1.0, (2020, 12, 15)),
            ],
        )
        out = {
            r["horizon_days"]: r
            for r in QUERIES["q_life_table"](spark, sf).collect()
        }
        assert set(out) == {30, 60, 90, 180, 365, 730}
        for h in (30, 60, 90, 180):
            assert (out[h]["at_risk"], out[h]["survived"]) == (2, 1), h
            assert out[h]["survival_rate"] == 0.5
        for h in (365, 730):
            assert (out[h]["at_risk"], out[h]["survived"]) == (0, 0)
            assert out[h]["survival_rate"] is None


class TestCusumChangepoint:
    def test_peak_at_planted_shift(self, spark, tmp_path):
        """Daily revenue 100,100,200,200: CUSUM of n·x−T is
        -20000,-40000,-20000,0 — the |peak| lands on day 2, the last
        day before the level shift."""
        sf = _write_orders(
            tmp_path,
            [
                (1, 1, "O", 100.0, (2024, 1, 1)),
                (2, 1, "O", 100.0, (2024, 1, 2)),
                (3, 1, "O", 200.0, (2024, 1, 3)),
                (4, 1, "O", 200.0, (2024, 1, 4)),
            ],
        )
        out = QUERIES["q_cusum_changepoint"](spark, sf).collect()
        assert [r["day"] for r in out] == [
            "2024-01-02", "2024-01-01", "2024-01-03", "2024-01-04"
        ]
        assert out[0]["cusum_scaled"] == -40000
        assert out[0]["drift_r"] == _srnd(-40000 / (4.0 * 60000), 8)
        assert out[3]["cusum_scaled"] == 0


class TestSpatialGridJoin:
    def test_equals_brute_force(self, spark, tmp_path):
        """The grid-bucketed join must reproduce the O(n²) loop
        exactly: same cells, same pair counts, same min distances."""
        n = 120
        _write_orders(tmp_path, [(1, 1, "O", 1.0, (2024, 1, 1))])
        sf = _write_customer(tmp_path, [(k, "BUILDING") for k in range(1, n + 1)])

        def coord(prefix: str, k: int) -> int:
            return (
                int(
                    hashlib.md5(f"{prefix}{k}".encode()).hexdigest()[:8], 16
                )
                % 1000
            )

        pts = {k: (coord("x", k), coord("y", k)) for k in range(1, n + 1)}
        expected: dict[tuple[int, int], list[int]] = {}
        for i in range(1, n + 1):
            for j in range(i + 1, n + 1):
                d2 = (pts[i][0] - pts[j][0]) ** 2 + (
                    pts[i][1] - pts[j][1]
                ) ** 2
                if d2 < 100:
                    cell = (pts[i][0] // 25, pts[i][1] // 25)
                    expected.setdefault(cell, []).append(d2)
        out = {
            (r["cell_x"], r["cell_y"]): r
            for r in QUERIES["q_spatial_grid_join"](spark, sf).collect()
        }
        assert set(out) == set(expected)
        for cell, d2s in expected.items():
            assert out[cell]["n_pairs"] == len(d2s)
            assert out[cell]["min_dist2"] == min(d2s)
            assert out[cell]["avg_dist2"] == _srnd(
                sum(d2s) / len(d2s), 4
            )


class TestKsDrift:
    def test_disjoint_supports_hit_one(self, spark, tmp_path):
        """AUTOMOBILE orders all in band 0, BUILDING all in band 5 —
        the CDF gap peaks at 1.0 in band 0; a MACHINERY customer must
        be filtered out entirely."""
        sf = _write_orders(
            tmp_path,
            [
                (1, 1, "O", 50.0, (2024, 1, 1)),
                (2, 2, "O", 60.0, (2024, 1, 1)),
                (3, 3, "O", 1100.0, (2024, 1, 1)),
                (4, 4, "O", 1150.0, (2024, 1, 1)),
                (5, 5, "O", 700.0, (2024, 1, 1)),
            ],
        )
        _write_customer(
            tmp_path,
            [(1, "AUTOMOBILE"), (2, "AUTOMOBILE"), (3, "BUILDING"),
             (4, "BUILDING"), (5, "MACHINERY")],
        )
        out = QUERIES["q_ks_drift"](spark, sf).collect()[0]
        assert (out["n_a"], out["n_b"]) == (2, 2)
        assert out["ks_scaled"] == 4  # cum_a·n_b − cum_b·n_a = 2·2
        assert out["ks_stat"] == 1.0
        assert out["band_at_max"] == 0


class TestReadability:
    def test_hand_scored_bands(self, spark, tmp_path):
        """'Hello world.' → 2 words, 1 sentence, 3 vowel groups →
        score 77.905 (band 7); empty text clamps every count to 1 →
        score 121.22 (band 12)."""
        sf = _write_documents(tmp_path, ["Hello world.", ""])
        out = {
            r["band"]: r
            for r in QUERIES["q_readability"](spark, sf).collect()
        }

        def fm(w: int, s: int, sy: int) -> int:
            return math.floor(
                (206.835 - 1.015 * (w / s) - 84.6 * (sy / w)) * 10000.0 + 0.5
            )

        f1, f2 = fm(2, 1, 3), fm(1, 1, 1)
        assert set(out) == {
            math.floor(f1 / 100000.0), math.floor(f2 / 100000.0)
        }
        b1 = out[math.floor(f1 / 100000.0)]
        assert b1["n_docs"] == 1
        assert b1["avg_score"] == _srnd(f1 / 10000.0, 4)
