"""Planted-input tests for wave 20 (C123-C127), each recomputing the
metric by a DIFFERENT route than the query: a constructed series where
count exactly predicts next-day revenue (CCF lag-1 = 1.0), hand-run
chi-square on a 2x2 table (plus an exactly-independent one), a
hand-smoothed target encoding with the one-row-category LOO guard, a
hand-run WoE/IV over two categories, and a planted 4-clique whose
triangle census is known in closed form (plus the support-threshold
exclusion).
"""

from __future__ import annotations

import datetime as dt
import math

import pyarrow as pa
import pyarrow.parquet as pq

from cassowary_spark import registry
from cassowary_spark.registry import QUERIES

registry.load_all()


def _srnd(x: float, n: int) -> float:
    s = float(10**n)
    return math.floor(x * s + 0.5) / s


def _write_orders(tmp_path, rows):
    """rows = [(orderkey, custkey, status, totalprice, date, prio)]."""
    tbl = pa.table(
        {
            "o_orderkey": pa.array([r[0] for r in rows], pa.int64()),
            "o_custkey": pa.array([r[1] for r in rows], pa.int64()),
            "o_orderstatus": pa.array([r[2] for r in rows], pa.string()),
            "o_totalprice": pa.array(
                [float(r[3]) for r in rows], pa.float64()
            ),
            "o_orderdate": pa.array(
                [r[4] for r in rows], pa.timestamp("us")
            ),
            "o_orderpriority": pa.array([r[5] for r in rows], pa.string()),
        }
    )
    pq.write_table(tbl, str(tmp_path / "orders.parquet"))
    return str(tmp_path)


def _write_customer(tmp_path, rows):
    """rows = [(custkey, mktsegment)]."""
    tbl = pa.table(
        {
            "c_custkey": pa.array([r[0] for r in rows], pa.int64()),
            "c_name": pa.array(
                [f"c{r[0]}" for r in rows], pa.string()
            ),
            "c_nationkey": pa.array([0] * len(rows), pa.int32()),
            "c_acctbal": pa.array([0.0] * len(rows), pa.float64()),
            "c_mktsegment": pa.array([r[1] for r in rows], pa.string()),
        }
    )
    pq.write_table(tbl, str(tmp_path / "customer.parquet"))


def _write_lineitem(tmp_path, rows):
    """rows = [(orderkey, partkey, returnflag)]."""
    tbl = pa.table(
        {
            "l_orderkey": pa.array([r[0] for r in rows], pa.int64()),
            "l_partkey": pa.array([r[1] for r in rows], pa.int64()),
            "l_linenumber": pa.array(
                list(range(1, len(rows) + 1)), pa.int32()
            ),
            "l_quantity": pa.array([1.0] * len(rows), pa.float64()),
            "l_extendedprice": pa.array([1.0] * len(rows), pa.float64()),
            "l_returnflag": pa.array([r[2] for r in rows], pa.string()),
            "l_shipdate": pa.array(
                [dt.datetime(1996, 1, 1)] * len(rows), pa.timestamp("us")
            ),
        }
    )
    pq.write_table(tbl, str(tmp_path / "lineitem.parquet"))


def _write_part(tmp_path, rows):
    """rows = [(partkey, brand)]."""
    tbl = pa.table(
        {
            "p_partkey": pa.array([r[0] for r in rows], pa.int64()),
            "p_name": pa.array([f"p{r[0]}" for r in rows], pa.string()),
            "p_brand": pa.array([r[1] for r in rows], pa.string()),
        }
    )
    pq.write_table(tbl, str(tmp_path / "part.parquet"))


class TestCrosscorrelation:
    def test_perfect_lead_and_python_reference(self, spark, tmp_path):
        """35 days with order counts cycling 1..5 and next-day revenue
        set to exactly 10x today's count: lag-1 CCF must be exactly
        1.0; lags 0 and 7 must match a pure-Python Pearson."""
        start = dt.datetime(2024, 1, 1)
        cnts = [(i % 5) + 1 for i in range(35)]
        # rev[t] = 10 * cnt[t-1]; day 0 gets a fixed filler revenue.
        revs = [7] + [10 * cnts[i - 1] for i in range(1, 35)]
        rows, key = [], 0
        for i, (c, rv) in enumerate(zip(cnts, revs)):
            day = start + dt.timedelta(days=i)
            prices = [rv - (c - 1)] + [1] * (c - 1)
            for p in prices:
                key += 1
                rows.append((key, 1, "O", p, day, "1-URGENT"))
        sf = _write_orders(tmp_path, rows)
        out = {
            r["lag_days"]: r
            for r in QUERIES["q_crosscorrelation"](spark, sf).collect()
        }
        assert set(out) == {0, 1, 7}
        assert out[1]["n_pairs"] == 34
        assert out[1]["ccf_r"] == 1.0

        def pearson(xs, ys):
            n = len(xs)
            sx, sy = sum(xs), sum(ys)
            sxy = sum(x * y for x, y in zip(xs, ys))
            sxx = sum(x * x for x in xs)
            syy = sum(y * y for y in ys)
            return (n * 1.0 * sxy - sx * 1.0 * sy) / math.sqrt(
                (n * 1.0 * sxx - sx * 1.0 * sx)
                * (n * 1.0 * syy - sy * 1.0 * sy)
            )

        for k in (0, 7):
            xs = cnts[: 35 - k] if k else cnts
            ys = revs[k:]
            assert out[k]["n_pairs"] == 35 - k
            assert out[k]["ccf_r"] == _srnd(pearson(xs, ys), 6), k


class TestChiSquare:
    def test_hand_2x2_and_exact_independence(self, spark, tmp_path):
        """2x2 with cells [[30,10],[20,40]]: chi2 = 100*(30*40-10*20)^2
        / (40*60*50*50) by the closed 2x2 form; an exactly
        proportional table must give chi2 = 0."""
        custs = [(1, "A"), (2, "B")]
        _write_customer(tmp_path, custs)
        cells = {("A", "1-URGENT"): 30, ("A", "5-LOW"): 10,
                 ("B", "1-URGENT"): 20, ("B", "5-LOW"): 40}
        rows, key = [], 0
        for (seg, prio), m in cells.items():
            ck = 1 if seg == "A" else 2
            for _ in range(m):
                key += 1
                rows.append(
                    (key, ck, "O", 1.0, dt.datetime(2024, 1, 1), prio)
                )
        sf = _write_orders(tmp_path, rows)
        out = QUERIES["q_chi_square"](spark, sf).collect()[0]
        n = 100
        exp = n * (30 * 40 - 10 * 20) ** 2 / (40 * 60 * 50 * 50)
        assert out["n"] == n and out["dof"] == 1
        # reassemble through the query's own quantization route: four
        # srnd8 terms, then srnd6 — but verify against the closed form
        assert abs(out["chi2"] - exp) < 1e-6
        assert out["cramers_v"] == _srnd(math.sqrt(out["chi2"] / n), 6)

        # exact independence: every (seg, prio) cell = 25
        rows2, key = [], 0
        for seg, ck in (("A", 1), ("B", 2)):
            for prio in ("1-URGENT", "5-LOW"):
                for _ in range(25):
                    key += 1
                    rows2.append(
                        (key, ck, "O", 1.0, dt.datetime(2024, 1, 1), prio)
                    )
        d2 = tmp_path / "ind"
        d2.mkdir()
        _write_customer(d2, custs)
        sf2 = _write_orders(d2, rows2)
        out2 = QUERIES["q_chi_square"](spark, sf2).collect()[0]
        assert out2["chi2"] == 0.0 and out2["cramers_v"] == 0.0


class TestTargetEncoding:
    def test_hand_smoothing_and_loo_guards(self, spark, tmp_path):
        """Brands: X has 4 rows 3 positive, Y has 1 row 1 positive
        (LOO-neg must be NULL: no negative to exclude), Z has 1 row 0
        positive (LOO-pos must be NULL)."""
        _write_part(
            tmp_path, [(1, "X"), (2, "Y"), (3, "Z")]
        )
        li = (
            [(1, 1, "R")] * 3 + [(1, 1, "N")]
            + [(2, 2, "R")]
            + [(3, 3, "N")]
        )
        li = [(i + 1, pk, fl) for i, (_, pk, fl) in enumerate(li)]
        _write_lineitem(tmp_path, li)
        sf = str(tmp_path)
        out = {
            r["brand"]: r
            for r in QUERIES["q_target_encoding"](spark, sf).collect()
        }
        nn, kk = 6, 4
        prior = kk / nn
        m = 100.0
        x = out["X"]
        assert (x["n"], x["k"]) == (4, 3)
        assert x["enc"] == _srnd((3 + m * prior) / (4 + m), 6)
        assert x["enc_loo_pos"] == _srnd((2 + m * prior) / (3 + m), 6)
        assert x["enc_loo_neg"] == _srnd((3 + m * prior) / (3 + m), 6)
        assert out["Y"]["enc_loo_neg"] is None  # no negative to drop
        assert out["Y"]["enc_loo_pos"] == _srnd((0 + m * prior) / (0 + m), 6)
        assert out["Z"]["enc_loo_pos"] is None  # no positive to drop


class TestWoeIv:
    def test_hand_two_categories(self, spark, tmp_path):
        """goods/bads: URGENT (8, 2), LOW (2, 8); verify the smoothed
        WoE and the summed IV by direct recomputation."""
        rows, key = [], 0
        for prio, g, b in (("1-URGENT", 8, 2), ("5-LOW", 2, 8)):
            for _ in range(g):
                key += 1
                rows.append(
                    (key, 1, "O", 1.0, dt.datetime(2024, 1, 1), prio)
                )
            for _ in range(b):
                key += 1
                rows.append(
                    (key, 1, "F", 1.0, dt.datetime(2024, 1, 1), prio)
                )
        sf = _write_orders(tmp_path, rows)
        out = {
            r["prio"]: r for r in QUERIES["q_woe_iv"](spark, sf).collect()
        }
        G, B = 10, 10
        iv_terms = []
        for prio, g, b in (("1-URGENT", 8, 2), ("5-LOW", 2, 8)):
            woe = math.log(((g + 0.5) * B) / ((b + 0.5) * G))
            assert out[prio]["goods"] == g and out[prio]["bads"] == b
            assert out[prio]["woe"] == _srnd(woe, 6), prio
            iv_terms.append(
                _srnd(((g + 0.5) / G - (b + 0.5) / B) * woe, 8)
            )
        assert out["1-URGENT"]["iv_total"] == _srnd(sum(iv_terms), 6)


class TestTriangleCount:
    def test_planted_clique_and_support_threshold(self, spark, tmp_path):
        """Parts 1-4 co-ordered together TWICE form a 4-clique:
        6 edges, 4 triangles, wedges = 4*C(3,2) = 12, cc = 1.0.
        Part 5 co-ordered with part 1 only ONCE must not create an
        edge (support < 2)."""
        li = []
        for ok in (1, 2):  # the clique appears in two orders
            for pk in (1, 2, 3, 4):
                li.append((ok, pk, "N"))
        li.append((3, 1, "N"))  # single co-occurrence: below support
        li.append((3, 5, "N"))
        li = [(ok, pk, fl) for ok, pk, fl in li]
        _write_lineitem(tmp_path, li)
        sf = str(tmp_path)
        out = QUERIES["q_triangle_count"](spark, sf).collect()[0]
        assert out["n_nodes"] == 4
        assert out["n_edges"] == 6
        assert out["n_wedges"] == 12
        assert out["n_triangles"] == 4
        assert out["global_cc"] == 1.0
