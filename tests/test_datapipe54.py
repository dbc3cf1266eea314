"""Planted gates for wave 57: Wilcoxon signed-rank (C200), trimmed
mean (C201), Lorenz curve (C202), Benjamini-Hochberg FDR (C203)."""

from __future__ import annotations

import datetime as dt
import hashlib
import math

import pyarrow as pa
import pyarrow.parquet as pq

from cassowary_spark import registry
from cassowary_spark.registry import QUERIES

registry.load_all()


def _srnd(x, n=6):
    return math.floor(x * 10**n + 0.5) / 10**n


def _write_events(tmp_path, rows):
    """rows = [(event_id, user_id, day, value)] (Jan 2024)."""
    tbl = pa.table({
        "event_id": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array(
            [dt.datetime(2024, 1, r[2], 9, 0, 0) for r in rows],
            pa.timestamp("us"),
        ),
        "user_id": pa.array([r[1] for r in rows], pa.int64()),
        "event_type": pa.array(["view"] * len(rows), pa.string()),
        "value": pa.array([float(r[3]) for r in rows], pa.float64()),
        "props": pa.array(["{}"] * len(rows), pa.string()),
    })
    pq.write_table(tbl, str(tmp_path / "events.parquet"))
    return str(tmp_path)


def _write_lineitem(tmp_path, rows):
    """rows = [(orderkey, flag, extendedprice)]"""
    t0 = dt.datetime(2024, 1, 1)
    n = len(rows)
    tbl = pa.table({
        "l_orderkey": pa.array([r[0] for r in rows], pa.int64()),
        "l_partkey": pa.array([1] * n, pa.int64()),
        "l_suppkey": pa.array([1] * n, pa.int64()),
        "l_linenumber": pa.array(list(range(1, n + 1)), pa.int32()),
        "l_quantity": pa.array([1.0] * n, pa.float64()),
        "l_extendedprice": pa.array([float(r[2]) for r in rows], pa.float64()),
        "l_discount": pa.array([0.0] * n, pa.float64()),
        "l_tax": pa.array([0.0] * n, pa.float64()),
        "l_returnflag": pa.array([r[1] for r in rows], pa.string()),
        "l_linestatus": pa.array(["O"] * n, pa.string()),
        "l_shipdate": pa.array([t0] * n, pa.timestamp("us")),
    })
    pq.write_table(tbl, str(tmp_path / "lineitem.parquet"))
    return str(tmp_path)


def _write_orders(tmp_path, rows):
    """rows = [(orderkey, custkey, totalprice)]"""
    t0 = dt.datetime(2024, 1, 1)
    n = len(rows)
    tbl = pa.table({
        "o_orderkey": pa.array([r[0] for r in rows], pa.int64()),
        "o_custkey": pa.array([r[1] for r in rows], pa.int64()),
        "o_orderstatus": pa.array(["F"] * n, pa.string()),
        "o_totalprice": pa.array([float(r[2]) for r in rows], pa.float64()),
        "o_orderdate": pa.array([t0] * n, pa.timestamp("us")),
        "o_orderpriority": pa.array(["1-URGENT"] * n, pa.string()),
    })
    pq.write_table(tbl, str(tmp_path / "orders.parquet"))
    return str(tmp_path)


def _write_part(tmp_path, brands):
    n = len(brands)
    tbl = pa.table({
        "p_partkey": pa.array(list(range(n)), pa.int64()),
        "p_name": pa.array([f"p{i}" for i in range(n)], pa.string()),
        "p_brand": pa.array(brands, pa.string()),
        "p_type": pa.array(["t"] * n, pa.string()),
        "p_size": pa.array([1] * n, pa.int32()),
        "p_retailprice": pa.array([1.0] * n, pa.float64()),
    })
    pq.write_table(tbl, str(tmp_path / "part.parquet"))
    return str(tmp_path)


class TestWilcoxonSigned:
    def test_hand_math_with_negative_pair(self, spark, tmp_path):
        """Pairs (m2-m1 cents): +1000, +2000, +3000, -500 →
        |d| ranks 2,3,4,1; W+ = 9, mean = 5, var = 7.5."""
        rows = []
        for uid, (v1, v2) in enumerate(
            [(10.0, 20.0), (10.0, 30.0), (10.0, 40.0), (10.0, 5.0)]
        ):
            rows.append((2 * uid, uid, 5, v1))
            rows.append((2 * uid + 1, uid, 20, v2))
        sf = _write_events(tmp_path, rows)
        r = QUERIES["q_wilcoxon_signed"](spark, sf).collect()[0]
        assert (r.n, r.n_pos, r.n_neg) == (4, 3, 1)
        assert r.w_plus == 9.0
        assert r.z == _srnd((9.0 - 5.0) / math.sqrt(7.5), 6)

    def test_all_positive_gives_max_w(self, spark, tmp_path):
        rows = []
        for uid in range(5):
            rows.append((2 * uid, uid, 3, 1.0))
            rows.append((2 * uid + 1, uid, 25, 10.0 + uid))
        sf = _write_events(tmp_path, rows)
        r = QUERIES["q_wilcoxon_signed"](spark, sf).collect()[0]
        assert r.n == 5 and r.n_neg == 0
        assert r.w_plus == 5 * 6 / 2  # n(n+1)/2

    def test_tied_diffs_use_midranks(self, spark, tmp_path):
        """Diffs +100, +100, -100 cents: |d| all tied → midrank 2
        each; W+ = 4; tsum = 27-3 = 24."""
        rows = []
        for uid, (v1, v2) in enumerate([(1.0, 2.0), (5.0, 6.0), (9.0, 8.0)]):
            rows.append((2 * uid, uid, 1, v1))
            rows.append((2 * uid + 1, uid, 30, v2))
        sf = _write_events(tmp_path, rows)
        r = QUERIES["q_wilcoxon_signed"](spark, sf).collect()[0]
        assert r.w_plus == 4.0
        mean, var = 3 * 4 / 4, 3 * 4 * 7 / 24 - 24 / 48
        assert r.z == _srnd((4.0 - mean) / math.sqrt(var), 6)


class TestTrimmedMean:
    def test_hand_trim_no_ties(self, spark, tmp_path):
        """Values 1..10, 10% trim each side drops 1 and 10:
        mean(2..9) = 5.5."""
        rows = [(i, "N", float(i + 1)) for i in range(10)]
        sf = _write_lineitem(tmp_path, rows)
        r = {x.flag: x for x in QUERIES["q_trimmed_mean"](spark, sf).collect()}
        assert r["N"].n_rows == 10 and r["N"].n_kept == 8
        assert r["N"].trimmed_mean == 5.5

    def test_tie_straddles_boundary_partial_overlap(self, spark, tmp_path):
        """[1, 5×8, 100]: trim 1 per tail — the 5-tie contributes all
        8 copies (interval [2,9] within its [2,9] span): mean = 5."""
        rows = [(0, "N", 1.0)] + [(i, "N", 5.0) for i in range(1, 9)] + [
            (9, "N", 100.0)
        ]
        sf = _write_lineitem(tmp_path, rows)
        r = QUERIES["q_trimmed_mean"](spark, sf).collect()[0]
        assert r.n_kept == 8 and r.trimmed_mean == 5.0

    def test_groups_independent(self, spark, tmp_path):
        rows = [(i, "A", float(i + 1)) for i in range(10)]
        rows += [(100 + i, "R", 1000.0) for i in range(5)]
        sf = _write_lineitem(tmp_path, rows)
        r = {x.flag: x for x in QUERIES["q_trimmed_mean"](spark, sf).collect()}
        assert r["A"].trimmed_mean == 5.5
        # 5 rows: lo = 0, nothing trimmed
        assert r["R"].n_kept == 5 and r["R"].trimmed_mean == 1000.0


class TestLorenzCurve:
    def test_uniform_revenue_uniform_shares(self, spark, tmp_path):
        rows = [(i, i, 100.0) for i in range(10)]
        sf = _write_orders(tmp_path, rows)
        out = sorted(
            QUERIES["q_lorenz_curve"](spark, sf).collect(),
            key=lambda r: r.band,
        )
        # all revenues tied -> ONE band holding everyone, shares 1.0
        assert len(out) == 1
        assert out[0].n_customers == 10
        assert out[0].rev_share == 1.0 and out[0].cum_rev_share == 1.0

    def test_planted_whale_concentration(self, spark, tmp_path):
        rows = [(i, i, 100.0) for i in range(9)] + [(9, 9, 9100.0)]
        sf = _write_orders(tmp_path, rows)
        out = {r.band: r for r in QUERIES["q_lorenz_curve"](spark, sf).collect()}
        # whale lands alone in the top band with 91% of revenue
        top = out[max(out)]
        assert top.n_customers == 1
        assert top.rev_share == _srnd(9100.0 / 10000.0, 6)
        assert out[max(out)].cum_rev_share == 1.0
        # monotone cumulative shares
        bands = sorted(out)
        cums = [out[b].cum_rev_share for b in bands]
        assert cums == sorted(cums)

    def test_fixture_shares_sum_to_one(self, spark, sf_dir):
        rows = QUERIES["q_lorenz_curve"](spark, sf_dir).collect()
        assert abs(sum(r.rev_share for r in rows) - 1.0) < 1e-4
        assert max(r.cum_rev_share for r in rows) == 1.0


class TestBhFdr:
    @staticmethod
    def _expected(brands, q=0.1):
        import collections

        counts = collections.Counter(brands)
        hyp = []
        for b in sorted(counts):
            u = (int(hashlib.md5(b.encode()).hexdigest()[:8], 16) % 1000000) / 1e6
            p = u / 1000.0 if b.startswith("Brand#1") else u
            hyp.append((b, counts[b], _srnd(p, 6)))
        hyp.sort(key=lambda t: (t[2], t[0]))
        m = len(hyp)
        ks = 0
        for k, (_, _, p) in enumerate(hyp, 1):
            if p <= k * q / m:
                ks = k
        return {
            b: (n, p, k, 1 if k <= ks else 0)
            for k, (b, n, p) in enumerate(hyp, 1)
        }

    def test_full_python_replication(self, spark, tmp_path):
        brands = (
            [f"Brand#1{i}" for i in range(3)] * 2
            + [f"Brand#4{i}" for i in range(8)]
        )
        sf = _write_part(tmp_path, brands)
        out = {r.brand: r for r in QUERIES["q_bh_fdr"](spark, sf).collect()}
        exp = self._expected(brands)
        assert set(out) == set(exp)
        for b, (n, p, k, rej) in exp.items():
            r = out[b]
            assert (r.n_parts, r.k, r.rejected) == (n, k, rej), b
            assert r.p == p, b

    def test_fixture_rejections_form_prefix(self, spark, sf_dir):
        rows = sorted(
            QUERIES["q_bh_fdr"](spark, sf_dir).collect(), key=lambda r: r.k
        )
        flags = [r.rejected for r in rows]
        # step-up: rejections are exactly ranks 1..k*
        if 1 in flags:
            last = max(i for i, f in enumerate(flags) if f == 1)
            assert all(f == 1 for f in flags[: last + 1])
        # planted Brand#1x block exists in the TPC-H-ish brand space
        assert any(r.brand.startswith("Brand#1") for r in rows)
