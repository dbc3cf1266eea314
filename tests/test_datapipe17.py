"""Planted-input tests for wave 21 (C128-C131), each recomputing the
metric by a different route: a Python replication of the exact
quantized Zipf OLS over a constructed near-power-law corpus (plus an
exact 1/r law whose fit is perfect), a perfectly weekly-periodic
series whose backtest error is exactly zero (and a doubled week whose
APE/sAPE are closed-form), a constant-price bootstrap whose interval
collapses to a point plus a full Python replication of the
hash-Poisson pipeline, and contingency tables with MI = 0
(independence) and NMI = 1 (determinism).
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


def _write_documents(tmp_path, texts):
    tbl = pa.table(
        {
            "doc_id": pa.array(range(1, len(texts) + 1), pa.int64()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(["en"] * len(texts), pa.string()),
            "source": pa.array(["src0"] * len(texts), pa.string()),
            "n_chars": pa.array(
                [len(t) for t in texts], pa.int64()
            ),
        }
    )
    pq.write_table(tbl, str(tmp_path / "documents.parquet"))
    return str(tmp_path)


class TestZipfFit:
    def _py_zipf(self, freqs):
        """Replicate the exact quantized OLS: freqs sorted DESC are
        ranks 1..V."""
        pts = [
            (
                math.floor(math.log(r) * 1e6 + 0.5),
                math.floor(math.log(f) * 1e6 + 0.5),
            )
            for r, f in enumerate(sorted(freqs, reverse=True), start=1)
        ]
        n = len(pts)
        sx = sum(x for x, _ in pts)
        sy = sum(y for _, y in pts)
        sxy = sum(x * y for x, y in pts)
        sxx = sum(x * x for x, _ in pts)
        syy = sum(y * y for _, y in pts)
        num = float(n) * float(sxy) - float(sx) * float(sy)
        den = float(n) * float(sxx) - float(sx) * float(sx)
        slope = num / den
        ln_c = (float(sy) - slope * float(sx)) / float(n) / 1e6
        r2 = (num * num) / (den * (float(n) * float(syy)
                                   - float(sy) * float(sy)))
        return _srnd(slope, 6), _srnd(ln_c, 6), _srnd(r2, 6)

    def test_exact_inverse_law_and_python_reference(self, spark, tmp_path):
        """Frequencies 24/12/8/6 are exactly 24/r: slope must be -1
        and r2 must be 1 to within quantization; a rounded-1/r corpus
        must match the Python replication of the same quantized OLS
        exactly."""
        freqs = {"alpha": 24, "beta": 12, "gamma": 8, "delta": 6}
        words = [w for w, f in sorted(freqs.items()) for _ in range(f)]
        texts = [" ".join(words[i: i + 10]) for i in range(0, len(words), 10)]
        sf = _write_documents(tmp_path, texts)
        out = QUERIES["q_zipf_fit"](spark, sf).collect()[0]
        slope, ln_c, r2 = self._py_zipf(list(freqs.values()))
        assert out["n"] == 4
        assert out["zipf_slope"] == slope
        assert out["ln_c"] == ln_c
        assert out["r2"] == r2
        assert abs(out["zipf_slope"] + 1.0) < 1e-4
        assert out["r2"] > 0.99999

        d2 = tmp_path / "rounded"
        d2.mkdir()
        freqs2 = [max(1, round(1000 / r)) for r in range(1, 21)]
        words2 = [
            f"w{i:02d}" for i, f in enumerate(freqs2) for _ in range(f)
        ]
        texts2 = [
            " ".join(words2[i: i + 25]) for i in range(0, len(words2), 25)
        ]
        sf2 = _write_documents(d2, texts2)
        out2 = QUERIES["q_zipf_fit"](spark, sf2).collect()[0]
        slope2, ln_c2, r22 = self._py_zipf(freqs2)
        assert out2["n"] == 20
        assert (out2["zipf_slope"], out2["ln_c"], out2["r2"]) == (
            slope2, ln_c2, r22,
        )


class TestBacktestSmape:
    def test_periodic_zero_error_and_doubled_week(self, spark, tmp_path):
        """35 days repeating weekly pattern 100..700: days 28-34 are
        forecast from four identical priors, so MAPE = sMAPE = 0.
        Then a 6th week at 2x the pattern: APE = 0.5 (|2p-p|/2p) and
        sAPE = 2/3 exactly for each weekday."""
        pattern = [100, 200, 300, 400, 500, 600, 700]
        start = dt.datetime(2024, 1, 1)

        def mk(revs):
            return [
                (i + 1, 1, "O", r, start + dt.timedelta(days=i), "1-URGENT")
                for i, r in enumerate(revs)
            ]

        sf = _write_orders(tmp_path, mk(pattern * 5))
        out = QUERIES["q_backtest_smape"](spark, sf).collect()
        assert len(out) == 7
        for r in out:
            assert r["n_evals"] == 1
            assert r["mape"] == 0.0 and r["smape"] == 0.0, r

        d2 = tmp_path / "doubled"
        d2.mkdir()
        revs = pattern * 5 + [2 * p for p in pattern]
        sf2 = _write_orders(d2, mk(revs))
        out2 = QUERIES["q_backtest_smape"](spark, sf2).collect()
        for r in out2:
            assert r["n_evals"] == 2
            # week 5 contributes 0; week 6: ape = 0.5, sape = 2/3
            assert r["mape"] == _srnd(0.5 / 2, 6)
            assert r["smape"] == _srnd(
                _srnd(2.0 / 3.0, 8) / 2, 6
            ), r


class TestBootstrapCi:
    _CDF = [
        0.36787944117144233, 0.7357588823428847, 0.9196986029286058,
        0.9810118431238462, 0.9963401531726563, 0.9994058151824183,
        0.9999167588507119,
    ]

    def _w(self, okey, b):
        i, j = b // 4, b % 4
        hx = hashlib.md5(f"{okey}|{i}".encode()).hexdigest()
        h = int(hx[8 * j: 8 * j + 8], 16)
        u = (h + 1) / 4294967296.0
        for k, c in enumerate(self._CDF):
            if u < c:
                return k
        return 7

    def test_constant_prices_collapse_and_python_replication(
        self, spark, tmp_path
    ):
        """All orders priced 100.00: every replica mean is exactly
        100, so se = 0 and the CI collapses onto the point estimate.
        Then mixed prices must match a full Python replication of the
        hash-Poisson pipeline."""
        rows = [
            (k, 1, "O", 100.0, dt.datetime(2024, 1, 1), "1-URGENT")
            for k in range(1, 41)
        ]
        sf = _write_orders(tmp_path, rows)
        out = QUERIES["q_bootstrap_ci"](spark, sf).collect()[0]
        assert out["n"] == 40 and out["n_replicas"] == 64
        assert out["mean_est"] == 100.0
        assert out["boot_se"] == 0.0
        assert out["ci_lo"] == 100.0 and out["ci_hi"] == 100.0

        d2 = tmp_path / "mixed"
        d2.mkdir()
        prices = [50.0 + 7.5 * (k % 13) for k in range(1, 61)]
        rows2 = [
            (k, 1, "O", p, dt.datetime(2024, 1, 1), "1-URGENT")
            for k, p in enumerate(prices, start=1)
        ]
        sf2 = _write_orders(d2, rows2)
        out2 = QUERIES["q_bootstrap_ci"](spark, sf2).collect()[0]

        cents = {
            k: math.floor(p * 100.0 + 0.5)
            for k, p in enumerate(prices, start=1)
        }
        scents, n = sum(cents.values()), len(cents)
        m0 = scents / n
        devs = []
        for b in range(64):
            swx = sum(self._w(k, b) * c for k, c in cents.items())
            sw = sum(self._w(k, b) for k in cents)
            mb = swx / sw
            devs.append((mb, b))
        dev4 = [
            math.floor((mb - m0) / 100.0 * 1e4 + 0.5)
            for mb, _ in sorted(devs)
        ]
        sd1, sd2 = sum(dev4), sum(d * d for d in dev4)
        se = math.sqrt((sd2 - sd1 * sd1 / 64.0) / 63.0) / 1e4
        mean_est = scents / n / 100.0
        assert out2["mean_est"] == _srnd(mean_est, 6)
        assert out2["boot_se"] == _srnd(se, 6)
        assert out2["ci_lo"] == _srnd(mean_est + dev4[1] / 1e4, 6)
        assert out2["ci_hi"] == _srnd(mean_est + dev4[62] / 1e4, 6)


class TestMutualInformation:
    def test_independence_zero_and_determinism_one(self, spark, tmp_path):
        """Uniform 2x2 (independent): every MI term is ln(1) = 0.
        Perfectly dependent 2x2 (A->URGENT, B->LOW, balanced): MI =
        H_row = H_col, so NMI = 1."""
        _write_customer(tmp_path, [(1, "A"), (2, "B")])
        rows, key = [], 0
        for ck in (1, 2):
            for prio in ("1-URGENT", "5-LOW"):
                for _ in range(25):
                    key += 1
                    rows.append(
                        (key, ck, "O", 1.0, dt.datetime(2024, 1, 1), prio)
                    )
        sf = _write_orders(tmp_path, rows)
        out = QUERIES["q_mutual_information"](spark, sf).collect()[0]
        assert out["mi"] == 0.0
        assert out["nmi"] == 0.0

        d2 = tmp_path / "dep"
        d2.mkdir()
        _write_customer(d2, [(1, "A"), (2, "B")])
        rows2, key = [], 0
        for ck, prio in ((1, "1-URGENT"), (2, "5-LOW")):
            for _ in range(50):
                key += 1
                rows2.append(
                    (key, ck, "O", 1.0, dt.datetime(2024, 1, 1), prio)
                )
        sf2 = _write_orders(d2, rows2)
        out2 = QUERIES["q_mutual_information"](spark, sf2).collect()[0]
        term = _srnd(0.5 * math.log(2.0), 8)
        assert out2["mi"] == _srnd(2 * term, 6)
        assert out2["h_row"] == _srnd(2 * term, 6)
        assert out2["nmi"] == 1.0
