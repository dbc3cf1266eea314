"""Planted gates for wave 61: assortativity (C215), Fleiss' kappa
(C216), int8 quantization QA (C217)."""

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


def _write_lineitem_pairs(tmp_path, baskets):
    """baskets = [(orderkey, [partkeys])]; each pair co-occurs twice
    (duplicate orders) so the support-2 filter keeps every edge."""
    rows = []
    ln = 1
    for o, parts in baskets:
        for p in parts:
            rows.append((o, p, ln))
            ln += 1
    t0 = dt.datetime(2024, 1, 1)
    n = len(rows)
    tbl = pa.table({
        "l_orderkey": pa.array([r[0] for r in rows], pa.int64()),
        "l_partkey": pa.array([r[1] for r in rows], pa.int64()),
        "l_suppkey": pa.array([1] * n, pa.int64()),
        "l_linenumber": pa.array([r[2] for r in rows], pa.int32()),
        "l_quantity": pa.array([1.0] * n, pa.float64()),
        "l_extendedprice": pa.array([1.0] * n, pa.float64()),
        "l_discount": pa.array([0.0] * n, pa.float64()),
        "l_tax": pa.array([0.0] * n, pa.float64()),
        "l_returnflag": pa.array(["N"] * n, pa.string()),
        "l_linestatus": pa.array(["O"] * n, pa.string()),
        "l_shipdate": pa.array([t0] * n, pa.timestamp("us")),
    })
    pq.write_table(tbl, str(tmp_path / "lineitem.parquet"))
    return str(tmp_path)


def _write_docs(tmp_path, rows):
    """rows = [(doc_id, lang)]"""
    tbl = pa.table({
        "doc_id": pa.array([r[0] for r in rows], pa.int64()),
        "text": pa.array(["t"] * len(rows), pa.string()),
        "lang": pa.array([r[1] for r in rows], pa.string()),
        "source": pa.array(["s"] * len(rows), pa.string()),
        "n_chars": pa.array([1] * len(rows), pa.int64()),
    })
    pq.write_table(tbl, str(tmp_path / "documents.parquet"))
    return str(tmp_path)


def _write_embeddings(tmp_path, rows):
    """rows = [(vec_id, [floats], label)]"""
    tbl = pa.table({
        "vec_id": pa.array([r[0] for r in rows], pa.int64()),
        "embedding": pa.array(
            [r[1] for r in rows], pa.list_(pa.float32())
        ),
        "label": pa.array([r[2] for r in rows], pa.int32()),
    })
    pq.write_table(tbl, str(tmp_path / "embeddings.parquet"))
    return str(tmp_path)


class TestAssortativity:
    def test_star_graph_is_maximally_disassortative(self, spark, tmp_path):
        """Hub part 0 paired with leaves 1..5 (each pair in 2 orders):
        star graph -> r = -1."""
        baskets = []
        for i, leaf in enumerate([1, 2, 3, 4, 5]):
            baskets.append((10 * i, [0, leaf]))
            baskets.append((10 * i + 1, [0, leaf]))
        sf = _write_lineitem_pairs(tmp_path, baskets)
        r = QUERIES["q_assortativity"](spark, sf).collect()[0]
        assert r.n_edges == 5
        assert r.assortativity == -1.0

    def test_regular_graph_null(self, spark, tmp_path):
        """A single edge: both endpoints degree 1 -> zero variance ->
        NULL coefficient."""
        baskets = [(1, [7, 8]), (2, [7, 8])]
        sf = _write_lineitem_pairs(tmp_path, baskets)
        r = QUERIES["q_assortativity"](spark, sf).collect()[0]
        assert r.n_edges == 1
        assert r.assortativity is None

    def test_fixture_in_valid_range(self, spark, sf_dir):
        r = QUERIES["q_assortativity"](spark, sf_dir).collect()[0]
        assert r.n_edges > 0
        if r.assortativity is not None:
            assert -1.0 - 1e-9 <= r.assortativity <= 1.0 + 1e-9


class TestFleissKappa:
    @staticmethod
    def _replicate(docs, n_raters=3):
        l0 = min(l for _, l in docs)
        counts = {}
        for did, lang in docs:
            for j in range(n_raters):
                h = int(
                    hashlib.md5(f"{did}-{j}".encode()).hexdigest()[:8], 16
                )
                lab = lang if h % 10 < 8 else l0
                counts.setdefault(did, {}).setdefault(lab, 0)
                counts[did][lab] += 1
        N, n = len(docs), n_raters
        ssq = sum(
            sum(v * v for v in c.values()) for c in counts.values()
        )
        p_bar = (ssq - N * n) / (N * n * (n - 1))
        marg = {}
        for c in counts.values():
            for lab, v in c.items():
                marg[lab] = marg.get(lab, 0) + v
        pe = 0.0
        for lab in sorted(marg):
            pe += (marg[lab] / (N * n)) ** 2
        pe = math.floor(pe * 1e8 + 0.5) / 1e8
        kappa = (p_bar - pe) / (1 - pe)
        return N, _srnd(p_bar, 6), _srnd(pe, 6), _srnd(kappa, 6)

    def test_python_replication(self, spark, tmp_path):
        docs = [(i, ["en", "fr", "de"][i % 3]) for i in range(30)]
        sf = _write_docs(tmp_path, docs)
        r = QUERIES["q_fleiss_kappa"](spark, sf).collect()[0]
        N, p_bar, pe, kappa = self._replicate(docs)
        assert r.n_items == N
        assert r.p_bar == p_bar
        assert r.p_e == pe
        assert r.kappa == kappa

    def test_fixture_kappa_in_range(self, spark, sf_dir):
        r = QUERIES["q_fleiss_kappa"](spark, sf_dir).collect()[0]
        assert r.n_items > 0
        assert 0.0 <= r.p_bar <= 1.0
        assert -1.0 <= r.kappa <= 1.0


class TestEmbedQuantizeQa:
    def test_hand_quantized_vectors(self, spark, tmp_path):
        """v1 = [1.0, -0.5]: scale 1e6, q = [127, -63]... err on the
        -0.5 component: m = -500000, q = round(-63.5) = -63 (floor of
        -63.0 after +0.5 = floor(-63.0)), recon = -63*1e6/127 =
        -496062.99 -> e = round(-3937.01) = -3937."""
        rows = [(0, [1.0, -0.5], 1)]
        sf = _write_embeddings(tmp_path, rows)
        r = QUERIES["q_embed_quantize_qa"](spark, sf).collect()[0]
        assert (r.n_vecs, r.n_comps) == (1, 2)
        q = math.floor(127.0 * -500000 / 1000000 + 0.5)  # -63
        recon = q * 1000000.0 / 127.0
        e = math.floor(-500000 - recon + 0.5)
        assert r.max_abs_err_u == abs(e)
        mse = (0**2 + e * e) / 2 / 1e12
        assert r.mse == math.floor(mse * 1e10 + 0.5) / 1e10

    def test_zero_vector_zero_error(self, spark, tmp_path):
        rows = [(0, [0.0, 0.0, 0.0], 7)]
        sf = _write_embeddings(tmp_path, rows)
        r = QUERIES["q_embed_quantize_qa"](spark, sf).collect()[0]
        assert r.max_abs_err_u == 0 and r.mse == 0.0

    def test_fixture_error_bound(self, spark, sf_dir, duck):
        rows = QUERIES["q_embed_quantize_qa"](spark, sf_dir).collect()
        assert rows
        # per-vector scale bound: |e| <= s/254 + 1 with s <= 1e6-ish
        # (unit-norm-ish fixture vectors) -> micro-unit errors stay
        # below ~s_max/254 + 1
        (smax,) = duck.execute(
            "SELECT max(list_max(list_transform(embedding,"
            " x -> abs(CAST(floor(CAST(x AS DOUBLE) * 1000000.0 + 0.5)"
            " AS BIGINT))))) FROM embeddings"
        ).fetchone()
        for r in rows:
            assert r.max_abs_err_u <= smax / 254 + 1
            assert r.mse >= 0.0
