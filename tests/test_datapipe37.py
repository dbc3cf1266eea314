"""Planted gates for wave 39: q_kish_ess (C166) and q_hash_chain
(C167)."""

from __future__ import annotations

import hashlib
import math

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from cassowary_spark import registry
from cassowary_spark.registry import QUERIES

registry.load_all()


def _srnd(x: float, n: int) -> float:
    s = float(10**n)
    return math.floor(x * s + 0.5) / s


def _write_docs(tmp_path, docs):
    """docs = [(doc_id, text, lang, source)]."""
    tbl = pa.table(
        {
            "doc_id": pa.array([d[0] for d in docs], pa.int64()),
            "text": pa.array([d[1] for d in docs], pa.string()),
            "lang": pa.array([d[2] for d in docs], pa.string()),
            "source": pa.array([d[3] for d in docs], pa.string()),
            "n_chars": pa.array([len(d[1]) for d in docs], pa.int64()),
        }
    )
    pq.write_table(tbl, str(tmp_path / "documents.parquet"))
    return str(tmp_path)


class TestKishEss:
    def test_uniform_weights_give_full_ess(self, spark, tmp_path):
        docs = [(i, "x" * 40, "en", "s") for i in range(10)]
        sf = _write_docs(tmp_path, docs)
        (r,) = QUERIES["q_kish_ess"](spark, sf).collect()
        assert r.n_docs == 10
        assert r.ess == pytest.approx(10.0)
        assert r.ess_ratio == pytest.approx(1.0)

    def test_one_heavy_doc_shrinks_ess(self, spark, tmp_path):
        """9 docs of weight 1 + one of weight 1000: ESS ~ 1."""
        docs = [(i, "x", "en", "s") for i in range(9)]
        docs.append((9, "y" * 1000, "en", "s"))
        sf = _write_docs(tmp_path, docs)
        (r,) = QUERIES["q_kish_ess"](spark, sf).collect()
        expect = (9 + 1000) ** 2 / (9 + 1000**2)
        assert r.ess == pytest.approx(_srnd(expect, 4))
        assert r.ess_ratio < 0.2

    def test_fixture_bounds(self, spark, sf_dir):
        rows = QUERIES["q_kish_ess"](spark, sf_dir).collect()
        assert rows
        for r in rows:
            assert 1.0 <= r.ess <= r.n_docs + 1e-6
            assert 0.0 < r.ess_ratio <= 1.0 + 1e-9


class TestHashChain:
    @staticmethod
    def _chain(texts):
        acc = ""
        for t in texts:
            leaf = hashlib.md5(t.encode()).hexdigest()
            acc = hashlib.md5((acc + leaf).encode()).hexdigest()
        return acc

    def test_matches_python_reference_in_docid_order(self, spark, tmp_path):
        docs = [
            (3, "gamma", "en", "a"),
            (1, "alpha", "en", "a"),
            (2, "beta", "en", "a"),
            (10, "solo", "en", "b"),
        ]
        sf = _write_docs(tmp_path, docs)
        rows = {r.source: r for r in QUERIES["q_hash_chain"](spark, sf).collect()}
        assert rows["a"].n_docs == 3
        assert rows["a"].chain == self._chain(["alpha", "beta", "gamma"])
        assert rows["b"].chain == self._chain(["solo"])

    def test_any_mutation_changes_chain(self, spark, tmp_path_factory):
        base = [(1, "alpha", "en", "a"), (2, "beta", "en", "a")]
        edited = [(1, "alphA", "en", "a"), (2, "beta", "en", "a")]
        reordered = [(2, "alpha", "en", "a"), (1, "beta", "en", "a")]
        dropped = [(1, "alpha", "en", "a")]
        chains = []
        for docs in (base, edited, reordered, dropped):
            sf = _write_docs(tmp_path_factory.mktemp("hc"), docs)
            (r,) = QUERIES["q_hash_chain"](spark, sf).collect()
            chains.append(r.chain)
        assert len(set(chains)) == 4  # all four deliveries distinguishable

    def test_fixture_chains_are_hex_and_stable(self, spark, sf_dir):
        rows1 = {r.source: r.chain for r in QUERIES["q_hash_chain"](spark, sf_dir).collect()}
        rows2 = {r.source: r.chain for r in QUERIES["q_hash_chain"](spark, sf_dir).collect()}
        assert rows1 == rows2  # rerun-stable despite shuffle order
        for c in rows1.values():
            assert len(c) == 32 and int(c, 16) >= 0
