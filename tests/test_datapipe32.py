"""Planted gates for wave 34: q_freq_itemsets (C155), q_dp_counts
(C156), q_embedding_drift (C157)."""

from __future__ import annotations

import hashlib
import math

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from cassowary_spark import registry
from cassowary_spark.registry import QUERIES

registry.load_all()


# ------------------------------------------------------- C155 fixtures


def _write_baskets(tmp_path, baskets):
    """baskets = {orderkey: [brand, ...]}; one part per brand."""
    brands = sorted({b for items in baskets.values() for b in items})
    part = pa.table(
        {
            "p_partkey": pa.array(range(1, len(brands) + 1), pa.int64()),
            "p_brand": pa.array(brands, pa.string()),
        }
    )
    pkey = {b: i + 1 for i, b in enumerate(brands)}
    oks, pks = [], []
    for ok, items in baskets.items():
        for b in items:
            oks.append(ok)
            pks.append(pkey[b])
    li = pa.table(
        {
            "l_orderkey": pa.array(oks, pa.int64()),
            "l_partkey": pa.array(pks, pa.int64()),
        }
    )
    pq.write_table(part, str(tmp_path / "part.parquet"))
    pq.write_table(li, str(tmp_path / "lineitem.parquet"))
    return str(tmp_path)


class TestFreqItemsets:
    def test_hand_counts_ranks_and_tiebreak(self, spark, tmp_path):
        baskets = {o: ["BrandA", "BrandB", "BrandC"] for o in range(1, 7)}
        baskets.update({7: ["BrandA", "BrandB"], 8: ["BrandA", "BrandB"]})
        baskets.update({9: ["BrandA", "BrandD"], 10: ["BrandA", "BrandD"]})
        sf = _write_baskets(tmp_path, baskets)
        rows = QUERIES["q_freq_itemsets"](spark, sf).collect()
        by = {(r.k, r.items): r for r in rows}
        assert by[(2, "BrandA,BrandB")].n_baskets == 8
        assert by[(2, "BrandA,BrandB")].rnk == 1
        assert by[(2, "BrandA,BrandB")].support == pytest.approx(0.8)
        # tie at 6: lexicographically smaller items string ranks first
        assert by[(2, "BrandA,BrandC")].n_baskets == 6
        assert by[(2, "BrandB,BrandC")].n_baskets == 6
        assert by[(2, "BrandA,BrandC")].rnk < by[(2, "BrandB,BrandC")].rnk
        assert by[(3, "BrandA,BrandB,BrandC")].n_baskets == 6
        assert by[(3, "BrandA,BrandB,BrandC")].rnk == 1
        # no phantom itemsets: only co-resident combinations appear
        assert (2, "BrandC,BrandD") not in by
        assert (2, "BrandB,BrandD") not in by
        triples = [r for r in rows if r.k == 3]
        assert {r.items for r in triples} == {"BrandA,BrandB,BrandC"}

    def test_monotonicity_on_fixture(self, spark, sf_dir):
        """Every emitted triple's support must be <= each of its pair
        subsets' supports (A-priori monotonicity on real data). Pairs
        outside the top-k window are re-derived from the triple itself
        being a lower bound — so just check against emitted pairs when
        present."""
        rows = QUERIES["q_freq_itemsets"](spark, sf_dir).collect()
        pair_n = {r.items: r.n_baskets for r in rows if r.k == 2}
        for r in rows:
            if r.k != 3:
                continue
            a, b, c = r.items.split(",")
            for sub in (f"{a},{b}", f"{a},{c}", f"{b},{c}"):
                if sub in pair_n:
                    assert r.n_baskets <= pair_n[sub], (r.items, sub)


# ------------------------------------------------------- C156 DP counts


def _dp_noise_ref(key: str) -> int:
    from cassowary_spark.queries.datapipe32 import _DP_K, _DP_TS

    u32 = int(hashlib.md5(key.encode()).hexdigest()[:8], 16)
    return -_DP_K + sum(1 for t in _DP_TS if u32 >= t)


class TestDpCounts:
    def test_noise_matches_python_reference_and_dp_n(self, spark, sf_dir, duck):
        rows = QUERIES["q_dp_counts"](spark, sf_dir).collect()
        assert rows
        true_n = {
            (lang, src): n
            for lang, src, n in duck.execute(
                "SELECT lang, source, count(*) FROM documents GROUP BY 1, 2"
            ).fetchall()
        }
        from cassowary_spark.queries.datapipe32 import _DP_K

        for r in rows:
            expect = _dp_noise_ref(f"{r.lang}|{r.source}")
            assert r.noise == expect, (r.lang, r.source)
            assert abs(r.noise) <= _DP_K
            assert r.dp_n == true_n[(r.lang, r.source)] + r.noise

    def test_null_key_parity_with_oracle(self, spark, tmp_path):
        """A NULL lang/source must hash identically on both engines:
        Spark F.concat NULL-propagates like DuckDB's ||, so u32 is
        NULL and noise clamps to -K on BOTH sides (ADVICE r8 — the
        old concat_ws silently skipped NULLs and diverged)."""
        import duckdb as _duck

        from cassowary_spark.queries.datapipe32 import _DP_K
        from cassowary_spark.registry import ORACLES

        doc = pa.table(
            {
                "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
                "lang": pa.array(["en", None, "en", None], pa.string()),
                "source": pa.array(["web", "web", "web", None], pa.string()),
            }
        )
        pq.write_table(doc, str(tmp_path / "documents.parquet"))
        nkey = lambda t: (t[0] or "", t[1] or "", t[2], t[3])  # noqa: E731
        srows = sorted(
            (
                (r.lang, r.source, r.noise, r.dp_n)
                for r in QUERIES["q_dp_counts"](spark, str(tmp_path)).collect()
            ),
            key=nkey,
        )
        con = _duck.connect()
        con.execute(
            "CREATE VIEW documents AS SELECT * FROM "
            f"read_parquet('{tmp_path}/documents.parquet')"
        )
        orows = sorted(
            (tuple(t) for t in con.execute(ORACLES["q_dp_counts"]).fetchall()),
            key=nkey,
        )
        assert srows == orows
        null_groups = [r for r in srows if r[0] is None or r[1] is None]
        assert null_groups and all(r[2] == -_DP_K for r in null_groups)

    def test_staircase_is_monotone_and_covers_tails(self):
        from cassowary_spark.queries.datapipe32 import _DP_K, _DP_TS

        assert _DP_TS == sorted(_DP_TS)
        assert len(_DP_TS) == 2 * _DP_K
        # tail thresholds are inside [0, 2^32): extreme u32 values
        # clamp to -K / +K without wrapping
        assert _DP_TS[0] >= 0 and _DP_TS[-1] < 2**32
        # the central step (k=-1 -> 0) is the widest: P(K=0) is the mode
        widths = [b - a for a, b in zip(_DP_TS, _DP_TS[1:])]
        assert max(widths) == widths[_DP_K - 1]

    def test_noise_distribution_mean_near_zero(self):
        """Over many synthetic keys the hash-seeded noise must look
        like the mechanism: mean ~ 0, spread ~ sqrt(2 alpha)/(1-alpha)
        (~1.2 for eps=1). Loose 3-sigma bounds."""
        ns = [_dp_noise_ref(f"probe-{i}") for i in range(2000)]
        mean = sum(ns) / len(ns)
        var = sum((x - mean) ** 2 for x in ns) / len(ns)
        alpha = math.exp(-1.0)
        true_var = 2 * alpha / (1 - alpha) ** 2
        assert abs(mean) < 3 * math.sqrt(true_var / len(ns)) + 0.05
        assert 0.5 * true_var < var < 1.5 * true_var


# ------------------------------------------------------- C157 drift


def _write_corpus(tmp_path, vecs):
    """vecs = [(vec_id, [floats], source)] -> embeddings + documents."""
    emb = pa.table(
        {
            "vec_id": pa.array([v[0] for v in vecs], pa.int64()),
            "embedding": pa.array(
                [v[1] for v in vecs], pa.list_(pa.float32())
            ),
        }
    )
    doc = pa.table(
        {
            "doc_id": pa.array([v[0] for v in vecs], pa.int64()),
            "source": pa.array([v[2] for v in vecs], pa.string()),
        }
    )
    pq.write_table(emb, str(tmp_path / "embeddings.parquet"))
    pq.write_table(doc, str(tmp_path / "documents.parquet"))
    return str(tmp_path)


class TestEmbeddingDrift:
    def test_orthogonal_sources_hand_math(self, spark, tmp_path):
        dim = 8
        e1 = [1.0] + [0.0] * (dim - 1)
        e2 = [0.0, 1.0] + [0.0] * (dim - 2)
        vecs = [(i, e1, "s1") for i in range(4)] + [
            (i + 4, e2, "s2") for i in range(4)
        ]
        sf = _write_corpus(tmp_path, vecs)
        out = {r.source: r for r in QUERIES["q_embedding_drift"](spark, sf).collect()}
        assert set(out) == {"s1", "s2"}
        # global centroid = [.5, .5, 0...]; cos(e_i, g) = .5/sqrt(.5)
        expect_cos = 0.5 / math.sqrt(0.5)
        for s in ("s1", "s2"):
            assert out[s].n_vecs == 4
            assert out[s].cos_sim == pytest.approx(expect_cos, abs=1e-6)
            assert out[s].drift == pytest.approx(1 - expect_cos, abs=1e-6)

    def test_single_source_has_zero_drift(self, spark, tmp_path):
        vecs = [(i, [0.5, -0.25, 0.125, 1.0], "only") for i in range(3)]
        sf = _write_corpus(tmp_path, vecs)
        (r,) = QUERIES["q_embedding_drift"](spark, sf).collect()
        assert r.source == "only"
        assert r.cos_sim == pytest.approx(1.0, abs=1e-6)
        assert r.drift == pytest.approx(0.0, abs=1e-6)

    def test_fixture_bounds(self, spark, sf_dir):
        rows = QUERIES["q_embedding_drift"](spark, sf_dir).collect()
        assert rows
        for r in rows:
            assert r.cos_sim is None or -1.0 - 1e-9 <= r.cos_sim <= 1.0 + 1e-9
            assert r.drift is None or 0.0 - 1e-9 <= r.drift <= 2.0 + 1e-9
