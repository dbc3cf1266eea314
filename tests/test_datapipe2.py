"""Unit tests for the round-5 second-wave operators (C35-C39) —
planted-input behaviors the fixture-wide oracle parity check can't
express: a copied span must be detected at a shifted alignment, an
obvious cluster point must route to its own centroid, each quality
rule must fire on a doc violating exactly that rule, a planted outlier
must be flagged (and degenerate groups excluded), and PageRank's total
mass must be conserved up to floor loss.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from cassowary_spark import registry
from cassowary_spark.registry import QUERIES

registry.load_all()


def _write_docs(tmp_path, texts: list[str]) -> str:
    tbl = pa.table(
        {
            "doc_id": pa.array(range(1, len(texts) + 1), pa.int64()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(["en"] * len(texts), pa.string()),
            "source": pa.array(["src0"] * len(texts), pa.string()),
            "n_chars": pa.array([len(t) for t in texts], pa.int64()),
        }
    )
    pq.write_table(tbl, str(tmp_path / "documents.parquet"))
    return str(tmp_path)


def _write_events(tmp_path, rows: list[tuple[int, int, float]]) -> str:
    """rows = (event_id, user_id, value)."""
    tbl = pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array([0] * len(rows), pa.timestamp("us")),
            "user_id": pa.array([r[1] for r in rows], pa.int64()),
            "event_type": pa.array(["click"] * len(rows), pa.string()),
            "value": pa.array([r[2] for r in rows], pa.float64()),
            "props": pa.array(["{}"] * len(rows), pa.string()),
        }
    )
    pq.write_table(tbl, str(tmp_path / "events.parquet"))
    return str(tmp_path)


def _write_embeddings(tmp_path, vecs: list[tuple[int, list[float], str]]) -> str:
    tbl = pa.table(
        {
            "vec_id": pa.array([v[0] for v in vecs], pa.int64()),
            "embedding": pa.array(
                [v[1] for v in vecs], pa.list_(pa.float32())
            ),
            "label": pa.array([v[2] for v in vecs], pa.string()),
        }
    )
    pq.write_table(tbl, str(tmp_path / "embeddings.parquet"))
    return str(tmp_path)


# ------------------------------------------------------- C35 substring dedup


def test_substring_dedup_detects_shifted_copy(spark, tmp_path):
    """Doc 2 embeds an 8-token span of doc 1 at a DIFFERENT offset —
    the alignment-free case line-level dedup (C18) cannot catch."""
    span = "q w e r t y u i"  # 8 tokens
    docs = [
        f"{span} tail1 tail2 tail3",          # span at offset 0
        f"lead1 lead2 lead3 {span} end",      # same span at offset 3
        "totally different words here with no overlap at all",
    ]
    out = {
        r["doc_id"]: r
        for r in QUERIES["q_substring_dedup"](
            spark, _write_docs(tmp_path, docs)
        ).collect()
    }
    assert out[1]["n_dup_span"] >= 1
    assert out[2]["n_dup_span"] >= 1
    assert out[3]["n_dup_span"] == 0
    for r in out.values():
        assert 0 <= r["n_dup_span"] <= r["n_span"]


def test_substring_dedup_span_count(spark, tmp_path):
    """A doc of n tokens has exactly n-7 sliding spans; docs under 8
    tokens are excluded."""
    docs = ["t1 t2 t3 t4 t5 t6 t7 t8 t9 t10", "short doc"]
    rows = QUERIES["q_substring_dedup"](
        spark, _write_docs(tmp_path, docs)
    ).collect()
    assert len(rows) == 1
    assert rows[0]["n_span"] == 3  # 10 - 8 + 1


# ------------------------------------------------------ C36 centroid assign


def test_centroid_assign_routes_to_own_cluster(spark, tmp_path):
    """Two well-separated 4-dim clusters: every vector must be
    assigned to the centroid of its own label, with small d2."""
    a = [(i, [1.0 + 0.01 * i, 1.0, 0.0, 0.0], "A") for i in range(5)]
    b = [(i + 10, [0.0, 0.0, 9.0, 9.0 - 0.01 * i], "B") for i in range(5)]
    out = {
        r["vec_id"]: r
        for r in QUERIES["q_centroid_assign"](
            spark, _write_embeddings(tmp_path, a + b)
        ).collect()
    }
    assert len(out) == 10
    for i in range(5):
        assert out[i]["label_assigned"] == "A"
        assert out[i + 10]["label_assigned"] == "B"
        assert out[i]["d2"] < 1.0
        assert out[i + 10]["d2"] < 1.0


def test_centroid_assign_is_argmin(spark, sf_dir):
    """On the real fixture: the assigned distance must be <= the
    distance to every OTHER label centroid (recomputed in numpy)."""
    import numpy as np

    from cassowary_spark.tables import load_table

    assigned = {
        r["vec_id"]: (r["label_assigned"], r["d2"])
        for r in QUERIES["q_centroid_assign"](spark, sf_dir).collect()
    }
    rows = load_table(spark, sf_dir, "embeddings").collect()
    by_label: dict[str, list] = {}
    for r in rows:
        by_label.setdefault(r["label"], []).append(r["embedding"])
    cents = {
        lab: np.floor(np.mean(np.array(v, dtype=np.float64), axis=0) * 1e4 + 0.5)
        / 1e4
        for lab, v in by_label.items()
    }
    for r in rows[:50]:
        v = np.array(r["embedding"], dtype=np.float64)
        d2s = {lab: float(((v - c) ** 2).sum()) for lab, c in cents.items()}
        best = min(d2s.items(), key=lambda kv: (kv[1], kv[0]))
        lab, d2 = assigned[r["vec_id"]]
        assert lab == best[0]
        assert d2 == pytest.approx(best[1], abs=1e-5)


# ----------------------------------------------------- C37 quality gauntlet


def test_quality_gauntlet_rules_fire_individually(spark, tmp_path):
    filler = " ".join(["the"] + ["word"] * 29)  # 30 words, has stopword
    docs = [
        filler,                                   # passes all rules
        "the " + " ".join(["w"] * 29),            # mean word len < 3
        "too short the",                          # under word minimum
        " ".join(["verylongword"] * 30),          # no stopword + wordlen>8
    ]
    out = {
        r["doc_id"]: r
        for r in QUERIES["q_quality_gauntlet"](
            spark, _write_docs(tmp_path, docs)
        ).collect()
    }
    assert out[1]["passed"] == 1
    assert out[2]["r_wordlen"] == 0 and out[2]["passed"] == 0
    assert out[3]["r_len"] == 0 and out[3]["passed"] == 0
    assert out[4]["r_stop"] == 0 and out[4]["passed"] == 0
    for r in out.values():
        assert r["passed"] == (
            r["r_len"] and r["r_wordlen"] and r["r_stop"]
        )


# ------------------------------------------------------ C38 value outliers


def test_value_outliers_flags_planted_spike(spark, tmp_path):
    rows = [(i, 1, 10.0 + (i % 3)) for i in range(20)] + [(99, 1, 1000.0)]
    # user 2: constant values — zero variance, must be excluded
    rows += [(200 + i, 2, 5.0) for i in range(5)]
    # user 3: single event — n < 2, must be excluded
    rows += [(300, 3, 7.0)]
    out = QUERIES["q_value_outliers"](
        spark, _write_events(tmp_path, rows)
    ).collect()
    assert [r["event_id"] for r in out] == [99]
    assert abs(out[0]["z"]) > 2.5


# ------------------------------------------------------- C39 PageRank


def test_pagerank_conserves_mass_and_ranks_hubs(spark, sf_dir):
    from cassowary_spark.queries.datapipe2 import _PR_ITERS, _PR_SCALE
    from cassowary_spark.tables import load_table

    rows = QUERIES["q_graph_pagerank"](spark, sf_dir).collect()
    ranks = {r["node"]: r["rank"] for r in rows}
    assert all(v > 0 for v in ranks.values())

    ev = load_table(spark, sf_dir, "events")
    n_users = ev.select("user_id").distinct().count()
    n_types = ev.select("event_type").distinct().count()
    n_edges = 2 * ev.select("user_id", "event_type").distinct().count()
    assert len(ranks) == n_users + n_types

    # floor-division mass loss: < 1 unit per node (teleport term) plus
    # < 1 per edge (contribution), per iteration
    total = sum(ranks.values())
    n = len(ranks)
    assert total <= _PR_SCALE
    assert total >= _PR_SCALE - _PR_ITERS * (n + n_edges) - n

    # event-type hubs aggregate mass from ~all users: every type node
    # must outrank every user node
    type_ranks = [v for k, v in ranks.items() if k.startswith("t:")]
    user_ranks = [v for k, v in ranks.items() if k.startswith("u:")]
    assert min(type_ranks) > max(user_ranks)


# ------------------------------------------------------- C40 BPE pairs


def test_bpe_pairs_weighted_and_thresholded(spark, tmp_path):
    """'ab' repeated 50x clears the min-count via word frequency
    weighting; a once-seen pair is cut; overlaps count ('aaa' -> 2x
    'aa' per occurrence)."""
    docs = [" ".join(["ab"] * 30), " ".join(["ab"] * 20), "xy " + "aaa " * 25]
    out = {
        r["pair"]: r["cnt"]
        for r in QUERIES["q_bpe_pairs"](
            spark, _write_docs(tmp_path, docs)
        ).collect()
    }
    assert out["ab"] == 50
    assert out["aa"] == 50  # 25 occurrences of 'aaa', 2 overlapping pairs each
    assert "xy" not in out  # freq 1 < min count


# ------------------------------------------------------- C41 length band


def test_length_band_cuts_both_tails(spark, tmp_path):
    """n_chars = 10,20,...,200: P5 = 19.5, P95 = 190.5 by linear
    interpolation, so exactly 20..190 survive."""
    docs = ["x" * (10 * i) for i in range(1, 21)]
    rows = QUERIES["q_length_band"](
        spark, _write_docs(tmp_path, docs)
    ).collect()
    kept = sorted(r["n_chars"] for r in rows)
    assert kept == list(range(20, 191, 10))


# ------------------------------------------------------- C42 matryoshka


def test_matryoshka_truncates_and_renormalizes(spark, tmp_path):
    import math

    vecs = [
        (1, [3.0, 4.0] + [0.0] * 30, "A"),      # norm16 = 5 on first 16 dims
        (2, [0.0] * 32, "B"),                    # zero prefix: excluded
        (3, [1.0] * 32, "C"),                    # norm16 = 4
    ]
    out = {
        r["vec_id"]: r
        for r in QUERIES["q_matryoshka"](
            spark, _write_embeddings(tmp_path, vecs)
        ).collect()
    }
    assert set(out) == {1, 3}
    # vec16 ships as comma-joined int64 micro-units (driver-safe
    # atomic encoding); parse back to doubles for the math checks
    vec = {k: [int(t) / 1e6 for t in r["vec16"].split(",")] for k, r in out.items()}
    assert out[1]["norm16"] == pytest.approx(5.0)
    assert vec[1][:2] == [0.6, 0.8]
    assert len(vec[1]) == 16
    assert out[3]["norm16"] == pytest.approx(4.0)
    for v in vec.values():
        unit = sum(x * x for x in v)
        assert unit == pytest.approx(1.0, abs=1e-4)
    assert math.isclose(sum(vec[3]), 4.0, rel_tol=1e-4)
