"""Planted-input tests for wave 24 (C135-C137): a containment corpus
whose pair set is recomputed by a full Python shingle replication
(quote-inclusion found, sub-threshold overlap excluded), a KL fixture
with one source exactly at the corpus mix (KL = 0) and the others
hand-computed, and a step-function TWAP with known holding intervals
plus the single-event NULL guard.
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


def _write_documents(tmp_path, rows):
    """rows = [(doc_id, text, lang, source)]."""
    tbl = pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows], pa.int64()),
            "text": pa.array([r[1] for r in rows], pa.string()),
            "lang": pa.array([r[2] for r in rows], pa.string()),
            "source": pa.array([r[3] for r in rows], pa.string()),
            "n_chars": pa.array(
                [len(r[1]) for r in rows], pa.int64()
            ),
        }
    )
    pq.write_table(tbl, str(tmp_path / "documents.parquet"))
    return str(tmp_path)


def _write_events(tmp_path, rows):
    """rows = [(event_id, ts, user_id, event_type, value)]."""
    tbl = pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array([r[1] for r in rows], pa.timestamp("ns")),
            "user_id": pa.array([r[2] for r in rows], pa.int64()),
            "event_type": pa.array([r[3] for r in rows], pa.string()),
            "value": pa.array([float(r[4]) for r in rows], pa.float64()),
            "props": pa.array(["{}"] * len(rows), pa.string()),
        }
    )
    pq.write_table(tbl, str(tmp_path / "events.parquet"))
    return str(tmp_path)


def _shingles(text, k=3):
    toks = text.split(" ")
    n = max(len(toks) - k + 1, 1)
    return {" ".join(toks[i: i + k]) for i in range(n)}


class TestShingleContainment:
    def test_quote_inclusion_and_python_replication(self, spark, tmp_path):
        """doc2 fully quotes doc1 (containment 1.0 reported); doc3
        overlaps doc1 below threshold (excluded). The full expected
        pair set — including every auto-generated twin pair — is
        recomputed by a Python shingle replication."""
        rows = [
            (1, "a b c d e f", "en", "src0"),
            (2, "a b c d e f x y z", "en", "src0"),
            (3, "a b c d q r s t u v", "en", "src0"),
        ]
        sf = _write_documents(tmp_path, rows)
        out = {
            (r["contained_id"], r["container_id"]): r["containment"]
            for r in QUERIES["q_shingle_containment"](spark, sf).collect()
        }

        corpus = {i: t for i, t, _, _ in rows}
        corpus.update(
            {i + 1000000: t + " qq17 zz93 vv41" for i, t, _, _ in rows}
        )
        sets = {i: _shingles(t) for i, t in corpus.items()}
        exp = {}
        ids = sorted(sets)
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                a, b = ids[i], ids[j]
                inter = len(sets[a] & sets[b])
                if inter == 0:
                    continue
                small, big = (
                    (a, b)
                    if (len(sets[a]), a) < (len(sets[b]), b)
                    else (b, a)
                )
                c = inter / min(len(sets[a]), len(sets[b]))
                if c >= 0.9:
                    exp[(small, big)] = _srnd(c, 6)
        assert out == exp
        assert out[(1, 2)] == 1.0  # the quote-inclusion pair
        assert (1, 1000001) in out  # twin containment
        assert all(k != (1, 3) and k != (3, 1) for k in out)


class TestKlDivergence:
    def test_matching_source_zero_and_hand_computed(self, spark, tmp_path):
        """Corpus mix is 50/50 en/de. srcC is exactly 50/50 -> KL = 0;
        srcA (30/10) and srcB (10/30) match the hand-computed sum of
        srnd8 terms."""
        rows = []
        did = 0
        for src, en, de in (("srcA", 30, 10), ("srcB", 10, 30),
                            ("srcC", 20, 20)):
            for lang, cnt in (("en", en), ("de", de)):
                for _ in range(cnt):
                    did += 1
                    rows.append((did, f"w{did} x y", lang, src))
        sf = _write_documents(tmp_path, rows)
        out = {
            r["source"]: r
            for r in QUERIES["q_kl_divergence"](spark, sf).collect()
        }
        assert out["srcC"]["kl_nats"] == 0.0
        N = 120.0
        for src, en, de in (("srcA", 30, 10), ("srcB", 10, 30)):
            cs = float(en + de)
            terms = 0.0
            for c, cl in ((en, 60.0), (de, 60.0)):
                terms += _srnd(
                    c / cs * math.log(c * N / (cs * cl)), 8
                )
            assert out[src]["n_docs"] == 40
            assert out[src]["kl_nats"] == _srnd(terms, 6), src


class TestTimeWeightedAvg:
    def test_step_function_and_single_event_guard(self, spark, tmp_path):
        """User 1 holds value 10 for 10s then 20 for 30s (the final
        event carries no weight): TWAP = (10*10 + 20*30)/40 = 17.5,
        regardless of the last value. User 2 has one event -> NULL."""
        t0 = dt.datetime(2024, 1, 5, 12, 0, 0)
        rows = [
            (1, t0, 1, "view", 10.0),
            (2, t0 + dt.timedelta(seconds=10), 1, "view", 20.0),
            (3, t0 + dt.timedelta(seconds=40), 1, "view", 999.0),
            (4, t0, 2, "view", 55.0),
        ]
        sf = _write_events(tmp_path, rows)
        out = {
            r["user_id"]: r
            for r in QUERIES["q_time_weighted_avg"](spark, sf).collect()
        }
        assert out[1]["n_events"] == 3
        assert out[1]["twap"] == 17.5
        assert out[2]["n_events"] == 1
        assert out[2]["twap"] is None
