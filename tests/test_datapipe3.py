"""Unit tests for the round-5 third-wave operators (C43-C46, B42) —
planted-input invariants beyond oracle parity: an exact duplicate
vector must sit at Hamming distance 0 and rank first; temperature
weights must sum to ~1 and order by mass while compressing the ratio;
gap-encoded postings must reconstruct the original sorted posting
list; PQ codes must be valid codebook labels with a perfectly-coded
planted centroid point at d2 == 0; and the recursive spine must cover
exactly the configured day range including zero-event days.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq
from pyspark.sql import functions as F

from cassowary_spark import registry
from cassowary_spark.registry import QUERIES

registry.load_all()


def _write_embeddings(tmp_path, vecs: list[list[float]], labels: list[int]) -> str:
    tbl = pa.table(
        {
            "vec_id": pa.array(range(len(vecs)), pa.int64()),
            "embedding": pa.array(vecs, pa.list_(pa.float32())),
            "label": pa.array(labels, pa.int32()),
        }
    )
    pq.write_table(tbl, str(tmp_path / "embeddings.parquet"))
    return str(tmp_path)


def _write_docs(tmp_path, rows: list[tuple[str, str]]) -> str:
    """rows = (text, lang)."""
    tbl = pa.table(
        {
            "doc_id": pa.array(range(1, len(rows) + 1), pa.int64()),
            "text": pa.array([r[0] for r in rows], pa.string()),
            "lang": pa.array([r[1] for r in rows], pa.string()),
            "source": pa.array(["src0"] * len(rows), pa.string()),
            "n_chars": pa.array([len(r[0]) for r in rows], pa.int64()),
        }
    )
    pq.write_table(tbl, str(tmp_path / "documents.parquet"))
    return str(tmp_path)


class TestAnnHamming:
    def test_exact_duplicate_is_distance_zero(self, spark, tmp_path):
        """A sign-identical copy of the query vector must rank first at
        Hamming 0; an all-flipped vector must sit at 64."""
        base = [(1.0 if i % 3 else -1.0) for i in range(64)]
        flipped = [-x for x in base]
        noisy = list(base)
        noisy[0], noisy[7] = -noisy[0], -noisy[7]  # 2 bits off
        vecs = [base, [x * 0.5 for x in base], flipped, noisy]
        d = _write_embeddings(tmp_path, vecs, [0, 0, 0, 0])
        rows = QUERIES["q_ann_hamming"](spark, d).collect()
        by_id = {r["vec_id"]: r["hamming"] for r in rows}
        assert by_id[1] == 0  # scaled copy: identical signs
        assert by_id[3] == 2
        assert by_id[2] == 64
        assert rows[0]["vec_id"] == 1  # distance-0 row ranks first


class TestTemperatureMix:
    def test_weights_sum_to_one_and_compress(self, spark, tmp_path):
        """Weights must sum to ~1; alpha<1 must shrink the mass ratio
        between the dominant and the rare language."""
        docs = [("tok " * 90, "en")] * 9 + [("tok " * 10, "de")]
        d = _write_docs(tmp_path, [(t.strip(), lg) for t, lg in docs])
        rows = {r["lang"]: r for r in QUERIES["q_temperature_mix"](spark, d).collect()}
        total_w = sum(r["weight"] for r in rows.values())
        assert abs(total_w - 1.0) < 1e-3
        mass_ratio = rows["en"]["n_tokens"] / rows["de"]["n_tokens"]
        weight_ratio = rows["en"]["weight"] / rows["de"]["weight"]
        assert 1.0 < weight_ratio < mass_ratio  # 0.7-temperature compresses
        assert sum(r["alloc_tokens"] for r in rows.values()) in range(999998, 1000003)


class TestPostingsDelta:
    def test_deltas_reconstruct_postings(self, spark, sf_dir):
        """Prefix-summing the gap encoding must reproduce the exact
        sorted posting list for every term."""
        rows = QUERIES["q_postings_delta"](spark, sf_dir).collect()
        assert rows
        from pyspark.sql import functions as F  # noqa: F811

        d = (
            spark.read.parquet(f"{sf_dir}/documents.parquet")
            .select("doc_id", F.explode(F.split("text", " ")).alias("term"))
            .distinct()
        )
        truth = {
            r["term"]: sorted(r["ids"])
            for r in d.groupBy("term").agg(F.collect_set("doc_id").alias("ids")).collect()
        }
        for r in rows:
            gaps = [int(t) for t in r["deltas"].split(",")]
            acc, rebuilt = 0, []
            for g in gaps:
                acc += g
                rebuilt.append(acc)
            assert rebuilt == truth[r["term"]], r["term"]
            assert r["df"] == len(rebuilt)
            # gaps after the first must be positive (strictly sorted ids)
            assert all(g > 0 for g in gaps[1:])


class TestPqEncode:
    def test_planted_centroid_distance_zero(self, spark, tmp_path):
        """With two point-clouds collapsed onto their centroids, every
        vector's code must be its own label at d2 == 0."""
        a = [1.0] * 64
        b = [-1.0] * 64
        vecs = [a, a, b, b]
        d = _write_embeddings(tmp_path, vecs, [0, 0, 1, 1])
        rows = QUERIES["q_pq_encode"](spark, d).collect()
        assert len(rows) == 4 * 4  # 4 vectors x 4 subspaces
        for r in rows:
            expected_label = 0 if r["vec_id"] in (0, 1) else 1
            assert r["code"] == expected_label
            assert r["d2"] == 0.0
            assert 0 <= r["subspace"] <= 3

    def test_codes_are_codebook_labels(self, spark, sf_dir):
        rows = QUERIES["q_pq_encode"](spark, sf_dir).collect()
        labels = {
            r["label"]
            for r in spark.read.parquet(f"{sf_dir}/embeddings.parquet")
            .select("label")
            .distinct()
            .collect()
        }
        assert {r["code"] for r in rows} <= labels
        # every vector gets exactly one code per subspace
        per_vec = {}
        for r in rows:
            per_vec.setdefault(r["vec_id"], set()).add(r["subspace"])
        assert all(s == {0, 1, 2, 3} for s in per_vec.values())


class TestRecursiveCte:
    def test_spine_covers_range_with_zero_days(self, spark, sf_dir):
        rows = QUERIES["q_recursive_cte"](spark, sf_dir).collect()
        days = sorted(r["day"] for r in rows)
        assert len(days) == 35
        assert days[0] == "2024-01-01" and days[-1] == "2024-02-04"
        # spine extends past the fixture's last event: trailing zero days
        tail = [r for r in rows if r["day"] >= "2024-01-31"]
        assert tail and all(r["n_events"] == 0 and r["n_errors"] == 0 for r in tail)
        # events land somewhere: totals match the table count
        total = sum(r["n_events"] for r in rows)
        n_events = spark.read.parquet(f"{sf_dir}/events.parquet").count()
        assert total == n_events


class TestBpeMerges:
    def test_greedy_overlap_and_ordering(self, spark, tmp_path):
        """On a corpus of 'aaab' x3 and 'cd' x1: step 1 must merge
        (a,a) counting overlaps (mass 6 > others) and apply it
        left-greedily — 'a a a b' -> 'aa a b', NOT 'a aa b' — so step
        2 sees pair (aa,a) with mass 3."""
        rows = [("aaab aaab aaab", "en"), ("cd", "en")]
        d = _write_docs(tmp_path, rows)
        out = {r["step"]: r for r in QUERIES["q_bpe_merges"](spark, d).collect()}
        s1 = out[1]
        assert (s1["left_sym"], s1["right_sym"], s1["merged"]) == ("a", "a", "aa")
        assert s1["cnt"] == 6  # 'a a a b' has TWO overlapping (a,a) x 3 words
        s2 = out[2]
        # left-greedy application: 'aa a b' => next best pair is (aa,a)
        # with mass 3 (ties with (aa, b)? no: 'aa a b' pairs = (aa,a),(a,b))
        assert (s2["left_sym"], s2["right_sym"]) == ("a", "b") or (
            s2["left_sym"],
            s2["right_sym"],
        ) == ("aa", "a")
        # whichever won step 2, its count must be 3 and step 3 exists
        assert s2["cnt"] == 3
        assert 3 in out
