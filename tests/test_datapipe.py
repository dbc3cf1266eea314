"""Unit tests for the round-5 data-pipeline operators — invariants the
oracle parity check can't express (sketch over-estimation, plan
packing bounds, chunk coverage, layout locality).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cassowary_spark.operators.sketch import cms_build, cms_estimate
from cassowary_spark.queries import datapipe
from cassowary_spark.registry import QUERIES


def test_cms_never_undercounts(spark):
    """The heavy-hitter prefilter is only sound if est >= exact count
    for EVERY term — check the whole vocabulary, not a sample."""
    tok = spark.createDataFrame(
        [(w,) for w in "a b a c a b d e a b c".split()], ["term"]
    )
    sketch = cms_build(tok, "term")
    est = cms_estimate(tok.select("term").distinct(), sketch, "term")
    exact = tok.groupBy("term").agg(F.count("*").alias("cnt"))
    joined = est.join(exact, "term").collect()
    assert len(joined) == 5
    for r in joined:
        assert r["est"] >= r["cnt"], f"undercount for {r['term']}"


def test_cms_exact_when_no_collisions(spark):
    """With vocab << width the min-of-rows estimate is exact."""
    tok = spark.createDataFrame([("x",)] * 7 + [("y",)] * 3, ["term"])
    sketch = cms_build(tok, "term")
    est = {
        r["term"]: r["est"]
        for r in cms_estimate(
            tok.select("term").distinct(), sketch, "term"
        ).collect()
    }
    assert est == {"x": 7, "y": 3}


def test_compaction_plan_packing_bounds(spark, sf_dir):
    """Every output file except possibly a partition's last must have
    reached the target once its final fragment is added (no premature
    splits), and files are dense 0..max per partition."""
    rows = QUERIES["q_compaction_plan"](spark, sf_dir).collect()
    by_part: dict[str, list] = {}
    for r in rows:
        by_part.setdefault(r["source"], []).append(r)
    target = datapipe._COMPACT_TARGET
    for source, frags in by_part.items():
        frags.sort(key=lambda r: r["doc_id"])
        # re-derive the plan: each fragment's file is its start offset
        # divided by the target
        offset = 0
        seen_files = set()
        for r in frags:
            assert r["out_file"] == offset // target, f"{source}/{r['doc_id']}"
            seen_files.add(r["out_file"])
            offset += r["n_chars"]
        # file ids are dense 0..max (no empty output files)
        assert sorted(seen_files) == list(range(len(seen_files)))


def test_doc_chunks_cover_and_overlap(spark, sf_dir):
    """Chunks reconstruct the document: chunk 0 starts at token 0,
    consecutive chunks overlap by size-stride tokens, and the union of
    chunk tokens equals the document's tokens."""
    docs = {
        r["doc_id"]: r["text"].split(" ")
        for r in spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", "text")
        .limit(20)
        .collect()
    }
    chunks = (
        QUERIES["q_doc_chunks"](spark, sf_dir)
        .filter(F.col("doc_id").isin(list(docs)))
        .collect()
    )
    size, stride = datapipe._CHUNK_SIZE, datapipe._CHUNK_STRIDE
    by_doc: dict[int, dict[int, list[str]]] = {}
    for r in chunks:
        by_doc.setdefault(r["doc_id"], {})[r["chunk_id"]] = r["chunk_text"].split(" ")
        assert r["n_tok"] == len(r["chunk_text"].split(" "))
    for doc_id, toks in docs.items():
        got = by_doc[doc_id]
        n_expected = 1 if len(toks) <= size else -(-(len(toks) - size) // stride) + 1
        assert sorted(got) == list(range(n_expected))
        for cid, ctoks in got.items():
            assert ctoks == toks[cid * stride : cid * stride + size]
        # final chunk reaches the end of the document
        last = max(got)
        assert last * stride + len(got[last]) == len(toks)


def test_doc_chunks_short_and_boundary_docs(spark, tmp_path):
    """Run the REAL query against a tiny fixture: a doc shorter than
    one chunk yields exactly one full-doc chunk; a doc of exactly
    chunk_size+1 tokens yields two (the second carrying the overlap
    plus the one overflow token)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    size, stride = datapipe._CHUNK_SIZE, datapipe._CHUNK_STRIDE
    short = "only three tokens"
    boundary = " ".join(f"t{i}" for i in range(size + 1))
    pq.write_table(
        pa.table(
            {
                "doc_id": [1, 2],
                "text": [short, boundary],
                "lang": ["en", "en"],
                "source": ["src0", "src0"],
                "n_chars": [len(short), len(boundary)],
            }
        ),
        str(tmp_path / "documents.parquet"),
    )
    rows = QUERIES["q_doc_chunks"](spark, str(tmp_path)).collect()
    by_doc: dict[int, dict[int, str]] = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], {})[r["chunk_id"]] = r["chunk_text"]
    assert by_doc[1] == {0: short}
    assert sorted(by_doc[2]) == [0, 1]
    assert by_doc[2][0] == " ".join(boundary.split()[:size])
    assert by_doc[2][1] == " ".join(boundary.split()[stride : stride + size])


def test_zorder_groups_both_dimensions(spark, sf_dir):
    """Z-order's point: per-file ranges on BOTH dims are much tighter
    than random assignment. Check every file's n_chars span is bounded
    well below the global span (the pruning win), and zfile ids are a
    dense partition of the rank order."""
    rows = QUERIES["q_zorder_layout"](spark, sf_dir).collect()
    files: dict[int, list] = {}
    for r in rows:
        files.setdefault(r["zfile"], []).append(r)
    n = len(rows)
    assert sorted(files) == list(range((n + datapipe._Z_FILE_ROWS - 1) // datapipe._Z_FILE_ROWS))
    glo = max(r["n_chars"] for r in rows) - min(r["n_chars"] for r in rows)
    spans = []
    for rs in files.values():
        if len(rs) == datapipe._Z_FILE_ROWS:  # skip the ragged tail file
            spans.append(max(x["n_chars"] for x in rs) - min(x["n_chars"] for x in rs))
    # average full-file span must be tighter than the global span;
    # Morton interleave clusters both dims, so this holds with slack
    assert spans and sum(spans) / len(spans) < glo


def test_corpus_mix_rates(spark, sf_dir):
    """Mixing keeps tier-0 sources complete and downsamples later
    tiers monotonically; the kept set is identical across two runs
    (hash determinism, no RNG)."""
    out1 = QUERIES["q_corpus_mix"](spark, sf_dir)
    kept1 = {(r["doc_id"], r["source"]) for r in out1.collect()}
    kept2 = {(r["doc_id"], r["source"]) for r in out1.collect()}
    assert kept1 == kept2
    total = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .groupBy("source")
        .count()
        .collect()
    )
    totals = {r["source"]: r["count"] for r in total}
    kept_by_source: dict[str, int] = {}
    for _, s in kept1:
        kept_by_source[s] = kept_by_source.get(s, 0) + 1
    for s, tot in totals.items():
        sfx = int(s[3:])
        if sfx < 5:
            assert kept_by_source.get(s, 0) == tot, "tier-0 must keep all"


def test_heavy_hitters_matches_exact(spark, sf_dir):
    """The sketch-prefiltered two-pass result equals the exact HAVING
    scan (no false negatives survive, no impostors leak)."""
    got = {
        (r["term"], r["cnt"])
        for r in QUERIES["q_heavy_hitters"](spark, sf_dir).collect()
    }
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    tok = d.select(F.explode(F.split("text", " ")).alias("term"))
    tot = tok.count()
    exact = {
        (r["term"], r["count"])
        for r in tok.groupBy("term").count().collect()
        if r["count"] * 30 >= tot
    }
    assert got == exact


# ---------------------------------------------------------- property tests


def test_cms_never_undercounts_random_streams(spark):
    """Randomized CMS soundness: for arbitrary token streams (heavy
    skew, unicode, empties) every estimate >= the exact count."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    @settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
    @given(
        st.lists(
            st.text(alphabet="abcdef☃", min_size=0, max_size=4),
            min_size=1,
            max_size=120,
        )
    )
    def check(words):
        tok = spark.createDataFrame([(w,) for w in words], ["term"])
        sketch = cms_build(tok, "term", depth=2, width=16)  # force collisions
        est = {
            r["term"]: r["est"]
            for r in cms_estimate(
                tok.select("term").distinct(), sketch, "term", depth=2, width=16
            ).collect()
        }
        exact: dict[str, int] = {}
        for w in words:
            exact[w] = exact.get(w, 0) + 1
        for w, c in exact.items():
            assert est[w] >= c

    check()


def test_zorder_interleave_roundtrip_property():
    """The Morton expression (evaluated by DuckDB, same text Spark
    runs) must deinterleave back to its inputs for arbitrary 16-bit
    pairs, and be distinct for distinct pairs."""
    import duckdb
    from hypothesis import given, settings
    from hypothesis import strategies as st

    con = duckdb.connect()

    @settings(max_examples=60, deadline=None)
    @given(st.integers(0, 65535), st.integers(0, 65535))
    def check(a, b):
        expr = datapipe._z_interleave_sql(str(a), str(b))
        (z,) = con.execute(f"SELECT {expr}").fetchone()
        da = sum(((z >> (2 * i)) & 1) << i for i in range(16))
        db = sum(((z >> (2 * i + 1)) & 1) << i for i in range(16))
        assert (da, db) == (a, b)

    check()
