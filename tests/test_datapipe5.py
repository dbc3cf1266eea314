"""Planted-truth tests for the dataset-assembly wave (q_dataset_split,
q_shard_export, q_split_leakage) — properties oracle parity can't pin
down: the split must be a deterministic partition of the corpus, the
shard manifest must cover it exactly, and the leakage screen must
flag every twin whose source landed in train (known ground truth,
computable with hashlib's md5 — the same function both engines use).
"""

from __future__ import annotations

import hashlib
import os

import pyarrow.compute as pc
import pyarrow.parquet as pq

from cassowary_spark import registry
from cassowary_spark.queries.llm import TWIN_OFFSET
from cassowary_spark.registry import QUERIES

registry.load_all()

SF = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


def _split_of(doc_id: int) -> str:
    h2 = hashlib.md5(str(doc_id).encode()).hexdigest()[:2]
    if h2 < "0d":
        return "test"
    if h2 < "1a":
        return "valid"
    return "train"


def _doc_ids():
    return pq.read_table(f"{SF}/documents.parquet", columns=["doc_id"])[
        "doc_id"
    ].to_pylist()


def test_dataset_split_partitions_corpus(spark):
    rows = QUERIES["q_dataset_split"](spark, SF).collect()
    ids = _doc_ids()
    assert sum(r["n_docs"] for r in rows) == len(ids)
    # each (split, lang) count matches an independent python recount
    splits = {r["split"] for r in rows}
    assert splits <= {"train", "valid", "test"}
    got_test = sum(r["n_docs"] for r in rows if r["split"] == "test")
    assert got_test == sum(1 for i in ids if _split_of(i) == "test")


def test_dataset_split_is_append_stable(spark, tmp_path):
    """A document's split never depends on the rest of the corpus —
    the property that makes hash splits safe under corpus growth.
    Recompute the split on a HALVED corpus and assert the per-
    (split, lang) composition equals the full-corpus assignment
    restricted to the surviving ids — a row_number()- or RNG-seeded
    split would reshuffle and disagree."""
    full = pq.read_table(f"{SF}/documents.parquet")
    ids = full["doc_id"].to_pylist()
    cutoff = sorted(ids)[len(ids) // 2]
    subset = full.filter(pc.less(full["doc_id"], cutoff))
    sub_dir = tmp_path / "subset_sf"
    sub_dir.mkdir()
    pq.write_table(subset, str(sub_dir / "documents.parquet"))
    got = {
        (r["split"], r["lang"]): r["n_docs"]
        for r in QUERIES["q_dataset_split"](spark, str(sub_dir)).collect()
    }
    expected: dict[tuple[str, str], int] = {}
    for i, lang in zip(
        subset["doc_id"].to_pylist(), subset["lang"].to_pylist()
    ):
        key = (_split_of(i), lang)
        expected[key] = expected.get(key, 0) + 1
    assert got == expected


def test_shard_export_manifest_covers_corpus(spark):
    rows = QUERIES["q_shard_export"](spark, SF).collect()
    ids = _doc_ids()
    assert sum(r["n_docs"] for r in rows) == len(ids)
    assert {r["shard_id"] for r in rows} <= set("0123456789abcdef")
    # first/last are the arg-min/arg-max of the salted order key
    by_shard: dict[str, list[tuple[str, int]]] = {}
    for i in ids:
        okey = hashlib.md5(f"shard:{i}".encode()).hexdigest()
        by_shard.setdefault(okey[0], []).append((okey, i))
    for r in rows:
        members = sorted(by_shard[r["shard_id"]])
        assert r["first_doc"] == members[0][1]
        assert r["last_doc"] == members[-1][1]


def test_split_leakage_flags_planted_twins(spark):
    """Every test-split doc whose twin (or source) sits in train
    shares its interior shingles with a train doc, so the screen must
    report a leak count at least that large per language."""
    docs = pq.read_table(
        f"{SF}/documents.parquet", columns=["doc_id", "lang", "text"]
    ).to_pylist()
    expected_min: dict[str, int] = {}
    n_test: dict[str, int] = {}
    for d in docs:
        for me, other in (
            (d["doc_id"], d["doc_id"] + TWIN_OFFSET),
            (d["doc_id"] + TWIN_OFFSET, d["doc_id"]),
        ):
            if _split_of(me) == "test":
                n_test[d["lang"]] = n_test.get(d["lang"], 0) + 1
                # ≥5 words → interior shingles shared with the twin
                if _split_of(other) == "train" and len(d["text"].split()) >= 5:
                    expected_min[d["lang"]] = (
                        expected_min.get(d["lang"], 0) + 1
                    )
    rows = {
        r["lang"]: r for r in QUERIES["q_split_leakage"](spark, SF).collect()
    }
    assert {k: r["n_test"] for k, r in rows.items()} == n_test
    for lang, floor in expected_min.items():
        assert rows[lang]["n_leaked"] >= floor
        assert rows[lang]["n_leaked"] <= rows[lang]["n_test"]


def test_data_contract_flags_planted_violations(spark, tmp_path):
    """Build a tiny lake with exactly one violation of each kind and
    assert the gate reports exact per-check counts — proof the checks
    are wired to the right columns, not merely green on clean data."""
    import datetime as dt

    import pyarrow as pa

    ts = dt.datetime(1996, 1, 1)
    orders = pa.table(
        {
            # dup key 2; row 6 carries NULL status + NULL price (NULL
            # must count as a domain/bound violation, not pass)
            "o_orderkey": pa.array([1, 2, 2, 3, 4, 5], pa.int64()),
            "o_custkey": pa.array([10, 11, 12, None, 13, 14], pa.int64()),
            "o_orderstatus": pa.array(["P", "O", "F", "F", "X", None]),
            "o_totalprice": pa.array([5.0, 6.0, 7.0, -1.0, 8.0, None]),
            "o_orderdate": pa.array([ts] * 6, pa.timestamp("ms")),
            "o_orderpriority": pa.array(["1-URGENT"] * 6),
        }
    )
    lineitem = pa.table(
        {
            # orphan 99; NULL l_orderkey is ALSO an orphan (anti-join
            # and NOT EXISTS agree); NULL discount violates the range
            "l_orderkey": pa.array([1, 2, 99, None], pa.int64()),
            "l_discount": pa.array([0.05, 1.5, 0.1, None]),
        }
    )
    pq.write_table(orders, str(tmp_path / "orders.parquet"))
    pq.write_table(lineitem, str(tmp_path / "lineitem.parquet"))
    rows = {
        r["check_name"]: r
        for r in QUERIES["q_data_contract"](spark, str(tmp_path)).collect()
    }
    expected = {
        "pk_unique_orderkey": 1,
        "fk_lineitem_orders": 2,
        "non_null_custkey": 1,
        "status_in_domain": 2,
        "positive_totalprice": 2,
        "discount_in_unit_range": 2,
    }
    assert {k: r["violations"] for k, r in rows.items()} == expected
    assert all(r["verdict"] == "fail" for r in rows.values())


def test_data_contract_clean_corpus_passes(spark):
    rows = QUERIES["q_data_contract"](spark, SF).collect()
    assert len(rows) == 6
    assert all(r["verdict"] == "pass" for r in rows)
    assert all(r["violations"] == 0 for r in rows)


def test_shard_export_write_matches_manifest(spark, tmp_path):
    """Drive the real export the manifest plans: write documents
    partitioned by the same shard key and assert the directory layout
    holds exactly the manifest's per-shard doc counts."""
    from pyspark.sql import functions as F

    from cassowary_spark.queries.datapipe5 import shard_id_col
    from cassowary_spark.tables import load_table

    manifest = {
        r["shard_id"]: r["n_docs"]
        for r in QUERIES["q_shard_export"](spark, SF).collect()
    }
    out = str(tmp_path / "shards")
    docs = load_table(spark, SF, "documents")
    docs.withColumn("shard_id", shard_id_col()).write.partitionBy(
        "shard_id"
    ).parquet(out)
    back = spark.read.parquet(out)
    got = {
        r["shard_id"]: r["n"]
        for r in back.groupBy("shard_id")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert got == manifest
