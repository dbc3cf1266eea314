"""Property-based tests (hypothesis) for round-5 pipeline primitives:
the Spark-side sign-bit packing / Hamming scoring and the postings
gap encoding are checked against independent pure-Python references
over randomized inputs — one shared Spark job per batch of generated
cases so the property sweep stays fast.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq
from hypothesis import given, settings
from hypothesis import strategies as st

from cassowary_spark import registry
from cassowary_spark.registry import QUERIES

registry.load_all()

VEC = st.lists(
    st.floats(
        min_value=-10.0, max_value=10.0, allow_nan=False, allow_infinity=False
    ),
    min_size=64,
    max_size=64,
)


def _ref_hamming(a: list[float], b: list[float]) -> int:
    return sum((x > 0) != (y > 0) for x, y in zip(a, b))


@settings(max_examples=8, deadline=None)
@given(vecs=st.lists(VEC, min_size=3, max_size=8))
def test_hamming_matches_python_reference(spark, tmp_path_factory, vecs):
    """q_ann_hamming's packed bit_count(xor) distances must equal the
    positional sign-compare computed in plain Python, for arbitrary
    float vectors including exact zeros and sign flips."""
    d = tmp_path_factory.mktemp("ham")
    tbl = pa.table(
        {
            "vec_id": pa.array(range(len(vecs)), pa.int64()),
            "embedding": pa.array(
                [[float(x) for x in v] for v in vecs], pa.list_(pa.float32())
            ),
            "label": pa.array([0] * len(vecs), pa.int32()),
        }
    )
    pq.write_table(tbl, str(d / "embeddings.parquet"))
    rows = QUERIES["q_ann_hamming"](spark, str(d)).collect()
    # float32 storage: recompute the reference on the f32-rounded values
    import numpy as np

    f32 = [np.array(v, dtype=np.float32).tolist() for v in vecs]
    expect = sorted(
        ((_ref_hamming(f32[0], f32[i]), i) for i in range(1, len(vecs))),
    )[:10]
    got = sorted((r["hamming"], r["vec_id"]) for r in rows)
    assert got == expect


DOC_IDS = st.lists(
    st.integers(min_value=0, max_value=10_000), min_size=1, max_size=40, unique=True
)


@settings(max_examples=8, deadline=None)
@given(groups=st.lists(DOC_IDS, min_size=1, max_size=4))
def test_postings_delta_rebuilds_for_random_id_sets(
    spark, tmp_path_factory, groups
):
    """For arbitrary doc-id sets per term, prefix-summing the gap
    encoding must reproduce each sorted posting list exactly."""
    d = tmp_path_factory.mktemp("post")
    doc_ids, texts = [], []
    # term t{i} appears in exactly groups[i]'s doc ids; pad every doc
    # past the df threshold with a shared filler term
    all_ids = sorted({i for g in groups for i in g})
    for did in all_ids:
        terms = [f"t{gi}" for gi, g in enumerate(groups) if did in g]
        doc_ids.append(did)
        texts.append(" ".join(terms + ["filler"]))
    tbl = pa.table(
        {
            "doc_id": pa.array(doc_ids, pa.int64()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(["en"] * len(doc_ids), pa.string()),
            "source": pa.array(["s"] * len(doc_ids), pa.string()),
            "n_chars": pa.array([len(t) for t in texts], pa.int64()),
        }
    )
    pq.write_table(tbl, str(d / "documents.parquet"))
    rows = {r["term"]: r for r in QUERIES["q_postings_delta"](spark, str(d)).collect()}
    for gi, g in enumerate(groups):
        term = f"t{gi}"
        if len(set(g)) < 10:  # below the df threshold: must be absent
            assert term not in rows
            continue
        r = rows[term]
        acc, rebuilt = 0, []
        for gap in (int(t) for t in r["deltas"].split(",")):
            acc += gap
            rebuilt.append(acc)
        assert rebuilt == sorted(set(g))
        assert r["df"] == len(set(g))


@settings(max_examples=10, deadline=None)
@given(
    keys=st.lists(st.integers(min_value=0, max_value=6), min_size=0, max_size=60),
    cap=st.integers(min_value=1, max_value=8),
)
def test_drop_hot_keys_matches_multiset_reference(spark, keys, cap):
    """drop_hot_keys keeps exactly the rows whose key multiplicity is
    <= cap (strictly-greater-than drop) — the one definition four call
    sites now share, checked against a pure-Python multiset count over
    arbitrary key distributions including empty input and all-hot."""
    import collections

    from cassowary_spark.operators.dedup import drop_hot_keys

    df = spark.createDataFrame(
        [(i, k) for i, k in enumerate(keys)] or [(0, 0)],
        ["row_id", "k"],
    )
    if not keys:
        df = df.filter("row_id < 0")  # genuinely empty frame
    got = sorted(
        r["row_id"] for r in drop_hot_keys(df, "k", cap).collect()
    )
    counts = collections.Counter(keys)
    expected = sorted(
        i for i, k in enumerate(keys) if counts[k] <= cap
    )
    assert got == expected
