"""Property-based tests (hypothesis) for the wave-36/38/39 operators:
diff-in-diff, seasonality strength, Kish ESS and the hash chain are
re-derived by pure-Python references over randomized inputs — one
Spark job per generated case, small example counts (the
test_datapipe_properties2-5.py discipline)."""

from __future__ import annotations

import datetime as dt
import hashlib
import math

import pyarrow as pa
import pyarrow.parquet as pq
from hypothesis import given, settings
from hypothesis import strategies as st

from cassowary_spark import registry
from cassowary_spark.registry import QUERIES

registry.load_all()


def _srnd(x: float, n: int) -> float:
    s = float(10**n)
    return math.floor(x * s + 0.5) / s


def _u32(key) -> int:
    return int(hashlib.md5(str(key).encode()).hexdigest()[:8], 16)


# ----------------------------------------------------- C160 diff-in-diff

EVENTS = st.lists(
    st.tuples(
        st.integers(min_value=1, max_value=30),  # user_id
        st.booleans(),  # post period
        st.floats(min_value=0.01, max_value=400.0, allow_nan=False),
    ),
    min_size=8,
    max_size=60,
)


def _write_events(tmp_path, rows):
    tbl = pa.table(
        {
            "event_id": pa.array(range(1, len(rows) + 1), pa.int64()),
            "ts": pa.array(
                [
                    dt.datetime(2024, 1, 20 if post else 10)
                    for _, post, _ in rows
                ],
                pa.timestamp("us"),
            ),
            "user_id": pa.array([u for u, _, _ in rows], pa.int64()),
            "event_type": pa.array(["click"] * len(rows), pa.string()),
            "value": pa.array([v for _, _, v in rows], pa.float64()),
            "props": pa.array(["{}"] * len(rows), pa.string()),
        }
    )
    pq.write_table(tbl, str(tmp_path / "events.parquet"))
    return str(tmp_path)


@settings(max_examples=8, deadline=None)
@given(rows=EVENTS)
def test_diff_in_diff_matches_reference(spark, tmp_path_factory, rows):
    from hypothesis import assume

    # every cell must be populated (the estimate divides by each n)
    cells = {(_u32(u) % 2 == 1, post) for u, post, _ in rows}
    assume(len(cells) == 4)
    d = tmp_path_factory.mktemp("did")
    sf = _write_events(d, rows)
    (r,) = QUERIES["q_diff_in_diff"](spark, sf).collect()
    s = {k: 0 for k in ((1, 0), (1, 1), (0, 0), (0, 1))}
    n = dict(s)
    for u, post, v in rows:
        k = (1 if _u32(u) % 2 == 1 else 0, 1 if post else 0)
        s[k] += math.floor(v * 1e6 + 0.5)
        n[k] += 1
    assert (r.n_t_pre, r.n_t_post, r.n_c_pre, r.n_c_post) == (
        n[(1, 0)], n[(1, 1)], n[(0, 0)], n[(0, 1)],
    )
    did = (
        s[(1, 1)] / n[(1, 1)]
        - s[(1, 0)] / n[(1, 0)]
        - (s[(0, 1)] / n[(0, 1)] - s[(0, 0)] / n[(0, 0)])
    ) / 1e6
    assert r.did == _srnd(did, 6)


# ----------------------------------------------------- C166 Kish ESS


@settings(max_examples=8, deadline=None)
@given(
    weights=st.lists(
        st.integers(min_value=1, max_value=5000), min_size=1, max_size=40
    )
)
def test_kish_ess_matches_formula(spark, tmp_path_factory, weights):
    d = tmp_path_factory.mktemp("ess")
    tbl = pa.table(
        {
            "doc_id": pa.array(range(len(weights)), pa.int64()),
            "text": pa.array(["x"] * len(weights), pa.string()),
            "lang": pa.array(["en"] * len(weights), pa.string()),
            "source": pa.array(["s"] * len(weights), pa.string()),
            "n_chars": pa.array(weights, pa.int64()),
        }
    )
    pq.write_table(tbl, str(d / "documents.parquet"))
    (r,) = QUERIES["q_kish_ess"](spark, str(d)).collect()
    sw, sw2 = sum(weights), sum(w * w for w in weights)
    assert r.n_docs == len(weights)
    assert r.ess == _srnd(sw * sw / sw2, 4)
    assert r.ess_ratio == _srnd(sw * sw / sw2 / len(weights), 6)


# ----------------------------------------------------- C167 hash chain

DOCS = st.lists(
    st.tuples(
        st.text(
            alphabet=st.characters(min_codepoint=32, max_codepoint=126),
            min_size=0,
            max_size=12,
        ),
        st.sampled_from(["a", "b"]),
    ),
    min_size=1,
    max_size=15,
)


@settings(max_examples=8, deadline=None)
@given(docs=DOCS)
def test_hash_chain_matches_reference(spark, tmp_path_factory, docs):
    d = tmp_path_factory.mktemp("hc")
    tbl = pa.table(
        {
            "doc_id": pa.array(range(len(docs)), pa.int64()),
            "text": pa.array([t for t, _ in docs], pa.string()),
            "lang": pa.array(["en"] * len(docs), pa.string()),
            "source": pa.array([s for _, s in docs], pa.string()),
            "n_chars": pa.array([len(t) for t, _ in docs], pa.int64()),
        }
    )
    pq.write_table(tbl, str(d / "documents.parquet"))
    got = {r.source: r.chain for r in QUERIES["q_hash_chain"](spark, str(d)).collect()}
    expect: dict[str, str] = {}
    by_src: dict[str, list[str]] = {}
    for i, (t, s) in enumerate(docs):
        by_src.setdefault(s, []).append(t)  # doc_id order == list order
    for s, texts in by_src.items():
        acc = ""
        for t in texts:
            acc = hashlib.md5(
                (acc + hashlib.md5(t.encode()).hexdigest()).encode()
            ).hexdigest()
        expect[s] = acc
    assert got == expect
