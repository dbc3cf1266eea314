"""Property-based tests (hypothesis) for round-6 primitives: BPE
merge application and EWMA renormalization are checked against
independent pure-Python references over randomized inputs, and the
negative-sampling ring is checked for balance/self-freedom at
arbitrary corpus sizes.
"""

from __future__ import annotations

import collections
import datetime as dt

import pyarrow as pa
import pyarrow.parquet as pq
from hypothesis import given, settings
from hypothesis import strategies as st

from cassowary_spark import registry
from cassowary_spark.registry import QUERIES

registry.load_all()

WORD = st.text(alphabet="abcd", min_size=1, max_size=8)


def _ref_bpe(words: list[str], steps: int = 3):
    """Pure-Python greedy BPE: per step count frequency-weighted
    adjacent pairs over the vocab, merge the (cnt desc, pair asc)
    argmax left-greedily. Returns {word: n_tokens_after}."""
    freq = collections.Counter(words)
    seqs = {w: list(w) for w in freq}
    for _ in range(steps):
        pairs = collections.Counter()
        for w, s in seqs.items():
            for a, b in zip(s, s[1:]):
                pairs[(a, b)] += freq[w]
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        for w, s in seqs.items():
            out = []
            for x in s:
                if out and out[-1] == best[0] and x == best[1]:
                    out[-1] = best[0] + best[1]
                else:
                    out.append(x)
            seqs[w] = out
    return {w: len(s) for w, s in seqs.items()}


@settings(max_examples=6, deadline=None)
@given(words=st.lists(WORD, min_size=2, max_size=12))
def test_bpe_encode_matches_python_reference(spark, tmp_path_factory, words):
    """q_bpe_encode's per-lang token totals must equal the pure-Python
    greedy trainer+encoder on the same corpus — including tie-breaks
    and left-greedy overlap handling ('aaa' under (a,a) → 'aa a')."""
    d = tmp_path_factory.mktemp("bpe")
    text = " ".join(words)
    tbl = pa.table(
        {
            "doc_id": pa.array([1], pa.int64()),
            "text": pa.array([text], pa.string()),
            "lang": pa.array(["en"], pa.string()),
            "source": pa.array(["s0"], pa.string()),
            "n_chars": pa.array([len(text)], pa.int64()),
        }
    )
    pq.write_table(tbl, str(d / "documents.parquet"))
    out = QUERIES["q_bpe_encode"](spark, str(d)).collect()
    assert len(out) == 1
    ref = _ref_bpe(words)
    expect_bpe = sum(ref[w] for w in words)
    expect_chars = sum(len(w) for w in words)
    assert out[0]["n_words"] == len(words)
    assert out[0]["n_char_tokens"] == expect_chars
    assert out[0]["n_bpe_tokens"] == expect_bpe


@settings(max_examples=6, deadline=None)
@given(
    values=st.lists(
        st.floats(min_value=-100, max_value=100, allow_nan=False),
        min_size=1,
        max_size=12,
    )
)
def test_ewma_matches_python_reference(spark, tmp_path_factory, values):
    """q_ewma_value must equal the renormalized depth-4 weighted mean
    computed in plain Python at every position."""
    d = tmp_path_factory.mktemp("ewma")
    base = dt.datetime(2024, 1, 1)
    tbl = pa.table(
        {
            "event_id": pa.array(range(len(values)), pa.int64()),
            "ts": pa.array(
                [base + dt.timedelta(minutes=i) for i in range(len(values))],
                pa.timestamp("us"),
            ),
            "user_id": pa.array([1] * len(values), pa.int64()),
            "event_type": pa.array(["view"] * len(values), pa.string()),
            "value": pa.array([float(v) for v in values], pa.float64()),
            "props": pa.array(["{}"] * len(values), pa.string()),
        }
    )
    pq.write_table(tbl, str(d / "events.parquet"))
    out = {
        r["event_id"]: r["ewma"]
        for r in QUERIES["q_ewma_value"](spark, str(d)).collect()
    }
    weights = [8.0, 4.0, 2.0, 1.0]
    for i in range(len(values)):
        hist = values[max(0, i - 3) : i + 1][::-1]  # newest first
        num = sum(w * v for w, v in zip(weights, hist))
        den = sum(weights[: len(hist)])
        expect = num / den
        assert abs(out[i] - expect) < 1e-4, (i, out[i], expect)


@settings(max_examples=6, deadline=None)
@given(n=st.integers(min_value=4, max_value=40))
def test_negative_ring_balance_any_size(spark, tmp_path_factory, n):
    """For any corpus size n > k the ring must give every anchor k
    distinct non-self negatives and use every doc exactly k times."""
    d = tmp_path_factory.mktemp("ring")
    tbl = pa.table(
        {
            "doc_id": pa.array(range(n), pa.int64()),
            "text": pa.array([f"t {i}" for i in range(n)], pa.string()),
            "lang": pa.array(["en"] * n, pa.string()),
            "source": pa.array([f"s{i % 3}" for i in range(n)], pa.string()),
            "n_chars": pa.array([3] * n, pa.int64()),
        }
    )
    pq.write_table(tbl, str(d / "documents.parquet"))
    out = QUERIES["q_negative_pairs"](spark, str(d)).collect()
    assert len(out) == 3 * n
    usage = collections.Counter(r["neg_id"] for r in out)
    assert all(usage[i] == 3 for i in range(n))
    per_anchor = collections.defaultdict(set)
    for r in out:
        assert r["neg_id"] != r["anchor_id"]
        per_anchor[r["anchor_id"]].add(r["neg_id"])
    assert all(len(v) == 3 for v in per_anchor.values())
