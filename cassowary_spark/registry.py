"""Query registry powering ``__spark_entry__.queries()`` / ``oracle_sql()``.

Every operator from SURVEY.md §2 lands as a registered query: a
callable ``(spark, sf_dir) -> DataFrame`` plus (when ANSI-SQL
expressible) a DuckDB oracle string. The driver — and our own pytest
harness — runs both and compares row count + schema + order-insensitive
value hash, so computed columns must carry identical aliases on both
sides.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}

# The external driver adjudicates only the FIRST 50 queries in the dict
# returned by __spark_entry__.queries(). Python dicts preserve
# insertion order, so we emit the keys below first.
#
# Round-7 rotation — adjudication-debt paydown. After round 6, 140 of
# 299 registry keys had never received a driver CORRECTNESS row (the
# planted-gate-deferral policy, sensible at 112 keys, had deferred
# almost half the registry at 299). The round-6 verdict's top action
# is to rotate the 50 OLDEST never-adjudicated keys into this window,
# oldest-registered first, regardless of local pytest coverage — the
# driver's environment has historically surfaced divergences local
# runs did not (DuckDB DECIMAL overflow at sf0.01, BFS plan-render
# OOM). The list below is exactly registration order filtered to
# never-adjudicated keys, positions 0-49 of 140; the remaining 90
# rotate in over rounds 8-9. It also satisfies the verdict's ask to
# adjudicate the rows-only family's oracle-gated siblings
# (q_simhash_dup, q_ann_lsh_planted, q_ann_ivf_planted), which sit at
# positions 4-6 by age. Deferral from here on is reserved for keys a
# rotation would merely RE-adjudicate, never for first adjudications.
DRIVER_PRIORITY: tuple[str, ...] = (
    # lake/SSTable maintenance + ANN planted-recall family (rounds 4-5)
    "q_sstable_gen_diff", "q_orc_roundtrip", "q_partitioned_lake",
    "q_sstable_to_lake", "q_simhash_dup", "q_ann_lsh_planted",
    "q_ann_ivf_planted", "q_ann_ivfpq_planted",
    # corpus/datapipe waves 1-5 (round 5)
    "q_dedup_normalized", "q_inverted_index", "q_heavy_hitters",
    "q_corpus_mix", "q_unigram_logprob", "q_skew_stats",
    "q_compaction_plan", "q_doc_chunks", "q_zorder_layout",
    "q_pmi_pairs", "q_substring_dedup", "q_centroid_assign",
    "q_quality_gauntlet", "q_value_outliers", "q_graph_pagerank",
    "q_bpe_pairs", "q_length_band", "q_matryoshka", "q_ann_hamming",
    "q_temperature_mix", "q_postings_delta", "q_pq_encode",
    "q_recursive_cte", "q_bigram_logprob", "q_ngram_novelty",
    "q_embed_center", "q_token_budget_trim", "q_bpe_merges",
    # analytics wave (round 5-6 boundary)
    "q_funnel", "q_retention", "q_profile_stats", "q_multi_insert",
    "q_window_ignore_nulls", "q_lateral_subquery",
    "q_distribution_drift", "q_mad_outliers", "q_trailing_rate",
    "q_centroid_affinity", "q_event_transitions", "q_group_by_all",
    # retrieval layer (round 6)
    "q_bm25", "q_rank_fusion",
)


def ordered(d: dict[str, "object"]) -> dict:
    """Re-key a registry dict so DRIVER_PRIORITY keys come first (in
    priority order), then everything else in registration order.
    Priority keys not (yet) registered are skipped."""
    out = {k: d[k] for k in DRIVER_PRIORITY if k in d}
    out.update((k, v) for k, v in d.items() if k not in out)
    return out


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register a query; ``oracle`` is DuckDB-runnable ANSI SQL or None
    for genuinely non-SQL-expressible ops (rows-only check)."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query key: {name}")
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def load_all() -> None:
    """Import every query module so registration side effects run."""
    from cassowary_spark import queries  # noqa: F401

    queries.load()
    _register_modules_by_value()


def _register_modules_by_value() -> None:
    """Ship this package's code inside every pickled closure (by value).

    The driver's verify imports us from an arbitrary cwd into a vanilla
    SparkSession whose executors do NOT have this repo on PYTHONPATH.
    Worker-side functions (pandas UDFs, applyInPandas folds, the
    sstable DataSource) that reference module-level helpers would
    otherwise pickle those helpers *by reference* and die with
    ModuleNotFoundError on the executors. Registering the package's
    modules with cloudpickle's by-value mode makes every closure
    self-contained — the local-mode equivalent of shipping a zip via
    addPyFile, with no session handle needed.
    """
    import sys

    try:
        from pyspark import cloudpickle
    except ImportError:  # pragma: no cover - pyspark always present
        return
    for name, mod in list(sys.modules.items()):
        if name.startswith("cassowary_spark") and mod is not None:
            try:
                cloudpickle.register_pickle_by_value(mod)
            except Exception:
                pass
