"""Planted gates for wave 33: merge-on-read equality deletes must
never touch a base byte and must sequence correctly; the bucketed join
must be physically exchange-free and numerically identical to the
plain join.
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from cassowary_spark import registry
from cassowary_spark.plancheck import formatted_plan, node_counts
from cassowary_spark.registry import QUERIES

registry.load_all()


class TestEqualityDeletes:
    def test_base_files_untouched_by_deletes(self, spark, sf_dir):
        from cassowary_spark.queries.datapipe31 import (
            _eqdel_dirs,
            ensure_eqdelete_lake,
        )

        base, d1, d2 = ensure_eqdelete_lake(spark, sf_dir)
        sig_before = {
            f: (os.path.getsize(os.path.join(base, f)),
                os.stat(os.path.join(base, f)).st_mtime_ns)
            for f in os.listdir(base)
            if f.endswith(".parquet")
        }
        # re-running the delete commits must not rewrite the base
        ensure_eqdelete_lake(spark, sf_dir)
        QUERIES["q_equality_deletes"](spark, sf_dir).collect()
        sig_after = {
            f: (os.path.getsize(os.path.join(base, f)),
                os.stat(os.path.join(base, f)).st_mtime_ns)
            for f in os.listdir(base)
            if f.endswith(".parquet")
        }
        assert sig_before == sig_after and len(sig_before) == 8
        # the delete files are key-granular sidecars, tiny vs the base
        for d in (d1, d2):
            assert sum(
                os.path.getsize(os.path.join(d, f)) for f in os.listdir(d)
            ) < sum(s for s, _ in sig_before.values())

    def test_sequencing_through_seq1(self, spark, sf_dir):
        from cassowary_spark.queries.datapipe31 import (
            _DEL_MOD_1,
            _DEL_MOD_2,
            eqdelete_read,
        )

        base_df = spark.read.parquet(
            __import__(
                "cassowary_spark.queries.datapipe31", fromlist=["_eqdel_dirs"]
            )._eqdel_dirs(sf_dir)[0]
        )
        n_total = base_df.count()
        n_m1 = base_df.filter(F.col("doc_id") % _DEL_MOD_1 == 0).count()
        n_either = base_df.filter(
            (F.col("doc_id") % _DEL_MOD_1 == 0)
            | (F.col("doc_id") % _DEL_MOD_2 == 0)
        ).count()
        # reading through sequence 1 shows ONLY the first commit's
        # deletions; through sequence 2 both
        assert eqdelete_read(spark, sf_dir, through_seq=1).count() == n_total - n_m1
        assert eqdelete_read(spark, sf_dir, through_seq=2).count() == n_total - n_either
        # no deleted key survives the full read
        got = (
            eqdelete_read(spark, sf_dir, through_seq=2)
            .filter(
                (F.col("doc_id") % _DEL_MOD_1 == 0)
                | (F.col("doc_id") % _DEL_MOD_2 == 0)
            )
            .count()
        )
        assert got == 0


class TestBucketJoin:
    def test_join_is_exchange_free_and_bucketed(self, spark, sf_dir):
        from cassowary_spark.queries.datapipe31 import bucketed_join

        j = bucketed_join(spark, sf_dir)
        plan = formatted_plan(j)
        counts = node_counts(j)
        assert counts["exchanges"] == 0, plan
        assert counts["broadcasts"] == 0, plan
        assert "SortMergeJoin" in plan
        assert "Bucketed: true" in plan

    def test_results_match_plain_join(self, spark, sf_dir):
        from cassowary_spark.tables import load_table

        got = {
            r.priority: (r.n_items, r.cents_sum)
            for r in QUERIES["q_bucket_join"](spark, sf_dir).collect()
        }
        o = load_table(spark, sf_dir, "orders")
        li = load_table(spark, sf_dir, "lineitem")
        exp = {
            r.priority: (r.n_items, r.cents_sum)
            for r in (
                o.join(li, F.col("o_orderkey") == F.col("l_orderkey"))
                .groupBy(F.col("o_orderpriority").alias("priority"))
                .agg(
                    F.count("*").cast("long").alias("n_items"),
                    F.sum(
                        F.floor(
                            F.col("l_extendedprice") * F.lit(100.0) + F.lit(0.5)
                        ).cast("long")
                    ).alias("cents_sum"),
                )
                .collect()
            )
        }
        assert got == exp
