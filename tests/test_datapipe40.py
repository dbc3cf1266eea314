"""Planted gates for wave 42: q_zonemap_skip (A30), q_raking (C174),
and S19 observed streaming metrics (jobs.observed_counts)."""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq

from cassowary_spark import registry
from cassowary_spark.registry import QUERIES

registry.load_all()


def _write_orders(tmp_path, rows):
    tbl = pa.table(
        {
            "o_orderkey": pa.array([r[0] for r in rows], pa.int64()),
            "o_custkey": pa.array([r[1] for r in rows], pa.int64()),
            "o_orderstatus": pa.array([r[2] for r in rows], pa.string()),
            "o_totalprice": pa.array([r[3] for r in rows], pa.float64()),
        }
    )
    pq.write_table(tbl, str(tmp_path / "orders.parquet"))
    return str(tmp_path)


def _write_docs(tmp_path, rows):
    """rows = [(doc_id, lang, source)]"""
    tbl = pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows], pa.int64()),
            "text": pa.array([f"t{r[0]}" for r in rows], pa.string()),
            "lang": pa.array([r[1] for r in rows], pa.string()),
            "source": pa.array([r[2] for r in rows], pa.string()),
            "n_chars": pa.array([2] * len(rows), pa.int64()),
        }
    )
    pq.write_table(tbl, str(tmp_path / "documents.parquet"))
    return str(tmp_path)


# ------------------------------------------- A30 zone-map skipping


class TestZonemapSkip:
    def test_skips_most_files_on_narrow_range(self, spark, sf_dir):
        from cassowary_spark.queries.datapipe40 import (
            _ZM_HI,
            _ZM_LO,
            ensure_zonemap_lake,
            zonemap_pruned_files,
        )

        data, _ = ensure_zonemap_lake(spark, sf_dir)
        import os

        n_files = len(
            [f for f in os.listdir(data) if f.endswith(".parquet")]
        )
        picked = zonemap_pruned_files(spark, sf_dir, _ZM_LO, _ZM_HI)
        assert n_files == 16
        # a range-clustered 16-file layout must skip at least half the
        # files on the probe range at any fixture scale (the range is
        # ~3% of keys at sf0.01, ~27% at the sf0.001 test fixture)
        assert 1 <= len(picked) <= n_files // 2, picked

    def test_skipped_files_hold_no_matching_rows(self, spark, sf_dir):
        """The safety contract of data skipping: every file the zone
        map SKIPS must contain zero rows matching the predicate —
        otherwise skipping changes results. Also: a probe beyond the
        key domain selects no files at all."""
        import os

        from pyspark.sql import functions as F

        from cassowary_spark.queries.datapipe40 import (
            _ZM_HI,
            _ZM_LO,
            ensure_zonemap_lake,
            zonemap_pruned_files,
        )

        data, _ = ensure_zonemap_lake(spark, sf_dir)
        picked = set(zonemap_pruned_files(spark, sf_dir, _ZM_LO, _ZM_HI))
        all_files = {
            "file:" + os.path.join(data, f)
            for f in os.listdir(data)
            if f.endswith(".parquet")
        }
        skipped = sorted(all_files - picked)
        assert skipped  # the narrow probe must skip something
        n_missed = (
            spark.read.parquet(*skipped)
            .filter(F.col("o_orderkey").between(_ZM_LO, _ZM_HI))
            .count()
        )
        assert n_missed == 0
        # a probe past the key domain selects nothing
        max_k = (
            spark.read.parquet(data).agg(F.max("o_orderkey")).collect()[0][0]
        )
        assert zonemap_pruned_files(spark, sf_dir, max_k + 10, max_k + 20) == []

    def test_rollup_matches_plain_scan(self, spark, sf_dir, duck):
        from cassowary_spark.queries.datapipe40 import _ZM_HI, _ZM_LO

        got = {
            r.status: (r.n_rows, r.cents_sum)
            for r in QUERIES["q_zonemap_skip"](spark, sf_dir).collect()
        }
        expect = {
            st: (n, c)
            for st, n, c in duck.execute(
                f"""SELECT o_orderstatus, count(*),
                    CAST(sum(CAST(floor(o_totalprice * 100.0 + 0.5)
                         AS BIGINT)) AS BIGINT)
                    FROM orders
                    WHERE o_orderkey BETWEEN {_ZM_LO} AND {_ZM_HI}
                    GROUP BY 1"""
            ).fetchall()
        }
        assert got == expect


# ------------------------------------------- C174 raking (IPF)


class TestRaking:
    def test_margins_uniform_after_two_iterations(self, spark, sf_dir):
        rows = QUERIES["q_raking"](spark, sf_dir).collect()
        assert rows
        langs = {r.lang for r in rows}
        sources = {r.source for r in rows}
        total = sum(r.weighted_docs for r in rows)
        lang_m = {}
        src_m = {}
        for r in rows:
            lang_m[r.lang] = lang_m.get(r.lang, 0.0) + r.weighted_docs
            src_m[r.source] = src_m.get(r.source, 0.0) + r.weighted_docs
        # the ladder ends on the SOURCE fit: source margins are exact
        # to quantization; lang margins carry the residual drift of
        # one geometric-convergence step (≲1% after 2 iterations)
        for v in src_m.values():
            assert abs(v - total / len(sources)) < 1e-6 * total / len(sources)
        for v in lang_m.values():
            assert abs(v - total / len(langs)) < 1e-2 * total / len(langs)

    def test_balanced_fixture_needs_no_reweighting(self, spark, tmp_path):
        # perfectly balanced 2x2 grid: every weight must be 1
        rows = [
            (i, ["en", "fr"][i % 2], ["a", "b"][(i // 2) % 2])
            for i in range(16)
        ]
        sf = _write_docs(tmp_path, rows)
        out = QUERIES["q_raking"](spark, sf).collect()
        assert len(out) == 4
        for r in out:
            assert abs(r.weight - 1.0) < 1e-8, r
            assert abs(r.weighted_docs - r.n_docs) < 1e-6

    def test_hand_math_skewed_grid(self, spark, tmp_path):
        """2 langs x 1 source, counts 6/2 (total 8): uniform lang
        target = 4 each -> weights 4/6 and 4/2; source margin is
        trivially matched with one source."""
        rows = [(i, "en", "s") for i in range(6)] + [
            (i + 6, "fr", "s") for i in range(2)
        ]
        sf = _write_docs(tmp_path, rows)
        out = {r.lang: r for r in QUERIES["q_raking"](spark, sf).collect()}
        assert abs(out["en"].weight - 4 / 6) < 1e-7
        assert abs(out["fr"].weight - 4 / 2) < 1e-7
        assert abs(out["en"].weighted_docs - 4.0) < 1e-5
        assert abs(out["fr"].weighted_docs - 4.0) < 1e-5


# ----------------------------------- S19 observed streaming metrics


class TestObservedCounts:
    def test_per_batch_metrics_match_data(self, spark, tmp_path):
        """Every micro-batch's observed (n_rows, cents_sum) must equal
        the batch's actual content, and their totals the whole
        source — the zero-extra-job observability contract."""
        from cassowary_spark.streaming.jobs import observed_counts

        src = tmp_path / "src"
        src.mkdir()
        for b, lo in enumerate((0, 10, 20)):
            tbl = pa.table(
                {
                    "pk": pa.array(range(lo, lo + 10), pa.int64()),
                    "cents": pa.array(
                        [100 + i for i in range(lo, lo + 10)], pa.int64()
                    ),
                }
            )
            pq.write_table(tbl, str(src / f"b{b}.parquet"))
        sink = str(tmp_path / "sink")
        chk = str(tmp_path / "chk")
        q, metrics = observed_counts(
            spark,
            str(src),
            sink,
            chk,
            schema="pk BIGINT, cents BIGINT",
            max_files_per_trigger=1,
        )
        q.awaitTermination(120)
        assert not q.isActive
        assert len(metrics) == 3  # one observation per micro-batch
        assert sorted(m["n_rows"] for m in metrics) == [10, 10, 10]
        assert sum(m["cents_sum"] for m in metrics) == sum(
            100 + i for i in range(30)
        )
        # the sink holds exactly the observed rows
        assert spark.read.parquet(sink).count() == 30
