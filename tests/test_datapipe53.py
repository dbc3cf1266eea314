"""Planted gates for wave 56: referential integrity (C196), PK
uniqueness (C197), freshness lag (C198), null profile (C199)."""

from __future__ import annotations

import datetime as dt

import pyarrow as pa
import pyarrow.parquet as pq

from cassowary_spark import registry
from cassowary_spark.registry import QUERIES

registry.load_all()


def _write_star(tmp_path, *, orphan_lineitem=False, dup_event=False,
                stale_secs=0, null_values=0, blank_props=0):
    """A minimal consistent star schema + events/documents fixture
    with optional planted defects."""
    t0 = dt.datetime(2024, 1, 10, 12, 0, 0)
    pq.write_table(
        pa.table({
            "n_nationkey": pa.array([0, 1], pa.int32()),
            "n_name": pa.array(["A", "B"], pa.string()),
            "n_regionkey": pa.array([0, 0], pa.int32()),
        }),
        str(tmp_path / "nation.parquet"),
    )
    pq.write_table(
        pa.table({
            "c_custkey": pa.array([1, 2], pa.int64()),
            "c_name": pa.array(["c1", "c2"], pa.string()),
            "c_nationkey": pa.array([0, 1], pa.int32()),
            "c_acctbal": pa.array([1.0, 2.0], pa.float64()),
            "c_mktsegment": pa.array(["M", "M"], pa.string()),
        }),
        str(tmp_path / "customer.parquet"),
    )
    pq.write_table(
        pa.table({
            "p_partkey": pa.array([10, 11], pa.int64()),
            "p_name": pa.array(["p", "q"], pa.string()),
            "p_brand": pa.array(["Brand#11", "Brand#22"], pa.string()),
            "p_type": pa.array(["t", "t"], pa.string()),
            "p_size": pa.array([1, 2], pa.int32()),
            "p_retailprice": pa.array([1.0, 2.0], pa.float64()),
        }),
        str(tmp_path / "part.parquet"),
    )
    pq.write_table(
        pa.table({
            "o_orderkey": pa.array([100, 101], pa.int64()),
            "o_custkey": pa.array([1, 2], pa.int64()),
            "o_orderstatus": pa.array(["F", "O"], pa.string()),
            "o_totalprice": pa.array([10.0, 20.0], pa.float64()),
            "o_orderdate": pa.array([t0, t0], pa.timestamp("us")),
            "o_orderpriority": pa.array(["1-URGENT"] * 2, pa.string()),
        }),
        str(tmp_path / "orders.parquet"),
    )
    lkeys = [100, 101] + ([999] if orphan_lineitem else [])
    n = len(lkeys)
    pq.write_table(
        pa.table({
            "l_orderkey": pa.array(lkeys, pa.int64()),
            "l_partkey": pa.array([10, 11, 10][:n], pa.int64()),
            "l_suppkey": pa.array([1] * n, pa.int64()),
            "l_linenumber": pa.array(list(range(1, n + 1)), pa.int32()),
            "l_quantity": pa.array([1.0] * n, pa.float64()),
            "l_extendedprice": pa.array([10.0] * n, pa.float64()),
            "l_discount": pa.array([0.0] * n, pa.float64()),
            "l_tax": pa.array([0.0] * n, pa.float64()),
            "l_returnflag": pa.array(["N"] * n, pa.string()),
            "l_linestatus": pa.array(["O"] * n, pa.string()),
            "l_shipdate": pa.array([t0] * n, pa.timestamp("us")),
        }),
        str(tmp_path / "lineitem.parquet"),
    )
    eids = [1, 2, 3] + ([3] if dup_event else [])
    ne = len(eids)
    ts = [t0, t0, t0 - dt.timedelta(seconds=stale_secs)][:3] + (
        [t0] if dup_event else []
    )
    vals = [None if i < null_values else 1.5 for i in range(ne)]
    props = ["{}" if i < blank_props else '{"k":1}' for i in range(ne)]
    pq.write_table(
        pa.table({
            "event_id": pa.array(eids, pa.int64()),
            "ts": pa.array(ts, pa.timestamp("us")),
            "user_id": pa.array([7] * ne, pa.int64()),
            "event_type": pa.array(["a", "a", "b"][:3] + (["a"] if dup_event else []), pa.string()),
            "value": pa.array(vals, pa.float64()),
            "props": pa.array(props, pa.string()),
        }),
        str(tmp_path / "events.parquet"),
    )
    pq.write_table(
        pa.table({
            "doc_id": pa.array([0, 1], pa.int64()),
            "text": pa.array(["x y", "y z"], pa.string()),
            "lang": pa.array(["en", "en"], pa.string()),
            "source": pa.array(["s", "s"], pa.string()),
            "n_chars": pa.array([3, 3], pa.int64()),
        }),
        str(tmp_path / "documents.parquet"),
    )
    return str(tmp_path)


class TestReferentialIntegrity:
    def test_planted_orphan_detected(self, spark, tmp_path):
        sf = _write_star(tmp_path, orphan_lineitem=True)
        out = {
            r.edge: r
            for r in QUERIES["q_referential_integrity"](spark, sf).collect()
        }
        li_o = out["lineitem.l_orderkey->orders"]
        assert (li_o.n_child, li_o.n_orphans) == (3, 1)
        assert abs(li_o.orphan_rate - 1 / 3) < 1e-6
        # the orphan line still resolves its part: other edges clean
        assert out["lineitem.l_partkey->part"].n_orphans == 0
        assert out["orders.o_custkey->customer"].n_orphans == 0
        assert out["customer.c_nationkey->nation"].n_orphans == 0

    def test_clean_fixture_all_zero(self, spark, sf_dir):
        rows = QUERIES["q_referential_integrity"](spark, sf_dir).collect()
        assert len(rows) == 4
        assert all(r.n_orphans == 0 and r.orphan_rate == 0.0 for r in rows)
        assert all(r.n_child > 0 for r in rows)


class TestPkUniqueness:
    def test_planted_duplicate_key(self, spark, tmp_path):
        sf = _write_star(tmp_path, dup_event=True)
        out = {r.pk: r for r in QUERIES["q_pk_uniqueness"](spark, sf).collect()}
        ev = out["events(event_id)"]
        assert (ev.n_rows, ev.n_keys, ev.dup_rows) == (4, 3, 1)
        assert out["orders(o_orderkey)"].dup_rows == 0
        assert out["lineitem(l_orderkey,l_linenumber)"].dup_rows == 0

    def test_fixture_matches_duck(self, spark, sf_dir, duck):
        # the synthetic lineitem REALLY has duplicate
        # (l_orderkey, l_linenumber) pairs — the audit must report
        # them, and single-column PKs must come back clean
        rows = {r.pk: r for r in QUERIES["q_pk_uniqueness"](spark, sf_dir).collect()}
        assert len(rows) == 4
        (n, k) = duck.execute(
            "SELECT count(*), count(DISTINCT (l_orderkey, l_linenumber))"
            " FROM lineitem"
        ).fetchone()
        li = rows["lineitem(l_orderkey,l_linenumber)"]
        assert (li.n_rows, li.n_keys, li.dup_rows) == (n, k, n - k)
        for pk in ("orders(o_orderkey)", "events(event_id)",
                   "documents(doc_id)"):
            assert rows[pk].dup_rows == 0 and rows[pk].dup_rate == 0.0


class TestFreshnessLag:
    def test_planted_stale_source(self, spark, tmp_path):
        sf = _write_star(tmp_path, stale_secs=2 * 86400)
        out = {
            r.event_type: r
            for r in QUERIES["q_freshness_lag"](spark, sf).collect()
        }
        assert out["a"].lag_s == 0 and out["a"].stale == 0
        assert out["b"].lag_s == 2 * 86400 and out["b"].stale == 1

    def test_boundary_not_stale(self, spark, tmp_path):
        sf = _write_star(tmp_path, stale_secs=86400)  # exactly 24 h
        out = {
            r.event_type: r
            for r in QUERIES["q_freshness_lag"](spark, sf).collect()
        }
        assert out["b"].lag_s == 86400 and out["b"].stale == 0


class TestNullProfile:
    def test_planted_nulls_and_blanks(self, spark, tmp_path):
        sf = _write_star(tmp_path, null_values=2, blank_props=1)
        out = {r.col: r for r in QUERIES["q_null_profile"](spark, sf).collect()}
        assert out["value"].n_null == 2
        assert out["props"].n_blank == 1
        assert out["user_id"].n_null == 0
        assert abs(out["value"].missing_rate - 2 / 3) < 1e-6

    def test_fixture_distincts(self, spark, sf_dir, duck):
        out = {r.col: r for r in QUERIES["q_null_profile"](spark, sf_dir).collect()}
        (d,) = duck.execute(
            "SELECT count(DISTINCT event_type) FROM events"
        ).fetchone()
        assert out["event_type"].n_distinct == d
        assert out["event_type"].n_null == 0
