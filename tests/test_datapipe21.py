"""Planted-input tests for wave 25 (C138-C139): a funnel fixture
where every depth and both window boundaries are exercised (chain
inside the window, chain broken ONLY by the window, a later signup
re-opening the window), and a rolling-slope fixture with an exact
linear ramp (slope recovered exactly) and a flat series (slope 0),
cross-checked by a Python replication of the framed OLS.
"""

from __future__ import annotations

import datetime as dt
import math

import pyarrow as pa
import pyarrow.parquet as pq

from cassowary_spark import registry
from cassowary_spark.registry import QUERIES

registry.load_all()


def _srnd(x: float, n: int) -> float:
    s = float(10**n)
    return math.floor(x * s + 0.5) / s


def _write_events(tmp_path, rows):
    """rows = [(event_id, ts, user_id, event_type, value)]."""
    tbl = pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array([r[1] for r in rows], pa.timestamp("ns")),
            "user_id": pa.array([r[2] for r in rows], pa.int64()),
            "event_type": pa.array([r[3] for r in rows], pa.string()),
            "value": pa.array([float(r[4]) for r in rows], pa.float64()),
            "props": pa.array(["{}"] * len(rows), pa.string()),
        }
    )
    pq.write_table(tbl, str(tmp_path / "events.parquet"))
    return str(tmp_path)


class TestWindowFunnel:
    def test_depths_boundaries_and_window_reopen(self, spark, tmp_path):
        """u1 completes inside 24h (depth 3). u2's purchase lands 1h
        past the signup-opened window (depth 2). u3 signs up twice —
        the chain fails from the first signup but completes inside
        the SECOND's window (depth 3: any signup may qualify). u4
        clicks before signing up (depth 1). u5 never signs up
        (depth 0)."""
        t0 = dt.datetime(2024, 1, 10, 0, 0, 0)

        def ts(**kw):
            return t0 + dt.timedelta(**kw)

        rows = [
            # u1: signup -> click(+1h) -> purchase(+20h)
            (1, t0, 1, "signup", 0.0),
            (2, ts(hours=1), 1, "click", 0.0),
            (3, ts(hours=20), 1, "purchase", 9.0),
            # u2: signup -> click(+1h) -> purchase(+25h, outside)
            (4, t0, 2, "signup", 0.0),
            (5, ts(hours=1), 2, "click", 0.0),
            (6, ts(hours=25), 2, "purchase", 9.0),
            # u3: signup@0 (click +30h too late for it), signup@24h,
            # click@30h, purchase@40h -- inside the SECOND window
            (7, t0, 3, "signup", 0.0),
            (8, ts(hours=24), 3, "signup", 0.0),
            (9, ts(hours=30), 3, "click", 0.0),
            (10, ts(hours=40), 3, "purchase", 9.0),
            # u4: click BEFORE the signup (order matters)
            (11, t0, 4, "click", 0.0),
            (12, ts(hours=1), 4, "signup", 0.0),
            # u5: views only
            (13, t0, 5, "view", 0.0),
        ]
        sf = _write_events(tmp_path, rows)
        out = {
            r["depth"]: r["n_users"]
            for r in QUERIES["q_window_funnel"](spark, sf).collect()
        }
        assert out == {3: 2, 2: 1, 1: 1, 0: 1}


class TestRollingSlope:
    def test_linear_ramp_flat_series_and_python_frames(
        self, spark, tmp_path
    ):
        """Type 'click': daily value = 100 + 7*d dollars -> every
        frame's slope is exactly 7.0 $/day (head frames included,
        n>=2). Type 'view': constant -> slope 0. Both cross-checked
        by a Python replication of the framed OLS."""
        t0 = dt.datetime(2024, 1, 1, 6, 0, 0)
        rows, eid = [], 0
        vals = {"click": [], "view": []}
        for d in range(20):
            for etype, v in (("click", 100.0 + 7.0 * d), ("view", 55.0)):
                eid += 1
                rows.append(
                    (eid, t0 + dt.timedelta(days=d), 1, etype, v)
                )
                vals[etype].append((d, int(round(v * 100))))
        sf = _write_events(tmp_path, rows)
        out = {
            (r["event_type"], r["d"]): r
            for r in QUERIES["q_rolling_slope"](spark, sf).collect()
        }

        def py_slope(pts, d, frame=14):
            w = [(x, y) for x, y in pts if d - (frame - 1) <= x <= d]
            n = len(w)
            if n <= 1:
                return None
            sx = sum(x for x, _ in w)
            sy = sum(y for _, y in w)
            sxy = sum(x * y for x, y in w)
            sxx = sum(x * x for x, _ in w)
            den = float(n) * float(sxx) - float(sx) * float(sx)
            if den == 0.0:
                return None
            return _srnd(
                (float(n) * float(sxy) - float(sx) * float(sy))
                / den / 100.0,
                6,
            )

        for etype in ("click", "view"):
            for d in range(20):
                got = out[(etype, d)]["slope_per_day"]
                assert got == py_slope(vals[etype], d), (etype, d)
        assert out[("click", 19)]["slope_per_day"] == 7.0
        assert out[("view", 19)]["slope_per_day"] == 0.0
        assert out[("click", 0)]["slope_per_day"] is None  # n == 1


class TestFunnelHotUserGuard:
    def test_duplicated_events_dedup_and_bound_arrays(
        self, spark, tmp_path
    ):
        """Skew guard (r15): a bot-grade user replays each event 200×.
        The per-user collect must bound at the DISTINCT timestamps
        (collect_set), and the funnel depth must be identical to the
        single-copy run — the probes are exists/array_min, for which
        duplicates are provably redundant."""
        t0 = dt.datetime(2024, 1, 10, 0, 0, 0)

        def ts(**kw):
            return t0 + dt.timedelta(**kw)

        base = [
            (1, t0, "signup"),
            (2, ts(hours=1), "click"),
            (3, ts(hours=2), "click"),
            (4, ts(hours=20), "purchase"),
        ]
        rows = []
        eid = 0
        for _rep in range(200):
            for _e, t, et in base:
                eid += 1
                rows.append((eid, t, 1, et, 0.0))
        # a normal user for contrast (depth 1: signup only)
        eid += 1
        rows.append((eid, t0, 2, "signup", 0.0))
        sf = _write_events(tmp_path, rows)

        out = {
            r["depth"]: r["n_users"]
            for r in QUERIES["q_window_funnel"](spark, sf).collect()
        }
        assert out == {3: 1, 1: 1}

        # the collected arrays are distinct-bounded, not row-bounded
        from pyspark.sql import functions as F

        from cassowary_spark.tables import load_table

        ev = load_table(spark, sf, "events").select(
            "user_id", "event_type", F.col("ts").alias("t")
        )
        per = (
            ev.groupBy("user_id")
            .agg(
                F.collect_set(
                    F.when(F.col("event_type") == "click", F.col("t"))
                ).alias("cs")
            )
            .filter(F.col("user_id") == 1)
            .collect()[0]
        )
        assert len(per["cs"]) == 2  # 400 click rows -> 2 distinct

        # q_funnel_timing on the same skewed fixture: lags match the
        # single-copy semantics (view absent -> no stages qualify via
        # t_view; add a view chain to exercise it)
        rows2 = rows + [
            (eid + 1, t0, 3, "view", 0.0),
            (eid + 2, ts(hours=1), 3, "click", 0.0),
            (eid + 3, ts(hours=1), 3, "click", 0.0),
            (eid + 4, ts(hours=5), 3, "purchase", 0.0),
        ]
        sf2 = _write_events(tmp_path, rows2)
        timing = {
            r["stage"]: (r["n_users"], r["median_lag_s"])
            for r in QUERIES["q_funnel_timing"](spark, sf2).collect()
        }
        assert timing == {
            "view_to_click": (1, 3600.0),
            "click_to_purchase": (1, 14400.0),
        }
