"""Reorder-survival duration frame shared by the survival family
(C145 Kaplan-Meier, C208 Nelson-Aalen, C228 log-rank).

One orders pass: the old three-scan shape (min-date agg, broadcast
join + second-min agg, separate global-max censor scan) collapses to
a single custkey-keyed aggregation whose sorted distinct-date array
yields both the first order date (element 0) and the first REORDER
date (element 1 — the second-smallest distinct date, exactly the old
``min(od) WHERE od > first``), with the censor date reduced from the
per-customer maxima instead of re-scanning orders. Per-customer
distinct-date cardinality is bounded by order frequency (tens), so
the collected array is metadata-sized per row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cassowary_spark.tables import load_table


def reorder_durations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-customer time-to-reorder: (o_custkey, dur, ev).

    ``dur`` is days from a customer's first order to their first
    reorder (ev=1), or to the dataset's last order date when they
    never reorder (ev=0, right-censored). Exact integer day diffs.
    """
    o = load_table(spark, sf_dir, "orders")
    od = F.to_date("o_orderdate")
    per = o.groupBy("o_custkey").agg(
        F.array_sort(F.collect_set(od)).alias("__ds"),
        F.max(od).alias("__mx"),
    )
    # global censor from the per-customer maxima — one LOGICAL orders
    # pass: the static plan renders the per-cust aggregate once per
    # consumer (the recorded budget says scans: 2), but the censor
    # consumer roots on the same exchange, which AQE exchange reuse
    # dedups at runtime where it fires
    censor = per.agg(F.max("__mx").alias("__c"))
    f = F.get("__ds", 0)
    s = F.get("__ds", 1)  # null when the customer never reordered
    return per.crossJoin(F.broadcast(censor)).select(
        "o_custkey",
        F.when(s.isNotNull(), F.datediff(s, f))
        .otherwise(F.datediff(F.col("__c"), f))
        .alias("dur"),
        F.when(s.isNotNull(), 1).otherwise(0).alias("ev"),
    )
