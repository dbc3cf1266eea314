"""Streaming jobs over the events table (SURVEY.md §2 S1–S6).

The reference stack had no streaming engine — Shark's successor role
is played by Structured Streaming ([P], SURVEY.md §2). Each job here
is the SAME logical plan as its batch twin in
``queries/streaming_batch.py``; tests replay the events parquet as a
file stream (``maxFilesPerTrigger``) and assert batch/stream
equivalence — the property that makes the Lambda-architecture split
unnecessary.

Scale notes: every aggregation is keyed by (window, key) so state is
bounded by window count × key cardinality; watermarks bound state
retention and late-data acceptance. State lives in the executor state
store (RocksDB on a real cluster), never on the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Schema of the *converted* events stream (ts already µs timestamps —
# the test harness materializes the scan-time conversion before
# streaming; a production SSTable/parquet stream does the same in its
# source).
EVENTS_STREAM_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


def read_events_stream(
    spark: SparkSession, path: str, max_files_per_trigger: int = 1
) -> DataFrame:
    """File-source stream over an events parquet directory."""
    return (
        spark.readStream.schema(EVENTS_STREAM_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(path)
    )


def tumbling_counts(events: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """S1 + S4: tumbling 1h window agg with watermark-bounded state."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count("*").alias("n_events"), F.sum("value").alias("sum_value"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n_events", "sum_value")
    )


def sliding_counts(events: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """S2: sliding 1h/30m window agg."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"))
        .agg(F.count("*").alias("n_events"))
        .select(F.col("w.start").alias("window_start"), "n_events")
    )


def session_counts(events: DataFrame, gap: str = "30 minutes", watermark: str = "1 hour") -> DataFrame:
    """S3: session windows per user (gap-merged in the state store)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count("*").alias("n_events"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
        )
    )


def dedup_events(events: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """S5: stateful dedup by event_id within the watermark horizon."""
    return events.withWatermark("ts", watermark).dropDuplicates(["event_id"])


def enrich_with_customers(events: DataFrame, customers: DataFrame) -> DataFrame:
    """S6: stream-static join — the static side broadcasts per batch."""
    return events.join(
        F.broadcast(customers), events.user_id == customers.c_custkey
    ).select("event_id", "ts", "user_id", "value", "c_mktsegment")


def run_to_memory(df: DataFrame, name: str, output_mode: str = "append"):
    """Drain a streaming DataFrame into an in-memory sink (tests).

    availableNow processes the whole backlog in bounded batches and
    stops — the harness-friendly trigger.
    """
    return (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
