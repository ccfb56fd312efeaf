"""Structured Streaming: windowed per-cell event counts.

The reference has no streaming surface (SURVEY.md §2.9); this module
exists because a 100 TB ingest pipeline needs an incremental path: the
same geo_to_h3 pandas UDF runs unchanged under readStream, with
watermarked tumbling windows for late data. Tested with the availableNow
trigger over the driver's `events` parquet (tests/test_streaming.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.udfs import geo_to_h3_udf

EVENTS_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string,"
    " value double, props string"
)


def events_stream(spark: SparkSession, path: str) -> DataFrame:
    return (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", 4)
        .parquet(path)
    )


def with_synthetic_geo(events: DataFrame) -> DataFrame:
    """Events carry no geo; derive a deterministic lat/lng from user_id
    (same arithmetic family as the batch queries' derived geography)."""
    lat = (F.pmod(F.col("user_id") * 2654435761, F.lit(17000000)).cast("double")
           / 100000.0 - 85.0)
    lng = (F.pmod(F.col("user_id") * 40503 + 7, F.lit(36000000)).cast("double")
           / 100000.0 - 180.0)
    return events.withColumn("lat", lat).withColumn("lng", lng)


def windowed_cell_counts(
    events: DataFrame, res: int = 5, window: str = "1 hour", watermark: str = "2 hours"
) -> DataFrame:
    """Watermarked tumbling-window counts per (window, cell, event_type)."""
    with_cell = with_synthetic_geo(events).withColumn(
        "cell", geo_to_h3_udf(res)("lat", "lng")
    )
    return (
        with_cell.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("win"), "cell", "event_type")
        .agg(F.count("*").alias("n"), F.sum("value").alias("value_sum"))
        .select(
            F.col("win.start").alias("window_start"),
            "cell",
            "event_type",
            "n",
            "value_sum",
        )
    )


def run_append_counts_available_now(
    spark: SparkSession,
    src_path: str,
    window: str = "1 hour",
    watermark: str = "2 hours",
    name: str = "append_counts",
    max_files_per_trigger: int = 1,
):
    """APPEND-mode watermarked (window, event_type) counts drained with
    availableNow, one source file per micro-batch — the surface that
    actually exercises Spark's late-data contract (complete mode never
    drops anything). Returns (sink_df, query_progresses); the caller
    sequences the source files (q47: state-build batch, then an
    eviction-triggering current batch, then a late batch whose rows
    must not re-emit already-appended windows).

    Empirical Spark-4.1 semantics pinned by q47's oracle: a late row
    is only DROPPED once its window's state was evicted (emitted);
    late rows arriving while the window is still in state legally
    merge into it — watermark delay is a promise about state
    finality, not an input filter."""
    stream = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(src_path)
    )
    agg = (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("win"), "event_type")
        .agg(F.count("*").alias("n"))
        .select(
            F.unix_timestamp(F.col("win.start")).alias("window_start"),
            "event_type",
            "n",
        )
    )
    q = (
        agg.writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    if not q.awaitTermination(300):
        # stop the leaked query BEFORE raising: the caller's cleanup
        # may remove the source dir, and a still-running stream would
        # keep failing in the background for the session lifetime
        q.stop()
        raise TimeoutError("append-counts stream did not drain in 300s")
    return spark.table(name), list(q.recentProgress)


def run_available_now(
    spark: SparkSession,
    src_path: str,
    out_path: str,
    res: int = 5,
    drain_timeout_sec: int = 300,
):
    """Drain the source with the availableNow trigger (batch-equivalent)."""
    q = (
        windowed_cell_counts(events_stream(spark, src_path), res=res)
        .writeStream.outputMode("complete")
        .format("memory")
        .queryName("cell_counts")
        .trigger(availableNow=True)
        .start()
    )
    if not q.awaitTermination(drain_timeout_sec):
        # stop-then-raise (same pattern as run_append_counts_available_now,
        # VERDICT r5 #1): a wedged stream must not silently hand back a
        # partial sink — q34 would fail later with a confusing hash
        # mismatch instead of this clear error — and must not keep
        # running after the caller's cleanup removes the source dir
        q.stop()
        raise TimeoutError(
            f"cell_counts stream did not drain in {drain_timeout_sec}s"
        )
    out = spark.table("cell_counts")
    out.write.mode("overwrite").parquet(out_path)
    return out
