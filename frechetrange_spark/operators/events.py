"""Event-stream analytics over the ``events`` table (ts, user_id,
event_type, value, props-JSON) — the engine's Structured Streaming
surface beyond index ingest.

The same plan builder serves batch and streaming (readStream + the
identical transformations), so stream results equal batch results by
construction (tested with a complete-mode memory sink). Aggregate metrics
use counts and integer cent-sums: integer addition is order-independent,
so the DuckDB oracle matches bit-for-bit regardless of partitioning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

SESSION_GAP_SEC = 1800


def windowed_event_stats(events: DataFrame, window: str = "1 hour") -> DataFrame:
    """Tumbling-window stats per event_type: (win_start, event_type,
    n_events, value_cents). Works on batch and streaming inputs unchanged
    (distinct aggregates are deliberately absent — they are unsupported in
    streaming; add a watermark upstream for append-mode sinks)."""
    return (
        events.groupBy(
            F.window("ts", window).alias("win"), "event_type"
        )
        .agg(
            F.count("*").cast("long").alias("n_events"),
            F.sum(F.round(F.col("value") * 100).cast("long")).alias("value_cents"),
        )
        .select(
            F.col("win.start").alias("win_start"),
            "event_type",
            "n_events",
            "value_cents",
        )
    )


def sessionize(events: DataFrame, gap_sec: int = SESSION_GAP_SEC) -> DataFrame:
    """Gap-based sessionization per user (batch): a new session starts when
    the inter-event gap exceeds ``gap_sec``. Returns (user_id, session_id,
    n_events, start_ts, end_ts, value_cents). The streaming twin is
    applyInPandasWithState / session_window; the batch form is the oracle.
    """
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # fractional-second gap (timestamp -> double = epoch seconds with
    # microsecond fraction) — matches the oracle's epoch(ts), which is a
    # DOUBLE; unix_timestamp() would truncate to whole seconds and split
    # sessions differently for sub-second events near the gap boundary.
    # TIMESTAMP_NTZ needs the hop via TIMESTAMP; the session-tz offset
    # cancels in the difference ONLY because session.py pins
    # spark.sql.session.timeZone=UTC (a fixed-offset zone). Under a DST
    # timezone the NTZ->TIMESTAMP cast is not affine and gap math near a
    # transition would split sessions differently from the epoch-based
    # oracle — keep the UTC pin or cast via to_utc_timestamp instead.
    ts_sec = F.col("ts").cast("timestamp").cast("double")
    gap = ts_sec - F.lag(ts_sec).over(w)
    marked = events.withColumn(
        "_new",
        F.when(gap.isNull() | (gap > gap_sec), F.lit(1)).otherwise(F.lit(0)),
    ).withColumn(
        "session_id",
        F.sum("_new")
        .over(w.rowsBetween(Window.unboundedPreceding, 0))
        .cast("long"),
    )
    return marked.groupBy("user_id", "session_id").agg(
        F.count("*").cast("long").alias("n_events"),
        F.min("ts").alias("start_ts"),
        F.max("ts").alias("end_ts"),
        F.sum(F.round(F.col("value") * 100).cast("long")).alias("value_cents"),
    )


def session_window_stats(events: DataFrame, gap: str = "30 minutes") -> DataFrame:
    """Native session windows (F.session_window) — the streaming-capable
    formulation of ``sessionize`` (same sessions for the same gap)."""
    return (
        events.groupBy(F.session_window("ts", gap).alias("win"), "user_id")
        .agg(
            F.count("*").cast("long").alias("n_events"),
            F.sum(F.round(F.col("value") * 100).cast("long")).alias("value_cents"),
        )
        .select(
            "user_id",
            F.col("win.start").alias("start_ts"),
            F.col("win.end").alias("end_ts"),
            "n_events",
            "value_cents",
        )
    )


def props_extract(events: DataFrame) -> DataFrame:
    """JSON prop extraction (the engine's JSON function surface):
    (event_id, k) with k = int value of props.k."""
    return events.select(
        F.col("event_id").cast("long").alias("event_id"),
        F.get_json_object("props", "$.k").cast("long").alias("k"),
    )


def start_windowed_stream(
    spark: SparkSession,
    input_dir: str,
    checkpoint_dir: str,
    query_name: str,
    window: str = "1 hour",
):
    """Streaming twin of ``windowed_event_stats``: readStream over event
    parquet files, complete-mode memory sink (for bounded backfills /
    tests). Production would use a watermark + append to a table."""
    schema = (
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string"
    )
    stream = spark.readStream.schema(schema).parquet(input_dir)
    return (
        windowed_event_stats(stream, window)
        .writeStream.outputMode("complete")
        .format("memory")
        .queryName(query_name)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
