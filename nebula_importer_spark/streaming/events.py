"""Structured Streaming surface: incremental ingestion of event/transcript
streams with watermarked windowed aggregation.

The reference is batch-only (SURVEY §2.7: no watermarks, no windows, no
state); this module is the engine's streaming extension: the same declarative
transformations run incrementally — readStream → transform → writeStream,
late data bounded by a watermark. At scale the file source is swapped for
Kafka; the query shape (and its state store behavior) is identical.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

EVENT_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


def read_event_stream(
    spark: SparkSession, input_dir: str, max_files_per_trigger: int = 10
) -> DataFrame:
    """File-source event stream (each new parquet file is a micro-batch)."""
    return (
        spark.readStream.format("parquet")
        .schema(EVENT_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .load(input_dir)
    )


def windowed_event_counts(
    events: DataFrame,
    window: str = "1 hour",
    slide: str | None = None,
    watermark: str = "2 hours",
) -> DataFrame:
    """Watermarked tumbling/sliding window counts per event_type.

    Late rows beyond the watermark are dropped and their windows finalized —
    the state store stays bounded (windows × event_types), independent of
    stream length.
    """
    w = F.window(F.col("ts"), window, slide) if slide else F.window(F.col("ts"), window)
    return (
        events.withWatermark("ts", watermark)
        .groupBy(w.alias("win"), "event_type")
        .agg(F.count("*").alias("n_events"), F.sum("value").alias("sum_value"))
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def run_stream_to_parquet(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    window: str = "1 hour",
    watermark: str = "2 hours",
    available_now: bool = True,
):
    """readStream → windowed agg → writeStream (append mode: only finalized
    windows are emitted). With ``available_now`` the query drains everything
    currently in the directory and stops — the incremental-batch pattern used
    for resumable backfills (checkpoint carries the exactly-once cursor)."""
    agg = windowed_event_counts(read_event_stream(spark, input_dir), window, None, watermark)
    writer = (
        agg.writeStream.format("parquet")
        .outputMode("append")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
