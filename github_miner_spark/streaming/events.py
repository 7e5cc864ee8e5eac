"""Structured Streaming jobs over the events table (SURVEY.md §2.10).

The reference has no streaming operators — its mining loop is a polling
batch with checkpoint/resume (R5/R6). Here that capability is upgraded
to first-class Structured Streaming: file-source reads with rate
limiting (maxFilesPerTrigger — the analog of the reference's page-rate
throttling), event-time windowed aggregation with watermarks for late
data, and checkpointed exactly-once sinks (the analog of the
processed-date-ranges Redis checkpoint, src/miner.ts:83-86).

Tests run with trigger(availableNow=True) and prove the streaming
results equal the batch twins in queries/events_queries.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from github_miner_spark.io.tables import TABLE_SCHEMAS


def stream_events(
    spark: SparkSession, sf_dir: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    """File-source stream over the events parquet with the declared
    schema. ``maxFilesPerTrigger`` bounds per-microbatch intake —
    source-level rate limiting, like the reference's requests/min cap."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    reader = spark.readStream.schema(TABLE_SCHEMAS["events"])
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    # the file stream source requires a directory; glob-filter the one table
    df = (
        reader.format("parquet")
        .option("pathGlobFilter", "events.parquet")
        .load(sf_dir)
    )
    # ns -> us conversion, mirroring io.tables.load_table
    return df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))


def windowed_event_counts(
    events: DataFrame, window: str = "1 hour", watermark: str = "2 hours"
) -> DataFrame:
    """Event-time tumbling-window counts with a watermark: late rows
    beyond the watermark are dropped and window state is evicted —
    bounded state at 100 TB/day rates."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(F.count("*").alias("n_events"), F.sum("value").alias("total_value"))
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


def run_available_now(
    result: DataFrame, checkpoint_dir: str, query_name: str = "events_stream"
) -> None:
    """Drain everything currently available through the streaming
    engine into an in-memory sink (exactly-once per checkpoint), then
    stop — the Structured-Streaming form of the reference's
    'poll until all partitions processed, then exit' loop
    (src/miner.ts:167-181)."""
    q = (
        result.writeStream.format("memory")
        .queryName(query_name)
        .outputMode("complete")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
