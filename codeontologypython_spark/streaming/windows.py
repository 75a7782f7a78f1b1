"""Structured Streaming windowed aggregation with late-data handling (driver
brief: "readStream -> transformations -> writeStream; watermarks + windowed
aggs for late data").

The KG pipeline itself is batch + incremental (SURVEY §2.9: the reference has
no streaming surface), but the engine ships the streaming operators a
training-data pipeline needs: a watermarked tumbling-window aggregation over
an event stream, and a stateful sessionizer (streaming/stateful.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def windowed_event_counts_stream(
    spark: SparkSession,
    source_dir: str,
    window_duration: str = "10 minutes",
    watermark: str = "30 minutes",
    max_files_per_trigger: int = 4,
) -> DataFrame:
    """readStream over an events parquet directory -> watermarked tumbling
    windows. The watermark bounds state: windows older than (max event time
    - watermark) are finalized and dropped from the store, so state stays
    O(active windows), not O(stream length) — the property that matters at
    an unbounded 100TB/day ingest. Late rows within the watermark still
    update their window; later ones are dropped (documented late-data
    semantics)."""
    events = (spark.readStream
              .schema("event_id long, ts timestamp, user_id long, "
                      "event_type string, value double, props string")
              .option("maxFilesPerTrigger", str(max_files_per_trigger))
              .parquet(source_dir))
    return (events
            .withWatermark("ts", watermark)
            .groupBy(F.window("ts", window_duration).alias("w"), "event_type")
            .agg(F.count("*").alias("n_events"),
                 F.sum("value").alias("total_value"))
            .select(F.col("w.start").alias("window_start"),
                    F.col("w.end").alias("window_end"),
                    "event_type", "n_events", "total_value"))


def run_windowed_counts(spark: SparkSession, source_dir: str,
                        checkpoint_dir: str,
                        query_name: str = "windowed_counts") -> DataFrame:
    """Drive the stream to completion over the currently-available files
    (availableNow) into an in-memory sink; returns the result table.
    'complete' mode re-emits all windows per trigger — correct for the
    memory-sink demo; a production job would use 'append' + the watermark to
    emit each window exactly once when it finalizes."""
    stream = windowed_event_counts_stream(spark, source_dir)
    q = (stream.writeStream
         .format("memory")
         .queryName(query_name)
         .outputMode("complete")
         .option("checkpointLocation", checkpoint_dir)
         .trigger(availableNow=True)
         .start())
    if not q.awaitTermination(300):
        q.stop()
        raise TimeoutError(
            f"streaming query {query_name!r} did not drain available files "
            "within 300s — refusing to return a partial memory-sink table")
    return spark.table(query_name)
