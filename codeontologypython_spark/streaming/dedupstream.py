"""Streaming ingest deduplication: the Structured Streaming counterpart of
``functions.dedup.exact_dedup`` — drop every later arrival of an
already-seen document content as the corpus streams in, instead of
re-scanning the accumulated corpus per batch.

``dropDuplicatesWithinWatermark`` on md5(text) keeps state O(distinct
contents inside the watermark horizon), not O(stream length): entries older
than (max event time - watermark) are evicted, which is what makes the
operator viable on an unbounded 100TB/day ingest where true forever-dedup
state would grow without bound. Re-deliveries *outside* the horizon are the
batch compactor's job (``streaming/incremental.compact`` already dedups by
lineage) — the stream handles the hot window, the nightly batch the tail;
this split is the standard lambda-ish design for exactly-once-ish corpus
ingest.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def dedup_docs_stream(spark: SparkSession, source_dir: str,
                      watermark: str = "1 hour",
                      max_files_per_trigger: int = 1) -> DataFrame:
    """readStream over a (doc_id, ts, text, source) parquet directory ->
    first arrival per distinct content within the watermark horizon.
    maxFilesPerTrigger=1 by default so tests exercise state carried ACROSS
    micro-batches, not within-batch dedup."""
    docs = (spark.readStream
            .schema("doc_id long, ts timestamp, text string, source string")
            .option("maxFilesPerTrigger", str(max_files_per_trigger))
            .parquet(source_dir))
    return (docs
            .withColumn("content_md5", F.md5("text"))
            .withWatermark("ts", watermark)
            .dropDuplicatesWithinWatermark(["content_md5"]))


def run_dedup_stream(spark: SparkSession, source_dir: str,
                     checkpoint_dir: str,
                     query_name: str = "dedup_stream") -> DataFrame:
    """Drain the currently-available files (availableNow) through the
    dedup stream into a memory sink; returns the deduped table. Append
    mode: each first-arrival row is emitted exactly once."""
    stream = dedup_docs_stream(spark, source_dir)
    q = (stream.writeStream
         .format("memory")
         .queryName(query_name)
         .outputMode("append")
         .option("checkpointLocation", checkpoint_dir)
         .trigger(availableNow=True)
         .start())
    if not q.awaitTermination(300):
        q.stop()
        raise TimeoutError(
            f"streaming query {query_name!r} did not drain available files "
            "within 300s — refusing to return a partial memory-sink table")
    return spark.table(query_name)
