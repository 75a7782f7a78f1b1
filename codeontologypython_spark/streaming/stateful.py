"""Custom stateful streaming operator (driver brief:
"applyInPandasWithState for custom stateful operators"): an inactivity-gap
sessionizer whose semantics EQUAL the batch ``q_sessionize`` query — the
batch/streaming agreement is the correctness gate (tests cross-check them on
the same events split across micro-batches).

State per user: (session_id, session_start_us, last_ts_us, n_events) — O(1)
per key regardless of stream length. Each micro-batch folds its (sorted)
events into the state and emits the UPDATED rows for every session it
touched; downstream keeps the last update per (user_id, session_id)
(standard update-mode compaction).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

GAP_US = 1800 * 1_000_000

OUTPUT_SCHEMA = T.StructType([
    T.StructField("user_id", T.LongType(), False),
    T.StructField("session_id", T.LongType(), False),
    T.StructField("n_events", T.LongType(), False),
    T.StructField("duration_us", T.LongType(), False),
])

STATE_SCHEMA = T.StructType([
    T.StructField("session_id", T.LongType(), False),
    T.StructField("session_start_us", T.LongType(), False),
    T.StructField("last_ts_us", T.LongType(), False),
    T.StructField("n_events", T.LongType(), False),
])


def _sessionize_group(key, pdfs: Iterator[pd.DataFrame],
                      state: GroupState) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    if state.exists:
        session_id, start_us, last_us, n = state.get
    else:
        session_id, start_us, last_us, n = 0, 0, None, 0

    touched: dict[int, tuple[int, int]] = {}  # session_id -> (n, duration)
    # applyInPandasWithState delivers one GROUP as multiple Arrow-sized
    # chunks with no global order guarantee: materialize the whole group and
    # sort ONCE over (tsl, event_id) — per-chunk sorts would fold
    # out-of-order timestamps and split sessions wrongly (cross-batch late
    # data would additionally need event-time timeouts; the batch
    # cross-check feeds waves in time order)
    chunks = [pdf for pdf in pdfs if len(pdf)]
    if chunks:
        pdf = (pd.concat(chunks, ignore_index=True)
               if len(chunks) > 1 else chunks[0])
        pdf = pdf.sort_values(["tsl", "event_id"])
        for tsl in pdf["tsl"]:
            tsl = int(tsl)
            if last_us is None or tsl - last_us > GAP_US:
                session_id += 1
                start_us = tsl
                n = 0
            n += 1
            last_us = tsl
            touched[session_id] = (n, last_us - start_us)

    state.update((session_id, start_us, last_us, n))
    if not touched:
        return
    yield pd.DataFrame({
        "user_id": [user_id] * len(touched),
        "session_id": list(touched.keys()),
        "n_events": [v[0] for v in touched.values()],
        "duration_us": [v[1] for v in touched.values()],
    })


def sessionize_stream(spark: SparkSession, source_dir: str,
                      max_files_per_trigger: int = 1) -> DataFrame:
    """readStream over events -> per-user stateful sessionization."""
    from pyspark.sql import functions as F

    events = (spark.readStream
              .schema("event_id long, ts timestamp, user_id long, "
                      "event_type string, value double, props string")
              .option("maxFilesPerTrigger", str(max_files_per_trigger))
              .parquet(source_dir))
    keyed = events.select(
        "user_id", "event_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("tsl"))
    return (keyed.groupBy("user_id")
            .applyInPandasWithState(
                _sessionize_group,
                outputStructType=OUTPUT_SCHEMA,
                stateStructType=STATE_SCHEMA,
                outputMode="update",
                timeoutConf=GroupStateTimeout.NoTimeout))


def run_sessionize(spark: SparkSession, source_dir: str, checkpoint_dir: str,
                   query_name: str = "sessions") -> DataFrame:
    """Drive to completion over available files; the memory sink accumulates
    per-batch UPDATES, so compact to the last update per (user, session)."""
    from pyspark.sql import functions as F

    q = (sessionize_stream(spark, source_dir).writeStream
         .format("memory")
         .queryName(query_name)
         .outputMode("update")
         .option("checkpointLocation", checkpoint_dir)
         .trigger(availableNow=True)
         .start())
    if not q.awaitTermination(300):
        q.stop()
        raise TimeoutError(
            f"streaming query {query_name!r} did not drain available files "
            "within 300s — refusing to compact a partial update stream")
    raw = spark.table(query_name)
    # last update wins: the biggest (n_events, duration) per session is the
    # final fold state (n_events grows monotonically within a session)
    return (raw.groupBy("user_id", "session_id")
            .agg(F.max(F.struct("n_events", "duration_us")).alias("w"))
            .select("user_id", "session_id",
                    F.col("w.n_events").alias("n_events"),
                    F.col("w.duration_us").alias("duration_us")))
