"""SparkSession factory tuned for the KG-construction workload.

Local mode stands in for a multi-executor cluster; every setting here is one
that would carry over to a real cluster (AQE, skew join handling, Arrow
batching sized for large ``content`` blobs).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    cpus: int | None = None,
    app_name: str = "codeontologypython_spark",
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession.

    cpus defaults to $SPARK_GRAFT_CPUS or all cores. Shuffle partitions
    default to the core count — at cluster scale this would be set to
    2-3x total executor cores instead.
    """
    if cpus is None:
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))
    if shuffle_partitions is None:
        # several per core: the KG shuffles (dedup, IRI aggregation) move
        # multi-GB string payloads, and undersized shuffle partitions spill;
        # AQE coalesces small shuffles back down automatically
        shuffle_partitions = max(cpus * 4, 16)
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # source rows carry whole files in `content`; keep Arrow batches small
        # enough that a batch of large files fits in worker memory
        # (SURVEY.md §7 hard-part 7)
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "512")
        # local mode: driver heap is the only memory knob; the extraction
        # stage keeps ~cpus concurrent ~100MB Arrow batches in flight, and an
        # undersized heap turns into kernel-side reclaim storms (measured
        # 31% system time at 16g / 32 cores)
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
