"""SparkSession factory with the engine's standard configuration.

Tuned for scale-out first (AQE, skew-join handling, Arrow batching), then
tested on local[N].  Every knob here maps 1:1 onto a multi-executor
cluster submit (`spark-submit --py-files ocr_spark.zip ...`).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Arrow batch sizing (SURVEY.md §4.2 item 4): small fixed record counts
# (e.g. 256) double-count as overhead on the dominant tiny-text rows —
# measured ~2x pipeline throughput going 256 → 4096+. Spark 4's byte cap
# handles the multi-MB media payload rows instead: a batch closes at
# MAX_BYTES even if far below MAX_RECORDS, so a 10 MB-payload row (the
# reference's max_file_size, src/config/settings.py:25) never amplifies
# into a multi-GB batch.
ARROW_MAX_RECORDS_PER_BATCH = 10000
ARROW_MAX_BYTES_PER_BATCH = 16 * 1024 * 1024


def get_spark(
    app_name: str = "ocr_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the engine SparkSession.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (env, default 32) so
    the identical code path runs under ``spark-submit --master yarn`` on a
    real cluster.
    """
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    if master is None:
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        # local mode: match cores; cluster mode overrides via extra_conf.
        shuffle_partitions = max(cpus, _parallelism_of(master))

    b = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config(
            "spark.sql.execution.arrow.maxRecordsPerBatch",
            str(ARROW_MAX_RECORDS_PER_BATCH),
        )
        .config(
            "spark.sql.execution.arrow.maxBytesPerBatch",
            str(ARROW_MAX_BYTES_PER_BATCH) + "b",
        )
        # parquet scans: allow coalescing many small synthetic files
        .config("spark.sql.files.maxPartitionBytes", "128m")
        .config("spark.driver.memory", os.environ.get("OCR_SPARK_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
    )
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def _parallelism_of(master: str) -> int:
    if master.startswith("local["):
        inner = master[len("local[") : -1]
        if inner == "*":
            return os.cpu_count() or 8
        try:
            return int(inner)
        except ValueError:
            return 8
    return 32
