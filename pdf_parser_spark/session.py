"""SparkSession factory with scale-appropriate defaults.

Knobs follow SURVEY.md §4: AQE on (post-shuffle coalescing + skew-join
splitting), Arrow exchange on with a SMALL batch size (rows carry multi-MB
html/markdown payloads — 10^2-sized batches bound executor memory), shuffle
partitions sized for the local harness but overridable for cluster runs.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = int(os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS", "32"))
ARROW_BATCH_ROWS = int(os.environ.get("SPARK_GRAFT_ARROW_BATCH", "128"))


def get_spark(
    app_name: str = "pdf-parser-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
) -> SparkSession:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    master = master or os.environ.get("SPARK_MASTER")
    if master is None and os.environ.get("SPARK_ENV_LOADED") != "1":
        # plain `python` launch -> local fallback; under spark-submit
        # (SPARK_ENV_LOADED=1) the --master flag is already in the JVM conf
        # and must NOT be overridden (a yarn/k8s submit would silently run
        # local otherwise)
        master = f"local[{cpus}]"
    builder = (
        SparkSession.builder.appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions or DEFAULT_SHUFFLE_PARTITIONS))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # Python DataSource filter pushdown (Spark 4.1; the warc source's
        # pushFilters is an assertion error without it)
        .config("spark.sql.python.filterPushdown.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", str(ARROW_BATCH_ROWS))
        # html/markdown rows are fat: keep scan partitions modest
        .config("spark.sql.files.maxPartitionBytes", "64m")
        # markdown/text columns compress ~2x better under zstd than snappy at
        # equal-or-less write wall (measured: 10.8 -> 5.9 MB, 1.58 -> 1.43 s
        # on the extracted sink) — at 100 TB the scan I/O saving dominates
        .config("spark.sql.parquet.compression.codec", "zstd")
        .config("spark.sql.autoBroadcastJoinThreshold", "64m")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
    )
    if master:
        builder = builder.master(master)
    return builder.getOrCreate()
