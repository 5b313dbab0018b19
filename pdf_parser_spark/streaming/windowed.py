"""Watermarked tumbling-window aggregation over the event stream.

The third streaming pattern beside stateful sessionization
(streaming/sessionize.py) and exact dedup (streaming/dedup.py): event-time
tumbling windows with a late-data watermark — the canonical Structured
Streaming shape for per-hour crawl/traffic rollups.

Scale notes: state is one row per open (window, event_type) group, evicted
as the watermark passes the window end — bounded by (windows-in-watermark ×
event types), independent of stream length.  The groupBy shuffles once on
the (window, event_type) key; late rows older than the watermark are
dropped before state lookup.
"""

from __future__ import annotations

import os
import shutil
import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType, LongType, StringType, StructField, StructType, TimestampType,
)

EVENTS_SCHEMA = StructType([
    StructField("event_id", LongType(), True),
    StructField("ts", TimestampType(), True),
    StructField("user_id", LongType(), True),
    StructField("event_type", StringType(), True),
    StructField("value", DoubleType(), True),
    StructField("props", StringType(), True),
])


def stream_window_counts(
    spark: SparkSession,
    input_dir: str,
    checkpoint_dir: str,
    query_name: str,
    window: str = "1 hour",
    watermark: str = "30 minutes",
    output_mode: str = "append",
):
    """File-source event stream -> withWatermark -> tumbling-window groupBy
    -> memory sink.  In append mode a window row is emitted exactly once,
    when the watermark passes its end; rows arriving later than the
    watermark are dropped (tested in test_streaming_window_counts)."""
    events = spark.readStream.schema(EVENTS_SCHEMA).parquet(input_dir)
    agg = (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window), F.col("event_type"))
        .agg(
            F.count("*").alias("n_events"),
            F.min("event_id").alias("min_event_id"),
            F.max("event_id").alias("max_event_id"),
        )
    )
    return (
        agg.writeStream.format("memory")
        .queryName(query_name)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode(output_mode)
        .start()
    )


def window_counts_via_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded replay harness for the oracle: one batch in complete mode (a
    single-batch replay never advances the watermark past the tail windows,
    so append mode would under-emit; complete mode yields every window and
    must equal the batch GROUP BY date_trunc oracle exactly)."""
    work = tempfile.mkdtemp(prefix="winagg_stream_")
    in_dir = os.path.join(work, "in")
    ckpt = os.path.join(work, "ckpt")
    os.makedirs(in_dir)
    name = "winagg_" + uuid.uuid4().hex[:8]
    try:
        shutil.copy(
            os.path.join(sf_dir, "events.parquet"),
            os.path.join(in_dir, "batch0.parquet"),
        )
        q = stream_window_counts(
            spark, in_dir, ckpt, name, output_mode="complete"
        )
        q.processAllAvailable()
        q.stop()
        out = (
            spark.table(name)
            .select(
                F.col("window.start").cast("long").alias("window_start"),
                "event_type",
                "n_events",
                "min_event_id",
                "max_event_id",
            )
            .orderBy("window_start", "event_type")
            .persist()
        )
        out.count()  # materialize before the temp input dir is deleted
        return out
    finally:
        shutil.rmtree(work, ignore_errors=True)
