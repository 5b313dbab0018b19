"""Stream-stream interval join: view->click attribution.

The fourth streaming pattern beside sessionization, dedup, and windowed
aggregation — and the one whose STATE story is the interesting part: an
unbounded inner join would buffer both streams forever, so Structured
Streaming requires (a) watermarks on both sides and (b) a time-range join
condition, from which it derives exactly how long each side's rows stay
joinable.  Here a click attributes to a view by the same user within
ATTR_HOURS, so view-side state is evictable once the click watermark passes
view_ts + ATTR_HOURS and click-side state once the view watermark passes
click_ts — state is bounded by (events inside the attribution horizon),
independent of stream length.  That eviction math is what makes the join
runnable over a 10^12-event firehose where a batch join would be a
corpus x corpus shuffle.

Single-batch replay (the oracle harness): every qualifying pair is inside
the batch, so the memory sink holds the complete join — byte-equal to the
batch SQL twin by construction.

Ref analog: the reference pairs each filing's PDF values with XBRL facts
fetched in a separate step (sec_parser/xbrl ops); the streaming analog is
two live feeds joined on key + event-time proximity.
"""

from __future__ import annotations

import os
import shutil
import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pdf_parser_spark.streaming.windowed import EVENTS_SCHEMA

ATTR_HOURS = 24       # click attributes to a view up to this long before it
JOIN_WATERMARK = "2 hours"


def stream_attribution_join(
    spark: SparkSession,
    input_dir: str,
    checkpoint_dir: str,
    query_name: str,
    attr_hours: int = ATTR_HOURS,
    watermark: str = JOIN_WATERMARK,
):
    """File-source event stream -> split into view/click legs -> watermark
    both -> inner join on user + [view_ts, view_ts + attr_hours] -> memory
    sink (append: stream-stream inner joins only support append)."""
    ev = spark.readStream.schema(EVENTS_SCHEMA).parquet(input_dir)
    views = (
        ev.where(F.col("event_type") == "view")
        .select(F.col("event_id").alias("view_id"), "user_id",
                F.col("ts").alias("view_ts"))
        .withWatermark("view_ts", watermark)
    )
    clicks = (
        ev.where(F.col("event_type") == "click")
        .select(F.col("event_id").alias("click_id"),
                F.col("user_id").alias("click_user"),
                F.col("ts").alias("click_ts"))
        .withWatermark("click_ts", watermark)
    )
    joined = views.join(
        clicks,
        F.expr(
            f"user_id = click_user AND click_ts >= view_ts "
            f"AND click_ts <= view_ts + interval {int(attr_hours)} hours"
        ),
    ).select("user_id", "view_id", "click_id", "view_ts", "click_ts")
    return (
        joined.writeStream.format("memory")
        .queryName(query_name)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .start()
    )


def attribution_join_via_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded replay harness for the oracle: one batch through the real
    stream-stream join; timestamps surfaced as floor-epoch-seconds BIGINTs
    (the st_window_counts casting doctrine)."""
    work = tempfile.mkdtemp(prefix="attrjoin_stream_")
    in_dir = os.path.join(work, "in")
    ckpt = os.path.join(work, "ckpt")
    os.makedirs(in_dir)
    name = "attrjoin_" + uuid.uuid4().hex[:8]
    try:
        shutil.copy(
            os.path.join(sf_dir, "events.parquet"),
            os.path.join(in_dir, "batch0.parquet"),
        )
        q = stream_attribution_join(spark, in_dir, ckpt, name)
        q.processAllAvailable()
        q.stop()
        out = (
            spark.table(name)
            .select(
                "user_id", "view_id", "click_id",
                F.col("view_ts").cast("long").alias("view_ts_s"),
                F.col("click_ts").cast("long").alias("click_ts_s"),
            )
            .orderBy("user_id", "view_id", "click_id")
            .persist()
        )
        out.count()
        return out
    finally:
        shutil.rmtree(work, ignore_errors=True)
