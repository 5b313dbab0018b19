"""readStream -> extraction stage -> writeStream (parquet sink).

Usage:
    q = stream_extract(spark, in_dir, out_dir, ckpt_dir)
    q.processAllAvailable(); q.stop()

The extraction stage is stateless per row, so no watermark is needed; a
file-source stream gives exactly-once via the sink checkpoint.  Late-data
window aggregation is demonstrated in streaming_metrics()."""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from pdf_parser_spark.operators.extract import extract_stage
from pdf_parser_spark.sources.pages import PAGES_SCHEMA


def stream_extract(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    run_ts: str = "",
    max_files_per_trigger: int = 4,
) -> StreamingQuery:
    pages = (
        spark.readStream.schema(PAGES_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(input_dir)
    )
    extracted = extract_stage(pages, run_ts=run_ts, repartition=False)
    return (
        extracted.writeStream.format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .start()
    )


def streaming_metrics(
    spark: SparkSession,
    input_dir: str,
    checkpoint_dir: str,
    window: str = "1 hour",
    watermark: str = "2 hours",
):
    """Windowed doc counts with a watermark for late rows — the standard
    streaming-aggregation shape, returned as a memory-sink query for tests."""
    pages = spark.readStream.schema(PAGES_SCHEMA).parquet(input_dir)
    agg = (
        pages.withWatermark("warc_ts", watermark)
        .groupBy(F.window("warc_ts", window), "lang")
        .count()
    )
    return (
        agg.writeStream.format("memory")
        .queryName("pages_by_window")
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .start()
    )
