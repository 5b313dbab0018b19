"""JSONL (newline-delimited JSON) interchange connector.

Crawl dumps and curated corpora commonly ship as gzipped JSONL (one JSON
object per line — the CC-NEWS / HuggingFace-datasets interchange shape).
Read and write are both native Spark JSON paths: whole-stage-codegen
parsing, predicate/column pruning into the scan, no Python anywhere.

Binary columns (html payloads) cross the text format as base64 — encoded
with ``F.base64`` on write and restored with ``F.unbase64`` on read, so a
bytes-in == bytes-out round trip is testable with md5 pins.

Scale notes: plain JSONL shards split by newline, so one large file
parallelizes across tasks; .gz shards parallelize at file granularity
(write many shards).  Schema is always passed explicitly on read —
``spark.read.json`` without a schema triggers a full inference scan, which
is a double read of the corpus at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    LongType, StringType, StructField, StructType, TimestampType,
)

# pages-table wire schema: html binary travels as a base64 string field
PAGES_WIRE_SCHEMA = StructType([
    StructField("url", StringType(), True),
    StructField("warc_ts", TimestampType(), True),
    StructField("html_b64", StringType(), True),
    StructField("text", StringType(), True),
    StructField("lang", StringType(), True),
])


def write_jsonl(pages: DataFrame, out_dir: str, n_files: int = 4, gzip: bool = True) -> str:
    """pages(url, warc_ts, html binary, text, lang) -> JSONL shards,
    range-partitioned by url for deterministic shard contents."""
    wire = pages.select(
        "url", "warc_ts", F.base64("html").alias("html_b64"), "text", "lang"
    ).repartitionByRange(n_files, "url").sortWithinPartitions("url")
    w = wire.write.mode("overwrite")
    if gzip:
        w = w.option("compression", "gzip")
    w.json(out_dir)
    return out_dir


def read_jsonl(spark: SparkSession, path: str) -> DataFrame:
    """JSONL shards -> pages(url, warc_ts, html binary, text, lang); explicit
    schema (no inference scan), base64 decoded back to binary."""
    wire = spark.read.schema(PAGES_WIRE_SCHEMA).json(path)
    return wire.select(
        "url", "warc_ts", F.unbase64("html_b64").alias("html"), "text", "lang"
    )


def roundtrip(spark: SparkSession, sf_dir: str, scratch_root: str | None = None) -> DataFrame:
    """Driver query: documents -> pages -> JSONL shards -> connector read ->
    fidelity columns.  text_md5 and html_md5 (binary payload through base64)
    prove the byte-exact round trip; the oracle recomputes both from the
    documents table alone."""
    import os
    import tempfile

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    pages = docs.select(
        F.concat(F.lit("doc://"), F.col("source"), F.lit("/"), F.col("doc_id")).alias("url"),
        F.lit(None).cast("timestamp").alias("warc_ts"),
        F.encode(F.concat(F.lit("<html><body>"), F.col("text"), F.lit("</body></html>")),
                 "UTF-8").alias("html"),
        F.col("text"),
        F.col("lang"),
    )
    root = scratch_root or tempfile.gettempdir()
    out_dir = os.path.join(
        root, f"pdf_parser_spark_jsonl_{os.path.basename(sf_dir.rstrip('/'))}"
    )
    write_jsonl(pages, out_dir)
    back = read_jsonl(spark, out_dir)
    return back.select(
        F.regexp_extract("url", r"/([0-9]+)$", 1).cast("long").alias("doc_id"),
        "url", "lang",
        F.length("text").cast("long").alias("n_chars_rt"),
        F.md5("text").alias("text_md5"),
        F.md5("html").alias("html_md5"),
    ).orderBy("doc_id")
