"""Pages-table I/O: synthesize the corpus as a DataFrame / parquet layout.

Input contract (BASELINE.json input_hint):
(url string, warc_ts timestamp, html binary, text string, lang string).

The parquet layout mirrors what an Iceberg table with
``partitioned by (days(warc_ts), bucket(N, url))`` gives: day partition dirs +
url-hash bucketing via repartition, so partition pruning on warc_ts and
bucket-local joins survive the seam (SURVEY.md §7.0: no Iceberg jars in this
sandbox).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType, StringType, StructField, StructType, TimestampType,
)

from pdf_parser_spark.sources.corpus import generate_corpus

PAGES_SCHEMA = StructType([
    StructField("url", StringType(), False),
    StructField("warc_ts", TimestampType(), True),
    StructField("html", BinaryType(), True),
    StructField("text", StringType(), True),
    StructField("lang", StringType(), True),
])


def synthetic_pages(spark: SparkSession, n_docs: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic corpus as a DataFrame (generator is a pure function)."""
    rows = generate_corpus(n_docs, seed)
    data = [
        (r["url"], r["warc_ts"], r["html"], r["text"], r["lang"]) for r in rows
    ]
    return spark.createDataFrame(data, PAGES_SCHEMA)


def write_synthetic_pages_parquet(
    path: str, n_docs: int, seed: int = 42, shard_rows: int = 19200
) -> str:
    """Generate the corpus and write sharded parquet with pyarrow directly —
    no JVM round-trip.  spark.createDataFrame ships every row through the
    driver's Python->JVM pickler with per-field schema verification, which is
    minutes-to-hung at 10^5+ fat rows; pyarrow columnar write is seconds, and
    reading a parquet table is the production input shape anyway
    (BASELINE.json: the job reads an Iceberg table, not driver memory)."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    schema = pa.schema([
        ("url", pa.string()),
        ("warc_ts", pa.timestamp("us", tz="UTC")),
        ("html", pa.binary()),
        ("text", pa.string()),
        ("lang", pa.string()),
    ])
    rows = generate_corpus(n_docs, seed)
    os.makedirs(path, exist_ok=True)
    cols = ("url", "warc_ts", "html", "text", "lang")
    for shard, start in enumerate(range(0, len(rows), shard_rows)):
        chunk = rows[start: start + shard_rows]
        table = pa.Table.from_pydict(
            {c: [r[c] for r in chunk] for c in cols}, schema=schema
        )
        pq.write_table(table, f"{path}/part-{shard:04d}.parquet")
    return path


def write_pages(df: DataFrame, path: str, buckets: int = 8) -> None:
    """Persist with day partitioning + url-hash bucketing-by-repartition."""
    (
        df.withColumn("ds", F.date_format("warc_ts", "yyyy-MM-dd"))
        .repartition(buckets, F.xxhash64("url"))
        .write.mode("overwrite")
        .partitionBy("ds")
        .parquet(path)
    )


def read_pages(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path).select("url", "warc_ts", "html", "text", "lang")


def write_bucketed_table(
    df: DataFrame, table: str, path: str, buckets: int = 8, key: str = "url"
) -> None:
    """True Spark bucketing (the parquet stand-in for Iceberg
    ``bucket(N, url)`` — SURVEY.md §7.0): hash-bucket + sort by the key at
    write time so downstream equi-joins between tables bucketed on the same
    key run with ZERO Exchange on either side (sort-merge join straight off
    the scans).  At 10^12 rows this is the difference between re-shuffling
    the corpus per join and never shuffling it at all."""
    (
        df.write.mode("overwrite")
        .format("parquet")
        .option("path", path)
        .bucketBy(buckets, key)
        .sortBy(key)
        .saveAsTable(table)
    )
