"""Streaming exact deduplication: readStream -> content fingerprint ->
dropDuplicates -> append sink.

The streaming twin of ``operators.dedup.exact_dedup_groups`` (same md5
fingerprint over whitespace-normalized lowercase text) — on an unbounded
crawl feed the first-seen document per fingerprint passes through and every
later mirror is dropped by the dedup state store.

Scale note: plain ``dropDuplicates`` keeps one state row per distinct
fingerprint forever — correct, and at 10^12 docs the state is the distinct-
content count (far smaller than the feed) sharded across executors by the
fingerprint key (RocksDB state store in production).  When business rules
allow a time bound ("mirrors arrive within N days"),
``dropDuplicatesWithinWatermark`` swaps in with an event-time watermark and
the state becomes bounded; the exactness oracle here uses the unbounded form
so the output is the exact distinct set.
"""

from __future__ import annotations

import os
import shutil
import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    LongType, StringType, StructField, StructType,
)

DOCS_SCHEMA = StructType([
    StructField("doc_id", LongType(), True),
    StructField("text", StringType(), True),
    StructField("lang", StringType(), True),
    StructField("source", StringType(), True),
    StructField("n_chars", LongType(), True),
])


def stream_dedup(
    spark: SparkSession, input_dir: str, checkpoint_dir: str, query_name: str
):
    """File-source stream of documents -> fingerprint -> dropDuplicates(fp)
    -> memory sink (append).  One shuffle on fp; state co-located with it."""
    docs = spark.readStream.schema(DOCS_SCHEMA).parquet(input_dir)
    fp = F.md5(F.lower(F.regexp_replace(F.trim(F.col("text")), r"\s+", " ")))
    deduped = docs.withColumn("fp", fp).select("fp").dropDuplicates(["fp"])
    return (
        deduped.writeStream.format("memory")
        .queryName(query_name)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .start()
    )


def dedup_via_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded replay harness: stream the documents table through the dedup
    operator and return the surviving fingerprint set as a batch DataFrame
    (oracle-comparable to SELECT DISTINCT fp)."""
    work = tempfile.mkdtemp(prefix="dedup_stream_")
    in_dir = os.path.join(work, "in")
    ckpt = os.path.join(work, "ckpt")
    os.makedirs(in_dir)
    name = "dedup_" + uuid.uuid4().hex[:8]
    try:
        shutil.copy(
            os.path.join(sf_dir, "documents.parquet"),
            os.path.join(in_dir, "batch0.parquet"),
        )
        q = stream_dedup(spark, in_dir, ckpt, name)
        q.processAllAvailable()
        q.stop()
        out = spark.table(name).orderBy("fp").persist()
        out.count()  # materialize before the temp input dir is deleted
        return out
    finally:
        shutil.rmtree(work, ignore_errors=True)
