"""ORC source/sink: the second columnar interchange format beside parquet.

Hive-lineage pipelines hand corpora around as ORC at least as often as
parquet; Spark's native reader/writer covers it with zero extra
dependencies, including binary columns, predicate pushdown, and column
pruning — the same scan-efficiency properties the parquet path relies on
(`.explain` shows PushedFilters/ReadSchema on ORC scans exactly like
parquet ones, pinned in tests/test_plan_shapes-style assertions here via
the round-trip fidelity hash instead).

The driver query is a write->read->hash round trip in the jsonl/warc
roundtrip shape: fidelity columns (text_md5, html_md5 over the binary
payload) are recomputable from the documents table alone, so the DuckDB
oracle never needs to read ORC (it can't) — any encode/decode or
binary-column corruption in the Spark ORC path mismatches the hash.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_orc(pages: DataFrame, out_dir: str, compression: str = "zlib") -> None:
    """Sink: pages -> ORC shards.  At 10^12 rows the parallelism story is
    parquet's (one file per task; partitionBy/bucketing compose the same
    way); zlib is ORC's default codec."""
    pages.write.mode("overwrite").option("compression", compression).orc(out_dir)


def read_orc(spark: SparkSession, in_dir: str) -> DataFrame:
    """Source: ORC shards -> DataFrame; filters/column selection push into
    the ORC reader exactly like parquet (Catalyst treats both as
    FileSourceScanExec with pushdown)."""
    return spark.read.orc(in_dir)


def roundtrip(spark: SparkSession, sf_dir: str, scratch_root: str | None = None) -> DataFrame:
    """Driver query: documents -> pages (binary html) -> ORC -> read ->
    fidelity columns, byte-hash-held to the documents-only oracle."""
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
        root, f"pdf_parser_spark_orc_{os.path.basename(sf_dir.rstrip('/'))}"
    )
    write_orc(pages, out_dir)
    back = read_orc(spark, out_dir)
    return back.select(
        F.regexp_extract("url", r"/([0-9]+)$", 1).cast("long").alias("doc_id"),
        "url", "lang",
        F.length("text").cast("long").alias("n_chars_rt"),
        F.md5("text").alias("text_md5"),
        F.md5("html").alias("html_md5"),
    ).orderBy("doc_id")
