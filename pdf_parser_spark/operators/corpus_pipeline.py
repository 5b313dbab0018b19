"""End-to-end training-corpus builder: the composite job a large-scale
LLM-data pipeline runs, chaining this engine's operators in their production
order over a Common-Crawl-style pages table:

    pages
      -> exact dedup (binary content fingerprint, pre-extraction)  [1 shuffle]
      -> Arrow extraction stage (mapInPandas, fail-soft)           [narrow]
      -> checkpointed sink + lineage (resumable)                   [sink]
      -> ok-status filter (partition-pruned scan)                  [narrow]
      -> C4/Gopher quality gate over the extracted markdown        [narrow]
      -> MinHash-LSH near-dup candidates over surviving text       [banded]
      -> connected components -> one keeper per near-dup cluster   [iterative]
      -> final corpus sink + per-stage funnel stats                [sink]

Scale shape: the only all-to-all movements are the fingerprint groupBy, the
LSH band groupBy-join (bucket-local pairs, never a cross product), and the
component propagation (joins over the tiny candidate subset).  The quality
gate and extraction are narrow.  Mirrors never reach Python; near-dup losers
never reach the sink.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pdf_parser_spark.operators.checkpoint import write_checkpoint
from pdf_parser_spark.operators.dedup import (
    connected_components, minhash_lsh_pairs,
)
from pdf_parser_spark.operators.extract import extract_stage
from pdf_parser_spark.operators.pipeline import dedup_pages
from pdf_parser_spark.operators.textstats import quality_gate

CORPUS_COLS = [
    "url", "report_type", "company", "period_end", "markdown",
    "n_pages", "n_sections",
]


def build_training_corpus(
    pages: DataFrame,
    out_dir: str,
    run_ts: str = "",
    run_id: str = "r0",
) -> tuple[DataFrame, dict[str, int]]:
    """Run the full funnel; returns (final corpus DataFrame, stage counts).

    The counts dict is the funnel audit every production corpus build ships:
    input -> exact-deduped -> extracted-ok -> gate-passed -> keeper set.
    Counts come from the already-materialized checkpoint sink plus tiny
    aggregates — no stage recomputes for counting.
    """
    spark = pages.sparkSession
    stats: dict[str, int] = {"input": pages.count()}

    deduped = dedup_pages(pages)
    stats["after_exact_dedup"] = deduped.count()

    extracted = extract_stage(deduped, run_ts=run_ts)
    materialized = write_checkpoint(extracted, out_dir, run_id=run_id)
    ok = materialized.where(F.col("status") == "ok")
    stats["extracted_ok"] = ok.count()

    # gate over the extracted text (url stands in for doc_id)
    gated_flags = quality_gate(
        ok.select(F.col("url").alias("doc_id"), F.col("markdown").alias("text"))
    ).where(F.col("passed")).select(F.col("doc_id").alias("url"))
    gated = ok.join(gated_flags, on="url", how="left_semi")
    stats["gate_passed"] = gated.count()

    # near-dup resolution: candidates from banded LSH, transitive clusters
    # to one keeper; docs outside any candidate pair are keepers by default
    pairs = minhash_lsh_pairs(
        gated.select(F.col("url").alias("doc_id"), F.col("markdown").alias("text"))
    )
    losers = (
        connected_components(pairs)
        .where(~F.col("is_keeper"))
        .select(F.col("doc_id").alias("url"))
    )
    final = gated.join(losers, on="url", how="left_anti").select(*CORPUS_COLS)
    final.write.mode("overwrite").parquet(f"{out_dir}/corpus")
    out = spark.read.parquet(f"{out_dir}/corpus")
    stats["final_corpus"] = out.count()

    spark.createDataFrame(
        [tuple(stats[k] for k in stats)], ", ".join(f"{k} long" for k in stats)
    ).withColumn("run_id", F.lit(run_id)).write.mode("append").parquet(
        f"{out_dir}/funnel_stats"
    )
    return out, stats
