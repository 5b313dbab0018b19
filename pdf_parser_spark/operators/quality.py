"""Fleet-wide structural quality stage (SURVEY.md §5 level 4).

The reference runs its 9 output checks one file at a time in a CLI loop
(reference test_runner.py main); here they are one vectorized Arrow stage over
the extracted table (url, markdown, filing_type already colocated per row — no
shuffle) followed by a relational pass-rate rollup (one partial agg).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

CHECKS_SCHEMA = "url string, check string, passed boolean, detail string"


def structural_check_stage(extracted: DataFrame) -> DataFrame:
    """(url, markdown, filing_type) -> one row per (url, check)."""
    cols = ["url", "markdown"] + (
        ["filing_type"] if "filing_type" in extracted.columns else []
    )
    narrow = extracted.select(*cols)

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pdf_parser_spark.core.quality import structural_checks

        for pdf in batches:
            recs = []
            fts = pdf["filing_type"] if "filing_type" in pdf else None
            for i, url in enumerate(pdf["url"]):
                md = pdf["markdown"].iat[i] or ""
                ft = fts.iat[i] if fts is not None else None
                for c in structural_checks(md, ft):
                    recs.append((url, c.check, c.passed, c.detail))
            yield pd.DataFrame(recs, columns=["url", "check", "passed", "detail"])

    return narrow.mapInPandas(fn, CHECKS_SCHEMA)


def quality_summary(checks: DataFrame) -> DataFrame:
    """Pass-rate per check across the fleet — the reference's per-PDF report
    table (test_runner.py report rendering) as one groupBy."""
    return (
        checks.groupBy("check")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(F.col("passed").cast("long")).alias("n_pass"),
            F.round(F.avg(F.col("passed").cast("double")), 4).alias("pass_rate"),
        )
        .orderBy("check")
    )
