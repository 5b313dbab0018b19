"""XBRL dimension operators re-expressed relationally (SURVEY.md §2.7 N6/N7,
§2.8 V8).

The reference walks nested JSON per company in Python (edgar_client.py:116-295)
and intersects dicts per document (confidence.py:30-84).  At fleet scale the
same semantics are joins and windows over a pre-materialized facts dimension:

- N7 accession lookup  -> equi-join on (cik, form_base, report_date) with the
  '/A' amendment suffix normalized off both sides (edgar_client.py:128-131).
- N6 statement facts   -> unit-preference rank (edgar_client.py:210) +
  segment filter (229-230) + period grouping "most recent <=4 end dates,
  longest duration per end date" (255-275) as two window functions.
- V8 cross-validation  -> join PDF-extracted values to XBRL values on
  (cik, concept); severity bands info <=1% < warn <=5% < error
  (confidence.py:62-77).

All dimension sides are broadcast — constant-size relative to the document
fact table, so no shuffle lands on the 10^12-row side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from pdf_parser_spark.sources.xbrl import UNIT_ORDER


def normalize_form(col: F.Column) -> F.Column:
    """'10-Q/A' -> '10-Q' (ref edgar_client.py:128-131)."""
    return F.regexp_replace(col, r"/A$", "")


def accession_lookup(requests: DataFrame, submissions: DataFrame) -> DataFrame:
    """N7: (cik, form, report_date) -> accession.  Broadcast equi-join; the
    reference's linear scan over submissions arrays becomes a hash lookup."""
    subs = submissions.select(
        F.col("cik").alias("s_cik"),
        normalize_form(F.col("form")).alias("s_form"),
        F.col("report_date").alias("s_date"),
        "accession",
    )
    return (
        requests.join(
            F.broadcast(subs),
            (F.col("cik") == F.col("s_cik"))
            & (normalize_form(F.col("form")) == F.col("s_form"))
            & (F.col("report_date") == F.col("s_date")),
            "left",
        )
        .select("cik", "form", "report_date", "accession")
        .orderBy("cik", "report_date", "form")
    )


def statement_facts(facts: DataFrame, max_periods: int = 4) -> DataFrame:
    """N6: per (cik, concept) pick the preferred unit, drop segment-tagged
    rows, keep the longest-duration fact per end date, and keep the most
    recent ``max_periods`` end dates.

    Two logical windows, both partitioned by (cik, concept) — a single
    shuffle of the (small) facts dimension."""
    unit_rank = F.array_position(
        F.lit(list(UNIT_ORDER)).cast("array<string>"), F.col("unit")
    )
    base = (
        facts.where(F.col("segment").isNull())
        .withColumn("unit_rank", unit_rank)
        .where(F.col("unit_rank") > 0)
    )
    w_cc = Window.partitionBy("cik", "concept")
    best_unit = base.withColumn(
        "best_rank", F.min("unit_rank").over(w_cc)
    ).where(F.col("unit_rank") == F.col("best_rank"))

    # longest duration per end date (tie: earliest start, then highest val —
    # a total order so the pick is deterministic)
    w_end = Window.partitionBy("cik", "concept", "end_date").orderBy(
        F.datediff(F.col("end_date"), F.col("start_date")).desc(),
        F.col("start_date").asc(),
        F.col("val").desc(),
    )
    per_end = best_unit.withColumn("rn", F.row_number().over(w_end)).where(
        F.col("rn") == 1
    )

    # most recent <= max_periods end dates
    w_recent = Window.partitionBy("cik", "concept").orderBy(
        F.col("end_date").desc()
    )
    return (
        per_end.withColumn("recency", F.row_number().over(w_recent))
        .where(F.col("recency") <= max_periods)
        .select("cik", "concept", "end_date", "start_date", "unit", "val")
        .orderBy("cik", "concept", F.col("end_date").desc())
    )


def cross_validate(pdf_values: DataFrame, xbrl_values: DataFrame) -> DataFrame:
    """V8: severity of PDF-vs-XBRL disagreement per (cik, concept).

    pdf_values:  (cik, concept, pdf_val)   — one row per extracted canonical
    xbrl_values: (cik, concept, xbrl_val)  — e.g. most-recent N6 fact

    Bands (ref confidence.py:62-77): match <=1% rel-diff -> 'match';
    <=5% -> 'minor'; else 'major'; missing on either side -> 'pdf_only' /
    'xbrl_only'."""
    j = pdf_values.join(
        F.broadcast(xbrl_values), ["cik", "concept"], "full_outer"
    )
    rel = F.abs(F.col("pdf_val") - F.col("xbrl_val")) / F.greatest(
        F.abs(F.col("xbrl_val")), F.lit(1.0)
    )
    severity = (
        F.when(F.col("pdf_val").isNull(), "xbrl_only")
        .when(F.col("xbrl_val").isNull(), "pdf_only")
        .when(rel <= 0.01, "match")
        .when(rel <= 0.05, "minor")
        .otherwise("major")
    )
    return (
        j.select("cik", "concept", severity.alias("severity"))
        .groupBy("severity")
        .agg(F.count("*").alias("n"))
        .orderBy("severity")
    )


# XBRL US-GAAP concept -> taxonomy canonical (the slice of the reference's
# xbrl_taxonomy_map.yaml covering the synthesized facts dimension's concepts;
# ref edgar_client.py:160-175 loads the full map the same shape)
CONCEPT_CANONICAL: dict[str, str] = {
    "Revenues": "Revenue",
    "NetIncomeLoss": "Net Income",
    "Assets": "Total Assets",
    "Liabilities": "Total Liabilities",
    "StockholdersEquity": "Total Stockholders' Equity",
    "CashAndCashEquivalentsAtCarryingValue": "Cash & Cash Equivalents",
}


def fleet_cross_validate(extracted: DataFrame, facts: DataFrame) -> DataFrame:
    """V8 fleet-wide: per-(url, concept) severity of PDF-vs-XBRL disagreement
    (ref pipeline.py:272-317 + confidence.py:30-84, relational edition).

    extracted carries statement_values (canonical -> extracted value) from the
    Arrow stage; facts is the pre-materialized XBRL dimension.  Plan: explode
    the per-doc map (narrow), broadcast-join the concept dictionary and the
    N6-reduced most-recent facts — the fact dimension is bounded by
    (companies x concepts), tiny next to the corpus, so the fact side is
    always the broadcast build side and the corpus never shuffles.

    Returns (url, cik, concept, pdf_val, xbrl_val, severity).
    """
    spark = extracted.sparkSession
    concept_dim = spark.createDataFrame(
        [(k, v) for k, v in CONCEPT_CANONICAL.items()],
        "concept string, canonical string",
    )
    latest = (
        statement_facts(facts, max_periods=1)
        .select("cik", "concept", F.col("val").alias("xbrl_val"))
    )
    pdf_vals = (
        extracted
        .where((F.col("status") == "ok") & (F.col("cik") != ""))
        .select(
            "url",
            # cover pages print the cik unpadded; EDGAR keys are 10-digit
            # zero-padded (ref edgar_client.py CIK{int(cik):010d})
            F.lpad(F.col("cik"), 10, "0").alias("cik"),
            F.explode("statement_values").alias("canonical", "pdf_val"),
        )
        .join(F.broadcast(concept_dim), "canonical")
    )
    rel = F.abs(F.col("pdf_val") - F.col("xbrl_val")) / F.greatest(
        F.abs(F.col("xbrl_val")), F.lit(1.0)
    )
    severity = (
        F.when(F.col("xbrl_val").isNull(), "pdf_only")
        .when(rel <= 0.01, "match")
        .when(rel <= 0.05, "minor")
        .otherwise("major")
    )
    return (
        pdf_vals.join(F.broadcast(latest), ["cik", "concept"], "left")
        .select(
            "url", "cik", "concept", "pdf_val", "xbrl_val",
            severity.alias("severity"),
        )
    )
