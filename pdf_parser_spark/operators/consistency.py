"""W1/W2: the cross-document relational stages (the engine's only shuffles).

W2 — cross-filing mapping consistency (ref consistency.py:6-33): the
reference's first-non-empty-wins-in-glob-order dict merge becomes a
deterministic groupBy(label) min_by aggregation over (period_end, url) order,
broadcast-joined back.  W1 — filing-sequence assignment (ref cli.py:121-124):
a row_number window per company, replacing the reference's post-hoc file
rewrite (S7) with a plain column.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def company_key(df: DataFrame) -> DataFrame:
    """Grouping key for cross-filing ops: the extracted company name when
    present, else the url host — computed JVM-side."""
    host = F.regexp_extract(F.col("url"), r"^[a-z]+://([^/]+)/", 1)
    return df.withColumn(
        "company_key",
        F.when(F.col("company") != "", F.col("company")).otherwise(host),
    )


def consistent_mappings(extracted: DataFrame) -> DataFrame:
    """W2.  Explode per-document mappings, pick each label's canonical by
    first-wins over the deterministic filing order (period_end asc, url asc —
    the engine contract replacing CLI glob order), then backfill every
    document's map.

    Plan shape: one shuffle for the groupBy(label); the label->canonical
    dictionary is tiny (taxonomy-bounded) so the join back is a broadcast.
    Returns (url, mappings_consistent map<string,string>).
    """
    exploded = (
        extracted
        .where(F.col("status") == "ok")
        .select("url", "period_end", F.explode_outer("mappings").alias("label", "canonical"))
        .where(F.col("label").isNotNull())
    )
    # first non-empty canonical in (period_end, url) order, via min_by on a
    # struct key (true lexicographic TUPLE order; a concat key would misorder
    # e.g. an empty period_end against a digit-leading url) — a single shuffle, no window needed
    global_map = (
        exploded
        .where(F.col("canonical") != "")
        .groupBy("label")
        .agg(
            F.min_by(
                "canonical", F.struct("period_end", "url")
            ).alias("global_canonical")
        )
    )
    backfilled = (
        exploded
        .join(F.broadcast(global_map), on="label", how="left")
        .withColumn(
            "canonical_final",
            F.when(F.col("canonical") != "", F.col("canonical"))
            .otherwise(F.coalesce("global_canonical", F.lit(""))),
        )
        .groupBy("url")
        .agg(
            F.map_from_entries(
                F.array_sort(
                    F.collect_list(F.struct("label", "canonical_final"))
                )
            ).alias("mappings_consistent")
        )
    )
    return backfilled


def filing_sequence(extracted: DataFrame) -> DataFrame:
    """W1.  filing_sequence = row_number over
    partitionBy(company_key).orderBy(period_end, url) — url tie-break makes the
    output deterministic under retries (north_rule).  Input must have
    company_key (see company_key())."""
    w = Window.partitionBy("company_key").orderBy(
        F.col("period_end").asc_nulls_last(), F.col("url").asc()
    )
    return extracted.withColumn("filing_sequence", F.row_number().over(w))


def finalize(extracted: DataFrame) -> DataFrame:
    """Full cross-document post-processing: company_key -> W1 sequence ->
    W2 consistent mappings joined back.  Two shuffles total (window +
    label groupBy), matching SURVEY.md §3.1 stage layout."""
    keyed = company_key(extracted)
    sequenced = filing_sequence(keyed)
    maps = consistent_mappings(extracted)
    return sequenced.join(maps, on="url", how="left")
