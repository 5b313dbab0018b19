"""Crawl snapshot diffing: classify each url/doc of two corpus snapshots as
added / removed / changed / unchanged by content fingerprint.

Incremental crawls produce a new snapshot per cycle; the diff drives what
gets re-extracted (changed+added) and what gets tombstoned (removed) — the
input side of the checkpoint/resume machinery in operators/pipeline.py.

One full outer join on the snapshot key (doc_id here, url in production)
with md5 fingerprints — a single shuffle; at 10^12 rows both snapshots are
bucketed on the key so the join is co-located (zero-Exchange, same layout
as sources/pages.write_bucketed_table).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def snapshot_diff(old: DataFrame, new: DataFrame, key: str = "doc_id") -> DataFrame:
    """(key, change) for change in added/removed/changed/unchanged.
    Inputs: (key, fp) frames."""
    o = old.select(F.col(key).alias("k"), F.col("fp").alias("old_fp"))
    n = new.select(F.col(key).alias("k"), F.col("fp").alias("new_fp"))
    change = (
        F.when(F.col("old_fp").isNull(), F.lit("added"))
        .when(F.col("new_fp").isNull(), F.lit("removed"))
        .when(F.col("old_fp") != F.col("new_fp"), F.lit("changed"))
        .otherwise(F.lit("unchanged"))
    )
    return (
        o.join(n, "k", "full_outer")
        .select(F.col("k").alias(key), change.alias("change"))
        .orderBy(key)
    )


# demo split formulas (the oracle re-derives them): old snapshot = even
# doc_ids; new snapshot = doc_id % 5 != 4; text revised when doc_id % 11 == 0
OLD_MOD, NEW_MOD, REV_MOD = 2, 5, 11


def demo_snapshots(documents: DataFrame) -> tuple[DataFrame, DataFrame]:
    d = F.col("doc_id")
    fp_old = F.md5("text")
    fp_new = F.md5(
        F.when(d % REV_MOD == 0, F.concat(F.col("text"), F.lit(" [rev]")))
        .otherwise(F.col("text"))
    )
    old = documents.where(d % OLD_MOD == 0).select("doc_id", fp_old.alias("fp"))
    new = documents.where(d % NEW_MOD != NEW_MOD - 1).select("doc_id", fp_new.alias("fp"))
    return old, new
