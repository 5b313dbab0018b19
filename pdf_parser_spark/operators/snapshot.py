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


# ---------------------------------------------------------------------------
# SCD2 url-history collapse over a series of crawl snapshots
# ---------------------------------------------------------------------------

N_SNAPSHOTS = 4  # demo series length; formulas below are per (doc_id, ts)


def snapshot_series(documents: DataFrame, k: int = N_SNAPSHOTS) -> DataFrame:
    """(doc_id, snap_ts, fp) presence rows for k consecutive crawl cycles,
    derived from doc_id alone so the oracle re-builds the series in SQL:
    a doc is absent from cycle ts when (doc_id+ts)%7==0 (gaps, including
    remove-then-reappear), and its content revision is
    rev = (ts * (doc_id%3)) // 2 — doc_id%3==0 never changes, ==1 changes
    once mid-series, ==2 changes every cycle."""
    d = F.col("doc_id")
    ts = F.col("snap_ts")
    rev = F.expr("(snap_ts * (doc_id % 3)) div 2")
    return (
        documents.select(
            "doc_id", "text",
            F.explode(F.sequence(F.lit(0), F.lit(k - 1))).alias("snap_ts"),
        )
        .where((d + ts) % 7 != 0)
        .select(
            "doc_id",
            ts.cast("long").alias("snap_ts"),
            F.md5(F.concat(F.col("text"), F.lit("#"), rev.cast("string"))).alias("fp"),
        )
    )


def scd2_history(snaps: DataFrame, k: int = N_SNAPSHOTS) -> DataFrame:
    """Collapse per-cycle presence rows into SCD2 validity intervals:
    (doc_id, seg, valid_from, valid_to, fp, is_current).

    A new segment opens when the fingerprint changes OR the url was absent
    from the previous cycle (a gap tombstones the old interval even if the
    content returns unchanged — standard recrawl-history semantics).
    is_current marks intervals still live at the final cycle k-1.

    Plan: one lag window + one running-sum window (same partitioning, so
    ONE shuffle on doc_id serves both) + a groupBy(doc_id, seg) that AQE
    coalesces into the same exchange.  At 10^12 urls the history table is
    what incremental extraction diffs against; partitioning/bucketing by
    url-hash keeps every cycle's merge co-located (cf. snapshot_diff)."""
    from pyspark.sql import Window

    w = Window.partitionBy("doc_id").orderBy("snap_ts")
    brk = (
        F.lag("fp").over(w).isNull()
        | (F.col("fp") != F.lag("fp").over(w))
        | (F.col("snap_ts") != F.lag("snap_ts").over(w) + 1)
    )
    seg = F.sum(brk.cast("long")).over(
        Window.partitionBy("doc_id")
        .orderBy("snap_ts")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        snaps.withColumn("seg", seg)
        .groupBy("doc_id", "seg")
        .agg(
            F.min("snap_ts").cast("long").alias("valid_from"),
            F.max("snap_ts").cast("long").alias("valid_to"),
            F.min("fp").alias("fp"),
            (F.max("snap_ts") == k - 1).alias("is_current"),
        )
        .orderBy("doc_id", "seg")
    )


# ---------------------------------------------------------------------------
# Adaptive recrawl scheduling (change-frequency-driven revisit intervals)
# ---------------------------------------------------------------------------

RECRAWL_BASE_HOURS = 6   # interval for a page that changed every cycle
RECRAWL_MAX_DOUBLINGS = 4  # never back off beyond BASE << MAX


def recrawl_schedule(snaps: DataFrame, k: int = N_SNAPSHOTS) -> DataFrame:
    """Adaptive revisit scheduling from observed change history (Cho &
    Garcia-Molina, TODS 2003: revisit frequency proportional to observed
    change frequency): per url, count fingerprint changes across the
    consecutive snapshot pairs it was present for, then back off
    exponentially for stable pages —

        interval_hours = RECRAWL_BASE_HOURS << min(stable_pairs,
                                                   RECRAWL_MAX_DOUBLINGS)

    where stable_pairs = observed consecutive pairs with NO change.  A page
    seen changing every cycle recrawls at BASE; one never seen changing
    backs off geometrically, capped.  Urls observed in < 2 cycles have no
    pair evidence and recrawl at BASE (explore-before-exploit).

    Returns (doc_id, n_obs, n_pairs, n_changes, interval_hours,
    next_fetch_ts) — next_fetch_ts = last snapshot index * 24 +
    interval_hours, all exact BIGINTs.

    Plan: one lag window over the (doc_id, snap_ts) series + one groupBy —
    the same single-shuffle shape as scd2_history; at 10^12 urls this IS
    the frontier-priority input, co-located with the history table by
    url-hash bucketing.
    """
    from pyspark.sql import Window

    w = Window.partitionBy("doc_id").orderBy("snap_ts")
    prev_fp = F.lag("fp").over(w)
    prev_ts = F.lag("snap_ts").over(w)
    is_pair = prev_ts.isNotNull() & (F.col("snap_ts") == prev_ts + 1)
    changed = is_pair & (F.col("fp") != prev_fp)
    per_doc = (
        snaps.withColumn("is_pair", is_pair.cast("long"))
        .withColumn("chg", changed.cast("long"))
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_obs"),
            F.sum("is_pair").cast("long").alias("n_pairs"),
            F.sum("chg").cast("long").alias("n_changes"),
            F.max("snap_ts").cast("long").alias("last_ts"),
        )
    )
    stable = F.col("n_pairs") - F.col("n_changes")
    doublings = F.least(stable, F.lit(RECRAWL_MAX_DOUBLINGS))
    interval = (
        F.lit(RECRAWL_BASE_HOURS)
        * F.pow(F.lit(2), doublings).cast("long")
    ).cast("long")
    return per_doc.select(
        "doc_id",
        "n_obs",
        "n_pairs",
        "n_changes",
        interval.alias("interval_hours"),
        (F.col("last_ts") * 24 + interval).alias("next_fetch_ts"),
    ).orderBy("doc_id")


# ---------------------------------------------------------------------------
# Token-level change magnitude between crawl snapshots — snapshot_diff says
# WHICH pages changed (fingerprint boolean); this says HOW MUCH, the number
# recrawl scheduling actually wants (a timestamp-only touch and a full
# rewrite both flip the md5; only one deserves a faster revisit cadence).
# ---------------------------------------------------------------------------

HEAVY_REV_MOD = 13   # doc_id % 13 == 6 -> full rewrite in the demo fleet


def demo_text_snapshots(
    documents: DataFrame,
) -> tuple[DataFrame, DataFrame]:
    """(old, new) (doc_id, text) frames: old = even doc_ids, new =
    %5 != 4 (the snapshot_diff split), with two revision flavors the
    oracle re-derives — %13==6 full rewrite, else %11==0 light edit
    (first token dropped, ' rev update' appended)."""
    d = F.col("doc_id")
    new_text = (
        F.when(d % HEAVY_REV_MOD == 6,
               F.concat(F.lit("totally new page about topic "), d))
        .when(d % REV_MOD == 0,
              F.concat(F.regexp_replace("text", r"^\S+\s*", ""),
                       F.lit(" rev update")))
        .otherwise(F.col("text"))
    )
    old = documents.where(d % OLD_MOD == 0).select("doc_id", "text")
    new = documents.where(d % NEW_MOD != NEW_MOD - 1).select(
        "doc_id", new_text.alias("text")
    )
    return old, new


def change_magnitude(old: DataFrame, new: DataFrame) -> DataFrame:
    """(doc_id, n_old_tokens, n_new_tokens, sym_diff, changed_bp) for
    every page present in BOTH snapshots: the token-MULTISET symmetric
    difference (sum over terms of |c_old - c_new|) against the combined
    mass, in exact integer bp.  Multiset, not set: a page that repeats
    its one ad block ten more times HAS changed, and sequence alignment
    is deliberately avoided — the multiset diff is order-insensitive, so
    a reshuffled nav bar scores near zero while real content turnover
    scores high, which is the signal a recrawl scheduler wants (and it
    keeps the whole op in keyed joins — no per-doc edit-distance
    Python).

    Scale: two narrow token explodes -> two map-side-combined (doc,
    term) groupBys -> one full-outer keyed join -> one per-doc rollup;
    the both-present filter is a broadcast-able id semi-join.  Nothing
    corpus-ordered."""
    from pdf_parser_spark.functions import words

    both = old.select("doc_id").join(new.select("doc_id"), "doc_id")

    def counts(df, col):
        return (
            df.join(both, "doc_id")
            .select("doc_id", F.explode(words(F.col("text"))).alias("term"))
            .where(F.col("term") != "")
            .select("doc_id", F.lower("term").alias("term"))
            .groupBy("doc_id", "term")
            .agg(F.count("*").cast("long").alias(col))
        )

    oc = counts(old, "c_old")
    nc = counts(new, "c_new")
    j = oc.join(nc, ["doc_id", "term"], "full_outer").select(
        "doc_id",
        F.coalesce("c_old", F.lit(0)).alias("c_old"),
        F.coalesce("c_new", F.lit(0)).alias("c_new"),
    )
    return (
        j.groupBy("doc_id")
        .agg(
            F.sum("c_old").cast("long").alias("n_old_tokens"),
            F.sum("c_new").cast("long").alias("n_new_tokens"),
            F.sum(F.abs(F.col("c_old") - F.col("c_new"))).cast("long")
            .alias("sym_diff"),
        )
        .select(
            "doc_id", "n_old_tokens", "n_new_tokens", "sym_diff",
            F.expr("10000 * sym_diff div (n_old_tokens + n_new_tokens)")
            .cast("long").alias("changed_bp"),
        )
        .orderBy("doc_id")
    )
