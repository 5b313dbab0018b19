"""Link-graph operators for crawl pipelines: anchor/outlink extraction from
HTML and an exact-integer PageRank for crawl-frontier prioritization.

A web-scale ingest needs the link graph twice: outlink extraction feeds the
crawl frontier, and a centrality score (PageRank) prioritizes which hosts
to fetch/keep.  Extraction is one JVM regexp pass (no Python); PageRank is
the standard iterative join+groupBy dataflow — like
``dedup.connected_components``, a driver loop over DataFrame ops, K
shuffles on the edge key.

Exact-integer formulation: ranks are BIGINT micro-units (UNIT = 1e9), each
update is ``BASE + (85 * sum(rank // outdeg)) div 100`` — floor divisions
and integer sums only, so the result is independent of float summation
order (Spark's parallel double sums are order-nondeterministic, which would
break cross-engine hash comparison; integer sums are associative).  With
UNIT=1e9 total mass is n_docs × 1e9, safely inside BIGINT for any corpus
that fits a cluster (10^12 docs × 1e9 ≈ 9.2e20 overflows — at that scale
drop UNIT to 1e6, noted here because the constant IS the scale knob).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# deterministic 3-outlink ring synthesis: dst_k = (doc_id * m_k + a_k) % n
LINK_PARAMS = ((7, 1), (13, 2), (31, 5))

UNIT = 1_000_000_000
DAMP_NUM, DAMP_DEN = 85, 100
BASE = (UNIT * (DAMP_DEN - DAMP_NUM)) // DAMP_DEN  # 0.15 * UNIT


def with_synthetic_html(documents: DataFrame) -> DataFrame:
    """Add an ``html`` column: the doc text wrapped in a body plus three
    anchor tags whose targets are deterministic functions of doc_id (so the
    oracle re-derives the whole graph).  One count() closes the id ring —
    a driver-side scalar, not a collect."""
    n = documents.count()
    anchors = [
        F.concat(
            F.lit('<a href="https://node'),
            (F.col("doc_id") * m + a) % n,
            F.lit('.example.com/doc/'),
            (F.col("doc_id") * m + a) % n,
            F.lit('">link</a>'),
        )
        for m, a in LINK_PARAMS
    ]
    html = F.concat(
        F.lit("<html><body><p>"), F.substring(F.col("text"), 1, 40),
        F.lit("</p>"), *anchors, F.lit("</body></html>"),
    )
    return documents.withColumn("html", html)


def extract_outlinks(pages: DataFrame) -> DataFrame:
    """(src, href, dst) — every href="..." in the html column, one JVM
    regexp_extract_all + explode (narrow, no shuffle); dst parsed from the
    trailing /doc/<id> path (NULL for off-site links)."""
    hrefs = F.regexp_extract_all(F.col("html"), F.lit(r'href="([^"]*)"'), F.lit(1))
    return (
        pages.select(F.col("doc_id").alias("src"), F.explode(hrefs).alias("href"))
        .withColumn(
            "dst",
            F.nullif(
                F.regexp_extract("href", r"/doc/([0-9]+)$", 1), F.lit("")
            ).cast("long"),
        )
        .orderBy("src", "href")
    )


def synthetic_edges(documents: DataFrame) -> DataFrame:
    """(src, dst) edge list via html synthesis + anchor extraction — the
    full extraction path, not the formula shortcut."""
    return (
        extract_outlinks(with_synthetic_html(documents))
        .where(F.col("dst").isNotNull())
        .select("src", "dst")
    )


def pagerank(
    documents: DataFrame, edges: DataFrame, iterations: int = 5
) -> DataFrame:
    """(doc_id, rank) after `iterations` exact-integer PageRank updates.

    Per iteration: contribs = rank div outdeg per edge, summed per dst
    (join on src + groupBy dst = 2 shuffles); rank' = BASE +
    (85 * inflow) div 100.  The edge+outdeg table is computed once and
    cached; nodes without inlinks fall back to BASE via the left join.
    At 10^12 edges each iteration is the same shuffle a groupBy costs —
    K iterations = K bounded passes, no driver-side data movement."""
    nodes = documents.select("doc_id")
    deg = edges.groupBy("src").agg(F.count("*").alias("outdeg"))
    ed = edges.join(deg, "src").persist()
    ed.count()
    ranks = nodes.select("doc_id", F.lit(UNIT).cast("long").alias("rank"))
    for _ in range(iterations):
        inflow = (
            ed.join(ranks, ed.src == ranks.doc_id)
            .select("dst", F.expr("rank div outdeg").alias("contrib"))
            .groupBy("dst")
            .agg(F.sum("contrib").alias("inflow"))
        )
        ranks = nodes.join(inflow, nodes.doc_id == inflow.dst, "left").select(
            "doc_id",
            (
                F.lit(BASE)
                + F.expr(f"({DAMP_NUM} * coalesce(inflow, 0L)) div {DAMP_DEN}")
            ).cast("long").alias("rank"),
        )
    # NOTE: ed stays cached until the returned plan is evaluated (lazy
    # evaluation — an eager unpersist here would silently drop the cache
    # before the final action and recompute the edge join every iteration)
    return ranks.orderBy("doc_id")
