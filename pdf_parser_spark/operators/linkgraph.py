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
            # anchor text varies by source doc (src%3) AND target, so the
            # per-target anchor-text index below aggregates a non-trivial
            # distinct set; the oracle re-derives it from the same formula
            F.lit('">ref'),
            F.col("doc_id") % 3,
            F.lit("-"),
            (F.col("doc_id") * m + a) % n,
            F.lit("</a>"),
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


def anchor_text_index(pages: DataFrame) -> DataFrame:
    """Per-target anchor-text index: (dst, n_inlinks, n_srcs, texts).

    The inverted anchor-text table is the classic search-signal a crawl
    pipeline derives from the link graph (anchor text describes the TARGET
    page better than its own body — Brin & Page '98).  One JVM pass pulls
    whole ``<a ...>...</a>`` tags (regexp_extract_all, group 0), a second
    projection splits href/text per element, then a single groupBy(dst)
    aggregates.  ``texts`` is the '|'-joined sorted-distinct anchor-text
    set — collect_set is unordered, so array_sort makes it deterministic
    (and therefore oracle-hashable).

    Scale: the explode is narrow; the only shuffle is groupBy(dst) with
    map-side partial aggregation.  Anchor-text sets for mega-targets
    (a homepage with 10^9 inlinks) would overflow collect_set — in
    production cap per-target texts with a count-limited window or sketch
    top-k; here the ring graph bounds in-degree by construction.
    """
    tags = F.regexp_extract_all(
        F.col("html"), F.lit(r'<a href="[^"]*">[^<]*</a>'), F.lit(0)
    )
    links = pages.select(
        F.col("doc_id").alias("src"), F.explode(tags).alias("tag")
    ).select(
        "src",
        F.regexp_extract("tag", r'href="([^"]*)"', 1).alias("href"),
        F.regexp_extract("tag", r">([^<]*)<", 1).alias("atext"),
    ).withColumn(
        "dst",
        F.nullif(
            F.regexp_extract("href", r"/doc/([0-9]+)$", 1), F.lit("")
        ).cast("long"),
    )
    return (
        links.where(F.col("dst").isNotNull())
        .groupBy("dst")
        .agg(
            F.count("*").cast("long").alias("n_inlinks"),
            F.countDistinct("src").cast("long").alias("n_srcs"),
            F.array_join(F.array_sort(F.collect_set("atext")), "|").alias("texts"),
        )
        .orderBy("dst")
    )


def synthetic_edges(documents: DataFrame) -> DataFrame:
    """(src, dst) edge list via html synthesis + anchor extraction — the
    full extraction path, not the formula shortcut."""
    return (
        extract_outlinks(with_synthetic_html(documents))
        .where(F.col("dst").isNotNull())
        .select("src", "dst")
    )


def _power_iterate(
    documents: DataFrame,
    edges: DataFrame,
    iterations: int,
    init_col,
    base_col,
    out_name: str,
) -> DataFrame:
    """Shared PageRank-family dataflow: score' = base + (85 * sum(score
    div outdeg over in-edges)) div 100, iterated K times over a cached
    edge+outdeg table.  ``init_col``/``base_col`` are the only degrees of
    freedom (uniform for PageRank, seed-indicator for TrustRank) — one
    dataflow, so a fix to the join/cache/overflow shape can never diverge
    the rankings.

    Per iteration: join on src + groupBy dst = 2 shuffles; at 10^12 edges
    each is the same shuffle a groupBy costs — K bounded passes, no
    driver-side data movement.  The result materializes via eager
    localCheckpoint (not persist): checkpoint blocks are released by the
    ContextCleaner when the frame is GC'd, so repeated invocations don't
    accumulate session-lifetime cache entries; the edge cache is freed
    before returning.  NB the call therefore executes at construction
    time, not first action."""
    nodes = documents.select("doc_id")
    deg = edges.groupBy("src").agg(F.count("*").alias("outdeg"))
    ed = edges.join(deg, "src").persist()
    ed.count()
    ranks = nodes.select("doc_id", init_col.cast("long").alias("r"))
    for _ in range(iterations):
        inflow = (
            ed.join(ranks, ed.src == ranks.doc_id)
            .select("dst", F.expr("r div outdeg").alias("contrib"))
            .groupBy("dst")
            .agg(F.sum("contrib").alias("inflow"))
        )
        ranks = nodes.join(inflow, nodes.doc_id == inflow.dst, "left").select(
            "doc_id",
            (
                base_col
                + F.expr(f"({DAMP_NUM} * coalesce(inflow, 0L)) div {DAMP_DEN}")
            ).cast("long").alias("r"),
        )
    out = (
        ranks.select("doc_id", F.col("r").alias(out_name))
        .orderBy("doc_id")
        .localCheckpoint(eager=True)
    )
    ed.unpersist()
    return out


def pagerank(
    documents: DataFrame, edges: DataFrame, iterations: int = 5
) -> DataFrame:
    """(doc_id, rank) after `iterations` exact-integer PageRank updates:
    uniform init (UNIT) and uniform teleport (BASE); nodes without inlinks
    fall back to BASE via the left join.  See _power_iterate."""
    return _power_iterate(
        documents, edges, iterations,
        init_col=F.lit(UNIT), base_col=F.lit(BASE), out_name="rank",
    )


def frontier_schedule(
    documents: DataFrame, per_domain: int = 5, iterations: int = 5
) -> DataFrame:
    """Assemble the crawl frontier end-to-end: robots-allowed pages, capped
    at `per_domain` per registered domain, prioritized by PageRank into
    per-host politeness queues.

    Output: (doc_id, host, reg_domain, rank, fetch_slot, fetch_at_ms) —
    fetch_slot is the page's position in its host's queue (best rank
    first), fetch_at_ms = (slot-1) * the host's crawl delay.

    This is the composition a production crawler runs every cycle; each
    stage is the already-oracle-checked operator (weburl.robots_filter,
    weburl.domain_quota, pagerank) and the composition itself is held to a
    composed DuckDB oracle — so a semantics drift in ANY stage fails the
    frontier hash too.

    Scale: the three doc_id joins are fact-fact — co-located when the
    corpus tables are bucketed by doc_id/url-hash (sources/pages layout);
    the slot window partitions by host, parallel across hosts.  The skew
    case (one giant host) is pre-bounded by the quota cap."""
    from pyspark.sql import Window

    from pdf_parser_spark.operators import weburl

    canon = weburl.canonicalize(weburl.with_synthetic_urls(documents))
    allowed = weburl.robots_filter(canon)
    quota = weburl.domain_quota(
        weburl.with_synthetic_urls(documents), per_domain
    )
    ranks = pagerank(documents, synthetic_edges(documents), iterations)
    w = Window.partitionBy("host").orderBy(F.col("rank").desc(), "doc_id")
    slot = F.row_number().over(w).cast("long")
    return (
        allowed.select("doc_id", "host", "crawl_delay_ms")
        .join(quota.select("doc_id", "reg_domain"), "doc_id")
        .join(ranks, "doc_id")
        .select(
            "doc_id", "host", "reg_domain", "rank",
            slot.alias("fetch_slot"),
            ((slot - 1) * F.col("crawl_delay_ms")).cast("long").alias("fetch_at_ms"),
        )
        .orderBy("doc_id")
    )


HITS_ITERATIONS = 3


def hits(
    documents: DataFrame, edges: DataFrame, iterations: int = HITS_ITERATIONS
) -> DataFrame:
    """(doc_id, hub, authority) after `iterations` un-normalized HITS
    updates (Kleinberg '99): a' = sum of h over in-edges, h' = sum of a'
    over out-edges, both from h0 = a0 = 1.

    Exact-integer formulation: skipping the per-round L2 normalization
    keeps every update a BIGINT sum — order-independent, cross-engine
    hashable — at the cost of magnitude growth ~ (max degree)^iterations,
    fine for small fixed k (the RANKING is what the crawler consumes;
    normalization is presentation).  Same dataflow as pagerank: K bounded
    join+groupBy passes over the cached edge table, no driver-side data."""
    if iterations < 1:
        raise ValueError("hits requires iterations >= 1")
    nodes = documents.select("doc_id")
    ed = edges.select("src", "dst").persist()
    ed.count()
    hubs = nodes.select("doc_id", F.lit(1).cast("long").alias("h"))
    auths = None
    for _ in range(iterations):
        auths = (
            ed.join(hubs, ed.src == hubs.doc_id)
            .groupBy("dst").agg(F.sum("h").alias("a"))
        )
        auths = nodes.join(
            auths, nodes.doc_id == auths.dst, "left"
        ).select("doc_id", F.coalesce("a", F.lit(0)).cast("long").alias("a"))
        hubs = (
            ed.join(auths, ed.dst == auths.doc_id)
            .groupBy("src").agg(F.sum("a").alias("h"))
        )
        hubs = nodes.join(
            hubs, nodes.doc_id == hubs.src, "left"
        ).select("doc_id", F.coalesce("h", F.lit(0)).cast("long").alias("h"))
    out = (
        hubs.join(auths.withColumnRenamed("doc_id", "d"),
                  hubs.doc_id == F.col("d"))
        .select("doc_id", F.col("h").alias("hub"), F.col("a").alias("authority"))
        .orderBy("doc_id")
        .localCheckpoint(eager=True)  # see pagerank: GC-cleaned, frees ed now
    )
    ed.unpersist()
    return out


def cocitation_pairs(edges: DataFrame, min_count: int = 2) -> DataFrame:
    """(dst_a, dst_b, n_cociting) — pages cited TOGETHER by >= min_count
    sources (co-citation, Small '73): the link-graph similarity signal
    that needs no content at all.  Self-join on the citing src with
    dst_a < dst_b; per-source pair fan-out is C(outdeg, 2), so the
    per-site outlink cap every crawler applies (or a pre-filter dropping
    mega-out-degree hub pages) bounds the blow-up — the same
    candidate-bounding discipline as the LSH band joins."""
    a = edges.select(F.col("src").alias("s"), F.col("dst").alias("dst_a"))
    b = edges.select(F.col("src").alias("s"), F.col("dst").alias("dst_b"))
    return (
        a.join(b, "s")
        .where(F.col("dst_a") < F.col("dst_b"))
        .groupBy("dst_a", "dst_b")
        # distinct SOURCES, not edge-pair combinations: duplicate (src,dst)
        # edges (routine in crawl graphs, and possible in the ring synth
        # when two formulas collide mod n) must not let one source fake
        # "cited together by >= k sources"
        .agg(F.countDistinct("s").cast("long").alias("n_cociting"))
        .where(F.col("n_cociting") >= min_count)
        .orderBy("dst_a", "dst_b")
    )


def graph_stats(edges: DataFrame) -> DataFrame:
    """One-row audit of the crawl graph: edge count, distinct srcs/dsts,
    max in/out degree, and reciprocated-edge count (a<->b both present —
    the left_semi against the reversed edge list carries keys only).
    Every aggregate is an exact BIGINT; the audit runs per crawl cycle
    next to the frontier build."""
    e = edges.select("src", "dst").persist()  # 4 actions share ONE derivation
    try:
        deg_out = e.groupBy("src").agg(F.count("*").alias("d"))
        deg_in = e.groupBy("dst").agg(F.count("*").alias("d"))
        rev = e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        n_recip = e.join(rev, ["src", "dst"], "left_semi").count()
        row = e.agg(
            F.count("*").cast("long").alias("n_edges"),
            F.countDistinct("src").cast("long").alias("n_srcs"),
            F.countDistinct("dst").cast("long").alias("n_dsts"),
        ).collect()[0]
        result = (
            row["n_edges"], row["n_srcs"], row["n_dsts"],
            deg_out.agg(F.max("d")).collect()[0][0],
            deg_in.agg(F.max("d")).collect()[0][0],
            n_recip,
        )
    finally:
        e.unpersist()
    return edges.sparkSession.createDataFrame(
        [result],
        "n_edges long, n_srcs long, n_dsts long, "
        "max_outdeg long, max_indeg long, n_reciprocal long",
    )


TRUST_SEED_MOD = 17  # doc_id % 17 == 0 stands in for the vetted seed list


def trustrank(
    documents: DataFrame,
    edges: DataFrame,
    iterations: int = 5,
    seed_mod: int = TRUST_SEED_MOD,
) -> DataFrame:
    """(doc_id, trust) — TrustRank (Gyöngyi et al., VLDB '04): PageRank
    whose teleport mass lands ONLY on a vetted seed set, so trust flows
    out from known-good pages and spam neighborhoods that no good page
    links to starve to zero — the crawl-frontier's spam-demotion signal
    next to plain PageRank's popularity.

    Same exact-integer dataflow as pagerank (_power_iterate; BIGINT
    micro-units, floor divisions, K cached join+groupBy passes); the only
    change is the teleport term: seeds get BASE, everyone else 0.  The
    demo seed set is doc_id%17==0 (in production: the curated allowlist
    dim, broadcast)."""
    seed_base = F.when(
        F.col("doc_id") % seed_mod == 0, F.lit(BASE)
    ).otherwise(F.lit(0)).cast("long")
    return _power_iterate(
        documents, edges, iterations,
        init_col=seed_base, base_col=seed_base, out_name="trust",
    )
