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


ANCHOR_MAX_TEXTS = 64  # per-target distinct-text cap (mega-target guard)


def anchor_text_index(
    pages: DataFrame, max_texts: int = ANCHOR_MAX_TEXTS
) -> DataFrame:
    """Per-target anchor-text index: (dst, n_inlinks, n_srcs, texts).

    The inverted anchor-text table is the classic search-signal a crawl
    pipeline derives from the link graph (anchor text describes the TARGET
    page better than its own body — Brin & Page '98).  One JVM pass pulls
    whole ``<a ...>...</a>`` tags (regexp_extract_all, group 0), a second
    projection splits href/text per element, then a groupBy(dst) counts
    ALL inlinks/sources while the text payload aggregates separately under
    a per-target cap.

    Mega-target guard: a homepage with 10^9 inlinks would overflow an
    uncapped collect_set, so ``texts`` keeps only the `max_texts`
    lexicographically-smallest DISTINCT anchor texts per target (distinct
    -> row_number window over (dst, atext asc) -> collect_list ->
    array_sort) — deterministic under the cap, bounded memory per key.
    The inlink/source COUNTS are never capped; only the text payload is.

    Scale: the explode is narrow; the shuffles are groupBy/window on dst
    with map-side partial aggregation, and the capped text column bounds
    every per-key buffer regardless of in-degree skew.
    """
    from pyspark.sql import Window

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
    ).where(F.col("dst").isNotNull())
    kept = (
        links.select("dst", "atext").distinct()
        .withColumn(
            "rn",
            F.row_number().over(Window.partitionBy("dst").orderBy("atext")),
        )
        .where(F.col("rn") <= max_texts)
        .groupBy("dst")
        .agg(
            F.array_join(F.array_sort(F.collect_list("atext")), "|")
            .alias("texts")
        )
    )
    counts = links.groupBy("dst").agg(
        F.count("*").cast("long").alias("n_inlinks"),
        F.countDistinct("src").cast("long").alias("n_srcs"),
    )
    return (
        counts.join(kept, "dst")
        .select("dst", "n_inlinks", "n_srcs", "texts")
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
    until_converged: bool = False,
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
    time, not first action.

    ``until_converged=True`` adds the production early-stop: after each
    update, count rows whose exact-integer rank CHANGED (a doc_id join of
    consecutive iterates — integer ranks make "max delta == 0" a clean
    equality, no epsilon) and stop when none did.  Each check costs one
    extra join+count action, repaid whenever the graph converges before
    the fixed budget; `iterations` becomes the upper bound.  Fixed-k
    (default) stays the oracle-checked mode — the unrolled-CTE SQL twin
    is a k-step formula, so the driver hash always pins the fixed-k path."""
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
        new_ranks = nodes.join(inflow, nodes.doc_id == inflow.dst, "left").select(
            "doc_id",
            (
                base_col
                + F.expr(f"({DAMP_NUM} * coalesce(inflow, 0L)) div {DAMP_DEN}")
            ).cast("long").alias("r"),
        )
        if until_converged:
            new_ranks = new_ranks.localCheckpoint(eager=True)
            n_changed = (
                new_ranks.alias("n")
                .join(ranks.alias("p"), "doc_id")
                .where(F.col("n.r") != F.col("p.r"))
                .count()
            )
            if n_changed == 0:
                ranks = new_ranks
                break
        ranks = new_ranks
    out = (
        ranks.select("doc_id", F.col("r").alias(out_name))
        .orderBy("doc_id")
        .localCheckpoint(eager=True)
    )
    ed.unpersist()
    return out


def pagerank(
    documents: DataFrame,
    edges: DataFrame,
    iterations: int = 5,
    until_converged: bool = False,
) -> DataFrame:
    """(doc_id, rank) after `iterations` exact-integer PageRank updates:
    uniform init (UNIT) and uniform teleport (BASE); nodes without inlinks
    fall back to BASE via the left join.  `until_converged` turns the
    fixed budget into an upper bound (see _power_iterate)."""
    return _power_iterate(
        documents, edges, iterations,
        init_col=F.lit(UNIT), base_col=F.lit(BASE), out_name="rank",
        until_converged=until_converged,
    )


def _schedule(
    documents: DataFrame,
    edges: DataFrame,
    per_domain: int,
    iterations: int,
    exclude: DataFrame | None = None,
) -> DataFrame:
    """Shared frontier assembly over an explicit (node set, edge list):
    robots-allowed pages, capped at `per_domain` per registered domain,
    prioritized by PageRank into per-host politeness queues.

    Output: (doc_id, host, reg_domain, rank, fetch_slot, fetch_at_ms) —
    fetch_slot is the page's position in its host's queue (best rank
    first), fetch_at_ms = (slot-1) * the host's crawl delay.

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
    ranks = pagerank(documents, edges, iterations)
    w = Window.partitionBy("host").orderBy(F.col("rank").desc(), "doc_id")
    slot = F.row_number().over(w).cast("long")
    base = (
        allowed.select("doc_id", "host", "crawl_delay_ms")
        .join(quota.select("doc_id", "reg_domain"), "doc_id")
        .join(ranks, "doc_id")
    )
    if exclude is not None:
        # demotion runs BEFORE slot assignment: an excluded page must not
        # leave a hole in its host's politeness queue
        base = base.join(exclude, "doc_id", "left_anti")
    return (
        base
        .select(
            "doc_id", "host", "reg_domain", "rank",
            slot.alias("fetch_slot"),
            ((slot - 1) * F.col("crawl_delay_ms")).cast("long").alias("fetch_at_ms"),
        )
        .orderBy("doc_id")
    )


def frontier_schedule(
    documents: DataFrame, per_domain: int = 5, iterations: int = 5
) -> DataFrame:
    """Assemble the crawl frontier end-to-end over the whole corpus graph.

    This is the composition a production crawler runs every cycle; each
    stage is the already-oracle-checked operator (weburl.robots_filter,
    weburl.domain_quota, pagerank) and the composition itself is held to a
    composed DuckDB oracle — so a semantics drift in ANY stage fails the
    frontier hash too.  See _schedule for the output contract and the
    scale shape."""
    return _schedule(
        documents, synthetic_edges(documents), per_domain, iterations
    )


def corpus_frontier(
    documents: DataFrame,
    pages: DataFrame,
    per_domain: int = 5,
    iterations: int = 5,
    run_ts: str = "",
    url_id_re: str = r"/([0-9]+)$",
) -> DataFrame:
    """The full crawl CYCLE, frontier fed from the real extraction funnel —
    the crawl-scale analog of the reference's per-filing lifecycle
    (``sec_parser/cli.py:102-124``: parse, then decide what to fetch next)
    rather than the formula-only graph of ``frontier_schedule``:

      1. REAL extraction (the Arrow mapInPandas stage) over the pages
         table; only status='ok' docs continue — fail-soft rejects
         (scanned docs, empty payloads) drop out of this cycle.
      2. C4/Gopher quality gate (textstats.quality_gate) over the corpus
         text; only passing docs are crawl-worthy link sources/targets.
      3. Outlinks from the surviving pages' html (JVM regex extraction),
         both endpoints restricted to the crawlable set — a link into a
         rejected or gated-out page is not scheduled this cycle.
      4. Exact-integer PageRank over the surviving subgraph only.
      5. robots ∩ per-domain quota ∩ rank -> per-host politeness queues.

    Each stage is oracle-checked standalone; the composition is held to ONE
    composed DuckDB oracle (extraction outputs enter it as the frozen
    core-path expected table), so drift in ANY stage fails this hash.

    Scale: extraction is the narrow salted-repartition Arrow stage; the
    ok/gated reductions are key-only left_semi joins on doc_id (same
    shuffle class as the dedup keeper anti-join); PageRank/robots/quota run
    on the surviving subset, so a 90%-rejection crawl cycle costs 10% of
    the full-graph frontier, not 100%."""
    from pdf_parser_spark.operators.extract import extract_stage
    from pdf_parser_spark.operators.textstats import quality_gate

    ok_ids = (
        extract_stage(pages, run_ts=run_ts)
        .where(F.col("status") == "ok")
        .select(
            F.regexp_extract("url", url_id_re, 1).cast("long").alias("doc_id")
        )
    )
    gated_ids = (
        quality_gate(documents).where(F.col("passed")).select("doc_id")
    )
    crawlable = (
        documents.join(ok_ids, "doc_id", "left_semi")
        .join(gated_ids, "doc_id", "left_semi")
    )
    # ring edges derive from the FULL corpus html (every page's anchors
    # exist before the funnel verdicts); the funnel then restricts both
    # endpoints to the crawlable subset
    edges = (
        synthetic_edges(documents)
        .join(
            crawlable.select(F.col("doc_id").alias("src")), "src", "left_semi"
        )
        .join(
            crawlable.select(F.col("doc_id").alias("dst")), "dst", "left_semi"
        )
    )
    return _schedule(crawlable, edges, per_domain, iterations)


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
    next to the frontier build.

    ONE action over the persisted edge frame: the out-degree cube folds
    edge count + distinct srcs + max outdeg into a single groupBy(src)
    re-aggregation, the in-degree cube does dsts/indeg, and the semi-join
    reciprocal count rides the same plan via 1-row crossJoins (the
    documented 1-row-broadcast exception to the crossJoin ban) — the r2
    shape ran 5 separate actions over the same cache."""
    e = edges.select("src", "dst").persist()
    try:
        out_cube = e.groupBy("src").agg(F.count("*").alias("d")).agg(
            F.coalesce(F.sum("d"), F.lit(0)).cast("long").alias("n_edges"),
            F.count("*").cast("long").alias("n_srcs"),
            F.max("d").cast("long").alias("max_outdeg"),
        )
        in_cube = e.groupBy("dst").agg(F.count("*").alias("d")).agg(
            F.count("*").cast("long").alias("n_dsts"),
            F.max("d").cast("long").alias("max_indeg"),
        )
        rev = e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        recip = e.join(rev, ["src", "dst"], "left_semi").agg(
            F.count("*").cast("long").alias("n_reciprocal")
        )
        out = (
            out_cube.crossJoin(in_cube).crossJoin(recip)
            .select(
                "n_edges", "n_srcs", "n_dsts",
                "max_outdeg", "max_indeg", "n_reciprocal",
            )
            .localCheckpoint(eager=True)  # the single action
        )
    finally:
        e.unpersist()
    return out


SEED_DEPTH_HOPS = 6  # BFS horizon from the vetted seed set


def seed_distance(
    documents: DataFrame,
    edges: DataFrame,
    max_hops: int = SEED_DEPTH_HOPS,
    seed_mod: int = None,
) -> DataFrame:
    """(doc_id, depth) — minimum hop distance from the vetted seed set
    within max_hops: the crawl-depth audit TrustRank's mass flow doesn't
    give (trust decays multiplicatively; depth answers the planning
    question 'how many fetch WAVES until the frontier reaches this
    page?', and depth histograms are the standard crawl-coverage report).
    Pages unreachable within the horizon are absent — their row count is
    the coverage gap.

    Dataflow: BFS as iterative min-depth propagation — the
    connected_components shape (per round: one equi-join on the node id +
    one groupBy-min, both shuffles on the same key; lineage truncated by
    localCheckpoint; exact-integer early stop when a round changes
    nothing, which also skips the remaining corpus-wide shuffles on
    shallow graphs).  Rounds = min(max_hops, true eccentricity).  The
    oracle twin is a depth-bounded recursive CTE taking min(d) per node."""
    if seed_mod is None:
        seed_mod = TRUST_SEED_MOD
    labels = (
        documents.where(F.col("doc_id") % seed_mod == 0)
        .select(F.col("doc_id").alias("node"), F.lit(0).cast("long").alias("depth"))
        .localCheckpoint()
    )
    e = edges.select("src", "dst").distinct().localCheckpoint()
    for _ in range(max_hops):
        hop = (
            e.join(labels, e["src"] == labels["node"])
            .select(e["dst"].alias("node"), (F.col("depth") + 1).alias("depth"))
        )
        new_labels = (
            labels.unionByName(hop)
            .groupBy("node")
            .agg(F.min("depth").alias("depth"))
            .localCheckpoint()
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node", "left")
            .where(
                F.col("o.depth").isNull()
                | (F.col("n.depth") != F.col("o.depth"))
            )
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    return labels.select(
        F.col("node").alias("doc_id"), F.col("depth").cast("long")
    ).orderBy("doc_id")


def host_graph(edges: DataFrame, urls: DataFrame) -> DataFrame:
    """Collapse the page graph to a host graph — the standard web-graph
    compression (Common Crawl ships exactly this artifact next to the page
    graph): hosts number ~10^7-10^8 where pages number 10^12, so host-level
    analytics (spam neighborhoods, TrustRank seed selection, crawl
    politeness planning) run on a graph 4-5 orders smaller.

    edges: (src, dst) doc-id pairs; urls: (doc_id, host) — ONE host map
    applied to both endpoints, so intra-host navigation collapses to
    self-loops and is dropped (a host's internal link structure is not
    inter-host evidence).

    (src_host, dst_host, n_links, n_src_pages): n_links = page-edge
    multiplicity, n_src_pages = DISTINCT linking pages (one hub page with
    1000 copies of the link must not look like 1000 endorsing pages — the
    same reason cocitation counts distinct citers).

    Scale: two doc_id equi joins (corpus-sized but key-only, AQE-planned)
    then one groupBy on (src_host, dst_host) — count is algebraic; the
    exact distinct-src shuffle is bounded by the page pairs actually
    linking the host pair, which is the quantity being measured."""
    h_src = urls.select(F.col("doc_id").alias("src"),
                        F.col("host").alias("src_host"))
    h_dst = urls.select(F.col("doc_id").alias("dst"),
                        F.col("host").alias("dst_host"))
    return (
        edges.join(h_src, "src").join(h_dst, "dst")
        .where(F.col("src_host") != F.col("dst_host"))
        .groupBy("src_host", "dst_host")
        .agg(
            F.count("*").cast("long").alias("n_links"),
            F.countDistinct("src").cast("long").alias("n_src_pages"),
        )
        .orderBy("src_host", "dst_host")
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


SPAM_MASS_SUSPECT_BP = 9900  # >=99% of rank unexplained by trust -> suspect


def spam_mass(
    documents: DataFrame,
    edges: DataFrame,
    iterations: int = 5,
    seed_mod: int = TRUST_SEED_MOD,
    suspect_bp: int = SPAM_MASS_SUSPECT_BP,
) -> DataFrame:
    """(doc_id, rank, trust, spam_mass, rel_mass_bp, suspect) — link-spam
    mass estimation (Gyöngyi, Garcia-Molina, Pedersen, "Link Spam
    Detection Based on Mass Estimation", VLDB 2006): the share of a page's
    PageRank that CANNOT be explained by trust flowing from the vetted
    seed core.  PageRank says "popular"; TrustRank says "endorsed"; the
    difference — spam mass — is the ranking earned from unvetted
    neighborhoods, and pages whose rank is almost entirely unexplained
    (rel_mass_bp >= suspect_bp) are the demotion candidates a crawl
    scheduler reviews before spending fetch budget.

    Exact-integer semantics (both engines): rank and trust come from the
    SAME _power_iterate dataflow (BIGINT micro-units, floor divisions), so
    this face can never drift from g_pagerank/g_trustrank.  Trust totals
    only ~n_seeds/n_docs of the rank mass (teleport lands on seeds alone),
    so it is rescaled by n_docs/n_seeds before comparison — decomposed as
    ``trust*(n div s) + (trust*(n mod s)) div s``, which equals
    ``(trust*n) div s`` EXACTLY (write n = q*s + r: trust*n div s =
    trust*q + trust*r div s) while bounding the intermediate product at
    trust*s instead of trust*n_docs — the overflow-safe shape at 10^12
    docs where the naive product would leave BIGINT.  spam_mass keeps the
    signed exact value (negative = over-trusted, i.e. seeds and their
    halo); rel_mass_bp floors the NEGATIVE masses at zero before the
    basis-point division so both engines divide nonnegative integers only
    (Spark `div` truncates toward zero, DuckDB `//` floors — they agree
    only on nonnegative operands; rank >= BASE > 0 always, so the
    denominator is safe).

    Scale: two K-round rank computations on the cached edge table, one
    doc_id equi join, one 1-row broadcast of the (n_docs, n_seeds) scalar
    — nothing beyond what pagerank itself costs."""
    ranks = pagerank(documents, edges, iterations)
    trust = trustrank(documents, edges, iterations, seed_mod)
    counts = documents.agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum(
            F.when(F.col("doc_id") % seed_mod == 0, 1).otherwise(0)
        ).cast("long").alias("n_seeds"),
    )
    scaled_trust = (
        F.col("trust") * F.expr("n_docs div n_seeds")
        + F.expr("(trust * (n_docs % n_seeds)) div n_seeds")
    )
    mass = (F.col("rank") - scaled_trust).alias("spam_mass")
    rel = F.expr(
        f"(greatest(rank - (trust * (n_docs div n_seeds)"
        f" + (trust * (n_docs % n_seeds)) div n_seeds), 0L) * 10000)"
        f" div rank"
    ).cast("long").alias("rel_mass_bp")
    return (
        ranks.join(trust, "doc_id")
        .crossJoin(F.broadcast(counts))
        .select(
            "doc_id", "rank", "trust",
            mass.cast("long"), rel,
        )
        .withColumn("suspect", F.col("rel_mass_bp") >= F.lit(suspect_bp))
        .orderBy("doc_id")
    )


LPA_ROUNDS = 3  # synchronous label-propagation rounds (fixed-k, oracle-pinned)


def host_communities(
    edges: DataFrame, urls: DataFrame, rounds: int = LPA_ROUNDS
) -> DataFrame:
    """Weighted label propagation (Raghavan et al. 2007) over the COMPRESSED
    host graph — the community face of the web graph next to PageRank's
    popularity and TrustRank's spam axis: link farms, mirror constellations,
    and topic clusters surface as hosts that converge onto one label, and
    the crawl scheduler treats a community (not a host) as the budget unit
    when one operator runs hundreds of domains.

    Semantics (pinned, both engines): every host starts labeled with
    itself; each synchronous round relabels every CONNECTED host with the
    neighbor-label carrying the largest total edge weight (w = summed
    undirected n_links, exact BIGINT), ties broken label-asc; isolated
    hosts keep their own label.  A node's own current label does not vote
    (classic LPA), so a connected node's round-r label is a pure function
    of round-(r-1) neighbor labels — which is what makes the fixed-k
    unrolled-CTE oracle exact.  Fixed rounds rather than
    run-to-convergence: synchronous LPA can 2-cycle on bipartite shapes,
    so production runs bounded rounds anyway (3 settles the sf0.01 graph).

    Scale: the iteration runs ENTIRELY on the host graph — 10^7-10^8 nodes
    where pages are 10^12 (the host_graph compression is the admission
    ticket); per round one equi join on the neighbor key + two groupBys
    ((host, label) weight sum, then per-host struct-min argmax — algebraic,
    map-side combined, never a per-host window over a sorted corpus).
    Lineage truncated per round via eager localCheckpoint exactly like
    _power_iterate.

    Returns (host, community, community_size) ordered by host.

    Ref analog: the reference buckets filings per company before
    cross-filing checks (sec_parser/pipeline.py company grouping); a web
    corpus has no company registry, so the community assignment IS the
    grouping key discovery."""
    hg = host_graph(edges, urls)
    und = (
        hg.select(F.col("src_host").alias("a"), F.col("dst_host").alias("b"),
                  "n_links")
        .unionByName(
            hg.select(F.col("dst_host").alias("a"),
                      F.col("src_host").alias("b"), "n_links"))
        .groupBy("a", "b")
        .agg(F.sum("n_links").cast("long").alias("w"))
        .persist()
    )
    und.count()
    nodes = urls.select("host").distinct()
    labels = nodes.select("host", F.col("host").alias("label"))
    for _ in range(rounds):
        votes = (
            und.join(labels.select(F.col("host").alias("b"), "label"), "b")
            .groupBy("a", "label")
            .agg(F.sum("w").alias("wt"))
        )
        # argmax by (wt desc, label asc) as ONE struct-min per host: negate
        # the exact-integer weight so min orders weight-desc, and the string
        # label rides along for the natural asc tie (keeper-election doctrine
        # — no per-host window sort)
        pick = (
            votes.groupBy("a")
            .agg(F.min(F.struct((-F.col("wt")).alias("nw"),
                                F.col("label").alias("l"))).alias("s"))
            .select(F.col("a").alias("host"), F.col("s.l").alias("label"))
        )
        # connected hosts always get a pick; isolated hosts never do and
        # coalesce back to their own label (== their unchanged initial label)
        labels = nodes.join(pick, "host", "left").select(
            "host", F.coalesce("label", F.col("host")).alias("label")
        ).localCheckpoint(eager=True)
    sizes = labels.groupBy("label").agg(
        F.count("*").cast("long").alias("community_size"))
    out = (
        labels.join(sizes, "label")
        .select("host", F.col("label").alias("community"), "community_size")
        .orderBy("host")
        .localCheckpoint(eager=True)
    )
    und.unpersist()
    return out


BOWTIE_HOPS = 8  # reachability horizon (shared by engine and oracle twin)


def _reach(start: DataFrame, edges: DataFrame, max_hops: int) -> DataFrame:
    """Distinct nodes reachable from ``start`` (inclusive) following
    (src -> dst) within max_hops: per round one equi join + one distinct
    union, lineage truncated, exact early stop when the frontier count
    stops growing (reachability is monotone, so an unchanged count IS the
    fixpoint — no per-row diff needed)."""
    reached = start.select("node").distinct().localCheckpoint()
    n = reached.count()
    for _ in range(max_hops):
        nxt = (
            edges.join(reached, edges["src"] == reached["node"])
            .select(edges["dst"].alias("node"))
        )
        reached = reached.unionByName(nxt).distinct().localCheckpoint()
        m = reached.count()
        if m == n:
            break
        n = m
    return reached


def bowtie(edges: DataFrame, urls: DataFrame, max_hops: int = BOWTIE_HOPS) -> DataFrame:
    """Bow-tie decomposition of the host graph (Broder et al., WWW 2000 —
    THE web-structure result: the web is a strongly connected CORE with an
    IN set that reaches it, an OUT set it reaches, and tendrils/islands):
    (host, region) with region in core/in/out/other, regions defined
    relative to the SCC of a deterministic pivot (the lexicographically
    smallest host appearing on any inter-host edge; Broder's giant-SCC
    framing needs an SCC enumeration — pivot-relative is the
    deterministic, oracle-checkable form, and on a web-shaped graph the
    min-host pivot lands in the giant SCC with overwhelming probability).

    core = fwd-reach(pivot) ∩ bwd-reach(pivot); in = bwd \\ core;
    out = fwd \\ core; other = tendrils + disconnected (incl. hosts with
    no inter-host edges at all).

    Scale: both reachability sweeps run on the COMPRESSED host graph
    (host_graph doctrine), each round one key equi join + distinct — the
    connected_components shape; horizon-bounded with exact early stop.
    The final region tag is two left-join flags over the host dim."""
    hg = host_graph(edges, urls).select(
        F.col("src_host").alias("src"), F.col("dst_host").alias("dst")
    ).distinct().persist()
    hg.count()
    verts = hg.select(F.col("src").alias("h")).unionByName(
        hg.select(F.col("dst").alias("h"))).distinct()
    pivot_row = verts.agg(F.min("h")).first()
    nodes = urls.select("host").distinct()
    if pivot_row[0] is None:  # no inter-host edges: everything is 'other'
        hg.unpersist()
        return nodes.select(
            "host", F.lit("other").alias("region")).orderBy("host")
    pivot = nodes.sparkSession.createDataFrame(
        [(pivot_row[0],)], "node string")
    fwd = _reach(pivot, hg, max_hops)
    bwd = _reach(
        pivot,
        hg.select(F.col("dst").alias("src"), F.col("src").alias("dst")),
        max_hops,
    )
    out = (
        nodes
        .join(fwd.select(F.col("node").alias("host"), F.lit(True).alias("f")),
              "host", "left")
        .join(bwd.select(F.col("node").alias("host"), F.lit(True).alias("b")),
              "host", "left")
        .select(
            "host",
            F.when(F.col("f") & F.col("b"), "core")
            .when(F.col("b"), "in")
            .when(F.col("f"), "out")
            .otherwise("other").alias("region"),
        )
        .orderBy("host")
        .localCheckpoint(eager=True)
    )
    hg.unpersist()
    return out


def degree_distribution(edges: DataFrame, urls: DataFrame) -> DataFrame:
    """Log2-binned in/out degree histogram of the host graph — the
    power-law audit (Broder et al. report web degree distributions as
    straight lines on log-log axes; a crawl whose histogram bends is
    over-sampling hubs or trapped in a generated neighborhood, and the
    histogram is the first thing to compare across crawl cycles).

    Degree = DISTINCT neighbor hosts (host_graph emits unique pairs, so a
    groupBy-count on one endpoint IS the graph degree, multiplicity
    already folded).  bin = floor(log2(degree)) computed as
    length(bin(degree)) - 1 — the exact-integer log the surprisal op
    established, identical bytes in both engines, no float log2 ever.

    Returns (direction, bin, n_hosts, min_deg, max_deg) ordered — one row
    per occupied bin per direction; the bin table is O(log max-degree)
    rows however large the graph.  Scale: two groupBys on the compressed
    host graph, then two groupBys on host-dim degree tables."""
    hg = host_graph(edges, urls).select("src_host", "dst_host")

    def _hist(col: str, direction: str) -> DataFrame:
        deg = hg.groupBy(col).agg(F.count("*").cast("long").alias("deg"))
        return (
            deg.withColumn("bin", F.expr("length(bin(deg)) - 1").cast("int"))
            .groupBy("bin")
            .agg(
                F.count("*").cast("long").alias("n_hosts"),
                F.min("deg").alias("min_deg"),
                F.max("deg").alias("max_deg"),
            )
            .withColumn("direction", F.lit(direction))
        )

    return (
        _hist("src_host", "out")
        .unionByName(_hist("dst_host", "in"))
        .select("direction", "bin", "n_hosts", "min_deg", "max_deg")
        .orderBy("direction", "bin")
    )


def graph_reciprocity(edges: DataFrame, urls: DataFrame) -> DataFrame:
    """Host-graph reciprocity — the one-row structural stat next to the
    degree histogram (directed-web studies report it beside the bow-tie:
    reciprocated host links indicate partnership/mirror relationships,
    one-way links editorial citation; a crawl whose reciprocity jumps is
    usually ingesting link-exchange spam rings): n_edges (distinct ordered
    inter-host pairs), n_reciprocated (pairs whose reverse also exists),
    reciprocity_bp exact.

    One self-join of the distinct host-pair table on the swapped key —
    dim-sized both sides (the host_graph compression again), left_semi so
    nothing materializes beyond the match flags."""
    hg = host_graph(edges, urls).select(
        F.col("src_host").alias("s"), F.col("dst_host").alias("d")
    ).distinct().persist()
    hg.count()
    n_edges = hg.count()
    recip = hg.join(
        hg.select(F.col("d").alias("s"), F.col("s").alias("d")),
        ["s", "d"], "left_semi",
    ).count()
    hg.unpersist()
    spark = edges.sparkSession
    return spark.createDataFrame(
        [(int(n_edges), int(recip),
          (10000 * int(recip)) // int(n_edges) if n_edges else 0)],
        "n_edges long, n_reciprocated long, reciprocity_bp long",
    )


def _und_host_edges(edges: DataFrame, urls: DataFrame) -> DataFrame:
    """Distinct undirected inter-host edges (a < b) — the simple-graph
    compression shared by host_triangles and host_kcore: parallel page
    edges fold, direction folds, self-loops are already dropped by
    host_graph."""
    return (
        host_graph(edges, urls)
        .select(F.least("src_host", "dst_host").alias("a"),
                F.greatest("src_host", "dst_host").alias("b"))
        .distinct()
    )


def host_triangles(edges: DataFrame, urls: DataFrame) -> DataFrame:
    """(host, degree, n_triangles, cc_bp) — exact per-host triangle count
    and local clustering coefficient over the UNDIRECTED simple host
    graph, zero-filled over every host in the url dim so a never-linked
    host reads as (0, 0, 0).  Triangles are the web-spam structural
    signal the degree histogram can't see: link farms are near-cliques
    (cc -> 10000 bp) while editorial hubs cite many pages that never cite
    each other (cc -> 0 at the same degree) — directed-web studies report
    clustering next to the bow-tie and reciprocity for exactly this
    reason.

    cc_bp = floor(10000 * 2 * triangles / (degree * (degree - 1))) for
    degree >= 2, else 0 — exact BIGINT arithmetic, no floats.

    Scale (the part that matters at 10^12 pages): counting runs on the
    COMPRESSED host graph (the host_graph 4-5-orders reduction), and the
    wedge join uses DEGREE-ORDERED ORIENTATION (Schank & Wagner 2005; the
    standard MapReduce triangle scheme): every undirected edge is
    directed from its lower-(degree, host) endpoint to its higher one, so
    a celebrity host with degree 10^6 has oriented OUT-degree O(sqrt(m))
    — the wedge self-join's per-key fan-out is bounded by the orientation
    even under power-law skew, where the naive adjacency join explodes on
    the heaviest host.  Each triangle materializes exactly once (at its
    orientation-minimal vertex) and closure is one left_semi join back to
    the oriented edge table; per-vertex counts explode the 3 corners.
    Total: the two host_graph shuffles + degree groupBy + one wedge join
    + one semi join + one corner groupBy — all on the host-graph dim.
    """
    und = _und_host_edges(edges, urls).persist()
    deg = (
        und.select(F.col("a").alias("host"))
        .unionByName(und.select(F.col("b").alias("host")))
        .groupBy("host")
        .agg(F.count("*").cast("long").alias("degree"))
    )
    # degree-ordered orientation: u -> v iff (deg_u, u) < (deg_v, v);
    # the struct key rides along so the wedge join can order endpoints
    # without a second degree lookup
    da = deg.select(F.col("host").alias("a"), F.col("degree").alias("dga"))
    db = deg.select(F.col("host").alias("b"), F.col("degree").alias("dgb"))
    ka = F.struct(F.col("dga").alias("dg"), F.col("a").alias("h"))
    kb = F.struct(F.col("dgb").alias("dg"), F.col("b").alias("h"))
    oriented = (
        und.join(da, "a").join(db, "b")
        .select(
            F.when(ka < kb, F.col("a")).otherwise(F.col("b")).alias("u"),
            F.when(ka < kb, F.col("b")).otherwise(F.col("a")).alias("v"),
            F.when(ka < kb, kb).otherwise(ka).alias("kv"),
        )
        .persist()
    )
    # wedge (u -> v, u -> w) with kv < kw, closed iff oriented edge
    # (v, w) exists (it is oriented v -> w by key transitivity)
    o2 = oriented.select(F.col("u"), F.col("v").alias("w"),
                         F.col("kv").alias("kw"))
    wedges = (
        oriented.join(o2, "u")
        .where(F.col("kv") < F.col("kw"))
        .select("u", "v", "w")
    )
    closed = wedges.join(
        oriented.select(F.col("u").alias("v2"), F.col("v").alias("w2")),
        (F.col("v") == F.col("v2")) & (F.col("w") == F.col("w2")),
        "left_semi",
    )
    tri = (
        closed.select(F.explode(F.array("u", "v", "w")).alias("host"))
        .groupBy("host")
        .agg(F.count("*").cast("long").alias("n_triangles"))
    )
    nodes = urls.select("host").distinct()
    out = (
        nodes.join(deg, "host", "left").join(tri, "host", "left")
        .select(
            "host",
            F.coalesce("degree", F.lit(0)).cast("long").alias("degree"),
            F.coalesce("n_triangles", F.lit(0)).cast("long")
            .alias("n_triangles"),
        )
        .withColumn(
            "cc_bp",
            F.expr("CASE WHEN degree >= 2 THEN (20000 * n_triangles)"
                   " div (degree * (degree - 1)) ELSE 0 END").cast("long"),
        )
        .orderBy("host")
    )
    out = out.localCheckpoint()
    und.unpersist()
    oriented.unpersist()
    return out


KCORE_ROUNDS = 8  # fixed synchronous h-index rounds (oracle-pinned, LPA
                  # doctrine); the engine asserts convergence within them


def host_kcore(
    edges: DataFrame, urls: DataFrame, rounds: int = KCORE_ROUNDS
) -> DataFrame:
    """(host, core) — exact k-core numbers over the undirected simple host
    graph, zero-filled over the url host dim.  Coreness is the
    degeneracy-ordering spam/centrality signal the degree histogram
    overstates: a host with degree 10^4 from 10^4 degree-1 satellites has
    core 1 (a pure hub), while a modest host inside a dense mutual-link
    neighborhood has high core — link farms are high-core by
    construction, which is why core number beats raw degree as a farm
    detector.

    Algorithm: iterated neighborhood h-index (Lü et al., Nature Comm.
    2016): H^0(v) = degree(v); H^{t+1}(v) = h-index of v's neighbors'
    H^t values; the sequence is pointwise non-increasing and converges to
    the core number exactly.  This is the distributed formulation — the
    classical sequential peel is inherently ordered, but the h-index
    update is one synchronous round of neighbor aggregation, the same
    shuffle shape as a PageRank round.

    Rounds are FIXED at ``rounds`` for the cross-engine twin (the
    LPA_ROUNDS doctrine: aggregates can't live in a recursive SQL term,
    so the oracle unrolls the identical K rounds); the engine then
    ASSERTS convergence — one extra join+count after the last round — and
    raises if any value would still move, so a too-small budget fails
    loudly instead of shipping an upper bound as if it were coreness.

    Per round: one equi-join of the symmetric edge list on the node id +
    one per-node descending sort window + one groupBy-max — the window is
    partition-local with per-key width = degree (the h-index's inherent
    cost), and lineage is truncated per round by localCheckpoint."""
    from pyspark.sql import Window

    und = _und_host_edges(edges, urls)
    sym = (
        und.select(F.col("a").alias("u"), F.col("b").alias("v"))
        .unionByName(und.select(F.col("b").alias("u"), F.col("a").alias("v")))
        .persist()
    )
    labels = (
        sym.groupBy("u").agg(F.count("*").cast("long").alias("val"))
        .localCheckpoint()
    )
    w = Window.partitionBy("u").orderBy(F.desc("val"), F.asc("v"))
    for i in range(rounds + 1):
        nb = (
            sym.join(labels.select(F.col("u").alias("v"),
                                   F.col("val")), "v")
            .select("u", "v", "val")
        )
        new_labels = (
            nb.withColumn("rn", F.row_number().over(w))
            .groupBy("u")
            .agg(
                F.max(
                    F.when(F.col("val") >= F.col("rn"), F.col("rn"))
                    .otherwise(F.lit(0))
                ).cast("long").alias("val")
            )
            .localCheckpoint()
        )
        if i == rounds:
            # convergence assertion round: values must already be fixed
            moved = (
                new_labels.alias("n")
                .join(labels.alias("o"), "u")
                .where(F.col("n.val") != F.col("o.val"))
                .count()
            )
            if moved:
                raise ValueError(
                    f"host_kcore: h-index not converged after {rounds} "
                    f"rounds ({moved} hosts still moving); raise rounds"
                )
            break
        labels = new_labels
    sym.unpersist()
    nodes = urls.select("host").distinct()
    return (
        nodes.join(labels.withColumnRenamed("u", "host"), "host", "left")
        .select(
            "host",
            F.coalesce("val", F.lit(0)).cast("long").alias("core"),
        )
        .orderBy("host")
    )


NEIGHBORHOOD_T = 6  # bounded BFS horizon, shared with the oracle twin


def _all_pairs_reach(
    edges: DataFrame, urls: DataFrame, max_t: int
) -> DataFrame:
    """(src, dst, t): exact first-discovery distances <= max_t over the
    COMPRESSED directed host graph — the all-sources layered-BFS core
    shared by host_neighborhood (the N(t) curve) and host_harmonic (the
    1/d fold), so the two faces can never disagree on a distance.  Per
    level: one equi join through the frontier + distinct + anti-join
    against the reached set; a pair lands at its exact distance because
    a shortest path's prefix is a shortest path (hence no level is empty
    before exhaustion and the empty-frontier early stop is exact);
    lineage truncated per round."""
    hg = (
        host_graph(edges, urls)
        .select("src_host", "dst_host")
        .withColumnRenamed("src_host", "e_src")
        .withColumnRenamed("dst_host", "e_dst")
        .distinct()
        .persist()
    )
    hg.count()
    nodes = urls.select("host").distinct()
    reach = nodes.select(
        F.col("host").alias("src"), F.col("host").alias("dst"),
        F.lit(0).cast("long").alias("t"),
    ).localCheckpoint()
    frontier = reach
    for t in range(1, max_t + 1):
        nxt = (
            frontier.join(hg, frontier["dst"] == hg["e_src"])
            .select("src", F.col("e_dst").alias("dst"))
            .distinct()
            .join(reach.select("src", "dst"), ["src", "dst"], "left_anti")
            .withColumn("t", F.lit(t).cast("long"))
            .localCheckpoint()
        )
        if nxt.isEmpty():
            break
        reach = reach.unionByName(nxt).localCheckpoint()
        frontier = nxt
    hg.unpersist()
    return reach


def host_harmonic(
    edges: DataFrame, urls: DataFrame, max_t: int = NEIGHBORHOOD_T
) -> DataFrame:
    """Harmonic centrality of the directed host graph — H(x) =
    sum over y != x of 1 / d(y, x), incoming distances (Boldi & Vigna,
    "Axioms for Centrality", Internet Mathematics 2014: the one
    centrality satisfying all three of their axioms, and their
    recommended ranking for web graphs precisely because disconnection
    is native — an unreachable pair contributes 0, no infinite-distance
    patch-up, where closeness centrality degenerates).

    Exact integer face over the shared _all_pairs_reach set, bounded at
    ``max_t`` (stated: contributions beyond the horizon are < 1/max_t
    each and drop — the same bounded-horizon contract as
    host_neighborhood): per host, n_sources = hosts that reach it, and
    h_micro = sum of floor(1e6 / t) in exact micro-units, BIGINT end to
    end, so both engines agree bit for bit.  Unreached hosts surface
    with zeros (a centrality table that silently drops isolated hosts
    misreads as a join bug downstream).

    Production shape at 10^8 hosts: HyperBall's per-node |ball(t)|
    registers fold (N_t(x) - N_{t-1}(x)) / t over the IDENTICAL
    level-join — the sketch replaces the exact reach set, the iteration
    does not change; this exact face is its oracle-checkable twin
    (reference: Rsiran/PDF-parser has no graph surface; web-corpus
    extension per SURVEY §2-beyond)."""
    reach = _all_pairs_reach(edges, urls, max_t)
    nodes = urls.select("host").distinct()
    h = (
        reach.where(F.col("t") > 0)
        .groupBy(F.col("dst").alias("host"))
        .agg(
            F.count("*").cast("long").alias("n_sources"),
            F.sum(F.expr("1000000 DIV t")).cast("long").alias("h_micro"),
        )
    )
    return (
        nodes.join(h, "host", "left")
        .select(
            "host",
            F.coalesce("n_sources", F.lit(0)).cast("long")
            .alias("n_sources"),
            F.coalesce("h_micro", F.lit(0)).cast("long").alias("h_micro"),
        )
        .orderBy(F.desc("h_micro"), "host")
    )


def host_neighborhood(
    edges: DataFrame, urls: DataFrame, max_t: int = NEIGHBORHOOD_T
) -> DataFrame:
    """Exact neighborhood function N(t) + effective diameter of the
    DIRECTED host graph — the distance-distribution datasheet of a web
    graph (Boldi & Vigna's HyperBall, WWW 2011 / 2013 lineage; "four
    degrees of separation" is this curve on the Facebook graph).

    One row per achieved distance t: new_pairs = ordered host pairs at
    exactly distance t (t=0 is the self-pairs = node count), n_pairs =
    cumulative N(t), pct_bp = N(t) as basis points of N(max_t), and
    is_eff_diameter marks the FIRST t whose cumulative share reaches 90%
    — the integer form of the effective-diameter definition, relative to
    the bounded horizon (stated, not hidden: the unbounded version needs
    the true reachable-pair count; on a bow-tie-shaped web graph the
    horizon-T curve IS the published artifact).

    Algorithm: all-sources layered BFS — reach carries (src, dst,
    first-discovery t); each round expands the FRONTIER ONLY through one
    equi join, dedups, and anti-joins the already-reached set, so a pair
    is counted at its exact distance (a shortest path's prefix is a
    shortest path, so no distance level can be empty before exhaustion —
    the empty-frontier early stop is exact).  Per round: one join + one
    distinct + one anti join on the COMPRESSED host graph (host_graph
    doctrine: 4-5 orders smaller than the page graph), lineage truncated
    per round.  The exact all-pairs set is O(hosts^2) worst case — the
    10^8-host production form replaces the reach SET with per-node HLL
    registers folded over the same join (HyperBall itself); the exact
    face is the oracle-checkable twin and the correctness anchor for it.

    Aggregation: one groupBy(t) + one ordered window for the cumulative —
    exact BIGINTs end to end (pct in basis points via integer floor-div).
    """
    from pyspark.sql import Window

    reach = _all_pairs_reach(edges, urls, max_t)
    per_t = reach.groupBy("t").agg(F.count("*").cast("long").alias("new_pairs"))
    w_cum = Window.orderBy("t").rowsBetween(Window.unboundedPreceding, 0)
    w_all = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    w_lag = Window.orderBy("t")
    out = (
        per_t.withColumn("n_pairs", F.sum("new_pairs").over(w_cum))
        .withColumn("total", F.sum("new_pairs").over(w_all))
        .withColumn("pct_bp", F.expr("n_pairs * 10000 DIV total"))
        .withColumn(
            "is_eff_diameter",
            (F.col("pct_bp") >= 9000)
            & (F.coalesce(F.lag("pct_bp").over(w_lag), F.lit(0)) < 9000),
        )
        .select("t", "new_pairs", "n_pairs", "pct_bp", "is_eff_diameter")
        .orderBy("t")
    )
    return out


# --- rel=nofollow / ugc / sponsored link semantics -------------------------

REL_HINTS = ("nofollow", "ugc", "sponsored")


def with_synthetic_html_rel(documents: DataFrame) -> DataFrame:
    """with_synthetic_html's twin with link-relation attributes: anchor
    slot k of doc d carries rel = nofollow / ugc / sponsored / none by
    the (d + k) % 5 formula (0/1/2 -> the three hints, 3/4 -> no rel
    attribute), so the oracle re-derives every link's relation."""
    n = documents.count()
    anchors = []
    for k, (m, a) in enumerate(LINK_PARAMS):
        tgt = (F.col("doc_id") * m + a) % n
        r = (F.col("doc_id") + k) % 5
        rel_attr = (
            F.when(r == 0, F.lit(' rel="nofollow"'))
            .when(r == 1, F.lit(' rel="ugc"'))
            .when(r == 2, F.lit(' rel="sponsored"'))
            .otherwise(F.lit(""))
        )
        anchors.append(F.concat(
            F.lit('<a href="https://node'), tgt,
            F.lit(".example.com/doc/"), tgt, F.lit('"'), rel_attr,
            F.lit(">ref"), F.col("doc_id") % 3, F.lit("-"), tgt,
            F.lit("</a>"),
        ))
    html = F.concat(
        F.lit("<html><body><p>"), F.substring(F.col("text"), 1, 40),
        F.lit("</p>"), *anchors, F.lit("</body></html>"),
    )
    return documents.withColumn("html", html)


def extract_outlinks_rel(pages: DataFrame) -> DataFrame:
    """(src, href, dst, rel, followed) — outlink extraction that honors
    the link-relation microformat every production crawler honors
    (rel=nofollow, Google's 2019 additions rel=ugc / rel=sponsored): a
    hinted link is still CRAWLABLE but must not convey endorsement, so
    ranking runs on followed edges only while discovery may use all.
    ``followed`` is false iff the rel attribute contains any hint TOKEN
    (whitespace-delimited — rel is a token list per HTML spec, so
    rel=\"external nofollow\" counts and rel=\"nofollowed\" does not).

    Scale: same shape as extract_outlinks — one JVM regexp_extract_all
    over the attribute blob (attribute ORDER inside the tag is free),
    explode, per-link regexp projections; narrow, no shuffle."""
    tags = F.regexp_extract_all(
        F.col("html"), F.lit(r"<a ([^>]*)>"), F.lit(1)
    )
    hint_re = r"(^|\s)(" + "|".join(REL_HINTS) + r")(\s|$)"
    return (
        pages.select(
            F.col("doc_id").alias("src"), F.explode(tags).alias("attrs")
        )
        .select(
            "src",
            F.regexp_extract("attrs", r'href="([^"]*)"', 1).alias("href"),
            F.regexp_extract("attrs", r'rel="([^"]*)"', 1).alias("rel"),
        )
        .withColumn(
            "dst",
            F.nullif(
                F.regexp_extract("href", r"/doc/([0-9]+)$", 1), F.lit("")
            ).cast("long"),
        )
        .withColumn("followed", ~F.col("rel").rlike(hint_re))
        .select("src", "href", "dst", "rel", "followed")
        .orderBy("src", "href", "rel")
    )


def endorsed_edges(documents: DataFrame) -> DataFrame:
    """(src, dst) restricted to FOLLOWED links — the edge set ranking is
    allowed to use under the rel-hint contract (extract_outlinks_rel):
    discovery crawls every link, endorsement flows only through these."""
    e = extract_outlinks_rel(with_synthetic_html_rel(documents))
    return (
        e.where(F.col("followed") & F.col("dst").isNotNull())
        .select("src", "dst")
    )


def pagerank_followed(documents: DataFrame, iterations: int = 5) -> DataFrame:
    """(doc_id, rank) — PageRank computed on the followed-edge subgraph:
    the production ranking rule once rel hints exist (a page farming
    rel=nofollow comment links gains nothing here, while plain g_pagerank
    would still reward it).  Same exact-integer _power_iterate dataflow;
    the ONLY change is the edge set, so differences vs g_pagerank isolate
    exactly the endorsement rule.  Outdegree note (pinned in the oracle):
    outdeg counts FOLLOWED outlinks only — a page whose links are all
    hinted is a dangling node whose mass is dropped, the same treatment
    plain PageRank gives true sinks here."""
    return pagerank(documents, endorsed_edges(documents), iterations)


def frontier_schedule_v2(
    documents: DataFrame,
    per_domain: int = 5,
    iterations: int = 5,
    suspect_bp: int = SPAM_MASS_SUSPECT_BP,
) -> DataFrame:
    """The crawl frontier with BOTH ranking-integrity rules a production
    scheduler layers on top of frontier_schedule's robots ∩ quota ∩ rank:

      1. Rank on FOLLOWED edges only (pagerank_followed) — rel-hinted
         links discover pages but buy them no fetch priority.
      2. Spam-mass demotion: pages whose followed-edge rank is >=
         suspect_bp unexplained by seed trust (spam_mass over the SAME
         edge set) are dropped from this cycle's queues entirely —
         demotion runs BEFORE slot assignment, so a demoted page leaves
         no hole in its host's politeness spacing.

    Every stage is an already-oracle-checked operator; the composition is
    held to ONE composed DuckDB oracle, so a drift in the rel parser, the
    followed-rank, the trust rescale, robots, or quota fails this hash.

    Scale: one extra anti-join on doc_id over frontier_schedule (the
    suspects frame is rank-table-sized, key-only), plus the trustrank
    rounds spam_mass already costs — all on the cached edge table."""
    edges = endorsed_edges(documents)
    suspects = (
        spam_mass(documents, edges, iterations, suspect_bp=suspect_bp)
        .where(F.col("suspect"))
        .select("doc_id")
    )
    return _schedule(
        documents, edges, per_domain, iterations, exclude=suspects
    )


SALSA_ITERATIONS = 3
SALSA_SCALE = 1_000_000_000  # h0 magnitude: floor-div headroom over K rounds


def salsa(
    documents: DataFrame, edges: DataFrame,
    iterations: int = SALSA_ITERATIONS,
) -> DataFrame:
    """(doc_id, hub, authority) after `iterations` SALSA updates (Lempel
    & Moran, WWW9 2000): HITS with the mutual-reinforcement sums replaced
    by the STOCHASTIC walk — a' = sum of h div outdeg over in-edges,
    h' = sum of a' div indeg over out-edges.  The degree normalization is
    the entire point: it kills the Tightly-Knit Community effect, where a
    small densely-interlinked farm amplifies itself multiplicatively
    under HITS and outranks honestly-endorsed pages; under SALSA's
    normalized walk each farm page can only redistribute its one unit of
    mass, and authority converges toward in-degree share — the farm
    pytest pins this head-to-head against `hits` on the same graph.

    Exact-integer doctrine: h0 = SALSA_SCALE, every division an integer
    floor (values nonnegative, so Spark `div` == DuckDB `//`), every sum
    a BIGINT — cross-engine hashable with the unrolled-CTE twin.  Scale:
    identical dataflow to hits/pagerank (K bounded join+groupBy passes
    over one cached edge+degrees table, eager localCheckpoint, edge cache
    freed on return)."""
    if iterations < 1:
        raise ValueError("salsa requires iterations >= 1")
    nodes = documents.select("doc_id")
    odeg = edges.groupBy("src").agg(F.count("*").alias("odeg"))
    ideg = edges.groupBy("dst").agg(F.count("*").alias("ideg"))
    ed = edges.select("src", "dst").join(odeg, "src").join(ideg, "dst") \
        .persist()
    ed.count()
    hubs = nodes.select(
        "doc_id", F.lit(SALSA_SCALE).cast("long").alias("h")
    )
    auths = None
    for _ in range(iterations):
        auths = (
            ed.join(hubs, ed.src == hubs.doc_id)
            .select("dst", F.expr("h div odeg").alias("c"))
            .groupBy("dst").agg(F.sum("c").alias("a"))
        )
        auths = nodes.join(
            auths, nodes.doc_id == auths.dst, "left"
        ).select("doc_id", F.coalesce("a", F.lit(0)).cast("long").alias("a"))
        hubs = (
            ed.join(auths, ed.dst == auths.doc_id)
            .select("src", F.expr("a div ideg").alias("c"))
            .groupBy("src").agg(F.sum("c").alias("h"))
        )
        hubs = nodes.join(
            hubs, nodes.doc_id == hubs.src, "left"
        ).select("doc_id", F.coalesce("h", F.lit(0)).cast("long").alias("h"))
    out = (
        hubs.join(auths.withColumnRenamed("doc_id", "d"),
                  hubs.doc_id == F.col("d"))
        .select("doc_id", F.col("h").alias("hub"),
                F.col("a").alias("authority"))
        .orderBy("doc_id")
        .localCheckpoint(eager=True)  # see pagerank: frees ed afterwards
    )
    ed.unpersist()
    return out


PPR_SEEDS = (0, 17, 34)   # demo seed pages (production: any page set)
PPR_UNIT = UNIT           # single-seed teleport mass per round
PPR_TOPK = 5


def related_docs(
    documents: DataFrame, edges: DataFrame,
    seeds: tuple[int, ...] = PPR_SEEDS,
    iterations: int = 5, k: int = PPR_TOPK,
) -> DataFrame:
    """(seed_id, doc_id, ppr, rel_rank) — Personalized PageRank
    (Jeh/Widom WWW 2003 'Scaling Personalized Web Search'): the random
    walk restarts at ONE page instead of everywhere, so the stationary
    mass measures proximity TO THAT PAGE — the 'related pages /
    more-like-this' primitive, and the link-structure complement to
    embedding ANN (ANN finds content-similar pages, PPR finds
    link-endorsed neighbors; recommendation stacks blend both).

    Per seed this is trustrank with a singleton seed set — the SAME
    _power_iterate dataflow (exact BIGINT micro-units, floor divisions,
    K cached join+groupBy passes), so PPR cannot drift from the other
    rank faces; the |seeds| iterations run as separate bounded passes
    (production batches many seeds as columns of one frame; the per-seed
    plan is identical).  Top-k per seed excludes the seed itself (its
    own teleport mass always wins trivially), ties to the lowest
    doc_id."""
    from pyspark.sql import Window

    outs = []
    for s in seeds:
        seed_base = F.when(
            F.col("doc_id") == s, F.lit(PPR_UNIT)
        ).otherwise(F.lit(0)).cast("long")
        r = _power_iterate(
            documents, edges, iterations,
            init_col=seed_base, base_col=seed_base, out_name="ppr",
        )
        outs.append(
            r.where(F.col("doc_id") != s)
            .withColumn("seed_id", F.lit(s).cast("long"))
        )
    un = outs[0]
    for o in outs[1:]:
        un = un.unionByName(o)
    w = Window.partitionBy("seed_id").orderBy(
        F.col("ppr").desc(), F.col("doc_id").asc()
    )
    return (
        un.where(F.col("ppr") > 0)  # an unreachable page is not 'related'
        # (filtered BEFORE ranking, so rank indices never skip over
        # zero-mass rows — the oracle's WHERE-before-window order)
        .withColumn("rel_rank", F.row_number().over(w).cast("long"))
        .where(F.col("rel_rank") <= k)
        .select("seed_id", "doc_id", "ppr", "rel_rank")
        .orderBy("seed_id", "rel_rank")
    )


def assortativity_moments(
    documents: DataFrame, edges: DataFrame
) -> DataFrame:
    """One-row exact-integer moment table for DEGREE ASSORTATIVITY
    (Newman 2002): over every edge, x = outdeg(src), y = indeg(dst) —
    n_edges, sum x, sum y, sum xy, sum x2, sum y2, plus the covariance
    numerator n*sum_xy - sum_x*sum_y and its sign.  Web graphs are
    famously DISASSORTATIVE (hubs link to low-degree pages; negative
    sign), and the sign flipping positive on a crawl slice is a strong
    mirror-farm/link-ring smell — the datasheet number next to
    degree_distribution's shape.

    Float-free on purpose (the len_quality_assoc doctrine): the full
    correlation needs only two sqrts on top, downstream; the moments
    themselves are exact BIGINTs both engines.  Scale: two degree
    groupBys + two keyed joins back onto the edge stream + one
    map-side-combined 1-row fold — no corpus-ordered shuffle."""
    odeg = edges.groupBy("src").agg(F.count("*").cast("long").alias("x"))
    ideg = edges.groupBy("dst").agg(F.count("*").cast("long").alias("y"))
    exy = edges.join(odeg, "src").join(ideg, "dst")
    row = exy.agg(
        F.count("*").cast("long").alias("n_edges"),
        F.sum("x").cast("long").alias("sum_x"),
        F.sum("y").cast("long").alias("sum_y"),
        F.sum(F.col("x") * F.col("y")).cast("long").alias("sum_xy"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("sum_x2"),
        F.sum(F.col("y") * F.col("y")).cast("long").alias("sum_y2"),
    )
    cov_num = (F.col("n_edges") * F.col("sum_xy")
               - F.col("sum_x") * F.col("sum_y"))
    return row.select(
        "*",
        cov_num.cast("long").alias("cov_num"),
        F.signum(cov_num).cast("long").alias("cov_sign"),
    )
