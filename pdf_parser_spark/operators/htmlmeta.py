"""HTML head-metadata extraction: title, charset, meta description,
canonical link, og:title — the per-page fields a crawl pipeline indexes
before (and independently of) main-content extraction.

The reference's pipeline reads per-document metadata out of the parsed
body (cf. /root/reference/src/programmatic.py cover-field captures); the
crawl-scale analog reads the <head> element — cheap, regex-addressable,
and present even on pages whose bodies fail extraction.

All five fields come out of ONE projection over the html column — five
Java regexp_extracts fused by whole-stage codegen into a single pass; no
Python, no explode, no shuffle.  Patterns are RE2/Java-compatible (no
lookaround/backreferences) so the DuckDB oracle runs the byte-identical
regexes.  Missing fields surface as '' (Spark regexp_extract's no-match
value; the oracle coalesces to match) — never NULL, so the driver's
hash compare is stable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pdf_parser_spark.functions import words

TITLE_RE = r"<title>([^<]*)</title>"
CHARSET_RE = r'charset="([^"]*)"'
DESC_RE = r'<meta name="description" content="([^"]*)"'
CANON_RE = r'<link rel="canonical" href="([^"]*)"'
OG_TITLE_RE = r'property="og:title" content="([^"]*)"'


def with_head_html(documents: DataFrame) -> DataFrame:
    """Add an ``html`` column with a synthesized <head>: charset cycles by
    doc_id%4, title = first 5 words, description (first 8 words) present
    unless doc_id%4==1, canonical unless doc_id%3==0, og:title when
    doc_id%5<2 — all pure functions of (doc_id, source, text) so the
    oracle re-derives the identical bytes."""
    d = F.col("doc_id")
    toks = words(F.col("text"))
    title = F.concat_ws(" ", F.slice(toks, 1, 5))
    desc = F.concat_ws(" ", F.slice(toks, 1, 8))
    charset = (
        F.when(d % 4 == 0, "utf-8")
        .when(d % 4 == 1, "UTF-8")
        .when(d % 4 == 2, "iso-8859-1")
        .otherwise("windows-1252")
    )
    canon = F.concat(
        F.lit("https://"), F.col("source"), F.lit(".example.com/doc/"), d
    )
    html = F.concat(
        F.lit('<html><head><meta charset="'), charset, F.lit('">'),
        F.lit("<title>"), title, F.lit("</title>"),
        F.when(
            d % 4 != 1,
            F.concat(F.lit('<meta name="description" content="'), desc, F.lit('">')),
        ).otherwise(F.lit("")),
        F.when(
            d % 3 != 0,
            F.concat(F.lit('<link rel="canonical" href="'), canon, F.lit('">')),
        ).otherwise(F.lit("")),
        F.when(
            d % 5 < 2,
            F.concat(
                F.lit('<meta property="og:title" content="'),
                F.upper(title), F.lit('">'),
            ),
        ).otherwise(F.lit("")),
        F.lit("</head><body><p>"), F.substring(F.col("text"), 1, 60),
        F.lit("</p></body></html>"),
    )
    return documents.withColumn("html", html)


def head_meta(pages: DataFrame) -> DataFrame:
    """(doc_id, title, charset, description, canonical, og_title) in one
    codegen'd pass over html; absent fields are ''."""
    h = F.col("html")
    return pages.select(
        "doc_id",
        F.regexp_extract(h, TITLE_RE, 1).alias("title"),
        F.regexp_extract(h, CHARSET_RE, 1).alias("charset"),
        F.regexp_extract(h, DESC_RE, 1).alias("description"),
        F.regexp_extract(h, CANON_RE, 1).alias("canonical"),
        F.regexp_extract(h, OG_TITLE_RE, 1).alias("og_title"),
    ).orderBy("doc_id")


# ---------------------------------------------------------------------------
# Boilerplate-gate audit: the north-star text/link-density scoring as records
# ---------------------------------------------------------------------------


def with_boilerplate_html(documents: DataFrame) -> DataFrame:
    """Add an ``html`` column exercising every verdict of the block gate,
    pure function of (doc_id, text) so the oracle re-derives each block's
    exact character arithmetic: a link-only <div> (chrome, link_bp
    10000), a 2-char <p> (under MIN_BLOCK_CHARS), the body <p> carrying
    'Body: ' + the doc's first 80 chars (always kept), and a mixed
    prose+anchor <p> whose link density lands on opposite sides of the
    50% gate by doc_id parity."""
    d = F.col("doc_id")
    mixed = F.when(
        d % 2 == 1,
        F.lit('<p>see <a href="/x">this linked phrase here</a> tail</p>'),
    ).otherwise(F.lit(
        '<p>plenty of surrounding prose here <a href="/x">tiny</a>'
        ' and much more after</p>'))
    html = F.concat(
        F.lit('<html><body>'
              '<div><a href="/m1">menu alpha beta</a>'
              '<a href="/m2">menu gamma delta</a></div>'
              '<p>ok</p><p>Body: '),
        F.substring(F.col("text"), 1, 80),
        F.lit("</p>"),
        mixed,
        F.lit("</body></html>"),
    )
    return documents.withColumn("html", html)


def boilerplate_audit(pages: DataFrame, html_col: str = "html") -> DataFrame:
    """(doc_id, block_ord, tag, text_chars, anchor_chars, total_chars,
    link_bp, verdict) — core.html_extract.block_audit over the html
    column: the per-block text-density/link-density verdicts of the
    north-star boilerplate gate, as an auditable table instead of a
    silent fold into the extracted text (the tuning loop every
    production extractor needs: lowering MAX_LINK_DENSITY is a diff on
    THIS table, not a rerun-and-eyeball).

    One Arrow stage over (doc_id, html) — the same shape as every other
    per-document kernel; all counting is exact integers."""
    from collections.abc import Iterator

    import pandas as pd

    from pdf_parser_spark.core.html_extract import block_audit

    cols = ["block_ord", "text_chars", "anchor_chars",
            "total_chars", "link_bp"]

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {"doc_id": []}
            out.update({c: [] for c in cols})
            out["tag"] = []
            out["verdict"] = []
            for doc_id, html in zip(pdf["doc_id"], pdf[html_col]):
                for rec in block_audit(html):
                    out["doc_id"].append(int(doc_id))
                    for c in cols:
                        out[c].append(int(rec[c]))
                    out["tag"].append(rec["tag"])
                    out["verdict"].append(rec["verdict"])
            yield pd.DataFrame(out)

    return (
        pages.select("doc_id", html_col)
        .mapInPandas(
            fn,
            "doc_id long, block_ord long, tag string, text_chars long,"
            " anchor_chars long, total_chars long, link_bp long,"
            " verdict string",
        )
        .orderBy("doc_id", "block_ord")
    )
