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
