"""`spark.read.format("warc")` — a registered Spark 4 Python DataSource.

The lineSep trick in sources/warc.py parses WARC through the JVM text
reader; this module exposes the SAME record format through the official
Python DataSource API (pyspark.sql.datasource, Spark 4), which is how a
production team would actually ship a custom format: a named source with
its own schema, partition planning, and (4.1+) filter pushdown — usable by
anyone as ``spark.dataSource.register(WarcDataSource);
spark.read.format("warc").load(dir)`` with zero knowledge of the byte
layout.

Partition planning: one InputPartition per archive part file — the real
parallelism unit of WARC corpora (Common Crawl ships ~10^5 gzip members
per crawl; gzip is file-granular, so file = task is the right grain, and
at 10^12 records the planner lists files from the manifest/filesystem,
never opens them).

Record framing: by the WARC header's Content-Length (the spec's rule),
streamed off the file handle — NOT by splitting on the version line — so
payload bytes that happen to contain ``WARC/1.0\\r\\n`` stay inside their
record.  This makes the Python DataSource the robust read path; the JVM
lineSep reader in sources/warc.py keeps the split-framing trade-off for
its zero-Python speed (caveat documented there).

Filter pushdown: EqualTo on http_status / target_uri / content_type is
consumed inside the reader — a target_uri rejection seeks past the whole
content block and an http-field rejection seeks past the remaining body
bytes, so rejected bodies are never read off disk (the payload is the
dominant byte cost of a WARC record, so skipping it on header mismatch is
the real win).  All other filters are returned to Spark per the API
contract.
"""

from __future__ import annotations

import glob
import os

from pyspark.sql.datasource import (
    DataSource, DataSourceReader, EqualTo, InputPartition,
)

WARC_SCHEMA = (
    "target_uri string, warc_date string, http_status int, "
    "content_type string, content_length long, body string"
)
_PUSHABLE = {"http_status", "target_uri", "content_type"}


class _WarcPartition(InputPartition):
    def __init__(self, path: str):
        self.path = path


class WarcReader(DataSourceReader):
    def __init__(self, options: dict):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("warc datasource requires a path")
        self.pushed: list[tuple[str, object]] = []

    def pushFilters(self, filters):
        rest = []
        for f in filters:
            if isinstance(f, EqualTo) and len(f.attribute) == 1 \
                    and f.attribute[0] in _PUSHABLE:
                self.pushed.append((f.attribute[0], f.value))
            else:
                rest.append(f)
        return rest

    def partitions(self):
        if os.path.isdir(self.path):
            files = sorted(
                p for p in glob.glob(os.path.join(self.path, "part-*"))
                if os.path.isfile(p)
            ) or sorted(
                p for p in glob.glob(os.path.join(self.path, "*"))
                if os.path.isfile(p)
            )
        else:
            files = [self.path]
        return [_WarcPartition(p) for p in files]

    def read(self, partition):
        """Stream records framed by the WARC header's Content-Length (the
        spec's framing rule: the header's Content-Length is the exact byte
        length of the content block), NOT by splitting on the version
        line — so a payload that itself contains ``WARC/1.0\\r\\n`` bytes
        cannot corrupt its own tail or any following record (the r3
        ADVICE bug).  The file is consumed incrementally: a pushed-filter
        rejection on a WARC-header field seeks past the whole block, and a
        rejection on an HTTP-header field seeks past the remaining body
        bytes — rejected bodies are genuinely never read off disk, which
        is the real win (payload is the dominant byte cost of a record)."""
        import re

        status_re = re.compile(rb"^HTTP/[0-9.]+ ([0-9]+)")
        with open(partition.path, "rb") as fh:
            while True:
                line = fh.readline()
                if not line:
                    break
                if not line.rstrip(b"\r\n").startswith(b"WARC/"):
                    continue  # inter-record CRLFs / preamble
                whdr: dict = {}
                while True:
                    ln = fh.readline()
                    if not ln or ln in (b"\r\n", b"\n"):
                        break
                    k, _, v = ln.partition(b":")
                    whdr[k.strip().lower()] = v.strip()
                try:
                    block_len = int(whdr.get(b"content-length", b""))
                except ValueError:
                    continue  # unframed record: cannot recover safely
                target_uri = whdr.get(b"warc-target-uri", b"").decode(
                    "utf-8", errors="replace")
                warc_date = whdr.get(b"warc-date", b"").decode(
                    "utf-8", errors="replace")
                # WARC-header-only rejection: skip the ENTIRE content
                # block (HTTP header + body) without reading it
                if any(a == "target_uri" and target_uri != v
                       for a, v in self.pushed):
                    fh.seek(block_len, 1)
                    continue
                # HTTP header: read line-wise INSIDE the block, counting
                # consumed bytes so the body remainder can be seeked past
                consumed = 0
                http_lines = []
                while consumed < block_len:
                    ln = fh.readline()
                    if not ln:
                        break
                    consumed += len(ln)
                    if ln in (b"\r\n", b"\n"):
                        break
                    http_lines.append(ln)
                first = http_lines[0] if http_lines else b""
                m = status_re.match(first)
                http_status = int(m.group(1)) if m else None
                http_hdr = b"".join(http_lines).decode(
                    "utf-8", errors="replace")
                # same (case-sensitive, unanchored) field regexes as the
                # JVM lineSep parser — the two paths share one oracle hash
                m = re.search(r"Content-Type: ([^\r\n]*)", http_hdr)
                content_type = m.group(1) if m else ""
                m = re.search(r"Content-Length: ([0-9]+)", http_hdr)
                content_length = int(m.group(1)) if m else None
                body_len = max(0, block_len - consumed)
                hdr_vals = {"target_uri": target_uri,
                            "http_status": http_status,
                            "content_type": content_type}
                if any(hdr_vals[a] != v for a, v in self.pushed):
                    fh.seek(body_len, 1)  # body bytes never read
                    continue
                body = fh.read(body_len).decode("utf-8", errors="replace")
                yield (target_uri, warc_date, http_status, content_type,
                       content_length, body)


class WarcDataSource(DataSource):
    @classmethod
    def name(cls):
        return "warc"

    def schema(self):
        return WARC_SCHEMA

    def reader(self, schema):
        return WarcReader(self.options)


def datasource_roundtrip(spark, sf_dir: str, scratch_root: str | None = None):
    """Driver query: documents -> write_warc shards -> the REGISTERED
    format("warc") read -> the same fidelity projection as u_warc_roundtrip
    (and the same oracle: the record format is shared, so the two read
    paths — JVM lineSep vs Python DataSource — are held to one hash)."""
    import tempfile

    from pyspark.sql import functions as F

    from pdf_parser_spark.sources.warc import write_warc

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    root = scratch_root or tempfile.gettempdir()
    out_dir = os.path.join(
        root, f"pdf_parser_spark_warcds_{os.path.basename(sf_dir.rstrip('/'))}"
    )
    write_warc(docs, out_dir)
    # required for pushFilters (a plain AssertionError without it); set
    # here too so the query runs under sessions not built by session.py
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    spark.dataSource.register(WarcDataSource)
    back = spark.read.format("warc").load(out_dir)
    return back.select(
        F.regexp_extract("target_uri", r"/([0-9]+)$", 1).cast("long").alias("doc_id"),
        "target_uri", "http_status", "content_length",
        F.length("body").cast("long").alias("n_body_chars"),
        F.md5("body").alias("body_md5"),
    ).orderBy("doc_id")
