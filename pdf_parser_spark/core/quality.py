"""Structural quality harness: the reference's 9 deterministic output checks
(reference test_runner.py:358-368, ALL_CHECKS) re-implemented as a pure
per-document function over the assembled markdown.

SURVEY.md §5 level 4: these run fleet-wide as a vectorized Spark stage
(operators.quality) with a relational pass-rate rollup — the reference runs
them one file at a time in a CLI loop (test_runner.py main).

Check semantics (each cites the reference implementation it mirrors):
 1 section_completeness   expected ## sections per filing type   (112-129)
 2 financial_tables       financial sections contain pipe tables (132-154)
 3 no_stray_page_numbers  bare 1-3 digit lines outside tables    (157-177)
 4 table_structure_valid  consistent pipe counts per table       (180-209)
 5 no_empty_sections      >20 chars unless Reserved/None-ish     (218-236)
 6 prose_quality          Notes/MDA have ###; no 4+ blank lines  (239-266)
 7 cover_page_fields      Filing Type / Company / Period present (269-296)
 8 table_density          >=5 table rows per financial section   (299-330)
 9 no_pdf_artifacts       TOC repeats / U+FFFD / F-N refs        (333-354)
"""

from __future__ import annotations

import re
from typing import NamedTuple

EXPECTED_SECTIONS = {
    "10-Q": (
        "Cover Page",
        "Consolidated Balance Sheets",
        "Consolidated Statements of Income",
        "Consolidated Statements of Cash Flows",
        "Consolidated Statements of Stockholders' Equity",
        "Notes to Financial Statements",
        "Management's Discussion and Analysis",
    ),
    "10-K": (
        "Cover Page",
        "Consolidated Balance Sheets",
        "Consolidated Statements of Income",
        "Consolidated Statements of Cash Flows",
        "Consolidated Statements of Stockholders' Equity",
        "Notes to Financial Statements",
        "Management's Discussion and Analysis",
        "Risk Factors",
    ),
}

FINANCIAL_TABLE_SECTIONS = (
    "Consolidated Balance Sheets",
    "Consolidated Statements of Income",
    "Consolidated Statements of Cash Flows",
    "Consolidated Statements of Stockholders' Equity",
)

_EMPTY_ALLOW = re.compile(r"Reserved|Mine Safety|None\.?|Not Applicable", re.IGNORECASE)
_SEP_ROW = re.compile(r"^\|[\s:|-]+\|$")
_FN_REF = re.compile(r"(?<!Form )\bF-\d+\b")
_HEADING = re.compile(r"^## (.+)$")


class CheckOutcome(NamedTuple):
    check: str
    passed: bool
    detail: str


def _sections(md: str) -> dict[str, str]:
    """{## title: body} in order (ref test_runner.py:85-106)."""
    out: dict[str, str] = {}
    title = ""
    buf: list[str] = []
    for line in md.splitlines():
        m = _HEADING.match(line)
        if m:
            if title:
                out[title] = "\n".join(buf).strip()
            title = m.group(1).strip()
            buf = []
        else:
            buf.append(line)
    if title:
        out[title] = "\n".join(buf).strip()
    return out


def _find(sections: dict[str, str], needle: str) -> str | None:
    low = needle.lower()
    for title in sections:
        if low in title.lower():
            return title
    return None


def detect_filing_type(md: str) -> str:
    m = re.search(r"\|\s*Filing Type\s*\|\s*(10-[QK](?:/A)?)\s*\|", md)
    return m.group(1) if m else "10-Q"


def structural_checks(md: str, filing_type: str | None = None) -> list[CheckOutcome]:
    """Run all 9 checks; one outcome per check, reference order."""
    ft = (filing_type or detect_filing_type(md)).replace("/A", "")
    sections = _sections(md)
    out: list[CheckOutcome] = []

    # 1 — section completeness
    expected = EXPECTED_SECTIONS.get(ft, EXPECTED_SECTIONS["10-Q"])
    missing = [e for e in expected if _find(sections, e) is None]
    out.append(CheckOutcome(
        "section_completeness", not missing,
        f"{len(expected) - len(missing)}/{len(expected)} expected sections",
    ))

    # 2 — financial sections have pipe tables
    no_table = [
        s for s in FINANCIAL_TABLE_SECTIONS
        if (k := _find(sections, s)) is not None and "|" not in sections[k]
    ]
    out.append(CheckOutcome(
        "financial_tables_formatted", not no_table, "; ".join(no_table) or "ok"
    ))

    # 3 — stray page numbers outside tables
    stray = 0
    for line in md.splitlines():
        s = line.strip()
        if s.startswith("|"):
            continue
        if re.fullmatch(r"\d{1,3}", s):
            stray += 1
    out.append(CheckOutcome(
        "no_stray_page_numbers", stray == 0, f"{stray} stray line(s)"
    ))

    # 4 — consistent pipe counts per contiguous table block
    bad_rows = 0
    block: list[str] = []

    def flush(block: list[str]) -> int:
        if len(block) < 2:
            return 0
        want = block[0].count("|")
        return sum(1 for ln in block if ln.count("|") != want)

    for line in md.splitlines():
        if line.strip().startswith("|"):
            block.append(line)
        elif block:
            bad_rows += flush(block)
            block = []
    bad_rows += flush(block)
    out.append(CheckOutcome(
        "table_structure_valid", bad_rows == 0, f"{bad_rows} inconsistent row(s)"
    ))

    # 5 — no empty sections (allowlist Reserved/None/Not Applicable)
    empty = [
        t for t, c in sections.items()
        if len(c.strip()) <= 20
        and not (_EMPTY_ALLOW.search(c) or _EMPTY_ALLOW.search(t))
    ]
    out.append(CheckOutcome("no_empty_sections", not empty, "; ".join(empty) or "ok"))

    # 6 — prose quality in Notes / MD&A
    prose_issues = 0
    for name in ("Notes to Financial Statements", "Management's Discussion and Analysis"):
        k = _find(sections, name)
        if k is None:
            continue
        c = sections[k]
        if "### " not in c and len(c.strip()) > 200:
            prose_issues += 1
        if "\n\n\n\n" in c:
            prose_issues += 1
    out.append(CheckOutcome(
        "prose_quality", prose_issues == 0, f"{prose_issues} issue(s)"
    ))

    # 7 — cover page required fields
    k = _find(sections, "cover page")
    cover = sections.get(k, "") if k else ""
    missing_f = [f for f in ("Filing Type", "Company", "Period") if f not in cover]
    out.append(CheckOutcome(
        "cover_page_fields",
        bool(cover) and not missing_f,
        "; ".join(missing_f) or ("ok" if cover else "no cover section"),
    ))

    # 8 — >=5 table rows per financial section
    sparse = []
    for s in FINANCIAL_TABLE_SECTIONS:
        k = _find(sections, s)
        if k is None:
            continue
        rows = sum(
            1 for ln in sections[k].splitlines()
            if ln.strip().startswith("|") and not _SEP_ROW.match(ln.strip())
        )
        if rows < 5:
            sparse.append(f"{k}:{rows}")
    out.append(CheckOutcome("table_density", not sparse, "; ".join(sparse) or "ok"))

    # 9 — no PDF artifacts
    issues = 0
    if md.lower().count("table of contents") > 2:
        issues += 1
    if "�" in md:
        issues += 1
    if len(_FN_REF.findall(md)) > 3:
        issues += 1
    out.append(CheckOutcome(
        "no_pdf_artifacts", issues == 0, f"{issues} artifact type(s)"
    ))
    return out
