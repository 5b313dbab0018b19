"""Per-document classifiers: report type, embedded-10-K start page, scanned check.

Semantics of reference detect.py and pdf_extract.py:253-266.  All are pure
predicates over the ordered page list of ONE document — in Spark they run
inside the extraction Arrow batch, never as separate shuffles.
"""

from __future__ import annotations

import re
from typing import Sequence

# --- report-type scoring (ref detect.py:10-24, 111-129) ---

SEC_MARKERS = (
    re.compile(r"FORM\s+10-[KQ]", re.IGNORECASE),
    re.compile(r"SECURITIES\s+AND\s+EXCHANGE\s+COMMISSION", re.IGNORECASE),
    re.compile(r"Central\s+Index\s+Key", re.IGNORECASE),
)

IFRS_MARKERS = (
    re.compile(r"(?:EUR|NOK|DKK|SEK|GBP)['’]?000", re.IGNORECASE),
    re.compile(r"\bIFRS\b"),
    re.compile(r"(?:CVR|Org\.?\s*(?:nr|no|number))[.\s:]+[\d\s]+", re.IGNORECASE),
    re.compile(r"Statement\s+of\s+Profit\s+or\s+Loss", re.IGNORECASE),
    re.compile(r"Statement\s+of\s+Financial\s+Position", re.IGNORECASE),
    re.compile(r"Oslo\s+B.rs|Oslo\s+Stock\s+Exchange|Euronext", re.IGNORECASE),
)


# required-literal prefilters per marker: every regex match string must
# contain the listed literal(s) (uppercased page scan), so a page without
# them can skip the regex entirely.  None = no cheap literal exists.
_SEC_LITS = (("FORM", "10-"), ("EXCHANGE",), ("CENTRAL",))
_IFRS_LITS = (("000",), ("IFRS",), None, ("STATEMENT",), ("STATEMENT",),
              None)


def classify_report_type(page_texts: Sequence[str], scan_pages: int = 10) -> str:
    """'sec' or 'ifrs' by counting UNIQUE patterns matched over the first N
    pages; ties default to 'sec' (ref detect.py:111-129).

    Perf (hit sets unchanged): a pattern already in its hit set is never
    re-searched on later pages, and each remaining pattern first checks its
    required literal(s) against one uppercased copy of the page."""
    sec_hits: set[int] = set()
    ifrs_hits: set[int] = set()
    n_sec, n_ifrs = len(SEC_MARKERS), len(IFRS_MARKERS)
    for text in page_texts[:scan_pages]:
        if len(sec_hits) == n_sec and len(ifrs_hits) == n_ifrs:
            break
        up = text.upper()
        for i, pat in enumerate(SEC_MARKERS):
            if i in sec_hits:
                continue
            lits = _SEC_LITS[i]
            if all(l in up for l in lits) and pat.search(text):
                sec_hits.add(i)
        for i, pat in enumerate(IFRS_MARKERS):
            if i in ifrs_hits:
                continue
            lits = _IFRS_LITS[i]
            if (lits is None or all(l in up for l in lits)) and pat.search(text):
                ifrs_hits.add(i)
    return "ifrs" if len(ifrs_hits) > len(sec_hits) else "sec"


# --- TOC predicate used by 10-K start detection (ref detect.py:27-41) ---

def is_toc_page_simple(text: str) -> bool:
    if "TABLE OF CONTENTS" not in text.upper():
        return False
    hits = 0
    for line in text.split("\n"):
        if re.search(r"\.{2,}\s*\d+\s*$", line) or re.search(r"\s{3,}\d+\s*$", line):
            hits += 1
    return hits >= 3


# --- embedded 10-K start page (ref detect.py:45-108) ---

_FORM_RE = re.compile(r"FORM\s+10-[KQ]", re.IGNORECASE)
_COMMISSION_RE = re.compile(
    r"UNITED\s+STATES\s+SECURITIES\s+AND\s+EXCHANGE\s+COMMISSION", re.IGNORECASE
)
_REGISTRANT_RE = re.compile(r"\(Exact\s+name\s+of\s+registrant", re.IGNORECASE)
_FORM_FOOTER_RE = re.compile(
    r"(?:^|\n)\s*(?:\d+\s+)?.{3,60}/\d{4}\s+Form\s+10-[KQ](?:\s+\d+)?\s*(?:$|\n)",
    re.IGNORECASE,
)


def find_filing_start_page(page_texts: Sequence[str]) -> int:
    """1-indexed page where the embedded 10-K/10-Q begins; 1 when the whole
    document is the filing (ref detect.py:62-108).  Priority: SEC cover page
    markers, registrant line, then Form-10-K footer (page > 1 only)."""
    for pg, text in enumerate(page_texts, start=1):
        if is_toc_page_simple(text):
            continue
        if _COMMISSION_RE.search(text) and _FORM_RE.search(text):
            return pg
        if _REGISTRANT_RE.search(text):
            return pg
    for pg, text in enumerate(page_texts, start=1):
        if _FORM_FOOTER_RE.search(text):
            if pg > 1:
                return pg
            break  # footer on page 1 => no prefix
    return 1


# --- scanned-document rejection (ref pdf_extract.py:253-266) ---

def scanned_fraction(page_texts: Sequence[str], min_chars: int = 50) -> float:
    """Fraction of pages with fewer than min_chars of stripped text."""
    if not page_texts:
        return 0.0
    sparse = sum(1 for t in page_texts if len(t.strip()) < min_chars)
    return sparse / len(page_texts)


def is_scanned(page_texts: Sequence[str], threshold: float = 0.8, min_chars: int = 50) -> bool:
    """True when the document looks image-based.  Unlike the reference (which
    raises — pdf_extract.py:262), the engine routes these rows to the error
    sink via a status column (fail-soft per row)."""
    if not page_texts:
        return False
    return scanned_fraction(page_texts, min_chars) > threshold
