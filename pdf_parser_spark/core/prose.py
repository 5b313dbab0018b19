"""Prose cleanup and exhibits formatting (X3-X5 in SURVEY.md §2.5).

Semantics of reference programmatic.py:239-273 (exhibits), 1467-1478 (notes
fallback), 1485-1601 (clean_prose).  The repeated-header Counter is
per-document, so the whole stage remains a per-row pure function.
"""

from __future__ import annotations

import re
from collections import Counter

from pdf_parser_spark.core.model import Table

_PAGE_NUM = re.compile(r"^\s*\d{1,3}\s*$")
_PIPE_FOOTER = re.compile(
    r"^\s*.{3,50}\s*\|\s*\d{4}\s+Form\s+10-[KQ](?:/A)?\s*\|\s*\d{1,3}\s*$",
    re.IGNORECASE,
)
_TOC_HEADER = re.compile(r"^\s*(?:Financial\s+)?Table\s+of\s+Contents\b.*$", re.IGNORECASE)
_FPAGE = re.compile(r"^\s*F-\d{1,3}\s*$")
_TRAILING_FPAGE = re.compile(r"\s+F-\d{1,3}\.?\s*$")
_ITEM_HEADER = re.compile(r"^(Item\s+\d+[A-Za-z]?\.\s+.+)$", re.IGNORECASE)
_SENTENCEISH = re.compile(r"^[A-Z]\w+\s+[a-z].*[a-z]\s+[a-z]")
_BLANKS = re.compile(r"\n{3,}")


def clean_prose(section_text: str, tables: list[Table] | None = None) -> str:
    """Strip page artifacts, promote Item/title-case headings, rejoin
    mid-sentence line breaks (ref programmatic.py:1485-1601)."""
    table_md = ""
    if tables:
        from pdf_parser_spark.core.tables import tables_to_markdown

        rendered = tables_to_markdown(section_text, tables)
        if "|" in rendered:
            table_md = rendered

    lines = [
        l for l in section_text.splitlines()
        if not _PAGE_NUM.match(l)
        and not _PIPE_FOOTER.match(l)
        and not _TOC_HEADER.match(l)
        and not _FPAGE.match(l)
    ]
    lines = [
        _TRAILING_FPAGE.sub("", l) if not l.lstrip().startswith("|") else l
        for l in lines
    ]

    counts: Counter[str] = Counter(l.strip() for l in lines if l.strip())
    repeated = {t for t, c in counts.items() if c >= 3 and len(t) < 120}
    lines = [l for l in lines if l.strip() not in repeated]

    staged: list[str] = []
    for line in lines:
        s = line.strip()
        if not s:
            staged.append("")
            continue
        m = _ITEM_HEADER.match(s)
        if m:
            staged.append(f"### {m.group(1)}")
            continue
        words = s.split()
        if (
            2 <= len(words) <= 10
            and len(s) < 80
            and not s.endswith((",", ";", ":", "and", "or"))
            and s[0].isupper()
            and not s.startswith(("(", "$", "•", "-", "*"))
            and sum(1 for w in words if w[0].isupper()) / len(words) >= 0.6
            and not _SENTENCEISH.match(s)
        ):
            staged.append(f"### {s}")
            continue
        staged.append(s)

    # rejoin mid-sentence splits: a line starting lowercase continues the prior
    joined: list[str] = []
    for line in staged:
        if (
            joined
            and joined[-1]
            and not joined[-1].startswith("#")
            and not line.startswith(("#", "|", "-", "*", "•"))
            and line
            and line[0].islower()
        ):
            joined[-1] = joined[-1] + " " + line
        else:
            joined.append(line)

    out = _BLANKS.sub("\n\n", "\n".join(joined)).strip()
    if table_md:
        out = out + "\n\n" + table_md
    return out


_EXHIBIT_NUM = re.compile(r"^(\d{1,3}(?:\.\d{1,3})?(?:\.\w+)?)\s")


def format_exhibits(section_text: str) -> str:
    """Exhibit entries ('31.1 ...', '101.INS ...') become markdown list items;
    <2 hits falls back to clean_prose (ref programmatic.py:244-273)."""
    out: list[str] = []
    hits = 0
    for line in section_text.splitlines():
        s = line.strip()
        if not s:
            out.append("")
            continue
        if re.match(r"^\s*\d{1,3}\s*$", s):
            continue
        if _EXHIBIT_NUM.match(s):
            out.append(f"- {s}")
            hits += 1
        else:
            out.append(s)
    if hits < 2:
        return clean_prose(section_text)
    return _BLANKS.sub("\n\n", "\n".join(out)).strip()


def notes_fallback(section_text: str) -> str:
    """Notes without the LLM tier: prose cleanup only — rendering the grid
    tables would duplicate inline text (ref programmatic.py:1467-1478)."""
    return clean_prose(section_text)
