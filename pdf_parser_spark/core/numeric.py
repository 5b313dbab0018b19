"""Financial number parsing — semantics of reference validate.py:20-54 and
programmatic.py:778-788 (file:line cites are into /root/reference/sec_parser/).

Pure scalar functions plus vectorized pandas variants used by the Arrow stages.
"""

from __future__ import annotations

import re
from functools import lru_cache

_CURRENCY_RE = re.compile(r"[$€£]")  # $ € £
_PAREN_RE = re.compile(r"^\((.+)\)$")
_DASHES = ("—", "-", "–", "")  # — - –


def parse_numeric(value: str | None) -> float | None:
    """Display-formatted financial string -> float (or None).

    Semantics mirror reference validate.parse_numeric (validate.py:20-54):
    strips currency symbols, treats em/en-dash and hyphen as null, parses
    parenthetical negatives, strips commas/inner whitespace.
    """
    if value is None:
        return None
    s = value.strip()
    if not s:
        return None
    s = _CURRENCY_RE.sub("", s).strip()
    if s in _DASHES:
        return None
    neg = False
    m = _PAREN_RE.match(s)
    if m:
        neg = True
        s = m.group(1).strip()
    s = s.replace(",", "").replace(" ", "")
    try:
        out = float(s)
    except ValueError:
        return None
    return -out if neg else out


@lru_cache(maxsize=16384)
def is_numeric_cell(cell: str) -> bool:
    """True when a table cell is numeric-ish (ref programmatic._is_numeric:778-788).

    Dashes and the empty string count as numeric (they are null placeholders in
    financial tables); parenthetical negatives are accepted.  Memoized — pure,
    and cell vocabulary repeats across documents.
    """
    cleaned = cell.replace("$", "").replace(",", "").replace(" ", "").strip()
    if cleaned in ("—", "-", "–", ""):
        return True
    cleaned = cleaned.strip("()")
    try:
        float(cleaned)
        return True
    except ValueError:
        return False
