"""Document metadata assembly + YAML front-matter rendering (E4/E5).

Semantics of reference metadata.py.  Determinism fix: ``parsed_at`` is a
run-scoped parameter supplied by the job (the reference stamps per-call
datetime.now() — metadata.py:213 — which breaks retry determinism at scale).
"""

from __future__ import annotations

import re
from datetime import datetime

_MONTH_NUM = {
    "january": 1, "february": 2, "march": 3, "april": 4,
    "may": 5, "june": 6, "july": 7, "august": 8,
    "september": 9, "october": 10, "november": 11, "december": 12,
}

# calendar-quarter mapping (ref metadata.py:10-23): only fiscal-quarter-end
# months map to a quarter; others are ambiguous
_QUARTER_BY_MONTH = {"march": "Q1", "june": "Q2", "september": "Q3"}


def detect_fiscal_year_end(cover_text: str) -> int | None:
    """Month number of the fiscal year end, from '...year ended MONTH DD'
    (ref metadata.py:26-47)."""
    m = re.search(r"(?:fiscal\s+)?year\s+ended\s+(\w+)\s+\d{1,2}", cover_text, re.IGNORECASE)
    if m:
        return _MONTH_NUM.get(m.group(1).lower())
    return None


def compute_fiscal_year(
    period_year: int | None, period_month: int | None, fy_end_month: int | None
) -> int | None:
    """Fiscal year named by the calendar year in which it ends (ref :50-63)."""
    if not period_year or not period_month:
        return period_year
    if not fy_end_month or fy_end_month == 12:
        return period_year
    if period_month > fy_end_month:
        return period_year + 1
    return period_year


def infer_period_type(filing_type: str, period_str: str, fy_end_month: int | None = None) -> str:
    """Q1-Q4 / FY from filing type + period month, fiscal-offset aware
    (ref metadata.py:66-103)."""
    if filing_type.upper().startswith("10-K"):
        return "FY"
    m = re.search(r"([A-Za-z]+)", period_str)
    if not m:
        return "Q?"
    month_name = m.group(1).lower()
    month_num = _MONTH_NUM.get(month_name)
    if not month_num:
        return "Q?"
    if fy_end_month:
        fy_start = (fy_end_month % 12) + 1
        months_in = (month_num - fy_start) % 12 + 1
        return f"Q{(months_in - 1) // 3 + 1}"
    return _QUARTER_BY_MONTH.get(month_name, "Q?")


def infer_scale(scale_hint: str | None) -> str:
    """'(in thousands, ...)' -> 'thousands'; millions beat thousands when both
    appear (dollar amounts take precedence — ref metadata.py:106-128)."""
    if not scale_hint:
        return "units"
    low = scale_hint.lower()
    has_m = "million" in low
    has_t = "thousand" in low
    if has_m and has_t:
        return "millions"
    if "billion" in low:
        return "billions"
    if has_m:
        return "millions"
    if has_t:
        return "thousands"
    return "units"


def parse_period_date(period_str: str) -> tuple[str, int | None]:
    """'June 30, 2024' -> ('2024-06-30', 2024); ('', year?) on failure
    (ref metadata.py:131-150)."""
    if not period_str:
        return "", None
    cleaned = period_str.strip().replace(",", ", ").replace("  ", " ")
    for fmt in ("%B %d, %Y", "%B %d %Y"):
        try:
            dt = datetime.strptime(cleaned, fmt)
            return dt.strftime("%Y-%m-%d"), dt.year
        except ValueError:
            continue
    m = re.search(r"(\d{4})", period_str)
    return "", int(m.group(1)) if m else None


def build_metadata(
    cover_fields: list[tuple[str, str]],
    scale_hint: str | None,
    source_name: str,
    cover_text: str = "",
    parsed_at: str = "",
) -> dict:
    """Metadata dict (ref metadata.py:153-226) with run-scoped parsed_at."""
    lookup = dict(cover_fields)
    filing_type = lookup.get("Filing Type", "")
    period_str = lookup.get("Period", "")
    period_end, fiscal_year = parse_period_date(period_str)

    fy_end_month = detect_fiscal_year_end(cover_text) if cover_text else None
    period_type = (
        infer_period_type(filing_type, period_str, fy_end_month) if filing_type else ""
    )
    period_month = None
    m = re.search(r"([A-Za-z]+)", period_str)
    if m:
        period_month = _MONTH_NUM.get(m.group(1).lower())
    fiscal_year = compute_fiscal_year(fiscal_year, period_month, fy_end_month)

    meta = {
        "company": lookup.get("Company", ""),
        "ticker": lookup.get("Ticker", ""),
        "cik": lookup.get("CIK", ""),
        "commission_file_number": lookup.get("Commission File Number", ""),
        "filing_type": filing_type,
        "period_end": period_end,
        "period_type": period_type,
        "fiscal_year": fiscal_year if fiscal_year else "",
        "scale": infer_scale(scale_hint),
        "currency": "USD",
        "audited": bool(filing_type) and filing_type.upper().startswith("10-K"),
        "source_pdf": source_name,
        "parsed_at": parsed_at,
    }
    for label, key in (
        ("State of Incorporation", "state_of_incorporation"),
        ("Address", "address"),
        ("Phone", "phone"),
    ):
        val = lookup.get(label, "")
        if val:
            meta[key] = val
    return meta


import re as _re

# one C-level scan instead of 17 substring passes (hot path: every scalar
# of every document's front matter) — same special set, same quoting
_YAML_SPECIALS_RE = _re.compile(r'[:#{}\[\],&*?|>\'"%@`]')


def _yaml_scalar(value: object) -> str:
    if isinstance(value, bool):
        return "true" if value else "false"
    if isinstance(value, (int, float)):
        return str(value)
    s = str(value)
    if _YAML_SPECIALS_RE.search(s):
        return '"' + s.replace("\\", "\\\\").replace('"', '\\"') + '"'
    return s


def metadata_to_yaml(meta: dict) -> str:
    """Manual YAML front-matter block with special-char quoting and one level
    of nesting (ref metadata.py:247-262)."""
    lines = ["---"]
    for key, value in meta.items():
        if isinstance(value, dict):
            lines.append(f"{key}:")
            for sk, sv in value.items():
                lines.append(f"  {sk}: {_yaml_scalar(sv)}")
        else:
            lines.append(f"{key}: {_yaml_scalar(value)}")
    lines.append("---")
    return "\n".join(lines) + "\n"
