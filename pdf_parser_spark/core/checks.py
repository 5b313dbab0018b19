"""Numeric validation (V1-V7) and confidence scoring (V8-V10).

Semantics of reference validate.py:61-374 and confidence.py.  All checks are
in-row (one document's statement maps); fleet-level rollups happen relationally
in operators.metrics.
"""

from __future__ import annotations

from typing import NamedTuple

from pdf_parser_spark.core.numeric import parse_numeric


class CheckResult(NamedTuple):
    check: str
    status: str  # PASS | WARN | FAIL | SKIP
    detail: str


def _first(data: dict[str, list[float]], key: str) -> float | None:
    vals = data.get(key)
    return vals[0] if vals else None


def check_equality(name: str, expected: float, actual: float, tolerance: float = 0.01) -> CheckResult:
    """Exact -> PASS; rel-diff <= tol -> WARN; else FAIL (ref validate.py:69-108)."""
    if expected == actual:
        return CheckResult(name, "PASS", f"Expected {expected:,.2f}, got {actual:,.2f}")
    denom = abs(expected) if expected != 0 else abs(actual)
    if denom == 0:
        return CheckResult(name, "PASS", "Both values are zero")
    rel = abs(expected - actual) / denom
    status = "WARN" if rel <= tolerance else "FAIL"
    return CheckResult(
        name, status, f"Expected {expected:,.2f}, got {actual:,.2f} (off by {rel:.2%})"
    )


def check_balance_sheet(data: dict[str, list[float]]) -> list[CheckResult]:
    """Total Assets == Total Liabilities + Equity (ref validate.py:115-149)."""
    name = "BS Balance (Assets vs L+E)"
    assets = _first(data, "Total Assets")
    combined = _first(data, "Total Liabilities & Stockholders' Equity")
    if assets is not None and combined is not None:
        return [check_equality(name, assets, combined)]
    liab = _first(data, "Total Liabilities")
    equity = _first(data, "Total Stockholders' Equity")
    if assets is None or (liab is None and equity is None):
        return [CheckResult(name, "SKIP", "Missing key items for balance sheet check")]
    return [check_equality(name, assets, (liab or 0.0) + (equity or 0.0))]


def check_income_statement(data: dict[str, list[float]]) -> list[CheckResult]:
    """GrossProfit == Revenue - |CostOfRevenue|; NetIncome present (ref :152-188)."""
    out: list[CheckResult] = []
    rev = _first(data, "Revenue")
    cost = _first(data, "Cost of Revenue")
    gp = _first(data, "Gross Profit")
    if rev is not None and cost is not None and gp is not None:
        out.append(check_equality("IS Gross Profit Check", rev - abs(cost), gp))
    else:
        out.append(CheckResult(
            "IS Gross Profit Check", "SKIP",
            "Missing Revenue, Cost of Revenue, or Gross Profit",
        ))
    ni = _first(data, "Net Income")
    if ni is not None:
        out.append(CheckResult("IS Net Income Present", "PASS", f"Net Income = {ni:,.2f}"))
    else:
        out.append(CheckResult("IS Net Income Present", "SKIP", "Net Income not found"))
    return out


def check_cash_flow(data: dict[str, list[float]]) -> list[CheckResult]:
    """Ending == Beginning + NetChange; 3 activity sections present (ref :191-231)."""
    out: list[CheckResult] = []
    beg = _first(data, "Beginning Cash")
    chg = _first(data, "Net Change in Cash")
    end = _first(data, "Ending Cash")
    if beg is not None and chg is not None and end is not None:
        out.append(check_equality("CF Cash Reconciliation", beg + chg, end))
    else:
        out.append(CheckResult(
            "CF Cash Reconciliation", "SKIP",
            "Missing Beginning Cash, Net Change, or Ending Cash",
        ))
    sections = ["Net Cash from Operations", "Net Cash from Investing", "Net Cash from Financing"]
    present = [s for s in sections if _first(data, s) is not None]
    missing = [s for s in sections if _first(data, s) is None]
    if len(present) == 3:
        out.append(CheckResult("CF Activity Sections", "PASS", "All 3 activity sections present"))
    else:
        out.append(CheckResult(
            "CF Activity Sections",
            "WARN" if len(present) >= 2 else "FAIL",
            f"Missing: {', '.join(missing)}",
        ))
    return out


def check_cross_statement(statements: dict[str, dict[str, list[float]]]) -> list[CheckResult]:
    """Net Income IS<->CF any-pair within max(1, 1%); CF Ending Cash <-> BS Cash
    with restricted-cash retry (ref validate.py:234-300)."""
    out: list[CheckResult] = []
    is_d = statements.get("income_statement", {})
    cf_d = statements.get("cash_flow", {})
    bs_d = statements.get("balance_sheet", {})

    is_ni = is_d.get("Net Income", [])
    cf_ni = cf_d.get("Net Income", [])
    if is_ni and cf_ni:
        matched = any(
            abs(iv - cv) <= max(1, abs(iv) * 0.01) for iv in is_ni for cv in cf_ni
        )
        if matched:
            out.append(CheckResult(
                "Cross: Net Income (IS vs CF)", "PASS",
                f"IS values {is_ni} match CF values {cf_ni}",
            ))
        else:
            out.append(check_equality("Cross: Net Income (IS vs CF)", is_ni[0], cf_ni[0]))
    else:
        out.append(CheckResult(
            "Cross: Net Income (IS vs CF)", "SKIP",
            "Net Income not available in both IS and CF",
        ))

    cf_end = _first(cf_d, "Ending Cash")
    bs_cash = _first(bs_d, "Cash & Cash Equivalents")
    if cf_end is not None and bs_cash is not None:
        result = check_equality("Cross: Cash (CF Ending vs BS)", cf_end, bs_cash)
        if result.status == "FAIL":
            restricted = _first(bs_d, "Restricted Cash")
            if restricted is not None:
                retry = check_equality("Cross: Cash (CF Ending vs BS)", cf_end, bs_cash + restricted)
                if retry.status in ("PASS", "WARN"):
                    result = CheckResult(
                        retry.check, retry.status,
                        retry.detail + " (includes restricted cash)",
                    )
        out.append(result)
    else:
        out.append(CheckResult(
            "Cross: Cash (CF Ending vs BS)", "SKIP",
            "Ending Cash or BS Cash not available",
        ))
    return out


def run_all_checks(statements: dict[str, dict[str, list[float]]]) -> list[CheckResult]:
    """V7 orchestration (ref validate.py:307-326)."""
    out: list[CheckResult] = []
    if "balance_sheet" in statements:
        out.extend(check_balance_sheet(statements["balance_sheet"]))
    if "income_statement" in statements:
        out.extend(check_income_statement(statements["income_statement"]))
    if "cash_flow" in statements:
        out.extend(check_cash_flow(statements["cash_flow"]))
    if len(statements) >= 2:
        out.extend(check_cross_statement(statements))
    return out


def render_checks_markdown(results: list[CheckResult]) -> str:
    if not results:
        return ""
    lines = ["| Check | Status | Detail |", "|:------|:-------|:-------|"]
    lines += [f"| {r.check} | {r.status} | {r.detail} |" for r in results]
    return "\n".join(lines)


def statement_values(rows: list[list[str]]) -> dict[str, list[float]]:
    """Normalized rows [label, canonical, v1, v2, ...] -> {canonical: [floats]}
    (ref validate.py:352-374)."""
    data: dict[str, list[float]] = {}
    for row in rows:
        if len(row) < 3:
            continue
        canonical = row[1].strip() if row[1] else ""
        if not canonical:
            continue
        vals = [v for v in (parse_numeric(c) for c in row[2:]) if v is not None]
        if vals:
            data[canonical] = vals
    return data


# --- confidence scoring (ref confidence.py) ----------------------------------

class StatementConfidence(NamedTuple):
    statement_type: str
    source: str  # "pdf" | "none"  (XBRL excluded — external API, SURVEY §2.1 S4)
    confidence: float
    pdf_available: bool


def compute_confidence(
    pdf_data: dict[str, list[float]] | None,
    statement_type: str,
    validation_status: str | None,
) -> StatementConfidence:
    """PDF-only ladder from ref confidence.py:148-173 (0.7 PASS / 0.5 WARN /
    0.3 FAIL / 0.6 unchecked).  The XBRL branches are out of scope — the
    engine's byte-identity target is the reference's --no-xbrl path."""
    available = pdf_data is not None and len(pdf_data) > 0
    if not available:
        return StatementConfidence(statement_type, "none", 0.0, False)
    if validation_status == "PASS":
        conf = 0.7
    elif validation_status == "WARN":
        conf = 0.5
    elif validation_status == "FAIL":
        conf = 0.3
    else:
        conf = 0.6
    return StatementConfidence(statement_type, "pdf", conf, True)


def statement_validation_status(
    results: list[CheckResult], statement_type: str
) -> str | None:
    """Worst status among checks whose name prefixes match the statement type
    (ref pipeline.py:474-482)."""
    relevant = [
        r for r in results if statement_type.upper()[:2] in r.check.upper()[:5]
    ]
    if not relevant:
        return None
    if any(r.status == "FAIL" for r in relevant):
        return "FAIL"
    if any(r.status == "WARN" for r in relevant):
        return "WARN"
    return "PASS"


def render_confidence_markdown(confidences: list[StatementConfidence]) -> str:
    """Summary table (ref confidence.py:176-217; discrepancy detail omitted —
    no XBRL source in scope, so the detail table is always empty)."""
    if not confidences:
        return ""
    lines = [
        "| Statement | Source | Confidence | Discrepancies |",
        "|:----------|:-------|:-----------|:--------------|",
    ]
    for c in confidences:
        lines.append(f"| {c.statement_type} | {c.source} | {c.confidence:.1f} | None |")
    return "\n".join(lines)
