"""Normalization + cross-filing consistency semantics
(mirrors reference tests/test_normalize.py and tests/test_consistency.py)."""

from pdf_parser_spark.core.taxonomy import (
    alias_index,
    backfill_mappings,
    canonical_names,
    first_wins_mappings,
    match_line_item,
    normalize_rows,
    unmapped_labels,
)


def test_index_size_and_content():
    idx = alias_index()
    # 61 canonicals + 208 aliases, minus duplicate keys across sections
    assert len(idx) == 224
    assert idx["net revenues"] == "Revenue"
    assert idx["total assets"] == "Total Assets"
    assert len(canonical_names()) > 50


def test_exact_match():
    r = match_line_item("Net revenues")
    assert (r.canonical, r.confidence, r.method) == ("Revenue", 1.0, "exact")


def test_exact_match_is_case_insensitive():
    r = match_line_item("NET REVENUES")
    assert r.canonical == "Revenue" and r.method == "exact"


def test_fuzzy_match():
    r = match_line_item("Revenues, net")
    assert r.method == "fuzzy"
    assert r.canonical == "Revenue"
    assert r.confidence >= 0.85


def test_no_match_returns_none():
    r = match_line_item("Goodwill impairment charge adjustment")
    assert r.canonical is None
    assert r.method == "none"


def test_empty_label():
    r = match_line_item("   ")
    assert r == (None, 0.0, "none")


def test_normalize_rows_inserts_canonical_at_1():
    rows = [["Net revenues", "$ 100", "$ 90"], ["Cost of sales", "40", "35"]]
    out = normalize_rows(rows)
    assert out[0][:2] == ["Net revenues", "Revenue"]
    assert out[1][:2] == ["Cost of sales", "Cost of Revenue"]
    assert out[0][2:] == ["$ 100", "$ 90"]


def test_normalize_skips_headers_and_numeric_rows():
    rows = [
        ["Current assets:", "", ""],
        ["2024", "2023", ""],
        ["Marketable securities", "5", "6"],
    ]
    out = normalize_rows(rows)
    assert out[0][1] == ""  # colon header
    assert out[1][1] == ""  # numeric first cell
    # context was set to "current" by the header row
    assert out[2][1] == "Short-Term Investments"


def test_normalize_context_flips_to_non_current():
    rows = [
        ["Non-current assets:", "", ""],
        ["Marketable securities", "5", "6"],
    ]
    out = normalize_rows(rows)
    assert out[1][1] == "Long-Term Investments"


def test_unmapped_collection():
    rows = normalize_rows([["Frobnication reserve", "1", "2"], ["Net revenues", "3", "4"]])
    assert unmapped_labels(rows) == ["Frobnication reserve"]


def test_first_wins_and_backfill():
    filings = [
        {"Net revenues": "Revenue", "Cost of sales": "Cost of Revenue"},
        {"Net revenues": "", "Cost of sales": "Cost of Revenue"},
    ]
    merged = first_wins_mappings(filings)
    assert merged["Net revenues"] == "Revenue"
    filled = backfill_mappings(filings)
    assert filled[1]["Net revenues"] == "Revenue"


def test_backfill_no_conflict_between_labels():
    filings = [{"Net revenues": "Revenue"}, {"Total revenues": "Revenue"}]
    out = backfill_mappings(filings)
    assert out[0] == {"Net revenues": "Revenue"}
    assert out[1] == {"Total revenues": "Revenue"}


def test_backfill_empty_input():
    assert backfill_mappings([]) == []
