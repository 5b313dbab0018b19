"""Numeric parsing semantics (mirrors reference tests/test_validate.py expectations)."""

from pdf_parser_spark.core.numeric import parse_numeric, is_numeric_cell


def test_plain_thousands():
    assert parse_numeric("1,234") == 1234.0


def test_paren_negative():
    assert parse_numeric("(500)") == -500.0


def test_currency_prefix():
    assert parse_numeric("$1,234") == 1234.0
    assert parse_numeric("€500") == 500.0
    assert parse_numeric("£42") == 42.0


def test_dashes_are_null():
    for dash in ("—", "-", "–"):
        assert parse_numeric(dash) is None


def test_empty_and_none():
    assert parse_numeric("") is None
    assert parse_numeric("   ") is None
    assert parse_numeric(None) is None


def test_currency_paren_negative():
    assert parse_numeric("$ (1,234)") == -1234.0


def test_decimal():
    assert parse_numeric("1,234.56") == 1234.56


def test_garbage_is_none():
    assert parse_numeric("abc") is None
    assert parse_numeric("12ab") is None


def test_inner_spaces():
    assert parse_numeric("( 1,234 )") == -1234.0


def test_is_numeric_cell():
    assert is_numeric_cell("$ 854")
    assert is_numeric_cell("(13,756)")
    assert is_numeric_cell("—")
    assert is_numeric_cell("")
    assert not is_numeric_cell("Total assets")
    assert not is_numeric_cell("Note 3")
