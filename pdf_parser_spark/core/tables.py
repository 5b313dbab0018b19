"""Table-collapse operators (T1-T16 in SURVEY.md §2.4).

Semantics of reference programmatic.py:280-1460 — pure
list[rows][cells] -> markdown transforms, fused into ONE vectorized Arrow UDF
stage in Spark ("table_collapse").  Order-sensitive folds (multi-page merge,
context normalization) are safe because all of a document's tables live in one
row in page order.
"""

from __future__ import annotations

import re
from collections import Counter

from pdf_parser_spark.core.numeric import is_numeric_cell
from pdf_parser_spark.core.model import Table

_CURRENCIES = ("$", "€", "£")
_OPEN_PAREN_NUM = re.compile(r"^\([\d,]+\.?\d*$")


# --- T1: sparse-row collapse (ref programmatic.py:280-375) -------------------

def collapse_row(row: list[str]) -> list[str]:
    """['Cash','','$','854','','$','1,212'] -> ['Cash','$ 854','$ 1,212'];
    splits parens rejoined, % merged onto previous, empties dropped; leading
    text fragments joined into one label cell with mid-word-split detection."""
    merged: list[str] = []
    i = 0
    n = len(row)
    while i < n:
        cell = (row[i] or "").strip()
        if cell in _CURRENCIES:
            j = i + 1
            while j < n and not (row[j] or "").strip():
                j += 1
            if j < n:
                nxt = (row[j] or "").strip()
                if nxt.startswith("(") and not nxt.endswith(")"):
                    k = j + 1
                    while k < n and not (row[k] or "").strip():
                        k += 1
                    if k < n and (row[k] or "").strip() == ")":
                        merged.append(f"{cell} {nxt})")
                        i = k + 1
                        continue
                merged.append(f"{cell} {nxt}")
                i = j + 1
            else:
                merged.append(cell)
                i += 1
        elif cell.startswith("(") and not cell.endswith(")") and _OPEN_PAREN_NUM.match(cell):
            j = i + 1
            while j < n and not (row[j] or "").strip():
                j += 1
            if j < n and (row[j] or "").strip() == ")":
                merged.append(f"{cell})")
                i = j + 1
            else:
                merged.append(cell)
                i += 1
        elif cell == "%":
            if merged:
                merged[-1] = merged[-1] + "%"
            i += 1
        elif cell == ")":
            i += 1
        elif cell:
            merged.append(cell)
            i += 1
        else:
            i += 1

    # join leading text fragments into one label (mid-word split -> no space)
    if len(merged) >= 3:
        first_numeric = None
        for idx, cell in enumerate(merged):
            if is_numeric_cell(cell) or cell[:1] in _CURRENCIES:
                first_numeric = idx
                break
        if first_numeric is not None and first_numeric >= 2:
            parts = merged[:first_numeric]
            label = parts[0]
            for p in parts[1:]:
                if label and p and label[-1].isalpha() and p[0].islower():
                    label += p
                else:
                    label += " " + p
            merged = [label] + merged[first_numeric:]
    return merged


# --- T2: position-aware wide-table collapse (ref programmatic.py:378-518) ----

def collapse_table_positional(table: Table) -> Table:
    """Wide sparse tables (>=10 raw cols, e.g. stockholders' equity) get a
    column map from the 3 fullest rows' anchor positions; each merged value
    lands in its nearest logical column (prevents left-shift of sparse rows).
    Narrow tables use plain collapse_row."""
    if not table:
        return []
    max_raw = max(len(r) for r in table)
    if max_raw < 10:
        return [collapse_row(r) for r in table]

    fills = sorted(
        ((sum(1 for c in r if (c or "").strip()), ri) for ri, r in enumerate(table)),
        reverse=True,
    )
    anchors: set[int] = set()
    for _cnt, ri in fills[:3]:
        row = table[ri]
        i = 0
        while i < len(row):
            cell = (row[i] or "").strip()
            if cell in _CURRENCIES:
                anchors.add(i)
                j = i + 1
                while j < len(row) and not (row[j] or "").strip():
                    j += 1
                i = j + 1 if j < len(row) else i + 1
            elif cell:
                anchors.add(i)
                i += 1
            else:
                i += 1
    if not anchors:
        return [collapse_row(r) for r in table]
    col_map = sorted(anchors)
    num_cols = len(col_map)
    if num_cols < 3:
        return [collapse_row(r) for r in table]

    out: Table = []
    for row in table:
        placed: list[tuple[int, str]] = []
        i = 0
        n = len(row)
        while i < n:
            cell = (row[i] or "").strip()
            if cell in _CURRENCIES:
                anchor = i
                j = i + 1
                while j < n and not (row[j] or "").strip():
                    j += 1
                if j < n:
                    nxt = (row[j] or "").strip()
                    if nxt.startswith("(") and not nxt.endswith(")"):
                        k = j + 1
                        while k < n and not (row[k] or "").strip():
                            k += 1
                        if k < n and (row[k] or "").strip() == ")":
                            placed.append((anchor, f"{cell} {nxt})"))
                            i = k + 1
                            continue
                    placed.append((anchor, f"{cell} {nxt}"))
                    i = j + 1
                else:
                    placed.append((anchor, cell))
                    i += 1
            elif cell.startswith("(") and not cell.endswith(")") and _OPEN_PAREN_NUM.match(cell):
                anchor = i
                j = i + 1
                while j < n and not (row[j] or "").strip():
                    j += 1
                if j < n and (row[j] or "").strip() == ")":
                    placed.append((anchor, f"{cell})"))
                    i = j + 1
                else:
                    placed.append((anchor, cell))
                    i += 1
            elif cell == "%" and placed:
                ppos, pval = placed[-1]
                placed[-1] = (ppos, pval + "%")
                i += 1
            elif cell == ")":
                i += 1
            elif cell:
                placed.append((i, cell))
                i += 1
            else:
                i += 1
        if not placed:
            continue
        row_out = [""] * num_cols
        used: set[int] = set()
        for raw_pos, val in placed:
            best = min(range(num_cols), key=lambda c: abs(col_map[c] - raw_pos))
            if best in used:
                for off in range(1, num_cols):
                    if best + off < num_cols and best + off not in used:
                        best = best + off
                        break
                    if best - off >= 0 and best - off not in used:
                        best = best - off
                        break
            row_out[best] = val
            used.add(best)
        out.append(row_out)
    return out


# --- T3: single-column row splitter (ref programmatic.py:522-591) ------------

_VALUE_TOKEN = re.compile(
    r"(?:\$\s*)?(?:\([\d,]+\.?\d*\)|[\d,]+\.?\d*|[—–])%?"
)
_DATE_FRAGMENT = re.compile(
    r"(?:January|February|March|April|May|June|July|August|September|October|November|December|"
    r"Jan|Feb|Mar|Apr|Jun|Jul|Aug|Sep|Oct|Nov|Dec)\s+\d{1,2},?\s+\d{4}",
    re.IGNORECASE,
)


def split_single_col_row(text: str) -> list[str]:
    """'Revenue $ 130,497 $ 60,922' -> ['Revenue','$ 130,497','$ 60,922'].
    Date fragments are masked; only contiguous TRAILING value tokens split off."""
    text = text.strip()
    if not text:
        return [text]
    date_spans = [(m.start(), m.end()) for m in _DATE_FRAGMENT.finditer(text)]
    hits = [
        m for m in _VALUE_TOKEN.finditer(text)
        if not any(ds <= m.start() < de for ds, de in date_spans)
    ]
    if not hits:
        return [text]
    spans: list[tuple[int, int, str]] = []
    for m in reversed(hits):
        upto = len(text) if not spans else spans[-1][0]
        if not text[m.end():upto].strip():
            spans.append((m.start(), m.end(), m.group().strip()))
        else:
            break
    if not spans:
        return [text]
    spans.reverse()
    label = text[: spans[0][0]].strip()
    vals = [s[2] for s in spans]
    if not label and vals:
        return vals
    if label:
        return [label] + vals
    return [text]


# --- T4: column-header extraction from section text (ref :594-661) -----------

_MONTHS_FULL = (
    r"(?:January|February|March|April|May|June|July|August|"
    r"September|October|November|December)"
)
_PERIOD_MULTI = re.compile(
    r"((?:Three|Six|Nine|Twelve)\s+Months?\s+Ended\s+\w+\s+\d{1,2},?)", re.IGNORECASE
)
_PERIOD_YEAR = re.compile(
    r"^((?:Year|Period)\s+Ended\s+\w+\s+\d{1,2},?)\s*$", re.IGNORECASE
)
_DATE_HEADER = re.compile(_MONTHS_FULL + r"\s+\d{1,2},?")
_YEAR_LINE = re.compile(r"^(\d{4}(?:\s+\d{4})+)\s*$")
_TRAILING_YEARS = re.compile(r"(\d{4}(?:\s+\d{4})+)\s*$")


def extract_column_headers(text: str) -> tuple[list[str], list[str]]:
    """-> (period_headers, year_columns), e.g.
    (['Three Months Ended June 30,'], ['2025','2024'])."""
    periods: list[str] = []
    years: list[str] = []
    for line in text.splitlines():
        s = line.strip()
        found = _PERIOD_MULTI.findall(s)
        if found:
            periods.extend(found)
            continue
        if len(s) < 60:
            m = _PERIOD_YEAR.match(s)
            if m:
                periods.append(m.group(1))
                continue
        dates = _DATE_HEADER.findall(s)
        if dates and not periods and len(s) < 60:
            periods.extend(dates)
            continue
        if _YEAR_LINE.match(s) and not years:
            years = s.split()
        elif not years:
            t = _TRAILING_YEARS.search(s)
            if t:
                cand = t.group(1).split()
                if len(cand) >= 2 and all(1990 <= int(y) <= 2050 for y in cand):
                    years = cand
    return periods, years


# --- T5: header-row builder (ref :664-710) -----------------------------------

def build_header_rows(
    periods: list[str], years: list[str], col_count: int
) -> list[list[str]]:
    rows: list[list[str]] = []
    data_cols = col_count - 1
    if periods and years and len(years) >= data_cols:
        yrs = years[:data_cols]
        if len(periods) == 1:
            rows.append([""] + [f"{periods[0]} {y}" for y in yrs])
        elif len(periods) == data_cols:
            rows.append([""] + [f"{p} {y}" for p, y in zip(periods, yrs)])
        elif len(periods) * 2 == data_cols:
            rows.append([""] + [f"{periods[i // 2]} {y}" for i, y in enumerate(yrs)])
        else:
            row1 = [""] + periods[:data_cols]
            while len(row1) < col_count:
                row1.append("")
            rows.append(row1)
            rows.append([""] + yrs)
    elif years and len(years) >= data_cols:
        rows.append([""] + years[:data_cols])
    elif periods:
        row = [""] + periods[:data_cols]
        while len(row) < col_count:
            row.append("")
        rows.append(row)
    return rows


# --- F6: prose-table rejector (ref :713-775) ----------------------------------

def is_prose_table(table: Table) -> bool:
    """Reject pdfplumber 'tables' that are wrapped paragraph text."""
    if not table or len(table) < 2:
        return False
    # hard cut: >50 rows, <30% numeric cells
    if len(table) > 50:
        cells = [(c or "").strip() for row in table for c in row if (c or "").strip()]
        if cells:
            numeric = sum(1 for c in cells if is_numeric_cell(c) and len(c) < 30)
            if numeric / len(cells) < 0.30:
                return True
    max_cols = max(len(r) for r in table)
    if max_cols < 6:
        return False
    cells = [(c or "").strip() for row in table for c in row if (c or "").strip()]
    if len(cells) < 5:
        return False
    numeric = sum(1 for c in cells if is_numeric_cell(c) and len(c) < 30)
    if numeric / len(cells) > 0.15:
        return False
    avg_len = sum(len(c) for c in cells) / len(cells)
    if avg_len > 40:
        return False
    prose_rows = 0
    for row in table[:10]:
        joined = " ".join((c or "").strip() for c in row).strip()
        if len(joined) > 60 and len(joined.split()) > 8:
            prose_rows += 1
    sample = min(len(table), 10)
    return sample > 0 and prose_rows / sample >= 0.4


# --- T15: markdown renderer (ref :791-829) -------------------------------------

_WS = re.compile(r"\s+")


def render_markdown_table(
    header_rows: list[list[str]],
    data_rows: list[list[str]],
    col_count: int,
    left_cols: int = 1,
) -> str:
    if col_count < 2:
        col_count = 2
    sep = [":---"] * left_cols + ["---:"] * (col_count - left_cols)
    lines: list[str] = []

    def fmt(row: list[str]) -> str:
        padded = list(row)
        while len(padded) < col_count:
            padded.append("")
        padded = padded[:col_count]
        padded = [_WS.sub(" ", c.replace("\n", " ")).strip() for c in padded]
        return "| " + " | ".join(padded) + " |"

    for h in header_rows:
        lines.append(fmt(h))
    if not header_rows:
        lines.append("| " + " | ".join([""] * col_count) + " |")
    lines.append("| " + " | ".join(sep) + " |")
    for r in data_rows:
        lines.append(fmt(r))
    return "\n".join(lines)


# --- T6: note-ref column stripper (ref :832-923) --------------------------------

_NOTE_REF = re.compile(r"^\d{1,2}(?:\s*,\s*\d{1,2})*$")


def strip_note_ref_columns(tables: list[Table]) -> list[Table]:
    out: list[Table] = []
    for table in tables:
        if not table:
            out.append(table)
            continue
        data_rows = [r for r in table if len(r) >= 2]
        if not data_rows:
            out.append(table)
            continue
        lengths = Counter(len(r) for r in data_rows)
        common = lengths.most_common(2)
        if len(common) < 2:
            col_count = common[0][0]
            if col_count < 3:
                out.append(table)
                continue
            note_cells = [r[1].strip() for r in data_rows if len(r) > 1 and r[1].strip()]
            if note_cells:
                n_note = sum(1 for c in note_cells if _NOTE_REF.match(c))
                has_fin = any(
                    ("$" in c or ("," in c and len(c) > 3)) and not _NOTE_REF.match(c)
                    for c in note_cells
                )
                all_small = all(
                    all(int(x.strip()) <= 30 for x in c.split(","))
                    for c in note_cells
                    if _NOTE_REF.match(c)
                )
                if n_note >= 3 and not has_fin and all_small:
                    out.append([[c for i, c in enumerate(r) if i != 1] for r in table])
                    continue
            out.append(table)
            continue

        short_len, long_len = sorted([common[0][0], common[1][0]])
        if long_len - short_len != 1:
            out.append(table)
            continue
        n_note = 0
        n_long = 0
        for r in data_rows:
            if len(r) == long_len and len(r) >= 2:
                cell = r[1].strip()
                if cell:
                    n_long += 1
                    if _NOTE_REF.match(cell):
                        try:
                            if all(int(x.strip()) <= 30 for x in cell.split(",")):
                                n_note += 1
                        except ValueError:
                            pass
        if n_long >= 2 and n_note / n_long >= 0.5:
            out.append([
                ([r[0]] + r[2:]) if len(r) == long_len else r for r in table
            ])
        else:
            out.append(table)
    return out


# --- T7: orphaned-row recovery (ref :926-1013) ----------------------------------

_DOLLAR_VALUE = re.compile(r"\$\s*[\d,]+")
_SCALE_LINE = re.compile(r"(?i)^\(?\s*in\s+(?:thousands|millions|billions)")
_DATEISH_START = re.compile(
    r"^(?:Years?\s+ended|September|October|November|December|January|February|March|"
    r"April|May|June|July|August)\s",
    re.IGNORECASE,
)
_YEARS_ONLY = re.compile(r"^\d{4}(?:\s+\d{4})*\s*$")


def recover_orphaned_rows(section_text: str, first_table: Table) -> Table:
    """Financial rows present in section text BEFORE the first table row get
    re-parsed (via split_single_col_row) and returned for prepending."""
    if not first_table or not section_text:
        return []
    first_label = ""
    for row in first_table:
        cell = (row[0] if row else "").strip()
        if cell:
            first_label = cell
            break
    if not first_label:
        return []
    label_words = re.split(r"\s+\d", first_label)[0].strip().rstrip(":")

    lines = section_text.splitlines()
    table_start = -1
    for idx, line in enumerate(lines):
        if label_words and label_words.lower() in line.lower():
            table_start = idx
            break
    if table_start <= 0:
        return []

    orphans: Table = []
    i = 0
    while i < table_start:
        line = lines[i].strip()
        if not line or _SCALE_LINE.match(line):
            i += 1
            continue
        if line.isupper() and len(line) < 80:
            i += 1
            continue
        if _DATEISH_START.match(line) or _YEARS_ONLY.match(line):
            i += 1
            continue
        if _DOLLAR_VALUE.search(line):
            parsed = split_single_col_row(line)
            if len(parsed) >= 2:
                orphans.append(parsed)
            i += 1
            continue
        if i + 1 < table_start:
            nxt = lines[i + 1].strip()
            if _DOLLAR_VALUE.search(nxt):
                parsed = split_single_col_row(line + " " + nxt)
                if len(parsed) >= 2:
                    orphans.append(parsed)
                i += 2
                continue
        i += 1
    return orphans


# --- T8: text-as-table parser (ref :1021-1120) ----------------------------------

_TEXT_NUM = re.compile(r"\([\d,]+(?:\.\d+)?\)|[\d,]+(?:\.\d+)?|—|–")
_PAGE_NUM_LINE = re.compile(r"^\s*\d{1,3}\s*$")


def parse_text_as_table(
    section_text: str,
    periods: list[str] | None = None,
    years: list[str] | None = None,
) -> str | None:
    """Parse raw section text into a markdown table when grid tables lack
    labels: modal big-numeric-token count per line -> value column count;
    rightmost N tokens are values, prefix is the label."""
    lines = [l for l in section_text.splitlines() if not _PAGE_NUM_LINE.match(l)]
    counts: list[int] = []
    for line in lines:
        toks = _TEXT_NUM.findall(line)
        big = [t for t in toks if len(t) > 2 or not t.isdigit()]
        counts.append(len(big))
    if not counts:
        return None
    freq = Counter(c for c in counts if c > 0)
    if not freq:
        return None
    expected = freq.most_common(1)[0][0]
    if expected < 1:
        return None
    if sum(1 for c in counts if c >= expected) < 3:
        return None

    data_rows: Table = []
    seen_data = False
    for line in lines:
        s = line.strip()
        if not s:
            continue
        matches = [m for m in _TEXT_NUM.finditer(s) if len(m.group()) > 2 or not m.group().isdigit()]
        if len(matches) >= expected:
            seen_data = True
            vals_m = matches[-expected:]
            label = s[: vals_m[0].start()].rstrip()
            label = re.sub(r"\s+\d{1,2}\s*$", "", label)
            if not label:
                label = "Total"
            data_rows.append([label] + [m.group() for m in vals_m])
        elif seen_data and s and len(s) < 80:
            data_rows.append([s] + [""] * expected)
    if len(data_rows) < 3:
        return None

    col_count = expected + 1
    header_rows: list[list[str]] = []
    if years and len(years) == expected:
        header_rows = [[""] + years]
    elif periods:
        header_rows = [[""] + periods[:expected]]
    else:
        for line in section_text.splitlines()[:5]:
            ym = re.findall(r"\b(20\d{2})\b", line)
            if len(ym) == expected:
                header_rows = [[""] + ym]
                break
        if not header_rows:
            header_rows = [[""] + [f"Col {i + 1}" for i in range(expected)]]
    return render_markdown_table(header_rows, data_rows, col_count)


# --- F9 helpers: raw-text cleanup on table fallback (ref :1123-1151) -------------

_FOOTER_PIPE = re.compile(
    r"^\s*.{3,50}\s*\|\s*\d{4}\s+Form\s+10-[KQ](?:/A)?\s*\|\s*\d{1,3}\s*$",
    re.IGNORECASE,
)
_FPAGE = re.compile(r"^\s*F-\d{1,3}\s*$")
_SEE_NOTES = re.compile(
    r"^\s*(?:See|The)\s+(?:accompanying\s+)?(?:Notes?\s+to|The\s+Notes)", re.IGNORECASE
)
_FORM_FOOTER = re.compile(
    r"^\s*\d{1,3}\s+.{3,40}\s+(?:Form\s+10-[KQ]|Annual\s+Report)", re.IGNORECASE
)


def clean_raw_text(text: str) -> str:
    keep = []
    for l in text.splitlines():
        if _PAGE_NUM_LINE.match(l) or _FOOTER_PIPE.match(l) or _FPAGE.match(l):
            continue
        if _SEE_NOTES.match(l) or _FORM_FOOTER.match(l):
            continue
        keep.append(l)
    return "\n".join(keep)


# --- T9: grand-total truncation (ref :1154-1195) --------------------------------

_GRAND_TOTAL = re.compile(r"^Total\s+liabilities\s+and\s+stockholders", re.IGNORECASE)
_NUMERICISH = re.compile(r"^[\$€£]?\s*[\d,()\.\-—–%]+\$?$")


def truncate_after_grand_total(tables: list[Table]) -> list[Table]:
    out: list[Table] = []
    for table in tables:
        cut = None
        for ri, row in enumerate(table):
            parts: list[str] = []
            for c in row[:5]:
                cs = (c or "").strip()
                if cs and not _NUMERICISH.match(cs):
                    parts.append(cs)
                elif cs:
                    break
            label = parts[0] if parts else ""
            for tp in parts[1:]:
                if label and tp and label[-1].isalpha() and tp[0].islower():
                    label += tp
                else:
                    label += " " + tp
            if _GRAND_TOTAL.match(label) and any(is_numeric_cell(c) for c in row[1:]):
                cut = ri
                break
        if cut is not None and cut < len(table) - 1:
            table = table[: cut + 1]
        out.append(table)
    return out


# --- T16: orchestrator (ref tables_to_markdown :1198-1460) -----------------------

_SCALE_ROW = re.compile(r"^\(?\s*in\s+(?:thousands|millions|billions)", re.IGNORECASE)
_DATE_ONLY_ROW = re.compile(
    r"^(?:"
    + _MONTHS_FULL + r"\s+\d{1,2},?\s*(?:\d{4})?"
    r"|\d{4}(?:\s+\d{4})*"
    r"|(?:Three|Six|Nine|Twelve)\s+Months?\s+Ended\b.*"
    r"|(?:Year|Period)\s+Ended\b.*"
    r"|Fiscal\s+Year\s+\d{4}"
    r")\s*$",
    re.IGNORECASE,
)
_YEAR_CELL = re.compile(r"^\d{4}$")
_QTR_OR_YEAR = re.compile(r"^(?:Q\d|FY)?\s*\d{4}$")


def tables_to_markdown(
    section_text: str,
    tables: list[Table],
    normalize: bool = False,
    normalized_rows_out: list | None = None,
) -> str:
    """Full collapse pipeline: F6 filter -> T1/T2 collapse -> T3 split ->
    T7 orphan recovery -> T6 note-ref strip -> T9 truncate -> T10 mid-header
    strip -> T11 label-coverage fallback -> T12 fragment merge -> T4/T5
    headers -> T13 pad / T14 own-header -> (N3 normalize) -> T15 render.

    When normalize=True the taxonomy Canonical column is inserted (index 1)
    and normalized rows are appended to normalized_rows_out."""
    if not tables:
        return clean_raw_text(section_text)

    # F6 + paragraph filter
    kept: list[Table] = []
    for table in tables:
        if not table:
            continue
        if is_prose_table(table):
            continue
        cells = [(c or "").strip() for row in table for c in row if (c or "").strip()]
        if cells:
            avg_len = sum(len(c) for c in cells) / len(cells)
            has_num = any(is_numeric_cell(c) for c in cells if len(c) < 30)
            max_cols = max(len(r) for r in table)
            if avg_len > 60 and not has_num and max_cols <= 3:
                continue
        kept.append(table)
    if not kept:
        return clean_raw_text(section_text)

    # T1/T2 collapse
    collapsed: list[Table] = []
    for table in kept:
        ct = [r for r in collapse_table_positional(table) if any(c.strip() for c in r)]
        if ct:
            collapsed.append(ct)
    if not collapsed:
        return section_text

    # T3: single-column tables
    for ti, table in enumerate(collapsed):
        dominant = Counter(len(r) for r in table).most_common(1)[0][0]
        if dominant <= 1:
            collapsed[ti] = [split_single_col_row(r[0] if r else "") for r in table]

    # T7: orphaned leading rows
    orphans = recover_orphaned_rows(section_text, collapsed[0])
    if orphans:
        collapsed[0] = orphans + collapsed[0]

    # T6, T9
    collapsed = strip_note_ref_columns(collapsed)
    collapsed = truncate_after_grand_total(collapsed)

    # T10: scale rows + mid-table date-only rows
    for ti, table in enumerate(collapsed):
        cleaned: Table = []
        for ri, row in enumerate(table):
            non_empty = [c for c in row if c.strip()]
            if non_empty and all(not is_numeric_cell(c) for c in non_empty):
                joined = " ".join(non_empty)
                if _SCALE_ROW.match(joined):
                    continue
                if ri > 0 and all(_DATE_ONLY_ROW.match(c.strip()) for c in non_empty):
                    continue
            cleaned.append(row)
        collapsed[ti] = cleaned

    # T11: label-coverage fallback
    total_rows = 0
    labeled = 0
    for table in collapsed:
        for row in table:
            if not row:
                continue
            total_rows += 1
            for ci in range(min(2, len(row))):
                cell = row[ci].strip()
                if cell and not is_numeric_cell(cell) and len(cell) > 3:
                    if not _QTR_OR_YEAR.match(cell):
                        labeled += 1
                        break
    if total_rows > 0 and labeled / total_rows < 0.2:
        return clean_raw_text(section_text)

    # strip standalone page-number rows
    for table in collapsed:
        table[:] = [
            r for r in table if not (len(r) == 1 and _PAGE_NUM_LINE.match(r[0]))
        ]

    # T12: multi-page fragment merge
    merged: list[Table] = []
    for table in collapsed:
        if not table:
            continue
        dominant = Counter(len(r) for r in table).most_common(1)[0][0]
        if merged:
            prev_dominant = Counter(len(r) for r in merged[-1]).most_common(1)[0][0]
            if dominant == prev_dominant:
                first = table[0]
                filled = [c for c in first if c.strip()]
                is_title = len(filled) == 1 and not is_numeric_cell(filled[0])
                both_small = len(merged[-1]) < 15 and len(table) < 15
                if is_title or both_small:
                    merged.append(table)
                else:
                    start = 1 if table[0] == merged[-1][0] else 0
                    merged[-1].extend(table[start:])
                continue
        merged.append(table)

    # T4
    periods, years = extract_column_headers(section_text)

    parts: list[str] = []
    for table in merged:
        if not table:
            continue
        col_count = Counter(len(r) for r in table).most_common(1)[0][0]

        # T13: pad short labeled data rows with em-dash
        for ri, row in enumerate(table):
            if len(row) < col_count and len(row) >= 2:
                if not is_numeric_cell(row[0]) and any(is_numeric_cell(c) for c in row[1:]):
                    table[ri] = row + ["—"] * (col_count - len(row))

        # T14: own-header detection + two-row header merge
        first_row = table[0]
        non_empty = [c for c in first_row if c.strip()]
        own_header = len(non_empty) > 1 and all(
            not is_numeric_cell(c) for c in non_empty if c.strip()
        )
        if own_header:
            header_rows = [first_row]
            data_rows = table[1:]
            if len(first_row) > col_count:
                col_count = len(first_row)
            if data_rows:
                second = data_rows[0]
                second_ne = [c for c in second if c.strip()]
                second_is_header = (
                    len(second_ne) >= 1
                    and all(
                        not is_numeric_cell(c) or _YEAR_CELL.match(c.strip())
                        for c in second_ne
                    )
                    and any(_YEAR_CELL.match(c.strip()) for c in second_ne)
                )
                if second_is_header:
                    merged_header = []
                    for ci in range(max(len(first_row), len(second))):
                        c1 = first_row[ci].strip() if ci < len(first_row) else ""
                        c2 = second[ci].strip() if ci < len(second) else ""
                        if c1 and c2:
                            merged_header.append(f"{c1} {c2}")
                        elif c2:
                            merged_header.append(c2)
                        else:
                            merged_header.append(c1)
                    header_rows = [merged_header]
                    data_rows = data_rows[1:]
        else:
            header_rows = build_header_rows(periods, years, col_count)
            data_rows = table

        left_cols = 1
        if normalize:
            from pdf_parser_spark.core.taxonomy import normalize_rows

            data_rows = normalize_rows(data_rows)
            if normalized_rows_out is not None:
                normalized_rows_out.extend(data_rows)
            col_count += 1
            left_cols = 2
            header_rows = [[h[0], "Canonical"] + h[1:] for h in header_rows]

        parts.append(
            render_markdown_table(header_rows, data_rows, col_count, left_cols=left_cols)
        )

    return "\n\n".join(parts)
