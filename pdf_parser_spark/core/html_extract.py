"""HTML main-content extraction: DOM-tree text-density + link-density scoring.

The north_star requires "HTML boilerplate stripping via DOM-tree text-density
and link-density scoring" over Common-Crawl-style pages (BASELINE.json).  The
reference engine parses PDFs; for ``html:binary`` input this module plays the
role pdfplumber plays there: bytes -> ordered pages of (text, tables).

Algorithm (public technique, cf. Boilerpipe/trafilatura literature in
PAPERS.md): build a light DOM with html.parser (stdlib), remove
script/style/nav/header/footer/aside/form subtrees, then score each block
element by link density (anchor-text chars / total chars) and text length;
blocks that are link-heavy or trivially short are boilerplate.  <table>
elements become ragged string grids — the same shape pdfplumber emits —
feeding the T1-T16 collapse chain unchanged.  Page boundaries: elements with
class/attribute "page" (or <hr>) split pages; otherwise one page per document.

Pure function of the input bytes — no network fetches, no external parser deps.
"""

from __future__ import annotations

import re
from html import unescape
from html.parser import HTMLParser

from pdf_parser_spark.core.model import Page, Table

_DROP_TAGS = frozenset((
    "script", "style", "noscript", "nav", "header", "footer", "aside",
    "form", "iframe", "svg", "button",
))
_BLOCK_TAGS = frozenset((
    "p", "div", "section", "article", "main", "li", "ul", "ol",
    "h1", "h2", "h3", "h4", "h5", "h6", "pre", "blockquote", "br", "tr",
))
_VOID_TAGS = frozenset((
    "br", "hr", "img", "input", "meta", "link", "area", "base", "col",
    "embed", "source", "track", "wbr",
))

MAX_LINK_DENSITY = 0.5  # anchor-chars / text-chars above which a block is chrome
MIN_BLOCK_CHARS = 3


class _Node:
    __slots__ = ("tag", "attrs", "children", "text_parts")

    def __init__(self, tag: str, attrs: dict[str, str]):
        self.tag = tag
        self.attrs = attrs
        self.children: list[_Node] = []
        self.text_parts: list[str] = []


class _DomBuilder(HTMLParser):
    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.root = _Node("#root", {})
        self.stack: list[_Node] = [self.root]

    def handle_starttag(self, tag: str, attrs: list[tuple[str, str | None]]) -> None:
        node = _Node(tag, {k: (v or "") for k, v in attrs})
        self.stack[-1].children.append(node)
        if tag not in _VOID_TAGS:
            self.stack.append(node)

    def handle_startendtag(self, tag, attrs):
        node = _Node(tag, {k: (v or "") for k, v in attrs})
        self.stack[-1].children.append(node)

    def handle_endtag(self, tag: str) -> None:
        # pop to the nearest matching open tag (tolerant of bad nesting)
        for i in range(len(self.stack) - 1, 0, -1):
            if self.stack[i].tag == tag:
                del self.stack[i:]
                break

    def handle_data(self, data: str) -> None:
        if data:
            node = self.stack[-1]
            node.children.append(None)  # text marker preserves order
            node.text_parts.append(data)


# ---------------------------------------------------------------------------
# Fast DOM builder: one C-regex scanner instead of html.parser's per-construct
# Python dispatch.  Produces the same _Node tree as _DomBuilder for the HTML
# constructs this module consumes (differential-tested in
# tests/test_core_extraction.py::test_fast_dom_equals_htmlparser).  html.parser
# remains the reference implementation the fast scanner is held equal to;
# extract_html_pages always runs the fast scanner (no runtime fallback).
# ---------------------------------------------------------------------------

# start-tag machinery: the stdlib's OWN tolerant regexes, so the fast scanner
# terminates/buffers start tags exactly where html.parser does (quoted values
# only consume when closed; junk-terminated tags re-emit as data, mirroring
# HTMLParser.check_for_whole_start_tag/parse_starttag)
from html.parser import (  # noqa: E402  (regex constants, stable since 3.x)
    attrfind_tolerant as _ATTRFIND,
    locatestarttagend_tolerant as _LOCATE_START_END,
    tagfind_tolerant as _TAGFIND,
)

_NEXT_BUFFERS = frozenset("abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ=/")
# end tags: the stdlib tries the STRICT endtagfind first (</\s*name\s*>, narrow
# name charset), then falls back to tagfind_tolerant at i+2 (no leading
# whitespace, name stops at / > \x00 or space), then '</>' / bogus-comment
_END_STRICT = re.compile(r"</\s*([a-zA-Z][-.a-zA-Z0-9:_]*)\s*>")
_COMMENT_CLOSE = re.compile(r"--\s*>")  # stdlib _commentclose: '-- >' closes too
_DECL_RE = re.compile(r"<![^>]*>")
_PI_RE = re.compile(r"<\?[^>]*>")
# marked sections (<![CDATA[..]]>, <![if ..]>): stdlib parse_marked_section
_DECLNAME = re.compile(r"[a-zA-Z][-_.a-zA-Z0-9]*\s*")
_MARKED_STD = frozenset(("temp", "cdata", "ignore", "include", "rcdata"))
_MARKED_MS = frozenset(("if", "else", "endif"))
_MARKED_CLOSE = re.compile(r"]\s*]\s*>")
_MS_MARKED_CLOSE = re.compile(r"]\s*>")
# CDATA content model: html.parser 3.x sets interesting = '</\s*script\s*>'
# (the FULL strict close tag) — '</script foo>' does NOT terminate a script
_RAWTEXT_CLOSE = {
    tag: re.compile(rf"</\s*{tag}\s*>", re.IGNORECASE)
    for tag in ("script", "style")
}
# the only tags whose attributes this module reads (class-based page split)
_ATTR_TAGS = frozenset(("div", "section", "article"))
# tag-body chars that can change parse_starttag's end-decision (self-closing
# vs start vs bogus-raw-data); bodies without them never stall the attr walk
_SUSPECT = re.compile(r"[/'\"=]")
_WS_OR_SEMI = re.compile(r"[\s;]")
_EMPTY_ATTRS: dict[str, str] = {}  # shared read-only sentinel (never mutated)

# locatestarttagend_tolerant with the tag NAME captured: the pattern text is
# the stdlib's own, byte-identical except the added group (asserted below),
# so it matches at exactly the same positions with the same .end() — one
# match then yields both the end-decision boundary and the name, saving the
# separate tagfind_tolerant match on every clean start tag.  The name charset
# is identical to tagfind_tolerant's group 1, so the captured name equals
# what tagfind would have returned.
_NAME_SRC = r"<[a-zA-Z][^\t\n\r\f />\x00]*"
assert _NAME_SRC in _LOCATE_START_END.pattern  # stdlib pattern drifted?
_LOCATE_NAMED = re.compile(
    _LOCATE_START_END.pattern.replace(
        _NAME_SRC, "<([a-zA-Z][^\t\n\r\f />\x00]*)", 1),
    _LOCATE_START_END.flags,
)


def _parse_attrs_tolerant(
    html: str, k: int, endpos: int, collect: bool
) -> tuple[dict[str, str], int]:
    """Stdlib attrfind_tolerant walk over html[k:endpos] — same splits/
    quoting/entity handling as HTMLParser.parse_starttag.  Returns the attr
    dict (empty unless ``collect``) and the position where the walk stopped;
    the CALLER must apply parse_starttag's end-decision on html[k:endpos]."""
    attrs: dict[str, str] = {}
    while k < endpos:
        m = _ATTRFIND.match(html, k)
        if not m:
            break
        if collect:
            name, rest, value = m.group(1, 2, 3)
            if not rest:
                value = ""
            elif (value[:1] == "'" == value[-1:]) or (value[:1] == '"' == value[-1:]):
                value = value[1:-1]
            if value and "&" in value:
                value = unescape(value)
            attrs[name.lower()] = value or ""
        k = m.end()
    return attrs, k


def _fast_dom(html: str) -> _Node:
    # Hot-loop shape (profiled on the synthetic corpus, ~25% of the whole
    # extraction kernel): the current node and its two append methods are
    # cached across iterations and refreshed only at push/pop sites, the
    # start-tag branch is tested FIRST (tags and text dominate every real
    # page), and _LOCATE_NAMED yields the tag name from the same match that
    # decides the tag end, so clean start tags never run tagfind_tolerant.
    # Semantics are pinned by test_fast_dom_equals_htmlparser and the
    # differential fuzz harness — this function must stay construct-for-
    # construct equal to html.parser's buffering/tolerance decisions.
    root = _Node("#root", {})
    stack = [root]
    cur_child = root.children.append
    cur_text = root.text_parts.append
    pos = 0
    n = len(html)
    find = html.find
    locate = _LOCATE_NAMED.match
    while pos < n:
        lt = find("<", pos)
        if lt < 0:
            text = html[pos:]
            # html.parser buffers the WHOLE trailing segment when its last
            # '&' (within 34 chars of EOF) could open a truncated charref
            # (no whitespace/';' after it) — mirror that drop
            amppos = text.rfind("&", max(0, len(text) - 34))
            if amppos >= 0 and not _WS_OR_SEMI.search(text, amppos):
                break
            if text:
                cur_child(None)
                cur_text(unescape(text) if "&" in text else text)
            break
        if lt > pos:
            text = html[pos:lt]
            cur_child(None)
            cur_text(unescape(text) if "&" in text else text)
        nxt = html[lt + 1: lt + 2]
        if "a" <= nxt <= "z" or "A" <= nxt <= "Z":  # ASCII only: html.parser
            # rejects '<º' as a tag ('º'.isalpha() is True but not [a-zA-Z])
            # mirror HTMLParser.check_for_whole_start_tag exactly
            lm = locate(html, lt)
            j = lm.end()
            after = html[j: j + 1]
            if after == ">":
                endpos = j + 1
            elif after == "/" and html.startswith("/>", j):
                endpos = j + 2
            elif after == "" or after in _NEXT_BUFFERS or after == "/":
                break  # incomplete at buffer end: html.parser waits -> drop
            else:
                # bogus-but-terminated tag: html.parser emits it as RAW data
                # (no charref conversion on this path)
                endpos = j if j > lt else lt + 1
                cur_child(None)
                cur_text(html[lt:endpos])
                pos = endpos
                continue
            name = lm.group(1)
            tag = name.lower()
            # parse_starttag decides start-vs-startend (and the bogus raw-data
            # re-emission) by walking attrfind and testing the leftover
            # html[k:endpos].strip() against ('>', '/>') — e.g. '<p/>' is a
            # STARTEND tag even though locatestarttagend swallowed the '/'.
            # The walk only changes the outcome when the body contains one of
            # / ' " = (otherwise it provably consumes to endpos with end '>'),
            # so plain tags skip it; page-container candidates always walk to
            # collect attrs for the class-based page split.  The suspect scan
            # starts at the NAME end (a superset of tagfind's post-ws/slash
            # position): a '/' in the ws-run sends a clean tag down the walk
            # path, which computes the identical outcome, just slower.
            collect = tag in _ATTR_TAGS
            if collect or _SUSPECT.search(html, lt + 1 + len(name), j):
                tm = _TAGFIND.match(html, lt + 1)
                attrs, k = _parse_attrs_tolerant(html, tm.end(), endpos, collect)
                tag_end = html[k:endpos].strip()
                if tag_end not in (">", "/>"):
                    # attr walk stalled: html.parser re-emits the whole tag
                    # as raw data (no charref conversion)
                    cur_child(None)
                    cur_text(html[lt:endpos])
                    pos = endpos
                    continue
                self_closing = tag_end == "/>"
                if not collect:
                    attrs = _EMPTY_ATTRS
            else:
                attrs = _EMPTY_ATTRS
                # clean body: the walk provably reaches j, so the tag is
                # startend exactly when the explicit '/>' sits at j
                self_closing = after == "/"
            node = _Node(tag, attrs)
            cur_child(node)
            pos = endpos
            if self_closing:  # never pushed
                continue
            if tag in _RAWTEXT_CLOSE:
                # CDATA content model: raw text until the FULL strict close
                # tag ('</script foo>' does not close); an unclosed rawtext
                # element buffers its tail forever in html.parser -> dropped,
                # so no text is attached in that case either
                cm = _RAWTEXT_CLOSE[tag].search(html, pos)
                if cm is None:
                    pos = n
                    continue
                if cm.start() > pos:
                    node.children.append(None)
                    node.text_parts.append(html[pos:cm.start()])  # no unescape
                pos = cm.end()
                continue
            if tag not in _VOID_TAGS:
                stack.append(node)
                cur_child = node.children.append
                cur_text = node.text_parts.append
            continue
        if nxt == "":
            break  # lone '<' at EOF: html.parser buffers & drops
        if nxt == "/":
            if find(">", lt + 1) < 0:
                break  # no '>' anywhere: html.parser buffers forever -> drop
            m = _END_STRICT.match(html, lt)
            if m is None:
                tm = _TAGFIND.match(html, lt + 2)
                if tm is not None:
                    # tolerant path: pop the clean name, skip junk to '>'
                    tag = tm.group(1).lower()
                    for i in range(len(stack) - 1, 0, -1):
                        if stack[i].tag == tag:
                            del stack[i:]
                            node = stack[-1]
                            cur_child = node.children.append
                            cur_text = node.text_parts.append
                            break
                    pos = find(">", tm.end()) + 1  # '>' exists past the name
                    continue
                if html.startswith("</>", lt):
                    pos = lt + 3
                    continue
                gt = find(">", lt + 2)  # bogus end tag -> comment-until-'>'
                if gt < 0:
                    break  # '>' was before lt+2 (i.e. '</' + '>' only): dead
                pos = gt + 1
                continue
            tag = m.group(1).lower()
            for i in range(len(stack) - 1, 0, -1):
                if stack[i].tag == tag:
                    del stack[i:]
                    node = stack[-1]
                    cur_child = node.children.append
                    cur_text = node.text_parts.append
                    break
            pos = m.end()
            continue
        elif nxt == "!":
            if html.startswith("<!--", lt):
                cm = _COMMENT_CLOSE.search(html, lt + 4)
                if cm is None:
                    break  # unterminated comment: buffered forever -> drop
                pos = cm.end()
                continue
            if html.startswith("<![", lt):
                dm = _DECLNAME.match(html, lt + 3)
                if dm is None:
                    # html.parser raises AssertionError ('unknown status
                    # keyword') here; fail-soft: skip to the next '>'
                    gt = find(">", lt + 3)
                    if gt < 0:
                        break
                    pos = gt + 1
                    continue
                if dm.end() == n:
                    break  # name touches buffer end: parser waits -> drop
                name = dm.group().strip().lower()
                if name in _MARKED_STD:
                    cm = _MARKED_CLOSE.search(html, lt + 3)
                elif name in _MARKED_MS:
                    cm = _MS_MARKED_CLOSE.search(html, lt + 3)
                else:
                    gt = find(">", lt + 3)  # ref raises; fail-soft as above
                    if gt < 0:
                        break
                    pos = gt + 1
                    continue
                if cm is None:
                    break  # unterminated marked section -> drop
                pos = cm.end()
                continue
            # doctype or bogus declaration: consume to the first '>'
            m = _DECL_RE.match(html, lt)
            if m is None:
                break  # unterminated: buffered forever -> drop
            pos = m.end()
            continue
        elif nxt == "?":
            m = _PI_RE.match(html, lt)
            pos = m.end() if m else n
            continue
        # not a recognizable construct: literal '<' as text (html.parser
        # "invalid character" path)
        cur_child(None)
        cur_text("<")
        pos = lt + 1
    return root


def _iter_text(node: _Node) -> str:
    """In-order text of a subtree, block tags forcing line breaks."""
    out: list[str] = []
    ti = 0
    for child in node.children:
        if child is None:
            out.append(node.text_parts[ti])
            ti += 1
        elif child.tag in _DROP_TAGS:
            continue
        else:
            inner = _iter_text(child)
            if child.tag in _BLOCK_TAGS:
                out.append("\n" + inner + "\n")
            else:
                out.append(inner)
    return "".join(out)


def _anchor_chars(node: _Node, inside_a: bool = False) -> tuple[int, int]:
    """(anchor_text_chars, total_text_chars) of the subtree."""
    a = t = 0
    ti = 0
    for child in node.children:
        if child is None:
            n = len(node.text_parts[ti].strip())
            ti += 1
            t += n
            if inside_a:
                a += n
        elif child.tag in _DROP_TAGS:
            continue
        else:
            ca, ct = _anchor_chars(child, inside_a or child.tag == "a")
            a += ca
            t += ct
    return a, t


def link_density(node: _Node) -> float:
    a, t = _anchor_chars(node)
    return a / t if t else 1.0


def _extract_tables(node: _Node, out: list[Table]) -> None:
    if node.tag == "table":
        grid: Table = []
        _collect_rows(node, grid)
        if grid:
            out.append(grid)
        return  # nested tables inside cells are kept as cell text
    for child in node.children:
        if child is not None and child.tag not in _DROP_TAGS:
            _extract_tables(child, out)


def _collect_rows(node: _Node, grid: Table) -> None:
    for child in node.children:
        if child is None or child.tag in _DROP_TAGS:
            continue
        if child.tag == "tr":
            row = [
                " ".join(_iter_text(cell).split())
                for cell in child.children
                if cell is not None and cell.tag in ("td", "th")
            ]
            grid.append(row)
        else:
            _collect_rows(child, grid)


def _clean_block_text(raw: str) -> str:
    lines = [" ".join(ln.split()) for ln in raw.split("\n")]
    kept = [ln for ln in lines if ln]
    return "\n".join(kept)


def _content_text(node: _Node) -> str:
    """Boilerplate-stripped text of a subtree: link-dense / too-short blocks
    removed, others concatenated in document order."""
    out: list[str] = []
    ti = 0
    for child in node.children:
        if child is None:
            out.append(node.text_parts[ti])
            ti += 1
            continue
        if child.tag in _DROP_TAGS or child.tag == "table":
            continue  # tables are emitted separately as grids
        text = _clean_block_text(_iter_text(child))
        if not text:
            continue
        if child.tag in _BLOCK_TAGS:
            if len(text) >= MIN_BLOCK_CHARS and link_density(child) <= MAX_LINK_DENSITY:
                out.append("\n" + _content_text(child) + "\n")
        else:
            out.append(_content_text(child))
    # interleave with the node's own text
    if not out and node.text_parts:
        return "".join(node.text_parts)
    return "".join(out)


def block_audit(html: bytes | str) -> list[dict]:
    """Per-block verdicts of the text-density/link-density gate — the
    north-star scoring heuristic (BASELINE.json: "DOM-tree text-density
    and link-density scoring") exposed as auditable records instead of
    silently folded into the extracted text.  Walks exactly the blocks
    _content_text gates, in the same order, with the same rules:
    ``too_short`` when the cleaned text is under MIN_BLOCK_CHARS,
    ``link_dense`` when anchor_chars/total_chars exceeds
    MAX_LINK_DENSITY (compared exactly as 2a > t — no float), else
    ``kept``; kept blocks recurse like the extractor does.  Records:
    (block_ord, tag, text_chars, anchor_chars, total_chars, link_bp,
    verdict); link_bp = floor(10000a/t).  text_chars counts the CLEANED
    text (whitespace collapsed), total_chars the per-part stripped sum —
    the two counting rules the gate actually mixes, both pinned."""
    if isinstance(html, bytes):
        html = html.decode("utf-8", errors="replace")
    out: list[dict] = []

    def walk(node: _Node) -> None:
        for child in node.children:
            if (child is None or child.tag in _DROP_TAGS
                    or child.tag == "table"):
                continue
            if child.tag in _BLOCK_TAGS:
                text = _clean_block_text(_iter_text(child))
                if not text:
                    continue
                a, t = _anchor_chars(child)
                bp = (10000 * a) // t if t else 10000
                if len(text) < MIN_BLOCK_CHARS:
                    verdict = "too_short"
                elif t == 0 or 2 * a > t:
                    verdict = "link_dense"
                else:
                    verdict = "kept"
                out.append({
                    "block_ord": len(out), "tag": child.tag,
                    "text_chars": len(text), "anchor_chars": a,
                    "total_chars": t, "link_bp": bp, "verdict": verdict,
                })
                if verdict == "kept":
                    walk(child)
            else:
                walk(child)

    walk(_fast_dom(html))
    return out


def _find_page_nodes(node: _Node, acc: list[_Node]) -> None:
    cls = node.attrs.get("class", "")
    if node.tag in ("div", "section", "article") and "page" in cls.split():
        acc.append(node)
        return
    for child in node.children:
        if child is not None and child.tag not in _DROP_TAGS:
            _find_page_nodes(child, acc)


def extract_html_pages(html: bytes | str) -> list[Page]:
    """bytes/str of HTML -> ordered Pages of boilerplate-stripped text + table
    grids.  Page split: explicit class="page" containers when present, else
    the whole document as page 1."""
    if isinstance(html, bytes):
        html = html.decode("utf-8", errors="replace")
    root = _fast_dom(html)

    return _pages_from_root(root)


def _reference_dom(html: str) -> _Node:
    """html.parser-built tree — the reference implementation _fast_dom is
    differential-tested against."""
    builder = _DomBuilder()
    builder.feed(html)
    return builder.root


def _pages_from_root(root: _Node) -> list[Page]:
    page_nodes: list[_Node] = []
    _find_page_nodes(root, page_nodes)
    if not page_nodes:
        page_nodes = [root]

    pages: list[Page] = []
    for i, node in enumerate(page_nodes, start=1):
        text = _clean_block_text(_content_text(node))
        tables: list[Table] = []
        _extract_tables(node, tables)
        pages.append(Page(page_number=i, text=text, tables=tables))
    return pages
