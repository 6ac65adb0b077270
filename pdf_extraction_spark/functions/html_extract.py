"""HTML main-content extraction (text-density + link-density DOM
boilerplate strip, readability/trafilatura-style heuristics).

From-scratch stdlib implementation (north_star: "text-density +
link-density DOM boilerplate stripper").  This module is the single
shared implementation used by BOTH the Spark extraction UDF and the
single-process oracle: HTML parsing has no meaningful vectorized form,
so dual implementations would add divergence risk without adding an
independent check (the distributed-vs-oracle cross-check still covers
corpus aggregation, ordering and Arrow round-trips; the SPDF layout
engine *is* dual-implemented — see operators/layout.py vs oracle.py).

Output per document: one logical page with markdown-ish lines, table
grids, and figure metadata — the same shapes the SPDF layout engine
emits, so downstream stages are payload-agnostic.
"""

from __future__ import annotations

import re
from html import unescape
from html.parser import HTMLParser

from ..constants import (
    HTML_DROP_TAGS,
    HTML_HEADING_TAGS,
    HTML_LINK_DENSITY_MAX,
    HTML_MIN_BLOCK_CHARS,
    IMAGE_PLACEHOLDER,
)

_BLOCK_TAGS = frozenset(
    {"p", "div", "section", "article", "main", "li", "ul", "ol", "table",
     "tr", "blockquote", "pre", "body", "br", "h1", "h2", "h3", "h4",
     "h5", "h6", "nav", "header", "footer", "aside", "td", "th"}
)


class _Extractor(HTMLParser):
    """Streams the DOM once; flushes text buffers at block boundaries."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.stack: list[str] = []
        self._open: dict[str, int] = {}  # open-tag counts (O(1) endtag membership)
        self.drop_depth = 0          # inside script/nav/footer/... subtree
        self.head_depth = 0
        self.link_depth = 0
        self.buf: list[str] = []     # (text, linked) pieces
        self.buf_linked: list[str] = []
        self.block_tag = "div"
        self.lines: list[dict] = []  # {kind: text|image|table_row, ...}
        # table state
        self.table_depth = 0
        self.tables: list[dict] = []
        self._row: list[dict] | None = None
        self._cell: list[str] | None = None
        self._cell_meta: dict | None = None
        self._rows: list[list[dict]] | None = None
        self.figures: list[dict] = []

    # -- buffer handling ----------------------------------------------------
    def _flush(self) -> None:
        text = " ".join("".join(self.buf).split())
        linked = " ".join("".join(self.buf_linked).split())
        self.buf, self.buf_linked = [], []
        if not text:
            return
        if self.drop_depth or self.head_depth:
            return
        is_heading = self.block_tag in HTML_HEADING_TAGS
        link_density = len(linked) / max(1, len(text))
        if not is_heading:
            if len(text) < HTML_MIN_BLOCK_CHARS:
                return
            if link_density > HTML_LINK_DENSITY_MAX:
                return
        self.lines.append({"kind": "text", "text": text})

    # -- tag events ----------------------------------------------------------
    def handle_starttag(self, tag: str, attrs: list) -> None:
        # attrs are only consulted for img/td/th — build the dict
        # lazily there, not for every one of the page's tags
        if tag in _BLOCK_TAGS and not self.table_depth:
            self._flush()
            self.block_tag = tag
        if tag == "head":
            self.head_depth += 1
        if tag in HTML_DROP_TAGS:
            self.drop_depth += 1
        if tag == "a":
            self.link_depth += 1
        if tag == "img" and not self.drop_depth and not self.head_depth:
            a = dict(attrs)
            alt = (a.get("alt") or "").strip()
            self.figures.append({"caption": alt or None, "description": alt})
            self.lines.append({"kind": "image"})
        if not self.drop_depth:
            if tag == "table":
                self._flush()
                self.table_depth += 1
                if self.table_depth == 1:
                    self._rows = []
            elif self.table_depth:
                if tag == "tr":
                    self._row = []
                elif tag in ("td", "th"):
                    a = dict(attrs)
                    self._cell = []
                    self._cell_meta = {
                        "header": tag == "th",
                        "row_span": int(a.get("rowspan", 1) or 1),
                        "col_span": int(a.get("colspan", 1) or 1),
                    }
        self.stack.append(tag)
        self._open[tag] = self._open.get(tag, 0) + 1

    def handle_startendtag(self, tag: str, attrs: list) -> None:
        self.handle_starttag(tag, attrs)
        self.handle_endtag(tag)

    def handle_endtag(self, tag: str) -> None:
        if self._open.get(tag):
            # pop to the matching open tag (tolerates unclosed children);
            # the count dict makes the membership test O(1) on the
            # endtag-heavy hot path
            stack, open_ = self.stack, self._open
            while stack:
                t = stack.pop()
                open_[t] -= 1
                if t == tag:
                    break
        if tag == "head" and self.head_depth:
            self.head_depth -= 1
        if tag in HTML_DROP_TAGS and self.drop_depth:
            self.drop_depth -= 1
        if tag == "a" and self.link_depth:
            self.link_depth -= 1
        if not self.drop_depth:
            if self.table_depth and tag in ("td", "th") and self._cell is not None:
                text = " ".join("".join(self._cell).split())
                meta = dict(self._cell_meta or {})
                meta["text"] = text
                if self._row is not None:
                    self._row.append(meta)
                self._cell = None
                self._cell_meta = None
            elif self.table_depth and tag == "tr" and self._row is not None:
                if self._rows is not None:
                    self._rows.append(self._row)
                self._row = None
            elif tag == "table" and self.table_depth:
                self.table_depth -= 1
                if self.table_depth == 0 and self._rows:
                    self._emit_table(self._rows)
                    self._rows = None
        if tag in _BLOCK_TAGS and not self.table_depth:
            self._flush()

    def _emit_table(self, rows: list[list[dict]]) -> None:
        cells = []
        row_lines = []
        for r, row in enumerate(rows):
            col = 0
            texts = []
            for cell in row:
                cells.append(
                    {
                        "row": r,
                        "col": col,
                        "text": cell["text"],
                        "row_span": cell["row_span"],
                        "col_span": cell["col_span"],
                        "column_header": bool(cell["header"]) and r == 0,
                        "row_header": bool(cell["header"]) and r > 0 or (col == 0 and r > 0),
                    }
                )
                texts.append(cell["text"])
                col += cell["col_span"]
            row_lines.append(" | ".join(texts))
        self.tables.append({"cells": cells, "title": None, "bbox": None})
        for line in row_lines:
            self.lines.append({"kind": "table_row", "text": line})

    # -- text ------------------------------------------------------------
    def handle_data(self, data: str) -> None:
        if self.drop_depth or self.head_depth:
            return
        if self._cell is not None:
            self._cell.append(data)
            return
        if self.table_depth:
            return
        self.buf.append(data)
        if self.link_depth:
            self.buf_linked.append(data)


# --- regex fast path ----------------------------------------------------------
#
# stdlib HTMLParser was ~29% of the whole layout profile (round-2
# NOTES): its goahead loop re-scans with several small regexes and
# allocates per attribute even for tags whose attributes nobody reads.
# The fast tokenizer below drives the SAME _Extractor event handlers
# from one compiled token regex, parsing attributes only for the three
# tags that use them (img/td/th) and skipping script/style content
# outright (they are drop-subtrees, so HTMLParser's handle_data calls
# inside them were no-ops anyway).  Any construct the tokenizer does
# not fully understand (a bare '<' in text, an unterminated rawtext
# element) aborts and the document re-parses on the stdlib path — the
# fast path is an optimization gate, never a semantics change.

_TOKEN_RE = re.compile(
    r"<(?:"
    r"!--.*?(?:-->|$)"                      # comment (EOF-tolerant)
    r"|!\[CDATA\[.*?(?:\]\]>|$)"            # CDATA section
    r"|![^>]*>"                              # doctype / declaration
    r"|\?[^>]*>"                             # processing instruction
    r"|(?P<end>/)\s*(?P<ename>[a-zA-Z][^\s>]*)\s*>"
    r"|(?P<name>[a-zA-Z][^\s/>]*)"
    r"(?P<attrs>(?:\"[^\"]*\"|'[^']*'|[^>])*?)"
    r"(?P<slash>/?)>"
    r")",
    re.S,
)

_ATTR_RE = re.compile(
    r"([a-zA-Z_][-a-zA-Z0-9_:.]*)"
    r"(?:\s*=\s*(\"([^\"]*)\"|'([^']*)'|([^\s\"'>]*)))?"
)

_ATTR_TAGS = frozenset({"img", "td", "th"})
_RAWTEXT_TAGS = frozenset({"script", "style"})  # HTMLParser CDATA mode


def _parse_attrs(s: str) -> list:
    out = []
    for m in _ATTR_RE.finditer(s):
        name = m.group(1).lower()
        val = m.group(3)
        if val is None:
            val = m.group(4)
        if val is None:
            val = m.group(5)
        if val is not None and "&" in val:
            val = unescape(val)
        out.append((name, val))
    return out


def _fast_feed(parser: _Extractor, s: str) -> bool:
    """Tokenize ``s`` into the extractor's handlers; False = anomaly
    (caller falls back to the stdlib parser on a FRESH extractor)."""
    pos, n = 0, len(s)
    find = s.find
    while pos < n:
        lt = find("<", pos)
        if lt < 0:
            data = s[pos:]
            parser.handle_data(unescape(data) if "&" in data else data)
            break
        if lt > pos:
            data = s[pos:lt]
            parser.handle_data(unescape(data) if "&" in data else data)
        m = _TOKEN_RE.match(s, lt)
        if m is None:
            return False  # bare '<' / malformed tag: stdlib semantics differ
        pos = m.end()
        name = m.group("name")
        if name is not None:
            tag = name.lower()
            attrs_s = m.group("attrs")
            attrs = (
                _parse_attrs(attrs_s)
                if attrs_s and tag in _ATTR_TAGS
                else []
            )
            if m.group("slash"):
                parser.handle_startendtag(tag, attrs)
            elif tag in _RAWTEXT_TAGS:
                parser.handle_starttag(tag, attrs)
                close = s.find("</" + tag, pos)
                if close < 0:
                    close = s.find("</" + tag.upper(), pos)
                if close < 0:
                    return False  # unterminated rawtext element
                gt = find(">", close)
                if gt < 0:
                    return False
                # content skipped: script/style are drop-subtrees, so the
                # stdlib path's handle_data calls here were no-ops
                parser.handle_endtag(tag)
                pos = gt + 1
            else:
                parser.handle_starttag(tag, attrs)
        else:
            ename = m.group("ename")
            if ename is not None:
                parser.handle_endtag(ename.lower())
            # comments / doctype / PI / CDATA: skipped
    return True


def extract_html(payload: bytes) -> dict:
    """payload bytes -> single-page extraction dict (spec shape shared
    with the SPDF layout engine)."""
    try:
        text = payload.decode("utf-8", errors="replace")
    except Exception:
        text = ""
    parser = _Extractor()
    ok = False
    try:
        ok = _fast_feed(parser, text)
    except Exception:
        ok = False
    if not ok:
        parser = _Extractor()
        try:
            parser.feed(text)
            parser.close()
        except Exception:
            pass
    parser._flush()
    md_lines: list[str] = []
    blocks: list[dict] = []
    for item in parser.lines:
        if item["kind"] == "image":
            md_lines.append(IMAGE_PLACEHOLDER)
        else:
            md_lines.append(item["text"])
            if item["kind"] == "text":
                blocks.append({"text": item["text"], "bbox": None})
    return {
        "page_no": 1,
        "md_lines": md_lines,
        "blocks": blocks,
        "tables": parser.tables,
        "figures": parser.figures,
        "page_w": 0.0,
        "page_h": 0.0,
        "glyph_coverage": 1.0,
        "image_coverage": 0.0,
        "ocr_triggered": False,
        "ocr_text": None,
        "visual_density": 0.0,
        "has_tables": bool(parser.tables),
        "has_figures": bool(parser.figures),
        "needs_review": bool(parser.figures),
    }
