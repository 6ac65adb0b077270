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
        a = dict(attrs)
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
                    self._cell = []
                    self._cell_meta = {
                        "header": tag == "th",
                        "row_span": int(a.get("rowspan", 1) or 1),
                        "col_span": int(a.get("colspan", 1) or 1),
                    }
        self.stack.append(tag)

    def handle_startendtag(self, tag: str, attrs: list) -> None:
        self.handle_starttag(tag, attrs)
        self.handle_endtag(tag)

    def handle_endtag(self, tag: str) -> None:
        if tag in self.stack:
            # pop to the matching open tag (tolerates unclosed children)
            while self.stack and self.stack[-1] != tag:
                self.stack.pop()
            if self.stack:
                self.stack.pop()
        if tag == "head":
            self.head_depth = max(0, self.head_depth - 1)
        if tag in HTML_DROP_TAGS:
            self.drop_depth = max(0, self.drop_depth - 1)
        if tag == "a":
            self.link_depth = max(0, self.link_depth - 1)
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


def extract_html(payload: bytes) -> dict:
    """payload bytes -> single-page extraction dict (spec shape shared
    with the SPDF layout engine)."""
    try:
        text = payload.decode("utf-8", errors="replace")
    except Exception:
        text = ""
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
