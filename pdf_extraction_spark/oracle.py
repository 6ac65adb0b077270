"""Single-process pure-Python extraction oracle.

This is the *executable spec* the distributed engine must match
byte-for-byte per url (north_rule: "byte-identical extracted text per
url", verified in tests/test_extraction_oracle.py).  It deliberately
uses simple dict/loop code with no numpy/pandas so that it stays a
readable spec; the Spark path re-implements the SPDF layout analysis
with vectorized numpy (operators/layout.py) and the corpus-level
boilerplate aggregation with DataFrame ops (operators/boilerplate.py).

Layout spec (from-scratch re-expression of what the reference obtains
from Docling at structured_extract.py:631-639, plus its own filters):

1. glyph expansion — a text run ``[x, y, size, s]`` expands to one
   glyph per char, advance ``0.6*size``; space chars advance but emit
   no glyph.  Glyph bbox: ``(x, y, x+0.6*size, y+size)`` (PDF coords,
   y up from bottom, baseline at y).
2. table grids — border rects union-found into components (adjacency
   tolerance 1.5pt); a component with >=2 row bands and >=2 col bands
   is a table.  Cell text = glyphs whose center falls in the cell rect
   expanded by tolerance 2.0 (reference rect_contains_center,
   table_ocr.py:161-172), reading order, word gaps > 0.45*size.
   Glyphs inside any table region are excluded from body text.
3. lines — remaining glyphs grouped by quantized baseline
   ``int(round(y / 2.0))``, sorted by x; a gap > 0.45*size starts a
   new word (single space in the output).
4. reading order — recursive XY-cut over element bboxes (lines,
   tables, images): split at every y-gap >= 20pt (top group first),
   then x-gaps >= 24pt (left first), alternating; leaves sort by
   (-top, left).  Consecutive lines with baseline gap <= 1.8*size form
   one block (paragraph); block text joins lines with a single space.
5. markdown — one line per block; ``a | b | c`` per table row
   (reference build_table_text joins cells with " | ",
   build_vector_db.py:295); ``[IMAGE]`` per image (reference
   image_placeholder, structured_extract.py:355).
6. OCR trigger — glyph coverage (sum glyph area / page area) <
   GLYPH_COVERAGE_TAU while images cover >= 50% of the page routes the
   page to the OCR pass (deterministic re-expression of the sampled
   emptiness check at pdf_text_extractor.py:176-201).  The stand-in
   OCR decodes the deterministic ``OCRTEXT:`` payload (real OCR is an
   external model; north_rule allows a rule-based stand-in).
7. boilerplate — per host: normalized 15-char line prefixes counted
   once per page; prefixes on >= max(3, int(0.2*n_pages)) pages are
   stripped (never ``[IMAGE]`` lines); hosts with < 3 pages strip
   nothing (structured_extract.py:53-99,361-381).
8. document text — page texts (cleaned markdown, or raw OCR text for
   triggered pages) joined with a blank line, pages in order, empty
   pages skipped.
"""

from __future__ import annotations

import base64
import html as _html
import json
import re
from urllib.parse import urlparse

from .constants import (
    BLOCK_GAP_FACTOR,
    FIGURE_HEADER_RATIO,
    GLYPH_COVERAGE_TAU,
    IMAGE_PLACEHOLDER,
    LINE_Y_QUANT,
    MIN_FIGURE_AREA_RATIO,
    MIN_NORM_LEN,
    MIN_PATTERN_PAGES,
    OCR_IMAGE_COVER_MIN,
    PATTERN_PAGE_FRACTION,
    PDF_WORD_TOLERANCE,
    PREFIX_LEN,
    RECT_SNAP_TOL,
    SPDF_MAGIC,
    TITLE_MAX_CHARS,
    TITLE_OVERLAP_THRESHOLD,
    TITLE_OVERLAP_WEIGHT,
    TITLE_VERTICAL_THRESHOLD,
    VISUAL_REVIEW_THRESHOLD,
    WORD_GAP_FACTOR,
    XYCUT_MIN_VGAP,
)
from .functions.html_extract import extract_html

XYCUT_MIN_HGAP = 20.0
CHAR_ADVANCE = 0.6


# --------------------------------------------------------------------------
# small helpers (deliberately duplicated from functions/text_pure.py so the
# oracle stays a self-contained spec; equality is property-tested)
# --------------------------------------------------------------------------

def normalize_line(text: str) -> str:
    """reference: structured_extract.py:41-50."""
    text = _html.unescape(text)
    text = re.sub(r"\d+", "N", text)
    text = re.sub(r"\s+", " ", text)
    return text.strip().lower()


def decode_ocr_stub(b64data: str) -> str | None:
    try:
        raw = base64.b64decode(b64data)
    except Exception:
        return None
    if raw.startswith(b"OCRTEXT:"):
        return raw[len(b"OCRTEXT:"):].decode("utf-8", errors="replace")
    return None


def decode_figure_stub(b64data: str) -> str | None:
    try:
        raw = base64.b64decode(b64data)
    except Exception:
        return None
    if raw.startswith(b"FIG:"):
        return raw[len(b"FIG:"):].decode("utf-8", errors="replace")
    return None


# --------------------------------------------------------------------------
# SPDF layout (reference implementation)
# --------------------------------------------------------------------------

def _expand_glyphs(runs: list) -> list[dict]:
    glyphs = []
    for x, y, size, s in runs:
        adv = CHAR_ADVANCE * size
        cx = float(x)
        for ch in s:
            if ch != " ":
                glyphs.append(
                    {"ch": ch, "l": cx, "r": cx + adv, "b": float(y),
                     "t": float(y) + size, "size": float(size)}
                )
            cx += adv
    return glyphs


def _group_rects(rects: list) -> list[list[list[float]]]:
    """Union-find over border rects -> connected components."""
    n = len(rects)
    parent = list(range(n))

    def find(i):
        while parent[i] != i:
            parent[i] = parent[parent[i]]
            i = parent[i]
        return i

    def adjacent(a, b) -> bool:
        return not (
            a[2] < b[0] - RECT_SNAP_TOL
            or b[2] < a[0] - RECT_SNAP_TOL
            or a[3] < b[1] - RECT_SNAP_TOL
            or b[3] < a[1] - RECT_SNAP_TOL
        )

    for i in range(n):
        for j in range(i + 1, n):
            if adjacent(rects[i], rects[j]):
                ri, rj = find(i), find(j)
                if ri != rj:
                    parent[ri] = rj
    comps: dict[int, list] = {}
    for i in range(n):
        comps.setdefault(find(i), []).append(rects[i])
    # deterministic component order: by (-top, left) of the union bbox
    out = list(comps.values())
    out.sort(key=lambda rs: (-max(r[3] for r in rs), min(r[0] for r in rs)))
    return out


def _cluster_1d(values: list[float], tol: float) -> list[float]:
    """Sorted distinct band starts (values within tol collapse)."""
    bands: list[float] = []
    for v in sorted(values):
        if not bands or v - bands[-1] > tol:
            bands.append(v)
    return bands


def _glyph_text(glyphs: list[dict]) -> str:
    """Reading-order text for a small glyph set (cell contents)."""
    if not glyphs:
        return ""
    lines: dict[int, list[dict]] = {}
    for g in glyphs:
        lines.setdefault(int(round(g["b"] / LINE_Y_QUANT)), []).append(g)
    parts = []
    for key in sorted(lines, reverse=True):
        gs = sorted(lines[key], key=lambda g: g["l"])
        buf = [gs[0]["ch"]]
        for prev, cur in zip(gs, gs[1:]):
            if cur["l"] - prev["r"] > WORD_GAP_FACTOR * prev["size"]:
                buf.append(" ")
            buf.append(cur["ch"])
        parts.append("".join(buf))
    return " ".join(parts)


def _detect_tables(rects: list, glyphs: list[dict]) -> tuple[list[dict], list[bool]]:
    """-> (tables, glyph_in_table mask)."""
    tables = []
    in_table = [False] * len(glyphs)
    for comp in _group_rects(rects):
        row_tops = _cluster_1d([r[3] for r in comp], RECT_SNAP_TOL)
        col_lefts = _cluster_1d([r[0] for r in comp], RECT_SNAP_TOL)
        if len(row_tops) < 2 or len(col_lefts) < 2:
            continue
        row_tops_desc = sorted(row_tops, reverse=True)
        bbox = {
            "left": min(r[0] for r in comp),
            "bottom": min(r[1] for r in comp),
            "right": max(r[2] for r in comp),
            "top": max(r[3] for r in comp),
        }
        cells = []
        for rect in comp:
            x0, y0, x1, y1 = rect
            row_idx = min(
                range(len(row_tops_desc)),
                key=lambda i: abs(row_tops_desc[i] - y1),
            )
            col_idx = min(
                range(len(col_lefts)),
                key=lambda i: abs(col_lefts[i] - x0),
            )
            row_span = max(1, sum(1 for t in row_tops_desc if y0 + RECT_SNAP_TOL < t <= y1 + RECT_SNAP_TOL))
            col_span = max(1, sum(1 for c in col_lefts if x0 - RECT_SNAP_TOL <= c < x1 - RECT_SNAP_TOL))
            cell_glyphs = []
            for gi, g in enumerate(glyphs):
                cx = (g["l"] + g["r"]) / 2
                cy = (g["b"] + g["t"]) / 2
                if (
                    x0 - PDF_WORD_TOLERANCE <= cx <= x1 + PDF_WORD_TOLERANCE
                    and y0 - PDF_WORD_TOLERANCE <= cy <= y1 + PDF_WORD_TOLERANCE
                ):
                    cell_glyphs.append(g)
                    in_table[gi] = True
            cells.append(
                {
                    "row": row_idx,
                    "col": col_idx,
                    "text": _glyph_text(cell_glyphs),
                    "row_span": row_span,
                    "col_span": col_span,
                    "column_header": row_idx == 0,
                    "row_header": col_idx == 0 and row_idx > 0,
                }
            )
        cells.sort(key=lambda c: (c["row"], c["col"]))
        tables.append({"bbox": bbox, "cells": cells, "title": None})
    return tables, in_table


def _build_lines(glyphs: list[dict]) -> list[dict]:
    lines: dict[int, list[dict]] = {}
    for g in glyphs:
        lines.setdefault(int(round(g["b"] / LINE_Y_QUANT)), []).append(g)
    out = []
    for key in sorted(lines, reverse=True):
        gs = sorted(lines[key], key=lambda g: g["l"])
        buf = [gs[0]["ch"]]
        for prev, cur in zip(gs, gs[1:]):
            if cur["l"] - prev["r"] > WORD_GAP_FACTOR * prev["size"]:
                buf.append(" ")
            buf.append(cur["ch"])
        out.append(
            {
                "kind": "line",
                "text": "".join(buf),
                "l": min(g["l"] for g in gs),
                "r": max(g["r"] for g in gs),
                "b": min(g["b"] for g in gs),
                "t": max(g["t"] for g in gs),
                "baseline": gs[0]["b"],
                "size": gs[0]["size"],
            }
        )
    return out


def _split_axis(elems: list[dict], axis: str, min_gap: float) -> list[list[dict]]:
    """Split at uncovered gaps along an axis; groups ordered
    top->bottom (y) / left->right (x)."""
    if axis == "y":
        ivals = sorted(((e["b"], e["t"]) for e in elems), key=lambda p: p[0])
    else:
        ivals = sorted(((e["l"], e["r"]) for e in elems), key=lambda p: p[0])
    merged: list[list[float]] = []
    for lo, hi in ivals:
        if merged and lo <= merged[-1][1] + min_gap:
            merged[-1][1] = max(merged[-1][1], hi)
        else:
            merged.append([lo, hi])
    if len(merged) <= 1:
        return [elems]
    groups: list[list[dict]] = [[] for _ in merged]
    for e in elems:
        lo = e["b"] if axis == "y" else e["l"]
        for i, (mlo, mhi) in enumerate(merged):
            if mlo <= lo <= mhi:
                groups[i].append(e)
                break
    if axis == "y":
        groups.reverse()  # top group first
    return [g for g in groups if g]


def _xy_order(elems: list[dict], try_y: bool = True, try_x: bool = True) -> list[dict]:
    if len(elems) <= 1:
        return list(elems)
    if try_y:
        groups = _split_axis(elems, "y", XYCUT_MIN_HGAP)
        if len(groups) > 1:
            out = []
            for g in groups:
                out.extend(_xy_order(g, try_y=False, try_x=True))
            return out
    if try_x:
        groups = _split_axis(elems, "x", XYCUT_MIN_VGAP)
        if len(groups) > 1:
            out = []
            for g in groups:
                out.extend(_xy_order(g, try_y=True, try_x=False))
            return out
    return sorted(elems, key=lambda e: (-e["t"], e["l"]))


def _lines_to_blocks(ordered: list[dict]) -> list[dict]:
    """Merge consecutive line elements into paragraph blocks."""
    out: list[dict] = []
    for e in ordered:
        if (
            e["kind"] == "line"
            and out
            and out[-1]["kind"] == "block"
            and out[-1]["baseline"] - e["baseline"] > 0
            and out[-1]["baseline"] - e["baseline"] <= BLOCK_GAP_FACTOR * e["size"]
        ):
            blk = out[-1]
            blk["text"] += " " + e["text"]
            blk["l"] = min(blk["l"], e["l"])
            blk["r"] = max(blk["r"], e["r"])
            blk["b"] = min(blk["b"], e["b"])
            blk["baseline"] = e["baseline"]
        elif e["kind"] == "line":
            out.append(
                {
                    "kind": "block",
                    "text": e["text"],
                    "l": e["l"],
                    "r": e["r"],
                    "b": e["b"],
                    "t": e["t"],
                    "baseline": e["baseline"],
                    "size": e["size"],
                }
            )
        else:
            out.append(e)
    return out


def _horizontal_overlap_ratio(a: dict, b: dict) -> float:
    """reference: structured_extract.py:180-188."""
    left = max(a["left"], b["left"])
    right = min(a["right"], b["right"])
    if right <= left:
        return 0.0
    width_a = max(1e-3, a["right"] - a["left"])
    width_b = max(1e-3, b["right"] - b["left"])
    return (right - left) / min(width_a, width_b)


def _detect_table_title(table_bbox: dict, blocks: list[dict]) -> str | None:
    """reference: structured_extract.py:191-214."""
    best_text, best_score = None, float("inf")
    for blk in blocks:
        bbox = {"left": blk["l"], "right": blk["r"], "top": blk["t"], "bottom": blk["b"]}
        overlap = _horizontal_overlap_ratio(bbox, table_bbox)
        if overlap < TITLE_OVERLAP_THRESHOLD:
            continue
        tlen = len(blk["text"])
        if tlen == 0 or tlen > TITLE_MAX_CHARS:
            continue
        vertical_gap = bbox["bottom"] - table_bbox["top"]
        if vertical_gap < 0 or vertical_gap > TITLE_VERTICAL_THRESHOLD:
            continue
        score = vertical_gap - overlap * TITLE_OVERLAP_WEIGHT
        if score < best_score:
            best_score = score
            best_text = blk["text"]
    return best_text


def extract_spdf_page(page: dict, page_no: int) -> dict:
    w = float(page.get("w") or 1.0)
    h = float(page.get("h") or 1.0)
    page_area = max(1e-3, w * h)
    glyphs = _expand_glyphs(page.get("text") or [])
    images = page.get("images") or []

    glyph_area = sum((g["r"] - g["l"]) * (g["t"] - g["b"]) for g in glyphs)
    glyph_coverage = glyph_area / page_area
    image_area = sum(
        max(0.0, (im[2] - im[0])) * max(0.0, (im[3] - im[1])) for im in images
    )
    image_coverage = image_area / page_area
    ocr_triggered = (
        glyph_coverage < GLYPH_COVERAGE_TAU and image_coverage >= OCR_IMAGE_COVER_MIN
    )
    ocr_text = None
    if ocr_triggered:
        for im in images:
            ocr_text = decode_ocr_stub(im[4]) if len(im) > 4 else None
            if ocr_text is not None:
                break
        ocr_text = (ocr_text or "").strip()

    tables, in_table = _detect_tables(page.get("rects") or [], glyphs)
    body_glyphs = [g for g, used in zip(glyphs, in_table) if not used]
    lines = _build_lines(body_glyphs)

    elems: list[dict] = list(lines)
    for ti, t in enumerate(tables):
        elems.append(
            {
                "kind": "table",
                "idx": ti,
                "l": t["bbox"]["left"],
                "r": t["bbox"]["right"],
                "b": t["bbox"]["bottom"],
                "t": t["bbox"]["top"],
            }
        )
    for ii, im in enumerate(images):
        elems.append(
            {"kind": "image", "idx": ii, "l": im[0], "r": im[2], "b": im[1], "t": im[3]}
        )

    ordered = _lines_to_blocks(_xy_order(elems))
    blocks = [e for e in ordered if e["kind"] == "block"]

    md_lines: list[str] = []
    for e in ordered:
        if e["kind"] == "block":
            md_lines.append(e["text"])
        elif e["kind"] == "table":
            t = tables[e["idx"]]
            rows: dict[int, list] = {}
            for c in t["cells"]:
                rows.setdefault(c["row"], []).append((c["col"], c["text"]))
            for ridx in sorted(rows):
                md_lines.append(
                    " | ".join(txt for _, txt in sorted(rows[ridx]))
                )
        else:
            md_lines.append(IMAGE_PLACEHOLDER)

    # table titles (reference detect_table_title, structured_extract.py:401)
    for t in tables:
        t["title"] = _detect_table_title(
            {
                "left": t["bbox"]["left"],
                "right": t["bbox"]["right"],
                "top": t["bbox"]["top"],
                "bottom": t["bbox"]["bottom"],
            },
            blocks,
        )

    # figures: area-ratio filter F2 + header-zone filter F3
    figures = []
    table_area = sum(
        max(0.0, t["bbox"]["right"] - t["bbox"]["left"])
        * max(0.0, t["bbox"]["top"] - t["bbox"]["bottom"])
        for t in tables
    )
    figure_area = 0.0
    header_cutoff = h * (1 - FIGURE_HEADER_RATIO) if h else None
    for im in images:
        x0, y0, x1, y1 = im[0], im[1], im[2], im[3]
        width = max(0.0, x1 - x0)
        height = max(0.0, y1 - y0)
        area_ratio = (width * height) / page_area
        if area_ratio < MIN_FIGURE_AREA_RATIO:
            continue  # [SKIP ICON], structured_extract.py:441-444
        if header_cutoff and y0 >= header_cutoff:
            continue  # [SKIP HEADER], structured_extract.py:446-448
        desc = decode_figure_stub(im[4]) if len(im) > 4 else None
        figures.append(
            {
                "bbox": {"left": x0, "right": x1, "top": y1, "bottom": y0},
                "caption": None,
                "description": desc,
            }
        )
        figure_area += width * height

    visual_density = (table_area + figure_area) / page_area
    needs_review = visual_density >= VISUAL_REVIEW_THRESHOLD or bool(images)

    return {
        "page_no": page_no,
        "md_lines": md_lines,
        "blocks": [
            {"text": b["text"],
             "bbox": {"left": b["l"], "right": b["r"], "top": b["t"], "bottom": b["b"]}}
            for b in blocks
        ],
        "tables": tables,
        "figures": figures,
        "page_w": w,
        "page_h": h,
        "glyph_coverage": glyph_coverage,
        "image_coverage": image_coverage,
        "ocr_triggered": ocr_triggered,
        "ocr_text": ocr_text,
        "visual_density": visual_density,
        "has_tables": bool(tables),
        "has_figures": bool(figures),
        "needs_review": needs_review,
    }


# --------------------------------------------------------------------------
# document + corpus level
# --------------------------------------------------------------------------

def extract_document(payload: bytes | None) -> list[dict]:
    """payload -> list of page dicts (format sniffing: F1 dispatch)."""
    if not payload:
        return []
    if payload.startswith(SPDF_MAGIC):
        body = payload[len(SPDF_MAGIC):].decode("utf-8", errors="replace")
        pages = []
        for i, rec in enumerate(body.split("\x1e")):
            try:
                page = json.loads(rec)
            except Exception:
                page = {}
            pages.append(extract_spdf_page(page, i + 1))
        return pages
    stripped = payload.lstrip()
    if stripped[:1] == b"<" or b"<html" in payload[:512].lower():
        return [extract_html(payload)]
    return []


def host_of_url(url: str) -> str:
    return urlparse(url).netloc


def boilerplate_patterns(host_pages: list[dict]) -> set[str]:
    """reference: analyze_batch_patterns, structured_extract.py:53-99.

    ``host_pages``: every non-OCR page of one host (across docs)."""
    page_count = len(host_pages)
    if page_count < MIN_PATTERN_PAGES:
        return set()
    counts: dict[str, int] = {}
    for page in host_pages:
        seen: set[str] = set()
        for line in page["md_lines"]:
            line = line.strip()
            if not line:
                continue
            if IMAGE_PLACEHOLDER.lower() in line.lower():
                continue
            norm = normalize_line(line)
            if len(norm) < MIN_NORM_LEN:
                continue
            key = norm[:PREFIX_LEN]
            if key not in seen:
                counts[key] = counts.get(key, 0) + 1
                seen.add(key)
    threshold = max(MIN_PATTERN_PAGES, int(page_count * PATTERN_PAGE_FRACTION))
    return {p for p, c in counts.items() if c >= threshold}


def strip_boilerplate(md_lines: list[str], patterns: set[str]) -> str:
    """reference: process_page token reduction, structured_extract.py:361-381."""
    if not patterns:
        return "\n".join(md_lines).strip()
    kept = []
    for line in md_lines:
        if IMAGE_PLACEHOLDER.lower() in line.lower():
            kept.append(line)
            continue
        key = normalize_line(line)[:PREFIX_LEN]
        if key in patterns:
            continue
        kept.append(line)
    return "\n".join(kept).strip()


def extract_corpus(rows: list[dict]) -> dict[str, dict]:
    """Full-corpus single-process oracle run.

    rows: [{url, html}, ...] -> {url: {"text": str, "pages": [...]}}.
    """
    docs = {}
    host_pages: dict[str, list[dict]] = {}
    for row in rows:
        pages = extract_document(row.get("html"))
        docs[row["url"]] = pages
        host = host_of_url(row["url"])
        for p in pages:
            if not p["ocr_triggered"]:
                host_pages.setdefault(host, []).append(p)

    patterns_by_host = {
        host: boilerplate_patterns(pages) for host, pages in host_pages.items()
    }

    out = {}
    for url, pages in docs.items():
        host = host_of_url(url)
        patterns = patterns_by_host.get(host, set())
        page_texts = []
        for p in sorted(pages, key=lambda p: p["page_no"]):
            if p["ocr_triggered"]:
                text = p["ocr_text"] or ""
            else:
                text = strip_boilerplate(p["md_lines"], patterns)
            if text:
                page_texts.append(text)
        out[url] = {"text": "\n\n".join(page_texts), "pages": pages}
    return out
