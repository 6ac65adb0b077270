"""Stage 1 — EXTRACT: binary payloads -> page rows.

Spark-first re-expression of the reference's per-PDF extraction loop
(structured_extract.py:571-663, run per file via subprocess): here one
``mapInPandas`` over Arrow batches of ``(url, html)`` rows.

Skew defense (north_star "salted repartitioning on url-hash to defeat
giant-PDF skew"): extraction runs in two phases —

* **1a split** — cheap format sniff + page split: each document row
  becomes one row *per page* carrying only that page's payload slice.
  This turns a 10k-page document into 10k independent work units
  (the reference's own page-range chunking,
  structured_extract.py:140-154, justifies page-level parallelism).
* **repartition** on ``xxhash64(url, page_no)`` — page units spread
  uniformly across the cluster regardless of document size.
* **1b layout** — the heavy glyph->line->block analysis per page unit
  (operators/layout.py), vectorized numpy inside Arrow batches.

Each output row carries (partition_id, bytes_in, wall_ms) so the
pipeline can aggregate the per-partition lineage/metrics table
(north_star) without a second pass.
"""

from __future__ import annotations

import json
import time
from typing import Iterator
from urllib.parse import urlparse

import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T

from ..constants import SPDF_MAGIC
from ..schemas import PAGES

PAGE_UNIT = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("host", T.StringType()),
        T.StructField("page_no", T.IntegerType(), False),
        T.StructField("kind", T.StringType(), False),  # spdf | html | empty
        T.StructField("payload", T.BinaryType()),
        T.StructField("bytes_in", T.LongType()),
    ]
)

PAGES_EXT = T.StructType(
    PAGES.fields
    + [
        T.StructField("partition_id", T.IntegerType()),
        T.StructField("bytes_in", T.LongType()),
        T.StructField("wall_ms", T.LongType()),
    ]
)


def _sniff(payload) -> str:
    if payload is None or len(payload) == 0:
        return "empty"
    b = bytes(payload)
    if b.startswith(SPDF_MAGIC):
        return "spdf"
    if b.lstrip()[:1] == b"<" or b"<html" in b[:512].lower():
        return "html"
    return "empty"


def _split_pages_fn(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in it:
        out = {k: [] for k in ("url", "host", "page_no", "kind", "payload", "bytes_in")}
        for url, payload in zip(pdf["url"], pdf["html"]):
            host = urlparse(url).netloc
            kind = _sniff(payload)

            def emit(page_no, k, pl):
                out["url"].append(url)
                out["host"].append(host)
                out["page_no"].append(page_no)
                out["kind"].append(k)
                out["payload"].append(pl)
                out["bytes_in"].append(0 if pl is None else len(pl))

            if kind == "spdf":
                try:
                    doc = json.loads(bytes(payload)[len(SPDF_MAGIC):].decode("utf-8"))
                    pages = doc.get("pages") or []
                except Exception:
                    pages = []
                if not pages:
                    emit(0, "empty", None)
                else:
                    for i, page in enumerate(pages):
                        emit(
                            i + 1,
                            "spdf",
                            json.dumps(page, ensure_ascii=False).encode("utf-8"),
                        )
            elif kind == "html":
                emit(1, "html", bytes(payload))
            else:
                emit(0, "empty", None)
        yield pd.DataFrame(out)


def _page_to_row(page: dict, url: str, host: str) -> dict:
    tables = [
        {
            "table_index": ti,
            "title": t.get("title"),
            "bbox": t.get("bbox"),
            "cells": t.get("cells") or [],
        }
        for ti, t in enumerate(page.get("tables") or [])
    ]
    figures = [
        {
            "figure_index": fi,
            "caption": f.get("caption"),
            "description": f.get("description"),
            "bbox": f.get("bbox"),
        }
        for fi, f in enumerate(page.get("figures") or [])
    ]
    return {
        "url": url,
        "host": host,
        "page_no": int(page["page_no"]),
        "md": "\n".join(page["md_lines"]),
        "blocks": page.get("blocks") or [],
        "tables": tables,
        "figures": figures,
        "page_w": float(page.get("page_w") or 0.0),
        "page_h": float(page.get("page_h") or 0.0),
        "glyph_coverage": float(page.get("glyph_coverage") or 0.0),
        "image_coverage": float(page.get("image_coverage") or 0.0),
        "ocr_triggered": bool(page.get("ocr_triggered")),
        "ocr_payload": page.get("ocr_payload"),
        "visual_density": float(page.get("visual_density") or 0.0),
        "has_tables": bool(page.get("has_tables")),
        "has_figures": bool(page.get("has_figures")),
        "needs_review": bool(page.get("needs_review")),
    }


def _empty_doc_row(url: str, host: str) -> dict:
    return {
        "url": url, "host": host, "page_no": 0, "md": None, "blocks": [],
        "tables": [], "figures": [], "page_w": 0.0, "page_h": 0.0,
        "glyph_coverage": 0.0, "image_coverage": 0.0, "ocr_triggered": False,
        "ocr_payload": None, "visual_density": 0.0, "has_tables": False,
        "has_figures": False, "needs_review": False,
    }


def _layout_fn(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    from pyspark import TaskContext

    from .layout import extract_html_unit, extract_spdf_unit

    pid = TaskContext.get().partitionId() if TaskContext.get() else -1
    t0 = time.monotonic()
    batches = []
    for pdf in it:
        rows = []
        for url, host, page_no, kind, payload, bytes_in in zip(
            pdf["url"], pdf["host"], pdf["page_no"], pdf["kind"],
            pdf["payload"], pdf["bytes_in"],
        ):
            if kind == "spdf":
                page = extract_spdf_unit(bytes(payload), int(page_no))
                row = _page_to_row(page, url, host)
            elif kind == "html":
                page = extract_html_unit(bytes(payload))
                row = _page_to_row(page, url, host)
            else:
                row = _empty_doc_row(url, host)
            row["bytes_in"] = int(bytes_in)
            rows.append(row)
        if rows:
            batches.append(rows)
    wall_ms = int((time.monotonic() - t0) * 1000)
    for rows in batches:
        out = pd.DataFrame(rows)
        out["partition_id"] = pid
        out["wall_ms"] = wall_ms
        yield out


def extract_stage(input_df: DataFrame, n_partitions: int | None = None) -> DataFrame:
    """(url, html) -> page rows (PAGES_EXT schema).

    One empty sentinel row (page_no=0) per unparseable/empty document
    keeps per-url lineage intact for the metrics/resume layers.
    """
    spark = input_df.sparkSession
    n_partitions = n_partitions or spark.sparkContext.defaultParallelism * 2
    units = input_df.select("url", "html").mapInPandas(_split_pages_fn, PAGE_UNIT)
    # salted spread: uniform on (url, page_no) — a giant doc's pages scatter
    units = units.repartition(n_partitions, F.xxhash64("url", "page_no"))
    return units.mapInPandas(_layout_fn, PAGES_EXT)
