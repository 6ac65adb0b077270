"""Stage 2 — BOILERPLATE: corpus-level prefix aggregation + strip.

Distributed form of the reference's analyze_batch_patterns + token
reduction (structured_extract.py:53-99,361-381).  The reference scopes
the pattern set per converted batch of one PDF; at web scale the group
is the url's host (SURVEY.md §7.4 item 2) — bounded per-host pattern
sets that broadcast cleanly.

Everything here is Catalyst expressions — zero Python UDFs (north_rule:
no per-row Python).  The normalize_line unescape step
(structured_extract.py:44) is a no-op by construction: both extractors
(HTML parser, SPDF format spec) emit already-unescaped text, so the
JVM-side regex chain is exactly equivalent.

Plan shape: explode lines -> distinct (host, page, prefix) ->
count per (host, prefix) [partial+final hash agg] -> HAVING
count >= max(3, int(0.2*n_pages)) -> broadcast anti-join back onto the
lines -> re-assemble page text ordered by line index.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from ..constants import (
    IMAGE_PLACEHOLDER,
    MIN_NORM_LEN,
    MIN_PATTERN_PAGES,
    PATTERN_PAGE_FRACTION,
    PREFIX_LEN,
)


def normalize_line_col(col):
    """Catalyst twin of oracle.normalize_line / structured_extract.py:41-50:
    digits->N, whitespace collapse, strip, lower (same order)."""
    masked = F.regexp_replace(col, r"\d+", "N")
    collapsed = F.regexp_replace(masked, r"\s+", " ")
    return F.lower(F.trim(collapsed))


def prefix_col(col):
    return F.substring(normalize_line_col(col), 1, PREFIX_LEN)


def boilerplate_patterns(pages: DataFrame) -> DataFrame:
    """pages (url, host, page_no, md, ocr_triggered) ->
    (host, prefix) rows to strip.  A1 (distinct-per-page count) + A2
    (HAVING threshold)."""
    body = pages.filter((F.col("page_no") > 0) & ~F.col("ocr_triggered"))
    page_counts = body.groupBy("host").agg(
        F.count(F.lit(1)).alias("n_pages")
    )
    lines = body.select(
        "host",
        "url",
        "page_no",
        F.explode(F.split(F.col("md"), "\n")).alias("line"),
    ).select("host", "url", "page_no", F.trim("line").alias("line"))
    qual = lines.filter(
        (F.length("line") > 0)
        & ~F.contains(F.lower("line"), F.lit(IMAGE_PLACEHOLDER.lower()))
    ).select(
        "host",
        "url",
        "page_no",
        normalize_line_col(F.col("line")).alias("norm"),
    ).filter(F.length("norm") >= MIN_NORM_LEN)
    prefix_pages = qual.select(
        "host", "url", "page_no", F.substring("norm", 1, PREFIX_LEN).alias("prefix")
    ).distinct()
    counts = prefix_pages.groupBy("host", "prefix").count()
    return (
        counts.join(page_counts, "host")
        .filter(F.col("n_pages") >= MIN_PATTERN_PAGES)
        .filter(
            F.col("count")
            >= F.greatest(
                F.lit(MIN_PATTERN_PAGES),
                F.floor(F.col("n_pages") * F.lit(PATTERN_PAGE_FRACTION)).cast("long"),
            )
        )
        .select("host", "prefix")
    )


def strip_stage(pages: DataFrame, patterns: DataFrame | None = None) -> DataFrame:
    """pages -> (url, page_no, page_text, ocr_triggered) with common
    prefixes removed (never [IMAGE] lines; OCR pages pass through with
    null text — Stage 3 fills them)."""
    if patterns is None:
        patterns = boilerplate_patterns(pages)

    body = pages.filter((F.col("page_no") > 0) & ~F.col("ocr_triggered"))
    lines = body.select(
        "host",
        "url",
        "page_no",
        F.posexplode(F.split(F.col("md"), "\n")).alias("line_idx", "line"),
    )
    is_image = F.contains(F.lower("line"), F.lit(IMAGE_PLACEHOLDER.lower()))
    keyed = lines.withColumn(
        "prefix", F.when(~is_image, prefix_col(F.col("line")))
    )  # null prefix for [IMAGE] lines -> never matches the anti-join
    kept = keyed.join(F.broadcast(patterns), ["host", "prefix"], "left_anti")
    rebuilt = (
        kept.groupBy("url", "page_no")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("line_idx", "line"))),
                    lambda s: s["line"],
                ),
                "\n",
            ).alias("joined")
        )
        .select("url", "page_no", F.trim(F.col("joined")).alias("page_text"))
    )
    # pages whose every line was stripped vanish from `rebuilt`; restore
    # them (and OCR pages) via left join from the full page set
    return (
        pages.filter(F.col("page_no") > 0)
        .select("url", "page_no", "ocr_triggered")
        .join(rebuilt, ["url", "page_no"], "left")
        .select(
            "url",
            "page_no",
            F.when(F.col("ocr_triggered"), F.lit(None)).otherwise(
                F.coalesce("page_text", F.lit(""))
            ).alias("page_text"),
            "ocr_triggered",
        )
    )
