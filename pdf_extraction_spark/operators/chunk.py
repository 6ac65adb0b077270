"""Stage 5 — CHUNK: document text -> (url, span_start, span_end,
chunk_text) rows (the north_star RAG-chunking stage).

Re-expresses the reference's RecursiveCharacterTextSplitter usage
(build_vector_db.py:369-373,399-403) as exact substring spans.  Span
computation is a vectorized pandas UDF returning an array of structs;
the substring materialization stays JVM-side so chunk bytes never
round-trip through Python — and the invariant
``chunk_text == substring(extracted_text, start+1, end-start)`` is
enforced by construction.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T

from ..functions.text_pure import chunk_spans

SPAN = T.ArrayType(
    T.StructType(
        [
            T.StructField("start", T.IntegerType(), False),
            T.StructField("end", T.IntegerType(), False),
        ]
    )
)


@F.pandas_udf(SPAN)
def _spans_udf(texts: pd.Series) -> pd.Series:
    return texts.map(
        lambda t: [
            {"start": s, "end": e} for s, e in chunk_spans(t or "")
        ]
    )


def assemble_documents(page_text: DataFrame) -> DataFrame:
    """pages -> (url, extracted_text): non-empty page texts joined with
    a blank line, page order (oracle spec step 8)."""
    return (
        page_text.filter(F.length(F.coalesce("page_text", F.lit(""))) > 0)
        .groupBy("url")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("page_no", "page_text"))),
                    lambda s: s["page_text"],
                ),
                "\n\n",
            ).alias("extracted_text")
        )
    )


def chunk_stage(documents: DataFrame) -> DataFrame:
    """(url, extracted_text) -> chunk rows."""
    spans = documents.select(
        "url",
        "extracted_text",
        F.explode(_spans_udf(F.col("extracted_text"))).alias("span"),
    )
    return spans.select(
        "url",
        F.col("span.start").alias("span_start"),
        F.col("span.end").alias("span_end"),
        F.expr(
            "substring(extracted_text, span.start + 1, span.end - span.start)"
        ).alias("chunk_text"),
    )


def typed_chunk_stage(page_text: DataFrame, pages: DataFrame) -> DataFrame:
    """The reference vector DB's THREE chunk sources, tagged
    ``source_type`` with doc/page/region ids (build_vector_db.py:473-527,
    metadata at :354-366):

    * page_text — the separator-aware splitter over each page's
      stripped text (posexplode keeps the span index as chunk_id);
    * table     — title + row-major cell text per detected table;
    * figure    — caption + description per detected figure.

    -> (url, page_no, chunk_id, source_type, chunk_text).  chunk_id is
    unique within (url, page_no, source_type); region chunks offset by
    region_index.  Table/figure text is pure Catalyst over the nested
    page structs (no Python, no shuffle); only the page splitter uses
    the pandas UDF, same as chunk_stage.
    """
    pg = (
        page_text.filter(F.length(F.coalesce("page_text", F.lit(""))) > 0)
        .select(
            "url", "page_no", "page_text",
            F.posexplode(_spans_udf(F.col("page_text"))).alias("pos", "span"),
        )
        .select(
            "url",
            "page_no",
            F.col("pos").cast("long").alias("chunk_id"),
            F.lit("page_text").alias("source_type"),
            F.expr(
                "substring(page_text, span.start + 1, span.end - span.start)"
            ).alias("chunk_text"),
        )
    )
    body = pages.filter(F.col("page_no") > 0)
    tables = (
        body.select("url", "page_no", F.explode("tables").alias("t"))
        .select(
            "url",
            "page_no",
            F.col("t.table_index").cast("long").alias("chunk_id"),
            F.lit("table").alias("source_type"),
            F.trim(
                F.concat_ws(
                    " ",
                    F.coalesce(F.col("t.title"), F.lit("")),
                    F.array_join(
                        F.transform("t.cells", lambda c: c["text"]), " "
                    ),
                )
            ).alias("chunk_text"),
        )
        .filter(F.length("chunk_text") > 0)
    )
    figures = (
        body.select("url", "page_no", F.explode("figures").alias("f"))
        .select(
            "url",
            "page_no",
            F.col("f.figure_index").cast("long").alias("chunk_id"),
            F.lit("figure").alias("source_type"),
            F.trim(
                F.concat_ws(
                    " ",
                    F.coalesce(F.col("f.caption"), F.lit("")),
                    F.coalesce(F.col("f.description"), F.lit("")),
                )
            ).alias("chunk_text"),
        )
        .filter(F.length("chunk_text") > 0)
    )
    return pg.unionByName(tables).unionByName(figures)
