"""Stage 4 regions tests: star tables vs the pure-Python spec
(text_pure parse_cell_value / extract_unit_hint / number_set_diff)."""

import pytest
from pyspark.sql import functions as F

from pdf_extraction_spark.functions import text_pure
from pdf_extraction_spark.operators import regions
from pdf_extraction_spark.operators.extract import extract_stage
from pdf_extraction_spark.sources.corpus import corpus_df

N_DOCS = 60


@pytest.fixture(scope="module")
def pages(spark):
    df = extract_stage(corpus_df(spark, N_DOCS)).persist()
    df.count()
    yield df
    df.unpersist()


def test_doc_tables_and_titles(pages):
    t = regions.doc_tables(pages).collect()
    assert len(t) > 10
    titled = [r for r in t if r["title"]]
    assert titled, "SPDF tables must get spatially-detected titles (J5)"
    assert all(r["n_cells"] >= 4 for r in t)


def test_cell_value_parse_matches_spec(pages):
    cells = regions.table_cells(pages).collect()
    assert len(cells) > 100
    n_numbers = 0
    for r in cells:
        val, unit, ctype = text_pure.parse_cell_value(r["content"])
        assert r["content_type"] == ctype, r["content"]
        if val is None:
            assert r["numeric_value"] is None
        else:
            n_numbers += 1
            assert float(r["numeric_value"]) == pytest.approx(val, abs=1e-4)
            # cell-level unit must match the spec; fallback (column/
            # global) applies only when the cell itself has no unit
            if unit:
                assert r["unit"] == unit[:50]
    assert n_numbers > 50


def test_unit_fallback_from_header(spark):
    """A cell with a bare number inherits the column/global unit
    inferred from the '단위' header (A5, load_to_db.py:108-126)."""
    rows = [
        ("u", 1, [
            {"table_index": 0, "title": None, "bbox": None, "cells": [
                {"row": 0, "col": 0, "text": "metric", "row_span": 1, "col_span": 1,
                 "row_header": False, "column_header": True},
                {"row": 0, "col": 1, "text": "fy2023 (단위: tCO2eq)", "row_span": 1,
                 "col_span": 1, "row_header": False, "column_header": True},
                {"row": 1, "col": 0, "text": "emissions", "row_span": 1, "col_span": 1,
                 "row_header": True, "column_header": False},
                {"row": 1, "col": 1, "text": "1,234.5", "row_span": 1, "col_span": 1,
                 "row_header": False, "column_header": False},
                {"row": 1, "col": 2, "text": "77 kg", "row_span": 1, "col_span": 1,
                 "row_header": False, "column_header": False},
            ]}
        ]),
    ]
    schema = (
        "url string, page_no int, tables array<struct<table_index:int,"
        "title:string,bbox:struct<left:double,right:double,top:double,"
        "bottom:double>,cells:array<struct<row:int,col:int,text:string,"
        "row_span:int,col_span:int,row_header:boolean,column_header:boolean>>>>"
    )
    df = spark.createDataFrame(rows, schema)
    got = {(r["row"], r["col"]): r for r in regions.table_cells(df).collect()}
    assert got[(1, 1)]["unit"] == "tCO2eq"          # column fallback
    assert float(got[(1, 1)]["numeric_value"]) == 1234.5
    assert got[(1, 2)]["unit"] == "kg"              # cell's own unit wins
    assert got[(0, 0)]["content_type"] == "text"


def test_number_diff_cross_check(pages):
    """Structured cells and rendered markdown rows are two extraction
    paths over the same table; their number sets must agree
    (table_diff.py semantics — empty diffs on a clean pipeline)."""
    diffs = regions.number_diff(pages).collect()
    assert diffs
    bad = [r for r in diffs if r["only_in_doc"] or r["only_in_ocr"]]
    assert bad == []


def test_unit_hint_spec_parity(spark):
    cases = [
        "(단위: tCO2eq)", "단위: kg", "억원 (MWh)", "plain text",
        "(1234)", "fy2023 (단위 %)", "금액 (십억원)",
    ]
    df = spark.createDataFrame([(c,) for c in cases], "content string")
    got = df.select(
        "content", regions._unit_hint(F.col("content")).alias("u")
    ).collect()
    for r in got:
        assert r["u"] == text_pure.extract_unit_hint(r["content"]), r["content"]
