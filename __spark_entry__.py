"""Driver contract for the spark-graft builder (PySpark target).

``queries()`` registers one entry per implemented operator from
SURVEY.md §2 (plus the training-data-pipeline operators: dedup,
similarity search, text analysis, multimodal); ``oracle_sql()``
carries the DuckDB-runnable ANSI twin of each.

Output discipline (so the driver's order-insensitive value-hash
matches): every aggregate/computed column is aliased identically on
both sides; money math runs in DECIMAL and is presented as DOUBLE;
derived doubles are rounded to 6 decimals; top-k orderings always
carry a unique tiebreaker column.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from pdf_extraction_spark.operators import retrieval
from pdf_extraction_spark.queries import (
    pipeline_ops,
    relational,
    relational2,
    retrieval2,
    spatial,
    text_ops,
)


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: hybrid retrieval (BM25 + deterministic semantic stub,
    0.6/0.4 min-max combined — reference search_vector_db.py hybrid
    mode) over the sf0.001 documents table."""
    docs = _t(spark, "/root/testdata/sf0.001", "documents")
    return retrieval.hybrid_search(
        docs, query="spark join table", top_k=10
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    out.update(relational.QUERIES)
    out.update(relational2.QUERIES)
    out.update(text_ops.QUERIES)
    out.update(retrieval2.QUERIES)
    out.update(spatial.QUERIES)
    out.update(pipeline_ops.QUERIES)
    assert len(out) <= 50, "driver records at most 50 correctness entries"
    return out


def oracle_sql() -> dict[str, str]:
    out: dict[str, str] = {}
    out.update(relational.ORACLE_SQL)
    out.update(relational2.ORACLE_SQL)
    out.update(text_ops.ORACLE_SQL)
    out.update(retrieval2.ORACLE_SQL)
    out.update(spatial.ORACLE_SQL)
    out.update(pipeline_ops.ORACLE_SQL)
    return out
