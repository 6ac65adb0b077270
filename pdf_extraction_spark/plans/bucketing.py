"""Bucketed (co-located) joins — the shuffle-free path for repeated
big-big joins.

At 100 TB the fact-to-fact joins (pages ⋈ chunks, chunks ⋈ vectors,
lineitem ⋈ orders) dominate shuffle volume if re-partitioned per
query.  Writing both sides bucketed by the join key pins an identical
hash partitioning in table metadata, so every subsequent equi-join on
that key is exchange-free: each task reads bucket i of both sides and
sort-merge-joins locally.  This is Spark's native DataSource bucketing
(spark.sql.sources.bucketing.enabled, on by default) — no Hive
required; the production deployment would use Iceberg's bucket
partition transform identically.

The shuffle is paid ONCE at write time and amortized over every
downstream join/aggregation on the same key — the right trade for
stage tables that are written once and queried many times.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame, table: str, key: str, n_buckets: int = 16,
    sort_within: bool = True,
) -> None:
    """Persist ``df`` as a bucketed (and bucket-sorted) managed table.

    Sorting within buckets lets the join skip its per-task sort too
    (SortMergeJoin consumes the bucket files' order directly)."""
    writer = df.write.mode("overwrite").bucketBy(n_buckets, key)
    if sort_within:
        writer = writer.sortBy(key)
    writer.saveAsTable(table)


def co_located_join(
    spark: SparkSession, left_table: str, right_table: str, key: str,
    how: str = "inner",
) -> DataFrame:
    """Join two tables bucketed on ``key``: with matching bucket counts
    the planner emits NO exchange on either side (assert with
    .explain(); tests/test_bucketing.py pins this)."""
    return spark.table(left_table).join(spark.table(right_table), key, how)
