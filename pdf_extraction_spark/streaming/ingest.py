"""Structured Streaming extension: incremental ingestion of new
corpus partitions.

The reference is batch-only (SURVEY.md §2.8); its skip-if-exists
re-runs map to incremental batch.  This module is the idiomatic Spark
extension: a file-source stream over the input table directory with
`Trigger.AvailableNow`-style draining, url dedup across batches, and a
watermarked per-host page-rate aggregate — the shapes a continuous
Common-Crawl ingest needs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..schemas import INPUT


def stream_source(spark: SparkSession, path: str) -> DataFrame:
    return (
        spark.readStream.schema(INPUT)
        .option("maxFilesPerTrigger", 8)
        .parquet(path)
    )


def dedup_new_urls(stream: DataFrame) -> DataFrame:
    """Exactly-once per url across the stream (state-backed)."""
    return stream.withWatermark("warc_ts", "1 hour").dropDuplicates(["url"])


def host_rate_agg(stream: DataFrame) -> DataFrame:
    """Windowed per-host ingest counts with late-data watermark."""
    host = F.regexp_extract("url", r"https?://([^/]+)/", 1)
    return (
        stream.withWatermark("warc_ts", "30 minutes")
        .groupBy(F.window("warc_ts", "10 minutes"), host.alias("host"))
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.octet_length("html")).alias("bytes_in"),
        )
    )


def run_available_now(
    spark: SparkSession, in_path: str, out_path: str, checkpoint: str
):
    """Drain everything currently available into the committed corpus
    table, dedup'd by url; returns the query (caller awaits)."""
    stream = dedup_new_urls(stream_source(spark, in_path))
    return (
        stream.writeStream.outputMode("append")
        .format("parquet")
        .option("path", out_path)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
