"""SparkSession factory tuned for the extraction engine.

Local mode here; the same configs are what we'd submit with
``spark-submit --py-files pdf_extraction_spark.zip`` on a cluster.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

from .constants import ARROW_MAX_RECORDS_PER_BATCH, DEFAULT_SHUFFLE_PARTITIONS


def build_session(
    app_name: str = "pdf_extraction_spark",
    cores: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession.

    ``cores=None`` -> ``local[*]``.  Shuffle partitions default to the
    core count (not Spark's 200) so small-scale runs don't drown in
    empty tasks; on a real cluster this is set to ~2-3x total cores.
    """
    if cores is None:
        env = os.environ.get("SPARK_GRAFT_CPUS")
        master = f"local[{env}]" if env else "local[*]"
    else:
        master = f"local[{cores}]"
    if shuffle_partitions is None:
        shuffle_partitions = int(
            os.environ.get("SPARK_SHUFFLE_PARTITIONS", DEFAULT_SHUFFLE_PARTITIONS)
        )

    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config(
            "spark.sql.execution.arrow.maxRecordsPerBatch",
            str(ARROW_MAX_RECORDS_PER_BATCH),
        )
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "16g"))
        # Spark 4's ICU-backed lower()/upper() stalls badly on large
        # heaps (profiled: 31/32 executor threads pinned in
        # CollationSupport$Lower.execBinaryICU, 30-50s for a 5k-line
        # aggregate; 1-9s with it off).  The engine's case mappings are
        # ASCII-range (Korean has no case; the DuckDB oracle gate
        # verifies equality), so the JVM fast path is semantics-safe.
        .config("spark.sql.icu.caseMappings.enabled", "false")
        # local mode: shuffles go through local disk — lz4 costs more
        # CPU than it saves (on a network cluster leave compression on)
        .config("spark.shuffle.compress", "false")
        .config("spark.shuffle.spill.compress", "false")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # stage tables are bucketed by url (plans/stage_store.py); joins
        # on (url, page_no, ...) are co-partitioned by the url subset,
        # which Spark only accepts with this off (default true demands
        # bucket keys == full join keys).  Semantically safe: same-url
        # rows are co-located, a superset equi-join never needs more.
        .config("spark.sql.requireAllClusterKeysForCoPartition", "false")
        # Scan-split sizing (guide §6): the shuffle-free small-document
        # extraction path gets its parallelism from input splits.
        # Round 5 pinned 8 MB splits ("many small waves"), which made an
        # 80 MB corpus into 128 mapInArrow tasks — each task pays a
        # Python-worker round-trip, so task overhead dominated the
        # layout stage (extract noop 5.1s at 8k docs, of which ~1s was
        # small-path task overhead).  Round 6: cap splits at 16 MB and
        # let Spark's own bytesPerCore floor (totalBytes /
        # defaultParallelism) size them BELOW the cap — small corpora
        # still get ~core-count waves, large corpora get fewer, larger
        # tasks, stage re-reads stop fragmenting (measured sweep of
        # 8/12/16/32 MB at 8k and 80k docs in OPTIMIZATION_r06.md;
        # an explicit core-count minPartitionNum floor was tried and
        # dropped — it re-fragmented the small committed-stage scans).
        .config("spark.sql.files.maxPartitionBytes", str(16 * 1024 * 1024))
        # Whole-stage-codegen class cache: the default 100 entries is
        # smaller than one pass of this engine's query surface, so a
        # session that alternates queries (the bench suite, a real
        # multi-query deployment) EVICTS every query's generated
        # classes between runs and re-pays janino compilation on every
        # execution — measured as a ~0.5-1.5s per-query tax: the warm
        # 12-query suite sum dropped 16.6 -> 12.5s (-25%) when raised
        # (OPTIMIZATION_r06.md).  5000 compiled classes is a few
        # hundred MB of metaspace at most; same value is appropriate on
        # a cluster driver/executors.
        .config("spark.sql.codegen.cache.maxEntries", "5000")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def stop_session() -> None:
    active = SparkSession.getActiveSession()
    if active is not None:
        active.stop()
