"""Co-located bucketed joins: the write-once shuffle buys exchange-free
equi-joins on the bucket key forever after."""

import pytest
from pyspark.sql import functions as F

from pdf_extraction_spark.plans.bucketing import co_located_join, write_bucketed


@pytest.fixture(scope="module")
def bucketed(spark):
    orders = spark.range(5000).select(
        F.col("id").alias("o_orderkey"),
        (F.col("id") % 97).alias("o_custkey"),
        (F.col("id") * 3 % 1000).cast("double").alias("o_totalprice"),
    )
    lineitem = spark.range(20000).select(
        (F.col("id") % 5000).alias("o_orderkey"),
        (F.col("id") % 7 + 1).alias("l_quantity"),
    )
    write_bucketed(orders, "bkt_orders", "o_orderkey", n_buckets=8)
    write_bucketed(lineitem, "bkt_lineitem", "o_orderkey", n_buckets=8)
    yield
    spark.sql("DROP TABLE IF EXISTS bkt_orders")
    spark.sql("DROP TABLE IF EXISTS bkt_lineitem")


def test_bucketed_join_has_no_exchange(spark, bucketed):
    """Both sides bucketed on the join key with equal bucket counts:
    the sort-merge join runs with ZERO exchanges (and zero per-task
    sorts, because the buckets are written sorted)."""
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = co_located_join(spark, "bkt_lineitem", "bkt_orders", "o_orderkey")
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan
        # correctness: same result as the plain (shuffled) join
        n = j.count()
        assert n == 20000  # every lineitem row matches exactly one order
        # and an aggregation on the bucket key is exchange-free too
        agg = spark.table("bkt_lineitem").groupBy("o_orderkey").agg(
            F.sum("l_quantity").alias("q")
        )
        aplan = agg._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in aplan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_vector_build_stages_commit_bucketed(spark, work_dir):
    """The REAL pipeline commits (run_vector_build + the chunks stage)
    go through the bucketed stage store: reading the committed
    typed_chunks / chunk_vectors snapshots back, the chunk->vector join
    on (url, page_no, chunk_id, source_type) and the per-(url, page_no)
    aggregation both plan with ZERO Exchange — the r3 idiom demo wired
    into the production path (VERDICT r3 item 1)."""
    from pdf_extraction_spark.plans import stage_store
    from pdf_extraction_spark.plans.pipeline import run_pipeline, run_vector_build
    from pdf_extraction_spark.sources.corpus import corpus_df

    root = f"{work_dir}/bucketed_stages"
    run_pipeline(spark, corpus_df(spark, 40), root, resume=False, run_id="b1")
    run_vector_build(spark, root, run_id="b1")

    for stage in ("chunks", "typed_chunks", "chunk_vectors"):
        info = stage_store.marker_info(root, stage)
        assert info["bucket"]["keys"] == ["url"], stage

    typed = stage_store.read_stage(spark, root, "typed_chunks")
    vectors = stage_store.read_stage(spark, root, "chunk_vectors")
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        key = ["url", "page_no", "chunk_id", "source_type"]
        j = typed.join(vectors.select(*key, "embedding", "bucket"), key)
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan and "Exchange" not in plan
        assert j.count() == typed.count() > 0

        agg = vectors.groupBy("url", "page_no").agg(F.count("*").alias("n"))
        aplan = agg._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in aplan
        assert agg.count() > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)

    # upsert keeps the stage bucketed (incremental path re-clusters)
    sample = typed.limit(5).localCheckpoint()
    up = stage_store.upsert_stage(sample, root, "typed_chunks", "b2", ["url"])
    info = stage_store.marker_info(root, "typed_chunks")
    assert info["bucket"]["keys"] == ["url"]
    uplan = (
        up.groupBy("url").agg(F.count("*").alias("n"))
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in uplan

    # append on a bucketed stage must refuse (would break clustering)
    import pytest as _pytest
    with _pytest.raises(ValueError, match="bucketed"):
        stage_store.append_stage(sample, root, "typed_chunks", "b3")


def test_unbucketed_baseline_does_shuffle(spark, bucketed):
    """Sanity: the same join over unbucketed data DOES exchange — the
    bucketed plan's advantage is real, not a planner default."""
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        a = spark.table("bkt_lineitem").repartition(5)
        b = spark.table("bkt_orders").repartition(5)
        plan = a.join(b, "o_orderkey")._jdf.queryExecution().executedPlan().toString()
        assert "Exchange hashpartitioning" in plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_pipeline_bucketed_stages_knob_is_byte_identical(spark, work_dir):
    """The bucketed_stages knob (kept for read-mix-differing
    deployments after BENCH/STAGE_BUCKETING.md rejected it as the
    default) must not change RESULTS: running every stage bucketed
    yields byte-identical doc_text to the flat default, and the page
    stages carry bucket specs in their markers."""
    from pdf_extraction_spark.plans import stage_store
    from pdf_extraction_spark.plans.pipeline import run_pipeline
    from pdf_extraction_spark.sources.corpus import corpus_df

    inp = corpus_df(spark, 20)
    flat_root = f"{work_dir}/knob_flat"
    bkt_root = f"{work_dir}/knob_bucketed"
    flat = run_pipeline(spark, inp, flat_root, resume=False, run_id="kf")
    bkt = run_pipeline(
        spark, inp, bkt_root, resume=False, run_id="kb",
        bucketed_stages=("pages", "page_text", "doc_text", "chunks"),
    )
    for stage in ("pages", "page_text", "doc_text"):
        assert stage_store.marker_info(bkt_root, stage)["bucket"]["keys"] == ["url"]
        assert stage_store.marker_info(flat_root, stage).get("bucket") is None
    a = {r.url: r.extracted_text for r in flat["doc_text"].collect()}
    b = {r.url: r.extracted_text for r in bkt["doc_text"].collect()}
    assert a == b and len(a) > 0
