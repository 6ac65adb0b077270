"""End-to-end extraction pipeline orchestration.

One driver program replaces the reference's subprocess chain
(run_pipeline.py:35-49): stages are DataFrame->DataFrame functions,
each committed to a stage table (Iceberg stand-in, stage_store.py) so
a killed job resumes at the last committed snapshot (north_rule).

    extract  -> pages       (operators/extract.py, mapInArrow)
    patterns -> strip       (operators/boilerplate.py, pure Catalyst)
    ocr      -> ocr_text    (operators/ocr.py, flagged subset only)
    assemble -> doc_text    (operators/chunk.py)
    chunk    -> chunks
    metrics  -> per-partition lineage counters (north_star)
"""

from __future__ import annotations

import argparse
import time
import uuid

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..operators.boilerplate import boilerplate_patterns, strip_stage
from ..operators.chunk import assemble_documents, chunk_stage
from ..operators.extract import extract_stage
from ..operators.ocr import merge_ocr, ocr_stage
from . import stage_store

STAGES = ["pages", "page_text", "doc_text", "chunks", "metrics"]


def _strip(pages: DataFrame) -> DataFrame:
    """AQE-gated strip: the pattern side attaches with no join hint and
    adaptive execution converts to broadcast-hash at runtime iff the
    built (host, pats) side's ACTUAL shuffle bytes fit under
    autoBroadcastJoinThreshold.  Replaces the former driver-side
    ``distinct().count()`` cardinality gate — one whole extra job
    (~1s of the 8k-doc pipeline wall, a full pages scan at 10^12
    rows) — with the runtime size statistics AQE already collects
    (decision measured in tests/test_plans.py and the stage profile in
    NOTES; results are join-semantics-identical either way)."""
    return strip_stage(pages, boilerplate_patterns(pages), join_strategy="auto")


def _metrics_df(pages: DataFrame, run_id: str) -> DataFrame:
    return (
        pages.groupBy("partition_id")
        .agg(
            F.countDistinct("url").alias("urls_in"),
            F.countDistinct(F.when(F.col("page_no") > 0, F.col("url"))).alias("urls_ok"),
            F.sum(F.when(F.col("page_no") > 0, 1).otherwise(0)).alias("pages_out"),
            F.sum(F.col("ocr_triggered").cast("long")).alias("ocr_triggered"),
            F.sum(F.size("tables")).alias("tables_found"),
            F.sum("bytes_in").alias("bytes_in"),
            F.max("wall_ms").alias("wall_ms"),
        )
        .select(
            F.lit("extract").alias("stage"),
            "partition_id",
            "urls_in",
            "urls_ok",
            "pages_out",
            "ocr_triggered",
            "tables_found",
            "bytes_in",
            "wall_ms",
            F.lit(run_id).alias("run_id"),
        )
    )


def run_pipeline(
    spark: SparkSession,
    input_df: DataFrame,
    out_root: str,
    resume: bool = True,
    fail_after: str | None = None,
    run_id: str | None = None,
    bucketed_stages: tuple[str, ...] = ("chunks",),
) -> dict[str, DataFrame]:
    """Run (or resume) the pipeline; returns the stage DataFrames.

    ``fail_after`` kills the run after the named stage commits — the
    hook the resume test uses (SURVEY.md §5 item 4).

    ``bucketed_stages`` — which stages commit bucketed by url.  The
    default buckets only ``chunks`` (its downstream joins/aggs are all
    url-keyed); the page-granularity stages stay flat per the measured
    A/B in BENCH/STAGE_BUCKETING.md (tools/bench_stage_bucketing.py):
    their single-pass consumers key on host (strip) or are page-local
    (ocr), so the commit-time bucket sort buys nothing it doesn't cost.
    """
    run_id = run_id or uuid.uuid4().hex[:12]
    out: dict[str, DataFrame] = {}

    # GC swap leftovers up front: a prior run that died after its swap
    # landed but before rmtree leaves `.old-*` dirs that otherwise
    # accumulate forever in incremental deployments (recovery only GCs
    # when it actually has something to heal).  `.old-*` ONLY: a
    # not-yet-marked `.tmp-*` may belong to a LIVE out-of-process
    # writer, and deleting it mid-write would fail that writer's commit
    # (round-5 advice item 1); stale tmps are swept by the explicit
    # admin --gc path.
    stage_store.gc_all(out_root, kinds=("old",))

    if resume and stage_store.is_committed(out_root, "pages"):
        pages = stage_store.read_stage(spark, out_root, "pages")
    else:
        pages = stage_store.commit_stage(
            extract_stage(input_df), out_root, "pages", run_id,
            bucket_by=["url"] if "pages" in bucketed_stages else None,
        )
        stage_store.commit_stage(
            _metrics_df(pages, run_id), out_root, "metrics", run_id
        )
    out["pages"] = pages
    out["metrics"] = stage_store.read_stage(spark, out_root, "metrics")
    if fail_after == "pages":
        raise RuntimeError("injected failure after stage 'pages'")

    if resume and stage_store.is_committed(out_root, "page_text"):
        page_text = stage_store.read_stage(spark, out_root, "page_text")
    else:
        stripped = _strip(pages)
        page_text = stage_store.commit_stage(
            merge_ocr(stripped, ocr_stage(pages)), out_root, "page_text", run_id,
            bucket_by=["url"] if "page_text" in bucketed_stages else None,
        )
    out["page_text"] = page_text
    if fail_after == "page_text":
        raise RuntimeError("injected failure after stage 'page_text'")

    if resume and stage_store.is_committed(out_root, "doc_text"):
        doc_text = stage_store.read_stage(spark, out_root, "doc_text")
    else:
        doc_text = stage_store.commit_stage(
            assemble_documents(page_text), out_root, "doc_text", run_id,
            bucket_by=["url"] if "doc_text" in bucketed_stages else None,
        )
    out["doc_text"] = doc_text
    if fail_after == "doc_text":
        raise RuntimeError("injected failure after stage 'doc_text'")

    if resume and stage_store.is_committed(out_root, "chunks"):
        chunks = stage_store.read_stage(spark, out_root, "chunks")
    else:
        chunks = stage_store.commit_stage(
            chunk_stage(doc_text), out_root, "chunks", run_id,
            bucket_by=["url"] if "chunks" in bucketed_stages else None,
        )
    out["chunks"] = chunks
    return out


def run_vector_build(
    spark: SparkSession,
    out_root: str,
    run_id: str | None = None,
) -> dict[str, DataFrame]:
    """Vector-DB build over committed pipeline stages — the reference's
    separate build_vector_db.py job: typed chunks (page_text/table/
    figure, source_type-tagged) -> deterministic hash embeddings + LSH
    bucket, committed as ``typed_chunks`` and ``chunk_vectors`` stages.
    Retrieval (chunk_hybrid_search / ANN) then runs over these tables.
    """
    from ..operators.chunk import typed_chunk_stage
    from ..operators.embed import embed_stage
    from ..operators.similarity import bucket_col

    run_id = run_id or uuid.uuid4().hex[:12]
    pages = stage_store.read_stage(spark, out_root, "pages")
    page_text = stage_store.read_stage(spark, out_root, "page_text")

    # Both vector tables commit BUCKETED by url (stage_store bucket
    # spec in the marker): retrieval's chunk->page aggregations and the
    # typed_chunks <-> chunk_vectors joins over the committed snapshots
    # are then exchange-free (tests/test_bucketing.py pins the plans),
    # and the chunk_vectors write itself re-reads an already-url-
    # clustered table so even the commit shuffle is paid only once.
    typed = stage_store.commit_stage(
        typed_chunk_stage(page_text, pages), out_root, "typed_chunks", run_id,
        bucket_by=["url"],
    )
    from ..operators.embed import EMBED_DIM

    vectors = stage_store.commit_stage(
        embed_stage(typed).withColumn(
            "bucket", bucket_col("embedding", dim=EMBED_DIM)
        ),
        out_root,
        "chunk_vectors",
        run_id,
        bucket_by=["url"],
    )
    return {"typed_chunks": typed, "chunk_vectors": vectors}


def run_incremental(
    spark: SparkSession,
    input_df: DataFrame,
    out_root: str,
    run_id: str | None = None,
) -> dict[str, DataFrame]:
    """Incremental re-run: extract urls that are NEW (absent from the
    committed pages stage) or CHANGED (stored input content hash
    differs — the reference's ON DUPLICATE KEY UPDATE,
    load_to_db.py:338-364).  New rows upsert into the pages stage
    (MERGE semantics: a changed url replaces its old rows, never
    duplicates them).

    Downstream text stages recompute HOST-SCOPED, not corpus-wide: the
    boilerplate pattern set is per-host, so only hosts that received
    new/changed pages can produce different strip output — those
    hosts' pages re-strip/re-assemble/re-chunk and MERGE into the
    committed stages; every other host's rows survive the increment
    untouched (the cluster-scale form of the reference's per-page
    skip-if-exists resume, table_ocr.py:312-313, figure_ocr.py:262-264,
    table_diff.py:153-155).  The OCR kernel is page-local (host
    patterns never touch it), so within an affected host only the
    changed urls re-OCR; unchanged urls' OCR rows are reused from the
    committed snapshot.  An empty increment is a full no-op — no stage
    is rewritten."""
    run_id = run_id or uuid.uuid4().hex[:12]
    if not stage_store.is_committed(out_root, "pages"):
        return run_pipeline(spark, input_df, out_root, resume=True, run_id=run_id)
    stage_store.gc_all(out_root, kinds=("old",))  # same leftover hygiene as run_pipeline

    committed = stage_store.read_stage(spark, out_root, "pages")
    # MUST be the exact expression extract_stage stamps (extract.py:94,
    # 260) — a bare md5("html") maps null payloads to null, and
    # eqNullSafe would then flag every null-payload url as changed on
    # every run, so incremental never converges to a no-op for them
    inp_h = input_df.select(
        "url", F.md5(F.coalesce("html", F.lit(b""))).alias("content_hash")
    )
    new_urls = inp_h.join(
        committed.select("url").distinct(), "url", "left_anti"
    ).select("url")
    if "content_hash" in committed.columns:
        # change detection against the hash the extract UDF stamped on
        # the committed pages — no extra scan of either corpus
        old_h = committed.select(
            "url", F.col("content_hash").alias("_old")
        ).distinct()
        changed_urls = (
            inp_h.join(old_h, "url")
            .filter(~F.col("content_hash").eqNullSafe(F.col("_old")))
            .select("url")
        )
        todo = new_urls.unionByName(changed_urls).distinct()
    else:  # legacy stage dir without hashes: presence-only detection
        todo = new_urls
    # every plan below depends on the very parquet dir the upsert swaps
    # out; localCheckpoint materializes the increment BEFORE the
    # rewrite so no plan re-reads a replaced snapshot (Iceberg's
    # snapshot isolation makes this a non-issue in prod)
    todo = todo.localCheckpoint()
    downstream_committed = all(
        stage_store.is_committed(out_root, s)
        for s in ("page_text", "doc_text", "chunks")
    )
    if todo.isEmpty() and downstream_committed:
        # nothing new, nothing changed: the increment is a pure no-op
        return {
            s: stage_store.read_stage(spark, out_root, s) for s in STAGES
        }

    new_input = input_df.join(todo, "url", "left_semi")
    new_pages = extract_stage(new_input).localCheckpoint()
    metrics_inc = _metrics_df(new_pages, run_id).withColumn(
        "stage", F.lit("extract_increment")
    )
    pages = stage_store.upsert_stage(new_pages, out_root, "pages", run_id, ["url"])
    stage_store.append_stage(metrics_inc, out_root, "metrics", run_id)

    out: dict[str, DataFrame] = {"pages": pages}
    out["metrics"] = stage_store.read_stage(spark, out_root, "metrics")

    if not downstream_committed:
        # a prior run died before the text stages committed: no
        # committed snapshot to merge into — compute them corpus-wide
        stripped = _strip(pages)
        page_text = stage_store.commit_stage(
            merge_ocr(stripped, ocr_stage(pages)), out_root, "page_text", run_id
        )
        out["page_text"] = page_text
        doc_text = stage_store.commit_stage(
            assemble_documents(page_text), out_root, "doc_text", run_id
        )
        out["doc_text"] = doc_text
        out["chunks"] = stage_store.commit_stage(
            chunk_stage(doc_text), out_root, "chunks", run_id,
            bucket_by=["url"],
        )
        return out

    # ---- host-scoped downstream merge ----
    affected_hosts = new_pages.select("host").distinct().localCheckpoint()
    sub_pages = pages.join(affected_hosts, "host", "left_semi")
    affected_urls = sub_pages.select("url").distinct().localCheckpoint()

    # strip over ALL affected-host pages (their pattern sets shifted);
    # OCR only the changed urls (page-local kernel) + reuse the
    # committed OCR rows of the host's unchanged urls
    committed_pt = stage_store.read_stage(spark, out_root, "page_text")
    reused_ocr = (
        committed_pt.filter(F.col("ocr_triggered"))
        .join(affected_urls, "url", "left_semi")
        .join(todo, "url", "left_anti")
    )
    pt_inc = (
        merge_ocr(_strip(sub_pages), ocr_stage(new_pages))
        .unionByName(reused_ocr)
        .localCheckpoint()
    )
    out["page_text"] = stage_store.upsert_stage(
        pt_inc, out_root, "page_text", run_id, ["url"], delete_scope=affected_urls
    )
    dt_inc = assemble_documents(pt_inc).localCheckpoint()
    out["doc_text"] = stage_store.upsert_stage(
        dt_inc, out_root, "doc_text", run_id, ["url"], delete_scope=affected_urls
    )
    ch_inc = chunk_stage(dt_inc).localCheckpoint()
    out["chunks"] = stage_store.upsert_stage(
        ch_inc, out_root, "chunks", run_id, ["url"], delete_scope=affected_urls
    )
    return out


def page_lookup(
    spark: SparkSession, out_root: str, url: str, page_no: int
) -> DataFrame:
    """Debug lookup surface (reference debug_page_summary.py:14-39: a
    (doc_id, page_no) metadata-filtered get on the page collection):
    every committed chunk for one page with its metadata columns —
    equality predicates push down to the typed_chunks parquet scan, so
    at 100 TB this is a pruned point read, not a table scan."""
    return (
        stage_store.read_stage(spark, out_root, "typed_chunks")
        .filter((F.col("url") == url) & (F.col("page_no") == page_no))
        .select("url", "page_no", "chunk_id", "source_type", "chunk_text")
        .orderBy("source_type", "chunk_id")
    )


def main() -> int:
    from ..oracle import extract_corpus
    from ..session import build_session
    from ..sources.corpus import corpus_df, generate_corpus

    ap = argparse.ArgumentParser(description="run the extraction pipeline on a synthetic corpus and check against the oracle")
    ap.add_argument("--n-docs", type=int, default=200)
    ap.add_argument("--out", default="/root/repo/.work/pipeline")
    ap.add_argument("--no-resume", action="store_true")
    ap.add_argument("--fail-after", default=None)
    ap.add_argument("--skip-oracle", action="store_true")
    ap.add_argument("--vectors", action="store_true",
                    help="also run the vector-DB build (typed chunks + embeddings)")
    args = ap.parse_args()

    spark = build_session("pipeline")
    t0 = time.monotonic()
    inp = corpus_df(spark, args.n_docs)
    out = run_pipeline(
        spark, inp, args.out, resume=not args.no_resume, fail_after=args.fail_after
    )
    for name in ["pages", "page_text", "doc_text", "chunks"]:
        print(f"{name}: {out[name].count()} rows")
    if args.vectors:
        vec = run_vector_build(spark, args.out)
        for name in ["typed_chunks", "chunk_vectors"]:
            print(f"{name}: {vec[name].count()} rows")
    print(f"wall: {time.monotonic() - t0:.1f}s")

    if not args.skip_oracle:
        got = {r["url"]: r["extracted_text"] for r in out["doc_text"].collect()}
        exp = extract_corpus(generate_corpus(args.n_docs))
        n_match = sum(
            1 for url, v in exp.items() if got.get(url, "") == v["text"]
        )
        nonempty = sum(1 for v in exp.values() if v["text"])
        print(f"oracle match: {n_match}/{len(exp)} urls byte-identical "
              f"({nonempty} non-empty); rate={n_match / len(exp):.4f}")
        if n_match != len(exp):
            for url, v in list(exp.items()):
                if got.get(url, "") != v["text"]:
                    print("MISMATCH", url)
                    g, e = got.get(url, ""), v["text"]
                    for i, (a, b) in enumerate(zip(e.splitlines(), g.splitlines())):
                        if a != b:
                            print("  first diff line", i)
                            print("  oracle:", a[:120])
                            print("  spark :", b[:120])
                            break
                    else:
                        print("  length oracle", len(e), "spark", len(g))
                    break
            return 1
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
