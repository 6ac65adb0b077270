"""Measure-then-decide bucketing for the page-granularity stages
(round-4 verdict item 2 / builder backlog #4).

Round 4 wired bucketed commits into the chunk/vector stages, whose
downstream joins and aggregations are all url-keyed.  The remaining
question: should ``pages`` / ``page_text`` / ``doc_text`` commit
bucketed by url too?  Their single-pass consumers key on host (strip)
or are page-local (ocr), but resume/incremental deployments RE-READ
them — assemble_documents' groupBy(url) over a committed page_text and
upsert merges are the workloads that could win.

Protocol (the DEDUP_FORMS / BM25_FORMS discipline):
  * two forms — ``flat`` (current default: only chunks bucketed) and
    ``bucketed`` (all four stages bucketed by url) — INTERLEAVED per
    round so host drift hits both alike; >= 5 rounds; quiet-window
    loadavg gate before each round; medians reported with every raw
    run;
  * per round and form: full-pipeline wall (fresh stage root), the
    resume-path consumer (assemble over the committed page_text), and
    an incremental upsert of ~5% of urls into pages + page_text;
  * plan shape (Exchange count) for the re-read consumer per form;
  * shuffle write bytes per form from a per-form event-log subprocess.

Results land in BENCH/stage_bucketing.json + BENCH/STAGE_BUCKETING.md;
the decision rule (pre-registered): bucket a page-granularity stage IFF
the bucketed form's full-pipeline median is <= 5% slower AND either the
re-read consumer or the upsert path is >= 10% faster.  Otherwise the
default stays flat and this artifact records why.

Usage:
  taskset -c 0-15 python tools/bench_stage_bucketing.py [--rounds 5]
  python tools/bench_stage_bucketing.py --one <flat|bucketed>  # eventlog helper
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import shutil
import statistics
import subprocess
import sys
import time

sys.path.insert(0, "/root/repo")

N_DOCS = 2000
CORPUS = f"/root/repo/.work/bench_corpus_v1_{N_DOCS}"
WORK = "/root/repo/.work/stage_bucketing"

FORMS = {
    "flat": ("chunks",),
    "bucketed": ("pages", "page_text", "doc_text", "chunks"),
}


def _corpus(spark):
    if not os.path.exists(os.path.join(CORPUS, "_SUCCESS")):
        from pdf_extraction_spark.sources.corpus_v1 import write_corpus

        write_corpus(spark, CORPUS, N_DOCS)
    return spark.read.parquet(CORPUS)


def _noop(df) -> None:
    df.write.mode("overwrite").format("noop").save()


def _run_form(spark, form: str, root: str) -> dict:
    """One full pipeline + the re-read/upsert consumers; returns wall
    times for each measured leg."""
    from pyspark.sql import functions as F

    from pdf_extraction_spark.operators.chunk import assemble_documents
    from pdf_extraction_spark.plans import stage_store
    from pdf_extraction_spark.plans.pipeline import run_pipeline

    inp = _corpus(spark)
    shutil.rmtree(root, ignore_errors=True)
    t0 = time.monotonic()
    run_pipeline(spark, inp, root, resume=False, run_id=f"{form}-r",
                 bucketed_stages=FORMS[form])
    pipeline_s = time.monotonic() - t0

    # resume-path consumer: a fresh reader re-reads the committed
    # page_text and assembles per-url documents (groupBy url)
    t0 = time.monotonic()
    _noop(assemble_documents(stage_store.read_stage(spark, root, "page_text")))
    assemble_s = time.monotonic() - t0

    # incremental merge: ~5% of urls re-land in pages AND page_text
    # (the upsert rewrite is where a bucketed stage pays re-clustering)
    pages = stage_store.read_stage(spark, root, "pages")
    some_urls = (
        pages.select("url").distinct().orderBy("url")
        .limit(max(1, N_DOCS // 20))
    )
    inc = pages.join(some_urls, "url", "left_semi").localCheckpoint()
    pt = stage_store.read_stage(spark, root, "page_text")
    pt_inc = pt.join(some_urls, "url", "left_semi").localCheckpoint()
    t0 = time.monotonic()
    stage_store.upsert_stage(inc, root, "pages", f"{form}-u", ["url"])
    stage_store.upsert_stage(pt_inc, root, "page_text", f"{form}-u", ["url"])
    upsert_s = time.monotonic() - t0
    return {
        "pipeline_s": round(pipeline_s, 3),
        "assemble_reread_s": round(assemble_s, 3),
        "upsert_5pct_s": round(upsert_s, 3),
    }


def _plan_shape(spark, form: str, root: str) -> dict:
    from pdf_extraction_spark.operators.chunk import assemble_documents
    from pdf_extraction_spark.plans import stage_store

    df = assemble_documents(stage_store.read_stage(spark, root, "page_text"))
    p = df._jdf.queryExecution().executedPlan().toString()
    return {"assemble_exchanges": p.count("Exchange")}


def run_one_with_eventlog(form: str) -> None:
    """Subprocess helper: one full pipeline with the event log on;
    prints total shuffle write bytes."""
    from pdf_extraction_spark.plans.pipeline import run_pipeline
    from pdf_extraction_spark.session import build_session

    logdir = f"/root/repo/.work/eventlog_stage_{form}"
    shutil.rmtree(logdir, ignore_errors=True)
    os.makedirs(logdir, exist_ok=True)
    spark = build_session(
        f"shuffle-stage-{form}", cores=16, shuffle_partitions=16,
        extra_conf={"spark.eventLog.enabled": "true",
                    "spark.eventLog.dir": f"file://{logdir}",
                    "spark.eventLog.compress": "false"},
    )
    root = f"{WORK}/eventlog_{form}"
    shutil.rmtree(root, ignore_errors=True)
    run_pipeline(spark, _corpus(spark), root, resume=False,
                 run_id=f"{form}-el", bucketed_stages=FORMS[form])
    spark.stop()
    total = 0
    paths = [p for p in glob.glob(f"{logdir}/**/*", recursive=True)
             if os.path.isfile(p) and "appstatus" not in os.path.basename(p)]
    for path in paths:
        with open(path, encoding="utf-8") as fh:
            for line in fh:
                if '"Event":"SparkListenerTaskEnd"' not in line:
                    continue
                ev = json.loads(line)
                m = (ev.get("Task Metrics") or {}).get("Shuffle Write Metrics") or {}
                total += int(m.get("Shuffle Bytes Written") or 0)
    print(json.dumps({"form": form, "shuffle_bytes_written": total}))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rounds", type=int, default=5)
    ap.add_argument("--cpus", type=int, default=16)
    ap.add_argument("--one", default=None, help="eventlog helper form")
    ap.add_argument("--skip-shuffle-bytes", action="store_true")
    args = ap.parse_args()
    if args.one:
        run_one_with_eventlog(args.one)
        return 0

    from bench import wait_quiet
    from pdf_extraction_spark.session import build_session

    spark = build_session("stage-bucketing", cores=args.cpus,
                          shuffle_partitions=args.cpus)
    _corpus(spark)

    # warmup both forms once (JVM + Python workers + parquet footers)
    for form in FORMS:
        _run_form(spark, form, f"{WORK}/warm_{form}")

    times: dict[str, dict[str, list[float]]] = {
        f: {"pipeline_s": [], "assemble_reread_s": [], "upsert_5pct_s": []}
        for f in FORMS
    }
    loads = []
    for r in range(args.rounds):
        loads.append(wait_quiet())
        for form in FORMS:
            rec = _run_form(spark, form, f"{WORK}/{form}_{r}")
            for k, v in rec.items():
                times[form][k].append(v)
            print(f"round {r}: {form} {rec}", flush=True)
            shutil.rmtree(f"{WORK}/{form}_{r}", ignore_errors=True)

    plans = {}
    for form in FORMS:
        root = f"{WORK}/warm_{form}"
        plans[form] = _plan_shape(spark, form, root)
    spark.stop()

    shuffle_bytes = {}
    if not args.skip_shuffle_bytes:
        for form in FORMS:
            res = subprocess.run(
                [sys.executable, __file__, "--one", form],
                capture_output=True, text=True, check=True,
            )
            rec = json.loads(res.stdout.strip().splitlines()[-1])
            shuffle_bytes[form] = rec["shuffle_bytes_written"]
            print(f"shuffle bytes {form}: {shuffle_bytes[form]}", flush=True)

    out = {
        "n_docs": N_DOCS,
        "cpus": args.cpus,
        "rounds": args.rounds,
        "cpus_allowed": [
            line.split()[1] for line in open("/proc/self/status")
            if line.startswith("Cpus_allowed_list")
        ][0],
        "loadavg_before_rounds": loads,
        "plans": plans,
        "pipeline_shuffle_write_bytes": shuffle_bytes,
        "median": {
            f: {k: round(statistics.median(v), 3) for k, v in legs.items()}
            for f, legs in times.items()
        },
        "all": times,
        "decision_rule": "bucket a page-granularity stage iff bucketed "
                         "pipeline median <= 5% slower AND (assemble or "
                         "upsert leg >= 10% faster)",
    }
    os.makedirs("/root/repo/BENCH", exist_ok=True)
    with open("/root/repo/BENCH/stage_bucketing.json", "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps(out["median"]))
    return 0


if __name__ == "__main__":
    sys.exit(main())
