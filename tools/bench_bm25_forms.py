"""Old-vs-new BM25-form benchmark (round-3 verdict item 2).

``bm25_documents`` moved 0.847s (r2) -> 1.143s (r3, +35%) in the
headline bench.  Two plan decisions in that window lacked a pinned A/B
artifact:

  * the ``with_tokens`` input-parallelism guard added in r3
    (operators/partitioning.py — a driver-side plan introspection plus,
    on under-split inputs, a round-robin exchange of the text column);
  * the df_counts derivation kept map-side (second explode+filter over
    the corpus) over the rejected ``distinct``-on-(id, term) variant,
    justified in a code comment with no recorded measurement.

This harness runs the three forms INTERLEAVED (round-robin A,B,C per
round so host drift hits all forms equally), >= 5 rounds, in one pinned
session over the sf0.1 documents table, with the noop sink (count()
prunes the scored column — NOTES.md lesson).  Results land in
BENCH/bm25_forms.json + BENCH/BM25_FORMS.md.

Usage:
  taskset -c 0-15 python tools/bench_bm25_forms.py [--rounds 7]
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import DataFrame, functions as F  # noqa: E402

from pdf_extraction_spark.operators import retrieval  # noqa: E402
from pdf_extraction_spark.queries.text_ops import QUERY_TERMS  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


# --- r2 form: no input-parallelism guard (verbatim from 48fc49b) -------------

def r2_with_tokens(df: DataFrame, text_col: str = "text") -> DataFrame:
    return df.withColumn(
        "tokens",
        F.filter(F.split(F.col(text_col), " "), lambda t: t != ""),
    ).withColumn("doc_len", F.size("tokens"))


# --- rejected variant: df from the filtered term rows via distinct -----------

def bm25_distinct_df(docs: DataFrame, query_terms, id_col="doc_id"):
    """Identical to retrieval.bm25_scores except df_counts comes from
    ``terms`` via distinct — one less corpus explode, one more exchange
    on (id, term)."""
    from pdf_extraction_spark.constants import BM25_B, BM25_K1

    k1, b = BM25_K1, BM25_B
    corpus = docs.agg(
        F.count(F.lit(1)).alias("n_docs"), F.avg("doc_len").alias("avgdl")
    )
    terms = docs.select(id_col, "doc_len", F.explode("tokens").alias("term")).filter(
        F.col("term").isin(query_terms)
    )
    df_counts = (
        terms.select(id_col, "term").distinct()
        .groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    )
    tf = terms.groupBy(id_col, "doc_len", "term").agg(F.count(F.lit(1)).alias("tf"))
    idf = F.log(
        F.lit(1.0) + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
    )
    denom = F.col("tf") + k1 * (1 - b + b * F.col("doc_len") / F.col("avgdl"))
    per_term = (
        tf.join(F.broadcast(df_counts), "term")
        .crossJoin(F.broadcast(corpus))
        .withColumn("term_score", idf * (F.col("tf") * (k1 + 1)) / denom)
    )
    return per_term.groupBy(id_col).agg(F.sum("term_score").alias("keyword_score"))


def make_forms(spark):
    def scan():
        return spark.read.parquet(f"{SF_DIR}/documents.parquet")

    return {
        "current": lambda: retrieval.bm25_scores(
            retrieval.with_tokens(scan(), "text"), QUERY_TERMS
        ),
        "distinct_df": lambda: bm25_distinct_df(
            retrieval.with_tokens(scan(), "text"), QUERY_TERMS
        ),
        "r2_noguard": lambda: retrieval.bm25_scores(
            r2_with_tokens(scan(), "text"), QUERY_TERMS
        ),
    }


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rounds", type=int, default=7)
    ap.add_argument("--cpus", type=int, default=16)
    args = ap.parse_args()

    from pdf_extraction_spark.session import build_session

    spark = build_session("bm25_forms", cores=args.cpus,
                          shuffle_partitions=args.cpus)
    forms = make_forms(spark)

    # plan shape once per form
    plans = {}
    for name, fn in forms.items():
        p = fn()._jdf.queryExecution().executedPlan().toString()
        plans[name] = {
            "exchanges": p.count("Exchange"),
            "scans": p.count("Scan parquet"),
        }

    # warmup each form once
    for fn in forms.values():
        fn().write.mode("overwrite").format("noop").save()

    times: dict[str, list[float]] = {n: [] for n in forms}
    for r in range(args.rounds):
        for name, fn in forms.items():
            t0 = time.monotonic()
            fn().write.mode("overwrite").format("noop").save()
            dt = time.monotonic() - t0
            times[name].append(dt)
            print(f"round {r}: {name} {dt:.3f}s", flush=True)

    out = {
        "sf_dir": SF_DIR,
        "cpus": args.cpus,
        "rounds": args.rounds,
        "cpus_allowed": [
            line.split()[1] for line in open("/proc/self/status")
            if line.startswith("Cpus_allowed_list")
        ][0],
        "plans": plans,
        "median": {n: round(statistics.median(ts), 3) for n, ts in times.items()},
        "min": {n: round(min(ts), 3) for n, ts in times.items()},
        "all": {n: [round(t, 3) for t in ts] for n, ts in times.items()},
    }
    os.makedirs("/root/repo/BENCH", exist_ok=True)
    with open("/root/repo/BENCH/bm25_forms.json", "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps(out["median"]))
    return 0


if __name__ == "__main__":
    sys.exit(main())
