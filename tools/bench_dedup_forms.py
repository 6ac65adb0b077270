"""Old-vs-new dedup-form benchmark (round-2 verdict item 4).

Round 2 rewrote the dedup family shuffle-lean (window-free shingles,
partial-agg'd minhash, capped LSH buckets, codegen simhash votes), but
the recorded single-run bench numbers moved the wrong way under host
noise.  This harness settles it: the ROUND-1 forms (vendored below from
commit 713b9b3, verbatim) and the current forms run INTERLEAVED in one
pinned session, >=5 pairs each, over the sf0.1 documents table; shuffle
write bytes come from a per-form event-log run.  Results land in
BENCH/dedup_forms.json + BENCH/DEDUP_FORMS.md.

Usage:
  taskset -c 0-15 python tools/bench_dedup_forms.py            # timing
  python tools/bench_dedup_forms.py --shuffle-bytes            # bytes
  python tools/bench_dedup_forms.py --one old_minhash          # helper
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import statistics
import subprocess
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import DataFrame, Window, functions as F  # noqa: E402

from pdf_extraction_spark.operators import dedup as new  # noqa: E402
from pdf_extraction_spark.operators.dedup import LSH_BANDS, N_MINHASH  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


# --- ROUND-1 FORMS (verbatim from commit 713b9b3 operators/dedup.py) ---------

def old_exact_dedup(df, text_col="text", id_col="doc_id"):
    w = Window.partitionBy(text_col).orderBy(F.asc(id_col))
    wc = Window.partitionBy(text_col)
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .withColumn("n_dups", F.count(F.lit(1)).over(wc))
        .filter(F.col("_rn") == 1)
        .select(id_col, "n_dups")
    )


def old_shingles(df, text_col="text", id_col="doc_id"):
    tok = df.select(
        id_col, F.posexplode(F.split(F.col(text_col), " ")).alias("pos", "w")
    ).filter(F.col("w") != "")
    win = Window.partitionBy(id_col).orderBy("pos")
    sh = tok.select(
        id_col,
        F.concat_ws(
            " ", "w", F.lead("w", 1).over(win), F.lead("w", 2).over(win)
        ).alias("shingle"),
        F.lead("w", 2).over(win).alias("_w2"),
    ).filter(F.col("_w2").isNotNull())
    return sh.select(id_col, "shingle")


def old_minhash_signature(df, text_col="text", id_col="doc_id", n_hashes=N_MINHASH):
    sh = old_shingles(df, text_col, id_col)
    aggs = [
        F.min(F.md5(F.concat(F.lit(f"{j}|"), F.col("shingle")))).alias(f"h{j}")
        for j in range(n_hashes)
    ]
    return sh.groupBy(id_col).agg(*aggs)


def old_lsh_candidate_pairs(df, text_col="text", id_col="doc_id",
                            n_hashes=N_MINHASH, bands=LSH_BANDS):
    sig = old_minhash_signature(df, text_col, id_col, n_hashes)
    rows_per_band = n_hashes // bands
    band_cols = []
    for bnd in range(bands):
        hs = [F.col(f"h{bnd * rows_per_band + r}") for r in range(rows_per_band)]
        band_cols.append(
            F.struct(F.lit(bnd).alias("band"), F.md5(F.concat_ws("|", *hs)).alias("bucket"))
        )
    buckets = sig.select(
        id_col, *[f"h{j}" for j in range(n_hashes)],
        F.explode(F.array(*band_cols)).alias("bb"),
    ).select(id_col, *[f"h{j}" for j in range(n_hashes)], "bb.band", "bb.bucket")
    a = buckets.select(
        F.col(id_col).alias("doc_a"), "band", "bucket",
        *[F.col(f"h{j}").alias(f"ha{j}") for j in range(n_hashes)],
    )
    b = buckets.select(
        F.col(id_col).alias("doc_b"), "band", "bucket",
        *[F.col(f"h{j}").alias(f"hb{j}") for j in range(n_hashes)],
    )
    matches = (
        F.lit(0.0)
        + sum(
            F.when(F.col(f"ha{j}") == F.col(f"hb{j}"), 1.0).otherwise(0.0)
            for j in range(n_hashes)
        )
    ) / float(n_hashes)
    return (
        a.join(b, ["band", "bucket"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b", F.round(matches, 6).alias("sim_est"))
        .distinct()
    )


def old_simhash16(df, text_col="text", id_col="doc_id"):
    tok = df.select(
        id_col, F.explode(F.filter(F.split(F.col(text_col), " "), lambda t: t != "")).alias("w")
    ).withColumn("hx", F.substring(F.md5("w"), 1, 4))
    pos = F.explode(F.sequence(F.lit(0), F.lit(15))).alias("bit")
    bits = tok.select(id_col, "hx", pos)
    hexval = F.conv(
        F.substring("hx", (F.col("bit") / 4).cast("int") + 1, 1), 16, 10
    ).cast("int")
    bitval = F.floor(hexval / F.pow(F.lit(2.0), (F.col("bit") % 4).cast("double"))).cast("long") % 2
    votes = bits.withColumn("vote", F.when(bitval == 1, 1).otherwise(-1))
    agg = votes.groupBy(id_col, "bit").agg(F.sum("vote").alias("v"))
    return (
        agg.withColumn(
            "contrib",
            F.when(F.col("v") >= 0, F.pow(F.lit(2.0), F.col("bit").cast("double")).cast("long")).otherwise(F.lit(0)),
        )
        .groupBy(id_col)
        .agg(F.sum("contrib").alias("simhash"))
    )


FORMS: dict[str, tuple] = {
    "exact": (old_exact_dedup, new.exact_dedup),
    "minhash": (old_minhash_signature, new.minhash_signature),
    "lsh_pairs": (old_lsh_candidate_pairs, new.lsh_candidate_pairs),
    "simhash": (old_simhash16, new.simhash16),
}


def _docs(spark) -> DataFrame:
    return spark.read.parquet(f"{SF_DIR}/documents.parquet")


def _run(spark, fn) -> float:
    t0 = time.monotonic()
    fn(_docs(spark)).write.mode("overwrite").format("noop").save()
    return time.monotonic() - t0


def run_timing(runs: int) -> dict:
    from pdf_extraction_spark.session import build_session

    spark = build_session("dedup-forms", cores=16, shuffle_partitions=16)
    # warmup both plans once
    for old_fn, new_fn in FORMS.values():
        _run(spark, old_fn)
        _run(spark, new_fn)
    out = {}
    for name, (old_fn, new_fn) in FORMS.items():
        olds, news = [], []
        for _ in range(runs):  # interleaved: drift hits both sides
            olds.append(_run(spark, old_fn))
            news.append(_run(spark, new_fn))
        out[name] = {
            "old_sec_median": round(statistics.median(olds), 3),
            "new_sec_median": round(statistics.median(news), 3),
            "old_sec_min": round(min(olds), 3),
            "new_sec_min": round(min(news), 3),
            "old_all": [round(t, 3) for t in olds],
            "new_all": [round(t, 3) for t in news],
            "speedup_median": round(statistics.median(olds) / statistics.median(news), 2),
        }
        print(name, out[name], file=sys.stderr, flush=True)
    spark.stop()
    return out


def run_one_with_eventlog(form: str) -> None:
    """Helper subprocess: run one form once with the event log on and
    print its total shuffle write bytes."""
    from pdf_extraction_spark.session import build_session

    side, name = form.split("_", 1)
    fn = FORMS[name][0 if side == "old" else 1]
    import shutil

    logdir = f"/root/repo/.work/eventlog_{form}"
    shutil.rmtree(logdir, ignore_errors=True)
    os.makedirs(logdir, exist_ok=True)
    spark = build_session(
        f"shuffle-{form}", cores=16, shuffle_partitions=16,
        extra_conf={"spark.eventLog.enabled": "true",
                    "spark.eventLog.dir": f"file://{logdir}",
                    "spark.eventLog.compress": "false"},
    )
    _run(spark, fn)
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


def run_shuffle_bytes() -> dict:
    out = {}
    for name in FORMS:
        for side in ("old", "new"):
            form = f"{side}_{name}"
            res = subprocess.run(
                [sys.executable, __file__, "--one", form],
                capture_output=True, text=True, check=True,
            )
            rec = json.loads(res.stdout.strip().splitlines()[-1])
            out.setdefault(name, {})[f"{side}_shuffle_bytes"] = rec["shuffle_bytes_written"]
            print(form, rec["shuffle_bytes_written"], file=sys.stderr, flush=True)
    return out


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--runs", type=int, default=5)
    ap.add_argument("--one", default=None, help="internal: event-log single form")
    ap.add_argument("--shuffle-bytes", action="store_true")
    ap.add_argument("--timing-only", action="store_true")
    args = ap.parse_args()

    if args.one:
        run_one_with_eventlog(args.one)
        return 0

    doc: dict = {"sf_dir": SF_DIR, "runs": args.runs,
                 "protocol": "interleaved old/new in one pinned local[16] session; "
                             "shuffle bytes from per-form event logs"}
    if not args.shuffle_bytes:
        doc["timing"] = run_timing(args.runs)
    if not args.timing_only:
        doc["shuffle"] = run_shuffle_bytes()

    os.makedirs("/root/repo/BENCH", exist_ok=True)
    existing = {}
    path = "/root/repo/BENCH/dedup_forms.json"
    if os.path.exists(path):
        with open(path, encoding="utf-8") as fh:
            existing = json.load(fh)
    existing.update(doc)
    with open(path, "w", encoding="utf-8") as fh:
        json.dump(existing, fh, indent=2)

    # markdown table
    lines = [
        "# Dedup forms: round-1 vs current (rounds 2-3 rework)",
        "",
        f"sf dir: {existing['sf_dir']}; protocol: {existing['protocol']}",
        "",
        "Round-3 findings that produced the current forms:",
        "",
        "1. The round-2 'shuffle-lean' forms really did bench SLOWER than the",
        "   round-1 window forms — but not for CPU reasons: the sf0.1 parquet",
        "   tables are ONE row group, so a shuffle-free fused stage ran on one",
        "   core while the window form's mid-plan exchange spread the md5 work",
        "   over all 16.  ensure_parallelism (operators/partitioning.py) closes",
        "   the trap; at cluster scale it is a no-op.",
        "2. MinHash now takes BIGINT mins over 4 disjoint 32-bit windows of ONE",
        "   md5 per shingle (was: 4 digests/shingle + hex-string mins, which",
        "   force SortAggregate); shingles come from one codegen'd",
        "   regexp_extract_all lookahead pass (higher-order array lambdas and",
        "   arrays_zip are CodegenFallback = interpreted).",
        "",
        "Shuffle-byte rows include the (local-only) rebalance bytes; the",
        "round-1 columns are dominated by the token/signature exchanges that",
        "scale with the corpus, the new columns by fixed-width per-doc rows.",
        "",
        "| form | r1 median s | new median s | speedup | r1 min s | new min s | r1 shuffle MB | new shuffle MB |",
        "|---|---|---|---|---|---|---|---|",
    ]
    t = existing.get("timing", {})
    s = existing.get("shuffle", {})
    for name in FORMS:
        ti = t.get(name, {})
        si = s.get(name, {})
        mb = lambda x: round(x / 1e6, 2) if x is not None else "-"
        lines.append(
            f"| {name} | {ti.get('old_sec_median', '-')} | {ti.get('new_sec_median', '-')} "
            f"| {ti.get('speedup_median', '-')}x | {ti.get('old_sec_min', '-')} | {ti.get('new_sec_min', '-')} "
            f"| {mb(si.get('old_shuffle_bytes'))} | {mb(si.get('new_shuffle_bytes'))} |"
        )
    with open("/root/repo/BENCH/DEDUP_FORMS.md", "w", encoding="utf-8") as fh:
        fh.write("\n".join(lines) + "\n")
    print(json.dumps(existing.get("timing", {})))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
