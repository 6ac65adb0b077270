"""Settle the stage-store parquet codec by interleaved A/B
(round-5; the DEDUP_FORMS / BM25_FORMS / STAGE_BUCKETING discipline).

Stage snapshots are text-heavy (page text, chunk text, JSON layout
artifacts), so the codec trades write/read CPU against stage storage
and scan IO — the quantity that dominates at the 10^12-document design
point.  An ISOLATED pages-stage write A/B first suggested zstd at
parquet-java's default level was free vs snappy; the committed-pipeline
A/B here (the arbiter — it exercises every store write path plus all
downstream re-reads) showed default zstd (level 3) pays ~3% wall.
Level 1 wins both axes.  This harness re-runs that decision.

Protocol:
  * forms = snappy / zstd level 3 / zstd level 1, INTERLEAVED with a
    rotating order per round so host drift hits all alike; >= 3 rounds;
    loadavg<5 quiet-window gate before each round;
  * per run: full committed-pipeline wall at N_DOCS docs on a fresh
    stage root + total stage bytes on disk;
  * medians reported with every raw run + observed loadavg.

Decision rule (pre-registered, round 5): adopt the smallest form whose
pipeline-wall median is not worse than snappy's; sizes break ties.

Usage:
  python tools/bench_codec_forms.py [--rounds 3] [--n-docs 8000]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import statistics
import sys
import time

sys.path.insert(0, "/root/repo")

WORK = "/root/repo/.work/codec_forms"

FORMS = {
    "snappy": ("snappy", None),
    "zstd3": ("zstd", "3"),
    "zstd1": ("zstd", "1"),
}


def _du(path: str) -> int:
    total = 0
    for dp, _, fs in os.walk(path):
        for f in fs:
            total += os.path.getsize(os.path.join(dp, f))
    return total


def _gate(limit: float = 5.0) -> float:
    while True:
        load = os.getloadavg()[0]
        if load < limit:
            return load
        time.sleep(20)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rounds", type=int, default=3)
    ap.add_argument("--n-docs", type=int, default=8000)
    args = ap.parse_args()

    from pdf_extraction_spark.plans import pipeline as P
    from pdf_extraction_spark.plans import stage_store as S
    from pdf_extraction_spark.session import build_session
    from pdf_extraction_spark.sources.corpus import corpus_df

    spark = build_session("codec_forms", cores=32)
    docs = corpus_df(spark, args.n_docs)
    root = os.path.join(WORK, "stages")

    def run(form: str) -> float:
        codec, level = FORMS[form]
        S.PARQUET_CODEC = codec
        if level is not None:
            S.ZSTD_LEVEL = level
        shutil.rmtree(root, ignore_errors=True)
        t0 = time.monotonic()
        P.run_pipeline(spark, docs, root, resume=False)
        return time.monotonic() - t0

    run("zstd1")  # warm the session/JIT on any one form

    names = list(FORMS)
    walls: dict[str, list] = {f: [] for f in FORMS}
    sizes: dict[str, int] = {}
    loads = []
    for rnd in range(args.rounds):
        loads.append(round(_gate(), 2))
        order = names[rnd % len(names):] + names[: rnd % len(names)]
        for f in order:
            walls[f].append(round(run(f), 3))
            sizes[f] = _du(root)
        print(f"round {rnd + 1}/{args.rounds}: "
              + "  ".join(f"{f} {walls[f][-1]}s" for f in order))
    shutil.rmtree(WORK, ignore_errors=True)
    spark.stop()

    out = {
        "n_docs": args.n_docs,
        "rounds": args.rounds,
        "protocol": "interleaved rotating order per round, loadavg<5 "
                    "gate before each round, fresh stage root per run, "
                    "median wall per form",
        "loadavg_before_rounds": loads,
        "forms": {
            f: {
                "wall_median_sec": round(statistics.median(walls[f]), 3),
                "wall_all_sec": walls[f],
                "stage_bytes": sizes[f],
            }
            for f in FORMS
        },
    }
    with open("/root/repo/BENCH/codec_forms.json", "w", encoding="utf-8") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
