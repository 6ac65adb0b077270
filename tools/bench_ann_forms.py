"""Pinned interleaved A/B for the ann_lsh_topk r3->r4 +28% drift
(round-4 verdict: three per-query numbers drifted 27-40% with no
artifact to adjudicate noise vs regression; the round-5 protocol bench
settled pricing_summary and minhash_signatures as noise but reproduced
ann_lsh_topk at 1.52s under a quiet window -> real regression).

Forms (identical results, asserted up front):
  A_r3        — round-3 shape (f223363): probe bucket reused from the
                shared with_b projection, string-equality filter
  B_r4        — round-4 multi-probe refactor at n_probe=1, vendored
                verbatim from 726271a: probe_buckets_col recomputes the
                probe bucket and the scan side filters with
                array_contains over the 1-element broadcast array
  C_current   — operators/similarity.py after the round-5 fix
                (n_probe<=1 specializes back to the r3 shape; the
                multi-probe path is untouched)

Usage: taskset -c 0-15 python tools/bench_ann_forms.py [--rounds 7]
Writes BENCH/ann_lsh_forms.json.
"""

from __future__ import annotations

import argparse
import json
import statistics
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from pdf_extraction_spark.operators import similarity as S  # noqa: E402
from pdf_extraction_spark.operators.partitioning import ensure_parallelism  # noqa: E402
from pdf_extraction_spark.session import build_session  # noqa: E402

SF_DIR = "/root/testdata/sf0.1"


def _topk(j, id_col, k):
    cos = S._dot(F.col("embedding"), F.col("_probe")) / (
        S._norm(F.col("embedding")) * S._norm(F.col("_probe"))
    )
    return (
        j.select(id_col, F.round(cos, 6).alias("cosine"))
        .orderBy(F.desc("cosine"), F.asc(id_col))
        .limit(k)
    )


def form_a_r3(emb, probe_id=0, k=5):
    with_b = ensure_parallelism(emb).withColumn(
        "bucket", S.bucket_col("embedding", S.N_PLANES, 64)
    )
    probe_bucket = with_b.filter(F.col("vec_id") == probe_id).select(
        F.col("bucket").alias("_pb")
    )
    cand = with_b.crossJoin(F.broadcast(probe_bucket)).filter(
        (F.col("bucket") == F.col("_pb")) & (F.col("vec_id") != probe_id)
    )
    probe = emb.filter(F.col("vec_id") == probe_id).select(
        F.col("embedding").alias("_probe")
    )
    return _topk(cand.crossJoin(F.broadcast(probe)), "vec_id", k)


def form_b_r4(emb, probe_id=0, k=5):
    # verbatim 726271a ann_lsh_topk at n_probe=1
    with_b = ensure_parallelism(emb).withColumn(
        "bucket", S.bucket_col("embedding", S.N_PLANES, 64)
    )
    probe_bucket = with_b.filter(F.col("vec_id") == probe_id).select(
        S.probe_buckets_col("embedding", S.N_PLANES, 64, 1).alias("_pbs")
    )
    cand = with_b.crossJoin(F.broadcast(probe_bucket)).filter(
        F.array_contains(F.col("_pbs"), F.col("bucket"))
        & (F.col("vec_id") != probe_id)
    )
    probe = emb.filter(F.col("vec_id") == probe_id).select(
        F.col("embedding").alias("_probe")
    )
    return _topk(cand.crossJoin(F.broadcast(probe)), "vec_id", k)


def form_c_current(emb, probe_id=0, k=5):
    return S.ann_lsh_topk(emb, probe_id=probe_id, k=k)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rounds", type=int, default=7)
    args = ap.parse_args()

    spark = build_session("ab-ann", cores=16, shuffle_partitions=16)
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")

    forms = {"A_r3": form_a_r3, "B_r4": form_b_r4, "C_current": form_c_current}
    ref = None
    for name, fn in forms.items():
        rows = [tuple(r) for r in fn(emb).collect()]
        if ref is None:
            ref = rows
        assert rows == ref, f"{name} diverges: {rows[:3]} vs {ref[:3]}"
    print("results identical across forms", file=sys.stderr)

    for fn in forms.values():  # warmup
        fn(emb).write.mode("overwrite").format("noop").save()

    runs: dict[str, list[float]] = {n: [] for n in forms}
    for _ in range(args.rounds):
        for name, fn in forms.items():
            t0 = time.monotonic()
            fn(emb).write.mode("overwrite").format("noop").save()
            runs[name].append(round(time.monotonic() - t0, 3))
    out = {
        n: {"median": round(statistics.median(ts), 3), "all": ts}
        for n, ts in runs.items()
    }
    print(json.dumps(out, indent=1))
    with open("/root/repo/BENCH/ann_lsh_forms.json", "w") as f:
        json.dump({"rounds": args.rounds, "forms": out}, f, indent=1)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
