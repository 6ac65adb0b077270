"""Committed stage tables — the sandbox stand-in for Iceberg.

The production design writes every stage boundary to an Iceberg v2
table (snapshot-committed, SURVEY.md §1.3/§4 item 3); this container
has no Iceberg runtime jars, so stages commit to parquet directories
with an explicit ``_COMMITTED`` marker written only after a successful
write — the same snapshot-or-nothing contract at stage granularity.
Resume = skip stages whose marker exists (the reference's
skip-if-exists, pdf_text_extractor.py:47-49 et al., at cluster scale).
"""

from __future__ import annotations

import json
import os
import shutil
import time

from pyspark.sql import DataFrame, SparkSession

MARKER = "_COMMITTED"


def _dir(root: str, stage: str) -> str:
    return os.path.join(root, stage)


def is_committed(root: str, stage: str) -> bool:
    return os.path.exists(os.path.join(_dir(root, stage), MARKER))


def commit_stage(df: DataFrame, root: str, stage: str, run_id: str) -> DataFrame:
    """Write + mark committed; returns the re-read DataFrame (so
    downstream stages consume the materialized snapshot, not the
    lineage — the checkpoint/resume boundary)."""
    path = _dir(root, stage)
    if os.path.exists(path):
        shutil.rmtree(path)
    df.write.mode("overwrite").parquet(path)
    with open(os.path.join(path, MARKER), "w", encoding="utf-8") as fh:
        json.dump({"run_id": run_id, "committed_at": time.time()}, fh)
    return df.sparkSession.read.parquet(path)


def append_stage(df: DataFrame, root: str, stage: str, run_id: str) -> DataFrame:
    """Append an increment to a committed stage (Iceberg append commit
    in production); marker records the append history."""
    path = _dir(root, stage)
    df.write.mode("append").parquet(path)
    info = marker_info(root, stage) or {}
    appends = info.get("appends", [])
    appends.append({"run_id": run_id, "committed_at": time.time()})
    info.update({"appends": appends})
    with open(os.path.join(path, MARKER), "w", encoding="utf-8") as fh:
        json.dump(info, fh)
    return df.sparkSession.read.parquet(path)


def upsert_stage(
    df: DataFrame, root: str, stage: str, run_id: str, keys: list[str]
) -> DataFrame:
    """MERGE INTO emulation (reference load_to_db.py:338-364
    ``ON DUPLICATE KEY UPDATE``; Iceberg MERGE in production): committed
    rows whose key appears in ``df`` are replaced, everything else kept.

    anti-join(committed, df.keys) ∪ df -> write to a temp dir -> atomic
    swap, so a reader never sees a half-written snapshot and the input
    snapshot is never overwritten while being read."""
    path = _dir(root, stage)
    if not is_committed(root, stage):
        return commit_stage(df, root, stage, run_id)
    spark = df.sparkSession
    committed = spark.read.parquet(path)
    merged = committed.join(
        df.select(*keys).distinct(), keys, "left_anti"
    ).unionByName(df)
    tmp = f"{path}.tmp-{run_id}"
    merged.write.mode("overwrite").parquet(tmp)
    info = marker_info(root, stage) or {}
    shutil.rmtree(path)
    os.rename(tmp, path)
    upserts = info.get("upserts", [])
    upserts.append({"run_id": run_id, "committed_at": time.time()})
    info.update({"upserts": upserts})
    with open(os.path.join(path, MARKER), "w", encoding="utf-8") as fh:
        json.dump(info, fh)
    # drop stale file listings cached for the swapped path
    spark.catalog.refreshByPath(path)
    return spark.read.parquet(path)


def read_stage(spark: SparkSession, root: str, stage: str) -> DataFrame:
    return spark.read.parquet(_dir(root, stage))


def marker_info(root: str, stage: str) -> dict | None:
    p = os.path.join(_dir(root, stage), MARKER)
    if not os.path.exists(p):
        return None
    with open(p, encoding="utf-8") as fh:
        return json.load(fh)
