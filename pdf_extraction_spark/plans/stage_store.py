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
PARQUET_CODEC = "zstd"
ZSTD_LEVEL = "1"

# Stage snapshots are text-heavy (page text, chunk text, JSON layout
# artifacts).  Codec settled by three interleaved committed-pipeline
# A/Bs at 8000 docs (round 5; tools/bench_codec_forms.py,
# BENCH/CODEC_FORMS.md): pipeline-wall differences between snappy and
# either zstd level are WITHIN host noise (per-form medians 10.2-12.2s
# across sessions, overlapping), while sizes are deterministic — zstd
# level 1 lands 31.6 MB vs snappy's 41.5 (24% smaller; level 3: 29.4).
# At the 100 TB design point that is ~25% less stage storage and scan
# IO at no measurable wall cost, so zstd it is; level 1 over the
# default 3 because its walls showed the tightest spread and the extra
# 7% size from level 3 is not worth its tail.  The codec is an explicit
# per-write option (travels with the store — a vanilla spark-submit
# session writes the same files); the level is a hadoop conf
# (parquet-java has no per-write level option), set idempotently before
# each write by _tune_codec below.


def _tune_codec(df: DataFrame) -> None:
    try:
        df.sparkSession.sparkContext._jsc.hadoopConfiguration().set(
            "parquet.compression.codec.zstd.level", ZSTD_LEVEL
        )
    except Exception:
        pass  # private-API bridge unavailable: level 3 files, same data


def _dir(root: str, stage: str) -> str:
    return os.path.join(root, stage)


def _table_name(root: str, stage: str) -> str:
    """Deterministic catalog name for a bucketed stage — root-scoped so
    several stage roots can coexist in one session."""
    import hashlib

    return f"stage_{stage}_{hashlib.md5(root.encode()).hexdigest()[:8]}"


def _schema_ddl(df: DataFrame) -> str:
    return ", ".join(
        f"`{f.name}` {f.dataType.simpleString()}" for f in df.schema.fields
    )


def _write_bucketed(
    df: DataFrame, tmp: str, root: str, stage: str, run_id: str,
    bucket: dict,
) -> None:
    """Write ``df`` bucket-hashed + bucket-sorted into ``tmp`` via a
    throwaway external table (Spark's DataSource bucketing only writes
    through saveAsTable; the bucket id lives in the part-file NAMES, so
    the files stay bucketed across the directory swap)."""
    import re

    # A crash between CTAS and the marker write leaves a non-empty
    # unmarked tmp that recovery only GCs when it actually runs; unlike
    # the unbucketed overwrite-parquet path, saveAsTable refuses a
    # non-empty location — clear leftovers so a same-run_id retry works.
    shutil.rmtree(tmp, ignore_errors=True)
    _tune_codec(df)
    spark = df.sparkSession
    keys = bucket["keys"]
    safe_run = re.sub(r"[^A-Za-z0-9_]", "_", run_id)
    tmp_table = f"{_table_name(root, stage)}_tmp_{safe_run}"
    spark.sql(f"DROP TABLE IF EXISTS `{tmp_table}`")
    (
        df.write.mode("overwrite")
        .option("compression", PARQUET_CODEC)
        .bucketBy(bucket["n"], keys[0], *keys[1:])
        .sortBy(keys[0], *keys[1:])
        .option("path", tmp)
        .saveAsTable(tmp_table)
    )
    spark.sql(f"DROP TABLE `{tmp_table}`")  # metadata only; files stay


def register_stage_table(
    spark: SparkSession, root: str, stage: str
) -> DataFrame | None:
    """(Re-)register the external bucketed catalog table for a stage
    whose marker carries a bucket spec; returns the table DataFrame, or
    None for unbucketed stages.  The catalog entry is session-local
    (in-memory catalog), so a fresh session re-creates it from the
    marker — the files themselves carry the bucketing."""
    info = marker_info(root, stage)
    bucket = (info or {}).get("bucket")
    if not bucket:
        return None
    name = _table_name(root, stage)
    path = _dir(root, stage)
    keys = ", ".join(f"`{k}`" for k in bucket["keys"])
    spark.sql(f"DROP TABLE IF EXISTS `{name}`")
    spark.sql(
        f"CREATE TABLE `{name}` ({bucket['ddl']}) USING PARQUET "
        f"CLUSTERED BY ({keys}) SORTED BY ({keys}) "
        f"INTO {bucket['n']} BUCKETS LOCATION '{path}'"
    )
    return spark.table(name)


def _marked_with(d: str, run_id: str) -> bool:
    """True iff ``d`` carries a marker whose commit OR any recorded
    upsert/append was made by ``run_id``."""
    p = os.path.join(d, MARKER)
    if not os.path.exists(p):
        return False
    try:
        with open(p, encoding="utf-8") as fh:
            info = json.load(fh)
    except (OSError, ValueError):
        return False
    if info.get("run_id") == run_id:
        return True
    return any(
        e.get("run_id") == run_id
        for kind in ("upserts", "appends", "compactions")
        for e in info.get(kind, [])
    )


def _swap_into_place(path: str, tmp: str, run_id: str) -> None:
    """Rename the marked ``tmp`` snapshot into ``path`` (keeping any
    previous snapshot aside until the swap lands, then dropping it).

    Tolerates a concurrent READER having healed the swap for us: a
    reader's is_committed/read_stage may run recover_stage during our
    marker-written-but-not-yet-swapped window, promoting ``tmp`` into
    ``path`` itself (and gc'ing siblings).  In that race our own renames
    hit FileNotFoundError — treat it as success iff a snapshot marked
    with THIS run_id ends up at ``path``, so out-of-process readers
    concurrent with a single writer never fail the writer's commit."""
    old = None
    if os.path.exists(path):
        old = f"{path}.old-{run_id}"
        try:
            os.rename(path, old)
        except (FileNotFoundError, NotADirectoryError):
            old = None  # a reader's recovery gc'd/moved it under us
    try:
        os.rename(tmp, path)
    except FileNotFoundError:
        # A reader promoted our marked tmp.  If that happened BEFORE our
        # path->old rename, our own promoted snapshot now sits at `old`
        # — put it back.  Either way the swap only counts as done when
        # `path` carries this run's marker.
        if (
            old is not None
            and not os.path.exists(path)
            and _marked_with(old, run_id)
        ):
            os.rename(old, path)
            old = None
        if not _marked_with(path, run_id):
            # genuine failure: un-displace whatever snapshot we renamed
            # aside so the stage is left exactly as we found it
            if old is not None and not os.path.exists(path):
                os.rename(old, path)
                old = None
            raise
    if old is not None:
        shutil.rmtree(old, ignore_errors=True)


def is_committed(root: str, stage: str) -> bool:
    """True iff the stage directory carries a committed marker.

    If the marker is absent, first attempt crash recovery: the swap in
    commit_stage/upsert_stage has a window between rename(path->old)
    and rename(tmp->path) where the stage PATH does not exist even
    though a fully-written marked snapshot (the tmp, and the old) is
    still on disk.  recover_stage() promotes the marked tmp (the commit
    takes effect) or restores the marked old (the commit rolls back),
    so a crash in that window degrades to nothing instead of a full
    recompute plus leaked directories.  Assumes no concurrent writer on
    the same stage (single-committer, as the rest of this store does)."""
    if os.path.exists(os.path.join(_dir(root, stage), MARKER)):
        return True
    recover_stage(root, stage)
    return os.path.exists(os.path.join(_dir(root, stage), MARKER))


def _siblings(root: str, stage: str, kind: str) -> list[str]:
    """Marked-or-not `<stage>.{tmp,old}-<run_id>` sibling dirs, newest
    (by mtime) first."""
    prefix = f"{stage}.{kind}-"
    try:
        names = os.listdir(root)
    except FileNotFoundError:
        return []
    dirs = [
        os.path.join(root, n)
        for n in names
        if n.startswith(prefix) and os.path.isdir(os.path.join(root, n))
    ]
    return sorted(dirs, key=os.path.getmtime, reverse=True)


def recover_stage(root: str, stage: str) -> str | None:
    """Repair a stage whose directory lost its marker to a mid-swap
    crash; returns the action taken (None | 'promoted_tmp' |
    'restored_old').

    Rules (see commit_stage's swap order: write+mark tmp; rename
    path->old; rename tmp->path; rmtree old):
      * path marked               -> nothing to do here (orphan tmp/old
        siblings are cleaned by gc_stage / the admin CLI, not on the
        hot read path);
      * path missing/unmarked, a MARKED tmp exists -> promote the
        newest marked tmp into place (the snapshot was fully written
        and marked, so the commit takes effect), drop the rest;
      * else a MARKED old exists  -> restore the newest (roll back);
      * unmarked tmps are half-written garbage either way -> removed.
    """
    path = _dir(root, stage)
    if os.path.exists(os.path.join(path, MARKER)):
        return None
    marked = [
        d for d in _siblings(root, stage, "tmp")
        if os.path.exists(os.path.join(d, MARKER))
    ]
    action = None
    source = None
    if marked:
        source, action = marked[0], "promoted_tmp"
    else:
        olds = [
            d for d in _siblings(root, stage, "old")
            if os.path.exists(os.path.join(d, MARKER))
        ]
        if olds:
            source, action = olds[0], "restored_old"
    if source is None:
        return None
    if os.path.exists(path):  # unmarked (half-written) stage dir
        shutil.rmtree(path)
    os.rename(source, path)
    gc_stage(root, stage)
    return action


def gc_stage(
    root: str, stage: str, kinds: tuple[str, ...] = ("tmp", "old")
) -> list[str]:
    """Remove leftover `<stage>.tmp-*` / `<stage>.old-*` dirs once the
    stage path itself is committed; returns the paths removed.  Full
    (tmp+old) GC is safe only with no concurrent writer on this stage;
    pass ``kinds=("old",)`` when an out-of-process writer may be live —
    an in-progress (not-yet-marked) tmp is indistinguishable from a
    crashed one, while `.old-*` dirs are only ever swap leftovers."""
    if not os.path.exists(os.path.join(_dir(root, stage), MARKER)):
        return []
    removed = []
    for kind in kinds:
        for d in _siblings(root, stage, kind):
            shutil.rmtree(d)
            removed.append(d)
    return removed


def gc_all(root: str, kinds: tuple[str, ...] = ("tmp", "old")) -> list[str]:
    """gc_stage across every committed stage under ``root`` — run at
    pipeline start so `.old-*` leftovers from runs that died between
    swap and rmtree cannot accumulate across incremental deployments.
    Cheap when clean: one listdir per stage.  The pipeline-startup call
    passes ``kinds=("old",)`` so a resuming reader can never delete a
    concurrent writer's in-progress tmp mid-write (round-5 advice);
    the explicit admin --gc path keeps the full sweep."""
    removed = []
    for s in stages(root):
        removed.extend(gc_stage(root, s, kinds))
    return removed


def stages(root: str) -> list[str]:
    """Stage names under ``root`` (directories that are not tmp/old
    swap leftovers), sorted."""
    try:
        names = os.listdir(root)
    except FileNotFoundError:
        return []
    out = []
    for n in sorted(names):
        if ".tmp-" in n or ".old-" in n:
            continue
        if os.path.isdir(os.path.join(root, n)):
            out.append(n)
    return out


def commit_stage(
    df: DataFrame, root: str, stage: str, run_id: str,
    bucket_by: list[str] | None = None, n_buckets: int = 16,
) -> DataFrame:
    """Write + mark committed; returns the re-read DataFrame (so
    downstream stages consume the materialized snapshot, not the
    lineage — the checkpoint/resume boundary).

    Same crash discipline as ``upsert_stage``: the snapshot is written
    and marked in a temp dir, any previous snapshot is renamed aside,
    the temp dir renamed into place, and the old snapshot deleted last
    — a marked snapshot (tmp, old, or path) survives on DISK at every
    instant, and the brief window where the stage PATH itself does not
    exist is healed by recover_stage() on the next
    is_committed/read_stage (promote marked tmp, else restore old).

    ``bucket_by`` commits the snapshot BUCKETED (hash-clustered + bucket
    -sorted) on those keys: the shuffle is paid once at commit and every
    downstream equi-join / aggregation on a superset of the keys over
    the committed table is exchange-free (plans/bucketing.py explains
    the idiom; tests/test_bucketing.py pins the plans).  The bucket spec
    rides in the marker so a fresh session re-registers the catalog
    table from disk.  16 buckets fits the sandbox; a 100 TB stage would
    use O(cluster cores) buckets — Iceberg's bucket transform in
    production."""
    path = _dir(root, stage)
    tmp = f"{path}.tmp-{run_id}"
    info: dict = {"run_id": run_id, "committed_at": time.time()}
    if bucket_by:
        info["bucket"] = {
            "keys": list(bucket_by), "n": n_buckets, "ddl": _schema_ddl(df),
        }
        _write_bucketed(df, tmp, root, stage, run_id, info["bucket"])
    else:
        _tune_codec(df)
        df.write.mode("overwrite").option("compression", PARQUET_CODEC).parquet(tmp)
    with open(os.path.join(tmp, MARKER), "w", encoding="utf-8") as fh:
        json.dump(info, fh)
    _swap_into_place(path, tmp, run_id)
    spark = df.sparkSession
    spark.catalog.refreshByPath(path)
    if bucket_by:
        return register_stage_table(spark, root, stage)
    return spark.read.parquet(path)


def append_stage(df: DataFrame, root: str, stage: str, run_id: str) -> DataFrame:
    """Append an increment to a committed stage (Iceberg append commit
    in production); marker records the append history.  Refuses on a
    bucketed stage: appended plain files would break the clustering the
    catalog metadata promises (use upsert_stage, which re-clusters)."""
    path = _dir(root, stage)
    info0 = marker_info(root, stage)
    if info0 and info0.get("bucket"):
        raise ValueError(
            f"append_stage: stage '{stage}' is bucketed; append would "
            "violate its clustering — use upsert_stage"
        )
    _tune_codec(df)
    df.write.mode("append").option("compression", PARQUET_CODEC).parquet(path)
    info = marker_info(root, stage) or {}
    appends = info.get("appends", [])
    appends.append({"run_id": run_id, "committed_at": time.time()})
    info.update({"appends": appends})
    with open(os.path.join(path, MARKER), "w", encoding="utf-8") as fh:
        json.dump(info, fh)
    return df.sparkSession.read.parquet(path)


def upsert_stage(
    df: DataFrame,
    root: str,
    stage: str,
    run_id: str,
    keys: list[str],
    delete_scope: DataFrame | None = None,
) -> DataFrame:
    """MERGE INTO emulation (reference load_to_db.py:338-364
    ``ON DUPLICATE KEY UPDATE``; Iceberg MERGE in production): committed
    rows whose key appears in ``df`` are replaced, everything else kept.

    anti-join(committed, scope keys) ∪ df -> write to a temp dir ->
    swap, so a reader never sees a half-written snapshot and the input
    snapshot is never overwritten while being read.  The swap keeps a
    committed snapshot on disk at every instant: the new snapshot is
    fully written AND marked inside the temp dir first, the old dir is
    renamed aside (not deleted), the temp dir renamed into place, and
    only then is the old snapshot dropped — a crash at any point leaves
    either the old or the new marked snapshot recoverable.

    ``delete_scope`` (optional) widens the set of committed rows the
    merge REPLACES beyond df's own keys: committed rows whose key
    appears in ``delete_scope`` are dropped even if ``df`` carries no
    replacement (MERGE ... WHEN NOT MATCHED BY SOURCE THEN DELETE,
    scoped).  The host-scoped incremental uses this so a url whose
    recompute now yields zero rows (e.g. its text stripped to empty)
    does not leave stale rows behind."""
    path = _dir(root, stage)
    if not is_committed(root, stage):
        return commit_stage(df, root, stage, run_id)
    spark = df.sparkSession
    committed = spark.read.parquet(path)
    scope = delete_scope if delete_scope is not None else df.select(*keys).distinct()
    merged = committed.join(scope.select(*keys).distinct(), keys, "left_anti").unionByName(
        df, allowMissingColumns=True
    )
    tmp = f"{path}.tmp-{run_id}"
    info = marker_info(root, stage) or {}
    if info.get("bucket"):
        # a bucketed stage stays bucketed across merges — the rewrite
        # re-clusters, so the catalog metadata never lies about files.
        # The DDL is refreshed from the MERGED frame: a schema-evolving
        # upsert (unionByName allowMissingColumns) widens the files, and
        # a stale DDL would make register_stage_table silently drop the
        # new columns on every subsequent read.
        info["bucket"] = dict(info["bucket"], ddl=_schema_ddl(merged))
        _write_bucketed(merged, tmp, root, stage, run_id, info["bucket"])
    else:
        _tune_codec(merged)
        merged.write.mode("overwrite").option("compression", PARQUET_CODEC).parquet(tmp)
    upserts = info.get("upserts", [])
    upserts.append({"run_id": run_id, "committed_at": time.time()})
    info.update({"upserts": upserts})
    with open(os.path.join(tmp, MARKER), "w", encoding="utf-8") as fh:
        json.dump(info, fh)
    _swap_into_place(path, tmp, run_id)
    # drop stale file listings cached for the swapped path
    spark.catalog.refreshByPath(path)
    if info.get("bucket"):
        return register_stage_table(spark, root, stage)
    return spark.read.parquet(path)


def _part_files(path: str) -> list[str]:
    """Data part files of a stage snapshot (parquet parts only — the
    marker/_SUCCESS/.crc bookkeeping doesn't count toward compaction)."""
    try:
        names = os.listdir(path)
    except FileNotFoundError:
        return []
    return [
        os.path.join(path, n)
        for n in names
        if n.startswith("part-") and not n.endswith(".crc")
    ]


def compact_stage(
    spark: SparkSession,
    root: str,
    stage: str,
    run_id: str,
    target_bytes: int = 128 << 20,
    min_files: int = 8,
) -> dict:
    """Rewrite an over-fragmented committed stage into few large files
    (Iceberg's ``rewrite_data_files`` binpack in production).

    ``append_stage`` adds files on every increment and never rewrites,
    so an append-heavy deployment accumulates small files until scans
    pay per-file open/footer costs (the classic small-file problem at
    100 TB).  ``upsert_stage`` rewrites the snapshot wholesale, so only
    append paths need this.  Result-neutral: same rows, fewer files.

    Trigger: a no-op unless the current part-file count exceeds
    ``max(min_files, ceil(bytes / target_bytes))`` — the target count a
    binpack to ``target_bytes``-sized files would produce.  Returns a
    summary dict either way (``action``: 'noop' | 'compacted').

    The rewrite reuses the commit discipline end-to-end: write to a
    ``.tmp-<run_id>`` dir (coalesce — a narrow repartition, no shuffle —
    for plain stages; a re-clustered bucketed write for bucketed ones),
    mark it with the EXISTING marker history plus a ``compactions``
    entry, then ``_swap_into_place`` — so a crash at any instant leaves
    a marked snapshot on disk, exactly like commit/upsert."""
    path = _dir(root, stage)
    if not is_committed(root, stage):
        raise ValueError(f"compact_stage: stage '{stage}' is not committed")
    files = _part_files(path)
    data_bytes = sum(os.path.getsize(f) for f in files)
    target_count = max(min_files, -(-data_bytes // target_bytes))
    info0 = marker_info(root, stage) or {}
    if info0.get("bucket"):
        # A bucketed rewrite emits ~one file per bucket regardless of
        # bytes; without this floor a small stage with n_buckets >
        # target would "compact" n -> n files on every scheduled run.
        target_count = max(target_count, info0["bucket"]["n"])
    summary = {
        "stage": stage,
        "files_before": len(files),
        "bytes": data_bytes,
        "target_files": target_count,
    }
    if len(files) <= target_count:
        return dict(summary, action="noop")
    info = info0
    tmp = f"{path}.tmp-{run_id}"
    if info.get("bucket"):
        # Zero-shuffle re-cluster: with the auto-bucketed-scan rule
        # disabled (bucketed scan forced), the
        # catalog table scans as one partition per bucket (all of a
        # bucket's fragments combined), which already satisfies the
        # repartition's HashPartitioning — the Exchange is elided and
        # the CTAS emits one file per bucket.  Without the pin, Spark's
        # auto-bucketed-scan rule sees "no operator needs the
        # clustering", reverts to size-split file partitions AFTER the
        # shuffle was already elided, and the write fans out to
        # (tasks x buckets) files — re-fragmenting instead of packing.
        bucket = info["bucket"]
        conf_key = "spark.sql.sources.bucketing.autoBucketedScan.enabled"
        prev = spark.conf.get(conf_key, "true")
        spark.conf.set(conf_key, "false")
        try:
            df = read_stage(spark, root, stage).repartition(
                bucket["n"], *bucket["keys"]
            )
            _write_bucketed(df, tmp, root, stage, run_id, bucket)
        finally:
            spark.conf.set(conf_key, prev)
    else:
        df = read_stage(spark, root, stage)
        _tune_codec(df)
        df.coalesce(target_count).write.mode("overwrite").option(
            "compression", PARQUET_CODEC
        ).parquet(tmp)
    compactions = info.get("compactions", [])
    compactions.append(
        {
            "run_id": run_id,
            "committed_at": time.time(),
            "files_before": len(files),
            "files_after": len(_part_files(tmp)),
        }
    )
    info.update({"compactions": compactions})
    with open(os.path.join(tmp, MARKER), "w", encoding="utf-8") as fh:
        json.dump(info, fh)
    _swap_into_place(path, tmp, run_id)
    spark.catalog.refreshByPath(path)
    if info.get("bucket"):
        register_stage_table(spark, root, stage)
    return dict(
        summary, action="compacted", files_after=len(_part_files(path))
    )


def read_stage(spark: SparkSession, root: str, stage: str) -> DataFrame:
    is_committed(root, stage)  # triggers mid-swap crash recovery
    info = marker_info(root, stage)
    if info and info.get("bucket"):
        name = _table_name(root, stage)
        if spark.catalog.tableExists(name):
            spark.catalog.refreshTable(name)
            return spark.table(name)
        return register_stage_table(spark, root, stage)
    return spark.read.parquet(_dir(root, stage))


def marker_info(root: str, stage: str) -> dict | None:
    p = os.path.join(_dir(root, stage), MARKER)
    if not os.path.exists(p):
        return None
    with open(p, encoding="utf-8") as fh:
        return json.load(fh)
