"""Crash-window recovery + admin CLI for the committed stage store.

The swap in commit_stage/upsert_stage has a window between
rename(path->old) and rename(tmp->path) where the stage path is
missing; these tests simulate each crash point by reproducing the
on-disk state it leaves behind and assert is_committed/read_stage heal
it.  The CLI mirrors the reference's collection manager
(fix_vector_db.py:20-33 --list/--remove/--confirm) plus gc/recover.
"""

import json
import os
import shutil

from pdf_extraction_spark.plans import stage_admin, stage_store


def _mk_stage(spark, root, stage, rows, run_id="r1", mark=True):
    df = spark.createDataFrame(rows, "k long, v string")
    path = os.path.join(root, stage)
    df.write.mode("overwrite").parquet(path)
    if mark:
        with open(os.path.join(path, stage_store.MARKER), "w") as fh:
            json.dump({"run_id": run_id, "committed_at": 0.0}, fh)
    return path


def test_recover_promotes_marked_tmp(spark, work_dir):
    """Crash between rename(path->old) and rename(tmp->path): the new
    snapshot was fully written+marked in tmp -> the commit takes
    effect (tmp promoted), the old rolled-aside snapshot is GC'd."""
    root = f"{work_dir}/rec1"
    os.makedirs(root)
    _mk_stage(spark, root, "s", [(1, "old")], run_id="base")
    os.rename(os.path.join(root, "s"), os.path.join(root, "s.old-new"))
    tmp = _mk_stage(spark, root, "s", [(2, "new")], run_id="new")
    os.rename(tmp, os.path.join(root, "s.tmp-new"))

    assert not os.path.exists(os.path.join(root, "s"))
    assert stage_store.is_committed(root, "s")  # heals in place
    got = stage_store.read_stage(spark, root, "s").collect()
    assert [(r.k, r.v) for r in got] == [(2, "new")]
    assert stage_store.marker_info(root, "s")["run_id"] == "new"
    # swap leftovers gone
    assert not os.path.exists(os.path.join(root, "s.old-new"))
    assert not os.path.exists(os.path.join(root, "s.tmp-new"))


def test_recover_restores_marked_old_when_tmp_unmarked(spark, work_dir):
    """Crash while writing tmp after path was renamed aside (or tmp's
    marker never landed): roll back to the old snapshot; the
    half-written tmp is garbage-collected."""
    root = f"{work_dir}/rec2"
    os.makedirs(root)
    _mk_stage(spark, root, "s", [(1, "old")], run_id="base")
    os.rename(os.path.join(root, "s"), os.path.join(root, "s.old-new"))
    tmp = _mk_stage(spark, root, "s", [(2, "half")], run_id="new", mark=False)
    os.rename(tmp, os.path.join(root, "s.tmp-new"))

    assert stage_store.is_committed(root, "s")
    got = stage_store.read_stage(spark, root, "s").collect()
    assert [(r.k, r.v) for r in got] == [(1, "old")]
    assert stage_store.marker_info(root, "s")["run_id"] == "base"
    assert not os.path.exists(os.path.join(root, "s.tmp-new"))


def test_recover_noop_without_snapshots(work_dir):
    root = f"{work_dir}/rec3"
    os.makedirs(root, exist_ok=True)
    assert stage_store.recover_stage(root, "missing") is None
    assert not stage_store.is_committed(root, "missing")


def test_gc_removes_orphans_only_when_committed(spark, work_dir):
    """Crash after rename(tmp->path) but before rmtree(old): path is
    committed, the old dir is an orphan -> gc removes it (and stale
    tmps) without touching the live stage."""
    root = f"{work_dir}/gc"
    os.makedirs(root)
    _mk_stage(spark, root, "s", [(1, "live")], run_id="r2")
    _mk_stage(spark, root, "s_old_src", [(0, "stale")], run_id="r1")
    os.rename(os.path.join(root, "s_old_src"), os.path.join(root, "s.old-r2"))
    os.makedirs(os.path.join(root, "s.tmp-r3"))

    removed = stage_store.gc_stage(root, "s")
    assert sorted(os.path.basename(p) for p in removed) == ["s.old-r2", "s.tmp-r3"]
    assert stage_store.is_committed(root, "s")
    got = stage_store.read_stage(spark, root, "s").collect()
    assert [(r.k, r.v) for r in got] == [(1, "live")]


def test_startup_gc_spares_live_writer_tmp(spark, work_dir):
    """The pipeline-startup GC (kinds=("old",)) must never delete a
    `.tmp-*` dir: an unmarked tmp is indistinguishable from a LIVE
    out-of-process writer's in-progress snapshot (round-5 advice) —
    only `.old-*` swap leftovers are safe to sweep there.  The full
    sweep stays available for the explicit admin --gc path."""
    root = f"{work_dir}/gc_live"
    os.makedirs(root)
    _mk_stage(spark, root, "s", [(1, "live")], run_id="r2")
    os.makedirs(os.path.join(root, "s.old-r2"))
    os.makedirs(os.path.join(root, "s.tmp-r3"))  # maybe a live writer

    removed = stage_store.gc_all(root, kinds=("old",))
    assert sorted(os.path.basename(p) for p in removed) == ["s.old-r2"]
    assert os.path.isdir(os.path.join(root, "s.tmp-r3"))  # untouched

    removed = stage_store.gc_all(root)  # admin full sweep
    assert sorted(os.path.basename(p) for p in removed) == ["s.tmp-r3"]


def test_admin_cli_list_remove_confirm_recover(spark, work_dir, capsys):
    root = f"{work_dir}/cli"
    os.makedirs(root)
    _mk_stage(spark, root, "pages", [(1, "a")], run_id="base")
    _mk_stage(spark, root, "chunks", [(2, "b")], run_id="base")

    stage_admin.main([root, "--list"])
    out = capsys.readouterr().out
    assert "pages" in out and "chunks" in out and "run_id=base" in out

    # remove is guarded exactly like the reference's --confirm gate
    stage_admin.main([root, "--remove", "chunks"])
    assert "--confirm" in capsys.readouterr().out
    assert os.path.exists(os.path.join(root, "chunks"))
    stage_admin.main([root, "--remove", "chunks", "--confirm"])
    assert "removed" in capsys.readouterr().out
    assert not os.path.exists(os.path.join(root, "chunks"))

    # recover finds a stage whose path vanished entirely mid-swap
    os.rename(os.path.join(root, "pages"), os.path.join(root, "pages.tmp-x"))
    stage_admin.main([root, "--recover"])
    assert "recovered pages: promoted_tmp" in capsys.readouterr().out
    assert stage_store.is_committed(root, "pages")

    shutil.rmtree(root)


def test_writer_tolerates_reader_promoted_tmp(spark, work_dir):
    """A reader's recover_stage racing the writer's swap window can
    promote the writer's marked tmp itself; the writer's own renames
    then hit FileNotFoundError.  _swap_into_place treats that as
    success iff the snapshot at path carries THIS run's marker — so a
    reader concurrent with a single out-of-process writer never fails
    the writer's commit (round-4 advice item 2)."""
    root = f"{work_dir}/race1"
    os.makedirs(root)
    # State after the race: reader already promoted the marked tmp to
    # path; the writer still holds tmp's (now-dangling) name.
    _mk_stage(spark, root, "s", [(2, "new")], run_id="new")
    stage_store._swap_into_place(
        os.path.join(root, "s"), os.path.join(root, "s.tmp-new"), "new"
    )
    got = stage_store.read_stage(spark, root, "s").collect()
    assert [(r.k, r.v) for r in got] == [(2, "new")]

    # Same shape but the snapshot at path belongs to ANOTHER run: the
    # missing tmp is a genuine error, not a healed race -> must raise.
    root2 = f"{work_dir}/race2"
    os.makedirs(root2)
    _mk_stage(spark, root2, "s", [(1, "other")], run_id="someone_else")
    import pytest
    with pytest.raises(FileNotFoundError):
        stage_store._swap_into_place(
            os.path.join(root2, "s"), os.path.join(root2, "s.tmp-mine"), "mine"
        )
    # and the foreign snapshot must survive the failed swap intact
    assert stage_store._marked_with(os.path.join(root2, "s"), "someone_else")


def test_bucketed_retry_after_crash_before_marker(spark, work_dir):
    """A crash between the bucketed CTAS and the marker write leaves a
    non-empty unmarked tmp; a retry with the same run_id must clobber
    it (saveAsTable refuses non-empty locations by default — round-4
    advice item 4)."""
    root = f"{work_dir}/retry"
    os.makedirs(root)
    leftover = os.path.join(root, "s.tmp-r1")
    os.makedirs(leftover)
    with open(os.path.join(leftover, "part-junk.parquet"), "w") as fh:
        fh.write("half-written garbage")
    df = spark.createDataFrame([(1, "a"), (2, "b")], "k long, v string")
    out = stage_store.commit_stage(
        df, root, "s", "r1", bucket_by=["k"], n_buckets=4
    )
    assert sorted((r.k, r.v) for r in out.collect()) == [(1, "a"), (2, "b")]
    assert stage_store.marker_info(root, "s")["bucket"]["keys"] == ["k"]


def test_bucketed_upsert_schema_evolution_refreshes_ddl(spark, work_dir):
    """A schema-evolving upsert on a bucketed stage widens the parquet
    files via unionByName(allowMissingColumns); the marker's DDL must
    follow, or register_stage_table re-creates the catalog table from
    the stale column list and silently drops the new columns on every
    later read (round-4 advice item 1 — medium)."""
    root = f"{work_dir}/evolve"
    os.makedirs(root)
    base = spark.createDataFrame([(1, "a"), (2, "b")], "k long, v string")
    stage_store.commit_stage(base, root, "s", "r1", bucket_by=["k"], n_buckets=4)

    widened = spark.createDataFrame([(2, "b2", 9.5)], "k long, v string, w double")
    up = stage_store.upsert_stage(widened, root, "s", "r2", ["k"])
    assert "w" in up.columns
    ddl = stage_store.marker_info(root, "s")["bucket"]["ddl"]
    assert "`w` double" in ddl

    # a FRESH registration (new session would do the same) sees `w`
    spark.sql(f"DROP TABLE IF EXISTS `{stage_store._table_name(root, 's')}`")
    again = stage_store.read_stage(spark, root, "s")
    rows = {r.k: (r.v, r.w) for r in again.collect()}
    assert rows == {1: ("a", None), 2: ("b2", 9.5)}
    # and the re-registered table still plans exchange-free on the key
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        from pyspark.sql import functions as F
        aplan = (
            again.groupBy("k").agg(F.count("*").alias("n"))
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "Exchange" not in aplan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_compact_stage_binpacks_append_fragments(spark, work_dir):
    """append_stage adds files every increment and never rewrites, so an
    append-heavy stage fragments; compact_stage binpacks it back under
    the trigger count, result-neutral, keeping the marker history
    (Iceberg rewrite_data_files in production)."""
    root = f"{work_dir}/compact"
    os.makedirs(root)
    base = spark.createDataFrame(
        [(i, f"v{i}") for i in range(8)], "k long, v string"
    ).repartition(4)
    stage_store.commit_stage(base, root, "s", "r1")
    for j in range(4):
        inc = spark.createDataFrame([(100 + j, "a")], "k long, v string")
        stage_store.append_stage(inc, root, "s", f"a{j}")
    path = os.path.join(root, "s")
    before = stage_store._part_files(path)
    assert len(before) > 2
    expected = sorted(
        (r.k, r.v) for r in spark.read.parquet(path).collect()
    )

    res = stage_store.compact_stage(
        spark, root, "s", "c1", target_bytes=1 << 30, min_files=2
    )
    assert res["action"] == "compacted"
    assert res["files_before"] == len(before)
    after = stage_store._part_files(path)
    assert len(after) <= 2
    assert sorted((r.k, r.v) for r in spark.read.parquet(path).collect()) == expected

    info = stage_store.marker_info(root, "s")
    assert len(info["appends"]) == 4  # history preserved
    assert info["compactions"][-1]["run_id"] == "c1"
    assert stage_store.is_committed(root, "s")

    # at-or-below the trigger -> no-op (safe to run on a schedule)
    res2 = stage_store.compact_stage(
        spark, root, "s", "c2", target_bytes=1 << 30, min_files=2
    )
    assert res2["action"] == "noop"
    assert len(stage_store.marker_info(root, "s").get("compactions", [])) == 1


def test_compact_bucketed_stage_reclusters(spark, work_dir):
    """A bucketed stage written from many input partitions emits up to
    (tasks x buckets) files; compaction re-clusters to ~one file per
    bucket and the re-registered table still carries the bucket spec."""
    root = f"{work_dir}/compactb"
    os.makedirs(root)
    df = spark.createDataFrame(
        [(i, f"v{i}") for i in range(32)], "k long, v string"
    ).repartition(8)
    stage_store.commit_stage(df, root, "b", "r1", bucket_by=["k"], n_buckets=4)
    path = os.path.join(root, "b")
    before = len(stage_store._part_files(path))
    assert before > 4
    expected = sorted(
        (r.k, r.v) for r in stage_store.read_stage(spark, root, "b").collect()
    )

    res = stage_store.compact_stage(
        spark, root, "b", "c1", target_bytes=1 << 30, min_files=4
    )
    assert res["action"] == "compacted"
    assert len(stage_store._part_files(path)) <= 4
    out = stage_store.read_stage(spark, root, "b")
    assert sorted((r.k, r.v) for r in out.collect()) == expected
    assert stage_store.marker_info(root, "b")["bucket"]["n"] == 4

    # converges: a bucketed rewrite emits ~n_buckets files no matter
    # what, so the trigger floors at n and a re-run is a no-op even
    # with min_files below the bucket count (schedulable)
    res2 = stage_store.compact_stage(
        spark, root, "b", "c2", target_bytes=1 << 30, min_files=1
    )
    assert res2["action"] == "noop"
    assert res2["target_files"] == 4


def test_admin_cli_compact(spark, work_dir, capsys):
    root = f"{work_dir}/clicompact"
    os.makedirs(root)
    base = spark.createDataFrame([(1, "a")], "k long, v string")
    stage_store.commit_stage(base, root, "s", "r1")
    for j in range(3):
        inc = spark.createDataFrame([(10 + j, "b")], "k long, v string")
        stage_store.append_stage(inc, root, "s", f"a{j}")

    stage_admin.main(
        [root, "--compact", "s", "--min-files", "1", "--target-mb", "1024"]
    )
    out = capsys.readouterr().out
    assert "compacted" in out
    assert len(stage_store._part_files(os.path.join(root, "s"))) <= 1

    stage_admin.main(
        [root, "--compact", "s", "--min-files", "1", "--target-mb", "1024"]
    )
    assert "already compact" in capsys.readouterr().out


def test_compact_then_append_then_upsert_lifecycle(spark, work_dir):
    """The full append-heavy deployment loop: fragment -> compact ->
    keep appending -> MERGE upsert.  Each transition must preserve rows
    and the marker's history chain (a compacted snapshot is a normal
    committed snapshot — not a special state later writers can trip
    over)."""
    root = f"{work_dir}/lifecycle"
    os.makedirs(root)
    base = spark.createDataFrame(
        [(i, f"v{i}") for i in range(4)], "k long, v string"
    ).repartition(4)
    stage_store.commit_stage(base, root, "s", "r1")
    for j in range(4):
        inc = spark.createDataFrame([(10 + j, "a")], "k long, v string")
        stage_store.append_stage(inc, root, "s", f"a{j}")

    res = stage_store.compact_stage(
        spark, root, "s", "c1", target_bytes=1 << 30, min_files=2
    )
    assert res["action"] == "compacted"

    # append AFTER compaction: a compacted stage accepts increments and
    # the marker keeps both histories
    inc = spark.createDataFrame([(99, "late")], "k long, v string")
    stage_store.append_stage(inc, root, "s", "a9")
    info = stage_store.marker_info(root, "s")
    assert info["compactions"][-1]["run_id"] == "c1"
    assert info["appends"][-1]["run_id"] == "a9"

    # MERGE upsert after compaction: keyed rows replaced, rest kept,
    # snapshot still committed and readable
    up = spark.createDataFrame([(0, "NEW"), (99, "NEW")], "k long, v string")
    stage_store.upsert_stage(up, root, "s", "u1", keys=["k"])
    got = dict(
        (r.k, r.v)
        for r in stage_store.read_stage(spark, root, "s").collect()
    )
    expected = {i: f"v{i}" for i in range(1, 4)}
    expected.update({10 + j: "a" for j in range(4)})
    expected.update({0: "NEW", 99: "NEW"})
    assert got == expected
    assert stage_store.is_committed(root, "s")

    # and the compacted-then-upserted stage still compacts (full loop)
    res2 = stage_store.compact_stage(
        spark, root, "s", "c2", target_bytes=1 << 30, min_files=1
    )
    assert res2["action"] in ("compacted", "noop")
    assert sorted(
        (r.k, r.v)
        for r in stage_store.read_stage(spark, root, "s").collect()
    ) == sorted(got.items())
