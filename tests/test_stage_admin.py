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
