"""Incremental per-url extraction (anti-join against the committed
snapshot) + spark-submit packaging."""

from pdf_extraction_spark import oracle
from pdf_extraction_spark.plans import stage_store
from pdf_extraction_spark.plans.pipeline import run_incremental, run_pipeline
from pdf_extraction_spark.sources.corpus import corpus_df, generate_corpus


def test_incremental_extracts_only_new_urls(spark, work_dir):
    root = f"{work_dir}/incr"
    run_pipeline(spark, corpus_df(spark, 60), root, resume=False, run_id="base")

    out = run_incremental(spark, corpus_df(spark, 90), root, run_id="incr")
    # extraction increment covered exactly the 30 new urls
    m = out["metrics"].filter("stage = 'extract_increment'").collect()
    assert sum(r["urls_in"] for r in m) >= 30
    inc_urls = {
        r["url"]
        for r in out["pages"].select("url").distinct().collect()
    }
    assert len(inc_urls) == 90
    info = stage_store.marker_info(root, "pages")
    assert info["run_id"] == "base"
    assert [a["run_id"] for a in info.get("upserts", [])] == ["incr"]

    # final text byte-identical to the oracle over the full 90 docs
    exp = oracle.extract_corpus(generate_corpus(90))
    got = {r["url"]: r["extracted_text"] for r in out["doc_text"].collect()}
    assert all(got.get(u, "") == v["text"] for u, v in exp.items())


def test_incremental_merge_replaces_changed_url(spark, work_dir):
    """MERGE semantics (reference ON DUPLICATE KEY UPDATE,
    load_to_db.py:338-364): re-running with one url's content changed
    re-extracts exactly that url, replaces its rows in place (one row
    set per url, new content wins), and leaves everything else
    untouched."""
    from pyspark.sql import functions as F

    root = f"{work_dir}/merge"
    base = corpus_df(spark, 40)
    run_pipeline(spark, base, root, resume=False, run_id="base")

    rows = base.select("url", "html").orderBy("url").limit(2).collect()
    target, donor = rows[0], rows[1]
    mutated = base.withColumn(
        "html",
        F.when(F.col("url") == target.url, F.lit(donor.html)).otherwise(
            F.col("html")
        ),
    )
    out = run_incremental(spark, mutated, root, run_id="upd")

    # only the changed url was re-extracted
    m = out["metrics"].filter("stage = 'extract_increment'").collect()
    assert sum(r["urls_in"] for r in m) == 1
    # no duplicate page rows: each (url, page_no) appears once
    dupes = (
        out["pages"].groupBy("url", "page_no").count().filter("count > 1").count()
    )
    assert dupes == 0
    # new content wins: the target url now extracts like the donor's html
    got = {r["url"]: r["extracted_text"] for r in out["doc_text"].collect()}
    assert got.get(target.url, "") == got.get(donor.url, "")
    # idempotence: a second incremental run with the same input is a no-op
    out2 = run_incremental(spark, mutated, root, run_id="noop")
    m2 = out2["metrics"].filter("stage = 'extract_increment'").collect()
    assert sum(r["urls_in"] for r in m2 if r["run_id"] == "noop") == 0


def test_pyfiles_package_importable(tmp_path):
    import subprocess
    import sys

    from tools.make_pyfiles import build

    zip_path = build(str(tmp_path / "pkg.zip"))
    code = (
        "import sys; sys.path.insert(0, sys.argv[1]); "
        "import pdf_extraction_spark.operators.layout as L; "
        "import pdf_extraction_spark.plans.pipeline as P; "
        "print('ok', L.__name__, P.__name__)"
    )
    res = subprocess.run(
        [sys.executable, "-c", code, zip_path],
        capture_output=True, text=True, cwd=str(tmp_path),
    )
    assert res.returncode == 0 and "ok" in res.stdout
