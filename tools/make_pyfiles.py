"""Package the engine for spark-submit (north_rule: ships via
spark-submit --py-files).

    python tools/make_pyfiles.py
    spark-submit --py-files .work/pdf_extraction_spark.zip \
        jobs/run_extraction.py --input <corpus.parquet> --out <dir>
"""

from __future__ import annotations

import os
import zipfile

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def build(out: str = None) -> str:
    out = out or os.path.join(ROOT, ".work", "pdf_extraction_spark.zip")
    os.makedirs(os.path.dirname(out), exist_ok=True)
    pkg = os.path.join(ROOT, "pdf_extraction_spark")
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as zf:
        for dirpath, _, files in os.walk(pkg):
            if "__pycache__" in dirpath:
                continue
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(dirpath, f)
                    zf.write(full, os.path.relpath(full, ROOT))
    return out


if __name__ == "__main__":
    print(build())
