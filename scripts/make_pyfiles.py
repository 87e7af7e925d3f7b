#!/usr/bin/env python
"""Build the --py-files zip for cluster submission.

Usage: python scripts/make_pyfiles.py [out.zip]
Produces a zip with the idd_hw6_record_linkage_spark package at the
root, suitable for:

  spark-submit --py-files dist/linkage_spark.zip scripts/run_pipeline.py ...
"""

from __future__ import annotations

import os
import sys
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PKG = "idd_hw6_record_linkage_spark"


def build(out_path: str) -> str:
    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    with zipfile.ZipFile(out_path, "w", zipfile.ZIP_DEFLATED) as zf:
        pkg_dir = os.path.join(REPO, PKG)
        for root, _dirs, files in os.walk(pkg_dir):
            if "__pycache__" in root:
                continue
            for f in files:
                if not f.endswith(".py"):
                    continue
                full = os.path.join(root, f)
                rel = os.path.relpath(full, REPO)
                zf.write(full, rel)
    return out_path


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else os.path.join(REPO, "dist", "linkage_spark.zip")
    print(build(out))
