"""Build the --py-files artifact: dist/tablecloth_time_spark.zip.

Usage: python scripts/package.py  ->  prints the artifact path.
Ship with:
  spark-submit --py-files dist/tablecloth_time_spark.zip \\
      scripts/run_pipeline.py --input ... --output ...
"""

from __future__ import annotations

import os
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PKG = "tablecloth_time_spark"


def build(dist_dir: str | None = None) -> str:
    dist_dir = dist_dir or os.path.join(REPO, "dist")
    os.makedirs(dist_dir, exist_ok=True)
    out = os.path.join(dist_dir, f"{PKG}.zip")
    src_root = os.path.join(REPO, PKG)
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as z:
        for dirpath, _dirnames, filenames in os.walk(src_root):
            if "__pycache__" in dirpath:
                continue
            for fn in sorted(filenames):
                if not fn.endswith(".py"):
                    continue
                full = os.path.join(dirpath, fn)
                rel = os.path.relpath(full, REPO)
                z.write(full, rel)
    return out


if __name__ == "__main__":
    print(build())
