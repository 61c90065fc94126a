#!/usr/bin/env python
"""Package the engine for ``spark-submit --py-files`` (north rule:
multi-executor cluster submission).

Usage:
  python jobs/build_pyfiles.py            # -> dist/watermark_detector_spark.zip
  spark-submit --py-files dist/watermark_detector_spark.zip \\
      jobs/flagship_job.py --pages <iceberg-table-or-path> ...
"""

from __future__ import annotations

import os
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PKG = "watermark_detector_spark"


def build(out_path: str | None = None) -> str:
    out_path = out_path or os.path.join(REPO, "dist", f"{PKG}.zip")
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    with zipfile.ZipFile(out_path, "w", zipfile.ZIP_DEFLATED) as zf:
        for root, _dirs, files in os.walk(os.path.join(REPO, PKG)):
            if "__pycache__" in root:
                continue
            for f in sorted(files):
                if f.endswith(".py"):
                    full = os.path.join(root, f)
                    zf.write(full, os.path.relpath(full, REPO))
    return out_path


if __name__ == "__main__":
    print(build())
