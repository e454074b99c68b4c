"""Build the spark-submit --py-files artifact.

    python tools/package.py          # -> dist/scalpel_ts_spark.zip

Cluster launch (north rule: spark-submit --py-files):

    spark-submit \
        --py-files dist/scalpel_ts_spark.zip \
        --conf spark.sql.adaptive.enabled=true \
        --conf spark.sql.shuffle.partitions=<2-3x total executor cores> \
        your_crawl_job.py

The package is pure Python (stdlib + numpy/pandas on executors), so
the zip is directly importable by executor Python workers.
"""

from __future__ import annotations

import os
import sys
import zipfile

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def build(out_path: str | None = None) -> str:
    out_path = out_path or os.path.join(ROOT, "dist", "scalpel_ts_spark.zip")
    out_dir = os.path.dirname(out_path)
    if out_dir:  # bare filename: makedirs("") would raise
        os.makedirs(out_dir, exist_ok=True)
    pkg = os.path.join(ROOT, "scalpel_ts_spark")
    with zipfile.ZipFile(out_path, "w", zipfile.ZIP_DEFLATED) as zf:
        for dirpath, dirnames, filenames in os.walk(pkg):
            # prune (don't descend) __pycache__, and sort the walk so
            # the zip's entry order — hence its bytes — is
            # filesystem-independent and reproducible
            dirnames[:] = sorted(d for d in dirnames if d != "__pycache__")
            for fn in sorted(filenames):
                if not fn.endswith(".py"):
                    continue
                full = os.path.join(dirpath, fn)
                zf.write(full, os.path.relpath(full, ROOT))
    return out_path


if __name__ == "__main__":
    path = build(sys.argv[1] if len(sys.argv) > 1 else None)
    print(path)
