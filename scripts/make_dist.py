#!/usr/bin/env python
"""Package the engine for spark-submit --py-files (BASELINE.json:14).

    python scripts/make_dist.py            # -> dist/pyspider_spark.zip
    spark-submit --py-files dist/pyspider_spark.zip jobs/crawl_rounds.py ...

The zip contains only the importable package (no tests/fixcaches), so
the same artifact runs unchanged at N and 4N executors.
"""

from __future__ import annotations

import os
import zipfile

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> str:
    out_dir = os.path.join(ROOT, "dist")
    os.makedirs(out_dir, exist_ok=True)
    out = os.path.join(out_dir, "pyspider_spark.zip")
    pkg = os.path.join(ROOT, "pyspider_spark")
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as z:
        for dirpath, dirnames, filenames in os.walk(pkg):
            dirnames[:] = [d for d in dirnames if d != "__pycache__"]
            for fn in sorted(filenames):
                if fn.endswith(".py"):
                    full = os.path.join(dirpath, fn)
                    z.write(full, os.path.relpath(full, ROOT))
    print(out)
    return out


if __name__ == "__main__":
    main()
