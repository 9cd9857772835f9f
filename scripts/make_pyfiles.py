"""Build the spark-submit --py-files artifact (north_rule deployment):

    python scripts/make_pyfiles.py [out.zip]
    spark-submit --py-files filtlong_spark.zip your_job.py

The UDFs are additionally self-contained via by-value pickling
(functions/scoring._register_self_contained_pickling), so workers run
even without --py-files; shipping the zip is the conventional (and
debugger-friendly) deployment.
"""

from __future__ import annotations

import os
import sys
import zipfile

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def build(out: str) -> str:
    pkg = os.path.join(ROOT, "filtlong_spark")
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as z:
        for dirpath, _dirs, files in os.walk(pkg):
            if "__pycache__" in dirpath:
                continue
            for f in sorted(files):
                if f.endswith(".py"):
                    full = os.path.join(dirpath, f)
                    z.write(full, os.path.relpath(full, ROOT))
    return out


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else "filtlong_spark.zip"
    print(build(out))
