"""Build the spark-submit artifact: ummon_spark.zip for --py-files.

Usage:
  python package.py [out.zip]        # default dist/ummon_spark.zip
  spark-submit --py-files dist/ummon_spark.zip jobs/build_graph_job.py \
      --input s3://corpus/documents --output s3://graph/

The zip contains the ummon_spark package only (no tests/bench); any
job script imports it exactly as the local tree does.
"""

from __future__ import annotations

import os
import sys
import zipfile

REPO = os.path.dirname(os.path.abspath(__file__))


def build_zip(out: str = "dist/ummon_spark.zip") -> str:
    out = os.path.join(REPO, out) if not os.path.isabs(out) else out
    os.makedirs(os.path.dirname(out), exist_ok=True)
    pkg = os.path.join(REPO, "ummon_spark")
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as z:
        for root, _dirs, files in os.walk(pkg):
            if "__pycache__" in root:
                continue
            for f in sorted(files):
                if not f.endswith(".py"):
                    continue
                full = os.path.join(root, f)
                rel = os.path.relpath(full, REPO)
                z.write(full, rel)
    return out


if __name__ == "__main__":
    path = build_zip(sys.argv[1] if len(sys.argv) > 1 else "dist/ummon_spark.zip")
    print(path)
