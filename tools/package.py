"""Build the --py-files artifact for cluster submission.

    python tools/package.py [out.zip]          # default: dist/search_engine_spark.zip
    spark-submit --master <cluster> \
        --py-files dist/search_engine_spark.zip build.py --format iceberg …

The zip carries the package sources plus the stopword fixture the
tokenizer loads relative to the package root. Verified locally:
`spark-submit --master local[8] --py-files <zip> build.py --synthetic 30
--out /tmp/idx` runs the full checkpointed build.
"""

from __future__ import annotations

import os
import sys
import zipfile

ROOT = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))


def main() -> None:
    out = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        ROOT, "dist", "search_engine_spark.zip")
    os.makedirs(os.path.dirname(out), exist_ok=True)
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as z:
        for root, _, files in os.walk(os.path.join(ROOT, "search_engine_spark")):
            if "__pycache__" in root:
                continue
            for f in sorted(files):
                # .py sources + package data (the stopword fixture,
                # loaded via importlib.resources so it works from the zip)
                if f.endswith((".py", ".txt")):
                    p = os.path.join(root, f)
                    z.write(p, os.path.relpath(p, ROOT))
    print(out)


if __name__ == "__main__":
    main()
