"""Package the engine for spark-submit --py-files (north rule deployment).

Produces dist/copybook_rs_spark.zip containing the package tree; ship it
with `spark-submit --py-files dist/copybook_rs_spark.zip scripts/encode_job.py`.
"""

from __future__ import annotations

import os
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PKG = os.path.join(REPO, "copybook_rs_spark")
OUT = os.path.join(REPO, "dist", "copybook_rs_spark.zip")


def main() -> None:
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    with zipfile.ZipFile(OUT, "w", zipfile.ZIP_DEFLATED) as z:
        for dirpath, _dirnames, filenames in os.walk(PKG):
            if "__pycache__" in dirpath:
                continue
            for f in sorted(filenames):
                if f.endswith(".py"):
                    full = os.path.join(dirpath, f)
                    rel = os.path.relpath(full, REPO)
                    z.write(full, rel)
    print(OUT)


if __name__ == "__main__":
    main()
