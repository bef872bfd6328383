"""Package the engine for ``spark-submit --py-files`` (north-rule launch
shape): builds ``dist/geetiles_spark.zip`` containing the package sources,
importable by every executor.

Cluster launch (the BASELINE.json north rule's two-size criterion):

    python scripts/build_pyfiles.py
    spark-submit --py-files dist/geetiles_spark.zip \
        --conf spark.sql.adaptive.enabled=true \
        --conf spark.sql.shuffle.partitions=<4 x total-cores> \
        scripts/run_pipeline.py --sf-dir <data> ...

The zip carries only ``geetiles_spark/`` (pure Python + numpy — no native
deps), so the same artifact runs at N and 4N executors unchanged.
"""

from __future__ import annotations

import os
import zipfile

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def build(out_path: str | None = None) -> str:
    out_path = out_path or os.path.join(ROOT, "dist", "geetiles_spark.zip")
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    pkg = os.path.join(ROOT, "geetiles_spark")
    with zipfile.ZipFile(out_path, "w", zipfile.ZIP_DEFLATED) as z:
        for dirpath, _dirnames, filenames in os.walk(pkg):
            if "__pycache__" in dirpath:
                continue
            for fn in sorted(filenames):
                if not fn.endswith(".py"):
                    continue
                full = os.path.join(dirpath, fn)
                z.write(full, os.path.relpath(full, ROOT))
    return out_path


if __name__ == "__main__":
    p = build()
    print(p)
