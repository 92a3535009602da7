"""Ship this package to executor Python workers.

Any operator that crosses the Python-UDF boundary (mapInPandas /
applyInPandas) pickles closures that reference this package by module
name — but executor Python workers don't inherit the driver's
``sys.path``, so the import fails unless the package is distributed.
``spark.sparkContext.addPyFile`` with a zip of the package is the
standard mechanism (works the same on a real cluster, where it also
handles shipping to remote executors).

Idempotent per SparkContext.
"""

from __future__ import annotations

import os
import tempfile
import zipfile

from pyspark.sql import SparkSession

_SHIPPED: set[int] = set()


def ensure_package_shipped(spark: SparkSession) -> None:
    sc = spark.sparkContext
    key = id(sc)
    if key in _SHIPPED:
        return

    import uwheel_datafusion_spark as pkg

    pkg_dir = os.path.dirname(os.path.abspath(pkg.__file__))
    zip_path = os.path.join(
        tempfile.gettempdir(), f"uwheel_datafusion_spark_{os.getpid()}.zip"
    )
    if not os.path.exists(zip_path):
        with zipfile.ZipFile(zip_path, "w", zipfile.ZIP_DEFLATED) as zf:
            for root, _dirs, files in os.walk(pkg_dir):
                if "__pycache__" in root:
                    continue
                for f in files:
                    if not f.endswith(".py"):
                        continue
                    full = os.path.join(root, f)
                    rel = os.path.join(
                        "uwheel_datafusion_spark", os.path.relpath(full, pkg_dir)
                    )
                    zf.write(full, rel)
    sc.addPyFile(zip_path)
    _SHIPPED.add(key)
