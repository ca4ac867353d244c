"""Ship the package to Spark executors at runtime.

Pandas-UDF closures are cloudpickled *by reference* for importable
modules, so executor Python workers must be able to import
``keywords4cv_spark`` themselves. Under ``spark-submit --py-files``
(the north_rule deployment) that's given; when a host process creates
its own SparkSession from an arbitrary CWD (the driver harness, a
notebook), it is not — so every UDF-bearing entry point calls
``ensure_py_files(spark)``, which zips this package once and
``addPyFile``s it to the live SparkContext.
"""

from __future__ import annotations

import os
import tempfile
import zipfile

from pyspark.sql import SparkSession

_ADDED: set[int] = set()
_ZIP_PATH: str | None = None


def _package_zip() -> str:
    global _ZIP_PATH
    if _ZIP_PATH and os.path.exists(_ZIP_PATH):
        return _ZIP_PATH
    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    fd, zpath = tempfile.mkstemp(prefix="keywords4cv_spark_", suffix=".zip")
    os.close(fd)
    with zipfile.ZipFile(zpath, "w") as z:
        for root, _, files in os.walk(pkg_dir):
            for f in sorted(files):
                if f.endswith((".py", ".json")):
                    full = os.path.join(root, f)
                    rel = os.path.relpath(full, os.path.dirname(pkg_dir))
                    z.write(full, rel)
    _ZIP_PATH = zpath
    return zpath


def ensure_py_files(spark: SparkSession) -> None:
    sc = spark.sparkContext
    key = id(sc)
    if key in _ADDED:
        return
    sc.addPyFile(_package_zip())
    _ADDED.add(key)
