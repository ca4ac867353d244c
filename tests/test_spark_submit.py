"""North-rule deployment path: spark-submit --py-files <pkg.zip>.

Proves the engine runs under the real cluster launcher with the
package shipped as a zip (executors import keywords4cv_spark from
--py-files, no repo CWD) — the multi-executor deployment story the
sandbox can exercise end to end.
"""

from __future__ import annotations

import os
import shutil
import subprocess
import sys

import pytest

from keywords4cv_spark.deploy import _package_zip

DRIVER_SCRIPT = """
import sys
from pyspark.sql import SparkSession
spark = (SparkSession.builder
         .config("spark.sql.shuffle.partitions", "4")
         .config("spark.ui.enabled", "false")
         .getOrCreate())
from keywords4cv_spark.config import EngineConfig
from keywords4cv_spark.query.bm25 import bm25_brute_force
docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
out = bm25_brute_force(spark, docs, EngineConfig(), k=5,
                       queries=[(0, "the"), (0, "data")])
rows = out.collect()
assert len(rows) == 5 and rows[0].rank == 1, rows
print("SPARK_SUBMIT_OK", len(rows))
spark.stop()
"""


@pytest.mark.skipif(
    shutil.which("spark-submit") is None, reason="spark-submit not on PATH"
)
def test_spark_submit_py_files(tmp_path):
    script = tmp_path / "submit_main.py"
    script.write_text(DRIVER_SCRIPT)
    env = dict(os.environ)
    env.pop("PYTHONPATH", None)  # the zip must be the ONLY package source
    r = subprocess.run(
        [
            "spark-submit",
            "--master",
            "local[4]",
            "--py-files",
            _package_zip(),
            str(script),
        ],
        capture_output=True,
        text=True,
        timeout=300,
        cwd=str(tmp_path),
        env=env,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert "SPARK_SUBMIT_OK 5" in r.stdout, (r.stdout[-500:], r.stderr[-1000:])
