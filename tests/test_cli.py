"""End-to-end CLI run over the reference's input format."""

from __future__ import annotations

import json
import os
import subprocess
import sys

JOBS = {
    "Data Engineer": "build spark pipelines and merge sort large tables "
                     "with vector search and table scans every day",
    "Search Engineer": "the search index uses merge join and table scan "
                       "operators with spark and vector retrieval",
    "Analyst": "analyze data tables and sort results for the team",
}


def test_cli_end_to_end(tmp_path):
    inp = tmp_path / "jobs.json"
    inp.write_text(json.dumps(JOBS))
    out = tmp_path / "out"
    env = dict(os.environ, SPARK_GRAFT_CPUS="4", SPARK_GRAFT_DRIVER_MEM="2g")
    r = subprocess.run(
        [sys.executable, "-m", "keywords4cv_spark", "-i", str(inp), "-o", str(out)],
        capture_output=True,
        text=True,
        timeout=300,
        cwd="/root/repo",
        env=env,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    status = json.loads(r.stdout.strip().splitlines()[-1])
    assert status["n_docs"] == 3
    assert status["n_keywords"] > 5
    assert 0.0 <= status["f1"] <= 1.0
    assert os.path.exists(os.path.join(str(out), "results", "summary", "_SUCCESS"))
    assert os.path.exists(os.path.join(str(out), "results", "details", "_SUCCESS"))
    assert os.path.exists(status["report"])
    payload = json.load(
        open(os.path.join(str(out), "report", "metrics.json"))
    )
    assert payload["n_terms"] == status["n_keywords"]
    # whitelist terms present in the corpus must surface in the summary
    import duckdb

    con = duckdb.connect()
    terms = {
        r2[0]
        for r2 in con.execute(
            f"SELECT term FROM '{out}/results/summary/*.parquet'"
        ).fetchall()
    }
    assert {"spark", "merge", "table"} <= terms


def test_cli_xlsx_output(tmp_path):
    inp = tmp_path / "jobs.json"
    inp.write_text(json.dumps(JOBS))
    out = tmp_path / "results.xlsx"
    env = dict(os.environ, SPARK_GRAFT_CPUS="4", SPARK_GRAFT_DRIVER_MEM="2g")
    r = subprocess.run(
        [sys.executable, "-m", "keywords4cv_spark", "-i", str(inp), "-o", str(out)],
        capture_output=True,
        text=True,
        timeout=300,
        cwd="/root/repo",
        env=env,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    status = json.loads(r.stdout.strip().splitlines()[-1])
    assert status["results"] == str(out)

    from keywords4cv_spark.sources.xlsx import read_xlsx

    sheets = read_xlsx(str(out))
    assert list(sheets) == ["Summary", "Detailed Scores"]
    assert len(sheets["Summary"]) == status["n_keywords"]
    assert {"spark", "merge", "table"} <= set(sheets["Summary"]["term"])
    assert {"doc_id", "term"} <= set(sheets["Detailed Scores"].columns)
