"""S10 metrics report sink: JSON fields + HTML artifact."""

from __future__ import annotations

import json
import os

from keywords4cv_spark.config import EngineConfig
from keywords4cv_spark.operators import scoring
from keywords4cv_spark.sources.report import score_histogram, write_metrics_report

CFG = EngineConfig()


def test_metrics_report_artifacts(spark, sf_dir, tmp_path):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    summary = scoring.keyword_summary(spark, docs, CFG)
    html = write_metrics_report(
        str(tmp_path), "test-run", summary, metrics={"precision": 0.5}
    )
    assert os.path.exists(html)
    payload = json.load(open(os.path.join(str(tmp_path), "metrics.json")))
    assert payload["run_id"] == "test-run"
    assert payload["n_terms"] > 0
    assert len(payload["score_histogram"]) == 10
    assert sum(h["count"] for h in payload["score_histogram"]) == payload["n_terms"]
    assert payload["top_keywords"] and "term" in payload["top_keywords"][0]
    assert payload["metrics"]["precision"] == 0.5
    doc = open(html).read()
    assert "<svg" in doc and "Distribution of keyword scores" in doc


def test_score_histogram_bins_cover_range(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    summary = scoring.keyword_summary(spark, docs, CFG)
    hist = score_histogram(summary)
    lo = min(h["lo"] for h in hist)
    hi = max(h["hi"] for h in hist)
    stats = summary.selectExpr(
        "min(total_score) AS lo", "max(total_score) AS hi"
    ).collect()[0]
    assert lo <= float(stats["lo"]) and hi >= float(stats["hi"])
