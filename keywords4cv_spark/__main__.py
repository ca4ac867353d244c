"""End-to-end CLI — the reference's `python keywords4cv.py -i ... -o ...`
run (/root/reference/keywords4cv.py:3227-3260 parse_arguments + main)
re-expressed over the Spark engine:

    python -m keywords4cv_spark -i job_descriptions.json -o results.xlsx
    python -m keywords4cv_spark -i job_descriptions.json -o results_dir
    python -m keywords4cv_spark -i s3://bucket/docs.parquet -o out

Pipeline (the reference's analyze-and-save flow):
  load documents (reference JSON shape or any parquet with
  doc_id/text[/lang/source])
  → keyword summary (A2/A3: total/avg score, job count — O1/O2/O3/P9
    applied)
  → per-(doc, term) detail scores (the reference's 'Detailed Scores'
    sheet)
  → result sink: a real two-sheet .xlsx (Summary, Detailed Scores —
    the reference's S8 contract, stdlib OOXML writer) when -o ends in
    .xlsx, else two-sheet parquet + JSONL summary (S8/S9 data sinks)
  → HTML/JSON metrics report (S10) with extraction P/R/F1 (A7)

Prints one JSON status line (paths + headline counts).
"""

from __future__ import annotations

import argparse
import json
import os
import sys


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="keywords4cv_spark")
    ap.add_argument("-i", "--input", required=True,
                    help="job_descriptions.json ({title: description}) or a parquet path")
    ap.add_argument("-o", "--output", required=True, help="output directory")
    ap.add_argument("--k1", type=float, default=1.2)
    ap.add_argument("--b", type=float, default=0.75)
    ap.add_argument("--lang", default="en", help="language filter ('' disables)")
    ap.add_argument("--master", default=None, help="Spark master (default env/local)")
    args = ap.parse_args(argv)

    from keywords4cv_spark.config import EngineConfig
    from keywords4cv_spark.operators.evaluation import extraction_metrics
    from keywords4cv_spark.operators.scoring import keyword_summary, scored_postings
    from keywords4cv_spark.session import get_spark
    from keywords4cv_spark.sources.io import (
        load_job_descriptions_json,
        save_results_jsonl,
        summary_and_details,
    )
    from keywords4cv_spark.sources.report import write_metrics_report

    spark = get_spark(master=args.master, app_name="keywords4cv_spark-cli")
    cfg = EngineConfig(k1=args.k1, b=args.b, lang_filter=args.lang or None)

    if args.input.endswith(".json"):
        docs = load_job_descriptions_json(spark, args.input)
    else:
        docs = spark.read.parquet(args.input)
    # optional columns get defaults (the pipeline needs source for field
    # weights and lang for the filter)
    from pyspark.sql import functions as F

    if "source" not in docs.columns:
        docs = docs.withColumn("source", F.lit("default"))
    if "lang" not in docs.columns:
        docs = docs.withColumn("lang", F.lit(args.lang or "en"))
    docs = docs.persist()

    summary = keyword_summary(spark, docs, cfg).persist()
    details = scored_postings(spark, docs, cfg)
    if args.output.endswith(".xlsx"):
        # the reference's exact run shape: one workbook, atomic write
        from keywords4cv_spark.sources.xlsx import save_results_xlsx

        save_results_xlsx(summary, details, args.output)
        results_path = args.output
        report_dir = os.path.splitext(args.output)[0] + "_report"
    else:
        os.makedirs(args.output, exist_ok=True)
        summary_and_details(summary, details, os.path.join(args.output, "results"))
        save_results_jsonl(summary, os.path.join(args.output, "summary_jsonl"))
        results_path = os.path.join(args.output, "results")
        report_dir = os.path.join(args.output, "report")

    met_row = extraction_metrics(spark, docs, cfg).collect()[0].asDict()
    html = write_metrics_report(report_dir, "cli-run", summary, metrics=met_row)
    status = {
        "input": args.input,
        "n_docs": docs.count(),
        "n_keywords": summary.count(),
        "results": results_path,
        "report": html,
        "precision": met_row["precision"],
        "recall": met_row["recall"],
        "f1": met_row["f1"],
    }
    print(json.dumps(status))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
