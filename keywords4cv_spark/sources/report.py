"""S10: HTML + JSON metrics report sink.

Re-expresses the reference's metrics reporter
(/root/reference/metrics_reporter.py:39-288: metrics.json, keyword
score-distribution plot, category distribution, skill coverage, HTML
shell) without matplotlib/seaborn (not in this container): the charts
are inline SVG bar charts rendered from aggregates. Everything plotted
is computed IN SPARK as aggregations — the driver only ever collects
bin counts, top-N rows and category counts (all report-sized), never
the underlying relation.
"""

from __future__ import annotations

import json
import os
from html import escape

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

N_BINS = 10
TOP_N = 20


def _svg_bars(pairs: list[tuple[str, float]], title: str, width: int = 640) -> str:
    """Minimal inline-SVG bar chart (label, value) — the plot stand-in."""
    if not pairs:
        return f"<p>{escape(title)}: no data</p>"
    bar_h, gap, label_w = 18, 4, 180
    vmax = max(v for _, v in pairs) or 1.0
    h = len(pairs) * (bar_h + gap) + 30
    rows = [
        f'<text x="0" y="20" font-size="14" font-weight="bold">{escape(title)}</text>'
    ]
    for i, (label, v) in enumerate(pairs):
        y = 30 + i * (bar_h + gap)
        w = max(1, int((width - label_w - 60) * v / vmax))
        rows.append(
            f'<text x="0" y="{y + 13}" font-size="11">{escape(str(label))[:28]}</text>'
            f'<rect x="{label_w}" y="{y}" width="{w}" height="{bar_h}" fill="#4878a8"/>'
            f'<text x="{label_w + w + 4}" y="{y + 13}" font-size="11">{v:g}</text>'
        )
    return (
        f'<svg xmlns="http://www.w3.org/2000/svg" width="{width}" height="{h}">'
        + "".join(rows)
        + "</svg>"
    )


def score_histogram(summary: DataFrame, score_col: str = "total_score") -> list[dict]:
    """Spark-side fixed-width histogram of a score column (N_BINS bins)."""
    lohi = summary.agg(
        F.min(score_col).alias("lo"), F.max(score_col).alias("hi")
    ).collect()[0]
    lo, hi = float(lohi["lo"] or 0.0), float(lohi["hi"] or 0.0)
    width = (hi - lo) / N_BINS or 1.0
    binned = (
        summary.withColumn(
            "bin",
            F.least(
                F.floor((F.col(score_col) - F.lit(lo)) / F.lit(width)),
                F.lit(N_BINS - 1),
            ).cast("int"),
        )
        .groupBy("bin")
        .agg(F.count("*").alias("n"))
        .collect()
    )
    counts = {int(r["bin"]): int(r["n"]) for r in binned}
    return [
        {
            "bin": b,
            "lo": round(lo + b * width, 6),
            "hi": round(lo + (b + 1) * width, 6),
            "count": counts.get(b, 0),
        }
        for b in range(N_BINS)
    ]


def write_metrics_report(
    out_dir: str,
    run_id: str,
    summary: DataFrame,
    metrics: dict | None = None,
    top_n: int = TOP_N,
) -> str:
    """Write report.html + metrics.json under out_dir; returns html path.

    ``summary`` is the keyword-summary relation (term, total_score,
    avg_score, job_count[, category]). ``metrics`` is any extra scalar
    dict (e.g. extraction_metrics collected row) merged into the JSON.
    """
    os.makedirs(out_dir, exist_ok=True)
    hist = score_histogram(summary)
    top = [
        (r["term"], float(r["total_score"]))
        for r in summary.orderBy(F.col("total_score").desc(), F.col("term"))
        .limit(top_n)
        .collect()
    ]
    cats = []
    if "category" in summary.columns:
        cats = [
            (r["category"], int(r["n"]))
            for r in summary.groupBy("category")
            .agg(F.count("*").alias("n"))
            .orderBy(F.col("n").desc(), F.col("category"))
            .limit(10)
            .collect()
        ]
    n_terms = int(summary.count())

    payload = {
        "run_id": run_id,
        "n_terms": n_terms,
        "score_histogram": hist,
        "top_keywords": [{"term": t, "total_score": s} for t, s in top],
        "category_counts": [{"category": c, "n": n} for c, n in cats],
        "metrics": metrics or {},
    }
    with open(os.path.join(out_dir, "metrics.json"), "w") as f:
        json.dump(payload, f, indent=2)

    hist_pairs = [
        (f"[{h['lo']:g}, {h['hi']:g})", float(h["count"])) for h in hist
    ]
    parts = [
        "<!DOCTYPE html><html><head><meta charset='utf-8'>",
        f"<title>keywords4cv_spark report {escape(run_id)}</title></head><body>",
        f"<h1>Analysis report — {escape(run_id)}</h1>",
        f"<p>{n_terms} keywords summarized.</p>",
        "<h2>Metrics</h2><table border='1' cellpadding='4'>",
    ]
    for k, v in (metrics or {}).items():
        parts.append(f"<tr><td>{escape(str(k))}</td><td>{escape(str(v))}</td></tr>")
    parts.append("</table><h2>Score distribution</h2>")
    parts.append(_svg_bars(hist_pairs, "Distribution of keyword scores"))
    parts.append("<h2>Top keywords</h2>")
    parts.append(_svg_bars(top, f"Top {len(top)} keywords by total score"))
    if cats:
        parts.append("<h2>Categories</h2>")
        parts.append(_svg_bars([(c, float(n)) for c, n in cats], "Keyword categories"))
    parts.append("</body></html>")
    html_path = os.path.join(out_dir, "report.html")
    with open(html_path, "w") as f:
        f.write("".join(parts))
    return html_path
