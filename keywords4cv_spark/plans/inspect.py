"""Physical-plan inspection helpers.

The engine's performance posture (SURVEY.md §4.3) is asserted, not
assumed: tests use these to check that filters reach the parquet scan
(PushedFilters), vocabulary-sized joins go broadcast, and the
relational glue stays inside whole-stage codegen.
"""

from __future__ import annotations

import re
from contextlib import contextmanager

from pyspark.sql import DataFrame


def explain_str(df: DataFrame, mode: str = "formatted") -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), mode
    )


def pushed_filters(df: DataFrame) -> list[str]:
    """PushedFilters entries from every scan node in the plan."""
    txt = explain_str(df)
    return re.findall(r"PushedFilters: \[([^\]]*)\]", txt)


def uses_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in explain_str(df)


def wholestage_codegen_spans(df: DataFrame) -> int:
    """Number of WholeStageCodegen spans in the executed plan (the AQE
    initial plan carries no codegen annotation). Fewer, wider spans are
    better; zero means nothing was codegen'd at all."""
    txt = df._jdf.queryExecution().executedPlan().toString()  # type: ignore[attr-defined]
    # codegen'd operators print as `*(N) Op`; distinct N = span count.
    # NB: under AQE the pre-execution plan shows no spans — build the
    # DataFrame inside without_aqe() before calling this.
    return len(set(re.findall(r"\*\((\d+)\)", txt)))


@contextmanager
def without_aqe(spark):
    """Plan-inspection context: AQE defers physical decisions to runtime,
    hiding codegen spans (and sometimes join strategy) from a static
    explain — disable it while *constructing* the DataFrame under test."""
    key = "spark.sql.adaptive.enabled"
    prev = spark.conf.get(key)
    spark.conf.set(key, "false")
    try:
        yield
    finally:
        spark.conf.set(key, prev)
