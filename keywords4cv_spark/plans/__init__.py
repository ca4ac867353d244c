from keywords4cv_spark.plans.inspect import (  # noqa: F401
    explain_str,
    pushed_filters,
    uses_broadcast_join,
    wholestage_codegen_spans,
    without_aqe,
)
