"""Reusable composite operators that Spark lacks natively, each built
from shuffle-frugal compositions of built-in DataFrame ops (SURVEY §2b
"custom operators": composition first, pandas UDF only when semantics
demand it — none of these do)."""

from duva_spark.operators.asof import asof_join
from duva_spark.operators.topk import top_k_per_group
from duva_spark.operators.skew import salted_join

__all__ = ["asof_join", "top_k_per_group", "salted_join"]
