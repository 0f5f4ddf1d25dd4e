"""Arrow-batched Python operators (the sanctioned slow path).

Demonstrates the two grouped pandas-UDF surfaces on a real statistic —
per-group ordinary-least-squares slope — so the pattern is load-bearing
and oracle-checkable (DuckDB's regr_slope), not a toy:

- ``group_ols_slope``: groupBy().applyInPandas — full pandas DataFrame
  per group in, one row out;
- ``slope_grouped_agg``: a grouped-agg pandas_udf usable inside
  ``.agg(...)`` alongside JVM aggregates.

Scale notes: both shuffle once on the group key and stream each group
through Arrow; memory is bounded by the largest single group (salting or
pre-aggregation applies if one group dominates). For statistics Spark
already has natively (covar/var/corr) prefer the JVM aggregate — these
exist for the semantics Spark lacks.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def group_ols_slope(
    df: DataFrame, group_cols: list[str], x_col: str, y_col: str
) -> DataFrame:
    """OLS slope of y on x per group via applyInPandas."""
    out_schema = (
        ", ".join(f"{c} string" for c in group_cols) + ", slope double, n bigint"
    )

    def fit(pdf: pd.DataFrame) -> pd.DataFrame:
        x, y = pdf[x_col].astype(float), pdf[y_col].astype(float)
        dx = x - x.mean()
        denom = float((dx * dx).sum())
        slope = float((dx * (y - y.mean())).sum() / denom) if denom else float("nan")
        head = {c: [pdf[c].iloc[0]] for c in group_cols}
        return pd.DataFrame({**head, "slope": [slope], "n": [len(pdf)]})

    return df.groupBy(*group_cols).applyInPandas(fit, out_schema)


@F.pandas_udf("double")
def _slope_udf(x: pd.Series, y: pd.Series) -> float:
    dx = x.astype(float) - x.astype(float).mean()
    denom = float((dx * dx).sum())
    if not denom:
        return float("nan")
    return float((dx * (y.astype(float) - y.astype(float).mean())).sum() / denom)


@F.pandas_udf("long")
def _count_udf(x: pd.Series) -> int:
    return len(x)


def slope_grouped_agg(df: DataFrame, group_cols: list[str], x_col: str, y_col: str) -> DataFrame:
    """Same statistic as a grouped-agg pandas UDF. NB: Spark forbids
    mixing grouped-agg pandas UDFs with JVM aggregates in one .agg(), so
    the row count is a pandas UDF as well."""
    return df.groupBy(*group_cols).agg(
        F.round(_slope_udf(F.col(x_col), F.col(y_col)), 6).alias("slope"),
        _count_udf(F.col(x_col)).alias("n"),
    )
