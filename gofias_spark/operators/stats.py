"""Two-column metric aggregations the ES DSL ships as ``weighted_avg``
and ``matrix_stats`` — expressed directly as Spark's built-in partial+
final aggregates (one map-side-combinable pass, a scalar row out; no
UDFs, no shuffle of rows).

The reference's search surface is Elasticsearch; its aggregation DSL is
the contract being mirrored here (gofias itself only issues counts,
client.go:151-162).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def weighted_avg(
    df: DataFrame,
    value_col: str,
    weight_col: str,
) -> DataFrame:
    """ES ``weighted_avg`` aggregation: ``sum(value * weight) /
    sum(weight)`` over rows where BOTH are non-null (ES skips docs
    missing either; a null weight is not zero). One combinable scalar
    aggregation. Returns a single row ``(weighted_avg, n)``."""
    v, w = F.col(value_col), F.col(weight_col)
    ok = df.filter(v.isNotNull() & w.isNotNull())
    return ok.agg(
        F.round(
            F.sum(v.cast("double") * w.cast("double"))
            / F.sum(w.cast("double")),
            6,
        ).alias("weighted_avg"),
        F.count(F.lit(1)).alias("n"),
    )


def matrix_stats(
    df: DataFrame,
    x_col: str,
    y_col: str,
) -> DataFrame:
    """ES ``matrix_stats`` aggregation for a field pair: count, means,
    population variances, covariance, and Pearson correlation — Spark's
    ``var_pop`` / ``covar_pop`` / ``corr`` built-ins, i.e. one
    partial+final pass (ES matrix_stats is likewise population-moment
    based). Rows missing either field are skipped (ES's default
    listwise deletion). Returns one row
    ``(n, mean_x, mean_y, var_x, var_y, covariance, correlation)``."""
    x = F.col(x_col).cast("double")
    y = F.col(y_col).cast("double")
    ok = df.filter(x.isNotNull() & y.isNotNull())
    return ok.agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.avg(x), 6).alias("mean_x"),
        F.round(F.avg(y), 6).alias("mean_y"),
        F.round(F.var_pop(x), 6).alias("var_x"),
        F.round(F.var_pop(y), 6).alias("var_y"),
        F.round(F.covar_pop(x, y), 6).alias("covariance"),
        F.round(F.corr(x, y), 6).alias("correlation"),
    )
