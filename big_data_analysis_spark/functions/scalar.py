"""Reusable Column-expression helpers (pure codegen, no UDFs unless
stated). These are the building blocks the operator modules compose;
they are also registered as SQL functions (see ``register``) so the
spark.sql surface can call them directly."""

from __future__ import annotations

from pyspark.sql import Column, Window
from pyspark.sql import functions as F


def safe_div(num: Column, den: Column) -> Column:
    """NULL (not error) on zero denominator — ANSI mode is ON engine-wide
    (Spark 4 default), so every ratio must guard its denominator."""
    return num / F.nullif(den, F.lit(0))


def pct_of_total(value: Column, partition_by: tuple = ()) -> Column:
    """Share of the (optionally partitioned) total — one extra window,
    no self-join with an aggregate."""
    w = Window.partitionBy(*partition_by) if partition_by else Window.partitionBy()
    return safe_div(value, F.sum(value).over(w))


def zscore(value: Column, partition_by: tuple = ()) -> Column:
    """Per-partition standardization as a window expression (the
    column-at-a-time analogue of ml.feature.StandardScaler)."""
    w = Window.partitionBy(*partition_by) if partition_by else Window.partitionBy()
    return safe_div(value - F.avg(value).over(w), F.stddev(value).over(w))


def minmax(value: Column, partition_by: tuple = ()) -> Column:
    """Per-partition min-max scaling to [0, 1]."""
    w = Window.partitionBy(*partition_by) if partition_by else Window.partitionBy()
    lo, hi = F.min(value).over(w), F.max(value).over(w)
    return safe_div(value - lo, hi - lo)


def clamp(value: Column, lo: float, hi: float) -> Column:
    return F.least(F.greatest(value, F.lit(lo)), F.lit(hi))


def array_mean(arr: Column) -> Column:
    """Mean of an array column — aggregate HOF, stays JVM-side."""
    return safe_div(
        F.aggregate(arr, F.lit(0.0), lambda acc, v: acc + v.cast("double")),
        F.size(arr).cast("double"),
    )


def array_l2(arr: Column) -> Column:
    """L2 norm of an array column."""
    return F.sqrt(F.aggregate(arr, F.lit(0.0), lambda acc, v: acc + v.cast("double") * v.cast("double")))


def register(spark) -> None:
    """Expose the Python-side scalar functions on the SQL surface.
    Expression helpers above are already SQL-expressible; only genuine
    UDFs need registration (P13 is the single one in the engine)."""
    from big_data_analysis_spark.operators.text import parse_cn_numeral

    spark.udf.register("cn_numeral", parse_cn_numeral, "int")
