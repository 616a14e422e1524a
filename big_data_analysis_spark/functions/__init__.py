"""Scalar function helpers shared across operators."""

from big_data_analysis_spark.functions.scalar import (  # noqa: F401
    array_l2,
    array_mean,
    clamp,
    minmax,
    pct_of_total,
    register,
    safe_div,
    zscore,
)
from big_data_analysis_spark.operators.text import cn_numeral_udf, parse_cn_numeral  # noqa: F401
