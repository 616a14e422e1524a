"""Scalar function helpers shared across operators."""

from big_data_analysis_spark.operators.text import cn_numeral_udf, parse_cn_numeral  # noqa: F401
