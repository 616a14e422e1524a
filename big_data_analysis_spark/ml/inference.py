"""Batch model inference over DataFrame columns (SURVEY.md §2.10 M25).

The reference's torch eval loop (猫狗大战分类.py:417-430) scores batches
and emits per-class probabilities. The Spark-native shape is an
Arrow-batched pandas UDF over a feature column: the model is loaded ONCE
per executor (closure / broadcast), batches stream through NumPy, and
the result is a probability array column — pyspark.ml's
``predict_batch_udf`` pattern, written out explicitly so any callable
(torch module, onnxruntime session, sklearn pipeline) plugs in.

The container ships no ML frameworks, so the default scorer is a
deterministic linear-softmax model; swapping in torch changes ONLY the
``model_fn`` closure.
"""

from __future__ import annotations

from collections.abc import Callable

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf


def linear_softmax_model(weights: list[list[float]], bias: list[float]) -> Callable:
    """Deterministic stand-in model: logits = X @ W + b -> softmax.
    Same contract as a torch ``forward`` on a numpy batch."""
    w = np.asarray(weights, dtype=np.float64)
    b = np.asarray(bias, dtype=np.float64)

    def model_fn(x: np.ndarray) -> np.ndarray:
        logits = x @ w + b
        logits -= logits.max(axis=1, keepdims=True)
        e = np.exp(logits)
        return e / e.sum(axis=1, keepdims=True)

    return model_fn


def batch_predict(
    df: DataFrame,
    features_col: str,
    model_fn: Callable[[np.ndarray], np.ndarray],
    out_col: str = "probabilities",
) -> DataFrame:
    """M25: append per-class probabilities from ``model_fn`` applied to
    an ``array<float/double>`` feature column.

    Arrow batches the transfer; ``model_fn`` sees a (batch, dim) numpy
    matrix — one BLAS/torch call per batch, never per-row Python. On a
    GPU cluster, batch size is governed by
    ``spark.sql.execution.arrow.maxRecordsPerBatch``.
    """

    @pandas_udf("array<double>")
    def predict(features: pd.Series) -> pd.Series:
        x = np.stack(features.to_numpy())
        probs = model_fn(x.astype(np.float64))
        return pd.Series(list(probs))

    return df.withColumn(out_col, predict(F.col(features_col)))


def argmax_prediction(df: DataFrame, prob_col: str = "probabilities", out_col: str = "prediction") -> DataFrame:
    """Class decision from the probability vector — JVM-side expression
    (array_position of the max), no second Python hop."""
    probs = F.col(prob_col)
    return df.withColumn(out_col, (F.array_position(probs, F.array_max(probs)) - 1).cast("long"))
