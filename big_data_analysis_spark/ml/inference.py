"""Batch model inference over DataFrame columns (SURVEY.md §2.10 M25).

The reference's torch eval loop (猫狗大战分类.py:417-430) scores batches
and emits per-class probabilities. The Spark-native shape is an
Arrow-batched pandas UDF over a feature column: the model is loaded ONCE
per executor (closure / broadcast), batches stream through NumPy, and
the result is a probability array column — pyspark.ml's
``predict_batch_udf`` pattern, written out explicitly so any callable
(torch module, onnxruntime session, sklearn pipeline) plugs in.

The container ships no ML frameworks, so two scorers are provided:
a deterministic linear-softmax stand-in, and a REAL trained artifact —
``NumpyMLP``, a from-scratch one-hidden-layer softmax network whose
weights are serialized with ``np.savez`` and re-loaded INSIDE the
executor UDF from a SparkFiles-distributed file, exactly the lifecycle
a torch checkpoint would follow. Swapping in torch changes ONLY the
``model_fn`` closure / the artifact loader.
"""

from __future__ import annotations

import os
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


class NumpyMLP:
    """A real (tiny) model for the M25 path: one tanh hidden layer +
    softmax head, trained by full-batch gradient descent on the driver,
    serialized as an ``.npz`` artifact. Exists so the executor-side
    load-and-score lifecycle is exercised with weights that actually
    learned something (the parity test trains it on XOR — a problem the
    linear stand-in provably cannot fit)."""

    def __init__(self, w1: np.ndarray, b1: np.ndarray, w2: np.ndarray, b2: np.ndarray):
        self.w1, self.b1, self.w2, self.b2 = w1, b1, w2, b2

    @staticmethod
    def _softmax(z: np.ndarray) -> np.ndarray:
        z = z - z.max(axis=1, keepdims=True)
        e = np.exp(z)
        return e / e.sum(axis=1, keepdims=True)

    def forward(self, x: np.ndarray) -> np.ndarray:
        h = np.tanh(x @ self.w1 + self.b1)
        return self._softmax(h @ self.w2 + self.b2)

    @classmethod
    def train(
        cls,
        x: np.ndarray,
        y: np.ndarray,
        hidden: int = 8,
        n_classes: int = 2,
        lr: float = 0.5,
        epochs: int = 500,
        seed: int = 0,
    ) -> "NumpyMLP":
        rng = np.random.default_rng(seed)
        d = x.shape[1]
        m = cls(
            rng.normal(0, 0.5, (d, hidden)),
            np.zeros(hidden),
            rng.normal(0, 0.5, (hidden, n_classes)),
            np.zeros(n_classes),
        )
        onehot = np.eye(n_classes)[y.astype(int)]
        n = len(x)
        for _ in range(epochs):
            h = np.tanh(x @ m.w1 + m.b1)
            p = cls._softmax(h @ m.w2 + m.b2)
            g2 = (p - onehot) / n                       # dL/dlogits
            gh = (g2 @ m.w2.T) * (1 - h * h)            # back through tanh
            m.w2 -= lr * h.T @ g2
            m.b2 -= lr * g2.sum(0)
            m.w1 -= lr * x.T @ gh
            m.b1 -= lr * gh.sum(0)
        return m

    def save(self, path: str) -> str:
        """Returns the actual path written: np.savez appends '.npz'
        when the suffix is missing, which would otherwise desync the
        saved file from the path handed to addFile() (the executor-side
        SparkFiles.get would then miss at task runtime)."""
        if not path.endswith(".npz"):
            path = path + ".npz"
        np.savez(path, w1=self.w1, b1=self.b1, w2=self.w2, b2=self.b2)
        return path

    @classmethod
    def load(cls, path: str) -> "NumpyMLP":
        z = np.load(path)
        return cls(z["w1"], z["b1"], z["w2"], z["b2"])


def batch_predict_from_artifact(
    df: DataFrame,
    features_col: str,
    artifact_path: str,
    out_col: str = "probabilities",
) -> DataFrame:
    """M25 with the full checkpoint lifecycle: the artifact file is
    shipped to every executor via ``SparkContext.addFile`` and loaded
    lazily INSIDE the UDF (once per worker process, cached in the
    closure) — the pattern a torch/onnx checkpoint follows on a real
    cluster, where the driver's filesystem isn't visible to executors.
    """
    sc = df.sparkSession.sparkContext
    sc.addFile(artifact_path)
    fname = os.path.basename(artifact_path)
    cache: dict[str, NumpyMLP] = {}

    @pandas_udf("array<double>")
    def predict(features: pd.Series) -> pd.Series:
        if "m" not in cache:  # one load per worker process, not per batch
            from pyspark import SparkFiles

            cache["m"] = NumpyMLP.load(SparkFiles.get(fname))
        x = np.stack(features.to_numpy()).astype(np.float64)
        return pd.Series(list(cache["m"].forward(x)))

    return df.withColumn(out_col, predict(F.col(features_col)))


def argmax_prediction(df: DataFrame, prob_col: str = "probabilities", out_col: str = "prediction") -> DataFrame:
    """Class decision from the probability vector — JVM-side expression
    (array_position of the max), no second Python hop."""
    probs = F.col(prob_col)
    return df.withColumn(out_col, (F.array_position(probs, F.array_max(probs)) - 1).cast("long"))
