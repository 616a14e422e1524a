"""Random Fourier features (SURVEY.md §2.10 M7/M14 gap).

pyspark.ml has no kernelized SVM/SVR (sklearn's ``SVC(kernel='rbf')`` at
乳腺癌预测.py:111, ``SVR`` at 新冠疫情分析.py:155). Kernel methods are
inherently O(n²) in the Gram matrix — a dead end at 100 TB. The scalable
public technique is Rahimi & Recht 2007 ("Random Features for Large-Scale
Kernel Machines"): sample W ~ N(0, 1/σ²), b ~ U[0, 2π], map
x -> sqrt(2/D) * cos(Wx + b); then a LINEAR model on the mapped features
approximates the RBF-kernel model, and linear fits scale linearly.

Implemented as an Arrow-batched pandas_udf: one matrix multiply per
batch (numpy BLAS), no per-row Python.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.ml.functions import array_to_vector
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf


def add_rff_features(
    df: DataFrame,
    feature_cols: list[str],
    out_col: str = "rff_features",
    n_components: int = 100,
    gamma: float = 1.0,
    seed: int = 42,
) -> DataFrame:
    """Append an RBF-approximating random-features vector column.

    The (W, b) sample is drawn once on the driver with a fixed seed and
    closure-captured — every executor applies the same projection, so the
    mapping is deterministic and identical across train/test."""
    rng = np.random.default_rng(seed)
    d = len(feature_cols)
    w = rng.normal(0.0, np.sqrt(2.0 * gamma), size=(d, n_components))
    b = rng.uniform(0.0, 2.0 * np.pi, size=n_components)
    scale = np.sqrt(2.0 / n_components)

    @pandas_udf("array<double>")
    def rff(*cols: pd.Series) -> pd.Series:
        x = np.column_stack([c.to_numpy(dtype=float) for c in cols])
        z = scale * np.cos(x @ w + b)
        return pd.Series(list(z))

    # pandas_udf cannot emit VectorUDT; emit array<double> and convert
    # JVM-side so downstream pyspark.ml estimators see a vector column.
    return df.withColumn(out_col, array_to_vector(rff(*[F.col(c) for c in feature_cols])))
