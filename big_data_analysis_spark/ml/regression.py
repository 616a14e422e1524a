"""Regression pipelines (SURVEY.md §2.10 M11-M14, M16).

The reference's COVID script (新冠疫情分析.py:141-226) grid-searches
Ridge / Lasso / ElasticNet / SVR with a 5-fold ``TimeSeriesSplit`` and
reports MSE/RMSE/MAE/R²/MAPE. pyspark.ml mapping:

- M13 Ridge/Lasso/ElasticNet = ONE LinearRegression
      (elasticNetParam: 0 = ridge, 1 = lasso, in-between = elastic net)
- M11 ParamGridBuilder grid
- M12 TimeSeriesSplit has no Spark equivalent (CrossValidator folds are
      random) -> expanding-window folds built from day-range filters
- M14 SVR(RBF) gap -> GBTRegressor or RFF + LinearRegression (ml.kernel)
- M16 RegressionEvaluator (mse/rmse/mae/r2); MAPE as an agg expression
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.ml import Pipeline
from pyspark.ml.evaluation import RegressionEvaluator
from pyspark.ml.regression import GBTRegressor, LinearRegression
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from big_data_analysis_spark.ml.pipelines import assemble_features


def linear_regressor(
    reg_param: float = 0.0,
    elastic_net_param: float = 0.0,
    label_col: str = "label",
    features_col: str = "features",
) -> LinearRegression:
    """M13: one estimator covers Ridge (ρ=0), Lasso (ρ=1), ElasticNet."""
    return LinearRegression(
        regParam=reg_param,
        elasticNetParam=elastic_net_param,
        labelCol=label_col,
        featuresCol=features_col,
        maxIter=100,
    )


def regression_metrics(
    predictions: DataFrame, label_col: str = "label", prediction_col: str = "prediction"
) -> dict[str, float]:
    """M16: MSE/RMSE/MAE/R² via RegressionEvaluator; MAPE as a single
    aggregate expression (reference 新冠疫情分析.py:210-220 computes it
    manually). Zero-label rows are excluded from MAPE (division guard)."""
    out = {}
    for metric in ("mse", "rmse", "mae", "r2"):
        out[metric] = RegressionEvaluator(
            labelCol=label_col, predictionCol=prediction_col, metricName=metric
        ).evaluate(predictions)
    y, yhat = F.col(label_col), F.col(prediction_col)
    mape_row = (
        predictions.filter(y != 0)
        .agg((F.avg(F.abs((y - yhat) / y)) * 100).alias("mape"))
        .head()
    )
    out["mape"] = float(mape_row["mape"]) if mape_row and mape_row["mape"] is not None else float("nan")
    return out


def expanding_window_folds(
    df: DataFrame, order_col: str, n_splits: int = 5
) -> list[tuple[DataFrame, DataFrame]]:
    """M12: sklearn ``TimeSeriesSplit`` semantics — n_splits folds where
    fold i trains on the first (i+1) blocks and validates on block (i+2)
    of a (n_splits+1)-block partition of the time axis.

    Built from percentile cut points on ``order_col`` so it works on any
    monotone time column without collecting rows; each fold is a pair of
    filters over the same lazy plan (no data movement until fit)."""
    qs = [i / (n_splits + 1) for i in range(1, n_splits + 2)]
    cuts = df.agg(
        *[F.expr(f"percentile(`{order_col}`, {q})").alias(f"c{i}") for i, q in enumerate(qs)]
    ).head()
    folds = []
    for i in range(n_splits):
        train_hi, val_hi = cuts[i], cuts[i + 1]
        train = df.filter(F.col(order_col) <= F.lit(train_hi))
        val = df.filter((F.col(order_col) > F.lit(train_hi)) & (F.col(order_col) <= F.lit(val_hi)))
        folds.append((train, val))
    return folds


def time_series_grid_search(
    df: DataFrame,
    label_col: str,
    feature_cols: Sequence[str],
    order_col: str,
    param_grid: Sequence[dict] | None = None,
    n_splits: int = 5,
    metric: str = "rmse",
) -> tuple[dict, DataFrame]:
    """M11+M12: grid search with expanding-window CV (reference
    新冠疫情分析.py:141-183: Lasso 6 + ElasticNet 25 candidates x 5
    TS-folds). Returns (best params incl. mean CV metric, leaderboard
    DataFrame). Candidate fits are independent — on a cluster they
    parallelize across the grid like joblib's n_jobs=-1 did on cores."""
    param_grid = param_grid or [
        {"reg_param": rp, "elastic_net_param": en}
        for rp in (0.01, 0.1, 1.0)
        for en in (0.0, 0.5, 1.0)
    ]
    folds = [(tr.cache(), va.cache()) for tr, va in expanding_window_folds(df, order_col, n_splits)]
    ev = RegressionEvaluator(labelCol=label_col, metricName=metric)
    rows = []
    for params in param_grid:
        scores = []
        for train, val in folds:
            pipe = Pipeline(
                stages=assemble_features(feature_cols) + [linear_regressor(label_col=label_col, **params)]
            )
            model = pipe.fit(train)
            scores.append(ev.evaluate(model.transform(val)))
        rows.append({**params, f"mean_{metric}": sum(scores) / len(scores)})
    for train, val in folds:
        train.unpersist()
        val.unpersist()
    leaderboard = df.sparkSession.createDataFrame(rows).orderBy(f"mean_{metric}")
    best = leaderboard.head().asDict()
    return best, leaderboard


def gbt_regressor(label_col: str = "label", features_col: str = "features") -> GBTRegressor:
    """M14 stand-in for SVR(RBF): gradient-boosted trees capture the same
    nonlinearity class scalably; the RFF+linear path (ml.kernel) is the
    kernel-faithful alternative."""
    return GBTRegressor(labelCol=label_col, featuresCol=features_col, maxIter=20, seed=42)


def rff_kernel_regressor(
    df: DataFrame,
    label_col: str,
    feature_cols: Sequence[str],
    n_components: int = 200,
    gamma: float = 1.0,
    reg_param: float = 0.01,
    seed: int = 42,
):
    """M14 kernel-faithful path for the SVR(RBF) gap
    (新冠疫情分析.py:166-170): Rahimi-Recht random Fourier features
    approximate the RBF kernel's feature map, then ridge on the mapped
    features = approximate kernel ridge regression — the same RBF
    function class as SVR (squared loss instead of epsilon-insensitive,
    the documented delta), at LINEAR cost in rows instead of the
    kernel matrix's quadratic.

    Returns (fitted LinearRegressionModel, mapped DataFrame). Apply the
    same mapping (same seed!) to any scoring frame."""
    from big_data_analysis_spark.ml.kernel import add_rff_features

    mapped = add_rff_features(
        df, list(feature_cols), n_components=n_components, gamma=gamma, seed=seed
    )
    lr = LinearRegression(
        labelCol=label_col,
        featuresCol="rff_features",
        regParam=reg_param,
        elasticNetParam=0.0,
    )
    return lr.fit(mapped), mapped


def epsilon_svr_rff(
    df: DataFrame,
    label_col: str,
    feature_cols: Sequence[str],
    epsilon: float = 0.1,
    n_components: int = 100,
    gamma: float = 1.0,
    reg_param: float = 1e-4,
    iters: int = 150,
    lr: float = 0.6,
    lr_decay: float = 0.02,
    smoothing: float = 0.02,
    avg_frac: float = 0.25,
    seed: int = 42,
):
    """M14 closed for real: SVR with the TRUE epsilon-insensitive loss
    (新冠疫情分析.py:155-162's ``SVR(kernel='rbf')``), not the squared-loss
    ridge substitute. The RBF function class comes from Rahimi-Recht
    random Fourier features (ml.kernel); the tube loss is minimized by
    full-batch gradient descent with Nesterov momentum on a smoothed
    (Huber-ized, transition width ``smoothing``) epsilon-insensitive
    objective — the smoothing makes the gradient continuous so plain GD
    converges; as smoothing -> 0 the objective IS the SVR primal with
    ridge penalty ``reg_param``. Step size decays 1/(1+lr_decay·t) and
    the returned weights are the POLYAK AVERAGE of the last
    ``avg_frac`` of iterates — on the piecewise-linear tube loss the
    raw final iterate rattles around the optimum (observed 10×-worse
    RMSE), while the tail average converges like the theory says.

    Scale shape: the per-iteration gradient is ONE distributed pass —
    residual and subgradient factor are codegen column expressions over
    a broadcast weight literal, and the d-dimensional gradient reduces
    through ``Summarizer.mean`` (treeAggregate on vectors; no explode,
    no driver-sized intermediate). Cost = iters × (one map + tree
    reduce), the textbook shape for distributed full-batch GD. The
    mapped frame is cached once.

    Returns (weights ndarray incl. trailing bias, predict_fn:
    DataFrame -> DataFrame adding ``prediction``).
    """
    import numpy as np
    from pyspark.ml.functions import array_to_vector, vector_to_array
    from pyspark.ml.stat import Summarizer

    from big_data_analysis_spark.ml.kernel import add_rff_features

    def mapped_with_bias(frame: DataFrame) -> DataFrame:
        m = add_rff_features(
            frame, list(feature_cols), n_components=n_components, gamma=gamma, seed=seed
        )
        # trailing 1.0 = intercept feature; keep as plain array for the
        # codegen dot product, convert to vector only at the reduce.
        return m.withColumn(
            "__phi", F.concat(vector_to_array("rff_features"), F.array(F.lit(1.0)))
        )

    train = mapped_with_bias(df).select(F.col(label_col).alias("__y"), "__phi").cache()
    n_rows = train.count()  # materializes the cache
    d = n_components + 1

    w = np.zeros(d)
    vel = np.zeros(d)
    acc = np.zeros(d)
    n_avg = max(1, int(iters * avg_frac))
    mu = 0.9
    for t in range(iters):
        look = w + mu * vel  # Nesterov lookahead
        w_lit = F.array(*[F.lit(float(x)) for x in look])
        dot = F.aggregate(
            F.zip_with("__phi", w_lit, lambda a, b: a * b),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        r = F.col("__y") - dot
        # smoothed d(loss)/d(pred): 0 in tube, ±1 outside, linear ramp
        # of width `smoothing` in between (clamped difference quotient)
        s = (
            F.when(r > epsilon + smoothing, F.lit(-1.0))
            .when(r > epsilon, -(r - epsilon) / F.lit(smoothing))
            .when(r < -epsilon - smoothing, F.lit(1.0))
            .when(r < -epsilon, -(r + epsilon) / F.lit(smoothing))
            .otherwise(F.lit(0.0))
        )
        g_row = array_to_vector(F.transform("__phi", lambda x: x * s))
        g_mean = np.array(
            train.select(Summarizer.mean(g_row).alias("g")).head()["g"].toArray()
        )
        grad = g_mean + reg_param * np.append(look[:-1], 0.0)  # bias unpenalized
        vel = mu * vel - (lr / (1.0 + lr_decay * t)) * grad
        w = w + vel
        if t >= iters - n_avg:
            acc += w

    w = acc / n_avg
    train.unpersist()

    def predict_fn(frame: DataFrame) -> DataFrame:
        w_lit = F.array(*[F.lit(float(x)) for x in w])
        out = mapped_with_bias(frame).withColumn(
            "prediction",
            F.aggregate(
                F.zip_with("__phi", w_lit, lambda a, b: a * b),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ),
        )
        return out.drop("__phi", "rff_features")

    return w, predict_fn


def grouped_ols(
    df: DataFrame,
    group_cols: Sequence[str],
    x_col: str,
    y_col: str,
) -> DataFrame:
    """Per-group simple linear regression in ONE aggregate pass: the
    built-in ``regr_slope`` / ``regr_intercept`` / ``regr_r2`` /
    ``regr_count`` aggregates compute every group's closed-form OLS fit
    map-side-combinably — millions of per-entity trend lines (price
    drift per SKU, engagement slope per user cohort) without fitting
    millions of models or shuffling anything but the group keys. This
    is the scale path for 'fit a line per key'; the Spark ML
    ``linear_regressor`` path is for the multi-feature case."""
    return df.groupBy(*group_cols).agg(
        F.regr_slope(F.col(y_col), F.col(x_col)).alias("slope"),
        F.regr_intercept(F.col(y_col), F.col(x_col)).alias("intercept"),
        F.regr_r2(F.col(y_col), F.col(x_col)).alias("r2"),
        F.regr_count(F.col(y_col), F.col(x_col)).alias("n_obs"),
    )
