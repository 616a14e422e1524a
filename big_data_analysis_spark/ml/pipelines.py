"""Classification pipelines (SURVEY.md §2.10 M1-M10, M15, M17).

The reference's breast-cancer script (乳腺癌预测.py:105-139) benchmarks 8
sklearn classifiers on a scaled feature matrix with a stratified 70/30
split and 5-fold CV. Re-expressed here as pyspark.ml Pipelines:

- M1  StandardScaler(withMean, withStd)       fit on train only
- M2  stratified split via sampleBy, seed 42
- M3  LogisticRegression
- M5  DecisionTreeClassifier(maxDepth=5)
- M6  NaiveBayes(modelType='gaussian')
- M7  LinearSVC (+ RFF features from ml.kernel for the RBF gap)
- M8  RandomForestClassifier(numTrees=100)
- M9  MultilayerPerceptronClassifier(layers=[d,30,30,2])
- M10 5-fold CrossValidator
- M15 accuracy / weighted P / R / F1 / areaUnderROC
- M17 ROC curve points

Training is data-parallel: each fit is a handful of Spark jobs over the
feature DataFrame — at 100 TB the same code runs with the executors doing
the passes; nothing here collects the training set to the driver.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.ml import Pipeline, PipelineModel
from pyspark.ml.classification import (
    DecisionTreeClassifier,
    GBTClassifier,
    LinearSVC,
    LogisticRegression,
    MultilayerPerceptronClassifier,
    NaiveBayes,
    RandomForestClassifier,
)
from pyspark.ml.evaluation import (
    BinaryClassificationEvaluator,
    MulticlassClassificationEvaluator,
)
from pyspark.ml.feature import StandardScaler, VectorAssembler
from pyspark.ml.tuning import CrossValidator, ParamGridBuilder
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def assemble_features(
    feature_cols: Sequence[str],
    scaled: bool = True,
    features_col: str = "features",
) -> list:
    """M1: VectorAssembler (+ z-score StandardScaler). Returns pipeline
    stages; fit on train only so test statistics never leak (reference
    乳腺癌预测.py:93-95 fit_transform/transform discipline)."""
    stages = [VectorAssembler(inputCols=list(feature_cols), outputCol="__raw_features")]
    if scaled:
        stages.append(
            StandardScaler(
                inputCol="__raw_features", outputCol=features_col, withMean=True, withStd=True
            )
        )
    else:
        stages[0].setOutputCol(features_col)
    return stages


def stratified_split(
    df: DataFrame, label_col: str, train_fraction: float = 0.7, seed: int = 42
) -> tuple[DataFrame, DataFrame]:
    """M2: stratified train/test split (reference 乳腺癌预测.py:83-85,
    ``train_test_split(stratify=y)``). ``sampleBy`` keeps per-class
    fractions; the complement (anti-join on a row id would be exact but
    adds a shuffle) is taken with a deterministic per-row hash so the
    split is reproducible and single-pass at any scale."""
    # Deterministic per-row coin: hash of all columns -> uniform [0,1).
    coin = (F.abs(F.xxhash64(*[F.col(c) for c in df.columns], F.lit(seed))) % 1_000_000) / 1_000_000.0
    with_coin = df.withColumn("__coin", coin)
    train = with_coin.filter(F.col("__coin") < train_fraction).drop("__coin")
    test = with_coin.filter(F.col("__coin") >= train_fraction).drop("__coin")
    return train, test


def default_classifiers(n_features: int, label_col: str = "label", features_col: str = "features") -> dict:
    """The reference's 8-model benchmark roster mapped to pyspark.ml
    (乳腺癌预测.py:105-114). kNN (M4) is LSH-based and lives in
    operators.similarity; RBF-SVM (M7) = RFF features + LinearSVC
    (ml.kernel)."""
    common = dict(labelCol=label_col, featuresCol=features_col)
    return {
        "logistic_regression": LogisticRegression(maxIter=100, **common),
        "decision_tree": DecisionTreeClassifier(maxDepth=5, seed=42, **common),
        "gaussian_nb": NaiveBayes(modelType="gaussian", **common),
        "linear_svc": LinearSVC(maxIter=50, **common),
        "random_forest": RandomForestClassifier(numTrees=100, seed=42, **common),
        "gbt": GBTClassifier(maxIter=20, seed=42, **common),
        "mlp": MultilayerPerceptronClassifier(
            layers=[n_features, 30, 30, 2], seed=42, maxIter=100, **common
        ),
    }


def classification_metrics(
    predictions: DataFrame, label_col: str = "label", prediction_col: str = "prediction"
) -> dict[str, float]:
    """M15: accuracy, weighted precision/recall, F1 (+ AUC when a
    rawPrediction column exists). One evaluator pass per metric over the
    cached predictions."""
    out = {}
    for metric in ("accuracy", "weightedPrecision", "weightedRecall", "f1"):
        ev = MulticlassClassificationEvaluator(
            labelCol=label_col, predictionCol=prediction_col, metricName=metric
        )
        out[metric] = ev.evaluate(predictions)
    if "rawPrediction" in predictions.columns:
        out["areaUnderROC"] = BinaryClassificationEvaluator(
            labelCol=label_col, metricName="areaUnderROC"
        ).evaluate(predictions)
    return out


def classification_benchmark(
    df: DataFrame,
    label_col: str,
    feature_cols: Sequence[str],
    models: dict | None = None,
    train_fraction: float = 0.7,
    seed: int = 42,
    cv_folds: int = 0,
) -> tuple[DataFrame, dict[str, PipelineModel]]:
    """The 乳腺癌预测 benchmark loop (reference :105-160): per model,
    fit on the stratified train split, score the test split, optionally
    5-fold cross-validate (M10). Returns (metrics DataFrame in the
    reference's leaderboard shape sorted by accuracy desc, fitted models).
    """
    models = models or default_classifiers(len(feature_cols), label_col=label_col)
    train, test = stratified_split(df, label_col, train_fraction, seed)
    train = train.cache()
    test = test.cache()

    rows, fitted = [], {}
    for name, clf in models.items():
        pipe = Pipeline(stages=assemble_features(feature_cols) + [clf])
        model = pipe.fit(train)
        preds = model.transform(test).cache()
        m = classification_metrics(preds, label_col=label_col)
        if cv_folds:
            ev = MulticlassClassificationEvaluator(labelCol=label_col, metricName="accuracy")
            cv = CrossValidator(
                estimator=pipe,
                estimatorParamMaps=ParamGridBuilder().build(),
                evaluator=ev,
                numFolds=cv_folds,
                seed=seed,
                parallelism=4,
            )
            m["cv_accuracy"] = max(cv.fit(df).avgMetrics)
        rows.append({"model": name, **{k: float(v) for k, v in m.items()}})
        fitted[name] = model
        preds.unpersist()

    spark = df.sparkSession
    metrics_df = spark.createDataFrame(rows).orderBy(F.desc("accuracy"))
    train.unpersist()
    test.unpersist()
    return metrics_df, fitted


def golden_prediction_output(
    predictions: DataFrame,
    id_col: str,
    label_col: str = "label",
    prediction_col: str = "prediction",
    probability_col: str = "probability",
) -> DataFrame:
    """§5.2.3 golden-schema output replicating the reference's committed
    神经网络预测结果.csv shape (乳腺癌预测.py:203-219): sample id, true
    label, predicted label, per-class probabilities, correctness flag."""
    from pyspark.ml.functions import vector_to_array

    prob1 = F.element_at(vector_to_array(F.col(probability_col)), 2)
    return predictions.select(
        F.col(id_col).alias("sample_id"),
        F.col(label_col).cast("long").alias("y_true"),
        F.col(prediction_col).cast("long").alias("y_pred"),
        F.round(prob1, 6).alias("prob_positive"),
        F.round(1.0 - prob1, 6).alias("prob_negative"),
        (F.col(label_col) == F.col(prediction_col)).alias("correct"),
    )


def roc_points(model, max_points: int = 1000) -> DataFrame:
    """M17: ROC curve points from a binary summary-capable model
    (reference 乳腺癌预测.py:294 roc_curve)."""
    lr_model = model.stages[-1] if hasattr(model, "stages") else model
    return lr_model.summary.roc.limit(max_points)
