"""Classification pipelines (SURVEY.md §2.10 M1-M10, M15, M17).

The reference's breast-cancer script (乳腺癌预测.py:105-139) benchmarks 8
sklearn classifiers on a scaled feature matrix with a stratified 70/30
split and 5-fold CV. Re-expressed here as pyspark.ml Pipelines:

- M1  StandardScaler(withMean, withStd)       fit on train only
- M2  exact stratified split (per-class histogram thresholds), seed 42
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
    df: DataFrame,
    label_col: str,
    train_fraction: float = 0.7,
    seed: int = 42,
    id_cols: Sequence[str] | None = None,
    num_buckets: int = 4096,
) -> tuple[DataFrame, DataFrame]:
    """M2: EXACT stratified train/test split (reference 乳腺癌预测.py:83-85,
    ``train_test_split(stratify=y)``): every class puts exactly
    round(train_fraction * n_class) rows in train, like sklearn's exact
    per-class stratification — not just in expectation.

    Deterministic and scale-safe:
    - Each row gets a hash coin in [0,1) from ``id_cols`` (pass a stable
      id subset! defaulting to all columns means adding/dropping a
      feature column reshuffles the split) and a coin bucket.
    - Pass 1: per-(class, bucket) histogram — at most
      classes x num_buckets rows collected, independent of data size.
    - The driver walks each class's histogram to the bucket where the
      cumulative count crosses k = round(f * n): rows in buckets below
      the boundary are train, above are test — resolved by a broadcast
      join + filter, no shuffle of the data.
    - Only the boundary bucket (~n_class/num_buckets rows per class) is
      ranked with a window to take the exact residual — the one
      per-class serial step touches a 1/num_buckets sliver, never the
      whole class partition.

    ``id_cols`` must uniquely identify rows (a primary key): rows with
    identical ids get identical sort keys, so the boundary-bucket
    row_number breaks their tie arbitrarily and the two copies can land
    on opposite sides of the split (train and test are evaluated as
    separate lazy plans). With a unique key the (coin, tie) order is
    total and both plans resolve identically.
    """
    from pyspark.sql import Window
    from pyspark.sql.types import IntegerType, LongType, StructField, StructType

    hash_cols = [F.col(c) for c in (id_cols if id_cols else df.columns)]
    coin = (F.abs(F.xxhash64(*hash_cols, F.lit(seed))) % 1_000_000) / 1_000_000.0
    # Secondary tie-break hash so equal coins rank deterministically.
    tie = F.xxhash64(*hash_cols, F.lit(seed + 1))
    with_coin = (
        df.withColumn("__coin", coin)
        .withColumn("__tie", tie)
        .withColumn(
            "__bkt",
            F.least(
                F.floor(F.col("__coin") * num_buckets).cast("int"), F.lit(num_buckets - 1)
            ),
        )
    )
    hist = (
        with_coin.groupBy(F.col(label_col).alias("__lbl"), "__bkt")
        .agg(F.count(F.lit(1)).alias("__n"))
        .collect()
    )
    per: dict = {}
    for r in hist:
        per.setdefault(r["__lbl"], {})[r["__bkt"]] = r["__n"]
    rows = []
    for lbl, bkts in per.items():
        n = sum(bkts.values())
        k = int(round(train_fraction * n))
        cum, boundary, resid = 0, num_buckets, 0
        for bkt in sorted(bkts):
            c = bkts[bkt]
            if cum + c >= k:
                boundary, resid = bkt, k - cum
                break
            cum += c
        rows.append((lbl, boundary, resid))
    bounds_schema = StructType(
        [
            StructField("__lbl", df.schema[label_col].dataType, True),
            StructField("__b", IntegerType(), False),
            StructField("__r", LongType(), False),
        ]
    )
    bounds = df.sparkSession.createDataFrame(rows, bounds_schema)
    joined = with_coin.join(
        F.broadcast(bounds), F.col(label_col).eqNullSafe(F.col("__lbl"))
    ).drop("__lbl")
    drop_cols = ["__coin", "__tie", "__bkt", "__b", "__r"]
    below = joined.filter(F.col("__bkt") < F.col("__b")).drop(*drop_cols)
    above = joined.filter(F.col("__bkt") > F.col("__b")).drop(*drop_cols)
    w = Window.partitionBy(label_col).orderBy("__coin", "__tie")
    boundary_rows = joined.filter(F.col("__bkt") == F.col("__b")).withColumn(
        "__rn", F.row_number().over(w)
    )
    train = below.unionByName(
        boundary_rows.filter(F.col("__rn") <= F.col("__r")).drop(*drop_cols, "__rn")
    )
    test = above.unionByName(
        boundary_rows.filter(F.col("__rn") > F.col("__r")).drop(*drop_cols, "__rn")
    )
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


def per_class_report(
    predictions: DataFrame,
    label_col: str = "label",
    prediction_col: str = "prediction",
) -> DataFrame:
    """M15: per-class precision/recall/F1/support, the reference's
    ``classification_report`` table (乳腺癌预测.py:142-146,190) that the
    weighted evaluator metrics don't expose.

    One full pass builds the confusion cells (|classes|^2 rows, then
    localCheckpoint so the three tiny derivations below don't re-scan
    the predictions); every later step runs on the cell table only.
    Classes appearing in either column are reported (sklearn semantics);
    zero denominators yield 0.0, and f1 = 2*tp/(predicted+support) is
    the algebraic 2PR/(P+R) without intermediate rounding."""
    cells = (
        predictions.groupBy(
            F.col(label_col).alias("__t"), F.col(prediction_col).alias("__p")
        )
        .agg(F.count(F.lit(1)).alias("__n"))
        .localCheckpoint(eager=True)
    )
    classes = (
        cells.select(F.col("__t").alias("label"))
        .unionByName(cells.select(F.col("__p").alias("label")))
        .distinct()
    )
    actual = cells.groupBy(F.col("__t").alias("label")).agg(
        F.sum("__n").alias("__support")
    )
    predicted = cells.groupBy(F.col("__p").alias("label")).agg(
        F.sum("__n").alias("__predicted")
    )
    tp = cells.filter(F.col("__t") == F.col("__p")).select(
        F.col("__t").alias("label"), F.col("__n").alias("__tp")
    )
    rep = (
        classes.join(actual, "label", "left")
        .join(predicted, "label", "left")
        .join(tp, "label", "left")
        .na.fill(0, ["__support", "__predicted", "__tp"])
    )
    prec = F.coalesce(F.try_divide(F.col("__tp"), F.col("__predicted")), F.lit(0.0))
    rec = F.coalesce(F.try_divide(F.col("__tp"), F.col("__support")), F.lit(0.0))
    f1 = F.coalesce(
        F.try_divide(2 * F.col("__tp"), F.col("__predicted") + F.col("__support")),
        F.lit(0.0),
    )
    return rep.select(
        "label",
        F.round(prec, 6).alias("precision"),
        F.round(rec, 6).alias("recall"),
        F.round(f1, 6).alias("f1"),
        F.col("__support").cast("long").alias("support"),
    ).orderBy("label")


def classification_benchmark(
    df: DataFrame,
    label_col: str,
    feature_cols: Sequence[str],
    models: dict | None = None,
    train_fraction: float = 0.7,
    seed: int = 42,
    cv_folds: int = 0,
    id_cols: Sequence[str] | None = None,
) -> tuple[DataFrame, dict[str, PipelineModel]]:
    """The 乳腺癌预测 benchmark loop (reference :105-160): per model,
    fit on the stratified train split, score the test split, optionally
    5-fold cross-validate (M10). Returns (metrics DataFrame in the
    reference's leaderboard shape sorted by accuracy desc, fitted models).
    """
    models = models or default_classifiers(len(feature_cols), label_col=label_col)
    train, test = stratified_split(df, label_col, train_fraction, seed, id_cols=id_cols)
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
