"""ML pipeline tests (SURVEY.md §2.10 / §5.2 item 2): model quality
cannot be value-hashed against a SQL oracle, so assert metric floors on
deterministic, learnably-structured tasks built from the driver testdata.
"""

from __future__ import annotations

import pytest
from pyspark.ml import Pipeline
from pyspark.sql import functions as F

from big_data_analysis_spark.io import load_tables
from big_data_analysis_spark.ml import clustering as cl
from big_data_analysis_spark.ml import pipelines as pl
from big_data_analysis_spark.ml import regression as rg
from big_data_analysis_spark.ml.kernel import add_rff_features

FEATURES = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]


@pytest.fixture(scope="module")
def lineitem_labeled(spark, sf_dir):
    """Separable binary task: label = price above the global median.
    The raw price is among the features, so any sane model must clear a
    high accuracy floor — this tests plumbing, not model research."""
    li = load_tables(spark, sf_dir, ["lineitem"])["lineitem"]
    med = li.agg(F.expr("percentile(l_extendedprice, 0.5)").alias("m")).head()["m"]
    labeled = (
        li.select(
            F.col("l_orderkey"),
            F.col("l_linenumber"),
            *[F.col(c).cast("double").alias(c) for c in FEATURES],
            (F.col("l_extendedprice") > med).cast("double").alias("label"),
        )
        .cache()
    )
    yield labeled
    labeled.unpersist()


IDS = ["l_orderkey", "l_linenumber"]


@pytest.fixture(scope="module")
def lineitem_unique(lineitem_labeled):
    """stratified_split requires id_cols to be a unique row key; the
    synthetic lineitem has duplicate (orderkey, linenumber) pairs, so
    dedupe for the split tests."""
    uniq = lineitem_labeled.dropDuplicates(IDS).cache()
    yield uniq
    uniq.unpersist()


def test_stratified_split_exact_per_class(lineitem_unique):
    """Exact stratification: train gets round(0.7 * n_class) rows of
    EVERY class (±1), matching sklearn's stratify=y — not just in
    expectation."""
    lineitem_labeled = lineitem_unique
    train, test = pl.stratified_split(lineitem_labeled, "label", 0.7, seed=42, id_cols=IDS)
    totals = {r["label"]: r["n"] for r in
              lineitem_labeled.groupBy("label").agg(F.count(F.lit(1)).alias("n")).collect()}
    got = {r["label"]: r["n"] for r in
           train.groupBy("label").agg(F.count(F.lit(1)).alias("n")).collect()}
    for lbl, n in totals.items():
        assert abs(got.get(lbl, 0) - round(0.7 * n)) <= 1, (lbl, got.get(lbl, 0), n)
    assert train.count() + test.count() == sum(totals.values())


def test_stratified_split_deterministic_and_disjoint(lineitem_unique):
    """Same seed -> identical split; train/test partition the input; and
    the split depends only on id_cols, so adding a feature column does
    not reshuffle membership."""
    lineitem_labeled = lineitem_unique
    t1, _ = pl.stratified_split(lineitem_labeled, "label", 0.7, seed=42, id_cols=IDS)
    t2, s2 = pl.stratified_split(lineitem_labeled, "label", 0.7, seed=42, id_cols=IDS)
    key = lambda df: {(r["l_orderkey"], r["l_linenumber"]) for r in df.select(*IDS).collect()}
    ids1, ids2 = key(t1), key(t2)
    assert ids1 == ids2
    assert not (ids2 & key(s2))

    widened = lineitem_labeled.withColumn("extra_feature", F.col("l_quantity") * 2)
    t3, _ = pl.stratified_split(widened, "label", 0.7, seed=42, id_cols=IDS)
    assert key(t3) == ids1


def test_classification_benchmark_floors(lineitem_labeled):
    models = {
        "logistic_regression": pl.default_classifiers(len(FEATURES))["logistic_regression"],
        "decision_tree": pl.default_classifiers(len(FEATURES))["decision_tree"],
    }
    metrics, fitted = pl.classification_benchmark(
        lineitem_labeled, "label", FEATURES, models=models
    )
    rows = {r["model"]: r for r in metrics.collect()}
    assert set(rows) == set(models)
    for name, r in rows.items():
        assert r["accuracy"] >= 0.9, f"{name} accuracy {r['accuracy']}"
        assert r["f1"] >= 0.9
    assert rows["logistic_regression"]["areaUnderROC"] >= 0.95


def test_golden_prediction_output_schema(lineitem_labeled):
    train, test = pl.stratified_split(lineitem_labeled, "label", 0.7, seed=42)
    pipe = Pipeline(
        stages=pl.assemble_features(FEATURES)
        + [pl.default_classifiers(len(FEATURES))["logistic_regression"]]
    )
    preds = pipe.fit(train).transform(test)
    golden = pl.golden_prediction_output(preds, id_col="l_orderkey")
    assert golden.columns == [
        "sample_id", "y_true", "y_pred", "prob_positive", "prob_negative", "correct",
    ]
    row = golden.head()
    assert row["prob_positive"] is not None
    assert abs(row["prob_positive"] + row["prob_negative"] - 1.0) < 1e-6
    acc = golden.agg(F.avg(F.col("correct").cast("double"))).head()[0]
    assert acc >= 0.9


def test_cross_validation_and_roc(lineitem_labeled):
    """M10 (k-fold CV, the reference's cross_val_score(cv=5) loop in
    乳腺癌预测.py:132,139) + M17 (ROC points) through the benchmark API:
    cv_folds=5 must produce a cv_accuracy per model that is both above
    the task's floor and consistent with the train/test-split accuracy
    (fold metrics are averaged over genuinely disjoint folds — a
    broken fold assignment would crater or inflate the average)."""
    models = {
        "logistic_regression": pl.default_classifiers(len(FEATURES))["logistic_regression"],
        "decision_tree": pl.default_classifiers(len(FEATURES))["decision_tree"],
    }
    metrics, fitted = pl.classification_benchmark(
        lineitem_labeled, "label", FEATURES, models=models, cv_folds=5
    )
    rows = {r["model"]: r for r in metrics.collect()}
    assert set(rows) == set(models)
    for name, row in rows.items():
        assert row["cv_accuracy"] >= 0.9, (name, row["cv_accuracy"])
        assert abs(row["cv_accuracy"] - row["accuracy"]) < 0.05, (
            name, row["cv_accuracy"], row["accuracy"],
        )
    row = rows["logistic_regression"]

    roc = pl.roc_points(fitted["logistic_regression"])
    pts = roc.collect()
    assert pts and set(roc.columns) == {"FPR", "TPR"}
    assert all(0.0 <= r["FPR"] <= 1.0 and 0.0 <= r["TPR"] <= 1.0 for r in pts)


def test_rff_linear_svc_beats_linear_on_ring(spark):
    """M7 gap check: a radially-separable task (ring) where a plain
    linear model is near chance but RFF+linear clears it."""
    import math
    import random

    random.seed(7)
    rows = []
    for i in range(2000):
        r = random.uniform(0.0, 2.0)
        a = random.uniform(0.0, 2 * math.pi)
        rows.append((i, r * math.cos(a), r * math.sin(a), 1.0 if r < 1.0 else 0.0))
    df = spark.createDataFrame(rows, ["id", "x1", "x2", "label"])

    mapped = add_rff_features(df, ["x1", "x2"], n_components=100, gamma=1.0, seed=42)
    train, test = pl.stratified_split(mapped, "label", 0.7, seed=42)
    from pyspark.ml.classification import LinearSVC
    from pyspark.ml.evaluation import MulticlassClassificationEvaluator

    svc = LinearSVC(maxIter=50, featuresCol="rff_features", labelCol="label")
    preds = svc.fit(train).transform(test)
    acc = MulticlassClassificationEvaluator(
        labelCol="label", metricName="accuracy"
    ).evaluate(preds)
    assert acc >= 0.9, f"RFF accuracy {acc}"


def test_regression_grid_search_time_folds(spark, sf_dir):
    """M11-M13/M16 on a noiseless linear target: best model must fit it
    near-perfectly and MAPE must be finite."""
    li = load_tables(spark, sf_dir, ["lineitem"])["lineitem"]
    df = li.select(
        F.col("l_shipdate").cast("timestamp").cast("long").alias("t"),
        F.col("l_quantity").cast("double"),
        F.col("l_discount").cast("double"),
        (2.0 * F.col("l_quantity") + 10.0 * F.col("l_discount") + 5.0).alias("label"),
    )
    best, leaderboard = rg.time_series_grid_search(
        df,
        "label",
        ["l_quantity", "l_discount"],
        order_col="t",
        param_grid=[
            {"reg_param": 0.0, "elastic_net_param": 0.0},
            {"reg_param": 1.0, "elastic_net_param": 1.0},
        ],
        n_splits=3,
    )
    assert best["reg_param"] == 0.0  # unregularized wins on a noiseless linear target
    assert best["mean_rmse"] < 0.1
    assert leaderboard.count() == 2

    folds = rg.expanding_window_folds(df, "t", n_splits=3)
    assert len(folds) == 3
    # Expanding property: each train set contains the previous one.
    sizes = [tr.count() for tr, _ in folds]
    assert sizes == sorted(sizes)


def test_regression_metrics_values(spark):
    df = spark.createDataFrame(
        [(1.0, 1.5), (2.0, 2.5), (4.0, 3.5)], ["label", "prediction"]
    )
    m = rg.regression_metrics(df)
    assert m["mae"] == pytest.approx(0.5)
    assert m["mse"] == pytest.approx(0.25)
    assert m["rmse"] == pytest.approx(0.5)
    assert m["mape"] == pytest.approx((50 + 25 + 12.5) / 3)


def test_pca_kmeans_on_embeddings(spark, sf_dir):
    """M18/M19/M22/M23 over the embeddings table: cluster the raw vectors
    with the stored binary label as truth."""
    emb = load_tables(spark, sf_dir, ["embeddings"])["embeddings"]
    dim = len(emb.head()["embedding"])
    wide = emb.select(
        "vec_id",
        F.col("label").cast("int").alias("truth"),
        *[F.col("embedding")[i].cast("double").alias(f"e{i}") for i in range(dim)],
    )
    feature_cols = [f"e{i}" for i in range(dim)]

    projected, evr = cl.pca_project(wide, feature_cols, k=2)
    assert len(evr) == 2 and evr[0] >= evr[1] >= 0.0
    assert "pca_features" in projected.columns

    clustered, sil = cl.kmeans_cluster(projected, features_col="pca_features", k=2)
    assert -1.0 <= sil <= 1.0
    n_clusters = clustered.select("cluster").distinct().count()
    assert n_clusters == 2

    consistency = cl.cluster_truth_consistency(clustered, "cluster", "truth")
    assert 0.5 <= consistency <= 1.0


def test_bisecting_kmeans_on_blobs(spark):
    """M20: divisive hierarchical clustering separates two far blobs.
    (On near-uniform data BisectingKMeans may decline to split — so the
    structural test uses clearly bimodal input.)"""
    import random

    random.seed(3)
    rows = [(i, random.gauss(0, 0.1), random.gauss(0, 0.1)) for i in range(100)] + [
        (100 + i, random.gauss(10, 0.1), random.gauss(10, 0.1)) for i in range(100)
    ]
    df = spark.createDataFrame(rows, ["id", "x", "y"])
    from pyspark.ml import Pipeline

    assembled = (
        Pipeline(stages=pl.assemble_features(["x", "y"], scaled=False)).fit(df).transform(df)
    )
    bi = cl.bisecting_kmeans_cluster(assembled, features_col="features", k=2)
    counts = sorted(r["count"] for r in bi.groupBy("cluster").count().collect())
    assert counts == [100, 100]


def test_dbscan_small_blobs(spark):
    """M21: two tight blobs + one far outlier -> 2 clusters, 1 noise."""
    pts = (
        [(i, 0.0 + i * 0.01, 0.0) for i in range(10)]
        + [(100 + i, 5.0 + i * 0.01, 5.0) for i in range(10)]
        + [(999, 50.0, 50.0)]
    )
    df = spark.createDataFrame(pts, ["id", "x", "y"])
    labeled = cl.dbscan_small(df, ["x", "y"], eps=0.5, min_samples=3, id_col="id")
    counts = {r["cluster"]: r["count"] for r in labeled.groupBy("cluster").count().collect()}
    assert counts.pop(-1) == 1  # the outlier is noise
    assert sorted(counts.values()) == [10, 10]

    sweep = cl.dbscan_sweep(df, ["x", "y"], eps_values=[0.5, 100.0], min_samples_values=[3])
    rows = {r["eps"]: r for r in sweep.collect()}
    assert rows[0.5]["n_clusters"] == 2
    assert rows[100.0]["n_clusters"] == 1  # everything merges at huge eps


def test_per_class_report_matches_sklearn_semantics(spark):
    """M15 per-class report: hand-checked values incl. a class that is
    never predicted (precision 0, recall 0) — sklearn's
    classification_report contract."""
    # y_true: 0,0,0,1,1,2 ; y_pred: 0,1,0,1,1,1  (class 2 never predicted)
    pairs = [(0, 0), (0, 1), (0, 0), (1, 1), (1, 1), (2, 1)]
    df = spark.createDataFrame(pairs, ["label", "prediction"])
    rep = {r["label"]: r for r in pl.per_class_report(df).collect()}
    assert set(rep) == {0, 1, 2}
    assert rep[0]["precision"] == 1.0 and rep[0]["recall"] == pytest.approx(2 / 3)
    assert rep[1]["precision"] == 0.5 and rep[1]["recall"] == 1.0
    assert rep[2]["precision"] == 0.0 and rep[2]["recall"] == 0.0 and rep[2]["f1"] == 0.0
    assert rep[0]["support"] == 3 and rep[1]["support"] == 2 and rep[2]["support"] == 1
    # f1 = 2PR/(P+R)
    assert rep[1]["f1"] == pytest.approx(2 * 0.5 * 1.0 / 1.5, abs=1e-6)


def test_ward_linkage_known_values(spark):
    """Ward linkage on 1-D points {0,1,10,11}: the two unit pairs merge
    at euclidean distance 1, then the pair-of-pairs merges at
    sqrt(2*n1*n2/(n1+n2) * ||c1-c2||^2) = sqrt(200) — scipy's ward()
    convention, hand-derived (no scipy in this container)."""
    df = spark.createDataFrame([(i, v) for i, v in enumerate([0.0, 1.0, 10.0, 11.0])], ["id", "x"])
    rows = sorted(cl.ward_linkage(df, ["x"], id_col="id").collect(), key=lambda r: r["step"])
    assert [r["distance"] for r in rows[:2]] == [1.0, 1.0]
    assert rows[2]["distance"] == pytest.approx(200**0.5, abs=1e-6)
    assert {(rows[0]["cluster_a"], rows[0]["cluster_b"]), (rows[1]["cluster_a"], rows[1]["cluster_b"])} == {(0, 1), (2, 3)}
    assert rows[2]["size"] == 4
    # Ward distances are monotone non-decreasing.
    ds = [r["distance"] for r in rows]
    assert ds == sorted(ds)


def test_ward_cluster_blobs_and_monotonicity(spark):
    """Cutting the dendrogram at k=2 separates two far blobs exactly,
    and the full linkage stays monotone on gaussian data."""
    import random

    random.seed(11)
    rows = [(i, random.gauss(0, 0.2), random.gauss(0, 0.2)) for i in range(60)] + [
        (60 + i, random.gauss(8, 0.2), random.gauss(8, 0.2)) for i in range(40)
    ]
    df = spark.createDataFrame(rows, ["id", "x", "y"])
    labeled = cl.ward_cluster(df, ["x", "y"], k=2, id_col="id")
    groups = {
        r["cluster"]: r["n"]
        for r in labeled.groupBy("cluster").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert sorted(groups.values()) == [40, 60]
    # Every blob maps to exactly one cluster label.
    purity = labeled.withColumn("blob", (F.col("id") >= 60).cast("int"))
    assert purity.select("blob", "cluster").distinct().count() == 2

    ds = [r["distance"] for r in sorted(cl.ward_linkage(df, ["x", "y"], id_col="id").collect(), key=lambda r: r["step"])]
    assert ds == sorted(ds)

    with pytest.raises(ValueError, match="small-data"):
        cl.ward_linkage(df, ["x", "y"], max_rows=10)


def test_rff_kernel_regressor_learns_nonlinear_target(spark):
    """M14: y = sin(2x) — a plain linear fit is near-useless (R^2 ~ 0)
    while RFF kernel ridge fits it well, demonstrating the RBF function
    class at linear cost."""
    import math

    rows = [(i, -3.0 + 6.0 * i / 400.0) for i in range(400)]
    df = spark.createDataFrame(rows, ["id", "x"]).withColumn(
        "label", F.sin(2.0 * F.col("x"))
    )
    model, mapped = rg.rff_kernel_regressor(
        df, "label", ["x"], n_components=200, gamma=2.0, reg_param=1e-4
    )
    preds = model.transform(mapped)
    rmse = preds.agg(
        F.sqrt(F.avg((F.col("prediction") - F.col("label")) ** 2))
    ).head()[0]
    assert rmse < 0.15, rmse

    lin = rg.linear_regressor(reg_param=0.0)
    from pyspark.ml import Pipeline as _P

    lin_preds = (
        _P(stages=pl.assemble_features(["x"]) + [lin]).fit(df).transform(df)
    )
    lin_rmse = lin_preds.agg(
        F.sqrt(F.avg((F.col("prediction") - F.col("label")) ** 2))
    ).head()[0]
    assert rmse < lin_rmse / 2  # kernel path at least halves the error


def test_epsilon_svr_fits_nonlinear_and_resists_outliers(spark):
    """M14 true epsilon-insensitive SVR: (a) learns y=sin(2x) through
    the RFF map (linear fit can't), (b) the tube loss shrugs off a few
    wild outliers that visibly distort the squared-loss ridge fit —
    the defining behavioral difference between the two losses."""
    import math

    import numpy as np

    from big_data_analysis_spark.ml import regression as rg

    rng = np.random.default_rng(11)
    xs = rng.uniform(-2.0, 2.0, 300)
    ys = np.sin(2 * xs)
    # five wild outliers
    ys_out = ys.copy()
    ys_out[:5] += 25.0
    df = spark.createDataFrame(
        [(float(x), float(y)) for x, y in zip(xs, ys_out)], "x double, label double"
    )

    w, predict = rg.epsilon_svr_rff(
        df, "label", ["x"], epsilon=0.05, n_components=60, gamma=1.0,
        iters=150, lr=0.6, seed=42,
    )
    # score on a CLEAN grid against the true function
    grid = spark.createDataFrame(
        [(x / 50.0,) for x in range(-100, 101)], "x double"
    )
    preds = predict(grid).collect()
    rmse_svr = math.sqrt(
        sum((r["prediction"] - math.sin(2 * r["x"])) ** 2 for r in preds) / len(preds)
    )
    assert rmse_svr < 0.25, rmse_svr

    # squared-loss ridge on the SAME rff map, same contaminated data
    model, mapped = rg.rff_kernel_regressor(
        df, "label", ["x"], n_components=60, gamma=1.0, reg_param=0.01, seed=42
    )
    from big_data_analysis_spark.ml.kernel import add_rff_features

    grid_m = add_rff_features(grid, ["x"], n_components=60, gamma=1.0, seed=42)
    ridge_preds = model.transform(grid_m).collect()
    rmse_ridge = math.sqrt(
        sum((r["prediction"] - math.sin(2 * r["x"])) ** 2 for r in ridge_preds)
        / len(ridge_preds)
    )
    # the tube loss must be strictly more robust to the outliers
    assert rmse_svr < rmse_ridge * 0.7, (rmse_svr, rmse_ridge)


def test_model_save_load_roundtrip(spark, tmp_path):
    """S9: a fitted pipeline persists and reloads with identical
    predictions — the pyspark.ml pass-through the engine relies on."""
    from pyspark.ml import Pipeline, PipelineModel

    from big_data_analysis_spark.ml import pipelines as pl

    df = spark.createDataFrame(
        [(float(i % 2), float(i), float(2 * i % 7)) for i in range(200)],
        "label double, f1 double, f2 double",
    )
    pipe = Pipeline(
        stages=pl.assemble_features(["f1", "f2"])
        + [pl.default_classifiers(2)["logistic_regression"]]
    )
    model = pipe.fit(df)
    path = str(tmp_path / "lr_model")
    model.write().overwrite().save(path)
    reloaded = PipelineModel.load(path)
    a = [r["prediction"] for r in model.transform(df).select("prediction").collect()]
    b = [r["prediction"] for r in reloaded.transform(df).select("prediction").collect()]
    assert a == b


def test_als_recommender_learns_block_structure(spark):
    """ALS sanity on a planted block structure: users 0-19 buy items
    0-4, users 20-39 buy items 5-9 (with a few observed cells left
    out). The learned model must (a) produce top-k recs in relational
    long form, and (b) rank in-block unseen items above out-of-block
    items for a clear majority of users — the factorization actually
    generalized instead of memorizing."""
    from big_data_analysis_spark.ml.recommend import recommend_top_k, train_als

    rows = []
    for u in range(40):
        block = range(5) if u < 20 else range(5, 10)
        for i in block:
            if (u + i) % 5 == 0:  # hold out ~20% of in-block cells
                continue
            rows.append((u, i, 3.0))
    ratings = spark.createDataFrame(rows, "user int, item int, strength float")
    model = train_als(ratings, rank=4, max_iter=10, seed=7)
    recs = recommend_top_k(model, k=10)
    assert recs.columns == ["user", "item", "score", "rank"]

    by_user = {}
    for r in recs.collect():
        by_user.setdefault(r["user"], []).append((r["rank"], r["item"]))
    good = 0
    for u, items in by_user.items():
        block = set(range(5)) if u < 20 else set(range(5, 10))
        top5 = {i for _, i in sorted(items)[:5]}
        good += len(top5 & block) >= 4
    assert good >= 0.8 * len(by_user), f"only {good}/{len(by_user)} users block-consistent"


def test_implicit_purchase_matrix_shape(spark, sf_dir):
    """The star-schema -> implicit matrix derivation: integer ids, one
    row per (customer, brand), strength = line count."""
    from big_data_analysis_spark.io import load_tables
    from big_data_analysis_spark.ml.recommend import implicit_purchase_matrix

    t = load_tables(spark, sf_dir, ["orders", "lineitem", "part"])
    m = implicit_purchase_matrix(t["orders"], t["lineitem"], t["part"])
    assert [f.name for f in m.schema.fields] == ["user", "item", "strength"]
    assert m.groupBy("user", "item").count().filter("count > 1").isEmpty()
    row = m.agg(F.sum("strength").alias("s"), F.max("item").alias("mx")).head()
    n_lines = t["lineitem"].count()
    assert row["s"] == float(n_lines)  # every line lands in exactly one cell
    assert row["mx"] <= 24  # 25 dense-encoded brands


def test_als_query_end_to_end(spark):
    """als_recommend_brands is a 1-row shape-contract certificate since
    its r6 graduation (VERDICT r5 #3). This test pins BOTH layers: the
    underlying recommendation relation (3 recs per customer, items in
    brand-id range) and the certificate's own booleans, so a
    certificate regression can't hide an operator regression or vice
    versa."""
    from big_data_analysis_spark.io import load_tables
    from big_data_analysis_spark.ml.recommend import (
        implicit_purchase_matrix,
        recommend_top_k,
        train_als,
    )
    from big_data_analysis_spark.queries import QUERIES

    t = load_tables(spark, "/root/testdata/sf0.001", ["orders", "lineitem", "part"])
    ratings = implicit_purchase_matrix(t["orders"], t["lineitem"], t["part"])
    recs = recommend_top_k(train_als(ratings, rank=8, max_iter=5), k=3).collect()
    assert len(recs) > 0 and len(recs) % 3 == 0
    assert all(1 <= r["rank"] <= 3 and 0 <= r["item"] <= 24 for r in recs)

    cert = QUERIES["als_recommend_brands"](spark, "/root/testdata/sf0.001").collect()
    assert len(cert) == 1
    row = cert[0]
    assert row["n_rows"] == row["n_users"] * 3 == len(recs)
    assert row["ranks_complete"] and row["scores_ranked"] and row["items_in_catalog"]


# ---------------------------------------------------------------------------
# ml.features — LOO target encoding + minmax scaling
# ---------------------------------------------------------------------------


def test_target_encode_loo_matches_manual(spark):
    from big_data_analysis_spark.ml.features import target_encode_loo

    rows = [("a", 1.0), ("a", 3.0), ("a", 5.0), ("b", 10.0), ("b", 20.0), ("c", 7.0)]
    df = spark.createDataFrame(rows, "g string, y double")
    out = {(r["g"], r["y"]): r["target_enc"]
           for r in target_encode_loo(df, "g", "y").collect()}
    # group a: sum 9, n 3 -> LOO means (9-y)/2
    assert out[("a", 1.0)] == 4.0 and out[("a", 3.0)] == 3.0 and out[("a", 5.0)] == 2.0
    assert out[("b", 10.0)] == 20.0 and out[("b", 20.0)] == 10.0
    # singleton group: no leave-one-out mean -> NULL (not a crash, ANSI on)
    assert out[("c", 7.0)] is None


def test_target_encode_loo_smoothing(spark):
    from big_data_analysis_spark.ml.features import target_encode_loo

    rows = [("a", 2.0), ("a", 4.0), ("c", 7.0)]
    df = spark.createDataFrame(rows, "g string, y double")
    out = {(r["g"], r["y"]): r["target_enc"]
           for r in target_encode_loo(df, "g", "y", prior_weight=1.0).collect()}
    mu = (2.0 + 4.0 + 7.0) / 3
    # Micci-Barreca shrinkage: (sum_g - y + w*mu) / (n_g - 1 + w)
    assert abs(out[("a", 2.0)] - (4.0 + mu) / 2) < 1e-12
    # singleton now falls back to exactly the global mean
    assert abs(out[("c", 7.0)] - mu) < 1e-12
    # smoothing must not leave helper columns behind
    cols = target_encode_loo(df, "g", "y", prior_weight=1.0).columns
    assert cols == ["g", "y", "target_enc"]


def test_minmax_scale_bounds_and_constant_column(spark):
    from big_data_analysis_spark.ml.features import minmax_scale

    df = spark.createDataFrame(
        [(0.0, 5.0), (5.0, 5.0), (10.0, 5.0)], "x double, c double"
    )
    out = minmax_scale(df, ["x", "c"]).orderBy("x").collect()
    assert [r["x_scaled"] for r in out] == [0.0, 0.5, 1.0]
    # constant column has no defined scale -> NULL, never DIVIDE_BY_ZERO
    assert all(r["c_scaled"] is None for r in out)
    # helper stat columns dropped
    assert set(out[0].asDict()) == {"x", "c", "x_scaled", "c_scaled"}


def test_gbt_regressor_learns_nonlinear_signal(spark):
    from pyspark.ml.feature import VectorAssembler

    from big_data_analysis_spark.ml.regression import gbt_regressor

    rows = [(float(x) / 10, (float(x) / 10 - 3) ** 2) for x in range(60)]
    df = spark.createDataFrame(rows, "x double, label double")
    feats = VectorAssembler(inputCols=["x"], outputCol="features").transform(df)
    model = gbt_regressor().fit(feats)
    pred = model.transform(feats)
    sse = pred.selectExpr("sum(pow(prediction - label, 2)) AS s").head()["s"]
    var = df.selectExpr("count(*) * var_pop(label) AS s").head()["s"]
    assert sse < 0.1 * var  # captures the quadratic a linear fit can't
