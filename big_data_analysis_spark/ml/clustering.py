"""Clustering + dimensionality reduction (SURVEY.md §2.10 M18-M23).

The reference's authorship script (红楼梦作者分析.py) runs PCA(2) ->
{KMeans, Ward agglomerative, DBSCAN-sweep} -> silhouette -> cluster-vs-
truth consistency. Spark mapping:

- M18 pyspark.ml.feature.PCA(k=2) + explainedVariance
- M19 pyspark.ml.clustering.KMeans(k, seed)
- M20 Ward: exact numpy linkage + dendrogram cut on a COLLECTED matrix
      (ward_linkage / ward_cluster, the reference's ~120-row regime);
      BisectingKMeans remains the at-scale divisive analogue
- M21 DBSCAN gap -> exact numpy implementation on a COLLECTED matrix
      (small-data path, documented; the reference's own usage is 120
      rows). The scalable path would be an eps-grid cell join — out of
      reference scope.
- M22 ClusteringEvaluator silhouette (squaredEuclidean)
- M23 cluster<->truth best-of-two label consistency as an aggregate
"""

from __future__ import annotations

from collections.abc import Sequence

import numpy as np

from pyspark.ml import Pipeline
from pyspark.ml.clustering import BisectingKMeans, KMeans
from pyspark.ml.evaluation import ClusteringEvaluator
from pyspark.ml.feature import PCA
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from big_data_analysis_spark.ml.pipelines import assemble_features


def pca_project(
    df: DataFrame, feature_cols: Sequence[str], k: int = 2, out_col: str = "pca_features"
) -> tuple[DataFrame, list[float]]:
    """M18: z-scaled PCA projection (reference 红楼梦作者分析.py:141-149
    scales then projects to 2 components). Returns (projected df,
    explained-variance ratios)."""
    stages = assemble_features(feature_cols) + [PCA(k=k, inputCol="features", outputCol=out_col)]
    model = Pipeline(stages=stages).fit(df)
    projected = model.transform(df)
    return projected, [float(v) for v in model.stages[-1].explainedVariance]


def kmeans_cluster(
    df: DataFrame,
    features_col: str = "features",
    k: int = 2,
    seed: int = 42,
    prediction_col: str = "cluster",
) -> tuple[DataFrame, float]:
    """M19+M22: KMeans(k, seed) + silhouette (reference
    红楼梦作者分析.py:176-178). Returns (clustered df, silhouette)."""
    km = KMeans(k=k, seed=seed, featuresCol=features_col, predictionCol=prediction_col)
    model = km.fit(df)
    clustered = model.transform(df)
    sil = ClusteringEvaluator(
        featuresCol=features_col, predictionCol=prediction_col, metricName="silhouette"
    ).evaluate(clustered)
    return clustered, float(sil)


def bisecting_kmeans_cluster(
    df: DataFrame,
    features_col: str = "features",
    k: int = 2,
    seed: int = 42,
    prediction_col: str = "cluster",
) -> DataFrame:
    """M20: divisive hierarchical clustering — the scalable analogue of
    the reference's Ward agglomerative (红楼梦作者分析.py:163-164);
    agglomerative linkage itself is inherently O(n²) memory and stays a
    driver-side scipy call on collected small matrices."""
    bkm = BisectingKMeans(k=k, seed=seed, featuresCol=features_col, predictionCol=prediction_col)
    return bkm.fit(df).transform(df)


def dbscan_small(
    df: DataFrame,
    feature_cols: Sequence[str],
    eps: float,
    min_samples: int,
    id_col: str | None = None,
    max_rows: int = 100_000,
) -> DataFrame:
    """M21: exact DBSCAN on a collected matrix (numpy BFS over the
    eps-neighborhood graph — sklearn is not a dependency). The reference
    sweeps 24 (eps, min_samples) combos over 120 rows
    (红楼梦作者分析.py:189-220); this path is for that regime and guards
    against misuse at scale with ``max_rows``. Labels: -1 = noise."""
    n = df.count()
    if n > max_rows:
        raise ValueError(f"dbscan_small is a small-data path (n={n} > {max_rows})")
    cols = ([id_col] if id_col else []) + list(feature_cols)
    pdf = df.select(*cols).toPandas()
    x = pdf[list(feature_cols)].to_numpy(dtype=float)
    d2 = ((x[:, None, :] - x[None, :, :]) ** 2).sum(axis=2)
    neighbors = [np.flatnonzero(row <= eps * eps) for row in d2]
    labels = np.full(n, -1, dtype=int)
    core = np.array([len(nb) >= min_samples for nb in neighbors])
    cluster = 0
    for i in range(n):
        if labels[i] != -1 or not core[i]:
            continue
        stack = [i]
        labels[i] = cluster
        while stack:
            j = stack.pop()
            if not core[j]:
                continue
            for nb in neighbors[j]:
                if labels[nb] == -1:
                    labels[nb] = cluster
                    stack.append(nb)
        cluster += 1
    pdf["cluster"] = labels
    return df.sparkSession.createDataFrame(pdf)


def dbscan_sweep(
    df: DataFrame,
    feature_cols: Sequence[str],
    eps_values: Sequence[float],
    min_samples_values: Sequence[int],
    id_col: str | None = None,
) -> DataFrame:
    """M21: the reference's 6x4 parameter sweep, silhouette-scored where
    >1 cluster is found (红楼梦作者分析.py:192-220)."""
    rows = []
    for eps in eps_values:
        for ms in min_samples_values:
            labeled = dbscan_small(df, feature_cols, eps, ms, id_col=id_col)
            counts = labeled.groupBy("cluster").count().collect()
            n_clusters = sum(1 for r in counts if r["cluster"] != -1)
            n_noise = sum(r["count"] for r in counts if r["cluster"] == -1)
            rows.append(
                {"eps": float(eps), "min_samples": int(ms), "n_clusters": n_clusters, "n_noise": n_noise}
            )
    return df.sparkSession.createDataFrame(rows)


def cluster_truth_consistency(
    df: DataFrame, cluster_col: str = "cluster", truth_col: str = "truth"
) -> float:
    """M23: best-of-two label-matching accuracy for binary clusterings
    (reference 红楼梦作者分析.py:335-349): clustering labels are
    arbitrary, so score max(acc, 1-acc) in one aggregate."""
    row = df.agg(
        F.avg((F.col(cluster_col) == F.col(truth_col)).cast("double")).alias("acc")
    ).head()
    acc = float(row["acc"])
    return max(acc, 1.0 - acc)


def ward_linkage(
    df: DataFrame,
    feature_cols: Sequence[str],
    id_col: str | None = None,
    max_rows: int = 10_000,
) -> DataFrame:
    """M20: Ward hierarchical-clustering linkage table (the reference's
    dendrogram input, 红楼梦作者分析.py:297-299) on a COLLECTED matrix —
    the documented small-data path (reference usage is ~120 chapter
    rows; ``max_rows`` guards misuse; BisectingKMeans is the at-scale
    divisive analogue).

    Pure numpy Lance-Williams recurrence on squared euclidean distances
    (no scipy dependency); output rows follow scipy's linkage
    convention: step t merges ``cluster_a``/``cluster_b`` (original
    points are 0..n-1, merged clusters n+t) at cophenetic ``distance``
    into a cluster of ``size``. Ward distances are monotone
    non-decreasing across steps (asserted in tests)."""
    n = df.count()
    if n > max_rows:
        raise ValueError(f"ward_linkage is a small-data path (n={n} > {max_rows})")
    cols = ([id_col] if id_col else []) + list(feature_cols)
    pdf = df.select(*cols).toPandas()
    x = pdf[list(feature_cols)].to_numpy(dtype=float)

    sq = ((x[:, None, :] - x[None, :, :]) ** 2).sum(axis=2)
    np.fill_diagonal(sq, np.inf)
    sizes = np.ones(n)
    cluster_id = np.arange(n)
    active = np.ones(n, dtype=bool)
    merges = []
    for step in range(n - 1):
        masked = np.where(active[:, None] & active[None, :], sq, np.inf)
        i, j = np.unravel_index(np.argmin(masked), masked.shape)
        if i > j:
            i, j = j, i
        d = float(np.sqrt(sq[i, j]))
        a, b = int(cluster_id[i]), int(cluster_id[j])
        new_size = sizes[i] + sizes[j]
        merges.append((min(a, b), max(a, b), round(d, 9), int(new_size)))
        # Lance-Williams (Ward) update of squared distances into slot i.
        k_mask = active.copy()
        k_mask[[i, j]] = False
        nk = sizes[k_mask]
        upd = (
            (sizes[i] + nk) * sq[i, k_mask]
            + (sizes[j] + nk) * sq[j, k_mask]
            - nk * sq[i, j]
        ) / (sizes[i] + sizes[j] + nk)
        sq[i, k_mask] = upd
        sq[k_mask, i] = upd
        sizes[i] = new_size
        cluster_id[i] = n + step
        active[j] = False
    out = df.sparkSession.createDataFrame(
        [(t,) + m for t, m in enumerate(merges)],
        "step int, cluster_a int, cluster_b int, distance double, size int",
    )
    return out


def ward_cluster(
    df: DataFrame,
    feature_cols: Sequence[str],
    k: int,
    id_col: str | None = None,
    max_rows: int = 10_000,
) -> DataFrame:
    """M20: cut the Ward dendrogram at ``k`` clusters and label the rows
    (reference fcluster usage). Runs the linkage, replays the first
    n-k merges with union-find, relabels components 0..k-1 in
    first-appearance order, and returns the input with a ``cluster``
    column. Same small-data contract as ward_linkage."""
    n = df.count()
    if n > max_rows:
        raise ValueError(f"ward_cluster is a small-data path (n={n} > {max_rows})")
    linkage = ward_linkage(df, feature_cols, id_col=id_col, max_rows=max_rows).collect()
    parent = list(range(n + len(linkage)))

    def find(u: int) -> int:
        while parent[u] != u:
            parent[u] = parent[parent[u]]
            u = parent[u]
        return u

    for row in sorted(linkage, key=lambda r: r["step"])[: n - k]:
        new = n + row["step"]
        parent[find(row["cluster_a"])] = new
        parent[find(row["cluster_b"])] = new
    labels, remap = [], {}
    for i in range(n):
        root = find(i)
        labels.append(remap.setdefault(root, len(remap)))
    cols = ([id_col] if id_col else []) + list(feature_cols)
    pdf = df.select(*cols).toPandas()
    pdf["cluster"] = labels
    return df.sparkSession.createDataFrame(pdf)
