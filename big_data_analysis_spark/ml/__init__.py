"""ML pipelines (SURVEY.md §2.10 M1-M23) re-expressed on pyspark.ml.

Modules:
- pipelines    : feature assembly, scaling, classification benchmark (M1-M10, M15, M17)
- regression   : ridge/lasso/elasticnet + grid + time-ordered CV (M11-M14, M16)
- clustering   : PCA, KMeans, BisectingKMeans, silhouette, DBSCAN small-data path (M18-M23)
- kernel       : random Fourier features — RBF-kernel approximation for the
                 LinearSVC/LinearRegression gap (M7/M14)
- inference    : Arrow-batched batch model inference (M25)
- evaluation   : ROC / calibration / gains / chi² / entropy-gain as pure
                 DataFrame aggregations (M15/M17 adjacency)
- features     : column-level encodings and scalings that stay plain
                 DataFrame columns (M1 adjacency)
"""
