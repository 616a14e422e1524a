"""Model-evaluation and statistical-test operators (SURVEY.md §2.10
M15/M17 adjacency; reference 乳腺癌预测.py:294 roc_curve and the
sklearn metric tables it prints).

Everything here is a pure DataFrame aggregation — no model object, no
driver-side loops — so each op runs on a billion scored rows the same
way it runs on a thousand: one or two shuffles, all arithmetic inside
whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def roc_curve(
    df: DataFrame, label_col: str, score_col: str
) -> DataFrame:
    """M17 as data, not a model method: ROC points from any (label,
    score) columns — threshold sweep over every DISTINCT score value,
    descending, with TPR = cum_tp / P and FPR = cum_fp / N.

    Plan: one groupBy(score) (map-side combined — ties collapse before
    the shuffle) then a cumulative-sum window over the distinct scores.
    The window is a single global ordering over DISTINCT scores — a
    range-partitioned sort of at most |distinct scores| rows, never the
    raw row count. Round-trip safe: counts are exact longs; the two
    ratios are rounded at the edge.
    """
    per_score = df.groupBy(F.col(score_col).alias("threshold")).agg(
        F.sum(F.col(label_col).cast("long")).alias("__pos"),
        F.sum(F.lit(1) - F.col(label_col).cast("long")).alias("__neg"),
    )
    w = Window.orderBy(F.col("threshold").desc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    totals = Window.partitionBy()
    return (
        per_score.withColumn("__cum_tp", F.sum("__pos").over(w))
        .withColumn("__cum_fp", F.sum("__neg").over(w))
        .withColumn("__p", F.sum("__pos").over(totals))
        .withColumn("__n", F.sum("__neg").over(totals))
        .select(
            "threshold",
            F.round(F.col("__cum_tp") / F.col("__p"), 6).alias("tpr"),
            F.round(F.col("__cum_fp") / F.col("__n"), 6).alias("fpr"),
        )
    )


def calibration_table(
    df: DataFrame, label_col: str, score_col: str, n_bins: int = 10
) -> DataFrame:
    """Reliability-diagram table: rank-normalize the score with
    percent_rank (exactly one IEEE division per row — bit-identical
    across engines, unlike exp/sigmoid normalizations), cut into
    ``n_bins`` equal-rank bins, and report each bin's empirical
    positive rate against its mean normalized score. A calibrated
    scorer has pos_rate ≈ mean_score per bin.

    Ties share a percent_rank (rank semantics), so bin membership is
    deterministic under shuffle without a tiebreaker column.
    """
    pr = F.percent_rank().over(Window.orderBy(score_col))
    binned = df.select(
        F.col(label_col).cast("long").alias("__y"), pr.alias("__pr")
    ).withColumn(
        "bin",
        F.least(F.floor(F.col("__pr") * n_bins), F.lit(n_bins - 1)).cast("int"),
    )
    return (
        binned.groupBy("bin")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.avg("__pr"), 6).alias("mean_score"),
            F.round(F.avg("__y"), 6).alias("pos_rate"),
        )
        .orderBy("bin")
    )


def cumulative_gains(
    df: DataFrame, label_col: str, score_col: str, n_buckets: int = 10
) -> DataFrame:
    """Gains/lift table: rows bucketed by score DESCENDING rank into
    ``n_buckets`` equal-population buckets; per bucket, the cumulative
    fraction of all positives captured so far and the lift vs random
    targeting. The campaign-targeting readout of a binary scorer.

    ntile handles the bucketing (equal counts ±1); the cumulative sums
    run over the n_buckets-row aggregate, not the raw data.
    """
    nt = F.ntile(n_buckets).over(
        Window.orderBy(F.col(score_col).desc(), F.col(label_col).desc())
    )
    per_bucket = (
        df.select(F.col(label_col).cast("long").alias("__y"))
        .withColumn("bucket", nt)
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("__y").alias("__pos"))
    )
    w = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    totals = Window.partitionBy()
    return (
        per_bucket.withColumn("__cum_pos", F.sum("__pos").over(w))
        .withColumn("__cum_n", F.sum("n").over(w))
        .withColumn("__tot_pos", F.sum("__pos").over(totals))
        .withColumn("__tot_n", F.sum("n").over(totals))
        .select(
            "bucket",
            "n",
            F.round(F.col("__cum_pos") / F.col("__tot_pos"), 6).alias("gain"),
            F.round(
                (F.col("__cum_pos") / F.col("__tot_pos"))
                / (F.col("__cum_n") / F.col("__tot_n")),
                6,
            ).alias("lift"),
        )
        .orderBy("bucket")
    )


def chi2_independence(df: DataFrame, col_a: str, col_b: str) -> DataFrame:
    """Pearson chi-square test of independence between two categorical
    columns: one contingency aggregate, expected counts from the
    marginal products, X² = Σ (obs − exp)² / exp. Returns a single row
    (chi2, dof, n). The p-value lookup is a driver-side scipy call if
    needed — the statistic itself is the distributed part.

    Plan: ONE groupBy(a, b) over the data; marginals derive from the
    |A|x|B| cell table (re-aggregation of a tiny frame, no second
    scan).
    """
    cells = (
        df.groupBy(F.col(col_a).alias("__a"), F.col(col_b).alias("__b"))
        .agg(F.count(F.lit(1)).alias("__n"))
        .localCheckpoint(eager=True)
    )
    row_m = cells.groupBy("__a").agg(F.sum("__n").alias("__ra"))
    col_m = cells.groupBy("__b").agg(F.sum("__n").alias("__cb"))
    total = cells.agg(F.sum("__n").alias("__t"))
    full = cells.join(row_m, "__a").join(col_m, "__b").crossJoin(total)
    expected = F.col("__ra") * F.col("__cb") / F.col("__t")
    per_cell = full.select(
        ((F.col("__n") - expected) ** 2 / expected).alias("__x2"),
        "__a",
        "__b",
    )
    n_a = cells.select("__a").distinct().count()
    n_b = cells.select("__b").distinct().count()
    return per_cell.agg(
        F.round(F.sum("__x2"), 6).alias("chi2"),
        F.lit((n_a - 1) * (n_b - 1)).cast("long").alias("dof"),
    ).crossJoin(total.select(F.col("__t").cast("long").alias("n")))


def entropy_gain(df: DataFrame, label_col: str, feature_col: str) -> DataFrame:
    """Information gain of a candidate categorical split — the quantity
    a decision-tree induction ranks features by (reference benchmarks
    DecisionTreeClassifier; this exposes the impurity math as an
    engine op). Returns one row: H(Y), H(Y|X) and their difference,
    all in bits.

    Plan: ONE groupBy(feature, label) pass; both entropies derive from
    the tiny cell table (label marginal = re-aggregation, conditional
    = per-feature-value entropy weighted by feature frequency).
    """
    cells = (
        df.groupBy(F.col(feature_col).alias("__x"), F.col(label_col).alias("__y"))
        .agg(F.count(F.lit(1)).alias("__n"))
        .localCheckpoint(eager=True)
    )
    total = cells.agg(F.sum("__n").alias("__t")).head()["__t"]
    label_m = cells.groupBy("__y").agg(F.sum("__n").alias("__ny"))
    h_label = label_m.select(
        (-F.sum(
            (F.col("__ny") / total) * F.log2(F.col("__ny") / total)
        )).alias("h")
    )
    feat_m = cells.groupBy("__x").agg(F.sum("__n").alias("__nx"))
    h_cond = (
        cells.join(feat_m, "__x")
        .groupBy("__x", "__nx")
        .agg(
            (-F.sum(
                (F.col("__n") / F.col("__nx")) * F.log2(F.col("__n") / F.col("__nx"))
            )).alias("__hx")
        )
        .select((F.sum(F.col("__nx") / total * F.col("__hx"))).alias("h"))
    )
    hl = h_label.head()["h"]
    hc = h_cond.head()["h"]
    spark = df.sparkSession
    return spark.createDataFrame(
        [(round(hl, 6), round(hc, 6), round(hl - hc, 6))],
        "h_label double, h_conditional double, info_gain double",
    )
