"""Model-evaluation and statistical-test operators (SURVEY.md §2.10
M15/M17 adjacency; reference 乳腺癌预测.py:294 roc_curve and the
sklearn metric tables it prints).

Everything here is a pure DataFrame aggregation — no model object, no
driver-side loops — so each op runs on a billion scored rows the same
way it runs on a thousand. The scale contract all four table ops share:
the only global window runs over the DISTINCT-SCORE (or per-bucket)
aggregate, never the raw rows, so the single-partition sort that a
naive percent_rank/ntile would force is bounded by |distinct scores|,
not |rows|. Divisions use try_divide so degenerate inputs (single-class
labels) yield nulls instead of an ANSI DIVIDE_BY_ZERO.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _per_score(df: DataFrame, label_col: str, score_col: str) -> DataFrame:
    """One map-side-combined groupBy(score): ties collapse BEFORE the
    shuffle, so every downstream window ranks |distinct scores| rows."""
    return df.groupBy(F.col(score_col).alias("score")).agg(
        F.count(F.lit(1)).alias("__c"),
        F.sum(F.col(label_col).cast("long")).alias("__pos"),
    )


def quantize_scores(
    df: DataFrame, score_col: str, max_points: int, relative_error: float = 0.001
) -> DataFrame:
    """Scale guard for the sweep ops: map a CONTINUOUS score onto at
    most ``max_points`` quantile-boundary representatives (each score
    becomes the smallest boundary >= it). The distinct-score windows in
    roc_curve/auc/calibration_table are global sorts — harmless when
    scores are discrete, but a continuous scorer on billions of rows
    makes |distinct| ~ |rows| and funnels them through one partition.
    Quantile boundaries come from approx_percentile (mergeable sketch,
    one pass, driver state = max_points doubles) and the binning is a
    broadcast array lookup, so the downstream sweep is bounded by
    max_points regardless of input size. AUC error is O(1/max_points).
    """
    qs = [i / max_points for i in range(1, max_points + 1)]
    bounds = sorted(
        set(
            df.agg(
                F.percentile_approx(
                    score_col, qs, F.lit(int(1.0 / relative_error))
                ).alias("b")
            ).head()["b"]
        )
    )
    arr = F.array(*[F.lit(float(b)) for b in bounds])
    # smallest boundary >= score; scores above the last boundary clamp
    idx = F.aggregate(
        arr,
        F.lit(0),
        lambda acc, b: F.when(F.col(score_col) > b, acc + 1).otherwise(acc),
    )
    rep = F.element_at(arr, F.least(idx + 1, F.lit(len(bounds))))
    return df.withColumn(score_col, rep)


def roc_curve(
    df: DataFrame, label_col: str, score_col: str, max_points: int | None = None
) -> DataFrame:
    """M17 as data, not a model method: ROC points from any (label,
    score) columns — threshold sweep over every DISTINCT score value,
    descending, with TPR = cum_tp / P and FPR = cum_fp / N.

    Plan: one groupBy(score) then a cumulative-sum window over the
    distinct scores. Single-class inputs (P=0 or N=0) yield null
    tpr/fpr via try_divide rather than raising under ANSI mode.
    ``max_points`` bounds the sweep for continuous scores (see
    quantize_scores) — REQUIRED reading at 100 TB: without it a
    continuous score makes the distinct-score window a global sort of
    ~|rows|.
    """
    if max_points is not None:
        df = quantize_scores(df, score_col, max_points)
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
            F.round(F.try_divide(F.col("__cum_tp"), F.col("__p")), 6).alias("tpr"),
            F.round(F.try_divide(F.col("__cum_fp"), F.col("__n")), 6).alias("fpr"),
        )
    )


def auc(
    df: DataFrame, label_col: str, score_col: str, max_points: int | None = None
) -> DataFrame:
    """Area under the ROC curve by trapezoidal rule over the
    distinct-score sweep — one row (auc, n_pos, n_neg). Same scale
    shape as roc_curve: the only window runs over distinct scores.
    Ties are handled exactly (the trapezoid between consecutive
    distinct scores IS the tie correction). ``max_points`` quantizes
    continuous scores (error O(1/max_points)) — the 100 TB setting."""
    if max_points is not None:
        df = quantize_scores(df, score_col, max_points)
    pts = roc_curve(df, label_col, score_col)
    w = Window.orderBy("threshold")
    # threshold DESC order = fpr ascending; lag along ascending fpr
    prev_fpr = F.lag("fpr", -1, 0.0).over(w)
    prev_tpr = F.lag("tpr", -1, 0.0).over(w)
    area = (F.col("fpr") - prev_fpr) * (F.col("tpr") + prev_tpr) / 2
    counts = df.agg(
        F.sum(F.col(label_col).cast("long")).alias("n_pos"),
        F.sum(F.lit(1) - F.col(label_col).cast("long")).alias("n_neg"),
    )
    return (
        pts.withColumn("__a", area)
        .agg(F.round(F.sum("__a"), 6).alias("auc"))
        .crossJoin(counts)
    )


def calibration_table(
    df: DataFrame, label_col: str, score_col: str, n_bins: int = 10
) -> DataFrame:
    """Reliability-diagram table: rank-normalize the score to [0, 1]
    (percent_rank semantics: tied rows share (rank-1)/(N-1)), cut into
    ``n_bins`` equal-rank bins, report each bin's empirical positive
    rate against its mean normalized score. A calibrated scorer has
    pos_rate ≈ mean_score per bin.

    Distributed formulation: because every row with the same score has
    the SAME percent_rank and lands in the SAME bin, the per-row rank
    never needs materializing. One groupBy(score) collapses the data;
    a cumulative-count window over the distinct-score table yields each
    score's rank (= 1 + rows strictly below); bin membership and the
    weighted bin aggregates all derive from that tiny frame. No global
    sort of raw rows anywhere.
    """
    per_score = _per_score(df, label_col, score_col)
    w = Window.orderBy("score").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    totals = Window.partitionBy()
    ranked = (
        per_score.withColumn("__cum", F.sum("__c").over(w))
        .withColumn("__n_tot", F.sum("__c").over(totals))
        # rank-1 of every row tied at this score (all share the group's
        # first index); percent_rank = __r0 / (N-1)
        .withColumn("__r0", F.col("__cum") - F.col("__c"))
        .withColumn(
            "__pr",
            F.coalesce(
                F.try_divide(F.col("__r0"), F.col("__n_tot") - 1),
                F.lit(0.0),  # N == 1: lone row ranks 0.0, as percent_rank does
            ),
        )
        .withColumn(
            "bin",
            F.least(F.floor(F.col("__pr") * n_bins), F.lit(n_bins - 1)).cast("int"),
        )
    )
    # mean_score stays exact-integer until ONE final division
    # (Σ r0·c / (Σc · (N−1))) — bit-identical across engines and
    # partitionings, no float-summation-order sensitivity.
    return (
        ranked.groupBy("bin")
        .agg(
            F.sum("__c").alias("n"),
            F.round(
                F.try_divide(
                    F.sum(F.col("__r0") * F.col("__c")),
                    F.sum("__c") * (F.max("__n_tot") - 1),
                ),
                6,
            ).alias("mean_score"),
            F.round(F.try_divide(F.sum("__pos"), F.sum("__c")), 6).alias("pos_rate"),
        )
        .orderBy("bin")
    )


def cumulative_gains(
    df: DataFrame, label_col: str, score_col: str, n_buckets: int = 10
) -> DataFrame:
    """Gains/lift table: rows ranked by score DESCENDING into
    ``n_buckets`` equal-population buckets; per bucket, the cumulative
    fraction of all positives captured so far and the lift vs random
    targeting. The campaign-targeting readout of a binary scorer.

    Tie handling: a score shared by many rows is split ACROSS the
    buckets its rank range spans, positives allocated proportionally
    (the expected value over random tie order). That removes both the
    single-partition global ntile AND the optimistic label-descending
    tiebreak the naive formulation had: ties can no longer pack
    positives into early buckets.

    Plan: one groupBy(score); a cumulative window over distinct scores
    gives each score group its rank interval (lo, hi]; each group
    explodes to only the buckets it overlaps (≤ n_buckets, usually 1);
    one final groupBy(bucket). Raw rows are touched exactly once.
    """
    per_score = _per_score(df, label_col, score_col)
    w = Window.orderBy(F.col("score").desc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    totals = Window.partitionBy()
    spans = (
        per_score.withColumn("__hi", F.sum("__c").over(w))
        .withColumn("__lo", F.col("__hi") - F.col("__c"))
        .withColumn("__n_tot", F.sum("__c").over(totals))
        .withColumn("__tot_pos", F.sum("__pos").over(totals))
    )
    bucket_width = F.col("__n_tot") / n_buckets
    # Buckets this score group's rank interval (lo, hi] overlaps.
    first_b = (F.floor(F.col("__lo") / bucket_width) + 1).cast("int")
    last_b = F.ceil(F.col("__hi") / bucket_width).cast("int")
    exploded = spans.select(
        "__c",
        "__pos",
        "__lo",
        "__hi",
        "__n_tot",
        "__tot_pos",
        F.explode(
            F.sequence(first_b, F.least(last_b, F.lit(n_buckets)))
        ).alias("bucket"),
    )
    b_lo = (F.col("bucket") - 1) * bucket_width
    b_hi = F.col("bucket") * bucket_width
    overlap = F.greatest(
        F.lit(0.0),
        F.least(F.col("__hi").cast("double"), b_hi)
        - F.greatest(F.col("__lo").cast("double"), b_lo),
    )
    per_bucket = (
        exploded.withColumn("__take", overlap)
        .groupBy("bucket")
        .agg(
            F.round(F.sum("__take"), 6).alias("n"),
            F.sum(
                F.col("__take") * F.try_divide(F.col("__pos"), F.col("__c"))
            ).alias("__pos_take"),
            F.max("__tot_pos").alias("__tot_pos"),
            F.max("__n_tot").alias("__n_tot"),
        )
    )
    wb = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return (
        per_bucket.withColumn("__cum_pos", F.sum("__pos_take").over(wb))
        .withColumn("__cum_n", F.sum("n").over(wb))
        .select(
            "bucket",
            "n",
            F.round(F.try_divide(F.col("__cum_pos"), F.col("__tot_pos")), 6).alias("gain"),
            F.round(
                F.try_divide(
                    F.try_divide(F.col("__cum_pos"), F.col("__tot_pos")),
                    F.try_divide(F.col("__cum_n"), F.col("__n_tot")),
                ),
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

    Null categories are REAL categories here: the marginal joins use
    eqNullSafe, so a null level contributes cells to the statistic and
    a level to the dof exactly like any other value (a USING join would
    silently drop those cells while still counting them in n).

    Plan: ONE groupBy(a, b) over the data; marginals derive from the
    |A|x|B| cell table (re-aggregation of a tiny frame, no second
    scan).
    """
    cells = (
        df.groupBy(F.col(col_a).alias("__a"), F.col(col_b).alias("__b"))
        .agg(F.count(F.lit(1)).alias("__n"))
        .localCheckpoint(eager=True)
    )
    row_m = cells.groupBy(F.col("__a").alias("__a2")).agg(F.sum("__n").alias("__ra"))
    col_m = cells.groupBy(F.col("__b").alias("__b2")).agg(F.sum("__n").alias("__cb"))
    total = cells.agg(F.sum("__n").alias("__t"))
    full = (
        cells.join(row_m, F.col("__a").eqNullSafe(F.col("__a2")))
        .join(col_m, F.col("__b").eqNullSafe(F.col("__b2")))
        .crossJoin(total)
    )
    expected = F.col("__ra") * F.col("__cb") / F.col("__t")
    per_cell = full.select(
        ((F.col("__n") - expected) ** 2 / expected).alias("__x2"),
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
    all in bits. Null feature/label levels count as levels (eqNullSafe
    marginal join — see chi2_independence).

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
    feat_m = cells.groupBy(F.col("__x").alias("__x2")).agg(F.sum("__n").alias("__nx"))
    h_cond = (
        cells.join(feat_m, F.col("__x").eqNullSafe(F.col("__x2")))
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


def welch_ttest(df: DataFrame, group_col: str, value_col: str) -> DataFrame:
    """Pairwise Welch's unequal-variance t-test between every pair of
    groups (the A/B-experiment readout the reference prints as eyeballed
    per-class mean tables, 乳腺癌预测.py:105-139): one row per unordered
    group pair with (n, mean-diff, t statistic, Welch–Satterthwaite
    degrees of freedom, |t|>1.96 flag). The p-value lookup is a
    driver-side scipy call if needed; the statistic is the distributed
    part (same contract as chi2_independence).

    Plan: ONE map-combinable groupBy over the raw rows (count/avg/
    var_samp), then the pairwise part is a self-join of the tiny
    per-group aggregate — broadcast, never touches raw rows again, so
    group count bounds the quadratic term, not row count. Null metric
    values are excluded per group (the SQL count/avg convention).
    Groups with n < 2 have no sample variance and are dropped (a
    1-observation arm has no test)."""
    g = (
        df.filter(F.col(value_col).isNotNull())
        .groupBy(F.col(group_col).alias("grp"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.avg(value_col).alias("m"),
            F.var_samp(value_col).alias("v"),
        )
        .filter(F.col("n") >= 2)
    )
    a = g.select(*[F.col(c).alias(f"{c}_a") for c in g.columns])
    b = g.select(*[F.col(c).alias(f"{c}_b") for c in g.columns])
    j = a.join(F.broadcast(b), F.col("grp_a") < F.col("grp_b"))
    sea = F.col("v_a") / F.col("n_a")
    seb = F.col("v_b") / F.col("n_b")
    se2 = sea + seb
    t = F.try_divide(F.col("m_a") - F.col("m_b"), F.sqrt(se2))
    dof = F.try_divide(
        se2 * se2,
        sea * sea / (F.col("n_a") - 1) + seb * seb / (F.col("n_b") - 1),
    )
    return j.select(
        F.col("grp_a").alias("group_a"),
        F.col("grp_b").alias("group_b"),
        F.col("n_a").cast("long").alias("n_a"),
        F.col("n_b").cast("long").alias("n_b"),
        F.round(F.col("m_a") - F.col("m_b"), 6).alias("mean_diff"),
        F.round(t, 6).alias("t_stat"),
        F.round(dof, 4).alias("welch_df"),
        (F.abs(t) > 1.96).alias("significant_05"),
    )
