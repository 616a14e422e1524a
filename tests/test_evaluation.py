"""Parity tests for ml/evaluation.py: every statistic checked against a
hand-computed numpy reference on fixtures WITH ties and WITH null
categories — the two cases the naive formulations got wrong (global
raw-row windows; USING joins dropping null cells)."""

from __future__ import annotations

import math

import numpy as np
import pytest

from big_data_analysis_spark.ml import evaluation as ev


@pytest.fixture(scope="module")
def scored(spark):
    # scores with heavy ties; labels correlated with score
    rows = [
        (1.0 if (i * 7 + 3) % 10 < (s * 2 + 2) else 0.0, float(s))
        for i, s in enumerate([j % 5 for j in range(200)])
    ]
    return spark.createDataFrame(rows, "label double, score double")


def test_roc_curve_matches_numpy(spark, scored):
    pts = {r["threshold"]: (r["tpr"], r["fpr"]) for r in ev.roc_curve(scored, "label", "score").collect()}
    data = np.array(scored.collect())
    y, s = data[:, 0], data[:, 1]
    P, N = y.sum(), (1 - y).sum()
    for thr in np.unique(s):
        tpr = ((s >= thr) & (y == 1)).sum() / P
        fpr = ((s >= thr) & (y == 0)).sum() / N
        assert pts[thr] == (round(tpr, 6), round(fpr, 6))


def test_roc_curve_single_class_yields_nulls_not_error(spark):
    df = spark.createDataFrame([(1.0, 0.3), (1.0, 0.7)], "label double, score double")
    rows = ev.roc_curve(df, "label", "score").collect()  # ANSI mode: must not raise
    assert all(r["fpr"] is None and r["tpr"] is not None for r in rows)


def test_calibration_table_matches_rawrow_percent_rank(spark, scored):
    """The distributed per-score formulation must equal the definition:
    percent_rank over RAW rows (ties share (rank-1)/(N-1)), floor-cut
    into bins, per-bin weighted means."""
    out = {r["bin"]: r for r in ev.calibration_table(scored, "label", "score", 4).collect()}
    data = sorted(scored.collect(), key=lambda r: r["score"])
    n = len(data)
    ranks = {}
    for idx, r in enumerate(data):
        ranks.setdefault(r["score"], idx)  # first index = rank-1 for the tie group
    prs = [(ranks[r["score"]]) / (n - 1) for r in data]
    bins = [min(int(pr * 4), 3) for pr in prs]
    for b in sorted(set(bins)):
        members = [i for i, bb in enumerate(bins) if bb == b]
        assert out[b]["n"] == len(members)
        assert out[b]["mean_score"] == round(sum(prs[i] for i in members) / len(members), 6)
        assert out[b]["pos_rate"] == round(
            sum(data[i]["label"] for i in members) / len(members), 6
        )


def test_cumulative_gains_proportional_ties(spark):
    """A fully-tied score column must produce gain == bucket/n_buckets
    exactly (random targeting), REGARDLESS of label values — the old
    label-descending tiebreak packed positives early and reported
    optimistic gains; proportional splitting reports lift 1.0."""
    df = spark.createDataFrame(
        [(1.0 if i < 30 else 0.0, 5.0) for i in range(100)], "label double, score double"
    )
    rows = ev.cumulative_gains(df, "label", "score", 5).collect()
    for r in rows:
        assert r["n"] == 20.0
        assert abs(r["gain"] - r["bucket"] / 5) < 1e-9
        assert abs(r["lift"] - 1.0) < 1e-9


def test_cumulative_gains_matches_numpy_no_ties(spark):
    df = spark.createDataFrame(
        [(1.0 if (i * 13) % 7 < 2 else 0.0, float(i)) for i in range(100)],
        "label double, score double",
    )
    rows = ev.cumulative_gains(df, "label", "score", 10).collect()
    data = sorted(df.collect(), key=lambda r: -r["score"])
    tot_pos = sum(r["label"] for r in data)
    for r in rows:
        cum = sum(d["label"] for d in data[: r["bucket"] * 10])
        assert abs(r["gain"] - round(cum / tot_pos, 6)) < 2e-6
        assert r["n"] == 10.0


def test_chi2_counts_null_categories(spark):
    """Null levels are levels: cells with a null key must contribute to
    X² and to dof. Reference value hand-computed over the full 3x2
    contingency table (including the null row)."""
    rows = (
        [("a", "x")] * 20 + [("a", "y")] * 10
        + [("b", "x")] * 5 + [("b", "y")] * 25
        + [(None, "x")] * 15 + [(None, "y")] * 5
    )
    df = spark.createDataFrame(rows, "ca string, cb string")
    got = ev.chi2_independence(df, "ca", "cb").head()
    obs = np.array([[20, 10], [5, 25], [15, 5]], dtype=float)
    exp = obs.sum(1)[:, None] * obs.sum(0)[None, :] / obs.sum()
    chi2 = ((obs - exp) ** 2 / exp).sum()
    assert got["n"] == 80
    assert got["dof"] == 2  # (3-1)*(2-1): the null level counts
    assert got["chi2"] == round(chi2, 6)


def test_entropy_gain_counts_null_feature(spark):
    rows = [("x", 1.0)] * 30 + [("x", 0.0)] * 10 + [(None, 1.0)] * 5 + [(None, 0.0)] * 35
    df = spark.createDataFrame(rows, "feat string, label double")
    got = ev.entropy_gain(df, "label", "feat").head()

    def h(ps):
        return -sum(p * math.log2(p) for p in ps if p > 0)

    h_label = h([35 / 80, 45 / 80])
    h_cond = 40 / 80 * h([30 / 40, 10 / 40]) + 40 / 80 * h([5 / 40, 35 / 40])
    assert got["h_label"] == round(h_label, 6)
    assert got["h_conditional"] == round(h_cond, 6)
    assert got["info_gain"] == round(h_label - h_cond, 6)


def test_auc_matches_mann_whitney_with_ties(spark, scored):
    """Trapezoidal AUC over the distinct-score sweep must equal the
    rank-based Mann-Whitney statistic with midranks — the standard
    tie-exact equivalence (what sklearn computes)."""
    got = ev.auc(scored, "label", "score").head()
    data = np.array(scored.collect())
    y, s = data[:, 0], data[:, 1]
    order = np.argsort(s, kind="mergesort")
    ranks = np.empty(len(s))
    sorted_s = s[order]
    i = 0
    r = 1
    while i < len(s):
        j = i
        while j < len(s) and sorted_s[j] == sorted_s[i]:
            j += 1
        ranks[order[i:j]] = (r + (r + (j - i) - 1)) / 2  # midrank
        r += j - i
        i = j
    P, N = int(y.sum()), int((1 - y).sum())
    u = ranks[y == 1].sum() - P * (P + 1) / 2
    assert abs(got["auc"] - u / (P * N)) < 1e-5
    assert got["n_pos"] == P and got["n_neg"] == N


def test_quantized_auc_approximates_exact(spark):
    """max_points bounds the sweep for continuous scores; the
    quantized AUC must sit within O(1/max_points) of exact."""
    rows = [
        ((1.0 if (i * 29) % 97 < 40 + (i % 50) else 0.0), float(i) + (i % 7) * 0.137)
        for i in range(2000)
    ]
    df = spark.createDataFrame(rows, "label double, score double")
    exact = ev.auc(df, "label", "score").head()["auc"]
    quant = ev.auc(df, "label", "score", max_points=64).head()["auc"]
    assert abs(exact - quant) < 0.03, (exact, quant)
    # the sweep really is bounded
    pts = ev.roc_curve(df, "label", "score", max_points=64).count()
    assert pts <= 64


def test_welch_ttest_matches_closed_form(spark):
    """Hand-computed Welch t and Satterthwaite df on two known arms;
    nulls excluded; n<2 arms dropped; pair order canonical (a < b)."""
    import numpy as np

    xa = [2.1, 2.4, 2.0, 2.6, 2.3]
    xb = [3.0, 3.4, 2.9, 3.3]
    rows = [("a", v) for v in xa] + [("b", v) for v in xb]
    rows += [("a", None), ("c", 1.0)]  # null ignored; 1-obs arm dropped
    df = spark.createDataFrame(rows, "grp string, v double")
    out = ev.welch_ttest(df, "grp", "v").collect()
    assert len(out) == 1
    r = out[0]
    assert (r["group_a"], r["group_b"]) == ("a", "b")
    ma, mb = np.mean(xa), np.mean(xb)
    va, vb = np.var(xa, ddof=1), np.var(xb, ddof=1)
    se2 = va / len(xa) + vb / len(xb)
    t = (ma - mb) / np.sqrt(se2)
    dof = se2**2 / (
        (va / len(xa)) ** 2 / (len(xa) - 1)
        + (vb / len(xb)) ** 2 / (len(xb) - 1)
    )
    assert r["n_a"] == 5 and r["n_b"] == 4
    assert abs(r["t_stat"] - round(t, 6)) < 1e-9
    assert abs(r["welch_df"] - round(dof, 4)) < 1e-9
    assert r["significant_05"] == (abs(t) > 1.96)


def test_welch_ttest_zero_variance_arms_yield_null(spark):
    """Two constant arms: the t statistic is undefined (0 pooled
    variance) — NULL, not +-inf, in t/df/significance (the oracle
    pins the same NULLs via CASE)."""
    rows = [("a", 2.0), ("a", 2.0), ("b", 3.0), ("b", 3.0)]
    df = spark.createDataFrame(rows, "grp string, v double")
    r = ev.welch_ttest(df, "grp", "v").collect()[0]
    assert r["mean_diff"] == -1.0
    assert r["t_stat"] is None
    assert r["welch_df"] is None
    assert r["significant_05"] is None
