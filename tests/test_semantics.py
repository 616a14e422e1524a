"""Semantics unit tests for the translation traps called out in
SURVEY.md §1.2/§1.3/§5.2-4: implicit-row-order -> window parity against
pandas itself, null-vs-NaN divergence, keep-last determinism, GBK
charset reads, CJK numeral parsing, overlapping substring counting."""

from __future__ import annotations

import os

import pandas as pd
import pytest
from pyspark.sql import functions as F

from big_data_analysis_spark.io import read_csv, write_csv
from big_data_analysis_spark.operators import relational as rel
from big_data_analysis_spark.operators import text as tx
from big_data_analysis_spark.operators import timeseries as ts

SCRATCH = "/root/repo/.scratch/semantics-tests"


@pytest.fixture(scope="module")
def series_df(spark):
    rows = [(i, float(v)) for i, v in enumerate([3, 1, 4, 1, 5, 9, 2, 6, 5, 3, 5, 8])]
    return spark.createDataFrame(rows, ["day", "y"])


def _pandas_frame():
    return pd.DataFrame({"y": [3.0, 1, 4, 1, 5, 9, 2, 6, 5, 3, 5, 8]})


def test_lag_matches_pandas_shift(spark, series_df):
    """W1: lag(n) over orderBy == pandas shift(n) on the ordered frame."""
    pdf = _pandas_frame()
    for n in (1, 3, 7):
        expected = pdf["y"].shift(n).tolist()
        got = [
            r[f"y_lag{n}"]
            for r in ts.add_lag_features(series_df, ["y"], [n], order_by=["day"])
            .orderBy("day")
            .collect()
        ]
        assert got == pytest.approx(expected, nan_ok=True) or _nan_eq(got, expected)


def _nan_eq(a, b):
    import math

    return len(a) == len(b) and all(
        (x is None and (y is None or math.isnan(y))) or x == y for x, y in zip(a, b)
    )


def test_trailing_mean_matches_pandas_rolling_shift(spark, series_df):
    """W2: avg over rowsBetween(-n, -1) == pandas
    rolling(n, min_periods=1).mean().shift(1) — the reference's exact
    leakage-shifted construction (新冠疫情分析.py:63-66)."""
    pdf = _pandas_frame()
    for n in (3, 7):
        expected = pdf["y"].rolling(n, min_periods=1).mean().shift(1).tolist()
        got = [
            r[f"y_ma{n}"]
            for r in ts.add_trailing_mean(series_df, ["y"], [n], order_by=["day"])
            .orderBy("day")
            .collect()
        ]
        assert _nan_eq(got, expected), (n, got, expected)


def test_pct_change_and_diff_match_pandas(spark, series_df):
    """W3/W4: shifted pct_change and diff against pandas."""
    pdf = _pandas_frame()
    expected_pct = pdf["y"].pct_change().shift(1).tolist()
    got_pct = [
        r["y_pct"]
        for r in ts.add_pct_change(series_df, ["y"], order_by=["day"]).orderBy("day").collect()
    ]
    assert all(
        (g is None and (e is None or e != e)) or g == pytest.approx(e)
        for g, e in zip(got_pct, expected_pct)
    )

    expected_diff = pdf["y"].diff(7).shift(1).tolist()
    got_diff = [
        r["y_diff7"]
        for r in ts.add_diff(series_df, ["y"], [7], order_by=["day"]).orderBy("day").collect()
    ]
    assert _nan_eq(got_diff, expected_diff)


def test_null_vs_nan_are_distinct(spark):
    """§1.2: Spark keeps NULL and NaN distinct; the cleaning op must
    normalize BOTH (pandas conflates them as NaN)."""
    df = spark.createDataFrame(
        [(1, None), (2, float("nan")), (3, float("inf")), (4, 7.0)], ["id", "x"]
    )
    assert df.filter(F.col("x").isNull()).count() == 1
    assert df.filter(F.isnan("x")).count() == 1  # NaN is NOT null
    cleaned = rel.clean_non_finite(df, ["x"], fill=0.0)
    vals = {r["id"]: r["x"] for r in cleaned.collect()}
    assert vals == {1: 0.0, 2: 0.0, 3: 0.0, 4: 7.0}


def test_keep_last_deterministic_under_shuffle(spark):
    """D1: keep-last must be a function of the declared ordering, not of
    physical row order — repartition shuffles must not change it."""
    rows = [("a", i, f"v{i}") for i in range(50)] + [("b", i, f"w{i}") for i in range(50)]
    df = spark.createDataFrame(rows, ["k", "seq", "val"])
    for parts in (1, 7, 32):
        # String order_by = "keep last under this column's ascending
        # order" (the API flips it to desc rank internally).
        out = rel.dedup_keep_last(df.repartition(parts), ["k"], ["seq"])
        got = {r["k"]: r["val"] for r in out.collect()}
        assert got == {"a": "v49", "b": "w49"}


def test_gbk_csv_roundtrip(spark):
    """S2: GBK-encoded CSV scan (reference 新冠疫情分析.py:30 reads GBK
    sources)."""
    os.makedirs(SCRATCH, exist_ok=True)
    path = os.path.join(SCRATCH, "gbk.csv")
    with open(path, "w", encoding="gbk") as f:
        f.write("名称,价格\n白菜,1.5\n猪肉,12.8\n")
    df = read_csv(spark, path, encoding="GBK")
    rows = {r["名称"]: r["价格"] for r in df.collect()}
    assert rows == {"白菜": 1.5, "猪肉": 12.8}


def test_gbk_csv_leading_blank_and_quoted_header(spark):
    """S2 hardening: a file starting with a blank line still finds its
    header, and quoted header fields containing commas parse with
    csv-module semantics (not naive split(','))."""
    os.makedirs(SCRATCH, exist_ok=True)
    path = os.path.join(SCRATCH, "gbk_tricky.csv")
    with open(path, "w", encoding="gbk") as f:
        f.write('\n"名称, 中文",价格\n白菜,1.5\n')
    df = read_csv(spark, path, encoding="GBK")
    assert df.columns == ["名称, 中文", "价格"]
    rows = df.collect()
    assert len(rows) == 1 and rows[0]["价格"] == 1.5


def test_salted_join_rejects_outer(spark):
    """Replicated-side outer joins would duplicate unmatched rows once
    per salt bucket — the API must refuse them."""
    df = spark.createDataFrame([(1, "a")], ["k", "v"])
    with pytest.raises(ValueError, match="salted_join"):
        rel.salted_join(df, df.select("k"), ["k"], how="full_outer")
    with pytest.raises(ValueError, match="salted_join"):
        rel.salted_join(df, df.select("k"), ["k"], how="right")


def test_cn_numeral_parser(spark):
    """P13 (reference 红楼梦作者分析.py:59-82)."""
    cases = {
        "一": 1, "十": 10, "十五": 15, "二十": 20, "二十三": 23,
        "一百": 100, "一百零八": 108, "一百二十": 120, "三百六十五": 365,
    }
    df = spark.createDataFrame([(s,) for s in cases], ["cn"])
    out = {r["cn"]: r["n"] for r in df.select("cn", tx.cn_numeral_udf("cn").alias("n")).collect()}
    assert out == cases
    assert tx.parse_cn_numeral("abc") is None
    assert tx.parse_cn_numeral(None) is None


def test_substring_count_non_overlapping(spark):
    """T4: the replace trick must match Python str.count (non-overlapping)
    — 'aaaa'.count('aa') == 2, not 3."""
    df = spark.createDataFrame([("aaaa",), ("abcabcab",)], ["text"])
    out = df.select("text", tx.substring_count("text", "aa").alias("c")).collect()
    got = {r["text"]: r["c"] for r in out}
    assert got["aaaa"] == "aaaa".count("aa") == 2
    df2 = df.select("text", tx.substring_count("text", "abc").alias("c"))
    assert {r["text"]: r["c"] for r in df2.collect()}["abcabcab"] == 2


def test_try_cast_coerce(spark):
    """P7: to_numeric(errors='coerce') semantics — bad cells become
    NULL, never a job failure (ANSI mode is ON in Spark 4)."""
    df = spark.createDataFrame([("1.5",), ("oops",), ("  ",), ("2",)], ["s"])
    out = rel.to_numeric_coerce(df, ["s"])
    vals = [r["s"] for r in out.collect()]
    assert vals == [1.5, None, None, 2.0]


def test_csv_sink_roundtrip(spark):
    """S6/S7: CSV sink writes readable output."""
    df = spark.createDataFrame([(2, "b"), (1, "a")], ["id", "v"])
    path = os.path.join(SCRATCH, "out_csv")
    write_csv(df.orderBy("id"), path, single_file=True)
    back = read_csv(spark, path)
    assert sorted(tuple(r) for r in back.collect()) == [(1, "a"), (2, "b")]


def test_csv_sink_bom(spark):
    """S6 utf-8-sig flag: BOM present exactly once, and the file still
    round-trips through the reader."""
    import glob

    df = spark.createDataFrame([(1, "名称")], ["id", "v"])
    path = os.path.join(SCRATCH, "bom_csv")
    write_csv(df, path, single_file=True, bom=True)
    part = glob.glob(os.path.join(path, "part-*.csv"))[0]
    raw = open(part, "rb").read()
    assert raw.startswith(b"\xef\xbb\xbf") and not raw[3:].startswith(b"\xef\xbb\xbf")
    back = read_csv(spark, path)
    assert back.count() == 1


def test_asof_join_hand_values(spark):
    """As-of join: backward inclusive, per key, NULL when nothing
    precedes — hand-checked against the definition."""
    left = spark.createDataFrame(
        [("a", 10, "L1"), ("a", 20, "L2"), ("a", 5, "L0"), ("b", 10, "L3")],
        ["k", "t", "lv"],
    ).select("k", F.col("t").cast("timestamp").alias("t"), "lv")
    right = spark.createDataFrame(
        [("a", 7, 1.0), ("a", 10, 2.0), ("a", 15, 3.0), ("c", 1, 9.0)],
        ["k", "t", "rv"],
    ).select("k", F.col("t").cast("timestamp").alias("t"), "rv")
    out = {
        r["lv"]: (r["rv_asof"], r["t_asof"])
        for r in ts.asof_join(left, right, ["k"], "t", ["rv"]).collect()
    }
    assert out["L0"] == (None, None)  # nothing at or before t=5
    assert out["L1"][0] == 2.0  # t=10 matches the equal-ts right row (inclusive)
    assert out["L2"][0] == 3.0  # latest <= 20 is t=15
    assert out["L3"] == (None, None)  # key b has no right rows


def test_interval_join_hand_values_and_plan(spark):
    """Interval join: inclusive containment, bucket width smaller AND
    larger than the intervals gives identical results, and the plan is
    an equi hash join — never BroadcastNestedLoopJoin."""
    from big_data_analysis_spark.plans import formatted_plan

    pts = spark.createDataFrame(
        [("a", 5), ("a", 10), ("a", 30), ("b", 10)], ["k", "t"]
    ).select("k", F.col("t").cast("timestamp").alias("t"))
    iv = spark.createDataFrame(
        [("a", 0, 10, "w1"), ("a", 25, 40, "w2"), ("b", 50, 60, "w3")],
        ["k", "s", "e", "w"],
    ).select(
        "k",
        F.col("s").cast("timestamp").alias("s"),
        F.col("e").cast("timestamp").alias("e"),
        "w",
    )
    for width in (2, 3600):
        out = ts.interval_join(pts, iv, "t", "s", "e", on=["k"], bucket_seconds=width)
        got = sorted((r["w"], r["t"].second + 60 * r["t"].minute) for r in out.collect())
        assert got == [("w1", 5), ("w1", 10), ("w2", 30)], (width, got)
    plan = formatted_plan(
        ts.interval_join(pts, iv, "t", "s", "e", on=["k"], bucket_seconds=2)
    )
    assert "NestedLoop" not in plan


def test_ewma_matches_pandas_adjusted(spark, series_df):
    """EWMA with span >= series length == pandas ewm(alpha,
    adjust=True).mean() (no truncation in play); the truncated form is
    the same formula over the last `span` lags."""
    pdf = _pandas_frame()
    expected = pdf["y"].ewm(alpha=0.4, adjust=True).mean().tolist()
    got = [
        r["y_ewma"]
        for r in ts.add_ewma(
            series_df, ["y"], order_by=["day"], alpha=0.4, span=12
        )
        .orderBy("day")
        .collect()
    ]
    assert got == pytest.approx(expected, rel=1e-12)


def test_ewma_truncation_and_leakage_shift(spark, series_df):
    """span=1, shift=1 degenerates to lag(1): the leakage-safe base
    case; and a truncated span uses only the trailing `span` values."""
    rows = (
        ts.add_ewma(series_df, ["y"], order_by=["day"], alpha=0.4, span=1, shift=1)
        .orderBy("day")
        .collect()
    )
    ys = [r["y"] for r in rows]
    got = [r["y_ewma"] for r in rows]
    assert got[0] is None and got[1:] == ys[:-1]


def test_range_agg_event_time_vs_rows_and_peers(spark):
    """RANGE frame semantics: the trailing window follows timestamps
    (a long gap empties it — a ROWS frame would not), and rows sharing
    a timestamp are peers that each see the full peer-group sum."""
    from big_data_analysis_spark.operators.timeseries import add_range_agg

    df = spark.createDataFrame(
        [
            (1, "2024-01-01 00:00:00", 10),
            (2, "2024-01-01 00:00:30", 5),
            (3, "2024-01-01 00:02:00", 2),    # 60s window: only itself + none
            (4, "2024-01-01 00:02:00", 3),    # peer of row 3
        ],
        "id int, ts string, v int",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    out = {
        r["id"]: (r["w_sum"], r["w_count"])
        for r in add_range_agg(
            df.withColumn("k", F.lit("g")), "v", "ts", 60, ["k"],
            aggs=("sum", "count"), prefix="w",
        ).collect()
    }
    assert out[1] == (10, 1)
    assert out[2] == (15, 2)          # 30s apart: inside 60s window
    assert out[3] == (5, 2) and out[4] == (5, 2)  # gap emptied it; peers share


def test_rolling_median_matches_pandas_and_resists_spikes(spark):
    """Trailing median == pandas rolling(n, min_periods=1).median();
    a single spike that drags the mean leaves the median unmoved."""
    import pandas as pd

    from big_data_analysis_spark.operators.timeseries import (
        add_rolling_median,
        add_trailing_mean,
    )

    vals = [10.0, 11.0, 9.0, 1000.0, 10.0, 12.0, 11.0, 9.0]
    pdf = pd.DataFrame({"t": range(len(vals)), "v": vals})
    df = spark.createDataFrame(pdf)
    got = {
        r["t"]: r["v_med3"]
        for r in add_rolling_median(
            df.withColumn("__g", F.lit(1)), ["v"], 3, ["t"], ["__g"]
        ).collect()
    }
    want = pdf["v"].rolling(3, min_periods=1).median()
    for t in range(len(vals)):
        assert got[t] == want[t], (t, got[t], want[t])
    # the spike at t=3 sits in t=4's window [9, 1000, 10]: the mean
    # blows past 300 while the median stays at the central 10
    mean_row = add_trailing_mean(
        df.withColumn("__g", F.lit(1)), ["v"], [3], ["t"], ["__g"]
    ).filter(F.col("t") == 4).head()
    assert got[4] == 10.0 and mean_row["v_ma3"] > 300


def test_grouped_ols_recovers_known_lines(spark):
    """Two groups with exact linear data: slope/intercept recovered to
    float precision, r2 == 1, and a noisy group gets r2 < 1."""
    from big_data_analysis_spark.ml.regression import grouped_ols

    rows = [("a", float(x), 2.0 * x + 5.0) for x in range(10)]
    rows += [("b", float(x), -1.5 * x + 3.0) for x in range(10)]
    rows += [("c", float(x), x + (1.0 if x % 2 else -1.0)) for x in range(10)]
    df = spark.createDataFrame(rows, "g string, x double, y double")
    got = {r["g"]: r for r in grouped_ols(df, ["g"], "x", "y").collect()}
    assert abs(got["a"]["slope"] - 2.0) < 1e-12 and abs(got["a"]["intercept"] - 5.0) < 1e-12
    assert abs(got["b"]["slope"] + 1.5) < 1e-12
    assert abs(got["a"]["r2"] - 1.0) < 1e-12
    assert got["c"]["r2"] < 1.0 and got["c"]["n_obs"] == 10


def test_zscore_outliers_flags_and_zero_variance(spark):
    """The planted outlier is flagged with the right z-score; a
    zero-variance group yields no outliers instead of NaN/error."""
    from big_data_analysis_spark.operators.relational import zscore_outliers

    rows = [(i, "g1", 10.0) for i in range(20)] + [(100, "g1", 10.0)]
    rows = [(i, "g1", float(v)) for i, v in enumerate([9, 10, 11, 10, 9, 11, 10, 9, 11, 10])]
    rows += [(99, "g1", 50.0)]                      # clear outlier
    rows += [(200 + i, "flat", 7.0) for i in range(5)]  # sigma == 0
    df = spark.createDataFrame(rows, "id int, g string, v double")
    out = zscore_outliers(df, "v", ["g"], z=2.5)
    got = out.collect()
    assert [r["id"] for r in got] == [99]
    assert got[0]["zscore"] > 2.5


def test_funnel_counts_respects_event_order(spark):
    """A user whose purchase precedes the click does NOT reach the
    purchase stage; first-touch anchors are the earliest qualifiers."""
    from big_data_analysis_spark.operators.timeseries import funnel_counts

    rows = [
        # u1: full ordered funnel
        (1, 10, "view"), (1, 20, "click"), (1, 30, "purchase"),
        # u2: purchase BEFORE click -> stops at click
        (2, 10, "view"), (2, 30, "click"), (2, 20, "purchase"),
        # u3: click with no prior view -> never enters
        (3, 10, "click"), (3, 20, "purchase"),
        # u4: view only
        (4, 10, "view"),
    ]
    df = spark.createDataFrame(rows, "user_id int, ts int, event_type string")
    out = {
        r["stage"]: r["n_users"]
        for r in funnel_counts(
            df, ["view", "click", "purchase"], "user_id", "ts", "event_type"
        ).collect()
    }
    assert out == {"view": 3, "click": 2, "purchase": 1}


def test_markov_transitions_probabilities(spark):
    """Known chain: a->b twice, a->c once => P(b|a)=2/3 exactly."""
    from big_data_analysis_spark.operators.timeseries import markov_transitions

    rows = [
        (1, 1, "a"), (1, 2, "b"), (1, 3, "a"), (1, 4, "b"),
        (2, 1, "a"), (2, 2, "c"),
    ]
    df = spark.createDataFrame(rows, "user_id int, ts int, event_type string")
    got = {
        (r["from_state"], r["to_state"]): (r["n_transitions"], r["p"])
        for r in markov_transitions(df, "user_id", "ts", "event_type").collect()
    }
    assert got[("a", "b")] == (2, 2 / 3)
    assert got[("a", "c")] == (1, 1 / 3)
    assert got[("b", "a")] == (1, 1.0)
    assert ("c", "a") not in got  # chain ends don't transition across users


def test_triangle_counts_canonicalization_and_known_graph(spark):
    """K4 minus one edge = 2 triangles; duplicated / reversed / self
    edges must not change the answer. Shared edge's endpoints sit in
    both triangles."""
    from big_data_analysis_spark.operators.graph import triangle_counts

    edges = [(1, 2), (2, 1), (1, 3), (2, 3), (2, 4), (3, 4), (3, 2), (4, 4)]
    df = spark.createDataFrame(edges, "src int, dst int")
    got = {r["node"]: r["n_triangles"] for r in triangle_counts(df).collect()}
    # triangles: (1,2,3) and (2,3,4); edge 2-3 shared
    assert got == {1: 1, 2: 2, 3: 2, 4: 1}


def test_internal_materializations_release_across_repeated_calls(spark):
    """VERDICT r6 #4: operators that materialize internals and return a
    frame referencing them must not accumulate cached blocks on a
    long-lived driver. With the old persist() discipline each
    triangle_counts call pinned 2 RDDs forever (the callee cannot
    unpersist what the result still references); with localCheckpoint
    the ContextCleaner reaps the blocks once the result is dropped —
    so N repeated call+drop cycles end at the baseline count."""
    import gc
    import time

    from big_data_analysis_spark.operators.graph import triangle_counts

    sc = spark.sparkContext
    jsc = sc._jsc.sc()

    def n_persistent() -> int:
        return jsc.getPersistentRDDs().size()

    def settle(target: int, tries: int = 60) -> int:
        """GC + let the ContextCleaner drain its reference queue."""
        for _ in range(tries):
            gc.collect()
            sc._jvm.System.gc()
            if n_persistent() <= target:
                break
            time.sleep(0.5)
        return n_persistent()

    edges = [(1, 2), (2, 1), (1, 3), (2, 3), (2, 4), (3, 4), (3, 2), (4, 4)]
    df = spark.createDataFrame(edges, "src int, dst int")
    baseline = settle(0)
    for _ in range(3):
        out = triangle_counts(df)
        assert out.count() == 4
        del out
    assert settle(baseline) <= baseline


def test_k_core_cascades_past_one_round(spark):
    """4-clique + 4-path, k=2: the clique survives (within-core degree
    3 each); the path EMPTIES — its middle nodes have raw degree 2, so
    a one-shot degree filter would wrongly keep them, and only the
    cascade (ends peel -> middles drop below k) removes them. Reversed,
    duplicated and self edges must not change the answer."""
    from big_data_analysis_spark.operators.graph import k_core

    clique = [(a, b) for a in (1, 2, 3, 4) for b in (1, 2, 3, 4) if a < b]
    path = [(5, 6), (6, 7), (7, 8)]
    noise = [(2, 1), (3, 3), (6, 5)]
    df = spark.createDataFrame(clique + path + noise, "src int, dst int")
    got = {r["node"]: r["core_degree"] for r in k_core(df, k=2).collect()}
    assert got == {1: 3, 2: 3, 3: 3, 4: 3}


def test_k_core_empty_core_and_guards(spark):
    """A bare path has an empty 2-core (schema intact, zero rows);
    k < 1 rejects; a run that cannot reach fixpoint within max_iter
    raises instead of returning a non-core."""
    import pytest as _pt

    from big_data_analysis_spark.operators.graph import k_core

    path = spark.createDataFrame(
        [(5, 6), (6, 7), (7, 8)], "src int, dst int"
    )
    out = k_core(path, k=2)
    assert out.columns == ["node", "core_degree"] and out.count() == 0
    with _pt.raises(ValueError):
        k_core(path, k=0)
    with _pt.raises(RuntimeError, match="converge"):
        k_core(path, k=2, max_iter=1)


def test_mad_outliers_resist_masking(spark):
    """A 1000x spike is flagged by MAD but masks itself from the
    z-score rule: one spike among n rows can reach at most
    z = (n-1)/sqrt(n) ~ 2.67 here, so it stays under z=2.8 while its
    robust z is in the thousands."""
    from big_data_analysis_spark.operators.relational import (
        mad_outliers,
        zscore_outliers,
    )

    vals = [10.0, 11.0, 9.0, 10.5, 9.5, 10.0, 11.0, 9.0, 10000.0]
    df = spark.createDataFrame(
        [("g", v) for v in vals], "grp string, value double"
    )
    mad_hits = mad_outliers(df, "value", ["grp"], k=3.5).collect()
    assert [r["value"] for r in mad_hits] == [10000.0]
    z_hits = zscore_outliers(df, "value", ["grp"], z=2.8).collect()
    assert z_hits == []  # masked: the spike owns the stddev


def test_winsorize_preserves_rows_and_clips(spark):
    """Row count unchanged; min/max of the output equal the group's
    p01/p99; interior values untouched."""
    from big_data_analysis_spark.operators.relational import winsorize

    vals = [float(x) for x in range(1, 101)]
    df = spark.createDataFrame([("g", v) for v in vals], "grp string, value double")
    out = winsorize(df, "value", ["grp"], 0.05, 0.95)
    rows = out.collect()
    assert len(rows) == 100
    ws = [r["value_w"] for r in rows]
    # percentile(0.05) of 1..100 = 5.95, percentile(0.95) = 95.05
    assert min(ws) == 5.95 and max(ws) == 95.05
    interior = [r for r in rows if 6 <= r["value"] <= 95]
    assert all(r["value_w"] == r["value"] for r in interior)


def test_driver_window_covers_critical_queries():
    """The external driver verifies only the first 50 registry entries
    (insertion order). Guard: every query that must receive a driver
    correctness row this round sits inside that window, and the window
    is packed with oracle-backed entries before rows-only ones."""
    from big_data_analysis_spark.queries import ORACLES, QUERIES

    window = list(QUERIES)[:50]
    critical = {
        # (a) round-12 additions — never driver-verified:
        # streaming_media_refresh (the r11 post-horizon registration
        # VERDICT r11 ordered to lead) plus the mixed-modality recall
        # certificate (new module media_recall.py). Category (b): the
        # 5 r11 greens restaled by the ADVICE-r11 fixes in video.py /
        # media_cascade.py — the mechanical audit
        # (test_driver_window_rotates_transitively_stale_queries)
        # verifies those are in-window and pins the 24-query backlog
        # drain (to ZERO) plus the 19 r8 re-verification fills.
        "streaming_media_refresh", "media_recall_docs",
        "media_cascade_increment_docs", "streaming_video_refresh",
        "video_dedup_incremental", "video_near_dup_pairs",
        "video_takedown_roundtrip",
    }
    missing = critical - set(window)
    assert not missing, f"critical queries outside driver window: {missing}"
    # no oracle-backed query may sit past the horizon while a rows-only
    # one occupies a window slot it could use
    rows_only_in_window = [n for n in window if n not in ORACLES]
    oracle_past_horizon = [
        n for n in list(QUERIES)[50:]
        if n in ORACLES and n not in _DRIVER_VERIFIED_PAST_ROUNDS
    ]
    assert not (rows_only_in_window and oracle_past_horizon), (
        f"rows-only {rows_only_in_window[:3]} hold window slots while "
        f"never-verified oracle queries {oracle_past_horizon[:3]} wait outside"
    )


# Queries with a green row in CORRECTNESS_r01/r02.json — allowed past the
# horizon because the driver has already hard-verified them.
_DRIVER_VERIFIED_PAST_ROUNDS = {
    "trend_rules", "pricing_summary", "dedup_keep_last", "top_customers",
    "customers_without_orders", "pivot_returnflag", "rollup_qty",
    "describe_lineitem", "value_counts_events", "null_handling",
    "json_extract_agg", "string_funcs_part", "set_ops_customers",
    "window_lag_features", "sessionize_events", "tumbling_daily_events",
    "top3_orders_per_customer", "word_freq_docs", "token_stats_docs",
    "dedup_exact_docs", "jaccard_pairs_docs", "cosine_topk",
    "rank_orders_by_nation", "frequent_items_trend", "fpgrowth_rules_pairs",
    "suppliers_with_shipments", "cube_orders", "order_date_arithmetic",
    "corr_lineitem", "lang_id_docs", "quality_docs", "llm_corpus_pipeline",
    "contamination_pairs_docs", "repetition_docs", "pii_redaction_docs",
    "dedup_groups_docs", "bpe_token_counts", "embedding_near_dup_pairs",
    "streaming_tumbling_daily", "sliding_window_events",
    "session_window_events", "tfidf_top_terms_docs",
    "centroid_assignment_embeddings", "corr_matrix_lineitem",
    "qcut_price_deciles", "iqr_filter_price", "span_dedup_docs",
    "hash_sample_docs", "asof_purchase_view", "click_attribution_window",
    # round-3 window (CORRECTNESS_r03.json: 50/50 full hash-match)
    "streaming_attribution_join", "stateful_running_totals",
    "streaming_dedup_count", "confusion_matrix_rule",
    "per_class_report_rule", "ols_metrics", "audio_decode_wav",
    "knn_blas_batch", "upsert_orders", "scd2_user_event_history",
    "distribution_ranks_orders", "novelty_docs", "streaming_enriched_daily",
    "variant_props_stats", "pack_sequences_docs", "weighted_sample_docs",
    "embedding_dedup_groups", "balanced_sample_docs", "shipping_priority",
    "local_supplier_volume", "returned_items", "dq_audit",
    "histogram_retailprice", "ewma_daily_orders", "synthdocs_scan",
    "gap_fill_daily_revenue", "snapshot_diff_orders", "mixture_sample_events",
    "streaming_distinct_users", "fuzzy_name_pairs", "range_window_spend",
    "melt_part_metrics", "pagerank_trade_graph", "rolling_median_revenue",
    "grouped_ols_nation_trend", "cohort_retention_orders",
    "zscore_outlier_events", "funnel_events", "markov_event_transitions",
    "triangle_copurchase", "mad_outlier_events", "winsorize_prices",
    "calibration_orders", "gains_orders", "chi2_orders",
    "entropy_gain_events", "lm_perplexity_docs", "promo_revenue_monthly",
    "volume_customers", "small_qty_order_revenue",
    # round-4 window (CORRECTNESS_r04.json: 45/45 full hash-match)
    "discounted_revenue_brands", "sales_opportunity", "auc_orders",
    "yoy_revenue_growth", "new_vs_returning_users",
    "seasonal_decompose_daily_events", "forecast_revenue_delta",
    "volume_shipping_pairs", "market_share_region",
    "product_profit_nation_year", "customer_order_distribution",
    "top_supplier_quarter", "late_order_priority",
    "shipping_lateness_buckets", "rolling_corr_nation_monthly",
    "robust_scale_prices", "golden_predictions", "qcut_price_deciles",
    "bm25_search_docs", "psi_drift_events", "jsd_event_type_shift",
    "sole_late_shipper", "chunk_docs_overlap", "source_quality_gate",
    "bfs_hops_trade", "holt_forecast_monthly_orders", "hybrid_search_rrf",
    "streaming_psi_daily", "seasonal_residual_anomalies",
    "audio_spectral_peak_bands", "bloom_join_orders", "min_cost_supplier",
    "important_part_value", "supplier_count_by_part_attrs",
    "heavy_small_part_shippers", "video_frame_sample",
    # round-5 window (CORRECTNESS_r05.json: 48/48 full hash-match)
    "ivfpq_ann_topk", "skew_salted_revenue", "dedup_keep_best_docs",
    "semantic_dedup_pairs_docs", "pq_ann_topk", "bloom_decontaminate_docs",
    "sketch_profile_events", "lsh_ann_topk", "ivf_ann_topk",
    "kmeans_embeddings", "real_bpe_token_counts",
    # round-6 window (CORRECTNESS_r06.json: 50/50 full hash-match)
    "acf_monthly_revenue", "als_recommend_brands", "communities_copurchase",
    "cusum_changepoint_events", "dq_constraints_orders",
    "dsir_selection_docs", "embedding_outliers_topk",
    "entity_resolution_customers", "filtered_ann_topk",
    "heavy_hitter_tokens", "incremental_distinct_orders",
    "incremental_quantile_orders", "ivfpq_incremental_append",
    "ivfpq_persisted_ann_topk", "ivfpq_tombstone_delete",
    "k_anonymity_customers", "kcore_copurchase", "loo_target_encode_orders",
    "minhash_pairs", "quantile_state_read_orders", "simhash_pairs",
    "sssp_trade_latency", "stream_sink_manifest_docs",
    "synthdocs_stream_scan", "token_budget_mixture_docs",
    "training_shards_docs", "welch_ab_events", "xml_roundtrip_docs",
    "zipf_corpus_fit_docs",
    # round-7 window (CORRECTNESS_r07.json: 50/50 full hash-match)
    "weighted_quantiles_lineitem", "ks_drift_events",
    "theil_sen_monthly_orders", "benford_order_amounts",
    "gini_customer_revenue", "rfm_segments_customers",
    "minhash_incremental_docs", "streaming_corpus_refresh",
    "exact_dedup_incremental_docs", "simhash_incremental_docs",
    # round-8 window (CORRECTNESS_r08.json: 50/50 full hash-match)
    "auc_orders", "audio_spectral_peak_bands", "bfs_hops_trade",
    "bloom_decontaminate_docs", "bm25_search_docs",
    "centroid_assignment_embeddings", "chi2_orders", "chunk_docs_overlap",
    "contamination_pairs_docs", "corr_lineitem", "cosine_topk", "cube_orders",
    "dedup_keep_last", "dedup_takedown_roundtrip_docs", "describe_lineitem",
    "embedding_near_dup_pairs", "entropy_gain_events",
    "exact_dedup_incremental_docs", "golden_predictions", "hash_sample_docs",
    "heavy_hitter_tokens", "hybrid_search_rrf", "ivfpq_incremental_append",
    "ivfpq_persisted_ann_topk", "ivfpq_tombstone_delete",
    "jaccard_pairs_docs", "jsd_event_type_shift", "knn_blas_batch",
    "llm_corpus_pipeline", "minhash_incremental_docs", "minhash_pairs",
    "novelty_docs", "qcut_price_deciles", "rolling_corr_nation_monthly",
    "rollup_qty", "seasonal_decompose_daily_events",
    "semantic_dedup_incremental_embeddings", "simhash_incremental_docs",
    "simhash_pairs", "sliding_window_events", "source_quality_gate",
    "span_dedup_docs", "streaming_corpus_refresh", "streaming_tumbling_daily",
    "string_funcs_part", "tfidf_top_terms_docs", "trend_rules",
    "tumbling_daily_events", "upsert_orders", "word_freq_docs",
    # round-9 window (CORRECTNESS_r09.json: 50/50 full hash-match)
    "contamination_overlap_docs", "leakage_safe_split_docs",
    "leakage_split_incremental_docs", "leakage_split_stability_docs",
    "leakage_split_pairs_docs", "image_near_dup_pairs",
    "audio_spectral_peak_bands", "bloom_decontaminate_docs",
    "bm25_search_docs", "centroid_assignment_embeddings",
    "contamination_pairs_docs", "cosine_topk",
    "dedup_takedown_roundtrip_docs", "embedding_near_dup_pairs",
    "exact_dedup_incremental_docs", "heavy_hitter_tokens",
    "hybrid_search_rrf", "ivfpq_incremental_append",
    "ivfpq_persisted_ann_topk", "ivfpq_tombstone_delete",
    "jaccard_pairs_docs", "knn_blas_batch", "llm_corpus_pipeline",
    "minhash_incremental_docs", "minhash_pairs", "novelty_docs",
    "semantic_dedup_incremental_embeddings", "simhash_incremental_docs",
    "simhash_pairs", "span_dedup_docs", "streaming_corpus_refresh",
    "customer_order_distribution", "discounted_revenue_brands",
    "heavy_small_part_shippers", "late_order_priority",
    "market_share_region", "new_vs_returning_users", "pricing_summary",
    "product_profit_nation_year", "robust_scale_prices",
    "sales_opportunity", "seasonal_residual_anomalies",
    "sessionize_events", "shipping_lateness_buckets",
    "top3_orders_per_customer", "top_customers", "top_supplier_quarter",
    "video_frame_sample", "volume_shipping_pairs", "yoy_revenue_growth",
    # round-10 window (CORRECTNESS_r10.json: 50/50 full hash-match)
    "containment_pairs_docs", "containment_incremental_docs",
    "dedup_tier_yield_docs", "media_containment_takedown",
    "multimodal_corpus_pipeline", "split_takedown_roundtrip_docs",
    "image_dedup_incremental", "streaming_image_refresh",
    "streaming_semantic_refresh", "streaming_containment_refresh",
    "audio_near_dup_pairs", "audio_dedup_incremental",
    "streaming_audio_refresh", "cascade_dedup_increment_docs",
    "audio_spectral_peak_bands", "bloom_decontaminate_docs",
    "bm25_search_docs", "centroid_assignment_embeddings",
    "contamination_overlap_docs", "contamination_pairs_docs",
    "cosine_topk", "dedup_takedown_roundtrip_docs",
    "embedding_near_dup_pairs", "exact_dedup_incremental_docs",
    "heavy_hitter_tokens", "hybrid_search_rrf", "image_near_dup_pairs",
    "ivfpq_incremental_append", "ivfpq_persisted_ann_topk",
    "ivfpq_tombstone_delete", "jaccard_pairs_docs", "knn_blas_batch",
    "leakage_safe_split_docs", "leakage_split_incremental_docs",
    "leakage_split_pairs_docs", "leakage_split_stability_docs",
    "llm_corpus_pipeline", "minhash_incremental_docs", "minhash_pairs",
    "novelty_docs", "semantic_dedup_incremental_embeddings",
    "simhash_incremental_docs", "simhash_pairs", "span_dedup_docs",
    "streaming_corpus_refresh", "video_frame_sample",
    "forecast_revenue_delta", "important_part_value",
    "min_cost_supplier", "sole_late_shipper",
    # round-11 window (CORRECTNESS_r11.json: 50/50 full hash-match)
    "acf_monthly_revenue", "asof_purchase_view", "calibration_orders",
    "cascade_recall_docs", "click_attribution_window",
    "cohort_retention_orders", "corr_matrix_lineitem",
    "distribution_ranks_orders", "dq_audit", "ewma_daily_orders",
    "funnel_events", "fuzzy_name_pairs", "gains_orders",
    "gap_fill_daily_revenue", "histogram_retailprice",
    "holt_forecast_monthly_orders", "iqr_filter_price",
    "kmeans_embeddings", "local_supplier_volume", "lsh_ann_topk",
    "mad_outlier_events", "markov_event_transitions",
    "media_cascade_increment_docs", "melt_part_metrics",
    "pack_sequences_docs", "pii_redaction_docs",
    "promo_revenue_monthly", "psi_drift_events",
    "rank_orders_by_nation", "real_bpe_token_counts", "returned_items",
    "rolling_median_revenue", "scd2_user_event_history",
    "shipping_priority", "sketch_profile_events", "skew_salted_revenue",
    "small_qty_order_revenue", "snapshot_diff_orders",
    "streaming_cascade_refresh", "streaming_psi_daily",
    "streaming_video_refresh", "supplier_count_by_part_attrs",
    "synthdocs_scan", "variant_props_stats", "video_dedup_incremental",
    "video_near_dup_pairs", "video_takedown_roundtrip",
    "volume_customers", "winsorize_prices", "zscore_outlier_events",
}


def test_driver_window_rotates_transitively_stale_queries():
    """VERDICT r7 #3: a query whose TRANSITIVE operator modules changed
    since its last externally-green round must re-enter the driver
    window — rotation can no longer miss a helper edit that silently
    affects queries verified rounds ago. Mechanics in
    tests/window_audit.py; this test pins three invariants:

    1. every query green LAST round whose modules changed THIS round is
       in the window (mandatory re-verification of fresh code churn);
    2. while stale queries wait outside, no window slot is spent on a
       non-stale, already-verified query (never-verified additions
       excepted);
    3. stalest-first: no stale query outside the window has an OLDER
       last-green round than any rotation-slot stale query inside.

    If this test fails at the START of a round, that is the mechanism
    working: rewrite _DRIVER_PRIORITY per the failure, update the
    critical set above, append the prior round's greens to
    _DRIVER_VERIFIED_PAST_ROUNDS, and bump window_audit.AUDIT_ROUND."""
    from big_data_analysis_spark.queries import QUERIES

    from tests.window_audit import (
        AUDIT_ROUND,
        last_green_rounds,
        round_commit,
        stale_queries,
    )

    if round_commit(1) is None:
        pytest.skip("no 'round N:' boundary commits in git history")
    window = list(QUERIES)[:50]
    in_window = set(window)
    stale = stale_queries(AUDIT_ROUND - 1)

    # (1) modules changed since the last boundary -> mandatory
    recent = {q for q, n in stale.items() if n == AUDIT_ROUND - 1}
    missing = recent - in_window
    assert not missing, (
        f"queries green in round {AUDIT_ROUND - 1} whose modules changed "
        f"this round are outside the window: {sorted(missing)}"
    )

    # (2) no wasted slots while stale queries wait
    ever_green = last_green_rounds(AUDIT_ROUND - 1)
    additions = [q for q in window if q not in ever_green]
    wasted = [q for q in window if q in ever_green and q not in stale]
    outside_stale = {q: n for q, n in stale.items() if q not in in_window}
    assert not (wasted and outside_stale), (
        f"non-stale verified queries {wasted[:5]} hold window slots while "
        f"stale queries wait outside: {sorted(outside_stale)[:5]}"
    )

    # (3) stalest first (round granularity; ties broken freely)
    rotation = {q: n for q, n in stale.items()
                if q in in_window and n != AUDIT_ROUND - 1}
    if outside_stale and rotation:
        assert min(outside_stale.values()) >= max(rotation.values()), (
            "a stale query outside the window is staler than a rotation "
            f"pick inside: outside="
            f"{sorted(outside_stale.items(), key=lambda kv: kv[1])[:5]} "
            f"inside_max={max(rotation.values())}"
        )
    # sanity: the additions really are registered queries
    assert all(q in QUERIES for q in additions)


def test_ngram_lm_scores_rank_fluent_above_garbage(spark):
    """The perplexity filter's defining property: text made of common
    bigrams scores lower cross-entropy than token soup, when both are
    scored against an LM trained on the fluent corpus."""
    from big_data_analysis_spark.operators.text import ngram_lm_scores

    fluent = [(i, "the cat sat on the mat and the dog sat on the rug") for i in range(20)]
    train = spark.createDataFrame(fluent, "doc_id int, text string")
    score = spark.createDataFrame(
        [(100, "the cat sat on the mat"), (101, "zxq flurp mat wibble cat qqzt")],
        "doc_id int, text string",
    )
    out = {r["doc_id"]: r for r in ngram_lm_scores(train, score, "text", "doc_id").collect()}
    assert out[100]["cross_entropy"] < out[101]["cross_entropy"] - 2.0
    assert out[100]["perplexity"] < out[101]["perplexity"]
    # n_bigrams = tokens - 1
    assert out[100]["n_bigrams"] == 5


def test_seasonal_decompose_recovers_components(spark):
    """Additive signal trend(t)=0.5t, seasonal=[5,-2,-3] (period 3,
    zero-sum): the decomposition must recover both to float precision
    away from the edges, residual ~ 0, and edge rows (no full MA
    window) must have null trend/residual — statsmodels semantics."""
    from big_data_analysis_spark.operators.timeseries import seasonal_decompose

    season = [5.0, -2.0, -3.0]
    rows = [(t, 0.5 * t + season[t % 3]) for t in range(30)]
    df = spark.createDataFrame(rows, "t int, y double")
    out = {r["t"]: r for r in seasonal_decompose(df, "t", "y", 3).collect()}
    assert out[0]["trend"] is None and out[0]["residual"] is None
    assert out[29]["trend"] is None
    for t in range(1, 29):
        # centered MA of a linear trend is exact; seasonal sums to zero
        assert abs(out[t]["trend"] - 0.5 * t) < 1e-9, (t, out[t])
        assert abs(out[t]["seasonal"] - season[t % 3]) < 1e-9
        assert abs(out[t]["residual"]) < 1e-9


def test_seasonal_decompose_even_period_and_groups(spark):
    """period=4 uses the 2xMA centered window; per-group decomposition
    keeps series independent."""
    from big_data_analysis_spark.operators.timeseries import seasonal_decompose

    season = [2.0, 0.0, -1.0, -1.0]
    rows = [("a", t, 1.0 * t + season[t % 4]) for t in range(24)] + [
        ("b", t, -2.0 * t + season[t % 4]) for t in range(24)
    ]
    df = spark.createDataFrame(rows, "g string, t int, y double")
    out = {
        (r["g"], r["t"]): r
        for r in seasonal_decompose(df, "t", "y", 4, partition_by=["g"]).collect()
    }
    for g, slope in (("a", 1.0), ("b", -2.0)):
        for t in range(3, 21):
            assert abs(out[(g, t)]["trend"] - slope * t) < 1e-9, (g, t, out[(g, t)])
            assert abs(out[(g, t)]["residual"]) < 1e-9


def test_normalize_text_nfkc_control_and_idempotence(spark):
    """NFKC folds fullwidth/compat forms (the dedup-hash agreement
    step), control chars vanish (newlines survive), tab/space runs
    collapse to one space, and the op is idempotent."""
    from big_data_analysis_spark.operators.text import normalize_text

    rows = [
        (1, "Ｈｅｌｌｏ　ｗｏｒｌｄ"),          # fullwidth + ideographic space
        (2, "café vs café"),       # NFC-vs-NFD é
        (3, "a\x00b\x07c  d\te\nf"),          # control chars + runs
        (4, "①②③ ﬁne"),                      # compat digits + ligature
    ]
    df = spark.createDataFrame(rows, "id int, text string")
    once = normalize_text(df, "text")
    got = {r["id"]: r["text"] for r in once.collect()}
    assert got[1] == "Hello world"
    assert "é" in got[2] and "́" not in got[2]  # composed either side
    assert got[3] == "abc d e\nf"
    assert got[4] == "123 fine"
    twice = {r["id"]: r["text"] for r in normalize_text(once, "text").collect()}
    assert twice == got


def test_chunk_text_reassembles_and_overlaps(spark):
    """Chunking invariants: stride==size chunks concatenate back to the
    original text; stride<size chunks each start with the tail of the
    previous one (the overlap); offsets/ordinals are exact."""
    from big_data_analysis_spark.operators.text import chunk_text

    rows = [(1, "abcdefghijklmnopqrstuvwxyz"), (2, "xy"), (3, ""), (4, None)]
    df = spark.createDataFrame(rows, "doc_id int, text string")

    flat = chunk_text(df, "text", size=7, stride=7, keep_cols=("doc_id",))
    got = {
        doc: "".join(
            r["chunk"] for r in sorted(rws, key=lambda r: r["chunk_idx"])
        )
        for doc, rws in _group(flat.collect(), "doc_id").items()
    }
    assert got == {1: rows[0][1], 2: "xy"}  # empty/null docs emit nothing

    with pytest.raises(ValueError, match="stride"):
        chunk_text(df, "text", size=10, stride=20)  # gaps would drop text

    over = chunk_text(df, "text", size=10, stride=5, keep_cols=("doc_id",))
    chunks = sorted(
        (r["chunk_idx"], r["start"], r["chunk"])
        for r in over.filter(F.col("doc_id") == 1).collect()
    )
    for (i1, s1, c1), (i2, s2, c2) in zip(chunks, chunks[1:]):
        assert i2 == i1 + 1 and s2 == s1 + 5
        assert c1[5:] == c2[: len(c1) - 5]  # 5-char overlap agrees


def _group(rows, key):
    out: dict = {}
    for r in rows:
        out.setdefault(r[key], []).append(r)
    return out


def test_bm25_ranks_term_dense_docs_first(spark):
    """BM25 sanity: a doc saturated with the query terms outranks a doc
    with one hit; docs without any hit never appear; a corpus-ubiquitous
    term contributes less than a rare one (idf)."""
    from big_data_analysis_spark.operators.text import bm25_search

    docs = [
        (1, "spark spark spark join hash"),
        (2, "spark appears once here with filler words and more filler"),
        (3, "nothing relevant at all in this one"),
        (4, "common common common common"),  # 'common' also in every doc below
        (5, "common text a"), (6, "common text b"), (7, "common text c"),
    ]
    df = spark.createDataFrame(docs, "doc_id int, text string")
    out = bm25_search(df, "doc_id", "text", ("spark", "join"), top_k=10).collect()
    ids = [r["doc_id"] for r in out]
    assert ids[0] == 1 and 2 in ids
    assert 3 not in ids and 4 not in ids
    scores = {r["doc_id"]: r["bm25"] for r in out}
    assert scores[1] > scores[2]
    # rare term ('spark', df=2) beats ubiquitous term ('common', df=4)
    rare = bm25_search(df, "doc_id", "text", ("spark",), top_k=1).head()["bm25"]
    common = bm25_search(df, "doc_id", "text", ("common",), top_k=1).head()["bm25"]
    assert rare > common


def test_bfs_distances_known_graph(spark):
    """BFS on a path-with-branch graph: exact hop counts, min-dist wins
    on multi-path nodes, hop cap honored, unreachable nodes absent."""
    from big_data_analysis_spark.operators.graph import bfs_distances

    #  0 -> 1 -> 2 -> 3 -> 4 ;  0 -> 5 -> 3 (shortcut);  9 isolated from 0
    edges = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 3), (3, 4), (0, 5), (5, 3), (8, 9)],
        "src int, dst int",
    )
    srcs = spark.createDataFrame([(0,)], "node int")
    d = {r["node"]: r["dist"] for r in bfs_distances(edges, srcs, 10).collect()}
    assert d == {0: 0, 1: 1, 5: 1, 2: 2, 3: 2, 4: 3}
    capped = {r["node"]: r["dist"] for r in bfs_distances(edges, srcs, 1).collect()}
    assert capped == {0: 0, 1: 1, 5: 1}


def test_holt_linear_tracks_linear_series_exactly(spark):
    """On y = 3 + 2t the Holt recurrence is exact: level == y,
    trend == slope, forecast_h == y + h*slope — per series key."""
    from big_data_analysis_spark.operators.timeseries import holt_linear

    rows = [(g, t, 3.0 + 2.0 * t + g) for g in (0, 1) for t in range(12)]
    df = spark.createDataFrame(rows, "g int, t int, y double")
    out = holt_linear(
        df, order_by=["t"], value_col="y", partition_by=["g"], horizon=4
    ).collect()
    for r in out:
        assert r["level"] == 3.0 + 2.0 * r["t"] + r["g"]
        assert r["trend"] == 2.0
        assert r["forecast_4"] == r["level"] + 8.0
    import pytest

    with pytest.raises(ValueError):
        holt_linear(df, order_by=["t"], value_col="y", partition_by=[])
    # output-name collisions must fail loudly, not produce a
    # duplicate-field schema that dies opaquely inside applyInPandas
    with pytest.raises(ValueError, match="already exist"):
        holt_linear(
            df.withColumn("level", F.lit(1.0)),
            order_by=["t"], value_col="y", partition_by=["g"],
        )


def test_write_training_shards_deterministic_and_guarded(spark, request):
    """The shard export must be a pure function of (keys, seed): the
    same corpus written from two DIFFERENT input partitionings yields
    byte-identical shard populations in byte-identical row order
    (verified via parquet row_index), with exactly one file per shard.
    Reserved-column and bad-n_shards inputs fail loudly."""
    import glob
    import os
    import shutil

    import pytest as _pt

    from big_data_analysis_spark.io import write_training_shards

    df = spark.createDataFrame(
        [(i, f"doc-{i}") for i in range(200)], "id long, body string"
    )
    paths = [
        f"/root/repo/.scratch/shards-{os.getpid()}-a",
        f"/root/repo/.scratch/shards-{os.getpid()}-b",
    ]
    for p in paths:
        shutil.rmtree(p, ignore_errors=True)
        request.addfinalizer(lambda p=p: shutil.rmtree(p, ignore_errors=True))
    write_training_shards(df.repartition(13), paths[0], 4, ["id"], seed="s")
    write_training_shards(df.coalesce(1), paths[1], 4, ["id"], seed="s")

    def layout(p):
        assert len(glob.glob(p + "/shard=*")) == 4
        for d in glob.glob(p + "/shard=*"):
            assert len(glob.glob(d + "/*.parquet")) == 1
        back = spark.read.parquet(p).select(
            "id", "shard", F.col("_metadata.row_index").alias("ri")
        )
        return sorted(
            (r["shard"], r["ri"], r["id"]) for r in back.collect()
        )

    assert layout(paths[0]) == layout(paths[1])
    with _pt.raises(ValueError, match="n_shards"):
        write_training_shards(df, paths[0] + "-x", 0, ["id"])
    with _pt.raises(ValueError, match="shard"):
        write_training_shards(
            df.withColumn("shard", F.lit(1)), paths[0] + "-y", 2, ["id"]
        )


def test_scale_md_lists_every_partition_by_operator():
    """SCALE.md is the 100 TB configuration index (VERDICT r4 #8):
    every PUBLIC operator that accepts partition_by — the lever that
    keeps a window/recurrence off the Exchange SinglePartition path —
    must be named there, so a reviewer scaling 100x finds the knob
    without reading every docstring."""
    import ast
    import os

    root = os.path.join(os.path.dirname(__file__), "..")
    with open(os.path.join(root, "SCALE.md")) as fh:
        scale_md = fh.read()
    missing = []
    pkg = os.path.join(root, "big_data_analysis_spark")
    for dirpath, _, files in os.walk(pkg):
        for f in files:
            if not f.endswith(".py"):
                continue
            path = os.path.join(dirpath, f)
            with open(path) as fh:
                tree = ast.parse(fh.read())
            for node in ast.walk(tree):
                if isinstance(node, ast.FunctionDef) and not node.name.startswith("_"):
                    args = [a.arg for a in node.args.args + node.args.kwonlyargs]
                    if "partition_by" in args and node.name not in scale_md:
                        missing.append(f"{f}:{node.lineno} {node.name}")
    assert not missing, f"partition_by operators absent from SCALE.md: {missing}"


def test_bin_by_edges_null_propagates(spark):
    """NULL input -> NULL bin (never silently the top bin)."""
    from big_data_analysis_spark.operators.dq import bin_by_edges

    df = spark.createDataFrame(
        [(0.5,), (1.5,), (None,), (99.0,)], "v double"
    )
    rows = df.select(bin_by_edges(F.col("v"), [1.0, 2.0]).alias("bin")).collect()
    assert [r["bin"] for r in rows] == [0, 1, None, 2]


def test_cusum_changepoint_locates_mean_shift(spark):
    """Clean level shift -> peak at the last pre-shift index; constant
    series -> earliest-index tie; last-row peak -> null mean_after."""
    from big_data_analysis_spark.operators.timeseries import cusum_changepoint

    rows = [("a", i, 10 if i < 5 else 20) for i in range(10)]
    rows += [("b", i, 7) for i in range(6)]
    df = spark.createDataFrame(rows, "k string, t int, v int")
    out = {
        r["k"]: r
        for r in cusum_changepoint(df, "t", "v", partition_by=["k"]).collect()
    }
    a = out["a"]
    assert a["cp_index"] == 5 and a["cp_order"] == 4
    assert a["mean_before"] == 10.0 and a["mean_after"] == 20.0
    # |S_5| = |50 - 5*15| = 25
    assert a["cusum_peak"] == 25.0
    b = out["b"]  # all nS == 0 -> tie -> earliest index
    assert b["cp_index"] == 1 and b["cusum_peak"] == 0.0
    assert b["mean_before"] == 7.0 and b["mean_after"] == 7.0

    one = spark.createDataFrame([("c", 0, 3)], "k string, t int, v int")
    r = cusum_changepoint(one, "t", "v", partition_by=["k"]).collect()[0]
    assert r["n_rows"] == 1 and r["mean_after"] is None


def test_cusum_changepoint_rejects_non_integral_values(spark):
    """The exact-argmax contract needs integer arithmetic: fractional,
    NaN, infinite and NULL values must raise up front — a silent
    long-cast would truncate 1.75 -> 1 and move the change point.
    Integral DOUBLES (e.g. 3.0) are fine: no information is lost."""
    import pytest
    from big_data_analysis_spark.operators.timeseries import cusum_changepoint

    for bad in [1.75, float("nan"), float("inf"), None, 1e19]:
        df = spark.createDataFrame(
            [("a", 0, 1.0), ("a", 1, bad)], "k string, t int, v double"
        )
        with pytest.raises(ValueError, match="non-integral|long range"):
            cusum_changepoint(df, "t", "v", partition_by=["k"])

    # a string column smuggling a non-numeric value must raise, not
    # silently drop the row from the prefix sums (double-cast NULL is
    # caught as "present but uncastable")
    sdf = spark.createDataFrame(
        [("a", 0, "10"), ("a", 1, "abc"), ("a", 2, "20")],
        "k string, t int, v string",
    )
    with pytest.raises(ValueError, match="non-numeric|non-integral"):
        cusum_changepoint(sdf, "t", "v", partition_by=["k"])

    ok = spark.createDataFrame(
        [("a", i, float(10 if i < 5 else 20)) for i in range(10)],
        "k string, t int, v double",
    )
    r = cusum_changepoint(ok, "t", "v", partition_by=["k"]).collect()[0]
    assert r["cp_index"] == 5 and r["cusum_peak"] == 25.0


def test_sssp_prefers_cheap_long_path_over_short_expensive(spark):
    """Weighted SSSP != BFS: a 3-edge cost-3 path beats the direct
    cost-10 edge; the hop bound cuts long paths; negative weights
    refuse; parallel edges collapse to min."""
    import pytest

    from big_data_analysis_spark.operators.graph import sssp

    edges = spark.createDataFrame(
        [
            (0, 9, 10), (0, 9, 12),          # parallel direct edges, cost 10
            (0, 1, 1), (1, 2, 1), (2, 9, 1), # 3-hop path, cost 3
            (9, 5, 2),
        ],
        "src int, dst int, w int",
    )
    srcs = spark.createDataFrame([(0,)], "node int")
    d = {r["node"]: r["dist"] for r in sssp(edges, srcs, max_hops=5).collect()}
    assert d == {0: 0, 1: 1, 2: 2, 9: 3, 5: 5}
    # with only 1 hop allowed the direct (min of the parallel pair) wins
    d1 = {r["node"]: r["dist"] for r in sssp(edges, srcs, max_hops=1).collect()}
    assert d1[9] == 10 and d1[1] == 1 and 2 not in d1
    neg = spark.createDataFrame([(0, 1, -2)], "src int, dst int, w int")
    with pytest.raises(ValueError, match="negative"):
        sssp(neg, srcs, max_hops=2)
    # fractional and fractional-negative weights must refuse too — a
    # silent cast would truncate 0.5 -> 0 / let -0.9 pass as 0
    for bad_w in (0.5, -0.9, float("nan"), None):
        bad = spark.createDataFrame(
            [(0, 1, bad_w)], "src int, dst int, w double"
        )
        with pytest.raises(ValueError, match="non-integral|negative"):
            sssp(bad, srcs, max_hops=2)


def test_zipf_fit_matches_numpy_ols(spark):
    """Exact parity with a hand-computed log-log OLS on a tiny corpus
    with known type frequencies (ties broken by word, as the rank
    contract specifies)."""
    import numpy as np

    docs = [
        (1, "a a a a b b c"),
        (2, "a a b d"),
    ]
    # freqs: a=6, b=3, c=1, d=1 -> ranks a:1 b:2 c:3 d:4 (tie c<d by word)
    df = spark.createDataFrame(docs, "doc_id long, text string")
    r = tx.zipf_fit(df, "text").head()
    assert r["n_types"] == 4
    assert r["n_tokens"] == 11
    x = np.log(np.array([1.0, 2.0, 3.0, 4.0]))
    y = np.log(np.array([6.0, 3.0, 1.0, 1.0]))
    slope = np.cov(x, y, bias=True)[0, 1] / np.var(x)
    corr = np.corrcoef(x, y)[0, 1]
    assert abs(r["zipf_alpha"] - round(-slope, 6)) < 1e-9
    assert abs(r["zipf_r2"] - round(corr**2, 6)) < 1e-9


def test_zipf_fit_min_count_prunes_tail(spark):
    df = spark.createDataFrame(
        [(1, "a a a b b c")], "doc_id long, text string"
    )
    r = tx.zipf_fit(df, "text", min_count=2).head()
    # c (hapax) pruned from the TYPE table; token count follows the
    # kept types
    assert r["n_types"] == 2
    assert r["n_tokens"] == 5


# ---------------------------------------------------------------------------
# dsir_importance_weights
# ---------------------------------------------------------------------------


def _py_dsir(docs, target_ids, n_buckets, alpha, seed="dsir1"):
    """Pure-Python re-derivation (hashlib md5) — proves the weights are
    engine-portable, not just Spark-reproducible."""
    import hashlib
    from collections import Counter

    def feats(text):
        toks = [t for t in text.split(" ") if t]
        return toks + [f"{a} {b}" for a, b in zip(toks, toks[1:])]

    def bucket(f):
        h = hashlib.md5((seed + "\x1f" + f).encode()).hexdigest()[:8]
        return int(h, 16) % n_buckets

    t_cnt, r_cnt = Counter(), Counter()
    for did, text in docs:
        for f in feats(text):
            b = bucket(f)
            r_cnt[b] += 1
            if did in target_ids:
                t_cnt[b] += 1
    T = sum(t_cnt.values()) + alpha * n_buckets
    R = sum(r_cnt.values()) + alpha * n_buckets
    import math

    out = {}
    for did, text in docs:
        s = 0.0
        for f in feats(text):
            b = bucket(f)
            s += math.log((t_cnt[b] + alpha) / T) - math.log((r_cnt[b] + alpha) / R)
        out[did] = round(s, 6)
    return out


def test_dsir_weights_match_pure_python(spark):
    docs = [
        (1, "the cat sat on the mat"),
        (2, "the dog sat on the rug"),
        (3, "stocks fell sharply in late trading"),
        (4, "cat and dog and cat"),
        (5, ""),
    ]
    df = spark.createDataFrame(
        [(i, t, i == 1) for i, t in docs], "doc_id long, text string, tgt boolean"
    )
    got = {
        r["doc_id"]: r["dsir_logw"]
        for r in tx.dsir_importance_weights(
            df, "doc_id", "text", "tgt", n_buckets=64, alpha=1.0
        ).collect()
    }
    want = _py_dsir(docs, {1}, 64, 1.0)
    assert got == want
    # empty document: no features, weight defined as 0.0
    assert got[5] == 0.0
    # shared-vocabulary candidate outranks the out-of-domain one
    assert got[2] > got[3]


def test_dsir_unigram_only_and_validation(spark):
    df = spark.createDataFrame(
        [(1, "a b", True), (2, "a c", False)], "doc_id long, text string, tgt boolean"
    )
    uni = tx.dsir_importance_weights(
        df, "doc_id", "text", "tgt", n_buckets=16, bigrams=False
    ).collect()
    assert len(uni) == 2 and all(r["dsir_logw"] is not None for r in uni)
    with pytest.raises(ValueError, match="n_buckets"):
        tx.dsir_importance_weights(df, "doc_id", "text", "tgt", n_buckets=0)
    with pytest.raises(ValueError, match="alpha"):
        tx.dsir_importance_weights(df, "doc_id", "text", "tgt", alpha=0.0)


# ---------------------------------------------------------------------------
# timeseries.acf
# ---------------------------------------------------------------------------


def test_acf_matches_numpy_estimator(spark):
    """r_l = sum((x_t - mean)(x_{t-l} - mean)) / sum((x_t - mean)^2),
    re-derived with numpy on a seeded AR-ish series."""
    import numpy as np

    rng = np.random.default_rng(11)
    x = np.cumsum(rng.normal(size=40))  # random walk: slow ACF decay
    rows = [("s", int(t), float(v)) for t, v in enumerate(x)]
    df = spark.createDataFrame(rows, "g string, t long, x double")
    from big_data_analysis_spark.operators import timeseries as tsm

    got = tsm.acf(df, "t", "x", 3, partition_by=["g"]).head()
    mu = x.mean()
    d = x - mu
    denom = float((d * d).sum())
    for lag in (1, 2, 3):
        want = round(float((d[lag:] * d[:-lag]).sum()) / denom, 6)
        assert abs(got[f"acf_{lag}"] - want) < 1e-9, lag
    assert got["n_obs"] == 40
    # random walk: strong positive persistence at lag 1
    assert got["acf_1"] > 0.7


def test_acf_edge_cases(spark):
    from big_data_analysis_spark.operators import timeseries as tsm

    # series shorter than the lag -> NULL at that lag, not a crash
    df = spark.createDataFrame(
        [("a", 0, 1.0), ("a", 1, 2.0)], "g string, t long, x double"
    )
    r = tsm.acf(df, "t", "x", 3, partition_by=["g"]).head()
    assert r["acf_1"] is not None and r["acf_3"] is None
    # zero-variance series -> NULL (0/0 via try_divide), never an error
    const = spark.createDataFrame(
        [("a", t, 5.0) for t in range(10)], "g string, t long, x double"
    )
    rc = tsm.acf(const, "t", "x", 2, partition_by=["g"]).head()
    assert rc["acf_1"] is None and rc["acf_2"] is None
    with pytest.raises(ValueError, match="max_lag"):
        tsm.acf(df, "t", "x", 0, partition_by=["g"])
    # multiple series stay independent: a constant series must not
    # poison a varying one
    both = df.unionByName(const.withColumn("g", F.lit("b")))
    rows = {r["g"]: r for r in tsm.acf(both, "t", "x", 1, partition_by=["g"]).collect()}
    assert rows["a"]["acf_1"] is not None and rows["b"]["acf_1"] is None


# ---------------------------------------------------------------------------
# timeseries.theil_sen_trend
# ---------------------------------------------------------------------------


def test_theil_sen_robust_to_outliers_and_exact_on_clean(spark):
    """A clean line recovers slope/intercept exactly; one gross outlier
    in 20 points must NOT move the estimate (the 29% breakdown point is
    the operator's whole reason to exist — OLS would chase the spike)."""
    rows = [("a", float(x), 2.0 * x + 1.0) for x in range(20)]
    rows[7] = ("a", 7.0, 1000.0)
    rows += [("b", float(x), -0.5 * x + 3.0) for x in range(10)]
    df = spark.createDataFrame(rows, "g string, x double, y double")
    got = {r["g"]: r for r in ts.theil_sen_trend(
        df, "x", "y", partition_by=["g"]).collect()}
    assert got["a"]["slope"] == 2.0 and got["a"]["intercept"] == 1.0
    assert got["a"]["n_obs"] == 20 and got["a"]["n_pairs"] == 190
    assert got["b"]["slope"] == -0.5 and got["b"]["intercept"] == 3.0


def test_theil_sen_matches_python_median_of_slopes(spark):
    import random
    import statistics

    rng = random.Random(5)
    pts = [(float(x), rng.uniform(-10, 10)) for x in range(30)]
    df = spark.createDataFrame([("s", x, y) for x, y in pts], "g string, x double, y double")
    got = ts.theil_sen_trend(df, "x", "y", partition_by=["g"]).head()
    slopes = [
        (y2 - y1) / (x2 - x1)
        for i, (x1, y1) in enumerate(pts)
        for (x2, y2) in pts[i + 1:]
        if x2 != x1
    ]
    want_slope = statistics.median(slopes)
    want_icept = statistics.median([y - want_slope * x for x, y in pts])
    assert abs(got["slope"] - round(want_slope, 6)) < 1e-9
    assert abs(got["intercept"] - round(want_icept, 6)) < 1e-9


def test_theil_sen_degenerate_series(spark):
    # a series with a single distinct x has no pair -> absent from output
    df = spark.createDataFrame(
        [("one", 1.0, 5.0), ("one", 1.0, 7.0), ("ok", 0.0, 0.0), ("ok", 1.0, 2.0)],
        "g string, x double, y double",
    )
    rows = {r["g"]: r for r in ts.theil_sen_trend(
        df, "x", "y", partition_by=["g"]).collect()}
    assert "one" not in rows
    assert rows["ok"]["slope"] == 2.0 and rows["ok"]["n_pairs"] == 1
    # the UNGROUPED degenerate case must also be absent, not a NULL row
    # (a global groupBy always emits a row — the operator filters it)
    single = spark.createDataFrame([(1.0, 5.0), (1.0, 7.0)], "x double, y double")
    assert ts.theil_sen_trend(single, "x", "y").count() == 0
    ok = spark.createDataFrame([(0.0, 1.0), (2.0, 5.0)], "x double, y double")
    g = ts.theil_sen_trend(ok, "x", "y").head()
    assert g["slope"] == 2.0 and g["intercept"] == 1.0
