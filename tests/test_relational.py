"""Unit battery for the relational/timeseries/text operator functions
not already pinned by an oracle query — the reference-semantics edge
cases live here (SURVEY.md §2.2-2.9)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from big_data_analysis_spark.io import load_tables, read_text_with_fallback
from big_data_analysis_spark.operators import relational as rel
from big_data_analysis_spark.operators import text as tx
from big_data_analysis_spark.operators import timeseries as ts


def test_select_excluding_and_map_values(spark):
    df = spark.createDataFrame([(1, "M", 9.0), (2, "B", 8.0)], ["id", "diag", "x"])
    assert rel.select_excluding(df, ["x"]).columns == ["id", "diag"]
    out = rel.map_values(df, "diag", {"M": 1, "B": 0}, out_col="label")
    assert {r["id"]: r["label"] for r in out.collect()} == {1: 1, 2: 0}
    # Unmapped values take the default, not an error.
    df2 = spark.createDataFrame([(3, "X", 1.0)], ["id", "diag", "x"])
    assert rel.map_values(df2, "diag", {"M": 1}, default=-1).head()["diag"] == -1


def test_normalize_blank_and_drop_null_columns(spark):
    df = spark.createDataFrame(
        [("a", " ", 1.0), ("b", "x", 2.0)], ["k", "dirty", "clean"]
    )
    norm = rel.normalize_blank_to_null(df, ["dirty"])
    assert norm.filter(F.col("dirty").isNull()).count() == 1
    kept = rel.drop_null_columns(norm)
    assert kept.columns == ["k", "clean"]
    counts = rel.null_counts(norm).head()
    assert counts["dirty"] == 1 and counts["clean"] == 0


def test_value_counts_normalized_and_conditional_rate(spark, sf_dir):
    li = load_tables(spark, sf_dir, ["lineitem"])["lineitem"]
    vc = rel.value_counts(li, "l_returnflag", normalize=True)
    rows = vc.collect()
    assert sum(r["proportion"] for r in rows) == pytest.approx(1.0)
    rate = rel.conditional_rate(li, F.col("l_quantity") > 25).head()["rate"]
    assert 0.0 < rate < 1.0


def test_describe_stats_matches_duckdb(spark, sf_dir):
    import duckdb
    import os

    li = load_tables(spark, sf_dir, ["lineitem"])["lineitem"]
    got = rel.describe_stats(li, ["l_quantity"]).head()
    con = duckdb.connect()
    exp = con.execute(
        f"""SELECT count(l_quantity), avg(l_quantity), stddev(l_quantity),
                   min(l_quantity), quantile_cont(l_quantity, 0.5), max(l_quantity)
            FROM read_parquet('{os.path.join(sf_dir, "lineitem.parquet")}')"""
    ).fetchone()
    assert got["l_quantity_count"] == exp[0]
    assert got["l_quantity_mean"] == pytest.approx(exp[1])
    assert got["l_quantity_std"] == pytest.approx(exp[2])
    assert got["l_quantity_min"] == exp[3]
    assert got["l_quantity_p50"] == pytest.approx(exp[4])
    assert got["l_quantity_max"] == exp[5]


def test_pivot_agg_explicit_values_skips_distinct_scan(spark, sf_dir):
    li = load_tables(spark, sf_dir, ["lineitem"])["lineitem"]
    out = rel.pivot_agg(
        li, ["l_linestatus"], "l_returnflag", "l_quantity", agg="sum",
        pivot_values=["A", "N", "R"],
    )
    assert set(out.columns) == {"l_linestatus", "A", "N", "R"}


def test_confusion_matrix_shape(spark):
    df = spark.createDataFrame(
        [(1, 1), (1, 0), (0, 0), (0, 0)], ["label", "prediction"]
    )
    cm = rel.confusion_matrix(df, "label", "prediction")
    rows = {r["label"]: r for r in cm.collect()}
    assert rows[0]["0"] == 2 and rows[1]["1"] == 1 and rows[1]["0"] == 1


def test_with_row_number_contiguous(spark):
    df = spark.createDataFrame([(x,) for x in [30, 10, 20]], ["v"])
    out = rel.with_row_number(df, ["v"])
    assert [(r["v"], r["rn"]) for r in out.orderBy("rn").collect()] == [
        (10, 1), (20, 2), (30, 3),
    ]


def test_time_ordered_split_sizes(spark):
    df = spark.createDataFrame([(i,) for i in range(100)], ["day"])
    train, test = ts.time_ordered_split(df, "day", train_rows=80, test_rows=10)
    assert train.count() == 80 and test.count() == 10
    assert train.agg(F.max("day")).head()[0] < test.agg(F.min("day")).head()[0]


def test_split_documents_positions(spark):
    df = spark.createDataFrame([("intro|ch one|ch two",)], ["text"])
    out = tx.split_documents(df, "text", r"\|")
    rows = [(r["doc_idx"], r["doc"]) for r in out.orderBy("doc_idx").collect()]
    assert rows == [(0, "intro"), (1, "ch one"), (2, "ch two")]


def test_word_frequency_per_kchar_value(spark):
    df = spark.createDataFrame([("sparkspark ok",)], ["text"])  # 13 chars, 2x 'spark'
    out = tx.word_frequency_per_kchar(df, "text", ["spark"]).head()
    assert out["freq_spark"] == pytest.approx(2 / 13 * 1000)


def test_salted_join_matches_plain_join(spark):
    """Skew-resistant join must be result-identical to the plain join —
    salting changes the physical distribution only. 90% of the left
    side shares one hot key."""
    left = [(1 if i < 900 else i, f"l{i}") for i in range(1000)]
    right = [(k, f"r{k}") for k in range(0, 200)]
    ldf = spark.createDataFrame(left, ["k", "lv"])
    rdf = spark.createDataFrame(right, ["k", "rv"])
    plain = ldf.join(rdf, "k").select("k", "lv", "rv")
    salted = rel.salted_join(ldf, rdf, ["k"], salt_buckets=8).select("k", "lv", "rv")
    assert sorted(map(tuple, salted.collect())) == sorted(map(tuple, plain.collect()))


def test_salted_join_spreads_hot_key(spark):
    """Under actual skew (90% of rows on one key) the salted join must
    bound the biggest post-shuffle task: no single partition may hold
    the whole hot key's output, whereas the unsalted hash join funnels
    all of it into one. This is the distribution property the operator
    exists for — parity alone would pass for a no-op."""
    left = [(1 if i < 1800 else i, f"l{i}") for i in range(2000)]
    right = [(k, f"r{k}") for k in range(0, 200)]
    # disable broadcast so both plans actually shuffle on the join key,
    # and AQE coalescing so the toy-sized shuffle keeps its partitioning
    # (at real scale the hot partition is too big to coalesce away —
    # that's the problem)
    with_conf = spark.conf
    old = with_conf.get("spark.sql.autoBroadcastJoinThreshold")
    old_aqe = with_conf.get("spark.sql.adaptive.enabled")
    with_conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    with_conf.set("spark.sql.adaptive.enabled", "false")
    try:
        ldf = spark.createDataFrame(left, ["k", "lv"]).repartition(8)
        rdf = spark.createDataFrame(right, ["k", "rv"]).repartition(8)

        def max_partition_share(df):
            counts = (
                df.groupBy(F.spark_partition_id().alias("pid"))
                .count()
                .collect()
            )
            total = sum(r["count"] for r in counts)
            return max(r["count"] for r in counts) / total

        plain_share = max_partition_share(ldf.join(rdf, "k"))
        salted_share = max_partition_share(
            rel.salted_join(ldf, rdf, ["k"], salt_buckets=8)
        )
        # unsalted: >=90% of output rows sit in the hot key's single
        # partition; salted: the hot key spans 8 buckets
        assert plain_share >= 0.9, plain_share
        assert salted_share <= 0.5, salted_share
    finally:
        if old is None:
            with_conf.unset("spark.sql.autoBroadcastJoinThreshold")
        else:
            with_conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        if old_aqe is None:
            with_conf.unset("spark.sql.adaptive.enabled")
        else:
            with_conf.set("spark.sql.adaptive.enabled", old_aqe)


def test_read_text_with_fallback_mixed_charsets(spark, tmp_path_factory):
    """S3: one UTF-8 file + one GB18030 file in a dir; both decode."""
    import os

    d = "/root/repo/.scratch/fallback-src"
    os.makedirs(d, exist_ok=True)
    with open(os.path.join(d, "a.txt"), "w", encoding="utf-8") as f:
        f.write("hello 世界")
    with open(os.path.join(d, "b.txt"), "w", encoding="gb18030") as f:
        f.write("价格分析")
    out = read_text_with_fallback(spark, d)
    texts = {os.path.basename(r["path"]): r["text"] for r in out.collect()}
    assert texts["a.txt"] == "hello 世界"
    assert texts["b.txt"] == "价格分析"


def test_correlation_matrix_known_values(spark):
    """y=2x -> corr 1; z = -x -> corr -1; matrix covers all pairs once."""
    df = spark.createDataFrame(
        [(float(i), 2.0 * i, -1.0 * i) for i in range(20)], ["x", "y", "z"]
    )
    m = {(r["col_a"], r["col_b"]): r["corr"] for r in rel.correlation_matrix(df, ["x", "y", "z"]).collect()}
    assert set(m) == {("x", "y"), ("x", "z"), ("y", "z")}
    assert m[("x", "y")] == pytest.approx(1.0)
    assert m[("x", "z")] == pytest.approx(-1.0)


def test_quantile_bins_balanced(spark):
    df = spark.createDataFrame([(i, float(i)) for i in range(100)], ["id", "v"])
    for exact in (False, True):
        out = rel.quantile_bins(df, "v", 4, order_tiebreak=["id"], exact_ntile=exact)
        counts = {r["bin"]: r["n"] for r in out.groupBy("bin").agg(F.count(F.lit(1)).alias("n")).collect()}
        assert counts == {1: 25, 2: 25, 3: 25, 4: 25}, exact
        # Bins respect value order: every bin-1 value < every bin-4 value.
        b1max = out.filter(F.col("bin") == 1).agg(F.max("v")).head()[0]
        b4min = out.filter(F.col("bin") == 4).agg(F.min("v")).head()[0]
        assert b1max < b4min


def test_quantile_bins_exact_ntile_matches_sql_ntile(spark):
    """The distributed exact path (range repartition + per-partition
    offset lift) must reproduce SQL ntile bin-for-bin, including the
    uneven-remainder case (103 rows / 5 bins = sizes 21,21,21,20,20)
    and duplicate values split across bins by the tiebreak."""
    from pyspark.sql import Window

    rows = [(i, float(i % 17)) for i in range(103)]
    df = spark.createDataFrame(rows, ["id", "v"])
    got = {
        r["id"]: r["bin"]
        for r in rel.quantile_bins(df, "v", 5, order_tiebreak=["id"], exact_ntile=True).collect()
    }
    want = {
        r["id"]: r["ref"]
        for r in df.withColumn(
            "ref", F.ntile(5).over(Window.orderBy("v", "id"))
        ).collect()
    }
    assert got == want


def test_quantile_bins_default_path_tie_and_null_semantics(spark):
    """Boundary path: equal values always share a bin (pandas qcut),
    NULLs get a NULL bin."""
    rows = [(i, 1.0) for i in range(50)] + [(i, 2.0) for i in range(50, 100)]
    df = spark.createDataFrame(rows + [(100, None)], "id int, v double")
    out = rel.quantile_bins(df, "v", 4)
    by_v = {
        r["v"]: r["bins"]
        for r in out.groupBy("v").agg(F.collect_set("bin").alias("bins")).collect()
    }
    assert len(by_v[1.0]) == 1 and len(by_v[2.0]) == 1
    assert by_v[1.0][0] < by_v[2.0][0]
    assert by_v[None] == [None] or by_v[None] == []  # null v -> null bin
    null_bin = out.filter(F.col("v").isNull()).head()["bin"]
    assert null_bin is None


def test_iqr_outlier_filter(spark):
    df = spark.createDataFrame([(float(v),) for v in list(range(1, 21)) + [1000.0]], ["v"])
    kept = [r["v"] for r in rel.iqr_outlier_filter(df, "v").collect()]
    assert 1000.0 not in kept and len(kept) == 20


def test_merge_upsert_update_insert_passthrough(spark):
    from big_data_analysis_spark.operators import relational as rel

    base = spark.createDataFrame(
        [(1, "a", 1), (2, "b", 1), (3, "c", 1)], "k int, v string, version int"
    )
    delta = spark.createDataFrame(
        [(2, "B", 2), (4, "d", 2)], "k int, v string, version int"
    )
    out = {
        r["k"]: (r["v"], r["version"])
        for r in rel.merge_upsert(base, delta, ["k"], "version").collect()
    }
    assert out == {1: ("a", 1), 2: ("B", 2), 3: ("c", 1), 4: ("d", 2)}


def test_history_intervals_runs_and_chain(spark):
    from datetime import datetime

    from big_data_analysis_spark.operators import timeseries as ts

    t = lambda s: datetime(2024, 1, 1, 0, s)
    rows = [
        (1, t(0), "x", 10),
        (1, t(1), "x", 11),
        (1, t(2), "y", 12),
        (1, t(3), "x", 13),
        (2, t(0), "z", 14),
    ]
    df = spark.createDataFrame(
        rows, "user_id int, ts timestamp, state string, event_id int"
    )
    hist = ts.history_intervals(df, ["user_id"], "ts", "state", "event_id")
    got = sorted(
        (r["user_id"], r["seg"], r["state"], r["n_events"],
         r["valid_from"], r["valid_to"], r["is_current"])
        for r in hist.collect()
    )
    assert got == [
        (1, 1, "x", 2, t(0), t(2), False),
        (1, 2, "y", 1, t(2), t(3), False),
        (1, 3, "x", 1, t(3), None, True),
        (2, 1, "z", 1, t(0), None, True),
    ]


def test_distribution_features_values(spark):
    from big_data_analysis_spark.operators import timeseries as ts

    df = spark.createDataFrame(
        [("g", v) for v in (10.0, 20.0, 30.0, 40.0)], "grp string, v double"
    )
    out = ts.add_distribution_features(df, ["v"], ["grp"])
    rows = {r["v"]: (r["pct_rank"], r["cume_d"]) for r in out.collect()}
    assert rows[10.0] == (0.0, 0.25)
    assert rows[30.0] == (pytest.approx(2 / 3), 0.75)
    assert rows[40.0] == (1.0, 1.0)


def test_jsonl_and_orc_roundtrip(spark, sf_dir, tmp_path_factory):
    """JSONL and ORC sources/sinks: documents slice roundtrips exactly
    (values AND explicit-schema types), proving the corpus-interchange
    path both directions."""
    from big_data_analysis_spark import io as bio

    base = tmp_path_factory.mktemp("fmt")
    d = (
        bio.load_tables(spark, sf_dir, ["documents"])["documents"]
        .filter(F.col("doc_id") < 50)
        .select("doc_id", "text", "source")
    )
    expect = sorted((r["doc_id"], r["text"], r["source"]) for r in d.collect())

    bio.write_jsonl(d, str(base / "docs_jsonl"))
    back_j = bio.read_jsonl(
        spark, str(base / "docs_jsonl"), "doc_id long, text string, source string"
    )
    assert back_j.schema == d.schema
    assert sorted(tuple(r) for r in back_j.select("doc_id", "text", "source").collect()) == expect

    bio.write_orc(d, str(base / "docs_orc"))
    back_o = bio.read_orc(spark, str(base / "docs_orc"))
    assert back_o.schema == d.schema
    assert sorted(tuple(r) for r in back_o.select("doc_id", "text", "source").collect()) == expect


def test_jsonl_corrupt_line_is_tolerated(spark, tmp_path_factory):
    from big_data_analysis_spark import io as bio

    p = tmp_path_factory.mktemp("badjson") / "corpus.jsonl"
    p.write_text('{"doc_id": 1, "text": "ok"}\n{not json at all\n{"doc_id": 2, "text": "fine"}\n')
    # Spark refuses to answer queries touching ONLY _corrupt_record on a
    # raw JSON scan (QUERY_ONLY_CORRUPT_RECORD_COLUMN) — cache first.
    df = bio.read_jsonl(
        spark, str(p), "doc_id long, text string, _corrupt_record string"
    ).cache()
    good = df.filter(F.col("_corrupt_record").isNull())
    bad = df.filter(F.col("_corrupt_record").isNotNull())
    assert good.count() == 2 and bad.count() == 1


def test_schema_evolution_and_compaction(spark, tmp_path_factory):
    from big_data_analysis_spark import io as bio

    base = tmp_path_factory.mktemp("evolve")
    v1 = spark.range(10).select(F.col("id"), F.lit("a").alias("src"))
    v2 = spark.range(10, 20).select(
        F.col("id"), F.lit("b").alias("src"), (F.col("id") * 2).alias("extra")
    )
    v1.write.parquet(str(base / "t" / "p1"))
    v2.write.parquet(str(base / "t" / "p2"))
    merged = bio.read_parquet_evolved(spark, str(base / "t" / "p*"))
    assert set(merged.columns) == {"id", "src", "extra"}
    assert merged.count() == 20
    # Old files surface the evolved column as null.
    assert merged.filter(F.col("extra").isNull()).count() == 10

    # Compaction: many tiny files -> one file, same rows.
    frag = spark.range(1000).repartition(32)
    frag.write.parquet(str(base / "frag"))
    n = bio.compact_parquet(spark, str(base / "frag"), str(base / "compact"))
    assert n == 1
    import glob as _glob

    parts = _glob.glob(str(base / "compact" / "part-*.parquet"))
    assert len(parts) == 1
    assert bio.read_parquet(spark, str(base / "compact")).count() == 1000


def test_equi_width_histogram_boundaries(spark):
    from big_data_analysis_spark.operators.relational import equi_width_histogram

    df = spark.createDataFrame(
        [(0.0,), (0.49,), (0.5,), (0.99,), (1.0,), (-0.1,), (1.1,)], "x double"
    )
    rows = {r["bin"]: r for r in equi_width_histogram(df, "x", 0.0, 1.0, 2).collect()}
    # out-of-range dropped; x == hi clamped into the last bin
    assert rows[0]["cnt"] == 2 and rows[1]["cnt"] == 3
    assert rows[0]["lo_edge"] == 0.0 and rows[1]["hi_edge"] == 1.0


def test_approx_profile_error_bounds(spark, sf_dir):
    """Sketches must land near the exact answers: HLL++ within 5% on
    distinct counts, approx_percentile within the p5-ish neighborhood
    of the exact percentile (compared by rank tolerance)."""
    from big_data_analysis_spark.operators.relational import approx_profile
    from big_data_analysis_spark.io import load_tables

    ev = load_tables(spark, sf_dir, ["events"])["events"]
    got = {r["stat"]: r["value"] for r in approx_profile(
        ev, ["user_id", "event_type"], "value", quantiles=(0.5, 0.95)
    ).collect()}
    exact = ev.agg(
        F.countDistinct("user_id").alias("u"),
        F.countDistinct("event_type").alias("t"),
        F.expr("percentile(value, 0.5)").alias("p50"),
        F.expr("percentile(value, 0.95)").alias("p95"),
        F.count(F.lit(1)).alias("n"),
    ).head()
    assert abs(got["approx_distinct_user_id"] - exact["u"]) <= 0.05 * exact["u"]
    assert abs(got["approx_distinct_event_type"] - exact["t"]) <= 0.05 * max(exact["t"], 1)
    spread_ = ev.agg(F.max("value") - F.min("value")).head()[0]
    assert abs(got["approx_p50_value"] - exact["p50"]) <= 0.05 * spread_
    assert abs(got["approx_p95_value"] - exact["p95"]) <= 0.05 * spread_
    assert got["n_rows"] == exact["n"]


def test_gap_fill_spine_ffill_and_leading_nulls(spark):
    """gap_fill densifies each key to its own [min, max] calendar, marks
    spine rows observed=0, forward-fills values, and leaves LEADING
    gaps null (nothing to carry) — pandas asfreq+ffill semantics."""
    import datetime as dt

    from big_data_analysis_spark.operators.timeseries import gap_fill

    d = dt.date
    df = spark.createDataFrame(
        [
            ("a", d(2024, 1, 1), None),        # leading observation is null
            ("a", d(2024, 1, 2), 10.0),
            # gap: Jan 3, Jan 4
            ("a", d(2024, 1, 5), 20.0),
            ("b", d(2024, 2, 1), 7.0),         # separate, later spine
            ("b", d(2024, 2, 3), None),        # observed-but-null: ffill carries 7
        ],
        "k string, day date, v double",
    )
    out = {
        (r["k"], r["day"]): (r["v"], r["observed"])
        for r in gap_fill(df, ["k"], "day", ["v"]).collect()
    }
    assert len(out) == 5 + 3  # a: Jan1-5, b: Feb1-3
    assert out[("a", d(2024, 1, 1))] == (None, 1)      # leading null stays null
    assert out[("a", d(2024, 1, 3))] == (10.0, 0)      # gap row, filled
    assert out[("a", d(2024, 1, 4))] == (10.0, 0)
    assert out[("a", d(2024, 1, 5))] == (20.0, 1)
    assert out[("b", d(2024, 2, 2))] == (7.0, 0)       # b's own spine
    assert out[("b", d(2024, 2, 3))] == (7.0, 1)       # null observation ffilled


def test_snapshot_diff_classification_and_null_safety(spark):
    """added/deleted/changed classification; null-safe compare means
    null==null is UNCHANGED (dropped) while null->value is changed."""
    from big_data_analysis_spark.operators.relational import snapshot_diff

    old = spark.createDataFrame(
        [(1, "a", 1.0), (2, "b", None), (3, "c", 3.0), (4, None, 4.0)],
        "k int, s string, v double",
    )
    new = spark.createDataFrame(
        [(1, "a", 1.0), (2, "b", None), (3, "c", 9.0), (5, "e", 5.0), (4, "x", 4.0)],
        "k int, s string, v double",
    )
    rows = {r["k"]: r for r in snapshot_diff(old, new, ["k"]).collect()}
    assert set(rows) == {3, 4, 5}  # 1 identical, 2 null==null -> dropped
    assert rows[3]["change_type"] == "changed" and rows[3]["new_v"] == 9.0
    assert rows[4]["change_type"] == "changed"  # null -> 'x' IS a change
    assert rows[5]["change_type"] == "added" and rows[5]["old_v"] is None
    deleted = snapshot_diff(new, old, ["k"])
    assert {r["k"]: r["change_type"] for r in deleted.collect()}[5] == "deleted"


def test_mixture_sample_sqrt_temperature(spark):
    """Skewed groups: the big group is squashed toward T*sqrt(n) kept
    rows, the tiny group's rate saturates at 1.0 (passes whole), and
    the kept set is deterministic across calls."""
    from big_data_analysis_spark.operators.relational import mixture_sample

    rows = [(i, "big") for i in range(4000)] + [(i + 10000, "tiny") for i in range(9)]
    df = spark.createDataFrame(rows, "id long, grp string")
    kept = mixture_sample(df, "grp", ["id"], 4.0, seed="t")
    by_grp = {r["grp"]: r["n"] for r in kept.groupBy("grp").agg(F.count(F.lit(1)).alias("n")).collect()}
    # big: rate 4/sqrt(4000) ~ 0.0632 -> expect ~253 kept; binomial 5-sigma ~ +-79
    assert 170 <= by_grp["big"] <= 340
    assert by_grp["tiny"] == 9  # rate saturates at 1.0
    rates = {r["grp"]: r["keep_rate"] for r in kept.select("grp", "keep_rate").distinct().collect()}
    assert rates["tiny"] == 1.0 and abs(rates["big"] - 4.0 / 4000**0.5) < 1e-12
    again = sorted(r["id"] for r in mixture_sample(df, "grp", ["id"], 4.0, seed="t").collect())
    assert again == sorted(r["id"] for r in kept.collect())


def test_melt_shape_nulls_and_no_shuffle(spark):
    """melt emits one row per (id, value col) incl. nulls, promotes to
    the common type, and lowers to an Expand with no Exchange."""
    from big_data_analysis_spark.operators.relational import melt

    df = spark.createDataFrame(
        [(1, 10, 1.5), (2, None, 2.5)], "id int, a int, b double"
    )
    out = melt(df, ["id"], ["a", "b"], "var", "val")
    rows = {(r["id"], r["var"]): r["val"] for r in out.collect()}
    assert rows == {(1, "a"): 10.0, (1, "b"): 1.5, (2, "a"): None, (2, "b"): 2.5}
    assert dict(out.dtypes)["val"] == "double"
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Expand" in plan and "Exchange" not in plan


def test_merge_aggregate_state_equals_full_recompute(spark):
    """Incremental rollup invariant: bootstrapping from batch 1 then
    folding batches 2 and 3 must equal one aggregate over all rows —
    per key, for count, sum, min and max."""
    import random

    from big_data_analysis_spark.operators.relational import merge_aggregate_state

    rng = random.Random(17)
    batches = [
        [(f"k{rng.randint(0, 9)}", rng.uniform(-50, 50)) for _ in range(400)]
        for _ in range(3)
    ]
    dfs = [spark.createDataFrame(b, "k string, v double") for b in batches]
    # incremental fold (min/max tracked in their own columns)
    state = None
    for d in dfs:
        d2 = d.withColumn("v_min", F.col("v")).withColumn("v_max", F.col("v"))
        state = merge_aggregate_state(
            state, d2, ["k"], sum_cols=["v"], min_cols=["v_min"], max_cols=["v_max"]
        )
    got = {r["k"]: r for r in state.collect()}
    full = spark.createDataFrame(
        [x for b in batches for x in b], "k string, v double"
    )
    expect = {
        r["k"]: r
        for r in full.groupBy("k")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("v").alias("v"),
            F.min("v").alias("v_min"),
            F.max("v").alias("v_max"),
        )
        .collect()
    }
    assert got.keys() == expect.keys()
    for k in expect:
        assert got[k]["n"] == expect[k]["n"]
        assert abs(got[k]["v"] - expect[k]["v"]) < 1e-9
        assert got[k]["v_min"] == expect[k]["v_min"]
        assert got[k]["v_max"] == expect[k]["v_max"]


def test_skew_report_ranks_hot_keys(spark):
    """A key holding half the table must report share ~0.5 and a
    skew_x of ~nkeys/2; uniform keys sit near 1x."""
    rows = [("hot", i) for i in range(500)] + [
        (f"k{j}", i) for j in range(50) for i in range(10)
    ]
    df = spark.createDataFrame(rows, "k string, v int")
    from big_data_analysis_spark.operators.relational import skew_report

    out = skew_report(df, ["k"], top=5).collect()
    assert out[0]["k"] == "hot"
    assert abs(out[0]["share"] - 0.5) < 1e-6
    assert abs(out[0]["skew_x"] - 25.5) < 0.01  # 500/(1000/51)
    assert all(r["key_rows"] == 10 for r in out[1:])


def test_weighted_sample_exact_k_counts_and_proportionality(spark):
    """A-ES sampler: exactly k rows per group, deterministic across
    partitionings/seeds, and across many seeds a weight-10 row appears
    far more often than a weight-1 row."""
    rows = [(g, i, 10.0 if i < 5 else 1.0) for g in ("a", "b") for i in range(50)]
    df = spark.createDataFrame(rows, "g string, i int, w double")

    s1 = rel.weighted_sample_exact_k(df, "w", 10, ["g"], ["g", "i"], seed=1)
    assert {r["g"]: 1 for r in s1.collect()} and s1.groupBy("g").count().collect()[0]["count"] == 10
    assert s1.count() == 20  # exactly k per group
    s1b = rel.weighted_sample_exact_k(df.repartition(7), "w", 10, ["g"], ["g", "i"], seed=1)
    assert sorted(map(tuple, s1.collect())) == sorted(map(tuple, s1b.collect()))

    heavy_hits = light_hits = 0
    for seed in range(30):
        s = rel.weighted_sample_exact_k(df, "w", 10, ["g"], ["g", "i"], seed=seed)
        for r in s.collect():
            if r["w"] == 10.0:
                heavy_hits += 1
            else:
                light_hits += 1
    # 10 heavy rows (w=10) vs 90 light (w=1) per 2 groups; heavy rows
    # must be selected at several times the light per-row rate
    heavy_rate = heavy_hits / (30 * 10)
    light_rate = light_hits / (30 * 90)
    assert heavy_rate > 3 * light_rate, (heavy_rate, light_rate)


def test_weighted_sample_exact_k_ungrouped_and_bad_weights(spark):
    """ADVICE r3: ungrouped exact-k must plan TakeOrderedAndProject
    (per-partition partial top-k), not a global single-partition
    window; NULL/zero/negative weights are excluded rather than
    silently reordering the sample."""
    rows = [(i, 10.0 if i < 5 else 1.0) for i in range(100)]
    bad = [(100, 0.0), (101, -3.0), (102, None)]
    df = spark.createDataFrame(rows + bad, "i int, w double")

    out = rel.weighted_sample_exact_k(df, "w", 10, id_cols=["i"], seed=1)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan, plan[:1500]
    got = out.collect()
    assert len(got) == 10
    assert all(r["w"] > 0 for r in got)
    # deterministic across partitionings
    got_b = rel.weighted_sample_exact_k(
        df.repartition(7), "w", 10, id_cols=["i"], seed=1
    ).collect()
    assert sorted(map(tuple, got)) == sorted(map(tuple, got_b))
    # grouped path also excludes non-positive weights
    g = df.withColumn("g", F.lit("x"))
    gout = rel.weighted_sample_exact_k(g, "w", 50, ["g"], ["g", "i"], seed=1).collect()
    assert all(r["w"] > 0 for r in gout)


def test_dedup_keep_last_ties_resolve_deterministically(spark):
    """VERDICT r3 #6: when order_by does NOT totally order a key group
    (tied timestamps), the kept row must be the same across arbitrary
    repartitionings — the implicit full-row hash tiebreak, not shuffle
    arrival order, decides."""
    rows = [("k1", 5, f"payload{i}") for i in range(20)] + [
        ("k2", 3, f"p{i}") for i in range(7)
    ] + [("k3", 1, "only")]
    df = spark.createDataFrame(rows, "k string, ts int, payload string")
    outs = []
    for parts in (1, 4, 13):
        got = sorted(
            map(tuple, rel.dedup_keep_last(df.repartition(parts), ["k"], ["ts"]).collect())
        )
        outs.append(got)
    assert outs[0] == outs[1] == outs[2]
    assert len(outs[0]) == 3
    # and a total order_by still wins over the hash tiebreak
    tot = rel.dedup_keep_last(df, ["k"], ["ts", "payload"]).collect()
    assert {r["k"]: r["payload"] for r in tot}["k2"] == "p6"


def test_robust_scale_semantics(spark):
    """(x - median)/IQR per group; zero-IQR groups yield NULL, not a
    divide error (ANSI mode); global path broadcasts a 1-row stats agg."""
    rows = [("a", float(v)) for v in range(1, 101)] + [("const", 7.0)] * 5
    df = spark.createDataFrame(rows, "g string, v double")
    out = rel.robust_scale(df, "v", partition_by=["g"], out_col="r")
    got = {(r["g"], r["v"]): r["r"] for r in out.collect()}
    # group a: median 50.5, IQR = 75.25 - 25.75 = 49.5
    assert got[("a", 50.5)] is None or abs(got[("a", 50.5)]) < 1e-9 if ("a", 50.5) in got else True
    assert abs(got[("a", 100.0)] - (100.0 - 50.5) / 49.5) < 1e-9
    assert all(v is None for (g, _), v in got.items() if g == "const")
    # global path
    gout = rel.robust_scale(df.select("v"), "v").collect()
    assert len(gout) == 105 and any(r["v_robust"] is not None for r in gout)


def test_merge_distinct_state_fold_order_and_accuracy(spark):
    """Incremental HLL distinct state: (a) folding deltas in ANY order
    yields the same estimates as one full recompute (register max-merge
    is commutative/associative), (b) estimates are within the HLL
    error bound of exact, (c) folding is idempotent-safe for disjoint
    deltas (counts grow only with genuinely new values)."""
    rows = [(i % 4, f"u{i % 500}", f"s{i % 37}") for i in range(3000)]
    df = spark.createDataFrame(rows, "day int, user string, sess string")
    d1 = df.filter(F.col("day") < 2)
    d2 = df.filter(F.col("day") >= 2)

    s_inc = rel.merge_distinct_state(d1, None, ["day"], ["user", "sess"])
    s_inc = rel.merge_distinct_state(d2, s_inc, ["day"], ["user", "sess"])
    s_rev = rel.merge_distinct_state(d2, None, ["day"], ["user", "sess"])
    s_rev = rel.merge_distinct_state(d1, s_rev, ["day"], ["user", "sess"])
    s_full = rel.merge_distinct_state(df, None, ["day"], ["user", "sess"])

    def est(s):
        return {
            r["day"]: (r["approx_distinct_user"], r["approx_distinct_sess"])
            for r in rel.distinct_state_estimates(s, ["user", "sess"]).collect()
        }

    e_inc, e_rev, e_full = est(s_inc), est(s_rev), est(s_full)
    assert e_inc == e_rev == e_full
    exact = {
        r["day"]: (r["u"], r["s"])
        for r in df.groupBy("day")
        .agg(F.countDistinct("user").alias("u"), F.countDistinct("sess").alias("s"))
        .collect()
    }
    for day, (u, s) in exact.items():
        gu, gs = e_inc[day]
        assert abs(gu - u) <= max(3, 0.05 * u), (day, gu, u)
        assert abs(gs - s) <= max(3, 0.05 * s), (day, gs, s)


def test_incremental_join_delta_matches_full_recompute(spark, sf_dir):
    """IVM parity: materialized join + delta(join) == full recompute
    over the grown inputs, on a real orders/lineitem split (base =
    orderkey < 10000, deltas = the rest)."""
    from big_data_analysis_spark.operators.relational import incremental_join_delta

    t = load_tables(spark, sf_dir, ["orders", "lineitem"])
    o = t["orders"].select(F.col("o_orderkey").alias("k"), "o_totalprice")
    li = t["lineitem"].select(
        F.col("l_orderkey").alias("k"), "l_linenumber", "l_quantity"
    )
    # modulo split so deltas are non-empty at every SF, and the
    # left/right splits overlap partially: dA><B, A><dB and dA><dB all
    # contribute rows
    o_base, o_delta = o.filter("k % 4 != 0"), o.filter("k % 4 = 0")
    l_base, l_delta = li.filter("k % 2 != 0"), li.filter("k % 2 = 0")

    materialized = o_base.join(l_base, "k")
    delta = incremental_join_delta(o_base, o_delta, l_base, l_delta, ["k"])
    incremental = materialized.unionByName(delta.select(materialized.columns))
    full = o.join(li, "k")

    def counted(df):
        return {
            tuple(r): r["cnt"]
            for r in df.groupBy(df.columns).agg(F.count(F.lit(1)).alias("cnt")).collect()
        }

    assert counted(incremental) == counted(full)
    assert delta.count() > 0  # the split actually exercised all 3 parts


def test_bloom_filtered_join_parity_and_prefilter(spark, sf_dir):
    """The bloom runtime filter must not change join results (false
    positives die in the real join, false negatives are impossible)
    and must actually shrink the big side before the shuffle on a
    selective key set."""
    import pytest as _pytest

    from big_data_analysis_spark.operators.relational import bloom_filtered_join

    t = load_tables(spark, sf_dir, ["orders", "customer"])
    # selective small side: ~4% of customers
    small = t["customer"].filter(F.col("c_custkey") % 25 == 0).select(
        F.col("c_custkey").alias("o_custkey"), "c_acctbal"
    )
    big = t["orders"]

    plain = big.join(small, ["o_custkey"])
    bloomed = bloom_filtered_join(big, small, ["o_custkey"])
    assert sorted(map(tuple, bloomed.collect())) == sorted(map(tuple, plain.collect()))

    # the pre-filter keeps ~the key set's selectivity of the big side
    n_big = big.count()
    semi = bloom_filtered_join(big, small, ["o_custkey"], how="left_semi")
    n_match = semi.count()
    assert 0 < n_match < n_big * 0.2

    with _pytest.raises(ValueError, match="bloom_filtered_join"):
        bloom_filtered_join(big, small, ["o_custkey"], how="left")

    # long-lived-driver path: a prebuilt filter (built once per
    # small-side snapshot via build_join_bloom) gives identical results
    # without re-running the build aggregate per call
    from big_data_analysis_spark.operators.relational import build_join_bloom

    bloom = build_join_bloom(small, ["o_custkey"], num_hashes=7)
    # num_hashes/num_bits come from the JoinBloom, NOT this call's
    # defaults (5 / 1<<22) — a drift here would silently delete rows
    reused = bloom_filtered_join(big, small, ["o_custkey"], prebuilt=bloom)
    assert reused.count() == plain.count()
    with _pytest.raises(TypeError, match="JoinBloom"):
        bloom_filtered_join(big, small, ["o_custkey"], prebuilt=bloom.words)


def test_with_provenance_names_source_file_and_rows(spark, sf_dir):
    """Provenance columns come from the scan's constant-folded file
    metadata: path points at the actual parquet, row_index is a dense
    per-file counter, and nothing touches a UDF."""
    from big_data_analysis_spark.io import read_parquet, with_provenance

    df = with_provenance(read_parquet(spark, f"{sf_dir}/nation.parquet"))
    rows = df.collect()
    assert all(r["_src_file"].endswith("nation.parquet") for r in rows)
    assert all(r["_src_file_size"] > 0 for r in rows)
    assert sorted(r["_src_row_index"] for r in rows) == list(range(len(rows)))


def test_bloom_prebuilt_reuses_single_broadcast(spark, sf_dir):
    """ADVICE r5: build_join_bloom broadcasts the word array ONCE and
    stores the handle in the JoinBloom; every bloom_filtered_join call
    that receives the prebuilt filter creates ZERO new broadcasts — a
    long-lived driver looping refresh cycles accumulates no broadcast
    state beyond the one the build created."""
    from pyspark import SparkContext

    from big_data_analysis_spark.operators import relational as rel

    t = load_tables(spark, sf_dir, ["orders", "customer"])
    small = t["customer"].filter(F.col("c_custkey") % 25 == 0).select(
        F.col("c_custkey").alias("o_custkey")
    )
    bloom = rel.build_join_bloom(small, ["o_custkey"])
    assert bloom.bc is not None
    assert (bloom.bc.value == bloom.words).all()  # .value deserializes a copy

    created = []
    orig = SparkContext.broadcast

    def spy(self, value):
        created.append(value)
        return orig(self, value)

    SparkContext.broadcast = spy
    try:
        for _ in range(3):
            n = rel.bloom_filtered_join(
                t["orders"], small, ["o_custkey"], how="left_semi", prebuilt=bloom
            ).count()
            assert n > 0
    finally:
        SparkContext.broadcast = orig
    assert created == [], f"prebuilt join still broadcast {len(created)} object(s)"


# ---------------------------------------------------------------------------
# budget_prefix_sample
# ---------------------------------------------------------------------------


def _naive_budget_prefix(spark, df, budgets, seed):
    """Definitional implementation: full cumulative-sum window per group
    in (portable hash, key) order — what the bucketed plan must equal.
    Sums in DECIMAL(28,6), the operator's documented fixed-point
    contract (a double cumsum is accumulation-order-dependent and would
    disagree with ANY exact plan on knife-edge rows). Hash expression
    re-derived independently of the package helper on purpose."""
    from pyspark.sql import Window

    key = F.concat_ws("\x1f", F.lit(seed), F.col("doc_id").cast("string"))
    h = F.conv(F.substring(F.md5(key), 1, 8), 16, 10).cast("long")
    pairs = []
    for k, v in budgets.items():
        pairs.extend([F.lit(k), F.lit(str(v)).cast("decimal(38,6)")])
    w = Window.partitionBy("grp").orderBy(h, "doc_id")
    return (
        df.withColumn("__cum", F.sum(F.col("w").cast("decimal(28,6)")).over(w))
        .filter(F.col("__cum") <= F.create_map(*pairs)[F.col("grp")])
        .drop("__cum")
    )


def test_budget_prefix_sample_matches_naive_window(spark):
    rows = [(i, f"g{i % 3}", 1 + (i * 7) % 5) for i in range(300)]
    df = spark.createDataFrame(rows, "doc_id long, grp string, w long")
    totals = {r["grp"]: r["t"] for r in df.groupBy("grp").agg(F.sum("w").alias("t")).collect()}
    # budgets cutting at ~30% / ~70% / over-total per group
    budgets = {
        "g0": int(totals["g0"] * 0.3),
        "g1": int(totals["g1"] * 0.7),
        "g2": totals["g2"] + 100,
    }
    got = rel.budget_prefix_sample(df, ["doc_id"], "w", "grp", budgets, seed="s1", buckets=8)
    want = _naive_budget_prefix(spark, df, budgets, "s1")
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0
    # g2's budget exceeds its total: every g2 row kept
    assert got.filter(F.col("grp") == "g2").count() == df.filter(F.col("grp") == "g2").count()
    # kept weight respects each budget exactly
    for g, b in budgets.items():
        kept_w = got.filter(F.col("grp") == g).agg(F.sum("w")).head()[0]
        assert kept_w <= b


def test_budget_prefix_sample_edges(spark):
    df = spark.createDataFrame(
        [(1, "a", 5), (2, "a", 5), (3, "b", 5)], "doc_id long, grp string, w long"
    )
    # group missing from budgets -> dropped entirely
    got = rel.budget_prefix_sample(df, ["doc_id"], "w", "grp", {"a": 100}, buckets=4)
    assert got.filter(F.col("grp") == "b").count() == 0
    assert got.filter(F.col("grp") == "a").count() == 2
    # zero budget -> nothing kept for that group
    got0 = rel.budget_prefix_sample(df, ["doc_id"], "w", "grp", {"a": 0, "b": 0}, buckets=4)
    assert got0.count() == 0
    # output columns unchanged
    assert got.columns == df.columns


def test_budget_prefix_sample_float_weights_match_naive(spark):
    """The knife-edge case that breaks a double-precision plan: 400 rows
    of weight 0.1, budget 10.1. Driver-summed bucket offsets accumulate
    floats in a different order than the row-order cumsum, flipping the
    boundary row (observed: 100 vs 101 rows kept). The DECIMAL(38,6)
    fixed-point contract makes every summation order give the same
    exact answer, so the bucketed plan equals the definitional window
    row-for-row even on fractional weights."""
    df = spark.createDataFrame(
        [(i, "g", 0.1) for i in range(400)], "doc_id long, grp string, w double"
    )
    budgets = {"g": 10.1}
    got = rel.budget_prefix_sample(df, ["doc_id"], "w", "grp", budgets, seed="s", buckets=8)
    want = _naive_budget_prefix(spark, df, budgets, "s")
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0
    assert got.count() == 101  # 101 * 0.1 = 10.1 exactly in decimal


def test_budget_prefix_sample_budget_fracs(spark):
    """budget_fracs resolves floor(frac * group_total) in exact decimal
    from the operator's OWN stats pass — identical kept set to passing
    the precomputed absolute budget, no second scan."""
    from decimal import ROUND_FLOOR, Decimal

    rows = [(i, f"g{i % 2}", 1 + (i * 3) % 7) for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id long, grp string, w long")
    totals = {
        r["grp"]: r["t"]
        for r in df.groupBy("grp").agg(F.sum("w").alias("t")).collect()
    }
    explicit = {
        g: int((Decimal("0.55") * t).to_integral_value(rounding=ROUND_FLOOR))
        for g, t in totals.items()
    }
    via_frac = rel.budget_prefix_sample(
        df, ["doc_id"], "w", "grp", budget_fracs=0.55, seed="s", buckets=8
    )
    via_abs = rel.budget_prefix_sample(
        df, ["doc_id"], "w", "grp", explicit, seed="s", buckets=8
    )
    assert via_frac.exceptAll(via_abs).count() == 0
    assert via_abs.exceptAll(via_frac).count() == 0
    # dict form is an allowlist, like budgets
    only_g0 = rel.budget_prefix_sample(
        df, ["doc_id"], "w", "grp", budget_fracs={"g0": 1.0}, seed="s", buckets=8
    )
    assert only_g0.filter(F.col("grp") == "g1").count() == 0
    assert only_g0.count() == df.filter(F.col("grp") == "g0").count()
    # exactly one budget spec required
    with pytest.raises(ValueError, match="exactly one"):
        rel.budget_prefix_sample(df, ["doc_id"], "w", "grp", explicit, budget_fracs=0.5)
    with pytest.raises(ValueError, match="exactly one"):
        rel.budget_prefix_sample(df, ["doc_id"], "w", "grp")


def test_budget_prefix_sample_rejects_bad_weights_and_buckets(spark):
    import math

    df = spark.createDataFrame([(1, "a", -1.0)], "doc_id long, grp string, w double")
    with pytest.raises(ValueError, match="negative"):
        rel.budget_prefix_sample(df, ["doc_id"], "w", "grp", {"a": 10}, buckets=4)
    nan = spark.createDataFrame([(1, "a", math.nan)], "doc_id long, grp string, w double")
    with pytest.raises(ValueError, match="NaN"):
        rel.budget_prefix_sample(nan, ["doc_id"], "w", "grp", {"a": 10}, buckets=4)
    ok = spark.createDataFrame([(1, "a", 1.0)], "doc_id long, grp string, w double")
    with pytest.raises(ValueError, match="power of two"):
        rel.budget_prefix_sample(ok, ["doc_id"], "w", "grp", {"a": 10}, buckets=3)


def test_drop_rows_with_null_subset_semantics(spark):
    df = spark.createDataFrame(
        [(1, "a", 1.0), (2, None, 2.0), (3, "c", None)],
        "k long, s string, v double",
    )
    assert rel.drop_rows_with_null(df).count() == 1  # any-null dropped
    kept = rel.drop_rows_with_null(df, subset=["s"]).collect()
    assert sorted(r["k"] for r in kept) == [1, 3]  # null v survives


def test_register_views_sql_visibility(spark, sf_dir):
    from big_data_analysis_spark.io import register_views

    dfs = register_views(spark, sf_dir, ["region", "nation"])
    assert set(dfs) == {"region", "nation"}
    joined = spark.sql(
        "SELECT count(*) AS n FROM nation n JOIN region r ON n.n_regionkey = r.r_regionkey"
    ).head()
    assert joined["n"] == dfs["nation"].count()


# ---------------------------------------------------------------------------
# weighted_quantiles
# ---------------------------------------------------------------------------


def test_weighted_quantiles_known_cdf(spark):
    # values 1..4, weights 1,1,2,4 (W=8): cum = 1,2,4,8
    df = spark.createDataFrame(
        [(1, 1.0), (2, 1.0), (3, 2.0), (4, 4.0)], "v int, w double"
    )
    r = rel.weighted_quantiles(df, "v", "w", [0.25, 0.5, 0.9, 1.0]).head()
    assert (r["wq_0_25"], r["wq_0_5"], r["wq_0_9"], r["wq_1_0"]) == (2, 3, 4, 4)


def test_weighted_quantiles_grouped_ties_and_numpy_parity(spark):
    import random

    # ties share one CDF step (RANGE frame)
    g = spark.createDataFrame(
        [("a", 5, 1.0), ("a", 5, 1.0), ("a", 9, 2.0), ("b", 1, 3.0)],
        "g string, v int, w double",
    )
    rows = {r["g"]: r for r in rel.weighted_quantiles(
        g, "v", "w", [0.5], partition_by=["g"]).collect()}
    assert rows["a"]["wq_0_5"] == 5 and rows["b"]["wq_0_5"] == 1
    # random-data parity with the definitional python computation
    rng = random.Random(9)
    data = [(rng.randint(0, 50), float(rng.randint(0, 5))) for _ in range(300)]
    df = spark.createDataFrame(data, "v int, w double")
    got = rel.weighted_quantiles(df, "v", "w", [0.3, 0.7]).head()

    def manual(q):
        srt = sorted(data)
        tot = sum(w for _, w in srt)
        cum = 0.0
        # value-level CDF: accumulate whole tie groups
        from itertools import groupby

        for v, grp in groupby(srt, key=lambda t: t[0]):
            cum += sum(w for _, w in grp)
            if cum >= q * tot:
                return v
        return srt[-1][0]

    assert got["wq_0_3"] == manual(0.3) and got["wq_0_7"] == manual(0.7)


def test_weighted_quantiles_validation(spark):
    df = spark.createDataFrame([(1, 1.0)], "v int, w double")
    with pytest.raises(ValueError, match="non-empty"):
        rel.weighted_quantiles(df, "v", "w", [])
    with pytest.raises(ValueError, match="in \\(0, 1\\]"):
        rel.weighted_quantiles(df, "v", "w", [0.0])
    neg = spark.createDataFrame([(1, -2.0)], "v int, w double")
    with pytest.raises(Exception, match="negative"):
        rel.weighted_quantiles(neg, "v", "w", [0.5]).collect()
    # NULL values are excluded, not selected
    withnull = spark.createDataFrame([(None, 5.0), (7, 1.0)], "v int, w double")
    assert rel.weighted_quantiles(withnull, "v", "w", [0.5]).head()["wq_0_5"] == 7


def test_weighted_quantiles_decimal_knife_edge_and_granularity(spark):
    """Precision-loss regression (found by review, verified live):
    Spark rounds any decimal step whose RESULT TYPE exceeds 38 digits —
    including the >= comparison's common type — so a naive
    (12,6)x(38,6) threshold silently rounds 0.999999333333 down to
    0.999999 and selects the wrong value. The (7,6)/(26,6) discipline
    keeps threshold AND comparison exact."""
    df = spark.createDataFrame([(1, 0.999999), (2, 2.000002)], "v int, w double")
    # exact threshold 0.333333 * 3.000001 = 0.999999333333 > cum(1)
    assert rel.weighted_quantiles(df, "v", "w", [0.333333]).head()["wq_0_333333"] == 2
    # cum exactly == threshold still selects (>=, not >)
    eq = spark.createDataFrame([(1, 1.0), (2, 1.0)], "v int, w double")
    assert rel.weighted_quantiles(eq, "v", "w", [0.5]).head()["wq_0_5"] == 1
    # q beyond 1e-6 granularity would silently answer a different
    # quantile -> must raise, not round
    with pytest.raises(ValueError, match="decimal places"):
        rel.weighted_quantiles(df, "v", "w", [0.1234567])
    # corrupt weight on a NULL-value row still raises (guard runs
    # before the value filter drops the row)
    bad = spark.createDataFrame([(None, -5.0), (7, 1.0)], "v int, w double")
    with pytest.raises(Exception, match="negative"):
        rel.weighted_quantiles(bad, "v", "w", [0.5]).collect()


# ---------------------------------------------------------------------------
# gini_coefficient
# ---------------------------------------------------------------------------


def test_gini_known_distributions_and_python_parity(spark):
    import random

    even = spark.createDataFrame([("a", 5.0)] * 10, "g string, x double")
    assert rel.gini_coefficient(even, "x", ["g"]).head()["gini"] == 0.0
    # one holder of everything among n: G = (n-1)/n
    onep = spark.createDataFrame(
        [("a", 0.0)] * 9 + [("a", 100.0)], "g string, x double"
    )
    assert rel.gini_coefficient(onep, "x", ["g"]).head()["gini"] == 0.9
    # random-data parity with the definitional rank formula
    rng = random.Random(3)
    vals = [rng.uniform(0, 100) for _ in range(200)]
    df = spark.createDataFrame([("a", v) for v in vals], "g string, x double")
    got = rel.gini_coefficient(df, "x", ["g"]).head()
    s = sorted(vals)
    n = len(s)
    want = 2 * sum((i + 1) * v for i, v in enumerate(s)) / (n * sum(s)) - (n + 1) / n
    assert abs(got["gini"] - round(want, 6)) < 2e-6
    assert got["n_obs"] == 200


def test_gini_edges(spark):
    # zero total -> NULL (0/0 has no inequality reading), never an error
    z = spark.createDataFrame([("a", 0.0)] * 3, "g string, x double")
    assert rel.gini_coefficient(z, "x", ["g"]).head()["gini"] is None
    # negative values raise per-row; NULLs are excluded
    neg = spark.createDataFrame([("a", -1.0), ("a", 2.0)], "g string, x double")
    with pytest.raises(Exception, match="negative"):
        rel.gini_coefficient(neg, "x", ["g"]).collect()
    withnull = spark.createDataFrame(
        [("a", None), ("a", 1.0), ("a", 1.0)], "g string, x double"
    )
    r = rel.gini_coefficient(withnull, "x", ["g"]).head()
    assert r["n_obs"] == 2 and r["gini"] == 0.0


def test_infinite_values_raise_not_corrupt(spark):
    """ANSI Spark casts a double Infinity to decimal as SILENT NULL —
    without the shared nonfinite_or_negative guard an inf row would
    count toward ranks/row counts while vanishing from the fixed-point
    sums, corrupting certificates without an error (observed: a
    negative Gini). All three fixed-point operators must raise."""
    inf = float("inf")
    g = spark.createDataFrame([("a", inf), ("a", 1.0)], "g string, x double")
    with pytest.raises(Exception, match="infinite"):
        rel.gini_coefficient(g, "x", ["g"]).collect()
    wq = spark.createDataFrame([(1, inf), (2, 1.0)], "v int, w double")
    with pytest.raises(Exception, match="infinite"):
        rel.weighted_quantiles(wq, "v", "w", [0.5]).collect()
    bp = spark.createDataFrame([(1, "a", inf)], "doc_id long, grp string, w double")
    with pytest.raises(ValueError, match="infinite"):
        rel.budget_prefix_sample(bp, ["doc_id"], "w", "grp", {"a": 10})
