"""Plan-shape tests (SURVEY.md §4.2): pin the optimizer properties the
100 TB design depends on. A regression that silently un-pushes a filter
or widens a scan fails HERE, not in a cluster bill."""

from __future__ import annotations

from pyspark.sql import functions as F

from big_data_analysis_spark.io import load_tables
from big_data_analysis_spark.plans import (
    broadcast_join_count,
    formatted_plan,
    has_wholestage_codegen,
    scan_infos,
)
from big_data_analysis_spark.queries import QUERIES


def test_filter_pushdown_reaches_scan(spark, sf_dir):
    li = load_tables(spark, sf_dir, ["lineitem"])["lineitem"]
    df = li.filter(F.col("l_quantity") > 30).select("l_orderkey", "l_quantity")
    scans = scan_infos(df)
    assert scans, formatted_plan(df)
    pushed = scans[0]["pushed_filters"]
    assert pushed and any("l_quantity" in f for f in pushed), scans


def test_column_pruning_limits_read_schema(spark, sf_dir):
    li = load_tables(spark, sf_dir, ["lineitem"])["lineitem"]
    df = li.select("l_orderkey", "l_quantity")
    scans = scan_infos(df)
    assert scans[0]["read_schema"] == ["l_orderkey", "l_quantity"], scans
    # 11-column table, 2-column projection: reading more is a bug.


def test_pricing_summary_scan_is_tight(spark, sf_dir):
    """The TPC-H Q1 shape must push its date filter and read only the
    7 columns it aggregates."""
    df = QUERIES["pricing_summary"](spark, sf_dir)
    scans = scan_infos(df)
    assert scans
    s = scans[0]
    assert any("l_shipdate" in f for f in (s["pushed_filters"] or [])), s
    assert s["read_schema"] is not None and len(s["read_schema"]) <= 7, s
    assert "l_orderkey" not in s["read_schema"]


def test_dim_join_broadcasts(spark, sf_dir):
    """top_customers joins two dims — both must broadcast, zero shuffle
    joins for dimension tables."""
    df = QUERIES["top_customers"](spark, sf_dir)
    assert broadcast_join_count(df) >= 1, formatted_plan(df)


def test_flagship_stays_in_codegen(spark, sf_dir):
    """AQE wraps plans in AdaptiveSparkPlan and defers codegen spans to
    runtime — disable it for the static inspection only."""
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        df = QUERIES["trend_rules"](spark, sf_dir)
        assert has_wholestage_codegen(df), formatted_plan(df)[:2000]
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", "true")


def test_bucketed_join_has_no_exchange(spark, sf_dir):
    """Two tables bucketed on the join key must sort-merge-join with
    ZERO Exchange operators — the co-located join that makes repeated
    fact joins affordable at 100 TB."""
    from big_data_analysis_spark.io import write_bucketed_table

    t = load_tables(spark, sf_dir, ["orders", "customer"])
    write_bucketed_table(
        t["orders"], "b_orders", ["o_custkey"], num_buckets=4, sort_by=["o_custkey"]
    )
    write_bucketed_table(
        t["customer"].withColumnRenamed("c_custkey", "o_custkey"),
        "b_customer", ["o_custkey"], num_buckets=4, sort_by=["o_custkey"],
    )
    try:
        joined = spark.table("b_orders").join(spark.table("b_customer"), "o_custkey")
        # Force a sort-merge join (tiny test tables would broadcast and
        # hide the property under test) and freeze AQE for inspection.
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            plan = formatted_plan(joined)
        finally:
            spark.conf.set("spark.sql.adaptive.enabled", "true")
            spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        assert "SortMergeJoin" in plan, plan[:1500]
        assert "Exchange" not in plan, plan[:1500]
        # And it still returns the right rows.
        expected = t["orders"].join(
            t["customer"].withColumnRenamed("c_custkey", "o_custkey"), "o_custkey"
        ).count()
        assert joined.count() == expected
    finally:
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_customer")


def test_partitioned_write_prunes_partitions(spark, sf_dir):
    """§4.2 partition pruning: a date-partitioned parquet sink read back
    with a partition filter must scan only matching partitions."""
    import shutil

    from big_data_analysis_spark.io import load_tables as lt
    from big_data_analysis_spark.io import write_parquet

    out = "/root/repo/.scratch/part-events"
    shutil.rmtree(out, ignore_errors=True)
    ev = lt(spark, sf_dir, ["events"])["events"].withColumn(
        "day", F.col("ts").cast("date")
    )
    write_parquet(ev, out, partition_by=["day"])

    first_day = ev.agg(F.min("day")).head()[0]
    df = spark.read.parquet(out).filter(F.col("day") == F.lit(first_day))
    plan = formatted_plan(df)
    import re

    m = re.search(r"PartitionFilters: \[(.*?)\]", plan)
    assert m and "day" in m.group(1), plan[:1500]
    # Value check: pruned read equals the filtered original.
    assert df.count() == ev.filter(F.col("day") == F.lit(first_day)).count()
    shutil.rmtree(out, ignore_errors=True)


def test_approx_count_distinct_within_tolerance(spark, sf_dir):
    """A-ext approx aggregates: approx_count_distinct within 5% of exact
    (the 100 TB substitute for exact COUNT(DISTINCT) global shuffles)."""
    ev = load_tables(spark, sf_dir, ["events"])["events"]
    exact = ev.select("user_id").distinct().count()
    approx = ev.agg(F.approx_count_distinct("user_id", rsd=0.02).alias("a")).head()["a"]
    assert abs(approx - exact) / exact < 0.05


def test_spread_restores_parallelism(spark, sf_dir):
    from big_data_analysis_spark.io import spread

    d = load_tables(spark, sf_dir, ["documents"])["documents"]
    assert spread(d).rdd.getNumPartitions() >= spark.sparkContext.defaultParallelism


def test_spread_is_noop_on_parallel_input(spark):
    """The 100 TB contract: an input that already scans with adequate
    parallelism must pass through spread() UNCHANGED — no round-robin
    Exchange ahead of map-side work. (A many-filed petabyte table
    arrives as thousands of splits; repartitioning it would shuffle
    the entire table for nothing.)"""
    from big_data_analysis_spark.io import spread

    par = spark.sparkContext.defaultParallelism
    wide = spark.range(0, 1_000_000, 1, numPartitions=par)
    out = spread(wide)
    assert out is wide  # identity, not merely same partition count
    assert "Exchange" not in formatted_plan(out.select("id"))

    narrow = spark.range(0, 1000, 1, numPartitions=1)
    assert spread(narrow).rdd.getNumPartitions() == par


def test_asof_join_single_shuffle(spark, sf_dir):
    """The as-of union trick must cost exactly ONE Exchange (the window
    partitioning) — the whole point over a join-then-argmax plan."""
    import re

    from big_data_analysis_spark.io import load_tables
    from big_data_analysis_spark.operators import timeseries as ts

    ev = load_tables(spark, sf_dir, ["events"])["events"]
    views = ev.filter(F.col("event_type") == "view").select("user_id", "ts", "value")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    out = ts.asof_join(purchases, views, ["user_id"], "ts", ["value"])
    plan = formatted_plan(out)
    # Count operator detail entries ("(9) Exchange"), not tree echo lines.
    assert len(re.findall(r"\(\d+\) Exchange\b", plan)) == 1, plan


def test_history_intervals_single_shuffle(spark, sf_dir):
    """SCD2 compaction: all three windows + the keyed aggregate share the
    user_id partitioning, so the whole op must cost exactly ONE Exchange."""
    import re

    from big_data_analysis_spark.io import load_tables
    from big_data_analysis_spark.operators import timeseries as ts

    ev = load_tables(spark, sf_dir, ["events"])["events"]
    out = ts.history_intervals(ev, ["user_id"], "ts", "event_type", "event_id")
    plan = formatted_plan(out)
    assert len(re.findall(r"\(\d+\) Exchange\b", plan)) == 1, plan


def test_merge_upsert_single_shuffle(spark, sf_dir):
    """SCD1 merge: union is narrow; the only Exchange is the keep-last
    ranking window's hash partitioning on the merge key."""
    import re

    from big_data_analysis_spark.io import load_tables
    from big_data_analysis_spark.operators import relational as rel

    o = load_tables(spark, sf_dir, ["orders"])["orders"].select(
        "o_orderkey", "o_totalprice"
    )
    base = o.withColumn("version", F.lit(1))
    delta = o.filter(F.col("o_orderkey") % 7 == 0).withColumn("version", F.lit(2))
    out = rel.merge_upsert(base, delta, ["o_orderkey"], "version")
    plan = formatted_plan(out)
    assert len(re.findall(r"\(\d+\) Exchange\b", plan)) == 1, plan


def test_tpch_shapes_broadcast_dims_and_push_filters(spark, sf_dir):
    """The round-3 TPC-H shapes must keep their scale properties:
    Q19's brand disjunction supersets to an IN filter pushed at the
    part scan, and the part side broadcasts (no shuffle of lineitem
    beyond its aggregation)."""
    df = QUERIES["discounted_revenue_brands"](spark, sf_dir)
    assert broadcast_join_count(df) >= 1, formatted_plan(df)
    scans = scan_infos(df)
    part_scan = [s for s in scans if "p_brand" in (s["read_schema"] or [])]
    assert part_scan and any(
        "p_brand" in f for f in part_scan[0]["pushed_filters"]
    ), scans

    q22 = QUERIES["sales_opportunity"](spark, sf_dir)
    plan22 = formatted_plan(q22)
    assert "BroadcastNestedLoopJoin" in plan22 or "BroadcastExchange" in plan22
    # anti join present (NOT EXISTS as left_anti, not a null-trap NOT IN)
    assert "LeftAnti" in plan22, plan22[:2000]


def test_zorder_write_clusters_all_dimensions(spark, sf_dir, tmp_path):
    """Data-skipping property: after a Z-ordered write on (quantity,
    extendedprice), a point-range predicate on EITHER column overlaps
    the [min,max] footer stats of only a fraction of files; a plain
    sort on quantity clusters quantity but leaves extendedprice ranges
    spanning every file. Checked against real parquet footers."""
    import pyarrow.parquet as pq

    from big_data_analysis_spark.io import write_parquet_zordered

    li = load_tables(spark, sf_dir, ["lineitem"])["lineitem"].select(
        "l_quantity", "l_extendedprice"
    )
    zdir, sdir = str(tmp_path / "zord"), str(tmp_path / "sorted")
    write_parquet_zordered(li, zdir, ["l_quantity", "l_extendedprice"], num_files=16)
    li.repartitionByRange(16, "l_quantity").sortWithinPartitions(
        "l_quantity"
    ).write.mode("overwrite").parquet(sdir)

    import glob

    def overlap_fraction(d, col, lo, hi):
        files = glob.glob(f"{d}/*.parquet")
        hit = 0
        for f in files:
            md = pq.ParquetFile(f).metadata
            fmin = min(md.row_group(i).column(  # noqa: B023
                [md.schema.column(j).name for j in range(md.num_columns)].index(col)
            ).statistics.min for i in range(md.num_row_groups))
            fmax = max(md.row_group(i).column(
                [md.schema.column(j).name for j in range(md.num_columns)].index(col)
            ).statistics.max for i in range(md.num_row_groups))
            if fmax >= lo and fmin <= hi:
                hit += 1
        return hit / len(files)

    # narrow band on the SECOND dimension
    z_frac = overlap_fraction(zdir, "l_extendedprice", 10_000.0, 10_500.0)
    s_frac = overlap_fraction(sdir, "l_extendedprice", 10_000.0, 10_500.0)
    assert z_frac <= 0.5, z_frac          # z-order skips most files
    assert s_frac >= 0.9, s_frac          # single-col sort can't
    # and the first dimension still clusters under z-order
    zq = overlap_fraction(zdir, "l_quantity", 10.0, 12.0)
    assert zq <= 0.75, zq


def test_quantile_bins_has_no_single_partition_exchange(spark, sf_dir):
    """The r3 verdict's one scale-killer: ntile over an unpartitioned
    Window funnels the table through Exchange SinglePartition. Both
    quantile_bins paths must avoid it — the boundary path is a 1-row
    aggregate + broadcast CASE, the exact path a range repartition +
    pid-partitioned window."""
    from big_data_analysis_spark.operators.relational import quantile_bins

    li = load_tables(spark, sf_dir, ["lineitem"])["lineitem"]
    for exact in (False, True):
        out = quantile_bins(
            li, "l_extendedprice", 10,
            order_tiebreak=["l_orderkey", "l_linenumber"], exact_ntile=exact,
        )
        plan = formatted_plan(out)
        assert "Exchange SinglePartition" not in plan, (exact, plan[:2000])
        out.unpersist()


def test_zorder_write_null_handling(spark, tmp_path):
    """ADVICE r3: an all-NULL z-order column must fail loudly (its
    min/max stats are None — it cannot cluster anything); rows with a
    NULL in one z-order column must still be written, clustered into
    the curve's first segment instead of getting a NULL Morton code."""
    import pytest

    from big_data_analysis_spark.io import read_parquet, write_parquet_zordered

    df = spark.createDataFrame(
        [(float(i), float(i % 10) if i % 7 else None, None) for i in range(100)],
        "a double, b double, dead double",
    )
    with pytest.raises(ValueError, match="entirely NULL"):
        write_parquet_zordered(df, str(tmp_path / "z1"), ["a", "dead"], num_files=4)
    out = str(tmp_path / "z2")
    write_parquet_zordered(df, out, ["a", "b"], num_files=4)
    assert read_parquet(spark, out).count() == 100


def test_round4_tpch_shapes_plan_properties(spark, sf_dir):
    """Round-4 TPC-H analogues keep their scale shapes: dims broadcast
    into the fact joins (Q7/Q8/Q9), the EXISTS adaptation plans a LEFT
    SEMI join (Q4 — one emit per order, no post-join dedup), Q6 pushes
    every predicate to the lineitem scan, and Q15's scalar-max becomes
    a broadcast, not a global window."""
    q7 = QUERIES["volume_shipping_pairs"](spark, sf_dir)
    assert broadcast_join_count(q7) >= 2, formatted_plan(q7)[:2000]
    q8 = QUERIES["market_share_region"](spark, sf_dir)
    assert broadcast_join_count(q8) >= 3, formatted_plan(q8)[:2000]
    q9 = QUERIES["product_profit_nation_year"](spark, sf_dir)
    assert broadcast_join_count(q9) >= 2, formatted_plan(q9)[:2000]

    q4 = QUERIES["late_order_priority"](spark, sf_dir)
    p4 = formatted_plan(q4)
    assert "LeftSemi" in p4, p4[:2000]
    scans4 = scan_infos(q4)
    order_scan = [s for s in scans4 if "o_orderdate" in (s["read_schema"] or [])]
    assert order_scan and any(
        "o_orderdate" in f for f in order_scan[0]["pushed_filters"]
    ), scans4

    q6 = QUERIES["forecast_revenue_delta"](spark, sf_dir)
    scans6 = scan_infos(q6)
    li_scan = [s for s in scans6 if "l_discount" in (s["read_schema"] or [])]
    assert li_scan, scans6
    pushed = " ".join(li_scan[0]["pushed_filters"])
    for col in ("l_shipdate", "l_discount", "l_quantity"):
        assert col in pushed, (col, pushed)

    q15 = QUERIES["top_supplier_quarter"](spark, sf_dir)
    p15 = formatted_plan(q15)
    assert "Window" not in p15, p15[:2000]
    assert "BroadcastNestedLoopJoin" in p15 or "BroadcastExchange" in p15


def test_dynamic_partition_pruning_from_dim_filter(spark, sf_dir):
    """§4.2 at 100 TB: when the partition filter is not a literal but
    comes from a filtered dimension join (the star-schema norm), Spark
    must still prune fact partitions AT RUNTIME (dynamic partition
    pruning) — without DPP a 'WHERE dim.attr = x' join scans every
    fact partition."""
    import shutil

    from big_data_analysis_spark.io import load_tables as lt
    from big_data_analysis_spark.io import write_parquet

    out = "/root/repo/.scratch/dpp-orders"
    shutil.rmtree(out, ignore_errors=True)
    t = lt(spark, sf_dir, ["orders", "customer"])
    o = t["orders"].withColumn("o_year", F.year("o_orderdate"))
    write_parquet(o, out, partition_by=["o_year"])

    fact = spark.read.parquet(out)
    # The qualifying years are DATA-DEPENDENT (above-median volume), so
    # Catalyst cannot constant-fold them into a static partition filter
    # — pruning must happen at runtime from the joined dim's build
    # side. Two traps this construction avoids: a literal
    # `dim_year == 1996` is constant-propagated through the equi-join
    # into STATIC pruning (no DPP needed), and a bare LIMIT dim side
    # fails Spark's hasSelectivePredicate heuristic (DPP only fires
    # when the dim side carries a real Filter).
    median_n = (
        t["orders"]
        .groupBy(F.year("o_orderdate"))
        .count()
        .agg(F.expr("percentile(count, 0.5)"))
        .head()[0]
    )
    dim = (
        t["orders"]
        .groupBy(F.year("o_orderdate").alias("dim_year"))
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") > median_n)  # above-median-volume years
    )
    joined = fact.join(dim, fact["o_year"] == dim["dim_year"]).groupBy("o_year").agg(
        F.sum("o_totalprice").alias("rev")
    )
    plan = formatted_plan(joined)
    assert "dynamicpruning" in plan.lower(), plan[:3000]


def test_chunk_text_has_no_exchange(spark, sf_dir):
    """Chunking is row-local: sequence+posexplode+substring must plan
    without ANY shuffle — the property that makes it free at 100 TB."""
    from big_data_analysis_spark.operators.text import chunk_text

    d = load_tables(spark, sf_dir, ["documents"])["documents"]
    plan = formatted_plan(chunk_text(d, "text", size=120, stride=90, keep_cols=("doc_id",)))
    assert "Exchange" not in plan, plan


def test_bm25_filters_terms_before_shuffle(spark, sf_dir):
    """The BM25 explode must be cut to the query-term set BEFORE the
    (doc, term) aggregation shuffle: the Filter on term sits below the
    first Exchange, so the shuffle carries query-term hits only, never
    the full posting list."""
    df = QUERIES["bm25_search_docs"](spark, sf_dir)
    plan = formatted_plan(df)
    first_exchange = plan.index("Exchange")
    gen = plan.index("Generate")          # the explode
    terms_filter = plan.rindex("Filter")  # deepest filter (above the explode)
    assert gen > first_exchange and terms_filter > first_exchange, plan
    # final cut is TakeOrderedAndProject, not a global window/sort-all
    assert "TakeOrderedAndProject" in plan, plan


def test_sole_late_shipper_shape(spark, sf_dir):
    """Q21 shape: top-20 must be TakeOrderedAndProject (never a global
    window), and the was_late/n_late_supp reduction must be two keyed
    hash aggregates on l_orderkey — visible as partial_max/partial
    count+sum pairs — not lineitem self-joins."""
    df = QUERIES["sole_late_shipper"](spark, sf_dir)
    plan = formatted_plan(df)
    assert "TakeOrderedAndProject" in plan, plan
    # one lineitem scan: the EXISTS/NOT-EXISTS formulation would scan
    # the fact three times
    assert plan.count("lineitem.parquet") == 1, plan


def test_psi_has_no_single_partition_exchange(spark, sf_dir):
    """PSI is two scans + broadcast-edge binning: no stage may funnel
    the table through one partition (the quantile_bins lesson)."""
    df = QUERIES["psi_drift_events"](spark, sf_dir)
    plan = formatted_plan(df)
    # The only SinglePartition stages allowed are the final 1-row PSI
    # fold and the bin-table join feeding it — both carry <= ~10 rows.
    # The per-side bin COUNTING must be a keyed hash-partitioned
    # aggregate (map-side combined), never a global funnel: assert the
    # plan hash-partitions on the bin id AND bound the SinglePartition
    # exchanges to the tiny tail stages (a regression to a global-funnel
    # bin count would add more).
    assert "hashpartitioning" in plan, plan
    assert plan.count("Exchange SinglePartition") <= 2, plan
    scans = scan_infos(df)
    assert scans and all(
        set(s["read_schema"]) <= {"ts", "value"} for s in scans
    ), scans


def test_holt_single_shuffle_on_series_key(spark, sf_dir):
    """holt_linear plans exactly one repartition on the series keys
    feeding FlatMapGroupsInPandas (plus the upstream aggregate's own
    exchange) — the recursion never funnels global."""
    df = QUERIES["holt_forecast_monthly_orders"](spark, sf_dir)
    plan = formatted_plan(df)
    assert "FlatMapGroupsInPandas" in plan, plan
    assert "Exchange SinglePartition" not in plan, plan


def test_ivfpq_encoded_store_partition_pruning(spark):
    """SCALE.md's IVF claim made observable: persist the encoded table
    partitionBy('cell') and a probe filtered to nprobe cells reads ONLY
    those cells' files (partition pruning at the source listing — the
    100 TB index never scans unprobed cells)."""
    import numpy as np

    from big_data_analysis_spark.io import load_tables, write_parquet
    from big_data_analysis_spark.operators.similarity import ivfpq_build

    emb = load_tables(spark, "/root/testdata/sf0.001", ["embeddings"])["embeddings"]
    encoded, centroids, books = ivfpq_build(emb, n_cells=4, m=8, k=16, max_iter=5)
    path = "/root/repo/.scratch/ivfpq-store"
    write_parquet(encoded, path, partition_by=["cell"])

    stored = spark.read.parquet(path)
    probe = [int(c) for c in np.argsort(
        ((np.asarray(centroids) - np.asarray(centroids[0])) ** 2).sum(1)
    )[:2]]
    probed = stored.filter(F.col("cell").isin(probe))
    # inputFiles() reflects the pre-filter file index, so pruning must
    # be read off the scan node: the cell predicate compiles to a
    # PartitionFilter (source-listing pruning), NOT a data filter.
    plan = formatted_plan(probed)
    import re as _re

    pf = _re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert pf and "cell" in pf.group(1), plan
    # ...and the cell predicate must NOT fall back to a post-scan data
    # filter (which would read every cell's files)
    pushed = _re.search(r"PushedFilters: \[([^\]]*)\]", plan)
    assert pushed is None or "cell" not in pushed.group(1), plan
    # the pruned scan really skips the other cells' rows
    probed_rows = probed.count()
    all_rows = stored.count()
    per_cell = {r["cell"]: r["n"] for r in stored.groupBy("cell").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert probed_rows == sum(per_cell[c] for c in probe)
    assert probed_rows < all_rows


def test_lsh_multiprobe_plans_hash_join(spark, sf_dir):
    """The multiprobe hamming ball must reach the corpus as an
    equi-join on the bucket id (BroadcastHashJoin over the exploded
    probe set) — an array_contains condition would plan
    BroadcastNestedLoopJoin and defeat bucket partition pruning."""
    from big_data_analysis_spark.io import load_tables
    from big_data_analysis_spark.operators.similarity import lsh_bucketed_topk

    emb = load_tables(spark, sf_dir, ["embeddings"])["embeddings"]
    qvec = [float(v) for v in emb.filter("vec_id = 0").head()["embedding"]]
    df = lsh_bucketed_topk(emb, qvec, k=10, num_planes=6, multiprobe=2)
    plan = formatted_plan(df)
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "BroadcastHashJoin" in plan, plan


def test_keep_best_dedup_no_global_window(spark, sf_dir):
    """The keep-best selection must rank inside component partitions —
    a global (unpartitioned) window would plan Exchange SinglePartition
    and serialize the whole corpus through one task."""
    df = QUERIES["dedup_keep_best_docs"](spark, sf_dir)
    plan = formatted_plan(df)
    assert "Exchange SinglePartition" not in plan, plan


def test_skew_salted_revenue_salts_the_shuffle(spark, sf_dir):
    """The salted join must shuffle on (key, salt) — visible as the
    __salt column inside hashpartitioning — so the engineered hot key
    cannot own a single shuffle partition."""
    df = QUERIES["skew_salted_revenue"](spark, sf_dir)
    plan = formatted_plan(df)
    assert "__salt" in plan, plan


def test_min_cost_supplier_shape(spark, sf_dir):
    """Q2 shape: dims broadcast (part/supplier/nation), the correlated
    MIN compiles to an aggregate + equality join (no window), top-100
    is TakeOrderedAndProject, and the fact is scanned for the
    part-supplier reduction only."""
    df = QUERIES["min_cost_supplier"](spark, sf_dir)
    plan = formatted_plan(df)
    assert "TakeOrderedAndProject" in plan, plan
    assert broadcast_join_count(df) >= 2, plan
    assert "Window" not in plan, plan


def test_filtered_ann_predicate_pushes_into_probed_cell_scan(spark):
    """VERDICT r5 #8's plan contract: on a partitionBy('cell') encoded
    store carrying metadata (keep_cols), a filtered probe's cell set
    prunes at the source listing (PartitionFilters) AND the metadata
    predicate reaches the parquet reader (PushedFilters) — the rows of
    unprobed cells are never listed, and non-matching rows of probed
    cells die in the scan, all BEFORE ADC scoring."""
    import re as _re

    from big_data_analysis_spark.io import write_parquet
    from big_data_analysis_spark.operators.similarity import ivfpq_build

    emb = spark.createDataFrame(
        [
            (i, [float(i % 7), float(i % 5), 1.0, 0.0], "en" if i % 3 == 0 else "de")
            for i in range(200)
        ],
        "vec_id long, embedding array<double>, lang string",
    )
    encoded, centroids, books = ivfpq_build(
        emb, n_cells=4, m=2, k=8, max_iter=4, keep_cols=["lang"]
    )
    path = "/root/repo/.scratch/ivfpq-filtered-store"
    write_parquet(encoded, path, partition_by=["cell"])

    stored = spark.read.parquet(path)
    probed = stored.filter(F.col("cell").isin([0, 1])).filter(F.col("lang") == "en")
    plan = formatted_plan(probed)
    pf = _re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert pf and "cell" in pf.group(1), plan
    pushed = _re.search(r"PushedFilters: \[([^\]]*)\]", plan)
    assert pushed and "lang" in pushed.group(1), plan
    assert "cell" not in (pushed.group(1) if pushed else ""), plan


def test_ivfpq_appended_store_prunes_every_branch(spark, request):
    """The base+delta union a loaded appended index plans must prune at
    the source listing in EVERY branch: a cell predicate shows up as a
    PartitionFilter on each scan (base dir and delta dir alike), never
    as a post-scan data filter — probes over a refreshed 100 TB store
    stay ∝ nprobe × cell regardless of how many deltas accumulated."""
    import re as _re
    import shutil

    from big_data_analysis_spark.operators.similarity import (
        ivfpq_append,
        ivfpq_build,
        ivfpq_load,
        ivfpq_save,
    )

    emb = spark.createDataFrame(
        [(i, [float(i % 5), float(i % 3), 1.0, 0.0]) for i in range(300)],
        "vec_id long, embedding array<double>",
    )
    base = emb.filter(F.col("vec_id") % 3 != 0)
    delta = emb.filter(F.col("vec_id") % 3 == 0)
    encoded, cents, books = ivfpq_build(base, n_cells=4, m=2, k=8, max_iter=4)
    import os

    path = f"/root/repo/.scratch/ivfpq-append-plan-{os.getpid()}"
    shutil.rmtree(path, ignore_errors=True)
    request.addfinalizer(lambda: shutil.rmtree(path, ignore_errors=True))
    ivfpq_save(encoded, cents, books, path)
    ivfpq_append(spark, path, delta)

    stored, _, _ = ivfpq_load(spark, path)
    probed = stored.filter(F.col("cell").isin([0, 1]))
    plan = formatted_plan(probed)
    pfs = _re.findall(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert len(pfs) == 2, plan  # one scan per dir: base + delta
    assert all("cell" in pf for pf in pfs), plan
    for pushed in _re.findall(r"PushedFilters: \[([^\]]*)\]", plan):
        assert "cell" not in pushed, plan


def test_heavy_hitter_tokens_plan_prunes_and_stays_arrow(spark, sf_dir):
    """The heavy-hitters certificate may scan documents only for the
    text column (everything else pruned), the operator side must be a
    MapInPandas (Arrow batch) node — never a row UDF — and nothing may
    plan a CartesianProduct (the 1-row total joins via broadcast)."""
    df = QUERIES["heavy_hitter_tokens"](spark, sf_dir)
    scans = scan_infos(df)
    assert scans, formatted_plan(df)
    for s in scans:
        assert s["read_schema"] == ["text"], scans
    plan = formatted_plan(df)
    assert "MapInPandas" in plan
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan  # row-at-a-time Python would be a bug


def test_training_shard_reader_prunes_partitions(spark, sf_dir, request):
    """A worker reading its shard slice must pay only its own shards'
    bytes: the shard filter lands in the scan's PartitionFilters (dir
    pruning at source listing), never as a data filter over the full
    export."""
    import os
    import re as _re
    import shutil

    from big_data_analysis_spark.io import (
        load_tables,
        read_training_shards,
        write_training_shards,
    )

    d = load_tables(spark, sf_dir, ["documents"])["documents"]
    path = f"/root/repo/.scratch/shards-plan-{os.getpid()}"
    shutil.rmtree(path, ignore_errors=True)
    request.addfinalizer(lambda: shutil.rmtree(path, ignore_errors=True))
    write_training_shards(d, path, 8, ["doc_id"], seed="p")
    df = read_training_shards(spark, path, shards=[1, 5])
    plan = formatted_plan(df)
    pf = _re.findall(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert pf and any("shard" in f for f in pf), plan
    for pushed in _re.findall(r"PushedFilters: \[([^\]]*)\]", plan):
        assert "shard" not in pushed, plan
    assert set(r["shard"] for r in df.select("shard").distinct().collect()) == {1, 5}


def test_quantile_state_read_no_single_partition_exchange(spark, sf_dir):
    """The histogram-state read path runs keyed windows over the tiny
    state table — an Exchange SinglePartition would mean the walk was
    planned as one global window."""
    df = QUERIES["quantile_state_read_orders"](spark, sf_dir)
    plan = formatted_plan(df)
    assert "Exchange SinglePartition" not in plan, plan


def test_cusum_windows_share_one_exchange(spark, sf_dir):
    """cusum_changepoint's two window passes (ordered prefix sum +
    unbounded constants) and the peak groupBy all key on the series
    column: exactly one hashpartitioning exchange on event_type feeds
    them, and nothing funnels through a single partition."""
    df = QUERIES["cusum_changepoint_events"](spark, sf_dir)
    plan = formatted_plan(df)
    assert "Exchange SinglePartition" not in plan, plan
    # exactly two keyed exchanges end-to-end: the daily pre-aggregate
    # on (event_type, day) and the series repartition on event_type;
    # the peak groupBy(event_type) must REUSE the window partitioning
    # (a third exchange would mean it doesn't).
    assert plan.count("hashpartitioning(") == 2, plan


def test_welch_pair_join_is_broadcast_of_tiny_aggregate(spark, sf_dir):
    """welch_ttest: raw rows are scanned once into a keyed aggregate;
    the pairwise stage is a BroadcastNestedLoop/BroadcastHashJoin of
    the per-group 1-row-per-arm frame — the events table must never be
    joined against itself."""
    df = QUERIES["welch_ab_events"](spark, sf_dir)
    plan = formatted_plan(df)
    assert "Broadcast" in plan, plan
    scans = scan_infos(df)
    # one logical source read twice is fine only if both sides are the
    # tiny aggregate; the raw-row scan must appear at most twice and
    # read only the 2 needed columns
    assert scans and all(
        set(s["read_schema"]) <= {"event_type", "value"} for s in scans
    ), scans


def test_budget_prefix_sample_windows_only_boundary_bucket(spark, sf_dir):
    """budget_prefix_sample's whole point: the fully-kept buckets pass a
    pure codegen filter in the scan stage (no Sort, no Window), and only
    the boundary bucket per group flows through exactly one cumulative
    window. A second Window/Sort — or a SinglePartition funnel — means
    the plan regressed to the per-group full sort it exists to avoid."""
    import re

    df = QUERIES["token_budget_mixture_docs"](spark, sf_dir)
    plan = formatted_plan(df)
    # formatted plans name each node twice (tree + detail section):
    # count tree nodes only
    assert len(re.findall(r"\(\d+\) Window", plan)) == 1, plan
    assert len(re.findall(r"\(\d+\) Sort", plan)) == 1, plan
    assert "Exchange SinglePartition" not in plan, plan
    # The bucket filter must run in the SCAN stage: in the formatted
    # detail section, each branch's shiftright Filter node sits
    # IMMEDIATELY above its parquet scan — no Exchange/Sort between.
    # (A vacuous "shiftright appears somewhere" check would pass even
    # if the filter migrated above the shuffle.)
    blocks = re.split(r"\n\n", plan)
    names = {}
    for b in blocks:
        m = re.match(r"\((\d+)\) (\w[\w ]*)", b.strip())
        if m:
            names[int(m.group(1))] = (m.group(2).strip(), b)
    bucket_filters = [
        i for i, (nm, b) in names.items() if nm == "Filter" and "shiftright" in b
    ]
    assert bucket_filters, plan
    for i in bucket_filters:
        child = names.get(i - 1, ("", ""))[0]
        assert child.startswith("Scan parquet"), (i, child, plan)


def test_dsir_selection_broadcasts_ratio_table_no_single_partition(spark, sf_dir):
    """DSIR's scoring join must broadcast the <= n_buckets ratio table
    (never shuffle the corpus-sized feature rows on bucket), and no
    stage may funnel through a single partition — the plan that holds
    at 100 TB."""
    df = QUERIES["dsir_selection_docs"](spark, sf_dir)
    plan = formatted_plan(df)
    assert "BroadcastHashJoin" in plan, plan
    assert "Exchange SinglePartition" not in plan, plan


def test_weighted_quantiles_grouped_single_exchange(spark, sf_dir):
    """Grouped weighted quantiles: ONE exchange on the group keys feeds
    both the cumulative and the whole-partition window AND the final
    aggregate — a second exchange or a SinglePartition funnel means the
    shared-partitioning design regressed."""
    import re

    from big_data_analysis_spark.operators import relational as rel

    li = load_tables(spark, sf_dir, ["lineitem"])["lineitem"].select(
        "l_returnflag", "l_extendedprice", "l_quantity"
    )
    df = rel.weighted_quantiles(
        li, "l_extendedprice", "l_quantity", [0.5], partition_by=["l_returnflag"]
    )
    plan = formatted_plan(df)
    assert "Exchange SinglePartition" not in plan, plan
    assert len(re.findall(r"\(\d+\) Exchange", plan)) == 1, plan


def test_rfm_segmentation_no_single_partition(spark, sf_dir):
    """Three global ntile scorings that would each funnel every
    customer through one task as bare window ntile — the exact-ntile
    tier must keep the whole segmentation free of Exchange
    SinglePartition."""
    df = QUERIES["rfm_segments_customers"](spark, sf_dir)
    plan = formatted_plan(df)
    assert "Exchange SinglePartition" not in plan, plan


def test_incremental_dedup_increments_never_cartesian(spark, sf_dir, request):
    """The three incremental-refresh tiers must plan their
    shard-vs-index joins as keyed (broadcast/shuffled hash) joins —
    never a CartesianProduct/NestedLoop — and the MinHash increment
    must scan the stored band table ONCE (one union branch per
    artifact version, one version here)."""
    import os
    import shutil

    from pyspark.sql import functions as F

    from big_data_analysis_spark.operators import dedup as dd

    d = load_tables(spark, sf_dir, ["documents"])["documents"]
    corpus = d.filter(F.col("doc_id") % 10 != 0)
    shard = d.filter(F.col("doc_id") % 10 == 0)
    base = f"/root/repo/.scratch/plan-incr-{os.getpid()}"
    request.addfinalizer(lambda: shutil.rmtree(base, ignore_errors=True))

    dd.fingerprint_index_save(corpus, "text", "doc_id", f"{base}/fp")
    exact = dd.exact_dedup_increment(
        spark, shard, "text", f"{base}/fp", append=False
    )
    dd.minhash_index_save(
        corpus, "text", "doc_id", f"{base}/mh",
        num_hashes=64, num_bands=16, shingle_n=3,
    )
    mh = dd.minhash_dedup_increment(
        spark, shard, "text", f"{base}/mh", append=False
    )
    dd.simhash_index_save(corpus, "text", "doc_id", f"{base}/sh")
    sh = dd.simhash_dedup_increment(
        spark, shard, "text", f"{base}/sh", append=False
    )
    # fourth tier: semantic increment must join shard-vs-store on the
    # cell key (hash join), never an all-pairs product
    from big_data_analysis_spark.operators import similarity as sim

    emb = load_tables(spark, sf_dir, ["embeddings"])["embeddings"]
    sub = emb.filter(F.col("vec_id") < 120).select("vec_id", "embedding")
    enc, cents, books = sim.ivfpq_build(
        sub.filter(F.col("vec_id") % 3 != 0),
        n_cells=4, m=8, k=32, max_iter=8, keep_cols=["embedding"],
    )
    sim.ivfpq_save(enc, cents, books, f"{base}/sem")
    sem = sim.semantic_dedup_increment(
        spark, f"{base}/sem", sub.filter(F.col("vec_id") % 3 == 0),
        threshold=0.2, append=False,
    )
    for name, df in (
        ("exact", exact), ("minhash", mh), ("simhash", sh), ("semantic", sem)
    ):
        plan = formatted_plan(df)
        assert "CartesianProduct" not in plan, (name, plan)
        assert "BroadcastNestedLoopJoin" not in plan, (name, plan)
    assert formatted_plan(mh).count("bands-") == 1, formatted_plan(mh)
