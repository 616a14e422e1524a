"""Streaming parity tests (SURVEY.md §5.2 item 5): every streaming op
run via availableNow must equal its batch twin on the static events
table, and the watermark must actually drop late data across
micro-batches."""

from __future__ import annotations

import os
import shutil

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from big_data_analysis_spark.io import load_tables
from big_data_analysis_spark.streaming import (
    read_events_stream,
    run_available_now,
    session_event_counts,
    sliding_event_counts,
    streaming_dedup,
    tumbling_event_counts,
)

SCRATCH = "/root/repo/.scratch/streaming-tests"


@pytest.fixture(scope="module", autouse=True)
def clean_scratch():
    shutil.rmtree(SCRATCH, ignore_errors=True)
    os.makedirs(SCRATCH, exist_ok=True)
    yield
    shutil.rmtree(SCRATCH, ignore_errors=True)


def _sorted_rows(df, cols):
    return sorted(tuple(r) for r in df.select(*cols).collect())


def test_tumbling_parity(spark, sf_dir):
    events = load_tables(spark, sf_dir, ["events"])["events"]
    batch = tumbling_event_counts(events)
    stream = tumbling_event_counts(read_events_stream(spark, sf_dir))
    result = run_available_now(stream, "tumbling_parity")
    cols = ["window_start", "event_type", "n_events", "sum_value"]
    assert _sorted_rows(result, cols) == _sorted_rows(batch, cols)


def test_sliding_parity_and_multiplicity(spark, sf_dir):
    events = load_tables(spark, sf_dir, ["events"])["events"]
    batch = sliding_event_counts(events)
    stream = sliding_event_counts(read_events_stream(spark, sf_dir))
    result = run_available_now(stream, "sliding_parity")
    cols = ["window_start", "event_type", "n_events"]
    assert _sorted_rows(result, cols) == _sorted_rows(batch, cols)
    # Sliding windows (2d window, 1d slide) hold each event twice.
    n_events = events.count()
    assert result.agg(F.sum("n_events")).head()[0] == 2 * n_events


def test_session_window_parity(spark, sf_dir):
    events = load_tables(spark, sf_dir, ["events"])["events"]
    batch = session_event_counts(events)
    stream = session_event_counts(read_events_stream(spark, sf_dir))
    # Session windows support append/complete only; complete emits every
    # session after the availableNow backlog drains -> full parity.
    result = run_available_now(stream, "session_parity", output_mode="complete")
    cols = ["user_id", "session_start", "session_end", "n_events"]
    assert _sorted_rows(result, cols) == _sorted_rows(batch, cols)


def test_streaming_dedup_parity(spark, sf_dir):
    events = load_tables(spark, sf_dir, ["events"])["events"]
    stream = streaming_dedup(read_events_stream(spark, sf_dir))
    result = run_available_now(stream, "dedup_parity")
    assert result.count() == events.select("event_id").distinct().count()


def test_streaming_dedup_within_watermark(spark, sf_dir):
    """Bounded-state variant: on a single availableNow batch (all data
    within the watermark) it equals the exact dedup."""
    events = load_tables(spark, sf_dir, ["events"])["events"]
    stream = streaming_dedup(read_events_stream(spark, sf_dir), within_watermark=True)
    result = run_available_now(stream, "dedup_wwm_parity")
    assert result.count() == events.select("event_id").distinct().count()


def test_stateful_running_totals_across_batches(spark, sf_dir):
    """applyInPandasWithState carries per-key state across micro-batches:
    with maxFilesPerTrigger forcing >=1 batch, the LAST emitted row per
    user must equal the batch groupBy totals."""
    from big_data_analysis_spark.streaming.stateful import running_user_totals

    events = load_tables(spark, sf_dir, ["events"])["events"]
    expected = {
        r["user_id"]: (r["n"], round(r["s"], 6))
        for r in events.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("s"))
        .collect()
    }
    stream = running_user_totals(read_events_stream(spark, sf_dir))
    result = run_available_now(stream, "running_totals", output_mode="update")
    # Update-mode memory sink holds per-batch upserts; the max n_events
    # row per user is the final state.
    rows = result.collect()
    final = {}
    for r in rows:
        cur = final.get(r["user_id"])
        if cur is None or r["n_events"] > cur[0]:
            final[r["user_id"]] = (r["n_events"], round(r["total_value"], 6))
    assert final == expected


def test_stateful_state_carries_between_two_batches(spark):
    """Explicit two-batch check: a user in both batches shows a
    cumulative (not per-batch) total in the second emission."""
    import time

    from big_data_analysis_spark.streaming.stateful import running_user_totals

    src_dir = os.path.join(SCRATCH, "stateful-src")
    b1 = spark.createDataFrame(
        [(1, "2024-01-01 00:00:00", 7, 1.0), (2, "2024-01-01 00:01:00", 8, 2.0)],
        ["event_id", "ts", "user_id", "value"],
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    b2 = spark.createDataFrame(
        [(3, "2024-01-01 00:02:00", 7, 10.0)],
        ["event_id", "ts", "user_id", "value"],
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    b1.coalesce(1).write.parquet(os.path.join(src_dir, "b1"))
    time.sleep(1.1)
    b2.coalesce(1).write.parquet(os.path.join(src_dir, "b2"))

    stream = (
        spark.readStream.schema(b1.schema).option("maxFilesPerTrigger", 1).parquet(src_dir + "/*")
    )
    result = run_available_now(
        running_user_totals(stream), "stateful_2batch", output_mode="update"
    )
    rows = sorted(
        ((r["user_id"], r["n_events"], r["total_value"]) for r in result.collect())
    )
    # user 7: batch1 emission (1, 1.0) then cumulative batch2 (2, 11.0)
    assert (7, 1, 1.0) in rows and (7, 2, 11.0) in rows, rows
    assert (8, 1, 2.0) in rows


def test_watermark_advances_and_bounds_state(spark):
    """Two micro-batches through a watermarked aggregate. Asserts the
    contract Spark actually guarantees (Structured Streaming guide,
    'Semantic Guarantees of Aggregation with Watermarking'): the
    watermark advances from completed batches, state for expired windows
    is evicted, and in-threshold data keeps updating its window. A
    beyond-watermark drop is only BEST-EFFORT — after eviction a very
    late row may re-create its window — so the test asserts watermark
    progression + correct in-threshold aggregation, not a drop."""
    src_dir = os.path.join(SCRATCH, "late-src")
    # File order is lexicographic for the file source: b1 then b2.
    b1 = spark.createDataFrame(
        [(1, "2024-01-10 00:00:00", "click", 1.0), (2, "2024-01-10 06:00:00", "click", 1.0)],
        ["event_id", "ts", "event_type", "value"],
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    b2 = spark.createDataFrame(
        [(3, "2024-01-01 00:00:00", "click", 1.0), (4, "2024-01-10 07:00:00", "click", 1.0)],
        ["event_id", "ts", "event_type", "value"],
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    import time

    b1.coalesce(1).write.parquet(os.path.join(src_dir, "batch=1"))
    time.sleep(1.1)  # file source orders batches by modification time
    b2.coalesce(1).write.parquet(os.path.join(src_dir, "batch=2"))

    schema = b1.schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src_dir + "/*")
    )
    agg = tumbling_event_counts(stream, duration="1 day", watermark="1 hour")
    q = (
        agg.writeStream.format("memory")
        .queryName("wm_progress")
        .outputMode("update")
        .option("checkpointLocation", os.path.join(SCRATCH, "wm_progress-cp"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    watermarks = [
        p["eventTime"]["watermark"]
        for p in q.recentProgress
        if "watermark" in p.get("eventTime", {})
    ]
    # Batch 0 runs at the epoch watermark; after it commits the
    # watermark jumps to (max event time - 1h) = Jan-10 05:00.
    assert watermarks[0].startswith("1970-01-01"), watermarks
    assert any(w.startswith("2024-01-10T05:00") for w in watermarks), watermarks
    rows = spark.table("wm_progress").collect()
    # In-threshold event 4 (07:00, ahead of the watermark) updated the
    # Jan-10 window: the upsert history shows count 2 (batch 1) then 3.
    jan10 = [r["n_events"] for r in rows if r["window_start"].isoformat().startswith("2024-01-10")]
    assert sorted(jan10) == [2, 3], rows


def test_kafka_projection_on_mocked_wire_batch(spark):
    """parse_kafka_events is pure column logic, so drive it with a batch
    DataFrame shaped like Kafka's wire schema (the connector jar is not
    in this container): JSON values decode to the events schema and
    broker metadata survives."""
    import json

    from big_data_analysis_spark.streaming import parse_kafka_events

    recs = [
        {"event_id": 1, "ts": "2024-01-01T00:00:05", "user_id": 7,
         "event_type": "click", "value": 1.5, "props": "{\"k\":1}"},
        {"event_id": 2, "ts": "2024-01-01T00:00:06", "user_id": 8,
         "event_type": "view", "value": None, "props": None},
    ]
    wire = spark.createDataFrame(
        [
            (None, json.dumps(r).encode(), "events", 0, i)
            for i, r in enumerate(recs)
        ],
        "key binary, value binary, topic string, partition int, offset long",
    )
    out = parse_kafka_events(wire).orderBy("event_id").collect()
    assert [r["event_id"] for r in out] == [1, 2]
    assert out[0]["user_id"] == 7 and out[0]["value"] == 1.5
    assert out[0]["event_type"] == "click"
    assert out[0]["ts"] is not None and out[0]["ts"].second == 5
    assert out[1]["value"] is None
    assert out[0]["topic"] == "events" and out[0]["kafka_offset"] == 0
    # Malformed JSON -> null-structured row, not a task failure.
    bad = spark.createDataFrame(
        [(None, b"not json", "events", 0, 0)],
        "key binary, value binary, topic string, partition int, offset long",
    )
    row = parse_kafka_events(bad).head()
    assert row["event_id"] is None


def test_read_events_kafka_missing_connector_raises(spark):
    """Without the kafka connector jar the constructor must fail with an
    actionable message, not an opaque ClassNotFoundException later."""
    from big_data_analysis_spark.streaming import read_events_kafka

    with pytest.raises(RuntimeError, match="spark-sql-kafka"):
        read_events_kafka(spark, "localhost:9092", "events")


def test_stream_stream_join_matches_batch(spark, sf_dir):
    """Stream-stream interval join == the batch interval_join twin on
    the same static events — two physical strategies, one result."""
    from big_data_analysis_spark.io import load_tables
    from big_data_analysis_spark.operators import timeseries as ts
    from big_data_analysis_spark.streaming import read_events_stream, run_available_now
    from big_data_analysis_spark.streaming.streams import stream_stream_attribution

    c = read_events_stream(spark, sf_dir).filter(F.col("event_type") == "click")
    p = read_events_stream(spark, sf_dir).filter(F.col("event_type") == "purchase")
    streamed = run_available_now(stream_stream_attribution(c, p))
    got = {
        (r["purchase_id"], r["click_ts"]) for r in streamed.collect()
    }

    ev = load_tables(spark, sf_dir, ["events"])["events"]
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        (F.col("ts") - F.expr("INTERVAL 30 MINUTES")).alias("w_start"),
        F.col("ts").alias("w_end"),
    )
    clicks = ev.filter(F.col("event_type") == "click").select("user_id", "ts")
    batch = ts.interval_join(
        clicks, purchases, "ts", "w_start", "w_end", on=["user_id"], bucket_seconds=1800
    )
    expected = {(r["purchase_id"], r["ts"]) for r in batch.collect()}
    assert got == expected and expected


def test_hash_sample_stable_under_repartition(spark, sf_dir):
    """hash_sample picks the same rows whatever the physical layout."""
    from big_data_analysis_spark.io import load_tables
    from big_data_analysis_spark.operators import relational as rel

    d = load_tables(spark, sf_dir, ["documents"])["documents"]
    a = {r["doc_id"] for r in rel.hash_sample(d, ["doc_id"], 0.2, seed="s").select("doc_id").collect()}
    b = {r["doc_id"] for r in rel.hash_sample(d.repartition(17), ["doc_id"], 0.2, seed="s").select("doc_id").collect()}
    assert a == b and a
    # Different seed -> a (near-certainly) different slice.
    c2 = {r["doc_id"] for r in rel.hash_sample(d, ["doc_id"], 0.2, seed="other").select("doc_id").collect()}
    assert a != c2


def test_foreach_batch_sink_idempotent(spark, sf_dir):
    """foreachBatch parquet sink: rows written == stream rows, and
    re-writing the same batch id (a replay) leaves the same rows — no
    duplicates."""
    import glob
    import shutil

    from big_data_analysis_spark.streaming import read_events_stream, streaming_dedup
    from big_data_analysis_spark.streaming.streams import (
        write_stream_parquet_idempotent,
    )

    out = "/root/repo/.scratch/fb-sink"
    shutil.rmtree(out, ignore_errors=True)
    stream = streaming_dedup(read_events_stream(spark, sf_dir))
    write_stream_parquet_idempotent(stream, out)
    back = spark.read.parquet(*glob.glob(out + "/batch_id=*"))
    n1 = back.count()
    expected = (
        spark.read.parquet(sf_dir + "/events.parquet")
        .select("event_id").distinct().count()
    )
    assert n1 == expected

    # Replay batch 0 by hand: overwrite-mode must not duplicate.
    batch_dir = sorted(glob.glob(out + "/batch_id=*"))[0]
    df0 = spark.read.parquet(batch_dir)
    rows0 = df0.count()
    staging = out + "-replay-staging"
    df0.write.mode("overwrite").parquet(staging)
    spark.read.parquet(staging).write.mode("overwrite").parquet(batch_dir)
    shutil.rmtree(staging, ignore_errors=True)
    assert spark.read.parquet(batch_dir).count() == rows0
    assert spark.read.parquet(*glob.glob(out + "/batch_id=*")).count() == n1
    shutil.rmtree(out, ignore_errors=True)


def test_stream_upsert_snapshot_matches_batch_merge(spark):
    """Streaming SCD1 sink over two micro-batches: the final snapshot
    must equal the batch merge of all data (latest version per key),
    and re-running the whole stream over the same source (fresh
    checkpoint, existing snapshot) must not change it — replay
    convergence."""
    import time

    from big_data_analysis_spark.streaming.streams import write_stream_upsert

    src_dir = os.path.join(SCRATCH, "upsert-src")
    snap = os.path.join(SCRATCH, "upsert-snap")
    b1 = spark.createDataFrame(
        [(1, "a", 1), (2, "b", 1)], "k int, v string, version int"
    )
    b2 = spark.createDataFrame(
        [(2, "B", 2), (3, "c", 2)], "k int, v string, version int"
    )
    b1.coalesce(1).write.mode("overwrite").parquet(os.path.join(src_dir, "b1"))
    time.sleep(1.1)
    b2.coalesce(1).write.mode("overwrite").parquet(os.path.join(src_dir, "b2"))

    def run():
        stream = (
            spark.readStream.schema(b1.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src_dir + "/*")
        )
        write_stream_upsert(stream, snap, ["k"], "version")

    run()
    expect = {1: ("a", 1), 2: ("B", 2), 3: ("c", 2)}
    got = {
        r["k"]: (r["v"], r["version"]) for r in spark.read.parquet(snap).collect()
    }
    assert got == expect
    run()  # full replay into the existing snapshot
    got2 = {
        r["k"]: (r["v"], r["version"]) for r in spark.read.parquet(snap).collect()
    }
    assert got2 == expect


def test_streaming_distinct_users_two_batches(spark):
    """Cross-batch distinct: the same user reappearing in a later
    micro-batch of the SAME window must not bump the count (dedup state
    carries), while a new user must. Update-mode memory sink emits one
    row per window per changing batch — the last emission (= max, the
    count is monotone) is the answer."""
    import time

    from big_data_analysis_spark.streaming.streams import (
        run_available_now,
        tumbling_distinct_users,
    )

    src_dir = os.path.join(SCRATCH, "distinct-src")
    b1 = spark.createDataFrame(
        [(1, "2024-01-01 01:00:00", 7, 1.0), (2, "2024-01-01 02:00:00", 8, 1.0)],
        ["event_id", "ts", "user_id", "value"],
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    b2 = spark.createDataFrame(
        [(3, "2024-01-01 03:00:00", 7, 1.0),   # duplicate user, same day
         (4, "2024-01-01 04:00:00", 9, 1.0),   # new user, same day
         (5, "2024-01-02 01:00:00", 7, 1.0)],  # next day: counts again
        ["event_id", "ts", "user_id", "value"],
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    b1.coalesce(1).write.parquet(os.path.join(src_dir, "b1"))
    time.sleep(1.1)
    b2.coalesce(1).write.parquet(os.path.join(src_dir, "b2"))

    stream = (
        spark.readStream.schema(b1.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src_dir + "/*")
    )
    result = run_available_now(
        tumbling_distinct_users(stream), "distinct_2batch"
    )
    import collections
    final = collections.defaultdict(int)
    for r in result.collect():
        final[r["window_start"].date().isoformat()] = max(
            final[r["window_start"].date().isoformat()], r["n_users"]
        )
    assert final == {"2024-01-01": 3, "2024-01-02": 1}, dict(final)


def test_running_user_stats_matches_batch(spark, sf_dir):
    """running_user_stats (transformWithState when the env has
    protobuf, applyInPandasWithState fallback otherwise): the last
    emitted row per user after draining equals the batch
    count/sum/max aggregate exactly."""
    from big_data_analysis_spark.io import load_tables
    from big_data_analysis_spark.streaming.stateful import running_user_stats
    from big_data_analysis_spark.streaming.streams import (
        read_events_stream,
        run_available_now,
    )

    out = run_available_now(
        running_user_stats(read_events_stream(spark, sf_dir)), output_mode="update"
    )
    # update-mode memory sink: take the LAST row per user
    w = Window.partitionBy("user_id").orderBy(F.monotonically_increasing_id().desc())
    last = (
        out.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
    got = {r["user_id"]: r for r in last.collect()}
    ev = load_tables(spark, sf_dir, ["events"])["events"]
    expect = {
        r["user_id"]: r
        for r in ev.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.coalesce(F.col("value"), F.lit(0.0))).alias("total_value"),
            F.max("value").alias("max_value"),
        )
        .collect()
    }
    assert got.keys() == expect.keys()
    for u in expect:
        assert got[u]["n_events"] == expect[u]["n_events"]
        assert abs(got[u]["total_value"] - expect[u]["total_value"]) < 1e-6
        assert got[u]["max_value"] == expect[u]["max_value"]


def test_streaming_anomalies_match_batch_expanding_window(spark, sf_dir):
    """The stream's strictly-prior Welford z-scores must equal a batch
    expanding window with frame (unboundedPreceding, -1) — same mean,
    same sample std, same flags — for every event with enough history."""
    from big_data_analysis_spark.io import load_tables
    from big_data_analysis_spark.streaming.stateful import streaming_anomalies
    from big_data_analysis_spark.streaming.streams import (
        read_events_stream,
        run_available_now,
    )

    out = run_available_now(
        streaming_anomalies(read_events_stream(spark, sf_dir)), output_mode="append"
    )
    got = {
        (r["user_id"], r["ts"]): r
        for r in out.collect()
    }
    ev = load_tables(spark, sf_dir, ["events"])["events"].select(
        "user_id", "ts", F.coalesce("value", F.lit(0.0)).alias("value")
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    batch = ev.select(
        "user_id",
        "ts",
        "value",
        F.count("value").over(w).alias("n"),
        F.avg("value").over(w).alias("mean"),
        F.stddev_samp("value").over(w).alias("std"),
    ).collect()
    checked = 0
    for r in batch:
        g = got[(r["user_id"], r["ts"])]
        if r["n"] >= 5 and r["std"] and r["std"] > 0:
            expect_z = (r["value"] - r["mean"]) / r["std"]
            assert g["zscore"] is not None and abs(g["zscore"] - expect_z) < 1e-6
            assert g["is_anomaly"] == (abs(expect_z) > 3.0)
            checked += 1
    assert checked > 500  # the parity actually exercised history


def test_tumbling_binned_counts_stream_batch_parity(spark, sf_dir):
    """The drift monitor's histogram primitive: the streaming
    availableNow run must produce exactly the batch groupBy's
    (window, bin) counts."""
    from pyspark.sql import functions as F

    from big_data_analysis_spark.io import load_tables
    from big_data_analysis_spark.operators import dq
    from big_data_analysis_spark.streaming import (
        read_events_stream,
        run_available_now,
        tumbling_binned_counts,
    )

    ev = load_tables(spark, sf_dir, ["events"])["events"]
    edges = dq.quantile_edges(ev, "value", 5)
    bin_expr = dq.bin_by_edges(F.col("value"), edges)

    batch = {
        (r["window_start"], r["bin"]): r["n"]
        for r in tumbling_binned_counts(
            ev.filter(F.col("value").isNotNull()), bin_expr
        ).collect()
    }
    stream = read_events_stream(spark, sf_dir).filter(F.col("value").isNotNull())
    streamed = {
        (r["window_start"], r["bin"]): r["n"]
        for r in run_available_now(
            tumbling_binned_counts(stream, bin_expr)
        ).collect()
    }
    assert streamed == batch and len(batch) > 0


def test_tumbling_binned_counts_state_stays_bounded(spark):
    """The drift monitor's RUN-FOREVER guarantee (VERDICT r4 #7): over
    three watermark-advancing micro-batches (one day apart), the state
    store's row count must stay bounded at active_windows x bins — the
    watermark evicts closed day-windows, so a monitor over an unbounded
    stream holds a constant few rows of state, never |stream|. Pinned
    via StreamingQueryProgress.stateOperators.numRowsTotal, guarding
    the bounded-state claim behind the RocksDB configuration."""
    import time

    from big_data_analysis_spark.operators import dq
    from big_data_analysis_spark.streaming import tumbling_binned_counts

    src_dir = os.path.join(SCRATCH, "binned-state-src")
    edges = [0.25, 0.5, 0.75]  # 4 bins
    days = ["2024-02-01", "2024-02-02", "2024-02-03"]
    for i, day in enumerate(days):
        rows = [
            (i * 100 + j, f"{day} 12:00:00", "click", (j % 10) / 10.0)
            for j in range(40)
        ]
        b = spark.createDataFrame(
            rows, ["event_id", "ts", "event_type", "value"]
        ).withColumn("ts", F.col("ts").cast("timestamp"))
        b.coalesce(1).write.parquet(os.path.join(src_dir, f"batch={i}"))
        time.sleep(1.1)  # file source orders batches by modification time

    schema = "event_id long, ts timestamp, event_type string, value double"
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src_dir + "/*")
    )
    agg = tumbling_binned_counts(
        stream, dq.bin_by_edges(F.col("value"), edges), watermark="1 hour"
    )
    q = (
        agg.writeStream.format("memory")
        .queryName("binned_state")
        .outputMode("update")
        .option("checkpointLocation", os.path.join(SCRATCH, "binned-state-cp"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    totals = [
        p["stateOperators"][0]["numRowsTotal"]
        for p in q.recentProgress
        if p.get("stateOperators")
    ]
    assert totals, "no state operator progress recorded"
    # 4 bins; at most the current day's window + one not-yet-evicted
    # predecessor may be live at any commit -> never > 2 windows x 4.
    bound = 2 * (len(edges) + 1)
    assert max(totals) <= bound, (totals, bound)
    # eviction actually happened: with 3 day-windows streamed, an
    # unbounded store would hold 3 x 4 rows at the end
    assert totals[-1] <= bound, totals


def test_stream_refresh_never_rereads_committed_corpus(spark, monkeypatch):
    """VERDICT r7 #1 done-criterion: the corpus refresh's per-batch
    work must NOT re-read committed part files — the persisted fp
    index is the cross-batch dedup state. read_manifest_jsonl_stream
    is the ONLY reader of committed parts, so it must be called exactly
    once (the final digest read-back), not once per micro-batch as the
    r7 shape did."""
    from big_data_analysis_spark import sources as src
    from big_data_analysis_spark.queries import QUERIES

    real = src.read_manifest_jsonl_stream
    calls = []

    def counting(spark_, path, schema):
        calls.append(path)
        return real(spark_, path, schema)

    monkeypatch.setattr(src, "read_manifest_jsonl_stream", counting)
    row = QUERIES["streaming_corpus_refresh"](
        spark, "/root/testdata/sf0.001"
    ).head()
    assert len(calls) == 1, f"committed corpus read {len(calls)} times"
    assert row["stream_equals_batch"] is True
    assert row["n_batch_manifests"] == 4


def test_stream_refresh_survives_midstream_crash_replay(spark, request):
    """The nastiest exactly-once interleaving: a micro-batch crashes
    BETWEEN its two persistent effects — the fp-index append (already
    committed, version_tag'd) and the sink manifest publish (never
    happened). On restart from the checkpoint the engine replays the
    batch; the tagged fp version must short-circuit the increment to
    the ORIGINAL survivors (a naive anti-join would see the batch's own
    fingerprints and publish an EMPTY batch), the sink must publish
    exactly once, and the drained corpus must equal the batch twin
    row-for-row."""
    import glob
    import json

    from pyspark.errors.exceptions.captured import StreamingQueryException

    from big_data_analysis_spark.operators import dedup as dd
    from big_data_analysis_spark.queries import (
        _stream_refresh_batch_body,
        _stream_refresh_batch_twin,
    )
    from big_data_analysis_spark.sources import (
        read_manifest_jsonl_stream,
        register_manifest_jsonl,
        register_synthdocs,
    )

    register_synthdocs(spark)
    register_manifest_jsonl(spark)
    base = os.path.join(SCRATCH, f"refresh-crash-{os.getpid()}")
    out, ckpt, fp_path = f"{base}/out", f"{base}/ckpt", f"{base}/fpidx"
    request.addfinalizer(lambda: shutil.rmtree(base, ignore_errors=True))
    shutil.rmtree(base, ignore_errors=True)
    dd.fingerprint_index_init(spark, fp_path, id_col="doc_id", id_type="bigint")

    gen_opts = {"rows": 400, "partitions": 8}
    bench = (
        spark.read.format("synthdocs").options(**gen_opts).load()
        .filter(F.col("doc_id") % 10 == 0).select("doc_id", "text")
    )
    bench_grams = dd.gram_index(bench, "text", "doc_id", 5).localCheckpoint(
        eager=True
    )

    def crash_on_2(bid):
        if bid == 2:
            raise RuntimeError("injected crash after fp append, before sink")

    def start(fault):
        def body(bdf, bid):
            _stream_refresh_batch_body(
                spark, bdf, bid, out, fp_path, bench_grams, fault_hook=fault
            )

        stream = (
            spark.readStream.format("synthdocs")
            .options(**gen_opts).option("rows_per_batch", 100).load()
        )
        return (
            stream.writeStream.foreachBatch(body)
            .option("checkpointLocation", ckpt).start()
        )

    sq = start(crash_on_2)
    with pytest.raises(StreamingQueryException, match="injected crash"):
        sq.processAllAvailable()
        sq.awaitTermination()
    sq.stop()
    # the crash point: batch 2's fp version committed, its sink
    # manifest absent
    man_mid = json.load(open(os.path.join(fp_path, "_INDEX.json")))
    assert "fps-tag-batch-2" in man_mid["fp_dirs"]
    assert not os.path.exists(os.path.join(out, "_BATCH_2.json"))

    sq2 = start(None)  # restart from the checkpoint: batch 2 replays
    try:
        sq2.processAllAvailable()
    finally:
        sq2.stop()

    assert len(glob.glob(os.path.join(out, "_BATCH_*.json"))) == 4
    man_end = json.load(open(os.path.join(fp_path, "_INDEX.json")))
    assert man_end["fp_dirs"].count("fps-tag-batch-2") == 1  # no re-append
    back_schema = "doc_id bigint, source string, text string, n_tok bigint"
    back = read_manifest_jsonl_stream(spark, out, back_schema)
    twin = _stream_refresh_batch_twin(
        spark.read.format("synthdocs").options(**gen_opts).load(), bench_grams
    )
    cols = ["doc_id", "source", "text", "n_tok"]
    assert _sorted_rows(back, cols) == _sorted_rows(twin, cols)
    # batch 2 genuinely contributed rows (the replay published data,
    # not an empty manifest)
    b2 = json.load(open(os.path.join(out, "_BATCH_2.json")))
    assert b2["total_rows"] > 0


def test_stream_image_refresh_decodes_each_image_once(spark, monkeypatch):
    """The image refresh's no-re-decode property: the persisted dHash
    store is the cross-batch state, so image_dhash (the only decode
    path) runs exactly once per micro-batch and hashes ONLY that
    batch's images — a shape that re-decoded the archive each batch
    would hash strictly more rows than the corpus holds."""
    import json

    from big_data_analysis_spark.operators import multimodal as mm
    from big_data_analysis_spark.queries import _stream_image_batch_body
    from big_data_analysis_spark.sources import (
        register_manifest_jsonl,
        register_synthdocs,
    )

    register_synthdocs(spark)
    register_manifest_jsonl(spark)
    base = os.path.join(SCRATCH, f"img-once-{os.getpid()}")
    out, ckpt, dh = f"{base}/out", f"{base}/ckpt", f"{base}/dh"
    shutil.rmtree(base, ignore_errors=True)
    mm.dhash_index_init(spark, dh, id_col="id", id_type="bigint")

    real = mm.image_dhash
    hashed_rows = []

    def counting(df, content_col="content", id_col="doc_id", hash_size=8):
        hashed_rows.append(df.count())
        return real(df, content_col, id_col, hash_size)

    monkeypatch.setattr(mm, "image_dhash", counting)

    def body(bdf, bid):
        _stream_image_batch_body(spark, bdf, bid, out, dh)

    stream = (
        spark.readStream.format("synthdocs")
        .option("rows", 120).option("partitions", 4)
        .option("rows_per_batch", 40).load()
    )
    sq = (
        stream.writeStream.foreachBatch(body)
        .option("checkpointLocation", ckpt).start()
    )
    try:
        sq.processAllAvailable()
    finally:
        sq.stop()
    assert hashed_rows == [40, 40, 40], hashed_rows
    man = json.load(open(os.path.join(dh, "_INDEX.json")))
    assert sorted(man["tags"]) == ["batch-0", "batch-1", "batch-2"]
    shutil.rmtree(base, ignore_errors=True)


def test_stream_image_refresh_crash_replay(spark, request):
    """Crash BETWEEN the image store's tagged append and the sink
    publish: on restart the replayed batch must re-emit its ORIGINAL
    verdicts (the version_tag replay path reconstructs the pre-append
    index state — a naive rerun would pair every image with its own
    stored fingerprint and publish an all-duplicate batch), append
    nothing twice, and the drained verdict table must equal the
    one-DAG batch twin row-for-row."""
    import glob
    import json

    from pyspark.errors.exceptions.captured import StreamingQueryException

    from big_data_analysis_spark.operators import multimodal as mm
    from big_data_analysis_spark.queries import (
        _stream_image_batch_body,
        _stream_image_batch_twin,
    )
    from big_data_analysis_spark.sources import (
        read_manifest_jsonl_stream,
        register_manifest_jsonl,
        register_synthdocs,
    )

    register_synthdocs(spark)
    register_manifest_jsonl(spark)
    base = os.path.join(SCRATCH, f"img-crash-{os.getpid()}")
    out, ckpt, dh = f"{base}/out", f"{base}/ckpt", f"{base}/dh"
    request.addfinalizer(lambda: shutil.rmtree(base, ignore_errors=True))
    shutil.rmtree(base, ignore_errors=True)
    mm.dhash_index_init(spark, dh, id_col="id", id_type="bigint")

    def crash_on_1(bid):
        if bid == 1:
            raise RuntimeError("injected crash after dhash append")

    def start(fault):
        def body(bdf, bid):
            _stream_image_batch_body(
                spark, bdf, bid, out, dh, fault_hook=fault
            )

        stream = (
            spark.readStream.format("synthdocs")
            .option("rows", 120).option("partitions", 4)
            .option("rows_per_batch", 40).load()
        )
        return (
            stream.writeStream.foreachBatch(body)
            .option("checkpointLocation", ckpt).start()
        )

    sq = start(crash_on_1)
    with pytest.raises(StreamingQueryException, match="injected crash"):
        sq.processAllAvailable()
        sq.awaitTermination()
    sq.stop()
    # crash point: batch 1's tagged dhash version committed, sink absent
    man_mid = json.load(open(os.path.join(dh, "_INDEX.json")))
    assert "dhs-tag-batch-1" in man_mid["dh_dirs"]
    assert not os.path.exists(os.path.join(out, "_BATCH_1.json"))

    sq2 = start(None)  # restart: batch 1 replays
    try:
        sq2.processAllAvailable()
    finally:
        sq2.stop()

    assert len(glob.glob(os.path.join(out, "_BATCH_*.json"))) == 3
    man_end = json.load(open(os.path.join(dh, "_INDEX.json")))
    assert man_end["dh_dirs"].count("dhs-tag-batch-1") == 1  # no re-append
    assert man_end["tags"].count("batch-1") == 1
    idx, _ = mm.dhash_index_load(spark, dh)
    assert idx.count() == 120  # every image fingerprinted exactly once
    back = read_manifest_jsonl_stream(
        spark, out,
        "doc_id bigint, dhash bigint, level bigint, "
        "n_prior_dups bigint, kept boolean",
    )
    twin = _stream_image_batch_twin(
        spark, spark.range(120).select(F.col("id").alias("doc_id"))
    )
    cols = ["doc_id", "dhash", "level", "n_prior_dups", "kept"]
    assert _sorted_rows(back, cols) == _sorted_rows(twin, cols)
    # the replayed batch genuinely published verdicts
    b1 = json.load(open(os.path.join(out, "_BATCH_1.json")))
    assert b1["total_rows"] == 40


def test_stream_audio_refresh_crash_replay(spark, request):
    """The audio twin of the image crash test: crash BETWEEN the audio
    store's tagged append and the sink publish — on restart the
    replayed batch must re-emit its ORIGINAL verdicts (the version_tag
    replay path reconstructs the pre-append index state; a naive rerun
    would pair every clip with its own stored fingerprint and publish
    an all-duplicate batch), append nothing twice, and the drained
    verdict table must equal the one-DAG batch twin row-for-row."""
    import glob
    import json

    from pyspark.errors.exceptions.captured import StreamingQueryException

    from big_data_analysis_spark.operators import multimodal as mm
    from big_data_analysis_spark.queries import (
        _stream_audio_batch_body,
        _stream_audio_batch_twin,
    )
    from big_data_analysis_spark.sources import (
        read_manifest_jsonl_stream,
        register_manifest_jsonl,
        register_synthdocs,
    )

    register_synthdocs(spark)
    register_manifest_jsonl(spark)
    base = os.path.join(SCRATCH, f"afp-crash-{os.getpid()}")
    out, ckpt, afp = f"{base}/out", f"{base}/ckpt", f"{base}/afp"
    request.addfinalizer(lambda: shutil.rmtree(base, ignore_errors=True))
    shutil.rmtree(base, ignore_errors=True)
    mm.audio_fp_index_init(spark, afp, id_col="id", id_type="bigint")

    def crash_on_1(bid):
        if bid == 1:
            raise RuntimeError("injected crash after afp append")

    def start(fault):
        def body(bdf, bid):
            _stream_audio_batch_body(
                spark, bdf, bid, out, afp, fault_hook=fault
            )

        stream = (
            spark.readStream.format("synthdocs")
            .option("rows", 120).option("partitions", 4)
            .option("rows_per_batch", 40).load()
        )
        return (
            stream.writeStream.foreachBatch(body)
            .option("checkpointLocation", ckpt).start()
        )

    sq = start(crash_on_1)
    with pytest.raises(StreamingQueryException, match="injected crash"):
        sq.processAllAvailable()
        sq.awaitTermination()
    sq.stop()
    # crash point: batch 1's tagged afp version committed, sink absent
    man_mid = json.load(open(os.path.join(afp, "_INDEX.json")))
    assert "afp-tag-batch-1" in man_mid["afp_dirs"]
    assert not os.path.exists(os.path.join(out, "_BATCH_1.json"))

    sq2 = start(None)  # restart: batch 1 replays
    try:
        sq2.processAllAvailable()
    finally:
        sq2.stop()

    assert len(glob.glob(os.path.join(out, "_BATCH_*.json"))) == 3
    man_end = json.load(open(os.path.join(afp, "_INDEX.json")))
    assert man_end["afp_dirs"].count("afp-tag-batch-1") == 1  # no re-append
    assert man_end["tags"].count("batch-1") == 1
    idx, _ = mm.audio_fp_index_load(spark, afp)
    assert idx.count() == 120  # every clip fingerprinted exactly once
    back = read_manifest_jsonl_stream(
        spark, out,
        "doc_id bigint, afp bigint, level bigint, "
        "n_prior_dups bigint, kept boolean",
    )
    twin = _stream_audio_batch_twin(
        spark, spark.range(120).select(F.col("id").alias("doc_id"))
    )
    cols = ["doc_id", "afp", "level", "n_prior_dups", "kept"]
    assert _sorted_rows(back, cols) == _sorted_rows(twin, cols)
    # the replayed batch genuinely published verdicts
    b1 = json.load(open(os.path.join(out, "_BATCH_1.json")))
    assert b1["total_rows"] == 40


def test_stream_cascade_refresh_crash_replay(spark, request):
    """Crash BETWEEN the cascade's four store appends and the sink
    publish: on restart the replayed batch must re-emit its ORIGINAL
    per-doc verdicts — every tier's version_tag ledger fires
    independently, so no store double-appends and the exact tier does
    not suddenly catch the batch's own fingerprints — and the drained
    verdict table must equal the one-call cascade twin row-for-row."""
    import glob
    import json

    from pyspark.errors.exceptions.captured import StreamingQueryException

    from big_data_analysis_spark.operators import dedup as dd
    from big_data_analysis_spark.queries import (
        _CASC_STREAM_ROWS,
        _casc_stream_seed_stores,
        _casc_stream_text,
        _stream_cascade_batch_body,
    )
    from big_data_analysis_spark.sources import (
        read_manifest_jsonl_stream,
        register_manifest_jsonl,
        register_synthdocs,
    )

    register_synthdocs(spark)
    register_manifest_jsonl(spark)
    base = os.path.join(SCRATCH, f"casc-crash-{os.getpid()}")
    out, ckpt = f"{base}/out", f"{base}/ckpt"
    request.addfinalizer(lambda: shutil.rmtree(base, ignore_errors=True))
    shutil.rmtree(base, ignore_errors=True)
    paths = _casc_stream_seed_stores(spark, base)

    def crash_on_1(bid):
        if bid == 1:
            raise RuntimeError("injected crash after cascade appends")

    def start(fault):
        def body(bdf, bid):
            _stream_cascade_batch_body(
                spark, bdf, bid, out, paths, fault_hook=fault
            )

        stream = (
            spark.readStream.format("synthdocs")
            .option("rows", _CASC_STREAM_ROWS).option("partitions", 4)
            .option("rows_per_batch", _CASC_STREAM_ROWS // 3).load()
        )
        return (
            stream.writeStream.foreachBatch(body)
            .option("checkpointLocation", ckpt).start()
        )

    sq = start(crash_on_1)
    with pytest.raises(StreamingQueryException, match="injected crash"):
        sq.processAllAvailable()
        sq.awaitTermination()
    sq.stop()
    # crash point: batch 1 committed in every store's ledger, sink absent
    for p, dirs_key in zip(paths, ("fp_dirs", "mh_dirs", "sh_dirs", "cg_dirs")):
        man = json.load(open(os.path.join(p, "_INDEX.json")))
        assert "batch-1" in man.get("tags", ()), (p, dirs_key)
    assert not os.path.exists(os.path.join(out, "_BATCH_1.json"))

    sq2 = start(None)  # restart: batch 1 replays through every tier
    try:
        sq2.processAllAvailable()
    finally:
        sq2.stop()

    assert len(glob.glob(os.path.join(out, "_BATCH_*.json"))) == 3
    for p in paths:
        man = json.load(open(os.path.join(p, "_INDEX.json")))
        assert man["tags"].count("batch-1") == 1, p  # no double-append
    # fp store: seed 240 + one fresh fp per non-exact streamed doc
    fp_rows = dd.fingerprint_index_load(spark, paths[0])[0].count()
    assert fp_rows == _CASC_STREAM_ROWS + (_CASC_STREAM_ROWS // 4) * 3

    back = read_manifest_jsonl_stream(
        spark, out, "doc_id bigint, tier string, kept boolean"
    )
    twin_paths = _casc_stream_seed_stores(spark, f"{base}/twin")
    all_docs = spark.range(_CASC_STREAM_ROWS).select(
        F.col("id").alias("doc_id")
    ).withColumn("text", _casc_stream_text("doc_id"))
    twin = dd.dedup_cascade_increment(
        spark, all_docs, "text", twin_paths[0], twin_paths[1],
        twin_paths[2], ct_path=twin_paths[3],
    )
    cols = ["doc_id", "tier", "kept"]
    assert _sorted_rows(back, cols) == _sorted_rows(twin, cols)
    b1 = json.load(open(os.path.join(out, "_BATCH_1.json")))
    assert b1["total_rows"] == _CASC_STREAM_ROWS // 3


def test_stream_video_refresh_crash_replay(spark, request):
    """The video twin of the image/audio crash tests: crash BETWEEN the
    video store's tagged append and the sink publish — on restart the
    replayed batch must re-emit its ORIGINAL verdicts (the version_tag
    replay path reconstructs the pre-append index state; a naive rerun
    would pair every clip with its own stored fingerprint and publish
    an all-duplicate batch), append nothing twice, and the drained
    verdict table must equal the one-DAG batch twin row-for-row."""
    import glob
    import json

    from pyspark.errors.exceptions.captured import StreamingQueryException

    from big_data_analysis_spark.operators import video as vd
    from big_data_analysis_spark.queries import (
        _stream_video_batch_body,
        _stream_video_batch_twin,
    )
    from big_data_analysis_spark.sources import (
        read_manifest_jsonl_stream,
        register_manifest_jsonl,
        register_synthdocs,
    )

    register_synthdocs(spark)
    register_manifest_jsonl(spark)
    base = os.path.join(SCRATCH, f"vfp-crash-{os.getpid()}")
    out, ckpt, vfp = f"{base}/out", f"{base}/ckpt", f"{base}/vfp"
    request.addfinalizer(lambda: shutil.rmtree(base, ignore_errors=True))
    shutil.rmtree(base, ignore_errors=True)
    vd.video_fp_index_init(spark, vfp, id_col="id", id_type="bigint")

    def crash_on_1(bid):
        if bid == 1:
            raise RuntimeError("injected crash after vfp append")

    def start(fault):
        def body(bdf, bid):
            _stream_video_batch_body(
                spark, bdf, bid, out, vfp, fault_hook=fault
            )

        stream = (
            spark.readStream.format("synthdocs")
            .option("rows", 120).option("partitions", 4)
            .option("rows_per_batch", 40).load()
        )
        return (
            stream.writeStream.foreachBatch(body)
            .option("checkpointLocation", ckpt).start()
        )

    sq = start(crash_on_1)
    with pytest.raises(StreamingQueryException, match="injected crash"):
        sq.processAllAvailable()
        sq.awaitTermination()
    sq.stop()
    # crash point: batch 1's tagged vfp version committed, sink absent
    man_mid = json.load(open(os.path.join(vfp, "_INDEX.json")))
    assert "vfp-tag-batch-1" in man_mid["vfp_dirs"]
    assert not os.path.exists(os.path.join(out, "_BATCH_1.json"))

    sq2 = start(None)  # restart: batch 1 replays
    try:
        sq2.processAllAvailable()
    finally:
        sq2.stop()

    assert len(glob.glob(os.path.join(out, "_BATCH_*.json"))) == 3
    man_end = json.load(open(os.path.join(vfp, "_INDEX.json")))
    assert man_end["vfp_dirs"].count("vfp-tag-batch-1") == 1  # no re-append
    assert man_end["tags"].count("batch-1") == 1
    idx, _ = vd.video_fp_index_load(spark, vfp)
    assert idx.count() == 120  # every clip fingerprinted exactly once
    back = read_manifest_jsonl_stream(
        spark, out,
        "doc_id bigint, vfp bigint, level bigint, "
        "n_prior_dups bigint, kept boolean",
    )
    twin = _stream_video_batch_twin(
        spark, spark.range(120).select(F.col("id").alias("doc_id"))
    )
    cols = ["doc_id", "vfp", "level", "n_prior_dups", "kept"]
    assert _sorted_rows(back, cols) == _sorted_rows(twin, cols)
    # the replayed batch genuinely published verdicts
    b1 = json.load(open(os.path.join(out, "_BATCH_1.json")))
    assert b1["total_rows"] == 40


def test_stream_media_refresh_crash_replay(spark, request):
    """Crash BETWEEN the mixed-modality cascade's SEVEN store appends
    and the sink publish: on restart the replayed batch must re-emit
    its ORIGINAL verdicts for every kind — each store's version_tag
    ledger fires independently (text fp/mh/sh/ct AND the three media
    fingerprint stores), so nothing double-appends and the drained
    verdict table equals the one-call mixed cascade twin row-for-row."""
    import glob
    import json

    from pyspark.errors.exceptions.captured import StreamingQueryException

    from big_data_analysis_spark.operators import dedup as dd
    from big_data_analysis_spark.queries import (
        _media_stream_increment,
        _media_stream_seed_stores,
        _media_stream_shard,
        _stream_media_batch_body,
    )
    from big_data_analysis_spark.sources import (
        read_manifest_jsonl_stream,
        register_manifest_jsonl,
        register_synthdocs,
    )

    register_synthdocs(spark)
    register_manifest_jsonl(spark)
    base = os.path.join(SCRATCH, f"media-crash-{os.getpid()}")
    out, ckpt = f"{base}/out", f"{base}/ckpt"
    request.addfinalizer(lambda: shutil.rmtree(base, ignore_errors=True))
    shutil.rmtree(base, ignore_errors=True)
    paths = _media_stream_seed_stores(spark, base)
    twin_paths = {n: f"{base}/twin/{n}" for n in paths}
    for n in paths:
        shutil.copytree(paths[n], twin_paths[n])

    def crash_on_1(bid):
        if bid == 1:
            raise RuntimeError("injected crash after media-cascade appends")

    def start(fault):
        def body(bdf, bid):
            _stream_media_batch_body(
                spark, bdf, bid, out, paths, fault_hook=fault
            )

        stream = (
            spark.readStream.format("synthdocs")
            .option("rows", 240).option("partitions", 4)
            .option("rows_per_batch", 80).load()
        )
        return (
            stream.writeStream.foreachBatch(body)
            .option("checkpointLocation", ckpt).start()
        )

    sq = start(crash_on_1)
    with pytest.raises(StreamingQueryException, match="injected crash"):
        sq.processAllAvailable()
        sq.awaitTermination()
    sq.stop()
    # crash point: batch 1 committed in EVERY store's ledger, sink absent
    for n in paths:
        man = json.load(open(os.path.join(paths[n], "_INDEX.json")))
        assert "batch-1" in man.get("tags", ()), n
    assert not os.path.exists(os.path.join(out, "_BATCH_1.json"))

    sq2 = start(None)  # restart: batch 1 replays through every store
    try:
        sq2.processAllAvailable()
    finally:
        sq2.stop()

    assert len(glob.glob(os.path.join(out, "_BATCH_*.json"))) == 3
    for n in paths:
        man = json.load(open(os.path.join(paths[n], "_INDEX.json")))
        assert man["tags"].count("batch-1") == 1, n  # no double-append
    # fp store: seed 60 + one fresh fp per non-exact streamed text doc
    fp_rows = dd.fingerprint_index_load(spark, paths["fp"])[0].count()
    assert fp_rows == 60 + 45

    back = read_manifest_jsonl_stream(
        spark, out, "doc_id bigint, kind string, tier string, kept boolean"
    )
    twin = _media_stream_increment(
        spark,
        _media_stream_shard(
            spark, spark.range(240).select(F.col("id").alias("doc_id"))
        ),
        twin_paths,
    )
    cols = ["doc_id", "kind", "tier", "kept"]
    assert _sorted_rows(back, cols) == _sorted_rows(twin, cols)
    b1 = json.load(open(os.path.join(out, "_BATCH_1.json")))
    assert b1["total_rows"] == 80
