"""Structured Streaming over the ``events`` table (SURVEY.md §2.11).

The reference has zero streaming code — everything is batch over files.
The engine still exposes a streaming surface because the north star is a
large-scale pipeline: the SAME ``window()`` / ``dropDuplicates`` /
aggregation expressions run under ``readStream``, and ``availableNow``
gives batch-over-stream parity (each streaming op must equal its batch
twin on a static events table — tests/test_streaming.py).

Design notes for a real cluster:
- Source here is the file source (parquet dir); swap for Kafka by
  changing ``read_events_stream`` only — transformations are source-
  agnostic DataFrame code.
- Every stateful op (windowed agg, dedup) carries a watermark so state
  is bounded: without one, a 100 TB stream accretes state forever.
- ``availableNow`` processes the backlog in bounded batches and stops —
  the canonical backfill/replay mode; the same query object restarts in
  continuous mode untouched.
"""

from __future__ import annotations

import os
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from big_data_analysis_spark.io import read_parquet

def _scratch_dir() -> str:
    """Checkpoint root (gitignored). On a cluster this would be a durable
    object-store path — checkpoints are what make restarts exactly-once."""
    base = os.path.join("/root/repo", ".scratch", "streaming")
    os.makedirs(base, exist_ok=True)
    return base


def read_events_stream(
    spark: SparkSession, sf_dir: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    """File-source stream over the events parquet. The batch reader
    supplies the schema (incl. the TIMESTAMP(NANOS) -> micros fix from
    io.read_parquet); the stream applies the same projection so batch
    and stream rows are identical."""
    path = os.path.join(sf_dir, "events.parquet")
    batch = read_parquet(spark, path)
    raw_schema = spark.read.parquet(path).schema
    # The file stream source requires a DIRECTORY; the driver ships
    # events as a single file. Stage a symlink dir (no data copy) —
    # on a real cluster the source is a directory/Kafka topic anyway.
    link_dir = os.path.join(_scratch_dir(), f"events-src-{os.path.basename(os.path.normpath(sf_dir))}")
    os.makedirs(link_dir, exist_ok=True)
    link = os.path.join(link_dir, "events.parquet")
    if not os.path.exists(link):
        os.symlink(os.path.abspath(path), link)
    reader = spark.readStream.schema(raw_schema)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(link_dir)
    # Re-apply the nanos->timestamp projection: schema() gave us the raw
    # long column; select batch's column expressions by name.
    for name, dtype in ((f.name, f.dataType) for f in batch.schema.fields):
        if dict((f.name, f.dataType) for f in raw_schema.fields)[name] != dtype:
            stream = stream.withColumn(name, F.timestamp_micros(F.expr(f"`{name}` div 1000")))
    return stream


def stream_stream_attribution(
    clicks: DataFrame,
    purchases: DataFrame,
    window: str = "30 minutes",
    watermark: str = "1 hour",
) -> DataFrame:
    """§2.11 stream-stream JOIN with a time-range condition: each click
    pairs with the same user's purchases arriving within ``window``
    after it (the streaming twin of timeseries.interval_join's
    attribution query — same rows, proven by the shared SQL oracle).

    Both sides carry watermarks AND the join condition bounds each
    side's event time relative to the other — the two requirements that
    let Spark evict join state instead of buffering both streams
    forever. Append output: a pair emits once both inputs' watermarks
    pass it. Works identically on batch inputs (tests drive parity)."""
    c = clicks.select("user_id", F.col("ts").alias("click_ts"))
    p = purchases.select(
        F.col("user_id").alias("p_user_id"),
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("purchase_ts"),
    )
    if clicks.isStreaming:
        c = c.withWatermark("click_ts", watermark)
    if purchases.isStreaming:
        p = p.withWatermark("purchase_ts", watermark)
    cond = (
        (F.col("user_id") == F.col("p_user_id"))
        & (F.col("click_ts") <= F.col("purchase_ts"))
        & (F.col("click_ts") >= F.col("purchase_ts") - F.expr(f"INTERVAL {window}"))
    )
    return c.join(p, cond, "inner").select(
        "purchase_id", "user_id", "purchase_ts", "click_ts"
    )


def enrich_with_dim(
    stream: DataFrame,
    dim: DataFrame,
    stream_key: str,
    dim_key: str,
    how: str = "left",
) -> DataFrame:
    """§2.11 stream-STATIC join: enrich each streaming row with columns
    from a batch dimension table (the lookup every production stream
    does before aggregating). Stateless — no watermark requirement, no
    join state: the dim is broadcast and each micro-batch hash-joins
    against it; Spark re-reads the dim per batch, so a slowly-changing
    dim picks up updates between batches. Left join keeps stream rows
    with no dim match (route them to an UNKNOWN bucket downstream
    rather than dropping data)."""
    return stream.join(
        F.broadcast(dim), F.col(stream_key) == F.col(dim_key), how
    )


#: Wire schema of an events record on a Kafka topic (JSON value).
EVENTS_JSON_SCHEMA = (
    "event_id bigint, ts timestamp, user_id bigint, "
    "event_type string, value double, props string"
)


def parse_kafka_events(raw: DataFrame) -> DataFrame:
    """Project Kafka's wire columns (binary key/value + metadata) to the
    events schema: JSON-decode ``value``, keep the broker metadata that
    matters for replay/debug. Pure column expressions, so it applies
    identically to a real ``format('kafka')`` stream and to a mocked
    batch DataFrame with the same wire schema (how the unit test drives
    it — the Kafka connector jar is not in this container)."""
    parsed = raw.select(
        F.from_json(F.col("value").cast("string"), EVENTS_JSON_SCHEMA).alias("e"),
        F.col("topic"),
        F.col("partition").alias("kafka_partition"),
        F.col("offset").alias("kafka_offset"),
    )
    return parsed.select("e.*", "topic", "kafka_partition", "kafka_offset")


def read_events_kafka(
    spark: SparkSession,
    bootstrap_servers: str,
    topic: str,
    starting_offsets: str = "earliest",
    max_offsets_per_trigger: int | None = None,
) -> DataFrame:
    """Kafka source for the events stream: same downstream operators as
    the file source (transformations are source-agnostic). Requires the
    spark-sql-kafka connector on the cluster classpath — probed up
    front so a missing jar fails with a clear message instead of an
    opaque ClassNotFoundException at start(). ``maxOffsetsPerTrigger``
    is the backpressure knob (rows per micro-batch across partitions)."""
    try:
        spark._jvm.java.lang.Class.forName(
            "org.apache.spark.sql.kafka010.KafkaSourceProvider"
        )
    except Exception as exc:
        raise RuntimeError(
            "Kafka connector not on the classpath — add the "
            "spark-sql-kafka-0-10 package to use read_events_kafka"
        ) from exc
    reader = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("subscribe", topic)
        .option("startingOffsets", starting_offsets)
    )
    if max_offsets_per_trigger:
        reader = reader.option("maxOffsetsPerTrigger", max_offsets_per_trigger)
    return parse_kafka_events(reader.load())


def tumbling_event_counts(
    events: DataFrame, duration: str = "1 day", watermark: str = "1 hour"
) -> DataFrame:
    """Tumbling windowed count+sum per event_type. Works identically on
    a batch or streaming DataFrame; under streaming, the watermark
    bounds state and drops data later than ``watermark``."""
    src = events.withWatermark("ts", watermark) if events.isStreaming else events
    return (
        src.groupBy(F.window(F.col("ts"), duration).alias("win"), F.col("event_type"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
        .select(
            F.col("win.start").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def sliding_event_counts(
    events: DataFrame, duration: str = "2 days", slide: str = "1 day", watermark: str = "1 hour"
) -> DataFrame:
    """Sliding windowed count per event_type: each event lands in
    duration/slide windows."""
    src = events.withWatermark("ts", watermark) if events.isStreaming else events
    return (
        src.groupBy(F.window(F.col("ts"), duration, slide).alias("win"), F.col("event_type"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(F.col("win.start").alias("window_start"), "event_type", "n_events")
    )


def session_event_counts(
    events: DataFrame,
    gap: str = "30 minutes",
    watermark: str = "1 hour",
    key: str = "user_id",
) -> DataFrame:
    """Session-window aggregate: a session extends while events arrive
    within ``gap`` of the last one; window end = last event + gap.
    ``session_window`` runs identically in batch and streaming (with
    watermark-bounded state when streaming) — the dynamic-window twin of
    the lag/cumsum sessionize in operators.timeseries."""
    src = events.withWatermark("ts", watermark) if events.isStreaming else events
    return (
        src.groupBy(F.session_window(F.col("ts"), gap).alias("win"), F.col(key))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col(key),
            F.col("win.start").alias("session_start"),
            F.col("win.end").alias("session_end"),
            "n_events",
        )
    )


def streaming_dedup(
    events: DataFrame, watermark: str = "1 hour", within_watermark: bool = False
) -> DataFrame:
    """Streaming exact dedup on event_id; the batch twin is a plain
    dropDuplicates.

    ``within_watermark=False``: classic dropDuplicates — exact across
    the whole stream, but state grows with distinct ids forever.
    ``within_watermark=True``: dropDuplicatesWithinWatermark — state is
    evicted past the watermark, so memory is bounded at 100 TB/day
    streams; duplicates arriving farther apart than the watermark are
    NOT caught (the standard trade, correct when producers only ever
    retry within the delay window)."""
    if events.isStreaming:
        wm = events.withWatermark("ts", watermark)
        if within_watermark:
            return wm.dropDuplicatesWithinWatermark(["event_id"])
        return wm.dropDuplicates(["event_id"])
    return events.dropDuplicates(["event_id"])


def run_available_now(
    result: DataFrame,
    query_name: str | None = None,
    timeout_sec: int = 300,
    output_mode: str | None = None,
) -> DataFrame:
    """Execute a streaming DataFrame to completion with the availableNow
    trigger into an in-memory table; returns the materialized result as
    a batch DataFrame. This is the batch-parity harness: process the
    whole backlog now, in bounded micro-batches, then stop."""
    name = query_name or f"q_{uuid.uuid4().hex[:12]}"
    spark = result.sparkSession
    # Each shuffle partition materializes its own state store (dir +
    # snapshot files per micro-batch). For the bounded availableNow
    # harness, 8 state partitions cut fixed setup ~4x; a continuous
    # production stream sizes this to its key cardinality instead.
    prev_parts = spark.conf.get("spark.sql.shuffle.partitions")
    # Update (not complete) mode for aggregates: complete mode disables
    # watermark semantics entirely (state never evicted, late rows never
    # dropped) — unusable at scale. With the memory sink, update mode
    # appends each batch's changed rows, so readers take the LAST row
    # per key. Session-window aggregates reject update — pass
    # output_mode='complete' (or 'append' for finalized-only) there.
    out_mode = output_mode or ("update" if _has_aggregation(result) else "append")
    # Memory-sink queries cannot recover from an existing checkpoint, so
    # every run gets a fresh checkpoint dir even under a reused name —
    # each invocation reprocesses the source from scratch (that IS the
    # availableNow backfill contract).
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    try:
        q = (
            result.writeStream.format("memory")
            .queryName(name)
            .outputMode(out_mode)
            .option(
                "checkpointLocation", os.path.join(_scratch_dir(), f"{name}-{uuid.uuid4().hex[:8]}")
            )
            .trigger(availableNow=True)
            .start()
        )
        finished = q.awaitTermination(timeout_sec)
        if not finished:
            # Reading the memory table now would silently return partial
            # results (and leak a running query) — stop and fail loud.
            q.stop()
            raise TimeoutError(
                f"availableNow query {name!r} still running after {timeout_sec}s"
            )
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev_parts)
    return spark.table(name)


def _has_aggregation(df: DataFrame) -> bool:
    """Streaming aggregates into the memory sink run in UPDATE output
    mode here (complete mode would disable watermark semantics — see
    run_available_now); append only works for stateless/dedup queries,
    so detect aggregation from the analyzed plan to pick the default."""
    plan = df._jdf.queryExecution().analyzed().toString()
    return "Aggregate" in plan


def write_stream_parquet_idempotent(
    result: DataFrame,
    path: str,
    query_name: str | None = None,
    timeout_sec: int = 300,
) -> None:
    """File sink with exactly-once REPLAY semantics via foreachBatch:
    each micro-batch overwrites its own ``batch_id=<n>`` partition
    directory, so a batch replayed after a failure rewrites the same
    files instead of appending duplicates — idempotence comes from the
    deterministic (batch_id -> directory) mapping, the pattern for any
    non-transactional sink (the built-in parquet sink is append-only
    and relies on its manifest; this works for ANY rewriteable target).
    Runs availableNow to completion and raises on timeout like
    run_available_now."""
    name = query_name or f"sink_{uuid.uuid4().hex[:12]}"

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        batch_df.write.mode("overwrite").parquet(
            os.path.join(path, f"batch_id={batch_id}")
        )

    q = (
        result.writeStream.foreachBatch(write_batch)
        .queryName(name)
        .option(
            "checkpointLocation",
            os.path.join(_scratch_dir(), f"{name}-{uuid.uuid4().hex[:8]}"),
        )
        .trigger(availableNow=True)
        .start()
    )
    if not q.awaitTermination(timeout_sec):
        q.stop()
        raise TimeoutError(f"foreachBatch sink {name!r} still running after {timeout_sec}s")


def write_stream_upsert(
    stream: DataFrame,
    path: str,
    keys: list[str],
    order_col: str,
    query_name: str | None = None,
    timeout_sec: int = 300,
) -> None:
    """Streaming SCD1 materialized view: foreachBatch merges every
    micro-batch into the keyed snapshot at ``path`` via
    ``relational.merge_upsert`` (highest ``order_col`` per key wins) and
    swaps the new snapshot in with directory renames — read-merge-write,
    never append. Because merge_upsert is idempotent (re-merging an
    already-applied delta is a no-op — pinned by a property test), a
    batch REPLAYED after a crash converges to the same snapshot: the
    foreachBatch at-least-once contract becomes effectively-once here.
    On a real lake this exact loop is `MERGE INTO` on a table format;
    the rename swap is the plain-directory equivalent sized for local
    checkpoints and tests."""
    import shutil

    from big_data_analysis_spark.operators.relational import merge_upsert

    name = query_name or f"upsert_{uuid.uuid4().hex[:12]}"

    def merge_batch(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        if os.path.exists(os.path.join(path, "_SUCCESS")):
            merged = merge_upsert(
                spark.read.parquet(path), batch_df, keys, order_col
            )
        else:
            # First batch: still run the merge so in-batch duplicates
            # resolve by the same keep-highest rule.
            merged = merge_upsert(
                batch_df.limit(0), batch_df, keys, order_col
            )
        staging = f"{path}.staging"
        # Materialize BEFORE touching the live dir (the plan lazily
        # reads it), then swap via renames.
        merged.write.mode("overwrite").parquet(staging)
        old = f"{path}.old"
        if os.path.exists(path):
            os.rename(path, old)
        os.rename(staging, path)
        shutil.rmtree(old, ignore_errors=True)

    q = (
        stream.writeStream.foreachBatch(merge_batch)
        .queryName(name)
        .option(
            "checkpointLocation",
            os.path.join(_scratch_dir(), f"{name}-{uuid.uuid4().hex[:8]}"),
        )
        .trigger(availableNow=True)
        .start()
    )
    if not q.awaitTermination(timeout_sec):
        q.stop()
        raise TimeoutError(f"upsert sink {name!r} still running after {timeout_sec}s")


def tumbling_distinct_users(
    events: DataFrame, duration: str = "1 day", watermark: str = "1 hour"
) -> DataFrame:
    """Distinct users per tumbling window. ``count_distinct`` is
    unsupported inside a streaming aggregation (distinct state is
    unmergeable across micro-batches), so this uses the canonical
    two-stage rewrite: dropDuplicates on (user, window) — each user
    counted once per window, state keyed by the pair and evicted by the
    watermark — then an ordinary windowed count over the survivors.
    Chained stateful operators (dedup -> windowed agg) are legal here
    because both stages key on the same event-time window. The batch
    twin is the same two stages minus the watermark, equal to
    count(DISTINCT user_id) per window — which is exactly what the SQL
    oracle checks."""
    src = events.withWatermark("ts", watermark) if events.isStreaming else events
    dedup = src.select(
        F.window(F.col("ts"), duration).alias("win"), F.col("user_id")
    ).dropDuplicates(["win", "user_id"])
    return (
        dedup.groupBy("win")
        .agg(F.count(F.lit(1)).alias("n_users"))
        .select(F.col("win.start").alias("window_start"), "n_users")
    )


def tumbling_binned_counts(
    events: DataFrame,
    bin_expr,
    duration: str = "1 day",
    watermark: str = "1 hour",
    ts_col: str = "ts",
    bin_col: str = "bin",
) -> DataFrame:
    """Tumbling windowed histogram: per (window, bin) row counts, where
    ``bin_expr`` is any deterministic Column (e.g. dq.bin_by_edges
    against broadcast reference quantiles). The building block of a
    CONTINUOUS drift monitor: state per trigger is bounded by
    windows x bins — constants — regardless of stream volume, and the
    watermark evicts closed windows. Works identically on a batch
    frame (parity harness)."""
    src = events.withWatermark(ts_col, watermark) if events.isStreaming else events
    return (
        src.groupBy(
            F.window(F.col(ts_col), duration).alias("win"),
            bin_expr.alias(bin_col),
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("win.start").alias("window_start"), bin_col, "n")
    )
