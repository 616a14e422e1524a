"""SparkSession factory with scale-oriented defaults.

The reference scripts are eager single-node pandas (SURVEY.md §3.4); here
every knob is chosen for a multi-executor cluster while still running
correctly on ``local[N]``:

- AQE on: runtime coalescing of shuffle partitions, skew-join splitting,
  broadcast-join demotion/promotion at runtime.
- Arrow on: every pandas_udf / toPandas crosses JVM<->Python in columnar
  batches instead of pickled rows.
- UTC session timezone: deterministic timestamp semantics against the
  DuckDB oracle.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_spark(
    app_name: str = "big_data_analysis_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession with engine defaults.

    On a real cluster ``master`` comes from spark-submit; locally we
    default to ``local[$SPARK_GRAFT_CPUS]``.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    builder = (
        SparkSession.builder.appName(app_name)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config(
            "spark.sql.shuffle.partitions",
            str(shuffle_partitions or DEFAULT_SHUFFLE_PARTITIONS),
        )
        # Testdata timestamps are written by pyarrow as micros; keep
        # reads/writes symmetric.
        .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
        # Some sources (events.parquet) carry TIMESTAMP(NANOS) which the
        # parquet reader rejects; read as long and let io.read_parquet
        # restore micros-timestamp semantics from the footer schema.
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
        # Spark 4 whitelists charsets in encode/decode; the reference's
        # sources are GBK/GB18030 (SURVEY.md §2.1 S2/S3) — restore the
        # full Java charset set for the binary-decode CSV path.
        .config("spark.sql.legacy.javaCharsets", "true")
        # Python DataSource connectors (sources.py) implement
        # pushFilters; Spark 4 gates that behind this flag.
        .config("spark.sql.python.filterPushdown.enabled", "true")
        # decode() on malformed bytes: REPLACE (U+FFFD) instead of error —
        # the charset-fallback reader tests for the replacement char to
        # pick the right charset per file (reference 红楼梦作者分析.py:31-42
        # try/except charset chain).
        .config("spark.sql.legacy.codingErrorAction", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        # Streaming state at scale: the default HDFS-backed store keeps
        # every key IN EXECUTOR MEMORY (maintenance thread snapshots to
        # the checkpoint dir) — fine for the test suites' small keyed
        # state, an OOM machine at 100 TB where a dedup/session state
        # can hold billions of keys. RocksDB spills state to local SSD
        # with changelog checkpointing, bounding heap by block cache
        # instead of |state|. The provider ships in every stock Spark 4
        # distribution; all streaming parity/replay suites
        # (tests/test_streaming.py) run under it.
        .config(
            "spark.sql.streaming.stateStore.providerClass",
            "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
        )
        .config(
            "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled",
            "true",
        )
    )
    if master is None and not os.environ.get("SPARK_MASTER"):
        builder = builder.master(f"local[{cpus}]")
    elif master is not None:
        builder = builder.master(master)
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
