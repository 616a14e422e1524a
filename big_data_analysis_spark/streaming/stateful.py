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
