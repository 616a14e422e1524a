"""Time-series / window operators (SURVEY.md §2.6 W1-W7).

The reference's COVID feature factory (新冠疫情分析.py:52-76) builds every
feature with implicit-row-order pandas ops (shift / rolling / pct_change /
diff). Spark DataFrames are unordered multisets, so each op is re-expressed
over an explicit (partition_by, order_by) window — the single most
important semantic translation in the port (SURVEY.md §1.3).

Leakage discipline: the reference hand-shifts every rolling feature so
only past rows contribute (新冠疫情分析.py:62-74). Here that is structural:
trailing frames end at -1, so leakage cannot regress silently.

Scale note: ``partition_by=()`` reproduces the reference's single global
series but funnels rows through one partition. At 100 TB always partition
(e.g. per user_id / product) — the API makes the keys explicit so the
scaled call is the same call.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window, WindowSpec
from pyspark.sql import functions as F


def _window(partition_by: Sequence[str], order_by: Sequence[str | Column]) -> WindowSpec:
    if partition_by:
        return Window.partitionBy(*partition_by).orderBy(*order_by)
    return Window.orderBy(*order_by)


def add_lag_features(
    df: DataFrame,
    cols: Sequence[str],
    lags: Sequence[int],
    order_by: Sequence[str | Column],
    partition_by: Sequence[str] = (),
) -> DataFrame:
    """W1: lag features (pandas ``shift(n)``, reference 新冠疫情分析.py:57-60
    builds lags {1,3,7} x 3 series). One window, all lags in one pass."""
    w = _window(partition_by, order_by)
    return df.withColumns({f"{c}_lag{n}": F.lag(F.col(c), n).over(w) for c in cols for n in lags})


def add_trailing_mean(
    df: DataFrame,
    cols: Sequence[str],
    windows: Sequence[int],
    order_by: Sequence[str | Column],
    partition_by: Sequence[str] = (),
) -> DataFrame:
    """W2: trailing moving average EXCLUDING the current row — the
    reference's ``rolling(n, min_periods=1).mean().shift(1)``
    (新冠疫情分析.py:63-66) folds into frame (-n, -1); partial windows
    match ``min_periods=1`` because avg ignores missing frame rows."""
    w = _window(partition_by, order_by)
    return df.withColumns(
        {
            f"{c}_ma{n}": F.avg(F.col(c)).over(w.rowsBetween(-n, -1))
            for c in cols
            for n in windows
        }
    )


def add_pct_change(
    df: DataFrame,
    cols: Sequence[str],
    order_by: Sequence[str | Column],
    partition_by: Sequence[str] = (),
    shift: int = 1,
) -> DataFrame:
    """W3: leakage-shifted percent change — the reference's
    ``pct_change().shift(1)`` (新冠疫情分析.py:69-70):
    (lag(c, shift) - lag(c, shift+1)) / lag(c, shift+1)."""
    w = _window(partition_by, order_by)
    out = {}
    for c in cols:
        prev = F.lag(F.col(c), shift).over(w)
        prev2 = F.lag(F.col(c), shift + 1).over(w)
        # NULL (not error/inf) on zero base — ANSI-safe, and the
        # reference zeroes out non-finite features anyway (P8).
        out[f"{c}_pct"] = (prev - prev2) / F.nullif(prev2, F.lit(0))
    return df.withColumns(out)


def add_diff(
    df: DataFrame,
    cols: Sequence[str],
    periods: Sequence[int],
    order_by: Sequence[str | Column],
    partition_by: Sequence[str] = (),
    shift: int = 1,
) -> DataFrame:
    """W4: leakage-shifted difference — the reference's
    ``diff(n).shift(1)`` (新冠疫情分析.py:73-74):
    lag(c, shift) - lag(c, shift+n)."""
    w = _window(partition_by, order_by)
    return df.withColumns(
        {
            f"{c}_diff{n}": F.lag(F.col(c), shift).over(w) - F.lag(F.col(c), shift + n).over(w)
            for c in cols
            for n in periods
        }
    )


def time_ordered_split(
    df: DataFrame, order_col: str, train_rows: int, test_rows: int, partition_by: Sequence[str] = ()
) -> tuple[DataFrame, DataFrame]:
    """W6: positional train/test split (reference 新冠疫情分析.py:93-97
    first 191 rows train, next 9 test) over an explicit order."""
    w = _window(partition_by, [order_col])
    ranked = df.withColumn("__rn", F.row_number().over(w))
    train = ranked.filter(F.col("__rn") <= train_rows).drop("__rn")
    test = ranked.filter(
        (F.col("__rn") > train_rows) & (F.col("__rn") <= train_rows + test_rows)
    ).drop("__rn")
    return train, test


def add_rank_features(
    df: DataFrame,
    order_by: Sequence[str | Column],
    partition_by: Sequence[str] = (),
    n_tiles: int = 4,
) -> DataFrame:
    """Ranking battery (SURVEY §2.6 extension row): rank / dense_rank /
    ntile / lead over one window definition — one shuffle, four
    expressions."""
    w = _window(partition_by, order_by)
    first_order = order_by[0] if isinstance(order_by[0], str) else None
    lead_col = F.lead(F.col(first_order)).over(w) if first_order else F.lit(None)
    return df.withColumns(
        {
            "rk": F.rank().over(w),
            "dense_rk": F.dense_rank().over(w),
            "tile": F.ntile(n_tiles).over(w),
            "next_value": lead_col,
        }
    )


def history_intervals(
    df: DataFrame,
    partition_by: Sequence[str],
    ts_col: str,
    state_col: str,
    tiebreak_col: str,
) -> DataFrame:
    """SCD2 compaction: collapse an event log into validity intervals —
    one row per RUN of consecutive identical ``state_col`` per key, with
    ``valid_from`` / ``valid_to`` / ``is_current`` (half-open intervals;
    ``valid_to`` is the next run's start, null on the current run).

    Change detection is ``lag(state)``; the run id is a running sum of
    change flags; interval bounds come from a keyed aggregate plus one
    ``lead``. All three windows share the SAME partitioning (the key),
    so the whole op costs a single shuffle on ``partition_by`` — the
    plan a warehouse MERGE/SCD2 pipeline wants at scale.

    ``(ts_col, tiebreak_col)`` must totally order events within a key
    for deterministic runs.
    """
    w = _window(partition_by, [ts_col, tiebreak_col])
    prev = F.lag(F.col(state_col)).over(w)
    changed = (prev.isNull() | (prev != F.col(state_col))).cast("long")
    runs = df.withColumn("__chg", changed).withColumn(
        "seg", F.sum("__chg").over(w.rowsBetween(Window.unboundedPreceding, 0))
    )
    grouped = runs.groupBy(*partition_by, "seg", state_col).agg(
        F.min(ts_col).alias("valid_from"),
        F.count(F.lit(1)).alias("n_events"),
    )
    w2 = _window(partition_by, ["seg"])
    nxt = F.lead("valid_from").over(w2)
    return grouped.withColumns(
        {"valid_to": nxt, "is_current": nxt.isNull()}
    )


def add_distribution_features(
    df: DataFrame,
    order_by: Sequence[str | Column],
    partition_by: Sequence[str] = (),
) -> DataFrame:
    """Distribution-position battery: ``percent_rank`` (share of rows
    strictly below, (rank-1)/(n-1)) and ``cume_dist`` (inclusive CDF
    position) over one window definition — one shuffle, two expressions.
    Complements ``add_rank_features``; both values are exact rationals of
    row counts, so they compare bit-stably across engines."""
    w = _window(partition_by, order_by)
    return df.withColumns(
        {"pct_rank": F.percent_rank().over(w), "cume_d": F.cume_dist().over(w)}
    )


def sessionize(
    df: DataFrame,
    ts_col: str,
    partition_by: Sequence[str],
    gap: str = "30 minutes",
    session_col: str = "session_id",
) -> DataFrame:
    """Gap-based sessionization (extension; reference has no sessions).

    A new session starts when the gap to the previous event exceeds
    ``gap``. Classic lag -> boundary flag -> running sum; one shuffle on
    the partition keys, scales with per-key cardinality not total rows.
    """
    w = _window(partition_by, [ts_col])
    prev_ts = F.lag(F.col(ts_col)).over(w)
    # Timestamp arithmetic stays in interval types — no lossy casts.
    boundary = (
        prev_ts.isNull() | (F.col(ts_col) > prev_ts + F.expr(f"INTERVAL {gap}"))
    ).cast("long")
    return df.withColumn("__b", boundary).withColumn(
        session_col, F.sum("__b").over(w.rowsBetween(Window.unboundedPreceding, 0))
    ).drop("__b")


def tumbling_window_agg(
    df: DataFrame,
    ts_col: str,
    duration: str,
    aggs: Sequence[Column],
    group_by: Sequence[str] = (),
) -> DataFrame:
    """Tumbling time-window aggregate (batch twin of the streaming
    surface, SURVEY.md §2.11). Uses ``window()`` so the identical
    expression runs under readStream."""
    out = df.groupBy(F.window(F.col(ts_col), duration).alias("win"), *group_by).agg(*aggs)
    agg_cols = [c for c in out.columns if c != "win" and c not in group_by]
    return out.select(
        F.col("win.start").alias("window_start"),
        F.col("win.end").alias("window_end"),
        *group_by,
        *agg_cols,
    )


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    ts_col: str,
    value_cols: Sequence[str],
    suffix: str = "_asof",
) -> DataFrame:
    """Point-in-time (as-of) join: for every left row, attach the value
    columns of the LATEST right row with the same key and
    ``right.ts <= left.ts`` (backward, inclusive) — the
    trade-vs-quote / feature-vs-snapshot join Spark has no built-in for.

    100 TB plan — the union trick, not a join: tag both sides, union,
    ONE shuffle on the key, sort (ts, side) within each partition, and
    carry the right values forward with ``last(ignorenulls)`` over an
    unbounded-preceding frame. Cost is a single Exchange + in-partition
    sort regardless of how many left rows each right row serves; the
    join-then-filter-then-argmax formulation would shuffle the same data
    AND blow up on key x time fan-out. Right side should be unique per
    (key, ts) — pre-aggregate if not, or ties resolve by sort order.

    Output: all left columns, plus each value col as ``<col><suffix>``
    and the matching right timestamp as ``<ts_col><suffix>`` (NULL when
    no right row precedes the left row)."""
    keys = list(on)
    vals = list(value_cols)
    r = right.select(
        *keys,
        F.col(ts_col),
        F.lit(0).alias("__side"),
        *[F.col(c).alias(f"{c}{suffix}") for c in vals],
    ).withColumn(f"{ts_col}{suffix}", F.col(ts_col))
    l = left.withColumn("__side", F.lit(1))
    for c in vals:
        l = l.withColumn(f"{c}{suffix}", F.lit(None).cast(right.schema[c].dataType))
    l = l.withColumn(f"{ts_col}{suffix}", F.lit(None).cast(right.schema[ts_col].dataType))
    unioned = l.unionByName(r, allowMissingColumns=True)
    w = (
        Window.partitionBy(*keys)
        .orderBy(F.col(ts_col), F.col("__side"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = unioned.select(
        *[
            F.last(c, ignorenulls=True).over(w).alias(c)
            if c in [f"{v}{suffix}" for v in vals] + [f"{ts_col}{suffix}"]
            else F.col(c)
            for c in unioned.columns
        ]
    )
    return carried.filter(F.col("__side") == 1).drop("__side")


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    point_ts: str,
    start_col: str,
    end_col: str,
    on: Sequence[str] = (),
    bucket_seconds: int = 3600,
) -> DataFrame:
    """Range (point-in-interval) join: pair every point row with every
    interval row of the same key where
    ``start <= point_ts <= end`` (inclusive both ends).

    Spark plans a raw inequality join as BroadcastNestedLoopJoin —
    |points| x |intervals| work, a 100 TB non-starter. This is the
    bucketed formulation instead: each interval EXPLODES over the
    fixed-width time buckets it covers, points compute their single
    bucket, both sides equi-join on (keys..., bucket) — one ordinary
    shuffled hash join whose candidate count is bounded by per-bucket
    density — and the exact containment predicate filters the
    candidates. ``bucket_seconds`` trades replication (long intervals
    explode over more buckets) against candidate fan-in (coarse buckets
    collide more); size it near the typical interval length."""
    keys = list(on)
    width = F.lit(int(bucket_seconds) * 1_000_000)
    p_b = points.withColumn("__bkt", F.floor(F.unix_micros(F.col(point_ts)) / width))
    i_b = intervals.withColumn(
        "__bkt",
        F.explode(
            F.sequence(
                F.floor(F.unix_micros(F.col(start_col)) / width),
                F.floor(F.unix_micros(F.col(end_col)) / width),
            )
        ),
    )
    joined = p_b.join(i_b, on=keys + ["__bkt"]).filter(
        (F.col(point_ts) >= F.col(start_col)) & (F.col(point_ts) <= F.col(end_col))
    )
    return joined.drop("__bkt")


def add_ewma(
    df: DataFrame,
    cols: Sequence[str],
    order_by: Sequence[str | Column],
    partition_by: Sequence[str] = (),
    alpha: float = 0.4,
    span: int = 5,
    shift: int = 0,
) -> DataFrame:
    """Finite-window EWMA (pandas ``ewm(alpha=..., adjust=True)``
    truncated to the trailing ``span`` rows): weight (1-alpha)^i on the
    i-th lag, normalized by the weights of the lags actually present —
    so partial windows at a series head match pandas' adjust=True
    semantics over the truncated history. Expressed as a fixed
    left-to-right sum of ``span`` lag() terms over ONE window (no HOF,
    no collect_list buffer), which keeps it whole-stage codegen and —
    because the summation order is explicit — bit-reproducible on any
    engine. ``shift=1`` gives the leakage-safe variant that excludes
    the current row (same discipline as add_trailing_mean)."""
    w = _window(partition_by, order_by)
    out = {}
    for c in cols:
        num: Column | None = None
        den: Column | None = None
        for i in range(span):
            weight = (1.0 - alpha) ** i
            lagged = F.lag(F.col(c), shift + i).over(w)
            term = F.when(lagged.isNotNull(), lagged * F.lit(weight)).otherwise(F.lit(0.0))
            wterm = F.when(lagged.isNotNull(), F.lit(weight)).otherwise(F.lit(0.0))
            num = term if num is None else num + term
            den = wterm if den is None else den + wterm
        out[f"{c}_ewma"] = num / F.nullif(den, F.lit(0.0))
    return df.withColumns(out)


def gap_fill(
    df: DataFrame,
    keys: Sequence[str],
    time_col: str,
    value_cols: Sequence[str],
    step: str = "1 day",
    observed_col: str = "observed",
) -> DataFrame:
    """Densify a per-key time series (pandas ``asfreq`` + ``ffill``, the
    reference's daily COVID series assumes no calendar gaps —
    新冠疫情分析.py treats row order as day order, which silently breaks
    on missing dates): build the full spine between each key's min and
    max timestamp with ``sequence()``, left-join the observed rows, and
    forward-fill ``value_cols`` with last(ignorenulls) so every gap row
    carries the most recent observation. ``observed_col`` marks real
    rows (1) vs spine-filled gaps (0).

    Scale shape: one groupBy for the per-key bounds (map-combinable),
    the spine explodes driver-free on the executors (bounded by
    range/step per key), one shuffle joins spine to observations on
    (keys, time), and the fill window repartitions by ``keys`` only —
    no global sort, no collect. Leading gaps stay null by construction
    (nothing to carry forward), matching pandas ``ffill``."""
    joined = (
        df.groupBy(*keys)
        .agg(F.min(time_col).alias("__lo"), F.max(time_col).alias("__hi"))
        .select(
            *keys,
            F.explode(
                F.expr(f"sequence(__lo, __hi, interval {step})")
            ).alias(time_col),
        )
        .join(df.withColumn("__obs", F.lit(1)), [*keys, time_col], "left")
    )
    w = (
        _window(keys, [time_col])
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        joined.withColumns(
            {c: F.last(F.col(c), ignorenulls=True).over(w) for c in value_cols}
        )
        .withColumn(observed_col, F.coalesce(F.col("__obs"), F.lit(0)))
        .drop("__obs")
    )


def add_range_agg(
    df: DataFrame,
    value_col: str,
    time_col: str,
    window_seconds: int,
    partition_by: Sequence[str],
    aggs: Sequence[str] = ("sum", "count"),
    prefix: str | None = None,
) -> DataFrame:
    """Trailing EVENT-TIME window aggregates: for each row, aggregate
    ``value_col`` over the partition's rows whose ``time_col`` falls in
    [t - window_seconds, t] — a RANGE frame over the epoch, not a ROWS
    frame. This is the feature ROWS frames (add_trailing_mean) cannot
    express: 'spend in the last 30 days' depends on the *timestamps*,
    not on how many observations happen to precede the row; irregular
    series make the two semantics arbitrarily different.

    One shuffle on ``partition_by``; the frame is evaluated with
    Spark's sliding window accumulation inside the sort — no
    self-join, no explode. Rows sharing a timestamp are frame PEERS:
    each sees the full peer group's contribution (standard RANGE
    semantics in every engine, and the determinism condition: the
    result does not depend on peer order)."""
    pre = prefix if prefix is not None else f"{value_col}_{window_seconds}s"
    w = (
        Window.partitionBy(*partition_by)
        .orderBy(F.col(time_col).cast("timestamp").cast("long"))
        .rangeBetween(-window_seconds, 0)
    )
    fns = {"sum": F.sum, "count": F.count, "avg": F.avg, "min": F.min, "max": F.max}
    return df.withColumns(
        {f"{pre}_{a}": fns[a](F.col(value_col)).over(w) for a in aggs}
    )


def add_rolling_median(
    df: DataFrame,
    cols: Sequence[str],
    n: int,
    order_by: Sequence[str | Column],
    partition_by: Sequence[str] = (),
    shift: int = 0,
) -> DataFrame:
    """Trailing rolling MEDIAN over the last ``n`` rows (pandas
    ``rolling(n, min_periods=1).median()``; ``shift=1`` excludes the
    current row for the leakage-safe variant). Unlike rolling sums and
    means, an exact percentile is a SELECTION (plus one midpoint
    average for even frames) — no accumulation — so the result is
    bit-identical on any engine regardless of summation order, which
    is why the oracle needs no rounding. The robust-smoothing twin of
    ``add_trailing_mean``: a single spike moves the mean but not the
    median."""
    w = _window(partition_by, order_by).rowsBetween(-(n - 1) - shift, -shift)
    return df.withColumns(
        {
            f"{c}_med{n}": F.expr(f"percentile({c}, 0.5)").over(w)
            for c in cols
        }
    )


def add_rolling_corr(
    df: DataFrame,
    x_col: str,
    y_col: str,
    n: int,
    order_by: Sequence[str | Column],
    partition_by: Sequence[str] = (),
    out_col: str | None = None,
) -> DataFrame:
    """Trailing rolling Pearson correlation between two series over the
    last ``n`` rows (pandas ``rolling(n).corr()`` — the co-movement
    feature of the reference's price-correlation analysis
    (蔬菜价格相关性分析.py) made windowed). ``corr`` is an ordinary
    aggregate in Spark, so it runs as window state inside codegen — no
    UDF, no self-join. Composed as try_divide(covar_samp, sx*sy)
    rather than the builtin ``corr`` because under ANSI mode (Spark 4
    default) ``corr`` raises DIVIDE_BY_ZERO on zero-variance frames —
    including every partition's single-row first frame; the composed
    form yields NULL there, matching SQL corr semantics on engines
    whose corr special-cases it. One shuffle on ``partition_by`` (none
    if already partitioned)."""
    w = _window(partition_by, order_by).rowsBetween(-(n - 1), 0)
    c = F.try_divide(
        F.covar_samp(x_col, y_col).over(w),
        F.stddev_samp(x_col).over(w) * F.stddev_samp(y_col).over(w),
    )
    return df.withColumn(out_col or f"corr_{x_col}_{y_col}_{n}", c)


def funnel_counts(
    df: DataFrame,
    stages: Sequence[str],
    user_col: str,
    ts_col: str,
    type_col: str,
) -> DataFrame:
    """Ordered-funnel analysis: how many users reached stage i, where
    reaching means an event of stages[i] STRICTLY AFTER the timestamp
    that qualified them for stage i-1 (first-touch semantics — the
    earliest qualifying event per stage is the anchor, matching the
    classic product-analytics definition). Returns one row per stage:
    (stage_idx, stage, n_users).

    Build shape: stage i is a join of the (already tiny) stage-i-1
    user set against a type-filtered slice of the events, then a
    min-per-user aggregate — each stage shrinks, so the chain of
    joins gets cheaper as it goes; the per-stage counts are 1-row
    aggregates unioned lazily into one DAG (the driver loop builds
    plan, not data)."""
    cur = (
        df.filter(F.col(type_col) == stages[0])
        .groupBy(user_col)
        .agg(F.min(ts_col).alias("__t"))
    )
    out = None
    for i, stage in enumerate(stages):
        if i > 0:
            cur = (
                df.filter(F.col(type_col) == stage)
                .join(cur.select(user_col, F.col("__t").alias("__prev_t")), user_col)
                .filter(F.col(ts_col) > F.col("__prev_t"))
                .groupBy(user_col)
                .agg(F.min(ts_col).alias("__t"))
            )
        row = cur.agg(
            F.lit(i).alias("stage_idx"),
            F.lit(stage).alias("stage"),
            F.count(F.lit(1)).alias("n_users"),
        )
        out = row if out is None else out.unionByName(row)
    return out


def markov_transitions(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    type_col: str,
    tiebreak: Sequence[str] = (),
) -> DataFrame:
    """First-order Markov transition matrix of event types: order each
    user's events by time (plus ``tiebreak`` columns for deterministic
    ordering under equal timestamps), pair each event with its
    predecessor via lag, and estimate P(to|from) as the empirical
    fraction. Returns (from_state, to_state, n_transitions, p).

    One window shuffle on user_col, one groupBy on the (tiny)
    state-pair space, and the row-normalization runs as a window sum
    over that tiny aggregate — nothing re-touches the fact table."""
    w = _window([user_col], [F.col(ts_col), *[F.col(c) for c in tiebreak]])
    pairs = (
        df.withColumn("__prev", F.lag(type_col).over(w))
        .filter(F.col("__prev").isNotNull())
        .groupBy(
            F.col("__prev").alias("from_state"),
            F.col(type_col).alias("to_state"),
        )
        .agg(F.count(F.lit(1)).alias("n_transitions"))
    )
    total = Window.partitionBy("from_state")
    return pairs.withColumn(
        "p",
        F.col("n_transitions") / F.sum("n_transitions").over(total),
    )


def seasonal_decompose(
    df: DataFrame,
    order_col: str,
    value_col: str,
    period: int,
    partition_by: Sequence[str] | None = None,
) -> DataFrame:
    """Classical additive seasonal decomposition (the moving-average
    method of statsmodels' seasonal_decompose): value = trend +
    seasonal + residual.

    - trend: centered moving average over a full window of ``period``
      rows (period odd: symmetric window; period even: the standard
      2xMA — MA(period) then MA(2) — so the window stays centered).
      Edges without a full window get null trend (and null residual),
      exactly like the reference implementations.
    - seasonal: per phase (row position mod period) mean of the
      detrended series, centered to sum to zero over one cycle.
    - residual: value - trend - seasonal.

    Scale shape: two ROWS-frame windows and one tiny groupBy(phase)
    broadcast back. ``partition_by`` keys decompose many series at
    once (per store, per brand...); without it the single global
    series pays one range-partitioned sort, the unavoidable cost of
    an ordered method."""
    parts = list(partition_by or [])
    w = Window.partitionBy(*parts).orderBy(order_col) if parts else Window.orderBy(order_col)
    half = period // 2
    if period % 2 == 1:
        trend = F.when(
            F.count(value_col).over(w.rowsBetween(-half, half)) == period,
            F.avg(value_col).over(w.rowsBetween(-half, half)),
        )
    else:
        ma = F.when(
            F.count(value_col).over(w.rowsBetween(-half, half - 1)) == period,
            F.avg(value_col).over(w.rowsBetween(-half, half - 1)),
        )
        with_ma = F.when(
            F.count(value_col).over(w.rowsBetween(-half + 1, half)) == period,
            F.avg(value_col).over(w.rowsBetween(-half + 1, half)),
        )
        trend = (ma + with_ma) / 2

    base = df.withColumn("__trend", trend).withColumn(
        "__phase", (F.row_number().over(w) - 1) % period
    ).withColumn("__detrended", F.col(value_col) - F.col("__trend"))
    phase_means = base.groupBy(*parts, "__phase").agg(
        F.avg("__detrended").alias("__pm")
    )
    cycle_mean = phase_means.groupBy(*parts).agg(F.avg("__pm").alias("__cm"))
    keys = ["__phase"] if not parts else [*parts, "__phase"]
    out = (
        base.join(F.broadcast(phase_means), keys, "left")
        .join(F.broadcast(cycle_mean), parts, "left") if parts
        else base.join(F.broadcast(phase_means), keys, "left").crossJoin(
            F.broadcast(cycle_mean)
        )
    )
    return (
        out.withColumn("seasonal", F.col("__pm") - F.col("__cm"))
        .withColumn("trend", F.col("__trend"))
        .withColumn(
            "residual", F.col(value_col) - F.col("__trend") - F.col("seasonal")
        )
        .drop("__trend", "__pm", "__cm", "__detrended", "__phase")
    )


def holt_linear(
    df: DataFrame,
    order_by: Sequence[str],
    value_col: str,
    partition_by: Sequence[str],
    alpha: float = 0.5,
    beta: float = 0.3,
    horizon: int = 0,
    level_col: str = "level",
    trend_col: str = "trend",
) -> DataFrame:
    """Holt double exponential smoothing per series (the linear-trend
    member of the COVID-forecast family the reference fits; Holt 1957):
      level_t = a*y_t + (1-a) * (level_{t-1} + trend_{t-1})
      trend_t = b*(level_t - level_{t-1}) + (1-b) * trend_{t-1}
    initialized level_1 = y_1, trend_1 = y_2 - y_1 (0 for length-1
    series). Adds smoothed (level, trend) per row plus, when
    ``horizon`` > 0, the h-step-ahead forecast level + h*trend from
    each row.

    The recurrence has an unbounded dependency horizon, so no fixed
    lag-window expresses it (unlike add_ewma's truncated form):
    this is the sanctioned applyInPandas shape — one shuffle on the
    series keys, each series smoothed in one Arrow batch with a plain
    float loop. Requires ``partition_by`` (a global un-keyed series
    cannot scale and this engine refuses to fake it — pass a constant
    key if one series is genuinely wanted and small). The float ops
    are written in the exact textbook order above, so an independent
    re-derivation (the SQL oracle's recursive CTE) is bit-identical.
    """
    if not partition_by:
        raise ValueError("holt_linear requires partition_by series keys")
    added = [level_col, trend_col] + ([f"forecast_{int(horizon)}"] if horizon > 0 else [])
    collisions = [c for c in added if c in df.columns]
    if collisions:
        # Without this guard a pre-existing 'level'/'trend' column
        # produces a duplicate-field output schema that fails opaquely
        # inside applyInPandas.
        raise ValueError(
            f"holt_linear output column(s) {collisions} already exist in the "
            "input; pass different level_col/trend_col names"
        )
    import pandas as pd

    keep = [c for c in df.columns]
    out_fields = ", ".join(
        [f"`{c}` {df.schema[c].dataType.simpleString()}" for c in keep]
        + [f"{level_col} double", f"{trend_col} double"]
        + ([f"forecast_{horizon} double"] if horizon > 0 else [])
    )

    a, b = float(alpha), float(beta)
    h = int(horizon)

    def smooth(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(list(order_by), kind="mergesort").reset_index(
            drop=True
        )
        ys = pdf[value_col].astype(float).tolist()
        levels: list[float] = []
        trends: list[float] = []
        for i, y in enumerate(ys):
            if i == 0:
                lv = float(y)
                tr = float(ys[1]) - float(ys[0]) if len(ys) > 1 else 0.0
            else:
                prev_l, prev_t = levels[-1], trends[-1]
                lv = a * float(y) + (1.0 - a) * (prev_l + prev_t)
                tr = b * (lv - prev_l) + (1.0 - b) * prev_t
            levels.append(lv)
            trends.append(tr)
        pdf[level_col] = levels
        pdf[trend_col] = trends
        if h > 0:
            pdf[f"forecast_{h}"] = [
                lv + h * tr for lv, tr in zip(levels, trends)
            ]
        return pdf

    return df.groupBy(*partition_by).applyInPandas(smooth, schema=out_fields)


def cusum_changepoint(
    df: DataFrame,
    order_col: str,
    value_col: str,
    partition_by: Sequence[str] = (),
) -> DataFrame:
    """Single change-point location by the cumulative-sum statistic
    (Page 1954 / the MOSUM-free classic): for a series x_1..x_n the
    centered prefix sums S_i = sum_{j<=i} x_j - i*mean peak where the
    mean shifts; the estimated change point is argmax_i |S_i| (the last
    index BEFORE the new regime). Returns one row per series:
    (keys..., n_rows, cp_order, cp_index, cusum_peak, mean_before,
    mean_after) — the reference's eyeballed "did the series jump"
    reading as an operator (reference 新冠疫情分析.py:52-74 builds
    diff/pct-change features around exactly this question).

    Determinism: the argmax is computed on n*S_i = n*P_i - i*T (P =
    prefix sum, T = series total) which for INTEGER inputs is exact
    integer arithmetic — the peak index cannot flip on float summation
    order across engines, so the result is oracle-hashable. Ties ->
    the earliest index. ``cusum_peak`` (=|S| at the peak) and the
    before/after means are the only float outputs.

    Input contract (ENFORCED, the sssp discipline): values must be
    integral — null, NaN, +/-Infinity and fractional values are
    rejected up front in one aggregate pass. A silent ``cast("long")``
    would truncate revenue-like series (1.75 -> 1) and move the change
    point without any error; callers with fractional data scale to
    integer units first (cents, milliunits), which preserves the
    argmax exactly because CUSUM is scale-equivariant.

    Scale shape: one ROWS-frame window (prefix sum + row_number) and
    one map-combinable groupBy per series — two shuffles total, both
    keyed on ``partition_by``. Without keys the single global series
    funnels through one partition (same caveat as pack_offsets); at
    100 TB always pass the series keys."""
    parts = list(partition_by)
    v = F.col(value_col)
    vd = v.try_cast("double")
    # Guard construction notes: every predicate must evaluate to a
    # definite TRUE for a bad row — a NULL predicate ORed in counts as
    # 0 and silently passes. So non-numeric strings are caught by
    # "value present but double-cast NULL" (try_cast, since ANSI cast
    # would raise mid-aggregate instead of counting), and magnitudes
    # at/above 2^63 are rejected explicitly (an integral 1e19 passes
    # floor-equality but the long cast would clamp to Long.MaxValue).
    n_bad = df.select(
        F.sum(
            F.when(
                v.isNull()
                | (v.isNotNull() & vd.isNull())
                | F.isnan(vd)
                | (F.abs(vd) >= F.lit(float(2**63)))
                | (vd != F.floor(vd)),
                1,
            ).otherwise(0)
        ).alias("n_bad")
    ).head()["n_bad"]
    if n_bad:
        raise ValueError(
            f"cusum_changepoint: {n_bad} value(s) in {value_col!r} are "
            "null, non-numeric, NaN, infinite, non-integral or beyond "
            "long range — the exact-argmax guarantee needs integer "
            "arithmetic and a silent long-cast would truncate 1.75 -> 1 "
            "(or clamp 1e19) and move the change point; scale "
            "fractional series to integer units (cents) first (CUSUM's "
            "argmax is scale-equivariant)"
        )
    w = (
        Window.partitionBy(*parts).orderBy(order_col)
        if parts
        else Window.orderBy(order_col)
    )
    x = F.col(value_col).cast("long")
    base = df.select(
        *parts,
        F.col(order_col).alias("__ord"),
        x.alias("__x"),
        F.sum(x).over(w.rowsBetween(Window.unboundedPreceding, 0)).alias("__p"),
        F.row_number().over(w).alias("__rn"),
    )
    # The peak pick needs n and T (per-series constants) inside each
    # row, so compute them as an unbounded window over the same
    # partitioning — one extra Window exec, no extra shuffle (same
    # partition keys as the ordered window above).
    n_over = F.count(F.lit(1)).over(
        Window.partitionBy(*parts) if parts else Window.partitionBy(F.lit(1))
    )
    t_over = F.sum("__x").over(
        Window.partitionBy(*parts) if parts else Window.partitionBy(F.lit(1))
    )
    scored = base.select(
        *parts,
        "__ord",
        "__p",
        "__rn",
        n_over.alias("__n"),
        t_over.alias("__t"),
        F.abs(n_over * F.col("__p") - F.col("__rn") * t_over).alias("__ns"),
    )
    peak = scored.groupBy(*parts).agg(
        F.max("__n").alias("n_rows"),
        F.max("__t").alias("__t"),
        F.min(
            F.struct(
                (-F.col("__ns")).alias("neg"),
                F.col("__rn").alias("rn"),
                F.col("__ord").alias("ord"),
                F.col("__p").alias("p"),
            )
        ).alias("__pk"),
    )
    rn = F.col("__pk.rn")
    p = F.col("__pk.p")
    return peak.select(
        *parts,
        F.col("n_rows").cast("long"),
        F.col("__pk.ord").alias("cp_order"),
        rn.cast("long").alias("cp_index"),
        F.round((-F.col("__pk.neg")) / F.col("n_rows"), 6).alias("cusum_peak"),
        F.round(p / rn, 6).alias("mean_before"),
        F.round(
            F.try_divide(F.col("__t") - p, F.col("n_rows") - rn), 6
        ).alias("mean_after"),
    )


def acf(
    df: DataFrame,
    order_col: str,
    value_col: str,
    max_lag: int,
    partition_by: Sequence[str] = (),
    round_to: int | None = 6,
) -> DataFrame:
    """Sample autocorrelation function per series: for each lag l in
    1..max_lag, r_l = sum_{t>l}(x_t - mean)(x_{t-l} - mean) /
    sum_t(x_t - mean)^2 — the standard (biased, variance-normalized)
    ACF estimator every stats package reports. The seasonality
    diagnostic that picks the ``period`` argument for
    ``seasonal_decompose`` and validates ``add_lag_features`` choices:
    a spike at lag 7 says weekly structure, a slow decay says trend.

    One shuffle on the series keys: the per-series mean comes from an
    unordered whole-partition window (no second scan), the lagged
    values from one ordered window over the SAME partitioning (Spark
    reuses the exchange; the sort is per-series), and the lag products
    reduce in a map-combinable groupBy. Assumes one row per
    (partition, order) tick on a REGULAR grid — run ``gap_fill`` first
    if the series has holes (lag-k rows, not lag-k time units).
    Returns one row per series: the keys, n_obs, and acf_1..acf_K
    (NULL when the series is shorter than the lag or has zero
    variance).
    """
    if max_lag < 1:
        raise ValueError(f"acf: max_lag must be >= 1, got {max_lag}")
    keys = list(partition_by)
    w_all = Window.partitionBy(*keys)
    w_ord = Window.partitionBy(*keys).orderBy(order_col)
    x = F.col(value_col).cast("double")
    mu = F.avg(x).over(w_all)
    d = df.select(
        *keys,
        (x - mu).alias("__dx"),
        *[
            (F.lag(x, lag).over(w_ord) - mu).alias(f"__dx_l{lag}")
            for lag in range(1, max_lag + 1)
        ],
    )
    denom = F.sum(F.col("__dx") * F.col("__dx"))
    aggs = [F.count(F.lit(1)).cast("long").alias("n_obs")]
    for lag in range(1, max_lag + 1):
        num = F.sum(F.col("__dx") * F.col(f"__dx_l{lag}"))
        r = F.try_divide(num, denom)
        aggs.append(
            (F.round(r, round_to) if round_to is not None else r).alias(f"acf_{lag}")
        )
    return d.groupBy(*keys).agg(*aggs)


def theil_sen_trend(
    df: DataFrame,
    x_col: str,
    y_col: str,
    partition_by: Sequence[str] = (),
    round_to: int | None = 6,
) -> DataFrame:
    """Theil-Sen robust trend per series: the MEDIAN of all pairwise
    slopes (y_j - y_i)/(x_j - x_i), x_i < x_j — the standard
    outlier-robust alternative to OLS (breakdown point ~29%: a third of
    the points can be corrupt before the estimate moves), with the
    median intercept b = median(y - slope*x). The trend check that
    doesn't lie when a metric series contains spikes OLS would chase.

    Scale contract: pairwise slopes are O(n²) PER SERIES — this
    operator is for series already reduced to reporting granularity
    (daily/monthly aggregates, at most a few thousand points per key;
    84 months -> 3.5k pairs). Pre-aggregate first; the per-series blowup
    is the caller's knob, exactly like ``seasonal_decompose``'s period.
    The pairwise stage is a keyed self-join (one shuffle each side on
    the series key; bounded output), the median one exact percentile
    per group. Series with fewer than 2 distinct x have no slope and
    are dropped (document: not NULL rows — absent, like an empty
    groupBy group). Ties in x contribute no pair (slope undefined).

    Returns one row per series: keys, n_obs, n_pairs, slope,
    intercept.
    """
    keys = list(partition_by)
    # The projected input is referenced FOUR times (both pair sides,
    # n_obs, residuals) and Catalyst gives multi-referenced subtrees no
    # ReusedExchange — without a cut, the whole UPSTREAM (typically an
    # aggregation over a fact table) would re-execute per reference.
    # localCheckpoint materializes the (reporting-granularity, bounded)
    # series table once; blocks are released by the ContextCleaner when
    # the result frame is dropped.
    a = (
        df.select(
            *keys,
            F.col(x_col).cast("double").alias("__x"),
            F.col(y_col).cast("double").alias("__y"),
        )
        .filter(F.col("__x").isNotNull() & F.col("__y").isNotNull())
        .localCheckpoint(eager=True)
    )
    r = a.select(
        *keys,
        F.col("__x").alias("__x2"),
        F.col("__y").alias("__y2"),
    )
    pairs = a.join(r, keys) if keys else a.crossJoin(r)
    pairs = pairs.filter(F.col("__x") < F.col("__x2")).select(
        *keys,
        ((F.col("__y2") - F.col("__y")) / (F.col("__x2") - F.col("__x"))).alias("__s"),
    )
    # slopes is referenced twice (residual join + output) and sits on
    # the O(n^2) pairwise stage — cut it too (1 row per series, tiny).
    # The degenerate global group (no pair at all: groupBy() still
    # emits one row, NULL slope) is filtered so the "no slope -> row
    # ABSENT" contract holds for partition_by=() as well.
    slopes = (
        pairs.groupBy(*keys)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_pairs"),
            F.percentile(F.col("__s"), F.lit(0.5)).alias("__slope"),
        )
        .filter(F.col("n_pairs") >= 1)
        .localCheckpoint(eager=True)
    )
    stats = a.groupBy(*keys).agg(F.count(F.lit(1)).cast("long").alias("n_obs"))
    joined = stats.join(slopes, keys) if keys else stats.crossJoin(slopes)
    # Plain join (no broadcast hint): the slope table has one row PER
    # SERIES — unbounded by this operator's per-series contract (think
    # partition_by=[user_id]) — so forcing it through the driver would
    # be the scale hazard; AQE broadcasts it when it is actually small.
    sl = slopes.select(*keys, "__slope") if keys else slopes.select("__slope")
    resid = a.join(sl, keys) if keys else a.crossJoin(sl)
    intercepts = resid.groupBy(*keys).agg(
        F.percentile(F.col("__y") - F.col("__slope") * F.col("__x"), F.lit(0.5)).alias(
            "__icept"
        )
    )
    out = joined.join(intercepts, keys) if keys else joined.crossJoin(intercepts)
    slope = F.col("__slope")
    icept = F.col("__icept")
    if round_to is not None:
        slope, icept = F.round(slope, round_to), F.round(icept, round_to)
    return out.select(
        *keys, "n_obs", "n_pairs", slope.alias("slope"), icept.alias("intercept")
    )
