"""Relational operators (SURVEY.md §2.2 P*, §2.3 D*, §2.4 J*, §2.5 A*,
§2.7 O*, §2.8 U*).

Every function is a pure DataFrame -> DataFrame transform; plans stay
declarative so Catalyst applies pushdown / pruning / join planning. Scale
notes are given per function where a naive translation of the reference's
pandas idiom would not survive 100 TB.
"""

from __future__ import annotations

from collections.abc import Sequence
from typing import NamedTuple

import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# Engine-portable row hash (shared by every deterministic sampler)
# ---------------------------------------------------------------------------


def portable_hash32(key_cols: Sequence[str], seed: str = "") -> Column:
    """First 32 bits of md5(seed + 0x1f-joined keys) as a BIGINT in
    [0, 2^32) — THE engine-portable row hash. md5 is bit-identical
    across Spark / DuckDB / Python / Presto (unlike xxhash64 or
    rand(seed), which are engine-private); DuckDB re-derives it as
    ``('0x' || substr(md5(seed || chr(31) || key), 1, 8))::BIGINT``.
    Every deterministic sampler in this package (``hash_sample``,
    ``weighted_hash_sample``, ``budget_prefix_sample``,
    ``io.write_training_shards``) builds on this ONE expression so the
    portability convention can only change in one place."""
    key = F.concat_ws("\x1f", F.lit(seed), *[F.col(c).cast("string") for c in key_cols])
    return F.conv(F.substring(F.md5(key), 1, 8), 16, 10).cast("long")


def nonfinite_or_negative(col: Column) -> Column:
    """True when a (non-NULL) value is NaN, +/-Infinity or negative —
    the value classes EVERY weight/amount validator here must reject in
    one shared place: NaN poisons comparisons, negatives break monotone
    prefixes, and ANSI Spark casts a double Infinity to decimal as
    SILENT NULL (verified on 4.1 — not an overflow error), so an
    unchecked inf corrupts fixed-point sums while still counting toward
    ranks and row counts. Callers decide NULL handling separately
    (weights usually raise on NULL; value columns usually exclude)."""
    c = col.cast("double")
    return (
        F.isnan(c)
        | (col < 0)
        | (c == float("inf"))
        | (c == float("-inf"))
    )


def lit_map(d: dict) -> Column:
    """Compile a small dict into a ``create_map`` literal Column — the
    per-group constants of the bucketed-prefix-scan pattern
    (``budget_prefix_sample``, ``dq.ks_statistic``): driver-computed
    offsets/limits reach every executor as pure codegen expressions, no
    broadcast variable lifecycle. ``Decimal`` values become
    decimal(38,6) literals so fixed-point arithmetic survives the
    round-trip."""
    from decimal import Decimal

    pairs = []
    for k, v in d.items():
        val = (
            F.lit(str(v)).cast("decimal(38,6)")
            if isinstance(v, Decimal)
            else F.lit(v)
        )
        pairs.extend([F.lit(k), val])
    return F.create_map(*pairs)


# ---------------------------------------------------------------------------
# Projections / row transforms (P1-P12)
# ---------------------------------------------------------------------------


def select_excluding(df: DataFrame, exclude: Sequence[str]) -> DataFrame:
    """P2: column select by exclusion list (reference 新冠疫情分析.py:105)."""
    return df.select(*[c for c in df.columns if c not in set(exclude)])


def map_values(df: DataFrame, col: str, mapping: dict, out_col: str | None = None, default=None) -> DataFrame:
    """P3: scalar dict-lookup encode (reference 乳腺癌预测.py:79 'M'->1).

    Compiles the dict to a CASE expression — stays in whole-stage
    codegen, no UDF.
    """
    expr = None
    for k, v in mapping.items():
        cond = F.col(col) == F.lit(k)
        expr = F.when(cond, F.lit(v)) if expr is None else expr.when(cond, F.lit(v))
    expr = expr.otherwise(F.lit(default))
    return df.withColumn(out_col or col, expr)


def normalize_blank_to_null(df: DataFrame, cols: Sequence[str]) -> DataFrame:
    """P6: whitespace-only string -> NULL (reference 蔬菜价格相关性分析.py:47)."""
    out = df
    for c in cols:
        out = out.withColumn(c, F.when(F.trim(F.col(c)) == "", None).otherwise(F.col(c)))
    return out


def to_numeric_coerce(df: DataFrame, cols: Sequence[str], dtype: str = "double") -> DataFrame:
    """P7: cast-with-coerce (pandas ``to_numeric(errors='coerce')``,
    reference 蔬菜价格相关性分析.py:54) via ``try_cast`` — bad cells
    become NULL instead of failing the job."""
    out = df
    for c in cols:
        out = out.withColumn(c, F.expr(f"try_cast(`{c}` as {dtype})"))
    return out


def clean_non_finite(df: DataFrame, cols: Sequence[str], fill: float = 0.0) -> DataFrame:
    """P8: replace NaN/±inf then fill nulls (reference 新冠疫情分析.py:82-83).

    Spark distinguishes NULL from NaN (SURVEY.md §1.2) — handle both.
    """
    out = df
    for c in cols:
        col = F.col(c)
        out = out.withColumn(
            c,
            F.when(F.isnan(col) | (col == float("inf")) | (col == float("-inf")), F.lit(fill))
            .otherwise(col),
        )
    return out.na.fill(fill, subset=list(cols))


def discretize_trend(
    df: DataFrame,
    value: str,
    prev_value: str,
    out_col: str = "trend",
    up_threshold: float = 0.05,
    down_threshold: float = 0.05,
    labels: tuple[str, str, str] = ("up", "down", "flat"),
) -> DataFrame:
    """P10: 3-way ±threshold discretization (reference
    蔬菜价格相关性分析.py:93-99: rise if new > old*1.05, fall if
    new < old*0.95, else flat)."""
    up, down, flat = labels
    new, old = F.col(value), F.col(prev_value)
    return df.withColumn(
        out_col,
        F.when(old.isNull() | new.isNull(), None)
        .when(new > old * (1.0 + up_threshold), up)
        .when(new < old * (1.0 - down_threshold), down)
        .otherwise(flat),
    )


def with_row_number(df: DataFrame, order_by: Sequence[str | Column], out_col: str = "rn", partition_by: Sequence[str] = ()) -> DataFrame:
    """P12: contiguous row/day counter over an explicit ordering
    (reference 新冠疫情分析.py:40 ``range(1, len+1)``).

    Uses ``row_number`` NOT ``monotonically_increasing_id`` (gaps).
    Scale note: an empty ``partition_by`` funnels all rows through one
    partition — fine for a single time series, wrong for a keyed fact;
    always pass partition keys at scale.
    """
    w = Window.orderBy(*order_by)
    if partition_by:
        w = Window.partitionBy(*partition_by).orderBy(*order_by)
    return df.withColumn(out_col, F.row_number().over(w))


# ---------------------------------------------------------------------------
# Dedup / missing data (D1-D4)
# ---------------------------------------------------------------------------


def dedup_keep_last(df: DataFrame, keys: Sequence[str], order_by: Sequence[Column]) -> DataFrame:
    """D1/W7: dedup on a key subset keeping the LAST row per key under an
    explicit ordering (reference 蔬菜价格相关性分析.py:25-26
    ``drop_duplicates(keep='last')`` — pandas keeps file order; we make
    the order explicit and therefore deterministic).

    ``order_by`` should be a total order within each key group; when it
    is not, a final xxhash64-of-the-full-row tiebreak makes the winner
    deterministic anyway — independent of partitioning, task retries,
    and shuffle arrival order (without it, row_number picks whichever
    tied row a nondeterministic shuffle delivered first; the winner
    could silently change between runs). When ``order_by`` is already
    total the tiebreak column never decides anything. Map-typed
    columns are excluded from the hash (Spark forbids hashing maps);
    full-duplicate rows tie on the hash too, but then every candidate
    row is identical so the output is still deterministic. Implemented
    as a ranking window: one shuffle on ``keys``, no global sort.
    """
    hashable = [c for c, t in df.dtypes if not t.startswith("map")]
    w = Window.partitionBy(*keys).orderBy(
        *[F.col(c).desc() if isinstance(c, str) else c for c in order_by],
        F.xxhash64(*[F.col(c) for c in hashable]).asc(),
    )
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def merge_upsert(
    target: DataFrame,
    updates: DataFrame,
    keys: Sequence[str],
    order_col: str,
) -> DataFrame:
    """SCD1 merge (``MERGE INTO`` semantics on plain tables): union the
    snapshot with the delta and keep, per key, the single row with the
    highest ``order_col`` (version number / commit timestamp — must
    strictly order snapshot vs delta rows for a deterministic winner).
    Updates overwrite, inserts (keys only in ``updates``) append,
    untouched keys pass through.

    Plan: one ranking window over one shuffle on ``keys`` — identical
    shape to ``dedup_keep_last``. At scale, bucket both tables on
    ``keys`` and the merge runs shuffle-free; the union adds no exchange
    because unionByName is a narrow op.
    """
    merged = target.unionByName(updates)
    return dedup_keep_last(merged, keys, [F.col(order_col).desc()])


def drop_rows_with_null(df: DataFrame, subset: Sequence[str] | None = None) -> DataFrame:
    """D2: drop rows containing any null (reference 蔬菜价格相关性分析.py:29)."""
    return df.na.drop(subset=list(subset) if subset else None)


def null_counts(df: DataFrame, cols: Sequence[str] | None = None) -> DataFrame:
    """D4: per-column null counts in ONE pass (reference 乳腺癌预测.py:59-63
    loops per column; here a single map-side-combined aggregate)."""
    cols = list(cols or df.columns)
    return df.agg(*[F.sum(F.col(c).isNull().cast("long")).alias(c) for c in cols])


def drop_null_columns(df: DataFrame, cols: Sequence[str] | None = None) -> DataFrame:
    """D3: drop columns containing any null (reference
    蔬菜价格相关性分析.py:51). Two-phase: one aggregate pass computes
    null counts, then a projection keeps survivors. The collect is a
    single tiny row — not a data collect."""
    cols = list(cols or df.columns)
    counts = null_counts(df, cols).collect()[0].asDict()
    keep = [c for c in df.columns if c not in cols or counts.get(c, 0) == 0]
    return df.select(*keep)


# ---------------------------------------------------------------------------
# Joins (J1-J3 + semi/anti extension)
# ---------------------------------------------------------------------------


def equi_join(left: DataFrame, right: DataFrame, on: Sequence[str], how: str = "inner", broadcast_right: bool = False) -> DataFrame:
    """J1: equi-join. ``broadcast_right=True`` forces a broadcast-hash
    join for known-small dims (region/nation) — skips the shuffle
    entirely; otherwise Catalyst/AQE picks the strategy."""
    r = F.broadcast(right) if broadcast_right else right
    return left.join(r, on=list(on), how=how)


def semi_join(left: DataFrame, right: DataFrame, on: Sequence[str]) -> DataFrame:
    """EXISTS-style filter: rows of ``left`` with a match in ``right``.
    No columns from the right side, no duplication — cheaper than an
    inner join + distinct."""
    return left.join(right, on=list(on), how="left_semi")


def anti_join(left: DataFrame, right: DataFrame, on: Sequence[str]) -> DataFrame:
    """NOT EXISTS-style filter: rows of ``left`` with no match."""
    return left.join(right, on=list(on), how="left_anti")


def salted_join(
    skewed: DataFrame,
    other: DataFrame,
    on: Sequence[str],
    salt_buckets: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Skew-resistant equi-join: hot keys on the ``skewed`` side are
    spread across ``salt_buckets`` partitions; the ``other`` side is
    replicated once per bucket so every salted row still meets its
    match. Use when ONE key dominates (AQE's skew-join splits oversized
    partitions, but salting also fixes the single-hot-key hash-agg that
    follows). Cost: |other| x salt_buckets rows shuffled — keep the
    replicated side the smaller one.

    Only join types that never emit unmatched OTHER-side rows are
    allowed: the replicated side's unmatched rows would surface once per
    salt bucket under right/full outer, duplicating null-extended rows."""
    allowed = {"inner", "left", "left_outer", "leftouter", "left_semi", "leftsemi", "left_anti", "leftanti", "semi", "anti", "cross"}
    if how.lower().replace("_", "") not in {h.replace("_", "") for h in allowed}:
        raise ValueError(
            f"salted_join: how={how!r} unsupported — the replicated side is "
            "duplicated per salt bucket, so right/full outer joins would emit "
            "unmatched rows salt_buckets times. Use inner/left/semi/anti."
        )
    keys = list(on)
    salted = skewed.withColumn(
        "__salt", (F.abs(F.xxhash64(*[F.col(c) for c in keys], F.monotonically_increasing_id())) % salt_buckets)
    )
    replicated = other.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(salt_buckets)]))
    )
    return salted.join(replicated, on=keys + ["__salt"], how=how).drop("__salt")


# ---------------------------------------------------------------------------
# Aggregations (A1-A13)
# ---------------------------------------------------------------------------


def value_counts(df: DataFrame, col: str, normalize: bool = False) -> DataFrame:
    """A1/A2: group-by count (pandas ``value_counts``,
    reference 乳腺癌预测.py:53), optional proportion column."""
    out = df.groupBy(col).agg(F.count(F.lit(1)).alias("count"))
    if normalize:
        total = F.sum("count").over(Window.partitionBy())
        out = out.withColumn("proportion", F.col("count") / total)
    return out


def describe_stats(df: DataFrame, cols: Sequence[str]) -> DataFrame:
    """A3: full descriptive stats (pandas ``describe``,
    reference 新冠疫情分析.py:44): count/mean/std/min/25%/50%/75%/max.

    Uses exact ``percentile`` (the reference is exact); swap to
    ``percentile_approx`` at 100 TB where an exact global sort per column
    is not worth it.
    """
    aggs = []
    for c in cols:
        col = F.col(c)
        aggs += [
            F.count(col).alias(f"{c}_count"),
            F.avg(col).alias(f"{c}_mean"),
            F.stddev(col).alias(f"{c}_std"),
            F.min(col).alias(f"{c}_min"),
            F.expr(f"percentile(`{c}`, 0.25)").alias(f"{c}_p25"),
            F.expr(f"percentile(`{c}`, 0.5)").alias(f"{c}_p50"),
            F.expr(f"percentile(`{c}`, 0.75)").alias(f"{c}_p75"),
            F.max(col).alias(f"{c}_max"),
        ]
    return df.agg(*aggs)


def pivot_agg(
    df: DataFrame,
    group_by: Sequence[str],
    pivot_col: str,
    value_col: str,
    agg: str = "first",
    pivot_values: Sequence[str] | None = None,
) -> DataFrame:
    """A7: long->wide pivot (pandas ``pivot_table``, reference
    蔬菜价格相关性分析.py:40-41, aggfunc='first').

    Pass ``pivot_values`` whenever the domain is known — it skips the
    extra distinct-scan job Spark otherwise runs to discover columns
    (SURVEY.md §4.2).
    """
    agg_fn = getattr(F, agg)(F.col(value_col))
    g = df.groupBy(*group_by)
    p = g.pivot(pivot_col, list(pivot_values)) if pivot_values is not None else g.pivot(pivot_col)
    return p.agg(agg_fn)


def conditional_rate(df: DataFrame, cond: Column, out_col: str = "rate") -> DataFrame:
    """A2: proportion of rows satisfying a predicate
    (reference 乳腺癌预测.py:54-55) as a single map-side-combinable avg."""
    return df.agg(F.avg(cond.cast("double")).alias(out_col))


def confusion_matrix(df: DataFrame, label: str, prediction: str) -> DataFrame:
    """A12: confusion matrix via groupBy+pivot
    (reference 乳腺癌预测.py:195-199)."""
    return df.groupBy(label).pivot(prediction).count()


# ---------------------------------------------------------------------------
# Sorts / limits / top-k (O1-O8)
# ---------------------------------------------------------------------------


def top_k(df: DataFrame, order_by: Sequence[Column], k: int) -> DataFrame:
    """O1-O3: global top-k. Spark plans TakeOrderedAndProject — each
    partition keeps only k rows, then the driver merges; no full sort.
    ``order_by`` should include a unique tiebreaker for determinism."""
    return df.orderBy(*order_by).limit(k)


def top_k_per_group(df: DataFrame, partition_by: Sequence[str], order_by: Sequence[Column], k: int, rank_col: str = "rk") -> DataFrame:
    """Grouped top-k via ranking window — one shuffle on the group keys.
    (Extension: the reference only does global top-k, O2.)"""
    w = Window.partitionBy(*partition_by).orderBy(*order_by)
    return df.withColumn(rank_col, F.row_number().over(w)).filter(F.col(rank_col) <= k)


def hash_sample(
    df: DataFrame,
    key_cols: Sequence[str],
    fraction: float,
    seed: str = "",
    buckets: int = 1_000_000,
) -> DataFrame:
    """Deterministic, ENGINE-PORTABLE sampling (LLM-pipeline staple:
    carve a reproducible held-out slice of a 100 TB corpus that any
    other system can re-derive row-for-row): bucket = first 8 hex chars
    of md5(seed + key) -> keep bucket < fraction * buckets. md5 is
    bit-identical across Spark / DuckDB / Python / Presto, unlike
    xxhash64 or rand(seed) which are engine-private. Pure codegen
    expressions; the filter runs in the scan stage — no shuffle, no
    sort, and the sample is stable under repartitioning and engine
    migration. Keys should uniquely identify rows for an exact-fraction
    interpretation (duplicated keys travel together by design — that IS
    the point of key-hash sampling)."""
    bucket = portable_hash32(key_cols, seed) % buckets
    return df.filter(bucket < int(fraction * buckets))


def weighted_hash_sample(
    df: DataFrame,
    key_cols: Sequence[str],
    weight_col: str | Column,
    seed: str = "",
    buckets: int = 1_000_000,
) -> DataFrame:
    """Per-row-probability deterministic sampling (the corpus-MIXING
    staple: keep each document with probability equal to a per-row
    weight — a quality score, or a per-source mixing ratio joined on —
    so the kept set is reproducible row-for-row on any engine). Same
    engine-portable md5 bucket as ``hash_sample``; the threshold is now
    a COLUMN in [0,1] instead of a constant. Pure codegen filter in the
    scan stage — no shuffle, stable under repartitioning."""
    w = F.col(weight_col) if isinstance(weight_col, str) else weight_col
    bucket = portable_hash32(key_cols, seed) % buckets
    return df.filter(bucket < w * buckets)


def balanced_sample(
    df: DataFrame,
    group_cols: Sequence[str],
    n_per_group: int,
    key_cols: Sequence[str],
    seed: str = "",
    rank_col: str = "rk",
) -> DataFrame:
    """Exact-N-per-group deterministic subset (the balanced-corpus
    builder: 'exactly 10k docs per source'): rank rows within each group
    by the md5 of their key (engine-portable shuffle order, same trick
    as ``hash_sample``) and keep rank <= N. Groups smaller than N pass
    through whole. One shuffle on ``group_cols``; the rank is stable
    under repartitioning and re-derivable on any engine."""
    key = F.concat_ws(
        "\x1f", F.lit(seed), *[F.col(c).cast("string") for c in key_cols]
    )
    w = Window.partitionBy(*group_cols).orderBy(F.md5(key), *key_cols)
    return (
        df.withColumn(rank_col, F.row_number().over(w))
        .filter(F.col(rank_col) <= n_per_group)
    )


def correlation_matrix(df: DataFrame, cols: Sequence[str]) -> DataFrame:
    """Pairwise Pearson correlation matrix in long form (col_a, col_b,
    corr), the reference's price-correlation heatmap input
    (蔬菜价格相关性分析.py pivot + DataFrame.corr): ALL n*(n-1)/2 pairs
    computed in ONE aggregate pass (map-side combined corr states — one
    scan however many columns), then unpivoted driver-side from the
    single result row. Upper triangle only, a < b by column order."""
    cols = list(cols)
    pairs = [(a, b) for i, a in enumerate(cols) for b in cols[i + 1 :]]
    agg_row = df.agg(
        *[F.corr(a, b).alias(f"{i}") for i, (a, b) in enumerate(pairs)]
    ).head()
    spark = df.sparkSession
    return spark.createDataFrame(
        [(a, b, float(agg_row[f"{i}"]) if agg_row[f"{i}"] is not None else None)
         for i, (a, b) in enumerate(pairs)],
        "col_a string, col_b string, corr double",
    )


def quantile_bins(
    df: DataFrame,
    col: str,
    n_bins: int,
    out_col: str = "bin",
    order_tiebreak: Sequence[str] = (),
    exact_ntile: bool = False,
) -> DataFrame:
    """pandas ``qcut`` equivalent: equal-frequency binning. Neither path
    funnels the table through one partition (a bare
    ``ntile().over(Window.orderBy(...))`` plans ``Exchange
    SinglePartition`` — OOM-shaped at scale; plan-asserted against in
    tests/test_plans.py).

    Default path (``exact_ntile=False``): compute the n_bins-1 exact
    percentile boundaries in ONE 1-row aggregate (distributed partial
    aggregation), then assign bins by broadcast comparison — bin k is
    the right-closed interval (b_{k-1}, b_k], pandas-qcut style. Rows
    with equal values always share a bin, so heavy ties make bin sizes
    unequal (exactly as pandas qcut). NULL values get a NULL bin.

    ``exact_ntile=True``: SQL ``ntile`` semantics (bin sizes differ by
    at most 1, ties may split across bins by ``order_tiebreak`` order)
    computed distributed: range-repartition on the sort key, sort
    within partitions, then lift per-partition row numbers to global
    ranks via a driver-collected per-partition offset table (tiny —
    one long per partition) and apply the ntile formula arithmetically.
    Two passes over the sorted data (persisted between), zero
    single-partition stages. The intermediate persist is released by
    Spark's ContextCleaner once the returned frame is no longer
    referenced; call ``.unpersist()`` on the result's lineage
    explicitly in long-lived sessions that bin many tables.
    """
    if not exact_ntile:
        fracs = ", ".join(str(i / n_bins) for i in range(1, n_bins))
        b = df.agg(
            F.expr(f"percentile(`{col}`, array({fracs}))").alias("b")
        ).head()["b"]
        x = F.col(col)
        bin_expr = F.lit(1)
        for edge in b:
            bin_expr = bin_expr + (x > F.lit(float(edge))).cast("int")
        return df.withColumn(
            out_col, F.when(x.isNotNull(), bin_expr).cast("int")
        )

    sort_exprs = [F.col(col), *[F.col(c) for c in order_tiebreak]]
    nparts = df.sparkSession.sparkContext.defaultParallelism
    ordered = (
        df.repartitionByRange(nparts, *sort_exprs)
        .sortWithinPartitions(*sort_exprs)
        .withColumn("__pid", F.spark_partition_id())
        .persist()
    )
    counts = {
        r["__pid"]: r["cnt"]
        for r in ordered.groupBy("__pid").agg(F.count(F.lit(1)).alias("cnt")).collect()
    }
    total = sum(counts.values())
    offsets: dict[int, int] = {}
    acc = 0
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]
    off = F.create_map(
        *[F.lit(v) for kv in offsets.items() for v in kv]
    ) if offsets else F.create_map()
    w = Window.partitionBy("__pid").orderBy(*sort_exprs)
    rn = (F.row_number().over(w) + off[F.col("__pid")] - 1).cast("long")
    base, rem = divmod(total, n_bins)
    head = rem * (base + 1)
    bin_col = (
        F.when(rn < F.lit(head), F.floor(rn / F.lit(base + 1)))
        .otherwise(F.lit(rem) + F.floor((rn - F.lit(head)) / F.lit(max(base, 1))))
        + 1
    )
    return ordered.withColumn(out_col, bin_col.cast("int")).drop("__pid")


def robust_scale(
    df: DataFrame,
    col: str,
    partition_by: Sequence[str] = (),
    out_col: str | None = None,
    exact: bool = True,
) -> DataFrame:
    """Robust standardization: (x - median) / IQR — the outlier-immune
    twin of M1's fit-on-train z-score (sklearn RobustScaler semantics;
    mean/std scaling lets one corrupted magnitude-1e9 cell shift every
    other row's score, median/IQR does not). Zero-IQR groups (constant
    or half-constant data) yield NULL, not a division blow-up.

    Scale shape: the statistics are a per-group aggregate (or a 1-row
    global aggregate) joined back — for the global case a broadcast
    crossJoin, for grouped a key join Spark plans broadcast when the
    group count is small. ``exact=False`` switches to approx_percentile
    (fixed-size mergeable sketch) for the 100 TB path where an exact
    per-group percentile's full value sort per key is not worth it."""
    fn = "percentile" if exact else "approx_percentile"
    stats = [
        F.expr(f"{fn}(`{col}`, 0.5)").alias("__med"),
        F.expr(f"{fn}(`{col}`, 0.75) - {fn}(`{col}`, 0.25)").alias("__iqr"),
    ]
    out = out_col or f"{col}_robust"
    scaled = F.try_divide(F.col(col) - F.col("__med"), F.nullif(F.col("__iqr"), F.lit(0.0)))
    if partition_by:
        g = df.groupBy(*partition_by).agg(*stats)
        joined = df.join(g, list(partition_by))
    else:
        joined = df.crossJoin(F.broadcast(df.agg(*stats)))
    return joined.withColumn(out, scaled).drop("__med", "__iqr")


def iqr_outlier_filter(
    df: DataFrame, col: str, k: float = 1.5, exact: bool = True
) -> DataFrame:
    """Tukey IQR rule: keep rows within
    [Q1 - k*IQR, Q3 + k*IQR] — the describe-based outlier trim of the
    reference's cleaning stages. ``exact=False`` switches to
    approx_percentile for a one-pass sketch at very large scale; the
    quantiles are a 1-row aggregate either way (broadcast into the
    filter, no data shuffle)."""
    fn = "percentile" if exact else "approx_percentile"
    q = df.agg(
        F.expr(f"{fn}({col}, 0.25)").alias("q1"),
        F.expr(f"{fn}({col}, 0.75)").alias("q3"),
    ).head()
    lo, hi = q["q1"] - k * (q["q3"] - q["q1"]), q["q3"] + k * (q["q3"] - q["q1"])
    return df.filter((F.col(col) >= lo) & (F.col(col) <= hi))


def equi_width_histogram(
    df: DataFrame, col: str, lo: float, hi: float, n_bins: int
) -> DataFrame:
    """Equi-width histogram over a fixed [lo, hi] range: one
    map-side-combinable groupBy on the bin id — the distributed
    equivalent of the reference's plt.hist. Fixed edges keep it
    single-pass (a data-derived range would need a min/max pre-pass)
    and make the bin function pure arithmetic, so the same expression
    is re-derivable on any engine. Rows outside [lo, hi] are dropped;
    x == hi lands in the last bin (numpy convention)."""
    width = (hi - lo) / n_bins
    x = F.col(col)
    bin_id = F.least(
        F.floor((x - F.lit(lo)) / F.lit(width)), F.lit(n_bins - 1)
    ).cast("long")
    return (
        df.filter((x >= lo) & (x <= hi))
        .groupBy(bin_id.alias("bin"))
        .agg(F.count(F.lit(1)).alias("cnt"))
        .withColumn("lo_edge", F.lit(lo) + F.col("bin") * F.lit(width))
        .withColumn("hi_edge", F.lit(lo) + (F.col("bin") + 1) * F.lit(width))
        .select("bin", "lo_edge", "hi_edge", "cnt")
    )


def approx_profile(
    df: DataFrame,
    distinct_cols: Sequence[str],
    quantile_col: str,
    quantiles: Sequence[float] = (0.5, 0.95, 0.99),
    accuracy: int = 10000,
) -> DataFrame:
    """One-pass sketch profile of a table: HyperLogLog++ distinct
    counts (approx_count_distinct) + KLL-style quantile sketch
    (approx_percentile), all in a single aggregate. THE way to profile
    100 TB — exact distinct is a full shuffle of every key and exact
    percentiles a global sort, while sketches are fixed-size,
    mergeable, map-side-combined state. Long-form output
    (stat, value); error bounds pinned by tests against exact answers
    at test scale."""
    aggs = [
        F.approx_count_distinct(c).cast("double").alias(f"approx_distinct_{c}")
        for c in distinct_cols
    ]
    for q in quantiles:
        aggs.append(
            F.expr(
                f"approx_percentile({quantile_col}, {q}, {accuracy})"
            ).cast("double").alias(f"approx_p{int(q * 100)}_{quantile_col}")
        )
    aggs.append(F.count(F.lit(1)).cast("double").alias("n_rows"))
    one_row = df.agg(*aggs)
    names = [f.name for f in one_row.schema.fields]
    pairs = ", ".join(f"'{n}', `{n}`" for n in names)
    return one_row.selectExpr(f"stack({len(names)}, {pairs}) AS (stat, value)")


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    keys: Sequence[str],
    compare_cols: Sequence[str] | None = None,
) -> DataFrame:
    """CDC-style diff of two keyed snapshots: one full-outer join on
    ``keys``, rows classified ``added`` (key only in new), ``deleted``
    (only in old), or ``changed`` (both sides, any compare column
    differs under null-safe equality); unchanged rows — the bulk of any
    real snapshot pair — are dropped before they move again. Output
    carries both sides as ``old_<c>`` / ``new_<c>`` columns.

    Scale shape: exactly one shuffle per side (the join on ``keys``);
    the struct equality is a codegen expression so the 'unchanged'
    filter runs inside the join stage, and everything downstream sees
    only the (tiny) change set. This is the engine's answer to audit /
    reconciliation jobs that would otherwise collect both tables."""
    compare_cols = list(
        compare_cols
        if compare_cols is not None
        else [c for c in new.columns if c not in keys]
    )
    o = old.select(*keys, F.struct(*compare_cols).alias("__old"))
    n = new.select(*keys, F.struct(*compare_cols).alias("__new"))
    j = o.join(n, list(keys), "full_outer")
    change = (
        F.when(F.col("__old").isNull(), F.lit("added"))
        .when(F.col("__new").isNull(), F.lit("deleted"))
        .when(~F.col("__old").eqNullSafe(F.col("__new")), F.lit("changed"))
    )
    out = j.withColumn("change_type", change).filter(
        F.col("change_type").isNotNull()
    )
    return out.select(
        *keys,
        "change_type",
        *[F.col(f"__old.{c}").alias(f"old_{c}") for c in compare_cols],
        *[F.col(f"__new.{c}").alias(f"new_{c}") for c in compare_cols],
    )


def mixture_sample(
    df: DataFrame,
    group_col: str,
    key_cols: Sequence[str],
    temperature_coeff: float,
    seed: str = "",
    rate_col: str = "keep_rate",
) -> DataFrame:
    """Sqrt-temperature source mixing (the LLM-corpus rebalancer: keep
    rate proportional to count^(alpha-1) with alpha=0.5, so a source's
    expected kept size is T*sqrt(count) — giant sources are squashed,
    small sources pass through nearly whole). Rate per group is
    min(1, T / sqrt(count_g)); membership uses the engine-portable md5
    bucket of ``weighted_hash_sample``, so any engine re-derives the
    kept set row-for-row. alpha=0.5 is deliberate: sqrt is
    correctly-rounded IEEE everywhere and the rate needs NO
    cross-source normalizing sum, so the whole computation is
    bit-reproducible cross-engine (a pow()-based alpha would not be).

    Scale shape: one map-combinable groupBy for the counts (a handful
    of rows), broadcast back onto the fact table, then a pure codegen
    filter in the scan stage — no shuffle of the corpus itself."""
    counts = df.groupBy(group_col).agg(F.count(F.lit(1)).alias("__n"))
    rate = F.least(
        F.lit(1.0), F.lit(float(temperature_coeff)) / F.sqrt(F.col("__n"))
    )
    joined = df.join(F.broadcast(counts), group_col).withColumn(rate_col, rate)
    return weighted_hash_sample(joined, key_cols, rate_col, seed=seed).drop("__n")


def melt(
    df: DataFrame,
    id_cols: Sequence[str],
    value_cols: Sequence[str],
    var_col: str = "variable",
    val_col: str = "value",
) -> DataFrame:
    """Wide-to-long reshape (pandas ``melt``): each input row becomes
    len(value_cols) rows of (ids..., variable name, value). Wraps the
    built-in ``unpivot``, which lowers to an Expand node — one codegen
    projection emitting N rows per input row, no shuffle, no join, and
    column pruning still reaches the scan (only id+value columns are
    read). Values are cast to their common promoted type, as in SQL
    UNPIVOT. The inverse is ``pivot_agg``."""
    return df.unpivot(
        [F.col(c) for c in id_cols],
        [F.col(c) for c in value_cols],
        var_col,
        val_col,
    )


def zscore_outliers(
    df: DataFrame,
    value_col: str,
    group_by: Sequence[str],
    z: float = 3.0,
    zscore_col: str = "zscore",
) -> DataFrame:
    """Per-group z-score outlier detection: one map-combinable
    aggregate computes each group's mean and sample stddev, broadcast
    back onto the rows (the group cardinality is tiny relative to the
    facts), and rows with |x - mu| > z * sigma survive. The
    z-score itself is kept for ranking/inspection. Groups with zero
    variance (sigma = 0 or a single row) produce no outliers — null
    stddev is filtered, not propagated. Same single-pass shape as
    ``iqr_outlier_filter`` but parametric; at 100 TB the stats pass
    and the filter pass are each one scan, no sort."""
    stats = df.groupBy(*group_by).agg(
        F.avg(value_col).alias("__mu"),
        F.stddev_samp(value_col).alias("__sigma"),
    )
    joined = df.join(F.broadcast(stats), list(group_by))
    score = (F.col(value_col) - F.col("__mu")) / F.col("__sigma")
    return (
        joined.withColumn(zscore_col, score)
        .filter(F.col("__sigma") > 0)
        .filter(F.abs(F.col(zscore_col)) > z)
        .drop("__mu", "__sigma")
    )


def mad_outliers(
    df: DataFrame,
    value_col: str,
    group_by: Sequence[str],
    k: float = 3.5,
    z_col: str = "robust_z",
) -> DataFrame:
    """Robust per-group outliers via the median absolute deviation:
    flag rows with |x - median| > k * 1.4826 * MAD (1.4826 scales MAD
    to sigma under normality, so k is comparable to a z threshold).
    Unlike ``zscore_outliers`` the estimator itself is outlier-proof —
    one wild value inflates a stddev and hides itself, but moves a
    median not at all. Cost: two exact-percentile aggregate passes
    (median, then MAD of the residuals) whose tiny per-group results
    broadcast back onto the facts; exact percentiles are selections,
    so the stats are engine-bit-identical. Zero-MAD groups (a constant
    majority) produce no outliers rather than dividing by zero."""
    med = df.groupBy(*group_by).agg(
        F.expr(f"percentile({value_col}, 0.5)").alias("__med")
    )
    j = df.join(F.broadcast(med), list(group_by))
    mad = j.groupBy(*group_by).agg(
        F.expr(f"percentile(abs({value_col} - __med), 0.5)").alias("__mad")
    )
    j2 = j.join(F.broadcast(mad), list(group_by))
    z = (F.col(value_col) - F.col("__med")) / (F.lit(1.4826) * F.col("__mad"))
    return (
        j2.filter(F.col("__mad") > 0)
        .withColumn(z_col, z)
        .filter(F.abs(F.col(z_col)) > k)
        .drop("__med", "__mad")
    )


def winsorize(
    df: DataFrame,
    value_col: str,
    group_by: Sequence[str],
    lower_q: float = 0.01,
    upper_q: float = 0.99,
    out_col: str | None = None,
) -> DataFrame:
    """Per-group winsorization: clip values into the group's
    [lower_q, upper_q] exact quantiles instead of dropping them — the
    outlier treatment that preserves row count (``iqr_outlier_filter``
    and ``mad_outliers`` are the dropping/flagging siblings). One
    percentile aggregate per group broadcast back, then a pure
    least/greatest clamp — no sort of the fact table, no second
    shuffle. At 100 TB swap ``percentile`` for ``approx_percentile``
    at the call site if the per-group exact sort-spill matters; the
    clamp itself is unchanged."""
    q = df.groupBy(*group_by).agg(
        F.expr(f"percentile({value_col}, {lower_q})").alias("__lo"),
        F.expr(f"percentile({value_col}, {upper_q})").alias("__hi"),
    )
    out = out_col or f"{value_col}_w"
    return (
        df.join(F.broadcast(q), list(group_by))
        .withColumn(
            out,
            F.least(F.greatest(F.col(value_col), F.col("__lo")), F.col("__hi")),
        )
        .drop("__lo", "__hi")
    )


def merge_aggregate_state(
    state: DataFrame | None,
    delta: DataFrame,
    keys: Sequence[str],
    sum_cols: Sequence[str] = (),
    min_cols: Sequence[str] = (),
    max_cols: Sequence[str] = (),
    count_col: str = "n",
) -> DataFrame:
    """Incremental rollup maintenance: fold a raw DELTA batch into a
    materialized aggregate STATE without touching historical raw data —
    the lakehouse incremental-ETL pattern (nightly base + hourly
    deltas). Works for any MERGEABLE aggregate: counts and sums add,
    min/max take extrema; avg derives as sum/n downstream. (Exact
    count-distinct is NOT mergeable — use HLL sketches for that.)

    state=None bootstraps from the delta alone. The merged result has
    one row per key and the same schema either way, so the output IS
    next cycle's state: write it with write_parquet / merge_upsert.

    Scale shape: the delta aggregates first (map-side combine on the
    small new data), then one keyed union+re-aggregate with the state
    table — cost is O(|delta| + |state|), independent of how much raw
    history the state summarizes. Parity with a full recompute over
    base+delta is asserted in tests/test_relational.py.
    """
    ks = list(keys)
    aggs = (
        [F.count(F.lit(1)).cast("long").alias(count_col)]
        + [F.sum(c).alias(c) for c in sum_cols]
        + [F.min(c).alias(c) for c in min_cols]
        + [F.max(c).alias(c) for c in max_cols]
    )
    delta_agg = delta.groupBy(*ks).agg(*aggs)
    if state is None:
        return delta_agg
    merged = state.select(delta_agg.columns).unionByName(delta_agg)
    re_aggs = (
        [F.sum(count_col).cast("long").alias(count_col)]
        + [F.sum(c).alias(c) for c in sum_cols]
        + [F.min(c).alias(c) for c in min_cols]
        + [F.max(c).alias(c) for c in max_cols]
    )
    return merged.groupBy(*ks).agg(*re_aggs)


def merge_distinct_state(
    delta: DataFrame,
    state: DataFrame | None,
    keys: Sequence[str],
    distinct_cols: Sequence[str],
    lgk: int = 12,
) -> DataFrame:
    """Incremental DISTINCT-COUNT maintenance — the piece
    ``merge_aggregate_state`` explicitly cannot do (exact count-distinct
    is not mergeable: |A ∪ B| ≠ |A| + |B|). Per key, each distinct
    column is summarized as a DataSketches HLL sketch (binary column,
    ~2^lgk bytes max); folding a delta is ``hll_union_agg`` — register
    max-merge, commutative and associative, so ANY fold order yields
    the identical sketch and estimate (asserted in tests). The merged
    output has the same schema as the state: write it back as next
    cycle's state.

    Scale shape: delta aggregates first (map-side combined sketches on
    the new data only), then one keyed union+re-aggregate with the
    state — O(|delta| + |state| · sketch_size), independent of raw
    history size. Read estimates off the state with
    ``distinct_state_estimates``; error is the standard HLL bound
    (~1.04/sqrt(2^lgk), ~1.6% at the lgk=12 default)."""
    ks = list(keys)
    delta_agg = delta.groupBy(*ks).agg(
        *[
            F.expr(f"hll_sketch_agg(`{c}`, {lgk})").alias(f"__hll_{c}")
            for c in distinct_cols
        ]
    )
    if state is None:
        return delta_agg
    merged = state.select(delta_agg.columns).unionByName(delta_agg)
    return merged.groupBy(*ks).agg(
        *[
            F.expr(f"hll_union_agg(`__hll_{c}`)").alias(f"__hll_{c}")
            for c in distinct_cols
        ]
    )


def distinct_state_estimates(
    state: DataFrame, distinct_cols: Sequence[str]
) -> DataFrame:
    """Read per-key approximate distinct counts off a
    ``merge_distinct_state`` table: sketch -> estimate, keys preserved,
    sketch columns dropped."""
    out = state
    for c in distinct_cols:
        out = out.withColumn(
            f"approx_distinct_{c}",
            F.expr(f"hll_sketch_estimate(`__hll_{c}`)").cast("long"),
        )
    return out.drop(*[f"__hll_{c}" for c in distinct_cols])


def skew_report(
    df: DataFrame, key_cols: Sequence[str], top: int = 10
) -> DataFrame:
    """Join/aggregation skew diagnostic — the 'do I need salted_join /
    AQE skew handling?' answer as data. One groupBy pass over the keys
    yields, per hot key: its row count, share of the table, and the
    ratio to a perfectly uniform key's share (skew_x — a key at
    skew_x ~ 1 is harmless, a key at 100x will make one reducer run
    100x longer than the median). Returns the ``top`` hottest keys
    descending; feed the worst offenders to salted_join's salt count.
    """
    ks = list(key_cols)
    counts = df.groupBy(*ks).agg(F.count(F.lit(1)).alias("key_rows"))
    totals = counts.agg(
        F.sum("key_rows").alias("__total"), F.count(F.lit(1)).alias("__nkeys")
    )
    return (
        counts.crossJoin(F.broadcast(totals))
        .select(
            *ks,
            "key_rows",
            F.round(F.col("key_rows") / F.col("__total"), 6).alias("share"),
            F.round(
                F.col("key_rows") / (F.col("__total") / F.col("__nkeys")), 4
            ).alias("skew_x"),
        )
        .orderBy(F.col("key_rows").desc(), *ks)
        .limit(top)
    )


def weighted_sample_exact_k(
    df: DataFrame,
    weight_col: str,
    k: int,
    partition_by: Sequence[str] = (),
    id_cols: Sequence[str] = (),
    seed: int = 42,
) -> DataFrame:
    """EXACTLY-k weighted sampling without replacement per group
    (Efraimidis & Spirakis 2006 A-ES): each row draws key u^(1/w) with
    u uniform in (0,1); the k largest keys per group are the sample —
    provably equivalent to sequential weighted draws without
    replacement. Complements the per-row Bernoulli samplers (those
    give k only in expectation; this gives the contract 'hand me
    exactly 10_000 docs per source, weight-proportional').

    u derives from xxhash64(id_cols, seed) — not rand() — so retried
    tasks, different partitionings, and re-runs select the SAME rows
    (rand() re-draws on recompute, silently changing the sample
    mid-job: the classic Spark sampling bug).

    Rows with NULL or non-positive weight are excluded up front: w=0
    means zero selection probability under A-ES, and a negative w
    would invert the key ordering (u^(1/w) > 1), silently promoting
    invalid rows to the top of the sample.

    Scale shape: grouped path is one top-k window per group (gets the
    WindowGroupLimit rank-filter rewrite — plan-asserted); ungrouped
    path is orderBy+limit, which Spark executes as
    TakeOrderedAndProject (per-partition partial top-k, no global
    sort, no single-partition window).
    """
    ids = [F.col(c) for c in id_cols] if id_cols else [F.col(c) for c in df.columns]
    # u in (0,1): 53-bit mantissa slice of the hash, never exactly 0
    u = (
        F.pmod(F.xxhash64(*ids, F.lit(seed)), F.lit(1 << 53)).cast("double")
        + F.lit(1.0)
    ) / F.lit(float((1 << 53) + 1))
    key = F.pow(u, F.lit(1.0) / F.col(weight_col))
    keyed = df.filter(F.col(weight_col) > 0).withColumn("__aes_key", key)
    if not partition_by:
        return keyed.orderBy(F.col("__aes_key").desc()).limit(k).drop("__aes_key")
    w = Window.partitionBy(*partition_by).orderBy(F.col("__aes_key").desc())
    return (
        keyed.withColumn("__aes_rn", F.row_number().over(w))
        .filter(F.col("__aes_rn") <= k)
        .drop("__aes_key", "__aes_rn")
    )


def budget_prefix_sample(
    df: DataFrame,
    key_cols: Sequence[str],
    weight_col: str,
    group_col: str,
    budgets: dict | None = None,
    seed: str = "",
    buckets: int = 1024,
    budget_fracs: dict | float | None = None,
) -> DataFrame:
    """EXACT per-group budget selection (the training-data assembly
    contract: "hand me at most N tokens per domain, deterministically"):
    within each group, rows are ordered by the engine-portable md5 hash
    of ``key_cols`` (same convention as ``hash_sample``) and the maximal
    prefix whose cumulative ``weight_col`` stays <= the group's budget
    is kept. Complements ``mixture_sample`` (probabilistic,
    expected-size) and ``weighted_sample_exact_k`` (exact row count):
    this one enforces an exact WEIGHT cap — the unit a token budget is
    actually written in.

    Budgets come in one of two forms (exactly one must be given):
    ``budgets`` maps group -> absolute weight cap; ``budget_fracs``
    maps group -> fraction of THAT group's total weight (a single float
    applies one fraction to every group present). Fractional budgets
    resolve to floor(frac * group_total) in exact decimal arithmetic
    from the same stats pass the boundary search already needs — no
    second scan of the corpus.

    Determinism and engine portability: all weight arithmetic runs in
    fixed-point DECIMAL(38,6) — weights are rounded HALF_UP to 6
    decimals at ingestion, and decimal sums are exact, so the kept set
    is independent of accumulation order (a double-precision cumsum is
    NOT: the bucketed plan and the definitional row-order window would
    disagree on knife-edge rows). Any system re-derives the kept set
    row-for-row with: cast weights to DECIMAL(38,6), cumulative-sum in
    portable-md5 order, keep cum <= budget.

    Scale shape — the naive plan (one cumulative-sum window per group)
    sorts every group in full: a per-domain total sort of a 100 TB
    corpus. Instead the hash's high bits range-bucket each group into
    ``buckets`` slices whose ordering IS the hash ordering; one
    map-combinable aggregate yields per-(group, bucket) weight totals
    (<= groups x buckets tiny rows to the driver), a driver-side prefix
    scan finds each group's boundary bucket, and only THAT bucket's
    rows (~1/buckets of the group) flow through the cumulative window.
    Fully-kept buckets pass a pure codegen filter in the scan stage.
    Groups absent from the budget spec are dropped (explicit allowlist
    semantics); NULL or negative weights raise (a negative weight makes
    the cumulative prefix non-monotone, so "budget" stops meaning
    anything). ``key_cols`` should uniquely identify rows: the
    cumulative window's default RANGE frame makes exact ties share one
    cumulative value (identically in any SQL engine, so oracle parity
    holds either way — but the "maximal prefix" reading assumes unique
    keys).
    """
    from decimal import ROUND_FLOOR, ROUND_HALF_UP, Decimal

    if (budgets is None) == (budget_fracs is None):
        raise ValueError(
            "budget_prefix_sample: give exactly one of budgets (absolute "
            "caps) or budget_fracs (fraction of each group's total)"
        )
    n_bits = buckets.bit_length() - 1
    if buckets <= 0 or (1 << n_bits) != buckets or n_bits > 30:
        raise ValueError(
            "budget_prefix_sample: buckets must be a power of two "
            f"<= 2^30 (the hash has 32 bits to slice), got {buckets}"
        )
    w = F.col(weight_col)
    # Fixed-point ingestion: every sum downstream is exact (decimal),
    # hence order-independent and identical to any other engine's.
    w_dec = w.cast("decimal(28,6)")
    h = portable_hash32(key_cols, seed)
    bucket = F.shiftright(h, 32 - n_bits)
    hashed = df.withColumn("__bps_h", h).withColumn("__bps_b", bucket)
    # NaN sorts ABOVE every number in Spark comparisons (so it passes a
    # plain w >= 0), and a double Infinity casts to decimal as SILENT
    # NULL under ANSI — both would corrupt the totals without an error;
    # reject the whole class alongside NULL and negatives.
    w_bad = w.isNull() | nonfinite_or_negative(w)
    stats = (
        hashed.groupBy(group_col, "__bps_b")
        .agg(
            F.sum(F.when(w_bad, 1).otherwise(0)).alias("n_bad"),
            F.sum(F.when(~w_bad, w_dec)).alias("total"),
        )
        .collect()
    )
    n_bad = sum(r["n_bad"] for r in stats)
    if n_bad:
        raise ValueError(
            f"budget_prefix_sample: {n_bad} row(s) have NULL, NaN, "
            f"infinite or negative {weight_col} — the cumulative prefix "
            "is only meaningful for finite non-negative weights; filter "
            "or clamp them first"
        )
    per_group: dict = {}
    for r in stats:
        tot = r["total"] if r["total"] is not None else Decimal(0)
        per_group.setdefault(r[group_col], []).append((r["__bps_b"], Decimal(tot)))
    # Resolve the budget per group in exact decimal (6-dp HALF_UP, the
    # same rounding Spark's decimal cast applies to the weights).
    q6 = Decimal("0.000001")
    resolved: dict = {}
    if budgets is not None:
        for g_key, b in budgets.items():
            resolved[g_key] = Decimal(str(b)).quantize(q6, rounding=ROUND_HALF_UP)
    else:
        for g_key, lst in per_group.items():
            if isinstance(budget_fracs, dict):
                if g_key not in budget_fracs:
                    continue
                frac = Decimal(str(budget_fracs[g_key]))
            else:
                frac = Decimal(str(budget_fracs))
            total_g = sum((t for _, t in lst), Decimal(0))
            resolved[g_key] = (frac * total_g).to_integral_value(rounding=ROUND_FLOOR)
    full_lim, boundary, offset = {}, {}, {}
    for g_key, lst in per_group.items():
        if g_key not in resolved:
            continue
        b = resolved[g_key]
        running = Decimal(0)
        lim = None
        for bkt, tot in sorted(lst):
            if running + tot <= b:
                running += tot
                lim = bkt + 1
            else:
                boundary[g_key] = bkt
                offset[g_key] = running
                break
        if lim is not None:
            full_lim[g_key] = lim
    if not full_lim and not boundary:
        return df.limit(0)

    _lit_map = lit_map
    g = F.col(group_col)
    kept_full = (
        hashed.filter(F.col("__bps_b") < _lit_map(full_lim)[g])
        if full_lim
        else hashed.limit(0)
    )
    if boundary:
        # Only the boundary bucket per group is sorted — ~1/buckets of
        # each group's rows; the window partitions on the group key.
        order_cols = [F.col("__bps_h"), *[F.col(c) for c in key_cols]]
        win = Window.partitionBy(group_col).orderBy(*order_cols)
        cum = F.sum(w_dec).over(win) + _lit_map(offset)[g]
        kept_boundary = (
            hashed.filter(F.col("__bps_b") == _lit_map(boundary)[g])
            .withColumn("__bps_cum", cum)
            .filter(F.col("__bps_cum") <= _lit_map(resolved)[g])
            .drop("__bps_cum")
        )
        kept = kept_full.unionByName(kept_boundary)
    else:
        kept = kept_full
    return kept.drop("__bps_h", "__bps_b")


def incremental_join_delta(
    left_base: DataFrame,
    left_delta: DataFrame,
    right_base: DataFrame,
    right_delta: DataFrame,
    keys: Sequence[str],
) -> DataFrame:
    """Incremental INNER-join maintenance: the NEW rows a materialized
    join gains when both inputs receive append-only deltas, without
    re-joining the two base tables —
        delta(A >< B) = dA >< B  UNION ALL  A >< dB  UNION ALL  dA >< dB.
    Append the result to the materialized join and it equals the full
    recompute over (A+dA) >< (B+dB) (parity-asserted in
    tests/test_relational.py).

    This is the join half of the lakehouse incremental-ETL pattern
    (merge_aggregate_state is the rollup half): per refresh cycle the
    cost is O(|dA| x matchrate + |dB| x matchrate), independent of the
    accumulated base sizes — the property that keeps an hourly refresh
    of a 100 TB join affordable. The three part-joins are keyed
    equi-joins (broadcast when a delta is small — AQE decides from the
    delta's actual size); bases are scanned once each, never joined to
    each other. Only valid for append-only deltas: updates/deletes need
    the CDC operators (snapshot_diff + merge_upsert) upstream.
    """
    ks = list(keys)
    new_left = left_delta.join(right_base, ks)
    new_right = left_base.join(right_delta, ks)
    new_both = left_delta.join(right_delta, ks)
    # Column order: align all three to the first part-join's schema.
    cols = new_left.columns
    return (
        new_left.select(cols)
        .unionByName(new_right.select(cols))
        .unionByName(new_both.select(cols))
    )


class JoinBloom(NamedTuple):
    """A prebuilt join filter: the word array TOGETHER with the
    num_bits/num_hashes it was built with. Probe parameters come from
    this object, never re-specified — a mismatched value at probe time
    tests the wrong bits and silently DELETES matching rows. num_bits
    is stored explicitly because len(words)*64 rounds UP to the word
    boundary and would disagree with a build whose num_bits was not a
    multiple of 64 (positions are taken mod num_bits).

    ``bc`` is the Broadcast handle of ``words``, created ONCE by
    build_join_bloom and reused by every bloom_filtered_join call that
    receives this object — prebuilt reuse saves both the build job AND
    broadcast accumulation on a long-lived driver. None only for a
    hand-constructed JoinBloom, in which case each join call broadcasts
    its own copy."""

    words: "object"
    num_bits: int
    num_hashes: int
    bc: "object" = None


def _join_key_expr(on: Sequence[str]) -> Column:
    """THE join-key derivation shared by bloom build and probe — the
    two sides must stay byte-identical or probes test the wrong bits
    and silently delete matching rows; keep it in one place."""
    return F.concat_ws("\x1f", *[F.col(c).cast("string") for c in on])


def build_join_bloom(
    small: DataFrame,
    on: Sequence[str],
    num_bits: int = 1 << 22,
    num_hashes: int = 5,
) -> JoinBloom:
    """Build (once) the bloom filter for ``bloom_filtered_join``'s
    ``prebuilt`` — same key derivation as the join's probe side,
    so a long-lived driver builds per small-side snapshot, then reuses
    across refresh cycles without accumulating broadcasts."""
    from big_data_analysis_spark.operators.dedup import bloom_build

    key = _join_key_expr(on)
    words = bloom_build(small.select(key.alias("__k")), "__k", num_bits, num_hashes)
    bc = small.sparkSession.sparkContext.broadcast(words)
    return JoinBloom(words, num_bits, num_hashes, bc)


def bloom_filtered_join(
    big: DataFrame,
    small: DataFrame,
    on: Sequence[str],
    how: str = "inner",
    num_bits: int = 1 << 22,
    num_hashes: int = 5,
    prebuilt: "JoinBloom | None" = None,
) -> DataFrame:
    """Join with a Bloom runtime filter: build a fixed-size bloom of the
    SMALL side's join keys (distributed bit_or build, bounded driver
    state), broadcast it, and drop big-side rows map-side BEFORE the
    join shuffle. The classic 100 TB selective-join move for the regime
    where the small side is too big to broadcast exactly but its key
    set fits a few-hundred-KiB filter: the fact table's shuffle volume
    drops to (matching rows + false positives) instead of everything.

    The broadcast bloom lives for the Spark application's lifetime
    (it cannot be destroyed before the lazy plan executes). A
    long-lived driver looping refresh cycles must reuse one filter per
    small-side snapshot rather than rebuilding (and re-broadcasting)
    per query — pass ``prebuilt`` (the JoinBloom from
    ``build_join_bloom``) to skip the eager build; the API exists
    precisely so repeated calls don't accumulate broadcasts. BOTH
    probe parameters (num_bits, num_hashes) are derived from the
    JoinBloom itself, never from this call's arguments — re-specifying
    them could drift from the build and silently delete matching rows.

    Join semantics are exactly ``big.join(small, on, how)``: false
    positives survive the pre-filter but are eliminated by the real
    join (parity-asserted in tests); false negatives cannot occur.
    Only ``inner`` and ``left_semi`` are accepted — for outer/anti
    joins the pre-filter would DELETE legitimate non-matching rows.
    Composite keys hash as a unit-separated concat, matching build and
    probe sides bit-for-bit (same xxhash64 family, JVM-side).
    """
    if how not in ("inner", "left_semi", "semi", "leftsemi"):
        raise ValueError(
            f"bloom_filtered_join: how={how!r} would drop non-matching "
            "big-side rows at the pre-filter; only inner/left_semi are sound"
        )
    import numpy as np

    from big_data_analysis_spark.operators.dedup import (
        _bloom_positions,
        bloom_build,
        bloom_contains,
    )

    def key_expr() -> Column:
        return _join_key_expr(on)

    if prebuilt is None:
        words = bloom_build(
            small.select(key_expr().alias("__k")), "__k", num_bits, num_hashes
        )
        bc = big.sparkSession.sparkContext.broadcast(words)
    else:
        if not isinstance(prebuilt, JoinBloom):
            raise TypeError(
                "bloom_filtered_join: prebuilt must be the JoinBloom from "
                "build_join_bloom — a raw word array cannot carry the "
                "num_hashes it was built with, and a probe/build mismatch "
                "silently deletes matching rows"
            )
        num_hashes = prebuilt.num_hashes
        num_bits = prebuilt.num_bits
        # Reuse the JoinBloom's own Broadcast (created once at build):
        # repeated joins against the same prebuilt filter accumulate
        # ZERO new broadcast state (ADVICE r5). A hand-constructed
        # JoinBloom without a handle falls back to broadcasting here.
        bc = (
            prebuilt.bc
            if prebuilt.bc is not None
            else big.sparkSession.sparkContext.broadcast(prebuilt.words)
        )

    @F.pandas_udf("boolean")
    def might_contain(pos_lists: pd.Series) -> pd.Series:
        # Every row has exactly num_hashes positions, so the whole
        # Arrow batch vectorizes into ONE (n, k) bit-test — this UDF
        # runs per big-side row on the map-side hot path; a per-row
        # Python call would dominate the bit test itself.
        if len(pos_lists) == 0:
            return pd.Series([], dtype=bool)
        p = np.asarray(pos_lists.tolist(), dtype=np.int64)
        return pd.Series(bloom_contains(bc.value, p))

    # Same Catalyst caveat as the decontamination probe: a deterministic
    # UDF under a filter gets cloned below upstream Exchanges; marking
    # nondeterministic only disables that rewrite.
    might_contain = might_contain.asNondeterministic()
    pre = big.filter(
        might_contain(_bloom_positions(key_expr(), num_bits, num_hashes))
    )
    return pre.join(small, list(on), how)


def weighted_quantiles(
    df: DataFrame,
    value_col: str,
    weight_col: str,
    qs: Sequence[float],
    partition_by: Sequence[str] = (),
) -> DataFrame:
    """EXACT weighted quantiles per group — the importance-weighted
    percentile an upweighted/duplicated-document corpus needs where the
    unweighted percentile misreports the distribution: quantile(q) =
    the smallest value whose cumulative weight reaches q x total weight
    (the weighted generalization of the lower/inverse-CDF quantile).

    Engine-portable and accumulation-order-free: weights sum in
    fixed-point DECIMAL (the ``budget_prefix_sample`` convention) and
    the q x total threshold is a DECIMAL product, so the selected value
    is identical in any SQL engine — and, because the output is a
    SELECTED value (never an arithmetic combination), it is
    bit-identical, not merely within rounding.

    Semantics: NULL values are excluded (they have no place on the
    CDF); NULL / NaN / negative weights RAISE per-row (a negative
    weight breaks CDF monotonicity); zero-weight rows are kept but can
    never be selected except when they tie a selected value. Ties share
    one cumulative weight (RANGE frame = the value-level CDF), so
    duplicated values behave as one CDF step of their combined mass.

    Scale shape: ONE shuffle on the group keys; the ordered cumulative
    window and the per-q conditional-min aggregate reuse the same
    partitioning (no second exchange). ``partition_by=()`` computes one
    global CDF through a single partition — at scale always pass group
    keys, or pre-aggregate to per-value weights first (the CDF only
    needs the value-level table).
    """
    from decimal import Decimal

    if not qs:
        raise ValueError("weighted_quantiles: qs must be non-empty")
    for q in qs:
        if not (0.0 < q <= 1.0):
            raise ValueError(f"weighted_quantiles: q must be in (0, 1], got {q}")
        if -Decimal(str(q)).as_tuple().exponent > 6:
            raise ValueError(
                f"weighted_quantiles: q={q} has more than 6 decimal places — "
                "the fixed-point threshold is exact only at 1e-6 granularity; "
                "silently rounding q would answer a different quantile"
            )
    keys = list(partition_by)
    v = F.col(value_col)
    w_raw = F.col(weight_col)
    bad = w_raw.isNull() | nonfinite_or_negative(w_raw)
    bad_msg = F.concat(
        F.lit(
            f"weighted_quantiles: NULL, NaN, infinite or negative "
            f"{weight_col} — the weighted CDF needs finite non-negative "
            "weights; got "
        ),
        F.coalesce(w_raw.cast("string"), F.lit("NULL")),
    )
    # The weight guard lives INSIDE the value filter so it fires for
    # EVERY input row — a corrupt weight must raise even when its value
    # is NULL (the docstring's per-row validation contract).
    keep = F.when(bad, F.raise_error(bad_msg).cast("boolean")).otherwise(
        v.isNotNull()
    )
    w_dec = w_raw.cast("decimal(28,6)")
    w_all = Window.partitionBy(*keys)
    # RANGE frame (default with orderBy): equal values share the
    # cumulative weight of their whole tie group — the value-level CDF.
    w_ord = Window.partitionBy(*keys).orderBy(v)
    base = (
        df.filter(keep)
        .withColumn("__wq_cum", F.sum(w_dec).over(w_ord))
        .withColumn("__wq_tot", F.sum(w_dec).over(w_all))
    )
    aggs = []
    # Decimal-precision discipline (verified on a knife-edge repro:
    # weights .999999/2.000002, q=.333333): Spark rounds ANY decimal
    # step whose result type would exceed 38 digits (allowPrecisionLoss)
    # — including the >= COMPARISON's common type, not just the
    # multiply. Keep every operand small enough that product (7,6) x
    # (26,6) -> (34,12) and comparison (26,6) vs (34,12) -> (36,12)
    # both stay inside the cap, so threshold and comparison are EXACT.
    # The (26,6) downcasts are lossless below 1e20 total weight; ANSI
    # mode makes an overflow loud, never silent.
    cum_c = F.col("__wq_cum").cast("decimal(26,6)")
    for q in qs:
        thr = (
            F.lit(str(Decimal(str(q)))).cast("decimal(7,6)")
            * F.col("__wq_tot").cast("decimal(26,6)")
        )
        name = f"wq_{str(q).replace('.', '_')}"
        aggs.append(F.min(F.when(cum_c >= thr, v)).alias(name))
    return base.groupBy(*keys).agg(*aggs)


def gini_coefficient(
    df: DataFrame,
    value_col: str,
    partition_by: Sequence[str] = (),
    round_to: int | None = 6,
) -> DataFrame:
    """Gini concentration coefficient per group — the inequality
    certificate business reviews ask of any "share of revenue by
    customer" question: 0 = perfectly even, ->1 = one entity holds
    everything. Computed by the rank formula on ascending-sorted
    values: G = (2 * sum(i * x_i)) / (n * sum(x)) - (n + 1) / n, with
    ties broken deterministically by value order (the formula is
    tie-order-invariant: equal values swap equal contributions).

    Exactness: values are summed in fixed-point DECIMAL(28,6) — both
    sum(x) and the rank-weighted sum(i * x_i) are exact and
    accumulation-order-free, so the only floating-point steps are the
    two final divisions of identical decimals (bit-identical in any
    engine). Negative values raise per-row: the coefficient is only
    meaningful on non-negative quantities. NULLs are excluded; a group
    with no rows or zero total is absent / NULL respectively (0/0 has
    no inequality reading).

    Scale shape: one shuffle on the group keys; the rank window and
    the final aggregate share that partitioning. Like every ranking
    construction, ``partition_by=()`` funnels one global sort — group
    or pre-aggregate first at scale.
    """
    keys = list(partition_by)
    x_raw = F.col(value_col)
    keep = F.when(
        x_raw.isNotNull() & nonfinite_or_negative(x_raw),
        F.raise_error(
            F.concat(
                F.lit(
                    f"gini_coefficient: NaN, infinite or negative "
                    f"{value_col} — the coefficient is defined on finite "
                    "non-negative values; got "
                ),
                x_raw.cast("string"),
            )
        ).cast("boolean"),
    ).otherwise(x_raw.isNotNull())
    x = x_raw.cast("decimal(28,6)")
    w_ord = Window.partitionBy(*keys).orderBy(x_raw)
    ranked = df.filter(keep).select(
        *keys,
        x.alias("__x"),
        F.row_number().over(w_ord).alias("__i"),
    )
    agg = ranked.groupBy(*keys).agg(
        F.count(F.lit(1)).cast("long").alias("n_obs"),
        F.sum("__x").alias("__sx"),
        F.sum(F.col("__i") * F.col("__x")).alias("__six"),
    )
    n = F.col("n_obs")
    g = (
        F.lit(2.0) * F.col("__six").cast("double")
        / (n * F.col("__sx").cast("double"))
        - (n + F.lit(1.0)) / n
    )
    g = F.when(F.col("__sx") > 0, g)
    if round_to is not None:
        g = F.round(g, round_to)
    return agg.select(*keys, "n_obs", g.alias("gini"))
