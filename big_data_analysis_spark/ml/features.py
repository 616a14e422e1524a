"""Feature-engineering operators beyond the VectorAssembler pipeline
(SURVEY.md §2.10 M1 adjacency): column-level encodings and scalings
that stay plain DataFrame columns — usable in SQL, joins, and exports,
not locked inside ml.linalg vectors.

Each op is one aggregate pass + one broadcast-back join (or a window),
so the cost model is flat: no per-row Python, no per-group model fits.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def target_encode_loo(
    df: DataFrame,
    group_col: str,
    target_col: str,
    out_col: str = "target_enc",
    prior_weight: float = 0.0,
) -> DataFrame:
    """Leave-one-out target (mean) encoding of a categorical column:
    each row gets the mean of ``target_col`` over its OWN group with
    the row itself excluded — (sum_g − y) / (n_g − 1) — the standard
    leakage-guarded form (plain group means leak each row's own label
    into its feature; LOO removes exactly that term).

    Singleton groups have no leave-one-out mean: null when
    ``prior_weight`` is 0, else smoothed toward the global mean with
    weight ``prior_weight`` (Micci-Barreca-style shrinkage:
    (sum_g − y + w·μ) / (n_g − 1 + w)), which also regularizes rare
    groups.

    Plan: one window aggregate over ``group_col`` (sum + count per
    group, broadcast within the shuffle partition — one shuffle total)
    plus, when smoothing, a scalar global-mean aggregate joined in as a
    literal-like 1-row broadcast.
    """
    w = Window.partitionBy(group_col)
    sum_g = F.sum(target_col).over(w)
    n_g = F.count(F.lit(1)).over(w)
    if prior_weight > 0:
        mu = df.agg(F.avg(target_col).alias("__mu"))
        out = df.crossJoin(F.broadcast(mu))
        enc = (sum_g - F.col(target_col) + F.lit(prior_weight) * F.col("__mu")) / (
            n_g - 1 + F.lit(prior_weight)
        )
        return out.withColumn(out_col, enc).drop("__mu")
    enc = F.try_divide(sum_g - F.col(target_col), (n_g - 1).cast("double"))
    return df.withColumn(out_col, enc)


def minmax_scale(
    df: DataFrame, cols: Sequence[str], suffix: str = "_scaled"
) -> DataFrame:
    """Min-max scale numeric columns to [0, 1] — (x − min) / (max − min)
    — with constant columns yielding null (no defined scale) via
    try_divide. ALL columns' mins and maxes come from ONE aggregate
    pass; the 1-row stats frame is broadcast back, so the data itself
    is never shuffled.
    """
    aggs = []
    for c in cols:
        aggs += [F.min(c).alias(f"__min_{c}"), F.max(c).alias(f"__max_{c}")]
    stats = df.agg(*aggs)
    out = df.crossJoin(F.broadcast(stats))
    for c in cols:
        out = out.withColumn(
            f"{c}{suffix}",
            F.try_divide(
                F.col(c) - F.col(f"__min_{c}"),
                F.col(f"__max_{c}") - F.col(f"__min_{c}"),
            ),
        )
    return out.drop(*[f"__min_{c}" for c in cols], *[f"__max_{c}" for c in cols])
