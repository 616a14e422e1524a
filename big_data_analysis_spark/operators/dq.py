"""Data-quality audit operators: the constraint checks a production
ingest runs before trusting a batch (referential integrity, key
uniqueness, null/domain rules).

Scale design: every audit primitive is ONE scan of the audited table.
``predicate_audit`` folds any number of named predicates into a single
aggregate (same one-pass trick as the per-column null counts, SURVEY
D4) and unpivots with ``stack``; ``orphan_count`` is a left join
against the parent's distinct keys (map-side combinable, no second
child scan); ``duplicate_key_count`` is one groupBy. All return the
same long-form schema ``(check_name, violations, total)`` so
``audit_union`` can stack them into a single report DataFrame — the
whole audit stays one lazy DAG.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def predicate_audit(df: DataFrame, checks: dict[str, Column]) -> DataFrame:
    """Count rows violating each named predicate in ONE scan.

    ``checks`` maps check_name -> boolean Column that is true when the
    row VIOLATES the rule. Returns long-form (check_name, violations,
    total) with one row per check; ``total`` is the table row count so
    a downstream consumer can compute violation rates.
    """
    aggs = [
        F.sum(F.when(cond, F.lit(1)).otherwise(F.lit(0))).cast("long").alias(name)
        for name, cond in checks.items()
    ]
    one_row = df.agg(*aggs, F.count(F.lit(1)).cast("long").alias("__total"))
    pairs = ", ".join(f"'{name}', `{name}`" for name in checks)
    return one_row.selectExpr(
        f"stack({len(checks)}, {pairs}) AS (check_name, violations)",
        "__total AS total",
    ).select("check_name", "violations", "total")


def orphan_count(
    child: DataFrame, parent: DataFrame, on: dict[str, str], check_name: str
) -> DataFrame:
    """Referential-integrity check: child rows whose FK has no match in
    the parent. ``on`` maps child FK column -> parent PK column.

    One scan of each side: the parent is reduced to distinct keys
    (partial-aggregated map-side) and left-joined; a missing hit marks
    an orphan. Counting via the join rather than an anti-join + second
    total scan keeps it single-pass over the child.
    """
    keys = (
        parent.select(*[F.col(pk).alias(fk) for fk, pk in on.items()])
        .distinct()
        .withColumn("__hit", F.lit(1))
    )
    fks = list(on)
    joined = child.select(*fks).join(keys, fks, "left")
    return joined.agg(
        F.lit(check_name).alias("check_name"),
        F.sum(F.when(F.col("__hit").isNull(), 1).otherwise(0)).cast("long").alias("violations"),
        F.count(F.lit(1)).cast("long").alias("total"),
    )


def duplicate_key_count(
    df: DataFrame, keys: list[str], check_name: str
) -> DataFrame:
    """Primary-key uniqueness check: ``violations`` = number of SURPLUS
    rows (sum of count-1 over duplicated key groups, i.e. how many rows
    a dedup would remove), ``total`` = table row count. One groupBy on
    the key (map-side combined)."""
    per_key = df.groupBy(*keys).agg(F.count(F.lit(1)).alias("__cnt"))
    return per_key.agg(
        F.lit(check_name).alias("check_name"),
        F.sum(F.col("__cnt") - F.lit(1)).cast("long").alias("violations"),
        F.sum("__cnt").cast("long").alias("total"),
    )


def audit_union(reports: list[DataFrame]) -> DataFrame:
    """Stack audit reports into one (check_name, violations, total)
    DataFrame — the batch-admission report a pipeline gates on."""
    out = reports[0]
    for r in reports[1:]:
        out = out.unionByName(r)
    return out
