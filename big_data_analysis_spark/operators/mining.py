"""Frequent-itemset mining + association rules (SURVEY.md §2.5 A8-A11,
§2.10 M27) — the flagship pipeline.

The reference hand-rolls a 2-itemset Apriori over price-trend
"transactions" (蔬菜价格相关性分析.py:116-209: support counting :141-166,
confidence/lift rule generation :170-209, min_support=0.15,
min_confidence=0.6 per :341). Two Spark-first implementations:

1. ``pair_association_rules`` — the reference's exact k<=2 semantics as
   pure DataFrame ops (explode -> self-join on txn id -> pair counts ->
   confidence/lift both directions). Fully SQL-oracle-able.
2. ``fpgrowth_rules`` — pyspark.ml FPGrowth, the general-k production
   path (distributed FP-trees, no candidate explosion).

Transaction construction from a price fact table mirrors the reference's
trend pipeline: per-(period, item) price -> lag window -> ±5% trend CASE
-> collect_set per period.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .relational import discretize_trend


def trend_transactions(
    df: DataFrame,
    period_col: str,
    item_col: str,
    value_col: str,
    up_threshold: float = 0.05,
    down_threshold: float = 0.05,
) -> DataFrame:
    """Build trend transactions from a long (period, item, value) table:
    lag per item -> ±threshold trend label -> one transaction (set of
    "item=trend" strings) per period. (Reference
    蔬菜价格相关性分析.py:68-109.)

    The lag window partitions by item — scales with per-item history,
    never a global sort.
    """
    w = Window.partitionBy(item_col).orderBy(period_col)
    lagged = df.withColumn("__prev", F.lag(F.col(value_col)).over(w))
    labeled = discretize_trend(
        lagged, value_col, "__prev", "trend", up_threshold, down_threshold,
        labels=("up", "down", "flat"),
    ).filter(F.col("trend").isNotNull())
    return (
        labeled.withColumn("item_trend", F.concat_ws("=", F.col(item_col), F.col("trend")))
        .groupBy(period_col)
        .agg(F.collect_set("item_trend").alias("items"))
    )


def frequent_items(transactions: DataFrame, items_col: str = "items", min_support: float = 0.15) -> DataFrame:
    """A8/A10: frequent 1-itemsets: explode -> count -> min-support
    filter. Support is count/N over all transactions."""
    n_df = transactions.agg(F.count(F.lit(1)).alias("__n"))
    return (
        transactions.select(F.explode(F.array_distinct(F.col(items_col))).alias("item"))
        .groupBy("item")
        .agg(F.count(F.lit(1)).alias("item_count"))
        .crossJoin(F.broadcast(n_df))
        .withColumn("support", F.col("item_count") / F.col("__n"))
        .filter(F.col("support") >= min_support)
        .drop("__n")
    )


def pair_association_rules(
    transactions: DataFrame,
    items_col: str = "items",
    txn_col: str | None = None,
    min_support: float = 0.15,
    min_confidence: float = 0.6,
) -> DataFrame:
    """A9/A11/M27: the reference's SimpleApriori semantics (k<=2) as one
    declarative plan.

    Output: antecedent, consequent, support (of the pair), confidence,
    lift — both rule directions, filtered by min_support (pair) and
    min_confidence, matching 蔬菜价格相关性分析.py:170-209.

    Plan shape: explode(distinct items) -> [txn_id, item]; pair counts by
    self-join on txn_id with item_a < item_b (only co-occurring pairs
    materialize); singleton counts reused for both the confidence
    denominator and the lift denominator. Three shuffles total, all on
    uniform keys; FPGrowth replaces this when k>2 is wanted.
    """
    txn = transactions
    if txn_col is None:
        txn_col = "__txn_id"
        txn = transactions.withColumn(txn_col, F.monotonically_increasing_id())

    # One lazy DAG, zero driver actions: the transaction count rides in
    # as a broadcast 1-row aggregate, singleton counts as a per-item
    # window — no .count()/.cache() barriers, so the scheduler pipelines
    # all stages and the upstream fact scan runs exactly once.
    n_df = txn.agg(F.count(F.lit(1)).alias("n_txn"))
    items = (
        txn.select(F.col(txn_col).alias("txn"), F.explode(F.array_distinct(F.col(items_col))).alias("item"))
        .withColumn("cnt", F.count(F.lit(1)).over(Window.partitionBy("item")))
    )
    a = items.select("txn", F.col("item").alias("item_a"), F.col("cnt").alias("cnt_a"))
    b = items.select(F.col("txn").alias("txn_b"), F.col("item").alias("item_b"), F.col("cnt").alias("cnt_b"))
    enriched = (
        a.join(b, (F.col("txn") == F.col("txn_b")) & (F.col("item_a") < F.col("item_b")))
        .groupBy("item_a", "item_b")
        .agg(
            F.count(F.lit(1)).alias("pair_cnt"),
            F.first("cnt_a").alias("cnt_a"),
            F.first("cnt_b").alias("cnt_b"),
        )
        .crossJoin(F.broadcast(n_df))
        .withColumn("pair_support", F.col("pair_cnt") / F.col("n_txn"))
        .filter(F.col("pair_support") >= min_support)
    )

    # Emit BOTH rule directions from one pass: a union of two selects
    # over `enriched` would re-run the whole explode/join/agg per
    # branch; exploding a 2-element struct array keeps a single branch.
    def rule(ant, cons, cnt_ant, cnt_cons):
        conf = F.col("pair_cnt") / F.col(cnt_ant)
        return F.struct(
            F.col(ant).alias("antecedent"),
            F.col(cons).alias("consequent"),
            F.col("pair_support").alias("support"),
            conf.alias("confidence"),
            (conf / (F.col(cnt_cons) / F.col("n_txn"))).alias("lift"),
        )

    both = enriched.select(
        F.explode(
            F.array(
                rule("item_a", "item_b", "cnt_a", "cnt_b"),
                rule("item_b", "item_a", "cnt_b", "cnt_a"),
            )
        ).alias("r")
    ).select("r.*")
    return both.filter(F.col("confidence") >= min_confidence)


def fpgrowth_rules(
    transactions: DataFrame,
    items_col: str = "items",
    min_support: float = 0.15,
    min_confidence: float = 0.6,
):
    """M27 production path: distributed FP-Growth (arbitrary k) — a
    strict superset of the reference's pair rules. Returns
    (freq_itemsets_df, rules_df)."""
    from pyspark.ml.fpm import FPGrowth

    fp = FPGrowth(itemsCol=items_col, minSupport=min_support, minConfidence=min_confidence)
    model = fp.fit(transactions)
    return model.freqItemsets, model.associationRules
