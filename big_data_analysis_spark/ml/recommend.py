"""Collaborative filtering (ALS): the Spark-native recommender surface.

The reference has no recsys, but a warehouse engine that already joins
customers to purchases is two lines from implicit-feedback ALS — and at
100 TB, ALS is one of the few factorization methods with a genuinely
distributed implementation (block-partitioned alternating least squares;
each iteration is two keyed shuffles, users then items). This module
wraps pyspark.ml.recommendation.ALS with the engine's conventions:
explicit seeds, cold-start semantics chosen for evaluation, and a
bounded top-k recommendation output.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def implicit_purchase_matrix(
    orders: DataFrame,
    lineitem: DataFrame,
    part: DataFrame,
) -> DataFrame:
    """Customer x brand implicit-feedback matrix from the star schema:
    strength = number of order lines of that brand. Brands are
    dense-encoded to ints (ALS requires integer ids) via a broadcast
    dim derived from the (tiny) part table."""
    # tiny dim (25 brands): the global ordering window is fine here
    brands = part.select("p_brand").distinct().select(
        "p_brand",
        (F.dense_rank().over(Window.orderBy("p_brand")) - 1).alias("brand_id"),
    )
    # Spark's ALS is hard-limited to 32-bit ids. Casting blindly would
    # either raise mid-job (ANSI mode, which this engine runs) or
    # silently wrap and merge distinct customers — so the range is
    # validated up front with one cheap aggregate and a CLEAR error
    # directing very-large deployments to add an id-compaction step
    # (a stable surrogate-key dimension), which is a modeling decision
    # this derivation should not make implicitly.
    mx = orders.agg(F.max("o_custkey")).head()[0]
    if mx is not None and mx > 2**31 - 1:
        raise ValueError(
            f"implicit_purchase_matrix: max o_custkey {mx} exceeds the "
            "32-bit id range Spark ALS requires; compact customer ids "
            "through a surrogate-key dimension first"
        )
    return (
        lineitem.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(part.select("p_partkey", "p_brand")), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(brands), "p_brand")
        .groupBy(
            F.col("o_custkey").cast("int").alias("user"),
            F.col("brand_id").cast("int").alias("item"),
        )
        .agg(F.count(F.lit(1)).cast("float").alias("strength"))
    )


def train_als(
    ratings: DataFrame,
    rank: int = 8,
    reg_param: float = 0.1,
    max_iter: int = 8,
    implicit: bool = True,
    seed: int = 42,
):
    """Fit block-partitioned ALS. coldStartStrategy='drop' so held-out
    users/items absent from training never poison evaluation metrics
    with NaN predictions. Implicit mode (Hu-Koren-Volinsky 2008) treats
    ``strength`` as confidence, the right reading for purchase counts."""
    from pyspark.ml.recommendation import ALS

    als = ALS(
        rank=rank,
        regParam=reg_param,
        maxIter=max_iter,
        implicitPrefs=implicit,
        userCol="user",
        itemCol="item",
        ratingCol="strength",
        coldStartStrategy="drop",
        seed=seed,
    )
    return als.fit(ratings)


def recommend_top_k(model, k: int = 5) -> DataFrame:
    """Top-k items per user as long-form rows (user, item, score,
    rank) — recommendForAllUsers' nested struct flattened to the
    engine's relational shape. Bounded output: |users| x k rows."""
    recs = model.recommendForAllUsers(k)
    return recs.select(
        "user",
        F.posexplode("recommendations").alias("rank0", "rec"),
    ).select(
        "user",
        F.col("rec.item").alias("item"),
        F.col("rec.rating").alias("score"),
        (F.col("rank0") + 1).cast("long").alias("rank"),
    )
