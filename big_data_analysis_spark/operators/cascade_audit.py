"""Cascade recall audit: measure what the dedup cascade's
index-the-kept policy trades away, against an index-everything twin.

``dedup_cascade_increment`` (operators/dedup.py) runs exact → MinHash →
SimHash → containment per shard with SURVIVORS FLOWING DOWN, and each
near-dup store indexes its tier's INPUT — the docs every earlier tier
kept. That is the standard streaming-dedup recall profile, and its
documented blind spot is structural: a FUTURE doc similar only to a doc
an earlier tier dropped (and not to the kept partner that caught it)
is missed by the later tiers, because the dropped doc never reached
their stores (VERDICT r10 "What's missing" #4 — the profile was
documented but never measured).

This module makes the profile a MEASURED certificate:
:func:`cascade_policy_comparison` replays the same shard sequence
through BOTH policies over twin store sets — (a) the cascade verbatim,
(b) an index-everything twin where every tier's increment sees the FULL
shard (so every doc's fingerprint/signature/hash/grams enter every
store regardless of earlier verdicts) — and emits a per-doc verdict
comparison. Every doc the cascade keeps but the full policy catches is
a recall loss the pipeline owner accepted by choosing the cascade; the
companion query's planted fixture turns that count into the closed-form
``cascade_recall`` number.

Cost framing (why anyone picks the cascade anyway): index-everything
pays every tier's probe AND index cost for every doc — the heavy
containment store grows with the raw corpus, not the kept residue — so
at 100 TB the cascade's survivor-flow is the economical default and
this certificate prices its recall side exactly.

New module by design (VERDICT r10 next-round #1): it only CALLS the
certified increments; dedup.py is not edited.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from big_data_analysis_spark.concurrency import run_jobs
from big_data_analysis_spark.operators import dedup as dd

_TIERS = ("fp", "mh", "sh", "ct")


def _seed_stores(
    seed: DataFrame,
    text_col: str,
    id_col: str,
    base: str,
    ct_n: int,
    ct_threshold: float,
) -> tuple:
    """Save the seed corpus into one four-store set under ``base``.
    The four saves write DISJOINT store directories from the same seed
    frame — independent jobs, overlapped on driver threads (guide
    §2.6) instead of paying four sequential write+manifest latencies."""
    fp, mh, sh, ct = (f"{base}/{p}" for p in _TIERS)
    run_jobs([
        lambda: dd.fingerprint_index_save(seed, text_col, id_col, fp),
        lambda: dd.minhash_index_save(
            seed, text_col, id_col, mh, num_hashes=64, num_bands=16,
            shingle_n=3,
        ),
        lambda: dd.simhash_index_save(seed, text_col, id_col, sh),
        lambda: dd.containment_index_save(
            seed, text_col, id_col, ct, n=ct_n, threshold=ct_threshold
        ),
    ])
    return fp, mh, sh, ct


def _index_everything_increment(
    spark,
    shard: DataFrame,
    text_col: str,
    id_col: str,
    paths: tuple,
    mh_threshold: float,
    sh_max_hamming: int,
) -> DataFrame:
    """One shard under the INDEX-EVERYTHING policy: every tier's
    increment runs on the FULL shard (not the earlier tiers' residue),
    so every store indexes every doc and every tier's pair set is
    computed against the complete history. Verdicts label the FIRST
    tier that caught each doc — same tier order and same
    later-member/store-member caught rule as the cascade
    (``dd._cascade_caught_ids``), so the two policies' verdict frames
    are directly comparable."""
    fp, mh, sh, ct = paths
    snap = shard.select(
        F.col(id_col), F.col(text_col).alias("__t")
    ).localCheckpoint(eager=True)
    ids = snap.select(F.col(id_col).alias("id"))

    # Under index-everything, every tier's increment sees the FULL
    # shard — the four tiers are independent of each other (disjoint
    # stores, same checkpointed snapshot), unlike the cascade's
    # survivor flow. Overlap their lifecycle actions on driver threads
    # (guide §2.6); each tier computes exactly what it computed
    # sequentially.
    surv, mh_pairs, sh_pairs, ct_pairs = run_jobs([
        lambda: dd.exact_dedup_increment(spark, snap, "__t", fp),
        lambda: dd.minhash_dedup_increment(
            spark, snap, "__t", mh, threshold=mh_threshold
        ),
        lambda: dd.simhash_dedup_increment(
            spark, snap, "__t", sh, max_hamming=sh_max_hamming
        ),
        lambda: dd.containment_dedup_increment(
            spark, snap, "__t", ct, id_col=id_col
        ),
    ])
    caught_ex = ids.join(
        surv.select(F.col(id_col).alias("id")), "id", "left_anti"
    )
    caught_mh = dd._cascade_caught_ids(mh_pairs, ids)
    caught_sh = dd._cascade_caught_ids(sh_pairs, ids)
    caught_ct = dd._cascade_caught_ids(ct_pairs, ids)

    def mark(caught: DataFrame, flag: str) -> DataFrame:
        return caught.withColumnRenamed("id", id_col).withColumn(
            flag, F.lit(True)
        )

    tier = (
        F.when(F.col("__ex").isNotNull(), F.lit("exact"))
        .when(F.col("__mh").isNotNull(), F.lit("jaccard"))
        .when(F.col("__sh").isNotNull(), F.lit("simhash"))
        .when(F.col("__ct").isNotNull(), F.lit("containment"))
        .otherwise(F.lit("kept"))
    )
    return (
        snap.select(id_col)
        .join(mark(caught_ex, "__ex"), id_col, "left")
        .join(mark(caught_mh, "__mh"), id_col, "left")
        .join(mark(caught_sh, "__sh"), id_col, "left")
        .join(mark(caught_ct, "__ct"), id_col, "left")
        .select(id_col, tier.alias("tier"), (tier == "kept").alias("kept"))
    )


def cascade_policy_comparison(
    spark,
    seed: DataFrame,
    shards: list,
    text_col: str,
    id_col: str,
    base_path: str,
    mh_threshold: float = 0.7,
    sh_max_hamming: int = 3,
    ct_n: int = 2,
    ct_threshold: float = 0.8,
) -> DataFrame:
    """Replay ``shards`` (in order) through the CASCADE policy and the
    INDEX-EVERYTHING policy over twin store sets seeded from the same
    ``seed`` corpus, and return the per-doc verdict comparison:

    (id, shard, tier_cascade, kept_cascade, tier_full, kept_full,
    policies_agree) — one row per shard doc, ``shard`` = the 0-based
    arrival index. ``policies_agree`` is False exactly where the
    cascade's survivor-flow indexing changed an outcome; on a planted
    fixture those rows ARE the measured recall gap (a doc similar only
    to something an earlier tier dropped), and ``kept_full`` is the
    recall reference — the full policy's stores contain every doc ever
    seen, so it catches everything any tier can express.

    The seed is saved ONCE and the second store set is a byte-identical
    filesystem copy (the manifests and parquet versions are plain
    files — the streaming-cascade parity-twin trick), so the
    certificate never pays the seeding compute twice. Both arms then
    pay their own per-shard increments: the cascade's tiers probe the
    shrinking residue, the full twin's tiers probe the whole shard —
    the cost asymmetry that motivates the cascade in the first place.

    See ``dd.dedup_cascade_increment`` for the cascade's contract; the
    store-indexing policies are the ONLY difference between the arms
    (tier order, caught rule, and thresholds are shared)."""
    import shutil

    casc = _seed_stores(
        seed, text_col, id_col, f"{base_path}/casc", ct_n, ct_threshold
    )
    full = tuple(f"{base_path}/full/{p}" for p in _TIERS)
    for src, dst in zip(casc, full):
        shutil.copytree(src, dst)

    frames = []
    for si, shard_df in enumerate(shards):
        # The two policy arms mutate DISJOINT twin store sets from the
        # same shard — independent job chains, overlapped on driver
        # threads (guide §2.6). Shard ORDER stays sequential: each
        # arm's next increment depends on its own store appends.
        v_casc, v_full = run_jobs([
            lambda: dd.dedup_cascade_increment(
                spark, shard_df, text_col, casc[0], casc[1], casc[2],
                ct_path=casc[3], id_col=id_col, mh_threshold=mh_threshold,
                sh_max_hamming=sh_max_hamming,
            ),
            lambda: _index_everything_increment(
                spark, shard_df, text_col, id_col, full,
                mh_threshold, sh_max_hamming,
            ),
        ])
        frames.append(
            v_casc.select(
                id_col,
                F.col("tier").alias("tier_cascade"),
                F.col("kept").alias("kept_cascade"),
            )
            .join(
                v_full.select(
                    id_col,
                    F.col("tier").alias("tier_full"),
                    F.col("kept").alias("kept_full"),
                ),
                id_col,
            )
            .withColumn("shard", F.lit(si).cast("long"))
            # each arm's next increment depends on this shard's store
            # appends anyway; pinning the verdicts here keeps the
            # union's branches from re-running earlier increments
            .localCheckpoint(eager=True)
        )
    out = reduce(DataFrame.unionByName, frames)
    return out.select(
        id_col, "shard", "tier_cascade", "kept_cascade",
        "tier_full", "kept_full",
        (F.col("kept_cascade") == F.col("kept_full")).alias("policies_agree"),
    )
