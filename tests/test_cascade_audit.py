"""Cascade recall audit (operators/cascade_audit.py): the two-policy
comparison disagrees exactly on docs whose ONLY similar partner was
dropped by an earlier tier, and agrees everywhere a kept partner can
express the similarity."""

from __future__ import annotations

import os
import shutil

from pyspark.sql import functions as F

from big_data_analysis_spark.operators import cascade_audit as ca

N_FAM = 6


def _tok_arr(prefix: str, count: int, start: int = 0, mid: str = "t"):
    return F.transform(
        F.sequence(F.lit(start), F.lit(start + count - 1)),
        lambda j: F.concat(
            F.lit(prefix), F.col("fam").cast("string"),
            F.lit(mid), j.cast("string"),
        ),
    )


def _fixture(spark, probe_cls):
    """Shard 1: K (base, kept) + D (base+ext, MinHash-dropped via K).
    Shard 2: one probe per family — 'dropped_only' (the 9-bigram doc
    whose grams live only in D) or 'kept_anchored' (the first 10 base
    tokens, contained whole in K)."""
    fams = spark.range(N_FAM).select(F.col("id").alias("fam"))
    base_txt = F.array_join(_tok_arr("b", 60), " ")
    ext_txt = F.array_join(_tok_arr("e", 8, mid="x"), " ")
    k = fams.select((F.col("fam") + 1000).alias("doc_id"),
                    base_txt.alias("text"))
    d = fams.select(
        (F.col("fam") + 2000).alias("doc_id"),
        F.concat(base_txt, F.lit(" "), ext_txt).alias("text"),
    )
    if probe_cls == "dropped_only":
        probe_txt = F.concat(
            F.array_join(_tok_arr("b", 2, start=58), " "),
            F.lit(" "), ext_txt,
        )
    else:  # kept_anchored: bigrams all inside K itself
        probe_txt = F.array_join(_tok_arr("b", 10), " ")
    m = fams.select((F.col("fam") + 3000).alias("doc_id"),
                    probe_txt.alias("text"))
    seed = spark.range(3).select(
        (F.col("id") + 90000).alias("doc_id"),
        F.array_join(
            F.transform(
                F.sequence(F.lit(0), F.lit(29)),
                lambda j: F.concat(
                    F.lit("sd"), F.col("id").cast("string"),
                    F.lit("x"), j.cast("string"),
                ),
            ),
            " ",
        ).alias("text"),
    )
    return seed, [k.unionByName(d), m]


def _run(spark, request, probe_cls):
    base = f"/root/repo/.scratch/ca-test-{probe_cls}-{os.getpid()}"
    shutil.rmtree(base, ignore_errors=True)
    request.addfinalizer(lambda: shutil.rmtree(base, ignore_errors=True))
    seed, shards = _fixture(spark, probe_cls)
    cmp_df = ca.cascade_policy_comparison(
        spark, seed, shards, "text", "doc_id", base
    )
    return {r["doc_id"]: r.asDict() for r in cmp_df.collect()}


def test_dropped_only_probe_is_the_measured_miss(spark, request):
    """A probe similar ONLY to a MinHash-dropped doc: the cascade keeps
    it (the dropped doc never reached the containment store), the
    index-everything twin catches it at the containment tier — and the
    disagreement set is exactly those probes."""
    rows = _run(spark, request, "dropped_only")
    assert len(rows) == 3 * N_FAM
    for f in range(N_FAM):
        assert rows[1000 + f]["tier_cascade"] == "kept"
        assert rows[1000 + f]["tier_full"] == "kept"
        assert rows[2000 + f]["tier_cascade"] == "jaccard"
        assert rows[2000 + f]["tier_full"] == "jaccard"
        probe = rows[3000 + f]
        assert probe["shard"] == 1
        assert probe["tier_cascade"] == "kept" and probe["kept_cascade"]
        assert probe["tier_full"] == "containment" and not probe["kept_full"]
    disagree = {i for i, r in rows.items() if not r["policies_agree"]}
    assert disagree == {3000 + f for f in range(N_FAM)}


def test_kept_anchored_probe_agrees(spark, request):
    """The control: a probe contained whole in the KEPT partner is
    caught by BOTH policies at the containment tier — the recall gap
    requires the dropped-only link, not containment per se."""
    rows = _run(spark, request, "kept_anchored")
    for f in range(N_FAM):
        probe = rows[3000 + f]
        assert probe["tier_cascade"] == "containment"
        assert probe["tier_full"] == "containment"
        assert probe["policies_agree"]
    assert all(r["policies_agree"] for r in rows.values())
