"""Mixed-modality recall audit (operators/media_recall.py): inside a
mixed corpus the survivor-flow recall gap is confined to the TEXT arm —
the planted text blind-spot probes are the exact disagreement set,
while every media row agrees between the one-call cascade and the
full-policy twin (media stores index every fingerprinted doc; there is
no survivor flow for the certificate to find)."""

from __future__ import annotations

import os
import shutil

from pyspark.sql import functions as F

from big_data_analysis_spark.operators import media_recall as mr
from big_data_analysis_spark.operators import multimodal as mm
from big_data_analysis_spark.operators import video as vd

N_FAM = 4
LEVELS = (0, 1, 2, 10, 11, 12, 20, 21, 22, 30, 31)
MEDIA_SYNTH = {
    "image": (11000, mm.synthesize_perturbed_pgms),
    "audio": (22000, mm.synthesize_landmark_wavs),
    "video": (33000, vd.synthesize_landmark_y4ms),
}


def _tok_arr(prefix: str, count: int, start: int = 0, mid: str = "t"):
    return F.transform(
        F.sequence(F.lit(start), F.lit(start + count - 1)),
        lambda j: F.concat(
            F.lit(prefix), F.col("fam").cast("string"),
            F.lit(mid), j.cast("string"),
        ),
    )


def _text_rows(df):
    return df.withColumn("kind", F.lit("text")).withColumn(
        "content", F.lit(None).cast("binary")
    )


def _media_rows(spark, lo: int, hi: int):
    """One synthesized doc per kind per j in [lo, hi): ids X+110+j,
    perturbation level LEVELS[j % 11] — the mixed-cascade fixture's
    planted geometry (archives cover level indices 0..5)."""
    parts = []
    for kind, (x, synth) in MEDIA_SYNTH.items():
        ids = spark.range(x + 110 + lo, x + 110 + hi).select(
            F.col("id").alias("doc_id")
        )
        parts.append(
            synth(ids, "doc_id", levels=LEVELS)
            .withColumn("kind", F.lit(kind))
            .withColumn("text", F.lit(None).cast("string"))
        )
    return parts


def _fixture(spark):
    fams = spark.range(N_FAM).select(F.col("id").alias("fam"))
    base_txt = F.array_join(_tok_arr("b", 60), " ")
    ext_txt = F.array_join(_tok_arr("e", 8, mid="x"), " ")
    k = _text_rows(fams.select((F.col("fam") + 1000).alias("doc_id"),
                               base_txt.alias("text")))
    d = _text_rows(fams.select(
        (F.col("fam") + 2000).alias("doc_id"),
        F.concat(base_txt, F.lit(" "), ext_txt).alias("text"),
    ))
    probe_txt = F.concat(
        F.array_join(_tok_arr("b", 2, start=58), " "), F.lit(" "), ext_txt
    )
    m = _text_rows(fams.select((F.col("fam") + 3000).alias("doc_id"),
                               probe_txt.alias("text")))

    text_seed = spark.range(3).select(
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
    media_seeds = {
        kind: synth(
            spark.range(x, x + 6).select(F.col("id").alias("doc_id")),
            "doc_id", levels=LEVELS,
        )
        for kind, (x, synth) in MEDIA_SYNTH.items()
    }

    cols = ["doc_id", "kind", "text", "content"]

    def stack(parts):
        out = parts[0].select(cols)
        for p in parts[1:]:
            out = out.unionByName(p.select(cols))
        return out

    shard0 = stack([k, d] + _media_rows(spark, 0, 6))
    shard1 = stack([m] + _media_rows(spark, 6, 11))
    return text_seed, media_seeds, [shard0, shard1]


def test_mixed_recall_gap_is_text_only(spark, request):
    base = f"/root/repo/.scratch/mr-test-{os.getpid()}"
    shutil.rmtree(base, ignore_errors=True)
    request.addfinalizer(lambda: shutil.rmtree(base, ignore_errors=True))
    text_seed, media_seeds, shards = _fixture(spark)

    cmp_df = mr.media_policy_comparison(
        spark, text_seed, media_seeds, shards, base
    )
    rows = {r["doc_id"]: r.asDict() for r in cmp_df.collect()}
    assert len(rows) == 3 * N_FAM + 3 * 11

    # text arm: the planted blind-spot probes are the EXACT gap
    for f in range(N_FAM):
        assert rows[1000 + f]["tier_cascade"] == "kept"
        assert rows[2000 + f]["tier_cascade"] == "jaccard"
        assert rows[2000 + f]["tier_full"] == "jaccard"
        probe = rows[3000 + f]
        assert probe["shard"] == 1 and probe["kind"] == "text"
        assert probe["tier_cascade"] == "kept" and probe["kept_cascade"]
        assert probe["tier_full"] == "containment" and not probe["kept_full"]
    disagree = {i for i, r in rows.items() if not r["policies_agree"]}
    assert disagree == {3000 + f for f in range(N_FAM)}

    # media arms: identical verdicts in BOTH policies — kept exactly
    # where a new cluster starts (level indices 6 and 9), caught at the
    # modality tier everywhere else, never a disagreement
    for kind, (x, _) in MEDIA_SYNTH.items():
        for j in range(11):
            r = rows[x + 110 + j]
            want = "kept" if j in (6, 9) else kind
            assert r["kind"] == kind and r["shard"] == (0 if j < 6 else 1)
            assert r["tier_cascade"] == want == r["tier_full"], (kind, j)
            assert r["policies_agree"], (kind, j)
