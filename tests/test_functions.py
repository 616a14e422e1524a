"""Scalar-function helper tests, incl. the SQL registration surface."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from big_data_analysis_spark.functions import (
    array_l2,
    array_mean,
    clamp,
    minmax,
    pct_of_total,
    register,
    safe_div,
    zscore,
)


def test_safe_div_null_on_zero(spark):
    df = spark.createDataFrame([(10.0, 2.0), (1.0, 0.0)], ["a", "b"])
    vals = [r["q"] for r in df.select(safe_div(F.col("a"), F.col("b")).alias("q")).collect()]
    assert vals == [5.0, None]


def test_window_scalers(spark):
    df = spark.createDataFrame([(1, 0.0), (1, 10.0), (2, 5.0)], ["g", "x"])
    out = df.select(
        "g",
        "x",
        minmax(F.col("x"), ("g",)).alias("mm"),
        pct_of_total(F.col("x"), ("g",)).alias("pct"),
        zscore(F.col("x"), ("g",)).alias("z"),
    ).collect()
    rows = {(r["g"], r["x"]): r for r in out}
    assert rows[(1, 0.0)]["mm"] == 0.0 and rows[(1, 10.0)]["mm"] == 1.0
    assert rows[(2, 5.0)]["mm"] is None  # single-row group: 0/0 -> NULL, not error
    assert rows[(1, 10.0)]["pct"] == pytest.approx(1.0)
    assert rows[(1, 0.0)]["z"] == pytest.approx(-rows[(1, 10.0)]["z"])


def test_array_helpers_and_clamp(spark):
    df = spark.createDataFrame([([3.0, 4.0],)], ["v"])
    r = df.select(
        array_mean(F.col("v")).alias("m"),
        array_l2(F.col("v")).alias("n"),
        clamp(F.lit(7.0), 0.0, 5.0).alias("c"),
    ).head()
    assert r["m"] == pytest.approx(3.5)
    assert r["n"] == pytest.approx(5.0)
    assert r["c"] == 5.0


def test_sql_registration(spark):
    register(spark)
    assert spark.sql("SELECT cn_numeral('一百零八') AS n").head()["n"] == 108


def test_repetition_metrics_hand_values(spark):
    """'a b a b a' -> 5 tokens, 2 distinct, bigrams {a b, b a} distinct 2
    of 4 -> dup fraction 0.5; a single-token doc defines 1.0/0.0."""
    from big_data_analysis_spark.operators import text as tx

    df = spark.createDataFrame([(1, "a b a b a"), (2, "solo")], ["id", "text"])
    rows = {r["id"]: r for r in tx.repetition_metrics(df, "text").collect()}
    assert rows[1]["n_tokens"] == 5
    assert rows[1]["distinct_token_frac"] == pytest.approx(2 / 5)
    assert rows[1]["dup_bigram_frac"] == pytest.approx(0.5)
    assert rows[2]["distinct_token_frac"] == 1.0
    assert rows[2]["dup_bigram_frac"] == 0.0


def test_redact_pii_hand_values(spark):
    from big_data_analysis_spark.operators import text as tx

    df = spark.createDataFrame(
        [
            (1, "mail a.user+x@foo-bar.example.org and b@c.io now"),
            (2, "call +49 170 123 4567 today"),
            (3, "clean text"),
        ],
        ["id", "text"],
    )
    rows = {r["id"]: r for r in tx.redact_pii(df, "text").collect()}
    assert rows[1]["n_emails"] == 2 and rows[1]["n_phones"] == 0
    assert rows[1]["redacted"] == "mail <EMAIL> and <EMAIL> now"
    assert rows[2]["n_phones"] == 1
    assert rows[2]["redacted"] == "call <PHONE> today"
    assert rows[3]["redacted"] == "clean text" and rows[3]["n_emails"] == 0


def test_tfidf_top_terms_hand_values(spark):
    """Two docs: a term appearing only in doc 1 outranks the shared
    term; smooth-idf values check out by hand."""
    import math

    from big_data_analysis_spark.operators import text as tx

    df = spark.createDataFrame(
        [(1, "rare shared shared"), (2, "shared shared shared")], ["doc_id", "text"]
    )
    out = {(r["doc_id"], r["term"]): r for r in tx.tfidf_top_terms(df, "text", "doc_id", k=2).collect()}
    # idf(rare): ln(3/2)+1 ; idf(shared): ln(3/3)+1 = 1
    assert out[(1, "rare")]["tfidf"] == pytest.approx(1 * (math.log(3 / 2) + 1), abs=1e-6)
    assert out[(1, "shared")]["tfidf"] == pytest.approx(2.0, abs=1e-6)
    assert out[(1, "rare")]["rank"] == 2 and out[(1, "shared")]["rank"] == 1
    assert out[(2, "shared")]["tfidf"] == pytest.approx(3.0, abs=1e-6)


def test_pack_offsets_known_stream(spark):
    from big_data_analysis_spark.operators import text as tx

    df = spark.createDataFrame(
        [("s", 1, 300), ("s", 2, 300), ("s", 3, 100), ("s", 4, 400)],
        "source string, doc_id int, n_tok int",
    )
    out = {
        r["doc_id"]: (r["start_offset"], r["chunk_id"], r["crosses_boundary"])
        for r in tx.pack_offsets(
            df, "n_tok", ["doc_id"], capacity=512, partition_by=["source"]
        ).collect()
    }
    # stream: [0,300) [300,600) [600,700) [700,1100); chunks cut at 512, 1024
    assert out[1] == (0, 0, False)
    assert out[2] == (300, 0, True)    # straddles the 512 cut
    assert out[3] == (600, 1, False)
    assert out[4] == (700, 1, True)    # straddles the 1024 cut


def test_weighted_hash_sample_extremes_and_determinism(spark):
    from big_data_analysis_spark.operators import relational as rel

    df = spark.range(500).select(F.col("id"), (F.col("id") % 2).alias("parity"))
    all_kept = rel.weighted_hash_sample(df, ["id"], F.lit(1.0), seed="s")
    none_kept = rel.weighted_hash_sample(df, ["id"], F.lit(0.0), seed="s")
    assert all_kept.count() == 500 and none_kept.count() == 0
    half = rel.weighted_hash_sample(df, ["id"], F.lit(0.5), seed="s")
    ids1 = sorted(r["id"] for r in half.collect())
    ids2 = sorted(r["id"] for r in half.collect())
    assert ids1 == ids2 and 150 < len(ids1) < 350


def test_sentence_split_udtf_sql_lateral(spark):
    """The UDTF surface: sentence_split is callable from SQL as a
    LATERAL table function, offsets point at the true source span, and
    concatenating sentences + separators reassembles the text's
    non-boundary content."""
    from big_data_analysis_spark.functions.table import register_table_functions

    register_table_functions(spark)
    df = spark.createDataFrame(
        [
            (1, "First one. Second!  Third? "),
            (2, "no terminator at all"),
            (3, ""),
            (4, None),
        ],
        "doc_id int, text string",
    )
    df.createOrReplaceTempView("udtf_docs")
    rows = spark.sql(
        "SELECT doc_id, s.* FROM udtf_docs, LATERAL sentence_split(text) s"
    ).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    assert set(by_doc) == {1, 2}  # empty/null emit nothing, parent row drops
    one = sorted(by_doc[1], key=lambda r: r["idx"])
    assert [r["sentence"] for r in one] == ["First one.", "Second!", "Third?"]
    texts = {1: "First one. Second!  Third? "}
    for r in one:  # offsets index the real source span
        assert texts[1][r["start"] : r["start"] + len(r["sentence"])] == r["sentence"]
    assert by_doc[2][0]["sentence"] == "no terminator at all"
    # punctuation RUNS stay inside their sentence — no content loss
    multi = spark.sql(
        "SELECT s.* FROM (SELECT 'Really?! Yes... Done.' AS t) x, "
        "LATERAL sentence_split(t) s"
    ).collect()
    assert [r["sentence"] for r in sorted(multi, key=lambda r: r["idx"])] == [
        "Really?!", "Yes...", "Done.",
    ]
