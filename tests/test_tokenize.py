"""Real-BPE parity: the trainer and segmenter are checked against the
published algorithm's hand-traceable behavior (Sennrich et al. 2016
walk-through corpus), and the distributed count path is checked against
a local pure-python tokenization of the same documents."""

from __future__ import annotations

from big_data_analysis_spark.operators import tokenize as tk


def test_bpe_train_classic_corpus():
    """The canonical low/lower/newest/widest example: with e,s the most
    frequent pair (9 in newest + widest... counts below), the first
    merges are hand-derivable."""
    wc = {"low": 5, "lower": 2, "newest": 6, "widest": 3}
    merges = tk.bpe_train(wc, 4)
    # pair counts round 1: (e,s)=9, (s,t)=9, (t,</w>)=9, (l,o)=7, (o,w)=7 ...
    # tie on 9 -> lexicographically smallest = ('e','s')
    assert merges[0] == ("e", "s")
    # round 2: ('es','t') = 9, ('t','</w>') = 9 -> ('es','t') < ('t','</w>')
    assert merges[1] == ("es", "t")
    # round 3: ('est','</w>') = 9 wins alone
    assert merges[2] == ("est", "</w>")
    # round 4: ('l','o') = 7 and ('o','w') = 7 -> ('l','o')
    assert merges[3] == ("l", "o")


def test_bpe_segment_applies_merges_in_rank_order():
    wc = {"low": 5, "lower": 2, "newest": 6, "widest": 3}
    merges = tk.bpe_train(wc, 10)
    ranks = {p: i for i, p in enumerate(merges)}
    # 10 merges cover 'newest' fully; with only the first 3 it stops at est</w>
    assert tk.bpe_segment("newest", ranks) == ["newest</w>"]
    partial = {p: i for i, p in enumerate(merges[:3])}
    assert tk.bpe_segment("newest", partial) == ["n", "e", "w", "est</w>"]
    # unseen word degrades to chars + learned subwords, never errors
    segs = tk.bpe_segment("lowest", ranks)
    assert "".join(segs) == "lowest</w>"
    assert "est</w>" in segs


def test_segment_roundtrip_property():
    """Concatenating any word's segments reproduces word + EOW exactly,
    for every distinct word in the corpus sample."""
    wc = {"banana": 4, "bandana": 2, "ban": 7, "nab": 1}
    ranks = {p: i for i, p in enumerate(tk.bpe_train(wc, 6))}
    for w in list(wc) + ["unrelated", "ba", "b"]:
        assert "".join(tk.bpe_segment(w, ranks)) == w + tk.EOW


def test_distributed_counts_match_local(spark):
    import re

    rows = [
        (1, "the low road"),
        (2, "lower and lower, lowest!"),
        (3, "newest widest low"),
        (4, "the the the"),
    ]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    merges = tk.train_bpe(df, "text", num_merges=8, vocab_limit=100)
    got = {
        r["doc_id"]: r["n_tokens"]
        for r in tk.bpe_token_counts(df, "text", "doc_id", merges).collect()
    }
    ranks = {p: i for i, p in enumerate(merges)}
    for doc_id, text in rows:
        words = re.findall(tk.PRETOKEN_PATTERN, text.lower())
        expect = sum(len(tk.bpe_segment(w, ranks)) for w in words)
        assert got[doc_id] == expect, (doc_id, got[doc_id], expect)


def test_training_is_deterministic_across_partitionings(spark):
    from pyspark.sql import functions as F

    df = spark.range(100).select(
        F.concat_ws(" ", F.lit("alpha beta gamma"), F.col("id").cast("string")).alias("text")
    )
    m1 = tk.train_bpe(df, "text", num_merges=12, vocab_limit=500)
    m2 = tk.train_bpe(df.repartition(7), "text", num_merges=12, vocab_limit=500)
    assert m1 == m2 and len(m1) == 12


def test_bpe_segment_table_matches_local_segmentation(spark):
    from pyspark.sql import functions as F

    from big_data_analysis_spark.operators.tokenize import (
        bpe_segment,
        bpe_segment_table,
        train_bpe,
    )

    rows = [(1, "low lower lowest"), (2, "newer low new")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    merges = train_bpe(df, "text", num_merges=8)
    out = bpe_segment_table(df, "text", "doc_id", merges)
    ranks = {p: i for i, p in enumerate(merges)}
    for r in out.collect():
        assert r["tokens"] == bpe_segment(r["w"], ranks), r
    # one row per (doc, distinct pre-token)
    assert out.filter(F.col("doc_id") == 1).count() == 3
    # reassembly: tokens concatenate back to word + EOW
    from big_data_analysis_spark.operators.tokenize import EOW

    for r in out.collect():
        assert "".join(r["tokens"]) == r["w"] + EOW
