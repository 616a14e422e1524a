"""Byte-pair-encoding tokenization as a distributed operator.

The corpus-budgeting gap the regex "BPE-ish" counter left open: a real
BPE (Sennrich, Haddow & Birch 2016, "Neural Machine Translation of Rare
Words with Subword Units" — the public algorithm) whose merges are
actually applied, so token counts reflect a trained subword vocabulary,
not a word-split heuristic.

Scale design (the part that matters at 100 TB):

- TRAINING aggregates word frequencies distributed (one groupBy over
  exploded pre-tokens, map-side combined), then collects only the TOP
  ``vocab_limit`` (word, count) rows to the driver and runs the classic
  merge loop there. The collected state is bounded by vocab size, never
  corpus size — the same shape every production tokenizer trainer uses.
- APPLICATION never tokenizes the same word twice: explode → count per
  (id, word) → BPE only the DISTINCT words (an Arrow-batched pandas UDF
  over a frame of |vocabulary| rows) → broadcast-join segment lengths
  back and take a weighted sum per document. BPE cost is O(|distinct
  words|), not O(corpus); the corpus-sized frames only ever see
  codegen-friendly explode/count/join.

Ties in pair counts break lexicographically, so training is
deterministic under any partitioning.
"""

from __future__ import annotations

from collections import Counter

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, IntegerType, StringType

#: GPT-2-flavoured pre-tokenizer, simplified to what Spark's RE2-style
#: engine supports: word = letters | digits | single non-space symbol.
PRETOKEN_PATTERN = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"

#: End-of-word sentinel appended to every word's symbol sequence before
#: merging (classic BPE; lets the vocabulary distinguish "er" inside a
#: word from "er" at the end).
EOW = "</w>"


def pretokens(col):
    """Column expr: text -> array of pre-token strings (codegen).
    Pattern passed as a lit column, not an SQL string literal — the SQL
    parser would eat the backslash escapes."""
    return F.regexp_extract_all(F.lower(F.col(col) if isinstance(col, str) else col), F.lit(PRETOKEN_PATTERN), 0)


# ---------------------------------------------------------------------------
# Pure-python BPE core — shared by the trainer, the pandas UDF and the
# parity tests, so there is exactly one implementation of the merge
# semantics.
# ---------------------------------------------------------------------------


def word_symbols(word: str) -> tuple[str, ...]:
    return (*word, EOW)


def bpe_train(word_counts: dict[str, int], num_merges: int) -> list[tuple[str, str]]:
    """Classic BPE training loop over a {word: count} vocabulary.
    Greedy: each round merges the most frequent adjacent symbol pair
    (ties broken lexicographically — deterministic), rewrites the
    vocabulary, repeats. Runs on the driver over the bounded top-N
    vocabulary; cost O(num_merges * vocab)."""
    vocab: dict[tuple[str, ...], int] = {
        word_symbols(w): c for w, c in word_counts.items()
    }
    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        pair_counts: Counter[tuple[str, str]] = Counter()
        for syms, cnt in vocab.items():
            for i in range(len(syms) - 1):
                pair_counts[syms[i], syms[i + 1]] += cnt
        if not pair_counts:
            break
        # max by count; ties -> lexicographically smallest pair wins
        top = max(pair_counts.values())
        best_pair = min(p for p, c in pair_counts.items() if c == top)
        merges.append(best_pair)
        merged = "".join(best_pair)
        new_vocab: dict[tuple[str, ...], int] = {}
        for syms, cnt in vocab.items():
            out: list[str] = []
            i = 0
            while i < len(syms):
                if i + 1 < len(syms) and (syms[i], syms[i + 1]) == best_pair:
                    out.append(merged)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            key = tuple(out)
            new_vocab[key] = new_vocab.get(key, 0) + cnt
        vocab = new_vocab
    return merges


def bpe_segment(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Apply trained merges to one word: repeatedly merge the
    lowest-rank (earliest-learned) adjacent pair — the standard
    inference loop, O(len * merges applied)."""
    syms = list(word_symbols(word))
    while len(syms) > 1:
        best_rank = None
        best_i = -1
        for i in range(len(syms) - 1):
            r = ranks.get((syms[i], syms[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_i < 0:
            break
        syms[best_i : best_i + 2] = ["".join(syms[best_i : best_i + 2])]
    return syms


# ---------------------------------------------------------------------------
# Distributed operators
# ---------------------------------------------------------------------------


def train_bpe(
    df: DataFrame,
    text_col: str,
    num_merges: int = 200,
    vocab_limit: int = 20_000,
) -> list[tuple[str, str]]:
    """Train merges from a corpus column. Distributed word counting
    (map-side-combined groupBy); only the top ``vocab_limit`` words by
    (count desc, word) reach the driver. Deterministic: ordering has a
    total tiebreak and the merge loop breaks ties lexicographically."""
    counts = (
        df.select(F.explode(pretokens(text_col)).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("c"))
        .orderBy(F.col("c").desc(), "w")
        .limit(vocab_limit)
        .collect()
    )
    return bpe_train({r["w"]: r["c"] for r in counts}, num_merges)


def bpe_token_counts(
    df: DataFrame,
    text_col: str,
    id_col: str,
    merges: list[tuple[str, str]],
    out_col: str = "n_tokens",
) -> DataFrame:
    """Per-document token counts under a trained BPE vocabulary.

    Plan: explode pre-tokens -> count per (id, word) -> DISTINCT words
    segmented once each by an Arrow pandas UDF over the broadcast
    merge ranks -> broadcast the |vocab|-sized length table back onto
    the per-(id, word) counts -> weighted sum per id. The pandas UDF
    touches |distinct words| rows; every corpus-sized stage is codegen.
    """
    spark = df.sparkSession
    ranks = {pair: i for i, pair in enumerate(merges)}
    bc = spark.sparkContext.broadcast(ranks)

    @F.pandas_udf(IntegerType())
    def seg_len(words: pd.Series) -> pd.Series:
        r = bc.value
        return words.map(lambda w: len(bpe_segment(w, r)))

    per_word = (
        df.select(F.col(id_col), F.explode(pretokens(text_col)).alias("w"))
        .groupBy(id_col, "w")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    lens = (
        per_word.select("w")
        .distinct()
        .withColumn("len", seg_len(F.col("w")))
    )
    return (
        per_word.join(F.broadcast(lens), "w")
        .groupBy(id_col)
        .agg(F.sum(F.col("c") * F.col("len")).alias(out_col))
    )


def bpe_segment_table(
    df: DataFrame,
    text_col: str,
    id_col: str,
    merges: list[tuple[str, str]],
) -> DataFrame:
    """Full segmentation: (id, word, tokens array) per pre-token — the
    inspection surface for the tokenizer (what did 'lowest' become?).
    Same distinct-word plan as bpe_token_counts."""
    spark = df.sparkSession
    ranks = {pair: i for i, pair in enumerate(merges)}
    bc = spark.sparkContext.broadcast(ranks)

    @F.pandas_udf(ArrayType(StringType()))
    def seg(words: pd.Series) -> pd.Series:
        r = bc.value
        return words.map(lambda w: bpe_segment(w, r))

    words = df.select(F.col(id_col), F.explode(pretokens(text_col)).alias("w")).distinct()
    vocab = words.select("w").distinct().withColumn("tokens", seg(F.col("w")))
    return words.join(F.broadcast(vocab), "w").select(id_col, "w", "tokens")
