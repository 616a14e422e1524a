"""Text operators (SURVEY.md §2.9 T*, §2.2 P13-P14) + the text-analysis
north star (language-ID heuristic, quality scoring, token counting,
fingerprinting) over the ``documents`` table.

Everything here is built-in-expression only (whole-stage codegen, no
Python in the hot path) except the CJK numeral parser, which is a genuine
UDF need (P13).
"""

from __future__ import annotations

from collections.abc import Sequence

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import IntegerType

# ---------------------------------------------------------------------------
# Substring frequency (T4) — the Dream-of-the-Red-Chamber feature factory
# ---------------------------------------------------------------------------


def substring_count(col, word: str):
    """Non-overlapping substring occurrence count via the replace trick:
    (len(text) - len(replace(text, w, ''))) / len(w).

    Matches Python ``str.count`` semantics used by the reference
    (红楼梦作者分析.py:127). Pure codegen — no UDF for a 130-word x
    120-chapter matrix.
    """
    c = F.col(col) if isinstance(col, str) else col
    return (F.length(c) - F.length(F.replace(c, F.lit(word), F.lit("")))) / len(word)


def word_frequency_per_kchar(
    df: DataFrame, text_col: str, words: Sequence[str], per_chars: int = 1000
) -> DataFrame:
    """T4: per-document frequency of each word, normalized per
    ``per_chars`` characters (reference 红楼梦作者分析.py:117-133).

    Emits one wide column per word (the reference's feature-matrix
    shape). Column count = len(words); for very large vocabularies use
    the long form (explode a words dim table) instead.
    """
    exprs = {
        f"freq_{w}": substring_count(text_col, w) / F.length(F.col(text_col)) * per_chars
        for w in words
    }
    return df.withColumns(exprs)


def tokenize(df: DataFrame, text_col: str, out_col: str = "tokens", pattern: str = r"\s+") -> DataFrame:
    """Whitespace tokenization to an array column; feeds token counting,
    n-gram shingles, and ML feature stages."""
    return df.withColumn(out_col, F.split(F.col(text_col), pattern))


def token_count(df: DataFrame, text_col: str, out_col: str = "n_tokens") -> DataFrame:
    """North star: token counting — whitespace tokens (a BPE-ish regex
    variant is ``regexp_count(text, r"\\w+|[^\\w\\s]")``)."""
    return df.withColumn(out_col, F.size(F.split(F.trim(F.col(text_col)), r"\s+")))


def quality_score(df: DataFrame, text_col: str, stopwords: Sequence[str] = ("the", "a", "of", "and")) -> DataFrame:
    """North star: heuristic document quality features — length, token
    count, mean token length, punctuation ratio, stopword ratio. All
    codegen expressions; composes into filter thresholds for corpus
    cleaning at scale."""
    text = F.col(text_col)
    toks = F.split(F.trim(text), r"\s+")
    n_tok = F.size(toks)
    stop_arr = F.array(*[F.lit(s) for s in stopwords])
    n_stop = F.size(F.filter(toks, lambda t: F.array_contains(stop_arr, t)))
    return (
        df.withColumn("q_len", F.length(text))
        .withColumn("q_tokens", n_tok)
        .withColumn("q_mean_tok_len", (F.length(F.regexp_replace(text, r"\s+", "")) / n_tok))
        .withColumn("q_punct_ratio", F.regexp_count(text, F.lit(r"[^\w\s]")) / F.length(text))
        .withColumn("q_stopword_ratio", n_stop / n_tok)
    )


def lang_id_heuristic(df: DataFrame, text_col: str, out_col: str = "lang_pred") -> DataFrame:
    """North star: language-ID by script/character heuristic — CJK
    codepoint ratio vs ASCII; extend with per-language stopword hit
    rates. Deterministic and cheap; a real model slots in behind the
    same column contract via predict_batch_udf."""
    text = F.col(text_col)
    cjk = F.regexp_count(text, F.lit(r"[一-鿿]"))
    latin = F.regexp_count(text, F.lit(r"[A-Za-z]"))
    return df.withColumn(
        out_col,
        F.when(cjk > latin, F.lit("zh")).when(latin > 0, F.lit("en")).otherwise(F.lit("unknown")),
    )


def fingerprint(df: DataFrame, text_col: str, out_col: str = "fingerprint") -> DataFrame:
    """North star: document fingerprint — md5 of the
    whitespace-normalized, lowercased text. Stable across engines (used
    by exact dedup and the DuckDB oracle)."""
    normalized = F.lower(F.regexp_replace(F.trim(F.col(text_col)), r"\s+", " "))
    return df.withColumn(out_col, F.md5(normalized))


# ---------------------------------------------------------------------------
# Corpus splitting (P14) + CJK numeral parsing (P13)
# ---------------------------------------------------------------------------


def split_documents(df: DataFrame, text_col: str, delimiter_pattern: str, doc_col: str = "doc", idx_col: str = "doc_idx") -> DataFrame:
    """P14: split a wholetext corpus into one row per document with its
    position (reference 红楼梦作者分析.py:48-56 chapter split). posexplode
    keeps the original order as an explicit column — no implicit index."""
    parts = F.split(F.col(text_col), delimiter_pattern)
    return df.select(F.posexplode(parts).alias(idx_col, doc_col))


_CN_DIGITS = {"零": 0, "一": 1, "二": 2, "三": 3, "四": 4, "五": 5, "六": 6, "七": 7, "八": 8, "九": 9}
_CN_UNITS = {"十": 10, "百": 100, "千": 1000}


def parse_cn_numeral(s: str | None) -> int | None:
    """P13: Chinese numeral -> int (reference 红楼梦作者分析.py:59-82,
    e.g. 一百零八 -> 108). Pure function, registered as a UDF below."""
    if not s:
        return None
    total, current = 0, 0
    for ch in s:
        if ch in _CN_DIGITS:
            current = _CN_DIGITS[ch]
        elif ch in _CN_UNITS:
            unit = _CN_UNITS[ch]
            total += (current or 1) * unit
            current = 0
        else:
            return None
    return total + current


cn_numeral_udf = F.udf(parse_cn_numeral, IntegerType())


def repetition_metrics(df: DataFrame, text_col: str) -> DataFrame:
    """Gopher/C4-style repetition signals per document, pure array
    expressions (no explode, no shuffle — each doc computes its own
    metrics in the scan stage):

    - ``n_tokens``           whitespace token count
    - ``distinct_token_frac`` |distinct tokens| / n_tokens
    - ``dup_bigram_frac``     1 - |distinct bigrams| / |bigrams|
      (the 'repeated n-gram fraction' quality filter: boilerplate and
      looping generations score high)
    Single-token/empty docs define the fractions as 1.0 / 0.0 (nothing
    to repeat)."""
    w = F.split(F.col(text_col), " ")
    n = F.size(w)
    bigrams = F.expr(
        f"transform(sequence(0, size(split({text_col}, ' ')) - 2), "
        f"i -> concat(split({text_col}, ' ')[i], ' ', split({text_col}, ' ')[i+1]))"
    )
    return (
        df.withColumn("n_tokens", n)
        .withColumn(
            "distinct_token_frac",
            F.when(n > 0, F.size(F.array_distinct(w)) / n).otherwise(F.lit(1.0)),
        )
        .withColumn(
            "dup_bigram_frac",
            F.when(
                n > 1,
                1.0 - F.size(F.array_distinct(bigrams)) / (n - 1),
            ).otherwise(F.lit(0.0)),
        )
    )


#: RE2-and-Java compatible PII patterns (kept to the common regex
#: subset so the DuckDB oracle runs the IDENTICAL pattern).
EMAIL_RE = "[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}"
PHONE_RE = "\\+[0-9][0-9 -]{7,}[0-9]"


def redact_pii(df: DataFrame, text_col: str, out_col: str = "redacted") -> DataFrame:
    """PII scrub for training text (LLM-pipeline north star): replace
    emails / international-format phone numbers with typed placeholder
    tokens and count what was removed — pure regexp expressions in the
    scan stage, no Python. Pattern set is deliberately the
    RE2 ∩ Java-regex subset so the same strings drive the SQL oracle;
    a production pass would add locale-specific patterns behind the
    same shape."""
    text = F.col(text_col)
    n_emails = F.size(F.regexp_extract_all(text, F.lit(EMAIL_RE), F.lit(0)))
    redacted = F.regexp_replace(text, EMAIL_RE, "<EMAIL>")
    n_phones = F.size(F.regexp_extract_all(redacted, F.lit(PHONE_RE), F.lit(0)))
    redacted = F.regexp_replace(redacted, PHONE_RE, "<PHONE>")
    return (
        df.withColumn("n_emails", n_emails)
        .withColumn("n_phones", n_phones)
        .withColumn(out_col, redacted)
    )


def tfidf_top_terms(
    df: DataFrame,
    text_col: str,
    id_col: str,
    k: int = 3,
    min_df: int = 1,
) -> DataFrame:
    """TF-IDF with smooth idf (ln((N+1)/(df+1)) + 1, sklearn's
    formulation) and per-document top-``k`` terms — the corpus
    keyword-extraction step of a text-analytics pipeline.

    Plan: explode tokens once -> (doc, term) counts [shuffle 1] ->
    document frequency per term [shuffle 2, map-side combined] ->
    broadcast N (1-row) -> rank window per doc [shuffle 3 on doc id].
    All shuffles key on bounded-cardinality keys; nothing is collected.
    Ties rank deterministically by (tfidf desc, term asc)."""
    from pyspark.sql import Window

    toks = df.select(
        F.col(id_col).alias("__id"),
        F.explode(F.split(F.trim(F.lower(F.col(text_col))), r"\s+")).alias("term"),
    )
    tf = toks.groupBy("__id", "term").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df")).filter(
        F.col("df") >= min_df
    )
    n_docs = df.agg(F.count(F.lit(1)).alias("__n"))
    scored = (
        tf.join(dfreq, "term")
        .crossJoin(F.broadcast(n_docs))
        .withColumn(
            "tfidf",
            F.col("tf") * (F.log((F.col("__n") + 1) / (F.col("df") + 1)) + 1),
        )
    )
    w = Window.partitionBy("__id").orderBy(F.desc("tfidf"), F.asc("term"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            F.col("__id").alias(id_col),
            "term",
            F.round("tfidf", 6).alias("tfidf"),
            "rank",
        )
    )


def pack_offsets(
    df: DataFrame,
    token_col: str,
    order_by: Sequence[str],
    capacity: int,
    partition_by: Sequence[str] = (),
) -> DataFrame:
    """Concatenate-and-chunk sequence packing (the GPT-style pretraining
    layout: documents laid end-to-end in ``order_by`` order, the token
    stream cut into fixed ``capacity``-token training examples). Emits
    per document its ``start_offset`` in the stream, the ``chunk_id``
    containing its first token, and ``crosses_boundary`` (doc straddles
    a chunk cut — the rows an attention-masking packer cares about).

    One running-sum window. ``partition_by`` shards the stream (pack per
    source/shard) — REQUIRED at scale: an empty partition_by funnels the
    global cumsum through one partition, same caveat as with_row_number.
    """
    from pyspark.sql import Window

    w = Window.orderBy(*order_by)
    if partition_by:
        w = Window.partitionBy(*partition_by).orderBy(*order_by)
    cum = F.sum(F.col(token_col)).over(
        w.rowsBetween(Window.unboundedPreceding, 0)
    )
    start = (cum - F.col(token_col)).cast("long")
    cap = F.lit(capacity).cast("long")
    first_chunk = F.floor(start / cap)
    last_chunk = F.floor((cum - 1) / cap)
    return df.withColumns(
        {
            "start_offset": start,
            "chunk_id": first_chunk,
            "crosses_boundary": first_chunk != last_chunk,
        }
    )


def ngram_lm_scores(
    train_df: DataFrame,
    score_df: DataFrame,
    text_col: str,
    id_col: str,
    alpha: float = 0.5,
) -> DataFrame:
    """CCNet-style language-model quality scoring (Wenzek et al. 2020:
    filter CommonCrawl by the perplexity of a Wikipedia-trained LM).
    Here the LM is an add-alpha-smoothed bigram model TRAINED
    DISTRIBUTED on ``train_df`` and applied to ``score_df``; emits per
    document its token count, cross-entropy (bits/bigram) and
    perplexity. Low cross-entropy = fluent/common text; high = noise,
    boilerplate, other-language — the standard corpus-quality signal.

    Scale shape: the LM is two groupBy counts (bigram, unigram) over
    the training corpus — mergeable, map-side combined. Scoring joins
    each doc's bigrams against the bigram table ON THE BIGRAM KEY: both
    sides shuffle-partition by the same key, skew bounded by stop-pair
    frequency; unseen bigrams fall back to the smoothing floor via left
    join + coalesce. No driver-side state at any size; P(w2|w1) =
    (c12 + a) / (c1 + a*V) needs V (vocab size) and is folded in as a
    broadcast scalar.
    """
    toks = lambda c: F.split(F.trim(F.lower(F.regexp_replace(c, r"[^\w\s]", " "))), r"\s+")  # noqa: E731

    def doc_bigrams(frame: DataFrame) -> DataFrame:
        t = toks(F.col(text_col))
        pairs = F.zip_with(
            F.slice(t, 1, F.greatest(F.size(t) - 1, F.lit(0))),
            F.slice(t, 2, F.greatest(F.size(t) - 1, F.lit(0))),
            lambda a, b: F.concat_ws(" ", a, b),
        )
        return frame.select(F.col(id_col), F.explode(pairs).alias("bg")).withColumn(
            "w1", F.split(F.col("bg"), " ")[0]
        )

    train_bg = doc_bigrams(train_df)
    # ONE corpus pass: the unigram table and vocabulary size both
    # derive exactly from the bigram-count table (c1(w1) = Σ c12 over
    # bigrams starting with w1; V = |distinct w1|), so they fold off
    # the persisted per-bigram aggregate instead of re-tokenizing the
    # corpus twice more (measured ~1.6x on the benchmark query;
    # values are identical, the LM oracle stays hash-green).
    # localCheckpoint, not persist: the returned scores reference the
    # count blocks, so this function could never unpersist a persist()
    # — checkpoint blocks release when the caller drops the result
    # (ADVICE r6 leak class).
    bigram_counts = (
        train_bg.groupBy("bg", "w1")
        .agg(F.count(F.lit(1)).alias("c12"))
        .localCheckpoint(eager=True)
    )
    unigram_counts = bigram_counts.groupBy("w1").agg(F.sum("c12").alias("c1"))
    v = bigram_counts.select(F.countDistinct("w1").alias("v"))

    scored = (
        doc_bigrams(score_df)
        .join(bigram_counts.drop("w1"), "bg", "left")
        .join(unigram_counts, "w1", "left")
        .crossJoin(F.broadcast(v))
        .select(
            id_col,
            (
                -F.log2(
                    (F.coalesce(F.col("c12"), F.lit(0)) + F.lit(alpha))
                    / (F.coalesce(F.col("c1"), F.lit(0)) + F.lit(alpha) * F.col("v"))
                )
            ).alias("bits"),
        )
    )
    return (
        scored.groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            (F.sum("bits") / F.count(F.lit(1))).alias("cross_entropy"),
        )
        .withColumn("perplexity", F.pow(F.lit(2.0), F.col("cross_entropy")))
    )


def normalize_text(
    df: DataFrame,
    text_col: str,
    out_col: str | None = None,
    form: str = "NFKC",
    strip_control: bool = True,
    collapse_whitespace: bool = True,
) -> DataFrame:
    """Corpus text normalization (the C4/CCNet cleaning prelude):
    Unicode normalization to ``form`` (NFKC folds fullwidth/compat
    chars — the step that makes dedup hashes agree across visually
    identical texts), control-character stripping, and whitespace
    collapsing.

    Unicode normalization has no Spark built-in, so it runs as an
    Arrow pandas UDF over str.normalize (vectorized in pandas);
    the control/whitespace steps stay JVM-side regexp_replace so only
    the irreducible step pays the Python hop. Newlines survive both
    steps (line structure is signal); tab/space runs collapse to one
    space. Deterministic and idempotent:
    normalize(normalize(x)) == normalize(x) (tested).
    """
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("string")
    def _norm(s: pd.Series) -> pd.Series:
        return s.str.normalize(form)

    out = out_col or text_col
    col = _norm(F.col(text_col))
    if strip_control:
        col = F.regexp_replace(col, "[\\p{Cc}\\p{Cf}&&[^\\n\\t]]", "")
    if collapse_whitespace:
        col = F.trim(F.regexp_replace(col, "[ \\t]+", " "))
    return df.withColumn(out, col)


def bm25_search(
    df: DataFrame,
    id_col: str,
    text_col: str,
    query_terms: Sequence[str],
    k1: float = 1.2,
    b: float = 0.75,
    top_k: int = 10,
) -> DataFrame:
    """BM25 keyword retrieval (Robertson-Sparck Jones / Okapi BM25)
    over a document table: score every document against a bag of query
    terms, return the ``top_k`` by score — the full-text-search
    primitive a corpus-curation pipeline uses for targeted slicing
    (and the lexical half of hybrid lexical+ANN retrieval).

    Scale shape: two corpus passes — the hits pass (tokenize +
    explode, immediately filtered to the broadcast-tiny query-term set
    BEFORE the (doc, term) groupBy, so that shuffle carries only
    query-term hits, never the whole posting list) and a cheap
    constants pass (tokenize + size() into a 1-row aggregate, no
    explode/shuffle). Document frequency per term and the corpus
    constants are bounded aggregates joined back by broadcast. Final
    top-k is a TakeOrderedAndProject (orderBy+limit), never a global
    window. idf = ln(1 + (N - df + 0.5)/(df + 0.5)) (Lucene's
    non-negative variant); ties break on ascending doc id.
    """
    terms = sorted({t.lower() for t in query_terms})
    # Two passes over the corpus, by design: the HITS pass tokenizes
    # and explodes (dl and the explode come from the same __toks array
    # in one projection), while the CONSTANTS pass (N, avgdl) is
    # tokenize + size() + a 1-row aggregate — no explode, no shuffle,
    # so its cost is the scan plus the regex. Truly single-pass would
    # require materializing the exploded token table (corpus-sized
    # cache), a worse trade than one extra cheap scan. avgdl is an
    # average of exact-integer doubles — order-independent, so it is
    # engine-bit-identical for the oracle.
    toks = df.select(
        F.col(id_col).alias("__id"),
        F.regexp_extract_all(F.lower(F.col(text_col)), F.lit("([a-z0-9]+)")).alias(
            "__toks"
        ),
    ).select(
        "__id",
        F.size("__toks").cast("double").alias("dl"),
        F.explode("__toks").alias("term"),
    )
    hits = (
        toks.filter(F.col("term").isin(list(terms)))
        .groupBy("__id", "term")
        .agg(F.count(F.lit(1)).cast("double").alias("tf"), F.first("dl").alias("dl"))
    )
    dfreq = hits.groupBy("term").agg(F.count(F.lit(1)).cast("double").alias("df"))
    consts = df.agg(
        F.count(F.lit(1)).cast("double").alias("n_docs"),
        F.avg(
            F.size(
                F.regexp_extract_all(F.lower(F.col(text_col)), F.lit("([a-z0-9]+)"))
            )
        ).alias("avgdl"),
    )
    scored = (
        hits.join(F.broadcast(dfreq), "term")
        .crossJoin(F.broadcast(consts))
        .select(
            "__id",
            (
                F.log(
                    F.lit(1.0)
                    + (F.col("n_docs") - F.col("df") + F.lit(0.5))
                    / (F.col("df") + F.lit(0.5))
                )
                * (F.col("tf") * F.lit(k1 + 1.0))
                / (
                    F.col("tf")
                    + F.lit(k1)
                    * (
                        F.lit(1.0 - b)
                        + F.lit(b) * F.col("dl") / F.col("avgdl")
                    )
                )
            ).alias("term_score"),
        )
        .groupBy("__id")
        .agg(F.round(F.sum("term_score"), 6).alias("bm25"))
    )
    return (
        scored.orderBy(F.desc("bm25"), F.asc("__id"))
        .limit(top_k)
        .select(F.col("__id").alias(id_col), "bm25")
    )


def chunk_text(
    df: DataFrame,
    text_col: str,
    size: int,
    stride: int | None = None,
    keep_cols: Sequence[str] = (),
    chunk_col: str = "chunk",
) -> DataFrame:
    """Split each document into fixed-size character chunks with
    optional overlap (``stride`` < ``size``) — the RAG-indexing /
    training-sequence preparation step. Emits one row per chunk with
    its ordinal and 0-based start offset, so chunks are traceable back
    to their source span.

    Pure codegen: sequence() builds the start offsets from the row's
    own length, posexplode fans out, substring slices — no Python, no
    shuffle at all (chunking is embarrassingly row-local; downstream
    repartition is the caller's choice). Documents shorter than one
    chunk yield exactly one (possibly short) chunk; NULL/empty text
    yields no rows.
    """
    if stride is None:
        stride = size
    if stride <= 0 or size <= 0:
        raise ValueError("size and stride must be positive")
    if stride > size:
        raise ValueError(
            f"stride ({stride}) > size ({size}) would silently drop the text "
            "between chunks; only partition (stride == size) and overlap "
            "(stride < size) layouts are defined"
        )
    starts = F.sequence(
        F.lit(0), F.length(F.col(text_col)) - F.lit(1), F.lit(stride)
    )
    return (
        df.filter(F.length(F.col(text_col)) > 0)
        .select(
            *keep_cols,
            F.posexplode(starts).alias("chunk_idx", "start"),
            F.col(text_col),
        )
        .select(
            *keep_cols,
            F.col("chunk_idx").cast("long").alias("chunk_idx"),
            F.col("start").cast("long").alias("start"),
            F.substring(F.col(text_col), F.col("start") + F.lit(1), F.lit(size)).alias(
                chunk_col
            ),
        )
    )


def zipf_fit(
    df: DataFrame,
    text_col: str,
    min_count: int = 1,
    split_pattern: str = " ",
) -> DataFrame:
    """Zipf power-law fit of the corpus token distribution: OLS of
    ln(frequency) on ln(rank) over the type table, reported as
    zipf_alpha = -slope (natural corpora sit near 1.0) with its R².
    The one-row corpus health certificate data-quality reviews ask for:
    a synthetic or template-heavy corpus shows up as alpha far from 1
    or a poor log-log fit, before any downstream training does.

    Scale shape: token explode -> one map-combinable groupBy to the
    TYPE table (vocabulary — Heaps' law keeps it orders of magnitude
    smaller than the corpus; ``min_count`` prunes the hapax tail
    further). Ranking is a row_number over the type table ordered by
    (count desc, word) — deterministic under ties and cross-engine
    reproducible; it is the only non-map step and runs on vocabulary
    rows, never corpus rows. The regression itself is regr_slope /
    regr_r2 — one-pass JVM aggregates.

    NOTE: ``split_pattern`` is a Java REGEX (it feeds ``F.split``), not
    a literal delimiter — escape '.' or '|', and an oracle re-deriving
    the type table must tokenize with regex semantics
    (regexp_split_to_array) to match. The default single space is
    literal under both readings.
    """
    words = df.select(
        F.explode(F.split(F.col(text_col), split_pattern)).alias("word")
    ).filter(F.length("word") > 0)
    freq = (
        words.groupBy("word")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .filter(F.col("cnt") >= min_count)
    )
    from pyspark.sql import Window

    ranked = freq.withColumn(
        "rnk",
        F.row_number().over(
            Window.orderBy(F.col("cnt").desc(), F.col("word"))
        ),
    )
    y = F.log(F.col("cnt").cast("double"))
    x = F.log(F.col("rnk").cast("double"))
    return ranked.agg(
        F.count(F.lit(1)).cast("long").alias("n_types"),
        F.sum("cnt").cast("long").alias("n_tokens"),
        F.round(-F.regr_slope(y, x), 6).alias("zipf_alpha"),
        F.round(F.regr_r2(y, x), 6).alias("zipf_r2"),
    )


def dsir_importance_weights(
    df: DataFrame,
    id_col: str,
    text_col: str,
    target_pred,
    n_buckets: int = 4096,
    alpha: float = 1.0,
    bigrams: bool = True,
    seed: str = "dsir1",
    weight_col: str = "dsir_logw",
    round_to: int = 6,
) -> DataFrame:
    """Data Selection via Importance Resampling (DSIR, Xie et al.
    NeurIPS 2023) — the curation move for "give me more data LIKE this
    seed set": score every candidate document by how much more likely
    its hashed n-gram bag is under the TARGET distribution (rows where
    ``target_pred`` holds) than under the RAW corpus distribution.
    log-weight(doc) = sum over the doc's features of
    ln(p_target(bucket)) - ln(p_raw(bucket)), with add-``alpha``
    smoothing over ``n_buckets`` hashed feature buckets. Selecting the
    top-weighted candidates importance-resamples the raw pool toward
    the target domain.

    Features are SINGLE-SPACE-delimited unigrams (+ adjacent bigrams
    when ``bigrams``) — a literal ' ' split, matching the corpus
    convention used throughout this package, NOT general whitespace;
    run ``normalize_text`` (or a regexp_replace of tabs/newlines to
    spaces) first on corpora that aren't space-normalized, or the
    features silently become multi-word garbage. Hashing uses the
    ENGINE-PORTABLE md5 bucket
    (``relational.portable_hash32`` convention: first 8 hex chars of
    md5(seed + 0x1f + feature) mod n_buckets) — any SQL engine
    re-derives bucket ids, and therefore weights, bit-for-bit.

    Scale shape: one explode pass builds (doc, bucket) feature rows;
    the distribution fit is ONE map-combinable groupBy to <= n_buckets
    rows (conditional sums count target and raw in the same pass); the
    per-bucket log-ratio table is broadcast back and per-doc scores are
    a second map-combinable groupBy(id). No window, no self-join, no
    driver-side data beyond the bucket table. The feature explode runs
    twice (fit + score) — at corpus scale a stateless re-scan beats
    persisting an exploded token table several times the corpus size.

    Returns one row per input row: (id_col, is_target, weight_col).
    Target rows are scored too (useful as a sanity band) — callers
    filter them out before selection. Empty/whitespace-only documents
    score 0.0 (no features, an empty sum) rather than NULL.
    """
    if n_buckets <= 0:
        raise ValueError(f"dsir_importance_weights: n_buckets must be > 0, got {n_buckets}")
    if alpha <= 0:
        raise ValueError(
            f"dsir_importance_weights: alpha must be > 0 (unsmoothed empty "
            f"buckets make ln(0) weights), got {alpha}"
        )
    toks = F.filter(F.split(F.col(text_col), " "), lambda t: F.length(t) > 0)
    feats = toks
    if bigrams:
        n = F.size(toks)
        big = F.zip_with(
            F.slice(toks, 1, F.greatest(n - 1, F.lit(0))),
            F.slice(toks, 2, F.greatest(n - 1, F.lit(0))),
            lambda a, b: F.concat(a, F.lit(" "), b),
        )
        feats = F.concat(toks, big)
    is_t = F.col(target_pred) if isinstance(target_pred, str) else target_pred
    base = df.select(
        F.col(id_col),
        is_t.alias("is_target"),
        F.explode(feats).alias("feat"),
    )
    from big_data_analysis_spark.operators.relational import portable_hash32

    bucket = (portable_hash32(["feat"], seed) % n_buckets).alias("bucket")
    fb = base.select(id_col, "is_target", bucket)
    # The distribution fit is collected ONCE (<= n_buckets tiny rows):
    # totals come from the same collected list, and the ratio table is
    # rebuilt driver-side — re-deriving it from the DataFrame's lineage
    # would silently re-run the full feature explode a second (totals)
    # and third (ratios) time when the result executes.
    import math

    dist_rows = (
        fb.groupBy("bucket")
        .agg(
            F.sum(F.when(F.col("is_target"), 1).otherwise(0)).alias("t_cnt"),
            F.count(F.lit(1)).alias("r_cnt"),
        )
        .collect()
    )
    t_tot = float(sum(r["t_cnt"] for r in dist_rows)) + alpha * n_buckets
    r_tot = float(sum(r["r_cnt"] for r in dist_rows)) + alpha * n_buckets
    spark = df.sparkSession
    ratios = spark.createDataFrame(
        [
            (
                int(r["bucket"]),
                math.log((r["t_cnt"] + alpha) / t_tot)
                - math.log((r["r_cnt"] + alpha) / r_tot),
            )
            for r in dist_rows
        ],
        "bucket long, __lr double",
    )
    scored = (
        fb.join(F.broadcast(ratios), "bucket")
        .groupBy(id_col)
        .agg(F.sum("__lr").alias("__sum_lr"))
    )
    return (
        df.select(F.col(id_col), is_t.alias("is_target"))
        .join(scored, id_col, "left")
        .select(
            id_col,
            "is_target",
            F.round(F.coalesce(F.col("__sum_lr"), F.lit(0.0)), round_to).alias(weight_col),
        )
    )
