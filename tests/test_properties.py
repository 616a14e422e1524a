"""Property-based tests (hypothesis): pin reference-semantics parity on
randomized inputs, not just hand-picked cases. Spark round-trips are
slow per example, so pandas-parity properties batch MANY random cases
into ONE DataFrame per test run."""

from __future__ import annotations

import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from big_data_analysis_spark.operators.text import parse_cn_numeral

# ---------------------------------------------------------------------------
# Pure-function properties (no Spark session: cheap, many examples)
# ---------------------------------------------------------------------------

_CN_DIGITS = "一二三四五六七八九"


def _int_to_cn(n: int) -> str:
    """Reference-style Chinese numeral writer for 1..999 (the chapter
    range the reference parses, 红楼梦作者分析.py:59-82)."""
    assert 1 <= n <= 999
    out = []
    h, rest = divmod(n, 100)
    t, o = divmod(rest, 10)
    if h:
        out.append(_CN_DIGITS[h - 1] + "百")
        if rest and t == 0:
            out.append("零")
    if t:
        out.append((_CN_DIGITS[t - 1] if not (t == 1 and not h) else "") + "十")
    if o:
        out.append(_CN_DIGITS[o - 1])
    return "".join(out)


@given(st.integers(min_value=1, max_value=999))
@settings(max_examples=300)
def test_cn_numeral_roundtrip(n):
    assert parse_cn_numeral(_int_to_cn(n)) == n


@given(st.text(alphabet="abcdefg零一二三四五六七八九十百千 ", max_size=8))
@settings(max_examples=200)
def test_cn_numeral_never_raises(s):
    r = parse_cn_numeral(s)
    assert r is None or isinstance(r, int)


# ---------------------------------------------------------------------------
# Spark vs pandas parity on randomized series (one batched run)
# ---------------------------------------------------------------------------


def test_window_ops_match_pandas_on_random_series(spark):
    """200 random series values, every (op, param) from the COVID feature
    factory — parity with pandas in one Spark job per op family."""
    import random

    rng = random.Random(123)
    values = [round(rng.uniform(-100, 100), 3) for _ in range(200)]
    pdf = pd.DataFrame({"y": values})
    sdf = spark.createDataFrame([(i, v) for i, v in enumerate(values)], ["day", "y"])

    from big_data_analysis_spark.operators import timeseries as ts

    lagged = ts.add_lag_features(sdf, ["y"], [1, 3, 7], order_by=["day"])
    ma = ts.add_trailing_mean(sdf, ["y"], [3, 7], order_by=["day"])
    got_l = lagged.orderBy("day").collect()
    got_m = ma.orderBy("day").collect()

    for n in (1, 3, 7):
        exp = pdf["y"].shift(n)
        for i, row in enumerate(got_l):
            e = exp.iloc[i]
            g = row[f"y_lag{n}"]
            assert (g is None and pd.isna(e)) or abs(g - e) < 1e-9

    for n in (3, 7):
        exp = pdf["y"].rolling(n, min_periods=1).mean().shift(1)
        for i, row in enumerate(got_m):
            e = exp.iloc[i]
            g = row[f"y_ma{n}"]
            assert (g is None and pd.isna(e)) or abs(g - e) < 1e-9


def test_keep_last_matches_pandas_on_random_frame(spark):
    """Random keyed frame: dedup_keep_last == pandas sort + drop_duplicates
    (keep='last') for every key."""
    import random

    from big_data_analysis_spark.operators.relational import dedup_keep_last

    rng = random.Random(7)
    rows = [
        (rng.randrange(10), i, rng.randrange(1000))  # key, unique seq, value
        for i in range(500)
    ]
    pdf = pd.DataFrame(rows, columns=["k", "seq", "v"])
    expected = (
        pdf.sort_values("seq").drop_duplicates(subset=["k"], keep="last").set_index("k")["v"].to_dict()
    )
    sdf = spark.createDataFrame(rows, ["k", "seq", "v"])
    got = {r["k"]: r["v"] for r in dedup_keep_last(sdf, ["k"], ["seq"]).collect()}
    assert got == expected


# ---------------------------------------------------------------------------
# Operator properties over randomized batched inputs (one Spark job per
# test run, not per example)
# ---------------------------------------------------------------------------


def test_merge_upsert_idempotent_and_complete(spark):
    """Applying the same delta twice == once (idempotence of MERGE), and
    the merged keyset is exactly base ∪ delta — on a randomized table."""
    import random

    from big_data_analysis_spark.operators import relational as rel

    rng = random.Random(7)
    base_rows = [(k, rng.randint(0, 99), 1) for k in range(200)]
    delta_rows = [
        (rng.randint(0, 299), rng.randint(100, 199), 2) for _ in range(120)
    ]
    # Unique delta keys (MERGE contract: one update row per key).
    delta_rows = list({r[0]: r for r in delta_rows}.values())
    base = spark.createDataFrame(base_rows, "k int, v int, version int")
    delta = spark.createDataFrame(delta_rows, "k int, v int, version int")

    once = rel.merge_upsert(base, delta, ["k"], "version")
    twice = rel.merge_upsert(once, delta, ["k"], "version")
    got_once = sorted(map(tuple, once.collect()))
    got_twice = sorted(map(tuple, twice.collect()))
    assert got_once == got_twice
    assert {r[0] for r in got_once} == {r[0] for r in base_rows} | {
        r[0] for r in delta_rows
    }
    # Every delta key carries the delta value.
    d = {r[0]: r[1] for r in delta_rows}
    assert all(v == d[k] for k, v, _ in got_once if k in d)


def test_pack_offsets_contiguous_stream(spark):
    """Offsets tile the per-shard token stream exactly: sorted by order
    key, each doc starts where the previous ended, and chunk bounds
    agree with integer division — on randomized token counts."""
    import random

    from big_data_analysis_spark.operators import text as tx

    rng = random.Random(11)
    rows = [
        (f"s{rng.randint(0, 2)}", i, rng.randint(1, 700)) for i in range(300)
    ]
    df = spark.createDataFrame(rows, "source string, doc_id int, n_tok int")
    out = tx.pack_offsets(df, "n_tok", ["doc_id"], capacity=256, partition_by=["source"])
    by_src = {}
    for r in out.collect():
        by_src.setdefault(r["source"], []).append(r)
    for docs in by_src.values():
        docs.sort(key=lambda r: r["doc_id"])
        expect_start = 0
        for r in docs:
            assert r["start_offset"] == expect_start
            assert r["chunk_id"] == r["start_offset"] // 256
            end_chunk = (r["start_offset"] + r["n_tok"] - 1) // 256
            assert r["crosses_boundary"] == (r["chunk_id"] != end_chunk)
            expect_start += r["n_tok"]


@given(
    st.lists(
        st.text(alphabet="abcdef", min_size=1, max_size=8), min_size=1, max_size=30
    ),
    st.integers(min_value=0, max_value=20),
)
@settings(max_examples=60, deadline=None)
def test_bpe_segments_always_reassemble(words, num_merges):
    """For ANY vocabulary and merge budget: every word's segments
    concatenate back to word + EOW, and segment count is >= 1."""
    from collections import Counter

    from big_data_analysis_spark.operators import tokenize as tk

    wc = Counter(words)
    ranks = {p: i for i, p in enumerate(tk.bpe_train(dict(wc), num_merges))}
    for w in set(words) | {"zz", "a"}:
        segs = tk.bpe_segment(w, ranks)
        assert len(segs) >= 1
        assert "".join(segs) == w + tk.EOW


def test_seasonal_decomposition_identity_any_series(spark):
    """value == trend + seasonal + residual EXACTLY wherever trend is
    defined, for an arbitrary (seedy, non-seasonal) series — the
    additive identity is structural, not statistical."""
    import random

    from big_data_analysis_spark.operators.timeseries import seasonal_decompose

    rng = random.Random(3)
    rows = [(t, rng.uniform(-100, 100)) for t in range(40)]
    df = spark.createDataFrame(rows, "t int, y double")
    for period in (3, 4, 7):
        for r in seasonal_decompose(df, "t", "y", period).collect():
            if r["trend"] is not None:
                assert abs(r["y"] - (r["trend"] + r["seasonal"] + r["residual"])) < 1e-9


def test_calibration_partitions_rows_exactly(spark):
    """Bin sizes sum to N and the weighted pos_rate recovers the global
    positive rate — conservation laws of the binning."""
    import random

    from big_data_analysis_spark.ml.evaluation import calibration_table

    rng = random.Random(5)
    rows = [(float(rng.random() < 0.3), float(rng.choice([1, 2, 2, 3, 5]))) for _ in range(500)]
    df = spark.createDataFrame(rows, "label double, score double")
    out = calibration_table(df, "label", "score", 5).collect()
    assert sum(r["n"] for r in out) == 500
    global_rate = sum(r["pos_rate"] * r["n"] for r in out) / 500
    assert abs(global_rate - sum(x for x, _ in rows) / 500) < 1e-4


def test_add_rolling_corr_matches_numpy(spark):
    """Trailing 3-row Pearson corr equals numpy's corrcoef per frame;
    single-row frames are NULL (not an ANSI divide error), constant
    frames are NULL."""
    import numpy as np

    from big_data_analysis_spark.operators.timeseries import add_rolling_corr

    xs = [1.0, 3.0, 2.0, 5.0, 4.0, 4.0]
    ys = [2.0, 1.0, 4.0, 3.0, 6.0, 5.0]
    df = spark.createDataFrame(
        [(i, xs[i], ys[i]) for i in range(6)], "i int, x double, y double"
    )
    out = {
        r["i"]: r["c"]
        for r in add_rolling_corr(df, "x", "y", 3, order_by=["i"], out_col="c").collect()
    }
    assert out[0] is None  # single-point frame
    for i in range(1, 6):
        lo = max(0, i - 2)
        expect = np.corrcoef(xs[lo : i + 1], ys[lo : i + 1])[0, 1]
        assert abs(out[i] - expect) < 1e-9, (i, out[i], expect)
    # constant series -> NULL
    cdf = spark.createDataFrame([(i, 1.0, float(i)) for i in range(4)], "i int, x double, y double")
    cout = add_rolling_corr(cdf, "x", "y", 3, order_by=["i"], out_col="c").collect()
    assert all(r["c"] is None for r in cout)


@given(
    st.lists(st.integers(min_value=0, max_value=30), min_size=2, max_size=60),
    st.integers(min_value=2, max_value=7),
)
@settings(max_examples=12, deadline=None)
def test_quantile_bins_exact_ntile_property(spark, values, n_bins):
    """Property: for ANY value multiset and bin count, the distributed
    exact-ntile path reproduces SQL ntile bin-for-bin (sizes differ by
    at most one, rank order respected, ties split by the tiebreak)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from big_data_analysis_spark.operators.relational import quantile_bins

    df = spark.createDataFrame(
        [(i, float(v)) for i, v in enumerate(values)], "id int, v double"
    )
    got = {
        r["id"]: r["bin"]
        for r in quantile_bins(
            df.repartition(5), "v", n_bins, order_tiebreak=["id"], exact_ntile=True
        ).collect()
    }
    want = {
        r["id"]: r["ref"]
        for r in df.withColumn(
            "ref", F.ntile(n_bins).over(Window.orderBy("v", "id"))
        ).collect()
    }
    assert got == want


def test_chunk_text_partitions_any_text(spark):
    """Chunking invariants on randomized texts batched into one frame:
    with stride==size the chunks partition the text exactly; with
    overlap every chunk starts at stride*i and is <= size chars; no
    text content is lost or invented."""
    import random

    from big_data_analysis_spark.operators.text import chunk_text

    rng = random.Random(7)
    alphabet = "abc xyz.\n"
    rows = [
        (i, "".join(rng.choice(alphabet) for _ in range(rng.randint(1, 400))))
        for i in range(60)
    ]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    texts = dict(rows)

    for size, stride in ((50, 50), (64, 40), (7, 3)):
        got = chunk_text(df, "text", size=size, stride=stride, keep_cols=("doc_id",))
        by_doc: dict[int, list] = {}
        for r in got.collect():
            by_doc.setdefault(r["doc_id"], []).append(r)
        assert set(by_doc) == set(texts)
        for doc, chunks in by_doc.items():
            chunks.sort(key=lambda r: r["chunk_idx"])
            t = texts[doc]
            for i, r in enumerate(chunks):
                assert r["chunk_idx"] == i and r["start"] == i * stride
                assert r["chunk"] == t[r["start"] : r["start"] + size]
            # coverage: last chunk reaches the end of the text
            last = chunks[-1]
            assert last["start"] + len(last["chunk"]) == len(t)


def test_holt_linear_matches_pure_python(spark):
    """Holt recurrence parity on random series: the distributed
    applyInPandas output must equal a plain-Python reference loop
    bit-for-bit (the property the recursive-CTE oracle relies on)."""
    import random

    from big_data_analysis_spark.operators.timeseries import holt_linear

    rng = random.Random(13)
    rows = []
    series: dict[int, list[float]] = {}
    for g in range(8):
        n = rng.randint(1, 40)
        ys = [round(rng.uniform(-100, 100), 3) for _ in range(n)]
        series[g] = ys
        rows += [(g, t, y) for t, y in enumerate(ys)]
    df = spark.createDataFrame(rows, "g int, t int, y double")
    out = holt_linear(df, order_by=["t"], value_col="y", partition_by=["g"],
                      alpha=0.37, beta=0.21)
    got = {(r["g"], r["t"]): (r["level"], r["trend"]) for r in out.collect()}

    a, b = 0.37, 0.21
    for g, ys in series.items():
        lv = tr = None
        for t, y in enumerate(ys):
            if t == 0:
                lv = float(y)
                tr = float(ys[1]) - float(ys[0]) if len(ys) > 1 else 0.0
            else:
                nl = a * float(y) + (1.0 - a) * (lv + tr)
                tr = b * (nl - lv) + (1.0 - b) * tr
                lv = nl
            assert got[(g, t)] == (lv, tr), (g, t)


def test_rrf_fuse_permutation_invariant(spark):
    """RRF's fused scores depend only on each doc's per-list ranks —
    shuffling row order / repartitioning the inputs changes nothing."""
    import random

    from big_data_analysis_spark.operators.similarity import rrf_fuse

    rng = random.Random(99)
    lists = []
    for _ in range(3):
        ids = rng.sample(range(100), 30)
        lists.append([(d, i + 1) for i, d in enumerate(ids)])
    dfs = [spark.createDataFrame(l, "doc_id int, rank int") for l in lists]
    base = rrf_fuse(dfs, "doc_id", top_k=20).collect()
    shuffled = [
        spark.createDataFrame(sorted(l, key=lambda x: rng.random()),
                              "doc_id int, rank int").repartition(7)
        for l in lists
    ]
    again = rrf_fuse(shuffled, "doc_id", top_k=20).collect()
    assert [tuple(r) for r in base] == [tuple(r) for r in again]


@settings(max_examples=300, deadline=None)
@given(
    h=st.integers(min_value=0, max_value=(1 << 64) - 1),
    flips=st.sets(st.integers(min_value=0, max_value=63), min_size=0, max_size=3),
)
def test_simhash_combo_tables_never_miss_within_hamming_3(h, flips):
    """The Manku pigeonhole guarantee as pure math (the Spark parity
    test covers the plumbing; this covers the block geometry for every
    hash and flip pattern): any pair within hamming distance 3 must
    share at least one full 3-block combination, i.e. collide in at
    least one of the C(6,3) candidate tables that
    dedup.simhash_candidate_pairs joins on."""
    import itertools

    from big_data_analysis_spark.operators.dedup import _simhash_block_widths

    h2 = h
    for b in flips:
        h2 ^= 1 << b
    widths = _simhash_block_widths(6)
    offsets = [sum(widths[:i]) for i in range(6)]

    def block(x, i):
        return (x >> offsets[i]) & ((1 << widths[i]) - 1)

    matching = [i for i in range(6) if block(h, i) == block(h2, i)]
    collides = any(
        all(i in matching for i in combo)
        for combo in itertools.combinations(range(6), 3)
    )
    assert collides, (hex(h), sorted(flips), matching)


# ---------------------------------------------------------------------------
# Decimal-exactness invariants (randomized): the bucketed/fixed-point
# plans must equal their definitional forms on ADVERSARIAL float inputs,
# not just hand-picked cases. One batched Spark run per property.
# ---------------------------------------------------------------------------


def test_budget_prefix_matches_naive_on_random_float_weights(spark):
    """Randomized knife-edge hunting: fractional weights drawn from a
    small set of awkward decimals (0.1, 0.3, 0.7 sums are classic
    double-rounding traps) across several groups and budget positions —
    the bucketed boundary plan must equal the definitional decimal
    cumulative window row-for-row, every time."""
    import random

    from pyspark.sql import functions as F

    from big_data_analysis_spark.operators import relational as rel
    from tests.test_relational import _naive_budget_prefix

    rng = random.Random(77)
    awkward = [0.1, 0.2, 0.3, 0.7, 1.1, 0.000001, 2.999999]
    rows = [
        (i, f"g{i % 4}", rng.choice(awkward)) for i in range(600)
    ]
    df = spark.createDataFrame(rows, "doc_id long, grp string, w double")
    totals = {
        r["grp"]: float(r["t"])
        for r in df.groupBy("grp").agg(F.sum("w").alias("t")).collect()
    }
    # budgets at awkward fractions of each group's total, incl. a
    # fraction that lands exactly on a cumulative step often
    budgets = {
        g: round(t * rng.choice([0.1, 0.333333, 0.5, 0.777777, 0.999999]), 6)
        for g, t in totals.items()
    }
    got = rel.budget_prefix_sample(df, ["doc_id"], "w", "grp", budgets, seed="p", buckets=16)
    want = _naive_budget_prefix(spark, df, budgets, "p")
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0


def test_weighted_quantiles_match_python_reference_on_random_floats(spark):
    """Random fractional weights + duplicate values: the Spark decimal
    CDF must select exactly the value the definitional Python Decimal
    computation selects, for every q on a 1e-6 grid."""
    import random
    from decimal import ROUND_HALF_UP, Decimal
    from itertools import groupby

    from big_data_analysis_spark.operators import relational as rel

    rng = random.Random(41)
    q6 = Decimal("0.000001")
    data = [
        (rng.randint(0, 30), rng.choice([0.1, 0.3, 0.999999, 1.0, 2.000002]))
        for _ in range(400)
    ]
    df = spark.createDataFrame(data, "v int, w double")
    qs = [0.123456, 0.333333, 0.5, 0.875, 0.999999]
    got = rel.weighted_quantiles(df, "v", "w", qs).head()

    # definitional: exact decimal value-level CDF
    dec = [(v, Decimal(str(w)).quantize(q6, rounding=ROUND_HALF_UP)) for v, w in data]
    dec.sort()
    tot = sum(w for _, w in dec)

    def manual(q):
        thr = Decimal(str(q)) * tot
        cum = Decimal(0)
        for v, grp in groupby(dec, key=lambda t: t[0]):
            cum += sum(w for _, w in grp)
            if cum >= thr:
                return v
        return dec[-1][0]

    for q in qs:
        name = f"wq_{str(q).replace('.', '_')}"
        assert got[name] == manual(q), (q, got[name], manual(q))


def test_leakage_safe_split_invariants_on_random_corpus(spark):
    """Randomized leakage-split invariants in ONE Spark round-trip:
    for a corpus with a random duplicate structure (each text assigned
    to a random group; ids shuffled so group members are non-adjacent),
    (a) every row survives with both columns, (b) all members of a
    text-duplicate group share group_key AND side, (c) group_key is the
    group's minimum id (exact_dedup's keeper convention), and (d) the
    assignment is a pure function of the group key: re-running on a
    REPARTITIONED input yields the identical mapping."""
    import random

    from big_data_analysis_spark.operators import dedup as dd

    rng = random.Random(8)
    n_groups, rows = 60, []
    ids = list(range(1000))
    rng.shuffle(ids)
    for i, doc_id in enumerate(ids[:300]):
        g = rng.randrange(n_groups)
        rows.append((doc_id, f"group {g} shared text body with words"))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = dd.leakage_safe_split(df, "text", "doc_id", test_fraction=0.4).collect()
    assert len(out) == 300
    by_text: dict = {}
    for r in out:
        by_text.setdefault(r["text"], []).append(r)
    for members in by_text.values():
        keys = {m["group_key"] for m in members}
        sides = {m["split"] for m in members}
        assert len(keys) == 1 and len(sides) == 1
        assert keys.pop() == min(m["doc_id"] for m in members)
    again = {
        r["doc_id"]: (r["group_key"], r["split"])
        for r in dd.leakage_safe_split(
            df.repartition(17), "text", "doc_id", test_fraction=0.4
        ).collect()
    }
    assert again == {r["doc_id"]: (r["group_key"], r["split"]) for r in out}


def test_contamination_overlap_matches_pure_python(spark):
    """Randomized fractional-contamination parity: overlap_frac must
    equal the pure-Python distinct-shingle computation for every doc,
    including 0.0 rows (clean docs are certified, not omitted)."""
    import random

    from big_data_analysis_spark.operators import dedup as dd

    rng = random.Random(88)
    vocab = [f"w{i}" for i in range(30)]
    mk = lambda k: " ".join(rng.choice(vocab) for _ in range(k))  # noqa: E731
    train_rows = [(i, mk(rng.randrange(3, 15))) for i in range(80)]
    bench_rows = [(1000 + i, mk(rng.randrange(3, 15))) for i in range(20)]
    n = 2

    def shingles(text):
        toks = text.strip().lower().split()
        if len(toks) <= n - 1:
            return {" ".join(toks)}
        return {" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)}

    bench_vocab = set().union(*(shingles(t) for _, t in bench_rows))
    expect = {}
    for i, t in train_rows:
        s = shingles(t)
        expect[i] = (len(s), len(s & bench_vocab))
    train = spark.createDataFrame(train_rows, "doc_id long, text string")
    bench = spark.createDataFrame(bench_rows, "doc_id long, text string")
    got = {
        r["doc_id"]: r
        for r in dd.contamination_overlap_scores(
            train, bench, "text", "doc_id", n=n
        ).collect()
    }
    assert set(got) == set(expect)  # every train doc reported
    for i, (ng, nh) in expect.items():
        assert (got[i]["n_grams"], got[i]["n_hit"]) == (ng, nh), i
        assert got[i]["overlap_frac"] == round(nh / ng, 6)


def test_split_increment_composition_on_random_corpus(spark, request):
    """Randomized composition property of the incremental split (one
    Spark round-trip): with shard ids above corpus ids and no pairs,
    save(A) then increment(B) assigns EXACTLY what the batch operator
    assigns over A ∪ B — every group key and side identical — and the
    union of store rows covers every id exactly once. Random corpora
    carry injected duplicates both WITHIN the shard and ACROSS
    corpus/shard so both inheritance and fresh grouping are exercised
    on every example."""
    import os
    import random
    import shutil

    from big_data_analysis_spark.operators import dedup as dd

    rng = random.Random(90210)
    base = f"/root/repo/.scratch/split-prop-{os.getpid()}"
    request.addfinalizer(lambda: shutil.rmtree(base, ignore_errors=True))
    for case in range(3):
        path = f"{base}/c{case}"
        shutil.rmtree(path, ignore_errors=True)
        n_a, n_b = rng.randint(5, 40), rng.randint(5, 40)
        texts_a = [f"corpus {case} doc {i} {rng.randint(0, 6)}"
                   for i in range(n_a)]
        # shard: fresh texts + copies of corpus texts + within-shard dups
        texts_b = []
        for i in range(n_b):
            kind = rng.random()
            if kind < 0.3 and texts_a:
                texts_b.append(rng.choice(texts_a))      # inherit
            elif kind < 0.5 and texts_b:
                texts_b.append(rng.choice(texts_b))      # within-shard dup
            else:
                texts_b.append(f"shard {case} fresh {i} {rng.randint(0, 6)}")
        a = spark.createDataFrame(
            list(enumerate(texts_a)), "doc_id long, text string")
        b = spark.createDataFrame(
            [(1000 + i, t) for i, t in enumerate(texts_b)],
            "doc_id long, text string")
        dd.split_index_save(a, "text", "doc_id", path, test_fraction=0.35)
        inc = {r["doc_id"]: (r["group_key"], r["split"])
               for r in dd.leakage_split_increment(
                   spark, b, "text", path).collect()}
        batch = {r["doc_id"]: (r["group_key"], r["split"])
                 for r in dd.leakage_safe_split(
                     a.unionByName(b), "text", "doc_id",
                     test_fraction=0.35).collect()}
        assert inc == {i: batch[i] for i in inc}, f"case {case} diverged"
        store = {r["id"]: (r["group_key"], r["split"])
                 for r in dd.split_index_load(spark, path)[0].collect()}
        assert store == batch, f"case {case}: store != batch over A∪B"


def test_containment_prefix_parity_on_random_corpora(spark):
    """Randomized filter-verify parity for the containment join (one
    Spark round-trip per case): on corpora with zipf-ish token draws —
    hot tokens make hot gram buckets, the prefix filter's adversarial
    case — the prefix-filtered join returns exactly the naive join's
    rows, and every containment-1.0 planted pair (a doc's prefix of
    another) is found."""
    import random

    from big_data_analysis_spark.operators import dedup as dd

    rng = random.Random(424242)
    vocab = [f"w{i}" for i in range(30)]
    for case in range(2):
        rows = []
        for i in range(30):
            k = rng.randint(4, 14)
            # zipf-ish: low indices drawn often => hot grams
            toks = [vocab[min(int(rng.expovariate(0.35)), 29)] for _ in range(k)]
            rows.append((i, " ".join(toks)))
        # plant quoted-inside cases: doc 100+i = first 4 tokens of doc i
        for i in range(5):
            rows.append((100 + i, " ".join(rows[i][1].split()[:4])))
        df = spark.createDataFrame(rows, "doc_id long, text string")
        kw = dict(n=2, threshold=0.75)
        pf = {(r["id_a"], r["id_b"]): (r["containment_a"], r["containment_b"])
              for r in dd.ngram_containment_pairs(
                  df, "text", "doc_id", prefix_filter=True, **kw).collect()}
        naive = {(r["id_a"], r["id_b"]): (r["containment_a"], r["containment_b"])
                 for r in dd.ngram_containment_pairs(
                     df, "text", "doc_id", prefix_filter=False, **kw).collect()}
        assert pf == naive, f"case {case}: prefix != naive"
        for i in range(5):
            assert (i, 100 + i) in pf, f"case {case}: planted pair {i} missed"
            assert pf[(i, 100 + i)][1] == 1.0


def test_containment_increment_composition_on_random_corpus(spark, request):
    """Randomized composition property of the incremental containment
    tier: save(A) then increment(B) against the persisted gram index
    emits EXACTLY the batch ngram_containment_pairs over A ∪ B
    restricted to shard-touching pairs — on zipf-ish corpora with
    planted quoted-inside cases in BOTH directions (a stored doc's
    prefix arriving as a new short doc, and a new long doc quoting a
    stored doc whole), the adversarial cases for the two stored-prefix
    probes."""
    import os
    import random
    import shutil

    from big_data_analysis_spark.operators import dedup as dd

    rng = random.Random(31337)
    base = f"/root/repo/.scratch/cont-prop-{os.getpid()}"
    request.addfinalizer(lambda: shutil.rmtree(base, ignore_errors=True))
    vocab = [f"w{i}" for i in range(30)]

    def rand_text():
        k = rng.randint(4, 14)
        return " ".join(
            vocab[min(int(rng.expovariate(0.35)), 29)] for _ in range(k)
        )

    for case in range(2):
        path = f"{base}/c{case}"
        shutil.rmtree(path, ignore_errors=True)
        store_rows = [(i, rand_text()) for i in range(25)]
        shard_rows = [(100 + i, rand_text()) for i in range(20)]
        # plant: shard doc = prefix of a stored doc (shard-in-store);
        # shard doc = stored doc + padding (store-in-shard)
        for i in range(3):
            shard_rows.append(
                (200 + i, " ".join(store_rows[i][1].split()[:4]))
            )
            shard_rows.append(
                (300 + i, store_rows[i][1] + " " + rand_text())
            )
        df = spark.createDataFrame(
            store_rows + shard_rows, "doc_id long, text string"
        )
        key = lambda r: (r["id_a"], r["id_b"], r["containment_a"],
                         r["containment_b"], r["common"])
        dd.containment_index_save(
            df.filter("doc_id < 100"), "text", "doc_id", path,
            n=2, threshold=0.75,
        )
        inc = {
            key(r)
            for r in dd.containment_dedup_increment(
                spark,
                df.filter("doc_id >= 100"), "text", path,
            ).collect()
        }
        batch = {
            key(r)
            for r in dd.ngram_containment_pairs(
                df, "text", "doc_id", n=2, threshold=0.75
            ).collect()
            if r["id_a"] >= 100 or r["id_b"] >= 100
        }
        assert inc == batch, f"case {case}: increment != batch-touching"
        # planted pairs in both directions were found: a short shard
        # doc inside a stored doc rides the SHARD prefix probe; a
        # stored doc quoted whole inside a new long doc rides the
        # STORED prefix probe
        for i in range(3):
            assert any(a == i and b == 200 + i for a, b, *_ in inc), (
                f"case {case}: shard-prefix probe missed {(i, 200 + i)}"
            )
            assert any(a == i and b == 300 + i for a, b, *_ in inc), (
                f"case {case}: stored-prefix probe missed {(i, 300 + i)}"
            )


def test_sem_stream_geometry_margins(spark):
    """The streaming-semantic fixture's load-bearing geometry, verified
    with numpy over the full seed ∪ streamed id range: same group &
    kind -> cosine >= 0.99 (a duplicate the tier finds); novel-novel
    across groups -> >= 0.99 too, but those sit in DIFFERENT cells and
    are missed by the tier BY DESIGN (the oracle's same-group rule
    encodes exactly that); every other combination -> <= 0.692. No
    pair sits near the 0.9 threshold, so float order can't flip one."""
    import numpy as np

    from big_data_analysis_spark.queries import _sem_stream_vec

    ids = list(range(40)) + [1000 + i for i in range(60)]
    df = spark.createDataFrame(
        [(i,) for i in ids], "vec_id long"
    ).withColumn("embedding", _sem_stream_vec("vec_id"))
    vecs = {r["vec_id"]: np.array(r["embedding"]) for r in df.collect()}

    def kind(i):
        return (i % 4, (i // 4) % 4 == 3)

    lo, hi = 0.0, 1.0
    for i in ids:
        for j in ids:
            if i >= j:
                continue
            a, b = vecs[i], vecs[j]
            c = float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b)))
            both_novel = kind(i)[1] and kind(j)[1]
            if kind(i) == kind(j) or both_novel:
                assert c >= 0.99, (i, j, c)
            else:
                assert c <= 0.692, (i, j, c)


def test_cascade_invariants_on_random_corpus(spark, request):
    """Randomized invariants of the cascade increment that hold for ANY
    corpus, independent of which near-dup tier catches what: (1) every
    shard doc gets exactly ONE verdict and kept <=> tier='kept';
    (2) the exact tier's verdicts equal an independent
    normalized-md5 re-derivation (fp in seed fps, or a smaller shard
    id bearing the same fp); (3) stats match the verdict table;
    (4) survivor flow is structural — the MinHash store indexes
    exactly the exact-survivors, the SimHash store exactly the
    jaccard-survivors, the containment store exactly the
    simhash-survivors. Zipf-ish token draws force ORGANIC duplicates
    and near-duplicates across the seed/shard boundary."""
    import hashlib
    import os
    import random
    import re as _re
    import shutil

    from big_data_analysis_spark.operators import dedup as dd

    rng = random.Random(99991)
    vocab = [f"w{i}" for i in range(25)]

    def doc():
        k = rng.randint(3, 12)
        return " ".join(
            vocab[min(int(rng.expovariate(0.3)), 24)] for _ in range(k)
        )

    seed_rows = [(i, doc()) for i in range(60)]
    shard_rows = [(1000 + i, doc()) for i in range(40)]
    # force cross-boundary exact dups and within-shard dups
    shard_rows += [(2000 + i, seed_rows[i][1]) for i in range(5)]
    shard_rows += [(3000 + i, shard_rows[i][1]) for i in range(5)]

    base = f"/root/repo/.scratch/cascade-prop-{os.getpid()}"
    request.addfinalizer(lambda: shutil.rmtree(base, ignore_errors=True))
    shutil.rmtree(base, ignore_errors=True)
    fp, mh, sh, ct = (os.path.join(base, p) for p in ("fp", "mh", "sh", "ct"))
    seed = spark.createDataFrame(seed_rows, "doc_id long, text string")
    dd.fingerprint_index_save(seed, "text", "doc_id", fp)
    dd.minhash_index_save(seed, "text", "doc_id", mh,
                          num_hashes=64, num_bands=16, shingle_n=3)
    dd.simhash_index_save(seed, "text", "doc_id", sh)
    dd.containment_index_save(seed, "text", "doc_id", ct, n=2, threshold=0.8)

    shard = spark.createDataFrame(shard_rows, "doc_id long, text string")
    verdicts, st = dd.dedup_cascade_increment(
        spark, shard, "text", fp, mh, sh, ct_path=ct, return_stats=True
    )
    got = {r["doc_id"]: (r["tier"], r["kept"]) for r in verdicts.collect()}

    # (1) exactly one verdict per shard doc; kept <=> tier='kept'
    assert set(got) == {i for i, _ in shard_rows}
    assert all(k == (t == "kept") for t, k in got.values())

    # (2) the exact tier vs an independent fp re-derivation
    def norm_fp(text):
        return hashlib.md5(
            _re.sub(r"\s+", " ", text.strip()).lower().encode()
        ).hexdigest()

    seed_fps = {norm_fp(t) for _, t in seed_rows}
    shard_fp = {i: norm_fp(t) for i, t in shard_rows}
    expect_exact = {
        i for i, f in shard_fp.items()
        if f in seed_fps or any(
            j < i and shard_fp[j] == f for j in shard_fp
        )
    }
    assert {i for i, (t, _) in got.items() if t == "exact"} == expect_exact

    # (3) stats match the verdict table
    from collections import Counter
    by_tier = Counter(t for t, _ in got.values())
    assert st["shard_rows"] == len(shard_rows)
    assert st["caught_exact"] == by_tier["exact"]
    assert st["caught_jaccard"] == by_tier["jaccard"]
    assert st["caught_simhash"] == by_tier["simhash"]
    assert st["caught_containment"] == by_tier["containment"]
    assert st["kept"] == by_tier["kept"]

    # (4) survivor flow via the store populations
    def new_ids(load):
        return {r["id"] for r in load.select("id").distinct().collect()
                if r["id"] >= 1000}

    non_exact = set(got) - expect_exact
    assert new_ids(dd.minhash_index_load(spark, mh)[0]) == non_exact
    after_j = {i for i in non_exact if got[i][0] != "jaccard"}
    assert new_ids(dd.simhash_index_load(spark, sh)[0]) == after_j
    after_s = {i for i in after_j if got[i][0] != "simhash"}
    assert new_ids(dd.containment_index_load(spark, ct)[0]) == after_s


@given(
    st.lists(
        st.integers(min_value=-(2 ** 63), max_value=2 ** 63 - 1),
        min_size=1, max_size=15,
    ),
    st.data(),
)
@settings(max_examples=60, deadline=None)
def test_video_majority_fingerprint_invariants(hashes, data):
    """video_fp_bits contract on random frame-hash lists: (1) the
    fingerprint of n copies of one hash is that hash; (2) replacing a
    STRICT MINORITY of frames with arbitrary hashes never changes the
    fingerprint when the remaining majority is unanimous; (3) the
    result is order-invariant (majority is a multiset property)."""
    from big_data_analysis_spark.operators.video import video_fp_bits

    base = hashes[0]
    n = len(hashes)
    assert video_fp_bits([base] * n) == base

    # unanimous majority + arbitrary strict minority -> majority wins
    k_min = (n - 1) // 2  # strict minority size
    minority = hashes[1 : 1 + k_min]
    combined = [base] * (n - len(minority)) + list(minority)
    assert video_fp_bits(combined) == base

    shuffled = list(hashes)
    data.draw(st.randoms(use_true_random=False)).shuffle(shuffled)
    assert video_fp_bits(shuffled) == video_fp_bits(hashes)


@given(
    st.integers(min_value=1, max_value=4),   # n_frames
    st.integers(min_value=2, max_value=12),  # width
    st.integers(min_value=1, max_value=9),   # height
    st.integers(min_value=0, max_value=2 ** 31 - 1),  # pixel seed
)
@settings(max_examples=40, deadline=None)
def test_y4m_roundtrip_on_random_frames(n_frames, w, h, seed):
    """The stdlib y4m parser re-derives EXACTLY the luma matrices the
    synthesizer wrote, for arbitrary geometry and pixel content — the
    decode is a real codec, not a fixture-shaped one."""
    import numpy as np
    import pytest

    from big_data_analysis_spark.operators.video import (
        _y4m_frame_offsets,
        _y4m_luma_frame,
    )

    rng = np.random.default_rng(seed)
    frames = [
        rng.integers(0, 256, size=(h, w), dtype=np.uint8)
        for _ in range(n_frames)
    ]
    payload = b"".join(
        [b"YUV4MPEG2 W%d H%d F30:1 Cmono\n" % (w, h)]
        + [b"FRAME\n" + f.tobytes() for f in frames]
    )
    pw, ph, ysize, offs = _y4m_frame_offsets(payload)
    assert (pw, ph, ysize, len(offs)) == (w, h, w * h, n_frames)
    for off, f in zip(offs, frames):
        assert (_y4m_luma_frame(payload, off, pw, ph) == f).all()
    # truncating the last raster byte must raise, never mis-frame
    with pytest.raises(ValueError):
        _y4m_frame_offsets(payload[:-1])
