"""Data-quality audit operators (operators/dq.py): value correctness
on seeded violations, and the single-scan plan property the 100 TB
design depends on."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from big_data_analysis_spark.io import load_tables
from big_data_analysis_spark.operators import dq
from big_data_analysis_spark.plans import formatted_plan, scan_infos
from big_data_analysis_spark.queries import QUERIES


def test_predicate_audit_counts_seeded_violations(spark):
    df = spark.createDataFrame(
        [(1, 10.0), (2, -3.0), (None, 5.0), (4, -1.0)], "k int, v double"
    )
    out = dq.predicate_audit(
        df, {"null_k": F.col("k").isNull(), "neg_v": F.col("v") < 0}
    )
    got = {r["check_name"]: (r["violations"], r["total"]) for r in out.collect()}
    assert got == {"null_k": (1, 4), "neg_v": (2, 4)}


def test_predicate_audit_is_single_scan(spark, sf_dir):
    """N predicates over one table must fold into ONE table scan — the
    whole point vs. running N separate count queries."""
    li = load_tables(spark, sf_dir, ["lineitem"])["lineitem"]
    out = dq.predicate_audit(
        li,
        {
            "a": F.col("l_quantity") <= 0,
            "b": F.col("l_discount") < 0,
            "c": F.col("l_orderkey").isNull(),
        },
    )
    assert len(scan_infos(out)) == 1, formatted_plan(out)


def test_orphan_count_finds_seeded_orphans(spark):
    child = spark.createDataFrame([(1,), (2,), (9,), (None,)], "fk int")
    parent = spark.createDataFrame([(1,), (2,), (3,)], "pk int")
    row = dq.orphan_count(child, parent, {"fk": "pk"}, "orphans").collect()[0]
    # 9 has no parent; NULL FK also counts as unresolvable.
    assert (row["check_name"], row["violations"], row["total"]) == ("orphans", 2, 4)


def test_duplicate_key_count_surplus_rows(spark):
    df = spark.createDataFrame([(1,), (1,), (1,), (2,), (3,), (3,)], "k int")
    row = dq.duplicate_key_count(df, ["k"], "dups").collect()[0]
    # dedup would remove 3 rows (two extra 1s, one extra 3).
    assert (row["violations"], row["total"]) == (3, 6)


def test_dq_audit_query_shape_and_clean_tables(spark, sf_dir):
    rows = QUERIES["dq_audit"](spark, sf_dir).collect()
    got = {r["check_name"]: r for r in rows}
    assert len(got) == 8
    # Synthetic TPC-H data is referentially clean...
    assert got["lineitem_orphan_orderkey"]["violations"] == 0
    assert got["orders_dup_orderkey"]["violations"] == 0
    # ...but account balances do go negative, so the audit is not
    # trivially all-zero.
    assert got["customer_negative_acctbal"]["violations"] > 0
    for r in rows:
        assert r["total"] > 0


def test_multijoin_classics_push_filters_to_scans(spark, sf_dir):
    """shipping_priority: the segment, order-date, and ship-date
    filters must each reach their parquet scan."""
    df = QUERIES["shipping_priority"](spark, sf_dir)
    pushed = [f for s in scan_infos(df) for f in (s["pushed_filters"] or [])]
    for col in ("c_mktsegment", "o_orderdate", "l_shipdate"):
        assert any(col in f for f in pushed), (col, pushed)


def test_psi_zero_for_identical_and_positive_for_shift(spark):
    """PSI sanity: a distribution compared against itself scores ~0;
    a mean-shifted distribution scores well past the 0.2 action
    threshold."""
    from big_data_analysis_spark.operators.dq import psi_numeric

    base = spark.range(2000).select((F.col("id") % 100).cast("double").alias("v"))
    same = psi_numeric(base, base, "v").head()
    assert abs(same["psi"]) < 1e-9
    assert same["n_ref"] == same["n_cur"] == 2000

    shifted = spark.range(2000).select(
        ((F.col("id") % 100) + 60).cast("double").alias("v")
    )
    drift = psi_numeric(base, shifted, "v").head()
    assert drift["psi"] > 0.2


def test_psi_ignores_nulls_and_handles_empty_bins(spark):
    """NULLs are excluded from both sides; a current side entirely
    outside the reference range lands in the edge bins and stays
    finite (floor guards the log)."""
    from big_data_analysis_spark.operators.dq import psi_numeric

    ref = spark.createDataFrame(
        [(float(i),) for i in range(100)] + [(None,)] * 10, "v double"
    )
    cur = spark.createDataFrame([(1000.0,)] * 50 + [(None,)] * 5, "v double")
    out = psi_numeric(ref, cur, "v").head()
    assert out["n_ref"] == 100 and out["n_cur"] == 50
    import math

    assert math.isfinite(out["psi"]) and out["psi"] > 1.0


def test_quantile_edges_empty_reference_fails_loudly(spark):
    """A drift monitor pointed at an empty/all-NULL reference window
    must say so, not die with an opaque TypeError mid-plan."""
    import pytest

    from big_data_analysis_spark.operators.dq import psi_numeric

    empty_ref = spark.createDataFrame([(None,)] * 5, "v double")
    cur = spark.createDataFrame([(1.0,)], "v double")
    with pytest.raises(ValueError, match="no non-NULL rows"):
        psi_numeric(empty_ref, cur, "v")


def test_jsd_bounds_and_symmetry(spark):
    """JSD(base 2) is 0 for identical mixes, 1 for disjoint ones, and
    symmetric in its arguments."""
    from big_data_analysis_spark.operators.dq import js_divergence

    a = spark.createDataFrame([("x",)] * 30 + [("y",)] * 70, "c string")
    b = spark.createDataFrame([("z",)] * 10 + [("w",)] * 40, "c string")
    assert abs(js_divergence(a, a, "c").head()["jsd"]) < 1e-9
    disjoint = js_divergence(a, b, "c").head()
    assert abs(disjoint["jsd"] - 1.0) < 1e-9
    assert disjoint["n_categories"] == 4
    ab = js_divergence(a, b, "c").head()["jsd"]
    ba = js_divergence(b, a, "c").head()["jsd"]
    assert abs(ab - ba) < 1e-12


def test_merge_quantile_state_fold_equals_full_and_order_invariant(spark):
    """Folding deltas in ANY order yields the byte-identical bin-count
    state, and the folded state equals a one-shot full recompute —
    the exactness property that makes the state safe to maintain
    incrementally forever (no sketch drift)."""
    import itertools

    edges = [10.0, 20.0, 30.0]
    rows = [("a", float(v)) for v in range(1, 41)] + [("b", float(v * 3)) for v in range(1, 15)]
    df = spark.createDataFrame(rows, "k string, v double")
    deltas = [df.filter(F.pmod(F.xxhash64("v"), F.lit(3)) == i) for i in range(3)]
    full = dq.merge_quantile_state(df, None, ["k"], "v", edges)
    expect = sorted(tuple(r) for r in full.collect())
    for perm in itertools.permutations(range(3)):
        st = None
        for i in perm:
            st = dq.merge_quantile_state(deltas[i], st, ["k"], "v", edges)
        got = sorted(tuple(r) for r in st.collect())
        assert got == expect, f"fold order {perm} diverged"


def test_merge_quantile_state_nulls_get_a_null_bin_row(spark):
    """NULL values are accounted in a NULL-bin row (profiling needs the
    null count), and the reader skips it."""
    edges = [10.0, 20.0]
    df = spark.createDataFrame(
        [("a", 5.0), ("a", None), ("a", None), ("a", 15.0)], "k string, v double"
    )
    st = dq.merge_quantile_state(df, None, ["k"], "v", edges)
    by_bin = {r["bin"]: r["n"] for r in st.collect()}
    assert by_bin[None] == 2 and by_bin[0] == 1 and by_bin[1] == 1
    est = dq.quantile_from_state(st, ["k"], 0.5, edges).head()
    assert est["n_total"] == 2  # nulls excluded from the rank walk


def test_quantile_from_state_within_one_bin_width(spark):
    """The histogram estimate lands within one bin width of the exact
    percentile, per key — the resolution contract the edges define."""
    edges = [float(e) for e in range(10, 200, 10)]
    rows = [("a", float(v % 173)) for v in range(1, 1001)] + [
        ("b", float((v * 7) % 97)) for v in range(1, 501)
    ]
    df = spark.createDataFrame(rows, "k string, v double")
    st = dq.merge_quantile_state(df, None, ["k"], "v", edges)
    for q in (0.1, 0.5, 0.9):
        est = {r["k"]: r["q_est"] for r in dq.quantile_from_state(st, ["k"], q, edges).collect()}
        exact = {
            r["k"]: r["e"]
            for r in df.groupBy("k").agg(F.expr(f"percentile(v, {q})").alias("e")).collect()
        }
        for k in exact:
            assert abs(est[k] - exact[k]) <= 10.0 + 1e-9, (k, q, est[k], exact[k])


def test_quantile_from_state_rank_is_float_safe(spark):
    """ceil(q*n) must not overshoot when the double product lands a
    hair above an exact integer (0.035*200 = 7.000000000000001 in
    IEEE): rank 7 selects bin 0 (counts 10 per bin), not bin 1."""
    edges = [float(e) for e in range(10, 200, 10)]
    rows = [("a", float(v)) for v in range(1, 201)]  # 10 values per bin
    df = spark.createDataFrame(rows, "k string, v double")
    st = dq.merge_quantile_state(df, None, ["k"], "v", edges)
    est = dq.quantile_from_state(st, ["k"], 0.035, edges).head()
    # rank 7 of 200 is value 7.0 -> first bin (<=10); an off-by-one
    # rank of 8 stays in bin 0 too, so pin the interpolation value:
    # frac = 7/10 within [10-wide clamp-lo bin 0 -> lo=hi=10]... use a
    # key with distinct lo/hi: rank 7 in bin 0 has lo=hi=10 (clamped
    # end bin), est must be exactly 10.0 either way -- instead assert
    # via the unclamped q=0.105 (rank 21, bin 2: lo=20, hi=30, 21st
    # value is cum 20+1 -> frac 1/10 -> 21.0).
    est2 = dq.quantile_from_state(st, ["k"], 0.105, edges).head()
    assert abs(est2["q_est"] - 21.0) < 1e-9, est2["q_est"]


# ---------------------------------------------------------------------------
# verify_constraints — the declarative Deequ-style suite
# ---------------------------------------------------------------------------


def test_verify_constraints_verdicts(spark):
    df = spark.createDataFrame(
        [(1, "O", 10.0), (2, "F", 20.0), (3, "O", None), (3, "X", 5.0)],
        "k long, st string, price double",
    )
    rep = {
        r["name"]: r
        for r in dq.verify_constraints(df, [
            {"kind": "completeness", "col": "price", "min_ratio": 0.9},
            {"kind": "completeness", "col": "st", "min_ratio": 1.0},
            {"kind": "unique", "cols": ["k"]},
            {"kind": "min", "col": "price", "bound": 0.0},
            {"kind": "max", "col": "price", "bound": 15.0},
            {"kind": "in_set", "col": "st", "allowed": ["O", "F"], "min_ratio": 1.0},
            {"kind": "pattern", "col": "st", "regex": "^[A-Z]$", "min_ratio": 1.0},
            {"kind": "row_count_min", "threshold": 3},
            {"name": "my_check", "kind": "row_count_min", "threshold": 100},
        ]).collect()
    }
    assert rep["completeness:price"]["observed"] == 0.75
    assert not rep["completeness:price"]["passed"]
    assert rep["completeness:st"]["passed"]
    assert rep["unique:k"]["observed"] == 0.75 and not rep["unique:k"]["passed"]
    assert rep["min:price"]["observed"] == 5.0 and rep["min:price"]["passed"]
    assert rep["max:price"]["observed"] == 20.0 and not rep["max:price"]["passed"]
    assert rep["in_set:st"]["observed"] == 0.75 and not rep["in_set:st"]["passed"]
    assert rep["pattern:st"]["passed"]
    assert rep["row_count_min"]["observed"] == 4.0 and rep["row_count_min"]["passed"]
    # explicit names override the default and set thresholds apart
    assert "my_check" in rep and not rep["my_check"]["passed"]


def test_verify_constraints_unique_excludes_null_keys(spark):
    """'unique' ratio is distinct keys over NON-NULL-keyed rows:
    count_distinct skips NULL keys, so a NULL-inclusive denominator
    would deflate the ratio (3 distinct / 5 rows = 0.6) and make
    all-NULL keys read as duplicates. Here the 3 non-null keys are all
    distinct -> observed 1.0 regardless of the 2 NULL rows; an all-NULL
    key column has no keys to check -> observed NULL, passed False."""
    df = spark.createDataFrame(
        [(1,), (2,), (3,), (None,), (None,)], "k long"
    )
    r = dq.verify_constraints(df, [{"kind": "unique", "cols": ["k"]}]).head()
    assert r["observed"] == 1.0 and r["passed"] is True

    dup = spark.createDataFrame([(1,), (1,), (2,), (None,)], "k long")
    r = dq.verify_constraints(dup, [{"kind": "unique", "cols": ["k"]}]).head()
    assert abs(r["observed"] - 2 / 3) < 1e-12 and r["passed"] is False

    all_null = spark.createDataFrame([(None,), (None,)], "k long")
    r = dq.verify_constraints(
        all_null, [{"kind": "unique", "cols": ["k"]}]
    ).head()
    assert r["observed"] is None and r["passed"] is False

    # composite keys: a NULL in ANY listed column excludes the row
    comp = spark.createDataFrame(
        [(1, "a"), (1, "b"), (1, None)], "k long, s string"
    )
    r = dq.verify_constraints(
        comp, [{"kind": "unique", "cols": ["k", "s"]}]
    ).head()
    assert r["observed"] == 1.0 and r["passed"] is True


def test_verify_constraints_pattern_is_full_match(spark):
    """A format gate must not admit a value that merely CONTAINS a
    matching substring: 'xxABC-1234yy' is NOT a valid SKU under
    '[A-Z]{3}-[0-9]{4}' even though rlike would find the substring."""
    df = spark.createDataFrame(
        [("ABC-1234",), ("xxABC-1234yy",), ("nomatch",)], "sku string"
    )
    r = dq.verify_constraints(df, [
        {"kind": "pattern", "col": "sku", "regex": "[A-Z]{3}-[0-9]{4}",
         "min_ratio": 0.5},
    ]).head()
    assert abs(r["observed"] - 1 / 3) < 1e-9
    assert r["passed"] is False


def test_verify_constraints_empty_table_and_validation(spark):
    empty = spark.createDataFrame([], "k long, st string")
    rep = {
        r["name"]: r
        for r in dq.verify_constraints(empty, [
            {"kind": "completeness", "col": "st", "min_ratio": 1.0},
            {"kind": "row_count_min", "threshold": 1},
        ]).collect()
    }
    # ratio metrics are NULL on an empty table and the verdict is a
    # definite False — never a divide-by-zero (ANSI mode is ON)
    assert rep["completeness:st"]["observed"] is None
    assert rep["completeness:st"]["passed"] is False
    assert rep["row_count_min"]["observed"] == 0.0
    assert rep["row_count_min"]["passed"] is False
    with pytest.raises(ValueError, match="empty constraint"):
        dq.verify_constraints(empty, [])
    with pytest.raises(ValueError, match="unknown kind"):
        dq.verify_constraints(empty, [{"kind": "nope"}])


def test_verify_constraints_is_one_scan(spark):
    """The whole suite must compile into a single aggregate over one
    scan — one report row per constraint, computed without
    per-constraint jobs."""
    df = spark.createDataFrame([(1, 2.0)], "k long, x double")
    rep = dq.verify_constraints(df, [
        {"kind": "completeness", "col": "x", "min_ratio": 1.0},
        {"kind": "min", "col": "x", "bound": 0.0},
        {"kind": "max", "col": "x", "bound": 10.0},
        {"kind": "row_count_min", "threshold": 1},
    ])
    plan = rep._jdf.queryExecution().executedPlan().toString()
    # a single aggregate chain: no join, no union of per-check subplans
    assert "Join" not in plan and "Union" not in plan
    assert rep.count() == 4


def test_k_anonymity_report_counts_and_verdict(spark):
    # groups: (a,1)x3, (a,2)x1, (b,1)x2 -> k=3: 2 groups below, 3 rows at risk
    rows = [("a", 1), ("a", 1), ("a", 1), ("a", 2), ("b", 1), ("b", 1)]
    df = spark.createDataFrame(rows, "q1 string, q2 int")
    r = dq.k_anonymity_report(df, ["q1", "q2"], k=3).head()
    assert r["n_rows"] == 6 and r["n_groups"] == 3
    assert r["groups_below_k"] == 2 and r["rows_at_risk"] == 3
    assert r["min_group_size"] == 1 and r["passed"] is False
    ok = dq.k_anonymity_report(df, ["q1"], k=2).head()  # a:4, b:2
    assert ok["passed"] is True and ok["min_group_size"] == 2


def test_k_anonymity_null_tuple_is_a_group_and_validation(spark):
    # NULL quasi-identifier values form their own (linkable) group
    rows = [(None, 1), (None, 1), ("x", 1)]
    df = spark.createDataFrame(rows, "q1 string, q2 int")
    r = dq.k_anonymity_report(df, ["q1", "q2"], k=2).head()
    assert r["n_groups"] == 2 and r["groups_below_k"] == 1 and r["rows_at_risk"] == 1
    with pytest.raises(ValueError, match="k must be"):
        dq.k_anonymity_report(df, ["q1"], k=1)
    with pytest.raises(ValueError, match="non-empty"):
        dq.k_anonymity_report(df, [], k=2)
    # empty table: definite False verdict and zero counts, never NULLs
    # leaking into a gate that checks `passed is False`
    empty = spark.createDataFrame([], "q1 string, q2 int")
    e = dq.k_anonymity_report(empty, ["q1", "q2"], k=2).head()
    assert e["n_rows"] == 0 and e["n_groups"] == 0
    assert e["groups_below_k"] == 0 and e["rows_at_risk"] == 0
    assert e["min_group_size"] is None and e["passed"] is False


# ---------------------------------------------------------------------------
# ks_statistic
# ---------------------------------------------------------------------------


def _manual_ks(rows):
    import bisect

    a = sorted(x for x, s in rows if s)
    b = sorted(x for x, s in rows if not s)
    vals = sorted(set(a + b))
    return max(
        abs(bisect.bisect_right(a, v) / len(a) - bisect.bisect_right(b, v) / len(b))
        for v in vals
    )


def test_ks_statistic_matches_manual_and_bin_invariant(spark):
    """Exactness contract: n_bins is a PARALLELISM knob, never part of
    the answer — every bin count must give the identical statistic,
    equal to the definitional python computation."""
    import random

    rng = random.Random(3)
    rows = [(rng.gauss(0, 1), True) for _ in range(300)] + [
        (rng.gauss(0.8, 1), False) for _ in range(250)
    ]
    df = spark.createDataFrame(rows, "x double, side boolean")
    want = _manual_ks(rows)
    got = {}
    for nb in (2, 16, 64):
        r = dq.ks_statistic(df, "x", "side", n_bins=nb).head()
        got[nb] = r["ks_stat"]
        assert r["n_a"] == 300 and r["n_b"] == 250
    assert all(abs(v - want) < 1e-12 for v in got.values()), (got, want)


def test_ks_statistic_identical_samples_and_ties(spark):
    # the same discrete distribution on both sides -> D == 0 exactly
    rows = [(v, s) for v in (1, 1, 2, 3, 3, 3) for s in (True, False)]
    df = spark.createDataFrame(rows, "x int, side boolean")
    r = dq.ks_statistic(df, "x", "side", n_bins=4).head()
    assert r["ks_stat"] == 0.0
    # one side empty -> loud error
    import pytest as _pytest

    one = spark.createDataFrame([(1.0, True)], "x double, side boolean")
    with _pytest.raises(ValueError, match="both sides"):
        dq.ks_statistic(one, "x", "side")


def test_ks_statistic_null_side_and_empty_input_fail_loudly(spark):
    ns = spark.createDataFrame(
        [(1.0, True), (2.0, None), (3.0, False)], "x double, side boolean"
    )
    with pytest.raises(Exception, match="unlabeled"):
        dq.ks_statistic(ns, "x", "side").collect()
    empty = spark.createDataFrame([], "x double, side boolean")
    with pytest.raises(ValueError, match="no non-NULL values"):
        dq.ks_statistic(empty, "x", "side")


# ---------------------------------------------------------------------------
# benford_test
# ---------------------------------------------------------------------------


def test_benford_conformant_vs_uniform_and_exclusions(spark):
    """Log-uniform data IS Benford (chi2 small, ~8 dof); uniform [1,10)
    is not (chi2 explodes). Zero/negative/NULL values are excluded and
    all nine digit rows are present even at zero count."""
    import math
    import random

    rng = random.Random(7)
    conforming = spark.createDataFrame(
        [(math.exp(rng.uniform(0, 14)),) for _ in range(20000)], "x double"
    )
    r1 = dq.benford_test(conforming, "x").collect()
    assert sorted(r["digit"] for r in r1) == list(range(1, 10))
    assert r1[0]["chi2"] < 30  # ~chi2_{8}; conformant data stays low
    uniform = spark.createDataFrame(
        [(rng.uniform(1, 10),) for _ in range(20000)], "x double"
    )
    assert dq.benford_test(uniform, "x").head()["chi2"] > 1000
    mix = spark.createDataFrame(
        [(0.0,), (-5.0,), (None,), (0.042,), (7.0,), (123.0,), (9999.0,)],
        "x double",
    )
    rows = {r["digit"]: r["n"] for r in dq.benford_test(mix, "x").collect()}
    assert rows == {1: 1, 2: 0, 3: 0, 4: 1, 5: 0, 6: 0, 7: 1, 8: 0, 9: 1}


def test_benford_first_digit_from_string_is_exact_at_boundaries(spark):
    """Power-of-10 boundaries are exactly where a log10-based digit
    flips on a one-ulp libm difference — the string derivation must
    digit them exactly."""
    vals = [1.0, 10.0, 100.0, 1e6, 1e-6, 9.999999, 0.1, 0.001]
    df = spark.createDataFrame([(v,) for v in vals], "x double")
    rows = {r["digit"]: r["n"] for r in dq.benford_test(df, "x").collect()}
    assert rows[1] == 7 and rows[9] == 1


def test_benford_decimal_boundary_and_empty_batch(spark):
    """The digit must come from the RAW value's string: a
    decimal(38,20) just below 1 is digit 9, though its double
    round-trips to 1.0. And a batch with zero auditable values must
    raise, never read as conformant through a NULL chi2."""
    from decimal import Decimal

    d = spark.createDataFrame(
        [(Decimal("0.99999999999999999999"),), (Decimal("123.45"),)],
        "x decimal(38,20)",
    )
    rows = {r["digit"]: r["n"] for r in dq.benford_test(d, "x").collect()}
    assert rows[9] == 1 and rows[1] == 1
    nothing = spark.createDataFrame([(0.0,), (-1.0,), (None,)], "x double")
    with pytest.raises(Exception, match="nothing to audit"):
        dq.benford_test(nothing, "x").collect()
