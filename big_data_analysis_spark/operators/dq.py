"""Data-quality audit operators: the constraint checks a production
ingest runs before trusting a batch (referential integrity, key
uniqueness, null/domain rules).

Scale design: every audit primitive is ONE scan of the audited table.
``predicate_audit`` folds any number of named predicates into a single
aggregate (same one-pass trick as the per-column null counts, SURVEY
D4) and unpivots with ``stack``; ``orphan_count`` is a left join
against the parent's distinct keys (map-side combinable, no second
child scan); ``duplicate_key_count`` is one groupBy. All return the
same long-form schema ``(check_name, violations, total)`` so
``audit_union`` can stack them into a single report DataFrame — the
whole audit stays one lazy DAG.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def predicate_audit(df: DataFrame, checks: dict[str, Column]) -> DataFrame:
    """Count rows violating each named predicate in ONE scan.

    ``checks`` maps check_name -> boolean Column that is true when the
    row VIOLATES the rule. Returns long-form (check_name, violations,
    total) with one row per check; ``total`` is the table row count so
    a downstream consumer can compute violation rates.
    """
    aggs = [
        F.sum(F.when(cond, F.lit(1)).otherwise(F.lit(0))).cast("long").alias(name)
        for name, cond in checks.items()
    ]
    one_row = df.agg(*aggs, F.count(F.lit(1)).cast("long").alias("__total"))
    pairs = ", ".join(f"'{name}', `{name}`" for name in checks)
    return one_row.selectExpr(
        f"stack({len(checks)}, {pairs}) AS (check_name, violations)",
        "__total AS total",
    ).select("check_name", "violations", "total")


def orphan_count(
    child: DataFrame, parent: DataFrame, on: dict[str, str], check_name: str
) -> DataFrame:
    """Referential-integrity check: child rows whose FK has no match in
    the parent. ``on`` maps child FK column -> parent PK column.

    One scan of each side: the parent is reduced to distinct keys
    (partial-aggregated map-side) and left-joined; a missing hit marks
    an orphan. Counting via the join rather than an anti-join + second
    total scan keeps it single-pass over the child.
    """
    keys = (
        parent.select(*[F.col(pk).alias(fk) for fk, pk in on.items()])
        .distinct()
        .withColumn("__hit", F.lit(1))
    )
    fks = list(on)
    joined = child.select(*fks).join(keys, fks, "left")
    return joined.agg(
        F.lit(check_name).alias("check_name"),
        F.sum(F.when(F.col("__hit").isNull(), 1).otherwise(0)).cast("long").alias("violations"),
        F.count(F.lit(1)).cast("long").alias("total"),
    )


def duplicate_key_count(
    df: DataFrame, keys: list[str], check_name: str
) -> DataFrame:
    """Primary-key uniqueness check: ``violations`` = number of SURPLUS
    rows (sum of count-1 over duplicated key groups, i.e. how many rows
    a dedup would remove), ``total`` = table row count. One groupBy on
    the key (map-side combined)."""
    per_key = df.groupBy(*keys).agg(F.count(F.lit(1)).alias("__cnt"))
    return per_key.agg(
        F.lit(check_name).alias("check_name"),
        F.sum(F.col("__cnt") - F.lit(1)).cast("long").alias("violations"),
        F.sum("__cnt").cast("long").alias("total"),
    )


def audit_union(reports: list[DataFrame]) -> DataFrame:
    """Stack audit reports into one (check_name, violations, total)
    DataFrame — the batch-admission report a pipeline gates on."""
    out = reports[0]
    for r in reports[1:]:
        out = out.unionByName(r)
    return out


def quantile_edges(ref: DataFrame, col: str, n_bins: int = 10) -> list[float]:
    """Interior quantile boundaries of ``ref[col]`` (n_bins-1 exact
    percentiles) from ONE 1-row aggregate — the broadcast-boundaries
    discipline: never a global sort/ntile. Duplicate edges (heavy
    ties) are collapsed so every resulting bin has reference mass.
    The fixed-size list is driver state by design (like a bloom
    filter's bit array): it parameterizes pure comparison expressions
    downstream."""
    qs = [i / n_bins for i in range(1, n_bins)]
    edges = ref.filter(F.col(col).isNotNull()).agg(
        F.percentile(F.col(col), F.lit(qs)).alias("edges")
    ).head()["edges"]
    if edges is None:
        raise ValueError(
            f"quantile_edges: reference column {col!r} has no non-NULL rows "
            "— cannot derive bin boundaries from an empty reference window"
        )
    uniq: list[float] = []
    for e in edges:
        if not uniq or e > uniq[-1]:
            uniq.append(float(e))
    return uniq


def bin_by_edges(c: Column, edges: list[float]) -> Column:
    """Right-closed bin id for ``c`` against sorted ``edges``: bin k
    <=> edges[k-1] < x <= edges[k] (pandas.qcut convention); values
    below/above the range fold into the end bins; NULL input yields a
    NULL bin (it must not silently land in the top bin — every when()
    condition is NULL for a NULL input, so without the explicit guard
    the final otherwise() would fire). Pure comparison CASE — codegen,
    streamable, re-derivable on any engine."""
    out = F.lit(len(edges))
    for k in range(len(edges) - 1, -1, -1):
        out = F.when(c <= F.lit(edges[k]), F.lit(k)).otherwise(out)
    return F.when(c.isNull(), F.lit(None)).otherwise(out).cast("long")


def psi_numeric(
    ref: DataFrame,
    cur: DataFrame,
    col: str,
    n_bins: int = 10,
    floor: float = 1e-6,
) -> DataFrame:
    """Population Stability Index of ``cur[col]`` against ``ref[col]``
    — the standard drift monitor a feature store runs between a
    training snapshot and live traffic (PSI > 0.2 ≈ action threshold).

    Scale shape: bin edges are the reference's exact interior
    percentiles computed in ONE 1-row aggregate (never a global
    sort/ntile — the same broadcast-boundaries discipline as
    quantile_bins); both sides are then binned by pure comparison
    arithmetic and counted with a map-side-combinable groupBy, so the
    whole check is one scan per side regardless of table size. Bins
    that lost all current-side mass are floored at ``floor`` before the
    log so the index stays finite (mirrorable in any engine; the
    reference side cannot be empty by construction of its own
    quantiles, but is floored identically for symmetry).

    Returns one row: (psi, n_ref, n_cur). Rows with NULL ``col`` are
    excluded from both sides.
    """
    uniq = quantile_edges(ref, col, n_bins)

    def side_counts(df: DataFrame, name: str) -> DataFrame:
        return (
            df.filter(F.col(col).isNotNull())
            .groupBy(bin_by_edges(F.col(col), uniq).alias("bin"))
            .agg(F.count(F.lit(1)).alias(name))
        )

    r = side_counts(ref, "n_ref")
    c = side_counts(cur, "n_cur")
    per_bin = r.join(c, "bin", "full").select(
        F.coalesce("n_ref", F.lit(0)).alias("n_ref"),
        F.coalesce("n_cur", F.lit(0)).alias("n_cur"),
    )
    tot = per_bin.agg(
        F.sum("n_ref").alias("t_ref"), F.sum("n_cur").alias("t_cur")
    )
    return (
        per_bin.crossJoin(F.broadcast(tot))
        .select(
            (
                (F.greatest(F.col("n_cur") / F.col("t_cur"), F.lit(floor))
                 - F.greatest(F.col("n_ref") / F.col("t_ref"), F.lit(floor)))
                * F.log(
                    F.greatest(F.col("n_cur") / F.col("t_cur"), F.lit(floor))
                    / F.greatest(F.col("n_ref") / F.col("t_ref"), F.lit(floor))
                )
            ).alias("term"),
            "t_ref",
            "t_cur",
        )
        .agg(
            F.round(F.sum("term"), 6).alias("psi"),
            F.max("t_ref").cast("long").alias("n_ref"),
            F.max("t_cur").cast("long").alias("n_cur"),
        )
    )


def js_divergence(
    ref: DataFrame, cur: DataFrame, col: str
) -> DataFrame:
    """Jensen-Shannon divergence (base-2, so bounded in [0, 1]) between
    the categorical distributions of ``ref[col]`` and ``cur[col]`` —
    the symmetric, zero-safe drift measure for label / category mix
    shift (0*log(0/m) contributes 0, so disjoint categories are fine
    without smoothing, unlike KL).

    One map-side-combined groupBy per side, full-outer join on the
    category (NULL is a category via a sentinel coalesce), 1-row
    aggregate out. Returns (jsd, n_categories).
    """
    def side(df: DataFrame, name: str) -> DataFrame:
        return df.groupBy(
            F.coalesce(F.col(col).cast("string"), F.lit("__null__")).alias("cat")
        ).agg(F.count(F.lit(1)).alias(name))

    per_cat = side(ref, "n_ref").join(side(cur, "n_cur"), "cat", "full").select(
        "cat",
        F.coalesce("n_ref", F.lit(0)).alias("n_ref"),
        F.coalesce("n_cur", F.lit(0)).alias("n_cur"),
    )
    tot = per_cat.agg(F.sum("n_ref").alias("t_ref"), F.sum("n_cur").alias("t_cur"))
    p = F.col("n_ref") / F.col("t_ref")
    q = F.col("n_cur") / F.col("t_cur")
    m = (p + q) / F.lit(2.0)
    term = (
        F.when(F.col("n_ref") > 0, p * F.log2(p / m)).otherwise(F.lit(0.0))
        + F.when(F.col("n_cur") > 0, q * F.log2(q / m)).otherwise(F.lit(0.0))
    ) / F.lit(2.0)
    return (
        per_cat.crossJoin(F.broadcast(tot))
        .agg(
            F.round(F.sum(term), 6).alias("jsd"),
            F.count(F.lit(1)).cast("long").alias("n_categories"),
        )
    )


def merge_quantile_state(
    delta: DataFrame,
    state: DataFrame | None,
    keys: "Sequence[str]",
    value_col: str,
    edges: list[float],
    bin_col: str = "bin",
    count_col: str = "n",
) -> DataFrame:
    """Incremental QUANTILE maintenance — the profiling sibling of
    relational.merge_aggregate_state (sums/min/max) and
    merge_distinct_state (HLL distinct): exact quantiles are not
    mergeable, but FIXED-EDGE histogram counts are (counts add), and a
    histogram bounds any quantile to one bin. Per key the state is the
    long-form (keys..., bin, n) bin-count table against ``edges``
    (right-closed bin_by_edges semantics, same contract as the PSI
    monitor); folding a delta is bin + one keyed re-aggregate, so ANY
    fold order yields the byte-identical state (asserted in tests) and
    the folded state equals a full recompute EXACTLY — integers, no
    sketch error. NULL values keep a NULL-bin row (null accounting is
    part of profiling); quantile_from_state skips it.

    Scale shape: the delta aggregates first (map-side combine on the
    new data only), then one keyed union+re-aggregate with the state —
    O(|delta| + |state|), independent of raw history size; state size
    is |keys| x (len(edges)+2) rows regardless of data volume. The
    ``edges`` must be the same list every cycle (derive once from the
    reference window with quantile_edges); changing edges means a
    rebuild, exactly like re-binning a PSI reference.
    """
    ks = list(keys)
    binned = delta.select(
        *ks, bin_by_edges(F.col(value_col), edges).alias(bin_col)
    )
    d = binned.groupBy(*ks, bin_col).agg(
        F.count(F.lit(1)).cast("long").alias(count_col)
    )
    if state is None:
        return d
    merged = state.select(d.columns).unionByName(d)
    return merged.groupBy(*ks, bin_col).agg(
        F.sum(count_col).cast("long").alias(count_col)
    )


def quantile_from_state(
    state: DataFrame,
    keys: "Sequence[str]",
    q: float,
    edges: list[float],
    bin_col: str = "bin",
    count_col: str = "n",
    out_col: str = "q_est",
) -> DataFrame:
    """Read an estimated quantile off a merge_quantile_state histogram:
    per key, walk the cumulative bin counts to the bin containing rank
    ceil(q * n) and linearly interpolate inside its edge interval. The
    bin identification is EXACT (counts are exact), so the estimate is
    off by at most that bin's width — the caller chose the resolution
    when it chose ``edges``. The two open end bins clamp to the nearest
    edge (a quantile landing there is a sign the edges no longer cover
    the data — widen them next rebuild).

    Scale shape: runs on the state table (|keys| x bins rows), never on
    raw data; the rank walk is a window over <= len(edges)+2 rows per
    key. Returns (keys..., n_total, out_col).
    """
    from pyspark.sql import Window

    ks = list(keys)
    nb = len(edges)
    # bin k covers (edges[k-1], edges[k]]; end bins clamp to the edge.
    lo = F.array([F.lit(float(edges[max(k - 1, 0)])) for k in range(nb + 1)])
    hi = F.array([F.lit(float(edges[min(k, nb - 1)])) for k in range(nb + 1)])
    s = state.filter(F.col(bin_col).isNotNull())
    w_cum = Window.partitionBy(*ks).orderBy(bin_col)
    w_all = Window.partitionBy(*ks)
    c = (
        s.withColumn("__cum", F.sum(count_col).over(w_cum))
        .withColumn("__tot", F.sum(count_col).over(w_all))
        .withColumn(
            "__rank",
            # q*n computed in doubles can land a hair ABOVE an exact
            # integer (0.035*200 -> 7.000000000000001), and a raw ceil
            # then overshoots the documented rank by one. Snap the
            # product to 6 decimals first: q is treated at 6-decimal
            # precision (any such q times an integer n has fractional
            # part 0 or >= 1e-6, so the snap never crosses a true
            # boundary).
            F.greatest(
                F.lit(1),
                F.ceil(F.round(F.lit(float(q)) * F.col("__tot"), 6)),
            ),
        )
    )
    first_hit = (
        c.filter(F.col("__cum") >= F.col("__rank"))
        .withColumn(
            "__rn", F.row_number().over(Window.partitionBy(*ks).orderBy(bin_col))
        )
        .filter(F.col("__rn") == 1)
    )
    b_lo = F.element_at(lo, F.col(bin_col).cast("int") + 1)
    b_hi = F.element_at(hi, F.col(bin_col).cast("int") + 1)
    frac = (F.col("__rank") - (F.col("__cum") - F.col(count_col))) / F.col(
        count_col
    )
    return first_hit.select(
        *ks,
        F.col("__tot").alias("n_total"),
        (b_lo + frac * (b_hi - b_lo)).alias(out_col),
    )


def verify_constraints(df: DataFrame, constraints: list[dict]) -> DataFrame:
    """Declarative constraint suite with verdicts — the Deequ-style
    "unit tests for data" layer on top of the counting primitives
    above: each spec states an expectation and a threshold, the report
    states the OBSERVED metric and a passed boolean, so a pipeline
    gates on ``passed`` without re-deriving metrics. Kinds:

    - ``completeness``: {col, min_ratio} — non-null fraction >= ratio
    - ``unique``: {cols, [min_ratio=1.0]} — distinct keys / rows with NO
      NULL in ``cols`` >= ratio. NULL-keyed rows are excluded from BOTH
      sides (count_distinct already skips them; a NULL-inclusive
      denominator would deflate the ratio and make N all-NULL keys look
      like real duplicates — Deequ calls the NULL-inclusive variant
      "distinctness", a different metric). Gate NULL keys separately
      with a ``completeness`` constraint on the same column; a table
      whose listed columns are ALL NULL has no keys to check and fails
      conservatively (observed NULL -> passed false)
    - ``min`` / ``max``: {col, bound} — min(col) >= / max(col) <= bound
    - ``in_set``: {col, allowed, min_ratio} — fraction of rows whose
      value is in ``allowed`` (NULLs count as misses)
    - ``pattern``: {col, regex, min_ratio} — fraction of rows non-null
      AND FULLY matching the Java regex (the regex is anchored as
      ^(?:regex)$ internally — a format gate must not admit a value
      that merely CONTAINS a matching substring; write '[A-Z]+-.*' if
      prefix-match is the intent)
    - ``row_count_min``: {threshold} — table row count >= threshold

    Every constraint may carry an explicit ``name`` (defaults to
    kind:col). Returns one row per constraint:
    (name, kind, column, observed double, threshold double,
    passed boolean).

    Scale shape: the WHOLE suite compiles into ONE aggregate over ONE
    scan (conditional sums share the pass; ``unique`` adds
    count_distinct, which Spark executes with partial aggregation in
    the same job) and the report rows come from exploding an
    array-of-structs over that 1-row frame — no per-constraint jobs,
    no driver loop over data. On an empty table ratio metrics are NULL
    and ``passed`` is false (coalesced), never a divide-by-zero."""
    if not constraints:
        raise ValueError("verify_constraints: empty constraint list")
    aggs = [F.count(F.lit(1)).cast("long").alias("__n")]
    meta = []  # (name, kind, column, threshold, metric_alias, direction)
    for i, spec in enumerate(constraints):
        kind = spec.get("kind")
        alias = f"__m{i}"
        col = spec.get("col", "")
        if kind == "completeness":
            aggs.append(F.sum(F.when(F.col(col).isNotNull(), 1).otherwise(0)).alias(alias))
            meta.append((spec.get("name", f"completeness:{col}"), kind, col,
                         float(spec["min_ratio"]), alias, "ratio_ge"))
        elif kind == "unique":
            cols = list(spec["cols"])
            aggs.append(F.count_distinct(*[F.col(c) for c in cols]).alias(alias))
            # Non-NULL-key row count as the denominator: count_distinct
            # skips NULL keys, so dividing by total rows would deflate
            # the ratio for nullable keys (ADVICE r6).
            denom_alias = f"__d{i}"
            nn = F.lit(True)
            for c in cols:
                nn = nn & F.col(c).isNotNull()
            aggs.append(F.sum(F.when(nn, 1).otherwise(0)).alias(denom_alias))
            meta.append((spec.get("name", f"unique:{','.join(cols)}"), kind,
                         ",".join(cols), float(spec.get("min_ratio", 1.0)),
                         (alias, denom_alias), "ratio_ge_pair"))
        elif kind == "min":
            aggs.append(F.min(F.col(col)).cast("double").alias(alias))
            meta.append((spec.get("name", f"min:{col}"), kind, col,
                         float(spec["bound"]), alias, "ge"))
        elif kind == "max":
            aggs.append(F.max(F.col(col)).cast("double").alias(alias))
            meta.append((spec.get("name", f"max:{col}"), kind, col,
                         float(spec["bound"]), alias, "le"))
        elif kind == "in_set":
            allowed = F.array(*[F.lit(v) for v in spec["allowed"]])
            aggs.append(F.sum(
                F.when(F.array_contains(allowed, F.col(col)), 1).otherwise(0)
            ).alias(alias))
            meta.append((spec.get("name", f"in_set:{col}"), kind, col,
                         float(spec["min_ratio"]), alias, "ratio_ge"))
        elif kind == "pattern":
            # rlike is a substring SEARCH — anchor so the constraint is
            # a full-format match, as the contract states.
            full = f"^(?:{spec['regex']})$"
            aggs.append(F.sum(
                F.when(F.col(col).rlike(full), 1).otherwise(0)
            ).alias(alias))
            meta.append((spec.get("name", f"pattern:{col}"), kind, col,
                         float(spec["min_ratio"]), alias, "ratio_ge"))
        elif kind == "row_count_min":
            meta.append((spec.get("name", "row_count_min"), kind, "",
                         float(spec["threshold"]), "__n", "ge"))
        else:
            raise ValueError(f"verify_constraints: unknown kind {kind!r}")
    one = df.agg(*aggs)
    n = F.col("__n")
    structs = []
    for name, kind, col, threshold, alias, direction in meta:
        if direction == "ratio_ge_pair":
            num_alias, denom_alias = alias
            num = F.col(num_alias).cast("double")
            denom = F.col(denom_alias).cast("double")
            observed = F.when(denom > 0, num / denom)
            passed = observed >= F.lit(threshold)
            structs.append(F.struct(
                F.lit(name).alias("name"),
                F.lit(kind).alias("kind"),
                F.lit(col).alias("column"),
                observed.alias("observed"),
                F.lit(threshold).alias("threshold"),
                F.coalesce(passed, F.lit(False)).alias("passed"),
            ))
            continue
        raw = F.col(alias).cast("double")
        if direction == "ratio_ge":
            observed = F.when(n > 0, raw / n)
            passed = observed >= F.lit(threshold)
        elif direction == "ge":
            observed = raw
            passed = observed >= F.lit(threshold)
        else:  # le
            observed = raw
            passed = observed <= F.lit(threshold)
        structs.append(F.struct(
            F.lit(name).alias("name"),
            F.lit(kind).alias("kind"),
            F.lit(col).alias("column"),
            observed.alias("observed"),
            F.lit(threshold).alias("threshold"),
            F.coalesce(passed, F.lit(False)).alias("passed"),
        ))
    return one.select(F.explode(F.array(*structs)).alias("c")).select("c.*")


def k_anonymity_report(
    df: DataFrame,
    quasi_cols: list[str],
    k: int,
) -> DataFrame:
    """k-anonymity audit over a quasi-identifier tuple — the privacy
    gate a dataset release runs: a row is k-anonymous when at least
    ``k`` rows share its full quasi-identifier combination, so any
    group smaller than k re-identifies its members. Returns ONE
    certificate row: total rows, number of distinct quasi-identifier
    groups, the count of groups below k, the count of ROWS at risk
    (members of those groups), the minimum group size (the dataset's
    actual k), and a passed verdict (min group size >= k).

    NULL quasi-identifier values form their own group (SQL groupBy
    semantics) — deliberate: an all-NULL tuple is itself a linkable
    signature, not an exemption. An EMPTY table fails the gate
    (passed=False, counts 0, min_group_size NULL): an empty release is
    an upstream pipeline bug, and a NULL verdict must never leak into
    a gate that checks ``passed is False``.

    Scale shape: ONE map-combinable groupBy on the quasi columns to
    group sizes, then a second aggregate over the (much smaller) group
    table — never a self-join, never a window over raw rows.
    """
    if k < 2:
        raise ValueError(f"k_anonymity_report: k must be >= 2, got {k}")
    if not quasi_cols:
        raise ValueError("k_anonymity_report: quasi_cols must be non-empty")
    sizes = df.groupBy(*quasi_cols).agg(F.count(F.lit(1)).alias("__gsz"))
    return sizes.agg(
        F.coalesce(F.sum("__gsz"), F.lit(0)).cast("long").alias("n_rows"),
        F.count(F.lit(1)).cast("long").alias("n_groups"),
        F.coalesce(
            F.sum(F.when(F.col("__gsz") < k, 1).otherwise(0)), F.lit(0)
        ).cast("long").alias("groups_below_k"),
        F.coalesce(
            F.sum(F.when(F.col("__gsz") < k, F.col("__gsz")).otherwise(0)), F.lit(0)
        ).cast("long").alias("rows_at_risk"),
        F.min("__gsz").cast("long").alias("min_group_size"),
        F.coalesce(F.min("__gsz") >= F.lit(k), F.lit(False)).alias("passed"),
    )


def ks_statistic(
    df: DataFrame,
    value_col: str,
    side_col: str | Column,
    n_bins: int = 64,
) -> DataFrame:
    """EXACT two-sample Kolmogorov-Smirnov statistic — the UNBINNED
    drift test that complements the binned monitors above (PSI/JSD can
    miss a shift that stays inside their bins; KS evaluates the CDF gap
    at every observed value): D = max over distinct values v of
    |CDF_a(v) - CDF_b(v)|, with ``side_col`` true for sample A. Returns
    one certificate row: n_a, n_b, ks_stat, plus the value where the
    max gap is attained (smallest such value under ties).

    This is the exact statistic, not an approximation — ``n_bins``
    only controls PARALLELISM, never the answer.

    Scale shape (the bucketed-prefix-scan pattern, as in
    ``budget_prefix_sample``): raw rows reduce to the DISTINCT-value
    table in one map-combinable groupBy (per-value counts for both
    sides in the same pass — ties must collapse BEFORE the CDF or the
    interleaving order of equal values would change intermediate
    gaps). Quantile edges range-slice the value table into ``n_bins``
    independent runs; per-(bin, side) subtotals (<= n_bins tiny rows)
    give each bin's driver-side CDF offsets, so the cumulative window
    partitions BY BIN — no single global sort, no SinglePartition
    funnel. The per-bin maxima reduce to the answer in one final tiny
    aggregate. CDF values are integer-count ratios, so both engines
    divide identical integers — the statistic is bit-identical, not
    merely within rounding. NULL values are excluded from both sides.
    """
    side_raw = F.col(side_col) if isinstance(side_col, str) else side_col
    # A NULL side is an unlabeled row: silently counting it into either
    # sample would bias D with no warning — raise per-row instead and
    # make the caller decide (filter or impute).
    side = F.when(
        side_raw.isNull(),
        F.raise_error(
            F.lit("ks_statistic: NULL side_col — unlabeled rows would "
                  "silently bias a sample; filter or label them first")
        ).cast("boolean"),
    ).otherwise(side_raw)
    v = F.col(value_col)
    per_value = (
        df.filter(v.isNotNull())
        .groupBy(v.alias("__val"))
        .agg(
            F.sum(F.when(side, 1).otherwise(0)).alias("__na"),
            F.sum(F.when(side, 0).otherwise(1)).alias("__nb"),
        )
    )
    per_value = per_value.persist()
    try:
        if per_value.limit(1).count() == 0:
            raise ValueError(
                "ks_statistic: no non-NULL values at all — both sides "
                "need rows to compare CDFs"
            )
        edges = quantile_edges(per_value, "__val", n_bins)
        binned = per_value.withColumn("__bin", bin_by_edges(F.col("__val"), edges))
        sub = (
            binned.groupBy("__bin")
            .agg(F.sum("__na").alias("a"), F.sum("__nb").alias("b"))
            .collect()
        )
        tot_a = sum(r["a"] for r in sub)
        tot_b = sum(r["b"] for r in sub)
        if tot_a == 0 or tot_b == 0:
            raise ValueError(
                f"ks_statistic: both sides need rows (n_a={tot_a}, n_b={tot_b})"
            )
        off_a, off_b, run_a, run_b = {}, {}, 0, 0
        for r in sorted(sub, key=lambda r: r["__bin"]):
            off_a[r["__bin"]], off_b[r["__bin"]] = run_a, run_b
            run_a += r["a"]
            run_b += r["b"]
        from big_data_analysis_spark.operators.relational import lit_map as _lit_map

        w = Window.partitionBy("__bin").orderBy("__val")
        b = F.col("__bin")
        cdf_a = (F.sum("__na").over(w) + _lit_map(off_a)[b]) / F.lit(float(tot_a))
        cdf_b = (F.sum("__nb").over(w) + _lit_map(off_b)[b]) / F.lit(float(tot_b))
        gaps = binned.select(
            "__val", F.abs(cdf_a - cdf_b).alias("__gap")
        ).persist()
        try:
            # Two tiny jobs: the max gap, then the smallest value
            # attaining it (deterministic under ties). gaps is persisted
            # so the per-bin window shuffle runs ONCE and both jobs read
            # the shuffled result — on a high-cardinality value column
            # that window is the dominant cost.
            d = gaps.agg(F.max("__gap")).head()[0]
            at = gaps.filter(F.col("__gap") == F.lit(d)).agg(F.min("__val")).head()[0]
        finally:
            gaps.unpersist()
        return df.sparkSession.createDataFrame(
            [(int(tot_a), int(tot_b), float(d), at)],
            f"n_a long, n_b long, ks_stat double, at_value {binned.schema['__val'].dataType.simpleString()}",
        )
    finally:
        per_value.unpersist()


def benford_test(df: DataFrame, col: str) -> DataFrame:
    """Benford's-law first-digit conformance — the fabricated-data
    screen auditors run on naturally-occurring positive amounts
    (payments, populations, trade volumes): real multiplicative data
    has first significant digit d with probability log10(1 + 1/d);
    invented numbers famously don't. Returns one row per digit 1..9:
    observed count, observed/expected proportions, plus the same
    chi-square statistic on every row (long form keeps the per-digit
    profile AND the scalar verdict in one frame).

    Only strictly-positive finite values participate (zero and
    negatives have no first significant digit under the classic law;
    NULL/NaN excluded) — their exclusion count is NOT part of this
    certificate, pair with ``verify_constraints`` for completeness.

    Scale shape: the first digit is the first nonzero character of the
    value's round-trip string — LIBM-FREE on purpose: the arithmetic
    form floor(x / 10^floor(log10(x))) mis-digits values at power-of-10
    boundaries whenever two engines' log10 differ by one ulp, while the
    shortest round-trip repr (what every engine's double->string cast
    produces) starts with the true first significant digit by
    construction. The profile is ONE map-combinable groupBy to <= 9
    rows and the chi-square a windowed constant over those 9 — one
    scan, no driver data beyond the digit table.
    """
    x = F.col(col).cast("double")
    valid = x.isNotNull() & ~F.isnan(x) & (x > 0) & (x != float("inf"))
    # Digit from the RAW value's string, not the double's: a
    # decimal(38,20) holding 0.99999999999999999999 rounds to double
    # 1.0 and would mis-digit 9 -> 1; only the validity FILTER uses the
    # double view (decimals cannot be NaN/inf anyway).
    digit = F.regexp_extract(F.col(col).cast("string"), "[1-9]", 0).cast("int")
    counts = (
        df.filter(valid)
        .groupBy(digit.alias("digit"))
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    # All nine digits present even at zero count — expected proportions
    # are constants, so the spine is a 9-row literal range.
    spark = df.sparkSession
    spine = spark.range(1, 10).select(F.col("id").cast("int").alias("digit"))
    full = spine.join(counts, "digit", "left").select(
        "digit", F.coalesce("n", F.lit(0)).alias("n")
    )
    w = Window.partitionBy()
    total = F.sum("n").over(w)
    expected_p = F.log10(1 + 1 / F.col("digit").cast("double"))
    obs_p = F.try_divide(F.col("n"), total)
    chi2_term = F.try_divide(
        F.pow(F.col("n") - expected_p * total, F.lit(2)), expected_p * total
    )
    # A batch with ZERO auditable values must not read as conformant
    # (NULL chi2 silently drops out of a `chi2 > threshold` gate) —
    # fail loudly at execution, per-row on the 9-row spine, no extra
    # scan.
    chi2_col = F.when(
        total > 0, F.round(F.sum("__chi2_term").over(w), 6)
    ).otherwise(
        F.raise_error(
            F.lit(
                f"benford_test: no positive finite values in {col} — "
                "nothing to audit; an empty batch must not pass a "
                "conformance gate silently"
            )
        )
    )
    return (
        full.withColumn("__chi2_term", chi2_term)
        .withColumn("chi2", chi2_col)
        .select(
            "digit",
            "n",
            F.round(obs_p, 6).alias("observed_p"),
            F.round(expected_p, 6).alias("expected_p"),
            "chi2",
        )
    )
