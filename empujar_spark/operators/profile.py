"""Dataset profiling and deterministic sampling — the first two things a
training-data pipeline does to a new 100 TB corpus.

- ``hash_sample``: reproducible subsample by md5(id) threshold. Purely
  partition-local (a Filter — no shuffle, no RNG state, no seed drift
  across retries/executors), and stable under re-runs and repartitioning,
  unlike ``df.sample`` whose output depends on partition layout.
- ``profile_numeric``: per-column n/nulls/distinct/min/max in ONE scan —
  a single aggregate computes every column's stats as struct expressions,
  then an inline explode pivots to long form. Never one scan per column.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def hash_sample(
    df: DataFrame, rate_permille: int, id_col: str = "doc_id"
) -> DataFrame:
    """Keep ~rate_permille/1000 of rows, chosen by md5(id) bucket.

    md5-derived (never Spark's hash()) so any engine computing the same
    expression selects the identical subset — the reproducibility contract
    a corpus snapshot needs."""
    bucket = (
        F.conv(F.substring(F.md5(F.col(id_col).cast("string")), 1, 8), 16, 10)
        .cast("bigint")
        % 1000
    )
    return df.filter(bucket < rate_permille)


def profile_numeric(df: DataFrame, cols: list[str]) -> DataFrame:
    """(column, n_rows, n_null, n_distinct, min_v, max_v) per column —
    one aggregation pass over the table, every stat a partial-aggregatable
    expression (map-side combine; one shuffle of a single row)."""
    aggs = []
    for c in cols:
        col = F.col(c)
        aggs.append(
            F.struct(
                F.lit(c).alias("column"),
                F.count(F.lit(1)).alias("n_rows"),
                F.sum(col.isNull().cast("bigint")).alias("n_null"),
                F.count_distinct(col).alias("n_distinct"),
                F.min(col).cast("double").alias("min_v"),
                F.max(col).cast("double").alias("max_v"),
            ).alias(f"__p_{c}")
        )
    one = df.agg(*aggs)
    return one.select(
        F.explode(F.array(*[F.col(f"__p_{c}") for c in cols])).alias("p")
    ).select("p.*")


def stratified_split(
    df: DataFrame,
    id_col: str = "doc_id",
    val_permille: int = 100,
    test_permille: int = 100,
) -> DataFrame:
    """Deterministic train/val/test assignment — the split a training-data
    pipeline freezes before anything else.

    The split key is md5(id) mod 1000 (never RNG, never Spark's hash()):
    the assignment is a pure per-row expression, identical on any engine,
    any partitioning, any rerun — and stable under corpus growth (a doc
    keeps its split forever; new docs land proportionally). Buckets
    [0, test) → test, [test, test+val) → val, rest → train. A pure
    projection: no shuffle, fully pushdown-transparent at 100 TB.
    """
    bucket = (
        F.conv(F.substring(F.md5(F.col(id_col).cast("string")), 1, 8), 16, 10)
        .cast("bigint")
        % 1000
    )
    split = (
        F.when(bucket < test_permille, F.lit("test"))
        .when(bucket < test_permille + val_permille, F.lit("val"))
        .otherwise(F.lit("train"))
    )
    return df.withColumn("split", split)


def leakage_safe_split(
    df: DataFrame,
    group_col: str,
    val_permille: int = 100,
    test_permille: int = 100,
) -> DataFrame:
    """stratified_split keyed on a GROUP instead of the row id — the
    split-leakage control (r16): every member of a duplicate group
    lands in the SAME split, so eval never scores content the model
    trained on under a different doc_id. Splitting by row id silently
    violates this the moment the corpus contains duplication — the
    exact contamination path dedup-then-split pipelines exist to close,
    and the reason the split must key on CONTENT identity, not storage
    identity.

    ``group_col`` is the identity the caller chose: a content
    fingerprint (text.fingerprint_col — exact duplicates), a near-dup
    cluster id (dedup.connected components / minhash clusters), or any
    other grouping whose members must never straddle train/eval. The
    bucket math IS stratified_split's (delegated, not copied — one
    source of truth for the md5-mod-1000 rule); only the key differs,
    which is the whole point."""
    return stratified_split(df, group_col, val_permille, test_permille)


def numeric_histogram(
    df: DataFrame, col: str, n_bins: int = 20
) -> DataFrame:
    """Equal-width histogram of a numeric column: (bin, lo, hi, n).

    Two aggregates: one tiny (min, max) pass whose single row broadcasts
    into the binning projection (never a global window), then one
    groupBy(bin) count — at 100 TB that is two scans of one column with
    map-side partial aggregation, the minimal exact plan. The top edge
    closes into the last bin (least(bin, n_bins-1)), the classic
    histogram boundary rule."""
    rng = df.agg(
        F.min(F.col(col)).cast("double").alias("lo"),
        F.max(F.col(col)).cast("double").alias("hi"),
    )
    binned = df.select(F.col(col).cast("double").alias("x")).crossJoin(
        F.broadcast(rng)
    )
    width = (F.col("hi") - F.col("lo")) / F.lit(float(n_bins))
    # constant column → lo == hi → width 0: every value lands in bin 0
    # (one-bin histogram) instead of DIVIDE_BY_ZERO under ANSI mode
    bin_ = F.when(width == 0.0, F.lit(0).cast("bigint")).otherwise(
        F.least(
            F.floor((F.col("x") - F.col("lo")) / width).cast("bigint"),
            F.lit(n_bins - 1).cast("bigint"),
        )
    )
    return (
        binned.filter(F.col("x").isNotNull())
        .select(
            bin_.alias("bin"),
            (F.col("lo") + bin_ * width).alias("lo"),
            (F.col("lo") + (bin_ + 1) * width).alias("hi"),
        )
        .groupBy("bin", "lo", "hi")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def grouped_linear_trend(
    df: DataFrame,
    group_cols: list[str],
    x,
    y,
) -> DataFrame:
    """Per-group least-squares slope/intercept — computed with EXACT
    decimal sums, never float accumulation, so the result is identical in
    any partitioning / merge order / engine (the corpus oracle recomputes
    it in SQL and hash-matches).

    ``x`` must be an integer-valued column expression (e.g. hours since a
    fixed origin), ``y`` a decimal expression. slope = (nΣxy − ΣxΣy) /
    (nΣx² − (Σx)²): the four sums aggregate exactly in decimal, the
    numerator/denominator are rounded to scale 0 and cast to
    DECIMAL(38,0) before the double division — an integer-valued decimal
    ≤ 2^53 converts to double exactly on any engine, sidestepping the
    engines' differing decimal→double rounding. Magnitude envelope: with
    |x| ≤ 1e4, |y| ≤ 1e4 and ≤ 1e6 rows per group the numerator stays
    < 2^53; beyond that, rescale x (coarser origin units).
    Distributed cost: ONE map-side-partial aggregation, one tiny shuffle.
    """
    xd = x.cast("decimal(18,0)")
    yd = y.cast("decimal(18,6)")
    agg = df.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(xd).cast("decimal(38,0)").alias("sx"),
        F.sum(yd).cast("decimal(38,6)").alias("sy"),
        F.sum(xd * yd).cast("decimal(38,6)").alias("sxy"),
        F.sum(xd * xd).cast("decimal(38,0)").alias("sxx"),
    )
    nd = F.col("n").cast("decimal(38,0)")
    num = F.round(nd * F.col("sxy") - F.col("sx") * F.col("sy"), 0).cast(
        "decimal(38,0)"
    ).cast("double")
    den = (nd * F.col("sxx") - F.col("sx") * F.col("sx")).cast(
        "decimal(38,0)"
    ).cast("double")
    # singleton groups (n==1) and constant-x groups have den == 0: no
    # defined slope — return NULL instead of an ANSI DIVIDE_BY_ZERO that
    # would abort the whole aggregation job
    slope = F.when(den == 0.0, F.lit(None).cast("double")).otherwise(
        F.round(num / den, 6)
    )
    # intercept from the already-rounded slope: every operand below is an
    # exactly-converted double, so both engines compute identical values
    sy_d = F.col("sy").cast("double")  # scale 6, |scaled| < 2^53: exact
    sx_d = F.col("sx").cast("double")
    intercept = F.round((sy_d - slope * sx_d) / F.col("n").cast("double"), 6)
    return agg.select(
        *group_cols,
        "n",
        slope.alias("slope"),
        intercept.alias("intercept"),
    )


def winsorized_stats(
    df: DataFrame,
    group_col: str,
    value_col: str,
    lo_p: float = 0.05,
    hi_p: float = 0.95,
) -> DataFrame:
    """Winsorized (clipped) robust statistics per group: values below the
    group's ``lo_p`` percentile or above ``hi_p`` clamp to the boundary,
    then count / clipped-count / clipped mean are exact decimal
    aggregates. The outlier-robust mean a metrics pipeline wants when a
    handful of bad rows would otherwise drag the average.

    Output: (group, n, n_clipped, winsorized_mean) — boundaries rounded
    to 6 dp before comparison so the clip decision is cross-engine
    stable; the mean is an exact decimal sum divided in double.

    Scale shape: the percentile pass collapses to |groups| boundary rows
    that BROADCAST back onto a second scan — no window over the data
    stream, two scans total. Note the exact interpolated `percentile`
    buffers each group's values (fine for bounded groups); at unbounded
    per-group cardinality swap in `approx_percentile`, as the quantiles
    corpus entry documents.
    """
    bounds = df.groupBy(group_col).agg(
        F.round(F.percentile(value_col, F.lit(lo_p)), 6).alias("__lo"),
        F.round(F.percentile(value_col, F.lit(hi_p)), 6).alias("__hi"),
    )
    v = F.col(value_col)
    clipped_v = (
        F.when(v < F.col("__lo"), F.col("__lo"))
        .when(v > F.col("__hi"), F.col("__hi"))
        .otherwise(v)
    )
    was_clipped = (v < F.col("__lo")) | (v > F.col("__hi"))
    return (
        df.join(F.broadcast(bounds), group_col)
        .select(
            group_col,
            clipped_v.cast("decimal(18,6)").alias("__v"),
            was_clipped.cast("int").alias("__c"),
        )
        .groupBy(group_col)
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("__c").cast("bigint").alias("n_clipped"),
            F.round(
                F.sum("__v").cast("double") / F.count(F.lit(1)), 6
            ).alias("winsorized_mean"),
        )
    )


def population_stability(
    ref: DataFrame, cur: DataFrame, col: str, n_bins: int = 10
) -> DataFrame:
    """Population Stability Index per bin — the tabular-feature drift
    monitor (the credit-scoring PSI, the standard "did this feature's
    distribution move between the reference snapshot and today" check):
    Σ (p−q)·ln(p/q) over equal-width bins, where the BINNING IS FROZEN
    ON THE REFERENCE side (production monitors bin against the training
    snapshot; re-binning on current data would hide exactly the shift
    being measured). Current values outside the reference range clamp
    into the edge bins; a constant reference column degenerates to one
    bin, the numeric_histogram rule.

    Cross-engine determinism (the DSIR playbook): proportions are
    Laplace-smoothed — (n+1)/(N+n_bins), so empty bins stay finite —
    and quantized to 1e-6 BEFORE the ln ratio; each bin's term rounds to
    1e-6 again, so the per-bin PSI contribution is engine-exact. Plan:
    one (min,max) scalar broadcast off the reference, one groupBy(bin)
    count per side with map-side combine, the n_bins-row frames join to
    a generated bin spine (empty bins surface as 0, not absence) —
    nothing wider than a column scan at any scale.

    Output: (bin, n_ref, n_cur, p_ref, q_cur, psi_term); total PSI is
    the sum of psi_term (>0.25 is the classic retrain alarm).
    """
    spark = ref.sparkSession
    rng = ref.agg(
        F.min(F.col(col)).cast("double").alias("lo"),
        F.max(F.col(col)).cast("double").alias("hi"),
    )
    width = (F.col("hi") - F.col("lo")) / F.lit(float(n_bins))
    bin_ = F.when(width == 0.0, F.lit(0).cast("bigint")).otherwise(
        F.least(
            F.greatest(
                F.floor((F.col("x") - F.col("lo")) / width).cast("bigint"),
                F.lit(0).cast("bigint"),
            ),
            F.lit(n_bins - 1).cast("bigint"),
        )
    )

    def side_counts(df: DataFrame, name: str) -> DataFrame:
        return (
            df.select(F.col(col).cast("double").alias("x"))
            .filter(F.col("x").isNotNull())
            .crossJoin(F.broadcast(rng))
            .select(bin_.alias("bin"))
            .groupBy("bin")
            .agg(F.count(F.lit(1)).cast("bigint").alias(name))
        )

    spine = spark.range(n_bins).select(F.col("id").alias("bin"))
    counts = (
        spine.join(side_counts(ref, "n_ref"), "bin", "left")
        .join(side_counts(cur, "n_cur"), "bin", "left")
        .fillna(0, subset=["n_ref", "n_cur"])
    )
    return psi_terms_from_counts(counts, n_bins)


def psi_terms_from_counts(
    counts: DataFrame, n_bins: int, by: str | list[str] | None = None
) -> DataFrame:
    """The PSI epilogue over an already-binned (bin, n_ref, n_cur)
    frame — shared by the batch operator, the streaming monitor
    (streaming/stream_ops.py psi_drift_stream), the sliced variant
    (``by="slice"`` partitions the smoothing totals per slice), and the
    multi×sliced form (``by=["feature", "slice"]``), so every caller
    computes bit-identical smoothed/quantized terms."""
    lead = ([by] if isinstance(by, str) else list(by)) if by else []
    w = Window.partitionBy(*lead)
    p = F.round(
        (F.col("n_ref") + F.lit(1.0))
        / (F.sum("n_ref").over(w) + F.lit(float(n_bins))),
        6,
    )
    q = F.round(
        (F.col("n_cur") + F.lit(1.0))
        / (F.sum("n_cur").over(w) + F.lit(float(n_bins))),
        6,
    )
    return counts.select(
        *lead,
        "bin",
        "n_ref",
        "n_cur",
        p.alias("p_ref"),
        q.alias("q_cur"),
    ).select(
        *lead,
        "bin",
        "n_ref",
        "n_cur",
        "p_ref",
        "q_cur",
        F.round(
            (F.col("p_ref") - F.col("q_cur"))
            * F.log(F.col("p_ref") / F.col("q_cur")),
            6,
        ).alias("psi_term"),
    )


def population_stability_sliced(
    ref: DataFrame,
    cur: DataFrame,
    col: str,
    slice_col: str,
    n_bins: int = 10,
) -> DataFrame:
    """PSI per SLICE: the same frozen-reference drift check computed
    WITHIN every segment of ``slice_col`` — aggregate PSI can read clean
    while one segment (a source, a language, an event type) has moved
    violently and another compensated; sliced evaluation is how a
    production monitor catches that. Each slice freezes its OWN (min,
    max) on the reference (one groupBy(slice) pass, materialized once —
    the slice-count-sized range table both sides' binning joins), counts
    are one groupBy(slice, bin) per side, and the shared PSI tail runs
    with smoothing totals PARTITION BY slice — per-slice results
    bit-identical to calling population_stability on that slice's rows
    (pinned in tests). Slices with no reference rows are DROPPED (no
    frozen binning exists for them — surface new slices with
    chi_square_drift on the slice column itself).

    Output: (slice, bin, n_ref, n_cur, p_ref, q_cur, psi_term); per-
    slice PSI = sum(psi_term) within the slice block.
    """
    def prep(df: DataFrame) -> DataFrame:
        return df.select(
            F.col(slice_col).cast("string").alias("slice"),
            F.col(col).cast("double").alias("x"),
        ).filter(F.col("x").isNotNull() & F.col("slice").isNotNull())

    rng = (
        prep(ref)
        .groupBy("slice")
        .agg(
            F.min("x").alias("lo"),
            F.max("x").alias("hi"),
        )
        # materialize once: both sides' binning joins reference it, and
        # an unmaterialized plan re-runs the reference scan per side
        # (the population_stability_multi rule)
        .localCheckpoint(eager=True)
    )
    width = (F.col("hi") - F.col("lo")) / F.lit(float(n_bins))
    bin_ = F.when(width == 0.0, F.lit(0).cast("bigint")).otherwise(
        F.least(
            F.greatest(
                F.floor((F.col("x") - F.col("lo")) / width).cast("bigint"),
                F.lit(0).cast("bigint"),
            ),
            F.lit(n_bins - 1).cast("bigint"),
        )
    )

    def side_counts(df: DataFrame, name: str) -> DataFrame:
        return (
            prep(df)
            .join(F.broadcast(rng), "slice")
            .select("slice", bin_.alias("bin"))
            .groupBy("slice", "bin")
            .agg(F.count(F.lit(1)).cast("bigint").alias(name))
        )

    # slice × bin spine from the range table — an explode, never a join
    spine = rng.select(
        "slice",
        F.explode(
            F.array(*[F.lit(b).cast("bigint") for b in range(n_bins)])
        ).alias("bin"),
    )
    counts = (
        spine.join(
            F.broadcast(side_counts(ref, "n_ref")), ["slice", "bin"], "left"
        )
        .join(
            F.broadcast(side_counts(cur, "n_cur")), ["slice", "bin"], "left"
        )
        .fillna(0, subset=["n_ref", "n_cur"])
    )
    return psi_terms_from_counts(counts, n_bins, by="slice")


def population_stability_multi(
    ref: DataFrame, cur: DataFrame, cols: list[str], n_bins: int = 10
) -> DataFrame:
    """PSI over MANY monitored features in a constant number of scans —
    the production form of ``population_stability`` (VERDICT r12): a
    drift monitor watches dozens of columns, and the per-column call
    costs F full passes of a 100 TB table per side. Here the feature
    axis rides the rows instead: one aggregate over the reference
    computes EVERY feature's (min, max) (a single scan producing a
    1-row frame that melts to an F-row broadcast range table), then one
    scan per side unpivots the F columns to (feature, x) rows — inline
    explode of struct literals, column-pruned to exactly the monitored
    set — joins the broadcast ranges, and groupBy(feature, bin) counts
    with map-side combine. Three scans total regardless of F, nothing
    shuffled wider than F × n_bins rows.

    Semantics per feature are identical to the single-column operator
    (binning frozen on the reference, edge-bin clamping, constant
    columns degenerate to bin 0, Laplace-smoothed 1e-6-quantized
    proportions — smoothing totals PARTITION BY feature); equality with
    the per-column call is pinned in tests/test_quality.py.

    Output: (feature, bin, n_ref, n_cur, p_ref, q_cur, psi_term), one
    block of n_bins rows per feature; per-feature PSI = sum(psi_term)
    within the block. A feature whose REFERENCE column is entirely NULL
    has no binning range and is dropped from the report (the
    population_stability_sliced drop rule — PSI against an empty
    reference is undefined, not zero).
    """
    spark = ref.sparkSession
    rng = ref.agg(
        *[
            a
            for i, c in enumerate(cols)
            for a in (
                F.min(F.col(c)).cast("double").alias(f"__lo_{i}"),
                F.max(F.col(c)).cast("double").alias(f"__hi_{i}"),
            )
        ]
    ).select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("feature"),
                        F.col(f"__lo_{i}").alias("lo"),
                        F.col(f"__hi_{i}").alias("hi"),
                    )
                    for i, c in enumerate(cols)
                ]
            )
        ).alias("r")
    ).select("r.feature", "r.lo", "r.hi")
    # materialize the F-row range table ONCE: both sides' binning joins
    # reference it, and an unmaterialized plan would re-run the full
    # reference scan per side (4 scans, not 3 — constant either way, but
    # the extra one is a 100 TB pass bought for nothing)
    rng = rng.localCheckpoint(eager=True)
    width = (F.col("hi") - F.col("lo")) / F.lit(float(n_bins))
    bin_ = F.when(width == 0.0, F.lit(0).cast("bigint")).otherwise(
        F.least(
            F.greatest(
                F.floor((F.col("x") - F.col("lo")) / width).cast("bigint"),
                F.lit(0).cast("bigint"),
            ),
            F.lit(n_bins - 1).cast("bigint"),
        )
    )

    def side_counts(df: DataFrame, name: str) -> DataFrame:
        melted = (
            df.select(
                F.explode(
                    F.array(
                        *[
                            F.struct(
                                F.lit(c).alias("feature"),
                                F.col(c).cast("double").alias("x"),
                            )
                            for c in cols
                        ]
                    )
                ).alias("m")
            )
            .select("m.feature", "m.x")
            .filter(F.col("x").isNotNull())
        )
        return (
            melted.join(F.broadcast(rng), "feature")
            .select("feature", bin_.alias("bin"))
            .groupBy("feature", "bin")
            .agg(F.count(F.lit(1)).cast("bigint").alias(name))
        )

    # literal F × n_bins spine (constant-size by construction) — a
    # crossJoin of two literal frames would spell the same thing as a
    # BroadcastNestedLoopJoin for no reason. Features whose reference
    # column is all-NULL have no binning range (lo is NULL) and are
    # DROPPED from the report, matching population_stability_sliced's
    # documented semantics and the SQL oracle (ADVICE r13 — previously
    # the literal spine emitted n_bins all-zero smoothed rows for them).
    spine = spark.createDataFrame(
        [(c, b) for c in cols for b in range(n_bins)],
        "feature string, bin bigint",
    ).join(
        F.broadcast(
            rng.filter(F.col("lo").isNotNull()).select("feature")
        ),
        "feature",
        "left_semi",
    )
    counts = (
        spine.join(
            F.broadcast(side_counts(ref, "n_ref")), ["feature", "bin"], "left"
        )
        .join(
            F.broadcast(side_counts(cur, "n_cur")), ["feature", "bin"], "left"
        )
        .fillna(0, subset=["n_ref", "n_cur"])
    )
    w = Window.partitionBy("feature")
    p = F.round(
        (F.col("n_ref") + F.lit(1.0))
        / (F.sum("n_ref").over(w) + F.lit(float(n_bins))),
        6,
    )
    q = F.round(
        (F.col("n_cur") + F.lit(1.0))
        / (F.sum("n_cur").over(w) + F.lit(float(n_bins))),
        6,
    )
    return counts.select(
        "feature",
        "bin",
        "n_ref",
        "n_cur",
        p.alias("p_ref"),
        q.alias("q_cur"),
    ).select(
        "feature",
        "bin",
        "n_ref",
        "n_cur",
        "p_ref",
        "q_cur",
        F.round(
            (F.col("p_ref") - F.col("q_cur"))
            * F.log(F.col("p_ref") / F.col("q_cur")),
            6,
        ).alias("psi_term"),
    )


def chi_square_drift(
    ref: DataFrame, cur: DataFrame, col: str
) -> DataFrame:
    """Pearson chi-square goodness-of-fit drift for a CATEGORICAL
    feature — the third leg of the drift family (kmeans_drift watches
    embedding space, population_stability numeric features, this one
    categoricals like event_type / source / lang, where equal-width
    bins have no meaning). Expected counts come from the REFERENCE
    snapshot's Laplace-smoothed proportions scaled to the current
    total: e = (n_ref+1)/(N_ref+K) · N_cur over the UNION of categories
    seen on either side (K = |union|), so a category that newly appears
    or vanishes contributes a finite, visible term instead of a
    divide-by-zero or a silent drop.

    Cross-engine determinism (the PSI playbook): e quantizes to 1e-6
    before the (n_cur−e)²/e term, and the term re-rounds to 1e-6.
    Plan: ONE groupBy(col) count per side (map-side combine to K rows),
    a K-row full-outer join, two scalar totals computed from the
    already-reduced count tables — nothing wider than a column scan.

    Output: (category, n_ref, n_cur, e_cur, chi2_term); total statistic
    is sum(chi2_term), degrees of freedom K−1.
    """
    def side(df: DataFrame, name: str) -> DataFrame:
        return (
            df.select(F.col(col).cast("string").alias("category"))
            .filter(F.col("category").isNotNull())
            .groupBy("category")
            .agg(F.count(F.lit(1)).cast("bigint").alias(name))
        )

    counts = (
        side(ref, "n_ref")
        .join(side(cur, "n_cur"), "category", "full_outer")
        .fillna(0, subset=["n_ref", "n_cur"])
    )
    return chi2_terms_from_counts(counts)


def chi2_terms_from_counts(
    counts: DataFrame, by: str | list[str] | None = None
) -> DataFrame:
    """The chi-square epilogue over an already-counted (category, n_ref,
    n_cur) frame — shared by the batch operator, the streaming monitor
    (streaming/stream_ops.py chi2_drift_stream), the multi-feature
    variant (``by="feature"`` partitions the smoothing totals per
    feature), the sliced variant (``by="slice"``) and the multi×sliced
    form (``by=["feature", "slice"]``), so every caller computes
    bit-identical smoothed expected counts and terms.

    VANISHED-GROUP EDGE (ADVICE r14): a partition with rows on the
    reference side only (a slice that disappeared from current) has
    n_cur_tot = 0, so every e_cur in it is 0 and the raw term is
    0/0 → NULL. That block emits an EXPLICIT 0.0 instead (the standard
    chi-square convention for observed = expected = 0): a vanished
    slice says nothing about its category MIX — which is all this test
    measures — and disappearance itself is a volume signal the count
    monitors own. The remaining e_cur = 0 path (n_cur > 0 with an
    expected count that ROUNDS to 0 — needs a ≲1e-6 reference
    proportion at 6-decimal rounding) stays NULL: the drift there is
    effectively infinite and no finite term is honest. Pinned
    cross-engine: the chi2_sliced corpus oracle carves a ref-only
    shard out of the current split and hash-matches the 0.0 rows."""
    lead = ([by] if isinstance(by, str) else list(by)) if by else []
    w = Window.partitionBy(*lead)
    n_ref_tot = F.sum("n_ref").over(w)
    n_cur_tot = F.sum("n_cur").over(w)
    k_cats = F.count(F.lit(1)).over(w)
    e = F.round(
        (F.col("n_ref") + F.lit(1.0))
        / (n_ref_tot + k_cats.cast("double"))
        * n_cur_tot.cast("double"),
        6,
    )
    term = F.when(
        (F.col("e_cur") == 0) & (F.col("n_cur") == 0), F.lit(0.0)
    ).otherwise(
        F.round(
            (F.col("n_cur") - F.col("e_cur"))
            * (F.col("n_cur") - F.col("e_cur"))
            / F.col("e_cur"),
            6,
        )
    )
    return counts.select(
        *lead, "category", "n_ref", "n_cur", e.alias("e_cur")
    ).select(
        *lead,
        "category",
        "n_ref",
        "n_cur",
        "e_cur",
        term.alias("chi2_term"),
    )


def chi_square_drift_multi(
    ref: DataFrame, cur: DataFrame, cols: list[str]
) -> DataFrame:
    """Chi-square drift over MANY categorical features in ONE scan per
    side — the population_stability_multi trick applied to categoricals:
    the feature axis unpivots onto the rows (inline explode of struct
    literals, column-pruned to the monitored set), one
    groupBy(feature, category) per side with map-side combine, a tiny
    full-outer merge, and the shared epilogue with smoothing totals
    PARTITION BY feature. Per-feature results are bit-identical to
    chi_square_drift (pinned in tests); the per-column call costs 2
    scans PER feature, this costs 2 total.

    Output: (feature, category, n_ref, n_cur, e_cur, chi2_term)."""
    def side(df: DataFrame, name: str) -> DataFrame:
        melted = (
            df.select(
                F.explode(
                    F.array(
                        *[
                            F.struct(
                                F.lit(c).alias("feature"),
                                F.col(c).cast("string").alias("category"),
                            )
                            for c in cols
                        ]
                    )
                ).alias("m")
            )
            .select("m.feature", "m.category")
            .filter(F.col("category").isNotNull())
        )
        return melted.groupBy("feature", "category").agg(
            F.count(F.lit(1)).cast("bigint").alias(name)
        )

    counts = (
        side(ref, "n_ref")
        .join(side(cur, "n_cur"), ["feature", "category"], "full_outer")
        .fillna(0, subset=["n_ref", "n_cur"])
    )
    return chi2_terms_from_counts(counts, by="feature")


def population_stability_sliced_multi(
    ref: DataFrame,
    cur: DataFrame,
    cols: list[str],
    slice_col: str,
    n_bins: int = 10,
) -> DataFrame:
    """PSI for MANY features WITHIN every slice, in a CONSTANT number of
    scans — the full production monitor shape (F monitored features ×
    S segments; the per-call composition costs 3 scans per feature).
    Both tricks compose: the feature axis unpivots onto the rows (the
    population_stability_multi melt) WITH the slice key riding along,
    ranges freeze per (feature, slice) on the reference (one scan → an
    F×S-row checkpointed range table both sides' binning joins), one
    groupBy(feature, slice, bin) count per side with map-side combine,
    and the shared epilogue smooths PARTITION BY (feature, slice).
    Three scans total for ANY F and S; nothing shuffled wider than
    F × S × n_bins rows.

    Per-(feature, slice) results are bit-identical to
    population_stability_sliced on that feature (pinned in tests),
    which is itself pinned to the single-column operator — one
    equality chain for the whole family. (Feature, slice) pairs with no
    reference rows drop (no frozen binning — the sliced drop rule;
    all-NULL-reference features drop the same way).

    Output: (feature, slice, bin, n_ref, n_cur, p_ref, q_cur,
    psi_term); PSI per signal = sum(psi_term) within the
    (feature, slice) block."""
    def melt(df: DataFrame) -> DataFrame:
        return (
            df.select(
                F.col(slice_col).cast("string").alias("slice"),
                F.explode(
                    F.array(
                        *[
                            F.struct(
                                F.lit(c).alias("feature"),
                                F.col(c).cast("double").alias("x"),
                            )
                            for c in cols
                        ]
                    )
                ).alias("m"),
            )
            .select("slice", "m.feature", "m.x")
            .filter(F.col("x").isNotNull() & F.col("slice").isNotNull())
        )

    rng = (
        melt(ref)
        .groupBy("feature", "slice")
        .agg(F.min("x").alias("lo"), F.max("x").alias("hi"))
        # materialize once: both sides' binning joins reference it (the
        # population_stability_multi/sliced rule)
        .localCheckpoint(eager=True)
    )
    width = (F.col("hi") - F.col("lo")) / F.lit(float(n_bins))
    bin_ = F.when(width == 0.0, F.lit(0).cast("bigint")).otherwise(
        F.least(
            F.greatest(
                F.floor((F.col("x") - F.col("lo")) / width).cast("bigint"),
                F.lit(0).cast("bigint"),
            ),
            F.lit(n_bins - 1).cast("bigint"),
        )
    )

    def side_counts(df: DataFrame, name: str) -> DataFrame:
        return (
            melt(df)
            .join(F.broadcast(rng), ["feature", "slice"])
            .select("feature", "slice", bin_.alias("bin"))
            .groupBy("feature", "slice", "bin")
            .agg(F.count(F.lit(1)).cast("bigint").alias(name))
        )

    spine = rng.select(
        "feature",
        "slice",
        F.explode(
            F.array(*[F.lit(b).cast("bigint") for b in range(n_bins)])
        ).alias("bin"),
    )
    counts = (
        spine.join(
            F.broadcast(side_counts(ref, "n_ref")),
            ["feature", "slice", "bin"],
            "left",
        )
        .join(
            F.broadcast(side_counts(cur, "n_cur")),
            ["feature", "slice", "bin"],
            "left",
        )
        .fillna(0, subset=["n_ref", "n_cur"])
    )
    return psi_terms_from_counts(counts, n_bins, by=["feature", "slice"])


def chi_square_drift_sliced(
    ref: DataFrame,
    cur: DataFrame,
    col: str,
    slice_col: str,
) -> DataFrame:
    """Chi-square categorical drift per SLICE — the
    population_stability_sliced companion for categoricals (VERDICT r13
    item 4): an aggregate chi-square over the whole table can read
    clean while one segment's category mix inverts and another
    compensates (e.g. one source's event_type distribution flipping);
    computing the test WITHIN every segment of ``slice_col`` catches
    that. Expected counts freeze on the reference snapshot's
    Laplace-smoothed proportions PER SLICE, over the union of
    categories seen on either side within that slice (K per slice), via
    the shared epilogue with smoothing totals PARTITION BY slice —
    per-slice results bit-identical to chi_square_drift on that slice's
    rows alone (pinned in tests).

    Slice membership rides the full-outer category merge, so a slice
    with rows on only ONE side still surfaces — but the two one-sided
    directions differ (ADVICE r14): an all-NEW (current-only) slice
    gets finite smoothed terms (n_ref = 0 smooths to a positive
    expected proportion — a brand-new segment IS a mix-drift signal;
    unlike sliced PSI there is no frozen numeric range to make it
    undefined), while a VANISHED (reference-only) slice has
    n_cur_tot = 0 and emits explicit 0.0 terms per the shared-epilogue
    convention (observed = expected = 0): the test measures the
    category MIX, which a disappeared slice says nothing about —
    disappearance is a volume signal the count monitors own. The edge
    is pinned cross-engine by the chi2_sliced corpus oracle's carved
    ref-only shard.

    Plan shape at 100 TB: one groupBy(slice, category) per side with
    map-side combine (each reduces to Σ_slices K_slice rows — signal-
    sized), a tiny full-outer merge, and window partials over the
    reduced frame. Two scans total, nothing shuffled wider than the
    count table.

    Output: (slice, category, n_ref, n_cur, e_cur, chi2_term); per-
    slice statistic = sum(chi2_term) within the slice block, dof =
    K_slice − 1."""
    def side(df: DataFrame, name: str) -> DataFrame:
        return (
            df.select(
                F.col(slice_col).cast("string").alias("slice"),
                F.col(col).cast("string").alias("category"),
            )
            .filter(F.col("category").isNotNull() & F.col("slice").isNotNull())
            .groupBy("slice", "category")
            .agg(F.count(F.lit(1)).cast("bigint").alias(name))
        )

    counts = (
        side(ref, "n_ref")
        .join(side(cur, "n_cur"), ["slice", "category"], "full_outer")
        .fillna(0, subset=["n_ref", "n_cur"])
    )
    return chi2_terms_from_counts(counts, by="slice")


def chi_square_drift_sliced_multi(
    ref: DataFrame,
    cur: DataFrame,
    cols: list[str],
    slice_col: str,
) -> DataFrame:
    """Chi-square drift for MANY categorical features WITHIN every slice
    in TWO scans — the psi_sliced_multi composition applied to
    categoricals: the feature axis unpivots onto the rows with the
    slice key riding along, one groupBy(feature, slice, category) per
    side with map-side combine, a signal-sized full-outer merge, and
    the shared epilogue smoothing PARTITION BY (feature, slice).
    Per-(feature, slice) results bit-identical to
    chi_square_drift_sliced per feature (pinned in tests). One-sided
    (feature, slice) groups stay visible — the chi2_sliced new-segment
    rule.

    Output: (feature, slice, category, n_ref, n_cur, e_cur,
    chi2_term); per-signal statistic = sum within the (feature, slice)
    block, dof = K_{feature,slice} − 1."""
    def side(df: DataFrame, name: str) -> DataFrame:
        melted = (
            df.select(
                F.col(slice_col).cast("string").alias("slice"),
                F.explode(
                    F.array(
                        *[
                            F.struct(
                                F.lit(c).alias("feature"),
                                F.col(c).cast("string").alias("category"),
                            )
                            for c in cols
                        ]
                    )
                ).alias("m"),
            )
            .select("slice", "m.feature", "m.category")
            .filter(
                F.col("category").isNotNull() & F.col("slice").isNotNull()
            )
        )
        return melted.groupBy("feature", "slice", "category").agg(
            F.count(F.lit(1)).cast("bigint").alias(name)
        )

    counts = (
        side(ref, "n_ref")
        .join(
            side(cur, "n_cur"),
            ["feature", "slice", "category"],
            "full_outer",
        )
        .fillna(0, subset=["n_ref", "n_cur"])
    )
    return chi2_terms_from_counts(counts, by=["feature", "slice"])


def quantile_drift_sliced_multi(
    ref: DataFrame,
    cur: DataFrame,
    cols: list[str],
    slice_col: str,
    qs: tuple = (0.25, 0.5, 0.75, 0.99),
) -> DataFrame:
    """Per-quantile location drift for MANY features WITHIN every slice
    in TWO scans: one groupBy(slice) aggregate per side computes every
    (feature, quantile) percentile in the same pass (the
    quantile_drift_multi trick with the slice key as the group), the
    per-slice row explodes onto the feature×q spine, and the two
    signal-sized frames join on (feature, slice, q). One-sided slices
    drop (a delta needs both sides — the quantile_drift_sliced rule).

    Output: (feature, slice, q, v_ref, v_cur, delta), 1e-6-quantized;
    per-(feature, slice) results bit-identical to quantile_drift_sliced
    per feature (pinned in tests)."""
    def side(df: DataFrame, name: str) -> DataFrame:
        prep = df.select(
            F.col(slice_col).cast("string").alias("slice"),
            *[F.col(c).cast("double").alias(f"__x_{i}")
              for i, c in enumerate(cols)],
        ).filter(F.col("slice").isNotNull())
        aggs = [
            F.round(
                F.percentile(F.col(f"__x_{i}"), F.lit(float(q))), 6
            ).alias(f"__{name}_{i}_{j}")
            for i, _c in enumerate(cols)
            for j, q in enumerate(qs)
        ]
        return prep.groupBy("slice").agg(*aggs).select(
            "slice",
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(c).alias("feature"),
                            F.lit(float(q)).alias("q"),
                            F.col(f"__{name}_{i}_{j}").alias(name),
                        )
                        for i, c in enumerate(cols)
                        for j, q in enumerate(qs)
                    ]
                )
            ).alias("s"),
        ).select("slice", "s.*").filter(
            # a feature all-NULL within a slice has no percentile: drop
            # that (feature, slice) leg, matching the single-feature
            # sliced operator (whose per-feature prep drops the slice)
            F.col(name).isNotNull()
        )

    return (
        side(ref, "v_ref")
        .join(side(cur, "v_cur"), ["feature", "slice", "q"])
        .select(
            "feature",
            "slice",
            "q",
            "v_ref",
            "v_cur",
            F.round(F.col("v_cur") - F.col("v_ref"), 6).alias("delta"),
        )
    )


def quantile_drift_multi(
    ref: DataFrame,
    cur: DataFrame,
    cols: list[str],
    qs: tuple = (0.25, 0.5, 0.75, 0.99),
) -> DataFrame:
    """Per-quantile location drift for MANY numeric features in ONE
    aggregate per side: every (feature, quantile) percentile computes in
    the same single-row aggregation pass (exact interpolated
    ``percentile``, the quantiles-entry equivalence), the row explodes
    to (feature, q, v), and the two tiny frames join on the spine — two
    scans total however many features are monitored, vs 2F for
    per-column quantile_drift (per-feature results bit-identical,
    pinned in tests).

    Output: (feature, q, v_ref, v_cur, delta), quantized to 1e-6."""
    def side(df: DataFrame, name: str) -> DataFrame:
        aggs = [
            F.round(
                F.percentile(F.col(c).cast("double"), F.lit(float(q))), 6
            ).alias(f"__{name}_{i}_{j}")
            for i, c in enumerate(cols)
            for j, q in enumerate(qs)
        ]
        return df.agg(*aggs).select(
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(c).alias("feature"),
                            F.lit(float(q)).alias("q"),
                            F.col(f"__{name}_{i}_{j}").alias(name),
                        )
                        for i, c in enumerate(cols)
                        for j, q in enumerate(qs)
                    ]
                )
            ).alias("s")
        ).select("s.*")

    return (
        side(ref, "v_ref")
        .join(side(cur, "v_cur"), ["feature", "q"])
        .select(
            "feature",
            "q",
            "v_ref",
            "v_cur",
            F.round(F.col("v_cur") - F.col("v_ref"), 6).alias("delta"),
        )
    )


def quantile_drift_sliced(
    ref: DataFrame,
    cur: DataFrame,
    col: str,
    slice_col: str,
    qs: tuple = (0.25, 0.5, 0.75, 0.99),
) -> DataFrame:
    """Per-quantile location drift WITHIN every segment of ``slice_col``
    — completing the sliced triad (population_stability_sliced for
    numeric mass, chi_square_drift_sliced for categorical mix, this for
    numeric LOCATION): opposite-direction location moves in two
    segments cancel in the aggregate quantile table, so a monitor that
    only watches the whole-table quantiles misses both. One
    groupBy(slice) aggregate per side computes every quantile in the
    same pass (exact interpolated ``percentile`` ≡ DuckDB
    quantile_cont), the per-slice row explodes onto the q spine, and
    the two signal-sized frames join on (slice, q) — two scans total
    however many slices exist.

    Slices present on only ONE side are dropped (a location delta needs
    both sides; chi_square_drift_sliced on the slice column itself is
    the new/vanished-segment detector, same division of labor as the
    sliced-PSI drop rule).

    Output: (slice, q, v_ref, v_cur, delta), quantized to 1e-6."""
    def side(df: DataFrame, name: str) -> DataFrame:
        prep = df.select(
            F.col(slice_col).cast("string").alias("slice"),
            F.col(col).cast("double").alias("x"),
        ).filter(F.col("x").isNotNull() & F.col("slice").isNotNull())
        aggs = [
            F.round(F.percentile(F.col("x"), F.lit(float(q))), 6).alias(
                f"__{name}_{i}"
            )
            for i, q in enumerate(qs)
        ]
        return prep.groupBy("slice").agg(*aggs).select(
            "slice",
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(float(q)).alias("q"),
                            F.col(f"__{name}_{i}").alias(name),
                        )
                        for i, q in enumerate(qs)
                    ]
                )
            ).alias("s"),
        ).select("slice", "s.*")

    return (
        side(ref, "v_ref")
        .join(side(cur, "v_cur"), ["slice", "q"])
        .select(
            "slice",
            "q",
            "v_ref",
            "v_cur",
            F.round(F.col("v_cur") - F.col("v_ref"), 6).alias("delta"),
        )
    )


def embedding_moment_drift(
    ref: DataFrame, cur: DataFrame, vec_col: str = "embedding"
) -> DataFrame:
    """Embedding-space distribution drift via per-dimension moments —
    the diagonal-covariance Fréchet distance (the FID formula with
    Σ restricted to its diagonal): per dimension d,
    term_d = (μ_ref,d − μ_cur,d)² + σ²_ref,d + σ²_cur,d −
    2·√(σ²_ref,d · σ²_cur,d); the total Σ_d term_d is the squared
    Fréchet distance between the two diagonal Gaussians. Complements
    kmeans_drift: the k-means monitor needs a trained model and sees
    drift as cluster-mass/distortion movement, this is model-FREE and
    sees mean shift and per-dim variance inflation/collapse directly —
    the standard embedding-health check between encoder versions or
    corpus snapshots.

    Cross-engine determinism: μ and σ² (population variance) quantize
    to 1e-6 per side BEFORE the term, and the term re-rounds to 1e-6 —
    the PSI playbook, so the DuckDB twin is hash-exact. Plan shape at
    100 TB: posexplode + ONE groupBy(dim) per side with map-side
    combine — each side reduces to a dim-count-sized frame in a single
    scan, the join is dim×dim rows; nothing else shuffles.

    Output: (dim, mu_ref, mu_cur, var_ref, var_cur, fid_term), dim
    0-based; total drift = sum(fid_term) (≥ 0 by construction — the
    variance part is (σ_ref − σ_cur)²)."""
    def side(df: DataFrame, pre: str) -> DataFrame:
        return (
            df.filter(F.col(vec_col).isNotNull())
            .select(F.posexplode(vec_col).alias("dim0", "x0"))
            .select(
                F.col("dim0").cast("bigint").alias("dim"),
                F.col("x0").cast("double").alias("x"),
            )
            .groupBy("dim")
            .agg(
                F.round(F.avg("x"), 6).alias(f"mu_{pre}"),
                F.round(F.var_pop("x"), 6).alias(f"var_{pre}"),
            )
        )

    mu_d = F.col("mu_ref") - F.col("mu_cur")
    return (
        side(ref, "ref")
        .join(side(cur, "cur"), "dim")
        .select(
            "dim",
            "mu_ref",
            "mu_cur",
            "var_ref",
            "var_cur",
            F.round(
                mu_d * mu_d
                + F.col("var_ref")
                + F.col("var_cur")
                - F.lit(2.0) * F.sqrt(F.col("var_ref") * F.col("var_cur")),
                6,
            ).alias("fid_term"),
        )
    )


def quantile_drift(
    ref: DataFrame,
    cur: DataFrame,
    col: str,
    qs: tuple = (0.25, 0.5, 0.75, 0.99),
    approx_accuracy: int | None = None,
) -> DataFrame:
    """Per-quantile location drift for a numeric feature — the scale/
    shift complement to population_stability (PSI sees mass moving
    between bins but not HOW FAR; a quantile table says "the median
    moved +3.2, the p99 moved +41"). Exact interpolated percentiles
    (Spark ``percentile`` ≡ DuckDB quantile_cont — the quantiles corpus
    entry's equivalence), each side reduced in ONE aggregate whose
    single row explodes to (q, v) and joins on the tiny q spine.

    Exact ``percentile`` buffers each side's values in the aggregation
    state (fine for bounded inputs — the quantiles-entry contract). At
    unbounded scale pass ``approx_accuracy`` (e.g. 10_000): the same
    plan shape runs on ``approx_percentile`` — a Greenwald-Khanna-style
    mergeable sketch whose state is O(accuracy · log n) per side
    instead of all values, with rank error ≤ 1/accuracy (delta error
    bounded by the value spread across that rank band; agreement with
    the exact form is pinned in tests). Approximate → rows-only for the
    driver gate; the exact default stays the oracle-paired form.

    Output: (q, v_ref, v_cur, delta), delta = v_cur − v_ref, all
    quantized to 1e-6.
    """
    def pctl(x, q):
        if approx_accuracy is not None:
            return F.approx_percentile(
                x, F.lit(float(q)), F.lit(int(approx_accuracy))
            )
        return F.percentile(x, F.lit(float(q)))

    def side(df: DataFrame, name: str) -> DataFrame:
        aggs = [
            F.round(
                pctl(F.col(col).cast("double"), q), 6
            ).alias(f"__{name}_{i}")
            for i, q in enumerate(qs)
        ]
        return df.agg(*aggs).select(
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(float(q)).alias("q"),
                            F.col(f"__{name}_{i}").alias(name),
                        )
                        for i, q in enumerate(qs)
                    ]
                )
            ).alias("s")
        ).select("s.*")

    return (
        side(ref, "v_ref")
        .join(side(cur, "v_cur"), "q")
        .select(
            "q",
            "v_ref",
            "v_cur",
            F.round(F.col("v_cur") - F.col("v_ref"), 6).alias("delta"),
        )
    )


def drift_report(
    ref: DataFrame,
    cur: DataFrame,
    numeric_cols: list[str],
    categorical_cols: list[str],
    n_bins: int = 10,
) -> DataFrame:
    """The NIGHTLY DRIFT REPORT: every leg of the drift family over one
    reference/current pair, reduced to one (check_name, feature, stat)
    row per monitored signal — the single table a monitoring job writes
    per snapshot and alerts on (psi > 0.25, the classic retrain alarm;
    chi2 vs the K−1-dof critical value; quantile_max_shift vs a domain
    tolerance):

    - ``psi``: per numeric feature, total PSI from the single-scan
      multi-feature pass (population_stability_multi — 3 scans for ALL
      features).
    - ``chi2``: per categorical feature, the total chi-square statistic
      (chi_square_drift_multi — one unpivoted scan per side for ALL
      features).
    - ``quantile_max_shift``: per numeric feature, the largest absolute
      per-quantile location move (quantile_drift_multi — one aggregate
      per side for ALL features; PSI says mass moved, this says how
      far).

    Every leg is the multi-feature form, so the WHOLE report costs a
    CONSTANT seven scans (3 PSI + 2 chi2 + 2 quantile) however many
    features are monitored; per-feature statistics are bit-identical to
    the single-column operators (each multi variant pins that in
    tests), so the already-oracle-paired component SQL remains the
    report's exact oracle. The output unions constant-size aggregates
    (never data-sized frames).
    """
    psi = (
        population_stability_multi(ref, cur, numeric_cols, n_bins=n_bins)
        .groupBy("feature")
        .agg(F.round(F.sum("psi_term"), 6).alias("stat"))
        .select(
            F.lit("psi").alias("check_name"), "feature", "stat"
        )
    )
    chi = (
        chi_square_drift_multi(ref, cur, categorical_cols)
        .groupBy("feature")
        .agg(F.round(F.sum("chi2_term"), 6).alias("stat"))
        .select(
            F.lit("chi2").alias("check_name"), "feature", "stat"
        )
    )
    qd = (
        quantile_drift_multi(ref, cur, numeric_cols)
        .groupBy("feature")
        .agg(F.round(F.max(F.abs(F.col("delta"))), 6).alias("stat"))
        .select(
            F.lit("quantile_max_shift").alias("check_name"),
            "feature",
            "stat",
        )
    )
    return psi.unionByName(chi).unionByName(qd)


def drift_report_sliced(
    ref: DataFrame,
    cur: DataFrame,
    numeric_cols: list[str],
    categorical_cols: list[str],
    slice_col: str,
    n_bins: int = 10,
) -> DataFrame:
    """The PER-SEGMENT drift report: every monitored feature × every
    segment, reduced to one (check_name, feature, slice, stat) row —
    the companion drift_report writes when aggregate signals read clean
    but a segment may have moved (the failure every sliced operator
    exists to close; run it on the slicing axes that matter
    operationally — source, tenant, language):

    - ``psi``: per (feature, slice), total PSI within the slice
      (population_stability_sliced_multi — (feature, slice) pairs
      absent from the reference drop, the sliced rule).
    - ``chi2``: per (feature, slice), the total chi-square of the
      feature's category mix within the slice
      (chi_square_drift_sliced_multi — one-sided groups stay visible).
    - ``quantile_max_shift``: per (feature, slice), the largest
      absolute per-quantile move (quantile_drift_sliced_multi —
      one-sided slices drop, a delta needs both sides).

    Every leg is the multi×sliced form, so the WHOLE report costs a
    CONSTANT seven scans (3 PSI + 2 chi2 + 2 quantile) however many
    features OR slices are monitored — the same scan bill as the
    aggregate drift_report; per-signal statistics are bit-identical to
    the single-feature sliced operators (each multi variant pins that),
    so the component oracle SQL composes into this report's exact
    oracle."""
    psi = (
        population_stability_sliced_multi(
            ref, cur, numeric_cols, slice_col, n_bins=n_bins
        )
        .groupBy("feature", "slice")
        .agg(F.round(F.sum("psi_term"), 6).alias("stat"))
        .select(
            F.lit("psi").alias("check_name"), "feature", "slice", "stat"
        )
    )
    chi = (
        chi_square_drift_sliced_multi(ref, cur, categorical_cols, slice_col)
        .groupBy("feature", "slice")
        .agg(F.round(F.sum("chi2_term"), 6).alias("stat"))
        .select(
            F.lit("chi2").alias("check_name"), "feature", "slice", "stat"
        )
    )
    qd = (
        quantile_drift_sliced_multi(ref, cur, numeric_cols, slice_col)
        .groupBy("feature", "slice")
        .agg(F.round(F.max(F.abs(F.col("delta"))), 6).alias("stat"))
        .select(
            F.lit("quantile_max_shift").alias("check_name"),
            "feature",
            "slice",
            "stat",
        )
    )
    return psi.unionByName(chi).unionByName(qd)


def _melt_string(df: DataFrame, cols: list[str]) -> DataFrame:
    """(feature, value-as-string) rows for the monitored columns — the
    same inline-explode unpivot the multi-feature drift ops use, so F
    features cost ONE scan, not F."""
    return (
        df.select(
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(c).alias("feature"),
                            F.col(c).cast("string").alias("value"),
                        )
                        for c in cols
                    ]
                )
            ).alias("m")
        )
        .select("m.feature", "m.value")
        .filter(F.col("value").isNotNull())
    )


def cardinality_drift(
    ref: DataFrame,
    cur: DataFrame,
    cols: list[str],
    exact: bool = True,
) -> DataFrame:
    """Feature-CARDINALITY drift — the drift check the distributional
    family can't express: PSI/chi²/quantile all compare SHAPES, but a
    key column whose distinct count collapses (an upstream join started
    fanning out one id) or explodes (a format change minted new
    categories) can keep a near-identical histogram. Distinct counts
    per monitored feature on both snapshots, one melted scan per side
    (the multi-feature unpivot — F features, constant 2 scans), plus
    the cur/ref ratio; one-sided features survive the full-outer merge
    with a 0 on the missing side and a NULL ratio when ref is 0.

    ``exact=False`` is the 100 TB production path: DataSketches HLL
    (``hll_sketch_agg``, lgConfigK=12 ⇒ ~1.6% rsd) instead of the exact
    distinct — same plan shape, but the per-feature state is a fixed
    4 KB sketch instead of the distinct-value hash set, and the partial
    aggregation is mergeable across any partitioning. Estimates are
    engine-specific, so only the exact form is oracle-paired; the
    sketch form is tolerance-pinned against it in pytest.

    Output: (feature, n_ref_distinct, n_cur_distinct, ratio[6dp])."""
    def side(df: DataFrame, name: str) -> DataFrame:
        m = _melt_string(df, cols)
        agg = (
            F.count_distinct(F.col("value"))
            if exact
            else F.hll_sketch_estimate(F.hll_sketch_agg("value"))
        )
        return m.groupBy("feature").agg(
            agg.cast("bigint").alias(name)
        )

    out = (
        side(ref, "n_ref_distinct")
        .join(side(cur, "n_cur_distinct"), "feature", "full_outer")
        .fillna(0, subset=["n_ref_distinct", "n_cur_distinct"])
    )
    ratio = F.when(
        F.col("n_ref_distinct") > 0,
        F.round(
            F.col("n_cur_distinct").cast("double")
            / F.col("n_ref_distinct"),
            6,
        ),
    )
    return out.select(
        "feature", "n_ref_distinct", "n_cur_distinct", ratio.alias("ratio")
    )


def cardinality_drift_sliced(
    ref: DataFrame,
    cur: DataFrame,
    cols: list[str],
    slice_col: str,
    exact: bool = True,
) -> DataFrame:
    """Per-SLICE feature-cardinality drift — the sliced completion of
    cardinality_drift, closing the same blind spot the other sliced
    operators close: one segment's key space can collapse while another
    mints new values, leaving the aggregate distinct count unmoved
    (e.g. a migrated tenant re-keying its ids onto a shared range).
    Distinct counts per (feature, slice) on both snapshots in one
    melted scan per side — the slice key rides the unpivot, so F
    features × S slices still cost TWO scans; one-sided (feature,
    slice) pairs survive the full-outer merge with a 0 on the missing
    side and a NULL ratio when ref is 0 (vanished slices stay visible
    as ratio 0 rows — cardinality HAS a defined value there, unlike the
    chi² mix).

    ``exact=False`` swaps in hll_sketch_agg per (feature, slice) — a
    fixed 4 KB sketch per signal instead of a distinct hash set per
    signal, the same trade as the aggregate form.

    Output: (feature, slice, n_ref_distinct, n_cur_distinct,
    ratio[6dp])."""
    def melt(df: DataFrame) -> DataFrame:
        return (
            df.select(
                F.col(slice_col).cast("string").alias("slice"),
                F.explode(
                    F.array(
                        *[
                            F.struct(
                                F.lit(c).alias("feature"),
                                F.col(c).cast("string").alias("value"),
                            )
                            for c in cols
                        ]
                    )
                ).alias("m"),
            )
            .select("slice", "m.feature", "m.value")
            .filter(F.col("value").isNotNull() & F.col("slice").isNotNull())
        )

    def side(df: DataFrame, name: str) -> DataFrame:
        agg = (
            F.count_distinct(F.col("value"))
            if exact
            else F.hll_sketch_estimate(F.hll_sketch_agg("value"))
        )
        return melt(df).groupBy("feature", "slice").agg(
            agg.cast("bigint").alias(name)
        )

    out = (
        side(ref, "n_ref_distinct")
        .join(side(cur, "n_cur_distinct"), ["feature", "slice"], "full_outer")
        .fillna(0, subset=["n_ref_distinct", "n_cur_distinct"])
    )
    ratio = F.when(
        F.col("n_ref_distinct") > 0,
        F.round(
            F.col("n_cur_distinct").cast("double")
            / F.col("n_ref_distinct"),
            6,
        ),
    )
    return out.select(
        "feature", "slice", "n_ref_distinct", "n_cur_distinct",
        ratio.alias("ratio"),
    )
