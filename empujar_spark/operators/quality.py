"""Declarative data-quality checks — the dbt-tests / Deequ-style
constraint validation a warehouse load runs before publishing (the
reference's nearest analogue is insertData's implicit schema policing;
these make row-level expectations explicit and auditable).

Each helper returns a ONE-ROW DataFrame (check, n_violations);
``run_checks`` unions them into the audit result a pipeline gates on.
Every check is a single aggregate over one scan (or one anti-join for
referential integrity) — no collects, no row fan-out; at 100 TB each
check is exactly as expensive as its aggregation and they parallelize
as independent jobs.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _one(df: DataFrame, name: str, violations: Column) -> DataFrame:
    # coalesce: aggregates like sum() return NULL over an EMPTY input,
    # and a NULL n_violations would make passed = (NULL == 0) = NULL —
    # which an `== 0` fail-fast gate silently treats as a pass. Zero
    # rows means zero violations for every check shape used here.
    return df.agg(
        F.lit(name).alias("check"),
        F.coalesce(violations.cast("bigint"), F.lit(0)).alias("n_violations"),
    )


def unique_spec(cols: list[str], name: str | None = None) -> tuple[str, Column]:
    """(name, violations-column) for key uniqueness — rows beyond the
    first per key (0 ⇔ unique). The column form exists so several checks
    on ONE table can fuse into one aggregate (``expect_fused``)."""
    key = F.struct(*[F.col(c) for c in cols])
    return (
        name or f"unique({','.join(cols)})",
        F.count(F.lit(1)) - F.count_distinct(key),
    )


def not_null_spec(col: str, name: str | None = None) -> tuple[str, Column]:
    return (
        name or f"not_null({col})",
        F.sum(F.when(F.col(col).isNull(), 1).otherwise(0)),
    )


def in_range_spec(
    col: str, lo, hi, name: str | None = None
) -> tuple[str, Column]:
    c = F.col(col)
    bad = c.isNotNull() & ((c < F.lit(lo)) | (c > F.lit(hi)))
    return (
        name or f"in_range({col},{lo},{hi})",
        F.sum(F.when(bad, 1).otherwise(0)),
    )


def accepted_values_spec(
    col: str, values: list, name: str | None = None
) -> tuple[str, Column]:
    c = F.col(col)
    bad = c.isNotNull() & ~c.isin(values)
    return (
        name or f"accepted_values({col})",
        F.sum(F.when(bad, 1).otherwise(0)),
    )


def expect_unique(df: DataFrame, cols: list[str], name: str | None = None) -> DataFrame:
    """Violations = rows beyond the first per key (0 ⇔ key is unique).

    NULL semantics: the key is the whole tuple, and per-field NULLs are
    distinct values — ('a', NULL), (NULL, 'a'), and (NULL, NULL) are
    three different keys, and a second (NULL, NULL) row IS a violation.
    A struct is never NULL itself, so count_distinct sees every row
    (unlike SQL's count(DISTINCT col), which skips NULL rows — mirror
    this tuple semantics in any oracle twin, e.g. DuckDB
    ``count(DISTINCT (a, b))``)."""
    return _one(df, *unique_spec(cols, name))


def expect_not_null(df: DataFrame, col: str, name: str | None = None) -> DataFrame:
    return _one(df, *not_null_spec(col, name))


def expect_in_range(
    df: DataFrame, col: str, lo, hi, name: str | None = None
) -> DataFrame:
    """Violations = non-NULL values outside [lo, hi] (NULLs are
    expect_not_null's concern, not a range violation)."""
    return _one(df, *in_range_spec(col, lo, hi, name))


def expect_accepted_values(
    df: DataFrame, col: str, values: list, name: str | None = None
) -> DataFrame:
    return _one(df, *accepted_values_spec(col, values, name))


def expect_fused(
    df: DataFrame, specs: list[tuple[str, Column]]
) -> DataFrame:
    """Several expectations on ONE table evaluated in ONE aggregate —
    one scan instead of one per check (each expect_* helper's aggregate
    subtree re-scans its input; Spark shares no subplans across a
    union's branches). Value-identical to unioning the individual
    helpers: same check names, same bigint violation counts, empty-input
    rows coalesce to 0 the way ``_one`` does. ``specs`` are
    (name, violations-column) pairs from the ``*_spec`` builders; the
    N aggregate values pivot back to N (check, n_violations) rows via
    ``inline`` on a literal-keyed struct array — a 1×N→N×2 reshape of an
    already-aggregated single row, no second pass. Composes with
    ``run_checks`` exactly like the single-check helpers."""
    if not specs:
        # df.agg() with zero columns dies with an opaque py4j/analysis
        # error; an empty list is an easy slip when specs are built
        # conditionally (ADVICE r16)
        raise ValueError("expect_fused requires at least one spec")
    agged = df.agg(
        *[
            F.coalesce(col.cast("bigint"), F.lit(0)).alias(f"__v{i}")
            for i, (_n, col) in enumerate(specs)
        ]
    )
    return agged.select(
        F.inline(
            F.array(
                *[
                    F.struct(
                        F.lit(n).alias("check"),
                        F.col(f"__v{i}").alias("n_violations"),
                    )
                    for i, (n, _c) in enumerate(specs)
                ]
            )
        )
    )


def expect_references(
    child: DataFrame,
    child_col: str,
    parent: DataFrame,
    parent_col: str,
    name: str | None = None,
) -> DataFrame:
    """Referential integrity: child keys with no parent (LEFT ANTI join
    — at scale the parent key column is a slim projection and the join
    hash-partitions on the key; never a collect of the parent)."""
    orphans = child.select(F.col(child_col).alias("__k")).join(
        parent.select(F.col(parent_col).alias("__k")), "__k", "left_anti"
    )
    return orphans.agg(
        F.lit(name or f"references({child_col}->{parent_col})").alias("check"),
        F.count(F.lit(1)).cast("bigint").alias("n_violations"),
    )


def run_checks(checks: list[DataFrame]) -> DataFrame:
    """Union the one-row check results and attach the pass flag — the
    audit table a load gates on (fail the book page if any passed == 0)."""
    unioned = reduce(lambda a, b: a.unionByName(b), checks)
    return unioned.select(
        "check",
        "n_violations",
        (F.col("n_violations") == 0).cast("int").alias("passed"),
    )


def expect_fresh(
    df: DataFrame,
    ts_col: str,
    as_of,
    max_age_hours: float,
    name: str | None = None,
) -> DataFrame:
    """Freshness: the newest ``ts_col`` must be within ``max_age_hours``
    of ``as_of`` (passed explicitly — a deterministic audit never reads
    the wall clock). Violations = 1 when stale or empty, else 0; the
    one-row shape composes with run_checks like any other expectation.
    This is the quality-gate face of the reference's MAX-watermark
    incremental contract (getMax, mysql.js:193-216)."""
    age_ok = (
        F.max(F.col(ts_col)).isNotNull()
        & (
            F.max(F.col(ts_col)).cast("double")
            >= F.lit(as_of).cast("timestamp").cast("double")
            - max_age_hours * 3600.0
        )
    )
    return _one(
        df,
        name or f"fresh({ts_col},{max_age_hours}h)",
        F.when(age_ok, 0).otherwise(1),
    )


def volume_anomaly(
    df: DataFrame,
    ts_col: str,
    group_col: str,
    z_threshold: float = 2.0,
) -> DataFrame:
    """Ingest-volume anomaly detection: per (group, day) row counts
    z-scored against the group's own daily history — the observability
    check that catches a collapsed or runaway source feed before it
    poisons downstream mixes (the monitoring face of the reference's
    audit/state events, lib/book.js state machinery).

    Output: (group, day, n_rows, z_score, is_anomaly) for every day —
    anomalies flagged, not filtered, so dashboards see the context.
    z is computed from integer-exact aggregates (sum, sum of squares,
    day count → population variance) so the result is deterministic
    and oracle-comparable; a group with zero variance yields NULL z
    and is never flagged.

    Scale: ONE scan → groupBy(group, day) shuffle whose cardinality is
    |groups| × |days| (tiny at any corpus size), then a window over the
    group — no second scan, no join, no collect.
    """
    from pyspark.sql import Window

    daily = df.groupBy(
        F.col(group_col).alias("grp"),
        F.date_trunc("day", F.col(ts_col)).alias("day"),
    ).agg(F.count(F.lit(1)).alias("n_rows"))
    w = Window.partitionBy("grp")
    s = F.sum("n_rows").over(w).cast("double")
    sq = F.sum(F.col("n_rows") * F.col("n_rows")).over(w).cast("double")
    nd = F.count(F.lit(1)).over(w).cast("double")
    mean = s / nd
    var = sq / nd - mean * mean
    z = F.when(var > 0, (F.col("n_rows") - mean) / F.sqrt(var))
    return daily.select(
        F.col("grp").alias(group_col),
        "day",
        "n_rows",
        F.round(z, 4).alias("z_score"),
        F.coalesce(F.abs(z) >= z_threshold, F.lit(False)).cast("int").alias(
            "is_anomaly"
        ),
    )


def k_anonymity_violations(
    df: DataFrame, quasi_cols: list[str], k: int = 8
) -> DataFrame:
    """Quasi-identifier groups smaller than ``k`` — the k-anonymity audit.

    A record whose quasi-identifier combination is shared by fewer than k
    rows is re-identifiable by joining public attributes; training
    corpora scrub or generalize those slices before release (k-anonymity,
    Sweeney 2002 — public). One hash aggregate on the quasi-identifier
    tuple (map-side combinable), then a size filter: the audit costs the
    same as any groupBy at 100 TB, and the violating-group output is tiny
    by definition.

    Output: (*quasi_cols, group_size) for every group with size < k.
    """
    return (
        df.groupBy(*quasi_cols)
        .agg(F.count(F.lit(1)).alias("group_size"))
        .filter(F.col("group_size") < k)
    )


def table_diff(
    old: DataFrame,
    new: DataFrame,
    key_cols: list[str],
    compare_cols: list[str] | None = None,
    include_unchanged: bool = False,
) -> DataFrame:
    """Release diff between two snapshots of the same table — the audit
    a dataset VERSIONING workflow runs before publishing v(N+1): which
    keys were added, which removed, which rows' content changed. The
    companion to the catalog's zero-copy snapshots/time-travel: those
    give you the two frames cheaply; this says what moved between them.

    Content comparison is by md5 over the ``compare_cols`` projection
    (default: every non-key column common to both frames, sorted by
    name so the fingerprint is column-order-stable). Each column is
    first hashed to a FIXED-WIDTH token — md5 of its string cast, or a
    32-char non-hex sentinel for NULL — and the row fingerprint is md5
    of the token concatenation. Fixed-width tokens make the encoding
    injective: a NULL→value change in any column changes the
    fingerprint, adjacent-column value swaps around a NULL cannot
    collide (('x', NULL) vs (NULL, 'x') differ by token position), and
    delimiter injection is impossible because there is no delimiter
    ('x|y' vs ('x','y') produce different token sequences). Both md5
    and string casts evaluate identically in Spark and DuckDB, so the
    fingerprint — and therefore the whole diff — stays engine-exact.

    Plan shape at 100 TB: each side reduces to a SLIM (key, fingerprint)
    projection before the one FULL OUTER equi-join on the key — the
    join is co-partitioned on the primary key (the same shuffle
    insert_data's merge already pays), carries two hash columns instead
    of the row bodies, and the emitted audit is change-sized once
    ``unchanged`` rows are filtered (the default).

    Output: (*key_cols, status ∈ added|removed|changed[|unchanged],
    old_fingerprint, new_fingerprint).
    """
    if compare_cols is None:
        compare_cols = sorted(
            (set(old.columns) & set(new.columns)) - set(key_cols)
        )

    def slim(df: DataFrame, fp_name: str) -> DataFrame:
        tokens = [
            F.coalesce(F.md5(F.col(c).cast("string")), F.lit("-" * 32))
            for c in compare_cols
        ]
        fp = F.md5(F.concat(*tokens))
        return df.select(*key_cols, fp.alias(fp_name))

    o = slim(old, "old_fingerprint")
    n = slim(new, "new_fingerprint")
    joined = o.join(n, key_cols, "full_outer")
    status = (
        F.when(F.col("old_fingerprint").isNull(), F.lit("added"))
        .when(F.col("new_fingerprint").isNull(), F.lit("removed"))
        .when(
            F.col("old_fingerprint") != F.col("new_fingerprint"),
            F.lit("changed"),
        )
        .otherwise(F.lit("unchanged"))
    )
    out = joined.select(
        *key_cols, status.alias("status"),
        "old_fingerprint", "new_fingerprint",
    )
    if not include_unchanged:
        out = out.filter(F.col("status") != "unchanged")
    return out


def lattice_schema(df: DataFrame) -> dict[str, str]:
    """A DataFrame's schema rendered through the §1.2 engine-type
    lattice (types.from_spark_type → ColumnType.render — the exact
    strings show_columns publishes, mysql.js:85-111 parity), so two
    frames from different sources diff in ONE vocabulary: bigint(20) /
    float / varchar(n) / text / datetime / tinyint(1) / blob /
    array<t>, not Spark's."""
    from empujar_spark import types as lattice

    return {
        f.name: lattice.from_spark_type(f.dataType).render()
        for f in df.schema.fields
    }


def schema_diff(
    spark,
    old_schema: dict[str, str],
    new_schema: dict[str, str],
    include_unchanged: bool = False,
) -> DataFrame:
    """SCHEMA release diff — the companion audit to table_diff (which
    compares CONTENT): which columns were added, removed, or re-typed
    between two versions of a table. The reference's schema-evolution
    surface (mysql.js:277-358 add-column / widen / retype mutations)
    expressed as an AUDIT instead of a mutation: the diff a versioning
    workflow publishes alongside v(N+1) so every reader knows what the
    writer's evolution machinery did.

    Inputs are rendered-type maps ({column: type string}) in the §1.2
    lattice vocabulary — Warehouse.show_columns metas and
    ``lattice_schema(df)`` both produce them, so warehouse tables and
    raw frames diff interchangeably. 'changed' covers every retype the
    lattice can express: widenings (varchar(10)→varchar(20),
    varchar→text), promotions (bigint→float), and unknown-column
    resolution (varchar(0)→anything).

    Schema-sized driver data by construction (a table has thousands of
    columns at most, never billions), so this builds the audit frame
    directly — the one place in the quality family where driver-side
    assembly IS the scale-correct plan.

    Output: (column, status ∈ added|removed|changed[|unchanged],
    old_type, new_type)."""
    rows = []
    for col in sorted(set(old_schema) | set(new_schema)):
        o, n = old_schema.get(col), new_schema.get(col)
        if o is None:
            status = "added"
        elif n is None:
            status = "removed"
        elif o != n:
            status = "changed"
        else:
            status = "unchanged"
            if not include_unchanged:
                continue
        rows.append((col, status, o, n))
    return spark.createDataFrame(
        rows, "column string, status string, old_type string, new_type string"
    )
