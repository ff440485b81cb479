"""Binned range join: point-in-interval matching as an equi-join.

The reference delegates all joins to the warehouse and only ever emits
equi-joins (SURVEY.md §2.5); interval containment is the classic query
its model cannot express and Spark's naive plan for it is a
BroadcastNestedLoopJoin — O(|L|·|R|) and a driver OOM at 100 TB.

The scale-safe plan implemented here:

1. left rows compute one bin id: floor(epoch(point) / W);
2. right intervals EXPLODE into every bin they overlap
   (``F.sequence(floor(start/W), floor(end/W))`` — for intervals shorter
   than the bin width W this is 1-2 rows, so the blowup is bounded by
   ceil(len/W)+1);
3. equi-join on (by-key?, bin) — one hash shuffle, prunable, AQE-skew
   splittable like any other equi-join;
4. exact containment filter re-checks ``start <= point <= end``.

A matched (left, right) pair is emitted exactly once with no dedup pass:
the pair can only meet in the single bin the left point falls in.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _epoch(col: Column) -> Column:
    """Seconds since epoch as a double (micros kept as fraction) — binning
    only needs monotonicity, the exact filter uses the raw values."""
    return F.unix_micros(col).cast("double") / F.lit(1_000_000.0)


def range_join(
    left: DataFrame,
    right: DataFrame,
    point: str,
    start: str,
    end: str,
    by: str | list[str] | None = None,
    bin_width_seconds: int = 3600,
    how: str = "inner",
) -> DataFrame:
    """Join every left row to the right rows whose [start, end] interval
    contains ``left.point`` (and whose ``by`` keys match, if given).

    Output columns: all left columns, then all right columns (caller
    renames collisions beforehand — ``by`` columns are taken from the
    left). ``how`` may be ``inner`` or ``left`` (unmatched left rows kept
    with nulls).
    """
    if how not in ("inner", "left"):
        raise ValueError(f"how must be inner|left, got {how!r}")
    keys = [by] if isinstance(by, str) else list(by or [])
    w = float(bin_width_seconds)

    l_binned = left.withColumn(
        "__bin", F.floor(_epoch(F.col(point)) / w).cast("bigint")
    )
    r_binned = right.withColumn(
        "__bin",
        F.explode(
            F.sequence(
                F.floor(_epoch(F.col(start)) / w).cast("bigint"),
                F.floor(_epoch(F.col(end)) / w).cast("bigint"),
            )
        ),
    )
    on = [F.col(f"l.{k}") == F.col(f"r.{k}") for k in keys] + [
        F.col("l.__bin") == F.col("r.__bin"),
        F.col(f"l.{point}") >= F.col(f"r.{start}"),
        F.col(f"l.{point}") <= F.col(f"r.{end}"),
    ]
    joined = l_binned.alias("l").join(r_binned.alias("r"), on, how)
    out_cols = [F.col(f"l.{c}") for c in left.columns] + [
        F.col(f"r.{c}") for c in right.columns if c not in keys
    ]
    if how == "inner":
        return joined.select(*out_cols)
    # left join: a left row with N matching bins... cannot happen (one bin
    # per left row), but unmatched rows survive exactly once per the join.
    return joined.select(*out_cols)


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    start: str = "s",
    end: str = "e",
    bin_width: float = 600.0,
) -> DataFrame:
    """Join every left interval to every right interval it OVERLAPS
    (closed intervals on a numeric axis: l.start ≤ r.end ∧ r.start ≤
    l.end). Both inputs carry numeric ``start``/``end`` columns (callers
    convert timestamps to epoch seconds); output is all left columns then
    all right columns, renamed with ``_a``/``_b`` suffixes.

    Scale shape: each interval explodes into its covering fixed-width
    bins; candidates meet in a bin equi-join (never a
    BroadcastNestedLoopJoin) with the exact overlap predicate riding
    inside the join. A pair overlapping across several bins would
    surface once per shared bin, so the join keeps only the FIRST
    overlap bin — the bin of max(start_a, start_b), which both sides
    provably cover — making each pair emit exactly once with no
    dropDuplicates shuffle. Pick ``bin_width`` ≈ typical interval length:
    candidates per bin stay bounded and the explode factor stays ~2.
    """
    w = float(bin_width)
    a = left.select(
        *[F.col(c).alias(f"{c}_a") for c in left.columns]
    ).withColumn(
        "__bin",
        F.explode(
            F.sequence(
                F.floor(F.col(f"{start}_a") / w).cast("bigint"),
                F.floor(F.col(f"{end}_a") / w).cast("bigint"),
            )
        ),
    )
    b = right.select(
        *[F.col(c).alias(f"{c}_b") for c in right.columns]
    ).withColumn(
        "__bin",
        F.explode(
            F.sequence(
                F.floor(F.col(f"{start}_b") / w).cast("bigint"),
                F.floor(F.col(f"{end}_b") / w).cast("bigint"),
            )
        ),
    )
    sa, ea = F.col(f"{start}_a"), F.col(f"{end}_a")
    sb, eb = F.col(f"{start}_b"), F.col(f"{end}_b")
    on = (
        (a["__bin"] == b["__bin"])
        & (sa <= eb)
        & (sb <= ea)
        & (a["__bin"] == F.floor(F.greatest(sa, sb) / w).cast("bigint"))
    )
    return a.join(b, on).drop("__bin")
