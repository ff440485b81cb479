"""As-of (point-in-time) join — an operator Spark lacks natively.

``asof_join(left, right, ...)`` attaches to each left row the most recent
right row with ``right.ts <= left.ts`` within the same ``by`` key group
(backward as-of, the pandas ``merge_asof`` default), or with
``direction="forward"`` the EARLIEST right row with ``right.ts >=
left.ts``; ``tolerance`` (seconds) NULLs matches farther than the bound,
pandas-style.

Implementation: NOT a range cross-join and NOT per-group pandas. Both
sides are tagged and unioned, then a single window pass per key carries
the last right-side values forward in time order. Cost: one shuffle on
the ``by`` key + one sort within partitions — linear, skew-tolerant
(AQE), and orders of magnitude cheaper at 100 TB than the
O(|L|·|R|/key) range-join expansion. DuckDB's native ASOF JOIN is the
oracle twin (plans/corpus.py).

Semantics:
- a right row at exactly left.ts matches (``<=``);
- right must be unique per (by, on) — pre-dedup with
  ``Warehouse.dedup_keep_latest`` otherwise (ties would be
  nondeterministic in any engine);
- a left row with no prior right row keeps NULLs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: str,
    value_cols: list[str],
    suffix: str = "_asof",
    direction: str = "backward",
    tolerance: float | None = None,
) -> DataFrame:
    """As-of join. ``on`` = ordering column (same name both sides),
    ``by`` = equality key, ``value_cols`` = right columns to attach
    (renamed with ``suffix``); ``direction`` = "backward" (default:
    last right at or before) or "forward" (first right at or after);
    ``tolerance`` = max |left.on − right.on| in seconds — matches
    beyond it come back NULL (the row is kept), pandas semantics.
    Forward is the same single window pass with the time order
    reversed — the carry then brings the NEXT right row back."""
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    lcols = left.columns
    l_tagged = left.select(
        *lcols,
        F.lit(1).alias("__side"),  # right(0) sorts before left(1) at equal ts
        *[
            F.lit(None).cast(right.schema[c].dataType).alias(f"__r_{c}")
            for c in value_cols
        ],
    )
    r_tagged = right.select(
        F.col(by),
        F.col(on),
        F.lit(0).alias("__side"),
        *[F.col(c).alias(f"__r_{c}") for c in value_cols],
    )
    unioned = l_tagged.unionByName(r_tagged, allowMissingColumns=True)

    order = (
        F.col(on).asc() if direction == "backward" else F.col(on).desc()
    )
    w = (
        Window.partitionBy(by)
        .orderBy(order, F.col("__side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carry = [
        F.last(F.col(f"__r_{c}"), ignorenulls=True).over(w).alias(f"{c}{suffix}")
        for c in value_cols
    ]
    if tolerance is not None:
        # carry the matched row's own timestamp to apply the bound
        carry.append(
            F.last(
                F.when(F.col("__side") == 0, F.col(on)), ignorenulls=True
            ).over(w).alias("__match_on")
        )
    carried = unioned.select(*lcols, "__side", *carry)
    out = carried.filter(F.col("__side") == 1).drop("__side")
    if tolerance is not None:
        within = (
            F.abs(
                F.col(on).cast("double") - F.col("__match_on").cast("double")
            )
            <= F.lit(float(tolerance))
        )
        out = out.select(
            *lcols,
            *[
                F.when(within, F.col(f"{c}{suffix}"))
                .otherwise(F.lit(None))
                .alias(f"{c}{suffix}")
                for c in value_cols
            ],
        )
    return out
