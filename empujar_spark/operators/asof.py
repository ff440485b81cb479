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
- a left row with no prior right row keeps NULLs;
- the match is the WHOLE nearest right row (pandas ``merge_asof``
  semantics): if that row has NULL in a value column, the output is
  NULL for that column — values never mix across right rows. The
  window therefore carries ONE struct(on, *value_cols) per right row,
  not each value column independently, so the tolerance bound and the
  values always come from the same matched row.
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
    # One struct per right row — last(ignorenulls) then carries the
    # nearest right row AS A WHOLE, so a NULL value column in that row
    # stays NULL instead of borrowing an older row's value (and with
    # tolerance, the gating timestamp is by construction the same row
    # the values came from — pandas merge_asof matches whole rows).
    r_struct = F.struct(
        F.col(on).alias("__on"),
        *[F.col(c).alias(c) for c in value_cols],
    )
    r_struct_type = right.select(r_struct.alias("__r")).schema["__r"].dataType
    l_tagged = left.select(
        *lcols,
        F.lit(1).alias("__side"),  # right(0) sorts before left(1) at equal ts
        F.lit(None).cast(r_struct_type).alias("__r"),
    )
    r_tagged = right.select(
        F.col(by),
        F.col(on),
        F.lit(0).alias("__side"),
        r_struct.alias("__r"),
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
    carried = unioned.select(
        *lcols,
        "__side",
        F.last(F.col("__r"), ignorenulls=True).over(w).alias("__m"),
    )
    matched = carried.filter(F.col("__side") == 1)
    keep = F.lit(True)
    if tolerance is not None:
        keep = (
            F.abs(
                F.col(on).cast("double") - F.col("__m.__on").cast("double")
            )
            <= F.lit(float(tolerance))
        )
    return matched.select(
        *lcols,
        *[
            F.when(keep, F.col(f"__m.{c}")).alias(f"{c}{suffix}")
            for c in value_cols
        ],
    )
