"""Time-series grid operators: gap-filling / resampling.

``gapfill_ffill``: per-entity dense time grid with forward-filled values
— the `time_bucket_gapfill` / `resample().ffill()` analogue relational
engines bolt on for monitoring and feature pipelines. Spark has no
native gap-fill; this is the explode-grid + left-join + ignore-nulls
window composition.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# step → the date_trunc unit that aligns the grid. Single-unit steps
# only: a "15 minute" grid needs key-relative epoch-floor alignment,
# which changes the bucket contract (buckets would no longer be
# calendar-aligned) — out of scope until an operator needs it.
_STEP_RE = re.compile(r"\s*1\s+(minute|hour|day|week)s?\s*$")


def gapfill_ffill(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    id_col: str = "event_id",
    step: str = "1 hour",
) -> DataFrame:
    """Dense per-key time grid from each key's first to last bucket with
    event count per bucket and forward-filled last value.

    Output: (key, bucket, n, last_value_ffill) — one row per key per
    ``step`` bucket; n = 0 marks a gap; the fill carries the latest
    value at-or-before the bucket (ties at identical timestamps broken
    by ``id_col``, so the fill is deterministic on any partitioning).

    ``step`` is a single calendar unit — "1 minute" | "1 hour" |
    "1 day" | "1 week" — and buckets are calendar-aligned via the
    matching date_trunc (weeks start Monday, Spark's truncation).

    Scale shape for 100 TB: the grid explodes from the |keys|-row span
    table (bounded by span/step per key, data-independent of event
    volume); events collapse to per-bucket rows BEFORE the grid join
    (map-side partials); the forward fill is ONE ignore-nulls window per
    key — everything hash-partitions on the key, no global sort.
    """
    m = _STEP_RE.fullmatch(step)
    if not m:
        raise ValueError(
            f"step must be '1 minute'|'1 hour'|'1 day'|'1 week', got {step!r}"
        )
    unit = m.group(1)
    bucket = F.date_trunc(unit, F.col(ts_col))
    step = f"1 {unit}"  # normalized for the sequence interval
    w_last = Window.partitionBy(key_col, "bucket").orderBy(
        F.col(ts_col).desc(), F.col(id_col).desc()
    )
    ranked = df.select(
        key_col, bucket.alias("bucket"), ts_col, id_col, value_col
    ).withColumn("__rn", F.row_number().over(w_last))
    hourly = ranked.groupBy(key_col, "bucket").agg(
        F.count(F.lit(1)).alias("n"),
        F.max(F.when(F.col("__rn") == 1, F.col(value_col))).alias("__last"),
    )
    span = ranked.groupBy(key_col).agg(
        F.min("bucket").alias("__h0"), F.max("bucket").alias("__h1")
    )
    grid = span.select(
        key_col,
        F.explode(
            F.expr(f"sequence(__h0, __h1, interval {step})")
        ).alias("bucket"),
    )
    w_fill = (
        Window.partitionBy(key_col)
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        grid.join(hourly, [key_col, "bucket"], "left")
        .select(
            key_col,
            "bucket",
            F.coalesce(F.col("n"), F.lit(0)).cast("bigint").alias("n"),
            F.last("__last", ignorenulls=True)
            .over(w_fill)
            .alias("last_value_ffill"),
        )
    )
