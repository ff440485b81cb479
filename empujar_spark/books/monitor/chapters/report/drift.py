"""REPORT chapter (priority 200): the nightly drift report over the
STORED snapshots — one drift_report call (operators/profile.py) covering
every leg of the drift family, upserted into ``drift_report`` keyed by
check:feature so the latest figure per signal survives and history
accumulates in the book audit. A second page writes the PER-SEGMENT
companion (drift_report_sliced over the ``SLICE_COL`` axis) into
``drift_report_sliced`` keyed by check:slice — the table the operator
on call reads when the aggregate report is clean but a segment is
suspected (the alert gate intentionally fires on the AGGREGATE table
only: per-segment alarm thresholds are segment-population-dependent and
belong to whoever owns the slicing axis). Both pages run in the same
chapter, so they parallelize under the chapter's page bound."""

from pyspark.sql import functions as F

# the slicing axis the sliced companion report watches (a stand-in for
# per-source/per-tenant slicing; override per book via book.slice_expr)
SLICE_COL = "shard"


def chapter_loader(book):
    from empujar_spark.books.monitor import CATEGORICAL_COLS, NUMERIC_COLS
    from empujar_spark.operators import profile as P

    chapter = book.add_chapter(200, "report")
    wh = book.destination

    def _splits():
        ref = wh.read("events_reference")
        cur = wh.read("events_current")
        return ref, cur

    def report():
        ref, cur = _splits()
        rep = P.drift_report(
            ref, cur,
            numeric_cols=NUMERIC_COLS,
            categorical_cols=CATEGORICAL_COLS,
        ).select(
            F.concat_ws(":", "check_name", "feature").alias("signal"),
            "check_name",
            "feature",
            "stat",
        )
        wh.insert_data("drift_report", rep, merge_key="signal")

    def report_sliced():
        ref, cur = _splits()
        slice_expr = getattr(
            book, "slice_expr", (F.col("user_id") % 4).alias(SLICE_COL)
        )
        rep = P.drift_report_sliced(
            ref.select("*", slice_expr),
            cur.select("*", slice_expr),
            numeric_cols=NUMERIC_COLS,
            categorical_cols=CATEGORICAL_COLS,
            slice_col=SLICE_COL,
        ).select(
            F.concat_ws(":", "check_name", "feature", "slice")
            .alias("signal"),
            "check_name",
            "feature",
            "slice",
            "stat",
        )
        wh.insert_data("drift_report_sliced", rep, merge_key="signal")

    chapter.add_page("drift-report", report)
    chapter.add_page("drift-report-sliced", report_sliced)
