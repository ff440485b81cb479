"""REPORT chapter (priority 200): the nightly drift report over the
STORED snapshots — one drift_report call (operators/profile.py) covering
every leg of the drift family, upserted into ``drift_report`` keyed by
check:feature so the latest figure per signal survives and history
accumulates in the book audit."""

from pyspark.sql import functions as F


def chapter_loader(book):
    from empujar_spark.books.monitor import CATEGORICAL_COLS, NUMERIC_COLS
    from empujar_spark.operators import profile as P

    chapter = book.add_chapter(200, "report")
    wh = book.destination

    def report():
        ref = wh.read("events_reference")
        cur = wh.read("events_current")
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

    chapter.add_page("drift-report", report)
