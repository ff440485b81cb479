"""SNAPSHOT chapter (priority 100): persist the reference/current
feature splits into the warehouse.

The reference split (even event_id) is the training-time freeze a
production monitor bins against; the current split (odd) is the arrival
window under test. Both upsert on event_id (the extract.js watermark
discipline), so reruns are idempotent and the reference stays frozen —
a retrain re-snapshots by replacing ``events_reference``.
"""

from pyspark.sql import functions as F


def chapter_loader(book):
    from empujar_spark.plans.corpus import load

    chapter = book.add_chapter(100, "snapshot", threads=2)
    wh = book.destination
    spark = book.spark
    source_dir = book.source_dir

    def persist(table: str, parity: int):
        def page():
            ev = load(spark, source_dir, "events").filter(
                F.col("event_id") % 2 == parity
            )
            wh.insert_data(table, ev, merge_key="event_id")

        return page

    chapter.add_page("events_reference", persist("events_reference", 0))
    chapter.add_page("events_current", persist("events_current", 1))
