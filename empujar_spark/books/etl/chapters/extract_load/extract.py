"""EXTRACT & LOAD chapter (reference books/etl/chapters/extract+load/
extract.js): for each source table, read the destination's MAX(watermark),
extract source rows past it, upsert into the destination.

Loaded by Book.load_chapters — ``chapter_loader(book)`` is called with the
book, exactly like the reference's ``exports.chapterLoader`` contract.
"""

from pyspark.sql import functions as F

# (table, watermark column, merge key). lineitem has NO unique key in the
# synthetic data ((l_orderkey, l_linenumber) repeats) — the reference's
# decision matrix treats PK-less tables as append-only (mysql.js:560-565
# full-merge path), so it loads with merge_key=None: plain append with a
# strictly-greater watermark for rerun idempotence.
EXTRACT_TABLES = [
    ("customer", None, "c_custkey"),
    ("orders", "o_orderdate", "o_orderkey"),
    ("lineitem", "l_shipdate", None),
    ("part", None, "p_partkey"),
]


def chapter_loader(book):
    from empujar_spark.plans.corpus import load

    chapter = book.add_chapter(
        100, "extract+load", threads=getattr(book, "etl_threads", 5)
    )
    warehouse = book.destination
    spark = book.spark
    source_dir = book.source_dir

    def extract_table(table: str, wm_col, key):
        def page():
            src = load(spark, source_dir, table)
            if wm_col is not None:
                wm = warehouse.get_max(table, wm_col)
                if wm is not None:
                    # upsert absorbs `>=` boundary re-extraction (the
                    # reference's extract.js:18-21 contract); append-mode
                    # tables need strict `>` for idempotence
                    if key is not None:
                        src = src.filter(F.col(wm_col) >= F.lit(wm))
                    else:
                        src = src.filter(F.col(wm_col) > F.lit(wm))
            if book.get_all_limit:  # --getAllLimit testing cap (book.js:74)
                src = src.limit(book.get_all_limit)
            warehouse.insert_data(
                table, src, merge_on_duplicates=key is not None, merge_key=key
            )

        return page

    # loaders may add pages dynamically (chapter.js:82-85): discover the
    # table list in a loader, then register one page per table
    def discover():
        for table, wm_col, key in EXTRACT_TABLES:
            chapter.add_page(table, extract_table(table, wm_col, key))

    chapter.add_loader("discover-tables", discover)
